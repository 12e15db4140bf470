"""Python reimplementation of the Go ``net/url`` behaviors the reference
relies on.

The reference (SBOsoft/SBOLogProcessor) uses:

- ``url.ParseRequestURI(requestUri)`` for path splitting / malicious
  classification (``logparsers/httpservers.go:95-131``),
- ``url.Parse(referer).Hostname()`` for referer normalization
  (``logparsers/httpservers.go:79-93``).

Go's parser differs from :mod:`urllib.parse` (strict percent-escape
validation, ``viaRequest`` absolute-path requirement, query cut at the
*first* ``?`` before unescaping, no fragment split in request mode), so we
implement the exact subset of Go semantics the log pipeline observes.
Pinned by golden tests ported from ``logparsers/httpservers_test.go``.
"""

from __future__ import annotations

import re

_HEX = "0123456789abcdefABCDEF"
_CTL_RE = re.compile("[\x00-\x1f\x7f]")
_ESCAPE_RE = re.compile("%(?![0-9a-fA-F]{2})")


def _has_ctl_byte(s: str) -> bool:
    # net/url stringContainsCTLByte: bytes < 0x20 or == 0x7f
    return _CTL_RE.search(s) is not None


def _valid_escapes(s: str) -> bool:
    """Check every % in s begins a valid 2-hex-digit escape (Go unescape)."""
    if "%" not in s:
        return True
    return _ESCAPE_RE.search(s) is None


def _unescape_path(s: str) -> str | None:
    """Go url.setPath / unescape(s, encodePath): decode %XX, error -> None.

    Go's encodePath mode additionally rejects nothing else for decode
    (invalid host escapes are a host-mode concern); '+' is NOT turned into
    space in path mode.
    """
    if "%" not in s:
        return s
    if not _valid_escapes(s):
        return None
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "%":
            out.append(chr(int(s[i + 1 : i + 3], 16)))
            i += 3
        else:
            out.append(c)
            i += 1
    # Go unescapes to bytes then the string is interpreted as (possibly
    # invalid) UTF-8; Python str here holds code points 0-255 which is
    # byte-equivalent for our contains-"/../" checks.
    return "".join(out)


def _get_scheme(rawurl: str) -> tuple[str, str, bool]:
    """Go net/url getScheme -> (scheme, rest, ok). ok=False means error."""
    for i, c in enumerate(rawurl):
        if c.isalpha() and ord(c) < 128:
            continue
        if (c.isdigit() or c in "+-.") and ord(c) < 128:
            if i == 0:
                return "", rawurl, True  # no scheme: starts with digit/+-.
            continue
        if c == ":":
            if i == 0:
                return "", "", False  # "missing protocol scheme"
            return rawurl[:i].lower(), rawurl[i + 1 :], True
        # invalid scheme char -> no scheme at all
        return "", rawurl, True
    return "", rawurl, True


def _parse_host(host: str) -> str | None:
    """Tiny subset of Go parseHost: reject a few invalid chars, keep rest."""
    if _has_ctl_byte(host):
        return None
    if not _valid_escapes(host):
        return None
    return host


class GoURL:
    __slots__ = ("scheme", "opaque", "host", "path", "raw_query")

    def __init__(self) -> None:
        self.scheme = ""
        self.opaque = ""
        self.host = ""
        self.path = ""
        self.raw_query = ""

    def hostname(self) -> str:
        """Go URL.Hostname(): strip any trailing :port (and [] for IPv6)."""
        host = self.host
        colon = host.rfind(":")
        if colon != -1 and colon > host.rfind("]"):
            host = host[:colon]
        if host.startswith("[") and host.endswith("]"):
            host = host[1:-1]
        return host


def go_url_parse(rawurl: str, via_request: bool) -> GoURL | None:
    """Go net/url parse(rawurl, viaRequest); None on error.

    Implements the subset relevant to log request-URIs and referer
    headers: scheme split, first-``?`` query cut, authority extraction,
    strict percent-escape validation in the path.
    """
    if not via_request:
        # Go's url.Parse cuts the '#fragment' BEFORE parsing (frag is
        # stored separately; bad %-escapes in it still fail the parse via
        # setFragment). ParseRequestURI does NOT cut fragments.
        rawurl, sep, frag = rawurl.partition("#")
        if sep:
            i = 0
            while i < len(frag):  # validate fragment escapes only
                if frag[i] == "%":
                    if (i + 2 >= len(frag) or frag[i + 1] not in _HEX
                            or frag[i + 2] not in _HEX):
                        return None
                    i += 3
                else:
                    i += 1
    if _has_ctl_byte(rawurl):
        return None
    if rawurl == "" and via_request:
        return None
    u = GoURL()
    if rawurl == "*":
        u.path = "*"
        return u
    scheme, rest, ok = _get_scheme(rawurl)
    if not ok:
        return None
    u.scheme = scheme

    if rest.endswith("?") and "?" not in rest[:-1]:
        rest = rest[:-1]  # ForceQuery
    else:
        rest, _, u.raw_query = rest.partition("?")

    if not rest.startswith("/"):
        if u.scheme != "":
            u.opaque = rest
            return u
        if via_request:
            return None
        # !viaRequest relative: "first path segment cannot contain colon"
        segment = rest.split("/", 1)[0]
        if ":" in segment:
            return None

    if (u.scheme != "" or (not via_request and not rest.startswith("///"))) and rest.startswith("//"):
        authority, rest = rest[2:], ""
        i = authority.find("/")
        if i >= 0:
            authority, rest = authority[:i], authority[i:]
        # split userinfo
        if "@" in authority:
            authority = authority.rsplit("@", 1)[1]
        host = _parse_host(authority)
        if host is None:
            return None
        u.host = host

    path = _unescape_path(rest)
    if path is None:
        return None
    u.path = path
    return u


def go_parse_request_uri(uri: str) -> GoURL | None:
    """Go url.ParseRequestURI; None on error (httpservers.go:97)."""
    return go_url_parse(uri, via_request=True)


def go_referer_hostname(referer: str) -> str | None:
    """``url.Parse(referer).Hostname()`` or None on parse error
    (httpservers.go:86-91)."""
    u = go_url_parse(referer, via_request=False)
    if u is None:
        return None
    return u.hostname()
