"""Log-line formats and row-level parse/enrich semantics of the reference.

Five anchored full-line formats (``logparsers/httpservers.go:169-318``),
two timestamp layouts (``httpservers.go:321-333``), referer normalization
(``httpservers.go:79-93``), path splitting + malicious classification
(``httpservers.go:95-165``), the metric time-window rule
(``handlers/metricgenerator.go:131-158``) and byte-wise column truncation
(``db/mysqldb.go:224-238``).

Numeric-conversion failures are ignored exactly like the Go code drops
``strconv.Atoi`` / ``time.Parse`` errors (httpservers.go:175-176): a bad
int yields 0, a bad timestamp yields the Go zero time.

These scalar functions are the single source of truth for semantics; the
Ray engine applies them vectorized (regexes via Arrow/RE2, everything
per-unique-value with caches), the pure-Python oracle applies them row
at a time. Both are pinned by the golden tests ported from
``logparsers/httpservers_test.go``.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone
from typing import NamedTuple

from .gourl import go_parse_request_uri, go_referer_hostname
from .ua import UAResult, apply_robots_txt_override, classify_user_agent

# ---- malicious enum (httpservers.go:31-38) --------------------------------
MALICIOUS_UNKNOWN = 0
MALICIOUS_INVALID = 1
MALICIOUS_SQLINJ = 10
MALICIOUS_XSS = 20
MALICIOUS_TRAVERSAL = 30
MALICIOUS_SCAN = 40  # defined, never assigned (httpservers.go:37)

# ---- format registry -------------------------------------------------------
# Named groups so pyarrow.compute.extract_regex (RE2) can vectorize the same
# pattern the scalar path uses. Group names mirror SBOHttpRequestLog fields.
FORMAT_APACHE_COMMON = "apache_common"
FORMAT_APACHE_COMBINED = "apache_combined"
FORMAT_APACHE_VHOST_COMBINED = "apache_vhost_combined"
FORMAT_NGINX_COMBINED = "nginx_combined"
FORMAT_NGINX_CUSTOM = "nginx_custom"

FORMATS = (
    FORMAT_APACHE_COMMON,
    FORMAT_APACHE_COMBINED,
    FORMAT_APACHE_VHOST_COMBINED,
    FORMAT_NGINX_COMBINED,
    FORMAT_NGINX_CUSTOM,
)

# httpservers.go:170
PATTERN_APACHE_COMMON = (
    r'^(?P<client_ip>\S+) (?P<remote_logname>\S+) (?P<remote_user>\S+) '
    r'\[(?P<ts>[^\]]+)\] "(?P<method>\S+) (?P<uri>\S+) (?P<protocol>\S+)" '
    r'(?P<status>\d+) (?P<bytes_sent>\d+)$'
)
# httpservers.go:197
PATTERN_APACHE_COMBINED = (
    r'^(?P<client_ip>\S+) (?P<remote_logname>\S+) (?P<remote_user>\S+) '
    r'\[(?P<ts>[^\]]+)\] "(?P<method>\S+) (?P<uri>\S+) (?P<protocol>\S+)" '
    r'(?P<status>\d+) (?P<bytes_sent>\d+) "(?P<referer>[^"]*)" "(?P<ua>[^"]*)"$'
)
# httpservers.go:229
PATTERN_APACHE_VHOST_COMBINED = (
    r'^(?P<domain>\S+) (?P<client_ip>\S+) (?P<remote_logname>\S+) (?P<remote_user>\S+) '
    r'\[(?P<ts>[^\]]+)\] "(?P<method>\S+) (?P<uri>\S+) (?P<protocol>\S+)" '
    r'(?P<status>\d+) (?P<bytes_sent>\d+) "(?P<referer>[^"]*)" "(?P<ua>[^"]*)"$'
)
# httpservers.go:260 (remote_logname is a literal dash, not captured)
PATTERN_NGINX_COMBINED = (
    r'^(?P<client_ip>\S+) - (?P<remote_user>\S+) '
    r'\[(?P<ts>[^\]]+)\] "(?P<method>\S+) (?P<uri>\S+) (?P<protocol>\S+)" '
    r'(?P<status>\d+) (?P<bytes_sent>\d+) "(?P<referer>[^"]*)" "(?P<ua>[^"]*)"$'
)
# httpservers.go:289 (request_time / upstream_response_time parsed then
# discarded, httpservers.go:311-316)
PATTERN_NGINX_CUSTOM = (
    r'^(?P<client_ip>\S+) - (?P<remote_user>\S+) '
    r'\[(?P<ts>[^\]]+)\] "(?P<method>\S+) (?P<uri>\S+) (?P<protocol>\S+)" '
    r'(?P<status>\d+) (?P<bytes_sent>\d+) "(?P<referer>[^"]*)" "(?P<ua>[^"]*)" '
    r'(?P<request_time>\S+) (?P<upstream_response_time>\S+)$'
)

FORMAT_PATTERNS: dict[str, str] = {
    FORMAT_APACHE_COMMON: PATTERN_APACHE_COMMON,
    FORMAT_APACHE_COMBINED: PATTERN_APACHE_COMBINED,
    FORMAT_APACHE_VHOST_COMBINED: PATTERN_APACHE_VHOST_COMBINED,
    FORMAT_NGINX_COMBINED: PATTERN_NGINX_COMBINED,
    FORMAT_NGINX_CUSTOM: PATTERN_NGINX_CUSTOM,
}
_COMPILED = {name: re.compile(p) for name, p in FORMAT_PATTERNS.items()}

# formats that capture referer + UA (apache_common does not: no referer/UA,
# and the reference leaves UserAgent nil there — we classify "" instead,
# documented divergence since the Go handlers would nil-panic on CLF input)
FORMATS_WITH_UA = frozenset(FORMATS) - {FORMAT_APACHE_COMMON}

# sentinel format: sniff the format from the source's first parseable line
FORMAT_AUTO = "auto"


def detect_format(line: str) -> str | None:
    """First-line format sniffing (main.go:728-748): try every format and
    take the LAST one that matches — the reference's detection loop has no
    ``break``, so e.g. an apache_combined line (remote_logname "-") is
    detected as nginx_combined. Reproduced bug-for-bug; the reference's
    OTHER detection accident (the shadowed ``parseResult :=`` at
    main.go:744 silently drops the detection line) is deliberately FIXED
    here — the detection line is parsed normally. Returns None when no
    format matches (the reference keeps trying on subsequent lines)."""
    found = None
    for name in FORMATS:
        if _COMPILED[name].match(line):
            found = name
    return found

# ---- timestamps ------------------------------------------------------------
# Go zero time (time.Time{}) formats as 0001-01-01 00:00:00; the reference
# drops timestamp parse errors (httpservers.go:175) so a bad ts flows through
# as the zero time and windows to 101010000 (metricgenerator.go:131-158).
GO_ZERO_TIME = datetime(1, 1, 1, tzinfo=timezone.utc)
GO_ZERO_TIME_WINDOW = 101010000

_MONTHS = {
    "Jan": 1, "Feb": 2, "Mar": 3, "Apr": 4, "May": 5, "Jun": 6,
    "Jul": 7, "Aug": 8, "Sep": 9, "Oct": 10, "Nov": 11, "Dec": 12,
}
# Day is EXACTLY 2 digits (Go layout "02" = zero-padded, fixed-width
# getnum) while hour accepts 1-2 digits (layout "15" parses non-fixed) —
# matches time.Parse on non-standard timestamps exactly
_RE_APACHE_TS = re.compile(
    r"^(\d{2})/(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)/(\d{4}):"
    r"(\d{1,2}):(\d{2}):(\d{2}) ([+-])(\d{2})(\d{2})$"
)


def parse_apache_timestamp(value: str) -> datetime:
    """ParseApacheTimestamp / ParseNginxTimestamp (httpservers.go:321-333),
    layout ``02/Jan/2006:15:04:05 -0700``; parse errors -> Go zero time."""
    m = _RE_APACHE_TS.match(value)
    if not m:
        return GO_ZERO_TIME
    day, mon, year, hh, mm, ss, sign, oh, om = m.groups()
    offset = (int(oh) * 60 + int(om)) * (1 if sign == "+" else -1)
    try:
        return datetime(
            int(year), _MONTHS[mon], int(day), int(hh), int(mm), int(ss),
            tzinfo=timezone(timedelta(minutes=offset)),
        )
    except ValueError:
        return GO_ZERO_TIME


_RE_HAPROXY_TS = re.compile(
    r"^(\d{2})/(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)/(\d{4}):"
    r"(\d{1,2}):(\d{2}):(\d{2})\.(\d{3})$"
)


def parse_haproxy_timestamp(value: str) -> datetime:
    """ParseHAProxyTimestamp (httpservers.go:326-328); unused by any format
    parser in the reference (test-only), kept for parity."""
    m = _RE_HAPROXY_TS.match(value)
    if not m:
        return GO_ZERO_TIME
    day, mon, year, hh, mm, ss, ms = m.groups()
    try:
        return datetime(
            int(year), _MONTHS[mon], int(day), int(hh), int(mm), int(ss),
            int(ms) * 1000, tzinfo=timezone.utc,
        )
    except ValueError:
        return GO_ZERO_TIME


def calculate_time_window(ts: datetime, window_minutes: int) -> int:
    """calculateTimeWindow (metricgenerator.go:131-158).

    Uses the timestamp's *local* clock fields (the Go code formats the
    parsed time directly, which retains the log's numeric zone offset),
    floors the minute to the window size and composes YYYYMMDDHHMM.
    Window sizes: {1,5,15,30,60}; anything else behaves as 10.
    """
    minutes = ts.minute
    if window_minutes == 1:
        floored = minutes
    elif window_minutes in (5, 15, 30):
        floored = minutes - (minutes % window_minutes)
    elif window_minutes == 60:
        floored = 0
    else:  # default 10
        floored = minutes - (minutes % 10)
    return (
        ts.year * 100_000_000
        + ts.month * 1_000_000
        + ts.day * 10_000
        + ts.hour * 100
        + floored
    )


# ---- referer / path / malicious -------------------------------------------
RE_UTM_SOURCE = re.compile(r"(\?|&)utm_source=([^&]+)(&|\Z)")  # httpservers.go:81
RE_XSS = re.compile(r"<script|script>|alert|onmouseover|onmouseout")  # :158
RE_SQLI = re.compile(r"'.*(insert|update|exec|execute)")  # :145


def normalize_referer(referer_header: str, request_uri: str) -> str:
    """SBOHttpRequestLogSetReferer (httpservers.go:79-93): a utm_source
    query param overrides the header; else the header's hostname with a
    leading ``www.`` stripped; else empty."""
    m = RE_UTM_SOURCE.search(request_uri)
    if m:
        return m.group(2)
    if referer_header:
        host = go_referer_hostname(referer_header)
        if host is not None:
            return host[4:] if host.startswith("www.") else host
    return ""


class PathInfo(NamedTuple):
    path: str
    path1: str
    path2: str
    path3: str
    malicious: int


def split_path(request_uri: str) -> PathInfo:
    """SBOHttpRequestLogSetPath (httpservers.go:95-131) + the malicious
    classifiers (httpservers.go:124-165).

    Precedence: INVALID on URL-parse failure (path = uri cut before '?',
    no path1-3) > TRAVERSAL (decoded path contains '/../' or raw uri
    contains '%00') > XSS > SQLI (both on the raw query, case-sensitive)
    > UNKNOWN.
    """
    parsed = go_parse_request_uri(request_uri)
    if parsed is None:
        return PathInfo(request_uri.split("?", 1)[0], "", "", "", MALICIOUS_INVALID)

    path = parsed.path
    path1 = path2 = path3 = ""
    if path:
        parts = path.split("/")
        if len(parts) == 1:
            path1 = "/"
        if len(parts) > 1:
            path1 = "/" + parts[1]
        if len(parts) > 2:
            path2 = path1 + "/" + parts[2]
        if len(parts) > 3:
            path3 = path2 + "/" + parts[3]

    malicious = MALICIOUS_UNKNOWN
    if "/../" in parsed.path or "%00" in request_uri:
        malicious = MALICIOUS_TRAVERSAL
    elif RE_XSS.search(parsed.raw_query):
        malicious = MALICIOUS_XSS
    elif RE_SQLI.search(parsed.raw_query):
        malicious = MALICIOUS_SQLINJ
    return PathInfo(path, path1, path2, path3, malicious)


# ---- truncation (db/mysqldb.go:224-238; byte-wise) -------------------------
# Go slices raw bytes and will happily store an invalid-UTF-8 tail; Arrow
# strings must be valid UTF-8, so a truncation that splits a multibyte
# character DROPS the partial character (errors="ignore") — ≤3 bytes
# shorter than Go's cut, never longer; documented divergence.
def reduce_to_max_len(s: str, n: int) -> str:
    b = s.encode("utf-8", "surrogateescape")
    if len(b) <= n:
        return s
    return b[:n].decode("utf-8", "ignore")


def reduce_to_max_len_keeping_last(s: str, n: int) -> str:
    b = s.encode("utf-8", "surrogateescape")
    if len(b) <= n:
        return s
    return b[len(b) - n:].decode("utf-8", "ignore")


# ---- scalar full-row parse (oracle path) ----------------------------------
class ParsedLine(NamedTuple):
    ok: bool
    domain: str
    client_ip: str
    remote_logname: str
    remote_user: str
    ts: datetime  # tz-aware local time (Go zero time on parse error)
    method: str
    uri: str
    path: str
    path1: str
    path2: str
    path3: str
    protocol: str
    status: str
    bytes_sent: int
    referer: str
    ua: UAResult | None
    malicious: int


_FAILED = ParsedLine(
    False, "", "", "", "", GO_ZERO_TIME, "", "", "", "", "", "", "", "", 0, "",
    None, MALICIOUS_UNKNOWN,
)


def parse_line(line: str, fmt: str) -> ParsedLine:
    """Row-at-a-time parse with the reference's per-format semantics
    (httpservers.go:169-318). Returns ``ok=False`` on format mismatch
    (== the Go parsers' ErrInvalidLogFormat)."""
    m = _COMPILED[fmt].match(line)
    if m is None:
        return _FAILED
    g = m.groupdict()
    uri = g["uri"]
    pathinfo = split_path(uri)
    bytes_sent = int(g["bytes_sent"])
    if bytes_sent > 0x7FFFFFFFFFFFFFFF:
        # Go's strconv.Atoi returns the RANGE-CLAMPED value (MaxInt64)
        # alongside ErrRange, and the reference drops the error
        # (httpservers.go:175-176) -> the clamped max is what's stored
        bytes_sent = 0x7FFFFFFFFFFFFFFF

    if fmt in FORMATS_WITH_UA:
        referer = normalize_referer(g["referer"], uri)
        ua = classify_user_agent(g["ua"])
        ua = apply_robots_txt_override(ua, pathinfo.path1)
    else:
        referer = ""
        # divergence from the reference (documented): CLF leaves UserAgent
        # nil and the Go handlers would nil-panic; we classify "" instead.
        ua = apply_robots_txt_override(classify_user_agent(""), pathinfo.path1)

    return ParsedLine(
        ok=True,
        domain=g.get("domain", "") or "",
        client_ip=g["client_ip"],
        remote_logname=g.get("remote_logname", ""),  # nginx: not captured, stays "" (httpservers.go:269-277)
        remote_user=g["remote_user"],
        ts=parse_apache_timestamp(g["ts"]),
        method=g["method"],
        uri=uri,
        path=pathinfo.path,
        path1=pathinfo.path1,
        path2=pathinfo.path2,
        path3=pathinfo.path3,
        protocol=g["protocol"],
        status=g["status"],
        bytes_sent=bytes_sent,
        referer=referer,
        ua=ua,
        malicious=pathinfo.malicious,
    )
