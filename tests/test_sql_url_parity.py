"""The pure-SQL Go net/url + malicious classifier (queries._sql_url_ctes)
is a genuinely independent THIRD implementation of split_path; pin it
against the Python port (itself golden-tested against the reference's
httpservers_test.go) over adversarial URIs and the full corpus URI set.
No Ray needed."""

import duckdb
import pandas as pd
import pytest

from sbo_ray.functions.loglines import split_path
from sbo_ray.pipelines.queries import _sql_url_ctes

ADVERSARIAL = [
    "/", "/a", "/a/b", "/a/b/c", "/a/b/c/d", "/a/b/c/d/e",
    "/a?x=1", "/a?", "/a??b", "/a?b?c", "*", "",
    "/a%20b", "/a%2Fb", "/a%zz", "/a%2", "/a%",
    "/%c3%a9", "/a+b", "/a%00b", "/x?%zz",
    "http://host/p/q", "http://host", "http://host?q=1", "http://u:p@host/x",
    "https://host:8080/a/b", "mailto:user@x", "weird:stuff", ":bad",
    "//noscheme/path", "///triple/slash", "/a#frag", "/a#fr%zz",
    "/search?q='; insert into x", "/q?a='1' update t", "/q?x=<script>alert(1)",
    "/q?onmouseover=1", "/../etc/passwd", "/a/../b", "/a/%2e%2e/b",
    "/a/..%2fb", "/%2e%2e%2f", "/robots.txt", "0http://x/y", "h_ttp://x",
    "HTTP://Host/Path", "/a b", "\x01/x", "/a\x7fb",
    "ftp://h/../x", "/?q=1", "?q=1", "/a/b?x=%00",
    "/%41%42/c", "/%ff", "/a//b///c", "scheme:", "scheme:?q=1",
    "/a?b=%27%20insert", "*?q=1", "a/b", "./rel", "../rel",
    "/%F0%9F%92%A9", "/a%2zb", "/a?'exec", "/A?'EXEC", "/q?SCRIPT>",
]

_SQL = "WITH parsedu AS (SELECT uri FROM uris)" + _sql_url_ctes() + """
SELECT uri, path, path1, path2, path3, malicious FROM urlparsed
"""


def _compare(uris):
    con = duckdb.connect()
    con.register("uris", pd.DataFrame({"uri": list(uris)}))
    got = con.sql(_SQL).df()
    mismatches = []
    for _, row in got.iterrows():
        want = split_path(row["uri"])
        g = (row["path"], row["path1"], row["path2"], row["path3"],
             int(row["malicious"]))
        w = (want.path, want.path1, want.path2, want.path3, want.malicious)
        if g != w:
            mismatches.append((row["uri"], g, w))
    assert not mismatches, mismatches[:5]
    return len(got)


def test_sql_split_path_adversarial():
    assert _compare(ADVERSARIAL) == len(ADVERSARIAL)


def test_sql_split_path_full_corpus():
    from sbo_ray import synth
    from sbo_ray.functions.loglines import parse_line
    from sbo_ray.oracle import materialize

    cache = materialize.cache_dir_for("/root/testdata/sf0.001")
    con = duckdb.connect()
    lines = con.sql(
        f"SELECT line, source FROM read_parquet('{cache}/lines.parquet')").df()
    uris = set()
    for line, src in zip(lines["line"], lines["source"]):
        row = parse_line(line, synth.source_format(int(src[4:])))
        if row.ok and row.uri:
            uris.add(row.uri)
    assert len(uris) > 100
    _compare(sorted(uris))
