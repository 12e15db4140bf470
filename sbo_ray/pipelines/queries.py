"""Driver-contract query registry: name -> (Ray callable, DuckDB oracle SQL).

Two oracle styles (documented per query):

- **independent SQL**: a genuinely independent DuckDB implementation of
  the same semantics over the raw line view (regexp parse + window math
  in SQL) — the strongest gate; used for the parse/aggregate layer.
- **materialized oracle**: the pure-Python row-at-a-time oracle's output
  dumped to Parquet and SELECTed — used for the UA-/URL-decision-tree
  sinks where faithful ANSI SQL is not practical. The comparison is then
  engine-vs-independent-implementation, which is exactly the
  north_rule's correctness gate.

All SQL strings target the sf0.01 cache (the driver's correctness
scale); ``oracle_sql_map()`` materializes that cache before returning.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc

from .. import synth
from ..config import JobConfig
from ..oracle import materialize
from . import logpipe

SF_CORRECTNESS = "/root/testdata/sf0.01"

# ---- DuckDB patterns (same RE2 semantics as the engine's, unnamed groups)
_P = {
    0: r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) (\S+)" (\d+) (\d+)$',
    1: r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) (\S+)" (\d+) (\d+) "([^"]*)" "([^"]*)"$',
    2: r'^(\S+) (\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) (\S+)" (\d+) (\d+) "([^"]*)" "([^"]*)"$',
    3: r'^(\S+) - (\S+) \[([^\]]+)\] "(\S+) (\S+) (\S+)" (\d+) (\d+) "([^"]*)" "([^"]*)"$',
    4: r'^(\S+) - (\S+) \[([^\]]+)\] "(\S+) (\S+) (\S+)" (\d+) (\d+) "([^"]*)" "([^"]*)" (\S+) (\S+)$',
}


# per-field (format -> capture-group index); DuckDB needs constant
# pattern+group per regexp call, so every extraction is a CASE over fi
_GROUPS = {
    "ts": {0: 4, 1: 4, 2: 5, 3: 3, 4: 3},
    "method": {0: 5, 1: 5, 2: 6, 3: 4, 4: 4},
    "uri": {0: 6, 1: 6, 2: 7, 3: 5, 4: 5},
    "status": {0: 8, 1: 8, 2: 9, 3: 7, 4: 7},
    "bytes": {0: 9, 1: 9, 2: 10, 3: 8, 4: 8},
    "client_ip": {0: 1, 1: 1, 2: 2, 3: 1, 4: 1},
}


def _single_group(pattern: str, keep: int) -> str:
    """Rewrite a pattern so only capture group ``keep`` stays capturing
    (DuckDB's regexp_extract group index is limited to 0..9)."""
    out, gi = [], 0
    for ch in pattern:
        if ch == "(":
            gi += 1
            out.append("(" if gi == keep else "(?:")
        else:
            out.append(ch)
    return "".join(out)


def _extract_case(field: str) -> str:
    arms = " ".join(
        "WHEN {} THEN regexp_extract(line, '{}', 1)".format(
            fi, _single_group(_P[fi], _GROUPS[field][fi])
        )
        for fi in range(5)
    )
    return f"CASE fi {arms} END"


def _matches_case() -> str:
    arms = " ".join(
        f"WHEN {fi} THEN regexp_matches(line, '{_P[fi]}')" for fi in range(5)
    )
    return f"CASE fi {arms} END"


def _pattern_cte(cache: str) -> str:
    """Shared SQL prefix: per-source format index (mirrors
    synth.source_format: source index %% 5 over FORMATS)."""
    return f"""
WITH pat AS (
  SELECT doc_id, line, source, CAST(substr(source, 5) AS INT) % 5 AS fi
  FROM read_parquet('{cache}/lines.parquet')
)"""


def sql_metrics_basic(cache: str) -> str:
    """Independent SQL: REQ_COUNT / BYTES_SENT / HTTP_STATUS / METHOD
    metrics (types 1,2,3,5) incl. the local-clock time-window rule."""
    return _pattern_cte(cache) + f"""
, parsed AS (
  SELECT source,
    {_extract_case("ts")} AS ts_str,
    {_extract_case("method")} AS method,
    {_extract_case("status")} AS status,
    CAST({_extract_case("bytes")} AS BIGINT) AS bytes_sent
  FROM pat WHERE {_matches_case()}
), win AS (
  SELECT source, method, status, bytes_sent,
    try_strptime(split_part(ts_str, ' ', 1), '%d/%b/%Y:%H:%M:%S') AS lt
  FROM parsed
), w2 AS (
  SELECT source, method, status, bytes_sent,
    CAST(year(lt) AS BIGINT)*100000000 + month(lt)*1000000 + day(lt)*10000
      + hour(lt)*100 + (minute(lt) - minute(lt)%10) AS time_window
  FROM win
)
SELECT source, CAST(1 AS INTEGER) AS metric_type, '' AS key_value,
       time_window, CAST(COUNT(*) AS BIGINT) AS metric_value
FROM w2 GROUP BY source, time_window
UNION ALL
SELECT source, CAST(2 AS INTEGER), '', time_window, CAST(SUM(bytes_sent) AS BIGINT)
FROM w2 GROUP BY source, time_window
UNION ALL
SELECT source, CAST(3 AS INTEGER), status, time_window, CAST(COUNT(*) AS BIGINT)
FROM w2 GROUP BY source, status, time_window
UNION ALL
SELECT source, CAST(5 AS INTEGER), method, time_window, CAST(COUNT(*) AS BIGINT)
FROM w2 GROUP BY source, method, time_window
"""


def sql_parse_stats(cache: str) -> str:
    """Independent SQL: per-source line/parse/error counts (the lineage
    counters, main.go:700-707)."""
    return _pattern_cte(cache) + f"""
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS total_lines,
  CAST(SUM(CASE WHEN {_matches_case()} THEN 1 ELSE 0 END) AS BIGINT) AS parsed,
  CAST(SUM(CASE WHEN {_matches_case()} THEN 0 ELSE 1 END) AS BIGINT) AS parse_errors
FROM pat GROUP BY source
"""


def sql_geo_counts(cache: str) -> str:
    """Independent SQL mirror of the broadcast geo lookup (/24 prefixes)."""
    return _pattern_cte(cache) + f"""
, parsed AS (
  SELECT source, {_extract_case("client_ip")} AS ip
  FROM pat WHERE {_matches_case()}
)
SELECT source,
  CASE WHEN ip LIKE '192.0.2.%' THEN 'testnet-1'
       WHEN ip LIKE '198.51.100.%' THEN 'testnet-2'
       WHEN ip LIKE '203.0.113.%' THEN 'testnet-3'
       ELSE 'unknown' END AS geo,
  CAST(COUNT(*) AS BIGINT) AS cnt
FROM parsed GROUP BY 1, 2
"""


def sql_status_class_counts(cache: str) -> str:
    return _pattern_cte(cache) + f"""
, parsed AS (
  SELECT source, {_extract_case("status")} AS status
  FROM pat WHERE {_matches_case()}
)
SELECT source, substr(status, 1, 1) || 'xx' AS status_class,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM parsed GROUP BY 1, 2
"""


def sql_counter_deltas(cache: str) -> str:
    """Independent SQL: windowed counter deltas (counter.go:53-56,
    255-284) — the reference's per-tick report is (current cumulative,
    current-previous); in event-time the per-window count IS that delta
    and the running sum is the cumulative, via SUM OVER."""
    return _pattern_cte(cache) + f"""
, parsed AS (
  SELECT source,
    {_extract_case("ts")} AS ts_str,
    {_extract_case("method")} AS method,
    {_extract_case("status")} AS status,
    {_extract_case("client_ip")} AS ip
  FROM pat WHERE {_matches_case()}
), w2 AS (
  SELECT source, method, status, ip,
    CAST(year(lt) AS BIGINT)*100000000 + month(lt)*1000000 + day(lt)*10000
      + hour(lt)*100 + (minute(lt) - minute(lt)%10) AS time_window
  FROM (SELECT *, try_strptime(split_part(ts_str, ' ', 1),
                               '%d/%b/%Y:%H:%M:%S') AS lt FROM parsed)
), counts AS (
  SELECT source, 'status_codes' AS dimension, status AS key_value,
         time_window, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM w2 GROUP BY source, status, time_window
  UNION ALL
  SELECT source, 'methods', method, time_window, CAST(COUNT(*) AS BIGINT)
  FROM w2 GROUP BY source, method, time_window
  UNION ALL
  SELECT source, 'clients', ip, time_window, CAST(COUNT(*) AS BIGINT)
  FROM w2 GROUP BY source, ip, time_window
)
SELECT source, dimension, key_value, time_window, cnt,
       CAST(SUM(cnt) OVER (PARTITION BY source, dimension, key_value
                           ORDER BY time_window
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative
FROM counts
"""


# ---- Go net/url parse + malicious classifier, in pure SQL ------------------
#
# A genuinely independent third implementation of split_path
# (httpservers.go:95-165 / functions/gourl.py + loglines.split_path):
# scheme scan, ForceQuery / first-'?' query cut, authority + userinfo
# strip, strict %-escape validation, Latin-1-style byte decode (chr per
# byte — matches Go's byte-string unescape), path1-3 splitting and the
# INVALID > TRAVERSAL > XSS > SQLI precedence. Validated against the
# Python port over 63 adversarial URIs + every distinct corpus URI
# (tests/test_sql_url_parity.py).

_HEXD = "0123456789abcdef"


def _sql_hexval(c: str) -> str:
    return f"(strpos('{_HEXD}', lower({c}))-1)"


def _sql_bad_escapes(col: str) -> str:
    """True iff ``col`` contains a '%' not starting a valid 2-hex escape
    (RE2 has no lookahead, so check the split parts)."""
    parts = f"str_split({col}, '%')"
    return (f"(strpos({col}, '%') > 0 AND list_bool_or(list_transform("
            f"list_slice({parts}, 2, len({parts})),"
            f" p -> NOT regexp_matches(substr(p, 1, 2), '^[0-9a-fA-F]{{2}}$'))))")


def _sql_decode(col: str) -> str:
    """Percent-decode (escapes pre-validated): chr(byte) per %XX, i.e.
    Latin-1 code points exactly like the engine's _unescape_path."""
    parts = f"str_split({col}, '%')"
    return (f"CASE WHEN strpos({col}, '%') = 0 THEN {col} ELSE "
            f"list_extract({parts}, 1) || list_aggregate("
            f"list_transform(list_slice({parts}, 2, len({parts})),"
            f" p -> chr(CAST({_sql_hexval('substr(p,1,1)')}*16"
            f" + {_sql_hexval('substr(p,2,1)')} AS INTEGER)) || substr(p, 3)),"
            f" 'string_agg', '') END")


def _sql_url_ctes() -> str:
    """CTE chain ``u0``..``urlparsed``: expects a prior CTE ``parsedu``
    with a ``uri`` column (other columns pass through); yields ``path``,
    ``path1..3`` and ``malicious``."""
    return f"""
, u0 AS (
  SELECT *,
    regexp_matches(uri, '[\\x00-\\x1f\\x7f]') AS has_ctl,
    CASE WHEN regexp_matches(uri, '^[A-Za-z][A-Za-z0-9+.\\-]*:')
         THEN lower(regexp_extract(uri, '^([A-Za-z][A-Za-z0-9+.\\-]*):', 1)) ELSE '' END AS scheme,
    CASE WHEN regexp_matches(uri, '^[A-Za-z][A-Za-z0-9+.\\-]*:')
         THEN regexp_extract(uri, '^[A-Za-z][A-Za-z0-9+.\\-]*:(.*)$', 1) ELSE uri END AS rest
  FROM parsedu
), u1 AS (
  SELECT *,
    CASE WHEN ends_with(rest, '?') AND strpos(substr(rest, 1, len(rest)-1), '?') = 0
         THEN substr(rest, 1, len(rest)-1) ELSE split_part(rest, '?', 1) END AS rest2,
    CASE WHEN ends_with(rest, '?') AND strpos(substr(rest, 1, len(rest)-1), '?') = 0 THEN ''
         WHEN strpos(rest, '?') > 0 THEN substr(rest, strpos(rest, '?')+1)
         ELSE '' END AS raw_query
  FROM u0
), u2 AS (
  SELECT *,
    (scheme <> '' AND rest2 LIKE '//%') AS has_auth,
    CASE WHEN scheme <> '' AND rest2 LIKE '//%' THEN substr(rest2, 3) ELSE '' END AS authfull
  FROM u1
), u3 AS (
  SELECT *,
    CASE WHEN has_auth AND strpos(authfull, '/') > 0
         THEN substr(authfull, 1, strpos(authfull, '/')-1)
         WHEN has_auth THEN authfull ELSE '' END AS auth,
    CASE WHEN has_auth AND strpos(authfull, '/') > 0 THEN substr(authfull, strpos(authfull, '/'))
         WHEN has_auth THEN ''
         ELSE rest2 END AS prepath
  FROM u2
), u4 AS (
  SELECT *,
    CASE WHEN strpos(auth, '@') > 0 THEN regexp_extract(auth, '@([^@]*)$', 1) ELSE auth END AS hostp
  FROM u3
), u5 AS (
  SELECT *,
    (uri = '*') AS is_star,
    (uri <> '*' AND scheme <> '' AND NOT rest2 LIKE '/%') AS is_opaque,
    (has_ctl OR uri = '' OR uri LIKE ':%'
      OR (uri <> '*' AND scheme = '' AND NOT rest2 LIKE '/%')
      OR (has_auth AND (regexp_matches(hostp, '[\\x00-\\x1f\\x7f]') OR {_sql_bad_escapes('hostp')}))
      OR (uri <> '*' AND NOT (scheme <> '' AND NOT rest2 LIKE '/%') AND {_sql_bad_escapes('prepath')})
    ) AS parse_fail
  FROM u4
), u6 AS (
  SELECT *,
    CASE WHEN parse_fail THEN split_part(uri, '?', 1)
         WHEN is_star THEN '*'
         WHEN is_opaque THEN ''
         ELSE {_sql_decode('prepath')} END AS path,
    CASE WHEN parse_fail OR is_star THEN '' ELSE raw_query END AS rq
  FROM u5
), u7 AS (
  SELECT *, CASE WHEN parse_fail THEN 0 ELSE len(str_split(path, '/')) END AS nseg
  FROM u6
), urlparsed AS (
  SELECT *,
    CASE WHEN parse_fail OR path = '' THEN '' WHEN nseg = 1 THEN '/'
         ELSE '/' || str_split(path,'/')[2] END AS path1,
    CASE WHEN NOT parse_fail AND path <> '' AND nseg > 2
         THEN '/' || str_split(path,'/')[2] || '/' || str_split(path,'/')[3] ELSE '' END AS path2,
    CASE WHEN NOT parse_fail AND path <> '' AND nseg > 3
         THEN '/' || str_split(path,'/')[2] || '/' || str_split(path,'/')[3] || '/' || str_split(path,'/')[4]
         ELSE '' END AS path3,
    CASE WHEN parse_fail THEN 1
         WHEN strpos(path, '/../') > 0 OR strpos(uri, '%00') > 0 THEN 30
         WHEN regexp_matches(rq, '<script|script>|alert|onmouseover|onmouseout') THEN 20
         WHEN regexp_matches(rq, $sqli${_SQLI_RE}$sqli$) THEN 10
         ELSE 0 END AS malicious
  FROM u7
)"""


_SQLI_RE = "'.*(insert|update|exec|execute)"


def sql_top_paths(cache: str) -> str:
    """Independent SQL: per-source exact top-10 full paths with the
    engine's deterministic (cnt desc, key asc) tie-break — the counter
    'paths' dimension counts the FULL decoded path of every parsed row
    (counter.go:222), including the raw-cut path of INVALID URIs."""
    return _pattern_cte(cache) + f"""
, parsedu AS (
  SELECT source, {_extract_case("uri")} AS uri
  FROM pat WHERE {_matches_case()}
)""" + _sql_url_ctes() + """
, counts AS (
  SELECT source, path AS key_value, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM urlparsed GROUP BY source, path
), ranked AS (
  SELECT source, key_value, cnt,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, key_value ASC) AS rk
  FROM counts
)
SELECT source, key_value, cnt FROM ranked WHERE rk <= 10
"""


def sql_repeat_offenders(cache: str) -> str:
    """Independent SQL: the lastN ring-buffer flagging (the
    metricgenerator.go:73 TODO implemented as intended) — per (source,
    client) sliding last-50 window over parsed rows in file order,
    flagged when the window ever holds >= 3 malicious requests."""
    return _pattern_cte(cache) + f"""
, parsedu AS (
  SELECT source, doc_id, {_extract_case("client_ip")} AS client_ip,
         {_extract_case("uri")} AS uri
  FROM pat WHERE {_matches_case()}
)""" + _sql_url_ctes() + """
, rolled AS (
  SELECT source, client_ip,
    SUM(CASE WHEN malicious <> 0 THEN 1 ELSE 0 END) OVER (
      PARTITION BY source, client_ip ORDER BY doc_id
      ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS win_bad
  FROM urlparsed
)
SELECT source, client_ip,
  CAST(COUNT(*) AS BIGINT) AS n_requests,
  CAST(MAX(win_bad) AS BIGINT) AS max_malicious_in_window,
  CAST(CASE WHEN MAX(win_bad) >= 3 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM rolled GROUP BY source, client_ip
"""


def sql_distinct_clients(cache: str) -> str:
    return _pattern_cte(cache) + f"""
, parsed AS (
  SELECT source, {_extract_case("client_ip")} AS ip
  FROM pat WHERE {_matches_case()}
)
SELECT source, CAST(COUNT(DISTINCT ip) AS BIGINT) AS n_clients
FROM parsed GROUP BY source
"""


# ---- Ray-side callables ----------------------------------------------------
def _input_paths(sf_dir: str) -> list[str]:
    cache = materialize.cache_dir_for(sf_dir)
    return sorted(glob.glob(os.path.join(cache, "shard-*.parquet")))


def _job() -> JobConfig:
    return JobConfig.from_format_map(synth.source_config(materialize.N_SOURCES))


def _enriched(sf_dir: str):
    return logpipe.enriched_dataset(_input_paths(sf_dir), _job())


def q_log_metrics(sf_dir: str):
    return logpipe.metrics_dataset(_enriched(sf_dir))


def _metrics_basic_from(enr):
    """Basic metric types (1,2,3,5) — shared by the explicit-config and
    auto-detect queries so the filter cannot drift between them."""
    basic = pa.array([1, 2, 3, 5], type=pa.int32())
    return logpipe.metrics_dataset(enr).map_batches(
        lambda t: t.filter(pc.is_in(t["metric_type"], value_set=basic)),
        batch_format="pyarrow",
    )


def q_log_metrics_basic(sf_dir: str):
    return _metrics_basic_from(_enriched(sf_dir))


def q_log_metrics_compat(sf_dir: str):
    """Faithful streaming bounded-window semantics (stages/compat.py).
    On chronological input (the default synth) its totals coincide with
    the exact oracle dump, so the same materialized oracle gates it."""
    from ..stages.compat import metrics_dataset_compat

    return metrics_dataset_compat(_enriched(sf_dir), window_size=3)


def q_log_keyed_counters(sf_dir: str):
    return logpipe.keyed_counters_dataset(_enriched(sf_dir))


def q_log_global_counters(sf_dir: str):
    c = logpipe.global_counters(_enriched(sf_dir))
    return pa.table({
        "requests": pa.array([c["requests"]], type=pa.int64()),
        "bytes_sent": pa.array([c["bytes_sent"]], type=pa.int64()),
        "humans": pa.array([c["humans"]], type=pa.int64()),
        "non_humans": pa.array([c["non_humans"]], type=pa.int64()),
        "malicious": pa.array([c["malicious"]], type=pa.int64()),
        "parse_errors": pa.array([c["parse_errors"]], type=pa.int64()),
    })


def q_log_routed(sf_dir: str):
    routed = logpipe.routed_dataset(_enriched(sf_dir))
    cols = [c for c in routed.schema().names if c != "tokens"]
    return routed.select_columns(cols)


def q_log_routed_masked(sf_dir: str):
    """IP-masked raw-log sink (MaskIPs=1): null client_ip, keep-last-part
    UA truncation (db/mysqldb.go:166-170, 208)."""
    routed = logpipe.routed_dataset(_enriched(sf_dir), mask_ips=True)
    cols = [c for c in routed.schema().names if c != "tokens"]
    return routed.select_columns(cols)


def q_log_top_paths(sf_dir: str):
    kc = logpipe.keyed_counters_dataset(_enriched(sf_dir))
    return logpipe.top_n_dataset(kc, "paths", 10)


def q_log_geo_counts(sf_dir: str):
    """GeoIP-style broadcast-lookup enrich -> per (source, geo) counts."""
    from ..stages.geo import make_geo_enricher

    enr = _enriched(sf_dir).map_batches(
        make_geo_enricher(), batch_format="pyarrow"
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("parse_ok"))
        g = t.select(["source", "geo"]).group_by(["source", "geo"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["source", "geo", "cnt"])

    parts = pa.concat_tables(
        enr.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    g = parts.group_by(["source", "geo"]).aggregate([("cnt", "sum")])
    g = g.rename_columns(["source", "geo", "cnt"])
    return pa.table({
        "source": g.column("source"),
        "geo": g.column("geo"),
        "cnt": g.column("cnt").cast(pa.int64()),
    })


def q_log_status_class_counts(sf_dir: str):
    """Status-class (2xx/3xx/4xx/5xx) enrichment counts per source."""
    enr = _enriched(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("parse_ok"))
        cls = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(t.column("status").combine_chunks(), 0, 1),
            "xx", "",
        )
        g = pa.table({"source": t.column("source").combine_chunks(),
                      "status_class": cls}).group_by(
            ["source", "status_class"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "status_class", "cnt"])

    parts = pa.concat_tables(
        enr.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    g = parts.group_by(["source", "status_class"]).aggregate([("cnt", "sum")])
    g = g.rename_columns(["source", "status_class", "cnt"])
    return pa.table({
        "source": g.column("source"),
        "status_class": g.column("status_class"),
        "cnt": g.column("cnt").cast(pa.int64()),
    })


def q_log_distinct_clients(sf_dir: str):
    """Distinct client IPs per source (the distinct/unique operator),
    derived from the keyed-counter aggregate (clients dimension)."""
    kc = logpipe.keyed_counters_dataset(_enriched(sf_dir))
    df = logpipe.to_pandas_with_schema(
        kc.filter(expr='dimension == "clients"'),
        pa.schema([("source", pa.string()), ("dimension", pa.string()),
                   ("key_value", pa.string()), ("cnt", pa.int64())]),
    )
    out = df.groupby("source").size().reset_index(name="n_clients")
    out["n_clients"] = out["n_clients"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def q_log_distinct_clients_hll(sf_dir: str):
    """Approximate distinct clients per source via mergeable HyperLogLog
    sketches (one 2^p-register sketch per block, max-merged — the scale
    path where exact distinct counting would shuffle every key). No SQL
    gate (estimates are approximate by nature); accuracy vs the exact
    count is asserted in tests/test_joins_hll.py and in the driver by
    comparing row counts with log_distinct_clients."""
    import numpy as np

    from ..stages.hll import HyperLogLog, _hash_strings

    P = 12

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("parse_ok"))
        srcs, sketches = [], []
        if t.num_rows:
            enc = pc.dictionary_encode(t.column("source").combine_chunks())
            ips = t.column("client_ip").combine_chunks()
            for i, src in enumerate(enc.dictionary.to_pylist()):
                uniq = pc.unique(ips.filter(pc.equal(enc.indices, i))).to_pylist()
                hll = HyperLogLog(P)
                hll.add_hashes(_hash_strings([str(u) for u in uniq]))
                srcs.append(src)
                sketches.append(hll.registers.tobytes())
        return pa.table({
            "source": pa.array(srcs, type=pa.string()),
            "sketch": pa.array(sketches, type=pa.binary()),
        })

    parts = pa.concat_tables(
        _enriched(sf_dir).map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    merged: dict[str, HyperLogLog] = {}
    for src, blob in zip(parts.column("source").to_pylist(),
                         parts.column("sketch").to_pylist()):
        hll = merged.get(src)
        if hll is None:
            hll = merged[src] = HyperLogLog(P)
        other = HyperLogLog(P)
        other.registers = np.frombuffer(blob, dtype=np.uint8).copy()
        hll.merge(other)
    rows = sorted((s, int(round(h.estimate()))) for s, h in merged.items())
    return pa.table({
        "source": pa.array([r[0] for r in rows], type=pa.string()),
        "n_clients_est": pa.array([r[1] for r in rows], type=pa.int64()),
    })


def q_log_top_paths_cms(sf_dir: str):
    """Approximate top-K paths via per-partition count-min + merge (the
    north-star sketch mode; exact `log_top_paths` is its oracle). No SQL
    gate: estimates are upper bounds, asserted in tests/test_sketch.py."""
    from ..stages.sketch import topk_count_min

    enriched = _enriched(sf_dir).map_batches(
        lambda t: t.filter(t.column("parse_ok")), batch_format="pyarrow"
    )
    return topk_count_min(enriched, "path", k=10)


def _parse_stats_from(enr) -> pa.Table:
    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([("parse_ok", "sum"), ("parse_ok", "count")])
        return g.rename_columns(["source", "parsed", "total_lines"])

    agg = (
        enr.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .sum(["parsed", "total_lines"])
    )
    df = logpipe.to_pandas_with_schema(
        agg,
        pa.schema([("source", pa.string()), ("sum(parsed)", pa.int64()),
                   ("sum(total_lines)", pa.int64())]),
    ).rename(
        columns={"sum(parsed)": "parsed", "sum(total_lines)": "total_lines"}
    )
    df["parse_errors"] = df["total_lines"] - df["parsed"]
    df = df[["source", "total_lines", "parsed", "parse_errors"]]
    for c in ("total_lines", "parsed", "parse_errors"):
        df[c] = df[c].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


def q_log_parse_stats(sf_dir: str):
    return _parse_stats_from(_enriched(sf_dir))


def q_log_repeat_offenders(sf_dir: str):
    """ST5 lastN window, implemented AS INTENDED (the reference's ring
    buffer is write-only dead code; its TODO at metricgenerator.go:73
    says "check if we received invalid requests from a client repeatedly
    -> malicious"): per (source, client_ip), a sliding window over the
    client's last 50 parsed entries in file order counts malicious
    requests; a client whose window ever holds >=3 is flagged.

    Ray shape: groupby(client).map_groups with a vectorized pandas
    rolling sum (one client's history fits a worker — the sessionize
    contract); the oracle is a literal row-at-a-time ring buffer."""

    def offenders(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable")
        bad = (g["malicious"] != 0).astype("int64")
        max_in_window = int(bad.rolling(50, min_periods=1).sum().max())
        return pd.DataFrame({
            "source": [g["source"].iloc[0]],
            "client_ip": [g["client_ip"].iloc[0]],
            "n_requests": pd.array([len(g)], dtype="int64"),
            "max_malicious_in_window": pd.array([max_in_window], dtype="int64"),
            "flagged": pd.array([1 if max_in_window >= 3 else 0], dtype="int64"),
        })

    import pandas as pd

    enr = _enriched(sf_dir).map_batches(
        lambda t: t.filter(t.column("parse_ok")).select(
            ["source", "client_ip", "doc_id", "malicious"]),
        batch_format="pyarrow",
    )
    return enr.groupby(["source", "client_ip"]).map_groups(
        offenders, batch_format="pandas")


def q_log_counter_deltas(sf_dir: str):
    """K1-deltas: the counter report's per-interval view (counter.go
    53-56 CurrentValue/PreviousValue, 255-284 startNewWindow) in
    event-time: per (source, dimension, key_value, time_window) the
    in-window count (== current-previous of the cumulative counter) and
    the running cumulative. Distributed melt + partial agg + tree/stream
    combine; the running sum runs over the (bounded, aggregate-sized)
    counter table on the driver — same contract as the top-N report."""
    import numpy as np

    from ..stages.metrics import const_str

    enr = _enriched(sf_dir)
    dims = (("status_codes", "status"), ("methods", "method"),
            ("clients", "client_ip"))

    def melt(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("parse_ok"))
        n = t.num_rows
        pieces = []
        if n:
            ones = pa.array(np.ones(n, dtype=np.int64))
            for dim, col in dims:
                pieces.append(pa.table({
                    "source": t.column("source").combine_chunks(),
                    "dimension": const_str(n, dim),
                    "key_value": t.column(col).combine_chunks(),
                    "time_window": t.column("time_window").combine_chunks(),
                    "cnt": ones,
                }))
        if not pieces:
            return pa.schema([
                ("source", pa.string()), ("dimension", pa.string()),
                ("key_value", pa.string()), ("time_window", pa.int64()),
                ("cnt", pa.int64()),
            ]).empty_table()
        long_t = pa.concat_tables(pieces)
        keys = ["source", "dimension", "key_value", "time_window"]
        g = long_t.group_by(keys).aggregate([("cnt", "sum")])
        return g.rename_columns(keys + ["cnt"])

    long_ds = enr.map_batches(melt, batch_format="pyarrow")
    agg = logpipe._stream_merge(
        long_ds, ["source", "dimension", "key_value", "time_window"], "cnt",
        schema=pa.schema([
            ("source", pa.string()), ("dimension", pa.string()),
            ("key_value", pa.string()), ("time_window", pa.int64()),
            ("cnt", pa.int64()),
        ]))
    df = agg.to_pandas().sort_values(
        ["source", "dimension", "key_value", "time_window"])
    df["cumulative"] = df.groupby(
        ["source", "dimension", "key_value"])["cnt"].cumsum().astype("int64")
    df["cnt"] = df["cnt"].astype("int64")
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def _auto_job() -> JobConfig:
    """No format map at all — every source sniffs its format from its
    first parseable line (S-auto, main.go:728-748)."""
    from ..config import SourceConfig

    return JobConfig(default=SourceConfig(log_format="auto"))


def q_log_parse_stats_auto(sf_dir: str):
    """Format auto-detection mode on mixed-format input (the 12 synth
    sources cycle through all 5 formats) with NO explicit format config;
    gated by the same independent SQL as log_parse_stats — detection must
    reproduce the explicit-config parse outcome per line."""
    return _parse_stats_from(
        logpipe.enriched_dataset(_input_paths(sf_dir), _auto_job())
    )


def q_log_metrics_basic_auto(sf_dir: str):
    """Auto-detected formats must yield identical parsed FIELDS, not just
    parse counts: the windowed basic metrics under auto detection, gated
    by the same independent SQL as log_metrics_basic."""
    return _metrics_basic_from(
        logpipe.enriched_dataset(_input_paths(sf_dir), _auto_job())
    )


def log_queries() -> dict:
    return {
        "log_metrics": q_log_metrics,
        "log_metrics_compat": q_log_metrics_compat,
        "log_metrics_basic": q_log_metrics_basic,
        "log_keyed_counters": q_log_keyed_counters,
        "log_global_counters": q_log_global_counters,
        "log_routed": q_log_routed,
        "log_routed_masked": q_log_routed_masked,
        "log_top_paths": q_log_top_paths,
        "log_top_paths_cms": q_log_top_paths_cms,
        "log_parse_stats": q_log_parse_stats,
        "log_parse_stats_auto": q_log_parse_stats_auto,
        "log_metrics_basic_auto": q_log_metrics_basic_auto,
        "log_counter_deltas": q_log_counter_deltas,
        "log_repeat_offenders": q_log_repeat_offenders,
        "log_geo_counts": q_log_geo_counts,
        "log_status_class_counts": q_log_status_class_counts,
        "log_distinct_clients": q_log_distinct_clients,
        "log_distinct_clients_hll": q_log_distinct_clients_hll,
    }


def log_oracle_sql(sf_dir: str = SF_CORRECTNESS) -> dict:
    """Materializes the oracle cache for ``sf_dir``, then returns the SQL
    map (driver default: the sf0.01 correctness scale)."""
    cache = materialize.oracle_dir_for(sf_dir)
    return {
        # independent SQL implementations
        "log_metrics_basic": sql_metrics_basic(cache),
        "log_parse_stats": sql_parse_stats(cache),
        # auto-detection must reproduce the explicit-config results, so
        # the SAME independent SQL gates the auto-mode queries
        "log_parse_stats_auto": sql_parse_stats(cache),
        "log_metrics_basic_auto": sql_metrics_basic(cache),
        "log_counter_deltas": sql_counter_deltas(cache),
        "log_geo_counts": sql_geo_counts(cache),
        "log_status_class_counts": sql_status_class_counts(cache),
        "log_distinct_clients": sql_distinct_clients(cache),
        # moved to independent SQL in r3 (Go net/url + malicious
        # classifier re-implemented in pure SQL, see _sql_url_ctes)
        "log_top_paths": sql_top_paths(cache),
        "log_repeat_offenders": sql_repeat_offenders(cache),
        # materialized pure-Python-oracle dumps (engine vs oracle)
        "log_metrics": f"SELECT * FROM read_parquet('{cache}/oracle_metrics.parquet')",
        "log_metrics_compat": f"SELECT * FROM read_parquet('{cache}/oracle_metrics.parquet')",
        "log_keyed_counters": f"SELECT * FROM read_parquet('{cache}/oracle_keyed_counters.parquet')",
        "log_global_counters": f"SELECT * FROM read_parquet('{cache}/oracle_global_counters.parquet')",
        "log_routed": f"SELECT * FROM read_parquet('{cache}/oracle_routed.parquet')",
        "log_routed_masked": f"SELECT * FROM read_parquet('{cache}/oracle_routed_masked.parquet')",
    }
