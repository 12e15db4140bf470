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

import numpy as np
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
    "remote_user": {0: 3, 1: 3, 2: 4, 3: 2, 4: 2},
    # fi=0 (CLF) captures no referer/UA -> coalesced to '' (_extract_opt)
    "referer": {1: 10, 2: 11, 3: 9, 4: 9},
    "ua": {1: 11, 2: 12, 3: 10, 4: 10},
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
        if fi in _GROUPS[field]
    )
    return f"CASE fi {arms} END"


def _extract_opt(field: str) -> str:
    """Like _extract_case but '' for formats that lack the field."""
    return f"coalesce({_extract_case(field)}, '')"


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


def sql_rate_zscore(cache: str) -> str:
    """Independent SQL: per-source window request-rate z-scores (the
    telemetry anomaly view over the SAME 10-minute event-time windows
    the counter report uses). STDDEV_SAMP matches numpy ddof=1."""
    return _pattern_cte(cache) + f"""
, parsed AS (
  SELECT source, {_extract_case("ts")} AS ts_str
  FROM pat WHERE {_matches_case()}
), w2 AS (
  SELECT source,
    CAST(year(lt) AS BIGINT)*100000000 + month(lt)*1000000 + day(lt)*10000
      + hour(lt)*100 + (minute(lt) - minute(lt)%10) AS time_window
  FROM (SELECT *, try_strptime(split_part(ts_str, ' ', 1),
                               '%d/%b/%Y:%H:%M:%S') AS lt FROM parsed)
), wc AS (
  SELECT source, time_window, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM w2 GROUP BY 1, 2
), st AS (
  SELECT source, AVG(cnt) AS mean_c, STDDEV_SAMP(cnt) AS sd
  FROM wc GROUP BY 1
)
SELECT wc.source, wc.time_window, wc.cnt,
       ROUND((wc.cnt - st.mean_c) / st.sd, 6) AS zscore
FROM wc JOIN st USING (source)
WHERE st.sd > 0 AND ABS((wc.cnt - st.mean_c) / st.sd) >= 1.5
"""


def sql_bytes_quantiles(cache: str) -> str:
    """Independent SQL: per-source byte-size percentiles. quantile_cont
    == numpy 'linear' (rank q*(n-1), linear interpolation). Formats
    without a bytes field and empty captures count as 0, matching the
    engine's Atoi("")->0 fill."""
    return _pattern_cte(cache) + f"""
, parsed AS (
  SELECT source,
    CASE WHEN {_extract_opt("bytes")} = '' THEN 0
         ELSE CAST({_extract_opt("bytes")} AS BIGINT) END AS bytes_sent
  FROM pat WHERE {_matches_case()}
)
SELECT source,
  ROUND(quantile_cont(bytes_sent, 0.5), 6) AS p50,
  ROUND(quantile_cont(bytes_sent, 0.9), 6) AS p90,
  ROUND(quantile_cont(bytes_sent, 0.99), 6) AS p99
FROM parsed GROUP BY source
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


# ---- UA classification + referer hostname, in pure SQL ---------------------
#
# Independent third implementations of useragent.go's NewSBOUserAgent
# (functions/ua.py) and httpservers.go's referer normalization
# (loglines.normalize_referer + gourl.go_referer_hostname). The token
# scan's state machine collapses to last-non-NULL-wins per field over
# the extracted token list (human/intent/found-flags are
# order-independent: they only ever switch one way), so no fold is
# needed. Parity pinned in tests/test_sql_url_parity.py over
# adversarial UAs/referers + the corpus pools.

_UA_TT = r"ltrim(t, ' \t')"
_UA_ISP = f"starts_with({_UA_TT}, '(')"
_UA_P = f"substr({_UA_TT}, 2, len({_UA_TT})-2)"

_UA_STRUCT = r"""
list_transform(
  regexp_extract_all(after, '\s*\(([^)]+)\)|\s*([^/]+/[^ ]+)'),
  t -> struct_pack(
      os := CASE
        WHEN __ISP__ THEN CASE
          WHEN starts_with(__P__, 'Windows') THEN 'Windows'
          WHEN starts_with(__P__, 'Mac') THEN 'MacOS'
          WHEN starts_with(__P__, 'iPhone') OR starts_with(__P__, 'iPad') THEN 'IOS'
          WHEN contains(__P__, 'Android') THEN 'Android'
          WHEN contains(__P__, 'Linux') THEN 'Linux'
          ELSE NULL END
        ELSE CASE
          WHEN starts_with(__Q__, 'CriOS') THEN 'IOS'
          WHEN starts_with(__Q__, 'Edg') THEN 'Windows'
          ELSE NULL END
        END,
      dev := CASE
        WHEN __ISP__ THEN CASE
          WHEN starts_with(__P__, 'Windows') OR starts_with(__P__, 'Mac') THEN 'Desktop'
          WHEN starts_with(__P__, 'iPhone') OR starts_with(__P__, 'iPad') THEN 'Mobile'
          WHEN contains(__P__, 'Android') THEN 'Mobile'
          WHEN contains(__P__, 'Linux') THEN 'Desktop'
          WHEN starts_with(__P__, 'compatible') AND contains(lower(__P__), 'bot')
            THEN CASE WHEN contains(lower(__P__), 'blex') THEN 'SEOBot' ELSE 'Script' END
          WHEN contains(__P__, 'Claude') THEN 'Script'
          ELSE NULL END
        ELSE CASE
          WHEN starts_with(__Q__, 'Chrome') OR starts_with(__Q__, 'Safari')
            OR starts_with(__Q__, 'CriOS') OR starts_with(__Q__, 'Edg')
            OR starts_with(__Q__, 'Firefox') THEN NULL
          WHEN contains(__Q__, 'compatible') AND contains(lower(__Q__), 'bot')
            THEN CASE WHEN contains(lower(__Q__), 'blex') THEN 'SEOBot' ELSE 'Script' END
          WHEN contains(__Q__, 'openai') THEN 'Script'
          WHEN contains(__Q__, 'Claude') THEN 'Script'
          ELSE NULL END
        END,
      fam := CASE
        WHEN __ISP__ THEN CASE
          WHEN starts_with(__P__, 'Windows') OR starts_with(__P__, 'Mac')
            OR starts_with(__P__, 'iPhone') OR starts_with(__P__, 'iPad')
            OR contains(__P__, 'Android') OR contains(__P__, 'Linux') THEN NULL
          WHEN starts_with(__P__, 'compatible') AND contains(lower(__P__), 'bot') THEN 'OtherBot'
          WHEN contains(__P__, 'Claude') THEN 'AIBot'
          ELSE NULL END
        ELSE CASE
          WHEN starts_with(__Q__, 'Chrome') THEN 'Chrome'
          WHEN starts_with(__Q__, 'Safari') THEN 'Safari'
          WHEN starts_with(__Q__, 'CriOS') THEN 'Chrome'
          WHEN starts_with(__Q__, 'Edg') THEN 'Edge'
          WHEN starts_with(__Q__, 'Firefox') THEN 'Firefox'
          WHEN contains(__Q__, 'compatible') AND contains(lower(__Q__), 'bot') THEN 'OtherBot'
          WHEN contains(__Q__, 'openai') THEN 'AIBot'
          WHEN contains(__Q__, 'Claude') THEN 'AIBot'
          ELSE NULL END
        END,
      hum := (__ISP__ AND (
                (contains(__P__, 'Android') AND contains(__P__, 'Googlebot'))
                OR (starts_with(__P__, 'compatible') AND contains(lower(__P__), 'bot'))
                OR contains(__P__, 'Claude')))
             OR (NOT __ISP__ AND (
                (contains(__Q__, 'compatible') AND contains(lower(__Q__), 'bot'))
                OR contains(__Q__, 'openai') OR contains(__Q__, 'Claude'))),
      intp := (__ISP__ AND starts_with(__P__, 'compatible') AND contains(lower(__P__), 'bot')
               AND contains(lower(__P__), 'blex'))
           OR (NOT __ISP__ AND contains(__Q__, 'compatible') AND contains(lower(__Q__), 'bot')
               AND contains(lower(__Q__), 'blex')),
      f_chrome := NOT __ISP__ AND starts_with(__Q__, 'Chrome'),
      f_safari := NOT __ISP__ AND starts_with(__Q__, 'Safari'),
      f_crios := NOT __ISP__ AND starts_with(__Q__, 'CriOS'),
      f_edge := NOT __ISP__ AND starts_with(__Q__, 'Edg'),
      f_ff := NOT __ISP__ AND starts_with(__Q__, 'Firefox')
  )
)
"""


def _ua_tok_struct() -> str:
    return (_UA_STRUCT.replace("__ISP__", _UA_ISP).replace("__P__", _UA_P)
            .replace("__Q__", _UA_TT))


def _ua_last(field: str) -> str:
    return (f"list_reverse(list_filter(list_transform(toks, s -> s.{field}),"
            f" x -> x IS NOT NULL))[1]")


def _ua_any(field: str) -> str:
    return f"coalesce(list_bool_or(list_transform(toks, s -> s.{field})), false)"


def _sql_ua_ctes() -> str:
    """CTE chain expecting ``urlparsed`` with a ``ua`` column; yields
    ``uadone`` with ua_os/ua_family/ua_device/ua_human/ua_intent
    (PRE-robots-override; apply the override where path1 is at hand)."""
    return f"""
, ua0 AS (
  SELECT *, lower(ua) AS lua, strpos(ua, ' ') AS sp,
    CASE WHEN strpos(ua, ' ') > 0 THEN substr(ua, 1, strpos(ua, ' ')-1) ELSE ua END AS before,
    CASE WHEN strpos(ua, ' ') > 0 THEN substr(ua, strpos(ua, ' ')+1) ELSE '' END AS after
  FROM urlparsed
), ua1 AS (
  SELECT *,
    CASE
      WHEN regexp_matches(lua, 'googlebot|bingbot|baiduspider|yandexbot|duckduckbot') THEN 'search'
      WHEN regexp_matches(lua, 'facebookexternalhit|twitterbot|linkedinbot|pinterestbot|slackbot|bytespider') THEN 'social'
      WHEN regexp_matches(lua, 'ahrefs|semrush|dotbot|mj12bot|seobilitybot|siteauditbot|yandex.') THEN 'seo'
      WHEN regexp_matches(lua, 'gptbot|chatgpt|google-extended|claudebot|meta-externalagent|amazonbot|perplexitybot|youbot') THEN 'ai'
      WHEN regexp_matches(lua, 'censysinspect|expanse|aliyunsecbot|nmap|masscan|zgrab|shodanbot|urlscan|tchelebi') THEN 'scanner'
      WHEN regexp_matches(lua, 'curl|scrapy|wget|python|go-http-client|java|ruby|okhttp|postman|axios|guzzlehttp|headlesschrome|phantomjs|cloudflare-traffic-manager') THEN 'script'
      ELSE NULL END AS tier
  FROM ua0
), ua2 AS (
  SELECT *, {_ua_tok_struct()} AS toks FROM ua1
), ua3 AS (
  SELECT *,
    {_ua_last('os')} AS t_os, {_ua_last('dev')} AS t_dev, {_ua_last('fam')} AS t_fam,
    {_ua_any('hum')} AS t_hum, {_ua_any('intp')} AS t_intp,
    {_ua_any('f_chrome')} AS f_chrome, {_ua_any('f_safari')} AS f_safari,
    {_ua_any('f_crios')} AS f_crios, {_ua_any('f_edge')} AS f_edge,
    {_ua_any('f_ff')} AS f_ff
  FROM ua2
), ua4 AS (
  SELECT *,
    CASE WHEN f_crios THEN 'Chrome'
         WHEN f_edge THEN 'Edge'
         WHEN f_safari AND f_chrome THEN 'Chrome'
         WHEN f_safari AND NOT f_chrome AND NOT f_edge AND NOT f_ff THEN 'Safari'
         ELSE coalesce(t_fam, 'Other') END AS scan_fam0,
    CASE WHEN f_crios THEN 'IOS' WHEN f_edge THEN 'Windows'
         ELSE coalesce(t_os, 'Other') END AS scan_os0,
    coalesce(t_dev, 'Unknown') AS scan_dev0
  FROM ua3
), uadone AS (
  SELECT *,
    CASE WHEN tier IS NOT NULL THEN 'Other'
         WHEN sp = 0 THEN 'Other'
         WHEN scan_fam0 IN ('SearchBot', 'OtherBot') THEN 'Other'
         ELSE scan_os0 END AS ua_os,
    CASE WHEN tier = 'search' THEN 'SearchBot'
         WHEN tier = 'social' THEN 'SocialBot'
         WHEN tier = 'seo' THEN 'SEOBot'
         WHEN tier = 'ai' THEN 'AIBot'
         WHEN tier = 'scanner' THEN 'Scanner'
         WHEN tier = 'script' THEN 'Script'
         WHEN sp = 0 THEN CASE
           WHEN contains(lower(before), 'google') THEN 'SearchBot'
           WHEN starts_with(lower(before), 'facebook') THEN 'OtherBot'
           WHEN starts_with(lower(before), 'meta-') THEN 'AIBot'
           WHEN contains(lower(before), 'curl') OR starts_with(lower(before), 'go-')
             OR contains(lower(before), 'java') OR contains(lower(before), 'apache')
             OR contains(lower(before), 'php') OR contains(lower(before), 'python')
             OR contains(lower(before), 'requests') THEN 'Script'
           ELSE 'Other' END
         ELSE scan_fam0 END AS ua_family,
    CASE WHEN tier IS NOT NULL THEN 'Script'
         WHEN sp = 0 THEN CASE
           WHEN starts_with(lower(before), 'facebook')
             OR starts_with(lower(before), 'meta-') THEN 'Script'
           ELSE 'Unknown' END
         WHEN scan_fam0 IN ('SearchBot', 'OtherBot') THEN 'Script'
         ELSE scan_dev0 END AS ua_device,
    CASE WHEN tier IS NOT NULL THEN 'NonHuman'
         WHEN sp = 0 THEN 'NonHuman'
         WHEN scan_fam0 IN ('SearchBot', 'OtherBot') THEN 'NonHuman'
         WHEN t_hum THEN 'NonHuman'
         ELSE 'Unknown' END AS ua_human,
    CASE WHEN tier IN ('search', 'social', 'seo', 'ai') THEN 'Processing'
         WHEN tier = 'scanner' THEN 'Scanning'
         WHEN tier = 'script' THEN 'Scraping'
         WHEN sp > 0 AND t_intp THEN 'Processing'
         ELSE 'Unknown' END AS ua_intent
  FROM ua4
)"""


def _sql_ref_ctes() -> str:
    """CTE chain expecting ``uadone`` with a ``ref`` column (raw referer
    header); yields ``refdone`` with ``ref_host`` (hostname, www.
    stripped, '' on parse error/empty — go_referer_hostname)."""
    return f"""
, r0 AS (
  SELECT *,
    split_part(ref, '#', 1) AS r_rawurl,
    CASE WHEN strpos(ref, '#') > 0 THEN substr(ref, strpos(ref, '#')+1) ELSE '' END AS r_frag,
    (strpos(ref, '#') > 0) AS r_has_frag
  FROM uadone
), r1 AS (
  SELECT *,
    (r_has_frag AND {_sql_bad_escapes('r_frag')}) AS r_frag_bad,
    regexp_matches(r_rawurl, '[\\x00-\\x1f\\x7f]') AS r_has_ctl,
    CASE WHEN regexp_matches(r_rawurl, '^[A-Za-z][A-Za-z0-9+.\\-]*:')
         THEN lower(regexp_extract(r_rawurl, '^([A-Za-z][A-Za-z0-9+.\\-]*):', 1)) ELSE '' END AS r_scheme,
    CASE WHEN regexp_matches(r_rawurl, '^[A-Za-z][A-Za-z0-9+.\\-]*:')
         THEN regexp_extract(r_rawurl, '^[A-Za-z][A-Za-z0-9+.\\-]*:(.*)$', 1) ELSE r_rawurl END AS r_rest
  FROM r0
), r2 AS (
  SELECT *,
    CASE WHEN ends_with(r_rest, '?') AND strpos(substr(r_rest, 1, len(r_rest)-1), '?') = 0
         THEN substr(r_rest, 1, len(r_rest)-1) ELSE split_part(r_rest, '?', 1) END AS r_rest2
  FROM r1
), r3 AS (
  SELECT *,
    ((r_scheme <> '' OR NOT starts_with(r_rest2, '///')) AND starts_with(r_rest2, '//')) AS r_has_auth
  FROM r2
), r4 AS (
  SELECT *, CASE WHEN r_has_auth THEN substr(r_rest2, 3) ELSE '' END AS r_authfull
  FROM r3
), r5 AS (
  SELECT *,
    CASE WHEN r_has_auth AND strpos(r_authfull, '/') > 0
         THEN substr(r_authfull, 1, strpos(r_authfull, '/')-1)
         WHEN r_has_auth THEN r_authfull ELSE '' END AS r_auth,
    CASE WHEN r_has_auth AND strpos(r_authfull, '/') > 0
         THEN substr(r_authfull, strpos(r_authfull, '/'))
         WHEN r_has_auth THEN ''
         ELSE r_rest2 END AS r_prepath
  FROM r4
), r6 AS (
  SELECT *,
    CASE WHEN strpos(r_auth, '@') > 0 THEN regexp_extract(r_auth, '@([^@]*)$', 1)
         ELSE r_auth END AS r_hostp
  FROM r5
), r7 AS (
  SELECT *,
    (r_frag_bad OR r_has_ctl OR r_rawurl LIKE ':%'
      OR (r_rawurl <> '*' AND r_scheme = '' AND NOT starts_with(r_rest2, '/')
          AND strpos(split_part(r_rest2, '/', 1), ':') > 0)
      OR (r_has_auth AND (regexp_matches(r_hostp, '[\\x00-\\x1f\\x7f]')
                          OR {_sql_bad_escapes('r_hostp')}))
      OR (r_rawurl <> '*' AND NOT (r_scheme <> '' AND NOT starts_with(r_rest2, '/'))
          AND {_sql_bad_escapes('r_prepath')})
    ) AS r_fail,
    CASE WHEN r_rawurl = '*' OR NOT r_has_auth THEN '' ELSE r_hostp END AS r_host0
  FROM r6
), r8 AS (
  SELECT *,
    CASE WHEN strpos(r_host0, ':') > 0
              AND (len(r_host0) - strpos(reverse(r_host0), ':') + 1)
                  > coalesce(nullif(len(r_host0) - strpos(reverse(r_host0), ']') + 1,
                                    len(r_host0)+1), 0)
         THEN substr(r_host0, 1, len(r_host0) - strpos(reverse(r_host0), ':'))
         ELSE r_host0 END AS r_host1
  FROM r7
), r9 AS (
  SELECT *,
    CASE WHEN starts_with(r_host1, '[') AND ends_with(r_host1, ']')
         THEN substr(r_host1, 2, len(r_host1)-2) ELSE r_host1 END AS r_hostn
  FROM r8
), refdone AS (
  SELECT *,
    CASE WHEN ref = '' OR r_fail THEN ''
         WHEN starts_with(r_hostn, 'www.') THEN substr(r_hostn, 5)
         ELSE r_hostn END AS ref_host
  FROM r9
)"""


_BOTLIKE_SQL = "('AIBot', 'SEOBot', 'Script', 'SearchBot', 'SocialBot')"


def _sql_enriched_cte(cache: str) -> str:
    """The full independent-SQL enrichment: parse -> URL -> UA -> referer
    -> robots override + utm referer, ending in CTE ``enr`` with the
    engine's enriched columns (source, client_ip, status, method, path,
    ua_family/os/device/human/intent POST-robots-override, referer,
    malicious, bytes)."""
    return _pattern_cte(cache) + f"""
, parsedu AS (
  SELECT source, fi, doc_id,
    {_extract_case("client_ip")} AS client_ip,
    {_extract_case("status")} AS status,
    {_extract_case("method")} AS method,
    {_extract_case("remote_user")} AS remote_user,
    CAST({_extract_case("bytes")} AS BIGINT) AS bytes_sent,
    {_extract_case("uri")} AS uri,
    {_extract_case("ts")} AS ts_str,
    {_extract_opt("ua")} AS ua,
    {_extract_opt("referer")} AS ref
  FROM pat WHERE {_matches_case()}
)""" + _sql_url_ctes() + _sql_ua_ctes() + _sql_ref_ctes() + f"""
, enr AS MATERIALIZED (
  SELECT source, doc_id, client_ip, status, method, remote_user,
    bytes_sent, path, malicious, path1, path2, path3, ua,
    (SELECT CAST(year(lt) AS BIGINT)*100000000 + month(lt)*1000000
            + day(lt)*10000 + hour(lt)*100 + (minute(lt) - minute(lt)%10)
     FROM (SELECT try_strptime(split_part(ts_str, ' ', 1),
                               '%d/%b/%Y:%H:%M:%S') AS lt)) AS time_window,
    (SELECT lt - CAST(
        (CASE WHEN substr(z, 1, 1) = '-' THEN -1 ELSE 1 END)
        * (coalesce(TRY_CAST(substr(z, 2, 2) AS INTEGER), 0) * 3600
           + coalesce(TRY_CAST(substr(z, 4, 2) AS INTEGER), 0) * 60)
        AS BIGINT) * INTERVAL 1 SECOND
     FROM (SELECT try_strptime(split_part(ts_str, ' ', 1),
                               '%d/%b/%Y:%H:%M:%S') AS lt,
                  split_part(ts_str, ' ', 2) AS z)) AS ts_utc,
    ua_os, ua_intent,
    CASE WHEN path1 = '/robots.txt' THEN
      CASE WHEN ua_family IN {_BOTLIKE_SQL} THEN ua_family ELSE 'OtherBot' END
    ELSE ua_family END AS ua_family_f,
    CASE WHEN path1 = '/robots.txt' THEN 'Script' ELSE ua_device END AS ua_device_f,
    CASE WHEN path1 = '/robots.txt' THEN 'NonHuman' ELSE ua_human END AS ua_human_f,
    CASE WHEN fi = 0 THEN ''  -- CLF captures no referer; the engine
                              -- skips the utm path entirely for it
         WHEN regexp_extract(uri, '(\\?|&)utm_source=([^&]+)(&|$)', 2) <> ''
         THEN regexp_extract(uri, '(\\?|&)utm_source=([^&]+)(&|$)', 2)
         ELSE ref_host END AS referer_f
  FROM refdone
)"""


def sql_keyed_counters(cache: str) -> str:
    """Independent SQL: all nine keyed counter dimensions
    (counter.go:147-226) from the raw line view — regex parse + the
    pure-SQL Go-URL / UA-tree / referer implementations."""
    dims = [
        ("clients", "client_ip"), ("status_codes", "status"),
        ("methods", "method"), ("ua_families", "ua_family_f"),
        ("os_families", "ua_os"), ("device_types", "ua_device_f"),
        ("referers", "referer_f"), ("paths", "path"),
        ("intents", "ua_intent"),
    ]
    unions = "\nUNION ALL\n".join(
        f"SELECT source, '{dim}' AS dimension, {col} AS key_value, "
        f"CAST(COUNT(*) AS BIGINT) AS cnt FROM enr GROUP BY source, {col}"
        for dim, col in dims
    )
    return _sql_enriched_cte(cache) + "\n" + unions


def sql_global_counters(cache: str) -> str:
    """Independent SQL: the one-row global counter set
    (counter.go:58-84, 137-229 + main.go:700-707 parse errors)."""
    return _sql_enriched_cte(cache) + f"""
, errs AS (
  SELECT CAST(SUM(CASE WHEN {_matches_case()} THEN 0 ELSE 1 END) AS BIGINT) AS parse_errors
  FROM pat
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS requests,
  CAST(SUM(bytes_sent) AS BIGINT) AS bytes_sent,
  CAST(SUM(CASE WHEN ua_human_f = 'Human' THEN 1 ELSE 0 END) AS BIGINT) AS humans,
  CAST(SUM(CASE WHEN ua_human_f = 'NonHuman' THEN 1 ELSE 0 END) AS BIGINT) AS non_humans,
  CAST(SUM(CASE WHEN malicious <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS malicious,
  (SELECT parse_errors FROM errs) AS parse_errors
FROM enr
"""


def _sql_trunc(col: str, limit: int = 100) -> str:
    """Engine metric-key truncation in SQL (db/mysqldb.go:152 /
    stages/route.reduce_to_max_len): cut at ``limit`` BYTES, dropping a
    split multibyte char — equivalently the longest char prefix with
    byte length <= limit (probed via a list-valued generate_series; only
    runs on the rare over-limit keys)."""
    probe = (f"list_max(list_filter(generate_series(1, length({col})), "
             f"k -> octet_length(encode(substr({col}, 1, CAST(k AS INTEGER)))) <= {limit}))"
             )
    return (f"CASE WHEN octet_length(encode({col})) <= {limit} THEN {col} ELSE "
            f"substr({col}, 1, CAST({probe} AS INTEGER)) END")


def _sql_trunc100(col: str) -> str:
    return _sql_trunc(col, 100)


def _sql_trunc_keep_last(col: str, limit: int = 100) -> str:
    """reduce_to_max_len_keeping_last in SQL: longest char SUFFIX with
    byte length <= limit (the MaskIPs UA truncation, db/mysqldb.go:208)."""
    probe = (f"list_max(list_filter(generate_series(1, length({col})), "
             f"k -> octet_length(encode(substr({col}, length({col}) - CAST(k AS INTEGER) + 1)))"
             f" <= {limit}))")
    return (f"CASE WHEN octet_length(encode({col})) <= {limit} THEN {col} ELSE "
            f"substr({col}, length({col}) - CAST({probe} AS INTEGER) + 1) END")


def sql_metrics(cache: str) -> str:
    """Independent SQL: the FULL metric fan-out (all 11 emitted metric
    types, metricgenerator.go:86-126) incl. the Go-URL path pieces, the
    utm/hostname referer, the UA tree, the robots override and the
    100-byte key truncation — the add-merge sink totals on
    chronological input."""
    emits = [
        ("1", "''", None, "COUNT(*)"),
        ("2", "''", None, "SUM(bytes_sent)"),
        ("3", "status", None, "COUNT(*)"),
        ("5", "method", None, "COUNT(*)"),
        ("6", _sql_trunc100("referer_f"), "referer_f <> ''", "COUNT(*)"),
        ("7", _sql_trunc100("path1"), "status LIKE '2%'", "COUNT(*)"),
        ("7", _sql_trunc100("path2"), "status LIKE '2%' AND path2 <> ''", "COUNT(*)"),
        ("7", _sql_trunc100("path3"), "status LIKE '2%' AND path3 <> ''", "COUNT(*)"),
        ("11", "ua_family_f", None, "COUNT(*)"),
        ("12", "ua_os", None, "COUNT(*)"),
        ("13", "ua_device_f", None, "COUNT(*)"),
        ("14", "ua_human_f", None, "COUNT(*)"),
        ("15", "ua_intent", None, "COUNT(*)"),
    ]
    unions = "\nUNION ALL\n".join(
        f"SELECT source, {mt} AS metric_type, {key} AS key_value, time_window,"
        f" CAST({val} AS BIGINT) AS metric_value FROM enr"
        + (f" WHERE {cond}" if cond else "")
        + f" GROUP BY source, {key}, time_window"
        for mt, key, cond, val in emits
    )
    return _sql_enriched_cte(cache) + f"""
, fanout AS (
{unions}
)
SELECT source, CAST(metric_type AS INTEGER) AS metric_type, key_value,
       time_window, CAST(SUM(metric_value) AS BIGINT) AS metric_value
FROM fanout
GROUP BY source, metric_type, key_value, time_window
"""


def sql_routed(cache: str, masked: bool = False) -> str:
    """Independent SQL: the routed raw-log sink projection (SaveRawLog,
    db/mysqldb.go:161-222) minus the token payload — relevance gate
    (main.go:768-779), byte truncations, UTC request_ts from the local
    clock + numeric zone, and the MaskIPs variant (NULL client_ip,
    keep-LAST-100-bytes UA truncation)."""
    ip_expr = "CAST(NULL AS VARCHAR)" if masked else "client_ip"
    ua_expr = (_sql_trunc_keep_last("ua", 100) if masked
               else _sql_trunc("ua", 100))
    return _sql_enriched_cte(cache) + f"""
, rel AS (
  SELECT * FROM enr
  WHERE malicious = 0
    AND (status LIKE '2%' OR status LIKE '5%')
    AND ua_device_f <> 'Script'
    AND ua_family_f NOT IN ('Scanner', 'SEOBot', 'Script')
)
SELECT source, doc_id,
  ts_utc AS request_ts,
  {ip_expr} AS client_ip,
  {_sql_trunc('remote_user', 100)} AS remote_user,
  {_sql_trunc('method', 20)} AS http_method,
  {_sql_trunc("CASE WHEN path3 <> '' THEN path3 WHEN path2 <> '' THEN path2 ELSE path1 END", 100)} AS path3,
  {_sql_trunc('path', 100)} AS request_uri,
  status AS http_status,
  bytes_sent,
  {_sql_trunc('referer_f', 100)} AS referer,
  CAST(malicious AS TINYINT) AS is_malicious,
  {ua_expr} AS ua_string,
  ua_os,
  ua_family_f AS ua_family,
  ua_device_f AS ua_device_type,
  ua_human_f AS ua_is_human,
  ua_intent
FROM rel
"""


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


def q_log_rate_zscore(sf_dir: str, z_cut: float = 1.5):
    """Per-source request-rate anomaly view: the z-score of each
    10-minute window's request count against the source's own
    window-count distribution (mean/STDDEV over its windows, sample
    ddof=1), emitting windows with |z| >= ``z_cut`` — the telemetry
    alerting primitive on top of the windowed counters. Distributed
    shape: block-local (source, window) partial counts -> stream merge
    (bounded: sources x windows, windows bounded by the corpus time
    span) -> per-source vectorized stats on the driver-held aggregate
    (the same bounded-table contract as the counter report)."""
    enr = _enriched(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("parse_ok"))
        g = pa.table({
            "source": t.column("source").combine_chunks(),
            "time_window": t.column("time_window").combine_chunks(),
        }).group_by(["source", "time_window"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "time_window", "cnt"])

    schema = pa.schema([("source", pa.string()),
                        ("time_window", pa.int64()), ("cnt", pa.int64())])
    agg = logpipe._stream_merge(
        enr.map_batches(partial, batch_format="pyarrow"),
        ["source", "time_window"], "cnt", schema=schema)
    df = logpipe.to_pandas_with_schema(agg, schema)
    if df.empty:
        return pa.schema([("source", pa.string()),
                          ("time_window", pa.int64()), ("cnt", pa.int64()),
                          ("zscore", pa.float64())]).empty_table()
    stats = df.groupby("source")["cnt"].agg(["mean", "std"])  # std ddof=1
    df = df.join(stats, on="source")
    df = df[df["std"] > 0].copy()
    df["zscore"] = np.round((df["cnt"] - df["mean"]) / df["std"], 6)
    df = df[np.abs((df["cnt"] - df["mean"]) / df["std"]) >= z_cut]
    df = df.sort_values(["source", "time_window"]).reset_index(drop=True)
    return pa.table({
        "source": pa.array(df["source"], pa.string()),
        "time_window": pa.array(df["time_window"], pa.int64()),
        "cnt": pa.array(df["cnt"], pa.int64()),
        "zscore": pa.array(df["zscore"], pa.float64()),
    })


def q_log_bytes_quantiles(sf_dir: str, qs: tuple = (0.5, 0.9, 0.99)):
    """Per-source exact response-size percentiles (p50/p90/p99 of
    bytes_sent over parsed lines) — the latency/size-distribution view
    log analytics adds on top of the counters. Distributed shape:
    value-HISTOGRAM quantiles — block-local (source, bytes_sent) partial
    counts -> stream merge (bounded by sources x distinct byte values,
    a bounded value domain in log data; the CMS/HLL sketch family is
    the unbounded-domain path) -> the driver interpolates the order
    statistic from the weighted histogram per source without ever
    expanding the multiset. Matches numpy's 'linear' (= DuckDB
    quantile_cont) definition: rank q*(n-1), v[lo] + frac*(v[hi]-v[lo]).
    Missing/absent byte fields count as 0, the parse stage's Atoi("")
    semantics (httpservers.go:175-176)."""
    enr = _enriched(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("parse_ok"))
        g = pa.table({
            "source": t.column("source").combine_chunks(),
            "bytes_sent": t.column("bytes_sent").combine_chunks(),
        }).group_by(["source", "bytes_sent"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "bytes_sent", "cnt"])

    schema = pa.schema([("source", pa.string()),
                        ("bytes_sent", pa.int64()), ("cnt", pa.int64())])
    agg = logpipe._stream_merge(
        enr.map_batches(partial, batch_format="pyarrow"),
        ["source", "bytes_sent"], "cnt", schema=schema)
    df = logpipe.to_pandas_with_schema(agg, schema)
    out_schema = pa.schema([("source", pa.string()), ("p50", pa.float64()),
                            ("p90", pa.float64()), ("p99", pa.float64())])
    if df.empty:
        return out_schema.empty_table()
    out = {"source": [], "p50": [], "p90": [], "p99": []}
    for src, g in df.sort_values(["source", "bytes_sent"]).groupby(
            "source", sort=True):
        v = g["bytes_sent"].to_numpy(dtype=np.float64)
        cum = np.cumsum(g["cnt"].to_numpy(dtype=np.int64))
        n = int(cum[-1])
        ps = []
        for q in qs:
            r = q * (n - 1)
            lo = int(np.floor(r))
            i = np.searchsorted(cum, lo, side="right")
            j = np.searchsorted(cum, min(lo + 1, n - 1), side="right")
            ps.append(round(float(v[i] + (r - lo) * (v[j] - v[i])), 6))
        out["source"].append(src)
        out["p50"].append(ps[0])
        out["p90"].append(ps[1])
        out["p99"].append(ps[2])
    return pa.table(out, schema=out_schema)


def q_log_bytes_quantiles_kll(sf_dir: str, qs: tuple = (0.5, 0.9, 0.99)):
    """Approximate per-source byte-size percentiles via mergeable KLL
    sketches (one bounded compactor ladder per (block, source),
    merge-combined on the driver) — the scale twin of the exact
    histogram path `q_log_bytes_quantiles`, for value domains where
    the distinct-count is NOT bounded (latencies, scores) and the
    histogram would be input-sized. No SQL gate (the sketch is
    approximate by construction); the rank-error bound and the merge
    law are pinned in tests/test_sketch.py, and the driver compares
    row counts with the exact twin."""
    from ..stages.kll import KLLSketch

    K = 256

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("parse_ok"))
        srcs, sketches = [], []
        if t.num_rows:
            enc = pc.dictionary_encode(t.column("source").combine_chunks())
            bs = t.column("bytes_sent").combine_chunks().to_numpy(
                zero_copy_only=False)
            idx = enc.indices.to_numpy(zero_copy_only=False)
            for i, src in enumerate(enc.dictionary.to_pylist()):
                sk = KLLSketch(K)
                sk.add(bs[idx == i])
                srcs.append(src)
                sketches.append(sk.to_bytes())
        return pa.table({
            "source": pa.array(srcs, type=pa.string()),
            "sketch": pa.array(sketches, type=pa.binary()),
        })

    parts = pa.concat_tables(
        _enriched(sf_dir).map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    merged: dict[str, KLLSketch] = {}
    for src, blob in zip(parts.column("source").to_pylist(),
                         parts.column("sketch").to_pylist()):
        sk = KLLSketch.from_bytes(blob)
        if src in merged:
            merged[src].merge(sk)
        else:
            merged[src] = sk
    out_schema = pa.schema([("source", pa.string()), ("p50", pa.float64()),
                            ("p90", pa.float64()), ("p99", pa.float64())])
    rows = sorted(merged.items())
    return pa.table({
        "source": pa.array([s for s, _ in rows], type=pa.string()),
        "p50": pa.array([r.quantile(qs[0]) for _, r in rows]),
        "p90": pa.array([r.quantile(qs[1]) for _, r in rows]),
        "p99": pa.array([r.quantile(qs[2]) for _, r in rows]),
    }, schema=out_schema)


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
    fully distributed: block-local (source, ip) pair dedup shrinks the
    exchange to distinct-pairs-per-block, ONE hash exchange on
    crc32(ip) % P co-locates every copy of an ip, each partition
    vectorized-dedups its pairs and emits per-source counts, and the
    driver merges only P x |sources| tiny count rows — never the pair
    set (unbounded distinct IPs at scale; the r3 shape materialized the
    whole per-(source, ip) aggregate as driver pandas). The HLL twin
    (below) stays the single-scan sketch path."""
    import zlib

    import numpy as np
    import ray

    P = max(4, int(ray.cluster_resources().get("CPU", 4)))
    pair_schema = pa.schema([("source", pa.string()),
                             ("client_ip", pa.string()),
                             ("part", pa.int64())])

    def pair_partial(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("parse_ok"))
        if t.num_rows == 0:
            return pair_schema.empty_table()
        pairs = (t.select(["source", "client_ip"])
                 .group_by(["source", "client_ip"]).aggregate([]))
        ips = pairs.column("client_ip").combine_chunks()
        enc = ips.dictionary_encode()
        uh = np.array([zlib.crc32(u.encode("utf-8")) % P
                       for u in enc.dictionary.to_pylist()], dtype=np.int64)
        part = uh[enc.indices.to_numpy(zero_copy_only=False)]
        return pa.table({"source": pairs.column("source"),
                         "client_ip": ips,
                         "part": pa.array(part)})

    def count_part(g: "pd.DataFrame"):
        import pandas as pd

        dd = g.drop_duplicates(["source", "client_ip"])
        out = dd.groupby("source", sort=False).size().reset_index(name="n")
        return pd.DataFrame({"source": out["source"],
                             "n": out["n"].astype("int64")})

    parts = (_enriched(sf_dir)
             .map_batches(pair_partial, batch_format="pyarrow")
             .groupby("part").map_groups(count_part))
    df = logpipe.to_pandas_with_schema(
        parts, pa.schema([("source", pa.string()), ("n", pa.int64())]))
    out = df.groupby("source", sort=True)["n"].sum().reset_index(name="n_clients")
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


def q_log_sessionize(sf_dir: str, gap_sec: int = 600):
    """Session windows over the PARSED log stream: per (source,
    client_ip), requests closer than ``gap_sec`` belong to one session
    — the log-side twin of events_sessionize, run on the flagship
    payload (web session reconstruction from access logs). One row per
    session with start/end epoch and request count.

    Distributed shape: the distinct_clients exchange — block batches
    route by crc32(ip) % P so every request of an ip lands in one
    partition; inside a partition one lexsort + vectorized gap/key
    boundaries (no per-session Python). Session boundaries depend only
    on ts gaps, so equal-timestamp ordering ambiguity cannot move
    them; epochs are exact integers."""
    import zlib

    import ray

    P = max(4, int(ray.cluster_resources().get("CPU", 4)))
    row_schema = pa.schema([("source", pa.string()),
                            ("client_ip", pa.string()),
                            ("e", pa.int64()), ("part", pa.int64())])
    out_schema = pa.schema([("source", pa.string()),
                            ("client_ip", pa.string()),
                            ("session_start", pa.int64()),
                            ("session_end", pa.int64()),
                            ("n_requests", pa.int64())])

    def route(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t.column("parse_ok"),
                             pc.is_valid(t.column("ts"))))
        if t.num_rows == 0:
            return row_schema.empty_table()
        ips = t.column("client_ip").combine_chunks()
        enc = ips.dictionary_encode()
        uh = np.array([zlib.crc32(u.encode("utf-8")) % P
                       for u in enc.dictionary.to_pylist()], dtype=np.int64)
        part = uh[enc.indices.to_numpy(zero_copy_only=False)]
        return pa.table({
            "source": t.column("source"),
            "client_ip": ips,
            "e": t.column("ts").cast(pa.int64()),
            "part": pa.array(part),
        })

    def sessions_part(g: "pd.DataFrame"):
        import pandas as pd

        g = g.sort_values(["source", "client_ip", "e"], kind="stable")
        key = (g["source"].astype(str) + "\x00"
               + g["client_ip"].astype(str)).to_numpy()
        e = g["e"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = (key[1:] != key[:-1]) | (e[1:] - e[:-1] > gap_sec)
        sid = np.cumsum(new)
        out = g.groupby(sid).agg(
            source=("source", "first"), client_ip=("client_ip", "first"),
            session_start=("e", "min"), session_end=("e", "max"),
            n_requests=("e", "count"))
        out["session_start"] = out["session_start"].astype("int64")
        out["session_end"] = out["session_end"].astype("int64")
        out["n_requests"] = out["n_requests"].astype("int64")
        return out.reset_index(drop=True)

    parts = (_enriched(sf_dir)
             .map_batches(route, batch_format="pyarrow")
             .groupby("part").map_groups(sessions_part))
    out = list(parts.iter_batches(batch_format="pyarrow", batch_size=None))
    if not out:
        return out_schema.empty_table()
    return pa.concat_tables(
        [out_schema.empty_table()] +
        [b.select(out_schema.names).cast(out_schema) for b in out])


def sql_log_sessionize(cache: str, gap_sec: int = 600) -> str:
    return _pattern_cte(cache) + f"""
, parsed AS (
  SELECT doc_id, source, {_extract_case("client_ip")} AS client_ip,
    CAST(epoch(try_strptime({_extract_case("ts")},
         '%d/%b/%Y:%H:%M:%S %z')) AS BIGINT) AS e
  FROM pat WHERE {_matches_case()}
), w AS (
  -- doc_id tiebreak: LAG and the cumulative SUM are separate window
  -- computations; without a TOTAL order, equal-epoch rows can take
  -- different tie orders in each and split sessions incoherently
  SELECT doc_id, source, client_ip, e,
         LAG(e) OVER (PARTITION BY source, client_ip
                      ORDER BY e, doc_id) AS pe
  FROM parsed WHERE e IS NOT NULL
), s AS (
  SELECT source, client_ip, e,
    SUM(CASE WHEN pe IS NULL OR e - pe > {gap_sec} THEN 1 ELSE 0 END)
      OVER (PARTITION BY source, client_ip ORDER BY e, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM w
)
SELECT source, client_ip,
       CAST(MIN(e) AS BIGINT) AS session_start,
       CAST(MAX(e) AS BIGINT) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_requests
FROM s GROUP BY source, client_ip, sid
"""


# ---- token-native operators (the north-rule payload: tokens list<int32>) --
def _token_lists(col) -> tuple["np.ndarray", "np.ndarray"]:
    """(values int32, offsets int64 rebased to 0) from a list<int32>
    column — the zero-copy slicing idiom of ``codec.decode_tokens``."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.LargeListArray):
        arr = arr.cast(pa.list_(pa.int32()))
    off = arr.offsets.to_numpy().astype(np.int64)
    start, end = int(off[0]), int(off[-1])
    vals = arr.values.slice(start, end - start).to_numpy(zero_copy_only=False)
    return vals, off - start


def _read_tokens(sf_dir: str, columns: list[str]):
    """Column-pruned file-aligned read of the raw token table."""
    import ray.data as rd

    paths = _input_paths(sf_dir)
    return rd.read_parquet(paths, columns=columns,
                           override_num_blocks=max(1, len(paths)))


def q_log_token_histogram(sf_dir: str, k: int = 32):
    """Global token-id frequency top-k over the pre-tokenized payload.

    The vocabulary is bounded (byte codec, ids < 256), so each block
    emits a <=256-row bincount partial and the driver folds a few KB —
    the canonical bounded-cardinality aggregate shape. Deterministic
    boundary: (cnt desc, token asc)."""
    part_schema = pa.schema([("token", pa.int64()), ("cnt", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, _ = _token_lists(t.column("tokens"))
        cnt = np.bincount(vals, minlength=256)
        nz = np.nonzero(cnt)[0]
        return pa.table({"token": nz.astype(np.int64),
                         "cnt": cnt[nz].astype(np.int64)})

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["tokens"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = parts.group_by("token").aggregate([("cnt", "sum")])
    g = g.rename_columns(["token", "cnt"])
    out = g.sort_by([("cnt", "descending"), ("token", "ascending")]).slice(0, k)
    return pa.table({"token": out.column("token"),
                     "cnt": out.column("cnt").cast(pa.int64())})


def sql_token_histogram(cache: str, k: int = 32) -> str:
    return f"""
SELECT CAST(u.tok AS BIGINT) AS token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM read_parquet('{cache}/shard-*.parquet') t, UNNEST(t.tokens) AS u(tok)
GROUP BY token ORDER BY cnt DESC, token LIMIT {k}
"""


def q_log_token_bigrams(sf_dir: str, k: int = 32):
    """Top-k adjacent token pairs over the token payload (corpus bigram
    statistics on the token table — the doc-side twin is
    ``doc_vocab_bigrams``). Pairs never cross row boundaries; each block
    bincounts packed keys a*256+b into a <=65536-row partial.
    Deterministic boundary: (cnt desc, a asc, b asc)."""
    part_schema = pa.schema([("pair", pa.int64()), ("cnt", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        if len(vals) < 2:
            return part_schema.empty_table()
        key = vals[:-1].astype(np.int64) * 256 + vals[1:].astype(np.int64)
        valid = np.ones(len(vals) - 1, dtype=bool)
        ends = off[1:-1] - 1  # last token of each non-final row
        ends = ends[(ends >= 0) & (ends < len(valid))]
        valid[ends] = False
        cnt = np.bincount(key[valid], minlength=65536)
        nz = np.nonzero(cnt)[0]
        return pa.table({"pair": nz.astype(np.int64),
                         "cnt": cnt[nz].astype(np.int64)})

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["tokens"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = parts.group_by("pair").aggregate([("cnt", "sum")])
    g = g.rename_columns(["pair", "cnt"])
    pair = g.column("pair").to_numpy(zero_copy_only=False)
    t = pa.table({"a": pair // 256, "b": pair % 256,
                  "cnt": g.column("cnt").cast(pa.int64())})
    return t.sort_by([("cnt", "descending"), ("a", "ascending"),
                      ("b", "ascending")]).slice(0, k)


def sql_token_bigrams(cache: str, k: int = 32) -> str:
    return f"""
WITH pairs AS (
  SELECT UNNEST(list_zip(t.tokens, t.tokens[2:])) AS pr
  FROM read_parquet('{cache}/shard-*.parquet') t
)
SELECT CAST(pr[1] AS BIGINT) AS a, CAST(pr[2] AS BIGINT) AS b,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM pairs WHERE pr[2] IS NOT NULL
GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT {k}
"""


def q_log_token_pmi(sf_dir: str, k: int = 32, min_cnt: int = 5):
    """Top-k token collocations by pointwise mutual information — which
    adjacent byte pairs co-occur far above chance (the collocation /
    delimiter-structure signal; raw bigram counts only surface the
    frequent pairs, PMI surfaces the BOUND ones).

    All probabilities come from the same bigram table (marginals are
    the row/column sums), so the whole statistic folds from the one
    bounded <=65536-key bincount partial of ``log_token_bigrams`` —
    no second pass, no exchange. PMI = ln(c_ab * N / (ra * cb)) is a
    transcendental of integer counts: ROUND-6 is safe (the
    doc_tfidf rule — never gate on raw transcendental output), rank
    under (pmi6 desc, a, b) on both sides. ``min_cnt`` floors the
    long tail where PMI degenerates to noise."""
    part_schema = pa.schema([("pair", pa.int64()), ("cnt", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        if len(vals) < 2:
            return part_schema.empty_table()
        key = vals[:-1].astype(np.int64) * 256 + vals[1:].astype(np.int64)
        valid = np.ones(len(vals) - 1, dtype=bool)
        ends = off[1:-1] - 1
        ends = ends[(ends >= 0) & (ends < len(valid))]
        valid[ends] = False
        cnt = np.bincount(key[valid], minlength=65536)
        nz = np.nonzero(cnt)[0]
        return pa.table({"pair": nz.astype(np.int64),
                         "cnt": cnt[nz].astype(np.int64)})

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["tokens"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = parts.group_by("pair").aggregate([("cnt", "sum")])
    pair = g.column("pair").to_numpy(zero_copy_only=False)
    cnt = g.column("cnt_sum").to_numpy(zero_copy_only=False).astype(np.int64)
    a, b = pair // 256, pair % 256
    ra = np.bincount(a, weights=cnt, minlength=256).astype(np.int64)
    cb = np.bincount(b, weights=cnt, minlength=256).astype(np.int64)
    n = int(cnt.sum())
    keep = cnt >= min_cnt
    a, b, cab = a[keep], b[keep], cnt[keep]
    pmi = np.round(np.log(cab.astype(np.float64) * n /
                          (ra[a].astype(np.float64) * cb[b])), 6)
    order = np.lexsort((b, a, -pmi))[:k]
    return pa.table({
        "a": pa.array(a[order], pa.int64()),
        "b": pa.array(b[order], pa.int64()),
        "cnt": pa.array(cab[order], pa.int64()),
        "pmi": pa.array(pmi[order], pa.float64()),
    })


def sql_token_pmi(cache: str, k: int = 32, min_cnt: int = 5) -> str:
    return f"""
WITH pr AS (
  SELECT UNNEST(list_zip(t.tokens, t.tokens[2:])) AS pr
  FROM read_parquet('{cache}/shard-*.parquet') t
), bg AS (
  SELECT CAST(pr[1] AS BIGINT) AS a, CAST(pr[2] AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pr WHERE pr[2] IS NOT NULL GROUP BY a, b
), tot AS (SELECT SUM(cnt) AS n FROM bg),
ra AS (SELECT a, SUM(cnt) AS ca FROM bg GROUP BY a),
cb AS (SELECT b, SUM(cnt) AS cb FROM bg GROUP BY b)
SELECT bg.a, bg.b, bg.cnt,
       ROUND(LN(CAST(bg.cnt AS DOUBLE) * tot.n / (ra.ca * cb.cb)), 6) AS pmi
FROM bg JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot
WHERE bg.cnt >= {min_cnt}
ORDER BY pmi DESC, bg.a, bg.b LIMIT {k}
"""


_SEQ_FNV = np.uint64(1099511628211)


def _seq_hash64(vals: np.ndarray, off: np.ndarray) -> np.ndarray:
    """Length-mixed polynomial hash of each ragged int32 row (reduceat
    over segments, uint64 wraparound). Pure kernel — property-tested
    for injectivity on samples in tests/test_properties.py."""
    lens = np.diff(off)
    h = np.zeros(len(lens), dtype=np.uint64)
    if len(vals):
        pos = (np.arange(len(vals), dtype=np.int64)
               - np.repeat(off[:-1], lens))
        maxlen = int(lens.max())
        pows = np.ones(maxlen, dtype=np.uint64)
        if maxlen > 1:
            np.multiply.accumulate(
                np.full(maxlen - 1, _SEQ_FNV, dtype=np.uint64), out=pows[1:])
        terms = (vals.astype(np.uint64) + np.uint64(1)) * pows[pos]
        nz = lens > 0
        h[nz] = np.add.reduceat(terms, off[:-1][nz])
    return h * np.uint64(31) + lens.astype(np.uint64)


def q_log_ip_entropy(sf_dir: str):
    """Per-source Shannon entropy of the client-IP distribution — the
    traffic-diversity / bot-concentration signal (low entropy = a few
    IPs dominate). Exact even with unbounded distinct IPs: the
    distinct_clients exchange co-locates every copy of an ip, so each
    partition owns its ips' GLOBAL counts and emits two bounded
    sufficient-stat rows per source (sum c*ln c, sum c); the driver
    folds H = ln N - (sum c ln c)/N. ROUND-6 (transcendental sums)."""
    import zlib

    import ray

    P = max(4, int(ray.cluster_resources().get("CPU", 4)))
    pair_schema = pa.schema([("source", pa.string()),
                             ("client_ip", pa.string()),
                             ("cnt", pa.int64()), ("part", pa.int64())])
    out_schema = pa.schema([("source", pa.string()),
                            ("n_requests", pa.int64()),
                            ("ip_entropy", pa.float64())])

    def pair_partial(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("parse_ok"))
        if t.num_rows == 0:
            return pair_schema.empty_table()
        pairs = (t.select(["source", "client_ip"])
                 .group_by(["source", "client_ip"])
                 .aggregate([([], "count_all")]))
        ips = pairs.column("client_ip").combine_chunks()
        enc = ips.dictionary_encode()
        uh = np.array([zlib.crc32(u.encode("utf-8")) % P
                       for u in enc.dictionary.to_pylist()], dtype=np.int64)
        part = uh[enc.indices.to_numpy(zero_copy_only=False)]
        return pa.table({"source": pairs.column("source"),
                         "client_ip": ips,
                         "cnt": pairs.column("count_all").cast(pa.int64()),
                         "part": pa.array(part)})

    def fold_part(g: "pd.DataFrame"):
        import pandas as pd

        per_ip = (g.groupby(["source", "client_ip"], sort=False)["cnt"]
                  .sum().reset_index())
        c = per_ip["cnt"].to_numpy().astype(np.float64)
        per_ip["clnc"] = c * np.log(c)
        out = per_ip.groupby("source", sort=False).agg(
            n=("cnt", "sum"), clnc=("clnc", "sum")).reset_index()
        return pd.DataFrame({"source": out["source"],
                             "n": out["n"].astype("int64"),
                             "clnc": out["clnc"]})

    parts = (_enriched(sf_dir)
             .map_batches(pair_partial, batch_format="pyarrow")
             .groupby("part").map_groups(fold_part))
    df = logpipe.to_pandas_with_schema(
        parts, pa.schema([("source", pa.string()), ("n", pa.int64()),
                          ("clnc", pa.float64())]))
    if df.empty:
        return out_schema.empty_table()
    agg = df.groupby("source", sort=True).agg(
        n=("n", "sum"), clnc=("clnc", "sum")).reset_index()
    n = agg["n"].to_numpy().astype(np.float64)
    ent = np.log(n) - agg["clnc"].to_numpy() / n
    return pa.table({
        "source": pa.array(agg["source"], pa.string()),
        "n_requests": pa.array(agg["n"].astype("int64")),
        "ip_entropy": pa.array(np.round(ent, 6)),
    })


def sql_ip_entropy(cache: str) -> str:
    return _pattern_cte(cache) + f"""
, parsed AS (
  SELECT source, {_extract_case("client_ip")} AS ip
  FROM pat WHERE {_matches_case()}
), c AS (
  SELECT source, ip, CAST(COUNT(*) AS BIGINT) AS c
  FROM parsed GROUP BY source, ip
)
SELECT source, CAST(SUM(c) AS BIGINT) AS n_requests,
       ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 6) AS ip_entropy
FROM c GROUP BY source
"""


def q_log_source_ce(sf_dir: str):
    """Per-source cross-entropy of the token stream under the CORPUS
    bigram LM (MLE, no smoothing — every observed bigram has mass) —
    the domain-shift / divergence signal over the raw payload: sources
    whose byte statistics deviate from the corpus score high.

    ONE streaming pass: each block bincounts (source, packed-pair)
    into bounded partials (|sources| x 65536 worst case, KBs real);
    the driver folds them, derives per-pair log-probs from the global
    counts, and computes each source's count-weighted mean -ln p(b|a).
    Both engines weight by COUNTS (sum c*lp, not per-occurrence adds),
    so only summation-order ulp remains — ROUND-6 (the transcendental-
    sum rule)."""
    part_schema = pa.schema([("source", pa.string()), ("pair", pa.int64()),
                             ("cnt", pa.int64())])
    out_schema = pa.schema([("source", pa.string()),
                            ("n_bigrams", pa.int64()),
                            ("ce", pa.float64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        if len(vals) < 2:
            return part_schema.empty_table()
        key = vals[:-1].astype(np.int64) * 256 + vals[1:].astype(np.int64)
        valid = np.ones(len(vals) - 1, dtype=bool)
        ends = off[1:-1] - 1
        ends = ends[(ends >= 0) & (ends < len(valid))]
        valid[ends] = False
        enc = pc.dictionary_encode(t.column("source").combine_chunks())
        row_src = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(off)
        tok_src = np.repeat(row_src, lens)[:-1][valid]
        nsrc = len(enc.dictionary)
        cnt = np.bincount(tok_src * 65536 + key[valid],
                          minlength=nsrc * 65536)
        nz = np.nonzero(cnt)[0]
        return pa.table({
            "source": enc.dictionary.take(pa.array(nz // 65536)),
            "pair": pa.array(nz % 65536, pa.int64()),
            "cnt": pa.array(cnt[nz], pa.int64()),
        })

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["tokens", "source"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = parts.group_by(["source", "pair"]).aggregate([("cnt", "sum")])
    if g.num_rows == 0:
        return out_schema.empty_table()
    src = g.column("source").to_numpy(zero_copy_only=False)
    pair = g.column("pair").to_numpy(zero_copy_only=False)
    cnt = g.column("cnt_sum").to_numpy(zero_copy_only=False)
    glob = np.bincount(pair, weights=cnt, minlength=65536)
    ca = np.zeros(256)
    np.add.at(ca, pair // 256, cnt)
    lp = np.log(glob[pair] / ca[pair // 256])
    import pandas as pd

    df = pd.DataFrame({"source": src, "w": cnt.astype(np.float64),
                       "t": -cnt.astype(np.float64) * lp})
    agg = df.groupby("source", sort=True).sum()
    return pa.table({
        "source": pa.array(agg.index, pa.string()),
        "n_bigrams": pa.array(agg["w"].astype(np.int64)),
        "ce": pa.array(np.round(agg["t"] / agg["w"], 6)),
    })


def sql_source_ce(cache: str) -> str:
    return f"""
WITH pairs AS (
  SELECT t.source, UNNEST(list_zip(t.tokens, t.tokens[2:])) AS pr
  FROM read_parquet('{cache}/shard-*.parquet') t
), p2 AS (
  SELECT source, CAST(pr[1] AS BIGINT) AS a, CAST(pr[2] AS BIGINT) AS b
  FROM pairs WHERE pr[2] IS NOT NULL
), sc AS (
  SELECT source, a, b, CAST(COUNT(*) AS BIGINT) AS c
  FROM p2 GROUP BY 1, 2, 3
), cnt AS (
  SELECT a, b, SUM(c) AS c FROM sc GROUP BY a, b
), ca AS (
  SELECT a, SUM(c) AS ca FROM cnt GROUP BY a
), lp AS (
  SELECT cnt.a, cnt.b, ln(CAST(cnt.c AS DOUBLE) / ca.ca) AS lp
  FROM cnt JOIN ca USING (a)
)
SELECT sc.source, CAST(SUM(sc.c) AS BIGINT) AS n_bigrams,
       ROUND(SUM(-sc.c * lp.lp) / SUM(sc.c), 6) AS ce
FROM sc JOIN lp ON sc.a = lp.a AND sc.b = lp.b
GROUP BY sc.source
"""


def q_log_seq_dedup(sf_dir: str):
    """Exact duplicate token *sequences* per source — dedup keyed on the
    whole tokens array (the sequence-level twin of doc_dedup_exact).

    Block-local: one vectorized polynomial hash per row (reduceat over
    ragged segments, uint64 wraparound), then block dedup of
    (source, hash) with a per-block copy count. ONE hash exchange on
    h % P co-locates every copy of a sequence; each partition counts
    distinct hashes and total rows per source, and the driver folds
    P x |sources| tiny rows. Sequences themselves never move."""
    import ray

    P = max(4, int(ray.cluster_resources().get("CPU", 4)))
    part_schema = pa.schema([("source", pa.string()), ("h", pa.int64()),
                             ("cnt", pa.int64()), ("part", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        h = _seq_hash64(vals, off)
        g = pa.table({
            "source": t.column("source"),
            "h": pa.array(h.view(np.int64)),
        }).group_by(["source", "h"]).aggregate([([], "count_all")])
        hh = g.column("h").to_numpy(zero_copy_only=False)
        part = (hh.view(np.uint64) % np.uint64(P)).astype(np.int64)
        return pa.table({"source": g.column("source"), "h": g.column("h"),
                         "cnt": g.column("count_all").cast(pa.int64()),
                         "part": pa.array(part)})

    def fold_part(g: "pd.DataFrame"):
        import pandas as pd

        per_seq = (g.groupby(["source", "h"], sort=False)["cnt"].sum()
                   .reset_index())
        out = per_seq.groupby("source", sort=False).agg(
            n_rows=("cnt", "sum"), n_uniq=("h", "size")).reset_index()
        return pd.DataFrame({"source": out["source"],
                             "n_rows": out["n_rows"].astype("int64"),
                             "n_uniq": out["n_uniq"].astype("int64")})

    parts = (_read_tokens(sf_dir, ["tokens", "source"])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("part").map_groups(fold_part))
    df = logpipe.to_pandas_with_schema(
        parts, pa.schema([("source", pa.string()), ("n_rows", pa.int64()),
                          ("n_uniq", pa.int64())]))
    out = df.groupby("source", sort=True).agg(
        n_rows=("n_rows", "sum"), n_uniq_seq=("n_uniq", "sum")).reset_index()
    return pa.table({
        "source": pa.array(out["source"], type=pa.string()),
        "n_rows": pa.array(out["n_rows"], type=pa.int64()),
        "n_uniq_seq": pa.array(out["n_uniq_seq"], type=pa.int64()),
        "n_dup_rows": pa.array(out["n_rows"] - out["n_uniq_seq"],
                               type=pa.int64()),
    })


def sql_seq_dedup(cache: str) -> str:
    return f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT tokens) AS BIGINT) AS n_uniq_seq,
       CAST(COUNT(*) - COUNT(DISTINCT tokens) AS BIGINT) AS n_dup_rows
FROM read_parquet('{cache}/shard-*.parquet') GROUP BY source
"""


def q_log_seq_dedup_prefix(sf_dir: str, k: int = 32):
    """PREFIX-keyed duplicate screen per source — sequences identical in
    their first ``k`` tokens count as copies (the truncation-near-dup a
    crawl produces when the same content is cut at different lengths;
    exact dedup misses these, full near-dup is overkill for them).
    Same engine shape as log_seq_dedup — block-local polynomial hash
    (over the CLAMPED prefix slice of the flat value array), one
    h % P exchange, bounded per-source fold — sequences never move."""
    import ray

    P = max(4, int(ray.cluster_resources().get("CPU", 4)))
    part_schema = pa.schema([("source", pa.string()), ("h", pa.int64()),
                             ("cnt", pa.int64()), ("part", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        nt = np.diff(off)
        # clamp every row to its first min(k, n) tokens: keep flat
        # positions whose in-row index is < k, rebuild offsets
        if len(vals):
            in_row = (np.arange(len(vals), dtype=np.int64)
                      - np.repeat(off[:-1], nt))
            keep = in_row < k
            pvals = vals[keep]
        else:
            pvals = vals
        pnt = np.minimum(nt, k)
        poff = np.empty(len(nt) + 1, dtype=np.int64)
        poff[0] = 0
        np.cumsum(pnt, out=poff[1:])
        h = _seq_hash64(pvals, poff)
        g = pa.table({
            "source": t.column("source"),
            "h": pa.array(h.view(np.int64)),
        }).group_by(["source", "h"]).aggregate([([], "count_all")])
        hh = g.column("h").to_numpy(zero_copy_only=False)
        part = (hh.view(np.uint64) % np.uint64(P)).astype(np.int64)
        return pa.table({"source": g.column("source"), "h": g.column("h"),
                         "cnt": g.column("count_all").cast(pa.int64()),
                         "part": pa.array(part)})

    def fold_part(g: "pd.DataFrame"):
        import pandas as pd

        per_seq = (g.groupby(["source", "h"], sort=False)["cnt"].sum()
                   .reset_index())
        out = per_seq.groupby("source", sort=False).agg(
            n_rows=("cnt", "sum"), n_uniq=("h", "size")).reset_index()
        return pd.DataFrame({"source": out["source"],
                             "n_rows": out["n_rows"].astype("int64"),
                             "n_uniq": out["n_uniq"].astype("int64")})

    parts = (_read_tokens(sf_dir, ["tokens", "source"])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("part").map_groups(fold_part))
    df = logpipe.to_pandas_with_schema(
        parts, pa.schema([("source", pa.string()), ("n_rows", pa.int64()),
                          ("n_uniq", pa.int64())]))
    out = df.groupby("source", sort=True).agg(
        n_rows=("n_rows", "sum"), n_uniq=("n_uniq", "sum")).reset_index()
    return pa.table({
        "source": pa.array(out["source"], type=pa.string()),
        "n_rows": pa.array(out["n_rows"], type=pa.int64()),
        "n_uniq_prefix": pa.array(out["n_uniq"], type=pa.int64()),
        "n_dup_rows": pa.array(out["n_rows"] - out["n_uniq"],
                               type=pa.int64()),
    })


def q_log_source_drift(sf_dir: str):
    """Per-source token-distribution DRIFT between the early and late
    half of the stream — the data-shift monitor a training pipeline
    runs before mixing a new crawl snapshot (a source whose token
    distribution moved is re-weighted or quarantined). "Early" is
    idx <= (min+max)/2 of the source's ingestion-index RANGE (the synth
    is chronological per source, so the range midpoint is the time
    midpoint; bounded pass-1 partials, no order statistic needed).

    Drift ships as the EXACT INTEGER numerator of total variation
    distance: tvd_num = sum_t |c_early[t]*n_late - c_late[t]*n_early|,
    with TVD = tvd_num / (2*n_early*n_late) — quotients of arbitrary
    denominators sit on rounding boundaries (the doc_quality_linear
    rule), integers gate exactly. int64 holds c*n up to n ~ 3e9 tokens
    per source; beyond that, compute per-shard drift or normalize
    first.

    Engine shape: pass 1 folds |sources| (min,max) idx partials; pass 2
    folds |sources| x 2 x 256 bincount partials (byte vocab). Nothing
    unbounded leaves the workers."""
    p1 = pa.schema([("source", pa.string()), ("mn", pa.int64()),
                    ("mx", pa.int64())])

    def minmax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return p1.empty_table()
        idx = _pack_idx(t.column("doc_id"))
        g = pa.table({"source": t.column("source"),
                      "idx": pa.array(idx, pa.int64())}).group_by(
            "source").aggregate([("idx", "min"), ("idx", "max")])
        return g.rename_columns(["source", "mn", "mx"])

    parts = [b for b in _read_tokens(sf_dir, ["doc_id", "source"])
             .map_batches(minmax, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows]
    OUT = pa.schema([("source", pa.string()),
                     ("n_early_tokens", pa.int64()),
                     ("n_late_tokens", pa.int64()),
                     ("tvd_num", pa.int64())])
    if not parts:
        return OUT.empty_table()
    mm = pa.concat_tables(parts).group_by("source").aggregate(
        [("mn", "min"), ("mx", "max")])
    srcs_sorted = np.sort(np.asarray(mm.column("source").to_pylist()))
    mid_of = {}
    for s, mn, mx in zip(mm.column("source").to_pylist(),
                         mm.column("mn_min").to_pylist(),
                         mm.column("mx_max").to_pylist()):
        mid_of[s] = (mn + mx) // 2
    import ray

    mid_ref = ray.put(mid_of)
    p2 = pa.schema([("source", pa.string()), ("early", pa.int64()),
                    ("token", pa.int64()), ("cnt", pa.int64())])

    def counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return p2.empty_table()
        mids = ray.get(mid_ref)
        idx = _pack_idx(t.column("doc_id"))
        src = np.asarray(t.column("source").to_pylist())
        mid = np.asarray([mids[s] for s in src], np.int64)
        early = (idx <= mid).astype(np.int64)
        vals, off = _token_lists(t.column("tokens"))
        nt = np.diff(off)
        # composite key: (source_idx, early, token) -> one bincount
        su = np.searchsorted(srcs_sorted, src)
        key_row = su * 2 + early
        key = (np.repeat(key_row, nt) * 256
               + vals.astype(np.int64))
        bc = np.bincount(key, minlength=len(srcs_sorted) * 2 * 256)
        nz = np.flatnonzero(bc)
        return pa.table({
            "source": pa.array(srcs_sorted[nz // 512]),
            "early": pa.array((nz // 256) % 2, pa.int64()),
            "token": pa.array(nz % 256, pa.int64()),
            "cnt": pa.array(bc[nz], pa.int64()),
        }, schema=p2)

    cparts = [b for b in _read_tokens(sf_dir,
                                      ["doc_id", "tokens", "source"])
              .map_batches(counts, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=None)
              if b.num_rows]
    if not cparts:
        return OUT.empty_table()
    g = pa.concat_tables(cparts).group_by(
        ["source", "early", "token"]).aggregate([("cnt", "sum")])
    df = g.to_pandas().rename(columns={"cnt_sum": "cnt"})
    rows = []
    for s, sub in df.groupby("source", sort=True):
        c = np.zeros((2, 256), np.int64)
        c[sub["early"].to_numpy(), sub["token"].to_numpy()] = \
            sub["cnt"].to_numpy()
        n_late, n_early = int(c[0].sum()), int(c[1].sum())
        tvd = int(np.abs(c[1] * n_late - c[0] * n_early).sum())
        rows.append((s, n_early, n_late, tvd))
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "n_early_tokens": pa.array([r[1] for r in rows], pa.int64()),
        "n_late_tokens": pa.array([r[2] for r in rows], pa.int64()),
        "tvd_num": pa.array([r[3] for r in rows], pa.int64()),
    }, schema=OUT)


def sql_source_drift(cache: str) -> str:
    return f"""
WITH t AS (
  SELECT source, CAST(right(doc_id, 12) AS BIGINT) AS idx, tokens
  FROM read_parquet('{cache}/shard-*.parquet')
), mm AS (
  SELECT source, (MIN(idx) + MAX(idx)) // 2 AS mid FROM t GROUP BY source
), u AS (
  SELECT t.source, CAST(t.idx <= mm.mid AS BIGINT) AS early,
         CAST(unnest(t.tokens) AS BIGINT) AS tok
  FROM t JOIN mm USING (source)
), c AS (
  SELECT source, tok,
         SUM(CASE WHEN early = 1 THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN early = 0 THEN 1 ELSE 0 END) AS c2
  FROM u GROUP BY source, tok
), n AS (
  SELECT source, CAST(SUM(c1) AS BIGINT) AS n1,
         CAST(SUM(c2) AS BIGINT) AS n2
  FROM c GROUP BY source
)
SELECT c.source,
       CAST(MAX(n.n1) AS BIGINT) AS n_early_tokens,
       CAST(MAX(n.n2) AS BIGINT) AS n_late_tokens,
       CAST(SUM(ABS(c.c1 * n.n2 - c.c2 * n.n1)) AS BIGINT) AS tvd_num
FROM c JOIN n USING (source) GROUP BY c.source
"""


def sql_seq_dedup_prefix(cache: str, k: int = 32) -> str:
    return f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT list_slice(tokens, 1, {k})) AS BIGINT)
         AS n_uniq_prefix,
       CAST(COUNT(*) - COUNT(DISTINCT list_slice(tokens, 1, {k}))
         AS BIGINT) AS n_dup_rows
FROM read_parquet('{cache}/shard-*.parquet') GROUP BY source
"""


def q_log_token_entropy(sf_dir: str):
    """Per-source Shannon entropy of the token-id distribution — the
    token-stream twin of ``log_ip_entropy`` (low entropy = a source
    emitting near-constant payloads, the stuck-sensor / bot signal).
    Vocabulary is bounded (byte codec), so each block emits a
    |sources| x <=256 bincount partial and the driver folds KBs:
    H = ln N - (sum c ln c)/N. ROUND-6 (transcendental sums)."""
    part_schema = pa.schema([("source", pa.string()), ("token", pa.int64()),
                             ("cnt", pa.int64())])
    out_schema = pa.schema([("source", pa.string()),
                            ("n_tokens", pa.int64()),
                            ("token_entropy", pa.float64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        if not len(vals):
            return part_schema.empty_table()
        enc = pc.dictionary_encode(t.column("source").combine_chunks())
        row_src = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tok_src = np.repeat(row_src, np.diff(off))
        nsrc = len(enc.dictionary)
        cnt = np.bincount(tok_src * 256 + vals, minlength=nsrc * 256)
        nz = np.nonzero(cnt)[0]
        return pa.table({
            "source": enc.dictionary.take(pa.array(nz // 256)),
            "token": pa.array(nz % 256, pa.int64()),
            "cnt": pa.array(cnt[nz], pa.int64()),
        })

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["tokens", "source"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = parts.group_by(["source", "token"]).aggregate([("cnt", "sum")])
    if g.num_rows == 0:
        return out_schema.empty_table()
    import pandas as pd

    c = g.column("cnt_sum").to_numpy(zero_copy_only=False).astype(np.float64)
    df = pd.DataFrame({"source": g.column("source").to_numpy(
        zero_copy_only=False), "n": c, "clnc": c * np.log(c)})
    agg = df.groupby("source", sort=True).sum()
    n = agg["n"].to_numpy()
    ent = np.log(n) - agg["clnc"].to_numpy() / n
    return pa.table({
        "source": pa.array(agg.index, pa.string()),
        "n_tokens": pa.array(agg["n"].astype(np.int64)),
        "token_entropy": pa.array(np.round(ent, 6)),
    }, schema=out_schema)


def sql_token_entropy(cache: str) -> str:
    return f"""
WITH tok AS (
  SELECT source, UNNEST(tokens) AS t
  FROM read_parquet('{cache}/shard-*.parquet')
), c AS (
  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
)
SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
       ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 6) AS token_entropy
FROM c GROUP BY source
"""


def q_log_source_token_tfidf(sf_dir: str, k: int = 5):
    """Top-``k`` DISTINCTIVE tokens per source by tf-idf over the token
    stream — the per-domain vocabulary signature (which byte values
    characterize a source against the corpus). Same bounded
    |sources| x 256 partial as the entropy/OOV family; the driver
    derives df (distinct sources per token) and score = c * ln(S/df)
    (unnormalized tf — a count QUOTIENT tf would hit the .5e-6
    boundary trap; c * ln(...) is a transcendental product, ROUND-6
    safe). Rank selection rides the integer composite key
    (round6(score) desc, token asc) on BOTH sides (the doc_tfidf
    rule)."""
    part_schema = pa.schema([("source", pa.string()), ("token", pa.int64()),
                             ("cnt", pa.int64())])
    out_schema = pa.schema([("source", pa.string()), ("token", pa.int64()),
                            ("cnt", pa.int64()), ("tfidf", pa.float64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        if not len(vals):
            return part_schema.empty_table()
        enc = pc.dictionary_encode(t.column("source").combine_chunks())
        row_src = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tok_src = np.repeat(row_src, np.diff(off))
        nsrc = len(enc.dictionary)
        cnt = np.bincount(tok_src * 256 + vals, minlength=nsrc * 256)
        nz = np.nonzero(cnt)[0]
        return pa.table({
            "source": enc.dictionary.take(pa.array(nz // 256)),
            "token": pa.array(nz % 256, pa.int64()),
            "cnt": pa.array(cnt[nz], pa.int64()),
        })

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["tokens", "source"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = parts.group_by(["source", "token"]).aggregate([("cnt", "sum")])
    if g.num_rows == 0:
        return out_schema.empty_table()
    import pandas as pd

    df = pd.DataFrame({
        "source": g.column("source").to_numpy(zero_copy_only=False),
        "token": g.column("token").to_numpy(zero_copy_only=False),
        "cnt": g.column("cnt_sum").to_numpy(zero_copy_only=False),
    })
    nsrc = df["source"].nunique()
    dfreq = df.groupby("token")["source"].nunique()
    score = np.round(
        df["cnt"].to_numpy().astype(np.float64)
        * np.log(nsrc / dfreq.loc[df["token"]].to_numpy()), 6)
    df["tfidf"] = score
    # integer composite rank key: (round6 desc, token asc)
    df["_key"] = (np.rint(score * 1e6).astype(np.int64) * 256
                  - df["token"].to_numpy())
    df = (df.sort_values("_key", ascending=False, kind="stable")
          .groupby("source", sort=True).head(k)
          .sort_values(["source", "_key"],
                       ascending=[True, False], kind="stable"))
    return pa.table({
        "source": pa.array(df["source"], pa.string()),
        "token": pa.array(df["token"], pa.int64()),
        "cnt": pa.array(df["cnt"], pa.int64()),
        "tfidf": pa.array(df["tfidf"], pa.float64()),
    }, schema=out_schema)


def sql_source_token_tfidf(cache: str, k: int = 5) -> str:
    return f"""
WITH tok AS (
  SELECT source, UNNEST(tokens) AS t
  FROM read_parquet('{cache}/shard-*.parquet')
), c AS (
  SELECT source, CAST(t AS BIGINT) AS token,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tok GROUP BY 1, 2
), d AS (
  SELECT token, COUNT(*) AS df FROM c GROUP BY token
), s AS (SELECT COUNT(DISTINCT source) AS n FROM c
), sc AS (
  SELECT c.source, c.token, c.cnt,
         ROUND(c.cnt * ln(CAST(s.n AS DOUBLE) / d.df), 6) AS tfidf
  FROM c JOIN d USING (token) CROSS JOIN s
), r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY source
    ORDER BY CAST(ROUND(tfidf * 1000000) AS BIGINT) * 256 - token DESC
  ) AS rk
  FROM sc
)
SELECT source, token, cnt, tfidf FROM r WHERE rk <= {k}
"""


def q_log_oov_rate(sf_dir: str, v: int = 64):
    """Per-source out-of-vocabulary rate against the corpus top-``v``
    token vocabulary — the domain-shift screen a tokenizer-refresh job
    runs (a source whose traffic falls outside the head vocabulary is
    drifting). ONE bounded pass: the same |sources| x <=256 per-block
    bincount partial yields BOTH the global histogram (top-v under the
    deterministic cnt-desc, token-asc boundary) and the per-source
    counts; the rate ships as a FLOORED integer ppm ((oov * 1e6) // n —
    the doc_quality_linear rule: count quotients land on exact .5e-6
    boundaries, ROUND-6 is a coin flip)."""
    part_schema = pa.schema([("source", pa.string()), ("token", pa.int64()),
                             ("cnt", pa.int64())])
    out_schema = pa.schema([("source", pa.string()),
                            ("n_tokens", pa.int64()),
                            ("n_oov", pa.int64()),
                            ("oov_ppm", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        if not len(vals):
            return part_schema.empty_table()
        enc = pc.dictionary_encode(t.column("source").combine_chunks())
        row_src = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tok_src = np.repeat(row_src, np.diff(off))
        nsrc = len(enc.dictionary)
        cnt = np.bincount(tok_src * 256 + vals, minlength=nsrc * 256)
        nz = np.nonzero(cnt)[0]
        return pa.table({
            "source": enc.dictionary.take(pa.array(nz // 256)),
            "token": pa.array(nz % 256, pa.int64()),
            "cnt": pa.array(cnt[nz], pa.int64()),
        })

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["tokens", "source"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = parts.group_by(["source", "token"]).aggregate([("cnt", "sum")])
    if g.num_rows == 0:
        return out_schema.empty_table()
    tok = g.column("token").to_numpy(zero_copy_only=False)
    cnt = g.column("cnt_sum").to_numpy(zero_copy_only=False)
    glob = np.zeros(256, dtype=np.int64)
    np.add.at(glob, tok, cnt)
    # top-v under (cnt desc, token asc): lexsort on (-cnt, token)
    order = np.lexsort((np.arange(256), -glob))
    vocab = np.zeros(256, dtype=bool)
    vocab[order[:v][glob[order[:v]] > 0]] = True
    import pandas as pd

    df = pd.DataFrame({"source": g.column("source").to_numpy(
        zero_copy_only=False), "n": cnt,
        "oov": np.where(vocab[tok], 0, cnt)})
    agg = df.groupby("source", sort=True).sum()
    n = agg["n"].to_numpy().astype(np.int64)
    oov = agg["oov"].to_numpy().astype(np.int64)
    return pa.table({
        "source": pa.array(agg.index, pa.string()),
        "n_tokens": pa.array(n),
        "n_oov": pa.array(oov),
        "oov_ppm": pa.array(oov * 1_000_000 // n),
    }, schema=out_schema)


def sql_oov_rate(cache: str, v: int = 64) -> str:
    return f"""
WITH tok AS (
  SELECT source, UNNEST(tokens) AS t
  FROM read_parquet('{cache}/shard-*.parquet')
), g AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t
), voc AS (
  SELECT t FROM g ORDER BY c DESC, t LIMIT {v}
), sc AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN t IN (SELECT t FROM voc) THEN 0 ELSE 1 END)
              AS BIGINT) AS oov
  FROM tok GROUP BY source
)
SELECT source, n AS n_tokens, oov AS n_oov,
       CAST((oov * 1000000) // n AS BIGINT) AS oov_ppm
FROM sc
"""


def q_log_seq_len_buckets(sf_dir: str, width: int = 128):
    """Per-(source, length-bucket) sequence histogram with padding
    efficiency — the batch-shape audit a packing/padding training job
    runs before choosing seq_len: bucket = n_tok // width, padded cap =
    (bucket+1)*width, and pad_ppm = the FLOORED ppm of wasted slots if
    each sequence padded to its bucket cap. Reads only (source, n_tok)
    — the payload never leaves storage. Bounded partials:
    |sources| x (max_len/width) rows per block. All-integer outputs
    (the floored-micro-score rule)."""
    part_schema = pa.schema([("source", pa.string()), ("bucket", pa.int64()),
                             ("n_seqs", pa.int64()),
                             ("sum_tokens", pa.int64())])
    out_schema = pa.schema([("source", pa.string()), ("bucket", pa.int64()),
                            ("n_seqs", pa.int64()),
                            ("sum_tokens", pa.int64()),
                            ("pad_ppm", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        nt = t.column("n_tok").to_numpy(zero_copy_only=False).astype(np.int64)
        enc = pc.dictionary_encode(t.column("source").combine_chunks())
        src = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        b = nt // width
        nb = int(b.max()) + 1
        key = src * nb + b
        cnt = np.bincount(key, minlength=len(enc.dictionary) * nb)
        tot = np.bincount(key, weights=nt,
                          minlength=len(enc.dictionary) * nb)
        nz = np.nonzero(cnt)[0]
        return pa.table({
            "source": enc.dictionary.take(pa.array(nz // nb)),
            "bucket": pa.array(nz % nb, pa.int64()),
            "n_seqs": pa.array(cnt[nz], pa.int64()),
            "sum_tokens": pa.array(tot[nz].astype(np.int64)),
        })

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["n_tok", "source"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = parts.group_by(["source", "bucket"]).aggregate(
        [("n_seqs", "sum"), ("sum_tokens", "sum")])
    if g.num_rows == 0:
        return out_schema.empty_table()
    b = g.column("bucket").to_numpy(zero_copy_only=False)
    n = g.column("n_seqs_sum").to_numpy(zero_copy_only=False)
    s = g.column("sum_tokens_sum").to_numpy(zero_copy_only=False)
    cap = (b + 1) * width * n
    return pa.table({
        "source": g.column("source"),
        "bucket": pa.array(b, pa.int64()),
        "n_seqs": pa.array(n, pa.int64()),
        "sum_tokens": pa.array(s, pa.int64()),
        "pad_ppm": pa.array((cap - s) * 1_000_000 // cap, pa.int64()),
    }, schema=out_schema)


def sql_seq_len_buckets(cache: str, width: int = 128) -> str:
    return f"""
WITH b AS (
  SELECT source, CAST(n_tok // {width} AS BIGINT) AS bucket,
         CAST(n_tok AS BIGINT) AS n_tok
  FROM read_parquet('{cache}/shard-*.parquet')
), g AS (
  SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_seqs,
         CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
  FROM b GROUP BY 1, 2
)
SELECT source, bucket, n_seqs, sum_tokens,
       CAST(((bucket + 1) * {width} * n_seqs - sum_tokens) * 1000000
            // ((bucket + 1) * {width} * n_seqs) AS BIGINT) AS pad_ppm
FROM g
"""


_NGRAM_OUT = pa.schema([("source", pa.string()), ("n_docs", pa.int64()),
                        ("n_flagged", pa.int64())])


def q_log_token_ngram_dedup(sf_dir: str, n: int = 8, mod: int = 8):
    """Cross-sequence token n-gram duplication per source — the
    Rao-style contamination / near-dup screen at the TOKEN level: a
    sequence is FLAGGED when it shares an n-token window with a
    DIFFERENT sequence (exact duplicates share all windows; partial
    copies share their overlap). Byte codec means an 8-token window
    packs EXACTLY into 64 bits — window identity is collision-free, no
    probabilistic hashing. MOD-sampling (keep keys with key % mod == 0)
    bounds the exchange to ~1/mod of the token volume; it is a
    DETERMINISTIC fingerprint subset the SQL gate reproduces from the
    same integer packing (``mod=1`` is the exhaustive variant).

    Two raw-task exchanges, payload never moves:
      A (per read block, ``num_returns=2P``): pack windows, validity =
        window start and end share a row, distinct (key, doc) pairs
        route by the key's Fibonacci hash (first P slots); distinct
        (doc, source) rows route by doc hash (last P slots).
      B (per key partition): flag docs whose key carries >=2 distinct
        docs; re-route flagged ids by doc hash (``num_returns=P``).
      C (per doc partition): fold flagged ids against the (doc, source)
        rows — searchsorted membership — and emit bounded per-source
        (n_docs, n_flagged) partials; the driver sums P x |sources|.
    """
    import ray

    from .datapipe import _lp_split, _n_parts

    P = max(2, _n_parts())

    def window_partial(t: pa.Table) -> list:
        idx = _pack_idx(t.column("doc_id"))
        dtab = pa.table({"idx": pa.array(idx, pa.int64()),
                         "source": t.column("source")})
        dparts = [dtab.take(pa.array(ix)) for ix in _ngram_doc_slots(idx, P)]
        vals, off = _token_lists(t.column("tokens"))
        lens = np.diff(off)
        m = len(vals) - n + 1
        if m <= 0:
            pairs = [(np.zeros(0, np.int64), np.zeros(0, np.int64))] * P
        else:
            # key % mod depends ONLY on the first token when mod | 256
            # (256 == 0 mod 2^b for b <= 8), so sampling is decided
            # BEFORE packing and full keys are gathered at ~1/mod of
            # the positions — the 8-pass pack runs on the sample, not
            # the corpus (35 s -> see BENCH for the measured cut).
            cheap_mod = mod > 1 and 256 % mod == 0
            if cheap_mod:
                sel = np.flatnonzero(vals[:m] % mod == 0)
            else:
                sel = np.arange(m, dtype=np.int64)
            # row of a token position via searchsorted on the (small)
            # offsets array — no corpus-length np.repeat
            r0 = np.searchsorted(off, sel, side="right") - 1
            r1 = np.searchsorted(off, sel + n - 1, side="right") - 1
            same = r0 == r1
            sel, r0 = sel[same], r0[same]
            k = np.zeros(len(sel), np.uint64)
            for j in range(n):
                k += vals[sel + j].astype(np.uint64) << np.uint64(8 * j)
            if mod > 1 and not cheap_mod:
                keep = (k % np.uint64(mod)) == 0
                k, r0 = k[keep], r0[keep]
            wk = k.astype(np.int64)
            wd = idx[r0]
            o = np.lexsort((wd, wk))
            wk, wd = wk[o], wd[o]
            first = np.ones(len(wk), dtype=bool)
            first[1:] = (wk[1:] != wk[:-1]) | (wd[1:] != wd[:-1])
            wk, wd = wk[first], wd[first]
            shards = _lp_split(wk, P, wk, wd)
            pairs = [(s[0], s[1]) for s in shards]
        return list(pairs) + dparts

    def flag_part(*shards) -> list:
        ks = np.concatenate([s[0] for s in shards])
        if not len(ks):
            return [np.zeros(0, np.int64)] * P
        ds_ = np.concatenate([s[1] for s in shards])
        o = np.lexsort((ds_, ks))
        ks, ds_ = ks[o], ds_[o]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = (ks[1:] != ks[:-1]) | (ds_[1:] != ds_[:-1])
        ks, ds_ = ks[first], ds_[first]
        newk = np.ones(len(ks), dtype=bool)
        newk[1:] = ks[1:] != ks[:-1]
        kid = np.cumsum(newk) - 1
        ndoc = np.bincount(kid)
        flagged = np.unique(ds_[ndoc[kid] >= 2])
        return [s[0] for s in _lp_split(flagged, P, flagged)]

    def count_part(nb: int, *args) -> pa.Table:
        flagged = np.unique(np.concatenate(args[:nb])) \
            if nb else np.zeros(0, np.int64)
        tabs = [t for t in args[nb:] if t.num_rows]
        if not tabs:
            return _NGRAM_OUT.empty_table()
        t = pa.concat_tables(tabs)
        di = t.column("idx").to_numpy(zero_copy_only=False)
        if len(flagged):
            pos = np.searchsorted(flagged, di)
            fl = (pos < len(flagged)) & \
                (flagged[np.minimum(pos, len(flagged) - 1)] == di)
        else:
            fl = np.zeros(len(di), dtype=bool)
        g = pa.table({"source": t.column("source"),
                      "fl": pa.array(fl.astype(np.int64))}) \
            .group_by("source").aggregate([("fl", "sum"), ("fl", "count")])
        return pa.table({"source": g.column("source"),
                         "n_docs": g.column("fl_count").cast(pa.int64()),
                         "n_flagged": g.column("fl_sum").cast(pa.int64())},
                        schema=_NGRAM_OUT)

    ds = _read_tokens(sf_dir, ["doc_id", "tokens", "source"])
    refs = [r for b in ds.iter_internal_ref_bundles()
            for r, md in b.blocks if md.num_rows]
    if not refs:
        return _NGRAM_OUT.empty_table()
    # bandwidth cap (target 16/node): the window stage streams ~0.5 GB
    # of temporaries per block — at 32 concurrent tasks it is
    # memory-BANDWIDTH-bound (the ivf_assign rule) and measured 36 s;
    # at 16 concurrent it is 6.9 s for the same 64 tasks. The cap
    # derives from per-node cpus (datapipe._bw_task_cpus), overridable
    # via SBO_BW_TASK_CPUS.
    from .datapipe import _bw_task_cpus

    wtask = ray.remote(num_cpus=_bw_task_cpus(16))(window_partial)
    sl = [wtask.options(num_returns=2 * P).remote(r) for r in refs]
    ftask = ray.remote(flag_part)
    fl = [ftask.options(num_returns=P).remote(*[s[p] for s in sl])
          for p in range(P)]
    ctask = ray.remote(count_part)
    outs = ray.get([ctask.remote(P, *[f[p] for f in fl],
                                 *[s[P + p] for s in sl])
                    for p in range(P)])
    merged = pa.concat_tables([_NGRAM_OUT.empty_table()] + outs)
    g = merged.group_by("source").aggregate(
        [("n_docs", "sum"), ("n_flagged", "sum")])
    g = g.sort_by("source")
    return pa.table({"source": g.column("source"),
                     "n_docs": g.column("n_docs_sum"),
                     "n_flagged": g.column("n_flagged_sum")},
                    schema=_NGRAM_OUT)


def _ngram_doc_slots(idx: np.ndarray, P: int) -> list:
    """Per-partition row-index lists for the doc-hash routing of one
    block's (doc, source) rows."""
    from .datapipe import _lp_partition

    part = _lp_partition(idx, P)
    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(P + 1))
    return [order[s:e] for s, e in zip(bounds[:-1], bounds[1:])]


def sql_token_ngram_dedup(cache: str, n: int = 8, mod: int = 8) -> str:
    # Key packing assumes byte-alphabet tokens (the synth emits ASCII,
    # < 128). The top token contributes only its low 7 bits so the max
    # key is 127*2^56 + (2^56 - 1) = 2^63 - 1: exactly BIGINT's ceiling
    # (the full 8-byte pack overflows DuckDB BIGINT whenever
    # tokens[i+7] >= 128, and a wrapped-negative key would also flip
    # the sign of `%` vs the engine's uint64 arithmetic). Under
    # tokens < 128 this equals the engine's uint64 pack exactly; the
    # `% mod` sample gate only reads the LOW byte either way (mod | 256).
    key_expr = " + ".join(
        [f"CAST(tokens[i + {j}] AS BIGINT) * {256 ** j}"
         for j in range(n - 1)]
        + [f"(CAST(tokens[i + {n - 1}] AS BIGINT) % 128) * {256 ** (n - 1)}"])
    return f"""
WITH t AS (
  SELECT doc_id, source, tokens
  FROM read_parquet('{cache}/shard-*.parquet')
), w AS (
  SELECT doc_id, UNNEST(range(1, len(tokens) - {n - 2})) AS i, tokens
  FROM t WHERE len(tokens) >= {n}
), k AS (
  SELECT DISTINCT doc_id, ({key_expr}) AS key
  FROM w WHERE ({key_expr}) % {mod} = 0
), dup AS (
  SELECT key FROM k GROUP BY key HAVING COUNT(*) >= 2
), f AS (
  SELECT DISTINCT doc_id FROM k JOIN dup USING (key)
)
SELECT t.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN t.doc_id IN (SELECT doc_id FROM f)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM t GROUP BY t.source
"""


# MinHash permutations for the sequence-level LSH screen: fixed
# splitmix64-derived literals (seed 0x5B0D15EA5E) inlined IDENTICALLY
# in engine and SQL so both sides share even the measure-zero bucket
# collisions (the SQL_DOC_DEDUP_BLOOM idiom). `a` odd and < 2^63 keeps
# the HUGEINT product key*a under 2^126; multiplication is a bijection
# mod 2^64, so MIN over mixed values is a true random-permutation
# minhash over the shingle set.
_MH_PERMS = [
    (6698740489981662329, 3961510563213103532),
    (9122142385165379629, 15575342289356118037),
    (4981005850455499555, 2032176840757408894),
    (8044840983104390915, 13583538345556976089),
    (7003095758439198859, 14421731125339708525),
    (3006245995960931799, 16635559838824503520),
    (5831616574936867065, 10851766758036684565),
    (6838381415049370237, 13593236666999549439),
]
# band-bucket composite constants (odd, < 2^63: see the >>1 note below)
_MH_C1 = 360839617768999383
_MH_C2 = 6902168378812320377

_MH_OUT = pa.schema([("source", pa.string()), ("n_rows", pa.int64()),
                     ("n_sig", pa.int64()), ("n_flagged", pa.int64())])


def q_log_seq_dedup_minhash(sf_dir: str, n: int = 8, mod: int = 8):
    """MinHash-LSH NEAR-duplicate screen over token sequences — the
    probabilistic sibling of log_token_ngram_dedup (which flags on ONE
    shared window, catching any overlap): here a sequence is flagged
    only when a whole LSH band collides, i.e. estimated shingle-Jaccard
    is high (4 bands x 2 rows -> ~50% threshold), the Broder-style
    near-dup filter a crawl-curation pipeline runs between exact dedup
    and O(n^2) verification.

    Shingles are the mod-sampled 8-token windows (byte codec: the
    window packs exactly into 64 bits, and `key % mod` for mod | 256
    depends only on the first token, so sampling decides BEFORE
    packing). Minhash = min over sampled shingles of (key*a + b) mod
    2^64 per fixed permutation; bands pair consecutive mins; the band
    bucket is a shared-literal composite mod 2^64, so the SQL mirror
    reproduces the ENGINE's buckets bit-for-bit (including its
    vanishing collision probability) — the gate is exact, not
    approximate.

    Engine shape: the log_token_ngram_dedup three-wave raw-task
    exchange, with per-row signatures instead of per-window keys —
    (bucket, doc) pairs route by bucket hash, flagged ids re-route by
    doc hash, bounded per-source partials fold on the driver. Payload
    tokens never move; the exchange carries 4 x 16 bytes per row."""
    import ray

    from .datapipe import _bw_task_cpus, _lp_split, _n_parts

    P = max(2, _n_parts())
    nbands = len(_MH_PERMS) // 2

    def window_partial(t: pa.Table) -> list:
        idx = _pack_idx(t.column("doc_id"))
        vals, off = _token_lists(t.column("tokens"))
        sig = np.zeros(t.num_rows, dtype=bool)
        bks = np.zeros(0, np.int64)
        bds = np.zeros(0, np.int64)
        m = len(vals) - n + 1
        if m > 0:
            sel = np.flatnonzero(vals[:m] % mod == 0)
            r0 = np.searchsorted(off, sel, side="right") - 1
            r1 = np.searchsorted(off, sel + n - 1, side="right") - 1
            same = r0 == r1
            sel, r0 = sel[same], r0[same]
            if len(sel):
                k = np.zeros(len(sel), np.uint64)
                for j in range(n):
                    k += vals[sel + j].astype(np.uint64) << np.uint64(8 * j)
                # sel ascending => r0 non-decreasing: contiguous segments
                seg_starts = np.r_[0, np.flatnonzero(np.diff(r0)) + 1]
                seg_rows = r0[seg_starts]
                sig[seg_rows] = True
                mins = np.empty((len(_MH_PERMS), len(seg_starts)), np.uint64)
                for j, (a, b) in enumerate(_MH_PERMS):
                    mixed = k * np.uint64(a) + np.uint64(b)
                    mins[j] = np.minimum.reduceat(mixed, seg_starts)
                bands = []
                for band in range(nbands):
                    # >>1 before the composite so the SQL twin's
                    # HUGEINT products stay under 2^126 (the bloom
                    # th >> 1 trick); uint64 wraparound == mod 2^64
                    b0 = mins[2 * band] >> np.uint64(1)
                    b1 = mins[2 * band + 1] >> np.uint64(1)
                    bk = (b0 * np.uint64(_MH_C1) + b1 * np.uint64(_MH_C2)
                          + np.uint64(band + 1))
                    bands.append(bk.view(np.int64))
                bks = np.concatenate(bands)
                bds = np.tile(idx[seg_rows], nbands)
                o = np.lexsort((bds, bks))
                bks, bds = bks[o], bds[o]
                first = np.ones(len(bks), dtype=bool)
                first[1:] = (bks[1:] != bks[:-1]) | (bds[1:] != bds[:-1])
                bks, bds = bks[first], bds[first]
        dtab = pa.table({"idx": pa.array(idx, pa.int64()),
                         "source": t.column("source"),
                         "sig": pa.array(sig)})
        dparts = [dtab.take(pa.array(ix)) for ix in _ngram_doc_slots(idx, P)]
        shards = _lp_split(bks, P, bks, bds)
        return [(s[0], s[1]) for s in shards] + dparts

    def flag_part(*shards) -> list:
        ks = np.concatenate([s[0] for s in shards])
        if not len(ks):
            return [np.zeros(0, np.int64)] * P
        ds_ = np.concatenate([s[1] for s in shards])
        o = np.lexsort((ds_, ks))
        ks, ds_ = ks[o], ds_[o]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = (ks[1:] != ks[:-1]) | (ds_[1:] != ds_[:-1])
        ks, ds_ = ks[first], ds_[first]
        newk = np.ones(len(ks), dtype=bool)
        newk[1:] = ks[1:] != ks[:-1]
        kid = np.cumsum(newk) - 1
        ndoc = np.bincount(kid)
        flagged = np.unique(ds_[ndoc[kid] >= 2])
        return [s[0] for s in _lp_split(flagged, P, flagged)]

    def count_part(nb: int, *args) -> pa.Table:
        flagged = np.unique(np.concatenate(args[:nb])) \
            if nb else np.zeros(0, np.int64)
        tabs = [t for t in args[nb:] if t.num_rows]
        if not tabs:
            return _MH_OUT.empty_table()
        t = pa.concat_tables(tabs)
        di = t.column("idx").to_numpy(zero_copy_only=False)
        if len(flagged):
            pos = np.searchsorted(flagged, di)
            fl = (pos < len(flagged)) & \
                (flagged[np.minimum(pos, len(flagged) - 1)] == di)
        else:
            fl = np.zeros(len(di), dtype=bool)
        g = pa.table({
            "source": t.column("source"),
            "fl": pa.array(fl.astype(np.int64)),
            "sig": t.column("sig").cast(pa.int64()),
        }).group_by("source").aggregate(
            [("fl", "sum"), ("fl", "count"), ("sig", "sum")])
        return pa.table({"source": g.column("source"),
                         "n_rows": g.column("fl_count").cast(pa.int64()),
                         "n_sig": g.column("sig_sum").cast(pa.int64()),
                         "n_flagged": g.column("fl_sum").cast(pa.int64())},
                        schema=_MH_OUT)

    ds = _read_tokens(sf_dir, ["doc_id", "tokens", "source"])
    refs = [r for b in ds.iter_internal_ref_bundles()
            for r, md in b.blocks if md.num_rows]
    if not refs:
        return _MH_OUT.empty_table()
    # same ~0.5 GB-of-temps-per-block profile as the ngram window
    # stage -> same bandwidth cap (target 16/node)
    wtask = ray.remote(num_cpus=_bw_task_cpus(16))(window_partial)
    sl = [wtask.options(num_returns=2 * P).remote(r) for r in refs]
    ftask = ray.remote(flag_part)
    fl = [ftask.options(num_returns=P).remote(*[s[p] for s in sl])
          for p in range(P)]
    ctask = ray.remote(count_part)
    outs = ray.get([ctask.remote(P, *[f[p] for f in fl],
                                 *[s[P + p] for s in sl])
                    for p in range(P)])
    merged = pa.concat_tables([_MH_OUT.empty_table()] + outs)
    g = merged.group_by("source").aggregate(
        [("n_rows", "sum"), ("n_sig", "sum"), ("n_flagged", "sum")])
    g = g.sort_by("source")
    return pa.table({"source": g.column("source"),
                     "n_rows": g.column("n_rows_sum"),
                     "n_sig": g.column("n_sig_sum"),
                     "n_flagged": g.column("n_flagged_sum")},
                    schema=_MH_OUT)


def sql_seq_dedup_minhash(cache: str, n: int = 8, mod: int = 8) -> str:
    # Same capped byte-alphabet window pack as sql_token_ngram_dedup
    # (max key 2^63 - 1, equal to the engine's uint64 pack while
    # tokens < 128 — the documented synth alphabet). All mod-2^64
    # arithmetic runs in HUGEINT: key*a < 2^126, and the band
    # composite uses mv // 2 so each product stays < 2^126 (their sum
    # < 2^127 - 1, HUGEINT's ceiling) — the bloom-gate wraparound
    # idiom. MIN over HUGEINT values in [0, 2^64) equals uint64 MIN.
    key_expr = " + ".join(
        [f"CAST(tokens[i + {j}] AS BIGINT) * {256 ** j}"
         for j in range(n - 1)]
        + [f"(CAST(tokens[i + {n - 1}] AS BIGINT) % 128) * {256 ** (n - 1)}"])
    perms = ", ".join(f"({j}, {a}::HUGEINT, {b}::HUGEINT)"
                      for j, (a, b) in enumerate(_MH_PERMS))
    m64 = "18446744073709551616::HUGEINT"
    return f"""
WITH t AS (
  SELECT doc_id, source, tokens
  FROM read_parquet('{cache}/shard-*.parquet')
), w AS (
  SELECT doc_id, UNNEST(range(1, len(tokens) - {n - 2})) AS i, tokens
  FROM t WHERE len(tokens) >= {n}
), k AS (
  SELECT DISTINCT doc_id, ({key_expr})::HUGEINT AS key
  FROM w WHERE ({key_expr}) % {mod} = 0
), mh AS (
  SELECT doc_id, p.j, MIN((k.key * p.a + p.b) % {m64}) AS mv
  FROM k CROSS JOIN (VALUES {perms}) p(j, a, b)
  GROUP BY doc_id, p.j
), sig AS (
  SELECT doc_id, j // 2 AS band,
         MIN(CASE WHEN j % 2 = 0 THEN mv END) AS mv0,
         MIN(CASE WHEN j % 2 = 1 THEN mv END) AS mv1
  FROM mh GROUP BY doc_id, j // 2
), bk AS (
  SELECT doc_id,
         ((mv0 // 2) * {_MH_C1}::HUGEINT + (mv1 // 2) * {_MH_C2}::HUGEINT
          + band + 1) % {m64} AS bucket
  FROM sig
), dup AS (
  SELECT bucket FROM bk GROUP BY bucket HAVING COUNT(*) >= 2
), f AS (
  SELECT DISTINCT doc_id FROM bk JOIN dup USING (bucket)
), s AS (
  SELECT DISTINCT doc_id FROM k
)
SELECT t.source, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN t.doc_id IN (SELECT doc_id FROM s)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sig,
       CAST(SUM(CASE WHEN t.doc_id IN (SELECT doc_id FROM f)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM t GROUP BY t.source
"""


_ZIPF_OUT = pa.schema([("source", pa.string()), ("slope", pa.float64()),
                       ("n_distinct", pa.int64())])


def q_log_token_zipf(sf_dir: str):
    """Per-source Zipf slope: the least-squares slope of ln(freq) on
    ln(rank) over the source's token frequency distribution (rank ties
    broken by token id, matching the SQL ROW_NUMBER) — natural-ish
    payloads sit near -1, near-uniform machine noise near 0, and
    near-constant payloads go steeply negative; the corpus-health
    scalar a mixing job tracks per source.

    The per-(source, token) counts are the bounded histogram partials
    (|sources| x 256), so the regression itself is driver-side
    arithmetic on KBs. The slope is a quotient of transcendental sums
    — ROUND-6 safe (last-ulp noise only; the doc_tfidf rule), with
    integer rank/count inputs identical on both sides."""
    part_schema = pa.schema([("source", pa.string()), ("token", pa.int64()),
                             ("cnt", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        if not len(vals):
            return part_schema.empty_table()
        nt = np.diff(off)
        enc = pc.dictionary_encode(t.column("source").combine_chunks())
        src = np.repeat(enc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64), nt)
        nsrc = len(enc.dictionary)
        cnt = np.bincount(src * 256 + vals.astype(np.int64),
                          minlength=nsrc * 256)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "source": enc.dictionary.take(pa.array(nz // 256)),
            "token": pa.array((nz % 256).astype(np.int64)),
            "cnt": pa.array(cnt[nz].astype(np.int64)),
        })

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["tokens", "source"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = parts.group_by(["source", "token"]).aggregate([("cnt", "sum")])
    df = g.rename_columns(["source", "token", "cnt"]).to_pandas()
    rows = []
    for src, grp in df.groupby("source", sort=True):
        grp = grp.sort_values(["cnt", "token"],
                              ascending=[False, True])
        n = len(grp)
        x = np.log(np.arange(1, n + 1, dtype=np.float64))
        y = np.log(grp["cnt"].to_numpy(dtype=np.float64))
        xm, ym = x.mean(), y.mean()
        den = ((x - xm) ** 2).sum()
        slope = float(((x - xm) * (y - ym)).sum() / den) if den else 0.0
        rows.append((src, round(slope, 6), n))
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "slope": pa.array([r[1] for r in rows], pa.float64()),
        "n_distinct": pa.array([r[2] for r in rows], pa.int64()),
    }, schema=_ZIPF_OUT)


def sql_token_zipf(cache: str) -> str:
    return f"""
WITH c AS (
  SELECT source, CAST(tok AS BIGINT) AS token,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM read_parquet('{cache}/shard-*.parquet') t, UNNEST(t.tokens) AS u(tok)
  GROUP BY source, token
), r AS (
  SELECT source, cnt,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY cnt DESC, token) AS rank
  FROM c
), s AS (
  SELECT source, LN(rank) AS x, LN(cnt) AS y FROM r
)
SELECT source,
       COALESCE(ROUND(SUM((x - ax) * (y - ay))
             / NULLIF(SUM((x - ax) * (x - ax)), 0), 6), 0.0) AS slope,
       CAST(COUNT(*) AS BIGINT) AS n_distinct
FROM (SELECT source, x, y,
             AVG(x) OVER (PARTITION BY source) AS ax,
             AVG(y) OVER (PARTITION BY source) AS ay
      FROM s)
GROUP BY source ORDER BY source
"""


_DECON_OUT = pa.schema([("source", pa.string()), ("n_rows", pa.int64()),
                        ("n_flagged", pa.int64())])


def q_log_decontaminate_eval(sf_dir: str, n: int = 8, mod: int = 8,
                             every: int = 1000):
    """Train/eval DECONTAMINATION on the token axis: hold out every
    ``every``-th ingestion index as the eval slice, then flag every
    TRAIN sequence sharing a sampled 8-token window with any eval
    sequence — the n-gram leakage screen run before an eval split is
    trusted (the doc-side twin is doc_decontaminate_ngram; here the
    grams are token windows, no text).

    Two bounded passes over the same pruned read: pass 1 reduces eval
    rows (a 1/``every`` sliver) to their distinct sampled window keys
    — a small sorted array broadcast once via ray.put; pass 2 flags
    train rows by searchsorted membership, block-locally, and emits
    |sources| x 2 integer partials. No exchange: the blocklist is the
    only shared state (the broadcast-small-side rule)."""
    import ray

    def eval_keys(t: pa.Table) -> pa.Table:
        idx = _pack_idx(t.column("doc_id"))
        sel_rows = idx % every == 0
        if not sel_rows.any():
            return pa.schema([("key", pa.int64())]).empty_table()
        sub = t.filter(pa.array(sel_rows))
        vals, off = _token_lists(sub.column("tokens"))
        k = _sampled_window_keys(vals, off, n, mod)[0]
        return pa.table({"key": pa.array(np.unique(k).view(np.int64))})

    parts = pa.concat_tables(
        [pa.schema([("key", pa.int64())]).empty_table()] +
        list(_read_tokens(sf_dir, ["doc_id", "tokens"])
             .map_batches(eval_keys, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    block = np.unique(parts.column("key").to_numpy(zero_copy_only=False))
    block_ref = ray.put(block)

    part_schema = pa.schema([("source", pa.string()), ("n_rows", pa.int64()),
                             ("n_flagged", pa.int64())])

    def flag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        bl = ray.get(block_ref)
        idx = _pack_idx(t.column("doc_id"))
        train = idx % every != 0
        sub = t.filter(pa.array(train))
        vals, off = _token_lists(sub.column("tokens"))
        k, rows = _sampled_window_keys(vals, off, n, mod)
        hit = np.zeros(sub.num_rows, dtype=bool)
        if len(k) and len(bl):
            ks = k.view(np.int64)
            pos = np.searchsorted(bl, ks)
            m = (pos < len(bl)) & (bl[np.minimum(pos, len(bl) - 1)] == ks)
            hit[rows[m]] = True
        enc = pc.dictionary_encode(sub.column("source").combine_chunks())
        src = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nsrc = len(enc.dictionary)
        return pa.table({
            "source": enc.dictionary,
            "n_rows": pa.array(np.bincount(src, minlength=nsrc)
                               .astype(np.int64)),
            "n_flagged": pa.array(
                np.bincount(src, weights=hit,
                            minlength=nsrc).astype(np.int64)),
        })

    out = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["doc_id", "tokens", "source"])
             .map_batches(flag, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = out.group_by("source").aggregate(
        [("n_rows", "sum"), ("n_flagged", "sum")])
    g = g.rename_columns(["source", "n_rows", "n_flagged"])
    g = g.sort_by([("source", "ascending")])
    return pa.table({
        "source": g.column("source"),
        "n_rows": g.column("n_rows").cast(pa.int64()),
        "n_flagged": g.column("n_flagged").cast(pa.int64()),
    }, schema=_DECON_OUT)


def _sampled_window_keys(vals: np.ndarray, off: np.ndarray, n: int,
                         mod: int) -> tuple:
    """Capped-top-byte packed keys of within-row n-token windows whose
    FIRST token is 0 mod ``mod`` (the shared sampled-window pack), plus
    each window's row id."""
    m = len(vals) - n + 1
    if m <= 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    sel = np.flatnonzero(vals[:m] % mod == 0)
    r0 = np.searchsorted(off, sel, side="right") - 1
    r1 = np.searchsorted(off, sel + n - 1, side="right") - 1
    same = r0 == r1
    sel, r0 = sel[same], r0[same]
    if not len(sel):
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    k = np.zeros(len(sel), np.uint64)
    for j in range(n - 1):
        k += vals[sel + j].astype(np.uint64) << np.uint64(8 * j)
    k += (vals[sel + n - 1].astype(np.uint64)
          % np.uint64(128)) << np.uint64(8 * (n - 1))
    return k, r0


def sql_decontaminate_eval(cache: str, n: int = 8, mod: int = 8,
                           every: int = 1000) -> str:
    key_expr = " + ".join(
        [f"CAST(tokens[i + {j}] AS BIGINT) * {256 ** j}"
         for j in range(n - 1)]
        + [f"(CAST(tokens[i + {n - 1}] AS BIGINT) % 128) * {256 ** (n - 1)}"])
    return f"""
WITH t AS (
  SELECT doc_id, source, tokens,
         CAST(right(doc_id, 12) AS BIGINT) AS idx
  FROM read_parquet('{cache}/shard-*.parquet')
), w AS (
  SELECT doc_id, source, idx,
         UNNEST(range(1, len(tokens) - {n - 2})) AS i, tokens
  FROM t WHERE len(tokens) >= {n}
), k AS (
  SELECT DISTINCT doc_id, source, idx, ({key_expr}) AS key
  FROM w WHERE ({key_expr}) % {mod} = 0
), ek AS (
  SELECT DISTINCT key FROM k WHERE idx % {every} = 0
), f AS (
  SELECT DISTINCT doc_id FROM k
  WHERE idx % {every} != 0 AND key IN (SELECT key FROM ek)
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN t.doc_id IN (SELECT doc_id FROM f)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM t WHERE idx % {every} != 0
GROUP BY source ORDER BY source
"""


_DUPGAP_OUT = pa.schema([("gap_bucket", pa.int64()),
                         ("n_pairs", pa.int64())])


def q_log_dup_gap_histogram(sf_dir: str):
    """How FAR APART duplicate copies arrive: histogram of
    floor(log2(ingestion-index gap)) over consecutive copies of each
    duplicated sequence — the measurement that sizes a streaming-dedup
    window (mass in low buckets = a bounded LRU window catches most
    duplicates; heavy high buckets = only global dedup works).

    The log_seq_dedup exchange shape: (h, idx) pairs route by h % P so
    every copy of a sequence lands in one partition; the fold sorts,
    diffs consecutive idx per h, and buckets gaps through the EXACT
    frexp exponent (integer for gaps < 2^53 — never a raw log2, the
    transcendental-gating rule); the SQL twin buckets via
    strlen(bin(gap)) - 1, bit-identical."""
    import ray

    P = max(4, int(ray.cluster_resources().get("CPU", 4)))
    part_schema = pa.schema([("h", pa.int64()), ("idx", pa.int64()),
                             ("part", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        h = _seq_hash64(vals, off)
        idx = _pack_idx(t.column("doc_id"))
        part = (h % np.uint64(P)).astype(np.int64)
        return pa.table({"h": pa.array(h.view(np.int64)),
                         "idx": pa.array(idx, pa.int64()),
                         "part": pa.array(part)})

    def fold_part(g: "pd.DataFrame"):
        import pandas as pd

        h = g["h"].to_numpy()
        idx = g["idx"].to_numpy()
        o = np.lexsort((idx, h))
        h, idx = h[o], idx[o]
        same = np.zeros(len(h), dtype=bool)
        same[1:] = h[1:] == h[:-1]
        gaps = (idx[1:] - idx[:-1])[same[1:]]
        if not len(gaps):
            return pd.DataFrame({"gap_bucket": pd.Series([], dtype="int64"),
                                 "n_pairs": pd.Series([], dtype="int64")})
        bk = (np.frexp(gaps.astype(np.float64))[1] - 1).astype(np.int64)
        ub, cnt = np.unique(bk, return_counts=True)
        return pd.DataFrame({"gap_bucket": ub,
                             "n_pairs": cnt.astype("int64")})

    parts = (_read_tokens(sf_dir, ["doc_id", "tokens"])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("part").map_groups(fold_part))
    df = logpipe.to_pandas_with_schema(parts, _DUPGAP_OUT)
    out = (df.groupby("gap_bucket", sort=True)["n_pairs"].sum()
           .reset_index())
    return pa.table({
        "gap_bucket": pa.array(out["gap_bucket"], type=pa.int64()),
        "n_pairs": pa.array(out["n_pairs"], type=pa.int64()),
    }, schema=_DUPGAP_OUT)


def sql_dup_gap_histogram(cache: str) -> str:
    return f"""
WITH t AS (
  SELECT tokens, CAST(right(doc_id, 12) AS BIGINT) AS idx
  FROM read_parquet('{cache}/shard-*.parquet')
), g AS (
  SELECT idx - LAG(idx) OVER (PARTITION BY tokens ORDER BY idx) AS gap
  FROM t
)
SELECT CAST(strlen(bin(gap)) - 1 AS BIGINT) AS gap_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY 1
"""


_INTREP_OUT = pa.schema([("source", pa.string()),
                         ("n_seqs_repeat", pa.int64()),
                         ("n_rep_windows", pa.int64())])


def q_log_seq_internal_repeats(sf_dir: str, n: int = 8):
    """WITHIN-sequence repetition screen at 8-token-window granularity
    (the Gopher duplicate-n-gram quality signal on the token axis):
    per source, how many sequences contain at least one repeated
    window, and the total repeated-window mass (windows minus
    per-sequence distinct windows) — loops and copy-paste inside a
    payload that cross-sequence dedup can never see.

    Block-local and exchange-free: windows pack to u64 per row (ALL
    positions — no sampling; repetition is a per-row property), a
    (row, key) sort yields distinct counts per row, partials are
    |sources| x 2 integers. Exact on both sides: the SQL mirror is
    COUNT(*) - COUNT(DISTINCT key) per doc over the same capped pack.
    (Measured: bandwidth-capping this map via num_cpus made it 4-5x
    SLOWER — num_cpus on a map_batches breaks read->map fusion, so the
    raw-task _bw_task_cpus rule does NOT transfer to fused map stages;
    17 s at 4M as-is.)"""
    part_schema = pa.schema([("source", pa.string()),
                             ("n_seqs_repeat", pa.int64()),
                             ("n_rep_windows", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        m = len(vals) - n + 1
        enc = pc.dictionary_encode(t.column("source").combine_chunks())
        nsrc = len(enc.dictionary)
        reps = np.zeros(t.num_rows, np.int64)
        if m > 0:
            pos = np.arange(m, dtype=np.int64)
            r0 = np.searchsorted(off, pos, side="right") - 1
            r1 = np.searchsorted(off, pos + n - 1, side="right") - 1
            same = r0 == r1
            pos, r0 = pos[same], r0[same]
            if len(pos):
                # cap the top byte exactly like the SQL pack (the
                # documented byte-alphabet assumption)
                k = np.zeros(len(pos), np.uint64)
                for j in range(n - 1):
                    k += vals[pos + j].astype(np.uint64) << np.uint64(8 * j)
                k += (vals[pos + n - 1].astype(np.uint64)
                      % np.uint64(128)) << np.uint64(8 * (n - 1))
                o = np.lexsort((k, r0))
                rr, kk = r0[o], k[o]
                first = np.ones(len(kk), dtype=bool)
                first[1:] = (rr[1:] != rr[:-1]) | (kk[1:] != kk[:-1])
                # repeated mass per row = windows - distinct windows
                reps = (np.bincount(rr, minlength=t.num_rows)
                        - np.bincount(rr[first], minlength=t.num_rows))
        src = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "source": enc.dictionary,
            "n_seqs_repeat": pa.array(
                np.bincount(src, weights=reps > 0,
                            minlength=nsrc).astype(np.int64)),
            "n_rep_windows": pa.array(
                np.bincount(src, weights=reps,
                            minlength=nsrc).astype(np.int64)),
        })

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["tokens", "source"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = parts.group_by("source").aggregate(
        [("n_seqs_repeat", "sum"), ("n_rep_windows", "sum")])
    g = g.rename_columns(["source", "n_seqs_repeat", "n_rep_windows"])
    g = g.sort_by([("source", "ascending")])
    return pa.table({
        "source": g.column("source"),
        "n_seqs_repeat": g.column("n_seqs_repeat").cast(pa.int64()),
        "n_rep_windows": g.column("n_rep_windows").cast(pa.int64()),
    }, schema=_INTREP_OUT)


def sql_seq_internal_repeats(cache: str, n: int = 8) -> str:
    key_expr = " + ".join(
        [f"CAST(tokens[i + {j}] AS BIGINT) * {256 ** j}"
         for j in range(n - 1)]
        + [f"(CAST(tokens[i + {n - 1}] AS BIGINT) % 128) * {256 ** (n - 1)}"])
    return f"""
WITH w AS (
  SELECT doc_id, source, UNNEST(range(1, len(tokens) - {n - 2})) AS i,
         tokens
  FROM read_parquet('{cache}/shard-*.parquet') WHERE len(tokens) >= {n}
), k AS (
  SELECT doc_id, source, ({key_expr}) AS key FROM w
), d AS (
  SELECT doc_id, source,
         COUNT(*) - COUNT(DISTINCT key) AS rep FROM k
  GROUP BY doc_id, source
)
SELECT s.source,
       CAST(COALESCE(SUM(CASE WHEN d.rep > 0 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_seqs_repeat,
       CAST(COALESCE(SUM(d.rep), 0) AS BIGINT) AS n_rep_windows
FROM (SELECT DISTINCT source
      FROM read_parquet('{cache}/shard-*.parquet')) s
LEFT JOIN d USING (source)
GROUP BY s.source ORDER BY s.source
"""


_SRCSIM_OUT = pa.schema([("src_a", pa.string()), ("src_b", pa.string()),
                         ("n_match", pa.int64())])


def q_log_source_minhash_sim(sf_dir: str, n: int = 8, mod: int = 8):
    """Source-pair content similarity by MinHash signature agreement:
    each source's element set is its mod-sampled 8-token windows, the
    signature is the 8 fixed-permutation minima, and the output counts
    matching components per source pair (E[n_match]/8 ~ Jaccard) —
    the corpus-level overlap triage run before the per-sequence
    near-dup screens (leakage counts exact sequence collisions; this
    sees fuzzy content reuse between whole sources).

    Exchange-FREE: the signature is a pure min-monoid, so each block
    emits a <= |sources| x 8 partial and the driver folds minima — at
    any corpus size the state is |sources| x 8 uint64s. Same shared
    mix literals as log_seq_dedup_minhash, so the SQL mirror
    reproduces every signature component bit-for-bit (capped-top-byte
    window pack: the documented byte-alphabet assumption)."""
    part_schema = pa.schema([("source", pa.string()), ("j", pa.int64()),
                             ("mv", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        m = len(vals) - n + 1
        if m <= 0:
            return part_schema.empty_table()
        sel = np.flatnonzero(vals[:m] % mod == 0)
        r0 = np.searchsorted(off, sel, side="right") - 1
        r1 = np.searchsorted(off, sel + n - 1, side="right") - 1
        same = r0 == r1
        sel, r0 = sel[same], r0[same]
        if not len(sel):
            return part_schema.empty_table()
        k = np.zeros(len(sel), np.uint64)
        for j in range(n):
            k += vals[sel + j].astype(np.uint64) << np.uint64(8 * j)
        enc = pc.dictionary_encode(t.column("source").combine_chunks())
        src = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)[r0]
        o = np.argsort(src, kind="stable")
        src, k = src[o], k[o]
        seg = np.r_[0, np.flatnonzero(np.diff(src)) + 1]
        seg_src = src[seg]
        rows = {"source": [], "j": [], "mv": []}
        for j, (a, b) in enumerate(_MH_PERMS):
            mixed = k * np.uint64(a) + np.uint64(b)
            mins = np.minimum.reduceat(mixed, seg)
            rows["source"].append(seg_src)
            rows["j"].append(np.full(len(seg), j, np.int64))
            rows["mv"].append(mins.view(np.int64))
        return pa.table({
            "source": enc.dictionary.take(
                pa.array(np.concatenate(rows["source"]))),
            "j": pa.array(np.concatenate(rows["j"])),
            "mv": pa.array(np.concatenate(rows["mv"])),
        })

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["tokens", "source"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    df = parts.to_pandas()
    if not len(df):
        return _SRCSIM_OUT.empty_table()
    # uint64 MIN: compare unsigned, carry the int64 bit pattern
    df["u"] = df["mv"].to_numpy().view(np.uint64)
    sig = df.groupby(["source", "j"], sort=True)["u"].min().reset_index()
    srcs = sorted(sig["source"].unique())
    bysrc = {s: g.set_index("j")["u"] for s, g in sig.groupby("source")}
    out = {"src_a": [], "src_b": [], "n_match": []}
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            a, b = bysrc[sa].align(bysrc[sb], join="inner")
            nm = int((a == b).sum())
            if nm:
                out["src_a"].append(sa)
                out["src_b"].append(sb)
                out["n_match"].append(nm)
    return pa.table({
        "src_a": pa.array(out["src_a"], pa.string()),
        "src_b": pa.array(out["src_b"], pa.string()),
        "n_match": pa.array(out["n_match"], pa.int64()),
    }, schema=_SRCSIM_OUT)


def sql_source_minhash_sim(cache: str, n: int = 8, mod: int = 8) -> str:
    # same capped-top-byte pack + HUGEINT mix as sql_seq_dedup_minhash
    key_expr = " + ".join(
        [f"CAST(tokens[i + {j}] AS BIGINT) * {256 ** j}"
         for j in range(n - 1)]
        + [f"(CAST(tokens[i + {n - 1}] AS BIGINT) % 128) * {256 ** (n - 1)}"])
    perms = ", ".join(f"({j}, {a}::HUGEINT, {b}::HUGEINT)"
                      for j, (a, b) in enumerate(_MH_PERMS))
    m64 = "18446744073709551616::HUGEINT"
    return f"""
WITH w AS (
  SELECT source, UNNEST(range(1, len(tokens) - {n - 2})) AS i, tokens
  FROM read_parquet('{cache}/shard-*.parquet') WHERE len(tokens) >= {n}
), k AS (
  SELECT DISTINCT source, ({key_expr})::HUGEINT AS key
  FROM w WHERE ({key_expr}) % {mod} = 0
), mh AS (
  SELECT source, p.j, MIN((k.key * p.a + p.b) % {m64}) AS mv
  FROM k CROSS JOIN (VALUES {perms}) p(j, a, b)
  GROUP BY source, p.j
)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(COUNT(*) AS BIGINT) AS n_match
FROM mh a JOIN mh b ON a.j = b.j AND a.mv = b.mv AND a.source < b.source
GROUP BY 1, 2
"""


_NOV_OUT = pa.schema([("source", pa.string()), ("quartile", pa.int64()),
                      ("n_new", pa.int64())])


def q_log_ngram_novelty(sf_dir: str, n: int = 8, mod: int = 8):
    """Content-novelty curve per source — for each quartile of the
    source's ingestion-index range, how many DISTINCT (mod-sampled)
    8-token windows appear there for the FIRST time. The
    crawl-freshness audit a data-mixing job runs before re-ingesting a
    source: a snapshot whose late quartiles add no new n-grams is
    stale (re-crawl overlap), one that keeps minting them is fresh.
    The distinct-ngram growth curve is the high-cardinality analogue
    of Heaps' law (the raw token vocabulary is bytes — saturated by
    the first block).

    Engine shape: bounded pass-1 (min,max) idx partials per source
    (the log_source_drift pass); pass 2 packs sampled window keys and
    reduces each block to distinct (key, source) with the block-min
    idx, routes by key hash (``num_returns=P``), and each combine task
    re-mins per (key, source), maps first-idx -> quartile via the
    broadcast ranges ON INTEGER arithmetic (q = min(3, (fi - mn) * 4
    // (mx - mn + 1)) — no float boundary crosses the gate), and
    emits <= |sources| x 4 rows. Tokens never move; the exchange
    carries distinct-per-block (key, src, idx) triples."""
    import ray

    from .datapipe import _bw_task_cpus, _lp_split, _n_parts

    P = max(2, _n_parts())
    p1 = pa.schema([("source", pa.string()), ("mn", pa.int64()),
                    ("mx", pa.int64())])

    def minmax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return p1.empty_table()
        idx = _pack_idx(t.column("doc_id"))
        g = pa.table({"source": t.column("source"),
                      "idx": pa.array(idx, pa.int64())}).group_by(
            "source").aggregate([("idx", "min"), ("idx", "max")])
        return g.rename_columns(["source", "mn", "mx"])

    parts = [b for b in _read_tokens(sf_dir, ["doc_id", "source"])
             .map_batches(minmax, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows]
    if not parts:
        return _NOV_OUT.empty_table()
    mm = pa.concat_tables(parts).group_by("source").aggregate(
        [("mn", "min"), ("mx", "max")])
    srcs = np.sort(np.asarray(mm.column("source").to_pylist()))
    mn_of = np.empty(len(srcs), np.int64)
    mx_of = np.empty(len(srcs), np.int64)
    for s, mn, mx in zip(mm.column("source").to_pylist(),
                         mm.column("mn_min").to_pylist(),
                         mm.column("mx_max").to_pylist()):
        i = int(np.searchsorted(srcs, s))
        mn_of[i], mx_of[i] = mn, mx

    def window_partial(t: pa.Table) -> list:
        empty = (np.zeros(0, np.int64),) * 3
        idx = _pack_idx(t.column("doc_id"))
        vals, off = _token_lists(t.column("tokens"))
        m = len(vals) - n + 1
        if m <= 0:
            return [empty] * P
        sel = np.flatnonzero(vals[:m] % mod == 0)
        r0 = np.searchsorted(off, sel, side="right") - 1
        r1 = np.searchsorted(off, sel + n - 1, side="right") - 1
        same = r0 == r1
        sel, r0 = sel[same], r0[same]
        if not len(sel):
            return [empty] * P
        k = np.zeros(len(sel), np.uint64)
        for j in range(n):
            k += vals[sel + j].astype(np.uint64) << np.uint64(8 * j)
        kk = k.view(np.int64)
        su = np.searchsorted(
            srcs, np.asarray(t.column("source").to_pylist()))[r0]
        fi = idx[r0]
        # block-local first occurrence per (key, source): sort by
        # (key, src, idx), keep the first of each (key, src) run
        o = np.lexsort((fi, su, kk))
        kk, su, fi = kk[o], su[o], fi[o]
        first = np.ones(len(kk), dtype=bool)
        first[1:] = (kk[1:] != kk[:-1]) | (su[1:] != su[:-1])
        kk, su, fi = kk[first], su[first], fi[first]
        return [tuple(s) for s in _lp_split(kk, P, kk, su, fi)]

    def combine(*shards) -> pa.Table:
        kk = np.concatenate([s[0] for s in shards])
        if not len(kk):
            return _NOV_OUT.empty_table()
        su = np.concatenate([s[1] for s in shards])
        fi = np.concatenate([s[2] for s in shards])
        o = np.lexsort((fi, su, kk))
        kk, su, fi = kk[o], su[o], fi[o]
        first = np.ones(len(kk), dtype=bool)
        first[1:] = (kk[1:] != kk[:-1]) | (su[1:] != su[:-1])
        su, fi = su[first], fi[first]
        width = np.maximum(mx_of[su] - mn_of[su] + 1, 1)
        q = np.minimum(3, (fi - mn_of[su]) * 4 // width)
        cnt = np.bincount(su * 4 + q, minlength=len(srcs) * 4)
        nz = np.flatnonzero(cnt)
        return pa.table({"source": pa.array(srcs[nz // 4]),
                         "quartile": pa.array(nz % 4, pa.int64()),
                         "n_new": pa.array(cnt[nz], pa.int64())},
                        schema=_NOV_OUT)

    ds = _read_tokens(sf_dir, ["doc_id", "tokens", "source"])
    refs = [r for b in ds.iter_internal_ref_bundles()
            for r, md in b.blocks if md.num_rows]
    if not refs:
        return _NOV_OUT.empty_table()
    wtask = ray.remote(num_cpus=_bw_task_cpus(16))(window_partial)
    sl = [wtask.options(num_returns=P).remote(r) for r in refs]
    ctask = ray.remote(combine)
    outs = ray.get([ctask.remote(*[s[p] for s in sl]) for p in range(P)])
    merged = pa.concat_tables([_NOV_OUT.empty_table()] + outs)
    g = merged.group_by(["source", "quartile"]).aggregate([("n_new", "sum")])
    g = g.sort_by([("source", "ascending"), ("quartile", "ascending")])
    return pa.table({"source": g.column("source"),
                     "quartile": g.column("quartile"),
                     "n_new": g.column("n_new_sum")}, schema=_NOV_OUT)


def sql_ngram_novelty(cache: str, n: int = 8, mod: int = 8) -> str:
    key_expr = " + ".join(
        [f"CAST(tokens[i + {j}] AS BIGINT) * {256 ** j}"
         for j in range(n - 1)]
        + [f"(CAST(tokens[i + {n - 1}] AS BIGINT) % 128) * {256 ** (n - 1)}"])
    return f"""
WITH t AS (
  SELECT source, CAST(right(doc_id, 12) AS BIGINT) AS idx, tokens
  FROM read_parquet('{cache}/shard-*.parquet')
), mm AS (
  SELECT source, MIN(idx) AS mn, MAX(idx) AS mx FROM t GROUP BY source
), w AS (
  SELECT source, idx, UNNEST(range(1, len(tokens) - {n - 2})) AS i, tokens
  FROM t WHERE len(tokens) >= {n}
), k AS (
  SELECT source, ({key_expr}) AS key, MIN(idx) AS fi
  FROM w WHERE ({key_expr}) % {mod} = 0
  GROUP BY source, key
)
SELECT k.source,
       CAST(LEAST(3, (k.fi - mm.mn) * 4 // (mm.mx - mm.mn + 1))
            AS BIGINT) AS quartile,
       CAST(COUNT(*) AS BIGINT) AS n_new
FROM k JOIN mm USING (source)
GROUP BY 1, 2
"""


_DUPSZ_OUT = pa.schema([("source", pa.string()), ("copies", pa.int64()),
                        ("n_clusters", pa.int64())])


def q_log_dup_cluster_sizes(sf_dir: str):
    """Exact-duplicate CLUSTER-SIZE histogram per source — how many
    distinct sequences occur once, twice, k times. The dedup-policy
    audit that decides between keep-first and frequency-weighted
    sampling: a corpus whose mass sits in a few huge clusters needs a
    different dedup rate than one with many pairs (log_seq_dedup only
    reports the total, not the shape).

    Same engine shape as log_seq_dedup — block-local polynomial
    sequence hash with per-block copy counts, ONE h % P exchange — but
    the partition fold emits the bounded (source, copies, n_clusters)
    histogram instead of two scalars. Sequences never move."""
    import ray

    P = max(4, int(ray.cluster_resources().get("CPU", 4)))
    part_schema = pa.schema([("source", pa.string()), ("h", pa.int64()),
                             ("cnt", pa.int64()), ("part", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        h = _seq_hash64(vals, off)
        g = pa.table({
            "source": t.column("source"),
            "h": pa.array(h.view(np.int64)),
        }).group_by(["source", "h"]).aggregate([([], "count_all")])
        hh = g.column("h").to_numpy(zero_copy_only=False)
        part = (hh.view(np.uint64) % np.uint64(P)).astype(np.int64)
        return pa.table({"source": g.column("source"), "h": g.column("h"),
                         "cnt": g.column("count_all").cast(pa.int64()),
                         "part": pa.array(part)})

    def fold_part(g: "pd.DataFrame"):
        import pandas as pd

        per_seq = (g.groupby(["source", "h"], sort=False)["cnt"].sum()
                   .reset_index())
        hist = (per_seq.groupby(["source", "cnt"], sort=False)["h"].size()
                .reset_index())
        return pd.DataFrame({"source": hist["source"],
                             "copies": hist["cnt"].astype("int64"),
                             "n_clusters": hist["h"].astype("int64")})

    parts = (_read_tokens(sf_dir, ["tokens", "source"])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("part").map_groups(fold_part))
    df = logpipe.to_pandas_with_schema(parts, _DUPSZ_OUT)
    out = (df.groupby(["source", "copies"], sort=True)["n_clusters"].sum()
           .reset_index())
    return pa.table({
        "source": pa.array(out["source"], type=pa.string()),
        "copies": pa.array(out["copies"], type=pa.int64()),
        "n_clusters": pa.array(out["n_clusters"], type=pa.int64()),
    }, schema=_DUPSZ_OUT)


def sql_dup_cluster_sizes(cache: str) -> str:
    return f"""
WITH c AS (
  SELECT source, tokens, CAST(COUNT(*) AS BIGINT) AS copies
  FROM read_parquet('{cache}/shard-*.parquet') GROUP BY source, tokens
)
SELECT source, copies, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM c GROUP BY source, copies
"""


_POSB_OUT = pa.schema([("source", pa.string()), ("pos_bucket", pa.int64()),
                       ("n_tokens", pa.int64()), ("sum_tok", pa.int64()),
                       ("n_distinct", pa.int64())])


def q_log_token_positional_stats(sf_dir: str, width: int = 64):
    """Token distribution BY POSITION bucket (pos // width) per source
    — the boilerplate detector a packing job runs before deciding what
    to truncate: positions dominated by a few token values (low
    n_distinct, skewed sum) are headers/templates, late buckets show
    where content diverges. All-integer outputs (count, sum, distinct
    over the byte vocabulary).

    Bounded partials: |sources| x n_buckets x 256 bincount per block
    (a few MB), folded exactly on the driver — the token payload never
    leaves the read tasks."""
    part_schema = pa.schema([("source", pa.string()), ("pb", pa.int64()),
                             ("token", pa.int64()), ("cnt", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        if not len(vals):
            return part_schema.empty_table()
        nt = np.diff(off)
        pos = (np.arange(len(vals), dtype=np.int64)
               - np.repeat(off[:-1], nt))
        pb = pos // width
        enc = pc.dictionary_encode(t.column("source").combine_chunks())
        row_src = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tok_src = np.repeat(row_src, nt)
        nb = int(pb.max()) + 1
        nsrc = len(enc.dictionary)
        key = (tok_src * nb + pb) * 256 + vals
        cnt = np.bincount(key, minlength=nsrc * nb * 256)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "source": enc.dictionary.take(pa.array(nz // (nb * 256))),
            "pb": pa.array((nz // 256) % nb, pa.int64()),
            "token": pa.array(nz % 256, pa.int64()),
            "cnt": pa.array(cnt[nz], pa.int64()),
        }, schema=part_schema)

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["tokens", "source"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = parts.group_by(["source", "pb", "token"]).aggregate([("cnt", "sum")])
    if g.num_rows == 0:
        return _POSB_OUT.empty_table()
    import pandas as pd

    df = pd.DataFrame({
        "source": g.column("source").to_numpy(zero_copy_only=False),
        "pb": g.column("pb").to_numpy(zero_copy_only=False),
        "token": g.column("token").to_numpy(zero_copy_only=False),
        "cnt": g.column("cnt_sum").to_numpy(zero_copy_only=False),
    })
    agg = (df.assign(st=df["token"] * df["cnt"])
           .groupby(["source", "pb"], sort=True)
           .agg(n_tokens=("cnt", "sum"), sum_tok=("st", "sum"),
                n_distinct=("token", "size")).reset_index())
    return pa.table({
        "source": pa.array(agg["source"], type=pa.string()),
        "pos_bucket": pa.array(agg["pb"], type=pa.int64()),
        "n_tokens": pa.array(agg["n_tokens"], type=pa.int64()),
        "sum_tok": pa.array(agg["sum_tok"], type=pa.int64()),
        "n_distinct": pa.array(agg["n_distinct"], type=pa.int64()),
    }, schema=_POSB_OUT)


def sql_token_positional_stats(cache: str, width: int = 64) -> str:
    return f"""
WITH w AS (
  SELECT source, UNNEST(range(1, len(tokens) + 1)) AS i, tokens
  FROM read_parquet('{cache}/shard-*.parquet')
), tok AS (
  SELECT source, CAST((i - 1) // {width} AS BIGINT) AS pos_bucket,
         CAST(tokens[i] AS BIGINT) AS t
  FROM w
)
SELECT source, pos_bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(t) AS BIGINT) AS sum_tok,
       CAST(COUNT(DISTINCT t) AS BIGINT) AS n_distinct
FROM tok GROUP BY source, pos_bucket
"""


_BURST_OUT = pa.schema([("token", pa.int64()), ("n_occ", pa.int64()),
                        ("sum_sq", pa.int64()), ("n_seqs", pa.int64())])


def q_log_token_burstiness(sf_dir: str):
    """Per-token burstiness sufficient statistics: total occurrences,
    sum of squared per-sequence counts, and the number of sequences
    containing the token (Church-Gale dispersion — a token whose
    sum_sq is large relative to n_occ**2/N clumps into few sequences:
    template/boilerplate bytes; a uniform token spreads thin). The
    variance-to-mean ratio derives exactly from these integers, so the
    op ships the sufficient stats and no float ever crosses the gate.

    Exchange-free: per-(row, token) counts via the same sorted-key
    segmented pass as the dominant-ratio screen, squared and bincounted
    into a <=256-row partial per block; the driver folds KBs."""
    part_schema = pa.schema([("token", pa.int64()), ("n_occ", pa.int64()),
                             ("sum_sq", pa.int64()), ("n_seqs", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        if not len(vals):
            return part_schema.empty_table()
        nt = np.diff(off)
        row_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), nt)
        key = row_of * 256 + vals.astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        tok = (uk & 255).astype(np.int64)
        n_occ = np.bincount(tok, weights=cnt, minlength=256)
        sum_sq = np.bincount(tok, weights=cnt * cnt, minlength=256)
        n_seqs = np.bincount(tok, minlength=256)
        nz = np.flatnonzero(n_seqs)
        return pa.table({
            "token": pa.array(nz, pa.int64()),
            "n_occ": pa.array(n_occ[nz].astype(np.int64)),
            "sum_sq": pa.array(sum_sq[nz].astype(np.int64)),
            "n_seqs": pa.array(n_seqs[nz].astype(np.int64)),
        })

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["tokens"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = parts.group_by("token").aggregate(
        [("n_occ", "sum"), ("sum_sq", "sum"), ("n_seqs", "sum")])
    g = g.rename_columns(["token", "n_occ", "sum_sq", "n_seqs"])
    g = g.sort_by([("token", "ascending")])
    return pa.table({"token": g.column("token"),
                     "n_occ": g.column("n_occ").cast(pa.int64()),
                     "sum_sq": g.column("sum_sq").cast(pa.int64()),
                     "n_seqs": g.column("n_seqs").cast(pa.int64())},
                    schema=_BURST_OUT)


def sql_token_burstiness(cache: str) -> str:
    return f"""
WITH u AS (
  SELECT doc_id, CAST(tok AS BIGINT) AS token,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM read_parquet('{cache}/shard-*.parquet') t, UNNEST(t.tokens) AS u(tok)
  GROUP BY doc_id, tok
)
SELECT token, CAST(SUM(c) AS BIGINT) AS n_occ,
       CAST(SUM(c * c) AS BIGINT) AS sum_sq,
       CAST(COUNT(*) AS BIGINT) AS n_seqs
FROM u GROUP BY token ORDER BY token
"""


_LENP_OUT = pa.schema([("source", pa.string()), ("p50", pa.int64()),
                       ("p90", pa.int64()), ("p99", pa.int64())])


def q_log_seq_len_percentiles(sf_dir: str):
    """Exact per-source sequence-length percentiles (p50/p90/p99 of
    n_tok) — the numbers a packing job reads before choosing seq_len
    (len_buckets shows the shape; this gives the order statistics).

    Lengths are bounded, so each block emits a (source, n_tok, count)
    partial and the driver folds a tiny histogram per source — exact
    order statistics WITHOUT a sort or sample pass (a Dataset.sort
    would shuffle the corpus to rank what a bincount already ranks).
    Rank convention pinned to SQL PERCENTILE_DISC empirically: the
    smallest value whose cumulative count r satisfies 100*r >= p*n —
    integer arithmetic on both sides, no float rank ever computed."""
    part_schema = pa.schema([("source", pa.string()), ("n_tok", pa.int64()),
                             ("cnt", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        g = pa.table({
            "source": t.column("source"),
            "n_tok": t.column("n_tok").cast(pa.int64()),
        }).group_by(["source", "n_tok"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "n_tok", "cnt"])

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["source", "n_tok"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = parts.group_by(["source", "n_tok"]).aggregate([("cnt", "sum")])
    df = g.rename_columns(["source", "n_tok", "cnt"]).to_pandas()
    rows = []
    for src, grp in df.groupby("source", sort=True):
        grp = grp.sort_values("n_tok")
        lens = grp["n_tok"].to_numpy()
        cum = grp["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        pick = [int(lens[np.searchsorted(cum * 100, p * n)])
                for p in (50, 90, 99)]
        rows.append((src, *pick))
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "p50": pa.array([r[1] for r in rows], pa.int64()),
        "p90": pa.array([r[2] for r in rows], pa.int64()),
        "p99": pa.array([r[3] for r in rows], pa.int64()),
    }, schema=_LENP_OUT)


def sql_seq_len_percentiles(cache: str) -> str:
    return f"""
SELECT source,
  CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY n_tok) AS BIGINT) AS p50,
  CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY n_tok) AS BIGINT) AS p90,
  CAST(PERCENTILE_DISC(0.99) WITHIN GROUP (ORDER BY n_tok) AS BIGINT) AS p99
FROM read_parquet('{cache}/shard-*.parquet')
GROUP BY source ORDER BY source
"""


_RUN_OUT = pa.schema([("run_len", pa.int64()), ("n_runs", pa.int64())])


def q_log_token_run_lengths(sf_dir: str):
    """Histogram of maximal same-token run lengths across the corpus —
    the RLE-compressibility / stuck-byte signal at sub-sequence
    granularity (the per-sequence dominant-ratio screen can miss a
    long run buried in an otherwise-diverse payload; this can't). Runs
    never cross sequence boundaries.

    Exchange-free: run starts are one vectorized comparison per block
    (value change OR row start), lengths diff out of the start
    indices, and each block emits a <=max-n_tok-row bincount partial;
    the driver folds KBs. Exact integers end-to-end."""
    part_schema = pa.schema([("run_len", pa.int64()), ("n_runs", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        n = len(vals)
        if not n:
            return part_schema.empty_table()
        start = np.zeros(n, dtype=bool)
        starts = off[:-1][np.diff(off) > 0]  # first token of nonempty rows
        start[starts] = True
        start[1:] |= vals[1:] != vals[:-1]
        si = np.flatnonzero(start)
        lens = np.diff(np.r_[si, n])
        cnt = np.bincount(lens)
        nz = np.flatnonzero(cnt)
        return pa.table({"run_len": pa.array(nz.astype(np.int64)),
                         "n_runs": pa.array(cnt[nz].astype(np.int64))})

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["tokens"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = parts.group_by("run_len").aggregate([("n_runs", "sum")])
    g = g.rename_columns(["run_len", "n_runs"])
    g = g.sort_by([("run_len", "ascending")])
    return pa.table({"run_len": g.column("run_len"),
                     "n_runs": g.column("n_runs").cast(pa.int64())},
                    schema=_RUN_OUT)


def sql_token_run_lengths(cache: str) -> str:
    # pos gives the window a TOTAL order within each doc (the
    # log_sessionize rule: never two window clauses over an ambiguous
    # sort), and doc_id partitioning keeps runs inside sequences
    return f"""
WITH p AS (
  SELECT doc_id, unnest(tokens) AS tok,
         generate_subscripts(tokens, 1) AS pos
  FROM read_parquet('{cache}/shard-*.parquet')
), i AS (
  SELECT doc_id, pos,
         CASE WHEN LAG(tok) OVER (PARTITION BY doc_id ORDER BY pos)
                   IS DISTINCT FROM tok THEN 1 ELSE 0 END AS brk
  FROM p
), r AS (
  SELECT doc_id, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM i
), l AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS run_len
  FROM r GROUP BY doc_id, run_id
)
SELECT run_len, CAST(COUNT(*) AS BIGINT) AS n_runs
FROM l GROUP BY run_len ORDER BY run_len
"""


_DOM_OUT = pa.schema([("source", pa.string()), ("decile", pa.int64()),
                      ("n_seqs", pa.int64())])


def q_log_seq_dominant_ratio(sf_dir: str):
    """Per-SEQUENCE stuck-payload screen: for every sequence, the
    dominant-token ratio (count of its most frequent token / n_tok),
    histogrammed in ppm deciles per source. A source whose mass sits in
    high deciles emits near-constant payloads (the per-sequence twin of
    the per-source entropy screen — a source can look healthy on
    average while individual sensors are stuck).

    Block-local and exchange-free: per-row dominant counts come from a
    sorted-key segmented max (rows never span blocks), each block emits
    a <= |sources| x 11 histogram partial, the driver folds a few KB.
    Ratio rides an exact INTEGER ppm floor — count quotients are never
    ROUND-6 safe (the doc_quality_linear rule)."""
    part_schema = pa.schema([("source", pa.string()), ("decile", pa.int64()),
                             ("n_seqs", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        if not len(vals):
            return part_schema.empty_table()
        nt = np.diff(off)
        row_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), nt)
        key = row_of * 256 + vals.astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        rows_u = uk >> 8
        bnd = np.flatnonzero(np.r_[True, rows_u[1:] != rows_u[:-1]])
        mx = np.maximum.reduceat(cnt, bnd)
        rid = rows_u[bnd]  # rows with nt == 0 never appear
        dec = mx * 1_000_000 // nt[rid] // 100_000
        enc = pc.dictionary_encode(t.column("source").combine_chunks())
        src = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)[rid]
        nsrc = len(enc.dictionary)
        h = np.bincount(src * 11 + dec, minlength=nsrc * 11)
        nz = np.flatnonzero(h)
        return pa.table({
            "source": enc.dictionary.take(pa.array(nz // 11)),
            "decile": pa.array(nz % 11, pa.int64()),
            "n_seqs": pa.array(h[nz].astype(np.int64)),
        })

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(_read_tokens(sf_dir, ["tokens", "source"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = parts.group_by(["source", "decile"]).aggregate([("n_seqs", "sum")])
    g = g.rename_columns(["source", "decile", "n_seqs"])
    g = g.sort_by([("source", "ascending"), ("decile", "ascending")])
    return pa.table({"source": g.column("source"),
                     "decile": g.column("decile"),
                     "n_seqs": g.column("n_seqs").cast(pa.int64())},
                    schema=_DOM_OUT)


def sql_seq_dominant_ratio(cache: str) -> str:
    # decile 10 = exactly-constant payloads (ppm == 1,000,000): kept
    # unclamped on both sides so the constant bucket stays separable
    return f"""
WITH u AS (
  SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
         CAST(tok AS BIGINT) AS tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM read_parquet('{cache}/shard-*.parquet') t, UNNEST(t.tokens) AS u(tok)
  GROUP BY doc_id, source, n_tok, tok
), m AS (
  SELECT doc_id, source, MAX(c) * 1000000 // n_tok // 100000 AS decile
  FROM u GROUP BY doc_id, source, n_tok
)
SELECT source, CAST(decile AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_seqs
FROM m GROUP BY source, decile ORDER BY source, decile
"""


_LEAK_OUT = pa.schema([("src_a", pa.string()), ("src_b", pa.string()),
                       ("n_shared", pa.int64())])


def q_log_cross_source_leakage(sf_dir: str):
    """Cross-SOURCE sequence leakage matrix — for every source pair,
    how many distinct token sequences occur in BOTH (the contamination
    audit run before treating sources as independent train/eval
    slices; per-source dedup cannot see these by construction).

    Same exchange as log_seq_dedup — block-distinct (source, h)
    presence pairs, ONE h % P exchange — but the partition fold
    self-joins the presence rows on h (fan-out bounded by |sources|
    per hash) and emits per-pair counts; the driver sums
    P x |sources|^2 tiny rows. Sequences never move."""
    import ray

    P = max(4, int(ray.cluster_resources().get("CPU", 4)))
    part_schema = pa.schema([("source", pa.string()), ("h", pa.int64()),
                             ("part", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vals, off = _token_lists(t.column("tokens"))
        h = _seq_hash64(vals, off)
        g = pa.table({
            "source": t.column("source"),
            "h": pa.array(h.view(np.int64)),
        }).group_by(["source", "h"]).aggregate([])
        hh = g.column("h").to_numpy(zero_copy_only=False)
        part = (hh.view(np.uint64) % np.uint64(P)).astype(np.int64)
        return pa.table({"source": g.column("source"), "h": g.column("h"),
                         "part": pa.array(part)})

    def fold_part(g: "pd.DataFrame"):
        import pandas as pd

        d = g.drop_duplicates(["source", "h"])
        m = d.merge(d, on="h")
        m = m[m["source_x"] < m["source_y"]]
        out = (m.groupby(["source_x", "source_y"], sort=False)
               .size().reset_index(name="n"))
        return pd.DataFrame({"src_a": out["source_x"],
                             "src_b": out["source_y"],
                             "n_shared": out["n"].astype("int64")})

    parts = (_read_tokens(sf_dir, ["tokens", "source"])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("part").map_groups(fold_part))
    df = logpipe.to_pandas_with_schema(parts, _LEAK_OUT)
    out = (df.groupby(["src_a", "src_b"], sort=True)["n_shared"].sum()
           .reset_index())
    return pa.table({
        "src_a": pa.array(out["src_a"], type=pa.string()),
        "src_b": pa.array(out["src_b"], type=pa.string()),
        "n_shared": pa.array(out["n_shared"], type=pa.int64()),
    }, schema=_LEAK_OUT)


def sql_cross_source_leakage(cache: str) -> str:
    return f"""
WITH d AS (
  SELECT DISTINCT source, tokens
  FROM read_parquet('{cache}/shard-*.parquet')
)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM d a JOIN d b ON a.tokens = b.tokens AND a.source < b.source
GROUP BY 1, 2
"""


_PACK_SCHEMA = pa.schema([
    ("doc_id", pa.string()), ("seq_id", pa.int64()),
    ("n_frag_tokens", pa.int64()), ("frag_sum", pa.int64()),
    ("first_tok", pa.int64()), ("last_tok", pa.int64()),
])


def _pack_idx(col) -> np.ndarray:
    """Ingestion index: the numeric 12-digit suffix of doc_id."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pc.cast(pc.utf8_slice_codeunits(arr, -12),
                   pa.int64()).to_numpy(zero_copy_only=False)


def _pack_chunk_sums(block: pa.Table) -> pa.Table:
    """Bounded pass-1 partial: per-chunk token sums for one block."""
    ck = block.column("chunk").to_numpy(zero_copy_only=False)
    nt = pc.list_value_length(block.column("tokens")).to_numpy(
        zero_copy_only=False).astype(np.int64)
    uk, inv = np.unique(ck, return_inverse=True)
    sums = np.bincount(inv, weights=nt).astype(np.int64)
    return pa.table({"chunk": pa.array(uk, pa.int64()),
                     "tok_sum": pa.array(sums, pa.int64())})


def _pack_combine(base, seq_len: int, *shards) -> pa.Table:
    """One hash partition of the packing exchange: exact global offsets
    from the broadcast chunk bases, then vectorized fragment slicing
    over the partition's flat token values (cumsum checksums)."""
    cids, cbases = base
    tabs = [s for s in shards if s.num_rows]
    if not tabs:
        return _PACK_SCHEMA.empty_table()
    g = pa.concat_tables(tabs).combine_chunks()
    idx_np = g.column("idx").to_numpy(zero_copy_only=False)
    o = np.argsort(idx_np, kind="stable")
    g = g.take(pa.array(o))
    ids = idx_np[o]
    docids = g.column("doc_id")
    if isinstance(docids, pa.ChunkedArray):
        docids = docids.combine_chunks()
    toks = g.column("tokens")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    toffs0 = toks.offsets.to_numpy().astype(np.int64)
    start = int(toffs0[0])
    vals = toks.values.slice(start, int(toffs0[-1]) - start).to_numpy(
        zero_copy_only=False).astype(np.int64)
    toffs = toffs0 - start
    nt = np.diff(toffs)
    ck = g.column("chunk").to_numpy(zero_copy_only=False)
    csum = np.cumsum(nt) - nt
    new = np.ones(len(ids), dtype=bool)
    new[1:] = ck[1:] != ck[:-1]
    first = np.maximum.accumulate(np.where(new, np.arange(len(ids)), 0))
    off = csum - csum[first] + cbases[np.searchsorted(cids, ck)]
    return _pack_fragments(docids, vals, toffs, off, seq_len)


def _pack_fragments(docids, vals: np.ndarray, toffs: np.ndarray,
                    off: np.ndarray, seq_len: int,
                    sources=None) -> pa.Table:
    """Vectorized fragment slicing given exact global offsets: per-doc
    sequence spans, flat-value cumsum checksums. Shared by the query's
    exchange combine, the by-source variant (``sources`` adds the
    stream-key column) and the CLI pack profile."""
    nt = np.diff(toffs)
    nz = nt > 0  # zero-token rows consume no stream positions
    seq_first = off[nz] // seq_len
    seq_last = (off[nz] + nt[nz] - 1) // seq_len
    k = seq_last - seq_first + 1
    doc_of = np.repeat(np.flatnonzero(nz), k)
    fno = (np.arange(int(k.sum()), dtype=np.int64)
           - np.repeat(np.cumsum(k) - k, k))
    seq_id = np.repeat(seq_first, k) + fno
    fs = np.maximum(seq_id * seq_len, off[doc_of])
    fe = np.minimum((seq_id + 1) * seq_len, off[doc_of] + nt[doc_of])
    starts_flat = toffs[:-1][doc_of] + (fs - off[doc_of])
    ends_flat = starts_flat + (fe - fs)
    C = np.zeros(len(vals) + 1, dtype=np.int64)
    np.cumsum(vals, out=C[1:])
    cols = {
        "doc_id": docids.take(pa.array(doc_of)),
        "seq_id": pa.array(seq_id),
        "n_frag_tokens": pa.array(fe - fs),
        "frag_sum": pa.array(C[ends_flat] - C[starts_flat]),
        "first_tok": pa.array(vals[starts_flat] if len(starts_flat)
                              else np.empty(0, np.int64)),
        "last_tok": pa.array(vals[ends_flat - 1] if len(ends_flat)
                             else np.empty(0, np.int64)),
    }
    if sources is not None:
        return pa.table({"source": sources.take(pa.array(doc_of)), **cols},
                        schema=_PACK_SRC_SCHEMA)
    return pa.table(cols, schema=_PACK_SCHEMA)


_PACK_SRC_SCHEMA = pa.schema([
    ("source", pa.string()), ("doc_id", pa.string()),
    ("seq_id", pa.int64()), ("n_frag_tokens", pa.int64()),
    ("frag_sum", pa.int64()),
    ("first_tok", pa.int64()), ("last_tok", pa.int64()),
])


def _pack_src_chunk_sums(block: pa.Table) -> pa.Table:
    """Per-(source, chunk) token sums for one block (bounded pass 1 of
    the by-source packing)."""
    nt = pc.list_value_length(block.column("tokens"))
    g = pa.table({
        "source": block.column("source"),
        "chunk": block.column("chunk"),
        "nt": nt.cast(pa.int64()),
    }).group_by(["source", "chunk"]).aggregate([("nt", "sum")])
    return g.rename_columns(["source", "chunk", "tok_sum"])


def _pack_src_combine(base, seq_len: int, *shards) -> pa.Table:
    """One hash partition of the by-source packing exchange: rows sort
    by (source, chunk, idx); per-(source, chunk) run cumsums plus the
    broadcast composite-key bases give exact PER-SOURCE stream offsets;
    fragment slicing is the shared kernel."""
    srcs_sorted, comp_keys, cbases, C = base
    tabs = [s for s in shards if s.num_rows]
    if not tabs:
        return _PACK_SRC_SCHEMA.empty_table()
    g = pa.concat_tables(tabs).combine_chunks()
    enc = pc.dictionary_encode(g.column("source").combine_chunks())
    dic = np.asarray(enc.dictionary.to_pylist())
    src_idx = np.searchsorted(srcs_sorted, dic)[
        enc.indices.to_numpy(zero_copy_only=False)]
    idx_np = g.column("idx").to_numpy(zero_copy_only=False)
    ck = g.column("chunk").to_numpy(zero_copy_only=False)
    comp = src_idx * C + ck
    o = np.lexsort((idx_np, comp))  # == (source, idx): chunk is
    g = g.take(pa.array(o))         # monotone in idx within a source
    comp = comp[o]
    docids = g.column("doc_id")
    if isinstance(docids, pa.ChunkedArray):
        docids = docids.combine_chunks()
    srcs = g.column("source")
    if isinstance(srcs, pa.ChunkedArray):
        srcs = srcs.combine_chunks()
    toks = g.column("tokens")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    toffs0 = toks.offsets.to_numpy().astype(np.int64)
    start = int(toffs0[0])
    vals = toks.values.slice(start, int(toffs0[-1]) - start).to_numpy(
        zero_copy_only=False).astype(np.int64)
    toffs = toffs0 - start
    nt = np.diff(toffs)
    csum = np.cumsum(nt) - nt
    new = np.ones(len(comp), dtype=bool)
    new[1:] = comp[1:] != comp[:-1]
    first = np.maximum.accumulate(np.where(new, np.arange(len(comp)), 0))
    off = csum - csum[first] + cbases[np.searchsorted(comp_keys, comp)]
    return _pack_fragments(docids, vals, toffs, off, seq_len,
                           sources=srcs)


def q_log_pack_tokens_by_source(sf_dir: str, seq_len: int = 512,
                                chunk_docs: int = 4096):
    """SOURCE-SEPARATED sequence packing: each source's tokens form
    their OWN stream, packed independently into fixed seq_len-token
    training rows (domain-pure sequences — the curriculum/domain-mixing
    layout, vs q_log_pack_tokens' single global stream). Same ingestion
    order within a source.

    Engine shape: the chunk exchange already co-locates every
    (source, chunk) group (group ⊆ chunk), so only pass 1 changes —
    bounded per-(source, chunk) sums, driver cumsum RESET per source,
    composite-key bases broadcast once. SQL mirror: the same window
    cumsum PARTITIONed BY source."""
    import ray

    from .datapipe import _n_parts, _table_shard

    P = max(2, _n_parts())
    empty = _PACK_SRC_SCHEMA.empty_table()

    def add_keys(t: pa.Table) -> pa.Table:
        idx = _pack_idx(t.column("doc_id"))
        return (t.select(["doc_id", "tokens", "source"])
                .append_column("idx", pa.array(idx, pa.int64()))
                .append_column("chunk",
                               pa.array(idx // chunk_docs, pa.int64())))

    ds = (_read_tokens(sf_dir, ["doc_id", "tokens", "source"])
          .map_batches(add_keys, batch_format="pyarrow"))
    refs = [r for b in ds.iter_internal_ref_bundles()
            for r, md in b.blocks if md.num_rows]
    if not refs:
        import ray.data as rd

        return rd.from_arrow(empty)
    sums_task = ray.remote(_pack_src_chunk_sums)
    merged = pa.concat_tables(
        ray.get([sums_task.remote(r) for r in refs])).group_by(
        ["source", "chunk"]).aggregate([("tok_sum", "sum")])
    df = merged.to_pandas().sort_values(["source", "chunk"])
    srcs_sorted = np.asarray(sorted(df["source"].unique()))
    C = int(df["chunk"].max()) + 1
    src_idx = np.searchsorted(srcs_sorted, df["source"].to_numpy())
    comp_keys = src_idx * C + df["chunk"].to_numpy()
    sums = df["tok_sum_sum"].to_numpy().astype(np.int64)
    run = np.cumsum(sums) - sums
    # reset the exclusive cumsum at each source boundary
    new_src = np.ones(len(df), dtype=bool)
    new_src[1:] = src_idx[1:] != src_idx[:-1]
    firsts = np.maximum.accumulate(np.where(new_src,
                                            np.arange(len(df)), 0))
    bases = run - run[firsts]
    base_ref = ray.put((srcs_sorted, comp_keys, bases, C))

    tshard = ray.remote(_table_shard)
    slices = [tshard.options(num_returns=P).remote(r, P, "chunk")
              for r in refs]
    comb = ray.remote(_pack_src_combine)
    # combine outputs stay in the object store: the packed corpus is
    # O(input) rows, so the result ships as a Dataset of per-partition
    # blocks (the customer_rfm idiom), never a driver concat
    outs = [comb.remote(base_ref, seq_len, *[s[p] for s in slices])
            for p in range(P)]
    import ray.data as rd

    return rd.from_arrow_refs(outs)


def sql_pack_tokens_by_source(cache: str, seq_len: int = 512) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, source, tokens, CAST(n_tok AS BIGINT) AS n_tok,
         CAST(right(doc_id, 12) AS BIGINT) AS idx
  FROM read_parquet('{cache}/shard-*.parquet')
), o AS (
  SELECT doc_id, source, tokens, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_offset
  FROM t
), f AS (
  SELECT doc_id, source, tokens, n_tok, tok_offset,
         unnest(generate_series(tok_offset // {seq_len},
                                (tok_offset + n_tok - 1) // {seq_len}))
           AS seq_id
  FROM o WHERE n_tok > 0
), s AS (
  SELECT doc_id, source, CAST(seq_id AS BIGINT) AS seq_id, tokens,
         GREATEST(seq_id * {seq_len}, tok_offset) - tok_offset + 1 AS a,
         LEAST((seq_id + 1) * {seq_len}, tok_offset + n_tok) - tok_offset AS b
  FROM f
)
SELECT source, doc_id, seq_id,
       CAST(b - a + 1 AS BIGINT) AS n_frag_tokens,
       CAST(list_sum(list_slice(tokens, a, b)) AS BIGINT) AS frag_sum,
       CAST(tokens[a] AS BIGINT) AS first_tok,
       CAST(tokens[b] AS BIGINT) AS last_tok
FROM s
"""


def q_log_pack_tokens(sf_dir: str, seq_len: int = 512,
                      chunk_docs: int = 4096):
    """GPT-style sequence packing over the RAW token payload: concatenate
    every row's ``tokens`` in ingestion order (the numeric suffix of
    doc_id — the synthesizer's global row index) and split the stream
    into fixed ``seq_len``-token training sequences; emit one row per
    (doc, sequence) fragment with its exact boundary + content checksums
    (count / sum / first / last token).

    Engine shape (the doc_pack_materialize semantics on the raw-task
    exchange layout): ONE file-aligned read (keys added in the same
    fused map), block refs captured via ``iter_internal_ref_bundles``;
    bounded per-chunk token sums fold on the driver into exclusive
    chunk bases broadcast once; then the ONE justified payload exchange
    runs as ``_table_shard``/combine raw tasks (Ray Data's sort-based
    groupby sizes post-shuffle blocks by bytes, capping concurrency for
    this stage — the compat/semdedup rule) with full P-way combine
    parallelism. Fragment stats are exact integers (tokens < 256,
    fragments <= seq_len), so the SQL gate is hash-exact."""
    import ray

    from .datapipe import _n_parts, _table_shard

    P = max(2, _n_parts())
    empty = _PACK_SCHEMA.empty_table()

    def add_keys(t: pa.Table) -> pa.Table:
        idx = _pack_idx(t.column("doc_id"))
        return (t.select(["doc_id", "tokens"])
                .append_column("idx", pa.array(idx, pa.int64()))
                .append_column("chunk",
                               pa.array(idx // chunk_docs, pa.int64())))

    ds = (_read_tokens(sf_dir, ["doc_id", "tokens"])
          .map_batches(add_keys, batch_format="pyarrow"))
    refs = [r for b in ds.iter_internal_ref_bundles()
            for r, md in b.blocks if md.num_rows]
    if not refs:
        import ray.data as rd

        return rd.from_arrow(empty)
    sums_task = ray.remote(_pack_chunk_sums)
    merged = pa.concat_tables(
        ray.get([sums_task.remote(r) for r in refs])).group_by(
        "chunk").aggregate([("tok_sum", "sum")])
    order = pc.sort_indices(merged.column("chunk"))
    chunk_ids = merged.column("chunk").take(order).to_numpy(
        zero_copy_only=False).astype(np.int64)
    sums = merged.column("tok_sum_sum").take(order).to_numpy(
        zero_copy_only=False).astype(np.int64)
    bases = np.cumsum(sums) - sums
    base_ref = ray.put((chunk_ids, bases))

    tshard = ray.remote(_table_shard)
    slices = [tshard.options(num_returns=P).remote(r, P, "chunk")
              for r in refs]
    comb = ray.remote(_pack_combine)
    # packed output is O(corpus): return per-partition blocks as a
    # Dataset (customer_rfm idiom), never a driver concat
    outs = [comb.remote(base_ref, seq_len, *[s[p] for s in slices])
            for p in range(P)]
    import ray.data as rd

    return rd.from_arrow_refs(outs)


def sql_pack_tokens(cache: str, seq_len: int = 512) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, tokens, CAST(n_tok AS BIGINT) AS n_tok,
         CAST(right(doc_id, 12) AS BIGINT) AS idx
  FROM read_parquet('{cache}/shard-*.parquet')
), o AS (
  SELECT doc_id, tokens, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (ORDER BY idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_offset
  FROM t
), f AS (
  SELECT doc_id, tokens, n_tok, tok_offset,
         unnest(generate_series(tok_offset // {seq_len},
                                (tok_offset + n_tok - 1) // {seq_len}))
           AS seq_id
  FROM o WHERE n_tok > 0
), s AS (
  SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id, tokens,
         GREATEST(seq_id * {seq_len}, tok_offset) - tok_offset + 1 AS a,
         LEAST((seq_id + 1) * {seq_len}, tok_offset + n_tok) - tok_offset AS b
  FROM f
)
SELECT doc_id, seq_id,
       CAST(b - a + 1 AS BIGINT) AS n_frag_tokens,
       CAST(list_sum(list_slice(tokens, a, b)) AS BIGINT) AS frag_sum,
       CAST(tokens[a] AS BIGINT) AS first_tok,
       CAST(tokens[b] AS BIGINT) AS last_tok
FROM s
"""


_MIX_PART = pa.schema([("seq", pa.int64()), ("cnt", pa.int64())])
_MIX_SCHEMA = pa.schema([("n_docs", pa.int64()), ("n_seqs", pa.int64())])


def _mix_chunk_sums(block: pa.Table) -> pa.Table:
    """Per-chunk n_tok sums for one block (the payload-free twin of
    _pack_chunk_sums — this op never reads ``tokens``)."""
    ck = block.column("chunk").to_numpy(zero_copy_only=False)
    nt = block.column("n_tok").to_numpy(
        zero_copy_only=False).astype(np.int64)
    uk, inv = np.unique(ck, return_inverse=True)
    sums = np.bincount(inv, weights=nt).astype(np.int64)
    return pa.table({"chunk": pa.array(uk, pa.int64()),
                     "tok_sum": pa.array(sums, pa.int64())})


def _mix_combine(base, seq_len: int, P2: int, *shards):
    """One chunk partition of the doc-mix exchange: exact global
    offsets from the broadcast chunk bases (the _pack_combine offset
    derivation, minus the payload), then per-doc [first_seq, last_seq]
    spans expand to (seq, touch-count) partials, returned PRE-SHARDED
    by seq hash for the per-seq fold (num_returns=P2)."""
    from .datapipe import _lp_split

    cids, cbases = base
    tabs = [s for s in shards if s.num_rows]
    if not tabs:
        outs = [_MIX_PART.empty_table()] * P2
        return outs if P2 > 1 else outs[0]
    g = pa.concat_tables(tabs).combine_chunks()
    idx = g.column("idx").to_numpy(zero_copy_only=False)
    o = np.argsort(idx, kind="stable")
    nt = g.column("n_tok").to_numpy(
        zero_copy_only=False).astype(np.int64)[o]
    ck = g.column("chunk").to_numpy(zero_copy_only=False)[o]
    csum = np.cumsum(nt) - nt
    new = np.ones(len(ck), dtype=bool)
    new[1:] = ck[1:] != ck[:-1]
    first = np.maximum.accumulate(np.where(new, np.arange(len(ck)), 0))
    off = csum - csum[first] + cbases[np.searchsorted(cids, ck)]
    nz = nt > 0
    sf = off[nz] // seq_len
    k = (off[nz] + nt[nz] - 1) // seq_len - sf + 1
    n = int(k.sum())
    seq = (np.repeat(sf, k) + np.arange(n, dtype=np.int64)
           - np.repeat(np.cumsum(k) - k, k))
    us, cnts = np.unique(seq, return_counts=True)
    outs = [pa.table({"seq": pa.array(s, pa.int64()),
                      "cnt": pa.array(c.astype(np.int64))})
            for s, c in _lp_split(us, P2, us, cnts)]
    return outs if P2 > 1 else outs[0]


def _mix_fold(*parts) -> pa.Table:
    """Per-seq totals for one seq partition, folded straight into the
    bounded (n_docs, n_seqs) histogram (n_docs <= seq_len + 1)."""
    tabs = [p for p in parts if p.num_rows]
    if not tabs:
        return _MIX_SCHEMA.empty_table()
    t = pa.concat_tables(tabs)
    seq = t.column("seq").to_numpy(zero_copy_only=False)
    cnt = t.column("cnt").to_numpy(zero_copy_only=False)
    _, inv = np.unique(seq, return_inverse=True)
    tot = np.bincount(inv, weights=cnt).astype(np.int64)
    d, nsq = np.unique(tot, return_counts=True)
    return pa.table({"n_docs": pa.array(d, pa.int64()),
                     "n_seqs": pa.array(nsq.astype(np.int64))})


_PUR_PART = pa.schema([("seq", pa.int64()), ("srch", pa.int64())])
_PUR_SCHEMA = pa.schema([("n_sources", pa.int64()), ("n_seqs", pa.int64())])


def _src_hash64(col) -> np.ndarray:
    """64-bit FNV-1a of each source string (identity only — distinct
    counting needs equality, never order; collisions among a bounded
    source set are measure-zero and deterministic)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    enc = pc.dictionary_encode(arr)
    uniq = enc.dictionary.to_pylist()
    h = np.empty(len(uniq), dtype=np.uint64)
    for i, s in enumerate(uniq):
        acc = np.uint64(0xCBF29CE484222325)
        for by in s.encode():
            acc = np.uint64((int(acc) ^ by) *
                            0x100000001B3 % (1 << 64))
        h[i] = acc
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return h[idx].view(np.int64)


def _purity_combine(base, seq_len: int, P2: int, *shards):
    """One chunk partition of the source-purity exchange: the doc-mix
    offset derivation, then distinct (seq, source-hash) presence pairs
    pre-sharded by seq hash (num_returns=P2). Pairs from docs of the
    SAME source in the same seq dedup here; cross-partition repeats of
    a pair dedup again in the fold."""
    from .datapipe import _lp_split

    cids, cbases = base
    tabs = [s for s in shards if s.num_rows]
    if not tabs:
        outs = [_PUR_PART.empty_table()] * P2
        return outs if P2 > 1 else outs[0]
    g = pa.concat_tables(tabs).combine_chunks()
    idx = g.column("idx").to_numpy(zero_copy_only=False)
    o = np.argsort(idx, kind="stable")
    nt = g.column("n_tok").to_numpy(
        zero_copy_only=False).astype(np.int64)[o]
    ck = g.column("chunk").to_numpy(zero_copy_only=False)[o]
    srch = _src_hash64(g.column("source"))[o]
    csum = np.cumsum(nt) - nt
    new = np.ones(len(ck), dtype=bool)
    new[1:] = ck[1:] != ck[:-1]
    first = np.maximum.accumulate(np.where(new, np.arange(len(ck)), 0))
    off = csum - csum[first] + cbases[np.searchsorted(cids, ck)]
    nz = nt > 0
    sf = off[nz] // seq_len
    k = (off[nz] + nt[nz] - 1) // seq_len - sf + 1
    n = int(k.sum())
    seq = (np.repeat(sf, k) + np.arange(n, dtype=np.int64)
           - np.repeat(np.cumsum(k) - k, k))
    sh = np.repeat(srch[nz], k)
    o2 = np.lexsort((sh, seq))
    seq, sh = seq[o2], sh[o2]
    keep = np.ones(len(seq), dtype=bool)
    keep[1:] = (seq[1:] != seq[:-1]) | (sh[1:] != sh[:-1])
    seq, sh = seq[keep], sh[keep]
    outs = [pa.table({"seq": pa.array(s, pa.int64()),
                      "srch": pa.array(c, pa.int64())})
            for s, c in _lp_split(seq, P2, seq, sh)]
    return outs if P2 > 1 else outs[0]


def _purity_fold(*parts) -> pa.Table:
    """Distinct sources per seq for one seq partition, folded into the
    bounded (n_sources, n_seqs) histogram."""
    tabs = [p for p in parts if p.num_rows]
    if not tabs:
        return _PUR_SCHEMA.empty_table()
    t = pa.concat_tables(tabs)
    seq = t.column("seq").to_numpy(zero_copy_only=False)
    sh = t.column("srch").to_numpy(zero_copy_only=False)
    o = np.lexsort((sh, seq))
    seq, sh = seq[o], sh[o]
    keep = np.ones(len(seq), dtype=bool)
    keep[1:] = (seq[1:] != seq[:-1]) | (sh[1:] != sh[:-1])
    seq = seq[keep]
    _, ns = np.unique(seq, return_counts=True)
    d, nsq = np.unique(ns, return_counts=True)
    return pa.table({"n_sources": pa.array(d.astype(np.int64)),
                     "n_seqs": pa.array(nsq.astype(np.int64))})


def q_log_pack_source_purity(sf_dir: str, seq_len: int = 512,
                             chunk_docs: int = 4096):
    """Domain purity of the packed layout: how many distinct SOURCES
    each fixed-length training sequence mixes (the domain-mixing twin
    of log_pack_doc_mix — log_pack_tokens_by_source exists precisely
    to drive this histogram to all-1s; this op measures how impure the
    global layout actually is).

    Same payload-free two-wave exchange as doc_mix, with the source
    hash riding along: wave 1 derives exact offsets per chunk
    partition and emits DISTINCT (seq, source) presence pairs
    pre-sharded by seq hash; wave 2 re-dedups cross-partition repeats
    and folds bounded histograms. Exact integers end-to-end."""
    import ray

    from .datapipe import _n_parts, _table_shard

    P = max(2, _n_parts())
    empty = _PUR_SCHEMA.empty_table()

    def add_keys(t: pa.Table) -> pa.Table:
        idx = _pack_idx(t.column("doc_id"))
        return (t.select(["n_tok", "source"])
                .append_column("idx", pa.array(idx, pa.int64()))
                .append_column("chunk",
                               pa.array(idx // chunk_docs, pa.int64())))

    ds = (_read_tokens(sf_dir, ["doc_id", "n_tok", "source"])
          .map_batches(add_keys, batch_format="pyarrow"))
    refs = [r for b in ds.iter_internal_ref_bundles()
            for r, md in b.blocks if md.num_rows]
    if not refs:
        return empty
    sums_task = ray.remote(_mix_chunk_sums)
    merged = pa.concat_tables(
        ray.get([sums_task.remote(r) for r in refs])).group_by(
        "chunk").aggregate([("tok_sum", "sum")])
    order = pc.sort_indices(merged.column("chunk"))
    chunk_ids = merged.column("chunk").take(order).to_numpy(
        zero_copy_only=False).astype(np.int64)
    sums = merged.column("tok_sum_sum").take(order).to_numpy(
        zero_copy_only=False).astype(np.int64)
    bases = np.cumsum(sums) - sums
    base_ref = ray.put((chunk_ids, bases))

    tshard = ray.remote(_table_shard)
    slices = [tshard.options(num_returns=P).remote(r, P, "chunk")
              for r in refs]
    comb = ray.remote(_purity_combine)
    mids = [comb.options(num_returns=P).remote(
        base_ref, seq_len, P, *[s[p] for s in slices])
        for p in range(P)]
    if P == 1:
        mids = [[m] for m in mids]
    fold = ray.remote(_purity_fold)
    hists = ray.get([fold.remote(*[m[q] for m in mids])
                     for q in range(P)])
    t = pa.concat_tables([empty] + list(hists)).group_by(
        "n_sources").aggregate([("n_seqs", "sum")])
    t = t.rename_columns(["n_sources", "n_seqs"])
    t = t.sort_by([("n_sources", "ascending")])
    return pa.table({"n_sources": t.column("n_sources"),
                     "n_seqs": t.column("n_seqs").cast(pa.int64())})


def sql_pack_source_purity(cache: str, seq_len: int = 512) -> str:
    return f"""
WITH t AS (
  SELECT source, CAST(n_tok AS BIGINT) AS n_tok,
         CAST(right(doc_id, 12) AS BIGINT) AS idx
  FROM read_parquet('{cache}/shard-*.parquet')
), o AS (
  SELECT source, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (ORDER BY idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_offset
  FROM t
), f AS (
  SELECT source,
         unnest(generate_series(tok_offset // {seq_len},
                                (tok_offset + n_tok - 1) // {seq_len}))
           AS seq_id
  FROM o WHERE n_tok > 0
), d AS (
  SELECT seq_id, COUNT(DISTINCT source) AS n_sources FROM f GROUP BY seq_id
)
SELECT CAST(n_sources AS BIGINT) AS n_sources,
       CAST(COUNT(*) AS BIGINT) AS n_seqs
FROM d GROUP BY n_sources ORDER BY n_sources
"""


def q_log_pack_doc_mix(sf_dir: str, seq_len: int = 512,
                       chunk_docs: int = 4096):
    """Packing fragmentation histogram: how many DOCUMENTS each packed
    training sequence mixes (the cross-doc attention-contamination
    diagnostic for the log_pack_tokens layout — a seq_len too large for
    the doc-length distribution shows up as a heavy n_docs tail).

    Payload-free: the sequence grid depends only on (idx, n_tok), so
    the read prunes to two tiny columns and the exchange ships 24-byte
    rows — same two raw-task waves as the pack op (chunks partition
    wave 1; per-seq touch counts return pre-sharded by seq hash so the
    per-seq fold meets its rows inside wave 2), driver folds P bounded
    histograms. Every stream position belongs to a doc, so every seq
    appears in some partial — no missing-seq correction. Exact
    integers end-to-end."""
    import ray

    from .datapipe import _n_parts, _table_shard

    P = max(2, _n_parts())
    empty = _MIX_SCHEMA.empty_table()

    def add_keys(t: pa.Table) -> pa.Table:
        idx = _pack_idx(t.column("doc_id"))
        return (t.select(["n_tok"])
                .append_column("idx", pa.array(idx, pa.int64()))
                .append_column("chunk",
                               pa.array(idx // chunk_docs, pa.int64())))

    ds = (_read_tokens(sf_dir, ["doc_id", "n_tok"])
          .map_batches(add_keys, batch_format="pyarrow"))
    refs = [r for b in ds.iter_internal_ref_bundles()
            for r, md in b.blocks if md.num_rows]
    if not refs:
        return empty
    sums_task = ray.remote(_mix_chunk_sums)
    merged = pa.concat_tables(
        ray.get([sums_task.remote(r) for r in refs])).group_by(
        "chunk").aggregate([("tok_sum", "sum")])
    order = pc.sort_indices(merged.column("chunk"))
    chunk_ids = merged.column("chunk").take(order).to_numpy(
        zero_copy_only=False).astype(np.int64)
    sums = merged.column("tok_sum_sum").take(order).to_numpy(
        zero_copy_only=False).astype(np.int64)
    bases = np.cumsum(sums) - sums
    base_ref = ray.put((chunk_ids, bases))

    tshard = ray.remote(_table_shard)
    slices = [tshard.options(num_returns=P).remote(r, P, "chunk")
              for r in refs]
    comb = ray.remote(_mix_combine)
    mids = [comb.options(num_returns=P).remote(
        base_ref, seq_len, P, *[s[p] for s in slices])
        for p in range(P)]
    if P == 1:
        mids = [[m] for m in mids]
    fold = ray.remote(_mix_fold)
    hists = ray.get([fold.remote(*[m[q] for m in mids])
                     for q in range(P)])
    t = pa.concat_tables([empty] + list(hists)).group_by(
        "n_docs").aggregate([("n_seqs", "sum")])
    t = t.rename_columns(["n_docs", "n_seqs"])
    t = t.sort_by([("n_docs", "ascending")])
    return pa.table({"n_docs": t.column("n_docs"),
                     "n_seqs": t.column("n_seqs").cast(pa.int64())})


def sql_pack_doc_mix(cache: str, seq_len: int = 512) -> str:
    return f"""
WITH t AS (
  SELECT CAST(n_tok AS BIGINT) AS n_tok,
         CAST(right(doc_id, 12) AS BIGINT) AS idx
  FROM read_parquet('{cache}/shard-*.parquet')
), o AS (
  SELECT n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (ORDER BY idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_offset
  FROM t
), f AS (
  SELECT unnest(generate_series(tok_offset // {seq_len},
                                (tok_offset + n_tok - 1) // {seq_len}))
           AS seq_id
  FROM o WHERE n_tok > 0
), d AS (
  SELECT seq_id, COUNT(*) AS n_docs FROM f GROUP BY seq_id
)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_seqs
FROM d GROUP BY n_docs ORDER BY n_docs
"""


def _pack_sep_chunk_sums(block: pa.Table) -> pa.Table:
    """Bounded pass-1 partial for separator packing: every row occupies
    n_tok + 1 stream positions (its tokens plus one EOS)."""
    ck = block.column("chunk").to_numpy(zero_copy_only=False)
    nt = pc.list_value_length(block.column("tokens")).to_numpy(
        zero_copy_only=False).astype(np.int64) + 1
    uk, inv = np.unique(ck, return_inverse=True)
    sums = np.bincount(inv, weights=nt).astype(np.int64)
    return pa.table({"chunk": pa.array(uk, pa.int64()),
                     "tok_sum": pa.array(sums, pa.int64())})


def _pack_sep_combine(base, seq_len: int, sep: int, *shards) -> pa.Table:
    """One hash partition of the EOS-separated packing exchange: like
    _pack_combine, but each doc's span is its tokens followed by ONE
    ``sep`` token — the flat value array is re-laid with a vectorized
    scatter (value at local position p of doc d moves to p + d; the
    separator lands on each doc's last position), so zero-token docs
    still occupy one stream position and every fragment checksum
    includes the separators it covers."""
    cids, cbases = base
    tabs = [s for s in shards if s.num_rows]
    if not tabs:
        return _PACK_SCHEMA.empty_table()
    g = pa.concat_tables(tabs).combine_chunks()
    idx_np = g.column("idx").to_numpy(zero_copy_only=False)
    o = np.argsort(idx_np, kind="stable")
    g = g.take(pa.array(o))
    ids = idx_np[o]
    docids = g.column("doc_id")
    if isinstance(docids, pa.ChunkedArray):
        docids = docids.combine_chunks()
    toks = g.column("tokens")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    toffs0 = toks.offsets.to_numpy().astype(np.int64)
    start = int(toffs0[0])
    vals0 = toks.values.slice(start, int(toffs0[-1]) - start).to_numpy(
        zero_copy_only=False).astype(np.int64)
    toffs_raw = toffs0 - start
    nt0 = np.diff(toffs_raw)
    n = len(ids)
    # extended layout: doc d's values shift right by d, separator at
    # each doc's new last position
    toffs = np.empty(n + 1, dtype=np.int64)
    toffs[0] = 0
    np.cumsum(nt0 + 1, out=toffs[1:])
    vals = np.empty(len(vals0) + n, dtype=np.int64)
    if len(vals0):
        doc_of_val = np.repeat(np.arange(n), nt0)
        vals[np.arange(len(vals0)) + doc_of_val] = vals0
    vals[toffs[1:] - 1] = sep
    nt = nt0 + 1
    ck = g.column("chunk").to_numpy(zero_copy_only=False)
    csum = np.cumsum(nt) - nt
    new = np.ones(n, dtype=bool)
    new[1:] = ck[1:] != ck[:-1]
    first = np.maximum.accumulate(np.where(new, np.arange(n), 0))
    off = csum - csum[first] + cbases[np.searchsorted(cids, ck)]
    return _pack_fragments(docids, vals, toffs, off, seq_len)


def q_log_pack_tokens_sep(sf_dir: str, seq_len: int = 512,
                          chunk_docs: int = 4096, sep: int = 256):
    """EOS-SEPARATED sequence packing — the standard LLM training
    layout: each row's tokens are followed by one document-separator
    token (``sep``, outside the byte alphabet) before the stream is cut
    into fixed seq_len-token sequences, so a model can learn document
    boundaries and attention masks can be rebuilt from the separators.
    Zero-token rows still contribute their separator (a boundary
    marker). Same engine shape as q_log_pack_tokens: one file-aligned
    read, bounded (n_tok+1) chunk sums -> broadcast bases, ONE
    ``_table_shard`` payload exchange, Dataset-of-blocks return. The
    fragment checksums are exact integers including covered separators,
    so the SQL gate (list_concat(tokens, [sep]) + the same window
    cumsum) is hash-exact."""
    import ray

    from .datapipe import _n_parts, _table_shard

    P = max(2, _n_parts())
    empty = _PACK_SCHEMA.empty_table()

    def add_keys(t: pa.Table) -> pa.Table:
        idx = _pack_idx(t.column("doc_id"))
        return (t.select(["doc_id", "tokens"])
                .append_column("idx", pa.array(idx, pa.int64()))
                .append_column("chunk",
                               pa.array(idx // chunk_docs, pa.int64())))

    ds = (_read_tokens(sf_dir, ["doc_id", "tokens"])
          .map_batches(add_keys, batch_format="pyarrow"))
    refs = [r for b in ds.iter_internal_ref_bundles()
            for r, md in b.blocks if md.num_rows]
    if not refs:
        import ray.data as rd

        return rd.from_arrow(empty)
    sums_task = ray.remote(_pack_sep_chunk_sums)
    merged = pa.concat_tables(
        ray.get([sums_task.remote(r) for r in refs])).group_by(
        "chunk").aggregate([("tok_sum", "sum")])
    order = pc.sort_indices(merged.column("chunk"))
    chunk_ids = merged.column("chunk").take(order).to_numpy(
        zero_copy_only=False).astype(np.int64)
    sums = merged.column("tok_sum_sum").take(order).to_numpy(
        zero_copy_only=False).astype(np.int64)
    bases = np.cumsum(sums) - sums
    base_ref = ray.put((chunk_ids, bases))

    tshard = ray.remote(_table_shard)
    slices = [tshard.options(num_returns=P).remote(r, P, "chunk")
              for r in refs]
    comb = ray.remote(_pack_sep_combine)
    outs = [comb.remote(base_ref, seq_len, sep, *[s[p] for s in slices])
            for p in range(P)]
    import ray.data as rd

    return rd.from_arrow_refs(outs)


def sql_pack_tokens_sep(cache: str, seq_len: int = 512,
                        sep: int = 256) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, list_concat(tokens, [{sep}]) AS toks,
         CAST(n_tok + 1 AS BIGINT) AS n_tok,
         CAST(right(doc_id, 12) AS BIGINT) AS idx
  FROM read_parquet('{cache}/shard-*.parquet')
), o AS (
  SELECT doc_id, toks, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (ORDER BY idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_offset
  FROM t
), f AS (
  SELECT doc_id, toks, n_tok, tok_offset,
         unnest(generate_series(tok_offset // {seq_len},
                                (tok_offset + n_tok - 1) // {seq_len}))
           AS seq_id
  FROM o
), s AS (
  SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id, toks,
         GREATEST(seq_id * {seq_len}, tok_offset) - tok_offset + 1 AS a,
         LEAST((seq_id + 1) * {seq_len}, tok_offset + n_tok) - tok_offset AS b
  FROM f
)
SELECT doc_id, seq_id,
       CAST(b - a + 1 AS BIGINT) AS n_frag_tokens,
       CAST(list_sum(list_slice(toks, a, b)) AS BIGINT) AS frag_sum,
       CAST(toks[a] AS BIGINT) AS first_tok,
       CAST(toks[b] AS BIGINT) AS last_tok
FROM s
"""


def _pack_dedup_combine(base, seq_len: int, ndrop: int, *args) -> pa.Table:
    """One hash partition of the dedup-then-pack exchange: drop the
    partition's duplicate rows (sorted dropped-idx membership via
    searchsorted), then delegate to the plain pack combine — within-
    chunk offsets are rebuilt over KEPT rows only, matching the
    kept-only chunk bases."""
    dropped = np.unique(np.concatenate(args[:ndrop])) \
        if ndrop else np.zeros(0, np.int64)
    tabs = []
    for t in args[ndrop:]:
        if t.num_rows == 0:
            continue
        if len(dropped):
            idx = t.column("idx").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(dropped, idx)
            hit = (pos < len(dropped)) & \
                (dropped[np.minimum(pos, len(dropped) - 1)] == idx)
            t = t.filter(pa.array(~hit))
        if t.num_rows:
            tabs.append(t)
    return _pack_combine(base, seq_len, *tabs)


def q_log_pack_tokens_dedup(sf_dir: str, seq_len: int = 512,
                            chunk_docs: int = 4096):
    """The token-axis CURATION COMPOSITION: exact sequence dedup (keep
    the min-ingestion-index copy of each distinct tokens array) fused
    into GPT-style packing of the SURVIVING stream — what a training-
    data job actually runs (dedup feeding the packer), in one pipeline
    with no intermediate materialization.

    Three raw-task waves over ONE read:
      1. (h, idx, n_tok) triples route by the sequence hash — each hash
         partition keeps the min idx per h, emits (a) bounded per-chunk
         KEPT-token sums and (b) the dropped ids PRE-SHARDED by their
         chunk's Fibonacci hash (``num_returns=P+1`` — dropped ids
         never concat on the driver, the clusters_lp rule).
      2. The driver folds chunk sums into exclusive bases (the pack
         prefix-sum contract: O(corpus/chunk_docs) ints) broadcast once.
      3. The payload exchange (`_table_shard` by chunk) lands each
         chunk's rows WITH its dropped-id shard in one combine task,
         which filters and delegates to the plain pack combine.

    Sequence identity rides the property-tested 64-bit polynomial row
    hash (the log_seq_dedup contract: collisions ~ n^2/2^64); the SQL
    gate dedups on the exact tokens array."""

    def add_keys(t: pa.Table) -> pa.Table:
        idx = _pack_idx(t.column("doc_id"))
        vals, off = _token_lists(t.column("tokens"))
        # .view, not .astype: bit-exact uint64->int64 reinterpretation
        # (the log_seq_dedup idiom; astype of out-of-range uint64 is a
        # platform-defined C cast)
        h = _seq_hash64(vals, off).view(np.int64)
        return (t.select(["doc_id", "tokens"])
                .append_column("idx", pa.array(idx, pa.int64()))
                .append_column("chunk",
                               pa.array(idx // chunk_docs, pa.int64()))
                .append_column("h", pa.array(h)))

    return _dedup_pack_pipeline(sf_dir, add_keys, seq_len, chunk_docs)


def _dedup_pack_pipeline(sf_dir: str, add_keys, seq_len: int,
                         chunk_docs: int):
    """The dedup-feeding-pack three-wave exchange, parameterized over
    the key/gate stage (``add_keys`` may FILTER rows — the curated
    variant's quality gate — as long as it emits doc_id/tokens/idx/
    chunk/h). Shared by log_pack_tokens_dedup and
    log_pack_tokens_curated."""
    import ray

    from .datapipe import _lp_split, _n_parts, _table_shard

    P = max(2, _n_parts())
    empty = _PACK_SCHEMA.empty_table()

    def hshard(t: pa.Table) -> list:
        h = t.column("h").to_numpy(zero_copy_only=False)
        idx = t.column("idx").to_numpy(zero_copy_only=False)
        nt = pc.list_value_length(t.column("tokens")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return _lp_split(h, P, h, idx, nt)

    _SUMS = pa.schema([("chunk", pa.int64()), ("tok_sum", pa.int64())])

    def flag(*shards) -> list:
        h = np.concatenate([s[0] for s in shards])
        if not len(h):
            return [_SUMS.empty_table()] + [np.zeros(0, np.int64)] * P
        idx = np.concatenate([s[1] for s in shards])
        nt = np.concatenate([s[2] for s in shards])
        o = np.lexsort((idx, h))
        h, idx, nt = h[o], idx[o], nt[o]
        first = np.ones(len(h), dtype=bool)
        first[1:] = h[1:] != h[:-1]
        kidx, knt = idx[first], nt[first]
        ck = kidx // chunk_docs
        uk, inv = np.unique(ck, return_inverse=True)
        sums = pa.table({
            "chunk": pa.array(uk, pa.int64()),
            "tok_sum": pa.array(
                np.bincount(inv, weights=knt).astype(np.int64)),
        }, schema=_SUMS)
        dropped = idx[~first]
        dsh = [s[0] for s in _lp_split(dropped // chunk_docs, P, dropped)]
        return [sums] + dsh

    ds = (_read_tokens(sf_dir, ["doc_id", "tokens"])
          .map_batches(add_keys, batch_format="pyarrow"))
    refs = [r for b in ds.iter_internal_ref_bundles()
            for r, md in b.blocks if md.num_rows]
    if not refs:
        import ray.data as rd

        return rd.from_arrow(empty)
    htask = ray.remote(hshard)
    hs = [htask.options(num_returns=P).remote(r) for r in refs]
    ftask = ray.remote(flag)
    fl = [ftask.options(num_returns=P + 1).remote(*[s[p] for s in hs])
          for p in range(P)]
    merged = pa.concat_tables(
        [_SUMS.empty_table()] + ray.get([f[0] for f in fl])).group_by(
        "chunk").aggregate([("tok_sum", "sum")])
    order = pc.sort_indices(merged.column("chunk"))
    chunk_ids = merged.column("chunk").take(order).to_numpy(
        zero_copy_only=False).astype(np.int64)
    sums = merged.column("tok_sum_sum").take(order).to_numpy(
        zero_copy_only=False).astype(np.int64)
    bases = np.cumsum(sums) - sums
    base_ref = ray.put((chunk_ids, bases))
    tshard = ray.remote(_table_shard)
    slices = [tshard.options(num_returns=P).remote(r, P, "chunk")
              for r in refs]
    comb = ray.remote(_pack_dedup_combine)
    # packed survivor stream is O(corpus): ship it as a Dataset of
    # per-partition blocks (customer_rfm idiom), never a driver concat
    outs = [comb.remote(base_ref, seq_len, len(fl),
                        *[f[1 + p] for f in fl],
                        *[s[p] for s in slices])
            for p in range(P)]
    import ray.data as rd

    return rd.from_arrow_refs(outs)


def sql_pack_tokens_dedup(cache: str, seq_len: int = 512) -> str:
    return f"""
WITH raw AS (
  SELECT doc_id, tokens, CAST(n_tok AS BIGINT) AS n_tok,
         CAST(right(doc_id, 12) AS BIGINT) AS idx
  FROM read_parquet('{cache}/shard-*.parquet')
), t AS (
  SELECT doc_id, tokens, n_tok, idx FROM raw
  QUALIFY idx = MIN(idx) OVER (PARTITION BY tokens)
), o AS (
  SELECT doc_id, tokens, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (ORDER BY idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_offset
  FROM t
), f AS (
  SELECT doc_id, tokens, n_tok, tok_offset,
         unnest(generate_series(tok_offset // {seq_len},
                                (tok_offset + n_tok - 1) // {seq_len}))
           AS seq_id
  FROM o WHERE n_tok > 0
), s AS (
  SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id, tokens,
         GREATEST(seq_id * {seq_len}, tok_offset) - tok_offset + 1 AS a,
         LEAST((seq_id + 1) * {seq_len}, tok_offset + n_tok) - tok_offset AS b
  FROM f
)
SELECT doc_id, seq_id,
       CAST(b - a + 1 AS BIGINT) AS n_frag_tokens,
       CAST(list_sum(list_slice(tokens, a, b)) AS BIGINT) AS frag_sum,
       CAST(tokens[a] AS BIGINT) AS first_tok,
       CAST(tokens[b] AS BIGINT) AS last_tok
FROM s
"""


def _quality_gate_mask(vals: np.ndarray, off: np.ndarray,
                       min_tok: int, max_dom_ppm: int) -> np.ndarray:
    """Per-row keep mask for the curation quality gate: at least
    ``min_tok`` tokens AND dominant-token ratio under ``max_dom_ppm``
    ppm (integer floor — the log_seq_dominant_ratio pass, as a
    filter). Pure numpy; property-tested against a Counter reference
    in tests/test_properties.py."""
    nrows = len(off) - 1
    nt = np.diff(off)
    keep = np.zeros(nrows, dtype=bool)
    if len(vals):
        row_of = np.repeat(np.arange(nrows, dtype=np.int64), nt)
        key = row_of * 256 + vals.astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        rows_u = uk >> 8
        bnd = np.flatnonzero(np.r_[True, rows_u[1:] != rows_u[:-1]])
        mx = np.maximum.reduceat(cnt, bnd)
        rid = rows_u[bnd]
        ok = (nt[rid] >= min_tok) & (
            mx * 1_000_000 // nt[rid] < max_dom_ppm)
        keep[rid[ok]] = True
    return keep


def q_log_pack_tokens_curated(sf_dir: str, seq_len: int = 512,
                              chunk_docs: int = 4096,
                              max_dom_ppm: int = 900_000,
                              min_tok: int = 4):
    """The FULL token-axis curation flagship: quality gate -> exact
    dedup -> pack, one pipeline over one read. The gate drops
    near-constant payloads (dominant-token ratio >= ``max_dom_ppm``
    ppm — the stuck-sensor screen applied as a filter) and runt
    sequences (< ``min_tok`` tokens) BLOCK-LOCALLY inside the key
    stage, so the dedup exchange and the packer only ever see
    survivors; dedup then keeps the min-ingestion-index copy per
    distinct tokens array and the survivor stream packs into
    ``seq_len`` sequences (the log_pack_tokens_dedup waves, gated).

    Gate ordering matters and is pinned by the SQL mirror: a copy
    dropped by the QUALITY gate never shadows a later duplicate."""

    def add_keys(t: pa.Table) -> pa.Table:
        idx = _pack_idx(t.column("doc_id"))
        vals, off = _token_lists(t.column("tokens"))
        keep = _quality_gate_mask(vals, off, min_tok, max_dom_ppm)
        h = _seq_hash64(vals, off).view(np.int64)
        t = (t.select(["doc_id", "tokens"])
             .append_column("idx", pa.array(idx, pa.int64()))
             .append_column("chunk",
                            pa.array(idx // chunk_docs, pa.int64()))
             .append_column("h", pa.array(h)))
        return t.filter(pa.array(keep))

    return _dedup_pack_pipeline(sf_dir, add_keys, seq_len, chunk_docs)


def sql_pack_tokens_curated(cache: str, seq_len: int = 512,
                            max_dom_ppm: int = 900_000,
                            min_tok: int = 4) -> str:
    return f"""
WITH raw AS (
  SELECT doc_id, tokens, CAST(n_tok AS BIGINT) AS n_tok,
         CAST(right(doc_id, 12) AS BIGINT) AS idx
  FROM read_parquet('{cache}/shard-*.parquet')
), u AS (
  SELECT doc_id, CAST(tok AS BIGINT) AS tok,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM read_parquet('{cache}/shard-*.parquet') t, UNNEST(t.tokens) AS z(tok)
  GROUP BY doc_id, tok
), dom AS (
  SELECT doc_id, MAX(c) AS mx FROM u GROUP BY doc_id
), gated AS (
  SELECT raw.* FROM raw JOIN dom USING (doc_id)
  WHERE raw.n_tok >= {min_tok}
    AND dom.mx * 1000000 // raw.n_tok < {max_dom_ppm}
), t AS (
  SELECT doc_id, tokens, n_tok, idx FROM gated
  QUALIFY idx = MIN(idx) OVER (PARTITION BY tokens)
), o AS (
  SELECT doc_id, tokens, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (ORDER BY idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_offset
  FROM t
), f AS (
  SELECT doc_id, tokens, n_tok, tok_offset,
         unnest(generate_series(tok_offset // {seq_len},
                                (tok_offset + n_tok - 1) // {seq_len}))
           AS seq_id
  FROM o WHERE n_tok > 0
), s AS (
  SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id, tokens,
         GREATEST(seq_id * {seq_len}, tok_offset) - tok_offset + 1 AS a,
         LEAST((seq_id + 1) * {seq_len}, tok_offset + n_tok) - tok_offset AS b
  FROM f
)
SELECT doc_id, seq_id,
       CAST(b - a + 1 AS BIGINT) AS n_frag_tokens,
       CAST(list_sum(list_slice(tokens, a, b)) AS BIGINT) AS frag_sum,
       CAST(tokens[a] AS BIGINT) AS first_tok,
       CAST(tokens[b] AS BIGINT) AS last_tok
FROM s
"""


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

    Ray shape: partition-grouped (datapipe._n_parts — client count is
    unbounded at scale, so per-client map_groups would pay ~60us per
    tiny group): group by client-hash %% P, then one vectorized
    windowed cumsum scan per partition; the oracle is an independent
    SQL window query (and the literal ring-buffer dump in pytest)."""
    import zlib

    import numpy as np
    import pandas as pd

    from .datapipe import _n_parts

    P = _n_parts()

    def add_part(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("parse_ok")).select(
            ["source", "client_ip", "doc_id", "malicious"])
        key = pc.binary_join_element_wise(
            t.column("source").cast(pa.string()),
            t.column("client_ip").cast(pa.string()), "\x00")
        enc = pc.dictionary_encode(
            key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key)
        uniq = enc.dictionary.to_pylist()
        uh = np.fromiter((zlib.crc32(u.encode()) for u in uniq),
                         dtype=np.int64, count=len(uniq))
        part = (uh[enc.indices.to_numpy(zero_copy_only=False)] % P
                if len(uniq) else np.zeros(0, dtype=np.int64))
        return t.append_column("part", pa.array(part))

    def offenders_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "client_ip", "doc_id"], kind="stable")
        src = g["source"].to_numpy()
        cli = g["client_ip"].to_numpy()
        n = len(g)
        nb = np.ones(n, dtype=bool)
        nb[1:] = (src[1:] != src[:-1]) | (cli[1:] != cli[:-1])
        seg = np.cumsum(nb) - 1
        starts = np.flatnonzero(nb)
        bad = (g["malicious"].to_numpy() != 0).astype(np.int64)
        cs = np.cumsum(bad)
        idx = np.arange(n)
        j = np.maximum(idx - 49, starts[seg])  # window = last 50 rows in segment
        prev = np.where(j >= 1, cs[np.maximum(j - 1, 0)], 0)
        rolling = cs - prev
        nseg = int(seg[-1]) + 1 if n else 0
        max_in = np.zeros(nseg, dtype=np.int64)
        np.maximum.at(max_in, seg, rolling)
        return pd.DataFrame({
            "source": src[starts],
            "client_ip": cli[starts],
            "n_requests": np.bincount(seg).astype(np.int64),
            "max_malicious_in_window": max_in,
            "flagged": (max_in >= 3).astype(np.int64),
        })

    enr = _enriched(sf_dir).map_batches(add_part, batch_format="pyarrow")
    return enr.groupby("part").map_groups(offenders_part, batch_format="pandas")


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
        "log_rate_zscore": q_log_rate_zscore,
        "log_bytes_quantiles": q_log_bytes_quantiles,
        "log_bytes_quantiles_kll": q_log_bytes_quantiles_kll,
        "log_distinct_clients": q_log_distinct_clients,
        "log_distinct_clients_hll": q_log_distinct_clients_hll,
        "log_token_histogram": q_log_token_histogram,
        "log_token_bigrams": q_log_token_bigrams,
        "log_seq_dedup": q_log_seq_dedup,
        "log_seq_dedup_minhash": q_log_seq_dedup_minhash,
        "log_ngram_novelty": q_log_ngram_novelty,
        "log_dup_cluster_sizes": q_log_dup_cluster_sizes,
        "log_token_positional_stats": q_log_token_positional_stats,
        "log_cross_source_leakage": q_log_cross_source_leakage,
        "log_seq_dominant_ratio": q_log_seq_dominant_ratio,
        "log_token_burstiness": q_log_token_burstiness,
        "log_token_run_lengths": q_log_token_run_lengths,
        "log_seq_len_percentiles": q_log_seq_len_percentiles,
        "log_source_minhash_sim": q_log_source_minhash_sim,
        "log_seq_internal_repeats": q_log_seq_internal_repeats,
        "log_dup_gap_histogram": q_log_dup_gap_histogram,
        "log_decontaminate_eval": q_log_decontaminate_eval,
        "log_token_zipf": q_log_token_zipf,
        "log_token_pmi": q_log_token_pmi,
        "log_pack_doc_mix": q_log_pack_doc_mix,
        "log_pack_source_purity": q_log_pack_source_purity,
        "log_pack_tokens_curated": q_log_pack_tokens_curated,
        "log_pack_tokens": q_log_pack_tokens,
        "log_pack_tokens_sep": q_log_pack_tokens_sep,
        "log_seq_dedup_prefix": q_log_seq_dedup_prefix,
        "log_source_drift": q_log_source_drift,
        "log_pack_tokens_by_source": q_log_pack_tokens_by_source,
        "log_sessionize": q_log_sessionize,
        "log_source_ce": q_log_source_ce,
        "log_ip_entropy": q_log_ip_entropy,
        "log_token_entropy": q_log_token_entropy,
        "log_oov_rate": q_log_oov_rate,
        "log_seq_len_buckets": q_log_seq_len_buckets,
        "log_token_ngram_dedup": q_log_token_ngram_dedup,
        "log_pack_tokens_dedup": q_log_pack_tokens_dedup,
        "log_source_token_tfidf": q_log_source_token_tfidf,
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
        "log_rate_zscore": sql_rate_zscore(cache),
        "log_bytes_quantiles": sql_bytes_quantiles(cache),
        "log_distinct_clients": sql_distinct_clients(cache),
        # moved to independent SQL in r3 (Go net/url + malicious
        # classifier re-implemented in pure SQL, see _sql_url_ctes)
        "log_top_paths": sql_top_paths(cache),
        "log_repeat_offenders": sql_repeat_offenders(cache),
        # moved to independent SQL in r3: the full enrichment chain
        # (Go-URL + UA tree + referer + robots override + 100-byte
        # truncation) is re-implemented in pure SQL (_sql_enriched_cte);
        # compat shares sql_metrics because chronological input makes
        # the faithful-streaming totals equal the exact sums
        "log_metrics": sql_metrics(cache),
        "log_metrics_compat": sql_metrics(cache),
        "log_keyed_counters": sql_keyed_counters(cache),
        "log_global_counters": sql_global_counters(cache),
        # r3: the routed sink pair too — every log-query oracle is now
        # independent SQL (the materialized Python-oracle dumps remain
        # only as pytest cross-checks in tests/test_oracle.py)
        "log_routed": sql_routed(cache),
        "log_routed_masked": sql_routed(cache, masked=True),
        # token-native operators gate directly against the raw shards
        # (unnest / list equality in DuckDB — fully independent SQL)
        "log_token_histogram": sql_token_histogram(cache),
        "log_token_bigrams": sql_token_bigrams(cache),
        "log_seq_dedup": sql_seq_dedup(cache),
        "log_seq_dedup_minhash": sql_seq_dedup_minhash(cache),
        "log_ngram_novelty": sql_ngram_novelty(cache),
        "log_dup_cluster_sizes": sql_dup_cluster_sizes(cache),
        "log_token_positional_stats": sql_token_positional_stats(cache),
        "log_cross_source_leakage": sql_cross_source_leakage(cache),
        "log_seq_dominant_ratio": sql_seq_dominant_ratio(cache),
        "log_token_burstiness": sql_token_burstiness(cache),
        "log_token_run_lengths": sql_token_run_lengths(cache),
        "log_seq_len_percentiles": sql_seq_len_percentiles(cache),
        "log_source_minhash_sim": sql_source_minhash_sim(cache),
        "log_seq_internal_repeats": sql_seq_internal_repeats(cache),
        "log_dup_gap_histogram": sql_dup_gap_histogram(cache),
        "log_decontaminate_eval": sql_decontaminate_eval(cache),
        "log_token_zipf": sql_token_zipf(cache),
        "log_token_pmi": sql_token_pmi(cache),
        "log_pack_doc_mix": sql_pack_doc_mix(cache),
        "log_pack_source_purity": sql_pack_source_purity(cache),
        "log_pack_tokens_curated": sql_pack_tokens_curated(cache),
        "log_pack_tokens": sql_pack_tokens(cache),
        "log_pack_tokens_sep": sql_pack_tokens_sep(cache),
        "log_seq_dedup_prefix": sql_seq_dedup_prefix(cache),
        "log_source_drift": sql_source_drift(cache),
        "log_pack_tokens_by_source": sql_pack_tokens_by_source(cache),
        "log_sessionize": sql_log_sessionize(cache),
        "log_source_ce": sql_source_ce(cache),
        "log_ip_entropy": sql_ip_entropy(cache),
        "log_token_entropy": sql_token_entropy(cache),
        "log_oov_rate": sql_oov_rate(cache),
        "log_seq_len_buckets": sql_seq_len_buckets(cache),
        "log_token_ngram_dedup": sql_token_ngram_dedup(cache),
        "log_pack_tokens_dedup": sql_pack_tokens_dedup(cache),
        "log_source_token_tfidf": sql_source_token_tfidf(cache),
    }
