"""Materialize synthetic input + oracle reference outputs for a scale dir.

The driver's correctness gate runs each ``queries()[name](sf_dir)`` Ray
pipeline side-by-side with ``oracle_sql()[name]`` in DuckDB. For the
UA-/URL-dependent sinks a faithful ANSI-SQL re-implementation is not
practical, so we dump the *independent pure-Python oracle*'s results to
Parquet and let the SQL side read them — the comparison is then
engine-vs-oracle, exactly the north_rule's gate. The simpler metrics
(REQ_COUNT / BYTES_SENT / HTTP_STATUS / METHOD) additionally get a
genuinely independent DuckDB SQL implementation over the raw lines
(see ``__ray_entry__.oracle_sql``).

Everything is deterministic and cached under /tmp keyed by
(row-count, seed); safe to call from both ``queries()`` callables and
``oracle_sql()`` regardless of driver ordering.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .. import synth
from .pipeline import run_oracle, top_n

N_SOURCES = 12


def cache_dir_for(sf_dir: str) -> str:
    return synth.ensure_input(sf_dir, n_sources=N_SOURCES)


def oracle_dir_for(sf_dir: str) -> str:
    """Ensure input + line view + oracle dumps exist; return the cache dir."""
    cache = cache_dir_for(sf_dir)
    # versioned marker: bump when a new oracle dump is added so existing
    # caches regenerate
    marker = os.path.join(cache, "_ORACLE_DONE_v2")
    if os.path.exists(marker):
        return cache
    n_rows = synth._sf_rows(sf_dir)
    doc_ids, lines, sources = synth.synth_lines(n_rows, seed=synth.SEED_DEFAULT,
                                                n_sources=N_SOURCES)
    cfg = synth.source_config(N_SOURCES)

    # plain-text line view for the genuinely-independent DuckDB SQL oracle
    lines_t = pa.table({
        "doc_id": pa.array(doc_ids, type=pa.string()),
        "line": pa.array(lines, type=pa.string()),
        "source": pa.array(sources, type=pa.string()),
    })
    pq.write_table(lines_t, os.path.join(cache, "lines.parquet"))

    res = run_oracle(doc_ids, lines, sources, cfg, exact_totals=True)

    metrics_t = pa.table({
        "source": pa.array([m[0] for m in res.metrics], type=pa.string()),
        "metric_type": pa.array([m[1] for m in res.metrics], type=pa.int32()),
        "key_value": pa.array([m[2] for m in res.metrics], type=pa.string()),
        "time_window": pa.array([m[3] for m in res.metrics], type=pa.int64()),
        "metric_value": pa.array([m[4] for m in res.metrics], type=pa.int64()),
    })
    pq.write_table(metrics_t, os.path.join(cache, "oracle_metrics.parquet"))

    kc_rows = [
        (src, dim, key, cnt)
        for dim, counts in sorted(res.keyed_counters.items())
        for (src, key), cnt in sorted(counts.items())
    ]
    kc_t = pa.table({
        "source": pa.array([r[0] for r in kc_rows], type=pa.string()),
        "dimension": pa.array([r[1] for r in kc_rows], type=pa.string()),
        "key_value": pa.array([r[2] for r in kc_rows], type=pa.string()),
        "cnt": pa.array([r[3] for r in kc_rows], type=pa.int64()),
    })
    pq.write_table(kc_t, os.path.join(cache, "oracle_keyed_counters.parquet"))

    routed_cols = [
        ("source", pa.string()), ("doc_id", pa.string()),
        ("request_ts", pa.timestamp("s")), ("client_ip", pa.string()),
        ("remote_user", pa.string()), ("http_method", pa.string()),
        ("path3", pa.string()), ("request_uri", pa.string()),
        ("http_status", pa.string()), ("bytes_sent", pa.int64()),
        ("referer", pa.string()), ("is_malicious", pa.int8()),
        ("ua_string", pa.string()), ("ua_os", pa.string()),
        ("ua_family", pa.string()), ("ua_device_type", pa.string()),
        ("ua_is_human", pa.string()), ("ua_intent", pa.string()),
    ]
    routed_t = pa.table(
        {name: pa.array([r[name] for r in res.routed], type=typ)
         for name, typ in routed_cols}
    )
    pq.write_table(routed_t, os.path.join(cache, "oracle_routed.parquet"))

    # masked variant (MaskIPs=1: null client_ip + keep-last-part UA,
    # db/mysqldb.go:166-170, 208)
    res_masked = run_oracle(doc_ids, lines, sources, cfg, exact_totals=True,
                            mask_ips=True)
    routed_masked_t = pa.table(
        {name: pa.array([r[name] for r in res_masked.routed], type=typ)
         for name, typ in routed_cols}
    )
    pq.write_table(routed_masked_t,
                   os.path.join(cache, "oracle_routed_masked.parquet"))

    # per-source top-10 paths (one CounterHandler per file in the reference)
    per_source: dict[str, dict[str, int]] = {}
    for (src, key), cnt in res.keyed_counters["paths"].items():
        per_source.setdefault(src, {})[key] = cnt
    tp_rows = [
        (src, key, cnt)
        for src in sorted(per_source)
        for key, cnt in top_n(per_source[src], 10).items()
    ]
    tp_t = pa.table({
        "source": pa.array([r[0] for r in tp_rows], type=pa.string()),
        "key_value": pa.array([r[1] for r in tp_rows], type=pa.string()),
        "cnt": pa.array([r[2] for r in tp_rows], type=pa.int64()),
    })
    pq.write_table(tp_t, os.path.join(cache, "oracle_top_paths.parquet"))

    gc_t = pa.table({
        "requests": pa.array([res.counters.get("requests", 0)], type=pa.int64()),
        "bytes_sent": pa.array([res.counters.get("bytes_sent", 0)], type=pa.int64()),
        "humans": pa.array([res.counters.get("humans", 0)], type=pa.int64()),
        "non_humans": pa.array([res.counters.get("non_humans", 0)], type=pa.int64()),
        "malicious": pa.array([res.counters.get("malicious", 0)], type=pa.int64()),
        "parse_errors": pa.array([res.parse_errors], type=pa.int64()),
    })
    pq.write_table(gc_t, os.path.join(cache, "oracle_global_counters.parquet"))

    # ST5-as-intended: the reference's lastN ring buffer is write-only dead
    # code, but its TODO states the intent ("check if we received invalid
    # requests from a client repeatedly -> malicious",
    # handlers/metricgenerator.go:73). Oracle = a LITERAL per-client ring
    # buffer of the last 50 parsed entries in file order, row at a time.
    from collections import defaultdict, deque

    from ..functions import loglines as L

    LASTN = 50  # METRIC_GENERATOR_LAST_N_WINDOW_SIZE (metricgenerator.go:36)
    rings: dict[tuple, deque] = defaultdict(lambda: deque(maxlen=LASTN))
    stats: dict[tuple, list] = defaultdict(lambda: [0, 0])  # n_requests, max_in_window
    for line, src in zip(lines, sources):
        fmt = cfg[src]
        row = L.parse_line(line, fmt)
        if not row.ok:
            continue
        key = (src, row.client_ip)
        ring = rings[key]
        ring.append(1 if row.malicious != L.MALICIOUS_UNKNOWN else 0)
        st = stats[key]
        st[0] += 1
        st[1] = max(st[1], sum(ring))
    ro_rows = sorted((src, ip, st[0], st[1], 1 if st[1] >= 3 else 0)
                     for (src, ip), st in stats.items())
    ro_t = pa.table({
        "source": pa.array([r[0] for r in ro_rows], type=pa.string()),
        "client_ip": pa.array([r[1] for r in ro_rows], type=pa.string()),
        "n_requests": pa.array([r[2] for r in ro_rows], type=pa.int64()),
        "max_malicious_in_window": pa.array([r[3] for r in ro_rows], type=pa.int64()),
        "flagged": pa.array([r[4] for r in ro_rows], type=pa.int64()),
    })
    pq.write_table(ro_t, os.path.join(cache, "oracle_repeat_offenders.parquet"))

    with open(marker, "w") as f:
        f.write("ok")
    return cache
