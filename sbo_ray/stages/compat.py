"""Order-sensitive compat mode: faithful bounded-window metric semantics.

The default engine computes exact order-insensitive totals (batch
groupby), which equals the reference's add-merge sink totals on
chronological input (SURVEY.md §2.6 A2/A3). This module reproduces the
reference's *streaming* semantics bit-for-bit — bounded window eviction,
the keys[0]-overwrite quirk, and silent late-data drops
(metrics/SBOMetrics.go:183-210) — for out-of-order inputs:

    enriched -> ordered metric fan-out (arrival order = input row order)
             -> groupby (source, metric_type, key_value)
             -> map_groups: replay the Go accumulator per key in arrival
                order -> emissions (evictions + End() flush)

The per-key replay is sequential by construction (the reference's state
is per (file, type, key), so key-partitioned replay is exact); the
groupby shuffle distributes keys across workers. Arrival order is the
input row order, tracked with an explicit ``arrival`` column derived
from the per-shard row position (Ray blocks preserve intra-block order;
``doc_id`` carries the global synth order for the tests' inputs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..oracle.pipeline import OracleMetricsManager

COMPAT_SCHEMA = pa.schema([
    ("source", pa.string()),
    ("metric_type", pa.int32()),
    ("key_value", pa.string()),
    ("time_window", pa.int64()),
    ("metric_value", pa.int64()),
])


ORDERED_SCHEMA = pa.schema([
    ("source", pa.string()),
    ("metric_type", pa.int32()),
    ("key_value", pa.string()),
    ("time_window", pa.int64()),
    ("value", pa.int64()),
    ("arrival", pa.string()),
])


def ordered_fanout(batch: pa.Table, order_col: str = "doc_id") -> pa.Table:
    """Enriched batch -> long metric rows WITH the arrival-order key
    (no pre-aggregation: the accumulator is order-sensitive). Same
    fan-out rules as stages.metrics.metric_fanout
    (metricgenerator.go:86-126), vectorized with Arrow masks."""
    import pyarrow.compute as pc

    from ..oracle.pipeline import (
        METRIC_BYTES_SENT, METRIC_DEVICE_TYPE, METRIC_HTTP_STATUS,
        METRIC_IS_HUMAN, METRIC_METHOD, METRIC_OS_FAMILY, METRIC_PATH,
        METRIC_REFERER, METRIC_REQ_COUNT, METRIC_REQUEST_INTENT,
        METRIC_UA_FAMILY,
    )

    batch = batch.filter(batch.column("parse_ok"))
    n = batch.num_rows
    if n == 0:
        return ORDERED_SCHEMA.empty_table()
    source = batch.column("source").combine_chunks()
    tw = batch.column("time_window").combine_chunks()
    arrival = batch.column(order_col).combine_chunks().cast(pa.string())
    ones = pa.array(np.ones(n, dtype=np.int64))
    empty_key = pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, dtype=np.int32)), pa.array([""], type=pa.string())
    ).cast(pa.string())

    pieces: list[pa.Table] = []

    def emit(mtype: int, key: pa.Array, value: pa.Array, mask=None) -> None:
        s, t, k, v, o = source, tw, key, value, arrival
        if mask is not None:
            s, t = s.filter(mask), t.filter(mask)
            k, v, o = k.filter(mask), v.filter(mask), o.filter(mask)
        if len(k) == 0:
            return
        mt = pa.array(np.full(len(k), mtype, dtype=np.int32))
        pieces.append(pa.Table.from_arrays([s, mt, k, t, v, o],
                                           schema=ORDERED_SCHEMA))

    emit(METRIC_REQ_COUNT, empty_key, ones)
    emit(METRIC_BYTES_SENT, empty_key, batch.column("bytes_sent").combine_chunks())
    emit(METRIC_HTTP_STATUS, batch.column("status").combine_chunks(), ones)
    emit(METRIC_METHOD, batch.column("method").combine_chunks(), ones)
    referer = batch.column("referer").combine_chunks()
    emit(METRIC_REFERER, referer, ones, mask=pc.not_equal(referer, ""))
    is2xx = pc.starts_with(batch.column("status").combine_chunks(), "2")
    p1 = batch.column("path1").combine_chunks()
    p2 = batch.column("path2").combine_chunks()
    p3 = batch.column("path3").combine_chunks()
    emit(METRIC_PATH, p1, ones, mask=is2xx)
    emit(METRIC_PATH, p2, ones, mask=pc.and_(is2xx, pc.not_equal(p2, "")))
    emit(METRIC_PATH, p3, ones, mask=pc.and_(is2xx, pc.not_equal(p3, "")))
    emit(METRIC_UA_FAMILY, batch.column("ua_family").combine_chunks(), ones)
    emit(METRIC_OS_FAMILY, batch.column("ua_os").combine_chunks(), ones)
    emit(METRIC_DEVICE_TYPE, batch.column("ua_device_type").combine_chunks(), ones)
    emit(METRIC_IS_HUMAN, batch.column("ua_human").combine_chunks(), ones)
    emit(METRIC_REQUEST_INTENT, batch.column("ua_intent").combine_chunks(), ones)
    long_t = pa.concat_tables(pieces)
    # same 100-byte sink truncation as metrics.metric_fanout / the oracle
    # (ReduceToMaxColumnLen, db/mysqldb.go:152)
    from .route import _truncate

    kv = long_t.column("key_value")
    kv = kv.combine_chunks() if isinstance(kv, pa.ChunkedArray) else kv
    return long_t.set_column(
        long_t.schema.get_field_index("key_value"), "key_value",
        _truncate(kv, 100),
    )


def replay_group(g: pd.DataFrame, window_size: int = 3,
                 replace_existing: bool = False) -> pd.DataFrame:
    """Replay one (source, metric_type, key_value) group through the
    faithful Go accumulator in arrival order; emit evictions + flush.

    ``replace_existing`` selects the sink merge policy
    (db/mysqldb.go:147-151): add-merge (default; re-emissions for the
    same window accumulate) vs replace (ON DUPLICATE KEY UPDATE
    metric_value=VALUES: last write wins). They differ only when a
    window is re-emitted, i.e. evicted and later re-created by
    out-of-order arrivals."""
    g = g.sort_values("arrival", kind="stable")
    src = g["source"].iloc[0]
    mtype = int(g["metric_type"].iloc[0])
    key = g["key_value"].iloc[0]
    mgr = OracleMetricsManager(window_size)
    emitted: list[tuple[int, int]] = []
    for tw, val in zip(g["time_window"].to_numpy(), g["value"].to_numpy()):
        ev = mgr.add(src, mtype, key, int(tw), int(val))
        if ev is not None:
            emitted.append(ev)
    for (_, _, _, tw, val) in mgr.flush():
        emitted.append((tw, val))
    acc: dict[int, int] = {}
    for tw, val in emitted:
        if replace_existing:
            acc[tw] = val
        else:
            acc[tw] = acc.get(tw, 0) + val
    return pd.DataFrame({
        "source": src,
        "metric_type": np.int32(mtype),
        "key_value": key,
        "time_window": np.array(sorted(acc), dtype=np.int64),
        "metric_value": np.array([acc[tw] for tw in sorted(acc)], dtype=np.int64),
    })


def metrics_dataset_compat(enriched, window_size: int = 3,
                           replace_existing: bool = False):
    """Faithful streaming-window metric totals as a Ray pipeline."""
    long_ds = enriched.map_batches(ordered_fanout, batch_format="pyarrow")
    out = long_ds.groupby(["source", "metric_type", "key_value"]).map_groups(
        lambda g: replay_group(g, window_size, replace_existing),
        batch_format="pandas",
    )
    return out
