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

from ..oracle.pipeline import OracleMetricsManager, metric_fanout

COMPAT_SCHEMA = pa.schema([
    ("source", pa.string()),
    ("metric_type", pa.int32()),
    ("key_value", pa.string()),
    ("time_window", pa.int64()),
    ("metric_value", pa.int64()),
])


def ordered_fanout(batch: pa.Table, order_col: str = "doc_id") -> pa.Table:
    """Enriched batch -> long metric rows WITH the arrival-order key
    (no pre-aggregation: the accumulator is order-sensitive)."""
    batch = batch.filter(batch.column("parse_ok"))
    n = batch.num_rows
    if n == 0:
        return pa.schema(
            list(COMPAT_SCHEMA) [:4] + [pa.field("value", pa.int64()),
                                        pa.field("arrival", pa.string())]
        ).empty_table()
    cols = {c: batch.column(c).to_pylist()
            for c in ("source", "status", "method", "referer", "path1",
                      "path2", "path3", "bytes_sent", "ua_family", "ua_os",
                      "ua_device_type", "ua_human", "ua_intent",
                      "time_window", order_col)}
    out_src, out_type, out_key, out_tw, out_val, out_ord = [], [], [], [], [], []
    for i in range(n):
        row = _RowView(cols, i)
        for mtype, key, value in metric_fanout(row):
            out_src.append(cols["source"][i])
            out_type.append(mtype)
            out_key.append(key)
            out_tw.append(cols["time_window"][i])
            out_val.append(value)
            out_ord.append(cols[order_col][i])
    return pa.table({
        "source": pa.array(out_src, type=pa.string()),
        "metric_type": pa.array(out_type, type=pa.int32()),
        "key_value": pa.array(out_key, type=pa.string()),
        "time_window": pa.array(out_tw, type=pa.int64()),
        "value": pa.array(out_val, type=pa.int64()),
        "arrival": pa.array(out_ord, type=pa.string()),
    })


class _RowView:
    """Adapts enriched columns to the oracle's ParsedLine interface for
    metric_fanout (duck-typed: only the fields fan-out reads)."""

    __slots__ = ("_c", "_i")

    def __init__(self, cols: dict, i: int) -> None:
        self._c = cols
        self._i = i

    @property
    def status(self):
        return self._c["status"][self._i]

    @property
    def method(self):
        return self._c["method"][self._i]

    @property
    def referer(self):
        return self._c["referer"][self._i]

    @property
    def path1(self):
        return self._c["path1"][self._i]

    @property
    def path2(self):
        return self._c["path2"][self._i]

    @property
    def path3(self):
        return self._c["path3"][self._i]

    @property
    def bytes_sent(self):
        return int(self._c["bytes_sent"][self._i])

    @property
    def ua(self):
        c, i = self._c, self._i

        class _UA:
            family = c["ua_family"][i]
            os = c["ua_os"][i]
            device_type = c["ua_device_type"][i]
            human = c["ua_human"][i]
            intent = c["ua_intent"][i]

        return _UA


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
