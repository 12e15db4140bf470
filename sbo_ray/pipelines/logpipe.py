"""Assembled Ray Data pipelines for the log engine.

The Dataset DAG mirroring the reference's lifecycle (SURVEY.md §3.4):

    read_parquet(shards)                       # S1: the token table
      -> map_batches(ParseEnrich, actors)      # P1-P12 + ST1, zero-copy Arrow
      -> (a) metric fan-out + partial agg -> groupby.sum   # A1/A2/ST2
         (b) counter melt -> groupby.sum                    # A4/A5/ST3
         (c) relevance filter + projection -> routed sink   # F3/K5
         (d) top-N: groupby.count -> sort.limit             # A6

Nothing here calls ray.init(); the caller (driver / bench.py / tests)
owns the session. All stages stream; only final small aggregates are
materialized by callers.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..config import JobConfig
from ..stages.metrics import (
    GROUP_KEYS,
    METRIC_SCHEMA,
    counter_melt,
    global_counter_partial,
    metric_fanout,
)
from ..stages.parse import ParseEnrich, make_parse_fn  # noqa: F401 (actor variant exported)
from ..stages.route import routed_projection


def _cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def tune_context() -> None:
    """Shuffle knobs sized to the session: hash-shuffle aggregation (the
    scalable strategy for high-cardinality groupbys) with parallelism =
    cluster CPUs instead of the fixed 200-partition default, which burns
    constant overhead per shuffle at small scale."""
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    cpus = _cpus()
    ctx.default_hash_shuffle_parallelism = max(4, cpus)
    ctx.min_parallelism = max(4, cpus)


def read_input(input_dir: str) -> rd.Dataset:
    """Read the token table shards; only the 4 input columns exist, so no
    column pruning is needed here — pruning happens in later selects."""
    return rd.read_parquet(input_dir)


def enriched_dataset(input_dir: str, job: JobConfig,
                     batch_size: int = 32768) -> rd.Dataset:
    """Token table -> enriched table.

    Runs as a *task pool* (stateless map_batches): Ray reuses worker
    processes, so the parse stage's per-unique-value caches live at
    module level in each worker and amortize exactly like actor state,
    without per-query actor-pool startup latency. (SURVEY.md §2.4 ST1;
    an actor-pool variant is available via ``ParseEnrich`` directly.)"""
    tune_context()
    return read_input(input_dir).map_batches(
        make_parse_fn(job),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def metrics_dataset(enriched: rd.Dataset) -> rd.Dataset:
    """Enriched -> exact per-window metric totals (the sbo_metrics sink in
    add-merge mode, SURVEY.md §2.6 A3): melt+partial-agg per block, then
    one hash groupby over the 4-part key."""
    long_ds = enriched.map_batches(metric_fanout, batch_format="pyarrow")
    agg = long_ds.groupby(GROUP_KEYS).aggregate(
        Sum("metric_value", alias_name="metric_value")
    )
    return agg


def keyed_counters_dataset(enriched: rd.Dataset) -> rd.Dataset:
    """All nine keyed counter dimensions, per source, in one shuffle."""
    long_ds = enriched.map_batches(counter_melt, batch_format="pyarrow")
    return long_ds.groupby(["source", "dimension", "key_value"]).aggregate(
        Sum("cnt", alias_name="cnt")
    )


def global_counters(enriched: rd.Dataset) -> dict[str, int]:
    """The six global counters + parse errors, as one small dict."""
    partials = enriched.map_batches(global_counter_partial, batch_format="pyarrow")
    out = partials.aggregate(
        Sum("handled", alias_name="handled"),
        Sum("requests", alias_name="requests"),
        Sum("bytes_sent", alias_name="bytes_sent"),
        Sum("humans", alias_name="humans"),
        Sum("non_humans", alias_name="non_humans"),
        Sum("malicious", alias_name="malicious"),
        Sum("parse_errors", alias_name="parse_errors"),
    )
    return {k: int(v) for k, v in out.items()}


def routed_dataset(enriched: rd.Dataset, mask_ips: bool = False,
                   relevant_only: bool = True) -> rd.Dataset:
    return enriched.map_batches(
        lambda b: routed_projection(b, mask_ips=mask_ips, relevant_only=relevant_only),
        batch_format="pyarrow",
    )


def top_n_dataset(keyed_counters: rd.Dataset, dimension: str, n: int = 10) -> pa.Table:
    """Exact per-source top-N for one counter dimension with deterministic
    (count desc, key asc) tie-break (vs the reference's nondeterministic
    map-order ties, counter.go:305-321 — documented divergence).

    The keyed-counter aggregate is small (bounded key cardinality), so the
    per-source head-N runs as a grouped map over the aggregate, not over
    raw rows."""
    import pandas as pd

    dim = keyed_counters.filter(expr=f'dimension == "{dimension}"')

    def head_n(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cnt", "key_value"], ascending=[False, True])
        return g.head(n)

    top = dim.groupby("source").map_groups(head_n, batch_format="pandas")
    df = top.to_pandas().sort_values(["source", "cnt", "key_value"],
                                     ascending=[True, False, True])
    return pa.Table.from_pandas(
        df[["source", "key_value", "cnt"]].reset_index(drop=True),
        preserve_index=False,
    )


def write_metrics(metrics: rd.Dataset, out_dir: str) -> None:
    """Metrics sink: partitioned Parquet keyed on source (the sbo_metrics
    table analog, db/mysqldb.go:145-151)."""
    metrics.write_parquet(out_dir, partition_cols=["source"])


def write_routed(routed: rd.Dataset, out_dir: str) -> None:
    """Routed raw-log sink partitioned by source (sbo_rawlogs analog)."""
    routed.write_parquet(out_dir, partition_cols=["source"])
