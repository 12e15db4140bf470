"""Explicit shuffle utilities: salted two-phase aggregation and keyed
hash repartitioning for hot-key mitigation (SURVEY.md §4 "Skew").

The default metric pipeline doesn't need salting because its shuffle key
includes ``key_value`` and ``time_window`` (the hot ``source`` spreads
across the whole key space). These utilities are the explicit tools for
the cases that DO concentrate: grouping by ``source`` alone (per-source
exports) or any skewed low-cardinality key at 10^12-row scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum


def add_salt(batch: pa.Table, n_buckets: int, seed: int = 0x9E3779B9) -> pa.Table:
    """Append a uniform ``salt`` column (row-index hash, config-free)."""
    n = batch.num_rows
    # splitmix-style scramble of the row position: uniform, deterministic
    # per batch content-independent salt
    idx = np.arange(n, dtype=np.uint64) + np.uint64(seed)
    idx = (idx ^ (idx >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    idx = (idx ^ (idx >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    salt = (idx ^ (idx >> np.uint64(31))) % np.uint64(n_buckets)
    return batch.append_column("salt", pa.array(salt.astype(np.int32)))


def salted_groupby_sum(ds: rd.Dataset, keys: list[str], value: str,
                       n_buckets: int = 16) -> rd.Dataset:
    """Two-phase aggregation for hot keys: phase 1 groups on
    (keys + salt) — a hot key splits across ``n_buckets`` reducers —
    phase 2 merges the per-salt partials on the true keys (tiny input:
    at most n_buckets rows per distinct key)."""
    salted = ds.map_batches(
        lambda b: add_salt(b, n_buckets), batch_format="pyarrow"
    )
    phase1 = salted.groupby(keys + ["salt"]).aggregate(
        Sum(value, alias_name=value)
    )
    phase2 = phase1.groupby(keys).aggregate(Sum(value, alias_name=value))
    return phase2


def repartition_by_key(ds: rd.Dataset, key: str, num_partitions: int) -> rd.Dataset:
    """Explicit hash bucketing on a key column: equal keys become
    CONTIGUOUS in the global row order (bucket column + sort — the
    portable exchange on this Ray version). NOTE: contiguity is in row
    order, not block boundaries — Ray's range partitioner may split a
    bucket across adjacent blocks, so per-key SINKS should use
    ``write_parquet(partition_cols=[key])`` (which handles keys spanning
    blocks) rather than assuming one-block-per-bucket; the bucketing's
    value is locality (a bucket's rows land in at most two adjacent
    blocks) for downstream merge-style consumers."""

    import zlib

    def bucket(batch: pa.Table) -> pa.Table:
        vals = batch.column(key).to_pylist()
        # crc32: stable across worker processes (Python's hash() is
        # per-process randomized and would split keys across partitions)
        h = np.fromiter(
            (zlib.crc32(str(v).encode()) % num_partitions for v in vals),
            dtype=np.int32, count=len(vals),
        )
        return batch.append_column("__bucket", pa.array(h))

    return ds.map_batches(bucket, batch_format="pyarrow").sort("__bucket")
