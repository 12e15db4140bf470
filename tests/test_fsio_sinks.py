"""Cluster-real sinks (VERDICT r2 item 1): the routed/metrics sinks
accept fsspec URIs. End-to-end via a ``file://`` URI (visible across Ray
worker processes, but exercising the URI code path), plus driver-side
``memory://`` unit tests of the fragment helpers (memory:// state is
per-process, so it cannot be used across workers — documented in
sbo_ray/fsio.py)."""

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sbo_ray import fsio, synth
from sbo_ray.config import JobConfig
from sbo_ray.pipelines import logpipe

N_ROWS = 1500
SEED = 77


@pytest.fixture(scope="module")
def uri_run(ray_session, tmp_path_factory):
    doc_ids, lines, sources = synth.synth_lines(N_ROWS, seed=SEED)
    cfg = synth.source_config(6)
    table = synth.build_table(doc_ids, lines, sources)
    in_dir = tmp_path_factory.mktemp("fsio_in")
    out_local = tmp_path_factory.mktemp("fsio_out_local")
    out_uri_dir = tmp_path_factory.mktemp("fsio_out_uri")
    paths = synth.write_sharded(table, str(in_dir), n_shards=2)
    job = JobConfig.from_format_map(cfg)
    res_local = logpipe.full_pipeline(paths, job, str(out_local))
    res_uri = logpipe.full_pipeline(paths, job, f"file://{out_uri_dir}")
    return res_local, res_uri, str(out_local), str(out_uri_dir)


def _sorted_metrics(res):
    return res["metrics"].to_pandas().sort_values(
        ["source", "metric_type", "key_value", "time_window"]
    ).reset_index(drop=True)


def test_uri_run_matches_local(uri_run):
    res_local, res_uri, _, _ = uri_run
    pd.testing.assert_frame_equal(_sorted_metrics(res_local), _sorted_metrics(res_uri))
    assert res_local["global_counters"] == res_uri["global_counters"]


def test_uri_routed_fragments_match_local(uri_run):
    _, _, out_local, out_uri_dir = uri_run

    def routed(d):
        files = sorted(glob.glob(os.path.join(d, "routed", "part-*.parquet")))
        assert files, d
        return pd.concat([pq.read_table(f).to_pandas() for f in files]).sort_values(
            "doc_id").reset_index(drop=True)

    a, b = routed(out_local), routed(out_uri_dir)
    assert len(a) == len(b)
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert list(a["request_uri"]) == list(b["request_uri"])
    # metrics parquet landed through the URI path too
    m = pq.read_table(os.path.join(out_uri_dir, "metrics", "metrics.parquet"))
    assert m.num_rows == len(_sorted_metrics({"metrics": m}))


def test_uri_rerun_clears_stale_fragments(uri_run, tmp_path):
    """A reused out_dir with a leftover fragment must not mix it in."""
    _, _, _, out_uri_dir = uri_run
    routed = os.path.join(out_uri_dir, "routed")
    stale = os.path.join(routed, "part-deadbeef.parquet")
    pq.write_table(pa.table({"doc_id": ["zzz"]}), stale)
    n = fsio.clear_fragments(f"file://{routed}")
    assert n >= 1 and not os.path.exists(stale)


# ---- driver-side memory:// unit tests -------------------------------------


def test_memory_fs_fragment_roundtrip():
    d = "memory://sbo-test/routed"
    fsio.makedirs(d)
    t = pa.table({"a": pa.array([1, 2, 3], type=pa.int64())})
    fsio.write_fragment(d, "part-0001.parquet", t)
    # idempotent rewrite (retried task): same name, new content, no dup
    t2 = pa.table({"a": pa.array([9], type=pa.int64())})
    fsio.write_fragment(d, "part-0001.parquet", t2)
    fs, root = fsio.resolve(d)
    files = [f for f in fs.ls(root, detail=False)
             if str(f).rsplit("/", 1)[-1].startswith("part-")]
    assert len(files) == 1
    with fs.open(files[0], "rb") as f:
        assert pq.read_table(f).column("a").to_pylist() == [9]
    assert fsio.clear_fragments(d) == 1
    assert fsio.clear_fragments(d) == 0


def test_memory_fs_write_table():
    d = "memory://sbo-test/metrics"
    t = pa.table({"m": pa.array([5], type=pa.int64())})
    fsio.write_table(d, "metrics.parquet", t)
    fs, root = fsio.resolve(d)
    with fs.open(root + "/metrics.parquet", "rb") as f:
        assert pq.read_table(f).column("m").to_pylist() == [5]


def test_clear_fragments_missing_dir_is_noop():
    assert fsio.clear_fragments("memory://sbo-test/never-made") == 0


def test_checkpointed_pipeline_on_uri(ray_session, tmp_path_factory):
    """The whole resumable flagship (manifest + run partials + routed
    fragments) over a file:// URI out_dir, including resume."""
    from sbo_ray.state.lineage import CheckpointedPipeline

    doc_ids, lines, sources = synth.synth_lines(900, seed=13)
    table = synth.build_table(doc_ids, lines, sources)
    in_dir = tmp_path_factory.mktemp("ckpt_uri_in")
    out_dir = tmp_path_factory.mktemp("ckpt_uri_out")
    paths = synth.write_sharded(table, str(in_dir), n_shards=4)
    job = JobConfig.from_format_map(synth.source_config(12))
    uri = f"file://{out_dir}"
    cp = CheckpointedPipeline(paths, job, uri, group_size=2)
    assert cp.run_once()          # first group committed
    assert len(cp.pending_shards()) == 2
    # a NEW pipeline over the same URI resumes from the manifest
    cp2 = CheckpointedPipeline(paths, job, uri, group_size=2)
    assert len(cp2.pending_shards()) == 2
    cp2.run_all()
    assert cp2.pending_shards() == []
    final = cp2.finalize()
    total = int(pd.Series(
        final["metrics"].to_pandas().query("metric_type == 1")["metric_value"]
    ).sum())
    assert total == final["global_counters"]["requests"] > 0
    assert len(cp2.routed_files()) > 0


def test_manifest_on_memory_fs_torn_tail():
    """Non-local manifests (no append/truncate) re-PUT valid bytes +
    new records; a torn tail is skipped on read and repaired away by the
    next commit."""
    from sbo_ray.state.lineage import CheckpointManifest, CommitRecord

    d = "memory://sbo-test/manifest-dir"
    m = CheckpointManifest(d)
    m.commit([CommitRecord(shard="s1", run_id="r1", rows_in=5,
                           row_range=[0, 4], stage_hash="h")])
    fs, root = fsio.resolve(m.path)
    with fs.open(root, "rb") as f:
        good = f.read()
    with fs.open(root, "wb") as f:
        f.write(good + b'{"shard": "s2", "run_')   # torn append
    assert set(m.committed_shards()) == {"s1"}
    m.commit([CommitRecord(shard="s3", run_id="r3", rows_in=1,
                           row_range=[0, 0], stage_hash="h")])
    assert set(m.committed_shards()) == {"s1", "s3"}
