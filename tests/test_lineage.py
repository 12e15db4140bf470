"""Checkpoint/resume: killed run resumes from last committed partition
without recount drift (north-rule criterion)."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from sbo_ray import synth
from sbo_ray.config import JobConfig
from sbo_ray.oracle.pipeline import run_oracle
from sbo_ray.state.lineage import CheckpointedPipeline, CheckpointManifest

N_ROWS = 3000
SEED = 77


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    doc_ids, lines, sources = synth.synth_lines(N_ROWS, seed=SEED)
    cfg = synth.source_config(12)
    table = synth.build_table(doc_ids, lines, sources)
    in_dir = tmp_path_factory.mktemp("ckpt_in")
    paths = synth.write_sharded(table, str(in_dir), n_shards=6)
    job = JobConfig.from_format_map(cfg)
    oracle = run_oracle(doc_ids, lines, sources, cfg, exact_totals=True)
    return paths, job, oracle, tmp_path_factory


def _metrics_df(t):
    return (t.to_pandas()
            .sort_values(["source", "metric_type", "key_value", "time_window"])
            .reset_index(drop=True))


def test_resume_without_recount_drift(setup):
    paths, job, oracle, tmp = setup
    out = str(tmp.mktemp("ckpt_out"))
    cp = CheckpointedPipeline(paths, job, out, group_size=2)

    # phase 1: two groups, then "the job is killed"
    assert cp.run_once() is True
    assert cp.run_once() is True
    committed_after_kill = set(cp.manifest.committed_shards())
    assert len(committed_after_kill) == 4

    # phase 2: a NEW process resumes from the manifest
    cp2 = CheckpointedPipeline(paths, job, out, group_size=2)
    assert set(cp2.manifest.committed_shards()) == committed_after_kill
    assert len(cp2.pending_shards()) == 2
    cp2.run_all()
    assert cp2.pending_shards() == []

    final = cp2.finalize()
    want = pd.DataFrame(
        oracle.metrics,
        columns=["source", "metric_type", "key_value", "time_window", "metric_value"],
    ).sort_values(["source", "metric_type", "key_value", "time_window"]).reset_index(drop=True)
    got = _metrics_df(final["metrics"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert final["global_counters"]["requests"] == oracle.counters["requests"]
    assert final["global_counters"]["parse_errors"] == oracle.parse_errors

    # routed rows: every committed run contributes exactly once
    routed_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in cp2.routed_files())
    assert routed_rows == len(oracle.routed)

    # rerunning a completed job is a no-op and does not drift anything
    cp3 = CheckpointedPipeline(paths, job, out, group_size=2)
    assert cp3.run_once() is False
    again = cp3.finalize()
    pd.testing.assert_frame_equal(_metrics_df(again["metrics"]), want, check_dtype=False)


def test_manifest_lineage_and_prometheus(setup):
    paths, job, oracle, tmp = setup
    out = str(tmp.mktemp("ckpt_out2"))
    cp = CheckpointedPipeline(paths, job, out, group_size=3)
    cp.run_all()
    recs = cp.manifest.committed_shards()
    assert set(recs) == set(paths)
    for rec in recs.values():
        assert rec.stage_hash == cp.stage_hash
        assert rec.rows_in > 0
        assert rec.row_range[1] == rec.rows_in - 1
    total = cp.manifest.counters_total()
    assert total["rows_in"] == N_ROWS
    assert total["parse_errors"] == oracle.parse_errors
    text = cp.manifest.prometheus_text()
    assert "sbo_ray_rows_in_total" in text
    assert f"sbo_ray_parse_errors_total {oracle.parse_errors}" in text


def test_config_change_changes_stage_hash(setup):
    paths, job, oracle, tmp = setup
    out = str(tmp.mktemp("ckpt_out3"))
    cp = CheckpointedPipeline(paths, job, out, group_size=3)
    job2 = JobConfig.from_format_map(synth.source_config(12),
                                     time_window_minutes=30)
    cp2 = CheckpointedPipeline(paths, job2, out, group_size=3)
    assert cp.stage_hash != cp2.stage_hash


def test_follow_mode_incremental_shards(setup):
    """New shards appearing after the first run are picked up by
    refresh() and the final aggregates equal the full-input oracle
    (the follow-mode/log-rotation analog, SURVEY.md §2.1 S3)."""
    import shutil

    paths, job, oracle, tmp = setup
    in2 = str(tmp.mktemp("follow_in"))
    out = str(tmp.mktemp("follow_out"))
    # wave 1: first 3 shards
    for p in paths[:3]:
        shutil.copy(p, in2)
    cp = CheckpointedPipeline(os.path.join(in2, "*.parquet"), job, out,
                              group_size=2)
    cp.run_all()
    assert len(cp.manifest.committed_shards()) == 3
    # wave 2: remaining shards "arrive"
    for p in paths[3:]:
        shutil.copy(p, in2)
    assert cp.refresh() == len(paths) - 3
    cp.run_all()
    assert len(cp.manifest.committed_shards()) == len(paths)
    final = cp.finalize()
    want = pd.DataFrame(
        oracle.metrics,
        columns=["source", "metric_type", "key_value", "time_window", "metric_value"],
    ).sort_values(["source", "metric_type", "key_value", "time_window"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(_metrics_df(final["metrics"]), want,
                                  check_dtype=False)


def test_torn_trailing_manifest_line_is_skipped(tmp_path):
    """A crash mid-append may tear the FINAL record; resume must treat it
    as uncommitted instead of raising."""
    import json

    from sbo_ray.state.lineage import CheckpointManifest, CommitRecord

    m = CheckpointManifest(str(tmp_path))
    rec = CommitRecord(shard="s1", run_id="r1", rows_in=5, row_range=[0, 4],
                       stage_hash="h")
    m.commit([rec])
    with open(m.path, "a") as f:
        f.write('{"shard": "s2", "run_id": "r2", "rows_')  # torn append
    got = m.committed_shards()
    assert set(got) == {"s1"}
    # the read SKIPS the torn tail (side-effect-free); the WRITER
    # (commit()) truncates it before appending so torn bytes never end
    # up mid-file
    rec3 = CommitRecord(shard="s3", run_id="r3", rows_in=1, row_range=[0, 0],
                        stage_hash="h")
    m.commit([rec3])
    assert set(m.committed_shards()) == {"s1", "s3"}
    # torn bytes that end up mid-file WITHOUT a repairing read in between
    # are real corruption -> raise
    with open(m.path, "a") as f:
        f.write('{"shard": "s4", "run_id"')
        f.write("\n" + json.dumps({"shard": "s5", "run_id": "r5", "rows_in": 1,
                                    "row_range": [0, 0],
                                    "stage_hash": "h"}) + "\n")
    try:
        m.committed_shards()
        raised = False
    except Exception:
        raised = True
    assert raised
