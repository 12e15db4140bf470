"""Single-pass flagship pipeline == oracle (all sinks from one read)."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from sbo_ray import synth
from sbo_ray.config import JobConfig
from sbo_ray.oracle.pipeline import run_oracle
from sbo_ray.pipelines import logpipe

N_ROWS = 3000
SEED = 33


@pytest.fixture(scope="module")
def everything(ray_session, tmp_path_factory):
    doc_ids, lines, sources = synth.synth_lines(N_ROWS, seed=SEED)
    cfg = synth.source_config(12)
    table = synth.build_table(doc_ids, lines, sources)
    in_dir = tmp_path_factory.mktemp("fp_input")
    out_dir = tmp_path_factory.mktemp("fp_out")
    paths = synth.write_sharded(table, str(in_dir), n_shards=3)
    job = JobConfig.from_format_map(cfg)
    result = logpipe.full_pipeline(paths, job, str(out_dir))
    oracle = run_oracle(doc_ids, lines, sources, cfg, exact_totals=True)
    return result, oracle, str(out_dir), dict(zip(doc_ids, lines))


def test_metrics_match(everything):
    result, oracle, _, _ = everything
    got = result["metrics"].to_pandas().sort_values(
        ["source", "metric_type", "key_value", "time_window"]).reset_index(drop=True)
    want = pd.DataFrame(
        oracle.metrics,
        columns=["source", "metric_type", "key_value", "time_window", "metric_value"],
    ).sort_values(["source", "metric_type", "key_value", "time_window"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_counters_match(everything):
    result, oracle, _, _ = everything
    got = result["keyed_counters"].to_pandas()
    for dim, want_counts in oracle.keyed_counters.items():
        sub = got[got["dimension"] == dim]
        assert dict(zip(zip(sub["source"], sub["key_value"]), sub["cnt"])) == want_counts
    g = result["global_counters"]
    assert g["requests"] == oracle.counters["requests"]
    assert g["bytes_sent"] == oracle.counters["bytes_sent"]
    assert g["parse_errors"] == oracle.parse_errors


def test_routed_fragments_match(everything):
    result, oracle, out_dir, by_id = everything
    files = glob.glob(os.path.join(out_dir, "routed", "*.parquet"))
    assert files
    rows = [pq.read_table(f).to_pandas() for f in files]
    got = pd.concat(rows).sort_values("doc_id").reset_index(drop=True)
    want = pd.DataFrame(oracle.routed).sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want)
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["request_uri"]) == list(want["request_uri"])
    assert list(got["ua_family"]) == list(want["ua_family"])
    # token invariant on the routed fragments
    for _, row in got.head(50).iterrows():
        assert bytes(int(t) for t in row["tokens"]).decode() == by_id[row["doc_id"]]


def test_rerun_overwrites_fragments_not_duplicates(ray_session, tmp_path):
    """Task-retry idempotency: running the same pipeline twice into one
    output dir rewrites the same content-named fragments instead of
    appending duplicates (at-least-once side effects made idempotent)."""
    doc_ids, lines, sources = synth.synth_lines(1000, seed=66)
    cfg = synth.source_config(12)
    table = synth.build_table(doc_ids, lines, sources)
    paths = synth.write_sharded(table, str(tmp_path / "in"), n_shards=2)
    job = JobConfig.from_format_map(cfg)
    out = str(tmp_path / "out")
    r1 = logpipe.full_pipeline(paths, job, out)
    files1 = sorted(glob.glob(os.path.join(out, "routed", "*.parquet")))
    rows1 = sum(pq.ParquetFile(f).metadata.num_rows for f in files1)
    r2 = logpipe.full_pipeline(paths, job, out)
    files2 = sorted(glob.glob(os.path.join(out, "routed", "*.parquet")))
    rows2 = sum(pq.ParquetFile(f).metadata.num_rows for f in files2)
    assert files1 == files2
    assert rows1 == rows2
