"""Count-min top-K vs exact top-K (the north-star approximate scale
path for heavy hitters)."""

import numpy as np
import pyarrow as pa
import pytest


def test_cms_estimates_upper_bound_and_tight():
    from sbo_ray.stages.sketch import CountMinSketch, _hash_keys

    rng = np.random.RandomState(0)
    keys = [f"k{i}" for i in range(500)]
    counts = rng.zipf(1.5, 500).astype(np.int64)
    cms = CountMinSketch(width=4096, depth=4)
    cms.add_many(_hash_keys(keys), counts)
    est = cms.estimate(_hash_keys(keys))
    assert (est >= counts).all()            # CMS never underestimates
    assert (est - counts).sum() < counts.sum() * 0.05  # and is tight here


def test_topk_count_min_matches_exact_on_paths(ray_session):
    import ray.data as rd

    from sbo_ray import synth
    from sbo_ray.config import JobConfig
    from sbo_ray.pipelines import logpipe
    from sbo_ray.stages.sketch import topk_count_min

    import tempfile

    doc_ids, lines, sources = synth.synth_lines(5000, seed=42)
    cfg = synth.source_config(12)
    table = synth.build_table(doc_ids, lines, sources)
    d = tempfile.mkdtemp()
    paths = synth.write_sharded(table, d, n_shards=4)
    job = JobConfig.from_format_map(cfg)
    enriched = logpipe.enriched_dataset(paths, job).map_batches(
        lambda t: t.filter(t.column("parse_ok")), batch_format="pyarrow"
    )
    approx = topk_count_min(enriched, "path", k=10).to_pandas()

    kc = logpipe.keyed_counters_dataset(logpipe.enriched_dataset(paths, job))
    df = kc.to_pandas()
    paths_counts = (
        df[df["dimension"] == "paths"].groupby("key_value")["cnt"].sum()
        .sort_values(ascending=False)
    )
    exact_top = set(paths_counts.head(10).index)
    # heavy hitters are recovered (allow boundary ties to differ)
    overlap = len(set(approx["key_value"]) & exact_top)
    assert overlap >= 8
    # estimates upper-bound the true counts
    for key, est in zip(approx["key_value"], approx["est_count"]):
        assert est >= paths_counts.get(key, 0)
