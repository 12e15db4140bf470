"""Compat mode: the engine reproduces the reference's bounded-window
eviction + late-drop semantics on OUT-OF-ORDER input (SURVEY.md §2.6 A2),
matching the faithful oracle's add-merge sink totals exactly."""

from collections import defaultdict

import pandas as pd
import pytest

from sbo_ray import synth
from sbo_ray.config import JobConfig
from sbo_ray.oracle.pipeline import run_oracle
from sbo_ray.pipelines import logpipe
from sbo_ray.stages.compat import metrics_dataset_compat

N_ROWS = 2500
SEED = 55


@pytest.fixture(scope="module")
def ooo_data(ray_session, tmp_path_factory):
    # 10% of rows pushed 5-90 minutes into the past: beyond the 3-window
    # reorder tolerance, so late drops DO occur
    doc_ids, lines, sources = synth.synth_lines(N_ROWS, seed=SEED, ooo_frac=0.10)
    cfg = synth.source_config(12)
    table = synth.build_table(doc_ids, lines, sources)
    d = tmp_path_factory.mktemp("ooo_in")
    paths = synth.write_sharded(table, str(d), n_shards=3)
    job = JobConfig.from_format_map(cfg)
    return doc_ids, lines, sources, cfg, paths, job


def _agg(metrics):
    acc = defaultdict(int)
    for s, t, k, tw, v in metrics:
        acc[(s, t, k, tw)] += v
    return dict(acc)


def test_compat_matches_faithful_oracle_on_ooo_input(ooo_data):
    doc_ids, lines, sources, cfg, paths, job = ooo_data
    faithful = run_oracle(doc_ids, lines, sources, cfg, exact_totals=False)
    exact = run_oracle(doc_ids, lines, sources, cfg, exact_totals=True)
    assert faithful.dropped_late > 0  # OOO input actually drops data
    assert _agg(faithful.metrics) != _agg(exact.metrics)

    enriched = logpipe.enriched_dataset(paths, job)
    got = metrics_dataset_compat(enriched, window_size=3).to_pandas()
    got_map = {
        (r.source, int(r.metric_type), r.key_value, int(r.time_window)): int(r.metric_value)
        for r in got.itertuples()
    }
    assert got_map == _agg(faithful.metrics)


def test_default_mode_still_exact_on_ooo_input(ooo_data):
    doc_ids, lines, sources, cfg, paths, job = ooo_data
    exact = run_oracle(doc_ids, lines, sources, cfg, exact_totals=True)
    enriched = logpipe.enriched_dataset(paths, job)
    got = logpipe.metrics_dataset(enriched).to_pandas()
    got_map = {
        (r.source, int(r.metric_type), r.key_value, int(r.time_window)): int(r.metric_value)
        for r in got.itertuples()
    }
    assert got_map == _agg(exact.metrics)
