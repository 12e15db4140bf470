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


def test_replace_vs_add_sink_policy():
    """A3 sink merge policies (db/mysqldb.go:147-151).

    Analysis (verified by exhaustive search over the accumulator): an
    evicted window can never be *re-created* by later arrivals — the Go
    keys array keeps the evicted window as its floor, so any late equal
    or older arrival is dropped (SBOMetrics.go:192-196). The only double
    emission path is the ``Values[tw] < 1`` quirk (SBOMetrics.go:188): a
    stored 0 (possible for BYTES_SENT) is treated as absent, duplicating
    the window in ``keys`` — only then do add-merge and replace differ.
    """
    import pandas as pd

    from sbo_ray.stages.compat import replay_group

    def run(tws, vals, mode):
        n = len(tws)
        rows = pd.DataFrame({
            "source": ["s"] * n, "metric_type": [2] * n, "key_value": [""] * n,
            "time_window": tws, "value": vals,
            "arrival": [f"a{i:03d}" for i in range(n)],
        })
        out = replay_group(rows, window_size=3, replace_existing=mode)
        return dict(zip(out["time_window"], out["metric_value"]))

    # the zero-value corner (found by search): window 3 stored as 0,
    # re-inserted, emitted twice
    tws = [3, 2, 3, 4, 3, 5, 2, 2]
    vals = [0, 1, 1, 0, 0, 5, 0, 0]
    assert run(tws, vals, False) == {2: 1, 3: 1, 4: 0, 5: 5}
    assert run(tws, vals, True) == {2: 1, 3: 0, 4: 0, 5: 5}

    # ordinary positive-valued sequences: the two policies coincide
    tws2 = [1, 2, 3, 4, 2, 2]
    vals2 = [10, 20, 30, 40, 5, 6]
    assert run(tws2, vals2, False) == run(tws2, vals2, True)


def test_metrics_json_dump():
    import pyarrow as pa

    from sbo_ray.report import metrics_json_dump

    t = pa.table({
        "source": ["s", "s"], "metric_type": [1, 3],
        "key_value": ["", "200"], "time_window": [202501011200, 202501011200],
        "metric_value": [5, 3],
    })
    import json

    d = json.loads(metrics_json_dump(t))
    assert d["s"]["1"][""]["202501011200"] == 5
    assert d["s"]["3"]["200"]["202501011200"] == 3
