"""Monotonic fast path for compat mode (VERDICT r2 item 2).

The fast path finalizes order-insensitive groups from plain per-window
sums and replays only groups that reorder or carry zero-valued adds.
These tests pin (1) the function-level equivalence claim, (2) the
zero-value corner where plain sums are WRONG and eligibility must route
to replay, (3) engine-level fast == slow on chronological and OOO
inputs."""

import random

import numpy as np
import pandas as pd
import pytest

from sbo_ray import synth
from sbo_ray.config import JobConfig
from sbo_ray.pipelines import logpipe
from sbo_ray.stages.compat import metrics_dataset_compat, replay_group


def _replay(tws, vals, mode=False, window_size=3):
    n = len(tws)
    rows = pd.DataFrame({
        "source": ["s"] * n, "metric_type": [2] * n, "key_value": [""] * n,
        "time_window": tws, "value": vals,
        "arrival": [f"a{i:04d}" for i in range(n)],
    })
    out = replay_group(rows, window_size=window_size, replace_existing=mode)
    return dict(zip(out["time_window"], out["metric_value"]))


def _sums(tws, vals):
    acc = {}
    for t, v in zip(tws, vals):
        acc[t] = acc.get(t, 0) + v
    return acc


def test_monotone_positive_replay_equals_sums_property():
    """The fast-path claim at the accumulator level: any non-decreasing
    window sequence with all values >= 1 replays to the plain sums, in
    BOTH sink-merge policies (random search over 300 sequences)."""
    rng = random.Random(11)
    for trial in range(300):
        n = rng.randint(1, 25)
        tws = sorted(rng.randint(1, 8) for _ in range(n))
        vals = [rng.randint(1, 100) for _ in range(n)]
        want = _sums(tws, vals)
        assert _replay(tws, vals, False) == want, (tws, vals)
        assert _replay(tws, vals, True) == want, (tws, vals)


def test_run_replay_equals_raw_replay_on_arbitrary_sequences():
    """The run-statistics replay engine (_replay_runs) must equal the
    raw per-add replay (replay_group) on ARBITRARY sequences — zeros,
    reorders, duplicate windows — because the run encoding only
    compresses adds taken by the pure-accumulate branch. 400 random
    sequences x both sink policies."""
    import numpy as np

    from sbo_ray.stages.compat import _replay_runs

    rng = random.Random(7)
    for trial in range(400):
        n = rng.randint(1, 30)
        tws = [rng.randint(1, 6) for _ in range(n)]
        vals = [rng.choice([0, 0, 1, 3, 10]) for _ in range(n)]
        # compress into consecutive same-tw runs, like compat_partial
        runs = []
        i = 0
        while i < n:
            j = i
            while j < n and tws[j] == tws[i]:
                j += 1
            seg = vals[i:j]
            lead = 0
            while lead < len(seg) and seg[lead] < 1:
                lead += 1
            runs.append({
                "source": "s", "metric_type": 2, "key_value": "",
                "time_window": tws[i], "value": sum(seg),
                "n_adds": len(seg), "lead_zeros": lead,
                "first_nz": seg[lead] if lead < len(seg) else 0,
            })
            i = j
        for mode in (False, True):
            want = _replay(tws, vals, mode)
            got_df = _replay_runs(pd.DataFrame(runs), window_size=3,
                                  replace_existing=mode)
            got = dict(zip(got_df["time_window"].astype(int),
                           got_df["metric_value"].astype(int)))
            assert got == want, (tws, vals, mode, got, want)


def test_zero_value_monotone_sequence_can_diverge_from_sums():
    """Why eligibility requires values >= 1 even for monotone input: 3
    leading zero adds re-run the insertion path (Values[tw] < 1,
    SBOMetrics.go:188), fill the key buffer with duplicates, and the
    4th (nonzero) add is LATE-DROPPED. Plain sums would report 500."""
    tws = [7, 7, 7, 7]
    vals = [0, 0, 0, 500]
    assert _sums(tws, vals) == {7: 500}
    assert _replay(tws, vals) == {7: 0}


def _mk_input(tmp_path, lines, n_shards=2):
    n = len(lines)
    doc_ids = [f"d{i:06d}" for i in range(n)]
    sources = ["web-00"] * n
    table = synth.build_table(doc_ids, lines, sources)
    paths = synth.write_sharded(table, str(tmp_path), n_shards=n_shards)
    job = JobConfig.from_format_map(synth.source_config(1))
    return paths, job


def _compat_map(enriched, fast):
    got = metrics_dataset_compat(enriched, window_size=3, fast=fast).to_pandas()
    return {
        (r.source, int(r.metric_type), r.key_value, int(r.time_window)):
            int(r.metric_value)
        for r in got.itertuples()
    }


def test_engine_zero_byte_corner_matches_slow_path(ray_session, tmp_path):
    """Engine-level zero-value corner: one window with 3 zero-byte
    requests then a 500-byte one. The faithful result drops the 500
    (BYTES_SENT total 0); the fast path must detect min_val < 1 and
    replay, NOT sum."""
    base = '1.1.1.{i} - - [10/Oct/2024:13:0{m}:00 +0000] "GET /a HTTP/1.0" 200 {b}'
    lines = [
        base.format(i=1, m=1, b=0),
        base.format(i=2, m=2, b=0),
        base.format(i=3, m=3, b=0),
        base.format(i=4, m=4, b=500),
    ]
    paths, job = _mk_input(tmp_path, lines, n_shards=1)
    fast = _compat_map(logpipe.enriched_dataset(paths, job), fast=True)
    slow = _compat_map(logpipe.enriched_dataset(paths, job), fast=False)
    assert fast == slow
    # METRIC_BYTES_SENT == 2: the dropped add really is dropped
    bytes_rows = {k: v for k, v in fast.items() if k[1] == 2}
    assert sum(bytes_rows.values()) == 0
    # and REQ_COUNT (always value 1) still sums exactly
    req_rows = {k: v for k, v in fast.items() if k[1] == 1}
    assert sum(req_rows.values()) == 4


def test_engine_fast_equals_slow_chronological(ray_session, tmp_path):
    doc_ids, lines, sources = synth.synth_lines(1200, seed=91, n_sources=4)
    table = synth.build_table(doc_ids, lines, sources)
    paths = synth.write_sharded(table, str(tmp_path), n_shards=3)
    job = JobConfig.from_format_map(synth.source_config(4))
    fast = _compat_map(logpipe.enriched_dataset(paths, job), fast=True)
    slow = _compat_map(logpipe.enriched_dataset(paths, job), fast=False)
    assert fast == slow and len(fast) > 50


def test_engine_fast_equals_slow_ooo(ray_session, tmp_path):
    """Adversarial OOO: 15% of rows pushed into the past — the affected
    groups must take the replay branch and still match bit-for-bit."""
    doc_ids, lines, sources = synth.synth_lines(1200, seed=92, n_sources=4,
                                                ooo_frac=0.15)
    table = synth.build_table(doc_ids, lines, sources)
    paths = synth.write_sharded(table, str(tmp_path), n_shards=3)
    job = JobConfig.from_format_map(synth.source_config(4))
    fast = _compat_map(logpipe.enriched_dataset(paths, job), fast=True)
    slow = _compat_map(logpipe.enriched_dataset(paths, job), fast=False)
    assert fast == slow

    # the OOO input must actually diverge from exact sums somewhere,
    # or this test proves nothing
    exact = logpipe.metrics_dataset(logpipe.enriched_dataset(paths, job)).to_pandas()
    exact_map = {
        (r.source, int(r.metric_type), r.key_value, int(r.time_window)):
            int(r.metric_value)
        for r in exact.itertuples()
    }
    assert fast != exact_map


def test_engine_fast_equals_slow_replace_mode(ray_session, tmp_path):
    doc_ids, lines, sources = synth.synth_lines(800, seed=93, n_sources=3,
                                                ooo_frac=0.15)
    table = synth.build_table(doc_ids, lines, sources)
    paths = synth.write_sharded(table, str(tmp_path), n_shards=2)
    job = JobConfig.from_format_map(synth.source_config(3))

    def m(fast):
        got = metrics_dataset_compat(
            logpipe.enriched_dataset(paths, job), window_size=3,
            replace_existing=True, fast=fast).to_pandas()
        return {
            (r.source, int(r.metric_type), r.key_value, int(r.time_window)):
                int(r.metric_value)
            for r in got.itertuples()
        }

    assert m(True) == m(False)


def test_shard_combine_exchange_equals_replay(ray_session):
    """The two-phase hash exchange (shard by group-key hash -> combine
    classifies + sums + run-replays per partition) must reproduce the
    faithful per-group replay exactly: 60 groups of arbitrary OOO and
    zero-valued sequences, scattered across 4 partial blocks so every
    group spans multiple shard tasks, P=3 so partitions hold many
    groups. Both sink policies."""
    import pyarrow as pa
    import ray

    from sbo_ray.stages import compat

    rng = random.Random(23)
    seqs = {}
    for g in range(60):
        n = rng.randint(1, 20)
        tws = [rng.randint(1, 6) for _ in range(n)]
        vals = [rng.choice([0, 0, 1, 3, 10]) for _ in range(n)]
        seqs[(f"s{g % 7}", g % 3, f"k{g}")] = (tws, vals)

    # long-format ordered rows, arrival = global sequence, round-robin
    # split into 4 "blocks" BY CONTIGUOUS ARRIVAL RANGES per group (the
    # pipeline's real layout: blocks are shard slices, arrivals within
    # a group never interleave across blocks)
    rows = []
    arrival = 0
    for (src_, mt, kv), (tws, vals) in seqs.items():
        for tw, v in zip(tws, vals):
            rows.append((src_, mt, kv, tw, v, f"a{arrival:06d}"))
            arrival += 1
    blocks = []
    per = (len(rows) + 3) // 4
    for b in range(4):
        chunk = rows[b * per:(b + 1) * per]
        if not chunk:
            continue
        blocks.append(pa.Table.from_arrays(
            [pa.array([r[i] for r in chunk], type=t)
             for i, t in enumerate([pa.string(), pa.int32(), pa.string(),
                                    pa.int64(), pa.int64(), pa.string()])],
            schema=compat.ORDERED_SCHEMA))

    for mode in (False, True):
        want = {}
        for (src_, mt, kv), (tws, vals) in seqs.items():
            n = len(tws)
            gdf = pd.DataFrame({
                "source": [src_] * n, "metric_type": [mt] * n,
                "key_value": [kv] * n, "time_window": tws, "value": vals,
                "arrival": [f"a{i:04d}" for i in range(n)],
            })
            out = compat.replay_group(gdf, 3, mode)
            for r in out.itertuples():
                want[(src_, mt, kv, int(r.time_window))] = int(r.metric_value)

        P = 3
        partials = [compat.compat_partial(b) for b in blocks]
        shard = ray.remote(compat._compat_shard)
        shard_refs = [shard.options(num_returns=P).remote(ray.put(t), P)
                      for t in partials]
        combine = ray.remote(compat._compat_combine)
        outs = [combine.options(num_returns=2).remote(
            3, mode, *[sr[p] for sr in shard_refs]) for p in range(P)]
        got = {}
        overlap = set()
        for tref, kref in outs:
            t = ray.get(tref)
            for r in t.to_pandas().itertuples():
                got[(r.source, int(r.metric_type), r.key_value,
                     int(r.time_window))] = int(r.metric_value)
            overlap.update(ray.get(kref))
        assert not overlap  # contiguous arrival blocks never overlap
        assert got == want
