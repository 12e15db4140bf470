"""Broadcast semi/anti joins + HLL approximate distinct."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def ds(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(1)
    t = pa.table({
        "k": pa.array([f"key{int(i)}" for i in rng.randint(0, 5000, 40000)]),
        "v": pa.array(np.arange(40000, dtype=np.int64)),
    })
    return rd.from_arrow(t).repartition(8), t


def test_semi_anti_join(ds):
    from sbo_ray.stages.joins import anti_join, semi_join

    d, t = ds
    keys = {"key1", "key2", "key3"}
    n_in = sum(1 for k in t.column("k").to_pylist() if k in keys)
    assert semi_join(d, "k", keys).count() == n_in
    assert anti_join(d, "k", keys).count() == 40000 - n_in


def test_broadcast_lookup(ds):
    from sbo_ray.stages.joins import broadcast_lookup

    d, t = ds
    mapping = {f"key{i}": f"grp{i % 7}" for i in range(5000)}
    out = broadcast_lookup(d, "k", mapping, "grp", default="none")
    df = out.to_pandas()
    sample = df.sample(100, random_state=0)
    for _, r in sample.iterrows():
        assert r["grp"] == mapping.get(r["k"], "none")


def test_hll_accuracy_and_merge(ds):
    from sbo_ray.stages.hll import HyperLogLog, approx_distinct, _hash_strings

    d, t = ds
    exact = len(set(t.column("k").to_pylist()))
    est = approx_distinct(d, "k", p=12)
    assert abs(est - exact) / exact < 0.05  # HLL std error ~1.04/sqrt(4096)

    # merge(a,b) == add(a+b)
    a, b, ab = HyperLogLog(10), HyperLogLog(10), HyperLogLog(10)
    xs = [f"x{i}" for i in range(3000)]
    ys = [f"y{i}" for i in range(3000)]
    a.add_hashes(_hash_strings(xs))
    b.add_hashes(_hash_strings(ys))
    ab.add_hashes(_hash_strings(xs + ys))
    a.merge(b)
    assert a.estimate() == ab.estimate()


def test_hll_distinct_clients_query_accuracy(ray_session):
    from sbo_ray.pipelines.queries import (
        q_log_distinct_clients,
        q_log_distinct_clients_hll,
    )

    SF = "/root/testdata/sf0.001"
    est = q_log_distinct_clients_hll(SF).to_pandas().set_index("source")
    exact = q_log_distinct_clients(SF)
    exact = (exact.to_pandas() if hasattr(exact, "to_pandas") else exact
             ).set_index("source")
    j = est.join(exact)
    rel = (j["n_clients_est"] - j["n_clients"]).abs() / j["n_clients"]
    assert rel.max() <= 0.05  # p=12 -> ~1.6% std err
