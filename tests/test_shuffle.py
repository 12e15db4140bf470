"""Salted two-phase aggregation and keyed repartition correctness."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def skewed_ds(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(3)
    # hot key: 80% of rows land on one source
    keys = np.where(rng.rand(20000) < 0.8, "hot", rng.choice(["a", "b", "c"], 20000))
    t = pa.table({
        "source": pa.array(keys.tolist(), type=pa.string()),
        "v": pa.array(rng.randint(0, 100, 20000), type=pa.int64()),
    })
    want = {}
    for k, v in zip(keys.tolist(), t.column("v").to_pylist()):
        want[k] = want.get(k, 0) + v
    return rd.from_arrow(t).repartition(8), want


def test_salted_groupby_sum(skewed_ds):
    from sbo_ray.stages.shuffle import salted_groupby_sum

    ds, want = skewed_ds
    got = salted_groupby_sum(ds, ["source"], "v", n_buckets=8).to_pandas()
    assert dict(zip(got["source"], got["v"])) == want


def test_repartition_by_key_colocates(skewed_ds):
    from sbo_ray.stages.shuffle import repartition_by_key

    ds, want = skewed_ds
    out = repartition_by_key(ds, "source", 4)
    # every key maps to exactly one bucket
    df = out.to_pandas()
    assert df.groupby("source")["__bucket"].nunique().max() == 1
    assert len(df) == 20000
