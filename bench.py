"""Benchmark harness for the sbo-ray engine.

Runs the headline pipelines over the synthetic token table scaled to
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and
prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "rows": N,
     "rows_per_sec": N}

``--scaling`` runs the headline pipeline in fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same (pre-warmed) input and reports
both throughputs + scaling efficiency (the sandbox stand-in for the
north rule's N-vs-4N-node criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # synthesize/caches BEFORE timing (also warms the page cache)
    from sbo_ray.oracle import materialize

    cache = materialize.cache_dir_for(sf_dir)

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from sbo_ray.pipelines import queries as Q

    input_paths = Q._input_paths(sf_dir)
    import pyarrow.parquet as pq

    n_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in input_paths)
    # warm read (untimed): one pass over the input
    import ray.data as rd

    rd.read_parquet(input_paths).count()

    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    out_root = f"/tmp/sbo_bench_out_{os.getpid()}"

    timed("metrics", lambda: Q.q_log_metrics(sf_dir).write_parquet(
        os.path.join(out_root, "metrics")))
    timed("routed", lambda: Q.q_log_routed(sf_dir).write_parquet(
        os.path.join(out_root, "routed")))
    timed("keyed_counters", lambda: Q.q_log_keyed_counters(sf_dir).count())
    timed("global_counters", lambda: Q.q_log_global_counters(sf_dir))
    timed("top_paths", lambda: Q.q_log_top_paths(sf_dir))

    try:
        from sbo_ray.pipelines import dataqueries as DQ

        for name, fn in DQ.bench_queries().items():
            timed(name, lambda fn=fn: fn(sf_dir))
    except ImportError:
        pass

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "sbo-ray end-to-end parse->enrich->aggregate+route, synthetic token table",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "rows": n_rows,
        "rows_per_sec": round(n_rows * max(1, len([k for k in ("metrics", "routed") if k in timings])) / max(total, 1e-9)),
        "input_cache": cache,
    }
    ray.shutdown()
    import shutil

    shutil.rmtree(out_root, ignore_errors=True)
    return result


def run_scaling() -> dict:
    """Same job at two parallelism levels in fresh processes."""
    lo, hi = int(os.environ.get("SBO_SCALE_LO", "8")), int(os.environ.get("SBO_SCALE_HI", "32"))

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    r_lo = one(lo)  # first run also warms the synth cache for both
    r_hi = one(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling efficiency (fresh-process num_cpus levels, same input)",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "rows": r_lo["rows"],
        "scaling_efficiency": round(eff, 3),
        "queries_lo": r_lo["queries"],
        "queries_hi": r_hi["queries"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
