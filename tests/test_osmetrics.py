"""OS metrics parser goldens, ported from the reference's own tests
(metrics/os_metrics_test.go) plus the Sscanf-swap quirk."""

import pytest

from sbo_ray.functions.osmetrics import (
    MemoryInfo,
    os_metrics_row,
    parse_free_output,
    parse_uptime_output,
)


def test_uptime_macos_golden():
    info = parse_uptime_output(
        "12:13  up 13 days, 13:27, 11 users, load averages: 1.25 1.50 1.52"
    )
    assert info.current_time == "12:13"
    assert info.load_average1 == "1.25"
    assert info.load_average5 == "1.50"
    assert info.load_average15 == "1.52"
    assert info.up_duration_minutes == 13 * 24 * 60 + 13 * 60 + 27
    assert info.users == 11


def test_uptime_ubuntu_golden():
    info = parse_uptime_output(
        "09:18:58 up 34 days, 14:35,  2 users,  load average: 0.04, 0.03, 0.00"
    )
    assert info.current_time == "09:18:58"
    assert (info.load_average1, info.load_average5, info.load_average15) == (
        "0.04", "0.03", "0.00")
    assert info.up_duration_minutes == 34 * 24 * 60 + 14 * 60 + 35
    assert info.users == 2


def test_uptime_ubuntu_no_days_golden():
    info = parse_uptime_output(
        "09:18:58 up 14:35,  2 users,  load average: 0.04, 0.03, 0.00"
    )
    assert info.up_duration_minutes == 14 * 60 + 35
    assert info.users == 2


def test_uptime_unmatched_raises_like_go_panic():
    with pytest.raises(ValueError):
        parse_uptime_output("not an uptime line at all")


def test_free_ubuntu_golden_and_swap_bug():
    free_output = (
        "               total        used        free      shared  buff/cache   available\n"
        "Mem:         8131912     1142280     5147464        4044     2163520     6989632\n"
        "Swap:         999999      123456          0"
    )
    info = parse_free_output(free_output)
    assert info.cach_use == 2163520
    assert info.mem_free == 5147464
    assert info.mem_use == 1142280
    assert info.mem_available == 6989632
    # the reference's Sscanf scans the "Swap:" label into an int64 target,
    # fails, and assigns nothing: swap_use is ALWAYS 0 (os_metrics.go:146)
    assert info.swap_use == 0


def test_free_too_short_raises():
    with pytest.raises(ValueError):
        parse_free_output("only\ntwo lines")


def test_os_metrics_sink_row_nil_memory():
    up = parse_uptime_output(
        "09:18:58 up 14:35,  2 users,  load average: 0.04, 0.03, 0.00")
    row = os_metrics_row(up, None, host_id=7, metrics_ts="2025-07-02 10:00:00")
    assert row["memory_use"] == 0 and row["users"] == 2
    row2 = os_metrics_row(up, MemoryInfo(mem_use=5), 7, "t")
    assert row2["memory_use"] == 5


def test_collectors_run_on_linux():
    """The S5 collectors execute the real commands where available."""
    import shutil

    from sbo_ray.functions import osmetrics as O

    if shutil.which("uptime"):
        info = O.collect_uptime()
        assert info.users >= 0
    if shutil.which("free"):
        mem = O.collect_memory()
        assert mem.mem_use > 0


def test_live_sink_writes_parquet(tmp_path):
    """S5+K6 end-to-end: the live sink samples the host and writes the
    sbo_os_metrics-shaped Parquet fragment (URI-capable like all sinks)."""
    import glob
    import shutil

    import pyarrow.parquet as pq
    import pytest

    from sbo_ray.functions.osmetrics import (OS_METRICS_SCHEMA_FIELDS,
                                             collect_and_write)

    if not shutil.which("uptime"):
        pytest.skip("no uptime binary")
    n = collect_and_write(f"file://{tmp_path}", samples=2, interval_sec=0.05,
                          host_id=7)
    assert n == 2
    files = glob.glob(str(tmp_path / "osmetrics-*.parquet"))
    assert len(files) == 1
    t = pq.read_table(files[0])
    assert t.num_rows == 2
    assert t.schema.names == [f for f, _ in OS_METRICS_SCHEMA_FIELDS]
    row = t.to_pylist()[0]
    assert row["host_id"] == 7
    assert row["swap_use"] == 0  # the Sscanf swap bug, faithfully zero


def test_collect_and_write_validates_and_uniquifies(tmp_path):
    """samples=0 raises cleanly (ADVICE r3), and two same-second
    invocations for the same host write TWO fragments, not one
    silently-overwritten file."""
    import glob
    from datetime import datetime

    import pytest

    from sbo_ray.functions.osmetrics import collect_and_write

    with pytest.raises(ValueError, match="samples"):
        collect_and_write(str(tmp_path), samples=0)

    fixed = lambda: datetime(2026, 1, 2, 3, 4, 5)  # noqa: E731
    collect_and_write(str(tmp_path), samples=1, host_id=9, now_fn=fixed)
    collect_and_write(str(tmp_path), samples=1, host_id=9, now_fn=fixed)
    files = glob.glob(str(tmp_path / "osmetrics-*.parquet"))
    assert len(files) == 2
