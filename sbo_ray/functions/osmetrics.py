"""OS metrics collectors (S5) + sink row shape (K6).

Port of ``metrics/os_metrics.go:60-159``: parse ``uptime`` and ``free``
command output into the reference's UptimeInfo / MemoryInfo shapes, and
render the ``sbo_os_metrics`` sink row (``db/mysqldb.go:240-269``).
Host telemetry is peripheral to the data engine (it samples the machine
the CLI runs on, once per interval), so the collectors are plain
functions the CLI may call — not Dataset stages — but the PARSERS are
complete and golden-tested with the reference's own test strings
(``metrics/os_metrics_test.go``).

Reference quirks reproduced deliberately:

- ``ParseUptimeOutput`` indexes the "up ..., N users" match without a
  nil check (``os_metrics.go:87``) — a non-matching string panics in Go;
  here it raises ``ValueError`` (the Python analog of that contract).
- ``ParseFreeOutput`` scans the Swap line as ``Sscanf("%s %d %d %d",
  &swapTotal, ...)`` — the label "Swap:" hits the first ``%d`` target,
  Sscanf stops, and **SwapUse is always 0** (``os_metrics.go:146-148``).
  Reproduced bit-for-bit; noted in README divergences as a reference
  bug kept for parity.
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass
from datetime import datetime

_TIME_RE = re.compile(r"^\s*(\d{2}:\d{2}(:\d{2})?)")
_UP_USERS_RE = re.compile(r"up\s+(.*),\s*(\d+)\s+users?")
_DAYS_HOURS_RE = re.compile(r"(\d+).*?,\s*(\d{1,2}):(\d{2})")
_HOUR_MIN_RE = re.compile(r"(\d{1,2}):(\d{2})")
_LOADAVG_RE = re.compile(
    r"load averages?\s*:\s*(\d+\.\d+)[,\s]\s*(\d+\.\d+)[,\s]\s*(\d+\.\d+)"
)


@dataclass
class UptimeInfo:
    current_time: str = ""
    up_duration_minutes: int = 0
    users: int = 0
    load_average1: str = ""
    load_average5: str = ""
    load_average15: str = ""


@dataclass
class MemoryInfo:
    swap_use: int = 0
    cach_use: int = 0
    mem_use: int = 0
    mem_free: int = 0
    mem_available: int = 0


def parse_uptime_output(uptime_str: str, now_fn=datetime.now) -> UptimeInfo:
    """ParseUptimeOutput (os_metrics.go:69-117). ``now_fn`` injects the
    clock for the current-time fallback (Go uses time.Now())."""
    info = UptimeInfo()
    m = _TIME_RE.match(uptime_str)
    info.current_time = m.group(1) if m else now_fn().strftime("%H:%M:%S")

    du = _UP_USERS_RE.search(uptime_str)
    if du is None:
        # the Go code indexes the nil match -> panic; surface the same
        # contract violation instead of guessing
        raise ValueError("uptime output does not match 'up ..., N users'")
    dh = _DAYS_HOURS_RE.search(du.group(1))
    if dh:
        days, hours, minutes = int(dh.group(1)), int(dh.group(2)), int(dh.group(3))
        info.up_duration_minutes = days * 24 * 60 + hours * 60 + minutes
    else:
        hm = _HOUR_MIN_RE.search(du.group(1))
        if hm:
            info.up_duration_minutes = int(hm.group(1)) * 60 + int(hm.group(2))
    info.users = int(du.group(2))

    la = _LOADAVG_RE.search(uptime_str)
    if la:
        info.load_average1 = la.group(1)
        info.load_average5 = la.group(2)
        info.load_average15 = la.group(3)
    return info


def parse_free_output(free_output: str) -> MemoryInfo:
    """ParseFreeOutput (os_metrics.go:133-159), incl. the Sscanf swap bug:
    the Swap row's label lands in the first numeric target, so the scan
    yields nothing and swap_use stays 0 — always."""
    lines = free_output.split("\n")
    if len(lines) < 3:
        raise ValueError("'free' output does not match expected format")
    info = MemoryInfo()
    mem_fields = lines[1].split()
    # Sscanf "%s %d %d %d %d %d %d": label + six ints; missing trailing
    # fields simply stay 0 (Sscanf stops at mismatch/EOF)
    vals = []
    for tok in mem_fields[1:7]:
        try:
            vals.append(int(tok))
        except ValueError:
            break
    vals += [0] * (6 - len(vals))
    _total, info.mem_use, info.mem_free, _shared, info.cach_use, info.mem_available = vals
    # Swap row: Go scans "%s" into an *int64 -> Sscanf errors on the
    # first field and assigns NOTHING; swap_use is always 0
    return info


def collect_uptime() -> UptimeInfo:
    """GetOSUptimeInfo (os_metrics.go:53-66): run ``uptime``; raises on
    platforms without it (the reference returns the exec error)."""
    import subprocess

    out = subprocess.run(["uptime"], capture_output=True, text=True, check=True)
    return parse_uptime_output(out.stdout.strip())


def collect_memory() -> MemoryInfo:
    """GetOSMemoryInfo (os_metrics.go:119-131): run ``free`` (Linux)."""
    import subprocess

    out = subprocess.run(["free"], capture_output=True, text=True, check=True)
    return parse_free_output(out.stdout.strip())


OS_METRICS_SCHEMA_FIELDS = [
    ("host_id", "int64"), ("metrics_ts", "string"),
    ("up_duration_minutes", "int64"), ("users", "int64"),
    # loads stay STRINGS like the Go struct fields they mirror
    ("load_average1", "string"), ("load_average5", "string"),
    ("load_average15", "string"), ("swap_use", "int64"),
    ("cache_use", "int64"), ("memory_use", "int64"),
    ("memory_free", "int64"), ("memory_available", "int64"),
]


_FRAGMENT_SEQ = itertools.count()


def collect_and_write(out_dir: str, samples: int = 1,
                      interval_sec: float = 0.0, host_id: int = 1,
                      now_fn=None) -> int:
    """The LIVE OS-metrics sink (S5+K6 end-to-end): sample
    ``uptime``/``free`` ``samples`` times at ``interval_sec`` and append
    one Parquet fragment per invocation under ``out_dir`` (fsspec URI
    capable, like every sink). The reference runs this on a host cron
    into the sbo_os_metrics MySQL table (main.go + db/mysqldb.go:
    240-269); here the cadence is the caller's (cron / CLI loop) and the
    sink is partitioned Parquet. Returns the number of rows written."""
    import time
    from datetime import datetime

    import pyarrow as pa

    from .. import fsio

    if samples < 1:
        raise ValueError(f"samples must be >= 1, got {samples}")
    now_fn = now_fn or datetime.now
    rows = []
    for i in range(samples):
        if i:
            time.sleep(interval_sec)
        up = collect_uptime()
        try:
            mem = collect_memory()
        except Exception:  # platform without `free`: nil -> zeros
            mem = None
        rows.append(os_metrics_row(
            up, mem, host_id, now_fn().strftime("%Y-%m-%d %H:%M:%S")))
    schema = pa.schema([(n, getattr(pa, t)()) for n, t in
                        OS_METRICS_SCHEMA_FIELDS])
    table = pa.Table.from_pylist(rows, schema=schema)
    fsio.makedirs(out_dir)
    # pid + per-process counter uniquify the fragment: two invocations
    # for the same host within the same second (even with identical
    # samples) must not overwrite each other — the timestamp alone has
    # 1-second granularity
    import os

    uniq = f"{os.getpid():x}-{next(_FRAGMENT_SEQ)}"
    name = (f"osmetrics-{rows[0]['metrics_ts'].replace(' ', 'T').replace(':', '-')}"
            f"-{host_id}-{uniq}.parquet")
    fsio.write_table(out_dir, name, table)
    return len(rows)


def os_metrics_row(uptime: UptimeInfo, memory: MemoryInfo | None,
                   host_id: int, metrics_ts: str) -> dict:
    """The sbo_os_metrics sink row (SaveOSMetrics, db/mysqldb.go:240-269);
    ``memoryInfo`` may be nil -> zeros. K6's Parquet-row analog."""
    mem = memory or MemoryInfo()
    return {
        "host_id": host_id,
        "metrics_ts": metrics_ts,
        "up_duration_minutes": uptime.up_duration_minutes,
        "users": uptime.users,
        "load_average1": uptime.load_average1,
        "load_average5": uptime.load_average5,
        "load_average15": uptime.load_average15,
        "swap_use": mem.swap_use,
        "cache_use": mem.cach_use,
        "memory_use": mem.mem_use,
        "memory_free": mem.mem_free,
        "memory_available": mem.mem_available,
    }
