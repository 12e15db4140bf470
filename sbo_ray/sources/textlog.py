"""Raw text-log source: the reference's native input format.

The flagship input is the pre-tokenized Parquet table (BASELINE.json),
but a user of the reference feeds raw access-log FILES. This source
reads whole files (one task per file — exactly the reference's
parallelism unit, one goroutine per monitored file, ``main.go:83-96``)
and lifts them into the engine's input schema
``(doc_id, tokens, n_tok, source)``: ``source`` is the file basename
(the per-file config key), ``doc_id`` the exact in-file line number,
``tokens`` the byte codec of the trimmed line — so the whole pipeline,
including the token-equality invariant, works unchanged on raw logs.

``skip_rows`` implements the reference's ``StartFrom`` offset
(``main.go:926-978``): 0 = beginning, N>0 = skip first N lines per
file, -1 = end (only new lines; batch equivalent: empty read).

Very large single files should be pre-split (the reference has the same
serial-per-file constraint); sharded Parquet is the scale path.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

from ..codec import encode_lines
from ..synth import SCHEMA


def read_text_logs(paths: list[str] | str, skip_rows: int = 0) -> rd.Dataset:
    if isinstance(paths, str):
        paths = [paths]
    if skip_rows == -1:  # StartFrom end: nothing already in the file
        return rd.from_arrow(SCHEMA.empty_table())
    ds = rd.read_binary_files(paths, include_paths=True)

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids: list[str] = []
        lines: list[str] = []
        sources: list[str] = []
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            base = os.path.basename(path)
            # invalid UTF-8 bytes become U+FFFD: Arrow strings (and the
            # byte codec) require valid UTF-8; junk-byte lines fail the
            # anchored format regexes downstream and count as parse
            # errors, same as the reference classifies them
            text = data.decode("utf-8", "replace")
            raw_lines = text.split("\n")
            if text.endswith("\n"):
                raw_lines = raw_lines[:-1]  # trailing-newline artifact
            for idx, raw in enumerate(raw_lines):
                if idx < skip_rows:
                    continue
                # whitespace trim (main.go:994); empty lines stay and are
                # counted as parse errors downstream (main.go:721-723)
                doc_ids.append(f"{base}:{idx:012d}")
                lines.append(raw.strip())
                sources.append(base)
        tokens = encode_lines(lines)
        return pa.table({
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array([len(s.encode()) for s in lines], type=pa.int32()),
            "source": pa.array(sources, type=pa.string()),
        }, schema=SCHEMA)

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=1)


# ---- follow mode (S3, main.go:863-922): poll-based tail + rotation ---------
#
# The reference watches the log directory with fsnotify and, on Write
# events, resumes reading from the saved file position; on Rename/Remove
# it drains the old handle and reopens the file (log rotation,
# main.go:884-907). The portable batch analog here is a POLL-based tail:
# `tail_text_log` reads everything after a saved byte offset, holds back
# a trailing partial line until its newline arrives (exactly like the
# reference's reader, which only emits complete lines), and detects
# rotation by inode change or file shrink, reopening from 0. fsnotify is
# only the wake-up mechanism; the read/rotation semantics live here.

from dataclasses import dataclass


@dataclass
class TailState:
    """Persistent per-file tail position (the checkpointable analog of
    the reference's open file handle + seek position)."""

    offset: int = 0           # next unread byte
    inode: int | None = None
    carry: bytes = b""        # partial trailing line awaiting its newline
    next_line_no: int = 0     # continuous in-file line numbering
    initialized: bool = False


def tail_text_log(path: str, state: TailState | None = None,
                  start_from: int = 0) -> tuple[pa.Table, TailState]:
    """One tail round: new COMPLETE lines since ``state`` as an input-
    schema table, plus the advanced state. ``start_from`` applies on the
    first call only (StartFrom, main.go:926-978): 0 = beginning, N>0 =
    skip first N lines, -1 = end (only lines appended later)."""
    state = state or TailState()
    st = os.stat(path)
    if state.initialized and state.inode is not None and (
            st.st_ino != state.inode or st.st_size < state.offset):
        # rotation: new inode or truncation -> reopen from the start
        # (main.go:884-907; the drain of the old handle happened when the
        # previous round read to EOF)
        state.offset = 0
        state.carry = b""
    if not state.initialized:
        state.initialized = True
        if start_from == -1:
            state.offset = st.st_size    # end: only new lines
            # line numbering for -1 starts at 0 for appended lines (the
            # reference counts from its own read position too)
    state.inode = st.st_ino

    with open(path, "rb") as f:
        f.seek(state.offset)
        data = f.read()
    state.offset += len(data)
    buf = state.carry + data
    complete, sep, state.carry = buf.rpartition(b"\n")
    if not sep:
        state.carry = buf
        complete = b""
    raw_lines = complete.split(b"\n") if complete else []

    base = os.path.basename(path)
    doc_ids, lines, sources = [], [], []
    for raw in raw_lines:
        ln = state.next_line_no
        state.next_line_no += 1
        if start_from > 0 and ln < start_from:
            continue  # StartFrom N: skip first N lines of the file
        s = raw.decode("utf-8", "replace").strip()
        doc_ids.append(f"{base}:{ln:012d}")
        lines.append(s)
        sources.append(base)
    table = pa.table({
        "doc_id": pa.array(doc_ids, type=pa.string()),
        "tokens": encode_lines(lines),
        "n_tok": pa.array([len(s.encode()) for s in lines], type=pa.int32()),
        "source": pa.array(sources, type=pa.string()),
    }, schema=SCHEMA)
    return table, state


def follow_text_log(path: str, state: TailState | None = None,
                    start_from: int = 0, poll_sec: float = 1.0,
                    max_rounds: int | None = None):
    """Generator of tail rounds (the driver-loop follow mode): yields a
    non-empty input-schema table whenever new complete lines appear.
    ``max_rounds`` bounds the loop for tests/batch drains; None follows
    forever. Each yielded table can be fed to
    ``logpipe.enriched_dataset_from(rd.from_arrow(t), job)`` — the
    engine's incremental analog of the reference's live handler chain."""
    import time as _time

    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        table, state = tail_text_log(path, state, start_from)
        if table.num_rows:
            yield table
        rounds += 1
        if max_rounds is None or rounds < max_rounds:
            _time.sleep(poll_sec)
