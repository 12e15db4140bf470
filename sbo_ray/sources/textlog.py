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
