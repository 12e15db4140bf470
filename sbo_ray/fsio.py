"""fsspec-backed sink I/O (VERDICT r2 item 1: cluster-real sinks).

Every sink path may be a plain local path (the default; unchanged pure-
``os`` fast path with two-phase atomic ``os.replace`` commits) or an
fsspec URI (``file://``, ``memory://``, ``s3://``, ...). On non-local
filesystems fragments are written directly to their FINAL name: object-
store PUTs are all-or-nothing (no torn files to guard against), and the
content-derived fragment names already make task retries idempotent.

Worker tasks never capture a filesystem object — only the URI string;
each worker re-resolves it via :func:`resolve` (fsspec caches instances
per process). Note ``memory://`` state is per-process: fine for driver-
side unit tests, invisible across Ray workers — use ``file://`` URIs to
exercise the URI branch end-to-end across processes.

Reference sink role: db/mysqldb.go:161-222 (the MySQL sinks this engine
replaces with partitioned Parquet, SURVEY.md §2.7 K4/K5).
"""

from __future__ import annotations

import posixpath


def is_uri(path: str) -> bool:
    return "://" in path


def join(base: str, *parts: str) -> str:
    """Path join that keeps URIs URIs (``/``-joined) and local paths
    platform-joined."""
    if is_uri(base):
        return posixpath.join(base, *parts)
    import os

    return os.path.join(base, *parts)


def resolve(path: str):
    """URI/path -> (fsspec filesystem, fs-native root path). Plain local
    paths resolve to the local filesystem unchanged."""
    import fsspec

    fs, root = fsspec.core.url_to_fs(path)
    return fs, root


def makedirs(path: str) -> None:
    fs, root = resolve(path)
    fs.makedirs(root, exist_ok=True)


def clear_fragments(dir_path: str, prefixes: tuple[str, ...] = ("part-", ".part-")) -> int:
    """Delete stale fragments (from a previous invocation with possibly
    different input/batching) so a reused out_dir never mixes them in.
    Returns the number removed. Missing dir == nothing to clear."""
    fs, root = resolve(dir_path)
    if not fs.exists(root):
        return 0
    n = 0
    for entry in fs.ls(root, detail=False):
        name = str(entry).rstrip("/").rsplit("/", 1)[-1]
        if name.startswith(prefixes):
            fs.rm_file(entry)
            n += 1
    return n


def write_fragment(dir_uri: str, name: str, table) -> None:
    """Write one Parquet fragment idempotently.

    Local filesystem: two-phase commit (write ``.{name}.tmp``, then
    atomic ``os.replace``) so a killed task never leaves a torn file
    under the final name. Non-local: single PUT to the final name —
    atomic on object stores, and the content-derived ``name`` makes a
    retry overwrite rather than duplicate."""
    import pyarrow.parquet as pq

    fs, root = resolve(dir_uri)
    final = posixpath.join(root, name)
    if _is_local(fs):
        import os

        tmp = posixpath.join(root, f".{name}.tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, final)
    else:
        with fs.open(final, "wb") as f:
            pq.write_table(table, f)


def write_table(dir_path: str, name: str, table) -> None:
    """Driver-side small-table write (e.g. the final metrics parquet)."""
    import pyarrow.parquet as pq

    fs, root = resolve(dir_path)
    fs.makedirs(root, exist_ok=True)
    with fs.open(posixpath.join(root, name), "wb") as f:
        pq.write_table(table, f)


def _is_local(fs) -> bool:
    from fsspec.implementations.local import LocalFileSystem

    return isinstance(fs, LocalFileSystem)


def is_local_path(path: str) -> bool:
    fs, _ = resolve(path)
    return _is_local(fs)


def exists(path: str) -> bool:
    fs, root = resolve(path)
    return fs.exists(root)


def open_file(path: str, mode: str = "rb"):
    fs, root = resolve(path)
    return fs.open(root, mode)


def rmtree(path: str) -> None:
    """Recursive delete, ignore-missing (the crashed-run-dir clear)."""
    fs, root = resolve(path)
    try:
        fs.rm(root, recursive=True)
    except FileNotFoundError:
        pass


def listdir(path: str) -> list[str]:
    """Entries (URI-joined back onto ``path``) of a directory; [] if
    missing."""
    fs, root = resolve(path)
    if not fs.exists(root):
        return []
    out = []
    for entry in sorted(fs.ls(root, detail=False)):
        name = str(entry).rstrip("/").rsplit("/", 1)[-1]
        out.append(join(path, name))
    return out
