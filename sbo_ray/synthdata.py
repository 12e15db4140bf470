"""Deterministic large-scale synthetic data tables for ``bench.py --data``
(VERDICT r2 item 3): documents / events / embeddings with the exact
schemas of the driver's testdata tables, generated vectorized and cached
under /tmp/sbo_synth_data (a _SUCCESS sentinel marks completeness, like
``synth.ensure_rows``). Change V_DATA when altering generation.

The documents table plants exact duplicates (for exact/minhash dedup
hits) and near duplicates (one word swapped). The events table gives
user 0 a fixed 2% of all events (the hot-user skew the salted
sessionizer exists for). Embeddings are uniform random unit-ish vectors.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

V_DATA = "d3"
ROOT = "/tmp/sbo_synth_data"
SEED = 20250817

# english stopwords first (lang-id + stop-ratio gates see them), then
# content words
_STOP = ["the", "and", "of", "to", "in", "is", "it", "for", "on", "with"]
_VOCAB = _STOP + [f"word{i:04d}" for i in range(4000)]
_W = 40  # words per doc


def _dir(name: str) -> str:
    return os.path.join(ROOT, f"{V_DATA}_{name}")


def _done(d: str) -> bool:
    return os.path.exists(os.path.join(d, "_SUCCESS"))


def _mark(d: str) -> None:
    with open(os.path.join(d, "_SUCCESS"), "w") as f:
        f.write("ok")


def ensure_docs(n: int, dup_frac: float = 0.03, near_frac: float = 0.02,
                seed: int = SEED) -> str:
    """documents.parquet with ``n`` rows (doc_id,text,lang,source,n_chars)."""
    d = _dir(f"docs{n}")
    if _done(d):
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed)
    vocab = pa.array(_VOCAB, type=pa.string())
    path = os.path.join(d, "documents.parquet")
    writer = None
    chunk = 500_000
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        m = hi - lo
        idx = rng.randint(0, len(_VOCAB), size=(m, _W)).astype(np.int32)
        # boost stopword density: every 5th word drawn from the stop set
        idx[:, ::5] = rng.randint(0, len(_STOP), size=(m, (_W + 4) // 5))
        # plant dups INSIDE the chunk (deterministic, shard-local)
        n_dup = int(m * dup_frac)
        n_near = int(m * near_frac)
        if n_dup:
            src = rng.randint(0, m - n_dup, size=n_dup)
            idx[m - n_dup:] = idx[src]
        if n_near and m - n_dup - n_near > 0:
            src = rng.randint(0, m - n_dup - n_near, size=n_near)
            tgt = np.arange(m - n_dup - n_near, m - n_dup)
            idx[tgt] = idx[src]
            idx[tgt, rng.randint(0, _W, size=n_near)] = rng.randint(
                len(_STOP), len(_VOCAB), size=n_near)
        cols = [pc.take(vocab, pa.array(idx[:, w])) for w in range(_W)]
        text = pc.binary_join_element_wise(*cols, " ")
        t = pa.table({
            "doc_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
            "text": text,
            "lang": pc.take(pa.array(["en", "de", "fr", "es"]),
                            pa.array((np.arange(lo, hi) % 4).astype(np.int32))),
            "source": pc.take(pa.array([f"src-{i}" for i in range(8)]),
                              pa.array((np.arange(lo, hi) % 8).astype(np.int32))),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        })
        if writer is None:
            writer = pq.ParquetWriter(path, t.schema)
        writer.write_table(t, row_group_size=31_250)
    if writer:
        writer.close()
    _mark(d)
    return d


def ensure_events(n: int, n_users: int = 50_000, seed: int = SEED) -> str:
    """events.parquet with ``n`` rows; user 0 owns a fixed 2% (hot key)."""
    d = _dir(f"events{n}")
    if _done(d):
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed + 1)
    # zipf-ish users + planted hot user 0
    users = (rng.pareto(1.2, size=n) * 37).astype(np.int64) % n_users
    hot = rng.rand(n) < 0.02
    users[hot] = 0
    base = np.int64(1_700_000_000)
    ts = base + rng.randint(0, 7 * 86400, size=n).astype(np.int64)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts * 1_000_000).cast(pa.timestamp("us")),
        "user_id": pa.array(users),
        "event_type": pc.take(
            pa.array(["view", "click", "buy", "scroll", "close"]),
            pa.array(rng.randint(0, 5, size=n).astype(np.int32))),
        "value": pa.array(np.round(rng.rand(n) * 100, 3)),
        "props": pc.take(pa.array(['{"v":1}', '{"v":2}']),
                         pa.array((np.arange(n) % 2).astype(np.int32))),
    })
    pq.write_table(t, os.path.join(d, "events.parquet"), row_group_size=62_500)
    _mark(d)
    return d


def ensure_doc_emb(n_docs: int, n_emb: int, dim: int = 64) -> str:
    """A combined dir (documents.parquet + embeddings.parquet symlinks)
    for ops that join both tables on doc_id = vec_id
    (``doc_emb_curation``). No new data is generated."""
    dd = ensure_docs(n_docs)
    ed = ensure_embeddings(n_emb, dim=dim)
    d = _dir(f"docemb{n_docs}_{n_emb}x{dim}")
    os.makedirs(d, exist_ok=True)
    for src, name in ((dd, "documents.parquet"), (ed, "embeddings.parquet")):
        dst = os.path.join(d, name)
        if not os.path.lexists(dst):
            os.symlink(os.path.join(src, name), dst)
    _mark(d)
    return d


def ensure_embeddings(n: int, dim: int = 64, seed: int = SEED) -> str:
    """embeddings.parquet with ``n`` rows (vec_id, embedding, label)."""
    d = _dir(f"emb{n}x{dim}")
    if _done(d):
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed + 2)
    path = os.path.join(d, "embeddings.parquet")
    writer = None
    chunk = 500_000
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        m = hi - lo
        vecs = rng.randn(m, dim).astype(np.float32)
        # planted exact duplicates (~0.5%): vec k with k % 199 == 0
        # copies its predecessor, so embedding dedup (semdedup/cosine)
        # has real work at bench scale; chunk starts skip the copy
        ids_abs = np.arange(lo, hi, dtype=np.int64)
        dup = np.flatnonzero((ids_abs % 199 == 0) & (np.arange(m) > 0))
        vecs[dup] = vecs[dup - 1]
        flat = pa.array(vecs.reshape(-1))
        offsets = pa.array(np.arange(0, (m + 1) * dim, dim, dtype=np.int32))
        emb = pa.ListArray.from_arrays(offsets, flat)
        t = pa.table({
            "vec_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
            "embedding": emb,
            "label": pa.array(rng.randint(0, 16, size=m).astype(np.int32)),
        })
        if writer is None:
            writer = pq.ParquetWriter(path, t.schema)
        writer.write_table(t, row_group_size=31_250)
    if writer:
        writer.close()
    _mark(d)
    return d
