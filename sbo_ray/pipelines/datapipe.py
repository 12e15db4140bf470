"""Ray Data pipelines for the training-data operators over the provided
testdata tables (documents, embeddings, customer/nation, orders, events,
lineitem).

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table.
Broadcast-small-side joins use ``ray.put`` + per-batch dict lookups (the
ST4 pattern, SURVEY.md §2.5); wide aggregations pre-aggregate per block
before the final combine.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions import dedup as D
from ..functions import similarity as S
from ..functions import text as T
from ..functions.multimodal import DecoderStub, to_payload_table
from .logpipe import _cpus, tune_context


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    tune_context()
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _parquet_num_rows(sf_dir: str, table: str) -> int:
    """Row count straight from the Parquet footer — sizing decisions
    (chunk counts, partition fan-outs) must not cost a full dataset
    execution the way ``ds.count()`` does."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(os.path.join(sf_dir, f"{table}.parquet")).metadata.num_rows


def _n_parts() -> int:
    """Hash-partition count for the partition-grouped pattern: Ray's
    ``groupby().map_groups`` pays ~60us of per-group pandas overhead, so
    grouping millions of tiny buckets (LSH bands, users) directly is
    minutes of pure overhead. Instead group by ``key_hash % P`` and do
    the real (vectorized) grouping inside each partition — same rows
    shuffled, P pandas calls instead of millions. Partitioning
    assumption: one hash partition fits in a worker; raise P for bigger
    inputs."""
    return max(16, _cpus() * 4)


def _bw_task_cpus(target_concurrency: int) -> int:
    """CPU reservation for memory-BANDWIDTH-bound tasks (dense-matmul /
    large-temp stages: the ivf_assign rule). Memory bandwidth is a
    per-NODE resource that does NOT grow with core count, so the right
    invariant is "at most ``target_concurrency`` such tasks per node",
    expressed to Ray as num_cpus = node_cpus / target. Measured bands
    on the 32-cpu dev box: ~0.5 GB-temp-churn tasks peak at 16
    concurrent (36 s -> 6.9 s for the token window stage; 94 -> 7.9 s
    semdedup), heavier dense-count tasks at 8 (40-68 s -> 21-31 s for
    ngram pairs) — hence targets 16 and 8 at the call sites. Override
    per cluster with SBO_BW_TASK_CPUS (hardware bandwidth/core ratios
    differ; re-measure with `python bench.py --tokens`)."""
    env = os.environ.get("SBO_BW_TASK_CPUS")
    if env:
        return max(1, int(env))
    try:
        n_nodes = max(1, sum(1 for nd in ray.nodes() if nd.get("Alive")))
    except Exception:
        n_nodes = 1
    node_cpus = max(1, _cpus() // n_nodes)
    return max(1, round(node_cpus / target_concurrency))


# ---- dedup -----------------------------------------------------------------


def _hash_part_col(t: pa.Table, P: int) -> pa.Table:
    return t.append_column("part", pa.array(
        t.column("text_hash").to_numpy(zero_copy_only=False) % P))


def _min_doc_per_hash(g: pd.DataFrame, with_counts: bool) -> pd.DataFrame:
    """Per-partition vectorized dedup kernel: min doc_id (and optionally
    the duplicate count) per distinct text_hash — one lexsort + segment
    boundaries, no per-key work."""
    h = g["text_hash"].to_numpy()
    d = g["doc_id"].to_numpy()
    order = np.lexsort((d, h))
    hs, ds_ = h[order], d[order]
    new = np.ones(len(hs), dtype=bool)
    new[1:] = hs[1:] != hs[:-1]
    if not with_counts:
        return pd.DataFrame({"doc_id": ds_[new]})
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(hs)))
    return pd.DataFrame({"doc_id": ds_[starts], "n_dupes": counts})


def doc_dedup_exact(sf_dir: str):
    """Exact dedup: hash-partitioned min(doc_id)+count per distinct text.
    Only the 8-byte hash + ids shuffle; payload stays put.

    Partition-grouped (see ``_n_parts``): with ~4M mostly-distinct keys,
    Ray's native ``groupby(key).aggregate`` sort-aggregates the whole
    exchange (49 s at 4M docs); shuffling the same rows to P hash
    partitions and doing the per-key min+count vectorized inside each
    (``_min_doc_per_hash``) is 6.4 s — identical rows."""
    P = _n_parts()

    def add_part(t: pa.Table) -> pa.Table:
        return _hash_part_col(D.add_text_hash(t), P).select(
            ["doc_id", "text_hash", "part"])

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: _min_doc_per_hash(g, with_counts=True))


def doc_sample_hash(sf_dir: str, rate: float = 0.1, salt: str = "s1"):
    """Deterministic content-hash sampling — the reproducible
    downsampling primitive a 100 TB curation job needs (same doc is
    kept or dropped regardless of partitioning, cluster size or rerun):
    keep doc iff md5(text || salt) as a 63-bit integer < rate * 2^63.
    Pure map filter — no shuffle, no state; the salt decorrelates
    successive sampling stages. Exact SQL mirror (same md5 arithmetic
    in DuckDB)."""
    thresh = int(rate * (1 << 63))

    def keep(t: pa.Table) -> pa.Table:
        h = D.add_text_hash(
            t.append_column("__salted", pc.binary_join_element_wise(
                t.column("text").cast(pa.string()), salt, "")),
            column="__salted",
        ).column("text_hash").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(h < thresh)).select(["doc_id", "text"])

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(keep, batch_format="pyarrow")


def doc_mix_epochs(sf_dir: str):
    """Data-mixing epoch expansion — the Dolma/DCLM mixture primitive:
    each source gets a (possibly fractional) epoch weight and every doc
    is repeated floor(w) times plus one more with probability frac(w),
    decided by the doc's deterministic content hash (so the extra-epoch
    draw is reproducible across reruns, partitionings and cluster
    sizes, and exact duplicates draw identically — content-determinism
    by design). Weights derive from the source name's numeric suffix
    mod 4 -> w in {1.0, 1.75, 2.5, 3.25}, so the op works over any
    source set; thresholds are exact power-of-two integers (frac * 2^63
    with frac in {0, .75, .5, .25}) — no float arithmetic crosses the
    engine/oracle boundary. Pure map expansion (repeat-take inside one
    map_batches): no shuffle, no state, embarrassingly parallel at
    100 TB."""
    FULL = np.array([1, 1, 2, 3], np.int64)
    THR = np.array([0, 3 << 61, 1 << 62, 1 << 61], np.int64)

    def expand(t: pa.Table) -> pa.Table:
        src = t.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        digits = pc.extract_regex(src, r"(?P<d>[0-9]+)")
        # digit-less source names fall into weight class 0 (w = 1.0) on
        # both sides (the oracle's TRY_CAST -> COALESCE 0)
        mk = pc.fill_null(
            pc.cast(pc.struct_field(digits, "d"), pa.int64()), 0
        ).to_numpy(zero_copy_only=False).astype(np.int64) % 4
        h = D.add_text_hash(
            t.append_column("__salted", pc.binary_join_element_wise(
                t.column("text").cast(pa.string()), "mix", "")),
            column="__salted",
        ).column("text_hash").to_numpy(zero_copy_only=False)
        reps = FULL[mk] + (h < THR[mk])
        total = int(reps.sum())
        starts = np.cumsum(reps) - reps
        doc_of = np.repeat(np.arange(len(reps)), reps)
        return pa.table({
            "doc_id": t.column("doc_id").take(pa.array(doc_of)),
            "source": src.take(pa.array(doc_of)),
            "epoch": pa.array(
                np.arange(total, dtype=np.int64) - starts[doc_of]),
        })

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    return ds.map_batches(expand, batch_format="pyarrow")


def doc_sample_weighted(sf_dir: str, k: int = 100):
    """Weighted exact-k sample (the exponential-clock / Gumbel form of
    Efraimidis-Spirakis 2006): every row draws u in (0, 1] from its
    deterministic 63-bit md5 key and ranks by -ln(u)/w ascending with
    w = its whitespace token count, so inclusion probability tracks
    the weight (the quality- or length-weighted draw a curation
    pipeline uses to bias toward substantive documents) while staying
    reproducible across reruns, partitionings and cluster sizes. Same
    monoid top-k shape as doc_sample_reservoir: each block keeps its
    bottom-k under the FINAL (round6(wkey), doc_id) ordering — so the
    partial selection is closed under merge — and the driver merges
    <= k x blocks rows; no shuffle, corpus never materializes. Exact
    SQL mirror through the same md5 + ln arithmetic (u is built from
    identical double ops on both sides; only libm's last-ulp ln noise
    remains, far inside ROUND-6 + the id tie-break)."""
    import hashlib

    def local_bottomk(t: pa.Table) -> pa.Table:
        ids_c = t.column("doc_id")
        if isinstance(ids_c, pa.ChunkedArray):
            ids_c = ids_c.combine_chunks()
        ids = ids_c.to_numpy(zero_copy_only=False)
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        payload = pc.binary_join_element_wise(
            ids_c.cast(pa.string()), text.cast(pa.string()), ":")
        u63 = np.fromiter(
            (int.from_bytes(hashlib.md5(v.as_py().encode()).digest()[:8],
                            "big") >> 1 for v in payload),
            dtype=np.int64, count=len(payload))
        w = pc.list_value_length(pc.split_pattern(text, " ")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = (u63.astype(np.float64) + 1.0) * 2.0 ** -63
        wkey = np.round(-np.log(u) / w, 6)
        sel = np.lexsort((ids, wkey))[:k]
        return pa.table({
            "doc_id": pa.array(ids[sel], type=pa.int64()),
            "wkey": pa.array(wkey[sel], type=pa.float64()),
        })

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    schema = pa.schema([("doc_id", pa.int64()), ("wkey", pa.float64())])
    batches = list(ds.map_batches(local_bottomk, batch_format="pyarrow")
                   .iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        return schema.empty_table()
    merged = pa.concat_tables(batches)
    order = pc.sort_indices(merged, sort_keys=[("wkey", "ascending"),
                                               ("doc_id", "ascending")])
    return merged.take(order[:k]).cast(schema)


def doc_compression_ratio(sf_dir: str):
    """Per-doc zlib compression ratio — the classic cheap repetition /
    junk heuristic (boilerplate and template spam compress far below
    natural text; near-random noise compresses above 1.0). Pure map
    over blocks (stdlib zlib level 6 per doc, the fingerprint-precedent
    per-doc loop); emits (doc_id, raw_bytes, zlib_bytes, ratio round6).
    zlib output bytes have no closed form, so there is no SQL oracle —
    rows-only driver gate; a pytest pins exact equality with direct
    zlib.compress and the repetitive-vs-random ordering property."""
    import zlib

    schema = pa.schema([("doc_id", pa.int64()), ("raw_bytes", pa.int64()),
                        ("zlib_bytes", pa.int64()), ("ratio", pa.float64())])

    def ratios(t: pa.Table) -> pa.Table:
        texts = [x or "" for x in t.column("text").to_pylist()]
        raw = np.array([len(x.encode("utf-8")) for x in texts],
                       dtype=np.int64)
        comp = np.array([len(zlib.compress(x.encode("utf-8"), 6))
                         for x in texts], dtype=np.int64)
        ratio = np.round(comp / np.maximum(raw, 1), 6)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "raw_bytes": pa.array(raw),
            "zlib_bytes": pa.array(comp),
            "ratio": pa.array(ratio),
        }, schema=schema)

    return _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(ratios, batch_format="pyarrow")


def doc_length_histogram(sf_dir: str, bucket_tokens: int = 10):
    """Token-length distribution of the corpus — the first diagnostic
    a curation run prints (truncation/packing budgets, length-filter
    thresholds): docs bucketed by ``n_tokens // bucket_tokens``, with
    per-bucket doc and token totals. One streaming scan emitting
    per-block bucket partials (bincount — a few dozen ints each); the
    driver folds partials. All-integer arithmetic, so the SQL mirror
    gates exactly."""
    PART = pa.schema([("bucket", pa.int64()), ("n_docs", pa.int64()),
                      ("sum_tokens", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return PART.empty_table()
        col = t.column("text")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        n_tok = pc.list_value_length(pc.split_pattern(col, " ")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        b = n_tok // bucket_tokens
        n_docs = np.bincount(b)
        sum_tok = np.bincount(b, weights=n_tok).astype(np.int64)
        nz = np.flatnonzero(n_docs)
        return pa.Table.from_arrays([
            pa.array(nz.astype(np.int64)),
            pa.array(n_docs[nz].astype(np.int64)),
            pa.array(sum_tok[nz]),
        ], schema=PART)

    parts = pa.concat_tables(
        [PART.empty_table()]
        + list(_read(sf_dir, "documents", columns=["text"])
               .map_batches(partial, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow", batch_size=None)))
    g = parts.group_by("bucket").aggregate(
        [("n_docs", "sum"), ("sum_tokens", "sum")])
    order = pc.sort_indices(g.column("bucket"))
    return pa.table({
        "bucket": g.column("bucket").take(order).cast(pa.int64()),
        "n_docs": g.column("n_docs_sum").take(order).cast(pa.int64()),
        "sum_tokens":
            g.column("sum_tokens_sum").take(order).cast(pa.int64()),
    })


def doc_split_assign(sf_dir: str, val: float = 0.05, test: float = 0.05,
                     salt: str = "sp1"):
    """Deterministic train/val/test split assignment by content-hash
    range — the dataset-split step with the leakage guarantee that
    matters at 100 TB: the SAME text always lands in the same split
    (duplicate or re-crawled documents can never straddle train and
    eval), regardless of partitioning, rerun or cluster size.
    h = md5(text || salt) as 63-bit int; h < val*2^63 -> 'val',
    < (val+test)*2^63 -> 'test', else 'train'. Pure map — no shuffle,
    no state; exact SQL mirror (same md5 arithmetic)."""
    t_val = int(val * (1 << 63))
    t_test = int((val + test) * (1 << 63))

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "split": pa.array([], pa.string())})
        h = D.add_text_hash(
            t.append_column("__salted", pc.binary_join_element_wise(
                t.column("text").cast(pa.string()), salt, "")),
            column="__salted",
        ).column("text_hash").to_numpy(zero_copy_only=False)
        split = np.where(h < t_val, "val",
                         np.where(h < t_test, "test", "train"))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "split": pa.array(split.astype(object), pa.string()),
        })

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(assign, batch_format="pyarrow")


def doc_sample_reservoir(sf_dir: str, k: int = 100):
    """Exact-k uniform sample (deterministic reservoir): every ROW gets
    the 63-bit key md5(doc_id ':' text) and the global bottom-k by
    (key, doc_id) is the sample — equivalent to a k-reservoir under a
    fixed random order, but reproducible across reruns, partitionings
    and cluster sizes (the property doc_sample_hash provides for
    rate-based sampling, here for exact-count sampling). Distributed
    shape: each block keeps its local bottom-k (the partial ordering IS
    the final ordering, so block top-k is closed under merge — the
    doc_group_topk monoid), and the driver merges <= k x blocks rows;
    no shuffle, corpus never materializes. Keying on doc_id:text (not
    text alone) makes duplicate texts independent rows in the draw.
    Exact SQL mirror: ORDER BY the same md5 arithmetic LIMIT k."""
    import hashlib

    def local_bottomk(t: pa.Table) -> pa.Table:
        ids_c = t.column("doc_id")
        if isinstance(ids_c, pa.ChunkedArray):
            ids_c = ids_c.combine_chunks()
        ids = ids_c.to_numpy(zero_copy_only=False)
        # one md5 per row (keys are per-row unique by construction, so
        # the per-unique dictionary idiom degenerates — the md5 itself
        # is the work, same as add_text_hash on an all-distinct corpus)
        payload = pc.binary_join_element_wise(
            ids_c.cast(pa.string()), t.column("text").cast(pa.string()), ":")
        keys = np.fromiter(
            (int.from_bytes(hashlib.md5(v.as_py().encode()).digest()[:8],
                            "big") >> 1 for v in payload),
            dtype=np.int64, count=len(payload))
        sel = np.lexsort((ids, keys))[:k]
        return pa.table({
            "doc_id": pa.array(ids[sel], type=pa.int64()),
            "sample_key": pa.array(keys[sel], type=pa.int64()),
        })

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    schema = pa.schema([("doc_id", pa.int64()), ("sample_key", pa.int64())])
    batches = list(ds.map_batches(local_bottomk, batch_format="pyarrow")
                   .iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        return schema.empty_table()
    merged = pa.concat_tables(batches)
    order = pc.sort_indices(merged, sort_keys=[("sample_key", "ascending"),
                                               ("doc_id", "ascending")])
    return merged.take(order[:k]).cast(schema)


def doc_sample_stratified(sf_dir: str, rates: dict[str, float] | None = None,
                          default_rate: float = 0.05, salt: str = "s2"):
    """Per-stratum deterministic sampling (e.g. language rebalancing in
    a training mix): each ``lang`` stratum gets its own keep rate, the
    keep decision stays content-hash deterministic. The rate map rides
    the closure (tiny); no shuffle."""
    rates = rates if rates is not None else {"en": 0.5, "de": 0.2}

    def keep(t: pa.Table) -> pa.Table:
        h = D.add_text_hash(
            t.append_column("__salted", pc.binary_join_element_wise(
                t.column("text").cast(pa.string()), salt, "")),
            column="__salted",
        ).column("text_hash").to_numpy(zero_copy_only=False)
        # vectorized per-stratum thresholds: one equality mask per rate
        # entry (rate maps are tiny by contract), not per-row Python
        lang_col = t.column("lang")
        th = np.full(t.num_rows, int(default_rate * (1 << 63)),
                     dtype=np.int64)
        for lg, r in rates.items():
            m = pc.equal(lang_col, lg).to_numpy(zero_copy_only=False)
            th[m] = int(r * (1 << 63))
        return t.filter(pa.array(h < th)).select(["doc_id", "lang"])

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return ds.map_batches(keep, batch_format="pyarrow")


_DECONTAM_DEFAULT = ("table value part hash", "spark order data column",
                     "vector table fast batch")


def doc_decontaminate(sf_dir: str, blocklist: tuple[str, ...] | None = None):
    """Test-set DECONTAMINATION — the canonical pre-training hygiene
    step: flag every document whose text contains any blocklist phrase
    (e.g. benchmark prompts). The blocklist is broadcast once
    (``ray.put``) and each block runs vectorized substring matches
    (Arrow match_substring per phrase) — no shuffle, no state; at 100 TB
    this is a pure map scan. Output: (doc_id, contaminated, n_hits)."""
    phrases = tuple(blocklist) if blocklist is not None else _DECONTAM_DEFAULT
    bref = ray.put(phrases)

    def scan(t: pa.Table) -> pa.Table:
        ps = ray.get(bref)
        col = t.column("text")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = t.num_rows
        hits = np.zeros(n, dtype=np.int64)
        for p in ps:
            hits += pc.match_substring(col, p).to_numpy(
                zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "contaminated": pa.array((hits > 0).astype(np.int64)),
            "n_hits": pa.array(hits),
        })

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        scan, batch_format="pyarrow")


def doc_dedup_substring(sf_dir: str, k: int = 10):
    """Substring-level dedup: count, per document, the k-token windows
    that also appear (verbatim) in at least one OTHER document — the
    repeated-passage primitive from "Deduplicating Training Data Makes
    Language Models Better" (Lee et al., 2022), where dedup acts on
    spans, not whole documents (boilerplate, licenses, quoted chunks).

    Engine shape: one corpus scan builds 64-bit polynomial rolling
    hashes over the whitespace token stream (per-UNIQUE-token crc32
    through dictionary codes, k shifted uint64 multiply-adds — no gram
    strings ever materialize), emits block-deduped (window_hash,
    doc_id, n_positions) partials sliced by ``whash % P``
    (``num_returns=P`` raw-task exchange — the window partials stream
    shard-by-shard with no Sort materialization; 22-34 s -> 17 s warm
    at 4M docs); each whash partition keeps hashes seen in >= 2
    distinct docs, re-aggregates per doc, and routes the per-doc sums
    by ``doc_id % P`` into the second (tiny) combine. Output:
    (doc_id, n_dup_windows) for affected docs only. Shuffle volume is
    (distinct windows per block) x 24 bytes — the corpus text never
    moves. 64-bit window hashes may collide (~1e-4 at 1e8 windows,
    birthday) exactly like the engine-wide 63-bit text_hash contract;
    the string-exact SQL mirror gates the fixed testdata
    value-for-value."""
    P = max(2, _n_parts())

    def window_partial(t: pa.Table):
        import zlib

        col = t.column("text")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        # split_pattern " " == DuckDB string_split (keeps empty tokens)
        words = pc.split_pattern(col, " ")
        offsets = words.offsets.to_numpy().astype(np.int64)
        flat = words.values
        nw = len(flat)
        E = np.zeros(0, np.uint64), np.zeros(0, np.int64), \
            np.zeros(0, np.int64)
        if nw < k:
            return [E for _ in range(P)]
        enc = flat.dictionary_encode()
        uh = np.array([zlib.crc32(u.encode("utf-8"))
                       for u in enc.dictionary.to_pylist()], dtype=np.uint64)
        th = uh[enc.indices.to_numpy(zero_copy_only=False)]
        nwin = nw - k + 1
        H = np.zeros(nwin, dtype=np.uint64)
        B = np.uint64(1099511628211)  # odd base; uint64 wraparound ring
        p = np.uint64(1)
        with np.errstate(over="ignore"):  # mod-2^64 wraparound is the point
            for j in range(k - 1, -1, -1):
                H += th[j:j + nwin] * p
                p = p * B
        starts = np.arange(nwin, dtype=np.int64)
        doc_of = np.searchsorted(offsets, starts, "right") - 1
        valid = starts + k <= offsets[doc_of + 1]
        if not valid.any():
            return [E for _ in range(P)]
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        wh = H[valid]
        wdoc = ids[doc_of[valid]]
        # block-local (hash, doc) position counts (docs never split
        # across batches, so these partials are per-doc complete)
        order = np.lexsort((wdoc, wh))
        hs, ds_ = wh[order], wdoc[order]
        new = np.ones(len(hs), dtype=bool)
        new[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        sidx = np.flatnonzero(new)
        cnt = np.diff(np.append(sidx, len(hs)))
        hu, du = hs[sidx], ds_[sidx]
        cnt = cnt.astype(np.int64)
        # slice into P whash-hash shards (the raw-task exchange: same
        # two-phase shape as compat/label-prop; the 3.5 GB of window
        # partials stream shard-by-shard instead of through a Sort)
        part = (hu % np.uint64(P)).astype(np.int64)
        order = np.argsort(part, kind="stable")
        hu, du, cnt = hu[order], du[order], cnt[order]
        bounds = np.searchsorted(part[order], np.arange(P + 1))
        return [(hu[s:e], du[s:e], cnt[s:e])
                for s, e in zip(bounds[:-1], bounds[1:])]

    def dup_part(P2: int, *shards) -> list:
        h = np.concatenate([s[0] for s in shards])
        E = np.zeros(0, np.int64), np.zeros(0, np.int64)
        if not len(h):
            return [E for _ in range(P2)]
        d = np.concatenate([s[1] for s in shards])
        c = np.concatenate([s[2] for s in shards])
        order = np.lexsort((d, h))
        h, d, c = h[order], d[order], c[order]
        new_h = np.ones(len(h), dtype=bool)
        new_h[1:] = h[1:] != h[:-1]
        hid = np.cumsum(new_h) - 1
        # distinct docs per hash (rows are (hash, doc)-distinct already)
        ndocs = np.bincount(hid)
        dupm = ndocs[hid] >= 2
        if not dupm.any():
            return [E for _ in range(P2)]
        dd, cc = d[dupm], c[dupm]
        uniq, code = np.unique(dd, return_inverse=True)
        n = np.bincount(code, weights=cc).astype(np.int64)
        # route the per-doc sums by doc hash for the second exchange
        part = uniq % P2
        order = np.argsort(part, kind="stable")
        uniq, n = uniq[order], n[order]
        bounds = np.searchsorted(part[order], np.arange(P2 + 1))
        return [(uniq[s:e], n[s:e])
                for s, e in zip(bounds[:-1], bounds[1:])]

    OUT = pa.schema([("doc_id", pa.int64()), ("n_dup_windows", pa.int64())])

    def doc_sum(*shards) -> pa.Table:
        d = np.concatenate([s[0] for s in shards])
        if not len(d):
            return OUT.empty_table()
        w = np.concatenate([s[1] for s in shards])
        uniq, code = np.unique(d, return_inverse=True)
        n = np.bincount(code, weights=w).astype(np.int64)
        return pa.Table.from_arrays([pa.array(uniq), pa.array(n)],
                                    schema=OUT)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    refs = [block_ref for bundle in ds.iter_internal_ref_bundles()
            for block_ref, _md in bundle.blocks if _md.num_rows]
    if not refs:
        return rd.from_arrow(OUT.empty_table())
    shard = ray.remote(window_partial)
    sl = [shard.options(num_returns=P).remote(r) for r in refs]
    dup = ray.remote(dup_part)
    dl = [dup.options(num_returns=P).remote(P, *[s[p] for s in sl])
          for p in range(P)]
    docsum = ray.remote(doc_sum)
    outs = [docsum.remote(*[dd[p] for dd in dl]) for p in range(P)]
    return rd.from_arrow_refs(outs)


def doc_decontaminate_ngram(sf_dir: str,
                            blocklist: tuple[str, ...] | None = None,
                            n: int = 3):
    """N-GRAM overlap decontamination — the realistic benchmark-leak
    test (how WMDP/benchmark decontamination is actually run): a doc is
    contaminated if it shares ANY word n-gram with a blocklist phrase,
    catching partial/reworded inclusions the whole-phrase substring
    scan (``doc_decontaminate``) misses.

    Engine shape: the blocklist's n-gram STRING set (tiny — grams of a
    handful of phrases) is broadcast once; each block builds its docs'
    n-grams vectorized (one whitespace split, two shifted
    ``binary_join_element_wise`` concats over the flat word array,
    doc-boundary grams masked) and counts exact membership via
    ``pc.is_in`` + per-doc ``bincount``. No shuffle, no hashing —
    string-exact, so the SQL mirror (unnest n-grams, IN blocklist
    grams) gates it value-for-value."""
    phrases = tuple(blocklist) if blocklist is not None else _DECONTAM_DEFAULT
    grams = set()
    for p in phrases:
        ws = p.split(" ")
        grams.update(" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1))
    gram_ref = ray.put(pa.array(sorted(grams), pa.string()))

    def scan(t: pa.Table) -> pa.Table:
        gset = ray.get(gram_ref)
        col = t.column("text")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        # split_pattern " " == DuckDB string_split (keeps empty tokens)
        words = pc.split_pattern(col, " ")
        offsets = words.offsets.to_numpy().astype(np.int64)
        flat = words.values
        nw = len(flat)
        hits = np.zeros(t.num_rows, dtype=np.int64)
        if nw >= n:
            parts = [flat.slice(k, nw - n + 1) for k in range(n)]
            doc_grams = parts[0]
            for p_ in parts[1:]:
                doc_grams = pc.binary_join_element_wise(doc_grams, p_, " ")
            hit = pc.is_in(doc_grams, value_set=gset).to_numpy(
                zero_copy_only=False).astype(np.int64)
            # drop grams that straddle a doc boundary: gram at flat
            # position i belongs to the doc iff i + n <= doc's end
            doc_idx = np.repeat(
                np.arange(t.num_rows), np.diff(offsets))[:nw - n + 1]
            valid = (np.arange(nw - n + 1) + n) <= offsets[1:][doc_idx]
            hits = np.bincount(doc_idx, weights=hit * valid,
                               minlength=t.num_rows).astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "contaminated": pa.array((hits > 0).astype(np.int64)),
            "n_hits": pa.array(hits),
        })

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        scan, batch_format="pyarrow")


_CAND_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])


def _band_shard(block: pa.Table, P: int) -> list:
    """Signatures + route for one doc block: minhash band rows sliced
    into P ``band_hash % P`` shards (16 bytes/row) — the shard half of
    the raw-task candidate exchange."""
    bt = D.minhash_bands(block)
    bh = bt.column("band_hash").to_numpy(
        zero_copy_only=False).astype(np.int64)
    ids = bt.column("doc_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    if not len(bh):
        return [(bh, ids) for _ in range(P)]
    part = bh % P
    order = np.argsort(part, kind="stable")
    bh, ids = bh[order], ids[order]
    bounds = np.searchsorted(part[order], np.arange(P + 1))
    return [(bh[s:e], ids[s:e]) for s, e in zip(bounds[:-1], bounds[1:])]


def _bucket_pairs_combine(*shards) -> pa.Table:
    """One band-hash partition: same bucket->triangle pair emission as
    ``_bucket_pairs_part`` (sorted ids per bucket, dedup within the
    partition) over the pulled shards, looping only over buckets with
    >= 2 members."""
    bh = np.concatenate([s[0] for s in shards])
    if not len(bh):
        return _CAND_SCHEMA.empty_table()
    ids = np.concatenate([s[1] for s in shards])
    order = np.lexsort((ids, bh))
    bh, ids = bh[order], ids[order]
    nb = np.ones(len(bh), dtype=bool)
    nb[1:] = bh[1:] != bh[:-1]
    bounds = np.append(np.flatnonzero(nb), len(bh))
    sizes = np.diff(bounds)
    outs_a, outs_b = [], []
    for bi in np.flatnonzero(sizes >= 2):
        s, e = bounds[bi], bounds[bi + 1]
        bucket_ids = ids[s:e]  # ascending via the lexsort secondary key
        iu, ju = np.triu_indices(e - s, 1)
        outs_a.append(bucket_ids[iu])
        outs_b.append(bucket_ids[ju])
    if not outs_a:
        return _CAND_SCHEMA.empty_table()
    pairs = np.unique(
        np.stack([np.concatenate(outs_a), np.concatenate(outs_b)], axis=1),
        axis=0)
    return pa.Table.from_arrays(
        [pa.array(pairs[:, 0]), pa.array(pairs[:, 1])],
        schema=_CAND_SCHEMA)


def _candidate_pair_block_refs(sf_dir: str) -> list:
    """LSH candidate generation as OBJECT-STORE block refs via the
    raw-task shard/combine exchange: each doc block computes its band
    rows and slices them by ``band_hash % P`` (``num_returns=P``), and
    P combine tasks emit their partition's bucket pairs. Locally this
    times the same as the former groupby+Sort (signatures dominate:
    ~9 s of the ~15 s warm stage at 4M); it's kept for the same reason
    the other exchanges use it — no all-to-all barrier, shards stream
    to combines as soon as each block is signed. No candidate pair
    ever lands on the driver — assembly, slot-map construction and
    edge sharding all happen in downstream remote tasks."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    refs = [block_ref for bundle in ds.iter_internal_ref_bundles()
            for block_ref, _md in bundle.blocks if _md.num_rows]
    if not refs:
        return []
    P = max(2, _n_parts())
    shard = ray.remote(_band_shard)
    sl = [shard.options(num_returns=P).remote(r, P) for r in refs]
    combine = ray.remote(_bucket_pairs_combine)
    return [combine.remote(*[s[p] for s in sl]) for p in range(P)]


def _pair_cols(block) -> np.ndarray | None:
    """(n, 2) int64 pair array from an arrow or pandas block, or None."""
    if block is None:
        return None
    if isinstance(block, pa.Table):
        if block.num_rows == 0 or "id_a" not in block.column_names:
            return None
        return np.stack([
            block.column("id_a").to_numpy(zero_copy_only=False),
            block.column("id_b").to_numpy(zero_copy_only=False),
        ], axis=1)
    if len(block) == 0 or "id_a" not in block.columns:
        return None
    return np.stack([block["id_a"].to_numpy(), block["id_b"].to_numpy()],
                    axis=1)


def _assemble_pairs(*blocks):
    """Remote task: concat candidate blocks, canonical (a < b) order,
    global dedup (the same pair can surface from different bands in
    different partitions). Returns (pairs (n,2) int64, n) — the array
    stays in the object store; callers ray.get only the count."""
    arrs = [a for a in (_pair_cols(b) for b in blocks) if a is not None]
    if not arrs:
        return np.empty((0, 2), dtype=np.int64), 0
    cn = np.concatenate(arrs).astype(np.int64, copy=False)
    order = np.lexsort((cn[:, 1], cn[:, 0]))
    cn = cn[order]
    keep = np.ones(len(cn), dtype=bool)
    keep[1:] = (cn[1:, 0] != cn[:-1, 0]) | (cn[1:, 1] != cn[:-1, 1])
    pairs = cn[keep]
    return pairs, len(pairs)


def _build_slot_map(pairs: np.ndarray):
    """Remote task: the (doc -> pair slots) lookup for the distributed
    verify, sorted by doc_id for searchsorted. Output-sized (2 rows per
    candidate pair); built and stored in the object store, read by
    every scan task via its ref."""
    npairs = len(pairs)
    slot_doc = pairs.reshape(-1)  # [a0, b0, a1, b1, ...]
    so = np.argsort(slot_doc, kind="stable")
    return (slot_doc[so],
            np.repeat(np.arange(npairs, dtype=np.int64), 2)[so],
            np.tile(np.array([0, 1], dtype=np.int64), npairs)[so],
            pairs)


_PAIR_SCHEMA = pa.schema([
    ("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64()),
])


def _verified_pairs_ds(sf_dir: str, bc_ref, threshold: float, P: int):
    """Distributed exact-Jaccard verify WITHOUT a corpus-wide join: the
    slot map (bc_ref, object-store resident) is read inside every scan
    task and candidate texts are emitted as (pair_id, side, text) slot
    rows straight from the corpus scan via searchsorted — only candidate
    TEXTS enter the part shuffle. The native slots.join(corpus)
    alternative hash-partitioned all 4M texts for 400k slots (~2x the
    wall time of this whole verify). Returns the LAZY verified-pairs
    Dataset; no pair row touches the driver."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def emit_slots(t: pa.Table) -> pa.Table:
        sd, sp, ss, prs = ray.get(bc_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(sd, ids, "left")
        cnt = np.searchsorted(sd, ids, "right") - lo
        m = cnt > 0
        tot = cnt[m]
        n_out = int(tot.sum())
        if n_out == 0:
            return pa.table({
                "pair_id": pa.array([], pa.int64()),
                "part": pa.array([], pa.int64()),
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "side": pa.array([], pa.int64()),
                "text": pa.array([], t.schema.field("text").type),
            })
        # flatten each matching row's [lo, lo+cnt) slot range
        pos = (np.arange(n_out, dtype=np.int64)
               - np.repeat(np.cumsum(tot) - tot, tot)
               + np.repeat(lo[m], tot))
        pid = sp[pos]
        rows = np.repeat(np.flatnonzero(m), tot)
        return pa.table({
            "pair_id": pa.array(pid, pa.int64()),
            "part": pa.array(pid % P, pa.int64()),
            "id_a": pa.array(prs[pid, 0], pa.int64()),
            "id_b": pa.array(prs[pid, 1], pa.int64()),
            "side": pa.array(ss[pos], pa.int64()),
            "text": t.column("text").take(pa.array(rows)),
        })

    joined = ds.map_batches(emit_slots, batch_format="pyarrow")

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pair_id", "side"], kind="stable")
        pid = g["pair_id"].to_numpy()
        texts = g["text"].tolist()
        ia = g["id_a"].to_numpy()
        ib = g["id_b"].to_numpy()
        nb = np.ones(len(g), dtype=bool)
        nb[1:] = pid[1:] != pid[:-1]
        bounds = np.append(np.flatnonzero(nb), len(g))
        out_a, out_b, out_j = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s == 2:
                j = D.jaccard(texts[s], texts[s + 1])
                if j >= threshold:
                    out_a.append(int(ia[s]))
                    out_b.append(int(ib[s]))
                    out_j.append(round(j, 3))
        return pd.DataFrame({"id_a": pd.array(out_a, dtype="int64"),
                             "id_b": pd.array(out_b, dtype="int64"),
                             "jaccard": pd.array(out_j, dtype="float64")})

    return joined.groupby("part").map_groups(verify_part, batch_format="pandas")


def doc_dedup_minhash(sf_dir: str, threshold: float = 0.8):
    """MinHash+LSH near-dup pairs: shingle->minhash->band rows ->
    bucket groupby -> candidate pairs -> exact-Jaccard verify.

    Scale shape: signatures, bucket pair-finding AND the verify are
    fully distributed, and since r4 the candidate pair list NEVER
    touches the driver either — per-partition candidate blocks are
    assembled, deduped and turned into the verify slot map by REMOTE
    tasks (refs only on the driver). Candidate texts never move: each
    pair becomes two slot rows emitted from the corpus scan via
    searchsorted against the object-store slot map, then a part-grouped
    verify computes the exact Jaccard where the two texts land. The
    driver materializes only the VERIFIED output (this query's public
    contract: a pair table). An adversarial one-giant-bucket pytest
    pins the bounded-driver-memory property.

    Partitioning assumption: one LSH bucket fits in a worker (standard
    LSH contract; bands/rows tuned so buckets stay small)."""
    empty = _PAIR_SCHEMA.empty_table()
    refs = _candidate_pair_block_refs(sf_dir)
    if not refs:
        return empty
    assemble = ray.remote(_assemble_pairs)
    pairs_ref, n_ref = assemble.options(num_returns=2).remote(*refs)
    if ray.get(n_ref) == 0:
        return empty
    bc_ref = ray.remote(_build_slot_map).remote(pairs_ref)
    verified = _verified_pairs_ds(sf_dir, bc_ref, threshold,
                                  _n_parts()).to_pandas()
    if verified.empty or "id_a" not in verified.columns:
        return empty
    verified = verified.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(verified, preserve_index=False).cast(
        _PAIR_SCHEMA)


def doc_decontaminate_neardup(sf_dir: str, threshold: float = 0.8,
                              eval_mod: int = 7):
    """DOC-level eval decontamination — the third decontamination mode
    beside the substring and n-gram phrase checks: training documents
    that are near-duplicates (word-shingle Jaccard >= threshold) of an
    EVAL-set document, the realistic whole-document leak check (eval
    rewrites, re-crawls, boilerplate-wrapped copies). The eval set here
    is the membership predicate ``doc_id % eval_mod == 0`` (mod 7 ~
    a 14% eval slice, sized so the fixed testdata actually contains
    cross-set leaks to gate) so the SQL mirror stays exact; at scale
    it would be a broadcast id/hash set — the pipeline is identical. Rides the full distributed MinHash-LSH
    machinery (signatures -> raw-task bucket exchange -> driver-free
    verify) and filters the verified pairs to cross-set ones; output
    (train_id, eval_id, jaccard), one row per leaking pair."""
    pairs = doc_dedup_minhash(sf_dir, threshold)
    a = pairs.column("id_a").to_numpy(zero_copy_only=False)
    b = pairs.column("id_b").to_numpy(zero_copy_only=False)
    j = pairs.column("jaccard").to_numpy(zero_copy_only=False)
    ea, eb = a % eval_mod == 0, b % eval_mod == 0
    keep = ea ^ eb
    a, b, j, ea = a[keep], b[keep], j[keep], ea[keep]
    train = np.where(ea, b, a)
    ev = np.where(ea, a, b)
    order = np.lexsort((ev, train))
    return pa.table({
        "train_id": pa.array(train[order].astype(np.int64)),
        "eval_id": pa.array(ev[order].astype(np.int64)),
        "jaccard": pa.array(j[order], pa.float64()),
    })


def doc_dedup_simhash(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup pairs via 4x16-bit pigeonhole bucketing, fully
    distributed: per-block signatures -> (seg, seg_val) bucket rows
    sliced by ``(seg_val*4 + seg) % P`` (``num_returns=P`` raw-task
    exchange, same shape as substring/compat — bucket rows stream
    shard-by-shard, no Sort) -> per-partition vectorized Hamming
    verify -> driver dedupe of the (output-sized) pair list. No corpus
    materialization; per-worker memory is bounded by the partition's
    bucket rows."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    P = max(2, _n_parts())

    def seg_shard(block: pa.Table) -> list:
        t = D.simhash_segment_rows(D.simhash_batch(block))
        seg = t.column("seg").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        E = (np.zeros(0, np.int64),) * 4
        if not len(seg):
            return [E for _ in range(P)]
        sv = t.column("seg_val").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sigs = t.column("simhash").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        part = (sv * 4 + seg) % P
        order = np.argsort(part, kind="stable")
        seg, sv, ids, sigs = seg[order], sv[order], ids[order], sigs[order]
        bounds = np.searchsorted(part[order], np.arange(P + 1))
        return [(seg[s:e], sv[s:e], ids[s:e], sigs[s:e])
                for s, e in zip(bounds[:-1], bounds[1:])]

    PAIRS = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                       ("hamming", pa.int64())])

    def bucket_verify_part(*shards) -> pa.Table:
        seg = np.concatenate([s[0] for s in shards])
        if not len(seg):
            return PAIRS.empty_table()
        sv = np.concatenate([s[1] for s in shards])
        ids_all = np.concatenate([s[2] for s in shards])
        sigs_all = np.concatenate([s[3] for s in shards])
        order = np.lexsort((sv, seg))
        seg, sv = seg[order], sv[order]
        ids_all, sigs_all = ids_all[order], sigs_all[order]
        nb = np.ones(len(seg), dtype=bool)
        nb[1:] = (seg[1:] != seg[:-1]) | (sv[1:] != sv[:-1])
        bounds = np.append(np.flatnonzero(nb), len(seg))
        sizes = np.diff(bounds)
        out_a, out_b, out_h = [], [], []
        for bi in np.flatnonzero(sizes >= 2):
            s, e = bounds[bi], bounds[bi + 1]
            lo, hi, ham = D.simhash_bucket_pairs(
                ids_all[s:e], sigs_all[s:e], max_hamming)
            if len(lo):
                out_a.append(lo)
                out_b.append(hi)
                out_h.append(ham)
        if not out_a:
            return PAIRS.empty_table()
        return pa.Table.from_arrays([
            pa.array(np.concatenate(out_a).astype(np.int64)),
            pa.array(np.concatenate(out_b).astype(np.int64)),
            pa.array(np.concatenate(out_h).astype(np.int64)),
        ], schema=PAIRS)

    refs = [block_ref for bundle in ds.iter_internal_ref_bundles()
            for block_ref, _md in bundle.blocks if _md.num_rows]
    if not refs:
        return PAIRS.empty_table()
    shard = ray.remote(seg_shard)
    sl = [shard.options(num_returns=P).remote(r) for r in refs]
    verify = ray.remote(bucket_verify_part)
    outs = ray.get([verify.remote(*[s[p] for s in sl]) for p in range(P)])
    pairs = pa.concat_tables([PAIRS.empty_table()] + outs).to_pandas()
    if pairs.empty:
        return PAIRS.empty_table()
    # a pair is found once per shared segment (<=4): dedupe + sort; this
    # is the OUTPUT, orders of magnitude smaller than the corpus
    pairs = pairs.drop_duplicates().sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(pairs.reset_index(drop=True),
                                preserve_index=False)


def doc_dedup_clusters(sf_dir: str, threshold: float = 0.8):
    """Near-dup CLUSTERS: MinHash-LSH pairs -> connected components ->
    one row per clustered doc with its cluster representative (min
    doc_id). Docs without any near-dup are omitted (singletons)."""
    pairs_t = doc_dedup_minhash(sf_dir, threshold)
    pairs = list(zip(pairs_t.column("id_a").to_pylist(),
                     pairs_t.column("id_b").to_pylist()))
    labels = D.connected_components(pairs)
    items = sorted(labels.items())
    return pa.table({
        "doc_id": pa.array([k for k, _ in items], type=pa.int64()),
        "cluster_id": pa.array([v for _, v in items], type=pa.int64()),
    })


def _chunk_pair_replicate(id_col: str, B: int):
    """map_batches fn for the replicated chunk-pair join: each row gets
    chunk ``id % B`` and is emitted once per chunk-pair group containing
    its chunk (shared by emb_dedup_cosine and doc_dedup_ngram)."""

    def replicate(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        chunk = (ids % B).astype(np.int64)
        pieces = []
        for other in range(B):
            lo = np.minimum(chunk, other)
            hi = np.maximum(chunk, other)
            pieces.append(
                batch.append_column("chunk", pa.array(chunk))
                .append_column("pair_id", pa.array(lo * B + hi))
            )
        return pa.concat_tables(pieces)

    return replicate


_NGRAM_PAIRS_SCHEMA = pa.schema([
    ("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64()),
])

_CONTAIN_PAIRS_SCHEMA = pa.schema([
    ("id_contained", pa.int64()), ("id_container", pa.int64()),
    ("containment", pa.float64()),
])


def _ngram_slice(block: pa.Table, B: int) -> list:
    """Split one read block into B chunk slices (``doc_id % B``) —
    the exchange half of the raw-task chunk-pair join; each slice is
    consumed by the B pair tasks whose pair contains its chunk."""
    ids = block.column("doc_id").to_numpy(zero_copy_only=False)
    chunk = (ids % B).astype(np.int64)
    order = np.argsort(chunk, kind="stable")
    sorted_tbl = block.take(pa.array(order))
    bounds = np.searchsorted(chunk[order], np.arange(B + 1))
    return [sorted_tbl.slice(s, e - s)
            for s, e in zip(bounds[:-1], bounds[1:])]


def _ngram_pair(threshold: float, n: int, na_parts: int,
                *parts, metric: str = "jaccard") -> pa.Table:
    """One chunk pair: ``parts[:na_parts]`` are the A-chunk slices, the
    remainder the B-chunk slices (no remainder = the diagonal A x A
    pair). Inverted-index co-occurrence counting: shared gram codes ->
    sorted (gram, doc) postings per side -> aligned common-gram runs,
    hot grams as one indicator matmul (BLAS), cold grams as COO
    bincount in bounded-memory slices. Exact — same intersection
    counts as per-pair set intersections."""
    a_tbl = pa.concat_tables(parts[:na_parts])
    diag = na_parts == len(parts)
    b_tbl = a_tbl if diag else pa.concat_tables(parts[na_parts:])
    ids_a = a_tbl.column("doc_id").to_numpy(zero_copy_only=False)
    ids_b = ids_a if diag else \
        b_tbl.column("doc_id").to_numpy(zero_copy_only=False)
    texts = a_tbl.column("text").to_pylist()
    if not diag:
        texts = texts + b_tbl.column("text").to_pylist()
    # int32 throughout the counting kernel (codes/postings/COO keys all
    # fit 2^31 at the documented 20k cap): the dense count matrices are
    # memory-bandwidth bound under 32-way task concurrency, and halving
    # the element width is a direct wall-time win
    code: dict = {}
    doc_codes = []
    for t in texts:
        gs = D.char_ngrams(t, n)
        doc_codes.append(np.fromiter(
            (code.setdefault(s, len(code)) for s in gs),
            dtype=np.int32, count=len(gs)))
    sizes = np.array([len(a) for a in doc_codes], dtype=np.int64)
    a_idx = np.arange(len(ids_a))
    b_idx = a_idx if diag else len(ids_a) + np.arange(len(ids_b))

    def postings(idxs):
        if len(idxs) == 0:
            return np.zeros(0, np.int32), np.zeros(0, np.int32)
        grams_f = np.concatenate([doc_codes[i] for i in idxs])
        docs_f = np.repeat(np.arange(len(idxs), dtype=np.int32),
                           sizes[idxs])
        order = np.argsort(grams_f, kind="stable")
        return grams_f[order], docs_f[order]

    def ranges(starts, ends):
        lens = ends - starts
        total = int(lens.sum())
        out_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        return (np.arange(total, dtype=np.int64)
                - np.repeat(out_starts, lens) + np.repeat(starts, lens))

    ga, da = postings(a_idx)
    gb, db = postings(b_idx)
    n_a, n_b = len(a_idx), len(b_idx)
    counts = np.zeros((n_a, n_b), dtype=np.int32)
    if len(ga) and len(gb):
        common = np.intersect1d(ga, gb)
        sa = np.searchsorted(ga, common)
        ea = np.searchsorted(ga, common, side="right")
        sb = np.searchsorted(gb, common)
        eb = np.searchsorted(gb, common, side="right")
        na, nb = ea - sa, eb - sb
        tot = na * nb
        # HOT grams (appear in many docs on both sides) contribute a
        # rank-1 all-ones update over their doc sets: batch them as
        # one indicator matmul (BLAS) instead of COO expansion
        hot_thresh = max(16384, (n_a * n_b) >> 6)
        hot = tot > hot_thresh
        hot_idx = np.flatnonzero(hot)
        hot_mask = hot
        for side_sel in range(0, len(hot_idx), 512):
            hs = hot_idx[side_sel:side_sel + 512]
            H = len(hs)
            Ah = np.zeros((n_a, H), dtype=np.float32)
            Bh = np.zeros((n_b, H), dtype=np.float32)
            Ah[da[ranges(sa[hs], ea[hs])],
               np.repeat(np.arange(H), (ea - sa)[hs])] = 1.0
            Bh[db[ranges(sb[hs], eb[hs])],
               np.repeat(np.arange(H), (eb - sb)[hs])] = 1.0
            counts += (Ah @ Bh.T).astype(np.int32)
        # COLD grams: COO expansion accumulated with bincount
        cold = np.flatnonzero(~hot_mask)
        cum = np.cumsum(tot[cold])
        budget = 16_000_000
        start = 0
        while start < len(cold):
            base = int(cum[start - 1]) if start else 0
            end = int(np.searchsorted(cum, base + budget, side="right")) + 1
            end = min(max(end, start + 1), len(cold))
            ks = cold[start:end]
            na_k, nb_k, tot_k = na[ks], nb[ks], tot[ks]
            rows = np.repeat(da[ranges(sa[ks], ea[ks])],
                             np.repeat(nb_k, na_k))
            t_off = np.concatenate([[0], np.cumsum(tot_k)[:-1]])
            within = (np.arange(int(tot_k.sum()), dtype=np.int64)
                      - np.repeat(t_off, tot_k))
            cols = db[np.repeat(sb[ks], tot_k) + within % np.repeat(nb_k, tot_k)]
            counts += np.bincount(
                rows.astype(np.int64) * n_b + cols,
                minlength=n_a * n_b).reshape(n_a, n_b).astype(np.int32)
            start = end
    sz_a, sz_b = sizes[a_idx], sizes[b_idx]
    if metric == "containment":
        # asymmetric: intersection over the SMALLER distinct-gram set
        denom = np.maximum(np.minimum(sz_a[:, None], sz_b[None, :]), 1)
        score = counts / denom
        mask = score >= threshold
        if diag:
            mask &= np.triu(np.ones_like(mask, dtype=bool), 1)
        ii, jj = np.nonzero(mask)
        a_ids, b_ids = ids_a[ii], ids_b[jj]
        a_sz, b_sz = sz_a[ii], sz_b[jj]
        # contained = the smaller set; size tie -> the larger doc_id
        a_in = (a_sz < b_sz) | ((a_sz == b_sz) & (a_ids > b_ids))
        # round-3 half-away via EXACT integer arithmetic — numpy's
        # half-to-even on c/min hits .0005 boundaries constantly here
        # (small integer denominators), so float round() is a coin flip
        # vs SQL ROUND; the mirror computes the same integer quotient
        c = counts[mask].astype(np.int64)
        d = denom[mask].astype(np.int64)
        r3 = np.floor((c * 2000 + d) / (2.0 * d)) / 1000.0
        return pa.Table.from_arrays([
            pa.array(np.where(a_in, a_ids, b_ids).astype(np.int64)),
            pa.array(np.where(a_in, b_ids, a_ids).astype(np.int64)),
            pa.array(r3, type=pa.float64()),
        ], schema=_CONTAIN_PAIRS_SCHEMA)
    union = sz_a[:, None] + sz_b[None, :] - counts
    jac = np.where(union > 0, counts / np.maximum(union, 1), 1.0)
    mask = jac >= threshold
    if diag:
        mask &= np.triu(np.ones_like(mask, dtype=bool), 1)
    ii, jj = np.nonzero(mask)
    aa, bb = ids_a[ii], ids_b[jj]
    return pa.Table.from_arrays([
        pa.array(np.minimum(aa, bb).astype(np.int64)),
        pa.array(np.maximum(aa, bb).astype(np.int64)),
        pa.array(np.round(jac[mask], 3), type=pa.float64()),
    ], schema=_NGRAM_PAIRS_SCHEMA)


def doc_dedup_ngram(sf_dir: str, threshold: float = 0.4, n: int = 5,
                    n_chunks: int | None = None):
    """Exact character-n-gram Jaccard near-dup pairs via the raw-task
    chunk-pair join: each read block is sliced once into B ``doc_id %
    B`` chunk slices (``num_returns=B`` — no replication, no sort), and
    each of the B(B+1)/2 pair tasks pulls exactly the two chunks it
    compares; n-gram sets are built ONCE per doc inside the pair task.
    Per-worker memory O(2 n_docs/B x doc n-grams); no corpus
    materialization; the pair-above-threshold output is bounded so it
    concats on the driver. (Previously this rode groupby('pair_id')
    .map_groups — Ray Data sizes post-sort blocks by bytes, capping
    this compute-heavy-per-byte stage at ~2-3 concurrent tasks; the
    raw-task layout runs all pairs concurrently AND ships each doc
    once instead of B times. Same deliberate drop below the Dataset
    API as emb_semdedup, measured ~4x here.) Finer-grained than the
    word-shingle MinHash pipeline (catches char-level edits); exact,
    so the brute-force SQL oracle gates it directly."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    B = n_chunks or max(4, int(np.sqrt(2 * _cpus())))
    # zero-row blocks are dropped by METADATA (an empty parquet read
    # yields a schemaless block that would poison the concat downstream)
    refs = [block_ref for bundle in ds.iter_internal_ref_bundles()
            for block_ref, _md in bundle.blocks if _md.num_rows]
    if not refs:
        return _NGRAM_PAIRS_SCHEMA.empty_table()
    slice_task = ray.remote(_ngram_slice)
    sl = [slice_task.options(num_returns=max(2, B)).remote(r, B)
          for r in refs]
    # bandwidth cap (target 8/node): each pair task churns dense
    # (n/B)^2 count matrices (~0.5 GB allocation traffic) — at 32-way
    # concurrency they thrash (measured 40-68 s); 8 concurrent tasks
    # run the same 36 pairs in 21-31 s. Also honest accounting on a
    # shared cluster: these are not 1-cpu-sized tasks.
    pair_task = ray.remote(_ngram_pair).options(num_cpus=_bw_task_cpus(8))
    outs = []
    for c_a in range(B):
        a_parts = [s[c_a] for s in sl]
        outs.append(pair_task.remote(threshold, n, len(a_parts), *a_parts))
        for c_b in range(c_a + 1, B):
            outs.append(pair_task.remote(
                threshold, n, len(a_parts),
                *a_parts, *[s[c_b] for s in sl]))
    return pa.concat_tables([_NGRAM_PAIRS_SCHEMA.empty_table()]
                            + ray.get(outs))


def doc_dedup_containment(sf_dir: str, threshold: float = 0.6, n: int = 5,
                          n_chunks: int | None = None):
    """ASYMMETRIC near-dup pairs by n-gram containment — intersection
    over the SMALLER distinct-gram set (|A∩B| / min(|A|, |B|)): catches
    quote-expansions and supersets whose symmetric Jaccard dilutes
    below any threshold (a doc fully contained in one 10x its size has
    containment 1.0 but Jaccard 0.1). Same raw-task chunk-pair join
    and inverted-index counting kernel as doc_dedup_ngram (the O(n^2)
    exact mode is capped by the same contract; MinHash-LSH is the
    scale path); the emit identifies the contained side (smaller set;
    size tie -> larger doc_id). Exact brute-force SQL mirror."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    B = n_chunks or max(4, int(np.sqrt(2 * _cpus())))
    refs = [block_ref for bundle in ds.iter_internal_ref_bundles()
            for block_ref, _md in bundle.blocks if _md.num_rows]
    if not refs:
        return _CONTAIN_PAIRS_SCHEMA.empty_table()
    slice_task = ray.remote(_ngram_slice)
    sl = [slice_task.options(num_returns=max(2, B)).remote(r, B)
          for r in refs]
    pair_task = ray.remote(_ngram_pair).options(num_cpus=4)
    outs = []
    for c_a in range(B):
        a_parts = [s[c_a] for s in sl]
        outs.append(pair_task.remote(threshold, n, len(a_parts), *a_parts,
                                     metric="containment"))
        for c_b in range(c_a + 1, B):
            outs.append(pair_task.remote(
                threshold, n, len(a_parts),
                *a_parts, *[s[c_b] for s in sl], metric="containment"))
    return pa.concat_tables([_CONTAIN_PAIRS_SCHEMA.empty_table()]
                            + ray.get(outs))


def _lp_partition(x: np.ndarray, P: int) -> np.ndarray:
    """int64 keys -> partition ids via a Fibonacci mixing hash (plain
    ``x % P`` would correlate with any stride structure in the ids)."""
    h = x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(33)) % np.uint64(P)).astype(np.int64)


def _lp_split(keys: np.ndarray, P: int, *arrays: np.ndarray):
    """Split parallel arrays into P shards by ``_lp_partition(keys)``;
    one stable argsort, then contiguous slices (no per-shard scans)."""
    p = _lp_partition(keys, P)
    order = np.argsort(p, kind="stable")
    bounds = np.concatenate([[0], np.cumsum(np.bincount(p, minlength=P))])
    return [tuple(a[order[bounds[q]:bounds[q + 1]]] for a in arrays)
            for q in range(P)]


def _lp_propagate(P, edges, labels, *shortcut_shards):
    """Round phase 1 (one task per edge partition): look up label[u] for
    every (u, v) edge co-located here — ``u`` values are guaranteed
    present in this partition's (sorted) node array because edges were
    partitioned by the same hash — and return the (v, label) offers
    sharded by destination partition of ``v`` (``num_returns=P``, so a
    downstream combine task pulls only its own shard)."""
    nodes, lab = labels
    u, v = edges
    if shortcut_shards:
        u = np.concatenate([u] + [s[0] for s in shortcut_shards])
        v = np.concatenate([v] + [s[1] for s in shortcut_shards])
    offers = lab[np.searchsorted(nodes, u)]
    return tuple(_lp_split(v, P, v, offers))


def _lp_combine(P, labels, make_shortcut, *offer_shards):
    """Round phase 2 (one task per label partition): min-merge the
    incoming (v, label) offers into this partition's labels — grouped
    min via the sorted-``reduceat`` idiom, and each node keeps its own
    current label as the identity. Returns the new labels, the partial
    label-sum (driver convergence check), and — when the next round
    pointer-doubles — the shortcut edges ``label(u) -> u`` generated
    from the NEW labels, pre-sharded by the partition OWNING label(u)
    (a shortcut edge's join key is its label value)."""
    nodes, lab = labels
    new = lab.copy()
    if offer_shards:
        vs = np.concatenate([s[0] for s in offer_shards])
        ls = np.concatenate([s[1] for s in offer_shards])
        if len(vs):
            idx = np.searchsorted(nodes, vs)
            order = np.argsort(idx, kind="stable")
            si, sl = idx[order], ls[order]
            starts = np.flatnonzero(
                np.concatenate([[True], si[1:] != si[:-1]]))
            tgt = si[starts]
            new[tgt] = np.minimum(new[tgt], np.minimum.reduceat(sl, starts))
    psum = int(new.sum())
    if make_shortcut:
        m = new != nodes  # self-pointers add nothing
        return ((nodes, new), psum, *_lp_split(new[m], P, new[m], nodes[m]))
    return (nodes, new), psum


def _min_label_prop(pairs_t: pa.Table, max_rounds: int = 50,
                    jump_after: int = 2,
                    n_parts: int | None = None) -> tuple[pa.Table, int]:
    """Distributed min-label propagation with ADAPTIVE pointer doubling
    over an undirected pair list; returns (sorted (u, label) table,
    rounds run).

    Each round is a two-phase hash shuffle over raw Ray tasks (the one
    place the Dataset API genuinely doesn't fit: an iterative fixpoint
    re-executes the exchange every round, and Ray Data's native
    join + groupby pay seconds of fixed all-to-all overhead PER ROUND —
    measured ~25 s/round at 4M docs locally vs <1 s/round for this
    layout, identical labels). Edges are hash-partitioned by ``u`` ONCE
    into the object store and never move again; only the label table
    (|nodes| rows, not |corpus|) ping-pongs:

      phase 1  per edge partition: vectorized ``searchsorted`` label
               lookup, offers (v, label[u]) sharded by owner of ``v``
               (``num_returns=P`` — each combine pulls only its shard);
      phase 2  per label partition: grouped-min merge (sorted
               ``reduceat``), emitting one partial label-sum.

    From round ``jump_after + 1`` on, phase 2 also emits SHORTCUT edges
    ``label(u) -> u`` pre-sharded by the partition owning label(u), so
    phase 1 of the next round resolves ``label(label(u))`` in the same
    lookup — pointer doubling, dropping the remaining rounds from
    O(cluster diameter) to O(log diameter): a 64-node path graph
    converges in ~8 rounds, not 63. The doubling is gated because real
    near-dup graphs almost always converge within 2 rounds (dense LSH
    clusters have tiny diameters; measured 2 rounds at 4M docs).
    Shortcut edges stay inside a component, so the fixpoint (every node
    = component min) is unchanged and monotone convergence still holds.

    Driver traffic per round: 2P task submissions, P^2 shard refs and P
    partial-sum ints — never row data. Min-propagation labels only ever
    DECREASE, so the label-sum is strictly monotone and "sum unchanged"
    == "no label changed" (the convergence check costs no extra
    exchange). Partitioning assumption (same as ``_n_parts``): one hash
    partition of the CANDIDATE-PAIR graph fits in a worker; raise P for
    bigger graphs."""
    ua = pairs_t.column("id_a").to_numpy(zero_copy_only=False)
    ub = pairs_t.column("id_b").to_numpy(zero_copy_only=False)
    u = np.concatenate([ua, ub]).astype(np.int64, copy=False)
    v = np.concatenate([ub, ua]).astype(np.int64, copy=False)
    nodes = np.unique(u)
    # scale P with the graph, not the corpus: tiny graphs shouldn't pay
    # hundreds of no-op tasks per round (n_parts overrides, for tests
    # that pin the cross-partition shard routing at high P)
    P = n_parts or max(2, min(_n_parts(), 1 + len(u) // 32768))
    edge_refs = [ray.put(s) for s in _lp_split(u, P, u, v)]
    # np.unique gives sorted nodes; the stable split keeps each
    # partition's node array sorted (searchsorted relies on this)
    label_refs = [ray.put((s[0], s[0].copy()))
                  for s in _lp_split(nodes, P, nodes)]
    label_sum = int(nodes.sum())
    return _lp_loop(edge_refs, label_refs, label_sum, P, max_rounds,
                    jump_after)


def _lp_loop(edge_refs, label_refs, label_sum, P, max_rounds, jump_after):
    """The propagation fixpoint over pre-sharded object-store refs —
    shared by the driver-seeded wrapper (_min_label_prop) and the fully
    driver-free LSH path (doc_dedup_clusters_lp). See _min_label_prop
    for the round anatomy; this function touches only refs and P ints
    per round."""
    propagate = ray.remote(_lp_propagate)
    combine = ray.remote(_lp_combine)

    shortcut_refs = None  # [source q][dest p] from the previous combine
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        offer_refs = []
        for p in range(P):
            extra = ([shortcut_refs[q][p] for q in range(P)]
                     if shortcut_refs is not None else [])
            offer_refs.append(propagate.options(num_returns=P).remote(
                P, edge_refs[p], label_refs[p], *extra))
        make_sc = rounds + 1 > jump_after
        new_labels, sum_refs, shortcut_refs = [], [], ([] if make_sc else None)
        for q in range(P):
            out = combine.options(num_returns=2 + (P if make_sc else 0)).remote(
                P, label_refs[q], make_sc,
                *[offer_refs[p][q] for p in range(P)])
            new_labels.append(out[0])
            sum_refs.append(out[1])
            if make_sc:
                shortcut_refs.append(out[2:])
        label_refs = new_labels
        new_sum = sum(ray.get(sum_refs))
        if new_sum == label_sum:  # labels only decrease: sum fixed == converged
            break
        label_sum = new_sum
    else:
        # silent wrong labels would break the ==union-find contract on
        # exactly the large components this scale path exists for
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds; "
            f"a cluster's diameter exceeds 2^max_rounds — raise max_rounds"
        )
    parts = ray.get(label_refs)
    nodes_all = np.concatenate([p[0] for p in parts])
    labs_all = np.concatenate([p[1] for p in parts])
    order = np.argsort(nodes_all, kind="stable")
    return pa.table({
        "u": pa.array(nodes_all[order], type=pa.int64()),
        "label": pa.array(labs_all[order], type=pa.int64()),
    }), rounds


def _lp_edge_shard(block, P: int):
    """Remote task: one verified-pair block -> P symmetrized edge shards
    by _lp_partition(u) (num_returns=P, so each seed task pulls only its
    shard). Pair rows never touch the driver."""
    pr = _pair_cols(block)
    if pr is None:
        e = np.empty(0, dtype=np.int64)
        return tuple((e, e) for _ in range(P))
    u = np.concatenate([pr[:, 0], pr[:, 1]])
    v = np.concatenate([pr[:, 1], pr[:, 0]])
    return tuple(_lp_split(u, P, u, v))


def _lp_seed_partition(*shards):
    """Remote task: concat this partition's edge shards, derive its node
    set (sorted unique u — exactly the nodes hashed here, since edges
    are symmetrized and routed by u) and the initial labels. Returns
    (edges, labels, n_nodes, node_sum); the driver reads only the two
    ints."""
    us = [s[0] for s in shards if len(s[0])]
    vs = [s[1] for s in shards if len(s[1])]
    if not us:
        e = np.empty(0, dtype=np.int64)
        return (e, e), (e, e.copy()), 0, 0
    u = np.concatenate(us)
    v = np.concatenate(vs)
    nodes = np.unique(u)
    return (u, v), (nodes, nodes.copy()), len(nodes), int(nodes.sum())


def doc_dedup_clusters_lp(sf_dir: str, threshold: float = 0.8,
                          max_rounds: int = 50):
    """Near-dup clusters via DISTRIBUTED min-label propagation — the
    scale path for candidate sets too large for driver union-find
    (doc_dedup_clusters documents that contract). Fully driver-free
    end to end (VERDICT r3 item 6): candidate assembly, the verify slot
    map, verified-pair blocks AND the edge shards all live in the
    object store; the driver holds refs, per-partition node counts/sums
    (P ints) and the final (doc_id, cluster_id) output. The propagation
    loop (pointer-doubled, O(log diameter) rounds; see _min_label_prop)
    ping-pongs only label tables. Output == union-find exactly (same
    min-id cluster labels), so the same recursive-CTE SQL oracle gates
    it."""
    empty_out = pa.schema([("doc_id", pa.int64()),
                           ("cluster_id", pa.int64())]).empty_table()
    refs = _candidate_pair_block_refs(sf_dir)
    if not refs:
        return empty_out
    assemble = ray.remote(_assemble_pairs)
    pairs_ref, n_ref = assemble.options(num_returns=2).remote(*refs)
    if ray.get(n_ref) == 0:
        return empty_out
    bc_ref = ray.remote(_build_slot_map).remote(pairs_ref)
    verified = _verified_pairs_ds(sf_dir, bc_ref, threshold, _n_parts())
    vrefs, total = [], 0
    for bundle in verified.iter_internal_ref_bundles():
        for block_ref, md in bundle.blocks:
            vrefs.append(block_ref)
            total += md.num_rows or 0
    if not vrefs:
        return empty_out
    P = max(2, min(_n_parts(), 1 + (2 * total) // 32768))
    shard = ray.remote(_lp_edge_shard)
    shard_refs = [shard.options(num_returns=P).remote(r, P) for r in vrefs]
    seed = ray.remote(_lp_seed_partition)
    edge_refs, label_refs, cnt_refs, sum_refs = [], [], [], []
    for q in range(P):
        o = seed.options(num_returns=4).remote(*[sr[q] for sr in shard_refs])
        edge_refs.append(o[0])
        label_refs.append(o[1])
        cnt_refs.append(o[2])
        sum_refs.append(o[3])
    if sum(ray.get(cnt_refs)) == 0:  # no pair survived the verify
        return empty_out
    label_sum = sum(ray.get(sum_refs))
    out, _rounds = _lp_loop(edge_refs, label_refs, label_sum, P,
                            max_rounds, jump_after=2)
    return pa.table({
        "doc_id": out.column("u"),
        "cluster_id": out.column("label"),
    })


def doc_dedup_near_keep(sf_dir: str, threshold: float = 0.8,
                        max_rounds: int = 50):
    """The deduplicated CORPUS emit — what a training-data pipeline
    actually materializes after near-dup detection: every doc_id that
    survives keeping exactly one representative (the min doc_id) per
    near-dup cluster. Composes the driver-free minhash->label-prop
    path: drop set = cluster members whose label != their own id
    (bounded by the near-dup graph's node count, the same output-size
    contract as doc_dedup_clusters_lp), broadcast sorted once, and the
    kept ids stream out of a corpus scan via a searchsorted mask — the
    corpus itself never shuffles. SQL gate: NOT IN the recursive-CTE
    transitive-closure drop set."""
    clusters = doc_dedup_clusters_lp(sf_dir, threshold, max_rounds)
    d = clusters.column("doc_id").to_numpy(zero_copy_only=False)
    c = clusters.column("cluster_id").to_numpy(zero_copy_only=False)
    dropped = np.sort(d[d != c])
    drop_ref = ray.put(dropped)

    def keep(t: pa.Table) -> pa.Table:
        dr = ray.get(drop_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dr, ids)
        hit = (pos < len(dr)) & (dr[np.minimum(pos, len(dr) - 1)] == ids)
        return pa.table({"doc_id": pa.array(ids[~hit], pa.int64())})

    return _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        keep, batch_format="pyarrow")


_COS_PAIRS_SCHEMA = pa.schema([
    ("id_a", pa.int64()), ("id_b", pa.int64()), ("cos", pa.float64()),
])


def _cos_slice(block: pa.Table, B: int) -> list:
    """Split one read block into B ``vec_id % B`` chunk slices for the
    raw-task chunk-pair join (same exchange as ``_ngram_slice``)."""
    ids = block.column("vec_id").to_numpy(zero_copy_only=False)
    chunk = (ids % B).astype(np.int64)
    order = np.argsort(chunk, kind="stable")
    sorted_tbl = block.take(pa.array(order))
    bounds = np.searchsorted(chunk[order], np.arange(B + 1))
    return [sorted_tbl.slice(s, e - s)
            for s, e in zip(bounds[:-1], bounds[1:])]


def _cos_pair(threshold: float, na_parts: int, *parts) -> pa.Table:
    """One chunk pair: cross (or in-chunk upper-triangle when no B
    slices follow the A slices) chunked-cosine above-threshold pairs."""
    a_tbl = pa.concat_tables(parts[:na_parts])
    diag = na_parts == len(parts)
    ids_a = a_tbl.column("vec_id").to_numpy(zero_copy_only=False)
    if a_tbl.num_rows == 0:
        return _COS_PAIRS_SCHEMA.empty_table()
    m_a = D.normalize_rows(S.embedding_matrix(a_tbl))
    if diag:
        lo, hi, cos = D.cosine_pairs_cross(
            m_a, ids_a, m_a, ids_a, threshold, same=True)
    else:
        b_tbl = pa.concat_tables(parts[na_parts:])
        if b_tbl.num_rows == 0:
            return _COS_PAIRS_SCHEMA.empty_table()
        ids_b = b_tbl.column("vec_id").to_numpy(zero_copy_only=False)
        m_b = D.normalize_rows(S.embedding_matrix(b_tbl))
        lo, hi, cos = D.cosine_pairs_cross(
            m_a, ids_a, m_b, ids_b, threshold, same=False)
    return pa.Table.from_arrays([
        pa.array(lo.astype(np.int64)), pa.array(hi.astype(np.int64)),
        pa.array(np.round(cos, 3), type=pa.float64()),
    ], schema=_COS_PAIRS_SCHEMA)


def emb_dedup_cosine(sf_dir: str, threshold: float = 0.35,
                     n_chunks: int | None = None):
    """Embedding near-dup pairs via the raw-task chunk-pair join (the
    classic distributed all-pairs "triangle" layout, same exchange as
    ``doc_dedup_ngram``): each read block is sliced once into B
    ``vec_id % B`` chunk slices (``num_returns=B`` — vectors ship once,
    not B times through a sort), and each of the B(B+1)/2 pair tasks
    pulls the two chunks it compares and runs one cross-chunk (or
    in-chunk upper-triangle) chunked matmul. Exact — same threshold
    semantics as the brute force — with

    - per-worker memory O(2n/B x dim), independent of corpus size,
    - no driver materialization and no whole-corpus broadcast,
    - exchange volume n rows sliced + each slice read by B pair tasks
      (object-store reads, not a shuffle).

    For approximate high-threshold dedup at extreme scale, LSH-bucket
    both sides instead (see ``emb_ann_lsh``'s bucketing); exact
    all-pairs at cos>0.35 is inherently O(n^2) compute anywhere."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    B = n_chunks or max(4, int(np.sqrt(2 * _cpus())))
    # zero-row blocks are dropped by METADATA (an empty parquet read
    # yields a schemaless block that would poison the concat downstream)
    refs = [block_ref for bundle in ds.iter_internal_ref_bundles()
            for block_ref, _md in bundle.blocks if _md.num_rows]
    if not refs:
        return _COS_PAIRS_SCHEMA.empty_table()
    slice_task = ray.remote(_cos_slice)
    sl = [slice_task.options(num_returns=max(2, B)).remote(r, B)
          for r in refs]
    # bandwidth cap: big-matmul tasks; see doc_dedup_ngram's sizing
    # note and _bw_task_cpus for the per-node-concurrency rule
    pair_task = ray.remote(_cos_pair).options(num_cpus=_bw_task_cpus(16))
    outs = []
    for c_a in range(B):
        a_parts = [s[c_a] for s in sl]
        outs.append(pair_task.remote(threshold, len(a_parts), *a_parts))
        for c_b in range(c_a + 1, B):
            outs.append(pair_task.remote(
                threshold, len(a_parts), *a_parts, *[s[c_b] for s in sl]))
    # the threshold-pair OUTPUT is small, so it concats on the driver
    return pa.concat_tables([_COS_PAIRS_SCHEMA.empty_table()]
                            + ray.get(outs))


# ---- similarity search -----------------------------------------------------


def _min_id_row(ds: rd.Dataset, id_col: str = "vec_id") -> dict:
    """Fetch the min-id row: a distributed min AGGREGATE (block partials,
    tiny combine) + a filtered re-read — never a global sort."""
    min_id = ds.min(id_col)
    return ds.filter(expr=f"{id_col} == {min_id}").take(1)[0]


def emb_similarity_topk(sf_dir: str, k: int = 10):
    """Brute-force cosine top-k of the min-vec_id query against the rest:
    broadcast query, block-local top-k, driver merge (k rows per block)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    first = _min_id_row(ds)
    q_id = first["vec_id"]
    q = np.asarray(first["embedding"], dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def block_topk(batch: pa.Table) -> pa.Table:
        return S.topk_block(batch, ray.get(q_ref), k, exclude_id=q_id)

    parts = list(
        ds.map_batches(block_topk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return S.merge_topk(parts, k)


_BATCH_SEARCH = pa.schema([
    ("query_id", pa.int64()), ("neighbor_id", pa.int64()),
    ("cos", pa.float64()), ("rnk", pa.int64()),
])


def emb_batch_search(sf_dir: str, n_queries: int = 32, k: int = 10):
    """Brute-force cosine top-k for a BATCH of queries — the broadcast
    query-MATRIX baseline (one ray.put of the Q x d panel, ONE
    streaming corpus pass, per-block `X @ Q.T` matmul) that
    emb_similarity_topk's single-query path generalizes to and the
    LSH/IVF variants approximate. Queries are the deterministic
    strided sample (the codebook pick). Per block each query keeps
    its top-k under the knn composite key (round3-micro * 2^33 - id,
    loud 2^33 assert), so block partials stay closed under the final
    merge; the driver folds blocks x Q x k rows. 100-TB shape: the
    corpus streams once regardless of Q; per-block temp is rows x Q."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = _parquet_num_rows(sf_dir, "embeddings")
    qm = _pq_codebook(ds, n, n_queries)
    if qm is None:
        return _BATCH_SEARCH.empty_table()
    stride = max(1, n // n_queries)

    def strided_ids(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        return b.select(["vec_id"]).filter(pa.array(ids % stride == 0))

    qids = pa.concat_tables(
        ds.map_batches(strided_ids, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None)
    ).sort_by("vec_id").column("vec_id").to_numpy(
        zero_copy_only=False)[:n_queries].astype(np.int64)
    q_ref = ray.put((qids, D.normalize_rows(qm)))
    PART = pa.schema([("query_id", pa.int64()), ("neighbor_id", pa.int64()),
                      ("key", pa.int64())])

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return PART.empty_table()
        qi, qn = ray.get(q_ref)
        ids = t.column("vec_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(ids) and ids.max() >= (1 << 33):
            raise ValueError(
                f"vec_id {int(ids.max())} >= 2^33 breaks the composite "
                f"top-k ordering key")
        m = D.normalize_rows(S.embedding_matrix(t)).astype(np.float64)
        cos = np.round(m @ qn.T, 3)                      # rows x Q
        key = np.rint(cos * 1000.0).astype(np.int64) * (1 << 33) \
            - ids[:, None]
        key[np.isin(ids, qi)[:, None] &
            (ids[:, None] == qi[None, :])] = np.iinfo(np.int64).min
        kk = min(k, key.shape[0])
        # top-kk WITHOUT negating: -int64.min overflows back to
        # int64.min, which made sentinel rows sort as the LARGEST keys
        # and crowd real candidates out of the block partial (caught by
        # the r5 emb_ann_recall SQL gate)
        part = np.argpartition(key, key.shape[0] - kk,
                               axis=0)[key.shape[0] - kk:]
        rows = part.reshape(-1)
        qcol = np.tile(np.arange(len(qi), dtype=np.int64),
                       (kk, 1)).reshape(-1)
        return pa.table({
            "query_id": pa.array(qi[qcol]),
            "neighbor_id": pa.array(ids[rows]),
            "key": pa.array(key[rows, qcol]),
        }, schema=PART)

    parts = pa.concat_tables(
        ds.map_batches(block_topk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None))
    return _batch_topk_merge(parts, k)


def _batch_topk_merge(parts: pa.Table, k: int) -> pa.Table:
    """Fold blocks x Q x k batch-search partials into per-query
    (neighbor, cos, rank) rows — block partials were selected under
    the SAME composite key, so the merge is closed (the knn rule)."""
    if parts.num_rows == 0:
        return _BATCH_SEARCH.empty_table()
    qid = parts.column("query_id").to_numpy(zero_copy_only=False)
    nid = parts.column("neighbor_id").to_numpy(zero_copy_only=False)
    key = parts.column("key").to_numpy(zero_copy_only=False)
    drop = key == np.iinfo(np.int64).min
    qid, nid, key = qid[~drop], nid[~drop], key[~drop]
    if not len(qid):
        return _BATCH_SEARCH.empty_table()
    order = np.lexsort((-key, qid))
    qid, nid, key = qid[order], nid[order], key[order]
    new = np.ones(len(qid), dtype=bool)
    new[1:] = qid[1:] != qid[:-1]
    seg = np.cumsum(new) - 1
    starts = np.flatnonzero(new)
    rnk = np.arange(len(qid), dtype=np.int64) - starts[seg] + 1
    keep = rnk <= k
    cos = (key[keep] + nid[keep]) / (1 << 33) / 1000.0
    return pa.table({
        "query_id": pa.array(qid[keep]),
        "neighbor_id": pa.array(nid[keep]),
        "cos": pa.array(np.round(cos, 3)),
        "rnk": pa.array(rnk[keep]),
    }, schema=_BATCH_SEARCH)


def emb_ann_recall(sf_dir: str, n_queries: int = 32, k: int = 10,
                   n_bits: int = 6, n_tables: int = 4,
                   probe_hamming: int = 2):
    """ANN quality EVALUATION — recall@k of the multi-table LSH path
    against the exact batch search over the same strided query panel:
    the measure-don't-guess diagnostic you run before trusting an
    approximate index at 10^12 rows. Two streaming passes over the
    corpus (exact matmul top-k; LSH-pruned top-k where non-candidates
    — hamming > probe in EVERY table — are masked to the sentinel),
    identical composite-key ordering, then a Q x k driver intersect.
    Output: one row per query (n_hits, recall) + the exact candidate
    pair counts (integers, not a ratio: n_cand_pairs/n_pairs quotients
    sit on .5e-6 rounding boundaries — the doc_quality_linear rule).
    SQL-gated since r5: the hyperplane matrix is a deterministic
    seeded constant, so the oracle inlines it as literals and
    re-derives bucketing, multiprobe candidacy, both top-k passes and
    the intersect in SQL (sign-of-dot gates are measure-zero float
    boundaries, the emb_pq_codes idiom). pytest brackets remain:
    recall in [0, 1], recall == 1 when probing every bucket
    (probe_hamming >= n_bits)."""
    exact = emb_batch_search(sf_dir, n_queries=n_queries, k=k)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = _parquet_num_rows(sf_dir, "embeddings")
    qm = _pq_codebook(ds, n, n_queries)
    OUT = pa.schema([("query_id", pa.int64()), ("n_hits", pa.int64()),
                     ("recall", pa.float64()),
                     ("n_cand_pairs", pa.int64()), ("n_pairs", pa.int64())])
    if qm is None or exact.num_rows == 0:
        return OUT.empty_table()
    qn = D.normalize_rows(qm)
    dim = qn.shape[1]
    planes = [S.hyperplanes(dim, n_bits, seed=11 + t)
              for t in range(n_tables)]
    qcodes = np.stack([S.lsh_bucket(qn, p) for p in planes])  # T x Q
    qids = np.unique(exact.column("query_id").to_numpy(
        zero_copy_only=False))
    q_ref = ray.put((qids, qn, planes, qcodes))
    PART = pa.schema([("query_id", pa.int64()), ("neighbor_id", pa.int64()),
                      ("key", pa.int64()), ("n_cand", pa.int64()),
                      ("n_rows", pa.int64())])

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return PART.empty_table()
        qi, qnm, pls, qc = ray.get(q_ref)
        ids = t.column("vec_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(ids) and ids.max() >= (1 << 33):
            raise ValueError(
                f"vec_id {int(ids.max())} >= 2^33 breaks the composite "
                f"top-k ordering key")
        m = D.normalize_rows(S.embedding_matrix(t)).astype(np.float64)
        cand = np.zeros((len(ids), len(qi)), dtype=bool)
        for ti, p in enumerate(pls):
            codes = S.lsh_bucket(m, p)
            x = codes[:, None] ^ qc[ti][None, :]
            ham = np.zeros_like(x)
            while True:
                ham += x & 1
                x >>= 1
                if not x.any():
                    break
            cand |= ham <= probe_hamming
        cos = np.round(m @ qnm.T, 3)
        key = np.rint(cos * 1000.0).astype(np.int64) * (1 << 33) \
            - ids[:, None]
        key[~cand] = np.iinfo(np.int64).min
        key[ids[:, None] == qi[None, :]] = np.iinfo(np.int64).min
        kk = min(k, key.shape[0])
        # top-kk WITHOUT negating (-int64.min wraps to int64.min: the
        # sentinel-crowding bug the r5 SQL gate caught — masked rows
        # displaced true candidates from every block partial and
        # systematically underestimated recall)
        part = np.argpartition(key, key.shape[0] - kk,
                               axis=0)[key.shape[0] - kk:]
        rows = part.reshape(-1)
        qcol = np.tile(np.arange(len(qi), dtype=np.int64),
                       (kk, 1)).reshape(-1)
        return pa.table({
            "query_id": pa.array(qi[qcol]),
            "neighbor_id": pa.array(ids[rows]),
            "key": pa.array(key[rows, qcol]),
            # block-level pruning stats ride on the FIRST row only, so
            # a plain driver sum counts each block exactly once
            "n_cand": pa.array(np.where(
                np.arange(len(rows)) == 0, int(cand.sum()), 0)
                .astype(np.int64)),
            "n_rows": pa.array(np.where(
                np.arange(len(rows)) == 0, len(ids) * len(qi), 0)
                .astype(np.int64)),
        }, schema=PART)

    parts = pa.concat_tables(
        ds.map_batches(block_topk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None))
    approx = _batch_topk_merge(parts.select(
        ["query_id", "neighbor_id", "key"]), k)
    tot_rows = int(pc.sum(parts.column("n_rows")).as_py() or 0)
    tot_cand = int(pc.sum(parts.column("n_cand")).as_py() or 0)
    eq = exact.column("query_id").to_numpy(zero_copy_only=False)
    en = exact.column("neighbor_id").to_numpy(zero_copy_only=False)
    aq = approx.column("query_id").to_numpy(zero_copy_only=False)
    an = approx.column("neighbor_id").to_numpy(zero_copy_only=False)
    hits, recs = [], []
    for q in qids:
        want = set(en[eq == q].tolist())
        got = set(an[aq == q].tolist())
        h = len(want & got)
        hits.append(h)
        recs.append(round(h / max(len(want), 1), 6))
    return pa.table({
        "query_id": pa.array(qids),
        "n_hits": pa.array(np.array(hits, np.int64)),
        "recall": pa.array(np.array(recs)),
        "n_cand_pairs": pa.array(np.full(len(qids), tot_cand, np.int64)),
        "n_pairs": pa.array(np.full(len(qids), tot_rows, np.int64)),
    }, schema=OUT)


def emb_ann_lsh(sf_dir: str, k: int = 10, n_bits: int = 6,
                n_tables: int = 4, probe_hamming: int = 2):
    """Multi-table LSH ANN, distributed: ``n_tables`` independent
    hyperplane tables; every block assigns its OWN rows' buckets per
    table (the planes are tiny closure constants), keeps rows falling in
    the query's multiprobe set (Hamming<=probe_hamming) of ANY table
    (the standard union-of-candidates recall booster), scans candidates
    against the broadcast query, and emits a block-local top-k; the
    driver merges k rows per block. No corpus materialization; per-block
    compute is pruned to the candidate fraction.

    Recall/speed knobs: (n_tables, probe_hamming). The defaults are
    exact-equal to the brute-force top-k on the test corpora (gated by
    the exact-SQL oracle) — note the test embeddings are ISOTROPIC
    random vectors (nearest cos ~0.33), the worst case for LSH, so the
    default probe set covers ~80% of buckets; on real clustered
    embedding corpora radius 1 and a few tables prune to a few percent.
    Recall at shallower settings is asserted in tests."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    first = _min_id_row(ds)
    q_id = first["vec_id"]
    q = np.asarray(first["embedding"], dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    tables = []
    for ti in range(n_tables):
        planes = S.hyperplanes(len(q), n_bits, seed=11 + ti)
        q_bucket = int(S.lsh_bucket(q[None, :], planes)[0])
        probe = np.asarray(
            [b for b in range(1 << n_bits)
             if bin(b ^ q_bucket).count("1") <= probe_hamming],
            dtype=np.int64,
        )
        tables.append((planes, probe))
    bcast = ray.put((q, tables))

    def block_scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return S._EMPTY_TOPK.empty_table()
        qv, tabs = ray.get(bcast)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        m = D.normalize_rows(S.embedding_matrix(batch))
        mask = np.zeros(len(ids), dtype=bool)
        for planes, probe_arr in tabs:
            mask |= np.isin(S.lsh_bucket(m, planes), probe_arr)
        mask &= ids != q_id
        return S.topk_rows(ids[mask], m[mask] @ qv, k)

    parts = list(
        ds.map_batches(block_scan, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return S.merge_topk(parts, k)


def emb_ann_ivf(sf_dir: str, k: int = 10, nlist: int = 32, nprobe: int = 24,
                sample_stride: int | None = None):
    """IVF ANN (the coarse-quantizer scale path): train a tiny spherical
    k-means on a strided SAMPLE (deterministic, driver-side, a few
    hundred vectors regardless of corpus size), broadcast the centroids,
    assign each block's rows distributed, scan only rows whose list is
    among the query's ``nprobe`` nearest centroids, block-local top-k,
    driver merge of k/block. Per-worker memory O(batch); no corpus
    materialization.

    Recall/speed knob: nprobe/nlist. The defaults (24/32 lists probed)
    are exact-equal to the brute-force top-k on the test corpora and
    gated by the exact-SQL oracle — the test embeddings are isotropic
    (no cluster structure, the IVF worst case), so most lists must be
    probed for full recall; on real clustered corpora nprobe of 1-2
    out of hundreds suffices. Recall at shallow settings is asserted
    in tests."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    first = _min_id_row(ds)
    q_id = first["vec_id"]
    q = np.asarray(first["embedding"], dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)

    # deterministic strided sample for the coarse quantizer (distributed
    # filter; only the sample rows reach the driver). The stride scales
    # with the corpus so the DRIVER k-means input stays ~2k vectors
    # regardless of corpus size (r3: a fixed stride shipped n/7 vectors
    # to the driver at 4M, making IVF slower than brute force).
    if sample_stride is None:
        target = max(512, nlist * 64)
        sample_stride = max(7, _parquet_num_rows(sf_dir, "embeddings") // target)

    def strided(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % sample_stride == 0))

    sample_t = pa.concat_tables(
        ds.map_batches(strided, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vec_id")  # block arrival order is nondeterministic
    centroids = S.ivf_centroids(S.embedding_matrix(sample_t), nlist)
    probe = np.argsort(-(centroids @ q))[:nprobe]
    bcast = ray.put((q, centroids, np.asarray(probe, dtype=np.int64)))

    def block_scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return S._EMPTY_TOPK.empty_table()
        qv, cent, probe_arr = ray.get(bcast)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        m = D.normalize_rows(S.embedding_matrix(batch))
        lists = S.ivf_assign(m, cent)
        mask = np.isin(lists, probe_arr) & (ids != q_id)
        return S.topk_rows(ids[mask], m[mask] @ qv, k)

    parts = list(
        ds.map_batches(block_scan, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return S.merge_topk(parts, k)


def emb_kmeans(sf_dir: str, k: int = 16, iters: int = 5,
               sample_stride: int | None = None):
    """Distributed Lloyd k-means over the embedding corpus — the
    cluster-then-curate primitive (SemDeDup bucketing, diversity
    sampling, domain discovery). Classic broadcast-iterate shape:

      init   deterministic strided sample -> driver seed pass
             (S.ivf_centroids with 1 refinement iter, tiny input);
      round  broadcast centroids (ray.put once per round) -> one
             map_batches pass emits per-block PARTIAL (sum_vec, count)
             per cluster -> driver reduces k x (dim+1) floats and
             updates centroids.  Empty clusters keep their previous
             centroid (the standard Lloyd convention).

    Each round is one streaming corpus pass; driver state is k x dim
    floats — nothing corpus-sized anywhere. Output: k rows (cluster,
    n_members, centroid). Iterative fixpoints are not SQL-expressible
    -> rows-only driver gate; pytest pins exact equality with a numpy
    Lloyd reference on planted separated clusters."""
    # iterative passes (sample + iters rounds + final count) re-consume
    # the corpus: materialize the pruned read ONCE into the object store
    # (blocks stay distributed; Ray spills past store capacity) instead
    # of re-decoding parquet every round
    ds = _read(sf_dir, "embeddings",
               columns=["vec_id", "embedding"]).materialize()
    n = _parquet_num_rows(sf_dir, "embeddings")
    if sample_stride is None:
        sample_stride = max(1, n // max(256, k * 16))

    def strided(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % sample_stride == 0))

    sample_t = pa.concat_tables(
        ds.map_batches(strided, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None))
    # blocks arrive in scheduling order — sort by vec_id so the seeding
    # (rng.choice over row INDICES) is deterministic run to run
    sample_t = sample_t.sort_by("vec_id")
    cent = S.ivf_centroids(S.embedding_matrix(sample_t), k, iters=1)

    PART = pa.schema([("cluster", pa.int64()), ("cnt", pa.int64()),
                      ("vsum", pa.list_(pa.float64()))])

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return PART.empty_table()
            c = ray.get(cent_ref)
            # spherical k-means like ivf_centroids: normalized rows, so
            # the mean/renormalize update matches the seed pass exactly
            m = D.normalize_rows(S.embedding_matrix(b)).astype(np.float64)
            asg = np.argmax(m @ c.T, axis=1)
            kk = c.shape[0]
            cnt = np.bincount(asg, minlength=kk)
            vs = np.zeros((kk, m.shape[1]))
            np.add.at(vs, asg, m)
            dim = m.shape[1]
            flat = pa.array(vs.reshape(-1))
            offs = pa.array(np.arange(0, (kk + 1) * dim, dim, dtype=np.int32))
            return pa.Table.from_arrays([
                pa.array(np.arange(kk, dtype=np.int64)),
                pa.array(cnt.astype(np.int64)),
                pa.ListArray.from_arrays(offs, flat),
            ], schema=PART)

        tot_cnt = np.zeros(k, dtype=np.int64)
        tot_sum = np.zeros((k, cent.shape[1]))
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
            cl = b.column("cluster").to_numpy(zero_copy_only=False)
            tot_cnt[cl] += b.column("cnt").to_numpy(zero_copy_only=False)
            vsc = b.column("vsum")
            vsc = vsc.combine_chunks() if isinstance(vsc, pa.ChunkedArray) else vsc
            tot_sum[cl] += vsc.values.to_numpy(zero_copy_only=False).reshape(
                len(cl), -1)
        nz = tot_cnt > 0
        new_cent = cent.copy()
        new_cent[nz] = tot_sum[nz] / tot_cnt[nz, None]
        # cosine-space Lloyd like ivf_centroids: renormalize means
        norms = np.linalg.norm(new_cent, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cent = new_cent / norms

    # reported membership is w.r.t. the RETURNED centroids (one final
    # count-only pass; the loop's counts lag the update by one round)
    fin_ref = ray.put(cent)

    def count_pass(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        m = D.normalize_rows(S.embedding_matrix(b)).astype(np.float64)
        asg = np.argmax(m @ ray.get(fin_ref).T, axis=1)
        cnt = np.bincount(asg, minlength=k)
        return pa.table({"cluster": pa.array(np.arange(k, dtype=np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    tot_cnt = np.zeros(k, dtype=np.int64)
    for b in ds.map_batches(count_pass, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        tot_cnt[b.column("cluster").to_numpy(zero_copy_only=False)] += \
            b.column("cnt").to_numpy(zero_copy_only=False)

    dim = cent.shape[1]
    flat = pa.array(cent.reshape(-1))
    offs = pa.array(np.arange(0, (k + 1) * dim, dim, dtype=np.int32))
    return pa.table({
        "cluster": pa.array(np.arange(k, dtype=np.int64)),
        "n_members": pa.array(tot_cnt),
        "centroid": pa.ListArray.from_arrays(offs, flat),
    })


_MM_SCHEMA = pa.schema([("mn", pa.list_(pa.float64())),
                        ("mx", pa.list_(pa.float64()))])


def _sq8_minmax(ds: rd.Dataset):
    """Streaming per-dim global (min, max) over the embedding column:
    one 2 x dim partial row leaves each block, the driver reduce is
    blocks x dim floats. Returns (mn, mx) or (None, None) on empty."""

    def mm_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _MM_SCHEMA.empty_table()
        m = S.embedding_matrix(t).astype(np.float64)
        return pa.table({"mn": [m.min(axis=0)], "mx": [m.max(axis=0)]},
                        schema=_MM_SCHEMA)

    parts = pa.concat_tables(
        [_MM_SCHEMA.empty_table()]
        + list(ds.map_batches(mm_partial, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow", batch_size=None)))
    if parts.num_rows == 0:
        return None, None
    mns = np.stack([np.asarray(r) for r in parts.column("mn").to_pylist()])
    mxs = np.stack([np.asarray(r) for r in parts.column("mx").to_pylist()])
    return mns.min(axis=0), mxs.max(axis=0)


def emb_quantize_sq8(sf_dir: str):
    """Scalar (int8) quantization of the embedding corpus — the
    standard 4x memory reduction that makes 100-TB-scale ANN indexes
    fit in cluster RAM (FAISS's SQ8 codec shape). Two streaming passes:

      pass 1  per-block partial (per-dim min, per-dim max) — one
              2 x dim row leaves each block; driver reduce is
              blocks x dim floats (corpus-independent width);
      pass 2  broadcast (mn, range) once (``ray.put``) and each block
              encodes codes[d] = clamp(floor((x-mn)/(mx-mn)*256), 0,
              255) vectorized over the (rows x dim) matrix.

    Codes ship as list<int64> so the DuckDB gate compares exact BIGINT
    values (production storage would be uint8 — same arithmetic). The
    engine computes in float64 from the float32 values — identical IEEE
    op order to the oracle's CAST AS DOUBLE, and ``floor`` (not round)
    on BOTH sides dodges numpy-bankers vs SQL half-away rounding.
    Constant dimensions (mx == mn) encode 0."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    mn, mx = _sq8_minmax(ds)
    if mn is None:
        return rd.from_arrow(pa.schema([
            ("vec_id", pa.int64()),
            ("codes", pa.list_(pa.int64()))]).empty_table())
    mm_ref = ray.put((mn, mx))

    def encode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "codes": pa.array([], pa.list_(pa.int64()))})
        lo, hi = ray.get(mm_ref)
        m = S.embedding_matrix(t).astype(np.float64)
        rng = hi - lo
        live = rng > 0
        scaled = np.floor((m - lo) / np.where(live, rng, 1.0) * 256.0)
        codes = np.clip(scaled, 0.0, 255.0).astype(np.int64)
        codes[:, ~live] = 0
        n, dim = codes.shape
        offs = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
        return pa.table({
            "vec_id": t.column("vec_id"),
            "codes": pa.ListArray.from_arrays(offs,
                                              pa.array(codes.reshape(-1))),
        })

    return ds.map_batches(encode, batch_format="pyarrow")


def _rp_signs(dim: int, k: int) -> np.ndarray:
    """Deterministic ±1 projection matrix (dim x k): sign of middle bit
    16 of an LCG over the flat index — closed-form integer arithmetic
    the DuckDB oracle reproduces exactly (the LCG's LOW bit alternates
    with period 2, so a middle bit is the one to sample)."""
    idx = np.arange(dim, dtype=np.int64)[:, None] * k + np.arange(k, dtype=np.int64)
    h = (1103515245 * idx + 12345) % 2147483648
    return np.where((h >> 16) & 1 == 0, 1, -1).astype(np.int64)


def emb_project_rp(sf_dir: str, k: int = 16):
    """Signed random projection over the SQ8-quantized corpus — the
    dimensionality-reduction sketch (dim -> k) that LSH-style indexes
    and cheap pre-filters run before exact scoring, computed entirely
    in integers so the gate is hash-exact. Same two streaming passes as
    ``emb_quantize_sq8`` (per-dim min/max partials, then broadcast
    encode); each block then runs ONE (rows x dim) @ (dim x k) int64
    matmul against the deterministic ±1 sign matrix (``_rp_signs``,
    built per batch — dim x k is tiny). Output list<int64> of the k
    projections per vector; no shuffle, corpus never materializes."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    mn, mx = _sq8_minmax(ds)
    empty = pa.schema([("vec_id", pa.int64()),
                       ("proj", pa.list_(pa.int64()))]).empty_table()
    if mn is None:
        return rd.from_arrow(empty)
    mm_ref = ray.put((mn, mx))

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        lo, hi = ray.get(mm_ref)
        m = S.embedding_matrix(t).astype(np.float64)
        rng = hi - lo
        live = rng > 0
        scaled = np.floor((m - lo) / np.where(live, rng, 1.0) * 256.0)
        codes = np.clip(scaled, 0.0, 255.0).astype(np.int64)
        codes[:, ~live] = 0
        # BLAS dgemm, not int64 matmul (numpy integer matmul has no SIMD
        # path — measured 3x the whole stage). Exact: |proj| <= dim*255
        # << 2^53, so float64 accumulation is integer-exact.
        proj = (codes.astype(np.float64)
                @ _rp_signs(codes.shape[1], k).astype(np.float64)
                ).astype(np.int64)
        n = proj.shape[0]
        offs = pa.array(np.arange(0, (n + 1) * k, k, dtype=np.int32))
        return pa.table({
            "vec_id": t.column("vec_id"),
            "proj": pa.ListArray.from_arrays(offs,
                                             pa.array(proj.reshape(-1))),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def emb_sample_balanced(sf_dir: str, per_label: int = 10):
    """Cluster-balanced subsample — exactly ``per_label`` vectors per
    label, drawn by a deterministic reservoir (the dataset-rebalancing
    step: equal representation per class/domain regardless of the
    corpus mix). Key = md5(vec_id) >> 1, bottom-k per LABEL under
    (key, vec_id): block-local per-label bottom-k is closed under merge
    (the doc_group_topk monoid — partial ordering == final ordering),
    so each block emits <= labels x k rows and the driver merge is
    bounded; no shuffle, reproducible across partitionings. Exact SQL
    mirror: ROW_NUMBER() PARTITION BY label ORDER BY the same md5."""
    import hashlib

    SCHEMA = pa.schema([("vec_id", pa.int64()), ("label", pa.int64()),
                        ("sample_key", pa.int64())])

    def local_bottomk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return SCHEMA.empty_table()
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        labels = t.column("label").to_numpy(
            zero_copy_only=False).astype(np.int64)
        keys = np.fromiter(
            (int.from_bytes(
                hashlib.md5(str(int(v)).encode()).digest()[:8],
                "big") >> 1 for v in ids),
            dtype=np.int64, count=len(ids))
        order = np.lexsort((ids, keys, labels))
        sl, sk, si = labels[order], keys[order], ids[order]
        new = np.ones(len(sl), dtype=bool)
        new[1:] = sl[1:] != sl[:-1]
        starts = np.maximum.accumulate(
            np.where(new, np.arange(len(sl)), 0))
        rank = np.arange(len(sl)) - starts
        keep = rank < per_label
        return pa.table({
            "vec_id": pa.array(si[keep], type=pa.int64()),
            "label": pa.array(sl[keep], type=pa.int64()),
            "sample_key": pa.array(sk[keep], type=pa.int64()),
        })

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "label"])
    batches = list(ds.map_batches(local_bottomk, batch_format="pyarrow")
                   .iter_batches(batch_format="pyarrow", batch_size=None))
    batches = [b for b in batches if b.num_rows]
    if not batches:
        return SCHEMA.empty_table()
    merged = pa.concat_tables(batches)
    labels = merged.column("label").to_numpy(zero_copy_only=False)
    keys = merged.column("sample_key").to_numpy(zero_copy_only=False)
    ids = merged.column("vec_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, keys, labels))
    sl = labels[order]
    new = np.ones(len(sl), dtype=bool)
    new[1:] = sl[1:] != sl[:-1]
    starts = np.maximum.accumulate(np.where(new, np.arange(len(sl)), 0))
    keep = (np.arange(len(sl)) - starts) < per_label
    sel = order[keep]
    return pa.table({
        "vec_id": pa.array(ids[sel], type=pa.int64()),
        "label": pa.array(labels[sel], type=pa.int64()),
        "sample_key": pa.array(keys[sel], type=pa.int64()),
    })


def emb_ann_sq8(sf_dir: str, k: int = 10):
    """Asymmetric SQ8 search (the FAISS SQ8 query path): brute-force
    cosine top-k of the FULL-PRECISION min-vec_id query against the
    SQ8-quantized corpus, each corpus vector midpoint-reconstructed
    from its codes (x^ = mn + (code + 0.5) * (mx - mn) / 256) — the
    memory story of ``emb_quantize_sq8`` made queryable: the scan
    touches 1 byte/dim instead of 4 at full scale. Two streaming
    passes (min/max partials, then encode+reconstruct+score per block
    with block-local top-k); driver sees k rows per block. Exact SQL
    mirror: the oracle reconstructs through the same integer codes and
    f64 arithmetic, so values gate exactly (not a recall contract)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    mn, mx = _sq8_minmax(ds)
    if mn is None:
        return pa.schema([("vec_id", pa.int64()),
                          ("cos", pa.float64())]).empty_table()
    first = _min_id_row(ds)
    q_id = first["vec_id"]
    q = np.asarray(first["embedding"], dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    ref = ray.put((q, mn, mx))

    def block_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return S.topk_rows(np.zeros(0, np.int64), np.zeros(0), k)
        qv, lo, hi = ray.get(ref)
        m = S.embedding_matrix(batch).astype(np.float64)
        rng = hi - lo
        live = rng > 0
        codes = np.clip(
            np.floor((m - lo) / np.where(live, rng, 1.0) * 256.0),
            0.0, 255.0)
        codes[:, ~live] = 0.0
        # rng == 0 dims reconstruct to mn with no special case
        xh = lo + (codes + 0.5) * (rng / 256.0)
        norms = np.linalg.norm(xh, axis=1)
        norms[norms == 0] = 1.0
        sims = (xh / norms[:, None]) @ qv
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        keep = ids != q_id
        return S.topk_rows(ids[keep], sims[keep], k)

    parts = list(
        ds.map_batches(block_topk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None))
    return S.merge_topk(parts, k)


_PQ_SCHEMA = pa.schema([("vec_id", pa.int64()),
                        ("codes", pa.list_(pa.int64()))])
_ADC_SCHEMA = pa.schema([("vec_id", pa.int64()), ("adc", pa.float64())])


def _pq_codebook(ds: rd.Dataset, n: int, ksub: int) -> np.ndarray | None:
    """Deterministic strided-sample codebook: the first ``ksub`` corpus
    vectors (by vec_id) with ``vec_id % stride == 0``, stride =
    ``n // ksub`` — sample-seeded quantizers are the standard cheap
    init, and a closed-form pick (unlike k-means) keeps the SQL mirror
    exact. One tiny streaming pass; returns a ksub x dim float64
    matrix (or None on an empty corpus)."""
    stride = max(1, n // ksub)

    def strided(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % stride == 0))

    parts = list(ds.map_batches(strided, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow", batch_size=None))
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return None
    t = pa.concat_tables(parts).sort_by("vec_id").slice(0, ksub)
    return S.embedding_matrix(t).astype(np.float64)


def _pq_encode(m: np.ndarray, cb: np.ndarray, M: int) -> np.ndarray:
    """Exact-int PQ assignment: per subspace, argmin over the codebook
    under the (floor(d2 * 1e6), code) composite BIGINT key. The float
    squared-L2 enters ONLY through the floored integer, so DuckDB's
    ``arg_min`` over the same key picks identical codes (floor on both
    sides — numpy rounds half-to-even, SQL ROUND half-away, so round()
    parity would be a coin flip at .5; see emb_quantize_sq8). Chunked
    at 4096 rows so the rows x ksub x dsub diff temp stays bounded at
    any block size (the ivf_assign lesson: unbounded per-block matmul
    temps make 32 concurrent workers bandwidth-bound)."""
    rows, dim = m.shape
    ksub = cb.shape[0]
    dsub = dim // M
    codes = np.empty((rows, M), dtype=np.int64)
    code_ix = np.arange(ksub, dtype=np.int64)
    for mi in range(M):
        xs = m[:, mi * dsub:(mi + 1) * dsub]
        cs = cb[:, mi * dsub:(mi + 1) * dsub]
        for s in range(0, rows, 4096):
            x = xs[s:s + 4096]
            d2 = ((x[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)
            key = np.floor(d2 * 1e6).astype(np.int64) * 64 + code_ix
            codes[s:s + 4096, mi] = key.argmin(axis=1)
    return codes


def emb_kmeans_step(sf_dir: str, k: int = 16):
    """ONE exactly-gated Lloyd iteration: assign every vector to its
    nearest deterministic strided seed (the _pq_codebook pick) and emit
    each cluster's size and updated mean, exploded to (cluster, dim)
    rows like emb_label_centroids. ``emb_kmeans`` stays the iterative
    fixpoint (rows-only by nature); this gates the assign+update STEP
    against SQL exactly: assignment routes the squared-L2 through the
    (floor(d2*1e6)*64 + j) composite BIGINT key (the _pq_encode idiom
    at full dim — summation-order noise is ~1e-15 relative and cannot
    flip an integer key except at measure-zero boundaries, and a seed's
    own distance is exactly 0 in the direct diff-square form on both
    sides), means under ROUND-4. One streaming pass, k x dim driver
    state, chunked 4096-row diff temps (the ivf_assign lesson)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = _parquet_num_rows(sf_dir, "embeddings")
    OUT = pa.schema([("cluster", pa.int64()), ("dim", pa.int64()),
                     ("n_members", pa.int64()), ("centroid", pa.float64())])
    cb = _pq_codebook(ds, n, k)
    if cb is None:
        return OUT.empty_table()
    cb_ref = ray.put(cb)
    PART = pa.schema([("cluster", pa.int64()), ("dim", pa.int64()),
                      ("s", pa.float64()), ("cnt", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return PART.empty_table()
        c = ray.get(cb_ref)
        kk, d = c.shape
        x = S.embedding_matrix(t).astype(np.float64)
        asg = np.empty(len(x), dtype=np.int64)
        jix = np.arange(kk, dtype=np.int64)
        for s in range(0, len(x), 4096):
            xx = x[s:s + 4096]
            d2 = ((xx[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            key = np.floor(d2 * 1e6).astype(np.int64) * 64 + jix
            asg[s:s + 4096] = key.argmin(axis=1)
        uniq, codes = np.unique(asg, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.float64)
        np.add.at(sums, codes, x)
        cnts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "cluster": pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(uniq))),
            "s": pa.array(sums.reshape(-1)),
            "cnt": pa.array(np.repeat(cnts, d)),
        }, schema=PART)

    parts = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None))
    g = parts.group_by(["cluster", "dim"]).aggregate(
        [("s", "sum"), ("cnt", "sum")])
    return pa.table({
        "cluster": g.column("cluster"),
        "dim": g.column("dim"),
        "n_members": g.column("cnt_sum"),
        "centroid": pc.round(pc.divide(g.column("s_sum"),
                                       pc.cast(g.column("cnt_sum"),
                                               pa.float64())), 4),
    }, schema=OUT)


def emb_pq_codes(sf_dir: str, M: int = 8, ksub: int = 16):
    """Product quantization of the embedding corpus (Jegou et al. 2011,
    the codec behind FAISS IVFPQ): split dim into M subspaces and store
    each sub-vector as the index of its nearest codebook entry — here
    64 float32 -> 8 codes, the 32x compression that lets a 10^12-row
    ANN index live in cluster RAM. Distributed shape mirrors
    emb_quantize_sq8: one tiny codebook sample pass, ``ray.put`` the
    ksub x dim matrix once, then ONE streaming encode pass
    (_pq_encode's chunked integer-keyed argmin). Gate: codes are exact
    BIGINTs — the only float step is floored identically on both
    sides. k-means codebook refinement is deliberately emb_kmeans'
    territory (iterative fixpoints are not SQL-expressible)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = _parquet_num_rows(sf_dir, "embeddings")
    cb = _pq_codebook(ds, n, ksub)
    if cb is None:
        return rd.from_arrow(_PQ_SCHEMA.empty_table())
    if cb.shape[1] % M:
        raise ValueError(f"dim {cb.shape[1]} not divisible by M={M}")
    cb_ref = ray.put(cb)

    def encode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PQ_SCHEMA.empty_table()
        codes = _pq_encode(S.embedding_matrix(t).astype(np.float64),
                           ray.get(cb_ref), M)
        rows = codes.shape[0]
        offs = pa.array(np.arange(0, (rows + 1) * M, M, dtype=np.int32))
        return pa.Table.from_arrays([
            t.column("vec_id"),
            pa.ListArray.from_arrays(offs, pa.array(codes.reshape(-1))),
        ], schema=_PQ_SCHEMA)

    return ds.map_batches(encode, batch_format="pyarrow")


def emb_pq_error(sf_dir: str, M: int = 8, ksub: int = 16):
    """Per-subspace PQ quantization error (mean squared L2 between each
    sub-vector and its assigned codebook entry) — the codec-quality
    diagnostic that tells you whether M/ksub are adequate before you
    build the 10^12-row index on them. One streaming pass after the
    codebook sample: each block encodes (same _pq_encode integer-key
    assignment) and emits an M x (sum_d2, count) partial; the driver
    folds M pairs. Exact SQL mirror through the same integer codes;
    ROUND-6 on the mean."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = _parquet_num_rows(sf_dir, "embeddings")
    schema = pa.schema([("m", pa.int64()), ("mse", pa.float64())])
    cb = _pq_codebook(ds, n, ksub)
    if cb is None:
        return schema.empty_table()
    if cb.shape[1] % M:
        raise ValueError(f"dim {cb.shape[1]} not divisible by M={M}")
    dsub = cb.shape[1] // M
    cb_ref = ray.put(cb)
    PART = pa.schema([("m", pa.int64()), ("sum_d2", pa.float64()),
                      ("cnt", pa.int64())])

    def err_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return PART.empty_table()
        cbm = ray.get(cb_ref)
        x = S.embedding_matrix(t).astype(np.float64)
        codes = _pq_encode(x, cbm, M)
        sums = np.empty(M)
        for mi in range(M):
            diff = x[:, mi * dsub:(mi + 1) * dsub] \
                - cbm[codes[:, mi], mi * dsub:(mi + 1) * dsub]
            sums[mi] = (diff ** 2).sum()
        return pa.table({"m": pa.array(np.arange(M, dtype=np.int64)),
                         "sum_d2": pa.array(sums),
                         "cnt": pa.array([t.num_rows] * M, pa.int64())},
                        schema=PART)

    tot = np.zeros(M)
    cnt = 0
    for b in ds.map_batches(err_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0:
            continue
        mi = b.column("m").to_numpy(zero_copy_only=False)
        tot[mi] += b.column("sum_d2").to_numpy(zero_copy_only=False)
        cnt += int(b.column("cnt")[0].as_py())
    return pa.table({"m": pa.array(np.arange(M, dtype=np.int64)),
                     "mse": pa.array(np.round(tot / cnt, 6))}, schema=schema)


def emb_ann_pq(sf_dir: str, k: int = 10, M: int = 8, ksub: int = 16):
    """Asymmetric-distance PQ search (ADC, the FAISS query path over
    emb_pq_codes' codec): the full-precision min-vec_id query expands
    once into an M x ksub lookup table of partial squared-L2 distances;
    each corpus vector then scores as M table lookups + an M-term sum —
    per-vector cost independent of dim, the property that makes PQ the
    trillion-scale scan. Two streaming passes (codebook sample, then
    encode+LUT-score+block-local top-k); the driver merges k rows per
    block under the SAME (round6(adc), vec_id asc) key the blocks used
    (partial top-k is closed under merge only when partial ordering ==
    final ordering). Exact SQL mirror: the oracle routes through the
    identical integer codes, so adc values gate exactly at round-6."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = _parquet_num_rows(sf_dir, "embeddings")
    cb = _pq_codebook(ds, n, ksub)
    if cb is None:
        return _ADC_SCHEMA.empty_table()
    if cb.shape[1] % M:
        raise ValueError(f"dim {cb.shape[1]} not divisible by M={M}")
    first = _min_id_row(ds)
    q_id = first["vec_id"]
    q = np.asarray(first["embedding"], dtype=np.float64)
    dsub = cb.shape[1] // M
    lut = np.empty((M, cb.shape[0]))
    for mi in range(M):
        d = q[mi * dsub:(mi + 1) * dsub] - cb[:, mi * dsub:(mi + 1) * dsub]
        lut[mi] = (d ** 2).sum(axis=1)
    ref = ray.put((cb, lut))

    def topk_asc(ids: np.ndarray, adc: np.ndarray) -> pa.Table:
        take = min(k, len(ids))
        order = np.lexsort((ids, np.round(adc, 6)))[:take]
        return pa.Table.from_arrays([
            pa.array(ids[order].astype(np.int64)),
            pa.array(np.round(adc[order], 6)),
        ], schema=_ADC_SCHEMA)

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _ADC_SCHEMA.empty_table()
        cbm, lutm = ray.get(ref)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        keep = ids != q_id
        if not keep.any():
            return _ADC_SCHEMA.empty_table()
        codes = _pq_encode(
            S.embedding_matrix(t).astype(np.float64)[keep], cbm, M)
        adc = lutm[np.arange(M), codes].sum(axis=1)
        return topk_asc(ids[keep], adc)

    parts = [t for t in
             ds.map_batches(block_topk, batch_format="pyarrow").iter_batches(
                 batch_format="pyarrow", batch_size=None) if t.num_rows]
    if not parts:
        return _ADC_SCHEMA.empty_table()
    t = pa.concat_tables(parts)
    return topk_asc(t.column("vec_id").to_numpy(zero_copy_only=False),
                    t.column("adc").to_numpy(zero_copy_only=False))


def emb_ann_ivfpq(sf_dir: str, k: int = 10, nlist: int = 32,
                  nprobe: int = 24, shortlist: int | None = None,
                  M: int = 8, ksub: int = 16):
    """IVF+PQ with exact re-ranking — the production trillion-scale
    index shape (FAISS IVFPQ + refine), composed from the repo's own
    pieces: the coarse quantizer (emb_ann_ivf's sampled spherical
    k-means) prunes each block's scan to the query's nprobe nearest
    lists, the PQ ADC table (emb_ann_pq's M x ksub LUT over NORMALIZED
    vectors, so squared-L2 = 2 - 2cos ranks like cosine) shortlists
    within them at M lookups per vector, and only the block-local
    shortlist is re-scored in full precision. Everything broadcast
    rides ONE ray.put (centroids + probe set + codebook + LUT); each
    block emits the exact cosine top-k of its shortlist and the driver
    merges k rows per block under the (round3 desc, id asc) key.

    Gate: with the defaults the result is exact-equal to brute-force
    top-k on the test corpora (same contract as emb_ann_lsh /
    emb_ann_ivf — the recall knobs are nprobe/nlist and the shortlist
    width; shallow-setting recall is asserted in tests)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = _parquet_num_rows(sf_dir, "embeddings")
    if shortlist is None:
        shortlist = max(64, 8 * k)
    first = _min_id_row(ds)
    q_id = first["vec_id"]
    q = np.asarray(first["embedding"], dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)

    # coarse quantizer sample (same stride policy as emb_ann_ivf)
    target = max(512, nlist * 64)
    sample_stride = max(7, n // target)

    def strided(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % sample_stride == 0))

    sample_t = pa.concat_tables(
        ds.map_batches(strided, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None)).sort_by("vec_id")
    centroids = S.ivf_centroids(S.embedding_matrix(sample_t), nlist)
    probe = np.argsort(-(centroids @ q))[:nprobe]

    # PQ codec over NORMALIZED vectors (ADC L2 then ranks like cosine)
    cb = _pq_codebook(ds, n, ksub)
    if cb is None:
        return S._EMPTY_TOPK.empty_table()
    if cb.shape[1] % M:
        raise ValueError(f"dim {cb.shape[1]} not divisible by M={M}")
    cb = D.normalize_rows(cb.astype(np.float64)).astype(np.float64)
    dsub = cb.shape[1] // M
    lut = np.empty((M, cb.shape[0]))
    for mi in range(M):
        d = q[mi * dsub:(mi + 1) * dsub] - cb[:, mi * dsub:(mi + 1) * dsub]
        lut[mi] = (d ** 2).sum(axis=1)
    bcast = ray.put((q, centroids, np.asarray(probe, dtype=np.int64),
                     cb, lut))

    def block_scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return S._EMPTY_TOPK.empty_table()
        qv, cent, probe_arr, cbm, lutm = ray.get(bcast)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        m = D.normalize_rows(S.embedding_matrix(batch)).astype(np.float64)
        lists = S.ivf_assign(m, cent)
        mask = np.isin(lists, probe_arr) & (ids != q_id)
        if not mask.any():
            return S._EMPTY_TOPK.empty_table()
        ids, m = ids[mask], m[mask]
        codes = _pq_encode(m, cbm, M)
        adc = lutm[np.arange(M), codes].sum(axis=1)
        keep = np.lexsort((ids, np.round(adc, 6)))[:shortlist]
        # exact re-rank of the shortlist only
        return S.topk_rows(ids[keep], m[keep] @ qv, k)

    parts = list(
        ds.map_batches(block_scan, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None))
    return S.merge_topk(parts, k)


_MEAN_PART = pa.schema([("xsum", pa.list_(pa.float64())),
                        ("cnt", pa.int64())])


def emb_outlier_scores(sf_dir: str, threshold: float = 0.0):
    """Corpus-outlier scoring: cosine of every embedding against the
    corpus MEAN vector — the cheap first-pass quality gate for
    embedding spaces (off-manifold junk scores near or below zero
    while inliers cluster positive; the per-cluster refinement is
    emb_semdedup's territory). Two streaming passes: per-block
    (column-sum, count) partials — one dim+1 row per block — then the
    broadcast mean scores each block vectorized. Exact SQL mirror:
    per-dim AVG, the same f64 dot/norm arithmetic, ROUND-6; the
    is_outlier flag compares the ROUNDED cosine on both sides so the
    boundary is deterministic."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def mean_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _MEAN_PART.empty_table()
        m = S.embedding_matrix(t).astype(np.float64)
        return pa.table({"xsum": [m.sum(axis=0)], "cnt": [m.shape[0]]},
                        schema=_MEAN_PART)

    xsum, n = None, 0
    for b in ds.map_batches(mean_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for r in range(b.num_rows):
            s = np.asarray(b.column("xsum")[r].as_py())
            xsum = s if xsum is None else xsum + s
            n += int(b.column("cnt")[r].as_py())
    schema = pa.schema([("vec_id", pa.int64()), ("cos_mean", pa.float64()),
                        ("is_outlier", pa.bool_())])
    if n == 0:
        return rd.from_arrow(schema.empty_table())
    mu = xsum / n
    mnorm = float(np.sqrt((mu * mu).sum()))
    ref = ray.put(mu)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        m = S.embedding_matrix(t).astype(np.float64)
        norms = np.sqrt((m * m).sum(axis=1)) * mnorm
        cos = np.zeros(m.shape[0])
        live = norms > 0
        cos[live] = (m @ ray.get(ref))[live] / norms[live]
        cos = np.round(cos, 6)
        return pa.Table.from_arrays([
            t.column("vec_id"), pa.array(cos),
            pa.array(cos < threshold),
        ], schema=schema)

    return ds.map_batches(score, batch_format="pyarrow")


_COV_PART = pa.schema([("xtx", pa.list_(pa.float64())),
                       ("xsum", pa.list_(pa.float64())),
                       ("cnt", pa.int64())])


def _cov_moments(ds: rd.Dataset):
    """One streaming pass of second-moment partials: each block emits
    its dim x dim Gram matrix (ONE dgemm), its column sum and its row
    count — the classic distributed-covariance layout where the driver
    reduce is blocks x (dim^2 + dim + 1) floats, corpus-independent.
    Returns (xtx, xsum, n) or (None, None, 0) on empty."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _COV_PART.empty_table()
        m = S.embedding_matrix(t).astype(np.float64)
        return pa.table({
            "xtx": [(m.T @ m).reshape(-1)],
            "xsum": [m.sum(axis=0)],
            "cnt": [m.shape[0]],
        }, schema=_COV_PART)

    xtx, xsum, n = None, None, 0
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for r in range(b.num_rows):
            g = np.asarray(b.column("xtx")[r].as_py())
            s = np.asarray(b.column("xsum")[r].as_py())
            if xtx is None:
                xtx, xsum = g, s
            else:
                xtx = xtx + g
                xsum = xsum + s
            n += int(b.column("cnt")[r].as_py())
    if xtx is None:
        return None, None, 0
    dim = len(xsum)
    return xtx.reshape(dim, dim), xsum, n


def emb_covariance(sf_dir: str):
    """Population covariance matrix of the embedding corpus — the
    one-pass distributed Gram-matrix primitive under PCA / whitening /
    Mahalanobis scoring: cov = X'X/n - mu mu'. Each block contributes
    one dgemm partial (_cov_moments); nothing corpus-sized ships
    anywhere. Output: the upper triangle as (dim_i, dim_j, cov) rows,
    ROUND-6 — the SQL mirror recomputes the same moments through a
    positional-unnest self-join, so values gate exactly (both sides
    divide the same f64 sums by the same n)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    xtx, xsum, n = _cov_moments(ds)
    schema = pa.schema([("dim_i", pa.int64()), ("dim_j", pa.int64()),
                        ("cov", pa.float64())])
    if n == 0:
        return schema.empty_table()
    mu = xsum / n
    cov = xtx / n - np.outer(mu, mu)
    dim = cov.shape[0]
    ii, jj = np.triu_indices(dim)
    return pa.table({
        "dim_i": pa.array(ii.astype(np.int64)),
        "dim_j": pa.array(jj.astype(np.int64)),
        "cov": pa.array(np.round(cov[ii, jj], 6)),
    }, schema=schema)


def emb_pca_project(sf_dir: str, k: int = 8):
    """PCA projection of the embedding corpus onto its top-k principal
    components: the covariance comes from the same one-dgemm-per-block
    moment pass as emb_covariance, the 64 x 64 eigendecomposition runs
    on the driver (dim-sized, corpus-independent), and the projection
    is one more streaming pass against the broadcast component matrix.
    Components are sign-canonicalized (largest-|loading| coordinate
    made positive) so the output is deterministic up to eigh itself.
    Iterative/linear-algebra semantics are not SQL-expressible ->
    rows-only driver gate; pytest pins exact equality with a numpy
    reference (same eigh, same BLAS)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    xtx, xsum, n = _cov_moments(ds)
    schema = pa.schema([("vec_id", pa.int64()),
                        ("proj", pa.list_(pa.float64()))])
    if n == 0:
        return rd.from_arrow(schema.empty_table())
    mu = xsum / n
    cov = xtx / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)
    comps = v[:, np.argsort(w)[::-1][:k]]  # dim x k, eigenvalue desc
    flip = comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])] < 0
    comps = np.where(flip, -comps, comps)
    ref = ray.put((mu, comps))

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        mu_b, c_b = ray.get(ref)
        p = np.round((S.embedding_matrix(t).astype(np.float64) - mu_b)
                     @ c_b, 6)
        rows, kk = p.shape
        offs = pa.array(np.arange(0, (rows + 1) * kk, kk, dtype=np.int32))
        return pa.Table.from_arrays([
            t.column("vec_id"),
            pa.ListArray.from_arrays(offs, pa.array(p.reshape(-1))),
        ], schema=schema)

    return ds.map_batches(project, batch_format="pyarrow")


_SEM_SCHEMA = pa.schema([
    ("vec_id", pa.int64()), ("rep_id", pa.int64()),
    ("cluster", pa.int64()),
])


def _sem_sample(block: pa.Table, stride: int) -> pa.Table:
    ids = block.column("vec_id").to_numpy(zero_copy_only=False)
    return block.filter(pa.array(ids % stride == 0))


def _sem_shard(block: pa.Table, P: int, cent: np.ndarray) -> list:
    """Assign + route one block: normalize (f64), nearest-centroid
    cluster id (f64, the same arithmetic the sample Lloyd used), then
    slice into P per-``cl % P`` shards. Vectors ship normalized as
    float32 (half the exchange bytes; the prune threshold compare is
    insensitive to f32 at any realistic margin — pinned by the planted
    soundness test)."""
    ids = block.column("vec_id").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    if block.num_rows == 0:
        e = (ids, ids, np.empty((0, cent.shape[1]), np.float32))
        return [e for _ in range(P)]
    m = D.normalize_rows(S.embedding_matrix(block))
    cl = S.ivf_assign(m, cent)
    part = cl % P
    order = np.argsort(part, kind="stable")
    ids, cl, m32 = ids[order], cl[order], m[order].astype(np.float32)
    bounds = np.searchsorted(part[order], np.arange(P + 1))
    return [(ids[s:e], cl[s:e], m32[s:e])
            for s, e in zip(bounds[:-1], bounds[1:])]


def _sem_combine(threshold: float, chunk: int, *shards) -> pa.Table:
    """One hash partition: concat its shards, per-cluster chunked
    cosine triangle (precomputed triu mask — no per-tile index-array
    allocation), union-find over above-threshold pairs, emit every
    dropped member with its min-vec_id representative."""
    ids = np.concatenate([s[0] for s in shards])
    cl = np.concatenate([s[1] for s in shards])
    if not len(ids):
        return _SEM_SCHEMA.empty_table()
    m = np.concatenate([s[2] for s in shards])
    order = np.lexsort((ids, cl))
    cl, ids, m = cl[order], ids[order], np.ascontiguousarray(m[order])
    new = np.ones(len(cl), dtype=bool)
    new[1:] = cl[1:] != cl[:-1]
    bounds = np.append(np.flatnonzero(new), len(cl))
    triu = ~np.tri(chunk, chunk, k=0, dtype=bool)
    thr = np.float32(threshold)
    out_v, out_r, out_c = [], [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        sz = e - s
        if sz < 2:
            continue
        cm, cids = m[s:e], ids[s:e]  # ids ascending within cluster
        parent = np.arange(sz)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for ci in range(0, sz, chunk):
            a = cm[ci:ci + chunk]
            for cj in range(ci, sz, chunk):
                hit = a @ cm[cj:cj + chunk].T >= thr
                if ci == cj:
                    hit &= triu[:hit.shape[0], :hit.shape[1]]
                pi, pj = np.nonzero(hit)
                for x, y in zip(pi + ci, pj + cj):
                    rx, ry = find(x), find(y)
                    if rx != ry:
                        # root at the smaller index == smaller vec_id
                        if rx < ry:
                            parent[ry] = rx
                        else:
                            parent[rx] = ry
        roots = np.array([find(x) for x in range(sz)])
        dropped = np.flatnonzero(roots != np.arange(sz))
        if len(dropped):
            out_v.append(cids[dropped])
            out_r.append(cids[roots[dropped]])
            out_c.append(np.full(len(dropped), cl[s], dtype=np.int64))
    if not out_v:
        return _SEM_SCHEMA.empty_table()
    return pa.Table.from_arrays([
        pa.array(np.concatenate(out_v), pa.int64()),
        pa.array(np.concatenate(out_r), pa.int64()),
        pa.array(np.concatenate(out_c), pa.int64()),
    ], schema=_SEM_SCHEMA)


def emb_semdedup(sf_dir: str, nlist: int | None = None,
                 threshold: float = 0.95, chunk: int = 2048,
                 sample_stride: int | None = None):
    """SemDeDup (Abbas et al. 2023): semantic dedup by k-means
    bucketing + within-cluster cosine near-dup pruning — the scale path
    that turns O(n^2) embedding dedup into O(n^2 / nlist) by only
    comparing vectors that land in the same coarse cluster (the method
    accepts missing cross-cluster near-dups by design; exact all-pairs
    is ``emb_dedup_cosine``). Identical vectors always co-cluster
    (deterministic assignment), so exact duplicates are never missed.

    Engine shape: ONE parquet read materialized as block refs; a
    deterministic strided sample of those blocks -> driver Lloyd
    (S.ivf_centroids, same as IVF) -> broadcast centroids -> raw-task
    two-phase hash exchange (the ``_compat_shard`` pattern): each block
    is assigned + sliced into ``cl % P`` shards (``num_returns=P``), and
    P combine tasks pull only their shard, run the per-cluster chunked
    cosine triangle + union-find, and emit one row per DROPPED vector
    (vec_id, rep_id, cluster). The result Dataset is built
    ``from_arrow_refs`` — dropped rows never concat on the driver.

    Why not ``groupby('part').map_groups`` (the usual partition-grouped
    idiom): the prune is compute-heavy per byte, and Ray Data sizes the
    sort's output blocks BY BYTES, capping the post-shuffle map at ~2-3
    concurrent tasks here (measured: 128 identical prune tasks finish in
    7.9 s as raw tasks vs 94 s through groupby at 4M x 64). Same
    deliberate drop below the Dataset API as ``_min_label_prop``, same
    justification: measured 6-8x on a fixed workload. Worker memory is
    bounded by ``chunk^2`` cos tiles + the partition's vectors — the
    SemDeDup analog of the LSH bucket contract: ``nlist`` scales with
    the corpus so clusters stay ~n/nlist; a degenerate corpus that
    collapses into one cluster concentrates that cluster's vectors in
    one combine task (document/raise, don't silently churn);
    iterative k-means is not SQL-expressible -> rows-only driver gate;
    soundness/recall pytest-pinned against the exact all-pairs brute
    force."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = _parquet_num_rows(sf_dir, "embeddings")
    nlist = nlist or max(8, min(1024, n // 1000))
    if sample_stride is None:
        target = max(256, nlist * 16)
        sample_stride = max(1, n // target)

    # zero-row blocks are dropped by METADATA (an empty parquet read
    # yields a schemaless block that would poison the concat downstream)
    refs = [block_ref for bundle in ds.iter_internal_ref_bundles()
            for block_ref, _md in bundle.blocks if _md.num_rows]
    if not refs:
        return rd.from_arrow(_SEM_SCHEMA.empty_table())
    sample_task = ray.remote(_sem_sample)
    sample_t = pa.concat_tables(
        ray.get([sample_task.remote(r, sample_stride) for r in refs])
    ).sort_by("vec_id")  # block arrival order is nondeterministic
    centroids = S.ivf_centroids(S.embedding_matrix(sample_t), nlist)
    cent_ref = ray.put(centroids)
    P = max(2, _n_parts())
    shard = ray.remote(_sem_shard)
    shard_refs = [shard.options(num_returns=P).remote(r, P, cent_ref)
                  for r in refs]
    combine = ray.remote(_sem_combine)
    outs = [combine.remote(threshold, chunk, *[sr[p] for sr in shard_refs])
            for p in range(P)]
    return rd.from_arrow_refs(outs)


# ---- text analysis ---------------------------------------------------------


def doc_token_stats(sf_dir: str):
    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        T.token_stats, batch_format="pyarrow"
    )


def _ensure_jsonl_docs(sf_dir: str, n_shards: int = 4) -> list[str]:
    """Deterministic JSONL mirror of documents.parquet (the format raw
    LLM corpora actually arrive in — Dolma, RedPajama, FineWeb all
    ship newline-delimited JSON shards). Cached under /tmp/sbo_jsonl
    keyed by the source dir; rows shard round-robin by doc_id and
    serialize via pandas' C writer. Rewritten atomically (tmp +
    rename dir marker). FIXTURE-ONLY driver-side conversion: in
    production the corpus already arrives as JSONL and only the
    read_json path below is the engine — nothing here scales with a
    real corpus."""
    import hashlib
    import json

    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(
        (os.path.abspath(src) + str(os.path.getmtime(src))).encode()
    ).hexdigest()[:12]
    d = os.path.join("/tmp/sbo_jsonl", f"docs_{key}_{n_shards}")
    marker = os.path.join(d, "_SUCCESS")
    paths = [os.path.join(d, f"shard-{i:03d}.jsonl")
             for i in range(n_shards)]
    if os.path.exists(marker):
        return paths
    os.makedirs(d, exist_ok=True)
    t = pq.read_table(src, columns=["doc_id", "text"])
    df = t.to_pandas()
    for i, p in enumerate(paths):
        part = df[df["doc_id"].to_numpy() % n_shards == i]
        part.to_json(p + ".tmp", orient="records", lines=True,
                     force_ascii=False)
        os.replace(p + ".tmp", p)
    with open(marker, "w") as f:
        json.dump({"rows": len(df)}, f)
    return paths


def doc_token_stats_jsonl(sf_dir: str):
    """The JSONL SOURCE path: the same token-stats operator over
    newline-delimited JSON shards (``ray.data.read_json`` -> Arrow
    batches, pyarrow's parallel JSON reader per shard) instead of
    Parquet — demonstrating that every doc-side operator runs
    unchanged over the raw-corpus interchange format. Gated by the
    SAME SQL oracle as doc_token_stats (identical rows, different
    wire format), which pins the JSON round-trip (escaping, unicode,
    int64 ids) byte-exactly."""
    paths = _ensure_jsonl_docs(sf_dir)
    tune_context()
    ds = rd.read_json(paths)
    return ds.map_batches(
        lambda t: T.token_stats(t.select(["doc_id", "text"])),
        batch_format="pyarrow")


def doc_pii_redact(sf_dir: str):
    """PII redaction over the documents table: mask emails then IPv4s
    with vectorized RE2 kernels (functions/text.pii_redact). The corpus
    has no organic PII, so deterministic synthetic PII is appended per
    doc (closed form over doc_id — same trick as the multimodal
    synth_ppm/synth_wav payloads) and the SQL oracle builds the same
    augmented text, making the redaction + counts exactly checkable."""
    def augment(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ids_np = ids.to_numpy(zero_copy_only=False)
        id_s = ids.cast(pa.string())
        m7 = pa.array((ids_np % 7).astype(str), type=pa.string())
        m256 = pa.array((ids_np % 256).astype(str), type=pa.string())
        m100 = pa.array((ids_np % 100).astype(str), type=pa.string())
        aug = pc.binary_join_element_wise(
            txt, " contact user", id_s, "@mail", m7,
            ".example.com from 10.", m256, ".0.", m100, "")
        return pa.table({"doc_id": ids, "text": aug})

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(augment, batch_format="pyarrow")
        .map_batches(T.pii_redact, batch_format="pyarrow")
    )


def doc_repetition_stats(sf_dir: str):
    """Gopher-style repetition counts per doc (dup-token / top-token /
    top-bigram numerators): one vectorized map_batches pass
    (functions/text.repetition_stats), no shuffle — per-doc stats need
    only the doc's own tokens."""
    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        T.repetition_stats, batch_format="pyarrow"
    )


def doc_quality_gopher(sf_dir: str):
    """Gopher quality-filter rules (Rae et al. 2021 App. A1.1) per doc:
    integer rule numerators/denominators + the keep flag, one vectorized
    map_batches scan (functions/text.gopher_stats), no shuffle. At
    100 TB this is embarrassingly parallel — the gate columns are
    text-pure, so (like doc_curation_pipeline's gate) the flag can feed
    a block-local filter before any downstream dedup shuffle."""
    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        T.gopher_stats, batch_format="pyarrow"
    )


def doc_quality_c4(sf_dir: str):
    """C4 quality-filter rules (Raffel et al. 2020 §2.2) per doc: the
    LINE-level filter family (terminal punctuation, >= 5 words/line, no
    javascript mentions, lorem-ipsum / curly-brace page gates) as ONE
    vectorized map_batches scan (functions/text.c4_stats), no shuffle.
    Like doc_quality_gopher, embarrassingly parallel at 100 TB and
    usable as a block-local gate ahead of any dedup shuffle.

    The synthetic corpus is single-line with no terminal punctuation,
    so (like doc_pii_redact) deterministic multi-line structure is
    appended per doc — closed form over doc_id, rebuilt identically by
    the SQL oracle — making every rule (kept line, short line,
    javascript line, lorem-ipsum page, brace page, the >= 3-kept-lines
    boundary) fire on both sides."""
    def augment(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ids_np = ids.to_numpy(zero_copy_only=False)
        id_s = ids.cast(pa.string())
        empty = pa.array([""] * len(ids), type=pa.string())

        def opt(mask: np.ndarray, part) -> pa.Array:
            return pc.if_else(pa.array(mask), part, empty)

        good2 = pc.binary_join_element_wise(
            "\nAnother good sentence number ", id_s, " right here!"
            "\nIs this a third good line ", id_s, "?", "")
        js = pc.binary_join_element_wise(
            "\nEnable javascript to view page ", id_s, " now.", "")
        brace = pc.binary_join_element_wise(
            "\nfunction f() { return ", id_s, "; }", "")
        aug = pc.binary_join_element_wise(
            txt,
            "\nThis is a plain sentence with id ", id_s, ".",
            opt(ids_np % 2 == 0, good2),
            opt(ids_np % 3 == 0, pa.array(
                ["\nshort line."] * len(ids), type=pa.string())),
            opt(ids_np % 5 == 0, js),
            opt(ids_np % 7 == 0, pa.array(
                ["\nlorem ipsum dolor sit amet placeholder text here."]
                * len(ids), type=pa.string())),
            opt(ids_np % 11 == 0, brace),
            "")
        return pa.table({"doc_id": ids, "text": aug})

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(augment, batch_format="pyarrow")
        .map_batches(T.c4_stats, batch_format="pyarrow")
    )


def doc_pack_sequences(sf_dir: str, seq_len: int = 512,
                       chunk_docs: int = 4096):
    """GPT-style sequence PACKING: concatenate every document's tokens
    in doc_id order and split the stream into fixed ``seq_len``-token
    training sequences; emit, per document, its global token offset and
    the first/last sequence it lands in (documents may span a sequence
    boundary — the standard LM-pretraining layout).

    Engine shape — a distributed PREFIX SUM (scan), the one primitive
    the rest of the repo didn't need yet:

      pass 1  block-local partial token-sums per doc-id CHUNK
              (``chunk = doc_id // chunk_docs``; the chunk table is
              corpus_size/chunk_docs rows — bounded, driver-merged),
              then an exclusive cumsum over the sorted chunk table
              gives each chunk's global base offset, broadcast once;
      pass 2  docs shuffle partition-grouped by chunk (ids + token
              counts only — text never enters the exchange); inside a
              partition one sort + exclusive cumsum per chunk segment,
              plus the broadcast base, yields exact global offsets.

    Offsets are exact and independent of block/partition boundaries.
    Partitioning assumption (same as ``_n_parts``): one hash partition
    of (doc_id, n_tokens) rows fits in a worker."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    P = _n_parts()

    def _tok_counts(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        col = t.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n_tok = pc.list_value_length(pc.split_pattern(col, " ")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return ids, n_tok

    def chunk_partials(t: pa.Table) -> pa.Table:
        ids, n_tok = _tok_counts(t)
        uk, inv = np.unique(ids // chunk_docs, return_inverse=True)
        sums = np.bincount(inv, weights=n_tok).astype(np.int64)
        return pa.table({"chunk": pa.array(uk, pa.int64()),
                         "tok_sum": pa.array(sums, pa.int64())})

    parts = list(ds.map_batches(
        chunk_partials, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None))
    empty = pa.schema([
        ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
        ("tok_offset", pa.int64()), ("seq_first", pa.int64()),
        ("seq_last", pa.int64()),
    ]).empty_table()
    if not parts:
        return empty
    merged = pa.concat_tables(parts).group_by("chunk").aggregate(
        [("tok_sum", "sum")])
    order = pc.sort_indices(merged.column("chunk"))
    chunk_ids = merged.column("chunk").take(order).to_numpy(
        zero_copy_only=False).astype(np.int64)
    sums = merged.column("tok_sum_sum").take(order).to_numpy(
        zero_copy_only=False).astype(np.int64)
    bases = np.cumsum(sums) - sums  # exclusive: tokens before this chunk
    base_ref = ray.put((chunk_ids, bases))

    def id_count_rows(t: pa.Table) -> pa.Table:
        ids, n_tok = _tok_counts(t)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "part": pa.array((ids // chunk_docs) % P),
        })

    def pack_part(g: pd.DataFrame) -> pd.DataFrame:
        cids, cbases = ray.get(base_ref)
        ids = g["doc_id"].to_numpy()
        nt = g["n_tokens"].to_numpy()
        o = np.argsort(ids, kind="stable")  # chunk is monotone in doc_id
        ids_s, nt_s = ids[o], nt[o]
        ck = ids_s // chunk_docs
        csum = np.cumsum(nt_s) - nt_s
        new = np.ones(len(ids_s), dtype=bool)
        new[1:] = ck[1:] != ck[:-1]
        first = np.maximum.accumulate(
            np.where(new, np.arange(len(ids_s)), 0))
        off = (csum - csum[first]
               + cbases[np.searchsorted(cids, ck)])
        return pd.DataFrame({
            "doc_id": ids_s, "n_tokens": nt_s, "tok_offset": off,
            "seq_first": off // seq_len,
            "seq_last": (off + nt_s - 1) // seq_len,
        })

    out = list(ds.map_batches(id_count_rows, batch_format="pyarrow")
               .groupby("part").map_groups(pack_part)
               .iter_batches(batch_format="pyarrow", batch_size=None))
    if not out:
        return empty
    return pa.concat_tables(out).select(empty.schema.names).cast(empty.schema)


def doc_pack_materialize(sf_dir: str, seq_len: int = 512,
                         chunk_docs: int = 4096):
    """MATERIALIZED sequence packing: the actual training-sequence
    fragments — one row per (doc, sequence) span with the fragment's
    token text — i.e. what a packed LM dataset physically contains.
    ``doc_pack_sequences`` computes the layout; this emits it.

    Same two-pass prefix sum for the offsets, but pass 2 shuffles the
    TEXT partition-grouped by doc-id chunk: materialization re-lays the
    corpus out in sequence order, so moving each payload byte once is
    inherent to the operator (the one doc-side op where the text
    legitimately enters an exchange). Inside a partition, fragments
    tile each doc's tokens contiguously, so fragment strings come from
    the same zero-copy offset-vector re-slice + one ``binary_join`` as
    ``functions/text.chunk_docs`` — joining fragments back with ' '
    reconstructs every doc byte-for-byte (pinned in tests).
    Partitioning assumption: one doc-id chunk partition of TEXT fits
    in a worker; lower ``chunk_docs`` for huge docs."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    P = _n_parts()

    def chunk_partials(t: pa.Table) -> pa.Table:
        col = t.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n_tok = pc.list_value_length(pc.split_pattern(col, " ")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        uk, inv = np.unique(ids // chunk_docs, return_inverse=True)
        sums = np.bincount(inv, weights=n_tok).astype(np.int64)
        return pa.table({"chunk": pa.array(uk, pa.int64()),
                         "tok_sum": pa.array(sums, pa.int64())})

    parts = list(ds.map_batches(
        chunk_partials, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None))
    empty = pa.schema([
        ("doc_id", pa.int64()), ("seq_id", pa.int64()),
        ("n_frag_tokens", pa.int64()), ("frag_text", pa.string()),
    ]).empty_table()
    if not parts:
        return rd.from_arrow(empty)
    merged = pa.concat_tables(parts).group_by("chunk").aggregate(
        [("tok_sum", "sum")])
    order = pc.sort_indices(merged.column("chunk"))
    chunk_ids = merged.column("chunk").take(order).to_numpy(
        zero_copy_only=False).astype(np.int64)
    sums = merged.column("tok_sum_sum").take(order).to_numpy(
        zero_copy_only=False).astype(np.int64)
    bases = np.cumsum(sums) - sums
    base_ref = ray.put((chunk_ids, bases))

    def add_part(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.select(["doc_id", "text"]).append_column(
            "part", pa.array((ids // chunk_docs) % P))

    def mat_part(g: pd.DataFrame) -> pd.DataFrame:
        cids, cbases = ray.get(base_ref)
        o = np.argsort(g["doc_id"].to_numpy(), kind="stable")
        ids = g["doc_id"].to_numpy()[o]
        toks = pc.split_pattern(pa.array(g["text"].to_numpy()[o]), " ")
        toffs = toks.offsets.to_numpy().astype(np.int64)
        nt = np.diff(toffs)
        ck = ids // chunk_docs
        csum = np.cumsum(nt) - nt
        new = np.ones(len(ids), dtype=bool)
        new[1:] = ck[1:] != ck[:-1]
        first = np.maximum.accumulate(np.where(new, np.arange(len(ids)), 0))
        off = csum - csum[first] + cbases[np.searchsorted(cids, ck)]
        seq_first = off // seq_len
        seq_last = (off + nt - 1) // seq_len
        k = seq_last - seq_first + 1
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), k)
        out_pos = np.arange(int(k.sum()), dtype=np.int64)
        fno = out_pos - np.repeat(np.cumsum(k) - k, k)
        seq_id = seq_first[doc_of] + fno
        fs = np.maximum(seq_id * seq_len, off[doc_of])
        fe = np.minimum((seq_id + 1) * seq_len, off[doc_of] + nt[doc_of])
        # local flat-token positions; fragments tile each doc and docs
        # are contiguous, so [starts..., last end] is a valid offset
        # vector over the SAME flat token array (chunk_docs idiom)
        starts_flat = toffs[:-1][doc_of] + (fs - off[doc_of])
        ends_flat = starts_flat + (fe - fs)
        if len(starts_flat):
            new_offs = np.append(starts_flat, ends_flat[-1]).astype(np.int32)
            frag_text = pc.binary_join(
                pa.ListArray.from_arrays(pa.array(new_offs), toks.values),
                " ")
        else:
            frag_text = pa.array([], type=pa.string())
        return pd.DataFrame({
            "doc_id": ids[doc_of], "seq_id": seq_id,
            "n_frag_tokens": fe - fs,
            "frag_text": frag_text.to_pandas(),
        })

    out_schema = empty.schema

    def project(t: pa.Table) -> pa.Table:
        return t.select(out_schema.names).cast(out_schema)

    # the materialized fragment table is O(corpus) text: keep it a
    # streaming Dataset (the caller writes or folds it) — never a
    # driver concat of every partition's payload
    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("part").map_groups(mat_part)
            .map_batches(project, batch_format="pyarrow"))


def doc_paragraph_dedup(sf_dir: str, shared_mod: int = 7):
    """Paragraph-level exact dedup (the CCNet / Dolma sub-document
    pass): explode every document into newline-separated paragraphs and
    keep ONE copy of each distinct paragraph corpus-wide — the first by
    (doc_id, para_idx). Output is the surviving paragraph table.

    The synthetic corpus is single-line, so (like doc_quality_c4 /
    doc_pii_redact) deterministic multi-paragraph structure is appended
    per doc — a shared paragraph keyed by ``doc_id % shared_mod``
    (planted cross-doc duplicates, ~n/shared_mod copies each) and a
    unique tail — rebuilt identically by the SQL oracle, so the
    keep-first boundary fires on both sides.

    Scale shape: explode + hash-route in ONE map_batches (paragraph
    text moves once, inherent — the output IS the surviving text, the
    pack_materialize precedent); the winner per distinct paragraph is
    decided entirely inside its hash partition (equal strings always
    co-locate) via dictionary codes + lexsort — and selection groups on
    the STRING, so a 64-bit hash collision can only co-locate, never
    merge, distinct paragraphs. No driver state, no broadcast."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    P = _n_parts()

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ids_np = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        mod_s = pa.array(ids_np % shared_mod).cast(pa.string())
        aug = pc.binary_join_element_wise(
            txt, "\nShared paragraph number ", mod_s,
            ".\nUnique tail ", ids.cast(pa.string()), ".", "")
        paras = pc.split_pattern(aug, "\n")
        counts = pc.list_value_length(paras).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = paras.flatten()
        starts = np.cumsum(counts) - counts
        total = int(counts.sum())
        doc_of = np.repeat(np.arange(len(counts)), counts)
        t = pa.table({
            "doc_id": pa.array(ids_np[doc_of], pa.int64()),
            "para_idx": pa.array(
                np.arange(total, dtype=np.int64) - starts[doc_of]),
            "para": flat,
        }).filter(pc.not_equal(flat, ""))
        t = D.add_text_hash(t, column="para")
        part = _lp_partition(t.column("text_hash").to_numpy(
            zero_copy_only=False), P)
        return t.drop_columns(["text_hash"]).append_column(
            "part", pa.array(part))

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        did = g["doc_id"].to_numpy()
        idx = g["para_idx"].to_numpy()
        enc = pc.dictionary_encode(pa.array(g["para"], pa.string()))
        codes = enc.indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((idx, did, codes))
        c_s = codes[order]
        first = np.ones(len(c_s), dtype=bool)
        first[1:] = c_s[1:] != c_s[:-1]
        keep = np.sort(order[first])
        return pd.DataFrame({
            "doc_id": did[keep], "para_idx": idx[keep],
            "para": g["para"].to_numpy()[keep],
        })

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("part").map_groups(dedup_part))


def doc_group_topk(sf_dir: str, k: int = 3):
    """Group-wise top-k: the k largest documents per language by
    (n_chars DESC, doc_id ASC). Engine shape: each block keeps at most
    k rows PER GROUP it contains (vectorized lexsort + within-group
    rank via segment offsets — no per-group Python), so the driver
    merge sees <= k * |groups| * |blocks| candidate rows regardless of
    corpus size; no shuffle, text column never read. This is the
    standard monoid top-k: block-local top-k is closed under merge."""

    def local_topk(df: pa.Table) -> pa.Table:
        nch = df.column("n_chars").to_numpy(zero_copy_only=False)
        did = df.column("doc_id").to_numpy(zero_copy_only=False)
        # dictionary codes keep lexsort off object keys without ever
        # materializing a Python string list (VERDICT r3 minor sweep);
        # codes follow the SORTED unique dictionary so within-block
        # group order matches the final (lang asc) merge order
        enc = df.column("lang").combine_chunks().dictionary_encode()
        dsort = pc.array_sort_indices(enc.dictionary)
        remap = np.empty(len(enc.dictionary), dtype=np.int64)
        remap[dsort.to_numpy(zero_copy_only=False)] = np.arange(
            len(enc.dictionary))
        codes = remap[enc.indices.to_numpy(zero_copy_only=False)]
        order = np.lexsort((did, -nch, codes))
        sl = codes[order]
        new_grp = np.ones(len(sl), dtype=bool)
        new_grp[1:] = sl[1:] != sl[:-1]
        starts = np.maximum.accumulate(
            np.where(new_grp, np.arange(len(sl)), 0))
        rank = np.arange(len(sl)) - starts
        keep = order[rank < k]
        return df.select(["doc_id", "lang", "n_chars"]).take(pa.array(keep))

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    batches = list(
        ds.map_batches(local_topk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None))
    empty = pa.schema([
        ("doc_id", pa.int64()), ("lang", pa.string()),
        ("n_chars", pa.int64()), ("rnk", pa.int64()),
    ]).empty_table()
    if not batches:
        return empty
    df = pa.concat_tables(batches).to_pandas()
    if df.empty:
        return empty
    df = df.sort_values(["lang", "n_chars", "doc_id"],
                        ascending=[True, False, True], kind="stable")
    df["rnk"] = df.groupby("lang").cumcount() + 1
    df = df[df["rnk"] <= k].reset_index(drop=True)
    df["rnk"] = df["rnk"].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def doc_quality_linear(sf_dir: str, n_buckets: int = 1024):
    """Hashing-trick linear classifier inference (the fastText-style
    quality-model scoring pass a DCLM/FineWeb pipeline runs over every
    doc): each token hashes into one of ``n_buckets`` feature buckets
    (the per-unique md5 63-bit idiom), the model is a closed-form
    integer CENTI-weight vector w(b) = (b*37) % 101 - 50, and the doc
    score is the mean token weight. The per-doc weight SUM is exact
    int64 on both sides, the keep decision (sum > 0) is an integer
    compare, and the score ships as a FLOORED integer micro-score
    (floor(sum*10000/n)) — mean-weight denominators 100*n hit exact
    .5e-6 ROUND boundaries constantly, so ROUND-6 parity is a coin
    flip here and floor is the safe gate: the true quotient is >= 1/n
    from any integer whenever it isn't one, so the correctly-rounded
    f64 division cannot cross a floor boundary. Broadcast-free
    (weights are a formula, the real
    build would ``ray.put`` the trained vector once); one block-local
    vectorized pass, no shuffle — model inference at 100 TB is an
    embarrassingly parallel map."""
    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        toks = pc.split_pattern(txt, " ")
        n_tok = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pa.table({"t": toks.flatten()})
        h = D.add_text_hash(flat, column="t").column(
            "text_hash").to_numpy(zero_copy_only=False)
        w = (h % n_buckets) * 37 % 101 - 50
        rows = len(n_tok)
        doc_of = np.repeat(np.arange(rows, dtype=np.int64), n_tok)
        score_c = np.zeros(rows, dtype=np.int64)
        np.add.at(score_c, doc_of, w)
        return pa.table({
            "doc_id": ids,
            "n_tokens": pa.array(n_tok),
            "score_micro": pa.array(np.floor(
                score_c * 10000.0 / np.maximum(n_tok, 1)).astype(np.int64)),
            "keep": pa.array((score_c > 0).astype(np.int64)),
        })

    return _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(score, batch_format="pyarrow")


def doc_dsir_weights(sf_dir: str, n_buckets: int = 8192,
                     target_lang: str = "en"):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): hashed-unigram
    bag-of-buckets features; target distribution = the ``target_lang``
    slice, raw distribution = the whole corpus; per doc the importance
    log-weight sums ln p_target(b) - ln p_raw(b) over its token
    buckets (Laplace +1 smoothing over the fixed feature space).

    Engine shape: pass 1 folds block-local B-bounded bucket bincounts
    (raw + target) into two driver arrays — corpus-independent, the
    bounded-cardinality partial-agg idiom — and broadcasts the
    per-bucket log-ratio vector ONCE via ray.put; pass 2 is
    shuffle-free block-local scoring (per-unique md5 bucket hash,
    per-doc sums via one bincount). ROUND-6 gate: per-token terms are
    the same ln() values on both sides, so only summation-order ulp
    noise remains (the doc_unigram_logprob transcendental-sum rule)."""
    B = n_buckets
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    empty = pa.schema([
        ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
        ("logw", pa.float64()),
    ]).empty_table()
    hist_schema = pa.schema([("bucket", pa.int64()), ("cnt_r", pa.int64()),
                             ("cnt_t", pa.int64())])

    def _buckets(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        toks = pc.split_pattern(txt, " ")
        n_tok = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pa.table({"t": toks.flatten()})
        h = D.add_text_hash(flat, column="t").column("text_hash").to_numpy(
            zero_copy_only=False)
        return h % B, n_tok

    def hist_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        b, n_tok = _buckets(t)
        is_t = pc.equal(t.column("lang"), target_lang).to_numpy(
            zero_copy_only=False)
        tok_t = np.repeat(is_t, n_tok)
        cr = np.bincount(b, minlength=B)
        ct = np.bincount(b[tok_t], minlength=B)
        nz = np.nonzero(cr)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "cnt_r": pa.array(cr[nz], pa.int64()),
                         "cnt_t": pa.array(ct[nz], pa.int64())})

    parts = pa.concat_tables(
        [hist_schema.empty_table()] +
        list(docs.map_batches(hist_partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    if parts.num_rows == 0:
        return empty
    g = parts.group_by("bucket").aggregate([("cnt_r", "sum"),
                                            ("cnt_t", "sum")])
    cr = np.zeros(B, dtype=np.int64)
    ct = np.zeros(B, dtype=np.int64)
    bk = g.column("bucket").to_numpy(zero_copy_only=False)
    cr[bk] = g.column("cnt_r_sum").to_numpy(zero_copy_only=False)
    ct[bk] = g.column("cnt_t_sum").to_numpy(zero_copy_only=False)
    R, T = int(cr.sum()), int(ct.sum())
    lam = ((np.log(ct + 1.0) - np.log(float(T + B)))
           - (np.log(cr + 1.0) - np.log(float(R + B))))
    lam_ref = ray.put(lam)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        lam_v = ray.get(lam_ref)
        b, n_tok = _buckets(t)
        doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), n_tok)
        logw = np.bincount(doc_of, weights=lam_v[b], minlength=t.num_rows)
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_tokens": pa.array(n_tok),
            "logw": pa.array(np.round(logw, 6)),
        })

    out = list(docs.map_batches(score, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(out).cast(empty.schema) if out else empty


def doc_entropy(sf_dir: str):
    """Per-doc token-distribution Shannon entropy (plus token/type
    counts) — the lexical-diversity quality signal (low entropy flags
    boilerplate/repetition, complementing doc_repetition_stats'
    n-gram view). Space-split tokens like vocab/pack. One block-local
    vectorized pass: dictionary codes + a (doc, code) composite key
    into np.unique, per-doc fold via add.at — no shuffle, no state,
    embarrassingly parallel at 100 TB. Entropy as sum p*ln(n/c) (all
    non-negative terms, so no -0.0 can diverge from the oracle) under
    ROUND-6 (libm ulp noise only, the doc_sample_weighted rule)."""
    def ent(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        toks = pc.split_pattern(txt, " ")
        n_tok = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        codes = pc.dictionary_encode(flat).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        rows = len(n_tok)
        doc_of = np.repeat(np.arange(rows, dtype=np.int64), n_tok)
        V = int(codes.max()) + 1 if len(codes) else 1
        uk, cnt = np.unique(doc_of * V + codes, return_counts=True)
        ud = uk // V
        n_types = np.bincount(ud, minlength=rows).astype(np.int64)
        nn = n_tok[ud].astype(np.float64)
        contrib = (cnt / nn) * np.log(nn / cnt)
        ent_v = np.zeros(rows)
        np.add.at(ent_v, ud, contrib)
        return pa.table({
            "doc_id": ids,
            "n_tokens": pa.array(n_tok),
            "n_types": pa.array(n_types),
            "entropy": pa.array(np.round(ent_v, 6)),
        })

    return _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(ent, batch_format="pyarrow")


def doc_vocab_topk(sf_dir: str, k: int = 100):
    """Global vocabulary top-k: block-local token histograms
    (functions/text.vocab_partial — volume drops from tokens to
    block-uniques before anything leaves the worker), then a driver
    merge + exact top-k with deterministic ties (count desc, token
    asc). Driver memory is the union of block-unique tokens — fine for
    natural-language vocabularies (Heaps' law); a truly unbounded token
    space would swap the driver merge for ds.groupby("token").count()
    like metrics' final="groupby" escape hatch."""
    parts = _read(sf_dir, "documents", columns=["text"]).map_batches(
        T.vocab_partial, batch_format="pyarrow"
    )
    merged = pa.concat_tables(
        parts.iter_batches(batch_format="pyarrow", batch_size=None))
    agg = merged.group_by("token").aggregate([("n", "sum")])
    order = pc.sort_indices(agg, sort_keys=[("n_sum", "descending"),
                                            ("token", "ascending")])
    top = agg.take(order[:k])
    return pa.table({
        "token": top.column("token"),
        "n": top.column("n_sum"),
    })


_BI = pa.schema([("bigram", pa.string()), ("n", pa.int64())])


def _bigram_shard(block: pa.Table, P: int, k: int) -> list:
    """Block-local bigram histogram, split into P hash shards. Fully
    vectorized: one split_pattern; the adjacent-pair join runs over two
    zero-copy SLICES of the flat token buffer (vals[:-1] ++ " " ++
    vals[1:]); doc boundaries are masked by offset arithmetic (each
    doc's last token starts no bigram); pc.value_counts shrinks the
    block to its unique bigrams before anything leaves the worker; the
    per-UNIQUE crc32 routes each bigram to its one partition."""
    import zlib

    col = block.column("text")
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    empty = _BI.empty_table()
    if len(col) == 0:
        return [empty for _ in range(P)]
    words = pc.split_pattern(col.cast(pa.string()), " ")
    vals = words.values
    nv = len(vals)
    if nv < 2:
        return [empty for _ in range(P)]
    big = pc.binary_join_element_wise(
        vals.slice(0, nv - 1), vals.slice(1), " ")
    keep = np.ones(nv - 1, dtype=bool)
    ends = words.offsets.to_numpy().astype(np.int64)[1:] - 1
    keep[ends[(ends >= 0) & (ends < nv - 1)]] = False
    vc = pc.value_counts(big.filter(pa.array(keep)))
    t = pa.table({"bigram": vc.field("values"),
                  "n": vc.field("counts").cast(pa.int64())}, schema=_BI)
    part = np.fromiter(
        (zlib.crc32(u.encode("utf-8")) for u in
         t.column("bigram").to_pylist()),
        dtype=np.uint32, count=t.num_rows).astype(np.int64) % P
    order = np.argsort(part, kind="stable")
    sorted_t = t.take(pa.array(order))
    bounds = np.searchsorted(part[order], np.arange(P + 1))
    return [sorted_t.slice(s, e - s) for s, e in zip(bounds[:-1], bounds[1:])]


def _bigram_combine(k: int, *shards) -> pa.Table:
    """One hash partition: sum its bigrams' counts and emit the LOCAL
    top-k — correct globally because a bigram lives in exactly one
    partition, so the global top-k is the top-k of P local top-ks."""
    t = pa.concat_tables([_BI.empty_table()]
                         + [x for x in shards if x.num_rows])
    if t.num_rows == 0:
        return _BI.empty_table()
    agg = t.group_by("bigram").aggregate([("n", "sum")])
    order = pc.sort_indices(agg, sort_keys=[("n_sum", "descending"),
                                            ("bigram", "ascending")])
    top = agg.take(order[:k])
    return pa.table({"bigram": top.column("bigram"),
                     "n": top.column("n_sum")}, schema=_BI)


def doc_vocab_bigrams(sf_dir: str, k: int = 100):
    """Corpus bigram top-k — the phrase-level complement of
    doc_vocab_topk (collocation mining, boilerplate detection, LM
    inspection). Bigram vocabularies run ~10x unigram vocabularies, so
    the vocab_topk-style driver merge of all block partials is a
    driver-memory cliff (measured 65 s at 4M docs before this layout);
    instead the block histograms take ONE crc32 hash exchange
    (``num_returns=P`` raw tasks, the repo's standard shard/combine),
    each partition sums its bigrams and emits a LOCAL top-k, and the
    driver merges P x k rows — nothing bigram-vocabulary-sized ever
    lands anywhere central. 14.7-14.9 s at 4M docs."""
    P = max(2, _n_parts())
    ds = _read(sf_dir, "documents", columns=["text"])
    refs = [block_ref for bundle in ds.iter_internal_ref_bundles()
            for block_ref, _md in bundle.blocks if _md.num_rows]
    if not refs:
        return _BI.empty_table()
    shard = ray.remote(_bigram_shard)
    sl = [shard.options(num_returns=P).remote(r, P, k) for r in refs]
    combine = ray.remote(_bigram_combine)
    outs = ray.get([combine.remote(k, *[s[p] for s in sl])
                    for p in range(P)])
    merged = pa.concat_tables([_BI.empty_table()] + outs)
    order = pc.sort_indices(merged, sort_keys=[("n", "descending"),
                                               ("bigram", "ascending")])
    return merged.take(order[:k])


def doc_tokenize_ids(sf_dir: str, vocab_size: int = 1000):
    """Vocabulary-id encoding — the pretraining tokenization step: map
    every (space-split) token to its id in the corpus top-``vocab_size``
    vocabulary (1-based, count-desc/token-asc ranked like
    ``doc_vocab_topk``), OOV -> 0. Two passes: the vocab pass reuses the
    block-local histogram + bounded driver merge (Heaps' law contract
    documented on doc_vocab_topk), then the encode pass broadcasts the
    SORTED vocab once (``ray.put``; vocab_size entries, corpus-
    independent) and each block resolves ids per UNIQUE token via
    dictionary codes + searchsorted — no per-row Python, no shuffle.
    Output: (doc_id, ids list<int64>, n_oov)."""
    vocab = doc_vocab_topk(sf_dir, k=vocab_size)
    toks = np.array(vocab.column("token").to_pylist(), dtype=object)
    ids = np.arange(1, len(toks) + 1, dtype=np.int64)
    order = np.argsort(toks)
    vref = ray.put((toks[order], ids[order]))

    def encode(t: pa.Table) -> pa.Table:
        col = t.column("text")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        words = pc.split_pattern(col, " ")
        offsets = words.offsets.to_numpy().astype(np.int64)
        enc = words.values.dictionary_encode()
        uniq = np.array(enc.dictionary.to_pylist(), dtype=object)
        st, si = ray.get(vref)
        pos = np.minimum(np.searchsorted(st, uniq), len(st) - 1) \
            if len(st) else np.zeros(len(uniq), dtype=np.int64)
        ok = (st[pos] == uniq) if len(st) else np.zeros(len(uniq), dtype=bool)
        uid = np.where(ok, si[pos] if len(st) else 0, 0)
        flat_ids = uid[enc.indices.to_numpy(zero_copy_only=False)]
        zc = np.concatenate([[0], np.cumsum(flat_ids == 0)])
        n_oov = zc[offsets[1:]] - zc[offsets[:-1]]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "ids": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(flat_ids, pa.int64())),
            "n_oov": pa.array(n_oov.astype(np.int64)),
        })

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        encode, batch_format="pyarrow")


def _flat_vocab_ids(t: pa.Table, st: np.ndarray, si: np.ndarray):
    """Per-block (doc_ids, offsets, flat token ids) under a broadcast
    SORTED vocabulary (st tokens, si ids) — the doc_tokenize_ids encode
    kernel factored out: dictionary codes + searchsorted per UNIQUE
    token, OOV -> 0; no per-row Python."""
    col = t.column("text")
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    words = pc.split_pattern(col, " ")
    offsets = words.offsets.to_numpy().astype(np.int64)
    enc = words.values.dictionary_encode()
    uniq = np.array(enc.dictionary.to_pylist(), dtype=object)
    pos = np.minimum(np.searchsorted(st, uniq), len(st) - 1) \
        if len(st) else np.zeros(len(uniq), dtype=np.int64)
    ok = (st[pos] == uniq) if len(st) else np.zeros(len(uniq), dtype=bool)
    uid = np.where(ok, si[pos] if len(st) else 0, 0)
    flat_ids = uid[enc.indices.to_numpy(zero_copy_only=False)]
    doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    return doc_ids, offsets, flat_ids


def doc_perplexity_bigram(sf_dir: str, vocab_size: int = 1000):
    """Bigram-LM quality score per document — ``doc_unigram_logprob``
    with one token of context: mean -ln p(w_i | w_{i-1}) under the
    corpus bigram distribution with add-one smoothing over the
    (vocab_size+1)-way vocabulary (ids 1..V rank the corpus top-V like
    doc_tokenize_ids; 0 is the shared OOV bucket), bigrams never cross
    document boundaries. The standard within-domain fluency filter:
    unigram scoring ranks rare WORDS, bigram scoring ranks improbable
    TRANSITIONS (shuffled or templated text scores poorly even when
    every word is common).

    Three streaming passes, each shuffle-free: (1) the vocab top-V
    (block histograms, bounded driver merge), (2) bigram counts — each
    block emits its nonzero (ida*(V+1)+idb, count) partials from one
    bincount, the driver folds them into a dense (V+1)^2 table (8 MB
    at V=1000, corpus-independent), (3) scoring under the broadcast
    count table: per-doc mean of -ln((c(a,b)+1)/(c(a.)+V+1)) via
    segment reduceat. Output: (doc_id, n_bigrams, avg_neg_logprob
    ROUND 6), docs with <2 tokens omitted (no transitions to score,
    same omission as the SQL mirror's join)."""
    V = vocab_size
    vocab = doc_vocab_topk(sf_dir, k=V)
    toks = np.array(vocab.column("token").to_pylist(), dtype=object)
    ids = np.arange(1, len(toks) + 1, dtype=np.int64)
    order = np.argsort(toks)
    vref = ray.put((toks[order], ids[order]))
    W = len(toks) + 1  # id space incl. OOV 0
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    BPART = pa.schema([("key", pa.int64()), ("c", pa.int64())])

    def bigram_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return BPART.empty_table()
        st, si = ray.get(vref)
        _docs, offsets, flat = _flat_vocab_ids(t, st, si)
        a, b = flat[:-1], flat[1:]
        # drop transitions that cross a document boundary
        keep = np.ones(len(a), dtype=bool)
        keep[offsets[1:-1] - 1] = False
        key = a[keep] * W + b[keep]
        cnt = np.bincount(key, minlength=W * W)
        nz = np.flatnonzero(cnt)
        return pa.table({"key": nz.astype(np.int64),
                         "c": cnt[nz].astype(np.int64)}, schema=BPART)

    parts = list(docs.map_batches(
        bigram_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None))
    OUT = pa.schema([("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
                     ("avg_neg_logprob", pa.float64())])
    if not parts:
        return OUT.empty_table()
    merged = pa.concat_tables(parts)
    cb = np.zeros(W * W, dtype=np.int64)
    np.add.at(cb, merged.column("key").to_numpy(zero_copy_only=False),
              merged.column("c").to_numpy(zero_copy_only=False))
    ca = cb.reshape(W, W).sum(axis=1)  # context totals c(a, .)
    cnt_ref = ray.put((cb, ca))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return OUT.empty_table()
        st, si = ray.get(vref)
        cb_g, ca_g = ray.get(cnt_ref)
        doc_ids, offsets, flat = _flat_vocab_ids(t, st, si)
        a, b = flat[:-1], flat[1:]
        keep = np.ones(len(a), dtype=bool)
        keep[offsets[1:-1] - 1] = False
        nlp = -np.log((cb_g[a * W + b] + 1.0) / (ca_g[a] + float(W)))
        nlp[~keep] = 0.0
        # per-doc segment sums over the (uncompacted, boundary-zeroed)
        # transition stream: transition i is (flat[i], flat[i+1]), so
        # doc d's internal transitions are i in [offsets[d],
        # offsets[d+1]-2] — cumsum differencing over [lo, hi)
        csum = np.concatenate([[0.0], np.cumsum(nlp)])
        kcum = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        lo = offsets[:-1]
        hi = np.maximum(offsets[1:] - 1, lo)
        n_big = kcum[hi] - kcum[lo]
        sums = csum[hi] - csum[lo]
        ok = n_big > 0
        return pa.table({
            "doc_id": pa.array(doc_ids[ok].astype(np.int64)),
            "n_bigrams": pa.array(n_big[ok].astype(np.int64)),
            "avg_neg_logprob": pa.array(
                np.round(sums[ok] / n_big[ok], 6), type=pa.float64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


_SHUF_SCHEMA = pa.schema([("doc_id", pa.int64()),
                          ("shuffle_pos", pa.int64())])


def _shuf_keys(block: pa.Table) -> np.ndarray:
    import hashlib

    ids = block.column("doc_id").to_numpy(zero_copy_only=False)
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(int(v)).encode()).digest()[:8],
                        "big") >> 1 for v in ids),
        dtype=np.int64, count=len(ids))


def _shuf_slice(block: pa.Table, P: int, shift: int) -> list:
    """Pass 1+route fused: key every row, slice by the key's top bits
    (md5 keys are uniform, so equal-width ranges balance with no
    sampling step). Returns P (ids, keys) shards — 16 bytes/row."""
    ids = block.column("doc_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    if block.num_rows == 0:
        return [(ids, ids) for _ in range(P)]
    keys = _shuf_keys(block)
    part = (keys >> shift).astype(np.int64)
    order = np.argsort(part, kind="stable")
    ids, keys = ids[order], keys[order]
    bounds = np.searchsorted(part[order], np.arange(P + 1))
    return [(ids[s:e], keys[s:e]) for s, e in zip(bounds[:-1], bounds[1:])]


def _shuf_count(*shards) -> int:
    return int(sum(len(s[0]) for s in shards))


def _shuf_rank(base: int, *shards) -> pa.Table:
    """One key range: sort its rows by (key, doc_id) and emit global
    positions base + local rank."""
    ids = np.concatenate([s[0] for s in shards])
    if not len(ids):
        return _SHUF_SCHEMA.empty_table()
    keys = np.concatenate([s[1] for s in shards])
    order = np.lexsort((ids, keys))
    pos = np.empty(len(ids), dtype=np.int64)
    pos[order] = base + np.arange(len(ids), dtype=np.int64)
    return pa.Table.from_arrays([
        pa.array(ids), pa.array(pos)], schema=_SHUF_SCHEMA)


def doc_shuffle_order(sf_dir: str):
    """Global deterministic training shuffle: every document's position
    in the md5-random order (rank of md5(doc_id) with doc_id
    tie-break) — the epoch-shuffle primitive, reproducible across
    reruns, partitionings and cluster sizes, with NO all-to-all sort:

      route  one scan keys each row and slices it into P key RANGES by
             the hash's top bits (``num_returns=P``; md5 is uniform so
             equal-width ranges balance without a sampling pass) —
             16 bytes/row leave the scan;
      rank   P range tasks sort locally; range r's global offset is
             the prefix sum of per-range counts (P ints on the
             driver), so position = offset + local rank.

    Cross-range order == global order because ranges ARE the key's
    high bits. Output: (doc_id, shuffle_pos), a permutation of
    0..n-1; a downstream consumer shuffles by sorting/bucketing on
    shuffle_pos (or slicing it into training shards). md5 (one
    hashlib call per row, ~0.7M rows/s/core) is deliberate: the DuckDB
    mirror computes the identical key, making the permutation
    ROW_NUMBER-exact; swap in a vectorized 64-bit mix if SQL parity is
    ever dropped. Exact SQL mirror: ROW_NUMBER() OVER (ORDER BY the
    same md5, doc_id) - 1."""
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    refs = [block_ref for bundle in ds.iter_internal_ref_bundles()
            for block_ref, _md in bundle.blocks if _md.num_rows]
    if not refs:
        return rd.from_arrow(_SHUF_SCHEMA.empty_table())
    P = max(2, _n_parts())
    shift = max(0, 63 - int(np.log2(P)))
    slice_task = ray.remote(_shuf_slice)
    sl = [slice_task.options(num_returns=P).remote(r, P, shift)
          for r in refs]
    count_task = ray.remote(_shuf_count)
    counts = ray.get([count_task.remote(*[s[p] for s in sl])
                      for p in range(P)])
    bases = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank_task = ray.remote(_shuf_rank)
    outs = [rank_task.remote(int(bases[p]), *[s[p] for s in sl])
            for p in range(P)]
    return rd.from_arrow_refs(outs)


def doc_lang_id(sf_dir: str):
    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        T.lang_id, batch_format="pyarrow"
    )


def doc_fingerprint(sf_dir: str):
    """Winnowing-style document fingerprints, exploded to one row per
    (doc_id, fp_rank, fp_hash) — scalar columns so the DuckDB oracle
    (an exact SQL mirror of the rolling hash) gates values directly."""

    def explode(batch: pa.Table) -> pa.Table:
        fp = T.fingerprint(batch)
        col = fp.column("fingerprint")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        doc_ids = fp.column("doc_id").to_numpy(zero_copy_only=False)
        rank = np.concatenate([np.arange(1, n + 1) for n in lengths]) if len(
            lengths) else np.array([], dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(np.repeat(doc_ids, lengths), type=pa.int64()),
            "fp_rank": pa.array(rank, type=pa.int64()),
            "fp_hash": col.values,
        })

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow"
    )


def doc_winnow(sf_dir: str, w: int = 8):
    """Robust winnowing fingerprints (Schleimer et al. 2003, the MOSS
    selection rule): every window of ``w`` consecutive rolling hashes
    contributes its RIGHTMOST minimum, guaranteeing any shared
    substring of length >= window + w - 1 bytes shares a fingerprint —
    the positional plagiarism/dedup primitive doc_fingerprint's
    bottom-k sketch can't provide (it has no position guarantee). Pure
    map over blocks (per-doc sliding-window argmin, vectorized via
    stride tricks); exploded (doc_id, pos, fp_hash) rows gate against
    an exact SQL mirror (expanded windows + ROW_NUMBER under the same
    (hash asc, pos desc) rule)."""

    def explode(batch: pa.Table) -> pa.Table:
        return T.winnow_fingerprint(batch, w=w)

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow"
    )


# integer-exact stopword-ratio gate scale (n_stop/max(1,n_alpha) >= r
# as n_stop*SCALE >= r*SCALE*max(1,n_alpha)) — no float rounding drift
# between engine, CLI profile, and SQL oracle
_CURATION_SCALE = 10000


def _curation_kept(batch: pa.Table, lang: str, min_tokens: int,
                   max_tokens: int, thr: int) -> pa.Table:
    """Gate + hash columns for the curation flow, shared by the Dataset
    pipeline and the resumable CLI profile (identical semantics by
    construction): the block's gate-passing rows as
    (doc_id, text_hash, n_tokens, n_stop_en)."""
    hashed = D.add_text_hash(batch)
    # fused single-pass stats (T.annotate_stats): token_stats +
    # lang_id separately ran the alpha-token extract twice and two
    # unread regex scans — ~2.4x the scan cost per batch
    stats = T.annotate_stats(batch)
    alpha = pc.max_element_wise(stats.column("n_alpha_tokens"), 1)
    ratio_ok = pc.greater_equal(
        pc.multiply(pc.cast(stats.column("n_stop_en"), pa.int64()),
                    pa.scalar(_CURATION_SCALE, pa.int64())),
        pc.multiply(pc.cast(alpha, pa.int64()), pa.scalar(thr, pa.int64())),
    )
    m = pc.and_(
        pc.equal(stats.column("pred_lang"), lang),
        pc.and_(
            pc.and_(pc.greater_equal(stats.column("n_tokens"), min_tokens),
                    pc.less_equal(stats.column("n_tokens"), max_tokens)),
            ratio_ok,
        ),
    )
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "text_hash": hashed.column("text_hash"),
        "n_tokens": stats.column("n_tokens"),
        "n_stop_en": stats.column("n_stop_en"),
    }).filter(m)


def doc_curation_pipeline(sf_dir: str, lang: str = "en",
                          min_tokens: int = 20, max_tokens: int = 1000,
                          min_stop_ratio: float = 0.015):
    """The flagship training-data CURATION flow, composing the dedup and
    text-analysis operators in ONE streaming pass over documents:

      exact dedup (keep the min-doc_id representative per distinct text)
      -> language filter (stopword-argmax lang id == ``lang``)
      -> quality filter (token count in [min,max], English-stopword
         ratio above threshold)

    Shape: one map_batches computes hash+lang+quality columns per block
    (all vectorized, single text scan) and applies the lang/quality gate
    BLOCK-LOCALLY; ONE groupby on the 8-byte text hash picks the
    min-doc_id representative per surviving distinct text and emits the
    kept rows straight from the partition stage. Filter-before-rep-pick
    is exact here because every gate column is a pure function of the
    text, hence identical across duplicates: the gate keeps or drops
    whole duplicate groups, so min(doc_id) per surviving group equals
    filtering the representatives (the r3 shape). Nothing corpus-sized
    ever touches the driver — no representative-id gather/broadcast
    (the r3 scale-killer), payload text never moves, and the shuffle
    carries only (doc_id, hash, 2 small ints) for gate-passing rows."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    P = _n_parts()
    thr = int(round(min_stop_ratio * _CURATION_SCALE))

    def annotate(batch: pa.Table) -> pa.Table:
        return _hash_part_col(
            _curation_kept(batch, lang, min_tokens, max_tokens, thr), P)

    def rep_pick(g: pd.DataFrame) -> pd.DataFrame:
        # min doc_id per distinct text_hash, stats carried through (they
        # are identical within a group) — one lexsort, no per-key work
        h = g["text_hash"].to_numpy()
        d = g["doc_id"].to_numpy()
        order = np.lexsort((d, h))
        hs = h[order]
        new = np.ones(len(hs), dtype=bool)
        new[1:] = hs[1:] != hs[:-1]
        keep = order[new]
        return pd.DataFrame({
            "doc_id": d[keep],
            "n_tokens": g["n_tokens"].to_numpy()[keep],
            "n_stop_en": g["n_stop_en"].to_numpy()[keep],
        })

    return ds.map_batches(annotate, batch_format="pyarrow") \
        .groupby("part").map_groups(rep_pick)


# ---- multimodal plumbing ---------------------------------------------------


def multimodal_payload_stats(sf_dir: str):
    """Binary-payload metadata (the SQL-checkable half of the multimodal
    plumbing: byte sizes of the opaque payload column)."""
    payload = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        to_payload_table, batch_format="pyarrow"
    )
    return payload.select_columns(["doc_id", "payload_bytes"])


def multimodal_frame_sample(sf_dir: str, every_k: int = 4):
    """Video-style frame-sampling plumbing as a gated query: payloads
    (text bytes) split into fixed 64-byte frames, every k-th kept, one
    output row per sampled frame with its byte length — the fan-out
    shape + boundary arithmetic are SQL-mirrored exactly."""
    from ..functions.multimodal import frame_sample

    payload = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        to_payload_table, batch_format="pyarrow"
    )
    frames = payload.map_batches(
        lambda b: frame_sample(b, every_k=every_k), batch_format="pyarrow"
    )

    def lengths(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "frame_no": pc.cast(b.column("frame_no"), pa.int64()),
            "frame_len": pc.binary_length(
                b.column("frame").combine_chunks() if isinstance(
                    b.column("frame"), pa.ChunkedArray) else b.column("frame")
            ).cast(pa.int64()),
        })

    return frames.map_batches(lengths, batch_format="pyarrow")


def multimodal_features(sf_dir: str):
    """REAL image decode through the actor-pool stage: deterministic
    synthetic PPM payloads (one per doc), decoded by the pure-numpy P6
    parser inside ``DecoderStub(fake=False)`` — header parse, raster
    extraction, integer per-channel feature sums. Gated by an exact SQL
    oracle (the pixel generator is a closed form). Actor-pool shape:
    decode state loads once per actor; small batch_size because payload
    batches are large."""
    from ..functions.multimodal import PAYLOAD_SCHEMA, PPM_MEDIA_TYPE, synth_ppm

    def to_images(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = [synth_ppm(int(i)) for i in ids]
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(payloads, type=pa.binary()),
                pa.array([PPM_MEDIA_TYPE] * len(ids), type=pa.string()),
                pa.array([len(p) for p in payloads], type=pa.int64()),
            ],
            schema=PAYLOAD_SCHEMA,
        )

    payload = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        to_images, batch_format="pyarrow"
    )
    # actor pool sized from the cluster (VERDICT r2 item 6): floor of 2
    # keeps tiny sessions working; cap at _cpus() so a big cluster's
    # decode stage isn't starved at a hardcoded width
    return payload.map_batches(
        DecoderStub,
        fn_constructor_kwargs={"fake": False},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(2, max(2, _cpus())),
    )


def multimodal_png_features(sf_dir: str):
    """REAL PNG decode through the actor-pool stage: deterministic
    synthetic RGB8 PNGs (one per doc, per-doc dimensions, per-scanline
    filter types cycling 0-4), decoded by the stdlib-zlib + numpy
    parser inside ``PngDecoder`` — CRC-checked chunk walk, IHDR
    validation, inflate, all-five-filter un-filtering. Gated by an
    exact SQL oracle (dimensions, filter-type sum and pixel bytes are
    closed forms over doc_id; the compressed payload length is not, so
    the feature schema carries no payload_bytes). Same actor-pool shape
    as the PPM/WAV paths."""
    from ..functions.multimodal import (
        PAYLOAD_SCHEMA, PNG_MEDIA_TYPE, PngDecoder, synth_png,
    )

    def to_images(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = [synth_png(int(i)) for i in ids]
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(payloads, type=pa.binary()),
                pa.array([PNG_MEDIA_TYPE] * len(ids), type=pa.string()),
                pa.array([len(p) for p in payloads], type=pa.int64()),
            ],
            schema=PAYLOAD_SCHEMA,
        )

    payload = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        to_images, batch_format="pyarrow"
    )
    return payload.map_batches(
        PngDecoder,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(2, max(2, _cpus())),
    )


def multimodal_bmp_features(sf_dir: str):
    """REAL BMP decode through the actor-pool stage: deterministic
    synthetic 24-bit BMPs (width cycles all four row-padding values,
    bottom-up BGR storage), decoded by the stdlib-struct + numpy parser
    inside ``BmpDecoder`` — the third real image codec beside PPM and
    PNG. Gated by an exact SQL oracle: dimensions, the row padding and
    the RGB channel sums are closed forms over doc_id (the generator
    emits RGB scan order; storage order is the decoder's problem).
    Same actor-pool shape as the other decode paths."""
    from ..functions.multimodal import (
        BMP_MEDIA_TYPE, BmpDecoder, PAYLOAD_SCHEMA, synth_bmp,
    )

    def to_images(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = [synth_bmp(int(i)) for i in ids]
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(payloads, type=pa.binary()),
                pa.array([BMP_MEDIA_TYPE] * len(ids), type=pa.string()),
                pa.array([len(p) for p in payloads], type=pa.int64()),
            ],
            schema=PAYLOAD_SCHEMA,
        )

    payload = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        to_images, batch_format="pyarrow"
    )
    return payload.map_batches(
        BmpDecoder,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(2, max(2, _cpus())),
    )


def multimodal_gif_features(sf_dir: str):
    """REAL GIF decode through the actor-pool stage: deterministic
    synthetic GIF87a payloads (8-color global palette, real
    variable-width LZW streams with dict growth) decoded by the
    stdlib-struct + numpy parser inside ``GifDecoder`` — the fourth
    real image codec beside PPM, PNG and BMP, and the only one whose
    pixel data is entropy-coded. Gated by an exact SQL oracle:
    dimensions, palette size, the palette-index sum (pins the LZW
    bitstream) and RGB channel sums (pin the color-table walk) are
    closed forms over doc_id."""
    from ..functions.multimodal import (
        GIF_MEDIA_TYPE, GifDecoder, PAYLOAD_SCHEMA, synth_gif,
    )

    def to_images(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = [synth_gif(int(i)) for i in ids]
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(payloads, type=pa.binary()),
                pa.array([GIF_MEDIA_TYPE] * len(ids), type=pa.string()),
                pa.array([len(p) for p in payloads], type=pa.int64()),
            ],
            schema=PAYLOAD_SCHEMA,
        )

    payload = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        to_images, batch_format="pyarrow"
    )
    return payload.map_batches(
        GifDecoder,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(2, max(2, _cpus())),
    )


def multimodal_qoi_features(sf_dir: str):
    """REAL QOI decode through the actor-pool stage: deterministic
    synthetic QOI payloads (full spec encoder — RUN/INDEX/DIFF/LUMA/RGB
    ops all exercised, asserted in tests) decoded by the pure-Python
    spec decoder inside ``QoiDecoder`` — the fifth real image codec
    beside PPM, PNG, BMP and GIF, and the only one combining
    run-length, hash-table and delta coding in one stream. Gated by an
    exact SQL oracle: dimensions and RGB channel sums are closed forms
    over doc_id."""
    from ..functions.multimodal import (
        PAYLOAD_SCHEMA, QOI_MEDIA_TYPE, QoiDecoder, synth_qoi,
    )

    def to_images(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = [synth_qoi(int(i)) for i in ids]
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(payloads, type=pa.binary()),
                pa.array([QOI_MEDIA_TYPE] * len(ids), type=pa.string()),
                pa.array([len(p) for p in payloads], type=pa.int64()),
            ],
            schema=PAYLOAD_SCHEMA,
        )

    payload = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        to_images, batch_format="pyarrow"
    )
    return payload.map_batches(
        QoiDecoder,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(2, max(2, _cpus())),
    )


def multimodal_image_resize(sf_dir: str):
    """REAL image resize through the actor-pool stage: deterministic
    synthetic PPM payloads decoded by the pure-numpy P6 parser, then a
    vectorized 2x2 integer mean-pool downsample (``mean_pool_2x2``) —
    the decode+resize stage a production image pipeline runs per batch
    (the reference has no image path; this is the training-data resize
    op the engine adds). Gated by an exact SQL oracle: each output
    pixel is floor(mean of its 2x2 source block) and the source pixel
    generator is a closed form, so the resized channel sums are
    integer-exact in DuckDB. Same actor-pool shape as the decode paths:
    kernel state loads once per actor, small batch_size because payload
    batches are large."""
    from ..functions.multimodal import (
        PAYLOAD_SCHEMA, PPM_MEDIA_TYPE, ImageResizer, synth_ppm,
    )

    def to_images(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = [synth_ppm(int(i)) for i in ids]
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(payloads, type=pa.binary()),
                pa.array([PPM_MEDIA_TYPE] * len(ids), type=pa.string()),
                pa.array([len(p) for p in payloads], type=pa.int64()),
            ],
            schema=PAYLOAD_SCHEMA,
        )

    payload = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        to_images, batch_format="pyarrow"
    )
    return payload.map_batches(
        ImageResizer,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(2, max(2, _cpus())),
    )


def multimodal_ulaw_features(sf_dir: str):
    """REAL G.711 mu-law decode (WAV format code 7 — the telephony
    variant, the first ENCODED audio the engine expands natively):
    deterministic synthetic mu-law clips decoded through the same
    AudioDecoder actor pool, whose chunk walker now recognizes the
    8-bit format-7 fmt chunk and expands companded bytes via the
    closed-form Sun ulaw2linear table. Gated exactly: the oracle
    rebuilds byte k = (doc_id*13 + k*7 + 5) % 256 and applies the same
    all-integer expansion (complement, 3-bit exponent, 4-bit mantissa,
    mag = (8*man+132)*2^e - 132)."""
    from ..functions.multimodal import (
        PAYLOAD_SCHEMA, WAV_MEDIA_TYPE, AudioDecoder, synth_wav_ulaw,
    )

    def to_clips(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = [synth_wav_ulaw(int(i)) for i in ids]
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(payloads, type=pa.binary()),
                pa.array([WAV_MEDIA_TYPE] * len(ids), type=pa.string()),
                pa.array([len(p) for p in payloads], type=pa.int64()),
            ],
            schema=PAYLOAD_SCHEMA,
        )

    payload = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        to_clips, batch_format="pyarrow"
    )
    return payload.map_batches(
        AudioDecoder,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(2, max(2, _cpus())),
    )


def multimodal_alaw_features(sf_dir: str):
    """The A-LAW half of G.711 (WAV format code 6, the European
    telephony companding law — mu-law's ITU sibling with a different
    segment structure: XOR-0x55 toggling, seg-0 linear region, sign
    bit SET = positive): same AudioDecoder actor pool, same exact
    all-integer SQL gate over the closed-form encoded bytes."""
    from ..functions.multimodal import (
        PAYLOAD_SCHEMA, WAV_MEDIA_TYPE, AudioDecoder, synth_wav_alaw,
    )

    def to_clips(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = [synth_wav_alaw(int(i)) for i in ids]
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(payloads, type=pa.binary()),
                pa.array([WAV_MEDIA_TYPE] * len(ids), type=pa.string()),
                pa.array([len(p) for p in payloads], type=pa.int64()),
            ],
            schema=PAYLOAD_SCHEMA,
        )

    payload = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        to_clips, batch_format="pyarrow"
    )
    return payload.map_batches(
        AudioDecoder,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(2, max(2, _cpus())),
    )


def multimodal_audio_features(sf_dir: str):
    """REAL audio decode through the actor-pool stage: deterministic
    synthetic RIFF/PCM16 WAV payloads (one clip per doc), decoded by the
    pure-numpy chunk-walking parser inside ``AudioDecoder`` — header and
    fmt/data chunk parse, int16 sample extraction, integer amplitude
    features (sum / abs-sum / max-abs). Gated by an exact SQL oracle
    (the sample generator is a closed form). Same actor-pool shape as
    the image path: codec state loads once per actor, small batch_size
    because payload batches are large."""
    from ..functions.multimodal import (
        PAYLOAD_SCHEMA, WAV_MEDIA_TYPE, AudioDecoder, synth_wav,
    )

    def to_clips(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = [synth_wav(int(i)) for i in ids]
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(payloads, type=pa.binary()),
                pa.array([WAV_MEDIA_TYPE] * len(ids), type=pa.string()),
                pa.array([len(p) for p in payloads], type=pa.int64()),
            ],
            schema=PAYLOAD_SCHEMA,
        )

    payload = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        to_clips, batch_format="pyarrow"
    )
    return payload.map_batches(
        AudioDecoder,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(2, max(2, _cpus())),
    )


# ---- relational demos (broadcast join, grouped aggregates) -----------------


def customer_nation_agg(sf_dir: str):
    """Broadcast hash join customer->nation (ray.put the 25-row dim
    table) + grouped aggregate: count + total acctbal per nation."""
    nation = pa.concat_tables(
        _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    lookup = dict(zip(nation.column("n_nationkey").to_pylist(),
                      nation.column("n_name").to_pylist()))
    lookup_ref = ray.put(lookup)

    def enrich(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        keys = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        names = pa.array([lk.get(int(k), "") for k in keys], type=pa.string())
        t = batch.append_column("n_name", names)
        g = t.group_by("n_name").aggregate([("c_custkey", "count"), ("c_acctbal", "sum")])
        return g.rename_columns(["n_name", "n_customers", "total_acctbal"])

    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])
    parts = pa.concat_tables(
        ds.map_batches(enrich, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    g = parts.group_by("n_name").aggregate(
        [("n_customers", "sum"), ("total_acctbal", "sum")]
    )
    g = g.rename_columns(["n_name", "n_customers", "total_acctbal"])
    return pa.table({
        "n_name": g.column("n_name"),
        "n_customers": g.column("n_customers").cast(pa.int64()),
        "total_acctbal": pc.round(g.column("total_acctbal"), 2),
    })


def _table_shard(block: pa.Table, P: int, key_col: str) -> list:
    """Route one block's ROWS (all columns) by the Fibonacci hash of
    ``key_col`` into P table slices — the string-carrying sibling of
    _anti_shard for exchanges whose carry isn't a single int64."""
    keys = block.column(key_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    if not len(keys):
        return [block] * P
    part = _lp_partition(keys, P)
    order = np.argsort(part, kind="stable")
    t = block.take(pa.array(order))
    bounds = np.searchsorted(part[order], np.arange(P + 1))
    return [t.slice(s, e - s) for s, e in zip(bounds[:-1], bounds[1:])]


_SEMI_ORD = pa.schema([("o_orderpriority", pa.string()),
                       ("n_orders", pa.int64()),
                       ("total_price", pa.float64())])


def _semi_orders_combine(n_ord: int, *shards) -> pa.Table:
    """One hash partition of the orders SEMI-join: keep orders whose
    orderkey appears in the lineitem key shards, fold per-priority
    (count, price-sum) partials via pyarrow group_by."""
    ot = pa.concat_tables([s for s in shards[:n_ord] if s.num_rows])  \
        if any(s.num_rows for s in shards[:n_ord]) else None
    if ot is None:
        return _SEMI_ORD.empty_table()
    rk = (np.unique(np.concatenate([s[0] for s in shards[n_ord:]]))
          if len(shards) > n_ord else np.zeros(0, np.int64))
    ok = ot.column("o_orderkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    hit = ot.filter(pa.array(np.isin(ok, rk)))
    if hit.num_rows == 0:
        return _SEMI_ORD.empty_table()
    g = hit.group_by("o_orderpriority").aggregate(
        [("o_orderkey", "count"), ("o_totalprice", "sum")])
    return pa.table({
        "o_orderpriority": g.column("o_orderpriority"),
        "n_orders": g.column("o_orderkey_count").cast(pa.int64()),
        "total_price": g.column("o_totalprice_sum"),
    }, schema=_SEMI_ORD)


def orders_with_returns(sf_dir: str, flag: str = "R"):
    """Distributed hash SEMI-join (TPC-H Q4's shape, the EXISTS
    complement of customer_no_orders' anti-join): orders with at least
    one returned lineitem, aggregated per order priority. Both sides
    are corpus-sized, so neither broadcasts: the returnflag filter is
    pushed into the lineitem scan, lineitem ships KEYS ONLY (8
    bytes/row via _anti_shard), orders ship their three needed columns
    via _table_shard, one Fibonacci-hash exchange co-locates them, and
    each partition emits |priorities|-sized partials the driver folds.
    Membership (not join multiplicity) is the semi-join semantics —
    duplicate lineitem keys collapse in the per-partition unique."""
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag"]).filter(
        expr=f"l_returnflag == '{flag}'")
    orefs = [r for b in orders.iter_internal_ref_bundles()
             for r, md in b.blocks if md.num_rows]
    if not orefs:
        return _SEMI_ORD.empty_table()
    lrefs = [r for b in li.iter_internal_ref_bundles()
             for r, md in b.blocks if md.num_rows]
    P = max(2, _n_parts())
    tshard = ray.remote(_table_shard)
    kshard = ray.remote(_anti_shard)
    osl = [tshard.options(num_returns=P).remote(r, P, "o_orderkey")
           for r in orefs]
    lsl = [kshard.options(num_returns=P).remote(r, P, "l_orderkey", None)
           for r in lrefs]
    combine = ray.remote(_semi_orders_combine)
    outs = ray.get([combine.remote(len(osl),
                                   *[s[p] for s in osl],
                                   *[s[p] for s in lsl])
                    for p in range(P)])
    merged = pa.concat_tables([_SEMI_ORD.empty_table()] + outs)
    g = merged.group_by("o_orderpriority").aggregate(
        [("n_orders", "sum"), ("total_price", "sum")])
    return pa.table({
        "o_orderpriority": g.column("o_orderpriority"),
        "n_orders": g.column("n_orders_sum"),
        "total_price": pc.round(g.column("total_price_sum"), 2),
    }, schema=_SEMI_ORD)


_LV_Q = pa.schema([("l_orderkey", pa.int64()), ("sum_qty", pa.int64())])


def _lv_combine(thresh: int, *shards) -> pa.Table:
    """One hash partition of the large-volume scan: fold (orderkey,
    qty) pairs, keep keys whose total exceeds ``thresh``."""
    ks = np.concatenate([s[0] for s in shards])
    if not len(ks):
        return _LV_Q.empty_table()
    qty = np.concatenate([s[1] for s in shards])
    uk, inv = np.unique(ks, return_inverse=True)
    sums = np.bincount(inv, weights=qty).astype(np.int64)
    keep = sums > thresh
    return pa.table({"l_orderkey": pa.array(uk[keep], pa.int64()),
                     "sum_qty": pa.array(sums[keep], pa.int64())})


def orders_large_volume(sf_dir: str, min_qty: int = 200):
    """TPC-H Q18's shape (large-volume customers): orders whose total
    lineitem quantity exceeds ``min_qty``, joined back to the order and
    its customer name. Distributed shape for a HIGH-CARDINALITY
    aggregate feeding a selective join: lineitem ships 16-byte
    (orderkey, qty) pairs through one Fibonacci-hash raw-task exchange
    (the _anti_shard layout — native groupby over ~distinct orderkeys
    is the 49-vs-6.4 s trap, CLAUDE.md), each partition folds sums and
    applies the HAVING locally, and only the OUTPUT-SIZED qualifying
    key set returns to the driver. That set broadcasts once (sorted +
    searchsorted, the emit_slots idiom) to filter the orders scan, and
    the resulting custkeys broadcast once to filter the customer scan —
    no big-side-vs-big-side shuffle join anywhere. Exact-integer
    quantities; o_totalprice is a source passthrough (no arithmetic),
    so the gate is hash-exact."""
    out_schema = pa.schema([
        ("o_orderkey", pa.int64()), ("c_custkey", pa.int64()),
        ("c_name", pa.string()), ("o_totalprice", pa.float64()),
        ("sum_qty", pa.int64()),
    ])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    lrefs = [r for b in li.iter_internal_ref_bundles()
             for r, md in b.blocks if md.num_rows]
    if not lrefs:
        return out_schema.empty_table()
    P = max(2, _n_parts())
    shard = ray.remote(_anti_shard)
    sl = [shard.options(num_returns=P).remote(r, P, "l_orderkey",
                                              "l_quantity")
          for r in lrefs]
    comb = ray.remote(_lv_combine)
    q = pa.concat_tables([_LV_Q.empty_table()] +
                         ray.get([comb.remote(min_qty, *[s[p] for s in sl])
                                  for p in range(P)]))
    if q.num_rows == 0:
        return out_schema.empty_table()
    qk = np.sort(q.column("l_orderkey").to_numpy(zero_copy_only=False))
    qk_ref = ray.put(qk)

    def hit_orders(t: pa.Table) -> pa.Table:
        k = ray.get(qk_ref)
        ok = t.column("o_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(k, ok)
        m = (pos < len(k)) & (k[np.minimum(pos, len(k) - 1)] == ok)
        return t.filter(pa.array(m))

    hits = pa.concat_tables(
        [pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                    ("o_totalprice", pa.float64())]).empty_table()] +
        [b.cast(pa.schema([("o_orderkey", pa.int64()),
                           ("o_custkey", pa.int64()),
                           ("o_totalprice", pa.float64())]))
         for b in _read(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"])
         .map_batches(hit_orders, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow", batch_size=None)])
    ck = np.unique(hits.column("o_custkey").to_numpy(zero_copy_only=False))
    ck_ref = ray.put(ck)

    def hit_cust(t: pa.Table) -> pa.Table:
        k = ray.get(ck_ref)
        cc = t.column("c_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(k, cc)
        m = (pos < len(k)) & (k[np.minimum(pos, len(k) - 1)] == cc)
        return t.filter(pa.array(m))

    cust = pa.concat_tables(
        [pa.schema([("c_custkey", pa.int64()),
                    ("c_name", pa.string())]).empty_table()] +
        [b.cast(pa.schema([("c_custkey", pa.int64()),
                           ("c_name", pa.string())]))
         for b in _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
         .map_batches(hit_cust, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow", batch_size=None)])
    # output-bounded driver assembly
    df = (hits.to_pandas()
          .merge(q.to_pandas(), left_on="o_orderkey", right_on="l_orderkey")
          .merge(cust.to_pandas(), left_on="o_custkey",
                 right_on="c_custkey"))
    return pa.table({
        "o_orderkey": pa.array(df["o_orderkey"], pa.int64()),
        "c_custkey": pa.array(df["c_custkey"], pa.int64()),
        "c_name": pa.array(df["c_name"], pa.string()),
        "o_totalprice": pa.array(df["o_totalprice"], pa.float64()),
        "sum_qty": pa.array(df["sum_qty"], pa.int64()),
    })


_RFM = pa.schema([("c_custkey", pa.int64()), ("recency_days", pa.int64()),
                  ("frequency", pa.int64()), ("monetary", pa.float64())])


def _rfm_combine(asof_us: int, *shards) -> pa.Table:
    """One hash partition of the RFM fold: per-customer last-order
    timestamp (maximum.at), order count (bincount) and revenue sum
    (weighted bincount) over the co-located order rows. Recency rides
    an INTEGER day division ((asof - last) // 86400e6 us) — numpy and
    DuckDB `//` agree exactly on positive int64, no float gate needed
    (the emb_pq_codes idiom)."""
    ts = [s for s in shards if s.num_rows]
    if not ts:
        return _RFM.empty_table()
    t = pa.concat_tables(ts)
    ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    od = t.column("o_orderdate").to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    tp = t.column("o_totalprice").to_numpy(zero_copy_only=False)
    uk, inv = np.unique(ck, return_inverse=True)
    freq = np.bincount(inv, minlength=len(uk)).astype(np.int64)
    mon = np.bincount(inv, weights=tp, minlength=len(uk))
    last = np.full(len(uk), np.iinfo(np.int64).min)
    np.maximum.at(last, inv, od)
    rec = (asof_us - last) // 86_400_000_000
    return pa.table({"c_custkey": pa.array(uk, pa.int64()),
                     "recency_days": pa.array(rec, pa.int64()),
                     "frequency": pa.array(freq, pa.int64()),
                     "monetary": pa.array(np.round(mon, 2), pa.float64())},
                    schema=_RFM)


def customer_rfm(sf_dir: str):
    """Per-customer RFM feature table (recency / frequency / monetary —
    the classic CRM segmentation input, here the customer-level feature
    build a ranking job would run): recency in whole days from the
    customer's last order to the corpus max order date, order count,
    and revenue sum. HIGH-CARDINALITY key (customers ~ corpus-sized),
    so the shape is the raw-task Fibonacci-hash exchange
    (CLAUDE.md: native groupby over ~distinct keys is the 49-vs-6.4 s
    trap): orders ship their three needed columns via ``_table_shard``,
    each partition folds its customers with bincount/maximum.at, and
    the customer-sized OUTPUT becomes a Dataset straight from the
    combine-task refs (``from_arrow_refs``) — it never concats on the
    driver. The as-of date is a separate column-pruned scan folding one
    int64 per block (mirrors the oracle's scalar subquery).

    Analog of the reference's keyed-counter rollup over a persistent
    key space (metrics/SBOMetrics.go keyed counters), applied to the
    orders table."""
    asof = _read(sf_dir, "orders", columns=["o_orderdate"])

    def block_max(t: pa.Table) -> pa.Table:
        m = pc.max(t.column("o_orderdate"))
        v = [] if m.value is None else \
            [np.datetime64(m.value, "us").astype(np.int64)]
        return pa.table({"m": pa.array(v, pa.int64())})

    maxes = [v for b in asof.map_batches(
        block_max, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None)
        for v in b.column("m").to_pylist()]
    if not maxes:
        return rd.from_arrow(_RFM.empty_table())
    asof_us = max(maxes)
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])
    refs = [r for b in ds.iter_internal_ref_bundles()
            for r, md in b.blocks if md.num_rows]
    P = max(2, _n_parts())
    tshard = ray.remote(_table_shard)
    sl = [tshard.options(num_returns=P).remote(r, P, "o_custkey")
          for r in refs]
    comb = ray.remote(_rfm_combine)
    outs = [comb.remote(asof_us, *[s[p] for s in sl]) for p in range(P)]
    return rd.from_arrow_refs(outs)


_INC_DD = pa.schema([("doc_id", pa.int64()), ("n_copies", pa.int64())])


def _inc_dedup_combine(*shards) -> pa.Table:
    """One hash partition of the incremental dedup: (text_hash, doc_id)
    rows where even ids are the EXISTING corpus and odd ids the new
    snapshot. Emits, per hash absent from the existing side, the new
    side's min doc_id + copy count (sorted-unique anti-probe, then one
    lexsort + segment fold). Sorted by doc_id for determinism."""
    ks = np.concatenate([s[0] for s in shards])
    if not len(ks):
        return _INC_DD.empty_table()
    ids = np.concatenate([s[1] for s in shards])
    is_new = (ids % 2) == 1
    old_k = np.unique(ks[~is_new])
    nk, nid = ks[is_new], ids[is_new]
    if not len(nk):
        return _INC_DD.empty_table()
    fresh = ~np.isin(nk, old_k)
    nk, nid = nk[fresh], nid[fresh]
    if not len(nk):
        return _INC_DD.empty_table()
    o = np.lexsort((nid, nk))
    nk, nid = nk[o], nid[o]
    first = np.ones(len(nk), dtype=bool)
    first[1:] = nk[1:] != nk[:-1]
    starts = np.flatnonzero(first)
    counts = np.diff(np.append(starts, len(nk)))
    keep_ids = nid[starts]
    oo = np.argsort(keep_ids, kind="stable")
    return pa.table({"doc_id": keep_ids[oo],
                     "n_copies": counts[oo].astype(np.int64)},
                    schema=_INC_DD)


def doc_dedup_incremental(sf_dir: str):
    """INCREMENTAL exact dedup — dedup a new snapshot against an
    already-ingested corpus (the pass a rolling CommonCrawl pipeline
    runs per crawl: new docs survive only if their content hash is
    unseen in ALL previous snapshots, then first-wins within the new
    batch). Even doc_ids stand in for the existing corpus, odd for the
    incoming snapshot. Both sides are corpus-sized, so this is the
    distributed hash ANTI-join (customer_no_orders idiom) on the
    content hash: one fused scan hashes per-unique and routes 16-byte
    (hash, doc_id) rows by Fibonacci hash (``num_returns=P``); each
    partition anti-probes the existing side via sorted uniques and
    folds the survivors' min-id + copy count in one lexsort. Text
    never enters the exchange; no driver state; output rides
    ``from_arrow_refs``."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def hash_rows(t: pa.Table) -> pa.Table:
        return D.add_text_hash(t).select(["text_hash", "doc_id"])

    hashed = ds.map_batches(hash_rows, batch_format="pyarrow")
    refs = [r for b in hashed.iter_internal_ref_bundles()
            for r, md in b.blocks if md.num_rows]
    if not refs:
        return _INC_DD.empty_table()
    P = max(2, _n_parts())
    shard = ray.remote(_anti_shard)
    sl = [shard.options(num_returns=P).remote(r, P, "text_hash", "doc_id")
          for r in refs]
    combine = ray.remote(_inc_dedup_combine)
    outs = [combine.remote(*[s[p] for s in sl]) for p in range(P)]
    return rd.from_arrow_refs(outs)


_BLOOM_MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0x27D4EB2F165667C5],
                      dtype=np.uint64)


def _bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions for 63-bit content hashes: k independent
    multiplicative mixes of the same hash, top bits, mod m."""
    hu = h.astype(np.uint64)
    return np.stack([((hu * _BLOOM_MIX[i]) >> np.uint64(17))
                     % np.uint64(m_bits) for i in range(k)],
                    axis=1).astype(np.int64)


def _bloom_test(bloom: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Membership test: all k bits set (bloom = packed uint8 bits)."""
    bits = (bloom[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def doc_dedup_bloom(sf_dir: str, m_bits: int = 1 << 22, k: int = 4):
    """Bloom-filter INCREMENTAL dedup — the sketch-mode twin of
    ``doc_dedup_incremental`` (the at-scale first-pass filter a rolling
    crawl pipeline runs before any exact exchange): build a Bloom
    filter over the EXISTING corpus (even doc_ids), broadcast it once,
    and keep snapshot docs (odd ids) whose k bits are not all set —
    "definitely new". One-sided error by construction: NO false
    negatives (every true duplicate is dropped; pinned in tests), a
    bounded false-positive rate ((1 - e^(-kn/m))^k, asserted), and the
    block bitmaps OR-merge associatively (merge law, asserted).

    Distributed shape: per-block packed bitmaps (m/8 bytes, corpus
    independent) fold on the driver by OR — the bounded-partial idiom;
    the merged filter broadcasts via ray.put; the filter pass is
    block-local. SQL-gated since r5 (SQL_DOC_DEDUP_BLOOM): the sketch
    is deterministic integer arithmetic, so its false positives
    reproduce bit-for-bit in DuckDB (HUGEINT mod-2^64 mixes).
    Exactness twin: doc_dedup_incremental."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    m_bytes = m_bits // 8

    def block_bloom(t: pa.Table) -> pa.Table:
        h = D.add_text_hash(t).column("text_hash").to_numpy(
            zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = h[ids % 2 == 0]  # existing corpus side only
        bm = np.zeros(m_bits, dtype=np.uint8)
        if len(h):
            pos = _bloom_positions(h, m_bits, k).ravel()
            bm[pos] = 1
        return pa.table({"bloom": pa.array([np.packbits(
            bm, bitorder="little").tobytes()], pa.binary())})

    merged = np.zeros(m_bytes, dtype=np.uint8)
    for b in ds.map_batches(block_bloom, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in b.column("bloom").to_pylist():
            np.bitwise_or(merged, np.frombuffer(blob, dtype=np.uint8),
                          out=merged)
    bloom_ref = ray.put(merged)

    def keep_new(t: pa.Table) -> pa.Table:
        bloom = ray.get(bloom_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        snap = t.filter(pa.array(ids % 2 == 1))
        if snap.num_rows == 0:
            return pa.schema([("doc_id", pa.int64())]).empty_table()
        h = D.add_text_hash(snap).column("text_hash").to_numpy(
            zero_copy_only=False)
        seen = _bloom_test(bloom, _bloom_positions(h, m_bits, k))
        return pa.table({"doc_id": snap.column("doc_id").cast(
            pa.int64()).filter(pa.array(~seen))})

    return ds.map_batches(keep_new, batch_format="pyarrow")


def _anti_shard(block: pa.Table, P: int, key_col: str,
                carry_col: str | None) -> list:
    """Route one block's rows by the Fibonacci hash of ``key_col`` into
    P shards of (keys, carry) arrays (carry=None ships key-only)."""
    keys = block.column(key_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    carry = (block.column(carry_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
        if carry_col else np.zeros(0, np.int64))
    if not len(keys):
        return [(keys, carry) for _ in range(P)]
    part = _lp_partition(keys, P)
    order = np.argsort(part, kind="stable")
    keys = keys[order]
    carry = carry[order] if carry_col else carry
    bounds = np.searchsorted(part[order], np.arange(P + 1))
    return [(keys[s:e], carry[s:e] if carry_col else carry)
            for s, e in zip(bounds[:-1], bounds[1:])]


def _anti_combine(n_left: int, *shards) -> pa.Table:
    """One hash partition of the anti-join: left keys absent from the
    right side, counted per carry value. ``shards[:n_left]`` are
    (custkey, nationkey) left shards, the rest key-only right shards."""
    lk = np.concatenate([s[0] for s in shards[:n_left]])
    if not len(lk):
        return pa.table({"key": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    lc = np.concatenate([s[1] for s in shards[:n_left]])
    rk = np.unique(np.concatenate([s[0] for s in shards[n_left:]])) \
        if len(shards) > n_left else np.zeros(0, np.int64)
    miss = ~np.isin(lk, rk)
    vals, cnts = np.unique(lc[miss], return_counts=True)
    return pa.table({"key": pa.array(vals.astype(np.int64)),
                     "cnt": pa.array(cnts.astype(np.int64))})


def customer_no_orders(sf_dir: str, status: str = "F"):
    """Distributed ANTI-join (TPC-H Q22's core): customers with NO
    fulfilled (``o_orderstatus == status``) orders, counted per
    nation. Both sides are corpus-sized at scale, so neither
    broadcasts: one raw-task hash exchange co-locates every custkey's
    customer row and order rows in the same partition (Fibonacci-mix
    hash, ``num_returns=P``, 8-16 bytes/row), each partition emits
    per-nation missing counts via sorted-unique + ``isin``, and the
    driver folds P x |nations| tiny partials. The status filter is
    pushed into the scan (predicate before the exchange)."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderstatus"]).filter(
        expr=f"o_orderstatus == '{status}'")
    OUT = pa.schema([("c_nationkey", pa.int64()),
                     ("n_no_order_customers", pa.int64())])
    crefs = [r for b in cust.iter_internal_ref_bundles()
             for r, md in b.blocks if md.num_rows]
    if not crefs:
        return OUT.empty_table()
    orefs = [r for b in orders.iter_internal_ref_bundles()
             for r, md in b.blocks if md.num_rows]
    P = max(2, _n_parts())
    shard = ray.remote(_anti_shard)
    csl = [shard.options(num_returns=P).remote(r, P, "c_custkey",
                                               "c_nationkey")
           for r in crefs]
    osl = [shard.options(num_returns=P).remote(r, P, "o_custkey", None)
           for r in orefs]
    combine = ray.remote(_anti_combine)
    outs = ray.get([combine.remote(len(csl),
                                   *[s[p] for s in csl],
                                   *[s[p] for s in osl])
                    for p in range(P)])
    merged = pa.concat_tables(outs)
    if merged.num_rows == 0:
        return OUT.empty_table()
    g = merged.group_by("key").aggregate([("cnt", "sum")])
    order = pc.sort_indices(g.column("key"))
    return pa.table({
        "c_nationkey": g.column("key").take(order).cast(pa.int64()),
        "n_no_order_customers":
            g.column("cnt_sum").take(order).cast(pa.int64()),
    })


_EMB_CUR = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                      ("cos_mean", pa.float64())])


def _emb_cur_combine(n_text: int, *shards) -> pa.Table:
    """One hash partition of the text x embedding curation join:
    ``shards[:n_text]`` are (doc_id, n_tokens) gate-passing text rows,
    the rest (vec_id, cos-in-micro-units) inlier embedding rows. Inner
    join via sorted-unique vec_ids + searchsorted (vec_ids are unique,
    so one probe per doc); output sorted by doc_id for per-partition
    determinism. ``cos_int / 1e6`` reproduces ROUND(cos, 6) exactly:
    both are the nearest double to the same decimal."""
    ts = shards[:n_text]
    es = shards[n_text:]
    tk = (np.concatenate([s[0] for s in ts])
          if ts else np.zeros(0, np.int64))
    ek = (np.concatenate([s[0] for s in es])
          if es else np.zeros(0, np.int64))
    if not len(tk) or not len(ek):
        return _EMB_CUR.empty_table()
    tc = np.concatenate([s[1] for s in ts])
    ec = np.concatenate([s[1] for s in es])
    order = np.argsort(ek, kind="stable")
    eks, ecs = ek[order], ec[order]
    pos = np.searchsorted(eks, tk)
    pos_c = np.minimum(pos, len(eks) - 1)
    found = eks[pos_c] == tk
    dk, nt = tk[found], tc[found]
    cm = ecs[pos_c[found]] / 1e6
    oo = np.argsort(dk, kind="stable")
    return pa.table({"doc_id": dk[oo], "n_tokens": nt[oo],
                     "cos_mean": cm[oo]}, schema=_EMB_CUR)


def doc_emb_curation(sf_dir: str, lang: str = "en", min_tokens: int = 20,
                     max_tokens: int = 1000, min_stop_ratio: float = 0.015,
                     cos_threshold: float = 0.0):
    """JOINT text + embedding curation — the multi-signal quality gate a
    production pretraining pipeline runs (e.g. DataComp-LM-style
    filtering): a document survives only if its TEXT passes the
    language/length/stopword gates AND its EMBEDDING is an inlier
    (cosine vs the corpus mean >= threshold, emb_outlier_scores'
    criterion). Documents and embeddings are BOTH corpus-sized, so
    neither side broadcasts: each side gates block-locally first (text
    stats via one fused scan, cosines via the two-pass broadcast-mean
    scorer), then ONE Fibonacci-hash raw-task exchange
    (``num_returns=P``, 16 bytes/row, survivors only) co-locates every
    doc's text row and embedding row, and each partition emits matches
    via sorted vec_ids + searchsorted. Output rides
    ``from_arrow_refs`` — kept rows never concat on the driver.
    Cosines cross the exchange as ROUND-6 micro-units (int64) so the
    join carries integers only and the float reconstruction is exact
    on both engine and oracle sides."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    SCALE = 10000
    thr = int(round(min_stop_ratio * SCALE))

    def text_gate(batch: pa.Table) -> pa.Table:
        stats = T.annotate_stats(batch)
        alpha = pc.max_element_wise(stats.column("n_alpha_tokens"), 1)
        ratio_ok = pc.greater_equal(
            pc.multiply(pc.cast(stats.column("n_stop_en"), pa.int64()),
                        pa.scalar(SCALE, pa.int64())),
            pc.multiply(pc.cast(alpha, pa.int64()),
                        pa.scalar(thr, pa.int64())),
        )
        m = pc.and_(
            pc.equal(stats.column("pred_lang"), lang),
            pc.and_(
                pc.and_(
                    pc.greater_equal(stats.column("n_tokens"), min_tokens),
                    pc.less_equal(stats.column("n_tokens"), max_tokens)),
                ratio_ok,
            ),
        )
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pc.cast(stats.column("n_tokens"), pa.int64()),
        }).filter(m)

    def emb_gate(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.greater_equal(t.column("cos_mean"),
                                         pa.scalar(cos_threshold)))
        micro = pc.round(pc.multiply(keep.column("cos_mean"),
                                     pa.scalar(1e6)))
        return pa.table({"vec_id": keep.column("vec_id"),
                         "cos_int": pc.cast(micro, pa.int64())})

    text_ds = docs.map_batches(text_gate, batch_format="pyarrow")
    emb_ds = emb_outlier_scores(sf_dir, threshold=cos_threshold) \
        .map_batches(emb_gate, batch_format="pyarrow")
    trefs = [r for b in text_ds.iter_internal_ref_bundles()
             for r, md in b.blocks if md.num_rows]
    if not trefs:
        return _EMB_CUR.empty_table()
    erefs = [r for b in emb_ds.iter_internal_ref_bundles()
             for r, md in b.blocks if md.num_rows]
    if not erefs:
        return _EMB_CUR.empty_table()
    P = max(2, _n_parts())
    shard = ray.remote(_anti_shard)
    tsl = [shard.options(num_returns=P).remote(r, P, "doc_id", "n_tokens")
           for r in trefs]
    esl = [shard.options(num_returns=P).remote(r, P, "vec_id", "cos_int")
           for r in erefs]
    combine = ray.remote(_emb_cur_combine)
    outs = [combine.remote(len(tsl),
                           *[s[p] for s in tsl],
                           *[s[p] for s in esl])
            for p in range(P)]
    return rd.from_arrow_refs(outs)


def orders_mktsegment_revenue(sf_dir: str):
    """Both-sides-distributed hash join via native ``Dataset.join``
    (hash-partitioned on the key): orders x customer -> revenue per
    market segment. Complements the broadcast-join path
    (customer_nation_agg) with the shuffle-join primitive."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(customer, join_type="inner",
                         num_partitions=max(4, _cpus()),
                         on=("o_custkey",), right_on=("c_custkey",))

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["c_mktsegment", "o_totalprice"]).group_by(
            "c_mktsegment").aggregate([("o_totalprice", "sum"),
                                       ("o_totalprice", "count")])
        return g.rename_columns(["c_mktsegment", "revenue", "n_orders"])

    parts = pa.concat_tables(
        joined.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    g = parts.group_by("c_mktsegment").aggregate(
        [("revenue", "sum"), ("n_orders", "sum")]
    )
    g = g.rename_columns(["c_mktsegment", "revenue", "n_orders"])
    return pa.table({
        "c_mktsegment": g.column("c_mktsegment"),
        "n_orders": g.column("n_orders").cast(pa.int64()),
        "revenue": pc.round(g.column("revenue"), 2),
    })


_Q3 = pa.schema([("l_orderkey", pa.int64()),
                 ("o_orderdate", pa.timestamp("us")),
                 ("revenue", pa.float64())])


def orders_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                             date: str = "1995-03-15", k: int = 10):
    """TPC-H Q3 (shipping priority): top-k unshipped orders by revenue
    for one market segment — the canonical 3-table analytical join.
    Distributed shape: segment-filtered customers x date-filtered
    orders through ONE native hash join (both sides corpus-sized, so
    neither broadcasts), the result joined to date-filtered lineitem
    through a SECOND hash join on orderkey; blocks then emit per-order
    partial revenues, ONE Fibonacci-hash exchange on orderkey makes
    the per-partition sums exact (join blocks usually already hold an
    order whole, but Ray may split partitions by size — the exchange
    removes that assumption), and each partition keeps its local top-k
    under the FINAL (round2(revenue) desc, o_orderdate asc, key asc)
    rule — merge-closed, driver sees P x k rows. Exact SQL mirror."""
    cutoff = pa.scalar(pd.Timestamp(date))
    P = max(2, _n_parts())

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda t: t.filter(
            pc.equal(t["c_mktsegment"], segment)), batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(lambda t: t.filter(pc.less(t["o_orderdate"], cutoff)),
                     batch_format="pyarrow")
    j1 = orders.join(cust, join_type="inner",
                     num_partitions=max(4, _cpus()),
                     on=("o_custkey",), right_on=("c_custkey",))
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"]) \
        .map_batches(lambda t: t.filter(pc.greater(t["l_shipdate"], cutoff)),
                     batch_format="pyarrow")
    j2 = li.join(j1, join_type="inner",
                 num_partitions=max(4, _cpus()),
                 on=("l_orderkey",), right_on=("o_orderkey",))

    def rev_shard(block: pa.Table) -> list:
        disc = pc.multiply(block["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), block["l_discount"]))
        g = pa.table({
            "l_orderkey": block.column("l_orderkey"),
            "o_orderdate": block.column("o_orderdate"),
            "revenue": disc,
        }).group_by(["l_orderkey", "o_orderdate"]).aggregate(
            [("revenue", "sum")]).rename_columns(
            ["l_orderkey", "o_orderdate", "revenue"])
        keys = g.column("l_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if not len(keys):
            return [g.cast(_Q3) for _ in range(P)]
        part = _lp_partition(keys, P)
        order = np.argsort(part, kind="stable")
        st = g.take(pa.array(order)).cast(_Q3)
        bounds = np.searchsorted(part[order], np.arange(P + 1))
        return [st.slice(s, e - s) for s, e in zip(bounds[:-1], bounds[1:])]

    def topk_combine(*shards) -> pa.Table:
        live = [x for x in shards if x.num_rows]
        if not live:
            return _Q3.empty_table()
        t = pa.concat_tables(live)
        g = t.group_by(["l_orderkey", "o_orderdate"]).aggregate(
            [("revenue", "sum")]).rename_columns(
            ["l_orderkey", "o_orderdate", "revenue"])
        keys = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        dates = g.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        rev = np.round(g.column("revenue").to_numpy(zero_copy_only=False), 2)
        order = np.lexsort((keys, dates, -rev))[:k]
        return pa.table({
            "l_orderkey": pa.array(keys[order].astype(np.int64)),
            "o_orderdate": g.column("o_orderdate").take(pa.array(order)),
            "revenue": pa.array(rev[order]),
        }, schema=_Q3)

    refs = [block_ref for bundle in j2.iter_internal_ref_bundles()
            for block_ref, _md in bundle.blocks if _md.num_rows]
    if not refs:
        return _Q3.empty_table()
    shard = ray.remote(rev_shard)
    sl = [shard.options(num_returns=P).remote(r) for r in refs]
    combine = ray.remote(topk_combine)
    outs = ray.get([combine.remote(*[s[p] for s in sl]) for p in range(P)])
    merged = pa.concat_tables([_Q3.empty_table()] + outs)
    keys = merged.column("l_orderkey").to_numpy(zero_copy_only=False)
    dates = merged.column("o_orderdate").to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    rev = merged.column("revenue").to_numpy(zero_copy_only=False)
    order = np.lexsort((keys, dates, -rev))[:k]
    return pa.table({
        "l_orderkey": pa.array(keys[order].astype(np.int64)),
        "o_orderdate": merged.column("o_orderdate").take(pa.array(order)),
        "revenue": pa.array(rev[order]),
    }, schema=_Q3)


def lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary (grouped multi-aggregate)."""
    from ray.data.aggregate import Count, Sum

    cutoff = pa.scalar(pd.Timestamp("1998-09-02"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc)

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount", "l_shipdate"])
    ds = ds.map_batches(prep, batch_format="pyarrow")
    agg = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_base_price"),
        Sum("disc_price", alias_name="sum_disc_price"),
        Count(alias_name="count_order"),
    )
    df = agg.to_pandas()
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        df[c] = df[c].round(2)
    df["count_order"] = df["count_order"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


def orders_by_month(sf_dir: str):
    """Orders per month: count + rounded revenue."""

    def partial(t: pa.Table) -> pa.Table:
        month = pc.strftime(t["o_orderdate"], format="%Y-%m")
        g = pa.table({
            "month": month,
            "o_totalprice": t["o_totalprice"],
        }).group_by("month").aggregate([("o_totalprice", "sum"), ("o_totalprice", "count")])
        return g.rename_columns(["month", "revenue", "n_orders"])

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
    parts = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    g = parts.group_by("month").aggregate([("revenue", "sum"), ("n_orders", "sum")])
    g = g.rename_columns(["month", "revenue", "n_orders"])
    return pa.table({
        "month": g.column("month"),
        "n_orders": g.column("n_orders").cast(pa.int64()),
        "revenue": pc.round(g.column("revenue"), 2),
    })


def events_sliding_window(sf_dir: str, size_minutes: int = 60,
                          slide_minutes: int = 15):
    """Sliding (hopping) window aggregate — the overlapping-window
    operator the brief names alongside as-of/range join. Every event
    belongs to ``k = size/slide`` windows (size must be a multiple of
    slide); the expansion happens INSIDE the block-local partial (row
    indices repeated k times via Arrow take + one group_by per block),
    so only (window_start, event_type) partial rows — never expanded
    events — leave a worker. Same partial+merge shape as
    events_hourly: bounded-cardinality merge on the driver."""
    if size_minutes % slide_minutes:
        raise ValueError("size must be a multiple of slide")
    k = size_minutes // slide_minutes
    slide_us = np.int64(slide_minutes) * 60 * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        bucket = ts.astype("datetime64[us]").astype(np.int64) // slide_us
        idx = np.repeat(np.arange(n), k)
        wstart = (bucket[:, None] - np.arange(k)[None, :]).ravel() * slide_us
        g = pa.table({
            "window_start": pa.array(wstart.astype("datetime64[us]")),
            "event_type": t.column("event_type").take(pa.array(idx)),
            "value": t.column("value").take(pa.array(idx)),
        }).group_by(["window_start", "event_type"]).aggregate(
            [("value", "sum"), ("value", "count")])
        return g.rename_columns(
            ["window_start", "event_type", "sum_value", "n_events"])

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    parts = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    g = parts.group_by(["window_start", "event_type"]).aggregate(
        [("sum_value", "sum"), ("n_events", "sum")]
    )
    g = g.rename_columns(["window_start", "event_type", "sum_value", "n_events"])
    return pa.table({
        "window_start": g.column("window_start"),
        "event_type": g.column("event_type"),
        "n_events": g.column("n_events").cast(pa.int64()),
        "sum_value": pc.round(g.column("sum_value"), 2),
    })


def events_sliding_distinct(sf_dir: str, size_minutes: int = 60,
                            slide_minutes: int = 15):
    """Sliding-window DISTINCT users — the overlapping-window form of
    exact DAU (concurrent-user curves, rolling reach). Distinct counts
    don't partial-sum, so this composes the two proven layouts: the
    sliding expansion happens block-locally (every event joins its
    k = size/slide windows, then the block dedupes its (window, user)
    pairs — volume drops before anything leaves the worker), ONE
    Fibonacci-hash exchange on user_id co-locates every copy of a user
    (``num_returns=P`` raw tasks, the events_daily_active layout), each
    partition dedupes and counts per window over its DISJOINT user set,
    and the driver folds P x |windows| ints. Nothing user-sized lands
    anywhere central. COUNT(DISTINCT)-over-expansion SQL mirror."""
    if size_minutes % slide_minutes:
        raise ValueError("size must be a multiple of slide")
    k = size_minutes // slide_minutes
    slide_us = np.int64(slide_minutes) * 60 * 1_000_000
    P = max(2, _n_parts())

    def pair_shard(block: pa.Table) -> list:
        n = block.num_rows
        ts = block.column("ts").to_numpy(zero_copy_only=False)
        bucket = ts.astype("datetime64[us]").astype(np.int64) // slide_us
        idx = np.repeat(np.arange(n), k)
        wstart = (bucket[:, None] - np.arange(k)[None, :]).ravel() * slide_us
        pairs = pa.table({
            "window_start": pa.array(wstart.astype("datetime64[us]")),
            "user_id": block.column("user_id").take(pa.array(idx)),
        }).group_by(["window_start", "user_id"]).aggregate([])
        u = pairs.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if not len(u):
            return [pairs for _ in range(P)]
        part = _lp_partition(u, P)
        order = np.argsort(part, kind="stable")
        sorted_tbl = pairs.take(pa.array(order))
        bounds = np.searchsorted(part[order], np.arange(P + 1))
        return [sorted_tbl.slice(s, e - s)
                for s, e in zip(bounds[:-1], bounds[1:])]

    PARTIAL = pa.schema([("window_start", pa.timestamp("us")),
                         ("n", pa.int64())])

    def win_combine(*tables) -> pa.Table:
        live = [x for x in tables if x.num_rows]
        if not live:
            return PARTIAL.empty_table()
        t = pa.concat_tables(live)
        dd = t.group_by(["window_start", "user_id"]).aggregate([])
        g = dd.group_by("window_start").aggregate([([], "count_all")])
        return g.rename_columns(["window_start", "n"]).cast(PARTIAL)

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])
    OUT = pa.schema([("window_start", pa.timestamp("us")),
                     ("n_users", pa.int64())])
    refs = [block_ref for bundle in ds.iter_internal_ref_bundles()
            for block_ref, _md in bundle.blocks if _md.num_rows]
    if not refs:
        return OUT.empty_table()
    shard = ray.remote(pair_shard)
    sl = [shard.options(num_returns=P).remote(r) for r in refs]
    combine = ray.remote(win_combine)
    outs = ray.get([combine.remote(*[s[p] for s in sl]) for p in range(P)])
    merged = pa.concat_tables([PARTIAL.empty_table()] + outs)
    g = merged.group_by("window_start").aggregate([("n", "sum")])
    order = pc.sort_indices(g.column("window_start"))
    return pa.table({
        "window_start": g.column("window_start").take(order),
        "n_users": g.column("n_sum").take(order).cast(pa.int64()),
    })


def events_transitions(sf_dir: str):
    """Per-user next-event transition counts (sequence bigrams) — the
    Markov-chain / funnel building block. Hash-partition by user so
    each partition holds complete user histories, sort once per
    partition by (user, ts, event_id), vectorized shift-compare for
    adjacency (a pair exists only when the shifted row is the SAME
    user), then a block-local (from_type, to_type) partial count; the
    driver merges the tiny |types|^2 partial rows. Text of events
    never leaves its partition unaggregated."""
    P = _n_parts()

    def bigrams_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = np.zeros(len(g), dtype=bool)
        same[:-1] = uid[:-1] == uid[1:]
        out = pd.DataFrame({
            "from_type": et[:-1][same[:-1]],
            "to_type": et[1:][same[:-1]],
        })
        return (out.groupby(["from_type", "to_type"], as_index=False)
                .size().rename(columns={"size": "n"}))

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    parts_ds = (
        ds.map_batches(
            lambda t: t.append_column(
                "part", pa.array(
                    t.column("user_id").to_numpy(zero_copy_only=False) % P)),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(bigrams_part, batch_format="pandas")
    )
    parts = pa.concat_tables(
        parts_ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if parts.num_rows == 0:
        return pa.table({
            "from_type": pa.array([], pa.string()),
            "to_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        })
    g = parts.group_by(["from_type", "to_type"]).aggregate([("n", "sum")])
    return pa.table({
        "from_type": g.column("from_type"),
        "to_type": g.column("to_type"),
        "n": g.column("n_sum").cast(pa.int64()),
    })


def events_quantiles(sf_dir: str, qs: tuple = (0.5, 0.9, 0.99)):
    """Exact per-group continuous quantiles (p50/p90/p99 of value per
    event_type) — linear interpolation at rank q*(n-1), the
    quantile_cont definition numpy's 'linear' percentile shares.
    Groups are the shuffle key: with bounded group cardinality each
    group's values land on one worker and one vectorized np.percentile
    call per group suffices. Partitioning assumption: one group's
    values fit a worker — for heavy groups or unbounded cardinality
    the approximate path is the CMS/HLL sketch family
    (stages/sketch.py); exact quantiles fundamentally need the group's
    order statistics co-located."""

    def quants(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy()
        p = np.percentile(v, [q * 100 for q in qs], method="linear")
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "p50": [round(float(p[0]), 6)],
            "p90": [round(float(p[1]), 6)],
            "p99": [round(float(p[2]), 6)],
        })

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return ds.groupby("event_type").map_groups(quants, batch_format="pandas")


_ULTV = pa.schema([("user_id", pa.int64()), ("n_events", pa.int64()),
                   ("total_value", pa.float64())])


def events_user_value_topk(sf_dir: str, k: int = 100):
    """Top-k users by lifetime summed value — exact heavy hitters over
    a high-cardinality key (users are unbounded at scale, so the
    vocab_topk-style driver merge is a memory cliff; the CMS sketch is
    the approximate twin). Same layout as doc_vocab_bigrams: block
    partials (one group_by per block — volume drops to block-distinct
    users), ONE Fibonacci-hash exchange on user_id, per-partition
    exact sums + LOCAL top-k under the FINAL (round2(value) desc,
    n desc, user asc) key — a user lives in exactly one partition, so
    P local top-ks contain the global top-k; driver merges P x k rows.
    Exact SQL mirror."""
    P = max(2, _n_parts())

    def val_shard(block: pa.Table) -> list:
        g = pa.table({
            "user_id": block.column("user_id"),
            "value": block.column("value"),
        }).group_by("user_id").aggregate(
            [("value", "sum"), ("value", "count")]).rename_columns(
            ["user_id", "total_value", "n_events"])
        g = g.select(["user_id", "n_events", "total_value"]) \
            .cast(pa.schema([("user_id", pa.int64()),
                             ("n_events", pa.int64()),
                             ("total_value", pa.float64())]))
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return [g for _ in range(P)]
        part = _lp_partition(u.astype(np.int64), P)
        order = np.argsort(part, kind="stable")
        st = g.take(pa.array(order))
        bounds = np.searchsorted(part[order], np.arange(P + 1))
        return [st.slice(s, e - s) for s, e in zip(bounds[:-1], bounds[1:])]

    def ltv_combine(*shards) -> pa.Table:
        live = [x for x in shards if x.num_rows]
        if not live:
            return _ULTV.empty_table()
        t = pa.concat_tables(live)
        g = t.group_by("user_id").aggregate(
            [("total_value", "sum"), ("n_events", "sum")]).rename_columns(
            ["user_id", "total_value", "n_events"])
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        n = g.column("n_events").to_numpy(zero_copy_only=False)
        v = np.round(g.column("total_value").to_numpy(zero_copy_only=False),
                     2)
        order = np.lexsort((u, -n, -v))[:k]
        return pa.table({
            "user_id": pa.array(u[order].astype(np.int64)),
            "n_events": pa.array(n[order].astype(np.int64)),
            "total_value": pa.array(v[order]),
        }, schema=_ULTV)

    ds = _read(sf_dir, "events", columns=["user_id", "value"])
    refs = [block_ref for bundle in ds.iter_internal_ref_bundles()
            for block_ref, _md in bundle.blocks if _md.num_rows]
    if not refs:
        return _ULTV.empty_table()
    shard = ray.remote(val_shard)
    sl = [shard.options(num_returns=P).remote(r) for r in refs]
    combine = ray.remote(ltv_combine)
    outs = ray.get([combine.remote(*[s[p] for s in sl]) for p in range(P)])
    merged = pa.concat_tables([_ULTV.empty_table()] + outs)
    u = merged.column("user_id").to_numpy(zero_copy_only=False)
    n = merged.column("n_events").to_numpy(zero_copy_only=False)
    v = merged.column("total_value").to_numpy(zero_copy_only=False)
    order = np.lexsort((u, -n, -v))[:k]
    return pa.table({
        "user_id": pa.array(u[order].astype(np.int64)),
        "n_events": pa.array(n[order].astype(np.int64)),
        "total_value": pa.array(v[order]),
    }, schema=_ULTV)


def events_quantiles_kll(sf_dir: str, qs: tuple = (0.5, 0.9, 0.99)):
    """Approximate per-type value percentiles via mergeable KLL
    sketches — the scale twin of ``events_quantiles`` for heavy groups
    or unbounded group cardinality, where co-locating a group's order
    statistics is the bottleneck the sketch removes (same pairing as
    log_bytes_quantiles / _kll on the log side). One bounded compactor
    ladder per (block, event_type); driver merges |types| x blocks
    sketches. No SQL gate (approximate by construction); rank-error
    and merge law are pinned in tests/test_sketch.py and the exact
    twin brackets it in the query-level test."""
    from ..stages.kll import KLLSketch

    K = 256

    def partial(t: pa.Table) -> pa.Table:
        srcs, sketches = [], []
        if t.num_rows:
            enc = pc.dictionary_encode(t.column("event_type")
                                       .combine_chunks())
            vals = t.column("value").combine_chunks().to_numpy(
                zero_copy_only=False)
            idx = enc.indices.to_numpy(zero_copy_only=False)
            for i, et in enumerate(enc.dictionary.to_pylist()):
                sk = KLLSketch(K)
                sk.add(vals[idx == i])
                srcs.append(et)
                sketches.append(sk.to_bytes())
        return pa.table({
            "event_type": pa.array(srcs, type=pa.string()),
            "sketch": pa.array(sketches, type=pa.binary()),
        })

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    parts = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None))
    merged: dict = {}
    for et, blob in zip(parts.column("event_type").to_pylist(),
                        parts.column("sketch").to_pylist()):
        sk = KLLSketch.from_bytes(blob)
        if et in merged:
            merged[et].merge(sk)
        else:
            merged[et] = sk
    schema = pa.schema([("event_type", pa.string()), ("p50", pa.float64()),
                        ("p90", pa.float64()), ("p99", pa.float64())])
    rows = sorted(merged.items())
    return pa.table({
        "event_type": pa.array([s for s, _ in rows], type=pa.string()),
        "p50": pa.array([r.quantile(qs[0]) for _, r in rows]),
        "p90": pa.array([r.quantile(qs[1]) for _, r in rows]),
        "p99": pa.array([r.quantile(qs[2]) for _, r in rows]),
    }, schema=schema)


def events_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session windows over the events stream: per user, events closer
    than ``gap_minutes`` belong to one session (the classic stream
    sessionization, expressed as groupby(user).map_groups over
    ts-sorted groups — the Ray-idiomatic stream-window pattern).

    Partitioning assumption: one hash partition of users fits in a
    worker (partition-grouped, see _n_parts). For hot single users where
    even that breaks, use ``events_sessionize_salted`` — the two-phase
    time-bucketed variant with identical output.
    Output: one row per session."""
    P = _n_parts()

    def sessions_part(g: pd.DataFrame) -> pd.DataFrame:
        # all users of one hash partition, fully vectorized: session
        # boundaries = user change OR gap > threshold
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        gaps = g["ts"].diff().dt.total_seconds().to_numpy()
        new_sess = new_user | (gaps > gap_minutes * 60)
        sid = np.cumsum(new_sess)
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "count"),
            sum_value=("value", "sum"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].round(2)
        return out.reset_index(drop=True)

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda t: t.append_column(
            "part", pa.array(t.column("user_id").to_numpy() % P)),
        batch_format="pyarrow",
    )
    return ds.groupby("part").map_groups(sessions_part, batch_format="pandas")


def events_running_total(sf_dir: str):
    """CUMULATIVE window (ROWS UNBOUNDED PRECEDING) per user — the
    running-balance/LTV-to-date primitive, completing the window
    family next to the time-framed sliding window and the sessionizer:
    every event gets its user's running event count and running value
    sum under the total (ts, event_id) order. Partition-grouped by
    user hash (the sessionize pattern); inside a partition one lexsort
    + cumsum with segment-base subtraction — no per-user Python, no
    per-row state. Running sums are sequential prefix sums on BOTH
    engines (np.cumsum and DuckDB's window accumulate in the same
    order), ROUND-6 absorbs the residue."""
    P = _n_parts()

    def running_part(g: pd.DataFrame) -> pd.DataFrame:
        o = np.lexsort((g["event_id"].to_numpy(),
                        g["ts"].to_numpy(), g["user_id"].to_numpy()))
        uid = g["user_id"].to_numpy()[o]
        v = g["value"].to_numpy()[o]
        new = np.ones(len(uid), dtype=bool)
        new[1:] = uid[1:] != uid[:-1]
        seg = np.cumsum(new) - 1
        cs = np.cumsum(v)
        starts = np.flatnonzero(new)
        base = (cs[starts] - v[starts])[seg]
        pos = np.arange(len(uid), dtype=np.int64)
        running_n = pos - starts[seg] + 1
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy()[o],
            "user_id": uid,
            "ts": g["ts"].to_numpy()[o],
            "running_n": running_n,
            "running_value": np.round(cs - base, 6),
        })

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda t: t.append_column(
            "part", pa.array(t.column("user_id").to_numpy() % P)),
        batch_format="pyarrow",
    )
    return ds.groupby("part").map_groups(running_part,
                                         batch_format="pandas")


def events_attribution(sf_dir: str,
                       touch_types: tuple = ("click", "view"),
                       conv_type: str = "purchase",
                       mode: str = "last"):
    """LAST- or FIRST-TOUCH attribution — the marketing-analytics join
    of a conversion event to the same user's most recent (``last``) or
    earliest (``first``) preceding touch event (click/view), under the
    total (ts, event_id) order; revenue and conversion counts fold per
    attributed channel, with 'none' for conversions with no prior
    touch.

    Partition-grouped by user hash (the sessionize pattern); inside a
    partition one lexsort, a fill of touch positions cut at user-run
    starts (maximum.accumulate of positions for last-touch; the same
    accumulate over first-touch-run-anchored positions for first), and
    a shifted lookup — no per-user Python. Partitions emit per-channel
    sufficient stats (n, sum value); the driver folds |channels|+1
    rows. ROUND-2 on the revenue sum (the revenue-query convention)."""
    P = _n_parts()
    out_schema = pa.schema([("touch_type", pa.string()),
                            ("n_purchases", pa.int64()),
                            ("total_value", pa.float64())])

    def attr_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        val = g["value"].to_numpy()
        n = len(g)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        run_start = np.maximum.accumulate(
            np.where(new_user, np.arange(n), 0))
        touch = np.isin(et, list(touch_types))
        pos = np.where(touch, np.arange(n), -1)
        ff = np.maximum.accumulate(pos)
        prev_ff = np.empty(n, dtype=np.int64)
        prev_ff[0] = -1
        prev_ff[1:] = ff[:-1]
        if mode == "first":
            # a touch is its run's FIRST iff no earlier touch exists in
            # the run; that lone candidate then forward-fills like last
            is_first = touch & (prev_ff < run_start)
            pos_f = np.where(is_first, np.arange(n), -1)
            fff = np.maximum.accumulate(pos_f)
            prev_ff = np.empty(n, dtype=np.int64)
            prev_ff[0] = -1
            prev_ff[1:] = fff[:-1]
        conv = et == conv_type
        valid = conv & (prev_ff >= run_start)
        channel = np.where(valid, et[np.maximum(prev_ff, 0)], "none")
        channel = np.where(conv, channel, "none")
        ch, inv = np.unique(channel[conv], return_inverse=True)
        cnt = np.bincount(inv)
        sv = np.bincount(inv, weights=val[conv])
        return pd.DataFrame({"touch_type": ch,
                             "n_purchases": cnt.astype("int64"),
                             "total_value": sv})

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type", "value"])
    ds = ds.map_batches(
        lambda t: t.append_column(
            "part", pa.array(t.column("user_id").to_numpy() % P)),
        batch_format="pyarrow",
    )
    parts = pa.concat_tables(
        [out_schema.empty_table()] +
        [b.select(out_schema.names).cast(out_schema) for b in
         ds.groupby("part").map_groups(attr_part, batch_format="pandas")
         .iter_batches(batch_format="pyarrow", batch_size=None)])
    g = parts.group_by("touch_type").aggregate(
        [("n_purchases", "sum"), ("total_value", "sum")])
    return pa.table({
        "touch_type": g.column("touch_type"),
        "n_purchases": g.column("n_purchases_sum").cast(pa.int64()),
        "total_value": pa.array(
            np.round(g.column("total_value_sum").to_numpy(
                zero_copy_only=False), 2)),
    })


def events_cohort_ltv(sf_dir: str):
    """COHORT LTV table — the classic product-analytics rollup: users
    cohorted by their first-event week, every event bucketed by weeks
    since that cohort week, and per (cohort_week, age_weeks) cell the
    active-user count, event count and purchase revenue. Week indexes
    are exact integer math on microsecond epochs (no float epoch —
    DuckDB CAST rounds where // truncates).

    Partition-grouped by user hash: a user's whole history lands in
    one partition, so per-cell distinct-user counts are exact as
    plain partial sums; inside a partition one lexsort, segment-start
    cohort lookup, and composite-key unique folds. The driver merges
    cells x partitions rows (bounded by the corpus time span)."""
    P = _n_parts()
    W_US = 604800 * 1_000_000  # one week of microseconds
    out_schema = pa.schema([
        ("cohort_week", pa.int64()), ("age_weeks", pa.int64()),
        ("n_users", pa.int64()), ("n_events", pa.int64()),
        ("revenue", pa.float64()),
    ])

    def cohort_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        # normalize pandas' datetime unit explicitly (ns vs us varies)
        e_us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        et = g["event_type"].to_numpy()
        val = g["value"].to_numpy()
        n = len(g)
        w = e_us // W_US
        new = np.ones(n, dtype=bool)
        new[1:] = uid[1:] != uid[:-1]
        run_start = np.maximum.accumulate(np.where(new, np.arange(n), 0))
        cw = w[run_start]  # first row of the user run = min ts = cohort
        age = w - cw
        B = int(age.max()) + 1 if n else 1
        cell = cw * B + age
        uc, inv = np.unique(cell, return_inverse=True)
        n_events = np.bincount(inv)
        rev = np.bincount(inv, weights=np.where(et == "purchase", val, 0.0))
        # distinct users per cell: unique (user, cell) pairs
        pair = np.unique(np.stack([uid, cell], axis=1), axis=0)
        n_users = np.bincount(
            np.searchsorted(uc, pair[:, 1]), minlength=len(uc))
        return pd.DataFrame({
            "cohort_week": (uc // B).astype("int64"),
            "age_weeks": (uc % B).astype("int64"),
            "n_users": n_users.astype("int64"),
            "n_events": n_events.astype("int64"),
            "revenue": rev,
        })

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type", "value"])
    ds = ds.map_batches(
        lambda t: t.append_column(
            "part", pa.array(t.column("user_id").to_numpy() % P)),
        batch_format="pyarrow",
    )
    parts = pa.concat_tables(
        [out_schema.empty_table()] +
        [b.select(out_schema.names).cast(out_schema) for b in
         ds.groupby("part").map_groups(cohort_part, batch_format="pandas")
         .iter_batches(batch_format="pyarrow", batch_size=None)])
    g = parts.group_by(["cohort_week", "age_weeks"]).aggregate(
        [("n_users", "sum"), ("n_events", "sum"), ("revenue", "sum")])
    return pa.table({
        "cohort_week": g.column("cohort_week"),
        "age_weeks": g.column("age_weeks"),
        "n_users": g.column("n_users_sum").cast(pa.int64()),
        "n_events": g.column("n_events_sum").cast(pa.int64()),
        "revenue": pa.array(np.round(
            g.column("revenue_sum").to_numpy(zero_copy_only=False), 2)),
    })


def events_attribution_first(sf_dir: str):
    """FIRST-touch attribution (the other standard model): conversions
    credit the user's EARLIEST preceding touch. Same engine as
    events_attribution with mode='first'; gated against a
    first_value(... IGNORE NULLS) window mirror."""
    return events_attribution(sf_dir, mode="first")


def events_ab_ttest(sf_dir: str):
    """A/B experiment readout — the experimentation-analytics
    primitive: users hash-split into two arms (md5 of the user id, the
    repo's deterministic-assignment idiom — same user always lands in
    the same arm across reruns and partitionings), then Welch's
    t-statistic over per-event values. Distributed shape: ONE streaming
    pass of per-block (arm, n, sum, sumsq) partials, a 2-row driver
    fold — nothing corpus-sized anywhere, the 100-TB shape of every
    sufficient-statistics test. Variance comes EXPLICITLY from the
    (n, sum, sumsq) moments on both sides (DuckDB's VAR_SAMP uses a
    different update rule, so the oracle computes the same closed form
    instead); ROUND-6 absorbs summation-order noise."""
    ds = _read(sf_dir, "events", columns=["user_id", "value"])
    PART = pa.schema([("arm", pa.int64()), ("n", pa.int64()),
                      ("sv", pa.float64()), ("svv", pa.float64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return PART.empty_table()
        uid_s = pa.table(
            {"u": t.column("user_id").cast(pa.string())})
        h = D.add_text_hash(uid_s, column="u").column(
            "text_hash").to_numpy(zero_copy_only=False)
        arm = (h % 2).astype(np.int64)
        v = t.column("value").to_numpy(zero_copy_only=False)
        n = np.bincount(arm, minlength=2)
        sv = np.bincount(arm, weights=v, minlength=2)
        svv = np.bincount(arm, weights=v * v, minlength=2)
        return pa.table({"arm": pa.array([0, 1], pa.int64()),
                         "n": pa.array(n.astype(np.int64)),
                         "sv": pa.array(sv), "svv": pa.array(svv)},
                        schema=PART)

    OUT = pa.schema([("n_a", pa.int64()), ("n_b", pa.int64()),
                     ("mean_a", pa.float64()), ("mean_b", pa.float64()),
                     ("t_stat", pa.float64())])
    parts = pa.concat_tables(
        [PART.empty_table()]
        + list(ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None)))
    g = parts.group_by("arm").aggregate(
        [("n", "sum"), ("sv", "sum"), ("svv", "sum")])
    idx = g.column("arm").to_numpy(zero_copy_only=False)
    n = np.zeros(2, np.int64)
    sv = np.zeros(2)
    svv = np.zeros(2)
    n[idx] = g.column("n_sum").to_numpy(zero_copy_only=False)
    sv[idx] = g.column("sv_sum").to_numpy(zero_copy_only=False)
    svv[idx] = g.column("svv_sum").to_numpy(zero_copy_only=False)
    if (n < 2).any():
        # an arm with <2 events has no sample variance; the SQL mirror
        # likewise emits no row (its a JOIN b finds no pair)
        return OUT.empty_table()
    mean = sv / n
    var = (svv - sv * sv / n) / (n - 1)
    t_stat = (mean[0] - mean[1]) / np.sqrt(var[0] / n[0] + var[1] / n[1])
    return pa.table({
        "n_a": pa.array([n[0]]), "n_b": pa.array([n[1]]),
        "mean_a": pa.array([round(mean[0], 6)]),
        "mean_b": pa.array([round(mean[1], 6)]),
        "t_stat": pa.array([round(float(t_stat), 6)]),
    })


def events_user_features(sf_dir: str):
    """Per-user feature engineering — the user-level feature table a
    ranking/recommendation training job materializes: event count,
    total value, distinct event types, first/last timestamps and
    distinct active days. Needs per-user DISTINCT sets, so it is
    partition-grouped by user hash (the sessionize pattern, P ~ 4x
    cpus, never per-user map_groups) with everything inside a
    partition vectorized: one lexsort per distinct-feature, segment
    boundaries, bincount folds. Output is user-sized (the op's own
    output), per-partition."""
    P = _n_parts()

    def feats_part(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        uu, codes = np.unique(uid, return_inverse=True)
        nu = len(uu)
        ts = g["ts"].to_numpy()
        v = g["value"].to_numpy()
        n_events = np.bincount(codes, minlength=nu).astype(np.int64)
        sum_value = np.bincount(codes, weights=v, minlength=nu)
        tsi = ts.astype("datetime64[us]").astype(np.int64)
        first_ts = np.full(nu, np.iinfo(np.int64).max)
        np.minimum.at(first_ts, codes, tsi)
        last_ts = np.full(nu, np.iinfo(np.int64).min)
        np.maximum.at(last_ts, codes, tsi)

        def n_distinct(vals: np.ndarray) -> np.ndarray:
            o = np.lexsort((vals, codes))
            cs, vs = codes[o], vals[o]
            newseg = np.ones(len(cs), dtype=bool)
            newseg[1:] = (cs[1:] != cs[:-1]) | (vs[1:] != vs[:-1])
            return np.bincount(cs[newseg], minlength=nu).astype(np.int64)

        et_codes = pd.factorize(g["event_type"].to_numpy())[0]
        days = tsi // 86_400_000_000
        return pd.DataFrame({
            "user_id": uu,
            "n_events": n_events,
            "total_value": np.round(sum_value, 6),
            "n_event_types": n_distinct(et_codes),
            "first_ts": first_ts.astype("datetime64[us]"),
            "last_ts": last_ts.astype("datetime64[us]"),
            "n_active_days": n_distinct(days),
        })

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type", "value"])
    ds = ds.map_batches(
        lambda t: t.append_column(
            "part", pa.array(t.column("user_id").to_numpy() % P)),
        batch_format="pyarrow",
    )
    return ds.groupby("part").map_groups(feats_part, batch_format="pandas")


def events_sessionize_salted(sf_dir: str, gap_minutes: int = 30,
                             bucket: str = "day"):
    """Skew-safe sessionization (the scale path for hot users): phase 1
    groups by (user, coarse time bucket) — a hot user's events split
    across buckets, bounding any single group — and builds partial
    sessions inside each bucket; phase 2 groups by user over the PARTIAL
    SESSION rows (orders of magnitude fewer than events: bounded by
    events/bucket compression) and merges sessions whose boundary gap is
    within ``gap_minutes``. Result is exactly equal to the single-pass
    sessionization — a session spanning a bucket edge is reassembled in
    the merge — so the same SQL oracle gates it.

    Partitioning assumption: one user's SESSIONS (not events) fit in a
    worker; the bucket granularity is the skew knob."""

    P = _n_parts()

    def partial_sessions_part(g: pd.DataFrame) -> pd.DataFrame:
        # all (user, bucket) groups of one hash partition, vectorized:
        # partial-session boundary = user/bucket change OR gap
        g = g.sort_values(["user_id", "bucket", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        bk = g["bucket"].to_numpy()
        newg = np.ones(len(g), dtype=bool)
        newg[1:] = (uid[1:] != uid[:-1]) | (bk[1:] != bk[:-1])
        gaps = g["ts"].diff().dt.total_seconds().to_numpy()
        sid = np.cumsum(newg | (gaps > gap_minutes * 60))
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "count"),
            sum_value=("value", "sum"),
        )
        return out.reset_index(drop=True)

    def merge_sessions_part(g: pd.DataFrame) -> pd.DataFrame:
        # all users of one hash partition: merge boundary = user change
        # OR boundary gap > threshold over the ordered partial sessions
        g = g.sort_values(["user_id", "session_start", "session_end"],
                          kind="stable")
        uid = g["user_id"].to_numpy()
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        gaps = (g["session_start"] - g["session_end"].shift()).dt.total_seconds()
        new_session = np.cumsum(new_user | (gaps.to_numpy() > gap_minutes * 60))
        out = g.groupby(new_session).agg(
            user_id=("user_id", "first"),
            session_start=("session_start", "min"),
            session_end=("session_end", "max"),
            n_events=("n_events", "sum"),
            sum_value=("sum_value", "sum"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].round(2)
        return out.reset_index(drop=True)

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.append_column(
            "bucket", pc.floor_temporal(t["ts"], unit=bucket).cast(pa.int64())
        )
        part = (t.column("user_id").to_numpy() * 8191
                + t.column("bucket").to_numpy()) % P
        return t.append_column("part", pa.array(part))

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    partials = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("part")
        .map_groups(partial_sessions_part, batch_format="pandas")
        .map_batches(
            lambda t: t.append_column(
                "part2", pa.array(t.column("user_id").to_numpy() % P)),
            batch_format="pyarrow",
        )
    )
    return partials.groupby("part2").map_groups(
        merge_sessions_part, batch_format="pandas")


def doc_chunk(sf_dir: str, chunk_tokens: int = 32):
    """Fixed-window document chunking (sequence-length prep): each doc
    fans out to one row per ``chunk_tokens``-token window via the
    zero-copy re-slice + binary_join kernel in functions/text.chunk_docs
    — a pure map_batches fan-out, no shuffle. The SQL oracle rebuilds
    the same chunks with positional unnest + ordered string_agg."""
    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda b: T.chunk_docs(b, chunk_tokens), batch_format="pyarrow"
    )


def emb_triplet_mining(sf_dir: str, n_anchors: int = 10):
    """HARD-NEGATIVE triplet mining — the metric-learning data op: for
    each anchor (the ``n_anchors`` lowest vec_ids), find the nearest
    SAME-label vector (the retrieval positive) and the nearest
    DIFFERENT-label vector (the hard negative — the pair that makes
    triplet losses informative). Broadcast the anchor matrix once;
    each block emits one
    (anchor, class) -> best-key partial (blocks x 2k rows); the driver
    max-folds. Selection routes through the FLOORED integer composite
    key (floor(cos*1e6)+offset)*2^33 + (2^33-1-vec_id) on BOTH sides —
    the emb_pq_codes argmax idiom (f64 ulp noise cannot flip an
    integer key off measure-zero boundaries), so the gate is
    hash-exact on ids."""
    B33 = 1 << 33
    OFF = 2_000_000  # makes the floored cos term non-negative

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    head = pa.concat_tables(
        ds.map_batches(
            lambda t: t.sort_by("vec_id").slice(0, n_anchors),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("vec_id").slice(0, n_anchors)
    a_ids = head.column("vec_id").to_numpy(zero_copy_only=False)
    a_lab = head.column("label").to_numpy(zero_copy_only=False)
    a_m = D.normalize_rows(S.embedding_matrix(head))
    a_ref = ray.put((a_ids.astype(np.int64), a_lab.astype(np.int64), a_m))

    part_schema = pa.schema([("aid", pa.int64()), ("same", pa.int64()),
                             ("key", pa.int64())])

    def block_best(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        aid, alab, am = ray.get(a_ref)
        ids = t.column("vec_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(ids) and ids.max() >= B33 - 1:
            raise ValueError("vec_id exceeds the 2^33 key range")
        lab = t.column("label").to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = D.normalize_rows(S.embedding_matrix(t))
        cos = m @ am.T  # n x n_anchors
        key = ((np.floor(cos * 1e6).astype(np.int64) + OFF) * B33
               + (B33 - 1 - ids)[:, None])
        rows = []
        for j in range(len(aid)):
            kj = key[:, j]
            notself = ids != aid[j]
            for same in (1, 0):
                mask = notself & ((lab == alab[j]) == bool(same))
                if mask.any():
                    rows.append((int(aid[j]), same, int(kj[mask].max())))
        if not rows:
            return part_schema.empty_table()
        return pa.table({
            "aid": pa.array([r[0] for r in rows], pa.int64()),
            "same": pa.array([r[1] for r in rows], pa.int64()),
            "key": pa.array([r[2] for r in rows], pa.int64()),
        })

    parts = pa.concat_tables(
        [part_schema.empty_table()] +
        list(ds.map_batches(block_best, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    out_schema = pa.schema([
        ("anchor_id", pa.int64()), ("anchor_label", pa.int64()),
        ("pos_id", pa.int64()), ("neg_id", pa.int64()),
    ])
    if parts.num_rows == 0:
        return out_schema.empty_table()
    g = parts.group_by(["aid", "same"]).aggregate([("key", "max")])
    best = {(a, s): k for a, s, k in zip(
        g.column("aid").to_pylist(), g.column("same").to_pylist(),
        g.column("key_max").to_pylist())}
    rows = []
    for j in range(len(a_ids)):
        pk = best.get((int(a_ids[j]), 1))
        nk = best.get((int(a_ids[j]), 0))
        rows.append((
            int(a_ids[j]), int(a_lab[j]),
            (B33 - 1 - pk % B33) if pk is not None else -1,
            (B33 - 1 - nk % B33) if nk is not None else -1,
        ))
    return pa.table({
        "anchor_id": pa.array([r[0] for r in rows], pa.int64()),
        "anchor_label": pa.array([r[1] for r in rows], pa.int64()),
        "pos_id": pa.array([r[2] for r in rows], pa.int64()),
        "neg_id": pa.array([r[3] for r in rows], pa.int64()),
    })


def emb_label_centroids(sf_dir: str):
    """Per-label embedding centroid (the vector-mean aggregate behind
    IVF training / cluster profiling), exploded to (label, dim,
    centroid) rows so the SQL oracle can gate it exactly. Block-local
    float64 sum+count partials per label (one np.add.at per block — the
    payload never shuffles), tiny driver merge over labels x dims."""
    def partial(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        n = len(emb)
        if n == 0:
            return pa.table({"label": pa.array([], type=pa.int64()),
                             "dim": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.float64()),
                             "cnt": pa.array([], type=pa.int64())})
        offs = emb.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        d = int(widths[0])
        if not (widths == d).all():
            raise ValueError("ragged embedding dims in block")
        m = emb.values.to_numpy(zero_copy_only=False).reshape(n, d).astype(np.float64)
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.float64)
        np.add.at(sums, codes, m)
        cnts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq.astype(np.int64), d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq))),
            "s": pa.array(sums.reshape(-1)),
            "cnt": pa.array(np.repeat(cnts, d)),
        })

    parts = pa.concat_tables(
        _read(sf_dir, "embeddings", columns=["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    g = parts.group_by(["label", "dim"]).aggregate([("s", "sum"), ("cnt", "sum")])
    centroid = pc.round(pc.divide(g.column("s_sum"),
                                  g.column("cnt_sum").cast(pa.float64())), 4)
    return pa.table({
        "label": g.column("label"),
        "dim": g.column("dim"),
        "centroid": centroid,
    })


def events_props_extract(sf_dir: str):
    """Semi-structured extraction: pull the integer ``k`` field out of
    the JSON ``props`` column with one vectorized RE2 kernel
    (extract_regex), then a bounded-cardinality grouped sum per
    event_type (block partials + tiny driver merge). The SQL oracle
    goes through DuckDB's real JSON parser — agreement shows the regex
    fast path extracts exactly what a JSON parser would."""
    def partial(batch: pa.Table) -> pa.Table:
        props = batch.column("props")
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        ex = pc.extract_regex(props, r'"k": (?P<k>[0-9]+)')
        k = pc.struct_field(ex, "k").cast(pa.int64())
        return pa.table({
            "event_type": batch.column("event_type"),
            "k": k,
        }).group_by("event_type").aggregate([("k", "sum"), ("k", "count")])

    parts = pa.concat_tables(
        _read(sf_dir, "events", columns=["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    g = parts.group_by("event_type").aggregate(
        [("k_sum", "sum"), ("k_count", "sum")])
    return pa.table({
        "event_type": g.column("event_type"),
        "n_events": g.column("k_count_sum").cast(pa.int64()),
        "sum_k": g.column("k_sum_sum").cast(pa.int64()),
    })


def events_asof_join(sf_dir: str, left_type: str = "purchase",
                     right_type: str = "view"):
    """As-of join — a stream-enrichment operator Ray Data lacks
    natively: each ``left_type`` event joins the same user's most
    recent ``right_type`` event at-or-before its timestamp. Expressed
    Ray-Data-first as a partition-grouped transform: row-filter to the
    two types in the first map pass, hash-partition by user (part =
    user % P) so each partition holds complete user histories, then
    one vectorized merge per partition (sort + forward-filled
    last-right-index, no per-row Python). Tie rule matches SQL
    ``v.ts <= p.ts``: right rows sort BEFORE left rows at equal
    (user, ts), and among equal-(user, ts) right rows the max event_id
    wins (the forward fill keeps the last; the oracle CTE dedupes the
    same way). Output: one row per left event with the matched right
    event_id (-1 = none) and the gap in microseconds.
    Partitioning assumption: one hash partition of users fits a worker
    (same contract as events_sessionize)."""
    P = _n_parts()

    def keep_and_part(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        mask = pc.is_in(et, value_set=pa.array([left_type, right_type]))
        t = t.filter(mask)
        return t.append_column(
            "part", pa.array(t.column("user_id").to_numpy(zero_copy_only=False) % P))

    def asof_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(_is_left=(g["event_type"] == left_type).astype(np.int8))
        g = g.sort_values(["user_id", "ts", "_is_left", "event_id"],
                          kind="stable")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy()
        is_left = g["_is_left"].to_numpy().astype(bool)
        idx = np.arange(len(g))
        fill = np.maximum.accumulate(np.where(~is_left, idx, -1))
        lpos = idx[is_left]
        lf = fill[lpos]
        # a filled index from a previous user points at a smaller uid —
        # sorted by user, so uid equality is the validity test
        valid = (lf >= 0) & (uid[np.maximum(lf, 0)] == uid[lpos])
        matched = np.where(valid, eid[np.maximum(lf, 0)], -1)
        gap = np.where(
            valid,
            (ts[lpos] - ts[np.maximum(lf, 0)]) // np.timedelta64(1, "us"),
            -1,
        )
        return pd.DataFrame({
            "event_id": eid[lpos],
            "user_id": uid[lpos],
            "ts": ts[lpos],
            "matched_event_id": matched.astype(np.int64),
            "gap_us": gap.astype(np.int64),
        })

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    return (
        ds.map_batches(keep_and_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(asof_part, batch_format="pandas")
    )


def events_window_join(sf_dir: str, left_type: str = "purchase",
                       right_type: str = "view", window_minutes: int = 60):
    """Range join — the second stream-enrichment operator Ray Data
    lacks natively (the brief names as-of join, range join, windowed
    aggregate): each ``left_type`` event is joined to ALL of the same
    user's ``right_type`` events in the half-open window
    ``[l.ts - window, l.ts)`` and aggregated (count + value sum).
    Ray-Data-first shape: filter to the two types in a map pass,
    hash-partition by user, then ONE vectorized sweep per partition —
    right rows and the two window endpoints of every left row are
    lexsorted together (user, ts, rank) and per-user exclusive prefix
    counts/sums turn each window into two prefix lookups; no per-row
    Python and no pairwise blow-up even when a window holds thousands
    of right rows. Endpoint tie rank (lo=0, view=1, hi=2) encodes the
    half-open interval exactly.
    Partitioning assumption: one hash partition of users fits a worker
    (same contract as events_sessionize)."""
    P = _n_parts()
    win_us = np.int64(window_minutes) * 60 * 1_000_000

    def keep_and_part(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        mask = pc.is_in(et, value_set=pa.array([left_type, right_type]))
        t = t.filter(mask)
        return t.append_column(
            "part", pa.array(t.column("user_id").to_numpy(zero_copy_only=False) % P))

    def window_part(g: pd.DataFrame) -> pd.DataFrame:
        is_left = (g["event_type"] == left_type).to_numpy()
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        val = g["value"].to_numpy()
        lu, lt, le = uid[is_left], ts[is_left], eid[is_left]
        ru, rt, rv = uid[~is_left], ts[~is_left], val[~is_left]
        nl, nr = len(lu), len(ru)
        # combined point set: right rows (rank 2) + per-left lo (rank 0)
        # and hi (rank 1) endpoints, lexsorted by (user, ts, rank).
        # Both endpoints sort BEFORE right rows at equal ts, so the
        # exclusive prefixes realize the half-open [lo, hi) exactly:
        # a right row at ts == lo is counted, at ts == hi it is not.
        cu = np.concatenate([lu, ru, lu])
        ct = np.concatenate([lt - win_us, rt, lt])
        rank = np.concatenate([
            np.zeros(nl, np.int8), np.full(nr, 2, np.int8),
            np.ones(nl, np.int8)])
        order = np.lexsort((rank, ct, cu))
        su, sr = cu[order], rank[order]
        is_right = sr == 2
        sv = np.zeros(len(order))
        sv[is_right] = np.concatenate([np.zeros(nl), rv, np.zeros(nl)])[order][is_right]
        # exclusive prefix count/sum of right rows; per-user segment
        # starts make prefixes user-local
        cumn = np.concatenate([[0], np.cumsum(is_right)])[:-1]
        cums = np.concatenate([[0.0], np.cumsum(sv)])[:-1]
        pos_in_sorted = np.empty(len(order), np.int64)
        pos_in_sorted[order] = np.arange(len(order))
        lo_pos = pos_in_sorted[:nl]
        hi_pos = pos_in_sorted[nl + nr:]
        n_in = cumn[hi_pos] - cumn[lo_pos]
        s_in = cums[hi_pos] - cums[lo_pos]
        # endpoints straddling a user boundary can't happen: both
        # endpoints carry the left row's own user and sort inside its
        # segment (any position between them shares that user)
        assert np.array_equal(su[lo_pos], lu) and np.array_equal(su[hi_pos], lu)
        return pd.DataFrame({
            "event_id": le,
            "user_id": lu,
            "ts": g["ts"].to_numpy()[is_left],
            "n_right": n_in.astype(np.int64),
            "sum_right_value": np.where(n_in > 0, s_in, 0.0).round(2),
        })

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type", "value"])
    return (
        ds.map_batches(keep_and_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(window_part, batch_format="pandas")
    )


def events_hourly(sf_dir: str):
    """Tumbling 1-hour window aggregate over the events stream table."""

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        g = pa.table({
            "event_type": t["event_type"],
            "hour": hour,
            "value": t["value"],
        }).group_by(["event_type", "hour"]).aggregate([("value", "sum"), ("value", "count")])
        return g.rename_columns(["event_type", "hour", "sum_value", "n_events"])

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    parts = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    g = parts.group_by(["event_type", "hour"]).aggregate(
        [("sum_value", "sum"), ("n_events", "sum")]
    )
    g = g.rename_columns(["event_type", "hour", "sum_value", "n_events"])
    return pa.table({
        "event_type": g.column("event_type"),
        "hour": g.column("hour"),
        "n_events": g.column("n_events").cast(pa.int64()),
        "sum_value": pc.round(g.column("sum_value"), 2),
    })

def events_daily_active(sf_dir: str):
    """Exact daily-active-users (DAU) — the canonical distinct-count
    over an event stream, distributed the same way as the log side's
    ``log_distinct_clients``: each block dedupes its own (day, user)
    pairs (volume drops from events to block-distinct pairs before
    anything leaves the worker), ONE Fibonacci-hash exchange on
    user_id co-locates every copy of a user (``num_returns=P``), each
    partition dedupes and counts per day, and the driver folds
    P x |days| tiny partials. Distinct users are unbounded at scale —
    nothing user-sized ever lands on the driver."""
    P = max(2, _n_parts())

    def pair_shard(block: pa.Table) -> list:
        day = pc.floor_temporal(block.column("ts"), unit="day")
        pairs = pa.table({
            "day": day, "user_id": block.column("user_id"),
        }).group_by(["day", "user_id"]).aggregate([])
        u = pairs.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if not len(u):
            return [pairs for _ in range(P)]
        part = _lp_partition(u, P)
        order = np.argsort(part, kind="stable")
        sorted_tbl = pairs.take(pa.array(order))
        bounds = np.searchsorted(part[order], np.arange(P + 1))
        return [sorted_tbl.slice(s, e - s)
                for s, e in zip(bounds[:-1], bounds[1:])]

    PARTIAL = pa.schema([("day", pa.timestamp("us")), ("n", pa.int64())])

    def dau_combine(*tables) -> pa.Table:
        t = pa.concat_tables([x for x in tables if x.num_rows])
        if t.num_rows == 0:
            return PARTIAL.empty_table()
        dd = t.group_by(["day", "user_id"]).aggregate([])
        g = dd.group_by("day").aggregate([([], "count_all")])
        return g.rename_columns(["day", "n"]).cast(PARTIAL)

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])
    OUT = pa.schema([("day", pa.timestamp("us")), ("n_users", pa.int64())])
    refs = [block_ref for bundle in ds.iter_internal_ref_bundles()
            for block_ref, _md in bundle.blocks if _md.num_rows]
    if not refs:
        return OUT.empty_table()
    shard = ray.remote(pair_shard)
    sl = [shard.options(num_returns=P).remote(r) for r in refs]
    combine = ray.remote(dau_combine)
    outs = ray.get([combine.remote(*[s[p] for s in sl])
                    for p in range(P)])
    merged = pa.concat_tables([PARTIAL.empty_table()] + outs)
    g = merged.group_by("day").aggregate([("n", "sum")])
    order = pc.sort_indices(g.column("day"))
    return pa.table({
        "day": g.column("day").take(order),
        "n_users": g.column("n_sum").take(order).cast(pa.int64()),
    })


def events_funnel(sf_dir: str,
                  stages: tuple = ("view", "click", "purchase")):
    """Ordered funnel attainment per user: the first ``stages[0]`` event,
    the first ``stages[1]`` at-or-after it, the first ``stages[2]``
    at-or-after that (ts comparisons; the >= endpoint rule is pinned by
    the SQL mirror's join predicate). Output: one row per distinct user
    with max_stage 0..3 and the three stage timestamps as epoch-us
    (-1 = not reached).

    Engine shape: hash-partition by user (partition-grouped,
    ``_n_parts``) so every user's history is co-located, then one fully
    vectorized pass per partition — per-user first-event times via
    lexsort + segment-first, the at-or-after gate via a searchsorted
    lookup of the previous stage's time. No per-user Python, no
    whole-stream sort; the only shuffle is the user-hash partition.
    Funnel analysis over event streams is the reference's metric-window
    family generalized to ordered multi-step conversion
    (metrics/SBOMetrics.go:64-90 holds per-key time windows; this holds
    per-user stage fronts)."""
    P = _n_parts()
    SENT = np.iinfo(np.int64).max

    def funnel_part(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        users = np.unique(u)

        def first_at_or_after(mask, gate):
            uu, tt = u[mask], t[mask]
            if gate is not None:
                idx = np.searchsorted(users, uu)
                ok = tt >= gate[idx]  # gate==SENT (unreached) keeps none
                uu, tt = uu[ok], tt[ok]
            out = np.full(len(users), SENT, dtype=np.int64)
            if len(uu):
                order = np.lexsort((tt, uu))
                uu, tt = uu[order], tt[order]
                first = np.ones(len(uu), dtype=bool)
                first[1:] = uu[1:] != uu[:-1]
                out[np.searchsorted(users, uu[first])] = tt[first]
            return out

        t1 = first_at_or_after(et == stages[0], None)
        t2 = first_at_or_after(et == stages[1], t1)
        t3 = first_at_or_after(et == stages[2], t2)
        reached = ((t1 < SENT).astype(np.int64) + (t2 < SENT)
                   + (t3 < SENT))
        return pd.DataFrame({
            "user_id": users,
            "max_stage": reached.astype(np.int64),
            "t_stage1_us": np.where(t1 < SENT, t1, -1),
            "t_stage2_us": np.where(t2 < SENT, t2, -1),
            "t_stage3_us": np.where(t3 < SENT, t3, -1),
        })

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    out_ds = (
        ds.map_batches(
            lambda t: t.append_column(
                "part", pa.array(
                    t.column("user_id").to_numpy(zero_copy_only=False) % P)),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(funnel_part, batch_format="pandas")
    )
    batches = list(out_ds.iter_batches(batch_format="pyarrow",
                                       batch_size=None))
    schema = pa.schema([
        ("user_id", pa.int64()), ("max_stage", pa.int64()),
        ("t_stage1_us", pa.int64()), ("t_stage2_us", pa.int64()),
        ("t_stage3_us", pa.int64()),
    ])
    if not batches:
        return schema.empty_table()
    return pa.concat_tables(
        [b.select(schema.names).cast(schema) for b in batches])


_BM25 = pa.schema([("doc_id", pa.int64()), ("score", pa.float64())])
_BM25_STAT = pa.schema([("term", pa.string()), ("df", pa.int64()),
                        ("dl_sum", pa.int64()), ("n_docs", pa.int64())])


def doc_bm25_topk(sf_dir: str, k: int = 100, n_terms: int = 3,
                  k1: float = 1.2, b: float = 0.75):
    """Okapi BM25 retrieval over the corpus (Robertson et al.; the
    lexical-relevance scorer retrieval-augmented pipelines pair with
    the embedding ANN ops): score every document against the corpus'
    top-``n_terms`` tokens (a deterministic query both sides can
    rebuild) and emit the global top-k docs. Three streaming passes,
    all bounded:

      vocab  doc_vocab_topk(n_terms) -> the query terms (broadcast);
      stats  per-block partials of df per term (distinct docs
             containing it), total token count and doc count — one
             (n_terms + 2)-int row per block;
      score  broadcast (terms, idf, avgdl) once; each block computes
             per-doc tf for the query terms via dictionary codes +
             bincount (no per-row Python), scores docs with >= 1 hit,
             and keeps its local top-k under the FINAL
             (round6(score) desc, doc_id asc) key — merge-closed.

    idf = ln((N - df + 0.5)/(df + 0.5) + 1) (the +1 keeps common terms
    positive). Exact SQL mirror: same tokenization, same f64 formula;
    ROUND-6 + id tie-break absorbs libm's last-ulp ln differences."""
    terms = doc_vocab_topk(sf_dir, k=n_terms).column("token").to_pylist()
    if not terms:
        return _BM25.empty_table()
    terms_sorted = np.array(sorted(terms), dtype=object)
    tref = ray.put(terms_sorted)

    def stat_partial(t: pa.Table) -> pa.Table:
        col = t.column("text")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ts = ray.get(tref)
        if len(col) == 0:
            return _BM25_STAT.empty_table()
        toks = pc.split_pattern(col.cast(pa.string()), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(col), dtype=np.int64), lens)
        enc = toks.values.dictionary_encode()
        uniq = np.array(enc.dictionary.to_pylist(), dtype=object)
        pos = np.searchsorted(ts, uniq)
        slot = np.where((pos < len(ts)) & (ts[np.minimum(pos, len(ts) - 1)]
                                           == uniq), pos, len(ts))
        tok_slot = slot[enc.indices.to_numpy(zero_copy_only=False)]
        hit = tok_slot < len(ts)
        # distinct (doc, term) pairs -> df per term
        pairs = np.unique(doc_idx[hit] * len(ts) + tok_slot[hit])
        df = np.bincount(pairs % len(ts), minlength=len(ts))
        return pa.table({
            "term": pa.array(list(ts), pa.string()),
            "df": pa.array(df.astype(np.int64)),
            "dl_sum": pa.array([int(lens.sum())] * len(ts), pa.int64()),
            "n_docs": pa.array([len(col)] * len(ts), pa.int64()),
        }, schema=_BM25_STAT)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    df_tot = np.zeros(len(terms_sorted), dtype=np.int64)
    dl_sum = 0
    n_docs = 0
    for bt in ds.map_batches(stat_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if bt.num_rows == 0:
            continue
        tarr = np.array(bt.column("term").to_pylist(), dtype=object)
        order = np.argsort(tarr)
        df_tot += bt.column("df").to_numpy(zero_copy_only=False)[order]
        dl_sum += int(bt.column("dl_sum")[0].as_py())
        n_docs += int(bt.column("n_docs")[0].as_py())
    if n_docs == 0:
        return _BM25.empty_table()
    avgdl = dl_sum / n_docs
    idf = np.log((n_docs - df_tot + 0.5) / (df_tot + 0.5) + 1.0)
    sref = ray.put((terms_sorted, idf, avgdl))

    def score_topk(t: pa.Table) -> pa.Table:
        col = t.column("text")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if len(col) == 0:
            return _BM25.empty_table()
        ts, idf_b, avg_b = ray.get(sref)
        nt = len(ts)
        toks = pc.split_pattern(col.cast(pa.string()), " ")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.float64)
        doc_idx = np.repeat(np.arange(len(col), dtype=np.int64),
                            lens.astype(np.int64))
        enc = toks.values.dictionary_encode()
        uniq = np.array(enc.dictionary.to_pylist(), dtype=object)
        pos = np.searchsorted(ts, uniq)
        slot = np.where((pos < nt) & (ts[np.minimum(pos, nt - 1)] == uniq),
                        pos, nt)
        tok_slot = slot[enc.indices.to_numpy(zero_copy_only=False)]
        hit = tok_slot < nt
        tf = np.bincount(doc_idx[hit] * nt + tok_slot[hit],
                         minlength=len(col) * nt).reshape(len(col), nt) \
            .astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * lens[:, None] / avg_b)
        score = (idf_b * tf * (k1 + 1.0) / denom * (tf > 0)).sum(axis=1)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        has = tf.sum(axis=1) > 0
        ids, score = ids[has], score[has]
        take = min(k, len(ids))
        order = np.lexsort((ids, -np.round(score, 6)))[:take]
        return pa.table({"doc_id": pa.array(ids[order].astype(np.int64)),
                         "score": pa.array(np.round(score[order], 6))},
                        schema=_BM25)

    parts = [x for x in ds.map_batches(score_topk, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)
             if x.num_rows]
    if not parts:
        return _BM25.empty_table()
    merged = pa.concat_tables(parts)
    ids = merged.column("doc_id").to_numpy(zero_copy_only=False)
    sc = merged.column("score").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sc))[:k]
    return pa.table({"doc_id": pa.array(ids[order]),
                     "score": pa.array(sc[order])}, schema=_BM25)


def doc_tfidf(sf_dir: str, k: int = 3):
    """Top-k TF-IDF terms per document (space-split tokens,
    idf = ln(N/df), score = tf*idf) — the classic relevance/keyword
    extraction primitive for a training-data corpus.

    Engine shape: two streaming passes. Pass 1 computes block-local
    (token, df) partials (per-doc DISTINCT inside the block, so volume
    drops to block-unique tokens before anything leaves the worker) and
    the driver merges the vocabulary-bounded histogram (Heaps' law —
    same contract as doc_vocab_topk). The df map is broadcast ONCE with
    ray.put. Pass 2 is embarrassingly parallel: each doc lives wholly
    in one row/block, so per-doc tf, score and exact top-k are computed
    block-locally (vectorized unique/lexsort/segment-rank; no shuffle at
    all). Ranking uses ROUND(score, 6) then token ASC on BOTH engine
    and oracle sides: mathematically-tied scores (e.g. 2*ln(10) vs
    ln(100)) land on the same rounded value regardless of last-ulp libm
    differences, so the tie-break is deterministic across engines."""

    def df_partial(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, " ")
        doc_idx = np.repeat(
            np.arange(len(batch), dtype=np.int64),
            pc.list_value_length(toks).to_numpy(zero_copy_only=False))
        # per-doc DISTINCT via int composite keys over batch-local
        # dictionary codes — string group_by here was ~6x the cost
        enc = toks.values.dictionary_encode()
        nv = len(enc.dictionary)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(doc_idx * max(nv, 1) + codes)
        df_n = np.bincount(uniq % max(nv, 1), minlength=nv)
        g = pa.table({"token": enc.dictionary,
                      "df_n": pa.array(df_n[:nv], pa.int64())})
        return g.append_column(
            "n_docs", pa.array([len(batch)] + [0] * (g.num_rows - 1)
                               if g.num_rows else [], pa.int64()))

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    parts = list(docs.map_batches(
        df_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None))
    empty = pa.schema([
        ("doc_id", pa.int64()), ("token", pa.string()),
        ("score", pa.float64()), ("rnk", pa.int64()),
    ]).empty_table()
    if not parts:
        return empty
    merged = pa.concat_tables(parts)
    n_docs = int(pc.sum(merged.column("n_docs")).as_py() or 0)
    if n_docs == 0:
        return empty
    dfa = merged.group_by("token").aggregate([("df_n", "sum")])
    # broadcast the vocabulary SORTED: index_in positions then double as
    # the alphabetical tie-break codes (token ASC), globally consistent
    order = pc.sort_indices(dfa.column("token"))
    vocab = dfa.column("token").take(order).combine_chunks()
    df_arr = dfa.column("df_n_sum").take(order).to_numpy(
        zero_copy_only=False).astype(np.float64)
    df_ref = ray.put((vocab, df_arr))

    def topk_scores(batch: pa.Table) -> pa.Table:
        vocab_a, df_v = ray.get(df_ref)
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, " ")
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(
            np.arange(len(batch), dtype=np.int64),
            pc.list_value_length(toks).to_numpy(zero_copy_only=False))
        # tf per (doc, token) via int composite keys over global vocab
        # positions — no Python strings anywhere in the hot path (the
        # string-group_by + to_pylist + dict-lookup version was ~10x)
        nv = len(vocab_a)
        tcode = pc.index_in(toks.values, value_set=vocab_a).to_numpy(
            zero_copy_only=False).astype(np.int64)
        uk, c = np.unique(doc_idx * nv + tcode, return_counts=True)
        d, tc = uk // nv, uk % nv
        score = np.round(c * np.log(n_docs / df_v[tc]), 6)
        order = np.lexsort((tc, -score, d))
        sd = d[order]
        new_grp = np.ones(len(sd), dtype=bool)
        new_grp[1:] = sd[1:] != sd[:-1]
        starts = np.maximum.accumulate(
            np.where(new_grp, np.arange(len(sd)), 0))
        rank = np.arange(len(sd)) - starts
        keep = order[rank < k]
        return pa.table({
            "doc_id": pa.array(doc_ids[d[keep]], pa.int64()),
            "token": vocab_a.take(pa.array(tc[keep])),
            "score": pa.array(score[keep], pa.float64()),
            "rnk": pa.array(rank[rank < k] + 1, pa.int64()),
        })

    out = list(docs.map_batches(
        topk_scores, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(out) if out else empty


def emb_knn_join(sf_dir: str, k: int = 5, n_chunks: int | None = None):
    """Exact k-NN SELF-join: for EVERY vector, its k nearest neighbors
    by cosine (the retrieval-evaluation / hard-negative-mining
    primitive — emb_similarity_topk generalized from one query to all
    rows). Same replicated chunk-pair triangle layout as
    ``emb_dedup_cosine``: B chunks, one cross-matmul per chunk-pair
    group, but each group emits a PARTIAL top-k per vector instead of
    threshold pairs, so shuffle volume drops from O(n^2) pair rows to
    n x B x k partial rows. The final per-vector merge is
    partition-grouped (hash of vec_id), so no stage ever holds more
    than a partition of partials; the driver sees the n x k output
    only.

    Ranking is (ROUND(cos, 3) DESC, neighbor_id ASC) at BOTH the
    partial and final stage — the partial ordering must equal the
    final ordering or boundary ties could drop a would-be winner. The
    SQL oracle casts embeddings to DOUBLE[] before
    list_cosine_similarity: at 2500 output values, float32
    accumulation error (~1e-6) flips 3rd-decimal roundings with
    near-certainty, while float64-vs-float64 disagreement
    probability is ~1e-13."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    if n_chunks:
        B = n_chunks
    else:
        # size chunks to ~1k vectors: the emb_dedup_cosine default
        # (B ~ sqrt(2*cpus), i.e. n/8 per chunk) makes each group
        # allocate O((n/B)^2) cos/key matrices — measured 235 s at 50k
        # vectors from 36 concurrent ~1 GB-temporary groups thrashing
        # memory vs ~10 s with ~1k-row chunks. Capped at 128: past
        # that, B^2/2 group count + n*B replication rows dominate
        # (exact all-pairs is O(n^2); cap the candidates, see bench).
        # Row count from the Parquet footer — ds.count() would execute
        # the whole read an extra time just to size B (VERDICT r3 #7).
        n = _parquet_num_rows(sf_dir, "embeddings")
        B = int(min(128, max(4, np.sqrt(2 * _cpus()), -(-n // 1000))))
    P = _n_parts()

    def _rank_topk(flat_cos, rows, cols, row_ids):
        """top-k rows per `rows` group under (cos desc, col asc)."""
        order = np.lexsort((cols, -flat_cos, rows))
        rr = rows[order]
        new_grp = np.ones(len(rr), dtype=bool)
        new_grp[1:] = rr[1:] != rr[:-1]
        starts = np.maximum.accumulate(
            np.where(new_grp, np.arange(len(rr)), 0))
        rank = np.arange(len(rr)) - starts
        keep = order[rank < k]
        return (row_ids[rows[keep]], cols[keep], flat_cos[keep],
                rank[rank < k])

    def _side_topk(cm, rid, cid):
        """Per-ROW top-k of the cos matrix under (cos desc, col-id asc)
        in O(na*nb) via argpartition on ONE composite int64 key
        (1000*cos then -id; cos is already rounded to 3 so the int
        encoding is lossless) — the flattened-lexsort formulation costs
        O(na*nb*log) plus 3x the allocations and measured ~25x slower
        at 6k x 6k chunk pairs. Ordering is identical, so partial
        top-k selection stays consistent with the final merge."""
        na, nb = cm.shape
        key = (np.rint(cm * 1000.0).astype(np.int64) * (1 << 33)
               - cid[None, :])
        kk = min(k, nb)
        if kk < nb:
            part = np.argpartition(-key, kk - 1, axis=1)[:, :kk]
        else:
            part = np.broadcast_to(np.arange(nb), (na, nb)).copy()
        pk = np.take_along_axis(key, part, axis=1)
        order = np.argsort(-pk, axis=1, kind="stable")
        sel = np.take_along_axis(part, order, axis=1)
        cosv = np.take_along_axis(cm, sel, axis=1).ravel()
        ok = cosv >= -1.5  # drop the -2.0 self sentinel
        return (np.repeat(rid, kk)[ok], cid[sel.ravel()][ok], cosv[ok])

    def pair_block(g: pa.Table) -> pa.Table:
        pair_id = g.column("pair_id")[0].as_py()
        c_a, c_b = pair_id // B, pair_id % B
        chunk = g.column("chunk").to_numpy(zero_copy_only=False)
        ids = g.column("vec_id").to_numpy(zero_copy_only=False)
        if len(ids) and ids.max() >= (1 << 33):
            # _side_topk packs (round3(cos) * 2^33 - neighbor_id) into
            # one int64: an id >= 2^33 bleeds into the cos term and the
            # partial ordering silently diverges from the final merge —
            # fail loudly instead (ADVICE r3); widen the encoding if a
            # corpus ever legitimately exceeds ~8.6e9 vec_ids
            raise ValueError(
                f"vec_id {int(ids.max())} >= 2^33 breaks the composite "
                f"top-k ordering key")
        m = D.normalize_rows(S.embedding_matrix(g))
        a_mask = chunk == c_a
        outs = []
        if c_a == c_b:
            ma, ia = m[a_mask], ids[a_mask]
            cos = np.round(ma @ ma.T, 3)
            np.fill_diagonal(cos, -2.0)  # finite self sentinel
            sides = [(cos, ia, ia)]
        else:
            ma, ia = m[a_mask], ids[a_mask]
            mb, ib = m[~a_mask], ids[~a_mask]
            cos = np.round(ma @ mb.T, 3)
            sides = [(cos, ia, ib), (np.ascontiguousarray(cos.T), ib, ia)]
        for cm, rid, cid in sides:
            if cm.size == 0:
                continue
            vid, nid, cc = _side_topk(cm, rid, cid)
            outs.append(pa.table({
                "vec_id": pa.array(vid, pa.int64()),
                "neighbor_id": pa.array(nid, pa.int64()),
                "cos": pa.array(cc, pa.float64()),
            }))
        if not outs:
            return pa.schema([("vec_id", pa.int64()),
                              ("neighbor_id", pa.int64()),
                              ("cos", pa.float64())]).empty_table()
        return pa.concat_tables(outs)

    def final_part(g: pd.DataFrame) -> pd.DataFrame:
        vid = g["vec_id"].to_numpy()
        nid = g["neighbor_id"].to_numpy()
        cc = g["cos"].to_numpy()
        # group rows by vec_id via unique codes (code -> vec_id map)
        uniq, vcode = np.unique(vid, return_inverse=True)
        v, n, c, r = _rank_topk(cc, vcode, nid, uniq)
        return pd.DataFrame({
            "vec_id": v,
            "neighbor_id": n,
            "cos": c,
            "rnk": (r + 1).astype(np.int64),
        })

    partials = (
        ds.map_batches(_chunk_pair_replicate("vec_id", B),
                       batch_format="pyarrow")
        .groupby("pair_id")
        .map_groups(pair_block, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column(
                "part", pa.array(
                    t.column("vec_id").to_numpy(zero_copy_only=False) % P)),
            batch_format="pyarrow")
        .groupby("part")
        .map_groups(final_part, batch_format="pandas")
    )
    out = list(partials.iter_batches(batch_format="pyarrow",
                                     batch_size=None))
    schema = pa.schema([
        ("vec_id", pa.int64()), ("neighbor_id", pa.int64()),
        ("cos", pa.float64()), ("rnk", pa.int64()),
    ])
    if not out:
        return schema.empty_table()
    return pa.concat_tables([b.select(schema.names).cast(schema)
                             for b in out])


def supplier_nation_revenue(sf_dir: str):
    """Three-table star-schema aggregate (lineitem x supplier x nation
    -> revenue per nation) in ONE fact-table scan: both dimension
    tables are tiny (the classic star shape), so they are pre-joined
    DRIVER-side into a single suppkey -> nation-name map and broadcast
    once with ray.put; each lineitem block resolves the composed map
    and emits a per-nation partial (count + discounted revenue), and
    the driver merges |nations| rows. No shuffle at all — the 100-TB
    shape for dimension-join aggregation (two chained Dataset.joins
    would pay two all-to-all exchanges for the same answer)."""
    supplier = pa.concat_tables(
        _read(sf_dir, "supplier",
              columns=["s_suppkey", "s_nationkey"]).iter_batches(
            batch_format="pyarrow", batch_size=None))
    nation = pa.concat_tables(
        _read(sf_dir, "nation",
              columns=["n_nationkey", "n_name"]).iter_batches(
            batch_format="pyarrow", batch_size=None))
    n_name = dict(zip(nation.column("n_nationkey").to_pylist(),
                      nation.column("n_name").to_pylist()))
    lookup = {
        int(sk): n_name.get(int(nk), "")
        for sk, nk in zip(supplier.column("s_suppkey").to_pylist(),
                          supplier.column("s_nationkey").to_pylist())
    }
    lookup_ref = ray.put(lookup)

    def partial(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        keys = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        names = pa.array([lk.get(int(k), "") for k in keys],
                         type=pa.string())
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        g = pa.table({
            "n_name": names, "revenue": rev,
        }).group_by("n_name").aggregate([("revenue", "sum"),
                                         ("revenue", "count")])
        return g.rename_columns(["n_name", "revenue", "n_items"])

    ds = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount"])
    parts = list(ds.map_batches(partial, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow", batch_size=None))
    if not parts:
        return pa.schema([("n_name", pa.string()),
                          ("n_items", pa.int64()),
                          ("revenue", pa.float64())]).empty_table()
    g = pa.concat_tables(parts).group_by("n_name").aggregate(
        [("revenue", "sum"), ("n_items", "sum")])
    g = g.rename_columns(["n_name", "revenue", "n_items"])
    return pa.table({
        "n_name": g.column("n_name"),
        "n_items": g.column("n_items").cast(pa.int64()),
        "revenue": pc.round(g.column("revenue"), 2),
    })


def events_retention(sf_dir: str):
    """Cohort retention matrix over the events stream: cohort = a
    user's first active DAY; one output row per (cohort_day,
    offset_days) with the number of cohort users active that day — the
    standard DAU-retention triangle. Partition-grouped by user (every
    user's history co-located), fully vectorized per partition: one
    lexsort gives distinct (user, day) pairs AND each user's first day
    by segment-first forward-fill; per-partition (cohort, offset)
    partial counts add across partitions because users never span
    partitions. Driver merges the tiny |days|^2/2-bounded matrix."""
    P = _n_parts()

    def retention_part(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        day = g["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        order = np.lexsort((day, u))
        u, day = u[order], day[order]
        new_pair = np.ones(len(u), dtype=bool)
        new_pair[1:] = (u[1:] != u[:-1]) | (day[1:] != day[:-1])
        du, dday = u[new_pair], day[new_pair]
        seg_first = np.ones(len(du), dtype=bool)
        seg_first[1:] = du[1:] != du[:-1]
        cohort = dday[np.maximum.accumulate(
            np.where(seg_first, np.arange(len(du)), 0))]
        out = pd.DataFrame({
            "cohort_day_i": cohort,
            "offset_days": dday - cohort,
        })
        return (out.groupby(["cohort_day_i", "offset_days"],
                            as_index=False)
                .size().rename(columns={"size": "n_users"}))

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    parts_ds = (
        ds.map_batches(
            lambda t: t.append_column(
                "part", pa.array(
                    t.column("user_id").to_numpy(zero_copy_only=False) % P)),
            batch_format="pyarrow")
        .groupby("part")
        .map_groups(retention_part, batch_format="pandas")
    )
    parts = list(parts_ds.iter_batches(batch_format="pyarrow",
                                       batch_size=None))
    schema = pa.schema([
        ("cohort_day", pa.timestamp("us")), ("offset_days", pa.int64()),
        ("n_users", pa.int64()),
    ])
    if not parts:
        return schema.empty_table()
    g = pa.concat_tables(parts).group_by(
        ["cohort_day_i", "offset_days"]).aggregate([("n_users", "sum")])
    cohort_us = g.column("cohort_day_i").to_numpy(
        zero_copy_only=False).astype("datetime64[D]").astype(
        "datetime64[us]")
    return pa.table({
        "cohort_day": pa.array(cohort_us, type=pa.timestamp("us")),
        "offset_days": g.column("offset_days").cast(pa.int64()),
        "n_users": g.column("n_users_sum").cast(pa.int64()),
    })


def part_brand_revenue(sf_dir: str):
    """Fact x mid-size dimension (lineitem x part) via the native
    hash-partitioned ``Dataset.join``, then brand rollup. At TPC-H
    proportions ``part`` is ~1/30 of lineitem — too big to broadcast
    comfortably at the 100-TB tier, so this is deliberately the
    SHUFFLE-join primitive (contrast supplier_nation_revenue, where
    both dims are tiny and a composed broadcast map wins). The
    post-join aggregate is a block-local partial per brand, so only
    |brands| rows per block follow the join."""
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    joined = li.join(part, join_type="inner",
                     num_partitions=max(4, _cpus()),
                     on=("l_partkey",), right_on=("p_partkey",))

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        g = pa.table({
            "p_brand": t.column("p_brand"),
            "sum_qty": t.column("l_quantity"),
            "revenue": rev,
        }).group_by("p_brand").aggregate(
            [("sum_qty", "sum"), ("revenue", "sum"), ("revenue", "count")])
        return g.rename_columns(["p_brand", "sum_qty", "revenue",
                                 "n_items"])

    parts = list(joined.map_batches(partial, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow", batch_size=None))
    if not parts:
        return pa.schema([("p_brand", pa.string()),
                          ("n_items", pa.int64()),
                          ("sum_qty", pa.float64()),
                          ("revenue", pa.float64())]).empty_table()
    g = pa.concat_tables(parts).group_by("p_brand").aggregate(
        [("sum_qty", "sum"), ("revenue", "sum"), ("n_items", "sum")])
    g = g.rename_columns(["p_brand", "sum_qty", "revenue", "n_items"])
    return pa.table({
        "p_brand": g.column("p_brand"),
        "n_items": g.column("n_items").cast(pa.int64()),
        "sum_qty": pc.round(g.column("sum_qty"), 2),
        "revenue": pc.round(g.column("revenue"), 2),
    })


def region_revenue_by_year(sf_dir: str):
    """Revenue per (region, order year): the shuffle join (orders x
    customer, both fact-sized) CHAINED with the composed broadcast dim
    map (nationkey -> region name through nation x region, both tiny) —
    one exchange total for a four-table query. The dim composition
    happens driver-side on 25+5 rows; the year is extracted
    vectorized; per-block partials keep post-join traffic at
    |regions x years| rows per block."""
    nation = pa.concat_tables(
        _read(sf_dir, "nation",
              columns=["n_nationkey", "n_regionkey"]).iter_batches(
            batch_format="pyarrow", batch_size=None))
    region = pa.concat_tables(
        _read(sf_dir, "region",
              columns=["r_regionkey", "r_name"]).iter_batches(
            batch_format="pyarrow", batch_size=None))
    r_name = dict(zip(region.column("r_regionkey").to_pylist(),
                      region.column("r_name").to_pylist()))
    lookup = {
        int(nk): r_name.get(int(rk), "")
        for nk, rk in zip(nation.column("n_nationkey").to_pylist(),
                          nation.column("n_regionkey").to_pylist())
    }
    lookup_ref = ray.put(lookup)

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_totalprice", "o_orderdate"])
    customer = _read(sf_dir, "customer",
                     columns=["c_custkey", "c_nationkey"])
    joined = orders.join(customer, join_type="inner",
                         num_partitions=max(4, _cpus()),
                         on=("o_custkey",), right_on=("c_custkey",))

    def partial(t: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        names = pa.array([lk.get(int(k), "") for k in nk],
                         type=pa.string())
        year = pc.year(t.column("o_orderdate")).cast(pa.int64())
        g = pa.table({
            "r_name": names, "year": year,
            "revenue": t.column("o_totalprice"),
        }).group_by(["r_name", "year"]).aggregate(
            [("revenue", "sum"), ("revenue", "count")])
        return g.rename_columns(["r_name", "year", "revenue", "n_orders"])

    parts = list(joined.map_batches(partial, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow", batch_size=None))
    if not parts:
        return pa.schema([("r_name", pa.string()), ("year", pa.int64()),
                          ("n_orders", pa.int64()),
                          ("revenue", pa.float64())]).empty_table()
    g = pa.concat_tables(parts).group_by(["r_name", "year"]).aggregate(
        [("revenue", "sum"), ("n_orders", "sum")])
    g = g.rename_columns(["r_name", "year", "revenue", "n_orders"])
    return pa.table({
        "r_name": g.column("r_name"),
        "year": g.column("year").cast(pa.int64()),
        "n_orders": g.column("n_orders").cast(pa.int64()),
        "revenue": pc.round(g.column("revenue"), 2),
    })


def _unigram_vocab_ref(docs):
    """Pass 1 of the unigram-LM scorers (doc_unigram_logprob,
    doc_ccnet_buckets): vocabulary-bounded driver merge of block token
    histograms (Heaps' law contract — same as doc_tfidf), vocabulary
    broadcast ONCE sorted with its count array so scoring passes work
    entirely in index_in positions. Returns (object ref to
    (sorted_vocab, counts_f64), total_tokens) or (None, 0) on empty."""
    parts = list(docs.map_batches(
        T.vocab_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None))
    if not parts:
        return None, 0
    agg = pa.concat_tables(parts).group_by("token").aggregate(
        [("n", "sum")])
    total = int(pc.sum(agg.column("n_sum")).as_py() or 0)
    if total == 0:
        return None, 0
    order = pc.sort_indices(agg.column("token"))
    vocab = agg.column("token").take(order).combine_chunks()
    cnt_arr = agg.column("n_sum").take(order).to_numpy(
        zero_copy_only=False).astype(np.float64)
    return ray.put((vocab, cnt_arr)), total


def doc_unigram_logprob(sf_dir: str):
    """Corpus-unigram-LM quality score per document: the mean negative
    log-probability of the doc's tokens under the corpus unigram
    distribution — the classic perplexity-proxy quality filter for
    training-data curation (high value = rare/garbled text). Same
    two-pass shape as ``doc_tfidf``: pass 1 reuses the vocab_partial
    block histograms (vocabulary-bounded driver merge, Heaps' law
    contract) and broadcasts the count map ONCE; pass 2 is
    shuffle-free — per-doc token counts and the weighted mean are
    block-local (docs never span blocks), with the per-doc sum done by
    one bincount over per-unique-token terms, not a token loop."""

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    empty = pa.schema([
        ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
        ("avg_neg_logprob", pa.float64()),
    ]).empty_table()
    cnt_ref, total = _unigram_vocab_ref(docs)
    if cnt_ref is None:
        return empty

    def score(batch: pa.Table) -> pa.Table:
        vocab_a, gc_arr = ray.get(cnt_ref)
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, " ")
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(
            np.arange(len(batch), dtype=np.int64),
            pc.list_value_length(toks).to_numpy(zero_copy_only=False))
        nv = len(vocab_a)
        tcode = pc.index_in(toks.values, value_set=vocab_a).to_numpy(
            zero_copy_only=False).astype(np.int64)
        uk, c = np.unique(doc_idx * nv + tcode, return_counts=True)
        d, tc = uk // nv, uk % nv
        neg_lp = -np.log(gc_arr[tc] / total)
        n_tok = np.bincount(d, weights=c, minlength=len(batch))
        lp_sum = np.bincount(d, weights=c * neg_lp, minlength=len(batch))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_tokens": pa.array(n_tok.astype(np.int64)),
            "avg_neg_logprob": pa.array(
                np.round(lp_sum / np.maximum(n_tok, 1), 6)),
        })

    out = list(docs.map_batches(score, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(out) if out else empty


def doc_bigram_logprob(sf_dir: str, k_big: int = 2000,
                       backoff: float = 0.4):
    """Bigram-LM quality score with unigram BACKOFF — the next-order
    perplexity proxy after doc_unigram_logprob: each adjacent token
    pair scores -ln(c12/c1) if the bigram is in the corpus TOP-K
    bigram table, else -ln(backoff * c(w2)/total) (the Katz-style
    escape). The bigram model is truncated to top-K BY CONSTRUCTION
    because full bigram vocabularies run ~10x unigram (the
    doc_vocab_bigrams driver-memory cliff): the top-K table comes from
    that op's distributed hash exchange and is broadcast once, bounded
    and corpus-independent, alongside the unigram vocab ref. Scoring
    is one shuffle-free block-local pass (pairs never leave their
    block; index_in + where, no token loop). Docs with < 2 tokens have
    no bigrams and drop on both sides.

    Complement of ``doc_perplexity_bigram``, which is the OTHER
    standard smoothing family: add-one over a dense truncated-id
    (V+1)^2 table (every transition gets mass from the prior). This op
    keeps exact counts for the head (top-K bigram TABLE, raw tokens,
    no id truncation) and handles the tail by Katz-style backoff to
    the unigram model — the two disagree exactly where smoothing
    choices matter."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    empty = pa.schema([
        ("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
        ("avg_neg_logprob", pa.float64()),
    ]).empty_table()
    cnt_ref, total = _unigram_vocab_ref(docs)
    if cnt_ref is None:
        return empty
    top = doc_vocab_bigrams(sf_dir, k=k_big)
    bo = pc.sort_indices(top.column("bigram"))
    big_ref = ray.put((
        top.column("bigram").take(bo).combine_chunks(),
        top.column("n").take(bo).to_numpy(
            zero_copy_only=False).astype(np.float64),
    ))

    def score(batch: pa.Table) -> pa.Table:
        vocab_a, gc = ray.get(cnt_ref)
        bgv, bgc = ray.get(big_ref)
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, " ")
        n_tok = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        doc_of = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        mask = np.ones(len(flat), dtype=bool)
        ends = np.cumsum(n_tok) - 1
        mask[ends[n_tok > 0]] = False
        left_pos = np.flatnonzero(mask)
        if not len(left_pos):
            return empty.schema.empty_table()
        lefts = flat.take(pa.array(left_pos))
        rights = flat.take(pa.array(left_pos + 1))
        bg = pc.binary_join_element_wise(lefts, rights, " ")
        c1 = gc[pc.index_in(lefts, value_set=vocab_a).to_numpy(
            zero_copy_only=False).astype(np.int64)]
        c2 = gc[pc.index_in(rights, value_set=vocab_a).to_numpy(
            zero_copy_only=False).astype(np.int64)]
        bix = pc.fill_null(pc.index_in(bg, value_set=bgv), -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        in_top = bix >= 0
        lp = np.where(in_top,
                      -np.log(bgc[np.maximum(bix, 0)] / c1),
                      -np.log(backoff * c2 / total))
        dpair = doc_of[left_pos]
        n_pairs = np.maximum(n_tok - 1, 0)
        lp_sum = np.bincount(dpair, weights=lp, minlength=len(n_tok))
        keep = n_pairs > 0
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_bigrams": pa.array(n_pairs[keep]),
            "avg_neg_logprob": pa.array(
                np.round(lp_sum[keep] / n_pairs[keep], 6)),
        })

    out = list(docs.map_batches(score, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(out) if out else empty


_CCNET_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("score", pa.float64()),
    ("ccnet_rank", pa.int64()), ("bucket", pa.int64()),
])


def _ccnet_sample(block: pa.Table, per_block: int) -> np.ndarray:
    k = block.column("key").to_numpy(zero_copy_only=False)
    if len(k) <= per_block:
        return k.astype(np.int64)
    idx = np.linspace(0, len(k) - 1, per_block).astype(np.int64)
    return k[idx].astype(np.int64)


def _ccnet_slice(block: pa.Table, splits: np.ndarray) -> list:
    """Route one scored block into len(splits)+1 key RANGES
    (searchsorted side='right': equal keys always land in one range,
    so cross-range order == key order regardless of split quality).
    16 bytes/row leave the scan."""
    P = len(splits) + 1
    ids = block.column("doc_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    keys = block.column("key").to_numpy(
        zero_copy_only=False).astype(np.int64)
    if not len(ids):
        return [(ids, keys) for _ in range(P)]
    part = np.searchsorted(splits, keys, side="right")
    order = np.argsort(part, kind="stable")
    ids, keys = ids[order], keys[order]
    bounds = np.searchsorted(part[order], np.arange(P + 1))
    return [(ids[s:e], keys[s:e]) for s, e in zip(bounds[:-1], bounds[1:])]


def _ccnet_rank(base: int, n_total: int, *shards) -> pa.Table:
    """One key range: local (key, doc_id) sort; global rank = prefix-sum
    base + local rank; tertile bucket = 3*rank // n."""
    ids = np.concatenate([s[0] for s in shards])
    if not len(ids):
        return _CCNET_SCHEMA.empty_table()
    keys = np.concatenate([s[1] for s in shards])
    order = np.lexsort((ids, keys))
    rank = np.empty(len(ids), dtype=np.int64)
    rank[order] = base + np.arange(len(ids), dtype=np.int64)
    return pa.Table.from_arrays([
        pa.array(ids), pa.array(np.round(keys / 1e6, 6)),
        pa.array(rank), pa.array(3 * rank // n_total)],
        schema=_CCNET_SCHEMA)


def doc_ccnet_buckets(sf_dir: str, sample_per_block: int = 64):
    """CCNet-style corpus bucketing (Wenzek et al. 2020): rank every
    document by its unigram-LM quality score (doc_unigram_logprob's
    mean -ln p) and split the corpus into equal-count head / middle /
    tail tertiles — the standard quality-stratified pretraining layout
    (head = most fluent). Output: (doc_id, score, ccnet_rank, bucket),
    rank 0-based under (round6-int score key asc, doc_id asc),
    bucket = 3*rank // n in {0, 1, 2}.

    Engine shape — exact global RANK BY A DERIVED, NON-UNIFORM key
    (doc_shuffle_order's md5 key was uniform, so equal-width ranges
    balanced with no extra step; a score key is skewed, so this adds
    the one missing piece):

      pass 1  token-histogram partials -> vocabulary-bounded driver
              merge, count map broadcast once (shared with
              doc_unigram_logprob via _unigram_vocab_ref);
      pass 2  block-local scoring emits (doc_id, int64 round6-score
              key) — 16 bytes/row, text never leaves the scan;
      splits  a bounded per-block key SAMPLE (sample_per_block rows)
              picks P-1 range splits on the driver — sample quality
              affects only balance, never correctness, because ranges
              partition the key space and equal keys cannot straddle
              a boundary (side='right' routing);
      rank    P range tasks sort locally; prefix sum of range counts
              (P ints) gives global ranks and tertile buckets.

    The float score is gated through the round6-int composite key on
    both sides (the doc_sample_weighted idiom: libm last-ulp noise
    cannot flip an integer key off a measure-zero boundary). Exact SQL
    mirror: ROW_NUMBER under the same CAST(ROUND(score,6)*1e6 AS
    BIGINT), doc_id order."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    cnt_ref, total = _unigram_vocab_ref(docs)
    if cnt_ref is None:
        return rd.from_arrow(_CCNET_SCHEMA.empty_table())

    def score_keys(batch: pa.Table) -> pa.Table:
        vocab_a, gc_arr = ray.get(cnt_ref)
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, " ")
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(
            np.arange(len(batch), dtype=np.int64),
            pc.list_value_length(toks).to_numpy(zero_copy_only=False))
        nv = len(vocab_a)
        tcode = pc.index_in(toks.values, value_set=vocab_a).to_numpy(
            zero_copy_only=False).astype(np.int64)
        uk, c = np.unique(doc_idx * nv + tcode, return_counts=True)
        d, tc = uk // nv, uk % nv
        neg_lp = -np.log(gc_arr[tc] / total)
        n_tok = np.bincount(d, weights=c, minlength=len(batch))
        lp_sum = np.bincount(d, weights=c * neg_lp, minlength=len(batch))
        key = np.rint(
            np.round(lp_sum / np.maximum(n_tok, 1), 6) * 1e6
        ).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "key": pa.array(key),
        })

    scored = docs.map_batches(score_keys, batch_format="pyarrow")
    refs = [block_ref for bundle in scored.iter_internal_ref_bundles()
            for block_ref, _md in bundle.blocks if _md.num_rows]
    if not refs:
        return rd.from_arrow(_CCNET_SCHEMA.empty_table())
    P = max(2, _n_parts())
    sample_task = ray.remote(_ccnet_sample)
    sample = np.sort(np.concatenate(ray.get(
        [sample_task.remote(r, sample_per_block) for r in refs])))
    splits = np.unique(
        sample[(np.arange(1, P) * len(sample)) // P]) \
        if len(sample) else np.array([], dtype=np.int64)
    P_eff = len(splits) + 1
    slice_task = ray.remote(_ccnet_slice)
    sl = [slice_task.options(num_returns=P_eff).remote(r, splits)
          for r in refs]
    if P_eff == 1:
        sl = [[s] for s in sl]
    count_task = ray.remote(_shuf_count)
    counts = ray.get([count_task.remote(*[s[p] for s in sl])
                      for p in range(P_eff)])
    n_total = int(sum(counts))
    bases = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank_task = ray.remote(_ccnet_rank)
    outs = [rank_task.remote(int(bases[p]), n_total, *[s[p] for s in sl])
            for p in range(P_eff)]
    return rd.from_arrow_refs(outs)
