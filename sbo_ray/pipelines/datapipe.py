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
from .logpipe import tune_context


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    tune_context()
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# ---- dedup -----------------------------------------------------------------


def doc_dedup_exact(sf_dir: str):
    """Exact dedup: hash-partitioned min(doc_id)+count per distinct text.
    Only the 16-byte hash + ids shuffle; payload stays put."""
    from ray.data.aggregate import Count, Min

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    hashed = ds.map_batches(D.add_text_hash, batch_format="pyarrow").select_columns(
        ["doc_id", "text_hash"]
    )
    agg = hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dupes")
    )
    return agg.select_columns(["doc_id", "n_dupes"])


def doc_dedup_minhash(sf_dir: str, threshold: float = 0.8):
    """MinHash+LSH near-dup pairs: shingle->minhash->band rows ->
    bucket groupby -> candidate pairs -> exact-Jaccard verify.

    Partitioning assumption: one LSH bucket fits in a worker (standard
    LSH contract; bands/rows tuned so buckets stay small)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    bands = ds.map_batches(D.minhash_bands, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())
        out = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        if not out:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame(out, columns=["id_a", "id_b"])

    cand = (
        bands.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    pairs = set(map(tuple, cand.values.tolist()))
    # verify against exact shingle Jaccard (small candidate set by design)
    texts = {
        r["doc_id"]: r["text"]
        for r in _read(sf_dir, "documents", columns=["doc_id", "text"]).take_all()
    }
    verified = D.verify_candidates(pairs, texts, threshold)
    return pa.table({
        "id_a": pa.array([v[0] for v in verified], type=pa.int64()),
        "id_b": pa.array([v[1] for v in verified], type=pa.int64()),
        "jaccard": pa.array([round(v[2], 3) for v in verified], type=pa.float64()),
    })


def doc_dedup_simhash(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup pairs via 4x16-bit pigeonhole bucketing."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    sigs = pa.concat_tables(
        ds.map_batches(D.simhash_batch, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    pairs = D.simhash_near_pairs(sigs, max_hamming)
    return pa.table({
        "id_a": pa.array([p[0] for p in pairs], type=pa.int64()),
        "id_b": pa.array([p[1] for p in pairs], type=pa.int64()),
        "hamming": pa.array([p[2] for p in pairs], type=pa.int64()),
    })


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


def emb_dedup_cosine(sf_dir: str, threshold: float = 0.35):
    """Embedding near-dup pairs: per-block numpy matmul against the
    broadcast (normalized) corpus matrix — O(n^2/blocks) inside blocks,
    no shuffle. The corpus side is broadcast via ray.put once."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    whole = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    ids = whole.column("vec_id").to_numpy(zero_copy_only=False)
    m = D.normalize_rows(S.embedding_matrix(whole))
    corpus_ref = ray.put((m, ids))

    def block_pairs(batch: pa.Table) -> pa.Table:
        mm, mids = ray.get(corpus_ref)
        b = D.normalize_rows(S.embedding_matrix(batch))
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        pairs = D.cosine_pairs_block(b, bids, mm, mids, threshold)
        return pa.table({
            "id_a": pa.array([p[0] for p in pairs], type=pa.int64()),
            "id_b": pa.array([p[1] for p in pairs], type=pa.int64()),
            "cos": pa.array([round(p[2], 3) for p in pairs], type=pa.float64()),
        })

    out = ds.map_batches(block_pairs, batch_format="pyarrow")
    return pa.concat_tables(out.iter_batches(batch_format="pyarrow", batch_size=None))


# ---- similarity search -----------------------------------------------------


def emb_similarity_topk(sf_dir: str, k: int = 10):
    """Brute-force cosine top-k of the min-vec_id query against the rest:
    broadcast query, block-local top-k, driver merge."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    first = ds.sort("vec_id").limit(1).take_all()[0]
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


def emb_ann_lsh(sf_dir: str, k: int = 10, n_bits: int = 6):
    """LSH-bucketed ANN with 1-bit multiprobe: hyperplane-bucket the
    corpus, scan the query's bucket plus its Hamming-1 neighbors
    (~(n_bits+1)/2^n_bits of the corpus). Recall vs the exact baseline is
    asserted in tests."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    whole = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    m = D.normalize_rows(S.embedding_matrix(whole))
    planes = S.hyperplanes(m.shape[1], n_bits)
    buckets = S.lsh_bucket(m, planes)
    ids = whole.column("vec_id").to_numpy(zero_copy_only=False)
    q_pos = int(np.argmin(ids))
    q = m[q_pos]
    probe = {int(buckets[q_pos])} | {
        int(buckets[q_pos]) ^ (1 << b) for b in range(n_bits)
    }
    mask = np.isin(buckets, list(probe)) & (ids != ids[q_pos])
    sims = m[mask] @ q
    bids = ids[mask]
    take = min(k, len(bids))
    idx = np.argsort(-sims)[:take]
    return pa.table({
        "vec_id": pa.array(bids[idx].astype(np.int64)),
        "cos": pa.array(np.round(sims[idx], 3).astype(np.float64)),
    })


# ---- text analysis ---------------------------------------------------------


def doc_token_stats(sf_dir: str):
    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        T.token_stats, batch_format="pyarrow"
    )


def doc_lang_id(sf_dir: str):
    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        T.lang_id, batch_format="pyarrow"
    )


def doc_fingerprint(sf_dir: str):
    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        T.fingerprint, batch_format="pyarrow"
    )


# ---- multimodal plumbing ---------------------------------------------------


def multimodal_payload_stats(sf_dir: str):
    """Binary-payload metadata (the SQL-checkable half of the multimodal
    plumbing: byte sizes of the opaque payload column)."""
    payload = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        to_payload_table, batch_format="pyarrow"
    )
    return payload.select_columns(["doc_id", "payload_bytes"])


def multimodal_features(sf_dir: str):
    """Full plumbing incl. the (stubbed) actor-pool decode stage."""
    payload = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        to_payload_table, batch_format="pyarrow"
    )
    return payload.map_batches(
        DecoderStub,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
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


def orders_mktsegment_revenue(sf_dir: str):
    """Both-sides-distributed hash join via native ``Dataset.join``
    (hash-partitioned on the key): orders x customer -> revenue per
    market segment. Complements the broadcast-join path
    (customer_nation_agg) with the shuffle-join primitive."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(customer, join_type="inner", num_partitions=8,
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


def events_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session windows over the events stream: per user, events closer
    than ``gap_minutes`` belong to one session (the classic stream
    sessionization, expressed as groupby(user).map_groups over
    ts-sorted groups — the Ray-idiomatic stream-window pattern).

    Partitioning assumption: one user's events fit in a worker (holds
    by construction for per-user activity; salt heavy users if not).
    Output: one row per session."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        gaps = g["ts"].diff().dt.total_seconds().fillna(1e18)
        session_no = (gaps > gap_minutes * 60).cumsum()
        out = g.groupby(session_no).agg(
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
    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


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