"""Empty-input behavior: Ray's empty-Dataset ``to_pandas()`` loses
column schema (CLAUDE.md soft spot); callers that sort/select columns on
a materialized aggregate must go through
``logpipe.to_pandas_with_schema`` or an explicit typed-empty guard
(VERDICT r2 item 5, ADVICE r2 simhash finding)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sbo_ray import synth
from sbo_ray.config import JobConfig
from sbo_ray.pipelines import logpipe


@pytest.fixture(scope="module")
def empty_token_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_tokens")
    pq.write_table(synth.SCHEMA.empty_table(), str(d / "shard-0000.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def empty_doc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_docs")
    pq.write_table(
        pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                   ("lang", pa.string()), ("n_chars", pa.int64())]).empty_table(),
        str(d / "documents.parquet"),
    )
    return str(d)


def _job():
    return JobConfig.from_format_map(synth.source_config(2))


def test_top_n_dataset_empty(ray_session, empty_token_dir):
    enr = logpipe.enriched_dataset(
        sorted([f"{empty_token_dir}/shard-0000.parquet"]), _job())
    kc = logpipe.keyed_counters_dataset(enr)
    out = logpipe.top_n_dataset(kc, "paths", n=5)
    assert out.num_rows == 0
    assert out.schema.names == ["source", "key_value", "cnt"]


def test_distinct_clients_empty(ray_session, empty_token_dir, monkeypatch):
    from sbo_ray.pipelines import queries as Q

    monkeypatch.setattr(
        Q, "_input_paths", lambda sf: [f"{empty_token_dir}/shard-0000.parquet"])
    monkeypatch.setattr(Q, "_job", _job)
    out = Q.q_log_distinct_clients("ignored")
    assert out.num_rows == 0
    assert out.schema.names == ["source", "n_clients"]


def test_parse_stats_empty(ray_session, empty_token_dir, monkeypatch):
    from sbo_ray.pipelines import queries as Q

    monkeypatch.setattr(
        Q, "_input_paths", lambda sf: [f"{empty_token_dir}/shard-0000.parquet"])
    monkeypatch.setattr(Q, "_job", _job)
    out = Q.q_log_parse_stats("ignored")
    assert out.num_rows == 0
    assert out.schema.names == ["source", "total_lines", "parsed", "parse_errors"]


def test_simhash_empty_documents(ray_session, empty_doc_dir):
    from sbo_ray.pipelines.datapipe import doc_dedup_simhash

    out = doc_dedup_simhash(empty_doc_dir)
    assert out.num_rows == 0
    assert out.schema.names == ["id_a", "id_b", "hamming"]
    assert out.schema.field("id_a").type == pa.int64()


def test_dedup_family_empty_documents(ray_session, empty_doc_dir):
    from sbo_ray.pipelines import datapipe as DP

    for fn, cols in (
        (DP.doc_dedup_minhash, ["id_a", "id_b", "jaccard"]),
        (DP.doc_dedup_ngram, ["id_a", "id_b", "jaccard"]),
        (DP.doc_dedup_clusters, ["doc_id", "cluster_id"]),
        (DP.doc_dedup_clusters_lp, ["doc_id", "cluster_id"]),
        (DP.doc_group_topk, ["doc_id", "lang", "n_chars", "rnk"]),
        (DP.doc_tfidf, ["doc_id", "token", "score", "rnk"]),
        (DP.doc_unigram_logprob, ["doc_id", "n_tokens",
                                  "avg_neg_logprob"]),
        (DP.doc_pack_sequences, ["doc_id", "n_tokens", "tok_offset",
                                 "seq_first", "seq_last"]),
        (DP.doc_pack_materialize, ["doc_id", "seq_id", "n_frag_tokens",
                                   "frag_text"]),
    ):
        out = fn(empty_doc_dir)
        if hasattr(out, "count"):  # Dataset-returning ops (r5 pack)
            assert out.count() == 0, fn.__name__
            assert out.schema().names == cols, fn.__name__
        else:
            assert out.num_rows == 0, fn.__name__
            assert out.schema.names == cols, fn.__name__
    # streaming scan ops return a Dataset; empty input -> zero rows
    assert DP.doc_decontaminate_ngram(empty_doc_dir).count() == 0


def test_funnel_empty_events(ray_session, tmp_path):
    from sbo_ray.pipelines.datapipe import events_funnel

    pq.write_table(
        pa.schema([("event_id", pa.int64()),
                   ("ts", pa.timestamp("us")),
                   ("user_id", pa.int64()),
                   ("event_type", pa.string()),
                   ("value", pa.float64()),
                   ("props", pa.string())]).empty_table(),
        str(tmp_path / "events.parquet"),
    )
    out = events_funnel(str(tmp_path))
    assert out.num_rows == 0
    assert out.schema.names == ["user_id", "max_stage", "t_stage1_us",
                                "t_stage2_us", "t_stage3_us"]


def test_knn_join_empty_embeddings(ray_session, tmp_path):
    from sbo_ray.pipelines.datapipe import emb_knn_join

    pq.write_table(
        pa.schema([("vec_id", pa.int64()),
                   ("embedding", pa.list_(pa.float32())),
                   ("label", pa.int32())]).empty_table(),
        str(tmp_path / "embeddings.parquet"),
    )
    out = emb_knn_join(str(tmp_path))
    assert out.num_rows == 0
    assert out.schema.names == ["vec_id", "neighbor_id", "cos", "rnk"]


def test_quantize_sq8_empty_embeddings(ray_session, tmp_path):
    from sbo_ray.pipelines.datapipe import emb_quantize_sq8

    pq.write_table(
        pa.schema([("vec_id", pa.int64()),
                   ("embedding", pa.list_(pa.float32())),
                   ("label", pa.int32())]).empty_table(),
        str(tmp_path / "embeddings.parquet"),
    )
    out = emb_quantize_sq8(str(tmp_path))
    assert out.count() == 0
    assert out.schema().names == ["vec_id", "codes"]


def test_pq_empty_embeddings(ray_session, tmp_path):
    from sbo_ray.pipelines.datapipe import emb_ann_pq, emb_pq_codes

    pq.write_table(
        pa.schema([("vec_id", pa.int64()),
                   ("embedding", pa.list_(pa.float32())),
                   ("label", pa.int32())]).empty_table(),
        str(tmp_path / "embeddings.parquet"),
    )
    out = emb_pq_codes(str(tmp_path))
    assert out.count() == 0
    assert out.schema().names == ["vec_id", "codes"]
    ann = emb_ann_pq(str(tmp_path))
    assert ann.num_rows == 0
    assert ann.schema.names == ["vec_id", "adc"]


def test_bigrams_weighted_empty_documents(ray_session, empty_doc_dir):
    from sbo_ray.pipelines.datapipe import (
        doc_sample_weighted,
        doc_vocab_bigrams,
    )

    out = doc_vocab_bigrams(empty_doc_dir)
    assert out.num_rows == 0
    assert out.schema.names == ["bigram", "n"]
    w = doc_sample_weighted(empty_doc_dir)
    assert w.num_rows == 0
    assert w.schema.names == ["doc_id", "wkey"]


def test_outlier_scores_empty_embeddings(ray_session, tmp_path):
    from sbo_ray.pipelines.datapipe import emb_outlier_scores

    pq.write_table(
        pa.schema([("vec_id", pa.int64()),
                   ("embedding", pa.list_(pa.float32())),
                   ("label", pa.int32())]).empty_table(),
        str(tmp_path / "embeddings.parquet"),
    )
    out = emb_outlier_scores(str(tmp_path))
    assert out.count() == 0
    assert out.schema().names == ["vec_id", "cos_mean", "is_outlier"]


def test_covariance_pca_empty_embeddings(ray_session, tmp_path):
    from sbo_ray.pipelines.datapipe import emb_covariance, emb_pca_project

    pq.write_table(
        pa.schema([("vec_id", pa.int64()),
                   ("embedding", pa.list_(pa.float32())),
                   ("label", pa.int32())]).empty_table(),
        str(tmp_path / "embeddings.parquet"),
    )
    cov = emb_covariance(str(tmp_path))
    assert cov.num_rows == 0
    assert cov.schema.names == ["dim_i", "dim_j", "cov"]
    p = emb_pca_project(str(tmp_path))
    assert p.count() == 0
    assert p.schema().names == ["vec_id", "proj"]


def test_raw_task_pair_ops_empty_embeddings(ray_session, tmp_path):
    """The raw-task chunk-pair ops must survive a schemaless empty read
    (zero-row blocks are dropped by metadata before slicing)."""
    from sbo_ray.pipelines.datapipe import emb_dedup_cosine, emb_semdedup

    pq.write_table(
        pa.schema([("vec_id", pa.int64()),
                   ("embedding", pa.list_(pa.float32())),
                   ("label", pa.int32())]).empty_table(),
        str(tmp_path / "embeddings.parquet"),
    )
    out = emb_dedup_cosine(str(tmp_path))
    assert out.num_rows == 0
    assert out.schema.names == ["id_a", "id_b", "cos"]
    sem = emb_semdedup(str(tmp_path))
    assert sem.count() == 0
    assert sem.schema().names == ["vec_id", "rep_id", "cluster"]


def test_late_r5_token_ops_empty(ray_session, empty_token_dir, monkeypatch):
    """Every late-r5 token operator returns a ZERO-row, full-schema
    result on an empty shard (no schemaless empty-Dataset leak, no
    div-by-zero in the integer folds)."""
    from sbo_ray.pipelines import queries as Q

    monkeypatch.setattr(
        Q, "_input_paths",
        lambda sf: [f"{empty_token_dir}/shard-0000.parquet"])
    cases = [
        (Q.q_log_cross_source_leakage, ["src_a", "src_b", "n_shared"]),
        (Q.q_log_token_pmi, ["a", "b", "cnt", "pmi"]),
        (Q.q_log_pack_doc_mix, ["n_docs", "n_seqs"]),
        (Q.q_log_pack_source_purity, ["n_sources", "n_seqs"]),
        (Q.q_log_seq_dominant_ratio, ["source", "decile", "n_seqs"]),
        (Q.q_log_token_burstiness,
         ["token", "n_occ", "sum_sq", "n_seqs"]),
        (Q.q_log_token_run_lengths, ["run_len", "n_runs"]),
        (Q.q_log_seq_len_percentiles, ["source", "p50", "p90", "p99"]),
        (Q.q_log_source_minhash_sim, ["src_a", "src_b", "n_match"]),
        (Q.q_log_seq_internal_repeats,
         ["source", "n_seqs_repeat", "n_rep_windows"]),
    ]
    for fn, cols in cases:
        out = fn("ignored")
        assert out.num_rows == 0, fn.__name__
        assert out.schema.names == cols, fn.__name__
    # the curated pack returns a (lazy) Dataset; materialize
    packed = Q.q_log_pack_tokens_curated("ignored")
    import ray.data as rd

    assert isinstance(packed, rd.Dataset)
    assert packed.count() == 0
