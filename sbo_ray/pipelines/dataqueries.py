"""Driver-contract registry for the training-data operators.

Oracle styles per query (see queries.py for the taxonomy):
- independent SQL over the pre-registered testdata views — used wherever
  the semantics are ANSI-SQL-expressible (exact dedup, token stats,
  lang-ID, cosine pairs/top-k, joins, windowed aggregates);
- no SQL entry (driver rows-only check) for the genuinely
  non-SQL-expressible sketch operators (MinHash-LSH, SimHash,
  fingerprinting, LSH-ANN, stubbed multimodal decode) — these are
  instead verified in pytest against brute-force Python oracles with
  planted duplicates (tests/test_dataops.py).
"""

from __future__ import annotations

from ..functions.text import LANG_STOPWORDS
from . import datapipe as P


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in sorted(words))


SQL_DOC_DEDUP_EXACT = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_dupes
FROM documents GROUP BY text
"""

SQL_DOC_TOKEN_STATS = f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_alpha_tokens,
  CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
       x -> x IN ({_sql_list(LANG_STOPWORDS["en"])}))) AS BIGINT) AS n_stop_en,
  CAST(len(regexp_extract_all(text,
       '''(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+'))
       AS BIGINT) AS n_bpe_tokens
FROM documents
"""

SQL_DOC_LANG_ID = f"""
WITH c AS (
  SELECT doc_id,
    len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        x -> x IN ({_sql_list(LANG_STOPWORDS["de"])}))) AS c_de,
    len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        x -> x IN ({_sql_list(LANG_STOPWORDS["en"])}))) AS c_en,
    len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        x -> x IN ({_sql_list(LANG_STOPWORDS["es"])}))) AS c_es,
    len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        x -> x IN ({_sql_list(LANG_STOPWORDS["fr"])}))) AS c_fr
  FROM documents
)
SELECT doc_id,
  CASE
    WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
    WHEN c_en >= c_es AND c_en >= c_fr THEN 'en'
    WHEN c_es >= c_fr THEN 'es'
    ELSE 'fr' END AS pred_lang
FROM c
"""

SQL_EMB_DEDUP_COSINE = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding, b.embedding), 3) AS cos
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(a.embedding, b.embedding) > 0.35
"""

SQL_EMB_SIMILARITY_TOPK = """
WITH q AS (
  SELECT embedding AS qe, vec_id AS qid FROM embeddings
  WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
)
SELECT e.vec_id,
       ROUND(list_cosine_similarity(e.embedding, q.qe), 3) AS cos
FROM embeddings e, q
WHERE e.vec_id <> q.qid
ORDER BY ROUND(list_cosine_similarity(e.embedding, q.qe), 3) DESC, e.vec_id
LIMIT 10
"""

SQL_MULTIMODAL_PAYLOAD_STATS = """
SELECT doc_id, CAST(strlen(text) AS BIGINT) AS payload_bytes FROM documents
"""

SQL_CUSTOMER_NATION_AGG = """
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

SQL_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

SQL_ORDERS_MKTSEGMENT_REVENUE = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""

SQL_ORDERS_BY_MONTH = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders GROUP BY 1
"""

SQL_EVENTS_SESSIONIZE = """
WITH ordered AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
  FROM ordered
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM numbered GROUP BY user_id, session_no
"""

SQL_EVENTS_HOURLY = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def data_queries() -> dict:
    return {
        "doc_dedup_exact": P.doc_dedup_exact,
        "doc_dedup_minhash": P.doc_dedup_minhash,
        "doc_dedup_clusters": P.doc_dedup_clusters,
        "doc_dedup_simhash": P.doc_dedup_simhash,
        "emb_dedup_cosine": P.emb_dedup_cosine,
        "emb_similarity_topk": P.emb_similarity_topk,
        "emb_ann_lsh": P.emb_ann_lsh,
        "doc_token_stats": P.doc_token_stats,
        "doc_lang_id": P.doc_lang_id,
        "doc_fingerprint": P.doc_fingerprint,
        "multimodal_payload_stats": P.multimodal_payload_stats,
        "multimodal_features": P.multimodal_features,
        "customer_nation_agg": P.customer_nation_agg,
        "orders_mktsegment_revenue": P.orders_mktsegment_revenue,
        "lineitem_pricing_summary": P.lineitem_pricing_summary,
        "orders_by_month": P.orders_by_month,
        "events_hourly": P.events_hourly,
        "events_sessionize": P.events_sessionize,
    }


def data_oracle_sql() -> dict:
    # non-SQL-expressible (rows-only): doc_dedup_minhash, doc_dedup_simhash,
    # emb_ann_lsh, doc_fingerprint, multimodal_features
    return {
        "doc_dedup_exact": SQL_DOC_DEDUP_EXACT,
        "emb_dedup_cosine": SQL_EMB_DEDUP_COSINE,
        "emb_similarity_topk": SQL_EMB_SIMILARITY_TOPK,
        "doc_token_stats": SQL_DOC_TOKEN_STATS,
        "doc_lang_id": SQL_DOC_LANG_ID,
        "multimodal_payload_stats": SQL_MULTIMODAL_PAYLOAD_STATS,
        "customer_nation_agg": SQL_CUSTOMER_NATION_AGG,
        "orders_mktsegment_revenue": SQL_ORDERS_MKTSEGMENT_REVENUE,
        "lineitem_pricing_summary": SQL_LINEITEM_PRICING,
        "orders_by_month": SQL_ORDERS_BY_MONTH,
        "events_hourly": SQL_EVENTS_HOURLY,
        "events_sessionize": SQL_EVENTS_SESSIONIZE,
    }


def bench_queries() -> dict:
    """Queries included in bench.py timings (kept small: the provided
    tables are tiny; the log pipeline is the throughput story)."""
    return {}
