"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship near-duplicate pair query at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query (correctness gate).

Column names + rounding are aligned on both sides so the driver's
order-insensitive value hash matches; money aggregates run in DECIMAL
(order-independent addition) so Spark's partial-agg order can't flip a
rounded digit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from job_post_similarity_spark.functions import strings as S
from job_post_similarity_spark.functions import vectors as V
from job_post_similarity_spark.operators import (
    dedup,
    knn,
    preprocess,
    profiling,
    sampling,
    text_analysis,
    topk,
)
from job_post_similarity_spark.sources.io import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: near-duplicate document pairs by embedding cosine
    (the reference's whole pipeline, app/main.py:201-279) on sf0.001.

    Threshold 0.40 on the synthetic random-unit-vector fixtures (their
    cosine population peaks at 0; the reference's 0.90 applies to real
    model embeddings — config-driven either way)."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    return knn.similarity_pairs(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.40
    )


# --------------------------------------------------------------------------
# queries: each takes (spark, sf_dir) → DataFrame
# --------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (A-series aggregates on lineitem).

    DECIMAL sums → order-independent, hash-stable vs the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("decimal(18,4)").alias("sum_qty"),
            F.sum(d("l_extendedprice")).cast("decimal(18,4)").alias("sum_base_price"),
            F.sum(
                (d("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - d("l_discount")))
            ).cast("decimal(24,8)").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def group_count_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: value_counts top-N (notebook cell 13) on o_orderpriority."""
    return profiling.group_count_topn(
        load_table(spark, sf_dir, "orders"), "o_orderpriority", n=5
    )


def null_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-column null profile (notebook cells 6/9) on events."""
    return profiling.null_profile(
        load_table(spark, sf_dir, "events"), ["value", "props", "event_type"]
    )


def distinct_counts_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: nunique (notebook cell 7) on lineitem keys."""
    return profiling.distinct_counts(
        load_table(spark, sf_dir, "lineitem"), ["l_orderkey", "l_partkey", "l_suppkey"]
    )


def summary_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: describe() (notebook cell 15) on document char lengths."""
    return profiling.summary_stats(
        load_table(spark, sf_dir, "documents"), "n_chars"
    )


def duplicate_count_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: duplicated().sum() (notebook cell 11) on (user_id, event_type)."""
    return profiling.duplicate_count(
        load_table(spark, sf_dir, "events"), ["user_id", "event_type"]
    )


def dedup_keep_first_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: drop_duplicates(keep='first') with deterministic order
    (reference: app/preprocess_data.py:59-71) — first event per
    (user_id, event_type) by (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events")
    out = preprocess.dedup_keep_first(
        ev, ["user_id", "event_type"], [F.col("ts"), F.col("event_id")]
    )
    return out.select("event_id", "user_id", "event_type", "value")


def broadcast_lookup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: broadcast dimension lookup (reference: id→title lookups,
    app/evaluation.py:147-149) — customers per region via two broadcast
    hops."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("customer_cnt"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
            .cast("decimal(18,4)")
            .alias("sum_acctbal"),
        )
        .orderBy("region_name")
    )


def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: top-2 per group (reference: k-NN rank,
    app/vector_search.py:182-183) — top-2 orders per customer by price."""
    o = load_table(spark, sf_dir, "orders")
    out = topk.topk_per_group(
        o,
        ["o_custkey"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=2,
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,4)").alias("totalprice"),
        "rank",
    )


def neighbor_pivot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: ranked-neighbor pivot (reference: app/evaluation.py:133-171)
    — top-3 order keys per customer widened into slot columns."""
    o = load_table(spark, sf_dir, "orders")
    ranked = topk.topk_per_group(
        o, ["o_custkey"], [F.desc("o_totalprice"), F.asc("o_orderkey")], k=3
    )
    return topk.neighbor_pivot(
        ranked, "o_custkey", "rank", 3, {"ID": "o_orderkey"}
    )


def sort_limit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2: global sort desc + limit (reference: app/main.py:270,275)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        topk.sort_desc(o, "o_totalprice", ["o_orderkey"])
        .limit(10)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,4)").alias("totalprice"),
        )
    )


def first_last_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: first/last row by explicit order (reference iloc[0]/iloc[-1],
    app/fetech_jd.py:79-80)."""
    docs = load_table(spark, sf_dir, "documents")
    return topk.first_last(docs, "doc_id").select("doc_id", "source", "n_chars")


def string_clean_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F3/F5/F6 string cleaning on part names."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        S.strip_trailing_comma("p_name").alias("name_nocomma"),
        S.normalize_remote("p_type").alias("type_remote_norm"),
        S.clean_text("p_name").alias("name_clean"),
    )


def date_extract_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 family: timestamp parts + group count per order year."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("decimal(18,4)")
            .alias("sum_price"),
        )
        .orderBy("order_year")
    )


def deterministic_sample_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 (scale tier): engine-agnostic multiplicative-hash sample, ~2%
    of lineitem rows, reproducible on any engine."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey") * 1_000_000 + F.col("l_linenumber")
    out = sampling.deterministic_sample(li, key, 0.02)
    return out.select("l_orderkey", "l_linenumber", "l_quantity")


# ------------------------------------------------------------- vector ops


def knn_exact_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 exact tier: top-1 cosine neighbor per vector, self excluded
    (reference: k=2 self-search, app/main.py:226-263)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = knn.knn_join(emb, "vec_id", "embedding", k=1)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("similarity", 4).alias("similarity"),
    )


def similarity_pairs_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship D2+P5 chain: canonical duplicate pairs at cosine ≥ 0.4."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn.similarity_pairs(emb, "vec_id", "embedding", threshold=0.40)


def l2_cosine_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3: the L2→cosine bridge (app/evaluation.py:24-27) — verifies
    1 - L2²/2 == dot for unit vectors, per pair of consecutive ids."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("v1"))
    b = emb.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("v2"))
    pairs = a.join(b, a.id1 + 1 == b.id2)
    return pairs.select(
        "id1",
        "id2",
        F.round(V.dot_cosine("v1", "v2"), 4).alias("cos_dot"),
        F.round(V.l2_to_cosine(F.sqrt(V.sq_l2_distance("v1", "v2"))), 4).alias(
            "cos_from_l2"
        ),
    )


def cosine_topk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search baseline: brute-force cosine top-3 for a fixed
    query set (vec_id < 5) over the full embedding table."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    out = knn.knn_join(queries_df, "vec_id", "embedding", k=3, right=emb)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("similarity", 4).alias("similarity"),
        "rank",
    )


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector norm + normalize check: unit-norm invariant the cosine
    math relies on (reference: app/generate_embeddings.py:25-50)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.round(V.norm("embedding"), 4).alias("l2_norm"),
        F.round(V.norm(V.l2_normalize("embedding")), 4).alias("unit_norm"),
    )


# ---------------------------------------------------------------- text ops


def token_count_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text_analysis.token_count("text").alias("n_tokens"),
    )


def quality_score_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text_analysis.quality_score("text").alias("quality"),
    )


def doc_fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text_analysis.doc_fingerprint("text").alias("fingerprint"),
    )


def exact_dup_clusters_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content digest on the repeating events.props."""
    ev = load_table(spark, sf_dir, "events")
    return dedup.exact_dup_clusters(ev, "props")


def ngram_jaccard_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-2-gram Jaccard pairs over a doc_id<40 slice (bigrams:
    the synthetic word-soup corpus has measurable bigram overlap but
    near-zero trigram overlap)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    return dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.05)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "group_count_topn_orders": group_count_topn_orders,
        "null_profile_events": null_profile_events,
        "distinct_counts_lineitem": distinct_counts_lineitem,
        "summary_stats_documents": summary_stats_documents,
        "duplicate_count_events": duplicate_count_events,
        "dedup_keep_first_events": dedup_keep_first_events,
        "broadcast_lookup_customers": broadcast_lookup_customers,
        "window_topk_orders": window_topk_orders,
        "neighbor_pivot_orders": neighbor_pivot_orders,
        "sort_limit_orders": sort_limit_orders,
        "first_last_documents": first_last_documents,
        "string_clean_part": string_clean_part,
        "date_extract_orders": date_extract_orders,
        "deterministic_sample_lineitem": deterministic_sample_lineitem,
        "knn_exact_top1": knn_exact_top1,
        "similarity_pairs_flagship": similarity_pairs_flagship,
        "l2_cosine_conversion": l2_cosine_conversion,
        "cosine_topk_search": cosine_topk_search,
        "embedding_norms": embedding_norms,
        "token_count_documents": token_count_documents,
        "quality_score_documents": quality_score_documents,
        "doc_fingerprint_documents": doc_fingerprint_documents,
        "exact_dup_clusters_props": exact_dup_clusters_props,
        "ngram_jaccard_documents": ngram_jaccard_documents,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

_COS = (
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
)


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                            (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                        AS DECIMAL(24,8)) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "group_count_topn_orders": """
            SELECT o_orderpriority, count(*) AS cnt
            FROM orders
            GROUP BY o_orderpriority
            ORDER BY cnt DESC, o_orderpriority ASC
            LIMIT 5
        """,
        "null_profile_events": """
            WITH t AS (SELECT count(*) AS total,
                              sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS n_value,
                              sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS n_props,
                              sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS n_et
                       FROM events)
            SELECT 'value' AS column_name, n_value AS null_count,
                   round(n_value * 100.0 / total, 4) AS null_pct FROM t
            UNION ALL
            SELECT 'props', n_props, round(n_props * 100.0 / total, 4) FROM t
            UNION ALL
            SELECT 'event_type', n_et, round(n_et * 100.0 / total, 4) FROM t
        """,
        "distinct_counts_lineitem": """
            SELECT count(DISTINCT l_orderkey) AS l_orderkey_distinct,
                   count(DISTINCT l_partkey) AS l_partkey_distinct,
                   count(DISTINCT l_suppkey) AS l_suppkey_distinct,
                   count(*) AS row_count
            FROM lineitem
        """,
        "summary_stats_documents": """
            SELECT count(n_chars) AS cnt,
                   round(avg(n_chars), 4) AS mean,
                   min(n_chars) AS min,
                   quantile_cont(n_chars, 0.25) AS p25,
                   quantile_cont(n_chars, 0.5) AS p50,
                   quantile_cont(n_chars, 0.75) AS p75,
                   max(n_chars) AS max
            FROM documents
        """,
        "duplicate_count_events": """
            SELECT count(*) - count(DISTINCT (user_id, event_type)) AS duplicate_rows
            FROM events
        """,
        "dedup_keep_first_events": """
            SELECT event_id, user_id, event_type, value
            FROM (SELECT *, row_number() OVER
                      (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        "broadcast_lookup_customers": """
            SELECT r_name AS region_name, count(*) AS customer_cnt,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
            ORDER BY r_name
        """,
        "window_topk_orders": """
            SELECT o_custkey, o_orderkey,
                   CAST(o_totalprice AS DECIMAL(18,4)) AS totalprice, rank
            FROM (SELECT *, row_number() OVER
                      (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
                  FROM orders)
            WHERE rank <= 2
        """,
        "neighbor_pivot_orders": """
            WITH ranked AS (
                SELECT o_custkey, o_orderkey, row_number() OVER
                    (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
                FROM orders)
            SELECT o_custkey,
                   max(CASE WHEN rank = 1 THEN o_orderkey END) AS "Neighbor_1_ID",
                   max(CASE WHEN rank = 2 THEN o_orderkey END) AS "Neighbor_2_ID",
                   max(CASE WHEN rank = 3 THEN o_orderkey END) AS "Neighbor_3_ID"
            FROM ranked WHERE rank <= 3
            GROUP BY o_custkey
        """,
        "sort_limit_orders": """
            SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,4)) AS totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 10
        """,
        "first_last_documents": """
            (SELECT doc_id, source, n_chars FROM documents ORDER BY doc_id ASC LIMIT 1)
            UNION ALL
            (SELECT doc_id, source, n_chars FROM documents ORDER BY doc_id DESC LIMIT 1)
        """,
        "string_clean_part": """
            SELECT p_partkey,
                   trim(regexp_replace(p_name, '\\s*,\\s*$', '', 'g')) AS name_nocomma,
                   regexp_replace(p_type, '(?i)remote', 'REMOTE', 'g') AS type_remote_norm,
                   trim(regexp_replace(lower(p_name), '\\s+', ' ', 'g')) AS name_clean
            FROM part
        """,
        "date_extract_orders": """
            SELECT year(o_orderdate) AS order_year, count(*) AS cnt,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_price
            FROM orders
            GROUP BY 1 ORDER BY 1
        """,
        "deterministic_sample_lineitem": """
            SELECT l_orderkey, l_linenumber, l_quantity
            FROM lineitem
            WHERE (((l_orderkey * 1000000 + l_linenumber) % 2147483648)
                   * 1103515245 + 12345) % 2147483648
                  < CAST(0.02 * 2147483648 AS BIGINT)
        """,
        "knn_exact_top1": f"""
            SELECT query_id, neighbor_id, round(similarity, 4) AS similarity
            FROM (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                         {_COS} AS similarity,
                         row_number() OVER
                             (PARTITION BY a.vec_id
                              ORDER BY {_COS} DESC, b.vec_id ASC) AS rn
                  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
            WHERE rn = 1
        """,
        "similarity_pairs_flagship": f"""
            SELECT id1, id2, similarity FROM (
                SELECT a.vec_id AS id1, b.vec_id AS id2,
                       round({_COS}, 4) AS similarity
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
            WHERE similarity >= 0.40
            ORDER BY similarity DESC, id1, id2
        """,
        "l2_cosine_conversion": """
            SELECT a.vec_id AS id1, b.vec_id AS id2,
                   round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos_dot,
                   round(least(greatest(
                       1.0 - (list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) ^ 2) / 2.0,
                       -1.0), 1.0), 4) AS cos_from_l2
            FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id
        """,
        "cosine_topk_search": f"""
            SELECT query_id, neighbor_id, round(similarity, 4) AS similarity,
                   rn AS rank
            FROM (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                         {_COS} AS similarity,
                         row_number() OVER
                             (PARTITION BY a.vec_id
                              ORDER BY {_COS} DESC, b.vec_id ASC) AS rn
                  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
                  WHERE a.vec_id < 5)
            WHERE rn <= 3
        """,
        "embedding_norms": """
            SELECT vec_id,
                   round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 4) AS l2_norm,
                   round(sqrt(list_dot_product(
                       list_transform(embedding::DOUBLE[],
                           x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))),
                       list_transform(embedding::DOUBLE[],
                           x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))))), 4)
                       AS unit_norm
            FROM embeddings
        """,
        "token_count_documents": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE array_length(string_split_regex(trim(text), '\\s+'))
                   END AS n_tokens
            FROM documents
        """,
        "doc_fingerprint_documents": """
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "exact_dup_clusters_props": """
            SELECT md5(props) AS text_hash, count(*) AS cnt
            FROM events
            GROUP BY 1 HAVING count(*) > 1
            ORDER BY cnt DESC, text_hash ASC
        """,
        "ngram_jaccard_documents": """
            WITH grams AS (
                SELECT doc_id,
                       list_distinct([list_aggregate(toks[i:i+1], 'string_agg', ' ')
                                      FOR i IN range(1, len(toks))]) AS g
                FROM (SELECT doc_id,
                             string_split_regex(trim(text), '\\s+') AS toks
                      FROM documents WHERE doc_id < 40))
            SELECT a.doc_id AS id1, b.doc_id AS id2,
                   round(len(list_intersect(a.g, b.g)) * 1.0 /
                         len(list_distinct(a.g || b.g)), 4) AS jaccard
            FROM grams a JOIN grams b ON a.doc_id < b.doc_id
            WHERE round(len(list_intersect(a.g, b.g)) * 1.0 /
                        len(list_distinct(a.g || b.g)), 4) >= 0.05
            ORDER BY jaccard DESC, id1, id2
        """,
    }
