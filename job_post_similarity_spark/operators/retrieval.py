"""Hybrid-retrieval operators: rank fusion across retrieval tiers.

The repo already ships both retrieval families a training-data /
RAG pipeline needs — lexical (``text_analysis.inverted_index`` /
``bm25_rank``) and dense (the exact/SRP/IVF/PQ kNN tiers in
``operators.knn`` / ``operators.ann``). This module fuses their
ranked outputs with reciprocal rank fusion (Cormack et al., SIGIR
2009): score(d) = Σ_lists 1/(k + rank_list(d)).

Cross-engine policy (same as ``metrics``/``text_analysis``): the RRF
contribution is computed as the pure integer floor division
``1_000_000 DIV (k + rank)`` — no floating point anywhere, so an
independent engine reproduces the fused scores bit-for-bit.

Scale shape: fusion is ONE union + ONE hash aggregate on the doc id,
regardless of how many ranked lists participate; each input list is
already top-N-bounded by its producer, so the fused table is at most
``n_lists × N`` rows — driver-safe and broadcast-safe at any corpus
size. The heavy lifting (scoring 100 TB of documents) stays inside
the producing tiers, which are themselves bucketed/broadcast-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def rrf_fuse(
    ranked: dict[str, DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top_n: int = 20,
) -> DataFrame:
    """Fuse named ranked lists ``{source: (id, rank)}`` (1-based
    integer ranks) by reciprocal rank fusion with constant ``k``.

    Returns ``(id, n_lists, score_micro)`` ordered by fused score
    descending (ties broken on the id), limited to ``top_n``.
    ``score_micro = Σ 1_000_000 DIV (k + rank)`` — exact integers.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    parts = [
        df.select(
            F.col(id_col),
            F.col(rank_col).cast("long").alias("__rank"),
        )
        for df in ranked.values()
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    contrib = F.expr(f"CAST({MICRO} DIV ({int(k)} + __rank) AS BIGINT)")
    return (
        u.select(id_col, contrib.alias("__c"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lists"),
            F.sum("__c").alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), F.asc(id_col))
        .limit(top_n)
    )


def rank_by(
    df: DataFrame,
    id_col: str,
    order_cols: list,
    top_n: int,
) -> DataFrame:
    """Attach a deterministic 1-based ``rank`` to a SMALL (already
    top-N-bounded or boundable) result by the given order, keeping
    ``top_n`` rows. The single-partition window is intentional and
    safe only because every caller feeds an N-bounded list (the
    producing tier did the distributed cut); a corpus-sized ranking
    belongs in the producer, not here.
    """
    from pyspark.sql import Window

    w = Window.orderBy(*order_cols)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(id_col, "rank")
    )
