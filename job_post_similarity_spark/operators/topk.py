"""Window top-k and neighbor pivot (SURVEY.md §2.5, W1-W2) + sorts/limits
(§2.6, O1-O3).

W1 is the relational half of the k-NN join: rank candidates per query,
keep the best k. One shuffle on the partition key; the rank filter cuts
the data before anything downstream — at scale, always filter on
row_number inside the same select so Spark's WindowGroupLimit pushes
the limit into the sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """W1: top-k rows per group (reference: Faiss returns k best per
    query, app/vector_search.py:182-183; relational analog 'top-2
    orders per customer').

    Uses row_number (not rank) for exactly-k semantics; pass a
    deterministic tiebreaker in ``order``.
    """
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def neighbor_pivot(
    df: DataFrame,
    query_col: str,
    rank_col: str,
    k: int,
    value_cols: dict[str, str],
) -> DataFrame:
    """W2: widen ranked neighbors into slot columns
    (reference: app/evaluation.py:133-171 builds Neighbor_{j}_ID/Title/
    Similarity for j=1..5; missing slots null-padded at :159-169).

    ``value_cols`` maps output-suffix → source column, e.g.
    ``{"ID": "neighbor_id", "Similarity": "similarity"}`` produces
    ``Neighbor_1_ID ... Neighbor_k_Similarity``. Conditional
    aggregation (max-if) instead of .pivot() so column order and
    naming are fully deterministic.
    """
    aggs = []
    for j in range(1, k + 1):
        for suffix, src in value_cols.items():
            aggs.append(
                F.max(
                    F.when(F.col(rank_col) == j, F.col(src))
                ).alias(f"Neighbor_{j}_{suffix}")
            )
    return df.groupBy(query_col).agg(*aggs)


def sort_desc(df: DataFrame, column: str, tiebreak: list[str] | None = None) -> DataFrame:
    """O1: global sort descending (reference: app/main.py:270). A global
    sort is a range-partitioned shuffle — fine for result sets (pairs),
    wrong for table-scale data; keep it last in the plan."""
    order = [F.desc(column)] + [F.asc(c) for c in (tiebreak or [])]
    return df.orderBy(*order)


def first_last(df: DataFrame, order_col: str) -> DataFrame:
    """O3: first + last row by an explicit order (reference uses file
    order via iloc[0]/iloc[-1], app/fetech_jd.py:79-80; Spark has no
    file order, so the caller names the ordering column)."""
    lo = df.orderBy(F.asc(order_col)).limit(1)
    hi = df.orderBy(F.desc(order_col)).limit(1)
    return lo.union(hi)
