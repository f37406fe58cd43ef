"""J1 — the flagship k-NN similarity self-join, exact tier
(SURVEY.md §2.3 J1, §2.9 V5), plus the duplicate-pair post-processing
chain (P5/P6/P7 filters, D2 canonical dedup).

Reference semantics (app/vector_search.py:143-205 + app/main.py:226-263):
every row is joined to its k nearest neighbors by L2 over unit
embeddings (row 0 = self), distances become cosine, pairs below the
threshold drop, surviving pairs are canonicalized (id1 < id2) and
deduplicated, sorted by similarity descending.

Exact tier = crossJoin + window top-k. O(n²) compute but shuffle-light:
the small side is broadcast block-wise. This is the ORACLE path (DuckDB
can mirror it); the scale path is operators/ann.py (LSH bucketing) —
same output contract, verified against this tier by recall tests.

Scale design (100 TB): never materialize the full n² pair set. The
window's rank filter is applied in the same stage as the distance
computation (WindowGroupLimit pushes k into the per-partition sort);
with B broadcast blocks the peak per-task state is |block| × k rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import vectors as V


def knn_join(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 1,
    include_self: bool = False,
    right: DataFrame | None = None,
) -> DataFrame:
    """Exact k-NN join: for each left row, the k most-cosine-similar
    right rows. ``right=None`` → self-join. Output:
    (query_id, neighbor_id, similarity(double)) with rank 1..k.

    P6 self-match skip (app/main.py:248) via include_self=False;
    ties broken by neighbor id (deterministic, oracle-matchable).
    """
    left = df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    rhs = (right if right is not None else df).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv")
    )
    pairs = left.crossJoin(rhs)
    if not include_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        V.dot_cosine("__qv", "__nv").alias("similarity"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("similarity"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def similarity_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.90,
    round_digits: int = 4,
) -> DataFrame:
    """Flagship: all duplicate pairs at cosine ≥ threshold
    (reference: app/main.py:226-272 chain).

    Because a pair (a,b) with sim ≥ τ is found whether we rank
    neighbors or not, the set-semantics form skips the window
    entirely: enumerate each unordered pair ONCE via id1 < id2
    (D2 canonicalization, app/main.py:253-263 — reference emits each
    pair once via the processed_pairs set), filter on the threshold
    (P5, app/main.py:252), sort descending (O1, :270).

    The id1 < id2 predicate halves the crossJoin output vs the
    reference's search-then-canonicalize; no shuffle until the final
    orderBy of the (small) result.
    """
    a = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("__v1"))
    b = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("__v2"))
    return (
        a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.round(V.dot_cosine("__v1", "__v2"), round_digits).alias("similarity"),
        )
        .filter(F.col("similarity") >= threshold)
        .orderBy(F.desc("similarity"), F.asc("id1"), F.asc("id2"))
    )


def canonicalize_pairs(
    df: DataFrame, a: str, b: str, keep: list[str] | None = None
) -> DataFrame:
    """D2 standalone: (least, greatest) + distinct
    (reference: app/main.py:253-263). String or numeric ids."""
    lo, hi = F.least(F.col(a), F.col(b)), F.greatest(F.col(a), F.col(b))
    cols = [lo.alias("id1"), hi.alias("id2")] + [F.col(c) for c in (keep or [])]
    return df.select(*cols).dropDuplicates(["id1", "id2"])


def random_pair_baseline(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_pairs: int = 5000,
    seed: int = 42,
) -> DataFrame:
    """J3: sampled non-duplicate pair population
    (reference: app/evaluation.py:182-199, 5000 random pairs) — the
    statistical baseline that justified the 0.90 threshold.

    Seeded rand-keyed pairing: deterministic under a fixed seed and
    partitioning; O(n) not O(n²).
    """
    keyed = df.select(
        F.col(id_col).alias("pid"), F.col(vec_col).alias("vec")
    ).withColumn("rk", F.row_number().over(Window.orderBy(F.rand(seed))))
    n = keyed.count()
    half = n // 2
    left = keyed.filter(F.col("rk") <= half)
    right = keyed.filter(F.col("rk") > half).withColumn(
        "rk", F.col("rk") - half
    )
    return (
        left.alias("a")
        .join(right.alias("b"), "rk")
        .limit(n_pairs)
        .select(
            F.col("a.pid").alias("id1"),
            F.col("b.pid").alias("id2"),
            F.round(V.dot_cosine(F.col("a.vec"), F.col("b.vec")), 4).alias(
                "similarity"
            ),
        )
    )


def similarity_histogram(
    df: DataFrame, sim_col: str = "similarity", bins: int = 20
) -> DataFrame:
    """S8 (engine half): fixed-width histogram of a similarity
    population (reference renders with seaborn at
    app/evaluation.py:201-232; the aggregation belongs in the engine,
    rendering on the driver). Bin i covers [i/bins, (i+1)/bins)."""
    c = F.col(sim_col)
    bin_idx = F.least(
        F.floor(c * bins).cast("int"), F.lit(bins - 1)
    ).alias("bin")
    return (
        df.select(bin_idx)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bin")
    )
