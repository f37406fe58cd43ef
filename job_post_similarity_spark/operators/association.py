"""Market-basket association mining over basket-shaped fact tables.

Beyond-reference analytics surface (the reference engine at
/root/reference has no co-occurrence operator; this complements
``text_analysis.pmi_collocations``, which scores token ADJACENCY —
here the unit is an unordered basket and the score is lift).

Cross-engine determinism policy: lift is emitted in integer parts-
per-million with the floor division OUTSIDE the distributed
aggregates (the PageRank/PMI policy) — counts are exact integers at
any parallelism, so the ppm value is bit-identical on any engine.

Scale shape: one DISTINCT shuffle to the (basket, item) grain, one
item-support aggregate, a per-basket self-join keyed on the basket id
(pair blow-up is bounded by basket size squared, never corpus size),
one pair aggregate, and a TakeOrdered top-N — no cartesian, no
driver-side loops. At 100 TB the support join shuffles on the item
key; skewed hot items route through AQE skew-join like any other key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..caching import cache_auto

PPM = 1_000_000


def basket_pair_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    top_n: int = 50,
) -> DataFrame:
    """Pairwise item co-occurrence with support and lift.

    Output: ``(item_a, item_b, pair_count, lift_ppm)`` with
    ``item_a < item_b``, ranked by (pair_count desc, lift_ppm desc,
    item_a asc, item_b asc), top-N.

    ``lift_ppm = (PPM * n_baskets * pair_count) div
    (count_a * count_b)`` — the classic lift
    P(a,b) / (P(a) P(b)) scaled to integer ppm. All factors are
    exact 64-bit counts; the single floor division happens after the
    aggregates, so the result is engine- and parallelism-exact.

    ``n_baskets`` is one ``count()`` scalar — the same one-action
    price the lift definition itself demands (same pattern as
    ``tf_idf_top_terms``'s document count).
    """
    from .graph import group_pair_counts

    bi = (
        df.select(
            F.col(basket_col).alias("__g"), F.col(item_col).alias("__n")
        )
        .filter(F.col("__n").isNotNull() & F.col("__g").isNotNull())
        .distinct()
        # basket-key layout BEFORE the persist: the pair self-join's
        # children then read the cache's __g partitioning and plan no
        # further exchanges, and the n_baskets distinct reuses it too
        # (the SRP-signature cache-layout trick; measured 2.4 → 1.9 s
        # at sf0.1)
        .repartition("__g")
        .transform(cache_auto)
    )
    n_baskets = bi.select("__g").distinct().count()
    support = bi.groupBy("__n").agg(F.count(F.lit(1)).alias("__cnt"))

    # pair-count core shared with graph.cooccurrence_edges — one
    # blocking/counting implementation to keep in sync, not two
    pairs = (
        group_pair_counts(bi)
        .select(
            F.col("src").alias("item_a"),
            F.col("dst").alias("item_b"),
            F.col("weight").alias("pair_count"),
        )
        .filter(F.col("pair_count") >= min_pair_count)
    )
    sa = support.select(
        F.col("__n").alias("item_a"), F.col("__cnt").alias("__ca")
    )
    sb = support.select(
        F.col("__n").alias("item_b"), F.col("__cnt").alias("__cb")
    )
    scored = (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .select(
            "item_a",
            "item_b",
            "pair_count",
            F.expr(
                f"({PPM}L * {n_baskets}L * pair_count)"
                " div (__ca * __cb)"
            ).alias("lift_ppm"),
        )
    )
    return scored.orderBy(
        F.desc("pair_count"),
        F.desc("lift_ppm"),
        F.asc("item_a"),
        F.asc("item_b"),
    ).limit(top_n)
