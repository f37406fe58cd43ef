"""Iterative graph analytics over edge DataFrames.

Connected components (the dedup-cluster labeler) lives in
``operators/dedup.py`` (min-label propagation + the large-star/
small-star O(log n)-round tier); this module adds PageRank — the
classic iterative-join workload — in INTEGER arithmetic so every
iteration is bit-exact across engines (parts-per-million rank units,
floor division; integer sums are order-independent, so no
float-summation drift between Spark's partial aggregates and any
oracle).

Scale shape per iteration: one equi-join of the (src, dst, outdeg)
edge table against the rank table on ``src`` and one hash aggregate
on ``dst`` — two Exchanges, both keyed on node ids, no driver-side
state. The edge+degree table is computed once and cached across
iterations; at 100 TB you'd pre-partition edges and ranks on the
node key so the join side of every iteration reuses one Exchange
(same pattern GraphX/Pregel uses for its routing table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_UNIT = 1_000_000  # one "probability" in ppm units


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_ppm: int = 850_000,
    every_node_receives: bool = False,
) -> DataFrame:
    """PageRank in integer ppm units: every node starts at
    ``RANK_UNIT``; each iteration a node emits ``pr div outdeg`` along
    each out-edge and collects ``(1 - d) + d * sum(in-contribs)``
    with damping ``d`` applied as ``(damping_ppm * s) div RANK_UNIT``.

    Returns ``(node, pr)``. Deterministic to the bit at any
    parallelism: the only non-associative op is floor division, which
    happens OUTSIDE the distributed sums.

    Dangling nodes (no out-edges) leak their mass — the standard
    simplification; feed symmetric edge pairs (as the bipartite
    builders do) when you need none.

    ``every_node_receives=True`` (safe exactly when every node has at
    least one IN-edge, e.g. any symmetric graph): skips the
    per-iteration left join against the node list — the contribution
    aggregate already yields one row per node — removing one join
    stage per iteration.
    """
    e_src = F.col(src).alias("src")
    e_dst = F.col(dst).alias("dst")
    ed = edges.select(e_src, e_dst)
    nodes = (
        ed.select(F.col("src").alias("node"))
        .union(ed.select(F.col("dst").alias("node")))
        .distinct()
        .persist()  # referenced in every iteration's rebuild join
    )
    deg = ed.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = ed.join(deg, "src").persist()
    try:
        base = RANK_UNIT - damping_ppm
        ranks = nodes.withColumn("pr", F.lit(RANK_UNIT).cast("long"))
        for _ in range(iterations):
            contribs = e.join(
                ranks.withColumnRenamed("node", "src"), "src"
            ).select(
                F.col("dst").alias("node"),
                F.expr("pr div outdeg").alias("__c"),
            )
            sums = contribs.groupBy("node").agg(F.sum("__c").alias("__s"))
            if not every_node_receives:
                sums = nodes.join(sums, "node", "left")
            ranks = sums.select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damping_ppm}L * coalesce(__s, 0L))"
                        f" div {RANK_UNIT}L"
                    )
                ).alias("pr"),
            )
        # materialize before unpersisting the edge table the lineage
        # still references
        ranks = ranks.localCheckpoint(eager=True)
    finally:
        e.unpersist()
        nodes.unpersist()
    return ranks


def bipartite_edges(
    df: DataFrame, left_key: str, right_key: str, prefixes: tuple[str, str]
) -> DataFrame:
    """Symmetric (src, dst) edge list from a relation table: each
    distinct ``(left_key, right_key)`` pair becomes two directed
    edges, node ids prefixed so the two key spaces cannot collide."""
    lp, rp = prefixes
    pairs = df.select(
        F.concat(F.lit(lp), F.col(left_key).cast("string")).alias("a"),
        F.concat(F.lit(rp), F.col(right_key).cast("string")).alias("b"),
    ).distinct()
    fwd = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    rev = pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    return fwd.union(rev)
