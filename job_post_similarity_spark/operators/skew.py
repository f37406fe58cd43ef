"""Skew mitigation utilities: salted join + salted aggregation.

AQE's skew-join splitting (on in session defaults) handles most skew
at runtime by splitting oversized sort-merge partitions. These
explicit salting operators are the belt-and-braces tier for EXTREME
hot keys (one key ≫ one executor's memory) or for hash joins AQE
can't split:

- ``salted_join``: left rows get a random salt in [0, buckets); the
  right side is exploded ×buckets so every (key, salt) bucket can
  co-locate. Hot-key rows fan across ``buckets`` tasks instead of one.
- ``salted_distinct_count``: two-stage distinct count — partial
  distinct per (key, salt), merge per key — bounds per-task state for
  keys whose distinct-value set would blow one task's hash table.

Both are semantics-preserving (property-tested equal to the unsalted
plan); cost is the ×buckets duplication of the right side / an extra
shuffle stage, which is why they're opt-in per hot relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    buckets: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Inner equi-join on ``on`` with the left (skewed) side salted.

    Output columns = left columns + right non-key columns (Spark's
    ``join(on=str)`` contract). ``buckets`` bounds the per-task share
    of any hot key at 1/buckets of its rows.
    """
    salt = F.floor(F.rand(seed) * buckets).cast("int")
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return l_salted.join(r_salted, [on, "__salt"]).drop("__salt")


def salted_distinct_count(
    df: DataFrame,
    key: str,
    value: str,
    buckets: int = 8,
) -> DataFrame:
    """countDistinct(value) per key via two-stage salting.

    Stage 1 dedups (key, salt-of-value, value) partially; stage 2 sums
    partial distinct counts. The salt is derived from the VALUE hash
    (deterministic), so equal values land in the same bucket and the
    two-stage count is exact.
    """
    salted = df.select(
        F.col(key), F.col(value), (F.pmod(F.xxhash64(F.col(value)), F.lit(buckets))).alias("__salt")
    )
    partial = (
        salted.groupBy(key, "__salt")
        .agg(F.countDistinct(value).alias("__partial"))
    )
    return (
        partial.groupBy(key)
        .agg(F.sum("__partial").alias("distinct_count"))
    )


def skew_profile(df: DataFrame, key_col: str, top_n: int = 5) -> DataFrame:
    """Key-distribution diagnostics that drive the salting decision:
    one row with key cardinality, total rows, the hottest key's count,
    the top-``top_n`` keys' combined count, and the Gini coefficient
    of the per-key counts in integer millionths.

    Gini here is the exact discrete form over per-key counts sorted
    ascending (ties broken by key for determinism):
    ``G = (2·Σ i·c_i) / (n·Σc) − (n+1)/n``. The Σ i·c_i accumulates
    as exact integers; only the final ratio touches doubles, so the
    number is engine-exact. Everything is two hash aggregates over
    (key → count) — the profile costs one pass however large the
    table; run it BEFORE choosing join strategies (a gini near 1 or a
    max_cnt ≫ total/n_keys says: salt or broadcast).
    """
    from .windows import global_rank_with_total

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    # ONE two-phase ranking: ascending rank i feeds the Gini Σ i·c_i
    # term directly, and the top-N mass cut reuses it as
    # i > n_keys − top_n (the reversal of the ascending total order;
    # boundary TIES may pick different keys than a (cnt desc, key
    # asc) rank would, but tied keys carry equal cnt, so the summed
    # mass is identical). Key cardinality can be corpus-scale (user
    # ids) — the single-partition Window.orderBy this replaces was a
    # real bottleneck, and a second ranking pass for the descending
    # rank would double the range shuffle for a sum that the total
    # (already known from the offsets job) derives for free.
    ranked, n_keys = global_rank_with_total(
        counts, [F.asc("cnt"), F.asc(key_col)], out_col="i"
    )
    ranked = ranked.withColumn(
        "j", (F.lit(n_keys).cast("long") + 1 - F.col("i")).cast("long")
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
        F.sum(
            F.when(F.col("j") <= top_n, F.col("cnt")).otherwise(F.lit(0))
        ).alias(f"top{top_n}_cnt"),
        F.round(
            (
                2.0 * F.sum(F.col("i").cast("long") * F.col("cnt")).cast(
                    "double"
                )
                / (
                    F.count(F.lit(1)).cast("double")
                    * F.sum("cnt").cast("double")
                )
                - (F.count(F.lit(1)).cast("double") + 1.0)
                / F.count(F.lit(1)).cast("double")
            )
            * F.lit(1e6),
            0,
        )
        .cast("long")
        .alias("gini6"),
    )
