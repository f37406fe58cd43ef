"""Changelog → table maintenance: MERGE upsert and SCD Type 2 —
the two batch-CDC shapes a training-data warehouse runs nightly
(`keep_latest` in operators/preprocess.py is the row-compaction
third sibling; `streaming/stream_ops.py stream_keep_latest` its
incremental twin).

Both operators are pure DataFrame compositions (no UDF, nothing
driver-side) and shuffle exactly once on the natural key:

- ``merge_upsert``: MERGE INTO semantics on immutable snapshots —
  matched rows replaced, unmatched source rows inserted, tombstones
  deleted. One left-anti join on the key plus a union; at 100 TB the
  target side streams through a single hash join (broadcast when the
  changelog is small, which is the common nightly case — let AQE
  decide).
- ``scd2_build``: collapse an event changelog into validity ranges
  (one row per consecutive run of an attribute value, with
  ``valid_from``/``valid_to``/``is_current``). Lag + running-sum
  windows and the final aggregate all share one hash partitioning on
  the entity key, so Spark plans a single Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE INTO target USING source ON target.key = source.key
    WHEN MATCHED [AND source.delete_col] THEN DELETE
    WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT * —
    evaluated as a snapshot transform over immutable DataFrames.

    ``source`` must carry every target column (full-row upserts, the
    Delta-style ``updateAll``/``insertAll`` shape) plus optionally a
    boolean ``delete_col`` marking tombstones. ``key`` must be unique
    per side (changelogs should be pre-compacted with
    ``preprocess.keep_latest``). Tombstones for absent keys are no-ops.
    """
    tcols = target.columns
    if delete_col is not None:
        deletes = source.filter(F.col(delete_col))
        upserts = source.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).select(*tcols)
        gone = upserts.select(key).union(deletes.select(key))
    else:
        upserts = source.select(*tcols)
        gone = upserts.select(key)
    return target.join(gone, key, "left_anti").unionByName(upserts)


def scd2_build(
    changelog: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Build a Type-2 slowly-changing dimension from an event
    changelog: one row per consecutive run of ``attr`` per ``key``,
    with integer-epoch validity bounds.

    Returns ``(key, attr, valid_from_us, valid_to_us, is_current,
    n_events)``: ``valid_from_us`` is the run's first event time,
    ``valid_to_us`` the next run's start (NULL on the open/current
    run), ``n_events`` the run length. Ordering inside a key is
    ``(ts, tiebreak)`` so equal timestamps resolve deterministically.

    Gaps-and-islands via lag + running change-count — the same
    single-Exchange pattern as ``dedup.substring_dup_spans``.
    """
    e = (
        changelog.filter(F.col(key).isNotNull() & F.col(ts).isNotNull())
        .select(
            key,
            attr,
            (F.unix_micros(F.col(ts))).alias("__ts_us"),
            F.col(tiebreak).alias("__tb"),
        )
    )
    w = Window.partitionBy(key).orderBy("__ts_us", "__tb")
    runs = (
        e.withColumn(
            "__chg",
            F.when(
                F.lag(attr).over(w).isNull()
                | (F.lag(attr).over(w) != F.col(attr)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "__run",
            F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(key, "__run")
        .agg(
            F.min(attr).alias(attr),  # constant within a run
            F.min("__ts_us").alias("valid_from_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w2 = Window.partitionBy(key).orderBy("valid_from_us")
    return (
        runs.withColumn(
            "valid_to_us", F.lead("valid_from_us").over(w2)
        )
        .withColumn("is_current", F.col("valid_to_us").isNull())
        .select(
            key, attr, "valid_from_us", "valid_to_us", "is_current", "n_events"
        )
    )


# Merge rule per algebraic aggregate: how two partials combine.
_MERGE_FN = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
_PARTIAL_FN = {
    "count": lambda c: F.count(F.lit(1)),
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def partial_agg(
    df: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """One batch's partial aggregate in the mergeable-summary schema:
    ``measures`` maps output column → ``(fn, source_col)`` with fn in
    count/sum/min/max — the ALGEBRAIC aggregates, whose partials
    combine associatively (avg/stddev derive from sum+count; medians
    don't merge — use a t-digest sketch column for those)."""
    aggs = []
    for out, (fn, col) in measures.items():
        if fn not in _PARTIAL_FN:
            raise ValueError(f"non-mergeable aggregate: {fn}")
        aggs.append(_PARTIAL_FN[fn](col).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def incremental_agg(
    summary: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: fold a new
    batch into a maintained summary WITHOUT rescanning history — the
    pattern that keeps a 100 TB fact table's rollup fresh at the cost
    of the delta, not the archive. ``summary`` must have been built
    by ``partial_agg`` (or a previous ``incremental_agg``) with the
    same keys/measures; ``delta`` is raw fact rows.

    Shape: aggregate the delta (small), union with the summary
    (|groups|-sized, not |rows|-sized), and re-combine with each
    measure's MERGE function (count partials merge by sum, sum by
    sum, min by min, max by max). Associativity of the algebraic
    aggregates is what makes the result exactly equal a full rescan
    — asserted by the oracle gate. One shuffle, keyed on the group.

    For sums over floats, feed a DECIMAL-cast column so the partial
    and the rescan agree bit-for-bit at any fold order (the repo's
    order-independent-aggregation policy).
    """
    dp = partial_agg(delta, keys, measures)
    merged_aggs = []
    for out, (fn, _col) in measures.items():
        merged_aggs.append(_MERGE_FN[fn](out).alias(out))
    return summary.unionByName(dp).groupBy(*keys).agg(*merged_aggs)


def scd2_lookup(
    dim: DataFrame,
    facts: DataFrame,
    key: str,
    ts: str,
    attr: str = "attr",
) -> DataFrame:
    """Point-in-time dimension lookup: resolve each fact row's
    ``attr`` value AS OF its timestamp against an ``scd2_build``
    dimension (``valid_from_us <= ts < valid_to_us``; the open
    current run has NULL valid_to). The query every Type-2 dimension
    exists to answer.

    Plan shape: NOT a range join — the validity ranges per key are
    disjoint by construction, so the as-of semantics reduce to
    "latest valid_from at or before ts", which is exactly the
    backward as-of union+window plan (one shuffle). The range bound
    is then a residual check: a fact BEFORE the key's first version
    gets NULL.

    Output: the fact rows plus ``{attr}_asof``.
    """
    from .asof import asof_join

    d = dim.select(
        F.col(key),
        F.col("valid_from_us"),
        F.col(attr),
    ).withColumn(
        "__dts",
        F.timestamp_micros(F.col("valid_from_us")),
    ).drop("valid_from_us")
    f = facts.withColumn("__dts", F.col(ts))
    out = asof_join(
        f, d, key, "__dts", [attr], suffix="_asof"
    )
    return out.drop("__dts")
