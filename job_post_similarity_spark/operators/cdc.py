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
