"""Analytic window-function family (SURVEY.md §2.5 extension).

The reference ranks neighbors per query row (app/evaluation.py:133-171)
— the only window shape it has. A full engine needs the rest of the
analytic family: running aggregates, ntile bucketing, distribution
ranks, and value-range (RANGE) frames. All of these execute in one
hash shuffle on the partition key followed by an in-partition sort —
no Python, no extra pass — so they scale exactly like the top-k
window that already ships.

Determinism contract (the oracle gate depends on it):
- every ordering passed in must be made unique by a tiebreaker
  column, EXCEPT for RANGE frames and rank-family functions, whose
  peer handling makes ties deterministic by definition;
- running money sums aggregate in DECIMAL (order-independent
  addition inside the frame) and project round(double, 4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def running_agg(
    df: DataFrame,
    partition: list[str],
    order: list[Column],
    value: Column,
    out_col: str = "running_value",
) -> DataFrame:
    """Cumulative aggregate over an explicit ROWS frame.

    ROWS (not the default RANGE) so Spark and any SQL twin agree on
    peer rows; the caller's ``order`` must be unique per partition.
    """
    w = (
        Window.partitionBy(*partition)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(value).over(w))


def ntile_buckets(
    df: DataFrame,
    partition: list[str],
    order: list[Column],
    n: int,
    out_col: str = "bucket",
) -> DataFrame:
    """ntile(n): equal-height buckets per partition (first buckets take
    the remainder rows — the standard SQL semantics both Spark and
    DuckDB implement). Unique order required for determinism."""
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn(out_col, F.ntile(n).over(w))


def rank_stats(
    df: DataFrame,
    partition: list[str],
    order: list[Column],
) -> DataFrame:
    """Distribution ranks: percent_rank ((rank-1)/(n-1)) and cume_dist
    (peers≤current / n). Both are tie-stable — peers share a value —
    so no tiebreaker is needed; the ratios are exact small-integer
    divisions and bit-identical across engines."""
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn("pct_rank", F.percent_rank().over(w)).withColumn(
        "cume_dist", F.cume_dist().over(w)
    )


def range_frame_agg(
    df: DataFrame,
    partition: list[str],
    order_key: Column,
    value: Column,
    preceding: int,
    out_col: str = "range_value",
) -> DataFrame:
    """Sliding RANGE frame over a numeric order key: for each row, the
    aggregate of all rows whose key lies in [key − preceding, key].

    RANGE (value-based) frames are tie-deterministic — all peer rows
    join the frame — which makes them the right tool for event-time
    rolling windows where timestamps can collide. For time windows,
    pass an integer epoch (e.g. ``unix_micros(ts)``) as ``order_key``
    and the window width in the same unit; integer bounds sidestep
    engine-specific interval arithmetic.
    """
    w = (
        Window.partitionBy(*partition)
        .orderBy(order_key)
        .rangeBetween(-preceding, 0)
    )
    return df.withColumn(out_col, F.sum(value).over(w))
