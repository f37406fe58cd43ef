"""Gap-based sessionization — the canonical custom stateful operator
(beyond the reference's batch surface; SURVEY.md §7 stretch / the
training-data-pipeline family).

Batch tier: pure window functions — lag → gap flag → running sum →
group. One shuffle on the user key; the window and the aggregation
share it (same partitioning), so Catalyst plans a single exchange.

Streaming tier lives in streaming.stream_ops.stream_sessionize
(applyInPandasWithState), property-tested equal to this batch tier on
bounded input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Split each user's event stream into sessions separated by gaps
    > gap_minutes. Returns (user, session_start_us, session_end_us,
    n_events) — microsecond epochs keep the output engine-agnostic.

    Scale shape: one hash partition per user key; running-sum window
    and final groupBy reuse the same partitioning (no second shuffle).
    Skewed power users are bounded by AQE skew handling; state per
    task is one window frame row.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    flagged = df.select(
        F.col(user_col),
        us.alias("__us"),
        F.when(prev.isNull() | ((us - prev) > gap_us), 1)
        .otherwise(0)
        .alias("__new_sess"),
    )
    sessed = flagged.withColumn(
        "__sess_idx",
        F.sum("__new_sess").over(
            Window.partitionBy(user_col)
            .orderBy("__us")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        sessed.groupBy(user_col, "__sess_idx")
        .agg(
            F.min("__us").alias("session_start_us"),
            F.max("__us").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(user_col, "session_start_us", "session_end_us", "n_events")
    )
