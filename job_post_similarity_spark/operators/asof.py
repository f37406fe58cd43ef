"""As-of (temporal) join — the classic operator the DataFrame API
lacks as a primitive, composed from a union + window (no UDF, one
shuffle).

For each left row, attach the most recent right row with
``right.ts <= left.ts`` on the same key (backward as-of; the
market-data / slowly-changing-dimension join).

Plan shape: tag both sides, union, window ``last(right value) over
(partition by key order by ts, side)`` with ``rows unbounded
preceding`` — a single hash partition by key, one sort, no join
explosion. At 100 TB this beats the naive range-join formulation
(which Spark would plan as a broadcast-nested-loop or a huge range
shuffle): state per task is one running value per key.

DuckDB mirrors it natively (``ASOF JOIN``), which keeps the operator
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: left rows enriched with the latest right
    ``value_cols`` at or before their timestamp (null when no right
    row precedes).

    Both inputs must carry ``key`` and ``ts``; left keeps all its
    columns. Right-side ties on ts: the last one wins (deterministic
    if (key, ts) is unique on the right — enforce upstream).
    """
    lcols = left.columns
    l_tagged = left.select(
        *lcols, F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols],
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in (key, ts)
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )

    unioned = l_tagged.unionByName(r_tagged)
    # right rows (side 0) sort before left rows at equal ts, so a left
    # row sees right values up to AND INCLUDING its own timestamp
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
