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
    # ONE struct carries all value_cols: the matched right row wins or
    # loses atomically. Per-column last(c, ignorenulls) would (a)
    # backfill a NULL value from an OLDER right row and (b) mix columns
    # from different right rows — both diverge from ASOF JOIN semantics.
    r_struct_type = (
        "struct<"
        + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
        )
        + ">"
    )
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in (key, ts)
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__r"),
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
        F.last("__r", ignorenulls=True).over(w).alias("__rlast"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col(f"__rlast.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
