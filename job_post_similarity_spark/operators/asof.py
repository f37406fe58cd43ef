"""Temporal joins the DataFrame API lacks as primitives: backward
as-of (union + window, no UDF, one shuffle) and interval containment
(time-chunk bucketed equi-join, no nested loop).

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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join (the pandas ``merge_asof`` surface): left rows
    enriched with the nearest right ``value_cols`` — the latest at or
    before their timestamp (``direction='backward'``, default) or the
    earliest at or after it (``'forward'``); null when no right row
    qualifies. ``tolerance_seconds`` bounds the match's time gap:
    a matched right row further away is treated as no match (the
    whole struct nulls atomically, same as an unmatched row).

    Both inputs must carry ``key`` and ``ts``; left keeps all its
    columns. Right-side ties on ts: backward takes the last,
    forward the first (deterministic if (key, ts) is unique on the
    right — enforce upstream).

    Plan shape is direction-independent: tag, union, one running
    ``last(struct) over (partition by key order by ±ts)`` — forward
    is the same window over the REVERSED time order, so both
    directions cost one shuffle and one sort, never a range join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    lcols = left.columns
    # ONE struct carries all value_cols (plus the matched right ts,
    # for the tolerance check): the matched right row wins or loses
    # atomically. Per-column last(c, ignorenulls) would (a) backfill
    # a NULL value from an OLDER right row and (b) mix columns from
    # different right rows — both diverge from ASOF JOIN semantics.
    ts_type = right.schema[ts].dataType.simpleString()
    r_struct_type = (
        "struct<"
        + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
        )
        + f",__rts:{ts_type}>"
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
        F.struct(
            *[F.col(c).alias(c) for c in value_cols],
            F.col(ts).alias("__rts"),
        ).alias("__r"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    # right rows (side 0) sort before left rows at equal ts under both
    # directions, so a left row sees right values up to AND INCLUDING
    # its own timestamp
    order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(key)
        .orderBy(order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        F.last("__r", ignorenulls=True).over(w).alias("__rlast"),
    )
    matched = F.col("__rlast")
    if tolerance_seconds is not None:
        gap = (
            F.unix_micros(F.col(ts))
            - F.unix_micros(F.col("__rlast.__rts"))
        ) / F.lit(1e6)
        if direction == "forward":
            gap = -gap
        matched = F.when(gap <= F.lit(float(tolerance_seconds)), matched)
    return filled.filter(F.col("__side") == 1).select(
        *lcols,
        *[matched[c].alias(f"{c}{suffix}") for c in value_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    chunk: int = 3_600_000_000,
) -> DataFrame:
    """Interval-containment join: each left row paired with every
    right interval of the same key satisfying ``start <= ts <= end``
    (event-to-session, trade-to-auction-window — the range join next
    to the as-of join above). Timestamps are int64 epoch units (µs by
    default; ``chunk`` is the bucket width in the same unit).

    Spark plans a raw ``BETWEEN`` theta join as a broadcast nested
    loop (or a full cartesian per key) — quadratic per key. This
    rewrites it as an EQUI-join on (key, time_chunk): left rows carry
    their single chunk, right intervals explode to the chunks they
    span, candidates meet only inside a chunk, and the exact BETWEEN
    predicate filters. A (left, right) pair can only meet in the
    left row's one chunk, so no post-join dedup is needed. Shuffle is
    keyed by (key, chunk); fan-out per task is bounded by interval
    density per chunk — pick ``chunk`` near the typical interval
    length so most intervals span 1-2 chunks.
    """
    # integer `div`, not double division: epoch values at exact chunk
    # boundaries must not float-round into the neighboring chunk
    lc = left.withColumn("__chunk", F.expr(f"`{ts}` div {chunk}"))
    rc = right.withColumn(
        "__chunk",
        F.explode(
            F.sequence(
                F.expr(f"`{start}` div {chunk}"),
                F.expr(f"`{end}` div {chunk}"),
            )
        ),
    )
    return (
        lc.join(rc, [key, "__chunk"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("__chunk")
    )
