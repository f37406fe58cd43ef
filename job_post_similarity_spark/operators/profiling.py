"""Profiling / EDA aggregates (SURVEY.md §2.4, A1-A6).

The reference's pandas EDA surface (value_counts / isnull().sum() /
nunique / describe / duplicated — app/EDA_proprocess.ipynb cells 6-15)
as single-pass Spark aggregations. All of these are partial+final hash
aggregates: map-side combine means the shuffle carries one row per
(group × partition), never the data — the 100 TB-safe shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..caching import cache_auto


def group_count_topn(df: DataFrame, column: str, n: int = 20) -> DataFrame:
    """A1: value_counts().head(n) (notebook cell 13). Deterministic
    tiebreak on the group key so top-N is stable."""
    return (
        df.groupBy(column)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(column))
        .limit(n)
    )


def null_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """A2: per-column null count + percentage (notebook cells 6, 9).
    One pass over the table; emits one row per column (unpivoted so the
    result schema is stable regardless of column count)."""
    cols = columns or df.columns
    aggs = [
        F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls") for c in cols
    ] + [F.count(F.lit(1)).alias("__total")]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', `{c}__nulls`" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as (column_name, null_count)",
        "__total as total_count",
    ).select(
        "column_name",
        "null_count",
        F.round(F.col("null_count") * 100.0 / F.col("total_count"), 4).alias(
            "null_pct"
        ),
    )


def distinct_counts(df: DataFrame, columns: list[str]) -> DataFrame:
    """A3: nunique per column (notebook cell 7). Exact count_distinct;
    swap in approx_count_distinct at the 100 TB tier when ±2% is fine
    (HLL sketch, no shuffle of distinct values)."""
    return df.agg(
        *[F.countDistinct(c).alias(f"{c}_distinct") for c in columns],
        F.count(F.lit(1)).alias("row_count"),
    )


def summary_stats(df: DataFrame, column: str, approx: bool = False) -> DataFrame:
    """A4: describe() for one numeric column (notebook cell 15):
    count/mean/min/quartiles/max.

    ``approx=True`` switches quartiles to percentile_approx (t-digest
    sketch, mergeable map-side — the 100 TB tier: exact percentile
    sorts every partition's values; the sketch is O(1) memory and one
    pass). Accuracy 1/accuracy-bounded; test asserts <1% drift on the
    fixtures."""
    c = F.col(column)
    if approx:
        q = F.percentile_approx(c, [0.25, 0.5, 0.75], 10_000)
        return df.agg(
            F.count(c).alias("cnt"),
            F.round(F.avg(c), 4).alias("mean"),
            F.min(c).alias("min"),
            F.element_at(q, 1).alias("p25"),
            F.element_at(q, 2).alias("p50"),
            F.element_at(q, 3).alias("p75"),
            F.max(c).alias("max"),
        )
    return df.agg(
        F.count(c).alias("cnt"),
        F.round(F.avg(c), 4).alias("mean"),
        F.min(c).alias("min"),
        F.percentile(c, 0.25).alias("p25"),
        F.percentile(c, 0.5).alias("p50"),
        F.percentile(c, 0.75).alias("p75"),
        F.max(c).alias("max"),
    )


def approx_distinct_counts(
    df: DataFrame, columns: list[str], rsd: float = 0.02
) -> DataFrame:
    """A3's 100 TB tier: HLL++ ``approx_count_distinct`` per column.

    Exact ``countDistinct`` re-shuffles every distinct VALUE (Spark
    plans it as an Expand + two aggregates — n_cols× the scan in
    flight); the sketch aggregate carries a fixed few-KB state per
    column per partition and merges map-side, so the shuffle is one
    row per partition no matter the cardinality. ``rsd`` is the
    target relative standard deviation (HLL++, Heule et al. 2013).
    """
    return df.agg(
        *[
            F.approx_count_distinct(c, rsd).alias(f"{c}_approx_distinct")
            for c in columns
        ],
        F.count(F.lit(1)).alias("row_count"),
    )


def hll_distinct_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """MERGEABLE-sketch cardinality profile (Apache DataSketches HLL,
    Spark 3.5+): one binary sketch per group, then the global estimate
    is re-aggregated from the per-group sketches with
    ``hll_union_agg`` — never touching the data again.

    That mergeability is the whole point at 100 TB: per-day /
    per-slice sketches persist as ~KB binaries, and any rollup
    (week, month, all-time) is a union of sketches instead of a
    re-scan. Output: one row per group plus a ``group_value = NULL``
    total row, ``approx_distinct`` from ``hll_sketch_estimate``.
    """
    per_group = df.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col, lg_k).alias("__sk")
    )
    groups = per_group.select(
        F.col(group_col).cast("string").alias("group_value"),
        F.hll_sketch_estimate("__sk").alias("approx_distinct"),
    )
    total = (
        per_group.agg(F.hll_union_agg("__sk").alias("__u"))
        .select(
            F.lit(None).cast("string").alias("group_value"),
            F.hll_sketch_estimate("__u").alias("approx_distinct"),
        )
    )
    return groups.unionByName(total)


def quantile_profile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: list[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    approx: bool = False,
) -> DataFrame:
    """Grouped percentile profile: one row per group with a column per
    requested percentile (linear-interpolated continuous percentile,
    the describe()-style default).

    ``approx=True`` swaps in ``percentile_approx`` — the 100 TB tier:
    exact percentile materializes and sorts every group's values,
    while the t-digest sketch is fixed-memory and merges map-side, so
    the shuffle carries one sketch per (group × partition).
    """
    c = F.col(value_col)
    ps = list(ps)
    if approx:
        arr = F.percentile_approx(c, ps, 10_000)
    else:
        arr = F.percentile(c, ps)
    tagged = [
        F.element_at(arr, i + 1).alias(f"p{int(p * 100):02d}")
        for i, p in enumerate(ps)
    ]
    return (
        df.groupBy(group_col)
        .agg(F.count(c).alias("cnt"), *tagged)
        .orderBy(group_col)
    )


def quantile_disc(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: list[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """Grouped PERCENTILE_DISC: the smallest actual data value whose
    cume_dist reaches each fraction — no interpolation, so the result
    is a value that exists in the data and is BIT-IDENTICAL across
    engines (continuous percentiles interpolate in engine-specific
    operation order; discrete ones only compare exact rationals k/n
    against the fraction).

    One window pass (cume_dist over the group) + one hash aggregate —
    same single-shuffle shape as the rest of the family.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(F.col(value_col))
    cd = df.withColumn("__cd", F.cume_dist().over(w))
    aggs = [
        F.min(F.when(F.col("__cd") >= p, F.col(value_col))).alias(
            f"p{int(p * 100):02d}_disc"
        )
        for p in ps
    ]
    return cd.groupBy(group_col).agg(*aggs).orderBy(group_col)


def duplicate_count(df: DataFrame, key: list[str]) -> DataFrame:
    """A5: df.duplicated().sum() on a key subset (notebook cell 11):
    total rows minus distinct keys."""
    return df.agg(
        (F.count(F.lit(1)) - F.countDistinct(*[F.col(k) for k in key])).alias(
            "duplicate_rows"
        )
    )


def cube_counts(
    df: DataFrame,
    dims: list[str],
    value_col: str | None = None,
) -> DataFrame:
    """OLAP CUBE aggregate: counts (and optionally a sum) for EVERY
    subset of ``dims``, subtotal rows marked by null dims — the
    all-margins companion of the rollup gate (which produces only the
    hierarchy's prefixes). One expand+aggregate plan: Spark's Expand
    emits 2^|dims| grouping-set rows map-side, then a single hash
    aggregation — no per-subset re-scan.
    """
    aggs = [F.count(F.lit(1)).alias("cnt")]
    if value_col is not None:
        # DECIMAL sum internally (order-independent), double out —
        # the engine-wide driver-hash-safe aggregation policy
        aggs.append(
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double"), 4
            ).alias(f"sum_{value_col}")
        )
    return (
        df.cube(*[F.col(d) for d in dims])
        .agg(*aggs)
        .orderBy(*[F.col(d).asc_nulls_first() for d in dims])
    )


def heavy_hitters(
    df: DataFrame,
    column: str,
    min_share: float = 0.001,
    capacity: int | None = None,
) -> DataFrame:
    """Frequent-items (heavy hitters) with EXACT final counts: every
    value whose frequency is at least ``min_share`` of the non-null
    rows, found without ever shuffling the full value column.

    Two stages:
    1. A Misra-Gries summary per partition (mapInPandas, batch
       ``value_counts`` merged under a bounded dictionary; on
       overflow the (capacity+1)-th largest count is subtracted from
       every entry — each such round removes >= capacity+1 units of
       mass per surviving slot, so a partition's total decrement is
       <= n_p/(capacity+1)). Any value with global count
       N*min_share > N/(capacity+1) therefore survives in at least
       one partition's summary (pigeonhole over partitions) —
       candidates are a SUPERSET of the true heavy hitters.
    2. Exact counting of candidates only: a broadcast semi-join
       prunes the column to candidate values BEFORE the groupBy, so
       the count shuffle carries candidate rows only.

    The output is exact (stage 2 recounts precisely and applies the
    threshold), so it admits a plain GROUP BY / HAVING oracle. At
    100 TB the full-shuffle groupBy alternative moves the whole
    column; this moves <= capacity values per partition plus the
    candidate rows. Nulls are excluded (pandas value_counts and a
    SQL GROUP BY disagree on null groups; excluding matches the
    frequent-items definition). Default capacity 4/min_share leaves
    a 4x margin between the MG guarantee and the threshold.
    """
    import math

    import pandas as pd

    cap = capacity if capacity is not None else int(math.ceil(4.0 / min_share))
    typ = df.schema[column].dataType.simpleString()
    # persist: src feeds THREE consumers (the MG candidate pass, the
    # total-count aggregate, the exact recount join) — unpersisted,
    # the upstream pipeline (often a tokenize+explode over the whole
    # corpus, via frequent_tokens) runs three times
    src = df.select(column).filter(F.col(column).isNotNull()).transform(cache_auto)

    def mg(batches):
        counts: dict = {}
        for pdf in batches:
            for val, c in pdf[column].value_counts().items():
                counts[val] = counts.get(val, 0) + int(c)
            if len(counts) > cap:
                import numpy as np

                vals = np.sort(
                    np.fromiter(counts.values(), dtype=np.int64)
                )
                d = int(vals[-(cap + 1)])
                counts = {k: v - d for k, v in counts.items() if v > d}
        if counts:
            yield pd.DataFrame({column: list(counts.keys())})

    cand = src.mapInPandas(mg, f"{column} {typ}").distinct()
    total = src.agg(F.count(F.lit(1)).alias("__total"))
    return (
        src.join(F.broadcast(cand), column, "left_semi")
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.lit(min_share) * F.col("__total")))
        .select(column, "cnt")
        .orderBy(F.desc("cnt"), F.asc(column))
    )


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed reconciliation of two snapshots (migration validation,
    replica drift detection): one row per differing key with status
    ``added`` (right only), ``removed`` (left only), or ``changed``
    (both sides, any compared column IS DISTINCT FROM its twin).
    Identical rows are dropped.

    No row hashing: comparisons are null-safe column equality, so the
    diff is engine-exact (a hash of stringified doubles would not
    be). One full-outer hash join on the key — the any-size path;
    at 100 TB pre-bucket both snapshots on the key (write_bucketed)
    and the join plans shuffle-free.
    """
    if compare_cols is None:
        compare_cols = [
            c for c in left.columns if c not in keys and c in right.columns
        ]
    l = left.select(
        *[F.col(k) for k in keys],
        F.struct(*compare_cols).alias("__lv"),
        F.lit(1).alias("__lp"),
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.struct(*compare_cols).alias("__rv"),
        F.lit(1).alias("__rp"),
    )
    j = l.join(r, keys, "full_outer")
    import functools

    changed = functools.reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"__lv.{c}").eqNullSafe(F.col(f"__rv.{c}"))
            for c in compare_cols
        ],
    )
    status = (
        F.when(F.col("__lp").isNull(), F.lit("added"))
        .when(F.col("__rp").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*keys, "status")
    )


def winsorize_by_group(
    df: DataFrame,
    key: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` to its group's
    [lo, hi] exact continuous percentiles — the outlier-taming step
    before scaling/featurization (complement of ``group_zscore``).

    One grouped percentile aggregate (tiny: one row per group,
    broadcast back onto the table — the table itself never shuffles),
    then a map-side clip. Percentile ↔ DuckDB ``quantile_cont``
    parity is established by the quantile gates. Null values pass
    through unclipped (greatest/least null-skipping differs across
    engines — don't rely on it; filter upstream if needed).
    """
    bounds = df.groupBy(key).agg(
        F.percentile(value_col, F.lit(lo)).alias("__blo"),
        F.percentile(value_col, F.lit(hi)).alias("__bhi"),
    )
    clipped = F.when(
        F.col(value_col).isNotNull(),
        F.least(
            F.greatest(F.col(value_col), F.col("__blo")), F.col("__bhi")
        ),
    )
    return (
        df.join(F.broadcast(bounds), key)
        .withColumn(f"{value_col}_w", clipped)
        .drop("__blo", "__bhi")
    )


def mad_outliers(
    df: DataFrame,
    key: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier flags: a row is an outlier when its
    absolute deviation from the group MEDIAN exceeds ``k`` times the
    group MAD (median absolute deviation) — the robust counterpart of
    ``group_zscore`` (mean/stddev break down under the very outliers
    being hunted; median/MAD have a 50% breakdown point).

    Adds ``__med``/``__mad``/``is_outlier`` columns. Exact medians via
    ``percentile`` (the ↔ DuckDB ``quantile_cont`` parity the quantile
    gates established); at 100 TB swap both aggregates to
    ``percentile_approx`` — the t-digest sketch is mergeable map-side
    and the flag tolerates sketch-width error by construction.

    Scale shape: the deviation table is persisted because it feeds
    both the MAD aggregate and the output (otherwise the scan + first
    join run twice); both grouped aggregates produce one tiny row per
    group, broadcast back — the fact table itself never shuffles.
    Comparison ``adev > k * mad`` is plain IEEE double arithmetic —
    bit-identical on any engine evaluating the same expression.
    """
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(key).isNotNull()
    )
    med = base.groupBy(key).agg(
        F.percentile(value_col, F.lit(0.5)).alias("__med")
    )
    dev = (
        base.join(F.broadcast(med), key)
        .withColumn("__adev", F.abs(F.col(value_col) - F.col("__med")))
        .transform(cache_auto)
    )
    mad = dev.groupBy(key).agg(
        F.percentile("__adev", F.lit(0.5)).alias("__mad")
    )
    return (
        dev.join(F.broadcast(mad), key)
        .withColumn(
            "is_outlier", F.col("__adev") > F.lit(float(k)) * F.col("__mad")
        )
        .drop("__adev")
    )


def referential_profile(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Referential-integrity profile between a fact table and its
    dimension — the data-quality check a warehouse runs per load:
    orphaned children (fk with no parent) and childless parents.
    One summary row: ``(n_child, n_orphans, n_parents,
    n_childless)`` — all exact counts.

    Shape: two left-anti joins on the key (AQE broadcasts the
    smaller side) + one row of counts; nothing driver-side beyond
    the final aggregate.
    """
    ck = child.select(F.col(child_key).alias("__k"))
    pk = parent.select(F.col(parent_key).alias("__k")).distinct()
    orphans = ck.join(pk, "__k", "left_anti")
    childless = pk.join(ck.distinct(), "__k", "left_anti")
    n_child = ck.agg(F.count(F.lit(1)).alias("n")).select(
        F.col("n").alias("n_child")
    )
    n_orph = orphans.agg(F.count(F.lit(1)).alias("n")).select(
        F.col("n").alias("n_orphans")
    )
    n_par = pk.agg(F.count(F.lit(1)).alias("n")).select(
        F.col("n").alias("n_parents")
    )
    n_cless = childless.agg(F.count(F.lit(1)).alias("n")).select(
        F.col("n").alias("n_childless")
    )
    return (
        n_child.crossJoin(n_orph).crossJoin(n_par).crossJoin(n_cless)
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    buckets: int = 10,
) -> DataFrame:
    """Exact equi-depth histogram: rank every non-null value into
    ``buckets`` equal-population bins (ntile over the (value, tie)
    total order — the tie column makes duplicate values place
    deterministically) and emit per-bin count and [min, max] bounds.
    Output: ``(bucket, cnt, vmin, vmax)``.

    This is the EXACT tier; equal-population cuts need a global
    ranking, which runs through ``windows.global_ntile`` — the
    two-phase range-repartitioned rank (P-way parallel, bit-identical
    to the single-partition ``F.ntile`` it replaced). At 100 TB the
    cheaper alternative remains ``quantile_profile(approx=True)``
    boundaries + a map-side assignment (sketch cuts, one scan); the
    exact tier is the oracle for that one.
    """
    from .windows import global_ntile

    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("__v"), F.col(tie_col).alias("__t")
    )
    return (
        global_ntile(base, buckets, [F.asc("__v"), F.asc("__t")])
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("__v").alias("vmin"),
            F.max("__v").alias("vmax"),
        )
        .orderBy("bucket")
    )


def expectation_report(
    df: DataFrame, rules: dict[str, "F.Column | str"]
) -> DataFrame:
    """Data-quality expectation suite (the Deequ/Great-Expectations
    shape): evaluate named row-level predicates in ONE scan and
    report violations per rule — the contract gate a 100 TB ingest
    runs before promoting a partition.

    ``rules`` maps rule name → boolean Column (or SQL string); a row
    VIOLATES a rule when the predicate is false or NULL (null-hostile
    on purpose: an unevaluable expectation is a failed one, matching
    Deequ's completeness semantics).

    Scale shape: every rule compiles to a conditional count inside a
    single aggregate — one scan, no joins, no shuffle beyond the
    1-row final aggregate; the report is |rules| rows (exploded from
    the single aggregate row, the funnel-counts pattern, so the scan
    subplan is never re-run per rule).

    Output: ``(rule, n_rows, n_violations, pass)`` ordered by rule.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    names = sorted(rules)
    for name in names:
        pred = rules[name]
        c = F.expr(pred) if isinstance(pred, str) else pred
        aggs.append(
            F.sum(
                F.when(c.isNull() | ~c, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"__v_{name}")
        )
    one = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__v_{name}").alias("n_violations"),
            )
            for name in names
        ]
    )
    return (
        one.select(F.col("__n"), F.explode(pairs).alias("p"))
        .select(
            F.col("p.rule").alias("rule"),
            F.col("__n").alias("n_rows"),
            F.col("p.n_violations").alias("n_violations"),
            (F.col("p.n_violations") == 0).alias("pass"),
        )
        .orderBy("rule")
    )


def psi_drift(
    ref: DataFrame,
    new: DataFrame,
    column: str,
    n_bins: int = 10,
    add_k: float = 0.5,
) -> DataFrame:
    """Population Stability Index between a reference and a new
    corpus over a numeric column — the standard ML-ops drift gate
    (PSI = Σ_bins (q − p) · ln(q / p), p = reference share, q = new
    share; < 0.1 stable, > 0.25 drifted).

    Determinism: bin edges are equal-width over the REFERENCE
    min/max (order-independent aggregates); new-corpus values clamp
    into the edge bins; NULLs are excluded on both sides. add-k
    smoothing keeps empty bins finite. Each bin's PSI term is a
    fixed-shape IEEE expression rounded to micro units (BIGINT), so
    the total is an order-independent integer sum an independent
    engine reproduces exactly (the repo's integer-micro policy).

    Scale shape: two scans (one per corpus) reduced to n_bins-row
    aggregates; the bin spine is ``spark.range(n_bins)`` so all bins
    appear even when empty on both sides; everything after the two
    hash aggregates is bins-sized. Output:
    ``(bin, lo, hi, cnt_ref, cnt_new, psi6)`` ordered by bin —
    ``sum(psi6)/1e6`` is the headline PSI.
    """
    spark = ref.sparkSession
    mn, mx = ref.agg(
        F.min(F.col(column).cast("double")),
        F.max(F.col(column).cast("double")),
    ).first()
    if mn is None or mx == mn:
        raise ValueError(
            f"reference column {column!r} is empty or constant"
        )
    width = (mx - mn) / n_bins

    def _bin(df: DataFrame, out: str) -> DataFrame:
        x = F.col(column).cast("double")
        b = F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((x - F.lit(mn)) / F.lit(width)).cast("int"),
            ),
        )
        return (
            df.filter(x.isNotNull())
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    spine = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    rc = _bin(ref, "cnt_ref")
    nc = _bin(new, "cnt_new")
    joined = (
        spine.join(rc, "bin", "left")
        .join(nc, "bin", "left")
        .select(
            "bin",
            F.coalesce("cnt_ref", F.lit(0)).alias("cnt_ref"),
            F.coalesce("cnt_new", F.lit(0)).alias("cnt_new"),
        )
    )
    tot = joined.agg(
        F.sum("cnt_ref").alias("__nr"), F.sum("cnt_new").alias("__nn")
    )
    p = (F.col("cnt_ref") + F.lit(add_k)) / (
        F.col("__nr") + F.lit(add_k * n_bins)
    )
    q = (F.col("cnt_new") + F.lit(add_k)) / (
        F.col("__nn") + F.lit(add_k * n_bins)
    )
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            (F.lit(mn) + F.col("bin") * F.lit(width)).alias("lo"),
            (F.lit(mn) + (F.col("bin") + 1) * F.lit(width)).alias("hi"),
            "cnt_ref",
            "cnt_new",
            F.round((q - p) * F.log(q / p) * F.lit(1e6), 0)
            .cast("long")
            .alias("psi6"),
        )
        .orderBy("bin")
    )


def _is_numeric(dtype: str | None) -> bool:
    return dtype in {
        "int", "bigint", "smallint", "tinyint", "float", "double"
    } or (dtype or "").startswith("decimal")


def analyze_table(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Catalog statistics collection (the ``ANALYZE TABLE`` shape):
    per-column row count, null count, exact distinct count, and — for
    numeric columns — min/max as doubles, all gathered in ONE scan.
    These are the stats a cost-based optimizer (or a human doing
    join-order/broadcast planning) wants per table; pair with
    ``approx_distinct_counts`` when exact NDV is too hot at 100 TB.

    Scale shape: one ``agg`` with count/count-distinct/min/max per
    column — Spark expands multi-distinct into one Expand + two-phase
    aggregate (rows × |columns| intermediate, one logical scan, no
    joins); the report is |columns| rows exploded from the single
    result row (the expectation_report pattern).

    Output: ``(column, n_rows, n_nulls, n_distinct, min_d, max_d)``
    ordered by column; ``min_d/max_d`` are NULL for non-numeric
    columns (strings/timestamps render engine-dependently — a typed
    stats store should widen the schema instead).
    """
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(
                F.when(F.col(c).isNull(), 1).otherwise(0)
            ).alias(f"__nl_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
        if _is_numeric(dtypes.get(c)):
            aggs.append(
                F.min(F.col(c).cast("double")).alias(f"__mn_{c}")
            )
            aggs.append(
                F.max(F.col(c).cast("double")).alias(f"__mx_{c}")
            )
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nl_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (
                    F.col(f"__mn_{c}")
                    if _is_numeric(dtypes.get(c))
                    else F.lit(None).cast("double")
                ).alias("min_d"),
                (
                    F.col(f"__mx_{c}")
                    if _is_numeric(dtypes.get(c))
                    else F.lit(None).cast("double")
                ).alias("max_d"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.col("__n"), F.explode(rows).alias("s"))
        .select(
            F.col("s.column").alias("column"),
            F.col("__n").alias("n_rows"),
            F.col("s.n_nulls").alias("n_nulls"),
            F.col("s.n_distinct").alias("n_distinct"),
            F.col("s.min_d").alias("min_d"),
            F.col("s.max_d").alias("max_d"),
        )
        .orderBy("column")
    )


def corr_matrix(
    df: DataFrame, columns: list[str], decimals: int = 6
) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns in ONE scan —
    the EDA companion to ``analyze_table`` (feature redundancy, drift
    of relationships, join-key sanity).

    Cross-engine exactness: the five moments per pair (Σx, Σy, Σxy,
    Σx², Σy², n) accumulate in DECIMAL(27,10) — each per-row product
    is a single IEEE double op (bit-identical on any engine), and
    decimal addition is order-independent — then one fixed-shape
    double expression computes r, rounded to ``decimals``. Spark's
    builtin ``corr`` (and DuckDB's) reduce doubles in engine order —
    last-ulp nondeterminism this formulation removes.

    Rows with a NULL in either column of a pair are excluded from
    that pair (SQL corr semantics). Degenerate pairs (zero variance)
    emit NULL. One aggregate, |pairs| result columns, report exploded
    from the single row (the expectation_report pattern).

    Output: ``(col_a, col_b, n_pairs, corr)`` for a < b in the given
    order, sorted (col_a, col_b).
    """
    import itertools

    dec = "decimal(27,10)"
    aggs = []
    pairs = list(itertools.combinations(columns, 2))
    for a, b in pairs:
        x = F.col(a).cast("double")
        y = F.col(b).cast("double")
        both = x.isNotNull() & y.isNotNull()
        xx = F.when(both, x)
        yy = F.when(both, y)
        tag = f"{a}__{b}"
        aggs += [
            F.count(F.when(both, 1)).alias(f"__n_{tag}"),
            F.sum(xx.cast(dec)).alias(f"__sx_{tag}"),
            F.sum(yy.cast(dec)).alias(f"__sy_{tag}"),
            F.sum(F.when(both, x * y).cast(dec)).alias(f"__sxy_{tag}"),
            F.sum(F.when(both, x * x).cast(dec)).alias(f"__sxx_{tag}"),
            F.sum(F.when(both, y * y).cast(dec)).alias(f"__syy_{tag}"),
        ]
    one = df.agg(*aggs)

    def _corr(tag: str) -> Column:
        n = F.col(f"__n_{tag}").cast("double")
        sx = F.col(f"__sx_{tag}").cast("double")
        sy = F.col(f"__sy_{tag}").cast("double")
        sxy = F.col(f"__sxy_{tag}").cast("double")
        sxx = F.col(f"__sxx_{tag}").cast("double")
        syy = F.col(f"__syy_{tag}").cast("double")
        num = n * sxy - sx * sy
        den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
        return F.when(den > 0, F.round(num / den, decimals))

    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"__n_{a}__{b}").alias("n_pairs"),
                _corr(f"{a}__{b}").alias("corr"),
            )
            for a, b in pairs
        ]
    )
    return (
        one.select(F.explode(rows).alias("s"))
        .select("s.col_a", "s.col_b", "s.n_pairs", "s.corr")
        .orderBy("col_a", "col_b")
    )


def linear_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares line ``y = slope·x +
    intercept`` — the trend-per-segment profile (revenue vs time per
    region, quality vs length per source). Same DECIMAL(27,10)
    moment accumulation as ``corr_matrix`` (order-independent sums,
    per-row products a single IEEE op), one fixed-shape double
    expression per group, rounded to ``decimals`` — engine-exact.

    Rows with a NULL in x or y are excluded; groups with < 2 points
    or zero x-variance emit NULLs. One hash aggregate —
    |groups|-sized output, single scan.

    Output: ``(group, n, slope, intercept)`` ordered by group.
    """
    dec = "decimal(27,10)"
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    both = x.isNotNull() & y.isNotNull()
    agg = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.when(both, 1)).alias("__n"),
        F.sum(F.when(both, x).cast(dec)).alias("__sx"),
        F.sum(F.when(both, y).cast(dec)).alias("__sy"),
        F.sum(F.when(both, x * y).cast(dec)).alias("__sxy"),
        F.sum(F.when(both, x * x).cast(dec)).alias("__sxx"),
    )
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    den = n * sxx - sx * sx
    slope = F.when(
        (F.col("__n") >= 2) & (den != 0),
        F.round((n * sxy - sx * sy) / den, decimals),
    )
    intercept = F.when(
        (F.col("__n") >= 2) & (den != 0),
        F.round(
            (sy - (n * sxy - sx * sy) / den * sx) / n, decimals
        ),
    )
    return (
        agg.select(
            "group",
            F.col("__n").alias("n"),
            slope.alias("slope"),
            intercept.alias("intercept"),
        )
        .orderBy("group")
    )


def ks_statistic(
    ref: DataFrame,
    new: DataFrame,
    column: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic — the bin-free drift
    test next to ``psi_drift`` (PSI needs bin edges; KS compares the
    full empirical CDFs): ``D = max |F_ref(x) − F_new(x)|`` over the
    pooled sample points, reported in integer ppm.

    Integer exactness: at each pooled point the CDF difference is
    ``|cum_ref·n_new − cum_new·n_ref|`` over ``n_ref·n_new`` — pure
    int64 products of exact counts (bounded: both cums ≤ n ≤ 2^31
    keeps the product < 2^62), one floor division at the very end.

    Scale shape — NO single-task global window: the pooled sample is
    range-partitioned and sorted on the value (equal values never
    straddle a range boundary, so ties share one CDF point); a size
    probe collects two ints per partition; running counts + the
    broadcast offsets then run executor-side, and the driver sees
    only one candidate max per partition (the ``assign_dense_ids``
    two-pass pattern). NULLs excluded.

    Output: one row ``(n_ref, n_new, ks_ppm)``.
    """
    r = ref.select(
        F.col(column).cast("double").alias("__x"),
        F.lit(1).alias("__r"),
    ).filter(F.col("__x").isNotNull())
    n = new.select(
        F.col(column).cast("double").alias("__x"),
        F.lit(0).alias("__r"),
    ).filter(F.col("__x").isNotNull())
    u = (
        r.unionByName(n)
        .repartitionByRange("__x")
        .sortWithinPartitions("__x")
    )
    rdd = u.rdd.persist()

    def psizes(i, it):
        pr = pn = 0
        for row in it:
            if row["__r"] == 1:
                pr += 1
            else:
                pn += 1
        return [(i, pr, pn)]

    sizes = rdd.mapPartitionsWithIndex(psizes).collect()
    n_ref = sum(s[1] for s in sizes)
    n_new = sum(s[2] for s in sizes)
    off = {}
    ar = an = 0
    for i, pr, pn in sorted(sizes):
        off[i] = (ar, an)
        ar += pr
        an += pn
    spark = u.sparkSession
    boff = spark.sparkContext.broadcast((off, n_ref, n_new))

    def local_max(idx, it):
        offs, nr, nn = boff.value
        cr, cn = offs.get(idx, (0, 0))
        best = 0
        prev_x = None
        for row in it:
            x = row["__x"]
            if prev_x is not None and x != prev_x:
                best = max(best, abs(cr * nn - cn * nr))
            if row["__r"] == 1:
                cr += 1
            else:
                cn += 1
            prev_x = x
        if prev_x is not None:
            best = max(best, abs(cr * nn - cn * nr))
        return [(best,)]

    maxima = rdd.mapPartitionsWithIndex(local_max).collect()
    rdd.unpersist()
    d = max((m[0] for m in maxima), default=0)
    if n_ref == 0 or n_new == 0:
        raise ValueError("ks_statistic needs non-empty samples")
    return spark.createDataFrame(
        [(n_ref, n_new, (1_000_000 * d) // (n_ref * n_new))],
        "n_ref long, n_new long, ks_ppm long",
    )


def entropy_profile(
    df: DataFrame, columns: list[str]
) -> DataFrame:
    """Shannon entropy per (low-cardinality) column in integer
    micro-nats — the concentration profile (0 = constant column;
    ln(k) = uniform over k values): per-value terms
    ``−p·ln p`` micro-rounded BEFORE the integer sum (the repo's
    micro-log policy). NULL is counted as a regular category (a
    mostly-null column is informative). One aggregate per column
    over a |values|-sized table.

    Output: ``(column, n_values, entropy_micro_nats)`` ordered by
    column.
    """
    outs = []
    for c in columns:
        cnt = df.groupBy(
            F.col(c).cast("string").alias("__v")
        ).agg(F.count(F.lit(1)).alias("__c"))
        tot = cnt.agg(F.sum("__c").alias("__n"))
        term = F.round(
            -(F.col("__c") / F.col("__n"))
            * F.log(F.col("__c") / F.col("__n"))
            * F.lit(1e6),
            0,
        ).cast("long")
        outs.append(
            cnt.crossJoin(F.broadcast(tot))
            .agg(
                F.count(F.lit(1)).alias("n_values"),
                F.sum(term).alias("entropy_micro_nats"),
            )
            .select(
                F.lit(c).alias("column"),
                "n_values",
                "entropy_micro_nats",
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("column")


def corpus_datacard(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-table corpus data card (the FineWeb/Dolma release-notes
    shape): corpus size, token/char mass, language & source
    cardinalities, exact-duplicate pressure, and length extremes as
    a tidy ``(metric, value)`` long table — every number an exact
    integer so the whole card is oracle-checkable, and the obvious
    thing to publish next to a trained-on dataset.

    Two scans: one multi-aggregate pass for the row-wise metrics,
    one fingerprint aggregate for duplicate-group counts (the same
    single-shuffle cost as exact dedup). Output sorted by metric.
    """
    from .text_analysis import doc_fingerprint, token_count

    toks = token_count(F.col(text_col)).cast("long")
    base = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(text_col)).alias("n_chars_total"),
        F.sum(toks).alias("n_tokens_total"),
        F.max(toks).alias("max_doc_tokens"),
        F.min(toks).alias("min_doc_tokens"),
        F.countDistinct(lang_col).alias("n_langs"),
        F.countDistinct(source_col).alias("n_sources"),
    )
    dup = (
        df.groupBy(doc_fingerprint(F.col(text_col)).alias("fp"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.when(F.col("n") > 1, 1)).alias(
                "n_exact_dup_groups"
            ),
            F.coalesce(
                F.sum(F.when(F.col("n") > 1, F.col("n") - 1)),
                F.lit(0),
            ).alias("n_exact_dup_docs"),
        )
    )
    long_rows = base.crossJoin(dup).selectExpr(
        "stack(9, "
        "'n_docs', n_docs, "
        "'n_chars_total', n_chars_total, "
        "'n_tokens_total', n_tokens_total, "
        "'max_doc_tokens', max_doc_tokens, "
        "'min_doc_tokens', min_doc_tokens, "
        "'n_langs', n_langs, "
        "'n_sources', n_sources, "
        "'n_exact_dup_groups', n_exact_dup_groups, "
        "'n_exact_dup_docs', n_exact_dup_docs"
        ") AS (metric, value)"
    )
    return long_rows.select(
        "metric", F.col("value").cast("long").alias("value")
    ).orderBy("metric")
