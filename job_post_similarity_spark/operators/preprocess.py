"""Relational preprocessing operators (SURVEY.md §2.2 P1-P8) and the
7-step composite pipeline (reference: app/preprocess_data.py:122-147).

Everything here is a lazy Column/DataFrame transformation: Catalyst
fuses the whole chain into one stage over the scan — at 100 TB this is
a single pass with pushed-down column pruning, no shuffle at all until
the dedup step (one shuffle on the dedup key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import strings as S
from ..schemas import require_columns

# Columns the reference drops (app/preprocess_data.py:105-120).
UNUSED_COLUMNS = [
    "jobDescRaw",
    "companyBranchName",
    "jobDescUrl",
    "nlpBenefits",
    "nlpSkills",
    "nlpSoftSkills",
    "nlpDegreeLevel",
    "nlpEmployment",
    "nlpSeniority",
    "scrapedLocation",
    "jobDescUrlHash",
]

# Null-fill map (app/preprocess_data.py:41-45): categorical → 'Unknown'.
CATEGORICAL_FILL = {
    "companyName": "Unknown",
    "finalZipcode": "Unknown",
    "finalState": "Unknown",
    "finalCity": "Unknown",
    "companyBranchName": "Unknown",
}


def drop_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """P1: drop-if-present (df.drop ignores missing names, matching the
    reference's existence-gated drop at app/preprocess_data.py:105-120)."""
    return df.drop(*(columns or UNUSED_COLUMNS))


def clean_html_column(
    df: DataFrame, src: str = "jobDescRaw", dst: str = "jobDescClean",
    fidelity: bool = False,
) -> DataFrame:
    """P2+F1: derive cleaned text column (app/preprocess_data.py:24-34).

    ``fidelity=True`` switches to the html.parser Pandas UDF tier.
    """
    require_columns(df, [src], "clean_html")
    expr: Column
    if fidelity:
        expr = S.strip_html_pandas_udf()(F.coalesce(F.col(src), F.lit("")))
    else:
        expr = S.strip_html(F.coalesce(F.col(src), F.lit("")))
    return df.withColumn(dst, expr)


def fill_missing(df: DataFrame, fill: dict[str, str] | None = None) -> DataFrame:
    """P3: constant null-fill (app/preprocess_data.py:41-45).
    Only fills columns that exist, like the reference."""
    fill = fill or CATEGORICAL_FILL
    present = {k: v for k, v in fill.items() if k in df.columns}
    return df.na.fill(present) if present else df


def drop_null_rows(df: DataFrame, subset: list[str]) -> DataFrame:
    """P4: subset null-drop (app/preprocess_data.py:47-54 — the 14
    null-correctDate rows)."""
    return df.na.drop(subset=[c for c in subset if c in df.columns])


def dedup_keep_first(
    df: DataFrame, key: list[str], order: list[Column | str]
) -> DataFrame:
    """D1: drop_duplicates(subset=key, keep='first') with DETERMINISTIC
    'first' (reference: app/preprocess_data.py:59-71).

    pandas keep-first means file order; Spark's dropDuplicates picks an
    arbitrary row. We replicate determinism with a row_number window
    over an explicit ordering (caller passes file-order surrogate, e.g.
    a monotonically increasing id captured at scan, or a natural key).

    Scale note: one shuffle on ``key``. Skewed keys (e.g. empty text)
    are handled by AQE skew splitting; the window computes only
    row_number so spill is bounded.
    """
    w = Window.partitionBy(*key).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def clean_location(df: DataFrame) -> DataFrame:
    """The reference's clean_location_data (app/preprocess_data.py:73-91):
    F2 trailing-comma strip on finalState, F3 remote-normalize on
    finalZipcode, F4 title-trim on finalCity — each gated on existence."""
    if "finalState" in df.columns:
        df = df.withColumn("finalState", S.strip_trailing_comma("finalState"))
    if "finalZipcode" in df.columns:
        df = df.withColumn("finalZipcode", S.normalize_remote("finalZipcode"))
    if "finalCity" in df.columns:
        df = df.withColumn("finalCity", S.title_trim("finalCity"))
    return df


def clean_text_column(df: DataFrame, column: str = "jobDescClean") -> DataFrame:
    """F5+F6 on the text column (app/preprocess_data.py:93-102)."""
    if column in df.columns:
        df = df.withColumn(column, S.clean_text(column))
    return df


def preprocess_jobs(df: DataFrame, order_column: str = "lid") -> DataFrame:
    """The 7-step composite in the reference's exact operator order
    (app/preprocess_data.py:124-130):

      load → clean_html → handle_missing → remove_duplicates →
      clean_location → clean_text → drop_unused

    The dedup-before-embedding ordering is load-bearing at scale
    (SURVEY.md §4): it shrinks the row set ahead of the expensive
    embedding UDF, and Catalyst will not reorder across a Python UDF.
    ``order_column`` stands in for pandas file order to make keep-first
    deterministic.
    """
    df = clean_html_column(df)
    df = fill_missing(df)
    df = drop_null_rows(df, ["correctDate"])
    df = dedup_keep_first(df, ["jobDescClean"], [F.col(order_column)])
    df = clean_location(df)
    df = clean_text_column(df)
    df = drop_columns(df)
    return df


def keep_latest(
    df: DataFrame, key: list[str], order: list[Column | str]
) -> DataFrame:
    """CDC/upsert compaction: one row per ``key`` — the LATEST by the
    explicit ``order`` columns (pass descending columns, e.g.
    ``[F.col("ts").desc(), F.col("event_id").desc()]``; the last
    order column should be a unique tie-break so the survivor is
    deterministic). Applying a change stream onto a snapshot is
    ``snapshot.unionByName(changes)`` piped through this.

    Same single-shuffle row_number shape as ``dedup_keep_first`` —
    the two are one operator with opposite order polarity, kept as
    separate names because upsert-compaction and dedup read
    differently at call sites.
    """
    return dedup_keep_first(df, key, order)


def parse_json_fields(
    df: DataFrame,
    json_col: str,
    schema: str,
    drop_source: bool = False,
) -> DataFrame:
    """Semi-structured projection: parse a JSON string column into
    typed top-level fields (``schema`` like ``"k int, name string"``).

    ``from_json`` parses ONCE per row into a struct and Catalyst
    prunes unreferenced fields — vs ``get_json_object``, which
    re-parses the document per extracted field. Malformed JSON and
    missing keys yield typed nulls (PERMISSIVE), the right semantics
    for web-scraped metadata at scale. Map-side only.
    """
    from pyspark.sql import types as T

    parsed = F.from_json(F.col(json_col), schema)
    out = df.withColumn("__j", parsed)
    # parse the DDL properly for field names — naive comma-splitting
    # breaks on parameterized/nested types ("m map<string,int>",
    # "d decimal(10,2)")
    names = T._parse_datatype_string(schema).fieldNames()
    for name in names:
        out = out.withColumn(name, F.col("__j").getField(name))
    out = out.drop("__j")
    return out.drop(json_col) if drop_source else out


def melt(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "key",
    value_name: str = "val",
) -> DataFrame:
    """Unpivot/melt: wide → long. Columns in ``value_cols`` must share
    (or be castable to) one type — Spark's native ``unpivot`` (an
    Expand node: k output rows per input row, map-side, no shuffle)
    enforces least-common-type at analysis."""
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )


def pivot_table(
    df: DataFrame,
    row_col: str,
    pivot_col: str,
    values: list[str],
    agg_col: str | None = None,
    agg: str = "count",
) -> DataFrame:
    """Pivot: long → wide (the inverse of ``melt``). One output row
    per ``row_col`` value, one column per entry of ``values`` named
    after it.

    ``values`` is REQUIRED (Spark's values-less ``pivot`` runs an
    extra distinct job to discover columns AND makes the output
    schema data-dependent — a schema that changes when the data does
    breaks every downstream consumer; an explicit list is both the
    fast path and the stable-contract path). Unlisted pivot values
    are dropped, like Spark's native pivot.

    ``agg``: ``count`` (exact integers, nulls→0) or ``sum`` over
    ``agg_col`` (DECIMAL(18,2) accumulation — order-independent —
    emitted as round(double, 2); absent combinations emit 0).

    Scale shape: compiles to ONE hash aggregate with |values|
    conditional aggregates — no Expand, no per-value scans, no
    second job.
    """
    if agg == "count":
        cell = lambda v: F.sum(  # noqa: E731
            F.when(F.col(pivot_col) == v, 1).otherwise(0)
        )
    elif agg == "sum":
        if agg_col is None:
            raise ValueError("agg='sum' needs agg_col")
        cell = lambda v: F.round(  # noqa: E731
            F.sum(
                F.when(
                    F.col(pivot_col) == v,
                    F.col(agg_col).cast("decimal(18,2)"),
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            ).cast("double"),
            2,
        )
    else:
        raise ValueError(f"unsupported agg {agg!r}")
    return (
        df.groupBy(row_col)
        .agg(*[cell(v).alias(str(v)) for v in values])
        .orderBy(row_col)
    )


def truncate_tokens(
    df: DataFrame,
    text_col: str = "text",
    max_tokens: int = 512,
    out_col: str = "text_trunc",
) -> DataFrame:
    """Token-budget truncation: keep the first ``max_tokens``
    whitespace tokens of ``text_col`` — the context-window clipper
    applied before tokenization-expensive stages (a doc that will be
    cut to 512 tokens anyway should not pay BPE/embedding cost for
    its tail). Adds ``out_col`` (tokens rejoined with single spaces —
    the repo's canonical whitespace normalization, identical in any
    engine) and ``n_tokens_kept``; NULL text stays NULL with 0 kept.

    Map-side split/slice/join — no shuffle, no Python, codegen
    end-to-end (complements ``curation.chunk_documents``, which
    SPLITS the tail into more rows instead of dropping it).
    """
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda t: t != "",
    )
    kept = F.slice(toks, 1, max_tokens)
    # NB: F.least SKIPS nulls (least(NULL, k) == k), so the null-text
    # case must be handled by the outer when, not a coalesce
    return df.withColumn(
        "n_tokens_kept",
        F.when(
            F.col(text_col).isNotNull(),
            F.least(F.size(toks), F.lit(max_tokens)),
        ).otherwise(F.lit(0)),
    ).withColumn(
        out_col,
        F.when(
            F.col(text_col).isNotNull(), F.array_join(kept, " ")
        ),
    )


def assign_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "row_id",
) -> DataFrame:
    """Global dense 0-based row ids in ``order_cols`` order WITHOUT a
    single-task global sort — the scalable ``row_number() OVER
    (ORDER BY …)`` replacement (an un-partitioned window funnels the
    entire table through ONE reducer; ``monotonically_increasing_id``
    is sparse and partition-dependent).

    Two-pass shape: range-repartition on the order key (the sort
    shuffle Spark would do anyway), sort within partitions, count
    rows per partition, broadcast the cumulative offsets, then assign
    ``offset + local_rank`` map-side. The count pass touches only
    partition sizes (one number per partition); no row moves twice.

    Determinism: ``order_cols`` must be a total order (make it unique
    with a tie-break column) — then ids are engine-exact and an
    oracle can replay them with a plain ``row_number()``.
    """
    ordered = df.repartitionByRange(*order_cols).sortWithinPartitions(
        *order_cols
    )
    # persist across the two passes: the size probe and the tag pass
    # would otherwise each re-run the range shuffle + sort
    rdd = ordered.rdd.persist()
    sizes = rdd.mapPartitionsWithIndex(
        lambda i, it: [(i, sum(1 for _ in it))]
    ).collect()
    offsets = {}
    acc = 0
    for i, n in sorted(sizes):
        offsets[i] = acc
        acc += n
    spark = df.sparkSession
    boff = spark.sparkContext.broadcast(offsets)
    schema_parts = [
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ] + [f"{out_col} long"]

    def tag(idx, it):
        base = boff.value.get(idx, 0)
        for j, row in enumerate(it):
            yield (*row, base + j)

    out = spark.createDataFrame(
        rdd.mapPartitionsWithIndex(tag), ", ".join(schema_parts)
    )
    out = out.localCheckpoint(eager=True)
    rdd.unpersist()
    return out


def impute_group_mean(
    df: DataFrame,
    value_col: str,
    group_col: str,
    decimals: int | None = 6,
    out_col: str | None = None,
) -> DataFrame:
    """Null imputation by group mean — the standard feature-cleanup
    step, DECIMAL-exact so the imputed values are engine-reproducible
    (the label_centroids policy: DECIMAL(27,10) sums, one divide,
    round to ``decimals``). Groups that are entirely null impute the
    GLOBAL mean; an all-null column raises.

    Shape: one grouped aggregate + one global aggregate broadcast
    back — the fact table never shuffles (the winsorize/mad_outliers
    pattern). Adds ``out_col`` (default ``{value_col}_imputed``);
    non-null values pass through unchanged. ``decimals=None``
    skips the mean's rounding — the fully engine-exact path (the
    DECIMAL-sum-over-count division of identical doubles is bit-
    identical anywhere; rounding a double to N decimals is NOT — see
    the try_divide NOTES footnote).
    """
    out_col = out_col or f"{value_col}_imputed"
    dec = "decimal(27,10)"
    x = F.col(value_col).cast("double")

    def _mean():
        m = F.sum(x.cast(dec)).cast("double") / F.count(x)
        return m if decimals is None else F.round(m, decimals)

    gm = df.groupBy(F.col(group_col).alias("__g")).agg(
        _mean().alias("__gmean")
    )
    glob = df.agg(_mean().alias("__gg"))
    if glob.first()["__gg"] is None:
        raise ValueError(f"column {value_col!r} is entirely null")
    return (
        df.join(
            F.broadcast(gm), df[group_col] == gm["__g"], "left"
        )
        .crossJoin(F.broadcast(glob))
        .withColumn(
            out_col,
            F.coalesce(x, F.col("__gmean"), F.col("__gg")),
        )
        .drop("__g", "__gmean", "__gg")
    )


def one_hot(
    df: DataFrame,
    column: str,
    vocabulary: list[str],
    out_col: str | None = None,
) -> DataFrame:
    """Explicit-vocabulary one-hot encoding: ``array<int>`` with a 1
    at the value's vocabulary position — the fixed-contract encoder
    for LOW-cardinality categoricals (schema stability is the point:
    unseen values and NULL encode to all-zeros instead of growing
    the width; ``functions.features.feature_hash`` is the unbounded-
    cardinality tier). Pure map-side array expression.
    """
    out_col = out_col or f"{column}_onehot"
    c = F.col(column).cast("string")
    return df.withColumn(
        out_col,
        F.array(
            *[
                F.when(c == v, F.lit(1)).otherwise(F.lit(0))
                for v in vocabulary
            ]
        ),
    )


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: str | None = None,
    prior_weight: float = 10.0,
) -> DataFrame:
    """Leave-one-out target encoding with prior smoothing — the
    high-cardinality categorical encoder that one-hot can't reach:
    each row gets its category's mean target EXCLUDING itself (the
    leakage guard), shrunk toward the global mean by
    ``prior_weight`` pseudo-observations (the Micci-Barreca 2001
    scheme).

    ``enc = (cat_sum − y + w·global_mean) / (cat_n − 1 + w)`` — the
    sums accumulate in DECIMAL(27,10) (order-independent), the final
    expression is fixed-shape IEEE, so encodings are engine-exact.
    Rows with a NULL target still get the category's smoothed mean
    (no subtraction); singleton categories fall back to the prior.

    Shape: one category aggregate + one 1-row global aggregate, both
    broadcast back — the fact table never shuffles (the imputation
    pattern).
    """
    out_col = out_col or f"{cat_col}_te"
    dec = "decimal(27,10)"
    y = F.col(target_col).cast("double")
    cs = df.groupBy(F.col(cat_col).alias("__c")).agg(
        F.sum(y.cast(dec)).cast("double").alias("__s"),
        F.count(y).alias("__n"),
    )
    g = df.agg(
        (
            F.sum(y.cast(dec)).cast("double") / F.count(y)
        ).alias("__gm")
    )
    w = float(prior_weight)
    num = (
        F.col("__s")
        - F.coalesce(y, F.lit(0.0))
        + F.lit(w) * F.col("__gm")
    )
    den = (
        F.col("__n")
        - F.when(y.isNotNull(), F.lit(1)).otherwise(F.lit(0))
        + F.lit(w)
    )
    return (
        df.join(F.broadcast(cs), df[cat_col] == cs["__c"], "left")
        .crossJoin(F.broadcast(g))
        .withColumn(
            out_col,
            F.when(
                F.col("__s").isNotNull(), num / den
            ).otherwise(F.col("__gm")),
        )
        .drop("__c", "__s", "__n", "__gm")
    )
