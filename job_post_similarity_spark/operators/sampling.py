"""Sampling operators (SURVEY.md §2.10, R1-R2).

Two tiers:
- ``sample_exact_n`` — the reference's random.sample semantics
  (app/main.py:207-223): exactly n rows, seeded. Costs a global
  sort-by-rand; fine for query subsets, not for table-scale.
- ``deterministic_sample`` — scale path: multiplicative-hash filter on
  a key. No shuffle at all (pure map-side filter, pushed to the scan),
  reproducible across engines — this is what a 100 TB pipeline uses to
  take a stable x% slice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# LCG constants (glibc); key is reduced mod 2^31 BEFORE the multiply so
# the widest intermediate is < 2^62 — no int64 overflow under ANSI mode,
# and bit-identical on any engine with 64-bit integer arithmetic.
_MULT = 1103515245
_INC = 12345
_MOD = 2**31


def hash_bucket(key: Column | str, mult: int = _MULT, mod: int = _MOD) -> Column:
    """Deterministic pseudo-random bucket in [0, mod) from an integer key.

    Pure int64 arithmetic — identical in Spark, DuckDB, or any engine;
    used for engine-agnostic reproducible sampling and test oracles.

    ``pmod`` (not ``%``) at both reduction steps: Spark's ``%``
    preserves the dividend's sign, so a negative key would land in a
    negative bucket that compares below EVERY fraction threshold —
    i.e. kept with probability 1 regardless of the requested rate.
    pmod keeps the result in [0, mod) for all int64 keys. The widest
    intermediate stays < 2^62 (mod < 2^31, mult < 2^31), so no int64
    overflow under ANSI mode.
    """
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        F.pmod(c.cast("long"), F.lit(mod)) * F.lit(mult) + F.lit(_INC),
        F.lit(mod),
    )


def deterministic_sample(
    df: DataFrame, key: Column | str, fraction: float
) -> DataFrame:
    """R1 scale tier: keep rows whose hash bucket falls below
    fraction·mod. Map-side only; same rows selected on every run and
    every engine."""
    return df.filter(hash_bucket(key) < int(fraction * _MOD))


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key: Column | str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Training-data mixture sampling: keep a per-source deterministic
    fraction of rows (e.g. up-weight wiki, down-weight web crawl when
    composing a pretraining mix).

    Pure map-side: one LCG hash per row compared against a per-source
    threshold resolved by a CASE chain — no shuffle, no RNG state, the
    same rows survive on every engine and every run, and the filter
    composes with scan-level pushdown of any source predicate. Sources
    absent from ``weights`` get ``default_fraction`` (drop by default:
    an explicit mix should not silently pass unknown sources).

    At 100 TB the alternative (df.sampleBy) draws per-row uniforms —
    nondeterministic across retries of a failed task unless the seed +
    partition layout are frozen; the hash filter has no such coupling.
    """
    src = F.col(source_col)
    thr: Column = F.lit(int(default_fraction * _MOD))
    for name, frac in sorted(weights.items()):
        thr = F.when(src == name, F.lit(int(frac * _MOD))).otherwise(thr)
    return df.filter(hash_bucket(key) < thr)


def sample_exact_n(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """R1/R2 fidelity tier: exactly-n seeded sample (reference:
    random.sample at app/main.py:215; 50-query / 5000-pair eval samples
    at app/evaluation.py:117,192-195).

    Matches the reference's edge cases (app/main.py:207-223): n >= N or
    n is None → full set; n <= 0 → full set (the reference warns and
    falls back).
    """
    if n is None or n <= 0:
        return df
    return df.orderBy(F.rand(seed)).limit(n)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key: str,
) -> DataFrame:
    """R1/R2 at scale, stratified: up to ``n_per_stratum`` rows from
    EVERY stratum — the mixture-building primitive when sources are
    wildly imbalanced (uniform sampling starves small strata).

    Deterministic reservoir semantics without a reservoir: rank rows
    inside each stratum by the engine-agnostic LCG hash of ``key``
    (ties broken by the key itself) and keep the first n. The same
    rows are selected on every run, every engine, and every
    partitioning — so a DuckDB oracle can replay it exactly, which a
    ``sampleBy``/reservoir implementation cannot.

    One shuffle (the stratum window). For single-digit n per stratum
    at 100 TB, pre-filtering with ``hash_bucket(key) < c·mod·n/|s|``
    before the window would cut the shuffle to ~c·n rows per stratum;
    left out here because the stratum sizes are unknown without a
    first pass.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(key).asc(), F.col(key).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def hash_split(
    df: DataFrame,
    key: Column | str,
    weights: dict[str, float],
) -> DataFrame:
    """Deterministic train/val/test split: each row lands in exactly
    one named split by its ``hash_bucket`` — map-side, no shuffle, no
    seed state, reproducible across engines and across runs even if
    the table is re-partitioned or rows are appended (a row's split
    depends only on its key — the property random `randomSplit` lacks,
    and the one that stops train/test leakage when the corpus grows).

    ``weights`` maps split name → fraction (must sum to ≤ 1; any
    remainder falls into the last split). Adds a ``split`` column.
    """
    return df.withColumn(
        "split", _cumulative_split_expr(hash_bucket(key), weights)
    )


def _cumulative_split_expr(
    bucket: Column, weights: dict[str, float]
) -> Column:
    """Named-fold expression over a uniform bucket in [0, _MOD):
    first fold whose cumulative fraction exceeds the bucket; any
    remainder falls into the last fold."""
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"weights sum to {total} > 1")
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(acc * _MOD)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def leakage_safe_split(
    df: DataFrame,
    group_col: Column | str,
    weights: dict[str, float],
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test split keyed on a GROUP — near-dup component,
    content digest, user/document family — so every member of a
    group lands in the SAME fold. Splitting by row id leaves
    near-duplicate train/test leakage in place (Lee et al. 2022,
    arXiv:2107.06499 §5: duplicate train/eval overlap inflates eval
    scores); splitting by the dup-cluster key removes it by
    construction.

    Accepts any key type: the group key is rendered to a string and
    reduced to a uniform bucket via the md5-prefix hash (the repo's
    cross-engine string hash — ``hash_bucket`` needs an int64 key),
    then routed through the same cumulative-fraction fold expression
    as ``hash_split``. Map-side, no shuffle, reproducible under
    repartitioning and corpus growth.
    """
    c = F.col(group_col) if isinstance(group_col, str) else group_col
    b = F.pmod(
        F.conv(F.substring(F.md5(c.cast("string")), 1, 14), 16, 10)
        .cast("long"),
        F.lit(_MOD),
    )
    return df.withColumn(out_col, _cumulative_split_expr(b, weights))


def negative_samples(
    df: DataFrame,
    id_col: str,
    k: int = 5,
    n: int | None = None,
    mult: int = 2654435761,
    step: int = 40503,
) -> DataFrame:
    """Deterministic pseudo-random negative sampling for contrastive
    training: each anchor id gets ``k`` negatives drawn by a fixed
    multiplicative-hash stride over the DENSE id space [0, n) —
    ``neg_j = (id·mult + (j+1)·step) mod n``, bumped by one (mod n)
    when it collides with the anchor. Map-side only (one
    ``sequence`` explode, no join, no shuffle, no RNG state), and
    the same integer expression replays in any engine — the property
    that makes the sample reproducible across re-runs and appends,
    which random()-based sampling cannot give. Ids are reduced mod n
    BEFORE the multiply so the product stays far from int64 overflow
    at any id magnitude (the hash_bucket policy). Output:
    ``(id, neg_rank, neg_id)``.

    Complements ``knn.hard_negatives`` (similarity-ranked): uniform
    negatives are the cheap bulk of a contrastive batch; hard
    negatives the expensive tail.
    """
    if n is None:
        n = df.count()
    if n < 2:
        raise ValueError("need at least 2 ids to sample negatives")
    j = F.explode(F.expr(f"sequence(0, {k - 1})")).alias("neg_rank")
    out = df.select(F.col(id_col), j)
    raw = F.expr(
        f"pmod(pmod({id_col}, {n}L) * {mult}L"
        f" + (neg_rank + 1) * {step}L, {n}L)"
    )
    neg = F.when(raw == F.col(id_col), (raw + 1) % F.lit(n)).otherwise(raw)
    return out.select(
        id_col, "neg_rank", neg.cast("long").alias("neg_id")
    )


def temperature_mixture_weights(
    df: DataFrame,
    source_col: str,
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-scaled source mixing weights — the multilingual /
    multi-source rebalancing rule (p_i ∝ n_i^α; α = 1 keeps natural
    proportions, α → 0 flattens to uniform; the Llama/XLM-R mixing
    policy). For each source emits its row count, its mixing weight,
    and the sampling rate that realizes the weight on that source.

    Determinism (integer-micro policy): each ``n_i^α`` is a
    fixed-shape IEEE ``exp(α·ln n)`` rounded to micro units (BIGINT)
    BEFORE the normalization sum — the sum of integers is
    order-independent, so weights are bit-identical on any engine at
    any parallelism. Final weights in integer ppm with the floor
    division outside the aggregates.

    Scale shape: one hash aggregate to |sources| rows; the
    normalizer is a 1-row broadcast. ``rate_ppm`` =
    weight_i / natural_share_i (clipped to 1e6) — the per-source
    keep/repeat rate a downstream ``mixture_sample`` can consume.

    Output: ``(source, n_rows, weight_ppm, rate_ppm)`` ordered by
    source; NULL sources are excluded.
    """
    cnt = (
        df.filter(F.col(source_col).isNotNull())
        .groupBy(F.col(source_col).alias("source"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    t6 = F.round(
        F.exp(F.lit(alpha) * F.log(F.col("n_rows").cast("double")))
        * F.lit(1e6),
        0,
    ).cast("long")
    scored = cnt.withColumn("__t6", t6)
    tot = scored.agg(
        F.sum("__t6").alias("__s6"), F.sum("n_rows").alias("__n")
    )
    return (
        scored.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_rows",
            F.expr("(1000000L * __t6) div __s6").alias("weight_ppm"),
            F.expr(
                "least(1000000L,"
                " (((1000000L * __t6) div __s6) * __n) div n_rows)"
            ).alias("rate_ppm"),
        )
        .orderBy("source")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    key: Column | str,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006, A-ES): each row draws a reproducible
    uniform from its key's hash bucket and competes with sampling key
    ``ln(u) / w`` — the top ``n`` keys are a weight-proportional
    sample (u^(1/w) ordering, in log form so huge weights don't
    underflow). The corpus-curation use: sample training docs
    proportionally to a quality score, reproducibly.

    Determinism: u = (hash_bucket + 1) / 2^31 ∈ (0, 1] from the
    engine-agnostic LCG, and ln/divide are fixed-shape IEEE ops —
    the same rows win on any engine / partitioning / run (the same
    replay argument as ``hash_split``; a rand()-based A-ES resample
    differs per task retry). Ties (identical sample keys) break by
    key asc. Rows with NULL or non-positive weight are excluded —
    zero-weight rows can never win under A-ES anyway.

    Scale shape: the sample key is map-side; selection is one
    TakeOrdered(n) — no global sort materialization.

    Output: the sampled rows plus ``sample_key`` (rounded to 6 for a
    stable display contract; ordering used raw doubles).
    """
    c = F.col(key) if isinstance(key, str) else key
    w = F.col(weight_col).cast("double")
    u = (hash_bucket(c) + F.lit(1)).cast("double") / F.lit(float(_MOD))
    skey = F.log(u) / w
    out = (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__sk", skey)
        .orderBy(F.desc("__sk"), c.asc())
        .limit(n)
    )
    return out.withColumn(
        "sample_key", F.round(F.col("__sk"), 6)
    ).drop("__sk")


def kfold_assign(
    df: DataFrame,
    key: Column | str,
    k: int = 5,
    by_group: bool = False,
) -> DataFrame:
    """K-fold cross-validation fold assignment: ``fold ∈ [0, k)``
    from the deterministic hash of ``key`` — map-side, reproducible
    under appends/repartitioning (the hash_split argument), so every
    worker and every engine agrees which rows are in fold i's
    validation set. ``by_group=True`` hashes the key as a GROUP
    label via the md5 bucket (any type; near-dup families stay in
    one fold — the leakage_safe_split contract applied to CV).
    """
    if k < 2:
        raise ValueError("kfold needs k >= 2")
    c = F.col(key) if isinstance(key, str) else key
    if by_group:
        b = F.pmod(
            F.conv(F.substring(F.md5(c.cast("string")), 1, 14), 16, 10)
            .cast("long"),
            F.lit(k),
        )
    else:
        b = F.pmod(hash_bucket(c), F.lit(k))
    return df.withColumn("fold", b.cast("int"))


def token_budget_mixture(
    df: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    text_col: str = "text",
    key: str = "doc_id",
    default_budget: int = 0,
) -> DataFrame:
    """Compose a pretraining mix by TOKEN budget, not document count:
    within each source, documents are ordered by the engine-agnostic
    LCG hash of ``key`` (ties on the key) and kept while the
    cumulative token count of the documents BEFORE them is still
    under the source's budget — so the mix fills each source to its
    budget, overshooting by at most the boundary document (the
    standard greedy-fill policy; epoch token budgets per source are
    how real mixes are specified, because document counts don't
    control what the model actually trains on).

    Deterministic end-to-end: the hash order and the exclusive
    running sum are exact integer arithmetic, so an independent
    engine replays the exact survivor set. Sources absent from
    ``budgets`` get ``default_budget`` (0 = dropped — an explicit
    mix should not silently pass unknown sources).

    Output: ``(key, source, n_tokens)`` for survivors.

    Scale shape: one shuffle — the per-source window (same cost
    class as ``stratified_sample``). A single source IS one window
    partition; at 100 TB per-source skew is handled the same way
    ``assign_dense_ids`` documents: a first pass aggregates token
    mass per (source, hash-bucket) to find the boundary bucket, the
    exact window then runs only inside that bucket. Left as the
    documented refinement — the one-window form is the semantics
    contract the refinement must reproduce.
    """
    from pyspark.sql import Window

    from job_post_similarity_spark.operators.text_analysis import (
        token_count,
    )

    src = F.col(source_col)
    budget: Column = F.lit(int(default_budget))
    for name, b in sorted(budgets.items()):
        budget = F.when(src == name, F.lit(int(b))).otherwise(budget)
    w = (
        Window.partitionBy(source_col)
        .orderBy(hash_bucket(key), F.col(key))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = df.select(
        F.col(key),
        src.alias("source"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    return (
        toks.withColumn(
            "__before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .filter(F.col("__before") < budget)
        .select(key, "source", "n_tokens")
    )
