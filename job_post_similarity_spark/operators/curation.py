"""Training-corpus curation operators beyond dedup: benchmark
decontamination and sequence packing.

These extend the LLM-data-pipeline family (SURVEY.md "beyond the
reference" scope; the reference itself is a dedup pipeline —
app/main.py:100-284 — and stops at pair detection). Both operators are
pure DataFrame expressions: no Python in the row path, shuffles only
where the semantics force one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from ..caching import cache_auto

from .dedup import word_ngrams
from .text_analysis import token_count


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    min_shared: int = 2,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination scan: training docs sharing at least
    ``min_shared`` distinct word n-grams with ANY benchmark document.

    Returns ``(id_col, shared_ngrams)`` for flagged docs only.

    Shape at scale: the benchmark side (eval sets — thousands of docs)
    collapses to a DISTINCT n-gram set and is broadcast, so the
    training side is a map-side explode + broadcast semi-probe followed
    by one partial-aggregated groupBy on ``id_col``. The 100 TB corpus
    is never shuffled by gram — only the (id, matched-gram) survivors
    reach the aggregation. Set ``broadcast_benchmark=False`` if the
    benchmark outgrows the driver (falls back to a shuffle hash join).
    """
    grams = F.explode(word_ngrams(text_col, n=n, distinct=True)).alias("__g")
    dg = docs.select(F.col(id_col), grams)
    bg = benchmark.select(grams).distinct()
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    # plain count, not count_distinct: word_ngrams(distinct=True) makes
    # (id, gram) unique before the join and the bench side is DISTINCT,
    # so survivors are already unique — count_distinct would add a
    # second (id, gram) shuffle for nothing
    return (
        dg.join(bg, "__g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    min_shared: int = 2,
) -> DataFrame:
    """Drop contaminated docs: anti-join against ``contaminated_ids``.
    Output schema == input schema."""
    flagged = contaminated_ids(
        docs, benchmark, text_col, id_col, n, min_shared
    ).select(id_col)
    return docs.join(flagged, id_col, "left_anti")


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    group_col: str = "source",
    text_col: str = "text",
    tokens_col: Column | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document to the
    fixed-token-budget training pack that contains its FIRST token when
    the group's documents are concatenated in ``id_col`` order and the
    token stream is chunked every ``max_tokens``.

    Output: ``(id_col, group_col, n_tokens, token_offset, pack_id)``
    where ``token_offset`` is the doc's start position in its group's
    stream and ``pack_id = floor(token_offset / max_tokens)``. This is
    the GPT-style pretraining packing (documents may straddle a chunk
    boundary — the chunker, not this operator, splits them); it is a
    deterministic closed form over a running sum, so it needs no
    sequential bin-packing recurrence.

    Shape at scale: one window sum partitioned by ``group_col`` — packs
    are independent per group (source/shard), so parallelism is the
    group count and no global ordering exists. A single-group corpus
    would serialize into one task: shard the group key first (the same
    rule as any partitioned window).
    """
    toks = (tokens_col if tokens_col is not None else token_count(text_col)).alias(
        "n_tokens"
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("token_offset")
    base = docs.select(F.col(id_col), F.col(group_col), toks)
    return base.select(
        id_col,
        group_col,
        "n_tokens",
        offset,
    ).withColumn(
        "pack_id", F.floor(F.col("token_offset") / max_tokens).cast("long")
    )


def pack_stats(packed: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-pack utilization profile over ``pack_sequences`` output:
    docs per pack and tokens starting in the pack — the fill-factor
    report a packing job emits for tuning ``max_tokens``."""
    return packed.groupBy(group_col, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_in_pack"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """Split long documents into ≤``max_tokens``-token chunks with
    ``overlap`` tokens of context carried between consecutive chunks —
    the row-expanding preprocessing step for context-bounded training
    and embedding (complement of ``pack_sequences``, which merges
    SHORT docs; chunking splits LONG ones).

    Output: (id, chunk_id, chunk_text, n_tokens), chunk_id 0-based
    per document, chunk starts every ``max_tokens − overlap`` tokens.

    Pure JVM expressions: sequence() generates the stride starts,
    posexplode expands, slice+concat_ws rebuilds chunk text — one
    Generate node, no shuffle, no Python; chunking 100 TB rides the
    same scan that reads it.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens, got {overlap}")
    step = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col), toks.alias("__toks"))
    return base.select(
        id_col,
        F.posexplode(
            F.expr(f"sequence(0, size(__toks) - 1, {step})")
        ).alias("chunk_id", "__start"),
        F.col("__toks"),
    ).select(
        id_col,
        "chunk_id",
        F.concat_ws(
            " ", F.expr(f"slice(__toks, __start + 1, {max_tokens})")
        ).alias("chunk_text"),
        F.least(
            F.lit(max_tokens), F.size("__toks") - F.col("__start")
        ).cast("int").alias("n_tokens"),
    )


def bloom_build_bits(
    ids: DataFrame,
    id_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
):
    """Build a Bloom-filter bitset over ``ids[id_col]`` distributedly
    and return it as a numpy uint64 word array (length num_bits/64).

    The JVM computes the k bit positions (``xxhash64(id, i)`` mod
    num_bits), folds them into per-word masks, and a single
    ``bit_or`` hash aggregation merges them — the driver only ever
    holds the final num_bits/64 words (16 KiB per Mi-bit), never the
    id stream. This is the same shape Spark's own
    ``DataFrameStatFunctions.bloomFilter`` uses (treeAggregate over
    partition-local bitsets), expressed as a DataFrame aggregation so
    it rides AQE/whole-stage codegen.
    """
    import numpy as np

    # ceil-divide: positions run to num_bits-1, so a non-multiple-of-64
    # size must still allocate the final partial word
    words = (num_bits + 63) // 64
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col(id_col), F.lit(i)), F.lit(num_bits))
                for i in range(num_hashes)
            ]
        )
    ).alias("pos")
    rows = (
        ids.select(pos)
        .select(
            (F.col("pos") / F.lit(64)).cast("long").alias("word_idx"),
            # shiftleft needs a literal numBits in the Python API;
            # the SQL form takes a column
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    bits = np.zeros(words, dtype=np.uint64)
    for r in rows:
        bits[r["word_idx"]] = np.uint64(r["word"] & 0xFFFFFFFFFFFFFFFF)
    return bits


def bloom_decontaminate(
    corpus: DataFrame,
    contaminated: DataFrame,
    id_col: str = "doc_id",
    contam_col: str | None = None,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Remove corpus rows whose ``id_col`` appears in ``contaminated``
    — exact anti-join semantics, Bloom-filter execution: the
    contaminated set (which may be FAR too big to broadcast as rows —
    think every id ever served, or every benchmark n-gram hash)
    compresses to ``num_bits`` bits; the corpus probes the broadcast
    bitset map-side, and only probable hits (true hits + the ~fpp
    false-positive sliver) pay the exact verification anti-join.
    The corpus itself is never shuffled; output is EXACT (the verify
    join removes Bloom false positives).

    fpp ~= (1 - e^(-k·n/m))^k; size num_bits ~= 10 bits per
    contaminated id for ~1% at k=5. Probe positions use the same JVM
    ``xxhash64(id, i)`` expression as the build, so build and probe
    agree bit-for-bit. The corpus scan runs twice (clean branch +
    candidate branch) — both map-side; persist the input upstream if
    the scan dominates.
    """
    import numpy as np
    import pandas as pd

    ccol = contam_col or id_col
    bits = bloom_build_bits(
        contaminated.select(F.col(ccol).alias(id_col)).distinct(),
        id_col,
        num_bits,
        num_hashes,
    )
    bc = corpus.sparkSession.sparkContext.broadcast(bits)
    pos_cols = [
        F.pmod(F.xxhash64(F.col(id_col), F.lit(i)), F.lit(num_bits)).cast(
            "long"
        )
        for i in range(num_hashes)
    ]
    probed = corpus.withColumn("__pos", F.array(*pos_cols))

    out_cols = [f for f in corpus.columns]
    schema_s = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in corpus.schema.fields
    ) + ", __hit boolean"

    def probe(batches):
        w = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            P = np.stack(pdf["__pos"].to_numpy())  # (n, k)
            hit = np.ones(len(pdf), dtype=bool)
            for j in range(P.shape[1]):
                pj = P[:, j]
                word = w[pj // 64]
                shift = (pj % 64).astype(np.uint64)
                hit &= ((word >> shift) & np.uint64(1)) != 0
            out = pdf[out_cols].copy()
            out["__hit"] = hit
            yield out

    flagged = probed.mapInPandas(probe, schema_s)
    clean = flagged.filter(~F.col("__hit")).drop("__hit")
    cand = flagged.filter(F.col("__hit")).drop("__hit")
    verified_clean = cand.join(
        contaminated.select(F.col(ccol).alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    return clean.unionByName(verified_clean)


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    add_k: float = 0.5,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    score every raw document by how much more likely its tokens are
    under a TARGET-domain language model than under the raw-corpus
    model — the data-selection signal behind domain-matched
    pretraining mixes. Both models are hashed-unigram bag-of-words
    LMs (the paper's hashed n-gram estimator): token → md5-prefix
    bucket in ``[0, n_buckets)``, add-k smoothed bucket probabilities.

    Cross-engine exactness (the repo's integer micro-log policy, as
    in ``bigram_perplexity``): per-bucket log-probs are rounded to
    millionths and stored as integers, so the per-doc sum
    ``w6 = Σ (lp6_target[b] − lp6_raw[b])`` is order-independent and
    bit-identical on any engine/parallelism. Select by ``w6`` desc
    (ties → id asc) to take the top slice.

    Scale shape: two hash aggregates reduce BOTH corpora to one
    ``n_buckets``-row model table (broadcastable at any corpus size —
    the bounded-model shape shared with the Lloyd/BPE trainers);
    scoring is a map-side explode + broadcast join + one per-doc
    aggregation. The raw corpus is scanned twice (model + scoring) —
    persist upstream if it is an expensive derivation.

    Output: ``(id, n_tokens, w6)`` — one row per raw doc that has at
    least one whitespace token; ``w6`` is the micro-log importance
    ratio (positive = more target-like).
    """
    def _buckets(df: DataFrame) -> DataFrame:
        toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        return (
            df.filter(F.col(text_col).isNotNull())
            .select(
                F.col(id_col).alias("__id"),
                F.explode(toks).alias("__t"),
            )
            .filter(F.col("__t") != "")
            .select(
                "__id",
                F.pmod(
                    F.conv(F.substring(F.md5("__t"), 1, 14), 16, 10)
                    .cast("long"),
                    F.lit(n_buckets),
                ).alias("__b"),
            )
        )

    raw_b = _buckets(raw).transform(cache_auto)
    tgt_b = _buckets(target)

    # full-outer on bucket: a bucket absent from one corpus gets
    # count 0 there, and the SAME smoothing formula yields its floor
    # probability add_k / (N + add_k·B) — no separate floor branch
    def _lp6(c: Column, n: Column) -> Column:
        return (
            F.round(
                F.log(
                    (c + F.lit(add_k))
                    / (n + F.lit(add_k * n_buckets))
                )
                * F.lit(1e6),
                0,
            ).cast("long")
        )

    rc = raw_b.groupBy("__b").agg(F.count(F.lit(1)).alias("__cr"))
    tc = tgt_b.groupBy("__b").agg(F.count(F.lit(1)).alias("__ct"))
    rn = raw_b.agg(F.count(F.lit(1)).alias("__nr"))
    tn = tgt_b.agg(F.count(F.lit(1)).alias("__nt"))
    model = (
        rc.join(tc, "__b", "full_outer")
        .crossJoin(F.broadcast(rn))
        .crossJoin(F.broadcast(tn))
        .select(
            "__b",
            _lp6(F.coalesce("__cr", F.lit(0)), F.col("__nr"))
            .alias("lp6_raw"),
            _lp6(F.coalesce("__ct", F.lit(0)), F.col("__nt"))
            .alias("lp6_tgt"),
        )
    )
    out = (
        raw_b.join(F.broadcast(model), "__b")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("lp6_tgt") - F.col("lp6_raw")).alias("w6"),
        )
        .select(F.col("__id").alias(id_col), "n_tokens", "w6")
    )
    return out


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fill-in-the-middle training-target construction (Bavarian et
    al. 2022, the code-LM data prep): split each document's token
    stream into (prefix, middle, suffix) at DETERMINISTIC positions
    and emit the PSM-format string
    ``<PRE>prefix<SUF>suffix<MID>middle`` — the model learns to
    infill by predicting the middle after seeing both sides.

    Split positions come from the engine-agnostic LCG hash of the id
    (chained once for the second draw), NOT an RNG: the same document
    gets the same split on every run, engine, and partitioning —
    retry-safe at 100 TB and exactly replayable by an oracle.
    ``prefix_len ∈ [1, n−2]``, ``middle_len ∈ [1, n−prefix−1]``, so
    all three parts are non-empty whenever the document has ≥ 3
    tokens; shorter documents pass through un-split
    (prefix = whole text, middle/suffix empty).

    Pure map-side expression — token split, two modular draws, three
    array slices, one concat; no shuffle, no Python.
    """
    from .sampling import _INC, _MOD, _MULT, hash_bucket

    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    h1 = hash_bucket(F.col(id_col))
    h2 = F.pmod(h1 * F.lit(_MULT) + F.lit(_INC), F.lit(_MOD))
    t = df.select(
        F.col(id_col),
        toks.alias("__t"),
        h1.alias("__h1"),
        h2.alias("__h2"),
    ).withColumn("n_tokens", F.size("__t"))
    n = F.col("n_tokens")
    p = F.when(
        n >= 3, F.lit(1) + F.pmod(F.col("__h1"), (n - 2).cast("long"))
    ).otherwise(n.cast("long"))
    t = t.withColumn("prefix_len", p)
    m = F.when(
        n >= 3,
        F.lit(1)
        + F.pmod(F.col("__h2"), (n.cast("long") - F.col("prefix_len") - 1)),
    ).otherwise(F.lit(0))
    t = t.withColumn("middle_len", m)
    t = t.withColumn(
        "suffix_len",
        n.cast("long") - F.col("prefix_len") - F.col("middle_len"),
    )
    pre = F.array_join(
        F.expr("slice(__t, 1, CAST(prefix_len AS INT))"), " "
    )
    mid = F.array_join(
        F.expr(
            "slice(__t, CAST(prefix_len + 1 AS INT),"
            " CAST(middle_len AS INT))"
        ),
        " ",
    )
    suf = F.array_join(
        F.expr(
            "slice(__t, CAST(prefix_len + middle_len + 1 AS INT),"
            " CAST(suffix_len AS INT))"
        ),
        " ",
    )
    return t.select(
        id_col,
        "n_tokens",
        "prefix_len",
        "middle_len",
        "suffix_len",
        F.concat(
            F.lit("<PRE>"), pre, F.lit("<SUF>"), suf, F.lit("<MID>"), mid
        ).alias("fim_text"),
    )


def contamination_matrix(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Pairwise cross-SOURCE n-gram contamination matrix: for every
    unordered source pair, how many distinct word n-grams they share
    and the containment ratio in each direction — the corpus-level
    view of ``contaminated_ids`` (which scans one benchmark against
    the corpus; this audits ALL sources against each other, the
    question a training-mixture curator actually asks: "how much of
    source B is already in source A?").

    Output: ``(src_a, src_b, shared_grams, grams_a, grams_b,
    containment_a_ppm, containment_b_ppm)`` with ``src_a < src_b``,
    ordered by shared desc then the pair — containment_X_ppm =
    shared · 1e6 div grams_X (integer, engine-exact).

    Scale shape: one DISTINCT (source, gram) grain (grams dedup'd
    WITHIN source first — the corpus is never shuffled at document
    grain), per-source totals from that same grain, then a gram-keyed
    self-join whose fan-out is bounded by (#sources per gram)² —
    sources are a handful, so the join output is ≤ |grain| ·
    #sources, never corpus².
    """
    from .dedup import word_ngrams

    sg = (
        docs.select(
            F.col(group_col).alias("__s"),
            F.explode(word_ngrams(text_col, n=n, distinct=True)).alias(
                "__g"
            ),
        )
        .filter(F.col("__s").isNotNull())
        .distinct()
        .transform(cache_auto)
    )
    totals = sg.groupBy("__s").agg(F.count(F.lit(1)).alias("__tot"))
    a = sg.select(F.col("__s").alias("src_a"), "__g")
    b = sg.select(F.col("__s").alias("src_b"), "__g")
    shared = (
        a.join(b, "__g")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    ta = totals.select(
        F.col("__s").alias("src_a"), F.col("__tot").alias("grams_a")
    )
    tb = totals.select(
        F.col("__s").alias("src_b"), F.col("__tot").alias("grams_b")
    )
    return (
        shared.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            "shared_grams",
            "grams_a",
            "grams_b",
            F.expr("shared_grams * 1000000L div grams_a").alias(
                "containment_a_ppm"
            ),
            F.expr("shared_grams * 1000000L div grams_b").alias(
                "containment_b_ppm"
            ),
        )
        .orderBy(F.desc("shared_grams"), F.asc("src_a"), F.asc("src_b"))
    )


def curriculum_shards(
    docs: DataFrame,
    score_col: Column | str,
    shard_size: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Curriculum ordering: rank the corpus by a quality/difficulty
    score (desc, id asc tiebreak — a total order) and cut it into
    fixed-size ordered shards — the deterministic easy-to-hard data
    ordering a curriculum-trained run consumes, with per-shard stats
    for the data card. Ranking runs through ``windows.global_rank``
    (two-phase range sort) — NO single-partition window, so the
    ordering step survives any corpus size.

    Output: ``(shard, docs, score_min, score_max)`` ordered by shard;
    shard = (rank-1) div shard_size.
    """
    from .windows import global_rank

    if shard_size < 1:
        raise ValueError(f"shard_size must be >= 1, got {shard_size}")
    sc = F.col(score_col) if isinstance(score_col, str) else score_col
    ranked = global_rank(
        docs.select(F.col(id_col), sc.alias("__score")),
        [F.desc("__score"), F.asc(id_col)],
        out_col="__r",
    )
    return (
        ranked.withColumn(
            "shard", F.expr(f"(__r - 1L) div {int(shard_size)}L")
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.min("__score").alias("score_min"),
            F.max("__score").alias("score_max"),
        )
        .orderBy("shard")
    )
