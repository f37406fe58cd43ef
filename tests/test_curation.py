"""Curation-operator semantics: decontamination, mixture sampling,
sequence packing — fixture-level checks the sf-gate queries can't
express (plan shape, edge cases, closed-form invariants)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from job_post_similarity_spark.operators import curation, sampling


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        Row(doc_id=1, source="a", text="alpha beta gamma delta"),
        Row(doc_id=2, source="a", text="alpha beta epsilon zeta"),
        Row(doc_id=3, source="a", text="unrelated words entirely here"),
        Row(doc_id=4, source="b", text="gamma delta alpha beta"),
        Row(doc_id=5, source="b", text="  "),
        Row(doc_id=6, source="b", text="solo"),
    ]
    return spark.createDataFrame(rows)


# ------------------------------------------------------- decontamination


def test_contaminated_ids_counts_distinct_shared_bigrams(spark, corpus):
    bench = corpus.filter(F.col("doc_id") == 1)  # grams: ab, bg, gd
    train = corpus.filter(F.col("doc_id") != 1)
    out = curation.contaminated_ids(train, bench, n=2, min_shared=2)
    got = {r["doc_id"]: r["shared_ngrams"] for r in out.collect()}
    # doc 2 shares only "alpha beta" (1 gram) -> below min_shared
    # doc 4 shares "gamma delta" + "alpha beta" = 2
    assert got == {4: 2}


def test_decontaminate_preserves_schema_and_drops_flagged(spark, corpus):
    bench = corpus.filter(F.col("doc_id") == 1)
    train = corpus.filter(F.col("doc_id") != 1)
    out = curation.decontaminate(train, bench, n=2, min_shared=2)
    assert out.columns == train.columns
    assert {r["doc_id"] for r in out.collect()} == {2, 3, 5, 6}


def test_contaminated_ids_broadcasts_benchmark(spark, corpus):
    bench = corpus.filter(F.col("doc_id") == 1)
    train = corpus.filter(F.col("doc_id") != 1)
    plan = curation.contaminated_ids(train, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # exactly two hash shuffles total: bench-side DISTINCT (feeds the
    # broadcast) and the final per-doc count — the corpus side reaches
    # the join map-side and is never exchanged by gram
    assert plan.count("Exchange hashpartitioning") == 2


# ----------------------------------------------------- mixture sampling


def test_mixture_sample_full_weight_keeps_all(spark, corpus):
    out = sampling.mixture_sample(
        corpus, {"a": 1.0, "b": 1.0}, source_col="source", key="doc_id"
    )
    assert out.count() == corpus.count()


def test_mixture_sample_drops_unlisted_sources_by_default(spark, corpus):
    out = sampling.mixture_sample(
        corpus, {"a": 1.0}, source_col="source", key="doc_id"
    )
    assert {r["source"] for r in out.collect()} == {"a"}


def test_mixture_sample_deterministic_and_nested(spark, corpus):
    """The fraction-f sample is a SUBSET of the fraction-g sample for
    f <= g (nested samples — the property hash-threshold sampling
    guarantees and rand() sampling does not)."""
    small = sampling.mixture_sample(corpus, {"a": 0.3, "b": 0.3}, key="doc_id")
    big = sampling.mixture_sample(corpus, {"a": 0.8, "b": 0.8}, key="doc_id")
    s = {r["doc_id"] for r in small.collect()}
    b = {r["doc_id"] for r in big.collect()}
    assert s <= b
    assert {r["doc_id"] for r in small.collect()} == s  # stable re-run


# ------------------------------------------------------ sequence packing


def test_pack_sequences_offsets_and_straddle(spark, corpus):
    out = curation.pack_sequences(corpus, max_tokens=5).collect()
    by_id = {r["doc_id"]: r for r in out}
    # source a, id order 1,2,3: token counts 4,4,4
    assert by_id[1]["token_offset"] == 0 and by_id[1]["pack_id"] == 0
    assert by_id[2]["token_offset"] == 4 and by_id[2]["pack_id"] == 0
    assert by_id[3]["token_offset"] == 8 and by_id[3]["pack_id"] == 1
    # source b: counts 4, 0 (blank), 1 — groups pack independently
    assert by_id[4]["token_offset"] == 0
    assert by_id[5]["n_tokens"] == 0 and by_id[5]["token_offset"] == 4
    assert by_id[6]["token_offset"] == 4 and by_id[6]["pack_id"] == 0


def test_pack_stats_totals(spark, corpus):
    packed = curation.pack_sequences(corpus, max_tokens=5)
    stats = {
        (r["source"], r["pack_id"]): (r["n_docs"], r["tokens_in_pack"])
        for r in curation.pack_stats(packed).collect()
    }
    assert stats[("a", 0)] == (2, 8)
    assert stats[("a", 1)] == (1, 4)
    assert stats[("b", 0)] == (3, 5)


def test_chunk_documents_offsets_overlap_and_validation(spark):
    import pandas as pd
    import pytest

    from job_post_similarity_spark.operators.curation import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [" ".join(toks), "short doc"]})
    )
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, max_tokens=4, overlap=1).collect()
    )
    # doc 1: starts 0,3,6,9 -> 4 chunks; consecutive chunks share 1 token
    d1 = [r for r in rows if r[0] == 1]
    assert [r[1] for r in d1] == [0, 1, 2, 3]
    assert d1[0][2] == "t0 t1 t2 t3" and d1[1][2] == "t3 t4 t5 t6"
    assert d1[3][2] == "t9" and d1[3][3] == 1
    # every token appears in at least one chunk
    covered = set(" ".join(r[2] for r in d1).split())
    assert covered == set(toks)
    # doc 2 fits one chunk
    d2 = [r for r in rows if r[0] == 2]
    assert d2 == [(2, 0, "short doc", 2)]
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)


def test_contamination_matrix_planted(spark):
    """Two sources sharing exactly one trigram, a third sharing
    nothing: shared counts and directional containment come out
    exact."""
    from pyspark.sql import functions as F

    from job_post_similarity_spark.operators.curation import (
        contamination_matrix,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d", "s1"),      # grams: "a b c", "b c d"
            (2, "a b c x y", "s2"),    # grams: "a b c", "b c x", "c x y"
            (3, "p q r s", "s3"),      # disjoint
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r["src_a"], r["src_b"]): r
        for r in contamination_matrix(df, "source", n=3).collect()
    }
    r12 = out[("s1", "s2")]
    assert r12["shared_grams"] == 1
    assert r12["grams_a"] == 2 and r12["grams_b"] == 3
    assert r12["containment_a_ppm"] == 500_000  # 1/2
    assert r12["containment_b_ppm"] == 333_333  # 1//3 in ppm
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_curriculum_shards_stats(spark):
    """Shard cut respects the (score desc, id asc) total order: shard
    boundaries are monotone in score and sizes are shard_size except
    the tail."""
    from pyspark.sql import functions as F

    from job_post_similarity_spark.operators.curation import (
        curriculum_shards,
    )

    rows = [(i, float(1000 - i)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = curriculum_shards(df, "score", shard_size=4).collect()
    assert [r["shard"] for r in out] == [0, 1, 2]
    assert [r["docs"] for r in out] == [4, 4, 2]
    # monotone: every shard's min >= next shard's max
    for a, b in zip(out, out[1:]):
        assert a["score_min"] >= b["score_max"]


def test_prepare_pretraining_corpus_end_to_end(spark):
    """The e2e pipeline on a planted fixture: two near-identical
    English docs (one token apart) must collapse to ONE survivor —
    the higher-quality one — while a distinct doc survives untouched;
    output is one row per component with a cluster-keyed split."""
    from job_post_similarity_spark.plans.pipeline import (
        prepare_pretraining_corpus,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and runs for "
        "a while with great energy in the morning light that is nice"
    )
    rows = [
        (1, base),
        # near-dup of 1: one APPENDED token keeps the shingle Jaccard
        # at 22/23 ~ 0.96 (a changed mid-token costs 3 shingles and
        # drops banding recall to a coin flip at 4x4 banding) and the
        # extra token raises the quality length term => keep-best
        # must pick doc 2
        (2, base + " again"),
        (
            3,
            "a completely different story about the sea and the wind "
            "that is told in the evening for everyone to hear with joy",
        ),
        (4, "too short to pass"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_pretraining_corpus(df).collect()
    ids = [r["doc_id"] for r in out]
    # doc 4 fails min_words; docs 1/2 collapse; doc 3 survives
    assert 3 in ids and 4 not in ids
    assert len({1, 2} & set(ids)) == 1
    surv = next(r for r in out if r["doc_id"] in (1, 2))
    # keep-best: the longer near-dup has the higher quality score
    assert surv["doc_id"] == 2
    assert surv["component"] == 1  # component label = min member id
    assert all(r["split"] in ("train", "eval") for r in out)
    # one row per component
    comps = [r["component"] for r in out]
    assert len(comps) == len(set(comps))
    # determinism
    again = prepare_pretraining_corpus(df).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_prepare_pretraining_corpus_xxh_tier(spark):
    """The PRODUCTION (xxhash64) near-dup tier of the e2e pipeline on
    the same planted fixture: identical collapse/keep-best/split
    semantics as the md5 oracle tier — both tiers verify candidates
    with exact n-gram Jaccard at the same threshold, so on pairs the
    banding proposes they agree exactly (the planted near-dup's
    Jaccard ~0.96 makes the 4x4-band candidate deterministic for the
    fixed seed)."""
    from job_post_similarity_spark.plans.pipeline import (
        prepare_pretraining_corpus,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and runs for "
        "a while with great energy in the morning light that is nice"
    )
    rows = [
        (1, base),
        (2, base + " again"),
        (
            3,
            "a completely different story about the sea and the wind "
            "that is told in the evening for everyone to hear with joy",
        ),
        (4, "too short to pass"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_pretraining_corpus(df, near_dup_tier="xxh").collect()
    ids = [r["doc_id"] for r in out]
    assert 3 in ids and 4 not in ids
    assert len({1, 2} & set(ids)) == 1
    surv = next(r for r in out if r["doc_id"] in (1, 2))
    assert surv["doc_id"] == 2
    assert surv["component"] == 1
    assert all(r["split"] in ("train", "eval") for r in out)
    comps = [r["component"] for r in out]
    assert len(comps) == len(set(comps))
    # cross-tier agreement on this fixture: same survivors and splits
    # as the md5 oracle tier (exact verify makes precision identical;
    # the planted candidates are found by both banding families)
    md5_out = prepare_pretraining_corpus(df).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, md5_out))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="near_dup_tier"):
        prepare_pretraining_corpus(df, near_dup_tier="nope").collect()
