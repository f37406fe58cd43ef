"""Golden-artifact replay of the reference pipeline contract.

The reference ships one headline artifact —
``analysis_files/similarity_results.csv``: 44,489 duplicate pairs at
cosine ≥ 0.90, canonical ``id1 < id2`` (app/main.py:253-254), sorted
descending, with the threshold justified by a two-population
similarity histogram (NN pairs vs 5,000 random pairs,
app/evaluation.py:182-232) whose populations separate cleanly
(BASELINE.md rows "output duplicate pairs" / "NN-pair similarity
population" / "eval: random-pair baseline").

This module replays the SHAPE of that artifact end-to-end on the
driver fixture with the deterministic hashing embedder, and pins
every clause of the contract — not per-operator properties, but the
whole pipeline's emitted artifact (VERDICT r5 item 4). The absolute
pair count is pinned by determinism (two runs, exact equality), not
by a magic number: the fixture corpus is not the jobs corpus, so
44,489 itself is not reproducible here — the reference's *invariants*
are.
"""

import pytest
from pyspark.sql import functions as F

from job_post_similarity_spark.config import EngineConfig
from job_post_similarity_spark.functions import strings as S
from job_post_similarity_spark.operators import knn, preprocess
from job_post_similarity_spark.plans.pipeline import (
    embed_documents,
    jobs_view_from_documents,
    run_similarity_pipeline,
)


@pytest.fixture(scope="module")
def golden_pairs(spark, documents):
    """The flagship pipeline at the reference's exact config: exact
    (Flat) search, threshold 0.90 (app/main.py:49, .env:11)."""
    cfg = EngineConfig()
    cfg.index_description = "Flat"
    cfg.similarity_threshold = 0.90
    return run_similarity_pipeline(spark, documents, cfg).collect()


def test_pair_count_is_stable_and_nonempty(spark, documents, golden_pairs):
    """Pair-count stability: the deterministic embedder + exact search
    must reproduce the identical pair set run-over-run (the reference's
    44,489 is a committed, reproducible artifact — ours must be too)."""
    cfg = EngineConfig()
    cfg.index_description = "Flat"
    cfg.similarity_threshold = 0.90
    again = run_similarity_pipeline(spark, documents, cfg).collect()
    assert len(golden_pairs) > 0
    assert len(again) == len(golden_pairs)
    assert {(r["id1"], r["id2"], r["similarity"]) for r in again} == {
        (r["id1"], r["id2"], r["similarity"]) for r in golden_pairs
    }


def test_canonical_pairs_threshold_and_sort(golden_pairs):
    """The emitted artifact's row contract (app/main.py:253-261):
    id1 < id2 canonical orientation, no duplicate pairs, similarity
    rounded into [0.90, 1.0], sorted descending."""
    assert all(r["id1"] < r["id2"] for r in golden_pairs)
    assert len({(r["id1"], r["id2"]) for r in golden_pairs}) == len(
        golden_pairs
    )
    sims = [r["similarity"] for r in golden_pairs]
    assert all(0.90 <= s <= 1.0 for s in sims)
    assert all(a >= b for a, b in zip(sims, sims[1:]))


def test_threshold_monotonicity(spark, documents, golden_pairs):
    """Raising the threshold must yield a SUBSET of the pairs — the
    precision-first threshold policy the reference's justification PDF
    argues from (a higher cut can only drop pairs, never admit new
    ones)."""
    cfg = EngineConfig()
    cfg.index_description = "Flat"
    cfg.similarity_threshold = 0.95
    tighter = run_similarity_pipeline(spark, documents, cfg).collect()
    base = {(r["id1"], r["id2"]) for r in golden_pairs}
    tight = {(r["id1"], r["id2"]) for r in tighter}
    assert tight <= base
    assert len(tight) < len(base)
    # and the subset is exactly the rows that clear the higher cut
    expect = {
        (r["id1"], r["id2"])
        for r in golden_pairs
        if r["similarity"] >= 0.95
    }
    assert tight == expect


def test_planted_duplicates_removed_before_search(spark, documents):
    """The reference drops 9,635 jobDescClean duplicates keep-first
    BEFORE embedding (app/preprocess_data.py:59-71, BASELINE.md) — the
    load-bearing operator order. The jobs view plants a constant
    duplicate posting on every 17th row; after the 7-step preprocess,
    exactly ONE survivor of that text must remain."""
    jobs = jobs_view_from_documents(documents)
    out = preprocess.preprocess_jobs(jobs, order_column="lid")
    n_planted = out.filter(
        F.col("jobDescClean") == "common duplicate posting"
    ).count()
    assert n_planted == 1
    # and the full output is unique on the cleaned description
    assert (
        out.select("jobDescClean").distinct().count() == out.count()
    )


def test_two_population_histogram_separation(spark, documents):
    """The threshold-justification contract (app/evaluation.py:182-232,
    Threshold Justification PDF p.1): nearest-neighbor pair sims
    concentrate high while random-pair sims concentrate low — the two
    populations must separate, putting the 0.90 threshold above the
    random population's mass."""
    cfg = EngineConfig()
    docs = documents.withColumn("text", S.clean_text("text")).filter(
        F.col("text").isNotNull() & (F.col("text") != "")
    )
    docs = preprocess.dedup_keep_first(docs, ["text"], [F.col("doc_id")])
    emb = embed_documents(
        docs, "text", "doc_id", dim=64, seed=cfg.seed
    ).withColumn("embedding", F.col("embedding").cast("array<double>"))

    nn = sorted(
        r["similarity"]
        for r in knn.knn_join(emb, "doc_id", "embedding", k=1).collect()
    )
    rnd = sorted(
        r["similarity"]
        for r in knn.random_pair_baseline(
            emb, "doc_id", "embedding", n_pairs=500, seed=7
        ).collect()
    )
    assert len(nn) > 100 and len(rnd) > 50
    med_nn = nn[len(nn) // 2]
    med_rnd = rnd[len(rnd) // 2]
    # separation: medians at least 0.15 apart (measured: 0.898 vs
    # 0.665 on the sf0.001 fixture), and the high-similarity mass
    # belongs overwhelmingly to the NN population
    assert med_nn - med_rnd > 0.15
    frac_nn_high = sum(1 for s in nn if s >= 0.8) / len(nn)
    frac_rnd_high = sum(1 for s in rnd if s >= 0.8) / len(rnd)
    assert frac_nn_high > 0.8
    assert frac_rnd_high < 0.2
    # the operating threshold sits above the random population: at
    # most a sliver of random pairs clears 0.90
    assert sum(1 for s in rnd if s >= 0.90) / len(rnd) < 0.02
