"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <sf>}

Each query is executed to completion (count() action drains the whole
plan) after a warm-up of the session; per-query wall-clock is recorded
separately so regressions localize.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "broadcast_lookup_customers",
    "preprocess_jobs_pipeline",
    "sessionize_events",
    "window_topk_orders",
    "dedup_keep_first_events",
    "deterministic_sample_lineitem",
    "knn_exact_top1",
    "similarity_pairs_flagship",
    "substring_dup_spans_documents",
    # r6: keys renamed with the registry — these are the SAME production
    # functions benched since r1 as minhash_near_dup_documents /
    # srp_lsh_similarity_pairs (those names now run the oracle-graded
    # deterministic tiers; see NOTES.md round 6). _auto is the
    # planner-knob operating point next to the _fixed stress curve.
    "minhash_near_dup_xxh_documents",
    "srp_lsh_similarity_pairs_fixed",
    "srp_lsh_similarity_pairs_auto",
    "ivf_similarity_pairs",
    "shard_topk_search",
    "asof_join_events",
    "token_count_documents",
    "doc_fingerprint_documents",
    "embed_documents_hashing",
    # round-4 corpus-scale additions
    "bigram_perplexity_documents",
    "frequent_tokens_documents",
    "bloom_decontaminate_documents",
    "fuzzy_join_suppliers",
    "line_dedup_documents",
    "pagerank_lineitem_graph",
    # round-4 continuation additions
    "bpe_merge_pairs_documents",
    "basket_lift_lineitem",
    "prefix_jaccard_docs",
    "cohort_retention_events",
    # round-4 third-session additions
    "semantic_dedup_embeddings",
    "dsir_weights_documents",
    # round-4 fourth-session additions
    "rrf_hybrid_documents",
    "hamming_rerank_embeddings",
    "fim_transform_documents",
    "token_budget_mixture_documents",
    "keep_best_dedup_documents",
    "bpe_train_encode_documents",
    # round-5: TPC-H completion representatives (scan-agg / deep
    # multi-join / correlated-agg / having-join shapes)
    "q6_forecast_revenue",
    "q9_product_profit",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    # round-7: the e2e pretraining-corpus flagship at the PRODUCTION
    # near-dup tier (xxhash candidates + exact verify); the md5
    # oracle tier stays grading-only — VERDICT r6 item 3
    "pretraining_corpus_xxh_documents",
    # round-8: the r7 fused graph gate (build+serve+exact check,
    # 23% of the bench) split so serving latency is visible —
    # VERDICT r7 item 4. graph_build_embeddings is the cold
    # NN-Descent build (iterative scheduling floor locally, like
    # pagerank); graph_serve_embeddings beam-searches 50 queries
    # against the MEMOIZED parquet edge artifact (min-of-3 measures
    # serve alone — the number a VectorSearch('HNSW32') user pays
    # per batch). The fused recall gate stays in the graded registry.
    "graph_build_embeddings",
    "graph_serve_embeddings",
    # warm-start maintenance: 50 appended rows re-converged in 2 warm
    # rounds from the stored artifact (vs the cold 3-round build row
    # above) — VERDICT r7 item 5's refresh-vs-rebuild evidence
    "graph_refresh_embeddings",
    # round-8: unigram-LM tokenizer training (distributed Viterbi EM)
    "unigram_train_documents",
    # round-9: the SentencePiece-faithful loss prune adds a what-if
    # Viterbi pass per (word, path piece) — tracked as its own row so
    # the prune criterion's cost over the freq tier stays visible
    "unigram_loss_prune_documents",
    # round-9 session 2: warm layered-HNSW descent (hierarchy
    # RAM-resident, min-of-N measures the top-down serve alone) next
    # to the flat graph_serve row, and the cross-corpus Stupid
    # Backoff LM scoring pipeline (train even half, score odd half)
    "hnsw_serve_embeddings",
    "ngram_lm_score_documents",
    # round-10: incremental HIERARCHY maintenance (50 appended rows
    # repair the resident layered hierarchy per layer — layer 0 via
    # graph_insert, upper layers only where a twin's md5 level
    # reaches) next to the layer-0-only graph_refresh row; insert ≡
    # rebuilt is hash-graded by hierarchy_insert_exact_embeddings
    "hnsw_insert_embeddings",
    # round-11: RaBitQ 1-bit asymmetric-estimator quantizer (sign-
    # code scan + exact rerank over the planted union) — the
    # quantizer-family completion next to the ivf/pq/hamming rows
    "rabitq_planted_recall_embeddings",
    # round-12 (VERDICT r11 item 5): the RaBitQ,IVF composition
    # (coarse-pruned 1-bit scan) and the streaming 1-bit serving twin
    # recorded next to their flat sibling, so the whole tier's scale
    # behavior is visible in SCALING.md
    "rabitq_ivf_planted_recall_embeddings",
    "stream_rabitq_topk_embeddings",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entrymod
    from job_post_similarity_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus)

    # Warm up the JVM + parquet footer caches with a trivial action so
    # query timings measure the plan, not session startup.
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()

    headline = HEADLINE
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name in headline:
        if name not in qs:
            continue
        # min of three runs: the first warms shuffle files/broadcasts;
        # host-CPU steal on shared infrastructure swings identical runs
        # 2-10× (measured), so the min over three is the reproducible
        # per-query cost
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.count()
            best = min(best, time.time() - t0)
        dt = round(best, 3)
        timings[name] = dt
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_suite_wallclock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs_per_query": 3,
                "aggregation": "min",
            }
        )
    )


if __name__ == "__main__":
    main()
