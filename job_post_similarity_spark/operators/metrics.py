"""Evaluation-metric operators: ranking metrics for the retrieval
tiers and classification metrics for the labeling tiers — computed
distributively so a 100 TB eval set never funnels through the driver.

Cross-engine policy: counts are exact integers; every ratio is either
integer ppm (floor div outside the aggregates) or a micro-rounded
integer sum (log2-based DCG terms — the bigram-perplexity policy), so
an independent engine reproduces the numbers bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def ranking_metrics(
    df: DataFrame,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "relevant",
    k: int = 10,
) -> DataFrame:
    """Per-query ranking metrics over a ``(query, rank, relevant)``
    result table (rank 1-based, one row per retrieved item,
    ``rel_col`` boolean/0-1): hit@k, reciprocal rank (ppm), DCG@k
    and ideal DCG@k (micro-int), NDCG@k (ppm) — the retrieval-eval
    core (MRR / NDCG / recall come from averaging these columns).

    All per-item terms are fixed-shape (1/rank, 1/log2(rank+1))
    rounded to micro units BEFORE the per-query integer sums; the
    NDCG ratio is one floor division after. A macro average over
    queries is then a plain integer mean — do it with one more
    aggregate when needed.

    One hash aggregate keyed on the query — |queries| output rows,
    no driver-side loops.
    """
    rel = F.col(rel_col).cast("int")
    ink = F.col(rank_col) <= k
    rr6 = F.when(
        rel == 1, F.round(F.lit(1e6) / F.col(rank_col), 0).cast("long")
    ).otherwise(F.lit(0))
    gain6 = F.when(
        ink & (rel == 1),
        F.round(
            F.lit(1e6) / F.log2(F.col(rank_col) + F.lit(1.0)), 0
        ).cast("long"),
    ).otherwise(F.lit(0))
    per = df.groupBy(F.col(query_col).alias("query")).agg(
        F.count(F.when(ink, 1)).alias("n_retrieved"),
        F.sum(F.when(ink, rel).otherwise(F.lit(0))).alias("n_rel_at_k"),
        F.sum(rel).alias("n_rel_total"),
        F.max(F.when(ink & (rel == 1), 1).otherwise(0)).alias("hit_at_k"),
        F.max(rr6).alias("rr_ppm"),
        F.sum(gain6).alias("dcg6"),
    )
    # ideal DCG@k: the top-min(n_rel_total, k) positions all relevant —
    # a closed-form prefix sum of the same micro table, computed via a
    # small literal cumulative array (k entries, bounded)
    import math

    cum = [0]
    for r in range(1, k + 1):
        cum.append(cum[-1] + int(round(1e6 / math.log2(r + 1))))
    icum = F.array(*[F.lit(v) for v in cum])
    ideal = F.element_at(
        icum, F.least(F.col("n_rel_total"), F.lit(k)).cast("int") + 1
    )
    return (
        per.withColumn("idcg6", ideal)
        .withColumn(
            "ndcg_ppm",
            F.when(
                F.col("idcg6") > 0,
                F.expr(f"({PPM}L * dcg6) div idcg6"),
            ).otherwise(F.lit(0)),
        )
        .orderBy("query")
    )


def classification_report(
    df: DataFrame,
    label_col: str = "label",
    pred_col: str = "pred_label",
) -> DataFrame:
    """Per-class precision / recall / F1 (integer ppm) + support from
    a ``(label, pred)`` table — the eval twin of ``knn.knn_classify``
    and ``nearest_centroid_classify``. Classes = union of true and
    predicted labels; a class never predicted gets precision 0 by
    convention (0/0 → 0, sklearn's zero_division=0).

    ppm policy: tp/fp/fn are exact counts; precision/recall are one
    floor division each; F1 is computed from the INTEGER tp/fp/fn
    (2·tp·PPM div (2·tp + fp + fn)) — not from the rounded
    precision/recall, so no double-rounding drift.

    Two |classes|-sized aggregates (one per axis) full-outer-joined —
    the fact table shuffles twice on a class key, never collected.
    """
    both = df.filter(
        F.col(label_col).isNotNull() & F.col(pred_col).isNotNull()
    )
    by_true = both.groupBy(F.col(label_col).alias("class")).agg(
        F.count(F.lit(1)).alias("support"),
        F.sum(
            F.when(F.col(label_col) == F.col(pred_col), 1).otherwise(0)
        ).alias("__tp_t"),
    )
    by_pred = both.groupBy(F.col(pred_col).alias("class")).agg(
        F.count(F.lit(1)).alias("__n_pred"),
        F.sum(
            F.when(F.col(label_col) == F.col(pred_col), 1).otherwise(0)
        ).alias("__tp_p"),
    )
    j = by_true.join(by_pred, "class", "full_outer").select(
        "class",
        F.coalesce("support", F.lit(0)).alias("support"),
        F.coalesce("__tp_t", F.col("__tp_p"), F.lit(0)).alias("tp"),
        (F.coalesce("__n_pred", F.lit(0))
         - F.coalesce("__tp_p", F.lit(0))).alias("fp"),
        (F.coalesce("support", F.lit(0))
         - F.coalesce("__tp_t", F.lit(0))).alias("fn"),
    )
    prec = F.when(
        (F.col("tp") + F.col("fp")) > 0,
        F.expr(f"({PPM}L * tp) div (tp + fp)"),
    ).otherwise(F.lit(0))
    rec = F.when(
        (F.col("tp") + F.col("fn")) > 0,
        F.expr(f"({PPM}L * tp) div (tp + fn)"),
    ).otherwise(F.lit(0))
    f1 = F.when(
        (2 * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
        F.expr(f"(2 * {PPM}L * tp) div (2 * tp + fp + fn)"),
    ).otherwise(F.lit(0))
    return (
        j.select(
            "class", "support", "tp", "fp", "fn",
            prec.alias("precision_ppm"),
            rec.alias("recall_ppm"),
            f1.alias("f1_ppm"),
        )
        .orderBy("class")
    )


def ngram_precision(
    df: DataFrame,
    id_col: str = "pair_id",
    cand_col: str = "cand_text",
    ref_col: str = "ref_text",
    max_n: int = 2,
) -> DataFrame:
    """BLEU-style modified n-gram precision (Papineni et al. 2002)
    between paired texts — the n-gram-overlap evaluation for
    generation / distillation pipelines, and a graded text-overlap
    signal alongside the binary decontamination gates: for each pair
    and each order n ≤ ``max_n``,

        p_n = Σ_g min(count_cand(g), count_ref(g)) / Σ_g count_cand(g)

    (candidate n-gram counts CLIPPED by the reference count, so
    repeating a matching word cannot inflate the score).

    Output: ``(id, n, clipped_matches, cand_total, precision_ppm)``
    — one row per pair per order, including zero-overlap pairs.
    Everything is exact integer counts; the ratio is integer floor
    division in millionths — engine-exact. Pairs whose candidate has
    fewer than n tokens yield cand_total 0 and precision 0.

    Scale shape: per order, each side is one map-side n-gram
    generation (``transform(sequence(...))`` — no per-token explode
    before grouping) + one hash aggregate on (id, gram); the clip is
    an equi-join on the same key. No global state, no driver data.
    """
    def _gram_counts(col: str, n: int, out: str) -> DataFrame:
        t = F.filter(
            F.split(F.trim(F.lower(F.col(col))), r"\s+"),
            lambda x: x != "",
        )
        grams = F.expr(
            f"CASE WHEN size(__t) >= {n} THEN"
            f"  transform(sequence(1, size(__t) - {n} + 1),"
            f"            i -> array_join(slice(__t, i, {n}), ' '))"
            " ELSE array() END"
        )
        return (
            df.select(F.col(id_col), t.alias("__t"))
            .select(id_col, F.explode(grams).alias("gram"))
            .groupBy(id_col, "gram")
            .agg(F.count(F.lit(1)).alias(out))
        )

    base = df.select(id_col)
    parts = []
    for n in range(1, max_n + 1):
        cand = _gram_counts(cand_col, n, "c")
        ref = _gram_counts(ref_col, n, "r")
        totals = cand.groupBy(id_col).agg(
            F.sum("c").alias("cand_total")
        )
        matched = (
            cand.join(ref, [id_col, "gram"])
            .select(id_col, F.least("c", "r").alias("m"))
            .groupBy(id_col)
            .agg(F.sum("m").alias("clipped_matches"))
        )
        parts.append(
            base.join(totals, id_col, "left_outer")
            .join(matched, id_col, "left_outer")
            .select(
                F.col(id_col),
                F.lit(n).alias("n"),
                F.coalesce("clipped_matches", F.lit(0)).alias(
                    "clipped_matches"
                ),
                F.coalesce("cand_total", F.lit(0)).alias("cand_total"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    ppm = F.when(
        F.col("cand_total") > 0,
        F.expr(f"({PPM}L * clipped_matches) div cand_total"),
    ).otherwise(F.lit(0))
    return u.select(
        id_col, "n", "clipped_matches", "cand_total",
        ppm.alias("precision_ppm"),
    ).orderBy(id_col, "n")
