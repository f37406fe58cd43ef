"""Runnable evaluation harness — the engine's analog of
``python app/evaluation.py`` + ``python app/fetech_jd.py``
(app/evaluation.py:234-309, app/fetech_jd.py:64-186).

Produces the reference's evaluation artifacts from Spark plans:

    <out>/qualitative/          wide Neighbor_1..k report (CSV)
    <out>/random_baseline/      sampled random-pair similarities (CSV)
    <out>/histogram/            binned two-population distribution (CSV)
    <out>/lookup_report.md      fetech_jd-style point-lookup markdown

The distribution PNG (app/evaluation.py:201-232) is rendered only if
matplotlib is importable (not in this container) — the binned
histogram CSV carries the same information and is what the driver's
oracle checks.

Usage:
    python -m job_post_similarity_spark.evaluate EMB_PARQUET META_PARQUET OUTDIR
where EMB holds (id, embedding) and META holds (id, title-ish column).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import EngineConfig
from .operators import knn
from .plans.pipeline import lookup_report, qualitative_report
from .session import get_spark
from .sources import io


def run_evaluation(
    spark: SparkSession,
    emb: DataFrame,
    meta: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    title_col: str = "source",
    cfg: EngineConfig | None = None,
    n_queries: int = 50,
    n_random_pairs: int = 5000,
    bins: int = 20,
) -> dict[str, str]:
    """Run the three evaluation artifacts + the lookup report.
    Returns {artifact: path}."""
    cfg = cfg or EngineConfig()
    out: dict[str, str] = {}

    qual = qualitative_report(
        emb, meta, id_col, title_col, k=min(cfg.k_neighbors + 3, 5),
        n_queries=n_queries, seed=cfg.seed,
    )
    path = os.path.join(out_dir, "qualitative")
    io.write_csv(qual, path, single_file=True)
    out["qualitative"] = path

    rand_pairs = knn.random_pair_baseline(
        emb, id_col, "embedding", n_pairs=n_random_pairs, seed=cfg.seed
    )
    path = os.path.join(out_dir, "random_baseline")
    io.write_csv(rand_pairs, path, single_file=True)
    out["random_baseline"] = path

    # two-population histogram: NN-pair sims vs random-pair sims
    nn = knn.knn_join(emb, id_col, "embedding", k=1).select(
        F.col("similarity").alias("s"), F.lit("nn").alias("population")
    )
    rnd = rand_pairs.select(
        F.col("similarity").alias("s"), F.lit("random").alias("population")
    )
    both = nn.unionByName(rnd)
    hist = (
        both.select(
            "population",
            F.least(
                F.floor(F.abs(F.col("s")) * bins).cast("int"), F.lit(bins - 1)
            ).alias("bin"),
        )
        .groupBy("population", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("population", "bin")
    )
    path = os.path.join(out_dir, "histogram")
    io.write_csv(hist, path, single_file=True)
    out["histogram"] = path
    _maybe_plot(hist, os.path.join(out_dir, "similarity_distribution.png"))

    pairs = knn.similarity_pairs(
        emb, id_col, "embedding",
        threshold=min(cfg.similarity_threshold, 0.40),
    )
    md = lookup_report(pairs, meta, id_col, title_col)
    path = os.path.join(out_dir, "lookup_report.md")
    os.makedirs(out_dir, exist_ok=True)
    with open(path, "w") as f:
        f.write(md)
    out["lookup_report"] = path
    return out


def _maybe_plot(hist: DataFrame, png_path: str) -> None:
    """PNG tier of S8 — import-gated (matplotlib absent here)."""
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        return
    import matplotlib.pyplot as plt  # pragma: no cover

    pdf = hist.toPandas()
    for pop, grp in pdf.groupby("population"):
        plt.bar(grp["bin"], grp["cnt"], alpha=0.5, label=pop)
    plt.legend()
    plt.savefig(png_path)
    plt.close()


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__)
        return 2
    emb_path, meta_path, out_dir = argv[:3]
    cfg = EngineConfig()
    spark = get_spark("similarity-eval", cpus=cfg.cpus)
    emb = io.read_parquet(spark, emb_path)
    meta = io.read_parquet(spark, meta_path)
    arts = run_evaluation(spark, emb, meta, out_dir, cfg=cfg)
    for k, v in arts.items():
        print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))


def srp_recall_sweep(
    df,
    param_grid=((4, 8), (8, 16), (8, 32)),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 1,
    n_queries: int = 50,
    seed: int = 42,
):
    """Operating-point tuner for the SRP-LSH tier: for each
    (bits_per_band, num_bands) pair, measure top-k recall of
    ``srp_topk_search`` against the exact tier on a seeded query
    sample. Returns a list of dicts (bits, bands, recall, n_queries) —
    the table you consult before committing an operating point for a
    100 TB run (the banding formula gives the theoretical curve; this
    measures it on YOUR vectors).

    Cost: one exact kNN over the sample (the ground truth, computed
    once) + one relational SRP search per grid point. The corpus is
    never collected; recall is a small join-and-agg per point.
    """
    from pyspark.sql import functions as F

    from .operators import ann, knn
    from .operators.sampling import sample_exact_n

    queries = sample_exact_n(df, n_queries, seed=seed).cache()
    try:
        truth = (
            knn.knn_join(
                queries, id_col, vec_col, k=k, include_self=False, right=df
            )
            .select(
                F.col("query_id"), F.col("neighbor_id").alias("__true_nbr")
            )
            .cache()
        )
        n_truth = truth.count()
        results = []
        for bits, bands in param_grid:
            approx = ann.srp_topk_search(
                queries, df, k=k, id_col=id_col, vec_col=vec_col,
                bits_per_band=bits, num_bands=bands, seed=seed,
            ).alias("s")
            hits = approx.join(
                truth.alias("t"),
                on=[
                    F.col("s.query_id") == F.col("t.query_id"),
                    F.col("s.neighbor_id") == F.col("t.__true_nbr"),
                ],
            ).count()
            results.append(
                {
                    "bits_per_band": bits,
                    "num_bands": bands,
                    "recall": round(hits / n_truth, 4) if n_truth else 0.0,
                    "n_queries": n_queries,
                }
            )
        return results
    finally:
        queries.unpersist()
