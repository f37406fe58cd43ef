"""Runnable pipeline entry point — the engine's analog of the
reference's ``python app/main.py`` (app/main.py:100-288).

Same four stages, same env-config surface (EngineConfig mirrors
TEXT_COLUMN/ID_COLUMN/INDEX_DESCRIPTION/K_NEIGHBORS/
SIMILARITY_THRESHOLD/SEARCH_SAMPLE_SIZE/USE_GPU), same stage
memoization contract (each stage skipped iff its output exists —
app/main.py:110,130,177) — but each stage is a lazy Spark plan
checkpointed to parquet instead of a pandas/numpy/Faiss artifact:

    Step 1 preprocess  → <out>/processed/      (7-step composite)
    Step 2 embed       → <out>/embeddings/     (pandas-UDF embedder)
    Step 3+4 search    → <out>/similar_pairs/  (+ single-file CSV)

Usage:
    python -m job_post_similarity_spark.main INPUT OUTDIR [--csv]

INPUT is a parquet dir/file or CSV (with header) holding the raw jobs
table; OUTDIR receives the stage checkpoints. All knobs come from the
environment, exactly like the reference's .env.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import EngineConfig
from .operators import ann, knn, preprocess, sampling
from .plans.pipeline import embed_documents
from .session import get_spark
from .sources import io


def run_pipeline(
    spark: SparkSession,
    raw: DataFrame,
    out_dir: str,
    cfg: EngineConfig | None = None,
    write_csv: bool = False,
) -> DataFrame:
    """The reference's run_similarity_pipeline with Spark stages.

    Stage boundaries are parquet checkpoints (cached_stage): re-running
    with existing outputs skips the work, byte-for-byte the reference's
    file-existence memoization semantics.
    """
    cfg = cfg or EngineConfig()

    processed = io.cached_stage(
        spark,
        os.path.join(out_dir, "processed"),
        lambda: preprocess.preprocess_jobs(raw, order_column=cfg.id_column),
    )

    def _embed() -> DataFrame:
        docs = processed
        if cfg.search_sample_size:
            docs = sampling.sample_exact_n(docs, cfg.search_sample_size, cfg.seed)
        emb = embed_documents(
            docs,
            text_col=cfg.text_column,
            id_col=cfg.id_column,
            dim=cfg.embedding_dim,
            seed=cfg.seed,
        )
        return emb.withColumn("embedding", F.col("embedding").cast("array<double>"))

    embeddings = io.cached_stage(
        spark, os.path.join(out_dir, "embeddings"), _embed
    )

    def _search() -> DataFrame:
        if cfg.exact_index():
            return knn.similarity_pairs(
                embeddings, cfg.id_column, "embedding",
                threshold=cfg.similarity_threshold,
            )
        join = ann.index_for_description(cfg.index_description)
        return join(
            embeddings, id_col=cfg.id_column, vec_col="embedding",
            threshold=cfg.similarity_threshold,
        )

    pairs = io.cached_stage(
        spark, os.path.join(out_dir, "similar_pairs"), _search
    )
    if write_csv:
        io.write_csv(
            pairs.orderBy(F.desc("similarity")),
            os.path.join(out_dir, "similarity_results_csv"),
            single_file=True,
        )
    return pairs


def _load_input(spark: SparkSession, path: str) -> DataFrame:
    if path.endswith(".csv") or os.path.isdir(path) and any(
        f.endswith(".csv") for f in os.listdir(path)
    ):
        return io.read_csv(spark, path)
    return io.read_parquet(spark, path)


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__)
        return 2
    in_path, out_dir = argv[0], argv[1]
    write_csv = "--csv" in argv[2:]
    cfg = EngineConfig()
    spark = get_spark("similarity-pipeline", cpus=cfg.cpus)
    raw = _load_input(spark, in_path)
    pairs = run_pipeline(spark, raw, out_dir, cfg, write_csv=write_csv)
    n = pairs.count()
    print(f"duplicate pairs at threshold {cfg.similarity_threshold}: {n}")
    pairs.orderBy(F.desc("similarity")).show(10, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
