"""job_post_similarity_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
single-node pipeline (RaccoonOnion/job-post-similarity, studied
read-only at /root/reference): relational preprocessing, text
cleaning, deterministic + model embeddings, exact and approximate
k-NN similarity self-joins, duplicate-pair emission, profiling
aggregates, and evaluation reports — all as lazy DataFrame
transformations optimized by Catalyst, designed to scale from
local[32] to a multi-executor cluster over 100 TB.

Package map (SURVEY.md §2 operator inventory → modules):
- ``sources``    — scans/sinks (S1-S8)
- ``functions``  — scalar string/date/math (F1-F12) and vector (V3-V4)
  column expressions + embedders (V1)
- ``operators``  — preprocess (P1-P8, D1), profiling (A1-A6),
  top-k/pivot (W1-W2), dedup suite (D1-D3 + MinHash/SimHash/…),
  exact kNN join (J1 exact tier), ANN (J1 LSH tier), sampling
  (R1-R2), text analysis, multimodal plumbing
- ``plans``      — composed pipelines + memoized stage runner
- ``streaming``  — Structured Streaming variants of dedup/aggregation
"""

__version__ = "0.1.0"
