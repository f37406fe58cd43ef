from . import (  # noqa: F401
    dedup,
    knn,
    preprocess,
    profiling,
    sampling,
    sessionize,
    skew,
    text_analysis,
    topk,
)
