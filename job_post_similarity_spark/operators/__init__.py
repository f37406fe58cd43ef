from . import (  # noqa: F401
    asof,
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
