from . import (  # noqa: F401
    dedup,
    knn,
    preprocess,
    profiling,
    sampling,
    sessionize,
    text_analysis,
    topk,
)
