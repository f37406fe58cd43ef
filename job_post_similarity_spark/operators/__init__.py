from . import (  # noqa: F401
    dedup,
    knn,
    preprocess,
    profiling,
    sampling,
    text_analysis,
    topk,
)
