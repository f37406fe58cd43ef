from .pipeline import run_similarity_pipeline  # noqa: F401
