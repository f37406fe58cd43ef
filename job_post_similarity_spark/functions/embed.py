"""Text → embedding operators (SURVEY.md §2.9, V1).

Two tiers, same signature, both returning unit-L2-normalized
``array<float>`` (the property the downstream cosine math relies on —
reference: app/generate_embeddings.py:25-50):

1. ``hashing_embedder`` — deterministic, dependency-free feature-hashing
   projection. CI/test-mode embedder (SURVEY.md §7 M3): same text ⇒
   same vector on any machine, no model download. Arrow-batched
   iterator Pandas UDF + numpy; scales linearly, no shuffle.
2. ``sentence_transformer_embedder`` — the reference's
   all-MiniLM-L6-v2 model (app/main.py:43) as an iterator Pandas UDF
   that loads the model ONCE PER EXECUTOR (not per batch) — the Spark
   analog of the reference's single model instance. Gated behind an
   import-try: this container has no torch/sentence-transformers.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN_MOD = 2**31 - 1
_TOKEN_BASE = 1_000_003


def _token_codes(text: str) -> np.ndarray:
    """Stable polynomial rolling-hash code per whitespace token."""
    if not text:
        return np.empty(0, dtype=np.int64)
    codes = []
    for tok in text.lower().split():
        h = 0
        for ch in tok:
            h = (h * _TOKEN_BASE + ord(ch)) % _TOKEN_MOD
        codes.append(h)
    return np.asarray(codes, dtype=np.int64)


def _hash_embed_batch(texts: pd.Series, dim: int, seed: int) -> pd.Series:
    out = []
    for text in texts:
        vec = np.zeros(dim, dtype=np.float64)
        if text is not None:
            codes = _token_codes(text)
            if codes.size:
                # seeded second-level mix so different seeds give
                # different (but still deterministic) projections
                mixed = (codes * (seed * 2 + 1)) % _TOKEN_MOD
                buckets = mixed % dim
                signs = np.where((mixed // dim) % 2 == 0, 1.0, -1.0)
                np.add.at(vec, buckets, signs)
        n = np.linalg.norm(vec)
        if n > 0:
            vec /= n
        out.append(vec.astype(np.float32))
    return pd.Series(out)


def hashing_embedder(dim: int = 64, seed: int = 42):
    """V1 test-mode tier: deterministic seeded hashing projection.

    Returns a Pandas UDF: text column → unit-norm array<float> of
    ``dim``. Pure map-side work — embeds 100 TB with zero shuffles.
    """

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield _hash_embed_batch(s, dim, seed)

    return _embed


def sentence_transformer_embedder(
    model_name: str = "all-MiniLM-L6-v2",
    batch_size: int = 64,
    _loader=None,
):
    """V1 model tier (reference: app/generate_embeddings.py:25-50).

    Iterator Pandas UDF so the model loads once per Python worker and
    is reused across Arrow batches — per-executor model residency, the
    distributed analog of the reference's single in-process model.
    Raises ImportError where sentence-transformers is unavailable
    (this container); callers fall back to ``hashing_embedder``.

    ``_loader`` injects a model factory ``name -> model`` so the UDF
    body — null fill, batch kwargs, ``normalize_embeddings=True``,
    float32 conversion — is executable (and contract-tested) without
    torch in the container; production callers leave it None.
    """
    if _loader is None:
        import sentence_transformers  # noqa: F401 — import-try gate

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        if _loader is not None:
            model = _loader(model_name)
        else:
            from sentence_transformers import SentenceTransformer

            model = SentenceTransformer(model_name)
        for s in it:
            vecs = model.encode(
                s.fillna("").tolist(),
                batch_size=batch_size,
                normalize_embeddings=True,
            )
            yield pd.Series([np.asarray(v, dtype=np.float32) for v in vecs])

    return _embed


def get_embedder(dim: int = 64, seed: int = 42, model_name: str | None = None):
    """Config-driven tier selection with graceful fallback
    (mirrors the reference's USE_GPU fallback pattern,
    app/vector_search.py:53-76)."""
    if model_name:
        try:
            return sentence_transformer_embedder(model_name)
        except ImportError:
            pass
    return hashing_embedder(dim=dim, seed=seed)
