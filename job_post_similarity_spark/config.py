"""Engine configuration, mirroring the reference's env-driven config surface.

The reference reads everything from environment variables with defaults
(reference: app/main.py:31-58, .env:7-20). We keep the same names and
defaults so a user of the reference can switch without relearning knobs,
plus Spark-specific additions (cpus, shuffle partitions).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str) -> str:
    v = os.environ.get(name)
    return default if v is None or v == "" else v


@dataclass
class EngineConfig:
    """Config for the similarity pipeline.

    Reference parity (app/main.py:31-58):
      TEXT_COLUMN / ID_COLUMN / EMBEDDING_DIM / INDEX_DESCRIPTION /
      K_NEIGHBORS / SIMILARITY_THRESHOLD / SEARCH_SAMPLE_SIZE / USE_GPU.
    ``use_gpu`` is accepted-and-ignored (horizontal scale replaces device
    offload; reference: app/vector_search.py:53-76).
    """

    text_column: str = field(default_factory=lambda: _env("TEXT_COLUMN", "jobDescClean"))
    id_column: str = field(default_factory=lambda: _env("ID_COLUMN", "lid"))
    embedding_dim: int = field(default_factory=lambda: int(_env("EMBEDDING_DIM", "384")))
    index_description: str = field(
        default_factory=lambda: _env("INDEX_DESCRIPTION", "HNSW32")
    )
    k_neighbors: int = field(default_factory=lambda: int(_env("K_NEIGHBORS", "2")))
    similarity_threshold: float = field(
        default_factory=lambda: float(_env("SIMILARITY_THRESHOLD", "0.90"))
    )
    search_sample_size: int | None = field(
        default_factory=lambda: (
            int(os.environ["SEARCH_SAMPLE_SIZE"])
            if os.environ.get("SEARCH_SAMPLE_SIZE")
            else None
        )
    )
    use_gpu: bool = field(
        default_factory=lambda: _env("USE_GPU", "False").lower() in ("1", "true", "yes")
    )
    # Spark-side knobs (not in the reference).
    cpus: int = field(default_factory=lambda: int(_env("SPARK_GRAFT_CPUS", "32")))
    sf_dir: str = field(
        default_factory=lambda: _env("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    seed: int = 42

    def exact_index(self) -> bool:
        """'Flat' → exact crossJoin tier; IVF*/HNSW* → ANN (LSH) tier.

        Mirrors the reference's index_description switch
        (app/vector_search.py:42-47).
        """
        return self.index_description.strip().lower() == "flat"
