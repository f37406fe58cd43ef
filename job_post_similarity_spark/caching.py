"""Cache-layout policies for persisted relations (VERDICT r12 item 6).

The session factory sets
``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true``
(session.py), so AQE re-partitions CACHED plans by BYTES. That is the
scale-adaptive behavior wanted for data-sized relations — but it is
wrong for relations that are small in bytes yet CPU-DENSE downstream
(round 12 measured two such regressions: the curation table feeding
shingle/verify and the SRP band-signature table feeding the band
self-join, both silently serialized by byte-based coalescing and
reactively re-pinned).

To make that decision explicit and auditable, every DataFrame
``.persist()`` on a query path routes through one of these helpers
via ``DataFrame.transform`` and DECLARES its layout policy:

- ``.transform(cache_auto)`` — byte-sized AQE re-layout is correct
  (the default for data-sized relations: coalescing tracks the data,
  which is exactly what a cluster wants);
- ``.transform(cache_pinned(*keys))`` — an EXPLICIT partition count
  (cluster-scaled ``defaultParallelism`` unless overridden),
  optionally keyed; explicit counts are never AQE-coalesced, so
  downstream CPU-dense stages keep their parallelism at any byte
  size.

``tools/cache_census.py`` statically lists every call site with its
policy and FAILS (strict mode, wired into tools/verify_all.py) on any
bare ``.persist()`` left on a query path — a new cached relation
cannot be added without declaring how it is laid out. (RDD-level
``.rdd.persist()`` sites are outside DataFrame cache planning and are
allowlisted there.)
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def cache_auto(df: DataFrame) -> DataFrame:
    """Persist with the byte-sized AQE-coalescible layout (default)."""
    return df.persist()


def cache_pinned(
    *keys: str, partitions: int | None = None
) -> Callable[[DataFrame], DataFrame]:
    """Persist behind an EXPLICIT cluster-scaled partition count
    (optionally keyed) — never AQE-coalesced. For relations small in
    bytes but CPU-dense downstream."""

    def apply(df: DataFrame) -> DataFrame:
        n = (
            partitions
            if partitions is not None
            else df.sparkSession.sparkContext.defaultParallelism
        )
        rep = df.repartition(n, *keys) if keys else df.repartition(n)
        return rep.persist()

    return apply
