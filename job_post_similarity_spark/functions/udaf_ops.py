"""Pandas GROUPED_AGG UDAF surface (SURVEY.md §2.11 UDF family —
completes the scalar / iterator / UDTF trio with the aggregate
flavor).

A GROUPED_AGG pandas UDF receives each group's column as one Arrow
batch and returns one scalar — the escape hatch for aggregates Spark
lacks natively. Caveats the docstrings below encode: the WHOLE group
materializes in one worker (fine for bounded groups; an algebraic
rewrite like ``cdc.partial_agg`` is the 100 TB path when groups are
unbounded), and it composes with both ``groupBy().agg`` and
``Window.partitionBy`` frames.

Exact median is the canonical example precisely because Spark's
builtin is ``percentile_approx``-sketch-based at scale while DuckDB's
``median`` is exact — the UDAF closes that parity gap for
oracle-checkable group sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def median_udaf(v: pd.Series) -> float:
    """Exact per-group median, SQL null semantics (nulls skipped;
    all-null group → NULL). Even-sized groups average the two middle
    values — ``(a + b) / 2`` in IEEE double, the same computation
    DuckDB's ``median`` performs, so results are bit-identical."""
    x = v.dropna()
    if len(x) == 0:
        return None
    return float(np.median(x.to_numpy(dtype=np.float64)))


@pandas_udf(DoubleType())
def trimmed_mean_udaf(v: pd.Series) -> float:
    """10%-trimmed per-group mean (drops the ⌊n·0.1⌋ smallest and
    largest values — the robust location estimate between mean and
    median). Null-skipping; all-null group → NULL."""
    x = v.dropna().to_numpy(dtype=np.float64)
    if x.size == 0:
        return None
    k = int(x.size * 0.1)
    x.sort()
    kept = x[k: x.size - k] if x.size > 2 * k else x
    return float(kept.mean())
