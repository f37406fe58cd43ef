"""Categorical feature engineering: the hashing-trick vectorizer
(sklearn FeatureHasher / Vowpal Wabbit shape) as pure JVM column
expressions — fixed-width feature vectors from arbitrary categorical
columns with no vocabulary pass, no fit state, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def feature_hash(
    columns: list[str],
    dim: int = 64,
) -> Column:
    """Hashing-trick vectorizer: each ``column=value`` feature hashes
    (md5-prefix — the repo's cross-engine string hash) into one of
    ``dim`` buckets; the output is the dense ``array<int>`` of bucket
    counts. Collisions are the accepted trade (that's the hashing
    trick); NULL values contribute nothing. No vocabulary, no fit,
    no shuffle — the encoder a 100 TB feature pipeline can apply
    map-side forever, stable under new categories.

    Namespacing: the column NAME is hashed into the key
    (``"col=value"``), so equal values in different columns land in
    independent buckets — the VW namespace convention.
    """
    buckets = F.array(
        *[
            F.when(
                F.col(c).isNotNull(),
                F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(c + "="),
                                    F.col(c).cast("string"),
                                )
                            ),
                            1,
                            14,
                        ),
                        16,
                        10,
                    ).cast("long"),
                    F.lit(dim),
                ),
            )
            for c in columns
        ]
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.size(
            F.filter(buckets, lambda b: b.isNotNull() & (b == i))
        ),
    )
