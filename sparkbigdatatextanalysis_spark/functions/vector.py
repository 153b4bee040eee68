"""Dense-vector expressions over ARRAY<FLOAT|DOUBLE> columns.

All math stays JVM-side via higher-order array functions (zip_with /
aggregate / transform) -- one row in, one scalar out, no explode, no
shuffle, no Python. This is the hot path for embedding similarity at
scale: a brute-force top-k over N vectors is a (pruned) join producing
N*Q rows, each evaluating these expressions in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def vec_dot(a: Column, b: Column) -> Column:
    """Sparse-free dot product: sum(a[i]*b[i]) (reference semantics of
    calculateDotProduct, EntityResolution.scala:368-384, for the dense case).
    """
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_norm(a: Column) -> Column:
    """L2 norm (reference calculateNorm, EntityResolution.scala:386-393)."""
    return F.sqrt(
        F.aggregate(
            F.transform(_as_double(a), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def vec_cosine(a: Column, b: Column) -> Column:
    """dot/(|a||b|); NaN when a norm is zero, matching the reference's
    unguarded division (EntityResolution.scala:395-404).
    """
    return vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
