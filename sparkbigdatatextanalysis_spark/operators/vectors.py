"""Embedding-column analytics: per-group centroids.

Complements operators/ann.py (search) and operators/dedup.py (near-dup)
with the aggregation side of vector work — the step that produces IVF
coarse centroids, per-class mean embeddings for classifier probes, or
cluster summaries for curation reports.

Scale shape: ``posexplode`` the vector column so each (group, dim)
partial mean aggregates map-side — the classic way to average vectors
without collecting them: 100 TB of embeddings becomes |groups| x dim
rows after the combiner. Sums go through DECIMAL so the per-dim means
are bit-identical across engines/partitionings (float addition is
order-dependent; decimal addition is associative). The float->double
widening per element is exact, and the final mean division happens in
DOUBLE on already-deterministic inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,15)"


def group_centroids(
    emb: DataFrame,
    group: str = "label",
    vec: str = "embedding",
    round_to: int = 9,
) -> DataFrame:
    """Per-``group`` per-dimension mean of ``vec`` (array<float|double>):
    returns (group, dim, centroid, n_vectors) with ``dim`` 0-based.
    NULL vectors are skipped; ragged lengths simply contribute to the
    dims they have (n_vectors is per-dim for that reason)."""
    ex = emb.where(F.col(vec).isNotNull()).select(
        F.col(group), F.posexplode(vec).alias("dim", "_v")
    )
    return (
        ex.groupBy(group, "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.col("_v").cast("double").cast(_DEC)).alias("_s"),
        )
        .select(
            group,
            "dim",
            F.round(
                F.col("_s").cast("double") / F.col("n_vectors"), round_to
            ).alias("centroid"),
            "n_vectors",
        )
    )
