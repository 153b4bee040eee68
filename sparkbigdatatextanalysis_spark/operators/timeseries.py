"""Time-series densification (gap filling).

The reference has no time dimension at all (SURVEY.md §2.5 — "no
date/json functions anywhere"); this module adds the grid-densify
operator every event/metrics pipeline needs: turn an irregular event
stream into a regular per-key time grid with explicit zero rows for
empty buckets, so downstream windows/rolling stats see every bucket.

Scale shape: aggregate FIRST (events collapse to |key × active-bucket|
rows — the only pass over the raw 100 TB), derive each key's [min, max]
bucket span from that small aggregate, then explode a `sequence()` per
key (rows generated map-side, no shuffle) and left-join the aggregate
back on (key, bucket). Grid size is bounded by |keys| × span-buckets,
independent of raw event count. The final join is equi-key on a
composite high-cardinality key — balanced partitions, AQE-coalescible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gap_fill(
    events: DataFrame,
    key: str,
    ts: str = "ts",
    bucket: str = "1 hour",
    aggs: dict[str, Column] | None = None,
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Densify ``events`` to one row per (``key``, time bucket) over each
    key's observed [first, last] bucket span.

    ``aggs`` maps output column name -> aggregate expression over the
    events in a bucket (default ``{"n_events": count(*)}``); ``fill``
    gives the value used for empty buckets (default 0 for every agg).
    ``bucket`` is ``"N unit"`` with unit in second/minute/hour/day/week;
    edges come from exact integer floor arithmetic on epoch seconds
    (UTC-aligned, so "1 day" == date_trunc('day') under the session's
    UTC pin), which keeps aggregation buckets and the sequence() grid
    stride consistent for multi-unit buckets like "15 minutes". NB:
    "week" buckets are epoch-aligned (start on Thursday), not ISO
    Monday like date_trunc('week').
    """
    from ..functions.intervals import parse_interval_seconds

    step = parse_interval_seconds(bucket)
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    fill = fill or {}
    b = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts)) / step).cast("long") * step
    ).alias("bucket")
    per_bucket = events.groupBy(F.col(key), b).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    bounds = per_bucket.groupBy(key).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    grid = bounds.select(
        key,
        F.explode(
            F.sequence(F.col("_b0"), F.col("_b1"), F.expr(f"interval {bucket}"))
        ).alias("bucket"),
    )
    out = grid.join(per_bucket, [key, "bucket"], "left")
    filled = [
        F.coalesce(F.col(name), F.lit(fill.get(name, 0))).alias(name)
        for name in aggs
    ]
    return out.select(key, "bucket", *filled)
