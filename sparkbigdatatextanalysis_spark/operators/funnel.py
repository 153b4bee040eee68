"""Sequential funnel analysis over an event stream.

"How many users did A, then later B, then later C?" -- the standard
product-analytics funnel, here expressed as a chain of per-user
first-reach aggregations. Not in the reference (which is batch
entity-resolution only); included because any engine fronting a large
event feed is asked this query daily.

Semantics: a user reaches step k+1 at the EARLIEST event of that type
strictly after the time they reached step k (first-touch attribution).
Reaching times are min-aggregates, so results are deterministic and
engine-independent.

Scale: each stage is one filter (pushed to the scan) + one equi-join on
the high-cardinality user key + one partial-aggregated min. Stage
inputs shrink monotonically (step k+1 joins only users who reached
step k), so the chain costs at most ``len(steps)`` user-keyed shuffles
over progressively smaller tables -- no windows over the full stream,
no per-user event collection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel over ``events`` -> (step_idx, step, n_users), one row per
    step, where n_users counts users whose event history contains the
    step sequence in strictly increasing time order (first-touch)."""
    if not steps:
        raise ValueError("funnel_steps: no steps given")
    counts = []
    reached: DataFrame | None = None
    for idx, step in enumerate(steps):
        stage = events.where(F.col(type_col) == step).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t")
        )
        if reached is not None:
            stage = stage.join(reached, "u").where(F.col("t") > F.col("rt"))
        # persist: each reach table feeds BOTH its own count and the next
        # stage's join, and Catalyst does not CSE across those branches --
        # without the barrier stage k's whole chain re-runs once per later
        # step. The table is one row per reached user, the smallest thing
        # in the query.
        reached = stage.groupBy("u").agg(F.min("t").alias("rt")).persist()
        counts.append(
            reached.agg(
                F.lit(idx).cast("long").alias("step_idx"),
                F.lit(step).alias("step"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out
