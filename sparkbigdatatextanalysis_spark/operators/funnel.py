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

The streaming twin (per-user state machine emitting reach events live)
is :func:`..streaming.funnel.funnel_stream`; its output equals
:func:`funnel_reaches` when the stream is replayed in time order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _reach_chain(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str,
    type_col: str,
    ts_col: str,
) -> list[DataFrame]:
    """Per-step first-reach tables (u, rt), chained first-touch."""
    chain: list[DataFrame] = []
    reached: DataFrame | None = None
    for step in steps:
        stage = events.where(F.col(type_col) == step).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t")
        )
        if reached is not None:
            stage = stage.join(reached, "u").where(F.col("t") > F.col("rt"))
        # persist: each reach table feeds BOTH its own output and the next
        # stage's join, and Catalyst does not CSE across those branches --
        # without the barrier stage k's whole chain re-runs once per later
        # step. The table is one row per reached user, the smallest thing
        # in the query.
        reached = stage.groupBy("u").agg(F.min("t").alias("rt")).persist()
        chain.append(reached)
    return chain


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel over ``events`` -> (step_idx, step, n_users), one row per
    step (zero-user steps included), where n_users counts users whose
    event history contains the step sequence in strictly increasing
    time order (first-touch)."""
    if not steps:
        raise ValueError("funnel_steps: no steps given")
    chain = _reach_chain(events, steps, user_col, type_col, ts_col)
    counts = [
        reached.agg(
            F.lit(idx).cast("long").alias("step_idx"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )
        for idx, (step, reached) in enumerate(zip(steps, chain))
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def funnel_reaches(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user reach events -> (user_id, step_idx, step, reach_ts), one
    row per (user, reached step) -- the row-level form funnel_steps
    aggregates, and the exact batch equivalent of the streaming funnel's
    append output."""
    if not steps:
        raise ValueError("funnel_reaches: no steps given")
    chain = _reach_chain(events, steps, user_col, type_col, ts_col)
    parts = [
        reached.select(
            F.col("u").alias("user_id"),
            F.lit(idx).cast("long").alias("step_idx"),
            F.lit(step).alias("step"),
            F.col("rt").alias("reach_ts"),
        )
        for idx, (step, reached) in enumerate(zip(steps, chain))
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
