"""User sessionization: the engine's custom stateful operator.

A session is a maximal run of one user's events with no gap larger than
``gap_minutes`` between consecutive events. Two forms, same semantics:

* :func:`sessionize_batch` -- declarative window functions (lag ->
  session-start flags -> running sum -> groupBy). Fully relational, so it
  is DuckDB-oracle-checkable and scales like any windowed aggregation
  (one shuffle on user_id; partitions are per-user event runs).
* :func:`sessionize_stream` -- Structured Streaming
  ``applyInPandasWithState``: per-user state holds the open session
  (start, last ts, counts); closed sessions are emitted as soon as a
  gap or stream progress proves them closed. State is one tiny tuple per
  active user -- bounded by the active-user cardinality, not the stream
  length, which is what keeps it viable on an unbounded 100 TB/day feed.

The reference has no streaming at all (SURVEY.md §2.5); this pairs with
streaming/aggregations.py to cover the stateful side.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..serde import ship_by_value

# Worker-bound closures travel by value so executor Python workers
# never need this package on their own sys.path (see serde.py).
ship_by_value(__name__)

SESSION_GAP_MINUTES = 30

# applyInPandasWithState schemas: timestamps carried as epoch micros in
# state (plain longs serialize cheapest), real timestamps in output.
SESSION_OUTPUT_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, "
    "n_events BIGINT, sum_value DOUBLE"
)
SESSION_STATE_SCHEMA = "start_us BIGINT, last_us BIGINT, n_events BIGINT, sum_value DOUBLE"

_US_PER_MIN = 60 * 1_000_000


def sessionize_batch(events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """(user_id, session_idx, session_start, session_end, n_events,
    sum_value): gap-based sessions via lag + running sum of session-start
    flags. Ties on ts break by event_id so the split is deterministic."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = gap_minutes * _US_PER_MIN
    prev_us = F.lag(F.unix_micros("ts")).over(order)
    is_new = F.when(
        prev_us.isNull() | ((F.unix_micros("ts") - prev_us) > gap_us), 1
    ).otherwise(0)
    return (
        events.withColumn("_new", is_new)
        .withColumn("session_idx", F.sum("_new").over(running))
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def _emit(user_id: Any, start_us: int, last_us: int, n: int, sv: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
            "sum_value": [round(sv, 6)],
        }
    )


def _sessionize_group(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    batch = pd.concat(list(pdfs), ignore_index=True).sort_values(["ts", "event_id"])
    ts_us = batch["ts"].astype("int64") // 1000  # ns -> us
    values = batch["value"].astype("float64")

    if state.exists:
        start_us, last_us, n, sv = state.get
    else:
        start_us, last_us, n, sv = None, None, 0, 0.0

    out = []
    for t, v in zip(ts_us.tolist(), values.tolist()):
        if last_us is None:
            start_us, last_us, n, sv = t, t, 1, v
        elif t - last_us > gap_us:
            out.append(_emit(user_id, start_us, last_us, n, sv))
            start_us, last_us, n, sv = t, t, 1, v
        else:
            last_us, n, sv = t, n + 1, sv + v
    state.update((int(start_us), int(last_us), int(n), float(sv)))
    if out:
        yield pd.concat(out, ignore_index=True)


def sessionize_stream(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """Streaming sessionization: emits each session once it is proven
    closed by a later event of the same user. The per-user open session
    rides in GroupState; output mode is append."""
    gap_us = gap_minutes * _US_PER_MIN

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_us)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_native(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """Spark's BUILT-IN session operator (``F.session_window``) driving
    the same gap-based sessionization: one groupBy(user, session_window)
    — no lag/running-sum windows at all — with the engine's native
    session merging (usable unchanged in Structured Streaming with a
    watermark, where merging sessions is state the custom
    applyInPandasWithState path manages by hand).

    Same output contract as :func:`sessionize_batch` minus the
    session_idx ordinal (the native operator identifies sessions by
    window, not by per-user sequence), with two documented semantic
    edges: (a) EXACTLY gap distance — the expression path keeps
    ``diff == gap`` in one session, session_window splits it,
    irrelevant off the knife's edge of microsecond timestamps; and
    (b) NULL timestamps — Spark filters NULL session windows so the
    native path DROPS those rows, while the expression path emits one
    degenerate NULL-start session each. Filter NULL ts upstream (the
    entry pipeline's normalize step does) before swapping one for the
    other; equality on the real events is asserted in tests.
    """
    return (
        events.groupBy(
            "user_id", F.session_window("ts", f"{gap_minutes} minutes").alias("_w")
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .drop("_w")
    )
