"""Streaming funnel tracking: the stateful twin of operators/funnel.py.

Emits a (user_id, step_idx, step, reach_ts) row the moment a user first
completes each funnel step, where "completes step k" means the earliest
event of the step's type strictly after the user reached step k-1 --
exactly the first-touch semantics of :func:`..operators.funnel.funnel_steps`
(the batch form aggregates these reach events to per-step user counts).

State per user is TWO numbers (next step index + last reach time), so
total state is bounded by the active-user cardinality regardless of
stream length -- same viability story as streaming sessionization.

Ordering: events are processed in (ts, event_id) order within each
micro-batch, and the per-user state machine assumes batches arrive in
event-time order per user (the file-replay tests split by time; a
production deployment puts a watermark-sorted stage or a time-ordered
log like Kafka-per-key in front). An event arriving out of order behind
an already-recorded reach is ignored, not retro-corrected -- the
standard streaming-funnel tradeoff.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..serde import ship_by_value

# Worker-bound closures travel by value so executor Python workers
# never need this package on their own sys.path (see serde.py).
ship_by_value(__name__)

FUNNEL_OUTPUT_SCHEMA = (
    "user_id BIGINT, step_idx BIGINT, step STRING, reach_ts TIMESTAMP"
)
FUNNEL_STATE_SCHEMA = "next_idx BIGINT, last_us BIGINT"


def _funnel_group(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    steps: Sequence[str],
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts", "event_id"]
    )
    if state.exists:
        next_idx, last_us = state.get
    else:
        # -2^62 sentinel: below any real epoch-micros timestamp (incl.
        # pre-1970), so the step-0 comparison is effectively
        # unconditioned like the batch form's plain min.
        next_idx, last_us = 0, -(2**62)

    out_idx: list[int] = []
    out_ts: list[int] = []
    if next_idx < len(steps):
        ts_us = (batch["ts"].astype("int64") // 1000).tolist()
        types = batch["event_type"].tolist()
        for t, et in zip(ts_us, types):
            if et == steps[next_idx] and t > last_us:
                out_idx.append(next_idx)
                out_ts.append(t)
                next_idx, last_us = next_idx + 1, t
                if next_idx == len(steps):
                    break
    state.update((int(next_idx), int(last_us)))
    if out_idx:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_idx),
                "step_idx": out_idx,
                "step": [steps[i] for i in out_idx],
                "reach_ts": [pd.Timestamp(t, unit="us") for t in out_ts],
            }
        )


def funnel_stream(events: DataFrame, steps: Sequence[str]) -> DataFrame:
    """Streaming first-touch funnel: append-mode reach events per user.

    The first-step comparison starts from a below-any-timestamp
    sentinel, i.e. any event qualifies -- mirroring the batch form's
    unconditioned min for step 0.
    """
    if not steps:
        raise ValueError("funnel_stream: no steps given")
    steps = list(steps)

    def fn(key, pdfs, state):
        return _funnel_group(key, pdfs, state, steps)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
