"""Streaming latest-per-key compaction: the streaming form of
``operators.relational.keep_latest`` (CDC upsert view maintenance).

Each micro-batch may contain any mix of keys and out-of-order rows; the
operator maintains, per key, the row with the greatest (ts, tiebreak)
seen so far and emits a change-log record WHENEVER that winner changes
(append mode -- the emitted stream is the upsert feed a downstream sink
applies; the last emission per key IS the batch ``keep_latest`` answer).

State is one fixed-size tuple per distinct key -- bounded by key
cardinality, not stream length, the same 100 TB argument as
sessionization. Late rows older than the current winner update nothing
and emit nothing, so replays/duplicates are naturally idempotent.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..serde import ship_by_value

# Worker-bound closures travel by value so executor Python workers
# never need this package on their own sys.path (see serde.py).
ship_by_value(__name__)

# Latest-event compaction over the synthetic events stream: key=user_id,
# winner order = (ts, event_id), payload = (event_type, value).
OUTPUT_SCHEMA = (
    "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE"
)
STATE_SCHEMA = "ts_us BIGINT, event_id BIGINT, event_type STRING, value DOUBLE"


def _compact_group(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    batch = pd.concat(list(pdfs), ignore_index=True)
    ts_us = batch["ts"].astype("int64") // 1000  # ns -> us

    best = state.get if state.exists else None  # (ts_us, event_id, type, value)
    out = []
    # winner scan in (ts, event_id) order so intra-batch supersedes emit
    # only once per batch-final winner change
    order = sorted(
        zip(
            ts_us.tolist(),
            batch["event_id"].tolist(),
            batch["event_type"].tolist(),
            batch["value"].tolist(),
        )
    )
    for t, eid, etype, val in order:
        if best is None or (t, eid) > (best[0], best[1]):
            best = (int(t), int(eid), etype, float(val))
    if best is not None and (not state.exists or tuple(state.get) != best):
        state.update(best)
        out.append(
            pd.DataFrame(
                {
                    "user_id": [user_id],
                    "event_id": [best[1]],
                    "ts": [pd.Timestamp(best[0], unit="us")],
                    "event_type": [best[2]],
                    "value": [best[3]],
                }
            )
        )
    if out:
        yield pd.concat(out, ignore_index=True)


def keep_latest_stream(events: DataFrame) -> DataFrame:
    """Streaming change-log of each user's latest event. Emits one row
    per (key, micro-batch) at most -- only when the winner changed."""
    return events.groupBy("user_id").applyInPandasWithState(
        _compact_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
