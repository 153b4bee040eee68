"""Heartbeat / dead-key detection: emit a row when a key goes silent.

The inverse of every other streaming operator here: instead of reacting
to events that ARRIVE, it reacts to events that STOP arriving -- the
"sensor went dark" / "feed stalled" alert a monitoring pipeline needs.

This is the module that exercises **event-time timeouts**
(``GroupStateTimeout.EventTimeTimeout``): each key's state stores its
last-seen event time and registers a timeout at ``last_seen + gap``;
when the query's watermark passes that deadline with no new event, the
group fires with ``state.hasTimedOut`` and the operator emits one
silence row and REMOVES the state. That removal is the scale property:
state is bounded by currently-live keys -- dead keys are evicted by the
engine, not leaked forever (contrast NoTimeout operators, whose state
is bounded by key cardinality). A key that comes back after a silence
simply re-registers -- each silence episode emits exactly once.

Timezone correctness: the state math never touches pandas-converted
timestamps (Spark renders those in SESSION-LOCAL wall time, which would
shift the registered deadline by the UTC offset and either delay alerts
or crash the query with a deadline-below-watermark error). Instead true
epoch microseconds are computed JVM-side (``unix_micros``) before the
stateful stage, and the emitted micros are converted back JVM-side
(``timestamp_micros``) after it -- correct under any session timezone.

Timing semantics (engine-defined): timeouts fire in the first
micro-batch AFTER the watermark advances past the deadline, so a
silence row's emission requires some later event (any key) to push the
watermark. New data for a group takes precedence over its pending
timeout -- a key that resumes before its timeout is processed emits NO
alert for the past gap, even if its event-time silence exceeded the
threshold (this detector reports keys that are silent NOW, not a
retrospective gap census; use the batch inter-arrival histogram for
that). The input stream must carry a watermark (``withWatermark``) --
enforced by Spark itself for EventTimeTimeout.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.intervals import parse_interval_seconds

from ..serde import ship_by_value

# Worker-bound closures travel by value so executor Python workers
# never need this package on their own sys.path (see serde.py).
ship_by_value(__name__)

_RAW_OUTPUT_SCHEMA = "user_id BIGINT, last_us BIGINT, deadline_us BIGINT"
HEARTBEAT_STATE_SCHEMA = "last_us BIGINT"


def silence_alerts(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Append-mode (user_id, last_ts, deadline_ts) rows, one per silence
    episode: the key's last event time and the deadline it blew.

    ``events`` must have (user_id, ts); the watermark is applied here so
    callers don't need to. ``gap`` is ``"N unit"`` with unit in
    seconds/minutes/hours/days (validated up front -- a zero or negative
    gap would otherwise kill the query mid-stream with Spark's
    deadline-below-watermark error).
    """
    gap_ms = (
        parse_interval_seconds(gap, ("second", "minute", "hour", "day"))
        * 1000
    )

    def fn(
        key_: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key_
        if state.hasTimedOut:
            (last_us,) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "last_us": [last_us],
                    "deadline_us": [last_us + gap_ms * 1000],
                }
            )
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch_max_us = int(batch["ts_us"].max())
        if state.exists:
            (last_us,) = state.get
            last_us = max(last_us, batch_max_us)
        else:
            last_us = batch_max_us
        state.update((int(last_us),))
        # Event-time timeout deadline is in TRUE epoch milliseconds;
        # ts_us is unix_micros, so this is timezone-independent.
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)
        return

    raw = (
        events.select(
            "user_id", "ts", F.unix_micros(F.col("ts")).alias("ts_us")
        )
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_RAW_OUTPUT_SCHEMA,
            stateStructType=HEARTBEAT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return raw.select(
        "user_id",
        F.timestamp_micros("last_us").alias("last_ts"),
        F.timestamp_micros("deadline_us").alias("deadline_ts"),
    )
