"""Streaming anomaly monitor: per-key running z-score alerting.

The metrics-monitoring twin of the batch ``events_value_zscore`` query
-- but where the batch query standardizes against the FINAL per-type
stats, a monitor must decide ONLINE, against the stats of the events
seen so far. Each value is scored against the Welford running
mean/variance of its key's history (strictly prior events only, so an
outlier never masks itself), and an anomaly row is emitted the moment
``|z| > threshold`` once ``min_n`` prior observations exist.

State per key is three numbers (n, mean, M2) -- bounded by key
cardinality, not stream length, the same viability story as streaming
sessionization/funnel. The same per-key scan runs in the batch form
(``applyInPandas``) and the streaming form (``applyInPandasWithState``),
so streamed output equals the batch scan EXACTLY across any micro-batch
split -- tested in tests/test_streaming_monitor.py.

Ordering: like the funnel, events are processed in (ts, event_id) order
within a micro-batch and batches are assumed time-ordered per key (put
a watermark-sort or a per-key-ordered log in front in production).
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..serde import ship_by_value

# The applyInPandas/applyInPandasWithState closures below must travel by
# value: executor Python workers cannot import this package unless the
# driver happened to start in the repo root (see serde.py).
ship_by_value(__name__)

OUTPUT_SCHEMA = (
    "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, value DOUBLE, "
    "zscore DOUBLE, n_prior BIGINT"
)
STATE_SCHEMA = "n BIGINT, mean DOUBLE, m2 BIGINT"
# m2 crosses the state boundary as int64 raw bits: round-tripping a
# DOUBLE through the state row could in principle be lossy only if the
# backend changed precision, but bit-exact storage makes the
# stream/batch equality proof unconditional.


def _scan_values(
    rows: pd.DataFrame,
    n: int,
    mean: float,
    m2: float,
    threshold: float,
    min_n: int,
):
    """Welford scan over one key's time-ordered rows. Returns
    (anomaly row lists, n, mean, m2)."""
    out = {k: [] for k in ("event_id", "ts", "value", "zscore", "n_prior")}
    for ev_id, ts, x in zip(rows["event_id"], rows["ts"], rows["value"]):
        x = float(x)
        if n >= min_n:
            var = m2 / (n - 1) if n > 1 else 0.0
            if var > 0:
                z = (x - mean) / math.sqrt(var)
            elif x != mean:
                # Constant prior history then a deviation: the clearest
                # possible anomaly. Report signed infinity rather than
                # suppressing it (a var>0-only guard would permanently
                # mute heartbeat-style keys).
                z = math.inf if x > mean else -math.inf
            else:
                z = 0.0
            if abs(z) > threshold:
                out["event_id"].append(ev_id)
                out["ts"].append(ts)
                out["value"].append(x)
                out["zscore"].append(z)
                out["n_prior"].append(n)
        n += 1
        delta = x - mean
        mean += delta / n
        m2 += delta * (x - mean)
    return out, n, mean, m2


def _empty_out() -> pd.DataFrame:
    """Typed empty frame: an all-empty dict would give ts dtype float64,
    which Arrow refuses to cast to timestamp."""
    return pd.DataFrame(
        {
            "user_id": pd.Series(dtype="int64"),
            "event_id": pd.Series(dtype="int64"),
            "ts": pd.Series(dtype="datetime64[us]"),
            "value": pd.Series(dtype="float64"),
            "zscore": pd.Series(dtype="float64"),
            "n_prior": pd.Series(dtype="int64"),
        }
    )


def _emit(key_val, out) -> Iterator[pd.DataFrame]:
    if out["event_id"]:
        yield pd.DataFrame(
            {
                "user_id": [key_val] * len(out["event_id"]),
                "event_id": out["event_id"],
                "ts": out["ts"],
                "value": out["value"],
                "zscore": out["zscore"],
                "n_prior": out["n_prior"],
            }
        )


def anomaly_scan(
    events: DataFrame,
    threshold: float = 3.0,
    min_n: int = 5,
) -> DataFrame:
    """Batch form: per-user sequential Welford scan via Arrow-batched
    applyInPandas (one shuffle on the high-cardinality user key; the
    scan is inherently sequential per key, the key is the parallelism
    unit)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        out, *_ = _scan_values(pdf, 0, 0.0, 0.0, threshold, min_n)
        if not out["event_id"]:
            return _empty_out()
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]] * len(out["event_id"]),
                **{k: out[k] for k in ("event_id", "ts", "value", "zscore", "n_prior")},
            }
        )

    return events.select("user_id", "event_id", "ts", "value").groupBy(
        "user_id"
    ).applyInPandas(fn, schema=OUTPUT_SCHEMA)


def anomaly_stream(
    events: DataFrame,
    threshold: float = 3.0,
    min_n: int = 5,
) -> DataFrame:
    """Streaming form: same scan, state = (n, mean, M2-as-bits) per key,
    anomalies emitted append-mode the moment they are observed."""
    import struct

    def pack(f: float) -> int:
        return struct.unpack("<q", struct.pack("<d", f))[0]

    def unpack(b: int) -> float:
        return struct.unpack("<d", struct.pack("<q", b))[0]

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        if state.exists:
            n, mean, m2_bits = state.get
            m2 = unpack(m2_bits)
        else:
            n, mean, m2 = 0, 0.0, 0.0
        out, n, mean, m2 = _scan_values(batch, n, mean, m2, threshold, min_n)
        state.update((int(n), float(mean), pack(m2)))
        yield from _emit(user_id, out)

    return events.select("user_id", "event_id", "ts", "value").groupBy(
        "user_id"
    ).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def anomaly_scan_sql(
    events: DataFrame,
    threshold: float = 3.0,
    min_n: int = 5,
) -> DataFrame:
    """JVM-side batch scoring: the same strictly-prior z-score as
    :func:`anomaly_scan`, expressed as window functions over the
    (UNBOUNDED PRECEDING .. 1 PRECEDING) frame -- textbook two-pass
    stats instead of the online Welford recurrence, mathematically the
    same quantity (equality pinned at round-6 in
    tests/test_streaming_monitor.py).

    This is the plan to run for BATCH backfills at 100 TB: one shuffle
    on the high-cardinality user key, whole-stage-codegen'd frame
    aggregates, no Python workers. The Arrow ``anomaly_scan`` twin
    exists because the STREAMING operator must carry O(1) state per key
    (n, mean, M2) -- a window frame cannot -- and sharing one scan
    routine is what makes the stream/batch equality proof exact.
    """
    import math as _math

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    n_prior = F.count("value").over(w)
    z = (
        F.when(sd > 0, (F.col("value") - mu) / sd)
        .when(F.col("value") > mu, F.lit(_math.inf))
        .when(F.col("value") < mu, F.lit(-_math.inf))
        .otherwise(F.lit(0.0))
    )
    return (
        events.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            z.alias("zscore"),
            n_prior.alias("n_prior"),
        )
        .where((F.col("n_prior") >= min_n) & (F.abs(F.col("zscore")) > threshold))
    )
