"""Sessionization: batch window-function form vs the stateful streaming
form (applyInPandasWithState), plus semantics unit checks.

The streaming test replays the sf0.001 events as a 2-file stream
(maxFilesPerTrigger=1, availableNow) so the per-user open-session state
must survive across micro-batches; every session the stream emits as
closed must exactly match the batch result, and the only missing ones
are each user's final (still-open) session.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from sparkbigdatatextanalysis_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return entry_mod._events(spark, SF).cache()


def test_sessions_partition_events(spark, events):
    sessions = sessionize_batch(events)
    n_events = events.count()
    agg = sessions.agg(
        F.sum("n_events").alias("total"), F.count("*").alias("n_sessions")
    ).first()
    assert agg["total"] == n_events
    assert 0 < agg["n_sessions"] <= n_events


def test_session_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 10, 1.0),
        (2, "2024-01-01 00:10:00", 10, 2.0),
        (3, "2024-01-01 01:00:00", 10, 4.0),   # 50 min gap -> new session
        (4, "2024-01-01 00:00:00", 20, 8.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, ts_s STRING, user_id LONG, value DOUBLE"
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "value")
    got = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["sum_value"])
        for r in sessionize_batch(df).collect()
    }
    assert got == {(10, 1): (2, 3.0), (10, 2): (1, 4.0), (20, 1): (1, 8.0)}


def test_streaming_matches_batch_closed_sessions(spark, events, tmp_path):
    # two files split at the median ts -> state must cross micro-batches
    med = events.select(F.unix_micros("ts").alias("us")).approxQuantile("us", [0.5], 0.0)[0]
    src = str(tmp_path / "events_stream")
    events.where(F.unix_micros("ts") <= med).coalesce(1).write.parquet(f"{src}/f0")
    time.sleep(1.1)  # file-source orders batches by mod time
    events.where(F.unix_micros("ts") > med).coalesce(1).write.parquet(f"{src}/f1")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"].isoformat()): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql("select * from sessions_out").collect()
    }

    batch = sessionize_batch(events).collect()
    last_idx = {}
    for r in batch:
        last_idx[r["user_id"]] = max(last_idx.get(r["user_id"], 0), r["session_idx"])
    expected = {
        (r["user_id"], r["session_start"].isoformat()): (r["n_events"], round(r["sum_value"], 6))
        for r in batch
        if r["session_idx"] != last_idx[r["user_id"]]
    }
    assert got == expected


def test_native_session_window_matches_expression_path(spark):
    """F.session_window (the built-in session operator) must produce
    the same sessions as the lag/running-sum expression path on the
    real events table — same starts, ends, counts and sums."""
    from sparkbigdatatextanalysis_spark.streaming.sessionize import (
        sessionize_batch,
        sessionize_native,
    )

    import __spark_entry__ as entry_mod

    # the entry loader owns the ts-encoding normalization (nanosAsLong
    # conf + NTZ cast); reading parquet directly here would duplicate a
    # weaker copy of it
    ev = entry_mod._events(spark, "/root/testdata/sf0.01").where(
        F.col("ts").isNotNull()
    )

    def canon(df):
        # float sums compared with tolerance: the two plans aggregate in
        # different partial orders, so exact equality of round(sum, 6)
        # could flip at a rounding boundary
        return {
            (r["user_id"], r["session_start"], r["session_end"]): (
                r["n_events"],
                r["sum_value"],
            )
            for r in df.collect()
        }

    a = canon(sessionize_batch(ev))
    b = canon(sessionize_native(ev))
    assert set(a) == set(b)
    assert len(a) > 0
    for key, (n_a, s_a) in a.items():
        n_b, s_b = b[key]
        assert n_a == n_b, key
        assert abs(s_a - s_b) < 2e-6, key
