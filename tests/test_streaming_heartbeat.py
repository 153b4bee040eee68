"""Heartbeat/silence detection (streaming/heartbeat.py): event-time
timeouts must fire for keys that go quiet, evict their state, and stay
silent for keys that keep reporting."""

from __future__ import annotations

import datetime as dt
import time

import pytest

from sparkbigdatatextanalysis_spark.streaming.heartbeat import silence_alerts

SCHEMA = "user_id BIGINT, ts TIMESTAMP"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def test_silence_alert_fires_and_state_evicts(spark, tmp_path):
    """User 2 stops after minute 1; user 1 keeps reporting. Replayed as
    3 time-ordered files so the watermark advances past user 2's
    deadline while the query still has batches to run (timeouts fire in
    the batch after the watermark moves)."""
    src = str(tmp_path / "hb_stream")
    batches = [
        [(1, _t(0)), (2, _t(1))],
        [(1, _t(20))],          # watermark -> min 20, past 2's deadline
        [(1, _t(40))],          # processes user 2's pending timeout
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{src}/f{i}"
        )
        time.sleep(1.1)  # file source orders batches by mod time

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = (
        silence_alerts(stream, gap="10 minutes")
        .writeStream.format("memory")
        .queryName("hb_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.table("hb_out").collect()
    got = {
        (r["user_id"], r["last_ts"].isoformat(), r["deadline_ts"].isoformat())
        for r in rows
    }
    # user 2: last seen minute 1, deadline minute 11, blown
    assert (2, _t(1).isoformat(), _t(11).isoformat()) in got
    # user 1 kept reporting within each gap until the stream ended:
    # no alert for its trailing silence (watermark never passed its
    # final deadline before the query drained)
    assert all(u != 1 for u, _, _ in got)
    assert len(got) == 1


def test_silence_alerts_rejects_bad_gap(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError, match="unsupported interval unit"):
        silence_alerts(df, gap="2 fortnights")
    with pytest.raises(ValueError, match="count must be >= 1"):
        silence_alerts(df, gap="0 minutes")
    with pytest.raises(ValueError, match="interval must be"):
        silence_alerts(df, gap="10minutes")


def test_silence_alert_per_episode_on_recovery(spark, tmp_path):
    """A key that dies, alerts, recovers, then dies again must alert once
    PER episode (state re-registers after eviction)."""
    src = str(tmp_path / "hb2_stream")
    batches = [
        [(2, _t(0)), (1, _t(0))],
        [(1, _t(20))],            # wm 20: episode-1 deadline (min 10) blown
        [(1, _t(22))],            # fires ep-1 alert (no user-2 data here --
                                  # data in the firing batch would cancel it)
        [(2, _t(25)), (1, _t(25))],  # user 2 recovers, re-registers
        [(1, _t(50))],            # wm 50: episode-2 deadline (min 35) blown
        [(1, _t(70))],            # fires ep-2 alert
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{src}/f{i}"
        )
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = (
        silence_alerts(stream, gap="10 minutes")
        .writeStream.format("memory")
        .queryName("hb2_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    two = sorted(
        (r["last_ts"].isoformat(), r["deadline_ts"].isoformat())
        for r in spark.table("hb2_out").collect()
        if r["user_id"] == 2
    )
    assert two == [
        (_t(0).isoformat(), _t(10).isoformat()),
        (_t(25).isoformat(), _t(35).isoformat()),
    ]


def test_silence_alerts_correct_under_non_utc_session(spark, tmp_path):
    """The deadline math must hold under a non-UTC session timezone
    (regression: pandas-converted timestamps are session-local wall
    time; using them as epoch shifted deadlines by the UTC offset)."""
    src = str(tmp_path / "hb3_stream")
    batches = [
        [(1, _t(0)), (2, _t(1))],
        [(1, _t(20))],
        [(1, _t(40))],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{src}/f{i}"
        )
        time.sleep(1.1)

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )
        q = (
            silence_alerts(stream, gap="10 minutes")
            .writeStream.format("memory")
            .queryName("hb3_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.table("hb3_out").collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)

    # With the UTC pin restored, read the values back as instants: the
    # alert still refers to minute 1 + 10-minute deadline.
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 2
    assert (r["deadline_ts"] - r["last_ts"]).total_seconds() == 600
