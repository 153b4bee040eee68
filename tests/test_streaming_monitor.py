"""Streaming anomaly monitor (streaming/monitor.py) vs its batch twin.

Same harness as the streaming funnel test: replay sf0.001 events as a
2-file time-split stream so per-key Welford state must survive across
micro-batches; the streamed anomaly rows must equal the batch scan
EXACTLY (shared scan code + bit-exact state round-trip)."""

from __future__ import annotations

import math
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from sparkbigdatatextanalysis_spark.streaming.monitor import (
    anomaly_scan,
    anomaly_stream,
)

SF = "/root/testdata/sf0.001"


def _key(r):
    return (r["user_id"], r["event_id"], r["ts"].isoformat(), r["value"],
            r["zscore"], r["n_prior"])


def test_anomaly_scan_flags_known_outlier(spark):
    import datetime as dt

    rows = [
        (1, i, dt.datetime(2024, 1, 1, 0, i), 10.0 + (i % 3))  # tame values
        for i in range(10)
    ] + [(1, 10, dt.datetime(2024, 1, 1, 0, 30), 500.0)]  # clear outlier
    ev = spark.createDataFrame(
        rows, "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, value DOUBLE"
    )
    out = anomaly_scan(ev, threshold=3.0, min_n=5).collect()
    assert [r["event_id"] for r in out] == [10]
    r = out[0]
    # z-score against the stats of the 10 prior values, ddof=1
    prior = np.array([10.0 + (i % 3) for i in range(10)])
    expect = (500.0 - prior.mean()) / prior.std(ddof=1)
    assert r["n_prior"] == 10
    assert r["zscore"] == pytest.approx(expect, rel=1e-12)


def test_anomaly_scan_min_n_gate(spark):
    import datetime as dt

    # Second value is wildly off, but with only 1 prior observation the
    # min_n gate must suppress the alert (and with n=1, variance is 0).
    rows = [(1, 0, dt.datetime(2024, 1, 1), 1.0), (1, 1, dt.datetime(2024, 1, 2), 99.0)]
    ev = spark.createDataFrame(
        rows, "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, value DOUBLE"
    )
    assert anomaly_scan(ev, threshold=1.0, min_n=5).count() == 0


def test_streaming_monitor_matches_batch(spark, tmp_path):
    events = entry_mod._events(spark, SF).cache()
    med = events.select(F.unix_micros("ts").alias("us")).approxQuantile(
        "us", [0.5], 0.0
    )[0]
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
        anomaly_stream(stream, threshold=2.5, min_n=5)
        .writeStream.format("memory")
        .queryName("monitor_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(_key(r) for r in spark.table("monitor_out").collect())
    exp = sorted(
        _key(r) for r in anomaly_scan(events, threshold=2.5, min_n=5).collect()
    )
    assert len(exp) > 0, "no anomalies at this threshold -- test is vacuous"
    assert got == exp


def test_anomaly_scan_constant_history_spike(spark):
    """Zero-variance prior history then a spike: must emit a signed-
    infinity z-score, not silently suppress (regression for the
    var>0-only guard)."""
    import datetime as dt

    rows = [(1, i, dt.datetime(2024, 1, 1, 0, i), 5.0) for i in range(8)]
    rows += [(1, 8, dt.datetime(2024, 1, 1, 1, 0), 500.0),
             (1, 9, dt.datetime(2024, 1, 1, 1, 1), -500.0)]
    ev = spark.createDataFrame(
        rows, "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, value DOUBLE"
    )
    out = {r["event_id"]: r["zscore"]
           for r in anomaly_scan(ev, threshold=3.0, min_n=5).collect()}
    assert out[8] == math.inf
    # after the +500 spike the variance is huge; -500 may or may not
    # trip the threshold -- only event 8's detection is the contract
    assert 8 in out


def test_streaming_monitor_checkpoint_restart(spark, tmp_path):
    """Welford state must survive a checkpointed restart: replaying the
    second half in a NEW query against the same checkpoint yields the
    same anomalies as one batch scan of everything."""
    events = entry_mod._events(spark, SF).cache()
    med = events.select(F.unix_micros("ts").alias("us")).approxQuantile(
        "us", [0.5], 0.0
    )[0]
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    events.where(F.unix_micros("ts") <= med).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            anomaly_stream(stream, threshold=2.5, min_n=5)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    events.where(F.unix_micros("ts") > med).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()

    got = sorted(_key(r) for r in spark.read.parquet(sink).collect())
    exp = sorted(
        _key(r) for r in anomaly_scan(events, threshold=2.5, min_n=5).collect()
    )
    assert len(exp) > 0
    assert got == exp


def test_anomaly_scan_sql_equals_pandas_scan(spark):
    """The JVM window formulation (the 100 TB batch plan) must flag the
    same events as the Welford scan, with z-scores equal at round-6
    (two-pass vs online recurrence differ only in low-order bits)."""
    import pyspark.sql.functions as F

    from sparkbigdatatextanalysis_spark.streaming.monitor import (
        anomaly_scan,
        anomaly_scan_sql,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    def canon(df):
        return {
            (r["user_id"], r["event_id"]): (round(r["zscore"], 6), r["n_prior"])
            for r in df.collect()
        }

    a = canon(anomaly_scan(ev))
    b = canon(anomaly_scan_sql(ev))
    assert a == b
    assert len(a) > 0
