"""Streaming funnel (streaming/funnel.py) vs its batch twin
(operators/funnel.py::funnel_reaches).

The equivalence test replays the sf0.001 events as a 2-file time-split
stream (maxFilesPerTrigger=1, availableNow) so per-user funnel state must
survive across micro-batches; unlike sessionization there is no open-tail
asymmetry — every reach is emitted the moment it happens — so the
streamed output must equal the batch reach table EXACTLY.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from sparkbigdatatextanalysis_spark.operators.funnel import funnel_reaches
from sparkbigdatatextanalysis_spark.streaming.funnel import funnel_stream

SF = "/root/testdata/sf0.001"
STEPS = ["view", "click", "purchase"]


@pytest.fixture(scope="module")
def events(spark):
    return entry_mod._events(spark, SF).cache()


def test_streaming_funnel_matches_batch(spark, events, tmp_path):
    med = events.select(F.unix_micros("ts").alias("us")).approxQuantile(
        "us", [0.5], 0.0
    )[0]
    src = str(tmp_path / "events_stream")
    events.where(F.unix_micros("ts") <= med).coalesce(1).write.parquet(
        f"{src}/f0"
    )
    time.sleep(1.1)  # file-source orders batches by mod time
    events.where(F.unix_micros("ts") > med).coalesce(1).write.parquet(
        f"{src}/f1"
    )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = (
        funnel_stream(stream, STEPS)
        .writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["step_idx"], r["step"], r["reach_ts"].isoformat())
        for r in spark.sql("select * from funnel_out").collect()
    }
    expected = {
        (r["user_id"], r["step_idx"], r["step"], r["reach_ts"].isoformat())
        for r in funnel_reaches(events, STEPS).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_streaming_funnel_state_crosses_batches(spark, events, tmp_path):
    # A user whose 'view' lands in micro-batch 1 and whose 'click' lands
    # in micro-batch 2 must still convert: that requires the reach state
    # to survive the batch boundary. Construct one synthetically.
    import datetime

    t = lambda m: datetime.datetime(2024, 6, 1, 0, m)
    rows1 = [(1, t(0), 999_999, "view", 1.0, "{}")]
    rows2 = [(2, t(5), 999_999, "click", 1.0, "{}")]
    schema = (
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING"
    )
    src = str(tmp_path / "mini_stream")
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(f"{src}/f0")
    time.sleep(1.1)
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(f"{src}/f1")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = (
        funnel_stream(stream, ["view", "click"])
        .writeStream.format("memory")
        .queryName("funnel_mini")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["step_idx"], r["step"])
        for r in spark.sql("select * from funnel_mini").collect()
    }
    assert got == {(0, "view"), (1, "click")}


def test_funnel_reaches_matches_steps_counts(spark, events):
    reaches = funnel_reaches(events, STEPS)
    by_idx = {
        r["step_idx"]: r["n_users"]
        for r in reaches.groupBy("step_idx")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .collect()
    }
    from sparkbigdatatextanalysis_spark.operators.funnel import funnel_steps

    expected = {
        r["step_idx"]: r["n_users"]
        for r in funnel_steps(events, STEPS).collect()
        if r["n_users"] > 0
    }
    assert by_idx == expected
