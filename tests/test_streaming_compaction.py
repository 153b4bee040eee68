"""Streaming latest-per-key compaction vs the batch keep_latest: replay
the events table as a 2-file stream; the LAST change-log emission per
user must equal the batch answer, and no emission may regress a key to
an older winner."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from sparkbigdatatextanalysis_spark.streaming.compaction import keep_latest_stream

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return entry_mod._events(spark, SF).cache()


def test_stream_compaction_matches_batch(spark, events, tmp_path):
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
        keep_latest_stream(stream)
        .writeStream.format("memory")
        .queryName("latest_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("select * from latest_out").collect()
    # last emission per user wins; emissions only ever move forward
    per_user: dict[int, list[tuple]] = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"], r["value"])
        )
    for u, seq in per_user.items():
        assert seq == sorted(seq), f"winner regressed for user {u}"

    got = {u: seq[-1] for u, seq in per_user.items()}
    batch = {
        r["user_id"]: (r["ts"], r["event_id"], r["event_type"], r["value"])
        for r in entry_mod.q_events_latest_per_user(spark, SF).collect()
    }
    assert got == batch


def test_stream_compaction_checkpoint_restart(spark, events, tmp_path):
    """State must survive a checkpointed restart: after replaying the
    second half in a NEW run against the same checkpoint, the cumulative
    change-log still converges to the batch answer and never regresses a
    key — proving GroupState recovery, not just intra-run state."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    med = events.select(F.unix_micros("ts").alias("us")).approxQuantile("us", [0.5], 0.0)[0]
    events.where(F.unix_micros("ts") <= med).coalesce(1).write.mode("overwrite").parquet(src)

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            keep_latest_stream(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    events.where(F.unix_micros("ts") > med).coalesce(1).write.mode("append").parquet(src)
    run_once()

    per_user: dict[int, list[tuple]] = {}
    for r in spark.read.parquet(sink).collect():
        per_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"], r["value"])
        )
    got = {u: max(seq) for u, seq in per_user.items()}
    batch = {
        r["user_id"]: (r["ts"], r["event_id"], r["event_type"], r["value"])
        for r in entry_mod.q_events_latest_per_user(spark, SF).collect()
    }
    assert got == batch


def test_stream_compaction_emits_at_most_one_per_batch_per_key(spark, events, tmp_path):
    src = str(tmp_path / "one_file")
    events.coalesce(1).write.parquet(f"{src}/f0")
    stream = spark.readStream.schema(events.schema).parquet(f"{src}/f*")
    q = (
        keep_latest_stream(stream)
        .writeStream.format("memory")
        .queryName("latest_once")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    counts = (
        spark.sql("select user_id, count(*) AS n from latest_once group by user_id")
        .where(F.col("n") > 1)
        .collect()
    )
    assert counts == []
