"""Stream-stream interval join and streaming dedup: each streaming form
must agree with its batch form over the same replayed data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.sources import parquet_io as pio
from sparkbigdatatextanalysis_spark.streaming import aggregations as sagg
from sparkbigdatatextanalysis_spark.streaming import joins as sj

from conftest import sf_dir


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("ev_join_stream"))
    raw = pio.normalize_event_ts(
        spark.read.parquet(f"{sf_dir('0.001')}/events.parquet")
    )
    raw.coalesce(2).write.mode("overwrite").parquet(d)
    return d


def _sides(df):
    signups = df.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("l_ts"),
    )
    follows = df.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("r_ts"),
    )
    return signups, follows


def test_stream_interval_join_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    bl, br = _sides(batch)
    expected = {
        (r["signup_id"], r["click_id"])
        for r in sj.stream_interval_join(
            bl, br, "s_user", "e_user"
        ).collect()
    }
    assert expected, "fixture produced no joined pairs"

    stream = sagg.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    sl, sr = _sides(stream)
    out = sj.stream_interval_join(sl, sr, "s_user", "e_user")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["signup_id"], r["click_id"])
        for r in spark.sql("SELECT signup_id, click_id FROM ssj").collect()
    }
    # watermark semantics may HOLD BACK pairs near the end of the stream
    # (not yet provably complete), never emit wrong ones
    assert got.issubset(expected)
    assert len(got) >= int(0.8 * len(expected)), (len(got), len(expected))


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    """A restarted file-source stream with the same checkpoint must not
    reprocess already-committed input files: each event lands in the
    sink exactly once across two runs (the recovery contract a
    production 100 TB/day ingest leans on)."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    ev = pio.normalize_event_ts(
        spark.read.parquet(f"{sf_dir('0.001')}/events.parquet")
    ).select("event_id", "ts", "user_id", "value")
    first = ev.where(F.col("event_id") % 2 == 0)
    second = ev.where(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("overwrite").parquet(src)

    def run_once():
        stream = spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"
        ).parquet(src)
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n_first = spark.read.parquet(sink).count()
    assert n_first == first.count()

    # append the second half as NEW files, restart from the checkpoint
    second.coalesce(1).write.mode("append").parquet(src)
    run_once()
    final = spark.read.parquet(sink)
    assert final.count() == ev.count()  # nothing duplicated, nothing lost
    assert final.select("event_id").distinct().count() == ev.count()


def test_dedup_stream_first_seen(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00", "aaa"),
        (2, "2024-01-01 00:10:00", "bbb"),
        (3, "2024-01-01 00:20:00", "aaa"),  # dup of 1 within horizon
        (4, "2024-01-01 01:00:00", "ccc"),
    ]
    src = spark.createDataFrame(
        rows, "event_id BIGINT, ts_s STRING, text STRING"
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "text")
    d = str(tmp_path / "dedup_src")
    src.coalesce(1).write.mode("overwrite").parquet(d)

    stream = (
        spark.readStream.schema("event_id BIGINT, ts TIMESTAMP, text STRING")
        .parquet(d)
        .withColumn("k", sj.content_key("text"))
    )
    out = sj.dedup_stream(stream, ["k"])
    q = (
        out.writeStream.format("memory")
        .queryName("sdd")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["text"] for r in spark.sql("SELECT text FROM sdd").collect()
    )
    assert got == ["aaa", "bbb", "ccc"]
