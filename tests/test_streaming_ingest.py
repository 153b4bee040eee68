"""Streaming ingest loop (streaming/ingest.py): the foreachBatch
deployment of the incremental dedup contract -- read state, dedup the
micro-batch, append flags + deltas -- driven end-to-end through a real
streaming query with a checkpointed restart between days."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.operators import dedup as dd
from sparkbigdatatextanalysis_spark.streaming.ingest import ingest_stream_writer

LONG2 = (
    "machine learning systems process large text corpora with distributed "
    "engines across many executor nodes while tracking lineage metadata "
    "for every transformation stage in the daily ingestion pipeline"
)

DAY1 = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, LONG2),
    (3, "a completely different document about cooking pasta with fresh tomatoes"),
]

DAY2 = [
    (10, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (11, LONG2 + " every morning"),
    (12, "brand new content that appears twice in the same daily batch exactly"),
    (13, "brand new content that appears twice in the same daily batch exactly"),
    (14, "completely novel subject matter involving astronomy telescopes and comets"),
]

SCHEMA = "doc_id LONG, text STRING"


def _run_once(spark, src, state, flags, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        ingest_stream_writer(stream, state, flags)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_ingest_stream_two_days_with_restart(spark, tmp_path):
    """Day 1 seeds the state; day 2 (a NEW run against the same
    checkpoint) must flag exact/near history dups against day 1's
    committed state and within-batch dups inside day 2 -- byte-equal to
    the batch contract run over the same split."""
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    flags = str(tmp_path / "flags")
    ckpt = str(tmp_path / "ckpt")
    d1 = spark.createDataFrame(DAY1, SCHEMA)
    d2 = spark.createDataFrame(DAY2, SCHEMA)
    d1.coalesce(1).write.mode("overwrite").parquet(src)
    _run_once(spark, src, state, flags, ckpt)

    # day 1: empty state -> everything kept, deltas committed
    out1 = {r["doc_id"]: r for r in spark.read.parquet(flags).collect()}
    assert set(out1) == {1, 2, 3} and all(r["keep"] for r in out1.values())
    assert spark.read.parquet(f"{state}/hashes").count() == 3

    d2.coalesce(1).write.mode("append").parquet(src)
    _run_once(spark, src, state, flags, ckpt)

    got = {
        r["doc_id"]: r
        for r in spark.read.parquet(flags).collect()
        if r["doc_id"] >= 10
    }
    # batch-contract expectation over the identical split
    hh = d1.select(F.sha2(F.col("text"), 256).alias("content_hash")).distinct()
    hb = dd.lsh_band_keys_flat(
        dd.minhash_signatures_flat(dd.shingle_hashes(d1))
    ).select("band", "key")
    want = {
        r["doc_id"]: r
        for r in dd.incremental_dedup(
            d2, hh, hb, persist_bands=False
        ).result.collect()
    }
    assert set(got) == set(want)
    for i in want:
        for c in (
            "content_hash",
            "exact_dup_history",
            "exact_dup_batch",
            "near_dup_history",
            "near_dup_batch",
            "keep",
        ):
            assert got[i][c] == want[i][c], (i, c)
    assert got[10]["exact_dup_history"] and got[11]["near_dup_history"]
    assert got[13]["exact_dup_batch"] and got[14]["keep"]
    # state grew by the KEPT docs only (12's twin 13 dropped)
    kept_day2 = sum(1 for r in want.values() if r["keep"])
    assert spark.read.parquet(f"{state}/hashes").count() == 3 + kept_day2
    # both days' flags carry distinct micro-batch stamps
    stamps = {r["ingest_batch"] for r in spark.read.parquet(flags).collect()}
    assert len(stamps) == 2
