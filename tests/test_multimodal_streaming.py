"""Tests for the multimodal binary-column plumbing (Arrow mapInPandas
stages with deterministic fake codecs) and the Structured Streaming
variants (availableNow trigger into a memory sink, checked against the
identical batch aggregation)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from sparkbigdatatextanalysis_spark.functions.hashing import HASH_BASE, MERSENNE31
from sparkbigdatatextanalysis_spark.operators import multimodal as mm
from sparkbigdatatextanalysis_spark.sources import parquet_io as pio
from sparkbigdatatextanalysis_spark.streaming import aggregations as sagg

from conftest import sf_dir


def _media(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="hello world"), Row(doc_id=1, text="abc")]
    )
    return mm.docs_as_media(docs)


def _fold(payload: bytes) -> int:
    h = 0
    for b in payload:
        h = (h * HASH_BASE + b) % MERSENNE31
    return h


def test_media_schema(spark):
    m = _media(spark)
    assert [f.name for f in m.schema.fields] == ["media_id", "kind", "payload", "meta"]
    assert m.schema["payload"].dataType.simpleString() == "binary"
    meta = dict(m.first()["meta"].asDict())
    assert set(meta) == {"mime", "width", "height", "sample_rate", "n_frames"}


def test_decode_features_deterministic_fake(spark):
    rows = {r["media_id"]: r for r in mm.decode_features(_media(spark)).collect()}
    assert rows[0]["n_bytes"] == len(b"hello world")
    assert rows[0]["mean_byte"] == pytest.approx(sum(b"hello world") / 11)
    assert rows[0]["byte_hash"] == _fold(b"hello world")
    assert rows[1]["byte_hash"] == _fold(b"abc")


def test_resize_contract_payload_size(spark):
    out = mm.resize_images(_media(spark), width=4, height=3).collect()
    for r in out:
        assert len(r["payload"]) == 12
        assert (r["width"], r["height"]) == (4, 3)
    # doc1 "abc" -> right-padded with zeros
    r1 = next(r for r in out if r["media_id"] == 1)
    assert bytes(r1["payload"]) == b"abc" + b"\x00" * 9


@pytest.mark.skipif(not mm.HAVE_PIL, reason="PIL not installed in this env")
def test_resize_real_pil_branch(spark):  # pragma: no cover - PIL absent here
    """With PIL present, a real encoded image resizes through the codec
    and still satisfies the width*height payload contract."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (8, 8), color=200).save(buf, format="PNG")
    media = spark.createDataFrame(
        [Row(media_id=0, payload=bytearray(buf.getvalue()))]
    )
    out = mm.resize_images(media, width=4, height=3).collect()
    assert len(out) == 1
    assert len(out[0]["payload"]) == 12
    assert all(b == 200 for b in out[0]["payload"])


def test_sample_frames_every_nth(spark):
    docs = spark.createDataFrame([Row(doc_id=7, text="x" * 100)])
    out = mm.sample_frames(
        mm.docs_as_media(docs), frame_bytes=16, every_n=4
    ).collect()
    # 100 bytes -> 7 frames (0..6), every 4th -> frames 0 and 4
    assert sorted(r["frame_idx"] for r in out) == [0, 4]
    full = next(r for r in out if r["frame_idx"] == 0)
    assert full["frame_hash"] == _fold(b"x" * 16)
    tail = next(r for r in out if r["frame_idx"] == 4)
    assert tail["frame_hash"] == _fold(b"x" * 16)


# --- streaming -------------------------------------------------------------


@pytest.fixture(scope="module")
def events_path() -> str:
    return f"{sf_dir('0.001')}/events.parquet"


@pytest.fixture(scope="module")
def events_stream_dir(spark, events_path, tmp_path_factory) -> str:
    """Rewrite the events into a plain-TIMESTAMP parquet directory --
    the shape a real file stream ingests (handles both the old
    TIMESTAMP(NANOS) and current timestamp[us] source encodings)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    d = str(tmp_path_factory.mktemp("events_stream"))
    raw = pio.normalize_event_ts(spark.read.parquet(events_path))
    raw.coalesce(2).write.mode("overwrite").parquet(d)
    return d


def test_stream_windowed_events_matches_batch(spark, events_stream_dir):
    batch = spark.read.parquet(events_stream_dir)
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in sagg.windowed_event_stats(batch).collect()
    }

    stream = sagg.read_events_stream(spark, events_stream_dir)
    assert stream.isStreaming
    q = sagg.run_stream_to_memory(
        sagg.windowed_event_stats(sagg.with_watermark(stream)), "ev_win"
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM ev_win").collect()
    }
    assert got == expected


def test_stream_token_counts_window(spark, events_stream_dir):
    docs = spark.read.parquet(f"{sf_dir('0.001')}/documents.parquet")
    ev = spark.read.parquet(events_stream_dir).select("ts").limit(500)
    # pair each doc with a timestamp (deterministic zip by row order id)
    from pyspark.sql import Window
    import pyspark.sql.functions as F2

    w = Window.orderBy("ts")
    ts = ev.withColumn("rn", F2.row_number().over(w))
    d = docs.withColumn("rn", (F2.col("doc_id") + 1).cast("int"))
    joined = d.join(ts, "rn").select("ts", "text")
    out = sagg.windowed_token_counts(joined)
    rows = out.collect()
    assert len(rows) > 0
    assert {c for c in out.columns} == {"window_start", "token", "n"}
    total = sum(r["n"] for r in rows)
    from sparkbigdatatextanalysis_spark.operators.tfidf import tokenized

    expect_total = (
        tokenized(joined.selectExpr("monotonically_increasing_id() AS id", "text"))
        .agg(F.sum(F.size("tokens")))
        .first()[0]
    )
    assert total == expect_total


def test_sliding_window_overlap(spark, events_stream_dir):
    batch = spark.read.parquet(events_stream_dir)
    n_events = batch.count()
    out = sagg.sliding_user_activity(batch)
    # each event is counted in exactly window/slide = 2 windows
    assert out.agg(F.sum("n_events")).first()[0] == 2 * n_events


def test_average_hash_matches_numpy_reference(spark):
    """aHash vs a straight-line numpy reference over the same fake-resize
    contract (crop/pad to 64 bytes, bit = pixel > mean)."""
    import numpy as np

    payloads = [
        (1, b"abcdefgh" * 10),          # cropped to 64
        (2, b"ab"),                      # padded with zeros
        (3, bytes(range(64))),           # exact size
        (4, b""),                        # all padding -> hash 0
    ]
    media = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads], "media_id LONG, payload BINARY"
    )
    got = {r["media_id"]: (r["sim_hi"], r["sim_lo"])
           for r in mm.average_hash(media).collect()}
    for mid, p in payloads:
        px = np.frombuffer(p[:64].ljust(64, b"\x00"), dtype=np.uint8)
        bits = px > px.mean()
        sig = sum(int(b) << i for i, b in enumerate(bits))
        assert got[mid] == (sig >> 32, sig & 0xFFFFFFFF), mid
    assert got[4] == (0, 0)


def test_media_near_dup_finds_perturbed_copy(spark):
    """A payload and a lightly perturbed copy land within Hamming<=3 and
    must be found; an unrelated payload must not pair with them."""
    base = bytes((i * 37) % 251 for i in range(64))
    # flip one pixel across the mean boundary -> small Hamming change
    perturbed = bytearray(base)
    perturbed[5] = 255 if base[5] < 128 else 0
    other = bytes((i * 91 + 13) % 256 for i in range(64))
    media = spark.createDataFrame(
        [(1, bytearray(base)), (2, perturbed), (3, bytearray(other))],
        "media_id LONG, payload BINARY",
    )
    pairs = {(r["a_id"], r["b_id"]): r["hamming"]
             for r in mm.media_near_dup_pairs(media, max_hamming=3).collect()}
    assert (1, 2) in pairs
    assert all(k == (1, 2) for k in pairs)


def test_media_near_dup_self_consistent_on_corpus(spark):
    """On the synthetic corpus the operator runs end-to-end and every
    emitted pair respects the Hamming bound (and is ordered/distinct)."""
    docs = spark.read.parquet(f"{sf_dir('0.001')}/documents.parquet").limit(200)
    pairs = mm.media_near_dup_pairs(
        mm.docs_as_media(docs), max_hamming=3
    ).collect()
    seen = set()
    for r in pairs:
        assert r["a_id"] < r["b_id"]
        assert r["hamming"] <= 3
        assert (r["a_id"], r["b_id"]) not in seen
        seen.add((r["a_id"], r["b_id"]))
