"""Streaming joins and streaming deduplication.

Completes the streaming surface next to aggregations.py (windows) and
sessionize.py (custom state):

* stream-stream interval join -- the streaming form of
  operators.relational.interval_join. Both sides carry watermarks and
  the join condition bounds event time on both sides, so Spark can
  bound the join state (buffered rows older than watermark + range are
  evicted) -- the property that keeps an unbounded join feasible on an
  unbounded feed.
* streaming dedup -- ``dropDuplicatesWithinWatermark`` on a content
  key: exact dedup over an unbounded stream with state bounded by the
  watermark horizon (the streaming form of operators.dedup.exact_dedup;
  at 100 TB/day the dedup key state lives in the state store, compacted
  per micro-batch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within: str = "24 hours",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Join right-side rows to left-side rows of the same key with
    ``right_ts`` in (left_ts, left_ts + within]. Works identically on
    batch and streaming inputs; on streaming inputs both sides must
    already be distinct-named and get watermarks here."""
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark_delay)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark_delay)
    cond = (
        (F.col(key_left) == F.col(key_right))
        & (F.col(right_ts) > F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return left.join(right, cond, "inner")


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """First-seen-wins exact dedup over a stream. State holds one entry
    per distinct key seen within the watermark horizon; duplicates
    arriving later than the horizon are the documented trade-off of
    bounded state (same contract as Kafka-compacted ingestion)."""
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def content_key(text_col: str = "text") -> Column:
    """sha2-256 content hash -- the streaming dedup key matching
    operators.dedup.exact_dedup's batch key."""
    return F.sha2(F.col(text_col), 256)
