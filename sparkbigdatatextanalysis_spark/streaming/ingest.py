"""Streaming ingest loop: the CONTINUOUS form of the daily incremental
dedup contract (operators/dedup.py::incremental_dedup).

A micro-batch is "today's batch": ``foreachBatch`` probes it against the
accumulated state tables, appends the per-doc audit flags to the flags
sink, and appends the KEPT docs' hash/band deltas back to the state
tables -- the read-state -> dedup -> append loop of the batch contract,
driven by the streaming engine's trigger instead of a nightly cron.

Semantics under retries: ``foreachBatch`` is AT-LEAST-ONCE (a failed
micro-batch replays with the same batch_id). The hash/band state merge
tolerates that by construction -- both are SET-probed by existence, so
re-appended rows change nothing a probe can see; flags re-emitted for a
replayed batch carry the same ``ingest_batch`` id for the reader to
last-writer-wins on. The COUNT-merged families (winnowing spans X112,
lines X118) must NOT be merged this way -- route their deltas through
``operators.pipeline.merge_counts_keyed`` (X122) keyed by the batch id,
which makes the replayed merge a no-op.

Scale notes: state lives in plain parquet tables here; at 100 TB store
them BUCKETED on their probe keys (content_hash / (band, key),
``sources/bucketed.py``) so the per-trigger probe elides the history
exchange, and compact small appended files on the usual maintenance
cadence. The probe itself is the batch operator's: equi-joins only,
history never scanned twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def _try_read(spark, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None  # first batch: no state committed yet


def ingest_stream_writer(
    doc_stream: DataFrame,
    state_dir: str,
    flags_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Wire a document stream into the ingest loop; returns the
    ``DataStreamWriter`` (caller sets trigger/checkpoint and starts --
    use ``trigger(availableNow=True)`` for catch-up runs, a processing-
    time trigger for continuous ingestion).

    Per micro-batch: read state (``{state_dir}/hashes``,
    ``{state_dir}/bands``), run :func:`..operators.dedup.
    incremental_dedup`, append the flags (stamped with the micro-batch
    id) to ``flags_dir``, append the kept docs' deltas to the state
    tables, release the batch's persisted band handle.
    """
    from ..functions.lineage import release
    from ..operators.dedup import incremental_dedup

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        hh = _try_read(spark, f"{state_dir}/hashes")
        hb = _try_read(spark, f"{state_dir}/bands")
        res = incremental_dedup(batch_df, hh, hb, id_col, text_col)
        (
            res.result.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("append")
            .parquet(flags_dir)
        )
        res.delta_hashes.write.mode("append").parquet(f"{state_dir}/hashes")
        res.delta_bands.write.mode("append").parquet(f"{state_dir}/bands")
        release(res.bands)

    return doc_stream.writeStream.foreachBatch(_process)
