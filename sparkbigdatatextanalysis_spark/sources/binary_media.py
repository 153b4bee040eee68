"""Binary-file media ingestion: directories of image/audio/video blobs
-> the engine's (media_id, payload, metadata) table shape.

Built on Spark's ``binaryFile`` data source, which reads each file as one
row (path, modificationTime, length, content) with file listing
distributed across the cluster and predicate pushdown on the metadata
columns (a ``length < x`` filter prunes at listing time, before any
payload bytes move). That makes it the right front door for the
multimodal operators in ``operators/multimodal.py``: payloads arrive as
ordinary BINARY columns that shuffle/partition like any other data,
typed metadata stays columnar, and no Python touches the ingest path.

At 100 TB: one row per file means small-file explosions hurt the
listing, not this reader's semantics — compact blobs into parquet with
:func:`media_to_parquet` once, then the pipeline reads the (splittable,
column-pruned) parquet instead of re-listing millions of objects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension -> coarse modality; anything unknown stays "binary" (the
# pipeline treats modality as routing metadata, never as a decoder oracle)
_MODALITY = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "bmp": "image", "webp": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio", "ogg": "audio",
    "mp4": "video", "mkv": "video", "avi": "video", "webm": "video", "mov": "video",
}


def modality_for_extension(ext_col):
    """Modality routing expression from a lowercase extension column."""
    expr = F.lit("binary")
    for ext, modality in sorted(_MODALITY.items()):
        expr = F.when(ext_col == ext, F.lit(modality)).otherwise(expr)
    return expr


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
    max_bytes: int | None = None,
) -> DataFrame:
    """Read a directory of media blobs into the engine's media table:

    (media_id BIGINT, path STRING, modality STRING, n_bytes BIGINT,
     modified TIMESTAMP, payload BINARY)

    ``media_id`` is the xxhash64 of the file path — deterministic across
    runs and engines listing the same store, no global counter, no
    shuffle. ``glob`` maps to ``pathGlobFilter`` (evaluated during the
    distributed listing); ``max_bytes`` becomes a pushed filter on the
    file-status ``length`` column, so oversized blobs are skipped
    WITHOUT reading their bytes (the binaryFile source prunes on
    metadata predicates).
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= max_bytes)
    # Extension from the BASENAME only: splitting the full path on '.'
    # would let a dotted directory (/data.v2/clip) leak 'v2/clip' as the
    # extension of an extensionless file.
    base = F.element_at(F.split(F.col("path"), "/"), -1)
    ext = F.lower(
        F.when(
            base.contains("."),
            F.element_at(F.split(base, r"\."), -1),
        ).otherwise(F.lit(""))
    )
    return df.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.col("path"),
        modality_for_extension(ext).alias("modality"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("modified"),
        F.col("content").alias("payload"),
    )


def media_to_parquet(media: DataFrame, path: str, n_files: int = 0) -> None:
    """Compact a media table into parquet — the one-time small-file
    consolidation after which every downstream pass reads splittable,
    column-prunable files instead of re-listing the object store.
    Payloads stay opaque BINARY; metadata-only readers never fetch them
    (parquet column pruning)."""
    out = media.repartition(n_files) if n_files > 0 else media
    out.write.mode("overwrite").parquet(path)
