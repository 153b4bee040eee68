"""JSON-lines source -- the de-facto interchange format of large text /
training-data pipelines (one document object per line).

Same design rules as the CSV source (catalog_csv.py): explicit schema
(schema inference is a full extra pass at 100 TB -- never in
production), PERMISSIVE mode with a corrupt-record channel so malformed
lines are reportable instead of silently dropped, and a split-friendly
format (JSONL is newline-delimited, so a 100 TB directory parallelizes
by HDFS/S3 block like any text input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_JSONL_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema.

    Default: clean rows only (DROPMALFORMED -- the malformed lines are
    skipped at scan time, no second pass). With ``keep_corrupt`` the
    PERMISSIVE corrupt-record column rides along (NULL for good rows) so
    callers can route bad lines to a quarantine sink in the same scan --
    the reference reports and drops malformed lines (Utils.scala:22-24);
    this keeps them addressable instead. NB Spark refuses plans that
    reference ONLY the corrupt column; quarantine-only readers should
    use :func:`corrupt_lines`.
    """
    if keep_corrupt:
        full_schema = f"{schema}, {CORRUPT_COL} STRING"
        return (
            spark.read.schema(full_schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)


def corrupt_lines(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """The quarantine view: raw text of every malformed line. Reads as
    text + ``from_json`` carrying the corrupt-record field INSIDE the
    parsed struct (PERMISSIVE from_json yields an all-null struct, not
    NULL, for bad input), sidestepping the corrupt-column-only plan
    restriction without caching the scan."""
    raw = spark.read.text(path)
    full_schema = f"{schema}, {CORRUPT_COL} STRING"
    parsed = raw.select(
        "value",
        F.from_json(
            "value", full_schema, {"columnNameOfCorruptRecord": CORRUPT_COL}
        ).alias("_parsed"),
    )
    return parsed.where(F.col(f"_parsed.{CORRUPT_COL}").isNotNull()).select(
        F.col("value").alias("raw")
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSONL sink (compressed splittable output belongs to parquet; this
    sink exists for interchange with JSONL-consuming tools)."""
    df.write.mode(mode).json(path)
