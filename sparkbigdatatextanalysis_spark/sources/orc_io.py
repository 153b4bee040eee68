"""ORC IO: the second columnar source/sink surface beside parquet.

Spark ships native vectorized ORC support (no extra packages), so the
engine exposes it with the same contract as ``parquet_io``: predicate
pushdown and column pruning reach the ORC scan the same way they reach
parquet (asserted in tests/test_sources_orc.py), and ``partition_by``
gives directory-level partition pruning. Useful when the surrounding
warehouse is Hive/ORC rather than parquet-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
