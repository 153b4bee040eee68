"""ORC source/sink surface: round-trip fidelity plus the same plan
guarantees the parquet path has — pushed filters, pruned columns, and
partition pruning on a partitioned ORC write."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.sources import orc_io


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    path = str(tmp_path / "events_orc")
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("payload"),
    )
    orc_io.write_orc(df, path)
    back = orc_io.read_orc(spark, path)
    assert sorted(r["id"] for r in back.collect()) == list(range(100))

    q = back.where(F.col("k") == 3).select("id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # vectorized ORC scan with the filter pushed and payload pruned away
    assert "PushedFilters" in plan and "k" in plan.split("PushedFilters", 1)[1][:200]
    read_schema = plan.split("ReadSchema", 1)[1][:200]
    assert "payload" not in read_schema
    assert sorted(r["id"] for r in q.collect()) == [i for i in range(100) if i % 7 == 3]


def test_orc_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "events_orc_part")
    df = spark.range(60).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("part_key")
    )
    orc_io.write_orc(df, path, partition_by=["part_key"])
    back = orc_io.read_orc(spark, path).where(F.col("part_key") == "1")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "part_key" in plan.split("PartitionFilters", 1)[1][:300]
    assert sorted(r["id"] for r in back.collect()) == [i for i in range(60) if i % 3 == 1]
