"""Bucketed-table layout (sources/bucketed.py): the written bucket
layout must ELIDE the join/agg exchanges — the property that turns a
daily fact-to-fact join from two 100 TB shuffles into zero."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.sources import bucketed as bk


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    a = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    bk.write_bucketed(a, "t_bucket_a", ["k"], n_buckets=8, sort_by=["k"])
    bk.write_bucketed(b, "t_bucket_b", ["k"], n_buckets=8, sort_by=["k"])
    yield "t_bucket_a", "t_bucket_b"
    for t in ("t_bucket_a", "t_bucket_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    """Fact-to-fact regime (broadcast off -- at real scale neither side
    fits): both scans expose the bucket layout, so the join plans with
    ZERO exchanges of any kind."""
    ta, tb = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bk.read_table(spark, ta).join(bk.read_table(spark, tb), "k")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 5000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    agg = bk.read_table(spark, ta).groupBy("k").agg(F.sum("va").alias("s"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 5000


def test_unbucketed_join_shuffles_as_control(spark, bucketed_pair):
    """Control: the same join off plain parquet DOES plan exchanges —
    proving the elision above comes from the bucket metadata, not from
    broadcast thresholds or tiny-input accidents."""
    ta, _ = bucketed_pair
    plain = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    # force the non-broadcast path so the control is apples-to-apples
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bk.read_table(spark, ta).join(plain, "k")
        assert "Exchange" in _plan(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_correctness(spark, bucketed_pair):
    ta, tb = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = (
            bk.read_table(spark, ta)
            .join(bk.read_table(spark, tb), "k")
            .select(F.sum(F.col("va") + F.col("vb")).alias("s"))
            .collect()[0]["s"]
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    n = 5000
    assert got == 5 * n * (n - 1) // 2


def test_write_bucketed_validates(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bk.write_bucketed(df, "t_x", [])
    with pytest.raises(ValueError):
        bk.write_bucketed(df, "t_x", ["k"], n_buckets=0)


def test_one_file_per_bucket(spark, bucketed_pair, tmp_path):
    """The pre-repartition must keep file count at ~n_buckets, not
    tasks x buckets (the small-file explosion bucketing is notorious
    for)."""
    import glob

    row = spark.sql("DESCRIBE TABLE EXTENDED t_bucket_a").collect()
    loc = next(r["data_type"] for r in row if r["col_name"] == "Location")
    files = [
        f
        for f in glob.glob(loc.replace("file:", "") + "/*")
        if not f.rsplit("/", 1)[-1].startswith("_")
    ]
    assert len(files) <= 8 + 1, files
