"""Partition-count invariance: the property that makes oracle parity
scale-stable.

Every float a query emits is either (a) per-row scalar arithmetic on
identical inputs (bit-identical by IEEE semantics) or (b) a SUM routed
through DECIMAL (associative, so fold order cannot matter). If that
discipline slipped anywhere, results would drift with the partition
count — exactly how double summation breaks cross-engine hashing at
larger SFs. These tests re-run decimal-disciplined operators at 1, 3
and 16 partitions and require BIT-IDENTICAL results, plus a control
showing plain double summation does drift on the same data (if the
control ever stops drifting, the guard is vacuous and needs harder
data, not deletion).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.operators import stats as st
from sparkbigdatatextanalysis_spark.operators import vectors as vec


def _rows(n=4000, seed=5):
    rng = np.random.default_rng(seed)
    # Wide magnitude spread maximizes double-summation order sensitivity.
    mags = rng.uniform(-12, 12, n)
    vals = np.sign(rng.standard_normal(n)) * 10.0 ** mags
    return [(int(i % 7), float(v), float(v) * 1.5 + 1e-6) for i, v in enumerate(vals)]


def _at_partitions(spark, rows, n_parts):
    return spark.createDataFrame(rows, "g INT, x DOUBLE, y DOUBLE").repartition(
        n_parts
    )


def test_double_sum_control_drifts(spark):
    """Control: plain double SUM over the same data differs across
    partition counts (fold order changes). This is the failure mode the
    decimal discipline exists to prevent."""
    rows = _rows()
    sums = []
    for p in (1, 16):
        df = _at_partitions(spark, rows, p)
        sums.append(
            df.groupBy("g").agg(F.sum("x").alias("s")).orderBy("g").collect()
        )
    drifted = any(
        a["s"] != b["s"] for a, b in zip(*sums)
    )
    assert drifted, (
        "double sums were identical across partitionings -- the control "
        "needs harder data for the invariance tests to mean anything"
    )


def test_grouped_pearson_partition_invariant(spark):
    rows = _rows()
    results = []
    for p in (1, 3, 16):
        df = _at_partitions(spark, rows, p)
        got = {
            r["g"]: (r["n"], r["pearson_r"])
            for r in st.grouped_pearson(df, "x", "y", ["g"]).collect()
        }
        results.append(got)
    assert results[0] == results[1] == results[2]


def test_group_centroids_partition_invariant(spark):
    rng = np.random.default_rng(9)
    data = [
        (int(i % 5), [float(v) for v in 10.0 ** rng.uniform(-8, 8, 6)])
        for i in range(2000)
    ]
    results = []
    for p in (1, 3, 16):
        df = spark.createDataFrame(
            data, "label INT, embedding ARRAY<DOUBLE>"
        ).repartition(p)
        got = {
            (r["label"], r["dim"]): (r["centroid"], r["n_vectors"])
            for r in vec.group_centroids(df).collect()
        }
        results.append(got)
    assert results[0] == results[1] == results[2]


def test_decimal_money_sum_partition_invariant(spark):
    """The pricing_rollup/sales_cube DECIMAL idiom: bit-stable across
    partitionings (the sf0.1 sweep originally caught plain doubles
    drifting in grand totals)."""
    rows = _rows()
    results = []
    for p in (1, 3, 16):
        df = _at_partitions(spark, rows, p)
        got = (
            df.groupBy("g")
            .agg(
                F.round(F.sum(F.col("x").cast("decimal(38,10)")), 4)
                .cast("double")
                .alias("s")
            )
            .orderBy("g")
            .collect()
        )
        results.append([(r["g"], r["s"]) for r in got])
    assert results[0] == results[1] == results[2]
