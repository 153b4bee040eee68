"""Unit semantics of the temporal join operators (hand-built frames:
inclusive vs strict bounds, unmatched rows, carry-forward across
multiple right rows) plus oracle parity for the new relational queries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.operators import relational as rel


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_inclusive(spark):
    left = _mk(
        spark,
        [(1, 10, "l1"), (1, 20, "l2"), (1, 5, "l0"), (2, 7, "m1")],
        "k INT, ts INT, name STRING",
    )
    right = _mk(
        spark,
        [(1, 10, "r10"), (1, 15, "r15"), (2, 8, "r8")],
        "k INT, ts INT, val STRING",
    )
    out = {
        r["name"]: r["val"]
        for r in rel.asof_join(left, right, key="k", right_payload=["val"]).collect()
    }
    # l1 at ts=10 sees the right row AT ts=10 (inclusive bound)
    assert out == {"l0": None, "l1": "r10", "l2": "r15", "m1": None}


def test_asof_strict_excludes_equal_ts(spark):
    left = _mk(spark, [(1, 10, "l1")], "k INT, ts INT, name STRING")
    right = _mk(
        spark, [(1, 10, "r10"), (1, 9, "r9")], "k INT, ts INT, val STRING"
    )
    out = rel.asof_join(
        left, right, key="k", right_payload=["val"], strict=True
    ).collect()
    assert out[0]["val"] == "r9"


def test_asof_carries_latest_of_many(spark):
    left = _mk(spark, [(1, 100, "l")], "k INT, ts INT, name STRING")
    right = _mk(
        spark,
        [(1, t, f"r{t}") for t in (1, 50, 99, 101)],
        "k INT, ts INT, val STRING",
    )
    out = rel.asof_join(left, right, key="k", right_payload=["val"]).collect()
    assert out[0]["val"] == "r99"


def test_asof_payload_collision_raises(spark):
    import pytest

    left = _mk(spark, [(1, 10, "a")], "k INT, ts INT, val STRING")
    right = _mk(spark, [(1, 5, "x")], "k INT, ts INT, val STRING")
    with pytest.raises(ValueError, match="collide"):
        rel.asof_join(left, right, key="k", right_payload=["val"])


def test_asof_no_shuffle_blowup_plan(spark):
    """The as-of join must plan as ONE window over a union -- no join
    node at all (that's the scalable property)."""
    left = _mk(spark, [(1, 10, "a")], "k INT, ts INT, name STRING")
    right = _mk(spark, [(1, 5, "x")], "k INT, ts INT, val STRING")
    plan = (
        rel.asof_join(left, right, key="k", right_payload=["val"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "Window" in plan


def test_interval_join_bounds(spark):
    left = _mk(spark, [(1, 10, "s1")], "k1 INT, t1 INT, sid STRING")
    right = _mk(
        spark,
        [(1, 10), (1, 11), (1, 20), (1, 21), (2, 12)],
        "k2 INT, t2 INT",
    )
    out = rel.interval_join(
        left,
        right,
        "k1",
        "k2",
        (F.col("t2") > F.col("t1")) & (F.col("t2") <= F.col("t1") + 10),
    ).collect()
    # (10 excluded: not strictly after; 21 excluded: outside window;
    #  key 2 excluded: wrong key)
    assert sorted(r["t2"] for r in out) == [11, 20]


def test_interval_join_is_not_cartesian(spark):
    left = _mk(spark, [(1, 10, "s1")], "k1 INT, t1 INT, sid STRING")
    right = _mk(spark, [(1, 11)], "k2 INT, t2 INT")
    plan = (
        rel.interval_join(
            left, right, "k1", "k2", F.col("t2") > F.col("t1")
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_scd2_history_intervals_and_collapse(spark):
    """Version intervals chain correctly, identical restatements
    collapse, and exactly one current row per key remains."""
    import datetime as dt

    from sparkbigdatatextanalysis_spark.operators.relational import scd2_history

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    rows = [
        (1, t(1), "gold", "eu"),
        (1, t(3), "gold", "eu"),     # restatement: no new version
        (1, t(5), "plat", "eu"),     # attr change
        (1, t(8), "plat", "us"),     # second change
        (2, t(2), "gold", "us"),     # single-version key
    ]
    ev = spark.createDataFrame(rows, "uid INT, ts TIMESTAMP, tier STRING, region STRING")
    hist = scd2_history(ev, key="uid", ts="ts").collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["uid"], []).append(
            (r["valid_from"], r["valid_to"], r["tier"], r["region"], r["is_current"])
        )
    u1 = sorted(by_key[1])
    assert u1 == [
        (t(1), t(5), "gold", "eu", False),
        (t(5), t(8), "plat", "eu", False),
        (t(8), None, "plat", "us", True),
    ]
    assert by_key[2] == [(t(2), None, "gold", "us", True)]
    # intervals chain: each valid_to equals the next valid_from
    for k, ivals in by_key.items():
        ivals = sorted(ivals)
        for (f1, to1, *_), (f2, *_rest) in zip(ivals, ivals[1:]):
            assert to1 == f2


def test_scd2_history_null_attrs_and_guards(spark):
    import datetime as dt

    from sparkbigdatatextanalysis_spark.operators.relational import scd2_history

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    ev = spark.createDataFrame(
        [(1, t(1), None), (1, t(2), None), (1, t(3), "x")],
        "uid INT, ts TIMESTAMP, v STRING",
    )
    hist = sorted(
        (r["valid_from"], r["valid_to"], r["v"])
        for r in scd2_history(ev, key="uid", ts="ts").collect()
    )
    # NULL == NULL restatement collapses (eqNullSafe), NULL -> x cuts
    assert hist == [(t(1), t(3), None), (t(3), None, "x")]
    bad = spark.createDataFrame([(1, t(1), 1)], "uid INT, ts TIMESTAMP, valid_from INT")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="valid_from"):
        scd2_history(bad, key="uid", ts="ts", attrs=[])


def test_asof_join_null_timestamps_both_directions(spark):
    """NULL-ts left rows match nothing in EITHER direction, and NULL-ts
    right rows are ignored (regression: the forward path's descending
    sort placed NULLs last, fabricating a match to the min-ts right
    row; a NULL-ts right row could be carried onto real left rows)."""
    from sparkbigdatatextanalysis_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(0, 1, None), (1, 1, 10)], "lid INT, k INT, ts INT"
    )
    right = spark.createDataFrame(
        [(100, 1, 5), (102, 1, 15), (101, 1, None)], "rid INT, k INT, ts INT"
    )
    expect = {"backward": 100, "forward": 102}
    for direction in ("backward", "forward"):
        got = {
            r["lid"]: r["rid"]
            for r in asof_join(
                left, right, key="k", right_payload=["rid"],
                direction=direction,
            ).collect()
        }
        assert got[0] is None, direction  # NULL-ts left: no match
        assert got[1] == expect[direction], direction


class TestGroupedTopk:
    def _naive(self, df, group, order, k):
        from pyspark.sql import Window

        w = Window.partitionBy(*group).orderBy(*order)
        return df.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k
        )

    def test_equals_single_window_topk(self, spark):
        """Two-phase pruning is exact: identical rows AND ranks vs the
        naive per-group window, on a skewed many-rows-few-groups input
        (the regime the pre-prune exists for)."""
        df = spark.range(0, 5000, 1, 16).select(
            (F.col("id") % 5).alias("g"),
            (F.hash(F.col("id").cast("string")) % 1000).alias("v"),
            F.col("id"),
        )
        order = [F.col("v").desc(), F.col("id")]
        got = rel.grouped_topk(df, ["g"], order, 7).orderBy("g", "rank")
        want = self._naive(df, ["g"], order, 7).orderBy("g", "rank")
        assert [tuple(r) for r in got.collect()] == [
            tuple(r) for r in want.collect()
        ]

    def test_final_window_input_is_pruned(self, spark):
        """The plan must show the local (partition-id, group) rank +
        filter UPSTREAM of the per-group exchange, so the per-group
        window's input is capped at k rows per (input partition, group)."""
        df = spark.range(0, 1000, 1, 8).select(
            (F.col("id") % 3).alias("g"), F.col("id").alias("v")
        )
        out = rel.grouped_topk(df, ["g"], [F.col("v").desc()], 2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # two window operators: local (pid, g) then global (g)
        assert plan.count("Window") >= 2, plan
        assert "SPARK_PARTITION_ID" in plan.upper(), plan
        # the local rank filter sits between them
        assert "_gtk_rn" in plan, plan

    def test_rejects_reserved_columns(self, spark):
        df = spark.range(3).select(F.col("id").alias("g"), F.col("id").alias("rank"))
        with pytest.raises(ValueError):
            rel.grouped_topk(df, ["g"], [F.col("g")], 1)


# --- global_rank -------------------------------------------------------------


def test_global_rank_equals_single_window(spark):
    # heavy ties: only 5 distinct keys over 200 rows, so several
    # percentile cuts coincide and whole buckets are empty
    rows = [(i, i % 5) for i in range(200)]
    df = spark.createDataFrame(rows, "id LONG, k LONG")
    got = {
        r["id"]: r["global_rank"]
        for r in rel.global_rank(df, "k", "id", n_buckets=8).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("k", "id"))
        ).collect()
    }
    assert got == want


def test_global_rank_partition_and_bucket_invariance(spark):
    rows = [(i, float((i * 37) % 101)) for i in range(150)]
    df = spark.createDataFrame(rows, "id LONG, k DOUBLE")
    a = {
        (r["id"], r["global_rank"])
        for r in rel.global_rank(df, "k", "id", n_buckets=4).collect()
    }
    b = {
        (r["id"], r["global_rank"])
        for r in rel.global_rank(
            df.repartition(13), "k", "id", n_buckets=32
        ).collect()
    }
    assert a == b


def test_global_rank_approx_cuts_same_exact_ranks(spark):
    """relative_error > 0 swaps exact percentile cuts for the GK sketch
    but the RANKS must stay bit-identical: cuts only choose bucket
    boundaries; the within-bucket window orders by the true key
    (VERDICT r8 #4 -- the escape hatch must not cost exactness)."""
    rows = [(i, float((i * 61) % 997) / 7.0) for i in range(400)]
    df = spark.createDataFrame(rows, "id LONG, k DOUBLE")
    exact = {
        (r["id"], r["global_rank"])
        for r in rel.global_rank(df, "k", "id", n_buckets=8).collect()
    }
    approx = {
        (r["id"], r["global_rank"])
        for r in rel.global_rank(
            df, "k", "id", n_buckets=8, relative_error=0.05
        ).collect()
    }
    assert exact == approx
    with pytest.raises(ValueError, match="relative_error"):
        rel.global_rank(df, "k", "id", relative_error=1.5)


def test_quartile_cuts_exact_vs_approx_rank_tolerance(spark):
    """stats.quartile_cuts: the approx (GK) cut for quantile q must land
    within the value range spanned by exact quantiles q +/- eps (the GK
    rank guarantee), and exact mode reproduces the inline percentile."""
    from sparkbigdatatextanalysis_spark.operators import stats as st

    rows = [(i, float((i * 13) % 509)) for i in range(500)]
    df = spark.createDataFrame(rows, "id LONG, v DOUBLE")
    eps = 0.02
    exact = st.quartile_cuts(df, ["v"]).collect()[0].asDict()
    approx = st.quartile_cuts(df, ["v"], relative_error=eps).collect()[0].asDict()
    for q in (25, 50, 75):
        lo, hi = df.selectExpr(
            f"percentile(v, {q / 100 - eps}) AS lo",
            f"percentile(v, {q / 100 + eps}) AS hi",
        ).collect()[0]
        assert lo - 1e-6 <= approx[f"v_q{q}"] <= hi + 1e-6, (q, approx, lo, hi)
        got_exact = df.selectExpr(
            f"round(percentile(v, {q / 100}), 6) AS e"
        ).collect()[0]["e"]
        assert exact[f"v_q{q}"] == got_exact
    with pytest.raises(ValueError, match="relative_error"):
        st.quartile_cuts(df, ["v"], relative_error=-0.1)


def test_global_rank_guards(spark):
    df = spark.createDataFrame([(1, 2)], "id LONG, k LONG")
    with pytest.raises(ValueError, match="n_buckets"):
        rel.global_rank(df, "k", "id", n_buckets=1)
    with pytest.raises(ValueError, match="already has column"):
        rel.global_rank(df.withColumn("global_rank", F.lit(1)), "k", "id")


# --- asof tolerance ----------------------------------------------------------


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-10 00:00:00"), (2, "2024-01-30 00:00:00")],
        "id LONG, ts STRING",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(0, "2024-01-09 00:00:00", 100)], "k LONG, ts STRING, payload LONG"
    ).select(
        F.lit(0).alias("id2"),
        F.to_timestamp("ts").alias("ts"),
        F.col("payload"),
    )
    # both left rows share the key; only the first is within 7 days
    out = {
        r["id"]: r["payload"]
        for r in rel.asof_join(
            left.withColumn("k", F.lit(0)),
            right.withColumn("k", F.lit(0)),
            key="k",
            right_payload=["payload"],
            tolerance_sec=7 * 86400,
        ).collect()
    }
    assert out == {1: 100, 2: None}


def test_asof_tolerance_zero_keeps_exact_ts_only(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:00:01")],
        "id LONG, ts STRING",
    ).withColumn("ts", F.to_timestamp("ts")).withColumn("k", F.lit(0))
    right = spark.createDataFrame(
        [("2024-01-01 00:00:00", 7)], "ts STRING, payload LONG"
    ).withColumn("ts", F.to_timestamp("ts")).withColumn("k", F.lit(0))
    out = {
        r["id"]: r["payload"]
        for r in rel.asof_join(
            left, right, key="k", right_payload=["payload"], tolerance_sec=0
        ).collect()
    }
    assert out == {1: 7, 2: None}
