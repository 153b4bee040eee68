"""Physical-plan assertions for operators that live outside the
queries() surface (tested-only extensions): same discipline as
tests/test_plans.py -- the plan we'd want on a 1000-executor cluster,
not just one that returns correct rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tests.test_plans import plan_str


def _events_df(spark, n=50):
    return spark.createDataFrame(
        [
            (i % 7, dt.datetime(2024, 1, 1 + i % 20), f"v{i % 3}", float(i))
            for i in range(n)
        ],
        "uid INT, ts TIMESTAMP, tier STRING, value DOUBLE",
    )


def test_scd2_single_shuffle(spark):
    """The change-detect and lead windows share one (key, ts) sort:
    exactly one input-proportional exchange."""
    from sparkbigdatatextanalysis_spark.operators.relational import scd2_history

    plan = plan_str(scd2_history(_events_df(spark), key="uid", ts="ts"))
    assert plan.count("Arguments: hashpartitioning(") == 1, plan


def test_forward_asof_join_free(spark):
    """Forward as-of keeps the backward form's plan shape: window carry,
    no join node, one key shuffle."""
    from sparkbigdatatextanalysis_spark.operators.relational import asof_join

    left = _events_df(spark).select("uid", "ts")
    right = _events_df(spark).select("uid", "ts", "value")
    plan = plan_str(
        asof_join(left, right, key="uid", direction="forward")
    )
    assert "Join" not in plan
    assert plan.count("Arguments: hashpartitioning(") == 1, plan


def test_winsorize_broadcasts_bounds(spark):
    """The per-group bounds table attaches as a broadcast join; the
    clipping itself is a projection."""
    from sparkbigdatatextanalysis_spark.operators.stats import winsorize

    plan = plan_str(winsorize(_events_df(spark), "value", ["tier"]))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_token_budget_sample_single_shuffle(spark):
    """One exchange (the per-shard hash-order sort); the budget filter
    is a projection over the window output."""
    from sparkbigdatatextanalysis_spark.operators.pipeline import (
        sample_to_token_budget,
    )

    df = spark.createDataFrame(
        [(i, 100 + i) for i in range(100)], "doc_id LONG, n_tokens LONG"
    )
    plan = plan_str(sample_to_token_budget(df, 5000, n_shards=4))
    assert plan.count("Arguments: hashpartitioning(") == 1, plan
    assert "Join" not in plan


def test_prefix_blocking_no_cartesian(spark):
    """Candidate generation is a bucket equi-join on the block key --
    never a cartesian over the corpus."""
    from sparkbigdatatextanalysis_spark.operators.dedup import (
        prefix_blocking_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"title {i % 5} body") for i in range(50)], "doc_id LONG, text STRING"
    )
    plan = plan_str(prefix_blocking_pairs(docs))
    assert "CartesianProduct" not in plan
    assert "NestedLoopJoin" not in plan


def test_chunk_tokens_map_only(spark):
    """Chunking is in-row: no shuffle, no join."""
    from sparkbigdatatextanalysis_spark.operators.pipeline import chunk_tokens

    df = spark.createDataFrame(
        [(1, [f"t{i}" for i in range(30)])], "id LONG, tokens ARRAY<STRING>"
    )
    plan = plan_str(chunk_tokens(df, size=8, stride=4))
    assert "hashpartitioning(" not in plan
    assert "Join" not in plan
