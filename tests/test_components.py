"""Connected-components semantics on hand-built graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.operators import components as cc


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a_id BIGINT, b_id BIGINT")


def _comp_map(df):
    return {r["node"]: r["comp"] for r in df.collect()}


def test_chain_converges_to_min(spark):
    # 1-2-3-4-5 chain: diameter 4, needs several propagation rounds
    got = _comp_map(
        cc.connected_components(_edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_direction_independence(spark):
    got = _comp_map(
        cc.connected_components(_edges(spark, [(9, 4), (4, 7), (20, 30)]))
    )
    assert got == {4: 4, 7: 4, 9: 4, 20: 20, 30: 20}


def test_triangle_with_duplicate_edges(spark):
    got = _comp_map(
        cc.connected_components(
            _edges(spark, [(2, 3), (3, 2), (2, 5), (3, 5), (3, 5)])
        )
    )
    assert got == {2: 2, 3: 2, 5: 2}


def test_unconverged_raises_not_silent(spark):
    # diameter-4 chain cannot converge in 1 round: wrong labels must
    # never be returned silently
    with pytest.raises(RuntimeError, match="did not converge"):
        cc.connected_components(
            _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]), max_iter=1
        )


def test_dedup_clusters_covers_singletons(spark):
    ids = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id BIGINT")
    pairs = _edges(spark, [(2, 4), (4, 6)])
    out = cc.dedup_clusters(pairs, ids)
    rows = {r["doc_id"]: (r["keep_id"], r["is_kept"]) for r in out.collect()}
    assert rows == {
        1: (1, 1), 2: (2, 1), 3: (3, 1), 4: (2, 0), 5: (5, 1), 6: (2, 0),
    }
    kept = out.agg(F.sum("is_kept")).first()[0]
    assert kept == 4  # 6 docs - 2 merged
