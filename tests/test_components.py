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


def test_star_matches_label_propagation_random(spark):
    import numpy as np

    from sparkbigdatatextanalysis_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    rng = np.random.default_rng(13)
    edges = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 60, 80), rng.integers(0, 60, 80))
        if a != b
    ]
    df = spark.createDataFrame(edges, "a_id INT, b_id INT")
    lab = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    star = {r["node"]: r["comp"] for r in connected_components_star(df).collect()}
    assert star == lab


def test_star_converges_on_long_chain_where_propagation_cannot(spark):
    """A 60-link chain has diameter 60: min-label propagation at
    max_iter=20 must refuse (correctly), while the star formulation
    converges in O(log n) rounds and labels the whole chain 0."""
    import pytest as _pytest

    from sparkbigdatatextanalysis_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    chain = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(chain, "a_id INT, b_id INT")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=20)
    star = connected_components_star(df, max_iter=15)
    rows = star.collect()
    assert len(rows) == 61
    assert all(r["comp"] == 0 for r in rows)


def test_star_handles_self_loops_and_duplicates(spark):
    from sparkbigdatatextanalysis_spark.operators.components import (
        connected_components_star,
    )

    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (1, 2), (5, 6)], "a_id INT, b_id INT"
    )
    got = {r["node"]: r["comp"] for r in connected_components_star(df).collect()}
    assert got == {1: 1, 2: 1, 5: 5, 6: 5}


def test_dedup_clusters_algorithms_agree(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a_id INT, b_id INT"
    )
    ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)], "doc_id INT")
    label = {r["doc_id"]: (r["keep_id"], r["is_kept"])
             for r in cc.dedup_clusters(pairs, ids).collect()}
    star = {r["doc_id"]: (r["keep_id"], r["is_kept"])
            for r in cc.dedup_clusters(pairs, ids, algorithm="star").collect()}
    assert label == star
    assert label[99] == (99, 1)  # singleton keeps itself
    with pytest.raises(ValueError, match="algorithm"):
        cc.dedup_clusters(pairs, ids, algorithm="bogus")


def test_star_loop_releases_prior_round_blocks(spark):
    """The large-star/small-star loop checkpoints every round; prior
    rounds' RDD-level blocks must be released as rounds advance (plain
    unpersist cannot free them), or a deep graph accumulates one edge
    table per round."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(80)], "a LONG, b LONG"
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = cc.connected_components_star(edges, "a", "b")
    assert out.where(F.col("comp") != 0).count() == 0
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 2, (before, after)


def test_propagation_loop_releases_checkpoint_blocks(spark):
    """The min-label loop localCheckpoints every 5th round; those rounds
    store RDD-level blocks that plain unpersist cannot drop, so a long
    chain (many rounds) must still end with at most the returned labels
    + symmetrized-edge tables pinned (functions/lineage.py::release on
    the prior round's frame). Regression for the ADVICE note that only
    the star loop had a block-count assertion."""
    edges = _edges(spark, [(i, i + 1) for i in range(14)])
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = cc.connected_components(edges, max_iter=20)
    assert set(_comp_map(out).values()) == {0}
    after = jsc.getPersistentRDDs().size()
    # allowance: the returned labels table + the persisted sym edges
    assert after - before <= 2, (before, after)


# --- fixed-point PageRank ----------------------------------------------------


def _pr_edges(spark, pairs):
    return spark.createDataFrame(pairs, "src STRING, dst STRING")


def test_pagerank_matches_float_power_method(spark):
    # 4-node directed graph; the integer fixed-point ranks must track a
    # float power method to ~1/one per step (remainder drops only).
    pairs = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"), ("c", "d"),
    ]
    out = {
        r["node"]: r["rank"]
        for r in cc.pagerank_fixed_point(_pr_edges(spark, pairs), 3).collect()
    }
    # float reference with the same update rule and iteration count
    nodes = sorted({n for p in pairs for n in p})
    deg = {n: sum(1 for s, _ in pairs if s == n) for n in nodes}
    r = {n: 1 / len(nodes) for n in nodes}
    for _ in range(3):
        s = {n: 0.0 for n in nodes}
        for a, b in pairs:
            s[b] += r[a] / deg[a]
        r = {n: 0.15 / len(nodes) + 0.85 * s[n] for n in nodes}
    for n in nodes:
        assert abs(out[n] - r[n]) < 1e-6, (n, out[n], r[n])
    # hubs beat leaves: c has 3 in-edges, d has 1
    assert out["c"] > out["d"]


def test_pagerank_bit_identical_across_partitionings(spark):
    pairs = [(f"n{i}", f"n{(i * 3 + 1) % 17}") for i in range(17)] + [
        (f"n{(i * 3 + 1) % 17}", f"n{i}") for i in range(17)
    ]
    e = _pr_edges(spark, pairs)
    a = {r["node"]: r["rank_fp"] for r in cc.pagerank_fixed_point(e, 3).collect()}
    b = {
        r["node"]: r["rank_fp"]
        for r in cc.pagerank_fixed_point(e.repartition(13), 3).collect()
    }
    assert a == b  # exact BIGINT equality, not approximate


def test_pagerank_conserves_scaled_mass(spark):
    # symmetric graph, no dangling nodes: total rank_fp stays within
    # n_nodes + n_edges dropped remainders of one per round
    pairs = [("x", "y"), ("y", "x"), ("y", "z"), ("z", "y")]
    out = cc.pagerank_fixed_point(_pr_edges(spark, pairs), 3).collect()
    total = sum(r["rank_fp"] for r in out)
    one = 10**12
    assert one * 0.999 < total <= one


def test_pagerank_loop_releases_checkpoint_blocks(spark):
    pairs = [(f"a{i}", f"a{(i + 1) % 9}") for i in range(9)]
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = cc.pagerank_fixed_point(_pr_edges(spark, pairs), 4)
    assert out.count() == 9
    after = jsc.getPersistentRDDs().size()
    # allowance: the returned final ranks checkpoint only (nodes/edeg
    # are unpersisted before return)
    assert after - before <= 1, (before, after)


# --- triangle counting -------------------------------------------------------


def test_triangles_k4_and_pendant(spark):
    # K4: every vertex sits in C(3,2) = 3 triangles; a pendant node in 0
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    e = _edges(spark, k4 + [(3, 9)])
    got = {r["node"]: (r["degree"], r["n_triangles"])
           for r in cc.count_triangles(e, "a_id", "b_id").collect()}
    assert got == {0: (3, 3), 1: (3, 3), 2: (3, 3), 3: (4, 3), 9: (1, 0)}


def test_triangles_dedupe_reversed_and_self_loops(spark):
    # triangle given with duplicates, reversals and a self loop
    e = _edges(spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2)])
    got = {r["node"]: r["n_triangles"]
           for r in cc.count_triangles(e, "a_id", "b_id").collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangles_partition_invariance_random_graph(spark):
    import itertools
    import random

    rng = random.Random(8)
    pairs = [(i, j) for i, j in itertools.combinations(range(20), 2) if rng.random() < 0.3]
    e = _edges(spark, pairs)
    a = {tuple(r) for r in cc.count_triangles(e, "a_id", "b_id").collect()}
    b = {tuple(r) for r in cc.count_triangles(e.repartition(7), "a_id", "b_id").collect()}
    assert a == b
    # cross-check the total against a brute-force python count
    adj = {n: set() for p in pairs for n in p}
    for x, y in pairs:
        adj[x].add(y); adj[y].add(x)
    brute = sum(1 for x, y, z in itertools.combinations(sorted(adj), 3)
                if y in adj[x] and z in adj[x] and z in adj[y])
    assert sum(t for _, _, t in a) == 3 * brute


def test_triangles_degree_attach_broadcast_modes(spark):
    """Both degree-attach plans (broadcast vs plain shuffle equi-join)
    compute identical counts, and each produces the pinned plan shape:
    the scale fallback must carry ZERO BroadcastExchange, the gate-scale
    mode keeps the two degree broadcasts (VERDICT r8 #2)."""
    import itertools
    import random

    from sparkbigdatatextanalysis_spark.plans.audit import audit_plan

    rng = random.Random(99)
    pairs = [
        (i, j)
        for i, j in itertools.combinations(range(25), 2)
        if rng.random() < 0.25
    ]
    e = _edges(spark, pairs)
    bc = cc.count_triangles(e, "a_id", "b_id", broadcast_degrees=True)
    sh = cc.count_triangles(e, "a_id", "b_id", broadcast_degrees=False)
    assert {tuple(r) for r in bc.collect()} == {tuple(r) for r in sh.collect()}
    # plan-shape pin on the attach itself (runs before the eager
    # checkpoint, so it must be audited pre-checkpoint): broadcast mode
    # carries exactly the two degree broadcasts, scale mode carries none
    und = (
        e.select(F.least("a_id", "b_id").alias("x"),
                 F.greatest("a_id", "b_id").alias("y"))
        .where(F.col("x") != F.col("y"))
        .distinct()
    )
    deg = (
        und.select(F.col("x").alias("n"))
        .unionByName(und.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dx = deg.select(F.col("n").alias("x"), F.col("deg").alias("dgx"))
    dy = deg.select(F.col("n").alias("y"), F.col("deg").alias("dgy"))
    lab_bc = cc._attach_degrees(und, dx, dy, broadcast=True)
    lab_sh = cc._attach_degrees(und, dx, dy, broadcast=False)
    assert audit_plan(lab_bc).broadcast_exchanges == 2
    assert audit_plan(lab_sh).broadcast_exchanges == 0
    # auto mode: under the limit -> broadcast path; above -> shuffle path
    auto_small = cc.count_triangles(e, "a_id", "b_id")
    assert {tuple(r) for r in auto_small.collect()} == {
        tuple(r) for r in bc.collect()
    }
    forced = cc.count_triangles(
        e, "a_id", "b_id", broadcast_node_limit=1
    )
    assert {tuple(r) for r in forced.collect()} == {
        tuple(r) for r in bc.collect()
    }
