"""Wave-7 operator semantics: BFS levels vs a Python frontier walk,
hubness in-degree conservation, referential audit with PLANTED orphans
(the gate data is clean, so the non-zero path is pinned here), source
centroids, and cohort-LTV invariants."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.operators import components as cc

SF = "/root/testdata/sf0.001"


# --- bfs_levels ----------------------------------------------------------------


def _brute_bfs(edges, max_hops):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[int, set] = {}
    deg: dict[int, int] = {}
    for x, y in und:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
        deg[x] = deg.get(x, 0) + 1
        deg[y] = deg.get(y, 0) + 1
    seed = min(deg, key=lambda n: (-deg[n], n))
    reached = {seed: 0}
    frontier = [seed]
    for h in range(1, max_hops + 1):
        nxt = sorted(
            {t for s in frontier for t in adj[s] if t not in reached}
        )
        if not nxt:
            break
        for t in nxt:
            reached[t] = h
        frontier = nxt
    counts: dict[int, int] = {}
    for d in reached.values():
        counts[d] = counts.get(d, 0) + 1
    counts[-1] = len(deg) - len(reached)
    return counts


def test_bfs_levels_matches_python_walk(spark):
    rng = random.Random(17)
    edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(70)})
    df = spark.createDataFrame(edges, "u LONG, v LONG")
    got = {
        r["dist"]: r["n_nodes"]
        for r in cc.bfs_levels(df, max_hops=4).collect()
    }
    want = _brute_bfs(edges, 4)
    # Spark emits only non-empty levels plus the -1 remainder
    want = {d: n for d, n in want.items() if n > 0 or d == -1}
    assert got == want


def test_bfs_levels_chain_and_early_stop(spark):
    # path 0-1-2-3-4-5-6: seed = node with max degree, min id -> node 1
    # (deg 2); levels: {1}, {0,2}, {3}, {4}, {5}; 6 unreachable in 4 hops
    edges = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(edges, "u LONG, v LONG")
    got = {
        r["dist"]: r["n_nodes"]
        for r in cc.bfs_levels(df, max_hops=4).collect()
    }
    assert got == {0: 1, 1: 2, 2: 1, 3: 1, 4: 1, -1: 1}
    # disconnected triangle + pair: seed in the triangle, pair unreachable
    edges2 = [(0, 1), (1, 2), (0, 2), (10, 11)]
    got2 = {
        r["dist"]: r["n_nodes"]
        for r in cc.bfs_levels(
            spark.createDataFrame(edges2, "u LONG, v LONG"), max_hops=4
        ).collect()
    }
    assert got2 == {0: 1, 1: 2, -1: 2}


# --- hubness -------------------------------------------------------------------


def test_hubness_indegree_conservation(spark):
    import __spark_entry__ as entry

    rows = entry.q_embeddings_knn_hubness(spark, SF).collect()
    n = len(rows)
    assert n > 0
    total = sum(r["in_degree"] for r in rows)
    # every vector hands out exactly ANN_K votes (corpus > k+1 here)
    assert total == n * entry.ANN_K
    assert all(r["in_degree"] >= 0 for r in rows)
    # hubness exists iff some vector gets more than its "fair share"
    assert max(r["in_degree"] for r in rows) >= entry.ANN_K


# --- referential audit: planted orphans -----------------------------------------


def test_referential_audit_counts_planted_orphans(spark, tmp_path):
    import __spark_entry__ as entry

    sf = str(tmp_path)
    # copy the sf0.001 tables, then DELETE half the orders so lineitem
    # genuinely orphans (and keep customer intact so orders->customer
    # stays clean)
    for t in [
        "lineitem",
        "orders",
        "customer",
        "part",
        "supplier",
        "events",
    ]:
        df = spark.read.parquet(f"{SF}/{t}.parquet")
        if t == "orders":
            df = df.where(F.col("o_orderkey") % 2 == 0)
        df.write.mode("overwrite").parquet(f"{sf}/{t}.parquet")
    got = {
        r["relationship"]: r
        for r in entry.q_referential_integrity_audit(spark, sf).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    want_orphans = li.where(F.col("l_orderkey") % 2 == 1).count()
    g = got["lineitem->orders"]
    assert g["n_orphans"] == want_orphans > 0
    assert abs(g["orphan_rate"] - want_orphans / g["n_child"]) < 1e-9
    assert got["orders->customer"]["n_orphans"] == 0


# --- source centroids ----------------------------------------------------------


def test_source_similarity_bounds_and_symmetric_coverage(spark):
    import __spark_entry__ as entry

    rows = entry.q_sources_similarity_matrix(spark, SF).collect()
    srcs = {
        r["source"]
        for r in entry._docs(spark, SF).select("source").distinct().collect()
    }
    k = len(srcs)
    assert len(rows) == k * (k - 1) // 2  # every unordered pair, once
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert -1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9
        assert r["n_common_tokens"] > 0  # shared template vocabulary


# --- cohort LTV ----------------------------------------------------------------


def test_cohort_ltv_monotone_and_consistent(spark):
    import __spark_entry__ as entry

    rows = entry.q_cohort_ltv(spark, SF).collect()
    assert rows
    by_cohort: dict[int, list] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_year"], []).append(r)
    total_rev = sum(
        r["cum_revenue"]
        for rs in by_cohort.values()
        for r in [max(rs, key=lambda r: r["age_years"])]
    )
    want_total = (
        entry._scan(spark, SF, "orders")
        .agg(F.round(F.sum(F.col("o_totalprice").cast("decimal(38,10)")).cast("double"), 2))
        .collect()[0][0]
    )
    # cohorts partition all orders: final cumulative revenues sum to the
    # corpus total (cell-level rounding at 4dp leaves ~cents of slack)
    assert abs(total_rev - want_total) < 1.0
    for cohort, rs in by_cohort.items():
        rs = sorted(rs, key=lambda r: r["age_years"])
        assert rs[0]["age_years"] == 0
        for a, b in zip(rs, rs[1:]):
            assert b["cum_revenue"] >= a["cum_revenue"] - 1e-6
            assert b["ltv_per_customer"] >= a["ltv_per_customer"] - 1e-9
