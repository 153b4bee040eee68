"""Round-11 operator unit tests: Mann-Whitney U, Welch's t, and the
entry-level additions of the r11 wave, each pinned against a naive
Python/numpy reference on data with ties, skew, and degenerate edges.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.operators import stats as st


def _brute_mwu(a_vals, b_vals):
    """Naive midrank Mann-Whitney with tie-corrected z."""
    pooled = sorted([(v, "a") for v in a_vals] + [(v, "b") for v in b_vals])
    n = len(pooled)
    ranks: dict = {}
    i = 0
    while i < n:
        j = i
        while j < n and pooled[j][0] == pooled[i][0]:
            j += 1
        mid = (i + 1 + j) / 2  # average of ranks i+1..j
        ranks[pooled[i][0]] = mid
        i = j
    ra = sum(ranks[v] for v in a_vals)
    na, nb = len(a_vals), len(b_vals)
    u = ra - na * (na + 1) / 2
    from collections import Counter

    ties = sum(c**3 - c for c in Counter(v for v, _ in pooled).values())
    var = na * nb / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - na * nb / 2) / math.sqrt(var) if var > 0 else None
    rb = 2 * u / (na * nb) - 1
    return u, z, rb


@pytest.mark.parametrize("seed", [1, 5])
def test_mann_whitney_matches_brute_force(spark, seed):
    rng = random.Random(seed)
    a = [rng.randrange(30) for _ in range(250)]  # heavy ties
    b = [rng.randrange(10, 45) for _ in range(180)]
    rows = [(v, True) for v in a] + [(v, False) for v in b]
    df = spark.createDataFrame(rows, "v LONG, is_a BOOLEAN")
    got = st.mann_whitney_u(df, "v", F.col("is_a")).collect()[0]
    u, z, rb = _brute_mwu(a, b)
    assert (got["n_a"], got["n_b"]) == (len(a), len(b))
    assert abs(got["u_stat"] - u) < 1e-9
    assert abs(got["z_score"] - z) < 1e-8
    assert abs(got["rank_biserial"] - rb) < 1e-8


def test_mann_whitney_continuous_bucketed(spark):
    rng = random.Random(9)
    a = [round(rng.gauss(0, 1), 9) for _ in range(300)]
    b = [round(rng.gauss(0.5, 1), 9) for _ in range(200)]
    rows = [(v, True) for v in a] + [(v, False) for v in b]
    df = spark.createDataFrame(rows, "v DOUBLE, is_a BOOLEAN")
    u, z, rb = _brute_mwu(a, b)
    for kwargs in ({"n_buckets": 8}, {"n_buckets": 8, "relative_error": 0.01}):
        got = st.mann_whitney_u(df, "v", F.col("is_a"), **kwargs).collect()[0]
        assert abs(got["u_stat"] - u) < 1e-9
        assert abs(got["z_score"] - z) < 1e-8


def test_mann_whitney_degenerate(spark):
    # all values tied -> variance 0 -> z NULL, u still defined
    rows = [(5, True)] * 4 + [(5, False)] * 6
    df = spark.createDataFrame(rows, "v LONG, is_a BOOLEAN")
    got = st.mann_whitney_u(df, "v", F.col("is_a")).collect()[0]
    assert got["z_score"] is None
    assert abs(got["u_stat"] - 4 * 6 / 2) < 1e-9
    # one empty sample -> everything but counts NULL
    df2 = spark.createDataFrame([(1, True), (2, True)], "v LONG, is_a BOOLEAN")
    got2 = st.mann_whitney_u(df2, "v", F.col("is_a")).collect()[0]
    assert got2["n_b"] == 0 and got2["u_stat"] is None


def test_welch_t_matches_reference(spark):
    rng = random.Random(4)
    a = [rng.gauss(10, 2) for _ in range(120)]
    b = [rng.gauss(11, 5) for _ in range(80)]
    rows = [(v, True) for v in a] + [(v, False) for v in b]
    df = spark.createDataFrame(rows, "v DOUBLE, is_a BOOLEAN")
    got = st.welch_t(df, "v", F.col("is_a")).collect()[0]

    def mean(xs):
        return sum(xs) / len(xs)

    def var(xs):
        m = mean(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    qa, qb = var(a) / len(a), var(b) / len(b)
    t = (mean(a) - mean(b)) / math.sqrt(qa + qb)
    dfw = (qa + qb) ** 2 / (qa**2 / (len(a) - 1) + qb**2 / (len(b) - 1))
    assert abs(got["mean_a"] - mean(a)) < 1e-6
    assert abs(got["t_stat"] - t) < 1e-6
    assert abs(got["df_welch"] - dfw) < 1e-5


def test_welch_t_degenerate(spark):
    # n_b = 1 -> undefined variance -> NULLs
    rows = [(1.0, True), (2.0, True), (3.0, False)]
    df = spark.createDataFrame(rows, "v DOUBLE, is_a BOOLEAN")
    got = st.welch_t(df, "v", F.col("is_a")).collect()[0]
    assert got["t_stat"] is None and got["df_welch"] is None
    # both variances zero -> NULL t (0/0 guarded)
    rows2 = [(2.0, True)] * 3 + [(2.0, False)] * 3
    got2 = st.welch_t(
        spark.createDataFrame(rows2, "v DOUBLE, is_a BOOLEAN"),
        "v",
        F.col("is_a"),
    ).collect()[0]
    assert got2["t_stat"] is None


# --- graph: local clustering + Adamic-Adar -----------------------------------


def _rand_graph(seed, n=60, m=150):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    return sorted(edges)


def _adj(edges):
    nb: dict = {}
    for u, v in edges:
        nb.setdefault(u, set()).add(v)
        nb.setdefault(v, set()).add(u)
    return nb


@pytest.mark.parametrize("seed", [2, 7])
def test_local_clustering_matches_brute_force(spark, seed):
    from sparkbigdatatextanalysis_spark.operators import components as cc

    edges = _rand_graph(seed)
    nb = _adj(edges)
    df = spark.createDataFrame(edges, "u LONG, v LONG")
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering"])
        for r in cc.local_clustering(df).collect()
    }
    assert set(got) == set(nb)
    for node, neigh in nb.items():
        ns = sorted(neigh)
        tri = sum(
            1
            for i in range(len(ns))
            for j in range(i + 1, len(ns))
            if ns[j] in nb[ns[i]]
        )
        deg = len(neigh)
        c = 2 * tri / (deg * (deg - 1)) if deg >= 2 else None
        gdeg, gtri, gc = got[node]
        assert (gdeg, gtri) == (deg, tri)
        if c is None:
            assert gc is None
        else:
            assert abs(gc - c) < 1e-8


@pytest.mark.parametrize("seed", [3, 11])
def test_adamic_adar_matches_brute_force(spark, seed):
    from sparkbigdatatextanalysis_spark.operators import components as cc

    edges = _rand_graph(seed)
    nb = _adj(edges)
    df = spark.createDataFrame(edges, "u LONG, v LONG")
    got = {
        (r["a_id"], r["b_id"]): (r["n_common"], r["adamic_adar"])
        for r in cc.adamic_adar_edges(df).collect()
    }
    assert set(got) == set(edges)
    for u, v in edges:
        common = nb[u] & nb[v]
        aa = sum(round(1.0 / math.log(len(nb[w])), 12) for w in common)
        n_c, g_aa = got[(u, v)]
        assert n_c == len(common)
        assert abs(g_aa - round(aa, 6)) < 1e-9


def test_adamic_adar_dedup_of_reversed_edges(spark):
    from sparkbigdatatextanalysis_spark.operators import components as cc

    # triangle given with duplicates/reversals + a self-loop + pendant
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (3, 3), (3, 4)], "u LONG, v LONG"
    )
    got = {
        (r["a_id"], r["b_id"]): (r["n_common"], r["adamic_adar"])
        for r in cc.adamic_adar_edges(df).collect()
    }
    # deg: 1->2, 2->2, 3->3, 4->1
    assert got[(1, 2)] == (1, round(round(1 / math.log(3), 12), 6))
    assert got[(1, 3)] == (1, round(round(1 / math.log(2), 12), 6))
    assert got[(3, 4)] == (0, 0.0)


# --- Spearman ----------------------------------------------------------------


def _brute_spearman(xs, ys):
    def midranks(vals):
        s = sorted(vals)
        first: dict = {}
        from collections import Counter

        cnt = Counter(vals)
        pos = 0
        seen: dict = {}
        for v in s:
            if v not in seen:
                seen[v] = pos + (cnt[v] + 1) / 2
            pos += 1
        return [seen[v] for v in vals]

    rx, ry = midranks(xs), midranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    vx = sum((a - mx) ** 2 for a in rx)
    vy = sum((b - my) ** 2 for b in ry)
    return cov / math.sqrt(vx * vy)


@pytest.mark.parametrize("seed", [6, 13])
def test_spearman_matches_brute_force(spark, seed):
    rng = random.Random(seed)
    xs = [rng.randrange(40) for _ in range(300)]  # heavy ties
    ys = [x + rng.randrange(25) for x in xs]  # monotone-ish + noise
    df = spark.createDataFrame(list(zip(xs, ys)), "x LONG, y LONG")
    got = st.spearman_rho(df, "x", "y").collect()[0]
    assert got["n"] == 300
    assert abs(got["spearman_rho"] - _brute_spearman(xs, ys)) < 1e-8


def test_spearman_continuous_and_edges(spark):
    rng = random.Random(21)
    xs = [round(rng.gauss(0, 1), 9) for _ in range(250)]
    ys = [round(-x + rng.gauss(0, 0.3), 9) for x in xs]
    df = spark.createDataFrame(list(zip(xs, ys)), "x DOUBLE, y DOUBLE")
    got = st.spearman_rho(df, "x", "y", n_buckets=8).collect()[0]
    assert abs(got["spearman_rho"] - _brute_spearman(xs, ys)) < 1e-8
    assert got["spearman_rho"] < -0.8
    # constant column -> NULL rho
    dfc = spark.createDataFrame([(1, 5), (2, 5), (3, 5)], "x LONG, y LONG")
    assert st.spearman_rho(dfc, "x", "y").collect()[0]["spearman_rho"] is None
    # perfect monotone -> exactly 1.0
    dfm = spark.createDataFrame([(i, i * i) for i in range(10)], "x LONG, y LONG")
    assert st.spearman_rho(dfm, "x", "y").collect()[0]["spearman_rho"] == 1.0


# --- ANN recall curve --------------------------------------------------------


def test_ann_recall_monotone_and_full_probe_exact(spark):
    """recall@k is monotone nondecreasing in n_probe (a truth pair
    caught at probe p cannot be displaced at a larger p: any candidate
    outscoring a global top-k item is itself global top-k), and under
    full probing the IVF candidate set is the corpus, so recall == 1.0
    exactly."""
    import __spark_entry__ as entrymod
    from sparkbigdatatextanalysis_spark.operators import ann as ann_ops

    sf = "/root/testdata/sf0.001"
    rows = {
        r["n_probe"]: (r["n_caught"], r["n_truth"], r["recall"])
        for r in entrymod.q_embeddings_ann_recall_curve(spark, sf).collect()
    }
    assert sorted(rows) == sorted(entrymod._ANN_RECALL_PROBES)
    probes = sorted(rows)
    for lo, hi in zip(probes, probes[1:]):
        assert rows[lo][0] <= rows[hi][0]
    # full probing == brute force
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qids = emb.select("vec_id")
    truth = {
        (r["q_id"], r["n_id"])
        for r in ann_ops.cosine_topk_bruteforce(
            emb, qids, k=entrymod.ANN_K
        ).collect()
    }
    full = {
        (r["q_id"], r["n_id"])
        for r in ann_ops.cosine_topk_ivf(
            emb,
            qids,
            k=entrymod.ANN_K,
            n_centroids=ann_ops.N_CENTROIDS,
            n_probe=ann_ops.N_CENTROIDS,
        ).collect()
    }
    assert full == truth
