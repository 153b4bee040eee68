"""Wave-5 operator semantics against brute-force Python twins:
degree assortativity, two-sample KS, daily autocorrelation, chi-square
independence, and the HHI / inter-purchase query shapes."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.operators import components as cc
from sparkbigdatatextanalysis_spark.operators import stats as st
from sparkbigdatatextanalysis_spark.operators import timeseries as tsr


# --- degree_assortativity ----------------------------------------------------


def _brute_assortativity(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg: dict[int, int] = {}
    for x, y in und:
        deg[x] = deg.get(x, 0) + 1
        deg[y] = deg.get(y, 0) + 1
    pts = []
    for x, y in und:
        pts.append((deg[x], deg[y]))
        pts.append((deg[y], deg[x]))
    m = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    syy = sum(p[1] * p[1] for p in pts)
    varx = m * sxx - sx * sx
    vary = m * syy - sy * sy
    if varx <= 0 or vary <= 0:
        return len(deg), len(und), None
    return (
        len(deg),
        len(und),
        (m * sxy - sx * sy) / math.sqrt(varx * vary),
    )


def test_assortativity_star_is_negative(spark):
    # a star: the hub (deg n) pairs with leaves (deg 1) -> strongly negative
    edges = [(0, i) for i in range(1, 8)]
    df = spark.createDataFrame(edges, "u LONG, v LONG")
    row = cc.degree_assortativity(df).collect()[0]
    n, e, r = _brute_assortativity(edges)
    assert (row["n_nodes"], row["n_edges"]) == (n, e)
    assert r < -0.99 and abs(row["assortativity"] - r) < 1e-8


def test_assortativity_matches_brute_force_random(spark):
    rng = random.Random(11)
    edges = list(
        {
            (rng.randrange(30), rng.randrange(30))
            for _ in range(120)
        }
    )
    df = spark.createDataFrame(edges, "u LONG, v LONG")
    row = cc.degree_assortativity(df).collect()[0]
    n, e, r = _brute_assortativity(edges)
    assert (row["n_nodes"], row["n_edges"]) == (n, e)
    if r is None:
        assert row["assortativity"] is None
    else:
        assert abs(row["assortativity"] - r) < 1e-8


def test_assortativity_clique_degenerate(spark):
    # complete graph: all degrees equal -> zero variance -> NULL
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    df = spark.createDataFrame(edges, "u LONG, v LONG")
    row = cc.degree_assortativity(df).collect()[0]
    assert row["assortativity"] is None
    assert row["n_nodes"] == 5 and row["n_edges"] == 10


# --- ks_two_sample -----------------------------------------------------------


def _brute_ks(a_vals, b_vals):
    na, nb = len(a_vals), len(b_vals)
    vals = sorted(set(a_vals) | set(b_vals))
    best = (-1, None)
    for v in vals:
        ca = sum(1 for x in a_vals if x <= v)
        cb = sum(1 for x in b_vals if x <= v)
        g = abs(ca * nb - cb * na)
        if g > best[0]:
            best = (g, v)
    return na, nb, best[0] / (na * nb), best[1]


def test_ks_two_sample_matches_brute_force(spark):
    rng = random.Random(7)
    a = [rng.randrange(50) for _ in range(300)]
    b = [rng.randrange(20, 80) for _ in range(200)]  # shifted support
    rows = [(v, True) for v in a] + [(v, False) for v in b]
    df = spark.createDataFrame(rows, "v LONG, is_a BOOLEAN")
    got = st.ks_two_sample(df, "v", F.col("is_a")).collect()[0]
    na, nb, ks, at = _brute_ks(a, b)
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert abs(got["ks_stat"] - ks) < 1e-9
    assert got["ks_at_value"] == at


def test_ks_identical_samples_is_zero(spark):
    vals = [1, 2, 3, 4, 5] * 10
    rows = [(v, True) for v in vals] + [(v, False) for v in vals]
    df = spark.createDataFrame(rows, "v LONG, is_a BOOLEAN")
    got = st.ks_two_sample(df, "v", F.col("is_a")).collect()[0]
    assert got["ks_stat"] == 0.0


def test_ks_argmax_tie_breaks_to_smallest_value(spark):
    # A = {1,3}, B = {2,4}: the gap |F_A - F_B| is 1/2 at v=1, 0 at v=2,
    # 1/2 at v=3, 0 at v=4 -> argmax ties at 1 and 3, must pick 1
    rows = [(1, True), (3, True), (2, False), (4, False)]
    df = spark.createDataFrame(rows, "v LONG, is_a BOOLEAN")
    got = st.ks_two_sample(df, "v", F.col("is_a")).collect()[0]
    assert abs(got["ks_stat"] - 0.5) < 1e-12
    assert got["ks_at_value"] == 1


# --- autocorrelation ---------------------------------------------------------


def _brute_acf(xs, max_lag):
    n = len(xs)
    mean = sum(xs) / n
    den = sum((x - mean) ** 2 for x in xs)
    out = {}
    for k in range(1, max_lag + 1):
        num = sum(
            (xs[t] - mean) * (xs[t + k] - mean) for t in range(n - k)
        )
        out[k] = (n - k, num / den if den > 0 else None)
    return out


def test_autocorrelation_matches_brute_force(spark):
    import datetime as dt

    rng = random.Random(3)
    # weekly-cyclic counts + noise
    xs = [
        100 + 40 * (i % 7 in (5, 6)) + rng.randrange(10) for i in range(60)
    ]
    d0 = dt.date(2024, 1, 1)
    rows = [(d0 + dt.timedelta(days=i), xs[i]) for i in range(60)]
    df = spark.createDataFrame(rows, "day DATE, x LONG")
    got = {
        r["lag"]: r
        for r in tsr.autocorrelation(df, "day", "x", max_lag=7).collect()
    }
    want = _brute_acf(xs, 7)
    for k in range(1, 8):
        m, r = want[k]
        assert got[k]["n_pairs"] == m
        assert abs(got[k]["acf"] - r) < 1e-7
    # the weekly cycle must show: lag-7 ACF clearly dominates lag-3
    assert got[7]["acf"] > got[3]["acf"] + 0.2


def test_autocorrelation_handles_missing_days(spark):
    import datetime as dt

    d0 = dt.date(2024, 1, 1)
    # days 0,1,2,4 (3 missing): lag-1 pairs = (0,1),(1,2); lag-2 = (0,2),(2,4)
    rows = [
        (d0, 10),
        (d0 + dt.timedelta(days=1), 20),
        (d0 + dt.timedelta(days=2), 30),
        (d0 + dt.timedelta(days=4), 40),
    ]
    df = spark.createDataFrame(rows, "day DATE, x LONG")
    got = {
        r["lag"]: r["n_pairs"]
        for r in tsr.autocorrelation(df, "day", "x", max_lag=2).collect()
    }
    assert got == {1: 2, 2: 2}


# --- chi-square / HHI / interpurchase query shapes ---------------------------


SF = "/root/testdata/sf0.001"


def test_chisq_brute_force(spark):
    import __spark_entry__ as entry

    got = entry.q_events_chisq_type_dow(spark, SF).collect()[0]
    ev = (
        entry._events(spark, SF)
        .where(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.pmod(
                F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date")),
                7,
            ).alias("dow"),
        )
        .collect()
    )
    cells: dict[tuple, int] = {}
    for r in ev:
        cells[(r["event_type"], r["dow"])] = (
            cells.get((r["event_type"], r["dow"]), 0) + 1
        )
    rt: dict[str, int] = {}
    ct: dict[int, int] = {}
    for (t, d), n in cells.items():
        rt[t] = rt.get(t, 0) + n
        ct[d] = ct.get(d, 0) + n
    ntot = sum(cells.values())
    chi2 = 0.0
    for (t, d), n in cells.items():
        e = rt[t] * ct[d] / ntot
        chi2 += (n - e) ** 2 / e
    assert got["n_cells"] == len(cells)
    assert got["n_total"] == ntot
    assert got["dof"] == (len(rt) - 1) * (len(ct) - 1)
    assert abs(got["chi2"] - chi2) < 1e-4


def test_hhi_bounds_and_brute_force(spark):
    import __spark_entry__ as entry

    rows = entry.q_brand_supplier_hhi(spark, SF).collect()
    assert rows
    for r in rows:
        # HHI lives in [1/n, 1]; top supplier share can't be below 1/n
        lo = 1.0 / r["n_suppliers"]
        assert lo - 1e-9 <= r["hhi"] <= 1.0 + 1e-9
        assert r["top_share"] >= lo - 1e-9
        assert r["top_share"] ** 2 <= r["hhi"] + 1e-9


def test_interpurchase_shares_sum_to_one(spark):
    import __spark_entry__ as entry

    rows = entry.q_orders_interpurchase_dist(spark, SF).collect()
    assert rows
    by_seg: dict[str, float] = {}
    for r in rows:
        by_seg[r["c_mktsegment"]] = (
            by_seg.get(r["c_mktsegment"], 0.0) + r["share"]
        )
        assert r["mean_gap_days"] >= 0
    for s, tot in by_seg.items():
        assert abs(tot - 1.0) < 1e-6, (s, tot)


def test_ks_continuous_domain_bucketed_matches_brute_force(spark):
    """r11: the ECDF runs through the global_rank bucket decomposition;
    on a CONTINUOUS double domain (every value distinct -- the case the
    old unpartitioned window handled as a single-task straggler) the
    statistic must still equal the naive reference, for both exact and
    GK-sketch cuts, and for n_buckets that actually split the table."""
    rng = random.Random(11)
    a = [round(rng.gauss(0.0, 1.0), 9) for _ in range(400)]
    b = [round(rng.gauss(0.4, 1.3), 9) for _ in range(300)]
    rows = [(v, True) for v in a] + [(v, False) for v in b]
    df = spark.createDataFrame(rows, "v DOUBLE, is_a BOOLEAN")
    na, nb, ks, at = _brute_ks(a, b)
    for kwargs in ({"n_buckets": 8}, {"n_buckets": 8, "relative_error": 0.01}):
        got = st.ks_two_sample(df, "v", F.col("is_a"), **kwargs).collect()[0]
        assert (got["n_a"], got["n_b"]) == (na, nb)
        assert abs(got["ks_stat"] - ks) < 1e-9
        assert got["ks_at_value"] == at
