"""Hypothesis property sweeps for the round-10 library operators:
random small inputs (dup edges, ties, degenerate groups) against naive
Python references -- the fixed-seed brute-force tests' randomized
complement (the r8/r9 property-sweep discipline extended)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.operators import components as cc
from sparkbigdatatextanalysis_spark.operators import relational as rel
from sparkbigdatatextanalysis_spark.operators import stats as stt

PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

NODE = st.integers(min_value=0, max_value=12)
EDGES = st.lists(st.tuples(NODE, NODE), min_size=1, max_size=30)


@PROP
@given(edges=EDGES)
def test_assortativity_property(spark, edges):
    df = spark.createDataFrame(edges, "u LONG, v LONG")
    got = cc.degree_assortativity(df).collect()
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    if not und:
        # all self-loops: empty canonical edge set -> empty moment agg
        # still yields one row with zero counts or none; accept either
        assert len(got) <= 1
        return
    row = got[0]
    deg: dict = {}
    for x, y in und:
        deg[x] = deg.get(x, 0) + 1
        deg[y] = deg.get(y, 0) + 1
    assert row["n_nodes"] == len(deg) and row["n_edges"] == len(und)
    pts = []
    for x, y in und:
        pts.append((deg[x], deg[y]))
        pts.append((deg[y], deg[x]))
    m = len(pts)
    sx = sum(p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    varx = m * sxx - sx * sx
    if varx <= 0:
        assert row["assortativity"] is None
    else:
        # symmetric edge list: sy == sx and vary == varx
        want = (m * sxy - sx * sx) / varx
        assert abs(row["assortativity"] - want) < 1e-7


@PROP
@given(
    vals=st.lists(
        st.tuples(st.integers(min_value=0, max_value=15), st.booleans()),
        min_size=1,
        max_size=40,
    )
)
def test_ks_two_sample_property(spark, vals):
    a = [v for v, is_a in vals if is_a]
    b = [v for v, is_a in vals if not is_a]
    df = spark.createDataFrame(vals, "v LONG, a BOOLEAN")
    got = stt.ks_two_sample(df, "v", F.col("a")).collect()[0]
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    if not a or not b:
        # one empty sample: no ECDF to compare -> NULL statistic (the
        # divide-by-zero guard, hypothesis-found)
        assert got["ks_stat"] is None
        return
    best = (-1, None)
    for v in sorted(set(v for v, _ in vals)):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        g = abs(ca * len(b) - cb * len(a))
        if g > best[0]:
            best = (g, v)
    assert abs(got["ks_stat"] - best[0] / (len(a) * len(b))) < 1e-9
    assert got["ks_at_value"] == best[1]


@PROP
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_skyline_property(spark, rows):
    data = [(i, x, float(y)) for i, (x, y) in enumerate(rows)]
    df = spark.createDataFrame(data, "id LONG, x LONG, y DOUBLE")
    got = sorted(
        (r["id"], r["x"], r["y"]) for r in rel.skyline_2d(df, "x", "y").collect()
    )
    want = sorted(
        r
        for r in data
        if not any(
            o[1] >= r[1] and o[2] >= r[2] and (o[1] > r[1] or o[2] > r[2])
            for o in data
        )
    )
    assert got == want


@PROP
@given(edges=EDGES, hops=st.integers(min_value=1, max_value=3))
def test_bfs_levels_property(spark, edges, hops):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    df = spark.createDataFrame(edges, "u LONG, v LONG")
    got = {
        r["dist"]: r["n_nodes"] for r in cc.bfs_levels(df, max_hops=hops).collect()
    }
    if not und:
        assert got == {} or got == {-1: 0}
        return
    adj: dict = {}
    deg: dict = {}
    for x, y in und:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
        deg[x] = deg.get(x, 0) + 1
        deg[y] = deg.get(y, 0) + 1
    seed = min(deg, key=lambda n: (-deg[n], n))
    reached = {seed: 0}
    frontier = [seed]
    for h in range(1, hops + 1):
        nxt = sorted({t for s in frontier for t in adj[s] if t not in reached})
        if not nxt:
            break
        for t in nxt:
            reached[t] = h
        frontier = nxt
    want: dict = {}
    for d in reached.values():
        want[d] = want.get(d, 0) + 1
    want[-1] = len(deg) - len(reached)
    want = {d: n for d, n in want.items() if n > 0 or d == -1}
    assert got == want
