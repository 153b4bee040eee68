"""Property sweeps for the round-9 operators: each distributed result is
checked against an independent brute-force Python computation on
randomized inputs (the r8 post-freeze discipline -- hand-built fixtures
pin the semantics, properties sweep the space around them)."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.operators import ann as ann_ops
from sparkbigdatatextanalysis_spark.operators import components as cc
from sparkbigdatatextanalysis_spark.operators import relational as rel
from sparkbigdatatextanalysis_spark.operators import timeseries as tsx


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_interval_union_matches_bruteforce_coverage(spark, seed):
    rng = random.Random(seed)
    rows = []
    for i in range(300):
        k = rng.randrange(4)
        s = rng.randrange(0, 200)
        rows.append((k, s, s + rng.randrange(0, 30)))
    df = spark.createDataFrame(rows, "k LONG, start_s LONG, end_s LONG")
    got = {
        r["k"]: (r["n_intervals"], r["covered"])
        for r in tsx.interval_union(df, "k").collect()
    }
    for k in {r[0] for r in rows}:
        ivs = [(s, e) for (kk, s, e) in rows if kk == k]
        covered = set()
        for s, e in ivs:
            covered.update(range(s, e))
        assert got[k] == (len(ivs), len(covered)), (seed, k)


@pytest.mark.parametrize("seed,k", [(5, 2), (6, 3), (7, 4)])
def test_kcore_matches_bruteforce_fixpoint(spark, seed, k):
    """With enough rounds the bounded peel reaches the true k-core; the
    brute force peels to fixpoint in plain Python."""
    rng = random.Random(seed)
    pairs = [
        (i, j)
        for i, j in itertools.combinations(range(24), 2)
        if rng.random() < 0.18
    ]
    if not pairs:
        pytest.skip("empty graph draw")
    e = spark.createDataFrame(pairs, "a_id BIGINT, b_id BIGINT")
    got = {
        r["node"]: r["in_core"]
        for r in cc.kcore_peel(e, "a_id", "b_id", k=k, rounds=24).collect()
    }
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {n for n in alive if len(adj[n] & alive) < k}
        if not drop:
            break
        alive -= drop
    assert {n for n, c in got.items() if c} == alive, (seed, k)


@pytest.mark.parametrize("seed", [11, 12])
def test_cooccurrence_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    rows = [
        (g, rng.choice("abcdef"))
        for g in range(40)
        for _ in range(rng.randrange(1, 6))
    ]
    df = spark.createDataFrame(rows, "g LONG, item STRING")
    got = {
        (r["item_a"], r["item_b"]): r["n_together"]
        for r in rel.cooccurrence_pairs(df, "g", "item", min_support=1).collect()
    }
    sets: dict = {}
    for g, it in rows:
        sets.setdefault(g, set()).add(it)
    want: dict = {}
    for items in sets.values():
        for a, b in itertools.combinations(sorted(items), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want, seed


@pytest.mark.parametrize("seed", [21, 22])
def test_linreg_matches_numpy(spark, seed):
    np = pytest.importorskip("numpy")
    rng = random.Random(seed)
    rows = [
        (g, float(rng.randrange(100)), rng.uniform(-50, 50))
        for g in ("p", "q")
        for _ in range(60)
    ]
    from sparkbigdatatextanalysis_spark.operators import stats as st

    df = spark.createDataFrame(rows, "g STRING, x DOUBLE, y DOUBLE")
    got = {r["g"]: r for r in st.grouped_linreg(df, ["g"], "x", "y").collect()}
    for g in ("p", "q"):
        xs = np.array([x for (gg, x, _) in rows if gg == g])
        ys = np.array([y for (gg, _, y) in rows if gg == g])
        slope, intercept = np.polyfit(xs, ys, 1)
        assert got[g]["slope"] == pytest.approx(slope, abs=1e-4), seed
        assert got[g]["intercept"] == pytest.approx(intercept, abs=1e-4), seed
        r = np.corrcoef(xs, ys)[0, 1]
        assert got[g]["r2"] == pytest.approx(r * r, abs=1e-4), seed


@pytest.mark.parametrize("seed", [31, 32])
def test_knn_matches_bruteforce_vote(spark, seed):
    np = pytest.importorskip("numpy")
    rng = np.random.RandomState(seed)
    dim, nc, nq, k = 6, 30, 8, 5
    cvecs = rng.randn(nc, dim).astype("float32")
    qvecs = rng.randn(nq, dim).astype("float32")
    labels = [int(l) for l in rng.randint(0, 3, nc)]
    schema = "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    corpus = spark.createDataFrame(
        [(i, [float(v) for v in cvecs[i]], labels[i]) for i in range(nc)], schema
    )
    queries = spark.createDataFrame(
        [(100 + i, [float(v) for v in qvecs[i]], None) for i in range(nq)],
        schema,
    )
    got = {
        r["vec_id"]: (r["pred_label"], r["n_votes"])
        for r in ann_ops.knn_label_vote(queries, corpus, k=k).collect()
    }
    for i in range(nq):
        q = qvecs[i].astype("float64")
        cos = [
            round(
                float(q @ cvecs[j].astype("float64"))
                / (
                    float(np.sqrt(q @ q))
                    * float(np.sqrt(cvecs[j].astype("float64") @ cvecs[j].astype("float64")))
                ),
                9,
            )
            for j in range(nc)
        ]
        order = sorted(range(nc), key=lambda j: (-cos[j], j))[:k]
        votes: dict = {}
        for j in order:
            votes[labels[j]] = votes.get(labels[j], 0) + 1
        win = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[100 + i] == win, (seed, i)


@pytest.mark.parametrize("seed", [41])
def test_markov_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    rows = []
    eid = 0
    for u in range(12):
        for t in range(rng.randrange(1, 9)):
            eid += 1
            rows.append((u, eid, float(t), rng.choice("xyz")))
    df = spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, tsd DOUBLE, event_type STRING"
    ).withColumn("ts", F.timestamp_seconds("tsd"))
    got = {
        (r["prev_state"], r["next_state"]): r["n_transitions"]
        for r in tsx.markov_transitions(df).collect()
    }
    want: dict = {}
    by_user: dict = {}
    for u, e, t, s in rows:
        by_user.setdefault(u, []).append((t, e, s))
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want, seed
