"""Wave-10 operator semantics (Markov stationary vs numpy, triplet
margin vs brute force, power-curve invariants) plus partition-count
invariance for the wave-5..9 library operators (the decimal-discipline
guard extended to the new surface)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.operators import components as cc
from sparkbigdatatextanalysis_spark.operators import stats as st
from sparkbigdatatextanalysis_spark.operators import timeseries as tsr

SF = "/root/testdata/sf0.001"


# --- wave-10 keys --------------------------------------------------------------


def test_markov_stationary_matches_numpy_iteration(spark):
    import numpy as np

    import __spark_entry__ as entry

    got = {
        r["state"]: r["stationary_prob"]
        for r in entry.q_events_markov_stationary(spark, SF).collect()
    }
    trans = tsr.markov_transitions(entry._events(spark, SF)).collect()
    states = sorted(
        {r["prev_state"] for r in trans} | {r["next_state"] for r in trans}
    )
    P = np.zeros((len(states), len(states)))
    idx = {s: i for i, s in enumerate(states)}
    for r in trans:
        P[idx[r["prev_state"]], idx[r["next_state"]]] = r["p_transition"]
    pi = np.full(len(states), 1.0 / len(states))
    for _ in range(entry._MARKOV_ROUNDS):
        pi = np.round(pi @ P, 9)
    assert set(got) == set(states)
    for s in states:
        assert abs(got[s] - pi[idx[s]]) < 1e-6
    # a proper distribution up to per-round rounding drip
    assert abs(sum(got.values()) - 1.0) < 1e-3


def test_triplet_margin_brute_force(spark):
    import numpy as np

    import __spark_entry__ as entry

    got = {
        r["label"]: r
        for r in entry.q_embeddings_triplet_margin(spark, SF).collect()
    }
    emb = entry._emb(spark, SF).collect()
    X = np.array([[float(x) for x in r["embedding"]] for r in emb])
    labels = [r["label"] for r in emb]
    norms = np.sqrt((X * X).sum(axis=1))
    cos = (X @ X.T) / np.outer(norms, norms)
    by_label: dict = {}
    for i in range(len(emb)):
        same = [
            round(cos[i, j], 9)
            for j in range(len(emb))
            if j != i and labels[j] == labels[i]
        ]
        diff = [
            round(cos[i, j], 9)
            for j in range(len(emb))
            if j != i and labels[j] != labels[i]
        ]
        if not same or not diff:
            continue
        m = max(same) - max(diff)
        by_label.setdefault(labels[i], []).append(m)
    assert set(got) == set(by_label)
    for lab, ms in by_label.items():
        g = got[lab]
        assert g["n_vectors"] == len(ms)
        assert abs(g["mean_margin"] - sum(ms) / len(ms)) < 1e-4
        assert (
            abs(g["share_positive"] - sum(1 for m in ms if m > 0) / len(ms))
            < 1e-9
        )


def test_power_curve_partitions_all_users(spark):
    import __spark_entry__ as entry

    rows = entry.q_users_power_curve(spark, SF).collect()
    n_users = entry._events(spark, SF).select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    assert abs(sum(r["user_share"] for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert r["lo_events"] == 2 ** r["bucket"]
        assert r["hi_events"] == 2 ** (r["bucket"] + 1) - 1


# --- partition invariance for the new library operators -------------------------


def test_ks_two_sample_partition_invariant(spark):
    rng = random.Random(9)
    rows = [(rng.randrange(200), rng.random() < 0.4) for _ in range(5000)]
    out = []
    for p in (1, 3, 16):
        df = spark.createDataFrame(rows, "v LONG, a BOOLEAN").repartition(p)
        out.append(st.ks_two_sample(df, "v", F.col("a")).collect()[0])
    assert out[0] == out[1] == out[2]


def test_degree_assortativity_partition_invariant(spark):
    rng = random.Random(21)
    edges = list({(rng.randrange(60), rng.randrange(60)) for _ in range(300)})
    out = []
    for p in (1, 3, 16):
        df = spark.createDataFrame(edges, "u LONG, v LONG").repartition(p)
        out.append(cc.degree_assortativity(df).collect()[0])
    assert out[0] == out[1] == out[2]


def test_autocorrelation_partition_invariant(spark):
    import datetime as dt

    rng = random.Random(2)
    d0 = dt.date(2024, 1, 1)
    rows = [
        (d0 + dt.timedelta(days=i), rng.randrange(10**7)) for i in range(90)
    ]
    out = []
    for p in (1, 3, 16):
        df = spark.createDataFrame(rows, "day DATE, x LONG").repartition(p)
        out.append(
            sorted(
                tsr.autocorrelation(df, "day", "x", 5).collect(),
                key=lambda r: r["lag"],
            )
        )
    assert out[0] == out[1] == out[2]


def test_bfs_levels_partition_invariant(spark):
    rng = random.Random(33)
    edges = list({(rng.randrange(50), rng.randrange(50)) for _ in range(120)})
    out = []
    for p in (1, 16):
        df = spark.createDataFrame(edges, "u LONG, v LONG").repartition(p)
        out.append(
            sorted(
                (r["dist"], r["n_nodes"])
                for r in cc.bfs_levels(df, max_hops=3).collect()
            )
        )
    assert out[0] == out[1]


def test_skyline_partition_invariant(spark):
    from sparkbigdatatextanalysis_spark.operators import relational as rel

    rng = random.Random(41)
    rows = [
        (i, rng.randrange(15), float(rng.randrange(1000)) / 8)
        for i in range(3000)
    ]
    out = []
    for p in (1, 16):
        df = spark.createDataFrame(
            rows, "id LONG, x LONG, y DOUBLE"
        ).repartition(p)
        out.append(
            sorted(
                (r["id"], r["x"], r["y"])
                for r in rel.skyline_2d(df, "x", "y").collect()
            )
        )
    assert out[0] == out[1]
