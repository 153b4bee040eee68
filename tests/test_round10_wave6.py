"""Wave-6 operator semantics against independent brute-force twins:
MMR diversified top-k (numpy greedy), 2-D skyline (quadratic
definition), CUSUM changepoint, token entropy, session bounce rate."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.operators import relational as rel

SF = "/root/testdata/sf0.001"


# --- skyline_2d ---------------------------------------------------------------


def _brute_skyline(rows):
    out = []
    for r in rows:
        dominated = any(
            o[1] >= r[1]
            and o[2] >= r[2]
            and (o[1] > r[1] or o[2] > r[2])
            for o in rows
        )
        if not dominated:
            out.append(r)
    return sorted(out)


def test_skyline_matches_quadratic_definition(spark):
    rng = random.Random(5)
    rows = [
        (i, rng.randrange(12), float(rng.randrange(100)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id LONG, x LONG, y DOUBLE")
    got = sorted(
        (r["id"], r["x"], r["y"])
        for r in rel.skyline_2d(df, "x", "y").collect()
    )
    assert got == _brute_skyline(rows)


def test_skyline_keeps_all_ties_on_both_axes(spark):
    rows = [(1, 5, 9.0), (2, 5, 9.0), (3, 5, 8.0), (4, 4, 9.0)]
    df = spark.createDataFrame(rows, "id LONG, x LONG, y DOUBLE")
    got = sorted(r["id"] for r in rel.skyline_2d(df, "x", "y").collect())
    # (5,9.0) twice: mutually non-dominating, both kept; (5,8.0) and
    # (4,9.0) are dominated by them
    assert got == [1, 2]


def test_skyline_single_point_and_chain(spark):
    df = spark.createDataFrame([(1, 3, 7.0)], "id LONG, x LONG, y DOUBLE")
    assert [r["id"] for r in rel.skyline_2d(df, "x", "y").collect()] == [1]
    # strictly increasing x with strictly decreasing y: ALL on the front
    chain = [(i, i, float(100 - i)) for i in range(10)]
    df2 = spark.createDataFrame(chain, "id LONG, x LONG, y DOUBLE")
    assert len(rel.skyline_2d(df2, "x", "y").collect()) == 10


# --- MMR ----------------------------------------------------------------------


def test_mmr_matches_numpy_greedy(spark):
    import numpy as np

    import __spark_entry__ as entry

    got = sorted(
        entry.q_embeddings_mmr_topk(spark, SF).collect(),
        key=lambda r: r["rank"],
    )
    emb = sorted(
        entry._emb(spark, SF).collect(), key=lambda r: r["vec_id"]
    )
    ids = np.array([r["vec_id"] for r in emb])
    X = np.array([[float(x) for x in r["embedding"]] for r in emb])
    norms = np.sqrt((X * X).sum(axis=1))
    qi = 0  # min vec_id is first after sort
    rels = (X @ X[qi]) / (norms[qi] * norms)
    cand_order = sorted(
        [i for i in range(len(ids)) if i != qi],
        key=lambda i: (-round(rels[i], 9), ids[i]),
    )[: entry._MMR_POOL]
    sel: list[int] = []
    for _ in range(entry._MMR_K):
        best = None
        for i in cand_order:
            if i in sel:
                continue
            maxsim = max(
                (
                    round(
                        float(X[i] @ X[j]) / float(norms[i] * norms[j]), 9
                    )
                    for j in sel
                ),
                default=0.0,
            )
            score = 0.7 * round(float(rels[i]), 9) - 0.3 * maxsim
            k = (score, -ids[i])
            if best is None or k > best[0]:
                best = (k, i)
        sel.append(best[1])
    assert [r["vec_id"] for r in got] == [int(ids[i]) for i in sel]
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
    # rank 1 is the plain nearest neighbor (no diversity penalty yet)
    assert got[0]["vec_id"] == int(ids[cand_order[0]])


def test_mmr_scores_nonincreasing_and_bounded(spark):
    import __spark_entry__ as entry

    rows = sorted(
        entry.q_embeddings_mmr_topk(spark, SF).collect(),
        key=lambda r: r["rank"],
    )
    assert len(rows) == 5 and len({r["vec_id"] for r in rows}) == 5
    for r in rows:
        # score = 0.7*rel - 0.3*maxsim with rel, maxsim in [-1, 1]
        assert -1.0 - 1e-9 <= r["mmr_score"] <= 1.0 + 1e-9
        assert r["mmr_score"] <= 0.7 * r["relevance"] + 0.3 + 1e-9


# --- CUSUM --------------------------------------------------------------------


def test_cusum_changepoint_brute_force(spark):
    import __spark_entry__ as entry

    got = entry.q_events_cusum_changepoint(spark, SF).collect()[0]
    daily = sorted(
        (r["day"], r["x"])
        for r in entry._events(spark, SF)
        .where(F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    xs = [x for _, x in daily]
    mean = sum(xs) / len(xs)
    cum = 0
    best = None
    for t, (day, x) in enumerate(daily, start=1):
        cum += x
        dev = abs(cum - t * mean)
        if best is None or dev > best[0] + 1e-12:
            best = (dev, day)
    assert got["n_days"] == len(daily)
    assert got["changepoint_day"] == best[1].strftime("%Y-%m-%d")
    assert abs(got["max_abs_cusum"] - best[0]) < 1e-6


def test_cusum_detects_planted_level_shift(spark):
    import datetime as dt

    from sparkbigdatatextanalysis_spark.operators import timeseries  # noqa: F401

    # direct check of the S_t = cum - t*mean shape on a planted shift:
    # 20 days at 100 then 20 days at 200 -> argmax |S| at the boundary
    xs = [100] * 20 + [200] * 20
    mean = sum(xs) / len(xs)
    cum, devs = 0, []
    for t, x in enumerate(xs, start=1):
        cum += x
        devs.append(abs(cum - t * mean))
    assert devs.index(max(devs)) == 19  # day 20, the last pre-shift day


# --- token entropy ------------------------------------------------------------


def test_token_entropy_brute_force(spark):
    import __spark_entry__ as entry

    got = {
        r["doc_id"]: r
        for r in entry.q_docs_token_entropy(spark, SF).collect()
    }
    tok = entry._tok(spark, SF).collect()
    assert got
    for r in tok[:50]:
        toks = r["tokens"]
        if not toks:
            assert r["id"] not in got
            continue
        n = len(toks)
        cnt: dict[str, int] = {}
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
        ent = -sum((c / n) * math.log(c / n) for c in cnt.values())
        g = got[r["id"]]
        assert g["n_tokens"] == n and g["n_types"] == len(cnt)
        assert abs(g["entropy"] - ent) < 1e-4
        if len(cnt) > 1:
            assert abs(g["norm_entropy"] - ent / math.log(len(cnt))) < 1e-4
            assert g["norm_entropy"] <= 1.0 + 1e-9
        else:
            assert g["norm_entropy"] is None


# --- bounce rate --------------------------------------------------------------


def test_bounce_rate_brute_force(spark):
    import __spark_entry__ as entry
    from sparkbigdatatextanalysis_spark.streaming import sessionize as sz

    got = {
        r["day"]: r
        for r in entry.q_sessions_bounce_rate(spark, SF).collect()
    }
    sess = sz.sessionize_batch(entry._events(spark, SF)).collect()
    agg: dict[str, list] = {}
    for s in sess:
        day = s["session_start"].strftime("%Y-%m-%d")
        a = agg.setdefault(day, [0, 0, 0])
        a[0] += 1
        a[1] += 1 if s["n_events"] == 1 else 0
        a[2] += int(
            (s["session_end"] - s["session_start"]).total_seconds() * 1e6
        )
    assert set(got) == set(agg)
    for day, (ns, nb, dur) in agg.items():
        g = got[day]
        assert (g["n_sessions"], g["n_bounce"]) == (ns, nb)
        assert abs(g["bounce_rate"] - nb / ns) < 1e-9
        assert abs(g["mean_duration_s"] - dur / ns / 1e6) < 1e-3
