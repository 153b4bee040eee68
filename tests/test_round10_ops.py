"""Round-10 operator semantics on hand-built fixtures: grouped
moments (vs numpy), blocking quality, partitioned band join, and the
EWMA / PMI / streak / PSI query shapes' brute-force twins."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.operators import evaluation as eva
from sparkbigdatatextanalysis_spark.operators import relational as rel
from sparkbigdatatextanalysis_spark.operators import stats as st


# --- grouped_moments ---------------------------------------------------------


def test_grouped_moments_matches_numpy(spark):
    import random

    import numpy as np

    rng = random.Random(31)
    rows = []
    for g in ("a", "b"):
        for _ in range(400):
            v = round(rng.gauss(10.0, 3.0) + (5.0 if g == "b" else 0.0), 3)
            rows.append((g, v))
    # group 'c': heavy right tail -> positive skew
    for _ in range(200):
        rows.append(("c", round(rng.expovariate(0.5), 3)))
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    got = {
        r["g"]: r for r in st.grouped_moments(df, "v", ["g"]).collect()
    }
    for g in ("a", "b", "c"):
        vals = np.array([v for gg, v in rows if gg == g])
        m = vals.mean()
        m2 = ((vals - m) ** 2).mean()
        m3 = ((vals - m) ** 3).mean()
        m4 = ((vals - m) ** 4).mean()
        assert got[g]["n_points"] == len(vals)
        assert abs(got[g]["mean"] - m) < 1e-6
        assert abs(got[g]["stddev_pop"] - math.sqrt(m2)) < 1e-6
        assert abs(got[g]["skewness"] - m3 / m2**1.5) < 1e-5
        assert abs(got[g]["kurtosis_excess"] - (m4 / m2**2 - 3)) < 1e-5
    assert got["c"]["skewness"] > 0.5  # exponential tail: clearly right-skewed


def test_grouped_moments_degenerate_groups(spark):
    df = spark.createDataFrame(
        [("one", 5.0), ("const", 2.0), ("const", 2.0), ("null", None)],
        "g STRING, v DOUBLE",
    )
    got = {r["g"]: r for r in st.grouped_moments(df, "v", ["g"]).collect()}
    assert got["one"]["n_points"] == 1 and got["one"]["skewness"] is None
    assert got["const"]["skewness"] is None  # zero variance
    assert "null" not in got  # NULL values drop


# --- blocking_quality --------------------------------------------------------


def test_blocking_quality_counts(spark):
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4)], "a_id LONG, b_id LONG"
    )
    truth = spark.createDataFrame(
        [(1, 2), (2, 4), (3, 4)], "a_id LONG, b_id LONG"
    )
    got = eva.blocking_quality(cand, truth, n_items=5).collect()[0]
    assert (got["n_candidates"], got["n_truth"], got["n_caught"]) == (3, 3, 2)
    assert abs(got["pairs_completeness"] - 2 / 3) < 1e-9
    assert abs(got["reduction_ratio"] - (1 - 3 / 10)) < 1e-9
    with pytest.raises(ValueError, match="n_items"):
        eva.blocking_quality(cand, truth, n_items=1)


def test_blocking_quality_empty_truth(spark):
    cand = spark.createDataFrame([(1, 2)], "a_id LONG, b_id LONG")
    truth = cand.where(F.lit(False))
    got = eva.blocking_quality(cand, truth, n_items=3).collect()[0]
    assert got["n_truth"] == 0 and got["pairs_completeness"] is None


def test_blocking_quality_sampled_truth_converges(spark):
    """r10 verdict stretch 8: the salted-hash truth sample must be
    deterministic, leave reduction_ratio untouched, and estimate
    pairs_completeness within sampling error of the exact value."""
    import random

    rng = random.Random(3)
    truth_pairs = sorted(
        {tuple(sorted(rng.sample(range(400), 2))) for _ in range(3000)}
    )
    # the blocker catches ~70% of true pairs (deterministic rule)
    cand_pairs = [p for p in truth_pairs if (p[0] * 31 + p[1]) % 10 < 7]
    exact_pc = len(cand_pairs) / len(truth_pairs)
    truth = spark.createDataFrame(truth_pairs, "a_id LONG, b_id LONG")
    cand = spark.createDataFrame(cand_pairs, "a_id LONG, b_id LONG")
    exact = eva.blocking_quality(cand, truth, n_items=400).collect()[0]
    assert abs(exact["pairs_completeness"] - exact_pc) < 1e-9
    for rate in (0.5, 0.25):
        got = eva.blocking_quality(
            cand, truth, n_items=400, truth_sample_rate=rate
        ).collect()[0]
        # deterministic: a second call sees the identical sample
        again = eva.blocking_quality(
            cand, truth, n_items=400, truth_sample_rate=rate
        ).collect()[0]
        assert (got["n_truth"], got["n_caught"]) == (
            again["n_truth"],
            again["n_caught"],
        )
        # unbiased estimate: within ~4 sigma of binomial sampling error
        n_s = got["n_truth"]
        assert 0 < n_s < len(truth_pairs)
        sigma = (exact_pc * (1 - exact_pc) / n_s) ** 0.5
        assert abs(got["pairs_completeness"] - exact_pc) < 4 * sigma + 1e-9
        # candidate side never sampled
        assert got["n_candidates"] == exact["n_candidates"]
        assert got["reduction_ratio"] == exact["reduction_ratio"]
    with pytest.raises(ValueError, match="truth_sample_rate"):
        eva.blocking_quality(cand, truth, n_items=400, truth_sample_rate=0.0)


# --- band_join with partition_cols -------------------------------------------


def test_band_join_partitioned_matches_bruteforce(spark):
    import itertools
    import random

    rng = random.Random(41)
    rows = [
        (i, rng.choice(["k1", "k2", "k3"]), round(rng.uniform(0, 1), 3))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id LONG, k STRING, v DOUBLE")
    eps = 0.01
    got = {
        (r["k"], r["a_id"], r["b_id"])
        for r in rel.band_join(
            df, "v", eps=eps, id_col="id", partition_cols=("k",)
        ).collect()
    }
    want = set()
    for (i, ki, vi), (j, kj, vj) in itertools.combinations(rows, 2):
        if ki == kj and abs(vi - vj) <= eps:
            a, b = ((i, vi), (j, vj)) if (vi, i) < (vj, j) else ((j, vj), (i, vi))
            want.add((ki, a[0], b[0]))
    assert got == want
    # cross-key near-ties exist in the fixture but never pair
    assert any(
        ki != kj and abs(vi - vj) <= eps
        for (i, ki, vi), (j, kj, vj) in itertools.combinations(rows, 2)
    )


# --- EWMA exactness ----------------------------------------------------------


def test_ewma_weights_exact_and_truncated(spark):
    import __spark_entry__ as em

    # one user, 3 events: weights renormalize over the present lags
    rows = [
        (1, "2024-01-01 00:00:00", 7, "purchase", 10.0, None),
        (2, "2024-01-01 00:01:00", 7, "purchase", 20.0, None),
        (3, "2024-01-01 00:02:00", 7, "purchase", 40.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
        "user_id"
    ).orderBy("ts", "event_id")
    lags = [F.lag("value", j).over(w) for j in range(8)]
    num = None
    den = None
    for j, lg in enumerate(lags):
        wt = 2.0 ** -(j + 1)
        term = F.coalesce(lg * F.lit(wt), F.lit(0.0))
        have = F.when(lg.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = have if den is None else den + have
    got = {
        r["event_id"]: r["e"]
        for r in df.select(
            "event_id", F.round(num / den, 9).alias("e")
        ).collect()
    }
    assert got[1] == 10.0  # single event: full weight on itself
    # two events: (20*.5 + 10*.25) / .75
    assert abs(got[2] - (20 * 0.5 + 10 * 0.25) / 0.75) < 2e-9
    assert abs(got[3] - (40 * 0.5 + 20 * 0.25 + 10 * 0.125) / 0.875) < 2e-9


# --- top_principal_component -------------------------------------------------


def test_power_iteration_matches_numpy_eigvec(spark):
    """3 rounds from the uniform start must land close to numpy's
    leading eigenvector of X^T X on a fixture with a dominant
    direction (alignment |cos| > 0.99; the per-stage 9-dp rounding and
    finite iterations keep it from being exact)."""
    import random

    import numpy as np

    from sparkbigdatatextanalysis_spark.operators import ann as ann_ops

    rng = random.Random(53)
    dim, n = 12, 300
    main = np.array([rng.gauss(0, 1) for _ in range(dim)])
    main /= np.linalg.norm(main)
    rows = []
    X = []
    for i in range(n):
        x = 5.0 * rng.gauss(0, 1) * main + np.array(
            [rng.gauss(0, 0.5) for _ in range(dim)]
        )
        x = np.round(x, 6)
        X.append(x)
        rows.append((i, [float(v) for v in x]))
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    got = {
        r["pos"]: r["component"]
        for r in ann_ops.top_principal_component(emb, n_iter=3).collect()
    }
    v = np.array([got[j] for j in range(dim)])
    X = np.array(X)
    evals, evecs = np.linalg.eigh(X.T @ X)
    lead = evecs[:, -1]
    assert abs(float(np.dot(v, lead))) > 0.99
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-6


def test_power_iteration_guards(spark):
    import pytest

    from sparkbigdatatextanalysis_spark.operators import ann as ann_ops

    emb = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id LONG, embedding ARRAY<DOUBLE>")
    with pytest.raises(ValueError, match="n_iter"):
        ann_ops.top_principal_component(emb, n_iter=0)
    empty = emb.where("vec_id < 0")
    with pytest.raises(ValueError, match="empty"):
        ann_ops.top_principal_component(empty)


# --- query-shape brute-force twins --------------------------------------------


def test_weekly_streaks_matches_python(spark):
    import random
    from datetime import datetime, timedelta

    rng = random.Random(61)
    rows = []
    eid = 0
    for u in range(25):
        base = datetime(2024, 1, 1)
        for _ in range(rng.randrange(1, 30)):
            d = base + timedelta(days=rng.randrange(0, 120))
            rows.append((eid, d, u, "view", None, None))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    from pyspark.sql import Window

    uw = (
        df.where(F.col("ts").isNotNull())
        .select(
            "user_id",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.lit("1970-01-05").cast("date"),
                )
                / 7
            )
            .cast("long")
            .alias("widx"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("widx")
    isl = uw.withColumn("_isl", F.col("widx") - F.row_number().over(w))
    got = {
        r["user_id"]: (r["n"], r["m"])
        for r in isl.groupBy("user_id", "_isl")
        .count()
        .groupBy("user_id")
        .agg(F.sum("count").alias("n"), F.max("count").alias("m"))
        .collect()
    }
    # python twin: weeks are Mondays; index by iso-days-from-epoch//7
    from collections import defaultdict

    weeks = defaultdict(set)
    for _, d, u, *_ in rows:
        monday = d - timedelta(days=d.weekday())
        weeks[u].add((monday.date() - datetime(1970, 1, 5).date()).days // 7)
    for u, ws in weeks.items():
        ws = sorted(ws)
        longest = cur = 1
        for a, b in zip(ws, ws[1:]):
            cur = cur + 1 if b == a + 1 else 1
            longest = max(longest, cur)
        assert got[u] == (len(ws), longest), u


def test_audience_overlap_matches_itertools(spark):
    import itertools
    import random

    rng = random.Random(67)
    rows = []
    for eid in range(400):
        rows.append(
            (eid, None, rng.randrange(40), rng.choice("abcd"), None, None)
        )
    sets: dict = {}
    for _, _, u, t, *_ in rows:
        sets.setdefault(t, set()).add(u)
    df = spark.createDataFrame(
        [(t, u) for _, _, u, t, *_ in rows], "event_type STRING, user_id LONG"
    )
    tu = df.distinct()
    sizes = tu.groupBy("event_type").count()
    a = tu.select(F.col("event_type").alias("ta"), "user_id")
    b = tu.select(F.col("event_type").alias("tb"), "user_id")
    got = {
        (r["ta"], r["tb"]): r["n"]
        for r in a.join(b, "user_id")
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for x, y in itertools.combinations(sorted(sets), 2):
        inter = len(sets[x] & sets[y])
        if inter:
            assert got[(x, y)] == inter, (x, y)
        else:
            assert (x, y) not in got


def test_psi_terms_match_python(spark):
    """The PSI expression shape over a hand-built two-period fixture:
    Laplace-smoothed per-bin terms equal the plain python formula, and a
    shifted late period yields a clearly positive total PSI."""
    import math
    import random

    rng = random.Random(71)
    early = [round(rng.uniform(0, 100), 2) for _ in range(500)]
    late = [round(rng.uniform(20, 140), 2) for _ in range(400)]

    import numpy as np

    cuts = [
        round(float(np.percentile(early, q, method="linear")), 6)
        for q in range(10, 100, 10)
    ]

    def bin_of(v):
        return sum(1 for c in cuts if v > c)

    na, nb = len(early), len(late)
    ca: dict = {}
    cb: dict = {}
    for v in early:
        ca[bin_of(v)] = ca.get(bin_of(v), 0) + 1
    for v in late:
        cb[bin_of(v)] = cb.get(bin_of(v), 0) + 1
    want = {}
    for b in set(ca) | set(cb):
        pa = (ca.get(b, 0) + 1) / (na + 10)
        pb = (cb.get(b, 0) + 1) / (nb + 10)
        want[b] = round((pb - pa) * math.log(pb / pa), 6)

    edf = spark.createDataFrame([(v,) for v in early], "o_totalprice DOUBLE")
    ldf = spark.createDataFrame([(v,) for v in late], "o_totalprice DOUBLE")
    cuts_df = edf.agg(
        F.expr(
            "transform(percentile(o_totalprice, array(0.1,0.2,0.3,0.4,0.5,"
            "0.6,0.7,0.8,0.9)), c -> round(c, 6))"
        ).alias("_cuts")
    )
    bin_expr = F.aggregate(
        F.col("_cuts"),
        F.lit(0),
        lambda acc, c: acc + F.when(F.col("o_totalprice") > c, 1).otherwise(0),
    )

    def bins(df, name):
        return (
            df.crossJoin(F.broadcast(cuts_df))
            .select(bin_expr.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    aa = bins(edf, "n_early")
    bb = bins(ldf, "n_late")
    pa = (F.coalesce("n_early", F.lit(0)) + 1) / F.lit(na + 10)
    pb = (F.coalesce("n_late", F.lit(0)) + 1) / F.lit(nb + 10)
    got = {
        r["bin"]: r["t"]
        for r in aa.join(bb, "bin", "full")
        .select("bin", F.round((pb - pa) * F.log(pb / pa), 6).alias("t"))
        .collect()
    }
    assert got == want
    assert sum(want.values()) > 0.05  # the shifted period drifts


# --- bench entry-list integrity -----------------------------------------------


def test_bench_entries_all_resolve():
    """bench.py's _run silently skips names missing from queries() --
    a typo'd HEADLINE/WITNESS entry would vanish from the artifact
    without a trace. Pin that every bench name resolves to a gated key
    or a declared bench-only EXTRA."""
    import bench
    import __spark_entry__ as em

    known = set(em.queries()) | set(bench.EXTRA)
    missing = [n for n in list(bench.HEADLINE) + list(bench.WITNESS) if n not in known]
    assert missing == [], missing
