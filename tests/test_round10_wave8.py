"""Wave-8 operator semantics: QQ deciles vs numpy percentiles, medoid argmax vs brute force, forecast
backtest vs numpy.polyfit."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_qq_deciles_match_numpy(spark):
    import numpy as np

    import __spark_entry__ as entry

    rows = sorted(
        entry.q_orders_price_qq(spark, SF).collect(),
        key=lambda r: r["quantile"],
    )
    assert [round(r["quantile"], 1) for r in rows] == [
        round(0.1 * i, 1) for i in range(1, 10)
    ]
    o = entry._scan(spark, SF, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    split = [r["o_totalprice"] for r in o if str(r["o_orderdate"]) < "2000"]
    late = [r["o_totalprice"] for r in o if str(r["o_orderdate"]) >= "2000"]
    for i, r in enumerate(rows, start=1):
        qe = float(np.percentile(split, 10 * i))  # linear = (n-1)p, Spark's
        ql = float(np.percentile(late, 10 * i))
        assert abs(r["q_early"] - qe) < 1e-4
        assert abs(r["q_late"] - ql) < 1e-4
        assert abs(r["qq_ratio"] - round(r["q_late"] / r["q_early"], 6)) < 1e-9
    # deciles are nondecreasing within each period
    for a, b in zip(rows, rows[1:]):
        assert b["q_early"] >= a["q_early"] and b["q_late"] >= a["q_late"]


def test_medoid_is_argmax_and_in_cluster(spark):
    import __spark_entry__ as entry

    got = {
        r["keep_id"]: r
        for r in entry.q_dedup_medoid_reps(spark, SF).collect()
    }
    clusters: dict[int, list] = {}
    for r in entry._dedup_clusters(spark, SF).collect():
        clusters.setdefault(r["keep_id"], []).append(r["doc_id"])
    assert set(got) == set(clusters)
    from sparkbigdatatextanalysis_spark.operators import dedup as dd

    jp = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(
            entry._docs(spark, SF), min_jaccard=0.0
        ).collect()
    }

    def sim(a, b):
        return round(jp.get((min(a, b), max(a, b)), 0.0), 9)

    for keep, members in clusters.items():
        g = got[keep]
        assert g["cluster_size"] == len(members)
        assert g["medoid_id"] in members
        if len(members) == 1:
            assert g["medoid_id"] == members[0]
            assert g["medoid_avg_sim"] is None
            continue
        avgs = {
            m: sum(sim(m, o) for o in members if o != m) / (len(members) - 1)
            for m in members
        }
        best = min(
            (m for m in members),
            key=lambda m: (-avgs[m], m),
        )
        assert g["medoid_id"] == best
        assert abs(g["medoid_avg_sim"] - avgs[best]) < 1e-5


def test_forecast_backtest_matches_polyfit(spark):
    import numpy as np

    import __spark_entry__ as entry

    rows = entry.q_nation_revenue_forecast_backtest(spark, SF).collect()
    assert rows
    cells: dict[str, dict] = {}
    o = entry._scan(spark, SF, "orders")
    c = entry._scan(spark, SF, "customer")
    n = entry._scan(spark, SF, "nation")
    for r in (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .collect()
    ):
        cells.setdefault(r["n_name"], {})[r["yr"]] = r["rev"]
    for r in rows:
        hist = {
            y: v for y, v in cells[r["n_name"]].items() if y < 1998
        }
        assert r["n_points"] == len(hist) >= 2
        xs = np.array([y - 1995 for y in sorted(hist)], dtype=float)
        ys = np.array([hist[y] for y in sorted(hist)], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert abs(r["slope"] - slope) < max(1e-3, abs(slope) * 1e-5)
        assert (
            abs(r["forecast_1998"] - (r["slope"] * 3.0 + r["intercept"]))
            < 1e-3
        )
        want_ape = abs(r["forecast_1998"] - r["actual_1998"]) / r[
            "actual_1998"
        ]
        assert abs(r["ape"] - want_ape) < 1e-5
