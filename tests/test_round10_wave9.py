"""Wave-9 operator semantics: feature-hash invariants vs a Python
twin, WoW retention vs a brute-force grid walk, Lorenz decile
invariants, session-pair lift brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_feature_hash_matches_python_twin(spark):
    import hashlib

    import __spark_entry__ as entry
    from sparkbigdatatextanalysis_spark.functions.hashing import MERSENNE31

    got = {
        (r["doc_id"], r["bucket"]): r["fh_value"]
        for r in entry.q_docs_feature_hash(spark, SF).collect()
    }
    tok = entry._tok(spark, SF).collect()

    def h31(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % MERSENNE31

    want: dict[tuple, int] = {}
    for r in tok:
        for t in r["tokens"]:
            h = h31(t)
            sign = 1 if ((h >> 6) & 1) == 0 else -1
            k = (r["id"], h % 64)
            want[k] = want.get(k, 0) + sign
    assert got == want
    # fixed-width guarantee: bucket ids never leave [0, 64)
    assert all(0 <= b < 64 for _, b in got)


def test_wow_retention_brute_force(spark):
    import datetime as dt

    import __spark_entry__ as entry

    got = {
        r["week_idx"]: r
        for r in entry.q_users_wow_retention(spark, SF).collect()
    }
    ev = (
        entry._events(spark, SF)
        .where(F.col("ts").isNotNull())
        .select("user_id", "ts")
        .collect()
    )
    monday0 = dt.date(1970, 1, 5)
    grid = set()
    for r in ev:
        d = r["ts"].date()
        monday = d - dt.timedelta(days=d.weekday())
        grid.add((r["user_id"], (monday - monday0).days // 7))
    weeks = sorted({w for _, w in grid})
    active = {w: {u for u, ww in grid if ww == w} for w in weeks}
    first = {}
    for u, w in sorted(grid, key=lambda p: p[1]):
        first.setdefault(u, w)
    assert set(got) == set(weeks)
    prev_n = None
    for w in weeks:
        g = got[w]
        retained = (
            len(active[w] & active.get(w - 1, set()))
        )
        assert g["n_active"] == len(active[w])
        assert g["n_new"] == sum(1 for u in active[w] if first[u] == w)
        assert g["n_retained"] == retained
        if prev_n is None:
            assert g["wow_retention"] is None
        else:
            assert abs(g["wow_retention"] - retained / prev_n) < 1e-9
        prev_n = len(active[w])


def test_lorenz_deciles_invariants(spark):
    import __spark_entry__ as entry

    rows = sorted(
        entry.q_customers_lorenz_deciles(spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(10))
    n_cust = entry._scan(spark, SF, "orders").select(
        "o_custkey"
    ).distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    # equal-count cut: deciles differ by at most 1 customer
    sizes = [r["n_customers"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # ranked ascending: shares nondecreasing, cum_share hits 1
    for a, b in zip(rows, rows[1:]):
        assert b["revenue_share"] >= a["revenue_share"] - 1e-9
        assert b["cum_share"] >= a["cum_share"]
    assert abs(rows[-1]["cum_share"] - 1.0) < 1e-6
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-6


def test_session_type_pairs_brute_force(spark):
    import __spark_entry__ as entry
    from sparkbigdatatextanalysis_spark.streaming import sessionize as sz

    got = {
        (r["type_a"], r["type_b"]): r
        for r in entry.q_session_type_pairs(spark, SF).collect()
    }
    # independent session assignment: reuse the TESTED batch sessionizer
    # per-event via its windows is internal, so walk events in Python
    ev = sorted(
        entry._events(spark, SF)
        .where(F.col("ts").isNotNull())
        .select("user_id", "event_id", "event_type", "ts")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    sessions: dict[tuple, set] = {}
    last: dict = {}
    idx: dict = {}
    for r in ev:
        u = r["user_id"]
        t = int(r["ts"].timestamp() * 1e6)
        if u not in last or t - last[u] > 1800 * 1000 * 1000:
            idx[u] = idx.get(u, 0) + 1
        last[u] = t
        sessions.setdefault((u, idx[u]), set()).add(r["event_type"])
    ns = len(sessions)
    from collections import Counter

    type_n = Counter()
    pair_n = Counter()
    for types in sessions.values():
        ts_sorted = sorted(types)
        type_n.update(ts_sorted)
        for i, a in enumerate(ts_sorted):
            for b in ts_sorted[i + 1 :]:
                pair_n[(a, b)] += 1
    want = {p: c for p, c in pair_n.items() if c >= 2}
    assert set(got) == set(want)
    for p, c in want.items():
        g = got[p]
        assert g["n_together"] == c
        assert abs(g["support"] - round(c / ns, 9)) < 1e-12
        lift = (c * ns) / (type_n[p[0]] * type_n[p[1]])
        assert abs(g["lift"] - lift) < 1e-5
