"""Unit tests for table profiling, funnel analysis, and bigram mining
(operators/profile.py, operators/funnel.py, pipeline.bigram_top_k) on
adversarial small inputs — the oracle-parity sweep covers them
end-to-end on the real tables.
"""

from __future__ import annotations

import datetime

import pytest

from sparkbigdatatextanalysis_spark.operators import funnel as fn
from sparkbigdatatextanalysis_spark.operators import pipeline as pl
from sparkbigdatatextanalysis_spark.operators import profile as pf


def test_profile_counts_nulls_distinct(spark):
    rows = [
        (1, "a", 2.0, datetime.datetime(2024, 1, 1, 12, 0, 5)),
        (2, None, 2.0, datetime.datetime(2024, 1, 2, 0, 0, 0)),
        (3, "b", None, None),
        (3, "a", -1.5, datetime.datetime(2024, 1, 1, 12, 0, 5)),
    ]
    df = spark.createDataFrame(rows, "k LONG, s STRING, x DOUBLE, t TIMESTAMP")
    got = {
        r["col_name"]: r
        for r in pf.profile_table(
            df, num_cols=["k", "x"], str_cols=["s"], ts_cols=["t"]
        ).collect()
    }
    assert set(got) == {"k", "x", "s", "t"}
    k = got["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 0, 3)
    assert (k["min_num"], k["max_num"]) == (1.0, 3.0)
    assert k["min_str"] is None and k["max_str"] is None
    x = got["x"]
    assert (x["n_nulls"], x["n_distinct"], x["min_num"], x["max_num"]) == (
        1,
        2,
        -1.5,
        2.0,
    )
    s = got["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    assert s["min_num"] is None
    t = got["t"]
    assert (t["min_str"], t["max_str"]) == (
        "2024-01-01 12:00:05",
        "2024-01-02 00:00:00",
    )


def test_profile_requires_columns(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        pf.profile_table(df)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id LONG, event_type STRING, ts TIMESTAMP"
    )


def test_funnel_strict_ordering(spark):
    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)
    rows = [
        # u1: full funnel in order
        (1, "view", t(0)), (1, "click", t(1)), (1, "purchase", t(2)),
        # u2: click BEFORE first view -> stops at view
        (2, "click", t(0)), (2, "view", t(1)),
        # u3: view+click, purchase at the SAME instant as click -> strict
        #     'later' excludes it
        (3, "view", t(0)), (3, "click", t(1)), (3, "purchase", t(1)),
        # u4: never viewed
        (4, "purchase", t(0)),
    ]
    got = {
        r["step"]: (r["step_idx"], r["n_users"])
        for r in fn.funnel_steps(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {"view": (0, 3), "click": (1, 2), "purchase": (2, 1)}


def test_funnel_first_touch_uses_earliest_reach(spark):
    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)
    # u1 clicks before AND after the first view; the funnel must attribute
    # the click at t2 (after first view t1), not the one at t0.
    rows = [
        (1, "click", t(0)), (1, "view", t(1)), (1, "click", t(2)),
        (1, "purchase", t(3)),
    ]
    got = {
        r["step"]: r["n_users"]
        for r in fn.funnel_steps(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {"view": 1, "click": 1, "purchase": 1}


def test_funnel_empty_steps_raise(spark):
    with pytest.raises(ValueError):
        fn.funnel_steps(_ev(spark, []), [])


def test_funnel_zero_rows_still_emits_steps(spark):
    got = fn.funnel_steps(_ev(spark, []), ["view", "click"]).collect()
    assert {(r["step"], r["n_users"]) for r in got} == {
        ("view", 0),
        ("click", 0),
    }


def test_bigram_top_k_counts_and_short_docs(spark):
    rows = [
        (0, ["a", "b", "a", "b"]),   # "a b" x2, "b a" x1
        (1, ["a", "b"]),             # "a b" x1
        (2, ["z"]),                  # too short: no bigrams
        (3, []),                     # empty: no bigrams
    ]
    tok = spark.createDataFrame(rows, "id INT, tokens ARRAY<STRING>")
    got = [tuple(r) for r in pl.bigram_top_k(tok, k=3).collect()]
    assert got == [("a b", 3, 1), ("b a", 1, 2)]


def test_profile_drift_detects_changes(spark):
    """Drift between two snapshots: a null spike alerts, a stable column
    does not, added/removed columns always alert, range widening is
    reported."""
    from sparkbigdatatextanalysis_spark.operators.profile import (
        profile_drift,
        profile_table,
    )

    old = spark.createDataFrame(
        [(i, float(i % 10), "x") for i in range(100)],
        "id LONG, v DOUBLE, s STRING",
    )
    rows = [
        (i, None if i % 4 == 0 else float(i % 10) * 2, "x")  # nulls + wider range
        for i in range(100)
    ]
    new = spark.createDataFrame(rows, "id LONG, v DOUBLE, s STRING")
    po = profile_table(old, num_cols=["id", "v"], str_cols=["s"])
    pn = profile_table(new, num_cols=["id", "v"], str_cols=["s"])
    drift = {r["col_name"]: r for r in profile_drift(po, pn).collect()}

    assert drift["v"]["alert"] is True
    assert drift["v"]["null_ratio_delta"] == 0.25
    assert drift["v"]["range_moved"] is True
    assert drift["id"]["alert"] is False
    assert drift["id"]["null_ratio_delta"] == 0.0
    assert drift["s"]["alert"] is False


def test_profile_drift_added_removed_columns(spark):
    from sparkbigdatatextanalysis_spark.operators.profile import (
        profile_drift,
        profile_table,
    )

    old = spark.createDataFrame([(1, "a")], "id LONG, gone STRING")
    new = spark.createDataFrame([(1, 2.0)], "id LONG, fresh DOUBLE")
    po = profile_table(old, num_cols=["id"], str_cols=["gone"])
    pn = profile_table(new, num_cols=["id", "fresh"])
    drift = {r["col_name"]: (r["status"], r["alert"])
             for r in profile_drift(po, pn).collect()}
    assert drift["gone"] == ("removed", True)
    assert drift["fresh"] == ("added", True)
    assert drift["id"] == ("both", False)


def test_profile_drift_range_only_and_empty_snapshot(spark):
    """Range widening alone must alert (regression: range_moved was
    reported but excluded from the gate); an empty new snapshot must
    alert rather than crash (ANSI division) or read as no-drift; a
    0 -> N distinct explosion must alert."""
    from sparkbigdatatextanalysis_spark.operators.profile import (
        profile_drift,
        profile_table,
    )

    old = spark.createDataFrame(
        [(float(i % 5), None) for i in range(50)], "v DOUBLE, z DOUBLE"
    )
    new = spark.createDataFrame(
        [(float(i % 5) if i else 99.0, float(i % 7)) for i in range(50)],
        "v DOUBLE, z DOUBLE",
    )
    po = profile_table(old, num_cols=["v", "z"])
    pn = profile_table(new, num_cols=["v", "z"])
    drift = {r["col_name"]: r for r in profile_drift(po, pn).collect()}
    # v: same null ratio, distinct 5 -> 6 (under 50%), max 4 -> 99
    assert drift["v"]["range_moved"] is True
    assert drift["v"]["alert"] is True
    # z: all-null -> populated = 0 -> 7 distinct explosion
    assert drift["z"]["alert"] is True

    empty = spark.createDataFrame([], "v DOUBLE, z DOUBLE")
    pe = profile_table(empty, num_cols=["v", "z"])
    d2 = {r["col_name"]: r for r in profile_drift(po, pe).collect()}
    assert d2["v"]["alert"] is True  # populated -> empty snapshot
    assert d2["v"]["null_ratio_new"] is None


def test_reconcile_tables_matches_and_flags(spark):
    from sparkbigdatatextanalysis_spark.operators import profile as pf

    a = spark.createDataFrame(
        [("d1", 1, "x"), ("d1", 2, "y"), ("d2", 3, "z"), ("d3", 4, None)],
        "day STRING, id LONG, v STRING",
    )
    # d1 identical but reordered; d2 value drift (same count); d3 missing
    b = spark.createDataFrame(
        [("d1", 2, "y"), ("d1", 1, "x"), ("d2", 3, "ZZ")],
        "day STRING, id LONG, v STRING",
    )
    out = {
        r["day"]: (r["n_a"], r["n_b"], r["rows_match"], r["checksum_match"])
        for r in pf.reconcile_tables(a, b, "day", ["id", "v"]).collect()
    }
    assert out == {
        "d1": (2, 2, 1, 1),   # order-insensitive: reordered bucket matches
        "d2": (1, 1, 1, 0),   # same count, drifted content
        "d3": (1, 0, 0, 0),   # bucket missing on one side
    }


def test_reconcile_tables_null_vs_empty_distinct(spark):
    from sparkbigdatatextanalysis_spark.operators import profile as pf

    a = spark.createDataFrame([("d", 1, None)], "day STRING, id LONG, v STRING")
    b = spark.createDataFrame([("d", 1, "")], "day STRING, id LONG, v STRING")
    row = pf.reconcile_tables(a, b, "day", ["id", "v"]).collect()[0]
    assert (row["rows_match"], row["checksum_match"]) == (1, 0)
