"""Time-series densification (gap filling).

The reference has no time dimension at all (SURVEY.md §2.5 — "no
date/json functions anywhere"); this module adds the grid-densify
operator every event/metrics pipeline needs: turn an irregular event
stream into a regular per-key time grid with explicit zero rows for
empty buckets, so downstream windows/rolling stats see every bucket.

Scale shape: aggregate FIRST (events collapse to |key × active-bucket|
rows — the only pass over the raw 100 TB), derive each key's [min, max]
bucket span from that small aggregate, then explode a `sequence()` per
key (rows generated map-side, no shuffle) and left-join the aggregate
back on (key, bucket). Grid size is bounded by |keys| × span-buckets,
independent of raw event count. The final join is equi-key on a
composite high-cardinality key — balanced partitions, AQE-coalescible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    events: DataFrame,
    key: str,
    ts: str = "ts",
    bucket: str = "1 hour",
    aggs: dict[str, Column] | None = None,
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Densify ``events`` to one row per (``key``, time bucket) over each
    key's observed [first, last] bucket span.

    ``aggs`` maps output column name -> aggregate expression over the
    events in a bucket (default ``{"n_events": count(*)}``); ``fill``
    gives the value used for empty buckets (default 0 for every agg).
    ``bucket`` is ``"N unit"`` with unit in second/minute/hour/day/week;
    edges come from exact integer floor arithmetic on epoch seconds
    (UTC-aligned, so "1 day" == date_trunc('day') under the session's
    UTC pin), which keeps aggregation buckets and the sequence() grid
    stride consistent for multi-unit buckets like "15 minutes". NB:
    "week" buckets are epoch-aligned (start on Thursday), not ISO
    Monday like date_trunc('week').
    """
    from ..functions.intervals import parse_interval_seconds

    step = parse_interval_seconds(bucket)
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    fill = fill or {}
    b = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts)) / step).cast("long") * step
    ).alias("bucket")
    per_bucket = events.groupBy(F.col(key), b).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    bounds = per_bucket.groupBy(key).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    grid = bounds.select(
        key,
        F.explode(
            F.sequence(F.col("_b0"), F.col("_b1"), F.expr(f"interval {bucket}"))
        ).alias("bucket"),
    )
    out = grid.join(per_bucket, [key, "bucket"], "left")
    filled = [
        F.coalesce(F.col(name), F.lit(fill.get(name, 0))).alias(name)
        for name in aggs
    ]
    return out.select(key, "bucket", *filled)


def interval_union(
    intervals: DataFrame,
    key: str,
    start: str = "start_s",
    end: str = "end_s",
    order_id: str | None = None,
) -> DataFrame:
    """Per-key total covered length of a set of possibly-overlapping
    half-open integer intervals [start, end) -- the "islands"
    aggregation (merge overlapping sessions/leases/spans, then sum
    island lengths) that a plain SUM(end - start) double-counts.

    Classic two-window islands decomposition: order each key's
    intervals by (start, end); an interval STARTS a new island when its
    start exceeds the running max of all previous ends; the island id
    is the running count of such breaks; islands then aggregate to
    (min start, max end) and lengths sum per key. Exact integer
    arithmetic end-to-end, so cross-engine and partition-order
    deterministic.

    Scale shape: ONE hash shuffle on ``key`` feeds both windows and the
    final aggregation (all partitioned by key, Catalyst reuses the
    exchange); windows scan each key's run once -- no self-join, no
    island materialization wider than the input. Skew follows the key's
    own cardinality profile (salt upstream if one key owns the table).

    Returns (key, n_intervals, n_islands, covered) with ``covered`` in
    the interval's units. NULL starts/ends are dropped (an unbounded
    lease has no length); zero/negative-length intervals contribute 0
    but still join islands they fall inside.
    """
    order_cols = [F.col(start).asc(), F.col(end).asc()] + (
        [F.col(order_id).asc()] if order_id else []
    )
    w = Window.partitionBy(key).orderBy(*order_cols)
    prev_max_end = F.max(F.col(end)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    iv = (
        intervals.where(F.col(start).isNotNull() & F.col(end).isNotNull())
        .withColumn(
            "_iu_new",
            (prev_max_end.isNull() | (F.col(start) > prev_max_end)).cast(
                "long"
            ),
        )
        .withColumn(
            "_iu_island",
            F.sum("_iu_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    islands = iv.groupBy(key, "_iu_island").agg(
        F.count(F.lit(1)).alias("_iu_n"),
        F.min(start).alias("_iu_s"),
        F.max(end).alias("_iu_e"),
    )
    return islands.groupBy(key).agg(
        F.sum("_iu_n").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(
            F.greatest(F.col("_iu_e") - F.col("_iu_s"), F.lit(0))
        ).cast("long").alias("covered"),
    )


def markov_transitions(
    events: DataFrame,
    key: str = "user_id",
    state: str = "event_type",
    ts: str = "ts",
    order_id: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: for every (prev_state, next_state) pair of ADJACENT
    events in a key's (ts, order_id) order, the global transition count
    and row-normalized probability -- the behavioral-analytics /
    sequence-QA companion to the funnel (which fixes the step order)
    and the bigram LM (which does the same over tokens).

    Shape: one hash shuffle on ``key`` for the lag window (each key's
    run scanned once, map-side), then ONE partial-agg count on the
    (prev, next) pair -- low cardinality = |states|^2 -- and the row
    total attaches by a broadcast |states|-row join. The probability is
    one double division of two exact BIGINTs, rounded to 9 -- identical
    cross-engine.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(order_id).asc())
    pairs = (
        events.where(F.col(ts).isNotNull())
        .withColumn("_mk_prev", F.lag(state).over(w))
        .where(F.col("_mk_prev").isNotNull())
        .groupBy(
            F.col("_mk_prev").alias("prev_state"),
            F.col(state).alias("next_state"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    totals = pairs.groupBy("prev_state").agg(
        F.sum("n_transitions").alias("_mk_tot")
    )
    return (
        pairs.join(F.broadcast(totals), "prev_state")
        .select(
            "prev_state",
            "next_state",
            "n_transitions",
            F.round(F.col("n_transitions") / F.col("_mk_tot"), 9).alias(
                "p_transition"
            ),
        )
    )


def autocorrelation(
    series: DataFrame,
    day_col: str = "day",
    x_col: str = "x",
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation function of a regular daily series at
    lags 1..max_lag: r_k = sum_t (x_t - mean)(x_{t+k} - mean) /
    sum_t (x_t - mean)^2 with the GLOBAL mean (the standard ACF
    estimator) -- the seasonality detector behind "is there a weekly
    cycle" reads. ``series`` is one row per day (day_col DATE, x_col
    integer-valued, e.g. a daily count); missing days simply form no
    pair at the lags they'd anchor.

    Exactness: x is integer, so every moment is an exact integer sum --
    lag cross products run through DECIMAL(18,0)xDECIMAL(18,0) (100 TB
    daily counts cannot overflow), and the final r_k expands the
    centered numerator algebraically (Sxy_k - mean*(Sh_k + St_k) +
    m_k*mean^2) so only fixed-shape double arithmetic on exact sums
    remains: identical on every engine, no order-dependent float sum
    anywhere.

    Scale shape: the series table is O(|days|) rows REGARDLESS of the
    underlying event volume (a bounded time dimension), so the lag
    fan-out (explode x max_lag, in-row) and the self-equi-join on
    date_add(day, lag) stay trivially small; the join side is
    broadcast by that same boundedness.
    """
    d = F.col(day_col)
    xd = F.col(x_col).cast("decimal(18,0)")
    base = series.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(xd).alias("_sx"),
        F.sum(xd * xd).alias("_sxx"),
    )
    lagged = series.select(
        d.alias("_d1"),
        F.col(x_col).cast("long").alias("_x1"),
        F.explode(
            F.array(*[F.lit(k) for k in range(1, max_lag + 1)])
        ).alias("lag"),
    ).withColumn("_d2", F.expr("date_add(_d1, lag)"))
    right = series.select(d.alias("_d2"), F.col(x_col).cast("long").alias("_x2"))
    pairs = lagged.join(F.broadcast(right), "_d2")
    x1d = F.col("_x1").cast("decimal(18,0)")
    x2d = F.col("_x2").cast("decimal(18,0)")
    per = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("_x1").cast("decimal(18,0)").alias("_sh"),
        F.sum("_x2").cast("decimal(18,0)").alias("_st"),
        F.sum(x1d * x2d).alias("_sxy"),
    )
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    mean = sx / n
    m = F.col("n_pairs").cast("double")
    num = (
        F.col("_sxy").cast("double")
        - mean * (F.col("_sh").cast("double") + F.col("_st").cast("double"))
        + m * mean * mean
    )
    den = sxx - n * mean * mean
    return per.crossJoin(F.broadcast(base)).select(
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        F.round(F.when(den > 0, num / den), 9).alias("acf"),
    )


def mann_kendall(
    series: DataFrame,
    t_col: str = "t",
    x_col: str = "x",
) -> DataFrame:
    """Mann-Kendall trend test over a bounded regular series (Mann
    1945, Kendall 1975): S = sum over ordered period pairs of
    sgn(x_j - x_i), the tie-corrected normal approximation z, and
    Kendall's tau-b -- the standard nonparametric "is there a
    monotone trend" significance test that pairs with the Theil-Sen
    slope estimate (the slope says HOW MUCH, MK says WHETHER): both
    are rank-based, so one promotional spike cannot manufacture or
    hide a trend the way it drags OLS.

    Contract: one row per period (``t_col`` has no duplicates) and a
    BOUNDED period domain (months/days -- the Theil-Sen/ACF argument),
    so the pair fan-out is |periods|^2/2 tiny rows on a broadcast
    self-join. ``x_col`` must be exact or identically-rounded on any
    mirroring engine (integer counts, or DECIMAL-rounded sums): the
    sign comparisons and S are then exact integers.

    Exactness: S and every tie count are BIGINTs; Var(S) =
    (n(n-1)(2n+5) - sum_g t_g(t_g-1)(2t_g+5)) / 18 evaluates in exact
    integer arithmetic before ONE double division; z applies the
    +/-1 continuity correction picked by the exact sign of S; tau-b
    divides S by sqrt((D - T1) * D) with D = n(n-1)/2 and T1 the
    x-tie pair count (the time axis has no ties by contract, so its
    correction term is zero). Every double is a fixed-shape
    expression over exact integers -- engine-identical.
    """
    t = F.col(t_col)
    x = F.col(x_col)
    a = series.select(t.alias("_ta"), x.alias("_xa"))
    b = series.select(t.alias("_tb"), x.alias("_xb"))
    sgn = (
        F.when(F.col("_xb") > F.col("_xa"), F.lit(1))
        .when(F.col("_xb") < F.col("_xa"), F.lit(-1))
        .otherwise(F.lit(0))
        .cast("long")
    )
    s = (
        a.join(F.broadcast(b), F.col("_ta") < F.col("_tb"))
        .agg(F.sum(sgn).cast("long").alias("_s"))
    )
    ties = (
        series.groupBy(x.alias("_xv"))
        .agg(F.count(F.lit(1)).cast("long").alias("_tg"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n_distinct"),
            F.sum(
                F.col("_tg") * (F.col("_tg") - 1) * (2 * F.col("_tg") + 5)
            ).cast("long").alias("_tie_var"),
            F.sum(F.col("_tg") * (F.col("_tg") - 1)).cast("long").alias(
                "_tie_pairs"
            ),
            F.sum("_tg").cast("long").alias("_n"),
        )
    )
    j = s.crossJoin(F.broadcast(ties))
    n = F.col("_n")
    var_s = (
        (n * (n - 1) * (2 * n + 5) - F.col("_tie_var")).cast("double") / 18.0
    )
    sd = F.col("_s").cast("double")
    z = (
        F.when(F.col("_s") > 0, (sd - 1.0) / F.sqrt(var_s))
        .when(F.col("_s") < 0, (sd + 1.0) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    d_pairs = (n * (n - 1)).cast("double") / 2.0
    t1 = F.col("_tie_pairs").cast("double") / 2.0
    tau_den = F.sqrt((d_pairs - t1) * d_pairs)
    return j.select(
        n.alias("n_periods"),
        F.col("_s").alias("s_stat"),
        F.round(var_s, 6).alias("var_s"),
        F.round(F.when(var_s > 0, z), 9).alias("z_score"),
        F.round(F.when(tau_den > 0, sd / tau_den), 9).alias("tau_b"),
    )


def pettitt(
    series: DataFrame,
    t_col: str = "t",
    x_col: str = "x",
) -> DataFrame:
    """Pettitt changepoint test over a bounded regular series (Pettitt
    1979): the rank-based single-changepoint detector -- K =
    max_t |U_t| with U_t = sum_{i<=t} sum_{j>t} sgn(x_j - x_i), the
    nonparametric complement to the CUSUM mean-shift scan (X200):
    CUSUM reacts to mean shifts in value units, Pettitt to ANY
    location shift in rank units, immune to outlier magnitude.

    Shape: U_t never materializes the i<=t<j double sum. With
    A_t = sum_{j != t} sgn(x_j - x_t), the telescoping identity
    U_t = U_{t-1} + A_t holds (each j>t pair enters, each i<t pair
    flips sign and leaves), so one bounded broadcast self-join builds
    A_t and ONE cumulative window over the |periods|-row table builds
    every U_t -- the unpartitioned window is safe by the same bounded
    time-domain argument as ACF/Theil-Sen (|periods| rows regardless
    of event volume; the raw table never enters a window).

    Exactness: sgn comparisons on exact/identically-rounded x, A_t and
    U_t exact BIGINTs; the changepoint is the EARLIEST argmax of
    |U_t| (deterministic under ties); the approximate significance
    p = min(1, 2 exp(-6K^2 / (n^3 + n^2))) is one fixed-shape double.
    The final period (U_n = 0 by construction) is excluded from the
    argmax, matching the 1 <= t < n definition.
    """
    t = F.col(t_col)
    x = F.col(x_col)
    a = series.select(t.alias("_t"), x.alias("_xa"))
    b = series.select(t.alias("_tb"), x.alias("_xb"))
    sgn = (
        F.when(F.col("_xb") > F.col("_xa"), F.lit(1))
        .when(F.col("_xb") < F.col("_xa"), F.lit(-1))
        .otherwise(F.lit(0))
        .cast("long")
    )
    at = (
        a.join(F.broadcast(b), F.col("_t") != F.col("_tb"))
        .groupBy("_t")
        .agg(F.sum(sgn).cast("long").alias("_a"))
    )
    w = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.orderBy("_t")
    u = at.select(
        "_t",
        F.sum("_a").over(w).cast("long").alias("_u"),
        F.row_number().over(wn).alias("_rn"),
        F.count(F.lit(1)).over(
            Window.orderBy("_t").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    ).where(F.col("_rn") < F.col("_n"))
    best = u.select(
        F.col("_n").cast("long").alias("n_periods"),
        F.struct(
            F.abs("_u").alias("k"), (-F.col("_rn")).alias("nrn"),
            F.col("_t").alias("t"), F.col("_u").alias("u"),
        ).alias("_cand"),
    ).groupBy("n_periods").agg(F.max("_cand").alias("_b"))
    n = F.col("n_periods").cast("double")
    k = F.col("_b.k").cast("double")
    return best.select(
        "n_periods",
        F.col("_b.t").alias("changepoint_t"),
        F.col("_b.k").cast("long").alias("k_stat"),
        F.col("_b.u").cast("long").alias("u_at_changepoint"),
        F.round(
            F.least(
                F.lit(1.0), 2.0 * F.exp(-6.0 * k * k / (n * n * n + n * n))
            ),
            9,
        ).alias("p_approx"),
    )
