"""Temporal / relational operators beyond plain equi-joins.

The reference's join surface is cross, inner-equi and left-outer
(SURVEY.md §2.5); this module adds the temporal joins a training-data /
event pipeline needs -- as-of (point-in-time) and interval (range)
joins -- written in the shapes that survive 100 TB:

* as-of: NOT a per-row subquery or a theta-join. Both inputs are
  union-tagged and sorted once per key partition; a running
  last-non-null window carries the most recent right-side row forward
  onto each left row. One shuffle on the key, O(n log n) per partition,
  no pair blow-up -- the classic log-merge formulation.
* interval join: equi-key hash join with the time-range predicate
  applied as a join condition, so Catalyst keeps the build/probe hash
  path (never a cartesian); the range only filters matches per key
  group. Skewed hot keys fall to AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    strict: bool = False,
    direction: str = "backward",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """As-of join: each left row picks the nearest right row for the
    same ``key`` -- ``direction="backward"`` (default) takes the
    greatest ``right_ts`` <= ``left_ts`` (< when ``strict``), the
    point-in-time lookup; ``direction="forward"`` takes the SMALLEST
    ``right_ts`` >= ``left_ts`` (> when ``strict``), the
    next-event/next-quote lookup. Unmatched left rows keep NULL payload
    (left-outer semantics).

    Implementation: union-tag both sides, one window sorted by
    (ts, tag) per key -- descending for forward, so "carry the last
    seen right row" always means "nearest in the wanted direction" --
    and carry the right payload with ``last(ignorenulls)``, keep left
    rows. Right rows sort before left rows at equal timestamps
    (tag order), which realizes the inclusive bound; ``strict`` flips
    the tag order so simultaneous right rows are not visible. Ties among
    right rows at the same (key, ts) resolve to the row latest in the
    union sort -- pre-deduplicate the right side if that matters.

    NULL timestamps: a NULL can never satisfy either bound, so NULL-ts
    right rows are dropped and NULL-ts left rows come back with NULL
    payload (realized by pinning them before every right row in the
    scan order for both directions -- without the explicit NULLS FIRST,
    the forward path's descending sort would place them last and
    fabricate a match to the minimum-ts right row).

    ``tolerance_sec`` (pandas merge_asof's ``tolerance``): when set,
    a match farther than this many seconds from the left timestamp is
    NULLed out (the left row is kept) -- the lookback/lookahead window
    of attribution and sensor-alignment queries. Timestamp columns
    only; the bound is applied map-side after the carry window, so it
    adds no exchange.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: direction must be 'backward' or 'forward', got {direction!r}"
        )
    right = right.where(F.col(right_ts).isNotNull())
    right_payload = right_payload or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    clash = [c for c in right_payload if c in left.columns]
    if clash:
        # withColumn below would silently overwrite same-named left
        # columns with right payload.
        raise ValueError(
            f"asof_join payload column(s) {clash} collide with left columns; "
            "rename or pass an explicit right_payload"
        )
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    left_tag, right_tag = (0, 1) if strict else (1, 0)
    lu = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(left_tag).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(_payload_ddl(right, right_payload)).alias("_rrow"),
    )
    ru = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(right_tag).alias("_tag"),
        F.lit(None).cast(_left_ddl(left)).alias("_lrow"),
        payload_struct.alias("_rrow"),
    )
    u = lu.unionByName(ru)
    ts_order = (
        F.col("_t").asc_nulls_first()
        if direction == "backward"
        else F.col("_t").desc_nulls_first()
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_order, "_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("_r", F.last("_rrow", ignorenulls=True).over(w))
    if tolerance_sec is None:
        out = carried.where(F.col("_lrow").isNotNull()).select("_lrow.*", "_r")
        for c in right_payload:
            out = out.withColumn(c, F.col("_r")[c])
        return out.drop("_r")
    carried = carried.withColumn(
        "_rt",
        F.last(
            F.when(F.col("_rrow").isNotNull(), F.col("_t")), ignorenulls=True
        ).over(w),
    )
    out = carried.where(F.col("_lrow").isNotNull()).select(
        "_lrow.*", "_r", "_rt"
    )
    within = F.abs(
        F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("_rt"))
    ) <= int(tolerance_sec * 1_000_000)
    for c in right_payload:
        out = out.withColumn(c, F.when(within, F.col("_r")[c]))
    return out.drop("_r", "_rt")


def _payload_ddl(right: DataFrame, cols: list[str]) -> str:
    fields = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    return "struct<" + ",".join(f"{c}:{fields[c]}" for c in cols) + ">"


def _left_ddl(left: DataFrame) -> str:
    return (
        "struct<"
        + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields)
        + ">"
    )


def keep_latest(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column],
) -> DataFrame:
    """Latest-row-per-key compaction (CDC upsert semantics): keep exactly
    the first row of each key group under ``order_cols`` (pass descending
    columns for "latest"; include a unique tiebreaker column so the
    result is deterministic).

    One shuffle on the key; the rank window runs per key group, so with
    a high-cardinality key (user, entity, primary key -- the CDC case)
    partitions stay balanced at 100 TB. At very low key cardinality
    prefer a groupBy(max(struct(order..., payload))) max-struct
    aggregation instead, which partial-aggregates map-side.
    """
    if "_rn" in df.columns:
        raise ValueError("keep_latest: input already has a column named '_rn'")
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    cond: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-key join with an extra (range) condition. The equi component
    keeps Catalyst on the hash-join path -- the range predicate is
    evaluated per key group, never as a cartesian filter."""
    return left.join(
        right, (F.col(key_left) == F.col(key_right)) & cond, how
    )


def grouped_topk(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group with a BOUNDED final window: semantically
    ``row_number() OVER (PARTITION BY group ORDER BY order) <= k``, but
    a single per-group window funnels each group's ENTIRE row set
    through one task -- with a low-cardinality group (brand, country,
    status) that is the classic 100 TB straggler.

    Two-phase TakeOrdered shape instead: phase 1 ranks within
    (spark_partition_id, group) -- the exchange key includes the input
    partition id, so every task handles at most one input partition's
    rows per group -- and keeps k, shrinking each group to at most
    k * n_input_partitions rows; phase 2 runs the real per-group window
    on that pruned set. Pruning is exact (any global top-k row is a
    local top-k row of its partition), so results are identical
    (oracle-checked); ``order`` must be a total order (include a
    tiebreaker) for determinism.

    Cost: one extra |input|-row hash exchange -- for the aggregated
    inputs this targets (per-entity rollups), noise next to the fact
    scan; the win is that NO task ever sees more than
    max(input-partition size, k * n_partitions) rows.
    """
    for c in ("_gtk_pid", "_gtk_rn", rank_col):
        if c in df.columns:
            raise ValueError(f"grouped_topk: input already has column {c!r}")
    w_local = Window.partitionBy("_gtk_pid", *group).orderBy(*order)
    w_global = Window.partitionBy(*group).orderBy(*order)
    pruned = (
        df.withColumn("_gtk_pid", F.spark_partition_id())
        .withColumn("_gtk_rn", F.row_number().over(w_local))
        .where(F.col("_gtk_rn") <= k)
        .drop("_gtk_pid", "_gtk_rn")
    )
    return pruned.withColumn(rank_col, F.row_number().over(w_global)).where(
        F.col(rank_col) <= k
    )


def global_rank(
    df: DataFrame,
    key: str,
    tiebreaker: str,
    n_buckets: int = 32,
    rank_col: str = "global_rank",
    relative_error: float = 0.0,
) -> DataFrame:
    """Distributed EXACT global ranking: ``row_number() OVER (ORDER BY
    key, tiebreaker)`` without the single-partition window that plain
    SQL plans -- the classic 100 TB straggler (every row funnels
    through ONE task). (key, tiebreaker) must be a total order; key
    must be non-null.

    Two-phase, the textbook distributed ranking:

    1. n_buckets-1 EXACT interpolated percentile cuts of ``key`` ride
       back as a broadcast scalar row; each row maps to a bucket by
       plain comparisons (map-only). All equal keys land in one bucket,
       so the tiebreaker never needs to cross buckets and bucket ranges
       respect the global order by construction.
    2. Per-bucket counts prefix-sum into offsets (n_buckets rows -- the
       only unbounded-window here runs over that tiny table) and
       broadcast back; rank = offset + row_number within the bucket.

    The only full-data exchange is the bucket hash shuffle, and every
    full-size window is bounded by a bucket (~|rows|/n_buckets; key
    skew concentrates equal keys in one bucket -- raise n_buckets or
    pre-aggregate if one key dominates). Results are engine- and
    partitioning-independent: exact percentiles are deterministic, and
    ranks are defined by the total order alone (the oracle is the plain
    single-window row_number).

    Memory bound: Spark's exact ``percentile`` buffers every DISTINCT
    key value in ONE aggregation buffer -- fine for bounded-cardinality
    keys, O(|distinct|) driver/reducer memory for near-continuous ones.
    Set ``relative_error`` > 0 to swap in the mergeable
    ``approx_percentile`` (GK) sketch for the cuts (the
    equi_depth_bins/winsorize convention). The RANKS STAY EXACT either
    way: cuts only pick bucket boundaries, a row's bucket is "number of
    cuts below key" under the same broadcast constants on every row,
    and the within-bucket window orders by the true (key, tiebreaker) --
    approximate cuts merely skew bucket SIZES, never rank values
    (pinned exact==approx in tests/test_relational.py).
    """
    if not 0 <= relative_error < 1:
        raise ValueError(
            "global_rank: relative_error must be in [0, 1) "
            f"(0 = exact percentile), got {relative_error}"
        )
    if n_buckets < 2:
        raise ValueError(f"global_rank: n_buckets must be >= 2, got {n_buckets}")
    for c in ("_gr_bucket", "_gr_off", rank_col):
        if c in df.columns:
            raise ValueError(f"global_rank: input already has column {c!r}")
    if relative_error > 0:
        acc = int(1.0 / relative_error)
        cut_exprs = [
            F.percentile_approx(F.col(key), F.lit(i / n_buckets), F.lit(acc))
            .alias(f"_gr_c{i}")
            for i in range(1, n_buckets)
        ]
    else:
        cut_exprs = [
            F.expr(f"percentile({key}, {i / n_buckets})").alias(f"_gr_c{i}")
            for i in range(1, n_buckets)
        ]
    cuts = df.agg(*cut_exprs)
    bucket = sum(
        (F.col(key) > F.col(f"_gr_c{i}")).cast("long")
        for i in range(1, n_buckets)
    )
    bucketed = (
        df.crossJoin(F.broadcast(cuts))
        .withColumn("_gr_bucket", bucket)
        .drop(*[f"_gr_c{i}" for i in range(1, n_buckets)])
        # persist: feeds the per-bucket counts AND the ranked output --
        # without the barrier the scan + cut comparisons run twice
        .persist()
    )
    offsets = (
        bucketed.groupBy("_gr_bucket")
        .agg(F.count(F.lit(1)).alias("_gr_n"))
        .withColumn(
            "_gr_off",
            F.coalesce(
                F.sum("_gr_n").over(
                    Window.orderBy("_gr_bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_gr_bucket", "_gr_off")
    )
    w = Window.partitionBy("_gr_bucket").orderBy(F.col(key).asc(), F.col(tiebreaker).asc())
    return (
        bucketed.join(F.broadcast(offsets), "_gr_bucket")
        .withColumn(
            rank_col, (F.col("_gr_off") + F.row_number().over(w)).cast("long")
        )
        .drop("_gr_bucket", "_gr_off")
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    action_col: str = "action",
    broadcast_changeset: bool = True,
) -> DataFrame:
    """MERGE INTO semantics (Delta/Iceberg-style upsert) as pure
    DataFrame ops: rows of ``source`` replace same-key rows of
    ``target`` ("update"), new-key source rows append ("insert"), and
    untouched target rows pass through ("keep"). ``source`` must be
    pre-compacted to one row per key (use :func:`keep_latest`); both
    inputs must share the target schema.

    Shape chosen for scale: NOT a full-outer join (full outer cannot
    broadcast and shuffles both sides). Instead the copy-on-write
    decomposition every lakehouse MERGE compiles to:

    * kept   = target ANTI JOIN source-keys   -- broadcastable when the
      changeset is small (the CDC common case), so the 100 TB target
      never shuffles;
    * matched = target-keys SEMI JOIN source-keys -- again broadcasting
      only the changeset; the result is at most changeset-sized, so
      tagging source rows update/insert joins two SMALL sets.

    Every broadcast is of the (deduplicated, key-only) changeset --
    never of the target -- so the big side is only ever scanned, not
    shuffled. NB an explicit ``F.broadcast`` hint is honored regardless
    of size (Spark does NOT degrade it to a shuffle join), so with a
    changeset too big for driver memory pass
    ``broadcast_changeset=False``: the joins then carry no hint and
    Catalyst/AQE picks broadcast vs shuffle-hash from its own size
    estimates (autoBroadcastJoinThreshold), one shuffle per join on the
    same equi-key in the worst case.
    """
    if set(target.columns) != set(source.columns):
        raise ValueError(
            "merge_upsert: target/source schemas differ: "
            f"{sorted(set(target.columns) ^ set(source.columns))}"
        )
    if action_col in target.columns:
        raise ValueError(f"merge_upsert: column {action_col!r} already exists")
    if "_in_target" in target.columns:
        raise ValueError(
            "merge_upsert: input already has a column named '_in_target'"
        )
    hint = F.broadcast if broadcast_changeset else (lambda df: df)
    src_keys = source.select(*keys).distinct()
    kept = target.join(hint(src_keys), keys, "left_anti").withColumn(
        action_col, F.lit("keep")
    )
    matched = (
        target.select(*keys)
        .join(hint(src_keys), keys, "left_semi")
        .distinct()
        .withColumn("_in_target", F.lit(1))
    )
    upserts = (
        source.join(hint(matched), keys, "left")
        .withColumn(
            action_col,
            F.when(F.col("_in_target").isNotNull(), F.lit("update")).otherwise(
                F.lit("insert")
            ),
        )
        .drop("_in_target")
    )
    return kept.unionByName(upserts.select(*kept.columns))


def scd2_history(
    events: DataFrame,
    key: str,
    ts: str = "ts",
    attrs: list[str] | None = None,
    tiebreaker: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type 2 history build: turn a change
    stream of (key, ts, attributes...) into validity intervals -- one
    row per version with ``valid_from``, ``valid_to`` (NULL = current)
    and ``is_current``. The warehouse-side companion of
    :func:`keep_latest` (which keeps only the final version).

    Consecutive events with IDENTICAL attribute values collapse into one
    interval (a heartbeat re-stating the same attributes does not cut a
    new version). One shuffle on the high-cardinality key for the two
    stacked windows (change detection + lead), both sharing the same
    (partition, sort) so Spark plans a single sort.
    """
    attrs = attrs or [c for c in events.columns if c not in (key, ts)]
    for c in ("_chg", "valid_from", "valid_to", "is_current"):
        if c in events.columns:
            raise ValueError(f"scd2_history: input already has column {c!r}")
    order = [F.col(ts)] + ([F.col(tiebreaker)] if tiebreaker else [])
    w = Window.partitionBy(key).orderBy(*order)
    same_as_prev = F.lit(True)
    for a in attrs:
        same_as_prev = same_as_prev & F.lag(F.col(a)).over(w).eqNullSafe(F.col(a))
    # first row per key: lag is NULL -> eqNullSafe false unless attr is
    # NULL too; force a version start explicitly
    is_change = F.when(
        F.row_number().over(w) == 1, F.lit(True)
    ).otherwise(~same_as_prev)
    versioned = events.withColumn("_chg", is_change.cast("int")).where(
        F.col("_chg") == 1
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return versioned.select(
        key,
        *attrs,
        F.col(ts).alias("valid_from"),
        F.lead(F.col(ts)).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def cooccurrence_pairs(
    df: DataFrame,
    group: str,
    item: str,
    min_support: int = 2,
) -> DataFrame:
    """Frequent item-PAIR mining over transactions (the market-basket /
    co-occurrence primitive): for every unordered pair of distinct items
    appearing in the same group (order, session, document), the number
    of groups containing both and its share of all groups -- the A-priori
    k=2 pass, which in practice is the whole of "customers who bought X
    also bought Y".

    Shape: one groupBy collapses the fact table to |groups| item-set
    rows (the ONLY pass over the raw data); pairs generate IN-ROW from
    each sorted item set (flatten-of-transforms -- quadratic only in
    the per-transaction item count, which is small and bounded by
    nature, never in the table); one partial-agg count on the pair key;
    the group total rides in as a broadcast scalar. A pair self-join on
    the group key -- the naive formulation -- would shuffle the
    exploded item table twice and square inside hot groups; this never
    joins at all. NULL items are excluded; items compare as strings in
    the pair ordering (cast upstream for numeric item ids).

    Returns (item_a, item_b, n_together, support), item_a < item_b.
    """
    if min_support < 1:
        raise ValueError(
            f"cooccurrence_pairs: min_support must be >= 1, got {min_support}"
        )
    sets = (
        df.where(F.col(item).isNotNull())
        .groupBy(group)
        .agg(F.array_sort(F.collect_set(item)).alias("_items"))
    )
    n_groups = sets.agg(F.count(F.lit(1)).alias("_n_groups"))
    items = F.col("_items")
    pairs_in_row = F.flatten(
        F.transform(
            items,
            lambda x, i: F.transform(
                F.slice(items, i + F.lit(2), F.size(items)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        sets.select(F.explode(pairs_in_row).alias("_p"))
        .groupBy(
            F.col("_p.a").alias("item_a"), F.col("_p.b").alias("item_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_together"))
        .where(F.col("n_together") >= min_support)
        .join(F.broadcast(n_groups))
        .select(
            "item_a",
            "item_b",
            "n_together",
            F.round(F.col("n_together") / F.col("_n_groups"), 9).alias(
                "support"
            ),
        )
    )


def band_join(
    df: DataFrame,
    value: str,
    eps: float,
    id_col: str,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Numeric near-self-join: every unordered pair of rows whose
    ``value``s differ by at most ``eps`` -- deduped sensor readings,
    suspiciously-similar amounts, near-tie scores. The naive form is a
    theta self-join (|v_a - v_b| <= eps), which Spark can only plan as
    a cartesian; this is the BANDED form: each row keys by
    floor(v/(2*eps)), the right side additionally emits its bucket-1,
    and one hash equi-join on the bucket key produces every candidate
    (two values within eps are in the same or adjacent buckets) --
    zero cartesian, shuffle ~ 2x input, per-bucket cost follows the
    VALUE distribution (a spike of near-identical values is real
    output, not a plan accident; AQE splits hot buckets).

    Bucket width is 2*eps, NOT eps: the adjacent-bucket invariant must
    hold in IEEE arithmetic, not just real arithmetic. With width eps,
    a pair at gap ~eps has true quotient gap ~1.0, and the two rounded
    divisions v/eps can straddle an integer so the floors differ by 2
    -- the pair silently misses while a brute-force theta join emits
    it. With width 2*eps the true quotient gap is <= 0.5, leaving ~0.5
    of headroom against the ~1-ulp rounding of each division, so
    floors can never differ by more than 1. The exact
    ``value_b - value_a <= eps`` filter is unchanged -- the wider
    bucket only admits (then discards) a few more candidates.

    Each qualifying pair emits EXACTLY once, ordered (value, id): a
    same-bucket pair survives only in its (lower value, lower id)
    orientation, and an adjacent-bucket pair exists only with the
    lower-bucket row on the left (floor monotonicity: a strictly lower
    bucket implies a strictly lower value). NULL values drop. The
    |dv| <= eps filter compares raw IEEE doubles -- deterministic
    cross-engine; floor(v/eps) is the same double division + floor on
    both engines.

    ``partition_cols`` adds equi-key columns to the bucket join: pairs
    then form only WITHIN each partition key (same customer, same
    sensor), which both sharpens the semantics and shrinks every hash
    bucket by the key's cardinality -- the grouped near-tie detector
    ("two orders from one customer, one cent apart").

    Returns (*partition_cols, a_id, b_id, value_a, value_b) with
    (value_a, a_id) < (value_b, b_id) lexicographically.
    """
    if eps <= 0:
        raise ValueError(f"band_join: eps must be > 0, got {eps}")
    pc = list(partition_cols)
    base = df.where(F.col(value).isNotNull()).select(
        *pc,
        F.col(id_col).alias("_id"),
        F.col(value).cast("double").alias("_v"),
        F.floor(F.col(value).cast("double") / F.lit(2 * eps)).alias("_b"),
    )
    left = base.select(
        *pc,
        F.col("_id").alias("a_id"),
        F.col("_v").alias("value_a"),
        F.col("_b").alias("_bk"),
    )
    right = base.select(
        *pc,
        F.col("_id").alias("b_id"),
        F.col("_v").alias("value_b"),
        F.explode(F.array(F.col("_b"), F.col("_b") - 1)).alias("_bk"),
    )
    pairs = left.join(right, ["_bk", *pc]).where(
        (
            (F.col("value_a") < F.col("value_b"))
            | (
                (F.col("value_a") == F.col("value_b"))
                & (F.col("a_id") < F.col("b_id"))
            )
        )
        & (F.col("value_b") - F.col("value_a") <= F.lit(eps))
    )
    # same-bucket pairs match through BOTH of the right row's emitted
    # keys only when the pair also matches via (b, b-1) -- impossible:
    # value_a < value_b and bucket(value_b)-1 == bucket(value_a) means
    # different buckets. Each surviving pair is therefore unique.
    return pairs.select(*pc, "a_id", "b_id", "value_a", "value_b")


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """2-D skyline (Pareto front), maximizing BOTH columns: the rows no
    other row strictly dominates (x' >= x, y' >= y, one strict) -- the
    multi-objective shortlist behind "best customers by frequency AND
    spend" questions, where any single score would bury one axis.

    Decomposition instead of the quadratic NOT-EXISTS: (1) collapse to
    the per-x maximum of y -- one partial agg whose output is bounded
    by the X DOMAIN, not the row count; (2) one ordered prefix-max
    window over that bounded table (the cumulative-users convention:
    safe exactly because |distinct x| is bounded -- for continuous x
    domains, pre-bucket x or run a per-salt local skyline first, since
    skyline(S) is a subset of the skyline of local skylines); a row of
    the collapsed table survives iff its y strictly exceeds every
    larger-x maximum; (3) join survivors back on (x, y) -- ties on
    both axes are mutually non-dominating and ALL kept. The oracle IS
    the quadratic NOT-EXISTS form, so the decomposition is proven
    equal.

    NULL contract: rows with a NULL coordinate are EXCLUDED up front
    (explicit filter below). A raw three-valued-logic NOT-EXISTS would
    instead keep every NULL-coordinate row as vacuously non-dominated
    -- rarely what a shortlist wants -- so the operator pins the
    drop-NULLs semantics explicitly rather than inheriting it silently
    from the per-x max / equi-join-back mechanics; an oracle comparing
    against this operator must apply the same x/y IS NOT NULL filter.
    """
    from pyspark.sql import Window

    df = df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
    per_x = df.groupBy(x).agg(F.max(y).alias("_ym"))
    w = Window.orderBy(F.col(x).desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    surv = (
        per_x.withColumn("_pm", F.max("_ym").over(w))
        .where(F.col("_pm").isNull() | (F.col("_ym") > F.col("_pm")))
        .select(F.col(x).alias("_sx"), F.col("_ym").alias("_sy"))
    )
    return df.join(
        surv, (df[x] == F.col("_sx")) & (df[y] == F.col("_sy"))
    ).select(*[df[c] for c in df.columns])
