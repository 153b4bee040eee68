"""Table profiling: one-pass column statistics for data-quality checks.

A training-data pipeline audits every ingested table before it joins the
corpus: row counts, null ratios, cardinalities, and value ranges per
column. The reference has no profiling surface (its only data-quality
signal is the malformed-CSV-line count, Utils.scala:22-24); this operator
generalizes that idea to a first-class, oracle-checkable query.

Shape: ONE aggregation over the table computes every per-column statistic
as a single wide row (count/nulls/distinct/min/max per column), which is
then unpivoted driver-free into the tall (column, stats...) form with an
``explode(array(struct...))`` over that one row. At 100 TB the scan is
the cost; all aggregates are partial-aggregated map-side. The exact
``count_distinct`` over k columns makes Catalyst plan an Expand (k rows
per input row) -- the documented scale knob is ``approx=True``, which
swaps in HyperLogLog++ partials (no Expand, mergeable sketches) at the
price of an estimate (and of oracle-exactness, so the checked query uses
exact mode).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def profile_table(
    df: DataFrame,
    num_cols: Sequence[str] = (),
    str_cols: Sequence[str] = (),
    ts_cols: Sequence[str] = (),
    approx: bool = False,
) -> DataFrame:
    """Profile ``df`` -> (col_name, n_rows, n_nulls, n_distinct, min_num,
    max_num, min_str, max_str), one row per profiled column.

    Numeric columns report min/max in ``min_num``/``max_num`` (DOUBLE,
    the raw values -- no arithmetic, so cross-engine bit-identical);
    string columns report lexicographic min/max in ``min_str``/``max_str``;
    timestamp columns are formatted to second precision in the string
    slots. The unused pair is NULL.
    """
    cols = [*num_cols, *str_cols, *ts_cols]
    if not cols:
        raise ValueError("profile_table: no columns given")
    nd = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        if c in num_cols:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"mx_{c}"))
        elif c in ts_cols:
            aggs.append(F.date_format(F.min(F.col(c)), TS_FMT).alias(f"mn_{c}"))
            aggs.append(F.date_format(F.max(F.col(c)), TS_FMT).alias(f"mx_{c}"))
        else:
            aggs.append(F.min(F.col(c)).alias(f"mn_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"mx_{c}"))
    # The k-column exact-distinct aggregation plans an Expand (k+1 rows
    # per input row); mixing the plain counts/min/max into the SAME
    # aggregate drags every non-distinct buffer through that Expand too
    # (measured 2.6x the cost of the two pieces run apart at sf0.1).
    # Two single-row aggregations + one broadcast cross join keep the
    # Expand k-wide and the plain pass Expand-free (r11 optimization;
    # same aggregate values, one extra cheap scan).
    dist = df.agg(*[nd(c).alias(f"nd_{c}") for c in cols])
    wide = df.agg(*aggs).crossJoin(F.broadcast(dist))

    def row_struct(c: str):
        is_num = c in num_cols
        return F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
            F.col(f"nd_{c}").cast("long").alias("n_distinct"),
            (F.col(f"mn_{c}") if is_num else F.lit(None).cast("double")).alias(
                "min_num"
            ),
            (F.col(f"mx_{c}") if is_num else F.lit(None).cast("double")).alias(
                "max_num"
            ),
            (F.lit(None).cast("string") if is_num else F.col(f"mn_{c}")).alias(
                "min_str"
            ),
            (F.lit(None).cast("string") if is_num else F.col(f"mx_{c}")).alias(
                "max_str"
            ),
        )

    tall = wide.select(
        F.explode(F.array(*[row_struct(c) for c in cols])).alias("s")
    )
    return tall.select("s.*")


def profile_drift(
    profile_old: DataFrame,
    profile_new: DataFrame,
    null_ratio_alert: float = 0.05,
    distinct_ratio_alert: float = 0.5,
) -> DataFrame:
    """Snapshot-over-snapshot drift report from two :func:`profile_table`
    outputs: per column, the null-ratio delta, the relative change in
    distinct cardinality, range movement, and presence changes (column
    added/removed between snapshots).

    Returns (col_name, status, null_ratio_old, null_ratio_new,
    null_ratio_delta, distinct_rel_change, range_moved, alert) where
    ``status`` is 'both' / 'added' / 'removed' and ``alert`` fires when
    the null-ratio delta exceeds ``null_ratio_alert``, the distinct
    cardinality changes by more than ``distinct_ratio_alert`` (relative;
    a 0 -> N explosion counts as infinite), the value range widens in
    either direction (numeric or string/timestamp slots), one side is
    an empty snapshot while the other has rows, or a column appeared/
    disappeared -- the ingest-gate check a daily pipeline runs before a
    new snapshot joins the corpus.

    Scale: the inputs are already profile outputs (one row per column),
    so this is a full-outer join of two tiny tables -- driver-free but
    effectively free at any corpus size; the expensive part (the scans)
    happened in profile_table.
    """
    o = profile_old.select(
        "col_name",
        F.col("n_nulls").alias("_nn_o"),
        F.col("n_rows").alias("_nr_o"),
        F.col("n_distinct").alias("_nd_o"),
        F.col("min_num").alias("_mn_o"),
        F.col("max_num").alias("_mx_o"),
        F.col("min_str").alias("_ms_o"),
        F.col("max_str").alias("_xs_o"),
    )
    n = profile_new.select(
        "col_name",
        F.col("n_nulls").alias("_nn_n"),
        F.col("n_rows").alias("_nr_n"),
        F.col("n_distinct").alias("_nd_n"),
        F.col("min_num").alias("_mn_n"),
        F.col("max_num").alias("_mx_n"),
        F.col("min_str").alias("_ms_n"),
        F.col("max_str").alias("_xs_n"),
    )
    j = o.join(n, "col_name", "full_outer")
    status = (
        F.when(F.col("_nr_o").isNull(), F.lit("added"))
        .when(F.col("_nr_n").isNull(), F.lit("removed"))
        .otherwise(F.lit("both"))
    )

    # Zero-row-guarded ratios: the unguarded division crashes under
    # Spark 4's default ANSI mode the day an ingest produces an empty
    # snapshot (and silently reads as "no drift" with ANSI off).
    def _ratio(nn, nr):
        return F.when(F.col(nr) > 0, F.col(nn) / F.col(nr))

    nro = _ratio("_nn_o", "_nr_o")
    nrn = _ratio("_nn_n", "_nr_n")
    nr_delta = nrn - nro
    # 0 -> N distinct is an unbounded relative change, not "no change".
    nd_rel = F.when(
        F.col("_nd_o") > 0,
        F.abs(F.col("_nd_n") - F.col("_nd_o")) / F.col("_nd_o"),
    ).when(
        (F.col("_nd_o") == 0) & (F.col("_nd_n") > 0), F.lit(float("inf"))
    )

    def _widened(lo_o, lo_n, hi_o, hi_n):
        return (
            F.col(lo_o).isNotNull()
            & F.col(lo_n).isNotNull()
            & ((F.col(lo_n) < F.col(lo_o)) | (F.col(hi_n) > F.col(hi_o)))
        )

    # numeric ranges compare numerically; string/timestamp ranges live in
    # the _str slots (timestamps formatted so lexicographic order is
    # chronological)
    range_moved = _widened("_mn_o", "_mn_n", "_mx_o", "_mx_n") | _widened(
        "_ms_o", "_ms_n", "_xs_o", "_xs_n"
    )
    # One side empty while the other has rows is itself drift even
    # though the ratios are NULL then.
    emptiness_flip = (
        (F.col("_nr_o") == 0) & (F.col("_nr_n") > 0)
    ) | ((F.col("_nr_o") > 0) & (F.col("_nr_n") == 0))
    alert = (
        (status != "both")
        | F.coalesce(emptiness_flip, F.lit(False))
        | (F.abs(F.coalesce(nr_delta, F.lit(0.0))) > null_ratio_alert)
        | (F.coalesce(nd_rel, F.lit(0.0)) > distinct_ratio_alert)
        | F.coalesce(range_moved, F.lit(False))
    )
    return j.select(
        "col_name",
        status.alias("status"),
        F.round(nro, 6).alias("null_ratio_old"),
        F.round(nrn, 6).alias("null_ratio_new"),
        F.round(nr_delta, 6).alias("null_ratio_delta"),
        F.round(nd_rel, 6).alias("distinct_rel_change"),
        F.coalesce(range_moved, F.lit(False)).alias("range_moved"),
        alert.alias("alert"),
    )


def reconcile_tables(
    a: DataFrame, b: DataFrame, bucket: str, cols: Sequence[str]
) -> DataFrame:
    """Cross-table reconciliation checksums -- the replication /
    migration / backfill audit primitive: per ``bucket``, row counts
    and an order-insensitive content checksum for BOTH tables, with
    match booleans.

    Each side is ONE partial-aggregated scan whose shuffle output is
    n_buckets rows of (count, checksum); the compare is a tiny
    full-outer join. At 100 TB across two clusters, only the
    per-bucket summary rows ever travel -- never data -- and the
    checksum is a SUM (decimal-exact, overflow-free to ~10^28 rows),
    so per-day results merge to month/table level for free and each
    side can be computed by a different engine.

    Checksum = SUM over rows of string_hash31 of the \\x01-joined
    string forms of ``cols`` (NULL -> \\x00 sentinel) -- deterministic
    across engines for integer/string columns; pre-cast floats and
    timestamps to a canonical integer form (e.g. ``unix_micros``)
    before reconciling. Collision odds: a DIFFERING bucket hashes
    equal with probability ~2^-31 per bucket (independent md5-derived
    terms); reconcile at day-or-finer granularity so a collision never
    hides more than one bucket's drift.

    Returns (bucket, n_a, n_b, rows_match, checksum_match); buckets
    missing on one side report 0 rows and checksum_match = 0.
    """
    from ..functions.hashing import string_hash31

    def summarize(df: DataFrame, n_col: str, ck_col: str) -> DataFrame:
        row = F.concat_ws(
            "\x01",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                for c in cols
            ],
        )
        return df.groupBy(bucket).agg(
            F.count(F.lit(1)).alias(n_col),
            F.sum(string_hash31(row).cast("decimal(38,0)")).alias(ck_col),
        )

    j = summarize(a, "n_a", "_ck_a").join(
        summarize(b, "n_b", "_ck_b"), bucket, "full_outer"
    )
    return j.select(
        bucket,
        F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
        F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
        (F.coalesce("n_a", F.lit(0)) == F.coalesce("n_b", F.lit(0)))
        .cast("long")
        .alias("rows_match"),
        F.col("_ck_a").eqNullSafe(F.col("_ck_b")).cast("long").alias(
            "checksum_match"
        ),
    )
