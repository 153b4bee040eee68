"""Bucketed-table layout: pre-shuffled storage for co-located joins.

A join between two fact-sized tables shuffles BOTH sides on the key —
at 100 TB that shuffle is the job. Bucketing pays that shuffle ONCE at
write time: `bucketBy(n, key)` hashes rows into a fixed bucket count
inside every written file set, and Spark's scan exposes that layout as
`HashPartitioning(key, n)` — so a subsequent equi-join of two tables
bucketed the same way plans with NO Exchange on either side (asserted
in tests/test_bucketed.py), and a groupBy on the bucket key skips its
exchange too. This is the standard warehouse answer for a join that
runs every day on the same keys (fact-to-fact joins, incremental
dedup against a bucketed history table).

Constraints inherited from Spark (documented, not hidden):

* bucketed tables live in the session catalog (`saveAsTable`) — a bare
  `parquet(path)` write cannot carry bucket metadata;
* both sides must use the SAME bucket count (or a divisor, with
  `spark.sql.bucketing.coalesceBucketsInJoin.enabled`) and key;
* one file per bucket per writing task — repartition by the bucket key
  first (done here) so each task owns whole buckets and small files
  don't explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) catalog
    table. Sorting within buckets additionally lets Spark plan
    sort-merge joins without the per-task sort and keeps parquet
    min/max stats tight on the sort keys (the Z-order story on one
    column).

    The pre-repartition on the bucket keys makes task boundaries align
    with bucket boundaries: without it every writing task emits a file
    for every bucket it happens to hold rows of (tasks × buckets small
    files)."""
    if not keys:
        raise ValueError("write_bucketed: need at least one bucket key")
    if n_buckets < 1:
        raise ValueError(f"write_bucketed: n_buckets must be >= 1, got {n_buckets}")
    writer = (
        df.repartition(n_buckets, *keys)
        .write.mode(mode)
        .bucketBy(n_buckets, *keys)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read of a (bucketed) table; the bucket layout rides in as
    the scan's output partitioning, which is what lets Catalyst elide
    exchanges downstream."""
    return spark.table(table)
