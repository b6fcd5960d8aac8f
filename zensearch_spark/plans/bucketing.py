"""Bucketed tables for co-located (shuffle-free) joins.

The round brief's shuffle-minimization list names three levers:
broadcast (used for dims and query-side maps), repartition (used for
salt/term shuffles), and BUCKETING — pre-hashing a table into a fixed
number of buckets at WRITE time so that later equi-joins and
aggregations on the bucket key need NO exchange at all. This module
is the bucketing lever: write once, join forever without a shuffle.

At 100 TB this is the difference between re-shuffling a fact table on
every join against its (also huge) sibling vs paying the hash once at
ingest: two tables bucketed by the same key into the same bucket
count join with zero Exchange operators (verified by plan assertion
in tests/test_bucketing.py). Spark's bucketing needs the session
catalog (saveAsTable) — plain parquet paths don't carry bucket specs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table. Sorting within buckets additionally enables shuffle-free
    sort-merge joins without a per-task sort."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    force_merge: bool = False,
) -> DataFrame:
    """Equi-join two same-key same-bucket-count tables — plans with
    zero Exchange when bucketing lines up (the co-location payoff).

    ``force_merge`` adds a MERGE hint: below the broadcast threshold
    the planner (rightly) prefers BroadcastHashJoin and ignores
    bucketing; the hint pins the sort-merge path, which is what a
    100 TB × 100 TB join planar to both bucket specs uses — tests
    assert that path carries no Exchange and no per-task Sort."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    if force_merge:
        rt = rt.hint("merge")
    return lt.join(rt, key)
