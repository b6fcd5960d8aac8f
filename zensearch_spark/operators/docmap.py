"""Stable, reproducible docID assignment (SURVEY.md §7 M2).

doc_id = global rank of (conv_id, turn_idx) in ascending order —
the deterministic replacement for the reference's randomUUID row ids
(reference: database/src/database.ts:52,72) and the key that makes
"rank-identical" verification possible.

Scale design: NO single-task global sort and NO
monotonically_increasing_id (partition-layout dependent). Instead a
two-pass partition-offset scheme:

1. repartitionByRange on (conv_id, turn_idx) → ordered, disjoint key
   ranges per partition (range boundaries may vary run to run; the
   final rank does not, because ranges are ordered and ranks are
   computed within + offset across).
2. count rows per partition (tiny collect), prefix-sum → offsets.
3. row_number within each partition (Window.partitionBy(pid) — fully
   parallel, no global sort) + broadcast offset join.

The intermediate is pinned with persist() so the sampled range
boundaries cannot drift between the count pass and the stamp pass;
at 100 TB you would materialize step 1 to a table (the index build
pipeline in plans/index_build.py does exactly that via its
checkpointed stages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_doc_ids(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    num_ranges: int | None = None,
) -> DataFrame:
    """Return df + ``doc_id`` = dense global rank of key_cols (0-based).

    Keys must be unique. All other columns pass through.
    """
    spark = df.sparkSession
    num_ranges = num_ranges or spark.sparkContext.defaultParallelism * 2
    keyed = (
        df.repartitionByRange(num_ranges, *[F.col(c) for c in key_cols])
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in keyed.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(
        offsets,
        T.StructType(
            [
                T.StructField("_pid", T.IntegerType(), False),
                T.StructField("_offset", T.LongType(), False),
            ]
        ),
    )
    w = Window.partitionBy("_pid").orderBy(*[F.col(c).asc() for c in key_cols])
    # pin the stamp pass's partitioning explicitly: without this, the
    # window's ENSURE_REQUIREMENTS hash shuffle on _pid is
    # AQE-coalescible — at small-to-medium key volumes AQE folds it to
    # ~1 partition and the rank runs SERIALLY (measured: the whole
    # doc_map stage flat at 1.0x speedup 8→32 cores). A user-specified
    # repartition width is exempt from AQE coalescing, and
    # HashPartitioning(_pid, n) satisfies the window's required
    # distribution, so no second shuffle follows.
    out = (
        keyed.repartition(num_ranges, "_pid")
        .join(F.broadcast(off_df), "_pid")
        .withColumn(
            "doc_id", (F.col("_offset") + F.row_number().over(w) - 1).cast("long")
        )
        .drop("_pid", "_offset")
    )
    out._zs_pinned = keyed  # noqa: SLF001 — handle for unpersist_intermediates
    out._zs_total = acc  # noqa: SLF001 — expected row count (invariant check)
    return out


def unpersist_intermediates(df: DataFrame) -> None:
    """Release the pinned range-partitioned intermediate once the
    stamped result has been materialized (e.g. written to parquet)."""
    pinned = getattr(df, "_zs_pinned", None)
    if pinned is not None:
        pinned.unpersist()
