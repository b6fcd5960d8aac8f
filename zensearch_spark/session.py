"""SparkSession factory tuned for this engine.

local[N] in the sandbox; the same configs are what we'd pass to
spark-submit on a real cluster (AQE on, Arrow on, explicit shuffle
partition sizing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "zensearch_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_mem: str | None = None,
) -> SparkSession:
    cores = int(cores or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    driver_mem = driver_mem or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    # Make the package importable in Python workers regardless of cwd —
    # the local-mode analog of `spark-submit --py-files zensearch_spark.zip`.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{pp}" if pp else repo_root
        )
    # Shuffle/scratch on tmpfs when available: this sandbox's virtio
    # disk is throttled (~100 MB/s with multi-second writeback stalls)
    # and shuffle spill through it serializes the whole job; RAM-backed
    # scratch is the local-mode analog of a cluster's node-local NVMe.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.local.dir", local_dir or "/tmp")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches amortize per-batch pandas conversion in
        # mapInPandas stages (measured: 540k-turn block encode
        # 16.3 s → 12.9 s at local[32]); raises per-task memory by
        # ~batch × row-width, well within executor budgets
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # MIN/MAX/COUNT aggs with no filter/group answer from parquet
        # footer statistics instead of scanning data pages — makes the
        # distributed dense-id invariant check (plans/index_build.py
        # _table_id_stats) metadata-only at any scale
        .config("spark.sql.parquet.aggregatePushDown", "true")
        .config("spark.ui.enabled", "false")
        # Cap GC threads: the JVM defaults to ~23 parallel GC threads at
        # 32 CPUs, and GC+task thread oversubscription inside this VM
        # collapses throughput (measured: 50M-row shuffle 129.7s with
        # default GC vs 6.3s with the cap at local[32]). On a real
        # multi-executor cluster the same principle applies per
        # executor: size executor cores + GC threads within the
        # container's CPU quota.
        .config(
            "spark.driver.extraJavaOptions",
            "-Djava.net.preferIPv4Stack=true "
            f"-XX:ParallelGCThreads={os.environ.get('SPARK_GRAFT_GC_THREADS', '8')} "
            "-XX:ConcGCThreads=2",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
