"""SparkSession factory tuned for the engine's workload shape.

Scale design (100 TB target, tested on local[32]):

- AQE on: runtime coalescing of post-shuffle partitions, skew-join
  splitting — the synthetic corpus is uniform but real document/vector
  corpora are Zipfian in term frequency and cluster size.
- Arrow on: every Pandas-UDF boundary (embedding inference, MMR) moves
  columnar batches, not pickled rows.
- Broadcast threshold raised to 64 MiB: dimension tables (region,
  nation, supplier, centroids, query sets) stay map-side at every SF;
  the big fact/vector tables never broadcast.
- shuffle.partitions defaults to the local core count; on a real
  cluster this should be ~2-3x total executor cores (set via env).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mcp-vector-search-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard tuning.

    When the driver already created a session (the verify harness does),
    ``getOrCreate`` reuses it and these configs are no-ops — every
    operator in this package is written to be correct under default
    configs and merely *faster* under these.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    parts = str(shuffle_partitions or cpus)
    # local-mode default driver heap is 1g — far below what a 32-thread
    # local "cluster" needs for cached vector layouts. Only effective
    # when this process creates the JVM (driver-harness sessions keep
    # their own setting).
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    # r12 optimization round, measured on the join/shuffle-heavy gate
    # subset (minhash, dup_clusters, hybrid, kg_edges, closure; guide
    # §2.3/§3.1): zstd shuffle+spill compression beat the lz4 default
    # by ~25-30% wall (subset totals 32.1/39.3 s lz4 vs 21.6/26.6 s
    # zstd across interleaved fresh sessions), and allowing shuffled-
    # hash join where its size conditions hold took another ~10% on
    # join paths (27.7 s). Both are scale-general (smaller shuffle
    # bytes / no sort when one side hashes), not local-core tuning;
    # env-overridable for clusters that prefer otherwise.
    io_codec = os.environ.get("SPARK_GRAFT_IO_CODEC", "zstd")
    prefer_smj = os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.driver.memory", mem)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.io.compression.codec", io_codec)
        .config("spark.sql.join.preferSortMergeJoin", prefer_smj)
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if master:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
