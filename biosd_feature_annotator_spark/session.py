"""SparkSession factory tuned for the KG-construction workload.

Local mode is a stand-in for a multi-executor cluster: every knob here
(AQE, shuffle partitions, Arrow batching, broadcast threshold) is the one
you would set cluster-side too. The Iceberg catalog config is applied only
when the runtime jar is present (SURVEY.md §7.3: not available in this
sandbox — the parquet backend in plans/materialize.py keeps the same
partition layout so the cluster path is one --packages flag away).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# One Arrow batch per ~10k rows keeps pandas-UDF peak memory bounded at
# wide text rows while amortizing Python<->JVM transfer. At 100 TB this is
# per-task, so it is scale-invariant.
ARROW_BATCH_ROWS = 10_000


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    master: str | None = None,
    app_name: str = "biosd_feature_annotator_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    shuffle_partitions defaults to the core count in local mode; on a real
    cluster set it to ~2-3x total executor cores (AQE coalesces the rest).
    """
    cores = default_parallelism()
    master = master or f"local[{cores}]"
    if shuffle_partitions is None:
        # local[N] — match N; AQE coalesce trims small shuffles anyway.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cores if n in ("*", "") else int(n)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        # 64 MiB split target: big enough to amortize task overhead, small
        # enough that a 100 TB table still yields ~1.6M splits (fine for a
        # 1000-executor DAGScheduler).
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
