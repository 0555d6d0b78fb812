"""SparkSession factory with the engine's required settings."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "p_id_text_extraction_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    # Scan-split sizing is scale-dependent (guide section 6): the bench
    # corpora are single files of MBs-to-hundreds-of-MBs, where the 128m
    # default packs a whole multi-row-group table into 1-2 tasks and
    # serializes every pre-exchange stage; 16m lets those scans fan out
    # (row-group granularity still bounds it).  A 100 TB deployment with
    # thousands of large files should raise this back up (512m-1g) via the
    # env var -- more, smaller map tasks would only bloat the shuffle
    # block count there (guide section 2.2).
    max_part = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m")
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", max_part)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
