"""SparkSession factory with scale-minded defaults.

Local-mode testing stands in for a multi-executor cluster; every knob here
is chosen to behave identically when the same job runs under
``spark-submit --py-files`` on 1000 executors (AQE on, explicit shuffle
parallelism, Arrow for the pandas-UDF twin paths, UTC everywhere).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fluent_bit_clp_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # Scan split size, env-overridable (r7).  Local default 16m: the
        # testdata tables are single ~16-130 MB files whose row groups are
        # ~20 MB, so 128m splits made whole-table single-task scans (31
        # cores idle under every scan-heavy query).  16m splits them down
        # to row-group granularity.  At cluster scale with many-file
        # tables, set SPARK_GRAFT_MAX_PARTITION_BYTES=512m-1g instead
        # (guide §6: large sequential scans want big splits to cut task
        # scheduling overhead and map-task counts feeding shuffles).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
