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
        # Scan split size, env-overridable (r7).  Measured both ways at
        # sf1.0: 16m splits the multi-row-group testdata files to
        # row-group granularity but DOUBLES the headline's narrow
        # block-sums pass (8× more map tasks → each partial-agg map sees
        # fewer rows per group, so the map-side combine collapses less
        # and the shuffle grows — guide §2.3 "aggregate before you
        # shuffle"), while the single-row-group tables can't split below
        # one task anyway (queries fix that with an explicit adaptive
        # repartition instead).  The 128m default keeps the bench
        # comparable; raise to 512m-1g at cluster scale (guide §6).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
