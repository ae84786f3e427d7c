"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the config choices are the ones that matter
on a real cluster too: AQE for runtime re-planning (skew joins, partition
coalescing), Arrow for any pandas-UDF path, UTC session timezone so event-time
semantics are unambiguous, and a shuffle-partition count sized to the
parallelism at hand rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "milvus_cdc_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet TIMESTAMP(NANOS) is unreadable by Spark natively; read the
        # raw int64 and let the catalog convert (truncate) to microseconds.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Input-split sizing must match the data scale (SURVEY §6 / the
        # 100 TB brief): the default 128 MB leaves the ≤11 MB single-file
        # test tables as one-split scans that serialize 32 cores. 4 MB
        # spreads the local fixtures across the machine; a cluster run at
        # real scale overrides via SPARK_GRAFT_MAX_PARTITION_BYTES (128 MB+).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024)),
        )
    )
    return builder.getOrCreate()
