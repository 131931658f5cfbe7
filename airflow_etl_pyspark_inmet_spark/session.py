"""SparkSession factory.

Defaults are tuned for the test rig (local[N], single JVM) but every setting
is the one you'd want on a real cluster too: AQE for runtime re-planning
(coalesce small shuffle partitions, skew-join splitting), UTC session time
zone so results are oracle-comparable, Arrow for any pandas-UDF exchange.

At 100 TB the only knobs that change are shuffle partition count (set it to
~2-3x total executor cores, or leave AQE's coalescing to fix over-partitioning)
and `spark.sql.files.maxPartitionBytes` (default 128 MB is right for wide
parquet scans).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "airflow_etl_pyspark_inmet_spark",
    master: str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    AQE is on: it re-coalesces shuffle partitions at runtime, converts
    sort-merge joins to broadcast when the built side turns out small, and
    splits skewed partitions — exactly the behaviors we rely on at scale.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
