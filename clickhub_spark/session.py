"""SparkSession factory with the engine's standard configuration.

Settings rationale (100 TB design point, tested on local[32]):
- UTC session timezone: the reference stores DateTime('UTC')
  (reference types.json:6); all event-time semantics are UTC.
- AQE on: runtime join-strategy switches, skew-join splitting and
  shuffle-partition coalescing are the scale story for ad-hoc queries.
- Arrow on: every pandas_udf / toPandas crosses the JVM boundary in
  columnar batches (the analog of the reference's Native-format pipe,
  reference repo/importer.py:104-108).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "clickhub-spark", cpus: str | int | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all local cores.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        # Split small-but-CPU-heavy scans across cores: the bench SFs
        # arrive as single ~10 MB files, which the 128 MB default maps
        # to ONE partition (one core).  4 MB saturates local[32]
        # (q_agg_multi 2.7× faster).  This factory always builds a
        # local[] session (the driver/bench/test surface), so the small
        # default is safe; a cluster deployment supplies its own
        # session or overrides SPARK_GRAFT_MAX_PARTITION_BYTES — the
        # 128 MB default is right when tables have many files.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
