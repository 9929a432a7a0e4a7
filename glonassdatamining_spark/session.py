"""SparkSession factory.

Local test/bench configuration; the same settings are what we would
ship as cluster defaults (AQE on, adaptive skew-join, Arrow for any
pandas-UDF boundary). On a real 1000-executor cluster only
``master`` / shuffle-partition counts change — the declarative plans
themselves are partition-count agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "glonassdatamining-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # Shuffle sizing: 32 matches local cores; at cluster scale AQE
        # coalesces from a higher initial count, so keep AQE on always.
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transfer for the few pandas-UDF operators (SURVEY §2.M).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Keep driver result transfers bounded; we never collect big frames.
        .config("spark.driver.maxResultSize", "2g")
        # ANSI off: TPC-H-ish fixtures are clean; oracle SQL is ANSI anyway.
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
