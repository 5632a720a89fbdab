"""SparkSession factory tuned for correctness-vs-oracle and 100 TB posture.

Local testing runs ``local[N]`` (single JVM); the configs below are chosen so
the *same* logical plans scale to a real cluster:

- AQE on (adaptive coalescing, skew-join splitting, dynamic join strategy) —
  the runtime re-planner that makes a fixed ``shuffle.partitions`` survive a
  100× scale-up.
- ``spark.sql.session.timeZone=UTC`` — DuckDB timestamps are UTC-naive; the
  oracle comparison requires pinning.
- Arrow enabled — every Pandas-UDF path (LLM ops, multimodal) transfers
  columnar batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def session_builder(
    app_name: str = "etl_pipeline_aws_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession.Builder:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        # Keep the broadcast threshold at Spark's 10 MB default: a larger
        # value makes local[32] auto-broadcast *filtered fact tables*
        # (observed on q3: lineitem post-filter slipped under 64 MB), which
        # is precisely the plan that OOMs the driver at 100 TB.  True
        # dimensions (region/nation/supplier) carry explicit broadcast()
        # hints instead.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
    )


def get_spark(app_name: str = "etl_pipeline_aws_spark") -> SparkSession:
    """Build (or reuse) the engine session."""
    spark = session_builder(app_name).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
