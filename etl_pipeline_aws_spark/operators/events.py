"""Event-time windowing over the ``events`` table, batch mode (SURVEY.md
§2.B "Streaming", batch-mode equivalents row).

These are the oracle-checkable twins of the Structured Streaming queries in
``streaming/stream_queries.py`` — same ``F.window`` / ``F.session_window``
expressions, run over the bounded table.  The batch/stream parity (same
DuckDB oracle for both) is the correctness argument for the streaming state
handling (SURVEY.md §7 stage 6 strategy).

Scale: event-time grouping shuffles on (window, keys) with partial
aggregation; at 100 TB the input would be hour/day-partitioned Parquet so
the shuffle only ever sees one partition's worth per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.functions.numeric import dsum
from etl_pipeline_aws_spark.registry import query

TUMBLING_ORACLE = """
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
"""


@query("window_tumbling", oracle=TUMBLING_ORACLE)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows per event type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SLIDING_ORACLE = """
    -- every event belongs to exactly size/slide = 2 sliding windows
    SELECT ws AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (
        SELECT e.value,
               time_bucket(INTERVAL '5 minutes', e.ts) - k.k * INTERVAL '5 minutes' AS ws
        FROM events e
        CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1) k)
    GROUP BY ws
"""


@query("window_sliding", oracle=SLIDING_ORACLE)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows, 10-minute size / 5-minute slide: each event lands in
    two overlapping windows (Spark expands via its internal window
    generator; the oracle expands explicitly)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


SESSION_ORACLE = """
    -- gaps-and-islands: a >=30-minute silence starts a new session
    -- (matches Spark's half-open [start, last+gap) session semantics)
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
"""


@query("window_session", oracle=SESSION_ORACLE)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "events_type_summary",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def events_type_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-stream rollup per event type (the foreachBatch routing
    check target in streaming/stream_queries.py)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum("value").alias("sum_value"),
    )
