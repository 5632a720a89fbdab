"""Source/sink registry queries (SURVEY.md §2.B "Sources / sinks"):
NDJSON scan+sink (the reference's native format, R1/R2/R6/R7), CSV
scan, partitioned Parquet sink with partition-pruned read-back.

Each query is a genuine round trip through the format — write to a temp
zone, read back, verify against the oracle computed on the original table —
so the reader AND writer are both on the hook for fidelity.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.registry import query
from etl_pipeline_aws_spark.sources.ndjson import read_ndjson, write_ndjson


@query(
    "ndjson_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, n_chars, text
    FROM documents
    """,
)
def ndjson_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → NDJSON sink (R6/R7) → NDJSON scan (R1/R2): JSON-line
    serialization must preserve every value exactly."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars", "text"
    )
    zone = tempfile.mkdtemp(prefix="ndjson_zone_")
    out = os.path.join(zone, "documents_ndjson")
    write_ndjson(docs, out)
    back = read_ndjson(spark, out)
    return back.select("doc_id", "lang", "source", "n_chars", "text")


@query(
    "csv_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    """,
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → CSV sink → CSV scan with explicit schema (inferSchema is
    a second full pass over the data — never at 100 TB)."""
    cust = load_table(spark, sf_dir, "customer")
    zone = tempfile.mkdtemp(prefix="csv_zone_")
    out = os.path.join(zone, "customer_csv")
    cust.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
    ).option("header", True).csv(out)
    return back


@query(
    "parquet_partitioned_sink",
    oracle="""
    SELECT event_type, COUNT(*) AS n_rows
    FROM events
    WHERE event_type IN ('click', 'view')
    GROUP BY event_type
    """,
)
def parquet_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned Parquet sink + partition-pruned read-back: the filter on
    the partition column prunes directories at planning time (PartitionFilters
    in the scan) — the layout that makes a 100 TB event store queryable."""
    ev = load_table(spark, sf_dir, "events")
    zone = tempfile.mkdtemp(prefix="pq_zone_")
    out = os.path.join(zone, "events_by_type")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type").isin("click", "view"))
    return back.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_rows"))
