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
    "orc_roundtrip",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → ORC sink → ORC scan → aggregate.  ORC is Spark's other
    first-class columnar format (native vectorized reader, predicate
    pushdown); the aggregate over the round trip holds reader and writer
    to exact fidelity on doubles/timestamps/strings."""
    li = load_table(spark, sf_dir, "lineitem")
    zone = tempfile.mkdtemp(prefix="orc_zone_")
    out = os.path.join(zone, "lineitem_orc")
    li.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


@query(
    "parquet_schema_evolution",
    oracle="""
    SELECT CAST(2 * COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_with_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_with_totalprice
    FROM orders
    """,
)
def parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across Parquet file generations: generation 1
    carries (o_orderkey, o_custkey), generation 2 adds o_totalprice and
    drops o_custkey; a mergeSchema read unions the schemas and fills the
    missing columns with NULL.  This is the lake reality at 100 TB — years
    of files, schema widened in place, one read over all of them.
    (mergeSchema is a footer-union planning step; keep it off for
    steady-state reads and on only when generations actually diverge.)"""
    orders = load_table(spark, sf_dir, "orders")
    zone = tempfile.mkdtemp(prefix="pq_evo_")
    orders.select("o_orderkey", "o_custkey").write.mode("overwrite").parquet(
        os.path.join(zone, "gen=1")
    )
    orders.select("o_orderkey", "o_totalprice").write.mode("overwrite").parquet(
        os.path.join(zone, "gen=2")
    )
    back = spark.read.option("mergeSchema", True).option("basePath", zone).parquet(
        os.path.join(zone, "gen=1"), os.path.join(zone, "gen=2")
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_with_custkey"),
        F.count("o_totalprice").alias("n_with_totalprice"),
    )


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


def write_clustered(df: DataFrame, col: str, out: str, n_ranges: int = 8) -> None:
    """Write ``df`` as Parquet clustered on ``col``: range-repartition (so
    files cover disjoint value slices, balanced by sampling) then sort
    within partitions (so row groups inside each file are narrow too)."""
    (
        df.repartitionByRange(n_ranges, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(out)
    )


@query(
    "parquet_clustered_layout",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def parquet_clustered_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-clustered Parquet layout: range-repartition on l_shipdate then
    sortWithinPartitions before writing, so every output file — and every
    row group inside it — covers a narrow, disjoint shipdate slice.  A
    date-range read over that layout skips whole files via row-group
    min/max stats instead of scanning the table; at 100 TB this layout
    choice, not the query plan, decides whether a quarter-window query
    reads 1/40th of the data or all of it.  tests/test_plans.py asserts
    the per-file min/max spans are disjoint slices of the date range.
    repartitionByRange samples the column to build balanced range bounds —
    the same mechanic that keeps the layout skew-proof when one ship-week
    is hot."""
    li = load_table(spark, sf_dir, "lineitem")
    zone = tempfile.mkdtemp(prefix="pq_clustered_")
    out = os.path.join(zone, "lineitem_by_shipdate")
    write_clustered(li, "l_shipdate", out)
    back = spark.read.parquet(out).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )
