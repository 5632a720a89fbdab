"""Flagship multi-operator analytics queries (TPC-H-pattern Q3/Q10 shapes
on the driver's star schema) — the bench headliners that exercise
scan → pushed filter → multi-join → agg → top-k in one plan.

These complement q1_pricing_summary (scalars.py) and
join_chain_revenue_by_nation (joins.py) so the bench measures the classic
warehouse shapes: selective-join-agg-topk (Q3), outer-fact aggregation with
a broadcast dimension chain (Q10).

Scale notes: customer/orders/lineitem all shuffle on their join keys;
AQE picks broadcast for customer at small SF and sort-merge at 100 TB.
The top-k is ORDER BY + LIMIT ⇒ TakeOrderedAndProject (per-partition heap,
no global sort).  Filters sit directly on the scans ⇒ Parquet row-group
skipping on l_shipdate / o_orderdate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.functions.numeric import dec
from etl_pipeline_aws_spark.registry import query

_CUT = "1995-06-30 00:00:00"


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{_CUT}'
      AND l_shipdate  > TIMESTAMP '{_CUT}'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: unshipped orders of one segment, top-10 by revenue.
    Revenue through exact decimals; LIMIT is total-ordered by
    (revenue DESC, l_orderkey) so the cut is deterministic."""
    cut = F.lit(_CUT).cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    one = F.lit(1).cast("decimal(18,4)")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount", 4)))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returns per customer, top-20.  nation is
    broadcast (25 rows); the fact-side join shuffles on the keys; the
    returnflag filter reaches the lineitem scan (PushedFilters)."""
    cust = load_table(spark, sf_dir, "customer")
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    one = F.lit(1).cast("decimal(18,4)")
    return (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount", 4)))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
