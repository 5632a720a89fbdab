"""Scale-posture operators: the shuffle-avoidance and skew-mitigation
patterns that keep the 100 TB plans healthy, demonstrated end-to-end and
oracle-checked for correctness.

The reference has no joins at all (SURVEY.md §2.A — map-only pipeline);
these exist for the north star's "design every operator for 100 TB scale":

- **bucketed co-located join**: both fact tables written ``bucketBy`` the
  join key ⇒ the sort-merge join reads bucket i against bucket i with NO
  shuffle exchange on either side.  At 100 TB this converts the largest
  recurring join from a full network shuffle into a local merge — the
  single biggest lever for a recurring fact⋈fact pipeline.
- **salted skew join**: a hot key floods one reducer in a plain shuffle
  join; salting splits each key into S sub-keys (big side: deterministic
  hash-salt per row; small side: replicated ×S) so the hot key spreads
  over S tasks.  AQE's skew-join split handles moderate skew at runtime;
  explicit salting is the deliberate form that also works for aggregations
  and for engines/stages AQE cannot re-plan.

Both queries return plain aggregates so the DuckDB oracle hash-checks that
the rewired physical plan did not change the answer.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.functions.numeric import dec
from etl_pipeline_aws_spark.registry import query

N_BUCKETS = 8
SALT = 8


def _sf_tag(sf_dir: str) -> str:
    return re.sub(r"[^0-9a-zA-Z]", "_", os.path.basename(sf_dir.rstrip("/")))


def _write_bucketed(spark: SparkSession, df: DataFrame, table: str, key: str) -> None:
    """Idempotent bucketed-table write.  The warehouse directory outlives
    the session while the in-memory catalog does not, so a fresh session
    must clear a stale location before re-creating the table."""
    if spark.catalog.tableExists(table):
        return
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(warehouse, table), ignore_errors=True)
    df.write.bucketBy(N_BUCKETS, key).sortBy(key).mode("overwrite").saveAsTable(table)


@query(
    "bucketed_join_colocated",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem with both sides bucketed+sorted by the join key.

    The write is the one-time layout investment (at 100 TB: the curated
    zone's table format); every subsequent join on o_orderkey is then
    exchange-free — .explain shows SortMergeJoin over two bucketed scans
    with no Exchange, verified in tests/test_plans.py.  hint("merge")
    pins SMJ so the demo stays bucketed even where broadcast would win
    at toy scale."""
    tag = _sf_tag(sf_dir)
    t_orders, t_li = f"b_orders_{tag}", f"b_lineitem_{tag}"
    _write_bucketed(spark, load_table(spark, sf_dir, "orders"), t_orders, "o_orderkey")
    _write_bucketed(spark, load_table(spark, sf_dir, "lineitem"), t_li, "l_orderkey")
    o = spark.table(t_orders)
    li = spark.table(t_li).hint("merge")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


@query(
    "salted_skew_join",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events ⋈ customer with an explicit 8-way salt.

    Big side: salt = xxhash64(event_id) mod 8 — deterministic, no RNG, so
    the same row always lands in the same sub-key (re-runnable, and the
    driver hash is stable).  Small side: replicated ×8 via explode.  The
    shuffle then distributes each hot user_id over 8 reducers.  The salt
    columns never leave the join — the aggregate proves the rewrite is
    answer-preserving."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT)).cast("int")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1))))
        .withColumn("salt", F.col("salt").cast("int"))
        # pin a shuffle join: at toy scale Catalyst would broadcast the
        # replicated dim (the correct call when the dim fits — salting only
        # matters once both sides must shuffle)
        .hint("merge")
    )
    return (
        ev.join(cust, (ev.user_id == cust.c_custkey) & (ev.salt == cust.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value", 4)).cast("double").alias("sum_value"),
        )
    )


@query(
    "bucket_pruning_scan",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_custkey IN (37, 412, 911)
    GROUP BY o_custkey
    """,
)
def bucket_pruning_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket PRUNING — the read-side payoff of bucketed layout beyond
    exchange-free joins: an IN filter on the bucket key lets the scan
    read ONLY the buckets those keys hash to, skipping the other files
    entirely (the plan's FileScan reports ``SelectedBucketsCount: k out
    of N`` — asserted by the plan test).  At 100 TB this is a point
    lookup reading <=3/8ths of one table instead of all of it; with more
    buckets the fraction shrinks accordingly — the poor man's index
    every lakehouse bucketed layout carries for free.

    The aggregation GROUPS BY the bucket key deliberately: bucketing
    then also satisfies the aggregation's required distribution, so the
    planner keeps the bucketed scan (a keyless aggregate lets it fall
    back to an unbucketed scan, discarding pruning — the observed
    behavior that shaped this query) AND elides the exchange: the plan
    is scan -> partial agg -> final agg with NO shuffle.

    The oracle runs the same filter over the unbucketed source parquet,
    so layout cannot change semantics — only which bytes are read."""
    table = f"orders_bucketed_{_sf_tag(sf_dir)}"
    _write_bucketed(
        spark, load_table(spark, sf_dir, "orders"), table, "o_custkey"
    )
    o = spark.table(table).filter(F.col("o_custkey").isin(37, 412, 911))
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )
