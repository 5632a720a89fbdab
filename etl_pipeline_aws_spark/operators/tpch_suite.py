"""TPC-H-shape flagship suite adapted to the driver's star schema.

The reference has no analytics queries at all (SURVEY.md §2.A — its one
transform is a map-only enrichment, glue/job.py:27-34); these queries are
the north-star warehouse workload the new engine must carry at 100 TB.
Q1/Q3/Q10 shapes live in scalars.py / flagships.py; this module adds the
rest of the classic shapes that the driver's columns can express
(FIXTURES.md §B — no partsupp/shipmode/commitdate, so Q2/Q9/Q12/Q16/Q22
are adapted and documented as such; Q2/Q16 derive the partsupp relation
from lineitem's distinct (partkey, suppkey) pairs).

Scale posture shared by all queries here:
- dimension chain (region→nation→supplier/customer) is broadcast — never
  a shuffle at any SF;
- fact joins (orders⋈lineitem) shuffle on the join key and AQE picks the
  physical strategy at runtime;
- date/brand/segment filters sit directly on the scans so Parquet
  row-group min-max skipping applies before any join;
- every aggregate goes through exact decimal arithmetic
  (functions/numeric.py) so results hash-match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.functions.numeric import dec
from etl_pipeline_aws_spark.registry import query

# exact-decimal revenue term, mirrored verbatim in every oracle below
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
)


def _rev() -> F.Column:
    one = F.lit(1).cast("decimal(18,4)")
    return dec("l_extendedprice") * (one - dec("l_discount", 4))


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (EXISTS → left-semi): orders with at least one line shipped
    >60 days after the order date, counted by priority.  The semi join is
    an equi join on l_orderkey with a non-equi residual — stays a hash/SMJ
    join, never a nested loop."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue from intra-nation commerce (customer and supplier
    share a nation) within one region-year.  region→nation→supplier is a
    broadcast chain; the c_nationkey = s_nationkey residual rides on the
    l_suppkey equi join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    # supplier scales with SF (10k rows/SF) — no static broadcast hint;
    # AQE converts from measured sizes when genuinely small.
    supp = load_table(spark, sf_dir, "supplier")
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    reg = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure scan-filter-aggregate, zero joins and zero shuffles
    beyond the single-row final combine.  All four predicates reach the
    Parquet scan (PushedFilters) — at 100 TB this is the query that proves
    row-group skipping on l_shipdate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(dec("l_extendedprice") * dec("l_discount", 4))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations by year.  The
    two nation dims are broadcast under distinct aliases; the OR-pair
    filter lands after both broadcasts so Catalyst can still push the
    single-nation IN-list down each side."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    pair = ("NATION_1", "NATION_2")
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(
            F.col("n_nationkey").alias("s_natkey"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(
            F.col("n_nationkey").alias("c_natkey"), F.col("n_name").alias("cust_nation")
        )
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("s_natkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_natkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH all_nations AS (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               {_REV_SQL} AS volume,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one supplier-nation's share of a region's spend on one
    part type, by year.  Numerator and denominator are each exact decimal
    sums; the final ratio divides the same two doubles on both engines."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    )
    reg = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_natkey"), F.col("n_name").alias("supp_nation")
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    vol = _rev()
    return (
        part.join(li, part.p_partkey == li.l_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, cust.c_nationkey == n1.n_nationkey)
        .join(reg, n1.n_regionkey == reg.r_regionkey)
        .join(n2, supp.s_nationkey == F.col("s_natkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_profit_by_nation_year",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS sum_profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type = 'STANDARD'
    GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    ORDER BY 1, 2 DESC
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape adapted: the driver schema has no partsupp/ps_supplycost
    (FIXTURES.md §B), so profit reduces to discounted revenue per
    supplier-nation per order-year over the same 5-way join tree."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        part.join(li, part.p_partkey == li.l_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("vol"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("vol").cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q12_ship_latency_priority",
    oracle="""
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                THEN 'late' ELSE 'ontime' END AS latency_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY latency_bucket
    ORDER BY latency_bucket
    """,
)
def q12_ship_latency_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape adapted: no l_shipmode column (FIXTURES.md §B), so lines
    are bucketed by ship latency (>90 days after order = late) and counted
    by order-priority class — same conditional-count-over-join pattern."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .withColumn(
            "latency_bucket",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                F.lit("late"),
            ).otherwise(F.lit("ontime")),
        )
        .groupBy("latency_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("latency_bucket")
    )


@query(
    "q14_promo_effect",
    oracle=f"""
    SELECT CAST(100 AS DOUBLE)
           * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-03-01'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo parts' share of two months' revenue.  part is
    broadcast; the date filter prunes lineitem row groups before the
    join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-03-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0).cast("decimal(18,2)")
    vol = _rev()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100).cast("double")
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(vol).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) with the maximum quarterly revenue.  The
    per-supplier revenue aggregate is computed once and self-compared via
    a broadcast single-row max — no second scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(
            F.broadcast(max_rev),
            F.col("total_revenue") == F.col("max_revenue"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(7 AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < 0.5 * (
          SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape (correlated scalar subquery): revenue from orders of less
    than half a part's average quantity.  Decorrelated by hand: lineitem is
    first semi-restricted to the brand's parts (a per-key average is
    unchanged by restricting the key set), THEN averaged per part and
    re-joined.  Both branches shuffle on l_partkey, so the aggregate and
    the re-join reuse one partitioning; nothing scale-dependent is ever
    broadcast — at 100 TB the per-part aggregate is |part|-sized."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    ).select("p_partkey")
    li_brand = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # exact-decimal avg so the 0.5*avg threshold is bit-identical to DuckDB
    part_avg = li_brand.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias(
            "avg_qty"
        )
    )
    return (
        li_brand.join(part_avg, li_brand.l_partkey == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7).cast("double"))
            .alias("avg_yearly")
        )
    )


@query(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape (IN → left-semi on an aggregate): orders whose total
    quantity exceeds 250 (≈ 99th percentile), with their customers.  The
    HAVING aggregate reuses the lineitem shuffle partitioning; the semi
    join keys match the main join keys so AQE coalesces them."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(big, orders.o_orderkey == F.col("big_orderkey"), "left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunction of brand/size/quantity windows.  The join
    stays a broadcast-hash equi join on p_partkey with the OR predicate as
    a post-join filter — never a nested loop over the disjunction."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty, brand, size = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    pred = (
        ((brand == "Brand#1") & size.between(1, 15) & qty.between(1, 20))
        | ((brand == "Brand#2") & size.between(10, 30) & qty.between(10, 30))
        | ((brand == "Brand#3") & size.between(20, 50) & qty.between(20, 40))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q22_sales_opportunity",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(c_acctbal)
        FROM customer WHERE c_acctbal > 0
    )
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape adapted (no c_phone column → group by nation): rich
    customers who never ordered.  The global-average scalar broadcasts as
    a single-row cross join; NOT EXISTS is a left-anti join against the
    distinct order custkeys."""
    cust = load_table(spark, sf_dir, "customer")
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias(
                "avg_bal"
            )
        )
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("n_name")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape (customer order-count distribution): left outer join with
    an ON-clause residual on the *inner* side, then two stacked
    aggregations.  Adapted: no ``o_comment`` column in the fixture schema
    (FIXTURES.md §B), so the classic ``NOT LIKE '%special%requests%'``
    residual becomes ``o_orderpriority <> '1-URGENT'``.

    Scale posture: a residual on the preserved-row side's *partner* of a
    left join is equivalent to pre-filtering that partner, so the filter
    sits on the orders scan (row-group skipping) instead of in the join.
    First agg shuffles on c_custkey; second agg's input is one row per
    customer with tiny cardinality in c_count, so its shuffle is a few
    bytes after map-side partial aggregation."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q21_suppliers_kept_waiting",
    oracle="""
    WITH lm AS (
        SELECT l_orderkey, l_suppkey,
               l_shipdate > o_orderdate + INTERVAL 75 DAY AS is_late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lm l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE l1.is_late
      AND n_name LIKE 'NATION_1%'
      AND EXISTS (SELECT 1 FROM lm l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lm l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.is_late)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (suppliers who kept orders waiting): the sole-blame
    predicate over the fact table.  Adapted: the fixture schema has no
    l_commitdate/l_receiptdate (FIXTURES.md §B), so "late" becomes
    ``l_shipdate > o_orderdate + 75 days``, and the single-nation filter
    becomes the NATION_1% prefix (names are synthetic NATION_<k>).

    The oracle keeps the textbook EXISTS / NOT EXISTS self-join pair; the
    Spark side deliberately rewrites it.  Planned naively (semi + anti
    self-joins, as first implemented here), Spark scans and shuffles
    lineitem THREE times — the l2/l3 branches cannot reuse l1's exchange
    because their pruned column sets differ.  The sole-blame predicate is
    order-local, so one window pass over the same l_orderkey partitioning
    the orders⋈lineitem join already established computes it with ONE fact
    scan and ONE fact shuffle: a late line of supplier s is blamed iff its
    order has ≥2 distinct suppliers and exactly one distinct *late*
    supplier (which must then be s).  Orders per key are bounded (≤7
    lines), so the collect_set window state is O(1) per order.
    supplier/nation broadcast; the semi/anti self-join shape itself is
    exercised by q4 / q22 / subquery_exists_correlated."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lm = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS")
        ).alias("is_late"),
    )
    w = Window.partitionBy("l_orderkey")
    blamed = (
        lm.withColumn("n_supps", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supps",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(
            F.col("is_late")
            & (F.col("n_supps") >= 2)
            & (F.col("n_late_supps") == 1)
        )
    )
    supp = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        blamed.join(supp, blamed.l_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .filter(F.col("n_name").like("NATION_1%"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@query(
    "q11_important_parts",
    oracle=f"""
    WITH nat_supp AS (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
    ), val AS (
        SELECT l_partkey, SUM({_REV_SQL}) AS val_dec
        FROM lineitem JOIN nat_supp ON l_suppkey = s_suppkey
        GROUP BY l_partkey
    )
    SELECT p_partkey, p_name, CAST(val_dec AS DOUBLE) AS value
    FROM val JOIN part ON p_partkey = l_partkey
    WHERE CAST(val_dec AS DOUBLE)
          > 0.0007 * (SELECT CAST(SUM(val_dec) AS DOUBLE) FROM val)
    ORDER BY value DESC, p_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (important stock positions), adapted: the driver schema
    has no partsupp (FIXTURES.md §B), so "position value" is the shipped
    revenue per part from NATION_3's suppliers, kept when it exceeds
    0.07% of that nation's total — the classic group-agg vs
    global-scalar-threshold pattern (reference has no analytics at all;
    capability class from glue/job.py:27-34 generalized).

    Scale posture: the per-part aggregate is a diamond — it feeds both
    the threshold filter and the global total.  Catalyst/AQE does NOT
    reuse the exchange here (verified empirically at sf0.01: the two
    structurally-identical shuffle subtrees canonicalize apart once the
    branches prune different aggregate outputs, so the fact scan ran
    twice), so ``val`` is explicitly persisted: one lineitem scan, and
    the cached |parts|-sized aggregate (a few GB at 100 TB vs a 100 TB
    rescan) serves both branches.  The total is then a one-row broadcast
    via cross join — never a single-partition window over the fact
    table.  Both sides stay exact decimal until the final double cast,
    so the threshold comparison is bit-identical vs the oracle."""
    nat = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("val_dec"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    total = val.agg(F.sum("val_dec").cast("double").alias("total"))
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("val_dec").cast("double") > F.lit(0.0007) * F.col("total"))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "p_partkey",
            "p_name",
            F.col("val_dec").cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


@query(
    "q20_dominant_supplier",
    oracle="""
    WITH sy AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%bolt'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey
    ), pt AS (
        SELECT l_partkey, l_suppkey, qty,
               SUM(qty) OVER (PARTITION BY l_partkey) AS total_qty
        FROM sy
    )
    SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS n_parts_dominated
    FROM pt JOIN supplier ON s_suppkey = l_suppkey
    WHERE CAST(qty AS DOUBLE) > 0.5 * CAST(total_qty AS DOUBLE)
    GROUP BY s_suppkey, s_name
    ORDER BY s_name
    """,
)
def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (potential part promotion), adapted: no partsupp availqty
    (FIXTURES.md §B), so the 50% threshold is against the part's total
    1996 shipped quantity — suppliers who shipped the majority of a
    bolt-named part's volume that year.

    Scale posture: part-name filter broadcasts into the lineitem scan
    (2k parts → broadcast-hash, predicate before the shuffle); the
    per-(part,supplier) aggregate is the only key shuffle; the part-level
    total is a window over that aggregate's output — one repartition of
    the *aggregated* rows (|parts×supps|, not |lineitem|) instead of a
    second groupBy + self-join.  Dominance compares exact decimals cast
    to double, identical on both engines."""
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    sy = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = sy.withColumn("total_qty", F.sum("qty").over(w)).filter(
        F.col("qty").cast("double") > F.lit(0.5) * F.col("total_qty").cast("double")
    )
    supp = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        dominant.join(supp, dominant.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_parts_dominated"))
        .orderBy("s_name")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        -- unit cost in exact integer milli-units: cents*1000 // qty-cents
        -- (decimal division rounds at engine-specific scales; integer
        -- division is bit-identical everywhere)
        SELECT l_partkey, l_suppkey,
               MIN(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 100000
                   // CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS supplycost_milli
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
           CAST(ps.supplycost_milli AS BIGINT) AS supplycost_milli
    FROM part p
    JOIN ps ON ps.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15 AND r.r_name = 'AMERICA'
      AND ps.supplycost_milli = (
          SELECT MIN(ps2.supplycost_milli)
          FROM ps ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
          WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'AMERICA'
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (minimum-cost supplier), adapted: no partsupp table
    (FIXTURES.md §B), so the part-supplier relation and its supplycost are
    derived from lineitem — distinct (partkey, suppkey) pairs with
    min unit price (extendedprice/quantity, exact decimal division) as
    the cost.  The correlated min-cost-per-part subquery is
    hand-decorrelated into a window min over the region-filtered
    candidates — one pass instead of a rejoin (the q17 discipline).

    Scale posture: region/nation/supplier dim chain broadcasts; the only
    fact shuffle is the per-(part,supplier) aggregate; the window min
    rides the same (partkey) partitioning AQE already produced."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    sup = load_table(spark, sf_dir, "supplier")
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    reg = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    )
    # unit cost in exact integer milli-units (cents*1000 div qty-cents):
    # decimal DIVISION rounds at engine-specific scales, integer division
    # is bit-identical everywhere (mirrored in the oracle's // expression)
    price_cents = (dec("l_extendedprice") * 100).cast("long")
    qty_cents = (dec("l_quantity") * 100).cast("long")
    cost_milli = ((price_cents * 100000) - (price_cents * 100000) % qty_cents) / qty_cents
    ps = (
        li.select(
            "l_partkey",
            "l_suppkey",
            cost_milli.cast("long").alias("cost_milli"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("cost_milli").alias("supplycost_milli"))
    )
    cand = (
        ps.join(sup, ps.l_suppkey == sup.s_suppkey)
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_cost", F.min("supplycost_milli").over(w))
        .filter(F.col("supplycost_milli") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            "supplycost_milli",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q16_parts_supplier_relationship",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (5, 15, 25, 35, 45)
      AND ps.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (parts/supplier relationship), adapted: the partsupp
    relation is the distinct (partkey, suppkey) projection of lineitem,
    and the excluded-supplier predicate ("customer complaints") becomes
    negative account balance.  NOT IN on a non-nullable key compiles to
    a left-anti join against the (tiny, broadcast) excluded set.

    Scale posture: the distinct pair projection is the only fact shuffle
    (and map-side combines first); part filters push to the scan; the
    final COUNT(DISTINCT supp) per brand/type/size group re-uses the
    pair-level distinctness."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 15, 25, 35, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
