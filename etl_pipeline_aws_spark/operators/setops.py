"""Sorts / limits / set operations (SURVEY.md §2.B "Sorts / limits / set
ops"): order-by-limit top-k, union all/distinct, intersect, except,
distinct / deduplication.

Determinism: any LIMIT is preceded by a total order ending in a unique key;
subset-dedup is expressed as groupBy+min instead of dropDuplicates([cols])
(which keeps an arbitrary row — fine operationally, unverifiable against an
oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.registry import query


@query(
    "order_by_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def order_by_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — each partition
    keeps its local top-100, the driver merges; no global sort even at
    100 TB.  Tie-break on the unique o_orderkey keeps the row set stable."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@query(
    "sort_multi_key",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal
    FROM supplier
    ORDER BY s_nationkey ASC, s_acctbal DESC NULLS LAST, s_suppkey
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null placement.  (The driver compares
    order-insensitively; the sort itself is the declared operator and feeds
    deterministic downstream limits.)"""
    supp = load_table(spark, sf_dir, "supplier")
    return supp.orderBy(
        F.col("s_nationkey").asc(),
        F.col("s_acctbal").desc_nulls_last(),
        F.col("s_suppkey"),
    ).select("s_suppkey", "s_nationkey", "s_acctbal")


@query(
    "union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union via unionByName — column-name-resolved, the only safe
    union in a wide pipeline (positional union silently miswires)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return cust.unionByName(supp)


@query(
    "union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.unionByName(supp).distinct()


@query(
    "intersect_keys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having both open and finished orders (INTERSECT is
    set-semantics: dedup built in)."""
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    done_c = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return open_c.intersect(done_c)


@query(
    "except_keys",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders via EXCEPT (set difference) — semantically
    the anti-join in joins.py, expressed as a set op."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return cust.subtract(orders)


@query(
    "except_all",
    oracle="""
    SELECT l_orderkey AS orderkey FROM lineitem WHERE l_linenumber <= 2
    EXCEPT ALL
    SELECT l_orderkey AS orderkey FROM lineitem WHERE l_linenumber = 1
    """,
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): keeps multiplicity — one surviving
    copy per order with ≥2 lines here."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") <= 2).select(F.col("l_orderkey").alias("orderkey"))
    b = li.filter(F.col("l_linenumber") == 1).select(F.col("l_orderkey").alias("orderkey"))
    return a.exceptAll(b)


@query(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "dedup_by_key_deterministic",
    oracle="""
    SELECT o_custkey,
           MIN(o_orderkey) AS keeper_orderkey,
           COUNT(*) AS n_dups
    FROM orders
    GROUP BY o_custkey
    """,
)
def dedup_by_key_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-subset dedup, deterministic form: dropDuplicates(["o_custkey"])
    keeps an *arbitrary* row per key (fine for pipelines, untestable against
    an oracle); groupBy+min pins which row survives."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.min("o_orderkey").alias("keeper_orderkey"),
        F.count(F.lit(1)).alias("n_dups"),
    )


@query(
    "order_by_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def order_by_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: page 3 of the price-ranked orders (LIMIT 20 OFFSET 40,
    deterministic via the key tiebreak).  Spark plans offset+limit as a
    single top-(offset+limit) global selection then drops the prefix —
    still no full sort; the 100 TB caveat is that OFFSET cost grows with
    page depth (every page re-selects the whole prefix), so deep
    pagination should switch to keyset pagination (WHERE key > last_seen
    ORDER BY ... LIMIT n — expressible with the same operators)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(40)
        .limit(20)
    )


@query(
    "union_missing_columns",
    oracle="""
    SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-reconciling union (``unionByName(allowMissingColumns=True)``):
    two feeds project DIFFERENT column subsets and the union fills each
    side's missing columns with NULL by NAME — the everyday shape of
    merging source generations without hand-aligning positional
    schemas (positional union would silently mis-bind columns here).
    Pure narrow concatenation: no shuffle at any scale."""
    o = load_table(spark, sf_dir, "orders")
    evens = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    odds = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderpriority"
    )
    return evens.unionByName(odds, allowMissingColumns=True)


@query(
    "intersect_all",
    oracle="""
    SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_partkey AS partkey FROM lineitem WHERE l_linestatus = 'F'
    """,
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL) — keeps min(multiplicity)
    copies per value, completing the bag-semantics pair with except_all:
    a part returned 3 times and finalized 2 times survives twice.  Spark
    plans it as a left-semi-style hash aggregate with per-key counters —
    one shuffle on the value, multiplicities never materialize as
    row duplication beyond the answer itself."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(F.col("l_partkey").alias("partkey"))
    b = li.filter(F.col("l_linestatus") == "F").select(F.col("l_partkey").alias("partkey"))
    return a.intersectAll(b)


@query(
    "reshape_pivot_unpivot_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def reshape_pivot_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot then unpivot is the identity on the non-null cells — the
    reshape-closure property that makes wide/long conversion safe to
    round-trip (report tables pivot wide for humans, melt back long for
    the warehouse).  The query pivots order counts to one column per
    status, unpivots them back with the values-columns form, drops the
    NULL cells unpivot materializes for absent combinations, and must
    value-hash against the plain long-form aggregate it started from.

    Pivot here runs with EXPLICIT pivot values (the three statuses) —
    at 100 TB the implicit form is an extra distinct-scan job to
    discover them; declaring them keeps the reshape single-pass.

    Scale: one (priority, status) aggregation; pivot/unpivot are
    projections over the tiny grouped table."""
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    long = wide.unpivot(
        ["o_orderpriority"],
        ["F", "O", "P"],
        "o_orderstatus",
        "n_orders",
    )
    return long.filter(F.col("n_orders").isNotNull()).select(
        "o_orderpriority",
        "o_orderstatus",
        F.col("n_orders").cast("long").alias("n_orders"),
    )
