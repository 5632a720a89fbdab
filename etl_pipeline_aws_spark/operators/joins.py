"""Join operators (SURVEY.md §2.B "Joins"): inner/outer/semi/anti equi
joins, explicit broadcast, theta (non-equi), cross, and multi-join chains.

The reference has NO joins (SURVEY.md §2.A observation: map-only pipeline);
this is the declared engine surface.  Physical strategy is Catalyst's call —
the code only *hints*:

- ``F.broadcast(dim)`` on the star-schema dimension tables (region 5 rows,
  nation 25, supplier ~1k·sf) so a 100 TB fact scan never shuffles for a
  dimension lookup;
- everything else stays declarative so AQE can switch sort-merge ↔
  broadcast at runtime and split skewed partitions
  (``spark.sql.adaptive.skewJoin``, on in session.py).

Scale notes per operator are in the docstrings — the test for each plan is
``.explain("formatted")`` showing BroadcastHashJoin for dim joins and no
unnecessary Exchange (see tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.functions.numeric import dec, dsum
from etl_pipeline_aws_spark.registry import query


@query(
    "join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi join orders⋈customer. At scale: both sides hash-shuffle on
    the key unless customer fits the broadcast threshold — AQE decides."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer keeps customers with zero orders (COUNT ignores the null
    side; SUM coalesced to 0 so both engines agree on the empty group)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0)).cast("double").alias("total_spend"),
        )
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer — the mirror of join_left_outer with the fact table on
    the left, proving ``how="right"`` preserves the dimension side.  Same
    aggregate contract (COUNT ignores nulls, SUM coalesced to 0)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "right")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0)).cast("double").alias("total_spend"),
        )
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey
    FROM customer c FULL OUTER JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL OR o.o_orderkey IS NULL OR c.c_custkey % 100 = 0
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer: unmatched rows on either side survive as NULLs (the
    filter keeps the result small but retains every unmatched row)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "full")
        .filter(
            F.col("c_custkey").isNull()
            | F.col("o_orderkey").isNull()
            | (F.col("c_custkey") % 100 == 0)
        )
        .select("c_custkey", "o_orderkey")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi = EXISTS: no row multiplication, right side only probed.
    At scale this is the cheapest existence check — no payload shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti = NOT EXISTS: customers who never ordered."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dim lookup with explicit broadcast hints: at 100 TB the
    customer scan streams map-side through two BroadcastHashJoins — zero
    shuffle until the final aggregation (verified in tests/test_plans.py)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("sum_acctbal"),
        )
    )


@query(
    "join_theta",
    oracle="""
    SELECT n.n_name AS nation_name, s.s_suppkey, c.c_custkey
    FROM supplier s
    JOIN customer c ON s.s_nationkey = c.c_nationkey
                   AND s.s_acctbal > c.c_acctbal
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE c.c_custkey % 10 = 0
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key (nationkey) + range predicate (acctbal).  The
    equi component keeps it a hash join with a residual filter — NOT a
    nested-loop — which is the scale-safe way to write range predicates."""
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        supp.join(
            cust,
            (supp.s_nationkey == cust.c_nationkey) & (supp.s_acctbal > cust.c_acctbal),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select(F.col("n_name").alias("nation_name"), "s_suppkey", "c_custkey")
    )


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — only ever sane between tiny dims (5×25 here);
    Catalyst plans BroadcastNestedLoopJoin."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@query(
    "join_chain_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
               AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'AMERICA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def join_chain_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style multi-join chain: fact⋈fact shuffle join on orderkey,
    dims broadcast, filters pushed to the scans.  The region filter prunes
    through two broadcast joins before the fact shuffle — Catalyst pushes
    ``r_name='AMERICA'`` into the 5-row region scan, shrinking the nation
    broadcast and the customer probe."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    )
    one = F.lit(1).cast("decimal(18,4)")
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount", 4)))
            .cast("double")
            .alias("revenue")
        )
    )


RANGE_BIN_US = 600_000_000  # 10-minute bins, microseconds


@query(
    "range_join_binned",
    oracle="""
    WITH incidents AS (
        SELECT event_id AS incident_id, ts AS w_start,
               ts + INTERVAL '10 minutes' AS w_end
        FROM events WHERE event_type = 'error'
    )
    SELECT i.incident_id, e.event_id, e.event_type
    FROM incidents i JOIN events e
      ON e.ts >= i.w_start AND e.ts < i.w_end
    """,
)
def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (NO equi key: which events fall inside any error
    incident's 10-minute window) executed as an EQUI join via time
    binning — the standard rewrite that turns Spark's worst join shape
    (nested-loop over every pair) into a shuffle join.

    Each incident interval is exploded onto the 10-minute bins it covers
    (≤ 2 bins, since interval length == bin width); each event maps to
    exactly ONE bin, so the bin equi-join meets every qualifying pair
    exactly once (no post-join dedup) and the range predicate survives
    only as a cheap residual.  Cost: O(events + 2·incidents) shuffled on
    a dense time key — at 100 TB this is the difference between a
    broadcast-nested-loop that cannot run and a plain shuffle join.  Bin
    width is the tuning dial: ~interval length ⇒ replication ≤ 2×.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    events = ev.select("event_id", "event_type", "ts", F.floor(us / RANGE_BIN_US).alias("bin"))
    incidents = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("ts").alias("w_start"),
            (F.unix_micros(F.col("ts")) + F.lit(RANGE_BIN_US)).alias("end_us"),
        )
        .select(
            "incident_id",
            "w_start",
            F.timestamp_micros(F.col("end_us")).alias("w_end"),
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col("w_start")) / RANGE_BIN_US),
                    F.floor((F.col("end_us") - 1) / RANGE_BIN_US),
                )
            ).alias("bin"),
        )
    )
    return (
        incidents.join(events, "bin")
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .select("incident_id", "event_id", "event_type")
    )


BLOOM_BUCKETS = 1 << 20  # membership-set resolution: FP rate ~ n_keys / 2^20


@query(
    "join_bloom_pruned",
    oracle="""
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via an explicit Bloom-style runtime filter: the
    probe side (lineitem) is pre-pruned by a broadcast membership set
    built from the filtered build side's keys BEFORE the exact join.

    The membership set is ``distinct(xxhash64(key) mod 2^20)`` — a 1-hash
    Bloom filter expressed in pure DataFrame ops (Spark's native
    ``bloom_filter_agg`` is not in the public function registry).  It is
    conservative by construction: every true key's bucket is present, so
    the follow-up exact join sees every qualifying row, and false
    positives — ~n_keys/2^20 of the probe — are eliminated there.  The
    result is therefore byte-identical to the plain join the oracle runs.

    Why it matters at 100 TB: the selective orders filter leaves ~2% of
    keys; shipping their bucket set (a few MB broadcast, vs the full key
    set's GBs) lets the lineitem scan drop ~98% of rows before the
    shuffle that dominates the plain plan.  Spark's own runtime bloom
    filtering (spark.sql.optimizer.runtime.bloomFilter) does this within
    one query when statistics cooperate; the explicit form survives
    cross-job boundaries — persist the bucket set once, prune many
    downstream scans."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
    )
    buckets = F.broadcast(
        orders.select(
            F.pmod(F.xxhash64("o_orderkey"), F.lit(BLOOM_BUCKETS)).alias("bucket")
        ).distinct()
    )
    pruned = li.withColumn(
        "bucket", F.pmod(F.xxhash64("l_orderkey"), F.lit(BLOOM_BUCKETS))
    ).join(buckets, "bucket")  # bloom membership test; keeps all true keys
    return (
        pruned.join(orders, pruned.l_orderkey == orders.o_orderkey)  # exact: kills FPs
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )


@query(
    "join_exists_flag",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           EXISTS (SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_orderpriority = '1-URGENT') AS has_urgent
    FROM customer c
    """,
)
def join_exists_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mark join — existence as a COLUMN rather than a filter (the shape
    optimizers compile `EXISTS(...)` in a SELECT list to): every customer
    row survives, annotated with whether an urgent order exists.

    Spark has no exposed mark-join operator, so the rewrite is the
    standard one: distinct build-side keys left-joined with a presence
    flag, `coalesce(flag, false)` as the mark.  Distinct-then-join keeps
    the probe row count unchanged (no fan-out from multi-order
    customers) and the build side is keys-only — at 100 TB this is a
    key-sized shuffle annotating a full fact scan, strictly cheaper
    than the semi+anti union formulation which scans the probe twice."""
    cust = load_table(spark, sf_dir, "customer")
    urgent_keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("_mark", F.lit(True))
    )
    return cust.join(urgent_keys, "c_custkey", "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce("_mark", F.lit(False)).alias("has_urgent"),
    )


@query(
    "fuzzy_entity_pairs",
    oracle="""
    SELECT a.s_suppkey AS key_a, b.s_suppkey AS key_b,
           CAST(levenshtein(a.s_name, b.s_name) AS INT) AS edit_dist
    FROM supplier a JOIN supplier b
      ON length(a.s_name) = length(b.s_name)
     AND a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 2
    """,
)
def fuzzy_entity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy matching: supplier-name pairs within edit
    distance 2 — the master-data dedup every warehouse eventually needs
    ("Acme Corp" vs "Acme Corp.").  Shape: BLOCK on a cheap equi key
    (name length here; length-band + first-token for free-text names),
    then the quadratic ``levenshtein`` runs only within blocks as a
    join residual.

    The blocking-key equi join is what keeps this off the nested-loop
    path (asserted by the registry sweep): candidate generation is a
    hash join, and block sizes bound the quadratic work.  Uniform
    fixture names collapse to one block — harmless on a dimension
    table, and the 100 TB discipline is unchanged: entity tables are
    dims; fact-scale fuzzy matching graduates to the MinHash-LSH
    pipeline (llm/dedup.py), which is this same block-then-verify idea
    with probabilistic blocks."""
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", F.length("s_name").alias("name_len")
    )
    a, b = sup.alias("a"), sup.alias("b")
    return (
        a.join(
            b,
            (F.col("a.name_len") == F.col("b.name_len"))
            & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
        )
        .withColumn(  # single named expression; Catalyst may still inline
            # it into filter AND project — actual dedup comes from codegen
            # subexpression elimination, the alias just makes that possible
            "edit_dist", F.levenshtein(F.col("a.s_name"), F.col("b.s_name"))
        )
        .filter(F.col("edit_dist") <= 2)
        .select(
            F.col("a.s_suppkey").alias("key_a"),
            F.col("b.s_suppkey").alias("key_b"),
            "edit_dist",
        )
    )


@query(
    "join_null_safe",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey
    FROM (SELECT c_custkey,
                 CASE WHEN c_custkey % 50 = 0 THEN NULL
                      ELSE c_custkey % 10 END AS bucket
          FROM customer) c
    JOIN (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 50 = 0 THEN NULL
                      ELSE o_orderkey % 10 END AS bucket
          FROM orders WHERE o_orderkey <= 1000) o
      ON c.bucket IS NOT DISTINCT FROM o.bucket
    WHERE c.c_custkey <= 100
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of vanishing — the semantics dimension
    reconciliation needs when "unknown" is itself a joinable category.
    Still a hash join (the null-safe comparator hashes NULL as a
    regular key), so unlike the `OR (a IS NULL AND b IS NULL)`
    formulation it never degenerates to a nested loop.  The 100 TB
    caveat is the flip side: all NULLs land in ONE hash bucket, so a
    mostly-null key needs the salting recipe like any other hot key."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 50 == 0, F.lit(None))
            .otherwise(F.col("c_custkey") % 10)
            .alias("bucket"),
        )
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 50 == 0, F.lit(None))
            .otherwise(F.col("o_orderkey") % 10)
            .alias("bucket"),
        )
    )
    return cust.join(orders, cust.bucket.eqNullSafe(orders.bucket)).select(
        "c_custkey", "o_orderkey"
    )


@query(
    "range_join_varlen_binned",
    oracle="""
    WITH incidents AS (
        SELECT event_id AS incident_id, ts AS w_start,
               ts + (5 + ABS(CAST(FLOOR(value) AS BIGINT) % 56))
                        * INTERVAL '1 minute' AS w_end
        FROM events WHERE event_type = 'error'
    )
    SELECT i.incident_id, e.event_id
    FROM incidents i JOIN events e
      ON e.ts >= i.w_start AND e.ts < i.w_end
    """,
)
def range_join_varlen_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GENERAL binned range join: incident windows of VARIABLE length
    (5-60 minutes, derived from the event's value) joined to the events
    they cover — range_join_binned's rewrite without its
    interval==bin-width crutch.  Each incident explodes onto every
    10-minute bin its span touches (≤ ceil(len/bin)+1, so replication
    is bounded by the LONGEST window, not the table); each probe event
    owns exactly one bin, so every qualifying pair meets exactly once —
    no dedup pass — and the true range predicate survives as a cheap
    residual on the equi join.  This is the rewrite that covers any
    interval workload (sessions, outages, promotions) with one shuffle
    on a dense time key."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    events = ev.select(
        "event_id", "ts", F.floor(us / RANGE_BIN_US).alias("bin")
    )
    dur_us = (
        F.lit(5) + F.abs(F.floor(F.col("value")).cast("long") % 56)
    ) * F.lit(60_000_000)
    incidents = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("ts").alias("w_start"),
            (F.unix_micros(F.col("ts")) + dur_us).alias("end_us"),
        )
        .select(
            "incident_id",
            "w_start",
            F.timestamp_micros(F.col("end_us")).alias("w_end"),
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col("w_start")) / RANGE_BIN_US),
                    F.floor((F.col("end_us") - 1) / RANGE_BIN_US),
                )
            ).alias("bin"),
        )
    )
    return (
        incidents.join(events, "bin")
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .select("incident_id", "event_id")
    )
