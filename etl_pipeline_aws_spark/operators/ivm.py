"""Incremental view maintenance (IVM): fold a delta batch into a
materialized aggregate WITHOUT touching the base data again.

The 100 TB argument is the whole point: a daily-refresh revenue rollup
over a 100 TB fact table must not rescan history for each new day.  An
aggregate view whose measures are all *self-maintainable* (SUM / COUNT —
associative, commutative, exact under decimal arithmetic) can be
maintained as

    V(base ∪ delta) = merge_by_key( V(base), V(delta) )

so the per-refresh cost is O(|delta|) + one merge on the (tiny) group-key
domain.  MIN/MAX are deliberately absent — they are NOT self-maintainable
under deletes and would force the rescan this operator exists to avoid
(same reasoning as the continuous-aggregate merge in analytics.py, which
proves the time-bucketed variant; this one proves the join-view variant:
the delta must be re-joined to its dimensions before folding).

Oracle: the DuckDB side computes the view directly over the full base —
the driver's value-hash certifies merge(V(base), V(delta)) ≡ V(full),
i.e., the maintenance path produces bit-identical state to a recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.functions.numeric import dsum
from etl_pipeline_aws_spark.registry import query

_IVM_ORACLE = """
    SELECT n.n_name AS nation,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
"""


def _nation_revenue_view(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """The maintained view body: revenue-by-nation with exact decimal
    partials.  Applied identically to the base load and to each delta
    batch — one definition, two call sites, so base and delta can never
    drift semantically."""
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # keep the partial as exact decimal (NOT double) so the merge
            # step's re-sum stays exact; only the merged total surfaces
            # as double
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_partial"),
        )
    )


@query("ivm_incremental_agg_join", oracle=_IVM_ORACLE)
def ivm_incremental_agg_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain revenue-by-nation incrementally: base = 90% of orders
    (o_orderkey % 10 != 0), delta = the arriving 10%.  Each side runs the
    SAME view definition; the merge re-aggregates the union of the two
    partial states on the group key — COUNT partials add, exact-decimal
    SUM partials add, so merged state ≡ full recompute (what the oracle
    checks).

    Scale shape: the base-side V(base) would be a stored table in
    production (cost already paid); the per-refresh work is delta ⋈ dims
    (broadcast) + a group-key-domain merge — no base rescan, no
    fact-table shuffle.  Here both sides are computed live only because
    the harness is stateless across queries."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    base = _nation_revenue_view(
        orders.filter(F.col("o_orderkey") % 10 != 0), customer, nation
    )
    delta = _nation_revenue_view(
        orders.filter(F.col("o_orderkey") % 10 == 0), customer, nation
    )

    return (
        base.unionByName(delta)
        .groupBy("nation")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("rev_partial").cast("double").alias("revenue"),
        )
    )


_IVM_RETRACTION_ORACLE = """
    WITH post AS (
        SELECT o_custkey,
               CASE WHEN o_orderkey % 10 = 0
                    THEN CAST(o_totalprice AS DECIMAL(18,2))
                         * CAST(1.1 AS DECIMAL(4,1))
                    ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2))
                              AS DECIMAL(19,3)) END AS price
        FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS revenue
    FROM post o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
"""


@query("ivm_retraction_zset", oracle=_IVM_RETRACTION_ORACLE)
def ivm_retraction_zset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM under DELETES and UPDATES — the Z-set (DBSP / differential
    dataflow) formulation: every changelog row carries an integer weight
    (+1 insert, −1 retraction), an update is a retract+insert pair, and
    because SUM/COUNT are LINEAR, the view applies to the weighted
    changelog exactly as to the base — contributions just multiply by
    the weight.  This is the piece ivm_incremental_agg_join (insert-only
    self-maintenance) deliberately left out.

    Scenario from the fixture, fully deterministic: orders with key%7==0
    are cancelled (weight −1), surviving orders with key%10==0 are
    repriced ×1.1 (one −1 row at the old price, one +1 at the new; the
    factor is an exact decimal multiply).  Maintained state = V(base) +
    Σ w·contribution, merged on the group key.  The oracle recomputes
    the view directly over the post-change order set — the value hash
    certifies maintenance ≡ recompute, bit-exact, under retractions.

    Scale: the changelog fold is O(|delta| join dims) + a group-key-
    domain merge, never a base rescan — and the weighted form composes:
    cascaded views propagate (row, weight) pairs, which is how a DBSP
    pipeline maintains multi-stage dataflows over a 100 TB base.
    MIN/MAX remain excluded (not linear; deletes would force rescans)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    price = F.col("o_totalprice").cast("decimal(18,2)")
    new_price = price * F.lit("1.1").cast("decimal(4,1)")

    base = orders.select("o_custkey", price.alias("p"), F.lit(1).alias("w"))
    cancels = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_custkey", price.alias("p"), F.lit(-1).alias("w")
    )
    repriced = orders.filter(
        (F.col("o_orderkey") % 7 != 0) & (F.col("o_orderkey") % 10 == 0)
    )
    retract_old = repriced.select("o_custkey", price.alias("p"), F.lit(-1).alias("w"))
    insert_new = repriced.select(
        "o_custkey", new_price.alias("p"), F.lit(1).alias("w")
    )

    def weighted_view(rows: DataFrame) -> DataFrame:
        return (
            rows.join(customer, rows.o_custkey == customer.c_custkey)
            .join(nation, customer.c_nationkey == nation.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"))
            .agg(
                F.sum("w").alias("n_partial"),
                F.sum(F.col("p").cast("decimal(19,3)") * F.col("w")).alias(
                    "rev_partial"
                ),
            )
        )

    state = weighted_view(base)  # stored view state in production
    delta = weighted_view(cancels.unionByName(retract_old).unionByName(insert_new))
    return (
        state.unionByName(delta)
        .groupBy("nation")
        .agg(
            F.sum("n_partial").cast("long").alias("n_orders"),
            F.sum("rev_partial").cast("double").alias("revenue"),
        )
    )


_IVM_DISTINCT_ORACLE = """
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS distinct_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY CAST(o_orderdate AS DATE)
"""


@query("ivm_incremental_distinct", oracle=_IVM_DISTINCT_ORACLE)
def ivm_incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM for COUNT(DISTINCT) — the aggregate the module docstring
    calls out as NOT self-maintainable: distinct counts can't merge as
    scalars (|A ∪ B| ≠ |A| + |B|), so the classical fix is AUXILIARY
    STATE one level finer than the view — a per-(group, value)
    multiplicity table, which IS self-maintainable (multiplicities
    add), with the view derived as COUNT(*) per group over it.

    This operator runs that maintenance loop for real: the base epoch
    (orders through the median date, a discrete pick) builds state_0;
    the delta epoch folds in as merge-by-(day, customer) adding
    multiplicities; the view reads COUNT(*) per day from the merged
    state.  The oracle recomputes COUNT(DISTINCT) over the full table —
    the driver hash certifies maintenance ≡ recompute exactly, the IVM
    contract.  (Deletes decrement multiplicity and drop rows at zero —
    the retraction path ivm_retraction_zset proves on Z-sets.)

    Scale: per-refresh cost is O(|delta|) + a (day, customer)-keyed
    merge of state partials — never a rescan of history; state size is
    the view's distinct domain, the irreducible price of exact distinct
    (the HLL rollup is the sketch tier when ±2% is acceptable)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day"), "o_custkey"
    )
    cut = F.broadcast(
        o.agg(
            F.date_from_unix_date(
                F.expr(
                    "percentile_disc(0.5) WITHIN GROUP (ORDER BY unix_date(day))"
                ).cast("int")
            ).alias("c")
        )
    )
    with_cut = o.crossJoin(cut)
    state0 = (
        with_cut.filter(F.col("day") <= F.col("c"))
        .groupBy("day", "o_custkey")
        .agg(F.count(F.lit(1)).alias("mult"))
    )
    delta = (
        with_cut.filter(F.col("day") > F.col("c"))
        .groupBy("day", "o_custkey")
        .agg(F.count(F.lit(1)).alias("mult"))
    )
    merged = (
        state0.unionByName(delta)
        .groupBy("day", "o_custkey")
        .agg(F.sum("mult").alias("mult"))
    )
    return merged.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("distinct_customers"),
        F.sum("mult").cast("long").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# ivm_delta_join — JOIN-view maintenance via the delta algebra
# --------------------------------------------------------------------------

_IVM_DELTA_JOIN_ORACLE = """
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@query("ivm_delta_join", oracle=_IVM_DELTA_JOIN_ORACLE)
def ivm_delta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-view maintenance by the delta algebra:
    Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB — the identity
    every incremental materialization engine implements when BOTH join
    sides receive new rows (the agg variant, ivm_incremental_agg_join,
    only deltas one side).  Base = 90% of orders x 6/7 of customers;
    deltas = the arriving complements; the maintained view is the union
    of the stored base join and the THREE delta terms, and the oracle's
    direct full join certifies the algebra produces bit-identical rows
    (surfaced as the per-segment count/revenue fold so the compared
    result stays bounded).

    Scale: the three delta terms each join a DELTA (small) side — at
    100 TB, ΔA ⋈ B_old is the only term touching stored data and it is
    key-bucketed (no base rescan, no fact shuffle: the stored side's
    bucketing is the access path); ΔA ⋈ ΔB is delta x delta.  The
    stored base ⋈ base term is the already-paid state — computed live
    here only because the harness is stateless across queries (the
    ivm_incremental_agg_join caveat).

    Exactness: revenue partials fold as exact decimals per term; only
    the merged total surfaces as double."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    base_o = orders.filter(F.col("o_orderkey") % 10 != 0)
    delta_o = orders.filter(F.col("o_orderkey") % 10 == 0)
    base_c = customer.filter(F.col("c_custkey") % 7 != 0)
    delta_c = customer.filter(F.col("c_custkey") % 7 == 0)

    def term(o: DataFrame, c: DataFrame) -> DataFrame:
        return o.join(c, o.o_custkey == c.c_custkey).select(
            "c_mktsegment", "o_totalprice"
        )

    maintained = (
        term(base_o, base_c)
        .unionByName(term(delta_o, base_c))
        .unionByName(term(base_o, delta_c))
        .unionByName(term(delta_o, delta_c))
    )
    return maintained.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        dsum("o_totalprice").alias("revenue"),
    )
