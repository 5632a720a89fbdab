"""Iterative graph computation over relational data — PageRank on the
part co-occurrence graph (parts appearing in the same order are
neighbors).  Complements the connected-components keeper assignment
(llm/dedup.py) with a WEIGHTED iterative propagation: CC proves label
convergence; this proves fixed-point numeric iteration, the shape of
embedding-propagation / influence jobs.

Determinism discipline: ranks are kept in scaled INTEGER arithmetic
(start 1e6, damping 17/20, floor division per edge), so every engine
computes bit-identical values — float PageRank sums doubles in
engine-specific orders and can never hash-match an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.registry import query

PR_ITERATIONS = 5
PR_START = 1_000_000  # scaled initial rank
PR_TELEPORT = 150_000  # (1 - 0.85) * PR_START


def _pagerank_oracle() -> str:
    """Unrolled 5-iteration integer PageRank as chained CTEs."""
    sql = """
    WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), edges AS (
        SELECT pa AS u, pb AS v FROM pairs
        UNION ALL
        SELECT pb AS u, pa AS v FROM pairs
    ), deg AS (
        SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY u
    ), r0 AS (
        SELECT u AS node, CAST(1000000 AS BIGINT) AS rank_val FROM deg
    )"""
    prev = "r0"
    for i in range(1, PR_ITERATIONS + 1):
        sql += f""", r{i} AS (
        SELECT e.v AS node,
               CAST(150000 + SUM((r.rank_val * 17) // (20 * dg.d)) AS BIGINT)
                   AS rank_val
        FROM {prev} r
        JOIN deg dg ON r.node = dg.u
        JOIN edges e ON e.u = r.node
        GROUP BY e.v
    )"""
        prev = f"r{i}"
    return sql + f"\n    SELECT node, rank_val FROM {prev}"


@query("graph_pagerank_parts", oracle=_pagerank_oracle())
def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 fixed iterations, damping 0.85 as the exact ratio
    17/20 in scaled-integer arithmetic) over the part co-occurrence
    graph: nodes are parts, an undirected edge links parts that share
    an order.

    Edge construction is the bounded self-join (orders hold <= 7 lines,
    so fan-out per order is <= 21 pairs — same boundedness argument as
    q21's collect_set); each iteration is one join against the edge
    list and one sum-by-destination — the canonical message-passing
    round, shuffling on the node key every time.  At 100 TB both edges
    and ranks would be pre-bucketed on the node key, making every
    round's joins exchange-free and leaving the aggregation as the only
    shuffle; iteration count is fixed, so the driver loop only builds
    the plan (no per-round actions).  Dangling-mass redistribution is
    deliberately omitted (every node of this graph has out-edges by
    construction: edges are symmetric)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .distinct()
    )
    edges = pairs.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        pairs.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed("u", "du")
    out_edges = edges.withColumnRenamed("u", "eu")
    ranks = deg.select(F.col("du").alias("node"), F.lit(PR_START).cast("long").alias("rank_val"))
    for _ in range(PR_ITERATIONS):
        contrib = (
            ranks.join(deg, F.col("node") == F.col("du"))
            .join(out_edges, F.col("node") == F.col("eu"))
            .select(
                F.col("v").alias("node"),
                F.expr("(rank_val * 17) div (20 * d)").alias("c"),
            )
        )
        ranks = contrib.groupBy("node").agg(
            (F.lit(PR_TELEPORT) + F.sum("c")).cast("long").alias("rank_val")
        )
    return ranks
