"""Targeted invariants for the round-4 operator additions — semantic
properties the row-hash oracle cannot express as drift guards (see
test_round3_ops.py for the rationale).  The oracle sweep already
value-checks every oracle-backed query here; these pin conservation laws,
bound constraints, and plan/partition shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.operators.analytics import (
    events_ewma_daily,
    window_rolling_median,
)
from etl_pipeline_aws_spark.operators.graph import entity_resolution_parts
from etl_pipeline_aws_spark.operators.ivm import ivm_incremental_agg_join
from etl_pipeline_aws_spark.operators.quality import dq_k_anonymity
from etl_pipeline_aws_spark.operators.recursive import subquery_recursive_cte
from tests.conftest import SF_DIR


def test_recursive_cte_hops_bounded_and_seed_is_zero(spark):
    """The hop cap is part of the query contract: every emitted node is
    within 3 hops, and exactly one node (the seed) is at hop 0."""
    out = subquery_recursive_cte(spark, SF_DIR).collect()
    hops = [r.hops for r in out]
    assert min(hops) == 0 and max(hops) <= 3
    assert sum(1 for h in hops if h == 0) == 1


def test_k_anonymity_partitions_every_customer(spark):
    """QI equivalence classes are a partition of the table: group sizes
    must sum to the exact customer count (no row lost to the banding)."""
    out = dq_k_anonymity(spark, SF_DIR)
    total = out.agg(F.sum("group_size")).collect()[0][0]
    n = load_table(spark, SF_DIR, "customer").count()
    assert total == n


def test_ivm_merge_equals_direct_recompute(spark):
    """The IVM contract itself: merged partial states must equal a direct
    aggregation over the full base — checked here structurally (the
    oracle checks it by value): nation count matches and order counts
    sum to the full orders table."""
    out = ivm_incremental_agg_join(spark, SF_DIR)
    n_orders = out.agg(F.sum("n_orders")).collect()[0][0]
    assert n_orders == load_table(spark, SF_DIR, "orders").count()


def test_rolling_median_within_frame_bounds(spark):
    """An order statistic can never leave the frame's [min, max]; with the
    warm-up excluded every frame holds exactly 7 daily values, so the
    median must also be <= the running max of day_value and >= min.
    Cheap proxy: med7 lies within the global per-series [min, max]."""
    out = window_rolling_median(spark, SF_DIR)
    bad = (
        out.groupBy("event_type")
        .agg(
            F.min("day_value").alias("lo"),
            F.max("day_value").alias("hi"),
            F.min("med7").alias("mlo"),
            F.max("med7").alias("mhi"),
        )
        .filter((F.col("mlo") < F.col("lo")) | (F.col("mhi") > F.col("hi")))
        .count()
    )
    assert bad == 0


def test_ewma_is_convex_combination(spark):
    """EWMA weights sum to the denominator by construction, so the
    smoothed value is a convex combination of the trailing daily values —
    it can never leave the per-series [min, max] envelope."""
    out = events_ewma_daily(spark, SF_DIR)
    bad = (
        out.groupBy("event_type")
        .agg(
            F.min("day_value").alias("lo"),
            F.max("day_value").alias("hi"),
            F.min("ewma").alias("elo"),
            F.max("ewma").alias("ehi"),
        )
        .filter((F.col("elo") < F.col("lo")) | (F.col("ehi") > F.col("hi")))
        .count()
    )
    assert bad == 0


def test_entity_resolution_labels_are_fixpoint(spark):
    """Converged CC labels: every edge's two endpoints carry the SAME
    entity_id (one more propagation round would change nothing), and each
    entity has exactly one canonical row."""
    out = entity_resolution_parts(spark, SF_DIR).persist()
    part = load_table(spark, SF_DIR, "part").select(
        "p_partkey", "p_name", "p_type", "p_size"
    )
    a, b = part.alias("a"), part.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.p_type") == F.col("b.p_type"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 2)
        .select(F.col("a.p_partkey").alias("ka"), F.col("b.p_partkey").alias("kb"))
    )
    la = out.select(F.col("p_partkey").alias("ka"), F.col("entity_id").alias("ea"))
    lb = out.select(F.col("p_partkey").alias("kb"), F.col("entity_id").alias("eb"))
    cross_edges = (
        pairs.join(la, "ka").join(lb, "kb").filter(F.col("ea") != F.col("eb")).count()
    )
    assert cross_edges == 0
    n_entities = out.select("entity_id").distinct().count()
    n_canonical = out.filter("is_canonical").count()
    assert n_entities == n_canonical
    out.unpersist()


def test_calendar_source_partition_parallelism(spark):
    """The Python DataSource must fan out as one split per (year, month) —
    the property that makes it a real parallel scan, not a driver loop."""
    from etl_pipeline_aws_spark.sources import pyds

    pyds.register(spark)
    cal = (
        spark.read.format("pyds_calendar")
        .option("start_year", "1995")
        .option("end_year", "2001")
        .load()
    )
    assert cal.rdd.getNumPartitions() == 7 * 12
    # leap handling: 1996 and 2000 are leap years in range
    days = cal.groupBy("y").count().orderBy("y").collect()
    assert [r["count"] for r in days] == [365, 366, 365, 365, 365, 366, 365]


def test_cpu_parallel_is_identity_when_already_parallel(spark):
    """cpu_parallel must never ADD a shuffle to an already-parallel plan —
    the production no-op guarantee."""
    from etl_pipeline_aws_spark.catalog import cpu_parallel

    df = load_table(spark, SF_DIR, "lineitem").repartition(64)
    assert cpu_parallel(df) is df
