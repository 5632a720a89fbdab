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


def test_twap_lies_within_daily_value_range(spark):
    """TWAP is a convex combination of the day's observed values (step
    weights are non-negative and sum to the denominator), so it must lie
    within each series-day's [min, max] raw value envelope."""
    from etl_pipeline_aws_spark.operators.events import events_twap_daily

    out = events_twap_daily(spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events")
    env = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    eps = 1e-9  # one double division at the end; envelope check needs slack
    bad = (
        out.join(env, ["event_type", "day"])
        .filter(
            (F.col("twap") < F.col("lo") - eps) | (F.col("twap") > F.col("hi") + eps)
        )
        .count()
    )
    assert bad == 0


def test_dynamic_gap_sessions_nest_within_fixed_30min(spark):
    """Shrinking one event type's gap can only SPLIT sessions, never merge
    them: the dynamic-gap session count per user must be >= the fixed
    30-minute session count (clicks time out faster, nothing times out
    slower)."""
    from etl_pipeline_aws_spark.operators.events import (
        window_session,
        window_session_dynamic_gap,
    )

    dyn = window_session_dynamic_gap(spark, SF_DIR).groupBy("user_id").count()
    fixed = window_session(spark, SF_DIR).groupBy("user_id").count()
    bad = (
        dyn.withColumnRenamed("count", "n_dyn")
        .join(fixed.withColumnRenamed("count", "n_fixed"), "user_id")
        .filter(F.col("n_dyn") < F.col("n_fixed"))
        .count()
    )
    assert bad == 0


def test_paragraph_dedup_recrawl_detects_full_duplication(spark):
    """Plant a full duplicate corpus (shifted ids): every chunk then
    appears in >= 2 docs, so every doc with >= 1 chunk must report 100%
    duplication and drop_doc = true — the detector's sensitivity floor."""
    from etl_pipeline_aws_spark.llm.dedup import CHUNK_TOKENS

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    ws = F.split("text", " ")
    chunk_hashes = F.when(
        F.size(ws) >= CHUNK_TOKENS,
        F.transform(
            F.sequence(F.lit(0), (F.size(ws) / CHUNK_TOKENS).cast("int") - 1),
            lambda i: F.sha2(
                F.concat_ws(" ", F.slice(ws, i * CHUNK_TOKENS + 1, CHUNK_TOKENS)), 256
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    chunks = corpus.select("doc_id", F.explode(chunk_hashes).alias("h"))
    dup = (
        chunks.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    n_chunks = chunks.count()
    n_dup = chunks.join(dup, "h").count()
    assert n_chunks > 0 and n_dup == n_chunks


def test_benford_shares_sum_to_about_one_million(spark):
    """ppm shares floor-divide, so they sum to <= 1,000,000 and no lower
    than 1,000,000 - 9 (one ulp of floor per digit class)."""
    from etl_pipeline_aws_spark.operators.quality import dq_benford_digits

    total = dq_benford_digits(spark, SF_DIR).agg(F.sum("share_ppm")).collect()[0][0]
    assert 1_000_000 - 9 <= total <= 1_000_000


def test_consistent_sample_preserves_parent_child_ratio(spark):
    """Cluster sampling's defining property: every sampled order carries
    ALL its lineitems, so the per-order average line count in the sample
    equals the exact per-order count computed from the full lineitem
    table restricted to sampled keys."""
    from etl_pipeline_aws_spark.operators.relational_ext import (
        sample_consistent_join,
    )

    out = sample_consistent_join(spark, SF_DIR)
    sampled_lines = out.agg(F.sum("n_lineitems")).collect()[0][0]
    li = load_table(spark, SF_DIR, "lineitem")
    expect = li.filter((F.col("l_orderkey") * 2654435761) % 100 < 10).count()
    assert sampled_lines == expect
