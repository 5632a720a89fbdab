"""Targeted invariants for the round-3 operator additions — properties the
row-hash oracle comparison cannot express as drift guards (conservation
laws, bound constraints, emission-set shape).  The oracle sweep in
test_oracle_queries.py already value-checks every one of these queries;
these tests pin the SEMANTIC invariants so a future edit that changes both
sides of an oracle in the same wrong way still fails loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_aws_spark.llm.corpus import OUTLIER_TOP_K
from etl_pipeline_aws_spark.operators.analytics import (
    LINEAR_ATTR_PPM,
    events_attribution_linear,
)
from etl_pipeline_aws_spark.operators.basket import market_basket_rules
from etl_pipeline_aws_spark.llm.corpus import embedding_outlier_detection
from etl_pipeline_aws_spark.operators.events import events_concurrent_sessions
from etl_pipeline_aws_spark.catalog import load_table
from tests.conftest import SF_DIR


def test_linear_attribution_conserves_credit(spark):
    """Total credit across all rows (incl. the '(none)' bucket) must be
    exactly n_purchases x PPM — the integer remainder-to-earliest split
    exists precisely to make this an equality, not an approximation."""
    out = events_attribution_linear(spark, SF_DIR)
    total = out.agg(F.sum("credit_ppm")).collect()[0][0]
    n_purchases = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert total == n_purchases * LINEAR_ATTR_PPM


def test_time_decay_attribution_conserves_credit(spark):
    """Same conservation law for the time-decay model, over ATTRIBUTED
    purchases (it has no '(none)' bucket): total credit = PPM x the
    number of purchases with at least one prior-7-day touch."""
    from etl_pipeline_aws_spark.operators.analytics import (
        events_attribution_time_decay,
    )

    out = events_attribution_time_decay(spark, SF_DIR)
    total = out.agg(F.sum("credit_ppm")).collect()[0][0]
    ev = load_table(spark, SF_DIR, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"), "event_id"
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("tu"), F.col("ts").alias("tts")
    )
    attributed = (
        p.join(
            t,
            (F.col("pu") == F.col("tu"))
            & (F.col("tts") < F.col("pts"))
            & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 7 DAYS")),
            "left_semi",
        )
        .count()
    )
    assert total == attributed * LINEAR_ATTR_PPM


def test_market_basket_confidence_and_lift_bounds(spark):
    """confidence is a probability (0 < conf_bp <= 10000); pair support
    never exceeds either item support; rules come in mirrored pairs
    (a->b exists iff b->a exists, same pair_n)."""
    rules = market_basket_rules(spark, SF_DIR).cache()
    bad = rules.filter(
        (F.col("conf_bp") <= 0)
        | (F.col("conf_bp") > 10000)
        | (F.col("pair_n") > F.col("sup_ante"))
        | (F.col("pair_n") > F.col("sup_cons"))
    ).count()
    assert bad == 0
    fwd = rules.select("antecedent", "consequent", "pair_n")
    rev = rules.select(
        F.col("consequent").alias("antecedent"),
        F.col("antecedent").alias("consequent"),
        F.col("pair_n").alias("rev_pair_n"),
    )
    mismatched = (
        fwd.join(rev, ["antecedent", "consequent"], "full_outer")
        .filter(
            F.col("pair_n").isNull()
            | F.col("rev_pair_n").isNull()
            | (F.col("pair_n") != F.col("rev_pair_n"))
        )
        .count()
    )
    assert mismatched == 0


def test_embedding_outliers_exactly_topk_per_label(spark):
    """Every label reports exactly OUTLIER_TOP_K rows with ranks 1..k."""
    out = embedding_outlier_detection(spark, SF_DIR)
    per = out.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx"), F.min("rank").alias("mn")
    )
    bad = per.filter(
        (F.col("n") != OUTLIER_TOP_K) | (F.col("mx") != OUTLIER_TOP_K) | (F.col("mn") != 1)
    ).count()
    assert bad == 0


def test_concurrency_never_below_one_on_active_days(spark):
    """Every day that has at least one event reports max_concurrent >= 1,
    and no day exceeds its own event count plus the PREVIOUS day's (every
    open interval was opened by an event today or carried over midnight
    by an event yesterday — intervals last 30 minutes, so nothing older
    can reach today)."""
    from pyspark.sql.window import Window

    conc = events_concurrent_sessions(spark, SF_DIR)
    daily = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn(
            "prev_n", F.coalesce(F.lag("n_events").over(Window.orderBy("day")), F.lit(0))
        )
    )
    joined = conc.join(daily, "day", "full_outer")
    bad = joined.filter(
        F.col("max_concurrent").isNull()
        | (F.col("max_concurrent") < 1)
        | (F.col("max_concurrent") > F.col("n_events") + F.col("prev_n"))
    ).count()
    assert bad == 0
