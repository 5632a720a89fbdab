"""Tolerance checks for the approx/order-sensitive aggregates that cannot be
value-hashed against DuckDB (SURVEY.md §7 risk notes)."""

from __future__ import annotations

import etl_pipeline_aws_spark as engine
from tests.conftest import SF_DIR


def test_approx_count_distinct_within_2pct(spark):
    """The error-bound claim the oracle asserts must genuinely hold (the
    query computes it from the sketch vs the exact twin)."""
    rows = engine.all_queries()["agg_approx_distinct"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.within_2pct, (r.l_returnflag, r.exact_parts)


def test_percentile_approx_within_1pct(spark):
    rows = engine.all_queries()["agg_percentile_approx"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.within_1pct, r.l_returnflag


def test_builtin_moments_close_to_exact_formula(spark):
    qs = engine.all_queries()
    built = {r.l_returnflag: r for r in qs["agg_builtin_moments"](spark, SF_DIR).collect()}
    exact = {r.l_returnflag: r for r in qs["agg_variance_stats"](spark, SF_DIR).collect()}
    for flag, e in exact.items():
        b = built[flag]
        assert abs(b.var_qty - e.var_qty) <= 1e-6 * max(1.0, abs(e.var_qty))


def test_hll_sliding_distinct_within_5pct(spark):
    """Every day's trailing-7-day sketch-union estimate must be within 5%
    of the exact trailing distinct count."""
    import etl_pipeline_aws_spark as engine
    from pyspark.sql import functions as F

    from etl_pipeline_aws_spark.catalog import load_table
    from tests.conftest import SF_DIR

    approx = {
        r.anchor_day: r.approx_trailing_users
        for r in engine.all_queries()["agg_hll_sliding_distinct"](spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events").select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "user_id"
    )
    days = ev.select(F.col("day").alias("anchor_day")).distinct()
    exact = {
        r.anchor_day: r.n
        for r in days.join(
            ev,
            (F.col("day") <= F.col("anchor_day"))
            & (F.col("day") >= F.date_sub(F.col("anchor_day"), 6)),
        )
        .groupBy("anchor_day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for day, est in approx.items():
        assert abs(est - exact[day]) <= 0.05 * exact[day], (day, est, exact[day])
