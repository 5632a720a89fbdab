"""Tolerance checks for the approx/order-sensitive aggregates that cannot be
value-hashed against DuckDB (SURVEY.md §7 risk notes)."""

from __future__ import annotations

import etl_pipeline_aws_spark as engine
from tests.conftest import SF_DIR


def test_approx_count_distinct_within_2pct(spark):
    """The error-bound claim the oracle asserts must genuinely hold (the
    query computes it from the sketch vs the exact twin)."""
    rows = engine.queries()["agg_approx_distinct"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.within_2pct, (r.l_returnflag, r.exact_parts)


def test_percentile_approx_within_1pct(spark):
    rows = engine.queries()["agg_percentile_approx"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.within_1pct, r.l_returnflag


def test_builtin_moments_close_to_exact_formula(spark):
    qs = engine.queries()
    built = {r.l_returnflag: r for r in qs["agg_builtin_moments"](spark, SF_DIR).collect()}
    exact = {r.l_returnflag: r for r in qs["agg_variance_stats"](spark, SF_DIR).collect()}
    for flag, e in exact.items():
        b = built[flag]
        assert abs(b.var_qty - e.var_qty) <= 1e-6 * max(1.0, abs(e.var_qty))
