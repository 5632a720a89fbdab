"""Tolerance checks for the approx/order-sensitive aggregates that cannot be
value-hashed against DuckDB (SURVEY.md §7 risk notes)."""

from __future__ import annotations

import etl_pipeline_aws_spark as engine
from tests.conftest import SF_DIR


def test_approx_count_distinct_within_2pct(spark):
    rows = engine.queries()["agg_approx_distinct"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        err = abs(r.approx_parts - r.exact_parts) / max(1, r.exact_parts)
        assert err < 0.02, (r.l_returnflag, r.approx_parts, r.exact_parts)


def test_percentile_approx_in_envelope(spark):
    qs = engine.queries()
    approx = {
        r.l_returnflag: r.approx_median_price
        for r in qs["agg_percentile_approx"](spark, SF_DIR).collect()
    }
    import duckdb

    con = duckdb.connect()
    envelope = con.sql(
        f"""SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.45) AS lo,
                   quantile_cont(l_extendedprice, 0.55) AS hi
            FROM read_parquet('{SF_DIR}/lineitem.parquet') GROUP BY 1"""
    ).fetchall()
    for flag, lo, hi in envelope:
        assert lo <= approx[flag] <= hi, (flag, lo, approx[flag], hi)


def test_builtin_moments_close_to_exact_formula(spark):
    qs = engine.queries()
    built = {r.l_returnflag: r for r in qs["agg_builtin_moments"](spark, SF_DIR).collect()}
    exact = {r.l_returnflag: r for r in qs["agg_variance_stats"](spark, SF_DIR).collect()}
    for flag, e in exact.items():
        b = built[flag]
        assert abs(b.var_qty - e.var_qty) <= 1e-6 * max(1.0, abs(e.var_qty))
