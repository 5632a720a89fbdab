"""Every oracle-checked query in the registry is verified against DuckDB at
sf0.01 — the same check the driver runs for CORRECTNESS_r{N}.json — and
held to a wall-time budget so a future driver sample can't time out on a
query no test ever timed."""

from __future__ import annotations

import time

import pytest

import etl_pipeline_aws_spark as engine
from tests.conftest import SF_DIR
from tests.oracle import compare, duckdb_con

# Per-query ceiling at sf0.01 on the test session (local[8]).  The slowest
# healthy query (asof_join_merge, full check incl. DuckDB oracle + hash)
# runs ~10 s; 30 s is 3x headroom before a query counts as a scale defect
# rather than noise.  This is the insurance for the registry entries the
# driver hasn't sampled yet: every query has at least one timed, green run.
QUERY_BUDGET_S = 30.0


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR)
    yield c
    c.close()


def _oracle_names():
    return sorted(engine.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, con, name):
    engine.clear_caches(spark)  # builder persists don't leak across the sweep
    fn = engine.queries()[name]
    sql = engine.oracle_sql()[name]
    t0 = time.monotonic()
    compare(fn(spark, SF_DIR), con, sql)
    elapsed = time.monotonic() - t0
    assert elapsed < QUERY_BUDGET_S, f"{name} took {elapsed:.1f}s (budget {QUERY_BUDGET_S}s)"


def test_all_queries_run_rows_only(spark):
    """Queries without oracles must still run, return a DataFrame, and meet
    the same wall-time budget as the oracle-checked set."""
    oracles = engine.oracle_sql()
    over_budget = []
    for name, fn in engine.queries().items():
        if name in oracles:
            continue
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
        elapsed = time.monotonic() - t0
        if elapsed >= QUERY_BUDGET_S:
            over_budget.append((name, round(elapsed, 1)))
    assert not over_budget, over_budget
