"""Every oracle-checked query in the registry is verified against DuckDB at
sf0.01 — the same check the driver runs for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

import etl_pipeline_aws_spark as engine
from tests.conftest import SF_DIR
from tests.oracle import compare, duckdb_con


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
    compare(fn(spark, SF_DIR), con, sql)


def test_all_queries_run_rows_only(spark):
    """Queries without oracles must still run and return a DataFrame."""
    oracles = engine.oracle_sql()
    for name, fn in engine.queries().items():
        if name in oracles:
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
