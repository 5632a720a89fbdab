"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``etl_pipeline_aws_spark``: the engine's query registry
(one entry per SURVEY.md §2 operator, each with a DuckDB oracle twin where
SQL-expressible) backs ``queries()`` / ``oracle_sql()``; ``entry`` runs the
flagship pricing-summary query on sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import etl_pipeline_aws_spark as engine


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = engine.queries()
    return qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return engine.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checked query; keys absent here
    (but present in queries()) are non-SQL-expressible → rows-only check."""
    return engine.oracle_sql()
