"""Query registry: the driver-contract backbone.

Every operator the engine claims (SURVEY.md §2) registers here as a named
callable ``(spark, sf_dir) -> DataFrame`` plus — whenever SQL-expressible — a
DuckDB oracle SQL string computing the same result on the same tables.  The
driver compares the two at sf=0.01 by row-count + schema + order-insensitive
value hash, so:

- every computed column is aliased identically on both sides;
- double aggregates go through exact decimal arithmetic (see
  ``functions.numeric``) so Spark's and DuckDB's summation order cannot
  produce differing last-ulp doubles;
- DuckDB integer sums are cast to BIGINT (DuckDB widens SUM(int) to HUGEINT,
  Spark keeps LongType).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str | Callable[[], str]] = {}


def query(name: str, oracle: str | Callable[[], str]) -> Callable[[QueryFn], QueryFn]:
    """Register an oracle-checked query.

    ``oracle`` is usually a literal SQL string.  It may instead be a
    zero-arg callable returning the SQL — resolved freshly on every
    ``oracle_sql()`` call — for the few oracles that must embed an
    environment-dependent constant (DuckDB table-function paths cannot
    reference views, so source_file_lineage/source_binaryfile_scan
    template their scan path from the gate sf_dir at resolution time)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        _ORACLES[name] = oracle
        return fn

    return deco


def rows_only_query(name: str) -> Callable[[QueryFn], QueryFn]:
    """Register a query with no SQL-expressible oracle (streaming state,
    probabilistic LSH, binary round-trips) — driver records rows-only."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {k: (v() if callable(v) else v) for k, v in _ORACLES.items()}


_LOADED = False


def _load_all() -> None:
    """Import every operator module exactly once so decorators run."""
    global _LOADED
    if _LOADED:
        return
    # Imports deferred to avoid import cycles (operators import `query`).
    from etl_pipeline_aws_spark.operators import (  # noqa: F401
        aggregates,
        analytics,
        asof,
        basket,
        events,
        features,
        flagships,
        graph,
        ivm,
        joins,
        maps_arrays,
        merge,
        observability,
        quality,
        recursive,
        relational_ext,
        scalars,
        scale,
        setops,
        sql_features,
        statistics,
        timeseries,
        tpch_suite,
        udf_surface,
        windows,
    )
    from etl_pipeline_aws_spark.llm import (  # noqa: F401
        corpus,
        dedup,
        multimodal,
        similarity,
        text,
    )
    from etl_pipeline_aws_spark.streaming import stream_queries  # noqa: F401
    from etl_pipeline_aws_spark.sources import source_queries  # noqa: F401

    _LOADED = True
