"""Modern SQL-surface features (Spark 3.4–4.x): pipe syntax, GROUP BY
ALL, IDENTIFIER() binding, and lateral column aliases.

These are ergonomics features, not new physics — each compiles to the
same Catalyst plan as its classic form (asserted by the oracles, which
run the classic form on DuckDB).  They register because "a user of the
reference could switch and run every query they run today" includes the
query STYLE a modern SQL user writes; an engine that rejects the syntax
fails the user even when it has the semantics.

Complements recursive.py (WITH RECURSIVE, BEGIN/END scripting) and
relational_ext.sql_parameterized (typed named parameters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_aws_spark.catalog import register_views
from etl_pipeline_aws_spark.registry import query

_PIPE_ORACLE = """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
"""


@query("sql_pipe_syntax", oracle=_PIPE_ORACLE)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (SPARK-49555, Spark 4.0): the query reads as its
    dataflow — FROM |> WHERE |> AGGREGATE — the linear style DataFrame
    users already think in, now in SQL.  Catalyst compiles it to the
    identical plan as the classic SELECT (what the oracle runs), so
    adopting the style costs nothing at any scale."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                         AS revenue
           GROUP BY o_orderpriority
        """
    )


_GROUP_ALL_ORACLE = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
"""


@query("sql_group_by_all", oracle=_GROUP_ALL_ORACLE)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL: every non-aggregate select item becomes a grouping
    key — kills the add-a-column-forget-the-group-by bug class in wide
    rollups.  DuckDB pioneered the shorthand; the oracle spells the keys
    out, proving the inference picked exactly the right set."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        GROUP BY ALL
        """
    )


_IDENTIFIER_ORACLE = """
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
"""


@query("sql_identifier_binding", oracle=_IDENTIFIER_ORACLE)
def sql_identifier_binding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() clause (Spark 3.5): bind a TABLE/COLUMN name from a
    parameter without string-splicing SQL — the injection-safe half of
    templated maintenance jobs ("run this audit over ${table}"), pairing
    with sql_parameterized which binds VALUES.  The name resolves at
    parse time, so the plan is identical to writing the name literally."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_customers
        FROM IDENTIFIER(:tbl) JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """,
        args={"tbl": "customer"},
    )


_LATERAL_ALIAS_ORACLE = """
    SELECT o_orderkey,
           o_totalprice * 0.9 AS discounted,
           (o_totalprice * 0.9) * (o_totalprice * 0.9) AS discounted_sq
    FROM orders
    WHERE o_orderkey < 1000
"""


@query("sql_lateral_column_alias", oracle=_LATERAL_ALIAS_ORACLE)
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases (Spark 3.4): a select item referencing an
    alias defined EARLIER IN THE SAME SELECT — no more nesting a derived
    table to reuse an expression.  The oracle re-expands the alias
    textually; both sides perform the same two IEEE multiplications per
    row, so values hash-match exactly."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey,
               o_totalprice * 0.9 AS discounted,
               discounted * discounted AS discounted_sq
        FROM orders
        WHERE o_orderkey < 1000
        """
    )
