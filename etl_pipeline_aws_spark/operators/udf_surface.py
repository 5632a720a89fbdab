"""UDF surface (SURVEY.md §2.B row "UDF surface"): scalar Python UDF,
Arrow-vectorized pandas_udf, and grouped-map applyInPandas.

These exist to prove the extension points, not for the hot path — the rule
(SURVEY.md §2.B) is built-ins first, Pandas UDFs (Arrow batches, ~10-100×
faster than row-at-a-time) when Python is unavoidable, row UDFs never in
volume code.  Each query here computes something deterministic so the
DuckDB oracle can hash-check the *values* produced through the UDF path:

- the scalar UDF mirrors ``reverse()``;
- the pandas_udf mirrors plain double arithmetic (elementwise — no
  accumulation-order hazard);
- applyInPandas does per-group min-max normalization (min/max are
  order-insensitive, unlike mean/std, so shuffle order cannot change the
  result).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.registry import query


@query(
    "udf_scalar_py",
    oracle="""
    SELECT c_custkey, reverse(c_name) AS name_reversed
    FROM customer WHERE c_custkey < 500
    """,
)
def udf_scalar_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path, kept off fact tables).
    Each row round-trips driver JVM -> Python worker -> JVM; use only for
    logic with no built-in equivalent."""

    @F.udf(returnType=StringType())
    def py_reverse(s: str) -> str | None:
        return s[::-1] if s is not None else None

    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    return c.select("c_custkey", py_reverse("c_name").alias("name_reversed"))


@query(
    "udf_pandas_vectorized",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge
    FROM lineitem WHERE l_orderkey < 2000
    """,
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas_udf: whole columns cross the JVM/Python
    boundary as Arrow buffers and the math runs vectorized in numpy.
    Elementwise double ops are order-free, so values hash-match the
    oracle's plain SQL arithmetic."""

    @F.pandas_udf(DoubleType())
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1.0 - disc) * (1.0 + tax)

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@query(
    "udf_grouped_applyinpandas",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CASE WHEN mx = mn THEN 0.0 ELSE (c_acctbal - mn) / (mx - mn) END
               AS acctbal_minmax
    FROM (
        SELECT c_custkey, c_mktsegment, c_acctbal,
               MIN(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mn,
               MAX(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mx
        FROM customer
    )
    """,
)
def udf_grouped_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the UDAF/transform extension point): each
    group arrives as one pandas DataFrame, normalized in Python, returned
    as columns.  Min-max (not z-score) keeps it order-insensitive.  At
    100 TB each group must fit one executor's memory — groups here are
    market segments; for high-cardinality keys this is the natural shape
    anyway (many small groups)."""

    def minmax(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
        span = mx - mn
        pdf["acctbal_minmax"] = (
            0.0 if span == 0 else (pdf["c_acctbal"] - mn) / span
        )
        return pdf[["c_custkey", "c_mktsegment", "acctbal_minmax"]]

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(
        minmax, "c_custkey long, c_mktsegment string, acctbal_minmax double"
    )


@query(
    "udtf_split_props",
    oracle="""
    WITH kv AS (
        SELECT event_id, props, json_keys(props) AS ks
        FROM events WHERE event_id < 200
    )
    SELECT event_id,
           CAST(i - 1 AS INT) AS pos,
           ks[i] AS key_name,
           json_extract_string(props, '$.' || ks[i]) AS val
    FROM kv, unnest(range(1, len(ks) + 1)) AS t(i)
    """,
)
def udtf_split_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Python UDTF (Spark 4 ``@udtf``): one input row expands to N
    output rows — here the events ``props`` JSON string exploded into
    (pos, key, value) rows.  Table functions run on Arrow batches like
    pandas UDFs; the eval yields per input row, so the expansion is
    streamed, never materialized per partition.  A built-in
    ``explode(from_json(...))`` beats this in production (and the oracle
    mirrors exactly that shape) — registered to prove the UDTF extension
    point end-to-end against a value-hashing oracle."""
    import json

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, key_name string, val string")
    class SplitProps:
        def eval(self, props: str):
            for i, (k, v) in enumerate(json.loads(props).items()):
                # json_extract_string parity: strings pass through raw,
                # every other JSON scalar/composite renders in JSON form
                # (true/1.5/[1,2]); Python str() would yield True/1.5.
                yield i, k, v if isinstance(v, str) else json.dumps(v)

    spark.udtf.register("split_props", SplitProps)
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    events.select("event_id", "props").createOrReplaceTempView("events_small")
    return spark.sql(
        "SELECT event_id, pos, key_name, val "
        "FROM events_small, LATERAL split_props(props)"
    )
