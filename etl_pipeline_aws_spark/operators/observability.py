"""Observability operators — metrics that ride a query's own execution.

These queries RUN an action at build time by design (``observe`` metrics
only exist after the action they instrument), so like the streaming and
sink modules they are excluded from the plan-only registry sweep
(tests/test_plans.py SWEEP_SKIP_MODULES) — their cost and semantics are
pinned by their oracles instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.registry import query

@query(
    "observe_scan_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS rows_scanned,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                AS BIGINT) AS urgent_rows,
           CAST(COUNT(*) AS BIGINT) AS rows_out
    FROM orders
    """,
)
def observe_scan_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via ``df.observe``: named metrics (rows
    scanned, urgent-row count) are accumulated ON the query's own
    execution — zero extra passes, zero extra shuffles — and read out
    after the action completes.  This is how a production job reports
    "rows in / rows matching / rows out" without re-running anything:
    the metrics ride the task results of the query they describe.

    The observation handle is inherently a driver-side readout (that is
    the API's contract — metrics, not data); the query's data path
    itself stays fully distributed, and the oracle checks the metric
    VALUES, proving the instrumented run counted exactly what a direct
    aggregation sees."""
    from pyspark.sql import Observation

    o = load_table(spark, sf_dir, "orders")
    obs = Observation("scan_metrics")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("urgent_rows"),
    )
    rows_out = observed.count()  # the action the metrics ride on
    m = obs.get
    return o.sparkSession.createDataFrame(
        [(m["rows_scanned"], m["urgent_rows"], rows_out)],
        "rows_scanned long, urgent_rows long, rows_out long",
    )


EXPECTED_CUSTOMER_SCHEMA = (
    ("c_custkey", "bigint"),
    ("c_name", "string"),
    ("c_nationkey", "int"),
    ("c_acctbal", "double"),
    ("c_mktsegment", "string"),
)


@query(
    "dq_schema_contract_check",
    oracle="""
    SELECT * FROM (VALUES
        ('c_custkey', 'bigint', TRUE),
        ('c_name', 'string', TRUE),
        ('c_nationkey', 'int', TRUE),
        ('c_acctbal', 'double', TRUE),
        ('c_mktsegment', 'string', TRUE)
    ) t(column_name, expected_type, matches)
    """,
)
def dq_schema_contract_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema contract validation: the customer table's ACTUAL schema
    (probed from the live scan, the same footer-read the adaptive
    events reader uses) checked column-by-column against the declared
    contract — the gate a pipeline runs before promoting an upstream
    drop, and the check that would have caught round 2's events.ts
    drift one commit earlier had events carried a contract.

    Schema introspection is metadata (a footer read, no data scan);
    the oracle pins the contract itself, so a silent upstream type
    change flips ``matches`` to false and fails the round's
    correctness gate — drift becomes a red diff, not a runtime
    surprise three queries downstream."""
    actual = dict(load_table(spark, sf_dir, "customer").dtypes)
    rows = [
        (name, expected, actual.get(name) == expected)
        for name, expected in EXPECTED_CUSTOMER_SCHEMA
    ]
    return spark.createDataFrame(
        rows, "column_name string, expected_type string, matches boolean"
    )
