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


_COLUMN_LINEAGE_ORACLE = """
    SELECT * FROM (VALUES
        ('customer', 'c_custkey'),
        ('customer', 'c_mktsegment'),
        ('orders',   'o_orderkey'),
        ('orders',   'o_custkey'),
        ('orders',   'o_orderdate'),
        ('lineitem', 'l_orderkey'),
        ('lineitem', 'l_extendedprice'),
        ('lineitem', 'l_discount'),
        ('lineitem', 'l_shipdate')
    ) AS t(table_name, column_name)
"""


@query("governance_column_lineage", oracle=_COLUMN_LINEAGE_ORACLE)
def governance_column_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level lineage, extracted from the ENGINE'S OWN physical
    plan: which physical columns q3_shipping_priority actually reads
    from each source table — the provenance record data-governance
    reviews (GDPR access audits, PII blast-radius analysis) need per
    query, produced from the plan rather than hand-maintained docs that
    drift.

    Because the report comes from the plan's per-scan ReadSchema, it is
    ALSO a column-pruning regression pin in query form: if a future
    change widens any scan (reads a column the query doesn't need), the
    lineage gains a row and the oracle — the reviewed, approved access
    list — fails the hash.  Today that list is 9 columns of the 3
    tables' 20; the 11 unread ones are the pruning win.

    Scale: plan introspection is metadata-only — no data is touched; the
    result is built with createDataFrame from the parsed plan text."""
    import re

    from etl_pipeline_aws_spark.operators.flagships import q3_shipping_priority
    from etl_pipeline_aws_spark.plans.inspect import formatted_plan

    plan = formatted_plan(q3_shipping_priority(spark, sf_dir))
    rows = []
    for table, schema in re.findall(
        r"Location:[^\n]*?([a-z]+)\.parquet[^\n]*\n(?:.*?\n)*?.*?ReadSchema: struct<([^>]*)>",
        plan,
    ):
        for col in schema.split(","):
            if col:
                rows.append((table, col.split(":", 1)[0]))
    return spark.createDataFrame(rows, "table_name string, column_name string")


ROW_POLICIES = {  # principal -> region allowlist (the policy table)
    "amer": ("AMERICA",),
    "emea": ("EUROPE", "AFRICA", "MIDDLE EAST"),
    "apac": ("ASIA",),
}


def _policy_oracle() -> str:
    arms = []
    for principal, regions in sorted(ROW_POLICIES.items()):
        inlist = ", ".join(f"'{r}'" for r in regions)
        arms.append(f"""
    SELECT '{principal}' AS principal,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS revenue_cents,
           CAST(0 AS BIGINT) AS n_leaked
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE r.r_name IN ({inlist})""")
    return "\n    UNION ALL\n".join(arms)


def apply_row_policy(spark: SparkSession, sf_dir: str, principal: str) -> DataFrame:
    """The policy engine: the customer table as PRINCIPAL sees it —
    a region-allowlist filter joined through nation/region.  Every
    consumer goes through this function, so the policy has one
    definition (the governance requirement) instead of per-query
    WHERE clauses that drift."""
    regions = ROW_POLICIES[principal]
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        customer.join(nation, customer["c_nationkey"] == nation["n_nationkey"])
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name").isin(*regions))
    )


@query("governance_row_level_policy", oracle=_policy_oracle)
def governance_row_level_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level security as a POLICY LAYER — the governance surface
    beside column lineage (governance_column_lineage) and the privacy
    audits: each principal's view of the customer table is the single
    ``apply_row_policy`` function (region allowlist via the dimension
    chain), and this query audits all principals at once — visible
    customers, attributable revenue, and a LEAKAGE COUNT computed from
    the policy-filtered frame itself (rows outside the principal's
    allowlist that survived the filter — pinned at 0 by the oracle, so
    a policy regression fails the value hash, not a code review).

    Scale: the policy filter is a broadcast dim-chain join — predicate
    pushdown carries the region filter into the scan when the region
    key is a partition/cluster column, which is exactly how row
    policies stay cheap at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    out = None
    for principal, regions in sorted(ROW_POLICIES.items()):
        visible = apply_row_policy(spark, sf_dir, principal)
        leaked = visible.filter(~F.col("r_name").isin(*regions))
        joined = visible.join(orders, visible["c_custkey"] == orders["o_custkey"])
        row = (
            joined.agg(
                F.countDistinct("c_custkey").cast("long").alias("n_customers"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
                .cast("long")
                .alias("revenue_cents"),
            )
            .crossJoin(
                F.broadcast(
                    leaked.agg(F.count(F.lit(1)).cast("long").alias("n_leaked"))
                )
            )
            .select(
                F.lit(principal).alias("principal"),
                "n_customers",
                "revenue_cents",
                "n_leaked",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
