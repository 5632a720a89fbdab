"""Round-8 tests: the two-phase distributed prefix sum (r7 verdict ask #1),
the unpartitioned-window plan guard's own hygiene, and the round's new
operators.  Independent-recomputation discipline per the r7 verdict: the
prefix-sum test checks against a PYTHON re-derivation, not the oracle SQL
text the operators share."""

from __future__ import annotations

import decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType,
    LongType,
    StructField,
    StructType,
)

import etl_pipeline_aws_spark as engine
from etl_pipeline_aws_spark.functions.prefix import ranked_prefix_sum
from etl_pipeline_aws_spark.plans.inspect import unpartitioned_window_nodes
from tests.conftest import SF_SMALL


# ---------------------------------------------------------------------------
# ranked_prefix_sum: exactness vs a driver-side recomputation
# ---------------------------------------------------------------------------


def test_ranked_prefix_sum_matches_python_recompute(spark):
    """Global inclusive prefix sums from the two-phase plan must equal a
    plain Python fold over the same total order — bigint and decimal
    columns, skewed duplicate sort keys, and more range partitions than
    distinct keys (forces empty slices + offset rows for every slice)."""
    rows = []
    for i in range(500):
        key = i % 7  # heavy duplication in the sort prefix
        rows.append((key, i, (i * 37) % 113 - 55, decimal.Decimal(i) / 4))
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("tie", LongType()),
            StructField("v", LongType()),
            StructField("d", DecimalType(18, 2)),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out, totals = ranked_prefix_sum(
        df, [F.desc("k"), F.asc("tie")], ["v", "d"], n_ranges=16
    )
    got = {(r["k"], r["tie"]): (r["cum_v"], r["cum_d"]) for r in out.collect()}

    ordered = sorted(rows, key=lambda r: (-r[0], r[1]))
    cum_v = 0
    cum_d = decimal.Decimal(0)
    for k, tie, v, d in ordered:
        cum_v += v
        cum_d += d
        assert got[(k, tie)][0] == cum_v, (k, tie)
        assert got[(k, tie)][1] == cum_d.quantize(decimal.Decimal("0.01")), (k, tie)
    assert totals["v"] == cum_v
    assert totals["d"] == cum_d
    assert len(got) == len(rows)


def test_ranked_prefix_sum_empty_input(spark):
    df = spark.createDataFrame(
        [], StructType([StructField("a", LongType()), StructField("v", LongType())])
    )
    out, totals = ranked_prefix_sum(df, [F.asc("a")], ["v"], n_ranges=4)
    assert out.count() == 0
    assert totals["v"] == 0


def test_ranked_prefix_sum_plan_has_no_unpartitioned_window(spark):
    """The helper must never reintroduce the class it replaces."""
    df = spark.range(100).withColumn("v", F.col("id") % 9)
    out, _ = ranked_prefix_sum(df, [F.asc("id")], ["v"], n_ranges=8)
    plan = out._jdf.queryExecution().sparkPlan().toString()
    assert not unpartitioned_window_nodes(plan), plan


# ---------------------------------------------------------------------------
# The three r8-fixed queries: single-task global windows are GONE (the r7
# verdict's explicit Done criterion for ask #1)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "orders_abc_xyz_classification",
        "parts_abc_classification",
        "stat_ks_two_sample",
    ],
)
def test_fixed_queries_have_no_unpartitioned_window(spark, name):
    engine.clear_caches(spark)
    df = engine.all_queries()[name](spark, SF_SMALL)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert not unpartitioned_window_nodes(plan), (name, plan)


def test_psnr_verify_budget_discipline(spark):
    """r7 verdict ask #6: the exact-pixel verify stage must never score
    more than PSNR_VERIFY_CAP pairs per left image, and each row's
    doc_a_dropped must be consistent (same value for all rows of one
    doc_a, non-negative)."""
    from collections import Counter, defaultdict

    from etl_pipeline_aws_spark.llm.multimodal import PSNR_VERIFY_CAP
    from tests.conftest import SF_DIR

    engine.clear_caches(spark)
    rows = engine.all_queries()["multimodal_image_psnr_pairs"](spark, SF_DIR).collect()
    assert rows
    per_a = Counter(r.doc_a for r in rows)
    assert max(per_a.values()) <= PSNR_VERIFY_CAP
    dropped = defaultdict(set)
    for r in rows:
        assert r.doc_a_dropped >= 0
        dropped[r.doc_a].add(r.doc_a_dropped)
    assert all(len(v) == 1 for v in dropped.values())


def test_pipe_syntax_plans_identical_to_classic(spark):
    """r7 verdict ask #8 Done-criterion: the pipe-syntax chains must
    compile to the IDENTICAL physical plan as their classic-SQL twins
    (expression-id-insensitive compare), proving the surface is pure
    syntax — zero plan cost at any scale."""
    import re

    from etl_pipeline_aws_spark.catalog import register_views
    from etl_pipeline_aws_spark.operators.sql_features import (
        _PIPE_MULTI_CLASSIC,
        _PIPE_MULTI_PIPE,
        _PIPE_ORACLE,
    )

    register_views(spark, SF_SMALL)

    def normalized_plan(sql: str) -> str:
        plan = spark.sql(sql)._jdf.queryExecution().sparkPlan().toString()
        return re.sub(r"#\d+", "#x", plan)

    pipe_simple = """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                         AS revenue
           GROUP BY o_orderpriority
        """
    assert normalized_plan(pipe_simple) == normalized_plan(_PIPE_ORACLE)
    assert normalized_plan(_PIPE_MULTI_PIPE) == normalized_plan(_PIPE_MULTI_CLASSIC)


def test_unpartitioned_window_allowlist_is_live():
    """Every allowlist entry names a real registry query (typo/staleness
    tripwire for the new guard), and none of the r8-fixed queries crept
    back in."""
    from tests.test_plans import ALLOWED_UNPARTITIONED_WINDOW

    names = set(engine.all_queries())
    unknown = set(ALLOWED_UNPARTITIONED_WINDOW) - names
    assert not unknown, unknown
    fixed = {
        "orders_abc_xyz_classification",
        "parts_abc_classification",
        "stat_ks_two_sample",
    }
    assert fixed.isdisjoint(ALLOWED_UNPARTITIONED_WINDOW)
