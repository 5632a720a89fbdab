"""Scale-posture tests: assert the physical plans carry the properties that
make these operators viable at 100 TB (SURVEY.md §4.2) — pushdown, column
pruning, broadcast joins, top-k without global sort, whole-stage codegen."""

from __future__ import annotations

import etl_pipeline_aws_spark as engine
from etl_pipeline_aws_spark.plans.inspect import (
    broadcast_subtrees,
    formatted_plan,
    pushed_filters,
)
from tests.conftest import SF_DIR


def _q(name, spark):
    return engine.queries()[name](spark, SF_DIR)


def test_filter_pushdown_reaches_parquet(spark):
    df = _q("q1_pricing_summary", spark)
    filters = pushed_filters(df)
    assert any("l_shipdate" in f for f in filters), filters


def test_column_pruning(spark):
    """A two-ish-column projection must not scan all 10 lineitem columns."""
    df = _q("window_topk_per_group", spark)
    plan = formatted_plan(df)
    assert "ReadSchema" in plan
    read_schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "c_name" not in read_schema_line  # untouched column stays unread


def test_dim_joins_broadcast(spark):
    plan = formatted_plan(_q("join_broadcast_dims", spark))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan


def test_join_chain_broadcasts_dims(spark):
    plan = formatted_plan(_q("join_chain_revenue_by_nation", spark))
    assert "BroadcastHashJoin" in plan


def test_theta_join_is_hash_not_nested_loop(spark):
    """Equi component must carry the join; range predicate is a residual."""
    plan = formatted_plan(_q("join_theta", spark))
    assert "NestedLoop" not in plan or "BroadcastNestedLoop" not in plan.split("nation")[0], plan


def test_order_by_limit_is_topk(spark):
    plan = formatted_plan(_q("order_by_limit", spark))
    assert "TakeOrderedAndProject" in plan


def test_relational_queries_stay_jvm_side(spark):
    """No Python-eval operator may appear in any relational query plan —
    the hot path must be whole-stage-codegen-able JVM expressions.  (AQE
    hides WholeStageCodegen markers until execution, so we assert the
    absence of the slow path rather than the presence of the fast one.)"""
    for name in ("q1_pricing_summary", "join_chain_revenue_by_nation", "window_ranking"):
        plan = formatted_plan(_q(name, spark))
        assert "EvalPython" not in plan, (name, plan)


def test_topk_per_group_uses_group_limit(spark):
    plan = formatted_plan(_q("window_topk_per_group", spark))
    assert "WindowGroupLimit" in plan, plan


def test_bucketed_join_has_no_join_exchange(spark):
    """Both sides bucketed on the join key => the SMJ consumes bucketed
    scans directly; the only exchange allowed is the post-join groupBy."""
    df = _q("bucketed_join_colocated", spark)
    df.collect()  # materialize so AQE finalizes the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    join_subtree = final[final.index("SortMergeJoin"):]
    assert "Exchange hashpartitioning" not in join_subtree, join_subtree
    assert "SelectedBucketsCount" in final or "Bucketed: true" in final, final


def test_flagship_joins_never_broadcast_fact_side(spark):
    """The broadcast threshold must not let a (filtered) fact table become
    a broadcast build side — the plan that OOMs the driver at 100 TB."""
    for name in (
        "q3_shipping_priority",
        "q10_returned_items",
        "q5_local_supplier_volume",
        "q7_volume_shipping",
        "q9_profit_by_nation_year",
        "q18_large_volume_customer",
    ):
        df = _q(name, spark)
        assert "lineitem.parquet" in formatted_plan(df)  # fact scan present
        for sub in broadcast_subtrees(df):
            assert "lineitem.parquet" not in sub, (name, sub)
