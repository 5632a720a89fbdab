"""Plan inspection helpers: programmatic access to the physical plan so
tests can assert the scale posture (SURVEY.md §4.2) instead of eyeballing
``.explain()`` output.

These are the checks that matter at 100 TB:
- filters reached the Parquet scan (``PushedFilters``);
- only referenced columns are read (``ReadSchema``);
- dimension joins are BroadcastHashJoin, not a shuffle exchange;
- top-k plans use TakeOrderedAndProject, not a global Sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    for needle in needles:
        assert needle in plan, f"{needle!r} not found in plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    for needle in needles:
        assert needle not in plan, f"unexpected {needle!r} in plan:\n{plan}"


def broadcast_subtrees(df: DataFrame) -> list[str]:
    """treeString of the BUILD side of every broadcast join in the *static*
    physical plan (pre-AQE — the plan Catalyst's size estimates produce,
    i.e. the one whose shape must survive a 100× scale-up).  Callers assert
    what is (not) being broadcast without brittle text windows.

    Walks ``sparkPlan()`` — note BroadcastExchange nodes do NOT exist there
    (EnsureRequirements inserts them later into ``executedPlan``), so we key
    on the join nodes themselves and their declared ``buildSide``.
    """
    out: list[str] = []
    stack = [df._jdf.queryExecution().sparkPlan()]
    while stack:
        node = stack.pop()
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
        name = node.nodeName()
        if "Broadcast" in name and "Join" in name:
            build_right = "BuildRight" in node.buildSide().toString()
            out.append(kids.apply(1 if build_right else 0).treeString())
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """Extract the PushedFilters lines from the formatted plan."""
    return [
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    ]
