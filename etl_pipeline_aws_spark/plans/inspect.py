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

import re

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


_TREE_PREFIX = re.compile(r"^[\s:+*\-()0-9]*")
_BRACKET_GROUPS = re.compile(r"\[[^\[\]]*(?:\[[^\[\]]*\][^\[\]]*)*\]")


def unpartitioned_window_nodes(plan: str) -> list[str]:
    """Window / WindowGroupLimit nodes with an EMPTY partition spec in a
    plan's treeString — the nodes Spark warns about with ``WindowExec: No
    Partition Defined`` and executes as ONE task holding the entire input
    frame (the r7-verdict single-task class: orders_abc_xyz_classification
    measured 4.2 → 20.1 s at the 10x probe on exactly this shape).

    toString formats (probed on Spark 4.1, pinned in tests):
    - ``Window [exprs], [part], [order]``       -> partitioned (3 groups)
    - ``Window [exprs], [part]``                -> partitioned, no order
      (the ``OVER (PARTITION BY ..)`` totals idiom; the 2nd group carries
      no ASC/DESC direction tokens)
    - ``Window [exprs], [order]``               -> UNPARTITIONED ordered
      (the 2nd group carries ASC/DESC)
    - ``Window [exprs]``                        -> UNPARTITIONED ``OVER ()``
    - ``WindowGroupLimit [part], [order], fn, k, mode`` -> partitioned;
      an empty first group would mean unpartitioned.
    """
    out = []
    for raw in plan.splitlines():
        line = _TREE_PREFIX.sub("", raw)
        if line.startswith("WindowGroupLimit "):
            groups = _BRACKET_GROUPS.findall(line)
            if not groups or groups[0] == "[]":
                out.append(line[:160])
        elif line.startswith("Window "):
            groups = _BRACKET_GROUPS.findall(line)
            if len(groups) >= 3:
                if groups[-2] == "[]":
                    out.append(line[:160])
            elif len(groups) == 2:
                if " ASC" in groups[-1] or " DESC" in groups[-1]:
                    out.append(line[:160])
            else:
                out.append(line[:160])
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """Extract the PushedFilters lines from the formatted plan."""
    return [
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    ]
