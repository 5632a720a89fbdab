"""Isolated soft-budget enforcement for the contention-sensitive
streaming operators (r10 verdict ask #6).

The two names in STREAM_BUDGET_ISOLATED each flaked one seal suite by
tipping the 15 s soft ceiling ONLY under late-suite load (oracle green
both times, clean reruns green both times) — the allowlist in
test_oracle_queries.py was growing by contention, not by design.  This
module asserts the soft ceiling on a CONTENTION-CONTROLLED measurement
instead:

- caches and orphan RDD blocks are swept before each attempt (the same
  clear_caches discipline the bench harness uses), and
- each query gets two attempts with the MINIMUM kept — a second attempt
  strips exactly the cold-start / GC-pause noise that caused the flakes
  while still failing loudly if the operator itself regresses past the
  ceiling.

The main oracle sweep keeps running these queries (full DuckDB compare
+ HARD 30 s budget); only the soft ceiling moved here.
"""

from __future__ import annotations

import time

import etl_pipeline_aws_spark as engine
import pytest
from tests.conftest import SF_DIR
from tests.oracle import compare, duckdb_con
from tests.test_oracle_queries import SOFT_BUDGET_S, STREAM_BUDGET_ISOLATED

ATTEMPTS = 2


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(STREAM_BUDGET_ISOLATED))
def test_stream_soft_budget_isolated(spark, con, name):
    fn = engine.all_queries()[name]
    sql = engine.oracle_sql()[name]
    best = float("inf")
    for _ in range(ATTEMPTS):
        engine.clear_caches(spark)
        t0 = time.monotonic()
        compare(fn(spark, SF_DIR), con, sql)
        best = min(best, time.monotonic() - t0)
        if best < SOFT_BUDGET_S:
            break  # already under the ceiling; skip the second attempt
    assert best < SOFT_BUDGET_S, (
        f"{name} best-of-{ATTEMPTS} took {best:.1f}s — over the "
        f"{SOFT_BUDGET_S}s soft ceiling even on an isolated, cache-swept "
        "measurement; this is an operator regression, not suite contention"
    )
