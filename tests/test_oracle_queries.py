"""Every oracle-checked query in the registry is verified against DuckDB at
sf0.01 — the same check the driver runs for CORRECTNESS_r{N}.json — and
held to a wall-time budget so a future driver sample can't time out on a
query no test ever timed."""

from __future__ import annotations

import time

import pytest

import etl_pipeline_aws_spark as engine
from tests.conftest import SF_DIR
from tests.oracle import compare, duckdb_con

# Per-query ceiling at sf0.01 on the test session (local[8]).  The slowest
# healthy query (asof_join_merge, full check incl. DuckDB oracle + hash)
# runs ~10 s; 30 s is 3x headroom before a query counts as a scale defect
# rather than noise.  This is the insurance for the registry entries the
# driver hasn't sampled yet: every query has at least one timed, green run.
QUERY_BUDGET_S = 30.0

# Soft ceiling (round-7 verdict ask #8): NEW operators must land under 15 s
# at sf0.01 so headroom erosion is caught at review time, not when a
# contended run tips one over the hard budget.  Existing ops measured above
# the soft line are allowlisted here with their clean timing; additions to
# this list need a written rationale.
SOFT_BUDGET_S = 15.0
HEAVY_ALLOWLIST = {
    # full check incl. DuckDB oracle + value hash; clean timings, local[8]
    "asof_join_merge",  # ~10 s clean; tips past 15 s under contention
    "asof_join_window",  # same merge-shaped asof family
    "asof_join_maxby",  # same family
    "pipeline_dedup_e2e",  # recursive-CTE dup closure oracle is the cost
    "pipeline_training_build_e2e",  # r12: same class — the Spark side is
    # 1.1 s warm (measured); the DuckDB oracle replays the WHOLE
    # composition (gate + curation + greedy packing walk) as one
    # recursive CTE at 8.6 s per run, landing the full check at ~13 s
    # warm / ~18 s on a cold first-in-session run (JVM + Python-pool
    # boot).  The oracle, not the plan, is the cost.
    "dedup_threshold_sensitivity",  # 9-threshold sweep over the LSH pairs
    "dedup_soft_weights",  # same recursive-CTE transitive-closure oracle
    # class as its two siblings above: ~15.9 s on a COLD first-in-session
    # run (r10 advice — fails the soft ceiling when a pytest -k subset
    # runs it first in a fresh JVM), ~9 s warm; the closure oracle, not
    # the Spark plan, is the cost
    "subquery_recursive_cte",  # DuckDB recursive oracle dominates
    "graph_pagerank_parts",  # 10 iterative rounds, 7-12 s cold
    "graph_pagerank_bucketed_rounds",  # +6 bucketed table writes: the
    # durability cost the cluster-mode demo deliberately pays per round
    "graph_connected_components",  # r11: the recursive-CTE closure ORACLE
    # alone is ~5 s at sf0.01; 9 pointer-jump rounds x ~0.7 s fixed
    # per-round cost + cold-session edge build land the full check at
    # ~15-27 s depending on session warmth/contention (measured r11, after
    # the loop was optimized ~30%: fused convergence flag, one-scan edge
    # symmetrize).  Same profile as its allowlisted siblings below.
    "graph_connected_components_bucketed",  # same cluster-mode trade as
    # the bucketed pagerank: ~4 converge rounds x (bucketed state write +
    # exchange-free edge join); ~20 s with the recursive-CTE oracle, the
    # priced durability cost, not a plan defect (see its docstring)
    "graph_community_inequality",  # LP parent + Lorenz, volume-bound
    "embedding_kmeans_lloyd",  # unrolled Lloyd rounds oracle
    "embedding_cka_quantization",  # d² Gram trio via ordered folds on BOTH
    # engines (~12 s clean, dual-engine exact-fold cost, the PC-kernel family)
    "similarity_quantized_recall",  # BOTH rankings (float cosine + int8
    # integer dot) computed on BOTH engines — DuckDB's per-pair list
    # folds dominate (~15-20 s), the cka dual-engine exact-fold class
    "embedding_pc2_deflation",  # TWO chained unrolled power iterations
    # (PC1 + deflated PC2) — exactly 2x the PC1 cost, ~23 s clean with
    # the doubled ordered-fold oracle; the iterative-family budget case
    "lakehouse_partition_evolution",  # multi-generation lakehouse rewrite
    "stream_dsir_scoring",  # LM train + 3-epoch availableNow stream +
    # sink re-rank: ~13 s warm, tips past 15 s on a cold first run
    "stream_heavy_hitters_cms",  # availableNow stream cold-start
    # dominates (~10 s of the ~14 s warm run); the probe side is k x d
    # rows — same cold-first-run class as stream_dsir_scoring
    "dedup_winnowing_pairs",  # ~10-12 s: BOTH engines md5-hash every
    # token 3-gram (the portable-hash tax text_winnowing_fingerprints
    # already pays — DuckDB's list-comprehension md5 dominates); the pair
    # join itself is capped-posting cheap
    "dedup_minhash_bbit_eval",  # r11: ~4 s warm but ~14-17 s on a COLD
    # first-in-session run — whole-stage codegen of the K=32-salt md5
    # minwise forest dominates the first compile, the winnowing
    # portable-hash class; DuckDB side 0.4 s
    "pipeline_hybrid_search_e2e",  # ~13 s warm (r8 verdict #7): a FIVE-
    # stage serving composition — BM25 pass + dense pass + RRF fusion +
    # LSH-banded dup closure (iterative min-label rounds, each a join
    # stage) + metadata re-rank.  r9 trimmed one join per closure round
    # (convergence flag fused into the label join) but the composition
    # legitimately pays ~4 iterative stages the 15 s ceiling doesn't fit
    # under contention; each stage's plan is probe-verified in its parent
    # operator, so the residual cost is stage count, not a scale defect
}

# Streaming ops whose SOFT-budget enforcement moved to
# tests/test_stream_budget.py (r10 verdict ask #6: the allowlist was
# growing by CONTENTION — both of these flaked a seal suite only when a
# wall-clock budget ran under late-suite load, oracle green both times).
# The sweep here still runs their full oracle check and the HARD budget;
# the soft ceiling is asserted on an isolated, contention-controlled
# measurement instead, so suite load can neither flake them nor push
# more names onto HEAVY_ALLOWLIST.
STREAM_BUDGET_ISOLATED = {
    "stream_late_data_drop",  # two sequenced availableNow runs (the
    # watermark-replay semantics ARE the operator): ~13-16 s warm
    "stream_stream_interval_join",  # dual availableNow streams + state
    # store on both sides: ~12-15 s warm
    "stream_session_append",  # r11 seal suite: 15.2 s under late-suite
    # load (oracle green; the 1.3% overshoot is the same contention
    # class as the two entries above — session-window state store +
    # availableNow cold start)
}


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR)
    yield c
    c.close()


def _oracle_names():
    return sorted(engine.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, con, name):
    engine.clear_caches(spark)  # builder persists don't leak across the sweep
    fn = engine.all_queries()[name]
    sql = engine.oracle_sql()[name]
    t0 = time.monotonic()
    compare(fn(spark, SF_DIR), con, sql)
    elapsed = time.monotonic() - t0
    assert elapsed < QUERY_BUDGET_S, f"{name} took {elapsed:.1f}s (budget {QUERY_BUDGET_S}s)"
    if name not in HEAVY_ALLOWLIST and name not in STREAM_BUDGET_ISOLATED:
        assert elapsed < SOFT_BUDGET_S, (
            f"{name} took {elapsed:.1f}s — over the {SOFT_BUDGET_S}s soft "
            "ceiling; either optimize it or allowlist it with a rationale"
        )


def test_driver_registry_is_fully_oracle_backed():
    """Structural guarantee (round-7 verdict ask #2): every driver-facing
    queries() entry has an oracle twin, so no CORRECTNESS sample can ever
    record a `no_oracle` err row again.  Rows-only capabilities live in
    demo_queries() and are swept below."""
    oracle = set(engine.oracle_sql())
    driver = set(engine.queries())
    assert driver == oracle, driver ^ oracle
    demo = set(engine.demo_queries())
    assert demo.isdisjoint(driver)
    assert demo, "demo registry unexpectedly empty"


def test_all_queries_run_rows_only(spark):
    """Demo (rows-only) queries must still run, return a DataFrame, and meet
    the same wall-time budget as the oracle-checked set."""
    from pyspark.sql.types import DecimalType

    over_budget = []
    for name, fn in engine.demo_queries().items():
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        assert not [
            f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)
        ], f"{name}: DecimalType output (driver-hash split class, see oracle.py)"
        assert df.count() >= 0, name
        elapsed = time.monotonic() - t0
        if elapsed >= QUERY_BUDGET_S:
            over_budget.append((name, round(elapsed, 1)))
    assert not over_budget, over_budget
