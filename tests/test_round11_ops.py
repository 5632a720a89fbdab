"""Round-11 semantic pins: symmetric-delete spell correction recovers the
planted typos, the Bloom prefilter has no false negatives where dups
exist, the forced-IVF SemDeDup tier conserves membership, the adaptive
bucket arithmetic is exact, and the restructured bucketed-pagerank round
join (ranks ⋈ degrees ⋈ edges) is fully exchange-free."""

from __future__ import annotations

import re

import etl_pipeline_aws_spark as engine
import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from tests.conftest import SF_DIR

SF01 = "/root/testdata/sf0.1"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_symspell_recovers_planted_typos(spark):
    """Rebuild the planted corruption in pure Python and assert the
    operator (a) reports exactly the planted rare forms, (b) recovers
    the original word for every unambiguous form, (c) reports exact
    levenshtein distances."""
    from etl_pipeline_aws_spark.llm.text import SPELL_DICT_MIN_FREQ

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    freq: dict[str, int] = {}
    planted: dict[str, set[str]] = {}  # corrupted form -> original words
    for _, row in docs.iterrows():
        toks = [t for t in row.text.split(" ") if t]
        out = []
        for pos, tok in enumerate(toks, 1):
            if row.doc_id % 17 == 0 and pos == 1 and len(tok) >= 4:
                bad = tok[0] + tok[2:]
                planted.setdefault(bad, set()).add(tok)
                out.append(bad)
            else:
                out.append(tok)
        for t in out:
            freq[t] = freq.get(t, 0) + 1
    rare_planted = {
        f for f in planted if freq[f] < SPELL_DICT_MIN_FREQ
    }
    got = {
        r.token: r
        for r in engine.all_queries()["text_symspell_correction"](
            spark, SF_DIR
        ).collect()
    }
    engine.clear_caches(spark)
    # (a) every planted rare form is corrected (its original is lev 1 away
    # and in the dictionary by construction); no phantom corrections for
    # forms that were never planted unless they occur naturally (closed
    # vocabulary: they don't)
    assert set(got) == rare_planted, set(got) ^ rare_planted
    for form, row in got.items():
        # (c) reported distance is the true levenshtein
        assert _lev(form, row.correction) == row.lev
        assert freq[row.correction] >= SPELL_DICT_MIN_FREQ
        # (b) unambiguous forms map back to their original word
        originals = planted[form]
        if len(originals) == 1:
            orig = next(iter(originals))
            # the original is lev-1; any other dict word would need the
            # same lev and a higher frequency to win the argmin
            if row.lev == 1 and row.correction != orig:
                assert freq[row.correction] >= freq[orig]


def test_bloom_prefilter_no_false_negatives_where_dups_exist(spark):
    """At sf0.1 cross-source exact dups exist: the census must carry an
    exact_dup=true row AND no (bloom_hit=false, exact_dup=true) cell —
    Bloom filters have no false negatives, pinned on live data."""
    rows = engine.all_queries()["dedup_bloom_prefilter"](spark, SF01).collect()
    engine.clear_caches(spark)
    cells = {(r.bloom_hit, r.exact_dup): r.n_docs for r in rows}
    assert (False, True) not in cells, cells
    assert any(dup for (_, dup) in cells), cells  # non-vacuous: dups exist


def test_semdedup_ivf_conserves_membership(spark):
    """The forced-IVF tier assigns EVERY vector to exactly one cluster:
    Σ n_members equals the embeddings row count, and kept + dropped =
    members per cluster."""
    out = engine.all_queries()["embedding_semdedup_ivf"](spark, SF_DIR).collect()
    n_vecs = (
        engine.catalog.load_table(spark, SF_DIR, "embeddings").count()
    )
    engine.clear_caches(spark)
    assert sum(r.n_members for r in out) == n_vecs
    for r in out:
        assert r.n_kept + r.n_dropped == r.n_members


def test_adaptive_buckets_arithmetic():
    from etl_pipeline_aws_spark.operators.scale import (
        BUCKET_MAX,
        BUCKET_TARGET_ROWS,
        N_BUCKETS,
        adaptive_buckets,
    )

    assert adaptive_buckets(0) == N_BUCKETS
    assert adaptive_buckets(N_BUCKETS * BUCKET_TARGET_ROWS) == N_BUCKETS
    assert adaptive_buckets(N_BUCKETS * BUCKET_TARGET_ROWS + 1) == 2 * N_BUCKETS
    assert adaptive_buckets(10**15) == BUCKET_MAX  # runaway backstop
    # power-of-two ladder: each decade is a clean doubling chain
    assert adaptive_buckets(239_000_000) == 128


def test_bucketed_pagerank_three_way_round_join_exchange_free(spark):
    """The r11 layout split's claim: the FULL round join — ranks ⋈
    degrees ⋈ edges — executes as SortMergeJoins over bucketed scans
    with zero Exchanges (the old pin covered only ranks ⋈ edges)."""
    from etl_pipeline_aws_spark.operators.scale import _sf_tag

    qs = engine.all_queries()
    qs["graph_pagerank_bucketed_rounds"](spark, SF_DIR).count()
    tag = _sf_tag(SF_DIR)
    ranks = spark.table(f"b_pr_ranks_{tag}_1")
    deg_t = spark.table(f"b_pr_deg_{tag}")
    e = spark.table(f"b_pr_edges_{tag}").hint("merge")
    contrib = (
        ranks.join(deg_t.hint("merge"), "node")
        .join(e, F.col("node") == F.col("eu"))
        .select(
            F.col("v").alias("node"),
            F.expr("(rank_val * 17) div (20 * d)").alias("c"),
        )
    )
    plan = contrib._jdf.queryExecution().executedPlan().toString()
    engine.clear_caches(spark)
    assert len(re.findall(r"SortMergeJoin", plan)) == 2, plan
    assert not re.findall(r"Exchange", plan), plan
