"""Targeted semantics + plan-shape tests for the corpus-construction
operators (llm/corpus.py) and the SCD2 merge (operators/merge.py), beyond
the oracle equivalence the registry sweep already proves."""

from __future__ import annotations

import math

import etl_pipeline_aws_spark as engine
from pyspark.sql import functions as F

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.llm.corpus import SEQ_LEN, STRATIFIED_FRAC
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pack_offsets_contiguous_per_source(spark):
    """Packing is a per-shard prefix sum: within each source, offsets are
    gapless (next start == previous start + previous n_tokens) and the
    sequence indices bracket the doc's token span."""
    rows = (
        engine.all_queries()["text_pack_offsets"](spark, SF_DIR)
        .orderBy("source", "doc_id")
        .collect()
    )
    by_source: dict[str, int] = {}
    for r in rows:
        expected = by_source.get(r.source, 0)
        assert r.start_offset == expected, (r.source, r.doc_id)
        by_source[r.source] = expected + r.n_tokens
        assert r.seq_first == r.start_offset // SEQ_LEN
        assert r.seq_last == (r.start_offset + r.n_tokens - 1) // SEQ_LEN
        assert r.seq_first <= r.seq_last


def test_repetition_filter_bounds_and_flag(spark):
    rows = engine.all_queries()["text_repetition_filter"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_trigram_frac <= 1.0
        assert r.keep == (r.dup_trigram_frac <= 0.2)


def test_repetition_filter_is_shuffle_free(spark):
    plan = _plan(engine.all_queries()["text_repetition_filter"](spark, SF_DIR))
    assert "Exchange" not in plan  # one narrow scan, no shuffle


def test_stratified_sample_exact_per_stratum(spark):
    docs = load_table(spark, SF_DIR, "documents")
    totals = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    got = {
        r.lang: r["count"]
        for r in engine.all_queries()["sample_stratified"](spark, SF_DIR)
        .groupBy("lang")
        .count()
        .collect()
    }
    assert set(got) == set(totals)
    for lang, n in totals.items():
        assert got[lang] == math.ceil(STRATIFIED_FRAC * n), lang


def test_mix_equalize_caps_every_stratum_at_min(spark):
    docs = load_table(spark, SF_DIR, "documents")
    cap = min(r["count"] for r in docs.groupBy("lang").count().collect())
    got = (
        engine.all_queries()["corpus_mix_equalize"](spark, SF_DIR)
        .groupBy("lang")
        .count()
        .collect()
    )
    assert {r["count"] for r in got} == {cap}


def test_embedding_centroids_shape_and_membership(spark):
    """Long form: one row per (label, 1-based dimension), scalar double."""
    emb = load_table(spark, SF_DIR, "embeddings")
    members = {r.label: r["count"] for r in emb.groupBy("label").count().collect()}
    dim = len(emb.select("embedding").first()[0])
    rows = engine.all_queries()["embedding_centroids"](spark, SF_DIR).collect()
    assert {r.label for r in rows} == set(members)
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
        assert r.n_members == members[r.label]
        # centroid of unit-scale float embeddings stays in a sane range
        assert abs(r.centroid) < 10
    for label, rs in by_label.items():
        assert sorted(r.pos for r in rs) == list(range(1, dim + 1))


def test_scd2_merge_versions_and_currency(spark):
    orders = load_table(spark, SF_DIR, "orders")
    n = orders.count()
    n_upd = orders.filter(F.col("o_orderkey") % 10 == 0).count()
    df = engine.all_queries()["scd2_merge_orders"](spark, SF_DIR)
    assert df.count() == n + n_upd  # updated keys carry two versions
    per_key = df.groupBy("o_orderkey").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_current"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    assert per_key.filter(F.col("n_current") != 1).count() == 0
    assert (
        per_key.filter(
            (F.col("o_orderkey") % 10 == 0) & (F.col("n_versions") != 2)
        ).count()
        == 0
    )


def test_scd2_merge_is_shuffle_free(spark):
    plan = _plan(engine.all_queries()["scd2_merge_orders"](spark, SF_DIR))
    assert "Exchange" not in plan  # scan + Generate only — no join, no shuffle
