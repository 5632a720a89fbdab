"""Round-10 additions: recompute tests for the BPE merge loop and the
multimodal sequence packer, plus the oracle-parity checks the round's
verdict asked for (r9 verdict asks #4 and #5)."""

from __future__ import annotations

import collections
import re

import etl_pipeline_aws_spark as engine
from tests.conftest import SF_DIR
from tests.oracle import compare, duckdb_con


# ---------------------------------------------------------------------------
# BPE merge loop (r9 verdict ask #4): Spark result == pure-Python BPE
# trainer (the Sennrich et al. 2016 reference algorithm, written here from
# the paper: count weighted adjacent pairs over the distinct-pretoken
# vocabulary, take the argmax with a deterministic tie-break, rewrite
# greedily left-to-right, repeat).
# ---------------------------------------------------------------------------


def _python_bpe_merges(texts: list[str], rounds: int) -> list[tuple]:
    from etl_pipeline_aws_spark.llm.text import BPE_PRETOKEN_PATTERN

    pat = re.compile(BPE_PRETOKEN_PATTERN)
    vocab: collections.Counter = collections.Counter()
    for t in texts:
        for tok in pat.findall(t or ""):
            if "\x01" not in tok:
                vocab[tok] += 1
    seqs = [[list(tok), n] for tok, n in vocab.items()]
    merges = []
    for rnd in range(1, rounds + 1):
        cnt: collections.Counter = collections.Counter()
        for syms, n in seqs:
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] += n
        (left, right), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rnd, left, right, c))
        for item in seqs:
            out: list[str] = []
            for x in item[0]:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            item[0] = out
    return merges


def test_bpe_train_merges_matches_python_reference(spark):
    from etl_pipeline_aws_spark.catalog import load_table
    from etl_pipeline_aws_spark.llm.text import BPE_MERGE_ROUNDS

    texts = [
        r["text"]
        for r in load_table(spark, SF_DIR, "documents").select("text").collect()
    ]
    expected = _python_bpe_merges(texts, BPE_MERGE_ROUNDS)
    got = [
        (r["merge_round"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in engine.all_queries()["text_bpe_train_merges"](
            spark, SF_DIR
        ).collect()
    ]
    assert got == expected
    engine.clear_caches(spark)


def test_bpe_train_merges_oracle_parity(spark):
    con = duckdb_con(SF_DIR)
    import __spark_entry__ as entry

    name = "text_bpe_train_merges"
    compare(
        engine.all_queries()[name](spark, SF_DIR), con, entry.oracle_sql()[name]
    )
    engine.clear_caches(spark)


def test_bpe_merge_rewrite_handles_adjacent_and_overlapping_runs(
    spark, tmp_path
):
    """The boundary-encoded replace must equal the list-fold semantics on
    the two classic traps: consecutive occurrences ('abab' -> both pairs
    merge in one pass) and overlapping runs ('aaaa' with left==right ->
    greedy left-to-right, two non-overlapping merges).  Exercised through
    the real operator on a crafted corpus where those words dominate the
    argmax."""
    texts = ["abababab abababab", "aaaa aaaa aaaa", "abab zq"]
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = [
        (r["merge_round"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in engine.all_queries()["text_bpe_train_merges"](
            spark, str(tmp_path)
        ).collect()
    ]
    assert got == _python_bpe_merges(texts, 3)
    engine.clear_caches(spark)


# ---------------------------------------------------------------------------
# Multimodal interleaved packing (r9 verdict ask #5): the per-modality unit
# ledger must conserve — bins neither create nor destroy a patch or token —
# and every bin must respect capacity unless it holds a single oversized doc.
# ---------------------------------------------------------------------------


def test_multimodal_pack_ledger_conservation(spark):
    from pyspark.sql import functions as F

    from etl_pipeline_aws_spark.catalog import load_table
    from etl_pipeline_aws_spark.llm.multimodal import (
        MM_PACK_CAPACITY,
        MM_PATCH,
        PPM_WIDTH,
    )

    bins = engine.all_queries()["multimodal_pack_interleaved"](
        spark, SF_DIR
    ).collect()
    # independent per-doc totals straight from the table
    per_doc = (
        load_table(spark, SF_DIR, "documents")
        .select(
            (
                F.lit(PPM_WIDTH // MM_PATCH)
                * F.expr(
                    f"((((length(text) + 2) div 3 + {PPM_WIDTH - 1})"
                    f" div {PPM_WIDTH}) + {MM_PATCH - 1}) div {MM_PATCH}"
                )
            ).alias("img"),
            F.size(F.split("text", " ")).alias("txt"),
        )
        .agg(
            F.sum("img").alias("img"),
            F.sum("txt").alias("txt"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert sum(b["image_units"] for b in bins) == per_doc["img"]
    assert sum(b["text_units"] for b in bins) == per_doc["txt"]
    assert sum(b["n_docs"] for b in bins) == per_doc["n"]
    for b in bins:
        assert b["fill_units"] == b["image_units"] + b["text_units"]
        assert b["pad_units"] == max(MM_PACK_CAPACITY - b["fill_units"], 0)
        # capacity respected except the lone-oversized-doc bin
        assert b["fill_units"] <= MM_PACK_CAPACITY or b["n_docs"] == 1
    engine.clear_caches(spark)


def test_multimodal_pack_oracle_parity(spark):
    con = duckdb_con(SF_DIR)
    import __spark_entry__ as entry

    name = "multimodal_pack_interleaved"
    compare(
        engine.all_queries()[name](spark, SF_DIR), con, entry.oracle_sql()[name]
    )
    engine.clear_caches(spark)


# ---------------------------------------------------------------------------
# BPE step 3 (compression after learned merges): per-source ledger equals a
# pure-Python re-application of the same merges.
# ---------------------------------------------------------------------------


def _python_bpe_compression(rows: list[tuple[str, str]], rounds: int):
    """rows = (source, text).  Returns {source: (n_pretokens, n_chars,
    n_bpe_symbols)} after applying the corpus-global merges."""
    from etl_pipeline_aws_spark.llm.text import BPE_PRETOKEN_PATTERN

    merges = _python_bpe_merges([t for _, t in rows], rounds)
    pat = re.compile(BPE_PRETOKEN_PATTERN)

    def encode_len(tok: str) -> int:
        syms = list(tok)
        for _, left, right, _ in merges:
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            syms = out
        return len(syms)

    cache: dict[str, int] = {}
    per_src: dict[str, list[int]] = {}
    for source, text in rows:
        acc = per_src.setdefault(source, [0, 0, 0])
        for tok in pat.findall(text or ""):
            if "\x01" in tok:
                continue
            if tok not in cache:
                cache[tok] = encode_len(tok)
            acc[0] += 1
            acc[1] += len(tok)
            acc[2] += cache[tok]
    return {s: tuple(v) for s, v in per_src.items()}


def test_bpe_compression_matches_python_reference(spark):
    from etl_pipeline_aws_spark.catalog import load_table
    from etl_pipeline_aws_spark.llm.text import BPE_MERGE_ROUNDS

    rows = [
        (r["source"], r["text"])
        for r in load_table(spark, SF_DIR, "documents")
        .select("source", "text")
        .collect()
    ]
    want = _python_bpe_compression(rows, BPE_MERGE_ROUNDS)
    got = {
        r["source"]: (r["n_pretokens"], r["n_chars"], r["n_bpe_symbols"])
        for r in engine.all_queries()["text_bpe_compression_by_source"](
            spark, SF_DIR
        ).collect()
    }
    assert got == want
    # merges only ever shrink, never below one symbol per pretoken
    for n_pre, n_chars, n_sym in got.values():
        assert n_pre <= n_sym <= n_chars
    engine.clear_caches(spark)


# ---------------------------------------------------------------------------
# IVF nprobe recall sweep: numpy recompute + monotonicity invariant.
# ---------------------------------------------------------------------------


def _numpy_ivf_recall(emb, cells, n_queries, top_k, nprobes):
    import numpy as np

    emb = emb.sort_values("vec_id")
    ids = emb.vec_id.to_numpy()
    v = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    nrm = np.sqrt((v * v).sum(axis=1))
    cv = v[np.argsort(ids)[:cells]]
    d = ((v[:, None, :] - cv[None, :, :]) ** 2).sum(axis=2)
    asg = d.argmin(axis=1)  # ties -> lowest cl (numpy default)
    cos = (v @ v.T) / np.outer(nrm, nrm)
    out = {}
    qmask = ids < n_queries
    for np_ in nprobes:
        hits = 0
        for qi in np.where(qmask)[0]:
            order = sorted(
                [j for j in range(len(ids)) if ids[j] != ids[qi]],
                key=lambda j: (-cos[qi, j], ids[j]),
            )
            exact = {ids[j] for j in order[:top_k]}
            cnrm = np.sqrt((cv * cv).sum(axis=1))
            ccos = (cv @ v[qi]) / (cnrm * nrm[qi])
            probe_cells = sorted(range(cells), key=lambda c: (-ccos[c], c))[:np_]
            cand = [
                j
                for j in range(len(ids))
                if asg[j] in probe_cells and ids[j] != ids[qi]
            ]
            cand.sort(key=lambda j: (-cos[qi, j], ids[j]))
            got = {ids[j] for j in cand[:top_k]}
            hits += len(exact & got)
        out[np_] = hits
    return out


def test_similarity_ivf_nprobe_recall_matches_numpy(spark):
    import pandas as pd

    from etl_pipeline_aws_spark.llm.similarity import (
        IVF_EVAL_CELLS,
        IVF_EVAL_NPROBES,
        N_QUERIES,
        TOP_K,
    )

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    want = _numpy_ivf_recall(
        emb, IVF_EVAL_CELLS, N_QUERIES, TOP_K, IVF_EVAL_NPROBES
    )
    rows = {
        r["nprobe"]: r
        for r in engine.all_queries()["similarity_ivf_nprobe_recall"](
            spark, SF_DIR
        ).collect()
    }
    assert set(rows) == set(IVF_EVAL_NPROBES)
    for np_ in IVF_EVAL_NPROBES:
        assert rows[np_]["hits"] == want[np_], np_
        assert abs(rows[np_]["recall"] - want[np_] / (N_QUERIES * TOP_K)) < 1e-12
    # the operating curve must be monotone: more probes never lose recall
    probes = sorted(IVF_EVAL_NPROBES)
    for a, b in zip(probes, probes[1:]):
        assert rows[a]["hits"] <= rows[b]["hits"]
    engine.clear_caches(spark)


def test_similarity_ivf_nprobe_recall_oracle_parity(spark):
    con = duckdb_con(SF_DIR)
    import __spark_entry__ as entry

    name = "similarity_ivf_nprobe_recall"
    compare(
        engine.all_queries()[name](spark, SF_DIR), con, entry.oracle_sql()[name]
    )
    engine.clear_caches(spark)


# ---------------------------------------------------------------------------
# Soft-dedup weights: mass conservation + cross-operator parity with the
# hard-dedup keeper assignment (same CC kernel, same pair source).
# ---------------------------------------------------------------------------


def test_dedup_soft_weights_mass_and_keeper_parity(spark):
    from pyspark.sql import functions as F

    from etl_pipeline_aws_spark.catalog import load_table

    qs = engine.all_queries()
    soft = qs["dedup_soft_weights"](spark, SF_DIR).collect()
    # retention bounded and exact per-row arithmetic
    for r in soft:
        assert 0 < r["retention"] <= 1.0
        assert r["weight_sum_ppm"] <= r["n_docs"] * 1_000_000
        assert r["weight_sum_ppm"] == round(r["retention"] * r["n_docs"] * 1_000_000)
    engine.clear_caches(spark)
    # every member of a >=2 cluster is exactly a row of the keepers output
    keepers = qs["dedup_cluster_keepers"](spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    per_src = {
        r["source"]: r["n"]
        for r in keepers.join(docs, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in soft:
        assert r["n_dup_members"] == per_src.get(r["source"], 0), r["source"]
    engine.clear_caches(spark)
