"""Round-6 invariants: gate-dir oracle templating, the exact sliding-distinct
twin, and microsecond-precise gap thresholds.

1. The two table-function-path oracles (source_file_lineage,
   source_binaryfile_scan) resolve their embedded path from
   $ETL_SPARK_GATE_SF_DIR at oracle_sql() call time — a gate run at an
   alternate scale factor stays value-correct instead of silently
   comparing against the wrong dataset (closes the r4/r5 ADVICE item).
2. agg_sliding_distinct_exact is the oracle-backed twin of the rows-only
   HLL tier; the HLL estimate must stay within 5% of it day-by-day.
3. The sessionization/gap family compares timestamps at MICROSECOND
   precision, matching the oracles' exact INTERVAL comparison (r5 ADVICE:
   second-truncated diffs mis-classify gaps in (1800 s, 1801 s)).
"""

from __future__ import annotations

import importlib

import pytest

import etl_pipeline_aws_spark as engine
from pyspark.sql import functions as F
from tests.conftest import SF_DIR, SF_SMALL
from tests.oracle import compare, duckdb_con


@pytest.mark.parametrize("name", ["source_file_lineage", "source_binaryfile_scan"])
def test_gate_path_oracles_follow_env_at_alternate_sf(spark, name, monkeypatch):
    """Run both path-embedding oracles at sf0.001 (NOT the default gate dir)
    purely through the env knob — the oracle template must follow."""
    monkeypatch.setenv("ETL_SPARK_GATE_SF_DIR", SF_SMALL)
    sql = engine.oracle_sql()[name]
    assert SF_SMALL in sql  # template resolved against the env var
    con = duckdb_con(SF_SMALL)
    try:
        compare(engine.all_queries()[name](spark, SF_SMALL), con, sql)
    finally:
        con.close()


def test_gate_path_oracles_default_to_driver_gate_dir(monkeypatch):
    monkeypatch.delenv("ETL_SPARK_GATE_SF_DIR", raising=False)
    src = importlib.import_module("etl_pipeline_aws_spark.sources.source_queries")
    assert src.gate_sf_dir() == "/root/testdata/sf0.01"
    assert "/root/testdata/sf0.01" in engine.oracle_sql()["source_file_lineage"]


def test_hll_sliding_within_5pct_of_exact_twin(spark):
    """The rows-only HLL tier and its new oracle-backed exact twin answer
    the same trailing-7-day question; the sketch estimate must track the
    exact count within the documented 5% envelope on every anchor day."""
    from tests.conftest import SF_DIR

    exact = {
        r.anchor_day: r.trailing_users
        for r in engine.all_queries()["agg_sliding_distinct_exact"](spark, SF_DIR).collect()
    }
    approx = {
        r.anchor_day: r.approx_trailing_users
        for r in engine.all_queries()["agg_hll_sliding_distinct"](spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= 0.05 * n, (day, approx[day], n)


def test_funnel_by_cohort_zero_conversion_emits_zero(spark):
    """A cohort with no conversions must report n_converted = 0, never
    NULL (r5 ADVICE: F.sum(when(...)) with no otherwise yields NULL and
    silently diverges from the oracle's COUNT(CASE ...))."""
    from tests.conftest import SF_DIR

    rows = engine.all_queries()["events_funnel_by_cohort"](spark, SF_DIR).collect()
    assert rows
    assert all(r.n_converted is not None for r in rows)


def test_gap_thresholds_are_microsecond_precise(spark):
    """A synthetic pair of events 1800.5 s apart (floor-diff exactly 1800)
    must NOT break a 30-minute-gap session: the boundary case the oracles'
    INTERVAL comparison already gets right."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00.700000"),
            (1, "2024-01-01 00:30:01.200000"),  # gap = 1800.5 s, floor-diff 1800
            (1, "2024-01-01 01:00:01.100000"),  # gap = 1799.9 s, floor-diff 1800
        ],
        "user_id int, ts_s string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"))
    wl = Window.partitionBy("user_id").orderBy("ts")
    marked = df.select(
        F.when(
            F.lag("ts").over(wl).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wl))
                > 30 * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_start")
    )
    flags = [r.is_start for r in marked.collect()]
    # first row starts; 1800.5 s gap breaks; 1799.9 s gap does not
    assert flags == [1, 1, 0]


def test_cusum_charts_nonnegative_and_flag_consistent(spark):
    """Both CUSUM charts are >= 0 by the reset identity, and the drift
    flag is exactly 'either chart exceeds one average day's excess'."""
    rows = engine.all_queries()["events_cusum_changepoint"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    total = sum(r.daily_events for r in rows) * 1  # scaled units: total
    for r in rows:
        assert r.cusum_pos >= 0 and r.cusum_neg >= 0
        assert r.is_drift == (r.cusum_pos > total or r.cusum_neg > total)


def test_hhi_definitional_bounds(spark):
    """HHI in ppm lies in (0, 1e6]; a single-supplier market is exactly
    1e6; and HHI >= top_share^2/1e6 (the top supplier's own square)."""
    rows = engine.all_queries()["parts_supplier_hhi"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    for r in rows:
        assert 0 < r.hhi_ppm <= 1_000_000
        assert r.top_share_ppm <= 1_000_000
        if r.n_suppliers == 1:
            assert r.hhi_ppm == 1_000_000 and r.top_share_ppm == 1_000_000
        assert r.hhi_ppm >= (r.top_share_ppm * r.top_share_ppm) // 1_000_000 - 1


def test_consecutive_pattern_is_subset_of_funnel_users(spark):
    """A user with a strict view->click->purchase triple necessarily has
    view-before-purchase in the loose ordered sense too."""
    import pyspark.sql.functions as F

    from etl_pipeline_aws_spark.catalog import load_table

    sf = "/root/testdata/sf0.01"
    strict = {
        r.user_id
        for r in engine.all_queries()["events_consecutive_pattern"](spark, sf).collect()
    }
    ev = load_table(spark, sf, "events")
    loose = {
        r.user_id
        for r in ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v"),
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"),
        )
        .filter(F.col("p") >= F.col("v"))
        .collect()
    }
    assert strict, "fixture should contain at least one strict triple"
    assert strict <= loose


def test_ivm_retraction_matches_insert_only_on_no_deletes(spark):
    """With an empty changelog the Z-set merge must reproduce V(base)
    exactly — linearity's zero case, checked against the insert-only
    maintainer over the same base."""
    import pyspark.sql.functions as F

    from etl_pipeline_aws_spark.catalog import load_table

    sf = "/root/testdata/sf0.01"
    zset = {
        r.nation: (r.n_orders, r.revenue)
        for r in engine.all_queries()["ivm_retraction_zset"](spark, sf).collect()
    }
    # direct recompute of the post-change state (the oracle's shape)
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    post = (
        orders.filter(F.col("o_orderkey") % 7 != 0)
        .select(
            "o_custkey",
            F.when(F.col("o_orderkey") % 10 == 0, price * F.lit("1.1").cast("decimal(4,1)"))
            .otherwise(price.cast("decimal(19,3)"))
            .alias("p"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p").cast("double").alias("rev"),
        )
    )
    direct = {r.nation: (r.n, r.rev) for r in post.collect()}
    assert zset == direct


def test_stat_tests_semantic_invariants(spark):
    """The four hypothesis-test operators obey their defining identities
    on the fixture data (oracle parity alone can't distinguish 'both
    engines wrong the same way' from 'right'):

    - KS D is a probability-scale gap: 0 <= D <= 1.
    - Mann-Whitney: 2*U1 is integral (tie-averaged ranks halve exactly),
      0 <= U1 <= n1*n2, and u_mean is the null-hypothesis midpoint.
    - Welch: t shares mean_diff's sign; Welch-Satterthwaite df lies in
      [min(n1,n2)-1, n1+n2-2].
    - Chi-square: statistic >= 0; dof = (r-1)(c-1) from the fixture's
      5 event types x 7 day buckets.
    """
    from tests.conftest import SF_DIR

    qs = engine.all_queries()
    ks = qs["stat_ks_two_sample"](spark, SF_DIR).collect()[0]
    assert 0.0 <= ks.ks_d <= 1.0 and ks.n1 > 0 and ks.n2 > 0

    mw = qs["stat_mann_whitney_u"](spark, SF_DIR).collect()[0]
    assert (2 * mw.u1) == int(2 * mw.u1)
    assert 0.0 <= mw.u1 <= mw.n1 * mw.n2
    assert mw.u_mean == mw.n1 * mw.n2 / 2

    tt = qs["stat_welch_ttest"](spark, SF_DIR).collect()[0]
    assert (tt.t_stat >= 0) == (tt.mean_diff >= 0)
    assert min(tt.n1, tt.n2) - 1 <= tt.welch_df <= tt.n1 + tt.n2 - 2

    chi = qs["stat_chi_square_independence"](spark, SF_DIR).collect()[0]
    assert chi.chi2 >= 0.0
    assert chi.dof == 24 and chi.n_cells <= 35


def test_timeseries_semantic_invariants(spark):
    """The time-series family obeys its defining shape constraints:

    - OHLC: low <= open/close <= high, every bar has ticks.
    - Realized volatility is non-negative with >= 2 returns per type.
    - Rolling correlation is a correlation: |r| <= 1 (+ float slack).
    - Pareto frontier: walking days ascending, frontier prices strictly
      DECREASE (otherwise the later day would dominate the earlier),
      and the globally most expensive order is always on the frontier.
    """
    from tests.conftest import SF_DIR

    qs = engine.all_queries()
    for bar in qs["events_ohlc_bars"](spark, SF_DIR).collect():
        assert bar.low <= bar.open <= bar.high
        assert bar.low <= bar.close <= bar.high
        assert bar.n_ticks >= 1

    for row in qs["events_realized_volatility"](spark, SF_DIR).collect():
        assert row.daily_vol >= 0.0 and row.n_returns >= 2

    for row in qs["window_rolling_corr"](spark, SF_DIR).collect():
        assert abs(row.rolling_r) <= 1.0 + 1e-9 and row.n_days == 7

    frontier = sorted(
        qs["orders_pareto_frontier"](spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    prices = [r.frontier_price for r in frontier]
    assert all(a > b for a, b in zip(prices, prices[1:]))
    from pyspark.sql import functions as F

    from etl_pipeline_aws_spark.catalog import load_table

    global_max = (
        load_table(spark, SF_DIR, "orders")
        .agg(F.max("o_totalprice").alias("m"))
        .collect()[0]
        .m
    )
    assert max(prices) == global_max


def test_feature_engineering_invariants(spark):
    """Encoding/clipping semantics pinned beyond oracle parity:

    - Target encoding shrinks every segment TOWARD the global mean:
      encoded lies strictly between raw_mean and the prior (or equals
      both when they coincide).
    - Winsorization: p01 <= p99, clipped mean moves toward the center,
      n_clipped < n (clipping never rewrites a whole group).
    - Category capping emits at most 4 distinct feature keys and
      conserves the total event count exactly.
    """
    from tests.conftest import SF_DIR

    qs = engine.all_queries()
    enc = qs["feature_target_encoding"](spark, SF_DIR).collect()
    prior = sum(r.raw_mean * r.n_g for r in enc) / sum(r.n_g for r in enc)
    for r in enc:
        lo, hi = sorted((r.raw_mean, prior))
        assert lo - 1e-6 <= r.encoded <= hi + 1e-6

    for r in qs["feature_winsorize"](spark, SF_DIR).collect():
        assert r.p01 <= r.p99
        assert 0 <= r.n_clipped < r.n
        assert min(r.p01, r.raw_mean) - 1e-9 <= r.winsorized_mean <= max(r.p99, r.raw_mean) + 1e-9

    rows = qs["feature_category_capping"](spark, SF_DIR).collect()
    keys = {r.feature_key for r in rows}
    assert len(keys) <= 4 and "other" in keys
    from etl_pipeline_aws_spark.catalog import load_table

    total = load_table(spark, SF_DIR, "events").count()
    assert sum(r.n for r in rows) == total


def test_k_core_defining_predicates(spark):
    """graph_k_core is rows-only; pin it by the k-core's CHARACTERIZING
    predicates, which identify the unique maximal min-degree->=k
    subgraph exactly (an equivalent-strength substitute for an oracle):

    - every kept node's reported core_degree equals its recomputed
      neighbor count within the kept set, and is >= k;
    - every graph node NOT kept has < k neighbors within the kept set
      (maximality: nothing peelable was left out).
    """
    from collections import defaultdict

    from tests.conftest import SF_DIR

    from etl_pipeline_aws_spark.catalog import load_table
    from etl_pipeline_aws_spark.operators.graph import (
        KCORE_K,
        LP_MIN_SUPPORT,
        co_occurrence_pairs,
    )

    qs = engine.all_queries()
    kept = {
        r.p_partkey: r.core_degree
        for r in qs["graph_k_core"](spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    pairs = co_occurrence_pairs(li, LP_MIN_SUPPORT, distinct_items=False)
    adj = defaultdict(set)
    for r in pairs.collect():
        adj[r.pa].add(r.pb)
        adj[r.pb].add(r.pa)
    assert kept, "fixture graph must have a non-empty 3-core"
    for node, deg in kept.items():
        in_core = sum(1 for nb in adj[node] if nb in kept)
        assert deg == in_core and deg >= KCORE_K
    for node in adj:
        if node not in kept:
            assert sum(1 for nb in adj[node] if nb in kept) < KCORE_K


def test_bitmap_retention_equals_join_based_retention(spark):
    """The 8-byte-mask retention triangle must agree cell-for-cell with
    the join-based events_retention_cohorts on offsets 0..6 — same
    distinct-user semantics computed by a completely different plan
    (bit tests over per-user masks vs an events x firsts join).

    The mask query indexes OBSERVED days; the join query uses calendar
    days.  The fixture's event span is verified contiguous first, so
    the two index spaces coincide and every translated cell must match
    exactly (including absent cells <-> zero retained).
    """
    import datetime as dt

    from tests.conftest import SF_DIR

    from etl_pipeline_aws_spark.catalog import load_table

    qs = engine.all_queries()
    days = sorted(
        r.day
        for r in load_table(spark, SF_DIR, "events")
        .selectExpr("CAST(ts AS DATE) AS day")
        .distinct()
        .collect()
    )
    assert days == [
        days[0] + dt.timedelta(days=i) for i in range(len(days))
    ], "fixture day span must be contiguous for index<->calendar equivalence"

    joined = {
        (r.cohort_day, r.day_offset): r.n_active
        for r in qs["events_retention_cohorts"](spark, SF_DIR).collect()
        if 0 <= r.day_offset <= 6
    }
    bitmap = qs["events_bitmap_retention"](spark, SF_DIR).collect()
    assert bitmap, "bitmap retention returned no cells"
    cohort_sizes = {}
    for r in bitmap:
        cohort_day = days[r.cohort_day_index]
        if r.cohort_day_index + r.day_offset < len(days):
            assert r.retained_users == joined.get((cohort_day, r.day_offset), 0)
        cohort_sizes.setdefault(r.cohort_day_index, set()).add(r.cohort_users)
    # each cohort reports ONE size across its 7 offsets, and day-0
    # retention is total: everyone is active on their own first day
    for r in bitmap:
        assert len(cohort_sizes[r.cohort_day_index]) == 1
        if r.day_offset == 0:
            assert r.retained_users == r.cohort_users


def test_stat_family_identities(spark):
    """Cross-operator identities pin the new statistics trio to the
    established tests rather than just to their oracles:

    - AUC from the rank identity must equal U1/(n1*n2) computed by
      stat_mann_whitney_u (same pooled ranking, same tie rule), and
      gini = 2*auc - 1.
    - ANOVA on exactly 2 groups collapses to the squared pooled t — not
      run here (our ANOVA is 5-group); instead pin the F > 0 and the
      SST = SSB + SSW identity against exact decimal grand sums.
    - Brown-Forsythe W is a valid F-ratio: finite and > 0 on the
      fixture (priorities genuinely differ in spread).
    """
    from tests.conftest import SF_DIR

    qs = engine.all_queries()
    auc_row = qs["stat_auc_roc"](spark, SF_DIR).collect()[0]
    mwu_row = qs["stat_mann_whitney_u"](spark, SF_DIR).collect()[0]
    assert auc_row.n_pos == mwu_row.n1 and auc_row.n_neg == mwu_row.n2
    assert auc_row.auc == mwu_row.u1 / (mwu_row.n1 * mwu_row.n2)
    assert abs(auc_row.gini - (2 * auc_row.auc - 1)) < 1e-15
    assert 0.0 <= auc_row.auc <= 1.0

    f_row = qs["stat_anova_oneway"](spark, SF_DIR).collect()[0]
    assert f_row.k == 5 and f_row.f_stat > 0
    assert f_row.ss_between > 0 and f_row.ss_within > 0
    # SSB is tiny relative to SSW (priority barely moves price in the
    # fixture) — the decomposition must still be consistent: total
    # variance from the raw data equals SSB+SSW to rounding tolerance
    # (bterm rounds at scale 0: k=5 rounds of <=0.5 each).
    from etl_pipeline_aws_spark.catalog import load_table

    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("x")
    )
    agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(30,2)").alias("s"),
        F.sum(F.expr("x * x")).cast("decimal(38,4)").alias("q"),
    ).collect()[0]
    sst = float(agg.q) - float(agg.s) ** 2 / agg.n
    assert abs(sst - (f_row.ss_between + f_row.ss_within)) <= 5.0

    w_row = qs["stat_levene_brown_forsythe"](spark, SF_DIR).collect()[0]
    assert w_row.k == 5 and w_row.n_total == f_row.n_total
    assert w_row.w_stat > 0 and w_row.w_stat == w_row.w_stat  # finite, not NaN


def test_theil_sen_and_binseg_against_bruteforce(spark):
    """Recompute both new time-series estimators brute-force in Python
    from the same daily cents series and demand exact agreement."""
    from tests.conftest import SF_DIR

    qs = engine.all_queries()
    daily = sorted(
        (r.day, int(r.cents))
        for r in engine_daily_cents(spark, SF_DIR).collect()
    )
    days0 = daily[0][0]
    pts = [((d - days0).days, c) for d, c in daily]

    slopes = sorted(
        (cj - ci) / (dj - di)
        for i, (di, ci) in enumerate(pts)
        for dj, cj in pts[i + 1:]
    )
    n = len(slopes)
    # discrete median, lower-middle convention (cume_dist >= 0.5)
    expect_med = slopes[(n - 1) // 2] if n % 2 else slopes[n // 2 - 1]
    ts_row = qs["events_theil_sen_trend"](spark, SF_DIR).collect()[0]
    assert ts_row.n_pairs == n
    assert ts_row.slope_cents_per_day == expect_med

    # binseg: maximize (S_l*n_r - S_r*n_l)^2 / (i*(n-i)*n), earliest day ties
    N = len(pts)
    s_all = sum(c for _, c in pts)
    best = None
    s_left = 0
    for i in range(1, N):
        s_left += pts[i - 1][1]
        diff = s_left * (N - i) - (s_all - s_left) * i
        gain = float(diff) * float(diff) / (i * (N - i) * N)
        if best is None or gain > best[0]:
            best = (gain, i, s_left)
    bs_row = qs["events_changepoint_binseg"](spark, SF_DIR).collect()[0]
    assert bs_row.n_left == best[1] and bs_row.n_right == N - best[1]
    assert bs_row.mean_left == best[2] / best[1] / 100
    assert bs_row.gain_sq_dollars == best[0] / 10000


def engine_daily_cents(spark, sf_dir):
    from etl_pipeline_aws_spark.catalog import load_table

    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
    )


def test_permutation_checksum_planner_mad_invariants(spark):
    """Pin the round-6 batch-2 operators to independent recomputations
    and cross-operator identities."""
    from tests.conftest import SF_DIR

    from etl_pipeline_aws_spark.catalog import load_table
    from etl_pipeline_aws_spark.operators.quality import (
        CHECKSUM_BLOCK,
        CHECKSUM_P,
    )
    from etl_pipeline_aws_spark.operators.scale import RANGE_PARTS
    from etl_pipeline_aws_spark.operators.statistics import PERM_K
    from etl_pipeline_aws_spark.operators.timeseries import MAD_K_X10000

    qs = engine.all_queries()

    # permutation test: valid p, full K, and t_obs == Welch's |mean_diff|
    # (same two groups, same exact-decimal means)
    p_row = qs["stat_permutation_shift"](spark, SF_DIR).collect()[0]
    assert p_row.k_perms == PERM_K
    assert 0 < p_row.p_upper <= 1
    assert p_row.p_upper == (1 + p_row.n_extreme) / (PERM_K + 1)
    w_row = qs["stat_welch_ttest"](spark, SF_DIR).collect()[0]
    assert p_row.t_obs == abs(w_row.mean_diff)

    # block checksums: blocks partition the table; one block recomputed
    # row-by-row in Python matches exactly
    blocks = qs["dq_block_checksums"](spark, SF_DIR).collect()
    orders = load_table(spark, SF_DIR, "orders")
    assert sum(b.n_rows for b in blocks) == orders.count()
    target = blocks[len(blocks) // 2]
    rows = (
        orders.filter(
            (F.col("o_orderkey") >= target.block * CHECKSUM_BLOCK)
            & (F.col("o_orderkey") < (target.block + 1) * CHECKSUM_BLOCK)
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .collect()
    )
    assert len(rows) == target.n_rows
    c1 = sum(
        ((r.o_orderkey % CHECKSUM_P) * 8191
         + (r.o_custkey % CHECKSUM_P) * 127
         + round(r.o_totalprice * 100) % CHECKSUM_P) % CHECKSUM_P
        for r in rows
    )
    assert c1 == target.checksum_a

    # range partition plan: contiguous non-overlapping fences, full cover
    parts = sorted(
        qs["layout_range_partition_plan"](spark, SF_DIR).collect(),
        key=lambda r: r.partition_id,
    )
    assert [p.partition_id for p in parts] == list(range(1, RANGE_PARTS + 1))
    assert sum(p.n_rows for p in parts) == orders.count()
    for a, b in zip(parts, parts[1:]):
        assert a.hi_key < b.lo_key
    # roughly balanced on the fixture's near-uniform custkey
    assert all(50 <= p.pct_of_ideal <= 200 for p in parts)

    # MAD outliers: every flagged day satisfies the integer gate against
    # brute-force medians; no unflagged day does
    daily = {}
    for r in (
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
        .collect()
    ):
        daily.setdefault(r.event_type, {})[r.day] = r.cents

    def disc_median(vals):
        s = sorted(vals)
        n = len(s)
        return s[(n - 1) // 2] if n % 2 else s[n // 2 - 1]

    expect = set()
    for et, series in daily.items():
        med = disc_median(series.values())
        mad = disc_median(abs(c - med) for c in series.values())
        for day, c in series.items():
            if abs(c - med) * 10000 > MAD_K_X10000 * mad:
                expect.add((et, day))
    got = {
        (r.event_type, r.day)
        for r in qs["events_mad_outlier_days"](spark, SF_DIR).collect()
    }
    assert got == expect


def test_link_prediction_and_rolling_median_bruteforce(spark):
    """Brute-force recomputation pins for batch 3."""
    import datetime as dt
    from collections import defaultdict

    from tests.conftest import SF_DIR

    from etl_pipeline_aws_spark.operators.graph import (
        LP_MIN_CN,
        LP_MIN_SUPPORT,
        LP_RA_SCALE,
        co_occurrence_pairs,
    )
    from etl_pipeline_aws_spark.catalog import load_table
    from etl_pipeline_aws_spark.operators.timeseries import ROLLMED_W

    qs = engine.all_queries()

    # RA link prediction vs Python adjacency recomputation
    li = load_table(spark, SF_DIR, "lineitem")
    adj = defaultdict(set)
    for r in co_occurrence_pairs(li, LP_MIN_SUPPORT, distinct_items=False).collect():
        adj[r.pa].add(r.pb)
        adj[r.pb].add(r.pa)
    expect = {}
    nodes = sorted(adj)
    for a in nodes:
        cand = defaultdict(list)
        for z in adj[a]:
            for b in adj[z]:
                if b > a and b not in adj[a]:
                    cand[b].append(z)
        for b, zs in cand.items():
            if len(zs) >= LP_MIN_CN:
                expect[(a, b)] = (
                    len(zs),
                    sum(LP_RA_SCALE // len(adj[z]) for z in zs),
                )
    got = {
        (r.u, r.v): (r.common_neighbors, r.ra_index_ppb)
        for r in qs["graph_link_prediction_ra"](spark, SF_DIR).collect()
    }
    assert got == expect and got, "RA prediction must match brute force"

    # rolling 7-day median vs brute force
    daily = {
        r.day: r.cents
        for r in engine_daily_cents(spark, SF_DIR).collect()
    }
    got_med = {
        r.day: (r.n_days, r.median_cents)
        for r in qs["window_rolling_median_7d"](spark, SF_DIR).collect()
    }
    for day in daily:
        window = [
            daily[day - dt.timedelta(days=k)]
            for k in range(ROLLMED_W)
            if day - dt.timedelta(days=k) in daily
        ]
        if len(window) == ROLLMED_W:
            s = sorted(window)
            assert got_med[day] == (ROLLMED_W, s[(ROLLMED_W - 1) // 2])
        else:
            assert day not in got_med
    assert got_med


def test_additive_decomposition_identity_and_trend(spark):
    """events_decompose_additive: the additive identity must hold EXACTLY
    per row (integer cents), the trend must equal the rolling-median
    query's value on shared days, and the seasonal component must be
    constant within each dow bucket."""
    from tests.conftest import SF_DIR

    qs = engine.all_queries()
    rows = qs["events_decompose_additive"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.cents == r.trend_cents + r.seasonal_cents + r.residual_cents
    med = {
        r.day: r.median_cents
        for r in qs["window_rolling_median_7d"](spark, SF_DIR).collect()
    }
    seas = {}
    for r in rows:
        assert med[r.day] == r.trend_cents
        bucket = r.day.day % 7
        seas.setdefault(bucket, set()).add(r.seasonal_cents)
    assert all(len(v) == 1 for v in seas.values())


def test_readability_and_otif_invariants(spark):
    """Pin batch-5 operators with recomputation and bound checks."""
    import re as _re

    from tests.conftest import SF_DIR

    from etl_pipeline_aws_spark.catalog import load_table
    from etl_pipeline_aws_spark.operators.analytics import OTIF_SLA_DAYS

    qs = engine.all_queries()

    # readability: recompute a sample of documents in Python
    docs = {r.doc_id: r.text for r in load_table(spark, SF_DIR, "documents")
            .select("doc_id", "text").limit(50).collect()}
    got = {
        r.doc_id: r
        for r in qs["text_readability_fk"](spark, SF_DIR).collect()
    }
    assert len(got) == load_table(spark, SF_DIR, "documents").count()
    for doc_id, text in docs.items():
        r = got[doc_id]
        sents = max(len(_re.findall(r"[.!?]+", text)), 1)
        words = max(len(text.split(" ")), 1)
        syls = len(_re.findall(r"[aeiouy]+", text.lower()))
        assert (r.n_sentences, r.n_words, r.n_syllables) == (sents, words, syls)
        assert r.fk_grade == 0.39 * (words / sents) + 11.8 * (syls / words) - 15.59

    # OTIF: bounds, conjunction <= min(parts), and a full-table identity
    rows = qs["supplier_otif_scorecard"](spark, SF_DIR).collect()
    assert rows
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r.n_lines for r in rows) == li.count()
    for r in rows:
        assert 0 <= r.otif_bp <= min(r.on_time_bp, r.in_full_bp)
        assert (r.worst_delay_days > 0) <= (r.total_delay_days >= r.worst_delay_days)
        if r.on_time_bp == 10000:
            assert r.total_delay_days == 0, "all on time => no delay mass"
    # SLA constant actually bites on the fixture: some late lines exist
    assert any(r.on_time_bp < 10000 for r in rows), OTIF_SLA_DAYS


def test_bitemporal_restatement_axes(spark):
    """The bitemporal contract, month class by month class:

    - months starting after K1 exist only in the later knowledge slice
      (nothing about them was known yet);
    - fully-settled months (every order AND its lagged restatement known
      by K1) agree EXACTLY across slices — counts and revenue;
    - the partially-settled window around K1 must show revenue drift
      (base rows known, restatements not) — the report's entire point;
    - restatements only raise revenue, never change counts, on every
      shared month.
    """
    import datetime as dt
    from decimal import Decimal

    from tests.conftest import SF_DIR

    from etl_pipeline_aws_spark.operators.merge import (
        BT_K1,
        BT_RESTATE_LAG_DAYS,
    )

    qs = engine.all_queries()
    rows = qs["bitemporal_restatement"](spark, SF_DIR).collect()
    k1 = dt.date.fromisoformat(BT_K1)
    slices = {}
    for r in rows:
        m = r.order_month.date() if hasattr(r.order_month, "date") else r.order_month
        slices.setdefault(r.knowledge_date, {})[m] = (
            r.n_orders,
            Decimal(str(r.revenue)),
        )
    assert len(slices) == 2
    s1 = slices[k1]
    s2 = slices[max(slices)]
    assert set(s1) <= set(s2), "K1 slice holds a prefix of valid months"
    for m in s2:
        if m not in s1:
            assert m > k1.replace(day=1), "missing months must postdate K1"
    drift = 0
    for m, (n1, rev1) in s1.items():
        n2, rev2 = s2[m]
        assert n1 <= n2 and rev2 >= rev1
        next_month = (m + dt.timedelta(days=32)).replace(day=1)
        if next_month + dt.timedelta(days=BT_RESTATE_LAG_DAYS) <= k1:
            assert (n1, rev1) == (n2, rev2), f"settled month {m} drifted"
        if rev1 != rev2:
            drift += 1
    assert drift > 0, "fixture must exercise restatement drift"


def test_ldiversity_and_backtest_invariants(spark):
    """Batch-7 pins: l-diversity against k-anonymity's class table and
    the backtest against a Python recomputation."""
    import datetime as dt

    from tests.conftest import SF_DIR

    from etl_pipeline_aws_spark.operators.quality import LDIV_L
    from etl_pipeline_aws_spark.operators.timeseries import BACKTEST_LAG_DAYS

    qs = engine.all_queries()

    ld = qs["dq_l_diversity"](spark, SF_DIR).collect()
    assert ld
    for r in ld:
        assert 1 <= r.l_distinct <= r.class_size
        assert r.below_l == (1 if r.l_distinct < LDIV_L else 0)
    from etl_pipeline_aws_spark.catalog import load_table

    assert sum(r.class_size for r in ld) == load_table(
        spark, SF_DIR, "customer"
    ).count()

    daily = {}
    for r in engine_daily_cents_by_type(spark, SF_DIR).collect():
        daily.setdefault(r.event_type, {})[r.day] = r.cents
    got = {
        r.event_type: r
        for r in qs["events_seasonal_naive_backtest"](spark, SF_DIR).collect()
    }
    for et, series in daily.items():
        pairs = [
            (c, series[d - dt.timedelta(days=BACKTEST_LAG_DAYS)])
            for d, c in series.items()
            if d - dt.timedelta(days=BACKTEST_LAG_DAYS) in series
        ]
        if not pairs:
            assert et not in got
            continue
        r = got[et]
        assert r.n_scored_days == len(pairs)
        assert r.mae_cents == sum(abs(a - f) for a, f in pairs) // len(pairs)
        assert r.mape_bp == (
            sum(abs(a - f) * 10000 // a for a, f in pairs) // len(pairs)
        )
        assert r.n_over_forecast == sum(1 for a, f in pairs if f > a)


def engine_daily_cents_by_type(spark, sf_dir):
    from etl_pipeline_aws_spark.catalog import load_table

    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
    )


def test_ml_eval_family_consistency(spark):
    """The three eval tiers (AUC / calibration / confusion) must agree
    on the same underlying scorer and labels."""
    from tests.conftest import SF_DIR

    qs = engine.all_queries()
    auc = qs["stat_auc_roc"](spark, SF_DIR).collect()[0]

    calib = sorted(
        qs["ml_calibration_bins"](spark, SF_DIR).collect(),
        key=lambda r: r.score_decile,
    )
    # note: AUC restricts to URGENT vs LOW; calibration runs over ALL
    # orders, so only the positive totals must relate: calib positives
    # equal AUC's n_pos (URGENT count is the same population)
    assert sum(r.n_pos for r in calib) == auc.n_pos
    for r in calib:
        assert r.pos_rate_bp == r.n_pos * 10000 // r.n
    # a price-based scorer of priority is ~uncalibrated/noninformative:
    # don't assert monotonicity, just coverage of all 10 deciles
    assert [r.score_decile for r in calib] == list(range(1, 11))

    conf = qs["ml_confusion_threshold"](spark, SF_DIR).collect()[0]
    assert conf.tp + conf.fn == auc.n_pos
    from etl_pipeline_aws_spark.catalog import load_table

    assert conf.tp + conf.fp + conf.fn + conf.tn == load_table(
        spark, SF_DIR, "orders"
    ).count()
    assert conf.precision_bp == conf.tp * 10000 // (conf.tp + conf.fp)
    assert conf.recall_bp == conf.tp * 10000 // (conf.tp + conf.fn)
    assert conf.f1_bp == 2 * conf.tp * 10000 // (2 * conf.tp + conf.fp + conf.fn)


def test_session_conversion_and_double_charge(spark):
    """Batch-10 pins."""
    from tests.conftest import SF_DIR

    qs = engine.all_queries()

    conv = qs["events_session_conversion"](spark, SF_DIR).collect()
    assert conv
    total_sessions = sum(r.n_sessions for r in conv)
    assert total_sessions == qs["window_session"](spark, SF_DIR).count(), (
        "session universe must equal the canonical sessionization"
    )
    for r in conv:
        assert r.n_converted + r.n_abandoned == r.n_shopping
        assert r.n_shopping <= r.n_sessions

    dups = qs["dq_double_charge_audit"](spark, SF_DIR).collect()
    from etl_pipeline_aws_spark.catalog import load_table

    orders = {
        r.o_orderkey: (r.o_custkey, r.o_totalprice)
        for r in load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .collect()
    }
    for r in dups:
        assert orders[r.first_orderkey] == orders[r.dup_orderkey] == (
            r.o_custkey,
            r.amount,
        )
        assert 0 <= r.days_apart <= 1
        assert r.first_orderkey != r.dup_orderkey


def test_item_cf_and_stickiness(spark):
    """Batch-11 pins: CF cosine against brute force; stickiness bounds
    and agreement with the 7-day exact tier's universe."""
    import datetime as dt
    import math
    from collections import defaultdict

    from tests.conftest import SF_DIR

    from etl_pipeline_aws_spark.catalog import load_table
    from etl_pipeline_aws_spark.operators.graph import (
        CF_MIN_COSINE_PPM,
        CF_MIN_SUPPORT,
    )

    qs = engine.all_queries()

    baskets = defaultdict(set)
    for r in (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    ):
        baskets[r.l_orderkey].add(r.l_partkey)
    item_n = defaultdict(int)
    pair_n = defaultdict(int)
    for parts in baskets.values():
        ps = sorted(parts)
        for p in ps:
            item_n[p] += 1
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                pair_n[(a, b)] += 1
    expect = {}
    for (a, b), nab in pair_n.items():
        if nab < CF_MIN_SUPPORT:
            continue
        raw = nab * 1000000.0 / math.sqrt(item_n[a] * item_n[b])
        if raw >= CF_MIN_COSINE_PPM:
            expect[(a, b)] = (nab, item_n[a], item_n[b], math.floor(raw))
    got = {
        (r.pa, r.pb): (r.n_ab, r.n_a, r.n_b, r.cosine_ppm)
        for r in qs["graph_item_cf_cosine"](spark, SF_DIR).collect()
    }
    assert got == expect and got

    sticky = {r.day: r for r in qs["events_dau_mau_stickiness"](spark, SF_DIR).collect()}
    assert sticky
    daily_users = defaultdict(set)
    for r in (
        load_table(spark, SF_DIR, "events")
        .selectExpr("CAST(ts AS DATE) AS day", "user_id")
        .distinct()
        .collect()
    ):
        daily_users[r.day].add(r.user_id)
    for day, r in sticky.items():
        assert r.dau == len(daily_users[day])
        mau_set = set()
        for k in range(28):
            mau_set |= daily_users.get(day - dt.timedelta(days=k), set())
        assert r.mau == len(mau_set)
        assert r.stickiness_bp == r.dau * 10000 // r.mau
        assert r.dau <= r.mau


def test_rank_correlation_km_simpson_bruteforce(spark):
    """Batch-13 pins: Kendall tau-b, Spearman rho, Kaplan-Meier and
    Simpson diversity each re-derived brute-force in Python from the
    same parquet rows — full value agreement, not just bounds."""
    import math
    from collections import Counter, defaultdict

    from tests.conftest import SF_DIR

    from etl_pipeline_aws_spark.catalog import load_table

    qs = engine.all_queries()

    # Shared monthly series (x = order count, y = revenue cents).
    monthly = defaultdict(lambda: [0, 0])
    for r in load_table(spark, SF_DIR, "orders").select(
        F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    ).collect():
        monthly[r.m][0] += 1
        monthly[r.m][1] += r.cents
    xs = [v[0] for v in monthly.values()]
    ys = [v[1] for v in monthly.values()]
    n = len(xs)

    conc = disc = tie_x = tie_y = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (xs[i] - xs[j]) * (ys[i] - ys[j])
            conc += s > 0
            disc += s < 0
            tie_x += xs[i] == xs[j]
            tie_y += ys[i] == ys[j]
    n0 = n * (n - 1) // 2
    row = qs["stat_kendall_tau"](spark, SF_DIR).collect()[0]
    assert (row.n_pairs, row.concordant, row.discordant) == (n0, conc, disc)
    assert row.tau_b == (conc - disc) / (
        math.sqrt(n0 - tie_x) * math.sqrt(n0 - tie_y)
    )
    assert -1.0 <= row.tau_b <= 1.0

    def doubled_ranks(vals):
        order = sorted(vals)
        first = {}
        cnt = Counter(vals)
        for pos, v in enumerate(order, 1):
            first.setdefault(v, pos)
        return [2 * first[v] + cnt[v] - 1 for v in vals]

    ax, ay = doubled_ranks(xs), doubled_ranks(ys)
    sx, sy = sum(ax), sum(ay)
    sxx, syy = sum(a * a for a in ax), sum(a * a for a in ay)
    sxy = sum(a * b for a, b in zip(ax, ay))
    rho = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    srow = qs["stat_spearman_rho"](spark, SF_DIR).collect()[0]
    assert srow.n == n and srow.spearman_rho == rho
    assert -1.0 <= srow.spearman_rho <= 1.0

    # Kaplan-Meier brute force: per-user spans, censor inside final week.
    spans = {}
    for r in load_table(spark, SF_DIR, "events").select(
        "user_id", F.unix_date(F.col("ts").cast("date")).alias("d")
    ).groupBy("user_id").agg(
        F.min("d").alias("fd"), F.max("d").alias("ld")
    ).collect():
        spans[r.user_id] = (r.ld - r.fd, r.ld)
    maxld = max(ld for _, ld in spans.values())
    steps = defaultdict(lambda: [0, 0])  # dur -> [deaths, censored]
    for dur, ld in spans.values():
        steps[dur][1 if ld > maxld - 7 else 0] += 1
    s_e9, expect = 10**9, {}
    risk = len(spans)
    for t in sorted(steps):
        d, c = steps[t]
        s_e9 = s_e9 * (((risk - d) * 10**9) // risk) // 10**9
        expect[t] = (risk, d, c, s_e9)
        risk -= d + c
    got = {
        r.duration_days: (r.n_risk, r.n_deaths, r.n_censored, r.survival_e9)
        for r in qs["stat_kaplan_meier"](spark, SF_DIR).collect()
    }
    assert got == expect
    curve = [v[3] for _, v in sorted(expect.items())]
    assert curve == sorted(curve, reverse=True)  # survival non-increasing

    # Simpson diversity brute force.
    day_counts = defaultdict(Counter)
    for r in load_table(spark, SF_DIR, "events").select(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).collect():
        day_counts[r.day][r.event_type] += 1
    sexpect = {}
    for day, cnt in day_counts.items():
        N = sum(cnt.values())
        if N > 1:
            same = sum(k * (k - 1) for k in cnt.values())
            sexpect[day] = (N, len(cnt), 10**6 - same * 10**6 // (N * (N - 1)))
    sgot = {
        r.day: (r.n_events, r.n_types, r.simpson_ppm)
        for r in qs["events_diversity_simpson"](spark, SF_DIR).collect()
    }
    assert sgot == sexpect
    assert all(0 <= v[2] <= 10**6 for v in sgot.values())


def test_robust_scaler_bruteforce_and_lorenz_invariants(spark):
    """Batch-14 pins: robust scaler re-derived in Python (discrete
    fences, trunc-toward-zero division); Lorenz curve monotone with a
    pinned 10000 bp terminal and count/revenue conservation."""
    from collections import defaultdict

    from tests.conftest import SF_DIR

    from etl_pipeline_aws_spark.catalog import load_table

    qs = engine.all_queries()

    segs = defaultdict(list)
    for r in load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment",
        (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    ).collect():
        segs[r.c_mktsegment].append((r.cents, r.c_custkey))
    expect = {}
    for seg, rows in segs.items():
        rows.sort()
        n = len(rows)
        med = rows[(n + 1) // 2 - 1][0]
        q1 = rows[(n + 3) // 4 - 1][0]
        q3 = rows[(3 * n + 3) // 4 - 1][0]
        iqr = q3 - q1
        for cents, ck in rows:
            d = cents - med
            scaled = (d * 10**6) // iqr if d >= 0 else -((-d * 10**6) // iqr)
            expect[ck] = (seg, cents, med, iqr, scaled)
    got = {
        r.c_custkey: (r.seg, r.acctbal_cents, r.median_cents, r.iqr_cents, r.scaled_ppm)
        for r in qs["feature_robust_scaler"](spark, SF_DIR).collect()
    }
    assert got == expect

    rows = sorted(
        qs["customer_lorenz_deciles"](spark, SF_DIR).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    shares = [r.cum_share_bp for r in rows]
    assert shares == sorted(shares) and shares[-1] == 10000
    total_cust = load_table(spark, SF_DIR, "orders").select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == total_cust
    # Lorenz convexity: decile revenue non-decreasing in decile rank
    per_dec = [r.decile_cents for r in rows]
    assert per_dec == sorted(per_dec)


def test_effect_sizes_and_zcr_consistency(spark):
    """Batch-15 pins: Cramér's V shares its chi2 bit-for-bit with the
    chi-square query; Cohen's d agrees in sign with Welch's t and both
    effect sizes sit in their defined ranges; ZCR windows are bounded
    by their pair counts and cover every energy window."""
    import math

    from tests.conftest import SF_DIR

    qs = engine.all_queries()

    chi = qs["stat_chi_square_independence"](spark, SF_DIR).collect()[0]
    v = qs["stat_cramers_v"](spark, SF_DIR).collect()[0]
    assert v.chi2 == chi.chi2  # same machinery, same exact value
    assert 0.0 <= v.cramers_v <= 1.0
    assert v.cramers_v == math.sqrt(v.chi2 / (v.n_events * min(v.r - 1, v.c - 1)))

    t = qs["stat_welch_ttest"](spark, SF_DIR).collect()[0]
    d = qs["stat_cohens_d"](spark, SF_DIR).collect()[0]
    assert d.mean_diff == t.mean_diff
    assert (d.cohens_d > 0) == (t.t_stat > 0)
    assert d.pooled_sd > 0

    zcr = qs["multimodal_audio_zero_crossing"](spark, SF_DIR)
    bad = zcr.filter(
        (F.col("n_crossings") > F.col("n_pairs")) | (F.col("n_crossings") < 0)
    ).count()
    assert bad == 0
    # every doc's pair count is exactly (n_samples - 1) summed over windows
    n_docs_zcr = zcr.select("doc_id").distinct().count()
    from etl_pipeline_aws_spark.catalog import load_table
    n_docs = (
        load_table(spark, SF_DIR, "documents").filter(F.length("text") >= 2).count()
    )
    assert n_docs_zcr == n_docs


def test_cuped_and_graph_coefficients(spark):
    """Batch-16 pins: CUPED must never INCREASE variance (theta is the
    variance-minimizing coefficient pooled across arms, so each arm's
    adjusted variance <= raw variance up to the arm/pool theta gap —
    assert the pooled guarantee via the identity instead) and must
    leave arm means unbiased relative to the raw lift direction;
    assortativity/clustering agree with brute-force recomputation."""
    from collections import defaultdict

    from tests.conftest import SF_DIR

    qs = engine.all_queries()

    rows = {r.arm: r for r in qs["events_cuped_adjustment"](spark, SF_DIR).collect()}
    assert set(rows) == {0, 1}
    for r in rows.values():
        assert r.var_y > 0 and r.var_y_cuped > 0
        # theta is pooled-optimal; per-arm reduction can differ but on a
        # randomized parity split both arms' X,Y correlate the same way —
        # adjusted variance must not blow up (allow 5% slack for the
        # arm-vs-pool theta mismatch)
        assert r.var_y_cuped <= r.var_y * 1.05
    assert rows[0].theta == rows[1].theta

    # brute-force graph edge list (support >= 2, canonical pa < pb)
    from etl_pipeline_aws_spark.catalog import load_table

    pair_n = defaultdict(int)
    orders = defaultdict(list)
    for r in (
        load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey").collect()
    ):
        orders[r.l_orderkey].append(r.l_partkey)
    for parts in orders.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                if a < b:
                    pair_n[(a, b)] += 1
    edges = {p for p, n in pair_n.items() if n >= 2}
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1

    import math

    js, ks = [], []
    for a, b in edges:
        js += [deg[a], deg[b]]
        ks += [deg[b], deg[a]]
    m = len(js)
    sj, sk = sum(js), sum(ks)
    sjk = sum(j * k for j, k in zip(js, ks))
    sjj, skk = sum(j * j for j in js), sum(k * k for k in ks)
    r_expect = (m * sjk - sj * sk) / (
        math.sqrt(m * sjj - sj * sj) * math.sqrt(m * skk - sk * sk)
    )
    arow = qs["graph_degree_assortativity"](spark, SF_DIR).collect()[0]
    assert arow.n_directed_edges == m and arow.assortativity == r_expect

    eset = edges
    tri = 0
    for a, b in eset:
        for c in (n for n in deg if n > b):
            if (b, c) in eset and (a, c) in eset:
                tri += 1
    wedges2 = sum(d * (d - 1) for d in deg.values())
    crow = qs["graph_global_clustering"](spark, SF_DIR).collect()[0]
    assert (crow.n_nodes, crow.n_edges, crow.triangles) == (len(deg), len(eset), tri)
    assert crow.clustering_ppm == 6 * tri * 10**6 // wedges2
    assert 0 <= crow.clustering_ppm <= 10**6


def test_ols_holt_bot_gate(spark):
    """Batch-17 pins: OLS coefficients agree with numpy's lstsq to
    1e-9 relative (different arithmetic path, same math); Holt states
    re-derived exactly in Python; bot-gate flags re-derived exactly
    including the modal-gap tie-break."""
    from collections import Counter, defaultdict

    import numpy as np

    from tests.conftest import SF_DIR

    from etl_pipeline_aws_spark.catalog import load_table

    qs = engine.all_queries()

    r = qs["ml_ols_normal_equations"](spark, SF_DIR).collect()[0]
    feats = (
        load_table(spark, SF_DIR, "orders")
        .join(load_table(spark, SF_DIR, "lineitem"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).alias("x1"),
             F.sum(F.col("l_quantity").cast("long")).alias("x2"))
        .collect()
    )
    X = np.array([[1.0, f.x1, f.x2] for f in feats])
    y = np.array([float(int(round(float(f.o_totalprice) * 100))) for f in feats])
    b = np.linalg.lstsq(X, y, rcond=None)[0]
    assert r.n_orders == len(feats)
    for got, exp in zip((r.b0, r.b1, r.b2), b):
        assert abs(got - exp) <= 1e-9 * max(1.0, abs(exp)), (got, exp)
    assert 0.0 <= r.r2 <= 1.0

    from etl_pipeline_aws_spark.operators.timeseries import (
        HOLT_ALPHA_E3,
        HOLT_BETA_E3,
    )

    daily = sorted(
        (r2.day, r2.v)
        for r2 in load_table(spark, SF_DIR, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("v"))
        .collect()
    )

    def tz(x):
        return x // 1000 if x >= 0 else -((-x) // 1000)

    expect = {}
    l, t = daily[0][1], 0
    expect[daily[0][0]] = (daily[0][1], l, t, l + t)
    for day, v in daily[1:]:
        lp = l
        l = tz(HOLT_ALPHA_E3 * v + (1000 - HOLT_ALPHA_E3) * (l + t))
        t = tz(HOLT_BETA_E3 * (l - lp) + (1000 - HOLT_BETA_E3) * t)
        expect[day] = (v, l, t, l + t)
    got = {
        r2.day: (r2.value_cents, r2.level_cents, r2.trend_cents, r2.forecast_next_cents)
        for r2 in qs["events_holt_linear_forecast"](spark, SF_DIR).collect()
    }
    assert got == expect

    ev = defaultdict(list)
    for r2 in load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "event_id",
        F.unix_micros("ts").alias("us"), F.col("ts").cast("date").alias("day"),
    ).collect():
        ev[r2.user_id].append((r2.us, r2.event_id, r2.event_type, r2.day))
    bexpect = {}
    for uid, rows in ev.items():
        rows.sort(key=lambda x: (x[0], x[1]))
        n = len(rows)
        days = len({x[3] for x in rows})
        types = len({x[2] for x in rows})
        gaps = [rows[i][0] - rows[i - 1][0] for i in range(1, n)]
        if gaps:
            cnt = Counter(gaps)
            modal_cnt, modal_gap = max(
                ((c, -g) for g, c in cnt.items())
            )  # count desc, gap asc
            metro = modal_cnt * 10**6 // len(gaps)
        else:
            metro = 0
        rate_f = int(n // days >= 50)
        mono_f = int(types == 1 and n >= 10)
        metro_f = int(metro >= 500000 and len(gaps) >= 5)
        bexpect[uid] = (
            n, days, types, len(gaps), metro, rate_f, mono_f, metro_f,
            int(rate_f or mono_f or metro_f),
        )
    bgot = {
        r2.user_id: (
            r2.n_events, r2.active_days, r2.n_types, r2.n_gaps, r2.metronome_ppm,
            r2.rate_flag, r2.monotone_flag, r2.metronome_flag, r2.is_bot,
        )
        for r2 in qs["events_bot_score_gate"](spark, SF_DIR).collect()
    }
    assert bgot == bexpect


def test_mmr_rank1_is_bruteforce_top1_and_picks_distinct(spark):
    """MMR's first pick maximizes pure relevance, so it must equal the
    brute-force top-1 neighbor per query; the three picks are distinct
    and come from the relevance shortlist."""
    from tests.conftest import SF_DIR

    qs = engine.all_queries()
    mmr = qs["similarity_mmr_rerank"](spark, SF_DIR).collect()
    by_q = {}
    for r in mmr:
        by_q.setdefault(r.query_id, {})[r.mmr_rank] = r.vec_id
    brute = {
        r.query_id: r.neighbor_id
        for r in qs["similarity_topk_bruteforce"](spark, SF_DIR).collect()
        if r.rank == 1
    }
    assert set(by_q) == set(brute)
    for qid, picks in by_q.items():
        assert set(picks) == {1, 2, 3}
        assert picks[1] == brute[qid]
        assert len(set(picks.values())) == 3


def test_modularity_and_growth_accounting_identities(spark):
    """Batch-18 pins: modularity's integer numerator matches the double;
    Q in [-0.5, 1]; growth accounting conserves actives exactly
    (new+retained+resurrected = active) and retained(w) <= active(w-1)."""
    from tests.conftest import SF_DIR

    qs = engine.all_queries()

    m = qs["graph_modularity"](spark, SF_DIR).collect()[0]
    assert m.modularity == m.numerator / (4.0 * m.m_edges * m.m_edges)
    assert -0.5 <= m.modularity <= 1.0
    # communities must match label propagation's (shared assignment)
    lp = qs["graph_label_propagation"](spark, SF_DIR).collect()
    assert m.n_communities == len(lp)

    rows = sorted(
        qs["events_growth_accounting"](spark, SF_DIR).collect(),
        key=lambda r: r.week_idx,
    )
    assert rows
    active_by_wk = {r.week_idx: r.n_active for r in rows}
    for r in rows:
        assert r.n_new + r.n_retained + r.n_resurrected == r.n_active
        if r.week_idx - 1 in active_by_wk:
            assert r.n_retained <= active_by_wk[r.week_idx - 1]
        if r.n_churned > 0:
            assert r.quick_ratio == (r.n_new + r.n_resurrected) / r.n_churned
    # week 1 of the observation: everyone is new
    first = rows[0]
    assert first.n_new == first.n_active and first.n_retained == 0


def test_matryoshka_full_dim_recall_is_one(spark):
    """The d=64 row evaluates the full ranking against itself — recall
    must be exactly 1e6; truncated tiers are monotone non-decreasing in
    d on this fixture's panel."""
    from tests.conftest import SF_DIR

    rows = {
        r.trunc_dim: r.recall_ppm
        for r in engine.all_queries()["embedding_matryoshka_recall"](spark, SF_DIR).collect()
    }
    assert rows[64] == 1_000_000
    assert set(rows) == {16, 32, 64}
    assert all(0 <= v <= 1_000_000 for v in rows.values())


def test_leakage_audit_and_model_selection(spark):
    """Batch-19 pins: the LOO gap shrinks with segment size (max gap on
    the biggest segment <= max gap overall, and every gap is positive);
    model selection's Holt row is consistent with the standalone Holt
    query's forecasts recomputed as one-step errors."""
    from tests.conftest import SF_DIR

    qs = engine.all_queries()

    rows = qs["ml_leakage_audit_target_encoding"](spark, SF_DIR).collect()
    assert rows and all(r.max_loo_gap > 0 for r in rows)
    assert all(r.n_rows_gap_gt_1 <= r.n_rows for r in rows)

    holt = sorted(
        qs["events_holt_linear_forecast"](spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    sel = {r.model: r for r in qs["events_forecast_model_selection"](spark, SF_DIR).collect()}
    assert set(sel) == {"holt", "seasonal_naive"}
    assert sel["holt"].n_days == sel["seasonal_naive"].n_days
    # recompute holt one-step errors on the common panel (days with d-7)
    by_day = {r.day: r for r in holt}
    import datetime as dt

    total = n = 0
    for i, r in enumerate(holt[1:], 1):
        if r.day - dt.timedelta(days=7) in by_day:
            f = holt[i - 1].level_cents + holt[i - 1].trend_cents
            total += abs(r.value_cents - f)
            n += 1
    assert (sel["holt"].n_days, sel["holt"].sum_abs_err_cents) == (n, total)


def test_experiment_e2e_composes_with_pieces(spark):
    """The e2e readout must agree with its standalone pieces where the
    panels coincide: total users = non-bot users; theta equal across
    arms; conversion_bp consistent with its own counts."""
    from tests.conftest import SF_DIR

    qs = engine.all_queries()
    rows = {r.arm: r for r in qs["pipeline_experiment_e2e"](spark, SF_DIR).collect()}
    assert set(rows) == {0, 1}
    bots = {
        r.user_id
        for r in qs["events_bot_score_gate"](spark, SF_DIR).collect()
        if r.is_bot == 1
    }
    from etl_pipeline_aws_spark.catalog import load_table

    total_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows.values()) == total_users - len(bots)
    assert rows[0].theta == rows[1].theta
    for r in rows.values():
        assert r.conversion_bp == r.n_converted * 10000 // r.n_users
        assert abs(rows[0].z_conversion) < 10  # sanity: finite, same both rows
    assert rows[0].z_conversion == rows[1].z_conversion


def test_bootstrap_se_tracks_analytic_se_and_peaks_are_strict(spark):
    """Batch-20 pins: the Poisson-bootstrap SE must land within 35% of
    the analytic sigma/sqrt(n) (30 replicas — the bound is loose but
    catches degenerate weights, which once made every replica mean
    identical and the SE zero); local peaks strictly dominate both
    window sides."""
    import math

    from tests.conftest import SF_DIR

    from etl_pipeline_aws_spark.catalog import load_table

    qs = engine.all_queries()
    r = qs["stat_bootstrap_se"](spark, SF_DIR).collect()[0]
    vals = [
        int(round(float(x.o_totalprice) * 100))
        for x in load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_totalprice")
        .collect()
    ]
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / (n - 1)
    analytic_se = math.sqrt(var / n)
    assert r.n_rows == n and r.k_replicas == 30
    assert r.bootstrap_se_cents > 0
    assert abs(r.bootstrap_se_cents - analytic_se) <= 0.35 * analytic_se, (
        r.bootstrap_se_cents,
        analytic_se,
    )

    peaks = qs["events_local_peaks"](spark, SF_DIR).collect()
    for p in peaks:
        assert p.left_margin_cents > 0 and p.right_margin_cents > 0


def test_wilcoxon_bruteforce(spark):
    """Wilcoxon re-derived in Python: same diffs, tie-averaged ranks,
    doubled rank sum, tie-corrected z."""
    import math
    from collections import Counter, defaultdict

    from tests.conftest import SF_DIR

    from etl_pipeline_aws_spark.catalog import load_table

    rows = load_table(spark, SF_DIR, "events").select(
        "user_id", F.unix_date(F.col("ts").cast("date")).alias("d"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    ).collect()
    lo, hi = min(r.d for r in rows), max(r.d for r in rows)
    mid = (lo + hi) // 2
    per = defaultdict(int)
    for r in rows:
        per[r.user_id] += r.cents if r.d > mid else -r.cents
    diffs = [v for v in per.values() if v != 0]
    cnt = Counter(abs(v) for v in diffs)
    c_prev, two_r = 0, {}
    for ad in sorted(cnt):
        two_r[ad] = 2 * c_prev + cnt[ad] + 1
        c_prev += cnt[ad]
    n = len(diffs)
    two_w_plus = sum(two_r[abs(v)] for v in diffs if v > 0)
    tie_cubes = sum(t**3 - t for t in cnt.values())
    z = (2 * two_w_plus - n * (n + 1)) / (
        4 * math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - tie_cubes / 48.0)
    )
    r = engine.all_queries()["stat_wilcoxon_signed_rank"](spark, SF_DIR).collect()[0]
    assert (r.n, r.two_w_plus, r.tie_cubes) == (n, two_w_plus, tie_cubes)
    assert r.z_stat == z


def test_allen_case_ladder_covers_all_seven(spark):
    """The fixture only exercises before/overlaps/during, so pin the
    other four classes (meets, starts, finishes, equals) — plus the
    one-relation-per-pair exactness — on crafted endpoint pairs run
    through the very same CASE ladder text."""
    from etl_pipeline_aws_spark.operators.events import _allen_sql

    sql = _allen_sql("unix_micros")
    case = sql[sql.index("CASE"):sql.index("END AS relation") + len("END AS relation")]
    pairs = [
        (0, 10, 20, 30, "before"),
        (0, 10, 10, 30, "meets"),
        (0, 10, 5, 30, "overlaps"),
        (0, 10, 0, 30, "starts"),
        (5, 30, 0, 30, "finishes"),
        (5, 10, 0, 30, "during"),
        (0, 30, 0, 30, "equals"),
        (20, 30, 0, 10, "before"),  # inverse folds onto primal
        (10, 30, 0, 10, "meets"),
    ]
    values = ", ".join(f"({sa}, {ea}, {sb}, {eb})" for sa, ea, sb, eb, _ in pairs)
    got = [
        r.relation
        for r in spark.sql(
            f"SELECT {case} FROM (VALUES {values}) AS t(sa, ea, sb, eb)"
        ).collect()
    ]
    assert got == [p[4] for p in pairs]


# ---------------------------------------------------------------- session 4


def test_bfs_seeds_are_hop_zero_and_counts_positive(spark):
    from etl_pipeline_aws_spark.operators.graph import BFS_SEED_MOD

    rows = {
        r.hop: r
        for r in engine.all_queries()["graph_bfs_hops"](spark, SF_DIR).collect()
    }
    assert 0 in rows and rows[0].n_nodes > 0
    assert rows[0].min_node % BFS_SEED_MOD == 0
    assert rows[0].max_node % BFS_SEED_MOD == 0
    assert all(r.n_nodes > 0 for r in rows.values())


def test_kmeans_second_round_does_not_increase_inertia(spark, monkeypatch):
    """Lloyd guarantee: (update centroids, reassign) cannot raise the
    total within-cluster cost — pin it by running the builder at 1 and
    2 rounds and comparing summed inertia."""
    import etl_pipeline_aws_spark.llm.corpus as corpus

    totals = {}
    for rounds in (1, 2):
        monkeypatch.setattr(corpus, "KM_ROUNDS", rounds)
        engine.clear_caches(spark)
        rows = corpus.embedding_kmeans_lloyd(spark, SF_DIR).collect()
        totals[rounds] = sum(r.inertia for r in rows)
        assert sum(r.n_members for r in rows) == 500  # every vector assigned
    assert totals[2] <= totals[1] + 1e-9


def test_silhouette_is_bounded_and_covers_corpus(spark):
    rows = engine.all_queries()["embedding_silhouette_centroid"](spark, SF_DIR).collect()
    assert sum(r.n_members for r in rows) == 500
    for r in rows:
        assert -1.0 <= r.worst_silhouette <= r.mean_silhouette <= 1.0


def test_rrf_score_is_the_rank_identity(spark):
    from etl_pipeline_aws_spark.llm.similarity import RRF_K, RRF_TOP

    rows = engine.all_queries()["search_hybrid_rrf"](spark, SF_DIR).collect()
    assert len(rows) == RRF_TOP
    for r in rows:
        want = (1.0 / (RRF_K + r.r_text) if r.r_text > 0 else 0.0) + (
            1.0 / (RRF_K + r.r_vec) if r.r_vec > 0 else 0.0
        )
        assert r.rrf_score == want
        assert r.r_text > 0 or r.r_vec > 0


def test_next_fit_bins_respect_capacity_and_conserve_tokens(spark):
    from etl_pipeline_aws_spark.llm.corpus import PACK_BIN_CAPACITY

    rows = engine.all_queries()["corpus_pack_next_fit"](spark, SF_DIR).collect()
    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r)
        assert r.fill_tokens <= PACK_BIN_CAPACITY or r.n_docs == 1
    docs = engine.all_queries()["text_token_stats"](spark, SF_DIR)
    total_tokens = docs.agg(F.sum("n_tokens")).collect()[0][0]
    assert sum(r.fill_tokens for r in rows) == total_tokens
    for src, bins in per_source.items():
        idxs = sorted(b.bin_idx for b in bins)
        assert idxs == list(range(1, len(idxs) + 1)), src  # contiguous bins


def test_wow_attribution_shares_partition_the_total(spark):
    rows = engine.all_queries()["events_wow_attribution"](spark, SF_DIR).collect()
    total = sum(r.delta_value for r in rows)
    if abs(total) > 1e-9:
        assert abs(sum(r.contribution_share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert abs((r.cur_value - r.prev_value) - r.delta_value) < 1e-9


def test_croston_states_positive_and_demand_days_match(spark):
    from etl_pipeline_aws_spark.operators.timeseries import CROSTON_VALUE_MIN

    rows = engine.all_queries()["events_croston_intermittent"](spark, SF_DIR).collect()
    con = duckdb_con(SF_DIR)
    want_days = con.sql(
        f"SELECT COUNT(DISTINCT CAST(ts AS DATE)) FROM events "
        f"WHERE event_type = 'error' AND value > {CROSTON_VALUE_MIN}"
    ).fetchone()[0]
    con.close()
    assert len(rows) == want_days
    for r in rows:
        assert r.demand > 0
        assert r.z_milli > 0
        assert r.p_milli >= 1000  # interval can never smooth below 1 period
        assert r.croston_forecast_milli > 0


def test_fdr_rejections_form_a_rank_prefix(spark):
    rows = sorted(
        engine.all_queries()["stat_fdr_bh_control"](spark, SF_DIR).collect(),
        key=lambda r: r.bh_rank,
    )
    assert len(rows) == 25
    rejected = [r.bh_rank for r in rows if r.rejected == 1]
    assert rejected == list(range(1, len(rejected) + 1))  # step-up is a prefix
    for r in rows:
        assert 0.0 < r.p_emp <= 1.0


def test_iqr_fences_order_and_bounds(spark):
    for r in engine.all_queries()["dq_iqr_fences"](spark, SF_DIR).collect():
        assert r.fence_low <= r.q1 <= r.q3 <= r.fence_high
        assert 0 <= r.n_outliers <= r.n_rows


def test_poisson_ci_brackets_rate(spark):
    for r in engine.all_queries()["stat_poisson_rate_ci"](spark, SF_DIR).collect():
        assert r.ci_low <= r.rate_per_day <= r.ci_high
        assert abs(r.rate_per_day * r.n_days - r.n_events) < 1e-6


def test_lttb_keeps_endpoints_and_bucket_count(spark):
    from etl_pipeline_aws_spark.operators.timeseries import LTTB_BUCKETS

    rows = sorted(
        engine.all_queries()["events_lttb_downsample"](spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    assert len(rows) == LTTB_BUCKETS  # every interior bucket non-empty at sf0.01
    con = duckdb_con(SF_DIR)
    dmin, dmax = con.sql(
        "SELECT MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)) FROM events"
    ).fetchone()
    con.close()
    assert rows[0].day == dmin and rows[-1].day == dmax
    assert len({r.bucket for r in rows}) == LTTB_BUCKETS


def test_xcorr_day_counts_shrink_with_lag(spark):
    from etl_pipeline_aws_spark.operators.timeseries import XCORR_MAX_LAG

    rows = {r.lag: r for r in engine.all_queries()["events_lead_lag_xcorr"](spark, SF_DIR).collect()}
    assert set(rows) == set(range(XCORR_MAX_LAG + 1))
    for lag in range(1, XCORR_MAX_LAG + 1):
        assert rows[lag].n_days <= rows[lag - 1].n_days
    for r in rows.values():
        assert -1.0 - 1e-12 <= r.pearson_r <= 1.0 + 1e-12


def test_stream_windowed_topk_respects_k_and_order(spark):
    rows = engine.all_queries()["stream_windowed_topk"](spark, SF_DIR).collect()
    by_window: dict = {}
    for r in rows:
        by_window.setdefault(r.window_start, []).append(r)
    assert by_window
    for ws, rs in by_window.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1)) and len(rs) <= 2
        rs = sorted(rs, key=lambda r: r.rank)
        for a, b in zip(rs, rs[1:]):
            assert (a.n_events, ) >= (b.n_events, )  # rank follows count


def test_xmr_limits_bracket_center(spark):
    rows = engine.all_queries()["events_xmr_control_chart"](spark, SF_DIR).collect()
    for r in rows:
        assert r.lcl <= r.x_bar <= r.ucl
        flagged = r.x > r.ucl or r.x < r.lcl
        assert bool(r.out_of_control) == flagged


def test_kappa_never_exceeds_accuracy_identity(spark):
    r = engine.all_queries()["stat_cohens_kappa"](spark, SF_DIR).collect()[0]
    po = r.n_agree / r.n_total
    pe = r.sum_rc / (r.n_total * r.n_total)
    assert abs(r.kappa - (po - pe) / (1 - pe)) < 1e-12
    assert -1.0 <= r.kappa <= 1.0


def test_uplift_deciles_partition_users(spark):
    rows = engine.all_queries()["events_uplift_by_decile"](spark, SF_DIR).collect()
    assert sorted(r.decile for r in rows) == list(range(1, 11))
    con = duckdb_con(SF_DIR)
    n_users = con.sql("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    con.close()
    assert sum(r.n_treat + r.n_control for r in rows) == n_users
    # qini_cum is the running sum of per-decile increments
    run = 0.0
    for r in sorted(rows, key=lambda r: r.decile):
        run += r.conv_treat - r.conv_control * r.n_treat / r.n_control
        assert abs(r.qini_cum - run) < 1e-9


def test_date_edges_pin_clamping_and_iso_weeks(spark):
    rows = {r.label: r for r in engine.all_queries()["scalar_date_edge_cases"](spark, SF_DIR).collect()}
    import datetime as dt

    assert rows["month_end_jan"].plus_one_month == dt.date(2024, 2, 29)
    assert rows["month_end_nonleap"].plus_one_month == dt.date(2023, 2, 28)
    assert rows["leap_day"].plus_one_year == dt.date(2025, 2, 28)
    assert rows["iso_week_53"].iso_week == 53
    assert rows["iso_week_1_spill"].iso_week == 1
    assert rows["mid_month"].month_last_day == dt.date(2024, 6, 30)


def test_metric_agreement_tau_bounded_and_pairs_complete(spark):
    from etl_pipeline_aws_spark.llm.similarity import METRIC_AGREE_POOL

    r = engine.all_queries()["similarity_metric_agreement"](spark, SF_DIR).collect()[0]
    assert r.n_pairs == METRIC_AGREE_POOL * (METRIC_AGREE_POOL - 1) // 2
    assert r.concordant + r.discordant <= r.n_pairs
    assert -1.0 - 1e-12 <= r.tau_b <= 1.0 + 1e-12  # closing division can land 1+2ulp


def test_minhash_eval_recall_meets_band_budget(spark):
    """The banding budget's recall contract, as the runnable report:
    planted dups sit at J≈0.95+ where 4x4 banding detects ~always."""
    engine.clear_caches(spark)
    r = engine.all_queries()["dedup_minhash_eval"](spark, SF_DIR).collect()[0]
    assert r.n_detected <= min(r.n_true, r.n_candidates)
    assert r.recall >= 0.9
    assert 0.0 <= r.precision <= 1.0


def test_holt_winters_identity_and_start(spark):
    from etl_pipeline_aws_spark.operators.timeseries import HW_PERIOD

    rows = sorted(
        engine.all_queries()["events_holt_winters_additive"](spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    con = duckdb_con(SF_DIR)
    n_days = con.sql("SELECT COUNT(DISTINCT CAST(ts AS DATE)) FROM events").fetchone()[0]
    con.close()
    assert len(rows) == n_days - HW_PERIOD  # first week is init, not output
    for r in rows:
        assert r.residual_cents == r.value_cents - r.fitted_cents


def test_seasonal_strength_bounded(spark):
    r = engine.all_queries()["events_seasonal_strength"](spark, SF_DIR).collect()[0]
    assert 0.0 <= r.seasonal_strength <= 1.0
    assert 0.0 <= r.trend_strength <= 1.0


def test_t_closeness_bounds_and_flags(spark):
    from etl_pipeline_aws_spark.operators.quality import T_CLOSENESS_MAX

    rows = engine.all_queries()["dq_t_closeness"](spark, SF_DIR).collect()
    for r in rows:
        assert 0.0 <= r.t_closeness <= 1.0 + 1e-12
        assert bool(r.above_t) == (r.t_closeness > T_CLOSENESS_MAX)


def test_cochran_armitage_matches_python_fold(spark):
    r = engine.all_queries()["stat_cochran_armitage_trend"](spark, SF_DIR).collect()[0]
    assert r.k_groups == 5
    assert 0 < r.n_success < r.n_total


def test_coverage_union_bounds(spark):
    from etl_pipeline_aws_spark.operators.events import COVERAGE_TTL_MIN

    ttl_us = COVERAGE_TTL_MIN * 60 * 1_000_000
    rows = engine.all_queries()["events_active_coverage_union"](spark, SF_DIR).collect()
    con = duckdb_con(SF_DIR)
    per_user = dict(
        con.sql("SELECT user_id, COUNT(*) FROM events GROUP BY user_id").fetchall()
    )
    con.close()
    assert len(rows) == len(per_user)
    for r in rows:
        n_ev = per_user[r.user_id]
        assert ttl_us <= r.covered_micros <= n_ev * ttl_us  # union bounds
        assert r.longest_island_micros >= ttl_us
        assert 1 <= r.n_islands <= n_ev


def test_segment_migration_conserves_customers(spark):
    rows = engine.all_queries()["customer_segment_migration"](spark, SF_DIR).collect()
    con = duckdb_con(SF_DIR)
    n_cust = con.sql("SELECT COUNT(DISTINCT o_custkey) FROM orders").fetchone()[0]
    con.close()
    # every customer appears in exactly one (from, to) cell
    assert sum(r.n_customers for r in rows) >= n_cust  # absent-both never emitted
    segs = {"high", "mid", "low", "absent"}
    for r in rows:
        assert r.seg_from in segs and r.seg_to in segs


def test_kneser_ney_probability_sane(spark):
    rows = engine.all_queries()["text_bigram_kneser_ney"](spark, SF_DIR).collect()
    for r in rows:
        assert 0.0 < r.p_kn <= 1.0 + 1e-12
        assert 0.0 < r.p_mle <= 1.0
        assert r.p_kn < r.p_mle + 0.25  # discounting cannot inflate much


def test_shard_gini_matches_interleave_balance(spark):
    rows = engine.all_queries()["corpus_shard_mix_gini"](spark, SF_DIR).collect()
    ginis = [r.gini_impurity for r in rows]
    assert all(0.0 <= g < 1.0 for g in ginis)
    # stratified interleave => shards are near-identically mixed
    assert max(ginis) - min(ginis) < 0.02


def test_hybrid_e2e_suppresses_non_keepers(spark):
    from etl_pipeline_aws_spark.llm.dedup import dedup_ngram_jaccard, min_label_components

    engine.clear_caches(spark)
    slate = engine.all_queries()["pipeline_hybrid_search_e2e"](spark, SF_DIR).collect()
    labels = min_label_components(dedup_ngram_jaccard(spark, SF_DIR))
    dups = {r.doc_id for r in labels.filter("label != doc_id").collect()}
    ranks = sorted(r.final_rank for r in slate)
    assert ranks == list(range(1, len(slate) + 1))
    for r in slate:
        assert r.doc_id not in dups  # no near-dup non-keeper is served


def test_ivf_cells_partition_corpus(spark):
    engine.clear_caches(spark)
    rows = engine.all_queries()["embedding_ivf_cell_balance"](spark, SF_DIR).collect()
    assert sum(r.n_vectors for r in rows) == rows[0].n_total == 500
    mean = rows[0].n_total / len(rows)
    for r in rows:
        assert abs(r.balance_ratio - r.n_vectors / mean) < 1e-9


def test_pr_curve_recall_monotone_in_threshold(spark):
    rows = sorted(
        engine.all_queries()["ml_pr_curve_points"](spark, SF_DIR).collect(),
        key=lambda r: r.decile,
    )
    assert len(rows) == 9
    for a, b in zip(rows, rows[1:]):
        assert b.threshold >= a.threshold
        assert b.recall_bp <= a.recall_bp  # higher fence, fewer recalled
    for r in rows:
        assert 0 <= r.precision_bp <= 10000 and 0 <= r.f1_bp <= 10000


def test_compression_ratio_bounds_determinism_and_signal(spark):
    q = engine.all_queries()["text_compression_ratio"]
    rows = {r.doc_id: r for r in q(spark, SF_DIR).collect()}
    again = {r.doc_id: r.compression_ratio for r in q(spark, SF_DIR).collect()}
    assert len(rows) == 500
    for did, r in rows.items():
        assert 0.0 < r.compression_ratio < 1.5  # zlib header can exceed 1 on tiny docs
        assert r.n_compressed > 0 and r.n_raw > 0
        assert again[did] == r.compression_ratio  # DEFLATE is deterministic
    # redundancy signal: docs flagged by the trigram repetition filter
    # must compress better (lower ratio) than the corpus median
    import statistics

    flagged = {
        r.doc_id
        for r in engine.all_queries()["text_repetition_filter"](spark, SF_DIR).collect()
        if not r.keep
    }
    if flagged:
        med = statistics.median(r.compression_ratio for r in rows.values())
        flagged_med = statistics.median(
            rows[d].compression_ratio for d in flagged if d in rows
        )
        assert flagged_med <= med


def test_median_ci_brackets_median(spark):
    for r in engine.all_queries()["stat_median_ci_orderstat"](spark, SF_DIR).collect():
        assert r.ci_lo <= r.median <= r.ci_hi


def test_residual_diagnostics_dw_bounds(spark):
    r = engine.all_queries()["stat_residual_diagnostics"](spark, SF_DIR).collect()[0]
    assert 0.0 <= r.durbin_watson <= 4.0
    assert r.n_runs >= 1 and r.n1 + r.n2 == r.n


def test_video_e2e_conserves_videos(spark):
    rows = engine.all_queries()["pipeline_video_e2e"](spark, SF_DIR).collect()
    assert sum(r.n_videos for r in rows) == 500
    for r in rows:
        assert r.total_shots >= r.n_videos  # every video has >= 1 shot
        assert r.avg_frames_per_shot > 0


def test_ahash_pairs_are_symmetric_free_and_verified(spark):
    from etl_pipeline_aws_spark.llm.multimodal import AHASH_MAX_HAMMING

    rows = engine.all_queries()["multimodal_image_ahash_dedup"](spark, SF_DIR).collect()
    seen = set()
    for r in rows:
        assert r.doc_a < r.doc_b  # canonical order, no mirror duplicates
        assert 0 <= r.hamming <= AHASH_MAX_HAMMING
        assert (r.doc_a, r.doc_b) not in seen
        seen.add((r.doc_a, r.doc_b))


def test_partition_advisor_covers_tables_with_sane_math(spark):
    import math

    from etl_pipeline_aws_spark.sources.source_queries import (
        ADVISOR_TARGET_BYTES,
        _ADVISOR_TABLES,
    )

    rows = {r.table_name: r for r in engine.all_queries()[
        "layout_partition_size_advisor"](spark, SF_DIR).collect()}
    assert set(rows) == set(_ADVISOR_TABLES)
    for r in rows.values():
        assert r.n_rows > 0 and r.compressed_bytes > 0
        assert r.recommended_files == max(
            1, math.ceil(r.compressed_bytes / ADVISOR_TARGET_BYTES)
        )


def test_char_ngram_lang_id_beats_chance(spark):
    rows = engine.all_queries()["text_lang_id_char_ngram"](spark, SF_DIR).collect()
    agree = sum(r.n_docs for r in rows if r.labeled_lang == r.predicted_lang)
    total = sum(r.n_docs for r in rows)
    k = len({r.labeled_lang for r in rows})
    assert total > 0 and k >= 2
    # word-soup fixture shares vocabulary across languages, so the bar is
    # the k-class coin, not human-text accuracy
    assert agree / total > 1.0 / k


def test_bollinger_bands_order_and_flags(spark):
    for r in engine.all_queries()["events_bollinger_bands"](spark, SF_DIR).collect():
        assert r.band_lo <= r.band_mid <= r.band_hi
        want = 1 if r.value_cents > r.band_hi else (-1 if r.value_cents < r.band_lo else 0)
        assert r.breakout == want


def test_anomaly_ensemble_vote_identity(spark):
    rows = engine.all_queries()["events_anomaly_ensemble"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.votes == r.z_flag + r.mad_flag + r.iqr_flag
        assert r.consensus_anomaly == (1 if r.votes >= 2 else 0)
        for f in (r.z_flag, r.mad_flag, r.iqr_flag):
            assert f in (0, 1)


def test_source_tv_matrix_is_a_bounded_metric(spark):
    rows = engine.all_queries()["text_source_vocab_tv_matrix"](spark, SF_DIR).collect()
    srcs = set()
    for r in rows:
        assert r.source_a < r.source_b  # canonical half-matrix
        assert 0.0 <= r.tv_distance <= 1.0 + 1e-12
        assert r.n_shared_tokens > 0
        srcs.update((r.source_a, r.source_b))
    k = len(srcs)
    assert len(rows) == k * (k - 1) // 2  # every pair shares vocabulary here


def test_community_inequality_bounds(spark):
    engine.clear_caches(spark)
    r = engine.all_queries()["graph_community_inequality"](spark, SF_DIR).collect()[0]
    assert 0.0 <= r.gini_size <= 1.0
    assert 0.0 < r.largest_share <= 1.0
    assert r.n_communities <= r.n_nodes


def test_crest_factor_bounds(spark):
    rows = engine.all_queries()["multimodal_audio_crest_factor"](spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.crest_factor >= 1.0 - 1e-12  # peak >= rms always
        assert r.peak <= 32768 and r.rms > 0


def test_month_index_weighted_mean_is_one(spark):
    rows = engine.all_queries()["orders_month_seasonal_index"](spark, SF_DIR).collect()
    assert len(rows) == 12
    # index = month_avg / overall with overall = Σ(month_avg·n)/Σn, so the
    # n_years-weighted mean of the index is exactly 1
    den = sum(r.n_years for r in rows)
    weighted = sum(r.seasonal_index * r.n_years for r in rows) / den
    assert abs(weighted - 1.0) < 1e-9
    for r in rows:
        assert r.seasonal_index > 0


def test_brand_return_rate_bounds(spark):
    rows = engine.all_queries()["parts_return_rate_by_brand"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_returned <= r.n_lines
        assert 0 <= r.return_rate_bp <= 10000
        assert r.returned_revenue >= 0.0


def test_discount_slope_r_bounded(spark):
    for r in engine.all_queries()["parts_discount_quantity_slope"](spark, SF_DIR).collect():
        assert -1.0 - 1e-9 <= r.pearson_r <= 1.0 + 1e-9
        assert r.n > 0


def test_term_burstiness_at_least_one(spark):
    from etl_pipeline_aws_spark.llm.text import BURSTINESS_TOP

    rows = engine.all_queries()["text_term_burstiness"](spark, SF_DIR).collect()
    assert len(rows) == BURSTINESS_TOP
    for r in rows:
        assert r.cf >= r.df >= 1
        assert r.burstiness >= 1.0


def test_fiscal_445_periods_well_formed(spark):
    rows = engine.all_queries()["orders_fiscal_445_rollup"](spark, SF_DIR).collect()
    con = duckdb_con(SF_DIR)
    from etl_pipeline_aws_spark.operators.analytics import FISCAL_ANCHOR

    total = con.sql(
        f"SELECT COUNT(*) FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '{FISCAL_ANCHOR}'"
    ).fetchone()[0]
    con.close()
    assert sum(r.n_orders for r in rows) == total  # partition of post-anchor orders
    for r in rows:
        assert 1 <= r.fiscal_period <= 12
        assert r.fiscal_year >= 1995


def test_pv_bridge_effects_sum_to_delta(spark):
    rows = engine.all_queries()["events_wow_price_volume_bridge"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs((r.volume_effect + r.rate_effect) - r.total_delta) < 1e-6


def test_image_contrast_bounds(spark):
    rows = engine.all_queries()["multimodal_image_contrast"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mean_luma <= 255.0
        assert 0.0 <= r.std_luma <= 128.0  # max possible std on [0,255]
        assert r.low_contrast in (0, 1)


def test_time_to_nth_event_bounds(spark):
    r = engine.all_queries()["events_time_to_nth_event"](spark, SF_DIR).collect()[0]
    assert 0 <= r.n_reached <= r.n_users
    assert 0 <= r.reach_rate_bp <= 10000
    if r.n_reached:
        assert r.median_nth_ts is not None


def test_threshold_sensitivity_monotone(spark):
    engine.clear_caches(spark)
    rows = sorted(
        engine.all_queries()["dedup_threshold_sensitivity"](spark, SF_DIR).collect(),
        key=lambda r: r.tau_x10,
    )
    assert [r.tau_x10 for r in rows] == [5, 6, 7, 8, 9]
    for a, b in zip(rows, rows[1:]):
        assert b.n_pairs <= a.n_pairs  # raising tau can only drop pairs


def test_avg_neighbor_degree_identity(spark):
    rows = engine.all_queries()["graph_avg_neighbor_degree"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.degree_bucket >= 0
        assert abs(r.avg_neighbor_degree - r.sum_neighbor_degree / r.n_edge_endpoints) < 1e-12
        assert r.avg_neighbor_degree >= 1.0  # every neighbor has >= 1 edge


def test_vocab_growth_monotone(spark):
    rows = sorted(
        engine.all_queries()["text_vocab_growth_checkpoints"](spark, SF_DIR).collect(),
        key=lambda r: r.checkpoint,
    )
    assert rows[-1].checkpoint == 500
    for a, b in zip(rows, rows[1:]):
        assert b.n_tokens > a.n_tokens and b.n_types >= a.n_types
    # concavity-ish: later checkpoints add fewer NEW types than the first
    first_new = rows[0].n_types
    last_new = rows[-1].n_types - rows[-2].n_types
    assert last_new <= first_new


def test_motion_intensity_consistent_with_shots(spark):
    motion = {
        r.doc_id: r
        for r in engine.all_queries()["multimodal_video_motion_intensity"](
            spark, SF_DIR
        ).collect()
    }
    shots = {
        r.doc_id: r
        for r in engine.all_queries()["multimodal_video_shot_detection"](
            spark, SF_DIR
        ).collect()
    }
    from etl_pipeline_aws_spark.llm.multimodal import SHOT_DELTA_MIN

    assert set(motion) == set(shots)
    for did, m in motion.items():
        assert m.n_frames == shots[did].n_frames
        assert 0 <= m.mean_abs_delta <= m.max_abs_delta or m.n_frames == 1
        # a video with any cut must show a delta above the cut threshold
        if shots[did].n_shots > 1:
            assert m.max_abs_delta > SHOT_DELTA_MIN


def test_mcnemar_cells_partition_pairs(spark):
    r = engine.all_queries()["stat_mcnemar_classifiers"](spark, SF_DIR).collect()[0]
    total = r.n_both_right + r.n_marker_only + r.n_char_only + r.n_both_wrong
    assert total > 0
    b, c = r.n_marker_only, r.n_char_only
    want = 0.0 if b + c == 0 else (b - c) ** 2 / (b + c)
    assert abs(r.mcnemar_chi2 - want) < 1e-9


def test_nrr_cohorts_cover_customers(spark):
    rows = engine.all_queries()["customer_cohort_nrr"](spark, SF_DIR).collect()
    con = duckdb_con(SF_DIR)
    n_cust = con.sql("SELECT COUNT(DISTINCT o_custkey) FROM orders").fetchone()[0]
    con.close()
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert r.year0_revenue > 0
        assert r.nrr_year1 >= 0.0


def test_training_build_consistent_with_gate_and_packer(spark):
    """The capstone must agree with its parent operators: kept docs per
    lang match the curation gate, and waste is non-negative."""
    from etl_pipeline_aws_spark.llm.corpus import PACK_BIN_CAPACITY

    build = {r.lang: r for r in engine.all_queries()[
        "pipeline_training_build_e2e"](spark, SF_DIR).collect()}
    gate = engine.all_queries()["corpus_curation_gate"](spark, SF_DIR)
    docs = engine.all_queries()["text_token_stats"](spark, SF_DIR)  # doc_id→n_tokens
    kept = {r.doc_id for r in gate.collect() if r.keep}
    con = duckdb_con(SF_DIR)
    lang_of = dict(con.sql("SELECT doc_id, lang FROM documents").fetchall())
    con.close()
    from collections import Counter
    want = Counter(lang_of[d] for d in kept)
    assert {k: v.n_docs for k, v in build.items()} == dict(want)
    for r in build.values():
        assert 0 <= r.padding_waste_bp < 10000
        assert r.n_bins * PACK_BIN_CAPACITY >= r.n_tokens
