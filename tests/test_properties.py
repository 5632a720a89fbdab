"""Property-based tests (hypothesis): the reference-fidelity transform and
the deterministic-numeric helpers hold for ARBITRARY inputs, not just the
hand-picked fixtures.

Each example pays a full Spark job, so example counts are small but the
input space is wide: ragged keys, absent/present ``name``, blank and
whitespace-only lines, unicode strings, int/bool values.

The model being checked is the reference's own semantics
(``/root/reference/glue/job.py:22-36``): skip blank lines, pass every field
through, add ``processed=True`` and ``uppercase_name=upper(name or "")``.
Comparison is parsed-equality per record — the reference preserves input
key order while Spark writes schema order, a byte-level divergence that is
documented, not hidden.
"""

from __future__ import annotations

import json
from decimal import Decimal

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import functions as F

from etl_pipeline_aws_spark.functions.numeric import dsum
from etl_pipeline_aws_spark.pipeline import enrich
from etl_pipeline_aws_spark.sources.ndjson import read_ndjson

# -- NDJSON fidelity ---------------------------------------------------------

# Values that round-trip identically through Spark JSON inference and
# json.dumps: strings, longs, booleans.  (Floats render differently, nulls
# are dropped by Spark's JSON writer — both documented divergences, both
# excluded from the *generated* space and covered by unit tests instead.)
_scalar = st.one_of(
    st.text(min_size=0, max_size=8),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.booleans(),
)
# Fixed key→type assignment per example (Spark infers ONE schema per file;
# mixed types for one key would exercise inference coercion, not the
# transform under test).
_record = st.fixed_dictionaries(
    {},
    optional={
        "name": st.text(min_size=0, max_size=8),
        "ka": st.text(max_size=5),
        "kb": st.integers(min_value=0, max_value=10**6),
        "kc": st.booleans(),
    },
)
_lines = st.lists(
    st.one_of(_record, st.sampled_from(["", "   ", "\t"])), min_size=1, max_size=12
)


def _reference_model(lines: list) -> list[dict]:
    """glue/job.py:25-34 re-implemented verbatim as the spec."""
    serialized = [
        json.dumps(ln) if isinstance(ln, dict) else ln for ln in lines
    ]
    records = [json.loads(l) for l in serialized if l.strip()]
    return [
        {**r, "processed": True, "uppercase_name": r.get("name", "").upper()}
        for r in records
    ]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=_lines)
def test_enrich_matches_reference_model(spark, tmp_path_factory, lines):
    path = tmp_path_factory.mktemp("prop") / "in.json"
    path.write_text(
        "\n".join(json.dumps(ln) if isinstance(ln, dict) else ln for ln in lines)
    )
    want = _reference_model(lines)

    df = enrich(read_ndjson(spark, str(path)))
    got = [json.loads(r) for r in df.toJSON().collect()]

    assert len(got) == len(want)
    # order-insensitive multiset equality on parsed records
    canon = lambda rows: sorted(json.dumps(r, sort_keys=True) for r in rows)
    assert canon(got) == canon(want)


# -- deterministic numeric aggregation --------------------------------------


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cents=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=40
    ),
    parts=st.integers(min_value=1, max_value=9),
)
def test_dsum_invariant_under_partitioning(spark, cents, parts):
    """The whole point of the decimal-sum pattern: the result is EXACTLY
    the same under any partitioning / aggregation tree, equal to the
    Decimal ground truth.  SUM(double) does not have this property."""
    values = [Decimal(c) / 100 for c in cents]
    truth = float(sum(values))
    df = spark.createDataFrame([(float(v),) for v in values], ["x"])
    out = {
        n: df.repartition(n).agg(dsum("x").alias("s")).collect()[0]["s"]
        for n in (1, parts)
    }
    assert out[1] == truth
    assert out[parts] == truth


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),  # group
            st.integers(min_value=-1000, max_value=1000),  # value
            st.integers(min_value=1, max_value=50),  # weight
        ),
        min_size=1,
        max_size=30,
    )
)
def test_weighted_lower_median_matches_ground_truth(spark, data):
    """weighted_lower_median == the definitional answer: sort by value,
    accumulate weights, first value whose cumulative weight reaches half
    the total — for arbitrary groups, values (ties included), weights."""
    from etl_pipeline_aws_spark.operators.aggregates import weighted_lower_median

    df = spark.createDataFrame(
        [(g, float(v), w) for g, v, w in data], ["g", "v", "w"]
    )
    got = {
        r.g: (r.weighted_median, r.total_weight)
        for r in weighted_lower_median(df, "g", "v", "w").collect()
    }
    groups: dict = {}
    for g, v, w in data:
        groups.setdefault(g, []).append((v, w))
    for g, vw in groups.items():
        agg: dict = {}
        for v, w in vw:
            agg[v] = agg.get(v, 0) + w
        tot = sum(agg.values())
        cum = 0
        expect = None
        for v in sorted(agg):
            cum += agg[v]
            if 2 * cum >= tot:
                expect = float(v)
                break
        assert got[g] == (expect, tot), (g, got[g], expect, tot)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cents=st.lists(
        st.integers(min_value=1, max_value=100000), min_size=2, max_size=25
    )
)
def test_gini_rank_formula_matches_pairwise_definition(spark, cents):
    """The rank formula G = 2·Σ(i·x)/（n·Σx) − (n+1)/n must equal the
    definitional mean-absolute-difference form Σ|xi−xj| / (2n²·mean)
    for positive values (ties included)."""
    from etl_pipeline_aws_spark.operators.aggregates import gini_by_rank_formula

    values = [c / 100 for c in cents]
    df = spark.createDataFrame(
        [(0, float(v), idx) for idx, v in enumerate(values)], ["g", "v", "k"]
    )
    got = gini_by_rank_formula(df, "g", "v", "k").collect()[0]
    n = len(values)
    mean = sum(values) / n
    mad = sum(abs(a - b) for a in values for b in values) / (n * n)
    expect = mad / (2 * mean)
    assert got.n == n
    assert abs(got.gini - expect) < 1e-9, (got.gini, expect)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cents=st.lists(
        st.integers(min_value=-10000, max_value=10000), min_size=1, max_size=25
    )
)
def test_max_drawdown_matches_definition(spark, cents):
    """max_drawdown_frame == max over t of (max cum[0..t] - cum[t]),
    computed in exact Decimal, for arbitrary signed series."""
    from etl_pipeline_aws_spark.operators.analytics import max_drawdown_frame

    values = [Decimal(c) / 100 for c in cents]
    df = spark.createDataFrame(
        [(1, idx, float(v)) for idx, v in enumerate(values)], ["k", "t", "v"]
    )
    got = max_drawdown_frame(df, "k", ["t"], "v").collect()[0].max_drawdown
    cums = []
    run = Decimal(0)
    for v in values:
        run += v
        cums.append(run)
    expect = float(max(max(cums[: t + 1]) - cums[t] for t in range(len(cums))))
    assert got == expect, (got, expect)
