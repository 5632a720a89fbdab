"""Catalog reader behavior — above all the type-adaptive events ``ts``
normalization that absorbed round 2's testdata drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_aws_spark.catalog import load_table, normalize_events_ts


def test_normalize_events_ts_all_three_physical_shapes(spark):
    """The same instant stored three ways — nanos-as-long (legacy
    TIMESTAMP(NANOS) surface), TIMESTAMP_NTZ (MICROS, isAdjustedToUTC
    false), and TIMESTAMP (MICROS/UTC) — must normalize to the identical
    session-TZ TIMESTAMP value.  This is the unit-level guarantee behind
    the stream/batch schema-parity test: whichever shape the next
    testdata generation picks, every downstream ts consumer sees one
    type and one value."""
    micros = 1_705_315_800_123_456  # 2024-01-15 10:50:00.123456 UTC
    as_long = spark.createDataFrame([(micros * 1000,)], "ts long")
    as_ntz = spark.sql(
        f"SELECT CAST(timestamp_micros({micros}) AS TIMESTAMP_NTZ) AS ts"
    )
    as_ltz = spark.sql(f"SELECT timestamp_micros({micros}) AS ts")

    outs = [normalize_events_ts(df) for df in (as_long, as_ntz, as_ltz)]
    for out in outs:
        assert dict(out.dtypes)["ts"] == "timestamp"
    values = {out.select(F.unix_micros("ts")).first()[0] for out in outs}
    assert values == {micros}, values


def test_load_events_is_normalized_and_usable(spark):
    """Whatever the current testdata stores physically, the catalog's
    events surface must support the operations round 2 broke:
    unix_micros, window bucketing, and timestamp comparisons."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    row = (
        ev.select(
            F.unix_micros("ts").alias("us"),
            F.window("ts", "10 minutes").start.alias("w"),
        )
        .filter(F.col("us").isNotNull())
        .first()
    )
    assert row.us > 0 and row.w is not None


def test_operator_index_is_current():
    """OPERATORS.md must be regenerated whenever the registry changes —
    a stale index misleads exactly the reader it exists for.  The check
    renders to memory (no file side effects, so a stale index keeps
    failing until actually regenerated) and derives paths from this
    file's location, not a hardcoded checkout path."""
    import os
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo_root, "tools"))
    try:
        import gen_operator_index
    finally:
        sys.path.pop(0)
    committed = open(os.path.join(repo_root, "OPERATORS.md")).read()
    assert committed == gen_operator_index.render(), (
        "OPERATORS.md stale: rerun tools/gen_operator_index.py"
    )


def test_schema_cache_returns_same_data_and_schema(spark):
    """r11: load_table hands the reader a cached schema (skipping per-call
    footer inference).  The cached read must be indistinguishable from a
    direct spark.read.parquet — same schema, same rows."""
    from etl_pipeline_aws_spark.catalog import _SCHEMA_CACHE, table_path

    sf = "/root/testdata/sf0.001"
    cached = load_table(spark, sf, "nation")
    direct = spark.read.parquet(table_path(sf, "nation"))
    assert cached.schema == direct.schema
    assert sorted(map(tuple, cached.collect())) == sorted(map(tuple, direct.collect()))
    assert table_path(sf, "nation") in _SCHEMA_CACHE


def test_register_views_idempotent_and_sf_switch_reregisters(spark):
    """r11: register_views skips the ~0.5 s re-registration when the same
    sf_dir is already current, and MUST re-register when it changes —
    a multi-SF sweep reading stale views would silently compare the wrong
    scale factor."""
    from etl_pipeline_aws_spark.catalog import register_views

    register_views(spark, "/root/testdata/sf0.001")
    n_small = spark.table("nation").count()
    c_small = spark.table("customer").count()
    register_views(spark, "/root/testdata/sf0.01")
    c_big = spark.table("customer").count()
    assert c_big > c_small  # views really switched
    register_views(spark, "/root/testdata/sf0.01")  # no-op path
    assert spark.table("customer").count() == c_big
    register_views(spark, "/root/testdata/sf0.001")
    assert spark.table("nation").count() == n_small


def test_interleaved_direct_registration_does_not_go_stale(spark):
    """r12 (verdict item 2): a query that registers canonical views from its
    OWN sf_dir (agg_grouping_sets does) must not leave a later
    register_views(original_sf) call believing its views are still current.
    Sequence sfA -> query(sfB) -> register_views(sfA) must read sfA data."""
    from etl_pipeline_aws_spark.catalog import register_views
    from etl_pipeline_aws_spark.operators.aggregates import agg_grouping_sets

    sf_a, sf_b = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    register_views(spark, sf_a)
    li_a = spark.table("lineitem").count()
    agg_grouping_sets(spark, sf_b).collect()  # re-points canonical views at sfB
    register_views(spark, sf_a)  # must NOT be skipped
    assert spark.table("lineitem").count() == li_a
