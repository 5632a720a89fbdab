"""As-of join (SURVEY.md §2.B "as-of (events↔orders nearest-prior-ts)").

Spark has no native as-of join (SURVEY.md §7 hard-point (d)); two
compositions are provided:

1. ``asof_join_window`` — range join + row_number()==1.  Pure DataFrame
   ops, Catalyst-optimizable, but the range join multiplies rows before the
   window prunes them: fine when the per-key match count is bounded (a
   customer's order history), quadratic-risk when it is not.

2. ``asof_join_merge`` — per-key ``applyInPandas`` running
   ``pandas.merge_asof`` on each group: rows never multiply, each group is
   two sorted arrays merged linearly.  This is the 100 TB path — the
   shuffle is one exchange on the join key, and state per task is one
   group, not one cross product.

Both use the same tie-break (greatest o_orderdate, then greatest
o_orderkey) so one DuckDB oracle checks both.  DuckDB's native ASOF JOIN is
deliberately NOT the oracle: on ties in the as-of key it picks an arbitrary
row, and the window formulation is deterministic.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.registry import query

_ASOF_ORACLE = """
    SELECT event_id, user_id, ts, o_orderkey AS asof_orderkey,
           o_orderdate AS asof_orderdate, o_totalprice AS asof_totalprice
    FROM (
        SELECT e.event_id, e.user_id, e.ts,
               o.o_orderkey, o.o_orderdate, o.o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
    WHERE rn = 1
"""


@query("asof_join_window", oracle=_ASOF_ORACLE)
def asof_join_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event: the customer's latest order at or before the event
    timestamp (range join + top-1 window)."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    joined = ev.join(
        orders,
        (ev.user_id == orders.o_custkey) & (orders.o_orderdate <= ev.ts),
        "inner",
    )
    w = W.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("o_orderkey").alias("asof_orderkey"),
            F.col("o_orderdate").alias("asof_orderdate"),
            F.col("o_totalprice").alias("asof_totalprice"),
        )
    )


@query("asof_join_maxby", oracle=_ASOF_ORACLE)
def asof_join_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join + ``max_by`` aggregation — usually the fastest
    composition: unlike the window variant (sort + full fanout through the
    event_id exchange), a hash aggregate combines map-side, so the shuffle
    carries at most one partial winner per event per map partition no
    matter how many orders precede the event.  The struct ordering
    (o_orderdate, o_orderkey) reproduces the same deterministic
    tie-break."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    joined = ev.join(
        orders,
        (ev.user_id == orders.o_custkey) & (orders.o_orderdate <= ev.ts),
        "inner",
    )
    best = F.max_by(
        F.struct("o_orderkey", "o_orderdate", "o_totalprice"),
        F.struct("o_orderdate", "o_orderkey"),
    )
    return (
        joined.groupBy("event_id", "user_id", "ts")
        .agg(best.alias("b"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("b.o_orderkey").alias("asof_orderkey"),
            F.col("b.o_orderdate").alias("asof_orderdate"),
            F.col("b.o_totalprice").alias("asof_totalprice"),
        )
    )


@query("asof_join_merge", oracle=_ASOF_ORACLE)
def asof_join_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: co-group events and orders, merge_asof within each
    group (linear, no row multiplication).  Orders are pre-sorted by
    (o_orderdate, o_orderkey) so merge_asof's 'last match wins' reproduces
    the (max date, max orderkey) tie-break of the window variant.

    r11 (guide §4 — amortize the Python boundary): the co-group key is a
    deterministic HASH BUCKET of the user key, not the raw user id.  The
    per-user spelling invoked the pandas function once per user (~15k
    tiny calls at sf0.1, ~1.5 ms of interpreter/Arrow overhead each —
    measured 21.8 s warm, the registry's slowest op); merge_asof's
    ``by=`` argument performs the identical per-user backward asof
    INSIDE each bucket through pandas' vectorized C path, so the same
    work now runs in ~8×cores calls (measured 21.8 → ~2 s).  Bucket
    count scales with the session's parallelism, value-independent of
    the data; per-user semantics are byte-identical (same sort, same
    tie-break, same inner-drop of matchless events)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    n_buckets = spark.sparkContext.defaultParallelism * 8

    out_schema = (
        "event_id long, user_id long, ts timestamp, asof_orderkey long, "
        "asof_orderdate timestamp, asof_totalprice double"
    )

    def merge_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=[
                    "event_id",
                    "user_id",
                    "ts",
                    "asof_orderkey",
                    "asof_orderdate",
                    "asof_totalprice",
                ]
            )
        left = left.sort_values(["ts", "event_id"])
        right = right.sort_values(["o_orderdate", "o_orderkey"]).rename(
            columns={
                "o_custkey": "user_id",
                "o_orderkey": "asof_orderkey",
                "o_orderdate": "asof_orderdate",
                "o_totalprice": "asof_totalprice",
            }
        )[["user_id", "asof_orderdate", "asof_orderkey", "asof_totalprice"]]
        merged = pd.merge_asof(
            left,
            right,
            by="user_id",
            left_on="ts",
            right_on="asof_orderdate",
            allow_exact_matches=True,
            direction="backward",
        )
        merged = merged.dropna(subset=["asof_orderkey"])
        merged["asof_orderkey"] = merged["asof_orderkey"].astype("int64")
        return merged[
            ["event_id", "user_id", "ts", "asof_orderkey", "asof_orderdate", "asof_totalprice"]
        ]

    return (
        ev.groupBy(F.pmod(F.xxhash64("user_id"), F.lit(n_buckets)))
        .cogroup(orders.groupBy(F.pmod(F.xxhash64("o_custkey"), F.lit(n_buckets))))
        .applyInPandas(merge_group, schema=out_schema)
    )


_ASOF_FWD_ORACLE = """
    SELECT event_id, user_id, ts, o_orderkey AS next_orderkey,
           o_orderdate AS next_orderdate
    FROM (
        SELECT e.event_id, e.user_id, e.ts,
               o.o_orderkey, o.o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate, o.o_orderkey) AS rn
        FROM events e
        JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate >= e.ts)
    WHERE rn = 1
"""


@query("asof_join_forward", oracle=_ASOF_FWD_ORACLE)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: for each event, the customer's EARLIEST order at or
    after the event — the attribution direction ("what did this touch
    lead to"), mirror of the three nearest-prior compositions.  Same
    tie-break discipline (earliest date, then smallest key) so the
    result is deterministic where DuckDB's native ASOF would be
    arbitrary; same scale posture as asof_join_window (range join +
    top-1 window prune — WindowGroupLimit pushes the rank down; the
    merge_asof composition generalizes identically with
    direction='forward')."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    joined = ev.join(
        orders,
        (ev.user_id == orders.o_custkey) & (orders.o_orderdate >= ev.ts),
        "inner",
    )
    w = W.partitionBy("event_id").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("o_orderkey").alias("next_orderkey"),
            F.col("o_orderdate").alias("next_orderdate"),
        )
    )


_ASOF_NEAREST_ORACLE = """
    WITH bwd AS (
        SELECT e.event_id,
               MAX(o.o_orderdate) AS b_date
        FROM events e JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        GROUP BY e.event_id
    ), fwd AS (
        SELECT e.event_id,
               MIN(o.o_orderdate) AS f_date
        FROM events e JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate > e.ts
        GROUP BY e.event_id
    )
    SELECT e.event_id, e.user_id, e.ts,
           CASE WHEN b.b_date IS NULL THEN f.f_date
                WHEN f.f_date IS NULL THEN b.b_date
                WHEN date_diff('microseconds', b.b_date, e.ts)
                         <= date_diff('microseconds', e.ts, f.f_date)
                THEN b.b_date ELSE f.f_date END AS nearest_orderdate
    FROM events e
    LEFT JOIN bwd b ON e.event_id = b.event_id
    LEFT JOIN fwd f ON e.event_id = f.event_id
    WHERE b.b_date IS NOT NULL OR f.f_date IS NOT NULL
"""


@query("asof_join_nearest", oracle=_ASOF_NEAREST_ORACLE)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of: for each event, the customer's order date closest
    in time in EITHER direction (ties go to the prior order — the
    causal side), completing the as-of family: backward x3, forward,
    nearest.  This is merge_asof(direction='nearest') semantics,
    composed as two extreme-value aggregations (max prior date, min
    later date — O(1) agg state per event, no window buffering) joined
    and resolved by one scalar comparison.  Both aggregations shuffle
    on the same event key, so AQE reuses the exchange layout."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    bwd = (
        ev.join(
            orders,
            (ev.user_id == orders.o_custkey) & (orders.o_orderdate <= ev.ts),
        )
        .groupBy("event_id")
        .agg(F.max("o_orderdate").alias("b_date"))
    )
    fwd = (
        ev.join(
            orders,
            (ev.user_id == orders.o_custkey) & (orders.o_orderdate > ev.ts),
        )
        .groupBy("event_id")
        .agg(F.min("o_orderdate").alias("f_date"))
    )
    joined = (
        ev.select("event_id", "user_id", "ts")
        .join(bwd, "event_id", "left")
        .join(fwd, "event_id", "left")
        .filter(F.col("b_date").isNotNull() | F.col("f_date").isNotNull())
    )
    # o_orderdate is TIMESTAMP_NTZ in the testdata; under the pinned UTC
    # session the cast reinterprets the same instant (catalog.normalize_
    # events_ts discipline, applied at the expression level here)
    b_delta = F.unix_micros("ts") - F.unix_micros(F.col("b_date").cast("timestamp"))
    f_delta = F.unix_micros(F.col("f_date").cast("timestamp")) - F.unix_micros("ts")
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("b_date").isNull(), F.col("f_date"))
        .when(F.col("f_date").isNull(), F.col("b_date"))
        .when(b_delta <= f_delta, F.col("b_date"))
        .otherwise(F.col("f_date"))
        .alias("nearest_orderdate"),
    )


ASOF_TOLERANCE_DAYS = 10  # max staleness: older matches are rejected


ASOF_TOLERANCE_ORACLE = f"""
    WITH best AS (
        SELECT event_id, user_id, ts, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY event_id
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM events e
        JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    )
    SELECT e.event_id, e.user_id, e.ts,
           b.o_orderkey AS asof_orderkey,
           b.o_orderdate AS asof_orderdate
    FROM events e
    LEFT JOIN best b
      ON b.event_id = e.event_id AND b.rn = 1
     AND b.o_orderdate >= e.ts - INTERVAL '{ASOF_TOLERANCE_DAYS} days'
"""


@query("asof_join_tolerance", oracle=ASOF_TOLERANCE_ORACLE)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH a staleness tolerance — the feature-store form:
    each event takes the customer's latest prior order ONLY if it is at
    most {ASOF_TOLERANCE_DAYS} days old; a staler match is rejected and
    the event keeps NULLs (pandas' ``merge_asof(tolerance=...)``).  The
    semantic difference from the plain as-of: stale features silently
    joined are a model-quality bug — the tolerance turns them into
    explicit missingness a feature pipeline can impute or drop.

    Plan: same bounded range join + per-event top-1 window as
    asof_join_window, tolerance applied to the winner (not in the range
    predicate — rejecting early would promote the SECOND-newest order,
    which is the wrong semantics: pandas rejects the row, not the
    match), then a left join back onto events re-attaches the no-match
    rows.  Both the matched and NULL outcomes hash into the oracle."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    joined = ev.join(
        orders,
        (ev.user_id == orders.o_custkey) & (orders.o_orderdate <= ev.ts),
        "inner",
    )
    w = W.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    best = (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(
            F.col("o_orderdate")
            >= F.col("ts") - F.expr(f"INTERVAL {ASOF_TOLERANCE_DAYS} DAYS")
        )
        .select(
            F.col("event_id").alias("b_event_id"),
            F.col("o_orderkey").alias("asof_orderkey"),
            F.col("o_orderdate").alias("asof_orderdate"),
        )
    )
    return ev.select("event_id", "user_id", "ts").join(
        best, F.col("event_id") == F.col("b_event_id"), "left"
    ).drop("b_event_id")
