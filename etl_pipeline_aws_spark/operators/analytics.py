"""Product-analytics operators over ``events`` — funnel conversion,
retention cohorts, and value histograms: the query shapes an event-stream
warehouse serves daily, composed from the same primitives the rest of the
engine uses (conditional min aggregation, co-partitioned stage joins,
window-free binning).

Scale notes: every operator here is one shuffle on ``user_id`` (or none),
then a tiny-key rollup — the canonical billions-of-events shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.registry import query


@query(
    "events_funnel",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(ts) FILTER (WHERE event_type = 'view') AS first_view,
               list(ts ORDER BY ts) FILTER (WHERE event_type = 'click') AS clicks,
               list(ts ORDER BY ts) FILTER (WHERE event_type = 'purchase') AS purchases
        FROM events GROUP BY user_id
    ), staged AS (
        SELECT user_id, first_view,
               list_filter(clicks, x -> x >= first_view)[1] AS first_click,
               list_filter(purchases,
                           x -> x >= list_filter(clicks, y -> y >= first_view)[1]
                          )[1] AS first_purchase
        FROM per_user
    )
    SELECT CAST(COUNT(first_view) AS BIGINT) AS n_viewed,
           CAST(COUNT(first_click) AS BIGINT) AS n_clicked_after_view,
           CAST(COUNT(first_purchase) AS BIGINT) AS n_purchased_after_click
    FROM staged
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user converts
    at each stage only via an event AT OR AFTER their previous stage's
    first event (the strict-ordering semantics naive per-type counts get
    wrong).

    Bounded-state stage chain: each stage is a MIN-based aggregation —
    first_view = min(view ts); first_click = min(click ts >= first_view);
    first_purchase = min(purchase ts >= first_click) — so per-user
    aggregation state is one timestamp at every step.  (An earlier version
    gathered full per-user timestamp lists with collect_list; a bot user
    with 10^7 events makes that agg buffer unboundedly at 100 TB.  MIN
    state is O(1) per key no matter how hot the user.)  Every shuffle —
    three aggs, three joins — is hash-partitioned on ``user_id``, so AQE
    reuses one exchange layout end to end; the final rollup is a
    scale-free global count."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def of_type(etype: str) -> DataFrame:
        return ev.filter(F.col("event_type") == etype)

    views = of_type("view").groupBy("user_id").agg(F.min("ts").alias("first_view"))
    clicks = (
        of_type("click")
        .join(views, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = (
        of_type("purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") >= F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    staged = views.join(clicks, "user_id", "left").join(purchases, "user_id", "left")
    return staged.agg(
        F.count("first_view").alias("n_viewed"),
        F.count("first_click").alias("n_clicked_after_view"),
        F.count("first_purchase").alias("n_purchased_after_click"),
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           date_diff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS DATE))
               AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users are cohorted by their first-activity
    day; each cell counts distinct cohort members active N days later.

    Two shuffles, both on ``user_id`` (first-day aggregation, then the
    events⋈cohort join lands on the same partitioning — AQE reuses the
    exchange), then a distinct-count rollup on the tiny
    (cohort, offset) key space."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("cohort_day")
    )
    return (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")).cast("date"), F.col("cohort_day"))
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


HIST_BIN_WIDTH = 25.0


@query(
    "events_value_histogram",
    oracle=f"""
    SELECT FLOOR(value / {HIST_BIN_WIDTH}) * {HIST_BIN_WIDTH} AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY 1
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values (bin width 25): binning is a
    scalar expression, so the whole histogram is one map-side-combined
    aggregation on a handful of bin keys — the constant-memory shape that
    histograms a 100 TB column in a single pass.  ``floor(double/double)``
    and min/max are bit-identical across engines (no summation)."""
    ev = load_table(spark, sf_dir, "events")
    bin_lo = F.floor(F.col("value") / HIST_BIN_WIDTH) * HIST_BIN_WIDTH
    return ev.groupBy(bin_lo.alias("bin_lo")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


_CA_CUTOFF = "2024-01-20 00:00:00"


@query(
    "continuous_aggregate_merge",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def continuous_aggregate_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate (hypertable-rollup) maintenance pattern: history
    before the cutoff exists only as DAILY PARTIAL aggregates (count +
    exact decimal sum — the mergeable state a materialized rollup would
    store); the query merges those partials with freshly-aggregated
    post-cutoff raw events into up-to-date per-type totals.

    The oracle is the direct full aggregation — passing proves
    partials-then-merge ≡ aggregate-once, which is the entire correctness
    argument for incremental rollups: at 100 TB you re-aggregate only the
    new partition and SUM the stored partials (bytes per day-type, not
    rows), never rescanning history.  Decimal partial sums are exact and
    associative, so the two-level summation cannot drift."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_CA_CUTOFF).cast("timestamp")
    partial_sum = F.sum(F.col("value").cast("decimal(18,2)"))
    # stored daily partials (what the rollup table would persist)
    partials = (
        ev.filter(F.col("ts") < cutoff)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), partial_sum.alias("s"))
    )
    fresh = (
        ev.filter(F.col("ts") >= cutoff)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), partial_sum.alias("s"))
    )
    return (
        partials.unionByName(fresh)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").cast("double").alias("sum_value"),
        )
    )


_ZS_BIN_US = 600_000_000  # 10-minute buckets
_ZS_LOOKBACK = 12  # trailing buckets in the rolling baseline
_ZS_MIN_N = 6  # minimum baseline points before scoring


@query(
    "events_anomaly_zscore",
    oracle=f"""
    WITH b AS (
        SELECT event_type,
               time_bucket(INTERVAL '10 minutes', ts) AS bucket_start,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
        FROM events GROUP BY 1, 2
    ), rolled AS (
        SELECT event_type, bucket_start, x,
               CAST(COUNT(x) OVER w AS BIGINT) AS roll_n,
               CAST(SUM(CAST(x AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_s,
               CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2)))
                        OVER w AS DOUBLE) AS roll_ss
        FROM b
        WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start
                     ROWS BETWEEN {_ZS_LOOKBACK} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, bucket_start, x, roll_n,
           CASE WHEN roll_n >= {_ZS_MIN_N}
                THEN (x - roll_s / roll_n)
                     / sqrt(GREATEST((roll_ss - roll_s * roll_s / roll_n)
                                         / (roll_n - 1), 1e-12))
                END AS z,
           COALESCE(CASE WHEN roll_n >= {_ZS_MIN_N}
                         THEN ABS((x - roll_s / roll_n)
                                  / sqrt(GREATEST((roll_ss - roll_s * roll_s / roll_n)
                                                      / (roll_n - 1), 1e-12))) > 3
                    END, FALSE) AS is_anomaly
    FROM rolled
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection per metric series: each
    (event_type, 10-minute bucket) total is scored against the mean/std
    of its own TRAILING 12 buckets (current excluded — the baseline must
    not contain the point it judges), flagged at |z| > 3.

    Determinism across engines: bucket totals and the rolling sum /
    sum-of-squares are EXACT decimal aggregations; mean, variance, and z
    are then identical double expressions on identical exact inputs, and
    the variance is floored at 1e-12 before sqrt so float cancellation
    can't produce NaN on a constant series.  One shuffle for the bucket
    aggregation, one per-series window pass — the same two stages at any
    scale, and the window frame bounds the state at 13 rows per series
    regardless of data volume."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    bucket = F.timestamp_micros(
        (F.floor(F.unix_micros(F.col("ts")) / _ZS_BIN_US) * _ZS_BIN_US).cast("long")
    )
    b = ev.groupBy("event_type", bucket.alias("bucket_start")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("x")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_start")
        .rowsBetween(-_ZS_LOOKBACK, -1)
    )
    xd = F.col("x").cast("decimal(18,2)")
    rolled = b.select(
        "event_type",
        "bucket_start",
        "x",
        F.count("x").over(w).alias("roll_n"),
        F.sum(xd).over(w).cast("double").alias("roll_s"),
        F.sum(xd * xd).over(w).cast("double").alias("roll_ss"),
    )
    mean = F.col("roll_s") / F.col("roll_n")
    var = F.greatest(
        (F.col("roll_ss") - F.col("roll_s") * F.col("roll_s") / F.col("roll_n"))
        / (F.col("roll_n") - 1),
        F.lit(1e-12),
    )
    z = (F.col("x") - mean) / F.sqrt(var)
    # CASE-guard every use of z: under ANSI mode the divisions inside z
    # throw on roll_n in {0, 1} unless conditional evaluation masks them
    scored = F.col("roll_n") >= _ZS_MIN_N
    return rolled.select(
        "event_type",
        "bucket_start",
        "x",
        "roll_n",
        F.when(scored, z).alias("z"),
        F.coalesce(F.when(scored, F.abs(z) > 3), F.lit(False)).alias("is_anomaly"),
    )
