"""Streaming-specific behavior that the oracle can't see: multi-batch
watermark advancement actually dropping late data, and exactly-once-per-
epoch foreachBatch routing."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_watermark_drops_late_rows_across_restarts(spark, tmp_path):
    """Recent events are processed in run 1; a file of events 3 hours older
    lands afterwards and is processed by run 2 sharing the checkpoint.  The
    watermark persisted by run 1 (12:55 max − 30 min = 12:25) must drop
    every late 09:xx row in run 2, while run 2's watermark advance flushes
    the closed 12:xx windows to the append-mode sink."""
    landing = tmp_path / "landing"
    landing.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    def run_once():
        stream = spark.readStream.schema("id long, ts timestamp").parquet(
            str(landing) + "/*"
        )
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "10 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    recent = spark.createDataFrame(
        [(i, f"2024-01-01 12:{m:02d}:00") for i, m in enumerate([0, 5, 10, 55])],
        "id long, ts_str string",
    ).select("id", F.col("ts_str").cast("timestamp").alias("ts"))
    recent.coalesce(1).write.parquet(str(landing / "f1"))
    run_once()

    late = spark.createDataFrame(
        [(100 + i, f"2024-01-01 09:{m:02d}:00") for i, m in enumerate([0, 10])],
        "id long, ts_str string",
    ).select("id", F.col("ts_str").cast("timestamp").alias("ts"))
    late.coalesce(1).write.parquet(str(landing / "f2"))
    run_once()

    out = spark.read.schema("ws timestamp, n long").parquet(sink)
    rows = sorted((r.ws.hour, r.ws.minute, r.n) for r in out.collect())
    # every 09:xx row was beyond the restored watermark -> dropped
    assert all(h != 9 for h, _, _ in rows), rows
    # run 2's watermark advance emitted the closed 12:00 (n=2) and 12:10
    # (n=1) windows; 12:50 stays open in state
    assert (12, 0, 2) in rows and (12, 10, 1) in rows, rows


def test_stream_schema_matches_batch_schema(spark):
    """The streamed events reader must surface EXACTLY the batch catalog
    reader's schema.  This is the one-place tripwire for testdata drift:
    the writer has already changed ts's physical type once (TIMESTAMP
    NANOS → MICROS/NTZ, round 2's headline breakage) — any future flip
    must fail HERE, loudly, not as garbage rows in seven queries."""
    from etl_pipeline_aws_spark.catalog import load_table
    from etl_pipeline_aws_spark.streaming.stream_queries import read_events_stream

    sf = "/root/testdata/sf0.001"
    stream_schema = read_events_stream(spark, sf).schema
    batch_schema = load_table(spark, sf, "events").schema
    assert stream_schema == batch_schema
    # and both normalize ts to session-TZ TIMESTAMP (what unix_micros,
    # window(), and watermarks all require)
    assert dict((f.name, f.dataType.simpleString()) for f in batch_schema)["ts"] == "timestamp"


def test_stream_batch_parity_tumbling(spark):
    """The streamed tumbling aggregate equals the batch twin row-for-row
    (both already oracle-checked; this pins them to each other directly)."""
    import etl_pipeline_aws_spark as engine

    qs = engine.all_queries()
    sf = "/root/testdata/sf0.001"
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in qs["window_tumbling"](spark, sf).collect()
    }
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in qs["stream_tumbling"](spark, sf).collect()
    }
    assert batch == streamed


def test_stateful_sessions_merge_across_micro_batches(spark, tmp_path):
    """The GroupState session machine must produce the SAME sessions when
    the input arrives split across three time-ordered micro-batches as it
    does in one batch (sessions spanning a batch boundary are extended
    under their original id, not fragmented, and no (user, session) key
    duplicates)."""
    import os

    import etl_pipeline_aws_spark as engine
    from etl_pipeline_aws_spark.catalog import load_table
    from etl_pipeline_aws_spark.streaming.stream_queries import _sessionize_stream

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("user_id", "ts", "event_id")
    # split by TIME so per-user arrival order holds across files
    lo, hi = ev.selectExpr("min(ts)", "max(ts)").first()
    span = hi - lo
    cut1 = lo + span / 3
    cut2 = lo + 2 * span / 3
    landing = tmp_path / "landing"
    landing.mkdir()
    parts = [
        ev.filter(F.col("ts") < cut1),
        ev.filter((F.col("ts") >= cut1) & (F.col("ts") < cut2)),
        ev.filter(F.col("ts") >= cut2),
    ]
    for i, p in enumerate(parts):
        d = str(tmp_path / f"stage{i}")
        p.coalesce(1).write.parquet(d)
        src = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        dst = str(landing / f"{i}-events.parquet")
        os.rename(os.path.join(d, src), dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    multi = {
        (r.user_id, r.session_id): (r.session_start, r.session_end, r.n_events)
        for r in _sessionize_stream(stream).collect()
    }
    single = {
        (r.user_id, r.session_id): (r.session_start, r.session_end, r.n_events)
        for r in engine.all_queries()["stream_stateful_sessions"](spark, sf).collect()
    }
    assert multi == single


def test_foreachbatch_checkpoint_restart_exactly_once(spark, tmp_path):
    """Checkpointed foreachBatch killed mid-stream (crash injected after
    epoch 1's write but before its commit) and resumed: the restarted query
    replays the uncommitted epoch under the SAME batch id, so an
    idempotent per-epoch sink sees every input row exactly once."""
    import os

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    landing = tmp_path / "landing"
    landing.mkdir()
    for i in range(3):
        df = spark.range(i * 10, (i + 1) * 10).selectExpr("id")
        d = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.parquet(d)
        src = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        dst = str(landing / f"{i}.parquet")
        os.rename(os.path.join(d, src), dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))

    sink_root = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    def run(crash: bool) -> None:
        def handle(batch, epoch_id: int) -> None:
            # overwrite-by-epoch = idempotent under epoch replay
            batch.write.mode("overwrite").parquet(f"{sink_root}/epoch={epoch_id}")
            if crash and epoch_id == 1:
                raise RuntimeError("injected crash after write, before commit")

        q = (
            spark.readStream.schema("id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(landing))
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(StreamingQueryException):
        run(crash=True)
    run(crash=False)  # resume from the checkpoint

    out = spark.read.parquet(sink_root)
    assert sorted(r.id for r in out.select("id").collect()) == list(range(30))
    assert {r.epoch for r in out.select("epoch").distinct().collect()} == {0, 1, 2}


def test_foreachbatch_routing_layout(spark):
    """The routed zone must be partitioned by event_type directories —
    the R13 dynamic-output contract."""
    import etl_pipeline_aws_spark as engine

    qs = engine.all_queries()
    df = qs["stream_foreachbatch_routing"](spark, "/root/testdata/sf0.001")
    routes = {r.route for r in df.collect()}
    assert routes  # at least one route materialized


def test_state_eviction_audit_set_algebra(spark):
    """The eviction contract, asserted as set algebra over the two
    snapshots: before = the complete aggregation; after ⊂ before with
    identical per-key values (eviction drops keys, never rewrites them);
    dropped = exactly the windows whose end the final watermark passed."""
    import etl_pipeline_aws_spark as engine

    rows = engine.all_queries()["stream_state_eviction_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    before = {
        (r.window_start, r.window_end, r.event_type): r.n_events
        for r in rows
        if r.snapshot == "before_watermark_passage"
    }
    after = {
        (r.window_start, r.window_end, r.event_type): r.n_events
        for r in rows
        if r.snapshot == "after_watermark_passage"
    }
    assert before and after
    assert len(after) < len(before)  # the watermark evicted something
    assert set(after) <= set(before)
    for k, v in after.items():
        assert before[k] == v  # surviving state unchanged by eviction
    watermark = max(k[1] for k in before) - __import__("datetime").timedelta(hours=1)
    for k in set(before) - set(after):
        assert k[1] < watermark  # every dropped window was passed
    for k in after:
        assert k[1] >= watermark  # every kept window was not
