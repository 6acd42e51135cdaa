"""Streaming-surface tests: availableNow quiescence ≙ batch semantics
(SURVEY.md §5.2 item 5), plus a streaming pipeline through the
builder API (with_producer accepting a streaming DataFrame)."""

from pyspark.sql import functions as F

from async_pipes_spark.plans.declared import p9_tumbling_window
from async_pipes_spark.streaming.run import run_available_now, stream_table
from async_pipes_spark.streaming.windows import tumbling_counts_stream

from tests.conftest import SF_SMOKE, value_hash


def test_stream_equals_batch_tumbling(spark):
    """P9 batch and its streaming twin must produce identical results."""
    batch = p9_tumbling_window(spark, SF_SMOKE)
    stream = run_available_now(tumbling_counts_stream(stream_table(spark, SF_SMOKE, "events")))
    bh = value_hash(batch.columns, [tuple(r) for r in batch.collect()])
    sh = value_hash(stream.columns, [tuple(r) for r in stream.collect()])
    assert bh == sh


def test_streaming_pipeline_through_builder(spark):
    """A streaming producer flows through with_stage into a consumer
    that runs the stream to quiescence — the builder's unbounded-source
    path (reference with_producer's infinite closures)."""
    from async_pipes_spark import Pipeline

    ev = stream_table(spark, SF_SMOKE, "events")

    def to_hourly(df):
        return (
            df.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("w"), "n")
        )

    res = (
        Pipeline.builder(spark)
        .with_producer("events", ev)
        .with_stage("events", "hourly", to_hourly)
        .with_consumer("hourly", lambda df: run_available_now(df).count())
        .build()
        .wait()
    )
    batch_n = p9_tumbling_window(spark, SF_SMOKE).select("w").distinct().count()
    assert res["hourly"] == batch_n


def test_query_stop_is_terminate(spark):
    """query.stop() ≙ the reference's Terminate signal (mod.rs:205-212):
    a started streaming query can be stopped out-of-band."""
    ev = stream_table(spark, SF_SMOKE, "events")
    q = (
        ev.writeStream.format("memory")
        .queryName("stop_probe")
        .outputMode("append")
        .start()
    )
    assert q.isActive
    q.stop()
    q.awaitTermination()
    assert not q.isActive


def test_foreach_batch_multi_sink_routes(spark, tmp_path):
    """Streaming twin of with_branching_stage: one pass over the
    stream, each record routed to the sinks whose predicate admits it;
    per-sink contents equal the batch filters."""
    from pyspark.sql import functions as F

    from async_pipes_spark.sources.tables import load_table
    from async_pipes_spark.streaming.run import run_foreach_batch_routes, stream_table

    ev = stream_table(spark, SF_SMOKE, "events")
    paths = run_foreach_batch_routes(
        ev,
        {
            "clicks": F.col("event_type") == "click",
            "purchases": F.col("event_type") == "purchase",
            "big": F.col("value") > 50,  # overlapping route: true multicast
        },
        str(tmp_path),
    )
    batch = load_table(spark, SF_SMOKE, "events")
    for name, pred in {
        "clicks": F.col("event_type") == "click",
        "purchases": F.col("event_type") == "purchase",
        "big": F.col("value") > 50,
    }.items():
        got = spark.read.parquet(paths[name])
        want = batch.filter(pred)
        assert got.count() == want.count(), name
        assert sorted(r.event_id for r in got.select("event_id").collect()) == sorted(
            r.event_id for r in want.select("event_id").collect()
        ), name


def test_stream_to_files_durable_sink(spark, tmp_path):
    """Streaming file sink: availableNow drain writes every source row
    exactly once to parquet (checkpointed), and the result equals the
    batch read."""
    from async_pipes_spark.sources.tables import load_table
    from async_pipes_spark.streaming.run import stream_table, stream_to_files

    out = str(tmp_path / "events_copy")
    ev = stream_table(spark, SF_SMOKE, "events")
    stream_to_files(ev.select("event_id", "user_id"), out)
    got = spark.read.parquet(out)
    want = load_table(spark, SF_SMOKE, "events")
    assert got.count() == want.count()
    assert got.select(F.sum("event_id")).head()[0] == want.select(F.sum("event_id")).head()[0]


def test_backpressure_bounds_offsets_per_trigger(spark, tmp_path):
    """WorkerOptions.pipe_buffer_size on an OFFSET-BASED source
    (VERDICT r4 #6): stream_rate maps the same knob onto per-trigger
    row-offset admission (the Kafka maxOffsetsPerTrigger shape), the
    way stream_table maps it onto maxFilesPerTrigger for file sources.
    With a buffer of 7, every micro-batch must admit exactly 7 offsets,
    and the drained prefix must be gapless (replayable offsets)."""
    import time

    from async_pipes_spark.pipeline.options import WorkerOptions
    from async_pipes_spark.streaming.run import stream_rate

    df = stream_rate(spark, options=WorkerOptions(pipe_buffer_size=7))
    assert df.isStreaming
    batch_sizes = []
    seen = []
    q = (
        df.writeStream.foreachBatch(
            # seen BEFORE batch_sizes: the wait loop below exits on
            # len(batch_sizes) and then stops the query — extending
            # seen second opened a window where batch 4's values were
            # still uncollected at the stop (flaked under suite load)
            lambda b, _i: (
                seen.extend(r.value for r in b.select("value").collect()),
                batch_sizes.append(b.count()),
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_rate"))
        .start()
    )
    try:
        # generous deadline: the suite may share the machine with other
        # Spark sessions, and a starved scheduler only needs TIME, not
        # a different bound — the per-batch size assertions below are
        # the actual contract
        deadline = time.time() + 180
        while time.time() < deadline and len(batch_sizes) < 4:
            time.sleep(0.25)
    finally:
        q.stop()
    assert len(batch_sizes) >= 4
    assert all(b == 7 for b in batch_sizes[:4]), batch_sizes[:4]
    # gapless offset prefix; foreachBatch may REPLAY a batch on retry
    # (side effects are at-least-once), so dedupe before comparing
    assert sorted(set(seen))[: 4 * 7] == list(range(4 * 7))


def test_backpressure_bounds_files_per_trigger(spark, tmp_path):
    """WorkerOptions.pipe_buffer_size → maxFilesPerTrigger (VERDICT r2
    #3): with a buffer of 1, an availableNow drain over a 4-file source
    must intake at most one file per micro-batch instead of gulping the
    directory — the file-source analogue of the reference's bounded
    pipe buffer (src/pipeline/mod.rs:25, blocking write io.rs:154-160)."""
    from async_pipes_spark.pipeline.options import WorkerOptions
    from async_pipes_spark.streaming.run import stream_table

    src = tmp_path / "src"
    for i in range(4):
        spark.range(i * 10, i * 10 + 10).coalesce(1).write.parquet(
            str(src), mode="append"
        )
    nfiles = len(list(src.glob("part-*.parquet")))
    assert nfiles >= 4

    def drain(options):
        batch_sizes = []
        df = stream_table(spark, str(src), "part-*", options=options)
        q = (
            df.writeStream.foreachBatch(
                lambda b, _i: batch_sizes.append(b.count())
            )
            .option("checkpointLocation", str(tmp_path / f"ckpt{id(options)}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return batch_sizes

    throttled = drain(WorkerOptions(pipe_buffer_size=1))
    assert sum(throttled) == 40
    assert len(throttled) >= nfiles, (
        f"expected >= {nfiles} single-file batches, got {throttled}"
    )
    assert max(throttled) <= 10  # no batch gulped more than one file

    unthrottled = drain(None)
    assert sum(unthrottled) == 40
    assert len([b for b in unthrottled if b]) == 1  # whole dir in one gulp


def test_watermarked_dedup_bounds_state(spark, tmp_path):
    """s15's scale claim, probed: with time-ordered files drained one
    per trigger, dropDuplicatesWithinWatermark evicts keys as the
    watermark passes — the dedup state operator's row count stays far
    below the total distinct-key count (s13's plain dropDuplicates
    keeps every key forever) while the emitted output still covers
    every (user, hour) exactly once."""
    import datetime as dt

    from async_pipes_spark.pipeline.options import WorkerOptions
    from async_pipes_spark.streaming.run import stream_table

    src = tmp_path / "src"
    base = dt.datetime(2024, 1, 1)
    total_keys = 0
    for day in range(4):  # one file per day, 50 users x 3 dup events
        rows = [
            (base + dt.timedelta(days=day, minutes=10 * d), u)
            for u in range(50)
            for d in range(3)
        ]
        total_keys += 50
        spark.createDataFrame(rows, "ts timestamp, user_id bigint").coalesce(
            1
        ).write.parquet(str(src), mode="append")

    from pyspark.sql import functions as F

    df = stream_table(spark, str(src), "part-*", options=WorkerOptions(pipe_buffer_size=1))
    dedup = (
        df.withColumn("hour", F.date_trunc("hour", "ts"))
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["user_id", "hour"])
    )
    out = []
    state_rows = []
    q = (
        dedup.writeStream.foreachBatch(lambda b, _i: out.append(b.count()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    for p in q.recentProgress:
        for op in p["stateOperators"]:
            state_rows.append(op["numRowsTotal"])
    assert sum(out) == total_keys  # every (user, hour) emitted once
    # eviction engaged: state never holds all keys ever seen
    assert state_rows, "no state operator metrics captured"
    assert max(state_rows) < total_keys, (
        f"state grew to {max(state_rows)} of {total_keys} keys — no eviction"
    )


def test_stream_stream_join_bounds_state(spark, tmp_path):
    """s14's scale claim, probed: with time-ordered files drained one
    per trigger, the watermarked stream-stream join's time-range
    predicate lets Spark EVICT buffered join state as the watermark
    passes — numRowsTotal plateaus near one day's rows instead of
    accumulating every row ever seen — while still emitting every
    in-window (click, purchase) pair exactly once."""
    import datetime as dt

    from pyspark.sql import functions as F

    from async_pipes_spark.pipeline.options import WorkerOptions
    from async_pipes_spark.streaming.run import stream_table

    src = tmp_path / "src"
    base = dt.datetime(2024, 1, 1)
    days, users = 4, 30
    for day in range(days):  # per user: one purchase, one click 30min later
        rows = []
        for u in range(users):
            t0 = base + dt.timedelta(days=day, minutes=u)
            rows.append((t0, u, "purchase", day * 10_000 + u))
            rows.append((t0 + dt.timedelta(minutes=30), u, "click", day * 10_000 + 1000 + u))
        spark.createDataFrame(
            rows, "ts timestamp, user_id bigint, event_type string, event_id bigint"
        ).coalesce(1).write.parquet(str(src), mode="append")

    ev = stream_table(spark, str(src), "part-*", options=WorkerOptions(pipe_buffer_size=1))
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("c_ts") >= F.col("p_ts"))
        & (F.col("c_ts") <= F.col("p_ts") + F.expr("INTERVAL 2 HOURS")),
        "inner",
    ).select("click_id", "purchase_id")

    out = []
    q = (
        joined.writeStream.foreachBatch(lambda b, _i: out.append(b.count()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state_rows = [
        op["numRowsTotal"] for p in q.recentProgress for op in p["stateOperators"]
    ]
    total_rows = days * users * 2
    assert sum(out) == days * users  # every same-day pair, exactly once
    assert state_rows, "no state operator metrics captured"
    # eviction engaged: join state never buffers all rows ever seen —
    # it plateaus at ~one day in flight (watermark lags one trigger)
    assert max(state_rows) <= total_rows // 2, (
        f"join state grew to {max(state_rows)} of {total_rows} rows — no eviction"
    )


def test_once_per_batch_dedups_replays(spark, tmp_path):
    """foreachBatch is at-least-once; once_per_batch must turn a
    replayed (batch_id already marked) invocation into a no-op while
    letting new batch ids through."""
    from async_pipes_spark.streaming.run import once_per_batch

    calls = []
    wrapped = once_per_batch(lambda b, bid: calls.append(bid), str(tmp_path / "m"))
    df = spark.createDataFrame([(1,)], "a bigint")
    wrapped(df, 0)
    wrapped(df, 0)  # crash-replay of an applied batch
    wrapped(df, 1)
    assert calls == [0, 1]


def test_once_per_batch_prunes_old_markers(spark, tmp_path):
    """Markers older than keep_last batches are pruned after each
    commit (batch ids are monotone; ids behind the checkpoint can
    never replay), so the marker dir stays bounded."""
    import os

    from async_pipes_spark.streaming.run import once_per_batch

    mdir = tmp_path / "markers"
    wrapped = once_per_batch(lambda b, bid: None, str(mdir), keep_last=3)
    df = spark.createDataFrame([(1,)], "a bigint")
    for bid in range(8):
        wrapped(df, bid)
    names = sorted(n for n in os.listdir(mdir) if not n.startswith("."))
    assert names == ["batch_4", "batch_5", "batch_6", "batch_7"], names


def test_run_available_now_drops_memory_sink_view(spark, tmp_path):
    """The memory sink's temp view must not leak (a long-lived session
    running many drains would retain every result's rows forever);
    the returned frame stays readable after the drop."""
    from async_pipes_spark.streaming.run import run_available_now, stream_table

    from tests.conftest import SF_SMOKE

    before = {t.name for t in spark.catalog.listTables()}
    out = run_available_now(
        stream_table(spark, SF_SMOKE, "region"), output_mode="append"
    )
    assert out.count() > 0  # pinned result survives the view drop
    after = {t.name for t in spark.catalog.listTables()}
    assert not {n for n in after - before if n.startswith("q_")}


def test_foreach_batch_routes_dedups_replayed_batch(spark, tmp_path):
    """The route sinks append per batch (non-idempotent): a replayed
    batch id must be a no-op, leaving no duplicate rows."""
    from async_pipes_spark.streaming.run import once_per_batch

    base = tmp_path / "routes"
    paths = {"evens": str(base / "evens")}

    def handle(batch, _bid):
        batch.filter("v % 2 = 0").write.mode("append").parquet(paths["evens"])

    wrapped = once_per_batch(handle, str(base / "_applied"))
    b = spark.createDataFrame([(2,), (3,), (4,)], "v bigint")
    wrapped(b, 0)
    wrapped(b, 0)  # crash-replay
    assert sorted(r.v for r in spark.read.parquet(paths["evens"]).collect()) == [2, 4]
