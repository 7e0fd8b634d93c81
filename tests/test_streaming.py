"""Structured Streaming semantics: bounded replay through the streaming
engine must agree with the batch plans, and the stateful operator must
accumulate across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.streaming import (
    events_stream,
    last_seen_plan,
    run_available_now,
    throughput_plan,
    user_stats_plan,
)


def test_streaming_throughput_equals_batch(spark, sf_dir):
    got = run_available_now(throughput_plan(events_stream(spark, sf_dir)))
    from ssiintegrateddatapipeline_spark.operators.analytics import windowed_throughput

    want = windowed_throughput(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_multi_batch_stateful_accumulation(spark, sf_dir):
    """With maxFilesPerTrigger=1 the replay is still one file, so force
    multiple micro-batches by splitting: the stateful per-user stats must
    equal the batch group-by regardless of batch boundaries."""
    stream = events_stream(spark, sf_dir, max_files_per_trigger=1)
    got = (
        run_available_now(
            user_stats_plan(stream), output_mode="update", dedup_keys=["user_id"]
        )
        .select("user_id", "events", F.round("total_value", 4).alias("tv"), "max_ts")
    )
    from ssiintegrateddatapipeline_spark.sources.batch import load_table

    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("events"),
            F.round(F.sum("value"), 4).alias("tv"),
            F.max("ts").alias("max_ts"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_watermark_present_in_plan(spark, sf_dir):
    plan = throughput_plan(events_stream(spark, sf_dir), watermark="42 seconds")
    assert "42 seconds" in plan._jdf.queryExecution().analyzed().toString()


def test_last_seen_gauge(spark, sf_dir):
    got = run_available_now(last_seen_plan(events_stream(spark, sf_dir)))
    assert got.count() == 5  # five event types in the synthetic data
    assert set(got.columns) == {"event_type", "last_ts", "seen"}


def test_checkpoint_recovery_exactly_once(spark, sf_dir, tmp_path):
    """Kill-and-resume: a second run against the SAME checkpoint must pick
    up only files that arrived after the first run — nothing re-read,
    nothing lost (exactly-once to the idempotent file sink)."""
    import shutil

    src_dir = tmp_path / "in"
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src_dir.mkdir()

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = batch.count()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "part1.parquet")

    def run_once():
        stream = spark.readStream.schema(batch.schema).parquet(str(src_dir))
        q = (
            stream.select("event_id", "user_id")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(out_dir).count() == total

    # second file arrives; resume from the same checkpoint
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "part2.parquet")
    run_once()
    out = spark.read.parquet(out_dir)
    assert out.count() == 2 * total  # part1 not re-read, part2 not missed
    # every event id appears exactly twice (once per input file)
    dup = out.groupBy("event_id").count().where(F.col("count") != 2).count()
    assert dup == 0


def test_broadcast_sink_spools_bounded_frames(spark, sf_dir, tmp_path):
    """K1 stand-in: every micro-batch becomes one atomically-published
    JSONL frame; the spool is bounded like a broadcast (old frames drop)."""
    import json

    from ssiintegrateddatapipeline_spark.sources.sinks import (
        foreach_batch_broadcast_sink,
    )
    from ssiintegrateddatapipeline_spark.streaming.pipeline import (
        events_stream,
        throughput_plan,
    )

    spool = tmp_path / "ws_spool"
    sink = foreach_batch_broadcast_sink(str(spool), max_batches=2)
    plan = throughput_plan(events_stream(spark, sf_dir))
    q = (
        plan.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    frames = sorted(spool.glob("frame_*.jsonl"))
    assert 1 <= len(frames) <= 2  # bounded spool
    rows = [json.loads(l) for l in open(frames[-1])]
    assert rows and {"window_start", "event_type", "events", "rate_per_sec"} <= set(rows[0])
    assert not list(spool.glob("*.tmp"))  # atomic publish, no partials
