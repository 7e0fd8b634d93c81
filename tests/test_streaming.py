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
    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
