"""Watermark semantics: late data beyond the watermark is dropped from
append-mode windowed aggregates — the declared semantic upgrade over the
reference's processing-time-only pipeline (SURVEY §2.7: latency can go
negative there and late data is never handled)."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F


def _write_single_parquet(df, target_dir: str, name: str, mtime: float) -> None:
    """Write a one-file parquet into target_dir/name with a set mtime so the
    file stream source picks files in a deterministic order."""
    tmp = f"{target_dir}/_stage_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.makedirs(target_dir, exist_ok=True)
    shutil.move(f"{tmp}/{part}", f"{target_dir}/{name}")
    shutil.rmtree(tmp)
    os.utime(f"{target_dir}/{name}", (mtime, mtime))


def test_late_rows_beyond_watermark_are_dropped(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def ev(*rows):
        return spark.createDataFrame(
            [(t, k) for t, k in rows], "ts string, k string"
        ).select(F.to_timestamp("ts").alias("ts"), "k")

    now = time.time()
    # batch 1: window [00:00, 00:10) gets one row; max event time 00:35
    # -> watermark after the batch = 00:25
    _write_single_parquet(
        ev(("2024-01-01 00:00:05", "a"), ("2024-01-01 00:00:35", "b")),
        src, "b1.parquet", now - 180,
    )
    # batch 2: advances the watermark to 01:00 and finalizes [00:00, 00:10)
    # (micro-batch semantics: eviction happens in the batch AFTER the
    # watermark passed the window end, so the late row must come later still)
    _write_single_parquet(
        ev(("2024-01-01 00:01:10", "c"),), src, "b2.parquet", now - 120,
    )
    # batch 3: a LATE row for the closed [00:00, 00:10) window — must be
    # dropped, not merged and not re-emitted
    _write_single_parquet(
        ev(("2024-01-01 00:00:07", "late"), ("2024-01-01 00:01:20", "d")),
        src, "b3.parquet", now - 60,
    )

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "10 seconds").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    first_window = [
        r["n"]
        for r in spark.table("wm_test").collect()
        if str(r["ws"]).startswith("2024-01-01 00:00:00")
    ]
    # the [00:00, 00:10) window finalized exactly once, with ONE row: the
    # late arrival was dropped, not merged and not re-emitted
    assert first_window == [1], spark.table("wm_test").collect()


def test_on_time_rows_within_watermark_do_merge(spark, tmp_path):
    """Control case: a second batch's row for a window still inside the
    watermark IS merged before the window finalizes."""
    src = str(tmp_path / "stream_src2")
    ckpt = str(tmp_path / "ckpt2")
    os.makedirs(src)

    def ev(*rows):
        return spark.createDataFrame(
            [(t,) for t in rows], "ts string"
        ).select(F.to_timestamp("ts").alias("ts"))

    now = time.time()
    # batch 1: two rows in [00:00, 00:10); watermark after = 00:08 - 30s < 0
    _write_single_parquet(
        ev("2024-01-01 00:00:02", "2024-01-01 00:00:08"), src, "b1.parquet", now - 120
    )
    # batch 2: third row for the same window (still open), then an advancing
    # row that pushes the watermark past the window end
    _write_single_parquet(
        ev("2024-01-01 00:00:09", "2024-01-01 00:05:00"), src, "b2.parquet", now - 60
    )

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "30 seconds")
        .groupBy(F.window("ts", "10 seconds").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_merge_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {str(r["ws"]): r["n"] for r in spark.table("wm_merge_test").collect()}
    assert rows.get("2024-01-01 00:00:00") == 3, rows
