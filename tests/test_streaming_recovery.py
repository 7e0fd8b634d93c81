"""Checkpoint restart recovery: SURVEY §2.7 claims
exactly-once-to-idempotent-sinks via checkpointing. These tests actually
exercise it — a streaming run is stopped after batch k and RESUMED from
the same checkpoint, and the recovered run's final output must be
hash-identical to an uninterrupted run of the same feed.

Two recovery surfaces:
- state-store recovery (`streaming_user_stats`'s applyInPandasWithState
  counters must CONTINUE from checkpointed state, not restart at zero);
- storage-backed-index recovery (`streaming_online_dedup`'s parquet
  index + offsets must resume mid-replay without double-admitting).
"""

from __future__ import annotations

import glob
import os

import pytest
import shutil
import uuid

from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.sources.batch import load_table
from ssiintegrateddatapipeline_spark.streaming import pipeline as SP


def _stage_files(spark, sf_dir, root, n=4):
    """Split events into n single-file micro-batches with increasing
    mtimes (same staging device as the online-dedup feed)."""
    os.makedirs(root)
    ev = load_table(spark, sf_dir, "events")
    base_t = 1_600_000_000
    for k in range(n):
        part_dir = os.path.join(os.path.dirname(root), f"w{k}")
        (
            ev.where(F.pmod(F.col("event_id"), F.lit(n)) == k)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(part_dir)
        )
        (part_file,) = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        dst = os.path.join(root, f"b{k}.parquet")
        shutil.move(part_file, dst)
        os.utime(dst, (base_t + k, base_t + k))


def _run_user_stats(spark, arrivals_dir, schema, ckpt, spool):
    """One availableNow pass of user_stats_plan over whatever files are
    visible in arrivals_dir, resuming from ckpt (the memory sink cannot
    recover from a checkpoint, so the sink is an idempotent per-batch-id
    parquet spool). Returns (all spooled rows so far, last batch_id)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals_dir)
    )

    def emit(bdf, bid):
        bdf.coalesce(1).write.mode("overwrite").parquet(f"{spool}/b{bid}")

    q = (
        SP.user_stats_plan(stream)
        .writeStream.outputMode("update")
        .foreachBatch(emit)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batch_id = (q.lastProgress or {}).get("batchId")
    rows = spark.read.parquet(f"{spool}/b*").collect()
    return rows, batch_id


def _final_per_user(rows):
    """Update mode emits one row per (user, batch-it-appeared-in); the
    final value per user is the row with the highest running count."""
    best = {}
    for r in rows:
        cur = best.get(r["user_id"])
        if cur is None or r["events"] > cur["events"]:
            best[r["user_id"]] = r
    return {
        u: (r["events"], round(r["total_value"], 4), r["max_ts"])
        for u, r in best.items()
    }


def test_user_stats_state_recovers_across_restart(spark, sf_dir, tmp_path):
    full_dir = str(tmp_path / "full" / "arrivals")
    _stage_files(spark, sf_dir, full_dir, n=4)
    schema = spark.read.parquet(full_dir).schema

    # uninterrupted reference run: all 4 micro-batches, one query
    rows_full, last_full = _run_user_stats(
        spark, full_dir, schema, str(tmp_path / "ckpt_full"),
        str(tmp_path / "spool_full"),
    )
    assert last_full == 3  # 4 files -> batch ids 0..3
    expect = _final_per_user(rows_full)

    # interrupted run: only 2 files visible, stop, then reveal the rest
    # and RESTART from the same checkpoint
    part_dir = str(tmp_path / "part" / "arrivals")
    os.makedirs(os.path.dirname(part_dir))
    os.makedirs(part_dir)
    for k in (0, 1):
        shutil.copy2(f"{full_dir}/b{k}.parquet", f"{part_dir}/b{k}.parquet")
    ckpt = str(tmp_path / "ckpt_recov")
    spool = str(tmp_path / "spool_recov")
    rows_a, last_a = _run_user_stats(spark, part_dir, schema, ckpt, spool)
    assert last_a == 1  # stopped after batch 1
    for k in (2, 3):
        shutil.copy2(f"{full_dir}/b{k}.parquet", f"{part_dir}/b{k}.parquet")
    rows_b, last_b = _run_user_stats(spark, part_dir, schema, ckpt, spool)
    # offsets recovered: the restart continues at batch 2, never replays
    assert last_b == 3
    assert len(rows_b) > len(rows_a)
    # state recovered: counters continued, so the latest row per user
    # across the accumulated spool equals the uninterrupted run exactly
    assert _final_per_user(rows_b) == expect


def test_transition_state_carries_across_batches(spark, sf_dir, tmp_path):
    """The online transition matrix must count a transition whose two
    events land in DIFFERENT micro-batches exactly once — that's what
    the per-user last-event state is for. Replay events as 4 batches
    split by event_id (so almost every user's sequence straddles
    boundaries) and compare to the batch lag-window matrix."""
    # stage by TIME quartile (not by id hash): the carry contract is for
    # in-order replay — a feed delivers events in event-time order
    stage_dir = str(tmp_path / "arrivals")
    os.makedirs(stage_dir)
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").withColumn(
        "_q", F.ntile(4).over(Window.orderBy("ts", "event_id"))
    )
    base_t = 1_600_000_000
    for k in range(4):
        part_dir = str(tmp_path / f"tw{k}")
        (
            ev.where(F.col("_q") == k + 1)
            .drop("_q")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(part_dir)
        )
        (part_file,) = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        dst = os.path.join(stage_dir, f"b{k}.parquet")
        shutil.move(part_file, dst)
        os.utime(dst, (base_t + k, base_t + k))
    schema = spark.read.parquet(stage_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    name = f"trans_{uuid.uuid4().hex[:8]}"
    q = (
        SP.transitions_plan(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert (q.lastProgress or {}).get("batchId") == 3  # genuinely 4 batches
    got = {
        (r["from_type"], r["to_type"]): r["transitions"]
        for r in spark.table(name)
        .groupBy("from_type", "to_type")
        .agg(F.sum("transitions").alias("transitions"))
        .collect()
    }
    spark.catalog.dropTempView(name)
    from ssiintegrateddatapipeline_spark.operators.analytics import (
        event_transitions,
    )

    want = {
        (r["from_type"], r["to_type"]): r["transitions"]
        for r in event_transitions(spark, sf_dir).collect()
    }
    assert got == want


def test_online_dedup_index_recovers_across_restart(spark, sf_dir, tmp_path):
    arrivals_full = SP._online_stage(spark, sf_dir, SP.ONLINE_DEDUP_BATCHES)

    def decisions(df):
        return sorted(
            (r["doc_id"], r["batch_id"], r["best_match"], r["admitted"])
            for r in df.collect()
        )

    # uninterrupted reference run
    full = decisions(
        SP._online_dedup_drive(
            spark, sf_dir, arrivals_full, str(tmp_path / "run_full")
        )
    )
    assert full  # non-empty feed

    # interrupted run: reveal half the feed, drive, then reveal the rest
    # and RESUME the same run root (checkpoint + index + spool)
    part_dir = str(tmp_path / "arrivals_part")
    os.makedirs(part_dir)
    files = sorted(glob.glob(os.path.join(arrivals_full, "b*.parquet")))
    half = len(files) // 2
    for f in files[:half]:
        shutil.copy2(f, os.path.join(part_dir, os.path.basename(f)))
    run_root = str(tmp_path / "run_recov")
    os.makedirs(run_root)
    first = SP._online_dedup_drive(spark, sf_dir, part_dir, run_root)
    assert first.count() < len(full)  # genuinely stopped mid-replay
    for f in files[half:]:
        shutil.copy2(f, os.path.join(part_dir, os.path.basename(f)))
    resumed = SP._online_dedup_drive(spark, sf_dir, part_dir, run_root)
    # the resumed run must equal the uninterrupted one: same admissions,
    # same best-match counts, no double-processed batch rows
    assert decisions(resumed) == full


def test_store_merge_sink_recovers_without_double_apply(spark, sf_dir, tmp_path):
    """The durable MERGE sink's exactly-once claim, exercised: the drive
    is killed after batch 1 (the foreachBatch raises), restarted from the
    SAME checkpoint, and the replayed batches must be absorbed by the
    version guard (version == batch_id + 1 already committed → skip) —
    n_events accumulates each event exactly once, and the final snapshot
    equals the one-shot batch fold."""
    from ssiintegrateddatapipeline_spark.sources.versioned import VersionedTable

    # stage SEQ-ORDERED quartiles (the production feed shape): the MERGE's
    # when_matched takes last_* from the source, which is only correct
    # when batches arrive in event_id order — _stage_files's modulo split
    # would violate that contract by design
    arrivals = str(tmp_path / "feed" / "arrivals")
    os.makedirs(arrivals)
    ev = load_table(spark, sf_dir, "events")
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    cuts = [max_id * k // 4 for k in range(4)] + [max_id + 1]
    base_t = 1_600_000_000
    for k in range(4):
        part_dir = str(tmp_path / "feed" / f"w{k}")
        (
            ev.where(
                (F.col("event_id") >= cuts[k]) & (F.col("event_id") < cuts[k + 1])
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(part_dir)
        )
        (part_file,) = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        dst = os.path.join(arrivals, f"b{k}.parquet")
        shutil.move(part_file, dst)
        os.utime(dst, (base_t + k, base_t + k))
    schema = load_table(spark, sf_dir, "events").schema
    table_path = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    boom = {"armed": True}

    def merge_then_die(bdf, bid):
        SP.store_merge_batch(spark, table_path, bdf, bid)
        if boom["armed"] and bid == 1:
            raise RuntimeError("killed after batch 1 committed")

    def drive():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(arrivals)
            .writeStream.foreachBatch(merge_then_die)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(Exception, match="killed after batch 1"):
        drive()
    t = VersionedTable(spark, table_path)
    assert t.latest_version() == 2  # batches 0,1 committed before the kill

    boom["armed"] = False
    drive()  # resume from the SAME checkpoint: batch 1 may replay → skip
    assert t.latest_version() == 4
    ops = [c["op"] for c in t.history()]
    assert ops == ["create", "merge", "merge", "merge"]

    got = {
        r["user_id"]: (r["n_events"], r["last_event_id"])
        for r in t.snapshot().collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["last_event_id"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("event_id").alias("last_event_id"),
        )
        .collect()
    }
    assert got == want  # every event folded exactly once across the kill
