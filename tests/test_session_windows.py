"""Sessionization: the gaps-and-islands spelling (oracle-checkable) must
agree with Spark's native F.session_window on session starts and sizes."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.operators.analytics import session_windows
from ssiintegrateddatapipeline_spark.sources.batch import load_table


def test_native_session_window_agrees(spark, sf_dir):
    ours = {
        (r["user_id"], str(r["session_start"])): r["n_events"]
        for r in session_windows(spark, sf_dir).collect()
    }
    native = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id", F.col("sw.start").alias("session_start"), "n_events"
        )
    )
    theirs = {
        (r["user_id"], str(r["session_start"])): r["n_events"]
        for r in native.collect()
    }
    assert ours == theirs
