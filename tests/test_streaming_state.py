"""Arbitrary-state streaming operator: transformWithStateInPandas probe +
applyInPandasWithState fallback (streaming/pipeline.user_profile_plan)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.streaming import pipeline as SP


def test_tws_probe_is_boolean():
    assert SP.tws_available() in (True, False)


def test_fallback_profile_matches_batch_aggregate(spark, sf_dir):
    """The applyInPandasWithState path must equal the plain batch
    aggregate over the same replayed file."""
    got = {
        r.user_id: (r.events, r.n_types)
        for r in SP.streaming_user_profile(spark, sf_dir).collect()
    }
    from ssiintegrateddatapipeline_spark.sources.batch import load_table

    want = {
        r.user_id: (r.events, r.n_types)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("events"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


@pytest.mark.skipif(
    not SP.tws_available(), reason="google.protobuf absent: tws path offline"
)
def test_tws_path_matches_fallback(spark, sf_dir):
    """Where protobuf is present, the transformWithStateInPandas path must
    produce exactly the fallback's rows (RocksDB store required by the
    API)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    tws = SP.run_available_now(
        SP.user_profile_plan(SP.events_stream(spark, sf_dir), use_tws=True),
        output_mode="update",
        dedup_keys=["user_id"],
    )
    fb = SP.run_available_now(
        SP.user_profile_plan(SP.events_stream(spark, sf_dir), use_tws=False),
        output_mode="update",
        dedup_keys=["user_id"],
    )
    canon = lambda df: sorted(  # noqa: E731
        (r.user_id, r.events, round(r.total_value, 4), r.n_types, r.min_ts, r.max_ts)
        for r in df.collect()
    )
    assert canon(tws) == canon(fb)
