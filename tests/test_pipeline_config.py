"""Config-matrix pipeline: SSI on/off plan variants, label stamping, and
skew-safe salted aggregation equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.functions.skew import salted_agg
from ssiintegrateddatapipeline_spark.plans.pipeline import (
    OPTION_SETS,
    PipelineConfig,
    build_pipeline,
    run_summary,
)
from ssiintegrateddatapipeline_spark.sources.batch import load_table


def test_option_sets_match_reference_matrix():
    assert len(OPTION_SETS) == 6
    providers = {c.did_provider for c in OPTION_SETS}
    assert providers == {"did:web", "did:key", "did:ethr:sepolia"}
    assert any(not c.ssi_validation for c in OPTION_SETS)
    assert any(not c.cache_did for c in OPTION_SETS)
    assert {c.processing_mode for c in OPTION_SETS} == {"sync", "async"}


def test_provider_pipelines_verify_untampered_rows(spark, sf_dir):
    """The non-default providers (did:web and did:ethr:sepolia both sign
    ES256K — WebDIDProvider mints a Secp256k1 key in createIdentifier) run
    the same tamper/verify contract — every row verifies iff not
    tampered."""
    for provider in ("did:web", "did:ethr:sepolia"):
        out = build_pipeline(
            spark, sf_dir, PipelineConfig(provider, True, True, "sync")
        )
        rows = out.select("trade_event_id", "verified").collect()
        assert len(rows) > 0
        for r in rows:
            assert r.verified == (not r.trade_event_id.startswith("00"))


def test_ssi_off_skips_verification_stage(spark, sf_dir):
    off = build_pipeline(spark, sf_dir, PipelineConfig("did:key", False))
    # no Python stage in the plan at all when validation is off
    plan = off._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert off.where(F.col("verified").isNotNull()).count() == 0


def test_ssi_on_verifies_untampered_rows(spark, sf_dir):
    on = build_pipeline(spark, sf_dir, PipelineConfig("did:key", True))
    rows = on.select("trade_event_id", "verified").collect()
    for r in rows[:200]:
        expect = not r["trade_event_id"].startswith("00")
        assert r["verified"] == expect


def test_labels_stamped_on_every_row(spark, sf_dir):
    cfg = PipelineConfig("did:ethr", True, False, "sync")
    df = build_pipeline(spark, sf_dir, cfg).limit(10)
    for r in df.collect():
        assert r["did_provider"] == "did:ethr"
        assert r["cache_did"] is False
        assert r["processing_mode"] == "sync"


def test_run_summary_counts(spark, sf_dir):
    cfg = PipelineConfig("did:key", False)
    s = run_summary(build_pipeline(spark, sf_dir, cfg)).collect()[0]
    total = load_table(spark, sf_dir, "events").count()
    assert s["n_messages"] == total
    assert s["n_verified"] == 0
    assert s["msgs_per_sec"] > 0


def test_salted_agg_equals_direct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = salted_agg(
        ev,
        keys=["event_type"],
        salt_source=F.col("event_id"),
        aggs={"n": ("event_id", "count"), "mx": ("value", "max"), "mn": ("value", "min")},
        n_salts=8,
    )
    direct = ev.groupBy("event_type").agg(
        F.count("event_id").alias("n"),
        F.max("value").alias("mx"),
        F.min("value").alias("mn"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, direct.collect()))
