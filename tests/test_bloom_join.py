"""Behavior and plan-shape pins for the explicit Bloom-filter join
reduction (functions/bloom.py, plans/relational.bloom_filter_join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.functions.bloom import (
    BLOOM_BITS,
    bloom_might_contain,
    build_bloom_words,
)
from ssiintegrateddatapipeline_spark.plans.relational import bloom_filter_join
from ssiintegrateddatapipeline_spark.sources.batch import load_table


def _build_side(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").where(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 7500.0)
    )


def test_no_false_negatives(spark, sf_dir):
    """Every build-side key must pass its own filter — the Bloom guarantee."""
    cust = _build_side(spark, sf_dir)
    words = build_bloom_words(cust, "c_custkey")
    misses = cust.where(
        ~bloom_might_contain(words, F.col("c_custkey"))
    ).count()
    assert misses == 0


def test_false_positive_rate_bounded(spark, sf_dir):
    """Non-member keys pass at ~(1 - e^(-kn/m))^k — a generous 1% ceiling
    holds for any test scale factor's build-side cardinality."""
    cust = _build_side(spark, sf_dir)
    n = cust.count()
    words = build_bloom_words(cust, "c_custkey")
    non_members = (
        load_table(spark, sf_dir, "customer")
        .join(cust.select("c_custkey"), "c_custkey", "left_anti")
    )
    total = non_members.count()
    passed = non_members.where(
        bloom_might_contain(words, F.col("c_custkey"))
    ).count()
    assert n < BLOOM_BITS // 8  # sized for the build side
    assert passed <= max(2, 0.01 * total), (passed, total)


def test_null_probe_rejected(spark):
    df = spark.createDataFrame([(1,), (None,)], "k long")
    words = build_bloom_words(df.where(F.col("k").isNotNull()), "k")
    kept = df.where(bloom_might_contain(words, F.col("k"))).collect()
    assert [r["k"] for r in kept] == [1]


def test_exact_vs_unfiltered_plan(spark, sf_dir):
    """The Bloom pre-filter must be invisible in the output: same rows as
    the plain join."""
    cust = _build_side(spark, sf_dir)
    plain = (
        load_table(spark, sf_dir, "orders")
        .join(F.broadcast(cust.select("c_custkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("orders"),
             F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    got = sorted(map(tuple, bloom_filter_join(spark, sf_dir).collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want


def test_probe_filter_sits_below_join(spark, sf_dir):
    """Plan pin: the fact side carries the element_at bit-test Filter
    BEFORE the (broadcast) join — the reduction happens pre-shuffle."""
    plan = bloom_filter_join(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "element_at" in plan
    assert "BroadcastHashJoin" in plan
    # the bit-test filter must appear deeper in the tree than the join
    assert plan.index("BroadcastHashJoin") < plan.index("element_at")
