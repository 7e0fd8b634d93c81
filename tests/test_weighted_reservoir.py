"""Efraimidis–Spirakis weighted sample: the hierarchical two-level plan
must equal the single-window result exactly, strata must get exactly k
rows, and the sample must actually skew toward heavy weights (the point
of the exponential-key scheme)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.operators.sampling import (
    ES_K,
    _ES_TWO48,
    _hash_hex,
    weighted_reservoir,
)
from ssiintegrateddatapipeline_spark.sources.batch import load_table


def _single_window(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    u = (
        F.conv(F.substring(_hash_hex(F.col("o_orderkey"), "es"), 1, 12), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(_ES_TWO48)
    w = Window.partitionBy("priority").orderBy("es_key", "orderkey")
    return (
        orders.select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("weight"),
            F.round(-F.log(u) / F.col("o_totalprice"), 12).alias("es_key"),
        )
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= ES_K)
        .select("priority", "sample_rank", "orderkey", "weight", "es_key")
    )


def test_two_level_equals_single_window(spark, sf_dir):
    got = sorted(map(tuple, weighted_reservoir(spark, sf_dir).collect()))
    want = sorted(map(tuple, _single_window(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_exact_k_per_stratum(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    n_strata = orders.select("o_orderpriority").distinct().count()
    counts = weighted_reservoir(spark, sf_dir).groupBy("priority").count().collect()
    assert len(counts) == n_strata
    assert all(r["count"] == ES_K for r in counts)


def test_sample_skews_toward_heavy_weights(spark, sf_dir):
    sample_mean = (
        weighted_reservoir(spark, sf_dir).agg(F.avg("weight")).first()[0]
    )
    pop_mean = (
        load_table(spark, sf_dir, "orders").agg(F.avg("o_totalprice")).first()[0]
    )
    assert sample_mean > pop_mean
