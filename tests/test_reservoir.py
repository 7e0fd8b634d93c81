"""The hierarchical top-k reservoir sample (operators/sampling.py) must be
EXACTLY the single-window result — the two-level plan is a pure execution
strategy, not an approximation — and each stratum must receive exactly k
rows."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.operators.sampling import (
    RESERVOIR_K,
    _hash_hex,
    reservoir_per_source,
)
from ssiintegrateddatapipeline_spark.sources.batch import load_table


def test_two_level_equals_single_window(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    single = (
        d.select(
            "source", "doc_id", "n_chars",
            _hash_hex(F.col("doc_id"), "res").alias("h"),
        )
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= RESERVOIR_K)
        .select("source", "sample_rank", "doc_id", "n_chars")
    )
    got = sorted(map(tuple, reservoir_per_source(spark, sf_dir).collect()))
    want = sorted(map(tuple, single.collect()))
    assert got == want


def test_exact_k_per_stratum(spark, sf_dir):
    counts = (
        reservoir_per_source(spark, sf_dir)
        .groupBy("source")
        .count()
        .collect()
    )
    n_sources = load_table(spark, sf_dir, "documents").select("source").distinct().count()
    assert len(counts) == n_sources
    assert all(r["count"] == RESERVOIR_K for r in counts)


def test_deterministic_across_runs(spark, sf_dir):
    a = sorted(map(tuple, reservoir_per_source(spark, sf_dir).collect()))
    b = sorted(map(tuple, reservoir_per_source(spark, sf_dir).collect()))
    assert a == b
