"""Skyline invariants: the sort-based two-phase frontier must equal the
quadratic dominance definition (brute-force NOT EXISTS at test scale),
every frontier point must be undominated, every excluded point dominated,
and the plan must stay free of single-partition exchanges."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.operators import frontier


def _pairs(sf_dir):
    return duckdb.sql(
        f"""
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
               o_orderdate AS order_date, count(*) AS n
        FROM read_parquet('{sf_dir}/orders.parquet') GROUP BY 1, 2
        """
    ).fetchall()


def test_matches_bruteforce_dominance(spark, sf_dir):
    """The O(n log n) sweep equals the O(n^2) NOT EXISTS definition."""
    pts = [(p, d) for p, d, _ in _pairs(sf_dir)]
    brute = {
        (p, d)
        for p, d in pts
        if not any(
            q >= p and e >= d and (q, e) != (p, d) for q, e in pts
        )
    }
    got = {
        (r["price_cents"], r["order_date"])
        for r in frontier.pareto_skyline(spark, sf_dir).collect()
    }
    assert got == brute


def test_counts_carry_duplicates(spark, sf_dir):
    counts = {(p, d): n for p, d, n in _pairs(sf_dir)}
    for r in frontier.pareto_skyline(spark, sf_dir).collect():
        assert r["n_orders"] == counts[(r["price_cents"], r["order_date"])]


def test_no_single_partition_exchange(spark, sf_dir):
    df = frontier.pareto_skyline(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_skyline_2d_empty_and_singleton(spark):
    base = spark.createDataFrame([(5, 7)], "a long, b long")
    out = frontier.skyline_2d(
        base, F.col("a"), F.col("b"), ["a", "b"]
    ).collect()
    assert [(r["a"], r["b"]) for r in out] == [(5, 7)]
    empty = base.where(F.lit(False))
    assert (
        frontier.skyline_2d(empty, F.col("a"), F.col("b"), ["a", "b"]).count()
        == 0
    )


def test_skyline_2d_chain_and_antichain(spark):
    # strictly dominated chain -> single survivor
    chain = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "a long, b long"
    )
    got = frontier.skyline_2d(chain, F.col("a"), F.col("b"), ["a", "b"]).collect()
    assert [(r["a"], r["b"]) for r in got] == [(3, 3)]
    # perfect antichain -> everything survives
    anti = spark.createDataFrame(
        [(1, 3), (2, 2), (3, 1)], "a long, b long"
    )
    got = frontier.skyline_2d(anti, F.col("a"), F.col("b"), ["a", "b"]).collect()
    assert {(r["a"], r["b"]) for r in got} == {(1, 3), (2, 2), (3, 1)}
