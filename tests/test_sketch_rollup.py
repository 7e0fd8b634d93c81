"""The 100 TB path of analytics_bitmap_rollup: swap the exact per-day
distinct-set partial for Spark's mergeable HLL sketch (hll_sketch_agg at
day grain, hll_union_agg for every coarser grain) and check the estimates
against the exact rollup within the sketch's published error bound.

The point under test is PLAN-SHAPE equivalence: both forms scan the fact
table once, build day-grain partials, and derive week/month/total by
merging partials only. The exact form is the oracle-checkable contract
query; this test proves the sketch swap is a drop-in (same grains, same
buckets, bounded error) — the form you'd actually run when a day's
distinct set no longer fits a collect_set array.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.operators.analytics import (
    _events,
    bitmap_distinct_rollup,
)

# lgConfigK=12 -> relative standard error ~1.04/sqrt(2^12) ~= 1.6%;
# allow 5 sigma plus integer slack for the tiny-cardinality buckets.
_LG_K = 12
_REL_TOL = 0.09


def _hll_rollup(spark, sf_dir):
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(_LG_K)).alias("sk")
    )
    day_rows = daily.select(
        F.lit("day").alias("grain"),
        F.col("day").alias("bucket_ts"),
        F.hll_sketch_estimate("sk").alias("est"),
    )
    week_rows = (
        daily.groupBy(F.date_trunc("week", "day").alias("bucket_ts"))
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            F.lit("week").alias("grain"),
            "bucket_ts",
            F.hll_sketch_estimate("sk").alias("est"),
        )
    )
    month = daily.groupBy(F.date_trunc("month", "day").alias("bucket_ts")).agg(
        F.hll_union_agg("sk").alias("sk")
    )
    month_rows = month.select(
        F.lit("month").alias("grain"),
        "bucket_ts",
        F.hll_sketch_estimate("sk").alias("est"),
    )
    all_rows = month.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("all").alias("grain"),
        F.lit(None).cast("timestamp").alias("bucket_ts"),
        F.hll_sketch_estimate("sk").alias("est"),
    )
    return (
        day_rows.unionByName(week_rows).unionByName(month_rows).unionByName(all_rows)
    )


def test_hll_rollup_matches_exact_within_error(spark, sf_dir):
    exact = {
        (r["grain"], r["bucket_ts"]): r["distinct_users"]
        for r in bitmap_distinct_rollup(spark, sf_dir).collect()
    }
    est = {
        (r["grain"], r["bucket_ts"]): r["est"]
        for r in _hll_rollup(spark, sf_dir).collect()
    }
    assert set(exact) == set(est)  # same grains, same buckets
    for key, ex in exact.items():
        assert abs(est[key] - ex) <= max(2, _REL_TOL * ex), (key, ex, est[key])
