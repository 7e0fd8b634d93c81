"""Mergeable-quantile rollup: coarser grains derived by merging day-grain
histogram partials must equal the same binned quantile computed directly
from the fact table — merging partials is lossless for binned quantiles
(the property that makes the t-digest/KLL pattern trustworthy)."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from ssiintegrateddatapipeline_spark.operators import analytics


def test_merged_grains_equal_direct_computation(spark, sf_dir):
    rows = analytics.quantile_rollup(spark, sf_dir).collect()
    got = {(r["grain"], r["bucket_ts"]): r for r in rows}

    # direct, non-merged reference per grain straight off the raw events
    raw = duckdb.sql(
        f"SELECT ts, CAST(floor(value / {analytics.QUANTILE_BIN_W}) AS BIGINT)"
        f" FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    import datetime as dt

    def trunc(ts, grain):
        d = ts.replace(hour=0, minute=0, second=0, microsecond=0)
        if grain == "day":
            return d
        if grain == "week":
            return d - dt.timedelta(days=d.weekday())
        if grain == "month":
            return d.replace(day=1)
        return None

    for grain in ["day", "week", "month", "all"]:
        buckets = defaultdict(list)
        for ts, b in raw:
            buckets[trunc(ts, grain)].append(b)
        for bucket_ts, bins in buckets.items():
            bins.sort()
            n = len(bins)
            # smallest bin whose cumulative reaches q: with the sorted
            # per-event bin list that's simply the ceil(q*n)-th element
            p50 = bins[(n + 1) // 2 - 1]
            p95 = bins[(19 * n + 19) // 20 - 1]
            r = got[(grain, bucket_ts)]
            assert r["n_events"] == n
            assert r["p50_bin"] == p50, (grain, bucket_ts)
            assert r["p95_bin"] == p95, (grain, bucket_ts)
    assert len(got) == sum(
        1
        for grain in ["day", "week", "month", "all"]
        for _ in {trunc(ts, grain) for ts, _ in raw}
    )


def test_single_fact_scan_no_window(spark, sf_dir):
    """The rollup must scan events once (partials reused by all grains)
    and contain no Window at all — merging is pure aggregation."""
    df = analytics.quantile_rollup(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # all four grain branches read the CACHED day-grain partial (the only
    # path that touches events.parquet); persist semantics make that one
    # physical fact scan however many branches consume it
    assert plan.count("InMemoryTableScan") == 4
