"""Interval-analytics operators (operators/asof.py round-5 additions).

Three contracts:
- two_phase_prefix_sum is bit-identical to a global running sum for ANY
  monotone bucketing (the sweep-line building block);
- the BINNED interval self-join (range_session_overlap) reproduces the
  declarative non-equi overlap join exactly — binning is a physical
  strategy, never a semantic change;
- nearest_event respects the tolerance, the signed-gap convention, and
  the backward-wins tie rule.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.functions.twophase import (
    quantile_buckets,
    two_phase_prefix_sum,
)
from ssiintegrateddatapipeline_spark.operators.asof import (
    NEAREST_TOL_US,
    _overlap_pairs,
    _padded_sessions,
    nearest_event,
    session_overlap,
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),  # sort value
        st.integers(min_value=-5, max_value=5),  # summand
    ),
    min_size=1,
    max_size=120,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy, n_buckets=st.integers(1, 8))
def test_prefix_sum_matches_global_running_sum(spark, rows, n_buckets):
    df = spark.createDataFrame(
        [(i, v, d) for i, (v, d) in enumerate(rows)],
        "id int, value int, delta int",
    ).repartition(4)
    bucket = quantile_buckets(df, F.col("value"), n_buckets)
    out = two_phase_prefix_sum(
        df, bucket, [F.col("value"), F.col("id")], F.col("delta"), out="run"
    )
    got = {r.id: r.run for r in out.collect()}
    run, expected = 0, {}
    for i, (_, d) in sorted(enumerate(rows), key=lambda t: (t[1][0], t[0])):
        run += d
        expected[i] = run
    assert got == expected


def test_binned_overlap_join_matches_naive(spark, sf_dir):
    sess = _padded_sessions(spark, sf_dir)
    a, b = sess.alias("a"), sess.alias("b")
    naive = (
        a.join(
            b,
            (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.su") < F.col("b.eu"))
            & (F.col("b.su") < F.col("a.eu")),
        )
        .select(
            F.col("a.user_id").alias("u1"),
            F.col("b.user_id").alias("u2"),
            (
                F.least(F.col("a.eu"), F.col("b.eu"))
                - F.greatest(F.col("a.su"), F.col("b.su"))
            ).alias("ov_us"),
        )
        .groupBy("u1")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("ov_us").alias("s"))
    )
    expected = {(r.u1, r.n, r.s) for r in naive.collect()}
    # the PRODUCTION binned join (shared helper), same one-sided aggregate
    got_pairs = (
        _overlap_pairs(sess)
        .groupBy("u1")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("ov_us").alias("s"))
    )
    got = {(r.u1, r.n, r.s) for r in got_pairs.collect()}
    assert got == expected


interval_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # user
        st.integers(min_value=0, max_value=500),  # start (scaled to us)
        st.integers(min_value=1, max_value=400),  # length
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(intervals=interval_strategy)
def test_binned_overlap_property_random_intervals(spark, intervals):
    # random intervals spanning 0..~9 bins (bin = OVERLAP_BIN_US), incl.
    # many-bin spans, bin-boundary endpoints, and duplicate intervals —
    # the binned join must equal the naive non-equi join on the PAIR level
    from ssiintegrateddatapipeline_spark.operators.asof import OVERLAP_BIN_US

    scale = OVERLAP_BIN_US // 100  # endpoints land on 1/100-bin grid
    rows = [
        (i, u, s * scale, (s + ln) * scale)
        for i, (u, s, ln) in enumerate(intervals)
    ]
    sess = spark.createDataFrame(
        rows, "session_seq long, user_id long, su long, eu long"
    )
    got = sorted(
        (r.u1, r.u2, r.ov_us) for r in _overlap_pairs(sess).collect()
    )
    expected = []
    for _, u1, s1, e1 in rows:
        for _, u2, s2, e2 in rows:
            if u1 < u2 and s1 < e2 and s2 < e1:
                expected.append((u1, u2, min(e1, e2) - max(s1, s2)))
    assert got == sorted(expected)


def test_session_overlap_symmetry(spark, sf_dir):
    # every overlap (and each of its seconds) is attributed to exactly two
    # users: per-user totals sum to 2x the pair-level totals
    out = session_overlap(spark, sf_dir)
    row = out.agg(
        F.sum("n_overlaps").alias("n"), F.sum("overlap_secs").alias("s")
    ).collect()[0]
    pair = (
        _overlap_pairs(_padded_sessions(spark, sf_dir))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("ov_us").alias("us"))
        .collect()[0]
    )
    assert row.n == 2 * pair.n
    # per-user rounding to 3 decimals before the sum: tolerance = 0.5 ms
    # per user row
    assert abs(row.s - 2 * pair.us / 1e6) <= 5e-4 * out.count()


def test_nearest_event_contract(spark, sf_dir):
    out = nearest_event(spark, sf_dir).collect()
    tol_secs = NEAREST_TOL_US / 1e6
    assert any(r.nearest_click_id is not None for r in out)
    assert any(r.nearest_click_id is None for r in out)
    for r in out:
        if r.nearest_click_id is None:
            assert r.direction is None and r.gap_secs is None
        else:
            assert abs(r.gap_secs) <= tol_secs
            # a forward gap under 0.5 ms rounds to 0.0 — sign-check only
            # nonzero gaps to keep the assertion data-independent
            if r.gap_secs != 0:
                assert (r.direction == "back") == (r.gap_secs < 0)


def test_nearest_event_backward_wins_ties(spark, sf_dir):
    # structural: equidistant back/fwd candidates resolve backward. Built
    # synthetically because real microsecond ties are improbable.
    df = spark.createDataFrame(
        [
            (1, 7, "click", 1000),
            (2, 7, "error", 2000),
            (3, 7, "click", 3000),
        ],
        "event_id long, user_id long, event_type string, us long",
    ).select("event_id", "user_id", "event_type", F.timestamp_micros("us").alias("ts"))
    import ssiintegrateddatapipeline_spark.operators.asof as asof_mod

    orig = asof_mod.load_table
    try:
        asof_mod.load_table = lambda spark, sf, name: df
        out = {r.error_id: r for r in nearest_event(spark, "synthetic://").collect()}
    finally:
        asof_mod.load_table = orig
    r = out[2]
    assert r.nearest_click_id == 1 and r.direction == "back" and r.gap_secs == -0.001
