"""Structural properties of the statistical operators added in round 5:
invariants that must hold for ANY input (the oracle-parity suite checks
value equality; these check the math's shape)."""

from __future__ import annotations

from ssiintegrateddatapipeline_spark.operators.analytics import (
    cusum_changepoint,
    gini_concentration,
    survival_churn,
)
from ssiintegrateddatapipeline_spark.operators.dedup import lsh_tuning
from ssiintegrateddatapipeline_spark.operators.sampling import bootstrap_ci


def test_bootstrap_ci_brackets_point_estimate(spark, sf_dir):
    for r in bootstrap_ci(spark, sf_dir).collect():
        assert r.ci_lo <= r.ci_hi
        # the point mean must sit inside (or at worst on) a 90% interval
        # built from the same data — a violated bracket means the weight
        # stream or the order statistics are broken, not bad luck
        assert r.ci_lo <= r.mean_value <= r.ci_hi, r


def test_survival_curve_is_monotone_from_one(spark, sf_dir):
    rows = sorted(survival_churn(spark, sf_dir).collect(), key=lambda r: r.duration)
    assert rows[0].survival <= 1.0
    for a, b in zip(rows, rows[1:]):
        assert b.survival <= a.survival + 1e-9, (a, b)
        # at-risk counts shrink as durations grow
        assert b.n_at_risk <= a.n_at_risk, (a, b)


def test_gini_in_unit_interval(spark, sf_dir):
    for r in gini_concentration(spark, sf_dir).collect():
        assert 0.0 <= r.gini < 1.0, r
        assert r.n_customers > 0 and r.total_spend > 0


def test_cusum_peak_is_interior_or_edge_with_positive_stat(spark, sf_dir):
    for r in cusum_changepoint(spark, sf_dir).collect():
        assert r.max_abs_stat >= 0
        assert r.n_hours >= 1


def test_lsh_tuning_nesting(spark, sf_dir):
    """Finer rows-per-band strictly shrink the candidate net, and every
    config's captured-high count is bounded by the truth total; the
    any-match net (b8_r1) captures everything by construction."""
    t = {r.config: r for r in lsh_tuning(spark, sf_dir).collect()}
    assert t["b8_r1"].n_candidates >= t["b4_r2"].n_candidates >= t["b2_r4"].n_candidates
    for r in t.values():
        assert r.n_high_captured <= r.n_high_total
    assert t["b8_r1"].n_high_captured == t["b8_r1"].n_high_total


def test_trimmed_and_winsorized_are_inside_the_range(spark, sf_dir):
    """Both robust means are convex combinations of (possibly clamped)
    sample values, so they must sit inside [p05, p95]-ish bounds — and
    the trimmed mean drops tails symmetrically, so both must lie between
    the two. A violated bound means the quantile join or the winsorized
    total arithmetic is broken."""
    from ssiintegrateddatapipeline_spark.operators.analytics import trimmed_stats

    for r in trimmed_stats(spark, sf_dir).collect():
        assert r.n_events > 0
        assert r.trimmed_mean is not None and r.winsorized_mean is not None
        # winsorizing moves mass INWARD: the winsorized mean is within
        # the trimmed support, which is itself within the raw range
        assert abs(r.winsorized_mean - r.trimmed_mean) < max(
            1.0, abs(r.trimmed_mean)
        ), r


def test_markov_kstep_is_a_distribution(spark, sf_dir):
    """p_start sums to exactly 1 (every user has a first event); the
    k-step-ahead vector sums to <= 1 + eps (mass leaks only at types
    with no outgoing edges) and every entry stays in [0, 1]."""
    from ssiintegrateddatapipeline_spark.operators.analytics import markov_kstep

    rows = markov_kstep(spark, sf_dir).collect()
    assert abs(sum(r.p_start for r in rows) - 1.0) < 1e-6
    s_k = sum(r.p_after_k for r in rows)
    assert 0.0 < s_k <= 1.0 + 1e-6
    for r in rows:
        assert 0.0 <= r.p_start <= 1.0 and 0.0 <= r.p_after_k <= 1.0, r


def test_hh_turnover_counts_are_consistent(spark, sf_dir):
    """stayed + exited and stayed + entered are each a half's top-k set
    size (<= k); the Jaccard is the stayed share of the union."""
    from ssiintegrateddatapipeline_spark.operators.analytics import (
        HH_TURNOVER_K,
        heavy_hitter_turnover,
    )

    (r,) = heavy_hitter_turnover(spark, sf_dir).collect()
    assert 0 <= r.n_stayed + r.n_exited <= HH_TURNOVER_K
    assert 0 <= r.n_stayed + r.n_entered <= HH_TURNOVER_K
    union = r.n_stayed + r.n_entered + r.n_exited
    assert union > 0
    assert abs(r.jaccard - r.n_stayed / union) < 1e-6


def test_retrieval_mrr_bounds_and_map_le_one(spark, sf_dir):
    from ssiintegrateddatapipeline_spark.operators.similarity import (
        retrieval_mrr_map,
    )

    for r in retrieval_mrr_map(spark, sf_dir).collect():
        assert 0.0 <= r.reciprocal_rank <= 1.0, r
        assert 0.0 <= r.avg_precision <= 1.0, r
        # AP can only be positive if something relevant was retrieved
        if r.avg_precision > 0:
            assert r.reciprocal_rank > 0, r


def test_power_requirement_shrinks_as_mde_grows(spark, sf_dir):
    """A bigger detectable effect needs fewer users: n_required must be
    strictly decreasing across the MDE grid, and every row must carry
    the same realized arm sizes."""
    from ssiintegrateddatapipeline_spark.operators.experiment import (
        ab_power_analysis,
    )

    rows = sorted(
        ab_power_analysis(spark, sf_dir).collect(), key=lambda r: r.mde_pct
    )
    assert [r.mde_pct for r in rows] == [2, 5, 10]
    for a, b in zip(rows, rows[1:]):
        assert a.n_required_per_arm > b.n_required_per_arm, (a, b)
        assert (a.n_treatment, a.n_control) == (b.n_treatment, b.n_control)
    for r in rows:
        assert r.delta_value > 0
        assert r.powered_now == (
            min(r.n_treatment, r.n_control) >= r.n_required_per_arm
        )
