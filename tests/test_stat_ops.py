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
