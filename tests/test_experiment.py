"""CUPED readout invariants: θ must equal the OLS slope of y on x over
users (checked against numpy on driver-side data at test scale), the
adjustment must preserve the overall mean while never increasing the
user-level variance, and arm assignment must be deterministic."""

from __future__ import annotations

import numpy as np
import pytest

from ssiintegrateddatapipeline_spark.operators import experiment


def _user_xy(spark, sf_dir):
    rows = experiment._user_frame(spark, sf_dir).collect()
    x = np.array([r["x_micro"] for r in rows], dtype=float)
    y = np.array([r["y_micro"] for r in rows], dtype=float)
    arm = [r["arm"] for r in rows]
    return x, y, arm


def test_theta_is_ols_slope(spark, sf_dir):
    x, y, _ = _user_xy(spark, sf_dir)
    expected = float(np.cov(x, y, bias=True)[0, 1] / np.var(x))
    rows = experiment.ab_cuped(spark, sf_dir).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["theta"] == pytest.approx(expected, rel=1e-9)


def test_adjustment_preserves_overall_mean(spark, sf_dir):
    rows = experiment.ab_cuped(spark, sf_dir).collect()
    n = sum(r["n_users"] for r in rows)
    raw = sum(r["n_users"] * r["mean_y"] for r in rows) / n
    adj = sum(r["n_users"] * r["mean_y_adj"] for r in rows) / n
    assert adj == pytest.approx(raw, abs=1e-4)


def test_variance_reduction_nonnegative(spark, sf_dir):
    # theta is the variance-minimizing coefficient, so CUPED can only
    # shrink the user-level variance (rounding gives the 1e-6 slack)
    for r in experiment.ab_cuped(spark, sf_dir).collect():
        assert r["var_reduction_pct"] >= -1e-6
        assert r["var_reduction_pct"] <= 100.0


def test_srm_counts_and_flag(spark, sf_dir):
    r = experiment.ab_srm_check(spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    rows = experiment.ab_cuped(spark, sf_dir).collect()
    by_arm = {x["arm"]: x["n_users"] for x in rows}
    assert r["n_treatment"] == by_arm["treatment"]
    assert r["n_control"] == by_arm["control"]
    n_t, n_c = r["n_treatment"], r["n_control"]
    exp = (n_t + n_c) / 2
    chi2 = (n_t - exp) ** 2 / exp + (n_c - exp) ** 2 / exp
    assert r["chi2"] == pytest.approx(chi2, abs=1e-6)
    assert r["srm_alarm"] == (round(chi2, 6) > experiment.SRM_CHI2_CRIT)


def test_neyman_allocation_exact_budget(spark, sf_dir):
    from ssiintegrateddatapipeline_spark.operators import sampling

    rows = sampling.neyman_allocation(spark, sf_dir).collect()
    assert sum(r["alloc_n"] for r in rows) == sampling.NEYMAN_BUDGET
    # Neyman shares follow N_h * sigma_h exactly
    w = {r["event_type"]: r["n_rows"] * r["sd_value"] for r in rows}
    tot = sum(w.values())
    for r in rows:
        assert r["share_pct"] == pytest.approx(
            100.0 * w[r["event_type"]] / tot, rel=1e-4
        )
        # largest-remainder rounding stays within 1 of the real share
        assert abs(r["alloc_n"] - sampling.NEYMAN_BUDGET * w[r["event_type"]] / tot) <= 1


def test_arms_partition_users(spark, sf_dir):
    x, _, arm = _user_xy(spark, sf_dir)
    rows = experiment.ab_cuped(spark, sf_dir).collect()
    by_arm = {r["arm"]: r["n_users"] for r in rows}
    assert set(by_arm) == {"treatment", "control"}
    assert sum(by_arm.values()) == len(x)
    assert by_arm["treatment"] == sum(1 for a in arm if a == "treatment")
