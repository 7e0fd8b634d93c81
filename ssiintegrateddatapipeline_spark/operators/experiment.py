"""Experiment readout operators — deterministic A/B assignment + CUPED.

The standard online-experiment readout: users are hash-assigned to arms
(deterministic, uniform, engine-independent — the md5-prefix device shared
with ``operators/sampling.py``), the metric is each user's post-period
activity, and the variance-reduced estimate applies CUPED (Controlled
Experiments Using Pre-Experiment Data, Deng et al., WSDM 2013): regress
the metric on the pre-period covariate across ALL users, subtract
``theta * (x - mean(x))`` from each user's metric, and report per-arm
means of both the raw and the adjusted metric plus the achieved variance
reduction.

Numeric parity design: every moment (n, Σx, Σy, Σx², Σxy, Σy²) is an
EXACT integer — values aggregate as micro-units (``round(value*1e6)``) per
user, and the second-order sums accumulate as decimal(38,0) in Spark /
HUGEINT in DuckDB, so both engines hold bit-identical integers before a
single deterministic cast to double. θ and the derived means then use the
IDENTICAL double expression structure in both engines (IEEE 754 makes the
results bit-equal), snapped with ``round`` for display. No libm calls
anywhere, so no 12-decimal-grid devices are needed beyond θ's own snap.

Scale notes (100 TB):
- two hash aggregations: events → per-user (keyed on user_id, map-side
  combined) and per-user → per-arm (2 groups, partial agg collapses each
  task to ≤2 rows before the shuffle);
- the global moment row and the per-arm rows join by broadcast cross
  join (1-row build side) — no collect, no driver arithmetic;
- arm assignment is a per-row md5 — embarrassingly parallel, and the
  same expression prunes straight into the scan when filters on arm are
  pushed down.

Reference parity: the reference has no experimentation layer; this sits
in the analytics tier next to the drift tests (``analytics_ks_drift``,
``analytics_psi_drift``) as the decision-making counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.operators.sampling import _hash_hex
from ssiintegrateddatapipeline_spark.sources.batch import load_table

# Experiment clock: the events table spans 2024-01-01 .. 2024-01-30 at
# every SF; the first half is the pre-experiment (covariate) period, the
# second half the experiment (metric) period.
CUPED_SPLIT_TS = "2024-01-16 00:00:00"
ARM_SALT = "ab"  # md5(user_id|'|'|salt) first hex < '8' -> treatment


def arm_col(user=None):
    """Deterministic 50/50 arm assignment for a user-id column (default
    ``user_id``) — shared by the batch readouts and the streaming traffic
    monitor. (The default is resolved lazily: building a Column at import
    time would require a live SparkContext.)"""
    if user is None:
        user = F.col("user_id")
    return F.when(
        F.substring(_hash_hex(user, ARM_SALT), 1, 1) < "8",
        F.lit("treatment"),
    ).otherwise(F.lit("control"))


def _user_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, arm, x_micro, y_micro): exact-integer pre/post activity."""
    ev = load_table(spark, sf_dir, "events")
    micro = F.round(F.col("value") * 1e6).cast("long")
    pre = F.col("ts") < F.lit(CUPED_SPLIT_TS).cast("timestamp")
    arm = arm_col()
    return (
        ev.groupBy("user_id")
        .agg(
            F.coalesce(F.sum(F.when(pre, micro).otherwise(F.lit(0))), F.lit(0))
            .alias("x_micro"),
            F.coalesce(
                F.sum(F.when(~pre, micro).otherwise(F.lit(0))), F.lit(0)
            ).alias("y_micro"),
        )
        .withColumn("arm", arm)
    )


def ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm experiment readout with CUPED adjustment: user counts, raw
    and adjusted post-period means (original value units), the shared
    regression coefficient θ, and the population variance reduction CUPED
    achieved on the user-level metric."""
    users = _user_frame(spark, sf_dir)
    dx = F.col("x_micro").cast("decimal(38,0)")
    dy = F.col("y_micro").cast("decimal(38,0)")
    g = users.agg(
        F.count(F.lit(1)).cast("double").alias("dn"),
        F.sum(dx).cast("double").alias("dsx"),
        F.sum(dy).cast("double").alias("dsy"),
        F.sum(dx * dx).cast("double").alias("dsxx"),
        F.sum(dx * dy).cast("double").alias("dsxy"),
        F.sum(dy * dy).cast("double").alias("dsyy"),
    )
    theta = F.round(
        (F.col("dn") * F.col("dsxy") - F.col("dsx") * F.col("dsy"))
        / (F.col("dn") * F.col("dsxx") - F.col("dsx") * F.col("dsx")),
        12,
    )
    var_y = F.col("dsyy") / F.col("dn") - (F.col("dsy") / F.col("dn")) * (
        F.col("dsy") / F.col("dn")
    )
    var_x = F.col("dsxx") / F.col("dn") - (F.col("dsx") / F.col("dn")) * (
        F.col("dsx") / F.col("dn")
    )
    cov = F.col("dsxy") / F.col("dn") - (F.col("dsx") / F.col("dn")) * (
        F.col("dsy") / F.col("dn")
    )
    g = g.select(
        "dn",
        "dsx",
        theta.alias("theta"),
        F.round(
            100.0
            * (
                1.0
                - (
                    var_y
                    - 2.0 * theta * cov
                    + theta * theta * var_x
                )
                / var_y
            ),
            6,
        ).alias("var_reduction_pct"),
    )
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(dx).cast("double").alias("dsxa"),
        F.sum(dy).cast("double").alias("dsya"),
    )
    dna = F.col("n_users").cast("double")
    return arms.crossJoin(F.broadcast(g)).select(
        "arm",
        F.col("n_users").cast("long").alias("n_users"),
        F.round(F.col("dsya") / dna / 1e6, 6).alias("mean_y"),
        F.round(
            (
                F.col("dsya") / dna
                - F.col("theta")
                * (F.col("dsxa") / dna - F.col("dsx") / F.col("dn"))
            )
            / 1e6,
            6,
        ).alias("mean_y_adj"),
        "theta",
        "var_reduction_pct",
    )


# chi-square(1 df) critical value at alpha = 0.05: the SRM alarm line
SRM_CHI2_CRIT = 3.841458820694124


def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: a chi-square goodness-of-fit test
    of the realized arm split against the designed 50/50. SRM is the
    canonical "your experiment is broken" alarm — assignment bugs, bot
    filtering, and logging loss all surface here before any metric is
    worth reading. One row: arm counts, the chi-square statistic, and the
    alarm flag at the 0.05 critical value (no p-value — that would need
    erf, a libm parity hazard; the flag against the exact critical
    constant is the decision anyway).
    """
    users = _user_frame(spark, sf_dir)
    g = users.agg(
        F.sum((F.col("arm") == "treatment").cast("long")).alias("n_treatment"),
        F.sum((F.col("arm") == "control").cast("long")).alias("n_control"),
    )
    dt = F.col("n_treatment").cast("double")
    dc = F.col("n_control").cast("double")
    exp = (dt + dc) / 2.0
    chi2 = (dt - exp) * (dt - exp) / exp + (dc - exp) * (dc - exp) / exp
    return g.select(
        F.col("n_treatment").cast("long").alias("n_treatment"),
        F.col("n_control").cast("long").alias("n_control"),
        F.round(chi2, 6).alias("chi2"),
        (F.round(chi2, 6) > SRM_CHI2_CRIT).alias("srm_alarm"),
    )


# (z_{alpha/2} + z_beta)^2 for alpha=0.05 two-sided, 80% power — folded
# to ONE Python-float literal so neither engine touches erf/libm
POWER_Z2 = (1.959963984540054 + 0.8416212335729143) ** 2
POWER_MDE_PCTS = (2, 5, 10)  # minimum detectable effects, % of control mean


def ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-size / power readout: for each candidate MDE (as a % of the
    control mean), the required users PER ARM under the standard
    two-sample normal approximation n = 2*s2_pooled*(z_a+z_b)^2/delta^2,
    against the experiment's realized arm sizes — the "how much longer
    must this run" table every experimentation platform serves next to
    the readout.

    Parity devices: per-arm moments come from exact decimal(38,0) sums
    of the integer-micro user metric (the CUPED idiom); the pooled
    sample variance and delta are snapped at 12 decimals before the
    closed form; the z constant is a shared Python-float literal (no erf
    in either engine); ceil-then-cast yields the integer requirement
    identically. One aggregation over the user frame; the MDE grid is a
    3-element literal explode."""
    users = _user_frame(spark, sf_dir)
    dy = F.col("y_micro").cast("decimal(38,0)")
    is_t = F.col("arm") == "treatment"
    g = users.agg(
        F.sum(is_t.cast("long")).alias("n_t"),
        F.sum((~is_t).cast("long")).alias("n_c"),
        F.sum(F.when(is_t, dy).otherwise(F.lit(0).cast("decimal(38,0)")))
        .cast("double")
        .alias("sy_t"),
        F.sum(F.when(is_t, dy * dy).otherwise(F.lit(0).cast("decimal(38,0)")))
        .cast("double")
        .alias("syy_t"),
        F.sum(F.when(~is_t, dy).otherwise(F.lit(0).cast("decimal(38,0)")))
        .cast("double")
        .alias("sy_c"),
        F.sum(F.when(~is_t, dy * dy).otherwise(F.lit(0).cast("decimal(38,0)")))
        .cast("double")
        .alias("syy_c"),
    )
    nt, nc = F.col("n_t").cast("double"), F.col("n_c").cast("double")
    s2_t = (F.col("syy_t") - F.col("sy_t") * F.col("sy_t") / nt) / (nt - 1)
    s2_c = (F.col("syy_c") - F.col("sy_c") * F.col("sy_c") / nc) / (nc - 1)
    s2_pooled = F.round(
        ((nt - 1) * s2_t + (nc - 1) * s2_c) / (nt + nc - 2), 12
    )
    mean_c = F.col("sy_c") / nc
    base = g.select(
        "n_t", "n_c", s2_pooled.alias("s2"), mean_c.alias("mc")
    ).select(
        "n_t",
        "n_c",
        "s2",
        "mc",
        F.explode(
            F.array(*[F.lit(p) for p in POWER_MDE_PCTS])
        ).alias("mde_pct"),
    )
    delta = F.round(F.col("mde_pct") / 100.0 * F.col("mc"), 12)
    n_req = F.ceil(
        2.0 * F.col("s2") * F.lit(POWER_Z2) / (delta * delta)
    ).cast("long")
    return base.select(
        "mde_pct",
        F.round(delta / 1e6, 6).alias("delta_value"),
        n_req.alias("n_required_per_arm"),
        F.col("n_t").alias("n_treatment"),
        F.col("n_c").alias("n_control"),
        (F.least("n_t", "n_c") >= n_req).alias("powered_now"),
    )


def ab_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout over the same pre/post split and
    arm assignment as CUPED: the 2x2 (arm x period) table of per-user
    mean activity plus the DiD effect
    ``(treat_post - treat_pre) - (ctrl_post - ctrl_pre)`` — the estimator
    that nets out both the arms' baseline offset and the common temporal
    trend, the standard readout when assignment is suspected non-random.

    Same exactness device as the rest of the module: per-arm integer sums
    over the user frame, one cast to double, identical expression
    structure in both engines. Single row out.
    """
    users = _user_frame(spark, sf_dir)
    g = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_micro").alias("sx"),
        F.sum("y_micro").alias("sy"),
    )
    t = (F.col("arm") == "treatment").cast("long")
    row = g.agg(
        F.sum(F.col("n") * t).alias("n_treatment"),
        F.sum(F.col("n") * (1 - t)).alias("n_control"),
        F.sum(F.col("sx") * t).cast("double").alias("txs"),
        F.sum(F.col("sy") * t).cast("double").alias("tys"),
        F.sum(F.col("sx") * (1 - t)).cast("double").alias("cxs"),
        F.sum(F.col("sy") * (1 - t)).cast("double").alias("cys"),
    )
    dt = F.col("n_treatment").cast("double")
    dc = F.col("n_control").cast("double")
    mean = lambda s, n: s / n / 1e6  # noqa: E731 — shared shape, both engines
    return row.select(
        F.col("n_treatment").cast("long").alias("n_treatment"),
        F.col("n_control").cast("long").alias("n_control"),
        F.round(mean(F.col("txs"), dt), 6).alias("treat_pre"),
        F.round(mean(F.col("tys"), dt), 6).alias("treat_post"),
        F.round(mean(F.col("cxs"), dc), 6).alias("ctrl_pre"),
        F.round(mean(F.col("cys"), dc), 6).alias("ctrl_post"),
        F.round(
            (mean(F.col("tys"), dt) - mean(F.col("txs"), dt))
            - (mean(F.col("cys"), dc) - mean(F.col("cxs"), dc)),
            6,
        ).alias("did_effect"),
    )


def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between the click and purchase
    value distributions — the nonparametric location test an experiment
    layer needs when values are heavy-tailed and the t-family (CUPED,
    power) assumptions fail. Reports the exact doubled statistic
    2·U_click (integer — ties make U half-integral, doubling keeps it
    exact), the rank-biserial effect size, and the tie-corrected normal
    z-score.

    Exactness: average ranks never materialize as floats — for each
    DISTINCT value, 2·rank_avg = 2·cnt_less + cnt_eq + 1 is an integer,
    so 2·R_click is an exact BIGINT sum; the effect size and z divide
    once at the end from exact integer operands (< 2^53, so the
    double conversions are exact and the final expressions are
    bit-identical cross-engine). Scale: ranking reduces to ONE
    map-side-combined groupBy on distinct values plus the two-phase
    prefix sum — no global window, no sort of the raw rows."""
    from ssiintegrateddatapipeline_spark.functions.twophase import (
        two_phase_prefix_sum,
    )

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    per_val = ev.groupBy("value").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum((F.col("event_type") == "click").cast("long")).alias("t_a"),
    )
    ranked = two_phase_prefix_sum(
        per_val,
        bucket=F.floor(F.col("value")).cast("long"),
        order_by=[F.col("value")],
        val=F.col("t"),
        out="cum_t",
    )
    # 2 x the average rank of every element tied at this value
    r2 = 2 * (F.col("cum_t") - F.col("t")) + F.col("t") + 1
    g = ranked.agg(
        F.sum("t_a").alias("n_a"),
        F.sum(F.col("t") - F.col("t_a")).alias("n_b"),
        F.sum(F.col("t_a") * r2).alias("r2_a"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias(
            "tie_cubes"
        ),
    )
    u2 = F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)  # = 2 x U_click
    n = F.col("n_a") + F.col("n_b")
    # tie-corrected variance of U: nA·nB/12 · ((N+1) − Σ(t³−t)/(N(N−1)))
    var_u = (
        F.col("n_a")
        * F.col("n_b")
        / F.lit(12.0)
        * ((n + 1) - F.col("tie_cubes") / (n * (n - 1)))
    )
    return g.select(
        F.col("n_a").cast("long").alias("n_click"),
        F.col("n_b").cast("long").alias("n_purchase"),
        u2.cast("long").alias("u2_click"),
        F.round(
            u2 / (F.col("n_a") * F.col("n_b")) - F.lit(1.0), 6
        ).alias("rank_biserial"),
        F.round(
            (u2 - F.col("n_a") * F.col("n_b"))
            / (F.lit(2.0) * F.sqrt(var_u)),
            6,
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Shapley-value channel attribution (the data-driven attribution model,
# e.g. Zhao et al., "Shapley Value Methods for Attribution Modeling in
# Online Advertising", 2018): credit each touchpoint channel for
# conversions by its exact Shapley value over the coalition game
# v(S) = #converted users whose touched-channel set ⊆ S.
#
# With C=4 channels the subset lattice has 16 coalitions, so after ONE
# distributed pass (per-user channel bitmask + conversion flag, then a
# ≤2^C-row mask census) everything is exact integer arithmetic over tiny
# broadcast grids: v(S) is a subset-sum join (mask & S = mask), and
# φ_c·C! = Σ_{S∌c} |S|!·(C−1−|S|)!·(v(S∪c)−v(S)) stays an INTEGER —
# the (c, S, weight) enumeration is generated once in Python and embedded
# in both the Spark plan (local_frame) and the oracle SQL (VALUES), so the
# two engines replay the identical game. At 100 TB the only data-sized
# step is the per-user groupBy; the lattice math is O(4^C) on 16 rows.
# ---------------------------------------------------------------------------

ATTRIB_CHANNELS = ("click", "error", "signup", "view")
_C = len(ATTRIB_CHANNELS)
_FACT = [1, 1, 2, 6, 24]  # n! for n ≤ 4


def _shapley_terms() -> list[tuple[str, int, int, int]]:
    """(channel, S, S∪{c}, weight) rows with weight = |S|!·(C−1−|S|)!."""
    rows = []
    for ci, ch in enumerate(ATTRIB_CHANNELS):
        bit = 1 << ci
        for s in range(1 << _C):
            if s & bit:
                continue
            size = bin(s).count("1")
            rows.append((ch, s, s | bit, _FACT[size] * _FACT[_C - 1 - size]))
    return rows


def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley conversion credit per channel: φ·C! as an integer,
    the float φ, and the efficiency-axiom check Σφ = v(full) − v(∅)."""
    from ssiintegrateddatapipeline_spark.sources.batch import local_frame

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        *[
            F.max((F.col("event_type") == c).cast("int")).alias(f"t{i}")
            for i, c in enumerate(ATTRIB_CHANNELS)
        ],
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    mask = sum(F.col(f"t{i}") * (1 << i) for i in range(_C))
    census = (
        per_user.where(F.col("conv") == 1)
        .select(mask.alias("mask"))
        .groupBy("mask")
        .agg(F.count(F.lit(1)).alias("n_conv"))
    )
    subsets = local_frame(spark, [(s,) for s in range(1 << _C)], "s int")
    v = (
        subsets.join(
            F.broadcast(census),
            census["mask"].bitwiseAND(subsets["s"]) == census["mask"],
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("n_conv"), F.lit(0)).alias("v"))
    )
    terms = local_frame(
        spark, _shapley_terms(), "channel string, s int, sc int, w long"
    )
    joined = (
        terms.join(F.broadcast(v.select(F.col("s"), F.col("v").alias("v_s"))), "s")
        .join(
            F.broadcast(
                v.select(F.col("s").alias("sc"), F.col("v").alias("v_sc"))
            ),
            "sc",
        )
    )
    phi = joined.groupBy("channel").agg(
        F.sum(F.col("w") * (F.col("v_sc") - F.col("v_s"))).alias("phi_xcfact")
    )
    bounds = v.agg(
        F.max(F.when(F.col("s") == (1 << _C) - 1, F.col("v"))).alias("v_full"),
        F.max(F.when(F.col("s") == 0, F.col("v"))).alias("v_empty"),
    )
    total = phi.agg(F.sum("phi_xcfact").alias("phi_sum")).crossJoin(
        F.broadcast(bounds)
    )
    return (
        phi.crossJoin(F.broadcast(total))
        .select(
            "channel",
            "phi_xcfact",
            F.round(F.col("phi_xcfact") / _FACT[_C], 6).alias("phi"),
            "v_full",
            (
                F.col("phi_sum")
                == _FACT[_C] * (F.col("v_full") - F.col("v_empty"))
            ).alias("efficiency_ok"),
        )
    )


_SHAPLEY_TERMS_VALUES = ", ".join(
    f"('{ch}', {s}, {sc}, {w})" for ch, s, sc, w in _shapley_terms()
)

_SHAPLEY_ORACLE = f"""
    WITH per_user AS (
        SELECT user_id,
               {" + ".join(
                   f"max(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END)"
                   f" * {1 << i}"
                   for i, c in enumerate(ATTRIB_CHANNELS)
               )} AS mask,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id
    ),
    census AS (
        SELECT mask, count(*)::BIGINT AS n_conv FROM per_user
        WHERE conv = 1 GROUP BY mask
    ),
    subsets AS (SELECT unnest(generate_series(0, {(1 << _C) - 1})) AS s),
    v AS (
        SELECT s, coalesce(sum(n_conv), 0)::BIGINT AS v
        FROM subsets LEFT JOIN census ON (mask & s) = mask GROUP BY s
    ),
    terms(channel, s, sc, w) AS (VALUES {_SHAPLEY_TERMS_VALUES}),
    phi AS (
        SELECT channel,
               sum(w * (v_sc.v - v_s.v))::BIGINT AS phi_xcfact
        FROM terms
        JOIN v v_s ON v_s.s = terms.s
        JOIN v v_sc ON v_sc.s = terms.sc
        GROUP BY channel
    ),
    bounds AS (
        SELECT max(CASE WHEN s = {(1 << _C) - 1} THEN v END) AS v_full,
               max(CASE WHEN s = 0 THEN v END) AS v_empty
        FROM v
    ),
    total AS (SELECT sum(phi_xcfact)::BIGINT AS phi_sum FROM phi)
    SELECT channel, phi_xcfact,
           round(phi_xcfact / {float(_FACT[_C])}, 6) AS phi,
           v_full,
           phi_sum = {_FACT[_C]} * (v_full - v_empty) AS efficiency_ok
    FROM phi CROSS JOIN bounds CROSS JOIN total
"""


# ---------------------------------------------------------------------------
# Wald's Sequential Probability Ratio Test (SPRT, 1945) — the always-valid
# sequential monitor an experimentation platform runs daily instead of one
# fixed-horizon readout: per arm, the cumulative log-likelihood ratio of
# H1: p = SPRT_P1 vs H0: p = SPRT_P0 over the Bernoulli conversion stream,
# stopped at the Wald boundaries ln((1−β)/α) / ln(β/(1−α)).
#
# Determinism: daily (n, successes) are exact integers cumulated by a
# bounded per-arm day window; the LLR is s·L1 + (n−s)·L0 with L1/L0
# import-time Python floats embedded verbatim (repr) in BOTH engines, so
# one multiply + one add per side is IEEE-identical and the boundary
# decisions are exact double comparisons.
# ---------------------------------------------------------------------------

import math as _math

SPRT_P0, SPRT_P1 = 0.19, 0.21  # H0/H1 conversion rates
SPRT_ALPHA = SPRT_BETA = 0.05
_SPRT_L1 = _math.log(SPRT_P1 / SPRT_P0)
_SPRT_L0 = _math.log((1 - SPRT_P1) / (1 - SPRT_P0))
_SPRT_UPPER = _math.log((1 - SPRT_BETA) / SPRT_ALPHA)
_SPRT_LOWER = _math.log(SPRT_BETA / (1 - SPRT_ALPHA))


def sprt_readout(daily: DataFrame) -> DataFrame:
    """The cumulative-LLR + Wald-decision readout over a (arm, day, n, s)
    daily-counter table — shared by the batch monitor and the streaming
    twin (which maintains the same counters as stream state). The per-arm
    cumulative window is bounded by days-in-range."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("arm")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = daily.select(
        "arm",
        "day",
        F.sum("n").over(w).alias("n_t"),
        F.sum("s").over(w).alias("s_t"),
    )
    llr = F.col("s_t") * _SPRT_L1 + (F.col("n_t") - F.col("s_t")) * _SPRT_L0
    return cum.select(
        "arm",
        "day",
        "n_t",
        "s_t",
        F.round(llr, 6).alias("llr"),
        F.when(llr >= _SPRT_UPPER, F.lit("accept_h1"))
        .when(llr <= _SPRT_LOWER, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


def sprt_daily_plan(ev: DataFrame) -> DataFrame:
    """(arm, day) -> (n trials, s conversions): the counter table the SPRT
    consumes — groupBy-aggregable, so it runs identically as a batch
    aggregate or as complete-mode stream state (2·days rows, bounded)."""
    return (
        ev.select(
            arm_col().alias("arm"),
            F.to_date("ts").alias("day"),
            (F.col("event_type") == "purchase").cast("long").alias("conv"),
        )
        .groupBy("arm", "day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("s"))
    )


def sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (arm, day): cumulative trials/conversions, the LLR, and the
    Wald decision (accept_h1 / accept_h0 / continue)."""
    return sprt_readout(sprt_daily_plan(load_table(spark, sf_dir, "events")))


_SPRT_ORACLE = f"""
    WITH daily AS (
        SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || '|{{salt}}'),
                   1, 1) < '8' THEN 'treatment' ELSE 'control' END AS arm,
               CAST(ts AS DATE) AS day,
               count(*)::BIGINT AS n,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   ::BIGINT AS s
        FROM events GROUP BY 1, 2
    ),
    cum AS (
        SELECT arm, day,
               CAST(sum(n) OVER w AS BIGINT) AS n_t,
               CAST(sum(s) OVER w AS BIGINT) AS s_t
        FROM daily
        WINDOW w AS (PARTITION BY arm ORDER BY day
                     ROWS UNBOUNDED PRECEDING)
    ),
    -- numeric literals must be DOUBLE-cast: DuckDB parses them as
    -- DECIMAL, which would change both the arithmetic and the dtype
    scored AS (
        SELECT arm, day, n_t, s_t,
               s_t * CAST({_SPRT_L1!r} AS DOUBLE)
                   + (n_t - s_t) * CAST({_SPRT_L0!r} AS DOUBLE) AS llr_raw
        FROM cum
    )
    SELECT arm, day, n_t, s_t, round(llr_raw, 6) AS llr,
           CASE WHEN llr_raw >= CAST({_SPRT_UPPER!r} AS DOUBLE)
                    THEN 'accept_h1'
                WHEN llr_raw <= CAST({_SPRT_LOWER!r} AS DOUBLE)
                    THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM scored
"""


QUERIES = {
    "analytics_sprt_monitor": sprt_monitor,
    "analytics_shapley_attribution": shapley_attribution,
    "analytics_ab_cuped": ab_cuped,
    "analytics_ab_srm": ab_srm_check,
    "analytics_ab_did": ab_diff_in_diff,
    "analytics_ab_power": ab_power_analysis,
    "analytics_mann_whitney": mann_whitney_u,
}

_USERS_CTE = f"""
        users AS (
            SELECT user_id,
                   CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || '|{ARM_SALT}'), 1, 1) < '8'
                        THEN 'treatment' ELSE 'control' END AS arm,
                   coalesce(sum(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT_TS}'
                       THEN CAST(round(value * 1e6) AS BIGINT) ELSE 0 END), 0)
                       AS x_micro,
                   coalesce(sum(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT_TS}'
                       THEN CAST(round(value * 1e6) AS BIGINT) ELSE 0 END), 0)
                       AS y_micro
            FROM events GROUP BY user_id
        )
"""

ORACLES = {
    "analytics_sprt_monitor": _SPRT_ORACLE.replace("{salt}", ARM_SALT),
    "analytics_shapley_attribution": _SHAPLEY_ORACLE,
    "analytics_ab_did": f"""
        WITH {_USERS_CTE}, g AS (
            SELECT CAST(sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_treatment,
                   CAST(sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_control,
                   CAST(sum(CASE WHEN arm = 'treatment' THEN x_micro
                            ELSE 0 END) AS DOUBLE) AS txs,
                   CAST(sum(CASE WHEN arm = 'treatment' THEN y_micro
                            ELSE 0 END) AS DOUBLE) AS tys,
                   CAST(sum(CASE WHEN arm = 'control' THEN x_micro
                            ELSE 0 END) AS DOUBLE) AS cxs,
                   CAST(sum(CASE WHEN arm = 'control' THEN y_micro
                            ELSE 0 END) AS DOUBLE) AS cys
            FROM users
        )
        SELECT n_treatment, n_control,
               round(txs / CAST(n_treatment AS DOUBLE) / 1e6, 6) AS treat_pre,
               round(tys / CAST(n_treatment AS DOUBLE) / 1e6, 6) AS treat_post,
               round(cxs / CAST(n_control AS DOUBLE) / 1e6, 6) AS ctrl_pre,
               round(cys / CAST(n_control AS DOUBLE) / 1e6, 6) AS ctrl_post,
               round((tys / CAST(n_treatment AS DOUBLE) / 1e6
                      - txs / CAST(n_treatment AS DOUBLE) / 1e6)
                     - (cys / CAST(n_control AS DOUBLE) / 1e6
                        - cxs / CAST(n_control AS DOUBLE) / 1e6), 6)
                   AS did_effect
        FROM g
    """,
    "analytics_ab_power": f"""
        WITH {_USERS_CTE}, g AS (
            SELECT CAST(sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_t,
                   CAST(sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_c,
                   CAST(sum(CASE WHEN arm = 'treatment' THEN y_micro::HUGEINT
                            ELSE 0 END) AS DOUBLE) AS sy_t,
                   CAST(sum(CASE WHEN arm = 'treatment'
                            THEN y_micro::HUGEINT * y_micro::HUGEINT
                            ELSE 0 END) AS DOUBLE) AS syy_t,
                   CAST(sum(CASE WHEN arm = 'control' THEN y_micro::HUGEINT
                            ELSE 0 END) AS DOUBLE) AS sy_c,
                   CAST(sum(CASE WHEN arm = 'control'
                            THEN y_micro::HUGEINT * y_micro::HUGEINT
                            ELSE 0 END) AS DOUBLE) AS syy_c
            FROM users
        ), c AS (
            SELECT n_t, n_c,
                   round((
                       (CAST(n_t AS DOUBLE) - 1)
                           * ((syy_t - sy_t * sy_t / CAST(n_t AS DOUBLE))
                              / (CAST(n_t AS DOUBLE) - 1))
                       + (CAST(n_c AS DOUBLE) - 1)
                           * ((syy_c - sy_c * sy_c / CAST(n_c AS DOUBLE))
                              / (CAST(n_c AS DOUBLE) - 1))
                   ) / (CAST(n_t AS DOUBLE) + CAST(n_c AS DOUBLE) - 2),
                       12) AS s2,
                   sy_c / CAST(n_c AS DOUBLE) AS mc
            FROM g
        ), grid AS (
            SELECT c.*, m.mde_pct
            FROM c CROSS JOIN (VALUES (2), (5), (10)) AS m(mde_pct)
        ), d AS (
            SELECT n_t, n_c, s2, mde_pct,
                   round(mde_pct / 100.0 * mc, 12) AS delta
            FROM grid
        )
        SELECT mde_pct,
               round(delta / 1e6, 6) AS delta_value,
               CAST(ceil(2.0 * s2 * {POWER_Z2!r} / (delta * delta))
                    AS BIGINT) AS n_required_per_arm,
               n_t AS n_treatment,
               n_c AS n_control,
               least(n_t, n_c) >= CAST(ceil(2.0 * s2 * {POWER_Z2!r}
                                            / (delta * delta)) AS BIGINT)
                   AS powered_now
        FROM d
    """,
    "analytics_ab_srm": f"""
        WITH users AS (
            SELECT user_id,
                   CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || '|{ARM_SALT}'), 1, 1) < '8'
                        THEN 'treatment' ELSE 'control' END AS arm
            FROM events GROUP BY user_id
        ), g AS (
            SELECT CAST(sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_treatment,
                   CAST(sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_control
            FROM users
        ), c AS (
            SELECT n_treatment, n_control,
                   (CAST(n_treatment AS DOUBLE)
                    + CAST(n_control AS DOUBLE)) / 2.0 AS expected
            FROM g
        )
        SELECT n_treatment, n_control,
               round((CAST(n_treatment AS DOUBLE) - expected)
                     * (CAST(n_treatment AS DOUBLE) - expected) / expected
                     + (CAST(n_control AS DOUBLE) - expected)
                       * (CAST(n_control AS DOUBLE) - expected) / expected, 6)
                   AS chi2,
               round((CAST(n_treatment AS DOUBLE) - expected)
                     * (CAST(n_treatment AS DOUBLE) - expected) / expected
                     + (CAST(n_control AS DOUBLE) - expected)
                       * (CAST(n_control AS DOUBLE) - expected) / expected, 6)
                   > {SRM_CHI2_CRIT} AS srm_alarm
        FROM c
    """,
    "analytics_ab_cuped": f"""
        WITH users AS (
            SELECT user_id,
                   CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || '|{ARM_SALT}'), 1, 1) < '8'
                        THEN 'treatment' ELSE 'control' END AS arm,
                   coalesce(sum(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT_TS}'
                       THEN CAST(round(value * 1e6) AS BIGINT) ELSE 0 END), 0)
                       AS x_micro,
                   coalesce(sum(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT_TS}'
                       THEN CAST(round(value * 1e6) AS BIGINT) ELSE 0 END), 0)
                       AS y_micro
            FROM events GROUP BY user_id
        ), g AS (
            SELECT CAST(count(*) AS DOUBLE) AS dn,
                   CAST(sum(CAST(x_micro AS HUGEINT)) AS DOUBLE) AS dsx,
                   CAST(sum(CAST(y_micro AS HUGEINT)) AS DOUBLE) AS dsy,
                   CAST(sum(CAST(x_micro AS HUGEINT) * x_micro) AS DOUBLE) AS dsxx,
                   CAST(sum(CAST(x_micro AS HUGEINT) * y_micro) AS DOUBLE) AS dsxy,
                   CAST(sum(CAST(y_micro AS HUGEINT) * y_micro) AS DOUBLE) AS dsyy
            FROM users
        ), gd AS (
            SELECT dn, dsx,
                   round((dn * dsxy - dsx * dsy) / (dn * dsxx - dsx * dsx), 12)
                       AS theta,
                   dsyy / dn - (dsy / dn) * (dsy / dn) AS var_y,
                   dsxx / dn - (dsx / dn) * (dsx / dn) AS var_x,
                   dsxy / dn - (dsx / dn) * (dsy / dn) AS cov
            FROM g
        ), arms AS (
            SELECT arm, count(*) AS n_users,
                   CAST(sum(CAST(x_micro AS HUGEINT)) AS DOUBLE) AS dsxa,
                   CAST(sum(CAST(y_micro AS HUGEINT)) AS DOUBLE) AS dsya
            FROM users GROUP BY arm
        )
        SELECT arm,
               CAST(n_users AS BIGINT) AS n_users,
               round(dsya / CAST(n_users AS DOUBLE) / 1e6, 6) AS mean_y,
               round((dsya / CAST(n_users AS DOUBLE)
                      - theta * (dsxa / CAST(n_users AS DOUBLE) - dsx / dn))
                     / 1e6, 6) AS mean_y_adj,
               theta,
               round(100.0 * (1.0 - (var_y - 2.0 * theta * cov
                                     + theta * theta * var_x) / var_y), 6)
                   AS var_reduction_pct
        FROM arms, gd
    """,
}

ORACLES["analytics_mann_whitney"] = """
    WITH per_val AS (
        SELECT value, count(*) AS t,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS t_a
        FROM events
        WHERE event_type IN ('click', 'purchase')
        GROUP BY value
    ),
    ranked AS (
        SELECT *, sum(t) OVER (ORDER BY value
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum_t
        FROM per_val
    ),
    g AS (
        SELECT CAST(sum(t_a) AS BIGINT) AS n_a,
               CAST(sum(t - t_a) AS BIGINT) AS n_b,
               CAST(sum(t_a * (2 * (cum_t - t) + t + 1)) AS BIGINT) AS r2_a,
               CAST(sum(t * t * t - t) AS BIGINT) AS tie_cubes
        FROM ranked
    )
    SELECT n_a AS n_click, n_b AS n_purchase,
           CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_click,
           round((r2_a - n_a * (n_a + 1))::DOUBLE / (n_a * n_b) - 1.0, 6)
               AS rank_biserial,
           round(((r2_a - n_a * (n_a + 1)) - n_a * n_b)::DOUBLE
                 / (2.0 * sqrt(n_a * n_b / 12.0
                     * ((n_a + n_b + 1)
                        - tie_cubes::DOUBLE
                          / ((n_a + n_b) * (n_a + n_b - 1))))), 6)
               AS z_score
    FROM g
"""
