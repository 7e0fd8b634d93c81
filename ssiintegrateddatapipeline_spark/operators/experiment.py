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


def _user_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, arm, x_micro, y_micro): exact-integer pre/post activity."""
    ev = load_table(spark, sf_dir, "events")
    micro = F.round(F.col("value") * 1e6).cast("long")
    pre = F.col("ts") < F.lit(CUPED_SPLIT_TS).cast("timestamp")
    arm = F.when(
        F.substring(_hash_hex(F.col("user_id"), ARM_SALT), 1, 1) < "8",
        F.lit("treatment"),
    ).otherwise(F.lit("control"))
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


QUERIES = {
    "analytics_ab_cuped": ab_cuped,
}

ORACLES = {
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
