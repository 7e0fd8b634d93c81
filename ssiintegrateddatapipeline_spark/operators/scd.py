"""Slowly-changing-dimension (SCD type 2) operators.

The reference's credential store is effectively an SCD-0 upsert
(kafka_consumer credential cache — latest doc wins; see
sinks.credential_store_merge). A warehouse at 100 TB needs the type-2
form: track *history* of a dimension attribute as [valid_from, valid_to)
intervals, then join facts against the version valid at event time.

Both operators are single-shuffle formulations:

- the SCD2 *build* is one groupBy (customer-year spend) followed by two
  window functions over the same partition key — Catalyst reuses one sort
  for both (`lag` to detect attribute changes, `lead` to close intervals);
- the *point-in-time lookup* is an equi-join on the entity key plus an
  interval filter — NOT a nested-loop range join: the dimension co-
  partitions with the fact on the key, so at scale it's an ordinary
  shuffle (or broadcast) hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.sources.batch import load_table

def _tier_case():
    return (
        F.when(F.col("spend") < 300_000.0, F.lit("bronze"))
        .when(F.col("spend") < 600_000.0, F.lit("silver"))
        .otherwise(F.lit("gold"))
    )


def _yearly_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.col("o_custkey").alias("custkey"),
            F.year("o_orderdate").alias("year"),
        )
        .agg(F.sum("o_totalprice").alias("spend"))
        .select("custkey", "year", _tier_case().alias("tier"))
    )


def _scd2_from(tiers: DataFrame) -> DataFrame:
    """Change-compress a (custkey, year, tier) stream into SCD2 rows."""
    w = Window.partitionBy("custkey").orderBy("year")
    changes = tiers.withColumn("prev_tier", F.lag("tier").over(w)).where(
        F.col("prev_tier").isNull() | (F.col("prev_tier") != F.col("tier"))
    )
    w2 = Window.partitionBy("custkey").orderBy("year")
    return changes.select(
        "custkey",
        F.col("year").alias("valid_from_year"),
        F.lead("year").over(w2).alias("valid_to_year"),
        "tier",
        F.lead("year").over(w2).isNull().alias("is_current"),
    )


def customer_tier_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the SCD2 history of each customer's annual spend tier:
    consecutive years with the same tier compress into one row, each row
    carries [valid_from_year, valid_to_year) and an is_current flag."""
    return _scd2_from(_yearly_tiers(spark, sf_dir))


SCD2_CUTOFF_YEAR = 2000  # change-feed boundary for the apply-changes op


def apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance — the MERGE / apply-changes op: the
    dimension built from pre-cutoff history receives the post-cutoff
    years as an append-only change feed. Affected keys re-compress ONLY
    their open row plus their delta years (the open row either extends —
    same tier — or closes at the first differing year); closed history
    and untouched keys pass through verbatim. The applied result must
    equal a FULL REBUILD bit-for-bit — the oracle is the full-rebuild
    SQL, so the equivalence is what the hash check proves.

    Assumes the standard warehouse load discipline: the feed is
    append-only in event time (every delta year >= every base year) —
    late-arriving history would require reopening closed rows (a
    different, rarer op). Scale shape: the delta and the open-row slice
    are both small next to the history; untouched history moves through
    an anti join (keys only), never a window.
    """
    tiers = _yearly_tiers(spark, sf_dir)
    base = _scd2_from(tiers.where(F.col("year") < SCD2_CUTOFF_YEAR))
    delta = tiers.where(F.col("year") >= SCD2_CUTOFF_YEAR)
    affected = delta.select("custkey").distinct()
    untouched = base.join(affected, "custkey", "left_anti")
    aff_base = base.join(affected, "custkey", "left_semi")
    closed = aff_base.where(~F.col("is_current"))
    open_rows = aff_base.where(F.col("is_current")).select(
        "custkey", F.col("valid_from_year").alias("year"), "tier"
    )
    rebuilt_tail = _scd2_from(open_rows.unionByName(delta))
    return untouched.unionByName(closed).unionByName(rebuilt_tail)


def tier_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time fact→dimension join: each order joined to the
    customer's tier as of the *previous* year (NULL tier for a customer's
    first active year), aggregated to per-tier order counts and volume."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.year("o_orderdate").alias("year"),
        "o_totalprice",
    )
    dim = customer_tier_scd2(spark, sf_dir)
    asof_year = F.col("year") - 1
    joined = orders.join(
        dim,
        (orders["custkey"] == dim["custkey"])
        & (dim["valid_from_year"] <= asof_year)
        & (dim["valid_to_year"].isNull() | (dim["valid_to_year"] > asof_year)),
        "left",
    )
    return joined.groupBy(F.coalesce("tier", F.lit("new")).alias("prior_tier")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("volume"),
    )


QUERIES = {
    "scd2_customer_tiers": customer_tier_scd2,
    "scd2_pit_lookup": tier_pit_lookup,
    "scd2_apply_changes": apply_changes,
}

_TIER_SQL = """
    SELECT o_custkey AS custkey, year(o_orderdate) AS year,
           CASE WHEN sum(o_totalprice) < 300000.0 THEN 'bronze'
                WHEN sum(o_totalprice) < 600000.0 THEN 'silver'
                ELSE 'gold' END AS tier
    FROM orders GROUP BY 1, 2
"""

_SCD2_SQL = f"""
    WITH tiers AS ({_TIER_SQL}),
    changes AS (
        SELECT custkey, year, tier,
               lag(tier) OVER (PARTITION BY custkey ORDER BY year) AS prev_tier
        FROM tiers
    ),
    dim AS (
        SELECT custkey, year AS valid_from_year,
               lead(year) OVER (PARTITION BY custkey ORDER BY year)
                   AS valid_to_year,
               tier
        FROM changes
        WHERE prev_tier IS NULL OR prev_tier != tier
    )
    SELECT custkey, valid_from_year, valid_to_year, tier,
           valid_to_year IS NULL AS is_current
    FROM dim
"""

ORACLES = {
    "scd2_customer_tiers": _SCD2_SQL,
    # the incremental apply must equal the full rebuild bit-for-bit —
    # the full-rebuild SQL IS the oracle for the apply path
    "scd2_apply_changes": _SCD2_SQL,
    "scd2_pit_lookup": f"""
        WITH dim AS ({_SCD2_SQL})
        SELECT coalesce(d.tier, 'new') AS prior_tier,
               count(*) AS n_orders,
               round(sum(o.o_totalprice), 2) AS volume
        FROM (SELECT o_custkey, year(o_orderdate) AS year, o_totalprice
              FROM orders) o
        LEFT JOIN dim d
          ON o.o_custkey = d.custkey
         AND d.valid_from_year <= o.year - 1
         AND (d.valid_to_year IS NULL OR d.valid_to_year > o.year - 1)
        GROUP BY 1
    """,
}
