"""As-of (point-in-time) join — a custom operator Spark lacks natively.

The reference has no as-of join (SURVEY §2.4 notes no relational joins at
all), but it is a core operator for time-series/training-data pipelines:
"for each left event, the most recent right event at or before it, per
key". The scalable formulation used here is union + window, NOT a range
join: tag both sides, union them, and run one `last(..., ignorenulls)`
window per key ordered by time. Cost is a single shuffle on the key and
one sort — the same as any windowed aggregation — versus the quadratic
candidate explosion of a naive time-range join.

At 100 TB: both sides shuffle once on the key; state per key is the sort
run, no per-row lookback buffers. (Catalyst pushes the column pruning into
both scans; the union is zero-cost schema alignment.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.sources.batch import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` on the same ``key`` (null when none exists).

    ``tiebreak`` orders right rows that share a timestamp (deterministic
    output); it must be one of ``right_cols``.
    """
    left_cols = left.columns
    l_tagged = left.select(
        F.col(key).alias("_key"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("_key"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    order = ["_ts", "_side"] + ([F.col(f"_r_{tiebreak}").asc_nulls_first()] if tiebreak else [])
    w = (
        Window.partitionBy("_key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "_side",
        *left_cols,
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in right_cols],
    )
    return carried.where(F.col("_side") == 1).drop("_side")


def last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join in action: each purchase attributed to the user's most
    recent view at or before it (last-touch attribution)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    out = asof_join(
        purchases,
        views,
        key="user_id",
        left_ts="purchase_ts",
        right_ts="view_ts",
        right_cols=["view_id", "view_ts"],
        tiebreak="view_id",
    )
    return out.select(
        "user_id",
        "purchase_id",
        "purchase_ts",
        F.col("asof_view_id").alias("last_view_id"),
        F.round(
            (F.unix_micros("purchase_ts") - F.unix_micros("asof_view_ts")) / 1e6, 3
        ).alias("gap_secs"),
    )


# ---------------------------------------------------------------------------
# Range (interval) join — map a value into arbitrary [lo, hi) bands
# ---------------------------------------------------------------------------

PRICE_BANDS: list[tuple[float, float | None, str]] = [
    (0.0, 5000.0, "budget"),
    (5000.0, 20000.0, "low"),
    (20000.0, 50000.0, "mid"),
    (50000.0, 80000.0, "high"),
    (80000.0, None, "premium"),
]


def range_lookup(
    fact: DataFrame,
    value_col: str,
    bands: list[tuple[float, float | None, str]],
    bucket_width: float = 10_000.0,
    max_value: float = 1e9,
    strategy: str = "bucketed",
) -> DataFrame:
    """Attach every band whose ``[lo, hi)`` interval contains ``value_col``.

    Spark has no native range join, and the naive formulation (a non-equi
    join) physically executes as BroadcastNestedLoopJoin — every fact row
    tested against every band. Fine for 5 bands; fatal for 10^6 ranges
    (GeoIP tables, genomic intervals). ``strategy="bucketed"`` is the
    scale path: each band is exploded to the fixed-width buckets it
    overlaps, the fact side computes its bucket with one `floor`, and the
    join becomes an *equi-join on bucket* (hash join, shuffle-partitionable,
    AQE-skew-splittable) followed by the exact interval filter.
    ``strategy="broadcast_nl"`` keeps the literal non-equi formulation as
    the semantic baseline; both produce identical rows (tests pin this).
    """
    spark = fact.sparkSession
    rows = [
        (lo, hi, label, float(lo if hi is None else hi))
        for lo, hi, label in bands
    ]
    if strategy == "broadcast_nl":
        dim = spark.createDataFrame(
            [(lo, hi, label) for lo, hi, label, _ in rows],
            "lo double, hi double, band string",
        )
        v = F.col(value_col)
        return fact.join(
            F.broadcast(dim),
            (v >= F.col("lo")) & (F.col("hi").isNull() | (v < F.col("hi"))),
        )
    exploded = []
    for lo, hi, label in bands:
        hi_eff = max_value if hi is None else hi
        b0, b1 = int(lo // bucket_width), int((hi_eff - 1e-9) // bucket_width)
        exploded += [(b, lo, hi, label) for b in range(b0, b1 + 1)]
    dim = spark.createDataFrame(exploded, "_bucket long, lo double, hi double, band string")
    v = F.col(value_col)
    return (
        fact.withColumn("_bucket", F.floor(v / F.lit(bucket_width)))
        .join(F.broadcast(dim), "_bucket")  # at 10^6 ranges: drop broadcast, shuffle both on _bucket
        .where((v >= F.col("lo")) & (F.col("hi").isNull() | (v < F.col("hi"))))
        .drop("_bucket")
    )


def range_band_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join in action: lineitem prices bucketed into the PRICE_BANDS
    intervals, with per-band volume stats."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    return (
        range_lookup(li, "l_extendedprice", PRICE_BANDS)
        .groupBy("band")
        .agg(
            F.count("*").alias("n_items"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )


QUERIES = {
    "asof_last_touch": last_touch,
    "range_band_pricing": range_band_pricing,
}

ORACLES = {
    # same union+window formulation in DuckDB (not its native ASOF JOIN, so
    # tie-breaking semantics are pinned identically on both sides)
    "asof_last_touch": """
        WITH purchases AS (
            SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
            FROM events WHERE event_type = 'purchase'
        ),
        views AS (
            SELECT user_id, event_id AS view_id, ts AS view_ts
            FROM events WHERE event_type = 'view'
        ),
        unioned AS (
            SELECT user_id, purchase_ts AS _ts, 1 AS _side,
                   purchase_id, purchase_ts, NULL::BIGINT AS view_id,
                   NULL::TIMESTAMP AS view_ts
            FROM purchases
            UNION ALL
            SELECT user_id, view_ts, 0, NULL, NULL, view_id, view_ts
            FROM views
        ),
        carried AS (
            SELECT _side, user_id, purchase_id, purchase_ts,
                   last_value(view_id IGNORE NULLS) OVER w AS last_view_id,
                   last_value(view_ts IGNORE NULLS) OVER w AS last_view_ts
            FROM unioned
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY _ts, _side, view_id ASC NULLS FIRST
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, purchase_id, purchase_ts, last_view_id,
               round((epoch_us(purchase_ts) - epoch_us(last_view_ts)) / 1e6, 3)
                   AS gap_secs
        FROM carried
        WHERE _side = 1
    """,
    "range_band_pricing": """
        SELECT band,
               count(*) AS n_items,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price
        FROM lineitem
        JOIN (VALUES (0.0, 5000.0, 'budget'),
                     (5000.0, 20000.0, 'low'),
                     (20000.0, 50000.0, 'mid'),
                     (50000.0, 80000.0, 'high'),
                     (80000.0, CAST(NULL AS DOUBLE), 'premium')) b(lo, hi, band)
          ON l_extendedprice >= lo AND (hi IS NULL OR l_extendedprice < hi)
        GROUP BY band
    """,
}
