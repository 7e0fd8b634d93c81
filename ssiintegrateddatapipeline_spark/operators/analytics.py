"""Windowed analytics operators — the reference's PromQL query surface.

The reference evaluates its "queries" as PromQL over Prometheus-scraped
metrics (SURVEY §2.6, grafana thesis_dashboard.json): windowed rates,
histogram_quantile(0.95, ...) over cumulative buckets, max-gauges, and
payload-size heatmaps. Here those are declarative DataFrame plans over an
event table with an event-time column — the same plans work on a streaming
DataFrame with ``F.window`` + watermark (see streaming/).

Scale notes (100 TB):
- every op is a single groupBy on (window, low-cardinality labels): map-side
  partial aggregation applies, shuffle carries only per-window partials;
- the histogram ops join against a tiny literal bucket table that Spark
  broadcasts (no shuffle of the fact side beyond the one aggregation);
- no Python UDFs anywhere — whole-stage codegen end to end.

Each query has a DuckDB oracle twin in ``ORACLES`` (identical arithmetic,
identical column aliases) used by the driver's correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.functions.twophase import (
    ntile_from_rank,
    quantile_buckets,
    two_phase_row_number,
)
from ssiintegrateddatapipeline_spark.sources.batch import load_table
from ssiintegrateddatapipeline_spark.caches import track
from ssiintegrateddatapipeline_spark.sources.batch import local_frame

# Prometheus-style cumulative bucket upper bounds.
# e2e latency buckets: kafka_consumer/app/metrics/metrics.py:59 (reference).
E2E_BUCKETS = [0.1, 0.5, 1.0, 2.0, 5.0, 10.0, 30.0, 60.0, 120.0, 300.0]
# verification buckets: metrics.py:129 (reference).
VERIFY_BUCKETS = [0.01, 0.05, 0.1, 0.25, 0.5, 1.0, 2.0, 5.0]
# payload-size buckets: exponential, metrics.go:57-62 (reference) uses
# 256*2^i; the test events' payload (props JSON) is small, so start at 8 B.
PAYLOAD_BUCKETS = [8.0, 16.0, 32.0, 64.0, 128.0, 256.0]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _round_half_up_ratio(numer, denom, scale: int):
    """round(numer/denom, scale) with EXPLICIT half-up tie-breaking in pure
    integer arithmetic: floor((numer·2·10^s + denom) / (2·denom)) / 10^s.

    Why not round(avg(...), s): averages of exact-decimal inputs land on
    exact decimal half-ties whenever the count has only 2/5 factors (e.g.
    cents/32 → x.xxxxxx5), and there Spark (shortest-decimal-string
    HALF_UP) and DuckDB (binary-double rounding) systematically disagree.
    The integer form is engine-independent: `a - a % b` keeps everything
    in int64, the final division is exact. Oracle twin:
    ``((numer*2*10^s + denom) // (2*denom)) / 10^s.0``. Inputs must be
    non-negative integer columns (cents, counts, micros)."""
    p = 10**scale
    big = numer * F.lit(2 * p) + denom
    d2 = denom * F.lit(2)
    # (big - big % d2) is exactly divisible; the double division's error is
    # far below 0.5 for any realistic quotient, so round() snaps it back to
    # the exact integer before the final scale-down
    q = F.round((big - big % d2) / d2).cast("long")
    return q / F.lit(float(p))


def _cents(col) -> "F.Column":
    """Exact int64 cents of a 2-decimal double column."""
    return F.round(col * 100).cast("long")


# ---------------------------------------------------------------------------
# Q3: throughput — tumbling-window event rate per label
# reference: sum(rate(kafka_consumer_kafka_messages_consumed_total[30s]))
# (dashboard :965) and the app-level 10 s window count (kafka_consumer.py:119-124)
# ---------------------------------------------------------------------------

def windowed_throughput(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "30 seconds").alias("w"), "event_type")
        .agg(F.count("*").alias("events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "events",
            F.round(F.col("events") / F.lit(30.0), 6).alias("rate_per_sec"),
        )
    )


# ---------------------------------------------------------------------------
# Q3 sliding: 30 s window sliding by 5 s (PromQL rate() evaluated each scrape)
# ---------------------------------------------------------------------------

def sliding_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "30 seconds", "5 seconds").alias("w"))
        .agg(F.count("*").alias("events"))
        .select(
            F.col("w.start").alias("window_start"),
            "events",
            F.round(F.col("events") / F.lit(30.0), 6).alias("rate_per_sec"),
        )
    )


# ---------------------------------------------------------------------------
# Q4: consumer lag — max gauge per label
# reference: max(kafka_consumer_kafka_consumer_lag) (dashboard :855),
# computed as now - last_message_time (kafka_consumer.py:167-174).
# Deterministic variant: "now" = global max event time.
# ---------------------------------------------------------------------------

def consumer_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    per_type = ev.groupBy("event_type").agg(F.max("ts").alias("last_ts"))
    now = ev.agg(F.max("ts").alias("now_ts"))
    return (
        per_type.crossJoin(F.broadcast(now))
        .select(
            "event_type",
            F.round(
                (F.unix_micros("now_ts") - F.unix_micros("last_ts")) / F.lit(1000000.0), 6
            ).alias("lag_seconds"),
        )
    )


# ---------------------------------------------------------------------------
# Q1/Q2/Q6: p95 via Prometheus histogram_quantile over cumulative buckets.
# reference: histogram_quantile(0.95, sum by(le)(rate(..._bucket[30s])))
# (dashboard :135,:247,:743,:1455...). Exact bucket-interpolation semantics:
#   - cumulative count per le (le buckets are cumulative: value <= le)
#   - target = q * total
#   - first bucket whose cumulative >= target; linear interpolation between
#     bucket bounds; if target falls in +Inf bucket -> highest finite bound;
#     if in the first bucket -> interpolate from 0.
# Implemented as: broadcast inequality-join against a literal bucket table
# (gives cumulative counts directly), lag() window over le, interpolate.
# ---------------------------------------------------------------------------

def _histogram_quantile(
    df: DataFrame, value_col: str, label_col: str, buckets: list[float], q: float
) -> DataFrame:
    spark = df.sparkSession
    bucket_df = local_frame(spark, [(b,) for b in buckets], "le double")
    totals = df.groupBy(label_col).agg(F.count("*").alias("total"))
    # cumulative count per (label, le): every row with value <= le
    cum = (
        df.join(F.broadcast(bucket_df), F.col(value_col) <= F.col("le"))
        .groupBy(label_col, "le")
        .agg(F.count("*").alias("cum"))
    )
    return quantile_from_bucket_counts(cum, totals, label_col, buckets, q)


def quantile_from_bucket_counts(
    cum: DataFrame,
    totals: DataFrame,
    label_col: str,
    buckets: list[float],
    q: float,
) -> DataFrame:
    """PromQL histogram_quantile interpolation over pre-aggregated cumulative
    bucket counts (label, le, cum) — the query-time half of the Prometheus
    split: counters are maintained (possibly by a streaming job), the
    quantile is derived at read time from |labels| x |buckets| rows."""
    spark = cum.sparkSession
    bucket_df = local_frame(spark, [(b,) for b in buckets], "le double")
    # densify: every (label, le) pair, missing -> 0. Both sides are
    # post-aggregation (|labels| x |buckets| and |labels x le|) — broadcast
    # the probe side so no shuffle survives the aggregation.
    labels = totals.select(label_col)
    dense = (
        labels.crossJoin(F.broadcast(bucket_df))
        .join(F.broadcast(cum), [label_col, "le"], "left")
        .fillna({"cum": 0})
    )
    w = Window.partitionBy(label_col).orderBy("le")
    dense = dense.withColumn("prev_cum", F.coalesce(F.lag("cum").over(w), F.lit(0)))
    dense = dense.withColumn("prev_le", F.coalesce(F.lag("le").over(w), F.lit(0.0)))
    # totals is |labels| rows — always broadcast, never sort-merge
    j = dense.join(F.broadcast(totals), label_col).withColumn(
        "target", F.lit(q) * F.col("total")
    )
    hit = (
        j.where(F.col("cum") >= F.col("target"))
        .groupBy(label_col)
        .agg(F.min_by(F.struct("le", "prev_le", "cum", "prev_cum", "target"), "le").alias("b"))
        .select(
            label_col,
            (
                F.col("b.prev_le")
                + (F.col("b.le") - F.col("b.prev_le"))
                * (F.col("b.target") - F.col("b.prev_cum"))
                / (F.col("b.cum") - F.col("b.prev_cum"))
            ).alias("quantile_raw"),
        )
    )
    # labels whose target falls beyond the last finite bucket -> highest bound
    top = F.lit(float(buckets[-1]))
    return (
        totals.select(label_col)
        .join(F.broadcast(hit), label_col, "left")
        .select(
            label_col,
            F.round(F.coalesce(F.col("quantile_raw"), top), 6).alias(f"p{int(q * 100)}"),
        )
    )


def p95_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p95 of events.value per event_type, Prometheus bucket interpolation.

    events.value stands in for the e2e-latency observation
    (kafka_event_handler.py:357-383 in the reference); buckets widened to the
    test data's value range.
    """
    buckets = [1.0, 2.0, 5.0, 10.0, 25.0, 50.0, 100.0, 150.0, 200.0, 300.0]
    ev = _events(spark, sf_dir)
    return _histogram_quantile(ev, "value", "event_type", buckets, 0.95)


def p95_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 in its true PromQL shape: histogram_quantile evaluated PER TIME
    WINDOW per label (the dashboard recomputes the quantile at every
    evaluation step over a sliding rate window). Composite (window, label)
    key through the same exact bucket-interpolation operator; 6-hour
    tumbling windows keep the key cardinality test-sized — the plan is
    identical at 30 s."""
    buckets = [1.0, 2.0, 5.0, 10.0, 25.0, 50.0, 100.0, 150.0, 200.0, 300.0]
    ev = _events(spark, sf_dir).withColumn(
        "_lbl",
        F.concat(
            (F.floor(F.unix_seconds("ts") / 21600) * 21600).cast("string"),
            F.lit("|"),
            F.col("event_type"),
        ),
    )
    hq = _histogram_quantile(ev, "value", "_lbl", buckets, 0.95)
    parts = F.split(F.col("_lbl"), "\\|")
    return hq.select(
        F.timestamp_seconds(F.element_at(parts, 1).cast("long")).alias("window_start"),
        F.element_at(parts, 2).alias("event_type"),
        "p95",
    )


def payload_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: payload-size heatmap — cumulative bucket counts (sum by le).

    reference: sum by(le)(rate(data_synthesizer_finnhub_payload_size_bytes
    _bucket[30s])) (dashboard :605). Payload bytes = octet length of the
    serialized props JSON (P11: kafka_consumer.py:112-116).
    """
    ev = _events(spark, sf_dir).withColumn("payload_bytes", F.octet_length("props"))
    bucket_df = local_frame(spark, [(b,) for b in PAYLOAD_BUCKETS], "le double")
    return (
        ev.join(F.broadcast(bucket_df), F.col("payload_bytes") <= F.col("le"))
        .groupBy("le")
        .agg(F.count("*").alias("cum_count"))
        .select("le", "cum_count")
    )


def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization with a 30-minute inactivity gap.

    Batch spelling of ``F.session_window`` (gaps-and-islands: a new session
    starts when the gap from the previous event exceeds the threshold;
    session id = running count of session starts). The streaming form is
    ``groupBy(F.session_window("ts", "30 minutes"), "user_id")`` — same
    semantics, and this batch plan is what the oracle can check exactly.
    One shuffle on user_id; the windows are computed per-partition.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sessions = ev.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / F.lit(1_000_000.0),
            3,
        ).alias("duration_secs"),
    )


def salted_label_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 counters by label, skew-safe: two-phase salted aggregation over
    the 5-value event_type column (at production scale a handful of hot
    labels would otherwise pin whole partitions on single reducers).
    Result is identical to the direct groupBy — that's what the oracle
    checks."""
    from ssiintegrateddatapipeline_spark.functions.skew import salted_agg

    ev = _events(spark, sf_dir)
    return salted_agg(
        ev,
        keys=["event_type"],
        salt_source=F.col("event_id"),
        aggs={
            "n_events": ("event_id", "count"),
            "total_value": ("value", "sum"),
            "max_ts": ("ts", "max"),
        },
        n_salts=16,
    ).select(
        "event_type",
        "n_events",
        F.round("total_value", 4).alias("total_value"),
        "max_ts",
    )


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: one conditional-min pass
    per user (single shuffle on user_id), then a global stage-count
    aggregate. The per-user frame never materializes row-per-stage, so the
    shuffle payload is 3 timestamps per user regardless of event volume."""
    ev = _events(spark, sf_dir).where(
        F.col("event_type").isin("view", "click", "purchase")
    )
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    reached_click = F.col("first_click") > F.col("first_view")
    reached_purchase = reached_click & (F.col("first_purchase") > F.col("first_click"))
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("first_view").isNotNull(), 1).otherwise(0)).alias("stage_view"),
        F.sum(F.when(reached_click, 1).otherwise(0)).alias("stage_click"),
        F.sum(F.when(reached_purchase, 1).otherwise(0)).alias("stage_purchase"),
    )


def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, distinct
    active users per week offset. The per-user first-activity table is tiny
    relative to the event log, so it broadcasts back onto the fact side."""
    ev = _events(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(F.broadcast(first), "user_id")
        .withColumn(
            "week_offset",
            (
                (F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                 - F.unix_timestamp(F.col("cohort_week"))) / F.lit(604800)
            ).cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Gini) per market segment over per-customer
    spend — the inequality readout behind every "top-x% of customers"
    slide, from the rank form G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) with
    x sorted ascending.

    The within-segment rank is the skew-trap case (5 partition values),
    so it rides ``two_phase_grouped_row_number``: one hash exchange on a
    spend-range bucket yields BOTH ranks; only the within-segment one is
    consumed. Σ i·x accumulates as decimal(38,0) (rank times cents
    overflows int64 at warehouse row counts); the final ratio is one
    double division of two exactly-derived integers.
    """
    from ssiintegrateddatapipeline_spark.functions.twophase import (
        two_phase_grouped_row_number,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("spend_cents"))
    )
    seg_idx = F.array_position(
        F.split(F.lit(",".join(_SEGMENTS)), ","), F.col("c_mktsegment")
    ).cast("int")
    bucket = F.expr("cast(spend_cents div 50000000 as int)")
    ranked, _ = two_phase_grouped_row_number(
        spend.withColumn("gix", seg_idx),
        bucket,
        F.col("gix"),
        [F.col("spend_cents").asc(), F.col("c_custkey").asc()],
    )
    d38 = "decimal(38,0)"
    agg = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("spend_cents").cast(d38)).alias("sx"),
        F.sum(
            (F.col("group_pos").cast(d38) * F.col("spend_cents").cast(d38))
        ).alias("six"),
    )
    gini = (
        (2 * F.col("six") - (F.col("n_customers") + 1) * F.col("sx")).cast(
            "double"
        )
        / (F.col("n_customers") * F.col("sx")).cast("double")
    )
    return agg.select(
        "c_mktsegment",
        "n_customers",
        F.round(F.col("sx").cast("double") / 100.0, 2).alias("total_spend"),
        F.round(gini, 6).alias("gini"),
    )


def top_decile_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz top-decile share per market segment: what fraction of a
    segment's revenue its top 10% of customers hold — the slide-ready
    point statistic the Gini curve summarizes. Same one-exchange grouped
    two-phase rank as the Gini (ascending spend, so the top decile is the
    HIGHEST ranks: pos > n - ceil(n/10), with ceil as exact integer
    (n+9) div 10); the share is one double division of exact cent sums.
    """
    from ssiintegrateddatapipeline_spark.functions.twophase import (
        two_phase_grouped_row_number,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("spend_cents"))
    )
    seg_idx = F.array_position(
        F.split(F.lit(",".join(_SEGMENTS)), ","), F.col("c_mktsegment")
    ).cast("int")
    bucket = F.expr("cast(spend_cents div 50000000 as int)")
    ranked, _ = two_phase_grouped_row_number(
        spend.withColumn("gix", seg_idx),
        bucket,
        F.col("gix"),
        [F.col("spend_cents").asc(), F.col("c_custkey").asc()],
    )
    sizes = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("spend_cents").alias("total")
    )
    j = ranked.join(F.broadcast(sizes), "c_mktsegment")
    top_k = F.expr("(n + 9) div 10")
    in_top = F.col("group_pos") > (F.col("n") - top_k)
    agg = j.groupBy("c_mktsegment").agg(
        F.max("n").alias("n_customers"),
        F.max(top_k).alias("top_customers"),
        F.sum(F.when(in_top, F.col("spend_cents")).otherwise(0)).alias(
            "top_cents"
        ),
        F.max("total").alias("total_cents"),
    )
    return agg.select(
        "c_mktsegment",
        "n_customers",
        "top_customers",
        F.round(
            F.col("top_cents").cast("double")
            / F.col("total_cents").cast("double"),
            6,
        ).alias("top_decile_share"),
    )


def survival_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier churn curve: S(d) = Π_{d' <= d} (1 - churned_d'/at_risk_d')
    over activity-span durations, with right-censoring (users still active
    on the window's final day are censored, not churned) — the survival
    analysis a retention team runs next to the retention triangle.

    Engine shape: the per-duration life table is calendar-bounded
    (≤ span-days rows), so both global cumulative passes — at-risk
    (reverse cumulative total) and the survival product — ride
    ``two_phase_prefix_sum`` (no ``Exchange SinglePartition``). The
    product is computed as exp of a running sum of ln terms SNAPPED to an
    integer nano grid before summing: the snap makes the one libm surface
    identical in both engines, and the running sum stays exact int64.
    """
    from ssiintegrateddatapipeline_spark.functions.twophase import (
        two_phase_prefix_sum,
    )

    ev = _events(spark, sf_dir)
    pu = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("f"),
        F.max(F.date_trunc("day", "ts")).alias("l"),
    )
    gmax = pu.agg(F.max("l").alias("gmax"))
    per = pu.crossJoin(F.broadcast(gmax)).select(
        F.datediff("l", "f").alias("duration"),
        (F.col("l") < F.col("gmax")).cast("int").alias("churned"),
    )
    per_dur = per.groupBy("duration").agg(
        F.count(F.lit(1)).alias("n_total"), F.sum("churned").alias("n_churned")
    )
    total = per_dur.agg(F.sum("n_total").alias("total_users"))
    base = per_dur.crossJoin(F.broadcast(total))
    bucket = F.expr("duration div 8")
    s1 = two_phase_prefix_sum(
        base, bucket, [F.col("duration").asc()], F.col("n_total"),
        out="cum_total",
    ).withColumn(
        "n_at_risk",
        F.col("total_users") - F.col("cum_total") + F.col("n_total"),
    )
    term = F.round(
        F.log(
            F.greatest(
                F.lit(1.0) - F.col("n_churned") / F.col("n_at_risk"),
                F.lit(1e-18),
            )
        )
        * 1e9
    ).cast("long")
    s2 = two_phase_prefix_sum(
        s1.withColumn("term_nano", term),
        bucket,
        [F.col("duration").asc()],
        F.col("term_nano"),
        out="cum_nano",
    )
    return s2.select(
        "duration",
        "n_at_risk",
        "n_churned",
        F.round(F.exp(F.col("cum_nano") / 1e9), 6).alias("survival"),
    )


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on hourly event rates: per event type,
    the hour where the cumulative deviation from the series mean peaks —
    the offline form of the drift alarm that pages when a producer's rate
    regime shifts (companion to hourly_anomaly's z-scores, which flag
    single outliers; CUSUM finds sustained level changes).

    Exactness: with S_t the running count sum over t hours, n hours total
    and T the grand total, the CUSUM statistic scaled by n is
    n*S_t - t*T — pure int64 (|stat| <= n*T), so the argmax and its
    location carry no float hazard. The running sum windows over the
    HOURLY aggregate (calendar-bounded rows per type), never raw events.
    """
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("x"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hourly.select(
        "event_type",
        "hour",
        F.sum("x").over(w).alias("s"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("hour"))
        .alias("t"),
    )
    totals = hourly.groupBy("event_type").agg(
        F.sum("x").alias("total"), F.count("*").alias("n_hours")
    )
    stat = cum.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "hour",
        (F.col("n_hours") * F.col("s") - F.col("t") * F.col("total")).alias(
            "stat"
        ),
        "n_hours",
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("stat")).desc(), F.col("hour").asc()
    )
    return (
        stat.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("hour").alias("cp_hour"),
            F.abs(F.col("stat")).alias("max_abs_stat"),
            "n_hours",
        )
    )


def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: cumulative purchase revenue per
    signup cohort over cohort age, normalized per cohort user — the
    companion economics view to ``weekly_retention``'s activity triangle.

    Scale shape: the per-user first-activity dim broadcasts onto the
    purchase fact (same pattern as weekly_retention); revenue aggregates to
    exact int64 cents over (cohort_week, age_week) — a calendar-bounded
    grid (#weeks x #weeks rows) — so the cumulative window partitions by
    cohort_week over at most #calendar-weeks rows per key, never over raw
    events. ltv_per_user is one IEEE double division of exact integers
    (bit-identical across engines, no round() tie to break).
    """
    ev = _events(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    sizes = first.groupBy("cohort_week").agg(F.count("*").alias("cohort_users"))
    weekly = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(first), "user_id")
        .withColumn(
            "age_week",
            (
                (F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                 - F.unix_timestamp(F.col("cohort_week"))) / F.lit(604800)
            ).cast("int"),
        )
        .groupBy("cohort_week", "age_week")
        .agg(F.sum(_cents(F.col("value"))).alias("week_rev_cents"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        weekly.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "age_week",
            "cohort_users",
            "week_rev_cents",
            F.sum("week_rev_cents").over(w).alias("ltv_cents"),
        )
        .withColumn(
            "ltv_per_user_cents",
            F.col("ltv_cents").cast("double") / F.col("cohort_users"),
        )
    )


def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull ``k`` out of the JSON props column
    (JVM-side get_json_object, no Python), bucket by tens, aggregate."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select((F.floor(k / 10) * 10).cast("int").alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            _round_half_up_ratio(
                F.sum(_cents(F.col("value"))), F.count("*") * 100, 4
            ).alias("avg_value"),
        )
    )


def salted_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact<->dim equi-join: enrich each event with its user's
    total event count via salted_join (hot user_ids spread over 16
    reducers), then roll up per event_type. Identical to the plain join —
    the oracle checks that."""
    from ssiintegrateddatapipeline_spark.functions.skew import salted_join

    ev = _events(spark, sf_dir)
    user_dim = ev.groupBy(F.col("user_id").alias("u_key")).agg(
        F.count("*").alias("user_total")
    )
    enriched = salted_join(
        ev.withColumn("u_key", F.col("user_id")),
        user_dim,
        key="u_key",
        left_salt_source=F.col("event_id"),
    )
    return enriched.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        _round_half_up_ratio(
            F.sum("user_total"), F.count("*"), 6
        ).alias("avg_user_total"),
        F.max("user_total").alias("max_user_total"),
    )


def p95_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approximate fast path for Q1/Q2-style quantiles:
    ``approx_percentile`` (Greenwald-Khanna sketch, JVM-side, single pass,
    mergeable partials). The sketch value itself is engine-specific, so the
    oracle pins the CONTRACT instead: the sketch p95 must land between the
    exact p94 and p96 (far looser than GK's 1e-4 rank guarantee) — the
    oracle asserts `within_bound` true, so a sketch regression becomes a
    hash mismatch."""
    ev = _events(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.95).alias("sketch"),
        F.percentile("value", F.lit(0.94)).alias("lo"),
        F.percentile("value", F.lit(0.96)).alias("hi"),
        F.count("*").alias("n_events"),
    )
    return agg.select(
        "event_type",
        "n_events",
        ((F.col("sketch") >= F.col("lo")) & (F.col("sketch") <= F.col("hi"))).alias(
            "within_bound"
        ),
    )


def user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trend fit: slope/correlation of event value over time via
    the built-in regression aggregates (single-pass, mergeable partials —
    distributed least-squares without any Python). Users with constant x
    or y yield null corr; slope is value-units per DAY since 2024-01-01 —
    centering x near zero avoids the catastrophic cancellation that makes
    single-pass covariance diverge between engines when x carries a large
    epoch offset."""
    ev = _events(spark, sf_dir)
    x_days = (F.unix_micros("ts") / F.lit(1e6) - F.lit(1704067200.0)) / F.lit(86400.0)
    y = F.col("value")
    # slope from explicit sums — engines' built-in regr_slope kernels
    # differ at ~1e-6; the closed form over plain SUMs is reproducible
    # bit-for-bit modulo summation order (invisible at round-6 with
    # centered x).
    agg = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.corr(x_days, y), 6).alias("value_time_corr"),
        F.sum(x_days).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x_days * y).alias("sxy"),
        F.sum(x_days * x_days).alias("sxx"),
    )
    n = F.col("n_events")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        "user_id",
        "n_events",
        "value_time_corr",
        F.round(slope, 6).alias("value_per_day"),
    )


def p50_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median per label: Spark's ``percentile`` and
    DuckDB's ``quantile_cont`` share the same sorted-interpolation
    definition, so this hash-matches without bucket emulation. Exact
    quantiles need the full sorted group — the expensive path reserved for
    small label cardinalities; the sketch (p95_approx) and bucket
    (p95_histogram) variants are the scale paths."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 6).alias("p50"),
        F.count("*").alias("n_events"),
    )


HH_TURNOVER_K = 20  # top-k set size for the turnover report
HH_TURNOVER_SALTS = 64  # first-level fanout of the two-level exact top-k


def heavy_hitter_turnover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter CHURN: the top-k users by event count in the first
    half of the time range vs the second half — who entered, who exited,
    and the Jaccard overlap of the two sets. The drift monitors (KS/PSI)
    grade distribution shift; this grades IDENTITY shift, the signal a
    pipeline watches for traffic-mix changes (a crawler cohort replacing
    an organic one leaves the volume histogram intact).

    Determinism: the split point is the integer midpoint of unix-micros
    (1-row census broadcast, the bounded-fanout idiom); top-k ranks
    break ties on user_id. Scale: per-(half, user) counts reduce
    map-side; the top-k is the repo's TWO-LEVEL exact device (a window
    over only 2 half-keys is a 2-task skew trap at corpus scale — the
    per-(half, salt) local top-k cuts the rank input to 2 x SALTS x k
    rows first). The set comparison is k-row vs k-row."""
    ev = _events(spark, sf_dir).select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    # integer midpoint (div, not float-divide-then-cast: Spark's long
    # cast truncates where DuckDB's rounds — div sidesteps the tie)
    span = ev.agg(F.min("us").alias("lo"), F.max("us").alias("hi")).select(
        F.expr("(lo + hi) div 2").alias("mid")
    )
    counts = (
        ev.crossJoin(F.broadcast(span))
        .select((F.col("us") <= F.col("mid")).alias("h1"), "user_id")
        .groupBy("h1", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from ssiintegrateddatapipeline_spark.functions.topk import two_level_topk

    top = two_level_topk(
        counts,
        keys=["h1"],
        order=[F.col("cnt").desc(), F.col("user_id")],
        k=HH_TURNOVER_K,
        salt=F.col("user_id"),
        n_salts=HH_TURNOVER_SALTS,
    )
    # set comparison as ONE tiny aggregation (a full-outer join of the
    # two k-row sets cannot broadcast and would sort-merge)
    flags = top.groupBy("user_id").agg(
        F.max(F.col("h1").cast("int")).alias("in1"),
        F.max((~F.col("h1")).cast("int")).alias("in2"),
    )
    return (
        flags.agg(
            F.sum(
                ((F.col("in1") == 1) & (F.col("in2") == 1)).cast("long")
            ).alias("n_stayed"),
            F.sum(
                ((F.col("in1") == 0) & (F.col("in2") == 1)).cast("long")
            ).alias("n_entered"),
            F.sum(
                ((F.col("in1") == 1) & (F.col("in2") == 0)).cast("long")
            ).alias("n_exited"),
        )
        .select(
            "n_stayed",
            "n_entered",
            "n_exited",
            F.round(
                F.col("n_stayed")
                / (F.col("n_stayed") + F.col("n_entered") + F.col("n_exited")),
                6,
            ).alias("jaccard"),
        )
    )


def trimmed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type means: 5% two-sided TRIMMED mean (drop everything
    outside [p5, p95]) and WINSORIZED mean (clamp to the same bounds) —
    the standard outlier-robust location estimates next to the MAD
    outlier report. Exact-parity device: values go to integer cents, the
    interpolated p5/p95 come from the same sorted-quantile definition in
    both engines (`percentile` == `quantile_cont`, the p50_exact
    precedent), the inside-the-bounds sum stays a BIGINT, and the
    winsorized total is that integer plus count-below x p5 + count-above
    x p95 (double x integer — one deterministic product per side, never
    a float sum over clamped rows). One quantile pass + one broadcast
    join + one aggregation; no per-row rank, no few-keys window skew."""
    ev = _events(spark, sf_dir).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("vc")
    )
    q = ev.groupBy("event_type").agg(
        F.percentile("vc", 0.05).alias("p05"),
        F.percentile("vc", 0.95).alias("p95"),
        F.count(F.lit(1)).alias("n_events"),
    )
    j = ev.join(F.broadcast(q), "event_type")
    inside = (F.col("vc") >= F.col("p05")) & (F.col("vc") <= F.col("p95"))
    agg = j.groupBy("event_type", "p05", "p95", "n_events").agg(
        F.sum(F.when(inside, F.col("vc")).otherwise(F.lit(0))).alias("s_in"),
        F.sum(inside.cast("long")).alias("n_in"),
        F.sum((F.col("vc") < F.col("p05")).cast("long")).alias("n_lo"),
        F.sum((F.col("vc") > F.col("p95")).cast("long")).alias("n_hi"),
    )
    return agg.select(
        "event_type",
        "n_events",
        F.round(F.col("s_in") / (100.0 * F.col("n_in")), 6).alias(
            "trimmed_mean"
        ),
        F.round(
            (
                F.col("s_in")
                + F.col("n_lo") * F.col("p05")
                + F.col("n_hi") * F.col("p95")
            )
            / (100.0 * F.col("n_events")),
            6,
        ).alias("winsorized_mean"),
    )


def zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score normalization, fully JVM-side: ``avg``/``stddev_pop``
    over ``Window.partitionBy("user_id")`` standardizes each value against
    its group's population moments without ever crossing the Python
    boundary. The window form streams each partition's rows instead of
    materializing whole groups as Arrow batches, so a skewed user is just a
    large sorted run — not a single oversized Python worker allocation —
    which is what survives a 100 TB skewed key."""
    w = Window.partitionBy("user_id")
    ev = _events(spark, sf_dir).select("user_id", "event_id", "value")
    mean = F.avg("value").over(w)
    std = F.stddev_pop("value").over(w)
    z = F.when(std > 0, (F.col("value") - mean) / std).otherwise(F.lit(0.0))
    return ev.select("user_id", "event_id", F.round(z, 6).alias("zscore"))


# ---------------------------------------------------------------------------
# Multi-granularity time rollup (the "hypertable continuous aggregate"
# shape): minute/hour/day totals in ONE grouped pass via ROLLUP over the
# truncation hierarchy — map-side partials cover every grain, no re-scan
# per granularity. At 100 TB this replaces three separate jobs with one.
# ---------------------------------------------------------------------------

def multigrain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    bucketed = ev.select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        F.date_trunc("minute", "ts").alias("minute"),
        "value",
    )
    grain = (
        F.when(F.grouping_id() == 0, "minute")
        .when(F.grouping_id() == 1, "hour")
        .when(F.grouping_id() == 3, "day")
        .otherwise("all")
    )
    return (
        bucketed.rollup("day", "hour", "minute")
        .agg(
            F.count("*").alias("events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            grain.alias("grain"),
        )
        .select(
            "grain",
            F.coalesce("minute", "hour", "day").alias("bucket_ts"),
            "events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot — the reshape pair. Pivot lists its spine values
# explicitly so Spark skips the extra distinct-collect pass; unpivot is
# `stack` over a single wide aggregate row (one scan for all measures).
# ---------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    wide = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "day", *[F.coalesce(t, F.lit(0)).alias(t) for t in EVENT_TYPES]
    )


def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.agg(
        F.round(F.sum("l_quantity"), 2).alias("quantity"),
        F.round(F.sum("l_extendedprice"), 2).alias("extendedprice"),
        F.round(F.sum("l_discount"), 2).alias("discount"),
    )
    return wide.selectExpr(
        "stack(3, 'quantity', quantity, 'extendedprice', extendedprice, "
        "'discount', discount) AS (measure, total)"
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-active-day streak per user.
# date - row_number() is constant within a run of consecutive days, so one
# window + one groupBy finds every streak; a second window over the tiny
# per-streak rows picks each user's best. Both windows partition on
# user_id — a single shuffle, one sort reused.
# ---------------------------------------------------------------------------

def user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn("anchor", F.date_sub("d", F.row_number().over(w)))
    streaks = islands.groupBy("user_id", "anchor").agg(
        F.count("*").alias("streak_len"),
        F.min("d").alias("streak_start"),
        F.max("d").alias("streak_end"),
    )
    w_best = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), F.col("streak_start").asc()
    )
    w_user = Window.partitionBy("user_id")
    return (
        streaks.withColumn("rn", F.row_number().over(w_best))
        .withColumn("n_active_days", F.sum("streak_len").over(w_user))
        .where(F.col("rn") == 1)
        .select("user_id", "n_active_days", F.col("streak_len").alias("best_streak"),
                "streak_start", "streak_end")
    )


# ---------------------------------------------------------------------------
# Trailing (rolling) window over event time: per-user 1-hour moving
# average via a RANGE frame on the epoch — one shuffle on user_id, one
# sort; the frame is computed incrementally during the sort sweep (no
# per-row re-scan). Bounded to user_id < 30 to keep the audit output
# small; the plan is identical unbounded.
# ---------------------------------------------------------------------------

def rolling_hourly_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).where(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        _round_half_up_ratio(
            F.sum(_cents(F.col("value"))).over(w),
            F.count("value").over(w) * 100,
            4,
        ).alias("trailing_1h_avg"),
        F.count("value").over(w).alias("trailing_1h_n"),
    )


def spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) customer segmentation by lifetime spend. The sort key is
    (cents, custkey) — rounding to exact cent multiples first makes the
    total order engine-independent (raw double sums can differ in the last
    ulp and flip near-ties).

    Scale shape: the ntile is two-phase ranked (functions/twophase.py):
    customers range-bucket on approx-quantile spend boundaries (monotone
    along the DESC order), rank in parallel inside buckets, and the exact
    ANSI ntile bucket falls out of the global rank plus two plan-time
    literals (row count, tile cuts). No single-partition exchange; the
    quantile sketch only steers placement, never results.
    """
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("spend")
    )
    bucket = quantile_buckets(spend, F.col("spend"), descending=True)
    ranked, n = two_phase_row_number(
        spend, bucket, [F.col("spend").desc(), F.col("o_custkey")], out="rank"
    )
    tiles = ranked.withColumn("quartile", ntile_from_rank(F.col("rank"), n, 4))
    return tiles.groupBy("quartile").agg(
        F.count("*").alias("n_customers"),
        F.min("spend").alias("min_spend"),
        F.max("spend").alias("max_spend"),
    )


# ---------------------------------------------------------------------------
# Sequence analytics: per-user event-type transitions (the Markov-chain /
# path-analysis shape). One window over user_id (single shuffle), then a
# tiny groupBy on (from, to) pairs — transition cardinality is |types|²
# regardless of data volume, so the final agg is always small.
# ---------------------------------------------------------------------------

def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    total = Window.partitionBy("from_type")
    return (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count("*").alias("transitions"))
        .withColumn(
            "p_transition",
            F.round(F.col("transitions") / F.sum("transitions").over(total), 6),
        )
    )


MARKOV_STEPS = 4  # k-step-ahead horizon for the fitted chain


def markov_kstep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-step-ahead event-type distribution under the fitted first-order
    Markov chain — the forecasting twin of `event_transitions`: fit
    P(to|from) from consecutive user events, take the start distribution
    (each user's FIRST event type), and push it through the chain
    MARKOV_STEPS times. The per-type delta between p_start and p_after_k
    is what journey-attribution and mix-forecast dashboards read.

    Determinism: transition probs are exact integer-ratio doubles; each
    step's vector entry is a sum of <= |types| products snapped at 12
    decimals (the repo's libm/fold discipline), so every step's input is
    bit-identical in both engines; final report rounds at 6. Scale: the
    only corpus-sized work is the lag window (keyed by user — even
    shuffle) and the first-event argmin; every chain step is a join over
    a <= |types|^2-row matrix."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("f"),
        F.col("event_type").alias("t"),
    ).where(F.col("f").isNotNull())
    by_from = Window.partitionBy("f")
    P = (
        pairs.groupBy("f", "t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "f", "t", (F.col("cnt") / F.sum("cnt").over(by_from)).alias("p")
        )
    )
    firsts = ev.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id", "event_type")).alias("s")
    )
    n_users = firsts.agg(F.count(F.lit(1)).alias("n"))
    p0 = (
        firsts.groupBy(F.col("s.event_type").alias("t"))
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(n_users))
        .select("t", (F.col("c") / F.col("n")).alias("p"))
    )
    vec = p0
    for k in range(MARKOV_STEPS):
        m = P.alias(f"m{k}")  # fresh alias per step: P appears K times
        # broadcast pinned: P is <= |types|^2 rows by construction, but
        # its SIZE ESTIMATE inherits the corpus-scale lag-window input,
        # so at 30x data AQE planned the chain joins as SMJs (30x probe
        # caught 4 of them) — the hint keeps every step a BHJ at any SF
        vec = (
            vec.join(F.broadcast(m), vec["t"] == F.col(f"m{k}.f"))
            .groupBy(F.col(f"m{k}.t"))
            .agg(F.round(F.sum(vec["p"] * F.col(f"m{k}.p")), 12).alias("p"))
        )
    # align the two tiny vectors by union+aggregate (a full-outer join
    # cannot broadcast and would sort-merge over |types| rows)
    tagged = p0.select(
        "t", F.col("p").alias("ps"), F.lit(0.0).alias("pk")
    ).unionByName(vec.select("t", F.lit(0.0).alias("ps"), F.col("p").alias("pk")))
    return tagged.groupBy("t").agg(
        F.round(F.sum("ps"), 6).alias("p_start"),
        F.round(F.sum("pk"), 6).alias("p_after_k"),
    ).select(
        F.col("t").alias("event_type"), "p_start", "p_after_k"
    )


def conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→first-purchase latency distribution: exact interpolated
    p50/p90/p99 per cohort-free population, plus counts. Two conditional
    mins per user (one shuffle) feed a single multi-quantile aggregate —
    `F.percentile` with an array argument computes all three cut points
    in one pass (identical semantics to SQL quantile_cont)."""
    ev = _events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("signup_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase_ts"
        ),
    )
    lat = firsts.where(
        F.col("signup_ts").isNotNull()
        & (F.col("first_purchase_ts") > F.col("signup_ts"))
    ).select(
        (
            (F.unix_micros("first_purchase_ts") - F.unix_micros("signup_ts"))
            / F.lit(1_000_000.0)
        ).alias("latency_secs")
    )
    return lat.agg(
        F.count("*").alias("n_converted"),
        F.round(F.percentile("latency_secs", F.lit(0.5)), 3).alias("p50_secs"),
        F.round(F.percentile("latency_secs", F.lit(0.9)), 3).alias("p90_secs"),
        F.round(F.percentile("latency_secs", F.lit(0.99)), 3).alias("p99_secs"),
    )


def cdc_latest_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins compaction (the CDC upsert / log-compaction shape):
    each user's most recent event, picked with max_by over a total order
    (ts, then event_id as the deterministic tie-break) — a single
    aggregation, no window sort over the full table."""
    ev = _events(spark, sf_dir)
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.max_by(F.col("event_id"), ordkey).alias("last_event_id"),
        F.max_by(F.col("event_type"), ordkey).alias("last_event_type"),
        F.max_by(F.col("value"), ordkey).alias("last_value"),
        F.max("ts").alias("last_ts"),
    )


def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-skew diagnosis for a prospective shuffle key: the top-5
    heaviest user_ids with their share of all rows, plus the heavy-hitter
    share a salting decision would be based on."""
    ev = _events(spark, sf_dir)
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    # top-5 as TakeOrderedAndProject (partial per-partition top-k, then a
    # 5-row merge on the driver) — not an unpartitioned row_number window
    # sorting every per-user count in one task. The total for the share
    # column is a scalar aggregate broadcast into the 5-row result; the
    # rank window that remains runs over the post-limit 5 rows only.
    top = counts.orderBy(F.col("n").desc(), F.col("user_id")).limit(5)
    tot = counts.agg(F.sum("n").alias("total_n"))
    w = Window.orderBy(F.col("n").desc(), F.col("user_id"))
    return (
        top.crossJoin(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(w))
        .withColumn("share_pct", F.round(F.col("n") * 100.0 / F.col("total_n"), 4))
        .select("rank", "user_id", "n", "share_pct")
    )


def gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: a dense hourly spine per event_type
    (generated with `sequence`, no driver loop), hourly counts left-joined
    onto it, missing hours zero-filled, and the hourly average value
    forward-filled with `last(..., ignorenulls)` over an ordered window.

    Scale shape: the spine is |types| × hours — tiny next to the fact table —
    so the join broadcasts the spine side after the one groupBy shuffle; the
    fill window partitions by event_type, which is exactly the spine layout.
    """
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        _round_half_up_ratio(
            F.sum(_cents(F.col("value"))), F.count("*") * 100, 6
        ).alias("avg_value"),
    )
    spine = (
        ev.groupBy("event_type")
        .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.date_trunc("hour", F.col("mn")),
                    F.date_trunc("hour", F.col("mx")),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(hourly, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).alias("events"),
        F.col("n").isNull().alias("is_gap"),
        F.last("avg_value", ignorenulls=True).over(w).alias("avg_value_filled"),
    )


MAD_K = 1.4826  # normal-consistency constant
MAD_THRESHOLD = 3.0

EWMA_WINDOW = 8
EWMA_DECAY = 0.5  # dyadic: every weight is an exact power of two


def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per event_type: median absolute deviation
    (MAD) with the 1.4826 normal-consistency factor, counting values beyond
    3 robust sigmas — the outlier gate quality pipelines prefer over
    mean/stddev because a contaminated tail can't drag the threshold.

    Three passes over the fact table, but the intermediate per-type stats are
    tiny and broadcast back, so each pass is a scan + map-side join + one
    agg; the exact interpolated `percentile` keeps engine parity (validated
    by the p50 family).
    """
    ev = _events(spark, sf_dir)
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("med").alias("med"),
            F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias("mad"),
        )
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("med"), 6).alias("median_value"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.count("*").alias("n_events"),
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > F.lit(MAD_THRESHOLD * MAD_K) * F.col("mad")
                ).cast("long")
            ).alias("n_outliers"),
        )
    )


def ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average per event_type
    (decay 0.5, last 8 observations), the standard smoothing pass before
    trend/anomaly logic.

    EWMA is a sequential recurrence, but truncating to a fixed window makes
    it a windowed weighted mean — expressible as `collect_list` over a ROWS
    frame folded with higher-order array functions, all JVM-side, one
    shuffle (the window partition). The 0.5 decay keeps every weight an
    exact power of two, so the weighted sum is bit-identical across engines.
    """
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_WINDOW - 1), 0)
    )
    lst = F.collect_list("value").over(w)
    with_l = ev.select("event_id", "event_type", "ts", lst.alias("l"))
    n = F.size("l")
    weighted = F.zip_with(
        F.col("l"),
        F.sequence(F.lit(1), n),
        lambda v, i: v * F.pow(F.lit(EWMA_DECAY), (n - i).cast("double")),
    )
    num = F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)
    den = F.lit(2.0) - F.pow(F.lit(EWMA_DECAY), (n - 1).cast("double"))
    return with_l.select(
        "event_id",
        "event_type",
        F.round(num / den, 6).alias("ewma_value"),
    )


MV_CUTOVER = "2001-01-01"  # the simulated "already materialized up to" date


def incremental_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a monthly-revenue MV kept
    as mergeable partials (SUM/COUNT), refreshed by aggregating only the
    delta partition (orders >= the cutover date) and merging it into the
    stored state with a second SUM — never rescanning history.

    The contract that matters at 100 TB: the merged result must equal a
    full recompute exactly, which is what the oracle checks (it recomputes
    from scratch). Partial-agg merge works because SUM/COUNT are commutative
    monoids; AVG-style measures are derived at read time from the partials.
    On a real deployment `state` is the stored MV table and only `delta` is
    computed per refresh — one partition scan + a tiny merge shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
            "o_orderpriority",
        ).agg(F.sum("o_totalprice").alias("rev"), F.count("*").alias("n"))

    state = partials(orders.where(F.col("o_orderdate") < MV_CUTOVER))
    delta = partials(orders.where(F.col("o_orderdate") >= MV_CUTOVER))
    return (
        state.unionByName(delta)
        .groupBy("month", "o_orderpriority")
        .agg(F.sum("rev").alias("rev"), F.sum("n").alias("n_orders"))
        .select(
            "month",
            "o_orderpriority",
            F.round("rev", 2).alias("revenue"),
            "n_orders",
        )
    )


N_DECILES = 10


def revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period comparison: monthly order revenue with previous
    month, absolute delta, and percent growth — the lag-window warehouse
    staple. Growth is computed from the ALREADY-ROUNDED monthly sums (both
    engines see identical cents), so the derived ratio is deterministic.
    One aggregation shuffle; the lag window rides the same partitioning.
    """
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        F.round(F.col("revenue") - prev, 2).alias("delta"),
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias("growth_pct"),
    )


def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of event values per type: exact
    interpolated decile boundaries from one `percentile(array)` pass —
    the complement of the fixed-bucket (equi-width) Prometheus histograms,
    and the statistic that drives range-partitioning choices at scale
    (equal-row splits, not equal-width splits).
    """
    ev = _events(spark, sf_dir)
    cuts = [i / N_DECILES for i in range(1, N_DECILES)]
    per_type = ev.groupBy("event_type").agg(
        F.percentile("value", F.array(*[F.lit(c) for c in cuts])).alias("bounds"),
        F.count("*").alias("n_events"),
    )
    return per_type.select(
        "event_type",
        "n_events",
        F.posexplode("bounds"),
    ).select(
        "event_type",
        "n_events",
        (F.col("pos") + 1).cast("long").alias("decile"),
        F.round("col", 6).alias("upper_bound"),
    )


KS_TYPE_A, KS_TYPE_B = "click", "purchase"


def ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the `value`
    distributions of two event types — the standard distribution-drift
    test a data pipeline runs between snapshots or between a reference
    and a live feed. Exact, not sketched: counts per distinct value (one
    hash agg), cumulative sums over the ordered distinct-value table, max
    gap between the two empirical CDFs. The ordered window runs over the
    DISTINCT values only — bounded for any discretized metric — so the
    single-partition sort is a read-time footnote, not a data-scale sort;
    every ratio is exact-integer / exact-integer, bit-identical anywhere.
    """
    ev = _events(spark, sf_dir)
    v = ev.where(F.col("event_type").isin(KS_TYPE_A, KS_TYPE_B)).select(
        "value",
        (F.col("event_type") == KS_TYPE_A).cast("long").alias("ia"),
        (F.col("event_type") == KS_TYPE_B).cast("long").alias("ib"),
    )
    per_val = v.groupBy("value").agg(F.sum("ia").alias("ca"), F.sum("ib").alias("cb"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_val.select(
        F.sum("ca").over(w).alias("cuma"), F.sum("cb").over(w).alias("cumb")
    )
    tot = v.agg(F.sum("ia").alias("na"), F.sum("ib").alias("nb"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.round(
                F.max(
                    F.abs(F.col("cuma") / F.col("na") - F.col("cumb") / F.col("nb"))
                ),
                6,
            ).alias("ks_stat")
        )
        .select(
            F.col("na").alias("n_a"), F.col("nb").alias("n_b"), "ks_stat"
        )
    )


PSI_BIN_W = 25.0  # equi-width value bins for the stability index
PSI_MAX_BIN = 12  # values above 300 collapse into the top bin
_PSI_NBINS = PSI_MAX_BIN + 1


def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the same two event-type value
    distributions the KS test compares — the binned, magnitude-weighted
    drift score model-monitoring pipelines page on (PSI > 0.2 = retrain).
    Fixed equi-width bins (floor(value/25), capped) with Laplace 0.5
    smoothing so empty bins stay defined; one hash agg over (bin) with
    both types' counts as conditional sums — same single-pass shape as the
    KS CDF, but no ordered window at all, so it scales as a pure
    map-side-combined aggregation.
    """
    ev = _events(spark, sf_dir)
    v = ev.where(F.col("event_type").isin(KS_TYPE_A, KS_TYPE_B)).select(
        F.least(F.floor(F.col("value") / PSI_BIN_W), F.lit(PSI_MAX_BIN)).alias("bin"),
        (F.col("event_type") == KS_TYPE_A).cast("long").alias("ia"),
        (F.col("event_type") == KS_TYPE_B).cast("long").alias("ib"),
    )
    per_bin = v.groupBy("bin").agg(F.sum("ia").alias("ca"), F.sum("ib").alias("cb"))
    tot = v.agg(F.sum("ia").alias("na"), F.sum("ib").alias("nb"))
    pa = (F.col("ca") + 0.5) / (F.col("na") + 0.5 * _PSI_NBINS)
    pb = (F.col("cb") + 0.5) / (F.col("nb") + 0.5 * _PSI_NBINS)
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.count("*").alias("n_bins"),
            F.round(F.sum((pa - pb) * F.log(pa / pb)), 6).alias("psi"),
        )
        .select(
            F.col("na").alias("n_a"), F.col("nb").alias("n_b"), "n_bins", "psi"
        )
    )


def ks_drift_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned-ECDF two-sample KS — the scale path for :func:`ks_drift`
    when the metric is continuous (unbounded distinct values): both CDFs
    are evaluated only at the fixed psi_drift bin edges, so the whole
    statistic is ONE scalar aggregation of 2×(bins−1) conditional
    cumulative counts plus a `greatest` over the literal gap expressions
    — no ordered window, no distinct-value table, fully map-side
    combinable at any scale. The binned statistic lower-bounds the exact
    KS (resolution = one bin width); every ratio is exact-integer /
    exact-integer so the value is bit-identical across engines.
    """
    ev = _events(spark, sf_dir)
    v = ev.where(F.col("event_type").isin(KS_TYPE_A, KS_TYPE_B)).select(
        F.least(F.floor(F.col("value") / PSI_BIN_W), F.lit(PSI_MAX_BIN)).alias("bin"),
        (F.col("event_type") == KS_TYPE_A).cast("long").alias("ia"),
        (F.col("event_type") == KS_TYPE_B).cast("long").alias("ib"),
    )
    aggs = [F.sum("ia").alias("na"), F.sum("ib").alias("nb")]
    for k in range(_PSI_NBINS - 1):  # CDF gap at the top edge is always 0
        aggs.append(
            F.sum(F.when(F.col("bin") <= k, F.col("ia")).otherwise(0)).alias(f"ca{k}")
        )
        aggs.append(
            F.sum(F.when(F.col("bin") <= k, F.col("ib")).otherwise(0)).alias(f"cb{k}")
        )
    row = v.agg(*aggs)
    gaps = [
        F.abs(F.col(f"ca{k}") / F.col("na") - F.col(f"cb{k}") / F.col("nb"))
        for k in range(_PSI_NBINS - 1)
    ]
    return row.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(F.greatest(*gaps), 6).alias("ks_stat_binned"),
    )


# generated SQL mirrors of ks_drift_binned's conditional cumulative sums
_KS_BINNED_CUMS = ",\n".join(
    f"sum(CASE WHEN bin <= {k} THEN ia ELSE 0 END) AS ca{k},"
    f" sum(CASE WHEN bin <= {k} THEN ib ELSE 0 END) AS cb{k}"
    for k in range(_PSI_NBINS - 1)
)
_KS_BINNED_GAPS = ",\n".join(
    f"abs(ca{k} / na - cb{k} / nb)" for k in range(_PSI_NBINS - 1)
)


SPIKE_HI, SPIKE_LO = 1.5, 0.5  # hour flagged when count strays 50% off baseline


def hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly flags: per (event_type, hour-of-day) event
    counts vs the type's flat 24-hour baseline; hours running >50% hot or
    cold are flagged. The ratio is count·24/total — all-integer until one
    exact division — so the flags are bit-deterministic; one hash agg plus
    a broadcast of the per-type totals (|types| rows).
    """
    ev = _events(spark, sf_dir)
    hod = ev.select("event_type", F.hour("ts").alias("hod"))
    per_hour = hod.groupBy("event_type", "hod").agg(F.count("*").alias("n"))
    totals = hod.groupBy("event_type").agg(F.count("*").alias("total"))
    ratio = (F.col("n") * 24) / F.col("total")
    return (
        per_hour.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "hod",
            "n",
            F.round(ratio, 6).alias("vs_baseline"),
            ((ratio > SPIKE_HI) | (ratio < SPIKE_LO)).alias("is_anomalous"),
        )
    )


MIN_BASKET_SUPPORT = 2  # pairs must co-occur in >= 2 orders


def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-occurrence (market-basket) pairs: parts ordered together,
    with lift against independence. The scale shape: distinct the basket
    first (one shuffle on l_orderkey), self-join WITHIN the order key — the
    shuffle is on the basket id, so pair blow-up is bounded by
    sum(|basket|²) not n²; per-part totals and the basket count are
    post-aggregation scalars/dims, broadcast back so scoring never
    reshuffles the pair table. All-integer arithmetic until one final
    division keeps lift bit-identical across engines.
    """
    # NOTE no .distinct() before the groupBy (round 12): collect_set is
    # duplicate-agnostic, and Catalyst's RemoveRedundantAggregates was
    # already deleting the pre-distinct from the physical plan (verified:
    # byte-identical plans with and without it — plans/r12/). Dropped in
    # source so the code says what the engine actually runs; one fact
    # exchange either way.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    # one shuffle assembles each basket as a sorted in-row array; the i<j
    # pair combinations are generated by pure expressions (transform over
    # the tail slice per element, flattened) — no self-join, no second
    # shuffle of the fact table, and the blow-up is bounded in-row by
    # |basket|² instead of materializing a join
    # persist: every downstream aggregate (pairs, per-part totals, basket
    # count) derives from this one table, so the fact is shuffled ONCE
    baskets = track(
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .persist()
    )
    combos = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + 2, F.size(F.col("parts"))),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    pair_counts = (
        baskets.select(F.explode(combos).alias("p"))
        .groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") >= MIN_BASKET_SUPPORT)
    )
    per_part = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n_part"))
    )
    total = baskets.agg(F.count("*").alias("n_total"))
    pa = per_part.select(F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a"))
    pb = per_part.select(F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b"))
    return (
        pair_counts.join(F.broadcast(pa), "part_a")
        .join(F.broadcast(pb), "part_b")
        .crossJoin(F.broadcast(total))
        .select(
            "part_a",
            "part_b",
            "n_orders",
            F.round(
                (F.col("n_orders") * F.col("n_total")) / (F.col("n_a") * F.col("n_b")), 6
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling distinct users (DAU / trailing-7-day WAU): the canonical active-user
# metric. COUNT(DISTINCT) doesn't slide incrementally, so the scale-correct
# plan is: (1) dedup events to one row per (day, user) — one shuffle whose
# output is bounded by |users|×|days| regardless of event volume; (2) join
# the tiny day spine (broadcast, |days| rows) against the dedup'd table with
# a 7-day range predicate — a 7× fan-out of an already-small table; (3) count
# distinct users per spine day. At 100 TB of events, step 1 does all the
# heavy lifting and partial-aggregates map-side before shuffling.
# ---------------------------------------------------------------------------

def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free calendar spine: sequence(min(d), max(d)) covers every
    calendar day in the observed range, so a zero-event day still emits a
    row (dau=0, and its trailing-7d WAU from the left join). The oracle
    builds the same spine with generate_series."""
    ev = _events(spark, sf_dir)
    day_users = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    return _rolling_distinct_from(day_users)


def _rolling_distinct_from(day_users: DataFrame) -> DataFrame:
    """DAU/WAU over a deduplicated (d: date, user_id) table, calendar spine."""
    spine = (
        day_users.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    joined = F.broadcast(spine).join(
        day_users,
        (F.col("d") <= F.col("day")) & (F.col("d") >= F.date_sub(F.col("day"), 6)),
        "left",
    )
    return joined.groupBy("day").agg(
        F.countDistinct(F.when(F.col("d") == F.col("day"), F.col("user_id"))).alias(
            "dau"
        ),
        F.countDistinct("user_id").alias("wau_trailing_7d"),
    )


# ---------------------------------------------------------------------------
# Mergeable distinct-count rollup (the theta/roaring-sketch warehouse
# pattern): distinct users at day, week, month, and grand-total grain, where
# every grain ABOVE day is computed by merging the per-day partials — the
# fact table is scanned exactly once. The partial here is the exact form (a
# deduplicated user-id set per day); at 100 TB the partial swaps for a
# fixed-size mergeable sketch (Spark's hll_sketch_agg at day grain,
# hll_union_agg for the merges — same two-level plan shape, O(kB) per
# bucket instead of O(distinct)); tests/test_sketch_rollup.py drives that
# HLL path and checks it against this exact form within the sketch's error
# bound. Weeks can straddle month boundaries, so month merges from DAY
# partials, not week partials (merging is only valid down a true
# containment hierarchy); the grand total merges the month partials.
# ---------------------------------------------------------------------------

def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    daily = track(
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.collect_set("user_id").alias("users"))
        .persist()
    )
    merged_size = F.size(F.array_distinct(F.flatten(F.collect_list("users"))))

    day_rows = daily.select(
        F.lit("day").alias("grain"),
        F.col("day").alias("bucket_ts"),
        F.size("users").cast("long").alias("distinct_users"),
    )
    week_rows = daily.groupBy(F.date_trunc("week", "day").alias("bucket_ts")).agg(
        merged_size.cast("long").alias("distinct_users")
    ).select(F.lit("week").alias("grain"), "bucket_ts", "distinct_users")
    month = daily.groupBy(F.date_trunc("month", "day").alias("bucket_ts")).agg(
        F.array_distinct(F.flatten(F.collect_list("users"))).alias("users")
    )
    month_rows = month.select(
        F.lit("month").alias("grain"),
        "bucket_ts",
        F.size("users").cast("long").alias("distinct_users"),
    )
    all_rows = month.agg(merged_size.cast("long").alias("distinct_users")).select(
        F.lit("all").alias("grain"),
        F.lit(None).cast("timestamp").alias("bucket_ts"),
        "distinct_users",
    )
    return day_rows.unionByName(week_rows).unionByName(month_rows).unionByName(
        all_rows
    )


QUANTILE_BIN_W = 10.0  # events.value in [0, ~500) -> ~50 bins


def _bins_quantile(arr, total, num: int, den: int):
    """Smallest bin index whose cumulative count reaches num/den of total —
    a pure-JVM fold over the (bin, cnt) partial array, all-integer compare
    (cum*den >= num*total) so no float quantile math exists to diverge."""
    acc0 = F.struct(
        F.lit(0).cast("long").alias("cum"), F.lit(None).cast("long").alias("q")
    )

    def step(acc, x):
        cum = acc["cum"] + x["cnt"]
        return F.struct(
            cum.alias("cum"),
            F.coalesce(
                acc["q"], F.when(cum * den >= num * total, x["bin"])
            ).alias("q"),
        )

    return F.aggregate(arr, acc0, step, lambda a: a["q"])


def quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE rollup — the t-digest/KLL pattern in its exact,
    oracle-checkable form (companion to analytics_bitmap_rollup): one scan
    of the fact table builds per-(day, bin) histogram partials; week,
    month, and all-time p50/p95 come from MERGING partials (summing bin
    counts upward), never from rescanning events. This is how a warehouse
    serves "p95 by any time grain" over 100 TB: the partial table is
    O(days x bins), the merge is O(bins) per coarser bucket, and the
    quantile extraction is a fold over a bounded sorted bin array — no
    global sort, no single-partition window, no approx sketch needed until
    a bin's count no longer fits a long.

    Quantile definition (shared with the oracle): the smallest bin index
    whose cumulative count reaches q of the bucket total — integer
    arithmetic end to end."""
    ev = _events(spark, sf_dir)
    daily = track(
        ev.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            F.floor(F.col("value") / QUANTILE_BIN_W).cast("long").alias("bin"),
        )
        .agg(F.count("*").alias("cnt"))
        .persist()
    )

    def grain_rows(grain: str, bucket):
        grouped = daily.groupBy(bucket.alias("bucket_ts"), "bin").agg(
            F.sum("cnt").alias("cnt")
        )
        arr = F.array_sort(F.collect_list(F.struct("bin", "cnt")))
        per_bucket = grouped.groupBy("bucket_ts").agg(
            F.sum("cnt").alias("n_events"), arr.alias("bins")
        )
        return per_bucket.select(
            F.lit(grain).alias("grain"),
            "bucket_ts",
            "n_events",
            _bins_quantile(F.col("bins"), F.col("n_events"), 1, 2).alias(
                "p50_bin"
            ),
            _bins_quantile(F.col("bins"), F.col("n_events"), 19, 20).alias(
                "p95_bin"
            ),
        )

    day_rows = grain_rows("day", F.col("day"))
    week_rows = grain_rows("week", F.date_trunc("week", "day"))
    month_rows = grain_rows("month", F.date_trunc("month", "day"))
    all_rows = grain_rows("all", F.lit(None).cast("timestamp"))
    return (
        day_rows.unionByName(week_rows)
        .unionByName(month_rows)
        .unionByName(all_rows)
    )


def set_algebra_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set ALGEBRA from mergeable partials — the theta-sketch
    set-operation pattern (intersection / union / difference of user sets)
    in its exact, oracle-checkable form. "Users who clicked AND purchased
    this week" cannot be answered by adding counters: it needs per-(day,
    type) user-set partials merged upward, then set ops across types —
    exactly what theta sketches do at 100 TB with bounded memory, and what
    collect_set does exactly at test scale (the drop-in sketch swap is the
    same one tests/test_sketch_rollup.py pins for the distinct rollup).

    One fact scan; day-grain partials roll to week; intersection/union run
    on the merged arrays per week — never a re-scan, never a self-join of
    the fact table."""
    ev = _events(spark, sf_dir).where(
        F.col("event_type").isin("click", "purchase")
    )
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.collect_set("user_id").alias("users"))
    weekly = daily.groupBy(
        F.date_trunc("week", "day").alias("week_ts"), "event_type"
    ).agg(F.array_distinct(F.flatten(F.collect_list("users"))).alias("users"))
    piv = (
        weekly.groupBy("week_ts")
        .pivot("event_type", ["click", "purchase"])
        .agg(F.first("users"))
    )
    empty = F.array().cast("array<bigint>")
    click = F.coalesce(F.col("click"), empty)
    purch = F.coalesce(F.col("purchase"), empty)
    n_both = F.size(F.array_intersect(click, purch)).cast("long")
    return piv.select(
        "week_ts",
        F.size(click).cast("long").alias("n_click"),
        F.size(purch).cast("long").alias("n_purchase"),
        n_both.alias("n_both"),
        F.size(F.array_union(click, purch)).cast("long").alias("n_either"),
        (F.size(click).cast("long") - n_both).alias("n_click_only"),
    )


def incremental_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view — the delta algebra
    Δ(A⋈B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB, on top of the aggregate-merge
    trick analytics_incremental_mv already pins for single-table views.
    The view is revenue by customer nation over orders⋈customer; inserts
    arrive on BOTH sides (orders delta = o_orderkey % 5 == 0, customer
    delta = c_custkey % 7 == 0, the snapshot-parity device of
    dedup_incremental). The refreshed MV is the stored old-state partials
    merged with the three delta-term aggregates — and must equal a full
    recompute exactly, which is what the oracle (a plain join over the
    full tables) checks.

    100 TB shape: the stored MV term is a read, not a recompute; ΔA⋈B₀
    scans only the fact delta with the dim broadcast; A₀⋈ΔB is the
    expensive term in principle, but ΔB is a handful of dim keys — the
    join pushes the ΔB key set into the fact scan (broadcast semi-join /
    DPP), so the fact is read only where it matches changed dim rows."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    d_o = F.col("o_orderkey") % 5 == 0
    d_c = F.col("c_custkey") % 7 == 0
    o_old, o_new = orders.where(~d_o), orders.where(d_o)
    c_old, c_new = cust.where(~d_c), cust.where(d_c)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def partial(o: DataFrame, c: DataFrame, bcast: bool) -> DataFrame:
        # the DELTA dim side is always tiny -> broadcast it; the full dim
        # follows the repo convention (customer-scale dims shuffle)
        c = F.broadcast(c) if bcast else c
        return (
            o.join(c, o["o_custkey"] == c["c_custkey"])
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("n"), F.sum(cents).alias("rev"))
        )

    merged = (
        partial(o_old, c_old, False)  # the stored MV state (a read, in prod)
        .unionByName(partial(o_new, c_old, False))
        .unionByName(partial(o_old, c_new, True))
        .unionByName(partial(o_new, c_new, True))
    )
    return (
        merged.groupBy("c_nationkey")
        .agg(
            F.sum("n").alias("n_orders"),
            F.sum("rev").alias("revenue_cents"),
        )
        .select("c_nationkey", "n_orders", "revenue_cents")
    )


# ---------------------------------------------------------------------------
# Classical seasonal decomposition (the moving-average method behind
# decompose()/STL's first pass): hourly series = trend + seasonal +
# residual, with trend a centered 24-term moving average, seasonality the
# per-hour-of-day mean deviation, residual the remainder. All arithmetic
# is carried in ×24 integer units (trend_x24 = ROWS-window SUM of 24
# integer counts, dev_x24 = 24·n − trend_x24) so everything before the
# seasonal mean is exact; the two divisions round at 6.
#
# Scale shape: the only data-sized step is the hourly count (one hash
# aggregate); the decomposition windows run over the hourly table, which
# is bounded by the time span (≤ hours-in-range rows — the perplexity-
# split precedent for a bounded global step). Edge hours without a full
# 24-row window are excluded from trend/seasonal by an explicit
# window-count guard, identically in both engines.
# ---------------------------------------------------------------------------


def seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour_ts")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("hour_ts").rowsBetween(-12, 11)
    trended = hourly.select(
        "hour_ts",
        "n",
        F.when(F.count(F.lit(1)).over(w) == 24, F.sum("n").over(w)).alias(
            "trend_x24"
        ),
        F.hour("hour_ts").alias("hod"),
    ).withColumn("dev_x24", 24 * F.col("n") - F.col("trend_x24"))
    seasonal = trended.groupBy("hod").agg(
        F.avg("dev_x24").alias("seasonal_raw")
    )
    return (
        trended.join(F.broadcast(seasonal), "hod")
        .select(
            "hour_ts",
            "n",
            "trend_x24",
            "hod",
            "dev_x24",
            F.round(F.col("seasonal_raw"), 6).alias("seasonal_x24"),
            F.round(F.col("dev_x24") - F.col("seasonal_raw"), 6).alias(
                "residual_x24"
            ),
        )
    )


_SEASONAL_ORACLE = """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour_ts, count(*)::BIGINT AS n
        FROM events GROUP BY 1
    ),
    trended AS (
        SELECT hour_ts, n,
               CASE WHEN count(*) OVER w = 24
                    THEN (sum(n) OVER w)::BIGINT END AS trend_x24,
               CAST(hour(hour_ts) AS INT) AS hod
        FROM hourly
        WINDOW w AS (ORDER BY hour_ts ROWS BETWEEN 12 PRECEDING
                     AND 11 FOLLOWING)
    ),
    devs AS (
        SELECT *, 24 * n - trend_x24 AS dev_x24 FROM trended
    ),
    seasonal AS (
        SELECT hod, avg(dev_x24) AS seasonal_raw FROM devs GROUP BY hod
    )
    SELECT hour_ts, n, trend_x24, d.hod, dev_x24,
           round(seasonal_raw, 6) AS seasonal_x24,
           round(dev_x24 - seasonal_raw, 6) AS residual_x24
    FROM devs d JOIN seasonal s ON d.hod = s.hod
"""


# ---------------------------------------------------------------------------
# Holt's linear-trend exponential smoothing (Holt 1957) — the recursive
# forecasting companion to the moving-average decomposition above:
# level_t = α·y_t + (1−α)(level_{t−1}+trend_{t−1}),
# trend_t = β(level_t − level_{t−1}) + (1−β)trend_{t−1},
# one-step-ahead fit f_t = level_{t−1}+trend_{t−1}.
#
# The recursion runs over the DAILY series (bounded by the time span), so
# the distributed part is one hash aggregate; the fold itself is a single
# higher-order-function expression over the collected 1-row series array
# (the bounded-global-scalar shape the plan tests allow) — posexploded
# back to rows. Parity: both engines execute the IDENTICAL operation
# order per step (Spark computes level once and reuses it; the oracle's
# recursive CTE repeats the identical expression, which is bit-equal),
# and α/β literals are embedded verbatim (DOUBLE-cast in the oracle),
# so fitted values agree to the display rounding.
# ---------------------------------------------------------------------------

HOLT_ALPHA, HOLT_BETA = 0.5, 0.3


def holt_readout(daily: DataFrame) -> DataFrame:
    """The Holt recursion over a (day, y) daily-counter table — shared by
    the batch query and the streaming twin (which maintains the counters
    as complete-mode stream state)."""
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("s")
    )
    a, b = HOLT_ALPHA, HOLT_BETA
    first = F.element_at(F.col("s"), 1)
    second = F.element_at(F.col("s"), 2)
    init = F.array(
        F.struct(
            first["day"].alias("day"),
            first["y"].alias("y"),
            first["y"].cast("double").alias("level"),
            (second["y"] - first["y"]).cast("double").alias("trend"),
            F.lit(None).cast("double").alias("fc"),
        )
    )

    def step(acc, x):
        prev = F.element_at(acc, -1)
        lvl = F.lit(a) * x["y"] + F.lit(1 - a) * (prev["level"] + prev["trend"])
        tr = F.lit(b) * (lvl - prev["level"]) + F.lit(1 - b) * prev["trend"]
        return F.concat(
            acc,
            F.array(
                F.struct(
                    x["day"].alias("day"),
                    x["y"].alias("y"),
                    lvl.alias("level"),
                    tr.alias("trend"),
                    (prev["level"] + prev["trend"]).alias("fc"),
                )
            ),
        )

    folded = series.select(
        F.aggregate(
            F.slice(F.col("s"), 2, F.greatest(F.size("s") - 1, F.lit(0))),
            init,
            step,
        ).alias("h")
    )
    row = folded.select(F.explode("h").alias("r"))
    return row.select(
        F.col("r.day").alias("day"),
        F.col("r.y").alias("y"),
        F.round("r.level", 6).alias("level"),
        F.round("r.trend", 6).alias("trend"),
        F.round("r.fc", 6).alias("one_step_fc"),
        F.round(F.abs(F.col("r.y") - F.col("r.fc")), 6).alias("abs_err"),
    )


def holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    return holt_readout(daily)


ACF_MAX_LAG = 7  # autocorrelation horizon (a week of daily lags)


def acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily event-count series at lags
    1..ACF_MAX_LAG — the seasonality probe that precedes any forecasting
    model choice (weekly cycles show as a lag-7 peak).

    Exactness device: the centered series is computed in INTEGER units,
    c_t = n·y_t − Σy (scaling by n clears the rational mean), so numerator
    Σ c_t·c_{t+k} and denominator Σ c_t² are exact BIGINTs in both engines
    and only the final division is float — bit-equal before round(…, 6).
    Scale shape: one groupBy to the domain-bounded daily table (rows ==
    days in span), then the whole lag fold is a single-row array program
    (sort_array + zip_with/aggregate, the Holt-readout device) — map-only,
    no window, no shuffle beyond the daily agg.
    """
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    return acf_readout(daily)


def acf_readout(daily: DataFrame) -> DataFrame:
    """The lag fold over a (day, y) daily-counter table — shared by the
    batch query and the streaming twin (whose complete-mode drained state
    equals the batch daily aggregate exactly, so both replay one oracle)."""
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("s")
    )
    ys = F.transform(F.col("s"), lambda x: x["y"])
    zero = F.lit(0).cast("long")
    n = F.size(ys)
    total = F.aggregate(ys, zero, lambda acc, y: acc + y)
    c = F.transform(ys, lambda y: n.cast("long") * y - total)
    den = F.aggregate(
        F.zip_with(c, c, lambda a, b: a * b), zero, lambda acc, p: acc + p
    )
    lags = series.select(
        F.col("s"),
        c.alias("c"),
        n.alias("n"),
        den.alias("den"),
        F.explode(F.sequence(F.lit(1), F.lit(ACF_MAX_LAG))).alias("lag"),
    ).where(F.col("lag") < F.col("n"))
    num = F.aggregate(
        F.zip_with(
            F.slice(F.col("c"), 1, F.col("n") - F.col("lag")),
            F.slice(F.col("c"), F.col("lag") + 1, F.col("n") - F.col("lag")),
            lambda a, b: a * b,
        ),
        zero,
        lambda acc, p: acc + p,
    )
    return lags.select(
        F.col("lag").cast("int").alias("lag"),
        (F.col("n") - F.col("lag")).cast("long").alias("n_pairs"),
        F.round(num / F.col("den"), 6).alias("acf"),
    )


_HOLT_ORACLE = f"""
    WITH RECURSIVE daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS y
        FROM events GROUP BY 1
    ),
    d AS (
        SELECT day, y, row_number() OVER (ORDER BY day) AS i FROM daily
    ),
    h AS (
        SELECT i, day, y,
               CAST(y AS DOUBLE) AS level,
               CAST((SELECT y FROM d WHERE i = 2) - y AS DOUBLE) AS trend,
               CAST(NULL AS DOUBLE) AS fc
        FROM d WHERE i = 1
        UNION ALL
        SELECT d.i, d.day, d.y,
               CAST({HOLT_ALPHA!r} AS DOUBLE) * d.y
                   + CAST({1 - HOLT_ALPHA!r} AS DOUBLE)
                     * (h.level + h.trend),
               CAST({HOLT_BETA!r} AS DOUBLE)
                   * ((CAST({HOLT_ALPHA!r} AS DOUBLE) * d.y
                       + CAST({1 - HOLT_ALPHA!r} AS DOUBLE)
                         * (h.level + h.trend)) - h.level)
                   + CAST({1 - HOLT_BETA!r} AS DOUBLE) * h.trend,
               h.level + h.trend
        FROM d JOIN h ON d.i = h.i + 1
    )
    SELECT day, y, round(level, 6) AS level, round(trend, 6) AS trend,
           round(fc, 6) AS one_step_fc,
           round(abs(y - fc), 6) AS abs_err
    FROM h
"""


# ---------------------------------------------------------------------------
# Theil–Sen robust trend (Theil 1950 / Sen 1968): slope = median of all
# pairwise slopes of the daily series, intercept = median of residual
# offsets — the robust alternative to OLS (breakdown point ~29% vs 0%),
# the estimator monitoring pipelines use when a few bad days would drag a
# least-squares trend. The pair space is over the DAILY aggregate (days²
# pairs, bounded by the time span — the fuzzy-pairs discipline: quadratic
# only in a domain-bounded table, never in rows). Medians interpolate
# identically in both engines (percentile ≡ quantile_cont) over the
# identical slope doubles, so the estimate matches to display rounding.
# ---------------------------------------------------------------------------


def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    base = daily.crossJoin(
        F.broadcast(daily.agg(F.min("day").alias("day0")))
    ).select(F.datediff("day", "day0").cast("long").alias("d"), "y")
    a, b = base.alias("a"), base.alias("b")
    slopes = a.join(b, F.col("a.d") < F.col("b.d")).select(
        (
            (F.col("b.y") - F.col("a.y"))
            / (F.col("b.d") - F.col("a.d")).cast("double")
        ).alias("slope")
    )
    med_slope = slopes.agg(
        F.percentile("slope", F.lit(0.5)).alias("slope"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    resid = base.crossJoin(F.broadcast(med_slope)).select(
        "slope",
        "n_pairs",
        (F.col("y") - F.col("slope") * F.col("d")).alias("off"),
    )
    return resid.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("n_pairs").alias("n_pairs"),
        F.round(F.max("slope"), 6).alias("slope"),
        F.round(F.percentile("off", F.lit(0.5)), 6).alias("intercept"),
    )


_THEIL_SEN_ORACLE = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS y
        FROM events GROUP BY 1
    ),
    base AS (
        SELECT date_diff('day', (SELECT min(day) FROM daily), day)::BIGINT
                   AS d, y
        FROM daily
    ),
    slopes AS (
        SELECT (b.y - a.y) / CAST(b.d - a.d AS DOUBLE) AS slope
        FROM base a JOIN base b ON a.d < b.d
    ),
    med AS (
        SELECT quantile_cont(slope, 0.5) AS slope,
               count(*)::BIGINT AS n_pairs
        FROM slopes
    ),
    resid AS (
        SELECT med.slope, med.n_pairs, y - med.slope * d AS off
        FROM base CROSS JOIN med
    )
    SELECT count(*)::BIGINT AS n_days, max(n_pairs) AS n_pairs,
           round(max(slope), 6) AS slope,
           round(quantile_cont(off, 0.5), 6) AS intercept
    FROM resid
"""


# ---------------------------------------------------------------------------
# Mann–Kendall trend test (Mann 1945 / Kendall 1975) — the significance
# companion to the Theil–Sen estimator above: S = Σ_{i<j} sign(y_j − y_i)
# over the daily series, variance with the tie correction
# 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5), and the continuity-
# corrected z = (S − sign(S)) / √Var(S) against the two-sided 5% line.
# S and 18·Var(S) are exact integers (pair space over the bounded daily
# table); only z touches floating point, with √ applied to the identical
# rational in both engines.
# ---------------------------------------------------------------------------

MK_Z_CRIT = 1.959963984540054  # two-sided 5% normal critical value


def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    a, b = daily.alias("a"), daily.alias("b")
    s_row = (
        a.join(b, F.col("a.day") < F.col("b.day"))
        .agg(
            F.sum(F.signum(F.col("b.y") - F.col("a.y")).cast("long")).alias(
                "s_stat"
            )
        )
    )
    n_row = daily.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    j = s_row.crossJoin(F.broadcast(n_row)).crossJoin(F.broadcast(ties))
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.coalesce(F.col("tie_term"), F.lit(0))
    )
    z = (F.col("s_stat") - F.signum(F.col("s_stat"))) / F.sqrt(
        var18 / F.lit(18.0)
    )
    return j.select(
        F.col("n").alias("n_days"),
        "s_stat",
        var18.alias("var_s_x18"),
        F.round(z, 6).alias("z"),
        F.when(z > MK_Z_CRIT, F.lit("increasing"))
        .when(z < -MK_Z_CRIT, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )


_MANN_KENDALL_ORACLE = f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS y
        FROM events GROUP BY 1
    ),
    s_row AS (
        SELECT sum(CASE WHEN b.y > a.y THEN 1
                        WHEN b.y < a.y THEN -1 ELSE 0 END)::BIGINT AS s_stat
        FROM daily a JOIN daily b ON a.day < b.day
    ),
    n_row AS (SELECT count(*)::BIGINT AS n FROM daily),
    ties AS (
        SELECT sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_term
        FROM (SELECT count(*)::BIGINT AS t FROM daily GROUP BY y)
    ),
    j AS (
        SELECT s_stat, n,
               (n * (n - 1) * (2 * n + 5) - coalesce(tie_term, 0))::BIGINT
                   AS var_s_x18
        FROM s_row CROSS JOIN n_row CROSS JOIN ties
    ),
    scored AS (
        SELECT n, s_stat, var_s_x18,
               (s_stat - sign(s_stat)) / sqrt(var_s_x18 / CAST(18.0 AS
                   DOUBLE)) AS z_raw
        FROM j
    )
    SELECT n AS n_days, s_stat, var_s_x18, round(z_raw, 6) AS z,
           CASE WHEN z_raw > CAST({MK_Z_CRIT!r} AS DOUBLE)
                    THEN 'increasing'
                WHEN z_raw < -CAST({MK_Z_CRIT!r} AS DOUBLE)
                    THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM scored
"""


QUERIES = {
    "analytics_mann_kendall": mann_kendall_trend,
    "analytics_theil_sen_trend": theil_sen_trend,
    "analytics_holt_forecast": holt_forecast,
    "analytics_acf_daily": acf_daily,
    "analytics_seasonal_decompose": seasonal_decompose,
    "analytics_quantile_rollup": quantile_rollup,
    "analytics_set_algebra": set_algebra_rollup,
    "analytics_incremental_join_mv": incremental_join_mv,
    "analytics_ks_drift": ks_drift,
    "analytics_ks_drift_binned": ks_drift_binned,
    "analytics_rolling_distinct_users": rolling_distinct_users,
    "analytics_psi_drift": psi_drift,
    "analytics_hourly_anomaly": hourly_anomaly,
    "analytics_market_basket": market_basket_pairs,
    "analytics_revenue_growth": revenue_growth,
    "analytics_equidepth_histogram": equidepth_histogram,
    "analytics_incremental_mv": incremental_mv_refresh,
    "analytics_mad_outliers": mad_outliers,
    "analytics_ewma_smoothing": ewma_smoothing,
    "analytics_gap_fill_hourly": gap_fill_hourly,
    "analytics_event_transitions": event_transitions,
    "analytics_conversion_latency": conversion_latency,
    "analytics_cdc_compaction": cdc_latest_compaction,
    "analytics_key_skew_report": key_skew_report,
    "analytics_rolling_hourly_avg": rolling_hourly_avg,
    "analytics_spend_quartiles": spend_quartiles,
    "analytics_multigrain_rollup": multigrain_rollup,
    "analytics_pivot_daily": pivot_daily_by_type,
    "analytics_unpivot_measures": unpivot_lineitem_measures,
    "analytics_user_streaks": user_streaks,
    "analytics_p50_exact": p50_exact,
    "analytics_trimmed_stats": trimmed_stats,
    "analytics_hh_turnover": heavy_hitter_turnover,
    "analytics_markov_kstep": markov_kstep,
    "analytics_zscore": zscore_normalize,
    "analytics_user_trend": user_trend,
    "analytics_salted_join": salted_join_enrich,
    "analytics_p95_approx": p95_approx,
    "analytics_event_funnel": event_funnel,
    "analytics_weekly_retention": weekly_retention,
    "analytics_cohort_ltv": cohort_ltv,
    "analytics_cusum_changepoint": cusum_changepoint,
    "analytics_survival_churn": survival_churn,
    "analytics_gini_concentration": gini_concentration,
    "analytics_top_decile_share": top_decile_share,
    "analytics_props_json": props_json_stats,
    "analytics_session_windows": session_windows,
    "analytics_salted_counts": salted_label_counts,
    "analytics_p95_windowed": p95_windowed,
    "analytics_throughput_30s": windowed_throughput,
    "analytics_sliding_rate": sliding_rate,
    "analytics_consumer_lag": consumer_lag,
    "analytics_p95_histogram": p95_value_histogram,
    "analytics_payload_size_hist": payload_size_histogram,
    "analytics_bitmap_rollup": bitmap_distinct_rollup,
}

_P95_ORACLE = """
WITH buckets(le) AS (VALUES (1.0),(2.0),(5.0),(10.0),(25.0),(50.0),(100.0),(150.0),(200.0),(300.0)),
totals AS (SELECT event_type, count(*) AS total FROM events GROUP BY event_type),
cum AS (
  SELECT e.event_type, b.le, count(*) AS cum
  FROM events e JOIN buckets b ON e.value <= b.le
  GROUP BY e.event_type, b.le
),
dense AS (
  SELECT t.event_type, b.le, coalesce(c.cum, 0) AS cum
  FROM totals t CROSS JOIN buckets b
  LEFT JOIN cum c ON c.event_type = t.event_type AND c.le = b.le
),
lagged AS (
  SELECT event_type, le, cum,
         coalesce(lag(cum) OVER (PARTITION BY event_type ORDER BY le), 0) AS prev_cum,
         coalesce(lag(le) OVER (PARTITION BY event_type ORDER BY le), 0.0) AS prev_le
  FROM dense
),
hit AS (
  SELECT l.event_type,
         min_by(struct_pack(le := l.le, prev_le := l.prev_le, cum := l.cum,
                            prev_cum := l.prev_cum, target := 0.95 * t.total), l.le) AS b
  FROM lagged l JOIN totals t USING (event_type)
  WHERE l.cum >= 0.95 * t.total
  GROUP BY l.event_type
)
SELECT t.event_type,
       round(coalesce(b.prev_le + (b.le - b.prev_le) * (b.target - b.prev_cum)
                      / (b.cum - b.prev_cum), 300.0), 6) AS p95
FROM totals t LEFT JOIN hit h ON h.event_type = t.event_type
"""

_P95_WINDOWED_ORACLE = """
WITH buckets(le) AS (VALUES (1.0),(2.0),(5.0),(10.0),(25.0),(50.0),(100.0),(150.0),(200.0),(300.0)),
ev AS (
  SELECT (floor(epoch(ts) / 21600) * 21600)::BIGINT::VARCHAR || '|' || event_type AS lbl,
         value
  FROM events
),
totals AS (SELECT lbl, count(*) AS total FROM ev GROUP BY lbl),
cum AS (
  SELECT e.lbl, b.le, count(*) AS cum
  FROM ev e JOIN buckets b ON e.value <= b.le
  GROUP BY e.lbl, b.le
),
dense AS (
  SELECT t.lbl, b.le, coalesce(c.cum, 0) AS cum
  FROM totals t CROSS JOIN buckets b
  LEFT JOIN cum c ON c.lbl = t.lbl AND c.le = b.le
),
lagged AS (
  SELECT lbl, le, cum,
         coalesce(lag(cum) OVER (PARTITION BY lbl ORDER BY le), 0) AS prev_cum,
         coalesce(lag(le) OVER (PARTITION BY lbl ORDER BY le), 0.0) AS prev_le
  FROM dense
),
hit AS (
  SELECT l.lbl,
         min_by(struct_pack(le := l.le, prev_le := l.prev_le, cum := l.cum,
                            prev_cum := l.prev_cum, target := 0.95 * t.total), l.le) AS b
  FROM lagged l JOIN totals t USING (lbl)
  WHERE l.cum >= 0.95 * t.total
  GROUP BY l.lbl
)
SELECT to_timestamp(string_split(t.lbl, '|')[1]::BIGINT)::TIMESTAMP AS window_start,
       string_split(t.lbl, '|')[2] AS event_type,
       round(coalesce(b.prev_le + (b.le - b.prev_le) * (b.target - b.prev_cum)
                      / (b.cum - b.prev_cum), 300.0), 6) AS p95
FROM totals t LEFT JOIN hit h ON h.lbl = t.lbl
"""

ORACLES = {
    "analytics_mann_kendall": _MANN_KENDALL_ORACLE,
    "analytics_theil_sen_trend": _THEIL_SEN_ORACLE,
    "analytics_holt_forecast": _HOLT_ORACLE,
    # exact-integer centered series: only the final acf division is float
    "analytics_acf_daily": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS y
            FROM events GROUP BY 1
        ),
        st AS (SELECT sum(y)::BIGINT AS s, count(*)::BIGINT AS n FROM daily),
        c AS (
            SELECT row_number() OVER (ORDER BY day) AS i,
                   (st.n * y - st.s)::BIGINT AS c
            FROM daily, st
        ),
        den AS (SELECT sum(c * c)::BIGINT AS d FROM c),
        lags AS (SELECT unnest(generate_series(1, 7)) AS k),
        pairs AS (
            SELECT l.k, a.c * b.c AS p
            FROM lags l JOIN c a ON TRUE JOIN c b ON b.i = a.i + l.k
        )
        SELECT k::INT AS lag,
               ((SELECT n FROM st) - k)::BIGINT AS n_pairs,
               round(sum(p)::BIGINT / (SELECT d FROM den), 6) AS acf
        FROM pairs GROUP BY k
    """,
    "analytics_seasonal_decompose": _SEASONAL_ORACLE,
    "analytics_incremental_join_mv": """
        SELECT c_nationkey,
               count(*) AS n_orders,
               sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
                   AS revenue_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    """,
    "analytics_set_algebra": """
        WITH u AS (
            SELECT date_trunc('week', ts)::TIMESTAMP AS week_ts, user_id,
                   bool_or(event_type = 'click') AS c,
                   bool_or(event_type = 'purchase') AS p
            FROM events
            WHERE event_type IN ('click', 'purchase')
            GROUP BY 1, 2
        )
        SELECT week_ts,
               sum(CASE WHEN c THEN 1 ELSE 0 END)::BIGINT AS n_click,
               sum(CASE WHEN p THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
               sum(CASE WHEN c AND p THEN 1 ELSE 0 END)::BIGINT AS n_both,
               count(*)::BIGINT AS n_either,
               sum(CASE WHEN c AND NOT p THEN 1 ELSE 0 END)::BIGINT
                   AS n_click_only
        FROM u GROUP BY 1
    """,
    "analytics_quantile_rollup": f"""
        WITH bins AS (
            SELECT date_trunc('day', ts) AS day,
                   CAST(floor(value / {QUANTILE_BIN_W!r}) AS BIGINT) AS bin,
                   count(*) AS cnt
            FROM events GROUP BY 1, 2
        ),
        g AS (
            SELECT 'day' AS grain, day AS bucket_ts, bin,
                   sum(cnt)::BIGINT AS cnt FROM bins GROUP BY 2, 3
            UNION ALL
            SELECT 'week', date_trunc('week', day), bin, sum(cnt)::BIGINT
            FROM bins GROUP BY 2, 3
            UNION ALL
            SELECT 'month', date_trunc('month', day), bin, sum(cnt)::BIGINT
            FROM bins GROUP BY 2, 3
            UNION ALL
            SELECT 'all', CAST(NULL AS TIMESTAMP), bin, sum(cnt)::BIGINT
            FROM bins GROUP BY 2, 3
        ),
        c AS (
            SELECT grain, bucket_ts, bin, cnt,
                   sum(cnt) OVER (
                       PARTITION BY grain, bucket_ts ORDER BY bin
                   )::BIGINT AS cum,
                   sum(cnt) OVER (PARTITION BY grain, bucket_ts)::BIGINT AS tot
            FROM g
        )
        SELECT grain, bucket_ts,
               CAST(max(tot) AS BIGINT) AS n_events,
               min(CASE WHEN cum * 2 >= tot THEN bin END) AS p50_bin,
               min(CASE WHEN cum * 20 >= 19 * tot THEN bin END) AS p95_bin
        FROM c GROUP BY 1, 2
    """,
    "analytics_bitmap_rollup": """
        SELECT 'day' AS grain, date_trunc('day', ts)::TIMESTAMP AS bucket_ts,
               count(DISTINCT user_id) AS distinct_users
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'week', date_trunc('week', ts)::TIMESTAMP,
               count(DISTINCT user_id)
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'month', date_trunc('month', ts)::TIMESTAMP,
               count(DISTINCT user_id)
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'all', NULL::TIMESTAMP, count(DISTINCT user_id) FROM events
    """,
    "analytics_rolling_distinct_users": """
        WITH day_users AS (
            SELECT DISTINCT ts::DATE AS d, user_id FROM events
        ),
        spine AS (
            SELECT unnest(generate_series(min(d), max(d), INTERVAL 1 DAY))::DATE AS day
            FROM day_users
        )
        SELECT s.day,
               count(DISTINCT CASE WHEN du.d = s.day THEN du.user_id END) AS dau,
               count(DISTINCT du.user_id) AS wau_trailing_7d
        FROM spine s
        LEFT JOIN day_users du
          ON du.d <= s.day AND du.d >= s.day - 6
        GROUP BY s.day
    """,
    "analytics_p95_approx": """
        SELECT event_type, count(*) AS n_events, true AS within_bound
        FROM events GROUP BY 1
    """,
    "analytics_psi_drift": f"""
        WITH v AS (
            SELECT least(floor(value / {PSI_BIN_W}), {PSI_MAX_BIN}) AS bin,
                   CASE WHEN event_type = '{KS_TYPE_A}' THEN 1 ELSE 0 END AS ia,
                   CASE WHEN event_type = '{KS_TYPE_B}' THEN 1 ELSE 0 END AS ib
            FROM events WHERE event_type IN ('{KS_TYPE_A}', '{KS_TYPE_B}')
        ),
        pb AS (SELECT bin, sum(ia) AS ca, sum(ib) AS cb FROM v GROUP BY 1),
        t AS (SELECT sum(ia) AS na, sum(ib) AS nb FROM v)
        SELECT t.na::BIGINT AS n_a, t.nb::BIGINT AS n_b,
               count(*) AS n_bins,
               round(sum(((pb.ca + 0.5) / (t.na + 0.5 * {_PSI_NBINS})
                          - (pb.cb + 0.5) / (t.nb + 0.5 * {_PSI_NBINS}))
                         * ln(((pb.ca + 0.5) / (t.na + 0.5 * {_PSI_NBINS}))
                              / ((pb.cb + 0.5) / (t.nb + 0.5 * {_PSI_NBINS})))),
                     6) AS psi
        FROM pb, t GROUP BY t.na, t.nb
    """,
    "analytics_hourly_anomaly": f"""
        WITH h AS (
            SELECT event_type, extract(hour FROM ts) AS hod FROM events
        ),
        ph AS (SELECT event_type, hod, count(*) AS n FROM h GROUP BY 1, 2),
        t AS (SELECT event_type, count(*) AS total FROM h GROUP BY 1)
        SELECT ph.event_type, ph.hod::INT AS hod, ph.n,
               round((ph.n * 24) / t.total, 6) AS vs_baseline,
               ((ph.n * 24) / t.total > {SPIKE_HI}
                OR (ph.n * 24) / t.total < {SPIKE_LO}) AS is_anomalous
        FROM ph JOIN t ON t.event_type = ph.event_type
    """,
    "analytics_ks_drift": f"""
        WITH v AS (
            SELECT value,
                   CASE WHEN event_type = '{KS_TYPE_A}' THEN 1 ELSE 0 END AS ia,
                   CASE WHEN event_type = '{KS_TYPE_B}' THEN 1 ELSE 0 END AS ib
            FROM events WHERE event_type IN ('{KS_TYPE_A}', '{KS_TYPE_B}')
        ),
        pv AS (SELECT value, sum(ia) AS ca, sum(ib) AS cb FROM v GROUP BY 1),
        c AS (
            SELECT sum(ca) OVER (ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
                   sum(cb) OVER (ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
            FROM pv
        ),
        t AS (SELECT sum(ia) AS na, sum(ib) AS nb FROM v)
        SELECT t.na::BIGINT AS n_a, t.nb::BIGINT AS n_b,
               round(max(abs(c.cuma / t.na - c.cumb / t.nb)), 6) AS ks_stat
        FROM c, t GROUP BY t.na, t.nb
    """,
    "analytics_ks_drift_binned": f"""
        WITH v AS (
            SELECT least(floor(value / {PSI_BIN_W}), {PSI_MAX_BIN}) AS bin,
                   CASE WHEN event_type = '{KS_TYPE_A}' THEN 1 ELSE 0 END AS ia,
                   CASE WHEN event_type = '{KS_TYPE_B}' THEN 1 ELSE 0 END AS ib
            FROM events WHERE event_type IN ('{KS_TYPE_A}', '{KS_TYPE_B}')
        ),
        c AS (
            SELECT sum(ia) AS na, sum(ib) AS nb,
                   {_KS_BINNED_CUMS}
            FROM v
        )
        SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
               round(greatest({_KS_BINNED_GAPS}), 6) AS ks_stat_binned
        FROM c
    """,
    "analytics_market_basket": f"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pc AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   count(*) AS n_orders
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= {MIN_BASKET_SUPPORT}
        ),
        pp AS (SELECT l_partkey, count(*) AS n_part FROM li GROUP BY 1),
        t AS (SELECT count(DISTINCT l_orderkey) AS n_total FROM li)
        SELECT pc.part_a, pc.part_b, pc.n_orders,
               round((pc.n_orders * t.n_total) / (pa.n_part * pb.n_part), 6) AS lift
        FROM pc, t
        JOIN pp pa ON pa.l_partkey = pc.part_a
        JOIN pp pb ON pb.l_partkey = pc.part_b
    """,
    "analytics_revenue_growth": """
        WITH monthly AS (
            SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT month, revenue,
               lag(revenue) OVER (ORDER BY month) AS prev_revenue,
               round(revenue - lag(revenue) OVER (ORDER BY month), 2) AS delta,
               round((revenue - lag(revenue) OVER (ORDER BY month))
                     / lag(revenue) OVER (ORDER BY month) * 100, 4) AS growth_pct
        FROM monthly
    """,
    "analytics_equidepth_histogram": f"""
        WITH per_type AS (
            SELECT event_type,
                   quantile_cont(value,
                       [{", ".join(str(i / N_DECILES) for i in range(1, N_DECILES))}])
                       AS bounds,
                   count(*) AS n_events
            FROM events GROUP BY event_type
        )
        SELECT event_type, n_events, d.decile, d.upper_bound FROM (
            SELECT event_type, n_events,
                   unnest(list_transform(generate_series(1, {N_DECILES - 1}),
                          i -> {{decile: i, upper_bound: round(bounds[i], 6)}})) AS d
            FROM per_type
        )
    """,
    "analytics_incremental_mv": """
        SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month,
               o_orderpriority,
               round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM orders
        GROUP BY 1, 2
    """,
    "analytics_mad_outliers": f"""
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY event_type
        ),
        mad AS (
            SELECT e.event_type, m.med,
                   quantile_cont(abs(e.value - m.med), 0.5) AS mad
            FROM events e JOIN med m USING (event_type)
            GROUP BY e.event_type, m.med
        )
        SELECT e.event_type,
               round(min(s.med), 6) AS median_value,
               round(min(s.mad), 6) AS mad,
               count(*) AS n_events,
               sum(CASE WHEN abs(e.value - s.med)
                             > {MAD_THRESHOLD * MAD_K} * s.mad
                        THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        FROM events e JOIN mad s USING (event_type)
        GROUP BY e.event_type
    """,
    "analytics_ewma_smoothing": f"""
        WITH lists AS (
            SELECT event_id, event_type,
                   list(value) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                       ROWS BETWEEN {EWMA_WINDOW - 1} PRECEDING AND CURRENT ROW
                   ) AS l
            FROM events
        )
        SELECT event_id, event_type,
               round(
                   list_sum(list_transform(
                       l, (v, i) -> v * pow({EWMA_DECAY}, len(l) - i)
                   )) / (2.0 - pow({EWMA_DECAY}, len(l) - 1)),
               6) AS ewma_value
        FROM lists
    """,
    "analytics_gap_fill_hourly": """
        WITH hourly AS (
            SELECT date_trunc('hour', ts)::TIMESTAMP AS hour, event_type,
                   count(*) AS n,
                   ((sum(CAST(round(value * 100) AS BIGINT)) * 2000000
                     + count(*) * 100)
                    // (count(*) * 200)) / 1000000.0 AS avg_value
            FROM events GROUP BY 1, 2
        ),
        spine AS (
            SELECT event_type,
                   unnest(generate_series(date_trunc('hour', min(ts))::TIMESTAMP,
                                          date_trunc('hour', max(ts))::TIMESTAMP,
                                          INTERVAL 1 HOUR)) AS hour
            FROM events GROUP BY event_type
        )
        SELECT s.event_type, s.hour,
               coalesce(h.n, 0) AS events,
               h.n IS NULL AS is_gap,
               last_value(h.avg_value IGNORE NULLS)
                   OVER (PARTITION BY s.event_type ORDER BY s.hour
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS avg_value_filled
        FROM spine s LEFT JOIN hourly h
          ON s.event_type = h.event_type AND s.hour = h.hour
    """,
    "analytics_event_transitions": """
        WITH pairs AS (
            SELECT user_id,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS from_type,
                   event_type AS to_type
            FROM events
        ),
        counts AS (
            SELECT from_type, to_type, count(*) AS transitions
            FROM pairs WHERE from_type IS NOT NULL
            GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, transitions,
               round(transitions * 1.0 / sum(transitions)
                     OVER (PARTITION BY from_type), 6) AS p_transition
        FROM counts
    """,
    "analytics_conversion_latency": """
        WITH firsts AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
                   min(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS first_purchase_ts
            FROM events GROUP BY user_id
        ),
        lat AS (
            SELECT (epoch_us(first_purchase_ts) - epoch_us(signup_ts)) / 1000000.0
                       AS latency_secs
            FROM firsts
            WHERE signup_ts IS NOT NULL AND first_purchase_ts > signup_ts
        )
        SELECT count(*) AS n_converted,
               round(quantile_cont(latency_secs, 0.5), 3) AS p50_secs,
               round(quantile_cont(latency_secs, 0.9), 3) AS p90_secs,
               round(quantile_cont(latency_secs, 0.99), 3) AS p99_secs
        FROM lat
    """,
    "analytics_cdc_compaction": """
        SELECT user_id,
               event_id AS last_event_id,
               event_type AS last_event_type,
               value AS last_value,
               max_ts AS last_ts
        FROM (
            SELECT *,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn,
                   max(ts) OVER (PARTITION BY user_id) AS max_ts
            FROM events
        )
        WHERE rn = 1
    """,
    "analytics_key_skew_report": """
        WITH counts AS (
            SELECT user_id, count(*) AS n FROM events GROUP BY user_id
        )
        SELECT rank, user_id, n, share_pct FROM (
            SELECT user_id, n,
                   row_number() OVER (ORDER BY n DESC, user_id) AS rank,
                   round(n * 100.0 / sum(n) OVER (), 4) AS share_pct
            FROM counts
        )
        WHERE rank <= 5
    """,
    "analytics_rolling_hourly_avg": """
        SELECT user_id, event_id, ts,
               ((sum(CAST(round(value * 100) AS BIGINT)) OVER w * 20000
                 + count(value) OVER w * 100)
                // (count(value) OVER w * 200)) / 10000.0
                   AS trailing_1h_avg,
               count(value) OVER w AS trailing_1h_n
        FROM events
        WHERE user_id < 30
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    "analytics_spend_quartiles": """
        WITH spend AS (
            SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
            FROM orders GROUP BY o_custkey
        ),
        tiles AS (
            SELECT *, ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS quartile
            FROM spend
        )
        SELECT quartile, count(*) AS n_customers,
               min(spend) AS min_spend, max(spend) AS max_spend
        FROM tiles GROUP BY quartile
    """,
    "analytics_multigrain_rollup": """
        SELECT CASE WHEN grouping(minute) = 0 THEN 'minute'
                    WHEN grouping(hour) = 0 THEN 'hour'
                    WHEN grouping(day) = 0 THEN 'day'
                    ELSE 'all' END AS grain,
               coalesce(minute, hour, day) AS bucket_ts,
               count(*) AS events,
               round(sum(value), 4) AS total_value
        FROM (
            SELECT date_trunc('day', ts)::TIMESTAMP AS day,
                   date_trunc('hour', ts)::TIMESTAMP AS hour,
                   date_trunc('minute', ts)::TIMESTAMP AS minute,
                   value
            FROM events
        )
        GROUP BY ROLLUP (day, hour, minute)
    """,
    "analytics_pivot_daily": """
        SELECT date_trunc('day', ts)::TIMESTAMP AS day,
               count(*) FILTER (event_type = 'click') AS click,
               count(*) FILTER (event_type = 'error') AS error,
               count(*) FILTER (event_type = 'purchase') AS purchase,
               count(*) FILTER (event_type = 'signup') AS signup,
               count(*) FILTER (event_type = 'view') AS view
        FROM events
        GROUP BY 1
    """,
    "analytics_unpivot_measures": """
        SELECT 'quantity' AS measure, round(sum(l_quantity), 2) AS total
        FROM lineitem
        UNION ALL
        SELECT 'extendedprice', round(sum(l_extendedprice), 2) FROM lineitem
        UNION ALL
        SELECT 'discount', round(sum(l_discount), 2) FROM lineitem
    """,
    "analytics_user_streaks": """
        WITH days AS (
            SELECT DISTINCT user_id, ts::DATE AS d FROM events
        ),
        islands AS (
            SELECT user_id, d,
                   d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                            AS INTEGER) AS anchor
            FROM days
        ),
        streaks AS (
            SELECT user_id, anchor,
                   count(*) AS streak_len,
                   min(d) AS streak_start,
                   max(d) AS streak_end
            FROM islands GROUP BY user_id, anchor
        )
        SELECT user_id, n_active_days, streak_len AS best_streak,
               streak_start, streak_end
        FROM (
            SELECT *,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY streak_len DESC, streak_start ASC)
                       AS rn,
                   sum(streak_len) OVER (PARTITION BY user_id)::BIGINT
                       AS n_active_days
            FROM streaks
        )
        WHERE rn = 1
    """,
    "analytics_p50_exact": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               count(*) AS n_events
        FROM events
        GROUP BY event_type
    """,
    "analytics_markov_kstep": """
        WITH pairs AS (
            SELECT lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS f,
                   event_type AS t
            FROM events
        ),
        P AS MATERIALIZED (
            SELECT f, t,
                   count(*)::DOUBLE
                       / sum(count(*)) OVER (PARTITION BY f) AS p
            FROM pairs WHERE f IS NOT NULL GROUP BY f, t
        ),
        firsts AS (
            SELECT event_type AS t FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) = 1
        ),
        p0 AS MATERIALIZED (
            SELECT t, count(*)::DOUBLE / (SELECT count(*) FROM firsts) AS p
            FROM firsts GROUP BY t
        ),
        s1 AS MATERIALIZED (
            SELECT P.t, round(sum(p0.p * P.p), 12) AS p
            FROM p0 JOIN P ON p0.t = P.f GROUP BY P.t
        ),
        s2 AS MATERIALIZED (
            SELECT P.t, round(sum(s1.p * P.p), 12) AS p
            FROM s1 JOIN P ON s1.t = P.f GROUP BY P.t
        ),
        s3 AS MATERIALIZED (
            SELECT P.t, round(sum(s2.p * P.p), 12) AS p
            FROM s2 JOIN P ON s2.t = P.f GROUP BY P.t
        ),
        s4 AS MATERIALIZED (
            SELECT P.t, round(sum(s3.p * P.p), 12) AS p
            FROM s3 JOIN P ON s3.t = P.f GROUP BY P.t
        )
        SELECT coalesce(p0.t, s4.t) AS event_type,
               round(coalesce(p0.p, 0.0), 6) AS p_start,
               round(coalesce(s4.p, 0.0), 6) AS p_after_k
        FROM p0 FULL OUTER JOIN s4 ON p0.t = s4.t
    """,
    "analytics_hh_turnover": f"""
        WITH ev AS (
            SELECT user_id, epoch_us(ts) AS us FROM events
        ),
        span AS (
            SELECT (min(us) + max(us)) // 2 AS mid FROM ev
        ),
        counts AS (
            SELECT (us <= (SELECT mid FROM span)) AS h1, user_id,
                   count(*) AS cnt
            FROM ev GROUP BY 1, 2
        ),
        ranked AS (
            SELECT h1, user_id,
                   row_number() OVER (PARTITION BY h1
                                      ORDER BY cnt DESC, user_id) AS rank
            FROM counts
        ),
        top AS (SELECT * FROM ranked WHERE rank <= {HH_TURNOVER_K}),
        j AS (
            SELECT coalesce(a.user_id, b.user_id) AS u,
                   a.user_id IS NOT NULL AS in1,
                   b.user_id IS NOT NULL AS in2
            FROM (SELECT user_id FROM top WHERE h1) a
            FULL OUTER JOIN (SELECT user_id FROM top WHERE NOT h1) b
              ON a.user_id = b.user_id
        )
        SELECT sum(CASE WHEN in1 AND in2 THEN 1 ELSE 0 END)::BIGINT
                   AS n_stayed,
               sum(CASE WHEN NOT in1 AND in2 THEN 1 ELSE 0 END)::BIGINT
                   AS n_entered,
               sum(CASE WHEN in1 AND NOT in2 THEN 1 ELSE 0 END)::BIGINT
                   AS n_exited,
               round(sum(CASE WHEN in1 AND in2 THEN 1 ELSE 0 END)::DOUBLE
                     / count(*), 6) AS jaccard
        FROM j
    """,
    "analytics_trimmed_stats": """
        WITH c AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS vc
            FROM events
        ),
        q AS (
            SELECT event_type,
                   quantile_cont(vc, 0.05) AS p05,
                   quantile_cont(vc, 0.95) AS p95,
                   count(*) AS n_events
            FROM c GROUP BY event_type
        ),
        a AS (
            SELECT c.event_type, q.p05, q.p95, q.n_events,
                   sum(CASE WHEN vc >= p05 AND vc <= p95 THEN vc
                            ELSE 0 END)::BIGINT AS s_in,
                   sum(CASE WHEN vc >= p05 AND vc <= p95 THEN 1
                            ELSE 0 END)::BIGINT AS n_in,
                   sum(CASE WHEN vc < p05 THEN 1 ELSE 0 END)::BIGINT AS n_lo,
                   sum(CASE WHEN vc > p95 THEN 1 ELSE 0 END)::BIGINT AS n_hi
            FROM c JOIN q USING (event_type)
            GROUP BY 1, 2, 3, 4
        )
        SELECT event_type, n_events,
               round(s_in / (100.0 * n_in), 6) AS trimmed_mean,
               round((s_in + n_lo * p05 + n_hi * p95)
                     / (100.0 * n_events), 6) AS winsorized_mean
        FROM a
    """,
    "analytics_zscore": """
        WITH stats AS (
            SELECT user_id,
                   avg(value) AS mean,
                   stddev_pop(value) AS std
            FROM events GROUP BY user_id
        )
        SELECT e.user_id, e.event_id,
               CASE WHEN s.std > 0
                    THEN round((e.value - s.mean) / s.std, 6)
                    ELSE 0.0 END AS zscore
        FROM events e JOIN stats s ON e.user_id = s.user_id
    """,
    "analytics_user_trend": """
        WITH s AS (
            SELECT user_id,
                   count(*) AS n_events,
                   round(corr(value, (epoch_us(ts) / 1e6 - 1704067200.0) / 86400.0), 6)
                       AS value_time_corr,
                   sum((epoch_us(ts) / 1e6 - 1704067200.0) / 86400.0) AS sx,
                   sum(value) AS sy,
                   sum((epoch_us(ts) / 1e6 - 1704067200.0) / 86400.0 * value) AS sxy,
                   sum((epoch_us(ts) / 1e6 - 1704067200.0) / 86400.0
                       * ((epoch_us(ts) / 1e6 - 1704067200.0) / 86400.0)) AS sxx
            FROM events
            GROUP BY user_id
        )
        SELECT user_id, n_events, value_time_corr,
               round((n_events * sxy - sx * sy)
                     / (n_events * sxx - sx * sx), 6) AS value_per_day
        FROM s
    """,
    "analytics_salted_join": """
        WITH user_dim AS (
            SELECT user_id AS u_key, count(*) AS user_total
            FROM events GROUP BY user_id
        )
        SELECT event_type,
               count(*) AS n_events,
               ((sum(user_total) * 2000000 + count(*))
                // (count(*) * 2)) / 1000000.0 AS avg_user_total,
               max(user_total) AS max_user_total
        FROM events e JOIN user_dim d ON e.user_id = d.u_key
        GROUP BY event_type
    """,
    "analytics_event_funnel": """
        WITH firsts AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
                   min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
            FROM events
            WHERE event_type IN ('view', 'click', 'purchase')
            GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                   AS stage_view,
               sum(CASE WHEN first_click > first_view THEN 1 ELSE 0 END)::BIGINT
                   AS stage_click,
               sum(CASE WHEN first_click > first_view
                         AND first_purchase > first_click THEN 1 ELSE 0 END)::BIGINT
                   AS stage_purchase
        FROM firsts
    """,
    "analytics_weekly_retention": """
        WITH first AS (
            SELECT user_id, date_trunc('week', min(ts))::TIMESTAMP AS cohort_week
            FROM events GROUP BY user_id
        )
        SELECT cohort_week,
               ((epoch(date_trunc('week', ts)) - epoch(cohort_week)) / 604800)::INT
                   AS week_offset,
               count(DISTINCT e.user_id) AS active_users
        FROM events e JOIN first f ON e.user_id = f.user_id
        GROUP BY 1, 2
    """,
    "analytics_top_decile_share": """
        WITH spend AS (
            SELECT c_custkey, c_mktsegment,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT c_mktsegment, spend_cents,
                   row_number() OVER (PARTITION BY c_mktsegment
                       ORDER BY spend_cents ASC, c_custkey ASC) AS i,
                   count(*) OVER (PARTITION BY c_mktsegment) AS n,
                   sum(spend_cents) OVER (PARTITION BY c_mktsegment) AS total
            FROM spend
        )
        SELECT c_mktsegment,
               max(n)::BIGINT AS n_customers,
               max((n + 9) // 10)::BIGINT AS top_customers,
               round(sum(CASE WHEN i > n - (n + 9) // 10
                              THEN spend_cents ELSE 0 END)::DOUBLE
                     / max(total)::DOUBLE, 6) AS top_decile_share
        FROM ranked
        GROUP BY c_mktsegment
    """,
    "analytics_gini_concentration": """
        WITH spend AS (
            SELECT c_custkey, c_mktsegment,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT c_mktsegment, spend_cents,
                   row_number() OVER (PARTITION BY c_mktsegment
                       ORDER BY spend_cents ASC, c_custkey ASC) AS i
            FROM spend
        ),
        agg AS (
            SELECT c_mktsegment, count(*) AS n_customers,
                   sum(spend_cents) AS sx,
                   sum(i * spend_cents) AS six
            FROM ranked GROUP BY 1
        )
        SELECT c_mktsegment, n_customers,
               round(sx::DOUBLE / 100.0, 2) AS total_spend,
               round((2 * six - (n_customers + 1) * sx)::DOUBLE
                     / (n_customers * sx)::DOUBLE, 6) AS gini
        FROM agg
    """,
    "analytics_survival_churn": """
        WITH pu AS (
            SELECT user_id,
                   min(date_trunc('day', ts))::TIMESTAMP AS f,
                   max(date_trunc('day', ts))::TIMESTAMP AS l
            FROM events GROUP BY 1
        ),
        g AS (SELECT max(l) AS gmax FROM pu),
        per AS (
            SELECT date_diff('day', f, l) AS duration,
                   CASE WHEN l < g.gmax THEN 1 ELSE 0 END AS churned
            FROM pu, g
        ),
        per_dur AS (
            SELECT duration, count(*) AS n_total, sum(churned) AS n_churned
            FROM per GROUP BY 1
        ),
        tot AS (SELECT sum(n_total) AS total_users FROM per_dur),
        s1 AS (
            SELECT duration, n_total, n_churned,
                   (t.total_users
                    - sum(n_total) OVER (ORDER BY duration
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    + n_total)::BIGINT AS n_at_risk
            FROM per_dur, tot t
        ),
        s2 AS (
            SELECT duration, n_at_risk, n_churned,
                   CAST(round(ln(greatest(1.0 - n_churned / n_at_risk,
                                          1e-18)) * 1e9) AS BIGINT) AS term
            FROM s1
        )
        SELECT duration::INT AS duration, n_at_risk,
               n_churned::BIGINT AS n_churned,
               round(exp(sum(term) OVER (ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   / 1e9), 6) AS survival
        FROM s2
    """,
    "analytics_cusum_changepoint": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts)::TIMESTAMP AS hour,
                   count(*) AS x
            FROM events GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, hour,
                   sum(x) OVER pw AS s,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY hour) AS t
            FROM hourly
            WINDOW pw AS (PARTITION BY event_type ORDER BY hour
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        totals AS (
            SELECT event_type, sum(x) AS total, count(*) AS n_hours
            FROM hourly GROUP BY 1
        ),
        stat AS (
            SELECT c.event_type, c.hour,
                   (t.n_hours * c.s - c.t * t.total)::BIGINT AS stat,
                   t.n_hours
            FROM cum c JOIN totals t USING (event_type)
        )
        SELECT event_type, hour AS cp_hour,
               abs(stat)::BIGINT AS max_abs_stat, n_hours
        FROM stat
        QUALIFY row_number() OVER (PARTITION BY event_type
                                   ORDER BY abs(stat) DESC, hour ASC) = 1
    """,
    "analytics_cohort_ltv": """
        WITH first AS (
            SELECT user_id, date_trunc('week', min(ts))::TIMESTAMP AS cohort_week
            FROM events GROUP BY user_id
        ),
        sizes AS (
            SELECT cohort_week, count(*) AS cohort_users FROM first GROUP BY 1
        ),
        weekly AS (
            SELECT f.cohort_week,
                   ((epoch(date_trunc('week', e.ts)) - epoch(f.cohort_week))
                    / 604800)::INT AS age_week,
                   sum(CAST(round(e.value * 100) AS BIGINT))::BIGINT
                       AS week_rev_cents
            FROM events e JOIN first f ON e.user_id = f.user_id
            WHERE e.event_type = 'purchase'
            GROUP BY 1, 2
        ),
        cum AS (
            SELECT w.cohort_week, w.age_week, s.cohort_users, w.week_rev_cents,
                   (sum(w.week_rev_cents) OVER (
                        PARTITION BY w.cohort_week ORDER BY w.age_week
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ))::BIGINT AS ltv_cents
            FROM weekly w JOIN sizes s ON w.cohort_week = s.cohort_week
        )
        SELECT cohort_week, age_week, cohort_users, week_rev_cents, ltv_cents,
               CAST(ltv_cents AS DOUBLE) / cohort_users AS ltv_per_user_cents
        FROM cum
    """,
    "analytics_props_json": """
        SELECT (floor(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10) * 10)::INT
                   AS k_bucket,
               count(*) AS n_events,
               ((sum(CAST(round(value * 100) AS BIGINT)) * 20000
                 + count(*) * 100) // (count(*) * 200)) / 10000.0 AS avg_value
        FROM events
        GROUP BY 1
    """,
    "analytics_p95_windowed": _P95_WINDOWED_ORACLE,
    "analytics_salted_counts": """
        SELECT event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS total_value,
               max(ts) AS max_ts
        FROM events
        GROUP BY event_type
    """,
    "analytics_session_windows": """
        WITH gaps AS (
            SELECT user_id, event_id, ts,
                   epoch_us(ts) - epoch_us(lag(ts) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
            FROM events
        ),
        marked AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN gap IS NULL OR gap > 30 * 60 * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM gaps
        ),
        numbered AS (
            SELECT user_id, ts,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                       AS session_seq
            FROM marked
        )
        SELECT user_id, session_seq,
               count(*) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end,
               round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0, 3)
                   AS duration_secs
        FROM numbered
        GROUP BY user_id, session_seq
    """,
    "analytics_throughput_30s": """
        SELECT to_timestamp(floor(epoch(ts) / 30) * 30)::TIMESTAMP AS window_start,
               event_type,
               count(*) AS events,
               round(count(*) / 30.0, 6) AS rate_per_sec
        FROM events
        GROUP BY 1, 2
    """,
    "analytics_sliding_rate": """
        SELECT to_timestamp(floor(epoch(ts) / 5) * 5 - i * 5)::TIMESTAMP AS window_start,
               count(*) AS events,
               round(count(*) / 30.0, 6) AS rate_per_sec
        FROM events CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS i)
        GROUP BY 1
    """,
    "analytics_consumer_lag": """
        SELECT event_type,
               round((epoch_us((SELECT max(ts) FROM events)) - epoch_us(max(ts)))
                     / 1000000.0, 6) AS lag_seconds
        FROM events
        GROUP BY event_type
    """,
    "analytics_p95_histogram": _P95_ORACLE,
    "analytics_payload_size_hist": """
        WITH buckets(le) AS (SELECT CAST(x AS DOUBLE) FROM (VALUES (8.0),(16.0),(32.0),(64.0),(128.0),(256.0)) v(x))
        SELECT b.le, count(*) AS cum_count
        FROM events e JOIN buckets b ON strlen(e.props) <= b.le
        GROUP BY b.le
    """,
}
