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
from ssiintegrateddatapipeline_spark.sources.batch import local_frame


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
        dim = local_frame(spark, 
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
    dim = local_frame(spark, exploded, "_bucket long, lo double, hi double, band string")
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


# ---------------------------------------------------------------------------
# Interval analytics — binned interval self-join & sweep-line concurrency
# ---------------------------------------------------------------------------

# Sessions are padded by the inactivity timeout: a user is "active" from
# the session's first event until 30 minutes after its last (half-open
# [start, end+pad) activity window — the same 30-minute gap that DEFINES
# the session, so the pad is the session's own timeout, not a new knob).
ACTIVITY_PAD_US = 30 * 60 * 1_000_000

# Bin width for the interval self-join: 1 hour ~ the p99 padded-session
# span, so each interval explodes to O(1) bins (<=3 here). At other span
# distributions pick W ~ median interval length — the classic tuning rule
# for binned range joins.
OVERLAP_BIN_US = 60 * 60 * 1_000_000

# Nearest-event tolerance: +/- 6 h (events average ~10 h apart per user at
# the test scales; the tolerance exists to show the bounded-search
# semantics, not to catch everything).
NEAREST_TOL_US = 6 * 3600 * 1_000_000


def _padded_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity intervals ``[su, eu)`` in unix-micros, derived
    from the same 30-minute-gap sessionization as
    ``analytics_session_windows`` (single source of session truth)."""
    from ssiintegrateddatapipeline_spark.caches import track
    from ssiintegrateddatapipeline_spark.operators.analytics import (
        session_windows,
    )

    # persisted: the interval queries consume this frame from multiple
    # plan branches (self-join sides, boundary-event fan-out) — without
    # pinning, each branch re-runs the full sessionization windows. The
    # frame is one row per session (an aggregate of events — orders of
    # magnitude smaller than its input), so the pin is cheap at any scale.
    return track(
        session_windows(spark, sf_dir)
        .select(
            "user_id",
            "session_seq",
            F.unix_micros("session_start").alias("su"),
            (F.unix_micros("session_end") + F.lit(ACTIVITY_PAD_US)).alias("eu"),
        )
        .persist()
    )


def _overlap_pairs(sess: DataFrame) -> DataFrame:
    """Distinct cross-user overlapping interval pairs ``(u1, u2, ov_us)``
    from ``(user_id, su, eu)`` half-open intervals, via the binned
    equi-join described in :func:`session_overlap` (shared with the
    equivalence test so the proof covers the production join)."""
    w = F.lit(OVERLAP_BIN_US)
    binned = sess.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("su") / w), F.floor((F.col("eu") - 1) / w)
            )
        ),
    )
    a = binned.alias("a")
    b = binned.alias("b")
    ov_start = F.greatest(F.col("a.su"), F.col("b.su"))
    ov_end = F.least(F.col("a.eu"), F.col("b.eu"))
    return a.join(
        b,
        (F.col("a.bin") == F.col("b.bin"))
        & (F.col("a.user_id") < F.col("b.user_id"))
        & (F.col("a.su") < F.col("b.eu"))
        & (F.col("b.su") < F.col("a.eu"))
        & (F.col("a.bin") == F.floor(ov_start / w)),
    ).select(
        F.col("a.user_id").alias("u1"),
        F.col("b.user_id").alias("u2"),
        (ov_end - ov_start).alias("ov_us"),
    )


def session_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-user concurrent-activity report via a BINNED interval
    self-join — the scale pattern for interval-overlap joins Spark lacks
    natively.

    A naive overlap join (``a.s < b.e AND b.s < a.e``) is non-equi and
    physically a nested-loop over all session pairs — O(n^2) at any real
    volume. Binning restores an equi-join: each interval explodes to the
    fixed-width time bins it covers (O(1) bins per interval when the bin
    width ~ interval span), the join key becomes the bin, and the exact
    overlap predicate filters within the bin. A pair overlapping several
    bins is emitted ONCE by keeping only the bin that contains the
    overlap's start (``floor(greatest(su)/W)``) — a filter, not a
    ``distinct`` shuffle. At 100 TB: the join shuffles on the bin key
    (hash join, AQE-skew-splittable); per-bin density is the inherent
    output bound of any interval join — hot bins mean genuinely quadratic
    overlap output, not an avoidable plan artifact.
    """
    pairs = _overlap_pairs(_padded_sessions(spark, sf_dir))
    # fan each pair out to both participants with ONE explode, not a
    # union of two selects — a union re-executes the join lineage per
    # branch, doubling the (expensive) pair computation
    per_user = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("u1").alias("user_id"), F.col("u2").alias("partner")
                ),
                F.struct(
                    F.col("u2").alias("user_id"), F.col("u1").alias("partner")
                ),
            )
        ).alias("p"),
        "ov_us",
    ).select("p.user_id", "p.partner", "ov_us")
    return per_user.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.count_distinct("partner").alias("n_partners"),
        F.round(F.sum("ov_us") / F.lit(1e6), 3).alias("overlap_secs"),
    )


def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent active users per hour via SWEEP-LINE — the other
    half of the interval toolkit: when the question is "how many overlap"
    rather than "which pairs overlap", the O(n^2) join collapses to a
    running sum over +1/-1 boundary events.

    The running sum is a GLOBAL cumulative aggregate — the textbook
    single-partition-window trap — so it rides
    :func:`~ssiintegrateddatapipeline_spark.functions.twophase.two_phase_prefix_sum`:
    day-bucketed partial sums with literal-folded per-bucket offsets, no
    ``Exchange SinglePartition``. Ties order ``(t, delta)`` — ends (-1)
    before starts (+1) at the same instant, matching the half-open
    ``[start, end)`` activity windows. The within-hour maximum is
    invariant to ordering among equal ``(t, delta)`` rows (the multiset
    of prefix values inside a tie group does not depend on it), so the
    result is deterministic and exactly replayable by the oracle's window.
    """
    from ssiintegrateddatapipeline_spark.functions.twophase import (
        two_phase_prefix_sum,
    )

    sess = _padded_sessions(spark, sf_dir)
    deltas = sess.select(
        F.col("su").alias("t_us"), F.lit(1).alias("delta")
    ).unionByName(
        sess.select(F.col("eu").alias("t_us"), F.lit(-1).alias("delta"))
    )
    day_us = 86_400 * 1_000_000
    run = two_phase_prefix_sum(
        deltas,
        bucket=F.floor(F.col("t_us") / F.lit(day_us)).cast("int"),
        order_by=[F.col("t_us"), F.col("delta")],
        val=F.col("delta"),
        out="conc",
    )
    return run.groupBy(
        F.date_trunc("hour", F.timestamp_micros("t_us")).alias("hour")
    ).agg(F.max("conc").alias("peak_concurrency"))


def nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional nearest-neighbor-in-time join with tolerance (pandas
    ``merge_asof(direction='nearest', tolerance=...)`` semantics, which
    Spark lacks): each error event is matched to the closest click by the
    same user within +/- 6 h, or null.

    Same union+window formulation as :func:`asof_join`, run in BOTH
    directions off ONE shuffle: the backward candidate is
    ``last(click, ignorenulls)`` over the preceding frame and the forward
    candidate ``first(click, ignorenulls)`` over the following frame of
    the SAME sort (clicks order before errors at equal timestamps, so a
    same-instant click is a backward match — gap 0 — and never double
    counted forward). Catalyst plans both window frames over a single
    hash exchange + sort on ``user_id``. Ties prefer the backward match
    (pandas' rule); ``gap_secs`` is signed (negative = click before
    error). Cost at 100 TB: one shuffle + sort per side union — identical
    to the plain as-of join, with no range-join candidate explosion.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("error_id"),
        F.lit(None).cast("timestamp").alias("error_ts"),
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    # Both directions as RUNNING (unboundedPreceding -> currentRow)
    # frames: the natural spelling of the forward side —
    # ``first(...).over(rowsBetween(currentRow, unboundedFollowing))`` —
    # hits Spark's UnboundedFollowingWindowFunctionFrame, which rescans
    # the remaining frame for EVERY row: O(partition^2), measured 4.4 s
    # at sf0.1 and super-linear beyond. Scanning the REVERSED sort with a
    # running frame ("last click seen so far" = first click at-or-after
    # in real order) is the O(n log n) form; reversing (ts, side,
    # click_id) wholesale preserves the tie rule (same-instant clicks
    # sort before the error in real order, hence are NOT yet seen by the
    # reversed scan — backward-only, never double counted). One hash
    # exchange on user_id serves both window sorts.
    wb = Window.partitionBy("user_id").orderBy(
        "ts", "side", "click_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(),
        F.col("side").desc(),
        F.col("click_id").desc_nulls_last(),
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried = clicks.unionByName(errors).select(
        "side",
        "user_id",
        "error_id",
        F.last("click_id", ignorenulls=True).over(wb).alias("back_id"),
        (
            F.unix_micros("error_ts")
            - F.unix_micros(F.last("click_ts", ignorenulls=True).over(wb))
        ).alias("gb"),
        F.last("click_id", ignorenulls=True).over(wf).alias("fwd_id"),
        (
            F.unix_micros(F.last("click_ts", ignorenulls=True).over(wf))
            - F.unix_micros("error_ts")
        ).alias("gf"),
    ).where(F.col("side") == 1)
    tol = F.lit(NEAREST_TOL_US)
    back_wins = (
        F.col("gb").isNotNull()
        & (F.col("gb") <= tol)
        & (F.col("gf").isNull() | (F.col("gf") > tol) | (F.col("gb") <= F.col("gf")))
    )
    fwd_wins = ~back_wins & F.col("gf").isNotNull() & (F.col("gf") <= tol)
    return carried.select(
        "user_id",
        "error_id",
        F.when(back_wins, F.col("back_id"))
        .when(fwd_wins, F.col("fwd_id"))
        .alias("nearest_click_id"),
        F.when(back_wins, F.lit("back"))
        .when(fwd_wins, F.lit("fwd"))
        .alias("direction"),
        F.when(back_wins, F.round(-F.col("gb") / F.lit(1e6), 3))
        .when(fwd_wins, F.round(F.col("gf") / F.lit(1e6), 3))
        .alias("gap_secs"),
    )


ASOF_TOLERANCE_S = 3600  # attribution window: 1 hour


def tolerance_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE (the pandas ``merge_asof(tolerance=...)``
    semantic): a purchase is attributed to the user's most recent view
    only if it happened within the last hour — staler matches become
    organic (NULL attribution) instead of silently claiming credit.
    Post-filters the plain as-of join's rows, so the join plan is
    unchanged; the tolerance test runs on the already-rounded gap column
    in both engines (no fresh float boundary).
    """
    lt = last_touch(spark, sf_dir)
    within = F.col("gap_secs") <= ASOF_TOLERANCE_S
    return lt.select(
        "user_id",
        "purchase_id",
        "purchase_ts",
        F.when(within, F.col("last_view_id")).alias("attributed_view_id"),
        F.when(within, F.col("gap_secs")).alias("gap_secs"),
        F.coalesce(within, F.lit(False)).alias("attributed"),
    )


ACTIVITY_WINDOW_US = 300_000_000  # each event opens a 5-minute window


def interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged interval coverage per user (the gaps-and-islands problem) —
    the third leg of the interval toolkit next to the binned overlap join
    and the sweep-line concurrency count: every event opens a 5-minute
    activity window, overlapping windows merge into islands via the
    running-max-end sweep, and the report is each user's island count,
    total covered time and longest unbroken stretch.

    Island detection: a row starts a new island iff its start exceeds the
    max end among ALL its predecessors (not just the previous row — an
    earlier long interval can swallow several later ones); the island id
    is the running sum of those flags. Per-user sequence windows are the
    sessionization shape (cf. analytics_user_streaks): partitioned by a
    key whose per-key row count is bounded by activity, not corpus size.
    All arithmetic is exact integer microseconds — no float anywhere.
    Tied timestamps are order-invariant: a tied row always lands in the
    tie-opener's island (its window end covers the twin's start), so no
    tiebreak column is needed.
    """
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + ACTIVITY_WINDOW_US).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s")
    prev_end = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flag = F.when(prev_end.isNull() | (F.col("s") > prev_end), 1).otherwise(0)
    islands = (
        t.withColumn("flag", flag)
        .withColumn(
            "island",
            F.sum("flag").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "island")
        .agg(F.min("s").alias("st"), F.max("e").alias("en"))
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("en") - F.col("st")).alias("covered_us"),
        F.max(F.col("en") - F.col("st")).alias("max_island_us"),
    )


QUERIES = {
    "asof_last_touch": last_touch,
    "asof_tolerance_touch": tolerance_last_touch,
    "asof_nearest_event": nearest_event,
    "range_band_pricing": range_band_pricing,
    "range_session_overlap": session_overlap,
    "range_interval_union": interval_union,
    "analytics_peak_concurrency": peak_concurrency,
}

# Shared session-interval CTE for the interval oracles: identical
# 30-minute-gap sessionization to the analytics_session_windows oracle,
# padded to half-open [su, eu) activity windows in unix-micros.
_SESSIONS_CTE = """
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
    ),
    sessions AS (
        SELECT user_id, session_seq,
               epoch_us(min(ts)) AS su,
               epoch_us(max(ts)) + 30 * 60 * 1000000 AS eu
        FROM numbered GROUP BY user_id, session_seq
    )
"""

_LAST_TOUCH_SQL = """
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
    """

ORACLES = {
    # same union+window formulation in DuckDB (not its native ASOF JOIN, so
    # tie-breaking semantics are pinned identically on both sides)
    "asof_last_touch": _LAST_TOUCH_SQL,
    "asof_tolerance_touch": f"""
        WITH base AS ({_LAST_TOUCH_SQL})
        SELECT user_id, purchase_id, purchase_ts,
               CASE WHEN gap_secs <= {ASOF_TOLERANCE_S} THEN last_view_id END
                   AS attributed_view_id,
               CASE WHEN gap_secs <= {ASOF_TOLERANCE_S} THEN gap_secs END AS gap_secs,
               coalesce(gap_secs <= {ASOF_TOLERANCE_S}, FALSE) AS attributed
        FROM base
    """,
    # the oracle states overlap DECLARATIVELY (plain inequality self-join)
    # — the binned equi-join must reproduce it exactly
    "range_interval_union": f"""
        WITH t AS (
            SELECT user_id, epoch_us(ts) AS s,
                   epoch_us(ts) + {ACTIVITY_WINDOW_US} AS e
            FROM events
        ),
        flagged AS (
            SELECT user_id, s, e,
                   CASE WHEN max(e) OVER pw IS NULL OR s > max(e) OVER pw
                        THEN 1 ELSE 0 END AS flag
            FROM t
            WINDOW pw AS (PARTITION BY user_id ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ),
        islands AS (
            SELECT user_id, s, e,
                   sum(flag) OVER (PARTITION BY user_id ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS island
            FROM flagged
        ),
        merged AS (
            SELECT user_id, island, min(s) AS st, max(e) AS en
            FROM islands GROUP BY 1, 2
        )
        SELECT user_id, count(*) AS n_islands,
               sum(en - st)::BIGINT AS covered_us,
               max(en - st)::BIGINT AS max_island_us
        FROM merged GROUP BY user_id
    """,
    "range_session_overlap": _SESSIONS_CTE + """
        , pairs AS (
            SELECT a.user_id AS u1, b.user_id AS u2,
                   least(a.eu, b.eu) - greatest(a.su, b.su) AS ov_us
            FROM sessions a JOIN sessions b
              ON a.user_id < b.user_id
             AND a.su < b.eu AND b.su < a.eu
        ),
        per_user AS (
            SELECT u1 AS user_id, u2 AS partner, ov_us FROM pairs
            UNION ALL
            SELECT u2, u1, ov_us FROM pairs
        )
        SELECT user_id,
               count(*) AS n_overlaps,
               count(DISTINCT partner) AS n_partners,
               round(sum(ov_us) / 1e6, 3) AS overlap_secs
        FROM per_user GROUP BY user_id
    """,
    "analytics_peak_concurrency": _SESSIONS_CTE + """
        , deltas AS (
            SELECT su AS t_us, 1 AS delta FROM sessions
            UNION ALL
            SELECT eu, -1 FROM sessions
        ),
        run AS (
            SELECT t_us,
                   sum(delta) OVER (ORDER BY t_us, delta
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                       AS conc
            FROM deltas
        )
        SELECT date_trunc('hour', make_timestamp(t_us)) AS hour,
               max(conc) AS peak_concurrency
        FROM run GROUP BY hour
    """,
    "asof_nearest_event": f"""
        WITH u AS (
            SELECT user_id, ts, 0 AS side, event_id AS click_id,
                   ts AS click_ts, NULL::BIGINT AS error_id,
                   NULL::TIMESTAMP AS error_ts
            FROM events WHERE event_type = 'click'
            UNION ALL
            SELECT user_id, ts, 1, NULL, NULL, event_id, ts
            FROM events WHERE event_type = 'error'
        ),
        carried AS (
            SELECT side, user_id, error_id,
                   last_value(click_id IGNORE NULLS) OVER wb AS back_id,
                   epoch_us(error_ts) - epoch_us(
                       last_value(click_ts IGNORE NULLS) OVER wb) AS gb,
                   first_value(click_id IGNORE NULLS) OVER wf AS fwd_id,
                   epoch_us(first_value(click_ts IGNORE NULLS) OVER wf)
                       - epoch_us(error_ts) AS gf
            FROM u
            WINDOW wb AS (PARTITION BY user_id ORDER BY ts, side, click_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wf AS (PARTITION BY user_id ORDER BY ts, side, click_id
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        ),
        scored AS (
            SELECT user_id, error_id, back_id, gb, fwd_id, gf,
                   (gb IS NOT NULL AND gb <= {NEAREST_TOL_US}
                    AND (gf IS NULL OR gf > {NEAREST_TOL_US} OR gb <= gf))
                       AS back_wins,
                   (gf IS NOT NULL AND gf <= {NEAREST_TOL_US}) AS fwd_ok
            FROM carried WHERE side = 1
        )
        SELECT user_id, error_id,
               CASE WHEN back_wins THEN back_id
                    WHEN fwd_ok THEN fwd_id END AS nearest_click_id,
               CASE WHEN back_wins THEN 'back'
                    WHEN fwd_ok THEN 'fwd' END AS direction,
               CASE WHEN back_wins THEN round(-gb / 1e6, 3)
                    WHEN fwd_ok THEN round(gf / 1e6, 3) END AS gap_secs
        FROM scored
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
