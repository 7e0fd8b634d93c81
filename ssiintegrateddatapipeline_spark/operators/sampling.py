"""Deterministic sampling and dataset-split operators.

A 100 TB training-data pipeline needs *reproducible* sampling: the same
row set regardless of cluster size, partitioning, or execution order.
``df.sample()`` can't give that (seeded per-partition RNG changes with the
split layout), so every operator here derives membership from a content
hash — ``md5`` of a stable key compared against a hex threshold. The
filter is a pure narrow projection (no shuffle, fully pushed into the
scan stage), and the exact same predicate is expressible in any engine,
which is what makes these oracle-checkable.

Reference parallel: the reference caps runs with MESSAGE_COUNT
(data_synthesizer/config/config.go:34) — a prefix sample, which is
order-dependent. Hash-gating is the scale-correct replacement.

Scale notes (100 TB): hash-sampling is embarrassingly parallel — one md5
per row, no state, no shuffle; the stratified variant broadcasts the
per-stratum rate map as a literal CASE; split assignment is a narrow
column and downstream consumers partition-prune on it when the split
column is used as a partition key at write time (sinks.write_partitioned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.functions.topk import (
    two_level_topk as _shared_topk,
)
from ssiintegrateddatapipeline_spark.sources.batch import load_table


def _hash_hex(key_col, salt: str):
    """First hex chars of md5(key || '|' || salt) — the sampling gate.

    The decimal rendering of a BIGINT is identical across engines, so the
    digest (and therefore membership) is too.
    """
    return F.md5(F.concat_ws("|", key_col.cast("string"), F.lit(salt)))


def hash_sample(df: DataFrame, key: str, salt: str, rate_16ths: int) -> DataFrame:
    """Keep ~``rate_16ths``/16 of rows, deterministically by key hash."""
    threshold = format(rate_16ths, "x")
    return df.where(F.substring(_hash_hex(F.col(key), salt), 1, 1) < F.lit(threshold))


def sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A ~1/16 deterministic sample of the events table (salt 'smp')."""
    ev = load_table(spark, sf_dir, "events")
    return hash_sample(ev, "event_id", "smp", 1).select(
        "event_id", "user_id", "event_type", "value"
    )


# per-stratum sampling rates, in 256ths (two hex chars of the digest)
STRATA_RATES_256 = {
    "click": 16,      # ~6.25%
    "view": 8,        # ~3.1%
    "purchase": 128,  # ~50%  (rare-but-valuable stratum oversampled)
    "signup": 64,     # ~25%
    "error": 32,      # ~12.5%
}


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum hash sampling at different rates; returns the audit
    aggregate (kept rows / distinct users / exact value bounds per type).

    The rate map compiles to a literal CASE over the stratum column — no
    join, no shuffle beyond the final audit aggregation.
    """
    ev = load_table(spark, sf_dir, "events")
    threshold = F.create_map(
        *[x for k, v in STRATA_RATES_256.items() for x in (F.lit(k), F.lit(format(v, "02x")))]
    )
    kept = ev.where(
        F.substring(_hash_hex(F.col("event_id"), "strat"), 1, 2)
        < threshold[F.col("event_type")]
    )
    return kept.groupBy("event_type").agg(
        F.count("*").alias("kept"),
        F.countDistinct("user_id").alias("users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def train_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (12/2/2 sixteenths) keyed on
    user_id — *entity-level* splitting, so no user leaks across splits —
    plus the per-split audit stats."""
    ev = load_table(spark, sf_dir, "events")
    gate = F.substring(_hash_hex(F.col("user_id"), "split"), 1, 1)
    split = (
        F.when(gate < F.lit("c"), F.lit("train"))
        .when(gate < F.lit("e"), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        ev.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


# weighted sampling: weight = min(value, W_CAP)/W_CAP, gated on a 16-bit
# slice of the content hash. 65536/W_CAP precomputed so both engines build
# the identical double-multiply expression.
W_CAP = 200.0
W_SCALE = 65536.0 / W_CAP


def weighted_keep_predicate(value_col, id_col):
    """The weight-proportional keep decision as a reusable boolean column.

    Clamps the gate at 0: a negative value would format as a 16-char two's-
    complement hex string that compares greater than any 4-char prefix,
    silently keeping every negative-weight row — the opposite of
    weight-proportional. Clamped, weight<=0 keeps nothing."""
    gate = F.greatest(
        F.lit(0).cast("long"),
        F.floor(value_col * F.lit(W_SCALE)).cast("long"),
    )
    return (value_col >= F.lit(W_CAP)) | (
        F.substring(_hash_hex(id_col, "wsmp"), 1, 4)
        < F.format_string("%04x", gate)
    )


def weighted_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional (Bernoulli) sampling: each event is
    kept with probability min(value, cap)/cap, decided by comparing a
    16-bit hash slice against the weight mapped to a 4-hex-digit threshold.
    Same properties as hash_sample — order/partitioning-independent, no RNG,
    pure narrow filter — but importance-weighted, the shape used to bias a
    training mix toward high-value records. Returns the per-type audit.
    """
    ev = load_table(spark, sf_dir, "events")
    kept = ev.where(weighted_keep_predicate(F.col("value"), F.col("event_id")))
    return kept.groupBy("event_type").agg(
        F.count("*").alias("kept"),
        F.countDistinct("user_id").alias("users"),
        F.round(F.sum("value"), 2).alias("kept_value"),
    )


REBALANCE_QUOTA = 15  # max documents kept per source


def corpus_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each source's contribution at REBALANCE_QUOTA documents —
    the corpus-mix balancing step of a training-data pipeline. Selection
    within a source is by hash rank (deterministic, content-keyed, no RNG);
    one shuffle on source, and the rank window sort doubles as the
    selection order. Returns the per-source audit (kept/total/chars)."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(_hash_hex(F.col("doc_id"), "bal"), "doc_id")
    ranked = d.withColumn("rank", F.row_number().over(w))
    return ranked.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.sum((F.col("rank") <= REBALANCE_QUOTA).cast("long")).alias("n_kept"),
        F.sum(
            F.when(F.col("rank") <= REBALANCE_QUOTA, F.col("n_chars")).otherwise(0)
        ).alias("kept_chars"),
    )


def token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted mixture rebalancing: the per-SOURCE token ledger a
    training-mix planner needs — documents are not the unit that matters,
    tokens are. Per source: doc/token counts, the source's share of the
    corpus token budget, and the deterministic keep-rate that would level
    every source to a uniform token target (min(1, target/source_tokens)).

    Scale shape: one scan -> one hash agg on source (map-side partials),
    then a broadcast of the one-row total; ratios computed with the exact
    half-up integer form shared with the oracle (no double-rounding tie
    hazard). Apply the keep_rate downstream with the same hash-gate
    pattern as hash_sample."""
    from ssiintegrateddatapipeline_spark.operators.analytics import (
        _round_half_up_ratio,
    )

    d = load_table(spark, sf_dir, "documents")
    from ssiintegrateddatapipeline_spark.functions.text_funcs import tokens

    per_source = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"),
    )
    totals = per_source.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count("*").alias("n_sources"),
    )
    return (
        per_source.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            _round_half_up_ratio(
                F.col("n_tokens"), F.col("total_tokens"), 6
            ).alias("token_share"),
            F.least(
                F.lit(1.0),
                _round_half_up_ratio(
                    F.col("total_tokens"),
                    F.col("n_sources") * F.col("n_tokens"),
                    6,
                ),
            ).alias("keep_rate"),
        )
    )


def temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing: sampling probability
    p_i ∝ share_i^0.5 — the standard upsampling rule for low-resource
    sources in multi-source/multilingual training mixes (α = 1 keeps the
    natural distribution, α → 0 flattens it; 0.5 is the common middle).

    Cross-engine exactness: the α-power weights go through integer micro
    units (round(sqrt(share)·1e6)::long) so the normalizing SUM over
    sources is order-independent, and both the normalized probability and
    the boost-vs-natural-share ratio are computed with the half-up
    integer-ratio device — no float summation order anywhere."""
    from ssiintegrateddatapipeline_spark.functions.text_funcs import tokens
    from ssiintegrateddatapipeline_spark.operators.analytics import (
        _round_half_up_ratio,
    )

    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"),
    )
    totals = per_source.agg(F.sum("n_tokens").alias("total_tokens"))
    share = _round_half_up_ratio(F.col("n_tokens"), F.col("total_tokens"), 6)
    sh = per_source.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "n_tokens",
        "total_tokens",
        share.alias("token_share"),
        F.round(F.sqrt(share) * 1_000_000, 0).cast("long").alias("w_micro"),
    )
    tw = sh.agg(F.sum("w_micro").alias("total_w"))
    p_temp = _round_half_up_ratio(F.col("w_micro"), F.col("total_w"), 6)
    # boost = p/share over the already-normalized MICRO values (both ≤ 1e6)
    # so every intermediate stays ≤ 2e10 — the raw cross ratio
    # (w·total_tokens)/(total_w·n_tokens) would overflow int64 once the
    # corpus passes ~4.6e8 tokens (ANSI-mode throw vs DuckDB HUGEINT).
    p_micro = F.round(p_temp * 1_000_000).cast("long")
    # greatest(..., 1): a source whose token share rounds below 5e-7 would
    # otherwise divide by zero (ANSI-mode error) at extreme imbalance; the
    # clamp caps its boost at p_micro/1e-6 instead (mirrored in the oracle)
    share_micro = F.greatest(
        F.round(F.col("token_share") * 1_000_000).cast("long"), F.lit(1)
    )
    return sh.crossJoin(F.broadcast(tw)).select(
        "source",
        "n_docs",
        "n_tokens",
        "token_share",
        p_temp.alias("p_temperature"),
        _round_half_up_ratio(p_micro, share_micro, 4).alias("boost"),
    )


def two_level_topk(
    df, stratum_cols: list[str], order_cols: list[str], k: int,
    salt_col: str = "salt", n_salts: int = 16,
) -> "DataFrame":
    """Samplers' view of the repo-wide exact two-level top-k device: rank
    column ``sample_rank``, salt taken from a precomputed column. The
    actual plan lives in ``functions.topk.two_level_topk`` (one
    definition, property-tested vs the single window in
    tests/test_topk_device.py); pinned equal to the single-window form
    by tests/test_reservoir.py and tests/test_weighted_reservoir.py."""
    return _shared_topk(
        df,
        keys=list(stratum_cols),
        order=list(order_cols),
        k=k,
        salt=F.col(salt_col),
        n_salts=n_salts,
        rank_name="sample_rank",
    )


RESERVOIR_K = 10
RESERVOIR_SALTS = 16


def reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k deterministic "reservoir" sample per source: the k documents
    with the smallest md5-order per source, ranked. Hash-ordering top-k is
    the distributed equivalent of reservoir sampling (uniform over the
    stratum, exact size k, deterministic re-runs — arrival-order reservoirs
    are not reproducible on a shuffled cluster).

    Scale shape — hierarchical top-k, because one window partitioned by a
    20-value ``source`` column is a skew trap at 100 TB: stage 1 ranks
    within (source, salt) cells (fan-out 16 per source, each cell an
    independent partition sort that spills fine) and keeps k; stage 2
    re-ranks the <= 16*k survivors per source. Any global-top-k row's
    betters are all stage-1 survivors too, so the stage-2 row_number IS the
    global rank — the two-level result is exactly the single-window result
    (pinned by tests/test_reservoir.py), with the big sort spread over
    every core and the final window fed a bounded input.
    """
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "source",
        "doc_id",
        "n_chars",
        _hash_hex(F.col("doc_id"), "res").alias("h"),
        F.pmod(F.col("doc_id"), F.lit(RESERVOIR_SALTS)).alias("salt"),
    )
    return two_level_topk(
        base, ["source"], ["h", "doc_id"], RESERVOIR_K
    ).select("source", "sample_rank", "doc_id", "n_chars")


ES_K = 40
ES_SALTS = 16
_ES_TWO48 = float(1 << 48)


def weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement per stratum — the
    Efraimidis–Spirakis A-ES scheme (IPL 2006): each item draws a uniform
    u and gets key ``-ln(u) / w``; the k SMALLEST keys per stratum are the
    sample. One streaming-friendly pass, exact sample size k, and
    P(item in sample) follows its weight — the distributed standard for
    "sample k orders, big orders more likely" (priority sampling family).

    u is hash-derived (48 bits of md5(orderkey|es), offset by 0.5 so u>0),
    which makes the draw DETERMINISTIC and re-runnable on a shuffled
    cluster — same device as sampling_reservoir. The key is snapped to a
    12-decimal grid before ranking (tie-broken by orderkey) so a last-ulp
    ``ln``/divide difference between engines cannot flip an order — the
    BM25-idf cross-engine rounding device.

    Scale shape: same hierarchical top-k as reservoir_per_source — a
    window partitioned by a 5-value priority column is a skew trap, so
    stage 1 ranks within (priority, salt) cells and keeps k, stage 2
    re-ranks the <= 16*k survivors; any global winner beats its cell-mates
    too, so the two-level result is exactly the single-window result."""
    orders = load_table(spark, sf_dir, "orders")
    u = (
        F.conv(F.substring(_hash_hex(F.col("o_orderkey"), "es"), 1, 12), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(_ES_TWO48)
    base = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("weight"),
        F.round(-F.log(u) / F.col("o_totalprice"), 12).alias("es_key"),
        F.pmod(F.col("o_orderkey"), F.lit(ES_SALTS)).alias("salt"),
    )
    return two_level_topk(
        base, ["priority"], ["es_key", "orderkey"], ES_K
    ).select("priority", "sample_rank", "orderkey", "weight", "es_key")


NEYMAN_BUDGET = 10_000  # total sample rows to allocate across strata


def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: split a fixed sample
    budget across strata proportionally to ``N_h * sigma_h`` — the
    allocation that minimizes the variance of the stratified mean
    estimator (Neyman 1934), the principled answer to "how many rows of
    each event type should the QA sample contain".

    Exactness device: per-stratum moments are exact integers (micro-unit
    value sums, decimal38/HUGEINT squares), sigma uses only ``sqrt`` —
    IEEE-correctly-rounded, unlike ``ln``/``pow``, so no snap grid is
    needed before the weight ratio. The integer allocation is largest-
    remainder (Hamilton) rounding: floor shares plus one extra row for
    the R largest fractional remainders — computed WINDOW-FREE as a
    pairwise rank join over the 5-row stratum table (25 comparisons;
    Spark and DuckDB agree bit-for-bit on the double remainders because
    the expression structure is identical).

    Scale notes (100 TB): one map-side-combined hash agg over the fact
    table into |strata| rows; everything after operates on that bounded
    table (broadcast joins, no windows, no collect). The allocation
    output then drives any of the module's hash-samplers per stratum.
    """
    ev = load_table(spark, sf_dir, "events")
    micro = F.round(F.col("value") * 1e6).cast("long")
    dmic = micro.cast("decimal(38,0)")
    strata = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dmic).cast("double").alias("s1"),
        F.sum(dmic * dmic).cast("double").alias("s2"),
    )
    dn = F.col("n_rows").cast("double")
    sd_micro = F.sqrt(F.col("s2") / dn - (F.col("s1") / dn) * (F.col("s1") / dn))
    strata = strata.select(
        "event_type", "n_rows", (dn * sd_micro).alias("w")
    )
    w_tot = strata.agg(F.sum("w").alias("w_tot"))
    shared = strata.crossJoin(F.broadcast(w_tot)).select(
        "event_type",
        "n_rows",
        "w",
        "w_tot",
        (F.lit(float(NEYMAN_BUDGET)) * F.col("w") / F.col("w_tot")).alias("share"),
    )
    shared = shared.withColumn("base_n", F.floor(F.col("share")).cast("long"))
    shared = shared.withColumn("rem", F.col("share") - F.col("base_n"))
    spare = shared.agg(
        (F.lit(NEYMAN_BUDGET) - F.sum("base_n")).cast("long").alias("n_spare")
    )
    other = shared.select(
        F.col("event_type").alias("o_type"), F.col("rem").alias("o_rem")
    )
    rank = (
        shared.join(
            other,
            (F.col("o_rem") > F.col("rem"))
            | ((F.col("o_rem") == F.col("rem")) & (F.col("o_type") < F.col("event_type"))),
            "left",
        )
        .groupBy("event_type", "n_rows", "w", "w_tot", "share", "base_n")
        .agg(F.count("o_type").alias("n_ahead"))
    )
    return (
        rank.crossJoin(F.broadcast(spare))
        .select(
            "event_type",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(F.col("w") / dn / 1e6, 6).alias("sd_value"),
            F.round(100.0 * F.col("w") / F.col("w_tot"), 6).alias("share_pct"),
            (
                F.col("base_n")
                + F.when(F.col("n_ahead") < F.col("n_spare"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc_n"),
        )
    )


BOOT_B = 64  # bootstrap replicas
BOOT_LO_RANK = 4  # 4th / 61st order statistics of 64 ≈ a 90% interval
BOOT_HI_RANK = 61


def bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean event value per
    type — THE distributed bootstrap (Chamandy et al., Google 2012):
    classic resampling needs n draws coordinated across the cluster, but
    giving every row an independent ~Poisson(1) weight per replica needs
    no coordination at all, so all B replicas fold in ONE aggregation
    pass — 2B conditional sums (sum of w_b*value, sum of w_b per
    replica) over the UN-exploded rows, then a |types|-row unpivot back
    to (type, replica) means. No 64x row stream ever exists: the only
    shuffle is |types| rows x 128 partial sums.

    Determinism: the weight is Binomial(8, 1/8) — count of 4-bit nibbles
    in {0,1} among an 8-nibble slice of md5(event_id|boot|k) — mean 1,
    variance 7/8 (a documented stand-in for Poisson(1), identical in
    both engines since md5 of the decimal key rendering matches). One
    md5 is 32 nibbles, so each hash funds FOUR replicas (disjoint
    8-nibble slices): B/4 hashes per row, not B. The CI is a pair of
    exact order statistics of the 64 replica means (ranks 4/61 ~ 90%),
    selected with a (mean, replica) tie-ordered rank — no percentile
    interpolation to diverge.

    Scale shape: the map side evaluates B/4 md5s per row (the
    irreducible bootstrap work) inside one whole-stage-codegen
    projection — kept SEPARATE from the aggregate so the md5 forest
    can't push the aggregate's generated code past the JIT limit;
    partials reduce to |types| rows wide of 2B sums, the
    order-statistic window runs over the 64 unpivoted rows per type.
    """
    ev = load_table(spark, sf_dir, "events")
    rows = ev.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    # the hashing below is the query's real compute; a small single-file
    # scan would otherwise pin all of it on one task. At warehouse scale
    # the scan has >= cores splits and this is a no-op.
    cores = spark.sparkContext.defaultParallelism
    if rows.rdd.getNumPartitions() < cores:
        rows = rows.repartition(cores)

    # weight = count of 4-bit nibbles < 2 among an 8-nibble hash slice —
    # integer shift/mask arithmetic on ONE conv(). The whole weight
    # vector is built with HIGHER-ORDER functions (transform/flatten):
    # unrolling the md5 forest into 64 named columns generates >64 KB of
    # bytecode per method and janino refuses to compile it, silently
    # dropping the stage to interpreted mode (measured 2x SLOWER than
    # the explode it replaced) — the array lambdas compile to loops.
    harr = F.transform(
        F.sequence(F.lit(0), F.lit(BOOT_B // 4 - 1)),
        lambda k: F.md5(
            F.concat_ws(
                "|",
                F.col("event_id").cast("string"),
                F.lit("boot"),
                k.cast("string"),
            )
        ),
    )
    hvarr = F.flatten(
        F.transform(
            harr,
            lambda h: F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda j: F.conv(
                    h.substr(j * F.lit(8) + F.lit(1), F.lit(8)), 16, 10
                ).cast("long"),
            ),
        )
    )
    warr = F.transform(
        hvarr,
        lambda hv: sum(
            (F.shiftright(hv, 4 * g).bitwiseAND(F.lit(15)) < 2).cast("int")
            for g in range(8)
        ),
    )
    wide = rows.select("event_type", "vc", warr.alias("ws"))
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").alias("svc"),
    ]
    for b in range(BOOT_B):
        w = F.element_at("ws", b + 1)
        aggs.append(F.sum(w * F.col("vc")).alias(f"swv{b}"))
        aggs.append(F.sum(w).alias(f"sw{b}"))
    base = wide.groupBy("event_type").agg(*aggs)
    point_mean = (F.col("svc").cast("double") / (100.0 * F.col("n"))).alias("pm")
    stacked = ", ".join(f"{b}, swv{b}, sw{b}" for b in range(BOOT_B))
    per_rep = (
        base.select(
            "event_type",
            "n",
            point_mean,
            F.expr(f"stack({BOOT_B}, {stacked}) AS (b, swv, sw)"),
        )
        .where(F.col("sw") > 0)
        .select(
            "event_type",
            "n",
            "pm",
            "b",
            (F.col("swv").cast("double") / (100.0 * F.col("sw"))).alias("m"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy("m", "b")
    )
    ranked = per_rep.withColumn("rn", rn)
    return (
        ranked.groupBy("event_type", "n", "pm")
        .agg(
            F.min(F.when(F.col("rn") == BOOT_LO_RANK, F.col("m"))).alias("lo"),
            F.min(F.when(F.col("rn") == BOOT_HI_RANK, F.col("m"))).alias("hi"),
        )
        .select(
            "event_type",
            "n",
            F.round(F.col("pm"), 6).alias("mean_value"),
            F.round(F.col("lo"), 6).alias("ci_lo"),
            F.round(F.col("hi"), 6).alias("ci_hi"),
        )
    )


# ---------------------------------------------------------------------------
# Leakage-safe group k-fold over documents. Random per-document folds put
# exact duplicates of one document into DIFFERENT folds, so eval folds
# leak training content — the classic contamination bug k-fold CV papers
# warn about. The fix: fold by the duplicate-GROUP key (content hash), so
# a group lands wholly inside one fold by construction. The query is the
# AUDIT that proves it: per-fold sizes plus the straddle count measured
# from the assignment itself (groups spanning >1 fold — 0 for this
# assignment, nonzero for the naive per-doc one it replaces) and a
# balance check against the ideal 1/K share. One groupBy on the content
# hash, one tiny fold rollup — both map-side-combined uniform-key
# shuffles; nothing here changes at 100 TB.
# ---------------------------------------------------------------------------

KFOLD_K = 5
KFOLD_BALANCE_TOL = 0.05  # each fold within ±5 points of the 1/K share


def group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    grp = F.md5(F.col("text"))
    fold = F.pmod(
        F.conv(F.substring(_hash_hex(grp, "kfold"), 1, 8), 16, 10).cast("long"),
        F.lit(KFOLD_K),
    ).cast("int")
    assigned = d.select(grp.alias("grp"), fold.alias("fold"))
    groups = assigned.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fold").alias("n_folds_touched"),
        F.min("fold").alias("fold"),
    )
    straddle = groups.agg(
        F.sum((F.col("n_folds_touched") > 1).cast("long")).alias(
            "straddling_groups"
        ),
        F.sum("n_docs").alias("n_total"),
    )
    per_fold = groups.groupBy("fold").agg(
        F.sum("n_docs").alias("n_docs"),
        F.count(F.lit(1)).alias("n_groups"),
    )
    share = F.col("n_docs") / F.col("n_total")
    return per_fold.crossJoin(F.broadcast(straddle)).select(
        "fold",
        "n_docs",
        "n_groups",
        F.round(share, 6).alias("share"),
        "straddling_groups",
        (
            F.abs(share - 1.0 / KFOLD_K) <= KFOLD_BALANCE_TOL
        ).alias("balance_ok"),
    )


_GROUP_KFOLD_ORACLE = f"""
    WITH assigned AS (
        SELECT md5(text) AS grp,
               CAST(('0x' || substr(
                   md5(md5(text) || '|kfold'), 1, 8))::UBIGINT
                   % {KFOLD_K} AS INT) AS fold
        FROM documents
    ),
    groups AS (
        SELECT grp, count(*)::BIGINT AS n_docs,
               count(DISTINCT fold)::BIGINT AS n_folds_touched,
               min(fold) AS fold
        FROM assigned GROUP BY grp
    ),
    straddle AS (
        SELECT sum(CASE WHEN n_folds_touched > 1 THEN 1 ELSE 0 END)::BIGINT
                   AS straddling_groups,
               sum(n_docs)::BIGINT AS n_total
        FROM groups
    ),
    per_fold AS (
        SELECT fold, sum(n_docs)::BIGINT AS n_docs,
               count(*)::BIGINT AS n_groups
        FROM groups GROUP BY fold
    )
    SELECT fold, n_docs, n_groups,
           round(n_docs / CAST(n_total AS DOUBLE), 6) AS share,
           straddling_groups,
           abs(n_docs / CAST(n_total AS DOUBLE) - {1.0 / KFOLD_K})
               <= {KFOLD_BALANCE_TOL} AS balance_ok
    FROM per_fold CROSS JOIN straddle
"""


QUERIES = {
    "sampling_group_kfold": group_kfold,
    "sampling_bootstrap_ci": bootstrap_ci,
    "sampling_reservoir": reservoir_per_source,
    "sampling_weighted_reservoir": weighted_reservoir,
    "sampling_temperature_mix": temperature_mix,
    "sampling_token_budget_mix": token_budget_mix,
    "sampling_corpus_rebalance": corpus_rebalance,
    "sampling_hash_sample": sample_events,
    "sampling_stratified": stratified_sample,
    "sampling_train_split": train_split_stats,
    "sampling_weighted": weighted_sample_stats,
    "sampling_neyman_allocation": neyman_allocation,
}

_RATE_CASE = " ".join(
    f"WHEN '{k}' THEN '{v:02x}'" for k, v in STRATA_RATES_256.items()
)

ORACLES = {
    "sampling_group_kfold": _GROUP_KFOLD_ORACLE,
    "sampling_bootstrap_ci": f"""
        WITH rows_ AS (
            SELECT event_type, event_id,
                   CAST(round(value * 100) AS BIGINT) AS vc
            FROM events
        ),
        hashed AS (
            -- one md5 funds four replicas: slice 8 nibbles per replica
            SELECT event_type, b.b, vc,
                   ('0x' || substr(md5(event_id::VARCHAR || '|boot|'
                                       || (b.b // 4)::VARCHAR),
                                   8 * (b.b % 4) + 1, 8))
                       ::UBIGINT::BIGINT AS h
            FROM rows_
            CROSS JOIN (SELECT unnest(generate_series(0, {BOOT_B - 1})) AS b) b
        ),
        rep AS (
            SELECT event_type, b, vc,
                   (CASE WHEN (h >> 0) & 15 < 2 THEN 1 ELSE 0 END + CASE WHEN (h >> 4) & 15 < 2 THEN 1 ELSE 0 END + CASE WHEN (h >> 8) & 15 < 2 THEN 1 ELSE 0 END + CASE WHEN (h >> 12) & 15 < 2 THEN 1 ELSE 0 END + CASE WHEN (h >> 16) & 15 < 2 THEN 1 ELSE 0 END + CASE WHEN (h >> 20) & 15 < 2 THEN 1 ELSE 0 END + CASE WHEN (h >> 24) & 15 < 2 THEN 1 ELSE 0 END + CASE WHEN (h >> 28) & 15 < 2 THEN 1 ELSE 0 END) AS w
            FROM hashed
        ),
        per_rep AS (
            SELECT event_type, b,
                   CAST(sum(w * vc) AS DOUBLE) / (100.0 * sum(w)) AS m
            FROM rep GROUP BY 1, 2
            HAVING sum(w) > 0
        ),
        ranked AS (
            SELECT event_type, m,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY m, b) AS rn
            FROM per_rep
        ),
        point AS (
            SELECT event_type, count(*) AS n,
                   CAST(sum(vc) AS DOUBLE) / (100.0 * count(*)) AS pm
            FROM rows_ GROUP BY 1
        ),
        ci AS (
            SELECT event_type,
                   min(CASE WHEN rn = {BOOT_LO_RANK} THEN m END) AS lo,
                   min(CASE WHEN rn = {BOOT_HI_RANK} THEN m END) AS hi
            FROM ranked GROUP BY 1
        )
        SELECT p.event_type, p.n,
               round(p.pm, 6) AS mean_value,
               round(c.lo, 6) AS ci_lo,
               round(c.hi, 6) AS ci_hi
        FROM point p JOIN ci c USING (event_type)
    """,
    "sampling_neyman_allocation": f"""
        WITH m AS (
            SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS micro
            FROM events
        ), strata AS (
            SELECT event_type, count(*) AS n_rows,
                   CAST(sum(CAST(micro AS HUGEINT)) AS DOUBLE) AS s1,
                   CAST(sum(CAST(micro AS HUGEINT) * micro) AS DOUBLE) AS s2
            FROM m GROUP BY event_type
        ), ws AS (
            SELECT event_type, n_rows,
                   CAST(n_rows AS DOUBLE)
                   * sqrt(s2 / CAST(n_rows AS DOUBLE)
                          - (s1 / CAST(n_rows AS DOUBLE))
                            * (s1 / CAST(n_rows AS DOUBLE))) AS w
            FROM strata
        ), tot AS (SELECT sum(w) AS w_tot FROM ws),
        based AS (
            SELECT event_type, n_rows, w, w_tot,
                   CAST(floor({float(NEYMAN_BUDGET)} * w / w_tot) AS BIGINT)
                       AS base_n,
                   {float(NEYMAN_BUDGET)} * w / w_tot
                   - floor({float(NEYMAN_BUDGET)} * w / w_tot) AS rem
            FROM ws CROSS JOIN tot
        ), spare AS (
            SELECT {NEYMAN_BUDGET} - sum(base_n) AS n_spare FROM based
        ), ranked AS (
            SELECT b.event_type, b.n_rows, b.w, b.w_tot, b.base_n,
                   count(o.event_type) AS n_ahead
            FROM based b LEFT JOIN based o
              ON o.rem > b.rem
                 OR (o.rem = b.rem AND o.event_type < b.event_type)
            GROUP BY b.event_type, b.n_rows, b.w, b.w_tot, b.base_n
        )
        SELECT event_type,
               CAST(n_rows AS BIGINT) AS n_rows,
               round(w / CAST(n_rows AS DOUBLE) / 1e6, 6) AS sd_value,
               round(100.0 * w / w_tot, 6) AS share_pct,
               CAST(base_n + CASE WHEN n_ahead < n_spare THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc_n
        FROM ranked CROSS JOIN spare
    """,
    "sampling_weighted_reservoir": f"""
        SELECT priority, sample_rank, orderkey, weight, es_key
        FROM (
            SELECT priority, orderkey, weight, es_key,
                   row_number() OVER (
                       PARTITION BY priority ORDER BY es_key, orderkey
                   ) AS sample_rank
            FROM (
                SELECT o_orderpriority AS priority,
                       o_orderkey AS orderkey,
                       o_totalprice AS weight,
                       round(-ln(
                           (('0x' || substr(
                               md5(cast(o_orderkey AS VARCHAR) || '|es'),
                               1, 12))::UBIGINT::DOUBLE + 0.5)
                           / {_ES_TWO48!r}
                       ) / o_totalprice, 12) AS es_key
                FROM orders
            )
        )
        WHERE sample_rank <= {ES_K}
    """,
    "sampling_reservoir": f"""
        SELECT source, sample_rank, doc_id, n_chars
        FROM (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(cast(doc_id AS VARCHAR) || '|res'), doc_id
                   ) AS sample_rank
            FROM documents
        )
        WHERE sample_rank <= {RESERVOIR_K}
    """,
    "sampling_temperature_mix": """
        WITH per_source AS (
            SELECT source, count(*) AS n_docs,
                   sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
            FROM documents GROUP BY source
        ),
        totals AS (SELECT sum(n_tokens)::BIGINT AS total_tokens FROM per_source),
        sh AS (
            SELECT source, n_docs, n_tokens, total_tokens,
                   ((n_tokens * 2000000 + total_tokens)
                    // (2 * total_tokens)) / 1000000.0 AS token_share,
                   CAST(round(sqrt(
                       ((n_tokens * 2000000 + total_tokens)
                        // (2 * total_tokens)) / 1000000.0) * 1000000)
                        AS BIGINT) AS w_micro
            FROM per_source CROSS JOIN totals
        ),
        tw AS (SELECT sum(w_micro)::BIGINT AS total_w FROM sh),
        m AS (
            SELECT source, n_docs, n_tokens, token_share,
                   (w_micro * 2000000 + total_w) // (2 * total_w) AS p_micro,
                   greatest(CAST(round(token_share * 1000000) AS BIGINT), 1)
                       AS share_micro
            FROM sh CROSS JOIN tw
        )
        SELECT source, n_docs, n_tokens, token_share,
               p_micro / 1000000.0 AS p_temperature,
               ((p_micro * 20000 + share_micro) // (2 * share_micro))
                   / 10000.0 AS boost
        FROM m
    """,
    "sampling_token_budget_mix": """
        WITH per_source AS (
            SELECT source, count(*) AS n_docs,
                   sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
            FROM documents GROUP BY source
        ),
        totals AS (
            SELECT sum(n_tokens)::BIGINT AS total_tokens,
                   count(*) AS n_sources
            FROM per_source
        )
        SELECT source, n_docs, n_tokens,
               ((n_tokens * 2000000 + total_tokens) // (2 * total_tokens))
                   / 1000000.0 AS token_share,
               least(1.0::DOUBLE,
                     ((total_tokens * 2000000 + n_sources * n_tokens)
                      // (2 * n_sources * n_tokens)) / 1000000.0) AS keep_rate
        FROM per_source CROSS JOIN totals
    """,
    "sampling_corpus_rebalance": """
        WITH ranked AS (
            SELECT source, n_chars,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(cast(doc_id AS VARCHAR) || '|bal'), doc_id
                   ) AS rank
            FROM documents
        )
        SELECT source,
               count(*) AS n_total,
               sum(CASE WHEN rank <= 15 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
               sum(CASE WHEN rank <= 15 THEN n_chars ELSE 0 END)::BIGINT
                   AS kept_chars
        FROM ranked GROUP BY source
    """,
    "sampling_hash_sample": """
        SELECT event_id, user_id, event_type, value
        FROM events
        WHERE substr(md5(cast(event_id AS VARCHAR) || '|smp'), 1, 1) < '1'
    """,
    "sampling_stratified": f"""
        SELECT event_type,
               count(*) AS kept,
               count(DISTINCT user_id) AS users,
               min(value) AS min_value,
               max(value) AS max_value
        FROM events
        WHERE substr(md5(cast(event_id AS VARCHAR) || '|strat'), 1, 2)
              < (CASE event_type {_RATE_CASE} END)
        GROUP BY event_type
    """,
    "sampling_weighted": f"""
        SELECT event_type,
               count(*) AS kept,
               count(DISTINCT user_id) AS users,
               round(sum(value), 2) AS kept_value
        FROM events
        WHERE value >= {W_CAP}
           OR substr(md5(cast(event_id AS VARCHAR) || '|wsmp'), 1, 4)
              < printf('%04x', greatest(0::BIGINT,
                    cast(floor(value * {W_SCALE!r}) AS BIGINT)))
        GROUP BY event_type
    """,
    "sampling_train_split": """
        SELECT CASE
                 WHEN substr(md5(cast(user_id AS VARCHAR) || '|split'), 1, 1) < 'c'
                   THEN 'train'
                 WHEN substr(md5(cast(user_id AS VARCHAR) || '|split'), 1, 1) < 'e'
                   THEN 'val'
                 ELSE 'test'
               END AS split,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               min(ts) AS first_ts,
               max(ts) AS last_ts
        FROM events
        GROUP BY 1
    """,
}
