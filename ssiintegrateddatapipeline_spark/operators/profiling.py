"""Dataset profiling operators — the "know your corpus" pass a training-data
pipeline runs before anything else.

Everything here is built as a fixed number of aggregation passes over the
fact table, however many columns are profiled: non-distinct stats fold in
one zero-key pass and distinct counts reduce through a stack-unpivot hash
aggregate (deliberately NOT the multi-`count(DISTINCT)` Expand rewrite,
whose keyed SortAggregate globally sorts the expanded stream — see
profile_columns). Profiling 100 TB therefore costs O(1) passes over the
data, not one pass per column.

Reference parallel: the reference's only profiling is Prometheus counters
per label set (kafka_consumer/app/metrics/metrics.py:35-101); this module
generalizes that to arbitrary-column completeness / cardinality / range
audits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.sources.batch import load_table

# columns profiled on events: (name, renderable-as-string min/max?)
_PROFILE_COLS = [("event_id", True), ("user_id", True), ("event_type", True), ("props", True), ("value", False)]


def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column completeness / cardinality / bounds for the events table,
    output in long form.

    Two aggregation branches over the columnar scan: counts + native-type
    min/max in ONE non-distinct agg (all partial-aggregable), and the
    distinct counts through a stack-unpivot into (column, value) rows
    reduced by a HASH aggregate. A single agg with N ``countDistinct``s
    would instead Expand the stream N+1-fold and fall back to a
    SortAggregate keyed on every distinct column (a global sort of wide
    rows — measured 2.5x slower here, and the sort is the scale-killer at
    real row counts); the unpivoted hash agg reduces map-side to ~|distinct
    values| per column.

    min/max are rendered as strings for the integer and varchar columns
    (integer decimal rendering is engine-independent; float rendering is
    not, so the double column reports bounds as NULL and is covered by
    profile_numeric instead).
    """
    ev = load_table(spark, sf_dir, "events")
    aggs = [F.count("*").alias("n_rows")]
    for c, renderable in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__nonnull"),
            (F.min(c).cast("string") if renderable else F.lit(None).cast("string")).alias(f"{c}__min"),
            (F.max(c).cast("string") if renderable else F.lit(None).cast("string")).alias(f"{c}__max"),
        ]
    wide = ev.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nonnull, {c}__min, {c}__max" for c, _ in _PROFILE_COLS
    )
    mm = wide.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_nonnull, min_repr, max_repr)",
    )
    # string cast is injective for the profiled types EXCEPT that native
    # distinct treats -0.0 == 0.0 while their strings differ — `x + 0`
    # normalizes -0.0 to 0.0 (IEEE) before the cast, restoring equality
    # with the oracle's native count(DISTINCT) on the double column
    un_args = ", ".join(
        (f"'{c}', ({c} + 0)::string" if not renderable else f"'{c}', {c}::string")
        for c, renderable in _PROFILE_COLS
    )
    long = ev.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {un_args}) AS (column_name, v)"
    )
    dis = long.groupBy("column_name").agg(F.countDistinct("v").alias("n_distinct"))
    # left join + 0-fill: an empty table must still report one row per
    # profiled column (counts 0), not an empty result
    return (
        mm.join(F.broadcast(dis), "column_name", "left")
        .withColumn("n_distinct", F.coalesce("n_distinct", F.lit(0)))
        .select(
            "column_name", "n_rows", "n_nonnull", "n_distinct",
            "min_repr", "max_repr",
        )
    )


def profile_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / stddev for numeric measures, computed from explicit SUM/COUNT
    partials so the arithmetic is the same expression tree in any engine
    (built-in stddev kernels differ at the 1e-6 level between engines;
    sums of the same doubles do not).  Partial aggregation makes this a
    map-side-combined single shuffle at any scale."""
    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")

    def stats(df: DataFrame, label: str, col: str) -> DataFrame:
        d = df.select(F.col(col).cast("double").alias("x")).agg(
            F.count("x").alias("n"),
            F.sum("x").alias("s"),
            F.sum(F.col("x") * F.col("x")).alias("ss"),
        )
        return d.select(
            F.lit(label).alias("measure"),
            "n",
            F.round(F.col("s") / F.col("n"), 6).alias("mean"),
            F.round(
                F.sqrt(
                    (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
                    / (F.col("n") - 1)
                ),
                6,
            ).alias("stddev"),
        )

    return stats(ev, "events.value", "value").unionByName(
        stats(li, "lineitem.l_extendedprice", "l_extendedprice")
    )


def profile_top_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most frequent values for low-cardinality categorical columns
    across two tables (frequency desc, value asc as the deterministic
    tie-break). Each branch is a partial-aggregated groupBy on a
    low-cardinality key — tiny shuffles — followed by a per-column window
    over a handful of rows."""
    ev = load_table(spark, sf_dir, "events")
    doc = load_table(spark, sf_dir, "documents")

    def top(df: DataFrame, label: str, col: str) -> DataFrame:
        from pyspark.sql.window import Window

        counts = df.groupBy(F.col(col).alias("val")).agg(F.count("*").alias("freq"))
        # top-3 via TakeOrderedAndProject; the rank window only sees the
        # post-limit 3 rows, so no unbounded single-partition sort even
        # if a column turns out higher-cardinality than documented.
        top3 = counts.orderBy(F.col("freq").desc(), F.col("val").asc()).limit(3)
        w = Window.orderBy(F.col("freq").desc(), F.col("val").asc())
        return top3.select(
            F.lit(label).alias("column_name"),
            "val",
            "freq",
            F.row_number().over(w).alias("rank"),
        )

    return (
        top(ev, "events.event_type", "event_type")
        .unionByName(top(doc, "documents.lang", "lang"))
        .unionByName(top(doc, "documents.source", "source"))
    )


APPROX_RSD = 0.01  # HLL++ relative standard deviation knob
APPROX_BOUND = 0.05  # contract checked by the oracle: |approx/exact - 1| < 5%


def profile_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality profiling the way it's actually done at 100 TB: HLL++
    sketches (`approx_count_distinct`) next to the exact counts, asserting
    the sketch lands within the 5% contract.

    The exact side needs a full shuffle of distinct values per column; the
    sketch side is a fixed-size (KB) mergeable state per column carried
    through map-side partial aggregation — the only option when the distinct
    set itself doesn't fit anywhere. The oracle pins the exact counts and
    the within-bound flag (DuckDB can't reproduce Spark's HLL bit-for-bit;
    the accuracy CONTRACT is the portable statement, and a drifting sketch
    fails the hash).
    """
    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "props"]
    wide = ev.agg(
        *[F.countDistinct(c).alias(f"exact_{c}") for c in cols],
        *[
            F.approx_count_distinct(c, rsd=APPROX_RSD).alias(f"approx_{c}")
            for c in cols
        ],
    )
    stacked = wide.select(
        F.expr(
            "stack({}, {})".format(
                len(cols),
                ", ".join(f"'{c}', exact_{c}, approx_{c}" for c in cols),
            )
        ).alias("column", "n_exact", "n_approx")
    )
    return stacked.select(
        "column",
        "n_exact",
        (
            F.abs(F.col("n_approx") / F.col("n_exact") - 1.0) < F.lit(APPROX_BOUND)
        ).alias("within_bound"),
    )


# fixed plan-time centers (approximate column means) — shifting by a LITERAL
# keeps corr invariant while shrinking the magnitudes entering the
# sum-of-products, so the cross-engine float parity of the explicit-SUM
# formula survives the cancellation-prone (n*Sxy - Sx*Sy) numerator
_CORR_COLS = [("l_quantity", 25.0), ("l_extendedprice", 38000.0), ("l_discount", 0.05)]


def profile_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the lineitem measures in ONE pass:
    all the S_x, S_xx, S_xy partials are computed in a single aggregation
    (map-side combine, one shuffle of a single wide row), the 3x3 matrix is
    assembled from the partials with `stack` — never one pass per pair.
    Built-in `corr` kernels differ ~1e-6 across engines; the explicit-SUM
    spelling is portable bit-for-bit (same ops, same order).
    """
    li = load_table(spark, sf_dir, "lineitem")
    cols = _CORR_COLS
    centered = li.select(
        *[(F.col(c) - F.lit(shift)).alias(c) for c, shift in cols]
    )
    aggs = [F.count("*").cast("double").alias("n")]
    for c, _ in cols:
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    for i, (cx, _) in enumerate(cols):
        for cy, _ in cols[i + 1 :]:
            aggs.append(F.sum(F.col(cx) * F.col(cy)).alias(f"sp_{cx}_{cy}"))
    wide = centered.agg(*aggs)
    pair_exprs = ", ".join(
        f"'{cx}', '{cy}', "
        f"round((n * sp_{cx}_{cy} - s_{cx} * s_{cy}) / "
        f"(sqrt(n * ss_{cx} - s_{cx} * s_{cx}) * sqrt(n * ss_{cy} - s_{cy} * s_{cy})), 6)"
        for i, (cx, _) in enumerate(cols)
        for cy, _ in [p for p in cols[i + 1 :]]
    )
    n_pairs = len(cols) * (len(cols) - 1) // 2
    return wide.select(
        F.expr(f"stack({n_pairs}, {pair_exprs})").alias("col_x", "col_y", "pearson_r"),
        F.col("n").cast("long").alias("n_rows"),
    )


def profile_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (the dbt-test / Deequ shape): a fixed
    suite of constraints — referential integrity, value ranges, key
    uniqueness, non-emptiness — each evaluated corpus-wide and reported as
    one row (check, rows scanned, violations, pass). Every check is an
    independent aggregation (map-side combined, one wide row each); the FK
    check is the only join and shuffles on the key. The union is of five
    single-row frames — plan cost is the scans, nothing else.
    """

    def scan_check(df: DataFrame, name: str, viol) -> DataFrame:
        return (
            df.agg(
                F.count("*").alias("n_rows"),
                F.sum(viol.cast("long")).alias("n_violations"),
            )
            .select(
                F.lit(name).alias("check_name"),
                "n_rows",
                "n_violations",
                (F.col("n_violations") == 0).alias("passed"),
            )
        )

    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    fk = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey"), F.lit(1).alias("_hit")),
        "o_custkey",
        "left",
    )
    checks = [
        scan_check(fk, "orders_custkey_fk", F.col("_hit").isNull()),
        scan_check(
            li,
            "lineitem_qty_range",
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
        ),
        scan_check(ev, "events_value_nonneg", F.col("value") < 0),
        scan_check(docs, "documents_nonempty", F.length("text") == 0),
        cust.agg(
            F.count("*").alias("n_rows"),
            (F.count("*") - F.countDistinct("c_custkey")).alias("n_violations"),
        ).select(
            F.lit("customer_pk_unique").alias("check_name"),
            "n_rows",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# Count-min sketch parameters: d independent hash rows x w counters.
# eps ~ e/w, delta ~ e^-d -> w=512, d=4 bounds the overestimate to
# ~0.5% of stream length with ~98% confidence per query.
CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_TOP_K = 15


def cms_col_j(row_i: Column, key: Column) -> Column:
    """CMS column index for hash row ``row_i`` and ``key`` — the Spark twin
    of the `_CMS_COL_J` SQL fragment; batch build, candidate probe, and the
    streaming grid all share THIS one expression."""
    h = F.md5(F.concat(row_i.cast("string"), F.lit(":"), key))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % CMS_WIDTH


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection through a count-min sketch over
    ``events.user_id``, audited against exact counts.

    The sketch is the distributed-streaming summary the reference's
    counter metrics (A1) would need at cardinalities where exact per-key
    counters stop fitting: a d×w integer grid, built here with ONE
    hash aggregation over a d-fold explode (map-side combine reduces each
    partition's contribution to ≤ d×w cells before the shuffle — the grid
    is mergeable by summation, which is exactly how executors combine).
    The 2 KiB grid is broadcast back, and each candidate's estimate is the
    min over its d cells. CMS error is one-sided (estimate ≥ exact);
    the ``overestimate`` column exposes it, and the oracle replays hash
    rows, grid, and min identically in SQL.
    """
    ev = load_table(spark, sf_dir, "events")
    keys = ev.select(F.col("user_id").cast("string").alias("key"))

    rows_seq = F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))
    hashed = keys.select("key", F.explode(rows_seq).alias("row_i")).select(
        "row_i", cms_col_j(F.col("row_i"), F.col("key")).alias("col_j")
    )
    grid = hashed.groupBy("row_i", "col_j").agg(F.count("*").alias("cell"))

    exact = keys.groupBy("key").agg(F.count("*").alias("exact_count"))
    top = exact.orderBy(F.col("exact_count").desc(), "key").limit(CMS_TOP_K)
    cand = top.select(
        "key", "exact_count", F.explode(rows_seq).alias("row_i")
    ).withColumn("col_j", cms_col_j(F.col("row_i"), F.col("key")))
    est = (
        cand.join(F.broadcast(grid), ["row_i", "col_j"])
        .groupBy("key", "exact_count")
        .agg(F.min("cell").alias("cms_estimate"))
    )
    return est.select(
        "key",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
    )


MI_BIN_W = 50.0  # equi-width value bins for the MI probe
MI_MAX_BIN = 9  # values >= 450 collapse into the top bin


def mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between the event type and the (binned) value —
    the model-agnostic feature-relevance / label-leakage probe a feature
    store runs before training: MI ~ 0 means the column carries nothing
    about the label; MI ~ H(label) means it IS the label. Exact
    cell/marginal counts from two-level hash aggs over a bounded
    (type x bin) grid; each cell's ``p * ln`` term is snapped to the
    12-decimal grid before summing (the BM25-idf device — ``ln`` is the
    one libm call, and per-term snapping makes the 65-term sum immune to
    both last-ulp ``ln`` differences and addition order), then the sum
    reports at 6 decimals alongside the marginal entropies and the
    min-normalized NMI.

    Scale notes (100 TB): one scan into a |types| x |bins| cell table;
    marginals are broadcast re-aggregations of the cells, not re-scans.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.select(
        "event_type",
        F.least(F.floor(F.col("value") / MI_BIN_W), F.lit(MI_MAX_BIN)).alias(
            "bin"
        ),
    ).groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("c"))
    mt = cells.groupBy("event_type").agg(F.sum("c").alias("ct"))
    mb = cells.groupBy("bin").agg(F.sum("c").alias("cb"))
    nrow = cells.agg(F.sum("c").cast("double").alias("n"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    joined = (
        cells.join(F.broadcast(mt), "event_type")
        .join(F.broadcast(mb), "bin")
        .crossJoin(F.broadcast(nrow))
    )
    mi = joined.agg(
        F.sum(
            F.round(
                d("c")
                / F.col("n")
                * F.log(F.col("n") * d("c") / (d("ct") * d("cb"))),
                12,
            )
        ).alias("mi"),
        F.first(F.col("n")).alias("n"),
    )
    ht = mt.crossJoin(F.broadcast(nrow)).agg(
        F.sum(
            F.round(-(d("ct") / F.col("n")) * F.log(d("ct") / F.col("n")), 12)
        ).alias("h_type")
    )
    hb = mb.crossJoin(F.broadcast(nrow)).agg(
        F.sum(
            F.round(-(d("cb") / F.col("n")) * F.log(d("cb") / F.col("n")), 12)
        ).alias("h_bin")
    )
    return (
        mi.crossJoin(F.broadcast(ht))
        .crossJoin(F.broadcast(hb))
        .select(
            F.col("n").cast("long").alias("n_rows"),
            F.round(F.col("mi"), 6).alias("mi_nats"),
            F.round(F.col("h_type"), 6).alias("h_type"),
            F.round(F.col("h_bin"), 6).alias("h_bin"),
            F.round(
                F.col("mi") / F.least(F.col("h_type"), F.col("h_bin")), 6
            ).alias("nmi"),
        )
    )


import math as _math

# Benford expected first-digit shares, folded at plan time (no runtime
# libm): log10(1 + 1/d) for d = 1..9
BENFORD_EXPECTED = {
    d: round(_math.log10(1.0 + 1.0 / d), 12) for d in range(1, 10)
}


def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of order totals — the
    classic fabricated-data / unit-mixing tripwire finance pipelines run
    on money columns. The digit is extracted EXACTLY (first character of
    the integer cents — no runtime log10 on data), the expected shares
    are plan-time literals, and the chi-square statistic folds from exact
    counts; one hash agg over 9 groups, everything else is a 9-row
    read-time computation.
    """
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
    ).cast("long")
    per = o.groupBy(digit.alias("digit")).agg(F.count(F.lit(1)).alias("n"))
    tot = per.agg(F.sum("n").cast("double").alias("n_tot"))
    exp_share = F.element_at(
        F.split(
            F.lit(",".join(str(BENFORD_EXPECTED[d]) for d in range(1, 10))),
            ",",
        ),
        F.col("digit").cast("int"),
    ).cast("double")
    d_n = F.col("n").cast("double")
    e_n = exp_share * F.col("n_tot")
    return per.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("long").alias("n"),
        F.round(100.0 * d_n / F.col("n_tot"), 6).alias("obs_pct"),
        F.round(100.0 * exp_share, 6).alias("exp_pct"),
        F.round((d_n - e_n) * (d_n - e_n) / e_n, 6).alias("chi2_contrib"),
    )


KMV_K = 32
_KMV_M = float(1 << 60)  # hash space: 15 hex chars = 60 bits
_KMV_SALTS = 16


def kmv_set_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k / theta-sketch) distinct estimates with set algebra:
    distinct users per event type ('click', 'purchase'), their union via
    the merged sketch, and their intersection by inclusion-exclusion — the
    MERGEABLE-sketch twin of the exact ``analytics_set_algebra`` rollup.

    Estimator (Bar-Yossef et al. 2002): keep the k smallest 60-bit hashes
    of each set; distinct ~= (k-1) * M / h_k (h_k = k-th smallest, M = hash
    space). Sketches merge by unioning value lists and re-taking the k
    smallest, which is exactly how partial aggregates combine — so at
    100 TB each executor ships k longs per set, never the distinct values.

    Plan shape: one scan builds DISTINCT (type, hash) pairs (a hash-agg
    dedup); the bottom-k per type runs through the shared hierarchical
    ``two_level_topk`` (no window partitioned by a 2-value column); all
    sketch algebra then operates on two array rows. Cross-engine parity:
    the hash is the md5-prefix integer idiom, and the estimate is a single
    IEEE multiply+divide of exactly-representable doubles, floored — no
    round() tie to break.
    """
    from ssiintegrateddatapipeline_spark.functions.topk import two_level_topk

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    pairs = ev.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    smallest = two_level_topk(
        pairs,
        keys=["event_type"],
        order=["h"],
        k=KMV_K,
        salt=F.col("h"),
        n_salts=_KMV_SALTS,
        rank_name="sample_rank",
    )
    sketches = smallest.groupBy("event_type").agg(
        F.sort_array(F.collect_list("h")).alias("ks")
    )
    one = sketches.agg(
        F.max(F.when(F.col("event_type") == "click", F.col("ks"))).alias("ka"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ks"))).alias("kb"),
    ).withColumn(
        "ku",
        F.slice(
            F.array_sort(F.array_distinct(F.concat(F.col("ka"), F.col("kb")))),
            1,
            KMV_K,
        ),
    )

    def _est(arr: Column) -> Column:
        kth = F.element_at(arr, KMV_K).cast("double")
        return F.floor(
            F.when(F.size(arr) < KMV_K, F.size(arr).cast("double")).otherwise(
                F.lit(float(KMV_K - 1)) * F.lit(_KMV_M) / kth
            )
        ).cast("long")

    return one.select(
        _est(F.col("ka")).alias("click_distinct_est"),
        _est(F.col("kb")).alias("purchase_distinct_est"),
        _est(F.col("ku")).alias("union_distinct_est"),
    ).withColumn(
        "intersect_distinct_est",
        F.col("click_distinct_est")
        + F.col("purchase_distinct_est")
        - F.col("union_distinct_est"),
    )


K_ANON_THRESHOLDS = (2, 5, 10)  # the k levels the audit reports against


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney, IJUFKS 2002) over the event log's
    quasi-identifier tuple —
    the governance gate a pipeline runs before releasing "anonymized"
    data: group by the QI columns (event type, event date, value decile
    — the classic generalization of a numeric QI), measure each
    equivalence-class size k, and report how many classes and what share
    of ROWS sit below each k threshold (rows in small classes are the
    re-identifiable ones). One grouped pass builds the class sizes; the
    threshold report is a 3-row conditional aggregate over the class
    table. Exact integers end to end; the row share rounds at 6.

    Scale: the QI groupBy is one map-side-combined shuffle on uniform
    keys; the class table is |QI cardinality| rows, tiny forever."""
    ev = load_table(spark, sf_dir, "events")
    qi = ev.select(
        "event_type",
        F.to_date("ts").alias("event_date"),
        # value decile: a deterministic generalization (floor of value/
        # overall-range-decile would need a census; fixed-width 100-unit
        # bands are the documented public generalization here)
        F.floor(F.col("value") / 100).cast("long").alias("value_band"),
    )
    classes = qi.groupBy("event_type", "event_date", "value_band").agg(
        F.count(F.lit(1)).alias("k")
    )
    aggs = [
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("k").alias("n_rows"),
    ]
    for t in K_ANON_THRESHOLDS:
        aggs.append(
            F.sum((F.col("k") < t).cast("long")).alias(f"classes_lt_{t}")
        )
        aggs.append(
            F.sum(F.when(F.col("k") < t, F.col("k")).otherwise(0)).alias(
                f"rows_lt_{t}"
            )
        )
    g = classes.agg(*aggs)
    stacked = ", ".join(
        f"{t}, classes_lt_{t}, rows_lt_{t}" for t in K_ANON_THRESHOLDS
    )
    return g.select(
        "n_classes",
        "n_rows",
        F.expr(
            f"stack({len(K_ANON_THRESHOLDS)}, {stacked})"
            " AS (k_threshold, classes_below, rows_below)"
        ),
    ).select(
        "k_threshold",
        "n_classes",
        "classes_below",
        "rows_below",
        F.round(F.col("rows_below") / F.col("n_rows"), 6).alias(
            "row_share_below"
        ),
    )


L_DIV_THRESHOLDS = (2, 3, 5)  # distinct-sensitive-values levels reported


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., ICDE 2006) — the
    companion to `profile_k_anonymity`: a large equivalence class is
    still disclosive if everyone in it shares the SENSITIVE value, so
    this measures, per QI class (same generalization as the k-audit),
    the number of DISTINCT sensitive values (user identity here), and
    reports classes and row share below each l level. Same one-grouped-
    pass shape: the class table is (QI, l, k) from a single aggregate
    with countDistinct over the uniform QI keys."""
    ev = load_table(spark, sf_dir, "events")
    qi = ev.select(
        "event_type",
        F.to_date("ts").alias("event_date"),
        F.floor(F.col("value") / 100).cast("long").alias("value_band"),
        "user_id",
    )
    classes = qi.groupBy("event_type", "event_date", "value_band").agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct("user_id").alias("l"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("k").alias("n_rows"),
    ]
    for t in L_DIV_THRESHOLDS:
        aggs.append(
            F.sum((F.col("l") < t).cast("long")).alias(f"classes_lt_{t}")
        )
        aggs.append(
            F.sum(F.when(F.col("l") < t, F.col("k")).otherwise(0)).alias(
                f"rows_lt_{t}"
            )
        )
    g = classes.agg(*aggs)
    stacked = ", ".join(
        f"{t}, classes_lt_{t}, rows_lt_{t}" for t in L_DIV_THRESHOLDS
    )
    return g.select(
        "n_classes",
        "n_rows",
        F.expr(
            f"stack({len(L_DIV_THRESHOLDS)}, {stacked})"
            " AS (l_threshold, classes_below, rows_below)"
        ),
    ).select(
        "l_threshold",
        "n_classes",
        "classes_below",
        "rows_below",
        F.round(F.col("rows_below") / F.col("n_rows"), 6).alias(
            "row_share_below"
        ),
    )


# t thresholds as exact rationals (num, den) so the above/below decision is
# an INTEGER comparison — no float EMD ever crosses a threshold boundary
T_CLOSE_THRESHOLDS = ((1, 5), (7, 20), (1, 2))  # 0.2, 0.35, 0.5


def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    third leg of the privacy triad after `profile_k_anonymity` and
    `profile_l_diversity`: a class can be large (k ok) and diverse (l ok)
    yet still disclosive if its SENSITIVE-value distribution differs from
    the table's, so this measures, per QI class, the Earth Mover's
    Distance between the class distribution and the global distribution
    of the ordered sensitive generalization (the same 100-unit value
    band the sibling audits use), EMD over B ordered bins =
    (1/(B-1))·Σ_j |cumP_j − cumQ_j|.

    Everything up to the report is INTEGER-exact: cumulative counts are
    cross-multiplied (|cumP·N − cumQ·k|) instead of divided, and each
    threshold t = num/den is compared as emd_num·den > num·k·N·(B−1),
    so the violation decision never touches floating point. Only the
    reported max_emd divides (and rounds at 6).

    Scale shape: one grouped pass builds the (class, band) counts; the
    band table and the scalar (N, B) row are tiny broadcast artifacts;
    the per-class cumulative window is partitioned by class over ≤ B
    rows (bounded by construction — B is a fixed-width banding of the
    value domain), never a global single-partition window."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.to_date("ts").alias("event_date"),
        F.floor(F.col("value") / 100).cast("long").alias("s_band"),
    )
    cls_band = base.groupBy("event_type", "event_date", "s_band").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # global band distribution + its cumulative (B rows, post-aggregate)
    band = cls_band.groupBy("s_band").agg(F.sum("cnt").alias("q_cnt"))
    band = band.select(
        "s_band",
        F.sum("q_cnt")
        .over(Window.orderBy("s_band").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_q"),
    )
    scalars = band.agg(
        F.max("cum_q").alias("n_total"), F.count(F.lit(1)).alias("n_bands")
    )
    classes = cls_band.groupBy("event_type", "event_date").agg(
        F.sum("cnt").alias("k")
    )
    grid = classes.crossJoin(F.broadcast(band))
    joined = grid.join(
        cls_band, ["event_type", "event_date", "s_band"], "left"
    ).withColumn("cnt", F.coalesce("cnt", F.lit(0)))
    wc = (
        Window.partitionBy("event_type", "event_date")
        .orderBy("s_band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = joined.withColumn("cum_p", F.sum("cnt").over(wc))
    per_class = (
        cum.crossJoin(F.broadcast(scalars))
        .groupBy("event_type", "event_date")
        .agg(
            F.max("k").alias("k"),
            F.max("n_total").alias("n_total"),
            F.max("n_bands").alias("n_bands"),
            F.sum(
                F.abs(F.col("cum_p") * F.col("n_total") - F.col("cum_q") * F.col("k"))
            ).alias("emd_num"),
        )
    )
    denom = F.col("k") * F.col("n_total") * (F.col("n_bands") - 1)
    aggs = [
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("k").alias("n_rows"),
        F.round(F.max(F.col("emd_num") / denom), 6).alias("max_emd"),
    ]
    for num, den in T_CLOSE_THRESHOLDS:
        viol = F.col("emd_num") * den > num * denom
        aggs.append(F.sum(viol.cast("long")).alias(f"classes_gt_{num}_{den}"))
        aggs.append(
            F.sum(F.when(viol, F.col("k")).otherwise(0)).alias(f"rows_gt_{num}_{den}")
        )
    g = per_class.agg(*aggs)
    stacked = ", ".join(
        f"CAST({num} AS DOUBLE)/{den}, classes_gt_{num}_{den}, rows_gt_{num}_{den}"
        for num, den in T_CLOSE_THRESHOLDS
    )
    return g.select(
        "n_classes",
        "n_rows",
        "max_emd",
        F.expr(
            f"stack({len(T_CLOSE_THRESHOLDS)}, {stacked})"
            " AS (t_threshold, classes_above, rows_above)"
        ),
    ).select(
        "t_threshold",
        "n_classes",
        "classes_above",
        "rows_above",
        F.round(F.col("rows_above") / F.col("n_rows"), 6).alias("row_share_above"),
        "max_emd",
    )


# ---------------------------------------------------------------------------
# Functional-dependency discovery audit (the Metanome/TANE profiling
# family): for each candidate FD lhs → rhs, does every lhs value map to
# exactly one rhs value, and if not, how badly is it violated (g3-style:
# violating lhs groups and the row mass that would need to change)? The
# per-FD check is one two-level hash aggregate over (lhs, rhs) — uniform
# keys, map-side combined; candidates are a fixed literal list, so the
# audit is a union of bounded per-FD summaries.
# ---------------------------------------------------------------------------

FD_CANDIDATES = (
    # (table, lhs, rhs) — mix of FDs that hold and FDs that are violated
    ("nation", "n_nationkey", "n_regionkey"),
    ("customer", "c_custkey", "c_nationkey"),
    ("orders", "o_custkey", "o_orderstatus"),
    ("events", "user_id", "event_type"),
    ("lineitem", "l_orderkey", "l_suppkey"),
)


def functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for tbl, lhs, rhs in FD_CANDIDATES:
        t = load_table(spark, sf_dir, tbl)
        pairs = t.groupBy(
            F.col(lhs).alias("lhs"), F.col(rhs).alias("rhs")
        ).agg(F.count(F.lit(1)).alias("n"))
        per_lhs = pairs.groupBy("lhs").agg(
            F.count(F.lit(1)).alias("n_rhs"),
            F.sum("n").alias("rows"),
            F.max("n").alias("max_rhs_rows"),
        )
        summary = per_lhs.agg(
            F.lit(tbl).alias("table_name"),
            F.lit(f"{lhs}->{rhs}").alias("fd"),
            F.count(F.lit(1)).alias("n_lhs_values"),
            F.sum((F.col("n_rhs") > 1).cast("long")).alias("violating_lhs"),
            # g3 repair mass: rows that must change for the FD to hold
            F.sum(F.col("rows") - F.col("max_rhs_rows")).alias("repair_rows"),
            F.sum("rows").alias("n_rows"),
        )
        summary = summary.select(
            "table_name",
            "fd",
            "n_lhs_values",
            "violating_lhs",
            (F.col("violating_lhs") == 0).alias("holds"),
            "repair_rows",
            F.round(F.col("repair_rows") / F.col("n_rows"), 6).alias(
                "violation_rate"
            ),
        )
        out = summary if out is None else out.unionByName(summary)
    return out


def _fd_oracle() -> str:
    parts = []
    for tbl, lhs, rhs in FD_CANDIDATES:
        parts.append(f"""
        SELECT '{tbl}' AS table_name, '{lhs}->{rhs}' AS fd,
               count(*)::BIGINT AS n_lhs_values,
               sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)::BIGINT
                   AS violating_lhs,
               sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0 AS holds,
               sum(rows - max_rhs_rows)::BIGINT AS repair_rows,
               round(sum(rows - max_rhs_rows)
                     / CAST(sum(rows) AS DOUBLE), 6) AS violation_rate
        FROM (
            SELECT lhs, count(*) AS n_rhs, sum(n) AS rows,
                   max(n) AS max_rhs_rows
            FROM (
                SELECT {lhs} AS lhs, {rhs} AS rhs, count(*) AS n
                FROM {tbl} GROUP BY 1, 2
            ) GROUP BY lhs
        )""")
    return " UNION ALL ".join(parts)


def referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the star schema's FK edges — the
    data-contract check a warehouse runs after every load: for each
    child->parent edge, the child row count, the count of orphan child
    rows (FK value with no parent), and the count of childless parents
    (left-anti both ways). Orphans use a LEFT ANTI join against the
    parent's key projection (broadcast for the small dims, keyed shuffle
    for orders<->lineitem — exactly the join the load itself does, so
    the audit costs one extra pass, not a new shape)."""
    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
        ("part", "p_partkey", "part", "p_partkey"),  # identity: 0 orphans
    ]
    out = None
    for child, ck, parent, pk in edges:
        c = load_table(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias("k"))
        row = (
            c.agg(F.count(F.lit(1)).alias("child_rows"))
            .crossJoin(
                c.join(p, "k", "left_anti")
                .agg(F.count(F.lit(1)).alias("orphan_rows"))
            )
            .crossJoin(
                p.join(c, "k", "left_anti")
                .agg(F.count(F.lit(1)).alias("childless_parents"))
            )
            .select(
                F.lit(f"{child}.{ck} -> {parent}.{pk}").alias("fk_edge"),
                "child_rows",
                "orphan_rows",
                "childless_parents",
                (F.col("orphan_rows") == 0).alias("intact"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


SKEW_KEYS = (  # candidate partition keys the layout advisor grades
    ("event_type", "event_type"),
    ("user_bucket", "pmod(user_id, 1024)"),
    ("event_day", "CAST(ts AS DATE)"),
)


def partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout advisor: for each CANDIDATE partition key, the partition
    count and the skew shape of its row distribution — max/mean ratio
    (straggler factor: the slowest task's load vs the average) and the
    share of rows in the single largest partition. This is the number
    that decides bucketing/partitioning at 100 TB: a key with max/mean
    40x puts 40x the average on one task no matter how many executors
    exist. One grouped count per candidate (map-side combined), then a
    |partitions|-row reduce per key; exact integers, ratios rounded 6."""
    ev = load_table(spark, sf_dir, "events")
    out = None
    for key_name, expr in SKEW_KEYS:
        sizes = ev.groupBy(F.expr(expr).alias("k")).agg(
            F.count(F.lit(1)).alias("rows")
        )
        row = sizes.agg(
            F.lit(key_name).alias("candidate_key"),
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum("rows").alias("n_rows"),
            F.max("rows").alias("max_rows"),
        ).select(
            "candidate_key",
            "n_partitions",
            F.round(
                F.col("max_rows")
                / (F.col("n_rows") / F.col("n_partitions")),
                6,
            ).alias("max_over_mean"),
            F.round(F.col("max_rows") / F.col("n_rows"), 6).alias(
                "top_partition_share"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out


KLL_K = 256  # per-level buffer capacity of the rank sketch
KLL_RANK_EPS = 0.05  # rank-error contract the oracle pins (fraction of n)


def _kll_partition_sketch(values) -> list[tuple[int, int]]:
    """Deterministic KLL-style rank sketch of one partition's int64 values:
    level buffers of capacity KLL_K; a full buffer sorts and keeps
    alternating survivors (parity flips per compaction — deterministic, no
    RNG), promoting them with doubled weight. Returns [(item, weight)]."""
    levels: list[list[int]] = [[]]
    parity = 0
    for v in values:
        levels[0].append(int(v))
        lvl = 0
        while len(levels[lvl]) >= KLL_K:
            buf = sorted(levels[lvl])
            levels[lvl] = []
            if lvl + 1 == len(levels):
                levels.append([])
            levels[lvl + 1].extend(buf[parity::2])
            parity ^= 1
            lvl += 1
    return [
        (item, 1 << lvl)
        for lvl, buf in enumerate(levels)
        for item in buf
    ]


def kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable rank/quantile sketch — the percentile machine of a 100 TB
    profile pass, completing the sketch family (CMS: frequencies, KMV/HLL:
    cardinality, KLL: ranks). Each partition folds its values into a
    deterministic KLL sketch (Arrow-batched, no RNG); the union of the
    tiny (item, weight) survivor sets IS the mergeable summary — rank
    estimates are plain weighted-count aggregates over it, so no global
    sort, no single-partition window, no driver collect anywhere.

    Oracle device (the profile_approx_distinct accuracy-contract
    precedent): DuckDB cannot replay the sketch bit-for-bit, but the
    CONTRACT is portable — for each probed percentile the sketch's
    estimated rank of the exact quantile must sit within
    KLL_RANK_EPS · n of the true rank, and the summary must be at most
    a fixed fraction of the input. A drifting sketch flips a boolean and
    fails the hash."""
    from collections.abc import Iterator as _Iterator

    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    vals = ev.select(
        F.round(F.col("value") * 1e6).cast("long").alias("v")
    )

    def build(batches: _Iterator[pd.DataFrame]) -> _Iterator[pd.DataFrame]:
        import math as _math

        acc: list[int] = []
        for pdf in batches:
            acc.extend(int(x) for x in pdf["v"])
        sk = _kll_partition_sketch(acc)
        # the logarithmic-size contract, checked where the sketch lives:
        # items <= K * (#levels + slack), #levels <= log2(rows/K) + 2
        cap = KLL_K * (
            _math.floor(_math.log2(max(len(acc), KLL_K) / KLL_K)) + 3
        )
        yield pd.DataFrame(
            {
                "item": [s[0] for s in sk],
                "weight": [s[1] for s in sk],
                "bounded": [len(sk) <= cap] * len(sk),
            }
        )

    sketch = vals.mapInPandas(
        build, schema="item long, weight long, bounded boolean"
    )

    # exact quantiles (three probes) + exact ranks in ONE pass each
    probes = (0.5, 0.95, 0.99)
    qs = vals.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.percentile("v", F.lit(p)).alias(f"q{int(p * 100)}")
            for p in probes
        ],
    )
    j = sketch.crossJoin(F.broadcast(qs))
    est = j.agg(
        F.max("n_rows").alias("n_rows"),
        F.min("bounded").alias("sketch_bounded"),
        F.sum("weight").alias("total_weight"),
        *[
            F.sum(
                F.when(
                    F.col("item") <= F.col(f"q{int(p * 100)}"),
                    F.col("weight"),
                ).otherwise(0)
            ).alias(f"est_rank_{int(p * 100)}")
            for p in probes
        ],
    )
    true_ranks = vals.crossJoin(F.broadcast(qs)).agg(
        *[
            F.sum(
                (F.col("v") <= F.col(f"q{int(p * 100)}")).cast("long")
            ).alias(f"true_rank_{int(p * 100)}")
            for p in probes
        ],
    )
    out = est.crossJoin(F.broadcast(true_ranks))
    eps = F.col("n_rows") * KLL_RANK_EPS
    return out.select(
        F.lit("events.value").alias("measure"),
        "n_rows",
        "sketch_bounded",
        (F.col("total_weight") == F.col("n_rows")).alias("weight_exact"),
        *[
            (
                F.abs(
                    F.col(f"est_rank_{int(p * 100)}")
                    - F.col(f"true_rank_{int(p * 100)}")
                )
                <= eps
            ).alias(f"p{int(p * 100)}_within_bound")
            for p in probes
        ],
    )


def expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite (the Deequ/Great-
    Expectations shape): a set of named constraints evaluated over the
    events table in ONE scan — every check folds to an aggregate over the
    same pass, then the single result row unpivots to one row per
    constraint via ``stack``. At 100 TB this is the cheapest possible
    audit: no constraint adds a scan or a shuffle beyond the one
    hash-aggregate.

    Constraints: completeness (props non-null), uniqueness (event_id),
    non-negativity (value), domain membership (event_type), pattern
    compliance (event_type lowercase alpha), and bounded timestamps
    (ts within the corpus's plausible decade)."""
    ev = load_table(spark, sf_dir, "events")
    domain = ("click", "signup", "purchase", "error", "view")
    agg = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("props").isNull().cast("long")).alias("v_completeness"),
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("v_unique"),
        F.sum((F.col("value") < 0).cast("long")).alias("v_nonneg"),
        F.sum((~F.col("event_type").isin(*domain)).cast("long")).alias(
            "v_domain"
        ),
        F.sum(
            (~F.col("event_type").rlike("^[a-z]+$")).cast("long")
        ).alias("v_pattern"),
        F.sum(
            (
                (F.col("ts") < F.lit("2020-01-01").cast("timestamp"))
                | (F.col("ts") >= F.lit("2030-01-01").cast("timestamp"))
            ).cast("long")
        ).alias("v_ts_bounds"),
    )
    stacked = agg.select(
        "n_rows",
        F.expr(
            "stack(6,"
            " 'completeness', 'props', v_completeness,"
            " 'uniqueness', 'event_id', v_unique,"
            " 'non_negative', 'value', v_nonneg,"
            " 'domain', 'event_type', v_domain,"
            " 'pattern', 'event_type', v_pattern,"
            " 'bounds', 'ts', v_ts_bounds"
            ") AS (check_name, column_name, n_violations)"
        ),
    )
    return stacked.select(
        "check_name",
        "column_name",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("satisfied"),
    )


QUERIES = {
    "profile_kll_quantiles": kll_quantiles,
    "profile_expectation_suite": expectation_suite,
    "profile_k_anonymity": k_anonymity_audit,
    "profile_functional_deps": functional_dependencies,
    "profile_t_closeness": t_closeness_audit,
    "profile_l_diversity": l_diversity_audit,
    "profile_referential_integrity": referential_integrity,
    "profile_partition_skew": partition_skew_report,
    "profile_kmv_sets": kmv_set_sketches,
    "profile_mutual_information": mutual_information,
    "profile_benford_audit": benford_audit,
    "profile_cms_heavy_hitters": cms_heavy_hitters,
    "profile_quality_checks": profile_quality_checks,
    "profile_correlations": profile_correlations,
    "profile_approx_distinct": profile_approx_distinct,
    "profile_columns": profile_columns,
    "profile_numeric": profile_numeric,
    "profile_top_values": profile_top_values,
}

_PROFILE_ORACLE_ROWS = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS column_name,
           count(*) AS n_rows,
           count({c}) AS n_nonnull,
           count(DISTINCT {c}) AS n_distinct,
           {f"cast(min({c}) AS VARCHAR)" if renderable else "CAST(NULL AS VARCHAR)"} AS min_repr,
           {f"cast(max({c}) AS VARCHAR)" if renderable else "CAST(NULL AS VARCHAR)"} AS max_repr
    FROM events
    """
    for c, renderable in _PROFILE_COLS
)

_NUMERIC_ORACLE = """
    SELECT measure, n,
           round(s / n, 6) AS mean,
           round(sqrt((ss - s * s / n) / (n - 1)), 6) AS stddev
    FROM (
        SELECT '{label}' AS measure, count(*) AS n,
               sum(cast({col} AS DOUBLE)) AS s,
               sum(cast({col} AS DOUBLE) * cast({col} AS DOUBLE)) AS ss
        FROM {table}
    )
"""

_TOP_ORACLE = """
    SELECT '{label}' AS column_name, val, freq, rank FROM (
        SELECT {col} AS val, count(*) AS freq,
               row_number() OVER (ORDER BY count(*) DESC, {col} ASC) AS rank
        FROM {table} GROUP BY {col}
    ) WHERE rank <= 3
"""

def _corr_oracle() -> str:
    cols = _CORR_COLS
    sums = ["count(*)::DOUBLE AS n"]
    for c, shift in cols:
        sums.append(f"sum({c} - {shift}) AS s_{c}")
        sums.append(f"sum(({c} - {shift}) * ({c} - {shift})) AS ss_{c}")
    for i, (cx, sx) in enumerate(cols):
        for cy, sy in cols[i + 1 :]:
            sums.append(f"sum(({cx} - {sx}) * ({cy} - {sy})) AS sp_{cx}_{cy}")
    selects = []
    for i, (cx, _) in enumerate(cols):
        for cy, _ in cols[i + 1 :]:
            selects.append(
                f"SELECT '{cx}' AS col_x, '{cy}' AS col_y, "
                f"round((n * sp_{cx}_{cy} - s_{cx} * s_{cy}) / "
                f"(sqrt(n * ss_{cx} - s_{cx} * s_{cx})"
                f" * sqrt(n * ss_{cy} - s_{cy} * s_{cy})), 6) AS pearson_r, "
                f"n::BIGINT AS n_rows FROM wide"
            )
    body = " UNION ALL ".join(selects)
    return f"WITH wide AS (SELECT {', '.join(sums)} FROM lineitem) {body}"


_CORR_ORACLE = _corr_oracle()


# hash-row CTE shared by the sketch build and the candidate probe — the
# same md5 device as the Spark side, one source of truth via f-string
_CMS_COL_J = (
    "(('0x' || substr(md5(row_i::VARCHAR || ':' || key), 1, 8))"
    f"::UBIGINT::BIGINT % {CMS_WIDTH})"
)

_BENFORD_CASE = " ".join(
    # explicit DOUBLE per branch: a bare decimal literal is DECIMAL in
    # DuckDB, and decimal arithmetic would diverge from the double path
    f"WHEN {d} THEN CAST({BENFORD_EXPECTED[d]} AS DOUBLE)"
    for d in range(1, 10)
)

_K_ANON_ORACLE = f"""
    WITH classes AS (
        SELECT event_type, CAST(ts AS DATE) AS event_date,
               CAST(floor(value / 100) AS BIGINT) AS value_band,
               count(*) AS k
        FROM events GROUP BY 1, 2, 3
    ),
    g AS (
        SELECT count(*) AS n_classes, sum(k)::BIGINT AS n_rows,
               {", ".join(
                   f"sum(CASE WHEN k < {t} THEN 1 ELSE 0 END)::BIGINT"
                   f" AS classes_lt_{t},"
                   f" sum(CASE WHEN k < {t} THEN k ELSE 0 END)::BIGINT"
                   f" AS rows_lt_{t}"
                   for t in K_ANON_THRESHOLDS
               )}
        FROM classes
    )
    {" UNION ALL ".join(
        f"SELECT {t} AS k_threshold, n_classes, classes_lt_{t}"
        f" AS classes_below, rows_lt_{t} AS rows_below,"
        f" round(rows_lt_{t}::DOUBLE / n_rows, 6) AS row_share_below FROM g"
        for t in K_ANON_THRESHOLDS
    )}
"""

_T_CLOSE_ORACLE = f"""
    WITH cls_band AS (
        SELECT event_type, CAST(ts AS DATE) AS event_date,
               CAST(floor(value / 100) AS BIGINT) AS s_band, count(*) AS cnt
        FROM events GROUP BY 1, 2, 3
    ),
    band AS (
        SELECT s_band,
               CAST(sum(q_cnt) OVER (ORDER BY s_band ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_q
        FROM (SELECT s_band, sum(cnt) AS q_cnt FROM cls_band GROUP BY 1)
    ),
    scalars AS (
        SELECT max(cum_q) AS n_total, count(*)::BIGINT AS n_bands FROM band
    ),
    classes AS (
        SELECT event_type, event_date, sum(cnt)::BIGINT AS k
        FROM cls_band GROUP BY 1, 2
    ),
    cum AS (
        SELECT g.event_type, g.event_date, g.k, g.cum_q,
               CAST(sum(coalesce(cb.cnt, 0)) OVER (
                   PARTITION BY g.event_type, g.event_date
                   ORDER BY g.s_band ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_p
        FROM (SELECT c.event_type, c.event_date, c.k, b.s_band, b.cum_q
              FROM classes c CROSS JOIN band b) g
        LEFT JOIN cls_band cb USING (event_type, event_date, s_band)
    ),
    per_class AS (
        SELECT event_type, event_date, max(k) AS k,
               max(n_total) AS n_total, max(n_bands) AS n_bands,
               sum(abs(cum_p * n_total - cum_q * k))::BIGINT AS emd_num
        FROM cum CROSS JOIN scalars GROUP BY 1, 2
    ),
    g AS (
        SELECT count(*) AS n_classes, sum(k)::BIGINT AS n_rows,
               round(max(emd_num::DOUBLE
                         / (k * n_total * (n_bands - 1))), 6) AS max_emd,
               {", ".join(
                   f"sum(CASE WHEN emd_num * {den} > {num} * k * n_total *"
                   f" (n_bands - 1) THEN 1 ELSE 0 END)::BIGINT"
                   f" AS classes_gt_{num}_{den},"
                   f" sum(CASE WHEN emd_num * {den} > {num} * k * n_total *"
                   f" (n_bands - 1) THEN k ELSE 0 END)::BIGINT"
                   f" AS rows_gt_{num}_{den}"
                   for num, den in T_CLOSE_THRESHOLDS
               )}
        FROM per_class
    )
    {" UNION ALL ".join(
        f"SELECT CAST({num} AS DOUBLE)/{den} AS t_threshold, n_classes,"
        f" classes_gt_{num}_{den} AS classes_above,"
        f" rows_gt_{num}_{den} AS rows_above,"
        f" round(rows_gt_{num}_{den}::DOUBLE / n_rows, 6) AS row_share_above,"
        f" max_emd FROM g"
        for num, den in T_CLOSE_THRESHOLDS
    )}
"""

_RI_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("part", "p_partkey", "part", "p_partkey"),
]

# NOT EXISTS, not NOT IN: a NULL in the referenced-key projection makes
# NOT IN three-valued (zero rows reported) while the Spark side's
# left_anti counts every non-matching row — NOT EXISTS is null-safe and
# plans identically in DuckDB, so the parity holds even on a nullable FK
_RI_ORACLE = " UNION ALL ".join(
    f"""
    SELECT '{c}.{ck} -> {p}.{pk}' AS fk_edge,
           (SELECT count(*) FROM {c}) AS child_rows,
           (SELECT count(*) FROM {c} ch
            WHERE NOT EXISTS (SELECT 1 FROM {p} pa
                              WHERE pa.{pk} = ch.{ck})) AS orphan_rows,
           (SELECT count(*) FROM {p} pa
            WHERE NOT EXISTS (SELECT 1 FROM {c} ch
                              WHERE ch.{ck} = pa.{pk}))
               AS childless_parents,
           (SELECT count(*) FROM {c} ch
            WHERE NOT EXISTS (SELECT 1 FROM {p} pa
                              WHERE pa.{pk} = ch.{ck})) = 0 AS intact
    """
    for c, ck, p, pk in _RI_EDGES
)

_SKEW_ORACLE = " UNION ALL ".join(
    f"""
    SELECT '{name}' AS candidate_key,
           count(*) AS n_partitions,
           round(max(rows)::DOUBLE
                 / (sum(rows)::DOUBLE / count(*)), 6) AS max_over_mean,
           round(max(rows)::DOUBLE / sum(rows), 6) AS top_partition_share
    FROM (SELECT {expr} AS k, count(*) AS rows FROM events GROUP BY 1)
    """
    for name, expr in (
        ("event_type", "event_type"),
        ("user_bucket", "user_id % 1024"),
        ("event_day", "CAST(ts AS DATE)"),
    )
)

_L_DIV_ORACLE = f"""
    WITH classes AS (
        SELECT event_type, CAST(ts AS DATE) AS event_date,
               CAST(floor(value / 100) AS BIGINT) AS value_band,
               count(*) AS k,
               count(DISTINCT user_id) AS l
        FROM events GROUP BY 1, 2, 3
    ),
    g AS (
        SELECT count(*) AS n_classes, sum(k)::BIGINT AS n_rows,
               {", ".join(
                   f"sum(CASE WHEN l < {t} THEN 1 ELSE 0 END)::BIGINT"
                   f" AS classes_lt_{t},"
                   f" sum(CASE WHEN l < {t} THEN k ELSE 0 END)::BIGINT"
                   f" AS rows_lt_{t}"
                   for t in L_DIV_THRESHOLDS
               )}
        FROM classes
    )
    {" UNION ALL ".join(
        f"SELECT {t} AS l_threshold, n_classes, classes_lt_{t}"
        f" AS classes_below, rows_lt_{t} AS rows_below,"
        f" round(rows_lt_{t}::DOUBLE / n_rows, 6) AS row_share_below FROM g"
        for t in L_DIV_THRESHOLDS
    )}
"""

ORACLES = {
    # the accuracy-contract device (profile_approx_distinct precedent):
    # the sketch itself is not SQL-replayable, but the portable contract
    # is — exact row count plus the boolean guarantees the sketch must
    # uphold; any rank drift past eps or size blow-up flips a value
    "profile_kll_quantiles": """
        SELECT 'events.value' AS measure,
               count(*) AS n_rows,
               TRUE AS sketch_bounded,
               TRUE AS weight_exact,
               TRUE AS p50_within_bound,
               TRUE AS p95_within_bound,
               TRUE AS p99_within_bound
        FROM events
    """,
    "profile_expectation_suite": """
        WITH agg AS (
            SELECT count(*) AS n_rows,
                   count(*) FILTER (props IS NULL) AS v_completeness,
                   count(*) - count(DISTINCT event_id) AS v_unique,
                   count(*) FILTER (value < 0) AS v_nonneg,
                   count(*) FILTER (event_type NOT IN
                       ('click','signup','purchase','error','view'))
                       AS v_domain,
                   count(*) FILTER (NOT regexp_matches(event_type,
                       '^[a-z]+$')) AS v_pattern,
                   count(*) FILTER (ts < TIMESTAMP '2020-01-01'
                       OR ts >= TIMESTAMP '2030-01-01') AS v_ts_bounds
            FROM events
        )
        SELECT u.check_name, u.column_name, agg.n_rows,
               u.n_violations::BIGINT AS n_violations,
               u.n_violations = 0 AS satisfied
        FROM agg, LATERAL (VALUES
            ('completeness', 'props', v_completeness),
            ('uniqueness', 'event_id', v_unique),
            ('non_negative', 'value', v_nonneg),
            ('domain', 'event_type', v_domain),
            ('pattern', 'event_type', v_pattern),
            ('bounds', 'ts', v_ts_bounds)
        ) AS u(check_name, column_name, n_violations)
    """,
    "profile_l_diversity": _L_DIV_ORACLE,
    "profile_t_closeness": _T_CLOSE_ORACLE,
    "profile_functional_deps": _fd_oracle(),
    "profile_k_anonymity": _K_ANON_ORACLE,
    "profile_referential_integrity": _RI_ORACLE,
    "profile_partition_skew": _SKEW_ORACLE,
    "profile_kmv_sets": f"""
        WITH pairs AS (
            SELECT DISTINCT event_type,
                   (('0x' || substr(md5(user_id::VARCHAR), 1, 15))
                    ::UBIGINT)::BIGINT AS h
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        ka AS (SELECT h FROM pairs WHERE event_type = 'click'
               ORDER BY h LIMIT {KMV_K}),
        kb AS (SELECT h FROM pairs WHERE event_type = 'purchase'
               ORDER BY h LIMIT {KMV_K}),
        ku AS (SELECT DISTINCT h FROM
                   (SELECT h FROM ka UNION ALL SELECT h FROM kb)
               ORDER BY h LIMIT {KMV_K}),
        est AS (
            SELECT
                (SELECT CASE WHEN count(*) < {KMV_K} THEN count(*)::DOUBLE
                             ELSE {KMV_K - 1}.0 * {1 << 60}.0
                                  / max(h)::DOUBLE END FROM ka) AS ea,
                (SELECT CASE WHEN count(*) < {KMV_K} THEN count(*)::DOUBLE
                             ELSE {KMV_K - 1}.0 * {1 << 60}.0
                                  / max(h)::DOUBLE END FROM kb) AS eb,
                (SELECT CASE WHEN count(*) < {KMV_K} THEN count(*)::DOUBLE
                             ELSE {KMV_K - 1}.0 * {1 << 60}.0
                                  / max(h)::DOUBLE END FROM ku) AS eu
        )
        SELECT floor(ea)::BIGINT AS click_distinct_est,
               floor(eb)::BIGINT AS purchase_distinct_est,
               floor(eu)::BIGINT AS union_distinct_est,
               floor(ea)::BIGINT + floor(eb)::BIGINT - floor(eu)::BIGINT
                   AS intersect_distinct_est
        FROM est
    """,
    "profile_benford_audit": f"""
        WITH per AS (
            SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                   count(*) AS n
            FROM orders GROUP BY 1
        ), tot AS (SELECT CAST(sum(n) AS DOUBLE) AS n_tot FROM per)
        SELECT digit,
               CAST(n AS BIGINT) AS n,
               round(100.0 * CAST(n AS DOUBLE) / n_tot, 6) AS obs_pct,
               round(100.0 * (CASE digit {_BENFORD_CASE} END), 6) AS exp_pct,
               round((CAST(n AS DOUBLE)
                      - (CASE digit {_BENFORD_CASE} END) * n_tot)
                     * (CAST(n AS DOUBLE)
                        - (CASE digit {_BENFORD_CASE} END) * n_tot)
                     / ((CASE digit {_BENFORD_CASE} END) * n_tot), 6)
                   AS chi2_contrib
        FROM per CROSS JOIN tot
    """,
    "profile_mutual_information": f"""
        WITH cells AS (
            SELECT event_type,
                   least(CAST(floor(value / {MI_BIN_W}) AS BIGINT),
                         {MI_MAX_BIN}) AS bin,
                   count(*) AS c
            FROM events GROUP BY 1, 2
        ), mt AS (
            SELECT event_type, CAST(sum(c) AS BIGINT) AS ct
            FROM cells GROUP BY 1
        ), mb AS (
            SELECT bin, CAST(sum(c) AS BIGINT) AS cb FROM cells GROUP BY 1
        ), nrow AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM cells),
        mi AS (
            SELECT sum(round(
                       CAST(c AS DOUBLE) / n
                       * ln(n * CAST(c AS DOUBLE)
                            / (CAST(ct AS DOUBLE) * CAST(cb AS DOUBLE))),
                       12)) AS mi,
                   max(n) AS n
            FROM cells
            JOIN mt USING (event_type) JOIN mb USING (bin) CROSS JOIN nrow
        ), ht AS (
            SELECT sum(round(-(CAST(ct AS DOUBLE) / n)
                             * ln(CAST(ct AS DOUBLE) / n), 12)) AS h_type
            FROM mt CROSS JOIN nrow
        ), hb AS (
            SELECT sum(round(-(CAST(cb AS DOUBLE) / n)
                             * ln(CAST(cb AS DOUBLE) / n), 12)) AS h_bin
            FROM mb CROSS JOIN nrow
        )
        SELECT CAST(n AS BIGINT) AS n_rows,
               round(mi, 6) AS mi_nats,
               round(h_type, 6) AS h_type,
               round(h_bin, 6) AS h_bin,
               round(mi / least(h_type, h_bin), 6) AS nmi
        FROM mi CROSS JOIN ht CROSS JOIN hb
    """,
    "profile_cms_heavy_hitters": f"""
        WITH keys AS (SELECT user_id::VARCHAR AS key FROM events),
        rows_d AS (
            SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS row_i
        ),
        hashed AS (
            SELECT row_i, {_CMS_COL_J} AS col_j
            FROM keys CROSS JOIN rows_d
        ),
        grid AS (
            SELECT row_i, col_j, count(*) AS cell
            FROM hashed GROUP BY row_i, col_j
        ),
        exact AS (SELECT key, count(*) AS exact_count FROM keys GROUP BY key),
        top AS (
            SELECT key, exact_count FROM exact
            ORDER BY exact_count DESC, key LIMIT {CMS_TOP_K}
        ),
        cand AS (
            SELECT key, exact_count, row_i, {_CMS_COL_J} AS col_j
            FROM top CROSS JOIN rows_d
        ),
        est AS (
            SELECT c.key, c.exact_count, min(g.cell) AS cms_estimate
            FROM cand c JOIN grid g USING (row_i, col_j)
            GROUP BY c.key, c.exact_count
        )
        SELECT key, exact_count, cms_estimate,
               cms_estimate - exact_count AS overestimate
        FROM est
    """,
    "profile_quality_checks": """
        SELECT 'orders_custkey_fk' AS check_name,
               (SELECT count(*) FROM orders) AS n_rows,
               (SELECT count(*) FROM orders o WHERE NOT EXISTS
                    (SELECT 1 FROM customer c
                     WHERE c.c_custkey = o.o_custkey)) AS n_violations,
               (SELECT count(*) FROM orders o WHERE NOT EXISTS
                    (SELECT 1 FROM customer c
                     WHERE c.c_custkey = o.o_custkey)) = 0 AS passed
        UNION ALL
        SELECT 'lineitem_qty_range', count(*),
               sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                        THEN 1 ELSE 0 END)::BIGINT,
               sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                        THEN 1 ELSE 0 END) = 0
        FROM lineitem
        UNION ALL
        SELECT 'events_value_nonneg', count(*),
               sum(CASE WHEN value < 0 THEN 1 ELSE 0 END)::BIGINT,
               sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) = 0
        FROM events
        UNION ALL
        SELECT 'documents_nonempty', count(*),
               sum(CASE WHEN len(text) = 0 THEN 1 ELSE 0 END)::BIGINT,
               sum(CASE WHEN len(text) = 0 THEN 1 ELSE 0 END) = 0
        FROM documents
        UNION ALL
        SELECT 'customer_pk_unique', count(*),
               count(*) - count(DISTINCT c_custkey),
               count(*) - count(DISTINCT c_custkey) = 0
        FROM customer
    """,
    "profile_correlations": _CORR_ORACLE,
    "profile_approx_distinct": """
        SELECT col AS "column", n_exact, true AS within_bound FROM (
            SELECT 'event_id' AS col, count(DISTINCT event_id) AS n_exact FROM events
            UNION ALL
            SELECT 'user_id', count(DISTINCT user_id) FROM events
            UNION ALL
            SELECT 'event_type', count(DISTINCT event_type) FROM events
            UNION ALL
            SELECT 'props', count(DISTINCT props) FROM events
        )
    """,
    "profile_columns": _PROFILE_ORACLE_ROWS,
    "profile_numeric": (
        _NUMERIC_ORACLE.format(label="events.value", col="value", table="events")
        + " UNION ALL "
        + _NUMERIC_ORACLE.format(
            label="lineitem.l_extendedprice", col="l_extendedprice", table="lineitem"
        )
    ),
    "profile_top_values": " UNION ALL ".join(
        [
            _TOP_ORACLE.format(label="events.event_type", col="event_type", table="events"),
            _TOP_ORACLE.format(label="documents.lang", col="lang", table="documents"),
            _TOP_ORACLE.format(label="documents.source", col="source", table="documents"),
        ]
    ),
}
