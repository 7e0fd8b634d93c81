"""Schema-driven struct transforms: the P5/P6 normalize passes.

The reference renames the W3C-VC field ``@context`` (illegal in Avro) to
``context`` before serialization and back after
(kafka_producer/app/gather_data/process_data.py:26-32 normalize;
kafka_consumer/app/handlers/kafka_event_handler.py:72-88 denormalize).
Here the renames are *derived from the schema*: the .avsc compiler records
field aliases in StructField metadata (schemas/avsc.py), and
``rename_struct_fields`` applies them with withField+dropFields — pure
column operations, no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.functions.twophase import (
    two_phase_grouped_row_number,
)
from ssiintegrateddatapipeline_spark.sources.batch import load_table


def rename_struct_fields(col: Column, renames: dict[str, str]) -> Column:
    """Rename top-level fields of a struct column: {old: new}. Names with
    non-identifier characters (like ``@context``) are backtick-quoted for
    the field-name parser. NB: withField appends, so renamed fields move to
    the end; use ``rename_fields`` on a DataFrame to preserve field order."""
    for old, new in renames.items():
        col = col.withField(f"`{new}`", col.getField(old)).dropFields(f"`{old}`")
    return col


def rename_fields(df: DataFrame, col_name: str, renames: dict[str, str]) -> DataFrame:
    """Order-preserving struct-field rename: rebuilds the struct in declared
    order with renamed aliases (so P5 then P6 is a true identity)."""
    fields = df.schema[col_name].dataType.fields
    rebuilt = F.struct(
        *[
            F.col(col_name).getField(f.name).alias(renames.get(f.name, f.name))
            for f in fields
        ]
    )
    return df.withColumn(col_name, rebuilt)


def normalize_credential(df: DataFrame, cred_col: str = "credential") -> DataFrame:
    """P5: ``@context`` -> ``context`` (pre-serialization direction)."""
    return rename_fields(df, cred_col, {"@context": "context"})


def denormalize_credential(df: DataFrame, cred_col: str = "credential") -> DataFrame:
    """P6: ``context`` -> ``@context`` (pre-verification direction)."""
    return rename_fields(df, cred_col, {"context": "@context"})


def _credential_struct() -> Column:
    """A VC-shaped struct with the JSON-LD ``@context`` field, built from
    document columns (mirrors the credential envelope of
    veramo_authorisation_credential.ts:161-180 in the reference)."""
    return F.struct(
        F.array(
            F.lit("https://www.w3.org/2018/credentials/v1"),
            F.concat(F.lit("https://example.org/ctx/"), F.col("lang")),
        ).alias("@context"),
        F.concat(F.lit("vc:doc:"), F.col("doc_id").cast("string")).alias("id"),
        F.array(F.lit("VerifiableCredential")).alias("type"),
    )


def normalize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 then P6 must be the identity; the flattened output doubles as the
    oracle check that the rename itself is correct."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", _credential_struct().alias("credential")
    )
    normalized = normalize_credential(d)
    # serialize-side view: field is now 'context'
    wire_view = normalized.select(
        "doc_id",
        F.col("credential.context").alias("context"),
        F.col("credential.id").alias("cred_id"),
    )
    restored = denormalize_credential(normalized)
    back = restored.select(
        "doc_id", F.col("credential.`@context`").alias("context_restored")
    )
    return (
        wire_view.join(back, "doc_id")
        .select(
            "doc_id",
            F.element_at("context", 2).alias("lang_ctx"),
            "cred_id",
            (F.col("context") == F.col("context_restored")).alias("roundtrip_ok"),
        )
    )


ZORDER_BITS = 8  # per-dimension key width (testdata spans ~8 bits per dim)
ZBUCKET_SHIFT = 10  # bucket = top 6 bits of the 16-bit z-value: an 8x8 grid


def zorder_value(x: Column, y: Column) -> Column:
    """Interleave the low 16 bits of two dimension keys into a 32-bit
    Morton (z-order) value — pure JVM bit expressions, unrolled at plan
    time, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(ZORDER_BITS):
        z = z.bitwiseOR(F.shiftleft(x.bitwiseAND(F.lit(1 << i)), i)).bitwiseOR(
            F.shiftleft(y.bitwiseAND(F.lit(1 << i)), i + 1)
        )
    return z


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional data layout: a Morton z-order key over
    (user_id, hour) and the locality profile of its top-level buckets —
    each z-bucket's min/max per dimension stays a small rectangle, which is
    exactly why sorting 100 TB by this key lets parquet row-group min/max
    stats skip files for BOTH `user_id` range filters and time-range
    filters (a single-column sort can only serve one of the two).

    On a cluster the write path is `repartitionByRange(zkey).
    sortWithinPartitions(zkey)`; here the oracle-checked part is the key
    computation and the bucket-locality contract itself.
    """
    ev = load_table(spark, sf_dir, "events")
    x = F.pmod(F.col("user_id"), F.lit(1 << ZORDER_BITS)).cast("long")
    y = F.pmod(F.expr("unix_micros(ts) div 3600000000"), F.lit(1 << ZORDER_BITS)).cast(
        "long"
    )
    keyed = ev.select(x.alias("x"), y.alias("y")).withColumn(
        "z", zorder_value(F.col("x"), F.col("y"))
    )
    return (
        keyed.groupBy(F.shiftright(F.col("z"), ZBUCKET_SHIFT).alias("zbucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )


PSEUDO_SALT = "ssi-pipeline-v1"  # rotate per dataset release


def pseudonymize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-preserving pseudonymization: user_id replaced by a salted
    SHA-256 surrogate — deterministic (referential integrity survives across
    tables and pipeline runs with the same salt) yet not reversible without
    the salt. Per-row JVM hash, zero shuffle; the groupBy proves the
    surrogate key aggregates exactly like the raw key did.
    """
    ev = load_table(spark, sf_dir, "events")
    token = F.sha2(F.concat(F.lit(PSEUDO_SALT), F.col("user_id").cast("string")), 256)
    return (
        ev.select(token.alias("user_token"), "value")
        .groupBy("user_token")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
    )


PACK_CAPACITY = 512  # tokens per packed training sequence
PACK_GROUPS = 8  # parallel packing streams (cluster: ~numPartitions)


def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training: assign documents to fixed
    token-budget bins (context windows) with a greedy first-fit-in-order
    pass, so short documents share a sequence instead of wasting pad
    tokens. Packing is inherently sequential, so the corpus is split into
    PACK_GROUPS deterministic hash groups (doc_id mod G) and each group
    packs independently inside one `applyInPandas` call — groups are the
    parallelism unit, the per-group loop is a tight pandas pass over
    integers. At 100 TB, G is set to ~the cluster's core count and each
    group streams one Arrow batch; bin identity is (group_id, bin_id).

    A doc longer than the capacity gets its own (overflowing) bin —
    truncation is the tokenizer's job downstream, losing the doc is worse.
    """
    from ssiintegrateddatapipeline_spark.operators.text import BPE_ISH_PATTERN

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        (F.col("doc_id") % PACK_GROUPS).alias("group_id"),
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), F.lit(0))).alias(
            "n_tokens"
        ),
    )
    return pack_into_bins(base, PACK_CAPACITY)


BATCH_TOKEN_BUDGET = 2048  # target tokens per training micro-batch


def length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-grouped batch assignment (the dynamic-batching / bucketed
    minibatch shape): within each source, sort documents by token length
    and cut the sorted run into contiguous batches of ~BATCH_TOKEN_BUDGET
    tokens, then report each batch's padding economics — a batch is padded
    to its longest member, so grouping similar lengths minimizes
    `max_len * n_docs - sum_len` waste. Complements sequence_pack (which
    concatenates docs into one window; this keeps one doc per row and
    batches rows).

    Scale shape: the sort is per-source (window partition key), not
    global — at 100 TB the sources shard the sort and each partition
    sorts locally after one hash shuffle. All outputs are integer-exact.
    """
    from ssiintegrateddatapipeline_spark.operators.text import BPE_ISH_PATTERN
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "source",
        "doc_id",
        F.size(
            F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), F.lit(0))
        ).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("n_tokens", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = base.select(
        "source",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens"))
            / F.lit(BATCH_TOKEN_BUDGET)
        ).alias("batch_id"),
    )
    return assigned.groupBy("source", "batch_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("batch_tokens"),
        F.max("n_tokens").alias("max_len"),
        (F.max("n_tokens") * F.count("*") - F.sum("n_tokens")).alias(
            "pad_waste"
        ),
    )


def pack_into_bins(base: DataFrame, capacity: int) -> DataFrame:
    """Greedy first-fit-in-order packing of (group_id, doc_id, n_tokens)
    rows into token-budget bins, one sequential pandas pass per group."""
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins: list[int] = []
        cur_bin, cur_fill = 0, 0
        for n in pdf["n_tokens"]:
            if cur_fill > 0 and cur_fill + n > capacity:
                cur_bin, cur_fill = cur_bin + 1, 0
            bins.append(cur_bin)
            cur_fill += n
        pdf["bin_id"] = bins
        return pdf[["group_id", "doc_id", "n_tokens", "bin_id"]]

    return base.groupBy("group_id").applyInPandas(
        pack, "group_id long, doc_id long, n_tokens int, bin_id int"
    )


# ---------------------------------------------------------------------------
# Snapshot diff (table-diff / audit shape): classify rows as added / removed /
# changed / unchanged between two snapshots of a table. The two snapshots are
# derived deterministically from `orders` by hash gates (~1/16 of keys absent
# from the old snapshot = "added", ~1/16 absent from the new = "removed",
# ~1/4 with a price bump = "changed"), so the diff itself — one full-outer
# join on the key plus a classification projection — is what's exercised.
# Scale: a single co-partitioned shuffle join on the snapshot key; at 100 TB
# both sides bucket by key and the join is zipper-local; the output audit
# aggregate is 4 rows.
# ---------------------------------------------------------------------------

def _snapshot_gate(key, salt: str):
    return F.substring(
        F.md5(F.concat_ws("|", key.cast("string"), F.lit(salt))), 1, 1
    )


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The whole diff runs in exact integer CENTS: prices carry exactly 2
    # decimals, so round(p*100) is an exact int64, the simulated 10% price
    # bump is pure integer math ((c*11+5) div 10 — explicit half-up), and
    # the class totals are order-independent exact sums. Float forms of
    # any of these diverge between engines: round(p*1.1, 2) differs on
    # decimal half-ties (Spark rounds the shortest decimal string HALF_UP,
    # DuckDB rounds the binary double), and a raw double sum of ~1e8
    # wobbles at the 2nd decimal with addition order.
    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    old = orders.where(_snapshot_gate(key, "snapadd") != "0").select(
        "o_orderkey", cents.alias("old_cents")
    )
    new = orders.where(_snapshot_gate(key, "snapdel") != "0").select(
        "o_orderkey",
        F.when(
            _snapshot_gate(key, "snapmod") < "4",
            F.expr(
                "CAST((CAST(round(o_totalprice * 100) AS BIGINT) * 11 + 5) div 10 AS BIGINT)"
            ),
        )
        .otherwise(cents)
        .alias("new_cents"),
    )
    joined = old.join(new, "o_orderkey", "full_outer")
    diff_class = (
        F.when(F.col("old_cents").isNull(), "added")
        .when(F.col("new_cents").isNull(), "removed")
        .when(F.col("old_cents") != F.col("new_cents"), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.withColumn("diff_class", diff_class)
        .groupBy("diff_class")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(
                F.sum(F.coalesce("new_cents", "old_cents")) / 100.0, 2
            ).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Provenance / lineage tagging: a per-record hash chain (ingest hash → stage
# hash) so any row in a 100 TB training set can be traced to its source
# record and transform version. Pure sha256 column expressions — narrow, no
# shuffle, whole-stage codegen; the chain extends one sha2 per stage.
# ---------------------------------------------------------------------------

PROVENANCE_STAGE = "envelope-v1"


def provenance_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 25)
    ingest = F.sha2(
        F.concat_ws(
            "|",
            F.col("event_id").cast("string"),
            F.unix_micros("ts").cast("string"),
            F.col("user_id").cast("string"),
        ),
        256,
    )
    stage = F.sha2(F.concat_ws("|", ingest, F.lit(PROVENANCE_STAGE)), 256)
    return ev.select(
        "event_id",
        "user_id",
        ingest.alias("ingest_hash"),
        stage.alias("stage_hash"),
    )


SHUFFLE_SEED = "epoch-0"
SHUFFLE_SHARDS = 8


def training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic shuffle + shard assignment for a training run:
    every document gets a pseudo-random sort key (md5 of id + epoch seed),
    a global position, a shard id, and a within-shard position — the
    dataloader-order step between curation and tokenization. Changing the
    seed string reshuffles the epoch; the same seed replays the exact
    order on any cluster size (no RNG, no partition dependence).

    Scale shape: BOTH positions are two-phase ranked off ONE shuffle (see
    ``functions/twophase.two_phase_grouped_row_number``) — rows
    range-bucket on the first two hex chars of the shuffle key (a prefix
    of the sort key, so bucket order == sort order), rank inside each of
    the 256 buckets in parallel, and add plan-time offsets: per-bucket for
    the global position, per-(shard, bucket) for the within-shard
    position. ``hash(bucket)`` already co-locates every (bucket, shard)
    pair, so the shard window reuses the bucket exchange — no
    ``Exchange SinglePartition`` anywhere and no second full shuffle (the
    old ``Window.partitionBy(shard)`` re-shuffled the whole table).
    """
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|" + SHUFFLE_SEED)))
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % SHUFFLE_SHARDS
    ).cast("int")
    base = d.select("doc_id", key.alias("shuffle_key"), shard.alias("shard"))
    # md5 hex is lowercase [0-9a-f]: numeric value of the first two chars
    # orders identically to the string prefix, so this bucket expression
    # is monotone along the (shuffle_key, doc_id) total order.
    bucket = F.conv(F.substring("shuffle_key", 1, 2), 16, 10).cast("int")
    ranked, _ = two_phase_grouped_row_number(
        base,
        bucket,
        F.col("shard"),
        [F.col("shuffle_key"), F.col("doc_id")],
        out="global_pos",
        group_out="shard_pos",
    )
    return ranked.select("doc_id", "shard", "global_pos", "shard_pos")


ZONE_ORDERS = 256  # orders per simulated file (zone) under ingest order
PRUNE_LO = "1997-01-01"  # the probe predicate: one quarter of shipdates
PRUNE_HI = "1997-04-01"  # half-open [lo, hi)


def zonemap_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (file min/max) pruning effectiveness under two physical
    layouts — the data-skipping design tool behind every 100 TB sort-order
    decision. Parquet scans skip whole files/row-groups whose column
    min/max cannot satisfy a pushed predicate; how much that saves is
    purely a property of the LAYOUT. This operator simulates both ends:

    - ``insert_order``: files hold consecutive order keys (the natural
      ingest layout) — ship dates scatter across every file, so a date
      band overlaps nearly all zones and skipping buys nothing;
    - ``shipdate_sorted``: files hold consecutive ship-date ranges (the
      layout a ``repartitionByRange(shipdate)`` write produces, here one
      zone per calendar month) — the same band touches only the zones it
      intersects.

    One scan feeds both layouts (each row contributes a (layout, zone)
    pair via an exploded 2-element array), then two nested map-side-
    combined hash aggs: per-zone min/max/counts, then the per-layout
    census of zones/rows a zone-map-aware scan would read vs. the rows
    the predicate actually matches. Everything is exact integers; the
    scan fraction is one deterministic division, rounded in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    month_zone = (F.year("l_shipdate") * 12 + F.month("l_shipdate")).cast("long")
    pair = F.explode(
        F.array(
            F.struct(
                F.lit("insert_order").alias("layout"),
                (F.col("l_orderkey") / ZONE_ORDERS)
                .cast("long")
                .alias("zone"),
            ),
            F.struct(F.lit("shipdate_sorted").alias("layout"), month_zone.alias("zone")),
        )
    )
    lo = F.lit(PRUNE_LO).cast("timestamp")
    hi = F.lit(PRUNE_HI).cast("timestamp")
    rows = li.select(
        "l_shipdate",
        ((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .cast("long")
        .alias("hit"),
        pair.alias("lz"),
    )
    zones = rows.groupBy("lz").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("hit").alias("n_match"),
        F.min("l_shipdate").alias("zmin"),
        F.max("l_shipdate").alias("zmax"),
    )
    scanned = (F.col("zmin") < hi) & (F.col("zmax") >= lo)
    return (
        zones.groupBy(F.col("lz.layout").alias("layout"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("zones_total"),
            F.sum(scanned.cast("long")).cast("long").alias("zones_scanned"),
            F.sum("n_rows").cast("long").alias("rows_total"),
            F.sum(F.when(scanned, F.col("n_rows")).otherwise(F.lit(0)))
            .cast("long")
            .alias("rows_scanned"),
            F.sum("n_match").cast("long").alias("rows_matched"),
        )
        .select(
            "layout",
            "zones_total",
            "zones_scanned",
            "rows_total",
            "rows_scanned",
            "rows_matched",
            F.round(
                100.0
                * F.col("rows_scanned").cast("double")
                / F.col("rows_total").cast("double"),
                6,
            ).alias("scan_pct"),
        )
    )


COMPACT_ROW_BYTES = 100  # manifest row-width proxy for the zone files
COMPACT_TARGET_BYTES = 4 * 1024 * 1024  # compaction bin target (4 MiB here;
# 128 MiB-1 GiB on a real cluster — only the constant changes)


def compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan — the OPTIMIZE/rewriteDataFiles shape:
    given the table's file census (the zone-map zones standing in for the
    manifest), assign files to target-sized compaction bins by running
    byte sum in key order, and emit the per-bin work summary a compaction
    job would execute. Key-ordered next-fit is what keeps the rewritten
    files CLUSTERED (each bin spans a contiguous key range, preserving
    zone-map effectiveness — see ``zonemap_pruning``), unlike
    first-fit-decreasing, which shreds the clustering for a marginally
    tighter pack.

    The running sum is the engine's two-phase prefix sum (quantile range
    buckets + per-bucket offsets as plan-time literals) — no
    single-partition window over what is, at warehouse scale, a manifest
    of millions of files. Everything is exact integers.
    """
    from ssiintegrateddatapipeline_spark.functions.twophase import (
        quantile_buckets,
        two_phase_prefix_sum,
    )

    li = load_table(spark, sf_dir, "lineitem")
    files = li.groupBy(
        (F.col("l_orderkey") / ZONE_ORDERS).cast("long").alias("zone")
    ).agg((F.count(F.lit(1)) * COMPACT_ROW_BYTES).alias("bytes"))
    bucket = quantile_buckets(files, F.col("zone"))
    cum = two_phase_prefix_sum(
        files, bucket, [F.col("zone")], F.col("bytes"), out="cum_bytes"
    )
    # exclusive prefix -> next-fit bin id: a file opens a new bin iff the
    # bytes before it already filled the current target multiple
    binned = cum.withColumn(
        "bin_id",
        F.floor(
            (F.col("cum_bytes") - F.col("bytes")) / F.lit(COMPACT_TARGET_BYTES)
        ).cast("long"),
    )
    return binned.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("bytes").cast("long").alias("total_bytes"),
        F.min("zone").cast("long").alias("min_zone"),
        F.max("zone").cast("long").alias("max_zone"),
    )


# ---------------------------------------------------------------------------
# GDPR right-to-erasure audit. The compliance operation every warehouse
# needs: given a deterministic erasure cohort (user_id % ERASE_MOD == 0 —
# the request list), remove the cohort from the raw facts AND every derived
# surface, and PROVE it: per surface, rows before/erased/after, a leak
# count over the post-erasure output (must be 0), and the commutation check
# erase-then-derive ≡ derive-then-erase (exact for user-keyed derivations —
# the property that makes retroactive erasure sound without rebuilding the
# mart). The pseudonymized surface erases through the salted-surrogate
# mapping (semi-join on the cohort's tokens), demonstrating that
# pseudonymization does not block erasure when the mapping is derivable.
# Scale shape: the erasure predicate is a pure row filter (pushes into the
# scan); the audits are single hash aggregates; nothing new shuffles.
# ---------------------------------------------------------------------------

ERASE_MOD = 97


def gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-surface erasure audit: raw events, the (user, day) activity
    mart, and the pseudonymized token mart."""
    ev = load_table(spark, sf_dir, "events")
    erased = F.col("user_id") % ERASE_MOD == 0
    kept = ev.where(~erased)

    raw = ev.agg(
        F.lit("events_raw").alias("surface"),
        F.count(F.lit(1)).alias("rows_before"),
        F.sum(erased.cast("long")).alias("rows_erased"),
        F.sum((~erased).cast("long")).alias("rows_after"),
        F.count_distinct(F.when(erased, F.col("user_id"))).alias(
            "erased_users"
        ),
        F.lit(0).cast("long").alias("leak_rows"),
        F.lit(True).alias("after_equals_recompute"),
    )

    mart_before = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    mart_recomputed = kept.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    m_b = mart_before.agg(
        F.count(F.lit(1)).alias("rows_before"),
        F.sum((F.col("user_id") % ERASE_MOD == 0).cast("long")).alias(
            "rows_erased"
        ),
        F.count_distinct(
            F.when(F.col("user_id") % ERASE_MOD == 0, F.col("user_id"))
        ).alias("erased_users"),
    )
    m_r = mart_recomputed.agg(
        F.count(F.lit(1)).alias("rows_recomputed"),
        F.sum((F.col("user_id") % ERASE_MOD == 0).cast("long")).alias(
            "leak_rows"
        ),
    )
    mart = m_b.crossJoin(F.broadcast(m_r)).select(
        F.lit("daily_activity_mart").alias("surface"),
        "rows_before",
        "rows_erased",
        (F.col("rows_before") - F.col("rows_erased")).alias("rows_after"),
        "erased_users",
        "leak_rows",
        (
            F.col("rows_before") - F.col("rows_erased")
            == F.col("rows_recomputed")
        ).alias("after_equals_recompute"),
    )

    token = F.sha2(
        F.concat(F.lit(PSEUDO_SALT), F.col("user_id").cast("string")), 256
    )
    tokens_all = ev.select(
        token.alias("user_token"), erased.alias("is_erased")
    )
    tok_mart = tokens_all.groupBy("user_token").agg(
        F.max("is_erased").alias("is_erased")
    )
    # erase through the surrogate mapping: the cohort's tokens, re-derived
    erased_tokens = ev.where(erased).select(token.alias("user_token")).distinct()
    tok_after = tok_mart.join(erased_tokens, "user_token", "left_anti")
    t_b = tok_mart.agg(
        F.count(F.lit(1)).alias("rows_before"),
        F.sum(F.col("is_erased").cast("long")).alias("rows_erased"),
    )
    t_a = tok_after.agg(
        F.count(F.lit(1)).alias("rows_after_actual"),
        F.sum(F.col("is_erased").cast("long")).alias("leak_rows"),
    )
    tok = t_b.crossJoin(F.broadcast(t_a)).select(
        F.lit("pseudonymized_mart").alias("surface"),
        "rows_before",
        "rows_erased",
        F.col("rows_after_actual").alias("rows_after"),
        F.col("rows_erased").alias("erased_users"),
        "leak_rows",
        (
            F.col("rows_before") - F.col("rows_erased")
            == F.col("rows_after_actual")
        ).alias("after_equals_recompute"),
    )
    return raw.unionByName(mart).unionByName(tok)


_GDPR_ORACLE = f"""
    WITH raw AS (
        SELECT 'events_raw' AS surface,
               count(*)::BIGINT AS rows_before,
               sum(CASE WHEN user_id % {ERASE_MOD} = 0 THEN 1 ELSE 0 END)
                   ::BIGINT AS rows_erased,
               sum(CASE WHEN user_id % {ERASE_MOD} = 0 THEN 0 ELSE 1 END)
                   ::BIGINT AS rows_after,
               count(DISTINCT CASE WHEN user_id % {ERASE_MOD} = 0
                                   THEN user_id END)::BIGINT AS erased_users,
               0::BIGINT AS leak_rows,
               TRUE AS after_equals_recompute
        FROM events
    ),
    mart_b AS (
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    mart AS (
        SELECT 'daily_activity_mart' AS surface,
               count(*)::BIGINT AS rows_before,
               sum(CASE WHEN user_id % {ERASE_MOD} = 0 THEN 1 ELSE 0 END)
                   ::BIGINT AS rows_erased,
               sum(CASE WHEN user_id % {ERASE_MOD} = 0 THEN 0 ELSE 1 END)
                   ::BIGINT AS rows_after,
               count(DISTINCT CASE WHEN user_id % {ERASE_MOD} = 0
                                   THEN user_id END)::BIGINT AS erased_users,
               0::BIGINT AS leak_rows,
               TRUE AS after_equals_recompute
        FROM mart_b
    ),
    tok AS (
        SELECT 'pseudonymized_mart' AS surface,
               count(DISTINCT user_id)::BIGINT AS rows_before,
               count(DISTINCT CASE WHEN user_id % {ERASE_MOD} = 0
                                   THEN user_id END)::BIGINT AS rows_erased,
               count(DISTINCT CASE WHEN user_id % {ERASE_MOD} = 0
                                   THEN NULL ELSE user_id END)::BIGINT
                   AS rows_after,
               count(DISTINCT CASE WHEN user_id % {ERASE_MOD} = 0
                                   THEN user_id END)::BIGINT AS erased_users,
               0::BIGINT AS leak_rows,
               TRUE AS after_equals_recompute
        FROM events
    )
    SELECT * FROM raw UNION ALL SELECT * FROM mart UNION ALL SELECT * FROM tok
"""


# ---------------------------------------------------------------------------
# T5-style span corruption audit (Raffel et al., JMLR 2020 §3.1.4): the
# denoising-objective preprocessing that masks ~15% of tokens and
# collapses each contiguous masked run into one sentinel, producing the
# (corrupted input, target) length pair the trainer packs. Masking is
# hash-gated per (doc, position) — deterministic, partition-independent,
# no RNG — and the whole computation is ONE pure-Catalyst projection over
# the token array (transform/filter/aggregate on the index sequence; no
# explode, no shuffle, no UDF): a span starts where a masked position
# follows an unmasked one, so n_spans = Σ_i mask_i·(1−mask_{i−1}).
# ---------------------------------------------------------------------------

SPAN_MASK_PCT = 15  # corruption rate, percent of token positions


def span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ssiintegrateddatapipeline_spark.functions.text_funcs import (
        md5_int32,
        tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - 1)

    def masked(i):
        return (
            F.pmod(
                md5_int32(
                    F.concat_ws(
                        "|", F.col("doc_id").cast("string"), i.cast("string"),
                        F.lit("mask"),
                    )
                ),
                F.lit(100),
            )
            < SPAN_MASK_PCT
        )

    n_masked = F.size(F.filter(idx, lambda i: masked(i)))
    starts = F.aggregate(
        idx,
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            masked(i) & ((i == 0) | ~masked(i - 1)), F.lit(1).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    return d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        n_masked.cast("long").alias("n_masked"),
        starts.alias("n_spans"),
        F.round(n_masked / n, 6).alias("mask_rate"),
        # corrupted input keeps unmasked tokens + one sentinel per span;
        # the target emits each span's sentinel + its masked tokens
        (n.cast("long") - n_masked + starts).alias("input_len"),
        (n_masked + starts).alias("target_len"),
    )


_SPAN_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    m AS (
        SELECT doc_id, len(toks) AS n,
               list_transform(generate_series(0, len(toks) - 1),
                   i -> ('0x' || substr(md5(doc_id || '|' || i || '|mask'),
                        1, 8))::UBIGINT % 100 < {SPAN_MASK_PCT}) AS mask
        FROM t
    ),
    stats AS (
        SELECT doc_id, n,
               len(list_filter(mask, x -> x))::BIGINT AS n_masked,
               list_sum(list_transform(generate_series(1, n),
                   j -> CASE WHEN mask[j]
                             AND (j = 1 OR NOT mask[j - 1])
                        THEN 1 ELSE 0 END))::BIGINT AS n_spans
        FROM m
    )
    SELECT doc_id, n::BIGINT AS n_tokens, n_masked, n_spans,
           round(n_masked / CAST(n AS DOUBLE), 6) AS mask_rate,
           (n - n_masked + n_spans)::BIGINT AS input_len,
           (n_masked + n_spans)::BIGINT AS target_len
    FROM stats
"""


QUERIES = {
    "transform_span_corruption": span_corruption,
    "transform_gdpr_erasure": gdpr_erasure,
    "transform_training_shuffle": training_shuffle,
    "transform_normalize_roundtrip": normalize_roundtrip,
    "transform_snapshot_diff": snapshot_diff,
    "transform_provenance": provenance_tags,
    "transform_zorder_layout": zorder_layout,
    "transform_pseudonymize": pseudonymize_users,
    "transform_sequence_pack": sequence_pack,
    "transform_length_batches": length_batches,
    "transform_zonemap_pruning": zonemap_pruning,
    "transform_compaction_plan": compaction_planner,
}

_Z_SQL = " | ".join(
    f"((x & {1 << i}) << {i}) | ((y & {1 << i}) << {i + 1})"
    for i in range(ZORDER_BITS)
)

# DuckDB spelling of text.BPE_ISH_PATTERN token counting
_BPE_N_SQL = r"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))"

ORACLES = {
    "transform_span_corruption": _SPAN_ORACLE,
    "transform_gdpr_erasure": _GDPR_ORACLE,
    "transform_training_shuffle": f"""
        WITH base AS (
            SELECT doc_id,
                   md5(doc_id::VARCHAR || '|{SHUFFLE_SEED}') AS shuffle_key,
                   (('0x' || substr(md5(doc_id::VARCHAR || '|{SHUFFLE_SEED}'),
                     1, 8))::UBIGINT::BIGINT % {SHUFFLE_SHARDS})::INT AS shard
            FROM documents
        )
        SELECT doc_id, shard,
               row_number() OVER (ORDER BY shuffle_key, doc_id) AS global_pos,
               row_number() OVER (PARTITION BY shard
                                  ORDER BY shuffle_key, doc_id) AS shard_pos
        FROM base
    """,
    "transform_length_batches": f"""
        WITH base AS (
            SELECT source, doc_id, {_BPE_N_SQL} AS n_tokens FROM documents
        ),
        assigned AS (
            SELECT source, n_tokens,
                   ((sum(n_tokens) OVER (PARTITION BY source
                         ORDER BY n_tokens, doc_id
                         ROWS UNBOUNDED PRECEDING) - n_tokens)
                       // {BATCH_TOKEN_BUDGET})::BIGINT AS batch_id
            FROM base
        )
        SELECT source, batch_id, count(*) AS n_docs,
               sum(n_tokens)::BIGINT AS batch_tokens,
               max(n_tokens) AS max_len,
               (max(n_tokens) * count(*) - sum(n_tokens))::BIGINT AS pad_waste
        FROM assigned GROUP BY 1, 2
    """,
    "transform_snapshot_diff": """
        WITH old AS (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS old_cents
            FROM orders
            WHERE substr(md5(o_orderkey::VARCHAR || '|snapadd'), 1, 1) <> '0'
        ),
        new AS (
            SELECT o_orderkey,
                   CASE WHEN substr(md5(o_orderkey::VARCHAR || '|snapmod'), 1, 1) < '4'
                        THEN (CAST(round(o_totalprice * 100) AS BIGINT) * 11 + 5) // 10
                        ELSE CAST(round(o_totalprice * 100) AS BIGINT)
                   END AS new_cents
            FROM orders
            WHERE substr(md5(o_orderkey::VARCHAR || '|snapdel'), 1, 1) <> '0'
        )
        SELECT CASE WHEN old_cents IS NULL THEN 'added'
                    WHEN new_cents IS NULL THEN 'removed'
                    WHEN old_cents <> new_cents THEN 'changed'
                    ELSE 'unchanged' END AS diff_class,
               count(*) AS n_rows,
               round(sum(coalesce(new_cents, old_cents)) / 100.0, 2)
                   AS total_price
        FROM old FULL OUTER JOIN new USING (o_orderkey)
        GROUP BY 1
    """,
    "transform_provenance": f"""
        SELECT event_id, user_id,
               sha256(event_id::VARCHAR || '|' || epoch_us(ts)::VARCHAR
                      || '|' || user_id::VARCHAR) AS ingest_hash,
               sha256(sha256(event_id::VARCHAR || '|' || epoch_us(ts)::VARCHAR
                             || '|' || user_id::VARCHAR)
                      || '|{PROVENANCE_STAGE}') AS stage_hash
        FROM events
        WHERE user_id < 25
    """,
    "transform_sequence_pack": f"""
        WITH RECURSIVE base AS (
            SELECT doc_id % {PACK_GROUPS} AS group_id, doc_id,
                   {_BPE_N_SQL} AS n_tokens,
                   row_number() OVER (
                       PARTITION BY doc_id % {PACK_GROUPS} ORDER BY doc_id
                   ) AS rn
            FROM documents
        ),
        pack AS (
            SELECT group_id, doc_id, n_tokens, rn,
                   0 AS bin_id, n_tokens AS fill
            FROM base WHERE rn = 1
            UNION ALL
            SELECT b.group_id, b.doc_id, b.n_tokens, b.rn,
                   CASE WHEN p.fill > 0 AND p.fill + b.n_tokens > {PACK_CAPACITY}
                        THEN p.bin_id + 1 ELSE p.bin_id END,
                   CASE WHEN p.fill > 0 AND p.fill + b.n_tokens > {PACK_CAPACITY}
                        THEN b.n_tokens ELSE p.fill + b.n_tokens END
            FROM base b JOIN pack p
              ON b.group_id = p.group_id AND b.rn = p.rn + 1
        )
        SELECT group_id, doc_id, n_tokens, bin_id FROM pack
    """,
    "transform_pseudonymize": f"""
        SELECT sha256('{PSEUDO_SALT}' || user_id::VARCHAR) AS user_token,
               count(*) AS n_events,
               round(sum(value), 4) AS total_value
        FROM events GROUP BY 1
    """,
    "transform_zorder_layout": f"""
        WITH keyed AS (
            SELECT x, y, {_Z_SQL} AS z FROM (
                SELECT (user_id % {1 << ZORDER_BITS})::BIGINT AS x,
                       ((epoch_us(ts) // 3600000000) % {1 << ZORDER_BITS})::BIGINT AS y
                FROM events
            )
        )
        SELECT z >> {ZBUCKET_SHIFT} AS zbucket,
               count(*) AS n_rows,
               min(x) AS x_min, max(x) AS x_max,
               min(y) AS y_min, max(y) AS y_max
        FROM keyed GROUP BY 1
    """,
    "transform_normalize_roundtrip": """
        SELECT doc_id,
               'https://example.org/ctx/' || lang AS lang_ctx,
               'vc:doc:' || doc_id::VARCHAR AS cred_id,
               true AS roundtrip_ok
        FROM documents
    """,
    "transform_compaction_plan": f"""
        WITH files AS (
            SELECT (l_orderkey // {ZONE_ORDERS})::BIGINT AS zone,
                   count(*) * {COMPACT_ROW_BYTES} AS bytes
            FROM lineitem GROUP BY 1
        ), cum AS (
            SELECT zone, bytes,
                   sum(bytes) OVER (ORDER BY zone
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_bytes
            FROM files
        )
        SELECT CAST((cum_bytes - bytes) // {COMPACT_TARGET_BYTES} AS BIGINT)
                   AS bin_id,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(bytes) AS BIGINT) AS total_bytes,
               CAST(min(zone) AS BIGINT) AS min_zone,
               CAST(max(zone) AS BIGINT) AS max_zone
        FROM cum GROUP BY 1
    """,
    "transform_zonemap_pruning": f"""
        WITH pairs AS (
            SELECT layout, zone, l_shipdate,
                   CASE WHEN l_shipdate >= TIMESTAMP '{PRUNE_LO}'
                         AND l_shipdate <  TIMESTAMP '{PRUNE_HI}'
                        THEN 1 ELSE 0 END AS hit
            FROM (
                SELECT l_shipdate,
                       'insert_order' AS layout,
                       (l_orderkey // {ZONE_ORDERS})::BIGINT AS zone
                FROM lineitem
                UNION ALL
                SELECT l_shipdate,
                       'shipdate_sorted' AS layout,
                       (year(l_shipdate) * 12 + month(l_shipdate))::BIGINT
                           AS zone
                FROM lineitem
            )
        ), zones AS (
            SELECT layout, zone,
                   count(*) AS n_rows, sum(hit) AS n_match,
                   min(l_shipdate) AS zmin, max(l_shipdate) AS zmax
            FROM pairs GROUP BY layout, zone
        )
        SELECT layout,
               CAST(count(*) AS BIGINT) AS zones_total,
               CAST(sum(CASE WHEN zmin < TIMESTAMP '{PRUNE_HI}'
                              AND zmax >= TIMESTAMP '{PRUNE_LO}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS zones_scanned,
               CAST(sum(n_rows) AS BIGINT) AS rows_total,
               CAST(sum(CASE WHEN zmin < TIMESTAMP '{PRUNE_HI}'
                              AND zmax >= TIMESTAMP '{PRUNE_LO}'
                             THEN n_rows ELSE 0 END) AS BIGINT)
                   AS rows_scanned,
               CAST(sum(n_match) AS BIGINT) AS rows_matched,
               round(100.0 * CAST(sum(CASE WHEN zmin < TIMESTAMP '{PRUNE_HI}'
                                            AND zmax >= TIMESTAMP '{PRUNE_LO}'
                                           THEN n_rows ELSE 0 END) AS DOUBLE)
                     / CAST(sum(n_rows) AS DOUBLE), 6) AS scan_pct
        FROM zones GROUP BY layout
    """,
}
