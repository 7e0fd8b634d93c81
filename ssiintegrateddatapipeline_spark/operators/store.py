"""Contract queries for the versioned table format (sources/versioned.py).

The reference's credential store is a durable mutable table under a MERGE
surface (SURVEY §1.1; veramo-agent/src/config/database.config.ts:48-74).
These queries drive the commit-log format end-to-end against the events
log and prove, via DuckDB full-rebuild oracles, the three warehouse-grade
properties:

- ``store_merge_snapshot``: create + two MERGE batches folded
  incrementally (matched rows COMBINE via ``when_matched`` — running
  n_events — not just last-writer-wins) must equal the one-shot rebuild
  over the whole log. apply == rebuild, now through a durable table.
- ``store_time_travel``: a snapshot pinned at version 2 must equal the
  rebuild over the log PREFIX — i.e. history reads are reproducible and
  isolated from later commits.
- ``store_erasure_vacuum``: delete_where on the gdpr cohort
  (transform.ERASE_MOD) followed by vacuum() must leave zero cohort rows
  logically AND physically (files removed, pre-delete history pruned) —
  the audit row carries both the data-side counts (oracle-checked) and
  the engine-observed physical facts.

Build shape: the three-batch table build runs once per (session, sf_dir)
and is memoized (the sources/files.py roundtrip-staging precedent); each
query then reads its snapshot lazily. Batches are latest-per-user folds
of disjoint event_id ranges, so merging them in order is semantically the
full-log fold — which is exactly what the oracles recompute as CTEs.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.caches import register
from ssiintegrateddatapipeline_spark.operators.transform import ERASE_MOD
from ssiintegrateddatapipeline_spark.sources.batch import load_table
from ssiintegrateddatapipeline_spark.sources.versioned import (
    VersionedTable,
    VersionPrunedError,
)

# events is a seq-ordered mutation log: event_id is the global sequence.
# Batch boundaries are integer fractions of max(event_id) so the oracle
# can recompute them in SQL with identical arithmetic (// = floor, both
# engines, non-negative ids).
_CUT1_NUM, _CUT2_NUM = 4, 7  # /10 each → batches [0,40%), [40,70%), [70,100%]

_STORE_CACHE: dict[tuple, dict] = register({})


def _batch_state(ev: DataFrame) -> DataFrame:
    """Latest-per-user fold of one batch — the per-key upsert rows a MERGE
    consumes (unique per key by construction)."""
    return ev.groupBy("user_id").agg(
        F.max("event_id").alias("last_event_id"),
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.round(F.max_by("value", "event_id") * 100)
        .cast("long")
        .alias("last_value_cents"),
        F.count(F.lit(1)).alias("n_events"),
    )


# when MATCHED: the last_* columns take the source (batches arrive in seq
# order, so the source row is strictly newer), but n_events ACCUMULATES —
# the update-expression form of MERGE that last-writer-wins can't express.
_WHEN_MATCHED = {
    "user_id": "t.user_id",
    "last_event_id": "s.last_event_id",
    "last_event_type": "s.last_event_type",
    "last_value_cents": "s.last_value_cents",
    "n_events": "t.n_events + s.n_events",
}


def _built_store(spark: SparkSession, sf_dir: str) -> dict:
    """Build (once per session+sf_dir) the two tables the queries read:

    - ``main``: v1 create(batch1), v2 merge(batch2), v3 merge(batch3) —
      never vacuumed, so time travel to any version stays valid;
    - ``erasure``: v1 create(full state), v2 delete_where(gdpr cohort),
      then vacuum(retain_last=1) — records the physical facts.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _STORE_CACHE.get(key)
    if hit is not None:
        return hit

    ev = load_table(spark, sf_dir, "events")
    max_id = ev.agg(F.max("event_id")).collect()[0][0]  # bounded: 1 scalar
    cut1 = max_id * _CUT1_NUM // 10
    cut2 = max_id * _CUT2_NUM // 10

    root = tempfile.mkdtemp(prefix="ssi_store_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)

    main = VersionedTable.create(
        spark,
        f"{root}/main",
        _batch_state(ev.where(F.col("event_id") < cut1)),
        key="user_id",
        target_rows_per_file=500,  # force a multi-file layout so merge
        # pruning / rewrite actually exercises file granularity
    )
    main.merge_into(
        _batch_state(
            ev.where((F.col("event_id") >= cut1) & (F.col("event_id") < cut2))
        ),
        key="user_id",
        when_matched=_WHEN_MATCHED,
    )
    main.merge_into(
        _batch_state(ev.where(F.col("event_id") >= cut2)),
        key="user_id",
        when_matched=_WHEN_MATCHED,
    )

    erasure = VersionedTable.create(
        spark, f"{root}/erasure", _batch_state(ev), key="user_id",
        target_rows_per_file=500,
    )
    pre_versions = erasure.latest_version()
    erasure.delete_where(
        F.col("user_id") % ERASE_MOD == 0, key="user_id"
    )
    removed = erasure.vacuum(retain_last=1)
    try:
        erasure.snapshot(version=pre_versions)
        history_pruned = False
    except VersionPrunedError:
        history_pruned = True

    out = {
        "main": main,
        "erasure": erasure,
        "erasure_vacuumed": len(removed),
        "erasure_history_pruned": history_pruned,
    }
    _STORE_CACHE[key] = out
    return out


def merge_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final snapshot after create + 2 merges ≡ one-shot full-log rebuild."""
    t = _built_store(spark, sf_dir)["main"]
    return t.snapshot().withColumn(
        "table_version", F.lit(t.latest_version()).cast("int")
    )


def time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot pinned at version 2 ≡ rebuild over the log prefix."""
    t = _built_store(spark, sf_dir)["main"]
    return t.snapshot(version=2).withColumn(
        "table_version", F.lit(2).cast("int")
    )


def erasure_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-erasure audit: logical counts from the surviving snapshot
    (oracle-checked against the events log) + the engine-observed physical
    facts (files vacuumed, pre-delete history unreadable)."""
    built = _built_store(spark, sf_dir)
    snap = built["erasure"].snapshot()
    erased = F.col("user_id") % ERASE_MOD == 0
    return snap.agg(
        F.count(F.lit(1)).alias("users_live"),
        F.sum(erased.cast("long")).alias("leak_rows"),
        F.sum("n_events").alias("events_live"),
        F.max("last_event_id").alias("max_event_id"),
        F.lit(built["erasure_vacuumed"] > 0).alias("files_vacuumed"),
        F.lit(built["erasure_history_pruned"]).alias("history_pruned"),
    )


QUERIES = {
    "store_merge_snapshot": merge_snapshot,
    "store_time_travel": time_travel,
    "store_erasure_vacuum": erasure_vacuum,
}

# The oracles rebuild the store state straight from the events log —
# a hash match proves incremental-merge-through-the-durable-table ≡
# one-shot rebuild (and, for time travel, prefix-rebuild).
_REBUILD = """
    SELECT user_id,
           max(event_id)::BIGINT AS last_event_id,
           arg_max(event_type, event_id) AS last_event_type,
           CAST(round(arg_max(value, event_id) * 100) AS BIGINT)
               AS last_value_cents,
           count(*)::BIGINT AS n_events
    FROM events {where}
    GROUP BY user_id
"""

ORACLES = {
    "store_merge_snapshot": f"""
        SELECT r.*, 3::INT AS table_version
        FROM ({_REBUILD.format(where="")}) r
    """,
    "store_time_travel": f"""
        SELECT r.*, 2::INT AS table_version
        FROM ({_REBUILD.format(
            where=f"WHERE event_id < (SELECT max(event_id) * {_CUT2_NUM} // 10 FROM events)"
        )}) r
    """,
    "store_erasure_vacuum": f"""
        SELECT count(*)::BIGINT AS users_live,
               0::BIGINT AS leak_rows,
               sum(n_events)::BIGINT AS events_live,
               max(last_event_id)::BIGINT AS max_event_id,
               TRUE AS files_vacuumed,
               TRUE AS history_pruned
        FROM ({_REBUILD.format(where="")})
        WHERE user_id % {ERASE_MOD} <> 0
    """,
}
