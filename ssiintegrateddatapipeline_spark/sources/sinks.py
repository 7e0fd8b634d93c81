"""Sinks (SURVEY §2.9 K1-K5), re-expressed for a columnar lake layout.

The reference's sinks are Kafka (Avro value + string key), a WebSocket
fan-out, structured logs, Prometheus /metrics, and a Postgres credential
store. The engine-side equivalents:

- ``write_partitioned``: the primary events sink — parquet partitioned by
  low-cardinality keys (symbol, date). At 100 TB this is the layout that
  makes everything else work: partition pruning on symbol/date predicates,
  bounded file sizes via maxRecordsPerFile, no tiny-file explosion (the
  repartition on the partition keys maps each output partition to one
  writer task);
- ``kafka_wire_frame``: the (key, value) projection a
  ``writeStream.format("kafka")`` sink consumes (value = Avro wire bytes
  from operators/wire.py, key = symbol so Kafka partitions by symbol —
  deliberately diverging from the reference's constant key, which serialized
  everything through one partition: kafka_producer/app/utils/settings.py:14);
- ``foreach_batch_metrics_sink``: streaming metrics into an append-only
  parquet "metrics" table — the engine's Prometheus equivalent (K4): each
  micro-batch appends windowed aggregate rows stamped with the batch id;
- ``credential_store_merge``: K5 upsert semantics (latest VC per did) as a
  union + window dedup — the MERGE pattern without requiring Delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ssiintegrateddatapipeline_spark.sources.batch import local_frame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("symbol",),
    max_records_per_file: int = 1_000_000,
) -> None:
    """Primary lake sink: one writer task per output partition, bounded
    file sizes, partition directories prunable by downstream predicates."""
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 32,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table sink: pay the shuffle ONCE at write time.

    Every later equi-join or aggregation on the bucket key reads
    co-located buckets and skips its Exchange entirely — at 100 TB this is
    how the orders<->lineitem join loses its shuffle (both sides bucketed
    by the join key into the same bucket count). ``sort_cols`` additionally
    pre-sorts within buckets so sort-merge joins skip their Sort.

    Stale-location safety: the in-memory catalog dies with the session but
    the warehouse files don't, so an interrupted earlier PROCESS can leave
    ``<warehouse>/<table>`` behind with no catalog entry. ``saveAsTable``
    refuses to adopt such a location (LOCATION_ALREADY_EXISTS); clear both
    the catalog entry and the orphaned directory before writing."""
    import os
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    location = f"{wh}/{table_name}"
    catalog_has_it = spark.catalog.tableExists(table_name)
    if mode == "overwrite":
        # Destructive cleanup is only correct when the caller asked to
        # replace the table wholesale.
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        shutil.rmtree(location, ignore_errors=True)
    elif not catalog_has_it and os.path.exists(location):
        # Orphaned location with no catalog entry (interrupted earlier
        # process): saveAsTable would refuse to adopt it, and appending to
        # it is meaningless because no table exists — clear the orphan.
        shutil.rmtree(location, ignore_errors=True)
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def kafka_wire_frame(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """K2 projection: exactly the (key, value) binary columns the Kafka sink
    contract requires."""
    return df.select(
        F.col(key_col).cast("binary").alias("key"),
        F.col(value_col).cast("binary").alias("value"),
    )


def foreach_batch_metrics_sink(path: str):
    """K4: returns a foreachBatch callback appending each micro-batch's
    aggregate rows (stamped with batch_id and wall-clock) to the metrics
    table. Idempotent replays overwrite by batch_id partition."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .withColumn("emitted_at", F.current_timestamp())
            .write.mode("append")
            .parquet(path)
        )

    return sink


def credential_store_merge(existing: DataFrame, updates: DataFrame, key: str = "did") -> DataFrame:
    """K5 upsert: latest row per key wins (updates beat existing on ties) —
    the MERGE INTO pattern expressed engine-agnostically."""
    tagged = existing.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(key).orderBy(F.col("_src").desc())
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )


def compact_files(
    spark, path: str, target_rows_per_file: int, order_by: tuple[str, ...] = ()
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(rows / target_rows_per_file) files, optionally range-sorted.

    The 100 TB operational reality: streaming sinks and fine partitioning
    leave millions of KB-scale files; every downstream scan then pays one
    open+footer-parse per file and the driver pays listing. Compaction =
    read → repartition to the row budget (repartitionByRange when a sort
    key is given, so row-group min/max stats stay selective) → atomic
    swap-in. Returns the new file count.
    """
    import math
    import shutil
    import tempfile

    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    if order_by:
        compacted = df.repartitionByRange(n_files, *order_by).sortWithinPartitions(
            *order_by
        )
    else:
        compacted = df.repartition(n_files)
    tmp = tempfile.mkdtemp(prefix="compact_") + "/out"
    compacted.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n_files


# ---------------------------------------------------------------------------
# did:web document hosting (U6): the reference fetches each did:web DID's
# document from the agent and commits `<path>/did.json` files into a
# static-hosting repo (host_did_web/src/main.go:398-485 — parseDID,
# determineTargetFile, saveDIDDocument; the git push is infra). Here the
# documents are BUILT from the identity dimension's key material and
# written in the same `<segments>/did.json` layout, so the URL that
# crypto.did_web_document_url derives for a DID maps 1:1 onto the files.
# ---------------------------------------------------------------------------


def did_web_document(did: str, public_key_hex: str) -> dict:
    """W3C DID document for a did:web identity with a Secp256k1 key —
    Veramo's WebDIDProvider creates a Secp256k1 key in createIdentifier
    (veramo_did_manager.ts:50-52), so the conditional Ed25519 top-up in
    veramo_create_protected_did.ts:317-341 never fires and did:web tokens
    sign ES256K; the hosted document must declare the same key type or
    remote verifiers would reject every token."""
    vm_id = f"{did}#owner"
    return {
        "@context": [
            "https://www.w3.org/ns/did/v1",
            "https://w3id.org/security/suites/secp256k1-2019/v1",
        ],
        "id": did,
        "verificationMethod": [
            {
                "id": vm_id,
                "type": "EcdsaSecp256k1VerificationKey2019",
                "controller": did,
                "publicKeyHex": public_key_hex,
            }
        ],
        "authentication": [vm_id],
        "assertionMethod": [vm_id],
    }


def host_did_web_documents(spark, root_dir: str) -> DataFrame:
    """Build + write every did:web identity's document under root_dir using
    the reference's path layout (segments after the host, then did.json).
    Returns the manifest (did, path) DataFrame. The dim is tiny (one row
    per symbol) — the driver-side write IS the hosting step, exactly like
    the reference's single git workspace."""
    import json as _json
    from pathlib import Path

    from ssiintegrateddatapipeline_spark.operators.identity import (
        build_identity_dim,
    )

    dim = build_identity_dim(spark, did_provider="did:web").toPandas()
    manifest = []
    for r in dim.itertuples():
        segments = r.did.split(":")[3:]  # after did:web:<host>
        target = Path(root_dir).joinpath(*segments) / "did.json"
        target.parent.mkdir(parents=True, exist_ok=True)
        target.write_text(
            _json.dumps(did_web_document(r.did, r.public_key_hex), indent=2)
        )
        manifest.append((r.did, str(target)))
    return local_frame(spark, manifest, "did string, path string")


def foreach_batch_broadcast_sink(spool_dir: str, max_batches: int = 100):
    """K1: the WebSocket broadcast sink's engine-side stand-in. The
    reference fans every message out to all connected WS clients
    (data_synthesizer/service/websocket/server.go:13-56 — a Broadcast
    channel drained into per-client writes). The engine's equivalent
    contract is at-most-once fan-out of each micro-batch to subscribers:
    here each batch is spooled as one JSON-lines frame file
    (``frame_<batch_id>.jsonl``) that any number of tailing consumers can
    read, with a bounded spool (oldest frames dropped past
    ``max_batches`` — exactly the semantics of a WS broadcast: absent
    subscribers miss frames, nothing is retained forever).

    The real network hop (socket upgrade, client registry) is transport
    infra a Spark job delegates to whatever serves the spool."""
    import json as _json
    import os
    from pathlib import Path

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spool = Path(spool_dir)
        spool.mkdir(parents=True, exist_ok=True)
        rows = [
            {k: (v.isoformat() if hasattr(v, "isoformat") else v) for k, v in r.asDict().items()}
            for r in batch_df.toLocalIterator()
        ]
        frame = spool / f"frame_{batch_id:012d}.jsonl"
        tmp = frame.with_suffix(".tmp")
        with open(tmp, "w") as f:
            for row in rows:
                f.write(_json.dumps(row, sort_keys=True) + "\n")
        os.replace(tmp, frame)  # atomic publish — readers never see partials
        frames = sorted(spool.glob("frame_*.jsonl"))
        for old in frames[: max(0, len(frames) - max_batches)]:
            old.unlink(missing_ok=True)

    return sink
