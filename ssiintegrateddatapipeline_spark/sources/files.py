"""File-format source coverage: JSONL and CSV ingest through Spark's
native readers, verified lossless by value-checksum oracles.

The engine's primary storage is parquet (sources/batch.py), but a
production ingest edge receives line-delimited JSON (the reference's wire
format — kafka_producer encodes frames as JSON strings) and CSV exports.
These queries write the driver tables out through the DataFrame writer
and read them back through ``spark.read.schema(...).json/csv`` with
explicit timestamp formats, then aggregate integer checksums over the
re-read rows. The DuckDB oracle computes the same checksums from the
ORIGINAL parquet — equality proves the encode→decode cycle preserved
every value (quoting, escaping, microsecond timestamps, float
round-tripping).

Scale shape: the write and read are both full-parallel file scans; the
checksum is a map-side-combined hash aggregate on a low-cardinality key.
The staged files are written once per (application, sf_dir, format) and
removed at interpreter exit.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.caches import register
from ssiintegrateddatapipeline_spark.functions.text_funcs import md5_int32
from ssiintegrateddatapipeline_spark.sources.batch import load_table

# microsecond-precision, zone-less (session tz is UTC): the default
# writer format truncates to millis, which would silently corrupt ts
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

# staged roundtrip dirs keyed by (app, sf_dir, fmt) — registry-enrolled so
# clear_caches evicts the entries with every other session memo (the temp
# dirs themselves are removed at exit; sf_dir contents are immutable)
_RT_CACHE: dict[tuple, str] = register({})


def _staged(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir, fmt)
    base = _RT_CACHE.get(key)
    if base is None:
        base = tempfile.mkdtemp(prefix=f"ssi_rt_{fmt}_")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        if fmt == "jsonl":
            load_table(spark, sf_dir, "documents").write.mode(
                "overwrite"
            ).json(base)
        elif fmt == "orc":
            load_table(spark, sf_dir, "events").write.mode("overwrite").orc(
                base
            )
        else:
            load_table(spark, sf_dir, "events").write.mode("overwrite").option(
                "header", True
            ).option("timestampFormat", _TS_FMT).csv(base)
        _RT_CACHE[key] = base
    return base


def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSONL → ``spark.read.json`` → per-source checksums."""
    src = _staged(spark, sf_dir, "jsonl")
    schema = load_table(spark, sf_dir, "documents").schema
    back = spark.read.schema(schema).json(src)
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(md5_int32(F.col("text"))).alias("text_checksum"),
        F.countDistinct("lang").alias("n_langs"),
    )


def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → CSV (quoted/escaped, microsecond timestamps) →
    ``spark.read.csv`` → per-type checksums. ``props`` is a JSON string
    full of commas and quotes, so the CSV quoting path is genuinely
    exercised; ``value`` round-trips through shortest-repr decimal text."""
    src = _staged(spark, sf_dir, "csv")
    schema = load_table(spark, sf_dir, "events").schema
    back = (
        spark.read.schema(schema)
        .option("header", True)
        .option("timestampFormat", _TS_FMT)
        .csv(src)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        F.sum(md5_int32(F.col("props"))).alias("props_checksum"),
        F.max(F.unix_micros("ts")).alias("max_ts_us"),
    )


def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → ORC → ``spark.read.orc`` → per-type checksums. The second
    columnar at-rest format next to parquet: types (timestamps, doubles,
    strings) round-trip natively — no text-layer quoting/format options —
    so equality against the parquet-side oracle proves the binary cycle is
    lossless. The read keeps predicate/column pushdown (PushedFilters
    shows in the ORC scan like parquet's)."""
    src = _staged(spark, sf_dir, "orc")
    back = spark.read.orc(src)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("value_micros"),
        F.sum(md5_int32(F.col("props"))).alias("props_checksum"),
        F.max(F.unix_micros("ts")).alias("max_ts_us"),
    )


QUERIES = {
    "source_jsonl_roundtrip": jsonl_roundtrip,
    "source_csv_roundtrip": csv_roundtrip,
    "source_orc_roundtrip": orc_roundtrip,
}

ORACLES = {
    # checksums over the ORIGINAL parquet: equality <=> lossless cycle
    "source_jsonl_roundtrip": """
        SELECT source,
               count(*) AS n_docs,
               sum(n_chars)::BIGINT AS total_chars,
               sum(('0x' || substr(md5(text), 1, 8))::UBIGINT::BIGINT)
                   ::BIGINT AS text_checksum,
               count(DISTINCT lang) AS n_langs
        FROM documents
        GROUP BY source
    """,
    "source_csv_roundtrip": """
        SELECT event_type,
               count(*) AS n_events,
               sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS value_cents,
               sum(('0x' || substr(md5(props), 1, 8))::UBIGINT::BIGINT)
                   ::BIGINT AS props_checksum,
               max(epoch_us(ts))::BIGINT AS max_ts_us
        FROM events
        GROUP BY event_type
    """,
    "source_orc_roundtrip": """
        SELECT event_type,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               sum(CAST(round(value * 1e6) AS BIGINT))::BIGINT AS value_micros,
               sum(('0x' || substr(md5(props), 1, 8))::UBIGINT::BIGINT)
                   ::BIGINT AS props_checksum,
               max(epoch_us(ts))::BIGINT AS max_ts_us
        FROM events
        GROUP BY event_type
    """,
}


# ---------------------------------------------------------------------------
# Avro OBJECT CONTAINER FILES (OCF): the at-rest form of the reference's
# Avro wire format. wire.py covers the per-message binary payloads (what a
# Kafka frame carries); this covers .avro FILES — header (magic, schema +
# codec metadata map, sync marker) and sync-delimited blocks — written and
# read entirely through functions/avro_codec (no spark-avro jar).
# ---------------------------------------------------------------------------

EVENT_OCF_SCHEMA = {
    "type": "record",
    "name": "EventRecord",
    "namespace": "io.malmike.events.ocf",
    "fields": [
        {"name": "event_id", "type": "long"},
        {
            "name": "ts_us",
            "type": {"type": "long", "logicalType": "timestamp-micros"},
        },
        {"name": "user_id", "type": "long"},
        {"name": "event_type", "type": "string"},
        {"name": "value", "type": "double"},
        {"name": "props", "type": "string"},
    ],
}

_OCF_MAGIC = b"Obj\x01"
OCF_PARTITIONS = 8  # one container file per write task


def _ocf_write_partition(
    rows, path: str, schema: dict, sync: bytes, codec: str = "null"
) -> None:
    """Serialize one partition as one OCF: header + a single data block.
    (The spec allows any block split; one block per partition keeps the
    writer a streaming append with O(1) state.) ``codec`` is the Avro
    container codec: "null" or "deflate" (raw DEFLATE, no zlib header,
    per the spec)."""
    import io
    import json as _json
    import zlib

    from ssiintegrateddatapipeline_spark.functions import avro_codec as ac

    dumps = ac.compile_dumps(schema)
    body = bytearray()
    n = 0
    for r in rows:
        body += dumps(
            {
                "event_id": r["event_id"],
                "ts_us": r["ts_us"],
                "user_id": r["user_id"],
                "event_type": r["event_type"],
                "value": r["value"],
                "props": r["props"],
            }
        )
        n += 1
    buf = io.BytesIO()
    buf.write(_OCF_MAGIC)
    meta = {
        "avro.schema": _json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    ac.write_long(buf, len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        ac.write_long(buf, len(kb))
        buf.write(kb)
        ac.write_long(buf, len(v))
        buf.write(v)
    ac.write_long(buf, 0)  # map terminator
    buf.write(sync)
    if n:
        block = bytes(body)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            block = co.compress(block) + co.flush()
        ac.write_long(buf, n)
        ac.write_long(buf, len(block))
        buf.write(block)
        buf.write(sync)
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())


def avro_ocf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → Avro object container files (one per partition, null
    codec, deterministic per-partition sync markers) → ``binaryFile``
    scan + an Arrow-batched OCF parser → per-type checksums. The oracle
    computes the same checksums from the ORIGINAL parquet, so equality
    proves the full file cycle (header, metadata map, block framing,
    record encoding, timestamp-micros logical type) is lossless.

    Scale shape: the writer is one streaming pass per partition (O(1)
    state, one container per task — the layout a Kafka-to-lake archiver
    produces); the reader parallelizes per FILE via the binaryFile
    source and decodes blocks inside ``mapInPandas`` (Arrow batches out,
    one Python worker per file split). At 100 TB the same plan reads any
    number of containers; per-file parallelism is the OCF contract
    (blocks within a file are sync-seekable for finer splits — not
    needed at one-block-per-partition)."""
    import hashlib

    key = (spark.sparkContext.applicationId, sf_dir, "avro_ocf")
    base = _RT_CACHE.get(key)
    if base is None:
        base = tempfile.mkdtemp(prefix="ssi_rt_avro_")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        schema = EVENT_OCF_SCHEMA
        target = base

        def _write(pi, rows):
            sync = hashlib.md5(f"ocf-sync-{pi}".encode()).digest()
            # alternate codecs across partitions so ONE roundtrip proves
            # both spec codecs (null and raw-DEFLATE)
            codec = "deflate" if pi % 2 else "null"
            _ocf_write_partition(
                rows, f"{target}/part-{pi:05d}.avro", schema, sync, codec
            )
            return iter(())

        (
            ev.repartition(OCF_PARTITIONS, "event_id")
            .rdd.mapPartitionsWithIndex(_write)
            .count()
        )
        _RT_CACHE[key] = base
    files = spark.read.format("binaryFile").load(f"{base}/*.avro")

    def _parse(batches):
        import pandas as pd

        from ssiintegrateddatapipeline_spark.functions import avro_codec as ac

        schema = EVENT_OCF_SCHEMA
        import io as _io
        import json as _json

        for pdf in batches:
            for content in pdf["content"]:
                import zlib

                buf = _io.BytesIO(bytes(content))
                if buf.read(4) != _OCF_MAGIC:
                    raise ValueError("OCF: bad magic bytes")
                codec = "null"
                n_meta = ac.read_long(buf)
                while n_meta != 0:
                    if n_meta < 0:
                        ac.read_long(buf)
                        n_meta = -n_meta
                    for _ in range(n_meta):
                        k = buf.read(ac.read_long(buf))
                        v = buf.read(ac.read_long(buf))
                        if k == b"avro.codec":
                            codec = v.decode()
                    n_meta = ac.read_long(buf)
                sync = buf.read(16)
                cols = {f["name"]: [] for f in schema["fields"]}
                while True:
                    probe = buf.read(1)
                    if not probe:
                        break
                    buf.seek(-1, 1)
                    n = ac.read_long(buf)
                    size = ac.read_long(buf)
                    raw = buf.read(size)
                    if codec == "deflate":
                        raw = zlib.decompress(raw, -15)
                    block = _io.BytesIO(raw)
                    for _ in range(n):
                        rec = ac.decode(schema, block)
                        for k, v in rec.items():
                            cols[k].append(v)
                    if buf.read(16) != sync:
                        raise ValueError("OCF: sync marker mismatch")
                if cols["event_id"]:
                    yield pd.DataFrame(cols)

    out_schema = (
        "event_id long, ts_us long, user_id long, event_type string,"
        " value double, props string"
    )
    back = files.select("content").mapInPandas(_parse, schema=out_schema)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        F.sum(md5_int32(F.col("props"))).alias("props_checksum"),
        F.max("ts_us").alias("max_ts_us"),
    )


QUERIES["source_avro_ocf_roundtrip"] = avro_ocf_roundtrip
ORACLES["source_avro_ocf_roundtrip"] = ORACLES["source_csv_roundtrip"]


# ---------------------------------------------------------------------------
# Schema-catalog audit — the engine's DESCRIBE/information_schema surface
# (the metadata face of the reference's schema layer: D2 validate +
# registry subjects, schemas/registry.py). Per table: exact row and
# column counts, a sorted column-name fingerprint, and the column-type
# class histogram, all derived from the LIVE loader schemas (what
# ``load_table`` actually hands every operator — so a loader drift from
# the storage schema fails the oracle, which replays the same facts from
# DuckDB's information_schema + count(*)). Metadata-only: ten footer
# reads plus count aggregates (parquet answers count(*) from row-group
# stats, no column IO).
# ---------------------------------------------------------------------------


def schema_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from ssiintegrateddatapipeline_spark.sources.batch import (
        TABLES,
        load_table,
        local_frame,
    )

    def type_class(dt) -> str:
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.TimestampType):
            return "timestamp"
        if isinstance(dt, T.ArrayType):
            return "array"
        if isinstance(
            dt,
            (T.LongType, T.IntegerType, T.DoubleType, T.FloatType,
             T.DecimalType, T.ShortType, T.ByteType),
        ):
            return "numeric"
        return "other"

    rows = []
    for tbl in TABLES:
        df = load_table(spark, sf_dir, tbl)
        classes = [type_class(f.dataType) for f in df.schema.fields]
        rows.append(
            (
                tbl,
                df.count(),
                len(df.schema.fields),
                ",".join(sorted(f.name for f in df.schema.fields)),
                classes.count("numeric"),
                classes.count("string"),
                classes.count("timestamp"),
                classes.count("array"),
            )
        )
    return local_frame(
        spark,
        rows,
        "table_name string, n_rows long, n_columns int, column_fingerprint"
        " string, n_numeric int, n_string int, n_timestamp int, n_array int",
    )


def _schema_catalog_oracle() -> str:
    from ssiintegrateddatapipeline_spark.sources.batch import TABLES

    per_table = " UNION ALL ".join(
        f"SELECT '{t}' AS table_name, (SELECT count(*) FROM {t})::BIGINT"
        f" AS n_rows" for t in TABLES
    )
    return f"""
        WITH counts AS ({per_table}),
        cols AS (
            SELECT table_name, count(*)::INT AS n_columns,
                   string_agg(column_name, ',' ORDER BY column_name)
                       AS column_fingerprint,
                   sum(CASE WHEN data_type IN ('BIGINT', 'INTEGER', 'DOUBLE',
                       'FLOAT', 'SMALLINT', 'TINYINT')
                       OR data_type LIKE 'DECIMAL%' THEN 1 ELSE 0 END)::INT
                       AS n_numeric,
                   sum(CASE WHEN data_type = 'VARCHAR' THEN 1 ELSE 0 END)::INT
                       AS n_string,
                   sum(CASE WHEN data_type LIKE 'TIMESTAMP%' THEN 1 ELSE 0
                       END)::INT AS n_timestamp,
                   sum(CASE WHEN data_type LIKE '%[]' THEN 1 ELSE 0 END)::INT
                       AS n_array
            FROM information_schema.columns
            WHERE table_name IN ({", ".join(f"'{t}'" for t in TABLES)})
            GROUP BY table_name
        )
        SELECT c.table_name, n_rows, n_columns, column_fingerprint,
               n_numeric, n_string, n_timestamp, n_array
        FROM counts c JOIN cols USING (table_name)
    """


QUERIES["source_schema_catalog"] = schema_catalog
ORACLES["source_schema_catalog"] = _schema_catalog_oracle()
