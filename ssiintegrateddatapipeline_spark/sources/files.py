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


QUERIES = {
    "source_jsonl_roundtrip": jsonl_roundtrip,
    "source_csv_roundtrip": csv_roundtrip,
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
}
