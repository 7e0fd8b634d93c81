"""Avro wire-format operators: serialize/deserialize at the Kafka boundary.

Re-expresses P10 (Avro serialize: kafka_producer/app/handlers/
kafka_producer.py:93-132) and the S3 deserialize side (kafka_consumer/app/
handlers/kafka_consumer.py:44-45) with the engine's own binary codec
(functions/avro_codec.py — pure Avro-spec implementation, since the
spark-avro module isn't available offline).

Design:
- timestamps are converted to epoch-microsecond longs JVM-side
  (``unix_micros``) before the Python boundary, and back with
  ``timestamp_micros`` after — the Arrow batches crossing into the codec
  carry only ints/floats/strings/lists, never timezone-bearing objects;
- the codec runs inside ``mapInPandas`` over whole Arrow batches; at scale
  this is one Python worker per partition streaming record batches — the
  same shape a registry-backed AvroSerializer sidecar would have, minus the
  network hop;
- the key column mirrors the reference's constant message key
  (kafka_producer/app/utils/settings.py:14 — ordering is per-topic there;
  we keep the symbol as key so a real Kafka sink partitions by symbol).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.functions import avro_codec
from ssiintegrateddatapipeline_spark.operators.trade_pipeline import trade_envelope

# Wire schema for the flattened trade envelope (TradeEventRef semantics,
# kafka_initialiser/app/resources/avro/trade/trade_event.avsc — flat variant
# with timestamp-micros longs; union exercises the null/array branch logic).
TRADE_WIRE_SCHEMA = {
    "type": "record",
    "name": "TradeEventWire",
    "namespace": "io.malmike.trades.wire",
    "fields": [
        {"name": "trade_event_id", "type": "string"},
        {"name": "symbol", "type": "string"},
        {"name": "price", "type": "double"},
        {"name": "volume", "type": "double"},
        {
            "name": "trade_condition",
            "type": ["null", {"type": "array", "items": "string"}],
            "default": None,
        },
        {"name": "event_ts_us", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "start_ts_us", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "e2e_latency_secs", "type": "double"},
    ],
}

_FIELDS = [f["name"] for f in TRADE_WIRE_SCHEMA["fields"]]

_DECODED_SPARK_SCHEMA = (
    "trade_event_id string, symbol string, price double, volume double, "
    "trade_condition array<string>, event_ts_us long, start_ts_us long, "
    "e2e_latency_secs double"
)


def avro_serialize(df: DataFrame) -> DataFrame:
    """P10: rows -> (key, value) with value = Avro binary per TRADE_WIRE_SCHEMA.

    The codec is schema-compiled once per Python worker (module import),
    so the per-record path is straight-line byte appends."""

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dumps = avro_codec.compile_dumps(TRADE_WIRE_SCHEMA)
        for pdf in batches:
            records = pdf[_FIELDS].to_dict("records")
            values = [dumps(r) for r in records]
            yield pd.DataFrame({"key": pdf["symbol"], "value": values})

    return df.mapInPandas(enc, "key string, value binary")


def avro_deserialize(df: DataFrame) -> DataFrame:
    """S3: (key, value) -> decoded columns."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        loads = avro_codec.compile_loads(TRADE_WIRE_SCHEMA)
        for pdf in batches:
            rows = [loads(v) for v in pdf["value"]]
            yield pd.DataFrame(rows, columns=_FIELDS)

    return df.mapInPandas(dec, _DECODED_SPARK_SCHEMA)


def avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 + S3 round trip over the trade envelope: serialize every event to
    Avro binary, deserialize, restore timestamps. Output equals the envelope
    exactly — the oracle is the envelope SQL itself."""
    env = trade_envelope(spark, sf_dir).select(
        "trade_event_id",
        "symbol",
        "price",
        "volume",
        "trade_condition",
        F.unix_micros("event_timestamp").alias("event_ts_us"),
        F.unix_micros("start_timestamp").alias("start_ts_us"),
        "e2e_latency_secs",
    )
    # The local events table is a single parquet split, which would run the
    # whole Python codec chain on one worker; fan out to all cores first (at
    # production scale the scan is already wide and this repartition is a
    # no-op to remove).
    env = env.repartition(spark.sparkContext.defaultParallelism)
    decoded = avro_deserialize(avro_serialize(env))
    return decoded.select(
        "trade_event_id",
        "symbol",
        "price",
        "volume",
        "trade_condition",
        F.timestamp_micros("event_ts_us").alias("event_timestamp"),
        F.timestamp_micros("start_ts_us").alias("start_timestamp"),
        "e2e_latency_secs",
    )


def avro_payload_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 over the wire bytes: per-symbol payload-size stats of the Avro
    binary — the engine-side equivalent of the payload-size histogram's
    input (data_synthesizer_finnhub_payload_size_bytes)."""
    env = trade_envelope(spark, sf_dir).select(
        "trade_event_id",
        "symbol",
        "price",
        "volume",
        "trade_condition",
        F.unix_micros("event_timestamp").alias("event_ts_us"),
        F.unix_micros("start_timestamp").alias("start_ts_us"),
        "e2e_latency_secs",
    )
    # single-split scan -> fan out before the Python codec (see avro_roundtrip)
    env = env.repartition(spark.sparkContext.defaultParallelism)
    wire = avro_serialize(env)
    return (
        wire.groupBy("key")
        .agg(
            F.count("*").alias("n_messages"),
            F.min(F.octet_length("value")).alias("min_bytes"),
            F.max(F.octet_length("value")).alias("max_bytes"),
        )
        .select(F.col("key").alias("symbol"), "n_messages", "min_bytes", "max_bytes")
    )


QUERIES = {
    "wire_avro_roundtrip": avro_roundtrip,
    "wire_avro_payload_sizes": avro_payload_sizes,
}

# the roundtrip restores the envelope exactly -> reuse its oracle SQL
from ssiintegrateddatapipeline_spark.operators.trade_pipeline import (  # noqa: E402
    ORACLES as _TRADE_ORACLES,
)

ORACLES = {
    "wire_avro_roundtrip": _TRADE_ORACLES["trade_envelope"],
    # wire_avro_payload_sizes: byte lengths depend on the Avro varint
    # encoding itself — not SQL-expressible; driver records rows-only check,
    # exact byte-accounting is covered by tests/test_wire.py.
}
