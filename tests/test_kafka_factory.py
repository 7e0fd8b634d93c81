"""Kafka connector factory: option-map parity with the reference's
consumer/producer properties (offline — no broker; the factory never calls
load()/start())."""

from __future__ import annotations

import pytest

from ssiintegrateddatapipeline_spark.sources.kafka import (
    CONSUMER_GROUP_ID,
    DEFAULT_TOPIC,
    KafkaSinkConfig,
    KafkaSourceConfig,
    decoded_stream,
)


def test_source_options_mirror_reference_consumer():
    cfg = KafkaSourceConfig(bootstrap_servers="broker-1:9092,broker-2:9092")
    opts = cfg.options()
    assert opts["kafka.bootstrap.servers"] == "broker-1:9092,broker-2:9092"
    assert opts["subscribe"] == DEFAULT_TOPIC
    # auto.offset.reset=latest -> startingOffsets=latest
    assert opts["startingOffsets"] == "latest"
    assert opts["kafka.group.id"] == CONSUMER_GROUP_ID
    assert opts["failOnDataLoss"] == "false"
    assert "maxOffsetsPerTrigger" not in opts


def test_source_options_overrides():
    cfg = KafkaSourceConfig(
        bootstrap_servers="b:9092",
        topics=("t1", "t2"),
        group_id=None,
        starting_offsets="earliest",
        max_offsets_per_trigger=10_000,
        extra={"kafka.security.protocol": "SASL_SSL"},
    )
    opts = cfg.options()
    assert opts["subscribe"] == "t1,t2"
    assert opts["startingOffsets"] == "earliest"
    assert "kafka.group.id" not in opts
    assert opts["maxOffsetsPerTrigger"] == "10000"
    assert opts["kafka.security.protocol"] == "SASL_SSL"


def test_sink_options_and_wire_frame_contract(spark):
    cfg = KafkaSinkConfig(
        bootstrap_servers="b:9092", checkpoint_location="/tmp/ckpt"
    )
    opts = cfg.options()
    assert opts["topic"] == DEFAULT_TOPIC
    assert opts["checkpointLocation"] == "/tmp/ckpt"
    # writer refuses a frame without the key/value wire columns
    bad = spark.range(1).selectExpr("id as not_key")
    with pytest.raises(ValueError, match="key\\+value"):
        cfg.writer(bad, streaming=False)
    good = spark.range(1).selectExpr(
        "cast(id as string) as key", "cast(cast(id as string) as binary) as value"
    )
    from ssiintegrateddatapipeline_spark.sources.sinks import kafka_wire_frame

    writer = cfg.writer(kafka_wire_frame(good, "key", "value"), streaming=False)
    assert writer is not None


def test_source_reader_is_kafka_format(spark):
    cfg = KafkaSourceConfig(bootstrap_servers="b:9092")
    reader = cfg.reader(spark, streaming=True)
    # DataStreamReader built and configured; .load() is the caller's (needs
    # a broker + kafka package). Reaching here without error is the contract.
    assert reader is not None
    batch_reader = cfg.reader(spark, streaming=False)
    assert batch_reader is not None


def test_decoded_stream_composes_wire_codec(spark):
    cfg = KafkaSourceConfig(bootstrap_servers="b:9092")
    reader, decode = decoded_stream(spark, cfg)
    assert reader is not None
    # drive the decode stage with a local stand-in frame carrying real Avro
    # bytes: decode(raw) must recover the record columns
    from pyspark.sql import functions as F

    from ssiintegrateddatapipeline_spark.functions import avro_codec
    from ssiintegrateddatapipeline_spark.operators import wire

    rec = {
        "trade_event_id": "e1",
        "symbol": "BINANCE:BTCUSDT",
        "price": 1.5,
        "volume": 2.0,
        "trade_condition": ["1"],
        "event_ts_us": 1_700_000_000_000_000,
        "start_ts_us": 1_700_000_000_500_000,
        "e2e_latency_secs": 0.5,
    }
    raw_bytes = avro_codec.dumps(rec, wire.TRADE_WIRE_SCHEMA)
    raw = spark.createDataFrame(
        [("BINANCE:BTCUSDT", bytearray(raw_bytes), "trade_topic", 0, 0)],
        "key string, value binary, topic string, partition int, offset long",
    ).withColumn("timestamp", F.current_timestamp())
    out = decode(raw).collect()
    assert len(out) == 1
    got = out[0].asDict()
    assert got["trade_event_id"] == "e1"
    assert got["price"] == 1.5
    assert got["trade_condition"] == ["1"]
    assert got["event_ts_us"] == rec["event_ts_us"]


def test_registry_value_contract_use_latest_no_autoregister():
    import pytest

    from ssiintegrateddatapipeline_spark.operators.wire import TRADE_WIRE_SCHEMA
    from ssiintegrateddatapipeline_spark.schemas.registry import SchemaRegistry
    from ssiintegrateddatapipeline_spark.sources.kafka import registry_value_contract

    reg = SchemaRegistry()
    # auto.register.schemas=False: an unregistered subject is an error,
    # the producer never creates it
    with pytest.raises(KeyError):
        registry_value_contract(reg, TRADE_WIRE_SCHEMA)

    v1 = reg.register_schema(TRADE_WIRE_SCHEMA)
    evolved = dict(TRADE_WIRE_SCHEMA)
    evolved["fields"] = TRADE_WIRE_SCHEMA["fields"] + [
        {"name": "venue", "type": "string", "default": ""}
    ]
    v2 = reg.register_schema(evolved)
    assert v2.version == 2

    # use.latest.version=True: the contract pins v2 even when handed v1's
    # schema dict
    latest = registry_value_contract(reg, TRADE_WIRE_SCHEMA)
    assert (latest.version, latest.schema_id) == (v2.version, v2.schema_id)
