"""Schema-system tests: .avsc -> StructType compilation with cross-file
named references (SURVEY §1.2-1.3), alias metadata for the P5/P6
normalize passes, and the structural validator (D2)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from ssiintegrateddatapipeline_spark.schemas import (
    AvroSchemaError,
    SchemaCatalog,
    compile_avsc,
    validate_schema,
)
from ssiintegrateddatapipeline_spark.schemas.avsc import alias_renames

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "avro")


@pytest.fixture(scope="module")
def catalog() -> SchemaCatalog:
    return SchemaCatalog.from_dir(FIXTURES)


def test_catalog_loads_all_named_types(catalog):
    names = catalog.names()
    for expected in [
        "io.malmike.trades.TradeDataRef",
        "io.malmike.trades.TradeEventRef",
        "io.malmike.trades.TradeCredentialRef",
        "io.malmike.trades.CredentialSubjectRef",
    ]:
        assert expected in names


def test_health_sensor_compiles(catalog):
    """The sibling topic family: nested inline record + int vitals
    (IntegerType, not LongType)."""
    st = catalog.compile("com.example.health.HealthSensorRecord")
    assert [f.name for f in st.fields] == [
        "data", "vc_store_signature", "start_timestamp", "did", "jwt",
    ]
    data = st["data"].dataType
    assert isinstance(data, T.StructType)
    assert data["heart_rate"].dataType == T.IntegerType()
    assert data["temperature"].dataType == T.DoubleType()
    assert not st["data"].nullable  # non-union field


def test_trade_event_compiles_with_inlined_refs(catalog):
    st = catalog.compile("io.malmike.trades.TradeEventRef")
    assert [f.name for f in st.fields] == [
        "trade_event_id",
        "start_timestamp",
        "symbol",
        "tradeData",
        "tradeCredential",
    ]
    td = st["tradeData"]
    assert td.nullable  # union ["null", ref]
    assert isinstance(td.dataType, T.StructType)
    assert td.dataType["Price"].dataType == T.DoubleType()
    assert td.dataType["Trade_Condition"].dataType == T.ArrayType(
        T.StringType(), containsNull=False
    )
    # 4-level nesting: credential -> subject -> claims -> TradeData
    cred = st["tradeCredential"].dataType
    claims = cred["credentialSubject"].dataType["claims"].dataType
    assert isinstance(claims["TradeData"].dataType, T.StructType)
    assert claims["TradeData"].dataType["Volume"].dataType == T.DoubleType()


def test_alias_metadata_drives_renames(catalog):
    cred = catalog.compile("io.malmike.trades.TradeCredentialRef")
    renames = alias_renames(cred)
    assert renames == {"@context": "context"}


def test_logical_timestamp_millis():
    dt = compile_avsc(
        {"type": "long", "logicalType": "timestamp-millis"}
    )
    assert dt == T.TimestampType()


def test_union_null_second_position():
    dt = compile_avsc(["string", "null"])
    assert dt == T.StringType()


def test_enum_fixed_map():
    dt = compile_avsc(
        {
            "type": "record",
            "name": "R",
            "fields": [
                {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]}},
                {"name": "f", "type": {"type": "fixed", "name": "F", "size": 16}},
                {"name": "m", "type": {"type": "map", "values": "int"}},
            ],
        }
    )
    assert dt["e"].dataType == T.StringType()
    assert dt["f"].dataType == T.BinaryType()
    assert dt["m"].dataType == T.MapType(
        T.StringType(), T.IntegerType(), valueContainsNull=False
    )


def test_struct_roundtrips_through_spark(spark, catalog):
    """A DataFrame built with the compiled schema accepts the reference's
    documented payload shape (data_synthesizer/README.md:95-133)."""
    st = catalog.compile("io.malmike.trades.TradeEventRef")
    row = {
        "trade_event_id": "11111111-2222-3333-4444-555555555555",
        "start_timestamp": "2026-01-01T00:00:00Z",
        "symbol": "BINANCE:BTCUSDT",
        "tradeData": {
            "Trade_Id": "aaaa",
            "Trade_Condition": ["market"],
            "Price": 42000.5,
            "Symbol": "BINANCE:BTCUSDT",
            "Event_Timestamp": 1767225600000,
            "Volume": 0.25,
        },
        "tradeCredential": None,
    }
    df = spark.createDataFrame([row], schema=st)
    got = df.collect()[0]
    assert got["tradeData"]["Price"] == 42000.5
    assert got["tradeCredential"] is None


# --- validator -----------------------------------------------------------


def test_validator_accepts_all_fixtures():
    import pathlib

    for f in pathlib.Path(FIXTURES).glob("**/*.avsc"):
        validate_schema(json.loads(f.read_text()))


@pytest.mark.parametrize(
    "bad,frag",
    [
        ({"type": "record", "name": "1bad", "fields": []}, "segment"),
        ({"type": "record", "name": "R"}, "fields"),
        (
            {"type": "record", "name": "R",
             "fields": [{"name": "a", "type": "string"}, {"name": "a", "type": "int"}]},
            "duplicate field",
        ),
        ({"type": "enum", "name": "E", "symbols": []}, "symbols"),
        ({"type": "enum", "name": "E", "symbols": ["A", "A"]}, "unique"),
        ({"type": "fixed", "name": "F"}, "size"),
        ({"type": "array"}, "items"),
        ({"type": "map"}, "values"),
        (["string", "string"], "duplicate union branch"),
        ([["null", "string"]], "union"),
        (
            {"type": "record", "name": "R",
             "fields": [{"name": "a", "type": ["string", "null"], "default": None}]},
            "null default",
        ),
    ],
)
def test_validator_rejects(bad, frag):
    with pytest.raises(AvroSchemaError) as exc:
        validate_schema(bad)
    assert frag in str(exc.value)


def test_cyclic_reference_detected(tmp_path):
    (tmp_path / "a.avsc").write_text(json.dumps(
        {"type": "record", "name": "A", "fields": [{"name": "b", "type": "B"}]}
    ))
    (tmp_path / "b.avsc").write_text(json.dumps(
        {"type": "record", "name": "B", "fields": [{"name": "a", "type": "A"}]}
    ))
    with pytest.raises(ValueError, match="cyclic"):
        SchemaCatalog.from_dir(tmp_path)
