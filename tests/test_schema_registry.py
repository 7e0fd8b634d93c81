"""Schema-registry semantics: subject naming, version history, content-
addressed ids, compatibility gating, and the reference's SchemaReference
graph (trade/trade_event.avsc)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from ssiintegrateddatapipeline_spark.schemas.registry import (
    SchemaReference,
    SchemaRegistry,
    subject_for,
)

FIXTURES = Path(__file__).parent / "fixtures" / "avro"


def _load(rel: str) -> dict:
    return json.loads((FIXTURES / rel).read_text())


def _simple(name="T", fields=None):
    return {
        "type": "record",
        "name": name,
        "fields": fields
        if fields is not None
        else [{"name": "a", "type": "int"}],
    }


def test_subject_naming_matches_reference():
    assert subject_for(_simple("TradeEventRef")) == "TradeEventRef-value"
    assert subject_for(_simple("X"), subject_name="custom") == "custom-value"


def test_register_returns_stable_version_and_id():
    reg = SchemaRegistry()
    s = _simple()
    rs1 = reg.register_schema(s)
    assert (rs1.subject, rs1.version, rs1.schema_id) == ("T-value", 1, 1)
    # identical re-registration returns the same entry, no new version
    rs2 = reg.register_schema(s)
    assert (rs2.version, rs2.schema_id) == (1, 1)
    assert reg.get_latest_version("T-value").version == 1


def test_content_addressed_ids_across_subjects():
    reg = SchemaRegistry()
    s = _simple("Shared")
    a = reg.register_schema(s, subject_name="topic-a")
    b = reg.register_schema(s, subject_name="topic-b")
    assert a.subject != b.subject
    assert a.schema_id == b.schema_id  # same canonical schema, one id


def test_backward_compat_add_field_requires_default():
    reg = SchemaRegistry()
    reg.register_schema(_simple())
    # adding a defaulted field -> new version
    ok = _simple(fields=[{"name": "a", "type": "int"},
                         {"name": "b", "type": "string", "default": ""}])
    rs = reg.register_schema(ok)
    assert rs.version == 2
    # adding an undefaulted field -> rejected under BACKWARD
    bad = _simple(fields=[{"name": "a", "type": "int"},
                          {"name": "b", "type": "string", "default": ""},
                          {"name": "c", "type": "string"}])
    with pytest.raises(ValueError, match="added without a default"):
        reg.register_schema(bad)


def test_backward_compat_remove_field_ok_and_type_rules():
    reg = SchemaRegistry()
    reg.register_schema(
        _simple(fields=[{"name": "a", "type": "int"}, {"name": "b", "type": "int"}])
    )
    # removing a field is backward-compatible
    assert reg.register_schema(_simple()).version == 2
    # int -> long promotion allowed for the reader
    assert (
        reg.register_schema(_simple(fields=[{"name": "a", "type": "long"}])).version
        == 3
    )
    # re-registering a schema identical to an EARLIER version returns that
    # version without a compat check (Confluent semantics)
    assert reg.register_schema(_simple()).version == 2
    # a genuinely new schema whose reader type can't read long is rejected
    with pytest.raises(ValueError, match="cannot read writer type 'long' as 'boolean'"):
        reg.register_schema(_simple(fields=[{"name": "a", "type": "boolean"}]))


def test_forward_and_full_modes():
    reg = SchemaRegistry()
    reg.set_compatibility("T-value", "FORWARD")
    reg.register_schema(_simple())
    # FORWARD: old reader must read new data -> adding any field is fine,
    # removing an undefaulted field is not
    reg.register_schema(
        _simple(fields=[{"name": "a", "type": "int"}, {"name": "b", "type": "string"}])
    )
    with pytest.raises(ValueError, match="FORWARD-incompatible"):
        reg.register_schema(_simple(fields=[{"name": "b", "type": "string"}]))

    full = SchemaRegistry()
    full.set_compatibility("T-value", "FULL")
    full.register_schema(_simple())
    # FULL allows only defaulted additions
    full.register_schema(
        _simple(fields=[{"name": "a", "type": "int"},
                        {"name": "b", "type": "string", "default": ""}])
    )
    with pytest.raises(ValueError, match="FULL-incompatible"):
        full.register_schema(
            _simple(fields=[{"name": "a", "type": "int"},
                            {"name": "c", "type": "string"}])
        )


def test_none_mode_accepts_anything():
    reg = SchemaRegistry()
    reg.set_compatibility("T-value", "NONE")
    reg.register_schema(_simple())
    rs = reg.register_schema(_simple(fields=[{"name": "z", "type": "string"}]))
    assert rs.version == 2


def test_union_widening_is_backward_compatible():
    reg = SchemaRegistry()
    reg.register_schema(_simple(fields=[{"name": "a", "type": "string"}]))
    widened = _simple(
        fields=[{"name": "a", "type": ["null", "string"], "default": None}]
    )
    assert reg.register_schema(widened).version == 2
    # narrowing back is rejected: writer may emit null
    with pytest.raises(ValueError, match="matches no"):
        reg.register_schema(
            _simple(fields=[{"name": "a", "type": "string", "default": "x"}])
        )


def test_reference_graph_trade_event():
    """The reference's SchemaReference registration order for
    trade/trade_event.avsc (schema_registry_manager.py:22-62): leaves first,
    each referencing subject+pinned version."""
    reg = SchemaRegistry()
    parts = reg.register_schema(_load("trade/trade_credential/credential_parts.avsc"))
    data = reg.register_schema(_load("trade/trade_data.avsc"))
    cred = reg.register_schema(
        _load("trade/trade_credential/trade_data_credential.avsc"),
        references=[
            SchemaReference("io.malmike.trades.CredentialSubjectRef",
                            parts.subject, parts.version),
            SchemaReference("io.malmike.trades.TradeDataRef",
                            data.subject, data.version),
        ],
    )
    event = reg.register_schema(
        _load("trade/trade_event.avsc"),
        references=[
            SchemaReference("io.malmike.trades.TradeDataRef",
                            data.subject, data.version),
            SchemaReference("io.malmike.trades.TradeCredentialRef",
                            cred.subject, cred.version),
        ],
    )
    assert event.subject == "TradeEventRef-value"
    assert event.version == 1
    assert [r.subject for r in event.references] == [
        "TradeDataRef-value",
        "TradeCredentialRef-value",
    ]
    # dangling reference is a registration error
    with pytest.raises(KeyError):
        reg.register_schema(
            _simple("Dangling"),
            references=[SchemaReference("Nope", "Nope-value", 1)],
        )
    # evolving the referenced TradeDataRef with a defaulted field works and
    # the event schema can re-pin the new version
    evolved = _load("trade/trade_data.avsc")
    evolved["fields"].append({"name": "Venue", "type": "string", "default": ""})
    data_v2 = reg.register_schema(evolved)
    assert data_v2.version == 2
    event_v2 = reg.register_schema(
        _load("trade/trade_event.avsc"),
        references=[
            SchemaReference("io.malmike.trades.TradeDataRef",
                            data_v2.subject, data_v2.version),
            SchemaReference("io.malmike.trades.TradeCredentialRef",
                            cred.subject, cred.version),
        ],
    )
    # same canonical event schema -> same version/id returned, not a dup
    assert event_v2.version == event.version
