"""Structural Avro schema validator (engine-side pre-flight check).

Re-implements the semantics of the reference's validator
(kafka_initialiser/app/avro_schema_validator.py:18-187 — plain structural
dict-walking per the public Avro 1.11 spec) as a fresh Python
implementation: name rules, record/enum/fixed/union/array/map shape checks,
union constraints (no nested unions, no duplicate branch types), and
default-value sanity for null defaults.
"""

from __future__ import annotations

import re
from typing import Any

PRIMITIVE_TYPES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}
COMPLEX_TYPES = {"record", "enum", "array", "map", "fixed", "union"}
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


class AvroSchemaError(ValueError):
    def __init__(self, message: str, path: str = "$") -> None:
        super().__init__(f"{path}: {message}")
        self.path = path


def _check_name(name: Any, path: str, what: str = "name") -> None:
    if not isinstance(name, str) or not name:
        raise AvroSchemaError(f"{what} must be a non-empty string", path)
    for part in name.split("."):
        if not _NAME_RE.match(part):
            raise AvroSchemaError(f"invalid {what} segment {part!r}", path)


def validate_schema(schema: Any, path: str = "$", named: set[str] | None = None) -> None:
    """Raise AvroSchemaError on the first structural violation."""
    named = named if named is not None else set()

    if isinstance(schema, str):
        if schema not in PRIMITIVE_TYPES and schema not in named:
            # forward references across files resolve at catalog level; a
            # syntactically valid name is accepted here
            _check_name(schema, path, "type reference")
        return

    if isinstance(schema, list):
        if len(schema) < 2:
            raise AvroSchemaError("union must have at least 2 branches", path)
        seen: set[str] = set()
        for i, branch in enumerate(schema):
            bpath = f"{path}[{i}]"
            if isinstance(branch, list):
                raise AvroSchemaError("unions must not be nested", bpath)
            key = branch if isinstance(branch, str) else branch.get("name", branch.get("type"))
            if key in seen:
                raise AvroSchemaError(f"duplicate union branch {key!r}", bpath)
            seen.add(str(key))
            validate_schema(branch, bpath, named)
        return

    if not isinstance(schema, dict):
        raise AvroSchemaError(f"schema must be str/list/dict, got {type(schema).__name__}", path)

    t = schema.get("type")
    if t is None:
        raise AvroSchemaError("missing 'type'", path)
    if isinstance(t, (dict, list)):
        validate_schema(t, f"{path}.type", named)
        return
    if t in PRIMITIVE_TYPES:
        return

    if t == "record":
        _check_name(schema.get("name"), f"{path}.name", "record name")
        named.add(schema["name"])
        fields = schema.get("fields")
        if not isinstance(fields, list):
            raise AvroSchemaError("record requires a 'fields' list", path)
        seen_fields: set[str] = set()
        for i, f in enumerate(fields):
            fpath = f"{path}.fields[{i}]"
            if not isinstance(f, dict):
                raise AvroSchemaError("field must be an object", fpath)
            _check_name(f.get("name"), fpath, "field name")
            if f["name"] in seen_fields:
                raise AvroSchemaError(f"duplicate field {f['name']!r}", fpath)
            seen_fields.add(f["name"])
            if "type" not in f:
                raise AvroSchemaError("field requires a 'type'", fpath)
            validate_schema(f["type"], f"{fpath}.type", named)
            if "default" in f and f["default"] is None:
                ftype = f["type"]
                is_nullable = ftype == "null" or (
                    isinstance(ftype, list) and ftype and ftype[0] == "null"
                )
                if not is_nullable:
                    raise AvroSchemaError(
                        "null default requires 'null' first union branch", fpath
                    )
        return

    if t == "enum":
        _check_name(schema.get("name"), f"{path}.name", "enum name")
        named.add(schema["name"])
        symbols = schema.get("symbols")
        if not isinstance(symbols, list) or not symbols:
            raise AvroSchemaError("enum requires non-empty 'symbols'", path)
        if len(set(symbols)) != len(symbols):
            raise AvroSchemaError("enum symbols must be unique", path)
        for s in symbols:
            _check_name(s, f"{path}.symbols", "enum symbol")
        return

    if t == "fixed":
        _check_name(schema.get("name"), f"{path}.name", "fixed name")
        named.add(schema["name"])
        if not isinstance(schema.get("size"), int) or schema["size"] < 0:
            raise AvroSchemaError("fixed requires a non-negative integer 'size'", path)
        return

    if t == "array":
        if "items" not in schema:
            raise AvroSchemaError("array requires 'items'", path)
        validate_schema(schema["items"], f"{path}.items", named)
        return

    if t == "map":
        if "values" not in schema:
            raise AvroSchemaError("map requires 'values'", path)
        validate_schema(schema["values"], f"{path}.values", named)
        return

    # named reference spelled as {"type": "SomeName"}
    if isinstance(t, str):
        validate_schema(t, f"{path}.type", named)
        return
    raise AvroSchemaError(f"unknown type {t!r}", path)
