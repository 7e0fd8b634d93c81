"""Avro .avsc -> Spark StructType compiler with named-reference inlining.

The reference's schema system (SURVEY §1.2) is registry-enforced Avro:
.avsc files with cross-file named-type references
(kafka_initialiser/app/schema_loader.py:81-189 resolves dependencies and
registers in topological order). Spark needs none of the registry
choreography — but the named references (e.g. a TradeEvent whose field type
is the record name "TradeDataRef" declared in another file) must be inlined
into one StructType. This module:

- compiles any Avro schema JSON (primitives, records, enums, fixed, arrays,
  maps, union-with-null, logicalTypes timestamp-millis/micros and date,
  aliases) into the equivalent Spark DataType;
- maintains a SchemaCatalog of named types across files, resolving
  references in dependency order (Kahn topological sort over the reference
  graph — same contract as the reference's loader, fresh implementation);
- records field aliases in StructField metadata so the normalize/
  denormalize passes (P5/P6) can be generated from the schema.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

from pyspark.sql import types as T

PRIMITIVES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "null": T.NullType(),
}

_LOGICAL = {
    ("long", "timestamp-millis"): T.TimestampType(),
    ("long", "timestamp-micros"): T.TimestampType(),
    ("int", "date"): T.DateType(),
    ("long", "time-micros"): T.LongType(),
    ("int", "time-millis"): T.IntegerType(),
}


class SchemaCatalog:
    """Named-type registry: fullname -> Avro schema dict."""

    def __init__(self) -> None:
        self._types: dict[str, dict] = {}

    def register(self, schema: dict, namespace: str | None = None) -> str:
        ns = schema.get("namespace", namespace)
        fullname = schema["name"] if "." in schema["name"] else (
            f"{ns}.{schema['name']}" if ns else schema["name"]
        )
        self._types[fullname] = schema
        return fullname

    def get(self, fullname: str) -> dict | None:
        if fullname in self._types:
            return self._types[fullname]
        # also allow bare-name lookup when unambiguous
        tails = [k for k in self._types if k.rsplit(".", 1)[-1] == fullname]
        return self._types[tails[0]] if len(tails) == 1 else None

    def names(self) -> list[str]:
        return sorted(self._types)

    # -- directory loading with dependency resolution ----------------------

    @classmethod
    def from_dir(cls, path: str | Path) -> "SchemaCatalog":
        """Load every .avsc under path; named cross-file references are
        resolved in topological order (cycles are an error, as in Avro)."""
        cat = cls()
        raw: dict[str, dict] = {}
        for f in sorted(Path(path).glob("**/*.avsc")):
            schema = json.loads(f.read_text())
            fullname = cat.register(schema)
            raw[fullname] = schema
        order = _topo_order(raw)
        # registration order only matters for validation; compile is lazy
        cat._order = order
        return cat

    def compile(self, fullname: str) -> T.StructType:
        schema = self.get(fullname)
        if schema is None:
            raise KeyError(f"unknown schema: {fullname}")
        dt = compile_avsc(schema, self)
        if not isinstance(dt, T.StructType):
            raise TypeError(f"{fullname} is not a record schema")
        return dt


def _collect_refs(schema: Any, defined: set[str], refs: set[str]) -> None:
    if isinstance(schema, str):
        if schema not in PRIMITIVES:
            refs.add(schema)
    elif isinstance(schema, list):
        for s in schema:
            _collect_refs(s, defined, refs)
    elif isinstance(schema, dict):
        t = schema.get("type")
        if t == "record":
            defined.add(schema["name"])
            for f in schema.get("fields", []):
                _collect_refs(f["type"], defined, refs)
        elif t in ("enum", "fixed"):
            defined.add(schema["name"])
        elif t == "array":
            _collect_refs(schema["items"], defined, refs)
        elif t == "map":
            _collect_refs(schema["values"], defined, refs)
        else:
            _collect_refs(t, defined, refs)


def _topo_order(raw: dict[str, dict]) -> list[str]:
    """Kahn's algorithm over the cross-file reference graph."""
    deps: dict[str, set[str]] = {}
    for fullname, schema in raw.items():
        defined: set[str] = set()
        refs: set[str] = set()
        _collect_refs(schema, defined, refs)
        external = set()
        for r in refs:
            tail = r.rsplit(".", 1)[-1]
            if r in raw:
                external.add(r)
            else:
                hits = [k for k in raw if k.rsplit(".", 1)[-1] == tail and k != fullname]
                if hits and tail not in defined:
                    external.add(hits[0])
        deps[fullname] = external
    order: list[str] = []
    ready = sorted(n for n, d in deps.items() if not d)
    pending = {n: set(d) for n, d in deps.items()}
    while ready:
        n = ready.pop(0)
        order.append(n)
        for m, d in pending.items():
            if n in d:
                d.discard(n)
                if not d and m not in order and m not in ready:
                    ready.append(m)
        ready.sort()
    if len(order) != len(raw):
        cyc = sorted(set(raw) - set(order))
        raise ValueError(f"cyclic or unresolved schema references: {cyc}")
    return order


def compile_avsc(
    schema: Any, catalog: SchemaCatalog | None = None, namespace: str | None = None
) -> T.DataType:
    """Compile an Avro schema (dict / JSON string / union list) to a Spark
    DataType. Union-with-null maps to the nullable slot of the enclosing
    StructField; bare 2-branch null unions compile to the non-null branch.
    """
    if isinstance(schema, str):
        if schema in PRIMITIVES:
            return PRIMITIVES[schema]
        if schema.lstrip().startswith("{") or schema.lstrip().startswith("["):
            return compile_avsc(json.loads(schema), catalog, namespace)
        if catalog is not None:
            target = catalog.get(schema)
            if target is not None:
                return compile_avsc(target, catalog, namespace)
        raise KeyError(f"unresolved named type: {schema}")

    if isinstance(schema, list):  # union
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ValueError(f"only unions of [null, T] are supported, got {schema}")
        return compile_avsc(non_null[0], catalog, namespace)

    t = schema["type"]
    logical = schema.get("logicalType")
    if isinstance(t, str) and (t, logical) in _LOGICAL:
        return _LOGICAL[(t, logical)]

    if t == "record":
        if catalog is not None:
            catalog.register(schema, namespace)
        ns = schema.get("namespace", namespace)
        fields = []
        for f in schema.get("fields", []):
            ftype = f["type"]
            nullable = isinstance(ftype, list) and "null" in ftype
            meta = {}
            if f.get("aliases"):
                meta["aliases"] = f["aliases"]
            fields.append(
                T.StructField(
                    f["name"],
                    compile_avsc(ftype, catalog, ns),
                    nullable=nullable,
                    metadata=meta,
                )
            )
        return T.StructType(fields)
    if t == "enum":
        if catalog is not None:
            catalog.register(schema, namespace)
        return T.StringType()
    if t == "fixed":
        if catalog is not None:
            catalog.register(schema, namespace)
        return T.BinaryType()
    if t == "array":
        items = schema["items"]
        item_nullable = isinstance(items, list) and "null" in items
        return T.ArrayType(compile_avsc(items, catalog, namespace), containsNull=item_nullable)
    if t == "map":
        values = schema["values"]
        value_nullable = isinstance(values, list) and "null" in values
        return T.MapType(
            T.StringType(), compile_avsc(values, catalog, namespace), valueContainsNull=value_nullable
        )
    # {"type": "string"} style wrapping, or nested named reference
    return compile_avsc(t, catalog, namespace)


def alias_renames(struct: T.StructType) -> dict[str, str]:
    """field alias -> field name map (drives the P5/P6 normalize passes)."""
    out = {}
    for f in struct.fields:
        for alias in (f.metadata or {}).get("aliases", []):
            out[alias] = f.name
    return out
