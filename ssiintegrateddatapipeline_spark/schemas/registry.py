"""In-engine schema registry: subjects, versions, references, compatibility.

Re-expresses the reference's Confluent registry choreography
(kafka_initialiser/app/schema_registry_manager.py:22-62 — ``{name}-value``
subject naming, version pinning via ``get_latest_version``, and
SchemaReference lists; kafka_producer/app/handlers/kafka_producer.py:53-62 —
``auto.register.schemas=False`` + ``use.latest.version=True``) as a
self-contained catalog the Spark engine can consult without a registry
service. Semantics follow the public Confluent/Avro contracts:

- a *subject* holds an ordered version history; registering a schema that
  is byte-identical (canonical JSON) to an existing version returns the
  existing (id, version) instead of creating a new one;
- global schema ids are content-addressed: the same canonical schema under
  two subjects shares one id;
- new versions must pass the subject's compatibility mode before being
  accepted — BACKWARD (default, new reader reads old data), FORWARD,
  FULL, or NONE, with Avro field add/remove/default and numeric-promotion
  rules;
- references name other subject+version pairs and must resolve at
  registration time (the reference's SchemaReference graph for
  trade/trade_event.avsc).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

AVRO_PRIMITIVE_NAMES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}

# Avro's writer->reader numeric/string promotion lattice (Avro spec,
# "Schema Resolution"): a reader of type K can read a writer of any type
# in PROMOTIONS[K].
PROMOTIONS: dict[str, set[str]] = {
    "long": {"int"},
    "float": {"int", "long"},
    "double": {"int", "long", "float"},
    "string": {"bytes"},
    "bytes": {"string"},
}

COMPAT_MODES = ("BACKWARD", "FORWARD", "FULL", "NONE")


@dataclass(frozen=True)
class SchemaReference:
    """A named pointer to another subject's pinned version."""

    name: str
    subject: str
    version: int


@dataclass
class RegisteredSchema:
    schema_id: int
    subject: str
    version: int
    schema: dict
    references: tuple[SchemaReference, ...] = ()


@dataclass
class _Subject:
    versions: list[RegisteredSchema] = field(default_factory=list)
    compatibility: str = "BACKWARD"


def canonical_json(schema: dict) -> str:
    """Deterministic serialization used for identity: sorted keys, no
    whitespace (doc/aliases participate — stripping them is a registry
    config we don't model)."""
    return json.dumps(schema, sort_keys=True, separators=(",", ":"))


def subject_for(schema: dict, subject_name: str | None = None) -> str:
    """TopicNameStrategy-style value subject: ``{name}-value``
    (schema_registry_manager.py:30)."""
    return f"{subject_name or schema['name']}-value"


class SchemaRegistry:
    """Subject/version store with compatibility gating."""

    def __init__(self) -> None:
        self._subjects: dict[str, _Subject] = {}
        self._by_canonical: dict[str, int] = {}
        self._next_id = 1

    # -- read side ---------------------------------------------------------

    def get_subjects(self) -> list[str]:
        return sorted(self._subjects)

    def get_latest_version(self, subject: str) -> RegisteredSchema:
        return self._versions(subject)[-1]

    def get_version(self, subject: str, version: int) -> RegisteredSchema:
        for rs in self._versions(subject):
            if rs.version == version:
                return rs
        raise KeyError(f"{subject} has no version {version}")

    def get_by_id(self, schema_id: int) -> RegisteredSchema:
        for sub in self._subjects.values():
            for rs in sub.versions:
                if rs.schema_id == schema_id:
                    return rs
        raise KeyError(f"no schema with id {schema_id}")

    def get_compatibility(self, subject: str) -> str:
        return self._subject(subject).compatibility

    def set_compatibility(self, subject: str, mode: str) -> None:
        if mode not in COMPAT_MODES:
            raise ValueError(f"unknown compatibility mode {mode!r}")
        self._subject(subject, create=True).compatibility = mode

    # -- write side --------------------------------------------------------

    def register_schema(
        self,
        schema: dict,
        subject_name: str | None = None,
        references: list[SchemaReference] | tuple[SchemaReference, ...] = (),
    ) -> RegisteredSchema:
        """Register under ``{name}-value``; returns the existing entry if
        this exact schema is already a version of the subject, else gates on
        the subject's compatibility mode and appends a new version."""
        subject = subject_for(schema, subject_name)
        refs = tuple(references)
        for r in refs:
            # must resolve NOW — a dangling reference is a registration error
            self.get_version(r.subject, r.version)

        sub = self._subject(subject, create=True)
        canon = canonical_json(schema)
        for rs in sub.versions:
            if canonical_json(rs.schema) == canon:
                return rs

        if sub.versions:
            latest = sub.versions[-1]
            mode = sub.compatibility
            problems = self.check_compatibility(
                schema, latest.schema, mode, references=refs
            )
            if problems:
                raise ValueError(
                    f"schema is {mode}-incompatible with {subject} "
                    f"v{latest.version}: {'; '.join(problems)}"
                )

        schema_id = self._by_canonical.get(canon)
        if schema_id is None:
            schema_id = self._next_id
            self._next_id += 1
            self._by_canonical[canon] = schema_id
        rs = RegisteredSchema(
            schema_id=schema_id,
            subject=subject,
            version=len(sub.versions) + 1,
            schema=schema,
            references=refs,
        )
        sub.versions.append(rs)
        return rs

    # -- compatibility -----------------------------------------------------

    def check_compatibility(
        self,
        new: dict,
        old: dict,
        mode: str = "BACKWARD",
        references: tuple[SchemaReference, ...] = (),
    ) -> list[str]:
        """Problems list (empty = compatible). BACKWARD = new schema reads
        old data; FORWARD = old schema reads new data; FULL = both."""
        if mode == "NONE":
            return []
        resolve = self._resolver(references)
        problems: list[str] = []
        if mode in ("BACKWARD", "FULL"):
            problems += _can_read(reader=new, writer=old, resolve=resolve, path=new.get("name", ""))
        if mode in ("FORWARD", "FULL"):
            problems += _can_read(reader=old, writer=new, resolve=resolve, path=new.get("name", ""))
        return problems

    # -- internals ---------------------------------------------------------

    def _subject(self, subject: str, create: bool = False) -> _Subject:
        if subject not in self._subjects:
            if not create:
                raise KeyError(f"unknown subject {subject!r}")
            self._subjects[subject] = _Subject()
        return self._subjects[subject]

    def _versions(self, subject: str) -> list[RegisteredSchema]:
        versions = self._subject(subject).versions
        if not versions:
            raise KeyError(f"subject {subject!r} has no versions")
        return versions

    def _resolver(self, references: tuple[SchemaReference, ...]):
        """Named-type resolver over the reference list (plus everything
        already registered, matching use.latest.version semantics)."""

        def resolve(name: str) -> dict | None:
            for r in references:
                if r.name == name or r.name.rsplit(".", 1)[-1] == name:
                    return self.get_version(r.subject, r.version).schema
            tail = name.rsplit(".", 1)[-1]
            hits = []
            for sub in self._subjects.values():
                for rs in sub.versions[-1:]:
                    n = rs.schema.get("name", "")
                    ns = rs.schema.get("namespace")
                    fqn = f"{ns}.{n}" if ns and "." not in n else n
                    if fqn == name or n == tail:
                        hits.append(rs.schema)
            return hits[0] if len(hits) == 1 else None

        return resolve


# -- structural "reader can read writer" check ------------------------------


def _type_name(t: Any) -> str:
    if isinstance(t, str):
        return t
    if isinstance(t, list):
        return "union"
    return t.get("type", "?")


def _branches(t: Any) -> list[Any]:
    return t if isinstance(t, list) else [t]


def _can_read(reader: Any, writer: Any, resolve, path: str) -> list[str]:
    """Avro schema-resolution subset sufficient for registry gating:
    records (field add needs reader default, field remove fine for reader),
    unions (every writer branch readable by some reader branch), arrays,
    maps, enums (writer symbols ⊆ reader symbols), primitives + promotion,
    named references resolved through the registry."""
    # resolve string-named types (primitives pass through)
    if isinstance(reader, str) and reader not in AVRO_PRIMITIVE_NAMES:
        r = resolve(reader)
        if r is None:
            return [f"{path}: unresolved reader reference {reader!r}"]
        reader = r
    if isinstance(writer, str) and writer not in AVRO_PRIMITIVE_NAMES:
        w = resolve(writer)
        if w is None:
            return [f"{path}: unresolved writer reference {writer!r}"]
        writer = w

    # unions: every branch the writer may emit must be readable
    if isinstance(writer, list) or isinstance(reader, list):
        problems = []
        for wb in _branches(writer):
            ok = any(
                not _can_read(rb, wb, resolve, path) for rb in _branches(reader)
            )
            if not ok:
                problems.append(
                    f"{path}: writer branch {_type_name(wb)!r} matches no "
                    f"reader branch"
                )
        return problems

    rt, wt = _type_name(reader), _type_name(writer)

    if rt == "record" and wt == "record":
        problems = []
        wfields = {f["name"]: f for f in writer.get("fields", [])}
        for rf in reader.get("fields", []):
            wf = wfields.get(rf["name"])
            if wf is None:
                # reader-only field: needs a default to fill
                if "default" not in rf:
                    problems.append(
                        f"{path}.{rf['name']}: added without a default"
                    )
            else:
                problems += _can_read(
                    rf["type"], wf["type"], resolve, f"{path}.{rf['name']}"
                )
        # writer-only fields are simply skipped by the reader — fine
        return problems

    if rt == "enum" and wt == "enum":
        missing = set(writer.get("symbols", [])) - set(reader.get("symbols", []))
        return (
            [f"{path}: enum symbols {sorted(missing)} unknown to reader"]
            if missing
            else []
        )
    if rt == "array" and wt == "array":
        return _can_read(reader["items"], writer["items"], resolve, f"{path}[]")
    if rt == "map" and wt == "map":
        return _can_read(reader["values"], writer["values"], resolve, f"{path}{{}}")
    if rt == "fixed" and wt == "fixed":
        if reader.get("size") != writer.get("size"):
            return [f"{path}: fixed size {writer.get('size')} -> {reader.get('size')}"]
        return []

    if rt == wt:
        return []
    if wt in PROMOTIONS.get(rt, set()):
        return []
    return [f"{path}: cannot read writer type {wt!r} as {rt!r}"]
