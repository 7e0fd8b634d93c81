"""Pure-Python Avro binary codec (Avro 1.11 spec wire format).

The reference serializes every Kafka message as registry-backed Avro
(kafka_producer/app/handlers/kafka_producer.py:46-62 — AvroSerializer;
consumer side kafka_consumer/app/handlers/kafka_consumer.py:44-45). Spark's
``to_avro``/``from_avro`` live in the external spark-avro module, which is
not bundled with a pip pyspark install — so the wire format is implemented
here from the public Avro specification (binary encoding section):

- int/long: zigzag varint
- float/double: little-endian IEEE-754
- string/bytes: varint length + utf-8/raw bytes
- record: field values in declared order, no markers
- union: varint branch index + value
- array/map: varint-counted blocks, zero terminator
- enum: varint symbol index; fixed: raw bytes

Used by operators/wire.py through Arrow-batched ``mapInPandas`` — the codec
runs executor-side over Arrow record batches, never row-at-a-time through a
Python UDF per column.
"""

from __future__ import annotations

import io
import struct
from typing import Any

# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(buf: io.BytesIO, n: int) -> None:
    n &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _read_varint(buf: io.BytesIO) -> int:
    shift = 0
    out = 0
    while True:
        (b,) = buf.read(1)
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out
        shift += 7


def write_long(buf: io.BytesIO, n: int) -> None:
    _write_varint(buf, _zigzag_encode(n))


def read_long(buf: io.BytesIO) -> int:
    return _zigzag_decode(_read_varint(buf))


# ---------------------------------------------------------------------------
# schema-driven encode/decode
# ---------------------------------------------------------------------------


def encode(value: Any, schema: Any, buf: io.BytesIO) -> None:
    """Encode a Python value against an Avro schema (dict/list/str form)."""
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):  # union: pick the branch
        idx = _union_branch(value, schema)
        write_long(buf, idx)
        encode(value, schema[idx], buf)
        return
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):
            encode(value, t, buf)
            return

    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "string":
        raw = value.encode("utf-8")
        write_long(buf, len(raw))
        buf.write(raw)
    elif t == "bytes":
        write_long(buf, len(value))
        buf.write(bytes(value))
    elif t == "record":
        for f in schema["fields"]:
            encode(value[f["name"]], f["type"], buf)
    elif t == "array":
        items = list(value)
        if items:
            write_long(buf, len(items))
            for item in items:
                encode(item, schema["items"], buf)
        write_long(buf, 0)
    elif t == "map":
        entries = dict(value)
        if entries:
            write_long(buf, len(entries))
            for k, v in entries.items():
                encode(k, "string", buf)
                encode(v, schema["values"], buf)
        write_long(buf, 0)
    elif t == "enum":
        write_long(buf, schema["symbols"].index(value))
    elif t == "fixed":
        buf.write(bytes(value))
    else:
        raise ValueError(f"unsupported avro type: {t!r}")


def decode(schema: Any, buf: io.BytesIO) -> Any:
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):
        idx = read_long(buf)
        return decode(schema[idx], buf)
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):
            return decode(t, buf)

    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "string":
        n = read_long(buf)
        return buf.read(n).decode("utf-8")
    if t == "bytes":
        n = read_long(buf)
        return buf.read(n)
    if t == "record":
        return {f["name"]: decode(f["type"], buf) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                read_long(buf)
                n = -n
            out.extend(decode(schema["items"], buf) for _ in range(n))
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                read_long(buf)
                n = -n
            for _ in range(n):
                k = decode("string", buf)
                out[k] = decode(schema["values"], buf)
    if t == "enum":
        return schema["symbols"][read_long(buf)]
    if t == "fixed":
        return buf.read(schema["size"])
    raise ValueError(f"unsupported avro type: {t!r}")


def _union_branch(value: Any, union: list) -> int:
    """Pick the union branch for a value (null vs the single non-null type,
    the only union shape the trade schemas use; general matching for rest)."""
    for i, branch in enumerate(union):
        t = branch if isinstance(branch, str) else branch.get("type")
        if value is None and t == "null":
            return i
        if value is not None and t != "null":
            return i
    raise ValueError(f"no union branch for {type(value).__name__} in {union}")


def dumps(value: Any, schema: Any) -> bytes:
    buf = io.BytesIO()
    encode(value, schema, buf)
    return buf.getvalue()


def loads(raw: bytes, schema: Any) -> Any:
    return decode(schema, io.BytesIO(raw))
