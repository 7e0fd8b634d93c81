"""Minimal Protocol Buffers wire-format codec for the trade envelope.

The reference pipeline ships trade events as Avro
(kafka_producer/app/handlers/kafka_producer.py); protobuf is the other
wire format a Kafka estate standardizes on, and Spark 3.4+ exposes
`from_protobuf`/`to_protobuf` only when the spark-protobuf package (and a
compiled descriptor set) is loaded — neither is available in this build,
so the engine carries its own encoder/decoder for the one message shape
it ships, exactly like `functions/avro_codec.py` carries the Avro binary
codec. Scope is deliberately the subset the envelope needs, implemented
straight from the public wire-format spec
(https://protobuf.dev/programming-guides/encoding/):

- varint (wire type 0) for the non-negative int64 timestamps,
- fixed 64-bit little-endian (wire type 1) for doubles,
- length-delimited (wire type 2) for strings, repeated per element.

Field numbers / schema of `TradeEventProto`:

    1  trade_event_id   string
    2  symbol           string
    3  price            double
    4  volume           double
    5  trade_condition  repeated string   (empty list -> absent)
    6  event_ts_us      int64
    7  start_ts_us      int64
    8  e2e_latency_secs double

Presence semantics are EXPLICIT (every scalar field is always emitted,
proto2-style), not proto3 implicit presence — a zero price must survive
the roundtrip distinguishably, and it keeps the byte-size oracle a pure
function of the field values. Fields are emitted in ascending field-number
order, so encoding is canonical and deterministic.
"""

from __future__ import annotations

import struct

# field-number constants, single source of truth for encoder and decoder
F_ID, F_SYMBOL, F_PRICE, F_VOLUME, F_COND, F_EVENT_TS, F_START_TS, F_E2E = (
    1, 2, 3, 4, 5, 6, 7, 8,
)
_WT_VARINT, _WT_I64, _WT_LEN = 0, 1, 2


def encode_varint(n: int) -> bytes:
    """Base-128 varint of a non-negative integer (spec: 7 bits per byte,
    MSB = continuation)."""
    if n < 0:
        raise ValueError("varint fields here are non-negative by contract")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        if pos >= len(buf):
            raise ValueError("varint overruns buffer")
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint longer than 10 bytes")


def _tag(field: int, wt: int) -> bytes:
    return encode_varint(field << 3 | wt)


_TAG_ID = _tag(F_ID, _WT_LEN)
_TAG_SYMBOL = _tag(F_SYMBOL, _WT_LEN)
_TAG_PRICE = _tag(F_PRICE, _WT_I64)
_TAG_VOLUME = _tag(F_VOLUME, _WT_I64)
_TAG_COND = _tag(F_COND, _WT_LEN)
_TAG_EVENT_TS = _tag(F_EVENT_TS, _WT_VARINT)
_TAG_START_TS = _tag(F_START_TS, _WT_VARINT)
_TAG_E2E = _tag(F_E2E, _WT_I64)

_PACK_D = struct.Struct("<d").pack


def _len_delim(tag: bytes, raw: bytes) -> bytes:
    return tag + encode_varint(len(raw)) + raw


def encode_trade(
    trade_event_id: str,
    symbol: str,
    price: float,
    volume: float,
    trade_condition,
    event_ts_us: int,
    start_ts_us: int,
    e2e_latency_secs: float,
) -> bytes:
    parts = [
        _len_delim(_TAG_ID, trade_event_id.encode()),
        _len_delim(_TAG_SYMBOL, symbol.encode()),
        _TAG_PRICE, _PACK_D(price),
        _TAG_VOLUME, _PACK_D(volume),
    ]
    for c in trade_condition or ():
        parts.append(_len_delim(_TAG_COND, c.encode()))
    parts += [
        _TAG_EVENT_TS, encode_varint(event_ts_us),
        _TAG_START_TS, encode_varint(start_ts_us),
        _TAG_E2E, _PACK_D(e2e_latency_secs),
    ]
    return b"".join(parts)


def decode_trade(buf: bytes) -> dict:
    """Spec-general decoder: reads (tag, value) pairs in any order, skips
    unknown fields by wire type — the forward-compatibility contract."""
    out = {
        "trade_event_id": "",
        "symbol": "",
        "price": 0.0,
        "volume": 0.0,
        "trade_condition": [],
        "event_ts_us": 0,
        "start_ts_us": 0,
        "e2e_latency_secs": 0.0,
    }
    pos, end = 0, len(buf)
    while pos < end:
        key, pos = _decode_varint(buf, pos)
        field, wt = key >> 3, key & 0x7
        if wt == _WT_VARINT:
            val, pos = _decode_varint(buf, pos)
            if field == F_EVENT_TS:
                out["event_ts_us"] = val
            elif field == F_START_TS:
                out["start_ts_us"] = val
        elif wt == _WT_I64:
            if pos + 8 > end:
                raise ValueError("fixed64 field overruns buffer")
            (d,) = struct.unpack_from("<d", buf, pos)
            pos += 8
            if field == F_PRICE:
                out["price"] = d
            elif field == F_VOLUME:
                out["volume"] = d
            elif field == F_E2E:
                out["e2e_latency_secs"] = d
        elif wt == _WT_LEN:
            ln, pos = _decode_varint(buf, pos)
            raw = buf[pos : pos + ln]
            if len(raw) != ln:
                raise ValueError("length-delimited field overruns buffer")
            pos += ln
            if field == F_ID:
                out["trade_event_id"] = raw.decode()
            elif field == F_SYMBOL:
                out["symbol"] = raw.decode()
            elif field == F_COND:
                out["trade_condition"].append(raw.decode())
        else:
            raise ValueError(f"unsupported wire type {wt}")
    return out


def encode_batch(cols: list[list]) -> list[bytes]:
    """Column-major batch encoder (the avro_codec.compile_dumps_batch
    shape): one call per Arrow chunk, plain-Python loop over rows."""
    ids, syms, prices, vols, conds, ets, sts, e2es = cols
    return [
        encode_trade(i, sy, p, v, c, et, st, e)
        for i, sy, p, v, c, et, st, e in zip(
            ids, syms, prices, vols, conds, ets, sts, e2es
        )
    ]
