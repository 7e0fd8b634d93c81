"""Local replica of the driver's DuckDB-oracle correctness check.

Runs a Spark query and its oracle SQL side by side and compares:

- row count,
- column names AND type classes (int vs float vs decimal, naive timestamp
  vs timestamptz, …) — DuckDB's HUGEINT (``sum(CASE…)``) surfaces as
  arrow ``decimal128(38,0)`` and a bare ``to_timestamp(…)`` as
  ``timestamp[us, tz=…]``; both must be cast in the oracle SQL
  (``::BIGINT`` / ``::TIMESTAMP``) or the driver's hasher flags them,
- an order-insensitive canonical value representation (columns sorted by
  name, rows sorted, floats at full ``repr`` precision).

This is deliberately at least as strict as the driver's value-hash: a
query that passes here should pass the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb
import pyarrow as pa

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


# ---------------------------------------------------------------------------
# Type classes — a normalized type vocabulary shared by both engines, so a
# Spark LongType and a DuckDB BIGINT both land on "int", while HUGEINT
# lands on "decimal" and TIMESTAMPTZ on "timestamptz" (mismatch => fail).
# ---------------------------------------------------------------------------


def _spark_type_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, getattr(T, "TimestampNTZType", ())):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return f"list<{_spark_type_class(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{_spark_type_class(dt.keyType)},{_spark_type_class(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name}:{_spark_type_class(f.dataType)}" for f in dt.fields
        )
        return f"struct<{inner}>"
    return dt.simpleString()


def _arrow_type_class(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_timestamp(t):
        return "timestamptz" if t.tz is not None else "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_type_class(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{_arrow_type_class(t.key_type)},{_arrow_type_class(t.item_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{_arrow_type_class(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    return str(t)


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        # Strip trailing zeros without scientific notation: 12.50 -> 12.5.
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return s or "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)  # full shortest-round-trip precision
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_value(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark, sf_dir: str, query_fn, oracle: str) -> tuple[bool, str]:
    sdf = query_fn(spark, sf_dir)
    scols = sdf.columns
    stypes = {f.name: _spark_type_class(f.dataType) for f in sdf.schema.fields}
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    tbl = con.execute(oracle).arrow()
    con.close()
    ocols = tbl.schema.names
    otypes = {
        f.name: _arrow_type_class(f.type) for f in tbl.schema
    }
    orows = [tuple(d[c] for c in ocols) for d in tbl.to_pylist()]

    if sorted(scols) != sorted(ocols):
        return False, f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"
    bad_types = {
        c: (stypes[c], otypes[c]) for c in scols if stypes[c] != otypes[c]
    }
    if bad_types:
        return False, f"dtype mismatch (spark, oracle): {bad_types}"
    if len(srows) != len(orows):
        return False, f"row count mismatch: spark={len(srows)} oracle={len(orows)}"
    sc = canonical_rows(scols, srows)
    oc = canonical_rows(ocols, orows)
    if sc != oc:
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
