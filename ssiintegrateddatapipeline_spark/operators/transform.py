"""Schema-driven struct transforms: the P5/P6 normalize passes.

The reference renames the W3C-VC field ``@context`` (illegal in Avro) to
``context`` before serialization and back after
(kafka_producer/app/gather_data/process_data.py:26-32 normalize;
kafka_consumer/app/handlers/kafka_event_handler.py:72-88 denormalize).
Here the renames are *derived from the schema*: the .avsc compiler records
field aliases in StructField metadata (schemas/avsc.py), and
``rename_struct_fields`` applies them with withField+dropFields — pure
column operations, no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.sources.batch import load_table


def rename_struct_fields(col: Column, renames: dict[str, str]) -> Column:
    """Rename top-level fields of a struct column: {old: new}. Names with
    non-identifier characters (like ``@context``) are backtick-quoted for
    the field-name parser. NB: withField appends, so renamed fields move to
    the end; use ``rename_fields`` on a DataFrame to preserve field order."""
    for old, new in renames.items():
        col = col.withField(f"`{new}`", col.getField(old)).dropFields(f"`{old}`")
    return col


def rename_fields(df: DataFrame, col_name: str, renames: dict[str, str]) -> DataFrame:
    """Order-preserving struct-field rename: rebuilds the struct in declared
    order with renamed aliases (so P5 then P6 is a true identity)."""
    fields = df.schema[col_name].dataType.fields
    rebuilt = F.struct(
        *[
            F.col(col_name).getField(f.name).alias(renames.get(f.name, f.name))
            for f in fields
        ]
    )
    return df.withColumn(col_name, rebuilt)


def normalize_credential(df: DataFrame, cred_col: str = "credential") -> DataFrame:
    """P5: ``@context`` -> ``context`` (pre-serialization direction)."""
    return rename_fields(df, cred_col, {"@context": "context"})


def denormalize_credential(df: DataFrame, cred_col: str = "credential") -> DataFrame:
    """P6: ``context`` -> ``@context`` (pre-verification direction)."""
    return rename_fields(df, cred_col, {"context": "@context"})


def _credential_struct() -> Column:
    """A VC-shaped struct with the JSON-LD ``@context`` field, built from
    document columns (mirrors the credential envelope of
    veramo_authorisation_credential.ts:161-180 in the reference)."""
    return F.struct(
        F.array(
            F.lit("https://www.w3.org/2018/credentials/v1"),
            F.concat(F.lit("https://example.org/ctx/"), F.col("lang")),
        ).alias("@context"),
        F.concat(F.lit("vc:doc:"), F.col("doc_id").cast("string")).alias("id"),
        F.array(F.lit("VerifiableCredential")).alias("type"),
    )


def normalize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 then P6 must be the identity; the flattened output doubles as the
    oracle check that the rename itself is correct."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", _credential_struct().alias("credential")
    )
    normalized = normalize_credential(d)
    # serialize-side view: field is now 'context'
    wire_view = normalized.select(
        "doc_id",
        F.col("credential.context").alias("context"),
        F.col("credential.id").alias("cred_id"),
    )
    restored = denormalize_credential(normalized)
    back = restored.select(
        "doc_id", F.col("credential.`@context`").alias("context_restored")
    )
    return (
        wire_view.join(back, "doc_id")
        .select(
            "doc_id",
            F.element_at("context", 2).alias("lang_ctx"),
            "cred_id",
            (F.col("context") == F.col("context_restored")).alias("roundtrip_ok"),
        )
    )


ZORDER_BITS = 8  # per-dimension key width (testdata spans ~8 bits per dim)
ZBUCKET_SHIFT = 10  # bucket = top 6 bits of the 16-bit z-value: an 8x8 grid


def zorder_value(x: Column, y: Column) -> Column:
    """Interleave the low 16 bits of two dimension keys into a 32-bit
    Morton (z-order) value — pure JVM bit expressions, unrolled at plan
    time, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(ZORDER_BITS):
        z = z.bitwiseOR(F.shiftleft(x.bitwiseAND(F.lit(1 << i)), i)).bitwiseOR(
            F.shiftleft(y.bitwiseAND(F.lit(1 << i)), i + 1)
        )
    return z


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional data layout: a Morton z-order key over
    (user_id, hour) and the locality profile of its top-level buckets —
    each z-bucket's min/max per dimension stays a small rectangle, which is
    exactly why sorting 100 TB by this key lets parquet row-group min/max
    stats skip files for BOTH `user_id` range filters and time-range
    filters (a single-column sort can only serve one of the two).

    On a cluster the write path is `repartitionByRange(zkey).
    sortWithinPartitions(zkey)`; here the oracle-checked part is the key
    computation and the bucket-locality contract itself.
    """
    ev = load_table(spark, sf_dir, "events")
    x = F.pmod(F.col("user_id"), F.lit(1 << ZORDER_BITS)).cast("long")
    y = F.pmod(F.expr("unix_micros(ts) div 3600000000"), F.lit(1 << ZORDER_BITS)).cast(
        "long"
    )
    keyed = ev.select(x.alias("x"), y.alias("y")).withColumn(
        "z", zorder_value(F.col("x"), F.col("y"))
    )
    return (
        keyed.groupBy(F.shiftright(F.col("z"), ZBUCKET_SHIFT).alias("zbucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )


QUERIES = {
    "transform_normalize_roundtrip": normalize_roundtrip,
    "transform_zorder_layout": zorder_layout,
}

_Z_SQL = " | ".join(
    f"((x & {1 << i}) << {i}) | ((y & {1 << i}) << {i + 1})"
    for i in range(ZORDER_BITS)
)

ORACLES = {
    "transform_zorder_layout": f"""
        WITH keyed AS (
            SELECT x, y, {_Z_SQL} AS z FROM (
                SELECT (user_id % {1 << ZORDER_BITS})::BIGINT AS x,
                       ((epoch_us(ts) // 3600000000) % {1 << ZORDER_BITS})::BIGINT AS y
                FROM events
            )
        )
        SELECT z >> {ZBUCKET_SHIFT} AS zbucket,
               count(*) AS n_rows,
               min(x) AS x_min, max(x) AS x_max,
               min(y) AS y_min, max(y) AS y_max
        FROM keyed GROUP BY 1
    """,
    "transform_normalize_roundtrip": """
        SELECT doc_id,
               'https://example.org/ctx/' || lang AS lang_ctx,
               'vc:doc:' || doc_id::VARCHAR AS cred_id,
               true AS roundtrip_ok
        FROM documents
    """,
}
