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


QUERIES = {
    "transform_normalize_roundtrip": normalize_roundtrip,
}

ORACLES = {
    "transform_normalize_roundtrip": """
        SELECT doc_id,
               'https://example.org/ctx/' || lang AS lang_ctx,
               'vc:doc:' || doc_id::VARCHAR AS cred_id,
               true AS roundtrip_ok
        FROM documents
    """,
}
