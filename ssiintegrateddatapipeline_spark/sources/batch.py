"""Batch parquet sources for the driver's test tables.

The reference ingests from WebSocket/Kafka (SURVEY §2.1 S1-S5); the batch
equivalent here is a plain columnar scan. Expressing the load as
``spark.read.parquet`` keeps predicate pushdown / column pruning available to
Catalyst — filters written downstream of these loaders reach the parquet
reader (check ``.explain``: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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

# Dimension tables small enough to always broadcast in joins.
SMALL_DIMS = {"region", "nation", "supplier"}

# The driver's parquet stores timestamps as INT64 TIMESTAMP(NANOS); with
# spark.sql.legacy.parquet.nanosAsLong they surface as long nanoseconds.
# Convert to TimestampType (microsecond truncation — matches DuckDB, whose
# native TIMESTAMP is microseconds).
TIMESTAMP_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in TIMESTAMP_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, T.LongType):
            # integer division: float division would lose precision on
            # 19-digit nanosecond values (> 2^53)
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view so plans can also be spark.sql()."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
