"""ssiintegrateddatapipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / Spark SQL / Structured Streaming)
engine with the query and data-processing capabilities of the reference system
MalmikeFunProjects/SSIIntegratedDataPipeline (a streaming SSI trade pipeline:
ingest -> normalize -> sign (W3C VC / JWT) -> publish -> verify -> windowed
analytics), plus large-scale training-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis) designed for 100 TB
scale.

Everything here is expressed Spark-first: declarative DataFrame plans that
Catalyst can optimize (pushdown, pruning, broadcast, AQE), with Python only in
genuinely non-relational kernels (Ed25519/JWT crypto) as Arrow-batched UDFs.
"""

__version__ = "0.1.0"

from ssiintegrateddatapipeline_spark.caches import clear_caches  # noqa: F401
from ssiintegrateddatapipeline_spark.session import get_spark  # noqa: F401
