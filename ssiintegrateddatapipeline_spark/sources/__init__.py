from ssiintegrateddatapipeline_spark.sources.batch import TABLES, load_table, register_views  # noqa: F401
