from ssiintegrateddatapipeline_spark.schemas.avsc import (  # noqa: F401
    SchemaCatalog,
    compile_avsc,
)
from ssiintegrateddatapipeline_spark.schemas.validator import (  # noqa: F401
    AvroSchemaError,
    validate_schema,
)
