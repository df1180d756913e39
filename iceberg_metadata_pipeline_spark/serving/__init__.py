from iceberg_metadata_pipeline_spark.serving.server import (  # noqa: F401
    SQLClient,
    SQLServer,
    SQLServingEngine,
)
