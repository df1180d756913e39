from iceberg_metadata_pipeline_spark.serving.hs2 import (  # noqa: F401
    HS2Client,
    HiveServer2Front,
)
from iceberg_metadata_pipeline_spark.serving.server import (  # noqa: F401
    SQLClient,
    SQLServer,
    SQLServingEngine,
)
