"""Declarative pipelines: a local runner for the Spark 4.1 SDP shape.

See runner.py. The real `pyspark.pipelines` decorators execute only over
Spark Connect (grpcio — absent in this container, like protobuf); this
package provides the same declarative dataset-graph model executed
directly against the session + metacat catalog.
"""

from iceberg_metadata_pipeline_spark.pipelines.runner import Pipeline

__all__ = ["Pipeline"]
