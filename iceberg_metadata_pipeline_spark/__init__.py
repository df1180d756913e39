"""PySpark-native lakehouse analytics engine.

A from-scratch re-expression of the capabilities of
danguyenn/Iceberg-Metadata-Pipeline (reference at /root/reference, read-only)
on idiomatic PySpark: DataFrame/SQL declared plans, Catalyst/AQE optimization,
a Parquet-backed snapshot catalog standing in for the Iceberg HadoopCatalog
(the Iceberg runtime jar is not available in this environment), and
LLM-data-pipeline extension operators (dedup, similarity, text analysis,
multimodal) designed for 100 TB scale.
"""

from iceberg_metadata_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
