"""Recursive parquet discovery (A1 — sanitize_parquet.py:11-14,
aggregate_parquet.py:13-18: rglob for ``*.parquet`` / ``*.prq``).

Two forms: a path-list helper for the metadata importer (which needs the
individual file paths for footer reads), and the Spark reader option set
for query-side discovery (recursiveFileLookup + pathGlobFilter), which at
scale is driven by Spark's parallel partition discovery
(spark.sql.sources.parallelPartitionDiscovery.parallelism=100,
entrypoint-spark.sh:39,125 — set in our session factory).
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

PARQUET_SUFFIXES = (".parquet", ".prq")


def find_parquet_files(root: str) -> list[str]:
    """All parquet files under root, sorted for determinism."""
    rootp = Path(root)
    if rootp.is_file():
        return [str(rootp)] if rootp.suffix in PARQUET_SUFFIXES else []
    return sorted(
        str(p) for p in rootp.rglob("*") if p.is_file() and p.suffix in PARQUET_SUFFIXES
    )


def list_import_folders(data_root: str) -> list[str]:
    """Immediate subfolders of the data root, each becoming one table
    (ImportParquetFolders.java:64-72); folders with no parquet are skipped
    by the caller (java:85-88)."""
    return sorted(
        os.path.join(data_root, d)
        for d in os.listdir(data_root)
        if os.path.isdir(os.path.join(data_root, d))
    )


def read_parquet_recursive(spark: SparkSession, root: str) -> DataFrame:
    """Query-side recursive read — Spark-native equivalent of A1."""
    return (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(root)
    )
