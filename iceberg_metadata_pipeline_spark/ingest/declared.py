"""Declared queries proving the Tier-A ingest pipeline (SURVEY.md §2.A)
against the DuckDB oracle: whatever goes through discovery → schema
inference → registration → snapshot scan → sanitize projection must be
indistinguishable from reading the raw fixture parquet directly.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
from iceberg_metadata_pipeline_spark.ingest.register import import_data_root, read_table
from iceberg_metadata_pipeline_spark.ingest.sanitize import sanitize
from iceberg_metadata_pipeline_spark.queries import query
from iceberg_metadata_pipeline_spark.session import load_tables


def _import_fixture_root(spark: SparkSession, sf_dir: str, tables: list[str]) -> Catalog:
    """Stage fixture files as a reference-shaped data root (one subfolder per
    table — README.md:39-45) via symlinks, then run the importer."""
    root = tempfile.mkdtemp(prefix="ingest-root-")
    for t in tables:
        os.makedirs(os.path.join(root, t))
        os.symlink(
            os.path.join(sf_dir, f"{t}.parquet"),
            os.path.join(root, t, f"{t}.parquet"),
        )
    catalog = Catalog(spark, tempfile.mkdtemp(prefix="warehouse-"))
    report = import_data_root(spark, catalog, root)
    assert not report.failed, report.failed
    return catalog


@query(
    "ingest_register_scan",
    """
SELECT l_returnflag, COUNT(*) AS n,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def ingest_register_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full A1+A7-A11 path: folder discovery, first-file schema inference,
    create-or-load, metadata-only append, snapshot scan. Result must equal
    querying the raw parquet (zero data movement happened)."""
    catalog = _import_fixture_root(spark, sf_dir, ["lineitem"])
    df = read_table(catalog, "nyc", "lineitem")
    return (
        df.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double").alias("total_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "ingest_sanitize_epoch_micros",
    """
SELECT event_type,
       MIN(ts) AS first_ts, MAX(ts) AS last_ts, COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def ingest_sanitize_epoch_micros(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 timestamp rule end-to-end: events.ts is degraded to the raw
    telemetry form the reference ingests (epoch-µs as DECIMAL(20,0) —
    the shape a sanitized-then-reread UINT64 takes), then the sanitize
    projection must reconstruct the original timestamps exactly."""
    events = load_tables(spark, sf_dir)["events"]
    # unix_micros requires TIMESTAMP; the fixture's ts may read as
    # TIMESTAMP_NTZ — the cast preserves the instant (session TZ is UTC)
    degraded = events.select(
        F.unix_micros(F.col("ts").cast("timestamp")).cast("decimal(20,0)").alias("timestamp"),
        "event_type",
    )
    restored = sanitize(degraded)  # DECIMAL(20,0) named 'timestamp' → TIMESTAMP
    return (
        restored.groupBy("event_type")
        .agg(
            F.min("timestamp").alias("first_ts"),
            F.max("timestamp").alias("last_ts"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "ingest_sanitize_uint64_passthrough",
    """
SELECT CAST(MIN(rx) AS VARCHAR) AS min_rx, CAST(MAX(rx) AS VARCHAR) AS max_rx,
       CAST(MIN(other_named) AS VARCHAR) AS min_other, CAST(MAX(other_named) AS VARCHAR) AS max_other
FROM (
  SELECT CAST(event_id AS DECIMAL(20,0)) + 9223372036854775807 AS rx,
         CAST(epoch_us(ts) AS DECIMAL(20,0)) AS other_named
  FROM events
) t
""",
)
def ingest_sanitize_uint64_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 rule 1 + the name-based heuristic's negative case: UINT64-shaped
    DECIMAL(20,0) columns NOT named 'timestamp' stay DECIMAL(20,0) — even
    when their values look like epoch-µs (FIXTURES.md table 11
    `ts_named_other`). Values beyond int64 range prove decimal, not long."""
    events = load_tables(spark, sf_dir)["events"]
    degraded = events.select(
        (F.col("event_id").cast("decimal(20,0)") + F.lit(9223372036854775807).cast("decimal(20,0)"))
        .cast("decimal(20,0)")
        .alias("rx"),
        F.unix_micros(F.col("ts").cast("timestamp")).cast("decimal(20,0)").alias("other_named"),
    )
    restored = sanitize(degraded)
    assert dict(restored.dtypes)["rx"] == "decimal(20,0)", "rx must stay decimal"
    assert dict(restored.dtypes)["other_named"] == "decimal(20,0)", "name heuristic violated"
    # Stringify the decimal extremes: decimal surfaces as Decimal objects in
    # Spark's toPandas but float64 in DuckDB's, which value-hashes differently.
    return restored.agg(
        F.min("rx").cast("string").alias("min_rx"),
        F.max("rx").cast("string").alias("max_rx"),
        F.min("other_named").cast("string").alias("min_other"),
        F.max("other_named").cast("string").alias("max_other"),
    )


@query(
    "ingest_compaction_scan",
    """
SELECT COUNT(*) AS n, COUNT(DISTINCT o_orderkey) AS n_keys,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM orders
""",
)
def ingest_compaction_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 compaction as an Iceberg-style rewrite_data_files: register,
    compact to one file (a 'replace' snapshot), and prove the compacted
    scan is value-identical to the raw data."""
    catalog = _import_fixture_root(spark, sf_dir, ["orders"])
    table = catalog.load_table("nyc", "orders")
    table.rewrite_data_files(target_num_files=1)
    assert len(table.snapshot_files()) == 1
    df = table.scan()
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double").alias("total"),
    )
