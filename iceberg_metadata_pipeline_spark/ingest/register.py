"""Folder→table metadata importer (A7-A11 — ImportParquetFolders.java).

One PySpark pipeline per data root: discover subfolders, infer each
table's schema from the first file's footer (java:131-138, "no custom
coercions"), create-or-load the table (java:94-100), and register all
parquet files with one atomic metadata-only append commit per folder
(java:102-117) — data files are never copied or rewritten. Per-folder
fault isolation: one bad folder reports and does not abort the rest
(java:64-72); empty folders are skipped (java:85-88).

Divergences from the reference (intentional, documented):
- Re-running an import is idempotent (already-registered paths skipped);
  the reference would append duplicates.
- Tables whose schema needs sanitizing (SURVEY.md §1.2) get the sanitize
  projection applied at scan time via the table property
  ``sanitize=true`` instead of requiring an offline rewrite.

Scale notes (100 TB): footer reads are O(#files) driver-side metadata
ops (a few KB each); for millions of files they'd be distributed via a
mapPartitions over the path list. Registration itself writes one JSON
commit per folder regardless of data volume.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from iceberg_metadata_pipeline_spark.catalog.metacat import (
    Catalog,
    Table,
    scan_parquet_footers,
)
from iceberg_metadata_pipeline_spark.ingest.discover import (
    find_parquet_files,
    list_import_folders,
)
from iceberg_metadata_pipeline_spark.ingest.sanitize import (
    needs_sanitize,
    sanitize,
)

DEFAULT_NAMESPACE = "nyc"  # ImportParquetFolders.java:40


@dataclass
class ImportResult:
    table: str
    ok: bool
    n_files: int = 0
    n_records: int = 0
    snapshot_id: int | None = None
    error: str | None = None


@dataclass
class ImportReport:
    results: list[ImportResult] = field(default_factory=list)

    @property
    def ok(self) -> list[ImportResult]:
        return [r for r in self.results if r.ok]

    @property
    def failed(self) -> list[ImportResult]:
        return [r for r in self.results if not r.ok]


def infer_schema_first_file(spark: SparkSession, folder: str):
    """Schema from the first parquet file's footer, no coercions (A8)."""
    files = find_parquet_files(folder)
    if not files:
        return None, []
    schema = _infer_schema_arrow(files[0])
    if schema is None:  # exotic type (uint64, nested, ...) → Spark's own
        schema = spark.read.parquet(files[0]).schema  # inference is the spec
    return schema, files


def _infer_schema_arrow(path: str):
    """Driver-side footer inference via pyarrow — same result as
    ``spark.read.parquet(path).schema`` for the simple-type whitelist,
    without a ~50 ms Spark relation. Returns None when ANY column falls
    outside the whitelist (unsigned ints, nested types): those must go
    through Spark so its coercion rules (A2: UINT64→DECIMAL(20,0))
    stay the source of truth."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_metadata_pipeline_spark.catalog.metacat import _arrow_ddl, _parse_type

    try:
        arrow_schema = pq.read_schema(path)
    except Exception:  # noqa: BLE001 — unreadable footer → let Spark report it
        return None
    out = []
    for fld in arrow_schema:
        t = fld.type
        if pa.types.is_timestamp(t) and t.unit in ("us", "ms"):
            # Spark's inferTimestampNTZ (default on) maps tz-less parquet
            # timestamps to TIMESTAMP_NTZ; _arrow_ddl flattens both
            ddl = "timestamp" if t.tz else "timestamp_ntz"
        else:
            ddl = _arrow_ddl(t)
        if ddl is None:
            return None
        out.append(T.StructField(fld.name, _parse_type(ddl), fld.nullable))
    return T.StructType(out)


def import_folder(
    spark: SparkSession, catalog: Catalog, folder: str, namespace: str = DEFAULT_NAMESPACE
) -> ImportResult:
    """Register one folder as one table (create-or-load + atomic append)."""
    import os

    table_name = os.path.basename(folder.rstrip("/")).lower()  # java:90
    schema, files = infer_schema_first_file(spark, folder)
    if schema is None:
        return ImportResult(table_name, ok=False, error="no parquet files (skipped)")
    props = {"sanitize": "true"} if needs_sanitize(schema) else {}
    table = catalog.create_table(namespace, table_name, schema, properties=props)
    entries = scan_parquet_footers(folder, spark)
    snapshot_id = table.append_files(entries)
    return ImportResult(
        table_name,
        ok=True,
        n_files=len(entries),
        n_records=sum(e.record_count for e in entries),
        snapshot_id=snapshot_id,
    )


def import_data_root(
    spark: SparkSession,
    catalog: Catalog,
    data_root: str,
    namespace: str = DEFAULT_NAMESPACE,
) -> ImportReport:
    """The main() flow (java:42-77): ensure namespaces, walk subfolders,
    import each with fault isolation."""
    catalog.ensure_namespace(namespace)
    catalog.ensure_namespace("default")  # java:53-61 creates both
    report = ImportReport()
    for folder in list_import_folders(data_root):
        try:
            report.results.append(import_folder(spark, catalog, folder, namespace))
        except Exception as e:  # noqa: BLE001 — per-folder isolation (java:68-70)
            import os

            report.results.append(
                ImportResult(
                    os.path.basename(folder.rstrip("/")).lower(),
                    ok=False,
                    error=f"{type(e).__name__}: {e}",
                )
            )
    return report


def read_table(catalog: Catalog, namespace: str, name: str, **scan_kwargs) -> DataFrame:
    """Scan with the sanitize projection applied when the table was
    registered with raw-uint64/epoch-µs columns."""
    table: Table = catalog.load_table(namespace, name)
    df = table.scan(**scan_kwargs)
    if table.properties.get("sanitize") == "true":
        df = sanitize(df)
    return df
