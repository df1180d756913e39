"""Schema sanitize rules (A2/A3/A6 — sanitize_parquet.py:17-71,
aggregate_parquet.py:21-66).

The reference rewrites parquet offline with PyArrow because Iceberg/Spark
vectorized readers choke on UINT64 and epoch-micros columns (README.md:5).
Rules, reproduced exactly:

1. Any UINT64 column NOT named ``timestamp``      → DECIMAL(20,0)
   (sanitize_parquet.py:56-61)
2. Column named ``timestamp`` typed UINT64        → TIMESTAMP(µs, UTC)
   via uint64→int64→timestamp_micros (sanitize_parquet.py:41-46)
3. Column named ``timestamp`` typed DECIMAL(p≥18, s=0) — i.e. previously
   rule-1-sanitized —                              → TIMESTAMP(µs, UTC)
   (sanitize_parquet.py:47-51)
4. Everything else passes through unchanged, nullability preserved
   (sanitize_parquet.py:35,53-54).

Spark-first twist: Spark ≥3.2 already reads parquet UINT64 as
DECIMAL(20,0) natively, so rule 1 is satisfied at scan time and rules 2/3
collapse into one decimal→timestamp expression. Sanitize therefore becomes
a *projection* (`df.select(sanitize_exprs(df.schema))`) applied lazily at
read — zero data rewrite — with an optional rewrite sink (A4) for parity
with the reference's offline flow. The projection is pure Catalyst
(cast/timestamp_micros), fully codegen'd, no UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TIMESTAMP_COL = "timestamp"  # the name-based heuristic (sanitize_parquet.py:41)


def _is_epoch_micros_decimal(dt: T.DataType) -> bool:
    """DECIMAL(p≥18, s=0): how a parquet UINT64 surfaces in Spark, and how a
    previously rule-1-sanitized timestamp column arrives
    (sanitize_parquet.py:47-51 checks precision≥18 ∧ scale=0)."""
    return isinstance(dt, T.DecimalType) and dt.precision >= 18 and dt.scale == 0


def sanitize_expr(field: T.StructField) -> Column:
    """The sanitize projection for one column."""
    col = F.col(field.name)
    if field.name == TIMESTAMP_COL and _is_epoch_micros_decimal(field.dataType):
        # epoch-µs → TIMESTAMP(µs, UTC); decimal→long→timestamp double-cast
        # mirrors Arrow's uint64→int64→timestamp (sanitize_parquet.py:43-46)
        return F.timestamp_micros(col.cast("long")).alias(field.name)
    if field.name == TIMESTAMP_COL and isinstance(field.dataType, T.LongType):
        # nanosAsLong path or raw int64 epoch-µs
        return F.timestamp_micros(col).alias(field.name)
    return col.alias(field.name)


def sanitize_exprs(schema: T.StructType) -> list[Column]:
    return [sanitize_expr(f) for f in schema.fields]


def sanitize(df: DataFrame) -> DataFrame:
    """A2/A3 as a lazy projection; Spark's partitioned execution replaces the
    reference's hand-rolled 250k-row batching (aggregate_parquet.py:69-100)."""
    return df.select(sanitize_exprs(df.schema))


def sanitized_schema(schema: T.StructType) -> T.StructType:
    out = []
    for f in schema.fields:
        if (
            f.name == TIMESTAMP_COL
            and (_is_epoch_micros_decimal(f.dataType) or isinstance(f.dataType, T.LongType))
        ):
            out.append(T.StructField(f.name, T.TimestampType(), f.nullable, f.metadata))
        else:
            out.append(f)
    return T.StructType(out)


@dataclass
class ColumnChange:
    column: str
    before: str
    after: str


def dry_run_report(schema: T.StructType) -> list[ColumnChange]:
    """A6: which columns *would* change — pure metadata, no scan
    (sanitize_parquet.py:82-83,113,135-142)."""
    changes = []
    for before, after in zip(schema.fields, sanitized_schema(schema).fields):
        if before.dataType != after.dataType:
            changes.append(
                ColumnChange(before.name, before.dataType.simpleString(), after.dataType.simpleString())
            )
    return changes


def needs_sanitize(schema: T.StructType) -> bool:
    return bool(dry_run_report(schema))


def rewrite_sanitized(
    df: DataFrame,
    out_path: str,
    overwrite: bool = False,
    compression: str = "snappy",
) -> None:
    """A4 file-rewrite sink: write the sanitized projection back as parquet
    (snappy default, refuse overwrite unless asked — sanitize_parquet.py:90-100).
    Kept for reference parity; the lazy `sanitize()` projection is the
    idiomatic path (no rewrite at all)."""
    (
        sanitize(df)
        .write.mode("overwrite" if overwrite else "errorifexists")
        .option("compression", compression)
        .parquet(out_path)
    )


def aggregate_folder(
    spark,
    in_dir: str,
    out_dir: str,
    sanitize_first: bool = True,
    compression: str = "snappy",
    row_group_bytes: int = 128 * 1024 * 1024,
    target_files: int = 1,
    overwrite: bool = False,
) -> None:
    """A5 parity (aggregate_parquet.py:103-154): N parquet files → 1 (or
    ``target_files``), optional sanitize pass, selectable codec, row-group
    sizing. The reference streams 250k-row batches into 250k-row row
    groups; Spark's writer sizes row groups by bytes (parquet.block.size),
    so the knob is expressed in bytes. At 100 TB this runs per
    partition-range (many tasks), not coalesce(1) — the single-file form
    mirrors the reference's one-output-file CLI."""
    from iceberg_metadata_pipeline_spark.ingest.discover import read_parquet_recursive

    df = read_parquet_recursive(spark, in_dir)
    if sanitize_first:
        df = sanitize(df)
    (
        df.coalesce(target_files)
        .write.mode("overwrite" if overwrite else "errorifexists")
        .option("compression", compression)
        .option("parquet.block.size", str(row_group_bytes))
        .parquet(out_dir)
    )
