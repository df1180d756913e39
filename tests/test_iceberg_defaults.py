"""Iceberg v3 default-value tests: initial-default materializes for
rows whose files predate the column; files that HAVE the column keep
their values including explicit nulls; v2 and non-primitive refusals."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from iceberg_metadata_pipeline_spark.catalog import avro_io
from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
    add_column_with_default,
    export_iceberg_table,
    manifest_entry_schema,
    manifest_list_schema,
    read_iceberg_snapshot,
    read_iceberg_table,
)
from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog


def _export_v3(spark, tmp_path, rows=6):
    catalog = Catalog(spark, str(tmp_path / "wh"))
    st = T.StructType([T.StructField("id", T.LongType(), False)])
    t = catalog.create_table("nyc", "dflt", st)
    t.append_dataframe(spark.range(rows).selectExpr("id"))
    dest = str(tmp_path / "ice")
    export_iceberg_table(t.refresh(), dest, format_version=3)
    return dest


def test_default_materializes_for_old_files(spark, tmp_path):
    dest = _export_v3(spark, tmp_path)
    add_column_with_default(dest, "status", "string", "new")
    add_column_with_default(dest, "priority", "int", 5)
    rows = read_iceberg_snapshot(spark, dest).collect()
    assert len(rows) == 6
    assert all(r.status == "new" and r.priority == 5 for r in rows)
    info = read_iceberg_table(dest)
    assert info.defaults == {"status": "new", "priority": 5}


def test_explicit_null_is_not_replaced(spark, tmp_path):
    """A file that CONTAINS the column keeps its values — including an
    explicit null — while a file that predates the column gets the
    default. The naive coalesce() would erase this distinction."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    loc = tmp_path / "mixed"
    meta = loc / "metadata"
    meta.mkdir(parents=True)
    old_file = str(loc / "old.parquet")
    new_file = str(loc / "new.parquet")
    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int64())}), old_file)
    pq.write_table(
        pa.table(
            {
                "id": pa.array([3, 4], pa.int64()),
                "status": pa.array(["x", None], pa.string()),
            }
        ),
        new_file,
    )
    schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": 1, "name": "id", "required": True, "type": "long"},
            {
                "id": 2,
                "name": "status",
                "required": False,
                "type": "string",
                "initial-default": "filled",
            },
        ],
    }
    mpath = str(meta / "m0.avro")
    mk = lambda p, rc: {
        "status": 1,
        "snapshot_id": 9,
        "sequence_number": 1,
        "data_file": {
            "content": 0,
            "file_path": p,
            "file_format": "PARQUET",
            "partition": {},
            "record_count": rc,
            "file_size_in_bytes": os.path.getsize(p),
        },
    }
    avro_io.write_container(
        mpath, manifest_entry_schema([]), [mk(old_file, 2), mk(new_file, 2)]
    )
    mlist = str(meta / "snap-9.avro")
    avro_io.write_container(
        mlist,
        manifest_list_schema(),
        [
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 9,
                "added_files_count": 2,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": 4,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        ],
    )
    md = {
        "format-version": 3,
        "table-uuid": "0" * 32,
        "location": str(loc),
        "last-updated-ms": 0,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [schema],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "current-snapshot-id": 9,
        "snapshots": [
            {
                "snapshot-id": 9,
                "sequence-number": 1,
                "timestamp-ms": 0,
                "manifest-list": mlist,
            }
        ],
    }
    (meta / "v1.metadata.json").write_text(json.dumps(md))

    got = {r.id: r.status for r in read_iceberg_snapshot(spark, str(loc)).collect()}
    assert got == {1: "filled", 2: "filled", 3: "x", 4: None}


def test_v2_and_bad_type_refusals(spark, tmp_path):
    catalog = Catalog(spark, str(tmp_path / "wh2"))
    st = T.StructType([T.StructField("id", T.LongType(), False)])
    t = catalog.create_table("nyc", "dflt2", st)
    t.append_dataframe(spark.range(3).selectExpr("id"))
    dest = str(tmp_path / "ice-v2")
    export_iceberg_table(t.refresh(), dest)  # v2
    with pytest.raises(ValueError, match="format-version 3"):
        add_column_with_default(dest, "status", "string", "x")

    dest3 = _export_v3(spark, tmp_path, rows=3)
    with pytest.raises(NotImplementedError, match="primitives"):
        add_column_with_default(dest3, "blob", "binary", "AAAA")
    with pytest.raises(ValueError, match="already exists"):
        add_column_with_default(dest3, "id", "long", 0)
