"""Iceberg spec-v3 ROW LINEAGE tests (catalog/iceberg_format.py):
format-version-3 export carries metacat's real per-file first_row_id
blocks + next-row-id; the reader inherits null ids per spec; MOR deletes
never renumber survivors; unlineaged files refuse v3 export loudly."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from iceberg_metadata_pipeline_spark.catalog import avro_io
from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
    export_iceberg_table,
    manifest_entry_schema,
    manifest_list_schema,
    read_iceberg_table,
    read_iceberg_with_lineage,
)
from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog

from tests.test_iceberg_format import _append_mor_delete_snapshot


def _small_table(spark, tmp_path, rows=10):
    catalog = Catalog(spark, str(tmp_path / "wh-v3"))
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("cat", T.StringType(), True),
        ]
    )
    t = catalog.create_table("nyc", "v3_src", st)
    t = t.refresh()
    t.append_dataframe(
        spark.sql(
            f"SELECT id, IF(id % 3 = 0, 'b', 'a') AS cat FROM RANGE({rows})"
        ).repartition(2)
    )
    return t.refresh()


def test_v3_export_roundtrip_dense_ids(spark, tmp_path):
    t = _small_table(spark, tmp_path)
    dest = str(tmp_path / "ice-v3")
    meta_path = export_iceberg_table(t, dest, format_version=3)
    md = json.load(open(meta_path))
    assert md["format-version"] == 3
    assert md["next-row-id"] == 10
    assert md["snapshots"][0]["first-row-id"] == 0

    rows = read_iceberg_with_lineage(spark, dest).collect()
    assert sorted(r._row_id for r in rows) == list(range(10))
    assert {r._last_updated_sequence_number for r in rows} == {1}
    # _row_id is consistent with the table's own lineage: the id of each
    # row equals its file's first_row_id + position, so re-reading gives
    # the identical assignment
    again = {r.id: r._row_id for r in read_iceberg_with_lineage(spark, dest).collect()}
    assert {r.id: r._row_id for r in rows} == again


def test_v3_survivors_keep_ids_under_mor(spark, tmp_path):
    t = _small_table(spark, tmp_path)
    dest = str(tmp_path / "ice-v3-mor")
    meta_path = export_iceberg_table(t, dest, format_version=3)
    before = {r.id: r._row_id for r in read_iceberg_with_lineage(spark, dest).collect()}

    info = read_iceberg_table(dest)
    victim = sorted(info.files, key=lambda f: f.path)[0]
    _append_mor_delete_snapshot(meta_path, pos_deletes=[(victim.path, 0), (victim.path, 1)])

    after = {r.id: r._row_id for r in read_iceberg_with_lineage(spark, dest).collect()}
    killed_ids = {victim.first_row_id, victim.first_row_id + 1}
    assert set(before.values()) - {v for k, v in after.items()} == killed_ids
    for k, v in after.items():
        assert before[k] == v, "survivor was renumbered"


def test_v3_reader_inherits_null_first_row_id(tmp_path):
    """Spec v3 inheritance: ADDED entries with null first_row_id take the
    manifest's first_row_id plus the record counts of prior ADDED files."""
    meta = tmp_path / "tbl" / "metadata"
    meta.mkdir(parents=True)
    schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [{"id": 1, "name": "id", "required": True, "type": "long"}],
    }
    mpath = str(meta / "m0.avro")
    mk = lambda p, rc: {
        "status": 1,
        "snapshot_id": 5,
        "sequence_number": 1,
        "data_file": {
            "content": 0,
            "file_path": p,
            "file_format": "PARQUET",
            "partition": {},
            "record_count": rc,
            "file_size_in_bytes": 1,
        },
    }
    avro_io.write_container(
        mpath,
        manifest_entry_schema([], format_version=3),
        [mk("/data/a.parquet", 4), mk("/data/b.parquet", 6)],
    )
    mlist = str(meta / "snap-5.avro")
    avro_io.write_container(
        mlist,
        manifest_list_schema(format_version=3),
        [
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 5,
                "added_files_count": 2,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": 10,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "first_row_id": 100,
            }
        ],
    )
    md = {
        "format-version": 3,
        "table-uuid": "0" * 32,
        "location": str(tmp_path / "tbl"),
        "last-updated-ms": 0,
        "last-column-id": 1,
        "current-schema-id": 0,
        "schemas": [schema],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "next-row-id": 110,
        "current-snapshot-id": 5,
        "snapshots": [
            {
                "snapshot-id": 5,
                "sequence-number": 1,
                "first-row-id": 100,
                "timestamp-ms": 0,
                "manifest-list": mlist,
            }
        ],
    }
    (meta / "v1.metadata.json").write_text(json.dumps(md))
    info = read_iceberg_table(str(tmp_path / "tbl"))
    by_path = {f.path: f.first_row_id for f in info.files}
    assert by_path == {"/data/a.parquet": 100, "/data/b.parquet": 104}


def test_v3_inheritance_skips_explicit_first_row_ids(tmp_path):
    """Spec: only NULL first_row_id entries consume from the manifest's
    inherited range — an explicit entry keeps its id AND does not advance
    the running counter, so a spec-valid external manifest mixing
    explicit and null entries assigns the null ones contiguous ids from
    the manifest's first_row_id (not shifted by the explicit ones)."""
    meta = tmp_path / "tbl" / "metadata"
    meta.mkdir(parents=True)
    schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [{"id": 1, "name": "id", "required": True, "type": "long"}],
    }
    mpath = str(meta / "m0.avro")

    def mk(p, rc, fr=None):
        df = {
            "content": 0,
            "file_path": p,
            "file_format": "PARQUET",
            "partition": {},
            "record_count": rc,
            "file_size_in_bytes": 1,
        }
        if fr is not None:
            df["first_row_id"] = fr
        return {
            "status": 1,
            "snapshot_id": 5,
            "sequence_number": 1,
            "data_file": df,
        }

    avro_io.write_container(
        mpath,
        manifest_entry_schema([], format_version=3),
        [
            mk("/data/a.parquet", 4, fr=500),
            mk("/data/b.parquet", 6),
            mk("/data/c.parquet", 2, fr=900),
            mk("/data/d.parquet", 3),
        ],
    )
    mlist = str(meta / "snap-5.avro")
    avro_io.write_container(
        mlist,
        manifest_list_schema(format_version=3),
        [
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 5,
                "added_files_count": 4,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": 15,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "first_row_id": 100,
            }
        ],
    )
    md = {
        "format-version": 3,
        "table-uuid": "0" * 32,
        "location": str(tmp_path / "tbl"),
        "last-updated-ms": 0,
        "last-column-id": 1,
        "current-schema-id": 0,
        "schemas": [schema],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "next-row-id": 1000,
        "current-snapshot-id": 5,
        "snapshots": [
            {
                "snapshot-id": 5,
                "sequence-number": 1,
                "first-row-id": 100,
                "timestamp-ms": 0,
                "manifest-list": mlist,
            }
        ],
    }
    (meta / "v1.metadata.json").write_text(json.dumps(md))
    info = read_iceberg_table(str(tmp_path / "tbl"))
    by_path = {f.path: f.first_row_id for f in info.files}
    assert by_path == {
        "/data/a.parquet": 500,  # explicit, untouched
        "/data/b.parquet": 100,  # first null entry: manifest base
        "/data/c.parquet": 900,  # explicit, untouched
        "/data/d.parquet": 106,  # second null: base + b's 6 rows only
    }


def test_v3_export_refuses_unlineaged_files(spark, tmp_path):
    t = _small_table(spark, tmp_path)
    snap = t.current_snapshot
    files = t.snapshot_files(snap["snapshot_id"])
    files[0].first_row_id = None  # legacy/pre-lineage file
    t.snapshot_files = lambda sid: files  # instance shadow
    import pytest

    with pytest.raises(ValueError, match="first_row_id"):
        export_iceberg_table(t, str(tmp_path / "refused"), format_version=3)
    # v2 export of the same table still works (lineage not encoded there)
    export_iceberg_table(t, str(tmp_path / "v2ok"))
