"""Round 11: delete-aware O(churn) incremental export (r10 VERDICT #2),
distributed deletion-vector materialization plumbing (r10 VERDICT #1),
and REST delete-file removal support.

Reference parity anchor: the reference's catalog is a directory any
engine writes through (entrypoint-spark.sh:85-92); these tests pin that
a delete-heavy mirror refresh costs one new manifest, not a rewrite of
table history.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from iceberg_metadata_pipeline_spark.catalog import avro_io
from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
    export_iceberg_table,
    read_iceberg_table,
)
from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog


@pytest.fixture()
def table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table(
        "r11", "t", T.StructType([T.StructField("id", T.LongType(), True)])
    ).refresh()
    t.append_dataframe(spark.range(4).selectExpr("id").coalesce(1))
    t.append_dataframe(spark.range(10, 14).selectExpr("id").coalesce(1))
    return cat, t


def _write_delete(path: str, rows: list[tuple[str, int]]) -> str:
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([r[0] for r in rows], pa.string()),
                "pos": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        path,
    )
    return path


def _manifest_paths(dest: str) -> dict[str, set[str]]:
    """Current snapshot's manifest paths split by content kind."""
    info = read_iceberg_table(dest, decode_dvs=False)
    with open(info.metadata_path) as fh:
        import json

        md = json.load(fh)
    snap = next(
        s
        for s in md["snapshots"]
        if int(s["snapshot-id"]) == int(md["current-snapshot-id"])
    )
    _, _, entries = avro_io.read_container(snap["manifest-list"])
    out = {"data": set(), "deletes": set()}
    for e in entries:
        kind = "deletes" if int(e.get("content") or 0) == 1 else "data"
        out[kind].add(e["manifest_path"])
    return out


def test_incremental_export_delete_commit_one_new_manifest(
    spark, table, tmp_path
):
    """A delete-mor commit re-exports as ONE new delete manifest with
    prior manifests re-referenced verbatim — O(churn), not O(table)."""
    cat, t = table
    dest = str(tmp_path / "ice")
    export_iceberg_table(t, dest)
    before = _manifest_paths(dest)
    n_manifests_before = len(
        glob.glob(os.path.join(dest, "metadata", "*-[md]0.avro"))
    )

    files = sorted(f.path for f in t.snapshot_files())
    victim = int(pq.read_table(files[0])["id"][1].as_py())
    dp = _write_delete(str(tmp_path / "d1.parquet"), [(files[0], 1)])
    t.add_position_delete_files([dp])

    export_iceberg_table(t, dest)
    after = _manifest_paths(dest)
    # prior DATA manifest re-referenced byte-for-byte (same path)
    assert after["data"] == before["data"]
    # exactly one new delete manifest
    assert len(after["deletes"]) == 1
    n_manifests_after = len(
        glob.glob(os.path.join(dest, "metadata", "*-[md]0.avro"))
    )
    assert n_manifests_after == n_manifests_before + 1

    # and the mirror serves the deleted state
    from iceberg_metadata_pipeline_spark.ingest.pyice_source import register

    register(spark)
    back = spark.read.format("pyice").load(dest)
    assert sorted(r.id for r in back.collect()) == sorted(
        {0, 1, 2, 3, 10, 11, 12, 13} - {victim}
    )

    # a SECOND delete commit stacks one more delete manifest, prior
    # delete manifest re-referenced
    victim2 = int(pq.read_table(files[1])["id"][0].as_py())
    dp2 = _write_delete(str(tmp_path / "d2.parquet"), [(files[1], 0)])
    t.add_position_delete_files([dp2])
    export_iceberg_table(t, dest)
    third = _manifest_paths(dest)
    assert third["data"] == before["data"]
    assert after["deletes"].issubset(third["deletes"])
    assert len(third["deletes"]) == 2
    back2 = spark.read.format("pyice").load(dest)
    assert sorted(r.id for r in back2.collect()) == sorted(
        {0, 1, 2, 3, 10, 11, 12, 13} - {victim, victim2}
    )


def test_incremental_export_interleaved_append_and_delete(
    spark, table, tmp_path
):
    """Append + delete between refreshes land in ONE snapshot carrying
    one new data manifest and one new delete manifest, with the TABLE's
    sequence numbers (equality-delete ordering stays correct)."""
    cat, t = table
    dest = str(tmp_path / "ice")
    export_iceberg_table(t, dest)
    before = _manifest_paths(dest)

    files = sorted(f.path for f in t.snapshot_files())
    victim = int(pq.read_table(files[0])["id"][0].as_py())
    dp = _write_delete(str(tmp_path / "d.parquet"), [(files[0], 0)])
    t.add_position_delete_files([dp])
    t.append_dataframe(spark.range(20, 22).selectExpr("id").coalesce(1))

    export_iceberg_table(t, dest)
    after = _manifest_paths(dest)
    assert before["data"].issubset(after["data"])
    assert len(after["data"]) == len(before["data"]) + 1
    assert len(after["deletes"]) == 1

    from iceberg_metadata_pipeline_spark.ingest.pyice_source import register

    register(spark)
    back = spark.read.format("pyice").load(dest)
    assert sorted(r.id for r in back.collect()) == sorted(
        {0, 1, 2, 3, 10, 11, 12, 13, 20, 21} - {victim}
    )

    # the new data manifest carries the TABLE's sequence numbers, not
    # mirror-local ones (the append seq must exceed the delete seq)
    info = read_iceberg_table(dest, decode_dvs=False)
    t_files = {os.path.abspath(f.path): int(f.seq or 0) for f in t.snapshot_files()}
    for f in info.files:
        assert int(f.seq) == t_files[os.path.abspath(f.path)]


def test_incremental_export_compaction_falls_back_to_full(
    spark, table, tmp_path
):
    """Compaction (rewrites files, clears deletes) cannot be expressed
    as churn — the full path runs and serves the folded state."""
    cat, t = table
    dest = str(tmp_path / "ice")
    export_iceberg_table(t, dest)
    files = sorted(f.path for f in t.snapshot_files())
    dp = _write_delete(str(tmp_path / "d.parquet"), [(files[0], 0)])
    victim = int(pq.read_table(files[0])["id"][0].as_py())
    t.add_position_delete_files([dp])
    export_iceberg_table(t, dest)
    t.rewrite_data_files()  # folds deletes in, rewrites the file set
    export_iceberg_table(t, dest)
    info = read_iceberg_table(dest, decode_dvs=False)
    assert not info.delete_files  # folded
    from iceberg_metadata_pipeline_spark.ingest.pyice_source import register

    register(spark)
    back = spark.read.format("pyice").load(dest)
    assert sorted(r.id for r in back.collect()) == sorted(
        {0, 1, 2, 3, 10, 11, 12, 13} - {victim}
    )


def test_incremental_export_noop_with_live_deletes(spark, table, tmp_path):
    """An UNCHANGED re-export of a delete-carrying table is a no-op
    (same metadata path — the delete diff proves nothing moved)."""
    cat, t = table
    dest = str(tmp_path / "ice")
    files = sorted(f.path for f in t.snapshot_files())
    dp = _write_delete(str(tmp_path / "d.parquet"), [(files[0], 0)])
    t.add_position_delete_files([dp])
    p1 = export_iceberg_table(t, dest)
    p2 = export_iceberg_table(t, dest)
    assert p1 == p2
