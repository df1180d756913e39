"""Round 10: REST row-level delete machinery at the warehouse + format
layers — Table.add_position_delete_files (foreign position-delete
ingestion), Table.remove_snapshots (explicit-set expiry),
replace_files add-side validation + pure-removal-with-live-deletes,
and export_iceberg_table's content=1 delete manifests (the v2 spec
encoding of metacat's position entries)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
    export_iceberg_table,
    import_iceberg_table,
    read_iceberg_table,
)
from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
from iceberg_metadata_pipeline_spark.catalog.partitioning import PartitionField


@pytest.fixture()
def table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table(
        "r10", "t", T.StructType([T.StructField("id", T.LongType(), True)])
    ).refresh()
    t.append_dataframe(spark.range(4).selectExpr("id").coalesce(1))
    t.append_dataframe(
        spark.range(10, 14).selectExpr("id").coalesce(1)
    )
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


def test_add_position_delete_files_applies_and_validates(spark, table, tmp_path):
    cat, t = table
    files = sorted(f.path for f in t.snapshot_files())
    victim_file = files[0]
    victims = {int(pq.read_table(victim_file)["id"][i].as_py()) for i in (0, 2)}
    dp = _write_delete(str(tmp_path / "d.parquet"), [(victim_file, 0), (victim_file, 2)])
    t.add_position_delete_files([dp])
    got = sorted(r.id for r in t.scan().collect())
    assert got == sorted({0, 1, 2, 3, 10, 11, 12, 13} - victims)

    # file: URI form normalizes to the same key
    other = files[1]
    v2 = int(pq.read_table(other)["id"][1].as_py())
    dp2 = _write_delete(str(tmp_path / "d2.parquet"), [("file://" + other, 1)])
    t.add_position_delete_files([dp2])
    assert sorted(r.id for r in t.scan().collect()) == sorted(
        {0, 1, 2, 3, 10, 11, 12, 13} - victims - {v2}
    )

    # an unknown referenced file refuses with nothing applied
    before = t.version
    dp3 = _write_delete(str(tmp_path / "d3.parquet"), [("/nope/gone.parquet", 0)])
    with pytest.raises(ValueError, match="not live"):
        t.add_position_delete_files([dp3])
    assert t.version == before
    with pytest.raises(ValueError, match="no delete files"):
        t.add_position_delete_files([])


def test_replace_files_add_side_validation(spark, table):
    """Advisor finding (r10): an added path already live would
    double-register the file; the add side now validates like the
    removed side."""
    cat, t = table
    entries = t.snapshot_files()
    with pytest.raises(ValueError, match="already live"):
        t.replace_files([entries[0]], set())
    # ...unless the same commit removes it (a rewrite-in-place)
    t.replace_files([entries[0]], {entries[0].path})
    assert sorted(r.id for r in t.scan().collect()) == sorted(
        [0, 1, 2, 3, 10, 11, 12, 13]
    )


def test_replace_files_pure_removal_with_live_deletes(spark, table, tmp_path):
    """Pure removals are safe under live MOR deletes (idempotent
    anti-joins can't resurrect rows) — only ADD-carrying replaces
    refuse."""
    cat, t = table
    files = sorted(f.path for f in t.snapshot_files())
    dp = _write_delete(str(tmp_path / "d.parquet"), [(files[0], 0)])
    t.add_position_delete_files([dp])
    survivors = {int(v) for v in pq.read_table(files[1])["id"].to_pylist()}
    t.replace_files([], {files[0]}, operation="delete")
    assert {r.id for r in t.scan().collect()} == survivors
    # adds still refuse while deletes are live
    entry = next(f for f in t.snapshot_files())
    with pytest.raises(ValueError, match="row-level deletes"):
        t.replace_files([entry], {entry.path})


def test_remove_snapshots_explicit_set(spark, table):
    cat, t = table
    sids = [s["snapshot_id"] for s in t.meta["snapshots"]]
    cur = t.meta["current_snapshot_id"]
    with pytest.raises(ValueError, match="CURRENT"):
        t.remove_snapshots([cur])
    with pytest.raises(ValueError, match="unknown"):
        t.remove_snapshots([424242])
    t.create_tag("keep", sids[0])
    with pytest.raises(ValueError, match="protected"):
        t.remove_snapshots([sids[0]])
    t.drop_ref("keep")
    old = sids[0]
    t.remove_snapshots([old])
    assert old not in {s["snapshot_id"] for s in t.meta["snapshots"]}
    with pytest.raises(ValueError):
        t.scan(snapshot_id=old).collect()
    # survivors self-contained: current scan unchanged
    assert sorted(r.id for r in t.scan().collect()) == [
        0, 1, 2, 3, 10, 11, 12, 13,
    ]
    assert t.remove_snapshots([]) == []


def test_export_position_deletes_roundtrip(spark, table, tmp_path):
    """Export encodes live position entries as a content=1 manifest the
    format reader (and pyice) applies; predicate/equality entries keep
    refusing; v3 refuses (DVs not minted)."""
    cat, t = table
    files = sorted(f.path for f in t.snapshot_files())
    victim = int(pq.read_table(files[0])["id"][3].as_py())
    dp = _write_delete(str(tmp_path / "d.parquet"), [(files[0], 3)])
    t.add_position_delete_files([dp])
    expect = sorted({0, 1, 2, 3, 10, 11, 12, 13} - {victim})

    dest = str(tmp_path / "ice")
    export_iceberg_table(t, dest)
    info = read_iceberg_table(dest)
    assert [d for d in info.delete_files if d.content == 1]
    # pyice applies the delete manifest
    from iceberg_metadata_pipeline_spark.ingest.pyice_source import register

    register(spark)
    back = spark.read.format("pyice").load(dest)
    assert sorted(r.id for r in back.collect()) == expect
    # import materializes live rows (deletes folded in)
    cat2 = Catalog(spark, str(tmp_path / "wh2"))
    t2 = import_iceberg_table(spark, cat2, dest, "r10", "imported")
    assert sorted(r.id for r in t2.scan().collect()) == expect

    # v3 export now MINTS deletion vectors (see
    # test_v3_export_mints_deletion_vectors) — sanity: it round-trips
    export_iceberg_table(t, str(tmp_path / "ice3"), format_version=3)
    back3 = spark.read.format("pyice").load(str(tmp_path / "ice3"))
    assert sorted(r.id for r in back3.collect()) == expect

    # predicate deletes MATERIALIZE at export (round 11): the predicate
    # runs once, distributed, and its matched (file, pos) pairs ride a
    # position-delete manifest — the refusal is gone
    t.delete_where_mor("id = 0")
    export_iceberg_table(t, str(tmp_path / "ice4"))
    back4 = spark.read.format("pyice").load(str(tmp_path / "ice4"))
    assert sorted(r.id for r in back4.collect()) == sorted(
        set(expect) - {0}
    )
    # and v3 folds the materialized predicate into minted DVs
    export_iceberg_table(t, str(tmp_path / "ice5"), format_version=3)
    back5 = spark.read.format("pyice").load(str(tmp_path / "ice5"))
    assert sorted(r.id for r in back5.collect()) == sorted(
        set(expect) - {0}
    )


def test_export_position_deletes_partitioned_extra_spec(spark, tmp_path):
    """Partitioned tables export cross-partition delete files under an
    extra unpartitioned spec (spec-id 1)."""
    import json

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table(
        "r10",
        "p",
        T.StructType(
            [
                T.StructField("id", T.LongType(), True),
                T.StructField("g", T.StringType(), True),
            ]
        ),
        partition_spec=[PartitionField("g", "identity")],
    ).refresh()
    t.append_dataframe(
        spark.sql("SELECT id, IF(id % 2 = 0, 'a', 'b') AS g FROM RANGE(8)")
    )
    files = sorted(f.path for f in t.snapshot_files())
    victim = int(pq.read_table(files[0])["id"][0].as_py())
    dp = _write_delete(str(tmp_path / "d.parquet"), [(files[0], 0)])
    t.add_position_delete_files([dp])

    dest = str(tmp_path / "ice")
    meta_path = export_iceberg_table(t, dest)
    md = json.load(open(meta_path))
    assert {s["spec-id"] for s in md["partition-specs"]} == {0, 1}
    assert md["partition-specs"][1]["fields"] == []
    info = read_iceberg_table(dest)
    assert [d for d in info.delete_files if d.content == 1]
    from iceberg_metadata_pipeline_spark.ingest.pyice_source import register

    register(spark)
    back = spark.read.format("pyice").load(dest)
    assert sorted(r.id for r in back.collect()) == sorted(set(range(8)) - {victim})


def test_add_foreign_equality_deletes_and_export(spark, table, tmp_path):
    """Round 10 second wave: foreign equality-delete files map onto
    metacat's equality entries (one atomic commit with any position
    files), and the export encodes them as content=2 delete files with
    equality_ids — pyice applies them on read."""
    cat, t = table
    # foreign engine writes an equality-delete parquet keyed on id
    eq = str(tmp_path / "eq.parquet")
    pq.write_table(pa.table({"id": pa.array([1, 12], pa.int64())}), eq)
    files = sorted(f.path for f in t.snapshot_files())
    pos = _write_delete(str(tmp_path / "p.parquet"), [(files[0], 0)])
    v0 = int(pq.read_table(files[0])["id"][0].as_py())
    before = t.version
    t.add_foreign_delete_files([pos], [(["id"], [eq])])
    assert t.version == before + 1  # ONE commit for both shapes
    expect = sorted({0, 1, 2, 3, 10, 11, 12, 13} - {1, 12, v0})
    assert sorted(r.id for r in t.scan().collect()) == expect

    # unknown key column refuses with nothing applied
    with pytest.raises(ValueError, match="not in the table"):
        t.add_foreign_delete_files([], [(["ghost"], [eq])])

    # export encodes BOTH delete kinds; pyice round-trips
    dest = str(tmp_path / "ice")
    export_iceberg_table(t, dest)
    info = read_iceberg_table(dest)
    contents = sorted(d.content for d in info.delete_files)
    assert 1 in contents and 2 in contents
    eq_entry = next(d for d in info.delete_files if d.content == 2)
    assert eq_entry.equality_cols == ["id"]
    from iceberg_metadata_pipeline_spark.ingest.pyice_source import register

    register(spark)
    back = spark.read.format("pyice").load(dest)
    assert sorted(r.id for r in back.collect()) == expect
    # import materializes the same live rows
    cat2 = Catalog(spark, str(tmp_path / "wh2"))
    t2 = import_iceberg_table(spark, cat2, dest, "r10", "imported_eq")
    assert sorted(r.id for r in t2.scan().collect()) == expect


def test_equality_delete_sequence_semantics_roundtrip(spark, table, tmp_path):
    """Iceberg's equality rule: a delete applies only to files with
    STRICTLY LOWER sequence. Rows appended AFTER the equality delete
    must survive — in metacat scans AND through the export → pyice
    round-trip (the exported delete entry carries its commit seq)."""
    cat, t = table
    eq = str(tmp_path / "eq.parquet")
    pq.write_table(pa.table({"id": pa.array([2, 777], pa.int64())}), eq)
    t.add_foreign_delete_files([], [(["id"], [eq])])
    # id=2 dead; now APPEND a new file that re-introduces id=2 and 777
    t.append_dataframe(
        spark.createDataFrame([(2,), (777,)], "id long").coalesce(1)
    )
    expect = sorted({0, 1, 3, 10, 11, 12, 13} | {2, 777})
    assert sorted(r.id for r in t.scan().collect()) == expect

    dest = str(tmp_path / "ice")
    export_iceberg_table(t, dest)
    from iceberg_metadata_pipeline_spark.ingest.pyice_source import register

    register(spark)
    back = spark.read.format("pyice").load(dest)
    assert sorted(r.id for r in back.collect()) == expect


def test_equality_delete_scrambled_names_resolve_by_field_id(spark, table, tmp_path):
    """Round 10 (r11 candidate #4 closed same round): an equality-delete
    file whose PARQUET column names are arbitrary but whose columns
    carry the posted equality_ids resolves BY FIELD ID (names are not
    contractual per the spec); an id-less file still resolves by name;
    one matching neither refuses with nothing applied."""
    cat, t = table
    files = sorted(f.path for f in t.snapshot_files())

    # scrambled-name file with field id 7: delete ids 3 and 13
    scrambled = str(tmp_path / "weird.parquet")
    pq.write_table(
        pa.table(
            {"zz9": pa.array([3, 13], pa.int64())},
            schema=pa.schema(
                [pa.field("zz9", pa.int64(),
                          metadata={b"PARQUET:field_id": b"7"})]
            ),
        ),
        scrambled,
    )
    # id-less name-matching file: delete id 11
    named = str(tmp_path / "named.parquet")
    pq.write_table(pa.table({"id": pa.array([11], pa.int64())}), named)

    t.add_foreign_delete_files(
        [], [(["id"], [scrambled, named], [7])]
    )
    assert sorted(r.id for r in t.scan().collect()) == [0, 1, 2, 10, 12]

    # a file resolving neither way refuses BEFORE anything commits
    neither = str(tmp_path / "neither.parquet")
    pq.write_table(pa.table({"bogus": pa.array([1], pa.int64())}), neither)
    before = t.version
    with pytest.raises(ValueError, match="neither"):
        t.add_foreign_delete_files([], [(["id"], [neither], [7])])
    assert t.version == before


def test_v3_export_mints_deletion_vectors(spark, table, tmp_path):
    """v3 export of a position-delete table mints PUFFIN deletion
    vectors (one blob per referenced file, manifest entries pinning
    content_offset/referenced_data_file) — and the pyice read applies
    them."""
    cat, t = table
    files = sorted(f.path for f in t.snapshot_files())
    victims = {
        int(pq.read_table(files[0])["id"][1].as_py()),
        int(pq.read_table(files[1])["id"][2].as_py()),
    }
    dp = _write_delete(
        str(tmp_path / "d.parquet"), [(files[0], 1), (files[1], 2)]
    )
    t.add_position_delete_files([dp])
    expect = sorted({0, 1, 2, 3, 10, 11, 12, 13} - victims)

    dest = str(tmp_path / "ice3")
    export_iceberg_table(t, dest, format_version=3)
    info = read_iceberg_table(dest)
    dv_entries = [d for d in info.delete_files if d.is_dv]
    assert len(dv_entries) == 2  # one per referenced data file
    for d in dv_entries:
        assert d.content == 1 and d.content_offset is not None
        assert d.referenced_data_file in files
    from iceberg_metadata_pipeline_spark.ingest.pyice_source import register

    register(spark)
    back = spark.read.format("pyice").load(dest)
    assert sorted(r.id for r in back.collect()) == expect
