"""Apache Hudi COW format (catalog/hudi_format.py): timeline state
machine + naming quirks, snapshot/time-travel/incremental replay,
replacecommit semantics, metadata-only export/import round-trip,
partition carry-through, clean + rollback table services, and the
documented refusal paths (MOR, put-if-absent timeline)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
    begin_instant,
    clean_hudi,
    complete_instant,
    completed_instants,
    create_hudi_table,
    export_hudi_table,
    import_hudi_table,
    incremental_files,
    list_timeline,
    new_instant_time,
    read_hudi_table,
    read_properties,
    rollback_hudi,
)
from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog


@pytest.fixture()
def metacat_table(spark, tmp_path):
    catalog = Catalog(spark, str(tmp_path / "wh"))
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )
    t = catalog.create_table("nyc", "hudi_rt", st)
    df = spark.createDataFrame([(i, f"n{i}", i / 4.0) for i in range(20)], schema=st)
    t.append_dataframe(df)
    t.append_dataframe(df.selectExpr("id + 100 as id", "name", "score"))
    return catalog, t.refresh()


def test_instant_times_strictly_monotonic():
    ts = [new_instant_time() for _ in range(50)]
    assert all(len(t) == 17 and t.isdigit() for t in ts)
    assert ts == sorted(ts) and len(set(ts)) == 50


def test_timeline_state_machine_and_commit_inflight_quirk(tmp_path):
    loc = str(tmp_path / "h")
    create_hudi_table(loc, "t", [])
    t = begin_instant(loc, "commit")
    hoodie = os.path.join(loc, ".hoodie")
    # the spec quirk: commit's inflight file carries NO action name
    assert os.path.exists(os.path.join(hoodie, f"{t}.commit.requested"))
    assert os.path.exists(os.path.join(hoodie, f"{t}.inflight"))
    # not yet visible to snapshot replay
    assert completed_instants(loc) == []
    complete_instant(loc, t, "commit", {"partitionToWriteStats": {}})
    assert [i.time for i in completed_instants(loc)] == [t]
    # a non-commit action spells <t>.<action>.inflight
    t2 = begin_instant(loc, "replacecommit")
    assert os.path.exists(os.path.join(hoodie, f"{t2}.replacecommit.inflight"))
    states = {(i.time, i.action, i.state) for i in list_timeline(loc)}
    assert (t, "commit", "completed") in states
    assert (t2, "replacecommit", "requested") in states


def test_timeline_is_put_if_absent(tmp_path):
    loc = str(tmp_path / "h")
    create_hudi_table(loc, "t", [])
    t = begin_instant(loc, "commit")
    with pytest.raises(FileExistsError):
        begin_instant(loc, "commit", instant_time=t)


def test_properties_round_trip(tmp_path):
    loc = str(tmp_path / "h")
    create_hudi_table(loc, "mytable", ["a", "b"])
    props = read_properties(loc)
    assert props["hoodie.table.name"] == "mytable"
    assert props["hoodie.table.type"] == "COPY_ON_WRITE"
    assert props["hoodie.table.partition.fields"] == "a,b"
    assert props["hoodie.populate.meta.fields"] == "false"


def test_export_layout_is_spec_shaped(metacat_table, tmp_path):
    _, t = metacat_table
    dest = str(tmp_path / "hudi_mirror")
    instant = export_hudi_table(t, dest)
    # one completed commit whose write stats cover every snapshot file
    done = completed_instants(dest)
    assert [i.action for i in done] == ["commit"]
    md = json.load(open(os.path.join(dest, ".hoodie", f"{instant}.commit")))
    stats = [s for ss in md["partitionToWriteStats"].values() for s in ss]
    assert len(stats) == len(t.snapshot_files())
    assert sum(s["numWrites"] for s in stats) == 40
    for s in stats:
        # canonical base-file naming: <fileId>_<writeToken>_<instant>.parquet
        base = os.path.basename(s["path"])
        fid, token, rest = base.split("_", 2)
        assert rest == f"{instant}.parquet" and token == "0-1-0"
        assert s["fileId"] == fid
        link = os.path.join(dest, s["path"])
        # symlinked, not copied: zero data bytes moved
        assert os.path.islink(link) and os.path.exists(link)
    # unpartitioned table → partition-path "" with a metadata marker
    assert os.path.exists(os.path.join(dest, ".hoodie_partition_metadata"))


def test_round_trip_scan_matches(spark, metacat_table, tmp_path):
    _, t = metacat_table
    dest = str(tmp_path / "hudi_m2")
    export_hudi_table(t, dest)
    t2 = import_hudi_table(
        spark, Catalog(spark, str(tmp_path / "wh2")), dest, "nyc", "hudi_in"
    )
    a = sorted(r["id"] for r in t.scan().collect())
    b = sorted(r["id"] for r in t2.scan().collect())
    assert a == b and len(a) == 40
    assert t2.schema == t.schema


def test_incremental_export_commit_per_churn(spark, metacat_table, tmp_path):
    _, t = metacat_table
    dest = str(tmp_path / "hudi_m3")
    i1 = export_hudi_table(t, dest)
    # unchanged snapshot → nothing new committed
    assert export_hudi_table(t, dest) == i1
    assert len(completed_instants(dest)) == 1
    # append → exactly one new commit holding only the new files
    st = t.schema
    df = spark.createDataFrame([(1000, "x", 0.5)], schema=st)
    t.append_dataframe(df)
    t = t.refresh()
    i2 = export_hudi_table(t, dest)
    assert i2 > i1
    done = completed_instants(dest)
    assert [i.action for i in done] == ["commit", "commit"]
    inc = incremental_files(dest, begin=i1)
    assert sum(b.num_records for b in inc) == 1
    state = read_hudi_table(dest)
    assert sum(b.num_records for b in state.files.values()) == 41


def test_compaction_reexport_emits_replacecommit(spark, metacat_table, tmp_path):
    _, t = metacat_table
    dest = str(tmp_path / "hudi_m4")
    export_hudi_table(t, dest)
    n_before = len(read_hudi_table(dest).files)
    t.rewrite_data_files(target_num_files=1)
    t = t.refresh()
    export_hudi_table(t, dest)
    actions = [i.action for i in completed_instants(dest)]
    assert actions == ["commit", "replacecommit", "commit"]
    state = read_hudi_table(dest)
    assert len(state.files) == 1 and n_before > 1
    assert sum(b.num_records for b in state.files.values()) == 40


def test_time_travel_reads_old_snapshot(spark, metacat_table, tmp_path):
    _, t = metacat_table
    dest = str(tmp_path / "hudi_m5")
    i1 = export_hudi_table(t, dest)
    df = spark.createDataFrame([(2000, "y", 1.5)], schema=t.schema)
    t.append_dataframe(df)
    export_hudi_table(t.refresh(), dest)
    old = read_hudi_table(dest, instant=i1)
    new = read_hudi_table(dest)
    assert sum(b.num_records for b in old.files.values()) == 40
    assert sum(b.num_records for b in new.files.values()) == 41
    with pytest.raises(ValueError, match="no completed instant"):
        read_hudi_table(dest, instant="0" * 17)


def test_partition_carry_through(spark, tmp_path):
    catalog = Catalog(spark, str(tmp_path / "whp"))
    st = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("seg", T.StringType(), True),
        ]
    )
    t = catalog.create_table("nyc", "hudi_part", st)
    from iceberg_metadata_pipeline_spark.catalog.partitioning import PartitionField

    t.set_partition_spec([PartitionField("seg", "identity", "seg")])
    t = t.refresh()
    df = spark.createDataFrame([(i, "AB"[i % 2]) for i in range(10)], schema=st)
    t.append_dataframe(df)
    t = t.refresh()
    dest = str(tmp_path / "hudi_mp")
    export_hudi_table(t, dest)
    state = read_hudi_table(dest)
    parts = {p for (p, _fid) in state.files}
    assert parts == {"seg=A", "seg=B"}  # hive-style partition paths
    for p in parts:
        assert os.path.exists(os.path.join(dest, p, ".hoodie_partition_metadata"))
    t2 = import_hudi_table(
        spark, Catalog(spark, str(tmp_path / "whp2")), dest, "nyc", "hudi_part_in"
    )
    # partition spec + values survive: pruned scan touches only seg=A files
    assert [pf.source for pf in t2.default_spec] == ["seg"]
    rows = t2.scan().where("seg = 'A'").collect()
    assert sorted(r["k"] for r in rows) == [0, 2, 4, 6, 8]


def test_clean_retains_latest_slice(spark, metacat_table, tmp_path):
    _, t = metacat_table
    dest = str(tmp_path / "hudi_m6")
    export_hudi_table(t, dest)
    t.rewrite_data_files(target_num_files=1)
    export_hudi_table(t.refresh(), dest)
    state = read_hudi_table(dest)
    live = {os.path.realpath(b.path) for b in state.files.values()}
    doomed = clean_hudi(dest, retain_slices=1, dry_run=True)
    assert doomed and all(os.path.realpath(p) not in live for p in doomed)
    removed = clean_hudi(dest, retain_slices=1)
    assert sorted(removed) == sorted(doomed)
    # clean recorded on the timeline; snapshot unchanged
    assert [i.action for i in completed_instants(dest, ("clean",))] == ["clean"]
    after = read_hudi_table(dest)
    assert sum(b.num_records for b in after.files.values()) == 40
    # symlink targets (the original table files) were NOT touched
    assert sorted(r["id"] for r in t.refresh().scan().collect()) == sorted(
        list(range(20)) + list(range(100, 120))
    )


def test_rollback_undoes_latest_commit(spark, metacat_table, tmp_path):
    _, t = metacat_table
    dest = str(tmp_path / "hudi_m7")
    i1 = export_hudi_table(t, dest)
    df = spark.createDataFrame([(3000, "z", 9.0)], schema=t.schema)
    t.append_dataframe(df)
    i2 = export_hudi_table(t.refresh(), dest)
    with pytest.raises(ValueError, match="latest completed"):
        rollback_hudi(dest, i1)
    rollback_hudi(dest, i2)
    state = read_hudi_table(dest)
    assert sum(b.num_records for b in state.files.values()) == 40
    actions = [i.action for i in completed_instants(dest, ("rollback",))]
    assert actions == ["rollback"]


def test_unknown_table_type_refused(tmp_path):
    """MERGE_ON_READ reads are implemented (round 7, test_hudi_mor.py);
    an unrecognized table type must still refuse loudly."""
    loc = str(tmp_path / "weird")
    create_hudi_table(loc, "t", [])
    props = read_properties(loc)
    props["hoodie.table.type"] = "SOMETHING_ELSE"
    from iceberg_metadata_pipeline_spark.catalog.hudi_format import write_properties

    write_properties(loc, props)
    with pytest.raises(NotImplementedError, match="SOMETHING_ELSE"):
        read_hudi_table(loc)
