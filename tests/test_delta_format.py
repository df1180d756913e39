"""Delta Lake transaction-log format (catalog/delta_format.py): spec
compliance of the written log, replay semantics (adds/removes/
last-writer-wins metaData), checkpoints, time travel, partition
carry-through, and the documented refusal paths."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_metadata_pipeline_spark.catalog.delta_format import (
    export_delta_table,
    import_delta_table,
    latest_version,
    read_delta_table,
    write_checkpoint,
    write_commit,
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
    t = catalog.create_table("nyc", "delta_rt", st)
    df = spark.createDataFrame([(i, f"n{i}", i / 4.0) for i in range(20)], schema=st)
    t.append_dataframe(df)
    t.append_dataframe(df.selectExpr("id + 100 as id", "name", "score"))
    return catalog, t.refresh()


def test_export_log_is_spec_shaped(metacat_table, tmp_path):
    _, t = metacat_table
    dest = str(tmp_path / "delta_mirror")
    v = export_delta_table(t, dest)
    assert v == 0
    log = os.path.join(dest, "_delta_log", "00000000000000000000.json")
    actions = [json.loads(x) for x in open(log) if x.strip()]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "protocol" and kinds[1] == "metaData"
    proto = actions[0]["protocol"]
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    md = actions[1]["metaData"]
    # schemaString is Spark's own schema JSON
    assert T.StructType.fromJson(json.loads(md["schemaString"])) == t.schema
    assert md["format"]["provider"] == "parquet"
    adds = [a["add"] for a in actions if "add" in a]
    assert len(adds) == len(t.snapshot_files())
    for a in adds:
        assert os.path.isabs(a["path"]) and a["size"] > 0
    # empty shuffle partitions can legitimately produce 0-row files;
    # the TOTAL must equal the table's rows
    assert sum(json.loads(a["stats"])["numRecords"] for a in adds) == 40


def test_round_trip_scan_matches(spark, metacat_table, tmp_path):
    _, t = metacat_table
    dest = str(tmp_path / "delta_m2")
    export_delta_table(t, dest)
    t2 = import_delta_table(
        spark, Catalog(spark, str(tmp_path / "wh2")), dest, "nyc", "delta_in"
    )
    a = sorted(r["id"] for r in t.scan().collect())
    b = sorted(r["id"] for r in t2.scan().collect())
    assert a == b and len(a) == 40
    assert t2.schema == t.schema


def test_incremental_export_appends_only_churn(spark, metacat_table, tmp_path):
    _, t = metacat_table
    dest = str(tmp_path / "delta_inc")
    export_delta_table(t, dest)
    # unchanged snapshot: nothing to commit, version stays
    assert export_delta_table(t, dest) == 0
    n_before = len(t.snapshot_files())
    df = spark.createDataFrame([(500, "new", 1.0)], schema=t.schema)
    t.append_dataframe(df)
    t = t.refresh()
    v = export_delta_table(t, dest)
    assert v == 1
    log = os.path.join(dest, "_delta_log", f"{1:020d}.json")
    actions = [json.loads(x) for x in open(log) if x.strip()]
    kinds = sorted(next(iter(a)) for a in actions)
    # pure append → only adds (+commitInfo), never removes or re-stated
    # metaData/protocol, and only the NEW files appear
    assert "remove" not in kinds and "metaData" not in kinds
    n_new = len(t.snapshot_files()) - n_before
    assert kinds.count("add") == n_new > 0
    state = read_delta_table(dest)
    total = sum(json.loads(a["stats"])["numRecords"] for a in state.files.values())
    assert total == 41


def test_re_export_is_overwrite_commit(spark, metacat_table, tmp_path):
    catalog, t = metacat_table
    dest = str(tmp_path / "delta_m3")
    export_delta_table(t, dest)
    t.delete_where("id >= 100")
    t = t.refresh()
    t.rewrite_data_files()
    t = t.refresh()
    v = export_delta_table(t, dest)
    assert v == 1
    state = read_delta_table(dest)
    assert state.version == 1
    n = sum(
        json.loads(a["stats"])["numRecords"] for a in state.files.values()
    )
    assert n == 20
    # time travel: version 0 still sees all 40 rows
    state0 = read_delta_table(dest, version=0)
    n0 = sum(json.loads(a["stats"])["numRecords"] for a in state0.files.values())
    assert n0 == 40


def test_replay_add_then_remove(tmp_path):
    loc = str(tmp_path / "handlog")
    schema = T.StructType([T.StructField("x", T.LongType(), True)])
    write_commit(
        loc,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "m",
                    "format": {"provider": "parquet"},
                    "schemaString": json.dumps(schema.jsonValue()),
                    "partitionColumns": [],
                }
            },
            {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
            {"add": {"path": "b.parquet", "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ],
    )
    write_commit(
        loc,
        [
            {"remove": {"path": "a.parquet", "deletionTimestamp": 1,
                        "dataChange": True}},
            {"add": {"path": "c.parquet", "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ],
    )
    state = read_delta_table(loc)
    assert sorted(state.files) == ["b.parquet", "c.parquet"]
    assert sorted(read_delta_table(loc, version=0).files) == ["a.parquet", "b.parquet"]


def test_checkpoint_replay_equals_full_replay(spark, metacat_table, tmp_path):
    _, t = metacat_table
    dest = str(tmp_path / "delta_ck")
    export_delta_table(t, dest)
    write_checkpoint(dest)
    # a post-checkpoint JSON commit must still replay on top
    extra = os.path.abspath(sorted(f.path for f in t.snapshot_files())[0])
    write_commit(
        dest,
        [{"remove": {"path": extra, "deletionTimestamp": 5, "dataChange": True}}],
    )
    assert os.path.exists(
        os.path.join(dest, "_delta_log", "_last_checkpoint")
    )
    state = read_delta_table(dest)
    assert extra not in state.files
    assert len(state.files) == len(t.snapshot_files()) - 1
    assert state.schema == t.schema


def test_import_prunes_on_partition(spark, tmp_path):
    from iceberg_metadata_pipeline_spark.catalog.partitioning import PartitionField

    catalog = Catalog(spark, str(tmp_path / "whp"))
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("cat", T.StringType(), True),
        ]
    )
    t = catalog.create_table("nyc", "part_src", st)
    t.set_partition_spec([PartitionField("cat", "identity")])
    t = t.refresh()
    t.append_dataframe(
        spark.sql("SELECT id, IF(id % 2 = 0, 'even', 'odd') AS cat FROM RANGE(10)")
    )
    t = t.refresh()
    dest = str(tmp_path / "delta_part")
    export_delta_table(t, dest)
    state = read_delta_table(dest)
    assert state.partition_columns == ["cat"]
    vals = {a["partitionValues"]["cat"] for a in state.files.values()}
    assert vals == {"even", "odd"}
    t2 = import_delta_table(
        spark, Catalog(spark, str(tmp_path / "whp2")), dest, "nyc", "part_in"
    )
    rows = sorted(r["id"] for r in t2.scan(filter="cat = 'even'").collect())
    assert rows == [0, 2, 4, 6, 8]
    # pruning metadata survived: the partition filter drops files before
    # Spark ever lists them
    from iceberg_metadata_pipeline_spark.catalog.partitioning import (
        prune_files_by_partition,
    )

    all_files = t2.snapshot_files()
    pruned = prune_files_by_partition(
        spark, all_files, t2.partition_specs, t2._schema_types(), "cat = 'even'"
    )
    assert 0 < len(pruned) < len(all_files)


def test_malformed_dv_descriptor_fails_loudly(tmp_path):
    """'u' vectors are supported now (round 7) — a descriptor whose
    pathOrInlineDv cannot even carry the 20-char uuid must still fail
    the replay loudly rather than read the table as undeleted."""
    loc = str(tmp_path / "dvlog")
    schema = T.StructType([T.StructField("x", T.LongType(), True)])
    write_commit(
        loc,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "m",
                    "format": {"provider": "parquet"},
                    "schemaString": json.dumps(schema.jsonValue()),
                    "partitionColumns": [],
                }
            },
            {
                "add": {
                    "path": "a.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                    "deletionVector": {"storageType": "u", "pathOrInlineDv": "x",
                                       "sizeInBytes": 1, "cardinality": 1},
                }
            },
        ],
    )
    with pytest.raises(ValueError, match="20-char"):
        read_delta_table(loc)


def test_refuses_unknown_reader_features(tmp_path):
    loc = str(tmp_path / "featlog")
    write_commit(
        loc,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["variantType"],
                    "writerFeatures": ["variantType"],
                }
            }
        ],
    )
    with pytest.raises(NotImplementedError, match="variantType"):
        read_delta_table(loc)


def test_refuses_version_collision(tmp_path):
    loc = str(tmp_path / "clash")
    write_commit(loc, [{"commitInfo": {"timestamp": 0}}], version=0)
    with pytest.raises(FileExistsError):
        write_commit(loc, [{"commitInfo": {"timestamp": 1}}], version=0)
    assert latest_version(loc) == 0


def test_z85_golden_and_round_trip():
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        z85_decode,
        z85_encode,
    )

    # ZeroMQ spec 32/Z85 reference vector
    assert z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert z85_decode("HelloWorld") == bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    for payload in (b"", b"abcd", bytes(range(32))):
        assert z85_decode(z85_encode(payload)) == payload
    with pytest.raises(ValueError, match="multiple of 4"):
        z85_encode(b"abc")


def test_inline_dv_applied_by_reader_and_import(spark, tmp_path):
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        attach_inline_dv,
        import_delta_table,
        read_delta_table,
    )
    from iceberg_metadata_pipeline_spark.ingest.pydelta_source import register

    # two 10-row files so multi-position vectors are meaningful
    catalog = Catalog(spark, str(tmp_path / "wh-src"))
    st = T.StructType([T.StructField("id", T.LongType(), False)])
    t = catalog.create_table("nyc", "dv_src", st).refresh()
    t.append_dataframe(spark.range(20).selectExpr("id").repartition(2))
    t = t.refresh()
    dest = str(tmp_path / "delta_dv")
    export_delta_table(t, dest)
    state = read_delta_table(dest)
    victim = sorted(
        p
        for p in state.files
        if json.loads(state.files[p]["stats"])["numRecords"] == 10
    )[0]
    import duckdb

    victim_rows = [
        r[0]
        for r in duckdb.sql(f"SELECT id FROM read_parquet('{victim}')").fetchall()
    ]
    v = attach_inline_dv(dest, victim, [0, 1])
    assert v == 1
    # replay decodes the vector; reader (pydelta) excludes the rows
    register(spark)
    got = sorted(
        r["id"] for r in spark.read.format("pydelta").load(dest).collect()
    )
    expect = sorted(set(range(20)) - set(victim_rows[:2]))
    assert got == expect
    # importer materializes (registering raw files would resurrect rows)
    t2 = import_delta_table(
        spark, Catalog(spark, str(tmp_path / "wh-dv")), dest, "nyc", "dv_in"
    )
    assert sorted(r["id"] for r in t2.scan().collect()) == expect
    # vectors accumulate: a second delete on the same file unions
    attach_inline_dv(dest, victim, [2])
    got2 = sorted(
        r["id"] for r in spark.read.format("pydelta").load(dest).collect()
    )
    assert got2 == sorted(set(range(20)) - set(victim_rows[:3]))


def _dv_table_commit(loc, dv_descriptor):
    schema = T.StructType([T.StructField("x", T.LongType(), True)])
    write_commit(
        loc,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["deletionVectors"],
                          "writerFeatures": ["deletionVectors"]}},
            {
                "metaData": {
                    "id": "m",
                    "format": {"provider": "parquet"},
                    "schemaString": json.dumps(schema.jsonValue()),
                    "partitionColumns": [],
                }
            },
            {
                "add": {
                    "path": "a.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                    "deletionVector": dv_descriptor,
                }
            },
        ],
    )


def test_unknown_dv_storage_type_refused(tmp_path):
    loc = str(tmp_path / "xdv")
    _dv_table_commit(loc, {"storageType": "x", "pathOrInlineDv": "????",
                           "sizeInBytes": 40, "cardinality": 6})
    with pytest.raises(NotImplementedError, match="storageType 'x'"):
        read_delta_table(loc)


def test_missing_dv_file_fails_at_replay(tmp_path):
    """A 'u' descriptor whose sidecar file does not exist must fail the
    replay loudly, not read the table as if nothing were deleted."""
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        z85_encode,
    )

    loc = str(tmp_path / "udv")
    enc = z85_encode(bytes(16))  # valid uuid encoding, no such file
    _dv_table_commit(loc, {"storageType": "u", "pathOrInlineDv": enc,
                           "offset": 1, "sizeInBytes": 40, "cardinality": 6})
    with pytest.raises(FileNotFoundError, match="deletion_vector_"):
        read_delta_table(loc)


def test_history_vacuum_and_log_cleanup(spark, metacat_table, tmp_path):
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        cleanup_delta_log,
        delta_history,
        vacuum_delta,
    )

    _, t = metacat_table
    dest = str(tmp_path / "delta_maint")
    export_delta_table(t, dest)
    df = spark.createDataFrame([(999, "x", 0.5)], schema=t.schema)
    for _ in range(3):
        t.append_dataframe(df)
        t = t.refresh()
        export_delta_table(t, dest)
    hist = delta_history(dest)
    assert [h["version"] for h in hist] == [3, 2, 1, 0]
    assert hist[0]["operation"] == "WRITE" and hist[0]["num_added_files"] >= 1

    # vacuum: un-referenced litter goes, referenced files stay
    litter = os.path.join(dest, "_tmp-crashed.parquet")
    open(litter, "wb").write(b"x")
    victims = vacuum_delta(dest, dry_run=True)
    assert victims == [litter] and os.path.exists(litter)
    assert vacuum_delta(dest) == [litter] and not os.path.exists(litter)

    # log cleanup: old commits go, state survives via the checkpoint
    before = read_delta_table(dest)
    removed = cleanup_delta_log(dest, keep_last=2)
    assert len(removed) == 2  # versions 0 and 1
    after = read_delta_table(dest)
    assert after.files.keys() == before.files.keys()
    assert after.schema == before.schema


def test_fuzz_checkpoint_equals_json_replay(tmp_path):
    """Invariant: state replayed through (checkpoint + tail) equals
    state replayed through JSON commits alone, over randomized
    add/remove/txn commit sequences and a random checkpoint position."""
    import random

    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        write_checkpoint,
    )

    schema = T.StructType([T.StructField("x", T.LongType(), True)])
    for seed in range(12):
        rng = random.Random(3000 + seed)
        loc = str(tmp_path / f"fz{seed}")
        write_commit(
            loc,
            [
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
                {
                    "metaData": {
                        "id": "m",
                        "format": {"provider": "parquet"},
                        "schemaString": json.dumps(schema.jsonValue()),
                        "partitionColumns": [],
                    }
                },
            ],
        )
        live: set[str] = set()
        for v in range(1, rng.randint(3, 7)):
            actions = []
            for _ in range(rng.randint(1, 4)):
                if live and rng.random() < 0.35:
                    p = rng.choice(sorted(live))
                    live.discard(p)
                    actions.append(
                        {"remove": {"path": p, "deletionTimestamp": v,
                                    "dataChange": True}}
                    )
                else:
                    p = f"f{v}-{rng.randrange(1000)}.parquet"
                    live.add(p)
                    actions.append(
                        {"add": {"path": p, "partitionValues": {}, "size": 1,
                                 "modificationTime": v, "dataChange": True}}
                    )
            if rng.random() < 0.5:
                actions.append(
                    {"txn": {"appId": "app", "version": v}}
                )
            write_commit(loc, actions)
        json_state = read_delta_table(loc)
        ckpt_v = rng.randint(0, json_state.version)
        write_checkpoint(loc, ckpt_v)
        ckpt_state = read_delta_table(loc)
        assert ckpt_state.files.keys() == json_state.files.keys(), seed
        assert ckpt_state.txns == json_state.txns, seed
        assert ckpt_state.schema == json_state.schema, seed


# ---------------------------------------------------------------------------
# Change Data Feed
# ---------------------------------------------------------------------------


def test_cdf_derives_inserts_and_deletes(spark, metacat_table, tmp_path):
    """Commits without cdc actions derive: adds read as inserts,
    removes as deletes (pre-vacuum)."""
    from iceberg_metadata_pipeline_spark.catalog.delta_format import table_changes

    _, t = metacat_table
    dest = str(tmp_path / "cdf1")
    export_delta_table(t, dest)  # v0: all adds
    df = t.scan().where("id < 10")
    t.overwrite_dataframe(df)
    t = t.refresh()
    export_delta_table(t, dest)  # v1: removes (old files) + adds (new)
    ch = table_changes(spark, dest, 1, 1)
    counts = {r["_change_type"]: r["n"] for r in
              ch.groupBy("_change_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"delete": 40, "insert": 10}
    assert set(ch.columns) >= {"id", "name", "score",
                               "_change_type", "_commit_version", "_commit_timestamp"}
    assert ch.select("_commit_version").distinct().collect()[0][0] == 1
    # full-range read sees v0's 40 inserts too
    all_ch = table_changes(spark, dest, 0)
    assert all_ch.count() == 40 + 50


def test_cdf_cdc_actions_are_authoritative(spark, tmp_path):
    """A commit carrying cdc actions must NOT have its add/remove
    re-derived (updates would double-count)."""
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        enable_cdf,
        table_changes,
        write_cdc_files,
        write_commit,
    )
    import pyspark.sql.types as T

    st = T.StructType([T.StructField("k", T.LongType()), T.StructField("v", T.StringType())])
    dest = str(tmp_path / "cdf2")
    base = spark.createDataFrame([(1, "a"), (2, "b")], schema=st)
    data_path = str(tmp_path / "d0.parquet")
    base.coalesce(1).write.parquet(data_path)
    import glob as _g, os as _os, json as _json

    f0 = _g.glob(_os.path.join(data_path, "*.parquet"))[0]
    write_commit(dest, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "t", "format": {"provider": "parquet", "options": {}},
                      "schemaString": _json.dumps(st.jsonValue()),
                      "partitionColumns": [], "configuration": {}}},
        {"add": {"path": f0, "partitionValues": {}, "size": _os.path.getsize(f0),
                 "modificationTime": 0, "dataChange": True,
                 "stats": _json.dumps({"numRecords": 2})}},
    ])
    enable_cdf(dest)
    # an UPDATE commit: cdc pre/post images + a rewritten add
    changes = spark.createDataFrame(
        [(2, "b", "update_preimage"), (2, "B", "update_postimage")],
        "k long, v string, _change_type string",
    )
    upd = spark.createDataFrame([(1, "a"), (2, "B")], schema=st)
    p1 = str(tmp_path / "d1.parquet")
    upd.coalesce(1).write.parquet(p1)
    f1 = _g.glob(_os.path.join(p1, "*.parquet"))[0]
    cdc_actions = write_cdc_files(spark, dest, changes)
    v = write_commit(dest, cdc_actions + [
        {"remove": {"path": f0, "deletionTimestamp": 1, "dataChange": True}},
        {"add": {"path": f1, "partitionValues": {}, "size": _os.path.getsize(f1),
                 "modificationTime": 0, "dataChange": True,
                 "stats": _json.dumps({"numRecords": 2})}},
    ])
    ch = table_changes(spark, dest, v, v)
    rows = sorted((r["k"], r["v"], r["_change_type"]) for r in ch.collect())
    assert rows == [(2, "B", "update_postimage"), (2, "b", "update_preimage")]
    # the cdf-enabling commit itself: metaData+protocol only, no changes
    assert table_changes(spark, dest, 1, 1).count() == 0
    # property + protocol bump landed
    state = read_delta_table(dest)
    assert state.metadata["configuration"]["delta.enableChangeDataFeed"] == "true"


def test_cdf_post_vacuum_refuses(spark, metacat_table, tmp_path):
    from iceberg_metadata_pipeline_spark.catalog.delta_format import table_changes

    _, t = metacat_table
    dest = str(tmp_path / "cdf3")
    export_delta_table(t, dest)
    import os as _os

    # simulate a vacuumed remove: point v1's remove at a gone file
    write_commit(dest, [
        {"remove": {"path": _os.path.join(dest, "gone.parquet"),
                    "deletionTimestamp": 1, "dataChange": True}},
        {"commitInfo": {"timestamp": 1, "operation": "DELETE",
                        "operationParameters": {}}},
    ])
    with pytest.raises(FileNotFoundError, match="post-vacuum"):
        table_changes(spark, dest, 1, 1).count()


# ---------------------------------------------------------------------------
# column mapping ('name' mode): metadata-only renames
# ---------------------------------------------------------------------------


def test_column_mapping_rename_is_metadata_only(spark, metacat_table, tmp_path):
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        column_mapping_mode,
        enable_column_mapping,
        physical_names,
        rename_delta_column,
        _live_rows_dataframe,
    )

    _catalog, t = metacat_table
    dest = str(tmp_path / "delta-cm")
    export_delta_table(t, dest)
    data_files_before = sorted(read_delta_table(dest).files)

    enable_column_mapping(dest)
    state = read_delta_table(dest)
    assert column_mapping_mode(state) == "name"
    assert state.protocol["minReaderVersion"] == 2

    rename_delta_column(dest, "score", "quality_score")
    state = read_delta_table(dest)
    assert [f.name for f in state.schema.fields] == ["id", "name", "quality_score"]
    # physicalName still points at the on-disk column
    assert physical_names(state)["quality_score"] == "score"
    # zero data files touched: same add set, rename was one JSON commit
    assert sorted(state.files) == data_files_before

    rows = _live_rows_dataframe(spark, state).collect()
    assert {r.id: r.quality_score for r in rows} == {
        i: (i % 100) / 4.0 for i in list(range(20)) + list(range(100, 120))
    }


def test_column_mapping_pydelta_reader_and_writer_guard(spark, metacat_table, tmp_path):
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        enable_column_mapping,
        rename_delta_column,
    )

    from iceberg_metadata_pipeline_spark.ingest.pydelta_source import (
        register as _register_pydelta,
    )

    _register_pydelta(spark)
    _catalog, t = metacat_table
    dest = str(tmp_path / "delta-cm2")
    export_delta_table(t, dest)
    enable_column_mapping(dest)
    rename_delta_column(dest, "name", "label")

    back = spark.read.format("pydelta").load(dest)
    assert set(back.columns) == {"id", "label", "score"}
    got = {r.id: r.label for r in back.collect()}
    assert got[0] == "n0" and got[119] == "n19" and len(got) == 40

    # r9: appends to a 'name'-mapped table are SERVED — the writer
    # stores PHYSICAL names in the new data file, so the read maps it
    # back like any other file (the r6 refusal is closed; see
    # test_pydelta_source.test_writer_serves_column_mapped_tables for
    # the physical-name assertions)
    spark.createDataFrame(
        [(999, "x", 0.0)], "id long, label string, score double"
    ).write.format("pydelta").mode("append").save(dest)
    back2 = spark.read.format("pydelta").load(dest)
    assert back2.count() == 41
    assert {r.label for r in back2.where("id = 999").collect()} == {"x"}


def test_column_mapping_swap_rename_reads_right_columns(spark, metacat_table, tmp_path):
    """Logical and physical namespaces are independent under the
    protocol, so a SWAP rename (name↔score via a temp name) is legal:
    after it, logical 'name' must read the bytes of physical 'score'
    and vice versa — a sequential one-at-a-time rename would clobber."""
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        _live_rows_dataframe,
        enable_column_mapping,
        physical_names,
        rename_delta_column,
    )

    _catalog, t = metacat_table
    dest = str(tmp_path / "delta-swap")
    export_delta_table(t, dest)
    enable_column_mapping(dest)
    rename_delta_column(dest, "name", "__tmp")
    rename_delta_column(dest, "score", "name")
    rename_delta_column(dest, "__tmp", "score")
    state = read_delta_table(dest)
    phys = physical_names(state)
    assert phys["name"] == "score" and phys["score"] == "name"
    rows = _live_rows_dataframe(spark, state).collect()
    by_id = {r.id: r for r in rows}
    # logical 'name' now carries the double values; logical 'score' the strings
    assert by_id[4].name == 1.0 and by_id[4].score == "n4"
    # pydelta reader agrees
    from iceberg_metadata_pipeline_spark.ingest.pydelta_source import (
        register as _register_pydelta,
    )

    _register_pydelta(spark)
    back = {r.id: r for r in spark.read.format("pydelta").load(dest).collect()}
    assert back[4].name == 1.0 and back[4].score == "n4"


def test_nested_column_mapping_round_trip(spark, tmp_path):
    """Round-8 brief item: nested-field physicalName is now SUPPORTED
    (the protocol applies it recursively). A struct-column table renamed
    at BOTH the top level and a nested level reads correctly through
    both paths — the pydelta DataSource and the importer's
    _live_rows_dataframe — with zero data files rewritten."""
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        enable_column_mapping,
        import_delta_table,
        rename_delta_column,
    )
    from iceberg_metadata_pipeline_spark.ingest.pydelta_source import (
        register as _reg,
    )

    catalog = Catalog(spark, str(tmp_path / "wh-ncm"))
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField(
                "s",
                T.StructType(
                    [
                        T.StructField("a", T.LongType(), True),
                        T.StructField("b", T.StringType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    t = catalog.create_table("nyc", "ncm", st).refresh()
    t.append_dataframe(
        spark.createDataFrame([(i, (i * 10, f"x{i}")) for i in range(6)], st)
    )
    dest = str(tmp_path / "delta-ncm")
    export_delta_table(t.refresh(), dest)
    n_files = {
        f for f in os.listdir(dest) if f.endswith(".parquet")
    }  # no rewrites expected (export is metadata-only anyway)
    enable_column_mapping(dest)
    rename_delta_column(dest, "s", "info")  # top-level
    rename_delta_column(dest, "info.a", "alpha")  # nested
    state = read_delta_table(dest)
    assert [f.name for f in state.schema.fields] == ["id", "info"]
    info = state.schema["info"]
    assert info.metadata["delta.columnMapping.physicalName"] == "s"
    nested = {f.name: f for f in info.dataType.fields}
    assert set(nested) == {"alpha", "b"}
    assert nested["alpha"].metadata["delta.columnMapping.physicalName"] == "a"
    expect = [(i, (i * 10, f"x{i}")) for i in range(6)]

    # path 1: pydelta DataSource (executor-side dict→logical rebuild)
    _reg(spark)
    back = spark.read.format("pydelta").load(dest)
    assert [f.name for f in back.schema["info"].dataType.fields] == ["alpha", "b"]
    got = sorted((r.id, (r.info.alpha, r.info.b)) for r in back.collect())
    assert got == expect

    # path 2: the format reader (importer materializes renamed tables)
    t2 = import_delta_table(
        spark, Catalog(spark, str(tmp_path / "wh-ncm2")), dest, "nyc", "ncm_in"
    )
    got2 = sorted((r.id, (r.info.alpha, r.info.b)) for r in t2.scan().collect())
    assert got2 == expect
    assert {f for f in os.listdir(dest) if f.endswith(".parquet")} == n_files

    # swap rename at the NESTED level is safe too (positional rebuild)
    rename_delta_column(dest, "info.alpha", "tmp")
    rename_delta_column(dest, "info.b", "alpha")
    rename_delta_column(dest, "info.tmp", "b")
    swapped = spark.read.format("pydelta").load(dest)
    got3 = sorted((r.id, (r.info.b, r.info.alpha)) for r in swapped.collect())
    assert got3 == expect  # b now holds the numbers, alpha the strings


def test_id_mode_column_mapping_refused(tmp_path):
    """Refusal narrows to what stays unimplemented: 'id' mode resolves
    parquet columns by field id, so name resolution must refuse."""
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        physical_names,
    )

    loc = str(tmp_path / "idcm")
    schema = T.StructType([T.StructField("a", T.LongType(), True)])
    write_commit(
        loc,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "m",
                    "format": {"provider": "parquet"},
                    "schemaString": json.dumps(schema.jsonValue()),
                    "partitionColumns": [],
                    "configuration": {"delta.columnMapping.mode": "id"},
                }
            },
        ],
    )
    with pytest.raises(NotImplementedError, match="'id'"):
        physical_names(read_delta_table(loc))


def test_rename_without_mapping_refuses(spark, metacat_table, tmp_path):
    import pytest as _pytest

    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        rename_delta_column,
    )

    _catalog, t = metacat_table
    dest = str(tmp_path / "delta-nomap")
    export_delta_table(t, dest)
    with _pytest.raises(ValueError, match="column mapping"):
        rename_delta_column(dest, "score", "s2")


def test_dv_file_container_round_trip_and_framing(tmp_path):
    """DV FILE storage format (PROTOCOL.md): version byte 1, then per
    vector [4-byte BE size][data][4-byte BE CRC-32]. Descriptors carry
    'u' + prefix + z85 uuid; resolution, offsets, checksums and
    corruption detection all verified byte-level."""
    import struct
    import zlib

    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        decode_delta_dv,
        dv_file_path,
        read_dv_from_file,
        write_dv_file,
    )

    loc = str(tmp_path / "tbl")
    vecs = [[0, 5, 9], list(range(100, 164)), [2**33, 2**33 + 7]]
    descs = write_dv_file(loc, vecs, prefix="ab")
    assert [d["cardinality"] for d in descs] == [3, 64, 2]
    assert all(d["storageType"] == "u" for d in descs)
    assert all(d["pathOrInlineDv"].startswith("ab") for d in descs)
    path = dv_file_path(loc, descs[0])
    assert os.path.basename(path).startswith("deletion_vector_")
    assert os.path.dirname(path) == os.path.join(loc, "ab")
    # all three vectors share one file, offsets strictly increasing
    assert len({dv_file_path(loc, d) for d in descs}) == 1
    assert descs[0]["offset"] == 1
    assert [read_dv_from_file(path, d["offset"], d["sizeInBytes"]) for d in descs] == [
        sorted(v) for v in vecs
    ]
    # framing bytes: version, size prefix, CRC-32 of the data
    raw = open(path, "rb").read()
    assert raw[0] == 1
    (size0,) = struct.unpack(">i", raw[1:5])
    assert size0 == descs[0]["sizeInBytes"]
    data0 = raw[5 : 5 + size0]
    (crc0,) = struct.unpack(">I", raw[5 + size0 : 9 + size0])
    assert crc0 == zlib.crc32(data0) & 0xFFFFFFFF
    assert decode_delta_dv(data0) == [0, 5, 9]
    # corruption: flip a data byte -> checksum mismatch, loud
    broken = bytearray(raw)
    broken[7] ^= 0xFF
    bpath = str(tmp_path / "broken.bin")
    open(bpath, "wb").write(bytes(broken))
    with pytest.raises(ValueError, match="checksum"):
        read_dv_from_file(bpath, descs[0]["offset"], descs[0]["sizeInBytes"])
    # size mismatch vs descriptor is loud too
    with pytest.raises(ValueError, match="size"):
        read_dv_from_file(path, descs[0]["offset"], descs[0]["sizeInBytes"] + 1)


def test_file_dv_applied_by_readers_and_import(spark, tmp_path):
    """attach_file_dvs commits 'u' vectors; replay validates without
    decoding, _live_rows_dataframe / pydelta / the importer all apply
    them, 'p' (absolute path) descriptors read identically, and file +
    inline vectors accumulate by union."""
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        _live_rows_dataframe,
        attach_file_dvs,
        attach_inline_dv,
        dv_file_path,
        import_delta_table,
    )
    from iceberg_metadata_pipeline_spark.ingest.pydelta_source import register

    catalog = Catalog(spark, str(tmp_path / "wh-src"))
    st = T.StructType([T.StructField("id", T.LongType(), False)])
    t = catalog.create_table("nyc", "fdv_src", st).refresh()
    t.append_dataframe(spark.range(20).selectExpr("id").repartition(2))
    t = t.refresh()
    dest = str(tmp_path / "delta_fdv")
    export_delta_table(t, dest)
    state = read_delta_table(dest)
    files = sorted(
        p
        for p in state.files
        if json.loads(state.files[p]["stats"])["numRecords"] == 10
    )
    import duckdb

    rows_of = {
        f: [r[0] for r in duckdb.sql(f"SELECT id FROM read_parquet('{f}')").fetchall()]
        for f in files
    }
    # one DELETE commit touching BOTH files -> one DV file, two vectors
    v = attach_file_dvs(dest, {files[0]: [0, 1], files[1]: [3]}, prefix="q1")
    assert v == 1
    state = read_delta_table(dest)
    descs = [a["deletionVector"] for a in state.files.values()]
    assert all(d["storageType"] == "u" for d in descs)
    assert len({dv_file_path(dest, d) for d in descs}) == 1
    killed = set(rows_of[files[0]][:2]) | {rows_of[files[1]][3]}
    expect = sorted(set(range(20)) - killed)
    assert sorted(
        r.id for r in _live_rows_dataframe(spark, state).collect()
    ) == expect
    register(spark)
    assert sorted(
        r.id for r in spark.read.format("pydelta").load(dest).collect()
    ) == expect
    t2 = import_delta_table(
        spark, Catalog(spark, str(tmp_path / "wh-fdv")), dest, "nyc", "fdv_in"
    )
    assert sorted(r.id for r in t2.scan().collect()) == expect
    # accumulation across storage types: an inline delete on file[0]
    # unions with its file-based vector
    attach_inline_dv(dest, files[0], [2])
    killed.add(rows_of[files[0]][2])
    got = sorted(r.id for r in spark.read.format("pydelta").load(dest).collect())
    assert got == sorted(set(range(20)) - killed)
    # 'p' storage: rewrite file[1]'s descriptor as an absolute path
    state = read_delta_table(dest)
    add = dict(state.files[files[1]])
    u_desc = add["deletionVector"]
    add["deletionVector"] = {
        "storageType": "p",
        "pathOrInlineDv": dv_file_path(dest, u_desc),
        "offset": u_desc["offset"],
        "sizeInBytes": u_desc["sizeInBytes"],
        "cardinality": u_desc["cardinality"],
    }
    write_commit(
        dest,
        [
            {"remove": {"path": files[1], "deletionTimestamp": 0, "dataChange": True}},
            {"add": add},
        ],
    )
    got_p = sorted(r.id for r in spark.read.format("pydelta").load(dest).collect())
    assert got_p == got


def test_checkpoint_preserves_deletion_vectors(spark, tmp_path):
    """Round-7 live catch: the checkpoint add schema must carry the
    deletionVector descriptor — a checkpoint written after a DV commit
    (inline OR file-based) previously dropped it, silently resurrecting
    deleted rows on every checkpoint-based replay."""
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        _live_rows_dataframe,
        attach_file_dvs,
        attach_inline_dv,
    )

    catalog = Catalog(spark, str(tmp_path / "wh-ckdv"))
    st = T.StructType([T.StructField("id", T.LongType(), False)])
    t = catalog.create_table("nyc", "ckdv", st).refresh()
    t.append_dataframe(spark.range(20).selectExpr("id").repartition(2))
    t = t.refresh()
    dest = str(tmp_path / "delta-ckdv")
    export_delta_table(t, dest)
    files = sorted(read_delta_table(dest).files)
    import duckdb

    kill = {
        f: [r[0] for r in duckdb.sql(f"SELECT id FROM read_parquet('{f}')").fetchall()][:1]
        for f in files
    }
    attach_file_dvs(dest, {files[0]: [0]}, prefix="ck")
    attach_inline_dv(dest, files[1], [0])
    expect = sorted(
        set(range(20)) - {kill[files[0]][0], kill[files[1]][0]}
    )
    write_checkpoint(dest)
    # replay now goes checkpoint-first; the DVs must survive it
    state = read_delta_table(dest)
    dvs = {
        a["deletionVector"]["storageType"]
        for a in state.files.values()
        if a.get("deletionVector")
    }
    assert dvs == {"u", "i"}
    assert sorted(r.id for r in _live_rows_dataframe(spark, state).collect()) == expect
    from iceberg_metadata_pipeline_spark.ingest.pydelta_source import (
        register as _reg,
    )

    _reg(spark)
    assert sorted(
        r.id for r in spark.read.format("pydelta").load(dest).collect()
    ) == expect


def test_vacuum_keeps_dv_sidecars_and_survives_log_cleanup(spark, tmp_path):
    """Round-7 live catches, part 2: (a) VACUUM must treat DV sidecar
    files as referenced (they appear only inside descriptors, never as
    action paths); (b) VACUUM after log retention must not crash on the
    cleaned commits and must keep everything the checkpoint references."""
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        attach_file_dvs,
        cleanup_delta_log,
        dv_file_path,
        vacuum_delta,
    )
    from iceberg_metadata_pipeline_spark.ingest.pydelta_source import (
        register as _reg,
    )

    catalog = Catalog(spark, str(tmp_path / "wh-vdv"))
    st = T.StructType([T.StructField("id", T.LongType(), False)])
    t = catalog.create_table("nyc", "vdv", st).refresh()
    t.append_dataframe(spark.range(20).selectExpr("id").repartition(2))
    t = t.refresh()
    dest = str(tmp_path / "delta-vdv")
    export_delta_table(t, dest)
    f = sorted(read_delta_table(dest).files)[0]
    attach_file_dvs(dest, {f: [0, 1]}, prefix="vz")
    dvp = dv_file_path(
        dest, read_delta_table(dest).files[f]["deletionVector"]
    )
    assert os.path.exists(dvp)
    victims = vacuum_delta(dest, dry_run=True)
    assert dvp not in victims
    _reg(spark)
    expect = sorted(r.id for r in spark.read.format("pydelta").load(dest).collect())
    vacuum_delta(dest)
    assert os.path.exists(dvp)
    # now retire the early commits; vacuum must use the checkpoint
    cleanup_delta_log(dest, keep_last=1)
    victims2 = vacuum_delta(dest)
    assert dvp not in victims2 and os.path.exists(dvp)
    got = sorted(r.id for r in spark.read.format("pydelta").load(dest).collect())
    assert got == expect


def test_cdf_derives_dv_commit_as_position_delta(spark, tmp_path):
    """Round-7 live catch, part 3: a DV delete commit (remove+re-add of
    the same path) must derive as EXACTLY the newly deleted rows — not a
    whole-file delete plus a whole-file insert — and a second DV commit
    on the same file must emit only the incremental positions."""
    import duckdb

    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        attach_file_dvs,
        attach_inline_dv,
        table_changes,
    )

    catalog = Catalog(spark, str(tmp_path / "wh-cdfdv"))
    st = T.StructType([T.StructField("id", T.LongType(), False)])
    t = catalog.create_table("nyc", "cdfdv", st).refresh()
    t.append_dataframe(spark.range(20).selectExpr("id").repartition(2))
    t = t.refresh()
    dest = str(tmp_path / "delta-cdfdv")
    export_delta_table(t, dest)
    f = sorted(read_delta_table(dest).files)[0]
    ids = [r[0] for r in duckdb.sql(f"SELECT id FROM read_parquet('{f}')").fetchall()]

    v1 = attach_file_dvs(dest, {f: [0, 2]}, prefix="c")
    ch1 = table_changes(spark, dest, v1, v1).collect()
    assert {(r._change_type, r.id) for r in ch1} == {
        ("delete", ids[0]), ("delete", ids[2])
    }
    # incremental: second commit deletes position 1 only
    v2 = attach_inline_dv(dest, f, [1])
    ch2 = table_changes(spark, dest, v2, v2).collect()
    assert {(r._change_type, r.id) for r in ch2} == {("delete", ids[1])}
    # an unpaired remove of a DV-carrying file deletes only LIVE rows
    now_add = read_delta_table(dest).files[f]
    write_commit(
        dest,
        [{"remove": {"path": f, "deletionTimestamp": 0, "dataChange": True,
                     "deletionVector": now_add["deletionVector"]}}],
    )
    v3 = latest_version(dest)
    ch3 = table_changes(spark, dest, v3, v3).collect()
    assert {r._change_type for r in ch3} == {"delete"}
    assert sorted(r.id for r in ch3) == sorted(set(ids) - {ids[0], ids[1], ids[2]})


def test_optimize_folds_dvs_and_preserves_rows(spark, tmp_path):
    """OPTIMIZE bin-packs small files and materializes DV-carrying
    files' live rows — the rewrite sheds the vectors, row set unchanged,
    one atomic commit with remove+add (dataChange=false) + commitInfo
    OPTIMIZE."""
    import duckdb

    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        attach_file_dvs,
        delta_history,
        optimize_delta,
    )
    from iceberg_metadata_pipeline_spark.ingest.pydelta_source import register

    catalog = Catalog(spark, str(tmp_path / "wh-opt"))
    st = T.StructType([T.StructField("id", T.LongType(), False)])
    t = catalog.create_table("nyc", "opt", st).refresh()
    t.append_dataframe(spark.range(100).selectExpr("id").repartition(8))
    t = t.refresh()
    dest = str(tmp_path / "delta-opt")
    export_delta_table(t, dest)
    files = sorted(read_delta_table(dest).files)
    assert len(files) == 8
    k0 = [r[0] for r in duckdb.sql(f"SELECT id FROM read_parquet('{files[0]}')").fetchall()]
    attach_file_dvs(dest, {files[0]: [0, 1]}, prefix="op")
    v = optimize_delta(spark, dest, target_file_rows=1000)
    state = read_delta_table(dest, v)
    assert len(state.files) == 1
    assert not any(a.get("deletionVector") for a in state.files.values())
    register(spark)
    got = sorted(r.id for r in spark.read.format("pydelta").load(dest).collect())
    assert got == sorted(set(range(100)) - {k0[0], k0[1]})
    assert delta_history(dest)[0]["operation"] == "OPTIMIZE"
    # idempotent: nothing small or vectored left -> no new commit
    assert optimize_delta(spark, dest, target_file_rows=1000) == v
    # time travel before the optimize still sees the DV state
    before = read_delta_table(dest, v - 1)
    assert any(a.get("deletionVector") for a in before.files.values())


def test_optimize_clusters_with_order_by(spark, tmp_path):
    """order_by clustering: output files are range-partitioned and
    internally sorted on the key — every file's [min,max] id range is
    disjoint, which is what makes data skipping work after OPTIMIZE."""
    import duckdb

    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        optimize_delta,
    )

    catalog = Catalog(spark, str(tmp_path / "wh-opt2"))
    st = T.StructType([T.StructField("id", T.LongType(), False)])
    t = catalog.create_table("nyc", "opt2", st).refresh()
    t.append_dataframe(spark.range(1000).selectExpr("id").repartition(10))
    t = t.refresh()
    dest = str(tmp_path / "delta-opt2")
    export_delta_table(t, dest)
    v = optimize_delta(spark, dest, target_file_rows=250, order_by=["id"])
    state = read_delta_table(dest, v)
    ranges = []
    for p in state.files:
        # OPTIMIZE output is recorded relative to the table root
        p = p if os.path.isabs(p) else os.path.join(dest, p)
        ids = [r[0] for r in duckdb.sql(f"SELECT id FROM read_parquet('{p}')").fetchall()]
        assert ids == sorted(ids), "file not internally sorted"
        ranges.append((min(ids), max(ids)))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, "file ranges overlap"
    total = sum(
        duckdb.sql(
            "SELECT COUNT(*) FROM read_parquet("
            f"'{p if os.path.isabs(p) else os.path.join(dest, p)}')"
        ).fetchone()[0]
        for p in state.files
    )
    assert total == 1000


def test_restore_to_old_version_preserves_history(spark, tmp_path):
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        attach_file_dvs,
        delta_history,
        restore_delta,
    )
    from iceberg_metadata_pipeline_spark.ingest.pydelta_source import register

    catalog = Catalog(spark, str(tmp_path / "wh-rst"))
    st = T.StructType([T.StructField("id", T.LongType(), False)])
    t = catalog.create_table("nyc", "rst", st).refresh()
    t.append_dataframe(spark.range(20).selectExpr("id").repartition(2))
    t = t.refresh()
    dest = str(tmp_path / "delta-rst")
    export_delta_table(t, dest)  # v0: 20 rows
    f = sorted(read_delta_table(dest).files)[0]
    attach_file_dvs(dest, {f: [0, 1]}, prefix="r")  # v1: 18 rows
    register(spark)
    assert spark.read.format("pydelta").load(dest).count() == 18
    v = restore_delta(dest, 0)
    assert v == 2
    assert spark.read.format("pydelta").load(dest).count() == 20
    # history preserved: the DV state is still time-travelable
    assert (
        spark.read.format("pydelta").option("versionAsOf", "1").load(dest).count()
        == 18
    )
    assert delta_history(dest)[0]["operation"] == "RESTORE"
    # restoring to the current state is a no-op
    assert restore_delta(dest, 2) == 2


def test_shallow_clone_shares_files_and_diverges(spark, tmp_path):
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        attach_file_dvs,
        clone_delta,
        vacuum_delta,
    )
    from iceberg_metadata_pipeline_spark.ingest.pydelta_source import register

    catalog = Catalog(spark, str(tmp_path / "wh-cl"))
    st = T.StructType([T.StructField("id", T.LongType(), False)])
    t = catalog.create_table("nyc", "cl", st).refresh()
    t.append_dataframe(spark.range(20).selectExpr("id").repartition(2))
    t = t.refresh()
    src = str(tmp_path / "delta-src")
    export_delta_table(t, src)
    f = sorted(read_delta_table(src).files)[0]
    attach_file_dvs(src, {f: [0]}, prefix="c")  # clone must resolve this DV
    dest = str(tmp_path / "delta-clone")
    v = clone_delta(src, dest)
    assert v == 0
    register(spark)
    src_rows = sorted(r.id for r in spark.read.format("pydelta").load(src).collect())
    cl_rows = sorted(r.id for r in spark.read.format("pydelta").load(dest).collect())
    assert cl_rows == src_rows and len(cl_rows) == 19
    # diverge: a delete in the clone leaves the source untouched
    cf = sorted(read_delta_table(dest).files)[1]
    attach_file_dvs(dest, {cf: [0]}, prefix="cc")
    assert spark.read.format("pydelta").load(dest).count() == 18
    assert spark.read.format("pydelta").load(src).count() == 19
    # vacuuming the clone never touches the source's (external) files
    victims = vacuum_delta(dest, dry_run=True)
    assert not any(v.startswith(src) for v in victims)
    with pytest.raises(FileExistsError):
        clone_delta(src, dest)


def test_append_only_refuses_data_changing_removes(spark, tmp_path):
    """delta.appendOnly=true: DV deletes and overwrites refuse at the
    commit choke point; appends and OPTIMIZE (dataChange=false removes)
    stay legal."""
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        attach_inline_dv,
        optimize_delta,
    )

    catalog = Catalog(spark, str(tmp_path / "wh-ao"))
    st = T.StructType([T.StructField("id", T.LongType(), False)])
    t = catalog.create_table("nyc", "ao", st).refresh()
    t.append_dataframe(spark.range(40).selectExpr("id").repartition(4))
    t = t.refresh()
    dest = str(tmp_path / "delta-ao")
    export_delta_table(t, dest)
    state = read_delta_table(dest)
    md = dict(state.metadata)
    md["configuration"] = dict(
        md.get("configuration") or {}, **{"delta.appendOnly": "true"}
    )
    write_commit(dest, [{"metaData": md}])
    f = sorted(read_delta_table(dest).files)[0]
    with pytest.raises(PermissionError, match="appendOnly"):
        attach_inline_dv(dest, f, [0])
    # appends still fine
    t.append_dataframe(spark.createDataFrame([(999,)], st))
    assert export_delta_table(t.refresh(), dest) > 1
    # OPTIMIZE (layout-only) still fine
    v = optimize_delta(spark, dest, target_file_rows=1000)
    assert read_delta_table(dest, v).version == v
    from iceberg_metadata_pipeline_spark.ingest.pydelta_source import register

    register(spark)
    got = sorted(r.id for r in spark.read.format("pydelta").load(dest).collect())
    assert got == sorted(list(range(40)) + [999])


def test_optimize_packs_within_partitions(spark, tmp_path):
    """OPTIMIZE packs per PARTITION (the spec's unit): each partition's
    small files merge into that partition's output; partitionValues
    carry through and pydelta reads the same rows."""
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        optimize_delta,
    )
    from iceberg_metadata_pipeline_spark.catalog.partitioning import (
        PartitionField,
    )
    from iceberg_metadata_pipeline_spark.ingest.pydelta_source import register

    catalog = Catalog(spark, str(tmp_path / "wh-optp"))
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("cat", T.StringType(), True),
        ]
    )
    t = catalog.create_table("nyc", "optp", st)
    t.set_partition_spec([PartitionField("cat", "identity")])
    t = t.refresh()
    t.append_dataframe(
        spark.sql(
            "SELECT id, IF(id % 2 = 0, 'even', 'odd') AS cat FROM RANGE(40)"
        ).repartition(6)
    )
    t = t.refresh()
    dest = str(tmp_path / "delta-optp")
    export_delta_table(t, dest)
    n_before = len(read_delta_table(dest).files)
    v = optimize_delta(spark, dest, target_file_rows=1000)
    state = read_delta_table(dest, v)
    pvals = sorted(
        (a.get("partitionValues") or {}).get("cat")
        for a in state.files.values()
    )
    assert pvals == ["even", "odd"] and n_before > 2
    register(spark)
    got = sorted(
        (r.id, r.cat)
        for r in spark.read.format("pydelta").load(dest).collect()
    )
    assert got == [(i, "even" if i % 2 == 0 else "odd") for i in range(40)]


def test_vacuum_after_optimize_keeps_packed_files(spark, tmp_path):
    """Round-8 advisor catch (data loss): OPTIMIZE's packed output lives
    under the table root and MUST survive VACUUM — the r7 code recorded
    it with absolute paths, which vacuum classified as external (never
    referenced) while its os.walk sweep still listed them, so the
    standard OPTIMIZE-then-VACUUM maintenance sequence deleted the live
    packed files. Adds are now relative; vacuum also defends against
    historical absolute-under-root commits."""
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        attach_file_dvs,
        optimize_delta,
        vacuum_delta,
    )
    from iceberg_metadata_pipeline_spark.ingest.pydelta_source import (
        register as _reg,
    )

    catalog = Catalog(spark, str(tmp_path / "wh-ov"))
    st = T.StructType([T.StructField("id", T.LongType(), False)])
    t = catalog.create_table("nyc", "ov", st).refresh()
    t.append_dataframe(spark.range(50).selectExpr("id").repartition(5))
    t = t.refresh()
    dest = str(tmp_path / "delta-ov")
    export_delta_table(t, dest)
    f = sorted(read_delta_table(dest).files)[0]
    attach_file_dvs(dest, {f: [0]}, prefix="ov")
    v = optimize_delta(spark, dest, target_file_rows=1000)
    state = read_delta_table(dest, v)
    packed = [p for p in state.files if not os.path.isabs(p)]
    assert packed, "OPTIMIZE output must be recorded relative to the root"
    _reg(spark)
    expect = sorted(r.id for r in spark.read.format("pydelta").load(dest).collect())
    assert len(expect) == 49
    victims = vacuum_delta(dest, dry_run=True)
    live_abs = {os.path.join(dest, p) for p in packed}
    assert not live_abs & set(victims), "VACUUM would delete live OPTIMIZE output"
    vacuum_delta(dest)
    got = sorted(r.id for r in spark.read.format("pydelta").load(dest).collect())
    assert got == expect


def test_vacuum_refs_absolute_paths_under_root(spark, tmp_path):
    """Defense-in-depth half of the same catch: a commit that recorded a
    under-root file with an ABSOLUTE path (r7 OPTIMIZE output, or a
    foreign writer) must still pin the file against VACUUM."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        vacuum_delta,
        write_commit,
    )

    dest = str(tmp_path / "delta-abs")
    os.makedirs(os.path.join(dest, "data"))
    fp = os.path.join(dest, "data", "part-0.parquet")
    pq.write_table(pa.table({"id": list(range(7))}), fp)
    write_commit(
        dest,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "abs-test",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(
                        T.StructType(
                            [T.StructField("id", T.LongType(), True)]
                        ).jsonValue()
                    ),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": 0,
                }
            },
            {
                "add": {
                    "path": fp,  # absolute, but inside the table root
                    "partitionValues": {},
                    "size": os.path.getsize(fp),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
            {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
        ],
    )
    victims = vacuum_delta(dest, dry_run=True)
    assert fp not in victims
    vacuum_delta(dest)
    assert os.path.exists(fp)


def test_restore_past_vacuum_refuses_then_opts_in(spark, tmp_path):
    """Round-8 advisor catch: RESTORE to a version whose files VACUUM
    already deleted must fail the RESTORE itself (a restore that commits
    and then fails every read is worse), unless ignore_missing_files=True
    — which restores only the surviving files."""
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        restore_delta,
        vacuum_delta,
    )
    from iceberg_metadata_pipeline_spark.ingest.pydelta_source import (
        register as _reg,
    )

    _reg(spark)
    dest = str(tmp_path / "delta-rpv")
    spark.range(10).selectExpr("id").coalesce(1).write.format("pydelta").mode(
        "append"
    ).save(dest)  # v0: one file inside the root
    spark.range(10, 15).selectExpr("id").coalesce(1).write.format(
        "pydelta"
    ).mode("overwrite").save(dest)  # v1: removes (tombstones) v0's file
    # our own vacuum keeps tombstoned files while the removing commit is
    # retained, so simulate the interop hazard directly: a foreign
    # engine's VACUUM RETAIN 0 HOURS deletes tombstoned data files even
    # though v0 is still replayable from the log
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        read_delta_table,
    )

    v0_files = read_delta_table(dest, 0).files
    for p in v0_files:
        os.remove(p if os.path.isabs(p) else os.path.join(dest, p))
    assert vacuum_delta(dest, dry_run=True) == []  # ours would not have
    with pytest.raises(FileNotFoundError, match="VACUUM"):
        restore_delta(dest, 0)
    v = restore_delta(dest, 0, ignore_missing_files=True)
    assert v == read_delta_table(dest).version
    # only survivors restored: v0 had one (now-gone) file -> empty table
    assert spark.read.format("pydelta").load(dest).count() == 0


def test_optimize_zorder_multi_column(spark, tmp_path):
    """OPTIMIZE ... ZORDER BY (x, y): output files cluster on the
    bit-interleaved curve, so per-file min/max ranges prune on BOTH
    columns — the multi-column skipping single-key range clustering
    cannot give. Asserted the way an engine uses it: for each column,
    the fraction of files a point-range predicate could skip must beat
    a random layout on both columns simultaneously."""
    import pyarrow.parquet as pq

    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        optimize_delta,
    )

    catalog = Catalog(spark, str(tmp_path / "wh-z"))
    st = T.StructType(
        [
            T.StructField("x", T.LongType(), False),
            T.StructField("y", T.LongType(), False),
        ]
    )
    t = catalog.create_table("nyc", "zt", st).refresh()
    # 64x64 grid in hash-scrambled order: no accidental pre-clustering
    t.append_dataframe(
        spark.sql(
            "SELECT id % 64 AS x, CAST(id / 64 AS LONG) AS y "
            "FROM RANGE(4096) DISTRIBUTE BY hash(id)"
        ).repartition(8)
    )
    t = t.refresh()
    dest = str(tmp_path / "delta-z")
    export_delta_table(t, dest)
    v = optimize_delta(
        spark, dest, target_file_rows=256, small_file_rows=1000,
        order_by=["x", "y"],
    )
    state = read_delta_table(dest, v)
    files = [
        p if os.path.isabs(p) else os.path.join(dest, p) for p in state.files
    ]
    assert len(files) >= 8
    total = 0
    ranges = {"x": [], "y": []}
    for p in files:
        tb = pq.read_table(p)
        total += tb.num_rows
        for c in ("x", "y"):
            vals = tb.column(c).to_pylist()
            ranges[c].append((min(vals), max(vals)))
    assert total == 4096  # OPTIMIZE must not change rows
    # data skipping metric: average per-file span on each dimension.
    # A perfect single-key sort gives span≈0 on that key and span≈63 on
    # the other; the z-curve must bound BOTH well below the full domain.
    for c in ("x", "y"):
        avg_span = sum(hi - lo for lo, hi in ranges[c]) / len(ranges[c])
        assert avg_span < 40, f"{c}: avg file span {avg_span} — not clustered"
    # and a point predicate on EITHER column prunes most files
    for c in ("x", "y"):
        hit = sum(1 for lo, hi in ranges[c] if lo <= 10 <= hi)
        assert hit <= len(ranges[c]) // 2, f"{c}: {hit}/{len(ranges[c])} files hit"


def test_optimize_zorder_string_column_clusters(spark, tmp_path):
    """ADVICE r8: a string zorder column used to cast to NULL inside
    _zvalue_column — every row ranked 0 and the dimension silently
    dropped from the curve. Strings now rank by an order-preserving
    3-byte prefix, so per-file min/max on the STRING column prunes."""
    import pyarrow.parquet as pq

    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        optimize_delta,
    )

    catalog = Catalog(spark, str(tmp_path / "wh-zs"))
    st = T.StructType(
        [
            T.StructField("name", T.StringType(), False),
            T.StructField("n", T.LongType(), False),
        ]
    )
    t = catalog.create_table("nyc", "zs", st).refresh()
    # 16 distinct leading letters x 256 rows, hash-scrambled
    t.append_dataframe(
        spark.sql(
            "SELECT concat(char(97 + id % 16), '-', lpad(CAST(id AS STRING), 5, '0')) AS name, "
            "CAST(id / 16 AS LONG) AS n "
            "FROM RANGE(4096) DISTRIBUTE BY hash(id)"
        ).repartition(8)
    )
    t = t.refresh()
    dest = str(tmp_path / "delta-zs")
    export_delta_table(t, dest)
    v = optimize_delta(
        spark, dest, target_file_rows=256, small_file_rows=1000,
        order_by=["name", "n"],
    )
    state = read_delta_table(dest, v)
    files = [
        p if os.path.isabs(p) else os.path.join(dest, p) for p in state.files
    ]
    assert len(files) >= 8
    spans = []
    hits = 0
    for p in files:
        vals = pq.read_table(p).column("name").to_pylist()
        lo, hi = min(vals), max(vals)
        # leading-letter span: 16 letters in the domain; clustered files
        # must cover a small slice of it
        spans.append(ord(hi[0]) - ord(lo[0]))
        if lo <= "g" <= hi:  # point predicate on the string column
            hits += 1
    assert sum(spans) / len(spans) < 10, f"string dim not clustered: {spans}"
    assert hits <= len(files) // 2, f"{hits}/{len(files)} files hit 'g'"
