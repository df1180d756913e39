"""Delta column-mapping 'id' mode (round 9, closes the standing
refusal): creation-time id tables, field-id-stamped writes, field-id
resolution on BOTH read paths (pydelta per-file pyarrow map; Spark's
native parquet.field.id read in _live_rows_dataframe), metadata-only
renames, OPTIMIZE keeping files id-resolvable, the no-id-file loud
refusal, and (round 10) NESTED id resolution on both read paths."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from iceberg_metadata_pipeline_spark.catalog.delta_format import (
    column_mapping_ids,
    create_delta_table,
    optimize_delta,
    parquet_field_ids,
    physical_names,
    physical_names_meta,
    read_delta_table,
    rename_delta_column,
    write_commit,
)
from iceberg_metadata_pipeline_spark.ingest.pydelta_source import register

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)


@pytest.fixture()
def id_table(spark, tmp_path):
    dest = str(tmp_path / "idtable")
    create_delta_table(dest, SCHEMA, column_mapping="id")
    register(spark)
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) / 2) for i in range(20)], SCHEMA
    )
    df.write.format("pydelta").mode("append").save(dest)
    return dest


def test_create_idmode_assigns_divergent_physical_names(spark, tmp_path):
    dest = str(tmp_path / "t")
    create_delta_table(dest, SCHEMA, column_mapping="id")
    state = read_delta_table(dest)
    assert column_mapping_ids(state) == {"id": 1, "name": 2, "score": 3}
    assert physical_names_meta(state) == {
        "id": "col-1",
        "name": "col-2",
        "score": "col-3",
    }
    # name-resolution on an id table must refuse
    with pytest.raises(NotImplementedError, match="field id"):
        physical_names(state)
    # double-create refuses
    with pytest.raises(ValueError, match="already exists"):
        create_delta_table(dest, SCHEMA, column_mapping="id")


def test_idmode_write_stamps_field_ids_and_reads_back(spark, id_table):
    state = read_delta_table(id_table)
    assert len(state.files) >= 1
    for p in state.files:
        full = os.path.join(id_table, p)
        ids = parquet_field_ids(full)
        assert ids == {1: "col-1", 2: "col-2", 3: "col-3"}
    back = spark.read.format("pydelta").load(id_table)
    rows = {(r["id"], r["name"], r["score"]) for r in back.collect()}
    assert rows == {(i, f"n{i}", i / 2) for i in range(20)}


def test_idmode_rename_is_metadata_only(spark, id_table):
    files_before = set(read_delta_table(id_table).files)
    rename_delta_column(id_table, "score", "points")
    state = read_delta_table(id_table)
    assert set(state.files) == files_before  # zero rewrites
    back = spark.read.format("pydelta").load(id_table)
    assert "points" in back.columns and "score" not in back.columns
    assert {r["points"] for r in back.collect()} == {i / 2 for i in range(20)}


def test_idmode_scrambled_parquet_names_resolve_by_id(spark, tmp_path):
    """THE id-mode property: parquet column names are arbitrary — a
    foreign writer's file with totally different names but correct
    field ids must read correctly."""
    dest = str(tmp_path / "t")
    create_delta_table(dest, SCHEMA, column_mapping="id")
    sch = pa.schema(
        [
            # names deliberately swapped/garbled vs physicalName
            pa.field("col-3", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
            pa.field("zzz", pa.string(), metadata={b"PARQUET:field_id": b"2"}),
            pa.field("col-1", pa.float64(), metadata={b"PARQUET:field_id": b"3"}),
        ]
    )
    fp = os.path.join(dest, "foreign.parquet")
    pq.write_table(
        pa.table({"col-3": [7], "zzz": ["x"], "col-1": [0.5]}, schema=sch), fp
    )
    write_commit(
        dest,
        [
            {
                "add": {
                    "path": "foreign.parquet",
                    "partitionValues": {},
                    "size": os.path.getsize(fp),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
        ],
    )
    register(spark)
    rows = spark.read.format("pydelta").load(dest).collect()
    assert [(r["id"], r["name"], r["score"]) for r in rows] == [(7, "x", 0.5)]


def test_idmode_file_without_ids_refuses(spark, tmp_path):
    dest = str(tmp_path / "t")
    create_delta_table(dest, SCHEMA, column_mapping="id")
    fp = os.path.join(dest, "noids.parquet")
    pq.write_table(
        pa.table({"col-1": [1], "col-2": ["a"], "col-3": [1.0]}), fp
    )
    write_commit(
        dest,
        [
            {
                "add": {
                    "path": "noids.parquet",
                    "partitionValues": {},
                    "size": os.path.getsize(fp),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
        ],
    )
    register(spark)
    with pytest.raises(Exception, match="PARQUET:field_id"):
        spark.read.format("pydelta").load(dest).collect()


def test_idmode_added_column_projects_null(spark, id_table):
    """Delta add-column semantics: files written before the column got
    its id project null — the field id is simply absent from them."""
    import json

    state = read_delta_table(id_table)
    new_fields = state.schema.fields + [
        T.StructField(
            "extra",
            T.LongType(),
            True,
            {"delta.columnMapping.id": 4, "delta.columnMapping.physicalName": "col-4"},
        )
    ]
    conf = dict(state.metadata["configuration"])
    conf["delta.columnMapping.maxColumnId"] = "4"
    md = dict(
        state.metadata,
        schemaString=json.dumps(T.StructType(new_fields).jsonValue()),
        configuration=conf,
    )
    write_commit(id_table, [{"metaData": md}, {"commitInfo": {"operation": "ADD COLUMNS"}}])
    back = spark.read.format("pydelta").load(id_table)
    rows = back.collect()
    assert len(rows) == 20
    assert all(r["extra"] is None for r in rows)
    assert {r["id"] for r in rows} == set(range(20))


def test_idmode_nested_scrambled_names_resolve_by_id(spark, tmp_path):
    """Round 10 (closes the r9 nested narrowing): a nested id-mode
    table resolves NESTED parquet fields by field id on BOTH read
    paths, even when the file's nested names are arbitrary — a foreign
    writer's file with scrambled names at every level but correct
    nested field ids reads back logically."""
    nested = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField(
                "s",
                T.StructType(
                    [
                        T.StructField("x", T.LongType(), True),
                        T.StructField("y", T.StringType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    dest = str(tmp_path / "t")
    create_delta_table(dest, nested, column_mapping="id")
    state = read_delta_table(dest)
    # recursive assignment: nested fields carry ids + col-N names
    s_field = state.schema["s"]
    inner_ids = {
        f.name: int(f.metadata["delta.columnMapping.id"])
        for f in s_field.dataType.fields
    }
    assert set(inner_ids) == {"x", "y"}
    top_ids = column_mapping_ids(state)

    # FOREIGN writer: scrambled names at both levels, correct ids
    def fld(name, typ, fid):
        return pa.field(
            name, typ, metadata={b"PARQUET:field_id": str(fid).encode()}
        )

    sch = pa.schema(
        [
            fld("zz_9", pa.int64(), top_ids["id"]),
            fld(
                "blob",
                pa.struct(
                    [
                        # inner order also scrambled: y before x
                        fld("q2", pa.string(), inner_ids["y"]),
                        fld("q1", pa.int64(), inner_ids["x"]),
                    ]
                ),
                top_ids["s"],
            ),
        ]
    )
    data = os.path.join(dest, "foreign.parquet")
    pq.write_table(
        pa.table(
            {
                "zz_9": pa.array([1, 2], pa.int64()),
                "blob": pa.array(
                    [{"q2": "a", "q1": 10}, {"q2": "b", "q1": 20}],
                    sch.field("blob").type,
                ),
            },
            schema=sch,
        ),
        data,
    )
    write_commit(
        dest,
        [
            {
                "add": {
                    "path": "foreign.parquet",
                    "partitionValues": {},
                    "size": os.path.getsize(data),
                    "modificationTime": 0,
                    "dataChange": True,
                    "stats": json.dumps({"numRecords": 2}),
                }
            }
        ],
    )

    # path 1: pydelta per-file pyarrow resolution
    register(spark)
    back = spark.read.format("pydelta").load(dest)
    rows = {(r["id"], r["s"]["x"], r["s"]["y"]) for r in back.collect()}
    assert rows == {(1, 10, "a"), (2, 20, "b")}

    # path 2: Spark-native fieldId read (_live_rows_dataframe)
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        _live_rows_dataframe,
    )

    live = _live_rows_dataframe(spark, read_delta_table(dest))
    rows2 = {(r["id"], r["s"]["x"], r["s"]["y"]) for r in live.collect()}
    assert rows2 == {(1, 10, "a"), (2, 20, "b")}

    # nested rename is metadata-only and keeps resolving
    rename_delta_column(dest, "s.x", "xx")
    back2 = spark.read.format("pydelta").load(dest)
    rows3 = {(r["id"], r["s"]["xx"], r["s"]["y"]) for r in back2.collect()}
    assert rows3 == {(1, 10, "a"), (2, 20, "b")}


def test_idmode_nested_optimize_keeps_nested_ids(spark, tmp_path):
    """OPTIMIZE on a nested id table writes packed files whose NESTED
    parquet fields still carry field ids (fieldId write from nested
    schema metadata) — and they read back on both paths."""
    nested = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField(
                "s",
                T.StructType([T.StructField("x", T.LongType(), True)]),
                True,
            ),
        ]
    )
    dest = str(tmp_path / "t")
    create_delta_table(dest, nested, column_mapping="id")
    state = read_delta_table(dest)
    top_ids = column_mapping_ids(state)
    inner_id = int(
        state.schema["s"].dataType["x"].metadata["delta.columnMapping.id"]
    )

    def fld(name, typ, fid):
        return pa.field(
            name, typ, metadata={b"PARQUET:field_id": str(fid).encode()}
        )

    for tag, vals in (("a", [(1, 5)]), ("b", [(2, 6)])):
        sch = pa.schema(
            [
                fld("col-%d" % top_ids["id"], pa.int64(), top_ids["id"]),
                fld(
                    "col-%d" % top_ids["s"],
                    pa.struct([fld("col-%d" % inner_id, pa.int64(), inner_id)]),
                    top_ids["s"],
                ),
            ]
        )
        data = os.path.join(dest, f"{tag}.parquet")
        pq.write_table(
            pa.table(
                {
                    sch.names[0]: pa.array([v[0] for v in vals], pa.int64()),
                    sch.names[1]: pa.array(
                        [{("col-%d" % inner_id): v[1]} for v in vals],
                        sch.field(sch.names[1]).type,
                    ),
                },
                schema=sch,
            ),
            data,
        )
        write_commit(
            dest,
            [
                {
                    "add": {
                        "path": f"{tag}.parquet",
                        "partitionValues": {},
                        "size": os.path.getsize(data),
                        "modificationTime": 0,
                        "dataChange": True,
                        "stats": json.dumps({"numRecords": len(vals)}),
                    }
                }
            ],
        )
    v = optimize_delta(spark, dest, target_file_rows=1000)
    state = read_delta_table(dest, v)
    assert len(state.files) == 1
    packed = os.path.join(dest, next(iter(state.files)))
    # the packed file's NESTED field still carries its id
    sch = pq.ParquetFile(packed).schema_arrow
    sf = next(f for f in sch if pa.types.is_struct(f.type))
    inner = sf.type.field(0)
    assert (inner.metadata or {}).get(b"PARQUET:field_id") == str(
        inner_id
    ).encode()
    register(spark)
    back = spark.read.format("pydelta").load(dest)
    rows = {(r["id"], r["s"]["x"]) for r in back.collect()}
    assert rows == {(1, 5), (2, 6)}


def test_idmode_optimize_keeps_files_id_resolvable(spark, tmp_path):
    dest = str(tmp_path / "t")
    create_delta_table(dest, SCHEMA, column_mapping="id")
    register(spark)
    for lo in range(0, 30, 10):
        spark.createDataFrame(
            [(i, f"n{i}", float(i)) for i in range(lo, lo + 10)], SCHEMA
        ).write.format("pydelta").mode("append").save(dest)
    assert len(read_delta_table(dest).files) >= 3
    v = optimize_delta(spark, dest, target_file_rows=1000)
    state = read_delta_table(dest, v)
    assert len(state.files) == 1
    packed = next(iter(state.files))
    ids = parquet_field_ids(os.path.join(dest, packed))
    assert set(ids) == {1, 2, 3}  # packed file still id-stamped
    back = spark.read.format("pydelta").load(dest)
    assert {r["id"] for r in back.collect()} == set(range(30))


def test_idmode_import_materializes(spark, tmp_path, id_table):
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        import_delta_table,
    )
    from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog

    catalog = Catalog(spark, str(tmp_path / "wh"))
    t = import_delta_table(spark, catalog, id_table, "nyc", "from_id")
    rows = {(r["id"], r["name"], r["score"]) for r in t.scan().collect()}
    assert rows == {(i, f"n{i}", i / 2) for i in range(20)}


def test_create_name_mode_maps_nested_fields_recursively(tmp_path):
    """Review finding: create_delta_table('name') must assign
    columnMapping ids/physicalNames RECURSIVELY (the protocol applies
    to every nested field) — a flat assignment made a later nested
    rename silently read NULL."""
    nested = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField(
                "s",
                T.StructType([T.StructField("x", T.LongType(), True)]),
                True,
            ),
        ]
    )
    dest = str(tmp_path / "t")
    create_delta_table(dest, nested, column_mapping="name")
    state = read_delta_table(dest)
    s_field = state.schema["s"]
    assert "delta.columnMapping.id" in (s_field.metadata or {})
    inner = s_field.dataType["x"]
    assert (inner.metadata or {}).get("delta.columnMapping.physicalName") == "x"
    assert (inner.metadata or {}).get("delta.columnMapping.id") is not None
    assert state.metadata["configuration"]["delta.columnMapping.maxColumnId"] == "3"
    # nested rename is metadata-only and physical_type keeps pointing at
    # the on-disk nested name
    rename_delta_column(dest, "s.x", "y")
    state = read_delta_table(dest)
    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        physical_type,
    )

    pt = physical_type(state.schema["s"].dataType)
    assert pt.fieldNames() == ["x"]  # logical y -> physical x
    assert state.schema["s"].dataType.fieldNames() == ["y"]


def test_idmode_partitioned_roundtrip_batch_and_stream(spark, tmp_path):
    """Advisor finding (r10): partitioned id-mode tables crashed on
    read — partition planning resolved partitionValues keys through
    self.physical, which is None under id mode. partitionValues are
    keyed by physicalName in EVERY mode (the spec writes physicalNames
    even under id), so planning must go through part_phys."""
    dest = str(tmp_path / "idpart")
    create_delta_table(
        dest, SCHEMA, partition_columns=["name"], column_mapping="id"
    )
    register(spark)
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(12)], SCHEMA
    )
    df.write.format("pydelta").mode("append").save(dest)

    # batch read: partition column values come back from partitionValues
    back = spark.read.format("pydelta").load(dest)
    rows = {(r["id"], r["name"], r["score"]) for r in back.collect()}
    assert rows == {(i, f"g{i % 3}", float(i)) for i in range(12)}

    # stream read plans the same partitions without touching
    # self.physical
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("pydelta")
        .schema(SCHEMA)
        .load(dest)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["id"], r["name"], r["score"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == rows
