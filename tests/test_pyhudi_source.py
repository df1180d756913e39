"""pyhudi DataSource tests: batch snapshot + asOfInstant time travel +
the streaming incremental-pull source over a real exported Hudi table."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
    completed_instants,
    export_hudi_table,
)
from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
from iceberg_metadata_pipeline_spark.ingest.pyhudi_source import register


@pytest.fixture()
def hudi_dir(spark, tmp_path):
    catalog = Catalog(spark, str(tmp_path / "wh"))
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
        ]
    )
    t = catalog.create_table("nyc", "phs", st)
    t.append_dataframe(
        spark.createDataFrame([(i, f"n{i}") for i in range(10)], schema=st)
    )
    dest = str(tmp_path / "hudi_tbl")
    export_hudi_table(t.refresh(), dest)
    return t.refresh(), dest


def test_batch_snapshot_read(spark, hudi_dir):
    _t, dest = hudi_dir
    register(spark)
    back = spark.read.format("pyhudi").load(dest)
    assert sorted(r.id for r in back.collect()) == list(range(10))
    assert set(back.columns) == {"id", "name"}


def test_as_of_instant_time_travel(spark, hudi_dir):
    t, dest = hudi_dir
    i1 = completed_instants(dest)[-1].time
    t.append_dataframe(
        spark.createDataFrame([(100, "x"), (101, "y")], "id long, name string")
    )
    export_hudi_table(t.refresh(), dest)
    register(spark)
    now = spark.read.format("pyhudi").load(dest)
    old = spark.read.format("pyhudi").option("asOfInstant", i1).load(dest)
    assert now.count() == 12
    assert sorted(r.id for r in old.collect()) == list(range(10))


def test_stream_tails_incremental_commits(spark, hudi_dir, tmp_path):
    t, dest = hudi_dir
    register(spark)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("pyhudi")
            .load(dest)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = spark.read.parquet(out)
    assert sorted(r.id for r in got.collect()) == list(range(10))

    # a new commit → restart reads ONLY the new slice (offset = instant)
    t.append_dataframe(
        spark.createDataFrame([(500, "z")], "id long, name string")
    )
    export_hudi_table(t.refresh(), dest)
    run_once()
    got = spark.read.parquet(out)
    assert sorted(r.id for r in got.collect()) == list(range(10)) + [500]


def test_max_files_per_trigger_bounds_batches(spark, hudi_dir):
    """Admission control: once the engine's position is known (from the
    second micro-batch of a reader instance — the Python DataSource API
    has no ReadLimit handshake), latestOffset advances at most
    maxFilesPerTrigger files per batch, never splitting an instant and
    never regressing."""
    from iceberg_metadata_pipeline_spark.ingest.pyhudi_source import (
        PyHudiStreamReader,
    )

    t, dest = hudi_dir
    # three more single-file commits → 4 instants total
    for k in range(3):
        t.append_dataframe(
            spark.createDataFrame([(1000 + k, "z")], "id long, name string")
        )
        t = t.refresh()
        export_hudi_table(t, dest)
    instants = [i.time for i in completed_instants(dest)]
    assert len(instants) == 4

    r = PyHudiStreamReader(None, {"path": dest, "maxFilesPerTrigger": "1"})
    # batch 1: position unknown → unthrottled (documented)
    o0 = r.initialOffset()
    e1 = r.latestOffset()
    assert e1["t"] == instants[-1]
    # simulate the engine having checkpointed after instant 1, then
    # replaying: partitions() reveals the position, throttling engages
    r2 = PyHudiStreamReader(None, {"path": dest, "maxFilesPerTrigger": "1"})
    r2.partitions({"t": o0["t"]}, {"t": instants[0]})
    r2.commit({"t": instants[0]})
    seen = [instants[0]]
    while True:
        e = r2.latestOffset()
        if e["t"] == seen[-1]:
            break
        # exactly ONE instant per batch: every instant carries >= 1 file,
        # so the 1-file limit stops at the first uncommitted instant
        # (instants are atomic — never split, so a multi-file commit can
        # exceed the limit by design)
        assert instants.index(e["t"]) == instants.index(seen[-1]) + 1
        parts = r2.partitions({"t": seen[-1]}, e)
        assert len(parts) >= 1
        r2.commit(e)
        seen.append(e["t"])
    assert seen == instants


def test_empty_table_schema_resolve_fails_clearly(tmp_path):
    """A just-created Hudi table (properties, no commits) has no base
    file to derive a schema from — the reader must raise a clear
    ValueError, not a bare StopIteration from dict iteration."""
    from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
        create_hudi_table,
        read_hudi_table,
    )
    from iceberg_metadata_pipeline_spark.ingest.pyhudi_source import (
        _resolve_schema,
    )

    loc = str(tmp_path / "empty_hudi")
    create_hudi_table(loc, "empty", [])
    state = read_hudi_table(loc)
    with pytest.raises(ValueError, match="no live base files"):
        _resolve_schema(state)


def test_schema_pick_is_deterministic(spark, hudi_dir):
    """_resolve_schema reads the footer of the LOWEST (partition, fileId)
    key, not whatever dict insertion order yields — same table state must
    always pick the same file."""
    from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
        read_hudi_table,
    )
    from iceberg_metadata_pipeline_spark.ingest.pyhudi_source import (
        _resolve_schema,
    )

    _t, dest = hudi_dir
    state = read_hudi_table(dest)
    s1, fc1, pc1 = _resolve_schema(state)
    # re-insert the file map in reversed order: resolution must not change
    state.files = dict(sorted(state.files.items(), reverse=True))
    s2, fc2, pc2 = _resolve_schema(state)
    assert (s1, fc1, pc1) == (s2, fc2, pc2)


def test_batch_writer_append_overwrite_time_travel(spark, tmp_path):
    """df.write.format('pyhudi'): the two-phase COW writer — tasks
    write invisible tmp files, the driver commits ONE timeline instant
    (commit for append, replacecommit retiring the previous groups for
    overwrite). Reads, time travel, and the streaming tail all see the
    writer's commits like any other Hudi instant."""
    import os
    from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
        read_hudi_table,
    )

    register(spark)
    dest = str(tmp_path / "hudi_w")
    spark.range(10).selectExpr("id").repartition(3).write.format(
        "pyhudi"
    ).mode("append").save(dest)
    got = spark.read.format("pyhudi").load(dest)
    assert sorted(r.id for r in got.collect()) == list(range(10))
    t1 = completed_instants(dest)[-1].time

    spark.range(10, 15).selectExpr("id").write.format("pyhudi").mode(
        "append"
    ).save(dest)
    assert spark.read.format("pyhudi").load(dest).count() == 15

    spark.range(100, 103).selectExpr("id").write.format("pyhudi").mode(
        "overwrite"
    ).save(dest)
    ins = completed_instants(dest)
    assert ins[-1].action == "replacecommit"
    assert sorted(
        r.id for r in spark.read.format("pyhudi").load(dest).collect()
    ) == [100, 101, 102]
    # time travel to before the overwrite still sees the first append
    old = spark.read.format("pyhudi").option("asOfInstant", t1).load(dest)
    assert sorted(r.id for r in old.collect()) == list(range(10))
    # no tmp litter after commits
    assert not [f for f in os.listdir(dest) if f.startswith("_tmp-")]


def test_batch_writer_refusals(spark, tmp_path):
    """Writer bounds refuse loudly: MOR tables (log-append protocol
    owns writes) and a partitionBy column missing from the dataframe
    schema. (Partitioned COW writes themselves are served since round
    9 — see test_batch_writer_partitioned.)"""
    import pytest
    from pyspark.sql import types as T

    from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
        bulk_insert_mor,
        create_mor_table,
    )

    register(spark)
    sch = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("cat", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )
    mor = str(tmp_path / "morw")
    create_mor_table(mor, "morw", [], "id", sch)
    bulk_insert_mor(mor, [{"id": 1, "cat": "a", "score": 0.1}])
    with pytest.raises(Exception, match="MERGE_ON_READ"):
        spark.range(1).selectExpr("id").write.format("pyhudi").mode(
            "append"
        ).save(mor)
    with pytest.raises(Exception, match="partitionBy"):
        spark.range(1).selectExpr("id").write.format("pyhudi").option(
            "partitionBy", "ghost"
        ).mode("append").save(str(tmp_path / "ghostw"))


def test_batch_writer_partitioned(spark, tmp_path):
    """Round 9 (verdict #3): partitioned pyhudi COW writes. Write tasks
    route rows into hive partition dirs (canonical null token included),
    per-partition write stats land in the commit, appends to an
    existing partitioned table pick the fields up from properties, and
    overwrite retires every partition's file groups in one
    replacecommit."""
    import os

    from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
        read_hudi_table,
    )

    register(spark)
    dest = str(tmp_path / "hudi_p")
    df = spark.range(12).selectExpr(
        "id", "CASE WHEN id % 3 = 2 THEN NULL ELSE concat('c', id % 3) END AS cat"
    )
    df.write.format("pyhudi").option("partitionBy", "cat").mode(
        "append"
    ).save(dest)
    # second append WITHOUT the option: fields come from properties
    spark.createDataFrame([(100, "zz")], "id long, cat string").write.format(
        "pyhudi"
    ).mode("append").save(dest)

    got = sorted(
        (r.id, r.cat) for r in spark.read.format("pyhudi").load(dest).collect()
    )
    exp = sorted(
        [(i, None if i % 3 == 2 else f"c{i % 3}") for i in range(12)]
        + [(100, "zz")]
    )
    assert got == exp
    st = read_hudi_table(dest)
    parts = {p for (p, _f) in st.files}
    assert parts == {
        "cat=c0", "cat=c1", "cat=__HIVE_DEFAULT_PARTITION__", "cat=zz"
    }
    assert os.path.exists(
        os.path.join(dest, "cat=zz", ".hoodie_partition_metadata")
    )
    # overwrite replaces ALL partitions atomically
    spark.createDataFrame([(7, "c0")], "id long, cat string").write.format(
        "pyhudi"
    ).mode("overwrite").save(dest)
    assert sorted(
        (r.id, r.cat) for r in spark.read.format("pyhudi").load(dest).collect()
    ) == [(7, "c0")]
    # time travel still sees the pre-overwrite snapshot
    prev = [i.time for i in __import__(
        "iceberg_metadata_pipeline_spark.catalog.hudi_format",
        fromlist=["completed_instants"],
    ).completed_instants(dest)][-2]
    old = spark.read.format("pyhudi").option("asOfInstant", prev).load(dest)
    assert old.count() == 13


def test_stream_writer_exactly_once(spark, tmp_path):
    """writeStream.format('pyhudi'): one timeline instant per epoch;
    the commit's extraMetadata carries the (appId, epoch) marker and a
    re-delivered epoch commits nothing (tmp cleaned up); a new epoch
    advances the watermark."""
    import os
    import types

    from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
        read_hudi_table,
        read_instant_metadata,
    )
    from iceberg_metadata_pipeline_spark.ingest.pyhudi_source import (
        PyHudiStreamWriter,
    )

    register(spark)
    src = str(tmp_path / "src")
    spark.range(5).selectExpr("id").write.format("pyhudi").mode("append").save(src)
    dest = str(tmp_path / "sink")
    q = (
        spark.readStream.format("pyhudi")
        .load(src)
        .writeStream.format("pyhudi")
        .option("path", dest)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(
        r.id for r in spark.read.format("pyhudi").load(dest).collect()
    ) == list(range(5))
    ins = completed_instants(dest)
    em = read_instant_metadata(dest, ins[-1])["extraMetadata"]
    assert em["streamAppId"] == "pyhudi-sink" and em["streamBatchId"] == "0"

    w = PyHudiStreamWriter(
        spark.read.format("pyhudi").load(dest).schema, {"path": dest}, False
    )
    ghost = str(tmp_path / "_tmp-ghost.parquet")
    open(ghost, "wb").write(b"x")
    n_files = len(read_hudi_table(dest).files)
    w.commit(
        [types.SimpleNamespace(files=((ghost, 99, 1, ""),))], batchId=0
    )  # duplicate epoch → dropped
    assert len(read_hudi_table(dest).files) == n_files
    assert not os.path.exists(ghost)

    # a NEW epoch commits normally
    import shutil

    d2 = str(tmp_path / "one")
    spark.createDataFrame([(7,)], "id long").coalesce(1).write.parquet(d2)
    f2 = next(os.path.join(d2, n) for n in os.listdir(d2) if n.endswith(".parquet"))
    tmp2 = str(tmp_path / "epoch1.parquet")
    shutil.copy(f2, tmp2)
    w.commit(
        [types.SimpleNamespace(files=((tmp2, 1, os.path.getsize(tmp2), ""),))],
        batchId=1,
    )
    assert spark.read.format("pyhudi").load(dest).count() == 6


def test_stream_writer_partitioned(spark, tmp_path):
    """Stream writer inherits partitioned COW routing (round 9): epoch
    rows land under hive partition dirs and read back via pyhudi."""
    from iceberg_metadata_pipeline_spark.ingest.pyhudi_source import register

    register(spark)
    src = str(tmp_path / "src")
    spark.sql(
        "SELECT id, IF(id % 2 = 0, 'e', 'o') AS cat FROM RANGE(8)"
    ).write.format("pyhudi").mode("append").save(src)
    dest = str(tmp_path / "sink")
    q = (
        spark.readStream.format("pyhudi")
        .load(src)
        .writeStream.format("pyhudi")
        .option("path", dest)
        .option("partitionBy", "cat")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.format("pyhudi").load(dest)
    rows = {(r["id"], r["cat"]) for r in back.collect()}
    assert rows == {(i, "e" if i % 2 == 0 else "o") for i in range(8)}
    import os as _os

    assert _os.path.isdir(_os.path.join(dest, "cat=e"))
    assert _os.path.isdir(_os.path.join(dest, "cat=o"))
