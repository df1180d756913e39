"""Streaming reads FROM catalog tables (streaming/table_source.py) — the
Iceberg streaming-source analogue on Spark 4's Python DataSource API."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import types as T

from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
from iceberg_metadata_pipeline_spark.streaming.table_source import (
    CatalogTableDataSource,
    read_table_stream,
)


@pytest.fixture()
def feed_table(spark, tmp_path):
    catalog = Catalog(spark, str(tmp_path / "wh"))
    t = catalog.create_table(
        "nyc",
        "feed",
        T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
        ),
    )
    return t


def _drain(spark, df, ckpt: str, out: str) -> list[tuple]:
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        return sorted((r["id"], r["name"]) for r in spark.read.parquet(out).collect())
    except Exception:  # noqa: BLE001 — zero batches yet: sink dir empty
        return []


def test_stream_append_feed_exactly_once(spark, feed_table, tmp_path):
    """Each availableNow pass consumes exactly the commits since the
    checkpointed snapshot offset: no re-reads, no gaps, restart-safe."""
    t = feed_table
    t.append_dataframe(spark.createDataFrame([(1, "a"), (2, "b")], t.schema))
    df = read_table_stream(spark, t)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    assert _drain(spark, df, ckpt, out) == [(1, "a"), (2, "b")]

    t.refresh()
    t.append_dataframe(spark.createDataFrame([(3, "c")], t.schema))
    assert _drain(spark, df, ckpt, out) == [(1, "a"), (2, "b"), (3, "c")]
    # no new commits → no new rows (idempotent replay from checkpoint)
    assert _drain(spark, df, ckpt, out) == [(1, "a"), (2, "b"), (3, "c")]


def test_stream_multi_commit_batch_and_from_snapshot(spark, feed_table, tmp_path):
    """A batch spanning several commits delivers all of them; the
    from-snapshot-id option starts the stream mid-history (exclusive)."""
    t = feed_table
    snap1 = t.append_dataframe(spark.createDataFrame([(1, "a")], t.schema))
    t.refresh()
    t.append_dataframe(spark.createDataFrame([(2, "b")], t.schema))
    t.refresh()
    t.append_dataframe(spark.createDataFrame([(3, "c")], t.schema))

    whole = read_table_stream(spark, t)
    assert _drain(spark, whole, str(tmp_path / "c1"), str(tmp_path / "o1")) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]
    tail = read_table_stream(spark, t, from_snapshot_id=snap1)
    assert _drain(spark, tail, str(tmp_path / "c2"), str(tmp_path / "o2")) == [
        (2, "b"),
        (3, "c"),
    ]


def test_stream_non_append_commit_raises_unless_skipped(spark, feed_table, tmp_path):
    """Iceberg contract: a delete in range fails the append feed; the
    skip option (streaming-skip-delete-snapshots analogue) skips that
    commit and streams the appends around it."""
    t = feed_table
    t.append_dataframe(spark.createDataFrame([(1, "a"), (2, "b")], t.schema))
    t.refresh()
    t.delete_where("id = 1")
    t.refresh()
    t.append_dataframe(spark.createDataFrame([(3, "c")], t.schema))

    df = read_table_stream(spark, t)
    q = (
        df.writeStream.format("parquet")
        .option("path", str(tmp_path / "o3"))
        .option("checkpointLocation", str(tmp_path / "c3"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="non-append"):
        q.awaitTermination(120)

    skipping = read_table_stream(
        spark, t, **{"skip-non-append-snapshots": "true"}
    )
    got = _drain(spark, skipping, str(tmp_path / "c4"), str(tmp_path / "o4"))
    # the append feed ignores the delete: row (1,'a') still streams
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_stream_schema_comes_from_table_metadata(spark, feed_table):
    t = feed_table
    t.append_dataframe(spark.createDataFrame([(1, "a")], t.schema))
    try:
        spark.dataSource.register(CatalogTableDataSource)
    except Exception:  # noqa: BLE001
        pass
    df = (
        spark.readStream.format("metacat_table")
        .option("location", t.location)
        .load()
    )
    assert df.schema == t.schema
    assert df.isStreaming


def test_stream_rate_limit_commits_per_microbatch(spark, feed_table, tmp_path):
    """max-commits-per-microbatch is the backpressure valve (Iceberg's
    streaming-max-files-per-micro-batch analogue): a 4-commit backlog
    drains completely but across MULTIPLE micro-batches, never one giant
    batch — at 100 TB a cold-start consumer must not take the whole
    backlog into a single batch's state."""
    t = feed_table
    for i in range(4):
        t.refresh()
        t.append_dataframe(
            spark.createDataFrame([(i, f"v{i}")], t.schema)
        )
    import time

    df = read_table_stream(spark, t, **{"max-commits-per-microbatch": "1"})
    # continuous mode: each micro-batch cycle asks latestOffset again, so
    # the cap chunks the backlog (availableNow pins ONE end offset up
    # front, which would freeze a capped stream at its first chunk)
    q = (
        df.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        got: list[tuple] = []
        while time.time() < deadline and len(got) < 4:
            time.sleep(1)
            try:
                got = sorted(
                    (r["id"], r["name"])
                    for r in spark.read.parquet(str(tmp_path / "out")).collect()
                )
            except Exception:  # noqa: BLE001 — sink not yet materialized
                got = []
    finally:
        q.stop()
    assert got == [(0, "v0"), (1, "v1"), (2, "v2"), (3, "v3")]
    # ≥4 offset files → the backlog drained across ≥4 capped micro-batches
    import glob as _glob

    batches = _glob.glob(str(tmp_path / "ckpt" / "offsets" / "*"))
    assert len(batches) >= 4, batches


def test_cdc_loop_stream_enrich_upsert(spark, tmp_path):
    """The full CDC loop composes: appends stream OUT of one catalog
    table, enrich against a static dimension (broadcast join), aggregate
    per key in foreachBatch, and UPSERT into a second catalog table via
    the MOR merge sink — exactly-once per epoch. Proves source, catalog,
    join, and sink seams fit together, not just individually."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog

    catalog = Catalog(spark, str(tmp_path / "wh"))
    src = catalog.create_table(
        "nyc",
        "cdc_src",
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("region_id", T.LongType()),
                T.StructField("amount", T.DoubleType()),
            ]
        ),
    )
    agg_schema = T.StructType(
        [
            T.StructField("region", T.StringType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    dst = catalog.create_table("nyc", "cdc_agg", agg_schema)
    dst.set_identifier_fields(["region"])
    dim = spark.createDataFrame([(1, "eu"), (2, "us")], "region_id long, region string")

    running: dict[str, float] = {}

    def process(batch_df, epoch_id):
        rows = (
            batch_df.join(F.broadcast(dim), "region_id")
            .groupBy("region")
            .agg(F.sum("amount").alias("total"))
            .collect()
        )
        for r in rows:
            running[r["region"]] = running.get(r["region"], 0.0) + r["total"]
        upsert = spark.createDataFrame(
            [(k, v) for k, v in running.items()], agg_schema
        )
        dst.refresh()
        dst.merge_into_mor(upsert, when_matched_set={"total": "src_total"})

    src.append_dataframe(
        spark.createDataFrame([(1, 1, 10.0), (2, 2, 5.0)], src.schema)
    )

    def drain():
        from iceberg_metadata_pipeline_spark.streaming.table_source import (
            read_table_stream,
        )

        q = (
            read_table_stream(spark, src)
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    dst.refresh()
    assert {(r["region"], r["total"]) for r in dst.scan().collect()} == {
        ("eu", 10.0),
        ("us", 5.0),
    }

    # second batch of appends updates the aggregate through the same loop
    src.refresh()
    src.append_dataframe(
        spark.createDataFrame([(3, 1, 7.0)], src.schema)
    )
    drain()
    dst.refresh()
    assert {(r["region"], r["total"]) for r in dst.scan().collect()} == {
        ("eu", 17.0),
        ("us", 5.0),
    }


def test_table_sink_stream_end_to_end(spark, tmp_path):
    """Python DataSource SINK: a catalog table streams through
    read_table_stream into ANOTHER catalog table via the
    metacat_table_sink writer — executor-written parquet files, one
    atomic append commit per micro-batch, snapshot lineage at both hops.
    A second run with a new source commit appends only the delta
    (checkpoint offsets + on-disk epoch replay check)."""
    from pyspark.sql import types as T

    from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
    from iceberg_metadata_pipeline_spark.streaming.table_source import (
        read_table_stream,
    )
    from iceberg_metadata_pipeline_spark.streaming.table_sink import (
        write_table_stream,
    )

    catalog = Catalog(spark, str(tmp_path / "wh"))
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    src = catalog.create_table("nyc", "sink_src", schema)
    dst = catalog.create_table("nyc", "sink_dst", schema)
    src.append_dataframe(spark.createDataFrame([(1, "a"), (2, "b")], schema))
    src.refresh()

    ckpt = str(tmp_path / "ckpt")
    q = write_table_stream(
        read_table_stream(spark, src), dst, ckpt
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    dst.refresh()
    assert {(r["id"], r["v"]) for r in dst.scan().collect()} == {(1, "a"), (2, "b")}
    n_snaps = len(dst.meta["snapshots"])

    # new source commit → second run ships ONLY the delta
    src.append_dataframe(spark.createDataFrame([(3, "c")], schema))
    src.refresh()
    q = write_table_stream(
        read_table_stream(spark, src), dst, ckpt
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    dst.refresh()
    assert {(r["id"], r["v"]) for r in dst.scan().collect()} == {
        (1, "a"), (2, "b"), (3, "c")}
    assert len(dst.meta["snapshots"]) == n_snaps + 1  # one batch, one commit


def test_table_sink_replayed_epoch_drops_files(spark, tmp_path):
    """A replayed micro-batch (same batchId after restart) is detected
    from the on-disk epoch property: its files are dropped, not
    double-appended."""
    from pyspark.sql import types as T

    from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
    from iceberg_metadata_pipeline_spark.streaming.table_sink import (
        CatalogTableStreamWriter,
        _FileCommit,
    )

    catalog = Catalog(spark, str(tmp_path / "wh"))
    schema = T.StructType([T.StructField("id", T.LongType())])
    t = catalog.create_table("nyc", "replay", schema)

    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    def fake_file(vals):
        p = os.path.join(t.location, "data", f"f{vals[0]}.parquet")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        pq.write_table(pa.table({"id": vals}), p)
        return _FileCommit(path=p, rows=len(vals), size=os.path.getsize(p))

    w = CatalogTableStreamWriter(schema, {"location": t.location})
    w.commit([fake_file([1, 2])], batchId=0)
    t.refresh()
    assert t.scan().count() == 2
    # replay of batch 0 with a fresh file: dropped, table unchanged
    replay = fake_file([9, 9])
    w.commit([replay], batchId=0)
    t.refresh()
    assert t.scan().count() == 2
    assert not os.path.exists(replay.path)
    # next epoch appends normally
    w.commit([fake_file([3])], batchId=1)
    t.refresh()
    assert t.scan().count() == 3


def test_table_sink_batch_write(spark, tmp_path):
    """Batch df.write through the same DataSource: executor-parallel
    files, one atomic append commit for the whole write."""
    from pyspark.sql import types as T

    from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
    from iceberg_metadata_pipeline_spark.streaming.table_sink import (
        CatalogTableSinkDataSource,
    )

    catalog = Catalog(spark, str(tmp_path / "wh"))
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = catalog.create_table("nyc", "batchsink", schema)
    spark.dataSource.register(CatalogTableSinkDataSource)
    spark.createDataFrame([(i, f"x{i}") for i in range(20)], schema).repartition(
        4
    ).write.format("metacat_table_sink").option("location", t.location).mode(
        "append"
    ).save()
    t.refresh()
    assert t.scan().count() == 20
    assert len(t.meta["snapshots"]) == 1  # one atomic commit for the write
