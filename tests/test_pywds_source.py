"""pywds WebDataset tar-shard source/sink: member naming convention,
binary pass-through, distributed shard write, sample regrouping."""

from __future__ import annotations

import io
import os
import tarfile

import pytest

from iceberg_metadata_pipeline_spark.ingest.pywds_source import (
    register,
    write_webdataset_shards,
)


def _hand_shard(path: str, members: dict[str, bytes]) -> None:
    with tarfile.open(path, "w") as tf:
        for name, data in members.items():
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))


def test_reads_hand_built_shards_with_wds_naming(spark, tmp_path):
    """Key = up to the FIRST dot; ext = the rest (so 'a.seg.png' under
    key 'a' has ext 'seg.png' — the WebDataset convention)."""
    d = str(tmp_path / "shards")
    os.makedirs(d)
    _hand_shard(
        os.path.join(d, "s0.tar"),
        {"a.txt": b"hello", "a.seg.png": b"\x89PNG", "b.txt": b"world"},
    )
    _hand_shard(os.path.join(d, "s1.tar"), {"c.json": b"{}"})
    register(spark)
    rows = {
        (r.shard, r.key, r.ext): bytes(r.data)
        for r in spark.read.format("pywds").load(d).collect()
    }
    assert rows[("s0.tar", "a", "txt")] == b"hello"
    assert rows[("s0.tar", "a", "seg.png")] == b"\x89PNG"
    assert rows[("s1.tar", "c", "json")] == b"{}"
    assert len(rows) == 4


def test_write_round_trip_with_binary_members(spark, tmp_path):
    d = str(tmp_path / "out")
    df = spark.createDataFrame(
        [(f"k{i}", f"text {i}", bytes([i, i + 1])) for i in range(10)],
        "key string, txt string, blob binary",
    ).repartition(3)
    manifest = write_webdataset_shards(df, d).collect()
    assert len(manifest) == 3
    assert sum(m.n_members for m in manifest) == 20
    assert all(os.path.exists(m.shard) for m in manifest)
    register(spark)
    back = spark.read.format("pywds").load(d)
    got = {(r.key, r.ext): bytes(r.data) for r in back.collect()}
    assert got[("k3", "txt")] == b"text 3"
    assert got[("k3", "blob")] == bytes([3, 4])
    assert len(got) == 20
    # regrouping members into samples is a plain aggregate
    from pyspark.sql import functions as F

    samples = (
        back.groupBy("key")
        .agg(F.map_from_entries(F.collect_list(F.struct("ext", "data"))).alias("m"))
        .collect()
    )
    by_key = {r.key: r.m for r in samples}
    assert set(by_key["k7"].keys()) == {"txt", "blob"}


def test_empty_partitions_make_valid_empty_shards(spark, tmp_path):
    d = str(tmp_path / "sparse")
    df = spark.createDataFrame([("k0", "x")], "key string, txt string").repartition(4)
    manifest = write_webdataset_shards(df, d).collect()
    assert len(manifest) == 4 and sum(m.n_members for m in manifest) == 1
    register(spark)
    assert spark.read.format("pywds").load(d).count() == 1


def test_missing_dir_and_no_members_fail_loudly(spark, tmp_path):
    from iceberg_metadata_pipeline_spark.ingest.pywds_source import PyWdsReader

    with pytest.raises(FileNotFoundError, match="no .tar shards"):
        PyWdsReader({"path": str(tmp_path / "nope")})
    df = spark.createDataFrame([("k",)], "key string")
    with pytest.raises(ValueError, match="member column"):
        write_webdataset_shards(df, str(tmp_path / "x"))


def test_stream_tails_new_shards(spark, tmp_path):
    """readStream over a growing shard directory: first run drains the
    existing shards; a shard that appears later is emitted exactly once
    on restart (offset = sorted shard-name position in the checkpoint)."""
    d = str(tmp_path / "grow")
    os.makedirs(d)
    _hand_shard(os.path.join(d, "shard-000000.tar"), {"a.txt": b"1", "b.txt": b"2"})
    _hand_shard(os.path.join(d, "shard-000001.tar"), {"c.txt": b"3"})
    register(spark)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("pywds")
            .load(d)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == 3
    _hand_shard(os.path.join(d, "shard-000002.tar"), {"d.txt": b"4", "e.txt": b"5"})
    run_once()
    got = spark.read.parquet(out)
    assert got.count() == 5
    assert sorted(r.key for r in got.collect()) == ["a", "b", "c", "d", "e"]


def test_stream_max_shards_per_trigger(spark, tmp_path):
    """maxShardsPerTrigger bounds each batch after the first: 3 new
    shards drain over multiple availableNow micro-batches, never more
    than one shard per batch past the checkpointed start."""
    d = str(tmp_path / "throttle")
    os.makedirs(d)
    for i in range(4):
        _hand_shard(
            os.path.join(d, f"shard-{i:06d}.tar"), {f"k{i}.txt": str(i).encode()}
        )
    register(spark)
    out = str(tmp_path / "sink2")
    q = (
        spark.readStream.format("pywds")
        .option("maxShardsPerTrigger", "1")
        .load(d)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    assert got.count() == 4
    assert sorted(r.key for r in got.collect()) == ["k0", "k1", "k2", "k3"]
