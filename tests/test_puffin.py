"""Puffin statistics files (catalog/puffin.py): byte-level structure
per the public puffin-spec, round-trips, refusal paths, and the
end-to-end NDV flow (theta_sketch_agg → puffin → metadata statistics →
read_ndv_statistics)."""

from __future__ import annotations

import json
import struct

import pytest
from pyspark.sql import types as T

from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
    export_iceberg_table,
)
from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
from iceberg_metadata_pipeline_spark.catalog.puffin import (
    MAGIC,
    attach_ndv_statistics,
    read_ndv_statistics,
    read_puffin,
    write_puffin,
)


def test_file_structure_matches_spec(tmp_path):
    p = str(tmp_path / "t.stats")
    payload = b"\x01\x02\x03\x04\x05"
    blob_meta, footer_size = write_puffin(
        p,
        [
            {
                "type": "apache-datasketches-theta-v1",
                "fields": [3],
                "snapshot-id": 99,
                "sequence-number": 2,
                "payload": payload,
                "properties": {"ndv": "41"},
            }
        ],
        {"created-by": "test"},
    )
    data = open(p, "rb").read()
    # spec layout: leading magic; blob starts right after it
    assert data[:4] == MAGIC and data[-4:] == MAGIC
    assert blob_meta[0]["offset"] == 4 and blob_meta[0]["length"] == 5
    assert data[4:9] == payload
    # trailing structure: ...Magic | payload | size | flags | Magic
    (size,) = struct.unpack("<i", data[-12:-8])
    footer = json.loads(data[-12 - size : -12])
    assert footer["blobs"][0]["properties"]["ndv"] == "41"
    assert data[-12 - size - 4 : -12 - size] == MAGIC
    assert data[-8:-4] == b"\x00\x00\x00\x00"
    assert footer_size == 4 + size + 12
    # independent re-read agrees
    blobs, props = read_puffin(p)
    assert blobs[0][1] == payload and props["created-by"] == "test"
    assert blobs[0][0]["fields"] == [3] and blobs[0][0]["snapshot-id"] == 99


def test_multi_blob_round_trip(tmp_path):
    p = str(tmp_path / "m.stats")
    bs = [
        {
            "type": "apache-datasketches-theta-v1",
            "fields": [i],
            "snapshot-id": 1,
            "sequence-number": 1,
            "payload": bytes(range(i + 1)) * 3,
            "properties": {"ndv": str(i * 10)},
        }
        for i in range(4)
    ]
    write_puffin(p, bs)
    blobs, _ = read_puffin(p)
    assert [b[1] for b in blobs] == [b["payload"] for b in bs]


def test_refusals(tmp_path):
    bad = tmp_path / "bad.stats"
    bad.write_bytes(b"NOPE" + b"x" * 40)
    with pytest.raises(ValueError, match="magic"):
        read_puffin(str(bad))
    # compressed-footer flag refused, not misparsed
    p = str(tmp_path / "flag.stats")
    write_puffin(p, [])
    data = bytearray(open(p, "rb").read())
    data[-8] |= 0x01
    open(p, "wb").write(bytes(data))
    with pytest.raises(NotImplementedError, match="compressed"):
        read_puffin(p)


def test_ndv_statistics_end_to_end(spark, tmp_path):
    catalog = Catalog(spark, str(tmp_path / "wh"))
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("grp", T.StringType(), True),
        ]
    )
    t = catalog.create_table("nyc", "stats_src", st).refresh()
    t.append_dataframe(
        spark.sql("SELECT id, concat('g', CAST(id % 7 AS STRING)) AS grp FROM RANGE(500)")
    )
    t = t.refresh()
    meta_path = export_iceberg_table(t, str(tmp_path / "ice"))
    stats_path = attach_ndv_statistics(spark, t, meta_path, ["id", "grp"])

    md = json.load(open(meta_path))
    entry = md["statistics"][0]
    assert entry["snapshot-id"] == int(t.current_snapshot["snapshot_id"])
    assert entry["statistics-path"] == stats_path
    import os

    assert entry["file-size-in-bytes"] == os.path.getsize(stats_path)

    # engines read the ndv property: id exact-unique, grp 7 groups
    # (theta sketch is exact far below its nominal 4096 entries)
    ndv = read_ndv_statistics(meta_path)
    fids = {f["name"]: f["id"] for f in md["schemas"][0]["fields"]}
    assert ndv[fids["grp"]] == 7
    assert abs(ndv[fids["id"]] - 500) <= 5
    # sketch payloads are real DataSketches bytes: Spark itself can
    # estimate from them (round-trip through the binary)
    blobs, _ = read_puffin(stats_path)
    sk = next(b for bm, b in blobs if bm["fields"] == [fids["grp"]])
    est = spark.sql(
        "SELECT CAST(theta_sketch_estimate(X'"
        + sk.hex()
        + "') AS BIGINT) AS e"
    ).collect()[0]["e"]
    assert est == 7
    # re-attach for the same snapshot replaces, not duplicates
    attach_ndv_statistics(spark, t, meta_path, ["grp"])
    md2 = json.load(open(meta_path))
    assert len(md2["statistics"]) == 1


def test_attach_refuses_unknown_column(spark, tmp_path):
    catalog = Catalog(spark, str(tmp_path / "wh2"))
    st = T.StructType([T.StructField("x", T.LongType(), True)])
    t = catalog.create_table("nyc", "s2", st).refresh()
    t.append_dataframe(spark.range(3).selectExpr("id AS x"))
    meta_path = export_iceberg_table(t.refresh(), str(tmp_path / "ice2"))
    with pytest.raises(ValueError, match="not in exported schema"):
        attach_ndv_statistics(spark, t.refresh(), meta_path, ["ghost"])


def test_statistics_survive_re_export(spark, tmp_path):
    """A fresh export of the SAME snapshot carries the previously
    attached statistics forward (dropping them silently would starve
    the CBO); a new snapshot's export does not inherit stale stats."""
    catalog = Catalog(spark, str(tmp_path / "wh3"))
    st = T.StructType([T.StructField("x", T.LongType(), True)])
    t = catalog.create_table("nyc", "s3", st).refresh()
    t.append_dataframe(spark.range(50).selectExpr("id AS x"))
    t = t.refresh()
    dest = str(tmp_path / "ice3")
    meta_path = export_iceberg_table(t, dest)
    attach_ndv_statistics(spark, t, meta_path, ["x"])
    meta2 = export_iceberg_table(t, dest)  # same snapshot: no-op (r9)
    md2 = json.load(open(meta2))
    assert len(md2.get("statistics", [])) == 1
    assert read_ndv_statistics(meta2)  # readable through the new version
    # r9 semantics: an APPEND commits incrementally and RETAINS the old
    # snapshot's stats entry (it stays attributed to that snapshot-id in
    # the history); read_ndv_statistics serves it as the ancestor
    # fallback estimate for the new snapshot
    t.append_dataframe(spark.range(3).selectExpr("id AS x"))
    meta3 = export_iceberg_table(t.refresh(), dest)
    md3 = json.load(open(meta3))
    assert len(md3.get("statistics", [])) == 1
    assert md3["statistics"][0]["snapshot-id"] != md3["current-snapshot-id"]
    assert read_ndv_statistics(meta3)  # ancestor fallback still serves
    # r12: a COW delete now exports as an O(churn) replace-diff that
    # RETAINS history — the ancestor's stats entry survives and keeps
    # serving as the fallback estimate (same semantics as the append
    # case above)
    t = t.refresh()
    t.delete_where("x >= 50")
    meta4 = export_iceberg_table(t.refresh(), dest)
    md4 = json.load(open(meta4))
    assert len(md4.get("statistics", [])) == 1
    assert read_ndv_statistics(meta4)  # ancestor fallback still serves
    # a SCHEMA change takes the full-rewrite export, which resets
    # history and does NOT inherit stale stats (the original contract)
    t.refresh().add_column("extra_stats_col", "bigint")
    meta5 = export_iceberg_table(t.refresh(), dest)
    assert json.load(open(meta5)).get("statistics", []) == []
