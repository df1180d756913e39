"""Roaring bitmap portable serde (catalog/roaring.py) + Iceberg v3
deletion-vector blobs (catalog/puffin.py): byte-level goldens derived
by hand from the public RoaringFormatSpec, property-based round-trips,
and the end-to-end import path applying a PUFFIN deletion vector."""

from __future__ import annotations

import json
import os
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_metadata_pipeline_spark.catalog.puffin import (
    decode_dv_payload,
    encode_dv_payload,
    read_deletion_vectors,
    write_deletion_vectors,
)
from iceberg_metadata_pipeline_spark.catalog.roaring import (
    deserialize32,
    deserialize64,
    serialize32,
    serialize64,
)


def test_golden_empty():
    # spec: no-run cookie 12346 LE + zero containers
    assert serialize32([]) == bytes.fromhex("3a30000000000000")
    assert deserialize32(serialize32([]))[0] == []


def test_golden_sparse_array_container():
    # {5, 7}: array container beats a 1-run?-no: runs of [5],[7] cost
    # 2+8=10 > array 4 → no-run cookie, 1 container, offsets present
    data = serialize32([5, 7])
    # cookie 12346 | count 1 | key 0, card-1 = 1 | offset 16 | values
    expect = (
        struct.pack("<II", 12346, 1)
        + struct.pack("<HH", 0, 1)
        + struct.pack("<I", 16)
        + struct.pack("<HH", 5, 7)
    )
    assert data == expect
    assert deserialize32(data)[0] == [5, 7]


def test_golden_run_container():
    # {0..3}: one run (cost 6) beats array (8) → run cookie, count-1=0
    # in the upper 16 bits, 1-byte run flag, no offsets (count < 4)
    data = serialize32([0, 1, 2, 3])
    expect = (
        struct.pack("<I", 12347 | (0 << 16))
        + b"\x01"
        + struct.pack("<HH", 0, 3)
        + struct.pack("<H", 1)
        + struct.pack("<HH", 0, 3)
    )
    assert data == expect
    assert deserialize32(data)[0] == [0, 1, 2, 3]


def test_golden_two_containers_cross_key():
    # 65536 = key 1 → two containers, second holds low value 0
    data = serialize32([1, 65536])
    vals, consumed = deserialize32(data)
    assert vals == [1, 65536] and consumed == len(data)
    (cookie,) = struct.unpack_from("<I", data, 0)
    assert cookie == 12346  # two single-value arrays, no runs


def test_bitmap_container_threshold():
    # >4096 values in one 16-bit chunk forces the 8 KiB bitmap container
    vals = list(range(0, 9000, 2))  # 4500 even values, runs don't help
    data = serialize32(vals)
    out, _ = deserialize32(data)
    assert out == vals
    assert len(data) > 8192  # bitmap container present


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(0, 2**32 - 1),
            st.integers(0, 300),  # dense low range → runs
            st.integers(65530, 65600),  # cross-container boundary
        ),
        max_size=600,
    )
)
def test_round_trip32(values):
    distinct = sorted(set(values))
    out, consumed = deserialize32(serialize32(values))
    assert out == distinct
    assert consumed == len(serialize32(values))


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(0, 2**64 - 1),
            st.integers(2**33, 2**33 + 100),
        ),
        max_size=300,
    )
)
def test_round_trip64(values):
    assert deserialize64(serialize64(values)) == sorted(set(values))


def test_dv_payload_framing_and_crc():
    payload = encode_dv_payload([3, 1, 4, 1, 5])
    (ln,) = struct.unpack_from(">i", payload, 0)
    assert payload[4:8] == b"\xd1\xd3\x39\x64"
    assert len(payload) == 4 + ln + 4
    assert decode_dv_payload(payload) == [1, 3, 4, 5]
    corrupted = payload[:10] + bytes([payload[10] ^ 0xFF]) + payload[11:]
    with pytest.raises(ValueError, match="CRC|magic"):
        decode_dv_payload(corrupted)


def test_dv_file_round_trip(tmp_path):
    p = str(tmp_path / "dvs.puffin")
    meta = write_deletion_vectors(
        p, {"/data/a.parquet": [0, 2, 9], "/data/b.parquet": [5]}, 42, 3
    )
    assert meta["/data/a.parquet"]["cardinality"] == 3
    got = dict(read_deletion_vectors(p))
    assert got == {"/data/a.parquet": [0, 2, 9], "/data/b.parquet": [5]}
    # offset-pinned read returns exactly one blob
    only = read_deletion_vectors(p, meta["/data/b.parquet"]["offset"])
    assert only == [("/data/b.parquet", [5])]
    with pytest.raises(ValueError, match="no deletion-vector blob"):
        read_deletion_vectors(p, 999999)


def test_import_applies_puffin_deletion_vector(spark, tmp_path):
    """End-to-end v3 shape: a delete manifest entry whose file is a
    PUFFIN deletion vector; import materializes live rows minus the
    vector's positions."""
    from iceberg_metadata_pipeline_spark.catalog import avro_io
    from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
        import_iceberg_table,
        manifest_entry_schema,
        manifest_list_schema,
        read_iceberg_table,
    )
    from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
    from tests.test_iceberg_format import _export_small_table

    meta_path = _export_small_table(spark, tmp_path)
    loc = os.path.dirname(os.path.dirname(meta_path))
    info0 = read_iceberg_table(loc)
    victim = sorted(f.path for f in info0.files)[0]
    import duckdb

    victim_ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT id FROM read_parquet('{victim}') LIMIT 2"
        ).fetchall()
    ]

    dv_path = os.path.join(loc, "data", "dvs.puffin")
    os.makedirs(os.path.dirname(dv_path), exist_ok=True)
    blob_info = write_deletion_vectors(dv_path, {victim: [0, 1]})

    # hand-append the DELETE snapshot (the fixture shape a real v3
    # runtime commits): PUFFIN-format entry with content_offset pinned
    md = json.load(open(meta_path))
    cur = next(
        s for s in md["snapshots"]
        if int(s["snapshot-id"]) == int(md["current-snapshot-id"])
    )
    new_seq = int(cur.get("sequence-number", 1)) + 1
    snap_id = 888111
    meta_dir = os.path.join(loc, "metadata")
    entry_schema = manifest_entry_schema([])
    dm = os.path.join(meta_dir, "dv-m0.avro")
    avro_io.write_container(
        dm,
        entry_schema,
        [
            {
                "status": 1,
                "snapshot_id": snap_id,
                "sequence_number": new_seq,
                "data_file": {
                    "content": 1,
                    "file_path": dv_path,
                    "file_format": "PUFFIN",
                    "partition": {},
                    "record_count": blob_info[victim]["cardinality"],
                    "file_size_in_bytes": os.path.getsize(dv_path),
                },
            }
        ],
    )
    _, _, old_manifests = avro_io.read_container(cur["manifest-list"])
    new_mlist = os.path.join(meta_dir, f"snap-{snap_id}.avro")
    avro_io.write_container(
        new_mlist,
        manifest_list_schema(),
        list(old_manifests)
        + [
            {
                "manifest_path": dm,
                "manifest_length": os.path.getsize(dm),
                "partition_spec_id": 0,
                "content": 1,
                "sequence_number": new_seq,
                "min_sequence_number": new_seq,
                "added_snapshot_id": snap_id,
                "added_files_count": 1,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": 2,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        ],
    )
    md["snapshots"].append(
        {
            "snapshot-id": snap_id,
            "sequence-number": new_seq,
            "timestamp-ms": 1700000000000,
            "manifest-list": new_mlist,
            "summary": {"operation": "delete"},
        }
    )
    md["current-snapshot-id"] = snap_id
    md["last-sequence-number"] = new_seq
    with open(os.path.join(meta_dir, "v99.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("99")

    info = read_iceberg_table(loc)
    assert len(info.delete_files) == 1 and info.delete_files[0].dv is not None

    t = import_iceberg_table(
        spark, Catalog(spark, str(tmp_path / "wh-dv")), loc, "nyc", "dv_in"
    )
    got = sorted(r["id"] for r in t.scan().collect())
    assert got == sorted(set(range(10)) - set(victim_ids))
