"""Property-based fuzz of the Iceberg v2 reader (r5 VERDICT #8).

The merge-on-read sequencing logic (iceberg_format.py: sequence-number
inheritance + _live_rows_dataframe's seq comparisons) is the subtlest
code in the repo and was example-tested only — and the r6 ADVICE found a
real inheritance bug exactly there. Two fuzz layers:

1. ``test_fuzz_read_iceberg_metadata``: hypothesis over randomized
   schemas / partition specs / manifest layouts / explicit-vs-inherited
   sequence numbers / DELETED entries — 200+ examples, metadata-only
   (milliseconds each), asserting read_iceberg_table reproduces the
   generated ground truth exactly.
2. ``test_fuzz_mor_live_rows``: seeded end-to-end cases through Spark —
   random data files with random sequence numbers, random position and
   equality deletes at random sequence numbers — comparing
   import_iceberg_table's scan against a pure-Python MOR oracle
   (pos delete: del_seq >= data_seq on (file, pos); eq delete:
   del_seq > data_seq on value equality — Iceberg spec "Scan Planning").
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import tempfile
import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_metadata_pipeline_spark.catalog import avro_io
from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
    manifest_entry_schema,
    manifest_list_schema,
    read_iceberg_table,
)

# iceberg type name -> (avro partition encoding supported?, spark simpleString)
_TYPES = ["long", "int", "string", "double", "date"]
_PARTITIONABLE = {"long": "bigint", "int": "int", "string": "string", "date": "date"}


@st.composite
def _table_layout(draw):
    n_fields = draw(st.integers(2, 5))
    types = [draw(st.sampled_from(_TYPES)) for _ in range(n_fields)]
    fields = [
        {"id": i + 1, "name": f"c{i}", "required": False, "type": t}
        for i, t in enumerate(types)
    ]
    # identity partition over 0-2 eligible columns
    eligible = [f for f in fields if f["type"] in _PARTITIONABLE]
    n_part = draw(st.integers(0, min(2, len(eligible))))
    part_fields = eligible[:n_part]

    def _part_value(t):
        if t == "string":
            return draw(st.one_of(st.none(), st.text("abxy", min_size=1, max_size=4)))
        if t == "date":
            return draw(st.one_of(st.none(), st.integers(0, 20000)))
        return draw(st.one_of(st.none(), st.integers(-5, 10_000)))

    manifests = []
    for mi in range(draw(st.integers(1, 3))):
        m_seq = draw(st.integers(0, 6))
        entries = []
        for ei in range(draw(st.integers(1, 4))):
            entries.append(
                {
                    "status": draw(st.sampled_from([1, 1, 1, 0, 2])),
                    "explicit_seq": draw(
                        st.one_of(st.none(), st.integers(1, 6))
                    ),
                    "record_count": draw(st.integers(0, 100)),
                    "file_size": draw(st.integers(1, 10_000)),
                    "partition": {
                        pf["name"]: _part_value(pf["type"]) for pf in part_fields
                    },
                }
            )
        manifests.append({"seq": m_seq, "entries": entries})

    del_manifests = []
    for mi in range(draw(st.integers(0, 2))):
        m_seq = draw(st.integers(1, 7))
        entries = []
        for ei in range(draw(st.integers(1, 3))):
            content = draw(st.sampled_from([1, 2]))
            eq_ids = (
                draw(
                    st.lists(
                        st.sampled_from([f["id"] for f in fields]),
                        min_size=1,
                        max_size=2,
                        unique=True,
                    )
                )
                if content == 2
                else None
            )
            entries.append(
                {
                    "status": draw(st.sampled_from([1, 1, 2])),
                    "explicit_seq": draw(st.one_of(st.none(), st.integers(1, 7))),
                    "content": content,
                    "eq_ids": eq_ids,
                    "record_count": draw(st.integers(1, 50)),
                }
            )
        del_manifests.append({"seq": m_seq, "entries": entries})
    return {
        "fields": fields,
        "part_fields": part_fields,
        "manifests": manifests,
        "del_manifests": del_manifests,
    }


def _write_synthetic_warehouse(layout, root: str) -> None:
    """Materialize the layout as a v2 metadata tree the way a REAL
    runtime would (inherited seqs left null, explicit seqs written)."""
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir)
    fields = layout["fields"]
    part_fields = layout["part_fields"]
    spec_fields_arg = [
        {"name": pf["name"], "source_type": _PARTITIONABLE[pf["type"]]}
        for pf in part_fields
    ]
    ice_spec = [
        {
            "name": pf["name"],
            "transform": "identity",
            "source-id": pf["id"],
            "field-id": 1000 + i,
        }
        for i, pf in enumerate(part_fields)
    ]
    entry_schema = manifest_entry_schema(spec_fields_arg)
    snap_id = 424242
    mlist_records = []
    fi = 0
    for mi, m in enumerate(layout["manifests"]):
        entries = []
        for e in m["entries"]:
            entries.append(
                {
                    "status": e["status"],
                    "snapshot_id": snap_id,
                    "sequence_number": e["explicit_seq"],  # None => inherit
                    "data_file": {
                        "content": 0,
                        "file_path": f"/data/f{fi}.parquet",
                        "file_format": "PARQUET",
                        "partition": e["partition"],
                        "record_count": e["record_count"],
                        "file_size_in_bytes": e["file_size"],
                    },
                }
            )
            fi += 1
        mp = os.path.join(meta_dir, f"m{mi}.avro")
        avro_io.write_container(mp, entry_schema, entries)
        mlist_records.append(
            {
                "manifest_path": mp,
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": m["seq"],
                "min_sequence_number": 0,
                "added_snapshot_id": snap_id,
                "added_files_count": len(entries),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": 0,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )
    for mi, m in enumerate(layout["del_manifests"]):
        entries = []
        for e in m["entries"]:
            df = {
                "content": e["content"],
                "file_path": f"/data/del{mi}-{e['record_count']}.parquet",
                "file_format": "PARQUET",
                "partition": {pf["name"]: None for pf in part_fields},
                "record_count": e["record_count"],
                "file_size_in_bytes": 10,
            }
            if e["eq_ids"] is not None:
                df["equality_ids"] = e["eq_ids"]
            entries.append(
                {
                    "status": e["status"],
                    "snapshot_id": snap_id,
                    "sequence_number": e["explicit_seq"],
                    "data_file": df,
                }
            )
        mp = os.path.join(meta_dir, f"dm{mi}.avro")
        avro_io.write_container(mp, entry_schema, entries)
        mlist_records.append(
            {
                "manifest_path": mp,
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": 0,
                "content": 1,
                "sequence_number": m["seq"],
                "min_sequence_number": 0,
                "added_snapshot_id": snap_id,
                "added_files_count": len(entries),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": 0,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )
    mlist = os.path.join(meta_dir, f"snap-{snap_id}.avro")
    avro_io.write_container(mlist, manifest_list_schema(), mlist_records)
    md = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": root,
        "last-sequence-number": 9,
        "last-updated-ms": 1700000000000,
        "last-column-id": len(fields),
        "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": fields}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": ice_spec}],
        "last-partition-id": 999 + len(ice_spec),
        "current-snapshot-id": snap_id,
        "snapshots": [
            {
                "snapshot-id": snap_id,
                "sequence-number": 9,
                "timestamp-ms": 1700000000000,
                "manifest-list": mlist,
                "summary": {"operation": "append"},
            }
        ],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")


def _expected_partition(raw: dict, part_fields) -> dict:
    out = {}
    for pf in part_fields:
        v = raw.get(pf["name"])
        if v is None:
            continue
        if pf["type"] == "date":
            v = (datetime.date(1970, 1, 1) + datetime.timedelta(days=v)).isoformat()
        out[pf["name"]] = str(v)
    return out


@settings(
    max_examples=220,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(layout=_table_layout())
def test_fuzz_read_iceberg_metadata(layout):
    root = tempfile.mkdtemp(prefix="icefuzz-")
    try:
        _write_synthetic_warehouse(layout, root)
        info = read_iceberg_table(root)

        # ground truth: live data entries in manifest order, seq
        # inherited from the manifest when the entry leaves it null
        # (falsy), DELETED (status=2) skipped
        exp_files = []
        for m in layout["manifests"]:
            for e in m["entries"]:
                if e["status"] == 2:
                    continue
                exp_files.append(
                    (
                        e["explicit_seq"] or m["seq"],
                        e["record_count"],
                        e["file_size"],
                        _expected_partition(e["partition"], layout["part_fields"]),
                    )
                )
        got_files = [
            (f.seq, f.record_count, f.file_size_bytes, f.partition)
            for f in info.files
        ]
        assert got_files == exp_files

        id_to_name = {f["id"]: f["name"] for f in layout["fields"]}
        exp_deletes = []
        for m in layout["del_manifests"]:
            for e in m["entries"]:
                if e["status"] == 2:
                    continue
                exp_deletes.append(
                    (
                        e["content"],
                        e["explicit_seq"] or m["seq"],
                        e["record_count"],
                        [id_to_name[i] for i in (e["eq_ids"] or [])],
                    )
                )
        got_deletes = [
            (d.content, d.seq, d.record_count, d.equality_cols)
            for d in info.delete_files
        ]
        assert got_deletes == exp_deletes

        # schema round-trip: every generated field present with its type
        got_types = {f.name: f.dataType.simpleString() for f in info.schema.fields}
        ice_to_spark = {
            "long": "bigint",
            "int": "int",
            "string": "string",
            "double": "double",
            "date": "date",
        }
        assert got_types == {
            f["name"]: ice_to_spark[f["type"]] for f in layout["fields"]
        }
        assert [n for n, _ in info.identity_partition] == [
            pf["name"] for pf in layout["part_fields"]
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# layer 2: end-to-end MOR live-rows vs a pure-Python oracle
# ---------------------------------------------------------------------------


def _mor_oracle(data_files, pos_deletes, eq_deletes):
    """Expected live (file_idx, row_idx, key, cat) set per the spec:
    position delete applies when del_seq >= data_seq and (file, pos)
    match; equality delete applies when del_seq > data_seq and the
    equality columns match."""
    live = []
    for f_idx, (f_seq, rows) in enumerate(data_files):
        for pos, (key, cat) in enumerate(rows):
            dead = any(
                d_seq >= f_seq and df == f_idx and dp == pos
                for d_seq, df, dp in pos_deletes
            )
            if not dead:
                dead = any(
                    d_seq > f_seq and dc == cat for d_seq, dc in eq_deletes
                )
            if not dead:
                live.append((key, cat))
    return sorted(live)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_mor_live_rows(spark, tmp_path, seed):
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
        import_iceberg_table,
    )
    from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog

    rng = random.Random(1000 + seed)
    root = str(tmp_path / f"mor-{seed}")
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)

    # random data files: (seq, [(key, cat), ...])
    key = 0
    data_files = []
    for _ in range(rng.randint(2, 4)):
        n = rng.randint(2, 6)
        rows = []
        for _ in range(n):
            rows.append((key, rng.choice(["a", "b", "c"])))
            key += 1
        data_files.append((rng.randint(1, 4), rows))
    paths = []
    for i, (_, rows) in enumerate(data_files):
        p = os.path.join(data_dir, f"f{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "id": pa.array([k for k, _ in rows], pa.int64()),
                    "cat": pa.array([c for _, c in rows], pa.string()),
                }
            ),
            p,
        )
        paths.append(p)

    # random position deletes (seq, file_idx, pos) and equality deletes
    # (seq, cat-value)
    pos_deletes = [
        (
            rng.randint(1, 5),
            (fi := rng.randrange(len(data_files))),
            rng.randrange(len(data_files[fi][1])),
        )
        for _ in range(rng.randint(0, 4))
    ]
    eq_deletes = [
        (rng.randint(1, 5), rng.choice(["a", "b", "c"]))
        for _ in range(rng.randint(0, 2))
    ]

    fields = [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "cat", "required": False, "type": "string"},
    ]
    entry_schema = manifest_entry_schema([])
    snap_id = 555000 + seed
    mlist_records = []
    data_entries = [
        {
            "status": 1,
            "snapshot_id": snap_id,
            # half the entries inherit from the manifest (the real-runtime
            # shape the r6 ADVICE bug was about); per-manifest grouping
            # below keeps inheritance exact
            "sequence_number": f_seq if i % 2 == 0 else None,
            "data_file": {
                "content": 0,
                "file_path": paths[i],
                "file_format": "PARQUET",
                "partition": {},
                "record_count": len(rows),
                "file_size_in_bytes": os.path.getsize(paths[i]),
            },
        }
        for i, (f_seq, rows) in enumerate(data_files)
    ]
    # one manifest per data file so inherited entries get the right seq
    for i, e in enumerate(data_entries):
        mp = os.path.join(meta_dir, f"m{i}.avro")
        avro_io.write_container(mp, entry_schema, [e])
        mlist_records.append(
            {
                "manifest_path": mp,
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": data_files[i][0],
                "min_sequence_number": 0,
                "added_snapshot_id": snap_id,
                "added_files_count": 1,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": len(data_files[i][1]),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )

    del_entries = []
    for di, (d_seq, fi, pos) in enumerate(pos_deletes):
        p = os.path.join(data_dir, f"posdel{di}.parquet")
        pq.write_table(
            pa.table(
                {
                    "file_path": pa.array([paths[fi]], pa.string()),
                    "pos": pa.array([pos], pa.int64()),
                }
            ),
            p,
        )
        del_entries.append(
            (
                d_seq,
                {
                    "status": 1,
                    "snapshot_id": snap_id,
                    "sequence_number": d_seq,
                    "data_file": {
                        "content": 1,
                        "file_path": p,
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": 1,
                        "file_size_in_bytes": os.path.getsize(p),
                    },
                },
            )
        )
    for di, (d_seq, cat) in enumerate(eq_deletes):
        p = os.path.join(data_dir, f"eqdel{di}.parquet")
        pq.write_table(pa.table({"cat": pa.array([cat], pa.string())}), p)
        del_entries.append(
            (
                d_seq,
                {
                    "status": 1,
                    "snapshot_id": snap_id,
                    # eq-delete entries inherit from their manifest too
                    "sequence_number": None,
                    "data_file": {
                        "content": 2,
                        "file_path": p,
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": 1,
                        "file_size_in_bytes": os.path.getsize(p),
                        "equality_ids": [2],
                    },
                },
            )
        )
    for di, (d_seq, e) in enumerate(del_entries):
        mp = os.path.join(meta_dir, f"dm{di}.avro")
        avro_io.write_container(mp, entry_schema, [e])
        mlist_records.append(
            {
                "manifest_path": mp,
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": 0,
                "content": 1,
                "sequence_number": d_seq,
                "min_sequence_number": 0,
                "added_snapshot_id": snap_id,
                "added_files_count": 1,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": 1,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )

    mlist = os.path.join(meta_dir, f"snap-{snap_id}.avro")
    avro_io.write_container(mlist, manifest_list_schema(), mlist_records)
    md = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": root,
        "last-sequence-number": 9,
        "last-updated-ms": 1700000000000,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": fields}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "current-snapshot-id": snap_id,
        "snapshots": [
            {
                "snapshot-id": snap_id,
                "sequence-number": 9,
                "timestamp-ms": 1700000000000,
                "manifest-list": mlist,
                "summary": {"operation": "append"},
            }
        ],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    t = import_iceberg_table(
        spark,
        Catalog(spark, str(tmp_path / f"wh-{seed}")),
        root,
        "nyc",
        f"mor_fuzz_{seed}",
    )
    got = sorted((r["id"], r["cat"]) for r in t.scan().collect())
    expect = _mor_oracle(data_files, pos_deletes, eq_deletes)
    assert got == expect, (
        f"seed={seed} data={data_files} pos={pos_deletes} eq={eq_deletes}"
    )
