"""Round-13 optimization round: focused pins for operator internals that
were restructured for performance. The vectorized avro codec
(ingest/avro_vector.py) must be BYTE-identical to the reference
per-record codec (catalog/avro_io.py) on encode and value-identical on
decode — the reference codec stays in the tree as the oracle."""

from __future__ import annotations

import datetime
import io
import os

import numpy as np
import pyarrow as pa
import pytest

from iceberg_metadata_pipeline_spark.catalog import avro_io
from iceberg_metadata_pipeline_spark.ingest import avro_vector as av

_EPOCH_D = datetime.date(1970, 1, 1)
_EPOCH_T = datetime.datetime(1970, 1, 1)


def _fixture(n=500):
    """Every supported type with nulls, NaN, empty/unicode strings,
    negative ints, bools and bytes — plus the matching record dicts the
    reference codec encodes."""
    rng = np.random.default_rng(7)
    ids = rng.integers(-(2**62), 2**62, n)
    small = rng.integers(-(2**31), 2**31 - 1, n).astype(np.int32)
    dbl = rng.normal(size=n) * 1e6
    dbl[3] = np.nan  # reference writer coerces NaN -> null
    flt = rng.normal(size=n).astype(np.float32)
    strs = [
        None if i % 7 == 0 else ("" if i % 11 == 0 else f"näme-{i}" + "x" * (i % 50))
        for i in range(n)
    ]
    bts = [None if i % 5 == 0 else bytes([i % 256]) * (i % 20) for i in range(n)]
    bools = [None if i % 13 == 0 else bool(i % 2) for i in range(n)]
    dates = [
        None
        if i % 9 == 0
        else datetime.date(2024, 1, 1) + datetime.timedelta(days=int(i))
        for i in range(n)
    ]
    tss = [
        None
        if i % 8 == 0
        else datetime.datetime(2024, 6, 15, 12, 30, 45, 123456)
        + datetime.timedelta(seconds=int(i))
        for i in range(n)
    ]
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array(ids),
            pa.array(small),
            pa.array(dbl),
            pa.array(flt),
            pa.array(strs),
            pa.array(bts),
            pa.array(bools),
            pa.array(dates),
            pa.array(tss, pa.timestamp("us")),
        ],
        ["id", "small", "d", "f", "s", "b", "bo", "dt", "ts"],
    )
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": ["null", "long"]},
            {"name": "small", "type": ["null", "int"]},
            {"name": "d", "type": ["null", "double"]},
            {"name": "f", "type": ["null", "float"]},
            {"name": "s", "type": ["null", "string"]},
            {"name": "b", "type": ["null", "bytes"]},
            {"name": "bo", "type": ["null", "boolean"]},
            {"name": "dt", "type": ["null", {"type": "int", "logicalType": "date"}]},
            {
                "name": "ts",
                "type": [
                    "null",
                    {"type": "long", "logicalType": "timestamp-micros"},
                ],
            },
        ],
    }
    records = []
    for i in range(n):
        records.append(
            {
                "id": int(ids[i]),
                "small": int(small[i]),
                "d": None if dbl[i] != dbl[i] else float(dbl[i]),
                "f": float(flt[i]),
                "s": strs[i],
                "b": bts[i],
                "bo": bools[i],
                "dt": None if dates[i] is None else (dates[i] - _EPOCH_D).days,
                "ts": None
                if tss[i] is None
                else (tss[i] - _EPOCH_T) // datetime.timedelta(microseconds=1),
            }
        )
    return schema, batch, records


def test_vectorized_encode_byte_identical_to_reference():
    schema, batch, records = _fixture()
    ref = io.BytesIO()
    for rec in records:
        avro_io.write_datum(ref, schema, rec)
    plan = av.compile_plan(schema)
    assert plan is not None
    body, lens = av.encode_batch(plan, batch)
    assert body == ref.getvalue()
    # per-record lengths frame each record exactly (the Hudi log-block
    # consumer depends on them)
    offs = np.zeros(len(records) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    for i in (0, 3, 7, len(records) - 1):
        one = io.BytesIO()
        avro_io.write_datum(one, schema, records[i])
        assert body[offs[i] : offs[i + 1]] == one.getvalue()


def test_vectorized_container_byte_identical(tmp_path):
    schema, batch, records = _fixture(200)
    p_ref = str(tmp_path / "x.avro")
    avro_io.write_container(p_ref, schema, records)
    ref_bytes = open(p_ref, "rb").read()
    plan = av.compile_plan(schema)
    body, _ = av.encode_batch(plan, batch.slice(0, 200))
    p_new = str(tmp_path / "x.avro")  # same path -> same deterministic sync
    av.write_ocf(p_new, schema, [body], 200)
    assert open(p_new, "rb").read() == ref_bytes


def test_vectorized_decode_matches_reference_values(tmp_path):
    schema, batch, records = _fixture(300)
    p = str(tmp_path / "y.avro")
    avro_io.write_container(p, schema, records)
    _, _, got = av.read_ocf_arrow(p)
    _, _, ref_records = avro_io.read_container(p)
    assert got.num_rows == len(ref_records)
    for f in schema["fields"]:
        name = f["name"]
        col = got.column(name)
        if name == "dt":
            col = col.view(pa.int32())
        elif name == "ts":
            col = col.view(pa.int64())
        ref_vals = [r[name] for r in ref_records]
        got_vals = col.to_pylist()
        if name == "f":  # float32 repr differences
            for a, b in zip(got_vals, ref_vals):
                assert (a is None) == (b is None)
                if a is not None:
                    assert abs(a - b) < 1e-6
        else:
            assert got_vals == ref_vals, name


def test_vectorized_decode_sliced_and_empty():
    schema, batch, records = _fixture(50)
    plan = av.compile_plan(schema)
    # sliced input batch (non-zero arrow offsets) must encode identically
    ref = io.BytesIO()
    for rec in records[10:40]:
        avro_io.write_datum(ref, schema, rec)
    body, _ = av.encode_batch(plan, batch.slice(10, 30))
    assert body == ref.getvalue()
    # zero records
    b0, l0 = av.encode_batch(plan, batch.slice(0, 0))
    assert b0 == b"" and len(l0) == 0
    assert av.decode_batch(plan, b"", 0).num_rows == 0


def test_compile_plan_rejects_non_flat():
    assert (
        av.compile_plan(
            {
                "type": "record",
                "name": "r",
                "fields": [{"name": "x", "type": {"type": "array", "items": "long"}}],
            }
        )
        is None
    )
    assert (
        av.compile_plan(
            {
                "type": "record",
                "name": "r",
                "fields": [{"name": "x", "type": ["null", "long", "string"]}],
            }
        )
        is None
    )


def test_write_avro_bytes_unchanged_vs_reference_path(spark, tmp_path):
    """End-to-end: the mapInArrow write_avro must produce byte-identical
    part files to what the old per-row writer produced (same schema, same
    single block, same deterministic sync marker)."""
    from iceberg_metadata_pipeline_spark.ingest.avro_source import (
        spark_schema_to_avro,
        write_avro,
    )

    df = spark.sql(
        """
        SELECT id, CONCAT('name', id) AS s, CAST(id * 1.5 AS DOUBLE) AS d,
          DATE_ADD(DATE'2024-01-01', CAST(id AS INT)) AS dt,
          TIMESTAMP'2024-06-15 12:30:45.123456'
            + MAKE_INTERVAL(0,0,0,0,0,0,id) AS ts,
          IF(id % 3 = 0, NULL, id * 2) AS nullable_n
        FROM RANGE(60)
        """
    )
    loc = str(tmp_path / "w")
    write_avro(df.coalesce(1), loc)
    part = os.path.join(loc, "part-00000.avro")
    got = open(part, "rb").read()

    # reference: the pre-r13 per-row path, reproduced via collect +
    # write_container on the same part path (same deterministic sync)
    schema = spark_schema_to_avro(df.schema)
    recs = []
    for row in df.coalesce(1).collect():
        rec = {}
        for fld in df.schema.fields:
            v = row[fld.name]
            t = fld.dataType.simpleString()
            if v is None:
                rec[fld.name] = None
            elif t == "date":
                rec[fld.name] = (v - _EPOCH_D).days
            elif t in ("timestamp", "timestamp_ntz"):
                rec[fld.name] = (v - _EPOCH_T) // datetime.timedelta(
                    microseconds=1
                )
            else:
                rec[fld.name] = v
        recs.append(rec)
    avro_io.write_container(part, schema, recs)
    assert open(part, "rb").read() == got


def test_hudi_data_block_arrow_serde_byte_identical():
    """The vectorized MOR log-block serde must be byte-identical to the
    per-record reference on encode (including NaN-as-VALUE doubles and
    the pandas Int64 null restore) and value-identical on decode."""
    import json

    import pandas as pd
    import pyarrow as pa

    from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
        HEADER_SCHEMA,
        _arrow_schema_of,
        _decode_data_block,
        _decode_data_block_arrow,
        _encode_data_block,
        _encode_data_block_arrow,
    )
    from iceberg_metadata_pipeline_spark.catalog.hudi_mor_dist import (
        _pdf_to_batch,
        _pdf_to_records,
    )
    from pyspark.sql import types as T

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("n", T.LongType()),  # nullable -> pandas NaN upcast
            T.StructField("bo", T.BooleanType()),
        ]
    )
    from iceberg_metadata_pipeline_spark.catalog.hudi_format import _avro_schema_of

    avro_schema = _avro_schema_of(sch)
    arrow_schema = _arrow_schema_of(sch)
    pdf = pd.DataFrame(
        {
            "k": range(40),
            "s": [None if i % 7 == 0 else f"v{i}" for i in range(40)],
            "d": [float("nan") if i % 5 == 0 else i * 1.5 for i in range(40)],
            "n": pd.array(
                [None if i % 3 == 0 else i * 2 for i in range(40)], dtype="Int64"
            ).to_numpy(dtype=object, na_value=None),
            "bo": [None if i % 11 == 0 else bool(i % 2) for i in range(40)],
        }
    )
    ref = _encode_data_block(_pdf_to_records(pdf, arrow_schema), avro_schema)
    got = _encode_data_block_arrow(_pdf_to_batch(pdf, arrow_schema), avro_schema)
    assert got == ref
    headers = {HEADER_SCHEMA: json.dumps(avro_schema, separators=(",", ":"))}
    ref_recs = _decode_data_block(ref, headers)
    batch = _decode_data_block_arrow(got, headers)
    assert batch is not None and batch.num_rows == len(ref_recs)
    for name in batch.schema.names:
        got_vals = batch.column(name).to_pylist()
        ref_vals = [r[name] for r in ref_recs]
        if name == "d":  # NaN != NaN
            assert all(
                (a != a and b != b) or a == b for a, b in zip(got_vals, ref_vals)
            )
        else:
            assert got_vals == ref_vals, name
    # empty block framing
    empty = pa.RecordBatch.from_arrays(
        [c.slice(0, 0) for c in _pdf_to_batch(pdf, arrow_schema).columns],
        batch.schema.names,
    )
    assert _encode_data_block_arrow(empty, avro_schema) == _encode_data_block(
        [], avro_schema
    )


def test_minhash_kernel_no_regression_after_sentinel_fix(spark):
    """The kernel (which now hashes shingle strings with the vectorized
    XXH64 instead of the JVM transform) must stay bit-identical to the
    JVM xxhash64-based groupBy variant — including unicode shingles,
    multi-space runs (empty tokens), and >32-byte shingles that hit the
    XXH64 lane loop."""
    from iceberg_metadata_pipeline_spark.llmops.dedup import (
        minhash_signatures,
        minhash_signatures_from_arrays,
        shingle_arrays,
        shingles,
    )

    rows = [
        (i, f"token{i} token{i+1} token{i+2} token{i%3}") for i in range(40)
    ]
    rows += [
        (100, "ünïcode nämes ärê hären tökens ß∂ƒ"),
        (101, "a  b   c double  spaces"),
        (102, "supercalifragilisticexpialidocious" * 3 + " long tokens here"),
        (103, "xy"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    arr = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures_from_arrays(
            shingle_arrays(docs, "doc_id", "text"), "doc_id", n_hashes=16
        ).collect()
    }
    gb = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(
            shingles(docs, "doc_id", "text"), "doc_id", n_hashes=16
        ).collect()
    }
    assert arr == gb
