"""Avro source/sink on the from-scratch codec (catalog/avro_io.py).

The reference's Spark distribution carries spark-avro (Avro is the
standard row-oriented ingest/interchange format next to CSV/JSON —
entrypoint-spark.sh:73 serves full Spark SQL, where `USING avro` works
out of the box); this container has no spark-avro jar, so the format is
served the same way the Iceberg manifests are: the stdlib avro codec,
driven from DataFrame-native mapInPandas.

- ``write_avro(df, path)`` — one Object Container File per partition
  (``part-NNNNN.avro``, deflate), schema derived from the DataFrame.
- ``read_avro(spark, path)`` — schema from the first file's header, then
  a distributed decode: ``binaryFile`` rows → records → Arrow batches.

Types: boolean/int/long/float/double/string/binary plus the two logical
types the fixtures need — date (int days) and timestamp-micros (long).
Decimals/arrays/maps raise loudly: convert upstream (the reference's
ingest path sanitizes to flat relational rows before registration too).

Scale notes: the READ path is one Spark task per avro file — the natural
unit, since OCF blocks inside one file share a schema header and avro is
a row format with no column pruning anyway (same 100 TB posture as
CSV/JSON in this module's sibling: an ingest format, converted to
parquet on first touch). The WRITE path is map-only, no shuffle; file
count = partition count, so callers size partitions first.
"""

from __future__ import annotations

import datetime
import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_metadata_pipeline_spark.catalog import avro_io
from iceberg_metadata_pipeline_spark.queries import query
from iceberg_metadata_pipeline_spark.session import load_tables

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(1970, 1, 1)

_SIMPLE = {
    "boolean": "boolean",
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "integer": "int",
    "bigint": "long",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
}


def _spark_field_to_avro(f: T.StructField) -> dict:
    s = f.dataType.simpleString()
    if s in _SIMPLE:
        at: object = _SIMPLE[s]
    elif s == "date":
        at = {"type": "int", "logicalType": "date"}
    elif s in ("timestamp", "timestamp_ntz"):
        at = {"type": "long", "logicalType": "timestamp-micros"}
    else:
        raise ValueError(
            f"avro sink: no mapping for {f.name}: {s} — cast to a flat "
            "relational type first (decimal→double/string, nested→JSON)"
        )
    return {"name": f.name, "type": ["null", at] if f.nullable else at}


def spark_schema_to_avro(st: T.StructType, name: str = "row") -> dict:
    return {
        "type": "record",
        "name": name,
        "fields": [_spark_field_to_avro(f) for f in st.fields],
    }


def _branch(t: object) -> tuple[str, str | None]:
    """An avro field type (possibly a ["null", X] union) → (base type,
    logicalType)."""
    if isinstance(t, list):
        t = next(b for b in t if b != "null")
    if isinstance(t, dict):
        return t["type"], t.get("logicalType")
    return t, None


def check_schema_match(expected: dict, path: str) -> None:
    """Raise if ``path``'s embedded writer schema differs from
    ``expected`` (field names, order, or types). Without this, a
    directory containing files with an evolved schema is silently
    projected — missing fields become null via ``rec.get()`` and extra
    fields are dropped — instead of failing loudly. Mixed-schema dirs
    need explicit evolution handling upstream, not silent data loss."""
    import json as _json

    actual, _, _ = avro_io.read_container(path, header_only=True)
    exp = [(f["name"], f["type"]) for f in expected["fields"]]
    act = [(f["name"], f["type"]) for f in actual["fields"]]
    if exp != act:
        raise ValueError(
            f"avro schema mismatch in {path}: file schema "
            f"{_json.dumps(act, default=str)} != first-file schema "
            f"{_json.dumps(exp, default=str)}; mixed-schema directories "
            "require explicit schema evolution, refusing to project silently"
        )


def avro_schema_to_spark(schema: dict) -> T.StructType:
    inv = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
    }
    fields = []
    for f in schema["fields"]:
        base, logical = _branch(f["type"])
        if logical == "date":
            dt: T.DataType = T.DateType()
        elif logical in ("timestamp-micros", "timestamp-millis"):
            dt = T.TimestampType()
        elif base in inv:
            dt = inv[base]
        else:
            raise ValueError(f"avro source: unsupported field type {f['type']!r}")
        fields.append(T.StructField(f["name"], dt, isinstance(f["type"], list)))
    return T.StructType(fields)


def write_avro(df: DataFrame, path: str) -> int:
    """Write ``df`` as part-files under ``path``; returns file count.

    Optimization r13 (guide §4.2): the per-row ``itertuples`` encode loop
    (one dict + per-value datetime arithmetic per record, then the
    byte-at-a-time reference codec) became a column-wise numpy encoder
    over Arrow batches (ingest/avro_vector.py). Same bytes on disk —
    the vectorized encoder is pinned byte-identical to
    ``avro_io.write_datum`` — so readers and golden-format tests are
    unaffected."""
    os.makedirs(path, exist_ok=True)
    # overwrite semantics: a previous wider write would otherwise leave
    # stale high-numbered part files that read_avro would pick back up
    for stale in _glob.glob(os.path.join(path, "part-*.avro")):
        os.remove(stale)
    schema = spark_schema_to_avro(df.schema)

    from iceberg_metadata_pipeline_spark.ingest import avro_vector

    plan = avro_vector.compile_plan(schema)
    if plan is None:  # defensive: spark_schema_to_avro only emits flat types
        raise ValueError(f"write_avro: schema outside the flat subset: {schema}")

    def run(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        bodies, count = [], 0
        for batch in batches:
            body, _ = avro_vector.encode_batch(plan, batch)
            bodies.append(body)
            count += batch.num_rows
        avro_vector.write_ocf(
            os.path.join(path, f"part-{pid:05d}.avro"), schema, bodies, count
        )
        yield pa.RecordBatch.from_arrays([pa.array([count], pa.int64())], ["n"])

    df.mapInArrow(run, "n long").count()
    return len(_glob.glob(os.path.join(path, "part-*.avro")))


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed read of a directory of OCF files → DataFrame. Schema
    comes from the first file's embedded header (schema-on-file, the avro
    contract); every task decodes one file.

    Optimization r13 (guide §4.2): each file decodes through the
    vectorized codec (ingest/avro_vector.py) straight into Arrow record
    batches — no per-record dicts, no per-value datetime arithmetic.
    Schemas outside the flat subset fall back to the reference
    per-record decoder (same yielded values either way)."""
    files = sorted(_glob.glob(os.path.join(path, "*.avro")))
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    schema, _, _ = avro_io.read_container(files[0], header_only=True)
    spark_schema = avro_schema_to_spark(schema)
    logical = {f["name"]: _branch(f["type"])[1] for f in schema["fields"]}
    names = [f["name"] for f in schema["fields"]]

    def run(batches):
        import pyarrow as pa

        from iceberg_metadata_pipeline_spark.ingest import avro_vector

        for batch in batches:
            for fpath in batch.column(0).to_pylist():
                local = fpath[len("file:") :] if fpath.startswith("file:") else fpath
                check_schema_match(schema, local)
                try:
                    _, _, decoded = avro_vector.read_ocf_arrow(local)
                except ValueError:
                    decoded = _records_to_arrow_batch(
                        avro_io.read_container(local)[2], names, logical
                    )
                yield decoded

    paths = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("path")
    )
    # one task per file: each file is one self-describing decode unit
    return paths.repartition(len(files)).mapInArrow(run, spark_schema)


def _records_to_arrow_batch(records: list[dict], names: list[str], logical: dict):
    """Reference-decoder fallback: decoded record dicts → one Arrow
    batch with the same logical-type rendering as the vectorized path."""
    import pyarrow as pa

    arrays = []
    for n in names:
        vals = [rec.get(n) for rec in records]
        lt = logical[n]
        if lt == "date":
            arrays.append(pa.array(vals, pa.date32()))
        elif lt == "timestamp-micros":
            arrays.append(pa.array(vals, pa.timestamp("us")))
        elif lt == "timestamp-millis":
            arrays.append(
                pa.array(
                    [None if v is None else v * 1000 for v in vals],
                    pa.timestamp("us"),
                )
            )
        else:
            arrays.append(pa.array(vals))
    return pa.RecordBatch.from_arrays(arrays, names)


@query(
    "source_avro_roundtrip",
    """
SELECT o_orderstatus, COUNT(*) AS n,
  MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def source_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → avro OCF (from-scratch codec, deflate) → distributed read
    back → aggregate; proves lossless long/string/date/double transport
    through the real avro binary format."""
    import tempfile

    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"
    )
    loc = tempfile.mkdtemp(prefix="src-avro-") + "/orders_avro"
    write_avro(orders.repartition(8), loc)
    back = read_avro(spark, loc)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )
