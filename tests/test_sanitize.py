"""A2/A3/A6 sanitize-rule tests on real UINT64 parquet (the counters
fixture) — golden behaviors from sanitize_parquet.py:41-61."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_metadata_pipeline_spark.ingest.sanitize import (
    dry_run_report,
    needs_sanitize,
    rewrite_sanitized,
    sanitize,
    sanitized_schema,
)


@pytest.fixture()
def counters_df(spark, counters_dir):
    return spark.read.parquet(counters_dir + "/System_Interface_Counters")


def test_spark_reads_uint64_as_decimal(counters_df):
    # Spark ≥3.2 reads parquet UINT64 as DECIMAL(20,0) natively — rule 1 is
    # satisfied at scan time (SURVEY.md §1.2)
    types = dict(counters_df.dtypes)
    assert types["timestamp"] == "decimal(20,0)"
    assert types["rx_bytes"] == "decimal(20,0)"
    assert types["ts_named_other"] == "decimal(20,0)"
    assert types["status"] == "string"


def test_sanitize_timestamp_name_rule(counters_df):
    out = sanitize(counters_df)
    types = dict(out.dtypes)
    assert types["timestamp"] == "timestamp"          # rule 2/3: named column
    assert types["ts_named_other"] == "decimal(20,0)"  # negative: name mismatch
    assert types["rx_bytes"] == "decimal(20,0)"        # rule 1 preserved
    assert types["status"] == "string"                 # passthrough

    row = out.orderBy("timestamp").first()
    assert isinstance(row["timestamp"], dt.datetime)
    # µs-exact reconstruction: decimal epoch-µs → timestamp
    raw = counters_df.select(F.min("timestamp").cast("long").alias("us")).first()["us"]
    assert int(row["timestamp"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e6) == raw


def test_uint64_beyond_int64_survives(counters_df):
    big = (
        sanitize(counters_df)
        .agg(F.max("rx_bytes").alias("mx"))
        .first()["mx"]
    )
    assert big == Decimal(2**63 + 5)  # long would overflow; decimal must not


def test_dry_run_report(counters_df):
    report = dry_run_report(counters_df.schema)
    assert [(c.column, c.before, c.after) for c in report] == [
        ("timestamp", "decimal(20,0)", "timestamp")
    ]
    assert needs_sanitize(counters_df.schema)
    clean = T.StructType([T.StructField("a", T.LongType())])
    assert not needs_sanitize(clean)
    assert sanitized_schema(clean) == clean


def test_presanitized_decimal_timestamp_variant(spark):
    # second input case (sanitize_parquet.py:47-51): timestamp already
    # DECIMAL(p≥18, s=0) from a previous rule-1 pass
    df = spark.range(5).select(
        (F.lit(1_700_000_000_000_000) + F.col("id")).cast("decimal(18,0)").alias("timestamp")
    )
    out = sanitize(df)
    assert dict(out.dtypes)["timestamp"] == "timestamp"
    # decimals with scale>0 or precision<18 are NOT eligible
    df2 = spark.range(5).select(F.col("id").cast("decimal(17,0)").alias("timestamp"))
    assert dict(sanitize(df2).dtypes)["timestamp"] == "decimal(17,0)"
    df3 = spark.range(5).select(F.col("id").cast("decimal(20,2)").alias("timestamp"))
    assert dict(sanitize(df3).dtypes)["timestamp"] == "decimal(20,2)"


def test_rewrite_sink_refuses_overwrite(counters_df, tmp_path):
    out = str(tmp_path / "out")
    rewrite_sanitized(counters_df, out)
    with pytest.raises(Exception, match="already exists|LOCATION_ALREADY_EXISTS"):
        rewrite_sanitized(counters_df, out)  # sanitize_parquet.py:84-88 semantics
    rewrite_sanitized(counters_df, out, overwrite=True)  # --overwrite flag
    reread = counters_df.sparkSession.read.parquet(out)
    assert dict(reread.dtypes)["timestamp"] == "timestamp"
    assert reread.count() == counters_df.count()


# -- property-based checks of the sanitize rules (hypothesis) ----------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_UINT64_MAX = (1 << 64) - 1


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    name=st.sampled_from(["timestamp", "rx_bytes", "ts_named_other", "x"]),
    precision=st.integers(min_value=1, max_value=38),
    scale_zero=st.booleans(),
)
def test_schema_rule_is_name_and_type_driven(name, precision, scale_zero):
    # pure-metadata property: only (name == 'timestamp') ∧ decimal(p>=18, s=0)
    # becomes a timestamp; every other decimal passes through unchanged
    from pyspark.sql import types as T

    from iceberg_metadata_pipeline_spark.ingest.sanitize import sanitized_schema

    scale = 0 if scale_zero else min(2, precision)
    f = T.StructField(name, T.DecimalType(precision, scale))
    out = sanitized_schema(T.StructType([f])).fields[0]
    if name == "timestamp" and precision >= 18 and scale == 0:
        assert isinstance(out.dataType, T.TimestampType)
    else:
        assert out.dataType == f.dataType


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    micros=st.lists(
        st.integers(min_value=0, max_value=4102444800_000_000),  # ≤ year 2100
        min_size=1,
        max_size=8,
    )
)
def test_epoch_micros_roundtrip_property(spark, micros):
    # decimal epoch-µs → timestamp must be exactly invertible (no precision
    # loss anywhere in the supported range)
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from iceberg_metadata_pipeline_spark.ingest.sanitize import sanitize

    df = spark.createDataFrame(
        [(str(m),) for m in micros], schema="timestamp string"
    ).select(F.col("timestamp").cast(T.DecimalType(20, 0)).alias("timestamp"))
    out = sanitize(df)
    assert isinstance(out.schema["timestamp"].dataType, T.TimestampType)
    back = out.select(
        F.unix_micros("timestamp").alias("us")
    ).collect()
    assert sorted(r["us"] for r in back) == sorted(micros)


def test_aggregate_folder_n_to_one(spark, counters_df, tmp_path):
    # A5: many files in → one sanitized file out, codec honored, no
    # accidental overwrite (aggregate_parquet.py:103-154 semantics)
    import glob

    import pyarrow.parquet as pq
    import pytest

    from iceberg_metadata_pipeline_spark.ingest.sanitize import aggregate_folder

    src = str(tmp_path / "many")
    counters_df.repartition(4).write.parquet(src)
    assert len(glob.glob(src + "/*.parquet")) == 4

    out = str(tmp_path / "one")
    aggregate_folder(spark, src, out, compression="zstd")
    files = glob.glob(out + "/*.parquet")
    assert len(files) == 1
    meta = pq.ParquetFile(files[0])
    assert meta.metadata.row_group(0).column(0).compression.lower() == "zstd"
    # sanitize ran: the timestamp column is a real timestamp now
    assert str(meta.schema_arrow.field("timestamp").type).startswith("timestamp")
    with pytest.raises(Exception):
        aggregate_folder(spark, src, out)  # refuses overwrite without flag
    aggregate_folder(spark, src, out, overwrite=True)  # explicit flag ok


def test_binaryfile_source_reads_whole_files(spark, sf_dir):
    """binaryFile source: content length matches the length column and the
    on-disk file size; parquet magic bytes present (whole-file fidelity —
    the property multimodal blob ingestion depends on)."""
    import os

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "region.parquet")
        .load(sf_dir)
    )
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["length"] == len(r["content"]) == os.path.getsize(
        os.path.join(sf_dir, "region.parquet")
    )
    assert bytes(r["content"][:4]) == b"PAR1"
