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
