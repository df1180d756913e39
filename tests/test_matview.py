"""Materialized views (catalog/matview.py): algebraic-state maintenance,
incremental vs full refresh decisions, and the SQL statement surface."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.catalog.matview import (
    MaterializedView,
    parse_mv_sql,
)
from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql


@pytest.fixture()
def cat(spark, tables):
    catalog = Catalog(spark, tempfile.mkdtemp(prefix="warehouse-mvt-"))
    t = catalog.create_table("nyc", "ord", tables["orders"].schema)
    t.append_dataframe(tables["orders"].filter(F.col("o_orderkey") % 2 == 0))
    return catalog


def test_parse_rejects_unsupported_constructs():
    with pytest.raises(ValueError, match="grammar"):
        parse_mv_sql("SELECT a FROM nyc.t")  # no GROUP BY
    with pytest.raises(ValueError, match="unsupported select item"):
        parse_mv_sql(
            "SELECT o_custkey, stddev(o_totalprice) AS s FROM nyc.t GROUP BY o_custkey"
        )  # non-mergeable aggregate
    with pytest.raises(ValueError, match="at least one aggregate"):
        parse_mv_sql("SELECT o_custkey FROM nyc.t GROUP BY o_custkey")
    mv = parse_mv_sql(
        "SELECT o_orderpriority, count(*) AS n, avg(o_totalprice) AS ap "
        "FROM nyc.ord WHERE o_totalprice > 10 GROUP BY o_orderpriority"
    )
    assert mv["where"] == "o_totalprice > 10"
    assert [s["kind"] for s in mv["specs"]] == ["count", "avg"]


def test_sql_statement_surface(spark, cat, tables):
    created = catalog_sql(
        cat,
        "CREATE MATERIALIZED VIEW nyc.ord_mv AS "
        "SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS total "
        "FROM nyc.ord GROUP BY o_orderpriority",
    ).collect()
    assert created[0]["materialized_view"] == "nyc.ord_mv"

    # reads go through the catalog-view expansion — user-facing schema
    rows = catalog_sql(
        cat, "SELECT * FROM nyc.ord_mv ORDER BY o_orderpriority"
    ).collect()
    assert rows and set(rows[0].asDict()) == {"o_orderpriority", "n", "total"}

    # append → REFRESH reports incremental; contents match a direct agg
    t = cat.load_table("nyc", "ord")
    t.append_dataframe(tables["orders"].filter(F.col("o_orderkey") % 2 == 1))
    ref = catalog_sql(cat, "REFRESH MATERIALIZED VIEW nyc.ord_mv").collect()
    assert ref[0]["mode"] == "incremental"
    got = {
        r["o_orderpriority"]: (r["n"], round(r["total"], 6))
        for r in catalog_sql(cat, "SELECT * FROM nyc.ord_mv").collect()
    }
    want = {
        r["o_orderpriority"]: (r["n"], round(float(r["total"]), 6))
        for r in tables["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,10)")).cast("double").alias("total"),
        )
        .collect()
    }
    assert got == want

    # no new commits → noop
    ref = catalog_sql(cat, "REFRESH MATERIALIZED VIEW nyc.ord_mv").collect()
    assert ref[0]["mode"] == "noop"

    dropped = catalog_sql(cat, "DROP MATERIALIZED VIEW nyc.ord_mv").collect()
    assert dropped[0]["dropped"] is True
    assert "ord_mv" not in cat.list_views("nyc")
    assert not cat.table_exists("nyc", "__mv__ord_mv")
    # IF EXISTS tolerates absence; bare DROP raises
    ok = catalog_sql(cat, "DROP MATERIALIZED VIEW IF EXISTS nyc.ord_mv").collect()
    assert ok[0]["dropped"] is False
    with pytest.raises(FileNotFoundError):
        catalog_sql(cat, "DROP MATERIALIZED VIEW nyc.ord_mv")


def test_nonappend_commit_forces_full_refresh(spark, cat):
    mv = MaterializedView.create(
        cat,
        "nyc",
        "mv_minmax",
        "SELECT o_orderpriority, min(o_totalprice) AS lo, max(o_totalprice) AS hi, "
        "count(*) AS n FROM nyc.ord GROUP BY o_orderpriority",
    )
    t = cat.load_table("nyc", "ord")
    # delete rows including per-group extremes: merge would be WRONG here,
    # so the refresh must recompute (min/max state is not subtractable)
    t.delete_where("o_totalprice > 100000")
    res = mv.refresh()
    assert res["mode"] == "full"
    top = mv.read().agg(F.max("hi").alias("m")).first()["m"]
    assert top is not None and float(top) <= 100000.0


def test_create_or_replace_and_duplicate_guard(spark, cat):
    sql = (
        "SELECT o_orderpriority, count(*) AS n FROM nyc.ord GROUP BY o_orderpriority"
    )
    MaterializedView.create(cat, "nyc", "dup_mv", sql)
    with pytest.raises(FileExistsError):
        MaterializedView.create(cat, "nyc", "dup_mv", sql)
    mv = MaterializedView.create(cat, "nyc", "dup_mv", sql, replace=True)
    assert mv.read().count() > 0


def test_streaming_appends_keep_mv_incremental(spark, tmp_path):
    """Composition: a stream lands append batches into a catalog table
    (foreachBatch sink); REFRESH after each drain stays on the
    incremental path and the MV equals a from-scratch aggregate. This is
    the always-fresh-dashboard loop — stream in, merge partial state,
    never rescan."""
    from pyspark.sql import types as T

    catalog = Catalog(spark, str(tmp_path / "wh"))
    tbl_schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.DoubleType())]
    )
    dst = catalog.create_table("nyc", "mv_sink", tbl_schema)
    dst.append_dataframe(
        spark.createDataFrame([("a", 1.0), ("b", 2.0)], tbl_schema)
    )
    mv = MaterializedView.create(
        catalog, "nyc", "mv_live", "SELECT k, count(*) AS n, sum(v) AS s FROM nyc.mv_sink GROUP BY k"
    )

    def sink(batch_df, epoch_id):
        dst.refresh().append_dataframe(batch_df)

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .selectExpr("CASE WHEN value % 2 = 0 THEN 'a' ELSE 'b' END AS k", "CAST(value AS DOUBLE) AS v")
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = mv.refresh()
    if res["mode"] != "noop":  # rate source may deliver 0 rows in CI
        assert res["mode"] == "incremental"
    got = {r["k"]: (r["n"], r["s"]) for r in mv.read().collect()}
    want = {
        r["k"]: (r["n"], float(r["s"]))
        for r in catalog.load_table("nyc", "mv_sink")
        .scan()
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v").cast("decimal(38,10)")).cast("double").alias("s"))
        .collect()
    }
    assert got == want


def test_expression_group_keys_time_bucket(spark, tmp_path):
    """Expression group keys: an hourly bucket MV merges new events into
    the right buckets incrementally."""
    from pyspark.sql import types as T

    catalog = Catalog(spark, str(tmp_path / "wh2"))
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("v", T.LongType())]
    )
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows1 = [(base + dt.timedelta(minutes=7 * i), i) for i in range(20)]
    rows2 = [(base + dt.timedelta(minutes=7 * i), 100 + i) for i in range(20, 40)]
    t = catalog.create_table("nyc", "evts", schema)
    t.append_dataframe(spark.createDataFrame(rows1, schema))
    mv = MaterializedView.create(
        catalog,
        "nyc",
        "evts_hourly",
        "SELECT date_trunc('hour', ts) AS h, count(*) AS n, sum(v) AS s "
        "FROM nyc.evts GROUP BY date_trunc('hour', ts)",
    )
    t.refresh().append_dataframe(spark.createDataFrame(rows2, schema))
    assert mv.refresh()["mode"] == "incremental"
    got = {r["h"]: (r["n"], float(r["s"])) for r in mv.read().collect()}
    want = {
        r["h"]: (r["n"], float(r["s"]))
        for r in catalog.load_table("nyc", "evts")
        .scan()
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want
    # appends touching an EXISTING bucket merged (not duplicated rows)
    assert mv.read().count() == len(want)


def test_randomized_maintenance_matches_model(spark, tmp_path):
    """Fuzz the maintenance loop: a random interleaving of appends,
    deletes, overwrites, and refreshes must always leave the MV equal to
    a from-scratch aggregate of the source's current state — regardless
    of which refreshes took the incremental path and which fell back."""
    import random

    from pyspark.sql import types as T

    rng = random.Random(77)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("g", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    catalog = Catalog(spark, str(tmp_path / "whf"))
    t = catalog.create_table("nyc", "fuzz_src", schema)
    next_id = 0

    def batch(n):
        nonlocal next_id
        rows = [
            (next_id + i, rng.choice("pqr"), round(rng.uniform(-50, 50), 2))
            for i in range(n)
        ]
        next_id += n
        return spark.createDataFrame(rows, schema)

    t.append_dataframe(batch(40))
    mv = MaterializedView.create(
        catalog,
        "nyc",
        "fuzz_mv",
        "SELECT g, count(*) AS n, sum(v) AS s, min(v) AS lo, max(v) AS hi, "
        "avg(v) AS m FROM nyc.fuzz_src GROUP BY g",
    )
    for step in range(12):
        op = rng.random()
        t = t.refresh()
        if op < 0.5:
            t.append_dataframe(batch(rng.randint(1, 30)))
        elif op < 0.7:
            t.delete_where(f"id % 7 = {rng.randint(0, 6)}")
        elif op < 0.8:
            t.delete_where_mor(f"v > {rng.randint(20, 45)}")
        else:
            pass  # refresh with no new commits (noop path)
        if rng.random() < 0.7:
            mv.refresh()
    mv.refresh()  # final sync
    got = {
        r["g"]: (r["n"], round(r["s"], 6), r["lo"], r["hi"], round(r["m"], 9))
        for r in mv.read().collect()
    }
    want = {
        r["g"]: (r["n"], round(float(r["s"]), 6), r["lo"], r["hi"], round(r["m"], 9))
        for r in catalog.load_table("nyc", "fuzz_src")
        .scan()
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(38,10)")).cast("double").alias("s"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            (F.sum(F.col("v").cast("decimal(38,10)")).cast("double") / F.count("v")).alias("m"),
        )
        .collect()
    }
    assert got == want


def test_state_survives_process_restart_shape(spark, cat):
    """The MV definition and watermark live in table properties + the
    views file — a fresh handle (new Catalog object) resumes cleanly."""
    MaterializedView.create(
        cat,
        "nyc",
        "persist_mv",
        "SELECT o_orderpriority, sum(o_totalprice) AS s FROM nyc.ord "
        "GROUP BY o_orderpriority",
    )
    fresh = Catalog(spark, cat.warehouse)
    mv2 = MaterializedView(fresh, "nyc", "persist_mv")
    assert mv2.refresh()["mode"] == "noop"
    assert mv2.read().count() > 0
