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
