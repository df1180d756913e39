"""Declarative pipeline runner (pipelines/runner.py): topo ordering,
materialization kinds, incremental MV refresh across runs, fault
isolation, cycle/unknown-dep validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
from iceberg_metadata_pipeline_spark.pipelines import Pipeline


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def _declare_linear(spark, catalog, sf_dir, ns="etl"):
    p = Pipeline(spark, catalog, namespace=ns)

    @p.temporary_view(name="raw_docs")
    def raw_docs():
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    @p.table(name="clean_docs", depends=["raw_docs"])
    def clean_docs(inputs):
        return inputs["raw_docs"].where(F.col("n_chars") > 0).select(
            "doc_id", "source", "n_chars"
        )

    p.materialized_view(
        name="per_source",
        depends=["clean_docs"],
        sql=f"SELECT source, COUNT(*) AS n, SUM(n_chars) AS chars "
        f"FROM {ns}.clean_docs GROUP BY source",
    )
    return p


def test_linear_graph_materializes(spark, catalog, sf_dir):
    p = _declare_linear(spark, catalog, sf_dir)
    report = p.run()
    assert report.ok, report.results
    assert report.results["per_source"].mode == "initial"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expect = (
        docs.where("n_chars > 0")
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
        .collect()
    )
    got = p.read("per_source").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))
    # temp view was never persisted
    assert not catalog.table_exists("etl", "raw_docs")


def test_second_run_refreshes_mv_incrementally(spark, catalog, sf_dir):
    """Append to the MV's source table directly (simulating new data
    between runs), re-run — the MV node must take the incremental path,
    and the table node rebuild must then force a full MV refresh."""
    p = _declare_linear(spark, catalog, sf_dir)
    assert p.run().ok

    t = catalog.load_table("etl", "clean_docs")
    t.append_dataframe(
        spark.createDataFrame(
            [(10**9, "synthetic", 42)], "doc_id long, source string, n_chars long"
        )
    )
    from iceberg_metadata_pipeline_spark.catalog.matview import MaterializedView

    mv = MaterializedView(catalog, "etl", "per_source")
    r = mv.refresh()
    assert r["mode"] == "incremental"
    row = {
        r["source"]: (r["n"], r["chars"]) for r in mv.read().collect()
    }["synthetic"]
    assert row == (1, 42)

    # full pipeline re-run: clean_docs is overwritten (non-append commit)
    # → the MV correctly falls back to a full recompute, dropping the
    # synthetic row that is absent from the rebuilt source
    report2 = p.run()
    assert report2.ok
    assert report2.results["per_source"].mode == "full"
    assert "synthetic" not in {
        r["source"] for r in p.read("per_source").collect()
    }


def test_fault_isolation_skips_only_downstream(spark, catalog, sf_dir):
    p = Pipeline(spark, catalog, namespace="iso")

    @p.table(name="good_a")
    def good_a():
        return spark.range(5).selectExpr("id", "id * 2 AS v")

    @p.table(name="boom")
    def boom():
        raise RuntimeError("synthetic node failure")

    @p.table(name="down_of_boom", depends=["boom"])
    def down_of_boom(inputs):
        return inputs["boom"]

    @p.table(name="down_of_good", depends=["good_a"])
    def down_of_good(inputs):
        return inputs["good_a"].where("v > 4")

    report = p.run()
    r = report.results
    assert not report.ok
    assert r["good_a"].status == "ok"
    # good_a: v = id*2 over range(5) → {0,2,4,6,8}; v > 4 keeps {6,8}
    assert r["down_of_good"].status == "ok" and r["down_of_good"].rows == 2
    assert r["boom"].status == "failed" and "synthetic" in r["boom"].error
    assert r["down_of_boom"].status == "skipped"
    assert not catalog.table_exists("iso", "down_of_boom")


def test_cycle_and_unknown_dep_rejected(spark, catalog):
    p = Pipeline(spark, catalog, namespace="bad")

    @p.table(name="a", depends=["b"])
    def a(inputs):
        return inputs["b"]

    @p.table(name="b", depends=["a"])
    def b(inputs):
        return inputs["a"]

    with pytest.raises(ValueError, match="cycle"):
        p.run()

    p2 = Pipeline(spark, catalog, namespace="bad2")

    @p2.table(name="x", depends=["nope"])
    def x(inputs):
        return inputs["nope"]

    with pytest.raises(ValueError, match="undeclared"):
        p2.run()


def test_zero_arg_function_reads_temp_views(spark, catalog):
    """SDP-style zero-arg node functions read upstreams via
    spark.table(name)."""
    p = Pipeline(spark, catalog, namespace="sdp")

    @p.temporary_view(name="nums")
    def nums():
        return spark.range(10).selectExpr("id", "id % 2 AS par")

    @p.table(name="evens", depends=["nums"])
    def evens():
        return spark.table("nums").where("par = 0")

    assert p.run().ok
    assert p.read("evens").count() == 5
