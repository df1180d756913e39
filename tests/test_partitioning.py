"""Hidden partitioning (Iceberg partition transforms, spec v2): derive
partition tuples at write, prune files at scan by transforming predicate
literals — users filter the SOURCE column only, never a partition column.
Reference gets this surface from iceberg-spark-runtime 1.9.2 (pom.xml:18).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
from iceberg_metadata_pipeline_spark.catalog.partitioning import (
    PartitionField,
    parse_transform,
    prune_files_by_partition,
    split_conjuncts,
    split_in_list,
    transform_expr,
)
from iceberg_metadata_pipeline_spark.session import load_tables


def test_parse_transform():
    assert parse_transform("identity") == ("identity", None)
    assert parse_transform("bucket[16]") == ("bucket", 16)
    assert parse_transform("truncate[10]") == ("truncate", 10)
    assert parse_transform("day") == ("day", None)
    with pytest.raises(ValueError):
        parse_transform("bucket")  # missing width


def test_transform_exprs(spark):
    row = spark.range(1).selectExpr(
        transform_expr(PartitionField("x", "truncate[100]"), "1234", "int") + " AS t_int",
        transform_expr(PartitionField("s", "truncate[3]"), "'abcdef'", "string") + " AS t_str",
        transform_expr(PartitionField("d", "month"), "DATE'2021-07-15'", "date") + " AS t_month",
        transform_expr(PartitionField("d", "year"), "DATE'2021-07-15'", "date") + " AS t_year",
    ).first()
    assert row["t_int"] == 1200
    assert row["t_str"] == "abc"
    assert row["t_month"] == "2021-07"
    assert row["t_year"] == 2021
    # negative ints floor toward -inf (Iceberg truncate rule)
    neg = spark.range(1).selectExpr(
        transform_expr(PartitionField("x", "truncate[100]"), "-34", "int") + " AS t"
    ).first()["t"]
    assert neg == -100


def _partitioned_orders(spark, sf_dir, tmp_path, transform="year"):
    orders = load_tables(spark, sf_dir)["orders"]
    catalog = Catalog(spark, str(tmp_path / "wh"))
    t = catalog.create_table(
        "nyc",
        "orders_part",
        orders.schema,
        partition_spec=[PartitionField("o_orderdate", transform)],
    )
    t.append_dataframe(orders)
    return orders, t


def test_partitioned_write_records_tuples(spark, sf_dir, tmp_path):
    _orders, t = _partitioned_orders(spark, sf_dir, tmp_path)
    files = t.snapshot_files()
    assert files, "no files registered"
    years = {f.partition.get("o_orderdate_year") for f in files}
    # fixture spans 1992-1998: several year partitions, every file tagged
    assert all(y is not None for y in years)
    assert len({int(y) for y in years}) >= 2
    assert all(f.spec_id == 0 for f in files)


def test_partition_prune_reduces_files_and_keeps_answers(spark, sf_dir, tmp_path):
    orders, t = _partitioned_orders(spark, sf_dir, tmp_path)
    all_files = t.snapshot_files()
    # equality on the SOURCE column — user never mentions the partition col
    flt = "o_orderdate >= '1997-01-01'"
    from iceberg_metadata_pipeline_spark.catalog.partitioning import (
        prune_files_by_partition as prune,
    )
    kept = prune(spark, all_files, t.partition_specs, t._schema_types(), flt)
    assert len(kept) < len(all_files), "range predicate should prune year dirs"
    # every surviving file is 1997+ (monotonic year transform: >= prunes below)
    assert all(int(f.partition["o_orderdate_year"]) >= 1997 for f in kept)
    # scan answers stay exact vs an unpartitioned filter
    expected = orders.filter(flt).count()
    assert t.scan(filter=flt).count() == expected


def test_bucket_prunes_equality_only(spark, sf_dir, tmp_path):
    customer = load_tables(spark, sf_dir)["customer"]
    catalog = Catalog(spark, str(tmp_path / "whb"))
    t = catalog.create_table(
        "nyc",
        "cust_bucket",
        customer.schema,
        partition_spec=[PartitionField("c_custkey", "bucket[8]")],
    )
    t.append_dataframe(customer)
    files = t.snapshot_files()
    assert len({f.partition["c_custkey_bucket"] for f in files}) > 1
    key = customer.select("c_custkey").first()["c_custkey"]
    kept = prune_files_by_partition(
        spark, files, t.partition_specs, t._schema_types(), f"c_custkey = {key}"
    )
    assert len(kept) < len(files), "bucket equality should prune to ~1/8 of files"
    assert t.scan(filter=f"c_custkey = {key}").count() == 1
    # range predicates must NOT prune on a bucket transform (non-monotonic)
    kept_range = prune_files_by_partition(
        spark, files, t.partition_specs, t._schema_types(), f"c_custkey > {key}"
    )
    assert len(kept_range) == len(files)


def test_spec_evolution_old_files_survive(spark, sf_dir, tmp_path):
    orders = load_tables(spark, sf_dir)["orders"]
    catalog = Catalog(spark, str(tmp_path / "whe"))
    t = catalog.create_table("nyc", "orders_evolve", orders.schema)
    # snapshot 1: unpartitioned write (spec_id None)
    t.append_dataframe(orders.filter(F.year("o_orderdate") <= 1994))
    # evolve: new writes partition by year
    t.set_partition_spec([PartitionField("o_orderdate", "year")])
    t.append_dataframe(orders.filter(F.year("o_orderdate") >= 1995))
    flt = "o_orderdate >= '1997-01-01'"
    kept = prune_files_by_partition(
        spark, t.snapshot_files(), t.partition_specs, t._schema_types(), flt
    )
    # unpartitioned files are always kept (never wrongly pruned) …
    assert any(f.spec_id is None for f in kept)
    # … but partitioned pre-1997 files are gone
    assert all(
        f.spec_id is None or int(f.partition["o_orderdate_year"]) >= 1997 for f in kept
    )
    assert t.scan(filter=flt).count() == orders.filter(flt).count()


def test_partitions_metadata_table(spark, sf_dir, tmp_path):
    orders, t = _partitioned_orders(spark, sf_dir, tmp_path)
    parts = t.partitions_df()
    assert parts.columns == [
        "partition", "spec_id", "file_count", "record_count", "total_size_bytes",
    ]
    rows = parts.collect()
    assert len(rows) >= 2  # multiple years
    assert sum(r["record_count"] for r in rows) == orders.count()
    assert all(r["spec_id"] == 0 for r in rows)


def test_split_conjuncts():
    assert split_conjuncts("a = 1") == ["a = 1"]
    assert split_conjuncts("a = 1 AND b > 2") == ["a = 1", "b > 2"]
    assert split_conjuncts("(a = 1) AND (b > 2)") == ["a = 1", "b > 2"]
    # case-insensitive keyword, identifier containing 'and' untouched
    assert split_conjuncts("brand = 'x' and a < 3") == ["brand = 'x'", "a < 3"]
    # top-level OR: conjuncts are not independently required → no split
    assert split_conjuncts("a = 1 AND b = 2 OR c = 3") == ["a = 1 AND b = 2 OR c = 3"]
    # OR inside parens is fine to split around
    assert split_conjuncts("(a = 1 OR a = 2) AND b = 3") == ["a = 1 OR a = 2", "b = 3"]
    # BETWEEN's AND is not a split point; it expands to two range conjuncts
    assert split_conjuncts("d BETWEEN '1997-01-01' AND '1997-12-31' AND k = 5") == [
        "d >= '1997-01-01'",
        "d <= '1997-12-31'",
        "k = 5",
    ]
    # quoted string containing ' AND ' must not split
    assert split_conjuncts("s = 'x AND y' AND t = 1") == ["s = 'x AND y'", "t = 1"]


def test_split_in_list():
    assert split_in_list("c IN (1, 2, 3)") == ("c", ["1", "2", "3"])
    assert split_in_list("c in ('a','b')") == ("c", ["a", "b"])
    assert split_in_list("c = 1") is None
    assert split_in_list("c IN (SELECT x FROM t)") == ("c", ["SELECT x FROM t"])  # degenerate; harmless


def test_conjunction_pruning_scan(spark, sf_dir, tmp_path):
    """`a >= x AND b = y` must prune on BOTH conjuncts: the year partition
    transform handles the date range and min/max stats handle the key."""
    orders, t = _partitioned_orders(spark, sf_dir, tmp_path)
    flt = "o_orderdate >= '1997-01-01' AND o_orderpriority = '1-URGENT'"
    types = t._schema_types()
    files = t.snapshot_files()
    kept = files
    for c in split_conjuncts(flt):
        kept = prune_files_by_partition(spark, kept, t.partition_specs, types, c)
    assert len(kept) < len(files)
    assert all(int(f.partition["o_orderdate_year"]) >= 1997 for f in kept)
    assert t.scan(filter=flt).count() == orders.filter(flt).count()
    # BETWEEN prunes both ends through its range expansion
    flt_b = "o_orderdate BETWEEN '1995-01-01' AND '1995-12-31'"
    kept_b = files
    for c in split_conjuncts(flt_b):
        kept_b = prune_files_by_partition(spark, kept_b, t.partition_specs, types, c)
    assert {int(f.partition["o_orderdate_year"]) for f in kept_b} == {1995}
    assert t.scan(filter=flt_b).count() == orders.filter(flt_b).count()


def test_in_list_pruning(spark, sf_dir, tmp_path):
    orders, t = _partitioned_orders(spark, sf_dir, tmp_path)
    files = t.snapshot_files()
    flt = "o_orderdate IN ('1996-07-01', '1997-03-15')"
    kept = prune_files_by_partition(
        spark, files, t.partition_specs, t._schema_types(), flt
    )
    assert {int(f.partition["o_orderdate_year"]) for f in kept} <= {1996, 1997}
    assert len(kept) < len(files)
    assert t.scan(filter=flt).count() == orders.filter(flt).count()


def test_delete_where_conjunction_narrows_rewrite(spark, sf_dir, tmp_path):
    """Copy-on-write DELETE with an AND filter should rewrite only files
    whose stats can match every conjunct — and stay correct."""
    orders, t = _partitioned_orders(spark, sf_dir, tmp_path)
    before = {f.path for f in t.snapshot_files()}
    flt = "o_orderdate >= '1998-01-01' AND o_orderdate <= '1998-03-31'"
    expected_left = orders.filter(f"NOT ({flt})").count()
    t.delete_where(flt)
    after = {f.path for f in t.snapshot_files()}
    assert t.scan().count() == expected_left
    # untouched year partitions carried over byte-identical (same paths)
    assert before & after, "stats pruning should carry over unaffected files"


def test_partitioned_roundtrip_values(spark, sf_dir, tmp_path):
    """Partitioned layout must be value-lossless, including the partition
    source column itself (data files keep the full schema)."""
    orders, t = _partitioned_orders(spark, sf_dir, tmp_path)
    a = orders.select("o_orderkey", "o_orderdate", "o_totalprice").orderBy("o_orderkey")
    b = t.scan().select("o_orderkey", "o_orderdate", "o_totalprice").orderBy("o_orderkey")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
