"""Source/sink format coverage beyond Parquet (SURVEY.md §2.B scans row:
the reference serves Parquet-backed Iceberg only, but its query surface —
Spark SQL — reads/writes CSV, JSON, and ORC natively; entrypoint-spark.sh:73).

Each round-trip query writes a fixture slice in the target format, reads
it back, and aggregates; the DuckDB oracle computes the same aggregate
from the raw parquet table — proving the format conversion is lossless
for the carried types.

Scale notes: CSV/JSON are row-oriented, schema-on-read, and ~5-10× the
scan cost of Parquet (no column pruning, no row-group skipping, full
string parsing) — at 100 TB they are ingest formats, converted to
Parquet/Iceberg on first touch (the ingest module's job), never the
serving layer. ORC is columnar with pushdown like Parquet; Spark treats
the two interchangeably at plan level.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries import query
from iceberg_metadata_pipeline_spark.session import load_tables

_NATION_AGG_ORACLE = """
SELECT n_regionkey, COUNT(*) AS n, MIN(n_name) AS first_name
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
"""


def _nation_agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n"), F.min("n_name").alias("first_name"))
        .orderBy("n_regionkey")
    )


@query("source_csv_roundtrip", _NATION_AGG_ORACLE)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → CSV (header) → schema-on-read back → aggregate."""
    nation = load_tables(spark, sf_dir)["nation"]
    loc = tempfile.mkdtemp(prefix="src-csv-") + "/nation_csv"
    nation.write.option("header", "true").csv(loc)
    back = (
        spark.read.option("header", "true")
        .schema(nation.schema)
        .csv(loc)
    )
    return _nation_agg(back)


@query("source_json_roundtrip", _NATION_AGG_ORACLE)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → JSON lines → schema'd read back → aggregate."""
    nation = load_tables(spark, sf_dir)["nation"]
    loc = tempfile.mkdtemp(prefix="src-json-") + "/nation_json"
    nation.write.json(loc)
    back = spark.read.schema(nation.schema).json(loc)
    return _nation_agg(back)


@query(
    "source_orc_roundtrip",
    """
SELECT o_orderstatus, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → ORC (columnar sibling; pushdown-capable) → aggregate."""
    orders = load_tables(spark, sf_dir)["orders"]
    loc = tempfile.mkdtemp(prefix="src-orc-") + "/orders_orc"
    orders.write.orc(loc)
    back = spark.read.orc(loc)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double").alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "source_text_roundtrip",
    """
SELECT COUNT(*) AS n_lines,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       MIN(length(text)) AS min_len, MAX(length(text)) AS max_len
FROM documents
""",
)
def source_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → line-oriented text files → spark.read.text back.
    One line per document (the raw-corpus interchange format every LLM
    pipeline starts from); newlines inside documents would need escaping,
    asserted absent here. Aggregate must match the parquet source."""
    docs = load_tables(spark, sf_dir)["documents"]
    assert docs.filter(F.col("text").contains("\n")).count() == 0
    loc = tempfile.mkdtemp(prefix="src-text-") + "/docs_txt"
    docs.select("text").write.text(loc)
    back = spark.read.text(loc)  # one 'value' column per line
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).cast("bigint").alias("total_chars"),
        F.min(F.length("value")).alias("min_len"),
        F.max(F.length("value")).alias("max_len"),
    )


@query("source_binaryfile_scan", None)  # file bytes aren't a DuckDB table → rows-only
def source_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.read.format('binaryFile'): whole files as (path, length,
    content) rows — the ingestion seam for multimodal blobs (images,
    audio) that llmops/multimodal.py processes. Reads the fixture's own
    parquet files as opaque binaries and digests them; invariants
    (length == actual bytes, magic header) are asserted in
    tests/test_sanitize.py."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
    )
    return df.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        "length",
        F.md5("content").alias("content_md5"),
    ).orderBy("file_name")


@query("source_xml_roundtrip", _NATION_AGG_ORACLE)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → XML (rowTag records) → schema'd read back → aggregate.
    Spark 4 ships the XML source natively (SPARK-44751, the former
    spark-xml package). Same scale caveat as CSV/JSON: row-oriented
    ingest format, converted to columnar on first touch."""
    nation = load_tables(spark, sf_dir)["nation"]
    loc = tempfile.mkdtemp(prefix="src-xml-") + "/nation_xml"
    nation.write.format("xml").option("rootTag", "nations").option(
        "rowTag", "nation"
    ).save(loc)
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema(nation.schema)
        .load(loc)
    )
    return _nation_agg(back)
