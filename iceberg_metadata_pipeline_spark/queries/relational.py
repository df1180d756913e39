"""Projection / filter / predicate surface (SURVEY.md §2.B).

The reference exposes this whole family through its Thrift-served Spark SQL
(entrypoint-spark.sh:73); we declare each predicate shape as a named query.
All predicates here are parquet-pushdown-eligible (verified via
.explain → PushedFilters in tests); projections prune to ReadSchema.

Shared-SQL queries: the same ANSI string runs on Spark and DuckDB, so
parity is by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries import query, sql_query
from iceberg_metadata_pipeline_spark.session import load_tables

sql_query(
    "project_alias_expr",
    """
SELECT o_orderkey,
       o_totalprice * 0.9 AS discounted,
       upper(o_orderstatus) AS status_uc,
       o_orderpriority
FROM orders
""",
)

sql_query(
    "filter_conj_disj_not",
    """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE (l_quantity > 45 OR l_discount > 0.09)
  AND NOT (l_returnflag = 'A')
  AND l_tax <> 0.0
""",
)

sql_query(
    "filter_in_between",
    """
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_totalprice BETWEEN 100000 AND 200000
""",
)

sql_query(
    "filter_like",
    """
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_name LIKE '%gold%' OR p_type LIKE 'SMALL%'
""",
)

sql_query(
    "filter_is_null",
    # fixtures are null-free; synthesize nulls with NULLIF to exercise
    # null-predicate semantics end-to-end
    """
SELECT c_custkey,
       NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null
FROM customer
WHERE NULLIF(c_mktsegment, 'BUILDING') IS NULL
""",
)

sql_query(
    "case_when",
    """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'big'
            WHEN o_totalprice > 150000 THEN 'mid'
            ELSE 'small' END AS bucket,
       CASE o_orderstatus WHEN 'F' THEN 1 ELSE 0 END AS is_final
FROM orders
""",
)


@query(
    "project_prune_filter_pushdown",
    """
SELECT l_orderkey, l_extendedprice
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1995-06-01 00:00:00'
""",
)
def project_prune_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame-API projection+filter; Catalyst prunes the scan to 3 columns
    and pushes the timestamp range into the parquet reader (SURVEY.md §4)."""
    l = load_tables(spark, sf_dir)["lineitem"]
    return l.filter(F.col("l_shipdate") < F.lit("1995-06-01").cast("timestamp")).select(
        "l_orderkey", "l_extendedprice"
    )


sql_query(
    "distinct_values",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)

sql_query(
    "order_by_limit_topk",
    """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15
""",
)

sql_query(
    "order_by_multi_nulls",
    """
SELECT c_custkey, NULLIF(c_mktsegment, 'MACHINERY') AS seg, c_acctbal
FROM customer
ORDER BY seg NULLS FIRST, c_acctbal DESC, c_custkey
LIMIT 50
""",
)


# inline VALUES relation joined against a table (the lookup-table idiom);
# Spark spells the row constructor FROM VALUES ... AS t(...), DuckDB
# (VALUES ...) t(...)
sql_query(
    "relational_values_cte",
    """
WITH v AS (
  SELECT * FROM VALUES ('F', 'finished'), ('O', 'open'), ('P', 'pending') AS t(code, label)
)
SELECT v.label, COUNT(*) AS n
FROM orders JOIN v ON o_orderstatus = v.code
GROUP BY v.label
ORDER BY v.label
""",
    oracle="""
WITH v AS (
  SELECT * FROM (VALUES ('F', 'finished'), ('O', 'open'), ('P', 'pending')) t(code, label)
)
SELECT v.label, COUNT(*) AS n
FROM orders JOIN v ON o_orderstatus = v.code
GROUP BY v.label
ORDER BY v.label
""",
)


# Spark's physical-layout clauses: DISTRIBUTE BY hashes rows to
# partitions, SORT BY orders within each partition — they change layout,
# never content, so the oracle is the plain projection (the harness
# value-hash is row-order-insensitive). The write-side use is
# partitioned/sorted file layout (see rewrite_data_files sort_by).
sql_query(
    "relational_distribute_sort_by",
    """
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
FROM lineitem
WHERE l_orderkey < 500
DISTRIBUTE BY l_returnflag SORT BY l_returnflag, l_orderkey, l_linenumber
""",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
FROM lineitem
WHERE l_orderkey < 500
""",
)


# One-pass column profiling: every per-column statistic computed in a
# SINGLE aggregate job (one table scan regardless of column count — the
# ANALYZE TABLE shape), then pivoted to one row per column with stack().
# The naive per-column UNION ALL the oracle runs scans the table once
# per column — at 100 TB that multiplier is the difference between a
# profile and an outage.
sql_query(
    "relational_column_profile",
    """
WITH a AS (
  SELECT COUNT(*) AS n,
         COUNT(lang) AS nn_lang, COUNT(DISTINCT lang) AS nd_lang,
         COUNT(source) AS nn_source, COUNT(DISTINCT source) AS nd_source,
         COUNT(n_chars) AS nn_chars, COUNT(DISTINCT n_chars) AS nd_chars
  FROM documents
)
SELECT s.col, a.n AS n_rows, s.nn AS n_nonnull, s.nd AS n_distinct
FROM a LATERAL VIEW stack(3,
  'lang', nn_lang, nd_lang,
  'n_chars', nn_chars, nd_chars,
  'source', nn_source, nd_source) s AS col, nn, nd
ORDER BY s.col
""",
    oracle="""
SELECT 'lang' AS col, COUNT(*) AS n_rows, COUNT(lang) AS n_nonnull,
       COUNT(DISTINCT lang) AS n_distinct FROM documents
UNION ALL
SELECT 'n_chars', COUNT(*), COUNT(n_chars), COUNT(DISTINCT n_chars) FROM documents
UNION ALL
SELECT 'source', COUNT(*), COUNT(source), COUNT(DISTINCT source) FROM documents
ORDER BY col
""",
)
