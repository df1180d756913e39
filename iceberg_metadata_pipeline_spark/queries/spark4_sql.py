"""Spark 4 SQL-language surface: pipe syntax, session variables,
EXECUTE IMMEDIATE, SQL-defined functions (scalar + table), string
collations, SELECT * EXCEPT, lateral column aliases, named function
arguments, deterministic MODE, LISTAGG, IS DISTINCT FROM.

The reference deploys "all of Spark SQL" through its Thrift server
(SURVEY.md §2.B, entrypoint-spark.sh:73); a Superset user pointed at a
Spark 4 engine gets this surface for free, so the rebuild declares and
oracle-proves it explicitly.  Every query here is pure SQL front-end
shape — Catalyst lowers each to the same scan/filter/agg physical plans
as the classic spellings, so there is no new scale surface: pipe syntax
is sugar over the same logical plan; session variables constant-fold
into literals at analysis time (the filter still pushes down to
parquet); SQL UDFs inline into the calling plan (no UDF call at
runtime, unlike Python UDFs); collated comparisons run JVM-side.

Oracle strategy: DuckDB speaks none of these dialect forms, so each
oracle states the equivalent ANSI query (inlined variables, expanded
UDF bodies, lower() for UTF8_LCASE collation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iceberg_metadata_pipeline_spark.queries import query
from iceberg_metadata_pipeline_spark.session import load_tables


@query(
    "sql_pipe_syntax",
    """
SELECT c_mktsegment, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus = 'F'
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4: FROM ... |> WHERE |> JOIN |> AGGREGATE).

    Each |> stage is parsed into the same logical operator the classic
    clause produces — the optimized plan is identical to the oracle's
    spelling (filter pushed below the join, broadcast on the small
    side), so the feature costs nothing at 100 TB.
    """
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> JOIN customer ON o_custkey = c_custkey
        |> AGGREGATE COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
           GROUP BY c_mktsegment
        |> SELECT c_mktsegment, n, revenue
        |> ORDER BY c_mktsegment
        """
    )


@query(
    "sql_session_variables",
    """
SELECT l_returnflag, COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_quantity > 45.0
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4: DECLARE / SET VAR / reference).

    The variable reference constant-folds to a literal during analysis,
    so the predicate still reaches the parquet scan as a pushed filter —
    session variables parameterize queries without losing pushdown
    (unlike driver-side string interpolation, they are typed and
    injection-safe).
    """
    load_tables(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE qty_cut DOUBLE DEFAULT 30.0")
    spark.sql("SET VAR qty_cut = 45.0")
    return spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_quantity > qty_cut
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "sql_execute_immediate",
    """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE with a ? parameter (Spark 4 dynamic SQL).

    The statement text is bound and analyzed once per execution; the
    USING argument arrives as a typed literal (parameter binding, not
    string splicing), so the equality predicate pushes down exactly as
    in the static spelling.
    """
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority, COUNT(*) AS n
           FROM orders WHERE o_orderstatus = ?
           GROUP BY o_orderpriority ORDER BY o_orderpriority'
        USING 'F'
        """
    )


@query(
    "sql_scalar_udf",
    """
SELECT l_returnflag,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
    AS disc_revenue
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (CREATE FUNCTION ... RETURN expr).

    Unlike Python UDFs, SQL UDFs are *inlined* into the calling plan at
    analysis time — the physical plan contains the multiplied columns,
    not a function call, so whole-stage codegen covers it and there is
    no serialization boundary.  This is the right way to share scalar
    logic across queries at 100 TB.
    """
    load_tables(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(price DOUBLE, disc DOUBLE)
        RETURNS DOUBLE
        RETURN price * (1 - disc)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
          CAST(SUM(CAST(disc_price(l_extendedprice, l_discount) AS DECIMAL(38,6)))
               AS DOUBLE) AS disc_revenue
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "sql_table_udf",
    """
SELECT r_name, i
FROM region, LATERAL (
  SELECT unnest(generate_series(1, r_regionkey + 1)) AS i
) t
ORDER BY r_name, i
""",
)
def sql_table_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined table function with correlated LATERAL invocation.

    The function body inlines as a lateral subquery — Catalyst plans the
    correlated sequence expansion as a generator (explode) over the
    outer row, the same shape as a LATERAL VIEW, with no per-row
    re-planning.
    """
    load_tables(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION int_range(n INT)
        RETURNS TABLE(i INT)
        RETURN SELECT explode(sequence(1, n)) AS i
        """
    )
    return spark.sql(
        """
        SELECT r.r_name, t.i
        FROM region r, LATERAL int_range(CAST(r.r_regionkey AS INT) + 1) t
        ORDER BY r.r_name, t.i
        """
    )


@query(
    "fn_collation_lcase",
    """
SELECT lower(mixed) AS lang_ci, COUNT(*) AS n
FROM (
  SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS mixed
  FROM documents
) s
GROUP BY lower(mixed)
ORDER BY lang_ci
""",
)
def fn_collation_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4: COLLATE UTF8_LCASE) — case-insensitive
    grouping without lower() rewrites.

    The collated comparison runs in the JVM comparators (grouping,
    joins, ORDER BY all honor the collation natively); the output key is
    cast back to a plain string so downstream consumers see an ordinary
    column.  The oracle states the classic lower() equivalent.
    """
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(lower(mixed COLLATE UTF8_LCASE) AS STRING) AS lang_ci,
               COUNT(*) AS n
        FROM (
          SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS mixed
          FROM documents
        ) s
        GROUP BY mixed COLLATE UTF8_LCASE
        ORDER BY lang_ci
        """
    )


@query(
    "fn_select_except",
    """
SELECT doc_id, lang, source, n_chars
FROM documents
ORDER BY doc_id
LIMIT 25
""",
)
def fn_select_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * EXCEPT (cols) — project-all-but (Spark 4).

    Resolves to an explicit column list at analysis time, so column
    pruning applies exactly as if the list were written out: the wide
    `text` column is never read from parquet.
    """
    load_tables(spark, sf_dir)
    return spark.sql(
        "SELECT * EXCEPT (text) FROM documents ORDER BY doc_id LIMIT 25"
    )


@query(
    "fn_lateral_column_alias",
    """
SELECT l_orderkey, l_linenumber,
  l_extendedprice * (1 - l_discount) AS disc_price,
  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
  ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        - l_extendedprice * (1 - l_discount), 2) AS tax_paid
FROM lineitem
ORDER BY l_orderkey, l_linenumber
LIMIT 100
""",
)
def fn_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases: later select-list items reference earlier
    aliases in the same SELECT (Spark 3.4+/4).  The analyzer expands the
    chain into independent expressions — identical plan to the repeated
    spelling, but single-source-of-truth in the query text.
    """
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
          l_extendedprice * (1 - l_discount) AS disc_price,
          disc_price * (1 + l_tax) AS charge,
          ROUND(charge - disc_price, 2) AS tax_paid
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber
        LIMIT 100
        """
    )


@query(
    "fn_named_arguments",
    """
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(substr(text, 1, 40),
    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', '9', 'g') AS masked
FROM documents
ORDER BY doc_id
LIMIT 25
""",
)
def fn_named_arguments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named function arguments (Spark 4: f(param => value)) — here on
    mask(), skipping positional parameters to set only the ones that
    matter.  Pure scalar projection; named binding is resolved at
    analysis time.
    """
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT doc_id,
          mask(substr(text, 1, 40),
               upperChar => 'X', lowerChar => 'x',
               digitChar => '9', otherChar => NULL) AS masked
        FROM documents
        ORDER BY doc_id
        LIMIT 25
        """
    )


@query(
    "agg_mode_deterministic",
    """
WITH c AS (
  SELECT user_id % 8 AS bucket, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), r AS (
  SELECT bucket, event_type,
    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY n DESC, event_type) AS rk
  FROM c
)
SELECT bucket, event_type AS modal_type FROM r WHERE rk = 1 ORDER BY bucket
""",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE(expr, deterministic=true): most frequent value per group with
    the tie broken toward the lowest value — reproducible across runs
    and partitionings (plain mode() ties are arbitrary, which would
    break both the oracle and any downstream incremental logic).
    Hash-aggregates a (group, value) count map per partition then
    merges — the same two-phase shape as count(distinct) at scale.
    """
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT user_id % 8 AS bucket, mode(event_type, true) AS modal_type
        FROM events
        GROUP BY user_id % 8
        ORDER BY bucket
        """
    )


@query(
    "agg_listagg_within_group",
    """
SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS members
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""",
)
def agg_listagg_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG(col, sep) WITHIN GROUP (ORDER BY ...) — ANSI ordered
    string aggregation (Spark 4).  The WITHIN GROUP ordering makes the
    result deterministic regardless of shuffle arrival order — the same
    reason agg_array_collect_sorted sorts before collecting.  Bounded
    here by group size (5 nations/region); at 100 TB cap the group or
    use collect+slice, since the concatenated string is driver-visible.
    """
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_regionkey,
          listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS members
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey
        """
    )


@query(
    "filter_is_distinct_from",
    """
SELECT o_orderstatus, COUNT(*) AS n
FROM orders
WHERE nullif(o_orderstatus, 'F') IS DISTINCT FROM 'P'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def filter_is_distinct_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] DISTINCT FROM — ANSI null-safe comparison (the standard
    spelling of Spark's <=>).  NULL IS DISTINCT FROM 'P' is TRUE, so
    rows nulled by nullif() survive the filter — the semantics plain <>
    would silently drop.  Null-safe predicates matter for join keys and
    CDC diffing where NULL means "absent", not "unknown".
    """
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders
        WHERE nullif(o_orderstatus, 'F') IS DISTINCT FROM 'P'
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


from iceberg_metadata_pipeline_spark.queries import sql_query  # noqa: E402

# try_* arithmetic (round 11): Spark 4's ANSI-mode-safe arithmetic
# surface — try_divide/try_mod return NULL where the strict operator
# would raise. The oracle spells the same semantics with guards (DuckDB
# has no try_ operators) — integer arithmetic, exact.
sql_query(
    "fn_try_arithmetic_family",
    """
SELECT l_orderkey, l_linenumber,
  try_divide(CAST(l_quantity AS BIGINT),
             CAST(l_linenumber - 1 AS BIGINT)) AS qty_per,
  try_mod(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT),
          CAST(l_linenumber - 1 AS BIGINT)) AS cents_mod
FROM lineitem
WHERE l_orderkey < 200
ORDER BY l_orderkey, l_linenumber
""",
    oracle="""
SELECT l_orderkey, l_linenumber,
  CASE WHEN l_linenumber - 1 = 0 THEN NULL
       ELSE CAST(CAST(l_quantity AS BIGINT) AS DOUBLE)
            / CAST(l_linenumber - 1 AS DOUBLE) END AS qty_per,
  CASE WHEN l_linenumber - 1 = 0 THEN NULL
       ELSE CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            % CAST(l_linenumber - 1 AS BIGINT) END AS cents_mod
FROM lineitem
WHERE l_orderkey < 200
ORDER BY l_orderkey, l_linenumber
""",
)
