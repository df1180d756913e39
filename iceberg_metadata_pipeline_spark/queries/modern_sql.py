"""Modern Spark SQL surface (Spark 4.x): recursive CTEs, correlated
LATERAL subqueries, Python UDTFs, GROUP BY ALL. The reference deploys
"all of Spark SQL" (SURVEY.md §2.B, entrypoint-spark.sh:73); these are
the newest corners of that surface, each proven against DuckDB.

Scale notes: a correlated LATERAL with LIMIT decorrelates to the same
window/group-limit plan as the top-k-per-group query (no per-row
subquery execution); recursive CTEs iterate a join per level — depth,
not data size, is the driver-side factor; Python UDTFs are Arrow-batched
like pandas UDFs and belong off the hot path (here: sentence splitting,
a genuinely per-row generator shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iceberg_metadata_pipeline_spark.queries import query, sql_query
from iceberg_metadata_pipeline_spark.session import load_tables

# recursive CTE: walk the nation table key-by-key accumulating region
# keys — pure integer arithmetic, identical in both engines. Depth is
# bounded to 12 steps: each recursive iteration is one Spark job, so
# the walk length sets gate wall-clock linearly while proving the same
# shape (12 vs 25 steps halved this query's gate cost, r6).
sql_query(
    "subquery_recursive_cte",
    """
WITH RECURSIVE walk(key, total) AS (
  SELECT n_nationkey, CAST(n_regionkey AS BIGINT)
  FROM nation WHERE n_nationkey = 0
  UNION ALL
  SELECT n.n_nationkey, w.total + n.n_regionkey
  FROM walk w JOIN nation n ON n.n_nationkey = w.key + 1
  WHERE w.key < 11
)
SELECT COUNT(*) AS n_steps, MAX(total) AS final_total FROM walk
""",
    oracle="same",
)

# correlated LATERAL subquery with ORDER BY + LIMIT: top-2 nations per
# region — Catalyst decorrelates this to a window group-limit, not a
# per-row re-execution
sql_query(
    "join_lateral_topk",
    """
SELECT r.r_name, l.n_name
FROM region r, LATERAL (
  SELECT n_name FROM nation n
  WHERE n.n_regionkey = r.r_regionkey
  ORDER BY n_name LIMIT 2
) l
ORDER BY r.r_name, l.n_name
""",
    oracle="same",
)

sql_query(
    "agg_group_by_all",
    """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ALL
ORDER BY l_returnflag, l_linestatus
""",
    oracle="same",
)


@query(
    "udtf_sentence_split",
    """
SELECT doc_id, i - 1 AS idx, length(parts[i]) AS sent_len
FROM (
  SELECT doc_id, parts, unnest(generate_series(1, len(parts))) AS i
  FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM documents) s
) e
ORDER BY doc_id, idx
""",
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): one output row per sentence,
    invoked as a LATERAL table function — the row-generator shape
    (parsing, span extraction) that neither scalar UDFs nor explode
    express naturally. Deterministic string math, so it oracle-checks
    against DuckDB's split + range lateral."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent: string, idx: int")
    class SplitSentences:
        def eval(self, text: str):
            for i, sent in enumerate((text or "").split(". ")):
                yield sent, i

    load_tables(spark, sf_dir)
    spark.udtf.register("split_sentences", SplitSentences)
    return spark.sql(
        """
        SELECT d.doc_id, s.idx, length(s.sent) AS sent_len
        FROM documents d, LATERAL split_sentences(d.text) s
        ORDER BY doc_id, idx
        """
    )

# multi-column (tuple) IN-subquery — Catalyst rewrites it to a left-semi
# join on both columns; the oracle states the same semantics as EXISTS
# (DuckDB's tuple-IN spelling differs)
sql_query(
    "subquery_tuple_in",
    """
SELECT l_returnflag, COUNT(*) AS n
FROM lineitem
WHERE (l_orderkey, l_linenumber) IN (
  SELECT o_orderkey, 1 FROM orders WHERE o_orderstatus = 'F'
)
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n
FROM lineitem l
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_orderkey = l.l_orderkey AND l.l_linenumber = 1
    AND o.o_orderstatus = 'F'
)
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)


@query(
    "udtf_table_partition_by",
    """
SELECT o_custkey, COUNT(*) AS n_orders,
  MAX(gap) AS max_gap_days,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS spend
FROM (
  SELECT o_custkey, o_totalprice,
    date_diff('day',
      lag(CAST(o_orderdate AS DATE)) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      CAST(o_orderdate AS DATE)) AS gap
  FROM orders WHERE o_custkey % 7 = 3
) g
GROUP BY o_custkey
HAVING COUNT(*) >= 8
ORDER BY o_custkey
""",
)
def udtf_table_partition_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF with a TABLE(...) PARTITION BY ... ORDER BY input (Spark 4):
    each customer's orders arrive as one ordered group in a single UDTF
    instance — the SQL-native sibling of applyInPandas for per-entity
    sequential logic (sessionizers, gap analysis, chain validation).

    Scale: TABLE(t) PARTITION BY k plans a hash shuffle on k, then
    Arrow-batches each group through the Python worker — the same
    distribution discipline as groupBy().applyInPandas; no driver-side
    data motion. The max-gap statistic depends only on the sorted date
    multiset, so same-date tie order cannot affect the result (the
    oracle's lag() window states the identical semantics relationally).

    The input is a deterministic customer slice (o_custkey % 7 = 3,
    ~14%): modulo sampling keeps every sampled customer's FULL order
    history (group-complete, so gap semantics are exact) while the bench
    measures the operator — shuffle + ordered per-group UDTF dispatch —
    not per-row Python over the whole table. Measured (r6, sf0.1,
    median-of-3 warm): full table 3.3 s; with
    spark.sql.execution.pythonUDTF.arrow.enabled=true it is 4.5x SLOWER
    (15.3 s — Arrow UDTF still dispatches eval per row and adds
    conversion overhead), so that conf stays off.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_custkey bigint, n_orders bigint, max_gap_days int, spend double")
    class OrderGaps:
        def __init__(self):
            self.dates: list = []
            self.key = None
            self.spend = 0  # exact integer cents

        def eval(self, row):
            self.key = row["o_custkey"]
            self.dates.append(row["o_orderdate"].date())
            self.spend += round(row["o_totalprice"] * 100)

        def terminate(self):
            if self.key is None:
                return
            n = len(self.dates)
            if n >= 8:
                gaps = [
                    (b - a).days for a, b in zip(self.dates, self.dates[1:])
                ]
                yield self.key, n, max(gaps) if gaps else None, self.spend / 100.0

    load_tables(spark, sf_dir)
    spark.udtf.register("order_gaps", OrderGaps)
    return spark.sql(
        """
        SELECT * FROM order_gaps(
          TABLE(SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
                FROM orders WHERE o_custkey % 7 = 3)
          PARTITION BY o_custkey ORDER BY (o_orderdate, o_orderkey))
        ORDER BY o_custkey
        """
    )


@query(
    "udtf_polymorphic_schema",
    """
SELECT c_custkey,
  string_split(c_name, '#')[1] AS p0,
  string_split(c_name, '#')[2] AS p1
FROM customer
WHERE c_custkey < 200
ORDER BY c_custkey
""",
)
def udtf_polymorphic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF (Spark 4 analyze()): the output schema is
    computed at plan time from a literal argument — here split_fixed's
    column count p0..p{n-1} comes from n=2.  analyze() runs once on the
    driver during analysis; execution then distributes normally, so the
    dynamic schema costs nothing at runtime."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SplitFixed:
        @staticmethod
        def analyze(s: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            st = StructType()
            for i in range(n.value):
                st = st.add(f"p{i}", StringType())
            return AnalyzeResult(schema=st)

        def eval(self, s: str, n: int):
            parts = (s or "").split("#")
            yield tuple((parts + [None] * n)[:n])

    load_tables(spark, sf_dir)
    spark.udtf.register("split_fixed", SplitFixed)
    return spark.sql(
        """
        SELECT c.c_custkey, s.p0, s.p1
        FROM customer c, LATERAL split_fixed(c.c_name, 2) s
        WHERE c.c_custkey < 200
        ORDER BY c.c_custkey
        """
    )
