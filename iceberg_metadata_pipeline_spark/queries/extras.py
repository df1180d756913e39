"""Remaining relational-surface corners (SURVEY.md §2.B scalar/agg
families): unpivot (wide→long), explode_outer null semantics, exact
median/percentiles, and seeded sampling.

Scale notes: unpivot is a map-only row multiplier (×n_metrics) — no
shuffle; explode_outer is explode with null preservation (map-only);
exact median/percentile is a full sort per group — at 100 TB use
approx_percentile (declared in aggregates.py) unless the group count is
small; sample pushes a per-partition Bernoulli filter into the scan (no
shuffle, no materialization of the rejected rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries import query, sql_query
from iceberg_metadata_pipeline_spark.session import load_tables


@query(
    "unpivot_stack",
    """
SELECT l_orderkey, l_linenumber, 'disc' AS metric, l_discount AS val
FROM lineitem WHERE l_orderkey < 100
UNION ALL
SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
FROM lineitem WHERE l_orderkey < 100
UNION ALL
SELECT l_orderkey, l_linenumber, 'qty', l_quantity
FROM lineitem WHERE l_orderkey < 100
ORDER BY l_orderkey, l_linenumber, metric
""",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long via DataFrame.unpivot (SQL `stack`): map-only ×3 rows."""
    l = load_tables(spark, sf_dir)["lineitem"]
    return (
        l.filter(F.col("l_orderkey") < 100)
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            [
                F.col("l_discount").alias("disc"),
                F.col("l_extendedprice").alias("price"),
                F.col("l_quantity").alias("qty"),
            ],
            "metric",
            "val",
        )
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )


sql_query(
    "fn_explode_outer",
    # explode_outer preserves the parent row when the array is null/empty;
    # DuckDB emulates by substituting [NULL] before unnest
    """
SELECT p_partkey, tok
FROM (
  SELECT p_partkey,
         CASE WHEN p_size > 25 THEN CAST(NULL AS ARRAY<STRING>)
              ELSE split(p_name, ' ') END AS toks
  FROM part WHERE p_partkey < 300
) t
LATERAL VIEW OUTER explode(toks) AS tok
ORDER BY p_partkey, tok
""",
    oracle="""
SELECT p_partkey, unnest(CASE WHEN toks IS NULL OR len(toks) = 0
                              THEN [CAST(NULL AS VARCHAR)] ELSE toks END) AS tok
FROM (
  SELECT p_partkey,
         CASE WHEN p_size > 25 THEN CAST(NULL AS VARCHAR[])
              ELSE string_split(p_name, ' ') END AS toks
  FROM part WHERE p_partkey < 300
) t
ORDER BY p_partkey, tok
""",
)

sql_query(
    "agg_median_percentiles",
    # exact median / quartiles (continuous interpolation) per group
    """
SELECT l_returnflag,
       median(l_quantity) AS med_qty,
       percentile(l_quantity, 0.25) AS q1_qty,
       percentile(l_quantity, 0.75) AS q3_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    oracle="""
SELECT l_returnflag,
       median(l_quantity) AS med_qty,
       quantile_cont(l_quantity, 0.25) AS q1_qty,
       quantile_cont(l_quantity, 0.75) AS q3_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)


@query("sample_bernoulli_seeded", None)  # engine RNGs differ → rows-only
def sample_bernoulli_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli TABLESAMPLE: the filter evaluates per-row inside
    the scan — no shuffle, rejected rows never materialize. Deterministic
    for a fixed seed + input splits (rows-only: DuckDB's RNG ≠ Spark's)."""
    l = load_tables(spark, sf_dir)["lineitem"]
    s = l.sample(fraction=0.1, seed=42)
    return s.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


sql_query(
    "fn_vector_ops",
    # element-wise vector arithmetic as higher-order functions — the
    # building blocks every embedding operator composes from
    """
SELECT vec_id,
       round(aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>),
                                CAST(embedding AS ARRAY<DOUBLE>),
                                (x, y) -> x * y),
                       CAST(0 AS DOUBLE), (acc, x) -> acc + x), 9) AS self_dot,
       round(sqrt(aggregate(transform(CAST(embedding AS ARRAY<DOUBLE>), x -> x * x),
                            CAST(0 AS DOUBLE), (acc, x) -> acc + x)), 9) AS l2_norm,
       size(embedding) AS dim,
       round(aggregate(transform(CAST(embedding AS ARRAY<DOUBLE>), x -> x * 2.5),
                       CAST(0 AS DOUBLE), (acc, x) -> acc + x), 9) AS scaled_sum
FROM embeddings
WHERE vec_id < 50
ORDER BY vec_id
""",
    oracle="""
SELECT vec_id,
       round(list_reduce(list_transform(range(1, len(embedding)+1),
                 i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
                 (acc, x) -> acc + x), 9) AS self_dot,
       round(sqrt(list_reduce(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                 (acc, x) -> acc + x)), 9) AS l2_norm,
       len(embedding) AS dim,
       round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.5),
                 (acc, x) -> acc + x), 9) AS scaled_sum
FROM embeddings
WHERE vec_id < 50
ORDER BY vec_id
""",
)

sql_query(
    "window_following_frame",
    # remaining-total frame: CURRENT ROW → UNBOUNDED FOLLOWING
    """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE)
    AS remaining_total
FROM orders
WHERE o_custkey < 50
ORDER BY o_custkey, o_orderkey
""",
)

sql_query(
    "text_edit_distance",
    # fuzzy matching kernel: levenshtein + affix predicates over a bounded
    # candidate set (at scale this only ever runs on blocked candidates)
    """
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30)) AS lev30,
       CASE WHEN substr(a.text, 1, 5) = substr(b.text, 1, 5) THEN 1 ELSE 0 END AS same_prefix5
FROM documents a JOIN documents b ON a.doc_id < b.doc_id AND a.doc_id < 15 AND b.doc_id < 15
ORDER BY id_a, id_b
""",
)


@query(
    "agg_salted_two_stage",
    """
SELECT l_returnflag, COUNT(*) AS n,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_salted_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-stage aggregation (salt → partial → final): with
    only 3 distinct return flags, a naive final stage funnels everything
    through 3 tasks; salting spreads each hot key over 16. The result
    must equal the plain GROUP BY oracle exactly (decimal partials fold
    order-free)."""
    from iceberg_metadata_pipeline_spark.functions.skew import salted_two_stage_agg

    li = load_tables(spark, sf_dir)["lineitem"]
    return salted_two_stage_agg(li, ["l_returnflag"], "l_extendedprice").orderBy(
        "l_returnflag"
    )


@query(
    "relational_cached_scan",
    """
SELECT o_orderstatus, COUNT(*) AS n
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def relational_cached_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CACHE TABLE surface (df.cache): repeated interactive reads hit the
    in-memory columnar relation instead of re-scanning parquet — the
    Thrift-server dashboard pattern. Results must be identical cached or
    not; the plan is asserted to actually read from cache.

    Scale note: cache what fits (a projected/filtered slice), never the
    raw 100 TB table — executor storage memory evicts LRU and a too-big
    cache thrashes; the parquet scan with pushdown is often faster than
    a spilled cache."""
    orders = load_tables(spark, sf_dir)["orders"]
    proj = orders.select("o_orderstatus").cache()
    proj.count()  # materialize (unpersist deferred: the driver collects after return)
    result = (
        proj.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "InMemory" in plan, "cached scan must read from cache"
    return result


# native UNPIVOT / PIVOT clauses (SQL-standard spellings both engines
# parse identically — the relational complement to the DataFrame
# .pivot() and stack() forms declared elsewhere)
sql_query(
    "unpivot_native_clause",
    """
SELECT p_partkey, cat, val
FROM (
  SELECT p_partkey, CAST(p_size AS DOUBLE) AS size_v,
         CAST(p_retailprice AS DOUBLE) AS price_v
  FROM part
)
UNPIVOT (val FOR cat IN (size_v, price_v))
ORDER BY p_partkey, cat
""",
    oracle="same",
)

sql_query(
    "pivot_native_clause",
    """
SELECT l_returnflag, CAST(O AS DOUBLE) AS sum_o, CAST(F AS DOUBLE) AS sum_f
FROM (
  SELECT l_returnflag, l_linestatus, CAST(l_quantity AS DECIMAL(38,6)) AS q
  FROM lineitem
)
PIVOT (SUM(q) FOR l_linestatus IN ('O', 'F'))
ORDER BY l_returnflag
""",
    oracle="same",
)


# --- Damerau-Levenshtein (true, unrestricted) ---------------------------------

def _damerau_levenshtein_kernel(s1: str, s2: str) -> int:
    """TRUE Damerau-Levenshtein distance (unrestricted transpositions —
    the Lowrance-Wagner alphabet-indexed DP, not the optimal-string-
    alignment shortcut). Pinned against DuckDB's ``damerau_levenshtein``
    over 3k random pairs: DuckDB implements the true metric (28/3000
    random pairs differ from OSA, 0 from this kernel). Integer output —
    no float parity hazard at all. Runs only on bounded candidate
    sets (the blocked-pair discipline)."""
    da: dict[str, int] = {}
    l1, l2 = len(s1), len(s2)
    maxd = l1 + l2
    d = [[maxd] * (l2 + 2) for _ in range(l1 + 2)]
    for i in range(l1 + 1):
        d[i + 1][1] = i
    for j in range(l2 + 1):
        d[1][j + 1] = j
    for i in range(1, l1 + 1):
        db = 0
        for j in range(1, l2 + 1):
            k = da.get(s2[j - 1], 0)
            l = db
            if s1[i - 1] == s2[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[s1[i - 1]] = i
    return d[l1 + 1][l2 + 1]


_DL_ORACLE = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30)) AS BIGINT) AS lev30,
       CAST(damerau_levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30)) AS BIGINT) AS dl30,
       CAST(levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30))
            - damerau_levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30)) AS BIGINT)
         AS transposition_gain
FROM documents a JOIN documents b ON a.doc_id < b.doc_id AND a.doc_id < 15 AND b.doc_id < 15
ORDER BY id_a, id_b
"""


@query("text_damerau_levenshtein", _DL_ORACLE)
def text_damerau_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damerau-Levenshtein edit distance (TRUE metric, unrestricted
    transpositions) beside plain Levenshtein over the bounded candidate
    set — transposition_gain counts how many edits adjacent swaps save,
    the signal that separates typo-dup detection from genuine edits.
    The DL kernel is an Arrow-batched pandas UDF (no JVM builtin);
    Levenshtein stays the JVM builtin. All-integer output: zero float
    parity surface. At scale both kernels run only on LSH/blocked
    candidates (the join_fuzzy_* discipline)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def dl(a, b):
        return pd.Series(
            [_damerau_levenshtein_kernel(x, y) for x, y in zip(a, b)],
            dtype="int64",
        )

    t = load_tables(spark, sf_dir)
    docs = t["documents"].filter(F.col("doc_id") < 15).select(
        "doc_id", F.substring("text", 1, 30).alias("t30")
    )
    a = docs.alias("a")
    b = docs.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.levenshtein(F.col("a.t30"), F.col("b.t30")).cast("bigint").alias("lev30"),
            dl(F.col("a.t30"), F.col("b.t30")).alias("dl30"),
        )
        .withColumn(
            "transposition_gain", (F.col("lev30") - F.col("dl30")).cast("bigint")
        )
        .orderBy("id_a", "id_b")
    )
