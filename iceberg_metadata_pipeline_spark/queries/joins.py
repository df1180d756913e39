"""Join surface — every strategy the reference deploys (SURVEY.md §2.B joins).

The reference raises the broadcast threshold to 64 MB so dimension tables
always broadcast (entrypoint-spark.sh:38,130) and leaves big-big joins to
sort-merge with AQE skew splitting (:121). We declare one query per join
shape; the DataFrame-API ones carry explicit strategy hints and tests
assert the physical plan (BroadcastHashJoin vs SortMergeJoin).

Scale notes (100 TB): fact-fact joins shuffle both sides on the key —
at 1000 executors that is the dominant cost, so the declared plans keep
dimension joins broadcast (zero shuffle) and fact-fact joins on the join
key only after filters have reduced the input (filter-before-join is
Catalyst-automatic via predicate pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries import query, sql_query
from iceberg_metadata_pipeline_spark.session import load_tables


@query(
    "join_broadcast_dim",
    """
SELECT n_name, COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join of fact→small dim (no shuffle on dim)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double").alias("total_bal"),
        )
        .orderBy("n_name")
    )


@query(
    "join_sort_merge_bigbig",
    """
SELECT o_orderstatus, COUNT(*) AS n_items,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def join_sort_merge_bigbig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join forced to sort-merge (MERGE hint): both sides shuffle
    on the join key; at scale this is the canonical co-partitioned join."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .hint("merge")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("total_qty"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "join_shuffle_hash",
    """
SELECT p_brand, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
""",
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHUFFLE_HASH-hinted join — avoids the sort at the cost of building a
    hash map per partition; right choice when one side is modest but above
    the broadcast threshold."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["part"].hint("shuffle_hash"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .orderBy("p_brand")
    )


@query(
    "join_left_outer",
    """
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM customer LEFT JOIN orders
  ON c_custkey = o_custkey AND o_totalprice > 350000
ORDER BY c_custkey, o_orderkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side predicate (kept in the ON clause —
    moving it to WHERE would change semantics to inner)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(
            t["orders"],
            (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_totalprice") > 350000),
            "left",
        )
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .orderBy("c_custkey", "o_orderkey")
    )


sql_query(
    "join_full_outer",
    """
SELECT s_suppkey, s_name, c.c_custkey, c.c_name
FROM supplier s FULL OUTER JOIN customer c
  ON s.s_nationkey = c.c_nationkey AND c.c_acctbal > 9990
""",
)


@query(
    "join_left_semi_exists",
    """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
)
def join_left_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join ≡ EXISTS subquery (the oracle spells it as EXISTS)."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 400000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "join_left_anti_not_exists",
    """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_left_anti_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join ≡ NOT EXISTS (null-safe, unlike NOT IN with nulls)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


sql_query(
    "join_cross",
    """
SELECT r_name, n_name
FROM region CROSS JOIN nation
ORDER BY r_name, n_name
""",
)


@query(
    "join_theta_range",
    """
SELECT s.s_suppkey, c.c_custkey
FROM supplier s JOIN customer c
  ON c.c_acctbal > s.s_acctbal AND c.c_acctbal <= s.s_acctbal + 50
ORDER BY s_suppkey, c_custkey
""",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join — Spark executes as BroadcastNestedLoop
    when one side is small. At 100 TB scale this shape must be rewritten to
    bucketed-equi-join + residual filter (see llmops.similarity for the
    banded pattern); declared here in its direct form."""
    t = load_tables(spark, sf_dir)
    s, c = t["supplier"], t["customer"]
    return (
        s.join(
            c,
            (F.col("c_acctbal") > F.col("s_acctbal"))
            & (F.col("c_acctbal") <= F.col("s_acctbal") + 50),
        )
        .select("s_suppkey", "c_custkey")
        .orderBy("s_suppkey", "c_custkey")
    )


sql_query(
    "join_self",
    """
SELECT a.n_name AS nation_a, b.n_name AS nation_b
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
ORDER BY nation_a, nation_b
""",
)

sql_query(
    "join_multiway_snowflake",
    """
SELECT r_name, o_orderstatus, COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, o_orderstatus
ORDER BY r_name, o_orderstatus
""",
)

sql_query(
    "subquery_in_uncorrelated",
    """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
  AND o_totalprice > 250000
ORDER BY o_orderkey
""",
)

sql_query(
    "subquery_scalar_agg",
    """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                             / COUNT(*) * 2.5 FROM orders)
ORDER BY o_orderkey
""",
)

sql_query(
    "join_right_outer",
    # customers without any 'P' order survive with null order columns
    """
SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice
FROM (SELECT * FROM orders WHERE o_orderstatus = 'P') o
RIGHT OUTER JOIN customer ON o_custkey = c_custkey
ORDER BY c_custkey, o_orderkey NULLS FIRST
LIMIT 500
""",
)

sql_query(
    "join_null_keys_semantics",
    # SQL equi-joins never match NULL keys; rows with nulled keys drop out
    # of the inner join but survive the left join with null right side
    """
SELECT
  (SELECT COUNT(*) FROM
    (SELECT nullif(c_nationkey, 3) AS k, c_custkey FROM customer) c
    JOIN (SELECT n_nationkey, n_name FROM nation) n ON c.k = n.n_nationkey
  ) AS inner_matches,
  (SELECT COUNT(*) FROM
    (SELECT nullif(c_nationkey, 3) AS k, c_custkey FROM customer) c
    LEFT JOIN (SELECT n_nationkey, n_name FROM nation) n ON c.k = n.n_nationkey
  ) AS left_rows,
  (SELECT COUNT(*) FROM customer WHERE nullif(c_nationkey, 3) IS NULL) AS nulled_keys
""",
)

sql_query(
    "join_null_safe_equality",
    # Spark's <=> (null-safe equal): NULL <=> NULL is true — the join that
    # DOES match null keys; DuckDB spells it IS NOT DISTINCT FROM
    """
SELECT COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN a.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_pairs
FROM (SELECT nullif(c_nationkey, 3) AS k, c_custkey FROM customer WHERE c_custkey < 100) a
JOIN (SELECT nullif(c_nationkey, 3) AS k, c_custkey FROM customer WHERE c_custkey < 100) b
  ON a.k <=> b.k AND a.c_custkey < b.c_custkey
""",
    oracle="""
SELECT COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN a.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_pairs
FROM (SELECT nullif(c_nationkey, 3) AS k, c_custkey FROM customer WHERE c_custkey < 100) a
JOIN (SELECT nullif(c_nationkey, 3) AS k, c_custkey FROM customer WHERE c_custkey < 100) b
  ON a.k IS NOT DISTINCT FROM b.k AND a.c_custkey < b.c_custkey
""",
)


# optimizer hints: Spark honors /*+ BROADCAST(n) */; DuckDB parses the
# same text as a plain comment — one SQL string serves both engines
sql_query(
    "join_hint_broadcast_sql",
    """
SELECT /*+ BROADCAST(n) */ r.r_name, COUNT(*) AS n_nations
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
""",
    oracle="same",
)


@query(
    "join_range_binned",
    """
SELECT b.band_id, COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
FROM lineitem l
JOIN (SELECT DISTINCT p_size AS band_id,
             p_size * 0.8 AS lo, p_size * 0.8 + 5 AS hi
      FROM part) b
  ON l.l_quantity BETWEEN b.lo AND b.hi
GROUP BY b.band_id
ORDER BY b.band_id
""",
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-bin interval join: identical semantics to the oracle's naive
    BETWEEN theta join, but planned as a shuffled EQUI-join on the bin
    key (plan-asserted in tests: no nested-loop). The oracle engine runs
    the naive form — results must agree exactly."""
    from iceberg_metadata_pipeline_spark.functions.skew import binned_range_join

    t = load_tables(spark, sf_dir)
    bands = (
        t["part"]
        .select(F.col("p_size").alias("band_id"))
        .distinct()
        .select(
            "band_id",
            (F.col("band_id") * 0.8).alias("lo"),
            (F.col("band_id") * 0.8 + 5).alias("hi"),
        )
    )
    joined = binned_range_join(t["lineitem"], bands, "l_quantity", "lo", "hi", 5.0)
    return (
        joined.groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("total_qty"),
        )
        .orderBy("band_id")
    )


# Fuzzy (approximate-string) self-join with blocking: near-identical part
# names within a brand, by Levenshtein edit distance ≤ 2. The naive form
# is an all-pairs theta join (O(n²) comparisons, a BroadcastNestedLoopJoin
# scale-killer); the declared plan BLOCKS first — equi-join on
# (brand, first token), so the quadratic term is bounded per block — and
# a cheap length-delta prefilter (|len(a)-len(b)| ≤ 2, a necessary
# condition for edit distance ≤ 2) prunes candidates before the O(len²)
# levenshtein kernel runs. This block→prefilter→verify shape is the same
# candidate-pair discipline as the MinHash-LSH dedup pipeline, applied to
# entity resolution. The blocking key is the recall/cost dial: brand
# alone left ~800-row blocks (quadratic pain measured at 12 s on sf0.1);
# adding the first name token cut pair generation ~50× while keeping
# within-block edits findable. At 100 TB free text would block on an
# n-gram LSH key instead; the equi-join shuffles on the key and AQE
# splits skewed blocks either way.
sql_query(
    "join_fuzzy_levenshtein",
    # Spark side uses the BOUNDED 3-arg levenshtein (optimization r12):
    # with threshold k it runs the banded O(len·k) DP and returns -1
    # past the bound instead of the full O(len²) matrix — ~1M candidate
    # pairs each pay ~5× less kernel. On every surviving pair the
    # bounded value IS the true distance (≤ 2), so n_near_pairs and
    # min_dist are unchanged; the oracle keeps the plain spelling.
    """
WITH p AS (
  SELECT p_partkey, p_brand, p_name, split(p_name, ' ')[0] AS tok1 FROM part
)
SELECT a.p_brand, COUNT(*) AS n_near_pairs,
       CAST(MIN(levenshtein(a.p_name, b.p_name, 2)) AS BIGINT) AS min_dist
FROM p a JOIN p b
  ON a.p_brand = b.p_brand
 AND a.tok1 = b.tok1
 AND a.p_partkey < b.p_partkey
 AND abs(length(a.p_name) - length(b.p_name)) <= 2
WHERE levenshtein(a.p_name, b.p_name, 2) >= 0
GROUP BY a.p_brand
ORDER BY a.p_brand
""",
    oracle="""
WITH p AS (
  SELECT p_partkey, p_brand, p_name, string_split(p_name, ' ')[1] AS tok1 FROM part
)
SELECT a.p_brand, COUNT(*) AS n_near_pairs,
       CAST(MIN(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS min_dist
FROM p a JOIN p b
  ON a.p_brand = b.p_brand
 AND a.tok1 = b.tok1
 AND a.p_partkey < b.p_partkey
 AND abs(length(a.p_name) - length(b.p_name)) <= 2
WHERE levenshtein(a.p_name, b.p_name) <= 2
GROUP BY a.p_brand
ORDER BY a.p_brand
""",
)


# join strategy hints (the remaining two of Spark's four): SHUFFLE_HASH
# builds a hash map from the hinted side per shuffle partition (beats
# sort-merge when the build side fits memory but exceeds the broadcast
# threshold), MERGE forces sort-merge (the safe choice when both sides
# are huge and neither fits a hash build). Plan-asserted in
# tests/test_plans.py; result-identical to the unhinted join, which is
# what the oracle checks (DuckDB reads the hint as a plain comment).
sql_query(
    "join_hint_shuffle_hash",
    """
SELECT /*+ SHUFFLE_HASH(c) */ c.c_mktsegment, COUNT(*) AS n,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""",
    oracle="same",
)

sql_query(
    "join_hint_merge_sql",
    """
SELECT /*+ MERGE(l) */ o.o_orderpriority, COUNT(*) AS n
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    oracle="same",
)


def salted_join(
    fact: DataFrame,
    other: DataFrame,
    fact_key: str,
    other_key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: the fact side gets a deterministic
    salt in [0, n_salt) (hash of the whole fact row's key tuple — no
    rand(), so retries/speculation reproduce the same placement) and the
    other side is replicated n_salt times, joining on (key, salt).

    A hot key's fact rows then land in n_salt different shuffle
    partitions instead of one: at 100 TB a single key holding 1% of a
    10 TB shuffle is a 100 GB straggler task — salting caps any task at
    hot_key_volume / n_salt. Cost: the other side shuffles n_salt x its
    size, so use it when the skewed side is the BIG one and the other
    side is mid-sized (too big to broadcast, small enough to replicate).
    This is the manual fallback for the cases AQE skew-join handling
    does not cover (it only splits sort-merge/shuffle-hash join
    partitions, not the hash-aggregate AFTER the join, and it needs
    accurate size stats at runtime).

    The salt hashes the WHOLE fact row, not the key — hashing the key
    alone would send every row of the hot key to the same salt bucket
    and change nothing. Full-row hashing spreads a hot key's rows
    uniformly while staying deterministic across task retries.
    """
    salted_fact = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salt)).cast(
            "int"
        ),
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = salted_fact.join(
        replicated,
        (F.col(fact_key) == F.col(other_key)) & (salted_fact["__salt"] == replicated["__salt"]),
        how,
    )
    return out.drop("__salt")


@query(
    "join_skew_salted",
    """
SELECT o_orderpriority, COUNT(*) AS n_items,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus <> 'P'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join, result-identical to the plain join (the oracle
    states the unsalted spelling): lineitem salted 8 ways, orders
    replicated 8x, joined on (orderkey, salt). See salted_join for the
    100 TB rationale; the equivalence IS the point — salting is a
    physical rewrite, never a semantic one."""
    t = load_tables(spark, sf_dir)
    joined = salted_join(
        t["lineitem"],
        t["orders"].where(F.col("o_orderstatus") != "P"),
        "l_orderkey",
        "o_orderkey",
        n_salt=8,
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# --- fuzzy join #2: Jaro-Winkler ---------------------------------------------

def _jaro_winkler_kernel(s1: str, s2: str) -> float:
    """Jaro-Winkler similarity, standard parameters (prefix ≤ 4, scale
    0.1, boost threshold 0.7), matching DuckDB's
    ``jaro_winkler_similarity`` BIT-FOR-BIT on non-empty ASCII input
    (verified over 8k random pairs; the only divergence is ''-vs-''
    where DuckDB returns 0.0 — replicated here). Pure-Python kernel: it
    only ever runs on BLOCKED candidate pairs, Arrow-batched."""
    if not s1 or not s2:
        return 0.0
    l1, l2 = len(s1), len(s2)
    # clamp: max//2 - 1 is negative for single-char strings, which would
    # empty the match window and score 'a' vs 'a' as 0.0 where DuckDB
    # scores 1.0 (review finding; pinned by test)
    match_dist = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = 0 if i < match_dist else i - match_dist
        hi = min(l2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0
    if j > 0.7:
        pfx = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            pfx += 1
        return j + pfx * 0.1 * (1.0 - j)
    return j


_JW_ORACLE = """
WITH p AS (
  SELECT p_partkey, p_brand, p_name, string_split(p_name, ' ')[1] AS tok1 FROM part
)
SELECT a.p_brand, COUNT(*) AS n_near_pairs,
       MAX(jaro_winkler_similarity(a.p_name, b.p_name)) AS max_jw
FROM p a JOIN p b
  ON a.p_brand = b.p_brand
 AND a.tok1 = b.tok1
 AND a.p_partkey < b.p_partkey
WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.9
GROUP BY a.p_brand
ORDER BY a.p_brand
"""


@query("join_fuzzy_jaro_winkler", _JW_ORACLE)
def join_fuzzy_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join by JARO-WINKLER similarity ≥ 0.9 within
    (brand, first-token) blocks — the prefix-weighted companion to
    join_fuzzy_levenshtein, the measure of choice for short name-like
    strings. The declared plan applies the COLLAPSE-THEN-PAIR
    discipline (the Kendall/Theil-Sen shape): one hash aggregate
    reduces rows to distinct (brand, name) CELLS with multiplicities,
    the Python kernel (an Arrow-batched pandas UDF — no JVM builtin)
    scores only DISTINCT-name pairs, and row-level pair counts come
    back as exact integer weights — c₁·c₂ across cells, c·(c−1)/2
    within a cell (identical strings, similarity 1.0 by definition,
    never kernelled). The oracle is the NAIVE row-level self-join, so
    the collapse must reproduce its counts exactly. Measured 16.5 s →
    ~1 s at sf0.1 (132k row pairs → ~200 kernel calls); at 100 TB the
    kernel cost is O(distinct names² per block) regardless of row
    count, and the blocking key becomes an n-gram LSH key. Kernel
    doubles are bit-identical to DuckDB's (8k-random-pair test)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def jw(a, b):
        return pd.Series(
            [_jaro_winkler_kernel(x, y) for x, y in zip(a, b)], dtype="float64"
        )

    t = load_tables(spark, sf_dir)
    cells = (
        t["part"]
        .select(
            "p_brand", "p_name",
            F.split(F.col("p_name"), " ").getItem(0).alias("tok1"),
        )
        .groupBy("p_brand", "p_name", "tok1")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    a = cells.alias("a")
    b = cells.alias("b")
    cross = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.tok1") == F.col("b.tok1"))
        & (F.col("a.p_name") < F.col("b.p_name")),
    ).select(
        F.col("a.p_brand").alias("p_brand"),
        jw(F.col("a.p_name"), F.col("b.p_name")).alias("sim"),
        (F.col("a.c") * F.col("b.c")).alias("w"),
    )
    same = cells.filter(F.col("c") >= 2).select(
        "p_brand",
        F.lit(1.0).alias("sim"),
        (F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("w"),
    )
    return (
        cross.unionByName(same)
        .filter(F.col("sim") >= 0.9)
        .groupBy("p_brand")
        .agg(
            F.sum("w").cast("long").alias("n_near_pairs"),
            F.max("sim").alias("max_jw"),
        )
        .orderBy("p_brand")
    )


# --- interval-overlap join (both sides intervals), binned ---------------------

_IOV_ORACLE = """
WITH a AS (
  SELECT o_orderpriority,
         datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS lo,
         datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) + 6 AS hi
  FROM orders WHERE o_totalprice > 480000
), b AS (
  SELECT datediff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS lo,
         datediff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) + 13 AS hi
  FROM lineitem
)
SELECT a.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo) + 1) AS BIGINT)
         AS total_overlap_days
FROM a JOIN b ON a.lo <= b.hi AND b.lo <= a.hi
GROUP BY a.o_orderpriority
ORDER BY a.o_orderpriority
"""


@query("join_interval_overlap_binned", _IOV_ORACLE)
def join_interval_overlap_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL × INTERVAL overlap join — the two-sided generalization
    of join_range_binned (point-in-interval): high-value order windows
    [orderdate, +6d] against lineitem delivery windows [shipdate, +13d].
    The naive form is a pure theta join (BroadcastNestedLoopJoin — the
    O(n·m) scale-killer); the declared plan EXPLODES each interval into
    the fixed-width bins it covers (W=32 days ≥ either interval length,
    so ≤ 2 bins per row — a bounded map-side multiplier), equi-joins on
    the bin, and counts each pair EXACTLY ONCE without a distinct by
    keeping only the bin that contains the overlap START (GREATEST of
    the los) — dedup by arithmetic, not by shuffle. Overlap length is
    exact integer day math. The oracle runs the naive theta join; the
    binned plan must reproduce it exactly. At 100 TB the bin join
    shuffles on a dense integer key AQE can split; W tunes the
    multiplier-vs-selectivity tradeoff."""
    t = load_tables(spark, sf_dir)
    w = 32
    a = (
        t["orders"]
        .filter(F.col("o_totalprice") > 480000)
        .select(
            "o_orderpriority",
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias("alo"),
        )
        .withColumn("ahi", F.col("alo") + 6)
        .withColumn("bin", F.explode(F.sequence(F.expr(f"alo DIV {w}"), F.expr(f"ahi DIV {w}"))))
    )
    b = (
        t["lineitem"]
        .select(
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1995-01-01").cast("date")).alias("blo"),
        )
        .withColumn("bhi", F.col("blo") + 13)
        .withColumn("bin", F.explode(F.sequence(F.expr(f"blo DIV {w}"), F.expr(f"bhi DIV {w}"))))
    )
    pairs = a.join(b, "bin").filter(
        (F.col("alo") <= F.col("bhi"))
        & (F.col("blo") <= F.col("ahi"))
        & (F.col("bin") == F.expr(f"GREATEST(alo, blo) DIV {w}"))
    )
    return (
        pairs.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(
                F.least("ahi", "bhi") - F.greatest("alo", "blo") + F.lit(1)
            ).cast("long").alias("total_overlap_days"),
        )
        .orderBy("o_orderpriority")
    )
