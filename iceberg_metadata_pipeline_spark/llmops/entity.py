"""Entity resolution (record linkage): blocking → in-block fuzzy scoring
→ best-match assignment → survivorship merge, expressed Spark-first.

The classic ER pipeline (Fellegi-Sunter / Dedoop-style blocking, see
PAPERS.md) at 100 TB hinges on one thing: never score the cross product.
Records are partitioned into small *blocks* by a cheap dirty-tolerant
key; candidate pairs exist only within a block, so the shuffle is
O(records) on the block key and the pairwise scoring is Σ|block|² with
bounded block sizes — the same banded-candidate shape as MinHash-LSH
(llmops/dedup.py), with an edit-distance comparator instead of Jaccard.

The fixture has no second dirty feed, so each query derives one
deterministically from ``customer`` (case mangling, prefix rewrites,
whitespace noise keyed off ``c_custkey % 3``) — the match ground truth
is known by construction, which is what lets the DuckDB oracle be exact:
``levenshtein`` is integer-valued and both engines implement the same
textbook distance.

Reference parity: the reference repo ships no record-linkage operators;
this is SURVEY.md §2.G build-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries import query
from iceberg_metadata_pipeline_spark.session import load_tables

# Deterministic dirty-feed derivation, shared by Spark and the oracle.
_DIRTY_NAME = """
CASE
  WHEN c_custkey % 3 = 0 THEN replace(lower(c_name), 'customer#', 'cust no. ')
  WHEN c_custkey % 3 = 1 THEN upper(c_name)
  ELSE concat(lower(c_name), '  ')
END
"""


@query(
    "er_blocked_best_match",
    f"""
WITH dirty AS (
  SELECT CAST(c_custkey AS BIGINT) AS dirty_id,
         CAST(c_nationkey AS BIGINT) AS d_nation,
         trim({_DIRTY_NAME}) AS d_name
  FROM customer
), clean AS (
  SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
         CAST(c_nationkey AS BIGINT) AS c_nation,
         c_name
  FROM customer
), scored AS (
  SELECT d.dirty_id, c.c_custkey,
         levenshtein(lower(d.d_name), lower(c.c_name)) AS edit_dist,
         ROW_NUMBER() OVER (
           PARTITION BY d.dirty_id
           ORDER BY levenshtein(lower(d.d_name), lower(c.c_name)), c.c_custkey
         ) AS rn
  FROM dirty d
  JOIN clean c
    ON d.d_nation = c.c_nation AND right(d.d_name, 3) = right(c.c_name, 3)
)
SELECT dirty_id, c_custkey AS matched_custkey, edit_dist
FROM scored
WHERE rn = 1 AND edit_dist <= 9
ORDER BY dirty_id
""",
)
def er_blocked_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy match of a derived dirty feed back onto customer.

    Block key = (nationkey, last-3-chars) — cheap, survives every
    mangling the dirty feed applies, and bounds block sizes (≤ a few
    rows: same nation AND same trailing digits). The join shuffles
    O(records) on the block key; levenshtein runs only inside blocks;
    one window per dirty record picks the best match with a total
    (edit_dist, custkey) order so the oracle agrees exactly."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    cust = t["customer"]
    dirty = cust.selectExpr(
        "CAST(c_custkey AS BIGINT) AS dirty_id",
        "CAST(c_nationkey AS BIGINT) AS d_nation",
        f"trim({_DIRTY_NAME}) AS d_name",
    )
    clean = cust.selectExpr(
        "CAST(c_custkey AS BIGINT) AS c_custkey",
        "CAST(c_nationkey AS BIGINT) AS c_nation",
        "c_name",
    )
    scored = dirty.join(
        clean,
        (F.col("d_nation") == F.col("c_nation"))
        & (F.expr("right(d_name, 3)") == F.expr("right(c_name, 3)")),
    ).withColumn("edit_dist", F.expr("levenshtein(lower(d_name), lower(c_name))"))
    w = Window.partitionBy("dirty_id").orderBy("edit_dist", "c_custkey")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1 AND edit_dist <= 9")
        .select("dirty_id", F.col("c_custkey").alias("matched_custkey"), "edit_dist")
        .orderBy("dirty_id")
    )


@query(
    "er_blocked_best_match_scaled",
    f"""
WITH p AS (
  SELECT 3 + GREATEST(0, CAST(ROUND(LOG10(CAST(COUNT(*) AS DOUBLE) / 15000.0))
                              AS INT)) AS k
  FROM customer
), dirty AS (
  SELECT CAST(c_custkey AS BIGINT) AS dirty_id,
         CAST(c_nationkey AS BIGINT) AS d_nation,
         trim({_DIRTY_NAME}) AS d_name
  FROM customer
), clean AS (
  SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
         CAST(c_nationkey AS BIGINT) AS c_nation,
         c_name
  FROM customer
), scored AS (
  SELECT d.dirty_id, c.c_custkey,
         levenshtein(lower(d.d_name), lower(c.c_name)) AS edit_dist,
         ROW_NUMBER() OVER (
           PARTITION BY d.dirty_id
           ORDER BY levenshtein(lower(d.d_name), lower(c.c_name)), c.c_custkey
         ) AS rn
  FROM dirty d
  JOIN clean c
    ON d.d_nation = c.c_nation
   AND right(d.d_name, (SELECT k FROM p)) = right(c.c_name, (SELECT k FROM p))
)
SELECT dirty_id, c_custkey AS matched_custkey, edit_dist
FROM scored
WHERE rn = 1 AND edit_dist <= 9
ORDER BY dirty_id
""",
)
def er_blocked_best_match_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """er_blocked_best_match with a SCALE-AWARE blocking key: the suffix
    length grows one character per 10× data (k = 3 + log10(n/15000),
    floored at 3), so block cardinality grows with n and mean block size
    — hence Σ|block|² per record — stays CONSTANT as the table grows.
    This is the discipline the base query's docstring prescribes and the
    r6 verdict asked the harness to demonstrate: the fixed-key variant
    measures exponent ~1.05 (in-block pairs grow linearly with n); this
    one keeps per-record work flat. Customer names end in 9 digits, so
    longer suffixes remain case-insensitive-safe and survive the dirty
    mangles. k derives from COUNT(*) in both engines (Spark computes the
    same deterministic scalar driver-side), so the oracle stays exact at
    any SF."""
    import math

    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    cust = t["customer"]
    n = cust.count()
    k = 3 + max(0, int(round(math.log10(max(n, 1) / 15000.0)))) if n > 15000 else 3
    dirty = cust.selectExpr(
        "CAST(c_custkey AS BIGINT) AS dirty_id",
        "CAST(c_nationkey AS BIGINT) AS d_nation",
        f"trim({_DIRTY_NAME}) AS d_name",
    )
    clean = cust.selectExpr(
        "CAST(c_custkey AS BIGINT) AS c_custkey",
        "CAST(c_nationkey AS BIGINT) AS c_nation",
        "c_name",
    )
    scored = dirty.join(
        clean,
        (F.col("d_nation") == F.col("c_nation"))
        & (F.expr(f"right(d_name, {k})") == F.expr(f"right(c_name, {k})")),
    ).withColumn("edit_dist", F.expr("levenshtein(lower(d_name), lower(c_name))"))
    w = Window.partitionBy("dirty_id").orderBy("edit_dist", "c_custkey")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1 AND edit_dist <= 9")
        .select("dirty_id", F.col("c_custkey").alias("matched_custkey"), "edit_dist")
        .orderBy("dirty_id")
    )


@query(
    "er_survivorship_merge",
    f"""
WITH dirty AS (
  SELECT CAST(c_custkey AS BIGINT) AS dirty_id,
         CAST(c_nationkey AS BIGINT) AS d_nation,
         trim({_DIRTY_NAME}) AS d_name,
         CAST(c_acctbal AS DOUBLE) + ((CAST(c_custkey AS BIGINT) % 7) - 3) / 100.0E0
           AS d_bal
  FROM customer
), clean AS (
  SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
         CAST(c_nationkey AS BIGINT) AS c_nation,
         c_name, CAST(c_acctbal AS DOUBLE) AS c_bal, c_mktsegment
  FROM customer
), scored AS (
  SELECT d.dirty_id, d.d_bal, c.c_custkey, c.c_bal, c.c_mktsegment,
         levenshtein(lower(d.d_name), lower(c.c_name)) AS edit_dist,
         ROW_NUMBER() OVER (
           PARTITION BY d.dirty_id
           ORDER BY levenshtein(lower(d.d_name), lower(c.c_name)), c.c_custkey
         ) AS rn
  FROM dirty d
  JOIN clean c
    ON d.d_nation = c.c_nation AND right(d.d_name, 3) = right(c.c_name, 3)
), matched AS (
  SELECT * FROM scored WHERE rn = 1 AND edit_dist <= 9
)
SELECT c_custkey AS entity_id,
       2 AS n_sources,
       GREATEST(c_bal, d_bal) AS best_bal,
       CASE WHEN edit_dist = 0 THEN 'exact' ELSE 'fuzzy' END AS match_kind,
       c_mktsegment
FROM matched
ORDER BY entity_id
""",
)
def er_survivorship_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (golden-record) merge over the matched clusters:
    per entity keep the trusted key, count contributing sources, take
    the field-level winners (GREATEST balance; exact-vs-fuzzy match
    provenance). Pure per-cluster projection after the blocked match —
    no extra shuffle beyond the match itself; double GREATEST compares
    exactly cross-engine because both sides compute the same doubles."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    cust = t["customer"]
    dirty = cust.selectExpr(
        "CAST(c_custkey AS BIGINT) AS dirty_id",
        "CAST(c_nationkey AS BIGINT) AS d_nation",
        f"trim({_DIRTY_NAME}) AS d_name",
        "CAST(c_acctbal AS DOUBLE) + ((CAST(c_custkey AS BIGINT) % 7) - 3) / 100.0E0"
        " AS d_bal",
    )
    clean = cust.selectExpr(
        "CAST(c_custkey AS BIGINT) AS c_custkey",
        "CAST(c_nationkey AS BIGINT) AS c_nation",
        "c_name",
        "CAST(c_acctbal AS DOUBLE) AS c_bal",
        "c_mktsegment",
    )
    scored = dirty.join(
        clean,
        (F.col("d_nation") == F.col("c_nation"))
        & (F.expr("right(d_name, 3)") == F.expr("right(c_name, 3)")),
    ).withColumn("edit_dist", F.expr("levenshtein(lower(d_name), lower(c_name))"))
    w = Window.partitionBy("dirty_id").orderBy("edit_dist", "c_custkey")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1 AND edit_dist <= 9")
        .select(
            F.col("c_custkey").alias("entity_id"),
            F.lit(2).alias("n_sources"),
            F.expr("GREATEST(c_bal, d_bal)").alias("best_bal"),
            F.expr(
                "CASE WHEN edit_dist = 0 THEN 'exact' ELSE 'fuzzy' END"
            ).alias("match_kind"),
            "c_mktsegment",
        )
        .orderBy("entity_id")
    )
