"""Window-function surface (SURVEY.md §2.B windows).

Full ranking / analytic / frame-aggregate families the reference serves
via Spark SQL. Every window ORDER BY includes a unique tiebreaker so
results are total-ordered and oracle-deterministic.

Scale notes (100 TB): a window shuffles once on partitionBy keys; frames
are evaluated with a single sort per partition. Skewed partition keys are
the hazard (one giant user swamping an executor) — the mitigation is
either pre-aggregation before the window or AQE skew handling; a window
with NO partitionBy (global sort) is flagged in tests as an anti-pattern
at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from iceberg_metadata_pipeline_spark.queries import query, sql_query
from iceberg_metadata_pipeline_spark.session import load_tables


@query(
    "window_topk_per_group",
    """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t WHERE rn <= 3
ORDER BY o_custkey, rn
""",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — the canonical pattern replacing per-group sorts;
    at scale Spark pushes a per-partition top-K (WindowGroupLimit) before
    the shuffle, so only K rows per group per partition move."""
    o = load_tables(spark, sf_dir)["orders"]
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


sql_query(
    "window_rank_dense_ntile",
    """
SELECT c_custkey, c_mktsegment, c_acctbal,
       RANK()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk,
       DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS drnk,
       NTILE(4)     OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
FROM customer
ORDER BY c_mktsegment, rnk, c_custkey
""",
)

sql_query(
    "window_lag_lead",
    """
SELECT o_custkey, o_orderkey, o_orderdate,
       LAG(o_orderdate)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_date,
       LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_date,
       LAG(o_totalprice, 1, 0.0) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
""",
)


@query(
    "window_running_sum_rows",
    """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
ORDER BY o_custkey, o_orderkey
""",
)
def window_running_sum_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total with an explicit ROWS frame (decimal-accumulated)."""
    o = load_tables(spark, sf_dir)["orders"]
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w).cast("double").alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")


sql_query(
    "window_sliding_frame",
    """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE)
    / COUNT(*) OVER w AS moving_avg3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
""",
)

sql_query(
    "window_range_frame",
    """
SELECT c_mktsegment, c_custkey, c_acctbal,
       COUNT(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
                      RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS n_within_500
FROM customer
ORDER BY c_mktsegment, c_acctbal, c_custkey
""",
)

sql_query(
    "window_first_last_value",
    """
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
)

sql_query(
    "window_cume_percent",
    """
SELECT c_custkey, c_acctbal,
       CUME_DIST()    OVER (ORDER BY c_acctbal, c_custkey) AS cd,
       PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) AS pr
FROM customer
ORDER BY c_custkey
""",
)

# the scale-safe spelling of the above: CUME_DIST within mktsegment
# partitions — each segment sorts independently (one shuffle on the
# partition key, no global single-partition sort), which is the form a
# 100 TB distribution query should take; window_cume_percent stays as the
# declared global-semantics demo (r4 VERDICT #9)
sql_query(
    "window_cume_percent_grouped",
    """
SELECT c_mktsegment, c_custkey, c_acctbal,
       CUME_DIST()    OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS cd,
       PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS pr
FROM customer
ORDER BY c_mktsegment, c_custkey
""",
)

# IGNORE NULLS placement differs by dialect: Spark puts it after the
# closing paren, DuckDB inside the argument list — same semantics
sql_query(
    "window_nth_value_ignore_nulls",
    """
SELECT o_custkey, o_orderkey,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_order,
       FIRST_VALUE(CASE WHEN o_orderstatus = 'F' THEN o_orderkey END) IGNORE NULLS
         OVER w AS first_finished
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey, o_orderkey
""",
    oracle="""
SELECT o_custkey, o_orderkey,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_order,
       FIRST_VALUE(CASE WHEN o_orderstatus = 'F' THEN o_orderkey END IGNORE NULLS)
         OVER w AS first_finished
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey, o_orderkey
""",
)

# window over an aggregate (ratio-to-report): the empty OVER () frame
# computes the global total alongside the grouped one
sql_query(
    "window_share_of_total",
    """
SELECT c_mktsegment,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS seg_bal,
       round(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
             / SUM(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)) OVER (), 9)
         AS share
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    oracle="same",
)

sql_query(
    "window_yoy_growth",
    """
WITH y AS (
  SELECT year(CAST(o_orderdate AS DATE)) AS yr,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS rev
  FROM orders GROUP BY yr
)
SELECT yr, rev,
       round(rev / lag(rev) OVER (ORDER BY yr) - 1, 9) AS yoy_growth
FROM y
ORDER BY yr
""",
    oracle="same",
)


# named WINDOW clause: one window definition shared by several functions
# — the analyzer expands every OVER w to the same spec, so Spark plans a
# single Window operator (one sort/shuffle) for all three expressions.
sql_query(
    "window_named_clause",
    """
SELECT o_orderkey, o_orderpriority,
       RANK() OVER w AS rnk,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE) AS run_rev,
       COUNT(*) OVER w AS run_n
FROM orders
WHERE o_orderstatus = 'F'
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
ORDER BY o_orderpriority, o_orderkey
LIMIT 200
""",
    oracle="same",
)


def ewma(
    df: DataFrame,
    partition: str,
    order: list[str],
    value: str,
    alpha: float = 0.5,
    horizon: int = 16,
) -> DataFrame:
    """Exponentially-weighted moving average per partition key.

    s_0 = x_0; s_t = alpha*x_t + (1-alpha)*s_{t-1}, evaluated with ONE
    window scan (no per-row recursion): the closed form
    s_t = (1-a)^t * (x_0 + a * sum_{i<=t} x_i / (1-a)^i) turns the
    recurrence into a cumulative sum of a per-row scaled value — a
    single shuffle on the partition key, the same cost as any running
    sum. ``horizon`` bounds the lookback so the 1/(1-a)^i scaling
    cannot overflow on long histories: rows past the horizon are
    EXCLUDED from the result (bounded-lookback contract, pinned by
    test_ewma_horizon_bounds_lookback) — callers needing values for a
    longer tail should re-key the partition column into
    horizon-sized segments first.
    """
    w_rn = W.partitionBy(partition).orderBy(*order)
    rn = F.row_number().over(w_rn) - 1
    df = df.withColumn("__rn", rn).filter(F.col("__rn") < horizon)
    decay = 1.0 - alpha
    u = F.when(F.col("__rn") == 0, F.col(value)).otherwise(
        F.col(value) * F.lit(alpha) / F.pow(F.lit(decay), F.col("__rn"))
    )
    cum = F.sum(u).over(
        W.partitionBy(partition).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    )
    return df.withColumn(
        "ewma", cum * F.pow(F.lit(decay), F.col("__rn"))
    ).drop("__rn")


@query(
    "window_ewma_halflife",
    """
WITH e AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
  FROM events
),
s AS (
  SELECT user_id, event_id, rn,
         CAST(FLOOR(value * 1000000) AS BIGINT)
           * CASE WHEN rn = 0 THEN 1
                  ELSE CAST(POWER(2, rn - 1) AS BIGINT) END AS u
  FROM e WHERE rn < 16
)
SELECT user_id, event_id, rn,
       CAST(SUM(u) OVER (PARTITION BY user_id ORDER BY rn
                         ROWS UNBOUNDED PRECEDING)
            // CAST(POWER(2, rn) AS BIGINT) AS BIGINT) AS ewma_micro
FROM s
ORDER BY user_id, rn
LIMIT 3000
""",
)
def window_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (alpha=1/2) of event values per user, first 16 events.

    The registry variant runs the closed-form scan in integer
    micro-units: with alpha=1/2 the per-row scaling is a power of two,
    so u = floor(value*1e6) * 2^(rn-1) is an exact BIGINT, the window
    SUM is order-independent integer arithmetic, and ewma_micro =
    S DIV 2^rn truncates identically in Spark and DuckDB — bit-exact
    cross-engine, no float-summation-order exposure. The general-alpha
    float path is ``ewma()`` above (same single-scan plan).
    """
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    w_rn = W.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.withColumn("rn", F.row_number().over(w_rn) - 1).filter(F.col("rn") < 16)
    u = (
        F.floor(F.col("value") * 1_000_000).cast("long")
        * F.when(F.col("rn") == 0, F.lit(1).cast("long")).otherwise(
            F.pow(F.lit(2.0), F.col("rn") - 1).cast("long")
        )
    )
    s = e.withColumn("u", u)
    cum = F.sum("u").over(
        W.partitionBy("user_id").orderBy("rn").rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        s.withColumn("cum", cum)
        .withColumn("ewma_micro", F.expr("cum DIV CAST(POWER(2, rn) AS BIGINT)"))
        .select("user_id", "event_id", "rn", "ewma_micro")
        .orderBy("user_id", "rn")
        .limit(3000)
    )


# --- 30-day rolling EXACT median (round 12) ----------------------------------

# the robust companion to window_rolling_corr_30d: an exact rolling
# median over a RANGE-interval frame. Spark's `percentile` and DuckDB's
# `quantile_cont` both linearly interpolate over the sorted frame, and
# over INTEGER cents the midpoint is exactly representable (x.0 or x.5)
# — probed value-identical before landing. The window runs over the
# O(days) daily collapse (bounded input, the unpartitioned-window
# posture documented in stats_ext).
_ROLL_MED_TEMPLATE = """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
)
SELECT day,
  CAST({MEDIAN} OVER (
    ORDER BY day RANGE BETWEEN INTERVAL {DAYS29} PRECEDING AND CURRENT ROW
  ) AS DOUBLE) / 100.0E0 AS rolling_median_rev
FROM d ORDER BY day
"""

sql_query(
    "window_rolling_median_30d",
    _ROLL_MED_TEMPLATE.replace("{MEDIAN}", "percentile(y, 0.5E0)").replace(
        "{DAYS29}", "29 DAYS"
    ),
    oracle=_ROLL_MED_TEMPLATE.replace("{MEDIAN}", "quantile_cont(y, 0.5)").replace(
        "{DAYS29}", "29 DAYS"
    ),
)
