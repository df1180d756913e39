"""Data-quality verification queries (quality/checks.py, quality/anomaly.py).

The reference has no quality layer; these register the Deequ-style
suite as first-class, oracle-backed operators. Every metric a
constraint verifies is an exact integer-count ratio (or min/max), so
the whole verification result — values AND pass/fail statuses —
hash-matches a plain-SQL oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries import query
from iceberg_metadata_pipeline_spark.session import load_tables


@query(
    "quality_verification_suite",
    """
WITH m AS (
  SELECT
    CAST(COUNT(*) AS DOUBLE) AS size_v,
    CAST(COUNT(o_orderpriority) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS completeness_v,
    CAST(COUNT(*) FILTER (WHERE o_totalprice > 0) AS DOUBLE)
      / CAST(COUNT(*) AS DOUBLE) AS compliance_v,
    CAST(COUNT(*) FILTER (WHERE o_orderstatus IN ('O','F','P')) AS DOUBLE)
      / CAST(COUNT(*) AS DOUBLE) AS membership_v,
    CAST(MIN(o_totalprice) AS DOUBLE) AS min_v,
    CAST(COUNT(*) FILTER (WHERE o_custkey IN (SELECT c_custkey FROM customer)) AS DOUBLE)
      / CAST(COUNT(*) AS DOUBLE) AS ref_v
  FROM orders
), u AS (
  SELECT
    CAST(COUNT(*) FILTER (WHERE n = 1) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS uniq_v,
    CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS dist_v
  FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY o_orderkey)
)
SELECT constraint_name, value,
  CASE WHEN ok THEN 'pass' ELSE 'fail' END AS status
FROM (
  SELECT 'size' AS constraint_name, size_v AS value, size_v > 0 AS ok FROM m
  UNION ALL
  SELECT 'completeness(o_orderpriority)', completeness_v, completeness_v = 1.0 FROM m
  UNION ALL
  SELECT 'compliance(positive total price)', compliance_v, compliance_v = 1.0 FROM m
  UNION ALL
  SELECT 'membership(o_orderstatus)', membership_v, membership_v = 1.0 FROM m
  UNION ALL
  SELECT 'min(o_totalprice)', min_v, min_v > 0.0 FROM m
  UNION ALL
  SELECT 'ref_integrity(o_custkey)', ref_v, ref_v = 1.0 FROM m
  UNION ALL
  SELECT 'uniqueness(o_orderkey)', uniq_v, uniq_v = 1.0 FROM u
  UNION ALL
  SELECT 'distinctness(o_orderkey)', dist_v, dist_v = 1.0 FROM u
)
ORDER BY constraint_name
""",
)
def quality_verification_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-model verification over orders: eight constraints —
    size, completeness, predicate compliance, value membership, min
    bound, FK referential integrity against customer, uniqueness +
    distinctness of the key — where all ROW-LEVEL metrics fuse into
    ONE aggregate scan, uniqueness/distinctness share one
    hash-aggregate on the key, and referential integrity is one
    broadcast semi-join (quality/checks.py). The oracle recomputes
    every metric AND the pass/fail verdicts in plain SQL; hash-match
    proves both the metric math and the assertion evaluation."""
    from iceberg_metadata_pipeline_spark.quality import Check, VerificationSuite

    t = load_tables(spark, sf_dir)
    orders, customer = t["orders"], t["customer"]
    check = (
        Check("orders")
        .has_size(lambda v: v > 0)
        .is_complete("o_orderpriority")
        .satisfies("o_totalprice > 0", "positive total price")
        .is_contained_in("o_orderstatus", ["O", "F", "P"])
        .has_min("o_totalprice", lambda v: v > 0.0)
        .is_referentially_valid("o_custkey", customer, "c_custkey")
        .is_unique("o_orderkey")
        .has_distinctness(["o_orderkey"], lambda v: v == 1.0)
    )
    return (
        VerificationSuite(orders)
        .run_as_dataframe(spark, [check])
        .select(F.col("constraint").alias("constraint_name"), "value", "status")
        .orderBy("constraint_name")
    )


@query(
    "quality_anomaly_rate_of_change",
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY CAST(ts AS DATE)
), flagged AS (
  SELECT day, n,
    LAG(n) OVER (ORDER BY day) AS prev_value,
    ABS(CAST(n AS DOUBLE) / CAST(LAG(n) OVER (ORDER BY day) AS DOUBLE) - 1.0)
      AS change_rate
  FROM daily
)
SELECT day, n, prev_value, change_rate
FROM flagged
WHERE change_rate > 0.08
ORDER BY day
""",
)
def quality_anomaly_rate_of_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-history anomaly detection (quality/anomaly.py): the daily
    event count is the monitored metric; days moving more than 8% vs
    the previous day flag as anomalies via a lag window — one
    aggregate + one window, no driver-side history materialization.
    This is the 'feed shrank overnight' guard a 100 TB ingest runs
    before promoting a day's partition."""
    from iceberg_metadata_pipeline_spark.quality.anomaly import (
        rate_of_change_anomalies,
    )

    events = load_tables(spark, sf_dir)["events"]
    daily = events.groupBy(
        F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        rate_of_change_anomalies(
            daily, "day", "n", max_rate=0.08, bounded_input=True
        )
        .select("day", "n", "prev_value", "change_rate")
        .orderBy("day")
    )


@query(
    "quality_mad_outliers",
    """
WITH prices AS (
  SELECT o_orderpriority AS pri, CAST(o_totalprice AS DOUBLE) AS v FROM orders
), med AS (
  SELECT pri, PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY v) AS med FROM prices
  GROUP BY pri
), dev AS (
  SELECT p.pri, p.v, m.med, ABS(p.v - m.med) AS adev
  FROM prices p JOIN med m ON p.pri = m.pri
), mad AS (
  SELECT pri, PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY adev) AS mad FROM dev
  GROUP BY pri
)
SELECT d.pri, COUNT(*) AS n, MIN(d.med) AS med, MIN(m.mad) AS mad,
       CAST(SUM(CASE WHEN d.adev > 3.0E0 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad m ON d.pri = m.pri
GROUP BY d.pri
ORDER BY d.pri
""",
)
def quality_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: per
    order-priority group, flag prices beyond 3×MAD of the median.
    PERCENTILE_DISC (not _CONT) on both engines so the medians are
    actual data values — no interpolation formula to diverge by an ulp;
    the deviation/threshold arithmetic is then single correctly-rounded
    double ops. Plan shape: two grouped sorts over co-partitioned keys
    plus one broadcast-back join per level — group cardinality (5) is
    trivially broadcastable at any scale."""
    from pyspark.sql import functions as F

    from iceberg_metadata_pipeline_spark.session import load_tables

    orders = load_tables(spark, sf_dir)["orders"]
    prices = orders.selectExpr(
        "o_orderpriority AS pri", "CAST(o_totalprice AS DOUBLE) AS v"
    )
    med = prices.groupBy("pri").agg(
        F.expr("PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY v)").alias("med")
    )
    dev = prices.join(F.broadcast(med), "pri").withColumn(
        "adev", F.abs(F.col("v") - F.col("med"))
    )
    mad = dev.groupBy("pri").agg(
        F.expr("PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "pri")
        .groupBy("pri")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                F.expr("CASE WHEN adev > 3.0E0 * mad THEN 1 ELSE 0 END")
            ).cast("long").alias("n_outliers"),
        )
        .orderBy("pri")
    )


# Population Stability Index — THE drift monitor between a baseline and
# a current period: PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) over a fixed
# bin grid. One conditional hash aggregate builds both periods' bin
# counts in one pass (exact integers); the ≤10 per-bin terms are
# identical double expressions folded in SORTED order; ln() drifts 1 ulp
# across libms so the result ROUNDs to 9 decimals (error ~1e-15).
# Declared smoothing rule: bins empty in EITHER period are skipped (the
# reported n_bins_used makes the rule visible). 100 TB: one
# map-combinable pass, O(bins) math.
_PSI_TEMPLATE = """
WITH b AS (
  SELECT CASE WHEN CAST(o_orderdate AS DATE) < DATE '1998-01-01'
              THEN 0 ELSE 1 END AS per,
         CAST(LEAST(GREATEST(FLOOR(o_totalprice / 60000.0E0), 0), 9) AS BIGINT)
           AS bin
  FROM orders
), cells AS (
  SELECT bin,
         CAST(SUM(CASE WHEN per = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN per = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM b GROUP BY bin
), tot AS (
  SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1
  FROM cells
), terms AS (
  SELECT (CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
         * LN((CAST(c0 AS DOUBLE) / n0) / (CAST(c1 AS DOUBLE) / n1)) AS term
  FROM cells CROSS JOIN tot
  WHERE c0 > 0 AND c1 > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bins_used,
       ROUND({FOLD}, 9) AS psi
FROM terms
"""

from iceberg_metadata_pipeline_spark.queries import sql_query  # noqa: E402

sql_query(
    "quality_psi_drift",
    _PSI_TEMPLATE.replace(
        "{FOLD}",
        "reduce(array_sort(collect_list(term)),"
        " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
    ),
    oracle=_PSI_TEMPLATE.replace(
        "{FOLD}", "list_reduce(list_sort(list(term)), (a, x) -> a + x)"
    ),
)
