"""Distributed statistics, round 7: Welch t-test, one-way ANOVA,
Mann-Whitney U, Spearman rank correlation, lag-1 autocorrelation.

Design rules (shared with mining.py's chi-square/KS/OLS):

- Heavy work happens in ONE hash aggregate per input pass: per-group
  moments (n, Σx, Σx²) in exact decimal arithmetic, converted to double
  once. Scalar formulas downstream are written as the SAME textual
  expression in Spark and the DuckDB oracle, so IEEE evaluation is
  bit-identical.
- Rank statistics never sort globally: ranks only change at distinct
  values, so a hash aggregate per distinct value + the bucketed
  two-phase prefix sum (1024 width_bucket ranges, windows PARTITIONED
  BY bucket — the stat_ks_two_sample shape) produces exact midranks
  with no single-task window. The DuckDB oracle may use the plain
  global window — it is the single-node referee, not the scale plan.
- Unordered SUMs stay in integers/decimals (exact, order-free); the few
  constant-size double reductions (5 ANOVA groups, ~2.4k daily lag
  pairs) fold in SORTED order via reduce(array_sort(collect_list())) /
  list_reduce(list_sort(list())) so addition order matches bit-for-bit.

Reference parity: the reference ships no statistics operators; this is
SURVEY.md §2.H build-out on the fixture tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries import query, sql_query
from iceberg_metadata_pipeline_spark.session import load_tables

def _d2d(expr: str) -> str:
    """Exact-decimal → double conversion that is bit-identical across
    engines (the ml_ols_normal_equations pattern): DuckDB converts its
    int128-scaled decimal to double via (double)int / 10^scale — TWO
    roundings — while Spark's BigDecimal→double is correctly rounded
    once, so a direct CAST can differ in the last ulp. Splitting into
    FLOOR (exact integer → exact double) + fraction (< 1, exact at the
    decimal's scale) and adding makes both engines perform the same
    single rounding."""
    return (
        f"(CAST(CAST(FLOOR({expr}) AS BIGINT) AS DOUBLE)"
        f" + CAST({expr} - FLOOR({expr}) AS DOUBLE))"
    )


# Shared two-group source: BUILDING vs MACHINERY order prices (the KS
# fixture), g = 1 for BUILDING.
_TWO_GROUP_SQL = """
  SELECT CAST(o.o_totalprice AS DOUBLE) AS v,
         CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
"""


def _two_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .selectExpr(
            "CAST(o_totalprice AS DOUBLE) AS v",
            "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g",
        )
    )


# --- Welch's t-test ---------------------------------------------------------

_WELCH_FORMULA = """
  CAST(n1 AS BIGINT) AS n1,
  CAST(n2 AS BIGINT) AS n2,
  (s1 / n1 - s2 / n2)
    / SQRT( ((q1 - s1 * s1 / n1) / (n1 - 1)) / n1
          + ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2 ) AS t_stat,
  POWER( ((q1 - s1 * s1 / n1) / (n1 - 1)) / n1
       + ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2, 2 )
    / ( POWER(((q1 - s1 * s1 / n1) / (n1 - 1)) / n1, 2) / (n1 - 1)
      + POWER(((q2 - s2 * s2 / n2) / (n2 - 1)) / n2, 2) / (n2 - 1) ) AS df
"""

_WELCH_MOMENTS = f"""
WITH s AS ({_TWO_GROUP_SQL}),
m AS (
  SELECT
    CAST(SUM(g) AS DOUBLE) AS n1,
    CAST(COUNT(*) - SUM(g) AS DOUBLE) AS n2,
    {_d2d("SUM(CASE WHEN g = 1 THEN CAST(v AS DECIMAL(38,12)) END)")} AS s1,
    {_d2d("SUM(CASE WHEN g = 0 THEN CAST(v AS DECIMAL(38,12)) END)")} AS s2,
    {_d2d("SUM(CASE WHEN g = 1 THEN CAST(v * v AS DECIMAL(38,12)) END)")} AS q1,
    {_d2d("SUM(CASE WHEN g = 0 THEN CAST(v * v AS DECIMAL(38,12)) END)")} AS q2
  FROM s
)
"""


@query(
    "stat_welch_ttest",
    _WELCH_MOMENTS + f"SELECT {_WELCH_FORMULA} FROM m",
)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two segments' order
    prices, with the Welch–Satterthwaite degrees of freedom. ONE hash
    aggregate computes both groups' moments via conditional exact-
    decimal sums (v has ≤2 fractional digits, v² ≤4, so DECIMAL(38,6)
    never rounds); the t statistic and df are a fixed scalar formula
    over six doubles, written as the identical expression text in both
    engines → bit-identical. At 100 TB this is one map-side-combinable
    aggregate and constant driver math."""
    load_tables(spark, sf_dir)
    return spark.sql(_WELCH_MOMENTS + f"SELECT {_WELCH_FORMULA} FROM m")


# --- one-way ANOVA -----------------------------------------------------------

_ANOVA_GROUPS = f"""
WITH s AS (
  SELECT c.c_mktsegment AS seg, CAST(o.o_totalprice AS DOUBLE) AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), grp AS (
  SELECT seg,
    CAST(COUNT(*) AS BIGINT) AS n_g,
    {_d2d("SUM(CAST(v AS DECIMAL(38,12)))")} AS s_g,
    SUM(CAST(v * v AS DECIMAL(38,12))) AS q_dec
  FROM s GROUP BY seg
), m AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS k,
    CAST(SUM(n_g) AS BIGINT) AS n,
    {{SFOLD}} AS s_tot,
    {_d2d("SUM(q_dec)")} AS q_tot,
    {{FOLD}} AS ss_groups
  FROM grp
)
SELECT k, n,
  ( (ss_groups - s_tot * s_tot / n) / (k - 1) )
  / ( (q_tot - ss_groups) / (n - k) ) AS f_stat
FROM m
"""

# per-group s_g is already a double (split-converted), so both Σ s_g and
# Σ s_g²/n_g are 5-element double sums → sorted folds
_ANOVA_FOLD_TERM = "s_g * s_g / CAST(n_g AS DOUBLE)"


@query(
    "stat_anova_f_oneway",
    _ANOVA_GROUPS.replace(
        "{FOLD}",
        f"list_reduce(list_sort(list({_ANOVA_FOLD_TERM})), (a, x) -> a + x)",
    ).replace(
        "{SFOLD}",
        "list_reduce(list_sort(list(s_g)), (a, x) -> a + x)",
    ),
)
def stat_anova_f_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic of order price across the five market
    segments. Per-group moments are exact decimal sums (order-free);
    the only unordered-double hazard — Σ S_g²/n_g over the k=5 groups —
    folds in SORTED order (the chi-square pattern) so the addition
    order matches the oracle bit-for-bit. F = (SSB/(k−1))/(SSW/(N−k))
    from the standard moment identities; everything after the single
    hash aggregate is constant work."""
    load_tables(spark, sf_dir)
    return spark.sql(
        _ANOVA_GROUPS.replace(
            "{FOLD}",
            f"reduce(array_sort(collect_list({_ANOVA_FOLD_TERM})),"
            " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
        ).replace(
            "{SFOLD}",
            "reduce(array_sort(collect_list(s_g)),"
            " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
        )
    )


# --- Mann-Whitney U ----------------------------------------------------------

_MW_FINAL = """
  CAST((r1x2 - n1 * (n1 + 1)) AS DOUBLE) / 2.0E0 AS u1,
  ( CAST((r1x2 - n1 * (n1 + 1)) AS DOUBLE) / 2.0E0
    - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0E0 )
  / SQRT( CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0E0
        * ( CAST(n1 + n2 + 1 AS DOUBLE)
          - CAST(ties AS DOUBLE)
            / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)) ) ) AS z
"""


@query(
    "stat_mann_whitney_u",
    f"""
WITH s AS ({_TWO_GROUP_SQL}),
pv AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS n_v, CAST(SUM(g) AS BIGINT) AS g1
  FROM s GROUP BY v
), c AS (
  SELECT n_v, g1,
    COALESCE(SUM(n_v) OVER (
      ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS cb
  FROM pv
), agg AS (
  SELECT
    CAST(SUM(g1 * (2 * cb + n_v + 1)) AS BIGINT) AS r1x2,
    CAST(SUM(n_v * n_v * n_v - n_v) AS BIGINT) AS ties
  FROM c
), tot AS (
  SELECT CAST(SUM(g) AS BIGINT) AS n1,
         CAST(COUNT(*) - SUM(g) AS BIGINT) AS n2
  FROM s
)
SELECT {_MW_FINAL}
FROM agg CROSS JOIN tot
""",
)
def stat_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) with midrank tie handling and
    the tie-corrected normal approximation z. Ranks never materialize
    per row: midrank·2 = 2·(count below) + n_v + 1 is an INTEGER per
    distinct value, so R1 accumulates as an exact bigint — no double
    order sensitivity anywhere until the final scalar formula (same
    text both engines). The cumulative 'count below' uses the bucketed
    two-phase prefix (1024 width_bucket ranges, windows partitioned by
    bucket — stat_ks_two_sample's scale shape): no task ever sorts more
    than one bucket of distinct values."""
    from pyspark.sql import Window

    s = _two_group(spark, sf_dir)
    # NOT cached (optimization r12, measured): the shared subtree here
    # is a bare scan+join with only 3 consumers; a cache of the collapse
    # serialized subtrees that previously overlapped inside one job and
    # cost ~0.5 s net at sf0.1 (contrast stat_kruskal_wallis, 9
    # consumers, where the same cache wins 2×).
    tot = s.agg(
        F.sum("g").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("g")).cast("long").alias("n2"),
    )
    pv = s.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("n_v"),
        F.sum("g").cast("long").alias("g1"),
    )
    bounds = s.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    b = pv.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket", F.expr("width_bucket(v, vmin, vmax + 1.0d, 1024)")
    )
    w_bkt = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        b.groupBy("bucket")
        .agg(F.sum("n_v").alias("bn"))
        .select(
            "bucket",
            F.coalesce(F.sum("bn").over(w_bkt), F.lit(0)).alias("off"),
        )
    )
    w_in = Window.partitionBy("bucket").orderBy("v")
    ranked = b.join(F.broadcast(offs), "bucket").select(
        "n_v", "g1",
        (F.col("off") + F.sum("n_v").over(w_in) - F.col("n_v")).alias("cb"),
    )
    agg = ranked.agg(
        F.sum(F.expr("g1 * (2 * cb + n_v + 1)")).cast("long").alias("r1x2"),
        F.sum(F.expr("n_v * n_v * n_v - n_v")).cast("long").alias("ties"),
    )
    return agg.crossJoin(F.broadcast(tot)).selectExpr(
        *[e.strip() for e in _MW_FINAL.split(",\n")]
    )


# --- Spearman rank correlation ----------------------------------------------

_SPEARMAN_FINAL = """
  CAST(n AS BIGINT) AS n,
  ( CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) )
  / ( SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
    * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) ) AS rho
"""


@query(
    "stat_spearman_corr",
    f"""
WITH li AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x, CAST(l_extendedprice AS DOUBLE) AS y
  FROM lineitem
), rx AS (
  SELECT x, 2 * COALESCE(SUM(n_v) OVER (
           ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) + n_v + 1 AS rank2x
  FROM (SELECT x, CAST(COUNT(*) AS BIGINT) AS n_v FROM li GROUP BY x)
), ry AS (
  SELECT y, 2 * COALESCE(SUM(n_v) OVER (
           ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) + n_v + 1 AS rank2y
  FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS n_v FROM li GROUP BY y)
), paired AS (
  SELECT rank2x, rank2y
  FROM li JOIN rx USING (x) JOIN ry USING (y)
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(rank2x AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sx,
    CAST(SUM(CAST(rank2y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sy,
    CAST(SUM(CAST(rank2x AS DECIMAL(19,0)) * CAST(rank2x AS DECIMAL(19,0)))
         AS DECIMAL(38,0)) AS sxx,
    CAST(SUM(CAST(rank2y AS DECIMAL(19,0)) * CAST(rank2y AS DECIMAL(19,0)))
         AS DECIMAL(38,0)) AS syy,
    CAST(SUM(CAST(rank2x AS DECIMAL(19,0)) * CAST(rank2y AS DECIMAL(19,0)))
         AS DECIMAL(38,0)) AS sxy
  FROM paired
)
SELECT {_SPEARMAN_FINAL}
FROM m
""",
)
def stat_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between lineitem quantity and extended
    price: Pearson over MIDRANKS with exact tie handling. Doubled
    midranks are integers per distinct value (the Mann-Whitney trick),
    so every moment accumulates in exact DECIMAL(38,0) — the doubling
    cancels in the correlation. Scale shape: two distinct-value hash
    aggregates + bucketed prefix sums build the rank maps; the quantity
    map (50 ranks) broadcasts, the price map joins on the value (one
    shuffle); one moments aggregate ends the plan. The oracle uses the
    plain single-node window — same midranks, exact same moments."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].selectExpr(
        "CAST(l_quantity AS DOUBLE) AS x", "CAST(l_extendedprice AS DOUBLE) AS y"
    )

    def rank_map(col: str):
        pv = li.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("n_v"))
        bounds = li.agg(
            F.min(col).alias("vmin"), F.max(col).alias("vmax")
        )
        b = pv.crossJoin(F.broadcast(bounds)).withColumn(
            "bucket", F.expr(f"width_bucket({col}, vmin, vmax + 1.0d, 1024)")
        )
        w_bkt = Window.orderBy("bucket").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offs = (
            b.groupBy("bucket")
            .agg(F.sum("n_v").alias("bn"))
            .select(
                "bucket",
                F.coalesce(F.sum("bn").over(w_bkt), F.lit(0)).alias("off"),
            )
        )
        w_in = Window.partitionBy("bucket").orderBy(col)
        return b.join(F.broadcast(offs), "bucket").select(
            col,
            (
                2 * (F.col("off") + F.sum("n_v").over(w_in) - F.col("n_v"))
                + F.col("n_v")
                + 1
            ).alias(f"rank2{col}"),
        )

    paired = li.join(F.broadcast(rank_map("x")), "x").join(rank_map("y"), "y")
    m = paired.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("CAST(rank2x AS DECIMAL(19,0))")).cast("decimal(38,0)").alias("sx"),
        F.sum(F.expr("CAST(rank2y AS DECIMAL(19,0))")).cast("decimal(38,0)").alias("sy"),
        F.sum(
            F.expr("CAST(rank2x AS DECIMAL(19,0)) * CAST(rank2x AS DECIMAL(19,0))")
        ).cast("decimal(38,0)").alias("sxx"),
        F.sum(
            F.expr("CAST(rank2y AS DECIMAL(19,0)) * CAST(rank2y AS DECIMAL(19,0))")
        ).cast("decimal(38,0)").alias("syy"),
        F.sum(
            F.expr("CAST(rank2x AS DECIMAL(19,0)) * CAST(rank2y AS DECIMAL(19,0))")
        ).cast("decimal(38,0)").alias("sxy"),
    )
    return m.selectExpr(*[e.strip() for e in _SPEARMAN_FINAL.split(",\n")])


# --- lag-1 autocorrelation ---------------------------------------------------

_ACF_SERIES = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    {_d2d("SUM(CAST(o_totalprice AS DECIMAL(38,12)))")} AS rev
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
), lagged AS (
  SELECT rev AS y, LAG(rev) OVER (ORDER BY d) AS x FROM daily
), pairs AS (
  SELECT x, y FROM lagged WHERE x IS NOT NULL
)
"""

_ACF_FINAL = """
  CAST(n AS BIGINT) AS n,
  (n * sxy - sx * sy)
  / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS r1
"""


@query(
    "stat_autocorr_lag1",
    _ACF_SERIES
    + """
, m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
    list_reduce(list_sort(list(x)), (a, v) -> a + v) AS sx,
    list_reduce(list_sort(list(y)), (a, v) -> a + v) AS sy,
    list_reduce(list_sort(list(x * x)), (a, v) -> a + v) AS sxx,
    list_reduce(list_sort(list(y * y)), (a, v) -> a + v) AS syy,
    list_reduce(list_sort(list(x * y)), (a, v) -> a + v) AS sxy
  FROM pairs
)
SELECT
"""
    + _ACF_FINAL
    + "FROM m",
)
def stat_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily order-revenue series: Pearson
    over ~2.4k (rev_t, rev_{t−1}) pairs. The raw pass is one hash
    aggregate per day (exact decimal revenue → one double); the LAG and
    the five moment sums run over the tiny per-day AGGREGATE (the
    accepted post-aggregation shape — constant cardinality in the data
    size), and every double sum folds in SORTED order so addition order
    is bit-identical cross-engine. Detects week/seasonality structure
    in one pass + constant work."""
    load_tables(spark, sf_dir)
    fold = (
        lambda e: f"reduce(array_sort(collect_list({e})),"
        " CAST(0.0E0 AS DOUBLE), (a, v) -> a + v)"
    )
    return spark.sql(
        _ACF_SERIES
        + f"""
, m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
    {fold('x')} AS sx,
    {fold('y')} AS sy,
    {fold('x * x')} AS sxx,
    {fold('y * y')} AS syy,
    {fold('x * y')} AS sxy
  FROM pairs
)
SELECT
"""
        + _ACF_FINAL
        + "FROM m"
    )


# --- CUSUM changepoint -------------------------------------------------------

_CUSUM_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0)))
         AS BIGINT) AS cents
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS total
  FROM daily
), walk AS (
  SELECT d,
    CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS k,
    CAST(SUM(cents) OVER (ORDER BY d) AS BIGINT) AS run
  FROM daily
)
SELECT w.d AS day,
  CAST(t.n * w.run - w.k * t.total AS BIGINT) AS cusum_scaled
FROM walk w CROSS JOIN tot t
ORDER BY ABS(CAST(t.n * w.run - w.k * t.total AS BIGINT)) DESC, w.d
LIMIT 5
"""


@query("stat_cusum_changepoint", _CUSUM_SQL)
def stat_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over the daily revenue series — the five
    days where the cumulative deviation from the global mean peaks
    (Page's statistic argmax = the most likely level-shift points).
    EXACT integer arithmetic throughout: revenue in cents (decimal-
    scaled, never a double), and the mean-free cumulative sum is
    rationalized as N·(Σ_{i≤k} x_i) − k·total, avoiding any division —
    no float enters until nothing is left to compute, so rows are
    bit-trivially comparable. The raw pass is one per-day hash
    aggregate; the running sum windows over the ~2.4k-row per-day
    AGGREGATE (constant cardinality in data size — the accepted
    post-aggregation shape)."""
    load_tables(spark, sf_dir)
    return spark.sql(_CUSUM_SQL)


# --- Benford first-digit test -------------------------------------------------

_BENFORD_OBS = """
WITH s AS (
  SELECT CAST(SUBSTRING(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING), 1, 1)
              AS BIGINT) AS d
  FROM orders WHERE o_totalprice > 0
), obs AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS n_d FROM s GROUP BY d
), tot AS (SELECT CAST(SUM(n_d) AS BIGINT) AS n FROM obs),
terms AS (
  SELECT
    (CAST(o.n_d AS DOUBLE) - CAST(t.n AS DOUBLE) * LOG10(1.0E0 + 1.0E0 / d))
    * (CAST(o.n_d AS DOUBLE) - CAST(t.n AS DOUBLE) * LOG10(1.0E0 + 1.0E0 / d))
    / (CAST(t.n AS DOUBLE) * LOG10(1.0E0 + 1.0E0 / d)) AS term
  FROM obs o CROSS JOIN tot t
)
SELECT (SELECT n FROM tot) AS n,
       {FOLD} AS chi2_benford
FROM terms
"""


@query(
    "stat_benford_first_digit",
    _BENFORD_OBS.replace(
        "{FOLD}", "list_reduce(list_sort(list(term)), (a, x) -> a + x)"
    ),
)
def stat_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order prices: χ² between the
    observed leading-digit distribution and log10(1+1/d). The leading
    digit comes from the DECIMAL(18,2) string render — identical in
    both engines — never from floor(log10(v)), whose 1-ulp libm
    wobble at exact powers of ten would flip digits. Nine χ² terms are
    identical doubles (integer counts, same LOG10 argument) folded in
    sorted order. One hash aggregate over the scan; the classic
    fabricated-data / ETL-corruption smoke alarm at any scale."""
    load_tables(spark, sf_dir)
    return spark.sql(
        _BENFORD_OBS.replace(
            "{FOLD}",
            "reduce(array_sort(collect_list(term)),"
            " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
        )
    )


# --- Gini coefficient ----------------------------------------------------------


@query(
    "stat_gini_customer_spend",
    """
WITH spend AS (
  SELECT o_custkey,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0)))
         AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
), pv AS (
  SELECT cents AS x, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM spend GROUP BY cents
), c AS (
  SELECT x, cnt,
    COALESCE(SUM(cnt) OVER (
      ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS cb
  FROM pv
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * cnt) AS DECIMAL(38,0)) AS total
  FROM pv
), s AS (
  SELECT CAST(SUM(
    CAST(x AS DECIMAL(38,0))
    * (2 * (cnt * cb + cnt * (cnt + 1) / 2) - cnt * (t.n + 1))
  ) AS DECIMAL(38,0)) AS rank_weighted
  FROM c CROSS JOIN tot t
)
SELECT t.n,
  CAST(s.rank_weighted AS DOUBLE)
    / (CAST(t.n AS DOUBLE) * CAST(t.total AS DOUBLE)) AS gini
FROM s CROSS JOIN tot t
""",
)
def stat_gini_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer spend — EXACT integer
    arithmetic end to end: spend in cents, and the sorted-order
    rank-weighted sum Σ(2i−n−1)·x_(i) collapses per DISTINCT value
    (within a tie run the x is constant, so Σ(2i) over the run is
    2·cnt·cum_before + cnt(cnt+1), closed-form) — no per-row rank ever
    materializes. The Spark plan uses the bucketed two-phase prefix for
    cum_before (windows partitioned by bucket); DECIMAL(38,0) sums keep
    every intermediate exact; one double division at the end. The
    standard concentration/skew audit for a revenue (or token-count)
    distribution."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    spend = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                    " AS DECIMAL(38,0))"
                )
            )
            .cast("long")
            .alias("cents")
        )
    )
    pv = spend.groupBy(F.col("cents").alias("x")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = pv.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * cnt"))
        .cast("decimal(38,0)")
        .alias("total"),
    )
    bounds = pv.agg(F.min("x").alias("vmin"), F.max("x").alias("vmax"))
    b = pv.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket",
        F.expr(
            "width_bucket(CAST(x AS DOUBLE), CAST(vmin AS DOUBLE),"
            " CAST(vmax AS DOUBLE) + 1.0d, 1024)"
        ),
    )
    w_bkt = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        b.groupBy("bucket")
        .agg(F.sum("cnt").alias("bn"))
        .select(
            "bucket",
            F.coalesce(F.sum("bn").over(w_bkt), F.lit(0)).alias("off"),
        )
    )
    w_in = Window.partitionBy("bucket").orderBy("x")
    ranked = b.join(F.broadcast(offs), "bucket").select(
        "x", "cnt",
        (F.col("off") + F.sum("cnt").over(w_in) - F.col("cnt")).alias("cb"),
    )
    s = ranked.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.expr(
                "CAST(x AS DECIMAL(38,0))"
                " * (2 * (cnt * cb + cnt * (cnt + 1) / 2) - cnt * (n + 1))"
            )
        )
        .cast("decimal(38,0)")
        .alias("rank_weighted")
    )
    return s.crossJoin(F.broadcast(tot)).selectExpr(
        "n",
        "CAST(rank_weighted AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)) AS gini",
    )


# ---------------------------------------------------------------------------
# round 8: Kendall tau-b, Theil-Sen slope
# ---------------------------------------------------------------------------

# tau-b denominator and final division written once, textually identical
# in Spark and the oracle (IEEE ops over the same exact-integer inputs)
_KENDALL_FINAL = """
  CAST(n AS BIGINT) AS n,
  CAST(c AS BIGINT) AS concordant,
  CAST(d AS BIGINT) AS discordant,
  CAST(CAST(c AS DOUBLE) - CAST(d AS DOUBLE) AS DOUBLE)
    / SQRT( (CAST(n0 AS DOUBLE) - CAST(t1 AS DOUBLE))
          * (CAST(n0 AS DOUBLE) - CAST(t2 AS DOUBLE)) ) AS tau_b
"""


@query(
    "stat_kendall_tau_b",
    f"""
WITH li AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
  FROM lineitem
), cells AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cn FROM li GROUP BY x, y
), pairs AS (
  SELECT
    CAST(SUM(CASE WHEN b.y > a.y THEN CAST(a.cn AS DECIMAL(19,0)) * b.cn
                  ELSE 0 END) AS DECIMAL(38,0)) AS c,
    CAST(SUM(CASE WHEN b.y < a.y THEN CAST(a.cn AS DECIMAL(19,0)) * b.cn
                  ELSE 0 END) AS DECIMAL(38,0)) AS d
  FROM cells a JOIN cells b ON b.x > a.x
), marg AS (
  SELECT
    CAST(SUM(CAST(cn AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS n,
    CAST(SUM(CAST(cn AS DECIMAL(19,0)) * (cn - 1) / 2) AS DECIMAL(38,0)) AS tj
  FROM cells
), tx AS (
  SELECT CAST(SUM(CAST(nx AS DECIMAL(19,0)) * (nx - 1) / 2) AS DECIMAL(38,0)) AS t1
  FROM (SELECT CAST(SUM(cn) AS BIGINT) AS nx FROM cells GROUP BY x)
), ty AS (
  SELECT CAST(SUM(CAST(ny AS DECIMAL(19,0)) * (ny - 1) / 2) AS DECIMAL(38,0)) AS t2
  FROM (SELECT CAST(SUM(cn) AS BIGINT) AS ny FROM cells GROUP BY y)
), m AS (
  SELECT n, c, d, t1, t2, CAST(n * (n - 1) / 2 AS DECIMAL(38,0)) AS n0
  FROM pairs, marg, tx, ty
)
SELECT {_KENDALL_FINAL}
FROM m
""",
)
def stat_kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b (tie-corrected) between lineitem quantity and
    discount, EXACT: one O(rows) hash aggregate collapses the data to
    the joint distribution's cells (quantity has 50 distinct values,
    discount 11 → ≤550 cells), then concordant/discordant pair MASSES
    come from a cells×cells join — O(cells²) ≈ 300k combinations that
    never grows with row count, the correct 100 TB shape (a row-level
    pair join would be O(n²)). All pair counts accumulate in
    DECIMAL(38,0); the tau division is the only double op and is
    textually identical to the oracle's."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].selectExpr(
        "CAST(l_quantity AS BIGINT) AS x",
        "CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS y",
    )
    cells = li.groupBy("x", "y").agg(F.count(F.lit(1)).cast("long").alias("cn"))
    cells.cache()
    a, b = cells.alias("a"), cells.alias("b")
    pairs = (
        a.join(F.broadcast(b), F.col("b.x") > F.col("a.x"))
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN b.y > a.y THEN CAST(a.cn AS DECIMAL(19,0)) * b.cn "
                    "ELSE 0 END"
                )
            ).cast("decimal(38,0)").alias("c"),
            F.sum(
                F.expr(
                    "CASE WHEN b.y < a.y THEN CAST(a.cn AS DECIMAL(19,0)) * b.cn "
                    "ELSE 0 END"
                )
            ).cast("decimal(38,0)").alias("d"),
        )
    )
    marg = cells.agg(
        F.sum(F.expr("CAST(cn AS DECIMAL(19,0))")).cast("decimal(38,0)").alias("n")
    )
    tx = (
        cells.groupBy("x").agg(F.sum("cn").cast("long").alias("nx"))
        .agg(F.sum(F.expr("CAST(nx AS DECIMAL(19,0)) * (nx - 1) / 2"))
             .cast("decimal(38,0)").alias("t1"))
    )
    ty = (
        cells.groupBy("y").agg(F.sum("cn").cast("long").alias("ny"))
        .agg(F.sum(F.expr("CAST(ny AS DECIMAL(19,0)) * (ny - 1) / 2"))
             .cast("decimal(38,0)").alias("t2"))
    )
    m = (
        pairs.crossJoin(F.broadcast(marg))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .withColumn("n0", F.expr("CAST(n * (n - 1) / 2 AS DECIMAL(38,0))"))
    )
    return m.selectExpr(*[s.strip() for s in _KENDALL_FINAL.split(",\n")])


@query(
    "stat_theil_sen_slope",
    """
WITH pts AS (
  SELECT CAST(p_size AS BIGINT) AS x,
    CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
      / CAST(COUNT(*) AS DOUBLE) AS y
  FROM part GROUP BY p_size
), slopes AS (
  SELECT (b.y - a.y) / (CAST(b.x AS DOUBLE) - CAST(a.x AS DOUBLE)) AS s
  FROM pts a JOIN pts b ON b.x > a.x
), ranked AS (
  SELECT s,
    ROW_NUMBER() OVER (ORDER BY s) AS r,
    COUNT(*) OVER () AS m
  FROM slopes
)
SELECT
  CAST(MIN(m) AS BIGINT) AS n_slopes,
  CAST(SUM(CASE WHEN 2 * r IN (m, m + 1, m + 2) THEN s ELSE 0 END)
    / SUM(CASE WHEN 2 * r IN (m, m + 1, m + 2) THEN 1 ELSE 0 END) AS DOUBLE)
    AS theil_sen_slope
FROM ranked
""",
)
def stat_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope of mean retail price vs part size: the
    median of all pairwise slopes. The O(rows) pass is one hash
    aggregate to ≤50 (size, mean-price) points; pairwise slopes are a
    bounded 50×50 self-join (1225 slopes) — constant work regardless of
    table size, the same collapse-then-pair shape as Kendall. The
    median is the mean of the middle one/two ranked slopes (exact
    row-number rule, no percentile interpolation ambiguity); means
    accumulate in DECIMAL(38,6) before the single double division."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    pts = (
        t["part"]
        .groupBy(F.col("p_size").cast("bigint").alias("x"))
        .agg(
            (
                F.sum(F.col("p_retailprice").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("y")
        )
    )
    a, b = pts.alias("a"), pts.alias("b")
    slopes = a.join(F.broadcast(b), F.col("b.x") > F.col("a.x")).select(
        (
            (F.col("b.y") - F.col("a.y"))
            / (F.col("b.x").cast("double") - F.col("a.x").cast("double"))
        ).alias("s")
    )
    w = Window.orderBy("s")  # ≤1225 rows: single-task window is the plan
    ranked = slopes.select(
        "s", F.row_number().over(w).alias("r"), F.count(F.lit(1)).over(
            Window.partitionBy()
        ).alias("m")
    )
    return ranked.agg(
        F.min("m").cast("long").alias("n_slopes"),
        (
            F.sum(F.expr("CASE WHEN 2 * r IN (m, m + 1, m + 2) THEN s ELSE 0 END"))
            / F.sum(F.expr("CASE WHEN 2 * r IN (m, m + 1, m + 2) THEN 1 ELSE 0 END"))
        ).cast("double").alias("theil_sen_slope"),
    )


# Kaplan-Meier: the survival product folds in ASCENDING factor order on
# both engines (array_sort / list_sort) so IEEE multiplication order is
# bit-identical; everything upstream is integer counting.
_KM_TEMPLATE = """
WITH pu AS (
  SELECT user_id, MIN(ts) AS t0, MAX(ts) AS t1 FROM events GROUP BY user_id
), hz AS (
  SELECT MAX(ts) AS h FROM events
), obs AS (
  SELECT {DATEDIFF} AS dur,
         CASE WHEN t1 < h - INTERVAL '7' DAY THEN 1 ELSE 0 END AS ev
  FROM pu CROSS JOIN hz
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM obs
), risk AS (
  SELECT dur AS t,
         CAST(SUM(ev) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS leaving
  FROM obs GROUP BY dur
), at_risk AS (
  SELECT t, d,
         n - COALESCE(SUM(leaving) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS n_risk
  FROM risk CROSS JOIN tot
), fact AS (
  SELECT t, d, n_risk,
         1.0E0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f
  FROM at_risk
)
SELECT a.t AS t_days, CAST(a.d AS BIGINT) AS events,
       CAST(a.n_risk AS BIGINT) AS at_risk,
       {FOLD} AS survival
FROM fact a JOIN fact b ON b.t <= a.t
WHERE a.d > 0
GROUP BY a.t, a.d, a.n_risk
ORDER BY t_days
"""

# Distributed Kaplan-Meier estimator over per-user event spans: users
# whose last activity predates the 7-day horizon are churn EVENTS,
# still-active users are right-CENSORED at their span. One hash
# aggregate per user, one per distinct duration (risk table is O(days),
# not O(users)), a prefix sum for the at-risk counts, and the product-
# limit estimate as a sorted double fold per event time — all row-scale
# work is counting; only the final 1 - d/n and the product are doubles,
# evaluated in identical order on both engines. The t×t factor join is
# bounded by distinct DAYS (≤ observation window), constant in table
# size — the collapse-then-pair shape again.
sql_query(
    "stat_kaplan_meier_churn",
    _KM_TEMPLATE.format(
        DATEDIFF="datediff(CAST(t1 AS DATE), CAST(t0 AS DATE))",
        FOLD="reduce(array_sort(collect_list(b.f)), CAST(1.0 AS DOUBLE),"
             " (acc, x) -> acc * x)",
    ),
    oracle=_KM_TEMPLATE.format(
        DATEDIFF="datediff('day', CAST(t0 AS DATE), CAST(t1 AS DATE))",
        FOLD="list_reduce(list_sort(list(b.f)), (acc, x) -> acc * x)",
    ),
)


# Nelson-Aalen: the cumulative-hazard companion to Kaplan-Meier — the
# same risk table (one hash agg per user, one per distinct day, prefix
# sum for at-risk counts), but H(t) = Σ_{t_i ≤ t} d_i/n_i folds as a
# sorted double SUM instead of a product. Work is O(distinct days) after
# the per-user collapse — constant in table size.
_NA_TEMPLATE = """
WITH pu AS (
  SELECT user_id, MIN(ts) AS t0, MAX(ts) AS t1 FROM events GROUP BY user_id
), hz AS (
  SELECT MAX(ts) AS h FROM events
), obs AS (
  SELECT {DATEDIFF} AS dur,
         CASE WHEN t1 < h - INTERVAL '7' DAY THEN 1 ELSE 0 END AS ev
  FROM pu CROSS JOIN hz
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM obs
), risk AS (
  SELECT dur AS t,
         CAST(SUM(ev) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS leaving
  FROM obs GROUP BY dur
), at_risk AS (
  SELECT t, d,
         n - COALESCE(SUM(leaving) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS n_risk
  FROM risk CROSS JOIN tot
), fact AS (
  SELECT t, d, n_risk,
         CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f
  FROM at_risk
)
SELECT a.t AS t_days, CAST(a.d AS BIGINT) AS events,
       CAST(a.n_risk AS BIGINT) AS at_risk,
       {FOLD} AS cum_hazard
FROM fact a JOIN fact b ON b.t <= a.t
WHERE a.d > 0
GROUP BY a.t, a.d, a.n_risk
ORDER BY t_days
"""

sql_query(
    "stat_nelson_aalen_hazard",
    _NA_TEMPLATE.format(
        DATEDIFF="datediff(CAST(t1 AS DATE), CAST(t0 AS DATE))",
        FOLD="reduce(array_sort(collect_list(b.f)), CAST(0.0E0 AS DOUBLE),"
             " (acc, x) -> acc + x)",
    ),
    oracle=_NA_TEMPLATE.format(
        DATEDIFF="datediff('day', CAST(t0 AS DATE), CAST(t1 AS DATE))",
        FOLD="list_reduce(list_sort(list(b.f)), (acc, x) -> acc + x)",
    ),
)


# Exact weighted median: collapse to (group, value) with integer weight
# sums, one prefix-sum window per group over DISTINCT VALUES (not rows),
# pick the smallest value whose doubled cumulative weight reaches the
# total — all integer arithmetic until the final cast, so the result is
# exact on both engines. At 100 TB the window runs over distinct
# (flag, price) pairs, orders of magnitude below row count.
sql_query(
    "agg_weighted_median",
    """
WITH pts AS (
  SELECT l_returnflag AS flag, l_extendedprice AS v,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
  FROM lineitem GROUP BY l_returnflag, l_extendedprice
), c AS (
  SELECT flag, v,
         SUM(wt) OVER (PARTITION BY flag ORDER BY v) AS cw,
         SUM(wt) OVER (PARTITION BY flag) AS tot
  FROM pts
)
SELECT flag, CAST(MIN(v) AS DOUBLE) AS weighted_median,
       CAST(MIN(tot) AS BIGINT) AS total_weight
FROM c WHERE 2 * cw >= tot GROUP BY flag ORDER BY flag
""",
)


# ---------------------------------------------------------------------------
# round 9: Jarque-Bera, Brown-Forsythe, multi-lag ACF
# ---------------------------------------------------------------------------

# Jarque-Bera normality test over lineitem quantity, EXACT until the
# final constant-size formula: quantity is a small integer, so the data
# collapses to ≤50 (value, count) cells in one hash aggregate and the
# four raw moments Σ cnt·v^k are exact integer sums (v⁴ ≤ 6.25e6, the
# DECIMAL(38,0) accumulators never round). Central moments, skewness,
# excess kurtosis and JB = n/6·(S² + K²/4) are one fixed double
# expression written with the IDENTICAL text in both engines; the ^1.5
# is spelled m2c·SQRT(m2c) because SQRT is IEEE-exact while POWER(x,1.5)
# may differ by 1 ulp across libms. 100 TB shape: one map-side-
# combinable aggregate, then O(1) math.
_JB_SQL = """
WITH cells AS (
  SELECT CAST(l_quantity AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY CAST(l_quantity AS BIGINT)
), raw AS (
  SELECT
    CAST(SUM(cnt) AS BIGINT) AS n_i,
    CAST(SUM(CAST(cnt AS DECIMAL(19,0)) * v) AS DECIMAL(38,0)) AS m1_i,
    CAST(SUM(CAST(cnt AS DECIMAL(19,0)) * (v * v)) AS DECIMAL(38,0)) AS m2_i,
    CAST(SUM(CAST(cnt AS DECIMAL(19,0)) * (v * v * v)) AS DECIMAL(38,0)) AS m3_i,
    CAST(SUM(CAST(cnt AS DECIMAL(19,0)) * (v * v * v * v)) AS DECIMAL(38,0)) AS m4_i
  FROM cells
), d AS (
  SELECT CAST(n_i AS DOUBLE) AS n,
         CAST(CAST(m1_i AS BIGINT) AS DOUBLE) AS m1,
         CAST(CAST(m2_i AS BIGINT) AS DOUBLE) AS m2,
         CAST(CAST(m3_i AS BIGINT) AS DOUBLE) AS m3,
         CAST(CAST(m4_i AS BIGINT) AS DOUBLE) AS m4
  FROM raw
), c AS (
  SELECT n,
    m1 / n AS mean,
    m2 / n - (m1 / n) * (m1 / n) AS v2,
    m3 / n - 3.0E0 * (m1 / n) * (m2 / n) + 2.0E0 * (m1 / n) * (m1 / n) * (m1 / n) AS v3,
    m4 / n - 4.0E0 * (m1 / n) * (m3 / n)
           + 6.0E0 * (m1 / n) * (m1 / n) * (m2 / n)
           - 3.0E0 * (m1 / n) * (m1 / n) * (m1 / n) * (m1 / n) AS v4
  FROM d
)
SELECT CAST(n AS BIGINT) AS n,
       v3 / (v2 * SQRT(v2)) AS skewness,
       v4 / (v2 * v2) - 3.0E0 AS excess_kurtosis,
       n / 6.0E0 * ( (v3 / (v2 * SQRT(v2))) * (v3 / (v2 * SQRT(v2)))
                   + (v4 / (v2 * v2) - 3.0E0) * (v4 / (v2 * v2) - 3.0E0) / 4.0E0 )
         AS jarque_bera
FROM c
"""

sql_query("stat_jarque_bera", _JB_SQL, oracle="same")


# Brown-Forsythe test (Levene with median centers) for equal variance of
# order price across the five market segments — the robust companion to
# stat_anova_f_oneway. Per-group medians are EXACT integers: price in
# cents collapses to distinct (segment, cents) cells, a per-segment
# prefix sum over DISTINCT VALUES picks the smallest value whose doubled
# cumulative weight reaches the total (the agg_weighted_median rule —
# no percentile interpolation ambiguity). Deviations are integer DOLLAR
# units (|cents − med| DIV 100) so Σz and Σz² stay exact BIGINT-range
# integers through sf10 (Σz² ≈ 5e17 at sf1 < 2⁶³); BIGINT→DOUBLE casts
# are correctly rounded in both engines. The F statistic over the k=5
# group moments folds the two unordered-double sums in SORTED order
# (the ANOVA pattern). Scale: two hash aggregates + one broadcast join
# of 5 medians; the distinct-cents window is orders of magnitude below
# row count.
_BF_TEMPLATE = """
WITH s AS (
  SELECT c.c_mktsegment AS seg,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), pv AS (
  SELECT seg, cents AS v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM s GROUP BY seg, cents
), cum AS (
  SELECT seg, v,
         SUM(cnt) OVER (PARTITION BY seg ORDER BY v) AS cw,
         SUM(cnt) OVER (PARTITION BY seg) AS tot
  FROM pv
), med AS (
  SELECT seg, MIN(v) AS med FROM cum WHERE 2 * cw >= tot GROUP BY seg
), z AS (
  SELECT s.seg, ABS(s.cents - m.med) {IDIV} 100 AS zi
  FROM s JOIN med m ON s.seg = m.seg
), grp AS (
  SELECT seg,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(CAST(SUM(CAST(zi AS DECIMAL(38,0))) AS BIGINT) AS DOUBLE) AS s_g,
         CAST(SUM(CAST(CAST(zi AS DECIMAL(19,0)) * zi AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS q_dec
  FROM z GROUP BY seg
), m AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS k,
    CAST(SUM(n_g) AS BIGINT) AS n,
    {SFOLD} AS s_tot,
    CAST(CAST(SUM(q_dec) AS BIGINT) AS DOUBLE) AS q_tot,
    {FOLD} AS ss_groups
  FROM grp
)
SELECT k, n,
  ( (ss_groups - s_tot * s_tot / n) / (k - 1) )
  / ( (q_tot - ss_groups) / (n - k) ) AS bf_stat
FROM m
"""

_BF_FOLD_TERM = "s_g * s_g / CAST(n_g AS DOUBLE)"

sql_query(
    "stat_brown_forsythe",
    _BF_TEMPLATE.replace("{IDIV}", "DIV")
    .replace(
        "{FOLD}",
        f"reduce(array_sort(collect_list({_BF_FOLD_TERM})),"
        " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
    )
    .replace(
        "{SFOLD}",
        "reduce(array_sort(collect_list(s_g)),"
        " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
    ),
    oracle=_BF_TEMPLATE.replace("{IDIV}", "//")
    .replace(
        "{FOLD}",
        f"list_reduce(list_sort(list({_BF_FOLD_TERM})), (a, x) -> a + x)",
    )
    .replace(
        "{SFOLD}",
        "list_reduce(list_sort(list(s_g)), (a, x) -> a + x)",
    ),
)


# Multi-lag autocorrelation function (lags 1–7) of the daily revenue
# series — the weekly-seasonality profile in one query (the lag-1
# operator generalized). The raw pass is the same one-hash-aggregate
# daily collapse; days become integer indexes k (exact date arithmetic
# against the global min), the 7 lags come from an inline VALUES table,
# and each lag's Pearson moments fold over ~2.4k pairs — a per-lag
# constant-cardinality reduction whose double sums fold in SORTED order
# (bit-identical cross-engine). A pair exists only where both endpoints
# exist — identical semantics in both engines. Scale: the only O(rows)
# term is the daily aggregate; everything after is O(days × lags).
_ACF_MULTI_TEMPLATE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    {REV} AS rev
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
), d0 AS (
  SELECT MIN(d) AS dmin FROM daily
), idx AS (
  SELECT {DATEDIFF} AS k, rev FROM daily CROSS JOIN d0
), lags AS (
  SELECT lag FROM (VALUES (1), (2), (3), (4), (5), (6), (7)) AS t(lag)
), pairs AS (
  SELECT l.lag AS lag, a.rev AS y, b.rev AS x
  FROM lags l CROSS JOIN idx a JOIN idx b ON b.k = a.k - l.lag
), m AS (
  SELECT lag, CAST(COUNT(*) AS DOUBLE) AS n,
    {FX} AS sx, {FY} AS sy, {FXX} AS sxx, {FYY} AS syy, {FXY} AS sxy
  FROM pairs GROUP BY lag
)
SELECT lag, CAST(n AS BIGINT) AS n_pairs,
  (n * sxy - sx * sy)
  / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS acf
FROM m
ORDER BY lag
"""


def _acf_multi(fold):
    return (
        _ACF_MULTI_TEMPLATE.replace("{FX}", fold("x"))
        .replace("{FY}", fold("y"))
        .replace("{FXX}", fold("x * x"))
        .replace("{FYY}", fold("y * y"))
        .replace("{FXY}", fold("x * y"))
    )


sql_query(
    "stat_acf_multi_lag",
    _acf_multi(
        lambda e: f"reduce(array_sort(collect_list({e})),"
        " CAST(0.0E0 AS DOUBLE), (a, v) -> a + v)"
    )
    .replace("{REV}", _d2d("SUM(CAST(o_totalprice AS DECIMAL(38,12)))"))
    .replace("{DATEDIFF}", "datediff(d, dmin)"),
    oracle=_acf_multi(
        lambda e: f"list_reduce(list_sort(list({e})), (a, v) -> a + v)"
    )
    .replace("{REV}", _d2d("SUM(CAST(o_totalprice AS DECIMAL(38,12)))"))
    .replace("{DATEDIFF}", "datediff('day', dmin, d)"),
)


# Wald–Wolfowitz runs test for randomness of the daily revenue series
# around its MEDIAN: too few runs = trend/regime persistence, too many =
# oscillation. EXACT until the final formula: revenue in integer cents,
# the median over days via the distinct-value prefix rule (the
# agg_weighted_median shape — no interpolation), signs and run breaks
# are integer comparisons with a LAG over the ~2.4k-row DAILY AGGREGATE
# (the accepted post-aggregation shape), and the z statistic is one
# fixed double expression with identical text in both engines. Ties
# with the median count as BELOW (documented rule, same in both).
_RUNS_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0)))
         AS BIGINT) AS cents
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
), pv AS (
  SELECT cents AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM daily GROUP BY cents
), cum AS (
  SELECT v, SUM(cnt) OVER (ORDER BY v) AS cw, SUM(cnt) OVER () AS tot FROM pv
), med AS (
  SELECT MIN(v) AS med FROM cum WHERE 2 * cw >= tot
), signs AS (
  SELECT d, CASE WHEN cents > med THEN 1 ELSE 0 END AS s
  FROM daily CROSS JOIN med
), breaks AS (
  SELECT s, CASE WHEN LAG(s) OVER (ORDER BY d) IS NULL THEN 1
                 WHEN LAG(s) OVER (ORDER BY d) <> s THEN 1 ELSE 0 END AS brk
  FROM signs
), agg AS (
  SELECT CAST(SUM(brk) AS BIGINT) AS runs,
         CAST(SUM(s) AS BIGINT) AS n1,
         CAST(COUNT(*) - SUM(s) AS BIGINT) AS n2
  FROM breaks
)
SELECT runs, n1, n2,
  ( CAST(runs AS DOUBLE)
    - (2.0E0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
       / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0E0) )
  / SQRT( 2.0E0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
          * (2.0E0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
        / ( (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
          * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
          * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0E0) ) ) AS z
FROM agg
"""

sql_query("stat_runs_test", _RUNS_SQL, oracle="same")


# Grubbs-style outlier scan of the daily revenue series: the five days
# whose deviation from the global mean is largest, with the G statistic
# (|x − x̄| / s). Revenue collapses to integer THOUSAND-dollar units
# (exact truncating division from cents — BIGINT moment headroom
# through sf1000: Σx² ≈ 2e11 at sf1); ranking uses the rationalized
# integer |n·x − Σx| (no division, no float — the CUSUM trick) with a
# date tiebreak; only the final G is a double, identical expression
# text in both engines. One per-day hash aggregate + constant work.
_GRUBBS_TEMPLATE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS DECIMAL(38,0))) AS BIGINT) {IDIV} 100000 AS BIGINT)
      AS kd
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(kd) AS BIGINT) AS s1,
         CAST(SUM(kd * kd) AS BIGINT) AS q
  FROM daily
)
SELECT d AS day, CAST(kd AS BIGINT) AS revenue_kusd,
  ABS(CAST(kd AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
  / SQRT( (CAST(q AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        / (CAST(n AS DOUBLE) - 1.0E0) ) AS grubbs_g
FROM daily CROSS JOIN m
ORDER BY ABS(n * kd - s1) DESC, day
LIMIT 5
"""

sql_query(
    "stat_grubbs_outlier_days",
    _GRUBBS_TEMPLATE.replace("{IDIV}", "DIV"),
    oracle=_GRUBBS_TEMPLATE.replace("{IDIV}", "//"),
)


# Effect sizes for the two-segment comparison — the magnitude companion
# to stat_welch_ttest (a significant t with a trivial d is the classic
# big-data trap): Cohen's d on the pooled SD and Hedges' g (the
# small-sample bias correction J = 1 − 3/(4·df − 1)). Same ONE
# exact-decimal moments pass as Welch; the d/g formulas are fixed
# scalar double expressions with identical text in both engines.
_EFFECT_FINAL = """
  CAST(n1 AS BIGINT) AS n1,
  CAST(n2 AS BIGINT) AS n2,
  (s1 / n1 - s2 / n2)
    / SQRT( ( (q1 - s1 * s1 / n1) + (q2 - s2 * s2 / n2) )
          / (n1 + n2 - 2.0E0) ) AS cohens_d,
  ( (s1 / n1 - s2 / n2)
    / SQRT( ( (q1 - s1 * s1 / n1) + (q2 - s2 * s2 / n2) )
          / (n1 + n2 - 2.0E0) ) )
  * (1.0E0 - 3.0E0 / (4.0E0 * (n1 + n2 - 2.0E0) - 1.0E0)) AS hedges_g
"""

sql_query(
    "stat_effect_sizes",
    _WELCH_MOMENTS + f"SELECT {_EFFECT_FINAL} FROM m",
)


# --- Bartlett's test (round 10) ----------------------------------------------

# variance homogeneity across the five segments from the SAME one-pass
# moments as ANOVA: s²_g = (q_g − s_g²/n_g)/(n_g−1) per group, then
# three 5-element folds (Σ(n−1)s², Σ(n−1)ln s², Σ 1/(n−1)) in SORTED
# order. ln is libm (can differ in the last ulp across engines), so the
# statistic rounds to 9 decimals — the heaps/zipf posture.
_BARTLETT_TEMPLATE = f"""
WITH s AS (
  SELECT c.c_mktsegment AS seg, CAST(o.o_totalprice AS DOUBLE) AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), grp AS (
  SELECT seg,
    CAST(COUNT(*) AS BIGINT) AS n_g,
    {_d2d("SUM(CAST(v AS DECIMAL(38,12)))")} AS s_g,
    {_d2d("SUM(CAST(v * v AS DECIMAL(38,12)))")} AS q_g
  FROM s GROUP BY seg
), terms AS (
  SELECT n_g,
    (q_g - s_g * s_g / n_g) / (n_g - 1.0E0) AS var_g
  FROM grp
), m AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS k,
    CAST(SUM(n_g) AS BIGINT) AS n,
    {{FOLD_SS}} AS pooled_num,
    {{FOLD_LN}} AS sum_ln,
    {{FOLD_INV}} AS sum_inv
  FROM terms
)
SELECT k, n,
  ROUND(
    ( (n - k) * LN(pooled_num / (n - k)) - sum_ln )
    / ( 1.0E0 + (sum_inv - 1.0E0 / (n - k)) / (3.0E0 * (k - 1.0E0)) ),
    9) AS bartlett_stat
FROM m
"""

_B_SS = "(n_g - 1.0E0) * var_g"
_B_LN = "(n_g - 1.0E0) * LN(var_g)"
_B_INV = "1.0E0 / (n_g - 1.0E0)"


def _bartlett(fold):
    return (
        _BARTLETT_TEMPLATE.replace("{FOLD_SS}", fold(_B_SS))
        .replace("{FOLD_LN}", fold(_B_LN))
        .replace("{FOLD_INV}", fold(_B_INV))
    )


sql_query(
    "stat_bartlett_variance",
    _bartlett(
        lambda e: f"reduce(array_sort(collect_list({e})),"
        " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)"
    ),
    oracle=_bartlett(
        lambda e: f"list_reduce(list_sort(list({e})), (a, x) -> a + x)"
    ),
)


# --- Kruskal-Wallis H (round 10) ----------------------------------------------

# rank-based one-way test across ALL FIVE segments — the k-group
# companion to Mann-Whitney, with midrank ties and the tie correction.
# Rank sums never materialize per row: per (value, segment) counts +
# the cumulative count below each distinct value give 2·R_g as an exact
# bigint per group; H is then a fixed formula over k=5 (R_g²/n_g) terms
# folded in sorted order. The Spark side computes the cumulative count
# with the bucketed two-phase prefix (stat_ks_two_sample's shape — no
# unbounded single-task window); the DuckDB oracle uses the plain
# global window (single-node referee, not the scale plan).
_KW_EXPRS = [
    "CAST(k AS BIGINT) AS k",
    "CAST(n AS BIGINT) AS n",
    """ROUND(
    ( 12.0E0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) * rsum
      - 3.0E0 * CAST(n + 1 AS DOUBLE) )
    / ( 1.0E0 - CAST(ties AS DOUBLE)
        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
           - CAST(n AS DOUBLE)) ),
    9) AS h_stat""",
]
_KW_FINAL = ",\n  ".join(_KW_EXPRS)

_KW_RTERM = (
    "CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)"
    " / (4.0E0 * CAST(n_g AS DOUBLE))"
)

_KW_SRC = """
  SELECT c.c_mktsegment AS seg, CAST(o.o_totalprice AS DOUBLE) AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
"""


@query(
    "stat_kruskal_wallis",
    f"""
WITH s AS ({_KW_SRC}),
pv AS (
  SELECT v, seg, CAST(COUNT(*) AS BIGINT) AS n_vs FROM s GROUP BY v, seg
), tv AS (
  SELECT v, CAST(SUM(n_vs) AS BIGINT) AS n_v FROM pv GROUP BY v
), c AS (
  SELECT v, n_v,
    COALESCE(SUM(n_v) OVER (
      ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS cb
  FROM tv
), rg AS (
  SELECT p.seg,
    CAST(SUM(p.n_vs * (2 * c.cb + c.n_v + 1)) AS BIGINT) AS r2,
    CAST(SUM(p.n_vs) AS BIGINT) AS n_g
  FROM pv p JOIN c ON p.v = c.v
  GROUP BY p.seg
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
    list_reduce(list_sort(list({_KW_RTERM})), (a, x) -> a + x) AS rsum
  FROM rg
), t AS (
  SELECT CAST(SUM(n_v * n_v * n_v - n_v) AS BIGINT) AS ties FROM c
)
SELECT {_KW_FINAL}
FROM agg CROSS JOIN t
""",
)
def stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the five market segments (see the
    registered oracle's docstring comment above): exact-integer 2·R_g
    rank sums via per-distinct-value counts + bucketed two-phase
    prefix, sorted fold over the five R²/n terms, tie-corrected H
    rounded to 9 decimals."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    s = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .selectExpr("c_mktsegment AS seg", "CAST(o_totalprice AS DOUBLE) AS v")
    )
    # one raw pass: the (value, segment) collapse is cached and totals/
    # bounds derive from it (the un-cached plan re-ran the
    # orders⋈customer join once per consumer — 9 scans before)
    pv = s.groupBy("v", "seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_vs")
    ).cache()
    tv = pv.groupBy("v").agg(F.sum("n_vs").cast("long").alias("n_v"))
    bounds = pv.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    b = tv.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket", F.expr("width_bucket(v, vmin, vmax + 1.0d, 1024)")
    )
    w_bkt = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        b.groupBy("bucket")
        .agg(F.sum("n_v").alias("bn"))
        .select(
            "bucket",
            F.coalesce(F.sum("bn").over(w_bkt), F.lit(0)).alias("off"),
        )
    )
    w_in = Window.partitionBy("bucket").orderBy("v")
    # cached: both the per-segment rank sums and the tie correction
    # read this distinct-value cumulative frame
    c = b.join(F.broadcast(offs), "bucket").select(
        "v", "n_v",
        (F.col("off") + F.sum("n_v").over(w_in) - F.col("n_v")).alias("cb"),
    ).cache()
    rg = (
        pv.join(c, "v")
        .groupBy("seg")
        .agg(
            F.sum(F.expr("n_vs * (2 * cb + n_v + 1)")).cast("long").alias("r2"),
            F.sum("n_vs").cast("long").alias("n_g"),
        )
    )
    agg = rg.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.expr(
            f"reduce(array_sort(collect_list({_KW_RTERM})),"
            " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)"
        ).alias("rsum"),
    )
    ties = c.agg(
        F.sum(F.expr("n_v * n_v * n_v - n_v")).cast("long").alias("ties")
    )
    return agg.crossJoin(F.broadcast(ties)).selectExpr(*_KW_EXPRS)


# --- Durbin-Watson (round 10) --------------------------------------------------

# serial correlation of daily-revenue residuals around the OLS trend:
# the regression-diagnostics staple. Daily totals are exact decimal
# sums (~2.4k calendar days — the bounded-by-calendar posture
# stat_acf_multi_lag documents); the OLS fit comes from exact integer /
# decimal sums; residuals are a fixed double formula per day; and the
# two order-sensitive sums (Σ(e−e_prev)², Σe²) fold in SORTED order.
_DW_TEMPLATE = f"""
WITH daily AS (
  SELECT o_orderdate AS d,
    {_d2d("SUM(CAST(o_totalprice AS DECIMAL(38,12)))")} AS y
  FROM orders GROUP BY o_orderdate
), idx AS (
  SELECT y, CAST({{DAYDIFF}} AS BIGINT) AS x FROM daily
), fit AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM(x) AS DOUBLE) AS sx,
    {_d2d("SUM(CAST(y AS DECIMAL(38,9)))")} AS sy,
    CAST(SUM(x * x) AS DOUBLE) AS sxx,
    {_d2d("SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,9)))")} AS sxy
  FROM idx
), resid AS (
  SELECT x,
    y - ( (n * sxy - sx * sy) / (n * sxx - sx * sx) ) * x
      - ( (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n ) AS e
  FROM idx CROSS JOIN fit
), lagged AS (
  SELECT e, LAG(e) OVER (ORDER BY x) AS e_prev FROM resid
), sums AS (
  SELECT
    {{FOLD_NUM}} AS num,
    {{FOLD_DEN}} AS den,
    CAST(COUNT(*) AS BIGINT) AS n_days
  FROM lagged
)
SELECT n_days, ROUND(num / den, 9) AS dw_stat FROM sums
"""

_DW_NUM = "CASE WHEN e_prev IS NULL THEN 0.0E0 ELSE (e - e_prev) * (e - e_prev) END"
_DW_DEN = "e * e"


def _dw(fold, daydiff):
    return (
        _DW_TEMPLATE.replace("{FOLD_NUM}", fold(_DW_NUM))
        .replace("{FOLD_DEN}", fold(_DW_DEN))
        .replace("{DAYDIFF}", daydiff)
    )


sql_query(
    "stat_durbin_watson",
    _dw(
        lambda e: f"reduce(array_sort(collect_list({e})),"
        " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
        "DATEDIFF(CAST(d AS DATE), DATE '1992-01-01')",
    ),
    oracle=_dw(
        lambda e: f"list_reduce(list_sort(list({e})), (a, x) -> a + x)",
        "DATEDIFF('day', DATE '1992-01-01', CAST(d AS DATE))",
    ),
)


# --- Friedman test (round 10 wave 3) -----------------------------------------

# non-parametric repeated-measures test: blocks = order months,
# treatments = the five market segments, response = monthly segment
# revenue (exact decimal sum). Ranks are computed WITHIN each 5-row
# block (bounded window partitions — scale-safe at any table size);
# revenue ties are broken deterministically by segment name (documented
# — exact-decimal revenues virtually never tie), so the per-treatment
# rank sums are exact integers and the statistic is one fixed double
# formula. Shared dialect text → oracle runs the same SQL.
sql_query(
    "stat_friedman_test",
    """
WITH cell AS (
  SELECT substring(CAST(o.o_orderdate AS STRING), 1, 7) AS blk,
         c.c_mktsegment AS seg,
         SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY substring(CAST(o.o_orderdate AS STRING), 1, 7), c.c_mktsegment
), full_blocks AS (
  SELECT blk FROM cell GROUP BY blk HAVING COUNT(*) = 5
), ranked AS (
  SELECT c.blk, c.seg,
         RANK() OVER (PARTITION BY c.blk ORDER BY c.rev, c.seg) AS r
  FROM cell c JOIN full_blocks f ON c.blk = f.blk
), rsums AS (
  SELECT seg, CAST(SUM(r) AS BIGINT) AS rj FROM ranked GROUP BY seg
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(rj * rj) AS BIGINT) AS rss
  FROM rsums
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM full_blocks
)
SELECT k, nb AS n_blocks,
  12.0E0 / (CAST(nb AS DOUBLE) * CAST(k AS DOUBLE) * CAST(k + 1 AS DOUBLE))
    * CAST(rss AS DOUBLE)
  - 3.0E0 * CAST(nb AS DOUBLE) * CAST(k + 1 AS DOUBLE) AS friedman_chi2
FROM m CROSS JOIN n
""",
    oracle="same",
)


# --- McNemar's test (round 10 wave 3) -----------------------------------------

# paired binary outcomes: did each user 'click' in the first half of
# the window vs the second half? b = yes→no, c = no→yes; the
# continuity-corrected statistic (|b−c|−1)²/(b+c) is one double formula
# over two exact integers. One hash aggregate per user then one global
# reduce — map-combinable at any scale.
sql_query(
    "stat_mcnemar_paired",
    """
WITH per_user AS (
  SELECT user_id,
    MAX(CASE WHEN event_type = 'click'
             AND CAST(ts AS DATE) <  DATE '1995-01-16' THEN 1 ELSE 0 END) AS p1,
    MAX(CASE WHEN event_type = 'click'
             AND CAST(ts AS DATE) >= DATE '1995-01-16' THEN 1 ELSE 0 END) AS p2
  FROM events GROUP BY user_id
), cells AS (
  SELECT
    CAST(SUM(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(SUM(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM per_user
)
SELECT b, c,
  (ABS(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0E0)
  * (ABS(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0E0)
  / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)) AS mcnemar_chi2
FROM cells
""",
    oracle="same",
)


# --- Cochran's Q (round 10 wave 5) --------------------------------------------

# k related binary samples — the k-group generalization of McNemar
# (its k=2 case, registered above): did each user click in each of
# three 10-day thirds of the window? Q = (k−1)[k·ΣC_j² − (ΣC_j)²] /
# (k·ΣR_i − ΣR_i²) over exact integer column/row totals — one double
# division. Two hash aggregates (per-user bits, then totals) —
# map-combinable at any scale.
sql_query(
    "stat_cochran_q",
    """
WITH per_user AS (
  SELECT user_id,
    MAX(CASE WHEN event_type = 'click'
             AND CAST(ts AS DATE) <  DATE '1995-01-11' THEN 1 ELSE 0 END) AS b1,
    MAX(CASE WHEN event_type = 'click'
             AND CAST(ts AS DATE) >= DATE '1995-01-11'
             AND CAST(ts AS DATE) <  DATE '1995-01-21' THEN 1 ELSE 0 END) AS b2,
    MAX(CASE WHEN event_type = 'click'
             AND CAST(ts AS DATE) >= DATE '1995-01-21' THEN 1 ELSE 0 END) AS b3
  FROM events GROUP BY user_id
), m AS (
  SELECT
    CAST(SUM(b1) AS BIGINT) AS c1,
    CAST(SUM(b2) AS BIGINT) AS c2,
    CAST(SUM(b3) AS BIGINT) AS c3,
    CAST(SUM(b1 + b2 + b3) AS BIGINT) AS sr,
    CAST(SUM((b1 + b2 + b3) * (b1 + b2 + b3)) AS BIGINT) AS srr,
    CAST(COUNT(*) AS BIGINT) AS n_users
  FROM per_user
)
SELECT n_users, c1, c2, c3,
  CAST(2 * (3 * (c1 * c1 + c2 * c2 + c3 * c3)
            - (c1 + c2 + c3) * (c1 + c2 + c3)) AS DOUBLE)
    / CAST(3 * sr - srr AS DOUBLE) AS cochran_q
FROM m
""",
    oracle="same",
)


# --- paired sign test (round 10 wave 6) ----------------------------------------

# non-parametric paired comparison: per user, are there more 'view'
# than 'click' events? n_plus/n_minus are exact integer counts over one
# per-user aggregate; the normal-approximation z (continuity-corrected)
# is a fixed double formula. Completes the paired family
# (McNemar = binary outcomes, Cochran Q = k samples, sign test =
# ordinal comparison).
sql_query(
    "stat_sign_test_paired",
    """
WITH per_user AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS v,
    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM events GROUP BY user_id
), cells AS (
  SELECT
    CAST(SUM(CASE WHEN v > c THEN 1 ELSE 0 END) AS BIGINT) AS n_plus,
    CAST(SUM(CASE WHEN v < c THEN 1 ELSE 0 END) AS BIGINT) AS n_minus
  FROM per_user
)
SELECT n_plus, n_minus,
  (ABS(CAST(n_plus AS DOUBLE) - CAST(n_minus AS DOUBLE)) - 1.0E0)
  / SQRT(CAST(n_plus + n_minus AS DOUBLE)) AS sign_z
FROM cells
""",
    oracle="same",
)


# --- Wilcoxon signed-rank (round 10 wave 6) -------------------------------------

# the paired-CONTINUOUS member of the family (sign test ignores
# magnitude; this ranks |d|): per-user d = views − clicks, zeros
# dropped per the classic procedure, midranks over |d| with the tie
# correction. 2·W⁺ accumulates as an exact bigint over per-distinct-|d|
# counts (the Mann-Whitney midrank identity); z is a fixed double
# formula. The Spark side uses the bucketed two-phase prefix — |d| is
# a small-integer domain here, but the shape is the scale plan.
_WSR_EXPRS = [
    "CAST(n AS BIGINT) AS n",
    "CAST(w2 AS DOUBLE) / 2.0E0 AS w_plus",
    """( CAST(w2 AS DOUBLE) / 2.0E0
    - CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE) / 4.0E0 )
  / SQRT( CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)
          * CAST(2 * n + 1 AS DOUBLE) / 24.0E0
        - CAST(ties AS DOUBLE) / 48.0E0 ) AS z""",
]
_WSR_FINAL = ",\n  ".join(_WSR_EXPRS)

_WSR_SRC = """
  SELECT CAST(ABS(d) AS BIGINT) AS ad,
         CASE WHEN d > 0 THEN 1 ELSE 0 END AS pos
  FROM (
    SELECT CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             - SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             AS BIGINT) AS d
    FROM events GROUP BY user_id
  ) diffs
  WHERE d <> 0
"""


@query(
    "stat_wilcoxon_signed_rank",
    f"""
WITH s AS ({_WSR_SRC}),
pv AS (
  SELECT ad, CAST(COUNT(*) AS BIGINT) AS n_v,
         CAST(SUM(pos) AS BIGINT) AS p_v
  FROM s GROUP BY ad
), c AS (
  SELECT ad, n_v, p_v,
    COALESCE(SUM(n_v) OVER (
      ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS cb
  FROM pv
), agg AS (
  SELECT
    CAST(SUM(n_v) AS BIGINT) AS n,
    CAST(SUM(p_v * (2 * cb + n_v + 1)) AS BIGINT) AS w2,
    CAST(SUM(n_v * n_v * n_v - n_v) AS BIGINT) AS ties
  FROM c
)
SELECT {_WSR_FINAL}
FROM agg
""",
)
def stat_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank over per-user view−click differences (see
    the oracle above): exact 2·W⁺ via per-distinct-|d| counts + the
    bucketed two-phase prefix, tie-corrected normal z."""
    from pyspark.sql import Window

    load_tables(spark, sf_dir)
    s = spark.sql(f"SELECT * FROM ({_WSR_SRC})")
    pv = s.groupBy("ad").agg(
        F.count(F.lit(1)).cast("long").alias("n_v"),
        F.sum("pos").cast("long").alias("p_v"),
    )
    bounds = s.agg(
        F.min(F.col("ad").cast("double")).alias("vmin"),
        F.max(F.col("ad").cast("double")).alias("vmax"),
    )
    b = pv.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket",
        F.expr("width_bucket(CAST(ad AS DOUBLE), vmin, vmax + 1.0d, 1024)"),
    )
    w_bkt = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        b.groupBy("bucket")
        .agg(F.sum("n_v").alias("bn"))
        .select(
            "bucket",
            F.coalesce(F.sum("bn").over(w_bkt), F.lit(0)).alias("off"),
        )
    )
    w_in = Window.partitionBy("bucket").orderBy("ad")
    c = b.join(F.broadcast(offs), "bucket").select(
        "n_v", "p_v",
        (F.col("off") + F.sum("n_v").over(w_in) - F.col("n_v")).alias("cb"),
    )
    agg = c.agg(
        F.sum("n_v").cast("long").alias("n"),
        F.sum(F.expr("p_v * (2 * cb + n_v + 1)")).cast("long").alias("w2"),
        F.sum(F.expr("n_v * n_v * n_v - n_v")).cast("long").alias("ties"),
    )
    return agg.selectExpr(*_WSR_EXPRS)


# --- exact AUC-ROC (round 10 wave 6) --------------------------------------------

# the ranking-quality ML-eval staple, EXACT: AUC = (ΣR⁺ − n⁺(n⁺+1)/2)
# / (n⁺·n⁻) over midranks of the score — the Mann-Whitney U identity,
# so the same per-distinct-score counts + cumulative-below machinery
# produces 2·ΣR⁺ as an exact bigint and AUC is one double division.
# Scorer: the event's exact micro-unit value predicting "is a
# purchase" — event-grain, both classes populated at every SF.
_AUC_EXPRS = [
    "CAST(n_pos AS BIGINT) AS n_pos",
    "CAST(n_neg AS BIGINT) AS n_neg",
    """( CAST(r2 AS DOUBLE) / 2.0E0
    - CAST(n_pos AS DOUBLE) * CAST(n_pos + 1 AS DOUBLE) / 2.0E0 )
  / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc""",
]
_AUC_FINAL = ",\n  ".join(_AUC_EXPRS)

_AUC_SRC = """
  SELECT CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events
"""


@query(
    "ml_auc_roc_exact",
    f"""
WITH s AS ({_AUC_SRC}),
pv AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS n_v,
         CAST(SUM(label) AS BIGINT) AS p_v
  FROM s GROUP BY score
), c AS (
  SELECT score, n_v, p_v,
    COALESCE(SUM(n_v) OVER (
      ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS cb
  FROM pv
), agg AS (
  SELECT
    CAST(SUM(p_v) AS BIGINT) AS n_pos,
    CAST(SUM(n_v - p_v) AS BIGINT) AS n_neg,
    CAST(SUM(p_v * (2 * cb + n_v + 1)) AS BIGINT) AS r2
  FROM c
)
SELECT {_AUC_FINAL}
FROM agg
""",
)
def ml_auc_roc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC-ROC via the U identity (oracle above); the Spark side
    computes the cumulative count-below with the bucketed two-phase
    prefix — at 10⁹ users no task ever sorts more than one score
    bucket."""
    from pyspark.sql import Window

    load_tables(spark, sf_dir)
    s = spark.sql(f"SELECT * FROM ({_AUC_SRC})")
    # NOT cached (optimization r12, measured): only 2 consumers of a
    # bare events scan — a cache cost more than the rescan at sf0.1
    pv = s.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("n_v"),
        F.sum("label").cast("long").alias("p_v"),
    )
    bounds = s.agg(
        F.min(F.col("score").cast("double")).alias("vmin"),
        F.max(F.col("score").cast("double")).alias("vmax"),
    )
    b = pv.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket",
        F.expr("width_bucket(CAST(score AS DOUBLE), vmin, vmax + 1.0d, 1024)"),
    )
    w_bkt = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        b.groupBy("bucket")
        .agg(F.sum("n_v").alias("bn"))
        .select(
            "bucket",
            F.coalesce(F.sum("bn").over(w_bkt), F.lit(0)).alias("off"),
        )
    )
    w_in = Window.partitionBy("bucket").orderBy("score")
    c = b.join(F.broadcast(offs), "bucket").select(
        "n_v", "p_v",
        (F.col("off") + F.sum("n_v").over(w_in) - F.col("n_v")).alias("cb"),
    )
    agg = c.agg(
        F.sum("p_v").cast("long").alias("n_pos"),
        F.sum(F.expr("n_v - p_v")).cast("long").alias("n_neg"),
        F.sum(F.expr("p_v * (2 * cb + n_v + 1)")).cast("long").alias("r2"),
    )
    return agg.selectExpr(*_AUC_EXPRS)


# --- calibration / reliability bins (round 10 wave 6) ---------------------------

# the companion diagnostic to AUC: bin the score range into 10 equal
# integer-width bins and report each bin's positive rate — the
# reliability-diagram table. All integer arithmetic (bin ids via
# integer division over exact micro-unit scores), one hash aggregate;
# the rate is one exact division per bin.
_CALIB_TEMPLATE = f"""
WITH s AS ({{SRC}}),
b AS (
  SELECT CAST(MIN(score) AS BIGINT) AS lo, CAST(MAX(score) AS BIGINT) AS hi
  FROM s
), binned AS (
  SELECT LEAST(CAST((score - lo) * 10 {{IDIV}} (hi - lo + 1) AS BIGINT), 9)
           AS bin, label
  FROM s CROSS JOIN b
)
SELECT bin,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(label) AS BIGINT) AS n_pos,
  CAST(SUM(label) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pos_rate
FROM binned GROUP BY bin ORDER BY bin
"""

sql_query(
    "ml_calibration_bins",
    _CALIB_TEMPLATE.replace("{SRC}", _AUC_SRC).replace("{IDIV}", "DIV"),
    oracle=_CALIB_TEMPLATE.replace("{SRC}", _AUC_SRC).replace("{IDIV}", "//"),
)


# --- PR-AUC / average precision, EXACT (round 11) ---------------------------

# the imbalanced-class companion to AUC-ROC: AP = Σ_s (p_v(s)/n_pos) ·
# TP(s)/PP(s), summed over distinct thresholds s, where TP(s) = positives
# with score ≥ s and PP(s) = rows with score ≥ s — all exact bigints from
# per-distinct-score counts + the cumulative-below machinery AUC already
# uses. The per-threshold double terms fold in SORTED order (bounded by
# DISTINCT scores, which saturate: 18k at sf0.1 — the trimmed-mean
# posture), so the sum is bit-identical across engines.
_PRAUC_TEMPLATE = f"""
WITH s AS ({_AUC_SRC}),
pv AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS n_v,
         CAST(SUM(label) AS BIGINT) AS p_v
  FROM s GROUP BY score
), c AS (
  SELECT score, n_v, p_v,
    COALESCE(SUM(n_v) OVER (
      ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS cb,
    COALESCE(SUM(p_v) OVER (
      ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS cpb
  FROM pv
), tot AS (
  SELECT CAST(SUM(n_v) AS BIGINT) AS n_all,
         CAST(SUM(p_v) AS BIGINT) AS n_pos
  FROM pv
), terms AS (
  SELECT
    CAST(p_v AS DOUBLE) * (CAST(n_pos - cpb AS DOUBLE)
                           / CAST(n_all - cb AS DOUBLE)) AS term,
    n_pos
  FROM c CROSS JOIN tot
  WHERE p_v > 0
)
SELECT
  (SELECT n_pos FROM tot) AS n_pos,
  (SELECT n_all - n_pos FROM tot) AS n_neg,
  {{FOLD}} / CAST((SELECT n_pos FROM tot) AS DOUBLE) AS average_precision
FROM terms
"""

@query(
    "ml_pr_auc_exact",
    _PRAUC_TEMPLATE.replace(
        "{FOLD}", "list_reduce(list_sort(list(term)), (a, x) -> a + x)"
    ),
)
def ml_pr_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision (oracle above); the Spark side computes
    BOTH cumulative-below counts (rows and positives) with the bucketed
    two-phase prefix AUC uses — no unpartitioned window, no task sorts
    more than one score bucket."""
    from pyspark.sql import Window

    load_tables(spark, sf_dir)
    s = spark.sql(f"SELECT * FROM ({_AUC_SRC})")
    # NOT cached (optimization r12, measured): see ml_auc_roc_exact
    pv = s.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("n_v"),
        F.sum("label").cast("long").alias("p_v"),
    )
    bounds = s.agg(
        F.min(F.col("score").cast("double")).alias("vmin"),
        F.max(F.col("score").cast("double")).alias("vmax"),
    )
    b = pv.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket",
        F.expr("width_bucket(CAST(score AS DOUBLE), vmin, vmax + 1.0d, 1024)"),
    )
    w_bkt = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        b.groupBy("bucket")
        .agg(F.sum("n_v").alias("bn"), F.sum("p_v").alias("bp"))
        .select(
            "bucket",
            F.coalesce(F.sum("bn").over(w_bkt), F.lit(0)).alias("off_n"),
            F.coalesce(F.sum("bp").over(w_bkt), F.lit(0)).alias("off_p"),
        )
    )
    w_in = Window.partitionBy("bucket").orderBy("score")
    c = b.join(F.broadcast(offs), "bucket").select(
        "n_v",
        "p_v",
        (F.col("off_n") + F.sum("n_v").over(w_in) - F.col("n_v")).alias("cb"),
        (F.col("off_p") + F.sum("p_v").over(w_in) - F.col("p_v")).alias("cpb"),
    )
    tot = pv.agg(
        F.sum("n_v").cast("long").alias("n_all"),
        F.sum("p_v").cast("long").alias("n_pos"),
    )
    terms = (
        c.filter(F.col("p_v") > 0)
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "CAST(p_v AS DOUBLE) * (CAST(n_pos - cpb AS DOUBLE)"
            " / CAST(n_all - cb AS DOUBLE)) AS term",
            "n_pos",
            "n_all",
        )
    )
    return terms.groupBy("n_pos", "n_all").agg(
        F.expr(
            "reduce(array_sort(collect_list(term)),"
            " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)"
        ).alias("ap_sum")
    ).selectExpr(
        "n_pos",
        "n_all - n_pos AS n_neg",
        "ap_sum / CAST(n_pos AS DOUBLE) AS average_precision",
    )


# --- Matthews correlation + balanced accuracy, EXACT (round 11) -------------

# thresholded-classifier diagnostics from one confusion-matrix hash
# aggregate: predict positive when the exact micro-unit score clears a
# fixed operating point (35.0, near the score median). MCC's numerator/denominator are exact bigint
# products converted once; balanced accuracy is two exact divisions —
# bit-identical, no rank machinery needed.
_MCC_TEMPLATE = f"""
WITH s AS ({_AUC_SRC}),
cm AS (
  SELECT
    CAST(SUM(CASE WHEN score >= 35000000 AND label = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN score >= 35000000 AND label = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN score < 35000000 AND label = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS fn,
    CAST(SUM(CASE WHEN score < 35000000 AND label = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS tn
  FROM s
)
SELECT tp, fp, fn, tn,
  (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
   - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
  / SQRT(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
         * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)) AS mcc,
  0.5E0 * (CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
           + CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE))
    AS balanced_accuracy
FROM cm
"""

sql_query("ml_mcc_balanced_accuracy", _MCC_TEMPLATE)


# --- NDCG@10 per user, EXACT (round 11) --------------------------------------

# the retrieval/ranking-eval staple a training-data pipeline runs over
# interaction logs: within each user, rank events by the exact
# micro-unit score (md5 tiebreak — both engines produce the SAME total
# order, so ranks are deterministic), grade relevance from the event
# type (purchase=2, click/view=1, else 0), and compute
# DCG@10 / IDCG@10. Each user's ≤10 DCG terms fold in SORTED order so
# the doubles are bit-identical. Per-user rows ship out (no global
# double fold); the windows are user-partitioned — the 100 TB shape.
_NDCG_SRC = """
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS score,
         CASE WHEN event_type = 'purchase' THEN 2
              WHEN event_type IN ('click', 'view') THEN 1
              ELSE 0 END AS rel,
         md5(CAST(event_id AS STRING)) AS tb
  FROM events
"""

_NDCG_TEMPLATE = f"""
WITH s AS ({_NDCG_SRC}),
ranked AS (
  SELECT user_id, rel,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY score DESC, tb) AS rnk,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY rel DESC, score DESC, tb) AS ideal_rnk
  FROM s
), dcg AS (
  SELECT user_id,
    {{FOLD_DCG}} AS dcg,
    {{FOLD_IDCG}} AS idcg
  FROM ranked GROUP BY user_id
)
SELECT user_id, dcg, idcg, dcg / idcg AS ndcg
FROM dcg
WHERE idcg > 0
ORDER BY user_id
"""


def _ndcg_fold(engine: str, rank_col: str) -> str:
    # the ≤10 discount divisors log2(rank+1) as LITERAL doubles: both
    # engines parse the same decimal literal to the same IEEE double,
    # where each engine's own LN/libm can differ by an ulp
    import math

    discounts = " ".join(
        f"WHEN {rank_col} = {r} THEN {math.log2(r + 1)!r}E0"
        for r in range(1, 11)
    )
    term = (
        f"CASE WHEN {rank_col} <= 10 THEN CAST(rel AS DOUBLE)"
        f" / (CASE {discounts} END)"
        " ELSE NULL END"
    )
    if engine == "spark":
        return (
            f"reduce(array_sort(collect_list({term})),"
            " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)"
        )
    return f"list_reduce(list_sort(list({term}) FILTER (WHERE {term} IS NOT NULL)), (a, x) -> a + x)"


sql_query(
    "ml_ndcg_at_10",
    _NDCG_TEMPLATE.replace("{FOLD_DCG}", _ndcg_fold("spark", "rnk")).replace(
        "{FOLD_IDCG}", _ndcg_fold("spark", "ideal_rnk")
    ),
    oracle=_NDCG_TEMPLATE.replace(
        "{FOLD_DCG}", _ndcg_fold("duck", "rnk")
    ).replace("{FOLD_IDCG}", _ndcg_fold("duck", "ideal_rnk")),
)


# --- deterministic k-fold assignment (round 11) ------------------------------

# the train/eval split a training-data pipeline must reproduce across
# engines and re-runs: fold = md5(doc_id) mod k — no RNG, no seed
# state, any engine lands every document in the same fold (the
# sample_reservoir_hash posture applied to splitting). Map-only + one
# hash aggregate; at 100 TB the fold id is a projection expression
# inside the scan.
_KFOLD_TEMPLATE = """
WITH folds AS (
  SELECT {HASH} % 5 AS fold, lang, n_chars
  FROM documents
)
SELECT fold,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
FROM folds GROUP BY fold ORDER BY fold
"""

sql_query(
    "pipeline_kfold_assignment",
    _KFOLD_TEMPLATE.replace(
        "{HASH}",
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
        " AS BIGINT)",
    ),
    oracle=_KFOLD_TEMPLATE.replace(
        "{HASH}",
        "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
        "::BIGINT AS BIGINT)",
    ),
)


# --- Brier score, EXACT (round 11) -------------------------------------------

# probabilistic-forecast calibration in one number: mean (p − label)².
# The "probability" is the exact micro-unit score normalized by a
# constant divisor — the same double in both engines — and the sum is
# purely polynomial (no transcendentals), grouped per distinct score
# and folded in sorted order: bit-identical.
_BRIER_TEMPLATE = f"""
WITH s AS ({_AUC_SRC}),
pv AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS n_v,
         CAST(SUM(label) AS BIGINT) AS p_v
  FROM s GROUP BY score
), hi AS (
  SELECT CAST(MAX(score) + 1 AS DOUBLE) AS denom,
         CAST(SUM(n_v) AS BIGINT) AS n_all
  FROM pv
), terms AS (
  SELECT
    CAST(p_v AS DOUBLE)
      * (CAST(score AS DOUBLE) / denom - 1.0E0)
      * (CAST(score AS DOUBLE) / denom - 1.0E0)
    + CAST(n_v - p_v AS DOUBLE)
      * (CAST(score AS DOUBLE) / denom)
      * (CAST(score AS DOUBLE) / denom) AS term,
    n_all
  FROM pv CROSS JOIN hi
)
SELECT n_all AS n,
  {{FOLD}} / CAST(n_all AS DOUBLE) AS brier_score
FROM terms GROUP BY n_all
"""

sql_query(
    "ml_brier_score",
    _BRIER_TEMPLATE.replace(
        "{FOLD}",
        "reduce(array_sort(collect_list(term)),"
        " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
    ),
    oracle=_BRIER_TEMPLATE.replace(
        "{FOLD}", "list_reduce(list_sort(list(term)), (a, x) -> a + x)"
    ),
)


# --- MRR + recall@10 per user, EXACT (round 11) -------------------------------

# the retrieval-eval pair next to NDCG: within each user's
# deterministically ranked events (same md5 tiebreak as ml_ndcg_at_10),
# the reciprocal rank of the first relevant hit in the top 10 and the
# fraction of the user's relevant events that made the top 10. Exact
# rational divisions of integers; per-user rows, user-partitioned
# windows — no global anything.
_MRR_TEMPLATE = f"""
WITH s AS ({_NDCG_SRC}),
ranked AS (
  SELECT user_id, rel,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY score DESC, tb) AS rnk
  FROM s
), per_user AS (
  SELECT user_id,
    MIN(CASE WHEN rel > 0 AND rnk <= 10 THEN rnk END) AS first_hit_rank,
    CAST(SUM(CASE WHEN rel > 0 AND rnk <= 10 THEN 1 ELSE 0 END)
         AS BIGINT) AS hits_at_10,
    CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
  FROM ranked GROUP BY user_id
)
SELECT user_id, first_hit_rank,
  COALESCE(1.0E0 / CAST(first_hit_rank AS DOUBLE), 0.0E0) AS rr_at_10,
  CAST(hits_at_10 AS DOUBLE) / CAST(n_rel AS DOUBLE) AS recall_at_10
FROM per_user
WHERE n_rel > 0
ORDER BY user_id
"""

sql_query("ml_mrr_recall_at_10", _MRR_TEMPLATE)


# --- event-type Markov transition matrix, EXACT (round 11) --------------------

# first-order sequence statistics over the interaction log: per-user
# consecutive event-type bigrams (deterministic order: ts then
# event_id) counted into a transition matrix with exact row-normalized
# probabilities — the sequence-modeling prior a behavioral pipeline
# feeds. One user-partitioned lag + one hash aggregate.
_MARKOV_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
), rowt AS (
  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_n FROM pairs
  GROUP BY prev_type
)
SELECT p.prev_type, p.next_type, p.n,
  CAST(p.n AS DOUBLE) / CAST(r.row_n AS DOUBLE) AS p_transition
FROM pairs p JOIN rowt r ON p.prev_type = r.prev_type
ORDER BY p.prev_type, p.next_type
"""

sql_query("events_markov_transitions", _MARKOV_SQL)


# --- log loss, EXACT-to-9-decimals (round 11) ---------------------------------

# cross-entropy of the normalized-score "probability" against the
# purchase label: −mean(y·ln p + (1−y)·ln(1−p)). LN is the one
# transcendental — each engine's libm can differ in the last ulp
# (the Bartlett/Durbin-Watson posture), so terms group per distinct
# score, fold in sorted order, and the statistic ROUNDs to 9 decimals.
# p is clamped away from {0,1} by the (score+1)/(hi+2) Laplace shift —
# pure rational arithmetic, identical doubles both engines.
_LOGLOSS_TEMPLATE = f"""
WITH s AS ({_AUC_SRC}),
pv AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS n_v,
         CAST(SUM(label) AS BIGINT) AS p_v
  FROM s GROUP BY score
), hi AS (
  SELECT CAST(MAX(score) + 2 AS DOUBLE) AS denom,
         CAST(SUM(n_v) AS BIGINT) AS n_all
  FROM pv
), terms AS (
  SELECT
    CAST(p_v AS DOUBLE) * LN(CAST(score + 1 AS DOUBLE) / denom)
    + CAST(n_v - p_v AS DOUBLE)
        * LN(1.0E0 - CAST(score + 1 AS DOUBLE) / denom) AS term,
    n_all
  FROM pv CROSS JOIN hi
)
SELECT n_all AS n,
  ROUND(-({{FOLD}}) / CAST(n_all AS DOUBLE), 9) AS log_loss
FROM terms GROUP BY n_all
"""

sql_query(
    "ml_log_loss",
    _LOGLOSS_TEMPLATE.replace(
        "{FOLD}",
        "reduce(array_sort(collect_list(term)),"
        " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
    ),
    oracle=_LOGLOSS_TEMPLATE.replace(
        "{FOLD}", "list_reduce(list_sort(list(term)), (a, x) -> a + x)"
    ),
)


# --- Theil T inequality index (round 11) --------------------------------------

# the decomposable inequality companion to Gini: T = Σ (x_i/X)·ln(n·x_i/X)
# over per-customer spend. Spend is exact integer cents; terms collapse
# per DISTINCT value with an integer multiplicity; ln is the lone
# transcendental, so terms fold in SORTED order and the index ROUNDs to
# 9 decimals (the Bartlett posture). One hash aggregate + a bounded
# distinct-value fold.
_THEIL_TEMPLATE = """
WITH spend AS (
  SELECT o_custkey,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0)))
         AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
), pv AS (
  SELECT cents AS x, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM spend GROUP BY cents
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * cnt) AS DECIMAL(38,0)) AS total
  FROM pv
), terms AS (
  SELECT
    CAST(cnt AS DOUBLE)
      * (CAST(x AS DOUBLE) / CAST(t.total AS DOUBLE))
      * LN(CAST(t.n AS DOUBLE) * CAST(x AS DOUBLE)
           / CAST(t.total AS DOUBLE)) AS term,
    t.n AS n
  FROM pv CROSS JOIN tot t
)
SELECT n, ROUND({FOLD}, 9) AS theil_t
FROM terms GROUP BY n
"""

sql_query(
    "stat_theil_index",
    _THEIL_TEMPLATE.replace(
        "{FOLD}",
        "reduce(array_sort(collect_list(term)),"
        " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
    ),
    oracle=_THEIL_TEMPLATE.replace(
        "{FOLD}", "list_reduce(list_sort(list(term)), (a, x) -> a + x)"
    ),
)


# --- gaps & islands over the order calendar (round 11) ------------------------

# the classic islands idiom: consecutive-day runs of order activity via
# the day-number-minus-row-number constant. Runs over DISTINCT calendar
# days (bounded by the calendar — ~2.4k rows at any SF, the documented
# bounded-window posture), all integer arithmetic.
_ISLANDS_TEMPLATE = """
WITH days AS (
  SELECT DISTINCT {DAYNUM} AS dn FROM orders
), grp AS (
  SELECT dn, dn - ROW_NUMBER() OVER (ORDER BY dn) AS island
  FROM days
)
SELECT island,
  CAST(MIN(dn) AS BIGINT) AS start_day,
  CAST(MAX(dn) AS BIGINT) AS end_day,
  CAST(COUNT(*) AS BIGINT) AS n_days
FROM grp GROUP BY island
HAVING COUNT(*) >= 2
ORDER BY start_day
"""

sql_query(
    "window_gaps_islands",
    _ISLANDS_TEMPLATE.replace(
        "{DAYNUM}", "datediff(o_orderdate, DATE '1990-01-01')"
    ),
    oracle=_ISLANDS_TEMPLATE.replace(
        "{DAYNUM}", "datediff('day', DATE '1990-01-01', o_orderdate)"
    ),
)


# --- correlated LATERAL join (round 11) ---------------------------------------

# the SQL surface feature distinct from a window top-k: a correlated
# LATERAL subquery with ORDER BY + LIMIT per outer row (top earner per
# nation). Same text in both engines; Spark decorrelates it to a
# group-limit shape.
sql_query(
    "join_lateral_top1_per_nation",
    """
SELECT n.n_name, l.s_name, l.s_acctbal
FROM nation n
CROSS JOIN LATERAL (
  SELECT s_name, s_acctbal
  FROM supplier s
  WHERE s.s_nationkey = n.n_nationkey
  ORDER BY s_acctbal DESC, s_name
  LIMIT 1
) l
ORDER BY n.n_name
""",
)


# --- Pareto 80/20 revenue concentration (round 11) -----------------------------

# "what share of revenue do the top 20% of customers hold" — the
# concentration audit next to Gini, EXACT: spend in integer cents,
# distinct-value collapse, and the bottom-(n-k) revenue found by
# locating the threshold run via cumulative counts (partial tie-runs
# contribute (k_bot - cum_before) copies of the threshold value —
# integer arithmetic end to end, one double division at the end).
_PARETO_SRC = """
  SELECT o_custkey,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0)))
         AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
"""

_PARETO_ORACLE = f"""
WITH spend AS ({_PARETO_SRC}),
pv AS (
  SELECT cents AS x, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM spend GROUP BY cents
), c AS (
  SELECT x, cnt,
    COALESCE(SUM(cnt) OVER (
      ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
    COALESCE(SUM(CAST(x AS DECIMAL(38,0)) * cnt) OVER (
      ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      CAST(0 AS DECIMAL(38,0))) AS rev_below
  FROM pv
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * cnt) AS DECIMAL(38,0)) AS total
  FROM pv
), thresh AS (
  SELECT c.x, c.cb, c.rev_below, t.n, t.total,
         t.n - CAST(CEIL(CAST(t.n AS DOUBLE) / 5.0E0) AS BIGINT) AS k_bot
  FROM c CROSS JOIN tot t
  WHERE c.cb < t.n - CAST(CEIL(CAST(t.n AS DOUBLE) / 5.0E0) AS BIGINT)
    AND t.n - CAST(CEIL(CAST(t.n AS DOUBLE) / 5.0E0) AS BIGINT) <= c.cb + (
      SELECT p.cnt FROM pv p WHERE p.x = c.x)
)
SELECT n, n - k_bot AS top_customers,
  CAST(total - (rev_below + CAST(k_bot - cb AS DECIMAL(38,0)) * x)
       AS DOUBLE) / CAST(total AS DOUBLE) AS top20_revenue_share
FROM thresh
"""


@query("agg_pareto_top20_share", _PARETO_ORACLE)
def agg_pareto_top20_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20% revenue concentration (oracle above); the Spark side
    computes BOTH ascending cumulatives (count and exact-decimal
    revenue) with the bucketed two-phase prefix over distinct cents —
    no task sorts more than one value bucket."""
    from pyspark.sql import Window

    load_tables(spark, sf_dir)
    pv = (
        spark.sql(f"SELECT * FROM ({_PARETO_SRC})")
        .groupBy(F.col("cents").alias("x"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    bounds = pv.agg(
        F.min(F.col("x").cast("double")).alias("vmin"),
        F.max(F.col("x").cast("double")).alias("vmax"),
    )
    b = pv.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket",
        F.expr("width_bucket(CAST(x AS DOUBLE), vmin, vmax + 1.0d, 1024)"),
    )
    w_bkt = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        b.groupBy("bucket")
        .agg(
            F.sum("cnt").alias("bn"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * cnt")).alias("br"),
        )
        .select(
            "bucket",
            F.coalesce(F.sum("bn").over(w_bkt), F.lit(0)).alias("off_n"),
            F.coalesce(
                F.sum("br").over(w_bkt),
                F.expr("CAST(0 AS DECIMAL(38,0))"),
            ).alias("off_r"),
        )
    )
    w_in = Window.partitionBy("bucket").orderBy("x")
    c = b.join(F.broadcast(offs), "bucket").select(
        "x",
        "cnt",
        (F.col("off_n") + F.sum("cnt").over(w_in) - F.col("cnt")).alias("cb"),
        (
            F.col("off_r")
            + F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * cnt")).over(w_in)
            - F.expr("CAST(x AS DECIMAL(38,0)) * cnt")
        ).alias("rev_below"),
    )
    tot = pv.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * cnt")).alias("total"),
    )
    th = (
        c.crossJoin(F.broadcast(tot))
        .withColumn(
            "k_bot",
            F.expr(
                "n - CAST(CEIL(CAST(n AS DOUBLE) / 5.0E0) AS BIGINT)"
            ),
        )
        .filter("cb < k_bot AND k_bot <= cb + cnt")
    )
    return th.selectExpr(
        "n",
        "n - k_bot AS top_customers",
        "CAST(total - (rev_below + CAST(k_bot - cb AS DECIMAL(38,0)) * x)"
        " AS DOUBLE) / CAST(total AS DOUBLE) AS top20_revenue_share",
    )


# --- linear-interpolation resample (round 11) ----------------------------------

# the time-series gap-filler beyond forward-fill: per event type, a
# dense day spine with missing days LINEARLY interpolated between the
# neighboring observed days. Integer day numbers and counts; the
# interpolation is one rational double expression (identical operand
# doubles both engines). Leading/trailing gaps (no neighbor on one
# side) are excluded. Windows are type-partitioned; the spine is
# calendar-bounded.
_INTERP_TEMPLATE = """
WITH daily AS (
  SELECT event_type, {DAYNUM} AS dn, CAST(COUNT(*) AS BIGINT) AS v
  FROM events GROUP BY event_type, {DAYNUM}
), bounds AS (
  SELECT event_type, MIN(dn) AS mn, MAX(dn) AS mx
  FROM daily GROUP BY event_type
), spine AS (
  SELECT event_type, {SERIES} AS dn FROM bounds
), joined AS (
  SELECT s.event_type, s.dn, d.v
  FROM spine s LEFT JOIN daily d
    ON s.event_type = d.event_type AND s.dn = d.dn
), marked AS (
  SELECT event_type, dn, v,
    {PREV_D} AS prev_dn,
    {PREV_V} AS prev_v,
    {NEXT_D} AS next_dn,
    {NEXT_V} AS next_v
  FROM joined
)
SELECT event_type, CAST(dn AS BIGINT) AS dn,
  CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
       ELSE CAST(prev_v AS DOUBLE)
            + (CAST(next_v AS DOUBLE) - CAST(prev_v AS DOUBLE))
              * (CAST(dn - prev_dn AS DOUBLE)
                 / CAST(next_dn - prev_dn AS DOUBLE))
  END AS value,
  CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS INT) AS interpolated
FROM marked
WHERE v IS NOT NULL OR (prev_v IS NOT NULL AND next_v IS NOT NULL)
ORDER BY event_type, dn
"""

_W_PREC = (
    "OVER (PARTITION BY event_type ORDER BY dn "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)
_W_FOLL = (
    "OVER (PARTITION BY event_type ORDER BY dn "
    "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
)


def _interp_sql(engine: str) -> str:
    def agg(fn, expr, window):
        if engine == "spark":
            return f"{fn}({expr}) IGNORE NULLS {window}"
        return f"{fn}({expr} IGNORE NULLS) {window}"

    d_expr = "CASE WHEN v IS NOT NULL THEN dn END"
    v_expr = "CASE WHEN v IS NOT NULL THEN v END"
    s = (
        _INTERP_TEMPLATE.replace(
            "{PREV_D}", agg("last_value", d_expr, _W_PREC)
        )
        .replace("{PREV_V}", agg("last_value", v_expr, _W_PREC))
        .replace("{NEXT_D}", agg("first_value", d_expr, _W_FOLL))
        .replace("{NEXT_V}", agg("first_value", v_expr, _W_FOLL))
    )
    if engine == "spark":
        return s.replace(
            "{DAYNUM}", "datediff(CAST(ts AS DATE), DATE '2020-01-01')"
        ).replace("{SERIES}", "explode(sequence(mn, mx))")
    return s.replace(
        "{DAYNUM}", "datediff('day', DATE '2020-01-01', CAST(ts AS DATE))"
    ).replace("{SERIES}", "unnest(generate_series(mn, mx))")


sql_query(
    "events_linear_interpolate",
    _interp_sql("spark"),
    oracle=_interp_sql("duck"),
)


# --- population stability index (round 11) -------------------------------------

# THE drift metric an ML-data pipeline runs between a reference window
# and a current window: PSI = Σ_bins (p−q)·ln(p/q). Reference = first
# half of the event calendar, current = second half (split at the
# midpoint day, an exact integer comparison); 10 integer-width score
# bins over the global range (the calibration-bins machinery);
# Laplace +1 smoothing keeps every bin positive. Ten LN terms fold in
# sorted order and the index ROUNDs to 9 decimals (the libm posture).
# One scan, one hash aggregate on (bin, half) — map-combinable.
_PSI_SQL_TEMPLATE = """
WITH s AS (
  SELECT CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS score,
         {DAYNUM} AS dn
  FROM events
), meta AS (
  SELECT CAST(MIN(score) AS BIGINT) AS lo, CAST(MAX(score) AS BIGINT) AS hi,
         CAST(MIN(dn) + (MAX(dn) - MIN(dn)) {IDIV} 2 AS BIGINT) AS mid
  FROM s
), binned AS (
  SELECT LEAST(CAST((score - lo) * 10 {IDIV} (hi - lo + 1) AS BIGINT), 9)
           AS bin,
         CASE WHEN dn <= mid THEN 0 ELSE 1 END AS half
  FROM s CROSS JOIN meta
), cells AS (
  SELECT bin,
    CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_ref,
    CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_cur
  FROM binned GROUP BY bin
), tot AS (
  SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
         CAST(SUM(n_cur) AS BIGINT) AS t_cur
  FROM cells
), terms AS (
  SELECT
    (CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE)
     - CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE))
    * LN((CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE))
         / (CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE))) AS term
  FROM cells CROSS JOIN tot
)
SELECT CAST(10 AS BIGINT) AS n_bins, ROUND({FOLD}, 9) AS psi
FROM terms
"""


def _psi_sql(engine: str) -> str:
    s = _PSI_SQL_TEMPLATE
    if engine == "spark":
        return (
            s.replace(
                "{DAYNUM}", "datediff(CAST(ts AS DATE), DATE '2020-01-01')"
            )
            .replace("{IDIV}", "DIV")
            .replace(
                "{FOLD}",
                "reduce(array_sort(collect_list(term)),"
                " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
            )
        )
    return (
        s.replace(
            "{DAYNUM}", "datediff('day', DATE '2020-01-01', CAST(ts AS DATE))"
        )
        .replace("{IDIV}", "//")
        .replace(
            "{FOLD}", "list_reduce(list_sort(list(term)), (a, x) -> a + x)"
        )
    )


sql_query(
    "quality_psi_value_drift", _psi_sql("spark"), oracle=_psi_sql("duck")
)


# --- maximum drawdown of the daily revenue series (round 11) -------------------

# the finance/monitoring classic: deepest peak-to-trough fall of the
# day-ordered cumulative-revenue-free series (daily revenue in exact
# integer cents; running peak via a calendar-bounded day window — the
# documented bounded-input posture; drawdown ratios are divisions of
# exact integers, and MAX over doubles is a comparison, not a sum, so
# no fold ordering matters).
_DRAWDOWN_TEMPLATE = """
WITH daily AS (
  SELECT {DAYNUM} AS dn,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                  AS DECIMAL(38,0))) AS BIGINT) AS cents
  FROM orders GROUP BY {DAYNUM}
), peaks AS (
  SELECT dn, cents,
    MAX(cents) OVER (ORDER BY dn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS peak
  FROM daily
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_days,
  MAX(CAST(peak - cents AS DOUBLE) / CAST(peak AS DOUBLE))
    AS max_drawdown
FROM peaks
"""

sql_query(
    "window_max_drawdown",
    _DRAWDOWN_TEMPLATE.replace(
        "{DAYNUM}", "datediff(o_orderdate, DATE '1990-01-01')"
    ),
    oracle=_DRAWDOWN_TEMPLATE.replace(
        "{DAYNUM}", "datediff('day', DATE '1990-01-01', o_orderdate)"
    ),
)


# --- Mann-Kendall trend test (round 11) ----------------------------------------

# the standard non-parametric monotone-trend test for a monitoring
# series: S = Σ_{i<j} sign(x_j − x_i) over the day-ordered daily
# revenue, with the tie-corrected variance and continuity-corrected z.
# Exact integers end to end: revenue in cents, S and the tie term are
# bigint sums over the bounded day×day self-join (calendar² pairs —
# ~3M at any SF, distributed; DAYS are bounded, rows are not), one
# double formula at the end. ROUND(,9) on z for the sqrt libm ulp.
_MK_TEMPLATE = """
WITH daily AS (
  SELECT {DAYNUM} AS dn,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                  AS DECIMAL(38,0))) AS BIGINT) AS cents
  FROM orders GROUP BY {DAYNUM}
), s AS (
  SELECT
    CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                  WHEN b.cents < a.cents THEN -1 ELSE 0 END)
         AS BIGINT) AS s_stat,
    CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM daily a JOIN daily b ON b.dn > a.dn
), ties AS (
  SELECT CAST(COALESCE(SUM(m * (m - 1) * (2 * m + 5)), 0) AS BIGINT)
           AS tie_term
  FROM (
    SELECT CAST(COUNT(*) AS BIGINT) AS m FROM daily GROUP BY cents
  ) g WHERE m > 1
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily
)
SELECT n_days, s_stat,
  ROUND(
    (CAST(s_stat AS DOUBLE)
     - CAST(CASE WHEN s_stat > 0 THEN 1
                 WHEN s_stat < 0 THEN -1 ELSE 0 END AS DOUBLE))
    / SQRT((CAST(n_days AS DOUBLE) * CAST(n_days - 1 AS DOUBLE)
            * CAST(2 * n_days + 5 AS DOUBLE)
            - CAST(tie_term AS DOUBLE)) / 18.0E0),
    9) AS mk_z
FROM s CROSS JOIN ties CROSS JOIN n
"""

sql_query(
    "stat_mann_kendall_trend",
    _MK_TEMPLATE.replace(
        "{DAYNUM}", "datediff(o_orderdate, DATE '1990-01-01')"
    ),
    oracle=_MK_TEMPLATE.replace(
        "{DAYNUM}", "datediff('day', DATE '1990-01-01', o_orderdate)"
    ),
)


# --- MAD robust outlier days (round 11) -----------------------------------------

# the robust companion to z-score monitoring: flag days whose count
# sits more than 5 median-absolute-deviations from the median. Medians
# are exact-rational midpoints over the bounded day series (integer
# inputs; both engines interpolate (a+b)/2 on even counts — identical
# doubles); no means, no stddev, so one wild day cannot mask itself.
_MAD_TEMPLATE = """
WITH daily AS (
  SELECT {DAYNUM} AS dn, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY {DAYNUM}
), med AS (
  SELECT {MEDIAN_X} AS m FROM daily
), mad AS (
  SELECT {MEDIAN_DEV} AS mad_v FROM daily CROSS JOIN med
)
SELECT dn, x,
  ABS(CAST(x AS DOUBLE) - m) / mad_v AS robust_score
FROM daily CROSS JOIN med CROSS JOIN mad
WHERE ABS(CAST(x AS DOUBLE) - m) > 5.0E0 * mad_v
ORDER BY dn
"""


def _mad_sql(engine: str) -> str:
    if engine == "spark":
        return (
            _MAD_TEMPLATE.replace(
                "{DAYNUM}", "datediff(CAST(ts AS DATE), DATE '2020-01-01')"
            )
            .replace("{MEDIAN_X}", "percentile(x, 0.5E0)")
            .replace(
                "{MEDIAN_DEV}",
                "percentile(ABS(CAST(x AS DOUBLE) - m), 0.5E0)",
            )
        )
    return (
        _MAD_TEMPLATE.replace(
            "{DAYNUM}", "datediff('day', DATE '2020-01-01', CAST(ts AS DATE))"
        )
        .replace("{MEDIAN_X}", "median(x)")
        .replace("{MEDIAN_DEV}", "median(ABS(CAST(x AS DOUBLE) - m))")
    )


sql_query(
    "events_anomaly_mad_days", _mad_sql("spark"), oracle=_mad_sql("duck")
)


# --- Lorenz curve deciles (round 11) --------------------------------------------

# the distribution table behind the Gini number: cumulative revenue
# share at each population decile (customers ordered by spend). Exact
# integers end to end: the k-th decile boundary locates its threshold
# run via cumulative counts (the pareto machinery, applied 10×) — here
# expressed once as a JOIN between decile targets and the
# distinct-value cumulative table. Output: 10 rows (decile,
# cum_customers, cum_revenue_share).
_LORENZ_TEMPLATE = f"""
WITH spend AS ({_PARETO_SRC}),
pv AS (
  SELECT cents AS x, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM spend GROUP BY cents
), c AS (
  SELECT x, cnt,
    COALESCE(SUM(cnt) OVER (
      ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
    COALESCE(SUM(CAST(x AS DECIMAL(38,0)) * cnt) OVER (
      ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      CAST(0 AS DECIMAL(38,0))) AS rev_below
  FROM pv
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * cnt) AS DECIMAL(38,0)) AS total
  FROM pv
), deciles AS (
  SELECT d, CAST(FLOOR(CAST(d AS DOUBLE) * CAST(t.n AS DOUBLE) / 10.0E0)
                 AS BIGINT) AS k, t.n, t.total
  FROM ({{DECADE}}) dd CROSS JOIN tot t
)
SELECT d.d AS decile, d.k AS cum_customers,
  CAST(c.rev_below + CAST(d.k - c.cb AS DECIMAL(38,0)) * c.x AS DOUBLE)
    / CAST(d.total AS DOUBLE) AS cum_revenue_share
FROM deciles d JOIN c ON c.cb < d.k AND d.k <= c.cb + c.cnt
ORDER BY d.d
"""

sql_query(
    "agg_lorenz_curve_deciles",
    _LORENZ_TEMPLATE.replace(
        "{DECADE}", "SELECT explode(sequence(1, 10)) AS d"
    ),
    oracle=_LORENZ_TEMPLATE.replace(
        "{DECADE}", "SELECT unnest(generate_series(1, 10)) AS d"
    ),
)


# ---------------------------------------------------------------------------
# round 12: classifier operating-point + concentration + co-movement
# ---------------------------------------------------------------------------
# ml_f1_best_threshold / ml_lift_at_decile complete the threshold-sweep
# family around AUC/PR-AUC: every statistic is a rational of exact
# bigint counts (F1 = 2·TP/(PP+P) — the precision/recall harmonic mean
# collapses to ONE division), so argmax and per-decile values are
# deterministic across engines. The Spark sides reuse the bucketed
# two-phase prefix (no task sorts more than one score bucket — the
# PR-AUC/AUC posture); the oracles use DuckDB's plain windows.


def _score_threshold_counts(spark):
    """Per distinct score: (score, n_v, p_v, cb, cpb) + totals via the
    bucketed two-phase prefix — cb/cpb = rows/positives STRICTLY BELOW
    the score, so TP(t)=n_pos−cpb and PP(t)=n_all−cb for threshold t."""
    from pyspark.sql import Window

    s = spark.sql(f"SELECT * FROM ({_AUC_SRC})")
    pv = s.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("n_v"),
        F.sum("label").cast("long").alias("p_v"),
    )
    bounds = s.agg(
        F.min(F.col("score").cast("double")).alias("vmin"),
        F.max(F.col("score").cast("double")).alias("vmax"),
    )
    b = pv.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket",
        F.expr("width_bucket(CAST(score AS DOUBLE), vmin, vmax + 1.0d, 1024)"),
    )
    w_bkt = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        b.groupBy("bucket")
        .agg(F.sum("n_v").alias("bn"), F.sum("p_v").alias("bp"))
        .select(
            "bucket",
            F.coalesce(F.sum("bn").over(w_bkt), F.lit(0)).alias("off_n"),
            F.coalesce(F.sum("bp").over(w_bkt), F.lit(0)).alias("off_p"),
        )
    )
    w_in = Window.partitionBy("bucket").orderBy("score")
    c = b.join(F.broadcast(offs), "bucket").select(
        "score",
        "n_v",
        "p_v",
        (F.col("off_n") + F.sum("n_v").over(w_in) - F.col("n_v")).alias("cb"),
        (F.col("off_p") + F.sum("p_v").over(w_in) - F.col("p_v")).alias("cpb"),
    )
    tot = pv.agg(
        F.sum("n_v").cast("long").alias("n_all"),
        F.sum("p_v").cast("long").alias("n_pos"),
    )
    return c, tot


@query(
    "ml_f1_best_threshold",
    f"""
WITH s AS ({_AUC_SRC}),
pv AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS n_v,
         CAST(SUM(label) AS BIGINT) AS p_v
  FROM s GROUP BY score
), c AS (
  SELECT score, n_v, p_v,
    COALESCE(SUM(n_v) OVER (
      ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
    COALESCE(SUM(p_v) OVER (
      ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cpb
  FROM pv
), tot AS (
  SELECT CAST(SUM(n_v) AS BIGINT) AS n_all, CAST(SUM(p_v) AS BIGINT) AS n_pos
  FROM pv
), f AS (
  SELECT score,
         CAST(n_pos - cpb AS BIGINT) AS tp,
         CAST(n_all - cb AS BIGINT) AS pp,
         CAST(2 * (n_pos - cpb) AS DOUBLE)
           / CAST((n_all - cb) + n_pos AS DOUBLE) AS f1
  FROM c CROSS JOIN tot
)
SELECT score AS best_threshold, tp, pp, ROUND(f1, 9) AS best_f1
FROM f ORDER BY f1 DESC, score ASC LIMIT 1
""",
)
def ml_f1_best_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-F1 operating point over every distinct score threshold
    (predict positive when score >= t). F1 collapses to 2·TP/(PP+P) —
    one division of exact bigints — so the argmax is deterministic;
    tie-break is the LOWEST threshold (most recall at equal F1)."""
    load_tables(spark, sf_dir)
    c, tot = _score_threshold_counts(spark)
    f = c.crossJoin(F.broadcast(tot)).select(
        "score",
        (F.col("n_pos") - F.col("cpb")).cast("long").alias("tp"),
        (F.col("n_all") - F.col("cb")).cast("long").alias("pp"),
        (
            (2 * (F.col("n_pos") - F.col("cpb"))).cast("double")
            / ((F.col("n_all") - F.col("cb")) + F.col("n_pos")).cast("double")
        ).alias("f1"),
    )
    return (
        f.orderBy(F.desc("f1"), F.asc("score"))
        .limit(1)
        .select(
            F.col("score").alias("best_threshold"),
            "tp",
            "pp",
            F.round("f1", 9).alias("best_f1"),
        )
    )


_LIFT_TEMPLATE = f"""
WITH s AS ({_AUC_SRC}),
pv AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS n_v,
         CAST(SUM(label) AS BIGINT) AS p_v
  FROM s GROUP BY score
), c AS (
  SELECT score, n_v, p_v,
    COALESCE(SUM(n_v) OVER (
      ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
    COALESCE(SUM(p_v) OVER (
      ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cpb
  FROM pv
), tot AS (
  SELECT CAST(SUM(n_v) AS BIGINT) AS n_all, CAST(SUM(p_v) AS BIGINT) AS n_pos
  FROM pv
), targets AS (
  SELECT d, CAST(FLOOR((CAST(d AS DOUBLE) * CAST(t.n_all AS DOUBLE) + 9.0E0)
                       / 10.0E0) AS BIGINT) AS m, t.n_all, t.n_pos
  FROM ({{DECADE}}) dd CROSS JOIN tot t
)
SELECT g.d AS decile, c.score AS threshold,
  CAST(g.n_all - c.cb AS BIGINT) AS pp,
  CAST(g.n_pos - c.cpb AS BIGINT) AS tp,
  ROUND(CAST((g.n_pos - c.cpb) * g.n_all AS DOUBLE)
        / CAST((g.n_all - c.cb) * g.n_pos AS DOUBLE), 9) AS lift,
  ROUND(CAST(g.n_pos - c.cpb AS DOUBLE) / CAST(g.n_pos AS DOUBLE), 9)
    AS capture_rate
FROM targets g
JOIN c ON (g.n_all - c.cb) >= g.m AND (g.n_all - c.cb - c.n_v) < g.m
ORDER BY g.d
"""


@query(
    "ml_lift_at_decile",
    _LIFT_TEMPLATE.replace(
        "{DECADE}", "SELECT unnest(generate_series(1, 10)) AS d"
    ),
)
def ml_lift_at_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gain/lift table at count deciles: for decile d the threshold is
    the smallest score whose predicted-positive population covers
    ceil(d·n/10) rows (exact threshold-run location — ties take the
    whole run, deterministically); lift = (TP·n)/(PP·P), a single
    division of exact bigint products. The Spark side walks the same
    bucketed two-phase prefix as AUC/PR-AUC."""
    load_tables(spark, sf_dir)
    c, tot = _score_threshold_counts(spark)
    targets = (
        spark.sql("SELECT explode(sequence(1, 10)) AS d")
        .crossJoin(F.broadcast(tot))
        .select(
            "d",
            F.floor(
                (F.col("d").cast("double") * F.col("n_all").cast("double") + 9.0)
                / 10.0
            ).cast("long").alias("m"),
            "n_all",
            "n_pos",
        )
    )
    j = targets.join(
        F.broadcast(c),
        ((F.col("n_all") - F.col("cb")) >= F.col("m"))
        & ((F.col("n_all") - F.col("cb") - F.col("n_v")) < F.col("m")),
    )
    return j.select(
        F.col("d").alias("decile"),
        F.col("score").alias("threshold"),
        (F.col("n_all") - F.col("cb")).cast("long").alias("pp"),
        (F.col("n_pos") - F.col("cpb")).cast("long").alias("tp"),
        F.round(
            ((F.col("n_pos") - F.col("cpb")) * F.col("n_all")).cast("double")
            / ((F.col("n_all") - F.col("cb")) * F.col("n_pos")).cast("double"),
            9,
        ).alias("lift"),
        F.round(
            (F.col("n_pos") - F.col("cpb")).cast("double")
            / F.col("n_pos").cast("double"),
            9,
        ).alias("capture_rate"),
    ).orderBy("decile")


# Herfindahl-Hirschman concentration of customer revenue within each
# nation — completes the concentration family (Gini, Pareto share,
# Lorenz, Theil). Exact: per-customer cents are bigints, squares and
# totals accumulate in DECIMAL, one double division at the end. 100 TB:
# two hash aggregates (orders→customer, customer→nation), no windows.
sql_query(
    "agg_hhi_concentration",
    """
WITH cust AS (
  SELECT c_nationkey AS nation, o_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS DECIMAL(18,0)) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey, o_custkey
), per AS (
  SELECT nation,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(cents) AS DECIMAL(38,0)) AS total,
         CAST(SUM(CAST(cents AS DECIMAL(18,0)) * CAST(cents AS DECIMAL(18,0)))
              AS DECIMAL(38,0)) AS ss
  FROM cust GROUP BY nation
)
SELECT nation, n_customers,
       ROUND(CAST(ss AS DOUBLE)
             / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) * 10000.0E0,
             9) AS hhi_x10000
FROM per ORDER BY nation
""",
)

# 30-day rolling Pearson correlation between daily order count and
# daily revenue — the co-movement window the forecast family lacked.
# Every windowed sum is DECIMAL-exact (counts and cents are integers);
# the variance/covariance terms subtract in DECIMAL and only the final
# correlate divides in double (sqrt is IEEE-correctly-rounded, so the
# 9-decimal round is engine-stable). The daily collapse is bounded
# (~2.4k days at any sf), so the RANGE-interval window is the
# house-approved bounded-series shape; identical SQL text both engines.
# Squared terms multiply at DECIMAL(19,0): below 19 digits DuckDB does
# the multiply in int64 storage and overflows on ~1e9 cents values.
sql_query(
    "window_rolling_corr_30d",
    """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
), w AS (
  SELECT day,
    CAST(COUNT(*) OVER win AS DECIMAL(4,0)) AS n,
    CAST(SUM(CAST(x AS DECIMAL(14,0))) OVER win AS DECIMAL(14,0)) AS sx,
    CAST(SUM(CAST(y AS DECIMAL(17,0))) OVER win AS DECIMAL(17,0)) AS sy,
    CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) OVER win
         AS DECIMAL(30,0)) AS sxx,
    CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) OVER win
         AS DECIMAL(36,0)) AS syy,
    CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) OVER win
         AS DECIMAL(33,0)) AS sxy
  FROM d
  WINDOW win AS (ORDER BY day
                 RANGE BETWEEN INTERVAL '29' DAY PRECEDING AND CURRENT ROW)
), v AS (
  SELECT day, n,
    n * sxy - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS cov_num,
    n * sxx - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)) AS vx,
    n * syy - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS vy
  FROM w
)
SELECT day, CAST(n AS INT) AS n_days,
  ROUND(CAST(cov_num AS DOUBLE)
        / SQRT(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)), 9) AS corr_30d
FROM v
WHERE n >= 10 AND vx > 0 AND vy > 0
ORDER BY day
""",
)

# 2x2 funnel association: does clicking associate with purchasing, per
# user? Exact cell counts, odds ratio = ad/bc (one bigint-ratio
# division). The chi-square twin tests independence; the odds ratio is
# the effect SIZE. 100 TB: one user-keyed hash aggregate + one 1-row
# fold.
sql_query(
    "events_odds_ratio_click_purchase",
    """
WITH u AS (
  SELECT user_id,
    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased
  FROM events GROUP BY user_id
), cell AS (
  SELECT
    CAST(SUM(clicked * purchased) AS BIGINT) AS a,
    CAST(SUM(clicked * (1 - purchased)) AS BIGINT) AS b,
    CAST(SUM((1 - clicked) * purchased) AS BIGINT) AS c,
    CAST(SUM((1 - clicked) * (1 - purchased)) AS BIGINT) AS d
  FROM u
)
SELECT a, b, c, d,
  ROUND(CAST(a * d AS DOUBLE) / NULLIF(CAST(b * c AS DOUBLE), 0.0E0), 9)
    AS odds_ratio
FROM cell
""",
)
