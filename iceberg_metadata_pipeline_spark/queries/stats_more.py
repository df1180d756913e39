"""Round-12 continuation: survival-analysis tests and robust estimators.

Completes the survival family started by ``stat_kaplan_meier_churn`` /
``stat_nelson_aalen_hazard`` (stats_ext.py) with the two analyses a real
churn study runs NEXT — the two-group log-rank test and the restricted
mean survival time — plus Fisher's exact test (the small-cell companion
to ``stat_chi_square_independence``) and the Hodges-Lehmann estimator
(the robust companion to ``stat_mann_whitney_u``).

Determinism posture (see queries/__init__ docstring): all row-scale work
is integer counting; every cross-event-time double SUM folds in sorted
order on both engines (``reduce(array_sort(collect_list(..)))`` vs
``list_reduce(list_sort(list(..)))``); libm-backed terms (ln/exp in the
Fisher tail) round to 9 digits at the boundary, validated value-identical
at sf0.001/0.01/0.1 before landing.

Reference parity: the reference (danguyenn/Iceberg-Metadata-Pipeline)
delegates analytics to stock Spark SQL (entrypoint-spark.sh deploys a
thriftserver any SQL runs through); these queries are part of the
analytics surface a user of that deployment expresses over the same
tables.
"""

from __future__ import annotations

from iceberg_metadata_pipeline_spark.queries import sql_query

# ---------------------------------------------------------------------------
# Two-group log-rank test over time-to-first-purchase
# ---------------------------------------------------------------------------
#
# Duration = days from a user's first event to their first PURCHASE
# (the conversion event); users who never purchase are right-censored at
# last activity. Groups are user_id parity (deterministic, balanced).
# The 7-day-inactivity churn framing of stat_kaplan_meier_churn is
# degenerate on the 30-day fixture window (every user stays active), so
# the TEST queries run on the conversion clock, where the fixture has a
# real duration distribution (median 1 day, max ~10).
# Per event time t: d (pooled conversions), n/n1 (pooled / group-1 at
# risk via integer prefix sums over the O(days) risk table);
# E1 = d*n1/n and the hypergeometric variance fold as SORTED double sums;
# chi2 = (O1 - sum E1)^2 / sum V. 100 TB shape: one user-keyed hash
# aggregate, one per-day aggregate, windows over O(days) rows — constant
# in table size. The variance term multiplies four at-risk-scale counts
# in DOUBLE: exact below 2^53 (covered up to ~90k users at risk) and
# still bit-identical across engines above it (same IEEE product order
# spelled with the same expression text).
_SURV_OBS = """
WITH pu AS (
  SELECT user_id, MIN(ts) AS t0, MAX(ts) AS t1,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
  FROM events GROUP BY user_id
), obs AS (
  SELECT {DATEDIFF} AS dur,
         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev,
         CAST(user_id % 2 AS BIGINT) AS g1
  FROM pu
)"""

_LOGRANK_TEMPLATE = _SURV_OBS + """, tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
         CAST(SUM(g1) AS BIGINT) AS n1_all
  FROM obs
), risk AS (
  SELECT dur AS t,
         CAST(SUM(ev) AS BIGINT) AS d,
         CAST(SUM(ev * g1) AS BIGINT) AS d1,
         CAST(COUNT(*) AS BIGINT) AS leaving,
         CAST(SUM(g1) AS BIGINT) AS leaving1
  FROM obs GROUP BY dur
), at_risk AS (
  SELECT t, d, d1,
         n_all - COALESCE(SUM(leaving) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS nr,
         n1_all - COALESCE(SUM(leaving1) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS nr1
  FROM risk CROSS JOIN tot
), terms AS (
  SELECT
    d1,
    CAST(d * nr1 AS DOUBLE) / CAST(nr AS DOUBLE) AS e1,
    CASE WHEN nr > 1 THEN
      (CAST(d AS DOUBLE) * CAST(nr1 AS DOUBLE)
       * CAST(nr - nr1 AS DOUBLE) * CAST(nr - d AS DOUBLE))
      / (CAST(nr AS DOUBLE) * CAST(nr AS DOUBLE) * CAST(nr - 1 AS DOUBLE))
    ELSE 0.0E0 END AS v
  FROM at_risk WHERE d > 0
)
SELECT
  CAST(SUM(d1) AS BIGINT) AS o1,
  ROUND({FOLD_E1}, 9) AS e1_sum,
  ROUND({FOLD_V}, 9) AS var_sum,
  ROUND(
    (CAST(SUM(d1) AS DOUBLE) - {FOLD_E1}) *
    (CAST(SUM(d1) AS DOUBLE) - {FOLD_E1}) / NULLIF({FOLD_V}, 0.0E0),
    9) AS logrank_chi2
FROM terms
HAVING COUNT(1) > 0
"""

_DD_SPARK = "datediff(CAST(COALESCE(tp, t1) AS DATE), CAST(t0 AS DATE))"
_DD_DUCK = "datediff('day', CAST(t0 AS DATE), CAST(COALESCE(tp, t1) AS DATE))"

sql_query(
    "stat_logrank_test",
    _LOGRANK_TEMPLATE.format(
        DATEDIFF=_DD_SPARK,
        FOLD_E1="reduce(array_sort(collect_list(e1)), CAST(0.0E0 AS DOUBLE),"
                " (acc, x) -> acc + x)",
        FOLD_V="reduce(array_sort(collect_list(v)), CAST(0.0E0 AS DOUBLE),"
               " (acc, x) -> acc + x)",
    ),
    oracle=_LOGRANK_TEMPLATE.format(
        DATEDIFF=_DD_DUCK,
        FOLD_E1="list_reduce(list_sort(list(e1)), (acc, x) -> acc + x)",
        FOLD_V="list_reduce(list_sort(list(v)), (acc, x) -> acc + x)",
    ),
)


# ---------------------------------------------------------------------------
# Restricted mean survival time (RMST) at a 7-day horizon
# ---------------------------------------------------------------------------
#
# RMST(tau) = integral of the KM time-to-first-purchase curve over
# [0, tau] — the mean days-to-conversion capped at a week: the KM fact
# table (same integer risk/prefix machinery as stat_kaplan_meier),
# survival at each event time as the SORTED product fold, a t=0/S=1
# sentinel ONLY when no event falls at t=0 (same-day converters drop S
# immediately — the sentinel must not mask that drop), LEAD() for
# interval ends clipped to tau, and the step-area sum
# S(t_i)*(t_{i+1}-t_i) folded in sorted order. Work after the per-user
# collapse is O(distinct days); the t x t factor join is bounded by the
# observation window, constant in table size.
_RMST_TEMPLATE = _SURV_OBS + """, tot AS (
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
  SELECT t, 1.0E0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f
  FROM at_risk WHERE d > 0
), surv AS (
  SELECT a.t AS t, {FOLD_PROD} AS s
  FROM fact a JOIN fact b ON b.t <= a.t
  GROUP BY a.t
), spine AS (
  SELECT CAST(0 AS BIGINT) AS t, CAST(1.0E0 AS DOUBLE) AS s
  FROM (SELECT 1 AS one) sentinel
  WHERE NOT EXISTS (SELECT 1 FROM surv WHERE surv.t = 0)
  UNION ALL
  SELECT CAST(t AS BIGINT) AS t, s FROM surv
), iv AS (
  SELECT t, s,
         LEAD(t) OVER (ORDER BY t) AS t_next
  FROM spine
), contrib AS (
  SELECT s * CAST(LEAST(COALESCE(t_next, 7), 7) - t AS DOUBLE) AS area
  FROM iv WHERE t < 7
)
SELECT CAST(7 AS BIGINT) AS horizon_days,
       ROUND({FOLD_SUM}, 9) AS rmst_days
FROM contrib
"""

sql_query(
    "stat_rmst_first_purchase",
    _RMST_TEMPLATE.format(
        DATEDIFF=_DD_SPARK,
        FOLD_PROD="reduce(array_sort(collect_list(b.f)), CAST(1.0E0 AS DOUBLE),"
                  " (acc, x) -> acc * x)",
        FOLD_SUM="reduce(array_sort(collect_list(area)), CAST(0.0E0 AS DOUBLE),"
                 " (acc, x) -> acc + x)",
    ),
    oracle=_RMST_TEMPLATE.format(
        DATEDIFF=_DD_DUCK,
        FOLD_PROD="list_reduce(list_sort(list(b.f)), (acc, x) -> acc * x)",
        FOLD_SUM="list_reduce(list_sort(list(area)), (acc, x) -> acc + x)",
    ),
)


# ---------------------------------------------------------------------------
# Fisher's exact test (one-sided) on the click x purchase 2x2
# ---------------------------------------------------------------------------
#
# The small-cell companion to stat_chi_square_independence and the
# p-value companion to events_odds_ratio_click_purchase, at USER-DAY
# granularity (per-user flags are degenerate on the fixture — every
# user does everything across the 30-day window; day cells carry a real
# 2x2). One hash aggregate to the four cells, then the exact
# hypergeometric upper tail P[X >= a] = sum_k C(r1,k)C(r2,c1-k)/C(n,c1)
# for k = a..min(r1,c1).
#
# Plan shape: a 0..n integer spine carries ln-factorials as ONE
# EXACT-DECIMAL prefix sum (decimal window sums are order-independent,
# so engine-internal summation order — Spark incremental vs DuckDB
# segment tree — cannot diverge); each tail term then equi-joins the
# spine at its nine lf arguments, and the tail folds in sorted k order.
# Work is O(n + tail) with n = #units, NOT O(n * tail) as per-term
# folds would be. The only cross-engine freedom left is libm ln/exp
# (1-ulp class), absorbed by rounding the p-value to 6 digits —
# validated value-identical at all three fixture scales.
#
# Scale note: an O(#units) spine is the exact test's own applicability
# bound — Fisher is the SMALL-sample test (a 2x2 with millions of units
# calls for stat_chi_square_independence instead), so the spine stays
# bounded wherever the test itself is statistically meaningful.
_FISHER_TEMPLATE = """
WITH u AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), cell AS (
  SELECT
    CAST(SUM(clicked * purchased) AS BIGINT) AS a,
    CAST(SUM(clicked * (1 - purchased)) AS BIGINT) AS b,
    CAST(SUM((1 - clicked) * purchased) AS BIGINT) AS c,
    CAST(SUM((1 - clicked) * (1 - purchased)) AS BIGINT) AS d
  FROM u
), m AS (
  SELECT a, b, c, d,
         a + b AS r1, c + d AS r2, a + c AS c1, a + b + c + d AS n
  FROM cell
), spine AS (
  {SPINE_BODY}
), lft AS (
  SELECT i,
    SUM(CASE WHEN i = 0 THEN CAST(0.0E0 AS DECIMAL(38,18))
             ELSE CAST(LN(i) AS DECIMAL(38,18)) END)
      OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS lf
  FROM spine
), ks AS (
  {KS_BODY}
), p AS (
  SELECT ks.a, ks.b, ks.c, ks.d, ks.k,
    EXP(CAST(
      (f1.lf - f2.lf - f3.lf) + (f4.lf - f5.lf - f6.lf)
      - (f7.lf - f8.lf - f9.lf)
    AS DOUBLE)) AS pk
  FROM ks
  JOIN lft f1 ON f1.i = ks.r1
  JOIN lft f2 ON f2.i = ks.k
  JOIN lft f3 ON f3.i = ks.r1 - ks.k
  JOIN lft f4 ON f4.i = ks.r2
  JOIN lft f5 ON f5.i = ks.c1 - ks.k
  JOIN lft f6 ON f6.i = ks.r2 - ks.c1 + ks.k
  JOIN lft f7 ON f7.i = ks.n
  JOIN lft f8 ON f8.i = ks.c1
  JOIN lft f9 ON f9.i = ks.n - ks.c1
)
SELECT a, b, c, d,
  ROUND({FOLD_TAIL}, 6) AS p_one_sided
FROM p
GROUP BY a, b, c, d
"""


def _fisher_sql(dialect: str) -> str:
    if dialect == "spark":
        spine_body = "SELECT explode(sequence(0, n)) AS i FROM m"
        ks_body = (
            "SELECT m.*, k FROM m"
            " LATERAL VIEW explode(sequence(a, LEAST(r1, c1))) _ks AS k"
        )
        fold = (
            "reduce(array_sort(collect_list(named_struct('k', k, 'pk', pk))),"
            " CAST(0.0E0 AS DOUBLE), (acc, s) -> acc + s.pk)"
        )
    else:
        spine_body = "SELECT UNNEST(range(0, n + 1)) AS i FROM m"
        ks_body = (
            "SELECT m.*, UNNEST(range(a, LEAST(r1, c1) + 1)) AS k FROM m"
        )
        fold = (
            "list_reduce(list_transform(list_sort(list({'k': k, 'pk': pk})),"
            " s -> s.pk), (acc, x) -> acc + x)"
        )
    return _FISHER_TEMPLATE.format(
        SPINE_BODY=spine_body, KS_BODY=ks_body, FOLD_TAIL=fold
    )


sql_query(
    "stat_fisher_exact_onesided",
    _fisher_sql("spark"),
    oracle=_fisher_sql("duck"),
)


# ---------------------------------------------------------------------------
# Hodges-Lehmann estimator over daily order revenue
# ---------------------------------------------------------------------------
#
# The robust location companion to stat_mann_whitney_u: the median of all
# Walsh averages (y_i + y_j)/2, i <= j, over the O(days) daily-revenue
# collapse. Revenue sums in exact cents (bigint); the pair stage is the
# collapse-then-pair shape (days^2 pairs — bounded by the date range,
# constant in table size); the median over pair SUMS uses the distinct-
# value prefix-sum trick (no global row rank). Both middle ranks resolve
# in pure integer comparisons (2*cw >= m is exactly rank ceil(m/2);
# 2*cw > m is exactly rank floor(m/2)+1) — the ONLY doubles are the
# final /4 (Walsh halving + even-rank averaging) and /100 (cents).
_HL_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
), pairs AS (
  SELECT d1.y + d2.y AS s, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM daily d1 JOIN daily d2 ON d1.day <= d2.day
  GROUP BY d1.y + d2.y
), c AS (
  SELECT s, cnt,
         SUM(cnt) OVER (ORDER BY s) AS cw,
         SUM(cnt) OVER () AS m
  FROM pairs
), med AS (
  SELECT
    MIN(CASE WHEN 2 * cw >= m THEN s END) AS s_lo,
    MIN(CASE WHEN 2 * cw > m THEN s END) AS s_hi,
    MIN(m) AS m
  FROM c
)
SELECT CAST(m AS BIGINT) AS n_pairs,
  CAST(s_lo + s_hi AS DOUBLE) / 4.0E0 / 100.0E0 AS hodges_lehmann
FROM med
"""

sql_query("stat_hodges_lehmann_daily", _HL_SQL)
