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

from iceberg_metadata_pipeline_spark.queries import query, sql_query

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


# ===========================================================================
# Round-12 continuation, batch 2: retrieval-eval completion + classical
# tests the existing families point at (same determinism posture).
# ===========================================================================


def _fold(engine: str, term: str) -> str:
    """Sorted double fold — order-independent, bit-identical (see the
    logrank/Fisher folds above)."""
    if engine == "spark":
        return (
            f"reduce(array_sort(collect_list({term})),"
            " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)"
        )
    return f"list_reduce(list_sort(list({term})), (a, x) -> a + x)"


# ---------------------------------------------------------------------------
# MAP@10 — mean-average-precision, the third leg of the retrieval-eval
# trio next to ml_ndcg_at_10 / ml_mrr_recall_at_10 (same source, same
# md5 rank tiebreak). AP@10 = sum over hit ranks k<=10 of P@k, divided
# by min(n_rel, 10). P@k = cum_hits/k is rational with k | 2520
# (lcm 1..10), so the whole AP numerator folds as ONE integer
# (cum_hits * 2520/k summed), and the only double is the final
# division — exact, no fold ordering to pin. User-partitioned windows,
# per-user output rows: the 100 TB shape.
# ---------------------------------------------------------------------------
_NDCG_SRC = """
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS score,
         CASE WHEN event_type = 'purchase' THEN 2
              WHEN event_type IN ('click', 'view') THEN 1
              ELSE 0 END AS rel,
         md5(CAST(event_id AS STRING)) AS tb
  FROM events
"""

_MAP_TEMPLATE = f"""
WITH s AS ({_NDCG_SRC}),
ranked AS (
  SELECT user_id, CASE WHEN rel > 0 THEN 1 ELSE 0 END AS hit,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY score DESC, tb) AS rnk
  FROM s
), pfx AS (
  SELECT user_id, hit, rnk,
    SUM(hit) OVER (PARTITION BY user_id ORDER BY rnk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cum_hits
  FROM ranked
), per_user AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN rnk <= 10 AND hit = 1
             THEN cum_hits * (2520 {{IDIV}} rnk) ELSE 0 END)
         AS BIGINT) AS ap_num,
    CAST(SUM(hit) AS BIGINT) AS n_rel
  FROM pfx GROUP BY user_id
)
SELECT user_id, n_rel,
  CAST(ap_num AS DOUBLE)
    / (2520.0E0 * CAST(LEAST(n_rel, 10) AS DOUBLE)) AS ap_at_10
FROM per_user WHERE n_rel > 0 ORDER BY user_id
"""

sql_query(
    "ml_map_at_10",
    _MAP_TEMPLATE.replace("{IDIV}", "DIV"),
    oracle=_MAP_TEMPLATE.replace("{IDIV}", "//"),
)


# ---------------------------------------------------------------------------
# Expected calibration error — the scalar on top of ml_calibration_bins
# (same 10 equal-integer-width bins over the exact micro-unit score).
# Per bin b: |acc_b - conf_b| * n_b/N = |pos_b*d - s_b| / (d*N) with
# d = score range width and s_b the bin's integer score sum — the whole
# ECE numerator is ONE integer SUM of ABS terms; the only double is the
# final division. One hash aggregate at any scale.
# ---------------------------------------------------------------------------
_AUC_SRC = """
  SELECT CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events
"""

_ECE_TEMPLATE = f"""
WITH s AS ({_AUC_SRC}),
b AS (
  SELECT CAST(MIN(score) AS BIGINT) AS lo, CAST(MAX(score) AS BIGINT) AS hi
  FROM s
), binned AS (
  SELECT LEAST(CAST((score - lo) * 10 {{IDIV}} (hi - lo + 1) AS BIGINT), 9)
           AS bin,
         label, score - lo AS sc, hi - lo + 1 AS d
  FROM s CROSS JOIN b
), per_bin AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(label) AS BIGINT) AS pos_b,
         CAST(SUM(sc) AS BIGINT) AS s_b,
         CAST(MIN(d) AS BIGINT) AS d
  FROM binned GROUP BY bin
)
SELECT CAST(SUM(n_b) AS BIGINT) AS n,
  CAST(COUNT(*) AS BIGINT) AS n_bins,
  CAST(SUM(ABS(pos_b * d - s_b)) AS DOUBLE)
    / (CAST(MIN(d) AS DOUBLE) * CAST(SUM(n_b) AS DOUBLE)) AS ece
FROM per_bin
"""

sql_query(
    "ml_expected_calibration_error",
    _ECE_TEMPLATE.replace("{IDIV}", "DIV"),
    oracle=_ECE_TEMPLATE.replace("{IDIV}", "//"),
)


# ---------------------------------------------------------------------------
# Cochran-Armitage trend test — dose-response on proportions across
# ORDERED exposure groups (active-day buckets <=24/25-26/27-28/29+,
# matched to the fixture's 21-30-day activity spread, scores
# 1..4) vs DAY-ONE conversion (purchased on the first active day —
# every fixture user eventually does everything over 30 days, so
# any ever-did-X response is degenerate). z = (N*sr - R*sn) / sqrt(R(N-R)(N*s2n-sn^2)/N)
# — every term left of the sqrt is an integer aggregate; sqrt is IEEE
# exactly-rounded and the division's operands are identical doubles, so
# the result is bit-identical with NO rounding step. One user-keyed
# hash aggregate then a 4-row collapse: constant-size at any scale.
# ---------------------------------------------------------------------------
_CA_TREND_SQL = """
WITH u AS (
  SELECT user_id,
    COUNT(DISTINCT CAST(ts AS DATE)) AS days,
    CASE WHEN CAST(MIN(CASE WHEN event_type = 'purchase' THEN ts END)
              AS DATE) = CAST(MIN(ts) AS DATE)
         THEN 1 ELSE 0 END AS resp
  FROM events GROUP BY user_id
), g AS (
  SELECT CASE WHEN days <= 24 THEN 1 WHEN days <= 26 THEN 2
              WHEN days <= 28 THEN 3 ELSE 4 END AS s,
         resp
  FROM u
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(resp) AS BIGINT) AS r,
    CAST(SUM(s) AS BIGINT) AS sn,
    CAST(SUM(s * resp) AS BIGINT) AS sr,
    CAST(SUM(s * s) AS BIGINT) AS s2n
  FROM g
)
SELECT n, r,
  CAST(n * sr - r * sn AS DOUBLE)
    / NULLIF(SQRT(CAST(r AS DOUBLE) * CAST(n - r AS DOUBLE)
                  * CAST(n * s2n - sn * sn AS DOUBLE)
                  / CAST(n AS DOUBLE)), 0.0E0) AS z_trend
FROM agg
"""

sql_query("stat_cochran_armitage_trend", _CA_TREND_SQL)


# ---------------------------------------------------------------------------
# Mood's median test — the nonparametric k-group location test the
# Kruskal-Wallis family points at: per-region above/at-or-below counts
# against the GLOBAL median of order revenue (exact cents), chi-square
# over the 2xk table. The global median uses the distinct-value
# prefix-sum trick (no global row rank — O(distinct cents) window);
# cells are integer counts; each cell's (O-E)^2/E is a double of
# identical integer-derived operands and the 2k-term chi2 folds sorted.
# ---------------------------------------------------------------------------
_MOOD_TEMPLATE = """
WITH v AS (
  SELECT r.r_name AS grp,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
), dv AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY x
), c AS (
  SELECT x, SUM(cnt) OVER (ORDER BY x) AS cw, SUM(cnt) OVER () AS m
  FROM dv
), med AS (
  SELECT MIN(CASE WHEN 2 * cw >= m THEN x END) AS med FROM c
), cells AS (
  SELECT grp,
    CAST(SUM(CASE WHEN x > med THEN 1 ELSE 0 END) AS BIGINT) AS above,
    CAST(SUM(CASE WHEN x <= med THEN 1 ELSE 0 END) AS BIGINT) AS below
  FROM v CROSS JOIN med GROUP BY grp
), tot AS (
  SELECT CAST(SUM(above) AS BIGINT) AS ta,
         CAST(SUM(below) AS BIGINT) AS tb,
         CAST(SUM(above + below) AS BIGINT) AS n
  FROM cells
), terms AS (
  SELECT grp,
    (CAST(above AS DOUBLE)
       - CAST(above + below AS DOUBLE) * CAST(ta AS DOUBLE)
         / CAST(n AS DOUBLE))
    * (CAST(above AS DOUBLE)
       - CAST(above + below AS DOUBLE) * CAST(ta AS DOUBLE)
         / CAST(n AS DOUBLE))
    / (CAST(above + below AS DOUBLE) * CAST(ta AS DOUBLE)
       / CAST(n AS DOUBLE))
    + (CAST(below AS DOUBLE)
       - CAST(above + below AS DOUBLE) * CAST(tb AS DOUBLE)
         / CAST(n AS DOUBLE))
    * (CAST(below AS DOUBLE)
       - CAST(above + below AS DOUBLE) * CAST(tb AS DOUBLE)
         / CAST(n AS DOUBLE))
    / (CAST(above + below AS DOUBLE) * CAST(tb AS DOUBLE)
       / CAST(n AS DOUBLE)) AS term
  FROM cells CROSS JOIN tot
)
SELECT CAST(COUNT(*) AS BIGINT) - 1 AS df,
  {FOLD} AS chi2_mood
FROM terms
"""

sql_query(
    "stat_moods_median",
    _MOOD_TEMPLATE.replace("{FOLD}", _fold("spark", "term")),
    oracle=_MOOD_TEMPLATE.replace("{FOLD}", _fold("duck", "term")),
)


# ---------------------------------------------------------------------------
# Cronbach's alpha — internal-consistency over the user x event-type
# count matrix (the five fixture event types as "items"). Population
# variances clear denominators: alpha = k/(k-1) * (1 - sum_i(n*q_i -
# s_i^2) / (n*q_t - s_t^2)) — every numerator is an integer aggregate;
# ONE double division at the end. One user-keyed hash aggregate.
# ---------------------------------------------------------------------------
def _cron_items() -> str:
    types = ["view", "click", "purchase", "signup", "error"]
    cols = ",\n    ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS x{i + 1}"
        for i, t in enumerate(types)
    )
    return cols


_CRONBACH_SQL = f"""
WITH x AS (
  SELECT user_id,
    {_cron_items()}
  FROM events GROUP BY user_id
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x1 * x1) AS BIGINT) AS q1,
    CAST(SUM(x2) AS BIGINT) AS s2, CAST(SUM(x2 * x2) AS BIGINT) AS q2,
    CAST(SUM(x3) AS BIGINT) AS s3, CAST(SUM(x3 * x3) AS BIGINT) AS q3,
    CAST(SUM(x4) AS BIGINT) AS s4, CAST(SUM(x4 * x4) AS BIGINT) AS q4,
    CAST(SUM(x5) AS BIGINT) AS s5, CAST(SUM(x5 * x5) AS BIGINT) AS q5,
    CAST(SUM(x1 + x2 + x3 + x4 + x5) AS BIGINT) AS st,
    CAST(SUM((x1 + x2 + x3 + x4 + x5) * (x1 + x2 + x3 + x4 + x5))
         AS BIGINT) AS qt
  FROM x
)
SELECT n,
  (5.0E0 / 4.0E0)
    * (1.0E0
       - CAST((n * q1 - s1 * s1) + (n * q2 - s2 * s2) + (n * q3 - s3 * s3)
              + (n * q4 - s4 * s4) + (n * q5 - s5 * s5) AS DOUBLE)
         / CAST(n * qt - st * st AS DOUBLE)) AS cronbach_alpha
FROM agg
"""

sql_query("stat_cronbach_alpha", _CRONBACH_SQL)


# ---------------------------------------------------------------------------
# Cross-correlation function — daily view volume vs purchase volume at
# lags 0..7 (does view traffic LEAD purchases?). Pearson r per lag with
# every moment an integer aggregate over the O(days) daily collapse;
# sqrt is exactly-rounded, the division's operands identical doubles —
# bit-identical, no rounding step. The lag spine joins the collapse to
# itself shifted: O(days * lags) rows total, constant in table size.
# ---------------------------------------------------------------------------
_CCF_TEMPLATE = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         AS BIGINT) AS x,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS BIGINT) AS y
  FROM events GROUP BY CAST(ts AS DATE)
), lags AS (
  {LAGS}
), p AS (
  SELECT l.lag, d1.x AS x, d2.y AS y
  FROM lags l
  JOIN d d1 ON 1 = 1
  JOIN d d2 ON d2.day = {DATEADD}
), a AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
    CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM p GROUP BY lag
)
SELECT lag, n,
  CAST(n * sxy - sx * sy AS DOUBLE)
    / NULLIF(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE)), 0.0E0)
    AS ccf_view_to_purchase
FROM a ORDER BY lag
"""

sql_query(
    "stat_ccf_view_purchase",
    _CCF_TEMPLATE.replace(
        "{LAGS}", "SELECT explode(sequence(0, 7)) AS lag"
    ).replace("{DATEADD}", "date_add(d1.day, CAST(l.lag AS INT))"),
    oracle=_CCF_TEMPLATE.replace(
        "{LAGS}", "SELECT UNNEST(range(0, 8)) AS lag"
    ).replace("{DATEADD}", "d1.day + CAST(l.lag AS INT)"),
)


# ---------------------------------------------------------------------------
# Partial autocorrelation (Yule-Walker, lags 1..3) — the model-order
# diagnostic next to stat_acf_multi_lag, on the daily total-event
# series. Autocorrelations clear denominators into pure integers:
# rho_k = (n_k^2*sxy_k - n_k*S(A_k+B_k)... reduced to the standard
# estimator with the GLOBAL mean: num_k*n^2 and den*n^2 both expand to
# integer aggregates; then the Durbin-Levinson closed forms
# phi_11 = r1, phi_22 = (r2-r1^2)/(1-r1^2),
# phi_33 = (r3 - p21*r2 - p22*r1)/(1 - p21*r1 - p22*r2) with
# p21 = r1*(1-p22) are double expressions of the two integer ratios —
# identical text, identical doubles. Day-indexed self-joins over the
# O(days) collapse.
# ---------------------------------------------------------------------------
_PACF_SQL = """
WITH d0 AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY CAST(ts AS DATE)
), d AS (
  SELECT ROW_NUMBER() OVER (ORDER BY day) AS i, x FROM d0
), base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(x * x) AS BIGINT) AS q
  FROM d
), lagk AS (
  SELECT k,
    CAST(SUM(a.x * b.x) AS BIGINT) AS sxy,
    CAST(SUM(a.x) AS BIGINT) AS ha,
    CAST(SUM(b.x) AS BIGINT) AS hb,
    CAST(COUNT(*) AS BIGINT) AS nk
  FROM (SELECT 1 AS k UNION ALL SELECT 2 UNION ALL SELECT 3) ks
  JOIN d a ON 1 = 1
  JOIN d b ON b.i = a.i + ks.k
  GROUP BY k
), rho AS (
  SELECT k,
    CAST(n * n * sxy - n * s * (ha + hb) + (n - k) * s * s AS DOUBLE)
      / CAST(n * n * q - n * s * s AS DOUBLE) AS r
  FROM lagk CROSS JOIN base
), w AS (
  SELECT
    MIN(CASE WHEN k = 1 THEN r END) AS r1,
    MIN(CASE WHEN k = 2 THEN r END) AS r2,
    MIN(CASE WHEN k = 3 THEN r END) AS r3
  FROM rho
)
SELECT r1, r2, r3,
  r1 AS pacf_1,
  (r2 - r1 * r1) / (1.0E0 - r1 * r1) AS pacf_2,
  (r3 - (r1 * (1.0E0 - (r2 - r1 * r1) / (1.0E0 - r1 * r1))) * r2
      - ((r2 - r1 * r1) / (1.0E0 - r1 * r1)) * r1)
    / (1.0E0 - (r1 * (1.0E0 - (r2 - r1 * r1) / (1.0E0 - r1 * r1))) * r1
             - ((r2 - r1 * r1) / (1.0E0 - r1 * r1)) * r2) AS pacf_3
FROM w
"""

sql_query("stat_pacf_yule_walker", _PACF_SQL)


# ---------------------------------------------------------------------------
# Tukey HSD pairwise table — the post-hoc step after stat_anova_f_oneway:
# all region pairs' mean revenue differences studentized by
# sqrt(MSW/2 * (1/n_i + 1/n_j)). Group sums stay integer cents; sums of
# squares accumulate in DECIMAL(38,0) (x*x overflows bigint at sf0.1)
# and convert once — decimal->double conversion is correctly rounded in
# both engines (the repo-wide decimal-accumulate posture). Per-group
# SS fold sorted (k=5 doubles); the pair table is k(k-1)/2 rows off a
# 5-row collapse.
# ---------------------------------------------------------------------------
_TUKEY_TEMPLATE = """
WITH v AS (
  SELECT r.r_name AS grp,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
), g AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_g,
    CAST(SUM(x) AS BIGINT) AS s_g,
    CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(38,0)) AS q_g
  FROM v GROUP BY grp
), ss AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n_all,
    CAST(COUNT(*) AS BIGINT) AS k,
    {FOLD} AS ssw
  FROM g
), msw AS (
  SELECT n_all, k, ssw / CAST(n_all - k AS DOUBLE) AS msw FROM ss
)
SELECT a.grp AS grp_a, b.grp AS grp_b,
  a.n_g AS n_a, b.n_g AS n_b,
  ABS(CAST(a.s_g AS DOUBLE) / CAST(a.n_g AS DOUBLE)
      - CAST(b.s_g AS DOUBLE) / CAST(b.n_g AS DOUBLE)) / 100.0E0
    AS mean_diff,
  ABS(CAST(a.s_g AS DOUBLE) / CAST(a.n_g AS DOUBLE)
      - CAST(b.s_g AS DOUBLE) / CAST(b.n_g AS DOUBLE))
    / SQRT(msw / 2.0E0
           * (1.0E0 / CAST(a.n_g AS DOUBLE)
              + 1.0E0 / CAST(b.n_g AS DOUBLE))) AS q_stat
FROM g a JOIN g b ON a.grp < b.grp CROSS JOIN msw
ORDER BY grp_a, grp_b
"""

_TUKEY_SS_TERM = (
    "CAST(q_g AS DOUBLE)"
    " - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE)"
)

sql_query(
    "stat_tukey_hsd_pairs",
    _TUKEY_TEMPLATE.replace("{FOLD}", _fold("spark", _TUKEY_SS_TERM)),
    oracle=_TUKEY_TEMPLATE.replace("{FOLD}", _fold("duck", _TUKEY_SS_TERM)),
)


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra — the ORDERED-alternative k-group test next to
# stat_kruskal_wallis (is daily revenue monotone in order priority?).
# JT = sum over group pairs i<j of Mann-Whitney U(i,j); each pair's U
# comes from the distinct-value prefix trick over the pair's POOLED
# values (PARTITION BY pair — no global rank), doubled to stay integer
# under the tie-half convention: 2U = sum_v cj(v)*(2*ci_less(v)+ci(v)).
# Null mean/variance are closed forms of the group sizes; the only
# doubles are the final sqrt (exactly rounded) and division. Work:
# O(pairs * days) rows windowed — bounded by the date range.
# ---------------------------------------------------------------------------
_JT_SQL = """
WITH d AS (
  SELECT o_orderpriority AS grp,
         CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS x
  FROM orders GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)
), grps AS (
  SELECT DISTINCT grp FROM d
), pairs AS (
  SELECT a.grp AS gi, b.grp AS gj FROM grps a JOIN grps b ON a.grp < b.grp
), pooled AS (
  SELECT p.gi, p.gj, d.grp, d.x
  FROM pairs p JOIN d ON d.grp = p.gi OR d.grp = p.gj
), dv AS (
  SELECT gi, gj, x,
    CAST(SUM(CASE WHEN grp = gi THEN 1 ELSE 0 END) AS BIGINT) AS ci,
    CAST(SUM(CASE WHEN grp = gj THEN 1 ELSE 0 END) AS BIGINT) AS cj
  FROM pooled GROUP BY gi, gj, x
), c AS (
  SELECT gi, gj, ci, cj,
    COALESCE(SUM(ci) OVER (PARTITION BY gi, gj ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS ci_less
  FROM dv
), jt AS (
  SELECT CAST(SUM(cj * (2 * ci_less + ci)) AS BIGINT) AS jt2 FROM c
), sizes AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_g, grp FROM d GROUP BY grp
), moments AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
    CAST(SUM(n_g * n_g) AS BIGINT) AS sn2,
    CAST(SUM(n_g * n_g * (2 * n_g + 3)) AS BIGINT) AS sn23
  FROM sizes
)
SELECT jt2 {IDIV} 2 AS jt_stat, n,
  CAST(jt2 - (n * n - sn2) {IDIV} 2 AS DOUBLE)
    / (2.0E0 * SQRT(CAST(n * n * (2 * n + 3) - sn23 AS DOUBLE) / 72.0E0))
    AS z_jt
FROM jt CROSS JOIN moments
"""

sql_query(
    "stat_jonckheere_terpstra",
    _JT_SQL.replace("{IDIV}", "DIV"),
    oracle=_JT_SQL.replace("{IDIV}", "//"),
)


# ---------------------------------------------------------------------------
# Welch's ANOVA — the unequal-variance completion of stat_anova_f_oneway
# (which assumes homoscedasticity; Brown-Forsythe tests the variances,
# Welch fixes the test). Region groups over order revenue cents; group
# moments are integer/decimal-exact; the weighted mean and the two
# cross-group sums fold SORTED (k=5 doubles each). F* = A/B and the
# Welch-Satterthwaite df2 ride out as one row.
# ---------------------------------------------------------------------------
_WELCH_TEMPLATE = """
WITH v AS (
  SELECT r.r_name AS grp,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
), g AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_g,
    CAST(SUM(x) AS BIGINT) AS s_g,
    CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(38,0)) AS q_g
  FROM v GROUP BY grp
), w AS (
  SELECT grp, n_g,
    CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS m_g,
    CAST(n_g AS DOUBLE)
      / ((CAST(q_g AS DOUBLE)
          - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE))
         / CAST(n_g - 1 AS DOUBLE)) AS w_g
  FROM g
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
    {FOLD_W} AS w_sum,
    {FOLD_WM} AS wm_sum
  FROM w
), terms AS (
  SELECT w.grp, w.n_g, w.w_g, w.m_g, tot.k, tot.w_sum,
    w.w_g * (w.m_g - tot.wm_sum / tot.w_sum)
          * (w.m_g - tot.wm_sum / tot.w_sum) AS a_term,
    (1.0E0 - w.w_g / tot.w_sum) * (1.0E0 - w.w_g / tot.w_sum)
      / CAST(w.n_g - 1 AS DOUBLE) AS l_term
  FROM w CROSS JOIN tot
), folded AS (
  SELECT MIN(k) AS k,
    {FOLD_A} AS a_sum,
    {FOLD_L} AS lam
  FROM terms
)
SELECT k,
  (a_sum / CAST(k - 1 AS DOUBLE))
    / (1.0E0 + (2.0E0 * CAST(k - 2 AS DOUBLE)
                / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0E0)) * lam)
    AS f_welch,
  (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0E0) / (3.0E0 * lam) AS df2
FROM folded
"""

sql_query(
    "stat_welch_anova",
    _WELCH_TEMPLATE.replace("{FOLD_W}", _fold("spark", "w_g"))
    .replace("{FOLD_WM}", _fold("spark", "w_g * m_g"))
    .replace("{FOLD_A}", _fold("spark", "a_term"))
    .replace("{FOLD_L}", _fold("spark", "l_term")),
    oracle=_WELCH_TEMPLATE.replace("{FOLD_W}", _fold("duck", "w_g"))
    .replace("{FOLD_WM}", _fold("duck", "w_g * m_g"))
    .replace("{FOLD_A}", _fold("duck", "a_term"))
    .replace("{FOLD_L}", _fold("duck", "l_term")),
)


# ---------------------------------------------------------------------------
# Moran's I — spatial autocorrelation of per-nation spend under a
# same-region contiguity weight matrix (w_ij = 1 iff i != j share a
# region): do high-spend nations cluster within regions? Denominators
# clear completely: with S = sum x_i, Q = sum x_i^2, and per-region
# sums s_r = sum_{i in r} x_i, q_r = sum_{i in r} x_i^2,
#   num*n^2 = n^2*sum_r(s_r^2 - q_r) - 2nS*sum_r(n_r-1)s_r
#             + S^2*sum_r n_r(n_r-1)
#   den*n^2 = n*(n*Q - S^2)  and  I = (n/W)*num/den with
#   W = sum_r n_r(n_r-1) — every term an integer aggregate (cents),
# ONE double division at the end. Two tiny hash aggregates (nations,
# regions); constant-size at any table size.
# ---------------------------------------------------------------------------
_MORAN_SQL = """
WITH x AS (
  SELECT n.n_nationkey AS nk, r.r_regionkey AS rk,
         CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                  AS BIGINT)) AS BIGINT) AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY n.n_nationkey, r.r_regionkey
), reg AS (
  SELECT rk, CAST(COUNT(*) AS BIGINT) AS n_r,
         CAST(SUM(v) AS BIGINT) AS s_r,
         CAST(SUM(CAST(v AS DECIMAL(19,0)) * v) AS DECIMAL(38,0)) AS q_r
  FROM x GROUP BY rk
), tot AS (
  SELECT CAST(SUM(n_r) AS BIGINT) AS n,
    CAST(SUM(s_r) AS BIGINT) AS s,
    CAST(SUM(q_r) AS DECIMAL(38,0)) AS q,
    CAST(SUM(n_r * (n_r - 1)) AS BIGINT) AS w,
    CAST(SUM(CAST(s_r AS DECIMAL(19,0)) * s_r - q_r) AS DECIMAL(38,0))
      AS cross_r,
    CAST(SUM((n_r - 1) * s_r) AS BIGINT) AS ws,
    CAST(SUM(n_r * (n_r - 1)) AS BIGINT) AS nn1
  FROM reg
)
SELECT n, w AS w_pairs,
  (CAST(n AS DOUBLE) / CAST(w AS DOUBLE))
    * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(cross_r AS DOUBLE)
       - 2.0E0 * CAST(n AS DOUBLE) * CAST(s AS DOUBLE) * CAST(ws AS DOUBLE)
       + CAST(s AS DOUBLE) * CAST(s AS DOUBLE) * CAST(nn1 AS DOUBLE))
    / (CAST(n AS DOUBLE)
       * (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))) AS morans_i
FROM tot
"""

sql_query("geo_morans_i_region_spend", _MORAN_SQL)


# ---------------------------------------------------------------------------
# KS score-separation statistic — the credit-scoring companion to
# ml_auc_roc_exact: max over thresholds of |TPR - FPR|, i.e. the KS
# distance between the positive and negative score distributions.
# Per distinct score the candidate is ONE integer
# |cum_pos*N_neg - cum_neg*N_pos|; the max and its threshold are
# integer argmax (ties -> smallest score) — the only double is the
# final division. Spark computes the cumulative counts with the
# bucketed two-phase prefix (no unpartitioned window); the DuckDB
# oracle uses a plain window over distinct scores.
# ---------------------------------------------------------------------------
_KS_ORACLE = f"""
WITH s AS ({{SRC}}),
pv AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS n_v,
         CAST(SUM(label) AS BIGINT) AS p_v
  FROM s GROUP BY score
), c AS (
  SELECT score,
    SUM(n_v) OVER (ORDER BY score) AS cum_n,
    SUM(p_v) OVER (ORDER BY score) AS cum_p
  FROM pv
), tot AS (
  SELECT CAST(SUM(n_v) AS BIGINT) AS n_all,
         CAST(SUM(p_v) AS BIGINT) AS n_pos
  FROM pv
), k AS (
  SELECT score, n_pos, n_all,
    ABS(cum_p * (n_all - n_pos) - (cum_n - cum_p) * n_pos) AS num
  FROM c CROSS JOIN tot
), m AS (
  SELECT n_pos, n_all, MAX(num) AS mx FROM k GROUP BY n_pos, n_all
)
SELECT m.n_pos, m.n_all - m.n_pos AS n_neg,
  CAST(m.mx AS DOUBLE)
    / (CAST(m.n_pos AS DOUBLE) * CAST(m.n_all - m.n_pos AS DOUBLE)) AS ks,
  CAST(MIN(CASE WHEN k.num = m.mx THEN k.score END) AS BIGINT)
    AS ks_threshold
FROM m JOIN k ON k.n_pos = m.n_pos
GROUP BY m.n_pos, m.n_all, m.mx
"""


@query("ml_ks_statistic", _KS_ORACLE.replace("{SRC}", _AUC_SRC))
def ml_ks_statistic(spark, sf_dir):
    """Spark side of the KS statistic: cumulative pos/neg counts per
    distinct score via the bucketed two-phase prefix (the
    ml_pr_auc_exact shape — no task sorts more than one score bucket),
    then an integer argmax."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from iceberg_metadata_pipeline_spark.session import load_tables

    load_tables(spark, sf_dir)
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
        (F.col("off_n") + F.sum("n_v").over(w_in)).alias("cum_n"),
        (F.col("off_p") + F.sum("p_v").over(w_in)).alias("cum_p"),
    )
    tot = pv.agg(
        F.sum("n_v").cast("long").alias("n_all"),
        F.sum("p_v").cast("long").alias("n_pos"),
    )
    k = c.crossJoin(F.broadcast(tot)).selectExpr(
        "score", "n_pos", "n_all",
        "ABS(cum_p * (n_all - n_pos) - (cum_n - cum_p) * n_pos) AS num",
    )
    m = k.groupBy("n_pos", "n_all").agg(F.max("num").alias("mx"))
    return (
        k.join(F.broadcast(m), ["n_pos", "n_all"])
        .groupBy("n_pos", "n_all", "mx")
        .agg(
            F.min(
                F.when(F.col("num") == F.col("mx"), F.col("score"))
            ).cast("long").alias("ks_threshold")
        )
        .selectExpr(
            "n_pos",
            "n_all - n_pos AS n_neg",
            "CAST(mx AS DOUBLE) / (CAST(n_pos AS DOUBLE)"
            " * CAST(n_all - n_pos AS DOUBLE)) AS ks",
            "ks_threshold",
        )
    )


# ---------------------------------------------------------------------------
# Per-state dwell time — the duration companion to
# events_markov_transitions: how long does a user sit in each event
# state before the NEXT event? LEAD over user-partitioned windows
# (the 100 TB shape); durations in exact epoch MICROS (both engines'
# integer epoch extraction), one hash aggregate; the average is one
# division of integers.
# ---------------------------------------------------------------------------
_DWELL_TEMPLATE = """
WITH e AS (
  SELECT user_id, event_type, ts,
    LEAD(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT event_type,
  CAST(COUNT(nxt) AS BIGINT) AS n_followed,
  CAST(SUM(CASE WHEN nxt IS NOT NULL
           THEN {EUS_NXT} - {EUS_TS} END) AS BIGINT)
    AS total_dwell_us,
  CAST(SUM(CASE WHEN nxt IS NOT NULL
           THEN {EUS_NXT} - {EUS_TS} END) AS DOUBLE)
    / 1000000.0E0 / CAST(COUNT(nxt) AS DOUBLE) AS avg_dwell_s
FROM e GROUP BY event_type ORDER BY event_type
"""

sql_query(
    "events_dwell_time_by_state",
    # ts is TIMESTAMP_NTZ in the restored fixture view; the session tz
    # is pinned UTC so the cast is value-preserving
    _DWELL_TEMPLATE.replace(
        "{EUS_NXT}", "unix_micros(CAST(nxt AS TIMESTAMP))"
    ).replace("{EUS_TS}", "unix_micros(CAST(ts AS TIMESTAMP))"),
    oracle=_DWELL_TEMPLATE.replace("{EUS_NXT}", "epoch_us(nxt)").replace(
        "{EUS_TS}", "epoch_us(ts)"
    ),
)


# ---------------------------------------------------------------------------
# Page's trend test — the ordered-alternative REPEATED-MEASURES test
# next to stat_friedman_test (blocks = days, treatments = the five
# event types under their declared alphabetical ordering, measure =
# that day's event count). Within-block midranks double to stay
# integer (2*mid = 2*rank_min + cnt_eq - 1 via one block-partitioned
# window + an equality count); blocks missing a treatment are dropped
# (complete-block design); L2 = sum s_j * 2mid is ONE integer
# aggregate; null moments are closed forms of (b, k); ties-uncorrected
# variance, documented. O(days x types) rows end to end.
# ---------------------------------------------------------------------------
_PAGE_SQL = """
WITH cell0 AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM events GROUP BY CAST(ts AS DATE), event_type
), cell AS (
  -- Page's test assumes COMPLETE blocks: keep only days observing all
  -- five treatments (incomplete days would silently shrink k)
  SELECT day, event_type, v FROM cell0
  WHERE day IN (
    SELECT day FROM cell0 GROUP BY day
    HAVING COUNT(DISTINCT event_type) = 5
  )
), ranked AS (
  SELECT day, event_type, v,
    RANK() OVER (PARTITION BY day ORDER BY v) AS rmin,
    CAST(COUNT(*) OVER (PARTITION BY day, v) AS BIGINT) AS ceq
  FROM cell
), scored AS (
  SELECT day,
    CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
         WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4 ELSE 5 END AS s,
    2 * rmin + ceq - 1 AS mid2
  FROM ranked
), agg AS (
  SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS b,
    CAST(MAX(s) AS BIGINT) AS k,
    CAST(SUM(s * mid2) AS BIGINT) AS l2
  FROM scored
)
SELECT b, k, l2 {IDIV} 2 AS page_l,
  CAST(l2 - b * k * (k + 1) * (k + 1) {IDIV} 2 AS DOUBLE)
    / (2.0E0 * SQRT(
        CAST(b AS DOUBLE)
        * CAST((k * k * k - k) AS DOUBLE) * CAST((k * k * k - k) AS DOUBLE)
        / (144.0E0 * CAST(k - 1 AS DOUBLE)))) AS z_page
FROM agg
"""

sql_query(
    "stat_page_trend",
    _PAGE_SQL.replace("{IDIV}", "DIV"),
    oracle=_PAGE_SQL.replace("{IDIV}", "//"),
)


# ---------------------------------------------------------------------------
# Cuzick's trend test — Wilcoxon-type trend across ORDERED groups
# (priority 1..5 scores over the daily-revenue collapse): GLOBAL
# midranks via the distinct-value prefix trick (no row-level rank),
# doubled to stay integer; T2 = sum l * 2mid, E[T2] = (N+1) * sum(n*l),
# Var(T) = (N+1)/12 * (N*sum(n*l^2) - (sum(n*l))^2) — ties-uncorrected,
# documented (exact-cents ties are measure-zero). O(days x groups).
# ---------------------------------------------------------------------------
_CUZICK_SQL = """
WITH d AS (
  SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS l,
         CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS x
  FROM orders GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)
), dv AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(l) AS BIGINT) AS lsum
  FROM d GROUP BY x
), c AS (
  SELECT x, cnt, lsum,
    COALESCE(SUM(cnt) OVER (ORDER BY x
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM dv
), t AS (
  SELECT CAST(SUM(lsum * (2 * below + cnt + 1)) AS BIGINT) AS t2 FROM c
), g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(l) AS BIGINT) AS nl,
    CAST(SUM(l * l) AS BIGINT) AS nl2
  FROM d
)
SELECT n, t2 {IDIV} 2 AS t_cuzick,
  CAST(t2 - (n + 1) * nl AS DOUBLE)
    / (2.0E0 * SQRT(CAST(n + 1 AS DOUBLE) / 12.0E0
                    * CAST(n * nl2 - nl * nl AS DOUBLE))) AS z_cuzick
FROM t CROSS JOIN g
"""

sql_query(
    "stat_cuzick_trend",
    _CUZICK_SQL.replace("{IDIV}", "DIV"),
    oracle=_CUZICK_SQL.replace("{IDIV}", "//"),
)
