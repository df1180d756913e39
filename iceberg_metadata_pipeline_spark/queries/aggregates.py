"""Aggregation surface (SURVEY.md §2.B aggregations).

The reference's one non-default agg choice — ObjectHashAggregate disabled
(entrypoint-spark.sh:113) — is replicated in the session factory; these
queries then run on vectorized HashAggregateExec with partial (map-side)
aggregation before the shuffle, which is what makes the shapes scale:
shuffle volume is O(groups), not O(rows).

Variance/stddev are declared via exact decimal sums of x and x² rather
than engine-native accumulators (Welford vs two-pass differ across
engines and partitionings) — deterministic by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries import query, sql_query
from iceberg_metadata_pipeline_spark.session import load_tables

sql_query(
    "agg_groupby_having",
    """
SELECT l_suppkey, COUNT(*) AS n_lines,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY l_suppkey
HAVING COUNT(*) > 50
ORDER BY l_suppkey
""",
)

sql_query(
    "agg_count_distinct",
    """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)

sql_query(
    "agg_min_max_strings_ts",
    """
SELECT l_returnflag,
       MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship,
       MIN(l_linestatus) AS min_status, MAX(l_linestatus) AS max_status,
       MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)

# variance/stddev from exact sums: var_samp = (Σx² − (Σx)²/n) / (n−1)
_VAR_SQL = """
SELECT l_returnflag,
  CAST( (sx2 - sx * sx / n) / (n - 1) AS DOUBLE) AS var_qty,
  CAST( sqrt((sx2 - sx * sx / n) / (n - 1)) AS DOUBLE) AS stddev_qty
FROM (
  SELECT l_returnflag,
    CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx2,
    COUNT(*) AS n
  FROM lineitem GROUP BY l_returnflag
) t
ORDER BY l_returnflag
"""
sql_query("agg_variance_stddev", _VAR_SQL)

sql_query(
    "agg_rollup",
    """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)

sql_query(
    "agg_cube",
    """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)

sql_query(
    "agg_grouping_sets",
    """
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_prio,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)

sql_query(
    "agg_filter_clause",
    """
SELECT l_returnflag,
       COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
       COUNT(*) FILTER (WHERE l_discount = 0.0) AS n_nodisc,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)

sql_query(
    "agg_array_collect_sorted",
    # collect_list is unordered; sort the array for determinism, then join
    # to one string so the result row is hashable by any harness (raw
    # array<string> output crashes pandas-based canonicalizers).
    """
SELECT n_regionkey,
       array_join(array_sort(collect_list(n_name)), ',') AS nations,
       CAST(size(collect_list(n_name)) AS BIGINT) AS n_nations
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""",
    oracle="""
SELECT n_regionkey,
       array_to_string(list_sort(list(n_name)), ',') AS nations,
       CAST(len(list(n_name)) AS BIGINT) AS n_nations
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""",
)


@query(
    "agg_pivot",
    """
SELECT l_returnflag,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS O,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS F
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame .pivot() — wide-format aggregation; oracle uses FILTER."""
    l = load_tables(spark, sf_dir)["lineitem"]
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double"))
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_count_distinct",
    # checked-oracle pattern (the CMS/HLL-shard posture, round 10 —
    # formerly rows-only): the HLL sketch value is engine-specific, so
    # the DECLARED output is the exact count plus a within-tolerance
    # flag the oracle states as TRUE. The flag exercises the sketch; a
    # sketch drifting past 3x its rsd reads as a value-level red.
    """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       1 AS approx_within_tol
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB path for distinct
    counts — fixed-size sketch per group, mergeable map-side, no shuffle of
    raw values. Declared output = exact count + the |approx−exact|/exact
    ≤ 3·rsd guarantee flag (the checked-oracle pattern)."""
    l = load_tables(spark, sf_dir)["lineitem"]
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
        )
        .selectExpr(
            "l_returnflag",
            "exact_orders",
            "CAST(ABS(CAST(approx_orders AS DOUBLE)"
            " - CAST(exact_orders AS DOUBLE))"
            " / CAST(exact_orders AS DOUBLE) <= 0.06 AS INT)"
            " AS approx_within_tol",
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_percentile_approx",
    # checked oracle: percentile_approx(accuracy=10000) guarantees rank
    # error ≤ N/accuracy; the oracle recomputes each approx value's
    # EXACT rank window and states the containment flags TRUE. The
    # approximate values themselves stay out of the compared output
    # (engine-specific sketch), per the declared rows-only→checked
    # upgrade path.
    """
SELECT l_returnflag, COUNT(*) AS n,
       1 AS p50_within, 1 AS p95_within, 1 AS p99_within
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile: mergeable quantile sketch — the scale path for
    medians/p99 over 100 TB (exact percentile would global-sort).
    Declared output = per-group row count + three rank-guarantee flags:
    count(x ≤ approx_q)/n must sit within q ± (1/accuracy + 1/n)."""
    l = load_tables(spark, sf_dir)["lineitem"]
    pcts = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    approx = l.groupBy("l_returnflag").agg(
        pcts[0].alias("p50"),
        pcts[1].alias("p95"),
        pcts[2].alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )
    ranks = (
        l.join(F.broadcast(approx), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                F.expr("CASE WHEN l_extendedprice <= p50 THEN 1 ELSE 0 END")
            ).alias("le50"),
            F.sum(
                F.expr("CASE WHEN l_extendedprice <= p95 THEN 1 ELSE 0 END")
            ).alias("le95"),
            F.sum(
                F.expr("CASE WHEN l_extendedprice <= p99 THEN 1 ELSE 0 END")
            ).alias("le99"),
        )
    )

    def within(le, q):
        return (
            f"CAST(ABS(CAST({le} AS DOUBLE) / CAST(n AS DOUBLE) - {q})"
            f" <= 1.0E0 / 10000.0E0 + 1.0E0 / CAST(n AS DOUBLE) AS INT)"
            f" AS {le.replace('le', 'p')}_within"
        )

    return (
        approx.join(ranks, "l_returnflag")
        .selectExpr(
            "l_returnflag",
            "n",
            within("le50", "0.5E0"),
            within("le95", "0.95E0"),
            within("le99", "0.99E0"),
        )
        .orderBy("l_returnflag")
    )


sql_query(
    "agg_global_no_groups",
    """
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS total,
       MIN(l_shipdate) AS min_ship,
       MAX(l_shipdate) AS max_ship
FROM lineitem
""",
)


# Correlation / covariance / linear-regression aggregates, computed from
# order-independent moments (count + decimal sums; the x², y², xy
# products are per-row IEEE doubles — identical in any engine — summed
# as decimals so accumulation order can't matter) and finished with
# identical double scalar arithmetic in both engines —
# engine-native corr()/covar()/regr_*() accumulate doubles in partition
# order and cannot hash-match across engines (tests/test_functions.py
# proves the native operators agree with these moments to 1e-9). The
# moment shape is also the 100 TB plan you want: one map-side partial
# aggregate, one (group × 6 values) shuffle row per task.
sql_query(
    "agg_corr_covar_regr",
    """
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)
         AS corr_qty_price,
       round((sxy - sx * sy / n) / (n - 1), 6) AS covar_samp,
       round((sxy - sx * sy / n) / n, 6) AS covar_pop,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS regr_slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS regr_intercept
FROM (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE) * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE) AS sxy
  FROM lineitem
  GROUP BY l_returnflag
) m
ORDER BY l_returnflag
""",
    oracle="same",
)


# boolean and conditional-count aggregates (bool_and/bool_or/count_if):
# pure logic over exact comparisons — deterministic in any engine.
# Outputs are CAST to INT/BIGINT because driver-side value hashing
# canonicalizes DuckDB BOOLEAN/HUGEINT cells differently from Spark's
# boolean/long (r3 driver hash_match=false with identical values).
sql_query(
    "agg_bool_count_if",
    """
SELECT o_orderstatus,
       CAST(bool_and(o_totalprice > 1000) AS INT)    AS all_over_1k,
       CAST(bool_or(o_totalprice > 400000) AS INT)   AS any_over_400k,
       CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    oracle="same",
)


# max_by/min_by (argmax/argmin): the ordering value folds the unique
# order key into its low digits so ties are impossible — engine tie
# semantics differ and must never be exercised
sql_query(
    "agg_min_max_by",
    """
SELECT o_orderstatus,
       max_by(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
         AS priciest_order,
       min_by(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
         AS cheapest_order,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    oracle="same",
)


# multi-column COUNT(DISTINCT): Spark takes a column list, DuckDB a row
# constructor — same distinct-tuple semantics
sql_query(
    "agg_count_distinct_multi",
    """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey, l_linenumber) AS n_lines,
       COUNT(DISTINCT l_suppkey, l_partkey) AS n_supplier_parts,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT (l_orderkey, l_linenumber)) AS n_lines,
       COUNT(DISTINCT (l_suppkey, l_partkey)) AS n_supplier_parts,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)


# GROUPING()/GROUPING_ID() flags: the standard way to tell a rollup
# subtotal row from a genuine NULL group key. Same physical plan as the
# plain ROLLUP (the flags are virtual columns of the Expand node).
sql_query(
    "agg_grouping_id",
    """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
       CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
""",
    oracle="same",
)


# ANSI inverse-distribution aggregates: percentile_cont interpolates,
# percentile_disc returns an actual data value — the WITHIN GROUP
# ordered-aggregate syntax (vs. the percentile()/approx_percentile
# spellings declared elsewhere).
sql_query(
    "agg_percentile_within_group",
    """
SELECT l_returnflag,
       CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE)
         AS median_qty,
       CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE)
         AS q1_disc,
       CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE)
         AS p90_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    oracle="same",
)


# width_bucket histogram: equi-width bucketing as a grouping key (the
# ANSI spelling of the manual floor-arithmetic histogram declared in
# agg_histogram_bins). The oracle restates the bucket function
# arithmetically since DuckDB lacks width_bucket; out-of-range semantics
# (0 below, n+1 above) are replicated by the clamp.
sql_query(
    "agg_width_bucket_histogram",
    """
SELECT width_bucket(o_totalprice, 0.0, 400000.0, 8) AS bucket,
       COUNT(*) AS n,
       CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
       CAST(MAX(o_totalprice) AS DOUBLE) AS hi
FROM orders
GROUP BY width_bucket(o_totalprice, 0.0, 400000.0, 8)
ORDER BY bucket
""",
    oracle="""
WITH b AS (
  SELECT o_totalprice,
    CAST(LEAST(GREATEST(FLOOR(o_totalprice / 50000.0) + 1, 0), 9) AS BIGINT) AS bucket
  FROM orders
)
SELECT bucket, COUNT(*) AS n,
       CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
       CAST(MAX(o_totalprice) AS DOUBLE) AS hi
FROM b
GROUP BY bucket
ORDER BY bucket
""",
)


# checked variants of the engine-specific approximations: emit the EXACT
# value plus a within-tolerance boolean for the sketch estimate, so the
# approximate surface gets a full value-level oracle (the unchecked
# rows-only variants remain for the raw estimates).
sql_query(
    "agg_approx_distinct_checked",
    # the HLL and the exact COUNT(DISTINCT) run as SEPARATE aggregates
    # joined on the (tiny) group set: fusing them in one SELECT makes
    # Spark's multi-distinct rewrite carry the HLL partial per (group,
    # distinct-key) pair — at rsd=0.01 that is a 2^14-register buffer
    # shuffled per distinct key (measured 3.4 s vs 0.9 s at sf0.01; at
    # 100 TB it is the difference between shuffling kilobytes and
    # shuffling HLL-buffer-x-cardinality)
    """
WITH est AS (
  SELECT l_returnflag, approx_count_distinct(l_orderkey, 0.01) AS e
  FROM lineitem GROUP BY l_returnflag
),
ex AS (
  SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_nd
  FROM lineitem GROUP BY l_returnflag
)
SELECT est.l_returnflag, exact_nd,
       CAST(abs(CAST(e AS DOUBLE) - exact_nd) / exact_nd < 0.05 AS INT) AS est_ok
FROM est JOIN ex ON est.l_returnflag = ex.l_returnflag
ORDER BY est.l_returnflag
""",
    oracle="""
SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_nd, 1 AS est_ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)

sql_query(
    "agg_percentile_approx_checked",
    """
WITH v AS (
  SELECT l_returnflag,
         approx_percentile(l_extendedprice, 0.5, 10000) AS ap,
         percentile(l_extendedprice, 0.5) AS ex
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(ex AS DOUBLE) AS exact_median,
       CAST(abs(ap - ex) / ex < 0.01 AS INT) AS est_ok
FROM v
ORDER BY l_returnflag
""",
    oracle="""
SELECT l_returnflag,
       CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE)
         AS exact_median,
       1 AS est_ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)


# Geometric and harmonic means per return flag — the two non-arithmetic
# Pythagorean means the SQL surface lacks as builtins. Quantity is a
# small integer, so the group collapses to ≤50 (value, count) CELLS in
# one hash aggregate; Σ cnt·ln(v) and Σ cnt/v then fold over the cells
# in SORTED order (the constant-size-double-reduction pattern). ln()
# differs by 1 ulp between the JVM and libm on some integers (measured:
# ln(3), ln(48)), so the final outputs are ROUNDed to 9 decimals —
# propagation analysis: cnt·1 ulp error ≈ 1e-12 absolute, 5 orders of
# magnitude inside the rounding. 100 TB: one map-combinable aggregate.
_PYTH_MEANS_TEMPLATE = """
WITH cells AS (
  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS BIGINT)
), m AS (
  SELECT flag, CAST(SUM(cnt) AS DOUBLE) AS n,
    {FLOG} AS slog,
    {FINV} AS sinv
  FROM cells GROUP BY flag
)
SELECT flag, CAST(n AS BIGINT) AS n,
       ROUND(EXP(slog / n), 9) AS geometric_mean,
       ROUND(n / sinv, 9) AS harmonic_mean
FROM m
ORDER BY flag
"""

sql_query(
    "agg_geo_harmonic_means",
    _PYTH_MEANS_TEMPLATE.replace(
        "{FLOG}",
        "reduce(array_sort(collect_list(CAST(cnt AS DOUBLE) * LN(CAST(v AS DOUBLE)))),"
        " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
    ).replace(
        "{FINV}",
        "reduce(array_sort(collect_list(CAST(cnt AS DOUBLE) / CAST(v AS DOUBLE))),"
        " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
    ),
    oracle=_PYTH_MEANS_TEMPLATE.replace(
        "{FLOG}",
        "list_reduce(list_sort(list(CAST(cnt AS DOUBLE) * LN(CAST(v AS DOUBLE)))),"
        " (a, x) -> a + x)",
    ).replace(
        "{FINV}",
        "list_reduce(list_sort(list(CAST(cnt AS DOUBLE) / CAST(v AS DOUBLE))),"
        " (a, x) -> a + x)",
    ),
)


# Shannon entropy + Gini impurity of the order-status distribution per
# priority — the two split-quality measures every tree learner and
# label-balance audit uses. One conditional hash aggregate to the
# (priority, status) cells; p = cnt/tot doubles with identical text;
# the ≤3 entropy terms fold SORTED; ROUND(,9) absorbs ln's libm ulp
# (gini is rounded identically for output symmetry).
_ENTROPY_TEMPLATE = """
WITH cells AS (
  SELECT o_orderpriority AS pri, o_orderstatus AS st,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY o_orderpriority, o_orderstatus
), tot AS (
  SELECT pri, CAST(SUM(cnt) AS BIGINT) AS n FROM cells GROUP BY pri
), terms AS (
  SELECT c.pri,
    CAST(c.cnt AS DOUBLE) / CAST(t.n AS DOUBLE) AS p
  FROM cells c JOIN tot t ON c.pri = t.pri
)
SELECT pri,
  ROUND({FOLD}, 9) AS entropy_nats,
  ROUND(1.0E0 - {FOLDSQ}, 9) AS gini_impurity
FROM terms
GROUP BY pri
ORDER BY pri
"""

sql_query(
    "agg_entropy_impurity",
    _ENTROPY_TEMPLATE.replace(
        "{FOLD}",
        "reduce(array_sort(collect_list(-p * LN(p))),"
        " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
    ).replace(
        "{FOLDSQ}",
        "reduce(array_sort(collect_list(p * p)),"
        " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
    ),
    oracle=_ENTROPY_TEMPLATE.replace(
        "{FOLD}", "list_reduce(list_sort(list(-p * LN(p))), (a, x) -> a + x)"
    ).replace(
        "{FOLDSQ}", "list_reduce(list_sort(list(p * p)), (a, x) -> a + x)"
    ),
)


# Coefficient of variation + Fano factor (variance/mean dispersion
# index) per return flag — the two normalized-dispersion diagnostics
# (CV compares spread across scales; Fano >1 flags over-dispersion vs
# Poisson). Quantity collapses to ≤50 integer cells; moments are exact
# DECIMAL(38,0); the final ratios are identical double text (SQRT is
# IEEE-exact — no rounding needed anywhere).
sql_query(
    "agg_cv_fano_dispersion",
    """
WITH cells AS (
  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS BIGINT)
), m AS (
  SELECT flag,
    CAST(SUM(cnt) AS DOUBLE) AS n,
    CAST(CAST(SUM(CAST(cnt AS DECIMAL(19,0)) * v) AS BIGINT) AS DOUBLE) AS s1,
    CAST(CAST(SUM(CAST(cnt AS DECIMAL(19,0)) * (v * v)) AS BIGINT) AS DOUBLE) AS s2
  FROM cells GROUP BY flag
)
SELECT flag, CAST(n AS BIGINT) AS n,
  SQRT((s2 - s1 * s1 / n) / (n - 1.0E0)) / (s1 / n) AS coeff_variation,
  ((s2 - s1 * s1 / n) / (n - 1.0E0)) / (s1 / n) AS fano_factor
FROM m
ORDER BY flag
""",
)


# --- exact trimmed + winsorized mean (round 10) -----------------------------

# robust-location staples over order prices, EXACT: k = n DIV 10 copies
# trimmed (or clamped) from each tail, resolved on per-distinct-value
# counts + a cumulative count-below — never per-row ranks. The kept-copy
# count per distinct value is pure integer interval overlap; the kept
# sum is bigint × decimal (exact); the two means are single divisions
# with identical text in both engines. The Spark side computes the
# count-below with the bucketed two-phase prefix (stat_ks_two_sample's
# shape); the oracle uses the plain global window over distinct values.
_TWM_TEMPLATE = """
WITH s AS (
  SELECT CAST(o_totalprice AS DECIMAL(25,6)) AS v FROM orders
), pv AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS n_v FROM s GROUP BY v
), c AS (
  SELECT v, n_v,
    COALESCE(SUM(n_v) OVER (
      ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS cb
  FROM pv
), tot AS (
  SELECT CAST(SUM(n_v) AS BIGINT) AS n,
         CAST(SUM(n_v) {IDIV} 10 AS BIGINT) AS k
  FROM pv
), agg AS (
  SELECT
    MAX(n) AS n, MAX(k) AS k,
    SUM(CAST(GREATEST(LEAST(cb + n_v, n - k) - GREATEST(cb + 1, k + 1) + 1,
                      0) AS DECIMAL(12,0)) * v) AS trim_sum,
    MIN(CASE WHEN cb + n_v >= k + 1 THEN v END) AS v_low,
    MIN(CASE WHEN cb + n_v >= n - k THEN v END) AS v_high
  FROM c CROSS JOIN tot
)
SELECT {FINAL}
FROM agg
"""

_TWM_FINAL = """CAST(n AS BIGINT) AS n,
  CAST(k AS BIGINT) AS k_trim,
  {TS} / (CAST(n AS DOUBLE) - 2.0E0 * CAST(k AS DOUBLE)) AS trimmed_mean,
  {WS} / CAST(n AS DOUBLE) AS winsorized_mean"""


def _twm(idiv: str, d2d) -> str:
    ts = d2d("trim_sum")
    ws = d2d(
        "(trim_sum + CAST(k AS DECIMAL(12,0)) * v_low"
        " + CAST(k AS DECIMAL(12,0)) * v_high)"
    )
    return _TWM_TEMPLATE.replace("{IDIV}", idiv).replace(
        "{FINAL}", _TWM_FINAL.replace("{TS}", ts).replace("{WS}", ws)
    )


def _twm_d2d(expr: str) -> str:
    # the stats_ext._d2d split-conversion (floor + fraction) so the
    # decimal→double rounding is single and identical across engines
    return (
        f"(CAST(CAST(FLOOR({expr}) AS BIGINT) AS DOUBLE)"
        f" + CAST({expr} - FLOOR({expr}) AS DOUBLE))"
    )


@query("agg_trimmed_winsorized_mean", _twm("//", _twm_d2d))
def agg_trimmed_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See the template comment: exact 10% trimmed + winsorized means,
    bucketed two-phase prefix on the Spark side."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    s = t["orders"].selectExpr("CAST(o_totalprice AS DECIMAL(25,6)) AS v")
    pv = s.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("n_v"))
    bounds = pv.agg(
        F.min(F.col("v").cast("double")).alias("vmin"),
        F.max(F.col("v").cast("double")).alias("vmax"),
    )
    b = pv.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket",
        F.expr("width_bucket(CAST(v AS DOUBLE), vmin, vmax + 1.0d, 1024)"),
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
    c = b.join(F.broadcast(offs), "bucket").select(
        "v", "n_v",
        (F.col("off") + F.sum("n_v").over(w_in) - F.col("n_v")).alias("cb"),
    )
    tot = pv.agg(
        F.sum("n_v").cast("long").alias("n"),
        F.expr("CAST(SUM(n_v) DIV 10 AS BIGINT)").alias("k"),
    )
    agg = c.crossJoin(F.broadcast(tot)).agg(
        F.max("n").alias("n"),
        F.max("k").alias("k"),
        F.sum(
            F.expr(
                "CAST(GREATEST(LEAST(cb + n_v, n - k)"
                " - GREATEST(cb + 1, k + 1) + 1, 0) AS DECIMAL(12,0)) * v"
            )
        ).alias("trim_sum"),
        F.min(F.expr("CASE WHEN cb + n_v >= k + 1 THEN v END")).alias("v_low"),
        F.min(F.expr("CASE WHEN cb + n_v >= n - k THEN v END")).alias("v_high"),
    )
    final = _TWM_FINAL.replace("{TS}", _twm_d2d("trim_sum")).replace(
        "{WS}",
        _twm_d2d(
            "(trim_sum + CAST(k AS DECIMAL(12,0)) * v_low"
            " + CAST(k AS DECIMAL(12,0)) * v_high)"
        ),
    )
    return agg.selectExpr(*[e.strip() for e in final.split(",\n")])


# --- column profiling (round 10 wave 3) --------------------------------------

# the data-profiling staple every warehouse tool ships (null counts,
# distinct cardinality, min/max per column): one scan per profiled
# column UNION'd — each branch is a map-combinable aggregate, and
# Catalyst prunes each branch's scan to its single column. Profiled
# columns are int/string/date typed so min/max stringify identically
# across engines (doubles would not).
sql_query(
    "quality_column_profile",
    """
SELECT 'l_orderkey' AS column_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT l_orderkey) AS n_distinct,
       CAST(MIN(l_orderkey) AS STRING) AS min_value,
       CAST(MAX(l_orderkey) AS STRING) AS max_value
FROM lineitem
UNION ALL
SELECT 'l_linenumber' AS column_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT l_linenumber),
       CAST(MIN(l_linenumber) AS STRING), CAST(MAX(l_linenumber) AS STRING)
FROM lineitem
UNION ALL
SELECT 'l_returnflag' AS column_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT l_returnflag),
       CAST(MIN(l_returnflag) AS STRING), CAST(MAX(l_returnflag) AS STRING)
FROM lineitem
UNION ALL
SELECT 'l_shipdate' AS column_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT l_shipdate),
       CAST(MIN(CAST(l_shipdate AS DATE)) AS STRING),
       CAST(MAX(CAST(l_shipdate AS DATE)) AS STRING)
FROM lineitem
ORDER BY column_name
""",
    oracle="same",
)


# exact per-group MODE with a deterministic tiebreak (smallest value
# among the most frequent) — the categorical-summary staple engines
# hide behind approx sketches. Work is per (group, value) CELL counts
# (bounded by distinct values, never rows), then one bounded window
# per group over the cells.
sql_query(
    "agg_mode_per_group",
    """
SELECT l_returnflag, mode_qty, mode_count
FROM (
  SELECT l_returnflag, qty AS mode_qty, n AS mode_count,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY n DESC, qty) AS rn
  FROM (
    SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS BIGINT)
  ) cells
) ranked
WHERE rn = 1
ORDER BY l_returnflag
""",
    oracle="same",
)
