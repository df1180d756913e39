"""Distributed data mining + statistical testing: market-basket
association rules, chi-square independence, two-sample KS, Markov
transition matrices — the exploratory-analytics layer over the star
schema, expressed as Catalyst-friendly joins/windows/aggregates.

Cross-engine exactness notes (the oracle hash-compares doubles):
- association confidence / transition probability / empirical CDFs are a
  SINGLE division of exact integer counts — correctly rounded, identical
  in Spark and DuckDB, so no rounding is needed anywhere;
- the chi-square statistic is a SUM of double terms, and double addition
  is order-sensitive — both sides fold the terms in SORTED order
  (Spark ``reduce(array_sort(collect_list(..)))``, DuckDB
  ``list_reduce(list_sort(list(..)))``; the fold is sequential, so the
  bits match exactly). The per-cell term is rationalized to integer
  numerator/denominator first — ``(obs·tot − rt·ct)² / (tot·rt·ct)`` —
  one exact bigint numerator, one correctly-rounded division.

Scale design: the basket self-join shuffles on the order key and is
quadratic only in basket size (bounded ~7 in TPC-H-shaped data, never
in table size); the contingency/CDF/transition queries are single hash
or window aggregates over co-partitioned keys. Nothing here collects
data to the driver.

The reference repo ships no mining operators; SURVEY.md §2.G build-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries import query, sql_query
from iceberg_metadata_pipeline_spark.session import load_tables


def _basket_components(spark: SparkSession, sf_dir: str, max_basket: int):
    """Shared machinery for the basket-rule queries: (salted pair
    counts with pair_cnt >= 2, per-item basket frequencies, one-row
    basket-count DataFrame — LAZY, no action here). See
    mining_basket_pair_rules for the triangle salting contract."""
    li = load_tables(spark, sf_dir)["lineitem"]
    # The (okey, pkey) distinct set feeds FIVE consumers across the two
    # basket queries (both self-join branches, per-item frequencies, the
    # basket count) and Catalyst cannot CSE across DataFrame references:
    # the un-cached plan scanned lineitem and re-ran the distinct
    # aggregate once per consumer (5 scans in the before-plan). Caching
    # the collapsed proxy — O(distinct basket items), two bigints per
    # row, orders of magnitude under the raw table — is the guide-§8
    # "decide with small rows" shape: heavy input is read once, every
    # downstream decision runs over the cached proxy.
    items = li.selectExpr(
        "CAST(l_orderkey AS BIGINT) AS okey", "CAST(l_partkey AS BIGINT) AS pkey"
    ).distinct().cache()
    part_cnt = items.groupBy("pkey").agg(F.count(F.lit(1)).alias("cnt"))
    n_baskets = items.select("okey").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets")
    )
    from pyspark.sql import Window

    salted = (
        items.withColumn(
            "basket_n", F.count(F.lit(1)).over(Window.partitionBy("okey"))
        )
        .withColumn(
            "n_groups",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("basket_n") / F.lit(max_basket)).cast("int"),
            ),
        )
        .withColumn("g", F.pmod(F.hash("pkey"), F.col("n_groups")))
        .withColumn(
            "h", F.explode(F.sequence(F.lit(0), F.col("n_groups") - 1))
        )
        .select(
            "okey",
            "pkey",
            "g",
            F.least("g", "h").alias("kp"),
            F.greatest("g", "h").alias("kq"),
        )
        # both self-join branches read this; without the cache the whole
        # window+explode subtree (and another items recompute) ran twice
        .cache()
    )
    a = salted.alias("a")
    b = salted.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.kp") == F.col("b.kp"))
            & (F.col("a.kq") == F.col("b.kq"))
            & (F.col("a.pkey") < F.col("b.pkey"))
            # same-group pairs exist in EVERY task their group joins —
            # count them only on the diagonal task (kp == kq)
            & (
                (F.col("a.g") != F.col("b.g"))
                | (F.col("a.kp") == F.col("a.kq"))
            ),
        )
        .groupBy(F.col("a.pkey").alias("part_a"), F.col("b.pkey").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter("pair_cnt >= 2")
    )
    return pairs, part_cnt, n_baskets


@query(
    "mining_basket_pair_rules",
    """
WITH items AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS okey, CAST(l_partkey AS BIGINT) AS pkey
  FROM lineitem
), part_cnt AS (
  SELECT pkey, COUNT(*) AS cnt FROM items GROUP BY pkey
), pairs AS (
  SELECT a.pkey AS part_a, b.pkey AS part_b, COUNT(*) AS pair_cnt
  FROM items a JOIN items b ON a.okey = b.okey AND a.pkey < b.pkey
  GROUP BY a.pkey, b.pkey
  HAVING COUNT(*) >= 2
)
SELECT p.part_a, p.part_b, p.pair_cnt,
       CAST(p.pair_cnt AS DOUBLE) / CAST(ca.cnt AS DOUBLE) AS conf_a_to_b,
       CAST(p.pair_cnt AS DOUBLE) / CAST(cb.cnt AS DOUBLE) AS conf_b_to_a
FROM pairs p
JOIN part_cnt ca ON p.part_a = ca.pkey
JOIN part_cnt cb ON p.part_b = cb.pkey
ORDER BY p.pair_cnt DESC, p.part_a, p.part_b
""",
)
def mining_basket_pair_rules(
    spark: SparkSession, sf_dir: str, max_basket: int = 500
) -> DataFrame:
    """Pairwise association rules (A ⇒ B) from order baskets: support =
    co-occurrence count, confidence = support / item frequency. The
    self-join runs inside each order (shuffle on okey; work is quadratic
    in basket size only), then two broadcast-able joins attach the item
    frequencies. Confidence is one exact integer division — bit-equal to
    the oracle without rounding.

    ``max_basket`` (round 9 guard, round-10 SALTING — verdict #6): a
    degenerate hot basket of B items contributes B² pairs and, joined
    on the bare order key, becomes a single-reducer straggler at retail
    scale. Over-cap baskets are now TRIANGLE-PARTITIONED instead of
    dropped: each basket splits into G = ceil(B / max_basket) salt
    groups by item hash, every item replicates to the G tasks keyed
    (okey, min(g,h), max(g,h)), and the pair join keys on that triple —
    each task holds ≤ 2·max_basket items, so per-task work is bounded
    by 4·max_basket² regardless of basket size, and the G× replication
    is the textbook all-pairs lower bound. Every pair is produced
    EXACTLY once (cross-group pairs only in their unique shared task;
    same-group pairs only on the diagonal), so the result is
    bit-identical to the unguarded SQL oracle at ANY basket size — the
    r9 drop-semantics divergence is gone. Normal baskets get G=1 and
    degenerate to the plain per-order self-join."""
    pairs, part_cnt, _nb = _basket_components(spark, sf_dir, max_basket)
    ca = part_cnt.withColumnRenamed("pkey", "part_a").withColumnRenamed("cnt", "cnt_a")
    cb = part_cnt.withColumnRenamed("pkey", "part_b").withColumnRenamed("cnt", "cnt_b")
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .select(
            "part_a",
            "part_b",
            "pair_cnt",
            (F.col("pair_cnt").cast("double") / F.col("cnt_a").cast("double")).alias(
                "conf_a_to_b"
            ),
            (F.col("pair_cnt").cast("double") / F.col("cnt_b").cast("double")).alias(
                "conf_b_to_a"
            ),
        )
        .orderBy(F.desc("pair_cnt"), "part_a", "part_b")
    )


@query(
    "mining_basket_lift",
    """
WITH items AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS okey, CAST(l_partkey AS BIGINT) AS pkey
  FROM lineitem
), part_cnt AS (
  SELECT pkey, COUNT(*) AS cnt FROM items GROUP BY pkey
), nb AS (
  SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_baskets FROM items
), pairs AS (
  SELECT a.pkey AS part_a, b.pkey AS part_b, COUNT(*) AS pair_cnt
  FROM items a JOIN items b ON a.okey = b.okey AND a.pkey < b.pkey
  GROUP BY a.pkey, b.pkey
  HAVING COUNT(*) >= 2
)
SELECT p.part_a, p.part_b, p.pair_cnt,
       CAST(p.pair_cnt AS DOUBLE) * CAST(nb.n_baskets AS DOUBLE)
         / (CAST(ca.cnt AS DOUBLE) * CAST(cb.cnt AS DOUBLE)) AS lift
FROM pairs p
JOIN part_cnt ca ON p.part_a = ca.pkey
JOIN part_cnt cb ON p.part_b = cb.pkey
CROSS JOIN nb
ORDER BY p.pair_cnt DESC, p.part_a, p.part_b
""",
)
def mining_basket_lift(
    spark: SparkSession, sf_dir: str, max_basket: int = 500
) -> DataFrame:
    """Association LIFT per co-purchased pair (round 10): lift =
    P(A,B) / (P(A)·P(B)) = pair_cnt·N / (cnt_a·cnt_b) — one double
    formula over three exact integers, same text in both engines. Same
    triangle-salted pair machinery as mining_basket_pair_rules; the
    basket count joins in as a broadcast one-row frame (no driver
    action)."""
    pairs, part_cnt, n_baskets = _basket_components(spark, sf_dir, max_basket)
    ca = part_cnt.withColumnRenamed("pkey", "part_a").withColumnRenamed("cnt", "cnt_a")
    cb = part_cnt.withColumnRenamed("pkey", "part_b").withColumnRenamed("cnt", "cnt_b")
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n_baskets))
        .selectExpr(
            "part_a",
            "part_b",
            "pair_cnt",
            "CAST(pair_cnt AS DOUBLE) * CAST(n_baskets AS DOUBLE)"
            " / (CAST(cnt_a AS DOUBLE) * CAST(cnt_b AS DOUBLE)) AS lift",
        )
        .orderBy(F.desc("pair_cnt"), "part_a", "part_b")
    )


_CHI2_CELLS = """
WITH joined AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), obs AS (
  SELECT seg, pri, COUNT(*) AS n FROM joined GROUP BY seg, pri
), rt AS (SELECT seg, CAST(SUM(n) AS BIGINT) AS row_tot FROM obs GROUP BY seg),
  ct AS (SELECT pri, CAST(SUM(n) AS BIGINT) AS col_tot FROM obs GROUP BY pri),
  tt AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM obs),
cells AS (
  SELECT
    CAST((o.n * t.tot - r.row_tot * c.col_tot) AS DOUBLE)
      * CAST((o.n * t.tot - r.row_tot * c.col_tot) AS DOUBLE)
      / (CAST(t.tot AS DOUBLE) * CAST(r.row_tot AS DOUBLE) * CAST(c.col_tot AS DOUBLE))
      AS term
  FROM obs o
  JOIN rt r ON o.seg = r.seg
  JOIN ct c ON o.pri = c.pri
  CROSS JOIN tt t
)
"""

@query(
    "stat_chi_square_independence",
    _CHI2_CELLS
    + """
SELECT CAST((SELECT COUNT(*) FROM rt) AS BIGINT) AS n_seg,
       CAST((SELECT COUNT(*) FROM ct) AS BIGINT) AS n_pri,
       list_reduce(list_sort(list(term)), (a, x) -> a + x) AS chi2
FROM cells
""",
)
def stat_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence (market segment × order
    priority). Per-cell term rationalized to (obs·tot − rt·ct)²/(tot·
    rt·ct): the numerator is exact integer arithmetic before ONE double
    conversion, so each term is identical cross-engine; the statistic
    folds the 25 terms in sorted order (sequential lambda, not an
    unordered SUM) so the double addition order — and hence every bit —
    matches the oracle. At scale the contingency table is tiny after one
    hash aggregate; everything downstream is constant work."""
    t = load_tables(spark, sf_dir)
    joined = t["orders"].join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey")
    ).select(F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri"))
    # obs (the ≤25-cell contingency table) feeds six consumers (row/col/
    # grand totals, the cell terms, and two count() actions); cached so
    # the orders⋈customer join runs once instead of per consumer
    obs = joined.groupBy("seg", "pri").agg(F.count(F.lit(1)).alias("n")).cache()
    rt = obs.groupBy("seg").agg(F.sum("n").alias("row_tot"))
    ct = obs.groupBy("pri").agg(F.sum("n").alias("col_tot"))
    tt = obs.agg(F.sum("n").alias("tot"))
    cells = (
        obs.join(rt, "seg")
        .join(ct, "pri")
        .crossJoin(F.broadcast(tt))
        .selectExpr(
            "CAST((n * tot - row_tot * col_tot) AS DOUBLE)"
            " * CAST((n * tot - row_tot * col_tot) AS DOUBLE)"
            " / (CAST(tot AS DOUBLE) * CAST(row_tot AS DOUBLE)"
            "    * CAST(col_tot AS DOUBLE)) AS term"
        )
    )
    n_seg = rt.count()
    n_pri = ct.count()
    return cells.agg(
        F.lit(n_seg).cast("long").alias("n_seg"),
        F.lit(n_pri).cast("long").alias("n_pri"),
        F.expr(
            "reduce(array_sort(collect_list(term)), CAST(0.0E0 AS DOUBLE),"
            " (a, x) -> a + x)"
        ).alias("chi2"),
    )


@query(
    "stat_cramers_v",
    _CHI2_CELLS
    + """
SELECT CAST((SELECT COUNT(*) FROM rt) AS BIGINT) AS n_seg,
       CAST((SELECT COUNT(*) FROM ct) AS BIGINT) AS n_pri,
       CAST((SELECT tot FROM tt) AS BIGINT) AS n_obs,
       sqrt(list_reduce(list_sort(list(term)), (a, x) -> a + x)
            / ((SELECT tot FROM tt)
               * least((SELECT COUNT(*) FROM rt) - 1,
                       (SELECT COUNT(*) FROM ct) - 1))) AS cramers_v
FROM cells
""",
)
def stat_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for the segment × priority association:
    V = sqrt(chi² / (n · min(r−1, c−1))) — the normalized companion the
    chi-square statistic is usually reported with (chi² alone grows with
    n; V stays in [0,1]). Same exactness discipline: sorted double fold
    for chi², one division, one correctly-rounded sqrt — bit-equal
    cross-engine. Constant work after one hash aggregate."""
    t = load_tables(spark, sf_dir)
    joined = t["orders"].join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey")
    ).select(F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri"))
    # cached for the same six-consumer reason as the chi-square query
    obs = joined.groupBy("seg", "pri").agg(F.count(F.lit(1)).alias("n")).cache()
    rt = obs.groupBy("seg").agg(F.sum("n").alias("row_tot"))
    ct = obs.groupBy("pri").agg(F.sum("n").alias("col_tot"))
    tt = obs.agg(F.sum("n").alias("tot"))
    cells = (
        obs.join(rt, "seg")
        .join(ct, "pri")
        .crossJoin(F.broadcast(tt))
        .selectExpr(
            "tot",
            "CAST((n * tot - row_tot * col_tot) AS DOUBLE)"
            " * CAST((n * tot - row_tot * col_tot) AS DOUBLE)"
            " / (CAST(tot AS DOUBLE) * CAST(row_tot AS DOUBLE)"
            "    * CAST(col_tot AS DOUBLE)) AS term",
        )
    )
    n_seg = rt.count()
    n_pri = ct.count()
    return cells.agg(
        F.lit(n_seg).cast("long").alias("n_seg"),
        F.lit(n_pri).cast("long").alias("n_pri"),
        F.max("tot").cast("long").alias("n_obs"),
        F.expr(
            "sqrt(reduce(array_sort(collect_list(term)),"
            " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)"
            f" / (max(tot) * least({n_seg} - 1, {n_pri} - 1)))"
        ).alias("cramers_v"),
    )


@query(
    "stat_ks_two_sample",
    """
WITH s AS (
  SELECT CAST(o.o_totalprice AS DOUBLE) AS v,
         CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
), tot AS (
  SELECT CAST(SUM(g) AS BIGINT) AS n1,
         CAST(COUNT(*) - SUM(g) AS BIGINT) AS n2
  FROM s
), cdf AS (
  SELECT SUM(g) OVER (ORDER BY v) AS c1,
         SUM(1 - g) OVER (ORDER BY v) AS c2
  FROM s
)
SELECT t.n1, t.n2,
       MAX(ABS(CAST(c.c1 AS DOUBLE) / CAST(t.n1 AS DOUBLE)
             - CAST(c.c2 AS DOUBLE) / CAST(t.n2 AS DOUBLE))) AS ks_stat
FROM cdf c CROSS JOIN tot t
GROUP BY t.n1, t.n2
""",
)
def stat_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the order-price
    distributions of two customer segments — EXACT, with no global
    unpartitioned window (the r6 scale finding): the empirical CDF is
    computed two-phase. Phase 1 hash-aggregates per-distinct-value class
    counts (the CDF only changes at distinct values, and with the RANGE
    frame all tied rows share one cumulative value, so distinct-value
    granularity is lossless). Phase 2 buckets the distinct values into
    1024 width_bucket ranges: per-bucket totals are a second tiny hash
    aggregate whose ≤1026-row prefix sum is the only unpartitioned
    window (post-aggregation, constant-size — the accepted shape); the
    within-bucket cumulative sums run under a window PARTITIONED BY
    bucket, so no task ever sorts more than one bucket's distinct
    values. c1/c2 are exact integer counts — identical to the single-
    window formulation, so |c1/n1 − c2/n2| stays bit-identical to the
    oracle's. At 100 TB each of the 1024 bucket partitions holds ~1/1024
    of the distinct values: the former single-task global sort becomes
    1024 independent window tasks."""
    t = load_tables(spark, sf_dir)
    s = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .selectExpr(
            "CAST(o_totalprice AS DOUBLE) AS v",
            "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g",
        )
    )
    from pyspark.sql import Window

    # NOT cached (optimization r12, measured): 3 consumers of a bare
    # scan+join — a cache of the collapse serialized subtrees that
    # previously overlapped in one job and cost ~0.5 s net at sf0.1
    # (contrast stat_kruskal_wallis, 9 consumers, where it wins 2×)
    tot = s.agg(
        F.sum("g").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("g")).cast("long").alias("n2"),
    )
    # phase 1: distinct-value class counts (one hash aggregate)
    per_v = s.groupBy("v").agg(
        F.sum("g").alias("g1"), F.sum(F.expr("1 - g")).alias("g2")
    )
    bounds = s.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    # vmax + 1.0 keeps min < max even when all values tie, and puts the
    # max value in a regular bucket instead of width_bucket's overflow
    bucketed = per_v.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket", F.expr("width_bucket(v, vmin, vmax + 1.0d, 1024)")
    )
    # phase 2a: per-bucket totals → EXCLUSIVE prefix offsets; the window
    # runs over the ≤1024-row bucket aggregate, never raw rows
    w_bkt = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        bucketed.groupBy("bucket")
        .agg(F.sum("g1").alias("b1"), F.sum("g2").alias("b2"))
        .select(
            "bucket",
            F.coalesce(F.sum("b1").over(w_bkt), F.lit(0)).alias("o1"),
            F.coalesce(F.sum("b2").over(w_bkt), F.lit(0)).alias("o2"),
        )
    )
    # phase 2b: within-bucket cumulative counts, PARTITIONED BY bucket
    w_in = Window.partitionBy("bucket").orderBy("v")
    cdf = bucketed.join(F.broadcast(offs), "bucket").select(
        (F.col("o1") + F.sum("g1").over(w_in)).alias("c1"),
        (F.col("o2") + F.sum("g2").over(w_in)).alias("c2"),
    )
    return (
        cdf.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.max(
                F.abs(
                    F.col("c1").cast("double") / F.col("n1").cast("double")
                    - F.col("c2").cast("double") / F.col("n2").cast("double")
                )
            ).alias("ks_stat")
        )
        .select("n1", "n2", "ks_stat")
    )


@query(
    "mining_markov_transitions",
    """
WITH seq AS (
  SELECT user_id, event_type AS cur,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS nxt
  FROM events
), trans AS (
  SELECT cur, nxt, COUNT(*) AS n
  FROM seq WHERE nxt IS NOT NULL
  GROUP BY cur, nxt
), totals AS (
  SELECT cur, CAST(SUM(n) AS BIGINT) AS out_n FROM trans GROUP BY cur
)
SELECT t.cur, t.nxt, t.n,
       CAST(t.n AS DOUBLE) / CAST(tt.out_n AS DOUBLE) AS p
FROM trans t JOIN totals tt ON t.cur = tt.cur
ORDER BY t.cur, t.nxt
""",
)
def mining_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    LEAD within (user, time) gives consecutive pairs — one shuffle on
    user_id, totally ordered by (ts, event_id) so ties are stable — then
    a hash aggregate and one exact division per transition probability.
    The per-user window partitioning is the 100 TB plan: no global sort,
    state bounded by a user's own history."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t["events"].select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    trans = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = trans.groupBy("cur").agg(F.sum("n").cast("long").alias("out_n"))
    return (
        trans.join(totals, "cur")
        .select(
            "cur",
            "nxt",
            "n",
            (F.col("n").cast("double") / F.col("out_n").cast("double")).alias("p"),
        )
        .orderBy("cur", "nxt")
    )


@query(
    "events_time_weighted_avg",
    """
WITH seq AS (
  SELECT user_id,
         CAST(value AS DOUBLE) AS v,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS next_us
  FROM events
), terms AS (
  SELECT user_id,
         v * CAST(next_us - ts_us AS DOUBLE) AS w_term,
         next_us - ts_us AS dt_us
  FROM seq WHERE next_us IS NOT NULL
)
SELECT user_id,
       list_reduce(list_sort(list(w_term)), (a, x) -> a + x)
         / CAST(CAST(SUM(dt_us) AS BIGINT) AS DOUBLE) AS twap,
       CAST(SUM(dt_us) AS BIGINT) AS span_us,
       COUNT(*) AS n_intervals
FROM terms
GROUP BY user_id
ORDER BY user_id
""",
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's event value (TWAP): each
    reading holds until the next event, so its weight is the interval
    length in epoch-microseconds (exact bigint arithmetic cross-engine).
    The weighted sum is doubles — order-sensitive — so both engines fold
    the per-interval terms in SORTED order (the chi-square pattern);
    the denominator is an exact integer sum, and the final division is
    one correctly-rounded op. Per-user windows: no global sort, state
    bounded by a user's own history."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t["events"].select(
        "user_id",
        F.col("value").cast("double").alias("v"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.lead(F.unix_micros(F.col("ts").cast("timestamp"))).over(w).alias("next_us"),
    )
    terms = seq.filter(F.col("next_us").isNotNull()).select(
        "user_id",
        (F.col("v") * (F.col("next_us") - F.col("ts_us")).cast("double")).alias(
            "w_term"
        ),
        (F.col("next_us") - F.col("ts_us")).alias("dt_us"),
    )
    return (
        terms.groupBy("user_id")
        .agg(
            (
                F.expr(
                    "reduce(array_sort(collect_list(w_term)), CAST(0.0E0 AS DOUBLE),"
                    " (a, x) -> a + x)"
                )
                / F.sum("dt_us").cast("long").cast("double")
            ).alias("twap"),
            F.sum("dt_us").cast("long").alias("span_us"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .orderBy("user_id")
    )


@query(
    "stat_ab_proportion_ztest",
    """
WITH arms AS (
  SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
              THEN 1 ELSE 0 END AS converted
  FROM events
  GROUP BY user_id
), agg AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS c1
  FROM arms
)
SELECT n0, n1, c0, c1,
       CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
       CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
       (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
        - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
       / SQRT(
           (CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
           * (1.0E0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
           * (1.0E0 / CAST(n0 AS DOUBLE) + 1.0E0 / CAST(n1 AS DOUBLE))
         ) AS z_score
FROM agg
""",
)
def stat_ab_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test (A/B testing): arms by user-id parity,
    conversion = user crossed a purchase-count threshold set near the
    fixture median (every user purchases at least once, so ever-purchased
    would degenerate to p=1 and a zero denominator); z from the
    pooled-proportion formula. Every intermediate is a single correctly-rounded double op
    over exact integer counts — bit-identical cross-engine with no
    rounding. One hash aggregate per level; constant-size output."""
    t = load_tables(spark, sf_dir)
    arms = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.expr(
                "CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
                " >= 14 THEN 1 ELSE 0 END"
            ).alias("converted")
        )
        .withColumn("arm", F.expr("CAST(user_id % 2 AS INT)"))
    )
    agg = arms.agg(
        F.sum(F.expr("CASE WHEN arm = 0 THEN 1 ELSE 0 END")).cast("long").alias("n0"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN 1 ELSE 0 END")).cast("long").alias("n1"),
        F.sum(F.expr("CASE WHEN arm = 0 THEN converted ELSE 0 END"))
        .cast("long")
        .alias("c0"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN converted ELSE 0 END"))
        .cast("long")
        .alias("c1"),
    )
    return agg.selectExpr(
        "n0", "n1", "c0", "c1",
        "CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0",
        "CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1",
        """
        (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
         - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        / SQRT(
            (CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
            * (1.0E0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
            * (1.0E0 / CAST(n0 AS DOUBLE) + 1.0E0 / CAST(n1 AS DOUBLE))
          ) AS z_score
        """,
    )


_OLS_SQL = """
WITH t AS (
  SELECT CAST(l_quantity AS DOUBLE) AS q,
         CAST(l_discount AS DOUBLE) AS d,
         CAST(l_extendedprice AS DOUBLE) AS y
  FROM lineitem
), g AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS s00,
         (CAST(CAST(FLOOR(SUM(CAST(q AS DECIMAL(38,12)))) AS BIGINT) AS DOUBLE) + CAST(SUM(CAST(q AS DECIMAL(38,12))) - FLOOR(SUM(CAST(q AS DECIMAL(38,12)))) AS DOUBLE)) AS s01,
         (CAST(CAST(FLOOR(SUM(CAST(d AS DECIMAL(38,12)))) AS BIGINT) AS DOUBLE) + CAST(SUM(CAST(d AS DECIMAL(38,12))) - FLOOR(SUM(CAST(d AS DECIMAL(38,12)))) AS DOUBLE)) AS s02,
         (CAST(CAST(FLOOR(SUM(CAST(q * q AS DECIMAL(38,12)))) AS BIGINT) AS DOUBLE) + CAST(SUM(CAST(q * q AS DECIMAL(38,12))) - FLOOR(SUM(CAST(q * q AS DECIMAL(38,12)))) AS DOUBLE)) AS s11,
         (CAST(CAST(FLOOR(SUM(CAST(q * d AS DECIMAL(38,12)))) AS BIGINT) AS DOUBLE) + CAST(SUM(CAST(q * d AS DECIMAL(38,12))) - FLOOR(SUM(CAST(q * d AS DECIMAL(38,12)))) AS DOUBLE)) AS s12,
         (CAST(CAST(FLOOR(SUM(CAST(d * d AS DECIMAL(38,12)))) AS BIGINT) AS DOUBLE) + CAST(SUM(CAST(d * d AS DECIMAL(38,12))) - FLOOR(SUM(CAST(d * d AS DECIMAL(38,12)))) AS DOUBLE)) AS s22,
         (CAST(CAST(FLOOR(SUM(CAST(y AS DECIMAL(38,12)))) AS BIGINT) AS DOUBLE) + CAST(SUM(CAST(y AS DECIMAL(38,12))) - FLOOR(SUM(CAST(y AS DECIMAL(38,12)))) AS DOUBLE)) AS b0,
         (CAST(CAST(FLOOR(SUM(CAST(q * y AS DECIMAL(38,12)))) AS BIGINT) AS DOUBLE) + CAST(SUM(CAST(q * y AS DECIMAL(38,12))) - FLOOR(SUM(CAST(q * y AS DECIMAL(38,12)))) AS DOUBLE)) AS b1,
         (CAST(CAST(FLOOR(SUM(CAST(d * y AS DECIMAL(38,12)))) AS BIGINT) AS DOUBLE) + CAST(SUM(CAST(d * y AS DECIMAL(38,12))) - FLOOR(SUM(CAST(d * y AS DECIMAL(38,12)))) AS DOUBLE)) AS b2,
         (CAST(CAST(FLOOR(SUM(CAST(y * y AS DECIMAL(38,12)))) AS BIGINT) AS DOUBLE) + CAST(SUM(CAST(y * y AS DECIMAL(38,12))) - FLOOR(SUM(CAST(y * y AS DECIMAL(38,12)))) AS DOUBLE)) AS syy,
         COUNT(*) AS n
  FROM t
), dets AS (
  SELECT n, s00, s01, s02, s11, s12, s22, b0, b1, b2, syy,
         (s00 * (s11 * s22 - s12 * s12)
          - s01 * (s01 * s22 - s12 * s02)
          + s02 * (s01 * s12 - s11 * s02)) AS det_a,
         (b0 * (s11 * s22 - s12 * s12)
          - s01 * (b1 * s22 - s12 * b2)
          + s02 * (b1 * s12 - s11 * b2)) AS det0,
         (s00 * (b1 * s22 - s12 * b2)
          - b0 * (s01 * s22 - s12 * s02)
          + s02 * (s01 * b2 - b1 * s02)) AS det1,
         (s00 * (s11 * b2 - b1 * s12)
          - s01 * (s01 * b2 - b1 * s02)
          + b0 * (s01 * s12 - s11 * s02)) AS det2
  FROM g
)
SELECT n,
       det0 / det_a AS beta_intercept,
       det1 / det_a AS beta_quantity,
       det2 / det_a AS beta_discount,
       1.0E0 - (syy - ((det0 / det_a) * b0 + (det1 / det_a) * b1
                       + (det2 / det_a) * b2))
             / (syy - (b0 * b0) / s00) AS r2
FROM dets
"""

# Distributed OLS via NORMAL EQUATIONS: ONE aggregate pass builds the
# exact Gram matrix X'X and moment vector X'y (every sum accumulates in
# DECIMAL(38,12) — order-independent and bit-identical cross-engine —
# then converts to double through an exact integer/fraction SPLIT —
# DuckDB's decimal→double goes via double(int128)/10^scale, which loses
# bits once the scaled value passes 2^53, while Spark's BigDecimal path
# is correctly rounded; splitting floor+fraction makes both sides do
# only correctly-rounded conversions), and a constant-size Cramer solve
# runs as identical double expression trees on both engines. THE scale
# pattern for linear models at 100 TB: the data is touched once,
# map-side-combined, and the solve is O(k³) on k=3 numbers — no
# iterative passes, no driver-side data. r² from the same moments.
sql_query("ml_ols_normal_equations", _OLS_SQL, oracle="same")


# Funnel analysis: strictly-ordered stage progression per user. One
# conditional aggregate per user collapses the event stream to first-
# occurrence timestamps (min-by-type — O(rows) map-side combinable),
# then the stage tests are pure timestamp comparisons; counting is
# exact integers. The user-level pivot is the 100 TB shape: no
# event-to-event self-join, no window over the raw stream — a funnel
# over 10^12 events is one hash aggregate on user_id plus a constant-
# width reduction. Conversion ratio = single double division.
# (round 11: this 4-stage funnel predated batch_windows'
# events_funnel_conversion and was silently shadowed by it — the
# duplicate-name guard surfaced the pair; it now lives under its own
# name and is gated like any other query)
sql_query(
    "events_funnel_stages",
    """
WITH stages AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
), flags AS (
  SELECT
    CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END AS s0,
    CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
         THEN 1 ELSE 0 END AS s1,
    CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
          AND t_click > t_view THEN 1 ELSE 0 END AS s2,
    CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
          AND t_click > t_view AND t_purchase > t_click
         THEN 1 ELSE 0 END AS s3
  FROM stages
)
SELECT CAST(SUM(s0) AS BIGINT) AS n_signup,
       CAST(SUM(s1) AS BIGINT) AS n_viewed_after_signup,
       CAST(SUM(s2) AS BIGINT) AS n_clicked_after_view,
       CAST(SUM(s3) AS BIGINT) AS n_purchased_after_click,
       CAST(SUM(s3) AS DOUBLE) / CAST(SUM(s0) AS DOUBLE) AS conversion
FROM flags
""",
)


_COHORT_TEMPLATE = """
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
)
SELECT f.cohort,
       CAST({WEEKDIFF} AS INT) AS week_n,
       CAST(COUNT(*) AS BIGINT) AS active_users
FROM first_seen f JOIN activity a ON f.user_id = a.user_id
GROUP BY f.cohort, {WEEKDIFF}
ORDER BY cohort, week_n
"""

# Retention cohorts: signup week × weeks-since-signup retention
# triangle. Two hash aggregates (first-seen per user; distinct
# user-weeks — both map-side combinable) and one join keyed on user_id
# — co-partitioned, no row-pair blowup; the output is O(weeks²)
# regardless of event count. Weekly buckets via date_trunc (ISO Monday
# weeks in both engines); week index is exact integer day arithmetic.
sql_query(
    "events_retention_cohorts",
    _COHORT_TEMPLATE.format(WEEKDIFF="datediff(a.wk, f.cohort) DIV 7"),
    oracle=_COHORT_TEMPLATE.format(WEEKDIFF="datediff('day', f.cohort, a.wk) // 7"),
)


# Ridge regression (L2-shrunk least squares), closed form for one
# feature: β_ridge = Sxy_c / (Sxx_c + λ) over mean-centered moments,
# with the unpenalized OLS slope alongside so the shrinkage is visible.
# Same scale discipline as ml_ols_normal_equations: ONE exact-decimal
# aggregate pass builds the moments (split-converted to double), the
# solve is O(1) double math written with identical expression text in
# both engines. λ = 1000 is part of the operator contract (≈0.2%
# shrinkage on the part fixture — small but nonzero by construction).
_RIDGE_SQL = """
WITH t AS (
  SELECT CAST(p_size AS DOUBLE) AS x, CAST(p_retailprice AS DOUBLE) AS y
  FROM part
), g AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
    (CAST(CAST(FLOOR(SUM(CAST(x AS DECIMAL(38,12)))) AS BIGINT) AS DOUBLE) + CAST(SUM(CAST(x AS DECIMAL(38,12))) - FLOOR(SUM(CAST(x AS DECIMAL(38,12)))) AS DOUBLE)) AS sx,
    (CAST(CAST(FLOOR(SUM(CAST(y AS DECIMAL(38,12)))) AS BIGINT) AS DOUBLE) + CAST(SUM(CAST(y AS DECIMAL(38,12))) - FLOOR(SUM(CAST(y AS DECIMAL(38,12)))) AS DOUBLE)) AS sy,
    (CAST(CAST(FLOOR(SUM(CAST(x * x AS DECIMAL(38,12)))) AS BIGINT) AS DOUBLE) + CAST(SUM(CAST(x * x AS DECIMAL(38,12))) - FLOOR(SUM(CAST(x * x AS DECIMAL(38,12)))) AS DOUBLE)) AS sxx,
    (CAST(CAST(FLOOR(SUM(CAST(x * y AS DECIMAL(38,12)))) AS BIGINT) AS DOUBLE) + CAST(SUM(CAST(x * y AS DECIMAL(38,12))) - FLOOR(SUM(CAST(x * y AS DECIMAL(38,12)))) AS DOUBLE)) AS sxy
  FROM t
)
SELECT CAST(n AS BIGINT) AS n,
  (sxy - sx * sy / n) / (sxx - sx * sx / n) AS beta_ols,
  (sxy - sx * sy / n) / (sxx - sx * sx / n + 1000.0E0) AS beta_ridge,
  sy / n - ((sxy - sx * sy / n) / (sxx - sx * sx / n + 1000.0E0)) * (sx / n)
    AS alpha_ridge
FROM g
"""

sql_query("ml_ridge_closed_form", _RIDGE_SQL, oracle="same")


# RFM segmentation: the classic recency/frequency/monetary quintile
# grid over purchase events. ONE hash aggregate collapses the stream to
# per-user (recency, frequency, monetary-cents) — exact integers — then
# three NTILE(5) windows rank users with a TOTAL order (metric, then
# user_id) so tile boundaries are deterministic in both engines; the
# output is the ≤125-cell segment grid with exact counts and cents.
# Scale: the windows run over USERS (orders of magnitude below events);
# at 100 TB swap NTILE for width_bucket over approx quantile bounds —
# same grid, no global sort — the exact-NTILE form is what the oracle
# can referee.
_RFM_TEMPLATE = """
WITH hz AS (
  SELECT CAST(MAX(ts) AS DATE) AS h FROM events
), u AS (
  SELECT user_id,
         {DATEDIFF} AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM events CROSS JOIN hz
  WHERE event_type = 'purchase'
  GROUP BY user_id, h
), q AS (
  SELECT user_id, monetary_cents,
         NTILE(5) OVER (ORDER BY recency_days, user_id) AS r_q,
         NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS f_q,
         NTILE(5) OVER (ORDER BY monetary_cents DESC, user_id) AS m_q
  FROM u
)
SELECT r_q, f_q, m_q,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents
FROM q
GROUP BY r_q, f_q, m_q
ORDER BY r_q, f_q, m_q
"""

sql_query(
    "events_rfm_segmentation",
    _RFM_TEMPLATE.format(DATEDIFF="datediff(h, CAST(MAX(ts) AS DATE))"),
    oracle=_RFM_TEMPLATE.format(DATEDIFF="datediff('day', CAST(MAX(ts) AS DATE), h)"),
)


# DAU/MAU stickiness: mean daily actives over monthly actives, per
# month — the one-number engagement ratio. Two hash aggregates off one
# distinct (month, day, user) collapse; all counting exact integers;
# the stickiness division is identical double text. 100 TB: the
# distinct collapse is the only O(events) term and is map-side
# combinable; everything downstream is O(days).
_STICKINESS_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(date_trunc('month', ts) AS DATE) AS mon,
                  CAST(ts AS DATE) AS day, user_id
  FROM events
), dau AS (
  SELECT mon, day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY mon, day
), mau AS (
  SELECT mon, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau FROM du GROUP BY mon
), d AS (
  SELECT mon, CAST(SUM(dau) AS BIGINT) AS sum_dau,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM dau GROUP BY mon
)
SELECT d.mon AS month, sum_dau, n_days, mau,
  CAST(sum_dau AS DOUBLE) / CAST(n_days AS DOUBLE) / CAST(mau AS DOUBLE)
    AS stickiness
FROM d JOIN mau ON d.mon = mau.mon
ORDER BY month
"""

sql_query("events_stickiness_dau_mau", _STICKINESS_SQL, oracle="same")


# Inter-arrival time percentiles per event type — the cadence profile
# (bot-vs-human signal, session design input). Gaps are EXACT integer
# microseconds (epoch-µs differences); per-type median and p90 use the
# distinct-value prefix rule (smallest v whose cumulative weight
# reaches 1/2 resp. 9/10 of the total — the agg_weighted_median shape
# generalized, no interpolation ambiguity). The LAG runs per
# (user, type) stream with a full ORDER BY tiebreak (t, event_id) so
# consecutive-event pairing is deterministic in both engines. Scale:
# one window over each user's own events (co-partitioned by user — the
# stream never globally sorts), one distinct-gap hash aggregate, and
# the percentile windows run over DISTINCT gap values per type.
_INTERARRIVAL_TEMPLATE = """
WITH ev AS (
  SELECT event_type, user_id, event_id, {EPOCHUS} AS t FROM events
), gaps AS (
  SELECT event_type,
         t - LAG(t) OVER (
           PARTITION BY user_id, event_type ORDER BY t, event_id
         ) AS g
  FROM ev
), pv AS (
  SELECT event_type, g AS v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM gaps WHERE g IS NOT NULL GROUP BY event_type, g
), cum AS (
  SELECT event_type, v,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY v) AS cw,
         SUM(cnt) OVER (PARTITION BY event_type) AS tot
  FROM pv
)
SELECT event_type,
       CAST(MIN(tot) AS BIGINT) AS n_gaps,
       CAST(MIN(CASE WHEN 2 * cw >= tot THEN v END) AS BIGINT) AS median_gap_us,
       CAST(MIN(CASE WHEN 10 * cw >= 9 * tot THEN v END) AS BIGINT) AS p90_gap_us
FROM cum
GROUP BY event_type
ORDER BY event_type
"""

sql_query(
    "events_interarrival_percentiles",
    _INTERARRIVAL_TEMPLATE.format(
        EPOCHUS="unix_micros(CAST(ts AS TIMESTAMP))"
    ),
    oracle=_INTERARRIVAL_TEMPLATE.format(EPOCHUS="epoch_us(ts)"),
)


# Per-user training-feature matrix — the feature-engineering pass a
# churn/LTV model consumes, as ONE hash aggregate over the event
# stream (map-side combinable; every feature exact integer or a single
# identical-text double ratio): event volume, distinct active days,
# purchase count, spend cents, recency vs the corpus horizon, and
# events-per-active-day. Bounded deterministic output (user_id < 100).
_FEATURES_TEMPLATE = """
WITH hz AS (
  SELECT CAST(MAX(ts) AS DATE) AS h FROM events
), u AS (
  SELECT user_id,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_purchases,
    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      AS value_cents,
    {RECENCY} AS recency_days
  FROM events CROSS JOIN hz
  GROUP BY user_id, h
)
SELECT user_id, n_events, active_days, n_purchases, value_cents,
       recency_days,
       CAST(n_events AS DOUBLE) / CAST(active_days AS DOUBLE)
         AS events_per_active_day
FROM u
WHERE user_id < 100
ORDER BY user_id
"""

sql_query(
    "events_user_feature_matrix",
    _FEATURES_TEMPLATE.format(RECENCY="datediff(h, CAST(MAX(ts) AS DATE))"),
    oracle=_FEATURES_TEMPLATE.format(
        RECENCY="datediff('day', CAST(MAX(ts) AS DATE), h)"
    ),
)
