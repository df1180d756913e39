"""As-of join — the one join shape SURVEY.md §2.B marks absent from Spark
("as-of joins: not in reference; north-star events model").

Spark has no native ASOF JOIN physical operator (DuckDB does, which makes
it a perfect oracle). The scalable composition is the union-merge pattern:

    tag left/right → align schemas → union → per-key window ordered by
    (ts, right-first tiebreak) → last(right_value, ignorenulls) → keep
    left rows

One shuffle on the partition key, one sort within partitions — exactly
the plan a native as-of merge-join would want. The alternative (range
join per pair) is O(left × right-window) and skew-fragile; the union
pattern is O((L+R) log per-partition) and AQE-skew-splittable.

At 100 TB: partition by the equi-key (user/symbol); the sort is within
key groups. A billion-row right side adds a linear union input, never a
quadratic candidate set. Tolerance bounds (``within``) are applied as a
post-filter on the matched timestamp — state never grows with it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_metadata_pipeline_spark.queries import query
from iceberg_metadata_pipeline_spark.session import load_tables


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    by: list[str],
    value_cols: list[str],
    direction: str = "backward",
    suffix: str = "_right",
    within: str | None = None,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row
    with right.ts <= left.ts (direction='backward'; 'forward' = earliest
    right row at-or-after; 'nearest' = whichever side is closer, exact
    match preferred, backward on distance ties — pandas merge_asof
    semantics), matching on the ``by`` equi-keys.

    ``within`` (an SQL interval body, e.g. ``"10 MINUTES"``) bounds the
    match distance: farther matches null out, exactly merge_asof's
    ``tolerance``. Applied as a projection on the matched timestamp —
    window state never grows with the tolerance.

    Returns all left columns plus ``<col><suffix>`` for each value col and
    ``<ts><suffix>`` (the matched right timestamp, null if no match).

    All three directions run in ONE union + ONE shuffle + ONE sort:
    backward is last(ignorenulls) over the preceding frame, forward is
    first(ignorenulls) over the following frame of the SAME ascending
    sort (an exact-ts right row sorts before the left row, so it lands in
    the preceding frame; the forward/nearest paths recover exact matches
    from the backward candidate rather than re-sorting).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction}"
        )

    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias(f"{ts}{suffix}"),
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (ts, *by) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(ts).alias(f"{ts}{suffix}"),
    )
    unioned = tagged_l.unionByName(tagged_r)

    # ONE ascending sort serves every direction: right rows sort before
    # left rows at equal ts, so the exact match is always in the
    # backward frame and never in the forward frame
    order = [F.col(ts).asc(), F.col("_is_left").asc()]
    w_bwd = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    picked = {}
    for c in [*value_cols, ts]:
        picked[f"__b_{c}"] = F.last(f"{c}{suffix}", ignorenulls=True).over(w_bwd)
        picked[f"__f_{c}"] = F.first(f"{c}{suffix}", ignorenulls=True).over(w_fwd)
    out = unioned.select(*lcols, "_is_left", *[e.alias(n) for n, e in picked.items()])
    out = out.filter(F.col("_is_left") == 1).drop("_is_left")

    b_ts, f_ts = F.col(f"__b_{ts}"), F.col(f"__f_{ts}")
    lt = F.col(ts)
    if within is not None:
        tol = F.expr(f"INTERVAL {within}")
        b_ok = b_ts.isNotNull() & (lt.cast("timestamp") - b_ts.cast("timestamp") <= tol)
        f_ok = f_ts.isNotNull() & (f_ts.cast("timestamp") - lt.cast("timestamp") <= tol)
    else:
        b_ok = b_ts.isNotNull()
        f_ok = f_ts.isNotNull()

    if direction == "backward":
        use_b = b_ok
        f_ok = F.lit(False)  # never fall through to the forward candidate
    elif direction == "forward":
        # an exact-ts right row was captured by the BACKWARD frame; the
        # forward direction must still honor it (distance 0)
        use_b = b_ok & (b_ts == lt)
        f_ok = f_ok & ~use_b
    else:  # nearest: closer side wins; exact/backward wins distance ties
        b_dist = lt.cast("timestamp") - b_ts.cast("timestamp")
        f_dist = f_ts.cast("timestamp") - lt.cast("timestamp")
        use_b = b_ok & (~f_ok | (b_dist <= f_dist))
        f_ok = f_ok & ~use_b

    cols = list(lcols)
    for c in [*value_cols, ts]:
        cols.append(
            F.when(use_b, F.col(f"__b_{c}"))
            .when(f_ok, F.col(f"__f_{c}"))
            .alias(f"{c}{suffix}")
        )
    return out.select(*cols)


@query(
    "join_asof_events",
    # DuckDB has a native ASOF JOIN — the strongest possible oracle for an
    # operator Spark itself lacks
    """
SELECT c.event_id, c.user_id, c.ts, v.value AS view_value, v.ts AS ts_right
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
ORDER BY c.user_id, c.ts, c.event_id
""",
)
def join_asof_events(spark, sf_dir: str) -> DataFrame:
    """Each click sees the latest view of the same user at-or-before it."""
    events = load_tables(spark, sf_dir)["events"]
    clicks = events.filter(F.col("event_type") == "click")
    views = events.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    joined = asof_join(
        clicks, views, ts="ts", by=["user_id"], value_cols=["value"], suffix="_right"
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("value_right").alias("view_value"),
        "ts_right",
    ).orderBy("user_id", "ts", "event_id")


@query(
    "join_asof_forward",
    """
SELECT c.event_id, c.user_id, c.ts, v.value AS next_view_value, v.ts AS ts_right
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts <= v.ts
ORDER BY c.user_id, c.ts, c.event_id
""",
)
def join_asof_forward(spark, sf_dir: str) -> DataFrame:
    """Forward as-of: each click sees the EARLIEST view of the same user
    at-or-after it (the label-lookahead shape in ML feature pipelines).
    DuckDB's ASOF with the flipped inequality is the oracle."""
    events = load_tables(spark, sf_dir)["events"]
    clicks = events.filter(F.col("event_type") == "click")
    views = events.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    joined = asof_join(
        clicks,
        views,
        ts="ts",
        by=["user_id"],
        value_cols=["value"],
        direction="forward",
        suffix="_right",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("value_right").alias("next_view_value"),
        "ts_right",
    ).orderBy("user_id", "ts", "event_id")


@query(
    "join_point_in_time_scd2",
    # DuckDB's native ASOF JOIN states the point-in-time semantics exactly
    """
WITH dim AS (
  SELECT c_custkey, TIMESTAMP '1990-01-01 00:00:00' AS vfrom,
         c_mktsegment AS seg
  FROM customer
  UNION ALL
  SELECT c_custkey,
         TIMESTAMP '1995-06-01 00:00:00' + (c_custkey % 365) * INTERVAL 1 DAY,
         c_mktsegment || '_V2'
  FROM customer
), j AS (
  SELECT o.o_totalprice, d.seg
  FROM orders o
  ASOF JOIN dim d
    ON o.o_custkey = d.c_custkey AND CAST(o.o_orderdate AS TIMESTAMP) >= d.vfrom
)
SELECT seg AS eff_segment, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM j
GROUP BY seg
ORDER BY eff_segment
""",
)
def join_point_in_time_scd2(spark, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join against an SCD2 dimension: each fact
    row joins the dimension VERSION that was valid at the fact's
    timestamp — the correct-history join every warehouse needs and naive
    equi-joins silently get wrong (they'd pick today's version for 1993
    orders).

    Implementation is the as-of kernel: version rows and facts share one
    shuffle on the business key and one ascending sort on (key, ts);
    each fact picks the latest version at-or-before it via
    last(ignorenulls) — no BETWEEN range join, no per-fact subquery.
    At 100 TB the dimension's version count rides the same shuffle as
    the facts; nothing is quadratic in versions."""
    from pyspark.sql import functions as F

    from iceberg_metadata_pipeline_spark.session import load_tables

    t = load_tables(spark, sf_dir)
    cust = t["customer"]
    v1 = cust.select(
        F.col("c_custkey").alias("o_custkey"),
        F.expr("TIMESTAMP '1990-01-01 00:00:00'").alias("ts"),
        F.col("c_mktsegment").alias("seg"),
    )
    v2 = cust.select(
        F.col("c_custkey").alias("o_custkey"),
        F.expr(
            "TIMESTAMP '1995-06-01 00:00:00' + INTERVAL 1 DAY * CAST(c_custkey % 365 AS INT)"
        ).alias("ts"),
        F.concat(F.col("c_mktsegment"), F.lit("_V2")).alias("seg"),
    )
    dim = v1.unionByName(v2)
    facts = t["orders"].select(
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").alias("ts"),
        "o_totalprice",
    )
    j = asof_join(facts, dim, ts="ts", by=["o_custkey"], value_cols=["seg"])
    return (
        j.groupBy(F.col("seg_right").alias("eff_segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("eff_segment")
    )
