"""Manual skew mitigation: salted joins (SCALE.md "knobs that move first").

AQE skew-join splitting handles moderate skew transparently
(tests/test_plans.py::test_aqe_splits_skewed_join). When one key is so hot
that even split sub-partitions overwhelm a task — the classic null-key or
default-value pathology at 100 TB — salting is the manual fallback:

    left  rows get a uniform salt in [0, n)           (map-only)
    right rows are replicated once per salt value     (×n, map-only)
    join on (key, salt)                               (hot key now spreads
                                                       over n partitions)

Correct for inner/left joins on any key distribution; the cost is ×n
replication of the right side, so salt only the hot keys in practice
(split the input on a hot-key list, salt that slice, union the results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with an n-way salt spreading each left key over
    ``n_salts`` shuffle partitions. Result is identical to
    ``left.join(right, on, how)`` (asserted in tests)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (right side is replicated)")
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    l = left.withColumn(SALT_COL, F.floor(F.rand(42) * n_salts).cast("int"))
    r = right.withColumn(SALT_COL, F.explode(salts))
    return l.join(r, [*on, SALT_COL], how).drop(SALT_COL)


def salted_join_hot_keys(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    hot_keys: DataFrame,
    n_salts: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Production form: salt ONLY the hot keys (``hot_keys`` is a small
    DataFrame of the ``on`` columns — e.g. from a count-topk profile pass),
    join the cold remainder normally, union. Replication cost becomes
    ×n_salts on the hot keys' right-side rows only."""
    hk = F.broadcast(hot_keys.select(*on).distinct())
    l_hot = left.join(hk, on, "left_semi")
    l_cold = left.join(hk, on, "left_anti")
    r_hot = right.join(hk, on, "left_semi")
    r_cold = right.join(hk, on, "left_anti")
    hot = salted_join(l_hot, r_hot, on, n_salts, how)
    cold = l_cold.join(r_cold, on, how)
    return hot.unionByName(cold)


def salted_two_stage_agg(
    df: DataFrame,
    keys: list[str],
    sum_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys: stage 1 aggregates on
    (key, salt) — the hot key spreads over ``n_salts`` shuffle partitions
    — stage 2 folds the per-salt partials into final (count, sum) per
    key. Identical result to a direct groupBy (decimal sums make the fold
    order-independent). Note Spark's map-side partial aggregation already
    gives this effect for built-in aggregates; the explicit form is for
    the cases partial agg can't save: high-cardinality accumulators
    (collect/distinct-style) or a reduce genuinely dominated by one key's
    final-stage row volume."""
    salted = df.withColumn(SALT_COL, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts)))
    partial = salted.groupBy(*keys, SALT_COL).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(sum_col).cast("decimal(38,6)")).alias("__s"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n"),
        F.sum("__s").cast("double").alias("total"),
    )



def binned_range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Interval join as an equi-join (the range-bin trick): fact rows map
    to one bin; each band replicates to every bin it overlaps (⌈width/
    bin_width⌉ copies — pick bin_width ≈ median band width so that's
    ~2). The join then shuffles on the BIN KEY like any equi-join and the
    exact BETWEEN applies as a post-filter. Without this, Spark plans an
    interval join as broadcast-nested-loop — O(fact × bands) compares,
    the 100 TB killer. Same result as the naive theta join (asserted in
    tests and by the declared query's oracle)."""
    f = fact.withColumn("__bin", F.floor(F.col(value_col) / F.lit(bin_width)).cast("long"))
    b = bands.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    return (
        f.join(b, "__bin")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col)))
        .drop("__bin")
    )
