"""Skyline (Pareto-optimal) queries — the multi-criteria "best
tradeoffs" operator (cheapest AND biggest, no row dominated on every
dimension). Spark has no built-in skyline; the EDBT 2023 line of work
("Integration of Skyline Queries into Spark SQL", see PAPERS.md)
integrates it as a two-phase operator, which is what this module ships:

1. **local skyline per partition bucket** (applyInPandas, vectorized
   numpy dominance) — each bucket discards its dominated rows
   independently, shrinking n to the union of local skylines;
2. **global skyline over that union** — the same kernel on one group;
   correct because global skyline ⊆ union of local skylines (a globally
   undominated row is undominated in its own bucket).

Scale: phase 1 is one shuffle on the bucket key and O(n·k) work with
k = local skyline size (tiny for correlated dims); phase 2 sees only
Σ local-skyline sizes — at 100 TB the driver-visible set is the final
skyline, never the data. The naive NOT-EXISTS self-join the oracle runs
is O(n²) and exists only to check us at fixture scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries import query
from iceberg_metadata_pipeline_spark.session import load_tables


def _local_skyline(pdf: pd.DataFrame, minimize: list[str], maximize: list[str]) -> pd.DataFrame:
    import numpy as np

    # NATIVE dtypes per dimension — coercing int64 to float64 would merge
    # values above 2^53 and corrupt dominance verdicts; maximized dims
    # flip the comparison direction instead of negating values
    dims = [(pdf[c].to_numpy(), False) for c in minimize]
    dims += [(pdf[c].to_numpy(), True) for c in maximize]
    n = len(pdf)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        if not keep[i]:
            continue
        # rows dominated by i: i at-least-as-good on every dim, strictly
        # better on at least one
        worse_eq = np.ones(n, dtype=bool)
        strictly = np.zeros(n, dtype=bool)
        for a, is_max in dims:
            if is_max:
                worse_eq &= a <= a[i]
                strictly |= a < a[i]
            else:
                worse_eq &= a >= a[i]
                strictly |= a > a[i]
        dominated = worse_eq & strictly
        dominated[i] = False
        keep &= ~dominated
    return pdf[keep]


def skyline(
    df: DataFrame,
    minimize: list[str],
    maximize: list[str],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase distributed skyline (see module docstring)."""
    out_schema = df.schema
    key = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _local_skyline(pdf, minimize, maximize)

    local = (
        df.withColumn("__b", key)
        .groupBy("__b")
        .applyInPandas(lambda pdf: kernel(pdf.drop(columns=["__b"])), out_schema)
    )
    return (
        local.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(lambda pdf: kernel(pdf.drop(columns=["__g"])), out_schema)
    )


@query(
    "skyline_pareto_parts",
    """
SELECT a.p_partkey, a.p_retailprice, a.p_size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
)
ORDER BY a.p_partkey
""",
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts: minimize price, maximize size. The
    skyline set is unique, so the two-phase plan and the oracle's
    quadratic NOT EXISTS agree exactly."""
    part = load_tables(spark, sf_dir)["part"].select(
        "p_partkey", "p_retailprice", "p_size"
    )
    return skyline(
        part, minimize=["p_retailprice"], maximize=["p_size"]
    ).orderBy("p_partkey")
