"""The remaining pandas-UDF variants (SURVEY.md §2.B UDF surface:
"pandas_udf (scalar + grouped-agg)"). mapInPandas / applyInPandas /
applyInPandasWithState live in llmops/ and streaming/; these are the
SCALAR (vectorized expression) and GROUPED_AGG (vectorized aggregate)
forms.

Scale notes: scalar pandas UDFs evaluate per Arrow batch inside the task
(no shuffle introduced); grouped-agg UDFs require the group's rows
co-located — same shuffle as a built-in aggregate but WITHOUT map-side
partial aggregation (the Python aggregate is a black box to Catalyst), so
shuffle volume is O(rows), not O(groups). Use built-ins whenever the
aggregate is expressible; reach for grouped-agg only for genuinely custom
math (here: geometric mean)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType

from iceberg_metadata_pipeline_spark.queries import query
from iceberg_metadata_pipeline_spark.session import load_tables

# DataType objects (not DDL strings) so module import never needs an
# active SparkSession: _parse_datatype_string requires a live context,
# and the driver may enumerate queries() before building one.


@pandas_udf(DoubleType())
def vowel_ratio(s: pd.Series) -> pd.Series:
    """SCALAR pandas UDF: vectorized over Arrow batches."""
    low = s.str.lower()
    return low.str.count("[aeiou]") / low.str.len().clip(lower=1)


@pandas_udf(DoubleType())
def geo_mean(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: one float per group (log-mean-exp).

    Round 10 — oracle-exact: logs fold in SORTED order via libm
    math.log (DuckDB's LN is the same libm on this host; numpy's SIMD
    log was the drift source that kept this rows-only), mirroring the
    oracle's list_reduce(list_sort(list(LN(x))))/n → EXP step for step;
    the registered query additionally ROUNDs, so even a stray ulp can't
    surface."""
    import math

    xs = [float(u) for u in v if u is not None and u > 0]
    if not xs:
        return 0.0
    t = 0.0
    for u in sorted(math.log(x) for x in xs):
        t += u
    return math.exp(t / float(len(xs)))


@pandas_udf(LongType())
def pd_count(v: pd.Series) -> int:
    """GROUPED_AGG count: Spark forbids mixing grouped-agg pandas UDFs
    with JVM aggregates in one aggregate, so the count rides along as a
    pandas aggregate too."""
    return int(len(v))


_PD_GROUPED_ORACLE = """
WITH vr AS (
  SELECT lang,
    CAST(len(regexp_extract_all(lower(text), '[aeiou]')) AS DOUBLE)
      / CAST(GREATEST(length(text), 1) AS DOUBLE) AS vr,
    CAST(n_chars AS DOUBLE) AS ch
  FROM documents
), g AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
    list_reduce(list_sort(list(LN(vr)) FILTER (WHERE vr > 0)),
                (a, x) -> a + x) AS s_vr,
    CAST(COUNT(*) FILTER (WHERE vr > 0) AS BIGINT) AS n_vr,
    list_reduce(list_sort(list(LN(ch)) FILTER (WHERE ch > 0)),
                (a, x) -> a + x) AS s_ch,
    CAST(COUNT(*) FILTER (WHERE ch > 0) AS BIGINT) AS n_ch
  FROM vr GROUP BY lang
)
SELECT lang, n,
  ROUND(CASE WHEN n_vr = 0 THEN 0.0E0
             ELSE EXP(s_vr / CAST(n_vr AS DOUBLE)) END, 6)
    AS geo_mean_vowel_ratio,
  ROUND(CASE WHEN n_ch = 0 THEN 0.0E0
             ELSE EXP(s_ch / CAST(n_ch AS DOUBLE)) END, 2) AS geo_mean_chars
FROM g ORDER BY lang
"""


@query("udf_pandas_scalar_grouped", _PD_GROUPED_ORACLE)
def udf_pandas_scalar_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar UDF in the projection + grouped-agg UDF in the aggregate —
    the two remaining cells of the pandas-UDF matrix. Round 10: full
    value oracle (the geo_mean kernel folds sorted libm logs — see its
    docstring)."""
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.withColumn("vr", vowel_ratio(F.col("text")))
        .groupBy("lang")
        .agg(
            pd_count(F.col("doc_id")).alias("n"),
            F.round(geo_mean(F.col("vr")), 6).alias("geo_mean_vowel_ratio"),
            F.round(geo_mean(F.col("n_chars").cast("double")), 2).alias("geo_mean_chars"),
        )
        .orderBy("lang")
    )


def cogroup_reconcile(orders: DataFrame, lineitem: DataFrame, n_buckets: int = 32) -> DataFrame:
    """COGROUPED_MAP pandas: both sides shuffle on the key, and each
    key's (orders-rows, lineitem-rows) pair lands in ONE Python call —
    the reconciliation shape (ledger-vs-entries, header-vs-detail) that
    plain groupBy can't express without first joining.

    Scale shape: the cogroup key is a BOUNDED bucket (pmod of the join
    key, n_buckets groups total), NOT the raw order key. Cogrouping on
    the raw key creates one pandas invocation per order — millions of
    tiny Python calls at scale (measured 77 s at sf0.01 before this
    re-grain, <2 s after; same output, same shuffle volume). Bucketing
    keeps every order's rows co-located in one call (pmod is a function
    of the key) while the per-order reconcile runs VECTORIZED inside
    the kernel via pandas groupby/merge."""

    def reconcile(key, orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame) -> pd.DataFrame:
        if orders_pdf.empty:
            # cogroup iterates keys from EITHER side; detail rows without
            # a header are out of scope (LEFT-join-from-orders semantics)
            return pd.DataFrame(
                {"o_orderkey": pd.Series([], dtype="int64"),
                 "n_lines": pd.Series([], dtype="int64"),
                 "total_qty": pd.Series([], dtype="float64")}
            )
        if lines_pdf.empty:
            agg = pd.DataFrame(
                {"l_orderkey": pd.Series([], dtype="int64"),
                 "n_lines": pd.Series([], dtype="int64"),
                 "total_qty": pd.Series([], dtype="float64")}
            )
        else:
            agg = (
                lines_pdf.groupby("l_orderkey", as_index=False)
                .agg(n_lines=("l_quantity", "size"), total_qty=("l_quantity", "sum"))
            )
            agg["total_qty"] = agg["total_qty"].astype("float64")
        out = orders_pdf[["o_orderkey"]].merge(
            agg, left_on="o_orderkey", right_on="l_orderkey", how="left"
        )
        return pd.DataFrame(
            {
                "o_orderkey": out["o_orderkey"].astype("int64"),
                "n_lines": out["n_lines"].fillna(0).astype("int64"),
                "total_qty": out["total_qty"].fillna(0.0).astype("float64"),
            }
        )

    o_b = orders.select("o_orderkey").withColumn(
        "bucket", F.pmod(F.col("o_orderkey"), F.lit(n_buckets))
    )
    # cast the decimal JVM-side: Arrow ships decimals as Python objects,
    # which makes the pandas kernel ~3× slower than float64 columns
    # (quantities are integral-valued, so double is exact)
    l_b = lineitem.select(
        "l_orderkey", F.col("l_quantity").cast("double").alias("l_quantity")
    ).withColumn("bucket", F.pmod(F.col("l_orderkey"), F.lit(n_buckets)))
    return (
        o_b.groupBy("bucket")
        .cogroup(l_b.groupBy("bucket"))
        .applyInPandas(
            reconcile, "o_orderkey long, n_lines long, total_qty double"
        )
    )


@query(
    "udf_cogroup_reconcile",
    """
SELECT o.o_orderkey,
       COUNT(l.l_orderkey) AS n_lines,
       COALESCE(CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE), 0.0)
         AS total_qty
FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey
ORDER BY o.o_orderkey
LIMIT 500
""",
)
def udf_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header/detail reconciliation via cogrouped applyInPandas: per
    order, line count and quantity total from the cogrouped lineitem
    side (orders without lines report zeros, which the oracle states as
    a LEFT JOIN + COALESCE). Quantities are integral-valued doubles, so
    the pandas sum is exact and order-independent."""
    t = load_tables(spark, sf_dir)
    return (
        cogroup_reconcile(t["orders"], t["lineitem"])
        .orderBy("o_orderkey")
        .limit(500)
    )


def embedding_norms_arrow(df: DataFrame) -> DataFrame:
    """Per-vector squared-norm in integer micro-units via ``mapInArrow``.

    Arrow-native map path: each batch arrives as a ``pyarrow.RecordBatch``
    (zero pandas conversion — cheaper than mapInPandas for fixed-width
    math), numpy computes per-DIMENSION ``floor(x_d^2 * 1e6)`` and sums
    the resulting int64s. Flooring each term before the sum makes the
    result order-independent exact integer arithmetic — the same value
    on any engine, any partitioning, any SIMD summation order.
    """
    import pyarrow as pa

    def kernel(batches):
        import numpy as np

        for batch in batches:
            ids = batch.column("vec_id")
            emb = batch.column("embedding")
            mat = np.asarray(emb.to_pylist(), dtype=np.float64)
            micro = np.floor(mat * mat * 1_000_000.0).astype(np.int64).sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(micro, type=pa.int64()),
                 pa.array([mat.shape[1]] * len(micro), type=pa.int32())],
                names=["vec_id", "norm_sq_micro", "n_dims"],
            )

    return df.mapInArrow(kernel, "vec_id long, norm_sq_micro long, n_dims int")


@query(
    "udf_map_in_arrow",
    """
SELECT vec_id,
       CAST(list_sum(list_transform(embedding,
              x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
            AS BIGINT) AS norm_sq_micro,
       CAST(len(embedding) AS INT) AS n_dims
FROM embeddings
ORDER BY vec_id
LIMIT 500
""",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (Arrow-batch map, no pandas hop): exact integer
    squared norms of the embedding column."""
    t = load_tables(spark, sf_dir)
    out = embedding_norms_arrow(t["embeddings"])
    return out.orderBy("vec_id").limit(500)


@query(
    "udf_apply_in_arrow",
    """
SELECT label,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT))
            AS BIGINT) AS first_dim_micro_sum
FROM embeddings
GROUP BY label
ORDER BY label
""",
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().applyInArrow — grouped Arrow-table kernel (one shuffle
    on the group key); integer micro-unit sums keep it engine-exact."""
    import pyarrow as pa

    def kernel(table: "pa.Table") -> "pa.Table":
        import numpy as np

        label = table.column("label")[0].as_py()
        first = np.asarray(
            [v[0] for v in table.column("embedding").to_pylist()], dtype=np.float64
        )
        micro = int(np.floor(first * 1_000_000.0).astype(np.int64).sum())
        return pa.table(
            {
                "label": pa.array([label], type=pa.int32()),
                "n": pa.array([table.num_rows], type=pa.int64()),
                "first_dim_micro_sum": pa.array([micro], type=pa.int64()),
            }
        )

    t = load_tables(spark, sf_dir)
    out = (
        t["embeddings"]
        .groupBy("label")
        .applyInArrow(kernel, "label int, n long, first_dim_micro_sum long")
    )
    return out.orderBy("label")
