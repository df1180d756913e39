"""Embedding-column operations for a training-data pipeline (SURVEY.md
§2.C multimodal/embedding surface): L2 normalization, int8 quantization,
and per-label centroids — the storage/serving transforms that sit between
"model wrote vectors" and "ANN index reads them".

All three are pure map-side expressions over the `embedding` column
(array<float>), JVM-side higher-order functions — no Python in the row
path, no shuffle except the centroid's groupBy. At 100 TB of vectors:

- normalize/quantize are O(rows) map work that fuses into the scan via
  whole-stage codegen; quantization cuts vector bytes 4× before any
  shuffle or index build touches them;
- the centroid shuffles one (label, pos, partial-sum) row per dimension
  per map task (partial aggregation), never raw vectors.

Determinism: dot/norm folds are sequential (`aggregate` in Spark,
`list_reduce` in DuckDB — both left folds with identical association
order); centroid sums go through DECIMAL(38,12). Outputs are scalar
columns only (the driver's canonicalizer cannot hash arrays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_metadata_pipeline_spark.queries import query, sql_query
from iceberg_metadata_pipeline_spark.session import load_tables

# L2 norm as a sequential double fold — identical association order in
# both engines, so sqrt of bit-identical sums is bit-identical
_SPARK_NORM = """
sqrt(aggregate(transform(CAST(embedding AS ARRAY<DOUBLE>), x -> x * x),
               CAST(0 AS DOUBLE), (acc, x) -> acc + x))
"""
_DUCK_NORM = """
sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                 (acc, x) -> acc + x))
"""

sql_query(
    "embed_l2_normalize",
    f"""
SELECT vec_id,
       size(embedding) AS dim,
       round({_SPARK_NORM}, 9) AS l2_norm,
       round(CAST(embedding[0] AS DOUBLE) / {_SPARK_NORM}, 9) AS e0_normalized
FROM embeddings
ORDER BY vec_id
""",
    oracle=f"""
SELECT vec_id,
       len(embedding) AS dim,
       round({_DUCK_NORM}, 9) AS l2_norm,
       round(CAST(embedding[1] AS DOUBLE) / {_DUCK_NORM}, 9) AS e0_normalized
FROM embeddings
ORDER BY vec_id
""",
)

# int8 quantization: symmetric per-vector scale = 127 / max|x|. The
# digest (sum/min/max of the quantized ints) is exact integer arithmetic,
# so the oracle comparison is order-independent; max|x| is a comparison,
# not a sum. nullif guards the all-zero vector.
_SPARK_SCALE = """
(CAST(127 AS DOUBLE) / nullif(array_max(transform(
    CAST(embedding AS ARRAY<DOUBLE>), x -> abs(x))), CAST(0 AS DOUBLE)))
"""
_DUCK_SCALE = """
(CAST(127 AS DOUBLE) / nullif(list_max(list_transform(
    embedding, x -> abs(CAST(x AS DOUBLE)))), CAST(0 AS DOUBLE)))
"""

sql_query(
    "embed_quantize_int8",
    f"""
SELECT vec_id,
       round({_SPARK_SCALE}, 9) AS scale,
       aggregate(transform(CAST(embedding AS ARRAY<DOUBLE>),
                           x -> CAST(round(x * {_SPARK_SCALE}) AS BIGINT)),
                 CAST(0 AS BIGINT), (acc, x) -> acc + x) AS q_sum,
       array_min(transform(CAST(embedding AS ARRAY<DOUBLE>),
                           x -> CAST(round(x * {_SPARK_SCALE}) AS BIGINT))) AS q_min,
       array_max(transform(CAST(embedding AS ARRAY<DOUBLE>),
                           x -> CAST(round(x * {_SPARK_SCALE}) AS BIGINT))) AS q_max
FROM embeddings
ORDER BY vec_id
""",
    oracle=f"""
SELECT vec_id,
       round({_DUCK_SCALE}, 9) AS scale,
       list_reduce(list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * {_DUCK_SCALE}) AS BIGINT)),
                   (acc, x) -> acc + x) AS q_sum,
       list_min(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * {_DUCK_SCALE}) AS BIGINT))) AS q_min,
       list_max(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * {_DUCK_SCALE}) AS BIGINT))) AS q_max
FROM embeddings
ORDER BY vec_id
""",
)

# per-label centroid over the first 4 dimensions: posexplode → partial
# decimal sums per (label, pos) — the shuffle carries one row per
# (label, dim) per map task, never vectors
sql_query(
    "embed_centroid_per_label",
    """
SELECT label, pos,
       CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS centroid
FROM (
  SELECT label, posexplode(CAST(embedding AS ARRAY<DOUBLE>)) AS (pos, v)
  FROM embeddings
) t
WHERE pos < 4
GROUP BY label, pos
ORDER BY label, pos
""",
    oracle="""
SELECT label, t.i - 1 AS pos,
       CAST(SUM(CAST(CAST(embedding[t.i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS centroid
FROM embeddings, range(1, 5) t(i)
GROUP BY label, pos
ORDER BY label, pos
""",
)


@query("embed_kmeans_clusters", None)  # ML-trained quantizer → rows-only
def embed_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus clustering profile: the IVF coarse quantizer's k-means
    partitioning of the embedding space, reported as label-free ranked
    cluster sizes (stable under centroid label permutation). The
    data-curation read on this: cluster-size skew is the first signal of
    duplicated/templated content regions. Training is the bounded-sample
    Spark ML job the IVF index already uses; assignment is a pure JVM
    map — no new scale surface."""
    from iceberg_metadata_pipeline_spark.llmops.similarity import ivf_assignments

    emb = load_tables(spark, sf_dir)["embeddings"]
    assigned, _centroids = ivf_assignments(emb, nlist=8)
    sizes = assigned.groupBy("list_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    total = emb.count()
    w = Window.orderBy(F.desc("cluster_size"), "list_id")
    return (
        sizes.select(
            F.row_number().over(w).alias("size_rank"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.round(F.col("cluster_size") / F.lit(total), 6).alias("share"),
        )
        .orderBy("size_rank")
    )


# --- Matryoshka truncation evaluation --------------------------------------
# MRL-style embeddings keep most retrieval quality in a prefix of the
# dimensions; before switching a 100 TB ANN index to truncated vectors
# (4x less memory at 16/64 dims) you measure retrieval overlap@k between
# full-dim and truncated rankings. Both rankings are exact brute-force
# cosine over a fixed query set (deterministic: ordered-fold arithmetic,
# ties broken by cand_id), so the overlap count is oracle-exact.
from iceberg_metadata_pipeline_spark.llmops.similarity import (  # noqa: E402
    _DUCK_COS,
    _SPARK_COS,
)

sql_query(
    "embed_matryoshka_overlap",
    f"""
WITH trunc AS (
  SELECT vec_id, slice(CAST(embedding AS ARRAY<DOUBLE>), 1, 16) AS embedding
  FROM embeddings
),
fr AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY {_SPARK_COS} DESC, c.vec_id) AS rn
  FROM embeddings q JOIN embeddings c
    ON q.vec_id < 8 AND c.vec_id <> q.vec_id
),
hr AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY {_SPARK_COS} DESC, c.vec_id) AS rn
  FROM trunc q JOIN trunc c
    ON q.vec_id < 8 AND c.vec_id <> q.vec_id
)
SELECT f.query_id,
       CAST(SUM(CASE WHEN h.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS INT)
         AS overlap_at_5
FROM (SELECT * FROM fr WHERE rn <= 5) f
LEFT JOIN (SELECT * FROM hr WHERE rn <= 5) h
  ON f.query_id = h.query_id AND f.cand_id = h.cand_id
GROUP BY f.query_id
ORDER BY f.query_id
""",
    oracle=f"""
WITH trunc AS (
  SELECT vec_id, embedding[1:16] AS embedding FROM embeddings
),
fr AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY {_DUCK_COS} DESC, c.vec_id) AS rn
  FROM embeddings q JOIN embeddings c
    ON q.vec_id < 8 AND c.vec_id <> q.vec_id
),
hr AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY {_DUCK_COS} DESC, c.vec_id) AS rn
  FROM trunc q JOIN trunc c
    ON q.vec_id < 8 AND c.vec_id <> q.vec_id
)
SELECT f.query_id,
       CAST(SUM(CASE WHEN h.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS INT)
         AS overlap_at_5
FROM (SELECT * FROM fr WHERE rn <= 5) f
LEFT JOIN (SELECT * FROM hr WHERE rn <= 5) h
  ON f.query_id = h.query_id AND f.cand_id = h.cand_id
GROUP BY f.query_id
ORDER BY f.query_id
""",
)
