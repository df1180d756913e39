"""Sequence packing for LLM pretraining batches (SURVEY.md §2.C scope:
"operations a large-scale training-data pipeline would need").

Concat-and-chunk packing — the strategy GPT-style pretraining uses at
scale: order documents deterministically, concatenate their token
streams, and cut fixed-length sequences at ``seq_len`` boundaries. A
document's placement is a pure function of the running token offset, so
the whole assignment is one window cumulative sum — no greedy bin-state,
no driver loop.

Scale design (100 TB): a single global ORDER BY window would serialize
on one partition — the classic packing scale-killer. Instead documents
are sharded by a key modulus and packed WITHIN each shard: the window
partitions by shard, so Spark runs one independent cumulative sum per
shard in parallel (shuffle on shard, then a sorted scan). Training jobs
do the same thing — each data-loader worker packs its own shard; global
packing order across shards is neither needed nor wanted. Determinism:
(doc_id % n_shards, doc_id) is reproducible across runs and engines —
resumable preprocessing needs exactly this property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_metadata_pipeline_spark.queries import sql_query


def assign_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    seq_len: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document a (shard, chunk_id, offset): the chunk is the
    ``seq_len`` window its FIRST token lands in after concatenating the
    shard's documents in id order. Documents spanning a boundary belong to
    the chunk they start in (the continuation crosses over, exactly like
    packed pretraining streams)."""
    shard = (F.col(id_col) % n_shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(F.col(id_col), shard, F.col(tokens_col))
        .withColumn("offset", F.sum(tokens_col).over(w) - F.col(tokens_col))
        .withColumn("chunk_id", F.floor(F.col("offset") / seq_len))
    )


# Declarative form over `documents`, with the DuckDB oracle running the
# identical window arithmetic — proves shard-parallel packing is
# deterministic and engine-independent. Output is per-chunk packing stats
# (the packing manifest a training job reads).
_PACK_SPARK = """
WITH toks AS (
  SELECT doc_id, doc_id % 8 AS shard, size(split(text, ' ')) AS n_tokens
  FROM documents
),
placed AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS off
  FROM toks
)
SELECT shard, CAST(FLOOR(off / 2048) AS BIGINT) AS chunk_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM placed
GROUP BY shard, chunk_id
ORDER BY shard, chunk_id
"""

_PACK_DUCK = """
WITH toks AS (
  SELECT doc_id, doc_id % 8 AS shard, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
placed AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS off
  FROM toks
)
SELECT shard, CAST(FLOOR(off / 2048) AS BIGINT) AS chunk_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM placed
GROUP BY shard, chunk_id
ORDER BY shard, chunk_id
"""

sql_query("pipeline_sequence_packing", _PACK_SPARK, oracle=_PACK_DUCK)


# End-to-end pretraining-data preparation as ONE declarative plan:
# quality gate → exact dedup (keep-earliest) → fixed-window chunking →
# corpus totals. Each stage is the declared operator proven elsewhere
# (text_quality_signals / dedup_exact_documents / text_document_chunking);
# this query proves they COMPOSE — the whole pipeline stays one Catalyst
# plan with no materialization barriers, so at 100 TB it runs as
# scan → map-side filter/digest → one dedup shuffle → map-side explode →
# one final aggregate. That composition, not any single stage, is what a
# training-data team actually ships.
sql_query(
    "pipeline_pretrain_prep",
    """
WITH clean AS (
  SELECT doc_id, text FROM documents
  WHERE n_chars >= 64 AND lang IN ('en', 'de', 'fr')
),
dedup AS (
  SELECT MIN(doc_id) AS doc_id, text FROM clean GROUP BY text
),
toks AS (SELECT doc_id, split(text, ' ') AS t FROM dedup),
chunks AS (
  SELECT doc_id,
         size(slice(t, chunk_id * 48 + 1, 64)) AS n_tokens
  FROM (
    SELECT doc_id, t,
           explode(sequence(0, CAST(floor((greatest(size(t) - 64, 0) + 47) / 48) AS INT))) AS chunk_id
    FROM toks
  ) e
)
SELECT COUNT(*) AS n_chunks,
       COUNT(DISTINCT doc_id) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MAX(n_tokens) AS max_chunk_tokens
FROM chunks
""",
    oracle="""
WITH clean AS (
  SELECT doc_id, text FROM documents
  WHERE n_chars >= 64 AND lang IN ('en', 'de', 'fr')
),
dedup AS (
  SELECT MIN(doc_id) AS doc_id, text FROM clean GROUP BY text
),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM dedup),
chunks AS (
  SELECT doc_id,
         len(t[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS n_tokens
  FROM (
    SELECT doc_id, t,
           unnest(generate_series(0, CAST(floor((greatest(len(t) - 64, 0) + 47) / 48) AS BIGINT))) AS chunk_id
    FROM toks
  ) e
)
SELECT COUNT(*) AS n_chunks,
       COUNT(DISTINCT doc_id) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MAX(n_tokens) AS max_chunk_tokens
FROM chunks
""",
)
