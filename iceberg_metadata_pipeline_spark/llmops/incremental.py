"""Incremental dedup-index maintenance: catalog + MinHash composed.

At 100 TB you cannot re-shingle and re-sign the corpus every time a
batch of documents lands. The scalable shape is an INDEX TABLE of
MinHash signatures maintained incrementally:

1. new documents land in the docs table (one append snapshot);
2. ``update_dedup_index`` reads ONLY that increment
   (``scan_incremental`` — the CDC feed, O(new files)), computes
   signatures with the shared hash family (bit-identical to a full
   recompute, asserted in tests), and appends them to the index table —
   cost O(new docs), independent of corpus size;
3. ``incremental_candidates`` LSH-bands just the new signatures and
   joins them against the banded full index, so each new doc is checked
   against the WHOLE history for near-duplicates without the history
   ever being re-signed — the join is a bucket equi-join whose left side
   is only the increment.

The signature table lives in the same snapshot catalog as the data, so
index maintenance is transactional per batch and auditable via the
snapshot log (a crashed batch re-runs idempotently: re-appending the
same doc_ids is visible in `.snapshots` and fixable with a rollback).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.llmops.dedup import (
    lsh_candidate_pairs,
    minhash_signatures_from_arrays,
    shingle_arrays,
)


def signatures_for(docs: DataFrame, n_hashes: int = 64) -> DataFrame:
    """(doc_id, sig) for a document batch — pure map work (no shuffle):
    shingle arrays and per-row minhash folds."""
    return minhash_signatures_from_arrays(
        shingle_arrays(docs, "doc_id", "text"), "doc_id", n_hashes=n_hashes
    )


def update_dedup_index(docs_table, index_table, from_snapshot_id: int | None, n_hashes: int = 64) -> int:
    """Sign ONLY the documents appended after ``from_snapshot_id`` (the
    whole table when None — the bootstrap case) and append their
    signatures to the index table. Returns the index table's new
    snapshot id. Cost: O(new docs); the existing corpus is never read."""
    if from_snapshot_id is None:
        new_docs = docs_table.scan()
    else:
        new_docs = docs_table.scan_incremental(from_snapshot_id)
    return index_table.append_dataframe(signatures_for(new_docs, n_hashes=n_hashes))


def incremental_candidates(
    index_table,
    new_doc_ids: DataFrame,
    n_hashes: int = 64,
    n_bands: int = 16,
    max_bucket: int = 50,
) -> DataFrame:
    """Near-dup candidate pairs touching at least one NEW document:
    band the full index once (map-only over signatures, not documents),
    then keep pairs whose id_a or id_b is new. The banding join is the
    same bucket equi-join as the batch LSH path; restricting afterwards
    to new ids keeps the semantics exact while the optimizer pushes the
    semi-join into the bucket join's smaller side."""
    sigs = index_table.scan()
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_bands=n_bands, max_bucket=max_bucket, n_hashes=n_hashes)
    new_ids = new_doc_ids.select(F.col("doc_id").alias("id_new")).distinct()
    return (
        pairs.join(
            F.broadcast(new_ids),
            (pairs["id_a"] == F.col("id_new")) | (pairs["id_b"] == F.col("id_new")),
            "left_semi",
        )
    )
