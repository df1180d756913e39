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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries import query

from iceberg_metadata_pipeline_spark.llmops.dedup import (
    lsh_candidate_pairs,
    minhash_signatures_from_arrays,
    shingle_arrays,
)


@query("pipeline_incremental_dedup_index", None)  # hash family isn't SQL-portable
def pipeline_incremental_dedup_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end incremental maintenance, benchmark-shaped: bootstrap the
    index on half the corpus, land the other half plus a planted near-dup
    as a second batch, sign ONLY the increment via the CDC scan, and
    return the candidate pairs touching new docs (sorted for stability).
    Exercises scan_incremental + map-only signing + banded-index join —
    the exact per-batch cost profile a 100 TB corpus pays. Runs a
    32-hash/8-band family — same code path as the production 64/16
    default (benched separately in dedup_minhash_lsh); the narrower
    family keeps the bench entry's codegen cost proportionate."""
    import tempfile

    from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
    from iceberg_metadata_pipeline_spark.session import load_tables

    n_hashes, n_bands = 32, 8
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    catalog = Catalog(spark, tempfile.mkdtemp(prefix="dedup-index-wh-"))
    dt = catalog.create_table("nyc", "docs_inc", docs.schema)
    it = catalog.create_table(
        "nyc", "sig_index", signatures_for(docs.limit(1), n_hashes=n_hashes).schema
    )

    snap1 = dt.append_dataframe(docs.filter("doc_id % 2 = 0"))
    update_dedup_index(dt, it, None, n_hashes=n_hashes)  # bootstrap: sign batch 1

    base = docs.filter("doc_id = 0").select("text").first()["text"]
    planted = spark.createDataFrame([(999001, base + " extra tail")], docs.schema)
    dt.refresh()
    dt.append_dataframe(docs.filter("doc_id % 2 = 1").unionByName(planted))
    update_dedup_index(dt, it, snap1, n_hashes=n_hashes)  # increment: O(new docs)

    new_ids = docs.filter("doc_id % 2 = 1").select("doc_id").unionByName(
        planted.select("doc_id")
    )
    it2 = catalog.load_table("nyc", "sig_index")
    return (
        incremental_candidates(it2, new_ids, n_hashes=n_hashes, n_bands=n_bands)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
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
    then keep pairs whose id_a or id_b is new.

    The OR-filter is TWO broadcast hash equi-joins (left-outer markers on
    id_a and id_b, then filter marker_a OR marker_b) — a single semi-join
    on the OR condition compiles to BroadcastNestedLoopJoin, which scans
    the whole new-id list per candidate pair: O(pairs × new ids) at
    exactly the batch sizes this operator exists for. The marker shape
    keeps it O(pairs) probes against two hash maps (plan-asserted)."""
    sigs = index_table.scan()
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_bands=n_bands, max_bucket=max_bucket, n_hashes=n_hashes)
    new_ids = new_doc_ids.select(F.col("doc_id").alias("id_new")).distinct()
    mark_a = new_ids.select(
        F.col("id_new").alias("__ka"), F.lit(True).alias("__new_a")
    )
    mark_b = new_ids.select(
        F.col("id_new").alias("__kb"), F.lit(True).alias("__new_b")
    )
    return (
        pairs.join(F.broadcast(mark_a), pairs["id_a"] == F.col("__ka"), "left")
        .join(F.broadcast(mark_b), pairs["id_b"] == F.col("__kb"), "left")
        .where(
            F.coalesce(F.col("__new_a"), F.lit(False))
            | F.coalesce(F.col("__new_b"), F.lit(False))
        )
        .drop("__ka", "__kb", "__new_a", "__new_b")
    )
