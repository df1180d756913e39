"""Round-12 optimization round: focused pins for operator internals that
were restructured for performance. Each test asserts the optimized path
is value-identical to the semantics the oracle/gate already pinned."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_minhash_numpy_kernel_matches_groupby_variant(spark):
    """The mapInArrow permute-min kernel must be bit-identical to the
    shuffle-based minhash on real text, and must reproduce the HOF
    form's edge semantics (empty/null text -> an array of n NULLs, the
    array_min-over-empty behavior)."""
    from iceberg_metadata_pipeline_spark.llmops.dedup import (
        minhash_signatures,
        minhash_signatures_from_arrays,
        shingle_arrays,
        shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "the quick brown fox jumps over the lazy dog"),  # dup of 1
            (4, "one"),
            (5, ""),
            (6, None),
        ],
        "doc_id long, text string",
    )
    arr = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures_from_arrays(
            shingle_arrays(docs, "doc_id", "text"), "doc_id", n_hashes=32
        ).collect()
    }
    gb = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures(
            shingles(docs, "doc_id", "text"), "doc_id", n_hashes=32
        ).collect()
    }
    # identical docs -> identical signatures through the kernel
    assert arr[1] == arr[3]
    # bit parity with the shuffle-based family on every doc the groupBy
    # variant produces (it drops null-token docs at the explode)
    for k, sig in gb.items():
        assert list(sig) == list(arr[k]), f"doc {k} diverged"
    # every signature is exactly n_hashes wide
    assert all(len(s) == 32 for s in arr.values())


def test_minhash_kernel_multishingle_before_trailing_empty(spark):
    """r12 advisor (medium): a multi-shingle doc IMMEDIATELY BEFORE an
    empty/null shingle list in the same Arrow batch — the old clipped
    reduceat starts shortened the preceding row's segment by one value,
    silently dropping its last shingle from the min. Pin the sentinel
    fix: the doc's signature must equal the same doc's signature computed
    alone, for every arrangement (trailing empty, trailing null, interior
    empty), under coalesce(1) so the rows share one batch."""
    from iceberg_metadata_pipeline_spark.llmops.dedup import (
        minhash_signatures_from_arrays,
    )

    sh = "array<string>"
    base = [(1, ["aa bb cc", "bb cc dd", "cc dd ee"])]
    arrangements = [
        base + [(2, [])],  # trailing empty
        base + [(2, None)],  # trailing null
        base + [(2, []), (3, ["zz yy xx"])],  # interior empty
    ]
    alone = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures_from_arrays(
            spark.createDataFrame(base, f"doc_id long, shingles {sh}").coalesce(1),
            "doc_id",
            n_hashes=32,
        ).collect()
    }
    for rows in arrangements:
        df = spark.createDataFrame(
            rows, f"doc_id long, shingles {sh}"
        ).coalesce(1)
        got = {
            r["doc_id"]: r["sig"]
            for r in minhash_signatures_from_arrays(
                df, "doc_id", n_hashes=32
            ).collect()
        }
        assert list(got[1]) == alone[1], f"arrangement {rows} corrupted doc 1"
        assert got[2] is None or all(v is None for v in got[2])


def test_minhash_kernel_single_token_doc(spark):
    """A 1-token doc has exactly one shingle; the kernel's reduceat path
    must not merge it into a neighbor segment."""
    from iceberg_metadata_pipeline_spark.llmops.dedup import (
        minhash_signatures_from_arrays,
        shingle_arrays,
    )

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha"), (3, "beta")], "doc_id long, text string"
    )
    sigs = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures_from_arrays(
            shingle_arrays(docs, "doc_id", "text"), "doc_id", n_hashes=16
        ).collect()
    }
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_bigram_lm_rerun_same_session(spark, sf_dir):
    """The bigram LM query registers a temp view for its cached stream;
    two invocations in one session must not collide and must agree."""
    import __spark_entry__ as entry

    fn = entry.queries()["text_bigram_lm_score"]
    a = fn(spark, sf_dir).collect()
    b = fn(spark, sf_dir).collect()
    assert a == b


def test_lsh_checked_single_action_flag(spark, sf_dir):
    """The folded single-action integrity probe must still report
    lsh_scores_ok=1 on the fixture corpus."""
    import __spark_entry__ as entry

    fn = entry.queries()["sim_cosine_topk_lsh_checked"]
    rows = fn(spark, sf_dir).collect()
    assert rows and all(r["lsh_scores_ok"] == 1 for r in rows)
