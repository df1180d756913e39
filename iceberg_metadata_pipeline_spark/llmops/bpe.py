"""Byte-pair-encoding tokenizer: train merges on a bounded corpus
sample, apply corpus-wide as an Arrow-batched pandas UDF.

The real thing, not a regex proxy (the BPE-ish regex count in text.py
stays as the cheap JVM-side estimator): classic Sennrich et al. 2016
merge training over a word-frequency table, then greedy lowest-rank
merge application per word.

Scale design (100 TB): training is the PQ-codebook pattern — a bounded,
DETERMINISTIC sample (orderBy id, limit) collects to the driver once,
the merge loop is O(sample vocab), and the learned merge ranks broadcast
to executors as a plain dict. Application is map-only: one pandas UDF
over Arrow batches, memoized per distinct word (Zipf makes the word
cache hit rate extreme), no shuffle at all. Token counts then aggregate
like any other column. The tokenizer never sees the whole corpus and the
corpus never moves.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries import query
from iceberg_metadata_pipeline_spark.session import load_tables

_END = "</w>"


def _word_freqs(texts: list[str]) -> dict[tuple[str, ...], int]:
    freqs: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in (t or "").lower().split():
            sym = tuple(w) + (_END,)
            freqs[sym] = freqs.get(sym, 0) + 1
    return freqs


def train_bpe_merges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_merges: int = 200,
    sample_docs: int = 500,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a deterministic corpus sample.

    Ties in pair frequency break lexicographically, so the merge list is
    a pure function of the sample — re-training yields byte-identical
    tokenizers (the property incremental pipelines need: signing new data
    must not depend on executor scheduling)."""
    rows = (
        df.select(F.col(id_col), F.col(text_col))
        .orderBy(id_col)
        .limit(sample_docs)
        .collect()
    )
    freqs = _word_freqs([r[1] for r in rows])
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, n in freqs.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        # highest count; ties break to the lexicographically SMALLEST pair
        top = max(pair_counts.values())
        best_pair = min(p for p, n in pair_counts.items() if n == top)
        if top < 2:
            break  # nothing left that generalizes
        merges.append(best_pair)
        a, b = best_pair
        merged = a + b
        new_freqs: dict[tuple[str, ...], int] = {}
        for sym, n in freqs.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_freqs[key] = new_freqs.get(key, 0) + n
        freqs = new_freqs
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [_END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(id, n_words, n_bpe_tokens) per document — the merge ranks ride
    the UDF closure (broadcast once per executor), encoding memoizes per
    distinct word, and the stage is map-only."""
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}

    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def n_tokens(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def count(t: str) -> int:
            total = 0
            for w in (t or "").lower().split():
                n = cache.get(w)
                if n is None:
                    n = len(_encode_word(w, ranks))
                    cache[w] = n
                total += n
            return total

        return texts.map(count)

    return df.select(
        F.col(id_col),
        # same whitespace rule as the UDF's str.split(): collapse runs,
        # ignore leading/trailing (ANY whitespace — trim alone only strips
        # spaces, and split('') yields [''], so empty/tab-padded docs must
        # go through the empty-token filter to count 0 like str.split())
        F.size(
            F.filter(F.split(F.col(text_col), "\\s+"), lambda x: x != F.lit(""))
        ).cast("long").alias("n_words"),
        n_tokens(F.col(text_col)).alias("n_bpe_tokens"),
    )


@query("text_bpe_token_count", None)  # python BPE kernel isn't SQL-expressible
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a 120-merge BPE tokenizer on a 300-doc sample of the corpus,
    then count BPE tokens per document corpus-wide. Deterministic
    end-to-end (ordered sample, lexicographic tie-breaks), covered by
    planted-corpus tests; rows-only for the driver (the merge loop has no
    SQL equivalent)."""
    docs = load_tables(spark, sf_dir)["documents"]
    merges = train_bpe_merges(docs, "doc_id", "text", num_merges=120, sample_docs=300)
    return bpe_token_counts(docs, "doc_id", "text", merges).orderBy("doc_id")
