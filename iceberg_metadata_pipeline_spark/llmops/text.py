"""Text-analysis operators over the documents table (SURVEY.md §2.C;
BASELINE.json north_star: token counting, quality scoring, language ID,
document fingerprinting — the signals a 100 TB training-data pipeline
computes per document before filtering).

Everything here is pure Catalyst (split/filter/transform/aggregate higher-
order functions — JVM-side, codegen'd); no Python in the row path. At
100 TB these are embarrassingly parallel map-side projections: no shuffle
at all except where a groupBy is explicit.
"""

from __future__ import annotations

from iceberg_metadata_pipeline_spark.queries import sql_query

# Whitespace tokens + a BPE-ish regex token count (letters / digits /
# single punctuation — the classic pre-tokenizer split).
sql_query(
    "text_token_count",
    """
SELECT doc_id,
       size(split(text, ' ')) AS n_tokens_ws,
       regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]') AS n_tokens_bpeish,
       length(text) AS n_chars,
       CAST(length(replace(text, ' ', '')) AS DOUBLE) / size(split(text, ' ')) AS avg_token_len
FROM documents
ORDER BY doc_id
""",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens_ws,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens_bpeish,
       length(text) AS n_chars,
       CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len
FROM documents
ORDER BY doc_id
""",
)

_STOPWORDS = "'the','a','of','and','to','in','is','it','for','on'"

sql_query(
    "text_quality_signals",
    f"""
SELECT doc_id, lang, n_tokens, n_uniq, stop_hits,
       CAST(n_uniq AS DOUBLE) / n_tokens AS uniq_ratio,
       CAST(stop_hits AS DOUBLE) / n_tokens AS stop_ratio,
       round(CAST(n_uniq AS DOUBLE) / n_tokens * 0.5
         + CAST(stop_hits AS DOUBLE) / n_tokens * 0.3
         + least(n_tokens / 400.0, 1.0) * 0.2, 12) AS quality_score
FROM (
  SELECT doc_id, lang,
         size(split(text, ' ')) AS n_tokens,
         size(array_distinct(split(text, ' '))) AS n_uniq,
         size(filter(split(text, ' '), t -> t IN ({_STOPWORDS}))) AS stop_hits
  FROM documents
) s
ORDER BY doc_id
""",
    oracle=f"""
SELECT doc_id, lang, n_tokens, n_uniq, stop_hits,
       CAST(n_uniq AS DOUBLE) / n_tokens AS uniq_ratio,
       CAST(stop_hits AS DOUBLE) / n_tokens AS stop_ratio,
       round(CAST(n_uniq AS DOUBLE) / n_tokens * 0.5
         + CAST(stop_hits AS DOUBLE) / n_tokens * 0.3
         + least(n_tokens / 400.0, 1.0) * 0.2, 12) AS quality_score
FROM (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_uniq,
         len(list_filter(string_split(text, ' '), t -> t IN ({_STOPWORDS}))) AS stop_hits
  FROM documents
) s
ORDER BY doc_id
""",
)

# n-gram/stopword-profile language ID: score each candidate language by
# stopword hits (+ CJK codepoint detection), argmax with deterministic
# tie order. The fixture's texts share one vocabulary so the labels mostly
# resolve to 'en' — the operator contract is the deterministic heuristic.
_LANG_LISTS = {
    "en": "'the','a','of','and','is'",
    "de": "'der','die','das','und','ist'",
    "es": "'el','la','de','y','es'",
    "fr": "'le','la','et','les','est'",
}
_spark_hits = ", ".join(
    f"size(filter(toks, t -> t IN ({words}))) AS {lang}_hits"
    for lang, words in _LANG_LISTS.items()
)
_duck_hits = ", ".join(
    f"len(list_filter(toks, t -> t IN ({words}))) AS {lang}_hits"
    for lang, words in _LANG_LISTS.items()
)
_ARGMAX = """
CASE WHEN cjk_hits > 0 THEN 'zh'
     WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
     WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
     WHEN es_hits >= fr_hits THEN 'es'
     ELSE 'fr' END
"""

sql_query(
    "text_langid_heuristic",
    f"""
SELECT doc_id, lang AS labeled_lang, {_ARGMAX} AS detected_lang,
       en_hits, de_hits, es_hits, fr_hits, cjk_hits
FROM (
  SELECT doc_id, lang, {_spark_hits},
         regexp_count(text, '[\\\\x{{4e00}}-\\\\x{{9fff}}]') AS cjk_hits
  FROM (SELECT doc_id, lang, text, split(text, ' ') AS toks FROM documents) t0
) s
ORDER BY doc_id
""",
    oracle=f"""
SELECT doc_id, lang AS labeled_lang, {_ARGMAX} AS detected_lang,
       en_hits, de_hits, es_hits, fr_hits, cjk_hits
FROM (
  SELECT doc_id, lang, {_duck_hits},
         len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) AS cjk_hits
  FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents) t0
) s
ORDER BY doc_id
""",
)

# Document fingerprint: min-hash-of-shingles (rolling-hash style winnowing
# fingerprint) — md5 over 3-token shingles, keep the minimum; identical
# content → identical fingerprint regardless of row order or partitioning.
sql_query(
    "text_fingerprint_minshingle",
    """
SELECT doc_id, min(md5(shingle)) AS fingerprint, count(*) AS n_shingles
FROM (
  SELECT doc_id, s AS shingle
  FROM (
    SELECT doc_id,
           transform(sequence(1, greatest(size(toks) - 2, 1)),
                     i -> concat_ws(' ', slice(toks, i, 3))) AS shingles
    FROM (SELECT doc_id, split(text, ' ') AS toks FROM documents) t0
  ) t1 LATERAL VIEW explode(shingles) t2 AS s
) t3
GROUP BY doc_id
ORDER BY doc_id
""",
    oracle="""
SELECT doc_id, min(md5(shingle)) AS fingerprint, count(*) AS n_shingles
FROM (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                        i -> array_to_string(toks[i:i+2], ' '))) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t0
) t1
GROUP BY doc_id
ORDER BY doc_id
""",
)


sql_query(
    "text_tfidf_topterms",
    # TF-IDF with a *linear* idf (tf × N/df): rational arithmetic over
    # identical operands is bit-identical across engines, unlike ln()
    # whose libm implementations differ in the last ulp (standard log-idf
    # is a one-line swap in production). Top-3 terms per doc, term-ordered
    # tiebreak.
    """
SELECT doc_id, term, tfidf, rn
FROM (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM (
    SELECT t.doc_id, t.term,
           CAST(t.tf AS DOUBLE)
             * (CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / d.df) AS tfidf
    FROM (SELECT doc_id, tok AS term, COUNT(*) AS tf
          FROM (SELECT doc_id, explode(split(lower(text), ' ')) AS tok
                FROM documents) x
          GROUP BY doc_id, tok) t
    JOIN (SELECT tok AS term, COUNT(DISTINCT doc_id) AS df
          FROM (SELECT doc_id, explode(split(lower(text), ' ')) AS tok
                FROM documents) y
          GROUP BY tok) d
      ON t.term = d.term
  ) scored
) ranked
WHERE rn <= 3 AND doc_id < 50
ORDER BY doc_id, rn
""",
    oracle="""
SELECT doc_id, term, tfidf, rn
FROM (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM (
    SELECT t.doc_id, t.term,
           CAST(t.tf AS DOUBLE)
             * (CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / d.df) AS tfidf
    FROM (SELECT doc_id, tok AS term, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                FROM documents) x
          GROUP BY doc_id, tok) t
    JOIN (SELECT tok AS term, COUNT(DISTINCT doc_id) AS df
          FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                FROM documents) y
          GROUP BY tok) d
      ON t.term = d.term
  ) scored
) ranked
WHERE rn <= 3 AND doc_id < 50
ORDER BY doc_id, rn
""",
)


# End-to-end corpus curation — the composition a training-data pipeline
# actually runs, as ONE declarative plan Catalyst can optimize globally:
# exact-dedup (keep lowest doc_id per content hash) → quality scoring →
# filter → per-source corpus stats. Each stage is a shuffle on a
# different key (md5(text), then source) and partial aggs apply; nothing
# materializes between stages. At 100 TB the win of single-plan
# composition is that column pruning reaches the scan: only text/source
# are read.
_CURATION_SPARK = f"""
WITH canon AS (
  SELECT doc_id, text, source,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
),
scored AS (
  SELECT doc_id, source, n_tokens,
         CAST(n_uniq AS DOUBLE) / n_tokens AS uniq_ratio,
         round(CAST(n_uniq AS DOUBLE) / n_tokens * 0.5
           + CAST(stop_hits AS DOUBLE) / n_tokens * 0.3
           + least(n_tokens / 400.0, 1.0) * 0.2, 12) AS quality_score
  FROM (
    SELECT doc_id, source,
           size(split(text, ' ')) AS n_tokens,
           size(array_distinct(split(text, ' '))) AS n_uniq,
           size(filter(split(text, ' '), t -> t IN ({_STOPWORDS}))) AS stop_hits
    FROM canon WHERE rn = 1
  ) raw
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(CAST(SUM(CAST(quality_score AS DECIMAL(38,12))) AS DOUBLE)
            / COUNT(*) AS DOUBLE) AS avg_quality
FROM scored
WHERE n_tokens >= 20 AND uniq_ratio >= 0.3 AND quality_score >= 0.35
GROUP BY source
ORDER BY source
"""

_CURATION_DUCK = f"""
WITH canon AS (
  SELECT doc_id, text, source,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
),
scored AS (
  SELECT doc_id, source, n_tokens,
         CAST(n_uniq AS DOUBLE) / n_tokens AS uniq_ratio,
         round(CAST(n_uniq AS DOUBLE) / n_tokens * 0.5
           + CAST(stop_hits AS DOUBLE) / n_tokens * 0.3
           + least(n_tokens / 400.0, 1.0) * 0.2, 12) AS quality_score
  FROM (
    SELECT doc_id, source,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_uniq,
           len(list_filter(string_split(text, ' '), t -> t IN ({_STOPWORDS}))) AS stop_hits
    FROM canon WHERE rn = 1
  ) raw
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(CAST(SUM(CAST(quality_score AS DECIMAL(38,12))) AS DOUBLE)
            / COUNT(*) AS DOUBLE) AS avg_quality
FROM scored
WHERE n_tokens >= 20 AND uniq_ratio >= 0.3 AND quality_score >= 0.35
GROUP BY source
ORDER BY source
"""

sql_query("pipeline_corpus_curation", _CURATION_SPARK, oracle=_CURATION_DUCK)


# Deterministic stratified downsampling: per-stratum keep rates by key
# modulus — reproducible across engines and runs (no RNG), the property a
# training-data pipeline needs for resumable sampling. Rates: returnflag
# A keeps 1/7, R keeps 1/13, N keeps 1/29 of orders.
sql_query(
    "sample_stratified_mod",
    """
SELECT l_returnflag,
       COUNT(*) AS n_sampled,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty
FROM lineitem
WHERE l_orderkey % (CASE l_returnflag WHEN 'A' THEN 7 WHEN 'R' THEN 13 ELSE 29 END) = 0
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)


# Document chunking: fixed-size token windows with overlap (chunk=64,
# stride=48 → 16-token overlap) — the pre-tokenizer shaping step every
# training pipeline runs before packing. Map-side only: split → per-doc
# chunk-index sequence → slice; the explode multiplies rows inside the
# task, nothing shuffles until a downstream op asks for it. Chunk text is
# md5-digested so the result stays a hashable scalar row per chunk.
# Chunk count = floor((max(n-64,0) + 47) / 48) + 1 (≥1, even for short docs).
sql_query(
    "text_document_chunking",
    """
SELECT doc_id, chunk_id,
       size(slice(toks, chunk_id * 48 + 1, 64)) AS n_tokens,
       md5(array_join(slice(toks, chunk_id * 48 + 1, 64), ' ')) AS chunk_digest
FROM (
  SELECT doc_id, toks,
         explode(sequence(0, CAST(floor((greatest(size(toks) - 64, 0) + 47) / 48) AS INT))) AS chunk_id
  FROM (SELECT doc_id, split(text, ' ') AS toks FROM documents) s
) e
ORDER BY doc_id, chunk_id
""",
    oracle="""
SELECT doc_id, chunk_id,
       len(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS n_tokens,
       md5(array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')) AS chunk_digest
FROM (
  SELECT doc_id, toks,
         unnest(range(0, CAST(floor((greatest(len(toks) - 64, 0) + 47) / 48) AS BIGINT) + 1)) AS chunk_id
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) s
) e
ORDER BY doc_id, chunk_id
""",
)


# Bigram language-model scoring: add-one-smoothed conditional probability
# of each document under a bigram model trained on the corpus itself —
# the classic cheap fluency/quality signal (boilerplate and gibberish
# score low). Deliberately NO logarithms: ln() is not correctly-rounded
# and differs across engines in the last ulp, but IEEE division IS
# correctly rounded, so the per-bigram probability (c2+1)/(c1+V) is
# bit-identical everywhere; summing those doubles as decimals makes the
# mean order-independent. Plan shape at 100 TB: bigram explode is
# map-side; the model is two hash aggregations (shuffle O(distinct
# bigrams), not O(tokens)); scoring joins the bigram stream to the model
# on the bigram key — a shuffle join whose build side is the model.
def _register_bigram_lm():
    """Spark side restructured (optimization r12): the exploded bigram
    stream feeds FOUR consumers (c2, c1, the vocab count, and the
    scoring join), and the tokenize+explode subtree is the expensive
    part — the pure-SQL form re-ran it once per consumer. The stream is
    cached once and exposed as a temp view; every CTE below reads the
    cache. Counts, joins, and the decimal-summed probability are
    textually identical to the oracle's — results unchanged."""
    from iceberg_metadata_pipeline_spark.queries import query
    from iceberg_metadata_pipeline_spark.session import load_tables

    big_sql = """
SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
FROM (
  SELECT doc_id, t, explode(sequence(0, size(t) - 2)) AS i
  FROM (SELECT doc_id, split(text, ' ') AS t FROM documents) s
  WHERE size(t) >= 2
) e
"""
    # view-name hygiene (optimization r13, r12 advisor): the view name is
    # unique per invocation, so concurrent invocations in one session
    # can never rebind each other's view. The view is NOT dropped —
    # dropTempView CASCADES an uncache of the underlying plan (measured:
    # it also strips InMemoryTableScan from already-analyzed consumers),
    # and the templated-SQL {df} form was measured to BYPASS the cache
    # entirely (plan lost all 8 InMemoryTableScans). A view entry is
    # O(bytes) catalog metadata; the DATA cache never duplicates because
    # CacheManager dedupes by logical plan across invocations.
    score_sql = """
WITH c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM {view} GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS n1 FROM {view} GROUP BY w1),
v AS (SELECT COUNT(DISTINCT w1) AS vocab FROM {view})
SELECT b.doc_id, COUNT(*) AS n_bigrams,
  round(CAST(SUM(CAST(CAST(c2.n2 + 1 AS DOUBLE) / CAST(c1.n1 + v.vocab AS DOUBLE)
                     AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 12) AS avg_condprob
FROM {view} b
JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
JOIN c1 ON b.w1 = c1.w1
CROSS JOIN v
GROUP BY b.doc_id
ORDER BY b.doc_id
"""

    @query(
        "text_bigram_lm_score",
        """
WITH big AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM (
    SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) s
    WHERE len(t) >= 2
  ) e
),
c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS n1 FROM big GROUP BY w1),
v AS (SELECT COUNT(DISTINCT w1) AS vocab FROM big)
SELECT b.doc_id, COUNT(*) AS n_bigrams,
  round(CAST(SUM(CAST(CAST(c2.n2 + 1 AS DOUBLE) / CAST(c1.n1 + v.vocab AS DOUBLE)
                     AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 12) AS avg_condprob
FROM big b
JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
JOIN c1 ON b.w1 = c1.w1
CROSS JOIN v
GROUP BY b.doc_id
ORDER BY b.doc_id
""",
    )
    def text_bigram_lm_score(spark, sf_dir):
        import uuid as _uuid

        load_tables(spark, sf_dir)
        big = spark.sql(big_sql).cache()
        name = f"__bigram_lm_big_{_uuid.uuid4().hex}"
        big.createOrReplaceTempView(name)
        return spark.sql(score_sql.format(view=name))


_register_bigram_lm()




# n-gram novelty: the fraction of a document's distinct 3-gram shingles
# that appear in NO other document — near-1 means genuinely novel text,
# near-0 means boilerplate/templates even when no single pair crosses a
# near-dup threshold. Two hash aggregations (per-doc distinct shingles,
# then corpus counts) + one equi-join on the shingle key; shuffle is
# O(distinct shingles), never O(tokens).
sql_query(
    "text_ngram_novelty",
    """
WITH tri AS (
  SELECT DISTINCT doc_id,
         concat_ws(' ', slice(t, i + 1, 3)) AS tri
  FROM (
    SELECT doc_id, t, explode(sequence(0, size(t) - 3)) AS i
    FROM (SELECT doc_id, split(text, ' ') AS t FROM documents) s
    WHERE size(t) >= 3
  ) e
),
counts AS (SELECT tri, COUNT(*) AS c FROM tri GROUP BY tri)
SELECT tri.doc_id,
       COUNT(*) AS n_tris,
       CAST(count_if(c = 1) AS BIGINT) AS n_unique,
       round(CAST(count_if(c = 1) AS DOUBLE) / COUNT(*), 9) AS novelty
FROM tri JOIN counts ON tri.tri = counts.tri
GROUP BY tri.doc_id
ORDER BY tri.doc_id
""",
    oracle="""
WITH tri AS (
  SELECT DISTINCT doc_id,
         array_to_string(t[i + 1 : i + 3], ' ') AS tri
  FROM (
    SELECT doc_id, t, unnest(generate_series(0, len(t) - 3)) AS i
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) s
    WHERE len(t) >= 3
  ) e
),
counts AS (SELECT tri, COUNT(*) AS c FROM tri GROUP BY tri)
SELECT tri.doc_id,
       COUNT(*) AS n_tris,
       CAST(count_if(c = 1) AS BIGINT) AS n_unique,
       round(CAST(count_if(c = 1) AS DOUBLE) / COUNT(*), 9) AS novelty
FROM tri JOIN counts ON tri.tri = counts.tri
GROUP BY tri.doc_id
ORDER BY tri.doc_id
""",
)


# Pure-SQL ML inference (the ICDE 2025 "inference pipeline in SQL via
# operator fusion" shape, PAPERS.md): a trained linear model's weights
# are constants, so scoring fuses into the projection — featurize,
# dot-product, threshold, all inside whole-stage codegen, executed at
# scan speed with zero UDF or serving infrastructure. At 100 TB this is
# how a quality-filter model runs over a corpus: as a WHERE clause, not
# a model server. Determinism: per-row double arithmetic on identical
# operands is IEEE-identical in both engines (no transcendentals — the
# sigmoid is monotone, so thresholding the LINEAR score is equivalent).
sql_query(
    "pipeline_linear_model_score",
    """
WITH feats AS (
  SELECT doc_id, lang,
    size(split(text, ' ')) AS n_tok,
    length(text) AS n_chars,
    size(array_distinct(split(text, ' '))) AS n_uniq
  FROM documents
), scored AS (
  SELECT doc_id, lang,
    ROUND(
      0.8 * (CAST(n_uniq AS DOUBLE) / n_tok)
      - 0.002 * abs(n_tok - 300)
      + 0.0001 * n_chars
      - 0.05, 10) AS score
  FROM feats
)
SELECT doc_id, lang, score, CAST(score > 0.2 AS INT) AS keep
FROM scored
ORDER BY doc_id
""",
    oracle="""
WITH feats AS (
  SELECT doc_id, lang,
    len(string_split(text, ' ')) AS n_tok,
    length(text) AS n_chars,
    len(list_distinct(string_split(text, ' '))) AS n_uniq
  FROM documents
), scored AS (
  SELECT doc_id, lang,
    ROUND(
      0.8 * (CAST(n_uniq AS DOUBLE) / n_tok)
      - 0.002 * abs(n_tok - 300)
      + 0.0001 * n_chars
      - 0.05, 10) AS score
  FROM feats
)
SELECT doc_id, lang, score, CAST(score > 0.2 AS INT) AS keep
FROM scored
ORDER BY doc_id
""",
)


# Zipf's-law fit of the corpus token distribution: OLS slope of
# ln(freq) on ln(rank) over the top-200 tokens — the one-number
# vocabulary-health check (natural text ≈ −1; templated/synthetic
# corpora flatten). The O(rows) pass is one token-count hash aggregate;
# ranking runs over the VOCABULARY (orders of magnitude below token
# count — at web scale swap in the bucketed prefix rank), the fit over
# 200 points with SORTED double folds, and ln()'s 1-ulp libm drift is
# absorbed by ROUND(,9). Deterministic rank tiebreak: (freq DESC, tok).
_ZIPF_TEMPLATE = """
WITH tf AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT {EXPLODE} AS tok FROM documents) x
  GROUP BY tok
), ranked AS (
  SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS r
  FROM tf
), top AS (
  SELECT LN(CAST(r AS DOUBLE)) AS x, LN(CAST(freq AS DOUBLE)) AS y
  FROM ranked WHERE r <= 200
), m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
    {FX} AS sx, {FY} AS sy, {FXX} AS sxx, {FXY} AS sxy
  FROM top
)
SELECT CAST(n AS BIGINT) AS n_terms,
  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS zipf_slope
FROM m
"""


def _zipf(explode_expr: str, fold):
    return (
        _ZIPF_TEMPLATE.replace("{EXPLODE}", explode_expr)
        .replace("{FX}", fold("x"))
        .replace("{FY}", fold("y"))
        .replace("{FXX}", fold("x * x"))
        .replace("{FXY}", fold("x * y"))
    )


sql_query(
    "text_zipf_fit",
    _zipf(
        "explode(split(lower(text), ' '))",
        lambda e: f"reduce(array_sort(collect_list({e})),"
        " CAST(0.0E0 AS DOUBLE), (a, v) -> a + v)",
    ),
    oracle=_zipf(
        "unnest(string_split(lower(text), ' '))",
        lambda e: f"list_reduce(list_sort(list({e})), (a, v) -> a + v)",
    ),
)


# Heaps'-law fit: vocabulary growth V(N) ≈ K·N^β over the corpus read
# in doc_id order — the companion diagnostic to text_zipf_fit (β ≈ 0.5
# for natural text; near-1 means unbounded novel tokens = noise/IDs,
# near-0 means a closed template vocabulary). EXACT counting: each
# token's FIRST document (one hash aggregate), per-doc token counts
# (another), then V and N at ~12 exponentially spaced document-rank
# checkpoints via a bounded theta join (12 × docs — never rows²). The
# OLS fit runs over ≤12 (ln N, ln V) points with SORTED folds;
# ROUND(,9) absorbs ln's libm ulp.
_HEAPS_TEMPLATE = """
WITH toks AS (
  SELECT doc_id, tok FROM (SELECT doc_id, {EXPLODE} AS tok FROM documents) x
), first_seen AS (
  SELECT tok, MIN(doc_id) AS fd FROM toks GROUP BY tok
), per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tc FROM toks GROUP BY doc_id
), ranked AS (
  -- ranks beyond 8192 are never consulted (the largest checkpoint), so
  -- pre-bound to the 8192 smallest doc_ids with a distributed top-k
  -- (TakeOrderedAndProject) BEFORE ranking: the window then sorts a
  -- bounded set in one task instead of every document in the corpus
  -- (r9 verdict: at 10^9 docs the unbounded window was the job's tail)
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS rnk
  FROM (SELECT doc_id FROM per_doc ORDER BY doc_id LIMIT 8192) b
), ck AS (
  SELECT rnk, doc_id FROM ranked
  WHERE rnk IN (4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)
), at_n AS (
  SELECT c.rnk, CAST(SUM(p.tc) AS BIGINT) AS n_tokens
  FROM ck c JOIN ranked r ON r.rnk <= c.rnk
  JOIN per_doc p ON p.doc_id = r.doc_id
  GROUP BY c.rnk
), at_v AS (
  SELECT c.rnk, CAST(COUNT(*) AS BIGINT) AS vocab
  FROM ck c JOIN first_seen f ON f.fd <= c.doc_id
  GROUP BY c.rnk
), pts AS (
  SELECT LN(CAST(n_tokens AS DOUBLE)) AS x, LN(CAST(vocab AS DOUBLE)) AS y
  FROM at_n JOIN at_v ON at_n.rnk = at_v.rnk
), m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
    {FX} AS sx, {FY} AS sy, {FXX} AS sxx, {FXY} AS sxy
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_checkpoints,
  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS heaps_beta,
  ROUND(EXP((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n), 9)
    AS heaps_k
FROM m
"""


def _heaps(explode_expr: str, fold):
    return (
        _HEAPS_TEMPLATE.replace("{EXPLODE}", explode_expr)
        .replace("{FX}", fold("x"))
        .replace("{FY}", fold("y"))
        .replace("{FXX}", fold("x * x"))
        .replace("{FXY}", fold("x * y"))
    )


sql_query(
    "text_heaps_law_fit",
    _heaps(
        "explode(split(lower(text), ' '))",
        lambda e: f"reduce(array_sort(collect_list({e})),"
        " CAST(0.0E0 AS DOUBLE), (a, v) -> a + v)",
    ),
    oracle=_heaps(
        "unnest(string_split(lower(text), ' '))",
        lambda e: f"list_reduce(list_sort(list({e})), (a, v) -> a + v)",
    ),
)


# Flesch reading ease (round 10): the classic readability score per
# document from three exact integer counts — words (space split),
# sentences ([.!?]+ runs, floored at 1), and syllables (vowel-cluster
# runs, the standard heuristic). The score is one fixed double formula
# over three bigints (identical text in both engines → bit-identical);
# the counts are map-only regexp work, no shuffle at any scale.
_FLESCH_FORMULA = """
  206.835E0
  - 1.015E0 * (CAST(words AS DOUBLE) / CAST(sents AS DOUBLE))
  - 84.6E0 * (CAST(sylls AS DOUBLE) / CAST(words AS DOUBLE))
"""

_FLESCH_TEMPLATE = f"""
WITH counts AS (
  SELECT doc_id,
    CAST({{WORDS}} AS BIGINT) AS words,
    CAST(GREATEST({{SENTS}}, 1) AS BIGINT) AS sents,
    CAST({{SYLLS}} AS BIGINT) AS sylls
  FROM documents
)
SELECT doc_id, words, sents, sylls,
  {_FLESCH_FORMULA} AS flesch_score
FROM counts
WHERE words > 0
ORDER BY doc_id
"""

sql_query(
    "text_flesch_reading_ease",
    _FLESCH_TEMPLATE.replace("{WORDS}", "size(split(trim(text), ' +'))")
    .replace("{SENTS}", "size(regexp_extract_all(text, '[.!?]+', 0))")
    .replace(
        "{SYLLS}", "size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"
    ),
    oracle=_FLESCH_TEMPLATE.replace(
        "{WORDS}", "len(regexp_split_to_array(trim(text), ' +'))"
    )
    .replace("{SENTS}", "len(regexp_extract_all(text, '[.!?]+'))")
    .replace(
        "{SYLLS}", "len(regexp_extract_all(lower(text), '[aeiouy]+'))"
    ),
)


# deterministic hash reservoir (round 10): a uniform-without-replacement
# k-sample that every engine reproduces bit-for-bit — order by
# md5(key) and keep the k smallest (a fixed-k variant of hash-threshold
# sampling; md5 is identical everywhere, unlike engine RNGs, which is
# why sample_bernoulli_seeded stays rows-only but THIS is oracle-exact).
# Spark plans ORDER BY + LIMIT as TakeOrderedAndProject — distributed
# top-k, no global sort.
sql_query(
    "sample_reservoir_hash",
    """
SELECT doc_id, lang, n_chars
FROM (
  SELECT doc_id, lang, n_chars,
         md5(CAST(doc_id AS STRING)) AS h
  FROM documents
) s
ORDER BY h
LIMIT 64
""",
    oracle="same",
)


# --- classifier evaluation over the langid heuristic (round 10) -------------

# labeled_lang (fixture ground truth) vs detected_lang (the heuristic)
# gives a real confusion matrix to evaluate — the ML-eval staple pair:
# Cohen's kappa (chance-corrected agreement) and a per-class
# precision/recall/F1 report. Counts are exact integers; kappa
# rationalizes to ONE division of exact bigints
# (κ = (N·agree − Σ row·col) / (N² − Σ row·col)), and the per-class
# metrics are single divisions — bit-identical across engines with no
# rounding. One hash aggregate over the map-only detector output.


def _langid_pred(hits: str, cjk: str) -> str:
    return f"""
  SELECT lang AS labeled, {_ARGMAX} AS predicted
  FROM (
    SELECT doc_id, lang, {hits}, {cjk} AS cjk_hits
    FROM (SELECT doc_id, lang, text, {{SPLIT}} AS toks FROM documents) t0
  ) s
"""


_KAPPA_BODY = """
, cells AS (
  SELECT labeled, predicted, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY labeled, predicted
), rowt AS (
  SELECT labeled AS cls, CAST(SUM(n) AS BIGINT) AS row_n FROM cells GROUP BY labeled
), colt AS (
  SELECT predicted AS cls, CAST(SUM(n) AS BIGINT) AS col_n FROM cells GROUP BY predicted
), m AS (
  SELECT
    (SELECT CAST(SUM(n) AS BIGINT) FROM cells) AS total,
    (SELECT COALESCE(CAST(SUM(n) AS BIGINT), 0) FROM cells
      WHERE labeled = predicted) AS agree,
    (SELECT CAST(SUM(r.row_n * COALESCE(c.col_n, 0)) AS BIGINT)
     FROM rowt r LEFT JOIN colt c ON r.cls = c.cls) AS chance
)
SELECT total, agree,
  CAST(total * agree - chance AS DOUBLE)
    / CAST(total * total - chance AS DOUBLE) AS cohens_kappa
FROM m
"""

sql_query(
    "stat_cohens_kappa_langid",
    "WITH pred AS ("
    + _langid_pred(_spark_hits, "regexp_count(text, '[\\\\x{4e00}-\\\\x{9fff}]')")
    .replace("{SPLIT}", "split(text, ' ')")
    + ")"
    + _KAPPA_BODY,
    oracle="WITH pred AS ("
    + _langid_pred(
        _duck_hits, "len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]'))"
    ).replace("{SPLIT}", "string_split(text, ' ')")
    + ")"
    + _KAPPA_BODY,
)

_REPORT_BODY = """
, cls AS (
  SELECT labeled AS cls FROM pred
  UNION
  SELECT predicted FROM pred
), per AS (
  SELECT c.cls,
    (SELECT COALESCE(CAST(COUNT(*) AS BIGINT), 0) FROM pred
      WHERE labeled = c.cls AND predicted = c.cls) AS tp,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM pred
      WHERE predicted = c.cls AND labeled <> c.cls) AS fp,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM pred
      WHERE labeled = c.cls AND predicted <> c.cls) AS fn
  FROM cls c
)
SELECT cls, tp, fp, fn,
  CASE WHEN tp + fp = 0 THEN 0.0E0
       ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision_,
  CASE WHEN tp + fn = 0 THEN 0.0E0
       ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall_,
  CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0E0
       ELSE CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1
FROM per ORDER BY cls
"""

sql_query(
    "ml_classification_report",
    "WITH pred AS ("
    + _langid_pred(_spark_hits, "regexp_count(text, '[\\\\x{4e00}-\\\\x{9fff}]')")
    .replace("{SPLIT}", "split(text, ' ')")
    + ")"
    + _REPORT_BODY,
    oracle="WITH pred AS ("
    + _langid_pred(
        _duck_hits, "len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]'))"
    ).replace("{SPLIT}", "string_split(text, ' ')")
    + ")"
    + _REPORT_BODY,
)


# per-document CHARACTER entropy (round 10): the compressibility /
# gibberish signal quality filters threshold on — Shannon over the
# doc's character distribution. Counts are exact (one explode +
# per-(doc, char) cells); the entropy folds -p·ln p in SORTED order
# and ROUNDs to 9 (ln's libm ulp). Cells are bounded by alphabet ×
# docs, never characters.
_CHAR_ENTROPY_TEMPLATE = """
WITH chars AS (
  SELECT doc_id, {EXPLODE} AS ch FROM documents
), cells AS (
  SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS n
  FROM chars GROUP BY doc_id, ch
), tot AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS total FROM cells GROUP BY doc_id
), terms AS (
  SELECT c.doc_id,
    -(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE))
      * LN(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE)) AS term
  FROM cells c JOIN tot t ON c.doc_id = t.doc_id
)
SELECT doc_id,
  ROUND({FOLD}, 9) AS char_entropy_nats
FROM terms GROUP BY doc_id
ORDER BY doc_id
"""

sql_query(
    "text_char_entropy",
    _CHAR_ENTROPY_TEMPLATE.replace(
        "{EXPLODE}", "explode(split(lower(text), ''))"
    ).replace(
        "{FOLD}",
        "reduce(array_sort(collect_list(term)),"
        " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
    ),
    oracle=_CHAR_ENTROPY_TEMPLATE.replace(
        "{EXPLODE}", "unnest(string_split_regex(lower(text), ''))"
    ).replace(
        "{FOLD}", "list_reduce(list_sort(list(term)), (a, x) -> a + x)"
    ),
)


# TF-IDF top terms per document (round 11): the corpus-indexing staple
# with a RATIONAL distinctiveness score — tf · N / df is one exact
# integer ratio evaluated as a double, so no libm enters and both
# engines agree bitwise (the ln-idf variant would differ per engine's
# libm; rank order is identical for a fixed corpus). Tokenize map-only,
# one (doc,term) hash aggregate, one term df aggregate, top-3 per doc
# through a doc-partitioned rank (WindowGroupLimit shape — never a
# global sort).
_TFIDF_TEMPLATE = """
WITH toks AS (
  SELECT doc_id, term FROM ({TOKENS}) x WHERE term <> ''
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (
  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
    CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
      / CAST(df.df AS DOUBLE) AS score,
    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                       ORDER BY CAST(tf.tf AS DOUBLE)
                                  * CAST(n.n_docs AS DOUBLE)
                                  / CAST(df.df AS DOUBLE) DESC,
                                tf.term) AS rnk
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, tf, df, score
FROM scored WHERE rnk <= 3
ORDER BY doc_id, score DESC, term
"""

sql_query(
    "text_tfidf_top_terms",
    _TFIDF_TEMPLATE.replace(
        "{TOKENS}",
        "SELECT doc_id, explode(split(trim(lower(text)), ' +')) AS term"
        " FROM documents",
    ),
    oracle=_TFIDF_TEMPLATE.replace(
        "{TOKENS}",
        "SELECT doc_id,"
        " unnest(regexp_split_to_array(trim(lower(text)), ' +')) AS term"
        " FROM documents",
    ),
)


# Jensen-Shannon divergence between one source shard and the rest of
# the corpus (round 11): THE distributional-drift check a training-data
# pipeline runs before admitting a new crawl shard — symmetric, bounded
# [0, ln 2]. Vocabulary = top-512 tokens by pooled count (deterministic
# tiebreak, TakeOrderedAndProject shape — never a global sort of the
# vocab); +1 smoothing keeps every cell positive; the ≤1024 LN terms
# fold in sorted order and the statistic ROUNDs to 9 decimals (the
# libm posture). One tokenize pass, one (token, side) aggregate.
_JS_TEMPLATE = """
WITH toks AS (
  SELECT CASE WHEN source = 'src0' THEN 0 ELSE 1 END AS side, term
  FROM ({TOKENS}) x WHERE term <> ''
), vocab AS (
  SELECT term FROM (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY term
  ) t ORDER BY cnt DESC, term LIMIT 512
), cells AS (
  SELECT v.term,
    CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_p,
    CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_q
  FROM vocab v LEFT JOIN toks t ON v.term = t.term
  GROUP BY v.term
), tot AS (
  SELECT CAST(SUM(n_p) AS BIGINT) AS t_p, CAST(SUM(n_q) AS BIGINT) AS t_q
  FROM cells
), probs AS (
  SELECT
    CAST(n_p AS DOUBLE) / CAST(t_p AS DOUBLE) AS p,
    CAST(n_q AS DOUBLE) / CAST(t_q AS DOUBLE) AS q
  FROM cells CROSS JOIN tot
), terms AS (
  SELECT 0.5E0 * p * LN(p / (0.5E0 * (p + q)))
       + 0.5E0 * q * LN(q / (0.5E0 * (p + q))) AS term
  FROM probs
)
SELECT CAST(512 AS BIGINT) AS vocab_size, ROUND({FOLD}, 9) AS js_divergence
FROM terms
"""

sql_query(
    "text_js_divergence_sources",
    _JS_TEMPLATE.replace(
        "{TOKENS}",
        "SELECT source,"
        " explode(split(trim(lower(text)), ' +')) AS term FROM documents",
    ).replace(
        "{FOLD}",
        "reduce(array_sort(collect_list(term)),"
        " CAST(0.0E0 AS DOUBLE), (a, x) -> a + x)",
    ),
    oracle=_JS_TEMPLATE.replace(
        "{TOKENS}",
        "SELECT source,"
        " unnest(regexp_split_to_array(trim(lower(text)), ' +')) AS term"
        " FROM documents",
    ).replace(
        "{FOLD}", "list_reduce(list_sort(list(term)), (a, x) -> a + x)"
    ),
)


# Winnowing document fingerprints (round 11): the MOSS/plagiarism-
# detection selection rule — hash every k-token shingle, then keep each
# sliding window's MINIMUM hash (w consecutive shingles) — guarantees
# any shared substring of length ≥ w+k−1 tokens contributes a shared
# fingerprint, at ~2/(w+1) the storage of all shingles. Hashes are
# md5-derived (engine-identical, the portable-estimator posture);
# windows are doc-partitioned; DISTINCT collapses repeated minima. The
# fingerprint table is what a corpus-scale near-dup index stores.
_WINNOW_TEMPLATE = """
WITH toks AS (
  SELECT doc_id, term, idx
  FROM ({TOKENS}) x WHERE term <> ''
), shingles AS (
  SELECT doc_id, idx,
    {HASH} AS h
  FROM (
    SELECT doc_id, idx,
      CONCAT_WS(' ', term,
        {LEAD1},
        {LEAD2}) AS sh,
      {LEAD2} AS last_tok
    FROM toks
  ) s
  WHERE last_tok IS NOT NULL
), winnowed AS (
  SELECT DISTINCT doc_id,
    MIN(h) OVER (PARTITION BY doc_id ORDER BY idx
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM shingles
)
SELECT doc_id, fp
FROM winnowed
WHERE doc_id < 40
ORDER BY doc_id, fp
"""


def _winnow_sql(engine: str) -> str:
    lead1 = "LEAD(term, 1) OVER (PARTITION BY doc_id ORDER BY idx)"
    lead2 = "LEAD(term, 2) OVER (PARTITION BY doc_id ORDER BY idx)"
    if engine == "spark":
        return (
            _WINNOW_TEMPLATE.replace(
                "{TOKENS}",
                "SELECT doc_id, tok.term, tok.idx FROM documents "
                "LATERAL VIEW posexplode(split(trim(lower(text)), ' +')) "
                "tok AS idx, term",
            )
            .replace(
                "{HASH}",
                "CAST(conv(substring(md5(sh), 1, 15), 16, 10) AS BIGINT)",
            )
            .replace("{LEAD1}", lead1)
            .replace("{LEAD2}", lead2)
        )
    return (
        _WINNOW_TEMPLATE.replace(
            "{TOKENS}",
            "SELECT doc_id, t.term, t.idx - 1 AS idx FROM documents, "
            "LATERAL (SELECT unnest(regexp_split_to_array("
            "trim(lower(text)), ' +')) AS term, generate_subscripts("
            "regexp_split_to_array(trim(lower(text)), ' +'), 1) AS idx) t",
        )
        .replace(
            "{HASH}",
            "CAST(('0x' || substring(md5(sh), 1, 15))::BIGINT AS BIGINT)",
        )
        .replace("{LEAD1}", lead1)
        .replace("{LEAD2}", lead2)
    )


sql_query(
    "text_winnowing_fingerprints",
    _winnow_sql("spark"),
    oracle=_winnow_sql("duck"),
)


# Winnowing candidate pairs (round 11): the join that turns the
# fingerprint table into a near-dup candidate list — documents sharing
# >= 3 winnowed fingerprints, scored by the shared count. The join
# keys on the FINGERPRINT (bucketed, never all-pairs: cost is
# Σ per-fingerprint doc-list², the LSH-band shape); dedup_minhash_lsh
# remains the probabilistic production path, this is the exact-shingle
# twin over the winnowed subset.
_WINNOW_PAIRS_TEMPLATE = """
WITH fps AS ({FPS}),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS shared
  FROM fps a JOIN fps b
    ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, shared
FROM pairs WHERE shared >= 3
ORDER BY doc_a, doc_b
"""

sql_query(
    "dedup_winnowing_pairs",
    _WINNOW_PAIRS_TEMPLATE.replace(
        "{FPS}", _winnow_sql("spark").replace("ORDER BY doc_id, fp", "")
    ),
    oracle=_WINNOW_PAIRS_TEMPLATE.replace(
        "{FPS}", _winnow_sql("duck").replace("ORDER BY doc_id, fp", "")
    ),
)
