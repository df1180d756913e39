"""Line-level corpus cleaning — the C4 / CCNet family of filters.

The classic web-corpus cleaning recipes operate on LINES within a
document (C4: drop short/junk lines, then drop gutted documents;
CCNet: drop lines whose hash repeats across many documents —
boilerplate headers, navbars, cookie banners). The fixture documents
are single-line token streams, so the operators here define a line as
a deterministic 10-token chunk (documented in each query); the SQL is
otherwise exactly what you would run on newline-split text — swap the
chunker for ``split(text, '\\n')`` and nothing else changes.

Scale notes (100 TB):
- The boilerplate pass groups by ``md5(line)`` — the corpus-wide
  frequency shuffle carries 32-byte hashes + counts, never line text,
  and the map-side partial count collapses each partition's repeats
  first. The rejoin back to lines is hash-equi — co-partitioned with
  the frequency table by construction.
- The C4 line filters are pure per-row projections (map-only, no
  shuffle until the per-doc rollup, which partial-aggregates).
- BM25 is two aggregates (per-(doc,term) tf, per-term df) + a scalar
  corpus-stats subquery — the same shape as TF-IDF; the df side is
  tiny (query terms only) and broadcasts.

All three carry exact DuckDB oracles. BM25 uses the *linear* idf
variant ((N - df + 0.5) / (df + 0.5), no ln()) for the same reason
text_tfidf_topterms does: rational arithmetic over identical operands
is bit-identical across engines, while libm ln() differs in the last
ulp; production swaps in the log in one line.
"""

from __future__ import annotations

from iceberg_metadata_pipeline_spark.queries import sql_query

# --- shared chunked-lines CTE, one spelling per engine ------------------
# a "line" = 10 consecutive tokens; (n_tok + 9) div 10 chunks per doc

_LINES_SPARK = """
toks AS (SELECT doc_id, split(text, ' ') AS tk FROM documents),
lines AS (
  SELECT doc_id, i AS line_idx,
         array_join(slice(tk, i * 10 + 1, 10), ' ') AS line
  FROM toks
  LATERAL VIEW explode(sequence(0, CAST((size(tk) + 9) / 10 AS INT) - 1)) t AS i
)
"""

_LINES_DUCK = """
toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
lines AS (
  SELECT doc_id, i AS line_idx,
         array_to_string(list_slice(tk, i * 10 + 1, i * 10 + 10), ' ') AS line
  FROM toks, LATERAL unnest(range((len(tk) + 9) // 10)) AS t(i)
)
"""


sql_query(
    "text_boilerplate_line_dedup",
    # CCNet-style boilerplate removal: a line whose hash occurs in >= 2
    # distinct documents is boilerplate (in the fixture the planted
    # near/exact-dup replicas make whole documents' chunk sets repeat —
    # exactly the navbars-and-banners shape at web scale). Per doc:
    # total lines, boilerplate lines, tokens surviving removal.
    f"""
WITH {_LINES_SPARK},
freq AS (
  SELECT md5(line) AS h, COUNT(DISTINCT doc_id) AS n_docs
  FROM lines GROUP BY md5(line)
)
SELECT l.doc_id,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       CAST(SUM(CASE WHEN f.n_docs >= 2 THEN 0
                ELSE size(split(l.line, ' ')) END) AS BIGINT) AS n_tokens_kept
FROM lines l JOIN freq f ON md5(l.line) = f.h
GROUP BY l.doc_id
ORDER BY l.doc_id
""",
    oracle=f"""
WITH {_LINES_DUCK},
freq AS (
  SELECT md5(line) AS h, COUNT(DISTINCT doc_id) AS n_docs
  FROM lines GROUP BY md5(line)
)
SELECT l.doc_id,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       CAST(SUM(CASE WHEN f.n_docs >= 2 THEN 0
                ELSE len(string_split(l.line, ' ')) END) AS BIGINT) AS n_tokens_kept
FROM lines l JOIN freq f ON md5(l.line) = f.h
GROUP BY l.doc_id
ORDER BY l.doc_id
""",
)


sql_query(
    "text_c4_line_filters",
    # C4's line-then-document rules, adapted to the fixture's
    # punctuation-free token streams: a line survives if it has >= 10
    # tokens (full chunk — C4's "at least 5 words"), mean token length
    # >= 3.0 chars (C4 drops symbol soup), and stopword fraction <= 0.4
    # (C4's policy/boilerplate heuristics); a document survives if >= 2
    # lines survive (C4's ">= 3 sentences"). Terminal-punctuation and
    # lorem-ipsum rules are vacuous on this fixture and omitted.
    f"""
WITH {_LINES_SPARK},
judged AS (
  SELECT doc_id, line_idx,
         CASE WHEN n_tok >= 10
                   AND (CAST(n_char - (n_tok - 1) AS DOUBLE) / n_tok) >= 3.0
                   AND (CAST(n_stop AS DOUBLE) / n_tok) <= 0.4
              THEN 1 ELSE 0 END AS keep_line
  FROM (
    SELECT doc_id, line_idx,
           size(split(line, ' ')) AS n_tok,
           length(line) AS n_char,
           size(filter(split(line, ' '), x -> x IN ('a', 'the'))) AS n_stop
    FROM lines
  ) feats
)
SELECT doc_id,
       COUNT(*) AS n_lines,
       CAST(SUM(keep_line) AS BIGINT) AS n_kept,
       CAST(SUM(keep_line) >= 2 AS INT) AS doc_kept
FROM judged
GROUP BY doc_id
ORDER BY doc_id
""",
    oracle=f"""
WITH {_LINES_DUCK},
judged AS (
  SELECT doc_id, line_idx,
         CASE WHEN n_tok >= 10
                   AND (CAST(n_char - (n_tok - 1) AS DOUBLE) / n_tok) >= 3.0
                   AND (CAST(n_stop AS DOUBLE) / n_tok) <= 0.4
              THEN 1 ELSE 0 END AS keep_line
  FROM (
    SELECT doc_id, line_idx,
           len(string_split(line, ' ')) AS n_tok,
           length(line) AS n_char,
           len(list_filter(string_split(line, ' '),
                           x -> x IN ('a', 'the'))) AS n_stop
    FROM lines
  ) feats
)
SELECT doc_id,
       COUNT(*) AS n_lines,
       CAST(SUM(keep_line) AS BIGINT) AS n_kept,
       CAST(SUM(keep_line) >= 2 AS INT) AS doc_kept
FROM judged
GROUP BY doc_id
ORDER BY doc_id
""",
)


sql_query(
    "text_bm25_rank",
    # Okapi BM25 (k1=1.2, b=0.75) of every document against three query
    # terms, top-5 docs per term (score desc, doc_id tiebreak). Linear
    # idf — see module docstring. The per-term df aggregate is 3 rows
    # and broadcasts; corpus stats (N, avgdl) are scalar subqueries.
    """
WITH dl AS (
  SELECT doc_id, size(split(text, ' ')) AS dlen FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dlen) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, tok AS term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents) x
  WHERE tok IN ('table', 'scan', 'merge')
  GROUP BY doc_id, tok
),
df AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(
           ((s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * (1.2 + 1.0))
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dlen / s.avgdl))),
           9) AS bm25
  FROM tf
  JOIN df ON tf.term = df.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
)
SELECT term, doc_id, bm25, rn
FROM (
  SELECT term, doc_id, bm25,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY bm25 DESC, doc_id) AS rn
  FROM scored
) ranked
WHERE rn <= 5
ORDER BY term, rn
""",
    oracle="""
WITH dl AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dlen FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dlen) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, tok AS term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents) x
  WHERE tok IN ('table', 'scan', 'merge')
  GROUP BY doc_id, tok
),
df AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(
           ((s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * (1.2 + 1.0))
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dlen / s.avgdl))),
           9) AS bm25
  FROM tf
  JOIN df ON tf.term = df.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
)
SELECT term, doc_id, bm25, rn
FROM (
  SELECT term, doc_id, bm25,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY bm25 DESC, doc_id) AS rn
  FROM scored
) ranked
WHERE rn <= 5
ORDER BY term, rn
""",
)


sql_query(
    "text_gopher_quality_rules",
    # Gopher quality rules (Rae et al. 2021, arXiv:2112.11446 table A1),
    # document-level subset applicable to the fixture's single-line
    # punctuation-free token streams: word count in [50, 100k], mean
    # word length in [3, 10], >= 80% of words contain an alphabetic
    # char, and >= 2 distinct stopwords from the paper's 8-word list
    # (bullet/ellipsis line rules are vacuous here — documents carry no
    # newlines — and symbol ratios are zero on alnum tokens; omitted).
    # Pure map-side token arithmetic: the filter pushes to the scan at
    # any scale, no shuffle before the final sort.
    """
SELECT doc_id, n_words,
       CAST(n_chars AS DOUBLE) / n_words AS mean_word_len,
       CAST(n_alpha AS DOUBLE) / n_words AS alpha_frac,
       n_stop_kinds,
       CAST(n_words >= 50 AND n_words <= 100000
            AND (CAST(n_chars AS DOUBLE) / n_words) >= 3.0E0
            AND (CAST(n_chars AS DOUBLE) / n_words) <= 10.0E0
            AND (CAST(n_alpha AS DOUBLE) / n_words) >= 0.8E0
            AND n_stop_kinds >= 2 AS INT) AS gopher_pass
FROM (
  SELECT doc_id,
         size(toks) AS n_words,
         length(text) - (size(toks) - 1) AS n_chars,
         size(filter(toks, x -> x rlike '[a-z]')) AS n_alpha,
         size(array_intersect(array_distinct(toks),
              array('the', 'be', 'to', 'of', 'and', 'that', 'have', 'with')))
           AS n_stop_kinds
  FROM (SELECT doc_id, text, split(text, ' ') AS toks FROM documents) t
) feats
ORDER BY doc_id
""",
    oracle="""
SELECT doc_id, n_words,
       CAST(n_chars AS DOUBLE) / n_words AS mean_word_len,
       CAST(n_alpha AS DOUBLE) / n_words AS alpha_frac,
       n_stop_kinds,
       CAST(n_words >= 50 AND n_words <= 100000
            AND (CAST(n_chars AS DOUBLE) / n_words) >= 3.0E0
            AND (CAST(n_chars AS DOUBLE) / n_words) <= 10.0E0
            AND (CAST(n_alpha AS DOUBLE) / n_words) >= 0.8E0
            AND n_stop_kinds >= 2 AS INT) AS gopher_pass
FROM (
  SELECT doc_id,
         len(toks) AS n_words,
         length(text) - (len(toks) - 1) AS n_chars,
         len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
         len(list_intersect(list_distinct(toks),
             ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']))
           AS n_stop_kinds
  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents) t
) feats
ORDER BY doc_id
""",
)


# --- URL canonicalization (round 10) -----------------------------------------

# the dedup key every web-corpus pipeline needs BEFORE content hashing:
# lowercase scheme+host, strip the default port and the fragment, drop
# tracking parameters (utm_*, fbclid, gclid), sort the surviving query
# parameters. All map-only string/array work (no Python); the fixture
# synthesizes messy URLs deterministically from (source, doc_id) so
# differently-messy spellings collapse to one canonical key — the
# GROUP BY shows the dedup effect. Path case is PRESERVED (paths are
# case-sensitive; only scheme/host normalize).
_URL_BUILD = """
  'HTTPS://' || CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
  || '.Example.COM:443/Path/' || CAST(doc_id % 50 AS STRING)
  || '?b=2&utm_source=x'
  || CASE WHEN doc_id % 3 = 0 THEN '&a=1' ELSE '&a=1&utm_campaign=y' END
  || '#frag'
"""

_URL_CANON_TEMPLATE = """
WITH raw AS (
  SELECT doc_id, {URL} AS url FROM documents
), parts AS (
  SELECT doc_id, url,
    lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)) AS sh,
    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
    regexp_extract(url, '{QPAT}([^#]*)', 1) AS q
  FROM raw
), cleaned AS (
  SELECT doc_id, url,
    regexp_replace(regexp_replace(sh, ':443$', ''), ':80$', '') AS sh,
    path,
    {JOIN_PARAMS} AS params
  FROM parts
), canon AS (
  SELECT doc_id,
    sh || path || CASE WHEN params = '' THEN '' ELSE '?' || params END
      AS canonical_url
  FROM cleaned
)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS survivor_doc
FROM canon
GROUP BY canonical_url
ORDER BY canonical_url
"""

_TRACKING = (
    "p LIKE 'utm_%' OR p LIKE 'fbclid=%' OR p LIKE 'gclid=%' OR p = ''"
)

sql_query(
    "text_url_canonicalize",
    _URL_CANON_TEMPLATE.replace("{URL}", _URL_BUILD)
    .replace("{QPAT}", "\\\\?")  # Spark string-escapes to the regex \?
    .replace(
        "{JOIN_PARAMS}",
        f"array_join(array_sort(filter(split(q, '&'),"
        f" p -> NOT ({_TRACKING}))), '&')",
    ),
    oracle=_URL_CANON_TEMPLATE.replace("{URL}", _URL_BUILD)
    .replace("{QPAT}", "\\?")  # DuckDB strings pass \? through verbatim
    .replace(
        "{JOIN_PARAMS}",
        f"array_to_string(list_sort(list_filter(string_split(q, '&'),"
        f" p -> NOT ({_TRACKING}))), '&')",
    ),
)
