"""Corpus-curation operators beyond dedup/quality (SURVEY.md §2.C scope):
PII scrubbing, train/test contamination detection, within-document
repetition scoring, deterministic corpus shuffling, and temperature-based
domain rebalancing — the remaining table-stakes passes of a 100 TB
training-data pipeline.

All pure Catalyst (regexp/HOF/join/window built-ins — JVM-side, no Python
in the row path), and all DETERMINISTIC: no RNG anywhere. Reproducibility
across reruns and engines is what makes preprocessing resumable; each
query's DuckDB oracle is the cross-engine proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from iceberg_metadata_pipeline_spark.queries import query, sql_query
from iceberg_metadata_pipeline_spark.session import load_tables

# ---------------------------------------------------------------------------
# PII scrubbing — regex redaction of emails / phone-like numbers.
# The fixture corpus carries no PII, so the query PLANTS deterministic
# PII per row first (append an email + phone derived from doc_id), then
# scrubs — proving removal end-to-end, not vacuously. Regexes avoid
# backslash classes so Spark (Java regex) and DuckDB (RE2) agree; Spark's
# regexp_replace is replace-all by default, DuckDB needs the 'g' flag.
# At 100 TB this is a map-only projection — no shuffle at all.
# ---------------------------------------------------------------------------

sql_query(
    "text_pii_scrub",
    """
SELECT doc_id,
       regexp_replace(regexp_replace(dirty,
           '[a-z0-9]+@[a-z0-9]+[.][a-z]+', '<EMAIL>'),
           '555-[0-9]+', '<PHONE>') AS clean,
       CAST(regexp_count(dirty, '[a-z0-9]+@[a-z0-9]+[.][a-z]+') AS BIGINT) AS n_emails,
       CAST(regexp_count(dirty, '555-[0-9]+') AS BIGINT) AS n_phones
FROM (
  SELECT doc_id,
         concat(substr(text, 1, 40), ' contact user', CAST(doc_id AS STRING),
                '@example.com or call 555-', CAST(doc_id AS STRING)) AS dirty
  FROM documents
) d
ORDER BY doc_id
""",
    oracle="""
SELECT doc_id,
       regexp_replace(regexp_replace(dirty,
           '[a-z0-9]+@[a-z0-9]+[.][a-z]+', '<EMAIL>', 'g'),
           '555-[0-9]+', '<PHONE>', 'g') AS clean,
       CAST(len(regexp_extract_all(dirty, '[a-z0-9]+@[a-z0-9]+[.][a-z]+')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(dirty, '555-[0-9]+')) AS BIGINT) AS n_phones
FROM (
  SELECT doc_id,
         concat(substr(text, 1, 40), ' contact user', CAST(doc_id AS STRING),
                '@example.com or call 555-', CAST(doc_id AS STRING)) AS dirty
  FROM documents
) d
ORDER BY doc_id
""",
)


# ---------------------------------------------------------------------------
# Train/test contamination — the eval-integrity check every training run
# needs: which held-out documents share 5-gram shingles with the training
# split? Shape: explode shingles on both sides, distinct the train side,
# one equi-join on the shingle string, group by test doc. At 100 TB the
# train side is the big one — the join shuffles on the shingle hash and
# partial-distinct combines map-side; nothing is quadratic.
# ---------------------------------------------------------------------------

sql_query(
    "text_contamination_ngram",
    """
WITH sh AS (
  SELECT doc_id, s
  FROM (
    SELECT doc_id,
           transform(sequence(1, greatest(size(toks) - 4, 1)),
                     i -> concat_ws(' ', slice(toks, i, 5))) AS shingles
    FROM (SELECT doc_id, split(text, ' ') AS toks FROM documents) t0
  ) t1 LATERAL VIEW explode(shingles) t2 AS s
),
train AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 != 0),
test AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 = 0)
SELECT t.doc_id,
       COUNT(DISTINCT t.s) AS n_shingles,
       COUNT(DISTINCT CASE WHEN tr.s IS NOT NULL THEN t.s END) AS n_contaminated,
       round(CAST(COUNT(DISTINCT CASE WHEN tr.s IS NOT NULL THEN t.s END) AS DOUBLE)
             / COUNT(DISTINCT t.s), 9) AS contamination
FROM test t LEFT JOIN train tr ON t.s = tr.s
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
    oracle="""
WITH sh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(toks) - 4, 1) + 1),
                i -> array_to_string(toks[i:i+4], ' '))) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t0
),
train AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 != 0),
test AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 = 0)
SELECT t.doc_id,
       COUNT(DISTINCT t.s) AS n_shingles,
       COUNT(DISTINCT CASE WHEN tr.s IS NOT NULL THEN t.s END) AS n_contaminated,
       round(CAST(COUNT(DISTINCT CASE WHEN tr.s IS NOT NULL THEN t.s END) AS DOUBLE)
             / COUNT(DISTINCT t.s), 9) AS contamination
FROM test t LEFT JOIN train tr ON t.s = tr.s
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
)


# ---------------------------------------------------------------------------
# Within-document repetition — boilerplate/looping-text signal: fraction
# of repeated 3-gram shingles inside each document. Pure higher-order
# functions on the token array (no explode, no shuffle): map-only.
# ---------------------------------------------------------------------------

sql_query(
    "text_repetition_ratio",
    """
SELECT doc_id, n_shingles, n_distinct,
       round(CAST(n_shingles - n_distinct AS DOUBLE) / n_shingles, 9) AS rep_ratio
FROM (
  SELECT doc_id, size(shingles) AS n_shingles,
         size(array_distinct(shingles)) AS n_distinct
  FROM (
    SELECT doc_id,
           transform(sequence(1, greatest(size(toks) - 2, 1)),
                     i -> concat_ws(' ', slice(toks, i, 3))) AS shingles
    FROM (SELECT doc_id, split(text, ' ') AS toks FROM documents) t0
  ) t1
) t2
ORDER BY doc_id
""",
    oracle="""
SELECT doc_id, n_shingles, n_distinct,
       round(CAST(n_shingles - n_distinct AS DOUBLE) / n_shingles, 9) AS rep_ratio
FROM (
  SELECT doc_id, len(shingles) AS n_shingles,
         len(list_distinct(shingles)) AS n_distinct
  FROM (
    SELECT doc_id,
           list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                          i -> array_to_string(toks[i:i+2], ' ')) AS shingles
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t0
  ) t1
) t2
ORDER BY doc_id
""",
)


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle — training order must be random-LOOKING but
# exactly reproducible (resume mid-epoch, re-run byte-identical): order by
# a salted hash of the id. Top-k form compiles to TakeOrderedAndProject
# (per-partition heap + driver merge, no global sort materialization);
# the full-shuffle form is ORDER BY shuffle_key at write time — a range-
# partitioned sort, Spark's scalable path, never a single-task window.
# ---------------------------------------------------------------------------

sql_query(
    "corpus_shuffle_deterministic",
    """
SELECT doc_id, shuffle_key
FROM (
  SELECT doc_id, md5(concat('epoch0:', CAST(doc_id AS STRING))) AS shuffle_key
  FROM documents
) s
ORDER BY shuffle_key
LIMIT 50
""",
)


# ---------------------------------------------------------------------------
# Temperature-based domain rebalancing — flatten the source distribution
# with keep_rate(source) = min(1, 0.5·sqrt(max_n / n_source)) (temperature
# τ=2 / α=0.5 mixture weighting) and DETERMINISTIC membership: a document
# is kept iff a fixed modular hash of its id lands under the rate
# threshold — no RNG, identical across engines and reruns. sqrt and double
# division are IEEE-correctly-rounded, so the thresholds agree bit-exactly.
# Plan: tiny per-source rate table (broadcast) joined to the corpus;
# map-side filter; one groupBy — at 100 TB the corpus shuffles once, on
# the final stats only.
# ---------------------------------------------------------------------------

sql_query(
    "sample_temperature_domain_mix",
    """
WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
rates AS (
  SELECT source, n,
         least(CAST(1.0 AS DOUBLE),
               0.5 * sqrt(CAST((SELECT MAX(n) FROM counts) AS DOUBLE) / n)) AS keep_rate
  FROM counts
)
SELECT r.source, r.n AS n_total, COUNT(d.doc_id) AS n_kept,
       round(r.keep_rate, 9) AS keep_rate
FROM rates r
LEFT JOIN documents d
  ON d.source = r.source
 AND (d.doc_id * 2654435761) % 1000000
       < CAST(floor(r.keep_rate * 1000000) AS BIGINT)
GROUP BY r.source, r.n, r.keep_rate
ORDER BY r.source
""",
)


def evaluate_expectations(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Data-quality expectations (the dbt-test / DLT-expectations shape):
    ``rules`` maps a rule name to a ROW-LEVEL boolean SQL predicate that
    every row is expected to satisfy. Returns one row per rule:
    (rule, n_rows, n_violations, pass_rate).

    All rules evaluate in ONE aggregate pass over the table —
    SUM(CASE WHEN NOT pred) per rule inside a single agg — then unpivot
    to rows. At 100 TB the alternative (one scan per dbt test) is the
    difference between a nightly QA job and a week of cluster time; this
    is the declarative analogue of the one-pass column profiler. NULL
    predicate results count as violations (a rule that can't prove a row
    is an unproven row)."""
    import re as _re

    if not rules:
        raise ValueError("evaluate_expectations needs at least one rule")
    bad = [n for n in rules if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", n)]
    if bad:
        raise ValueError(f"rule names must be identifiers: {bad}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules.items():
        aggs.append(
            F.sum(
                F.when(~F.coalesce(F.expr(pred), F.lit(False)), 1).otherwise(0)
            ).alias(f"__v_{name}")
        )
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', __v_{name}" for name in rules
    )
    return (
        row.selectExpr(
            "__n", f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"
        )
        .select(
            F.col("rule"),
            F.col("__n").cast("long").alias("n_rows"),
            F.col("n_violations").cast("long").alias("n_violations"),
            # empty-table guard: 0/0 would yield NULL, which a downstream
            # "pass_rate >= threshold" check treats as non-failing — an
            # empty input vacuously passes every rule, so report 1.0
            F.when(
                F.col("__n") > 0,
                F.round(
                    (F.col("__n") - F.col("n_violations")) / F.col("__n"), 12
                ),
            ).otherwise(F.lit(1.0)).alias("pass_rate"),
        )
        .orderBy("rule")
    )


@query(
    "pipeline_data_expectations",
    """
WITH a AS (
  SELECT COUNT(*) AS n,
    SUM(CASE WHEN NOT COALESCE(o_orderkey IS NOT NULL, FALSE) THEN 1 ELSE 0 END) AS v_key_not_null,
    SUM(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) AS v_price_positive,
    SUM(CASE WHEN NOT COALESCE(o_orderstatus IN ('F','O','P'), FALSE) THEN 1 ELSE 0 END) AS v_status_domain,
    SUM(CASE WHEN NOT COALESCE(o_orderdate >= TIMESTAMP '1990-01-01 00:00:00', FALSE) THEN 1 ELSE 0 END) AS v_date_floor,
    SUM(CASE WHEN NOT COALESCE(length(o_orderpriority) BETWEEN 5 AND 15, FALSE) THEN 1 ELSE 0 END) AS v_priority_shape
  FROM orders
)
SELECT t.rule, a.n AS n_rows, CAST(t.nv AS BIGINT) AS n_violations,
       ROUND(CAST(a.n - t.nv AS DOUBLE) / a.n, 12) AS pass_rate
FROM a, LATERAL (VALUES
  ('date_floor', v_date_floor),
  ('key_not_null', v_key_not_null),
  ('price_positive', v_price_positive),
  ('priority_shape', v_priority_shape),
  ('status_domain', v_status_domain)
) t(rule, nv)
ORDER BY t.rule
""",
)
def pipeline_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five expectations over orders evaluated in one pass (see
    evaluate_expectations); the oracle states the same accounting with
    an explicit VALUES unpivot."""
    t = load_tables(spark, sf_dir)
    return evaluate_expectations(
        t["orders"],
        {
            "key_not_null": "o_orderkey IS NOT NULL",
            "price_positive": "o_totalprice > 0",
            "status_domain": "o_orderstatus IN ('F','O','P')",
            "date_floor": "o_orderdate >= TIMESTAMP '1990-01-01 00:00:00'",
            "priority_shape": "length(o_orderpriority) BETWEEN 5 AND 15",
        },
    )


def apply_expectations_or_drop(
    df: DataFrame, rules: dict[str, str]
) -> tuple[DataFrame, DataFrame]:
    """Row-level expectation enforcement (DLT's expect_or_drop): returns
    (kept, quarantined) — kept rows satisfy every rule; quarantined rows
    carry a ``failed_rules`` array naming each violated rule, the audit
    trail a quarantine table needs.

    One projection computes all rule verdicts (an array of failed names
    via the same NULL-counts-as-violation rule as evaluate_expectations);
    the two outputs are filters over it, so Catalyst plans each side as
    scan→project→filter with every rule predicate eligible for pushdown.
    At 100 TB route both to sinks in one job (df.persist or foreachBatch)
    rather than triggering two scans."""
    import re as _re

    if not rules:
        raise ValueError("apply_expectations_or_drop needs at least one rule")
    bad = [n for n in rules if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", n)]
    if bad:
        raise ValueError(f"rule names must be identifiers: {bad}")
    failed = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.coalesce(F.expr(pred), F.lit(False)), F.lit(name)
                ).otherwise(F.lit(None))
                for name, pred in rules.items()
            ]
        )
    )
    tagged = df.withColumn("failed_rules", failed)
    kept = tagged.where(F.size("failed_rules") == 0).drop("failed_rules")
    quarantined = tagged.where(F.size("failed_rules") > 0)
    return kept, quarantined


def token_budget_waterfill(
    df: DataFrame,
    domain_col: str,
    tokens_col: str,
    budget_num: int,
    budget_den: int,
) -> DataFrame:
    """Allocate a global token budget across domains by two-round
    waterfilling, in exact integer arithmetic.

    Round 1 gives every domain an equal cap (budget DIV n_domains),
    clipped to its supply; round 2 distributes the leftover to the
    still-unfilled domains proportionally to remaining demand. All
    divisions truncate, so the result is engine- and order-independent
    (the few truncated remainder tokens stay unallocated — documented
    semantics, not drift). The budget is expressed as a fraction
    num/den of total corpus tokens so the operator is scale-free.

    One aggregation shuffle (per-domain totals); everything after runs
    on the tiny domain-cardinality frame with unpartitioned window
    sums — the 100 TB cost is the groupBy, which is unavoidable and
    map-side combined.
    """
    dom = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(F.col(tokens_col)).cast("long").alias("tokens")
    )
    w = W.partitionBy()
    dom = dom.withColumn("total", F.sum("tokens").over(w)).withColumn(
        "n_dom", F.count("*").over(w)
    )
    dom = dom.withColumn(
        "budget", F.expr(f"(total * {budget_num}) DIV {budget_den}")
    ).withColumn("cap1", F.expr("budget DIV n_dom"))
    dom = dom.withColumn("alloc1", F.least("tokens", F.col("cap1")))
    dom = dom.withColumn("leftover", F.col("budget") - F.sum("alloc1").over(w))
    dom = dom.withColumn("demand", F.col("tokens") - F.col("alloc1"))
    dom = dom.withColumn("demand_sum", F.sum("demand").over(w))
    dom = dom.withColumn(
        "alloc",
        F.col("alloc1")
        + F.when(
            F.col("demand_sum") > 0,
            F.least(
                F.col("demand"),
                F.expr("(leftover * demand) DIV demand_sum"),
            ),
        ).otherwise(F.lit(0)),
    )
    return dom.select(
        "domain",
        "tokens",
        F.col("alloc1").cast("long").alias("alloc_equal_round"),
        F.col("alloc").cast("long").alias("alloc_final"),
    )


@query(
    "sample_token_budget_waterfill",
    """
WITH dom AS (
  SELECT source AS domain, CAST(SUM(n_chars // 4) AS BIGINT) AS tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT domain, tokens,
         SUM(tokens) OVER () AS total,
         COUNT(*) OVER () AS n_dom
  FROM dom
),
r1 AS (
  SELECT domain, tokens,
         (total * 2) // 5 AS budget,
         LEAST(tokens, ((total * 2) // 5) // n_dom) AS alloc1
  FROM tot
),
r2 AS (
  SELECT domain, tokens, alloc1,
         budget - SUM(alloc1) OVER () AS leftover,
         tokens - alloc1 AS demand,
         SUM(tokens - alloc1) OVER () AS demand_sum
  FROM r1
)
SELECT domain, tokens,
       CAST(alloc1 AS BIGINT) AS alloc_equal_round,
       CAST(alloc1 + CASE WHEN demand_sum > 0
                          THEN LEAST(demand, (leftover * demand) // demand_sum)
                          ELSE 0 END AS BIGINT) AS alloc_final
FROM r2
ORDER BY domain
""",
)
def sample_token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget 2/5 of corpus tokens (n_chars DIV 4 proxy) across sources
    by exact-integer waterfilling; per-domain final allocations."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"].withColumn("tok", F.expr("n_chars DIV 4"))
    out = token_budget_waterfill(docs, "source", "tok", budget_num=2, budget_den=5)
    return out.orderBy("domain")


# ---------------------------------------------------------------------------
# Deterministic train/val/test split — the pipeline op every pretraining
# corpus needs before packing. Two properties the naive RNG split lacks:
# (1) reproducible: assignment is a pure function of content, identical
# across engines, reruns, and cluster topologies; (2) leakage-safe by
# construction: the split key is md5 of the DOCUMENT CONTENT, so exact
# duplicates (even under different doc_ids) always land in the same
# split — train can never see a byte-identical copy of a test document.
# Thresholds compare the first two hex chars lexicographically ('cc' =
# 204/256 ≈ 79.7 % train, 'e6' = 230/256 ≈ 89.8 % cumulative val) — no
# integer parsing, so the expression is dialect-shared verbatim. Plan:
# map-only assignment fused into the scan, one aggregate shuffle over
# (source, split) — at 100 TB the corpus is read once and shuffles only
# the per-group partial aggregates.
# ---------------------------------------------------------------------------

sql_query(
    "sample_train_val_test_split",
    """
WITH assigned AS (
  SELECT source,
    CASE
      WHEN substring(md5(concat('split-seed0:', md5(text))), 1, 2) < 'cc'
        THEN 'train'
      WHEN substring(md5(concat('split-seed0:', md5(text))), 1, 2) < 'e6'
        THEN 'val'
      ELSE 'test'
    END AS split,
    n_chars
  FROM documents
)
SELECT source, split, COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM assigned
GROUP BY source, split
ORDER BY source, split
""",
)
