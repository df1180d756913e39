"""Scalar-function families (SURVEY.md §2.B scalar functions).

One declared query per family: string, date/time, math, conditional,
array, map, JSON. Where Spark and DuckDB dialects diverge (function
names, log base, JSON operators) the oracle SQL is written separately;
semantics are what's compared.

All functions here are JVM-side Catalyst expressions inside
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from iceberg_metadata_pipeline_spark.queries import sql_query

sql_query(
    "fn_string_family",
    """
SELECT p_partkey,
       concat(p_brand, ':', p_type) AS brand_type,
       lower(p_name) AS name_lc,
       upper(p_brand) AS brand_uc,
       substr(p_name, 1, 5) AS name5,
       length(p_name) AS name_len,
       trim('  ' || p_brand || ' ') AS brand_trim,
       replace(p_type, ' ', '_') AS type_us,
       lpad(CAST(p_size AS STRING), 4, '0') AS size_pad,
       split(p_name, ' ')[0] AS first_word,
       regexp_extract(p_type, '^(\\\\w+)', 1) AS type_head,
       CAST(contains(p_name, 'gold') AS INT) AS has_gold,
       CAST(startswith(p_type, 'SMALL') AS INT) AS is_small,
       reverse(p_brand) AS brand_rev
FROM part
ORDER BY p_partkey
""",
    oracle="""
SELECT p_partkey,
       concat(p_brand, ':', p_type) AS brand_type,
       lower(p_name) AS name_lc,
       upper(p_brand) AS brand_uc,
       substr(p_name, 1, 5) AS name5,
       length(p_name) AS name_len,
       trim('  ' || p_brand || ' ') AS brand_trim,
       replace(p_type, ' ', '_') AS type_us,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
       string_split(p_name, ' ')[1] AS first_word,
       regexp_extract(p_type, '^(\\w+)', 1) AS type_head,
       CAST(contains(p_name, 'gold') AS INT) AS has_gold,
       CAST(starts_with(p_type, 'SMALL') AS INT) AS is_small,
       reverse(p_brand) AS brand_rev
FROM part
ORDER BY p_partkey
""",
)

sql_query(
    "fn_datetime_family",
    """
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate) AS dom,
       quarter(o_orderdate) AS qtr,
       date_trunc('month', o_orderdate) AS month_start,
       date_trunc('week', o_orderdate) AS week_start,
       unix_timestamp(o_orderdate) AS epoch_s,
       date_format(o_orderdate, 'yyyy-MM') AS ym,
       o_orderdate + INTERVAL 30 DAYS AS due_date,
       CAST(o_orderdate AS DATE) AS order_day,
       datediff(TIMESTAMP '2002-01-01 00:00:00', o_orderdate) AS days_to_2002
FROM orders
ORDER BY o_orderkey
""",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate) AS dom,
       quarter(o_orderdate) AS qtr,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       strftime(o_orderdate, '%Y-%m') AS ym,
       o_orderdate + INTERVAL 30 DAY AS due_date,
       CAST(o_orderdate AS DATE) AS order_day,
       datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
FROM orders
ORDER BY o_orderkey
""",
)

sql_query(
    "fn_math_family",
    """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice / 7, 2) AS div_round,
       abs(l_discount - 0.05) AS abs_diff,
       l_quantity * l_quantity AS qty_sq,
       round(ln(l_extendedprice), 9) AS log_price,
       round(log10(l_extendedprice), 9) AS log10_price,
       sqrt(l_quantity) AS qty_sqrt,
       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
       pmod(l_orderkey, 7) AS key_mod,
       sign(l_discount - 0.05) AS disc_sign,
       greatest(l_quantity, 25.0) AS qty_floor25,
       least(l_quantity, 25.0) AS qty_cap25
FROM lineitem
ORDER BY l_orderkey, l_linenumber
""",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice / 7, 2) AS div_round,
       abs(l_discount - 0.05) AS abs_diff,
       l_quantity * l_quantity AS qty_sq,
       round(ln(l_extendedprice), 9) AS log_price,
       round(log10(l_extendedprice), 9) AS log10_price,
       sqrt(l_quantity) AS qty_sqrt,
       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       greatest(l_quantity, 25.0) AS qty_floor25,
       least(l_quantity, 25.0) AS qty_cap25
FROM lineitem
ORDER BY l_orderkey, l_linenumber
""",
)

sql_query(
    "fn_conditional_family",
    """
SELECT c_custkey,
       coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'REDACTED') AS seg_masked,
       nullif(c_nationkey, 0) AS natkey_nz,
       nvl(NULLIF(c_name, c_name), 'anon') AS always_anon,
       if(c_acctbal < 0, 'debt', 'credit') AS bal_class
FROM customer
ORDER BY c_custkey
""",
    oracle="""
SELECT c_custkey,
       coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'REDACTED') AS seg_masked,
       nullif(c_nationkey, 0) AS natkey_nz,
       coalesce(NULLIF(c_name, c_name), 'anon') AS always_anon,
       CASE WHEN c_acctbal < 0 THEN 'debt' ELSE 'credit' END AS bal_class
FROM customer
ORDER BY c_custkey
""",
)

sql_query(
    "fn_array_family",
    """
SELECT vec_id,
       size(embedding) AS dim,
       element_at(embedding, 1) AS first_elem,
       element_at(embedding, -1) AS last_elem,
       aggregate(CAST(slice(embedding, 1, 8) AS ARRAY<DOUBLE>),
                 CAST(0 AS DOUBLE), (acc, x) -> acc + x) AS head8_sum,
       CAST(array_contains(array(1, 2, 3), label) AS INT) AS label_in_123,
       size(array_distinct(array(label, label, 0))) AS n_distinct_small,
       array_join(sort_array(array(label, 0, 9)), ',') AS sorted_small
FROM embeddings
ORDER BY vec_id
""",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       embedding[1] AS first_elem,
       embedding[-1] AS last_elem,
       list_reduce(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)),
                   (acc, x) -> acc + x) AS head8_sum,
       CAST(list_contains([1, 2, 3], label) AS INT) AS label_in_123,
       len(list_distinct([label, label, 0])) AS n_distinct_small,
       array_to_string(list_sort([label, 0, 9]), ',') AS sorted_small
FROM embeddings
ORDER BY vec_id
""",
)

sql_query(
    "fn_array_explode",
    """
SELECT doc_id, word, count(*) AS n
FROM documents
LATERAL VIEW explode(split(text, ' ')) t AS word
WHERE doc_id < 20
GROUP BY doc_id, word
ORDER BY doc_id, word
""",
    oracle="""
SELECT doc_id, word, count(*) AS n
FROM documents, unnest(string_split(text, ' ')) AS t(word)
WHERE doc_id < 20
GROUP BY doc_id, word
ORDER BY doc_id, word
""",
)

# (round 11: this registration predated the part-based fn_map_family
# below and was silently shadowed by it — last-wins clobbered it until
# the duplicate-name guard surfaced the pair; it now lives under its
# own name and is gated like any other query)
sql_query(
    "fn_map_lookup_orders",
    """
SELECT o_orderkey,
       element_at(map('status', o_orderstatus, 'prio', o_orderpriority), 'status') AS status_v,
       element_at(map('status', o_orderstatus, 'prio', o_orderpriority), 'prio') AS prio_v,
       CAST(size(map('a', 1, 'b', 2)) AS BIGINT) AS map_sz
FROM orders
ORDER BY o_orderkey
""",
    oracle="""
SELECT o_orderkey,
       MAP {'status': o_orderstatus, 'prio': o_orderpriority}['status'][1] AS status_v,
       MAP {'status': o_orderstatus, 'prio': o_orderpriority}['prio'][1] AS prio_v,
       CAST(cardinality(MAP {'a': 1, 'b': 2}) AS BIGINT) AS map_sz
FROM orders
ORDER BY o_orderkey
""",
)

sql_query(
    "fn_json_family",
    # events.props is a JSON string like {"k": 42}
    """
SELECT event_id,
       CAST(get_json_object(props, '$.k') AS BIGINT) AS k_extracted,
       from_json(props, 'k BIGINT').k AS k_struct
FROM events
ORDER BY event_id
""",
    oracle="""
SELECT event_id,
       CAST(props->>'$.k' AS BIGINT) AS k_extracted,
       CAST(props->>'$.k' AS BIGINT) AS k_struct
FROM events
ORDER BY event_id
""",
)

sql_query(
    "fn_struct_nested",
    """
SELECT o_orderkey,
       named_struct('key', o_orderkey, 'price', o_totalprice).price AS s_price,
       struct(o_orderstatus, o_orderpriority).o_orderstatus AS s_status
FROM orders
ORDER BY o_orderkey
""",
    oracle="""
SELECT o_orderkey,
       {'key': o_orderkey, 'price': o_totalprice}.price AS s_price,
       {'o_orderstatus': o_orderstatus, 'o_orderpriority': o_orderpriority}.o_orderstatus AS s_status
FROM orders
ORDER BY o_orderkey
""",
)

sql_query(
    "fn_cast_family",
    """
SELECT l_orderkey,
       CAST(l_quantity AS INT) AS qty_int,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS STRING) AS price_dec,
       CAST(l_orderkey AS STRING) AS key_str,
       CAST(CAST(l_shipdate AS DATE) AS STRING) AS ship_str,
       try_cast(l_returnflag AS INT) AS flag_as_int
FROM lineitem
ORDER BY l_orderkey, l_linenumber
""",
    oracle="""
SELECT l_orderkey,
       CAST(l_quantity AS INT) AS qty_int,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec,
       CAST(l_orderkey AS VARCHAR) AS key_str,
       CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_str,
       try_cast(l_returnflag AS INT) AS flag_as_int
FROM lineitem
ORDER BY l_orderkey, l_linenumber
""",
)


sql_query(
    "fn_bitwise_family",
    """
SELECT p_partkey,
       p_size & 15 AS low_bits,
       p_size | 64 AS with_flag,
       CAST(p_size ^ 21 AS INT) AS xored,
       shiftleft(p_size, 2) AS shl2,
       shiftright(p_size, 1) AS shr1,
       bit_count(p_size) AS popcount
FROM part
WHERE p_partkey < 200
ORDER BY p_partkey
""",
    oracle="""
SELECT p_partkey,
       p_size & 15 AS low_bits,
       p_size | 64 AS with_flag,
       CAST(xor(p_size, 21) AS INT) AS xored,
       p_size << 2 AS shl2,
       p_size >> 1 AS shr1,
       bit_count(p_size) AS popcount
FROM part
WHERE p_partkey < 200
ORDER BY p_partkey
""",
)


sql_query(
    "fn_string_family2",
    """
SELECT p_partkey,
       translate(p_brand, '#', '-') AS brand_dash,
       repeat(p_brand, 2) AS brand2,
       left(p_name, 3) AS name_l3,
       right(p_name, 3) AS name_r3,
       instr(p_name, 'o') AS first_o,
       ascii(p_brand) AS brand_ascii0,
       chr(65 + CAST(p_size % 26 AS INT)) AS size_letter,
       split_part(p_type, ' ', 1) AS type_first,
       rpad(p_brand, 12, '.') AS brand_rpad
FROM part
ORDER BY p_partkey
""",
    oracle="""
SELECT p_partkey,
       translate(p_brand, '#', '-') AS brand_dash,
       repeat(p_brand, 2) AS brand2,
       left(p_name, 3) AS name_l3,
       right(p_name, 3) AS name_r3,
       strpos(p_name, 'o') AS first_o,
       ascii(p_brand) AS brand_ascii0,
       chr(65 + CAST(p_size % 26 AS INT)) AS size_letter,
       split_part(p_type, ' ', 1) AS type_first,
       rpad(p_brand, 12, '.') AS brand_rpad
FROM part
ORDER BY p_partkey
""",
)


# error-safe expression family: try_* returns NULL where strict ANSI
# evaluation would raise — the contract batch pipelines want for dirty
# data (one bad row must not kill a 100 TB job). DuckDB spells
# try_divide as NULL-guarded division; try_cast is common to both.
sql_query(
    "fn_try_family",
    """
SELECT p_partkey,
       try_cast(p_name AS INT) AS name_as_int,
       try_cast(CAST(p_size AS STRING) AS INT) AS size_roundtrip,
       try_divide(p_retailprice, p_size - p_size) AS div_by_zero,
       try_divide(p_retailprice, 4) AS quarter_price,
       try_cast('2024-13-45' AS DATE) AS bad_date
FROM part
ORDER BY p_partkey
""",
    oracle="""
SELECT p_partkey,
       try_cast(p_name AS INT) AS name_as_int,
       try_cast(CAST(p_size AS VARCHAR) AS INT) AS size_roundtrip,
       p_retailprice / nullif(p_size - p_size, 0) AS div_by_zero,
       p_retailprice / 4 AS quarter_price,
       try_cast('2024-13-45' AS DATE) AS bad_date
FROM part
ORDER BY p_partkey
""",
)


sql_query(
    "fn_array_family2",
    """
WITH a AS (SELECT p_partkey, split(p_name, ' ') AS w FROM part)
SELECT p_partkey,
       array_join(array_sort(array_distinct(w)), ',') AS uniq_sorted,
       CAST(array_position(w, 'gold') AS BIGINT) AS gold_pos,
       CAST(array_contains(w, 'gold') AS INT) AS has_gold,
       CAST(size(flatten(array(w, w))) AS BIGINT) AS n_doubled,
       array_join(slice(w, 2, 2), ',') AS mid2
FROM a
ORDER BY p_partkey
""",
    oracle="""
WITH a AS (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part)
SELECT p_partkey,
       array_to_string(list_sort(list_distinct(w)), ',') AS uniq_sorted,
       CAST(coalesce(list_position(w, 'gold'), 0) AS BIGINT) AS gold_pos,
       CAST(list_contains(w, 'gold') AS INT) AS has_gold,
       CAST(len(flatten([w, w])) AS BIGINT) AS n_doubled,
       array_to_string(w[2:3], ',') AS mid2
FROM a
ORDER BY p_partkey
""",
)


sql_query(
    "fn_datetime_family2",
    """
WITH t AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
SELECT o_orderkey,
       date_add(d, 30) AS plus30,
       CAST(datediff(d, DATE '1995-01-01') AS BIGINT) AS days_since_95,
       last_day(d) AS eom,
       trunc(d, 'month') AS som,
       CAST(weekday(d) + 1 AS BIGINT) AS isodow,
       make_date(2020, month(d), 1) AS anchor
FROM t
ORDER BY o_orderkey
""",
    oracle="""
WITH t AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
SELECT o_orderkey,
       d + 30 AS plus30,
       CAST(date_diff('day', DATE '1995-01-01', d) AS BIGINT) AS days_since_95,
       last_day(d) AS eom,
       date_trunc('month', d) AS som,
       CAST(isodow(d) AS BIGINT) AS isodow,
       make_date(2020, month(d), 1) AS anchor
FROM t
ORDER BY o_orderkey
""",
)


# map family: construction, lookup, keys, cardinality. DuckDB's map
# lookup returns a one-element list (m['k'] → [v]), hence the [1]
# unwrap; contains is spelled via list_contains over the keys
sql_query(
    "fn_map_family",
    """
WITH m AS (
  SELECT p_partkey,
         map('size', p_size, 'double_size', p_size * 2) AS pm
  FROM part
)
SELECT p_partkey,
       element_at(pm, 'double_size') AS dbl,
       array_join(array_sort(map_keys(pm)), ',') AS keys_sorted,
       CAST(size(pm) AS BIGINT) AS n_entries,
       CAST(array_contains(map_keys(pm), 'size') AS INT) AS has_size
FROM m
ORDER BY p_partkey
""",
    oracle="""
WITH m AS (
  SELECT p_partkey,
         MAP {'size': p_size, 'double_size': p_size * 2} AS pm
  FROM part
)
SELECT p_partkey,
       pm['double_size'][1] AS dbl,
       array_to_string(list_sort(map_keys(pm)), ',') AS keys_sorted,
       CAST(cardinality(pm) AS BIGINT) AS n_entries,
       CAST(list_contains(map_keys(pm), 'size') AS INT) AS has_size
FROM m
ORDER BY p_partkey
""",
)


# printf-style formatting (Spark format_string == C printf): integer and
# string conversions only — float rounding of format engines differs
# (Java HALF_UP vs C half-even) and must not be exercised
sql_query(
    "fn_format_family",
    """
SELECT p_partkey,
       format_string('%06d', p_partkey) AS key_pad,
       format_string('%s#%d', p_brand, p_size) AS brand_size,
       format_string('%x', p_partkey) AS key_hex,
       format_string('%-12s|', p_brand) AS brand_ljust
FROM part
ORDER BY p_partkey
""",
    oracle="""
SELECT p_partkey,
       printf('%06d', p_partkey) AS key_pad,
       printf('%s#%d', p_brand, p_size) AS brand_size,
       printf('%x', p_partkey) AS key_hex,
       printf('%-12s|', p_brand) AS brand_ljust
FROM part
ORDER BY p_partkey
""",
)


# Spark 4 VARIANT type (SPARK-45891): semi-structured JSON parsed once
# into a binary variant, fields extracted by path with target types —
# the open-schema column pattern (events.props is a JSON blob). Oracle:
# DuckDB JSON path extraction computes the same scalars.
sql_query(
    "fn_variant_family",
    """
SELECT event_id,
       variant_get(parse_json(props), '$.k', 'int') AS k,
       try_variant_get(parse_json(props), '$.missing', 'int') AS missing_k,
       variant_get(parse_json(props), '$.k', 'string') AS k_str,
       CAST(is_variant_null(parse_json('null')) AS INT) AS null_probe
FROM events
ORDER BY event_id
LIMIT 600
""",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k,
       CAST(json_extract(props, '$.missing') AS INT) AS missing_k,
       CAST(CAST(json_extract(props, '$.k') AS INT) AS VARCHAR) AS k_str,
       1 AS null_probe
FROM events
ORDER BY event_id
LIMIT 600
""",
)


# interval arithmetic family: timestamp ± intervals, interval scaling,
# calendar-month clamping, and unit-true timestamp differences — all
# constant-folded/codegen scalar math.
sql_query(
    "fn_interval_family",
    """
WITH t AS (SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS ts FROM orders)
SELECT o_orderkey,
       ts + INTERVAL 6 HOUR AS plus6h,
       ts - INTERVAL 90 MINUTE AS minus90m,
       ts + INTERVAL 1 DAY * CAST(o_orderkey % 5 AS INT) AS staggered,
       ts + INTERVAL 1 MONTH AS next_month,
       CAST(timestampdiff(DAY, TIMESTAMP '1995-01-01 00:00:00', ts) AS BIGINT) AS days95,
       CAST(timestampdiff(HOUR, TIMESTAMP '1995-01-01 00:00:00', ts) AS BIGINT) AS hours95
FROM t
ORDER BY o_orderkey
""",
    oracle="""
WITH t AS (SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS ts FROM orders)
SELECT o_orderkey,
       ts + INTERVAL 6 HOUR AS plus6h,
       ts - INTERVAL 90 MINUTE AS minus90m,
       ts + INTERVAL 1 DAY * CAST(o_orderkey % 5 AS INT) AS staggered,
       ts + INTERVAL 1 MONTH AS next_month,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', ts) AS BIGINT) AS days95,
       CAST(date_diff('hour', TIMESTAMP '1995-01-01 00:00:00', ts) AS BIGINT) AS hours95
FROM t
ORDER BY o_orderkey
""",
)


# URL family: parse_url component extraction + URL-encoding round-trip.
# DuckDB has neither, so the oracle restates the extraction as anchored
# regexes over the same constructed URLs (codegen scalar work either way).
sql_query(
    "fn_url_family",
    """
WITH u AS (
  SELECT doc_id,
    concat('https://', source, '.example.com/', lang, '/doc?id=', doc_id, '&v=2') AS url
  FROM documents
)
SELECT doc_id,
  parse_url(url, 'HOST') AS host,
  parse_url(url, 'PATH') AS path,
  parse_url(url, 'QUERY', 'id') AS qid,
  CAST(url_decode(url_encode(url)) = url AS INT) AS codec_roundtrip
FROM u
ORDER BY doc_id
LIMIT 120
""",
    oracle="""
WITH u AS (
  SELECT doc_id,
    concat('https://', source, '.example.com/', lang, '/doc?id=', doc_id, '&v=2') AS url
  FROM documents
)
SELECT doc_id,
  regexp_extract(url, 'https://([^/]+)/', 1) AS host,
  regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
  regexp_extract(url, '[?&]id=([^&]*)', 1) AS qid,
  1 AS codec_roundtrip
FROM u
ORDER BY doc_id
LIMIT 120
""",
)


# higher-order array_sort with a CUSTOM comparator lambda (length, then
# lexicographic) — the comparator executes in Catalyst's lambda
# interpreter, not Python. DuckDB has no comparator lambdas; the oracle
# rebuilds the same ordering by exploding and re-aggregating with a
# multi-key ORDER BY inside list(). Output joined to one string
# (raw array columns are unhashable in pandas-based result canonicalizers).
sql_query(
    "fn_array_sort_comparator",
    """
SELECT doc_id,
  array_join(array_sort(
    split(substr(text, 1, 60), ' '),
    (l, r) -> CASE WHEN length(l) < length(r) THEN -1
                   WHEN length(l) > length(r) THEN 1
                   WHEN l < r THEN -1 WHEN l > r THEN 1 ELSE 0 END
  ), ',') AS toks_by_len
FROM documents
ORDER BY doc_id
LIMIT 80
""",
    oracle="""
WITH e AS (
  SELECT doc_id, unnest(string_split(substr(text, 1, 60), ' ')) AS w
  FROM documents
)
SELECT doc_id, array_to_string(list(w ORDER BY length(w), w), ',') AS toks_by_len
FROM e
GROUP BY doc_id
ORDER BY doc_id
LIMIT 80
""",
)
