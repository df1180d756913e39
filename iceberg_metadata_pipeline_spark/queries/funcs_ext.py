"""Scalar/aggregate function families, extension pack (round 4).

Families the deployed Spark SQL surface serves that the registry did not
yet pin: regular expressions, hashing/encoding/crypto round-trips, XPath
extraction, map higher-order functions, string utility trio, bitwise
aggregates, positional explode/array generators, unionByName with
missing columns, CSV and XML scalar parsing, UTF-8 validation, checked
skewness/kurtosis and extended regr_* statistics, LIMIT..OFFSET, and the
exists/forall/zip_with/reduce lambda family with array set ops.
Each query emits values BOTH engines can compute so the
DuckDB oracle checks exact equality; where dialects differ (Spark
``regexp_replace`` is global by default, DuckDB needs the ``'g'`` flag;
Spark ``regexp_substr`` yields NULL on no-match where DuckDB's
``regexp_extract`` yields ``''``; DuckDB has no xpath at all) the oracle
recomputes the same value relationally, which doubles as the semantic
proof that Spark's function did what it claims.

All expressions are JVM-side Catalyst (whole-stage codegen) — nothing
here leaves the executor, so every query is a scan-speed projection at
any scale.
"""

from __future__ import annotations

from iceberg_metadata_pipeline_spark.queries import sql_query

# --- regular expressions ----------------------------------------------------
# Patterns stay in the Java-regex ∩ RE2 common subset (character classes,
# quantifiers — no backreferences/lookarounds, which RE2 rejects).

sql_query(
    "fn_regexp_family",
    """
SELECT p_partkey,
       size(regexp_extract_all(p_name, '[a-z]+', 0)) AS n_words,
       regexp_extract(p_name, '[a-z]+', 0) AS first_word,
       regexp_replace(p_name, '[aeiou]', '') AS devoweled,
       CAST(p_name RLIKE 'red|blue' AS INT) AS has_color,
       regexp_count(p_name, '[aeiou]+') AS n_vowel_runs,
       regexp_instr(p_name, 'o') AS first_o_pos,
       regexp_substr(p_name, '[a-z]{9,}') AS long_word
FROM part
ORDER BY p_partkey
LIMIT 500
""",
    oracle="""
SELECT p_partkey,
       len(regexp_extract_all(p_name, '[a-z]+')) AS n_words,
       regexp_extract(p_name, '[a-z]+') AS first_word,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
       CAST(regexp_matches(p_name, 'red|blue') AS INT) AS has_color,
       len(regexp_extract_all(p_name, '[aeiou]+')) AS n_vowel_runs,
       CASE WHEN regexp_matches(p_name, 'o')
            THEN length(string_split(p_name, 'o')[1]) + 1 ELSE 0 END AS first_o_pos,
       NULLIF(regexp_extract(p_name, '[a-z]{9,}'), '') AS long_word
FROM part
ORDER BY p_partkey
LIMIT 500
""",
)

# --- hashing / encoding / crypto round-trips --------------------------------
# aes_decrypt(aes_encrypt(x)) == x proves the crypto pair end-to-end; the
# oracle emits x directly (DuckDB has no AES, and doesn't need one to
# check a round-trip). hex() case differs across engines — normalized.

sql_query(
    "fn_hash_encode_family",
    """
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha2(c_name, 256) AS name_sha256,
       lower(hex(c_mktsegment)) AS seg_hex,
       base64(c_name) AS name_b64,
       CAST(unbase64(base64(c_name)) AS STRING) AS b64_roundtrip,
       CAST(aes_decrypt(
              aes_encrypt(c_name, '0123456789abcdef', 'ECB'),
              '0123456789abcdef', 'ECB') AS STRING) AS aes_roundtrip
FROM customer
ORDER BY c_custkey
LIMIT 400
""",
    oracle="""
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha256(c_name) AS name_sha256,
       lower(hex(c_mktsegment)) AS seg_hex,
       to_base64(c_name::BLOB) AS name_b64,
       c_name AS b64_roundtrip,
       c_name AS aes_roundtrip
FROM customer
ORDER BY c_custkey
LIMIT 400
""",
)

# --- XPath extraction -------------------------------------------------------
# Spark parses a constructed XML document and extracts typed values; the
# oracle emits the source columns — equality proves the xpath_* family
# round-trips structure faithfully.

sql_query(
    "fn_xpath_family",
    """
WITH x AS (
  SELECT n_nationkey, n_name,
         concat('<r><k>', n_nationkey, '</k><n>', n_name,
                '</n><n>EXTRA</n></r>') AS xml
  FROM nation
)
SELECT n_nationkey,
       xpath_int(xml, '/r/k') AS k_int,
       xpath_long(xml, '/r/k') AS k_long,
       xpath_string(xml, '/r/n') AS n_first,
       size(xpath(xml, '/r/n/text()')) AS n_tags,
       CAST(xpath_boolean(xml, '/r/k') AS INT) AS has_k
FROM x
ORDER BY n_nationkey
""",
    oracle="""
SELECT n_nationkey,
       CAST(n_nationkey AS INT) AS k_int,
       CAST(n_nationkey AS BIGINT) AS k_long,
       n_name AS n_first,
       2 AS n_tags,
       1 AS has_k
FROM nation
ORDER BY n_nationkey
""",
)

# --- map higher-order functions ---------------------------------------------
# Build a per-region map, push it through transform_keys /
# transform_values / map_filter / map_zip_with, explode back to rows.
# The oracle states the same computation relationally — the lambda
# pipeline must land exactly on the plain-SQL answer.

sql_query(
    "fn_map_higher_order",
    """
WITH m AS (
  SELECT n_regionkey AS region,
         map_from_entries(collect_list(struct(n_name, n_nationkey))) AS m0
  FROM nation GROUP BY n_regionkey
),
hof AS (
  SELECT region,
         map_filter(
           transform_values(
             transform_keys(m0, (k, v) -> upper(k)),
             (k, v) -> v * 2 + length(k)),
           (k, v) -> v % 2 = 0) AS mf
  FROM m
),
z AS (
  SELECT region, map_zip_with(mf, mf, (k, a, b) -> a + b) AS mz FROM hof
)
SELECT region, key AS nation_uc, value AS v2
FROM z LATERAL VIEW explode(mz) AS key, value
ORDER BY region, nation_uc
""",
    oracle="""
SELECT n_regionkey AS region,
       upper(n_name) AS nation_uc,
       (n_nationkey * 2 + length(n_name)) * 2 AS v2
FROM nation
WHERE (n_nationkey * 2 + length(n_name)) % 2 = 0
ORDER BY region, nation_uc
""",
)

# --- string utility trio ----------------------------------------------------

sql_query(
    "fn_string_family3",
    """
SELECT c_custkey,
       str_to_map(concat('k1:', c_custkey, ',k2:', c_nationkey), ',', ':')['k1']
         AS m_custkey,
       str_to_map(concat('k1:', c_custkey, ',k2:', c_nationkey), ',', ':')['k2']
         AS m_nationkey,
       substring_index(c_name, '#', -1) AS name_suffix,
       mask(c_name) AS name_masked
FROM customer
ORDER BY c_custkey
LIMIT 400
""",
    oracle="""
SELECT c_custkey,
       CAST(c_custkey AS VARCHAR) AS m_custkey,
       CAST(c_nationkey AS VARCHAR) AS m_nationkey,
       split_part(c_name, '#', 2) AS name_suffix,
       regexp_replace(regexp_replace(regexp_replace(
         c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
         AS name_masked
FROM customer
ORDER BY c_custkey
LIMIT 400
""",
)

# --- bitwise aggregates -----------------------------------------------------

sql_query(
    "agg_bitwise_aggs",
    """
SELECT o_orderpriority,
       CAST(bit_and(o_custkey % 4096) AS BIGINT) AS key_bit_and,
       CAST(bit_or(o_custkey % 4096) AS BIGINT) AS key_bit_or,
       CAST(bit_xor(o_custkey % 4096) AS BIGINT) AS key_bit_xor,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    oracle="same",
)

# --- positional explode / array generators ----------------------------------
# posexplode carries the element ordinal through the lateral view;
# sequence/array_repeat/slice are the generator trio. The oracle
# rebuilds the same rows from generate_series.

sql_query(
    "fn_posexplode_family",
    """
WITH s AS (
  SELECT n_nationkey, sequence(1, CAST(n_nationkey % 4 + 1 AS INT)) AS seq
  FROM nation
)
SELECT n_nationkey, pos, elem,
       size(array_repeat('x', pos)) AS rep_len,
       array_join(slice(seq, 1, 2), '-') AS head2
FROM s LATERAL VIEW posexplode(seq) AS pos, elem
ORDER BY n_nationkey, pos
""",
    oracle="""
WITH s AS (
  SELECT n_nationkey,
         unnest(generate_series(1, CAST(n_nationkey % 4 + 1 AS INT))) AS elem
  FROM nation
)
SELECT n_nationkey,
       CAST(elem - 1 AS INT) AS pos,
       CAST(elem AS INT) AS elem,
       CAST(elem - 1 AS INT) AS rep_len,
       CASE WHEN n_nationkey % 4 + 1 >= 2 THEN '1-2' ELSE '1' END AS head2
FROM s
ORDER BY n_nationkey, pos
""",
)

# --- unionByName with missing columns ---------------------------------------
# Schema-mismatched UNION: absent columns null-fill per side (the
# DataFrame allowMissingColumns semantics, spelled as SQL by the oracle).

from iceberg_metadata_pipeline_spark.queries import query as _query
from iceberg_metadata_pipeline_spark.session import load_tables as _load_tables


@_query(
    "setop_union_by_name_missing",
    """
SELECT c_custkey AS id, c_acctbal AS bal, CAST(NULL AS VARCHAR) AS sname
FROM customer WHERE c_custkey <= 200
UNION ALL
SELECT s_suppkey + 1000000 AS id, CAST(NULL AS DOUBLE) AS bal, s_name AS sname
FROM supplier WHERE s_suppkey <= 50
ORDER BY id
""",
)
def setop_union_by_name_missing(spark, sf_dir):
    """df.unionByName(other, allowMissingColumns=True): each side's
    absent columns null-fill; column resolution is by NAME, not
    position (the SQL UNION trap this API exists to avoid)."""
    from pyspark.sql import functions as F

    t = _load_tables(spark, sf_dir)
    a = (
        t["customer"]
        .filter(F.col("c_custkey") <= 200)
        .select(F.col("c_custkey").alias("id"), F.col("c_acctbal").alias("bal"))
    )
    b = (
        t["supplier"]
        .filter(F.col("s_suppkey") <= 50)
        .select(
            (F.col("s_suppkey") + 1000000).alias("id"),
            F.col("s_name").alias("sname"),
        )
    )
    return a.unionByName(b, allowMissingColumns=True).orderBy("id")

# --- CSV scalar functions ----------------------------------------------------
# from_csv/to_csv/schema_of_csv: parse a constructed line back into a
# struct and re-emit; the oracle states the same values relationally.

sql_query(
    "fn_csv_family",
    """
WITH c AS (
  SELECT n_nationkey, n_name,
         from_csv(concat(n_name, ';', n_nationkey),
                  'nm STRING, k INT', map('sep', ';')) AS parsed
  FROM nation
)
SELECT n_nationkey,
       parsed.nm AS nm,
       parsed.k AS k,
       to_csv(named_struct('a', n_name, 'b', n_nationkey)) AS line,
       schema_of_csv('1,abc') AS csv_schema
FROM c
ORDER BY n_nationkey
""",
    oracle="""
SELECT n_nationkey,
       n_name AS nm,
       CAST(n_nationkey AS INT) AS k,
       concat(n_name, ',', n_nationkey) AS line,
       'STRUCT<_c0: INT, _c1: STRING>' AS csv_schema
FROM nation
ORDER BY n_nationkey
""",
)

# --- UTF-8 validation family (Spark 4) --------------------------------------
# Fixture text is valid UTF-8, so every validator must agree with the
# identity — which is exactly the oracle's claim.

sql_query(
    "fn_utf8_family",
    """
SELECT doc_id,
       CAST(is_valid_utf8(text) AS INT) AS is_valid,
       length(make_valid_utf8(text)) AS mk_len,
       length(validate_utf8(text)) AS val_len,
       length(try_validate_utf8(text)) AS try_len
FROM documents
ORDER BY doc_id
LIMIT 500
""",
    oracle="""
SELECT doc_id,
       1 AS is_valid,
       length(text) AS mk_len,
       length(text) AS val_len,
       length(text) AS try_len
FROM documents
ORDER BY doc_id
LIMIT 500
""",
)

# --- skewness / kurtosis, tolerance-checked ---------------------------------
# Spark's skewness() and kurtosis() are population moments (m3/m2^1.5,
# m4/m2^2 - 3). The oracle cannot reproduce a float-summed moment
# bit-for-bit, so both engines emit the moment recomputed from
# DECIMAL-accumulated power sums (order-independent, identical), and
# Spark additionally checks its native aggregate against that value —
# the boolean ships as the proof, the decimal value as the comparison.

_MOMENTS = """
  SELECT o_orderpriority,
         COUNT(*) AS n,
         CAST(SUM(CAST(CAST(o_totalprice AS DOUBLE) / 100000 AS DECIMAL(38,8))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(POWER(CAST(o_totalprice AS DOUBLE) / 100000, 2) AS DECIMAL(38,8))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(POWER(CAST(o_totalprice AS DOUBLE) / 100000, 3) AS DECIMAL(38,8))) AS DOUBLE) AS s3,
         CAST(SUM(CAST(POWER(CAST(o_totalprice AS DOUBLE) / 100000, 4) AS DECIMAL(38,8))) AS DOUBLE) AS s4
  FROM orders GROUP BY o_orderpriority
"""

_MOMENT_FORMULA = """
  SELECT o_orderpriority, n,
         s1 / n AS mu,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
         s4 / n - 4 * (s1 / n) * (s3 / n)
               + 6 * (s1 / n) * (s1 / n) * (s2 / n)
               - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM moments
"""

sql_query(
    "agg_skew_kurtosis_checked",
    f"""
WITH moments AS ({_MOMENTS}),
m AS ({_MOMENT_FORMULA}),
native AS (
  SELECT o_orderpriority,
         skewness(CAST(o_totalprice AS DOUBLE) / 100000) AS sk_native,
         kurtosis(CAST(o_totalprice AS DOUBLE) / 100000) AS ku_native
  FROM orders GROUP BY o_orderpriority
)
SELECT m.o_orderpriority, m.n,
       round(m.m3 / POWER(m.m2, 1.5), 9) AS skew_decimal,
       round(m.m4 / (m.m2 * m.m2) - 3, 9) AS kurt_decimal,
       CAST(ABS(native.sk_native - m.m3 / POWER(m.m2, 1.5)) < 0.001 AS INT)
         AS skew_agrees,
       CAST(ABS(native.ku_native - (m.m4 / (m.m2 * m.m2) - 3)) < 0.001 AS INT)
         AS kurt_agrees
FROM m JOIN native ON m.o_orderpriority = native.o_orderpriority
ORDER BY m.o_orderpriority
""",
    oracle=f"""
WITH moments AS ({_MOMENTS}),
m AS ({_MOMENT_FORMULA})
SELECT o_orderpriority, n,
       round(m3 / POWER(m2, 1.5), 9) AS skew_decimal,
       round(m4 / (m2 * m2) - 3, 9) AS kurt_decimal,
       1 AS skew_agrees,
       1 AS kurt_agrees
FROM m
ORDER BY o_orderpriority
""",
)

# --- extended linear-regression aggregates, tolerance-checked ---------------
# Same pattern as skewness/kurtosis: both engines emit the statistics
# rebuilt from DECIMAL-accumulated sums (exact, order-independent);
# Spark additionally proves its native regr_* aggregates land on those
# values. regr_count is exact and compared directly.

_REGR_SUMS = """
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(38,8))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE) / 1000 AS DECIMAL(38,8))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(POWER(CAST(l_quantity AS DOUBLE), 2) AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(POWER(CAST(l_extendedprice AS DOUBLE) / 1000, 2) AS DECIMAL(38,8))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(CAST(l_quantity AS DOUBLE) * (CAST(l_extendedprice AS DOUBLE) / 1000) AS DECIMAL(38,8))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
"""

_REGR_STATS = """
  SELECT l_returnflag, n,
         sx / n AS avgx,
         sy / n AS avgy,
         sxx - sx * sx / n AS cxx,
         syy - sy * sy / n AS cyy,
         sxy - sx * sy / n AS cxy
  FROM sums
"""

sql_query(
    "agg_regr_extended_checked",
    f"""
WITH sums AS ({_REGR_SUMS}),
m AS ({_REGR_STATS}),
native AS (
  SELECT l_returnflag,
         regr_count(CAST(l_extendedprice AS DOUBLE) / 1000,
                    CAST(l_quantity AS DOUBLE)) AS n_native,
         regr_avgx(CAST(l_extendedprice AS DOUBLE) / 1000,
                   CAST(l_quantity AS DOUBLE)) AS avgx_native,
         regr_avgy(CAST(l_extendedprice AS DOUBLE) / 1000,
                   CAST(l_quantity AS DOUBLE)) AS avgy_native,
         regr_sxx(CAST(l_extendedprice AS DOUBLE) / 1000,
                  CAST(l_quantity AS DOUBLE)) AS sxx_native,
         regr_syy(CAST(l_extendedprice AS DOUBLE) / 1000,
                  CAST(l_quantity AS DOUBLE)) AS syy_native,
         regr_sxy(CAST(l_extendedprice AS DOUBLE) / 1000,
                  CAST(l_quantity AS DOUBLE)) AS sxy_native,
         regr_r2(CAST(l_extendedprice AS DOUBLE) / 1000,
                 CAST(l_quantity AS DOUBLE)) AS r2_native
  FROM lineitem GROUP BY l_returnflag
)
SELECT m.l_returnflag,
       CAST(native.n_native AS BIGINT) AS n,
       round(m.avgx, 9) AS avgx,
       round(m.avgy, 9) AS avgy,
       round(m.cxx, 6) AS sxx,
       round(m.cyy, 6) AS syy,
       round(m.cxy, 6) AS sxy,
       round(m.cxy * m.cxy / (m.cxx * m.cyy), 9) AS r2,
       CAST(ABS(native.avgx_native - m.avgx) < 1e-6 AS INT) AS avgx_agrees,
       CAST(ABS(native.sxx_native - m.cxx) / m.cxx < 1e-6 AS INT) AS sxx_agrees,
       CAST(ABS(native.syy_native - m.cyy) / m.cyy < 1e-6 AS INT) AS syy_agrees,
       CAST(ABS(native.sxy_native - m.cxy) / ABS(m.cxy) < 1e-4 AS INT) AS sxy_agrees,
       CAST(ABS(native.r2_native - m.cxy * m.cxy / (m.cxx * m.cyy)) < 1e-6 AS INT)
         AS r2_agrees
FROM m JOIN native ON m.l_returnflag = native.l_returnflag
ORDER BY m.l_returnflag
""",
    oracle=f"""
WITH sums AS ({_REGR_SUMS}),
m AS ({_REGR_STATS})
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       round(avgx, 9) AS avgx,
       round(avgy, 9) AS avgy,
       round(cxx, 6) AS sxx,
       round(cyy, 6) AS syy,
       round(cxy, 6) AS sxy,
       round(cxy * cxy / (cxx * cyy), 9) AS r2,
       1 AS avgx_agrees, 1 AS sxx_agrees, 1 AS syy_agrees,
       1 AS sxy_agrees, 1 AS r2_agrees
FROM m
ORDER BY l_returnflag
""",
)

# --- LIMIT ... OFFSET + ORDER BY ALL ----------------------------------------
# OFFSET pagination (Spark 3.4+) and the ORDER BY ALL shorthand; DuckDB
# spells ORDER BY ALL identically.

sql_query(
    "order_by_offset_pagination",
    """
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM orders
WHERE o_orderstatus = 'F'
ORDER BY ALL
LIMIT 50 OFFSET 100
""",
    oracle="same",
)

# --- from_xml scalar parsing + inline ---------------------------------------
# from_xml (Spark 4): schema-directed XML→struct in the projection (the
# scalar sibling of the XML source); inline() explodes an array of
# structs to columns. Oracle restates both relationally.

sql_query(
    "fn_from_xml_inline",
    """
WITH x AS (
  SELECT n_nationkey,
         from_xml(concat('<r><k>', n_nationkey, '</k><nm>', n_name, '</nm></r>'),
                  'k INT, nm STRING') AS parsed,
         array(named_struct('ord', 1, 'val', n_name),
               named_struct('ord', 2, 'val', upper(n_name))) AS pair
  FROM nation
)
SELECT n_nationkey, parsed.k AS k, parsed.nm AS nm, ord, val
FROM x LATERAL VIEW inline(pair) AS ord, val
ORDER BY n_nationkey, ord
""",
    oracle="""
SELECT n_nationkey,
       CAST(n_nationkey AS INT) AS k,
       n_name AS nm,
       ord,
       CASE WHEN ord = 1 THEN n_name ELSE upper(n_name) END AS val
FROM nation, (SELECT 1 AS ord UNION ALL SELECT 2) o
ORDER BY n_nationkey, ord
""",
)

# --- exists / forall / zip_with / reduce + array set ops --------------------
# Arrays are sequences 1..k and 2..m, so every lambda result has a
# closed form the oracle states directly: the lambda interpreter must
# land exactly on arithmetic.

sql_query(
    "fn_hof_exists_forall",
    """
WITH s AS (
  SELECT n_nationkey,
         CAST(n_nationkey % 5 + 1 AS INT) AS k,
         CAST(n_nationkey % 4 + 2 AS INT) AS bmax,
         sequence(1, CAST(n_nationkey % 5 + 1 AS INT)) AS a,
         sequence(2, CAST(n_nationkey % 4 + 2 AS INT)) AS b
  FROM nation
)
SELECT n_nationkey,
       CAST(exists(a, x -> x % 2 = 0) AS INT) AS has_even,
       CAST(forall(a, x -> x > 0) AS INT) AS all_pos,
       aggregate(zip_with(a, a, (x, y) -> x + y), 0, (acc, x) -> acc + x)
         AS zipped_sum,
       reduce(a, 0, (acc, x) -> acc + x, acc -> acc * 10) AS reduced_x10,
       size(array_union(a, b)) AS n_union,
       size(array_intersect(a, b)) AS n_intersect,
       size(array_except(a, b)) AS n_except
FROM s
ORDER BY n_nationkey
""",
    oracle="""
WITH s AS (
  SELECT n_nationkey,
         CAST(n_nationkey % 5 + 1 AS INT) AS k,
         CAST(n_nationkey % 4 + 2 AS INT) AS bmax
  FROM nation
)
SELECT n_nationkey,
       CAST(k >= 2 AS INT) AS has_even,
       1 AS all_pos,
       k * (k + 1) AS zipped_sum,
       (k * (k + 1) // 2) * 10 AS reduced_x10,
       GREATEST(k, bmax) AS n_union,
       GREATEST(LEAST(k, bmax) - 1, 0) AS n_intersect,
       1 + GREATEST(k - bmax, 0) AS n_except
FROM s
ORDER BY n_nationkey
""",
)
