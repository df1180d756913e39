"""Geospatial analytics over synthetic coordinates — the spatial operator
family a lakehouse engine needs (geohash bucketing, radius joins, kNN,
point-in-polygon, great-circle distance) expressed Spark-first.

The fixture tables carry no coordinates, so every query derives a
deterministic lat/lon from the row key with pure integer arithmetic —
``lat = ((key*9973) % 17000)/100 - 85`` — identical bit-for-bit in Spark
and DuckDB, which keeps the oracles exact (no fixture mutation, no
randomness). Design rules for cross-engine exactness:

- integer modulus/shift/mask arithmetic only for bucketing (geohash is
  bit interleaving + base32, zero trig);
- ``sqrt`` is IEEE-754 correctly rounded in both engines, so planar
  Euclidean distances compare exactly with no rounding;
- transcendentals (haversine's sin/cos/asin) are only 1-ulp-accurate per
  libm, so great-circle outputs are ROUNDed to 2 decimals (10 m) —
  documented, not hidden.

Scale design (100 TB): the radius join buckets both sides into r-sized
grid cells and joins cell-to-neighboring-cell (each left row explodes to
its 3×3 neighborhood — a constant ×9 map-side blowup), so the shuffle is
O(points) and the comparison set is only co-located cells — never the
O(n·m) cross product the oracle runs at fixture scale. kNN broadcasts
the small (dimension-table-sized) side and windows per point, the same
plan the brute-force ANN baseline uses (llmops/similarity.py). Geohash
cell aggregation is a single hash aggregate on a computed key — pure
map-side-combine territory.

Reference parity: the reference repo (pyspark defaults + Iceberg conf,
see SURVEY.md §2.A) ships no spatial operators; this module is §2.G
build-out, following the grid-partitioned spatial-join literature
(PAPERS.md: SpatialSpark / Sedona-style uniform-grid partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries import query, sql_query
from iceberg_metadata_pipeline_spark.session import load_tables

# Deterministic synthetic coordinates (SQL fragment, valid in both
# dialects): lat ∈ [-85, 85), lon ∈ [-180, 180), two decimal places.
def _lat(key: str) -> str:
    return f"((((CAST({key} AS BIGINT) * 9973) % 17000) / 100.0E0) - 85.0E0)"


def _lon(key: str) -> str:
    return f"((((CAST({key} AS BIGINT) * 7919) % 36000) / 100.0E0) - 180.0E0)"


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _interleave_expr(lonq: str, latq: str) -> str:
    """30-bit geohash value: lon bits at even positions from the MSB
    (standard geohash bit order), built from shift/mask terms shared by
    both SQL dialects."""
    terms = []
    for i in range(15):
        terms.append(f"((({lonq} >> {14 - i}) & 1) << {29 - 2 * i})")
        terms.append(f"((({latq} >> {14 - i}) & 1) << {28 - 2 * i})")
    return "(" + " + ".join(terms) + ")"


def _base32_expr(v: str, chars: int) -> str:
    parts = [
        f"substr('{_GEOHASH32}', CAST((({v} >> {25 - 5 * j}) & 31) AS INT) + 1, 1)"
        for j in range(chars)
    ]
    return "concat(" + ", ".join(parts) + ")"


_GEOHASH_SQL = f"""
WITH pts AS (
  SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
         {_lat('c_custkey')} AS lat,
         {_lon('c_custkey')} AS lon
  FROM customer
), q AS (
  SELECT c_custkey,
         CAST(FLOOR(((lat + 90.0E0) / 180.0E0) * 32768.0E0) AS BIGINT) AS latq,
         CAST(FLOOR(((lon + 180.0E0) / 360.0E0) * 32768.0E0) AS BIGINT) AS lonq
  FROM pts
), v AS (
  SELECT c_custkey, {_interleave_expr('lonq', 'latq')} AS gv FROM q
)
SELECT c_custkey, {_base32_expr('gv', 6)} AS geohash6
FROM v
ORDER BY c_custkey
"""

# Geohash encode: bit interleaving + base32 — integer-exact in both
# engines, so the oracle is the identical string. At scale this is a
# narrow map-only projection (WholeStageCodegen, no shuffle).
sql_query("geo_geohash_encode", _GEOHASH_SQL, oracle="same")


_GEOHASH_CELL_AGG_SQL = f"""
WITH pts AS (
  SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
         CAST(c_acctbal AS DOUBLE) AS bal,
         {_lat('c_custkey')} AS lat,
         {_lon('c_custkey')} AS lon
  FROM customer
), q AS (
  SELECT c_custkey, bal,
         CAST(FLOOR(((lat + 90.0E0) / 180.0E0) * 32768.0E0) AS BIGINT) AS latq,
         CAST(FLOOR(((lon + 180.0E0) / 360.0E0) * 32768.0E0) AS BIGINT) AS lonq
  FROM pts
), v AS (
  SELECT c_custkey, bal, {_interleave_expr('lonq', 'latq')} AS gv FROM q
), cells AS (
  SELECT {_base32_expr('gv', 2)} AS geohash2, c_custkey, bal FROM v
)
SELECT geohash2,
       COUNT(*) AS n_points,
       CAST(MIN(c_custkey) AS BIGINT) AS min_key,
       CAST(SUM(CAST(bal AS DECIMAL(38, 6))) AS DOUBLE) AS sum_bal
FROM cells
GROUP BY geohash2
HAVING COUNT(*) >= 2
ORDER BY geohash2
"""

# Geohash-cell rollup: the spatial GROUP BY — one hash aggregate on a
# computed prefix key (map-side partials, no row explosion). The scale
# story for "density per tile" over 100 TB of points.
sql_query("geo_geohash_cell_agg", _GEOHASH_CELL_AGG_SQL, oracle="same")


_RADIUS_KM_DEG = 2.0  # degrees; power of two → floor(x/r) is exact


@query(
    "geo_grid_radius_join",
    f"""
WITH cust AS (
  SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
         {_lat('c_custkey')} AS clat, {_lon('c_custkey')} AS clon
  FROM customer
), supp AS (
  SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
         {_lat('s_suppkey + 500000')} AS slat, {_lon('s_suppkey + 500000')} AS slon
  FROM supplier
)
SELECT c_custkey, s_suppkey,
       SQRT((clat - slat) * (clat - slat) + (clon - slon) * (clon - slon)) AS dist_deg
FROM cust, supp
WHERE SQRT((clat - slat) * (clat - slat) + (clon - slon) * (clon - slon)) < {_RADIUS_KM_DEG}
ORDER BY c_custkey, s_suppkey
""",
)
def geo_grid_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join via uniform-grid bucketing: customers within 2° of a
    supplier. Each supplier explodes to its 3×3 cell neighborhood (any
    point within r of it lives there by the triangle inequality), the
    join runs cell-to-cell, and the exact sqrt distance filters the
    candidates. Shuffle is O(n+9m) rows on the cell key — never the
    O(n·m) cross product the DuckDB oracle runs at fixture scale.
    Distances are pure double arithmetic + correctly-rounded sqrt, so
    the comparison and output match the oracle bit-for-bit."""
    t = load_tables(spark, sf_dir)
    r = _RADIUS_KM_DEG
    cust = t["customer"].selectExpr(
        "CAST(c_custkey AS BIGINT) AS c_custkey",
        f"{_lat('c_custkey')} AS clat",
        f"{_lon('c_custkey')} AS clon",
    )
    supp = t["supplier"].selectExpr(
        "CAST(s_suppkey AS BIGINT) AS s_suppkey",
        f"{_lat('s_suppkey + 500000')} AS slat",
        f"{_lon('s_suppkey + 500000')} AS slon",
    )
    # r is a power of two, so lat/r divides exactly and the cell id is
    # deterministic; CAST(FLOOR AS BIGINT) keeps Spark/DuckDB type parity.
    cust_cells = cust.withColumn(
        "cx", F.expr(f"CAST(FLOOR(clat / {r}) AS BIGINT)")
    ).withColumn("cy", F.expr(f"CAST(FLOOR(clon / {r}) AS BIGINT)"))
    off = F.expr("explode(array(-1, 0, 1))")
    supp_cells = (
        supp.withColumn("sx0", F.expr(f"CAST(FLOOR(slat / {r}) AS BIGINT)"))
        .withColumn("sy0", F.expr(f"CAST(FLOOR(slon / {r}) AS BIGINT)"))
        .withColumn("dx", off)
        .withColumn("dy", F.expr("explode(array(-1, 0, 1))"))
        .select(
            "s_suppkey",
            "slat",
            "slon",
            (F.col("sx0") + F.col("dx")).alias("cx"),
            (F.col("sy0") + F.col("dy")).alias("cy"),
        )
    )
    dist = F.expr(
        "SQRT((clat - slat) * (clat - slat) + (clon - slon) * (clon - slon))"
    )
    return (
        cust_cells.join(supp_cells, ["cx", "cy"])
        .withColumn("dist_deg", dist)
        .filter(F.col("dist_deg") < r)
        .select("c_custkey", "s_suppkey", "dist_deg")
        .orderBy("c_custkey", "s_suppkey")
    )


@query(
    "geo_knn_broadcast",
    f"""
WITH cust AS (
  SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
         {_lat('c_custkey')} AS clat, {_lon('c_custkey')} AS clon
  FROM customer WHERE c_nationkey = 7
), supp AS (
  SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
         {_lat('s_suppkey + 500000')} AS slat, {_lon('s_suppkey + 500000')} AS slon
  FROM supplier
), scored AS (
  SELECT c_custkey, s_suppkey,
         SQRT((clat - slat) * (clat - slat) + (clon - slon) * (clon - slon)) AS dist_deg,
         ROW_NUMBER() OVER (
           PARTITION BY c_custkey
           ORDER BY SQRT((clat - slat) * (clat - slat) + (clon - slon) * (clon - slon)),
                    s_suppkey
         ) AS rn
  FROM cust, supp
)
SELECT c_custkey, s_suppkey, dist_deg, rn
FROM scored WHERE rn <= 3
ORDER BY c_custkey, rn
""",
)
def geo_knn_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 nearest suppliers per customer (one nation's slice): broadcast
    the dimension-sized supplier side, score every pair map-side (no
    shuffle for the join), then one window shuffle on c_custkey for the
    top-3 — the exact-kNN plan when one side broadcasts, mirroring the
    brute-force ANN baseline (llmops/similarity.py). Ties broken by
    s_suppkey so the ordering is total and the oracle matches exactly."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    cust = (
        t["customer"]
        .filter("c_nationkey = 7")
        .selectExpr(
            "CAST(c_custkey AS BIGINT) AS c_custkey",
            f"{_lat('c_custkey')} AS clat",
            f"{_lon('c_custkey')} AS clon",
        )
    )
    supp = t["supplier"].selectExpr(
        "CAST(s_suppkey AS BIGINT) AS s_suppkey",
        f"{_lat('s_suppkey + 500000')} AS slat",
        f"{_lon('s_suppkey + 500000')} AS slon",
    )
    dist = F.expr(
        "SQRT((clat - slat) * (clat - slat) + (clon - slon) * (clon - slon))"
    )
    w = Window.partitionBy("c_custkey").orderBy("dist_deg", "s_suppkey")
    return (
        cust.join(F.broadcast(supp))
        .withColumn("dist_deg", dist)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_custkey", "s_suppkey", "dist_deg", "rn")
        .orderBy("c_custkey", "rn")
    )


_HAVERSINE_SQL = f"""
WITH supp AS (
  SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
         CAST(s_nationkey AS BIGINT) AS s_nationkey,
         ((CAST(s_suppkey AS BIGINT) * 9973) % 17000) AS lat_i,
         ((CAST(s_suppkey AS BIGINT) * 7919) % 36000) AS lon_i
  FROM supplier
), centroid AS (
  SELECT s_nationkey,
         CAST(SUM(lat_i) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS lat_ci,
         CAST(SUM(lon_i) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS lon_ci
  FROM supp GROUP BY s_nationkey
), pts AS (
  SELECT s.s_suppkey, s.s_nationkey,
         RADIANS((s.lat_i / 100.0E0) - 85.0E0) AS la1,
         RADIANS((s.lon_i / 100.0E0) - 180.0E0) AS lo1,
         RADIANS((c.lat_ci / 100.0E0) - 85.0E0) AS la2,
         RADIANS((c.lon_ci / 100.0E0) - 180.0E0) AS lo2
  FROM supp s JOIN centroid c ON s.s_nationkey = c.s_nationkey
), h AS (
  SELECT s_suppkey, s_nationkey,
         SIN((la2 - la1) / 2.0E0) AS sdla, SIN((lo2 - lo1) / 2.0E0) AS sdlo,
         COS(la1) AS c1, COS(la2) AS c2
  FROM pts
)
SELECT s_suppkey, s_nationkey,
       ROUND(2.0E0 * 6371.0E0 * ASIN(SQRT(sdla * sdla + c1 * c2 * sdlo * sdlo)), 2)
         AS km_to_centroid
FROM h
ORDER BY s_suppkey
"""

# Great-circle distance to each nation's supplier centroid. The centroid
# is averaged in the INTEGER coordinate domain (exact bigint sum, one
# double division) so it is bit-identical cross-engine; the haversine
# itself uses libm sin/cos/asin (1-ulp accurate, not correctly rounded),
# hence the documented ROUND to 2 decimals (~10 m). At scale: one small
# aggregate (25 nations) broadcast back — no second shuffle of the fact.
sql_query("geo_haversine_centroid", _HAVERSINE_SQL, oracle="same")


# Convex pentagon (CCW, lon/lat plane). Inside = left-of-or-on every edge.
_PENTAGON = [(40.0, 0.0E0), (12.0, 38.0), (-32.0, 24.0), (-32.0, -24.0), (12.0, -38.0)]


def _inside_expr(px: str, py: str) -> str:
    tests = []
    n = len(_PENTAGON)
    for i in range(n):
        x1, y1 = _PENTAGON[i]
        x2, y2 = _PENTAGON[(i + 1) % n]
        tests.append(
            f"((({x2} - {x1}) * ({py} - {y1}) - ({y2} - {y1}) * ({px} - {x1})) >= 0.0E0)"
        )
    return "(" + " AND ".join(tests) + ")"


_PIP_SQL = f"""
WITH pts AS (
  SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment,
         {_lat('c_custkey')} AS lat, {_lon('c_custkey')} AS lon
  FROM customer
)
SELECT c_mktsegment, COUNT(*) AS n_inside,
       CAST(MIN(c_custkey) AS BIGINT) AS first_key
FROM pts
WHERE {_inside_expr('lon', 'lat')}
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

# Point-in-polygon via half-plane sign tests (convex ring): pure
# double multiply/compare, exact in both engines. At scale the polygon
# is a handful of constants folded into the scan filter — pushdown-able,
# map-only, zero shuffle before the tiny aggregate.
sql_query("geo_point_in_polygon", _PIP_SQL, oracle="same")


def _char_index_expr(gh: str, j: int) -> str:
    """0-based alphabet index of geohash char j (POSITION is ANSI —
    identical in both dialects)."""
    return f"(position(substr({gh}, {j + 1}, 1) IN '{_GEOHASH32}') - 1)"


def _decode_value_expr(gh: str, chars: int) -> str:
    parts = [
        f"(CAST({_char_index_expr(gh, j)} AS BIGINT) << {25 - 5 * j})"
        for j in range(chars)
    ]
    return "(" + " + ".join(parts) + ")"


def _deinterleave_expr(v: str, even: bool) -> str:
    """Recover the 15 lon (even=True) or lat bits from the 30-bit value."""
    first = 29 if even else 28
    terms = [f"((({v} >> {first - 2 * i}) & 1) << {14 - i})" for i in range(15)]
    return "(" + " + ".join(terms) + ")"


_GEOHASH_DECODE_SQL = f"""
WITH pts AS (
  SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
         {_lat('c_custkey')} AS lat,
         {_lon('c_custkey')} AS lon
  FROM customer
), q AS (
  SELECT c_custkey, lat, lon,
         CAST(FLOOR(((lat + 90.0E0) / 180.0E0) * 32768.0E0) AS BIGINT) AS latq,
         CAST(FLOOR(((lon + 180.0E0) / 360.0E0) * 32768.0E0) AS BIGINT) AS lonq
  FROM pts
), enc AS (
  SELECT c_custkey, lat, lon, latq, lonq,
         {_base32_expr(_interleave_expr('lonq', 'latq'), 6)} AS geohash6
  FROM q
), dec AS (
  SELECT c_custkey, lat, lon, latq, lonq, geohash6,
         {_deinterleave_expr(_decode_value_expr('geohash6', 6), False)} AS latq_rt,
         {_deinterleave_expr(_decode_value_expr('geohash6', 6), True)} AS lonq_rt
  FROM enc
)
SELECT c_custkey, geohash6,
       CAST(latq_rt = latq AND lonq_rt = lonq AS INT) AS round_trips,
       ((CAST(latq_rt * 2 + 1 AS DOUBLE) / 65536.0E0) * 180.0E0) - 90.0E0
         AS cell_center_lat,
       ((CAST(lonq_rt * 2 + 1 AS DOUBLE) / 65536.0E0) * 360.0E0) - 180.0E0
         AS cell_center_lon,
       CAST(ABS(lat - (((CAST(latq_rt * 2 + 1 AS DOUBLE) / 65536.0E0) * 180.0E0)
                        - 90.0E0)) <= 180.0E0 / 65536.0E0 AS INT) AS lat_in_cell
FROM dec
ORDER BY c_custkey
"""

# Geohash DECODE (the inverse: base32 → bit de-interleave → cell
# center) proving encode/decode round-trips exactly and the original
# point lies inside the decoded cell — all integer/shift arithmetic plus
# exact power-of-two divisions, so the oracle is the identical string.
sql_query("geo_geohash_decode", _GEOHASH_DECODE_SQL, oracle="same")
