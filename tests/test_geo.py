"""Geospatial operator tests (queries/geo.py).

The oracle gate already proves Spark↔DuckDB parity; these tests add the
*independent* checks the gate can't: the geohash against a from-scratch
pure-Python encoder (textbook bisection algorithm, not the SQL bit
tricks), the grid radius join against an exhaustive naive scan, and
point-in-polygon against a reference ray-casting implementation.
"""

from __future__ import annotations

import math

from iceberg_metadata_pipeline_spark.queries.geo import (
    _PENTAGON,
    geo_grid_radius_join,
    geo_knn_broadcast,
)


def _synth(key: int, offset: int = 0) -> tuple[float, float]:
    k = key + offset
    lat = ((k * 9973) % 17000) / 100.0 - 85.0
    lon = ((k * 7919) % 36000) / 100.0 - 180.0
    return lat, lon


def _geohash_reference(lat: float, lon: float, precision: int) -> str:
    """Textbook geohash: interval bisection, lon bit first."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < precision * 5:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for j in range(precision):
        v = 0
        for b in bits[5 * j : 5 * j + 5]:
            v = (v << 1) | b
        out.append(alphabet[v])
    return "".join(out)


def test_geohash_matches_reference_encoder(spark, sf_dir):
    from iceberg_metadata_pipeline_spark.queries import all_queries

    rows = all_queries()["geo_geohash_encode"](spark, sf_dir).collect()
    assert rows, "fixture produced no customers"
    for r in rows[:200]:
        lat, lon = _synth(r.c_custkey)
        assert r.geohash6 == _geohash_reference(lat, lon, 6), (
            r.c_custkey,
            lat,
            lon,
        )


def test_grid_radius_join_equals_naive(spark, sf_dir, tables):
    got = {
        (r.c_custkey, r.s_suppkey)
        for r in geo_grid_radius_join(spark, sf_dir).collect()
    }
    custs = [r.c_custkey for r in tables["customer"].select("c_custkey").collect()]
    supps = [r.s_suppkey for r in tables["supplier"].select("s_suppkey").collect()]
    want = set()
    for c in custs:
        clat, clon = _synth(c)
        for s in supps:
            slat, slon = _synth(s, offset=500000)
            if math.hypot(clat - slat, clon - slon) < 2.0:
                want.add((c, s))
    assert got == want


def test_knn_is_true_top3(spark, sf_dir, tables):
    res = geo_knn_broadcast(spark, sf_dir).collect()
    supps = [r.s_suppkey for r in tables["supplier"].select("s_suppkey").collect()]
    by_cust: dict[int, list[int]] = {}
    for r in res:
        by_cust.setdefault(r.c_custkey, []).append(r.s_suppkey)
    assert by_cust, "nation slice was empty"
    for c, got in by_cust.items():
        clat, clon = _synth(c)
        ranked = sorted(
            supps,
            key=lambda s: (math.dist((clat, clon), _synth(s, 500000)), s),
        )
        assert got == ranked[:3], c


def test_point_in_polygon_matches_ray_casting(spark, sf_dir, tables):
    def ray_cast(px: float, py: float) -> bool:
        inside = False
        n = len(_PENTAGON)
        for i in range(n):
            x1, y1 = _PENTAGON[i]
            x2, y2 = _PENTAGON[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
                if px < xint:
                    inside = not inside
        return inside

    from iceberg_metadata_pipeline_spark.queries import all_queries

    got = {
        r.c_mktsegment: r.n_inside
        for r in all_queries()["geo_point_in_polygon"](spark, sf_dir).collect()
    }
    rows = tables["customer"].select("c_custkey", "c_mktsegment").collect()
    want: dict[str, int] = {}
    for r in rows:
        lat, lon = _synth(r.c_custkey)
        if ray_cast(lon, lat):
            want[r.c_mktsegment] = want.get(r.c_mktsegment, 0) + 1
    assert got == want


def test_geohash_decode_round_trips(spark, sf_dir):
    """Oracle parity can't catch encode/decode being wrong the same way
    on both engines — assert the semantic truth directly: every decode
    recovers the quantized cell and the original point lies inside it."""
    from iceberg_metadata_pipeline_spark.queries import all_queries

    rows = all_queries()["geo_geohash_decode"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.round_trips == 1 and r.lat_in_cell == 1, r
        lat, lon = _synth(r.c_custkey)
        assert abs(r.cell_center_lon - lon) <= 360.0 / 65536.0, r
