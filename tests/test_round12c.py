"""Round-12 continuation, batch 2: semantic pins for the retrieval-eval
completion and classical-test queries beyond the oracle gate — each
re-derived from the raw parquet with an independent pure-Python
reference (exact fractions for AP@10/ECE/Cronbach, numpy-free PACF)."""

from __future__ import annotations

import os
from fractions import Fraction

import duckdb
import pytest

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def _run(spark, name):
    from iceberg_metadata_pipeline_spark.queries import all_queries

    return all_queries()[name](spark, SF)


def _events(cols):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {cols} FROM '{SF}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


def test_map_at_10_matches_fraction_reference(spark):
    """AP@10 per user re-derived with exact Fractions over the same
    md5-tiebroken ranking."""
    import hashlib

    rows = _events(
        "user_id, event_id, event_type,"
        " CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT)"
    )
    by_user: dict[int, list] = {}
    for uid, eid, et, score in rows:
        rel = 1 if et in ("purchase", "click", "view") else 0
        tb = hashlib.md5(str(eid).encode()).hexdigest()
        by_user.setdefault(uid, []).append((-int(score), tb, rel))
    expect = {}
    for uid, evs in by_user.items():
        evs.sort()
        n_rel = sum(r for _, _, r in evs)
        if n_rel == 0:
            continue
        hits = 0
        ap = Fraction(0)
        for k, (_, _, r) in enumerate(evs[:10], start=1):
            if r:
                hits += 1
                ap += Fraction(hits, k)
        expect[uid] = float(ap / min(n_rel, 10))
    got = {
        r.user_id: (r.ap_at_10, r.n_rel)
        for r in _run(spark, "ml_map_at_10").collect()
    }
    assert set(got) == set(expect)
    for uid, (ap, _n) in got.items():
        assert ap == pytest.approx(expect[uid], abs=1e-12), uid


def test_ece_matches_fraction_reference(spark):
    rows = _events(
        "CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT),"
        " CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
    )
    scores = [int(s) for s, _ in rows]
    lo, hi = min(scores), max(scores)
    d = hi - lo + 1
    bins: dict[int, list] = {}
    for s, lab in rows:
        b = min((int(s) - lo) * 10 // d, 9)
        bins.setdefault(b, []).append((int(s) - lo, lab))
    ece = Fraction(0)
    n_all = len(rows)
    for b, xs in bins.items():
        pos = sum(lab for _, lab in xs)
        ssum = sum(sc for sc, _ in xs)
        ece += Fraction(abs(pos * d - ssum), d * n_all)
    out = _run(spark, "ml_expected_calibration_error").collect()[0]
    assert out.n == n_all and out.n_bins == len(bins)
    assert out.ece == pytest.approx(float(ece), rel=1e-12)


def test_cronbach_alpha_matches_fraction_reference(spark):
    rows = _events("user_id, event_type")
    types = ["view", "click", "purchase", "signup", "error"]
    m: dict[int, list] = {}
    for uid, et in rows:
        v = m.setdefault(uid, [0] * 5)
        v[types.index(et)] += 1
    n = len(m)
    num = Fraction(0)
    for i in range(5):
        s = sum(v[i] for v in m.values())
        q = sum(v[i] * v[i] for v in m.values())
        num += Fraction(n * q - s * s)
    st = sum(sum(v) for v in m.values())
    qt = sum(sum(v) ** 2 for v in m.values())
    alpha = Fraction(5, 4) * (1 - num / (n * qt - st * st))
    out = _run(spark, "stat_cronbach_alpha").collect()[0]
    assert out.n == n
    assert out.cronbach_alpha == pytest.approx(float(alpha), rel=1e-12)


def test_pacf_yule_walker_matches_python_reference(spark):
    con = duckdb.connect()
    series = [
        int(c)
        for (c,) in con.execute(
            f"SELECT COUNT(*) FROM '{SF}/events.parquet'"
            " GROUP BY CAST(ts AS DATE) ORDER BY CAST(ts AS DATE)"
        ).fetchall()
    ]
    con.close()
    n = len(series)
    mean = sum(series) / n
    den = sum((x - mean) ** 2 for x in series)

    def rho(k):
        return (
            sum(
                (series[t] - mean) * (series[t + k] - mean)
                for t in range(n - k)
            )
            / den
        )

    r1, r2, r3 = rho(1), rho(2), rho(3)
    p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    p21 = r1 * (1 - p22)
    p33 = (r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2)
    out = _run(spark, "stat_pacf_yule_walker").collect()[0]
    assert out.pacf_1 == pytest.approx(r1, rel=1e-9)
    assert out.pacf_2 == pytest.approx(p22, rel=1e-9)
    assert out.pacf_3 == pytest.approx(p33, rel=1e-9)


def test_cochran_armitage_matches_python_reference(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS days,
               CASE WHEN CAST(MIN(CASE WHEN event_type = 'purchase'
                                  THEN ts END) AS DATE)
                         = CAST(MIN(ts) AS DATE)
                    THEN 1 ELSE 0 END
        FROM '{SF}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    con.close()
    import math

    n = len(rows)
    r = sum(resp for _, resp in rows)
    sn = sr = s2n = 0
    for days, resp in rows:
        s = 1 if days <= 24 else 2 if days <= 26 else 3 if days <= 28 else 4
        sn += s
        sr += s * resp
        s2n += s * s
    z = (n * sr - r * sn) / math.sqrt(
        r * (n - r) * (n * s2n - sn * sn) / n
    )
    out = _run(spark, "stat_cochran_armitage_trend").collect()[0]
    assert out.n == n and out.r == r
    assert out.z_trend == pytest.approx(z, rel=1e-12)


def test_jonckheere_terpstra_matches_python_reference(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT o_orderpriority,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT)
        FROM '{SF}/orders.parquet'
        GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)
        """
    ).fetchall()
    con.close()
    import math
    from collections import defaultdict

    groups = defaultdict(list)
    for g, x in rows:
        groups[g].append(int(x))
    keys = sorted(groups)
    jt2 = 0
    for i, gi in enumerate(keys):
        for gj in keys[i + 1 :]:
            for a in groups[gi]:
                for b in groups[gj]:
                    jt2 += 2 if a < b else (1 if a == b else 0)
    ns = [len(groups[k]) for k in keys]
    n = sum(ns)
    mu2 = (n * n - sum(x * x for x in ns)) // 2
    var = (
        n * n * (2 * n + 3) - sum(x * x * (2 * x + 3) for x in ns)
    ) / 72.0
    z = (jt2 - mu2) / (2.0 * math.sqrt(var))
    out = _run(spark, "stat_jonckheere_terpstra").collect()[0]
    assert out.jt_stat == jt2 // 2 and out.n == n
    assert out.z_jt == pytest.approx(z, rel=1e-12)


def test_welch_anova_matches_python_reference(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT r.r_name,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{SF}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
        JOIN '{SF}/region.parquet' r ON n.n_regionkey = r.r_regionkey
        """
    ).fetchall()
    con.close()
    from collections import defaultdict

    groups = defaultdict(list)
    for g, x in rows:
        groups[g].append(int(x))
    k = len(groups)
    w = {}
    m = {}
    for g, xs in groups.items():
        n_g = len(xs)
        mean = sum(xs) / n_g
        var = sum((x - mean) ** 2 for x in xs) / (n_g - 1)
        w[g] = n_g / var
        m[g] = mean
    W_ = sum(w.values())
    mbar = sum(w[g] * m[g] for g in groups) / W_
    A = sum(w[g] * (m[g] - mbar) ** 2 for g in groups) / (k - 1)
    lam = sum(
        (1 - w[g] / W_) ** 2 / (len(groups[g]) - 1) for g in groups
    )
    F_ = A / (1 + 2 * (k - 2) / (k * k - 1) * lam)
    df2 = (k * k - 1) / (3 * lam)
    out = _run(spark, "stat_welch_anova").collect()[0]
    assert out.k == k
    assert out.f_welch == pytest.approx(F_, rel=1e-9)
    assert out.df2 == pytest.approx(df2, rel=1e-9)


def test_morans_i_matches_textbook_double_sum(spark):
    """The denominator-cleared closed form equals the textbook
    I = (n/W) * sum_ij w_ij (x_i-m)(x_j-m) / sum_i (x_i-m)^2 with
    w_ij = 1 iff i != j share a region."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT n.n_nationkey, r.r_regionkey,
               CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT)
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{SF}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
        JOIN '{SF}/region.parquet' r ON n.n_regionkey = r.r_regionkey
        GROUP BY n.n_nationkey, r.r_regionkey
        """
    ).fetchall()
    con.close()
    xs = [(rk, int(v)) for _nk, rk, v in rows]
    n = len(xs)
    m = sum(v for _r, v in xs) / n
    num = sum(
        (vi - m) * (vj - m)
        for i, (ri, vi) in enumerate(xs)
        for j, (rj, vj) in enumerate(xs)
        if i != j and ri == rj
    )
    den = sum((v - m) ** 2 for _r, v in xs)
    W = sum(
        1
        for i, (ri, _vi) in enumerate(xs)
        for j, (rj, _vj) in enumerate(xs)
        if i != j and ri == rj
    )
    expect = (n / W) * num / den
    out = _run(spark, "geo_morans_i_region_spend").collect()[0]
    assert out.n == n and out.w_pairs == W
    assert out.morans_i == pytest.approx(expect, rel=1e-9)


def test_load_tables_cache_repoints_views_across_sf(spark):
    """Regression (round 12): load_tables caches DataFrames per
    (session, sf_dir) but temp views are session-global — a cache hit
    after ANOTHER sf registered must re-point the views, or spark.sql
    reads the wrong scale while the returned DataFrames read the right
    one (the cross-test contamination seen in the full suite)."""
    from iceberg_metadata_pipeline_spark.session import load_tables

    a, b = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    na = load_tables(spark, a)["orders"].count()
    nb = load_tables(spark, b)["orders"].count()
    assert na != nb
    # cache hit for `a` must re-point the session views at `a`
    load_tables(spark, a)
    assert spark.sql("SELECT COUNT(*) c FROM orders").collect()[0].c == na
    load_tables(spark, b)
    assert spark.sql("SELECT COUNT(*) c FROM orders").collect()[0].c == nb


def test_page_trend_matches_python_reference(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(ts AS DATE), event_type, COUNT(*)
        FROM '{SF}/events.parquet'
        GROUP BY CAST(ts AS DATE), event_type
        """
    ).fetchall()
    con.close()
    import math
    from collections import defaultdict

    types = ["click", "error", "purchase", "signup", "view"]
    by_day = defaultdict(dict)
    for day, et, v in rows:
        by_day[day][et] = int(v)
    blocks = {d: m for d, m in by_day.items() if len(m) == 5}
    b, k = len(blocks), 5
    L = 0.0
    for m in blocks.values():
        vals = sorted(m.values())
        for et, v in m.items():
            lo = sum(1 for x in vals if x < v)
            eq = sum(1 for x in vals if x == v)
            mid = lo + (eq + 1) / 2
            L += (types.index(et) + 1) * mid
    mu = b * k * (k + 1) ** 2 / 4
    sd = math.sqrt(b * (k**3 - k) ** 2 / (144 * (k - 1)))
    out = _run(spark, "stat_page_trend").collect()[0]
    assert out.b == b and out.k == k
    assert out.z_page == pytest.approx((L - mu) / sd, rel=1e-9)


def test_cuzick_trend_matches_python_reference(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT),
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT)
        FROM '{SF}/orders.parquet'
        GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)
        """
    ).fetchall()
    con.close()
    import math

    data = [(int(l), int(x)) for l, x in rows]
    xs = sorted(x for _l, x in data)
    n = len(data)

    def midrank(v):
        lo = sum(1 for x in xs if x < v)
        eq = sum(1 for x in xs if x == v)
        return lo + (eq + 1) / 2

    T = sum(l * midrank(x) for l, x in data)
    nl = sum(l for l, _x in data)
    nl2 = sum(l * l for l, _x in data)
    ET = (n + 1) * nl / 2
    var = (n + 1) / 12 * (n * nl2 - nl * nl)
    out = _run(spark, "stat_cuzick_trend").collect()[0]
    assert out.n == n
    assert out.z_cuzick == pytest.approx((T - ET) / math.sqrt(var), rel=1e-9)
