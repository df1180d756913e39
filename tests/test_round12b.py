"""Round-12 continuation: semantic pins for the survival-test and
robust-estimator batch (stats_more.py) beyond the oracle gate — each
query re-derived from the raw parquet with an independent pure-Python
reference (exact fractions for the Fisher tail, textbook product-limit
arithmetic for log-rank/RMST, literal Walsh-average medians for HL)."""

from __future__ import annotations

import math
import os
from fractions import Fraction

import duckdb
import pytest

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def _spans():
    """Per-user (days_to_first_purchase, converted, group1) from the raw
    parquet (censored at last activity when the user never purchases)."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH pu AS (
          SELECT user_id, MIN(ts) AS t0, MAX(ts) AS t1,
                 MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
          FROM '{SF}/events.parquet' GROUP BY user_id
        )
        SELECT datediff('day', CAST(t0 AS DATE),
                        CAST(COALESCE(tp, t1) AS DATE)),
               CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END,
               CAST(user_id % 2 AS INT)
        FROM pu
        """
    ).fetchall()
    con.close()
    return [(int(d), int(e), int(g)) for d, e, g in rows]


def _risk_table(spans):
    """Per event-time t: (d, d1, n_at_risk, n1_at_risk), ascending t."""
    times = sorted({t for t, _, _ in spans})
    out = []
    for t in times:
        d = sum(e for tt, e, _ in spans if tt == t)
        d1 = sum(e for tt, e, g in spans if tt == t and g == 1)
        nr = sum(1 for tt, _, _ in spans if tt >= t)
        nr1 = sum(1 for tt, _, g in spans if tt >= t and g == 1)
        if d > 0:
            out.append((t, d, d1, nr, nr1))
    return out


def _run(spark, name):
    from iceberg_metadata_pipeline_spark.queries import REGISTRY, _load_all

    _load_all()
    return REGISTRY[name].fn(spark, SF).collect()


def test_logrank_matches_python_reference(spark):
    rt = _risk_table(_spans())
    if not rt:
        pytest.skip("no conversion events at this sf")
    o1 = sum(d1 for _, _, d1, _, _ in rt)
    e1 = sum(d * nr1 / nr for _, d, _, nr, nr1 in rt)
    v = sum(
        (d * nr1 * (nr - nr1) * (nr - d)) / (nr * nr * (nr - 1))
        for _, d, _, nr, nr1 in rt
        if nr > 1
    )
    rows = _run(spark, "stat_logrank_test")
    assert len(rows) == 1
    r = rows[0]
    assert r["o1"] == o1
    assert r["e1_sum"] == pytest.approx(e1, rel=1e-9, abs=1e-9)
    assert r["var_sum"] == pytest.approx(v, rel=1e-9, abs=1e-9)
    if v > 0:
        assert r["logrank_chi2"] == pytest.approx(
            (o1 - e1) ** 2 / v, rel=1e-6, abs=1e-8
        )


def test_rmst_matches_python_reference(spark):
    spans = _spans()
    rt = _risk_table(spans)
    tau = 7
    # textbook product-limit curve, then the step integral over [0, tau]
    surv, curve = 1.0, []
    for t, d, _, nr, _ in rt:
        surv *= 1.0 - d / nr
        curve.append((t, surv))
    rmst, prev_t, prev_s = 0.0, 0, 1.0
    if curve and curve[0][0] == 0:
        prev_s = curve[0][1]
        curve = curve[1:]
    for t, s in curve:
        if prev_t >= tau:
            break
        rmst += prev_s * (min(t, tau) - prev_t)
        prev_t, prev_s = t, s
    if prev_t < tau:
        rmst += prev_s * (tau - prev_t)
    rows = _run(spark, "stat_rmst_first_purchase")
    assert len(rows) == 1
    assert rows[0]["horizon_days"] == tau
    assert rows[0]["rmst_days"] == pytest.approx(rmst, rel=1e-9, abs=1e-9)
    # the curve is a survival function: RMST bounded by the horizon
    assert 0.0 < rows[0]["rmst_days"] <= tau


def test_fisher_exact_matches_exact_fractions(spark):
    con = duckdb.connect()
    a, b, c, d = con.execute(
        f"""
        WITH u AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
            MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS cl,
            MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pu
          FROM '{SF}/events.parquet' GROUP BY user_id, CAST(ts AS DATE)
        )
        SELECT SUM(cl*pu), SUM(cl*(1-pu)), SUM((1-cl)*pu), SUM((1-cl)*(1-pu))
        FROM u
        """
    ).fetchone()
    con.close()
    a, b, c, d = int(a), int(b), int(c), int(d)
    r1, r2, c1, n = a + b, c + d, a + c, a + b + c + d
    p = sum(
        Fraction(math.comb(r1, k) * math.comb(r2, c1 - k), math.comb(n, c1))
        for k in range(a, min(r1, c1) + 1)
    )
    rows = _run(spark, "stat_fisher_exact_onesided")
    assert len(rows) == 1
    r = rows[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (a, b, c, d)
    # the SQL rounds to 6 digits after libm ln/exp; fractions are exact
    assert r["p_one_sided"] == pytest.approx(float(p), abs=2e-6)
    assert 0.0 <= r["p_one_sided"] <= 1.0 + 1e-12


def test_hodges_lehmann_is_walsh_median(spark):
    con = duckdb.connect()
    ys = [
        int(y)
        for (y,) in con.execute(
            f"""
            SELECT CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT)) AS BIGINT)
            FROM '{SF}/orders.parquet'
            GROUP BY CAST(o_orderdate AS DATE)
            """
        ).fetchall()
    ]
    con.close()
    walsh = sorted(
        ys[i] + ys[j] for i in range(len(ys)) for j in range(i, len(ys))
    )
    m = len(walsh)
    hl = (walsh[(m - 1) // 2] + walsh[m // 2]) / 4.0 / 100.0
    rows = _run(spark, "stat_hodges_lehmann_daily")
    assert len(rows) == 1
    assert rows[0]["n_pairs"] == m
    assert rows[0]["hodges_lehmann"] == pytest.approx(hl, rel=1e-12)
