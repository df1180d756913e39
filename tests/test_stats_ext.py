"""stats_ext queries vs INDEPENDENT numpy/pure-Python references (the
DuckDB oracle proves cross-engine bit parity; these prove the statistics
are the right statistics)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from iceberg_metadata_pipeline_spark.queries import REGISTRY


@pytest.fixture(scope="module")
def two_group(spark, sf_dir):
    from iceberg_metadata_pipeline_spark.queries.stats_ext import _two_group

    rows = _two_group(spark, sf_dir).collect()
    v = np.array([r.v for r in rows])
    g = np.array([r.g for r in rows])
    return v[g == 1], v[g == 0]


def test_welch_matches_numpy(spark, sf_dir, two_group):
    a, b = two_group
    got = REGISTRY["stat_welch_ttest"].fn(spark, sf_dir).collect()[0]
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t_ref = (a.mean() - b.mean()) / math.sqrt(se2)
    df_ref = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert got.n1 == len(a) and got.n2 == len(b)
    assert got.t_stat == pytest.approx(t_ref, rel=1e-9)
    assert got.df == pytest.approx(df_ref, rel=1e-9)


def test_anova_matches_numpy(spark, sf_dir):
    from iceberg_metadata_pipeline_spark.session import load_tables

    t = load_tables(spark, sf_dir)
    rows = (
        t["orders"]
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
        .selectExpr("c_mktsegment AS seg", "CAST(o_totalprice AS DOUBLE) AS v")
        .collect()
    )
    groups: dict[str, list[float]] = {}
    for r in rows:
        groups.setdefault(r.seg, []).append(r.v)
    arrs = [np.array(vs) for vs in groups.values()]
    allv = np.concatenate(arrs)
    ssb = sum(len(x) * (x.mean() - allv.mean()) ** 2 for x in arrs)
    ssw = sum(((x - x.mean()) ** 2).sum() for x in arrs)
    k, n = len(arrs), len(allv)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    got = REGISTRY["stat_anova_f_oneway"].fn(spark, sf_dir).collect()[0]
    assert got.k == k and got.n == n
    assert got.f_stat == pytest.approx(f_ref, rel=1e-7)


def _midranks(values):
    """value -> midrank over the pooled multiset."""
    import collections

    counts = collections.Counter(values)
    out, below = {}, 0
    for v in sorted(counts):
        out[v] = below + (counts[v] + 1) / 2
        below += counts[v]
    return out


def test_mann_whitney_matches_pure_python(spark, sf_dir, two_group):
    a, b = two_group
    pooled = np.concatenate([a, b])
    ranks = _midranks(pooled.tolist())
    r1 = sum(ranks[x] for x in a.tolist())
    n1, n2 = len(a), len(b)
    u1_ref = r1 - n1 * (n1 + 1) / 2
    import collections

    ties = sum(
        c**3 - c for c in collections.Counter(pooled.tolist()).values()
    )
    n = n1 + n2
    sigma = math.sqrt(n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1))))
    z_ref = (u1_ref - n1 * n2 / 2) / sigma
    got = REGISTRY["stat_mann_whitney_u"].fn(spark, sf_dir).collect()[0]
    assert got.u1 == pytest.approx(u1_ref, abs=1e-6)
    assert got.z == pytest.approx(z_ref, rel=1e-9)


def test_spearman_matches_numpy_midranks(spark, sf_dir, tables):
    rows = tables["lineitem"].selectExpr(
        "CAST(l_quantity AS DOUBLE) AS x", "CAST(l_extendedprice AS DOUBLE) AS y"
    ).collect()
    xs = [r.x for r in rows]
    ys = [r.y for r in rows]
    rx_map, ry_map = _midranks(xs), _midranks(ys)
    rx = np.array([rx_map[x] for x in xs])
    ry = np.array([ry_map[y] for y in ys])
    rho_ref = np.corrcoef(rx, ry)[0, 1]
    got = REGISTRY["stat_spearman_corr"].fn(spark, sf_dir).collect()[0]
    assert got.n == len(rows)
    assert got.rho == pytest.approx(rho_ref, rel=1e-9)


def test_autocorr_matches_numpy(spark, sf_dir, tables):
    import collections

    daily: dict = collections.defaultdict(float)
    for r in tables["orders"].selectExpr(
        "CAST(o_orderdate AS DATE) AS d", "CAST(o_totalprice AS DOUBLE) AS v"
    ).collect():
        daily[r.d] += r.v
    series = np.array([daily[d] for d in sorted(daily)])
    x, y = series[:-1], series[1:]
    r_ref = np.corrcoef(x, y)[0, 1]
    got = REGISTRY["stat_autocorr_lag1"].fn(spark, sf_dir).collect()[0]
    assert got.n == len(series) - 1
    assert got.r1 == pytest.approx(r_ref, rel=1e-6)


def test_nelson_aalen_and_weighted_median_references(spark, sf_dir, tables):
    """Pure-Python references: H(t) must be the prefix sum of d/n over
    the Kaplan-Meier risk table, and the weighted median the smallest
    value whose doubled cumulative weight reaches the group total."""
    import math
    from collections import defaultdict

    from iceberg_metadata_pipeline_spark.queries import all_queries

    qs = all_queries()
    # Nelson-Aalen vs a direct reference over the same spans
    got = {r.t_days: r for r in qs["stat_nelson_aalen_hazard"](spark, sf_dir).collect()}
    ev = tables["events"].select("user_id", "ts").collect()
    span = {}
    for r in ev:
        t0, t1 = span.get(r.user_id, (r.ts, r.ts))
        span[r.user_id] = (min(t0, r.ts), max(t1, r.ts))
    horizon = max(r.ts for r in ev)
    import datetime as dt

    obs = [
        ((t1.date() - t0.date()).days, 1 if t1 < horizon - dt.timedelta(days=7) else 0)
        for t0, t1 in span.values()
    ]
    by_t = defaultdict(lambda: [0, 0])
    for d_, e in obs:
        by_t[d_][0] += e
        by_t[d_][1] += 1
    n_risk = len(obs)
    for t in sorted(by_t):
        d_, leaving = by_t[t]
        if d_ > 0:
            assert got[t].at_risk == n_risk
            assert got[t].events == d_
        n_risk -= leaving
    # recompute H the query's way (sorted fold of all terms <= t)
    n_risk = len(obs)
    terms = []
    for t in sorted(by_t):
        d_, leaving = by_t[t]
        terms.append((t, d_ / n_risk))
        n_risk -= leaving
    for t in sorted(by_t):
        d_, _ = by_t[t]
        if d_ > 0:
            want = math.fsum(f for tt, f in terms if tt <= t)
            assert math.isclose(got[t].cum_hazard, want, rel_tol=1e-9)

    # weighted median vs a direct reference
    wm = {r.flag: (r.weighted_median, r.total_weight)
          for r in qs["agg_weighted_median"](spark, sf_dir).collect()}
    li = tables["lineitem"].select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    agg = defaultdict(lambda: defaultdict(int))
    for r in li:
        agg[r.l_returnflag][r.l_extendedprice] += int(r.l_quantity)
    for flag, vals in agg.items():
        tot = sum(vals.values())
        cum = 0
        for v in sorted(vals):
            cum += vals[v]
            if 2 * cum >= tot:
                assert wm[flag][0] == float(v), (flag, wm[flag][0], v)
                break
        assert wm[flag][1] == tot
