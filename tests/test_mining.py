"""Mining/statistics tests (queries/mining.py): independent pure-Python
references for the chi-square statistic, the KS distance, basket rules,
and the Markov transition matrix — the oracle gate proves Spark↔DuckDB
parity, these prove the math."""

from __future__ import annotations

import itertools
import math
from collections import Counter, defaultdict

from iceberg_metadata_pipeline_spark.queries.mining import (
    mining_basket_pair_rules,
    mining_markov_transitions,
    stat_chi_square_independence,
    stat_ks_two_sample,
)


def test_chi_square_matches_reference(spark, sf_dir, tables):
    row = stat_chi_square_independence(spark, sf_dir).collect()[0]
    joined = (
        tables["orders"]
        .join(tables["customer"], tables["orders"].o_custkey == tables["customer"].c_custkey)
        .select("c_mktsegment", "o_orderpriority")
        .collect()
    )
    obs = Counter((r.c_mktsegment, r.o_orderpriority) for r in joined)
    rows = Counter(k[0] for k in obs.elements())
    cols = Counter(k[1] for k in obs.elements())
    tot = sum(obs.values())
    chi2 = 0.0
    for (s, p), n in sorted(obs.items()):
        exp = rows[s] * cols[p] / tot
        chi2 += (n - exp) ** 2 / exp
    assert row.n_seg == len(rows) and row.n_pri == len(cols)
    assert math.isclose(row.chi2, chi2, rel_tol=1e-9), (row.chi2, chi2)


def test_ks_matches_reference(spark, sf_dir, tables):
    row = stat_ks_two_sample(spark, sf_dir).collect()[0]
    joined = (
        tables["orders"]
        .join(tables["customer"], tables["orders"].o_custkey == tables["customer"].c_custkey)
        .select("o_totalprice", "c_mktsegment")
        .collect()
    )
    a = sorted(float(r.o_totalprice) for r in joined if r.c_mktsegment == "BUILDING")
    b = sorted(float(r.o_totalprice) for r in joined if r.c_mktsegment == "MACHINERY")
    assert row.n1 == len(a) and row.n2 == len(b)
    xs = sorted(set(a) | set(b))
    d = 0.0
    ia = ib = 0
    for x in xs:
        while ia < len(a) and a[ia] <= x:
            ia += 1
        while ib < len(b) and b[ib] <= x:
            ib += 1
        d = max(d, abs(ia / len(a) - ib / len(b)))
    assert math.isclose(row.ks_stat, d, rel_tol=1e-12), (row.ks_stat, d)


def test_basket_rules_match_bruteforce(spark, sf_dir, tables):
    res = mining_basket_pair_rules(spark, sf_dir).collect()
    li = tables["lineitem"].select("l_orderkey", "l_partkey").collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    item_cnt = Counter(p for parts in baskets.values() for p in parts)
    pair_cnt = Counter(
        pair
        for parts in baskets.values()
        for pair in itertools.combinations(sorted(parts), 2)
    )
    want = {k: v for k, v in pair_cnt.items() if v >= 2}
    got = {(r.part_a, r.part_b): r.pair_cnt for r in res}
    assert got == want
    for r in res:
        assert r.conf_a_to_b == r.pair_cnt / item_cnt[r.part_a]
        assert r.conf_b_to_a == r.pair_cnt / item_cnt[r.part_b]


def test_markov_rows_are_distributions(spark, sf_dir):
    res = mining_markov_transitions(spark, sf_dir).collect()
    assert res, "no transitions in fixture"
    by_cur = defaultdict(float)
    for r in res:
        assert 0.0 < r.p <= 1.0
        by_cur[r.cur] += r.p
    for cur, s in by_cur.items():
        assert math.isclose(s, 1.0, rel_tol=1e-9), (cur, s)


def test_ols_matches_numpy_lstsq(spark, sf_dir, tables):
    import numpy as np

    from iceberg_metadata_pipeline_spark.queries import all_queries

    row = all_queries()["ml_ols_normal_equations"](spark, sf_dir).collect()[0]
    rows = tables["lineitem"].select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).collect()
    X = np.array([[1.0, float(r.l_quantity), float(r.l_discount)] for r in rows])
    y = np.array([float(r.l_extendedprice) for r in rows])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row.n == len(rows)
    assert abs(row.beta_intercept - beta[0]) < 1e-6 * max(1.0, abs(beta[0]))
    assert abs(row.beta_quantity - beta[1]) < 1e-6 * max(1.0, abs(beta[1]))
    assert abs(row.beta_discount - beta[2]) < 1e-6 * max(1.0, abs(beta[2]))
    pred = X @ beta
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    assert abs(row.r2 - (1 - ss_res / ss_tot)) < 1e-6


def test_basket_hot_basket_guard_bounds_pair_work(spark, tmp_path):
    """Round 10 (verdict #6, replaces the r9 drop-over-cap): a
    degenerate hot basket (> max_basket items) is TRIANGLE-PARTITIONED
    into hash salt groups — every pair is still produced exactly once
    (the result matches the unguarded brute force bit-for-bit) while
    each join task holds at most two salt groups' items. The salted
    plan keys the pair join on (okey, kp, kq), never the bare hot
    order key."""
    import os

    # synthetic lineitem: one hot basket (order 1, 60 items -> several
    # salt groups at max_basket=16) + two normal baskets sharing a pair
    rows = [(1, p) for p in range(60)]
    rows += [(2, 10), (2, 11), (3, 10), (3, 11), (3, 12)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    from iceberg_metadata_pipeline_spark.queries.mining import (
        mining_basket_pair_rules,
    )

    try:
        res = mining_basket_pair_rules(
            spark, str(tmp_path), max_basket=16
        ).collect()
        got = {(r.part_a, r.part_b): r for r in res}
        # brute-force expectation over ALL baskets (pairs recurring >= 2)
        from collections import Counter
        from itertools import combinations

        baskets = {1: set(range(60)), 2: {10, 11}, 3: {10, 11, 12}}
        cnt = Counter()
        for parts in baskets.values():
            for x, y in combinations(sorted(parts), 2):
                cnt[(x, y)] += 1
        expect = {k: v for k, v in cnt.items() if v >= 2}
        assert {k: r.pair_cnt for k, r in got.items()} == expect
        # the salted pairs (10,11): baskets 1,2,3 -> pair_cnt 3, and
        # item 10 appears in 3 baskets -> conf 3/3
        r = got[(10, 11)]
        assert r.pair_cnt == 3
        assert r.conf_a_to_b == 1.0 and r.conf_b_to_a == 1.0
        # salting inert when the cap exceeds every basket: same rows
        res2 = mining_basket_pair_rules(
            spark, str(tmp_path), max_basket=1000
        ).collect()
        assert {(r.part_a, r.part_b): r.pair_cnt for r in res2} == expect
    finally:
        # load_tables pointed the SESSION-wide 'lineitem' temp view at
        # the synthetic table and cached it per (session, sf_dir) — drop
        # this session's cache entries so the next test's load_tables
        # re-registers its own fixture views instead of keeping ours
        from iceberg_metadata_pipeline_spark import session as _sess

        for k in [k for k in _sess._TABLE_CACHE if k[0] == id(spark)]:
            _sess._TABLE_CACHE.pop(k, None)


def test_cramers_v_matches_reference(spark, sf_dir, tables):
    """V = sqrt(chi2 / (n * min(r-1, c-1))) against the same pure-Python
    contingency reference the chi-square test uses."""
    from iceberg_metadata_pipeline_spark.queries.mining import stat_cramers_v

    row = stat_cramers_v(spark, sf_dir).collect()[0]
    joined = (
        tables["orders"]
        .join(tables["customer"], tables["orders"].o_custkey == tables["customer"].c_custkey)
        .select("c_mktsegment", "o_orderpriority")
        .collect()
    )
    obs = Counter((r.c_mktsegment, r.o_orderpriority) for r in joined)
    rows = Counter(k[0] for k in obs.elements())
    cols = Counter(k[1] for k in obs.elements())
    tot = sum(obs.values())
    chi2 = sum(
        (n - rows[s] * cols[p] / tot) ** 2 / (rows[s] * cols[p] / tot)
        for (s, p), n in sorted(obs.items())
    )
    v = math.sqrt(chi2 / (tot * min(len(rows) - 1, len(cols) - 1)))
    assert row.n_obs == tot
    assert math.isclose(row.cramers_v, v, rel_tol=1e-9), (row.cramers_v, v)
    assert 0.0 <= row.cramers_v <= 1.0
