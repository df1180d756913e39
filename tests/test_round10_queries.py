"""Round-10 query additions: semantic pins beyond the oracle gate —
reference implementations in pure Python for the new statistics, the
EWMA fold contract, exact trimmed/winsorized means, transitivity, lift,
and Flesch readability."""

from __future__ import annotations

import math
import os

import pytest

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem", "events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _two_col(spark, sf_dir=SF):
    from iceberg_metadata_pipeline_spark.session import load_tables

    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
        .selectExpr("c_mktsegment AS seg", "CAST(o_totalprice AS DOUBLE) AS v")
        .collect()
    )


def test_kruskal_wallis_matches_scipy_style_reference(spark):
    from iceberg_metadata_pipeline_spark.queries.stats_ext import (
        stat_kruskal_wallis,
    )

    rows = _two_col(spark)
    groups: dict = {}
    for r in rows:
        groups.setdefault(r.seg, []).append(r.v)
    # midranks over the pooled sample
    pooled = sorted(v for vs in groups.values() for v in vs)
    n = len(pooled)
    # rank map: value -> average rank
    from collections import Counter

    cnt = Counter(pooled)
    rank = {}
    below = 0
    for v in sorted(cnt):
        c = cnt[v]
        rank[v] = below + (c + 1) / 2
        below += c
    rsum = 0.0
    for vs in groups.values():
        rj = sum(rank[v] for v in vs)
        rsum += rj * rj / len(vs)
    ties = sum(c * c * c - c for c in cnt.values())
    h = (12.0 / (n * (n + 1)) * rsum - 3 * (n + 1)) / (
        1 - ties / (n**3 - n)
    )
    got = stat_kruskal_wallis(spark, SF).collect()[0]
    assert got["n"] == n and got["k"] == len(groups)
    assert got["h_stat"] == pytest.approx(h, rel=1e-9)


def test_bartlett_matches_reference(spark):
    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries

    all_queries()
    rows = _two_col(spark)
    groups: dict = {}
    for r in rows:
        groups.setdefault(r.seg, []).append(r.v)
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    import statistics

    sp_num = sum((len(v) - 1) * statistics.variance(v) for v in groups.values())
    sp2 = sp_num / (n - k)
    num = (n - k) * math.log(sp2) - sum(
        (len(v) - 1) * math.log(statistics.variance(v))
        for v in groups.values()
    )
    den = 1 + (sum(1 / (len(v) - 1) for v in groups.values()) - 1 / (n - k)) / (
        3 * (k - 1)
    )
    got = REGISTRY["stat_bartlett_variance"].fn(spark, SF).collect()[0]
    assert got["bartlett_stat"] == pytest.approx(num / den, rel=1e-7)


def test_durbin_watson_reference(spark):
    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries
    from iceberg_metadata_pipeline_spark.session import load_tables

    all_queries()
    t = load_tables(spark, SF)
    daily = sorted(
        (r["d"], float(r["y"]))
        for r in t["orders"]
        .selectExpr("o_orderdate AS d", "CAST(o_totalprice AS DOUBLE) AS y")
        .groupBy("d")
        .sum("y")
        .withColumnRenamed("sum(y)", "y")
        .collect()
    )
    xs = list(range(len(daily)))
    # recompute x as days since 1992-01-01 like the query does
    import datetime

    base = datetime.date(1992, 1, 1)
    xs = [(datetime.date.fromisoformat(str(d)[:10]) - base).days for d, _ in daily]
    ys = [y for _, y in daily]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    e = [y - slope * x - intercept for x, y in zip(xs, ys)]
    dw = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n)) / sum(
        v * v for v in e
    )
    got = REGISTRY["stat_durbin_watson"].fn(spark, SF).collect()[0]
    assert got["n_days"] == n
    assert got["dw_stat"] == pytest.approx(dw, rel=1e-6)


def test_ewma_is_the_recurrence(spark):
    """forecast_ewma_daily == the day-ordered recurrence y=0.3x+0.7y."""
    from iceberg_metadata_pipeline_spark.llmops.forecast import (
        forecast_ewma_daily,
    )
    from iceberg_metadata_pipeline_spark.session import load_tables

    t = load_tables(spark, SF)
    daily = (
        t["events"]
        .selectExpr("event_type", "CAST(ts AS DATE) AS d")
        .groupBy("event_type", "d")
        .count()
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.d, r["count"]))
    got = {r.event_type: r for r in forecast_ewma_daily(spark, SF).collect()}
    for et, pts in series.items():
        pts.sort()
        y = float(pts[0][1])
        for _, x in pts[1:]:
            y = 0.3 * x + 0.7 * y
        assert got[et]["ewma"] == pytest.approx(y, rel=1e-12)
        assert got[et]["n_days"] == len(pts)


def test_trimmed_winsorized_reference(spark):
    from iceberg_metadata_pipeline_spark.queries.aggregates import (
        agg_trimmed_winsorized_mean,
    )
    from iceberg_metadata_pipeline_spark.session import load_tables

    vals = sorted(
        float(r[0])
        for r in load_tables(spark, SF)["orders"]
        .selectExpr("CAST(o_totalprice AS DOUBLE)")
        .collect()
    )
    n = len(vals)
    k = n // 10
    mid = vals[k : n - k]
    trimmed = sum(mid) / (n - 2 * k)
    wins = (sum(mid) + k * vals[k] + k * vals[n - k - 1]) / n
    got = agg_trimmed_winsorized_mean(spark, SF).collect()[0]
    assert got["n"] == n and got["k_trim"] == k
    assert got["trimmed_mean"] == pytest.approx(trimmed, rel=1e-9)
    assert got["winsorized_mean"] == pytest.approx(wins, rel=1e-9)


def test_bounce_rate_reference(spark):
    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries
    from iceberg_metadata_pipeline_spark.session import load_tables

    all_queries()
    ev = (
        load_tables(spark, SF)["events"]
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_id")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id))
    n_sessions = n_bounce = 0
    for pts in by_user.values():
        pts.sort()
        sizes = []
        cur = 0
        prev = None
        for ts, _ in pts:
            if prev is not None and (ts - prev).total_seconds() > 300:
                sizes.append(cur)
                cur = 0
            cur += 1
            prev = ts
        sizes.append(cur)
        n_sessions += len(sizes)
        n_bounce += sum(1 for s in sizes if s == 1)
    got = REGISTRY["events_bounce_rate"].fn(spark, SF).collect()[0]
    assert (got["n_sessions"], got["n_bounces"]) == (n_sessions, n_bounce)


def test_transitivity_identity(spark):
    """3·triangles ≤ wedges and the ratio is their exact quotient; the
    triangle count agrees with graph_triangle_count."""
    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries

    all_queries()
    got = REGISTRY["graph_transitivity_ratio"].fn(spark, SF).collect()[0]
    tri = REGISTRY["graph_triangle_count"].fn(spark, SF).collect()[0]
    assert got["n_triangles"] == tri["n_triangles"]
    assert 3 * got["n_triangles"] <= got["n_wedges"]
    assert got["transitivity"] == pytest.approx(
        3.0 * got["n_triangles"] / got["n_wedges"], rel=0
    )


def test_lift_consistent_with_confidence(spark):
    """lift = conf_a_to_b · N / cnt_b — cross-check the two queries."""
    from iceberg_metadata_pipeline_spark.queries.mining import (
        mining_basket_lift,
        mining_basket_pair_rules,
    )
    from iceberg_metadata_pipeline_spark.session import load_tables

    li = load_tables(spark, SF)["lineitem"]
    nb = li.selectExpr("l_orderkey").distinct().count()
    conf = {
        (r.part_a, r.part_b): r
        for r in mining_basket_pair_rules(spark, SF).collect()
    }
    lifts = mining_basket_lift(spark, SF).collect()
    assert len(lifts) == len(conf)
    for r in lifts:
        c = conf[(r.part_a, r.part_b)]
        # conf_b_to_a = pair/cnt_a; lift = pair·N/(cnt_a·cnt_b)
        cnt_a = c.pair_cnt / c.conf_a_to_b
        cnt_b = c.pair_cnt / c.conf_b_to_a
        assert r.lift == pytest.approx(
            r.pair_cnt * nb / (cnt_a * cnt_b), rel=1e-9
        )


def test_flesch_formula_pinned(spark):
    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries
    from iceberg_metadata_pipeline_spark.session import load_tables

    all_queries()
    rows = REGISTRY["text_flesch_reading_ease"].fn(spark, SF).collect()
    docs = {
        r.doc_id: r.text
        for r in load_tables(spark, SF)["documents"].collect()
    }
    import re

    assert rows
    for r in rows[:25]:
        text = docs[r.doc_id]
        words = len(re.split(" +", text.strip()))
        sents = max(len(re.findall(r"[.!?]+", text)), 1)
        sylls = len(re.findall(r"[aeiouy]+", text.lower()))
        assert (r.words, r.sents, r.sylls) == (words, sents, sylls)
        expect = 206.835 - 1.015 * (words / sents) - 84.6 * (sylls / words)
        assert r.flesch_score == pytest.approx(expect, rel=1e-12)


def test_friedman_reference(spark):
    """Friedman χ² against a pure-Python blocked-rank reimplementation
    (deterministic seg tiebreak, full 5-segment blocks only)."""
    from collections import defaultdict

    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries
    from iceberg_metadata_pipeline_spark.session import load_tables

    all_queries()
    t = load_tables(spark, SF)
    rows = (
        t["orders"]
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
        .selectExpr(
            "substring(CAST(o_orderdate AS STRING), 1, 7) AS blk",
            "c_mktsegment AS seg",
            "CAST(o_totalprice AS DECIMAL(38,6)) AS rev",
        )
        .groupBy("blk", "seg")
        .agg({"rev": "sum"})
        .collect()
    )
    cells = defaultdict(dict)
    for r in rows:
        cells[r.blk][r.seg] = r["sum(rev)"]
    full = {b: segs for b, segs in cells.items() if len(segs) == 5}
    rsum = defaultdict(int)
    for segs in full.values():
        ordered = sorted(segs.items(), key=lambda kv: (kv[1], kv[0]))
        for rank, (seg, _) in enumerate(ordered, start=1):
            rsum[seg] += rank
    n, k = len(full), 5
    chi2 = 12.0 / (n * k * (k + 1)) * sum(v * v for v in rsum.values()) - 3.0 * n * (k + 1)
    got = REGISTRY["stat_friedman_test"].fn(spark, SF).collect()[0]
    assert got["n_blocks"] == n and got["k"] == k
    assert got["friedman_chi2"] == pytest.approx(chi2, rel=1e-9)


def test_mcnemar_reference(spark):
    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries
    from iceberg_metadata_pipeline_spark.session import load_tables

    all_queries()
    ev = load_tables(spark, SF)["events"].selectExpr(
        "user_id", "event_type", "CAST(ts AS DATE) AS d"
    ).collect()
    import datetime

    cut = datetime.date(1995, 1, 16)
    p1, p2 = set(), set()
    users = set()
    for r in ev:
        users.add(r.user_id)
        if r.event_type == "click":
            (p1 if r.d < cut else p2).add(r.user_id)
    b = len([u for u in users if u in p1 and u not in p2])
    c = len([u for u in users if u not in p1 and u in p2])
    got = REGISTRY["stat_mcnemar_paired"].fn(spark, SF).collect()[0]
    assert (got["b"], got["c"]) == (b, c)
    assert got["mcnemar_chi2"] == pytest.approx(
        (abs(b - c) - 1) ** 2 / (b + c), rel=1e-12
    )


def test_seasonal_indices_mean_one(spark):
    """Σ n_m·index_m / Σ n_m == 1 (the multiplicative-index identity)
    and every month appears once."""
    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries

    all_queries()
    rows = REGISTRY["forecast_seasonal_indices"].fn(spark, SF).collect()
    assert sorted(r.month for r in rows) == list(range(1, 13))
    wsum = sum(r.n_years * r.seasonal_index for r in rows)
    total = sum(r.n_years for r in rows)
    assert wsum / total == pytest.approx(1.0, rel=1e-9)


def test_column_profile_reference(spark):
    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries
    from iceberg_metadata_pipeline_spark.session import load_tables

    all_queries()
    got = {
        r.column_name: r
        for r in REGISTRY["quality_column_profile"].fn(spark, SF).collect()
    }
    li = load_tables(spark, SF)["lineitem"]
    n = li.count()
    for col in ("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate"):
        r = got[col]
        assert r.n_rows == n and r.n_nulls == 0
        assert r.n_distinct == li.select(col).distinct().count()


def test_kappa_and_report_consistent(spark):
    """κ and the report derive from the SAME confusion matrix: rebuild
    it from text_langid_heuristic's output and cross-check both."""
    from collections import Counter

    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries

    all_queries()
    pred = [
        (r.labeled_lang, r.detected_lang)
        for r in REGISTRY["text_langid_heuristic"].fn(spark, SF).collect()
    ]
    n = len(pred)
    agree = sum(1 for a, b in pred if a == b)
    rows = Counter(a for a, _ in pred)
    cols = Counter(b for _, b in pred)
    chance = sum(rows[c] * cols.get(c, 0) for c in rows)
    kappa = (n * agree - chance) / (n * n - chance)
    got = REGISTRY["stat_cohens_kappa_langid"].fn(spark, SF).collect()[0]
    assert (got.total, got.agree) == (n, agree)
    assert got.cohens_kappa == pytest.approx(kappa, rel=1e-12)

    rep = {
        r.cls: r
        for r in REGISTRY["ml_classification_report"].fn(spark, SF).collect()
    }
    for cls, r in rep.items():
        tp = sum(1 for a, b in pred if a == cls and b == cls)
        fp = sum(1 for a, b in pred if b == cls and a != cls)
        fn = sum(1 for a, b in pred if a == cls and b != cls)
        assert (r.tp, r.fp, r.fn) == (tp, fp, fn)
        if tp + fp:
            assert r.precision_ == pytest.approx(tp / (tp + fp), rel=1e-12)
        if tp + fn:
            assert r.recall_ == pytest.approx(tp / (tp + fn), rel=1e-12)


def test_histogram_quantile_guarantee(spark):
    """The true q-quantile must lie inside the selected bin
    [est_lo, est_hi) — the sketch's by-construction guarantee."""
    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries
    from iceberg_metadata_pipeline_spark.session import load_tables

    all_queries()
    got = {
        r.pct: (r.est_cents_lo, r.est_cents_hi)
        for r in REGISTRY["sketch_histogram_quantiles"].fn(spark, SF).collect()
    }
    cents = sorted(
        int(r[0])
        for r in load_tables(spark, SF)["orders"]
        .selectExpr("CAST(o_totalprice * 100 AS BIGINT)")
        .collect()
    )
    n = len(cents)
    for pct, (lo, hi) in got.items():
        target = -(-pct * n // 100)  # ceil
        exact = cents[target - 1]
        assert lo <= exact < hi, (pct, lo, exact, hi)


def test_url_canonicalize_semantics(spark):
    """Canonical keys: lowercase scheme+host, :443 stripped, fragment
    gone, utm_* dropped, params sorted — and differently-messy
    spellings COLLAPSE (n_docs > 1 for shared keys)."""
    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries

    all_queries()
    rows = REGISTRY["text_url_canonicalize"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        u = r.canonical_url
        assert u.startswith("https://src")
        assert ".example.com/Path/" in u
        assert ":443" not in u and "#" not in u and "utm_" not in u
        assert u.endswith("?a=1&b=2")  # sorted surviving params
    assert any(r.n_docs > 1 for r in rows)


def test_cochran_q_reference(spark):
    """Cochran's Q against a pure-Python reimplementation; McNemar is
    its k=2 special case (same machinery family)."""
    import datetime

    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries
    from iceberg_metadata_pipeline_spark.session import load_tables

    all_queries()
    ev = load_tables(spark, SF)["events"].selectExpr(
        "user_id", "event_type", "CAST(ts AS DATE) AS d"
    ).collect()
    cuts = (datetime.date(1995, 1, 11), datetime.date(1995, 1, 21))
    bits = {}
    for r in ev:
        b = bits.setdefault(r.user_id, [0, 0, 0])
        if r.event_type == "click":
            j = 0 if r.d < cuts[0] else (1 if r.d < cuts[1] else 2)
            b[j] = 1
    cs = [sum(b[j] for b in bits.values()) for j in range(3)]
    sr = sum(sum(b) for b in bits.values())
    srr = sum(sum(b) ** 2 for b in bits.values())
    q = 2 * (3 * sum(c * c for c in cs) - sum(cs) ** 2) / (3 * sr - srr)
    got = REGISTRY["stat_cochran_q"].fn(spark, SF).collect()[0]
    assert (got.c1, got.c2, got.c3) == tuple(cs)
    assert got.cochran_q == pytest.approx(q, rel=1e-12)


def test_time_to_convert_reference(spark):
    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries
    from iceberg_metadata_pipeline_spark.session import load_tables

    all_queries()
    ev = load_tables(spark, SF)["events"].selectExpr(
        "user_id", "event_type", "CAST(ts AS TIMESTAMP) AS ts"
    ).collect()
    first = {}
    for r in ev:
        if r.event_type in ("view", "purchase"):
            k = (r.user_id, r.event_type)
            if k not in first or r.ts < first[k]:
                first[k] = r.ts
    lats = sorted(
        int((first[(u, "purchase")] - first[(u, "view")]).total_seconds() * 1e6)
        for u in {u for u, t in first if t == "view"}
        if (u, "purchase") in first
        and first[(u, "purchase")] >= first[(u, "view")]
    )
    n = len(lats)
    got = REGISTRY["events_time_to_convert"].fn(spark, SF).collect()[0]
    assert got.n_converted == n
    assert got.median_us == lats[(n + 1) // 2 - 1]
    assert got.p90_us == lats[-(-9 * n // 10) - 1]


def test_wilcoxon_signed_rank_reference(spark):
    from collections import Counter

    from iceberg_metadata_pipeline_spark.queries.stats_ext import (
        stat_wilcoxon_signed_rank,
    )
    from iceberg_metadata_pipeline_spark.session import load_tables

    ev = load_tables(spark, SF)["events"].selectExpr(
        "user_id", "event_type"
    ).collect()
    per = {}
    for r in ev:
        d = per.setdefault(r.user_id, [0, 0])
        if r.event_type == "view":
            d[0] += 1
        elif r.event_type == "click":
            d[1] += 1
    diffs = [v - c for v, c in per.values() if v != c]
    ads = sorted(abs(d) for d in diffs)
    cnt = Counter(ads)
    rank = {}
    below = 0
    for v in sorted(cnt):
        rank[v] = below + (cnt[v] + 1) / 2
        below += cnt[v]
    w_plus = sum(rank[abs(d)] for d in diffs if d > 0)
    n = len(diffs)
    ties = sum(c**3 - c for c in cnt.values())
    z = (w_plus - n * (n + 1) / 4) / (
        (n * (n + 1) * (2 * n + 1) / 24 - ties / 48) ** 0.5
    )
    got = stat_wilcoxon_signed_rank(spark, SF).collect()[0]
    assert got["n"] == n
    assert got["w_plus"] == pytest.approx(w_plus, rel=0)
    assert got["z"] == pytest.approx(z, rel=1e-12)


def test_auc_roc_matches_sklearn_style_reference(spark):
    """Exact AUC vs the probabilistic definition computed directly
    (P(score⁺ > score⁻) + ½P(=)) in pure Python."""
    from iceberg_metadata_pipeline_spark.queries.stats_ext import (
        ml_auc_roc_exact,
    )
    from iceberg_metadata_pipeline_spark.session import load_tables

    rows = load_tables(spark, SF)["events"].selectExpr(
        "CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS score",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label",
    ).collect()
    pos = sorted(r.score for r in rows if r.label == 1)
    neg = sorted(r.score for r in rows if r.label == 0)
    import bisect

    wins = ties = 0
    for p_ in pos:
        lo = bisect.bisect_left(neg, p_)
        hi = bisect.bisect_right(neg, p_)
        wins += lo
        ties += hi - lo
    auc = (wins + ties / 2) / (len(pos) * len(neg))
    got = ml_auc_roc_exact(spark, SF).collect()[0]
    assert (got.n_pos, got.n_neg) == (len(pos), len(neg))
    assert got.auc == pytest.approx(auc, rel=1e-12)


def test_bloom_membership_contract(spark):
    """Bloom contract: NO false negatives, exact FP accounting
    (n_maybe = n_members + n_false_positive when every member probes)."""
    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries

    all_queries()
    r = REGISTRY["sketch_bloom_membership"].fn(spark, SF).collect()[0]
    assert r.n_false_negative == 0
    assert r.n_probed == 2 * r.n_members  # members + shifted absents
    assert r.n_maybe == r.n_members + r.n_false_positive


def test_minhash_estimate_accuracy(spark):
    """With 64 permutations the estimator's standard error is
    sqrt(J(1-J)/64) <= 1/16; assert every pair within 4 sigma (0.25)
    and identical pairs estimate exactly 1."""
    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries

    all_queries()
    rows = REGISTRY["sim_minhash_jaccard_estimate"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert abs(r.est_jaccard - r.exact_jaccard) <= 0.25, r
        if r.exact_jaccard == 1.0:
            assert r.est_jaccard == 1.0


def test_simhash_portable_near_dups_have_low_hamming(spark):
    """Near-duplicate docs (high exact Jaccard per the minhash query)
    must sit at LOWER Hamming distance than unrelated pairs on
    average — the simhash locality property."""
    from iceberg_metadata_pipeline_spark.queries import REGISTRY, all_queries

    all_queries()
    ham = {
        (r.doc_a, r.doc_b): r.hamming
        for r in REGISTRY["dedup_simhash_portable"].fn(spark, SF).collect()
    }
    jac = {
        (r.doc_a, r.doc_b): r.exact_jaccard
        for r in REGISTRY["sim_minhash_jaccard_estimate"].fn(spark, SF).collect()
    }
    assert set(ham) == set(jac)
    near = [ham[k] for k, j in jac.items() if j >= 0.8]
    far = [ham[k] for k, j in jac.items() if j <= 0.2]
    if near and far:
        assert sum(near) / len(near) < sum(far) / len(far)
    # identical docs hash identically
    for k, j in jac.items():
        if j == 1.0:
            assert ham[k] == 0
