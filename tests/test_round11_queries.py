"""Round-11 query additions: semantic pins beyond the oracle gate —
a pure-Python Holt-linear reference for the unrolled coupled-state
recurrence (the round's answer to the DuckDB list_reduce
struct-mutation bug that keeps fold-encoded 2-state recurrences
rows-only)."""

from __future__ import annotations

import os

import pytest

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _holt_reference(xs: list[float]) -> tuple[float, float]:
    """Textbook Holt linear (alpha=beta=1/2), l1=x1, b1=x2-x1."""
    level, trend = xs[0], xs[1] - xs[0]
    for x in xs[1:]:
        prev = level
        level = 0.5 * x + 0.5 * (level + trend)
        trend = 0.5 * (level - prev) + 0.5 * trend
    return level, trend


def test_holt_linear_matches_python_reference(spark):
    import iceberg_metadata_pipeline_spark.llmops.forecast  # noqa: F401
    from iceberg_metadata_pipeline_spark.queries import REGISTRY
    from iceberg_metadata_pipeline_spark.session import load_tables

    got = {
        r["event_type"]: r
        for r in REGISTRY["forecast_holt_linear_daily"]
        .fn(spark, SF)
        .collect()
    }
    events = load_tables(spark, SF)["events"]
    daily = (
        events.selectExpr("event_type", "CAST(ts AS DATE) AS d")
        .groupBy("event_type", "d")
        .count()
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["d"], float(r["count"])))
    assert got, "no event types produced"
    checked = 0
    for et, pairs in series.items():
        xs = [x for _, x in sorted(pairs)][:12]
        if len(xs) < 12:
            continue
        level, trend = _holt_reference(xs)
        row = got[et]
        assert row["level"] == pytest.approx(level, rel=1e-12)
        assert row["trend"] == pytest.approx(trend, rel=1e-12)
        assert row["forecast_next"] == pytest.approx(level + trend, rel=1e-12)
        checked += 1
    assert checked >= 3, f"only {checked} event types had a 12-day horizon"


def _events(spark):
    from iceberg_metadata_pipeline_spark.session import load_tables

    return load_tables(spark, SF)["events"].selectExpr(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS score",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label",
    ).collect()


def _run(spark, name):
    import iceberg_metadata_pipeline_spark.queries.stats_ext  # noqa: F401
    from iceberg_metadata_pipeline_spark.queries import REGISTRY

    return REGISTRY[name].fn(spark, SF).collect()


def test_pr_auc_matches_sklearn_style_reference(spark):
    rows = _events(spark)
    # textbook average precision: AP = sum over positives of
    # precision-at-their-threshold (score-descending, ties grouped)
    from collections import Counter

    by_score = Counter()
    pos_by_score = Counter()
    for r in rows:
        by_score[r["score"]] += 1
        pos_by_score[r["score"]] += r["label"]
    n_pos = sum(pos_by_score.values())
    tp = fp = 0
    ap = 0.0
    for s in sorted(by_score, reverse=True):
        tp += pos_by_score[s]
        fp += by_score[s] - pos_by_score[s]
        if pos_by_score[s]:
            ap += pos_by_score[s] * (tp / (tp + fp))
    ap /= n_pos
    (got,) = _run(spark, "ml_pr_auc_exact")
    assert got["n_pos"] == n_pos
    assert got["average_precision"] == pytest.approx(ap, rel=1e-12)


def test_mcc_matches_reference(spark):
    import math

    rows = _events(spark)
    tp = sum(1 for r in rows if r["score"] >= 35000000 and r["label"] == 1)
    fp = sum(1 for r in rows if r["score"] >= 35000000 and r["label"] == 0)
    fn = sum(1 for r in rows if r["score"] < 35000000 and r["label"] == 1)
    tn = sum(1 for r in rows if r["score"] < 35000000 and r["label"] == 0)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    (got,) = _run(spark, "ml_mcc_balanced_accuracy")
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (tp, fp, fn, tn)
    assert got["mcc"] == pytest.approx(mcc, rel=1e-12)
    assert got["balanced_accuracy"] == pytest.approx(
        0.5 * (tp / (tp + fn) + tn / (tn + fp)), rel=1e-12
    )


def test_ndcg_matches_reference(spark):
    import hashlib
    import math

    rows = _events(spark)
    rel = {"purchase": 2, "click": 1, "view": 1}
    per_user: dict = {}
    for r in rows:
        tb = hashlib.md5(str(r["event_id"]).encode()).hexdigest()
        per_user.setdefault(r["user_id"], []).append(
            (r["score"], tb, rel.get(r["event_type"], 0))
        )
    got = {r["user_id"]: r for r in _run(spark, "ml_ndcg_at_10")}
    checked = 0
    for uid, evs in per_user.items():
        ranked = sorted(evs, key=lambda e: (-e[0], e[1]))
        ideal = sorted(evs, key=lambda e: (-e[2], -e[0], e[1]))
        dcg = sum(
            e[2] / math.log2(i + 2) for i, e in enumerate(ranked[:10])
        )
        idcg = sum(
            e[2] / math.log2(i + 2) for i, e in enumerate(ideal[:10])
        )
        if idcg == 0:
            assert uid not in got
            continue
        assert got[uid]["ndcg"] == pytest.approx(dcg / idcg, rel=1e-12)
        checked += 1
    assert checked >= 5


def test_mrr_recall_matches_reference(spark):
    import hashlib

    rows = _events(spark)
    rel = {"purchase": 2, "click": 1, "view": 1}
    per_user: dict = {}
    for r in rows:
        tb = hashlib.md5(str(r["event_id"]).encode()).hexdigest()
        per_user.setdefault(r["user_id"], []).append(
            (r["score"], tb, rel.get(r["event_type"], 0))
        )
    got = {r["user_id"]: r for r in _run(spark, "ml_mrr_recall_at_10")}
    for uid, evs in per_user.items():
        ranked = sorted(evs, key=lambda e: (-e[0], e[1]))
        n_rel = sum(1 for e in evs if e[2] > 0)
        if n_rel == 0:
            assert uid not in got
            continue
        hits = [i + 1 for i, e in enumerate(ranked[:10]) if e[2] > 0]
        row = got[uid]
        assert row["first_hit_rank"] == (hits[0] if hits else None)
        assert row["rr_at_10"] == pytest.approx(
            1.0 / hits[0] if hits else 0.0, rel=1e-12
        )
        assert row["recall_at_10"] == pytest.approx(
            len(hits) / n_rel, rel=1e-12
        )


def test_markov_transitions_rows_sum_to_one(spark):
    rows = _run(spark, "events_markov_transitions")
    from collections import defaultdict

    by_prev = defaultdict(float)
    for r in rows:
        by_prev[r["prev_type"]] += r["p_transition"]
    assert by_prev and all(
        v == pytest.approx(1.0, rel=1e-9) for v in by_prev.values()
    )


def test_kfold_assignment_covers_all_docs(spark):
    from iceberg_metadata_pipeline_spark.session import load_tables

    rows = _run(spark, "pipeline_kfold_assignment")
    n_docs = load_tables(spark, SF)["documents"].count()
    assert sorted(r["fold"] for r in rows) == list(range(5))
    assert sum(r["n_docs"] for r in rows) == n_docs


def test_brier_matches_reference(spark):
    rows = _events(spark)
    hi = max(r["score"] for r in rows) + 1
    n = len(rows)
    brier = (
        sum((r["score"] / hi - r["label"]) ** 2 for r in rows) / n
    )
    (got,) = _run(spark, "ml_brier_score")
    assert got["n"] == n
    assert got["brier_score"] == pytest.approx(brier, rel=1e-9)


def test_log_loss_matches_reference(spark):
    import math

    rows = _events(spark)
    hi = max(r["score"] for r in rows) + 2
    n = len(rows)
    ll = (
        -sum(
            math.log((r["score"] + 1) / hi)
            if r["label"]
            else math.log(1 - (r["score"] + 1) / hi)
            for r in rows
        )
        / n
    )
    (got,) = _run(spark, "ml_log_loss")
    assert got["n"] == n
    assert got["log_loss"] == pytest.approx(ll, rel=1e-8)


def test_pareto_top20_matches_reference(spark):
    from iceberg_metadata_pipeline_spark.session import load_tables

    t = load_tables(spark, SF)
    spend = sorted(
        (
            r["c"]
            for r in t["orders"]
            .groupBy("o_custkey")
            .agg(
                {"o_totalprice": "sum"}
            )
            .selectExpr(
                "CAST(CAST(`sum(o_totalprice)` AS DECIMAL(18,2)) * 100"
                " AS BIGINT) AS c"
            )
            .collect()
        ),
        reverse=True,
    )
    # pin semantics with pure Python over exact cents
    import math

    n = len(spend)
    k_top = math.ceil(n / 5)
    share = sum(spend[:k_top]) / sum(spend)
    (got,) = _run(spark, "agg_pareto_top20_share")
    assert got["n"] == n and got["top_customers"] == k_top
    assert got["top20_revenue_share"] == pytest.approx(share, rel=1e-12)


def test_mann_kendall_matches_reference(spark):
    from iceberg_metadata_pipeline_spark.session import load_tables

    t = load_tables(spark, SF)
    rows = (
        t["orders"]
        .selectExpr(
            "datediff(o_orderdate, DATE '1990-01-01') AS dn",
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " AS cents",
        )
        .groupBy("dn")
        .agg({"cents": "sum"})
        .collect()
    )
    series = [v for _, v in sorted((r["dn"], r["sum(cents)"]) for r in rows)]
    import math

    n = len(series)
    s = sum(
        (series[j] > series[i]) - (series[j] < series[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = sum(
        m * (m - 1) * (2 * m + 5)
        for m in Counter(series).values()
        if m > 1
    )
    var = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
    z = (s - (1 if s > 0 else -1 if s < 0 else 0)) / math.sqrt(var)
    (got,) = _run(spark, "stat_mann_kendall_trend")
    assert got["n_days"] == n and got["s_stat"] == s
    assert got["mk_z"] == pytest.approx(z, abs=2e-9)
