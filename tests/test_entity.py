"""Entity-resolution tests (llmops/entity.py): the oracle gate proves
Spark↔DuckDB parity; these assert the *semantics* — the dirty feed's
ground truth is known by construction, so blocked matching must achieve
perfect recall and precision, and survivorship must pick field winners."""

from __future__ import annotations

from iceberg_metadata_pipeline_spark.llmops.entity import (
    er_blocked_best_match,
    er_survivorship_merge,
)


def test_blocked_match_perfect_recall_and_precision(spark, sf_dir, tables):
    rows = er_blocked_best_match(spark, sf_dir).collect()
    n_cust = tables["customer"].count()
    assert len(rows) == n_cust, "every dirty record must find its match"
    for r in rows:
        assert r.matched_custkey == r.dirty_id, (r.dirty_id, r.matched_custkey)
        # manglings: %3==1/2 are case/space-only (dist 0), %3==0 rewrites
        # the 9-char prefix (dist 5)
        assert r.edit_dist == (5 if r.dirty_id % 3 == 0 else 0), r


def test_survivorship_takes_field_winners(spark, sf_dir, tables):
    got = {r.entity_id: r for r in er_survivorship_merge(spark, sf_dir).collect()}
    src = {r.c_custkey: r for r in tables["customer"].collect()}
    assert set(got) == set(src)
    for k, r in got.items():
        jitter = ((k % 7) - 3) / 100.0
        want_best = max(float(src[k].c_acctbal), float(src[k].c_acctbal) + jitter)
        assert abs(r.best_bal - want_best) < 1e-9, (k, r.best_bal, want_best)
        assert r.n_sources == 2
        assert r.match_kind == ("fuzzy" if k % 3 == 0 else "exact")
        assert r.c_mktsegment == src[k].c_mktsegment
