"""Round-9 query additions: fuzzy-string kernels pinned against DuckDB,
count-min guarantee, link-prediction semantics, RFM determinism."""

from __future__ import annotations

import os
import random

import duckdb
import pytest

from iceberg_metadata_pipeline_spark.queries.extras import (
    _damerau_levenshtein_kernel,
)
from iceberg_metadata_pipeline_spark.queries.joins import _jaro_winkler_kernel

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _rand_pairs(n, alpha, lo, hi, seed):
    rng = random.Random(seed)
    for _ in range(n):
        yield (
            "".join(rng.choices(alpha, k=rng.randint(lo, hi))),
            "".join(rng.choices(alpha, k=rng.randint(lo, hi))),
        )


def test_jaro_winkler_kernel_matches_duckdb_bitwise():
    con = duckdb.connect()
    for a, b in _rand_pairs(1500, "abcdefg", 1, 14, seed=7):
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert _jaro_winkler_kernel(a, b) == want, (a, b)


def test_jaro_winkler_kernel_empty_convention():
    # DuckDB returns 0.0 for ''-vs-'' (not 1.0); the kernel replicates it
    assert _jaro_winkler_kernel("", "") == 0.0
    assert _jaro_winkler_kernel("", "abc") == 0.0
    assert _jaro_winkler_kernel("abc", "abc") == 1.0


def test_damerau_levenshtein_kernel_is_true_dl_not_osa():
    # the canonical case separating true DL from optimal string alignment:
    # 'ca' -> 'abc' is 2 under unrestricted DL, 3 under OSA
    assert _damerau_levenshtein_kernel("ca", "abc") == 2
    con = duckdb.connect()
    for a, b in _rand_pairs(800, "abcd", 0, 9, seed=11):
        want = con.execute(
            "select damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert _damerau_levenshtein_kernel(a, b) == want, (a, b)


def test_damerau_transposition_cheaper_than_levenshtein():
    # adjacent swap: DL 1, levenshtein 2
    assert _damerau_levenshtein_kernel("abcd", "abdc") == 1


@pytest.fixture(scope="module")
def qreg():
    from iceberg_metadata_pipeline_spark.queries import all_queries

    return all_queries()


def test_countmin_guarantee_and_topk(spark, qreg):
    rows = qreg["sketch_countmin_heavy_hitters"](spark, SF).collect()
    assert len(rows) == 10
    assert all(r["cms_ok"] == 1 for r in rows)
    # exact counts are descending with user_id tiebreak
    keys = [(-r["exact_n"], r["user_id"]) for r in rows]
    assert keys == sorted(keys)


def test_link_prediction_excludes_existing_edges(spark, qreg):
    from iceberg_metadata_pipeline_spark.queries.graph import copurchase_edges

    preds = qreg["graph_link_prediction_jaccard"](spark, SF).collect()
    assert 0 < len(preds) <= 20
    edges = {
        (r["p1"], r["p2"])
        for r in copurchase_edges(spark, SF, min_weight=2).collect()
    }
    for r in preds:
        assert (r["u"], r["v"]) not in edges
        assert r["u"] < r["v"]
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["common"] >= 1


def test_rfm_grid_bounds(spark, qreg):
    rows = qreg["events_rfm_segmentation"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_q"] <= 5 and 1 <= r["f_q"] <= 5 and 1 <= r["m_q"] <= 5
        assert r["n_users"] >= 1


def test_assortativity_is_negative_bipartite_hub(spark, qreg):
    row = qreg["graph_degree_assortativity"](spark, SF).collect()[0]
    # bipartite hub-and-spoke: high-degree suppliers link to low-degree
    # customers -> strongly disassortative
    assert row["assortativity"] < 0
    assert row["n_edges"] > 0


def test_interval_overlap_binned_plan_is_equijoin(spark, qreg):
    df = qreg["join_interval_overlap_binned"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan  # binned -> equi-join
    assert "CartesianProduct" not in plan


def test_psi_drift_bounds(spark, qreg):
    row = qreg["quality_psi_drift"](spark, SF).collect()[0]
    assert row["psi"] >= 0.0  # PSI is nonnegative by Gibbs' inequality
    assert 1 <= row["n_bins_used"] <= 10


def test_zipf_slope_is_negative(spark, qreg):
    row = qreg["text_zipf_fit"](spark, SF).collect()[0]
    assert row["zipf_slope"] < 0
    assert row["n_terms"] > 0


def test_jaro_winkler_single_char_clamp():
    # review finding: match window max//2-1 is negative for len-1
    # strings; unclamped, 'a' vs 'a' scored 0.0 where DuckDB says 1.0
    import duckdb

    con = duckdb.connect()
    for a, b in [("a", "a"), ("a", "b"), ("ab", "a"), ("a", "ab")]:
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert _jaro_winkler_kernel(a, b) == want, (a, b)
