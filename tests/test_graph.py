"""Graph operators, EWMA, and waterfill: kernel correctness on
handcrafted inputs (the oracle gate checks fixture-scale parity; these
pin the algorithms' semantics on graphs small enough to verify by hand
or against an exact pure-python reference)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries.graph import (
    _BASE,
    _DAMP_DEN,
    _DAMP_NUM,
    _MICRO,
    bfs_hops,
    pagerank_fixed_point,
    triangle_count,
)
from iceberg_metadata_pipeline_spark.queries.windows import ewma


def _undirected(spark, pairs):
    both = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, "src: long, dst: long")


def _pagerank_reference(pairs, iterations):
    """Exact integer fixed-point PageRank, dict-based."""
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    nodes = {s for s, _ in edges}
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: _MICRO for n in nodes}
    for _ in range(iterations):
        nxt = {n: _BASE for n in nodes}
        for s, d in edges:
            contrib = (rank[s] * _DAMP_NUM) // (_DAMP_DEN * deg[s])
            nxt[d] += contrib
        rank = nxt
    return rank


def test_pagerank_matches_exact_reference(spark):
    # star (0 center) + a 3-cycle hanging off node 3
    pairs = [(0, 1), (0, 2), (0, 3), (3, 4), (4, 5), (5, 3)]
    got = {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(_undirected(spark, pairs), 3).collect()
    }
    assert got == _pagerank_reference(pairs, 3)
    # hub out-ranks the leaves it feeds
    assert got[0] > got[1] == got[2]


def test_pagerank_is_deterministic_across_partitionings(spark):
    pairs = [(i, (i * 7 + 1) % 23) for i in range(23)]
    pairs = [(a, b) for a, b in pairs if a != b]
    a = pagerank_fixed_point(_undirected(spark, pairs), 3).collect()
    b = pagerank_fixed_point(_undirected(spark, pairs).repartition(7), 3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bfs_hops_path_graph(spark):
    edges = _undirected(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(1,)], "node: long")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, 3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is 4 hops away: not reached


def test_bfs_min_hop_wins_on_diamond(spark):
    # 1→2→4 and 1→3→4 plus a long way 1→5→6→4: node 4 is 2 hops
    edges = _undirected(spark, [(1, 2), (2, 4), (1, 3), (3, 4), (1, 5), (5, 6), (6, 4)])
    seeds = spark.createDataFrame([(1,)], "node: long")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, 3).collect()}
    assert got[4] == 2


def test_triangle_count_k4(spark):
    # K4 oriented a<b: C(4,3) = 4 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(k4, "p1: long, p2: long")
    assert triangle_count(edges).collect()[0]["n_triangles"] == 4


def test_triangle_count_no_triangles_on_star(spark):
    star = spark.createDataFrame([(0, i) for i in range(1, 6)], "p1: long, p2: long")
    assert triangle_count(star).collect()[0]["n_triangles"] == 0


def test_triangle_plan_has_no_nested_loop(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(k4, "p1: long, p2: long")
    plan = triangle_count(edges)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_ewma_generic_matches_recurrence(spark):
    rows = [(1, i, float(v)) for i, v in enumerate([10, 20, 5, 40, 15, 30])]
    df = spark.createDataFrame(rows, "k: long, t: long, x: double")
    out = (
        ewma(df, "k", ["t"], "x", alpha=0.3)
        .orderBy("t")
        .select("t", "ewma")
        .collect()
    )
    s = None
    for r in out:
        xv = [v for k, t, v in rows if t == r["t"]][0]
        s = xv if s is None else 0.3 * xv + 0.7 * s
        assert r["ewma"] == pytest.approx(s, abs=1e-9)


def test_ewma_horizon_bounds_lookback(spark):
    rows = [(1, i, 1.0) for i in range(40)]
    df = spark.createDataFrame(rows, "k: long, t: long, x: double")
    out = ewma(df, "k", ["t"], "x", alpha=0.5, horizon=16)
    assert out.count() == 16  # rows past the horizon are excluded by contract


def test_token_budget_waterfill_exact(spark):
    from iceberg_metadata_pipeline_spark.llmops.curation import token_budget_waterfill

    rows = [("a", 100), ("b", 10), ("c", 50)]
    df = spark.createDataFrame(rows, "domain: string, tok: long")
    # budget = 160 * 2 DIV 5 = 64; cap1 = 21 → alloc1 = [21, 10, 21] (Σ 52)
    # leftover 12 over demand [79, 0, 29] (Σ 108) → +[8, 0, 3]
    got = {
        r["domain"]: (r["alloc_equal_round"], r["alloc_final"])
        for r in token_budget_waterfill(df, "domain", "tok", 2, 5).collect()
    }
    assert got == {"a": (21, 29), "b": (10, 10), "c": (21, 24)}
    # never exceeds supply or budget
    assert sum(v[1] for v in got.values()) <= 64


def test_token_budget_waterfill_budget_exceeds_supply(spark):
    from iceberg_metadata_pipeline_spark.llmops.curation import token_budget_waterfill

    df = spark.createDataFrame([("a", 10), ("b", 20)], "domain: string, tok: long")
    got = {
        r["domain"]: r["alloc_final"]
        for r in token_budget_waterfill(df, "domain", "tok", 1, 1).collect()
    }
    assert got == {"a": 10, "b": 20}  # full supply allocated, nothing negative


# --- property-based checks (hypothesis) -------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tokens=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=12),
    num=st.integers(min_value=0, max_value=5),
    den=st.integers(min_value=1, max_value=5),
)
def test_waterfill_invariants(spark, tokens, num, den):
    """For ANY domain mix and budget fraction: allocations never exceed
    supply, never exceed the budget, are non-negative, and the final
    round never takes from a domain (monotone vs round 1)."""
    from iceberg_metadata_pipeline_spark.llmops.curation import token_budget_waterfill

    rows = [(f"d{i}", t) for i, t in enumerate(tokens)]
    df = spark.createDataFrame(rows, "domain: string, tok: long")
    got = token_budget_waterfill(df, "domain", "tok", num, den).collect()
    budget = (sum(tokens) * num) // den
    assert sum(r["alloc_final"] for r in got) <= budget
    by = {r["domain"]: r for r in got}
    for i, t in enumerate(tokens):
        r = by[f"d{i}"]
        assert 0 <= r["alloc_equal_round"] <= r["alloc_final"] <= t


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=15,
        unique=True,
    )
)
def test_pagerank_property_matches_reference(spark, edges):
    """Any random small graph: the distributed integer fixed-point agrees
    exactly with the dict-based reference (same recurrence, no float)."""
    got = {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(_undirected(spark, edges), 2).collect()
    }
    assert got == _pagerank_reference(edges, 2)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    n_colors=st.integers(1, 16),
    seed=st.integers(0, 10**6),
    interlaced=st.booleans(),
)
def test_gif_roundtrip_property(h, w, n_colors, seed, interlaced):
    """encode→decode is pixel-exact for any geometry/palette/interlace."""
    import numpy as np

    from iceberg_metadata_pipeline_spark.llmops.codecs import decode_gif, encode_gif

    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, size=(n_colors, 3), dtype=np.uint8)
    px = palette[rng.randint(0, n_colors, size=(h, w))]
    meta = decode_gif(encode_gif(px, interlaced=interlaced), with_pixels=True)
    assert np.array_equal(meta["pixels"], px)


def test_label_propagation_bounded_rounds(spark):
    from iceberg_metadata_pipeline_spark.queries.graph import label_propagation_min

    # path 1-2-3-4-5 (undirected): labels travel one hop per round —
    # round 1: [1,1,2,3,4]; round 2: [1,1,1,2,3] — bounded-round semantics
    edges = _undirected(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {r["node"]: r["lbl"] for r in label_propagation_min(edges, 2).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 3}
    # two more rounds finish the component
    got4 = {r["node"]: r["lbl"] for r in label_propagation_min(edges, 4).collect()}
    assert set(got4.values()) == {1}


def test_label_propagation_two_components(spark):
    from iceberg_metadata_pipeline_spark.queries.graph import label_propagation_min

    edges = _undirected(spark, [(1, 2), (2, 3), (10, 11)])
    got = {r["node"]: r["lbl"] for r in label_propagation_min(edges, 3).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
