"""Weighted-SSSP and MAD-outlier tests: independent pure-Python
references (Dijkstra-style bounded relaxation; textbook MAD)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries.graph import (
    _SUPP_OFFSET,
    graph_sssp_weighted,
)
from iceberg_metadata_pipeline_spark.queries.quality_queries import (
    quality_mad_outliers,
)


def test_sssp_matches_bounded_bellman_ford(spark, sf_dir, tables):
    got = [(r.node, r.best_cost) for r in graph_sssp_weighted(spark, sf_dir).collect()]

    pairs = (
        tables["orders"]
        .join(tables["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.min(F.col("l_quantity").cast("long")).alias("w"))
        .collect()
    )
    adj = defaultdict(list)
    for r in pairs:
        c, s = r.o_custkey, r.l_suppkey + _SUPP_OFFSET
        adj[c].append((s, r.w))
        adj[s].append((c, r.w))
    seeds = [
        r.s_suppkey + _SUPP_OFFSET
        for r in tables["supplier"]
        .join(tables["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "ETHIOPIA")
        .collect()
    ]
    dist = {s: 0 for s in seeds}
    for _ in range(2):  # two relaxation rounds == walks of <= 2 edges
        nxt = dict(dist)
        for node, d in dist.items():
            for dst, w in adj[node]:
                if dst not in nxt or d + w < nxt[dst]:
                    nxt[dst] = d + w
        dist = nxt
    want = sorted(dist.items(), key=lambda kv: (kv[1], kv[0]))[:20]
    assert got == want


def test_mad_outliers_match_reference(spark, sf_dir, tables):
    got = {r.pri: r for r in quality_mad_outliers(spark, sf_dir).collect()}
    rows = tables["orders"].select("o_orderpriority", "o_totalprice").collect()
    by_pri = defaultdict(list)
    for r in rows:
        by_pri[r.o_orderpriority].append(float(r.o_totalprice))

    def disc_median(vals: list[float]) -> float:
        # PERCENTILE_DISC(0.5): smallest value with CDF >= 0.5
        s = sorted(vals)
        import math

        return s[math.ceil(0.5 * len(s)) - 1]

    assert set(got) == set(by_pri)
    for pri, vals in by_pri.items():
        med = disc_median(vals)
        devs = [abs(v - med) for v in vals]
        mad = disc_median(devs)
        n_out = sum(1 for d in devs if d > 3.0 * mad)
        g = got[pri]
        assert g.n == len(vals)
        assert g.med == med and g.mad == mad, (pri, g.med, med, g.mad, mad)
        assert g.n_outliers == n_out, (pri, g.n_outliers, n_out)
