"""Benchmark harness — the driver runs this per-round and records BENCH_r{N}.json.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], forcing full materialization via the noop sink
(so column evaluation isn't short-circuited), and prints ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_customer",
    "tpch_q21_waiting_supplier",
    "join_sort_merge_bigbig",
    "join_asof_events",
    "agg_rollup",
    "agg_count_distinct",
    "agg_median_percentiles",
    # round-1 harness-red queries, fixed in round 2 — kept visible here
    "agg_array_collect_sorted",
    "agg_percentile_approx",
    "join_null_safe_equality",
    "window_topk_per_group",
    "fn_string_family",
    "stream_session_window",
    "ingest_register_scan",
    # Tier-C LLM-data operators
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "text_quality_signals",
    "sim_cosine_topk_bruteforce",
    "sim_cosine_topk_lsh_checked",
    # round-2 additions: MOR row ops, maintenance, pipeline shapes
    "table_update_mor",
    "table_binpack_compaction",
    "text_document_chunking",
    "text_bigram_lm_score",
    "embed_quantize_int8",
    # round-3 additions: heavyweight catalog/pipeline families (VERDICT r2 #8)
    "catalog_hidden_partitioning",
    "table_changelog_scan",
    "table_wap_publish",
    "pipeline_pretrain_prep",
    "pipeline_incremental_dedup_index",
    "matview_incremental_refresh",
    "sim_cosine_topk_pq_checked",
    "multimodal_decode_real",
    # round-3 session-2 additions: sketches, substring dedup, fuzzy join,
    # gap-fill resample, header probing
    "sketch_hll_shard_merge",
    "dedup_substring_spans",
    "join_fuzzy_levenshtein",
    "events_gap_fill_resample",
    "multimodal_probe_headers",
    # round-4 additions: graph operators, Arrow-native UDFs, exact EWMA,
    # budget waterfilling
    "graph_pagerank_interactions",
    "graph_triangle_count",
    "graph_bfs_reachability",
    "graph_cc_label_propagation",
    "window_ewma_halflife",
    "udf_map_in_arrow",
    "sample_token_budget_waterfill",
    # round-5 additions: real Iceberg-format round-trip, avro source,
    # Holt-Winters fit, baseline JPEG decode
    "catalog_iceberg_export_import",
    "source_avro_roundtrip",
    "forecast_holt_winters_seasonal",
    "multimodal_jpeg_decode",
    # round-5 additions: recursive CTE (iterated-union execution), the
    # pyavro Python DataSource, UDTF with TABLE(...) PARTITION BY input
    "sql_recursive_hierarchy_rollup",
    "source_pyavro_datasource",
    "udtf_table_partition_by",
    # round-6 additions: Delta-log round-trip, salted skew join, CCNet
    # boilerplate line dedup, BM25 ranking, the pyice/pydelta
    # DataSources, and the Iceberg->Delta format bridge
    "catalog_delta_export_import",
    "join_skew_salted",
    "text_boilerplate_line_dedup",
    "text_bm25_rank",
    "source_pyice_datasource",
    "source_pydelta_datasource",
    "catalog_format_bridge",
    # round-6 continuation: Hudi round-trip, Delta CDF, grid spatial join,
    # blocked entity resolution, basket mining, Markov transitions
    "catalog_hudi_export_import",
    "catalog_delta_cdf",
    "geo_grid_radius_join",
    "geo_geohash_cell_agg",
    "er_blocked_best_match",
    "mining_basket_pair_rules",
    "mining_markov_transitions",
    "source_pyhudi_datasource",
    "catalog_iceberg_v3_row_lineage",
    "catalog_delta_column_mapping",
    "ml_ols_normal_equations",
    "stat_chi_square_independence",
    "events_time_weighted_avg",
    # round-7: Hudi MOR read, Delta file DVs, bucketed exact KS,
    # scale-aware ER blocking
    "catalog_hudi_mor_read",
    "catalog_delta_file_dv",
    "stat_ks_two_sample",
    "er_blocked_best_match_scaled",
    # round-7 continuation: OPTIMIZE e2e, rank statistics, WebDataset
    "catalog_delta_optimize",
    "stat_mann_whitney_u",
    "stat_gini_customer_spend",
    "source_webdataset_tar",
    # round-8: distributed MOR write path, cells-collapsed pair stats
    "catalog_hudi_mor_write_dist",
    "stat_kendall_tau_b",
    # round-9: id-mode Delta round-trip, blocked Jaro-Winkler join,
    # wedge-join link prediction, from-scratch count-min
    "catalog_delta_idmode_roundtrip",
    "join_fuzzy_jaro_winkler",
    "graph_link_prediction_jaccard",
    "sketch_countmin_heavy_hitters",
    # round-10 promotions (r9 verdict #7): heaps fit with the bounded
    # rank window, Brown-Forsythe over the sorted-fold moments pass
    "text_heaps_law_fit",
    "stat_brown_forsythe",
    # round-10 second wave: k-group midranks over the bucketed prefix,
    # triangle-salted lift, cell-grained quantile sketch, exact AUC
    "stat_kruskal_wallis",
    "mining_basket_lift",
    "sketch_histogram_quantiles",
    "ml_auc_roc_exact",
    # round-11 promotions to reach 100 headliners (r10 VERDICT #7):
    # the oracle-backed sequential folds — EWMA (single-state
    # list_reduce twin) and the unrolled coupled-state Holt chain
    "forecast_ewma_daily",
    "forecast_holt_linear_daily",
    # round-12 promotions (r11 VERDICT #7): the thin-engine plan-verb
    # scan (now paged + residual-applying) and exact PR-AUC over the
    # bucketed two-phase prefix
    "source_pyrest_plan_scan",
    "ml_pr_auc_exact",
    # round-12 continuation: retrieval-trio completion (integer AP@10),
    # the pair-partitioned prefix JT shape, RANGE-interval exact median
    "ml_map_at_10",
    "stat_jonckheere_terpstra",
    "window_rolling_median_30d",
]


def _sentinel_seconds(spark) -> float:
    """A fixed pure-JVM workload (range → hash-agg, whole-stage codegen,
    no IO, no Python) timed median-of-3. Its runtime tracks HOST noise
    only — the repo's code never touches it — so round-over-round bench
    drift can be normalized: ratio = total/sentinel cancels uniform
    slowdowns from noisy neighbors (NOTES_r6 measured 1.4x swings)."""
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(100_000_000).selectExpr(
            "sum(id * 2654435761 % 1000003) AS h",
            "count(distinct id % 4096) AS d",
        ).collect()
        runs.append(time.perf_counter() - t0)
    return round(sorted(runs)[1], 3)


def _measure(
    spark, qs, names, sf_dir, first_run: dict[str, float] | None = None
) -> dict[str, float]:
    """Median-of-3 noop-sink timings. ``first_run`` (r12 verdict #2,
    additions-only): queries that cache an intermediate leave the cache
    in the session, so reps 2-3 re-run warm and the median reports the
    steady-state time; rep 1 is the COLD path (cache built from parquet
    in-run). Both numbers are recorded — the median keeps the committed
    cross-round comparison methodology, first_run_sec is the honest
    cold-start quote for cache-carrying queries."""
    timings: dict[str, float] = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            continue
        runs = []
        for _ in range(3):  # median-of-3: ambient-load noise, not cache
            t0 = time.perf_counter()  # warmth, dominates variance at this
            df = fn(spark, sf_dir)  # scale — the median ignores one outlier
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 3)
        if first_run is not None:
            first_run[name] = round(runs[0], 3)
    return timings


def _warmup(spark, sf_dir):
    # session warmup: JVM/codegen spin-up and Hadoop-FS/parquet-footer init
    # outside the measured window (queries are measured, not cold-start)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from iceberg_metadata_pipeline_spark.session import load_tables

    tables = load_tables(spark, sf_dir)
    tables["region"].count()
    tables["lineitem"].count()  # biggest table: pays listing + footer reads


def _isolate(names: list[str]) -> None:
    """``bench.py --isolate q1,q2``: re-run the named queries alone
    (fresh session, warmup, sentinel) and merge the timings into
    BENCH_LOCAL.json under "isolated" — the differential probe the r8
    verdict hand-built, now self-serve. Cross-round regressions flagged
    by the main run can be re-adjudicated without a full bench."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from iceberg_metadata_pipeline_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("bench-isolate")
    qs = entry_mod.queries()
    _warmup(spark, sf_dir)
    sentinel = _sentinel_seconds(spark)
    first_run: dict[str, float] = {}
    timings = _measure(spark, qs, names, sf_dir, first_run=first_run)
    local = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    payload = {}
    if os.path.exists(local):
        try:
            with open(local) as fh:
                payload = json.load(fh)
        except (OSError, json.JSONDecodeError):
            payload = {}
    payload.setdefault("isolated", {}).update(timings)
    payload.setdefault("isolated_first_run", {}).update(first_run)
    payload["isolated_sentinel_sec"] = sentinel
    with open(local, "w") as fh:
        json.dump(payload, fh)
        fh.write("\n")
    print(json.dumps(
        {"metric": "isolated_queries", "queries": timings,
         "sentinel_sec": sentinel},
        separators=(",", ":"),
    ))


def _cross_round(timings: dict, sentinel: float, local_path: str) -> dict | None:
    """Compare this run against the PREVIOUS round's committed
    BENCH_LOCAL.json. Host drift is normalized by the SUITE'S OWN
    MEDIAN per-query ratio, not the sentinel: the r9 verdict showed the
    half-second sentinel is noisier than the signal it corrects (a
    0.78s→0.49s sentinel swing while raw times held flagged 55/92
    queries). The median ratio over 90+ queries is a far lower-variance
    drift estimate, and a genuinely regressed query cannot hide in it
    (one query barely moves the median). Only per-query ratios outside
    band × the median drift flag."""
    if not os.path.exists(local_path):
        return None
    try:
        with open(local_path) as fh:
            prev = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None
    prev_q = prev.get("queries") or {}
    if not prev_q:
        return None
    ratios = {
        name: cur / prev_q[name]
        for name, cur in timings.items()
        if prev_q.get(name) and prev_q[name] > 0 and cur > 0
    }
    if len(ratios) < 5:
        return None  # too few shared queries for a stable median drift
    ordered = sorted(ratios.values())
    drift = ordered[len(ordered) // 2]
    band = 1.5
    flagged = {}
    for name, r in ratios.items():
        rel = round(r / drift, 2)
        if rel > band or rel < 1 / band:
            flagged[name] = {
                "prev_s": prev_q[name],
                "cur_s": timings[name],
                "norm_ratio": rel,
            }
    return {
        "prev_sentinel_sec": prev.get("sentinel_sec"),
        "median_drift": round(drift, 3),
        "band": band,
        "flagged": flagged,
        "n_compared": len(ratios),
    }


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--isolate":
        _isolate([q.strip() for q in sys.argv[2].split(",") if q.strip()])
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from iceberg_metadata_pipeline_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("bench")
    qs = entry_mod.queries()

    _warmup(spark, sf_dir)

    load_before = os.getloadavg()
    sentinel = _sentinel_seconds(spark)

    first_run: dict[str, float] = {}
    timings = _measure(spark, qs, HEADLINE, sf_dir, first_run=first_run)

    total = round(sum(timings.values()), 3)
    local_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    cross = _cross_round(timings, sentinel, local_path)
    if cross and cross["flagged"]:
        # SELF-ADJUDICATING record (r10 VERDICT #6): re-measure the
        # slow-side flags in-session, alone, right after the suite —
        # on a contended host the suite's multi-job queries amplify
        # ambient load; a sequential re-run is the same differential
        # probe the --isolate verb offers, run automatically so the
        # driver's record carries its own adjudication. Fast-side
        # flags (norm_ratio < 1) are improvements and need none.
        slow = sorted(
            n for n, f in cross["flagged"].items() if f["norm_ratio"] > 1
        )[:20]
        if slow:
            iso = _measure(spark, qs, slow, sf_dir)
            cross["isolated_sentinel_sec"] = _sentinel_seconds(spark)
            for name, t in iso.items():
                f = cross["flagged"][name]
                f["isolated_s"] = t
                f["isolated_norm_ratio"] = round(
                    (t / f["prev_s"]) / cross["median_drift"], 2
                )
                f["adjudication"] = (
                    "regression"
                    if f["isolated_norm_ratio"] > cross["band"]
                    else "noise"
                )
    payload = json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "value": total,
            "unit": "sec",
            "queries": timings,
            # cold-path truth per query (r12 verdict #2, additions-only):
            # rep 1 of the median-of-3 — for queries that cache an
            # intermediate the median is steady-state-warm, this is not
            "first_run_sec": first_run,
            "sf": sf,
            # host-noise context (VERDICT r6 #8): loadavg around the run
            # and a fixed pure-JVM sentinel; compare totals ACROSS rounds
            # via total/sentinel_sec to cancel uniform host slowdowns
            "host_load": {
                "before": [round(x, 2) for x in load_before],
                "after": [round(x, 2) for x in os.getloadavg()],
            },
            "sentinel_sec": sentinel,
            "total_over_sentinel": round(total / sentinel, 2) if sentinel else None,
            # sentinel-normalized comparison against the previous round's
            # committed BENCH_LOCAL.json (VERDICT r8 #5): only moves
            # beyond the band flag — host drift never reads as regression
            "cross_round": cross,
        }
    )
    # the driver tail-captures only the LAST ~2000 chars of stdout, so a
    # full 80+-query JSON line always truncates (BENCH_r05/r07 "parsed":
    # null). Persist the complete payload to BENCH_LOCAL.json, then print
    # a final line GUARANTEED to fit the capture window: totals + sentinel
    # + the slowest queries, trimmed until the serialized line is under
    # budget — the driver gets a parseable object every round.
    with open(local_path, "w") as fh:
        fh.write(payload + "\n")

    budget = 1800  # under the driver's 2000-char tail, with margin
    by_cost = sorted(timings.items(), key=lambda kv: -kv[1])
    k = len(by_cost)
    while k > 0:
        compact = json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": dict(sorted(by_cost[:k])),
                "n_queries": len(timings),
                "queries_shown": k,
                "sf": sf,
                "sentinel_sec": sentinel,
                "total_over_sentinel": (
                    round(total / sentinel, 2) if sentinel else None
                ),
                "cross_round_flagged": (
                    sorted(cross["flagged"]) if cross else None
                ),
                "cross_round_adjudicated": (
                    {
                        v: sum(
                            1
                            for f in cross["flagged"].values()
                            if f.get("adjudication") == v
                        )
                        for v in ("noise", "regression")
                    }
                    if cross and cross["flagged"]
                    else None
                ),
                "full": "BENCH_LOCAL.json",
            },
            separators=(",", ":"),
        )
        if len(compact) <= budget:
            break
        k -= max(1, k // 8)
    print(compact)


if __name__ == "__main__":
    main()
