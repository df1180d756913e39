"""Directional scale check (r4 VERDICT #10): synthesize an sf1-sized
fixture (10x sf0.1) under /tmp and measure how the heaviest headline
queries scale, recording per-query scaling exponents for SCALE.md.

exponent = log(t_sf1 / t_sf01) / log(10) — ~1.0 means linear in data
size, >1.5 flags an accidental quadratic the sf0.1 bench can't see.
(Wall-clock on local[32] under-reports small-SF times because of fixed
job overhead, so exponents here are an UPPER-bound sanity signal, not a
precise fit.)

Synthesis: each table is replicated 10x with key shifts that preserve
join relationships (orderkey shifts applied to both orders and
lineitem); document text gets a per-replica token suffix so replicas are
NOT near-duplicates of each other (otherwise minhash pair counts would
grow quadratically by construction and misattribute the blowup to the
operator). Run:

    python tools/scale_check.py            # generate (if absent) + measure
    python tools/scale_check.py --force    # regenerate fixture
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1"
REPLICAS = 10

QUERIES = [
    "tpch_q1_pricing_summary",
    "dedup_minhash_lsh",
    "dedup_survivors",
    "dedup_substring_spans",
    "graph_pagerank_interactions",
    "graph_cc_label_propagation",
    "matview_incremental_refresh",
    "window_topk_per_group",
    "join_asof_events",
    "agg_rollup",
    "text_quality_signals",
    "sim_cosine_topk_pq",
    # r6 additions: corpus-wide line-hash dedup, salted join, BM25
    "text_boilerplate_line_dedup",
    "join_skew_salted",
    "text_bm25_rank",
    # r6 continuation: grid spatial join, blocked ER, basket mining,
    # weighted SSSP, semantic dedup
    "geo_grid_radius_join",
    "er_blocked_best_match",
    "mining_basket_pair_rules",
    "graph_sssp_weighted",
    "dedup_semantic_semdedup",
    # r7: scale-aware blocking key (suffix grows with n) vs the fixed key
    "er_blocked_best_match_scaled",
    "stat_ks_two_sample",
    "stat_mann_whitney_u",
    "stat_spearman_corr",
    "stat_gini_customer_spend",
    # r8: distributed MOR write path (bulk insert + key-index-join
    # upsert + delete + one-task-per-group compact + cluster) and the
    # collapse-then-pair statistics
    "catalog_hudi_mor_write_dist",
    "stat_kendall_tau_b",
    "stat_kaplan_meier_churn",
    # r9: collapse-then-pair JW join, wedge-join link prediction,
    # binned interval-overlap join, count-min cells, id-mode round-trip
    "join_fuzzy_jaro_winkler",
    "graph_link_prediction_jaccard",
    "join_interval_overlap_binned",
    "sketch_countmin_heavy_hitters",
    "catalog_delta_idmode_roundtrip",
    # r10: salted basket pairs (+ lift), k-group rank stat over the
    # bucketed prefix, exact trimmed means, bounded heaps-law window
    "mining_basket_lift",
    "stat_kruskal_wallis",
    "agg_trimmed_winsorized_mean",
    "text_heaps_law_fit",
    # r12 continuation: user-partitioned AP@10 windows, distinct-cents
    # prefix median, pair-partitioned JT prefix, one-agg ECE
    "ml_map_at_10",
    "stat_moods_median",
    "stat_jonckheere_terpstra",
    "ml_expected_calibration_error",
]


def generate(spark) -> None:
    from pyspark.sql import functions as F

    from iceberg_metadata_pipeline_spark.session import load_tables

    os.makedirs(DST, exist_ok=True)
    t = load_tables(spark, SRC)
    reps = spark.range(REPLICAS).select(F.col("id").alias("__r"))

    def replicate(df, shifts: dict[str, str], text_tag: str | None = None):
        """Cross-join with the replica spine; shift key columns by
        __r * (max+1) so keys stay unique and joins stay consistent."""
        out = df.crossJoin(F.broadcast(reps))
        for col, maxexpr in shifts.items():
            out = out.withColumn(col, F.col(col) + F.col("__r") * F.lit(maxexpr))
        if text_tag:
            # suffix every token with the replica id: replicas share no
            # 3-shingles, so near-dup structure matches the base corpus
            out = out.withColumn(
                text_tag,
                F.array_join(
                    F.transform(
                        F.split(F.col(text_tag), " "),
                        lambda x: F.concat(x, F.lit("_"), F.col("__r").cast("string")),
                    ),
                    " ",
                ),
            )
        return out.drop("__r")

    def maxv(df, col):
        return df.agg(F.max(col)).collect()[0][0] + 1

    lo = maxv(t["orders"], "o_orderkey")
    ck = maxv(t["customer"], "c_custkey")
    dk = maxv(t["documents"], "doc_id")
    ek = maxv(t["events"], "event_id")

    plans = {
        "lineitem": replicate(t["lineitem"], {"l_orderkey": lo}),
        "orders": replicate(t["orders"], {"o_orderkey": lo, "o_custkey": ck}),
        # c_name is rebuilt from the SHIFTED key: a real 10x customer
        # table has 10x distinct names, not every name duplicated 10x —
        # duplicated names would grow every name-blocked ER block 10x by
        # construction and misattribute the blowup to the operator (the
        # same reasoning as the documents text tag below)
        "customer": replicate(t["customer"], {"c_custkey": ck}).withColumn(
            "c_name", F.format_string("Customer#%09d", F.col("c_custkey"))
        ),
        "documents": replicate(t["documents"], {"doc_id": dk}, text_tag="text"),
        "embeddings": replicate(
            t["embeddings"],
            {"vec_id": maxv(t["embeddings"], "vec_id")},
        ),
        "events": replicate(t["events"], {"event_id": ek}),
        # dimensions stay as-is (they are dimensions; 100 TB doesn't 10x
        # the nation table either)
        "part": t["part"],
        "supplier": t["supplier"],
        "nation": t["nation"],
        "region": t["region"],
    }
    for name, df in plans.items():
        path = os.path.join(DST, f"{name}.parquet")
        if os.path.exists(path):
            continue
        df.write.mode("overwrite").parquet(path)
        print(f"  wrote {name}: {spark.read.parquet(path).count()} rows")


def measure(spark, only: list[str] | None = None) -> dict:
    from iceberg_metadata_pipeline_spark.queries import all_queries

    qs = all_queries()
    out = {}
    for name in only or QUERIES:
        if name not in qs:
            print(f"  !! {name} not in registry, skipping")
            continue
        times = {}
        for sf, d in (("sf0.1", SRC), ("sf1", DST)):
            t0 = time.time()
            qs[name](spark, d).collect()
            times[sf] = time.time() - t0
        exp = math.log(times["sf1"] / times["sf0.1"]) / math.log(REPLICAS)
        out[name] = {
            "sf0.1_s": round(times["sf0.1"], 2),
            "sf1_s": round(times["sf1"], 2),
            "exponent": round(exp, 2),
        }
        print(f"  {name}: {times['sf0.1']:.2f}s -> {times['sf1']:.2f}s  exp={exp:.2f}")
    return out


def measure_mor_write_path(spark) -> dict:
    """Bespoke probe for the distributed MOR write verbs: the registry
    query (catalog_hudi_mor_write_dist) runs on `part`, which the sf1
    fixture deliberately does NOT replicate (it is a dimension), so its
    registry exponent is warmup noise. This probe drives bulk insert /
    10% upsert / 5% delete / compact over the REPLICATED orders table
    at both SFs — the real scaling signal for one-task-per-file-group
    writes."""
    import tempfile

    from pyspark.sql import functions as F

    from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
        bulk_insert_mor,
        compact_mor,
        create_mor_table,
        delete_mor,
        upsert_mor,
    )

    times = {}
    for sf, d in (("sf0.1", SRC), ("sf1", DST)):
        orders = spark.read.parquet(os.path.join(d, "orders.parquet")).select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        loc = tempfile.mkdtemp(prefix=f"mor-scale-{sf}-") + "/t"
        create_mor_table(loc, "t", [], "o_orderkey", orders.schema)
        t0 = time.time()
        bulk_insert_mor(loc, orders, n_file_groups=16)
        upsert_mor(
            loc,
            orders.where("o_orderkey % 10 = 0").withColumn(
                "o_totalprice", F.col("o_totalprice") * 2
            ),
        )
        delete_mor(loc, orders.where("o_orderkey % 20 = 1").select("o_orderkey"))
        compact_mor(loc, spark=spark)
        times[sf] = time.time() - t0
    exp = math.log(times["sf1"] / times["sf0.1"]) / math.log(REPLICAS)
    res = {
        "sf0.1_s": round(times["sf0.1"], 2),
        "sf1_s": round(times["sf1"], 2),
        "exponent": round(exp, 2),
    }
    print(
        f"  mor_write_path_probe: {times['sf0.1']:.2f}s -> "
        f"{times['sf1']:.2f}s  exp={exp:.2f}"
    )
    return res


def measure_mor_targeted_upsert(spark) -> dict:
    """Round-9 probe for the bloom-pruned key routing (the r8 `weak`):
    file-group count scales WITH the data (constant file size, the
    100 TB shape), and the timed operation is a 10-key upsert against
    the pre-built table. Unpruned routing reads every base file's key
    column per commit — O(table); bloom-pruned routing reads only the
    ≤10 candidate files the blooms admit — O(batch). The exponent of
    the pruned leg should sit near 0, and the probe also reports the
    unpruned leg at sf1 for the direct same-table comparison."""
    import tempfile

    from pyspark.sql import functions as F

    from iceberg_metadata_pipeline_spark.catalog.hudi_mor_dist import (
        bulk_insert_mor_df,
        upsert_mor_df,
    )
    from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
        create_mor_table,
    )

    res: dict = {}
    times = {}
    for sf, d, groups in (("sf0.1", SRC, 16), ("sf1", DST, 160)):
        orders = spark.read.parquet(os.path.join(d, "orders.parquet")).select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        loc = tempfile.mkdtemp(prefix=f"mor-tgt-{sf}-") + "/t"
        create_mor_table(loc, "t", [], "o_orderkey", orders.schema)
        bulk_insert_mor_df(orders, loc, n_file_groups=groups)
        batch = orders.orderBy("o_orderkey").limit(10).withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        ).cache()
        batch.count()
        t0 = time.time()
        upsert_mor_df(batch, loc)
        times[sf] = time.time() - t0
        if sf == "sf1":
            t0 = time.time()
            upsert_mor_df(batch, loc, prune=False)
            res["sf1_unpruned_s"] = round(time.time() - t0, 2)
        batch.unpersist()
    exp = math.log(times["sf1"] / times["sf0.1"]) / math.log(REPLICAS)
    res.update(
        {
            "sf0.1_s": round(times["sf0.1"], 2),
            "sf1_s": round(times["sf1"], 2),
            "exponent": round(exp, 2),
        }
    )
    print(
        f"  mor_targeted_upsert_probe: {times['sf0.1']:.2f}s -> "
        f"{times['sf1']:.2f}s  exp={exp:.2f}  "
        f"(sf1 unpruned: {res['sf1_unpruned_s']}s)"
    )
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--only", nargs="*", help="measure only these queries")
    args = ap.parse_args()
    from iceberg_metadata_pipeline_spark.session import get_spark

    spark = get_spark("scale-check")
    if args.force and os.path.exists(DST):
        import shutil

        shutil.rmtree(DST)
    print("generating sf1 fixture (10x sf0.1) ...")
    generate(spark)
    print("measuring ...")
    results = measure(spark, args.only)
    if not args.only:
        results["mor_write_path_probe"] = measure_mor_write_path(spark)
        results["mor_targeted_upsert_probe"] = measure_mor_targeted_upsert(spark)
    with open("/tmp/scale_check.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
