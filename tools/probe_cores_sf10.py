"""Parallel-scaling probe, second tier (r12 VERDICT #5).

The sf1 fixture measured 8-core ≈ 32-core on every query — DIAGNOSED,
not accepted: /tmp/sf1's lineitem is 44 MB in ONE parquet file, so under
the reference's scan/shuffle granularity (64 MB maxPartitionBytes, 64 MB
AQE advisory) EVERY run collapses to 1–5 tasks and core count cannot
matter. That is the conf behaving exactly as designed for cluster scale
(bytes/64 MB >> cores there) measured below its granularity floor.

This probe builds /tmp/sf10 — lineitem/orders replicated 100x from
sf0.1 (~60 M / 15 M rows, ~4 GB raw), WRITTEN AS 64 FILES so the 64 MB
split rule yields ~64 scan tasks (> 32 cores; guide §6 output sizing) —
and measures the three heavy lineitem-bound headliners at 8 vs 32
cores. Dimensions come from sf0.1 verbatim; documents/events/embeddings
are not replicated (their heavy queries would take tens of minutes per
rep at 100x; the lineitem trio spans scan+agg, self-join+salting, and
exact-decimal reduction).

    SPARK_GRAFT_CPUS=32 python tools/probe_cores_sf10.py
    SPARK_GRAFT_CPUS=8  python tools/probe_cores_sf10.py

Appends one JSON line per run to /tmp/probe_cores_sf10.jsonl.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf10"
REPLICAS = 100

QUERIES = [
    "tpch_q1_pricing_summary",
    "mining_basket_lift",
    "ml_ols_normal_equations",
]


def generate(spark) -> None:
    from pyspark.sql import functions as F

    from iceberg_metadata_pipeline_spark.session import load_tables

    os.makedirs(DST, exist_ok=True)
    t = load_tables(spark, SRC)
    reps = spark.range(REPLICAS).select(F.col("id").alias("__r"))
    lo = t["orders"].agg(F.max("o_orderkey")).collect()[0][0] + 1
    ck = t["customer"].agg(F.max("c_custkey")).collect()[0][0] + 1

    def replicate(df, shifts):
        out = df.crossJoin(F.broadcast(reps))
        for col, mx in shifts.items():
            out = out.withColumn(col, F.col(col) + F.col("__r") * F.lit(mx))
        return out.drop("__r")

    plans = {
        "lineitem": replicate(t["lineitem"], {"l_orderkey": lo}),
        "orders": replicate(t["orders"], {"o_orderkey": lo, "o_custkey": ck}),
    }
    for name, df in plans.items():
        path = os.path.join(DST, f"{name}.parquet")
        if os.path.exists(path):
            continue
        # 64 files: scan parallelism >= cores under the 64 MB split rule
        df.repartition(64).write.mode("overwrite").parquet(path)
        print(f"  wrote {name}")
    # dimensions + unused tables: copy sf0.1 verbatim (queries under
    # test only read lineitem/orders/part/supplier/nation/region)
    for name in (
        "part", "supplier", "nation", "region", "customer",
        "documents", "events", "embeddings",
    ):
        path = os.path.join(DST, f"{name}.parquet")
        if not os.path.exists(path):
            src = os.path.join(SRC, f"{name}.parquet")
            if os.path.isdir(src):
                shutil.copytree(src, path)
            elif os.path.exists(src):
                shutil.copyfile(src, path)


def main() -> None:
    from iceberg_metadata_pipeline_spark.session import get_spark, load_tables

    import __spark_entry__ as entry_mod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_SF_DIR"] = DST
    spark = get_spark(f"probe-cores-sf10-{cpus}")
    if not os.path.exists(os.path.join(DST, "orders.parquet")):
        print("generating /tmp/sf10 ...")
        generate(spark)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    load_tables(spark, DST)["lineitem"].count()

    qs = entry_mod.queries()
    out = {"cpus": int(cpus), "sf": "sf10", "queries": {}}
    for name in QUERIES:
        runs = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name](spark, DST).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out["queries"][name] = round(min(runs), 2)
        print(f"  {name} @ {cpus} cores: {[round(r,2) for r in runs]}")
    out["load_after"] = [round(x, 2) for x in os.getloadavg()]
    with open("/tmp/probe_cores_sf10.jsonl", "a") as fh:
        fh.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
