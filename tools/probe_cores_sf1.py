"""Parallel-scaling probe at sf1 (r12 VERDICT #5): run the heaviest
headliners on the synthetic 10x fixture (/tmp/sf1, the scale_check.py
generator) at BOTH core counts and record the 8-core/32-core ratio.
At sf0.1 every headliner is fixed-overhead-bound (the full 8-core suite
is FASTER than 32), so this probe is the round's only direct evidence
that the operators parallelize once data dominates overhead.

Run once per core count (fresh process per run — the master is fixed at
session build):

    SPARK_GRAFT_CPUS=32 python tools/probe_cores_sf1.py
    SPARK_GRAFT_CPUS=8  python tools/probe_cores_sf1.py

Appends one JSON line per run to /tmp/probe_cores_sf1.jsonl.

Fixture caveats (same reasoning as scale_check.py): `part` is a
dimension and deliberately does NOT replicate, so the two hudi MOR
fixture queries would measure the same 200k-row table at any SF; the
MOR write path instead gets a bespoke verbs-over-replicated-orders
probe (bulk insert + 10% upsert + 5% delete), which is the real
one-task-per-file-group scaling signal.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/tmp/sf1"

REGISTRY_QUERIES = [
    "pipeline_incremental_dedup_index",  # documents (replicated)
    "mining_basket_lift",  # lineitem (replicated)
    "ml_ols_normal_equations",  # lineitem (replicated)
    "dedup_minhash_lsh",  # documents (replicated)
    "tpch_q1_pricing_summary",  # lineitem (replicated) — pure-JVM control
]


def _mor_write_probe(spark) -> float:
    import tempfile

    from pyspark.sql import functions as F

    from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
        bulk_insert_mor,
        compact_mor,
        create_mor_table,
        delete_mor,
        upsert_mor,
    )
    from iceberg_metadata_pipeline_spark.session import load_tables

    # MOR log serde is flat-primitives-only: project the flat columns
    orders = load_tables(spark, SF1)["orders"].select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority",
    )
    loc = tempfile.mkdtemp(prefix="sf1-mor-") + "/orders_mor"
    t0 = time.perf_counter()
    create_mor_table(loc, "orders_mor", [], "o_orderkey", orders.schema)
    bulk_insert_mor(loc, orders, n_file_groups=32)
    upsert_mor(
        loc,
        orders.where("o_orderkey % 10 = 0").withColumn(
            "o_totalprice", F.col("o_totalprice") * F.lit(1.1)
        ),
    )
    delete_mor(loc, orders.where("o_orderkey % 20 = 3").select("o_orderkey"))
    compact_mor(loc, spark=spark)
    return time.perf_counter() - t0


def main() -> None:
    from iceberg_metadata_pipeline_spark.session import get_spark, load_tables

    import __spark_entry__ as entry_mod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_SF_DIR"] = SF1
    spark = get_spark(f"probe-cores-sf1-{cpus}")

    if not os.path.exists(os.path.join(SF1, "lineitem.parquet")):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import scale_check

        print("generating /tmp/sf1 ...")
        scale_check.generate(spark)

    # warmup: JVM + fs init + footer reads
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    load_tables(spark, SF1)["lineitem"].count()

    qs = entry_mod.queries()
    out = {"cpus": int(cpus), "sf": "sf1", "queries": {}}
    for name in REGISTRY_QUERIES:
        runs = []
        for _ in range(2):
            spark.catalog.clearCache()  # cold per rep: caches rebuilt in-run
            t0 = time.perf_counter()
            qs[name](spark, SF1).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out["queries"][name] = round(min(runs), 2)
        print(f"  {name} @ {cpus} cores: {[round(r,2) for r in runs]}")
    out["queries"]["mor_write_verbs_orders"] = round(_mor_write_probe(spark), 2)
    print(f"  mor_write_verbs_orders @ {cpus}: {out['queries']['mor_write_verbs_orders']}")
    out["load_after"] = [round(x, 2) for x in os.getloadavg()]
    with open("/tmp/probe_cores_sf1.jsonl", "a") as fh:
        fh.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
