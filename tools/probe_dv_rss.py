"""Driver-memory probe for v3 deletion-vector minting (r10 VERDICT
"What's wrong" #1): export a position-deleted table at two delete
cardinalities an order of magnitude apart and assert the DRIVER's
Python allocation peak (tracemalloc, measured around
``export_iceberg_table(format_version=3)`` only) stays flat.

The r10 posture read every position-delete parquet with pyarrow ON THE
DRIVER into Python sets — peak driver memory O(deleted positions).
Round 11 mints each referenced file's roaring payload inside a Spark
task (groupBy(file_path).applyInPandas → encode_dv_payload) and the
driver collects only the finished blob bytes, so its peak is
O(#referenced files + compressed blob bytes) — the puffin container's
own size, which it must write regardless.

Run:  python tools/probe_dv_rss.py
Pass: peak(1e6 deletes) < 3x peak(1e5 deletes)  [10x rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq


def measure(spark, n_deletes: int) -> dict:
    from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
        export_iceberg_table,
    )
    from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog

    root = tempfile.mkdtemp(prefix=f"dvprobe{n_deletes}_")
    try:
        cat = Catalog(spark, os.path.join(root, "wh"))
        t = cat.create_table(
            "probe", "t", spark.range(0).selectExpr("id", "id * 2 AS v").schema
        ).refresh()
        # one data file comfortably larger than the delete count
        t.append_dataframe(
            spark.range(n_deletes + 16).selectExpr("id", "id * 2 AS v").coalesce(1)
        )
        files = sorted(f.path for f in t.snapshot_files())
        dp = os.path.join(root, "d.parquet")
        pq.write_table(
            pa.table(
                {
                    "file_path": pa.array([files[0]] * n_deletes),
                    "pos": pa.array(range(n_deletes), pa.int64()),
                }
            ),
            dp,
        )
        t.add_position_delete_files([dp])
        dest = os.path.join(root, "ice3")

        tracemalloc.start()
        export_iceberg_table(t, dest, format_version=3)
        _cur, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()

        puffins = [
            os.path.join(dest, "metadata", f)
            for f in os.listdir(os.path.join(dest, "metadata"))
            if f.endswith(".puffin")
        ]
        return {
            "deletes": n_deletes,
            "driver_peak_bytes": int(peak),
            "puffin_bytes": sum(os.path.getsize(p) for p in puffins),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    from iceberg_metadata_pipeline_spark.session import get_spark

    spark = get_spark(app_name="dv-rss-probe")
    lo = measure(spark, 100_000)
    # warm once more at the small size so JVM/py4j startup noise is out
    lo = measure(spark, 100_000)
    hi = measure(spark, 1_000_000)
    ratio = hi["driver_peak_bytes"] / max(1, lo["driver_peak_bytes"])
    out = {
        "probe": "v3_dv_mint_driver_rss",
        "lo": lo,
        "hi": hi,
        "peak_ratio_10x_rows": round(ratio, 3),
        "pass": ratio < 3.0,
    }
    print(json.dumps(out))
    sys.exit(0 if out["pass"] else 1)


if __name__ == "__main__":
    main()
