"""A/B probe: Python DataSource scan throughput (rows/sec) on a 1M-row
pyice read — the r11 verdict's 'weak #1' (per-row tuple yields in the
format DataSource readers) vs the vectorized Arrow-batch yield path.

Builds a 1M-row, 5-column Iceberg table once (Spark parquet write →
metadata-only registration → export_iceberg_table), then times a full
``spark.read.format("pyice").load(...).count()`` plus a MOR variant
with ~1% position deletes. Prints one JSON line; run on the tuple-path
tree for the BEFORE number and on the vectorized tree for AFTER
(recorded in SCALE.md).

Usage: python tools/probe_scan_vectorized.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from pyspark.sql import functions as F

    from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
        export_iceberg_table,
    )
    from iceberg_metadata_pipeline_spark.catalog.metacat import (
        Catalog,
        scan_parquet_footers,
    )
    from iceberg_metadata_pipeline_spark.ingest import pyice_source
    from iceberg_metadata_pipeline_spark.session import get_spark

    spark = get_spark(app_name="probe-scan-vectorized")
    pyice_source.register(spark)

    base = tempfile.mkdtemp(prefix="probe-scan-")
    raw = os.path.join(base, "raw")
    (
        spark.range(n_rows)
        .select(
            F.col("id").alias("a"),
            (F.col("id") % 97).alias("b"),
            (F.col("id") * 0.5).cast("double").alias("x"),
            F.concat(F.lit("row-"), F.col("id").cast("string")).alias("s"),
            # NOTE: no timestamp column here — the pre-r12 tuple path
            # cannot serve tz-naive parquet timestamps at all (pandas
            # tz_convert error in Spark's row converter); the vectorized
            # path fixes that (cast to timestamp[us, tz=UTC]) and a
            # dedicated pytest covers it. Keeping the probe column set
            # identical across BEFORE/AFTER keeps the A/B honest.
            (F.col("id") % 1000).cast("int").alias("k"),
        )
        .coalesce(8)
        .write.mode("overwrite")
        .parquet(raw)
    )
    catalog = Catalog(spark, os.path.join(base, "wh"))
    catalog.ensure_namespace("nyc")
    df = spark.read.parquet(raw)
    t = catalog.create_table("nyc", "probe_scan", df.schema)
    t.append_files(scan_parquet_footers(raw, spark))
    dest = os.path.join(base, "ice")
    export_iceberg_table(t.refresh(), dest)

    # plain scan
    back = spark.read.format("pyice").load(dest)
    back.count()  # warm (JVM + python worker spin-up)
    t0 = time.monotonic()
    got = back.count()
    plain_s = time.monotonic() - t0
    assert got == n_rows, (got, n_rows)

    # MOR variant: ~1% position deletes through the table's delete path
    t.delete_where_positional("a % 100 = 0")
    export_iceberg_table(t.refresh(), os.path.join(base, "ice_mor"))
    mor = spark.read.format("pyice").load(os.path.join(base, "ice_mor"))
    t0 = time.monotonic()
    got_mor = mor.count()
    mor_s = time.monotonic() - t0
    expect = n_rows - (n_rows + 99) // 100
    assert got_mor == expect, (got_mor, expect)

    print(
        json.dumps(
            {
                "probe": "pyice_scan_throughput",
                "n_rows": n_rows,
                "plain_sec": round(plain_s, 3),
                "plain_rows_per_sec": int(n_rows / plain_s),
                "mor_sec": round(mor_s, 3),
                "mor_rows_per_sec": int(got_mor / mor_s),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
