"""Audit every declared query for harness-hostile output shapes.

The driver's correctness harness canonicalizes result rows with pandas
(sort + hash); two output shapes break it:

1. array/map/struct-typed Spark columns → ``TypeError: unhashable type``
   in the canonicalizer (CORRECTNESS_r01: agg_array_collect_sorted,
   agg_percentile_approx);
2. engine-divergent numeric result types — DuckDB ``SUM(int)`` returns
   HUGEINT/DECIMAL while Spark returns BIGINT, and the hash is
   type-sensitive (CORRECTNESS_r01: join_null_safe_equality).

This tool flags both WITHOUT executing the Spark side (schema comes from
the lazy plan) and runs each oracle under DuckDB ``LIMIT 0`` for result
types. Exit code 1 if any finding, so it can gate commits.

Usage: python tools/audit_outputs.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# DuckDB result types that hash differently from any Spark type under a
# type-sensitive canonicalizer. DECIMAL is fine only when the Spark side
# is also DECIMAL with the same value repr — we flag HUGEINT always.
DUCK_BAD = {"HUGEINT", "UHUGEINT"}
SPARK_BAD_PREFIXES = ("array<", "map<", "struct<")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from iceberg_metadata_pipeline_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    findings = []
    for name in names:
        # Spark side: lazy schema only (no execution for pure queries)
        try:
            df = qs[name](spark, args.sf)
            for fname, ftype in df.dtypes:
                if ftype.startswith(SPARK_BAD_PREFIXES):
                    findings.append(f"{name}: spark column {fname} is {ftype}")
        except Exception as e:  # noqa: BLE001
            findings.append(f"{name}: spark plan failed: {type(e).__name__}: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            rel = con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
            duck_types = {d[0]: str(d[1]) for d in rel.description}
        except Exception as e:  # noqa: BLE001
            findings.append(f"{name}: oracle failed: {type(e).__name__}: {e}")
            continue
        for cname, dtype in duck_types.items():
            if dtype in DUCK_BAD:
                findings.append(
                    f"{name}: oracle column {cname} is {dtype} (Spark would be BIGINT) — CAST both sides"
                )
        spark_types = dict(df.dtypes)
        if sorted(spark_types) != sorted(duck_types):
            findings.append(
                f"{name}: column names differ spark={sorted(spark_types)} duck={sorted(duck_types)}"
            )

    if findings:
        print(f"{len(findings)} finding(s):")
        for f in findings:
            print(" -", f)
        return 1
    print(f"clean: {len(names)} queries audited (schemas + oracle result types)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
