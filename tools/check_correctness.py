"""Local mimic of the driver's DuckDB-oracle correctness gate.

Runs each ``__spark_entry__.queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same sf parquet tables, then compares
row count, column names, and order-insensitive values (columns sorted by
name, rows sorted). Exact equality is the target; float deltas are
reported with magnitude so near-misses are visible.

Usage:
    python tools/check_correctness.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    # timestamps/dates → isoformat string for cross-engine comparison
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows_to_sorted(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def compare(name, spark_df, duck_rel):
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = [d[0] for d in duck_rel.description]
    d_rows = duck_rel.fetchall()

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount differ: spark={len(s_rows)} duck={len(d_rows)}")
    if problems:
        return problems

    a = _rows_to_sorted(s_rows, s_cols)
    b = _rows_to_sorted(d_rows, d_cols)
    n_mismatch, max_float_delta = 0, 0.0
    for ra, rb in zip(a, b):
        if ra == rb:
            continue
        exact = True
        for x, y in zip(ra, rb):
            if x == y:
                # 60 == 60.0 here, but NOT to the driver's value hash
                # (r5 red fn_hof_exists_forall: Spark INT vs DuckDB
                # DOUBLE). int-vs-float family divergence is a real red
                # even when values compare equal.
                if isinstance(x, float) is not isinstance(y, float) and (
                    isinstance(x, (int, float)) and isinstance(y, (int, float))
                ):
                    exact = False
                    max_float_delta = float("inf")
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                max_float_delta = max(max_float_delta, abs(x - y))
                exact = False
            else:
                exact = False
                max_float_delta = float("inf")
        if not exact:
            n_mismatch += 1
            if n_mismatch <= 3:
                problems.append(f"row mismatch:\n  spark={ra}\n  duck ={rb}")
    if n_mismatch:
        problems.append(f"{n_mismatch}/{len(a)} rows mismatch, max float delta={max_float_delta}")
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument(
        "--timings-out",
        help="write per-query wall seconds as JSON (feeds queries/measured_costs.json)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry_mod
    from iceberg_metadata_pipeline_spark.session import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)
    # warm the session BEFORE timing: otherwise the first query's
    # measured cost absorbs JVM start + fixture load (~6 s) and the
    # cost-ordering that feeds on measured_costs.json gets skewed
    from iceberg_metadata_pipeline_spark.session import load_tables

    load_tables(spark, args.sf)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()
    n_pass = n_fail = n_rows_only = 0
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            if name not in oracles:
                cnt = sdf.count()
                timings[name] = round(time.time() - t0, 2)
                print(f"  ROWS-ONLY {name}: {cnt} rows ({time.time()-t0:.1f}s)")
                n_rows_only += 1
                continue
            rel = con.sql(oracles[name])
            problems = compare(name, sdf, rel)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {e}"]
        timings[name] = round(time.time() - t0, 2)
        if problems:
            n_fail += 1
            print(f"  FAIL {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"       {p}")
        else:
            n_pass += 1
            print(f"  ok   {name} ({time.time()-t0:.1f}s)")
    if args.timings_out:
        import json

        with open(args.timings_out, "w") as fh:
            json.dump(timings, fh, indent=1, sort_keys=True)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
