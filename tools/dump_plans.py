"""Dump .explain("formatted") for headline queries to plans/<round>/
(round from $SPARK_GRAFT_PLANS_ROUND, default r13).

Usage:
    python tools/dump_plans.py before            # all headliners
    python tools/dump_plans.py after q1 q2 ...   # named queries only

Writes plans/r12/<query>_<tag>.txt. Building a query's DataFrame may run
eager fixture side-effects (catalog commits); the explain itself is
driver-only. Queries whose construction fails are recorded with the
traceback so the failure is visible rather than silent.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)

    from iceberg_metadata_pipeline_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("plan-dump")
    qs = entry_mod.queries()
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name}: not in registry")
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = "PLAN FAILED\n" + traceback.format_exc()
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
