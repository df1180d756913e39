"""Probe: planTableScan response size is bounded by the page, not the
table (r11 verdict weak #2 done-bar). Registers N small files into a
metacat table, fronts it with the REST server, and measures the JSON
response bytes of (a) the unpaged plan and (b) every page of a paged
plan (page-size 50) — the paged maximum must be ~N/page smaller and
flat in N.

Usage: python tools/probe_plan_paged.py [n_files]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _req(url: str, method: str = "GET", body: dict | None = None):
    data = None if body is None else json.dumps(body).encode()
    r = urllib.request.Request(url, data=data, method=method)
    if data:
        r.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(r) as resp:
        raw = resp.read()
        return len(raw), json.loads(raw)


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_metadata_pipeline_spark.catalog.metacat import (
        Catalog,
        scan_parquet_footers,
    )
    from iceberg_metadata_pipeline_spark.serving.rest_catalog import (
        RestCatalogServer,
    )
    from iceberg_metadata_pipeline_spark.session import get_spark

    spark = get_spark(app_name="probe-plan-paged")
    base_dir = tempfile.mkdtemp(prefix="probe-plan-")
    data_dir = os.path.join(base_dir, "data")
    os.makedirs(data_dir)
    for i in range(n_files):
        pq.write_table(
            pa.table({"id": pa.array([i], pa.int64())}),
            os.path.join(data_dir, f"f{i:05d}.parquet"),
        )
    catalog = Catalog(spark, os.path.join(base_dir, "wh"))
    catalog.ensure_namespace("nyc")
    t = catalog.create_table(
        "nyc", "many", spark.range(1).selectExpr("id").schema
    )
    t.append_files(scan_parquet_footers(data_dir, spark))

    srv = RestCatalogServer(catalog, os.path.join(base_dir, "mirror")).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        url = f"{base}/v1/namespaces/nyc/tables/many/plan"
        unpaged_bytes, unpaged = _req(url, "POST", {})[0:2]
        assert len(unpaged["file-scan-tasks"]) == n_files
        page = 50
        first_bytes, plan = _req(url, "POST", {"page-size": page})
        page_bytes = [first_bytes]
        n_tasks = len(plan["file-scan-tasks"])
        turl = f"{base}/v1/namespaces/nyc/tables/many/tasks"
        pending = list(plan.get("plan-tasks") or [])
        while pending:  # linked chain: each page carries ONE next token
            b, pg = _req(turl, "POST", {"plan-task": pending.pop(0)})
            page_bytes.append(b)
            n_tasks += len(pg["file-scan-tasks"])
            pending.extend(pg.get("plan-tasks") or [])
        assert n_tasks == n_files, (n_tasks, n_files)
        print(
            json.dumps(
                {
                    "probe": "plan_paged_response_bytes",
                    "n_files": n_files,
                    "page_size": page,
                    "unpaged_bytes": unpaged_bytes,
                    "max_page_bytes": max(page_bytes),
                    "n_pages": len(page_bytes),
                    "ratio": round(unpaged_bytes / max(page_bytes), 1),
                }
            )
        )
    finally:
        srv.stop()
    spark.stop()


if __name__ == "__main__":
    main()
