"""Round 12: vectorized DataSource readers (Arrow-batch yields — the
r11 verdict's weak #1), the pyrest residual-filter re-application, and
the naive-timestamp scan fix the vectorization unlocked."""

from __future__ import annotations

import json
import urllib.request

import pytest
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
from iceberg_metadata_pipeline_spark.serving.rest_catalog import (
    RestCatalogServer,
)


@pytest.fixture()
def server(spark, tmp_path):
    catalog = Catalog(spark, str(tmp_path / "wh"))
    srv = RestCatalogServer(catalog, str(tmp_path / "mirror")).start()
    yield catalog, srv, f"http://127.0.0.1:{srv.port}"
    srv.stop()


def _req(url: str, method: str = "GET", body: dict | None = None):
    data = None if body is None else json.dumps(body).encode()
    r = urllib.request.Request(url, data=data, method=method)
    if data:
        r.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(r) as resp:
        raw = resp.read()
        return resp.status, json.loads(raw) if raw else None


def test_pyice_reader_yields_arrow_batches(spark, tmp_path):
    """The batch reader's read() yields pa.RecordBatch (not tuples):
    the Python↔JVM boundary stays columnar — asserted at the unit
    level so a regression to row yields fails loudly, not just
    slowly."""
    import pyarrow as pa

    from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
        export_iceberg_table,
    )
    from iceberg_metadata_pipeline_spark.ingest.pyice_source import (
        PyIceBatchReader,
    )

    catalog = Catalog(spark, str(tmp_path / "wh"))
    t = catalog.create_table(
        "nyc", "vec", spark.range(10).selectExpr("id AS a").schema
    )
    t.append_dataframe(spark.range(10).selectExpr("id AS a").coalesce(1))
    dest = str(tmp_path / "ice")
    export_iceberg_table(t.refresh(), dest)

    reader = PyIceBatchReader({"path": dest})
    parts = reader.partitions()
    assert parts
    out = list(reader.read(parts[0]))
    assert out and all(isinstance(b, pa.RecordBatch) for b in out)
    assert sum(b.num_rows for b in out) == 10


def test_pyice_scans_naive_timestamps(spark, tmp_path):
    """tz-naive parquet timestamps (Spark INT96 output, pandas-written
    files — the fixture tables' own shape) now scan through pyice: the
    arrow cast localizes naive micros to UTC, matching the session's
    timeZone=UTC envelope. The pre-r12 tuple path raised pandas
    tz_convert errors on these files."""
    import datetime as dt

    from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
        export_iceberg_table,
    )
    from iceberg_metadata_pipeline_spark.catalog.metacat import (
        scan_parquet_footers,
    )
    from iceberg_metadata_pipeline_spark.ingest.pyice_source import register

    register(spark)
    raw = str(tmp_path / "raw")
    df = spark.createDataFrame(
        [(i, dt.datetime(2026, 1, 1, 12, 0, i)) for i in range(5)],
        "a long, ts timestamp",
    )
    df.coalesce(1).write.parquet(raw)
    # Spark writes INT96 by default → pyarrow reads timestamp[ns] NAIVE
    catalog = Catalog(spark, str(tmp_path / "wh"))
    t = catalog.create_table("nyc", "tsv", df.schema)
    t.append_files(scan_parquet_footers(raw, spark))
    dest = str(tmp_path / "ice")
    export_iceberg_table(t.refresh(), dest)

    back = spark.read.format("pyice").load(dest).orderBy("a").collect()
    assert [r.ts for r in back] == [
        dt.datetime(2026, 1, 1, 12, 0, i) for i in range(5)
    ]


def test_pyrest_residual_filter_applies_without_user_filter(
    spark, server, tmp_path
):
    """option('filter', ...) alone returns exactly the filtered rows:
    the server echoes the expression as each task's residual-filter and
    the reader re-applies it row-level (r11 ADVICE: the old doc claimed
    Spark would re-filter, which only held if the caller repeated the
    predicate). The predicate here cuts MID-file, so file-level pruning
    alone cannot produce the right answer."""
    from iceberg_metadata_pipeline_spark.ingest.pyrest_source import register

    catalog, srv, base = server
    _req(f"{base}/v1/namespaces", "POST", {"namespace": ["r12"]})
    t = catalog.create_table(
        "r12",
        "resid",
        spark.range(10).selectExpr("id", "id % 3 AS m").schema,
    )
    t.append_dataframe(
        spark.range(10).selectExpr("id", "id % 3 AS m").coalesce(1)
    )
    register(spark)
    flt = json.dumps(
        {
            "type": "and",
            "left": {"type": "gt-eq", "term": "id", "value": 3},
            "right": {"type": "not-eq", "term": "m", "value": 0},
        }
    )
    got = (
        spark.read.format("pyrest")
        .option("url", base)
        .option("filter", flt)
        .load("r12.resid")
    )
    assert sorted(r.id for r in got.collect()) == [
        i for i in range(3, 10) if i % 3 != 0
    ]
    # IN + NOT + null three-valued semantics
    flt2 = json.dumps(
        {"type": "not", "child": {"type": "in", "term": "id", "values": [1, 4]}}
    )
    got2 = (
        spark.read.format("pyrest")
        .option("url", base)
        .option("filter", flt2)
        .load("r12.resid")
    )
    assert sorted(r.id for r in got2.collect()) == [
        i for i in range(10) if i not in (1, 4)
    ]


def test_pyrest_residual_with_deletes_composes(spark, server, tmp_path):
    """Residual filter and MOR position deletes compose in one task
    pass: the delete mask and the filter mask AND together."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_metadata_pipeline_spark.ingest.pyrest_source import register

    catalog, srv, base = server
    _req(f"{base}/v1/namespaces", "POST", {"namespace": ["r12b"]})
    t = catalog.create_table(
        "r12b", "rd", spark.range(8).selectExpr("id").schema
    )
    t.append_dataframe(spark.range(8).selectExpr("id").coalesce(1))
    f = sorted(x.path for x in t.snapshot_files())[0]
    victim_pos = 5  # row at position 5 → id 5 in a single coalesced file
    dp = str(tmp_path / "d.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([f], pa.string()),
                "pos": pa.array([victim_pos], pa.int64()),
            }
        ),
        dp,
    )
    t.add_position_delete_files([dp])
    register(spark)
    flt = json.dumps({"type": "gt-eq", "term": "id", "value": 4})
    got = (
        spark.read.format("pyrest")
        .option("url", base)
        .option("filter", flt)
        .load("r12b.rd")
    )
    assert sorted(r.id for r in got.collect()) == [4, 6, 7]


def test_vectorized_mor_scan_matches_tuple_semantics(spark, tmp_path):
    """End-to-end MOR parity after vectorization: position + equality
    deletes through pyice equal the warehouse-scan answer on the same
    table (the format battery covers breadth; this pins the exact
    masks-compose-with-fills path in one place)."""
    from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
        export_iceberg_table,
    )
    from iceberg_metadata_pipeline_spark.ingest.pyice_source import register

    register(spark)
    catalog = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(100).selectExpr(
        "id", "id % 7 AS k", "CAST(id * 1.5 AS DOUBLE) AS v"
    )
    t = catalog.create_table("nyc", "mor12", df.schema)
    t.append_dataframe(df.coalesce(2))
    t.delete_where_positional("id % 10 = 3")
    t.delete_where_mor("k = 5")
    dest = str(tmp_path / "ice")
    export_iceberg_table(t.refresh(), dest)
    back = spark.read.format("pyice").load(dest)
    expect = (
        df.where("id % 10 != 3 AND k != 5")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
        )
        .collect()[0]
    )
    got = back.agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()[0]
    assert (got.n, got.s) == (expect.n, expect.s)


def test_strip_outer_parens_unit():
    from iceberg_metadata_pipeline_spark.catalog.partitioning import (
        strip_outer_parens,
    )

    assert strip_outer_parens("(a = 1)") == "a = 1"
    assert strip_outer_parens("((x > 2))") == "x > 2"
    assert strip_outer_parens("(a = 1) OR (b = 2)") == "(a = 1) OR (b = 2)"
    assert strip_outer_parens("a = '(weird)'") == "a = '(weird)'"
    assert strip_outer_parens("(a = '(x')") == "a = '(x'"


def test_plan_compound_and_filter_prunes_both_columns(spark, server):
    """r11 ADVICE (low): _expr_to_sql parenthesizes AND branches, which
    made stats pruning inert for every compound filter. With the parens
    stripped per conjunct, an AND filter prunes on BOTH columns."""
    catalog, srv, base = server
    _req(f"{base}/v1/namespaces", "POST", {"namespace": ["pp"]})
    t = catalog.create_table(
        "pp", "t", spark.range(1).selectExpr("id AS a", "id AS b").schema
    )
    # three files with disjoint (a, b) ranges
    for lo in (0, 100, 200):
        t.append_dataframe(
            spark.range(lo, lo + 10).selectExpr("id AS a", "id AS b")
            .coalesce(1)
        )
    url = f"{base}/v1/namespaces/pp/tables/t/plan"
    flt = {
        "type": "and",
        "left": {"type": "gt-eq", "term": "a", "value": 100},
        "right": {"type": "lt", "term": "b", "value": 150},
    }
    code, out = _req(url, "POST", {"filter": flt})
    assert code == 200
    # a >= 100 drops file 1; b < 150 drops file 3 → exactly one task
    assert len(out["file-scan-tasks"]) == 1
    fp = out["file-scan-tasks"][0]["data-file"]["file-path"]
    import pyarrow.parquet as pq

    vals = pq.read_table(fp).column("a").to_pylist()
    assert min(vals) == 100


def test_plan_refuses_unresolvable_equality_keys(spark, server, tmp_path):
    """r11 ADVICE (medium): planTableScan must REFUSE (409) when an
    equality-delete key column no longer resolves against the served
    schema — silently narrowing equality-ids would make a thin client
    anti-join on fewer columns and over-delete."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    catalog, srv, base = server
    _req(f"{base}/v1/namespaces", "POST", {"namespace": ["eqk"]})
    t = catalog.create_table(
        "eqk", "t", spark.range(1).selectExpr("id", "id AS k").schema
    )
    t.append_dataframe(spark.range(5).selectExpr("id", "id AS k").coalesce(1))
    eqp = str(tmp_path / "eq.parquet")
    pq.write_table(pa.table({"k": pa.array([2], pa.int64())}), eqp)
    t.add_foreign_delete_files([], [(["k"], [eqp])])
    url = f"{base}/v1/namespaces/eqk/tables/t/plan"
    code, out = _req(url, "POST", {})
    assert code == 200  # resolvable: plan serves the equality delete
    assert out["delete-files"][0]["equality-ids"]
    t.rename_column("k", "k2")
    import urllib.error

    try:
        _req(url, "POST", {})
        raise AssertionError("plan should refuse after key rename")
    except urllib.error.HTTPError as e:
        assert e.code == 409
        assert b"do not resolve" in e.read()


def test_incremental_export_occ_retry(spark, tmp_path, monkeypatch):
    """r11 ADVICE (low): _commit_incremental_row_delta claims EXACTLY
    base_version+1 — a concurrent mirror commit between read and claim
    fails the claim and the caller retries from the fresh latest state
    instead of superseding the concurrent commit with a stale snapshot."""
    import json as _json
    import shutil

    from iceberg_metadata_pipeline_spark.catalog import iceberg_format as IF

    catalog = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(20).selectExpr("id", "id % 3 AS k")
    t = catalog.create_table("nyc", "occ", df.schema)
    t.append_dataframe(df.coalesce(1))
    dest = str(tmp_path / "ice")
    IF.export_iceberg_table(t.refresh(), dest)

    # next change: a positional MOR delete → incremental row-delta path
    # (delete_where_mor would mint a PREDICATE entry, which disables the
    # incremental path by design)
    t.delete_where_positional("k = 1")

    real_claim = IF._claim_metadata_version
    state = {"raced": False}

    def racing_claim(location, metadata, version):
        if not state["raced"] and location == dest:
            state["raced"] = True
            # concurrent writer lands first at the same version
            latest = IF._latest_metadata_path(dest)
            with open(latest) as fh:
                md = _json.load(fh)
            md["last-updated-ms"] = md.get("last-updated-ms", 0) + 1
            assert real_claim(dest, md, version) is not None
        return real_claim(location, metadata, version)

    monkeypatch.setattr(IF, "_claim_metadata_version", racing_claim)
    out = IF.export_iceberg_table(t.refresh(), dest)
    assert state["raced"]
    monkeypatch.undo()

    # the export landed ABOVE the concurrent commit and serves the
    # post-delete rows exactly
    from iceberg_metadata_pipeline_spark.ingest.pyice_source import register

    register(spark)
    got = sorted(
        r.id for r in spark.read.format("pyice").load(dest).collect()
    )
    assert got == [i for i in range(20) if i % 3 != 1]


def test_replace_equality_delete_preserves_anchor_seq(spark, tmp_path):
    """r11 ADVICE (low): a 1:1 equality rewrite passing the removed
    entry's seq (4-tuple group) applies to exactly the original files;
    the bare 3-tuple form re-anchors to the maintenance commit and
    widens reach — both behaviors pinned."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def build(wh):
        catalog = Catalog(spark, str(tmp_path / wh))
        t = catalog.create_table(
            "nyc", "anch", spark.range(1).selectExpr("id", "id AS k").schema
        )
        t.append_dataframe(
            spark.range(0, 5).selectExpr("id", "id AS k").coalesce(1)
        )
        eqp = str(tmp_path / f"{wh}-eq.parquet")
        pq.write_table(pa.table({"k": pa.array([2], pa.int64())}), eqp)
        t.add_foreign_delete_files([], [(["k"], [eqp])])
        orig_seq = next(
            d["seq"]
            for d in t._resolve_deletes(t.current_snapshot)
            if d["kind"] == "equality"
        )
        # rows appended AFTER the delete: k=2 here must SURVIVE
        t.append_dataframe(
            spark.createDataFrame([(100, 2)], "id long, k long").coalesce(1)
        )
        from iceberg_metadata_pipeline_spark.ingest.discover import (
            find_parquet_files,
        )

        old_root = next(
            d["path"]
            for d in t._resolve_deletes(t.current_snapshot)
            if d["kind"] == "equality"
        )
        import os as _os

        old_path = (
            find_parquet_files(old_root)
            if _os.path.isdir(old_root)
            else [old_root]
        )
        eqp2 = str(tmp_path / f"{wh}-eq2.parquet")
        pq.write_table(pa.table({"k": pa.array([2], pa.int64())}), eqp2)
        return t, orig_seq, old_path, eqp2

    # anchored rewrite: the later k=2 row survives (exact 1:1 semantics)
    t, orig_seq, old_path, eqp2 = build("wh-a")
    t.replace_delete_files(list(old_path), [], [(["k"], [eqp2], None, orig_seq)])
    got = sorted(r.id for r in t.scan().collect())
    assert got == [0, 1, 3, 4, 100]

    # bare rewrite re-anchors: the later k=2 row is now deleted too
    t2, _seq, old_path2, eqp3 = build("wh-b")
    t2.replace_delete_files(list(old_path2), [], [(["k"], [eqp3])])
    got2 = sorted(r.id for r in t2.scan().collect())
    assert got2 == [0, 1, 3, 4]


def test_plan_pagination_wire_walk(spark, server, tmp_path):
    """r11 verdict weak #2: planTableScan with page-size returns the
    first page + stateless plan-tasks tokens; walking fetchScanTasks
    yields exactly the unpaged plan (same tasks, same delete refs),
    every response bounded by the page size — including a table with
    MOR deletes whose delete-files arrays re-index page-locally."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    catalog, srv, base = server
    _req(f"{base}/v1/namespaces", "POST", {"namespace": ["pg"]})
    t = catalog.create_table(
        "pg", "t", spark.range(1).selectExpr("id").schema
    )
    for lo in range(0, 50, 10):  # five files
        t.append_dataframe(
            spark.range(lo, lo + 10).selectExpr("id").coalesce(1)
        )
    # a position delete referencing the first file (applies to all five
    # tasks' pages through the seq rule? no — position refs one file,
    # but the REFERENCE rides every page whose tasks it applies to)
    f0 = sorted(x.path for x in t.snapshot_files())[0]
    dp = str(tmp_path / "pg-d.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([f0], pa.string()),
                "pos": pa.array([0], pa.int64()),
            }
        ),
        dp,
    )
    t.add_position_delete_files([dp])

    url = f"{base}/v1/namespaces/pg/tables/t/plan"
    code, full = _req(url, "POST", {})
    assert code == 200 and len(full["file-scan-tasks"]) == 5

    code, paged = _req(url, "POST", {"page-size": 2})
    assert code == 200
    assert len(paged["file-scan-tasks"]) == 2
    # LINKED pagination: each response carries exactly ONE next-token,
    # so every response is O(page) — incl. the first
    tokens = paged["plan-tasks"]
    assert len(tokens) == 1

    def resolve(page):
        dels = page.get("delete-files") or []
        out = []
        for task in page["file-scan-tasks"]:
            out.append(
                (
                    task["data-file"]["file-path"],
                    tuple(
                        dels[i]["file-path"]
                        for i in task.get("delete-file-references") or []
                    ),
                )
            )
        return out

    walked = resolve(paged)
    turl = f"{base}/v1/namespaces/pg/tables/t/tasks"
    pending = list(tokens)
    n_pages = 0
    while pending:
        code, page = _req(turl, "POST", {"plan-task": pending.pop(0)})
        assert code == 200
        assert len(page["file-scan-tasks"]) <= 2  # bounded per response
        assert len(page.get("plan-tasks") or []) <= 1  # linked chain
        walked.extend(resolve(page))
        pending.extend(page.get("plan-tasks") or [])
        n_pages += 1
    assert n_pages == 2  # offsets 2 and 4
    assert walked == resolve(full)
    # the delete reference survives paging on whichever page holds f0's task
    assert any(refs for _p, refs in walked)

    # garbled token → 400
    import urllib.error

    try:
        _req(turl, "POST", {"plan-task": "bm90LWEtdG9rZW4="})
        raise AssertionError("garbled token should 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_plan_pagination_pins_snapshot(spark, server):
    """Tokens pin the snapshot at plan time: appends landing between
    page fetches do NOT leak into later pages (stable pagination)."""
    catalog, srv, base = server
    _req(f"{base}/v1/namespaces", "POST", {"namespace": ["pg2"]})
    t = catalog.create_table(
        "pg2", "t", spark.range(1).selectExpr("id").schema
    )
    for lo in range(0, 30, 10):
        t.append_dataframe(
            spark.range(lo, lo + 10).selectExpr("id").coalesce(1)
        )
    url = f"{base}/v1/namespaces/pg2/tables/t/plan"
    code, paged = _req(url, "POST", {"page-size": 2})
    assert len(paged["file-scan-tasks"]) == 2 and len(paged["plan-tasks"]) == 1
    # concurrent append AFTER planning
    t.append_dataframe(spark.range(100, 110).selectExpr("id").coalesce(1))
    code, page2 = _req(
        f"{base}/v1/namespaces/pg2/tables/t/tasks",
        "POST",
        {"plan-task": paged["plan-tasks"][0]},
    )
    assert not page2.get("plan-tasks")  # pinned snapshot exhausted
    got = {tk["data-file"]["file-path"] for tk in paged["file-scan-tasks"]}
    got |= {tk["data-file"]["file-path"] for tk in page2["file-scan-tasks"]}
    assert len(got) == 3  # the three planned files, not the fourth


def test_pyrest_paged_read_matches_unpaged(spark, server):
    """pyrest with pageSize walks fetchScanTasks transparently and
    returns the identical frame."""
    from iceberg_metadata_pipeline_spark.ingest.pyrest_source import register

    catalog, srv, base = server
    _req(f"{base}/v1/namespaces", "POST", {"namespace": ["pg3"]})
    t = catalog.create_table(
        "pg3", "t", spark.range(1).selectExpr("id").schema
    )
    for lo in range(0, 40, 10):
        t.append_dataframe(
            spark.range(lo, lo + 10).selectExpr("id").coalesce(1)
        )
    register(spark)
    paged = (
        spark.read.format("pyrest")
        .option("url", base)
        .option("pageSize", "1")
        .load("pg3.t")
    )
    assert sorted(r.id for r in paged.collect()) == list(range(40))


def test_transaction_two_table_atomic_commit(spark, server):
    """POST /v1/transactions/commit: both tables' changes land in one
    transaction; a stale requirement on table B refuses the WHOLE
    transaction with table A untouched (requirements all validate
    before the first mutation)."""
    import urllib.error

    catalog, srv, base = server
    _req(f"{base}/v1/namespaces", "POST", {"namespace": ["tx"]})
    ta = catalog.create_table("tx", "a", spark.range(1).selectExpr("id").schema)
    tb = catalog.create_table("tx", "b", spark.range(1).selectExpr("id").schema)
    ta.append_dataframe(spark.range(3).selectExpr("id").coalesce(1))
    tb.append_dataframe(spark.range(3).selectExpr("id").coalesce(1))
    sid_a = int(ta.current_snapshot["snapshot_id"])
    sid_b = int(tb.current_snapshot["snapshot_id"])

    def change(name, sid, k, v):
        return {
            "identifier": {"namespace": ["tx"], "name": name},
            "requirements": [
                {"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": sid}
            ],
            "updates": [{"action": "set-properties", "updates": {k: v}}],
        }

    # happy path: both land
    code, _ = _req(
        f"{base}/v1/transactions/commit",
        "POST",
        {"table-changes": [change("a", sid_a, "p", "1"), change("b", sid_b, "q", "2")]},
    )
    assert code == 204
    assert catalog.load_table("tx", "a").properties.get("p") == "1"
    assert catalog.load_table("tx", "b").properties.get("q") == "2"

    # stale requirement on B: 409, A untouched
    try:
        _req(
            f"{base}/v1/transactions/commit",
            "POST",
            {
                "table-changes": [
                    change("a", sid_a, "p", "CHANGED"),
                    change("b", 424242, "q", "CHANGED"),
                ]
            },
        )
        raise AssertionError("stale requirement should 409")
    except urllib.error.HTTPError as e:
        assert e.code == 409
    assert catalog.load_table("tx", "a").properties.get("p") == "1"  # untouched
    assert catalog.load_table("tx", "b").properties.get("q") == "2"

    # malformed update SHAPE on B also refuses with A untouched
    bad = {
        "identifier": {"namespace": ["tx"], "name": "b"},
        "requirements": [],
        "updates": [{"action": "add-schema", "schema": {"type": "struct", "fields": []}}],
    }
    try:
        _req(
            f"{base}/v1/transactions/commit",
            "POST",
            {"table-changes": [change("a", sid_a, "p", "CHANGED2"), bad]},
        )
        raise AssertionError("unpaired add-schema should 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
    assert catalog.load_table("tx", "a").properties.get("p") == "1"


def test_staged_create_commits_through_transaction(spark, server):
    """stage-create → commitTransaction with assert-create: the table
    does not exist until the transaction lands; afterwards loadTable
    round-trips it with the staged schema + the commit's properties."""
    import urllib.error

    catalog, srv, base = server
    _req(f"{base}/v1/namespaces", "POST", {"namespace": ["sc"]})
    schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "double"},
        ],
    }
    code, staged = _req(
        f"{base}/v1/namespaces/sc/tables",
        "POST",
        {"name": "ctas", "schema": schema, "stage-create": True},
    )
    assert code == 200
    assert "metadata-location" not in staged  # staged, not live
    assert not catalog.table_exists("sc", "ctas")

    # committing WITHOUT assert-create → 404 (not a live table)
    try:
        _req(
            f"{base}/v1/transactions/commit",
            "POST",
            {
                "table-changes": [
                    {
                        "identifier": {"namespace": ["sc"], "name": "ctas"},
                        "requirements": [],
                        "updates": [],
                    }
                ]
            },
        )
        raise AssertionError("missing assert-create should 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404

    code, _ = _req(
        f"{base}/v1/transactions/commit",
        "POST",
        {
            "table-changes": [
                {
                    "identifier": {"namespace": ["sc"], "name": "ctas"},
                    "requirements": [{"type": "assert-create"}],
                    "updates": [
                        {"action": "set-properties", "updates": {"born": "txn"}}
                    ],
                }
            ]
        },
    )
    assert code == 204
    t = catalog.load_table("sc", "ctas")
    assert t.properties.get("born") == "txn"
    assert [f.name for f in t.schema.fields] == ["id", "v"]
    code, loaded = _req(f"{base}/v1/namespaces/sc/tables/ctas")
    assert code == 200 and "metadata-location" in loaded

    # assert-create against the NOW-EXISTING table → 409
    try:
        _req(
            f"{base}/v1/transactions/commit",
            "POST",
            {
                "table-changes": [
                    {
                        "identifier": {"namespace": ["sc"], "name": "ctas"},
                        "requirements": [{"type": "assert-create"}],
                        "updates": [],
                    }
                ]
            },
        )
        raise AssertionError("assert-create on existing should 409")
    except urllib.error.HTTPError as e:
        assert e.code == 409


def test_staged_create_commits_through_commit_table(spark, server):
    """The single-table CTAS handshake: stage-create, then commitTable
    on the staged identifier with assert-create materializes it."""
    catalog, srv, base = server
    _req(f"{base}/v1/namespaces", "POST", {"namespace": ["sc2"]})
    schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [{"id": 1, "name": "id", "required": False, "type": "long"}],
    }
    _req(
        f"{base}/v1/namespaces/sc2/tables",
        "POST",
        {"name": "t", "schema": schema, "stage-create": True},
    )
    code, out = _req(
        f"{base}/v1/namespaces/sc2/tables/t",
        "POST",
        {
            "requirements": [{"type": "assert-create"}],
            "updates": [{"action": "set-properties", "updates": {"k": "v"}}],
        },
    )
    assert code == 200 and "metadata-location" in out
    assert catalog.load_table("sc2", "t").properties.get("k") == "v"


def test_pyrest_writer_stacks_and_handles_replay(spark, server):
    """pyrest writer end-to-end at the unit level: two appends STACK
    (the second posts against the ref the first moved — this is the
    thin-client second-commit case that used to 409-loop because the
    mirror serves its own snapshot ids; _served_sid now accepts the
    id loadTable actually served), a stale replay of an old commit
    body 409s, and overwrite/partitioned refuse loudly."""
    import urllib.error

    from iceberg_metadata_pipeline_spark.ingest.pyrest_source import register

    catalog, srv, base = server
    _req(f"{base}/v1/namespaces", "POST", {"namespace": ["wr"]})
    df = spark.range(10).selectExpr("id", "CAST(id * 2.5 AS DOUBLE) AS v")
    catalog.create_table("wr", "t", df.schema)
    register(spark)

    df.where("id < 5").write.format("pyrest").option("url", base).mode(
        "append"
    ).save("wr.t")
    df.where("id >= 5").write.format("pyrest").option("url", base).mode(
        "append"
    ).save("wr.t")
    back = spark.read.format("pyrest").option("url", base).load("wr.t")
    assert sorted(r.id for r in back.collect()) == list(range(10))

    # stale replay: re-posting a commit with the OLD served ref id 409s
    code, loaded = _req(f"{base}/v1/namespaces/wr/tables/t")
    stale_sid = loaded["metadata"]["current-snapshot-id"]
    df.limit(1).write.format("pyrest").option("url", base).mode(
        "append"
    ).save("wr.t")  # moves the ref
    try:
        _req(
            f"{base}/v1/namespaces/wr/tables/t",
            "POST",
            {
                "requirements": [
                    {
                        "type": "assert-ref-snapshot-id",
                        "ref": "main",
                        "snapshot-id": 424242,  # neither metacat nor served
                    }
                ],
                "updates": [],
            },
        )
        raise AssertionError("stale ref should 409")
    except urllib.error.HTTPError as e:
        assert e.code == 409

    # refusals
    with pytest.raises(Exception, match="append only"):
        df.write.format("pyrest").option("url", base).mode(
            "overwrite"
        ).save("wr.t")
    with pytest.raises(Exception, match="does not match the table"):
        spark.range(3).selectExpr("id AS other").write.format(
            "pyrest"
        ).option("url", base).mode("append").save("wr.t")


def test_incremental_export_compaction_replace_diff(spark, tmp_path):
    """r11 verdict #6: a delete-free compaction exports as ONE
    replace-diff — untouched manifests carried VERBATIM (same file
    paths), affected manifests rewritten to their survivors (EXISTING,
    original sequence numbers), rewrite outputs in one new manifest —
    instead of a full metadata rewrite. Delete-carrying compactions
    keep the conservative full path (pinned in test_round11.py)."""
    import os

    from iceberg_metadata_pipeline_spark.catalog import avro_io
    from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
        export_iceberg_table,
        read_iceberg_table,
    )
    from iceberg_metadata_pipeline_spark.catalog.metacat import DataFileEntry
    from iceberg_metadata_pipeline_spark.ingest.pyice_source import register

    catalog = Catalog(spark, str(tmp_path / "wh"))
    t = catalog.create_table("nyc", "cpt", spark.range(1).selectExpr("id").schema)
    dest = str(tmp_path / "ice")
    # three incremental appends → three data manifests in the mirror
    # (append A writes TWO files so the partial-survivor path is hit)
    t.append_dataframe(
        spark.range(0, 4).selectExpr("id").repartitionByRange(2, "id")
    )
    export_iceberg_table(t.refresh(), dest)
    t.append_dataframe(spark.range(10, 14).selectExpr("id").coalesce(1))
    export_iceberg_table(t.refresh(), dest)
    t.append_dataframe(spark.range(20, 24).selectExpr("id").coalesce(1))
    export_iceberg_table(t.refresh(), dest)

    def manifests(dest):
        info = read_iceberg_table(dest, decode_dvs=False)
        import json as _json

        with open(info.metadata_path) as fh:
            md = _json.load(fh)
        snap = next(
            s
            for s in md["snapshots"]
            if int(s["snapshot-id"]) == int(md["current-snapshot-id"])
        )
        _, _, rows = avro_io.read_container(snap["manifest-list"])
        return {r["manifest_path"]: r for r in rows}

    before = manifests(dest)
    assert len(before) == 3

    # compact: one file of append A + the append-B file → one new file;
    # the other A file and the append-C manifest are untouched
    files = {os.path.abspath(f.path): f for f in t.snapshot_files()}
    a_files = sorted(p for p in files if files[p].record_count == 2)
    b_file = next(
        p for p in files if files[p].record_count == 4
        and sorted(
            r.id for r in spark.read.parquet(p).collect()
        )[0] == 10
    )
    victims = {a_files[0], b_file}
    merged = str(tmp_path / "merged")
    spark.read.parquet(*sorted(victims)).coalesce(1).write.parquet(merged)
    import glob as _glob

    mfile = _glob.glob(merged + "/*.parquet")[0]
    import pyarrow.parquet as pq

    t.replace_files(
        [
            DataFileEntry(
                path=mfile,
                record_count=pq.read_metadata(mfile).num_rows,
                file_size_bytes=os.path.getsize(mfile),
                format="PARQUET",
                partition={},
            )
        ],
        victims,
        operation="replace",
    )
    export_iceberg_table(t.refresh(), dest)
    after = manifests(dest)

    # the untouched append-C manifest path is carried verbatim
    untouched_carried = set(before) & set(after)
    assert untouched_carried, "no manifest carried verbatim"
    # the partially-affected manifest was rewritten: a survivor entry
    # exists with status=EXISTING and its ORIGINAL sequence number
    survivor_path = a_files[1]
    surv_entries = []
    for mp in set(after) - set(before):
        _, _, es = avro_io.read_container(mp)
        surv_entries.extend(es)
    surv = [
        e
        for e in surv_entries
        if os.path.abspath(e["data_file"]["file_path"]) == survivor_path
    ]
    assert surv and int(surv[0]["status"]) == 0
    assert int(surv[0]["sequence_number"]) == int(files[survivor_path].seq)

    # the read is exact
    register(spark)
    back = spark.read.format("pyice").load(dest)
    assert sorted(r.id for r in back.collect()) == sorted(
        list(range(0, 4)) + list(range(10, 14)) + list(range(20, 24))
    )
    # and the summary says replace, not a full rewrite
    info = read_iceberg_table(dest, decode_dvs=False)
    import json as _json

    with open(info.metadata_path) as fh:
        md = _json.load(fh)
    snap = next(
        s
        for s in md["snapshots"]
        if int(s["snapshot-id"]) == int(md["current-snapshot-id"])
    )
    assert snap["summary"]["operation"] == "replace"


def test_pyrest_stream_tails_appends_and_refuses_removals(spark, server):
    """The pyrest STREAM tailer: offsets are served snapshot ids, each
    batch plans both ends server-side and emits only the files the
    range added; a range that removes files refuses loudly unless
    ignoreDeletes. Also pins the served-id time travel the tailer
    rides on (incremental mirror ids resolve via the
    metacat-snapshot-id summary mapping)."""
    import tempfile

    from iceberg_metadata_pipeline_spark.ingest.pyrest_source import register

    catalog, srv, base = server
    _req(f"{base}/v1/namespaces", "POST", {"namespace": ["st"]})
    df = spark.range(6).selectExpr("id")
    t = catalog.create_table("st", "tail", df.schema)
    t.append_dataframe(df.where("id < 3").coalesce(1))
    # loadTable between commits → the mirror history is incremental
    _req(f"{base}/v1/namespaces/st/tables/tail")
    t.append_dataframe(df.where("id >= 3").coalesce(1))
    register(spark)

    out = tempfile.mkdtemp(prefix="pyrest-tail-") + "/sink"
    q = (
        spark.readStream.format("pyrest")
        .option("url", base)
        .option("table", "st.tail")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="pyrest-ck-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == list(
        range(6)
    )

    # a compaction between offsets removes files → the next drain refuses
    t.rewrite_data_files()
    ck2 = tempfile.mkdtemp(prefix="pyrest-ck2-")
    out2 = tempfile.mkdtemp(prefix="pyrest-tail2-") + "/sink"
    first = (
        spark.readStream.format("pyrest")
        .option("url", base)
        .option("table", "st.tail")
        .load()
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", ck2)
        .trigger(availableNow=True)
        .start()
    )
    first.awaitTermination(120)  # baseline drain of the compacted state
    t.append_dataframe(spark.range(10, 12).selectExpr("id").coalesce(1))
    t.rewrite_data_files()  # removes files relative to the checkpoint
    resumed = (
        spark.readStream.format("pyrest")
        .option("url", base)
        .option("table", "st.tail")
        .load()
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", ck2)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="tails APPENDS"):
        resumed.awaitTermination(120)


def test_pyrest_writer_partitioned_identity(spark, server):
    """Round-12 continuation: the pyrest writer routes IDENTITY
    partition tuples — tasks split rows by the source columns (string
    + date here, covering the typed manifest encodings), the posted
    manifest carries spec-typed r102 values, and the server's scan
    planning prunes the appended files by partition exactly like
    warehouse-written ones. Non-identity transforms still refuse."""
    import json as _json

    from pyspark.sql import types as T

    from iceberg_metadata_pipeline_spark.catalog.partitioning import (
        PartitionField,
    )
    from iceberg_metadata_pipeline_spark.ingest.pyrest_source import register

    catalog, srv, base = server
    catalog.ensure_namespace("wp")
    catalog.create_table(
        "wp",
        "t",
        T.StructType(
            [
                T.StructField("id", T.LongType(), True),
                T.StructField("g", T.StringType(), True),
                T.StructField("d", T.DateType(), True),
            ]
        ),
        partition_spec=[
            PartitionField("g", "identity"),
            PartitionField("d", "identity"),
        ],
    )
    register(spark)
    df = spark.sql(
        "SELECT id, IF(id % 2 = 0, 'a', 'b') AS g,"
        " IF(id < 4, DATE'2024-01-01', DATE'2024-01-02') AS d"
        " FROM RANGE(8)"
    )
    df.write.format("pyrest").option("url", base).mode("append").save("wp.t")

    back = spark.read.format("pyrest").option("url", base).load("wp.t")
    assert sorted((r.id, r.g, str(r.d)) for r in back.collect()) == sorted(
        (r.id, r.g, str(r.d)) for r in df.collect()
    )

    # the appended files carry partition tuples the server prunes by:
    # an equality filter on g plans only g='a' files
    flt = {"type": "eq", "term": "g", "value": "a"}
    code, out = _req(
        f"{base}/v1/namespaces/wp/tables/t/plan",
        "POST",
        {"filter": flt},
    )
    assert code == 200
    tasks = out["file-scan-tasks"]
    assert tasks, "plan should return the g='a' files"
    assert all(t_["data-file"]["partition"][0] == "a" for t_ in tasks)
    n_all = len(
        _req(f"{base}/v1/namespaces/wp/tables/t/plan", "POST", {})[1][
            "file-scan-tasks"
        ]
    )
    assert len(tasks) < n_all, "partition filter should prune files"
    # metacat's own registry records the tuples (string + ISO date)
    t = catalog.load_table("wp", "t").refresh()
    parts = {
        (f.partition.get("g"), f.partition.get("d"))
        for f in t.snapshot_files()
    }
    assert parts == {
        ("a", "2024-01-01"),
        ("a", "2024-01-02"),
        ("b", "2024-01-01"),
        ("b", "2024-01-02"),
    }

    # pyrest-side filtered read composes (residual re-applied in-task)
    filt = (
        spark.read.format("pyrest")
        .option("url", base)
        .option("filter", _json.dumps(flt))
        .load("wp.t")
    )
    assert sorted(r.id for r in filt.collect()) == [0, 2, 4, 6]

    # a bucket-partitioned table: the mirror export serves only the
    # IDENTITY projection of the spec (iceberg_format scope bound), so
    # the thin client sees an empty spec and writes land with no
    # partition tuple — entries stay unstamped (spec_id None) and are
    # NEVER partition-pruned: conservative, reads stay exact. (The
    # writer's non-identity refusal guards the day the server serves
    # such transforms.)
    catalog.create_table(
        "wp",
        "tb",
        T.StructType(
            [
                T.StructField("id", T.LongType(), True),
                T.StructField("g", T.StringType(), True),
            ]
        ),
        partition_spec=[PartitionField("g", "bucket[4]")],
    )
    spark.sql(
        "SELECT CAST(1 AS BIGINT) AS id, 'x' AS g"
    ).write.format("pyrest").option("url", base).mode("append").save("wp.tb")
    tb = catalog.load_table("wp", "tb").refresh()
    assert [(f.partition, f.spec_id) for f in tb.snapshot_files()] == [
        ({}, None)
    ]
    back_b = spark.read.format("pyrest").option("url", base).load("wp.tb")
    assert [(r.id, r.g) for r in back_b.collect()] == [(1, "x")]
