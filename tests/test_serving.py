"""Multi-client SQL serving: N concurrent sessions against one engine
process (the reference's Thrift-server topology, docker-compose.yml:
48-65). What must hold: per-session temp-view isolation (no state
bleed), shared warehouse state THROUGH disk (commits visible across
sessions), concurrent writers resolving via the CAS protocol, and a
client error never tearing down the server."""

from __future__ import annotations

import threading

import pytest

from iceberg_metadata_pipeline_spark.serving import SQLClient, SQLServer


@pytest.fixture
def server(spark, tmp_path):
    srv = SQLServer(spark, str(tmp_path / "wh")).start()
    yield srv
    srv.stop()


def test_concurrent_sessions_ddl_dml_reads(server):
    """Four clients in parallel threads, each with its own table and an
    IDENTICALLY-NAMED temp view: every client sees its own view content
    (newSession isolation) and its own table rows; all tables coexist in
    the shared warehouse."""
    n_clients = 4
    errors: list[Exception] = []

    def client_work(i: int) -> None:
        try:
            c = SQLClient(server.host, server.port)
            c.sql(f"CREATE TABLE nyc.cli{i} (id BIGINT, v DOUBLE)")
            c.sql(f"INSERT INTO nyc.cli{i} VALUES (1, {i}.0), (2, {i}.5)")
            c.sql(f"UPDATE nyc.cli{i} SET v = v + 100 WHERE id = 2")
            # same view name in every session — isolation or bust
            c.sql(f"CREATE TEMPORARY VIEW sess_view AS SELECT {i} AS me")
            assert c.sql("SELECT me FROM sess_view") == [{"me": i}]
            rows = c.sql(f"SELECT id, v FROM nyc.cli{i} ORDER BY id")
            assert rows == [{"id": 1, "v": float(i)}, {"id": 2, "v": i + 100.5}]
            c.close()
        except Exception as exc:  # noqa: BLE001 — surface to the main thread
            errors.append(exc)

    threads = [threading.Thread(target=client_work, args=(i,)) for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert errors == []

    # all four tables landed in the one shared warehouse
    c = SQLClient(server.host, server.port)
    for i in range(n_clients):
        assert c.sql(f"SELECT COUNT(*) AS n FROM nyc.cli{i}") == [{"n": 2}]
    c.close()


def test_concurrent_writers_same_table_cas(server):
    """Concurrent INSERTs from different sessions into ONE table resolve
    through commit CAS + append rebase — nothing lost, nothing doubled."""
    c0 = SQLClient(server.host, server.port)
    c0.sql("CREATE TABLE nyc.shared (id BIGINT, who BIGINT)")
    n_writers, per_writer = 4, 3
    errors: list[Exception] = []

    def writer(i: int) -> None:
        try:
            c = SQLClient(server.host, server.port)
            for j in range(per_writer):
                c.sql(f"INSERT INTO nyc.shared VALUES ({i * 100 + j}, {i})")
            c.close()
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert errors == []
    rows = c0.sql("SELECT id FROM nyc.shared ORDER BY id")
    assert len(rows) == n_writers * per_writer
    assert len({r["id"] for r in rows}) == n_writers * per_writer
    c0.close()


def test_cross_session_visibility_through_warehouse(server):
    """A table committed in session A is immediately queryable from
    session B (shared warehouse), while A's temp views are NOT."""
    a = SQLClient(server.host, server.port)
    b = SQLClient(server.host, server.port)
    a.sql("CREATE TABLE nyc.visib (id BIGINT)")
    a.sql("INSERT INTO nyc.visib VALUES (42)")
    a.sql("CREATE TEMPORARY VIEW private_view AS SELECT 1 AS x")
    assert b.sql("SELECT id FROM nyc.visib") == [{"id": 42}]
    with pytest.raises(RuntimeError):
        b.sql("SELECT * FROM private_view")
    # an error does not kill the session: b can keep querying
    assert b.sql("SELECT COUNT(*) AS n FROM nyc.visib") == [{"n": 1}]
    a.close()
    b.close()


def test_result_limit_and_unknown_session(server):
    c = SQLClient(server.host, server.port)
    c.sql("CREATE TABLE nyc.lim (id BIGINT)")
    vals = ", ".join(f"({i})" for i in range(50))
    c.sql(f"INSERT INTO nyc.lim VALUES {vals}")
    assert len(c.sql("SELECT id FROM nyc.lim", limit=7)) == 7
    with pytest.raises(RuntimeError, match="no open session"):
        c._request({"op": "sql", "session": "9999", "sql": "SELECT 1"})
    c.close()


def test_cancel_running_statement_from_another_connection(spark, tmp_path):
    """A runaway statement is cancellable by session id from a second
    connection (the Thrift cancel-operation pattern): the blocked sql op
    errors promptly instead of running to completion, and the canceled
    session keeps working afterwards."""
    import threading
    import time

    from iceberg_metadata_pipeline_spark.serving.server import SQLClient, SQLServer

    server = SQLServer(spark, str(tmp_path / "wh")).start()
    try:
        victim = SQLClient(server.host, server.port)
        other = SQLClient(server.host, server.port)

        errors: list[str] = []

        def run_big():
            try:
                # cartesian over ranges: minutes of work if not canceled
                victim.sql(
                    "SELECT SUM(CAST(a.id AS DOUBLE) * b.id) AS s "
                    "FROM range(3000000) a, range(3000000) b"
                )
            except RuntimeError as exc:
                errors.append(str(exc))

        t = threading.Thread(target=run_big)
        t.start()
        time.sleep(3)  # let the job actually start running
        other.cancel(victim.session_id)
        t.join(timeout=60)
        assert not t.is_alive(), "cancel did not interrupt the statement"
        assert errors and "cancel" in errors[0].lower()

        # the session survives cancellation
        assert victim.sql("SELECT 1 AS ok")[0]["ok"] == 1
        victim.close()
        other.close()
    finally:
        server.stop()


def test_set_conf_is_session_isolated_and_cache_table(spark, tmp_path):
    """SET lands in the issuing session's conf only (newSession isolation
    — what a Thrift server gives each JDBC connection), and CACHE TABLE
    registers a reusable cached temp view."""
    from iceberg_metadata_pipeline_spark.serving.server import SQLClient, SQLServer

    server = SQLServer(spark, str(tmp_path / "wh")).start()
    try:
        a = SQLClient(server.host, server.port)
        b = SQLClient(server.host, server.port)
        a.sql("SET spark.sql.session.timeZone = America/New_York")
        got_a = a.sql("SET spark.sql.session.timeZone")[0]["value"]
        got_b = b.sql("SET spark.sql.session.timeZone")[0]["value"]
        assert got_a == "America/New_York"
        assert got_b == "UTC"  # b's session untouched

        a.sql("CREATE TABLE nyc.ct (id BIGINT)")
        a.sql("INSERT INTO nyc.ct VALUES (1), (2), (3)")
        a.sql("CACHE TABLE hot AS SELECT id FROM nyc.ct WHERE id > 1")
        assert a.sql("SELECT COUNT(*) AS n FROM hot")[0]["n"] == 2
        a.sql("UNCACHE TABLE hot")
        a.close()
        b.close()
    finally:
        server.stop()


def test_full_statement_surface_over_the_wire(server):
    """The round-3 statement families all work through the serving
    protocol, not just via direct catalog_sql calls: ANALYZE, DESCRIBE
    EXTENDED, SHOW PARTITIONS/NAMESPACES, EXPLAIN, metadata tables."""
    c = SQLClient(server.host, server.port)
    c.sql("CREATE NAMESPACE wire")
    c.sql(
        "CREATE TABLE wire.t (id BIGINT, region STRING) PARTITIONED BY (region)"
    )
    c.sql("INSERT INTO wire.t VALUES (1, 'eu'), (2, 'us'), (3, 'eu')")

    stats = c.sql("ANALYZE TABLE wire.t COMPUTE STATISTICS FOR COLUMNS id")
    assert stats == [{"column_name": "id", "row_count": 3, "null_count": 0, "ndv": 3}]

    parts = {r["partition"]: r["record_count"] for r in c.sql("SHOW PARTITIONS wire.t")}
    assert parts == {'{"region": "eu"}': 2, '{"region": "us"}': 1}

    desc = {r["col_name"]: r["data_type"] for r in c.sql("DESCRIBE EXTENDED wire.t")}
    assert desc["Partition Spec"] == "identity(region)"

    plan = c.sql("EXPLAIN SELECT id FROM wire.t WHERE id = 1")[0]["plan"]
    assert "Physical Plan" in plan

    snaps = c.sql("SELECT COUNT(*) AS n FROM wire.t.snapshots")
    assert snaps == [{"n": 1}]
    assert {r["namespace"] for r in c.sql("SHOW NAMESPACES")} >= {"wire"}
    c.close()


def test_session_variables_and_wap_branch_isolated_per_session(spark, tmp_path):
    """Spark 4 session variables (DECLARE/SET VAR) and the WAP-branch
    conf are per-connection state: one client's variable or audit branch
    never leaks into another's reads — the Thrift-session semantics the
    reference's deployment gives each JDBC connection."""
    from iceberg_metadata_pipeline_spark.serving.server import SQLClient, SQLServer

    server = SQLServer(spark, str(tmp_path / "wh")).start()
    try:
        a = SQLClient(server.host, server.port)
        b = SQLClient(server.host, server.port)
        # session variables are per-session
        a.sql("DECLARE OR REPLACE VARIABLE cutoff INT DEFAULT 10")
        a.sql("SET VAR cutoff = 42")
        assert a.sql("SELECT cutoff AS v")[0]["v"] == 42
        try:
            b.sql("SELECT cutoff AS v")
            leaked = True
        except Exception:
            leaked = False
        assert not leaked, "session variable visible across connections"

        # WAP branch routing is per-session: a's staged write is invisible to b
        a.sql("CREATE TABLE nyc.wt (id BIGINT)")
        a.sql("INSERT INTO nyc.wt VALUES (1)")
        a.sql("SET spark.wap.branch = audit")
        a.sql("INSERT INTO nyc.wt VALUES (2)")
        assert a.sql("SELECT COUNT(*) AS n FROM nyc.wt")[0]["n"] == 2  # branch view
        assert b.sql("SELECT COUNT(*) AS n FROM nyc.wt")[0]["n"] == 1  # main view
        a.close()
        b.close()
    finally:
        server.stop()
