"""HiveServer2 Thrift wire protocol: a real TBinaryProtocol frame
conversation against the serving engine (the reference's primary client
path — JDBC/PyHive into HiveThriftServer2, entrypoint-spark.sh:73,
docker-compose.yml:48-65). The client here hand-rolls the same bytes
PyHive emits (no thrift package in this container), so every assertion
below is a genuine wire round-trip: strict binary message headers,
TCLIService structs, column-based TRowSet with null bitmasks."""

from __future__ import annotations

import socket
import struct
import threading

import pytest

from iceberg_metadata_pipeline_spark.serving import HS2Client, HiveServer2Front
from iceberg_metadata_pipeline_spark.serving import thrift_proto as tp


@pytest.fixture
def front(spark, tmp_path):
    f = HiveServer2Front(spark, str(tmp_path / "wh")).start()
    yield f
    f.stop()


def _client(front) -> HS2Client:
    return HS2Client(front.host, front.port)


def test_open_execute_fetch_close_roundtrip(front):
    c = _client(front)
    assert c.server_protocol == 5  # V6 column-based rowsets negotiated
    names, rows = c.query(
        "SELECT id, CAST(id * 1.5 AS DOUBLE) AS v, CONCAT('r', id) AS s "
        "FROM RANGE(5) ORDER BY id"
    )
    assert names == ["id", "v", "s"]
    assert rows == [(i, i * 1.5, f"r{i}") for i in range(5)]
    c.close()


def test_result_schema_type_ids(front):
    c = _client(front)
    op = c.execute(
        "SELECT CAST(1 AS INT) AS i, CAST(2 AS BIGINT) AS l, "
        "CAST(3.5 AS DOUBLE) AS d, 'x' AS s, true AS b, "
        "CAST(9.25 AS DECIMAL(10,2)) AS dec, DATE'2024-01-02' AS dt"
    )
    schema = c.result_schema(op)
    # TTypeId values from TCLIService.thrift
    assert schema == [
        ("i", 3), ("l", 4), ("d", 6), ("s", 7), ("b", 0), ("dec", 15), ("dt", 17),
    ]
    cols, more = c.fetch(op)
    assert more is False
    assert cols[0] == [1] and cols[1] == [2] and cols[2] == [3.5]
    assert cols[3] == ["x"] and cols[4] == [True]
    # decimal and date ride stringVal on the wire (HS2 convention)
    assert cols[5] == ["9.25"] and cols[6] == ["2024-01-02"]
    c.close_operation(op)
    c.close()


def test_null_bitmask_per_column(front):
    c = _client(front)
    _, rows = c.query(
        "SELECT * FROM VALUES (1, 'a'), (NULL, 'b'), (3, NULL), (NULL, NULL) "
        "AS t(x, y)"
    )
    assert sorted(rows, key=str) == sorted(
        [(1, "a"), (None, "b"), (3, None), (None, None)], key=str
    )
    c.close()


def test_incremental_paging_has_more_rows(front):
    c = _client(front)
    op = c.execute("SELECT id FROM RANGE(25) ORDER BY id")
    got = []
    pages = 0
    while True:
        cols, more = c.fetch(op, max_rows=10)
        got.extend(cols[0])
        pages += 1
        if not more:
            break
    assert got == list(range(25))
    assert pages >= 3  # 10 + 10 + 5: genuinely paged, not one blob
    c.close_operation(op)
    c.close()


def test_complex_types_render_as_json_strings(front):
    c = _client(front)
    op = c.execute(
        "SELECT array(1, 2) AS a, map('k', 7) AS m, named_struct('f', 1) AS st"
    )
    assert [tid for _, tid in c.result_schema(op)] == [10, 11, 12]
    cols, _ = c.fetch(op)
    assert cols[0] == ["[1,2]"]
    assert cols[1] == ['{"k":7}']
    assert cols[2] == ['{"f":1}']
    c.close_operation(op)
    c.close()


def test_binary_column_rides_binary_val(front):
    c = _client(front)
    _, rows = c.query("SELECT CAST('ab' AS BINARY) AS b")
    assert rows == [(b"ab",)]
    c.close()


def test_sql_error_surfaces_as_tstatus_not_disconnect(front):
    c = _client(front)
    with pytest.raises(RuntimeError, match="(?i)parse|syntax"):
        c.execute("SELEKT 1")
    # connection still alive and usable after the error
    _, rows = c.query("SELECT 1 AS one")
    assert rows == [(1,)]
    c.close()


def test_ddl_dml_through_thrift_shared_warehouse(front):
    c1 = _client(front)
    c1.execute("CREATE TABLE nyc.hs2_t (id BIGINT, v DOUBLE)")
    c1.execute("INSERT INTO nyc.hs2_t VALUES (1, 1.5), (2, 2.5)")
    c1.execute("UPDATE nyc.hs2_t SET v = v + 10 WHERE id = 2")
    # a SECOND connection sees the committed state through disk
    c2 = _client(front)
    _, rows = c2.query("SELECT id, v FROM nyc.hs2_t ORDER BY id")
    assert rows == [(1, 1.5), (2, 12.5)]
    c1.close()
    c2.close()


def test_temp_view_isolation_between_thrift_sessions(front):
    c1, c2 = _client(front), _client(front)
    c1.execute("CREATE TEMPORARY VIEW hs2_view AS SELECT 1 AS me")
    c2.execute("CREATE TEMPORARY VIEW hs2_view AS SELECT 2 AS me")
    assert c1.query("SELECT me FROM hs2_view")[1] == [(1,)]
    assert c2.query("SELECT me FROM hs2_view")[1] == [(2,)]
    c1.close()
    c2.close()


def test_concurrent_thrift_clients(front):
    errors: list[Exception] = []

    def work(i: int) -> None:
        try:
            c = _client(front)
            _, rows = c.query(f"SELECT {i} * id AS v FROM RANGE(3) ORDER BY id")
            assert rows == [(0,), (i,), (2 * i,)]
            c.close()
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert errors == []


def test_operation_status_and_getinfo(front):
    c = _client(front)
    op = c.execute("SELECT 1 AS one")
    assert c.operation_state(op) == 2  # FINISHED_STATE
    resp = c.call("GetInfo", {1: (tp.STRUCT, c._session), 2: (tp.I32, 13)})
    HS2Client._check(resp)
    assert resp[2][1][1][1] == b"Spark SQL"
    c.close_operation(op)
    c.close()


def test_cancel_operation(front):
    c = _client(front)
    op = c.execute("SELECT id FROM RANGE(10)")
    c.cancel_operation(op)  # must answer SUCCESS, not hang or kill the server
    _, rows = c.query("SELECT 2 AS two")
    assert rows == [(2,)]
    c.close()


def test_pre_v6_protocol_refused_at_open(front):
    sock = socket.create_connection((front.host, front.port))
    rfile = sock.makefile("rb")
    msg = tp.write_message(
        "OpenSession", tp.MSG_CALL, 1,
        {1: (tp.STRUCT, {1: (tp.I32, 3), 2: (tp.STRING, "u"), 3: (tp.STRING, "")})},
    )
    sock.sendall(msg)
    reader = tp.ThriftReader(rfile)
    name, mtype, _ = reader.read_message_begin()
    assert (name, mtype) == ("OpenSession", tp.MSG_REPLY)
    body = reader.read_value(tp.STRUCT)
    status = body[0][1][1][1]
    assert status[1][1] == 3  # ERROR_STATUS
    assert b"V6" in status[5][1]
    sock.close()


def test_unknown_method_is_application_exception(front):
    c = _client(front)
    with pytest.raises(RuntimeError, match="TApplicationException"):
        c.call("RenewDelegationToken", {1: (tp.STRUCT, c._session)})
    # the connection survives the exception frame
    assert c.query("SELECT 3 AS v")[1] == [(3,)]
    c.close()


def test_get_schemas_tables_columns_browsing(front):
    c = _client(front)
    c.execute("CREATE TABLE nyc.browse_a (id BIGINT, name STRING)")
    c.execute("CREATE TABLE nyc.browse_b (x DOUBLE)")

    def browse(call, extra):
        resp = c.call(call, {1: (tp.STRUCT, c._session), **extra})
        HS2Client._check(resp)
        op = resp[2][1]
        names = [n for n, _ in c.result_schema(op)]
        rows = c.fetch_all_rows(op)
        c.close_operation(op)
        return names, rows

    names, rows = browse("GetSchemas", {})
    assert names == ["TABLE_SCHEM", "TABLE_CATALOG"]
    assert ("nyc", "spark") in rows

    names, rows = browse("GetTables", {3: (tp.STRING, "nyc")})
    assert names[:4] == ["TABLE_CAT", "TABLE_SCHEM", "TABLE_NAME", "TABLE_TYPE"]
    tnames = [r[2] for r in rows]
    assert "browse_a" in tnames and "browse_b" in tnames

    # LIKE pattern: only browse_a
    _, rows = browse("GetTables", {3: (tp.STRING, "nyc"), 4: (tp.STRING, "browse!_a".replace("!", "%"))})
    assert [r[2] for r in rows] == ["browse_a"]

    names, rows = browse(
        "GetColumns", {3: (tp.STRING, "nyc"), 4: (tp.STRING, "browse_a")}
    )
    assert names == [
        "TABLE_CAT", "TABLE_SCHEM", "TABLE_NAME", "COLUMN_NAME",
        "DATA_TYPE", "TYPE_NAME", "NULLABLE", "ORDINAL_POSITION",
    ]
    cols = {r[3]: (r[4], r[5], r[7]) for r in rows}
    assert cols["id"] == (4, "bigint", 1)  # TTypeId BIGINT=4, position 1
    assert cols["name"] == (7, "string", 2)
    c.close()


def test_closed_session_invalidates_handles(front):
    c = _client(front)
    op = c.execute("SELECT 1 AS one")
    session = c._session
    c.close()
    c2 = _client(front)
    # stale handles from the closed session must be rejected, not serve data
    with pytest.raises(RuntimeError, match="invalid operation handle"):
        c2.fetch(op)
    with pytest.raises(RuntimeError, match="invalid session handle"):
        resp = c2.call(
            "ExecuteStatement",
            {1: (tp.STRUCT, session), 2: (tp.STRING, "SELECT 1")},
        )
        HS2Client._check(resp)
    c2.close()


def test_wire_bytes_strict_header(front):
    """The first reply frame on the socket is a strict-binary header:
    0x8001 version, REPLY type — byte-level protocol conformance."""
    sock = socket.create_connection((front.host, front.port))
    msg = tp.write_message(
        "OpenSession", tp.MSG_CALL, 7,
        {1: (tp.STRUCT, {1: (tp.I32, 5), 2: (tp.STRING, "u"), 3: (tp.STRING, "")})},
    )
    sock.sendall(msg)
    head = b""
    while len(head) < 4:
        head += sock.recv(4 - len(head))
    (header,) = struct.unpack(">I", head)
    assert header & 0xFFFF0000 == 0x80010000
    assert header & 0xFF == tp.MSG_REPLY
    sock.close()


def test_connect_time_jdbc_metadata_calls(front):
    """GetCatalogs / GetTableTypes / GetTypeInfo / GetFunctions — the
    remaining connect-time calls a JDBC client (beeline/DBeaver) fires
    right after OpenSession."""
    c = _client(front)

    def browse(call, extra=None):
        resp = c.call(call, {1: (tp.STRUCT, c._session), **(extra or {})})
        HS2Client._check(resp)
        op = resp[2][1]
        names = [n for n, _ in c.result_schema(op)]
        rows = c.fetch_all_rows(op)
        c.close_operation(op)
        return names, rows

    names, rows = browse("GetCatalogs")
    assert names == ["TABLE_CAT"] and rows == [("spark",)]

    names, rows = browse("GetTableTypes")
    assert names == ["TABLE_TYPE"] and rows == [("TABLE",), ("VIEW",)]

    names, rows = browse("GetTypeInfo")
    assert names[0] == "TYPE_NAME" and names[1] == "DATA_TYPE"
    assert len(names) == 18  # full java.sql.DatabaseMetaData.getTypeInfo shape
    by_name = {r[0]: r for r in rows}
    assert by_name["BIGINT"][1] == -5  # java.sql.Types.BIGINT
    assert by_name["STRING"][1] == 12  # VARCHAR
    assert by_name["DECIMAL"][5] == "precision,scale"  # CREATE_PARAMS

    names, rows = browse("GetFunctions", {4: (tp.STRING, "xx%")})
    assert names == [
        "FUNCTION_CAT", "FUNCTION_SCHEM", "FUNCTION_NAME",
        "REMARKS", "FUNCTION_TYPE", "SPECIFIC_NAME",
    ]
    fns = [r[2] for r in rows]
    assert "xxhash64" in fns
    assert all(f.startswith("xx") for f in fns)
    c.close()
