"""HiveServer2-compatible Thrift serving front (TCLIService subset).

This is the wire-compatible counterpart of the reference's primary client
path: a JDBC/PyHive client connecting to HiveThriftServer2
(entrypoint-spark.sh:73; Superset's PyHive dialect,
docker-compose.yml:48-65). The session/concurrency semantics live in
``SQLServingEngine`` (server.py); this module speaks the real protocol —
TBinaryProtocol strict, unframed (NOSASL transport), the TCLIService
structs from Apache Hive's public TCLIService.thrift, column-based
TRowSet (protocol V6+, what PyHive/beeline/DBeaver negotiate):

  OpenSession / ExecuteStatement / GetOperationStatus /
  GetResultSetMetadata / FetchResults / CancelOperation /
  CloseOperation / CloseSession / GetInfo

Results stream INCREMENTALLY: ExecuteStatement plans the query,
FetchResults pulls pages through ``toLocalIterator`` — the engine never
materializes a full result set for a paging client (the same
incremental-delivery contract HiveThriftServer2 gives JDBC cursors).

Catalog browsing (GetSchemas/GetTables/GetColumns — the JDBC/Superset
schema-discovery path) returns real JDBC-shaped result sets through the
same operation-handle/FetchResults flow as queries, with TCLIService
LIKE patterns ('%'/'_') honored.

Scope boundaries (documented, not hidden): protocol versions below V6
are refused at OpenSession (row-based TRowSet is pre-2013 legacy);
SASL/Kerberos transports are not offered (the reference itself runs
NOSASL behind the compose network).

``HS2Client`` is a from-scratch wire client used by the tests: it
exercises the exact byte protocol an off-the-shelf client emits (the
``thrift``/PyHive packages aren't installable in this container), so the
pytest round-trip is a real Thrift frame conversation, not a mock.
"""

from __future__ import annotations

import json
import re
import socket
import socketserver
import struct
import threading
import uuid

from pyspark.sql import SparkSession

from iceberg_metadata_pipeline_spark.serving import thrift_proto as tp
from iceberg_metadata_pipeline_spark.serving.server import SQLServingEngine

# --- TCLIService enums (public TCLIService.thrift) -------------------------

PROTOCOL_V6 = 5  # HIVE_CLI_SERVICE_PROTOCOL_V6: column-based TRowSet

STATUS_SUCCESS = 0
STATUS_ERROR = 3

OP_STATE_FINISHED = 2
OP_STATE_ERROR = 5

OP_TYPE_EXECUTE_STATEMENT = 0

FETCH_NEXT = 0

# TTypeId values
_TYPE_ID = {
    "boolean": 0, "tinyint": 1, "smallint": 2, "int": 3, "bigint": 4,
    "float": 5, "double": 6, "string": 7, "timestamp": 8, "binary": 9,
    "array": 10, "map": 11, "struct": 12, "decimal": 15, "void": 16,
    "date": 17, "timestamp_ntz": 8,
}

# TColumn union field id + element wire type per category
_COL_BOOL, _COL_BYTE, _COL_I16, _COL_I32, _COL_I64 = 1, 2, 3, 4, 5
_COL_DOUBLE, _COL_STRING, _COL_BINARY = 6, 7, 8

_CONTAINER = {
    "boolean": (_COL_BOOL, tp.BOOL, False),
    "tinyint": (_COL_BYTE, tp.BYTE, 0),
    "smallint": (_COL_I16, tp.I16, 0),
    "int": (_COL_I32, tp.I32, 0),
    "bigint": (_COL_I64, tp.I64, 0),
    "float": (_COL_DOUBLE, tp.DOUBLE, 0.0),
    "double": (_COL_DOUBLE, tp.DOUBLE, 0.0),
    "binary": (_COL_BINARY, tp.STRING, b""),
    # everything else rides stringVal (HS2 renders decimals, dates,
    # timestamps, and complex types as strings on the wire)
}


def _base_type(spark_type: str) -> str:
    return spark_type.split("(")[0].split("<")[0].strip()


def _status_ok() -> tuple[int, dict]:
    return (tp.STRUCT, {1: (tp.I32, STATUS_SUCCESS)})


def _status_error(message: str, sql_state: str = "42000") -> tuple[int, dict]:
    return (
        tp.STRUCT,
        {
            1: (tp.I32, STATUS_ERROR),
            3: (tp.STRING, sql_state),
            4: (tp.I32, 1),
            5: (tp.STRING, message),
        },
    )


def _handle(guid: bytes, secret: bytes = b"\x00" * 16) -> tuple[int, dict]:
    return (
        tp.STRUCT,
        {1: (tp.STRUCT, {1: (tp.STRING, guid), 2: (tp.STRING, secret)})},
    )


def _op_handle(guid: bytes) -> tuple[int, dict]:
    return (
        tp.STRUCT,
        {
            1: (tp.STRUCT, {1: (tp.STRING, guid), 2: (tp.STRING, b"\x00" * 16)}),
            2: (tp.I32, OP_TYPE_EXECUTE_STATEMENT),
            3: (tp.BOOL, True),
        },
    )


def _guid_of(struct_fields: dict) -> bytes:
    """Extract THandleIdentifier.guid from a {Session,Operation}Handle."""
    ident = struct_fields[1][1]
    return ident[1][1]


class _Operation:
    def __init__(self, session_id: str, df) -> None:
        self.session_id = session_id
        self.df = df
        self.schema = df.schema
        self.columns = df.columns
        self._iter = None
        self._pending = None  # one-row lookahead for hasMoreRows
        self.offset = 0
        self.lock = threading.Lock()

    def fetch(self, n: int) -> tuple[list, bool]:
        """Next ≤n rows + hasMoreRows, streaming via toLocalIterator."""
        with self.lock:
            if self._iter is None:
                self._iter = iter(self.df.toLocalIterator())
            rows = []
            if self._pending is not None:
                rows.append(self._pending)
                self._pending = None
            while len(rows) < n:
                try:
                    rows.append(next(self._iter))
                except StopIteration:
                    self.offset += len(rows)
                    return rows, False
            try:
                self._pending = next(self._iter)
                more = True
            except StopIteration:
                more = False
            self.offset += len(rows)
            return rows, more


def _render(v, base: str):
    if base in _CONTAINER:
        if base == "binary":
            return bytes(v)
        return v
    if base in ("array", "map", "struct"):
        def conv(x):
            if hasattr(x, "asDict"):
                return {k: conv(y) for k, y in x.asDict().items()}
            if isinstance(x, dict):
                return {str(k): conv(y) for k, y in x.items()}
            if isinstance(x, (list, tuple)):
                return [conv(y) for y in x]
            if x is None or isinstance(x, (bool, int, float, str)):
                return x
            return str(x)
        return json.dumps(conv(v), separators=(",", ":"))
    return str(v)


def _column_struct(values: list, nulls: list[bool], base: str) -> tuple[int, dict]:
    fid, elem_type, default = _CONTAINER.get(base, (_COL_STRING, tp.STRING, ""))
    wire_values = [default if is_null else v for v, is_null in zip(values, nulls)]
    mask = bytearray((len(nulls) + 7) // 8 or 1)
    for i, is_null in enumerate(nulls):
        if is_null:
            mask[i // 8] |= 1 << (i % 8)
    col = {1: (tp.LIST, (elem_type, wire_values)), 2: (tp.STRING, bytes(mask))}
    return (tp.STRUCT, {fid: (tp.STRUCT, col)})


class HiveServer2Front:
    """Thrift TCLIService endpoint over a ``SQLServingEngine``."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.engine = SQLServingEngine(spark, warehouse)
        self._ops: dict[bytes, _Operation] = {}
        self._session_guids: dict[bytes, str] = {}
        self._lock = threading.Lock()
        front = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                reader = tp.ThriftReader(self.rfile)
                while True:
                    try:
                        name, mtype, seqid = reader.read_message_begin()
                        args = reader.read_value(tp.STRUCT)
                    except (EOFError, ConnectionError):
                        return
                    try:
                        reply = front._dispatch(name, args)
                        payload = tp.write_message(
                            name, tp.MSG_REPLY, seqid, {0: (tp.STRUCT, reply)}
                        )
                    except _UnknownMethod:
                        payload = tp.application_exception(
                            name, seqid, f"unknown method {name!r}", exc_type=1
                        )
                    except Exception as exc:  # noqa: BLE001 — protocol boundary
                        payload = tp.application_exception(
                            name, seqid, f"{type(exc).__name__}: {exc}", exc_type=0
                        )
                    try:
                        self.wfile.write(payload)
                        self.wfile.flush()
                    except (ConnectionError, BrokenPipeError):
                        return

        self._server = socketserver.ThreadingTCPServer((host, port), Handler)
        self._server.daemon_threads = True
        self.host, self.port = self._server.server_address
        self._thread: threading.Thread | None = None

    # --- lifecycle ---

    def start(self) -> "HiveServer2Front":
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)

    # --- dispatch ---

    def _dispatch(self, name: str, args: dict) -> dict:
        req = args.get(1, (tp.STRUCT, {}))[1]
        method = getattr(self, f"_do_{name}", None)
        if method is None:
            raise _UnknownMethod(name)
        return method(req)

    def _session_of(self, req_field) -> str:
        guid = _guid_of(req_field)
        sid = self._session_guids.get(guid)
        if sid is None:
            raise KeyError("invalid session handle")
        return sid

    # --- TCLIService methods ---

    def _do_OpenSession(self, req: dict) -> dict:
        client_protocol = req.get(1, (tp.I32, PROTOCOL_V6))[1]
        if client_protocol < PROTOCOL_V6:
            return {
                1: _status_error(
                    f"client protocol {client_protocol} predates V6 "
                    "column-based results; connect with protocol >= V6"
                ),
                2: (tp.I32, PROTOCOL_V6),
            }
        sid = self.engine.open_session()
        guid = uuid.uuid4().bytes
        with self._lock:
            self._session_guids[guid] = sid
        return {
            1: _status_ok(),
            2: (tp.I32, min(client_protocol, PROTOCOL_V6)),
            3: _handle(guid),
        }

    def _do_ExecuteStatement(self, req: dict) -> dict:
        sid = self._session_of(req[1][1])
        statement = req[2][1].decode()
        try:
            df = self.engine.execute(sid, statement)
            # force analysis NOW so syntax/semantic errors surface in this
            # response's TStatus (execution streams later, per fetch)
            df.schema  # noqa: B018
        except Exception as exc:  # noqa: BLE001
            self.engine.finish_statement(sid)
            return {1: _status_error(f"{type(exc).__name__}: {exc}")}
        guid = uuid.uuid4().bytes
        with self._lock:
            self._ops[guid] = _Operation(sid, df)
        return {1: _status_ok(), 2: _op_handle(guid)}

    def _op_of(self, req_field) -> tuple[bytes, _Operation]:
        guid = _guid_of(req_field)
        op = self._ops.get(guid)
        if op is None:
            raise KeyError("invalid operation handle")
        return guid, op

    def _do_GetOperationStatus(self, req: dict) -> dict:
        self._op_of(req[1][1])
        return {1: _status_ok(), 2: (tp.I32, OP_STATE_FINISHED)}

    def _do_GetResultSetMetadata(self, req: dict) -> dict:
        _, op = self._op_of(req[1][1])
        cols = []
        for pos, f in enumerate(op.schema.fields):
            base = _base_type(f.dataType.simpleString())
            type_id = _TYPE_ID.get(base, 7)
            type_desc = (
                tp.STRUCT,
                {
                    1: (
                        tp.LIST,
                        (
                            tp.STRUCT,
                            [{1: (tp.STRUCT, {1: (tp.I32, type_id)})}],
                        ),
                    )
                },
            )
            cols.append(
                {
                    1: (tp.STRING, f.name),
                    2: type_desc,
                    3: (tp.I32, pos + 1),
                }
            )
        return {
            1: _status_ok(),
            2: (tp.STRUCT, {1: (tp.LIST, (tp.STRUCT, cols))}),
        }

    def _do_FetchResults(self, req: dict) -> dict:
        _, op = self._op_of(req[1][1])
        orientation = req.get(2, (tp.I32, FETCH_NEXT))[1]
        if orientation != FETCH_NEXT:
            return {1: _status_error("only FETCH_NEXT is supported")}
        max_rows = req.get(3, (tp.I64, 1000))[1] or 1000
        start = op.offset
        try:
            rows, more = op.fetch(int(max_rows))
        except Exception as exc:  # noqa: BLE001 — execution error surfaces here
            self.engine.finish_statement(op.session_id)
            return {1: _status_error(f"{type(exc).__name__}: {exc}")}
        if not more:
            self.engine.finish_statement(op.session_id)
        bases = [_base_type(f.dataType.simpleString()) for f in op.schema.fields]
        columns = []
        for i, base in enumerate(bases):
            nulls = [r[i] is None for r in rows]
            values = [
                None if is_null else _render(r[i], base)
                for r, is_null in zip(rows, nulls)
            ]
            columns.append(_column_struct(values, nulls, base))
        rowset = {
            1: (tp.I64, start),
            2: (tp.LIST, (tp.STRUCT, [])),  # row-based slot: empty at V6+
            3: (tp.LIST, (tp.STRUCT, [c[1] for c in columns])),
        }
        return {
            1: _status_ok(),
            2: (tp.BOOL, more),
            3: (tp.STRUCT, rowset),
        }

    def _do_CancelOperation(self, req: dict) -> dict:
        _, op = self._op_of(req[1][1])
        self.engine.cancel(op.session_id)
        return {1: _status_ok()}

    def _do_CloseOperation(self, req: dict) -> dict:
        guid, op = self._op_of(req[1][1])
        with self._lock:
            self._ops.pop(guid, None)
        self.engine.finish_statement(op.session_id)
        return {1: _status_ok()}

    def _do_CloseSession(self, req: dict) -> dict:
        guid = _guid_of(req[1][1])
        with self._lock:
            sid = self._session_guids.pop(guid, None)
            stale = [g for g, op in self._ops.items() if op.session_id == sid]
            for g in stale:
                self._ops.pop(g, None)
        if sid is not None:
            self.engine.close_session(sid)
        return {1: _status_ok()}

    def _do_GetInfo(self, req: dict) -> dict:
        self._session_of(req[1][1])
        # every info type answers the DBMS identity string — what JDBC
        # drivers read at connect (CLI_DBMS_NAME / CLI_DBMS_VER)
        return {
            1: _status_ok(),
            2: (tp.STRUCT, {1: (tp.STRING, "Spark SQL")}),
        }

    # --- catalog browsing (the JDBC/Superset schema-discovery path) ---
    # Each call materializes the JDBC-shaped result set as an operation
    # handle fetched through the normal FetchResults flow, exactly like
    # ExecuteStatement results. Patterns follow the TCLIService LIKE
    # convention ('%' any run, '_' one char; empty/absent = match all).

    @staticmethod
    def _like_match(pattern: bytes | None, value: str) -> bool:
        if not pattern:
            return True
        # re.escape leaves % and _ alone (not regex specials), so they can
        # be rewritten to their LIKE meanings after everything else is
        # neutralized
        pat = re.escape(pattern.decode()).replace("%", ".*").replace("_", ".")
        return re.fullmatch(pat, value) is not None

    def _browse_operation(self, sid: str, rows: list, schema: str) -> dict:
        # build on the session's isolated SparkSession (same as queries)
        op_df = self.engine.session_spark(sid).createDataFrame(rows, schema)
        guid = uuid.uuid4().bytes
        with self._lock:
            self._ops[guid] = _Operation(sid, op_df)
        return {1: _status_ok(), 2: _op_handle(guid)}

    def _namespaces(self, sid: str) -> list[str]:
        df = self.engine.execute(sid, "SHOW NAMESPACES")
        out = [r[0] for r in df.collect()]
        self.engine.finish_statement(sid)
        return out

    def _do_GetSchemas(self, req: dict) -> dict:
        sid = self._session_of(req[1][1])
        schema_pat = req.get(3, (tp.STRING, b""))[1]
        rows = [
            (ns, "spark")
            for ns in sorted(self._namespaces(sid))
            if self._like_match(schema_pat, ns)
        ]
        return self._browse_operation(
            sid, rows, "TABLE_SCHEM string, TABLE_CATALOG string"
        )

    def _do_GetTables(self, req: dict) -> dict:
        sid = self._session_of(req[1][1])
        schema_pat = req.get(3, (tp.STRING, b""))[1]
        table_pat = req.get(4, (tp.STRING, b""))[1]
        rows = []
        for ns in sorted(self._namespaces(sid)):
            if not self._like_match(schema_pat, ns):
                continue
            df = self.engine.execute(sid, f"SHOW TABLES IN {ns}")
            names = [r["tableName"] for r in df.collect()]
            self.engine.finish_statement(sid)
            rows += [
                ("spark", ns, t, "TABLE", "")
                for t in sorted(names)
                if self._like_match(table_pat, t)
            ]
        return self._browse_operation(
            sid,
            rows,
            "TABLE_CAT string, TABLE_SCHEM string, TABLE_NAME string, "
            "TABLE_TYPE string, REMARKS string",
        )

    def _do_GetColumns(self, req: dict) -> dict:
        sid = self._session_of(req[1][1])
        schema_pat = req.get(3, (tp.STRING, b""))[1]
        table_pat = req.get(4, (tp.STRING, b""))[1]
        col_pat = req.get(5, (tp.STRING, b""))[1]
        rows = []
        for ns in sorted(self._namespaces(sid)):
            if not self._like_match(schema_pat, ns):
                continue
            df = self.engine.execute(sid, f"SHOW TABLES IN {ns}")
            names = [r["tableName"] for r in df.collect()]
            self.engine.finish_statement(sid)
            for t in sorted(names):
                if not self._like_match(table_pat, t):
                    continue
                desc = self.engine.execute(sid, f"DESCRIBE {ns}.{t}")
                cols = desc.collect()
                self.engine.finish_statement(sid)
                for pos, c in enumerate(cols, start=1):
                    name = c["col_name"]
                    if not name or name.startswith("#"):
                        continue
                    if not self._like_match(col_pat, name):
                        continue
                    base = _base_type(c["data_type"])
                    rows.append(
                        (
                            "spark", ns, t, name,
                            _TYPE_ID.get(base, 7), c["data_type"],
                            1 if c["nullable"] else 0, pos,
                        )
                    )
        return self._browse_operation(
            sid,
            rows,
            "TABLE_CAT string, TABLE_SCHEM string, TABLE_NAME string, "
            "COLUMN_NAME string, DATA_TYPE int, TYPE_NAME string, "
            "NULLABLE int, ORDINAL_POSITION int",
        )


    # --- the remaining connect-time JDBC metadata calls (beeline/DBeaver
    # fire these right after OpenSession; all follow the same
    # browse-operation flow) ---

    def _do_GetCatalogs(self, req: dict) -> dict:
        sid = self._session_of(req[1][1])
        return self._browse_operation(sid, [("spark",)], "TABLE_CAT string")

    def _do_GetTableTypes(self, req: dict) -> dict:
        sid = self._session_of(req[1][1])
        return self._browse_operation(
            sid, [("TABLE",), ("VIEW",)], "TABLE_TYPE string"
        )

    def _do_GetTypeInfo(self, req: dict) -> dict:
        """java.sql.DatabaseMetaData.getTypeInfo() — one row per SQL type
        the engine serves, in the JDBC-mandated 18-column shape."""
        sid = self._session_of(req[1][1])
        #        name        jdbc  prec  params       searchable
        types = [
            ("BOOLEAN", 16, None, None, 2),
            ("TINYINT", -6, 3, None, 2),
            ("SMALLINT", 5, 5, None, 2),
            ("INT", 4, 10, None, 2),
            ("BIGINT", -5, 19, None, 2),
            ("FLOAT", 6, 7, None, 2),
            ("DOUBLE", 8, 15, None, 2),
            ("DECIMAL", 3, 38, "precision,scale", 2),
            ("STRING", 12, None, None, 3),
            ("BINARY", -2, None, None, 0),
            ("DATE", 91, None, None, 2),
            ("TIMESTAMP", 93, None, None, 2),
            ("ARRAY", 2003, None, None, 0),
            ("MAP", 2000, None, None, 0),
            ("STRUCT", 2002, None, None, 0),
        ]
        rows = [
            (
                name, jdbc, prec, None, None, params,
                1,      # NULLABLE = typeNullable
                name == "STRING",  # CASE_SENSITIVE
                searchable,
                False,  # UNSIGNED_ATTRIBUTE (all signed)
                name == "DECIMAL",  # FIXED_PREC_SCALE
                False,  # AUTO_INCREMENT
                name, 0,
                38 if name == "DECIMAL" else 0,
                None, None,
                10 if prec else None,
            )
            for name, jdbc, prec, params, searchable in types
        ]
        return self._browse_operation(
            sid,
            rows,
            "TYPE_NAME string, DATA_TYPE int, PRECISION int, "
            "LITERAL_PREFIX string, LITERAL_SUFFIX string, CREATE_PARAMS string, "
            "NULLABLE int, CASE_SENSITIVE boolean, SEARCHABLE int, "
            "UNSIGNED_ATTRIBUTE boolean, FIXED_PREC_SCALE boolean, "
            "AUTO_INCREMENT boolean, LOCAL_TYPE_NAME string, MINIMUM_SCALE int, "
            "MAXIMUM_SCALE int, SQL_DATA_TYPE int, SQL_DATETIME_SUB int, "
            "NUM_PREC_RADIX int",
        )

    def _do_GetFunctions(self, req: dict) -> dict:
        sid = self._session_of(req[1][1])
        fn_pat = req.get(4, (tp.STRING, b""))[1]
        df = self.engine.execute(sid, "SHOW FUNCTIONS")
        names = [r[0] for r in df.collect()]
        self.engine.finish_statement(sid)
        rows = [
            (None, None, f, "", 0, f)  # functionResultUnknown = 0 (what
            # real HS2's GetFunctionsOperation emits for every function)
            for f in sorted(names)
            if self._like_match(fn_pat, f)
        ]
        return self._browse_operation(
            sid,
            rows,
            "FUNCTION_CAT string, FUNCTION_SCHEM string, FUNCTION_NAME string, "
            "REMARKS string, FUNCTION_TYPE int, SPECIFIC_NAME string",
        )


class _UnknownMethod(Exception):
    pass


# ---------------------------------------------------------------------------
# wire client (tests/tools) — speaks the same bytes PyHive emits


class HS2Client:
    """Blocking TCLIService client over strict TBinaryProtocol, unframed."""

    def __init__(self, host: str, port: int, protocol: int = PROTOCOL_V6):
        self._sock = socket.create_connection((host, port))
        self._rfile = self._sock.makefile("rb")
        self._seq = 0
        resp = self.call(
            "OpenSession",
            {
                1: (tp.I32, protocol),
                2: (tp.STRING, "test"),
                3: (tp.STRING, ""),
            },
        )
        self._check(resp)
        self.server_protocol = resp[2][1]
        self._session = resp[3][1]

    # --- protocol plumbing ---

    def call(self, name: str, req_struct: dict) -> dict:
        self._seq += 1
        msg = tp.write_message(
            name, tp.MSG_CALL, self._seq, {1: (tp.STRUCT, req_struct)}
        )
        self._sock.sendall(msg)
        reader = tp.ThriftReader(self._rfile)
        rname, mtype, seqid = reader.read_message_begin()
        body = reader.read_value(tp.STRUCT)
        if mtype == tp.MSG_EXCEPTION:
            raise RuntimeError(
                f"TApplicationException: {body.get(1, (0, b''))[1].decode()}"
            )
        if rname != name or seqid != self._seq:
            raise RuntimeError(f"out-of-order reply: {rname}#{seqid}")
        return body[0][1]

    @staticmethod
    def _check(resp: dict) -> None:
        status = resp[1][1]
        if status[1][1] != STATUS_SUCCESS:
            msg = status.get(5, (0, b""))[1]
            raise RuntimeError(msg.decode() if isinstance(msg, bytes) else str(msg))

    # --- session API ---

    def execute(self, statement: str) -> dict:
        resp = self.call(
            "ExecuteStatement",
            {1: (tp.STRUCT, self._session), 2: (tp.STRING, statement)},
        )
        self._check(resp)
        return resp[2][1]

    def operation_state(self, op: dict) -> int:
        resp = self.call("GetOperationStatus", {1: (tp.STRUCT, op)})
        self._check(resp)
        return resp[2][1]

    def result_schema(self, op: dict) -> list[tuple[str, int]]:
        resp = self.call("GetResultSetMetadata", {1: (tp.STRUCT, op)})
        self._check(resp)
        cols = resp[2][1][1][1][1]
        out = []
        for c in cols:
            name = c[1][1].decode()
            # TColumnDesc.typeDesc(2).types(1)[0].primitiveEntry(1).type(1)
            type_id = c[2][1][1][1][1][0][1][1][1][1]
            out.append((name, type_id))
        return out

    def fetch(self, op: dict, max_rows: int = 1000) -> tuple[list[list], bool]:
        """One FetchResults page → (columns as python lists, hasMoreRows)."""
        resp = self.call(
            "FetchResults",
            {
                1: (tp.STRUCT, op),
                2: (tp.I32, FETCH_NEXT),
                3: (tp.I64, max_rows),
            },
        )
        self._check(resp)
        more = resp.get(2, (tp.BOOL, False))[1]
        rowset = resp[3][1]
        columns = []
        for col_union in rowset[3][1][1]:
            (fid, (_, col)) = next(iter(col_union.items()))
            raw = col[1][1][1]
            mask = col[2][1]
            vals = []
            for i, v in enumerate(raw):
                if mask[i // 8] & (1 << (i % 8)):
                    vals.append(None)
                elif fid == _COL_STRING:
                    vals.append(v.decode())
                elif fid == _COL_BINARY:
                    vals.append(bytes(v))
                else:
                    vals.append(v)
            columns.append(vals)
        return columns, more

    def fetch_all_rows(self, op: dict, page: int = 500) -> list[tuple]:
        rows: list[tuple] = []
        while True:
            cols, more = self.fetch(op, page)
            if cols and cols[0]:
                rows.extend(zip(*cols))
            if not more:
                return rows

    def query(self, statement: str) -> tuple[list[str], list[tuple]]:
        """execute + schema + paged fetch + close, like a DBAPI cursor."""
        op = self.execute(statement)
        names = [n for n, _ in self.result_schema(op)]
        rows = self.fetch_all_rows(op)
        self.close_operation(op)
        return names, rows

    def close_operation(self, op: dict) -> None:
        self._check(self.call("CloseOperation", {1: (tp.STRUCT, op)}))

    def cancel_operation(self, op: dict) -> None:
        self._check(self.call("CancelOperation", {1: (tp.STRUCT, op)}))

    def close(self) -> None:
        try:
            self._check(self.call("CloseSession", {1: (tp.STRUCT, self._session)}))
        finally:
            self._sock.close()
