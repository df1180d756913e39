"""Multi-client SQL serving seam — the engine-side counterpart of the
reference's HiveThriftServer2 + Superset topology (entrypoint-spark.sh:73,
docker-compose.yml:48-65): N concurrent clients hold independent SQL
sessions against ONE engine process.

Spark-first design: one JVM/SparkContext, one warehouse; each client
session is a ``SparkSession.newSession()`` — Spark's built-in
multi-session primitive (shared context and executors, ISOLATED temp
views and SQL conf; exactly what HiveThriftServer2 allocates per JDBC
connection) — wrapped with its own ``Catalog`` handle so ``catalog_sql``
statements resolve against per-session state. Concurrent queries
interleave under the FAIR scheduler (session.py sets
``spark.scheduler.mode=FAIR``, conf parity with entrypoint-spark.sh:136);
each session tags its jobs with a scheduler pool so one client's big
scan cannot starve another's point lookup.

Catalog/table state is shared THROUGH THE WAREHOUSE, not through
memory: every session re-reads table metadata from disk, and commits go
through the CAS protocol in metacat, so two sessions writing the same
table resolve exactly like two engines would (append rebase / commit
conflict), while temp views and SQL conf never bleed across sessions.

The wire protocol (``SQLServer``) is deliberately thin — newline-
delimited JSON over TCP, thread-per-client — because the protocol is
not the point; the session/concurrency semantics are. At scale the same
engine object can sit behind Spark Connect or a Thrift front without
changing session handling.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading
import time

from pyspark.sql import DataFrame, SparkSession

from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql
from iceberg_metadata_pipeline_spark.serving.result_cache import (
    TOO_BIG,
    ResultCache,
    catalog_fingerprint,
    is_cacheable_statement,
    is_global_mutation,
    is_tainting_statement,
)


class _Session:
    """One client's state: an isolated Spark sub-session + catalog handle."""

    def __init__(self, session_id: str, spark: SparkSession, warehouse: str):
        self.session_id = session_id
        # newSession(): same SparkContext (shared executors, one JVM),
        # fresh temp-view registry and SQL conf — per-connection isolation
        # without per-connection JVMs
        self.spark = spark.newSession()
        self.catalog = Catalog(self.spark, warehouse)
        self._stmt_seq = 0
        # the group of the statement currently executing on this session's
        # handler thread (None when idle) — what a cross-connection cancel
        # targets; statement-scoped so canceling stmt N can never clip a
        # later stmt N+1 that starts after the cancel was issued
        self.running_group: str | None = None
        # once the session holds ANY session-local state that could make
        # a SELECT's answer differ from other sessions' (temp views, SET
        # conf/variables, USE, EXECUTE IMMEDIATE), it permanently opts
        # out of the shared result cache
        self.cache_tainted = False
        self.last_used = time.monotonic()

    def execute(self, statement: str) -> DataFrame:
        # scheduler pools are thread-local in Spark; tag every statement
        # so FAIR scheduling arbitrates BETWEEN sessions. The job group
        # makes the session's running jobs CANCELLABLE from another
        # connection (HiveThriftServer2's cancel-operation semantics).
        self.spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"session-{self.session_id}"
        )
        self.last_used = time.monotonic()
        self._stmt_seq += 1
        group = f"session-{self.session_id}-stmt-{self._stmt_seq}"
        self.running_group = group
        self.spark.sparkContext.setJobGroup(group, statement[:120], interruptOnCancel=True)
        return catalog_sql(self.catalog, statement)


class SQLServingEngine:
    """Session manager: open/execute/close against one SparkSession."""

    def __init__(self, spark: SparkSession, warehouse: str, result_cache: bool = True):
        self._spark = spark
        self._warehouse = warehouse
        self._sessions: dict[str, _Session] = {}
        self._lock = threading.Lock()
        self._next = 0
        self.cache = ResultCache() if result_cache else None

    def open_session(self) -> str:
        with self._lock:
            self._next += 1
            sid = str(self._next)
            self._sessions[sid] = _Session(sid, self._spark, self._warehouse)
        return sid

    def execute(self, session_id: str, statement: str) -> DataFrame:
        with self._lock:
            sess = self._sessions.get(session_id)
        if sess is None:
            raise KeyError(f"no open session {session_id}")
        if is_tainting_statement(statement):
            sess.cache_tainted = True
        if self.cache is not None and is_global_mutation(statement):
            # cross-session state not covered by the catalog fingerprint
            # changed — every cached entry is suspect
            self.cache.clear()
        if (
            self.cache is None
            or sess.cache_tainted
            or not is_cacheable_statement(statement)
        ):
            return sess.execute(statement)
        # snapshot-keyed cache: the fingerprint pins the exact warehouse
        # state, so a hit is correct by construction (see result_cache.py)
        fp = catalog_fingerprint(self._warehouse)
        hit = self.cache.lookup(statement, fp)
        if hit is TOO_BIG:
            return sess.execute(statement)
        if hit is not None:
            sess.last_used = time.monotonic()  # a hit IS session activity
            schema, rows = hit
            return sess.spark.createDataFrame(rows, schema)
        df = sess.execute(statement)
        rows = df.limit(self.cache.max_rows + 1).collect()
        if len(rows) > self.cache.max_rows:
            self.cache.store(statement, fp, TOO_BIG)
            return df
        self.cache.store(statement, fp, (df.schema, rows))
        return sess.spark.createDataFrame(rows, df.schema)

    def cancel(self, session_id: str) -> None:
        """Cancel the session's RUNNING statement (issued from any other
        connection — the canceled session's own thread is blocked in its
        collect, which raises once the jobs die). The session survives:
        cancel kills statements, never state.

        Sticky: ``cancelJobGroup`` only kills jobs ALREADY submitted to
        the DAG scheduler — if the statement is still planning (or the
        scheduler is saturated), a one-shot cancel is a silent no-op and
        the statement later runs to completion. So a background thread
        re-issues the cancel every 200 ms until the statement's group is
        no longer the session's running statement (finished or dead).
        The group is statement-scoped, so the loop can never touch the
        session's NEXT statement."""
        with self._lock:
            sess = self._sessions.get(session_id)
        group = sess.running_group if sess is not None else None
        if group is None:
            return  # nothing running — cancel of an idle session is a no-op
        sc = self._spark.sparkContext

        def _keep_canceling() -> None:
            deadline = time.monotonic() + 60.0
            while sess.running_group == group and time.monotonic() < deadline:
                sc.cancelJobGroup(group)
                time.sleep(0.2)

        sc.cancelJobGroup(group)
        threading.Thread(target=_keep_canceling, daemon=True).start()

    def session_spark(self, session_id: str) -> SparkSession:
        """The session's isolated SparkSession (for building local result
        sets — catalog browsing — in the session's own context)."""
        with self._lock:
            sess = self._sessions.get(session_id)
        if sess is None:
            raise KeyError(f"no open session {session_id}")
        return sess.spark

    def finish_statement(self, session_id: str) -> None:
        """Handler calls this when a statement's collect returns or raises
        — clears the cancel target so sticky cancels stop."""
        with self._lock:
            sess = self._sessions.get(session_id)
        if sess is not None:
            sess.running_group = None

    def close_session(self, session_id: str) -> None:
        with self._lock:
            self._sessions.pop(session_id, None)

    def reap_idle_sessions(self, max_idle_seconds: float) -> list[str]:
        """Close sessions idle longer than the TTL (HiveServer2's
        session-timeout semantics: abandoned JDBC connections must not
        pin temp-view/conf state forever). A session that is mid-
        statement counts as active (running_group set). Returns the
        reaped session ids."""
        cutoff = time.monotonic() - max_idle_seconds
        with self._lock:
            stale = [
                sid
                for sid, s in self._sessions.items()
                if s.running_group is None and s.last_used < cutoff
            ]
            for sid in stale:
                self._sessions.pop(sid, None)
        return stale


class SQLServer:
    """Thread-per-client TCP loop over newline-delimited JSON.

    Requests: ``{"op": "open"}`` → ``{"session": id}``;
    ``{"op": "sql", "session": id, "sql": "...", "limit": n}`` →
    ``{"columns": [...], "rows": [[...], ...]}`` (rows JSON-rendered,
    capped at ``limit``, default 1000 — a serving protocol never streams
    an unbounded result to a dashboard); ``{"op": "close", "session": id}``.
    Errors come back as ``{"error": "..."}`` without killing the
    connection — a client typo must not tear down the session."""

    def __init__(self, spark: SparkSession, warehouse: str, host: str = "127.0.0.1", port: int = 0):
        self.engine = SQLServingEngine(spark, warehouse)
        engine = self.engine

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                for line in self.rfile:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        req = json.loads(line)
                        resp = self._dispatch(req)
                    except Exception as exc:  # noqa: BLE001 — protocol boundary:
                        # every engine error becomes a client-visible message
                        resp = {"error": f"{type(exc).__name__}: {exc}"}
                    self.wfile.write((json.dumps(resp) + "\n").encode())
                    self.wfile.flush()

            def _dispatch(self, req: dict) -> dict:
                op = req.get("op")
                if op == "open":
                    return {"session": engine.open_session()}
                if op == "close":
                    engine.close_session(str(req.get("session")))
                    return {"closed": True}
                if op == "cancel":
                    engine.cancel(str(req.get("session")))
                    return {"canceled": True}
                if op == "sql":
                    sid = str(req.get("session"))
                    try:
                        df = engine.execute(sid, str(req["sql"]))
                        limit = int(req.get("limit", 1000))
                        rows = df.limit(limit).collect()
                    finally:
                        engine.finish_statement(sid)
                    return {
                        "columns": df.columns,
                        "rows": [[_json_value(v) for v in r] for r in rows],
                    }
                return {"error": f"unknown op {op!r}"}

        self._server = socketserver.ThreadingTCPServer((host, port), Handler)
        self._server.daemon_threads = True
        self.host, self.port = self._server.server_address
        self._thread: threading.Thread | None = None

    def start(self) -> "SQLServer":
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)


def _json_value(v):
    """Row values → JSON-safe (dates/decimals/bytes render as strings)."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (list, tuple)):
        return [_json_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_value(x) for k, x in v.items()}
    return str(v)


class SQLClient:
    """Minimal blocking client for tests/tools: one socket, one session."""

    def __init__(self, host: str, port: int):
        self._sock = socket.create_connection((host, port))
        self._rfile = self._sock.makefile("r")
        self.session_id = self._request({"op": "open"})["session"]

    def _request(self, req: dict) -> dict:
        self._sock.sendall((json.dumps(req) + "\n").encode())
        resp = json.loads(self._rfile.readline())
        if "error" in resp:
            raise RuntimeError(resp["error"])
        return resp

    def sql(self, statement: str, limit: int = 1000) -> list[dict]:
        resp = self._request(
            {"op": "sql", "session": self.session_id, "sql": statement, "limit": limit}
        )
        return [dict(zip(resp["columns"], row)) for row in resp["rows"]]

    def cancel(self, session_id: str) -> None:
        """Cancel the GIVEN session's running statement. Requires an
        explicit id: this client's own connection is blocking, so by the
        time it could issue a cancel its own session has nothing running
        — a self-cancel default would be a guaranteed no-op."""
        self._request({"op": "cancel", "session": session_id})

    def close(self) -> None:
        try:
            self._request({"op": "close", "session": self.session_id})
        finally:
            self._sock.close()
