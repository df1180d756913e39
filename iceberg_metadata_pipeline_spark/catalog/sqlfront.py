"""SQL front-end for catalog table operations.

The reference's users reach time travel and metadata tables through SQL
(Thrift/JDBC → Spark SQL with the Iceberg extensions jar; see
/root/reference entrypoint-spark.sh:73 and superset_config.py:19-41 for
the dialect-rewrite precedent). Without the Iceberg runtime jar we can't
extend Spark's parser, so this is the documented equivalent: a thin
statement rewriter that resolves catalog references to temp views and
delegates everything else to ``spark.sql`` — the query itself stays
fully Catalyst-planned (pushdown/pruning apply through the view).

Supported per statement (matching Iceberg SQL syntax):

- ``ns.table``                         → current-snapshot scan
- ``ns.table VERSION AS OF <id>``      → pinned-snapshot scan
- ``ns.table VERSION AS OF '<ref>'``   → tag/branch by name
- ``ns.table TIMESTAMP AS OF '<ts>'``  → latest snapshot at/before ts
  (all also accept Iceberg's ``FOR VERSION/TIMESTAMP AS OF`` spelling)
- ``ns.table.snapshots|files|history`` → metadata tables

Rewrites are textual on table references only — the rest of the
statement (joins, aggregates, windows, CTEs) passes through untouched,
so the full SQL surface composes with catalog reads.
"""

from __future__ import annotations

import datetime as _dt
import re

from pyspark.sql import DataFrame

from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"

# ns.table.snapshots / .files / .history — must match before plain refs
_META_RE = re.compile(
    rf"\b(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})\.(?P<meta>snapshots|files|history)\b"
)

# ns.table [FOR] VERSION AS OF n | [FOR] TIMESTAMP AS OF 'ts'
_TT_RE = re.compile(
    rf"\b(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})"
    r"(?:\s+(?:FOR\s+)?(?:VERSION\s+AS\s+OF\s+(?:(?P<ver>\d+)|'(?P<ref>[^']+)')"
    r"|TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)'))?",
    re.IGNORECASE,
)

_KEYWORDS = {"group", "order", "inner", "left", "right", "full", "cross"}


def _parse_ts_ms(text: str) -> int:
    ts = _dt.datetime.fromisoformat(text)
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=_dt.timezone.utc)
    return int(ts.timestamp() * 1000)


def catalog_sql(catalog: Catalog, statement: str) -> DataFrame:
    """Execute ``statement`` with catalog references resolved.

    Each distinct (table, snapshot-pin) reference becomes one temp view;
    repeated references share the view so self-joins across two points in
    time work (``FROM nyc.t a JOIN nyc.t VERSION AS OF 3 b ON ...``).
    """
    spark = catalog.spark
    views: dict[str, str] = {}
    counter = 0

    def _view_for(df: DataFrame, key: str) -> str:
        nonlocal counter
        if key not in views:
            counter += 1
            name = f"__catalog_sql_{abs(hash(key)) % 10**8}_{counter}"
            df.createOrReplaceTempView(name)
            views[key] = name
        return views[key]

    def _meta(m: re.Match) -> str:
        table = catalog.load_table(m.group("ns"), m.group("tbl"))
        kind = m.group("meta")
        df = {
            "snapshots": table.snapshots_df,
            "files": table.files_df,
            "history": table.history_df,
        }[kind]()
        return _view_for(df, f"{m.group('ns')}.{m.group('tbl')}#{kind}")

    def _tt(m: re.Match) -> str:
        ns, tbl = m.group("ns"), m.group("tbl")
        # "a.b" where ns isn't a namespace (e.g. alias.column) → leave as-is
        try:
            table = catalog.load_table(ns, tbl)
        except (FileNotFoundError, ValueError, KeyError):
            return m.group(0)
        if m.group("ver") is not None:
            sid = int(m.group("ver"))
            return _view_for(table.scan(snapshot_id=sid), f"{ns}.{tbl}@v{sid}")
        if m.group("ref") is not None:
            name = m.group("ref")
            ref = table.meta.get("refs", {}).get(name)
            if ref is None:
                raise ValueError(f"no ref {name!r} on {ns}.{tbl}")
            sid = ref["snapshot_id"]
            return _view_for(table.scan(snapshot_id=sid), f"{ns}.{tbl}@v{sid}")
        if m.group("ts") is not None:
            ms = _parse_ts_ms(m.group("ts"))
            return _view_for(table.scan(as_of_ms=ms), f"{ns}.{tbl}@t{ms}")
        return _view_for(table.scan(), f"{ns}.{tbl}")

    rewritten = _META_RE.sub(_meta, statement)
    rewritten = _TT_RE.sub(_tt, rewritten)
    return spark.sql(rewritten)
