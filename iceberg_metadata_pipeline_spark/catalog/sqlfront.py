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
- ``ns.table.snapshots|files|history|partitions|manifests|refs|all_files|metadata_log_entries|delete_files|position_deletes|entries|all_entries|all_manifests|all_data_files|all_delete_files|column_stats``
  → metadata tables
- ``CALL [cat.]system.<proc>(...)``    → table-maintenance procedures
  (rollback_to_snapshot, expire_snapshots, remove_orphan_files,
  rewrite_data_files (binpack strategy / sort_order incl. zorder),
  rewrite_manifests, fast_forward — Iceberg's stored-procedure surface;
  named ``arg => value`` or positional args, table first)
- ``DELETE FROM ns.t WHERE ...`` / ``UPDATE ns.t SET ... WHERE ...`` /
  ``INSERT INTO|OVERWRITE ns.t VALUES ... | SELECT ...`` /
  ``CREATE [OR REPLACE] TABLE ns.t AS SELECT ...`` /
  ``TRUNCATE TABLE ns.t`` / ``MERGE INTO ns.t USING ... ON t.k = s.k
  WHEN MATCHED THEN UPDATE SET ... [WHEN NOT MATCHED THEN INSERT *]
  [WHEN NOT MATCHED BY SOURCE THEN DELETE]``
  → row-level DML + CTAS (returns an (operation, snapshot_id) summary
  row; source queries run through this same front-end)
- ``ALTER TABLE ns.t ADD|RENAME|DROP COLUMN ...`` and
  ``ALTER COLUMN c TYPE t`` → metadata-only schema evolution
- ``CREATE TABLE [IF NOT EXISTS] ns.t (cols) [USING x]
  [PARTITIONED BY (days(ts), bucket(4, id), ...)]`` and
  ``DROP TABLE [IF EXISTS] ns.t [PURGE]`` — Iceberg's hidden-partition
  transform spellings map onto the PartitionField spec
- ``CREATE [OR REPLACE] VIEW ns.v AS <sql>`` / ``SHOW VIEWS IN ns`` /
  ``SHOW CREATE VIEW|TABLE ns.x`` → catalog views (stored SQL, expanded
  recursively per query; A14-A16 surface, both SHOW CREATE spellings)
- ``ALTER TABLE ns.t CREATE|REPLACE|DROP TAG|BRANCH name [AS OF VERSION n]``
  and ``ALTER TABLE ns.t SET TBLPROPERTIES(...)`` / ``SHOW TBLPROPERTIES``
  → the Iceberg-extension DDL the reference's jar adds to Spark SQL
- ``DESCRIBE [TABLE] ns.t`` and ``ALTER TABLE ns.t RENAME TO [ns2.]new``
  (rename is a metadata pointer move — the table location never changes)
- ``SET spark.wap.branch = b`` → write-audit-publish session routing:
  row-level writes commit onto branch ``b`` (forked at the main head on
  first write) and plain reads resolve through it when it exists; main
  is untouched until ``CALL system.fast_forward``/``cherrypick_snapshot``
  publishes — Iceberg's spark.wap.branch semantics

Rewrites are textual on table references only — the rest of the
statement (joins, aggregates, windows, CTEs) passes through untouched,
so the full SQL surface composes with catalog reads.
"""

from __future__ import annotations

import datetime as _dt
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"

# ns.table.snapshots / .files / … — must match before plain refs
_META_RE = re.compile(
    rf"\b(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})"
    r"\.(?P<meta>snapshots|files|history|partitions|manifests|refs"
    r"|all_files|metadata_log_entries|delete_files|position_deletes"
    r"|column_stats|entries|all_entries|all_manifests|all_data_files"
    r"|all_delete_files)\b"
)

# CALL [cat.]system.proc(args) — Iceberg stored-procedure syntax
_CALL_RE = re.compile(
    rf"^\s*CALL\s+(?:{_IDENT}\.)?system\.(?P<proc>{_IDENT})\s*\((?P<args>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)

# row-level DML — the Thrift-served SQL surface Iceberg extensions add
_DML_INSERT_RE = re.compile(
    rf"^\s*INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?:TABLE\s+)?"
    rf"(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})\s*"
    rf"(?:\(\s*(?P<cols>{_IDENT}(?:\s*,\s*{_IDENT})*)\s*\)\s*)?"
    r"(?:(?P<byname>BY\s+NAME)\s+)?"
    rf"(?P<body>(?:VALUES|SELECT|WITH)\b.+)$",
    re.IGNORECASE | re.DOTALL,
)
_TRUNCATE_RE = re.compile(
    rf"^\s*TRUNCATE\s+TABLE\s+(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_CTAS_RE = re.compile(
    rf"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?TABLE\s+"
    rf"(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})\s+AS\s+(?P<body>(?:SELECT|WITH|VALUES)\b.+)$",
    re.IGNORECASE | re.DOTALL,
)
# CREATE TABLE with explicit columns + Iceberg hidden-partition transforms
_CREATE_TABLE_RE = re.compile(
    rf"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    rf"(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})\s*\((?P<cols>[^)]*(?:\([^)]*\)[^)]*)*)\)"
    r"(?:\s+USING\s+\w+)?"
    r"(?:\s+PARTITIONED\s+BY\s*\((?P<parts>[^)]*(?:\([^)]*\)[^)]*)*)\))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_TABLE_RE = re.compile(
    rf"^\s*DROP\s+TABLE\s+(?P<exists>IF\s+EXISTS\s+)?"
    rf"(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})\s*(?P<purge>PURGE)?\s*;?\s*$",
    re.IGNORECASE,
)
_PART_FIELD_RE = re.compile(
    rf"^\s*(?:(?P<kind>bucket|truncate)\s*\(\s*(?P<n>\d+)\s*,\s*(?P<col1>{_IDENT})\s*\)"
    rf"|(?P<unit>years?|months?|days?|hours?)\s*\(\s*(?P<col2>{_IDENT})\s*\)"
    rf"|(?P<ident>{_IDENT}))\s*$",
    re.IGNORECASE,
)
# ALTER TABLE ... ADD/DROP/REPLACE PARTITION FIELD — Iceberg's SQL
# spelling of partition-spec evolution (metadata-only; old files keep
# their old spec_id and stay prunable under it)
_ALTER_PARTITION_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})\s+(?:"
    r"ADD\s+PARTITION\s+FIELD\s+(?P<add>.+?)"
    r"|DROP\s+PARTITION\s+FIELD\s+(?P<drop>.+?)"
    r"|REPLACE\s+PARTITION\s+FIELD\s+(?P<old>.+?)\s+WITH\s+(?P<new>.+?)"
    r")\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _parse_partition_field(raw: str):
    """One PARTITIONED BY / PARTITION FIELD term -> PartitionField."""
    from iceberg_metadata_pipeline_spark.catalog.partitioning import PartitionField

    pm = _PART_FIELD_RE.match(raw)
    if pm is None:
        raise ValueError(f"unparseable partition field: {raw!r}")
    if pm.group("ident"):
        return PartitionField(pm.group("ident"), "identity")
    if pm.group("kind"):
        kind = pm.group("kind").lower()
        return PartitionField(pm.group("col1"), f"{kind}[{pm.group('n')}]")
    unit = pm.group("unit").lower().rstrip("s")
    return PartitionField(pm.group("col2"), unit)


_DML_DELETE_RE = re.compile(
    rf"^\s*DELETE\s+FROM\s+(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})"
    r"\s+WHERE\s+(?P<cond>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DML_UPDATE_RE = re.compile(
    rf"^\s*UPDATE\s+(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})"
    r"\s+SET\s+(?P<sets>.+?)\s+WHERE\s+(?P<cond>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# DELETE ... WHERE col IN (SELECT ...) / (a, b) IN (SELECT ...): the
# uncorrelated IN-subquery DELETE (the CDC tombstone shape)
def _balanced(text: str) -> bool:
    depth = 0
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0


_DELETE_IN_SUBQ_RE = re.compile(
    rf"^\s*(?:\(\s*(?P<cols>{_IDENT}(?:\s*,\s*{_IDENT})*)\s*\)|(?P<col>{_IDENT}))"
    r"\s+IN\s*\(\s*(?P<sub>(?:SELECT|WITH)\b.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)

# MERGE INTO — full Spark/Iceberg clause surface: ON equi-conjunctions
# over DIFFERENTLY-NAMED columns, multiple WHEN clauses with AND
# conditions (first match wins), UPDATE SET / DELETE on match, INSERT *
# or INSERT (cols) VALUES (...) on no-match, and the BY SOURCE clauses
_MERGE_RE = re.compile(
    rf"^\s*MERGE\s+INTO\s+(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})(?:\s+AS\s+(?P<talias>{_IDENT}))?"
    rf"\s+USING\s+(?P<src>\(.*\)|{_IDENT}\.{_IDENT})(?:\s+AS\s+)?\s*(?P<salias>{_IDENT})?"
    r"\s+ON\s+(?P<on>.+?)"
    r"(?P<clauses>\s+WHEN\s+(?:NOT\s+)?MATCHED\b.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# one WHEN clause; the lookahead stops non-greedy bodies at the next
# WHEN [NOT] MATCHED (a CASE WHEN inside a SET expression is safe —
# it is never followed by MATCHED)
_MERGE_WHEN_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED(?P<bysrc>\s+BY\s+SOURCE)?"
    r"(?:\s+AND\s+(?P<cond>.+?))?\s+THEN\s+"
    r"(?:UPDATE\s+SET\s+(?P<sets>.+?)|(?P<delete>DELETE)|INSERT\s+"
    r"(?:(?P<star>\*)|\(\s*(?P<inscols>[^)]*)\)\s*VALUES\s*\((?P<insvals>.+?)\)))"
    r"(?=\s+WHEN\s+(?:NOT\s+)?MATCHED\b|\s*$)",
    re.IGNORECASE | re.DOTALL,
)

# schema evolution DDL (Iceberg's metadata-only ALTER TABLE column ops)
_ALTER_COLUMN_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})\s+(?:"
    rf"ADD\s+COLUMNS?\s+\(?\s*(?P<add_name>{_IDENT})\s+(?P<add_type>[A-Za-z0-9_(),<> ]+?)"
    r"(?:\s+DEFAULT\s+(?P<add_default>'[^']*'|[\w.\-]+))?\s*\)?"
    rf"|RENAME\s+COLUMN\s+(?P<ren_old>{_IDENT})\s+TO\s+(?P<ren_new>{_IDENT})"
    rf"|DROP\s+COLUMNS?\s+\(?\s*(?P<drop_name>{_IDENT})\s*\)?"
    rf"|ALTER\s+COLUMN\s+(?P<prm_name>{_IDENT})\s+TYPE\s+(?P<prm_type>[A-Za-z0-9_(),<> ]+?)"
    r")\s*;?\s*$",
    re.IGNORECASE,
)

# Iceberg-extension ALTER TABLE statements (the syntax the reference's
# IcebergSparkSessionExtensions jar adds to Spark SQL)
_ALTER_REF_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})"
    rf"\s+(?P<op>CREATE|DROP|REPLACE)\s+(?P<kind>TAG|BRANCH)\s+(?P<name>{_IDENT})"
    r"(?:\s+AS\s+OF\s+VERSION\s+(?P<ver>\d+))?\s*;?\s*$",
    re.IGNORECASE,
)
_SET_PROPS_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})"
    r"\s+SET\s+TBLPROPERTIES\s*\((?P<props>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UNSET_PROPS_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})"
    r"\s+UNSET\s+TBLPROPERTIES\s*(?:IF\s+EXISTS\s*)?\((?P<props>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_SHOW_PROPS_RE = re.compile(
    rf"^\s*SHOW\s+TBLPROPERTIES\s+(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
# SET k=v / SET k (BI clients issue these on connect); CACHE TABLE name AS ...
_SET_RE = re.compile(
    r"^\s*SET\s+(?P<key>[A-Za-z_][\w.]*)\s*(?:=\s*(?P<val>.+?))?\s*;?\s*$",
    re.IGNORECASE,
)
_CACHE_RE = re.compile(
    rf"^\s*CACHE\s+TABLE\s+(?P<name>{_IDENT})\s+AS\s+(?P<body>.+)$"
    rf"|^\s*UNCACHE\s+TABLE\s+(?P<uname>{_IDENT})\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_EXPLAIN_RE = re.compile(
    r"^\s*EXPLAIN\s+(?:(?P<mode>EXTENDED|FORMATTED|COST|CODEGEN)\s+)?(?P<body>.+)$",
    re.IGNORECASE | re.DOTALL,
)
# ANALYZE TABLE ns.t COMPUTE STATISTICS [FOR COLUMNS a, b]
_ANALYZE_RE = re.compile(
    rf"^\s*ANALYZE\s+TABLE\s+(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})"
    rf"\s+COMPUTE\s+STATISTICS(?:\s+FOR\s+COLUMNS\s+(?P<cols>{_IDENT}(?:\s*,\s*{_IDENT})*))?\s*;?\s*$",
    re.IGNORECASE,
)
# Iceberg write-order DDL: ALTER TABLE ns.t WRITE ORDERED BY c1 [DESC], c2
_WRITE_ORDER_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})"
    rf"\s+WRITE\s+(?:(?P<unordered>UNORDERED)|ORDERED\s+BY\s+"
    rf"(?P<cols>{_IDENT}(?:\s+(?:ASC|DESC))?(?:\s*,\s*{_IDENT}(?:\s+(?:ASC|DESC))?)*))\s*;?\s*$",
    re.IGNORECASE,
)
# Iceberg row-identity DDL: SET IDENTIFIER FIELDS a, b / DROP IDENTIFIER FIELDS
_IDENT_FIELDS_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})"
    rf"\s+(?:(?P<set>SET)\s+IDENTIFIER\s+FIELDS\s+(?P<cols>{_IDENT}(?:\s*,\s*{_IDENT})*)"
    r"|(?P<drop>DROP)\s+IDENTIFIER\s+FIELDS)\s*;?\s*$",
    re.IGNORECASE,
)
_PROP_PAIR_RE = re.compile(r"'(?P<k>[^']*)'\s*=\s*'(?P<v>[^']*)'")

# materialized views (catalog/matview.py): algebraic-aggregate MVs with
# incremental (append-only CDC) refresh
_CREATE_MV_RE = re.compile(
    rf"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?MATERIALIZED\s+VIEW\s+"
    rf"(?P<ns>{_IDENT})\.(?P<view>{_IDENT})\s+AS\s+(?P<sql>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_REFRESH_MV_RE = re.compile(
    rf"^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+"
    rf"(?P<ns>{_IDENT})\.(?P<view>{_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_DROP_MV_RE = re.compile(
    rf"^\s*DROP\s+MATERIALIZED\s+VIEW\s+(?:IF\s+EXISTS\s+)?"
    rf"(?P<ns>{_IDENT})\.(?P<view>{_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)

# view DDL/introspection (the reference's A14-A16 surface)
_CREATE_VIEW_RE = re.compile(
    rf"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?VIEW\s+"
    rf"(?P<ns>{_IDENT})\.(?P<view>{_IDENT})\s+AS\s+(?P<sql>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_SHOW_VIEWS_RE = re.compile(
    rf"^\s*SHOW\s+VIEWS\s+IN\s+(?P<ns>{_IDENT})\s*;?\s*$", re.IGNORECASE
)
_SHOW_TABLES_RE = re.compile(
    rf"^\s*SHOW\s+TABLES\s+(?:IN|FROM)\s+(?P<ns>{_IDENT})\s*;?\s*$", re.IGNORECASE
)
_SHOW_NS_RE = re.compile(
    r"^\s*SHOW\s+(?:NAMESPACES|DATABASES|SCHEMAS)\s*;?\s*$", re.IGNORECASE
)
_CREATE_NS_RE = re.compile(
    rf"^\s*CREATE\s+(?:NAMESPACE|DATABASE|SCHEMA)\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    rf"(?P<ns>{_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_PARTS_RE = re.compile(
    rf"^\s*SHOW\s+PARTITIONS\s+(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
# SHOW CREATE VIEW and the reference's rewritten SHOW CREATE TABLE spelling
# (superset_config.py:19-41 rewrites VIEW→TABLE because Spark lacks the
# former; we accept both so either client dialect works)
_SHOW_CREATE_RE = re.compile(
    rf"^\s*SHOW\s+CREATE\s+(?:VIEW|TABLE)\s+"
    rf"(?P<ns>{_IDENT})\.(?P<view>{_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)

# hidden metadata columns resolved on demand (Iceberg: SELECT _file, _pos)
_META_COL_RE = re.compile(
    r"\b_(?:row_id|file|pos|spec_id|partition|last_updated_sequence_number)\b"
)

# ns.table [FOR] [SYSTEM_]VERSION AS OF n | [FOR] [SYSTEM_]TIME[STAMP] AS OF 'ts'
# (Spark's Iceberg syntax accepts both the VERSION/TIMESTAMP and the
# ANSI-ish SYSTEM_VERSION/SYSTEM_TIME spellings)
_TT_RE = re.compile(
    rf"\b(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})"
    r"(?:\s+(?:FOR\s+)?(?:(?:SYSTEM_)?VERSION\s+AS\s+OF\s+(?:(?P<ver>\d+)|'(?P<ref>[^']+)')"
    r"|(?:SYSTEM_TIME|TIMESTAMP)\s+AS\s+OF\s+'(?P<ts>[^']+)'))?",
    re.IGNORECASE,
)

_DESCRIBE_RE = re.compile(
    rf"^\s*DESC(?:RIBE)?\s+(?:(?P<ext>EXTENDED|FORMATTED)\s+)?(?:TABLE\s+)?"
    rf"(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_RENAME_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<ns>{_IDENT})\.(?P<tbl>{_IDENT})"
    rf"\s+RENAME\s+TO\s+(?:(?P<ns2>{_IDENT})\.)?(?P<new>{_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)

def _parse_ts_ms(text: str) -> int:
    ts = _dt.datetime.fromisoformat(text)
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=_dt.timezone.utc)
    return int(ts.timestamp() * 1000)


def catalog_sql(catalog: Catalog, statement: str, _depth: int = 0) -> DataFrame:
    """Execute ``statement`` with catalog references resolved.

    Each distinct (table, snapshot-pin) reference becomes one temp view;
    repeated references share the view so self-joins across two points in
    time work (``FROM nyc.t a JOIN nyc.t VERSION AS OF 3 b ON ...``).
    Catalog views expand recursively (``_depth`` bounds cycles).
    """
    spark = catalog.spark
    st = _SET_RE.match(statement)
    if st is not None and st.group("key").upper() not in ("IDENTIFIER",):
        key = st.group("key")
        val = st.group("val")
        if val is not None:
            # session-scoped conf (isolated per serving session — each
            # client holds its own newSession); BI clients send these
            # on connect (time zone, shuffle partitions, ANSI flags)
            spark.conf.set(key, val.strip().strip("'\""))
            return spark.createDataFrame([(key, val.strip())], "key string, value string")
        try:
            cur = spark.conf.get(key)
        except Exception:  # noqa: BLE001 — unset key reads as undefined
            cur = "<undefined>"
        return spark.createDataFrame([(key, cur)], "key string, value string")
    ch = _CACHE_RE.match(statement)
    if ch is not None:
        if ch.group("uname"):
            name = ch.group("uname")
            spark.catalog.uncacheTable(name)
            return spark.createDataFrame([(name, False)], "table string, cached boolean")
        name = ch.group("name")
        df = catalog_sql(catalog, ch.group("body"), _depth=_depth + 1).cache()
        df.createOrReplaceTempView(name)
        return spark.createDataFrame([(name, True)], "table string, cached boolean")
    ex = _EXPLAIN_RE.match(statement)
    if ex is not None:
        # EXPLAIN [EXTENDED|FORMATTED|COST] <query>: resolve the inner
        # query through the same front-end, return the plan as one row —
        # the debugging statement BI users type at the SQL port.
        # QUERIES ONLY: running the body through catalog_sql EXECUTES it,
        # so explaining DML/DDL/CALL would perform the side effect.
        head = ex.group("body").lstrip().split(None, 1)[0].upper() if ex.group("body").strip() else ""
        if head not in ("SELECT", "WITH", "VALUES", "TABLE"):
            raise ValueError(
                f"EXPLAIN supports queries only (got {head or 'empty'}); "
                "DML/DDL/CALL would execute, not explain"
            )
        inner = catalog_sql(catalog, ex.group("body"), _depth=_depth + 1)
        mode = (ex.group("mode") or "simple").lower()
        jvm = spark.sparkContext._jvm
        text = inner._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        )
        return spark.createDataFrame([(text,)], "plan string")
    # Iceberg WAP session routing: with spark.wap.branch set, row-level
    # writes commit onto that branch (created at the main head on first
    # write) and plain-table reads resolve through the branch when it
    # exists — the write-audit-publish loop entirely in session conf,
    # published later via CALL fast_forward/cherrypick (Iceberg's
    # spark.wap.branch semantics).
    wap_branch = spark.conf.get("spark.wap.branch", None) or None
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
            "partitions": table.partitions_df,
            "manifests": table.manifests_df,
            "refs": table.refs_df,
            "all_files": table.all_files_df,
            "metadata_log_entries": table.metadata_log_df,
            "delete_files": table.delete_files_df,
            "position_deletes": table.position_deletes_df,
            "column_stats": table.column_stats_df,
            "entries": table.entries_df,
            "all_entries": table.all_entries_df,
            "all_manifests": table.all_manifests_df,
            "all_data_files": table.all_data_files_df,
            "all_delete_files": table.all_delete_files_df,
        }[kind]()
        return _view_for(df, f"{m.group('ns')}.{m.group('tbl')}#{kind}")

    def _tt(m: re.Match) -> str:
        ns, tbl = m.group("ns"), m.group("tbl")
        # "a.b" where ns isn't a namespace (e.g. alias.column) → leave as-is
        try:
            table = catalog.load_table(ns, tbl)
        except (FileNotFoundError, ValueError, KeyError):
            try:
                view_sql = catalog.view_definition(ns, tbl)
            except KeyError:
                return m.group(0)
            # expand the view by running its stored SQL through the same
            # front-end (so views may reference tables, time travel, or
            # other views), bounded against definition cycles
            if _depth >= 8:
                raise ValueError(f"view expansion too deep at {ns}.{tbl}")
            df = catalog_sql(catalog, view_sql, _depth=_depth + 1)
            return _view_for(df, f"view:{ns}.{tbl}")
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
        # WAP session routing resolves FIRST so every read shape —
        # including metadata-column scans — sees the same branch state
        wap_sid = None
        if wap_branch:
            ref = table.meta.get("refs", {}).get(wap_branch)
            if ref is not None and ref["type"] == "branch":
                wap_sid = ref["snapshot_id"]
        # Iceberg resolves hidden metadata columns on demand: a statement
        # that references one by name gets a metadata-bearing scan (plain
        # statements keep the clean schema, so SELECT * never leaks them)
        if _META_COL_RE.search(statement):
            return _view_for(
                table.scan(snapshot_id=wap_sid, metadata_columns=True),
                f"{ns}.{tbl}#metacols@{wap_sid}",
            )
        if wap_sid is not None:
            return _view_for(
                table.scan(snapshot_id=wap_sid), f"{ns}.{tbl}@wap{wap_sid}"
            )
        return _view_for(table.scan(), f"{ns}.{tbl}")

    call = _CALL_RE.match(statement)
    if call is not None:
        return _run_procedure(catalog, call.group("proc").lower(), call.group("args"))
    desc = _DESCRIBE_RE.match(statement)
    if desc is not None:
        table = catalog.load_table(desc.group("ns"), desc.group("tbl"))
        rows = [
            (f.name, f.dataType.simpleString(), f.nullable)
            for f in table.schema.fields
        ]
        if desc.group("ext"):
            # Spark's DESCRIBE EXTENDED shape: a separator then the
            # table-metadata profile as (key, value) rows in the same
            # three columns
            snap = table.current_snapshot
            spec = table.default_spec
            extra = [
                ("", "", None),
                ("# Detailed Table Information", "", None),
                ("Location", table.location, None),
                (
                    "Partition Spec",
                    ", ".join(f"{f.transform}({f.source})" for f in spec)
                    if spec
                    else "unpartitioned",
                    None,
                ),
                (
                    "Identifier Fields",
                    ",".join(table.identifier_fields) or "(none)",
                    None,
                ),
                (
                    "Write Sort Order",
                    table.properties.get("write.sort-order", "(none)"),
                    None,
                ),
                (
                    "Current Snapshot",
                    str(snap["snapshot_id"]) if snap else "(none)",
                    None,
                ),
                ("Snapshots", str(len(table.meta["snapshots"])), None),
                ("Format Version", str(table.meta.get("format_version", 1)), None),
            ]
            rows += extra
        return spark.createDataFrame(
            rows, "col_name string, data_type string, nullable boolean"
        )
    ren = _RENAME_RE.match(statement)
    if ren is not None:
        ns2 = ren.group("ns2") or ren.group("ns")
        catalog.rename_table(ren.group("ns"), ren.group("tbl"), ns2, ren.group("new"))
        return spark.createDataFrame(
            [(f"{ren.group('ns')}.{ren.group('tbl')}", f"{ns2}.{ren.group('new')}")],
            "from string, to string",
        )
    mrg = _MERGE_RE.match(statement)
    if mrg is not None:
        sid = _run_merge(catalog, mrg, _depth, branch=wap_branch)
        return spark.createDataFrame(
            [("merge", sid)], "operation string, snapshot_id long"
        )
    ap = _ALTER_PARTITION_RE.match(statement)
    if ap is not None:
        table = catalog.load_table(ap.group("ns"), ap.group("tbl"))
        fields = list(table.default_spec)

        def _key(f) -> tuple:
            return (f.source.lower(), f.transform.lower())

        if ap.group("add"):
            new = _parse_partition_field(ap.group("add").strip())
            if any(_key(f) == _key(new) for f in fields):
                raise ValueError(f"partition field already in spec: {new.name}")
            fields.append(new)
        elif ap.group("drop"):
            tgt = _parse_partition_field(ap.group("drop").strip())
            kept = [f for f in fields if _key(f) != _key(tgt)]
            if len(kept) == len(fields):
                raise ValueError(f"partition field not in spec: {tgt.name}")
            fields = kept
        else:
            old = _parse_partition_field(ap.group("old").strip())
            new = _parse_partition_field(ap.group("new").strip())
            idx = next(
                (i for i, f in enumerate(fields) if _key(f) == _key(old)), None
            )
            if idx is None:
                raise ValueError(f"partition field not in spec: {old.name}")
            fields[idx] = new
        spec_id = table.set_partition_spec(fields)
        return spark.createDataFrame(
            [(f"{ap.group('ns')}.{ap.group('tbl')}", spec_id, len(fields))],
            "table string, spec_id int, n_partition_fields int",
        )
    col = _ALTER_COLUMN_RE.match(statement)
    if col is not None:
        table = catalog.load_table(col.group("ns"), col.group("tbl"))
        if col.group("add_name"):
            table.add_column(
                col.group("add_name"),
                col.group("add_type").strip(),
                default=col.group("add_default"),
            )
            action = f"add {col.group('add_name')}"
        elif col.group("ren_old"):
            table.rename_column(col.group("ren_old"), col.group("ren_new"))
            action = f"rename {col.group('ren_old')} to {col.group('ren_new')}"
        elif col.group("drop_name"):
            table.drop_column(col.group("drop_name"))
            action = f"drop {col.group('drop_name')}"
        else:
            table.promote_column(col.group("prm_name"), col.group("prm_type").strip())
            action = f"promote {col.group('prm_name')}"
        return spark.createDataFrame([(action,)], "action string")
    alter = _ALTER_REF_RE.match(statement)
    if alter is not None:
        table = catalog.load_table(alter.group("ns"), alter.group("tbl"))
        op, kind, name = (
            alter.group("op").upper(),
            alter.group("kind").upper(),
            alter.group("name"),
        )
        sid = int(alter.group("ver")) if alter.group("ver") else None
        if op == "DROP":
            table.drop_ref(name)
        elif op == "REPLACE" and kind == "TAG":
            table.drop_ref(name)
            table.create_tag(name, sid)
        elif kind == "TAG":
            table.create_tag(name, sid)
        else:
            table.create_branch(name, sid)
        return spark.createDataFrame(
            [(name, kind.lower(), op.lower())], "name string, type string, op string"
        )
    an = _ANALYZE_RE.match(statement)
    if an is not None:
        table = catalog.load_table(an.group("ns"), an.group("tbl"))
        cols = (
            [c.strip() for c in an.group("cols").split(",")]
            if an.group("cols")
            else None
        )
        table.analyze(cols)
        return table.column_stats_df()
    wo = _WRITE_ORDER_RE.match(statement)
    if wo is not None:
        table = catalog.load_table(wo.group("ns"), wo.group("tbl"))
        if wo.group("unordered"):
            table.properties.pop("write.sort-order", None)
            table.set_properties({})  # persist the removal
            order = ""
        else:
            order = ", ".join(
                c.strip() for c in wo.group("cols").split(",")
            )
            names = {f.name for f in table.schema.fields}
            bad = [c for c in order.split(",") if c.split()[0].strip() not in names]
            if bad:
                raise ValueError(f"WRITE ORDERED BY unknown columns: {bad}")
            table.set_properties({"write.sort-order": order})
        return spark.createDataFrame([(order,)], "sort_order string")
    idf = _IDENT_FIELDS_RE.match(statement)
    if idf is not None:
        table = catalog.load_table(idf.group("ns"), idf.group("tbl"))
        if idf.group("set"):
            cols = [c.strip() for c in idf.group("cols").split(",")]
            table.set_identifier_fields(cols)
            return spark.createDataFrame(
                [(",".join(cols),)], "identifier_fields string"
            )
        table.drop_identifier_fields()
        return spark.createDataFrame([("",)], "identifier_fields string")
    props_m = _SET_PROPS_RE.match(statement)
    if props_m is not None:
        table = catalog.load_table(props_m.group("ns"), props_m.group("tbl"))
        pairs = dict(
            (m.group("k"), m.group("v"))
            for m in _PROP_PAIR_RE.finditer(props_m.group("props"))
        )
        if not pairs:
            raise ValueError("SET TBLPROPERTIES needs 'k'='v' pairs")
        table.set_properties(pairs)
        return spark.createDataFrame(
            sorted(pairs.items()), "key string, value string"
        )
    props_m = _UNSET_PROPS_RE.match(statement)
    if props_m is not None:
        table = catalog.load_table(props_m.group("ns"), props_m.group("tbl"))
        keys = [k.strip().strip("'\"") for k in props_m.group("props").split(",") if k.strip()]
        removed = [k for k in keys if table.properties.pop(k, None) is not None]
        if removed:
            table.set_properties({})  # persist the removal (version bump)
        return spark.createDataFrame(
            [(k, k in removed) for k in keys], "key string, removed boolean"
        )
    props_m = _SHOW_PROPS_RE.match(statement)
    if props_m is not None:
        table = catalog.load_table(props_m.group("ns"), props_m.group("tbl"))
        rows = sorted((k, str(v)) for k, v in table.properties.items())
        return spark.createDataFrame(rows or [], "key string, value string")
    mvm = _CREATE_MV_RE.match(statement)
    if mvm is not None:
        from iceberg_metadata_pipeline_spark.catalog.matview import MaterializedView

        MaterializedView.create(
            catalog,
            mvm.group("ns"),
            mvm.group("view"),
            mvm.group("sql"),
            replace=mvm.group("replace") is not None,
        )
        return spark.createDataFrame(
            [(f"{mvm.group('ns')}.{mvm.group('view')}",)], "materialized_view string"
        )
    mvm = _REFRESH_MV_RE.match(statement)
    if mvm is not None:
        from iceberg_metadata_pipeline_spark.catalog.matview import MaterializedView

        res = MaterializedView(catalog, mvm.group("ns"), mvm.group("view")).refresh()
        return spark.createDataFrame(
            [(f"{mvm.group('ns')}.{mvm.group('view')}", res["mode"])],
            "materialized_view string, mode string",
        )
    mvm = _DROP_MV_RE.match(statement)
    if mvm is not None:
        from iceberg_metadata_pipeline_spark.catalog.matview import MaterializedView

        ns, view = mvm.group("ns"), mvm.group("view")
        try:
            MaterializedView(catalog, ns, view).drop()
            dropped = True
        except FileNotFoundError:
            if "IF EXISTS" not in statement.upper():
                raise
            dropped = False
        return spark.createDataFrame(
            [(f"{ns}.{view}", dropped)], "materialized_view string, dropped boolean"
        )
    ddl = _CREATE_VIEW_RE.match(statement)
    if ddl is not None:
        catalog.create_view(
            ddl.group("ns"),
            ddl.group("view"),
            ddl.group("sql"),
            replace=ddl.group("replace") is not None,
        )
        return spark.createDataFrame(
            [(f"{ddl.group('ns')}.{ddl.group('view')}",)], "view string"
        )
    show = _SHOW_VIEWS_RE.match(statement)
    if show is not None:
        ns = show.group("ns")
        rows = [(ns, v) for v in catalog.list_views(ns)]
        return spark.createDataFrame(rows or [], "namespace string, viewName string")
    show = _SHOW_TABLES_RE.match(statement)
    if show is not None:
        from iceberg_metadata_pipeline_spark.catalog.introspect import list_tables

        ns = show.group("ns")
        rows = [(ns, t) for t in list_tables(catalog, ns)]
        return spark.createDataFrame(rows or [], "namespace string, tableName string")
    show = _SHOW_PARTS_RE.match(statement)
    if show is not None:
        table = catalog.load_table(show.group("ns"), show.group("tbl"))
        return table.partitions_df()
    show = _SHOW_NS_RE.match(statement)
    if show is not None:
        rows = [(ns,) for ns in sorted(catalog.list_namespaces())]
        return spark.createDataFrame(rows or [], "namespace string")
    cns = _CREATE_NS_RE.match(statement)
    if cns is not None:
        catalog.ensure_namespace(cns.group("ns"))
        return spark.createDataFrame([(cns.group("ns"),)], "namespace string")
    show = _SHOW_CREATE_RE.match(statement)
    if show is not None:
        ns, obj = show.group("ns"), show.group("view")
        try:
            sql_text = catalog.view_definition(ns, obj)
            stmt = f"CREATE VIEW {ns}.{obj} AS {sql_text}"
        except KeyError:
            # plain table: render its DDL (the reference's A15/A16 path —
            # SHOW CREATE VIEW is rewritten onto tables and vice versa)
            from iceberg_metadata_pipeline_spark.catalog.introspect import (
                show_create_table,
            )

            stmt = show_create_table(catalog, ns, obj)
        return spark.createDataFrame([(stmt,)], "createtab_stmt string")
    ct = _CREATE_TABLE_RE.match(statement)
    if ct is not None:
        from pyspark.sql import types as T

        schema = T.StructType.fromDDL(ct.group("cols"))
        spec = [
            _parse_partition_field(raw)
            for raw in _split_top_level(ct.group("parts") or "")
        ]
        if_not_exists = re.search(r"IF\s+NOT\s+EXISTS", statement, re.IGNORECASE)
        catalog.create_table(
            ct.group("ns"),
            ct.group("tbl"),
            schema,
            or_load=bool(if_not_exists),
            partition_spec=spec or None,
        )
        return spark.createDataFrame(
            [(f"{ct.group('ns')}.{ct.group('tbl')}", len(spec))],
            "table string, n_partition_fields int",
        )
    dt = _DROP_TABLE_RE.match(statement)
    if dt is not None:
        existed = catalog.drop_table(
            dt.group("ns"), dt.group("tbl"), purge=dt.group("purge") is not None
        )
        if not existed and not dt.group("exists"):
            raise FileNotFoundError(f"no table {dt.group('ns')}.{dt.group('tbl')}")
        return spark.createDataFrame([(existed,)], "dropped boolean")
    trunc = _TRUNCATE_RE.match(statement)
    if trunc is not None:
        table = catalog.load_table(trunc.group("ns"), trunc.group("tbl"))
        sid = table.truncate()
        return spark.createDataFrame(
            [("truncate", sid)], "operation string, snapshot_id long"
        )
    ctas = _CTAS_RE.match(statement)
    if ctas is not None:
        ns, name = ctas.group("ns"), ctas.group("tbl")
        src = catalog_sql(catalog, ctas.group("body"), _depth=_depth + 1)
        if ctas.group("replace") and catalog.table_exists(ns, name):
            catalog.drop_table(ns, name, purge=True)
        table = catalog.create_table(ns, name, src.schema, or_load=False)
        sid = table.append_dataframe(src)
        return spark.createDataFrame(
            [(f"{ns}.{name}", sid)], "table string, snapshot_id long"
        )
    ins = _DML_INSERT_RE.match(statement)
    if ins is not None:
        table = catalog.load_table(ins.group("ns"), ins.group("tbl"))
        # the source query runs through the same front-end (catalog refs,
        # time travel, views all compose); columns align by POSITION and
        # cast to the table schema — SQL INSERT semantics
        src = catalog_sql(catalog, ins.group("body"), _depth=_depth + 1)
        fields = table.schema.fields
        if ins.group("byname") and ins.group("cols"):
            raise ValueError(
                "INSERT cannot combine an explicit column list with BY NAME"
            )
        if ins.group("byname"):
            # INSERT ... BY NAME (Spark 4): columns align by SOURCE NAME,
            # not position; unmentioned target columns get their declared
            # default, else NULL (same rule as an explicit column list)
            import json as _json

            names = {f.name.lower(): f.name for f in fields}
            bad = [c for c in src.columns if c.lower() not in names]
            if bad:
                raise ValueError(f"INSERT BY NAME columns not in schema: {bad}")
            by_name = {names[c.lower()]: c for c in src.columns}
            defaults = _json.loads(table.properties.get("column-defaults", "{}"))
            exprs = []
            for f in fields:
                if f.name in by_name:
                    e = F.col(by_name[f.name])
                elif f.name in defaults:
                    e = F.expr(str(defaults[f.name]["initial"]))
                else:
                    e = F.lit(None)
                exprs.append(e.cast(f.dataType).alias(f.name))
            aligned = src.select(*exprs)
        elif ins.group("cols"):
            # explicit column list: values map to the NAMED columns;
            # unmentioned columns get their declared default, else NULL
            import json as _json

            listed = [c.strip() for c in ins.group("cols").split(",")]
            names = {f.name for f in fields}
            bad = [c for c in listed if c not in names]
            if bad:
                raise ValueError(f"INSERT column list not in schema: {bad}")
            if len(src.columns) != len(listed):
                raise ValueError(
                    f"INSERT supplies {len(src.columns)} values for "
                    f"{len(listed)} listed columns"
                )
            by_name = dict(zip(listed, src.columns))
            defaults = _json.loads(table.properties.get("column-defaults", "{}"))
            exprs = []
            for f in fields:
                if f.name in by_name:
                    e = F.col(by_name[f.name])
                elif f.name in defaults:
                    e = F.expr(str(defaults[f.name]["initial"]))
                else:
                    e = F.lit(None)
                exprs.append(e.cast(f.dataType).alias(f.name))
            aligned = src.select(*exprs)
        else:
            if len(src.columns) != len(fields):
                raise ValueError(
                    f"INSERT column count {len(src.columns)} != table arity {len(fields)}"
                )
            aligned = src.select(
                *[
                    F.col(src.columns[i]).cast(f.dataType).alias(f.name)
                    for i, f in enumerate(fields)
                ]
            )
        if ins.group("mode").upper() == "OVERWRITE":
            # Iceberg semantics: INSERT OVERWRITE on a partitioned table
            # is DYNAMIC — replaces only the partitions the data touches
            if wap_branch:
                raise ValueError(
                    "INSERT OVERWRITE under spark.wap.branch is not supported; "
                    "unset the WAP branch or use append/MERGE"
                )
            sid = table.overwrite_partitions(aligned)
            op = "overwrite"
        else:
            sid = table.append_dataframe(aligned, branch=wap_branch)
            op = "append"
        return spark.createDataFrame(
            [(op, sid)], "operation string, snapshot_id long"
        )
    dml = _DML_DELETE_RE.match(statement)
    if dml is not None:
        table = catalog.load_table(dml.group("ns"), dml.group("tbl"))
        insub = _DELETE_IN_SUBQ_RE.match(dml.group("cond"))
        if insub is not None and not _balanced(insub.group("sub")):
            raise ValueError(
                "DELETE supports either a plain predicate or exactly one "
                "IN (SELECT ...) predicate, not a compound of both"
            )
        if insub is not None:
            # scale-true translation: materialize the subquery's key set
            # and commit it as an equality-delete file (merge-on-read) —
            # the keys shuffle, the table never does. Key columns take
            # the TARGET's names and types.
            cols = (
                [c.strip() for c in insub.group("cols").split(",")]
                if insub.group("cols")
                else [insub.group("col")]
            )
            # identifiers resolve case-insensitively, like Spark SQL
            names = {f.name.lower(): f for f in table.schema.fields}
            bad = [c for c in cols if c.lower() not in names]
            if bad:
                raise ValueError(f"DELETE IN-subquery keys not in schema: {bad}")
            cols = [names[c.lower()].name for c in cols]
            keys = catalog_sql(catalog, insub.group("sub"), _depth=_depth + 1)
            if len(keys.columns) != len(cols):
                raise ValueError(
                    f"DELETE IN-subquery returns {len(keys.columns)} columns "
                    f"for {len(cols)} keys"
                )
            keys = keys.select(
                *[
                    F.col(keys.columns[i]).cast(names[c.lower()].dataType).alias(c)
                    for i, c in enumerate(cols)
                ]
            ).distinct()
            sid = table.delete_keys_mor(keys, branch=wap_branch)
        else:
            # an IN-subquery buried in a compound condition (e.g.
            # "id IN (SELECT ...) AND x = 3") misses _DELETE_IN_SUBQ_RE
            # entirely — catch it here so the user gets the same clear
            # compound-predicate error, not an opaque AnalysisException
            # from F.expr over the raw subquery text
            if re.search(r"\bIN\s*\(\s*(SELECT|WITH)\b", dml.group("cond"), re.I):
                raise ValueError(
                    "DELETE supports either a plain predicate or exactly one "
                    "IN (SELECT ...) predicate, not a compound of both"
                )
            sid = table.delete_where(dml.group("cond"), branch=wap_branch)
        return spark.createDataFrame(
            [("delete", sid)], "operation string, snapshot_id long"
        )
    dml = _DML_UPDATE_RE.match(statement)
    if dml is not None:
        table = catalog.load_table(dml.group("ns"), dml.group("tbl"))
        insub = _DELETE_IN_SUBQ_RE.match(dml.group("cond"))
        if insub is not None and not _balanced(insub.group("sub")):
            raise ValueError(
                "UPDATE supports either a plain predicate or exactly one "
                "IN (SELECT ...) predicate, not a compound of both"
            )
        if insub is not None:
            # UPDATE ... WHERE k IN (SELECT ...) rewrites to MERGE on the
            # key set: a shuffle join on the key, not a per-row subquery —
            # the same scale-true translation as the IN-subquery DELETE.
            cols = (
                [c.strip() for c in insub.group("cols").split(",")]
                if insub.group("cols")
                else [insub.group("col")]
            )
            names = {f.name.lower(): f for f in table.schema.fields}
            bad = [c for c in cols if c.lower() not in names]
            if bad:
                raise ValueError(f"UPDATE IN-subquery keys not in schema: {bad}")
            cols = [names[c.lower()].name for c in cols]
            keys = catalog_sql(catalog, insub.group("sub"), _depth=_depth + 1)
            if len(keys.columns) != len(cols):
                raise ValueError(
                    f"UPDATE IN-subquery returns {len(keys.columns)} columns "
                    f"for {len(cols)} keys"
                )
            keys = keys.select(
                *[
                    F.col(keys.columns[i]).cast(names[c.lower()].dataType).alias(c)
                    for i, c in enumerate(cols)
                ]
            ).distinct()
            sid = table.merge_into(
                keys,
                on=cols,
                when_matched=[
                    {
                        "condition": None,
                        "action": "update",
                        "set": _parse_assignments(dml.group("sets")),
                    }
                ],
                when_not_matched=[],
                branch=wap_branch,
            )
        else:
            # same compound-IN-subquery detection as the DELETE fallback
            if re.search(r"\bIN\s*\(\s*(SELECT|WITH)\b", dml.group("cond"), re.I):
                raise ValueError(
                    "UPDATE supports either a plain predicate or exactly one "
                    "IN (SELECT ...) predicate, not a compound of both"
                )
            sid = table.update_set(
                dml.group("cond"), _parse_assignments(dml.group("sets")),
                branch=wap_branch,
            )
        return spark.createDataFrame(
            [("update", sid)], "operation string, snapshot_id long"
        )
    rewritten = _META_RE.sub(_meta, statement)
    rewritten = _TT_RE.sub(_tt, rewritten)
    return spark.sql(rewritten)


def _run_merge(
    catalog: Catalog, mrg: "re.Match", _depth: int, branch: str | None = None
) -> int:
    """Translate a general MERGE INTO statement to Table.merge_into's
    clause-list form. The ON conjunctions may join differently-named
    columns (``ON t.k = s.kk``): the source DataFrame is re-projected so
    each join column carries the TARGET's name, and every expression's
    ``s.<col>`` references are rewritten to the renamed ``src_<col>``
    convention merge_into expects. WHEN clauses translate 1:1 (first
    match wins, like Spark); INSERT column lists become explicit values
    dicts (absent columns insert NULL)."""
    table = catalog.load_table(mrg.group("ns"), mrg.group("tbl"))
    src_text = mrg.group("src")
    if src_text.startswith("("):
        source = catalog_sql(catalog, src_text[1:-1], _depth=_depth + 1)
    else:
        source = catalog_sql(catalog, f"SELECT * FROM {src_text}", _depth=_depth + 1)
    talias = (mrg.group("talias") or mrg.group("tbl")).lower()
    salias = (mrg.group("salias") or "s").lower()

    # canonicalize parsed column names against the TARGET schema: SQL
    # identifiers are case-insensitive but merge_into's set/values dicts
    # are case-SENSITIVE python lookups against f.name — a lowercased
    # 'total' key would silently skip the update of column 'Total'
    tnames = {f.name.lower(): f.name for f in table.schema.fields}

    def canon(name: str) -> str:
        return tnames.get(name.lower(), name)

    # ON: t.<col> = s.<col2> conjunctions, either operand order
    key_map: dict[str, str] = {}  # target col -> source col
    found_any = False
    for conj in re.split(r"\s+AND\s+", mrg.group("on"), flags=re.IGNORECASE):
        m2 = re.match(
            rf"^\s*({_IDENT})\.({_IDENT})\s*=\s*({_IDENT})\.({_IDENT})\s*$", conj
        )
        if m2 is None:
            raise ValueError(
                f"MERGE ON conjunct {conj!r} is not an equi-key "
                "t.<col> = s.<col> comparison"
            )
        a1, c1, a2, c2 = (g.lower() for g in m2.groups())
        if {a1, a2} != {talias, salias}:
            raise ValueError(f"MERGE ON aliases {a1}/{a2} != {talias}/{salias}")
        tcol, scol = (c1, c2) if a1 == talias else (c2, c1)
        key_map[canon(tcol)] = scol
        found_any = True
    if not found_any:
        raise ValueError("MERGE ON clause has no equi-key")

    # re-project the source so join columns carry the target's names;
    # a non-key source column whose name collides with a renamed key is
    # dropped (it would be ambiguous after the rename)
    lower_cols = {c.lower(): c for c in source.columns}
    sel = []
    taken = set()
    for tcol, scol in key_map.items():
        if scol not in lower_cols:
            raise ValueError(f"MERGE ON references unknown source column {scol}")
        sel.append(F.col(lower_cols[scol]).alias(tcol))
        taken.add(tcol)
    key_sources = set(key_map.values())
    for c in source.columns:
        lc = c.lower()
        if lc in key_sources or lc in taken:
            continue
        sel.append(F.col(c))
        taken.add(lc)
    source = source.select(*sel)

    # a source column used as a join key is addressed by its TARGET
    # name after the re-projection above
    inv = {scol: tcol for tcol, scol in key_map.items()}

    def rewrite(expr: str) -> str:
        """s.<col> → src_<renamed col>; t.<col> → bare column."""
        expr = re.sub(
            rf"\b{salias}\.({_IDENT})",
            lambda m3: f"src_{inv.get(m3.group(1).lower(), m3.group(1))}",
            expr,
            flags=re.IGNORECASE,
        )
        return re.sub(rf"\b{talias}\.({_IDENT})", r"\1", expr, flags=re.IGNORECASE)

    when_matched: list[dict] = []
    when_not_matched: list[dict] = []
    when_nbs: list[dict] = []
    clauses_text = mrg.group("clauses")
    pos = 0  # every character must belong to a parsed clause: a silently
    for cm in _MERGE_WHEN_RE.finditer(clauses_text):  # skipped clause is
        if clauses_text[pos : cm.start()].strip():  # a wrong merge result
            raise ValueError(
                f"unparseable MERGE text: {clauses_text[pos:cm.start()]!r}"
            )
        pos = cm.end()
        cond = rewrite(cm.group("cond")) if cm.group("cond") else None
        is_not = cm.group("not") is not None
        by_src = cm.group("bysrc") is not None
        if cm.group("sets") is not None:
            sets = {
                canon(name.split(".")[-1]): rewrite(expr)
                for name, expr in _parse_assignments(cm.group("sets")).items()
            }
            clause = {"condition": cond, "action": "update", "set": sets}
        elif cm.group("delete") is not None:
            clause = {"condition": cond, "action": "delete"}
        else:  # INSERT
            if not is_not or by_src:
                raise ValueError("INSERT is only valid in WHEN NOT MATCHED")
            if cm.group("star") is not None:
                values = None
            else:
                cols = [canon(c.strip().split(".")[-1])
                        for c in cm.group("inscols").split(",") if c.strip()]
                vals = [rewrite(v.strip()) for v in _split_top_level(cm.group("insvals"))]
                if len(cols) != len(vals):
                    raise ValueError(
                        f"INSERT column list has {len(cols)} names "
                        f"but {len(vals)} values"
                    )
                values = dict(zip(cols, vals))
            when_not_matched.append({"condition": cond, "values": values})
            continue
        if is_not and by_src:
            when_nbs.append(clause)
        elif not is_not:
            when_matched.append(clause)
        else:
            raise ValueError("WHEN NOT MATCHED supports only INSERT")
    if clauses_text[pos:].strip() or pos == 0:
        raise ValueError(f"unparseable MERGE WHEN clauses: {clauses_text[pos:]!r}")

    return table.merge_into(
        source,
        on=list(key_map),
        when_matched=when_matched,
        when_not_matched=when_not_matched,
        when_not_matched_by_source=when_nbs,
        branch=branch,
    )


def _split_top_level(text: str) -> list[str]:
    """Split on commas outside parentheses; drops empty pieces."""
    parts: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p for p in parts if p.strip()]


def _parse_assignments(sets: str) -> dict[str, str]:
    """Split ``a = expr, b = expr`` on top-level commas only (an expr may
    itself contain commas inside parens, e.g. ``concat(a, b)``)."""
    parts = _split_top_level(sets)
    out: dict[str, str] = {}
    for part in parts:
        name, _, expr = part.partition("=")
        if not expr:
            raise ValueError(f"unparseable SET assignment: {part!r}")
        out[name.strip()] = expr.strip()
    return out


# -- CALL procedures --------------------------------------------------------

_ARG_RE = re.compile(
    rf"\s*(?:(?P<name>{_IDENT})\s*=>\s*)?(?:'(?P<str>[^']*)'|(?P<num>-?\d+)"
    r"|(?P<bool>true|false))\s*$",
    re.IGNORECASE,
)

# positional argument order per procedure (table ref always first —
# Iceberg's convention: CALL cat.system.rollback_to_snapshot('db.t', 123))
_PROC_POSITIONAL = {
    "rollback_to_snapshot": ["table", "snapshot_id"],
    "rollback_to_timestamp": ["table", "timestamp"],
    "expire_snapshots": ["table", "keep_last", "older_than"],
    "remove_orphan_files": ["table", "dry_run"],
    "rewrite_data_files": ["table", "target_num_files", "strategy", "sort_order"],
    "rewrite_manifests": ["table"],
    "rewrite_position_delete_files": ["table"],
    "add_files": ["table", "source_dir"],
    "snapshot": ["source_table", "table"],
    "compute_table_stats": ["table", "columns"],
    "fast_forward": ["table", "branch"],
    "create_changelog_view": [
        "table",
        "start_snapshot_id",
        "end_snapshot_id",
        "changelog_view",
    ],
    "cherrypick_snapshot": ["table", "snapshot_id"],
    # format-interop procedures (round 6): the Iceberg/Delta format
    # layers reachable from plain SQL
    "export_iceberg": ["table", "location"],
    "import_iceberg": ["location", "table"],
    "export_delta": ["table", "location"],
    "import_delta": ["location", "table"],
    "export_hudi": ["table", "location"],
    "import_hudi": ["location", "table"],
    # format-directory maintenance verbs (round 7)
    "optimize_delta": ["location", "target_file_rows"],
    "restore_delta": ["location", "version"],
    "clone_delta": ["location", "dest"],
    "compact_hudi": ["location"],
    "cluster_hudi": ["location", "target_file_rows"],
    "savepoint_hudi": ["location", "instant"],
    "restore_hudi": ["location", "savepoint"],
    "expire_iceberg_metadata": ["location", "keep_last"],
}


def _parse_call_args(proc: str, raw: str) -> dict:
    order = _PROC_POSITIONAL.get(proc)
    if order is None:
        raise ValueError(f"unknown procedure system.{proc}")
    out: dict[str, object] = {}
    if not raw.strip():
        return out
    for i, part in enumerate(raw.split(",")):
        m = _ARG_RE.match(part)
        if m is None:
            raise ValueError(f"unparseable CALL argument: {part!r}")
        if m.group("str") is not None:
            val: object = m.group("str")
        elif m.group("num") is not None:
            val = int(m.group("num"))
        else:
            val = m.group("bool").lower() == "true"
        name = m.group("name")
        if name is None:
            if i >= len(order):
                raise ValueError(f"too many positional args for system.{proc}")
            name = order[i]
        out[name.lower()] = val
    return out


def _run_procedure(catalog: Catalog, proc: str, raw_args: str) -> DataFrame:
    """Iceberg stored procedures. Each returns a small result DataFrame
    (Iceberg's CALL contract), so procedure output composes with the rest
    of the harness like any query."""
    spark = catalog.spark
    args = _parse_call_args(proc, raw_args)
    if proc == "snapshot":
        # zero-copy table clone (Iceberg's snapshot procedure): the new
        # table registers the SOURCE's current visible state — data files
        # AND pending MOR deletes, deep-copied with their sequence
        # numbers (Table.clone_from) — O(metadata), no data moves; the
        # clone then evolves independently of the source
        sref = str(args["source_table"])
        dref = str(args["table"])
        sns, sname = sref.split(".", 1)
        dns, dname = dref.split(".", 1)
        src = catalog.load_table(sns, sname)
        dst = catalog.create_table(dns, dname, src.schema, or_load=False)
        files = src.snapshot_files()
        dst.clone_from(src)
        return spark.createDataFrame(
            [(sref, dref, len(files))],
            "source string, table string, imported_files_count int",
        )
    if proc in ("import_iceberg", "import_delta", "import_hudi"):
        # target table does not exist yet — resolved here, not via load
        dref = str(args["table"])
        dns, dname = dref.split(".", 1)
        loc = str(args["location"])
        if proc == "import_iceberg":
            from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
                import_iceberg_table,
            )

            t = import_iceberg_table(spark, catalog, loc, dns, dname)
        elif proc == "import_hudi":
            from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
                import_hudi_table,
            )

            t = import_hudi_table(spark, catalog, loc, dns, dname)
        else:
            from iceberg_metadata_pipeline_spark.catalog.delta_format import (
                import_delta_table,
            )

            t = import_delta_table(spark, catalog, loc, dns, dname)
        return spark.createDataFrame(
            [(loc, dref, len(t.snapshot_files()))],
            "location string, table string, imported_files_count int",
        )
    if proc in (
        "optimize_delta",
        "restore_delta",
        "clone_delta",
        "compact_hudi",
        "cluster_hudi",
        "savepoint_hudi",
        "restore_hudi",
        "expire_iceberg_metadata",
    ):
        # format-directory maintenance verbs: these act on a LOCATION
        # (an exported/foreign table dir), not a metacat table
        loc = str(args["location"])
        if proc == "optimize_delta":
            from iceberg_metadata_pipeline_spark.catalog.delta_format import (
                optimize_delta,
            )

            v = optimize_delta(
                spark, loc,
                target_file_rows=int(args.get("target_file_rows", 1_000_000)),
            )
            return spark.createDataFrame(
                [(loc, v)], "location string, version long"
            )
        if proc == "restore_delta":
            from iceberg_metadata_pipeline_spark.catalog.delta_format import (
                restore_delta,
            )

            v = restore_delta(loc, int(args["version"]))
            return spark.createDataFrame(
                [(loc, int(args["version"]), v)],
                "location string, restored_version long, commit_version long",
            )
        if proc == "clone_delta":
            from iceberg_metadata_pipeline_spark.catalog.delta_format import (
                clone_delta,
            )

            dest = str(args["dest"])
            clone_delta(loc, dest)
            return spark.createDataFrame(
                [(loc, dest)], "source string, dest string"
            )
        if proc == "compact_hudi":
            from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
                compact_mor,
            )

            instant = compact_mor(loc, spark=spark)
            return spark.createDataFrame(
                [(loc, instant)], "location string, instant string"
            )
        if proc == "cluster_hudi":
            from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
                cluster_hudi,
            )

            instant = cluster_hudi(
                loc,
                target_file_rows=int(args.get("target_file_rows", 1_000_000)),
                spark=spark,
            )
            return spark.createDataFrame(
                [(loc, instant)], "location string, instant string"
            )
        if proc == "savepoint_hudi":
            from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
                savepoint_hudi,
            )

            instant = savepoint_hudi(loc, args.get("instant"))
            return spark.createDataFrame(
                [(loc, instant)], "location string, savepoint string"
            )
        if proc == "restore_hudi":
            from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
                restore_hudi,
            )

            removed = restore_hudi(loc, str(args["savepoint"]))
            return spark.createDataFrame(
                [(loc, len(removed))], "location string, files_removed int"
            )
        from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
            expire_iceberg_metadata,
        )

        removed = expire_iceberg_metadata(
            loc, keep_last=int(args.get("keep_last", 2))
        )
        return spark.createDataFrame(
            [(loc, len(removed))], "location string, files_removed int"
        )

    tref = args.pop("table", None)
    if not isinstance(tref, str) or "." not in tref:
        raise ValueError(f"system.{proc} needs table => 'ns.name'")
    ns, name = tref.split(".", 1)
    table = catalog.load_table(ns, name)

    if proc == "export_iceberg":
        from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
            export_iceberg_table,
        )

        meta_path = export_iceberg_table(table, str(args["location"]))
        return spark.createDataFrame(
            [(tref, meta_path)], "table string, metadata_path string"
        )
    if proc == "export_delta":
        from iceberg_metadata_pipeline_spark.catalog.delta_format import (
            export_delta_table,
        )

        v = export_delta_table(table, str(args["location"]))
        return spark.createDataFrame(
            [(tref, str(args["location"]), v)],
            "table string, location string, version long",
        )
    if proc == "export_hudi":
        from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
            export_hudi_table,
        )

        instant = export_hudi_table(table, str(args["location"]))
        return spark.createDataFrame(
            [(tref, str(args["location"]), instant)],
            "table string, location string, instant string",
        )

    if proc == "rollback_to_snapshot":
        prev = table.meta.get("current_snapshot_id")
        table.rollback_to_snapshot(int(args["snapshot_id"]))
        rows = [(prev, table.meta["current_snapshot_id"])]
        return spark.createDataFrame(
            rows, "previous_snapshot_id long, current_snapshot_id long"
        )
    if proc == "rollback_to_timestamp":
        prev = table.meta.get("current_snapshot_id")
        table.rollback_to_timestamp(_parse_ts_ms(str(args["timestamp"])))
        return spark.createDataFrame(
            [(prev, table.meta["current_snapshot_id"])],
            "previous_snapshot_id long, current_snapshot_id long",
        )
    if proc == "expire_snapshots":
        older = args.get("older_than")
        orphaned = table.expire_snapshots(
            keep_last=int(args.get("keep_last", 1)),
            older_than_ms=_parse_ts_ms(str(older)) if older is not None else None,
        )
        return spark.createDataFrame(
            [(len(table.meta["snapshots"]), len(orphaned))],
            "remaining_snapshots int, orphaned_files int",
        )
    if proc == "remove_orphan_files":
        orphans = table.remove_orphan_files(dry_run=bool(args.get("dry_run", False)))
        return spark.createDataFrame(
            [(p,) for p in orphans] or [], "orphan_file_location string"
        )
    if proc == "rewrite_data_files":
        n_before = len(table.snapshot_files())
        if str(args.get("strategy", "")).lower() == "binpack":
            # Iceberg's binpack strategy: only small files move, one
            # replace commit, partition layout preserved
            table.rewrite_small_files()
        else:
            # Iceberg sort strategy: sort_order => 'zorder(a,b)' or 'a,b'
            so = str(args.get("sort_order", "") or "")
            m = re.match(r"^\s*zorder\s*\(([^)]*)\)\s*$", so, re.IGNORECASE)
            cols = [c.strip() for c in (m.group(1) if m else so).split(",") if c.strip()]
            table.rewrite_data_files(
                target_num_files=int(args.get("target_num_files", 1)),
                sort_by=cols if cols and not m else None,
                zorder_by=cols if m else None,
            )
        return spark.createDataFrame(
            [(n_before, len(table.snapshot_files()))],
            "rewritten_data_files_count int, added_data_files_count int",
        )
    if proc == "add_files":
        # Iceberg's metadata-only file registration (the reference's core
        # ingest operator A10, ImportParquetFolders.java:102-117): footers
        # are scanned for stats, no data is copied or rewritten
        from iceberg_metadata_pipeline_spark.catalog.metacat import (
            scan_parquet_footers,
        )

        entries = scan_parquet_footers(str(args["source_dir"]), spark)
        before = {f.path for f in table.snapshot_files()}
        table.append_files(entries)
        table.refresh()
        added = len({f.path for f in table.snapshot_files()} - before)
        return spark.createDataFrame(
            [(added, len(entries))], "added_files_count int, source_files_count int"
        )
    if proc == "compute_table_stats":
        # Iceberg's compute_table_stats analogue: per-file bloom filters
        # for the named columns (comma-separated)
        cols = [c.strip() for c in str(args.get("columns", "")).split(",") if c.strip()]
        if not cols:
            raise ValueError("compute_table_stats needs columns => 'a,b'")
        for c in cols:
            table.refresh()
            table.build_bloom_filters(c)
        return spark.createDataFrame(
            [(len(cols), len(table.snapshot_files()))],
            "statistics_columns int, files_count int",
        )
    if proc == "cherrypick_snapshot":
        sid = table.cherrypick_snapshot(int(args["snapshot_id"]))
        return spark.createDataFrame(
            [(int(args["snapshot_id"]), sid)],
            "source_snapshot_id long, current_snapshot_id long",
        )
    if proc == "create_changelog_view":
        # Iceberg's create_changelog_view: registers the row-level change
        # feed between two snapshots as a queryable temp view (UPDATEs
        # surface as delete+insert pairs; cost O(changed files))
        start = args.get("start_snapshot_id")
        if start is None:
            raise ValueError("create_changelog_view needs start_snapshot_id")
        end = args.get("end_snapshot_id")
        view = str(args.get("changelog_view", f"{name}_changes"))
        # compute_updates (Iceberg's same-named option): pair update
        # pre/post images by row lineage instead of delete+insert
        compute = str(args.get("compute_updates", "false")).lower() in ("true", "1")
        table.changelog(
            int(start),
            int(end) if end is not None else None,
            compute_updates=compute,
        ).createOrReplaceTempView(view)
        return spark.createDataFrame([(view,)], "changelog_view string")
    if proc == "rewrite_position_delete_files":
        # Iceberg's procedure both drops dead delete files and compacts
        # the rest: purge inert entries first, then consolidate the
        # surviving position entries into one DV-style entry
        dropped, kept = table.rewrite_delete_files()
        pos_before, pos_after = table.refresh().consolidate_position_deletes()
        dropped += max(0, pos_before - pos_after)
        kept -= max(0, pos_before - pos_after)
        return spark.createDataFrame(
            [(dropped, kept)],
            "removed_delete_files_count int, remaining_delete_files_count int",
        )
    if proc == "rewrite_manifests":
        collapsed = table.rewrite_manifests()
        return spark.createDataFrame(
            [(collapsed, 1 if collapsed else 0)],
            "rewritten_manifests_count int, added_manifests_count int",
        )
    if proc == "fast_forward":
        prev = table.meta.get("current_snapshot_id")
        head = table.publish_branch(str(args["branch"]))
        return spark.createDataFrame(
            [(prev, head)], "previous_snapshot_id long, current_snapshot_id long"
        )
    raise ValueError(f"unknown procedure system.{proc}")
