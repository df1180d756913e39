"""Incremental materialized views over catalog tables.

A materialized view here is three cooperating pieces:

1. a **hidden state table** ``ns.__mv__<name>`` (a regular catalog table,
   so it gets snapshots/time-travel for free) holding *mergeable* aggregate
   state per group — counts and sums as running totals, min/max as running
   extremes, avg decomposed into (sum, count);
2. a **catalog view** ``ns.<name>`` whose stored SQL finalizes the state
   (e.g. ``CAST(__sum__x AS DOUBLE)/__cnt__x AS x``), so any read through
   the SQL front-end sees the user-facing schema and never touches the
   source table;
3. a **refresh** operation that advances the state to the source's current
   snapshot. If every commit since the last refresh is append-only, it
   computes partial state over ONLY the appended files
   (``Table.scan_incremental``) and merges it with the stored state —
   O(new data) + O(MV size), the source is never rescanned. Any
   non-append commit in the range (delete/overwrite breaks min/max
   subtractability) falls back to a full recompute, and says so.

This is the aggregate-maintenance pattern a 100 TB deployment needs: a
nightly dashboard rollup over a table growing 1 TB/day costs 1 TB + the
(tiny) MV merge per refresh, not a 100 TB rescan. The supported aggregate
grammar is exactly the algebraic set that merges losslessly: COUNT(*) /
COUNT(expr) / SUM / MIN / MAX / AVG over arbitrary expressions, with an
optional WHERE (applied identically to full and delta passes).

Reference parity note: the reference ships no MV engine — this extends
the deployed Spark SQL surface (SURVEY.md §2.D) with the standard
materialized-view statements BI tools issue (CREATE/REFRESH/DROP
MATERIALIZED VIEW).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog, Table

STATE_PREFIX = "__mv__"

_MV_SQL_RE = re.compile(
    r"^\s*SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<ns>\w+)\.(?P<tbl>\w+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"\s+GROUP\s+BY\s+(?P<group>.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_AGG_ITEM_RE = re.compile(
    r"^(?P<kind>count|sum|min|max|avg)\s*\(\s*(?P<expr>.+?)\s*\)\s+AS\s+(?P<alias>\w+)$",
    re.IGNORECASE | re.DOTALL,
)


def _split_top_level(text: str) -> list[str]:
    """Split a select-list on commas not nested inside parentheses."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[start:i].strip())
            start = i + 1
    parts.append(text[start:].strip())
    return [p for p in parts if p]


def parse_mv_sql(sql: str) -> dict:
    """Parse the constrained MV grammar into a definition dict. Raises
    ValueError (with the unsupported construct named) on anything the
    incremental maintainer can't merge — better a loud no than a silent
    wrong answer after the first refresh."""
    m = _MV_SQL_RE.match(sql.strip().rstrip(";"))
    if m is None:
        raise ValueError(
            "materialized view grammar: SELECT <group keys + aggregates AS alias> "
            "FROM ns.table [WHERE ...] GROUP BY <keys>"
        )
    group_items = [c.strip() for c in _split_top_level(m.group("group"))]
    specs: list[dict] = []
    keys: list[dict] = []  # {"expr": source expression, "alias": state col}
    for item in _split_top_level(m.group("items")):
        am = _AGG_ITEM_RE.match(item)
        if am is not None and am.group("kind").lower() in ("count", "sum", "min", "max", "avg"):
            specs.append(
                {
                    "kind": am.group("kind").lower(),
                    "expr": am.group("expr"),
                    "alias": am.group("alias"),
                }
            )
            continue
        # group key: plain column, or '<expr> AS alias' whose expr (or
        # alias — time_bucket rollups group by the bucket) is in GROUP BY
        km = re.match(r"^(?P<expr>.+?)\s+AS\s+(?P<alias>\w+)$", item, re.IGNORECASE | re.DOTALL)
        expr, alias = (km.group("expr"), km.group("alias")) if km else (item, item)
        if expr in group_items or alias in group_items:
            keys.append({"expr": expr, "alias": alias})
            continue
        raise ValueError(
            f"unsupported select item {item!r}: must be a GROUP BY key or "
            "COUNT/SUM/MIN/MAX/AVG(...) AS alias (the mergeable aggregate set)"
        )
    if not specs:
        raise ValueError("materialized view needs at least one aggregate")
    if len(keys) != len(group_items):
        raise ValueError(
            "every GROUP BY key must appear in the select list (the MV's "
            f"stored state needs the key columns): keys={keys} group={group_items}"
        )
    return {
        "source_ns": m.group("ns"),
        "source_tbl": m.group("tbl"),
        "where": (m.group("where") or "").strip() or None,
        "group_keys": keys,
        "specs": specs,
    }


# -- state algebra -----------------------------------------------------------
# partial:  raw rows        → one state row per group
# merge:    state rows      → one state row per group (sums add, extremes fold)
# finalize: state row       → user-facing columns


def _state_cols(spec: dict) -> list[str]:
    a = spec["alias"]
    return {
        "count": [f"__cnt__{a}"],
        "sum": [f"__sum__{a}"],
        "min": [f"__min__{a}"],
        "max": [f"__max__{a}"],
        "avg": [f"__sum__{a}", f"__cnt__{a}"],
    }[spec["kind"]]


def partial_state(df: DataFrame, mv: dict) -> DataFrame:
    """Raw source rows → mergeable per-group state. Fractional sums
    accumulate in decimal(38,10) so merge order can never wobble the
    result (float summation is order-dependent; decimal isn't)."""
    if mv["where"]:
        df = df.filter(mv["where"])
    aggs = []
    for spec in mv["specs"]:
        kind, expr, a = spec["kind"], spec["expr"], spec["alias"]
        if kind == "count":
            src = F.count(F.lit(1)) if expr.strip() == "*" else F.count(F.expr(expr))
            aggs.append(src.alias(f"__cnt__{a}"))
        elif kind == "sum":
            aggs.append(F.sum(F.expr(expr).cast("decimal(38,10)")).alias(f"__sum__{a}"))
        elif kind == "min":
            aggs.append(F.min(F.expr(expr)).alias(f"__min__{a}"))
        elif kind == "max":
            aggs.append(F.max(F.expr(expr)).alias(f"__max__{a}"))
        else:  # avg → (sum, count) state
            aggs.append(F.sum(F.expr(expr).cast("decimal(38,10)")).alias(f"__sum__{a}"))
            aggs.append(F.count(F.expr(expr)).alias(f"__cnt__{a}"))
    keys = [F.expr(k["expr"]).alias(k["alias"]) for k in mv["group_keys"]]
    return df.groupBy(*keys).agg(*aggs)


def merge_state(state: DataFrame, mv: dict) -> DataFrame:
    """Fold any number of state rows per group into one: counts and sums
    add, extremes re-extremize. Valid only while all inputs came from
    disjoint row sets (append-only guarantee)."""
    aggs = []
    for spec in mv["specs"]:
        for col in _state_cols(spec):
            if col.startswith(("__cnt__", "__sum__")):
                aggs.append(F.sum(col).cast(dict(state.dtypes)[col]).alias(col))
            elif col.startswith("__min__"):
                aggs.append(F.min(col).alias(col))
            else:
                aggs.append(F.max(col).alias(col))
    # state rows already carry the key ALIASES as materialized columns
    return state.groupBy(*[k["alias"] for k in mv["group_keys"]]).agg(*aggs)


def finalize_sql(mv: dict, state_ident: str) -> str:
    """The stored catalog-view SQL that turns state into the user-facing
    schema. Kept as SQL (not a DataFrame) so the view survives process
    restarts and expands through the normal front-end."""
    items = [k["alias"] for k in mv["group_keys"]]
    for spec in mv["specs"]:
        kind, a = spec["kind"], spec["alias"]
        if kind == "count":
            items.append(f"__cnt__{a} AS {a}")
        elif kind == "sum":
            items.append(f"CAST(__sum__{a} AS DOUBLE) AS {a}")
        elif kind in ("min", "max"):
            items.append(f"__{kind}__{a} AS {a}")
        else:
            # double division of the decimal sum, NOT decimal division:
            # engines disagree on decimal-division result scale/rounding,
            # while (exact-sum → double) / count is bit-deterministic
            items.append(f"CAST(__sum__{a} AS DOUBLE) / __cnt__{a} AS {a}")
    return f"SELECT {', '.join(items)} FROM {state_ident}"


class MaterializedView:
    """Handle on one MV: create / refresh / read / drop."""

    def __init__(self, catalog: Catalog, namespace: str, name: str):
        self.catalog = catalog
        self.namespace = namespace
        self.name = name
        self.state_name = STATE_PREFIX + name
        self.state: Table = catalog.load_table(namespace, self.state_name)
        self.mv = json.loads(self.state.properties["mv.definition"])

    # -- lifecycle ---------------------------------------------------------
    @staticmethod
    def create(
        catalog: Catalog, namespace: str, name: str, sql: str, replace: bool = False
    ) -> "MaterializedView":
        mv = parse_mv_sql(sql)
        src = catalog.load_table(mv["source_ns"], mv["source_tbl"])
        snap = src.current_snapshot
        state_name = STATE_PREFIX + name
        if catalog.table_exists(namespace, state_name):
            if not replace:
                raise FileExistsError(f"materialized view {namespace}.{name} exists")
            catalog.drop_table(namespace, state_name, purge=True)
        state_df = partial_state(src.scan(), mv)
        state = catalog.create_table(namespace, state_name, state_df.schema)
        state.append_dataframe(state_df)
        state.set_properties(
            {
                "mv.definition": json.dumps(mv),
                "mv.sql": sql.strip(),
                "mv.source": f"{mv['source_ns']}.{mv['source_tbl']}",
                "mv.refreshed-snapshot-id": json.dumps(
                    snap["snapshot_id"] if snap else None
                ),
            }
        )
        catalog.create_view(
            namespace,
            name,
            finalize_sql(mv, f"{namespace}.{state_name}"),
            replace=replace,
        )
        return MaterializedView(catalog, namespace, name)

    def drop(self) -> None:
        self.catalog.drop_view(self.namespace, self.name)
        self.catalog.drop_table(self.namespace, self.state_name, purge=True)

    # -- reads -------------------------------------------------------------
    def read(self) -> DataFrame:
        """Finalized MV contents straight off the state table — no source
        IO, which is the entire point of materializing."""
        from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql

        return catalog_sql(
            self.catalog, finalize_sql(self.mv, f"{self.namespace}.{self.state_name}")
        )

    # -- maintenance -------------------------------------------------------
    def refresh(self) -> dict:
        """Advance the MV to the source's current snapshot.

        Returns {"mode": "noop"|"incremental"|"full", "snapshot_id": int}.
        incremental = only files appended since the last refresh were
        read; full = a non-append commit (delete/overwrite/compaction with
        row changes) forced a recompute, because MIN/MAX state is not
        subtractable and sums can't tell which groups lost rows.
        """
        src = self.catalog.load_table(self.mv["source_ns"], self.mv["source_tbl"])
        snap = src.current_snapshot
        cur_id = snap["snapshot_id"] if snap else None
        last = json.loads(self.state.properties.get("mv.refreshed-snapshot-id", "null"))
        if cur_id == last:
            return {"mode": "noop", "snapshot_id": cur_id}
        mode = "full"
        if last is not None and cur_id is not None:
            try:
                delta = src.scan_incremental(last, cur_id)
                mode = "incremental"
            except ValueError:
                mode = "full"  # non-append in range, or ancestry broken
        if mode == "incremental":
            delta_state = partial_state(delta, self.mv)
            merged = merge_state(
                self.state.scan().unionByName(delta_state, allowMissingColumns=False),
                self.mv,
            )
        else:
            merged = partial_state(src.scan(snapshot_id=cur_id), self.mv)
        self.state.overwrite_dataframe(merged)
        self.state.set_properties({"mv.refreshed-snapshot-id": json.dumps(cur_id)})
        self.state = self.state.refresh()
        return {"mode": mode, "snapshot_id": cur_id}
