"""Local declarative-pipeline runner (the Spark 4.1 SDP model).

Spark 4.1 ships Declarative Pipelines (`pyspark.pipelines`:
@materialized_view / @table / @temporary_view / @append_flow), but its
runner executes exclusively over Spark Connect — grpcio is absent in
this container (same env-gate class as protobuf, see NOTES), so this
module provides the same declarative model executed directly:

- datasets are *declared* as named nodes (a Python function returning a
  DataFrame, or a SQL string) with explicit upstream dependencies,
- the runner topologically orders the graph, materializes each node
  into the metacat catalog, and isolates faults (a failed node skips
  exactly its downstream cone, everything else still materializes —
  the same per-folder isolation discipline as the reference's importer,
  ImportParquetFolders.java's per-folder try/catch),
- ``materialized_view`` nodes declared with aggregate SQL get
  INCREMENTAL refresh via catalog/matview.py (append-only deltas merge
  partial state, O(new data) — full recompute only on non-append
  changes); ``table`` nodes are full snapshot rebuilds
  (overwrite_dataframe, atomic); ``temporary_view`` nodes are
  session-scoped and never persisted.

Scale notes. The runner itself is pure driver-side control flow over
O(#nodes) metadata — every heavy operation is a normal declarative
Spark plan that Catalyst optimizes independently, and node
materialization order adds no artificial barriers beyond true data
dependencies. Incremental MVs are the load-bearing piece at 100 TB:
a daily pipeline re-run touches only appended data for every node that
can be expressed as an aggregate MV.
"""

from __future__ import annotations

import inspect
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from iceberg_metadata_pipeline_spark.catalog.matview import MaterializedView
from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog


@dataclass
class _Node:
    name: str
    kind: str  # "table" | "materialized_view" | "temporary_view"
    fn: object = None  # callable -> DataFrame (table / temporary_view)
    sql: str | None = None  # aggregate SQL (materialized_view)
    depends: tuple[str, ...] = ()
    comment: str | None = None


@dataclass
class NodeResult:
    status: str  # "ok" | "failed" | "skipped"
    rows: int | None = None
    seconds: float = 0.0
    error: str | None = None
    mode: str | None = None  # MV refresh mode ("incremental" | "full" | None)


@dataclass
class RunReport:
    results: dict[str, NodeResult] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return all(r.status == "ok" for r in self.results.values())


class Pipeline:
    """A declarative dataset graph materialized into metacat.

    >>> p = Pipeline(spark, catalog, namespace="etl")
    >>> @p.temporary_view(name="raw")
    ... def raw():
    ...     return spark.read.parquet(src)
    >>> @p.table(name="clean", depends=["raw"])
    ... def clean(inputs):
    ...     return inputs["raw"].where("n_chars > 0")
    >>> @p.materialized_view(
    ...     name="per_source",
    ...     depends=["clean"],
    ...     sql="SELECT source, COUNT(*) AS n FROM etl.clean GROUP BY source",
    ... )
    >>> report = p.run()

    Node functions may take zero arguments (read upstreams via
    ``spark.table(name)`` — each dependency is registered as a session
    temp view under its bare node name before the call, SDP-style) or
    one argument (a dict of dependency name → DataFrame).
    """

    def __init__(self, spark: SparkSession, catalog: Catalog, namespace: str = "etl"):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        self._nodes: dict[str, _Node] = {}
        catalog.ensure_namespace(namespace)

    # --- declaration decorators ---------------------------------------

    def _add(self, node: _Node) -> None:
        if node.name in self._nodes:
            raise ValueError(f"duplicate pipeline dataset {node.name!r}")
        self._nodes[node.name] = node

    def table(self, *, name: str | None = None, depends=(), comment=None):
        """Full-rebuild snapshot table (overwrite_dataframe, atomic)."""

        def deco(fn):
            self._add(
                _Node(
                    name=name or fn.__name__,
                    kind="table",
                    fn=fn,
                    depends=tuple(depends),
                    comment=comment,
                )
            )
            return fn

        return deco

    def temporary_view(self, *, name: str | None = None, depends=(), comment=None):
        """Session-scoped intermediate — never persisted."""

        def deco(fn):
            self._add(
                _Node(
                    name=name or fn.__name__,
                    kind="temporary_view",
                    fn=fn,
                    depends=tuple(depends),
                    comment=comment,
                )
            )
            return fn

        return deco

    def materialized_view(
        self, *, name: str, sql: str, depends=(), comment=None
    ) -> None:
        """Aggregate SQL over already-materialized tables; refreshes
        incrementally on append-only upstream changes (matview.py)."""
        self._add(
            _Node(
                name=name,
                kind="materialized_view",
                sql=sql,
                depends=tuple(depends),
                comment=comment,
            )
        )

    # --- graph ---------------------------------------------------------

    def _topo_order(self) -> list[str]:
        for n in self._nodes.values():
            for d in n.depends:
                if d not in self._nodes:
                    raise ValueError(
                        f"dataset {n.name!r} depends on undeclared {d!r}"
                    )
        order: list[str] = []
        state: dict[str, int] = {}  # 1=visiting, 2=done

        def visit(name: str, stack: tuple[str, ...]) -> None:
            if state.get(name) == 2:
                return
            if state.get(name) == 1:
                cycle = stack[stack.index(name) :] + (name,)
                raise ValueError(f"dependency cycle: {' -> '.join(cycle)}")
            state[name] = 1
            for d in self._nodes[name].depends:
                visit(d, stack + (name,))
            state[name] = 2
            order.append(name)

        for name in sorted(self._nodes):
            visit(name, ())
        return order

    # --- execution ------------------------------------------------------

    def _invoke(self, node: _Node, materialized: dict[str, DataFrame]) -> DataFrame:
        inputs = {d: materialized[d] for d in node.depends}
        for d, df in inputs.items():
            df.createOrReplaceTempView(d)
        params = inspect.signature(node.fn).parameters
        out = node.fn(inputs) if len(params) >= 1 else node.fn()
        if not isinstance(out, DataFrame):
            raise TypeError(
                f"dataset {node.name!r} function returned {type(out).__name__}, "
                "expected DataFrame"
            )
        return out

    def run(self) -> RunReport:
        """Materialize the graph in dependency order. A failed node marks
        its downstream cone "skipped"; independent branches still run."""
        report = RunReport()
        materialized: dict[str, DataFrame] = {}
        failed: set[str] = set()
        for name in self._topo_order():
            node = self._nodes[name]
            bad = [d for d in node.depends if d in failed]
            if bad:
                failed.add(name)
                report.results[name] = NodeResult(
                    status="skipped",
                    error=f"upstream failed: {', '.join(sorted(bad))}",
                )
                continue
            t0 = time.monotonic()
            try:
                if node.kind == "temporary_view":
                    df = self._invoke(node, materialized)
                    df.createOrReplaceTempView(name)
                    materialized[name] = df
                    report.results[name] = NodeResult(
                        status="ok", seconds=round(time.monotonic() - t0, 3)
                    )
                elif node.kind == "table":
                    df = self._invoke(node, materialized)
                    if self.catalog.table_exists(self.namespace, name):
                        t = self.catalog.load_table(self.namespace, name)
                        t.overwrite_dataframe(df)
                    else:
                        t = self.catalog.create_table(
                            self.namespace, name, df.schema
                        ).refresh()
                        t.append_dataframe(df)
                    t = self.catalog.load_table(self.namespace, name)
                    # both branches leave the table holding exactly df's
                    # rows, so the manifest sum IS the written row count
                    # (append/overwrite return snapshot ids, not counts)
                    rows = t.count_rows()
                    materialized[name] = t.scan()
                    report.results[name] = NodeResult(
                        status="ok",
                        rows=rows,
                        seconds=round(time.monotonic() - t0, 3),
                    )
                else:  # materialized_view
                    from iceberg_metadata_pipeline_spark.catalog.matview import (
                        STATE_PREFIX,
                    )

                    if self.catalog.table_exists(
                        self.namespace, STATE_PREFIX + name
                    ):
                        mv = MaterializedView(self.catalog, self.namespace, name)
                        mode = mv.refresh()["mode"]
                    else:
                        mv = MaterializedView.create(
                            self.catalog, self.namespace, name, node.sql
                        )
                        mode = "initial"
                    df = mv.read()
                    materialized[name] = df
                    report.results[name] = NodeResult(
                        status="ok",
                        rows=df.count(),
                        seconds=round(time.monotonic() - t0, 3),
                        mode=mode,
                    )
            except Exception as e:  # noqa: BLE001 — fault isolation is the point
                failed.add(name)
                report.results[name] = NodeResult(
                    status="failed",
                    seconds=round(time.monotonic() - t0, 3),
                    error=f"{type(e).__name__}: {e}",
                )
        return report

    def read(self, name: str) -> DataFrame:
        """Read a materialized dataset back from the catalog."""
        node = self._nodes[name]
        if node.kind == "temporary_view":
            return self.spark.table(name)
        if node.kind == "materialized_view":
            return MaterializedView(self.catalog, self.namespace, name).read()
        return self.catalog.load_table(self.namespace, name).scan()
