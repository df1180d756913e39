"""Iceberg-style hidden partitioning for the metacat catalog.

Iceberg's signature layout feature (spec v2 "Partition Transforms"; the
reference gets it from iceberg-spark-runtime 1.9.2, pom.xml:18): a table
declares a PARTITION SPEC of (source column, transform) fields; writers
derive partition tuples from row values, and readers prune files by
applying the SAME transform to query predicates — users filter on the
source column and never see, or mis-specify, the partition column (the
classic Hive bug where `WHERE ts > X` misses `WHERE dt_part` pruning).

Transforms supported (names follow the Iceberg spec):

- ``identity``            — the value itself
- ``bucket[N]``           — ``pmod(xxhash64(col), N)``; spreads writes and
  enables equality pruning on high-cardinality keys. (Iceberg proper uses
  murmur3_32; xxhash64 is Spark's built-in 64-bit hash — self-consistent
  between write and prune, which is the property that matters here.)
- ``truncate[W]``         — int: floor to multiple of W; string: prefix W
- ``year|month|day|hour`` — calendar buckets of a date/timestamp, encoded
  as fixed-width strings (``yyyy``, ``yyyy-MM``, …) so lexicographic
  order equals chronological order — the monotonicity pruning relies on.

Scale notes (100 TB): partition tuples live in the manifest, one tiny
dict per file — pruning is a driver-side metadata walk over O(files)
entries that never touches data. Monotonic transforms prune range
predicates; bucket prunes equality to 1/N of files. The derived column
is written under a reserved ``__p_`` prefix so identity transforms never
collide with (or drop) real data columns from the files — data files
always carry the full source schema, exactly like Iceberg.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession

# reserved directory prefix: partition dirs are metadata, not data columns
DIR_PREFIX = "__p_"
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

_INT_TYPES = {"tinyint", "smallint", "int", "integer", "bigint", "long"}


@dataclass
class PartitionField:
    source: str          # data column the value derives from
    transform: str       # identity | bucket[N] | truncate[W] | year|month|day|hour
    name: str = ""       # partition field name; defaults to source_transform

    def __post_init__(self):
        if not self.name:
            kind, _ = parse_transform(self.transform)
            self.name = self.source if kind == "identity" else f"{self.source}_{kind}"

    def to_json(self) -> dict:
        return {"source": self.source, "transform": self.transform, "name": self.name}

    @staticmethod
    def from_json(d: dict) -> "PartitionField":
        return PartitionField(d["source"], d["transform"], d.get("name", ""))


def parse_transform(transform: str) -> tuple[str, int | None]:
    """``"bucket[16]"`` → ``("bucket", 16)``; ``"day"`` → ``("day", None)``."""
    m = re.fullmatch(r"(identity|year|month|day|hour)", transform)
    if m:
        return m.group(1), None
    m = re.fullmatch(r"(bucket|truncate)\[(\d+)\]", transform)
    if m:
        return m.group(1), int(m.group(2))
    raise ValueError(f"unknown partition transform: {transform}")


def transform_expr(field: PartitionField, source_expr: str, source_type: str) -> str:
    """Spark SQL expression computing the transform of ``source_expr``.

    Used identically on the WRITE path (derive the partition column) and
    the PRUNE path (transform a predicate literal) — one definition, so
    the two can never disagree.
    """
    kind, param = parse_transform(field.transform)
    if kind == "identity":
        return source_expr
    if kind == "bucket":
        return f"pmod(xxhash64({source_expr}), {param})"
    if kind == "truncate":
        base = source_type.lower().split("(")[0]
        if base in _INT_TYPES:
            # pmod is non-negative, so this floors toward -inf (Iceberg rule)
            return f"{source_expr} - pmod({source_expr}, {param})"
        return f"substring({source_expr}, 1, {param})"
    if kind == "year":
        return f"year({source_expr})"
    fmt = {"month": "yyyy-MM", "day": "yyyy-MM-dd", "hour": "yyyy-MM-dd-HH"}[kind]
    return f"date_format({source_expr}, '{fmt}')"


def is_monotonic(transform: str) -> bool:
    """Order-preserving transforms support range pruning; bucket does not."""
    return parse_transform(transform)[0] != "bucket"


def with_partition_columns(
    df: DataFrame, fields: list[PartitionField], schema_types: dict[str, str]
) -> tuple[DataFrame, list[str]]:
    """Append derived ``__p_*`` columns for a partitioned write."""
    from pyspark.sql import functions as F

    cols = []
    out = df
    for f in fields:
        expr = transform_expr(f, f.source, schema_types.get(f.source, "string"))
        col = DIR_PREFIX + f.name
        out = out.withColumn(col, F.expr(expr))
        cols.append(col)
    return out, cols


def parse_partition_from_path(path: str, fields: list[PartitionField]) -> dict:
    """Recover the partition tuple from Hive-style ``__p_name=value`` path
    segments (Spark's partitioned-write layout). Values come back as the
    transform's result type (int for bucket/year/int-truncate)."""
    values: dict[str, object] = {}
    by_dir = {DIR_PREFIX + f.name: f for f in fields}
    for seg in path.split("/"):
        if "=" not in seg:
            continue
        key, _, raw = seg.partition("=")
        f = by_dir.get(key)
        if f is None:
            continue
        raw = unquote(raw)
        values[f.name] = None if raw == _HIVE_NULL else raw
    return values


def eval_transform_literal(
    spark: SparkSession, field: PartitionField, literal: str, source_type: str
):
    """Transform a predicate literal exactly as the write path would,
    via a one-row local Spark eval (metadata-sized planning cost; this is
    the analogue of Iceberg's projection of predicates into partition
    space, and reusing the engine guarantees hash/format agreement)."""
    expr = transform_expr(field, f"CAST('{literal}' AS {source_type})", source_type)
    return spark.range(1).selectExpr(f"{expr} AS v").first()["v"]


_FILTER_RE = re.compile(r"^\s*(\w+)\s*(<=|>=|<|>|=)\s*('?)([\w.\- :]+)\3\s*$")


def prune_files_by_partition(
    spark: SparkSession,
    files,  # list[DataFileEntry]
    specs: dict[int, list[PartitionField]],
    schema_types: dict[str, str],
    filter_expr: str,
) -> list:
    """Partition pruning for a ``col OP literal`` conjunct: transform the
    literal once per (spec, field), then keep only files whose stored
    partition value can satisfy the predicate. Files without partition
    metadata (pre-partitioning snapshots, evolved-away specs) are always
    kept — pruning is an optimization, never required for correctness."""
    m = _FILTER_RE.match(filter_expr)
    if not m:
        return files
    col, op, _, lit = m.groups()
    src_type = schema_types.get(col)
    if src_type is None:
        return files
    # transform the literal under every spec that partitions on this column
    lit_by_spec: dict[int, tuple[PartitionField, object]] = {}
    for spec_id, fields in specs.items():
        for f in fields:
            if f.source == col and (op == "=" or is_monotonic(f.transform)):
                try:
                    lit_by_spec[spec_id] = (f, eval_transform_literal(spark, f, lit, src_type))
                except Exception:
                    pass
                break
    if not lit_by_spec:
        return files

    out = []
    for entry in files:
        spec_hit = lit_by_spec.get(entry.spec_id) if entry.spec_id is not None else None
        if spec_hit is None:
            out.append(entry)
            continue
        f, t_lit = spec_hit
        stored = entry.partition.get(f.name)
        if stored is None or t_lit is None:
            out.append(entry)  # null partition or null-transform → can't prune
            continue
        try:
            p_val, t_lit = _comparable(stored, t_lit)
        except (TypeError, ValueError):
            out.append(entry)
            continue
        # src OP lit ⇒ monotonic t: t(src) relates to t(lit) weakly
        keep = {
            "=": p_val == t_lit,
            "<": p_val <= t_lit,
            "<=": p_val <= t_lit,
            ">": p_val >= t_lit,
            ">=": p_val >= t_lit,
        }[op]
        if keep:
            out.append(entry)
    return out


def _comparable(stored: object, t_lit):
    """Make the path-parsed partition value (a string) and the transformed
    literal mutually comparable. Dates/timestamps (identity transform of a
    temporal column) compare as ISO strings — Spark renders partition dirs
    in ISO form, and ISO order is chronological order."""
    if isinstance(t_lit, bool):
        return str(stored).lower() in ("true", "1"), t_lit
    if isinstance(t_lit, int):
        return int(stored), t_lit  # type: ignore[arg-type]
    if isinstance(t_lit, float):
        return float(stored), t_lit  # type: ignore[arg-type]
    if isinstance(t_lit, str):
        return str(stored), t_lit
    return str(stored), str(t_lit)
