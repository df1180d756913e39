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
    return eval_transform_literals(spark, field, [literal], source_type)[0]


def eval_transform_literals(
    spark: SparkSession, field: PartitionField, literals: list, source_type: str
) -> list:
    """Batched :func:`eval_transform_literal`: transform every literal in a
    SINGLE one-row Spark job (one selectExpr with N projections), so an
    ``IN (v1..vN)`` predicate costs one planning job rather than N."""
    exprs = [
        transform_expr(field, f"CAST('{lit}' AS {source_type})", source_type)
        + f" AS v{i}"
        for i, lit in enumerate(literals)
    ]
    row = spark.range(1).selectExpr(*exprs).first()
    return [row[f"v{i}"] for i in range(len(literals))]


_FILTER_RE = re.compile(r"^\s*(\w+)\s*(<=|>=|<|>|=)\s*('?)([\w.\- :]+)\3\s*$")
_IN_RE = re.compile(r"^\s*(\w+)\s+IN\s*\(([^()]+)\)\s*$", re.IGNORECASE)
_BETWEEN_RE = re.compile(
    r"^\s*(\w+)\s+BETWEEN\s+('?)([\w.\- :]+)\2\s+AND\s+('?)([\w.\- :]+)\4\s*$",
    re.IGNORECASE,
)
_WORD = re.compile(r"[A-Za-z_]\w*")


def split_in_list(expr: str) -> tuple[str, list[str]] | None:
    """``"c IN (1, 'x')"`` → ``("c", ["1", "x"])``; None if not an IN list."""
    m = _IN_RE.match(expr)
    if not m:
        return None
    col, body = m.groups()
    lits = [lit.strip().strip("'") for lit in body.split(",") if lit.strip()]
    return (col, lits) if lits else None


def strip_outer_parens(expr: str) -> str:
    """Remove balanced OUTER parentheses from a predicate string
    (quote-aware): ``(a = 1)`` → ``a = 1``, ``((x > 2))`` → ``x > 2``,
    but ``(a = 1) OR (b = 2)`` is untouched (the first paren closes
    mid-string). Needed because ``_expr_to_sql`` parenthesizes AND/OR
    branches and ``_prune_by_stats``'s comparison regex rejects
    parenthesized conjuncts — without this, compound filters silently
    prune nothing (r11 ADVICE)."""
    s = expr.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        in_q = False
        wraps = True
        for i, c in enumerate(s):
            if in_q:
                in_q = c != "'"
                continue
            if c == "'":
                in_q = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0 and i < len(s) - 1:
                    wraps = False
                    break
        if not wraps or depth != 0:
            break
        s = s[1:-1].strip()
    return s


def split_conjuncts(expr: str) -> list[str]:
    """Split a filter string into its top-level AND conjuncts so each can
    drive file pruning independently (`a > x AND b = y` prunes on both).

    Paren- and quote-aware; the AND inside `BETWEEN lo AND hi` is not a
    split point. A top-level OR makes the whole expression one conjunct —
    its AND branches are no longer independently required, and pruning on
    one of them would wrongly drop files that satisfy the other OR arm.
    `BETWEEN` conjuncts are expanded to `>= lo` / `<= hi` range conjuncts
    so both stats and monotonic partition transforms can prune them."""
    s = expr
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    in_q = False
    pending_between = False
    saw_or = False
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if in_q:
            buf.append(c)
            in_q = c != "'"
            i += 1
            continue
        if c == "'":
            in_q = True
            buf.append(c)
            i += 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and (c.isalpha() or c == "_"):
            m = _WORD.match(s, i)
            word = m.group(0).upper()
            if word == "AND" and not pending_between:
                parts.append("".join(buf))
                buf = []
                i = m.end()
                continue
            if word == "AND":
                pending_between = False
            elif word == "OR":
                saw_or = True
            elif word == "BETWEEN":
                pending_between = True
            buf.append(m.group(0))
            i = m.end()
            continue
        buf.append(c)
        i += 1
    parts.append("".join(buf))
    if saw_or or len(parts) == 1:
        conjuncts = [expr]
    else:
        conjuncts = [p.strip() for p in parts if p.strip()]
    out: list[str] = []
    for c in conjuncts:
        c = _strip_outer_parens(c)
        m = _BETWEEN_RE.match(c)
        if m:
            col, _, lo, _, hi = m.groups()
            q = "'" if m.group(2) else ""
            out.append(f"{col} >= {q}{lo}{q}")
            out.append(f"{col} <= {q}{hi}{q}")
        else:
            out.append(c)
    return out


def _strip_outer_parens(s: str) -> str:
    """``"(a = 1)"`` → ``"a = 1"`` when the parens are one matched pair."""
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, c in enumerate(s):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0 and i != len(s) - 1:
                    return s  # ")...(": not one outer pair
        s = s[1:-1].strip()
    return s


def prune_files_by_partition(
    spark: SparkSession,
    files,  # list[DataFileEntry]
    specs: dict[int, list[PartitionField]],
    schema_types: dict[str, str],
    filter_expr: str,
) -> list:
    """Partition pruning for a ``col OP literal`` or ``col IN (...)``
    conjunct: transform the literal(s) once per (spec, field), then keep
    only files whose stored partition value can satisfy the predicate.
    Files without partition metadata (pre-partitioning snapshots,
    evolved-away specs) are always kept — pruning is an optimization,
    never required for correctness. Callers split multi-conjunct filters
    with :func:`split_conjuncts` and apply this once per conjunct."""
    m = _FILTER_RE.match(filter_expr)
    if m:
        col, op, _, lit = m.groups()
        lits = [lit]
    else:
        in_list = split_in_list(filter_expr)
        if in_list is None:
            return files
        col, lits = in_list
        op = "="  # IN = disjunction of equalities: keep on ANY literal match
    src_type = schema_types.get(col)
    if src_type is None:
        return files
    # transform the literal(s) under every spec that partitions on this column
    lit_by_spec: dict[int, tuple[PartitionField, list]] = {}
    for spec_id, fields in specs.items():
        for f in fields:
            if f.source == col and (op == "=" or is_monotonic(f.transform)):
                try:
                    lit_by_spec[spec_id] = (
                        f,
                        eval_transform_literals(spark, f, lits, src_type),
                    )
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
        f, t_lits = spec_hit
        stored = entry.partition.get(f.name)
        if stored is None or any(t is None for t in t_lits):
            out.append(entry)  # null partition or null-transform → can't prune
            continue
        keep = False
        for t_lit in t_lits:
            try:
                p_val, t_cmp = _comparable(stored, t_lit)
            except (TypeError, ValueError):
                keep = True
                break
            # src OP lit ⇒ monotonic t: t(src) relates to t(lit) weakly
            if {
                "=": p_val == t_cmp,
                "<": p_val <= t_cmp,
                "<=": p_val <= t_cmp,
                ">": p_val >= t_cmp,
                ">=": p_val >= t_cmp,
            }[op]:
                keep = True
                break
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
