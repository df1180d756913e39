"""Shared Spark→Arrow field mapping for the Python DataSource writers
(pyice / pydelta / pyhudi). One place so the three writers accept the
same surface: primitives, decimal(p,s), and arrays of primitives.
Anything else refuses loudly — a writer must never silently coerce."""

from __future__ import annotations

import re


def arrow_type(simple: str, *, writer: str):
    """Spark ``dataType.simpleString()`` → pyarrow type, or raise
    NotImplementedError naming the writer."""
    import pyarrow as pa

    prims = {
        "bigint": pa.int64(), "long": pa.int64(), "int": pa.int32(),
        "smallint": pa.int16(), "tinyint": pa.int8(),
        "double": pa.float64(), "float": pa.float32(),
        "string": pa.string(), "boolean": pa.bool_(),
        "date": pa.date32(), "binary": pa.binary(),
        "timestamp": pa.timestamp("us"), "timestamp_ntz": pa.timestamp("us"),
    }
    if simple in prims:
        return prims[simple]
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", simple)
    if m:
        return pa.decimal128(int(m.group(1)), int(m.group(2)))
    m = re.fullmatch(r"array<(.+)>", simple)
    if m and m.group(1) in prims:
        return pa.list_(prims[m.group(1)])
    raise NotImplementedError(
        f"{writer}: no arrow mapping for type {simple} "
        "(flatten/cast upstream)"
    )


def arrow_fields(schema, *, writer: str):
    """StructType → list[pa.field] (all nullable — null enforcement is
    the engine's, not the file writer's)."""
    import pyarrow as pa

    return [
        pa.field(f.name, arrow_type(f.dataType.simpleString(), writer=writer))
        for f in schema.fields
    ]
