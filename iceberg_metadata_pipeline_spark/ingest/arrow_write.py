"""Shared Arrow-native write path for the Python DataSource writers
(round-12 continuation). The r12 readers went columnar
(``arrow_scan``); this is the WRITE symmetry: Spark hands
``DataSourceArrowWriter`` subclasses an iterator of ``pa.RecordBatch``,
so task data never round-trips through per-row Python tuples — only
the (low-cardinality by design) identity partition KEY columns are
materialized as Python scalars, to route groups and render tuple
values. Value columns stay columnar from the JVM to the parquet
encoder.

Type posture: every group casts to the ``arrow_types.arrow_fields``
target schema — the same schema the old row path built arrays against,
so files are byte-compatible in content. Spark serves TimestampType as
``timestamp('us', tz='UTC')``; the cast to the target's naive ``us``
keeps the epoch micros unchanged, which equals the old path's
naive-local rendering because the session timezone is pinned UTC
(session.py)."""

from __future__ import annotations


def _key_py(v):
    """Arrow ``.as_py()`` partition-key scalar → the value the old Row
    path produced (tz-aware timestamps become naive UTC wall time)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime) and v.tzinfo is not None:
        return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return v


def grouped_arrow_tables(iterator, spark_schema, part_cols, *, writer: str):
    """RecordBatch iterator → list of ``(key_tuple, pa.Table)`` grouped
    by the identity partition columns (one ``((), table)`` entry when
    unpartitioned), each table cast to the writer's target arrow
    schema. Returns ``[]`` for an empty task. Only ``part_cols``
    columns touch Python; the take() split keeps values columnar."""
    import pyarrow as pa

    from iceberg_metadata_pipeline_spark.ingest.arrow_types import (
        arrow_fields,
    )

    batches = [b for b in iterator if b.num_rows]
    if not batches:
        return []
    target = pa.schema(arrow_fields(spark_schema, writer=writer))
    tbl = pa.Table.from_batches(batches)
    # name-align then cast: Spark's batch schema carries the dataframe
    # column names in order; the cast moves tz-aware→naive timestamps,
    # large_string→string etc. without touching values
    tbl = tbl.select(target.names).cast(target)
    if not part_cols:
        return [((), tbl)]
    keys = [
        [_key_py(v) for v in tbl.column(c).to_pylist()] for c in part_cols
    ]
    groups: dict[tuple, list[int]] = {}
    for i, kt in enumerate(zip(*keys)):
        groups.setdefault(kt, []).append(i)
    out = []
    for kt, idxs in sorted(
        groups.items(), key=lambda kv: tuple(map(str, kv[0]))
    ):
        out.append((kt, tbl.take(pa.array(idxs, pa.int64()))))
    return out
