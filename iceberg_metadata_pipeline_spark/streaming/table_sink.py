"""Streaming writes INTO a catalog table — the sink half of the Spark 4
Python DataSource API (the source half is table_source.py), mirroring
Iceberg's `writeStream.format("iceberg")` append sink.

    spark.dataSource.register(CatalogTableSinkDataSource)
    (df.writeStream.format("metacat_table_sink")
       .option("location", table.location)
       .option("checkpointLocation", ...)
       .start())

Semantics (Iceberg streaming-append parity):

- **executor-parallel file writes**: each partition's rows stream to one
  parquet file under ``<location>/data/`` via pyarrow (no SparkSession,
  no row collection on the driver); the driver receives only
  (path, rowcount, bytes) commit messages.
- **one atomic commit per micro-batch**: ``commit(messages, batchId)``
  registers all of the batch's files in a single append commit through
  the catalog's optimistic CAS protocol — readers see the whole batch
  or none of it.
- **exactly-once under retries**: the committed epoch is durably
  recorded in table properties IN the same metadata version as the
  append; a replayed batch (same batchId after restart/failure) is
  detected from DISK state and its files are dropped, not re-appended.
  ``abort()`` removes any files a failed batch managed to write.

Scale notes (100 TB): file bytes never touch the driver — the commit
message is O(files) metadata. Batch commit cost is the catalog's normal
O(changed files) delta write. Downstream readers (including
table_source.py) see each micro-batch as one append snapshot, so a
stream can flow table → transform → table with snapshot-id lineage at
every hop.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _FileCommit(WriterCommitMessage):
    path: str
    rows: int
    size: int


_EPOCH_PROP = "stream-sink-last-epoch"


class CatalogTableStreamWriter(DataSourceStreamWriter):
    def __init__(self, schema, options):
        loc = options.get("location") or ""
        if not loc:
            raise ValueError("metacat_table_sink requires option 'location'")
        self.location = loc.rstrip("/")
        self.schema = schema
        # epoch replay-protection is scoped per STREAM, not per table:
        # batchIds restart at 0 for a fresh checkpoint and run
        # independently for a second query into the same table — a single
        # table-wide high-water mark would silently discard their batches
        import hashlib

        ckpt = options.get("checkpointlocation") or options.get(
            "checkpointLocation"
        )
        scope = (
            hashlib.sha1(ckpt.encode()).hexdigest()[:12] if ckpt else "default"
        )
        self.epoch_prop = f"{_EPOCH_PROP}.{scope}"

    # -- executor side -----------------------------------------------------
    def write(self, iterator) -> _FileCommit:
        import itertools

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        data_dir = os.path.join(self.location, "data")
        os.makedirs(data_dir, exist_ok=True)
        path = os.path.join(data_dir, f"stream-{uuid.uuid4().hex[:16]}.parquet")
        names = [f.name for f in self.schema.fields]
        # the declared arrow schema drives every chunk — an all-NULL
        # chunk must not infer a null type that mismatches the writer
        arrow_schema = to_arrow_schema(self.schema)
        # stream the partition in bounded row-group chunks — the executor
        # never holds more than one chunk in Python memory
        CHUNK = 65536
        total = 0
        with pq.ParquetWriter(path, arrow_schema) as writer:
            while True:
                chunk = list(itertools.islice(iterator, CHUNK))
                if not chunk:
                    break
                rows = [r.asDict() for r in chunk]
                writer.write_table(
                    pa.Table.from_pydict(
                        {n: [r.get(n) for r in rows] for n in names},
                        schema=arrow_schema,
                    )
                )
                total += len(rows)
                if len(chunk) < CHUNK:
                    break
        return _FileCommit(path=path, rows=total, size=os.path.getsize(path))

    # -- driver side -------------------------------------------------------
    def _table(self):
        from pyspark.sql import SparkSession

        from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog

        spark = SparkSession.getActiveSession()
        warehouse = os.path.dirname(os.path.dirname(self.location))
        ns, name = self.location.rstrip("/").split("/")[-2:]
        return Catalog(spark, warehouse).load_table(ns, name)

    def commit(self, messages, batchId: int) -> None:
        from iceberg_metadata_pipeline_spark.catalog.metacat import DataFileEntry

        table = self._table()
        # replay check from DISK state (not in-process memory): a batch
        # whose epoch is already recorded committed before the failure —
        # drop its rewritten files instead of double-appending
        last = table.properties.get(self.epoch_prop)
        if last is not None and batchId <= int(last):
            for m in messages:
                if m is not None:
                    try:
                        os.remove(m.path)
                    except OSError:
                        pass
            return
        entries = [
            DataFileEntry(
                path=m.path, record_count=m.rows, file_size_bytes=m.size
            )
            for m in messages
            if m is not None and m.rows > 0
        ]
        if entries:
            # the epoch marker rides the SAME commit as the data: either
            # both become visible or neither — passed as an atomic
            # property rider so append_files' conflict-retry loop
            # re-applies it after every refresh()
            table.append_files(
                entries,
                dedupe=False,
                extra_properties={self.epoch_prop: str(batchId)},
            )
        for m in messages:
            if m is not None and m.rows == 0:
                try:
                    os.remove(m.path)
                except OSError:
                    pass

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(m.path)
                except OSError:
                    pass


class CatalogTableBatchWriter(DataSourceWriter):
    """Batch append through the same executor-parallel file path:
    ``df.write.format("metacat_table_sink").mode("append")`` — one
    atomic commit for the whole write (no epoch bookkeeping; batch
    writes are not replayed by the engine)."""

    def __init__(self, schema, options):
        self._w = CatalogTableStreamWriter(schema, options)

    def write(self, iterator):
        return self._w.write(iterator)

    def commit(self, messages):
        from iceberg_metadata_pipeline_spark.catalog.metacat import DataFileEntry

        table = self._w._table()
        entries = [
            DataFileEntry(path=m.path, record_count=m.rows, file_size_bytes=m.size)
            for m in messages
            if m is not None and m.rows > 0
        ]
        if entries:
            table.append_files(entries, dedupe=False)
        # mirror the streaming commit: zero-row task files were filtered
        # out of the commit, so delete them — otherwise they sit as
        # unregistered orphans under <location>/data/ until
        # remove_orphan_files
        for m in messages:
            if m is not None and m.rows == 0:
                try:
                    os.remove(m.path)
                except OSError:
                    pass

    def abort(self, messages):
        self._w.abort(messages, -1)


class CatalogTableSinkDataSource(DataSource):
    """`writeStream.format("metacat_table_sink")` (and batch `df.write`)."""

    @classmethod
    def name(cls) -> str:
        return "metacat_table_sink"

    def writer(self, schema, overwrite):
        if overwrite:
            raise ValueError("metacat_table_sink is append-only")
        return CatalogTableBatchWriter(schema, self.options)

    def streamWriter(self, schema, overwrite):
        if overwrite:
            raise ValueError("metacat_table_sink is append-only")
        return CatalogTableStreamWriter(schema, self.options)


def write_table_stream(df, table, checkpoint: str, **opts):
    """Convenience: start an append stream into ``table``."""
    df.sparkSession.dataSource.register(CatalogTableSinkDataSource)
    return (
        df.writeStream.format("metacat_table_sink")
        .option("location", table.location)
        .option("checkpointLocation", checkpoint)
        .options(**opts)
    )
