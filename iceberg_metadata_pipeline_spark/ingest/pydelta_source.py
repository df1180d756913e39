"""`pydelta` — Spark 4 Python DataSource over the from-scratch Delta
log (catalog/delta_format.py).

Gives a plain `spark.read` / `spark.readStream` surface to any Delta
table directory without delta-spark or delta-rs:

- ``spark.read.format("pydelta").load(dir)`` — batch scan of the
  CURRENT snapshot (or ``.option("versionAsOf", N)`` time travel): one
  input partition per live data file; partition-column values come from
  the log's ``partitionValues`` (Delta does NOT store partition columns
  in the data files — a naive parquet read silently drops them), typed
  per the table schema.
- ``spark.readStream.format("pydelta")`` — micro-batch source tailing
  the transaction log: offset = log version, each batch reads exactly
  the ``add`` actions of commits (start, end] — the same
  change-feed-of-appends semantics Delta's own streaming source gives.
  A ``remove`` action inside the tailed range aborts with a loud error
  unless ``.option("ignoreDeletes", "true")`` (mirroring Delta's
  option): silently skipping deletes would turn the stream into an
  at-least-once-with-phantoms feed.
- ``df.write.format("pydelta").mode("append"|"overwrite")`` — writer
  whose two-phase commit IS the Delta protocol: tasks write invisible
  ``_tmp-*.parquet`` (the log names the visible set), the driver
  renames and appends ONE commit (overwrite also removes the previous
  live set in the same commit — atomic replace with time travel
  intact).

Scale notes: offsets and planning are O(log tail) driver-side metadata;
each file decodes in one executor task via pyarrow (row-group batches,
never a whole-file python list). The batch path is for interop
completeness — for heavy analytics, import_delta_table registers the
files into metacat and Spark's native vectorized parquet reader takes
over; this source is the tailing/read-anywhere path.
"""

from __future__ import annotations

import datetime
import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql import types as T

from iceberg_metadata_pipeline_spark.catalog.delta_format import (
    _commit_path,
    latest_version,
    read_delta_table,
)

_EPOCH_DATE = datetime.date(1970, 1, 1)


def _local(path: str) -> str:
    return path[len("file:") :] if path.startswith("file:") else path


def _coerce_partition(value: str | None, dt: T.DataType):
    """Spec: partitionValues are strings (null = JSON null) — cast back
    to the schema's type for the rows we emit."""
    if value is None:
        return None
    s = dt.simpleString()
    if s in ("int", "smallint", "tinyint"):
        return int(value)
    if s in ("bigint", "long"):
        return int(value)
    if s in ("double", "float"):
        return float(value)
    if s == "boolean":
        return value.lower() == "true"
    if s == "date":
        return datetime.date.fromisoformat(value)
    return value


@dataclass
class DeltaFilePartition(InputPartition):
    path: str
    partition_values: tuple  # aligned with the table's partition columns
    deleted: tuple = ()  # inline-DV row positions to skip, sorted
    # file-based ('u'/'p') DV descriptor, decoded IN THE TASK — the
    # driver ships only (dv_path, offset, sizeInBytes), never the
    # positions, so a table with billions of deleted rows plans in
    # O(#files) driver memory
    dv_file: tuple = ()


class _DeltaReadMixin:
    """Shared per-file decode: parquet row groups via pyarrow, partition
    columns appended from the log's values, deletion-vector positions
    skipped by running row index (pyarrow batches are sequential, so
    the file-relative position is just a counter)."""

    schema: T.StructType
    partition_columns: list[str]
    # logical -> parquet (physical) name; identity unless column mapping.
    # None under id-mode column mapping: resolution is per FILE, by
    # parquet field id (field_ids maps logical -> delta.columnMapping.id)
    physical: dict | None
    field_ids: dict | None
    # logical -> physicalName for partitionValues keys — valid in ALL
    # mapping modes (id mode included; see physical_names_meta)
    part_phys: dict

    def _resolve_mapping(self, state) -> None:
        """Set (physical, field_ids) per the table's column-mapping mode:
        'id' resolves parquet columns by field id (per file, in _rows);
        'name'/'none' by the static physicalName map."""
        from iceberg_metadata_pipeline_spark.catalog.delta_format import (
            column_mapping_ids,
            column_mapping_mode,
            physical_names,
            physical_names_meta,
        )

        # partitionValues are keyed by physicalName in EVERY mapping
        # mode (the spec writes physicalNames even under id mode, where
        # only PARQUET column resolution goes through field ids) — so
        # partition planning must never touch self.physical, which is
        # None under id mode
        self.part_phys = physical_names_meta(state)
        if column_mapping_mode(state) == "id":
            self.physical = None
            self.field_ids = column_mapping_ids(state)
        else:
            self.physical = physical_names(state)
            self.field_ids = None

    def _rows(self, part: DeltaFilePartition):
        import pyarrow.parquet as pq

        from iceberg_metadata_pipeline_spark.catalog.delta_format import (
            _has_nested_mapping,
            to_logical_by_id,
            to_logical_py,
        )

        if part is None or not part.path:
            return  # empty-table sentinel (zero live files)
        pcols = set(self.partition_columns)
        file_fields = [f for f in self.schema.fields if f.name not in pcols]
        pvals = dict(zip(self.partition_columns, part.partition_values))
        dead_parts = [part.deleted] if part.deleted else []
        if part.dv_file:
            from iceberg_metadata_pipeline_spark.catalog.delta_format import (
                read_dv_from_file,
            )

            dv_path, offset, size = part.dv_file
            dead_parts.append(read_dv_from_file(dv_path, int(offset), size))
        pf = pq.ParquetFile(part.path)
        file_cols = set(pf.schema_arrow.names)
        arrow_of: dict = {}
        if self.physical is None:
            # id mode: THIS file's field ids decide which parquet column
            # serves each logical field (names are arbitrary under the
            # protocol, at EVERY nesting level — round 10); a field id
            # absent from the file means the column was added after the
            # file was written → nulls, but a file with no ids at all is
            # a protocol violation → loud refusal
            fid_to_field = {}
            for af in pf.schema_arrow:
                fid = (af.metadata or {}).get(b"PARQUET:field_id")
                if fid is not None:
                    fid_to_field[int(fid)] = af
            if file_fields and not fid_to_field:
                raise ValueError(
                    f"id-mode table but data file {part.path} carries no "
                    "PARQUET:field_id metadata — unreadable by field id"
                )
            physical = {}
            for f in file_fields:
                af = fid_to_field.get(self.field_ids[f.name])
                physical[f.name] = "\x00absent" if af is None else af.name
                arrow_of[f.name] = None if af is None else af.type
        else:
            physical = self.physical
        names = [
            n
            for f in file_fields
            if (n := physical.get(f.name, f.name)) in file_cols
        ]
        # vectorized (round 12): RecordBatch yields — deletion-vector
        # positions apply as a searchsorted mask, partition columns and
        # added-after columns fill via O(1) arrays. Only NESTED-mapped
        # struct columns still rebuild per value (structural rename by
        # field id / physicalName has no arrow kernel); flat tables and
        # flat-mapped tables stay columnar end to end.
        from iceberg_metadata_pipeline_spark.ingest import arrow_scan

        dead_np = arrow_scan.merge_positions(dead_parts)
        pa_schema = arrow_scan.spark_to_arrow_schema(self.schema)
        pos = 0
        for batch in pf.iter_batches(columns=names):
            n = batch.num_rows
            got = dict(zip(batch.schema.names, batch.columns))
            arrays = []
            for i, f in enumerate(self.schema.fields):
                tgt_type = pa_schema.field(i).type
                if f.name in pcols:
                    arrays.append(arrow_scan.fill_array(pvals[f.name], n, tgt_type))
                    continue
                col = got.get(physical.get(f.name, f.name))
                if col is None:
                    # columns ADDED after this file was written are null
                    # for its rows (Delta's add-column semantics: no
                    # rewrite, readers project missing columns as null)
                    arrays.append(arrow_scan.fill_array(None, n, tgt_type))
                elif _has_nested_mapping(f.dataType):
                    # struct values decode as dicts keyed by the FILE'S
                    # parquet nested names — rebuild to logical shape,
                    # recursively: by nested field id under id mode
                    # (round 10), by physicalName under name mode
                    import pyarrow as pa

                    vals = col.to_pylist()
                    if self.physical is None:
                        at = arrow_of.get(f.name)
                        vals = [to_logical_by_id(v, f.dataType, at) for v in vals]
                    else:
                        vals = [to_logical_py(v, f.dataType) for v in vals]
                    arrays.append(pa.array(vals, type=tgt_type))
                else:
                    arrays.append(col)
            keep = arrow_scan.position_mask(pos, n, dead_np)
            pos += n
            out = arrow_scan.finish_batch(arrays, pa_schema, keep)
            if out is not None:
                yield out


class PyDeltaBatchReader(DataSourceReader, _DeltaReadMixin):
    def __init__(self, options):
        self.path = _local(options["path"])
        version = options.get("versionAsOf")
        state = read_delta_table(
            self.path, None if version is None else int(version)
        )
        self.schema = state.schema
        self.partition_columns = state.partition_columns
        from iceberg_metadata_pipeline_spark.catalog.delta_format import (
            _decode_dv_descriptor,
        )

        self._resolve_mapping(state)
        from iceberg_metadata_pipeline_spark.catalog.delta_format import (
            dv_file_path,
        )

        def _dv_fields(a: dict) -> tuple[tuple, tuple]:
            """(inline positions, file descriptor) for the partition:
            inline vectors are already O(positions) in the log and ship
            decoded; file-based vectors ship as a descriptor and decode
            in the task."""
            dv = a.get("deletionVector")
            if not dv:
                return (), ()
            if dv.get("storageType") == "i":
                return tuple(_decode_dv_descriptor(dv)), ()
            return (), (
                dv_file_path(self.path, dv),
                int(dv["offset"]),
                dv.get("sizeInBytes"),
            )

        self._parts = [
            DeltaFilePartition(
                self._abs(p),
                tuple(
                    _coerce_partition(
                        (a.get("partitionValues") or {}).get(self.part_phys.get(c, c)),
                        self.schema[c].dataType,
                    )
                    for c in state.partition_columns
                ),
                *_dv_fields(a),
            )
            for p, a in sorted(state.files.items())
        ]

    def _abs(self, p: str) -> str:
        return p if os.path.isabs(p) else os.path.join(self.path, p)

    def partitions(self):
        # a table whose current version has zero live files is still a
        # valid (empty) table: the DataSource API needs >=1 partition, so
        # ship one sentinel the decode path skips
        return self._parts or [DeltaFilePartition("", ())]

    def read(self, partition: DeltaFilePartition):
        yield from self._rows(partition)


class PyDeltaStreamReader(DataSourceStreamReader, _DeltaReadMixin):
    def __init__(self, schema: T.StructType, options):
        self.path = _local(options["path"])
        self.ignore_deletes = str(options.get("ignoreDeletes", "false")).lower() == "true"
        lim = int(options.get("maxFilesPerTrigger", 0) or 0)
        self._limit = lim if lim > 0 else None
        # engine-confirmed position (same contract as pyhudi_source):
        # throttling starts at the SECOND micro-batch of a reader
        # instance — the Python DataSource API has no ReadLimit
        # handshake, and bounding before the engine reveals its
        # checkpointed start could regress the offset log
        self._pos: int | None = None
        # version → add-count memo: with maxFilesPerTrigger a long
        # backlog would otherwise re-parse every commit JSON from the
        # checkpoint position on EVERY trigger (O(backlog) per batch);
        # commits are immutable, so each file is parsed at most once per
        # reader instance
        self._add_counts: dict[int, int] = {}
        state = read_delta_table(self.path)  # schema + partitioning from the log
        self.schema = state.schema
        self.partition_columns = state.partition_columns
        self._resolve_mapping(state)

    def initialOffset(self) -> dict:
        return {"v": -1}

    def latestOffset(self) -> dict:
        last = latest_version(self.path)
        if self._limit is None or self._pos is None:
            return {"v": last}
        n = 0
        end = self._pos
        for v in range(self._pos + 1, last + 1):
            adds = self._add_counts.get(v)
            if adds is None:
                adds = 0
                with open(_commit_path(self.path, v)) as fh:
                    for line in fh:
                        line = line.strip()
                        if line and "add" in json.loads(line):
                            adds += 1
                self._add_counts[v] = adds
            n += adds
            end = v  # commits are atomic: never split one
            if n >= self._limit:
                break
        return {"v": end}

    def partitions(self, start: dict, end: dict):
        self._pos = max(self._pos if self._pos is not None else -1, start["v"])
        parts = []
        for v in range(start["v"] + 1, end["v"] + 1):
            with open(_commit_path(self.path, v)) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    a = json.loads(line)
                    if "remove" in a and not self.ignore_deletes:
                        raise ValueError(
                            f"delta commit {v} contains a remove action; this "
                            "source tails APPENDS — pass .option('ignoreDeletes',"
                            "'true') to skip removes (Delta's own semantics), or "
                            "re-process the table as a batch"
                        )
                    if "add" in a:
                        add = a["add"]
                        if add.get("deletionVector"):
                            # a DV-carrying add RE-STATES an existing
                            # file (delete commit) — emitting it would
                            # double-read its live rows; same posture as
                            # Delta's source (skipChangeCommits)
                            if not self.ignore_deletes:
                                raise ValueError(
                                    f"delta commit {v} re-adds a file with "
                                    "a deletion vector (row-level delete); "
                                    "this source tails APPENDS — pass "
                                    ".option('ignoreDeletes','true') to "
                                    "skip delete commits, or re-process "
                                    "as a batch"
                                )
                            continue  # ignoreDeletes: skip the re-add
                        p = add["path"]
                        parts.append(
                            DeltaFilePartition(
                                p if os.path.isabs(p) else os.path.join(self.path, p),
                                tuple(
                                    _coerce_partition(
                                        (add.get("partitionValues") or {}).get(
                                            self.part_phys.get(c, c)
                                        ),
                                        self.schema[c].dataType,
                                    )
                                    for c in self.partition_columns
                                ),
                            )
                        )
        return parts

    def read(self, partition: DeltaFilePartition):
        yield from self._rows(partition)

    def commit(self, end: dict) -> None:
        # offsets live in the query checkpoint; track locally for the
        # maxFilesPerTrigger bound
        self._pos = max(self._pos if self._pos is not None else -1, end["v"])


@dataclass
class DeltaWriteCommit(WriterCommitMessage):
    # [(tmp_path, rows, size, partition_values_json)] — one entry per
    # (task, partition value); '{}' when unpartitioned
    files: tuple = ()


class PyDeltaBatchWriter(DataSourceArrowWriter):
    """``df.write.format("pydelta")`` — the Delta commit protocol IS the
    two-phase commit: tasks write ``_tmp-<uuid>.parquet`` (invisible —
    Delta readers only see files the log names), the driver-side
    ``commit`` renames them to ``part-*.parquet`` and appends ONE log
    commit: protocol+metaData on first write, adds (+removes of the
    previous live set for overwrite mode) after. A crashed or
    speculative task leaves at most an unreferenced tmp file, never a
    visible row — exactly the atomicity the log gives real Delta
    writers.

    Partitioned tables (round 9): write tasks route rows by partition
    tuple and — per the Delta spec — EXCLUDE partition columns from the
    data files; values travel only in each add's ``partitionValues``.
    New tables partition via ``option("partitionBy", "c1,c2")``;
    existing tables' partition columns come from the log (the old
    writer silently appended empty partitionValues to a partitioned
    table, nulling those rows' partition columns on read)."""

    def __init__(self, schema: T.StructType, options, overwrite: bool):
        self.dest = _local(options["path"])
        self.overwrite = overwrite
        self.schema = schema
        if latest_version(self.dest) >= 0:
            state = read_delta_table(self.dest)
            if [(f.name, f.dataType) for f in state.schema.fields] != [
                (f.name, f.dataType) for f in schema.fields
            ]:
                raise ValueError(
                    "pydelta writer: dataframe schema does not match the "
                    f"table ({state.schema.simpleString()}) — evolve the "
                    "table first or align the dataframe"
                )
            self.part_cols = state.partition_columns
            # COLUMN-MAPPED tables are served (round 9): data files
            # write under PHYSICAL names and partitionValues key by
            # physical name; mapped tables ('name' AND 'id' mode) also
            # stamp PARQUET:field_id on every column per the spec —
            # which is what makes the files id-resolvable. The WRITER
            # still refuses nested-mapped tables (its arrow row-path
            # only maps flat columns; both READ paths serve nested id
            # tables since r10 — write those through the Spark-side
            # format layer).
            from iceberg_metadata_pipeline_spark.catalog.delta_format import (
                _has_nested_mapping,
                column_mapping_ids,
                column_mapping_mode,
                physical_names_meta,
            )

            self.physical = physical_names_meta(state)
            mode = column_mapping_mode(state)
            self.field_ids = (
                column_mapping_ids(state) if mode != "none" else None
            )
            if mode != "none" and any(
                _has_nested_mapping(f.dataType) for f in state.schema.fields
            ):
                raise NotImplementedError(
                    "pydelta writer: NESTED column mapping needs physical "
                    "nested parquet writes; top-level mapped tables are "
                    "served, nested ones take the export path"
                )
        else:
            raw = options.get("partitionBy", "") or ""
            self.part_cols = [c.strip() for c in raw.split(",") if c.strip()]
            missing = [
                c for c in self.part_cols if c not in schema.fieldNames()
            ]
            if missing:
                raise ValueError(
                    f"pydelta writer: partitionBy columns {missing} not in "
                    "schema"
                )
            self.physical = {f.name: f.name for f in schema.fields}
            self.field_ids = None
        os.makedirs(self.dest, exist_ok=True)

    def write(self, iterator):
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        # explicit arrow schema: inference would type an all-null task
        # partition's column as null and break the table schema
        from iceberg_metadata_pipeline_spark.ingest.arrow_types import (
            arrow_fields,
        )

        fields = arrow_fields(self.schema, writer="pydelta writer")
        names = [f.name for f in self.schema.fields]
        part_idx = {c: names.index(c) for c in self.part_cols}
        # spec: partition columns live in partitionValues, NOT the file;
        # column-mapped tables store PHYSICAL names in both the files
        # and the partitionValues keys
        phys = getattr(self, "physical", None) or {n: n for n in names}
        fid = getattr(self, "field_ids", None) or {}
        data_fields = [
            pa.field(
                phys.get(f.name, f.name),
                f.type,
                metadata=(
                    {b"PARQUET:field_id": str(fid[f.name]).encode()}
                    if f.name in fid
                    else None
                ),
            )
            for f in fields
            if f.name not in part_idx
        ]
        data_names = [n for n in names if n not in part_idx]

        def _pv(v):
            if v is None:
                return None
            if isinstance(v, bool):
                return "true" if v else "false"
            return str(v)

        # Arrow-native (round-12 continuation): RecordBatches split by
        # partition tuple columnar-side; empty tasks return no files
        # (writing a 0-row file per task would bloat the table's file
        # count — 32 files for a 1-row commit on local[32])
        from iceberg_metadata_pipeline_spark.ingest.arrow_write import (
            grouped_arrow_tables,
        )

        out = []
        for pv, table in grouped_arrow_tables(
            iterator, self.schema, self.part_cols, writer="pydelta writer"
        ):
            # spec: partition columns live in partitionValues, NOT the
            # file; physical (column-mapped) names + field ids go on
            # the written schema
            data_tbl = pa.table(
                [table.column(n) for n in data_names],
                schema=pa.schema(data_fields),
            )
            tmp = os.path.join(self.dest, f"_tmp-{_uuid.uuid4().hex}.parquet")
            pq.write_table(data_tbl, tmp)
            pvals = json.dumps(
                {phys.get(c, c): _pv(v) for c, v in zip(self.part_cols, pv)}
            )
            out.append((tmp, table.num_rows, os.path.getsize(tmp), pvals))
        return DeltaWriteCommit(files=tuple(out))

    def commit(self, messages):
        import time as _time
        import uuid as _uuid

        from iceberg_metadata_pipeline_spark.catalog.delta_format import (
            write_commit,
        )

        now = int(_time.time() * 1000)
        actions: list[dict] = []
        prev = latest_version(self.dest)
        if prev < 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            actions.append(
                {
                    "metaData": {
                        "id": str(_uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": json.dumps(self.schema.jsonValue()),
                        "partitionColumns": list(self.part_cols),
                        "configuration": {},
                        "createdTime": now,
                    }
                }
            )
        elif self.overwrite:
            actions.extend(
                {"remove": {"path": p, "deletionTimestamp": now, "dataChange": True}}
                for p in read_delta_table(self.dest).files
            )
        actions.extend(self._adds(messages, now, lambda: f"part-{_uuid.uuid4().hex}.parquet"))
        actions.append({"commitInfo": {"timestamp": now, "operation": "WRITE"}})
        write_commit(self.dest, actions)

    def _adds(self, messages, now: int, name_fn) -> list[dict]:
        """Rename every task's tmp files into place and return the add
        actions — partitionValues from each file's routed tuple."""
        out = []
        flat = []
        for m in messages:
            if m is None:
                continue
            flat.extend(getattr(m, "files", ()) or ())
        for tmp, rows, size, pvals in sorted(flat):
            name = name_fn()
            os.rename(tmp, os.path.join(self.dest, name))
            out.append(
                {
                    "add": {
                        "path": name,  # relative, per spec's normal layout
                        "partitionValues": json.loads(pvals),
                        "size": size,
                        "modificationTime": now,
                        "dataChange": True,
                        "stats": json.dumps({"numRecords": rows}),
                    }
                }
            )
        return out

    def abort(self, messages):
        for m in messages:
            for tmp, *_rest in getattr(m, "files", ()) or ():
                if os.path.exists(tmp):
                    os.remove(tmp)


class PyDeltaStreamWriter(PyDeltaBatchWriter, DataSourceStreamArrowWriter):
    """``df.writeStream.format("pydelta")`` — one Delta commit per
    epoch, EXACTLY-ONCE via the spec's own ``txn`` mechanism: every
    commit carries ``{"txn": {"appId", "version": batchId}}``, and a
    re-delivered epoch (sink-side retry after a crash between commit
    and checkpoint) is detected by replaying the log's txn watermark
    and skipped — the same idempotent-writer protocol Delta's own
    streaming sink runs. ``option("txnAppId", ...)`` names the writer
    (default "pydelta-sink"); two different queries writing one table
    need distinct appIds."""

    def __init__(self, schema: T.StructType, options, overwrite: bool):
        super().__init__(schema, options, overwrite)
        self.app_id = options.get("txnAppId", "pydelta-sink")

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        import time as _time
        import uuid as _uuid

        from iceberg_metadata_pipeline_spark.catalog.delta_format import (
            write_commit,
        )

        prev = latest_version(self.dest)
        if prev >= 0:
            state = read_delta_table(self.dest)
            last = state.txns.get(self.app_id)
            if last is not None and int(batchId) <= last:
                # epoch already committed — drop the replayed files
                self.abort(messages, batchId)
                return
        now = int(_time.time() * 1000)
        actions: list[dict] = []
        if prev < 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            actions.append(
                {
                    "metaData": {
                        "id": str(_uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": json.dumps(self.schema.jsonValue()),
                        "partitionColumns": list(self.part_cols),
                        "configuration": {},
                        "createdTime": now,
                    }
                }
            )
        actions.append({"txn": {"appId": self.app_id, "version": int(batchId)}})
        actions.extend(
            self._adds(
                messages,
                now,
                lambda: f"part-{int(batchId):08d}-{_uuid.uuid4().hex[:8]}.parquet",
            )
        )
        actions.append(
            {"commitInfo": {"timestamp": now, "operation": "STREAMING UPDATE"}}
        )
        write_commit(self.dest, actions)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        PyDeltaBatchWriter.abort(self, messages)


class PyDeltaDataSource(DataSource):
    """``spark.dataSource.register(PyDeltaDataSource)`` → format name
    "pydelta" for batch read/write, readStream, and writeStream."""

    @classmethod
    def name(cls) -> str:
        return "pydelta"

    def schema(self):
        state = read_delta_table(_local(self.options["path"]))
        return state.schema

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return PyDeltaBatchReader(self.options)

    def writer(self, schema: T.StructType, overwrite: bool) -> DataSourceWriter:
        return PyDeltaBatchWriter(schema, self.options, overwrite)

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        return PyDeltaStreamReader(schema, self.options)

    def streamWriter(self, schema: T.StructType, overwrite: bool):
        return PyDeltaStreamWriter(schema, self.options, overwrite)


def register(spark) -> None:
    """Idempotent format registration (latest registration wins)."""
    spark.dataSource.register(PyDeltaDataSource)


def _declare_queries() -> None:
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F

    from iceberg_metadata_pipeline_spark.queries import query
    from iceberg_metadata_pipeline_spark.session import load_tables

    @query(
        "source_pydelta_datasource",
        """
SELECT n_regionkey, COUNT(*) AS n,
  MIN(n_name) AS first_name
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""",
    )
    def source_pydelta_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
        """End-to-end through the Delta log + pydelta source: register
        the nation fixture metadata-only in metacat, export as a Delta
        table (JSON log, add actions with stats), then read it back with
        ``spark.read.format("pydelta")`` — schema and live file set come
        from log replay, not from metacat — and aggregate. Matching the
        raw-fixture oracle proves the log writer, the replay reader, and
        the DataSource plumbing agree end-to-end."""
        import os as _os
        import tempfile as _tf

        from iceberg_metadata_pipeline_spark.catalog.delta_format import (
            export_delta_table,
        )
        from iceberg_metadata_pipeline_spark.catalog.metacat import (
            Catalog,
            scan_parquet_footers,
        )

        load_tables(spark, sf_dir)
        register(spark)
        catalog = Catalog(spark, _tf.mkdtemp(prefix="wh-pydelta-"))
        t = catalog.create_table("nyc", "nation_dl", spark.table("nation").schema)
        t.append_files(
            scan_parquet_footers(_os.path.join(sf_dir, "nation.parquet"), spark)
        )
        dest = _tf.mkdtemp(prefix="pydelta-q-")
        export_delta_table(t.refresh(), dest)
        back = spark.read.format("pydelta").load(dest)
        return (
            back.groupBy("n_regionkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("n_name").alias("first_name"),
            )
            .orderBy("n_regionkey")
        )

    @query(
        "source_pydelta_writer_partitioned",
        """
SELECT c_mktsegment, COUNT(*) AS n,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    )
    def source_pydelta_writer_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The PARTITIONED pydelta writer end-to-end (round 9): customer
        writes through ``option("partitionBy", "c_mktsegment")`` — write
        tasks route rows per segment and, per the Delta spec, EXCLUDE
        the partition column from the data files (values travel in each
        add's partitionValues); a second append picks the partitioning
        up from the log. The pydelta reader reattaches the values, so
        the aggregate must match the oracle exactly."""
        import tempfile as _tf

        register(spark)
        customer = load_tables(spark, sf_dir)["customer"]
        dest = _tf.mkdtemp(prefix="delta-wp-") + "/customer_p"
        customer.where("c_mktsegment <> 'BUILDING'").write.format(
            "pydelta"
        ).option("partitionBy", "c_mktsegment").mode("append").save(dest)
        customer.where("c_mktsegment = 'BUILDING'").write.format(
            "pydelta"
        ).mode("append").save(dest)
        back = spark.read.format("pydelta").load(dest)
        return (
            back.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("c_acctbal").cast("decimal(38,6)"))
                .cast("double")
                .alias("total_bal"),
            )
            .orderBy("c_mktsegment")
        )


_declare_queries()
