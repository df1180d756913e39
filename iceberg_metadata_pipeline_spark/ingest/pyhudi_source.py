"""``pyhudi`` — a Spark-4 Python DataSource over the from-scratch Hudi
COW layer (catalog/hudi_format.py), completing the DataSource trio with
``pyice`` and ``pydelta``: plain ``spark.read.format("pyhudi")`` over a
real Hudi table directory, with

- snapshot reads of the latest completed instant,
- ``asOfInstant`` time travel (any completed instant time),
- a STREAMING source whose offset is the timeline instant itself —
  ``readStream`` tails completed commits and each micro-batch emits
  exactly the base files those commits wrote (Hudi's incremental-pull
  primitive as a Structured Streaming source; the checkpoint stores the
  last consumed instant, so restart resumes from the timeline position).

Schema comes from the first live base file's parquet footer (arrow →
Spark types); hive-encoded partition-path columns that are NOT present
in the data files are appended as typed-by-parse strings — the COW
export path symlinks foreign parquet, so partition values live only in
the path, exactly like Hudi bootstrap tables.

Scale: planning is O(timeline + files) driver-side metadata; each base
file is one input partition (pyarrow batch reads inside the worker);
the stream reads only O(churn) files per micro-batch.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import types as T
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

from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
    completed_instants,
    read_hudi_table,
)


def _local(path: str) -> str:
    return path[len("file:") :] if path.startswith("file:") else path


_ARROW_TO_SPARK = {
    "int8": T.ByteType(), "int16": T.ShortType(), "int32": T.IntegerType(),
    "int64": T.LongType(), "float": T.FloatType(), "double": T.DoubleType(),
    "string": T.StringType(), "large_string": T.StringType(),
    "bool": T.BooleanType(), "date32[day]": T.DateType(),
    "binary": T.BinaryType(), "timestamp[us]": T.TimestampType(),
}


def _file_schema(path: str) -> T.StructType:
    import pyarrow.parquet as pq

    fields = []
    for f in pq.read_schema(path):
        dt = _ARROW_TO_SPARK.get(str(f.type))
        if dt is None:
            raise NotImplementedError(
                f"pyhudi: no Spark mapping for arrow type {f.type} "
                f"(column {f.name}); flatten/cast before export"
            )
        fields.append(T.StructField(f.name, dt))
    return T.StructType(fields)


def _parse_partition_path(ppath: str) -> dict[str, str]:
    """hive-style 'a=1/b=x' → {'a': '1', 'b': 'x'} ('' → {})."""
    out: dict[str, str] = {}
    for seg in ppath.split("/"):
        if "=" in seg:
            k, v = seg.split("=", 1)
            out[k] = v
    return out


@dataclass
class HudiFilePartition(InputPartition):
    path: str
    partition_values: tuple
    # MOR snapshot: this slice's log files ((path, deltacommit), ...) —
    # the task merges base + logs by record key (one task per FILE
    # SLICE, the same distributed unit as Hudi's own MOR scan; the
    # driver ships O(#log files) paths, never rows)
    logs: tuple = ()
    key_field: str = ""
    valid_instants: tuple = ()
    as_of: str = ""
    # MOR incremental stream: emit the data-block records of ONE log
    # file for the instants of this micro-batch. DELETE blocks refuse
    # loudly unless the caller opted in with .option('ignoreDeletes',
    # 'true') — the same appends-only contract as pydelta/pyice:
    # silently dropping row-level deletes would make the tailing
    # consumer diverge from the table with no signal.
    stream_log: str = ""
    stream_instants: tuple = ()
    stream_ignore_deletes: bool = False


class _HudiReadMixin:
    schema: T.StructType
    file_cols: list[str]  # columns physically in the parquet files
    part_cols: list[str]  # appended from the partition path

    def _record_batches(self, records, pvals):
        """Merged/decoded dict-records → arrow batches (round 12): the
        avro decode is inherently per-row Python, but the Spark
        boundary goes columnar in 4096-row slabs."""
        from iceberg_metadata_pipeline_spark.ingest import arrow_scan

        pa_schema = arrow_scan.spark_to_arrow_schema(self.schema)
        names = [f.name for f in self.schema.fields]

        def merged():
            for rec in records:
                yield {**rec, **pvals} if pvals else rec

        yield from arrow_scan.batches_from_records(merged(), names, pa_schema)

    def _decoded_block_batches(self, batch, pvals):
        """A vectorized-decoded log-block batch → the declared schema:
        partition-path values fill via O(1) arrays, missing
        added-after-write columns project null (same projection rules
        as the parquet path below)."""
        from iceberg_metadata_pipeline_spark.ingest import arrow_scan

        pa_schema = arrow_scan.spark_to_arrow_schema(self.schema)
        n = batch.num_rows
        got = dict(zip(batch.schema.names, batch.columns))
        arrays = []
        for i, f in enumerate(self.schema.fields):
            tgt_type = pa_schema.field(i).type
            if f.name in pvals:
                arrays.append(arrow_scan.fill_array(pvals[f.name], n, tgt_type))
            elif f.name in got:
                col = got[f.name]
                arrays.append(col if col.type == tgt_type else col.cast(tgt_type))
            else:
                arrays.append(arrow_scan.fill_array(None, n, tgt_type))
        out = arrow_scan.finish_batch(arrays, pa_schema)
        if out is not None:
            yield out

    def _rows(self, part: HudiFilePartition):
        import pyarrow.parquet as pq

        pvals = dict(zip(self.part_cols, part.partition_values))
        if part.stream_log:
            from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
                BLOCK_AVRO_DATA,
                BLOCK_DELETE,
                HEADER_INSTANT_TIME,
                _decode_data_block,
                _decode_data_block_arrow,
                read_log_blocks,
            )

            live = set(part.stream_instants)
            for bt, h, content in read_log_blocks(part.stream_log):
                if h.get(HEADER_INSTANT_TIME) not in live:
                    continue
                if bt == BLOCK_DELETE and not part.stream_ignore_deletes:
                    raise ValueError(
                        f"pyhudi stream: {part.stream_log} carries a DELETE "
                        f"log block at instant {h.get(HEADER_INSTANT_TIME)} — "
                        "this source tails APPENDS/UPSERTS; pass "
                        ".option('ignoreDeletes','true') to skip row-level "
                        "deletes, or consume the table with batch snapshot "
                        "reads"
                    )
                if bt == BLOCK_AVRO_DATA:
                    decoded = _decode_data_block_arrow(content, h)
                    if decoded is not None:
                        yield from self._decoded_block_batches(decoded, pvals)
                    else:
                        yield from self._record_batches(
                            _decode_data_block(content, h), pvals
                        )
            return
        if part.logs:
            from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
                merge_file_slice,
            )

            yield from self._record_batches(
                merge_file_slice(
                    part.path or None,
                    list(part.logs),
                    part.key_field,
                    frozenset(part.valid_instants),
                    part.as_of,
                ),
                pvals,
            )
            return
        if not part.path:
            return  # log-only group whose logs all filtered out
        # vectorized (round 12): base-file slices (no logs — the COW /
        # compacted-MOR common case) yield RecordBatch directly;
        # partition-path values and added-after columns fill via O(1)
        # arrays. Log-merge slices above stay record-at-a-time: the
        # merge itself is key-hash driven over decoded avro records.
        from iceberg_metadata_pipeline_spark.ingest import arrow_scan

        pa_schema = arrow_scan.spark_to_arrow_schema(self.schema)
        pf = pq.ParquetFile(part.path)
        present = set(pf.schema_arrow.names)
        for batch in pf.iter_batches(
            columns=[c for c in self.file_cols if c in present]
        ):
            n = batch.num_rows
            got = dict(zip(batch.schema.names, batch.columns))
            arrays = []
            for i, f in enumerate(self.schema.fields):
                tgt_type = pa_schema.field(i).type
                if f.name in pvals:
                    arrays.append(arrow_scan.fill_array(pvals[f.name], n, tgt_type))
                elif f.name in got:
                    arrays.append(got[f.name])
                else:
                    # files predating an added column project null
                    arrays.append(arrow_scan.fill_array(None, n, tgt_type))
            out = arrow_scan.finish_batch(arrays, pa_schema)
            if out is not None:
                yield out


def _resolve_schema(state) -> tuple[T.StructType, list[str], list[str]]:
    if not state.files:
        raise ValueError(
            f"pyhudi: {state.location} has no live base files at instant "
            f"{state.instant or '<none>'} — nothing to derive a schema "
            "from (empty or just-created table)"
        )
    # deterministic pick: lowest (partition_path, file_id) key WITH a
    # base file, not dict iteration order — file schemas are expected
    # identical, but the chosen footer should not depend on insertion
    # order. A table whose live groups are all LOG-ONLY (no base parquet
    # yet) resolves from the MOR create schema instead.
    with_base = sorted(k for k, bf in state.files.items() if bf.path)
    if with_base:
        fschema = _file_schema(state.files[with_base[0]].path)
    else:
        import json as _json

        raw = state.properties.get("hoodie.table.create.schema")
        if not raw:
            raise ValueError(
                f"pyhudi: {state.location} has only log-only file groups "
                "and no create schema — cannot resolve a read schema"
            )
        fschema = T.StructType.fromJson(_json.loads(raw))
    file_cols = [f.name for f in fschema.fields]
    part_cols = [c for c in state.partition_fields if c not in file_cols]
    full = T.StructType(
        list(fschema.fields)
        + [T.StructField(c, T.StringType(), True) for c in part_cols]
    )
    return full, file_cols, part_cols


class PyHudiBatchReader(DataSourceReader, _HudiReadMixin):
    def __init__(self, options):
        self.path = _local(options["path"])
        state = read_hudi_table(self.path, options.get("asOfInstant"))
        self.schema, self.file_cols, self.part_cols = _resolve_schema(state)
        self._parts = []
        for key, bf in sorted(state.files.items()):
            logs = state.log_files.get(key, [])
            self._parts.append(
                HudiFilePartition(
                    bf.path,
                    tuple(
                        _parse_partition_path(bf.partition_path).get(c)
                        for c in self.part_cols
                    ),
                    logs=tuple((lg.path, lg.instant_time) for lg in logs),
                    key_field=state.record_key_field if logs else "",
                    valid_instants=tuple(sorted(state.valid_instants)) if logs else (),
                    as_of=state.instant if logs else "",
                )
            )

    def partitions(self):
        return self._parts

    def read(self, partition: HudiFilePartition):
        yield from self._rows(partition)


class PyHudiStreamReader(DataSourceStreamReader, _HudiReadMixin):
    """Offset = the last consumed completed instant time (lexicographic —
    Hudi instants are yyyyMMddHHmmssSSS, so string order IS time order).
    Each batch emits the base files written by instants in
    (start, end] — the incremental-pull contract."""

    def __init__(self, schema: T.StructType, options):
        self.path = _local(options["path"])
        state = read_hudi_table(self.path)
        self.schema, self.file_cols, self.part_cols = _resolve_schema(state)
        lim = int(options.get("maxFilesPerTrigger", 0) or 0)
        self._limit = lim if lim > 0 else None
        self.ignore_deletes = (
            str(options.get("ignoreDeletes", "false")).lower() == "true"
        )
        # engine-confirmed position: set by partitions()/commit(). The
        # Python DataSource API has no ReadLimit handshake, so throttling
        # starts at the SECOND micro-batch of a reader instance — bounding
        # before the engine reveals its checkpointed start could return an
        # offset BEHIND it and regress the offset log (duplicates on a
        # later restart). First batch unthrottled is safe, never wrong.
        self._pos: str | None = None

    def initialOffset(self) -> dict:
        return {"t": ""}

    def latestOffset(self) -> dict:
        done = completed_instants(self.path)
        if not done:
            return {"t": ""}
        if self._limit is None or self._pos is None:
            return {"t": done[-1].time}
        from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
            read_instant_metadata,
        )

        n = 0
        end = self._pos
        for ins in done:
            if ins.time <= self._pos:
                continue
            md = read_instant_metadata(self.path, ins)
            n += sum(
                len(stats)
                for stats in (md.get("partitionToWriteStats") or {}).values()
            )
            end = ins.time  # instants are atomic: never split one
            if n >= self._limit:
                break
        return {"t": end}

    def partitions(self, start: dict, end: dict):
        self._pos = max(self._pos or "", start["t"])
        from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
            incremental_slices,
        )

        bases, logs = incremental_slices(
            self.path, begin=start["t"], end=end["t"] or None
        )
        parts = [
            HudiFilePartition(
                bf.path,
                tuple(
                    _parse_partition_path(bf.partition_path).get(c)
                    for c in self.part_cols
                ),
            )
            for bf in bases
        ]
        # MOR: each log file written in range emits its data-block
        # records for exactly its own deltacommit — the incremental-pull
        # contract extended to upserts. Row-level deletes refuse at
        # PLANNING time when the commit metadata records them (cheap:
        # O(instants in batch) stats reads, no log bytes); the executor
        # keeps an authoritative guard for foreign-written logs whose
        # stats omit numDeletes.
        if logs and not self.ignore_deletes:
            from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
                read_instant_metadata,
            )

            batch_times = {lg.instant_time for lg in logs}
            for ins in completed_instants(self.path):
                if ins.time not in batch_times:
                    continue
                md = read_instant_metadata(self.path, ins) or {}
                n_del = sum(
                    int(st.get("numDeletes") or 0)
                    for stats in (md.get("partitionToWriteStats") or {}).values()
                    for st in stats
                )
                if n_del:
                    raise ValueError(
                        f"pyhudi stream: instant {ins.time} deletes {n_del} "
                        "row(s) — this source tails APPENDS/UPSERTS; pass "
                        ".option('ignoreDeletes','true') to skip row-level "
                        "deletes, or consume the table with batch snapshot "
                        "reads"
                    )
        parts.extend(
            HudiFilePartition(
                "",
                tuple(
                    _parse_partition_path(lg.partition_path).get(c)
                    for c in self.part_cols
                ),
                stream_log=lg.path,
                stream_instants=(lg.instant_time,),
                stream_ignore_deletes=self.ignore_deletes,
            )
            for lg in logs
        )
        return parts

    def read(self, partition: HudiFilePartition):
        yield from self._rows(partition)

    def commit(self, end: dict) -> None:
        # offsets live in the query checkpoint; track locally for the
        # maxFilesPerTrigger bound
        self._pos = max(self._pos or "", end["t"])


@dataclass
class HudiWriteCommit(WriterCommitMessage):
    # [(tmp_path, rows, size, partition_path)] — one entry per
    # (task, partition value); partition_path is "" when unpartitioned
    files: tuple = ()


class PyHudiBatchWriter(DataSourceArrowWriter):
    """``df.write.format("pyhudi")`` over a COPY_ON_WRITE table — the
    same two-phase commit as the pydelta writer, expressed in Hudi's
    protocol: tasks write invisible ``_tmp-*.parquet`` files; the
    driver opens an instant, renames each tmp into the spec's
    ``<fileId>_<token>_<instant>.parquet`` name, and completes ONE
    timeline instant listing the write stats (``commit`` for append;
    ``replacecommit`` retiring every previous file group for
    overwrite — atomic replace, time travel intact). A crashed or
    speculative task leaves at most an unreferenced tmp file — the
    timeline is the commit, not the directory listing.

    Partitioned COW tables (round 9): write tasks route rows into hive
    partition paths via ``_hive_partition_path`` (the same canonical
    rendering both MOR write paths use, incl. the null token) — one
    file per (task, partition value), per-partition write stats, and
    per-partition replace ids on overwrite. A NEW table partitions via
    ``option("partitionBy", "col1,col2")``; an existing table's
    partition fields come from its properties.

    Bounds (refusals, not silent corruption): COW only — MOR tables
    take upsert_mor/delete_mor (the log-append protocol)."""

    def __init__(self, schema: T.StructType, options, overwrite: bool):
        self.dest = _local(options["path"])
        self.overwrite = overwrite
        self.schema = schema
        from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
            read_properties,
        )

        try:
            props = read_properties(self.dest)
        except (FileNotFoundError, KeyError):
            props = None
        if props is not None:
            if props.get("hoodie.table.type") != "COPY_ON_WRITE":
                raise NotImplementedError(
                    "pyhudi writer: MERGE_ON_READ tables take "
                    "upsert_mor/delete_mor (log appends), not the COW "
                    "file writer"
                )
            self.part_fields = [
                c
                for c in props.get("hoodie.table.partition.fields", "").split(",")
                if c
            ]
            # schema check against the table's committed schema (the
            # writer stamps it in every commit's extraMetadata; exported
            # tables carry it too) — mixed-schema appends refuse early
            committed = self._committed_schema()
            if committed is not None and [
                (f.name, f.dataType) for f in committed.fields
            ] != [(f.name, f.dataType) for f in schema.fields]:
                raise ValueError(
                    "pyhudi writer: dataframe schema does not match the "
                    f"table ({committed.simpleString()}) — evolve the "
                    "table first or align the dataframe"
                )
        else:
            raw = options.get("partitionBy", "") or ""
            self.part_fields = [c.strip() for c in raw.split(",") if c.strip()]
            missing = [
                c for c in self.part_fields if c not in schema.fieldNames()
            ]
            if missing:
                raise ValueError(
                    f"pyhudi writer: partitionBy columns {missing} not in schema"
                )
        self._exists = props is not None
        os.makedirs(self.dest, exist_ok=True)

    def _committed_schema(self) -> T.StructType | None:
        """The newest committed schema: the last completed instant whose
        extraMetadata carries one (our writer and the MOR verbs stamp
        it). None when no instant declares a schema (e.g. bootstrap
        exports) — then the footer-derived read schema is authoritative
        and the check is skipped."""
        from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
            read_instant_metadata,
        )

        for ins in reversed(completed_instants(self.dest)):
            raw = (
                (read_instant_metadata(self.dest, ins) or {})
                .get("extraMetadata") or {}
            ).get("schema")
            if raw:
                return T.StructType.fromJson(json.loads(raw))
        return None

    def write(self, iterator):
        """Arrow-native (round-12 continuation): RecordBatches split by
        hive partition path columnar-side — value columns never
        round-trip through per-row Python."""
        import uuid as _uuid

        import pyarrow.parquet as pq

        from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
            _hive_partition_path,
        )
        from iceberg_metadata_pipeline_spark.ingest.arrow_write import (
            grouped_arrow_tables,
        )

        out = []
        for key, table in grouped_arrow_tables(
            iterator, self.schema, self.part_fields, writer="pyhudi writer"
        ):
            ppath = _hive_partition_path(
                dict(zip(self.part_fields, key)), self.part_fields
            )
            tmp = os.path.join(self.dest, f"_tmp-{_uuid.uuid4().hex}.parquet")
            pq.write_table(table, tmp)
            out.append((tmp, table.num_rows, os.path.getsize(tmp), ppath))
        return HudiWriteCommit(files=tuple(out))

    # extra commit metadata hook (the stream writer stamps its
    # exactly-once epoch marker through this)
    _extra_metadata: dict[str, str] = {}

    def _table_exists(self) -> bool:
        from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
            read_properties,
        )

        try:
            read_properties(self.dest)
            return True
        except (FileNotFoundError, KeyError):
            return False

    def commit(self, messages):
        from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
            _base_file_name,
            _ensure_partition_metadata,
            _group_file_id,
            begin_instant,
            complete_instant,
            create_hudi_table,
            read_hudi_table,
        )

        # re-check at commit time: a stream writer instance spans epochs,
        # and epoch 0 creates the table __init__ did not see
        exists = self._table_exists()
        if not exists:
            create_hudi_table(
                self.dest,
                os.path.basename(self.dest.rstrip("/")),
                self.part_fields,
            )
        prev_by_part: dict[str, list[str]] = {}
        if exists and self.overwrite:
            for (p, fid) in read_hudi_table(self.dest).files:
                prev_by_part.setdefault(p, []).append(fid)
            for v in prev_by_part.values():
                v.sort()
        action = "replacecommit" if prev_by_part else "commit"
        t = begin_instant(self.dest, action)
        flat = []
        for m in messages:
            if m is None:
                continue
            flat.extend(getattr(m, "files", ()) or ())
        stats_by_part: dict[str, list[dict]] = {}
        seen_parts: set[str] = set()
        for i, (tmp, rows, size, ppath) in enumerate(sorted(flat)):
            if ppath not in seen_parts:
                _ensure_partition_metadata(self.dest, ppath, t)
                seen_parts.add(ppath)
            fid = _group_file_id(f"writer#{t}#{ppath}", i)
            rel = (
                os.path.join(ppath, _base_file_name(fid, t))
                if ppath
                else _base_file_name(fid, t)
            )
            os.makedirs(
                os.path.dirname(os.path.join(self.dest, rel)), exist_ok=True
            )
            os.rename(tmp, os.path.join(self.dest, rel))
            stats_by_part.setdefault(ppath, []).append(
                {
                    "fileId": fid,
                    "path": rel,
                    "prevCommit": "null",
                    "numWrites": rows,
                    "numDeletes": 0,
                    "numUpdateWrites": 0,
                    "numInserts": rows,
                    "totalWriteBytes": size,
                    "fileSizeInBytes": size,
                    "partitionPath": ppath,
                }
            )
        if not stats_by_part and not self.part_fields:
            _ensure_partition_metadata(self.dest, "", t)
            stats_by_part = {"": []}
        md: dict = {
            "partitionToWriteStats": stats_by_part,
            "compacted": False,
            "operationType": (
                "INSERT_OVERWRITE_TABLE" if prev_by_part else "INSERT"
            ),
            "extraMetadata": {
                "schema": json.dumps(self.schema.jsonValue()),
                **self._extra_metadata,
            },
        }
        if prev_by_part:
            md["partitionToReplaceFileIds"] = prev_by_part
        complete_instant(self.dest, t, action, md)

    def abort(self, messages):
        for m in messages:
            for tmp, *_rest in getattr(m, "files", ()) or ():
                if os.path.exists(tmp):
                    os.remove(tmp)


class PyHudiStreamWriter(PyHudiBatchWriter, DataSourceStreamArrowWriter):
    """``df.writeStream.format("pyhudi")`` — one timeline instant per
    epoch, EXACTLY-ONCE the way real Hudi's streaming ingest is: the
    commit's ``extraMetadata`` carries the writer's checkpoint marker
    (appId + epoch — Hudi's deltastreamer stores its source checkpoint
    in exactly this slot), and a re-delivered epoch (sink retry after a
    crash between commit and checkpoint) is detected by replaying the
    completed instants' markers and skipped. ``option("checkpointAppId",
    ...)`` names the writer; two queries writing one table need
    distinct ids."""

    def __init__(self, schema: T.StructType, options, overwrite: bool):
        super().__init__(schema, options, overwrite)
        self.app_id = options.get("checkpointAppId", "pyhudi-sink")

    def _last_epoch(self) -> int:
        from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
            read_instant_metadata,
        )

        last = -1
        for ins in completed_instants(self.dest):
            em = (read_instant_metadata(self.dest, ins) or {}).get(
                "extraMetadata"
            ) or {}
            if em.get("streamAppId") == self.app_id:
                last = max(last, int(em.get("streamBatchId", -1)))
        return last

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        if self._table_exists() and int(batchId) <= self._last_epoch():
            # epoch already committed — drop the replayed files
            self.abort(messages, batchId)
            return
        self._extra_metadata = {
            "streamAppId": self.app_id,
            "streamBatchId": str(int(batchId)),
        }
        PyHudiBatchWriter.commit(self, messages)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        PyHudiBatchWriter.abort(self, messages)


class PyHudiDataSource(DataSource):
    """``spark.dataSource.register(PyHudiDataSource)`` → format name
    "pyhudi" for batch read and readStream over Hudi COW tables."""

    @classmethod
    def name(cls) -> str:
        return "pyhudi"

    def schema(self):
        state = read_hudi_table(_local(self.options["path"]))
        schema, _fc, _pc = _resolve_schema(state)
        return schema

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return PyHudiBatchReader(self.options)

    def writer(self, schema: T.StructType, overwrite: bool) -> DataSourceWriter:
        return PyHudiBatchWriter(schema, self.options, overwrite)

    def streamWriter(self, schema: T.StructType, overwrite: bool):
        return PyHudiStreamWriter(schema, self.options, overwrite)

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        return PyHudiStreamReader(schema, self.options)


def register(spark) -> None:
    """Idempotent format registration (latest registration wins)."""
    spark.dataSource.register(PyHudiDataSource)


def _declare_queries() -> None:
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F

    from iceberg_metadata_pipeline_spark.queries import query
    from iceberg_metadata_pipeline_spark.session import load_tables

    @query(
        "source_pyhudi_datasource",
        """
SELECT p_brand, COUNT(*) AS n,
  CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM part
GROUP BY p_brand
ORDER BY p_brand
""",
    )
    def source_pyhudi_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Register the part fixture into metacat, export it as a REAL
        Hudi COW table (timeline + bootstrap-style symlinked base files),
        then read it back through plain ``spark.read.format("pyhudi")``
        and aggregate — proving a Spark user needs no hudi jar to query
        the exported table. The DataSource plans one input partition per
        base file from O(timeline) driver metadata."""
        import os as _os
        import tempfile as _tf

        from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
            export_hudi_table,
        )
        from iceberg_metadata_pipeline_spark.catalog.metacat import (
            Catalog,
            scan_parquet_footers,
        )

        part = load_tables(spark, sf_dir)["part"]
        catalog = Catalog(spark, _tf.mkdtemp(prefix="wh-pyhudi-"))
        t = catalog.create_table("nyc", "part_hudi", part.schema)
        t.append_files(
            scan_parquet_footers(_os.path.join(sf_dir, "part.parquet"), spark)
        )
        dest = _tf.mkdtemp(prefix="hudi-pyds-") + "/part_hudi"
        export_hudi_table(t.refresh(), dest)
        register(spark)
        back = spark.read.format("pyhudi").load(dest)
        return (
            back.groupBy("p_brand")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("p_retailprice").cast("decimal(38,6)"))
                .cast("double")
                .alias("total_price"),
            )
            .orderBy("p_brand")
        )

    @query(
        "source_pyhudi_writer_roundtrip",
        """
SELECT n_regionkey, COUNT(*) AS n,
  CAST(SUM(LENGTH(n_name)) AS BIGINT) AS name_chars
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""",
    )
    def source_pyhudi_writer_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The pyhudi WRITER end-to-end (round 8): the nation fixture
        writes through plain ``df.write.format("pyhudi")`` — tasks
        write tmp parquet, the driver commits one timeline instant —
        then an OVERWRITE replaces the table under a replacecommit and
        the snapshot read must equal the oracle over the final write.
        Proves a Spark user can create, replace, and read a Hudi COW
        table with zero hudi jars and standard writer syntax."""
        import tempfile as _tf

        register(spark)
        nation = load_tables(spark, sf_dir)["nation"]
        dest = _tf.mkdtemp(prefix="hudi-wr-") + "/nation_w"
        # first write: a decoy subset; the overwrite must fully retire it
        nation.where("n_regionkey = 0").write.format("pyhudi").mode(
            "append"
        ).save(dest)
        nation.write.format("pyhudi").mode("overwrite").save(dest)
        back = spark.read.format("pyhudi").load(dest)
        return (
            back.groupBy("n_regionkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("n_name")).cast("bigint").alias("name_chars"),
            )
            .orderBy("n_regionkey")
        )

    @query(
        "source_pyhudi_writer_partitioned",
        """
SELECT n_regionkey, COUNT(*) AS n,
  CAST(SUM(LENGTH(n_name)) AS BIGINT) AS name_chars
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""",
    )
    def source_pyhudi_writer_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The PARTITIONED pyhudi writer end-to-end (round 9): nation
        writes through ``option("partitionBy", "n_regionkey")`` — write
        tasks route rows into hive partition dirs, per-partition write
        stats land in one commit — and a second append picks the fields
        up from table properties. The reader reattaches partition-path
        values, so the aggregate must match the oracle exactly."""
        import tempfile as _tf

        register(spark)
        nation = load_tables(spark, sf_dir)["nation"]
        dest = _tf.mkdtemp(prefix="hudi-wp-") + "/nation_p"
        nation.where("n_regionkey < 3").write.format("pyhudi").option(
            "partitionBy", "n_regionkey"
        ).mode("append").save(dest)
        nation.where("n_regionkey >= 3").write.format("pyhudi").mode(
            "append"
        ).save(dest)
        back = spark.read.format("pyhudi").load(dest)
        return (
            back.groupBy("n_regionkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("n_name")).cast("bigint").alias("name_chars"),
            )
            .orderBy("n_regionkey")
        )


_declare_queries()
