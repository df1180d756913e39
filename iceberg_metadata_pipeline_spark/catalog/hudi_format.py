"""From-scratch Apache Hudi Copy-on-Write table format (read + write).

Rounds 5-6 built the Iceberg v2 layer (iceberg_format.py) and the Delta
transaction log (delta_format.py); this completes the open-table-format
trio with Hudi, written purely from the public spec
(hudi.apache.org/tech-specs + the timeline/file-layout docs). No hudi
jar, no Java: a Hudi table is a base path holding

- ``.hoodie/hoodie.properties`` — java-properties table config
  (``hoodie.table.name``, ``hoodie.table.type=COPY_ON_WRITE``,
  ``hoodie.table.version``, partition-path fields, …);
- the TIMELINE in ``.hoodie/``: instant files named
  ``<instantTime>.<action>[.<state>]`` with the three-phase
  requested → inflight → completed lifecycle. Instant times are
  ``yyyyMMddHHmmssSSS`` (17-digit, millis). One spec quirk faithfully
  kept: the COMMIT action's inflight file is ``<t>.inflight`` (no
  action name), while every other action spells
  ``<t>.<action>.inflight``;
- completed ``<t>.commit`` files carry HoodieCommitMetadata JSON
  (``partitionToWriteStats`` → per-file write stats), completed
  ``<t>.replacecommit`` additionally carries
  ``partitionToReplaceFileIds`` (the clustering/overwrite mechanism);
- data (base) files named ``<fileId>_<writeToken>_<instantTime>.parquet``
  inside partition-path dirs, each dir holding a
  ``.hoodie_partition_metadata`` marker. FILE GROUPS are keyed by
  (partitionPath, fileId); each commit adds a new FILE SLICE (for COW:
  a new base file) to a group; a snapshot reads, per live group, the
  latest slice whose instant is ≤ the as-of instant.

Supported here:
- timeline write/replay with state transitions and put-if-absent
  atomicity (tmp + rename, refuse existing — Hudi's single-writer
  timeline contract);
- snapshot + time-travel reads (as-of any completed instant),
  replacecommit-aware (replaced file groups drop out of later
  snapshots);
- incremental queries: files (hence rows) written by commits in an
  instant range — the Hudi "incremental pull" primitive;
- metadata-only export of a metacat snapshot (parquet bytes never
  move: canonical ``<fileId>_…`` names are SYMLINKED to the original
  files — the same posture as Hudi's own bootstrap mode, which keeps
  foreign parquet in place and layers Hudi naming/metadata over it);
  re-export is INCREMENTAL: appeared files → ``commit``, vanished
  files → ``replacecommit`` replacing their file groups, unchanged
  snapshot commits nothing;
- import into metacat (record counts from write stats — O(files)
  metadata, no data IO);
- clean (retain last N slices per file group; older base files
  removed, ``<t>.clean`` instant recorded) and rollback of the latest
  commit (its files deleted, ``<t>.rollback`` recorded);
- ``hoodie.populate.meta.fields=false`` (virtual-key) posture: data
  files are NOT required to carry the five ``_hoodie_*`` meta columns —
  the spec'd escape hatch that makes metadata-only adoption of foreign
  parquet legal.

Refused loudly (not silently misread):
- MERGE_ON_READ tables (``.log.`` delta files, compaction timeline) —
  reading a MOR table as COW would drop un-compacted updates;
- completed clean/rollback metadata is stored here as JSON; real Hudi
  serializes those two as Avro (HoodieCleanMetadata /
  HoodieRollbackMetadata). They never affect the live-file replay
  (clean only deletes already-superseded slices), so snapshot /
  incremental / time-travel results are unaffected; reading a
  real-Hudi table whose timeline holds avro clean files skips them
  with a warning rather than guessing.

Scale notes: the timeline is O(commits) driver-side metadata, replay is
a dict fold over write stats (never data); export/import move zero
parquet bytes; incremental pull reads only the commits in range — the
property that makes a daily 100 TB-table sync O(day's churn).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import types as T

_HOODIE = ".hoodie"
_COMPLETED_ACTIONS = ("commit", "replacecommit", "clean", "rollback", "savepoint")
_WRITE_TOKEN = "0-1-0"  # taskPartitionId-stageId-attempt; single-writer export


# ---------------------------------------------------------------------------
# instant times — yyyyMMddHHmmssSSS, strictly monotonic per process
# ---------------------------------------------------------------------------

_last_instant = [""]


def new_instant_time() -> str:
    """17-digit commit-time per the spec's millisecond timeline format,
    bumped to stay strictly monotonic if two commits land in one ms."""
    t = time.strftime("%Y%m%d%H%M%S", time.gmtime()) + f"{int(time.time()*1000)%1000:03d}"
    if t <= _last_instant[0]:
        t = str(int(_last_instant[0]) + 1).zfill(17)
    _last_instant[0] = t
    return t


# ---------------------------------------------------------------------------
# hoodie.properties — java-properties serde (subset: no line continuations)
# ---------------------------------------------------------------------------


def write_properties(location: str, props: dict[str, str]) -> str:
    hoodie = os.path.join(location, _HOODIE)
    os.makedirs(hoodie, exist_ok=True)
    dest = os.path.join(hoodie, "hoodie.properties")
    tmp = dest + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        fh.write("#Updated at " + time.strftime("%a %b %d %H:%M:%S UTC %Y", time.gmtime()) + "\n")
        for k in sorted(props):
            fh.write(f"{k}={props[k]}\n")
    os.replace(tmp, dest)
    return dest


def read_properties(location: str) -> dict[str, str]:
    path = os.path.join(location, _HOODIE, "hoodie.properties")
    props: dict[str, str] = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith(("#", "!")):
                continue
            if "=" in line:
                k, _, v = line.partition("=")
                props[k.strip()] = v.strip()
    return props


# ---------------------------------------------------------------------------
# timeline
# ---------------------------------------------------------------------------


@dataclass
class Instant:
    time: str
    action: str
    state: str  # requested | inflight | completed


def _instant_filename(t: str, action: str, state: str) -> str:
    if state == "completed":
        return f"{t}.{action}"
    if state == "inflight" and action == "commit":
        # the spec quirk: commit inflights are "<t>.inflight"
        return f"{t}.inflight"
    return f"{t}.{action}.{state}"


def _parse_instant(name: str) -> Instant | None:
    parts = name.split(".")
    if not parts[0].isdigit() or len(parts[0]) not in (14, 17):
        return None
    t = parts[0]
    if len(parts) == 2:
        if parts[1] == "inflight":
            return Instant(t, "commit", "inflight")
        if parts[1] in _COMPLETED_ACTIONS or parts[1] == "deltacommit":
            return Instant(t, parts[1], "completed")
        return None
    if len(parts) == 3 and parts[2] in ("requested", "inflight"):
        return Instant(t, parts[1], parts[2])
    return None


def list_timeline(location: str) -> list[Instant]:
    """All instants, sorted by (time, state-order)."""
    hoodie = os.path.join(location, _HOODIE)
    if not os.path.isdir(hoodie):
        return []
    out = []
    for n in os.listdir(hoodie):
        ins = _parse_instant(n)
        if ins is not None:
            out.append(ins)
    order = {"requested": 0, "inflight": 1, "completed": 2}
    out.sort(key=lambda i: (i.time, order[i.state]))
    return out


def completed_instants(location: str, actions: tuple[str, ...] = ("commit", "replacecommit")) -> list[Instant]:
    return [i for i in list_timeline(location) if i.state == "completed" and i.action in actions]


def _write_instant_file(location: str, name: str, payload: bytes) -> str:
    hoodie = os.path.join(location, _HOODIE)
    os.makedirs(hoodie, exist_ok=True)
    dest = os.path.join(hoodie, name)
    if os.path.exists(dest):
        raise FileExistsError(
            f"hudi instant {name} already exists (concurrent writer? "
            "the timeline is put-if-absent)"
        )
    tmp = dest + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as fh:
        fh.write(payload)
    os.replace(tmp, dest)
    return dest


def begin_instant(location: str, action: str, instant_time: str | None = None) -> str:
    """requested → inflight; returns the instant time. The two
    transition files are what lets a concurrent reader distinguish
    'planned', 'running', and 'done' — only completed instants are
    visible to snapshots."""
    t = instant_time or new_instant_time()
    _write_instant_file(location, _instant_filename(t, action, "requested"), b"")
    _write_instant_file(location, _instant_filename(t, action, "inflight"), b"")
    return t


def complete_instant(location: str, t: str, action: str, metadata: dict) -> str:
    payload = json.dumps(metadata, indent=2, sort_keys=True).encode()
    return _write_instant_file(location, _instant_filename(t, action, "completed"), payload)


def read_instant_metadata(location: str, ins: Instant) -> dict:
    path = os.path.join(location, _HOODIE, _instant_filename(ins.time, ins.action, ins.state))
    raw = open(path, "rb").read()
    if not raw:
        return {}
    if raw[:4] == b"Obj\x01":  # real-Hudi avro clean/rollback metadata
        import warnings

        warnings.warn(f"skipping avro-serialized {ins.action} metadata at {path}")
        return {}
    return json.loads(raw)


# ---------------------------------------------------------------------------
# snapshot state — file-group replay
# ---------------------------------------------------------------------------


@dataclass
class BaseFile:
    partition_path: str
    file_id: str
    instant_time: str
    path: str  # absolute
    num_records: int
    size_bytes: int


@dataclass
class HudiTableState:
    location: str
    instant: str  # as-of completed instant time
    properties: dict[str, str]
    # (partition_path, file_id) -> latest live BaseFile
    files: dict[tuple[str, str], BaseFile] = field(default_factory=dict)

    @property
    def partition_fields(self) -> list[str]:
        raw = self.properties.get("hoodie.table.partition.fields", "")
        return [c for c in raw.split(",") if c]


def _base_file_name(file_id: str, instant_time: str) -> str:
    return f"{file_id}_{_WRITE_TOKEN}_{instant_time}.parquet"


def read_hudi_table(location: str, instant: str | None = None) -> HudiTableState:
    """Replay the timeline up to ``instant`` (default: latest completed)
    into the live file set. COW only — a MOR table refuses loudly."""
    props = read_properties(location)
    ttype = props.get("hoodie.table.type", "COPY_ON_WRITE")
    if ttype != "COPY_ON_WRITE":
        raise NotImplementedError(
            f"hoodie.table.type={ttype}: merge-on-read log files are not "
            "implemented; reading a MOR table as COW would drop "
            "un-compacted updates"
        )
    done = completed_instants(location)
    if instant is not None:
        done = [i for i in done if i.time <= instant]
        if not done:
            raise ValueError(f"no completed instant at or before {instant}")
    as_of = done[-1].time if done else ""
    state = HudiTableState(location, as_of, props)
    replaced: set[tuple[str, str]] = set()
    for ins in done:
        md = read_instant_metadata(location, ins)
        if ins.action == "replacecommit":
            for part, fids in (md.get("partitionToReplaceFileIds") or {}).items():
                replaced.update((part, fid) for fid in fids)
        for part, stats in (md.get("partitionToWriteStats") or {}).items():
            for st in stats:
                fid = st["fileId"]
                path = st["path"]
                if not os.path.isabs(path):
                    path = os.path.join(location, path)
                bf = BaseFile(
                    partition_path=part,
                    file_id=fid,
                    instant_time=ins.time,
                    path=path,
                    num_records=int(st.get("numWrites") or 0),
                    size_bytes=int(st.get("fileSizeInBytes") or 0),
                )
                cur = state.files.get((part, fid))
                # newer slice in the same file group wins (COW overwrite)
                if cur is None or bf.instant_time > cur.instant_time:
                    state.files[(part, fid)] = bf
                # a group re-written after its replacecommit is live again
                if (part, fid) in replaced and ins.time > max(
                    (i.time for i in done if i.action == "replacecommit"), default=""
                ):
                    replaced.discard((part, fid))
    for key in replaced:
        state.files.pop(key, None)
    return state


def incremental_files(location: str, begin: str, end: str | None = None) -> list[BaseFile]:
    """The Hudi incremental-pull primitive: base files WRITTEN by
    completed commits with begin < instant ≤ end. At 100 TB this is the
    O(churn) sync path — a consumer remembers its last instant and
    reads only the new slices."""
    out = []
    for ins in completed_instants(location):
        if ins.time <= begin or (end is not None and ins.time > end):
            continue
        md = read_instant_metadata(location, ins)
        for part, stats in (md.get("partitionToWriteStats") or {}).items():
            for st in stats:
                path = st["path"]
                if not os.path.isabs(path):
                    path = os.path.join(location, path)
                out.append(
                    BaseFile(part, st["fileId"], ins.time, path,
                             int(st.get("numWrites") or 0),
                             int(st.get("fileSizeInBytes") or 0))
                )
    return out


def hudi_snapshot_dataframe(spark: SparkSession, state: HudiTableState):
    """Read the live snapshot as a DataFrame — one parquet read over the
    live base files; hive-style partition dirs rejoin partition columns
    via the encoded path values (they are in the path, not the files,
    when exported from an identity-partitioned source)."""
    paths = [bf.path for bf in state.files.values()]
    if not paths:
        raise ValueError("empty hudi snapshot")
    df = spark.read.parquet(*paths)
    return df


# ---------------------------------------------------------------------------
# partition metadata markers
# ---------------------------------------------------------------------------


def _ensure_partition_metadata(location: str, partition_path: str, instant: str) -> None:
    pdir = os.path.join(location, partition_path) if partition_path else location
    os.makedirs(pdir, exist_ok=True)
    marker = os.path.join(pdir, ".hoodie_partition_metadata")
    if os.path.exists(marker):
        return
    depth = len([p for p in partition_path.split("/") if p])
    with open(marker, "w") as fh:
        fh.write("#partition metadata\n")
        fh.write(f"commitTime={instant}\n")
        fh.write(f"partitionDepth={depth}\n")


# ---------------------------------------------------------------------------
# export (metacat → hudi) / import (hudi → metacat)
# ---------------------------------------------------------------------------


def _stable_file_id(path: str) -> str:
    """Deterministic fileId per source file so re-exports keep file-group
    identity stable (incremental commits stay O(churn))."""
    return str(uuid.UUID(hashlib.md5(os.path.abspath(path).encode()).hexdigest())) + "-0"


def create_hudi_table(location: str, name: str, partition_fields: list[str]) -> None:
    write_properties(
        location,
        {
            "hoodie.table.name": name,
            "hoodie.table.type": "COPY_ON_WRITE",
            "hoodie.table.version": "6",
            "hoodie.timeline.layout.version": "1",
            "hoodie.table.base.file.format": "PARQUET",
            "hoodie.populate.meta.fields": "false",
            "hoodie.datasource.write.hive_style_partitioning": "true",
            "hoodie.table.partition.fields": ",".join(partition_fields),
            "hoodie.table.checksum": "0",
        },
    )


def _hive_partition_path(partition: dict, fields: list[str]) -> str:
    if not fields:
        return ""
    return "/".join(f"{c}={partition.get(c, '__HIVE_DEFAULT_PARTITION__')}" for c in fields)


def export_hudi_table(table, dest: str) -> str:
    """Mirror a metacat Table's current snapshot as a Hudi COW table at
    ``dest`` — metadata-only, like the Delta/Iceberg exporters: each
    data file gets a canonical ``<fileId>_<token>_<instant>.parquet``
    name SYMLINKED to the original parquet (zero bytes moved; the
    bootstrap posture). Re-export is incremental: appeared files commit
    as a new ``commit`` instant, vanished files as a ``replacecommit``
    replacing their file groups; an unchanged snapshot writes nothing
    and returns the current latest instant."""
    snap = table.current_snapshot
    if snap is not None and table._resolve_deletes(snap):
        raise ValueError(
            "unresolved merge-on-read delete entries; run "
            "rewrite_data_files() before export — Hudi COW has no "
            "row-level delete encoding for foreign files"
        )
    from iceberg_metadata_pipeline_spark.catalog.partitioning import parse_transform

    ident = [
        pf for pf in (table.default_spec or [])
        if parse_transform(pf.transform)[0] == "identity"
    ]
    part_cols = [pf.source for pf in ident]
    files = [] if snap is None else table.snapshot_files(snap["snapshot_id"])
    first = not os.path.exists(os.path.join(dest, _HOODIE, "hoodie.properties"))
    if first:
        create_hudi_table(dest, table.name if hasattr(table, "name") else "export", part_cols)
        prev_by_src: dict[str, BaseFile] = {}
    else:
        state = read_hudi_table(dest)
        prev_by_src = {os.path.realpath(bf.path): bf for bf in state.files.values()}
    cur = {os.path.realpath(os.path.abspath(f.path)): f for f in files}
    appeared = sorted(set(cur) - set(prev_by_src))
    vanished = sorted(set(prev_by_src) - set(cur))
    if not first and not appeared and not vanished:
        done = completed_instants(dest)
        return done[-1].time if done else ""
    # 1) vanished file groups → replacecommit (the clustering/overwrite verb)
    if vanished:
        t = begin_instant(dest, "replacecommit")
        by_part: dict[str, list[str]] = {}
        for src in vanished:
            bf = prev_by_src[src]
            by_part.setdefault(bf.partition_path, []).append(bf.file_id)
        complete_instant(
            dest, t, "replacecommit",
            {
                "partitionToWriteStats": {},
                "partitionToReplaceFileIds": {p: sorted(v) for p, v in by_part.items()},
                "compacted": False,
                "operationType": "CLUSTER",
                "extraMetadata": {},
            },
        )
    # 2) appeared files → commit with one write-stat per file
    if appeared or first:
        t = begin_instant(dest, "commit")
        by_part: dict[str, list[dict]] = {}
        for src in appeared:
            f = cur[src]
            part_vals = {pf.source: (f.partition or {}).get(pf.name) for pf in ident}
            ppath = _hive_partition_path(part_vals, part_cols)
            _ensure_partition_metadata(dest, ppath, t)
            fid = _stable_file_id(src)
            link_rel = os.path.join(ppath, _base_file_name(fid, t)) if ppath else _base_file_name(fid, t)
            link_abs = os.path.join(dest, link_rel)
            if not os.path.exists(link_abs):
                os.symlink(src, link_abs)
            by_part.setdefault(ppath, []).append(
                {
                    "fileId": fid,
                    "path": link_rel,
                    "prevCommit": "null",
                    "numWrites": int(f.record_count),
                    "numDeletes": 0,
                    "numUpdateWrites": 0,
                    "numInserts": int(f.record_count),
                    "totalWriteBytes": int(f.file_size_bytes),
                    "fileSizeInBytes": int(f.file_size_bytes),
                    "partitionPath": ppath,
                }
            )
        complete_instant(
            dest, t, "commit",
            {
                "partitionToWriteStats": by_part,
                "compacted": False,
                "operationType": "INSERT",
                "extraMetadata": {
                    "schema": json.dumps(table.schema.jsonValue()),
                },
            },
        )
        return t
    done = completed_instants(dest)
    return done[-1].time if done else ""


def import_hudi_table(
    spark: SparkSession, catalog, location: str, namespace: str, name: str,
    instant: str | None = None,
):
    """Register a Hudi snapshot's live base files into a metacat table
    (metadata-only; counts from write stats). Partition values are
    parsed back from hive-style partition paths so pruning survives."""
    from iceberg_metadata_pipeline_spark.catalog.metacat import DataFileEntry

    state = read_hudi_table(location, instant)
    # schema from the latest commit that recorded one; else parquet footer
    schema = None
    for ins in reversed(completed_instants(location, ("commit",))):
        if instant is not None and ins.time > instant:
            continue
        md = read_instant_metadata(location, ins)
        raw = (md.get("extraMetadata") or {}).get("schema")
        if raw:
            schema = T.StructType.fromJson(json.loads(raw))
            break
    if schema is None:
        any_path = next(iter(state.files.values())).path
        schema = spark.read.parquet(any_path).schema
    part_fields = state.partition_fields
    entries = []
    for (ppath, _fid), bf in sorted(state.files.items()):
        part = {}
        for seg in [s for s in ppath.split("/") if s]:
            if "=" in seg:
                k, _, v = seg.partition("=")
                if v != "__HIVE_DEFAULT_PARTITION__":
                    part[k] = v
        entries.append(
            DataFileEntry(
                path=os.path.realpath(bf.path),
                record_count=bf.num_records,
                file_size_bytes=bf.size_bytes or os.path.getsize(bf.path),
                format="PARQUET",
                partition=part,
            )
        )
    t = catalog.create_table(namespace, name, schema).refresh()
    if part_fields:
        from iceberg_metadata_pipeline_spark.catalog.partitioning import PartitionField

        spec_id = t.set_partition_spec(
            [PartitionField(c, "identity", c) for c in part_fields]
        )
        for e in entries:
            if e.partition:
                e.spec_id = spec_id
    t.append_files(entries, dedupe=False)
    return t.refresh()


# ---------------------------------------------------------------------------
# table services: clean + rollback
# ---------------------------------------------------------------------------


def clean_hudi(location: str, retain_slices: int = 1, dry_run: bool = False) -> list[str]:
    """KEEP_LATEST_FILE_VERSIONS cleaning: per LIVE file group, retain
    the newest ``retain_slices`` base files and delete older slices;
    file groups replaced by a completed replacecommit (clustering) have
    ALL their slices deleted — the post-clustering reclaim real Hudi's
    cleaner performs. Records a ``<t>.clean`` instant listing the
    deletions. Never touches files outside the table dir (symlink
    targets survive — only the link goes), and never a live slice."""
    state = read_hudi_table(location)
    live_groups = set(state.files)
    live_paths = {os.path.abspath(bf.path) for bf in state.files.values()}
    by_group: dict[tuple[str, str], list[BaseFile]] = {}
    for ins in completed_instants(location):
        md = read_instant_metadata(location, ins)
        for part, stats in (md.get("partitionToWriteStats") or {}).items():
            for st in stats:
                path = st["path"]
                apath = path if os.path.isabs(path) else os.path.join(location, path)
                by_group.setdefault((part, st["fileId"]), []).append(
                    BaseFile(part, st["fileId"], ins.time, apath, 0, 0)
                )
    doomed: list[str] = []
    for key, slices in by_group.items():
        slices.sort(key=lambda b: b.instant_time)
        if key in live_groups:
            old = slices[:-retain_slices] if retain_slices > 0 else slices[:-1]
        else:
            old = slices  # replaced group: reclaim every slice
        for bf in old:
            p = os.path.abspath(bf.path)
            if p not in live_paths and os.path.lexists(p):
                doomed.append(p)
    if dry_run:
        return doomed
    for p in doomed:
        os.remove(p)
    if doomed:
        t = begin_instant(location, "clean")
        complete_instant(
            location, t, "clean",
            {
                "startCleanTime": t,
                "policy": "KEEP_LATEST_FILE_VERSIONS",
                "retainedFileVersions": retain_slices,
                "deletePathPatterns": [os.path.relpath(p, location) for p in doomed],
                "totalFilesDeleted": len(doomed),
            },
        )
    return doomed


def rollback_hudi(location: str, instant: str) -> list[str]:
    """Undo the LATEST completed commit/replacecommit: delete the base
    files it wrote, remove its timeline files, record ``<t>.rollback``.
    Refuses to roll back a non-latest instant (later slices may stack
    on its file groups — the same guard real Hudi applies)."""
    done = completed_instants(location)
    if not done or done[-1].time != instant:
        raise ValueError(
            f"can only roll back the latest completed instant "
            f"({done[-1].time if done else 'none'}), not {instant}"
        )
    ins = done[-1]
    md = read_instant_metadata(location, ins)
    removed: list[str] = []
    for _part, stats in (md.get("partitionToWriteStats") or {}).items():
        for st in stats:
            p = st["path"]
            apath = p if os.path.isabs(p) else os.path.join(location, p)
            if os.path.lexists(apath):
                os.remove(apath)
                removed.append(apath)
    hoodie = os.path.join(location, _HOODIE)
    for state in ("completed", "inflight", "requested"):
        f = os.path.join(hoodie, _instant_filename(ins.time, ins.action, state))
        if os.path.exists(f):
            os.remove(f)
    t = begin_instant(location, "rollback")
    complete_instant(
        location, t, "rollback",
        {
            "startRollbackTime": t,
            "commitsRollback": [instant],
            "totalFilesDeleted": len(removed),
            "instantsRollback": [{"commitTime": instant, "action": ins.action}],
        },
    )
    return removed
