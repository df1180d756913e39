"""Structured Streaming over the events model (SURVEY.md §7.5).

The reference is batch-only (a Thrift server); the north-star events
table demands streams. Shapes provided:

- file-source stream of the events fixture (parquet dir → readStream)
- tumbling-window aggregation with a watermark (late-data bound)
- stateful dedup (dropDuplicates[WithinWatermark])
- custom stateful operator via applyInPandasWithState (running per-user
  counters — the applyInPandasWithState surface from the brief)
- exactly-once-style sink via foreachBatch into a warehouse Table
  (idempotent by epoch: the batch id is recorded as a snapshot property)
- streaming UPSERT sink (foreachBatch + merge-on-read MERGE: latest
  version per key, old copies equality-deleted in the same commit)

Scale notes: a streaming job at 100 TB/day is the same shuffle graph as
the batch shapes plus state stores; watermarks bound state size; the
foreachBatch sink commits one snapshot per epoch so replays are
detectable by epoch id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events fixture (one-file-per-trigger so a
    test drives deterministic micro-batches), ts normalized to timestamp.

    The stream schema is inferred from a batch read of the same files
    (readStream requires an explicit schema; one driver-side footer read).
    The fixture's ts physical type has varied across generations —
    TIMESTAMP(NANOS), which nanosAsLong surfaces as an epoch-nanos long,
    vs plain TIMESTAMP(MICROS) — so normalize conditionally, same rule as
    session.load_tables()."""
    batch = spark.read.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    raw = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf_dir)
    )
    if isinstance(raw.schema["ts"].dataType, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(raw.schema["ts"].dataType, T.TimestampNTZType):
        # watermarks require TIMESTAMP (LTZ); the session TZ is pinned UTC
        # so the cast preserves the instant
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Tumbling 1 h window with watermark: state for windows older than the
    watermark is dropped, bounding memory on an unbounded stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Stateful streaming dedup on (user_id, event_type); the watermark
    bounds how long each key is remembered."""
    return events.withWatermark("ts", watermark).dropDuplicates(
        ["user_id", "event_type"]
    )


RUNNING_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running per-user
    event count/value-total maintained in the state store across
    micro-batches."""
    import pandas as pd

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update, RUNNING_SCHEMA, STATE_SCHEMA, "update", "NoTimeout"
        )
    )


def stream_to_table(stream_df: DataFrame, table, checkpoint_dir: str):
    """foreachBatch sink into a warehouse Table: one snapshot per epoch,
    epoch id stored so a replayed batch is detectable (exactly-once at the
    table level, matching Iceberg's streaming-commit pattern)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        committed = table.properties.get("last_committed_epoch")
        if committed is not None and int(committed) >= epoch_id:
            return  # replay of an already-committed epoch
        # Record the epoch BEFORE the append so it persists in the SAME
        # snapshot commit as the data: setting it after would leave the
        # on-disk property one epoch behind until the next commit, and a
        # crash in that window makes the replayed batch append twice.
        table.properties["last_committed_epoch"] = str(epoch_id)
        table.append_dataframe(batch_df)

    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )


def dedup_stream_within_watermark(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """dropDuplicatesWithinWatermark: unlike dropDuplicates (which keys
    state forever per value-combo until the watermark passes its event
    time), this guarantees dedup only among events whose times fall within
    the watermark delta of each other — the state for a key is dropped as
    soon as the watermark passes it, which is the right contract for
    at-least-once sources that only ever duplicate within a bounded
    replay horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def session_window_stream(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming session windows: sessions close when the watermark passes
    last-event-time + gap; state per (user, open session) only. Matches the
    batch stream_session_window query shape (same gap) so streaming output
    can be checked against the batch/DuckDB answer."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("last_ts"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "last_ts",
        )
    )


def clicks_views_stream_join(
    clicks: DataFrame,
    views: DataFrame,
    watermark: str = "10 minutes",
    horizon_minutes: int = 60,
) -> DataFrame:
    """Stream-stream inner join: each click joins views of the same user
    within the preceding ``horizon_minutes``. Both sides carry watermarks
    and the join condition bounds event-time distance — together they let
    Spark expire buffered state (a stream-stream join without both buffers
    forever). State ≈ horizon × per-user view rate, independent of stream
    length."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    ).withWatermark("view_ts", watermark)
    cond = F.expr(
        f"""c_user = v_user AND view_ts <= click_ts
            AND view_ts >= click_ts - INTERVAL {horizon_minutes} MINUTES"""
    )
    return c.join(v, cond, "inner").select(
        "click_id", F.col("c_user").alias("user_id"), "click_ts", "view_id", "view_ts", "view_value"
    )


def make_user_stats_processor():
    """The StatefulProcessor behind :func:`user_value_stats_tws`, built
    lazily so the module imports without pandas/pyspark-streaming extras.
    Module-level (vs a closure) so tests can drive the PROTOCOL directly —
    init(handle) → handleInputRows(key, batches, timers) → close — against
    a fake ValueState, which is exactly the contract the state server
    exercises at runtime. That keeps the operator's semantics proven in
    environments lacking protobuf (where the real state server can't run)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState(
                "stats", "n BIGINT, total DOUBLE, mx DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._stats.exists():
                n, total, mx = self._stats.get()
            else:
                n, total, mx = 0, 0.0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                mx = max(mx, float(pdf["value"].max()))
            self._stats.update((n, total, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    return UserStats()


def user_value_stats_tws(events: DataFrame) -> DataFrame:
    """Custom stateful operator on the NEW transformWithStateInPandas API
    (Spark 4's successor to applyInPandasWithState): typed per-key state
    handles (ValueState here) instead of one opaque GroupState blob, plus
    timers and multiple state variables when needed. Keeps a running
    (count, sum, max) per user and emits the updated stats every
    micro-batch.

    Environment gate: the API's state-server protocol needs the protobuf
    package at runtime (pyspark/sql/streaming/proto). This container
    lacks it, so the test suite exercises this operator only when
    protobuf imports (pytest.importorskip); applyInPandasWithState
    (``running_user_totals``) is the always-runnable equivalent.

    Scale notes: state lives in the per-partition state store (RocksDB
    provider — required by this API and the right choice at scale: state
    spills to disk instead of executor heap); the shuffle is the same
    groupBy-key exchange as any stateful agg. Arrow-batched like all
    pandas paths."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_user_stats_processor(),
        outputStructType="user_id BIGINT, n_events BIGINT, total_value DOUBLE, max_value DOUBLE",
        outputMode="Update",
        timeMode="None",
    )


def stream_upsert_to_table(
    stream_df: DataFrame,
    table,
    keys: list[str] | None = None,
    checkpoint_dir: str | None = None,
    order_by: str | None = None,
):
    """Streaming UPSERT sink: each micro-batch MERGEs into the warehouse
    table on ``keys`` via the merge-on-read path — matched keys get their
    old copies equality-deleted and the new versions appended in ONE
    commit, so the table always holds the latest version per key (the
    Iceberg streaming-upsert pattern; a CDC consumer's natural sink).

    Epoch idempotence mirrors stream_to_table: the epoch id is recorded
    in the same commit as the data, so a replayed batch after a crash is
    detected and skipped — per-key exactly-once at the table level.

    Scale notes: per-epoch cost is O(batch) — the equality-delete file
    carries the batch's keys, untouched files are never rewritten — plus
    the scan-side broadcast anti-join until compaction folds deletes in.

    Within-batch dedup keeps ONE row per key: the greatest ``order_by``
    value when given (pass the CDC sequence/arrival column — the only
    deterministic contract), else best-effort arrival order via
    monotonically_increasing_id (preserves per-partition source order;
    dropDuplicates would keep an ARBITRARY row and could commit a stale
    version of a key).

    ``keys=None`` falls back to the table's declared identifier fields
    (SET IDENTIFIER FIELDS) — the CDC-sink contract where row identity
    is a property of the TABLE, not of each caller."""
    from pyspark.sql import functions as F  # noqa: F811
    from pyspark.sql.window import Window

    keys = table._default_keys(keys)
    if checkpoint_dir is None:
        raise ValueError("stream_upsert_to_table requires checkpoint_dir")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # replay check against DISK state, not the in-memory handle: a
        # failed merge leaves the in-memory marker dangling, and an
        # in-process retry of the same epoch would be wrongly skipped
        table.refresh()
        committed = table.properties.get("last_committed_epoch")
        if committed is not None and int(committed) >= epoch_id:
            return
        # recorded in the same metadata write as the merge commit: crash
        # before commit → no marker, replay runs; crash after → skipped
        table.properties["last_committed_epoch"] = str(epoch_id)
        order = (
            F.col(order_by) if order_by is not None else F.monotonically_increasing_id()
        )
        w = Window.partitionBy(*keys).orderBy(F.desc(order))
        deduped = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .where("__rn = 1")
            .drop("__rn")
        )
        table.merge_into_mor(deduped, on=keys)

    return (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )
