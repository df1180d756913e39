"""Multimodal columns (SURVEY.md §2.C): image/audio/video as opaque
``binary`` columns with typed metadata.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes behind the real Spark plumbing (schema, Arrow batch
shape, partitioning) — exactly the seam a real deployment swaps for
PIL/torchaudio/pyav. ``decode_image_stub`` raises NotImplementedError when
``real=True`` to mark the boundary explicitly.

Scale notes: binary payloads ride the normal columnar path (parquet
binary columns chunk fine at 256 MB row groups); decode/feature-extract
is mapInPandas — pure map-side, no shuffle, Arrow-batched so each task
amortizes Python startup over thousands of rows. Frame-sampling style
expansion (1 video row → N frame rows) is an iterator yield inside the
same task, so no skew-prone explode shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries import query, sql_query
from iceberg_metadata_pipeline_spark.session import load_tables

IMAGE_META_SCHEMA = (
    "doc_id long, media_type string, payload binary, width int, height int, "
    "n_channels int, sha string"
)


def to_multimodal(docs: DataFrame) -> DataFrame:
    """Model a multimodal table from the documents fixture: the text bytes
    stand in for an encoded media payload (binary column + typed metadata),
    which is all the engine ever sees of real media."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.col("n_chars").alias("payload_hint"),
    )


def decode_image_stub(payload: bytes, real: bool = False):
    """THE decode seam. A real deployment implements this with PIL/pyav;
    here it derives deterministic pseudo-metadata from the payload bytes.

    >>> decode_image_stub(b"xyz")          # deterministic fake
    >>> decode_image_stub(b"xyz", real=True)
    Traceback (most recent call last):
    NotImplementedError: ...
    """
    if real:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "swap decode_image_stub for a real decoder (PIL/pyav/torchaudio)"
        )
    import hashlib

    digest = hashlib.sha256(payload).digest()
    return {
        "width": 16 + digest[0] % 240,
        "height": 16 + digest[1] % 240,
        "n_channels": 1 + digest[2] % 4,
        "sha": digest.hex()[:16],
    }


def decode_media(df: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow batches in, decoded metadata out — the
    real part is the plumbing (schema, batch iteration, zero shuffle)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            metas = [decode_image_stub(p) for p in pdf["payload"]]
            out = pdf[["doc_id", "media_type", "payload"]].copy()
            out["width"] = [m["width"] for m in metas]
            out["height"] = [m["height"] for m in metas]
            out["n_channels"] = [m["n_channels"] for m in metas]
            out["sha"] = [m["sha"] for m in metas]
            yield out

    return df.mapInPandas(run, IMAGE_META_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling shape: one media row → N frame rows, yielded inside
    the task (no explode shuffle). Frames here are byte-window digests."""
    import hashlib

    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for fi, off in enumerate(range(0, len(payload), every_n_bytes)):
                    window = bytes(payload[off : off + every_n_bytes])
                    rows.append(
                        (doc_id, fi, len(window), hashlib.sha256(window).hexdigest()[:12])
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame_sha"]
            )

    return df.mapInPandas(run, "doc_id long, frame_idx int, frame_bytes int, frame_sha string")


def resize_media(
    df: DataFrame, max_w: int = 128, max_h: int = 128
) -> DataFrame:
    """Resize stage over decoded metadata: aspect-preserving fit into a
    (max_w, max_h) box. The geometry is real (it is what a PIL thumbnail
    call computes); producing resized pixel buffers is behind the same
    decode seam as decode_image_stub. Runs as pure JVM expressions — a
    resize *plan* is metadata math; only the pixel kernel needs Python."""
    scale = F.least(
        F.lit(float(max_w)) / F.col("width"),
        F.lit(float(max_h)) / F.col("height"),
        F.lit(1.0),
    )
    return df.withColumn("out_w", F.greatest(F.floor(F.col("width") * scale), F.lit(1))).withColumn(
        "out_h", F.greatest(F.floor(F.col("height") * scale), F.lit(1))
    )


sql_query(
    "multimodal_binary_plumbing",
    # binary columns through the JVM expression path: encode→binary,
    # digest, length, hex slicing — proves binary is a first-class column
    """
SELECT doc_id,
       octet_length(encode(text, 'UTF-8')) AS payload_bytes,
       md5(encode(text, 'UTF-8')) AS payload_md5,
       substr(hex(encode(substr(text, 1, 8), 'UTF-8')), 1, 16) AS head_hex,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS media_type
FROM documents
ORDER BY doc_id
""",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS payload_bytes,
       md5(CAST(encode(text) AS VARCHAR)) AS payload_md5,
       substr(upper(hex(encode(substr(text, 1, 8)))), 1, 16) AS head_hex,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS media_type
FROM documents
ORDER BY doc_id
""",
)


@query("multimodal_decode_pipeline", None)  # python-kernel path → rows-only
def multimodal_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → multimodal table → mapInPandas decode → per-type stats.
    Deterministic (payload-derived fake metadata); schema/batching real."""
    docs = load_tables(spark, sf_dir)["documents"]
    decoded = decode_media(to_multimodal(docs))
    return (
        decoded.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("width").alias("total_width"),
            F.sum("n_channels").alias("total_channels"),
            F.min("sha").alias("min_sha"),
        )
        .orderBy("media_type")
    )


@query("multimodal_frame_sample", None)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out inside the task; stable counts per media."""
    docs = load_tables(spark, sf_dir)["documents"]
    frames = sample_frames(to_multimodal(docs))
    return (
        frames.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_frames"), F.max("frame_idx").alias("last_idx"))
        .orderBy("doc_id")
    )


@query("multimodal_resize_pipeline", None)
def multimodal_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode → resize(fit 128×128) → per-type geometry stats; asserts the
    aspect-preserving fit shape end-to-end."""
    docs = load_tables(spark, sf_dir)["documents"]
    resized = resize_media(decode_media(to_multimodal(docs)))
    return (
        resized.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("out_w").alias("max_w"),
            F.max("out_h").alias("max_h"),
            F.sum("out_w").alias("total_w"),
        )
        .orderBy("media_type")
    )


# Binary-column digests computed entirely JVM-side (no Python kernel):
# the blob bookkeeping every multimodal table needs — sizes, integrity
# hashes, wire encoding — stays in codegen even when decode can't.
# Oracle-checked: DuckDB computes the same digests over the same
# synthesized payload bytes.
sql_query(
    "multimodal_binary_digest",
    """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS media_type,
       length(encode(text, 'UTF-8')) AS payload_bytes,
       md5(encode(text, 'UTF-8')) AS payload_md5,
       substr(base64(encode(text, 'UTF-8')), 1, 16) AS b64_prefix
FROM documents
ORDER BY doc_id
""",
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS media_type,
       octet_length(encode(text)) AS payload_bytes,
       md5(text) AS payload_md5,
       substr(to_base64(encode(text)), 1, 16) AS b64_prefix
FROM documents
ORDER BY doc_id
""",
)
