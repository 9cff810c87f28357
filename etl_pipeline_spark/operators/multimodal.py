"""Multimodal columns — SURVEY.md §2.12 X5 + BASELINE.json.

Images/audio/video are opaque ``binary`` payloads with a typed metadata
struct. The Spark-side plumbing is real and tested: schema, binaryFile
source, Arrow-batched ``mapInPandas`` feature extraction with correct
batch shapes and partitioning. The actual media decode is STUBBED (the
container ships no image/audio libraries): ``decode_stub=True`` computes
deterministic fake features from the bytes; a real deployment swaps
``_extract_features`` for a Pillow/torchaudio implementation with the
SAME signature — nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), True),  # image|audio|video
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("source_uri", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, payload_md5 string, "
    "width int, height int, duration_ms long"
)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Object-store media ingest via the binaryFile source (X5 built-in):
    one row per file with path/length/modificationTime/content."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.abs(F.xxhash64("path")).alias("media_id"),
            F.col("content").alias("payload"),
            F.struct(
                F.lit("image").alias("kind"),
                F.lit("application/octet-stream").alias("mime"),
                F.col("path").alias("source_uri"),
            ).alias("meta"),
        )
    )


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture adapter: treat document text bytes as opaque payloads so the
    multimodal plumbing is exercised on shared test data."""
    from etl_pipeline_spark.catalog import load_tables

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("text/plain").alias("mime"),
            F.concat(F.lit("doc://"), F.col("doc_id")).alias("source_uri"),
        ).alias("meta"),
    )


def _extract_features(payload: bytes | None, kind: str | None) -> dict:
    """STUB decode: deterministic fake features derived from the payload
    bytes. Replace with a real decoder (Pillow / av / torchaudio) keeping
    this exact signature; raise NotImplementedError paths are marked."""
    import hashlib

    if payload is None:
        return {"n_bytes": 0, "payload_md5": None, "width": None, "height": None, "duration_ms": None}
    md5 = hashlib.md5(payload).hexdigest()
    n = len(payload)
    if kind == "image":
        # fake: pretend dimensions derive from content hash (deterministic)
        return {
            "n_bytes": n,
            "payload_md5": md5,
            "width": 64 + int(md5[:2], 16),
            "height": 64 + int(md5[2:4], 16),
            "duration_ms": None,
        }
    if kind in ("audio", "video"):
        return {
            "n_bytes": n,
            "payload_md5": md5,
            "width": None,
            "height": None,
            "duration_ms": n * 8,  # fake: bytes -> "duration"
        }
    raise NotImplementedError(f"decode for kind={kind!r} not implemented")


def extract_media_features(media: DataFrame, batch_limit: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``.

    The per-batch loop is the real shape a decoder runs in at scale:
    payloads stay executor-local (no driver collect), batches are bounded
    via maxRecordsPerBatch so image buffers fit in memory, and the output
    schema is fixed so Catalyst can prune downstream.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _extract_features(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            yield out

    flat = media.select(
        "media_id", F.col("meta.kind").alias("kind"), "payload"
    )
    return flat.mapInPandas(process, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "media_id long, frame_idx int, frame_bytes binary, frame_md5 string, "
    "width int, height int"
)


def _fake_decode_frames(payload: bytes, frame_size: int = 64) -> list[bytes]:
    """STUB video decode: chunk the payload into fixed-size 'frames'.
    Replace with a real demuxer (av/ffmpeg) keeping the signature."""
    if not payload:
        return []
    return [payload[i : i + frame_size] for i in range(0, len(payload), frame_size)]


def _fake_resize(frame: bytes, width: int, height: int) -> bytes:
    """STUB resize: deterministic truncation/padding to width*height//64
    bytes stands in for a pixel resample; a real implementation swaps in
    Pillow's Image.resize with the same signature."""
    target = max(1, width * height // 64)
    return (frame * (target // max(len(frame), 1) + 1))[:target]


def sample_frames(
    media: DataFrame,
    every_kth: int = 4,
    frame_size: int = 64,
    out_width: int = 32,
    out_height: int = 32,
) -> DataFrame:
    """Frame-sampling pipeline over ``mapInPandas``: decode (stub) each
    payload into frames, keep every k-th, resize (stub), and emit one row
    per kept frame with content hashes — the batch shape a real
    video-frame extractor runs in (payloads never leave executors; output
    rows are small and columnar).
    """
    import hashlib

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = _fake_decode_frames(payload, frame_size)
                for idx in range(0, len(frames), every_kth):
                    resized = _fake_resize(frames[idx], out_width, out_height)
                    out_rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": idx,
                            "frame_bytes": resized,
                            "frame_md5": hashlib.md5(resized).hexdigest(),
                            "width": out_width,
                            "height": out_height,
                        }
                    )
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "media_id",
                    "frame_idx",
                    "frame_bytes",
                    "frame_md5",
                    "width",
                    "height",
                ],
            )

    flat = media.select("media_id", "payload")
    return flat.mapInPandas(process, schema=FRAME_SCHEMA)
