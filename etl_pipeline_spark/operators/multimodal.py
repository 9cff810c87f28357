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
