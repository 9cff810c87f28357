"""Multimodal-column queries — SURVEY.md §2.12 X5.

The feature-extraction path runs through an Arrow-batched ``mapInPandas``
(operators/multimodal.py) yet is still oracle-checked: the stub decoder's
features are deterministic functions of the payload bytes (md5-derived),
so DuckDB can reproduce them in SQL. This validates the UDF plumbing
itself — batch shapes, schema, null handling — not just built-in exprs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.multimodal import (
    documents_as_media,
    extract_media_features,
    sample_frames,
)
from etl_pipeline_spark.queries.base import query

_HEXVAL = "(INSTR('0123456789abcdef', SUBSTR(md5(text), {pos}, 1)) - 1)"


@query(
    "q_multimodal_binary_meta",
    oracle="""
    SELECT doc_id AS media_id,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes,
           MD5(text)                  AS payload_md5,
           TRUE                       AS payload_readable
    FROM documents
    """,
    tags=("multimodal", "X5"),
)
def q_multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: text -> binary payload, byte length + md5
    (bit-identical across engines). The binaryFile directory source is
    covered by pytest (no fixture media dir in the shared tables)."""
    media = documents_as_media(spark, sf_dir)
    return media.select(
        "media_id",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.lit(True).alias("payload_readable"),
    )


@query(
    "q_multimodal_features",
    oracle=f"""
    SELECT doc_id AS media_id,
           'image'                    AS kind,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes,
           MD5(text)                  AS payload_md5,
           64 + {_HEXVAL.format(pos=1)} * 16 + {_HEXVAL.format(pos=2)} AS width,
           64 + {_HEXVAL.format(pos=3)} * 16 + {_HEXVAL.format(pos=4)} AS height,
           CAST(NULL AS BIGINT)       AS duration_ms
    FROM documents
    """,
    tags=("multimodal", "X5", "pandas-udf"),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction (stub decoder) whose
    deterministic output the SQL oracle reproduces — checks the whole
    Pandas-UDF path end to end."""
    return extract_media_features(documents_as_media(spark, sf_dir))


@query(
    "q_multimodal_frame_sample",
    # The stub decode/resize is pure byte arithmetic on the (all-ASCII)
    # payload, so the oracle replays it in SQL: 64-byte frames, keep every
    # 4th, "resize" = repeat-then-truncate to 32*32//64 = 16 bytes, md5
    # the result. This hash-checks the whole mapInPandas frame pipeline —
    # chunking, stride, per-frame transform, output schema.
    oracle="""
    WITH frames AS (
        SELECT doc_id AS media_id,
               CAST((i - 1) / 64 AS INTEGER) AS frame_idx,
               SUBSTR(text, i, 64) AS frame
        FROM documents, UNNEST(GENERATE_SERIES(1, LEN(text), 64)) AS t(i)
    ),
    kept AS (SELECT * FROM frames WHERE frame_idx % 4 = 0),
    resized AS (
        SELECT media_id, frame_idx,
               SUBSTR(REPEAT(frame,
                      CAST(FLOOR(16.0 / GREATEST(LENGTH(frame), 1)) AS INTEGER) + 1),
                      1, 16) AS rz
        FROM kept
    )
    SELECT media_id, frame_idx, MD5(rz) AS frame_md5,
           CAST(32 AS INTEGER) AS width, CAST(32 AS INTEGER) AS height
    FROM resized
    """,
    tags=("multimodal", "X5", "pandas-udf", "frames"),
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the mapInPandas pipeline (stub video decode
    + stub resize): one row per kept frame with its content hash. Swap the
    two stubs for av/Pillow and the plan, batching, and schema stay
    identical — that plumbing is what this query hash-verifies."""
    frames = sample_frames(
        documents_as_media(spark, sf_dir),
        every_kth=4,
        frame_size=64,
        out_width=32,
        out_height=32,
    )
    return frames.select("media_id", "frame_idx", "frame_md5", "width", "height")
