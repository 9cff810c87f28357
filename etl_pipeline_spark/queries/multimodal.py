"""Multimodal-column queries — SURVEY.md §2.12 X5.

The feature-extraction path runs through an Arrow-batched ``mapInPandas``
(operators/multimodal.py) with REAL decoders (PPM / 24-bit BMP / PCM WAV
/ concatenated-PPM video — operators/media_codecs.py) yet is still
oracle-checked byte-exactly: payloads are synthesized deterministically
from document text (md5-derived pixel/sample patterns, dimensions from
doc_id), so DuckDB can reproduce the decoded statistics analytically —
including the md5 of the full decoded RGB array, which catches any
de-padding, row-order, or channel-order mistake in the decoder. This
validates the decode + UDF plumbing end to end, not just built-in exprs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.multimodal import (
    documents_as_media,
    extract_media_features,
    sample_frames,
    synthesize_media,
    synthesize_video,
)
from etl_pipeline_spark.queries.base import query


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
    # The oracle replays the deterministic synthesis (operators/
    # multimodal.py keeps the parameters in sync): format = doc_id%3,
    # images are 16 x (8+2*(doc_id%8)) with the 32 md5-hex ASCII bytes
    # tiled (h even => w*h*3 is an exact multiple of 32, so the decoded
    # RGB array is literally repeat(md5_hex, 3*h/2) and its md5 is
    # computable in SQL), audio is 800*(1+doc_id%5) samples at 8 kHz with
    # the same 32 codes tiled. content_sum is the exact integer sum of
    # decoded pixel bytes / sample values — any decode defect (padding,
    # BGR, bottom-up, chunk walk) changes it.
    oracle="""
    WITH m AS (
        SELECT doc_id,
               md5(text) AS hx,
               doc_id % 3 AS fmt,
               8 + 2 * (doc_id % 8) AS h,
               800 * (1 + doc_id % 5) AS n_samp,
               list_aggregate(list_transform(split(md5(text), ''), x -> unicode(x)), 'sum') AS tile_sum
        FROM documents
    )
    SELECT doc_id AS media_id,
           CASE WHEN fmt = 2 THEN 'audio' ELSE 'image' END AS kind,
           -- NULL text -> NULL payload (missing media): the Spark side
           -- emits the null-feature row (n_bytes 0, rest NULL)
           CASE WHEN hx IS NULL THEN NULL
                ELSE CASE fmt WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp' ELSE 'wav' END
           END AS format,
           CAST(CASE WHEN hx IS NULL THEN 0
                     WHEN fmt = 0 THEN 11 + LENGTH(CAST(h AS VARCHAR)) + 48 * h
                     WHEN fmt = 1 THEN 54 + 48 * h
                     ELSE 44 + 2 * n_samp END AS BIGINT) AS n_bytes,
           CAST(CASE WHEN hx IS NULL OR fmt = 2 THEN NULL ELSE 16 END AS INTEGER) AS width,
           CAST(CASE WHEN hx IS NULL OR fmt = 2 THEN NULL ELSE h END AS INTEGER) AS height,
           CAST(CASE WHEN hx IS NOT NULL AND fmt = 2 THEN n_samp // 8 ELSE NULL END AS BIGINT) AS duration_ms,
           CAST(tile_sum * (CASE WHEN fmt = 2 THEN n_samp ELSE 48 * h END) // 32 AS BIGINT) AS content_sum,
           CASE WHEN fmt = 2 THEN NULL ELSE md5(repeat(hx, (3 * h) // 2)) END AS content_md5
    FROM m
    """,
    tags=("multimodal", "X5", "pandas-udf", "real-decode"),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction with REAL decoders:
    synthesized PPM/BMP/WAV payloads are header-parsed and fully decoded
    (numpy/struct), and the oracle reproduces dimensions, duration, the
    exact content sum, and the md5 of the decoded RGB array."""
    return extract_media_features(synthesize_media(spark, sf_dir))


@query(
    "q_multimodal_frame_sample",
    # Synthesized video = (2 + doc_id%5) concatenated P6 frames of 8x4
    # constant-valued pixels (frame j's value = md5-hex byte j%32). The
    # REAL pipeline walks the stream parsing each PPM header, keeps every
    # 2nd frame, nearest-neighbor-resizes to 4x2, and hashes the resized
    # RGB bytes. Constant frames make the resized array repeat(ch, 24),
    # so the oracle reproduces the md5 and pixel sum exactly — verifying
    # stream walking, stride, resize output shape, and hashing.
    oracle="""
    WITH m AS (SELECT doc_id, md5(text) AS hx, 2 + doc_id % 5 AS nf FROM documents
               WHERE text IS NOT NULL),
    f AS (SELECT doc_id, hx, UNNEST(generate_series(0, nf - 1)) AS frame_idx FROM m)
    SELECT doc_id AS media_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           md5(repeat(substr(hx, CAST(frame_idx % 32 AS INTEGER) + 1, 1), 24)) AS frame_md5,
           CAST(4 AS INTEGER) AS width,
           CAST(2 AS INTEGER) AS height,
           CAST(unicode(substr(hx, CAST(frame_idx % 32 AS INTEGER) + 1, 1)) * 24 AS BIGINT) AS pixel_sum
    FROM f
    WHERE frame_idx % 2 = 0
    """,
    tags=("multimodal", "X5", "pandas-udf", "frames", "real-decode"),
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the mapInPandas pipeline with REAL decode
    (concatenated-PPM stream walk) and REAL nearest-neighbor resize: one
    row per kept frame with its content hash and pixel sum."""
    frames = sample_frames(
        synthesize_video(spark, sf_dir),
        every_kth=2,
        out_width=4,
        out_height=2,
    )
    return frames.select(
        "media_id", "frame_idx", "frame_md5", "width", "height", "pixel_sum"
    )


@query(
    "q_multimodal_avi_frames",
    # Same frame CONTENT as q_multimodal_frame_sample — constant-valued
    # 8x4 frames, frame j's value = md5-hex byte j%32 — but packed as
    # MJPEG-in-AVI: every frame is a real baseline JPEG inside a real
    # RIFF container (operators/avi_codec.py). Constant gray frames
    # round-trip the JPEG codec EXACTLY (constant block -> DC-only
    # spectrum, quantization exact; Cb=Cr=128 -> zero chroma; verified
    # over every byte value in tests), so the SAME analytic oracle
    # checks the full container walk + entropy decode + resize + hash
    # pipeline byte-for-byte.
    oracle="""
    WITH m AS (SELECT doc_id, md5(text) AS hx, 2 + doc_id % 5 AS nf FROM documents
               WHERE text IS NOT NULL),
    f AS (SELECT doc_id, hx, UNNEST(generate_series(0, nf - 1)) AS frame_idx FROM m)
    SELECT doc_id AS media_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           md5(repeat(substr(hx, CAST(frame_idx % 32 AS INTEGER) + 1, 1), 24)) AS frame_md5,
           CAST(4 AS INTEGER) AS width,
           CAST(2 AS INTEGER) AS height,
           CAST(unicode(substr(hx, CAST(frame_idx % 32 AS INTEGER) + 1, 1)) * 24 AS BIGINT) AS pixel_sum
    FROM f
    WHERE frame_idx % 2 = 0
    """,
    tags=("multimodal", "X5", "pandas-udf", "frames", "real-decode", "container"),
)
def q_multimodal_avi_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling from MJPEG-in-AVI containers (r10 — closes the
    AVI half of the X5 video-container guard): real RIFF chunk walk,
    real T.81 JPEG decode per frame, every-2nd-frame sampling, real
    nearest-neighbor resize — same mapInPandas pipeline as
    q_multimodal_frame_sample, dispatched on the container magic.

    Scale: identical posture to the PPM-stream path — payloads never
    leave executors, decode is Arrow-batched, output rows are small and
    columnar. MP4/ISO-BMFF and non-MJPG codecs remain guarded (they
    need entropy decoders with no operator semantics of their own)."""
    from etl_pipeline_spark.operators.multimodal import synthesize_video_avi

    frames = sample_frames(
        synthesize_video_avi(spark, sf_dir),
        every_kth=2,
        out_width=4,
        out_height=2,
    )
    return frames.select(
        "media_id", "frame_idx", "frame_md5", "width", "height", "pixel_sum"
    )


@query(
    "q_multimodal_mp4_frames",
    # Identical analytic oracle to q_multimodal_avi_frames: same
    # constant-valued frame CONTENT (frame j's value = md5-hex byte
    # j%32, exact through the JPEG round trip), different CONTAINER —
    # MJPEG-in-MP4 (ISO BMFF), so a correct answer requires the real
    # box walk, the stsc/stco/stsz sample-table resolution, and the
    # per-sample T.81 decode to all be byte-exact (r13, closing the MP4
    # half of the X5 container guard the way r10 closed the AVI half).
    oracle="""
    WITH m AS (SELECT doc_id, md5(text) AS hx, 2 + doc_id % 5 AS nf FROM documents
               WHERE text IS NOT NULL),
    f AS (SELECT doc_id, hx, UNNEST(generate_series(0, nf - 1)) AS frame_idx FROM m)
    SELECT doc_id AS media_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           md5(repeat(substr(hx, CAST(frame_idx % 32 AS INTEGER) + 1, 1), 24)) AS frame_md5,
           CAST(4 AS INTEGER) AS width,
           CAST(2 AS INTEGER) AS height,
           CAST(unicode(substr(hx, CAST(frame_idx % 32 AS INTEGER) + 1, 1)) * 24 AS BIGINT) AS pixel_sum
    FROM f
    WHERE frame_idx % 2 = 0
    """,
    tags=("multimodal", "X5", "pandas-udf", "frames", "real-decode", "container"),
)
def q_multimodal_mp4_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling from MJPEG-in-MP4 (ISO BMFF) containers — the r13
    closure of the MP4 half of the X5 video-container guard: real box
    walk, real sample-table arithmetic (stsc/stco/stsz), real T.81 JPEG
    decode per sample, every-2nd-frame sampling, real nearest-neighbor
    resize — the same mapInPandas pipeline as the AVI and PPM-stream
    paths, dispatched on the ftyp magic.

    Scale: identical posture to the AVI path — payloads never leave
    executors, decode is Arrow-batched, output rows are small and
    columnar. Entropy codecs (avc1/hev1/mp4v) and fragmented MP4 remain
    guarded with named errors (operators/mp4_codec.py): they need
    entropy decoders with no operator semantics of their own; a
    deployment plugs a codec library into this exact seam."""
    from etl_pipeline_spark.operators.multimodal import synthesize_video_mp4

    frames = sample_frames(
        synthesize_video_mp4(spark, sf_dir),
        every_kth=2,
        out_width=4,
        out_height=2,
    )
    return frames.select(
        "media_id", "frame_idx", "frame_md5", "width", "height", "pixel_sum"
    )


SHOT_CUT_MILLI = 16_000  # |mean delta| >= 16 intensity units flags a cut


@query(
    "q_multimodal_shot_cuts",
    # Synthesized video frames are constant-valued (frame j's pixels all
    # equal the ASCII code of md5-hex char j%32), so the REAL decoded
    # per-frame mean is exactly 1000*v milli-units and the oracle can
    # replay the cut decision analytically. The Spark side runs the full
    # pipeline: stream decode -> per-frame intensity (mapInPandas) ->
    # lag window -> threshold.
    oracle=f"""
    WITH m AS (SELECT doc_id, md5(text) AS hx, 2 + doc_id % 5 AS nf FROM documents
               WHERE text IS NOT NULL),
    f AS (SELECT doc_id, hx, UNNEST(generate_series(0, nf - 1)) AS j FROM m),
    v AS (
        SELECT doc_id, j,
               CAST(unicode(substr(hx, CAST(j % 32 AS INTEGER) + 1, 1)) AS BIGINT) * 1000
                   AS mean_milli
        FROM f
    ),
    d AS (
        SELECT doc_id, j, mean_milli,
               LAG(mean_milli) OVER (PARTITION BY doc_id ORDER BY j) AS prev_milli
        FROM v
    )
    SELECT doc_id AS media_id,
           CAST(j AS INTEGER) AS frame_idx,
           prev_milli,
           mean_milli,
           ABS(mean_milli - prev_milli) AS delta_milli
    FROM d
    WHERE prev_milli IS NOT NULL AND ABS(mean_milli - prev_milli) >= {SHOT_CUT_MILLI}
    """,
    tags=("multimodal", "X5", "pandas-udf", "shot-boundary", "real-decode"),
)
def q_multimodal_shot_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over REAL decoded video streams: per-frame
    mean intensity from the mapInPandas decode pipeline
    (operators/multimodal.py frame_intensity_stats), then a
    media-partitioned lag window flags frames whose mean jumps by >= 16
    intensity units — the standard scene-cut heuristic video sampling
    pipelines use to pick representative frames.

    Scale: decode is executor-local (payloads never shuffle); the cut
    logic is one window shuffle keyed by media_id. The per-frame signal
    is integer milli-units, so the report is engine-exact.
    """
    from pyspark.sql import Window

    from etl_pipeline_spark.operators.multimodal import (
        frame_intensity_stats,
        synthesize_video,
    )

    stats = frame_intensity_stats(synthesize_video(spark, sf_dir))
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    d = stats.withColumn("prev_milli", F.lag("mean_milli").over(w))
    return (
        d.filter(
            F.col("prev_milli").isNotNull()
            & (F.abs(F.col("mean_milli") - F.col("prev_milli")) >= SHOT_CUT_MILLI)
        )
        .select(
            "media_id",
            "frame_idx",
            "prev_milli",
            "mean_milli",
            F.abs(F.col("mean_milli") - F.col("prev_milli")).alias("delta_milli"),
        )
    )


@query(
    "q_multimodal_audio_energy",
    # Synthesized audio tiles the 32 md5-hex ASCII codes, so a
    # 400-sample window holds 12 full tiles plus a 16-sample half whose
    # side alternates with window parity (400*w mod 32 = 16*w mod 32):
    # sum(w) = 12*S + (H1 if w even else H2), squared sums likewise —
    # the oracle reproduces the REAL decoded window statistics from the
    # digest alone, verifying decode, windowing, and the energy fold.
    oracle="""
    WITH a AS (
        SELECT doc_id, md5(text) AS hx, 2 * (1 + doc_id % 5) AS n_windows
        FROM documents WHERE doc_id % 3 = 2 AND text IS NOT NULL
    ),
    ch AS (
        SELECT doc_id, hx, n_windows,
               CAST(SUM(unicode(SUBSTR(hx, g, 1))) AS BIGINT) AS s_all,
               CAST(SUM(CASE WHEN g <= 16
                    THEN unicode(SUBSTR(hx, g, 1)) ELSE 0 END) AS BIGINT) AS h1,
               CAST(SUM(unicode(SUBSTR(hx, g, 1))
                        * unicode(SUBSTR(hx, g, 1))) AS BIGINT) AS q_all,
               CAST(SUM(CASE WHEN g <= 16
                    THEN unicode(SUBSTR(hx, g, 1)) * unicode(SUBSTR(hx, g, 1))
                    ELSE 0 END) AS BIGINT) AS q1
        FROM a, UNNEST(GENERATE_SERIES(1, 32)) t(g)
        GROUP BY doc_id, hx, n_windows
    ),
    w AS (
        SELECT doc_id, UNNEST(GENERATE_SERIES(0, n_windows - 1)) AS widx,
               s_all, h1, q_all, q1
        FROM ch
    )
    SELECT doc_id AS media_id,
           CAST(widx AS INTEGER) AS window_idx,
           CAST(400 AS BIGINT) AS n_samples,
           12 * s_all + CASE WHEN widx % 2 = 0 THEN h1 ELSE s_all - h1 END
               AS sum_vals,
           12 * q_all + CASE WHEN widx % 2 = 0 THEN q1 ELSE q_all - q1 END
               AS sum_sqs
    FROM w
    """,
    tags=("multimodal", "X5", "pandas-udf", "audio", "real-decode"),
)
def q_multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio energy over REAL PCM-16 WAV decode: every audio
    payload splits into 400-sample (50 ms) windows with exact integer
    sample sums and energies — the VAD/loudness frontend
    (operators/multimodal.py audio_window_stats), value-hash-verified
    window by window against the analytic synthesis.

    Scale: decode and windowing are executor-local mapInPandas; the
    output is 5 integers per window, and every downstream threshold
    (silence gates, loudness normalization) is Column arithmetic.
    """
    from etl_pipeline_spark.operators.multimodal import (
        audio_window_stats,
        synthesize_media,
    )

    return audio_window_stats(synthesize_media(spark, sf_dir)).select(
        "media_id", "window_idx", "n_samples", "sum_vals", "sum_sqs"
    )
