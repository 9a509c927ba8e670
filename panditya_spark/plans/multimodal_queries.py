"""Multimodal-column queries (spec extension; absent from the
reference — see operators/multimodal.py for the design note).

The driver's testdata has no binary media table, so the media payloads
are derived deterministically from `documents.text` (UTF-8 bytes as the
opaque BINARY payload). That makes the whole decode→featurize path —
mapInPandas over Arrow batches with a BINARY column — oracle-checkable:
the deterministic fake codec is plain md5 arithmetic DuckDB can
replicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from panditya_spark.operators import multimodal as M
from panditya_spark.plans.registry import register
from panditya_spark.sources.loaders import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from panditya_spark.session import ensure_session_defaults

    ensure_session_defaults(spark)
    return load_table(spark, sf_dir, name)


def _media(
    spark: SparkSession, sf_dir: str, spread_for_decode: bool = False
) -> DataFrame:
    """documents projected into the opaque-media shape: BINARY payload
    plus string id. Payload bytes == UTF-8 of text, so the oracle can
    recompute every derived value from the text column.

    spread_for_decode: mapInPandas parallelism equals upstream partition
    count, so a single-file media table decodes on one core unless
    round-robin spread first — but the spread shuffles the PAYLOAD
    bytes, so it only pays when decode CPU outweighs the bytes moved.
    With the stubbed (near-free) codec it never does (measured at
    sf0.1: 3.0s → 7.8s regression, VERDICT r2 #4), so the default is
    False; a real PIL/libvips decode at ~10ms+/image flips the ratio,
    and that deployment passes True. At 100 TB the input arrives in
    thousands of scan splits and spread_small_input is a no-op either
    way — this knob only matters for small single-split inputs."""
    from panditya_spark.operators.relational import spread_small_input

    docs = _t(spark, sf_dir, "documents")
    # Project BEFORE any spread so only (id, payload) ever moves.
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
    )
    if spread_for_decode:
        media = spread_small_input(media)
    return media


# ---------------------------------------------------------------- decode+featurize
# Extension op: image decode + feature extraction via mapInPandas
# (operators/multimodal.py image_features). The deterministic fake
# codec derives (width, height) from the first 4 md5 digest bytes, so
# DuckDB replays it as hex-substring arithmetic.
@register(
    "mm_image_features",
    oracle="""
    WITH h AS (
      SELECT CAST(doc_id AS VARCHAR) AS media_id,
             octet_length(encode(text)) AS n_bytes,
             CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS hv
      FROM documents
    )
    SELECT media_id,
           CAST(n_bytes AS INTEGER) AS n_bytes,
           CAST(16 + hv % 1024 AS INTEGER) AS width,
           CAST(16 + (hv // 1024) % 1024 AS INTEGER) AS height
    FROM h
    """,
)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = M.image_features(_media(spark, sf_dir))
    return feats.select("media_id", "n_bytes", "width", "height")


# ---------------------------------------------------------------- embedding path
@register("mm_image_embedding")
def mm_image_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Featurize path incl. the array<float> embedding column (byte
    histogram). Rows-only: float-array hashing is engine-dependent;
    tests/test_multimodal.py asserts the values."""
    feats = M.image_features(_media(spark, sf_dir))
    return feats.select("media_id", "embedding")


# ---------------------------------------------------------------- frame sampling
# Extension op: video frame-sample plan — pure JVM-side explode over a
# frame-index sequence (operators/multimodal.py frame_sample); the
# codec-backed extraction would join payloads downstream.
@register(
    "mm_frame_sample",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           CAST(unnest(range(0, greatest(n_chars - 1, 0) + 1, 10)) AS INTEGER)
             AS frame_idx
    FROM documents
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.col("n_chars").cast("int").alias("n_frames"),
    )
    return M.frame_sample(media, every_n=10)


# ---------------------------------------------------------------- audio path
# Extension op: audio decode + feature extraction via mapInPandas
# (operators/multimodal.py audio_features). The deterministic fake
# codec reads payload bytes as int16@16kHz PCM, so the INTEGER features
# are pure byte-length arithmetic DuckDB replays; the float features
# (rms, zero_crossings) exercise the decoded sample vector and are
# pinned by tests/test_functions.py::test_audio_features against a
# NumPy reference.
@register(
    "mm_audio_features",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           CAST(octet_length(encode(text)) // 2 AS INTEGER) AS n_samples,
           CAST((octet_length(encode(text)) // 2) * 1000 // 16000 AS INTEGER)
             AS duration_ms
    FROM documents
    """,
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = M.audio_features(_media(spark, sf_dir))
    return feats.select("media_id", "n_samples", "duration_ms")
