"""Multimodal column operators (spec extension; absent from the
reference).

Design: image/audio/video payloads are opaque BINARY columns with a
typed metadata struct alongside (mime, width/height or sample_rate,
n_frames). All pipeline plumbing — schemas, Arrow batch shapes,
mapInPandas signatures, partition sizing — is real and tested; only
the codec call itself is stubbed, because no image/audio libraries
exist in this container. Each stub is deterministic (derived from the
payload bytes) so tests can assert end-to-end dataflow, and the
`decoder=` hook is where a real `PIL.Image.open` / `soundfile.read`
drops in unchanged.

Scale notes: mapInPandas streams Arrow batches — payloads never
round-trip through Python row objects; spark.sql.files.maxPartitionBytes
(not row count) governs partition sizing for large binaries, and the
schema keeps payloads in a single column so column pruning drops them
for metadata-only queries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image codec: derives (w, h) from
    the payload hash. Swap for PIL/libvips in a real deployment —
    signature and batch flow are identical."""
    if payload is None:
        raise NotImplementedError("real decoder required for null-size probe")
    import hashlib

    # md5, not hash(): bytes hashing is salted per process.
    h = int.from_bytes(hashlib.md5(bytes(payload)).digest()[:4], "big")
    return 16 + h % 1024, 16 + (h >> 10) % 1024


def image_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    embedding_dim: int = 8,
    decoder=_fake_decode,
) -> DataFrame:
    """Decode + featurize images via mapInPandas (Arrow-batched).

    Output: (media_id, n_bytes, width, height, embedding). The
    embedding stub is a byte-histogram projection — deterministic,
    real shape (array<float> of embedding_dim)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, nb, ws, hs, embs = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                w, h = decoder(b)
                hist = np.bincount(
                    np.frombuffer(b, dtype=np.uint8) % embedding_dim,
                    minlength=embedding_dim,
                ).astype("float32")
                norm = float(hist.sum()) or 1.0
                ids.append(mid)
                nb.append(len(b))
                ws.append(w)
                hs.append(h)
                embs.append((hist / norm).tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": pd.array(nb, dtype="int32"),
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "embedding": embs,
                }
            )

    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_stub(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize plumbing: passes payloads through mapInPandas and emits
    the new dimensions; the pixel transform raises NotImplementedError
    per spec (no image libs in this container) unless a decoder-backed
    implementation replaces `_resize_payload`."""

    def _resize_payload(payload: bytes) -> bytes:
        raise NotImplementedError(
            "image resize requires an image codec (PIL/libvips); "
            "plumbing (schema, batching, partitioning) is real"
        )

    schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("payload", BinaryType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": [_resize_payload(bytes(p)) for p in pdf[payload_col]],
                    "width": pd.array([target_w] * len(pdf), dtype="int32"),
                    "height": pd.array([target_h] * len(pdf), dtype="int32"),
                }
            )
            yield out

    return df.mapInPandas(run, schema)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
    n_frames_col: str = "n_frames",
) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled frame
    index — a pure explode over a frame-index sequence, fully JVM-side;
    the frame EXTRACTION (codec) would be a downstream mapInPandas on
    (media_id, frame_idx) keyed payload lookups."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every_n)
            )
        ).alias("frame_idx"),
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: payload = repeated
    md5-derived bytes, metadata consistent with _fake_decode."""
    rows = []
    import hashlib

    for i in range(n):
        payload = (hashlib.md5(str(i).encode()).digest() * 8)[: 64 + i]
        w, h = _fake_decode(payload)
        rows.append((f"m{i}", "image/fake", bytearray(payload), w, h))
    return spark.createDataFrame(rows, IMAGE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("n_samples", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("rms", FloatType(), True),
        StructField("zero_crossings", IntegerType(), True),
    ]
)


def _fake_audio_decode(payload: bytes):
    """Deterministic stand-in for an audio codec: interprets the raw
    bytes as little-endian int16 PCM at 16 kHz mono (truncating a
    trailing odd byte). Swap for `soundfile.read` in a real deployment
    — signature (bytes -> (samples ndarray, sample_rate)) and batch
    flow are identical."""
    import numpy as np

    if payload is None:
        raise NotImplementedError("real decoder required for null payloads")
    b = bytes(payload)
    usable = len(b) - (len(b) % 2)
    samples = np.frombuffer(b[:usable], dtype="<i2").astype(np.float32) / 32768.0
    return samples, 16_000


def audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    decoder=_fake_audio_decode,
) -> DataFrame:
    """Decode + featurize audio via mapInPandas (Arrow-batched):
    (media_id, n_samples, duration_ms, rms, zero_crossings). The
    integer columns are pure byte-length arithmetic (oracle-checkable);
    rms / zero_crossings exercise the decoded sample vector and are
    pinned by tests against a NumPy reference."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, ns, dur, rms, zc = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                samples, rate = decoder(payload if payload is not None else b"")
                n = len(samples)
                ids.append(mid)
                ns.append(n)
                dur.append(n * 1000 // rate)
                rms.append(
                    float(np.sqrt(np.mean(samples * samples))) if n else 0.0
                )
                zc.append(int(np.sum(np.signbit(samples[1:]) != np.signbit(samples[:-1]))) if n > 1 else 0)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_samples": pd.array(ns, dtype="int32"),
                    "duration_ms": pd.array(dur, dtype="int32"),
                    "rms": pd.array(rms, dtype="float32"),
                    "zero_crossings": pd.array(zc, dtype="int32"),
                }
            )

    return df.mapInPandas(run, AUDIO_FEATURES_SCHEMA)
