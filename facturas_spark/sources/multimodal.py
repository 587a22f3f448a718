"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio libraries, so the DECODE step is stubbed
(clearly marked below) behind a deterministic fake: every derived value is
a pure function of the payload bytes, so tests are exact and the Spark-side
plumbing — schemas, mapInPandas batch shape, partitioning, explode — is
fully real. Swapping ``_decode_image_stub``/``_decode_audio_stub`` for
PIL/librosa calls is the only production change.

Operators (training-data-pipeline staples over media at 100 TB):
- :func:`image_features`  — mapInPandas: decode -> (dims, mean intensity,
  perceptual-hash stand-in). One pass, no shuffle.
- :func:`resize_plan`     — pure column arithmetic: target dims preserving
  aspect ratio (the real resize happens next to the decode in production).
- :func:`frame_sample`    — video -> one row per sampled frame timestamp
  (sequence + explode, JVM-side), decode stub per frame.
- :func:`audio_features`  — mapInPandas: decode -> (duration bucket,
  deterministic pseudo-embedding array<float>).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_DDL",
    "synth_media_rows",
    "image_features",
    "resize_plan",
    "frame_sample",
    "audio_features",
]

MEDIA_DDL = (
    "media_id long, kind string, payload binary, "
    "meta struct<width: int, height: int, duration_s: double, "
    "sample_rate: int, mime: string>"
)


def synth_media_rows(n: int, seed: int = 42) -> list[tuple]:
    """Deterministic fake media corpus: payload = seeded digest bytes, meta
    typed per kind."""
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        kind = ("image", "audio", "video")[i % 3]
        payload = (h * 8)[: 64 + (i % 5) * 32]
        if kind == "image":
            meta = (640 + (i % 4) * 160, 480 + (i % 3) * 120, None, None, "image/jpeg")
        elif kind == "audio":
            meta = (None, None, 1.0 + (i % 30), 16000, "audio/wav")
        else:
            meta = (1280, 720, 5.0 + (i % 20), None, "video/mp4")
        rows.append((i, kind, payload, meta))
    return rows


# ----------------------------------------------------------------- stubs --
# STUB: real implementation would be PIL.Image.open(BytesIO(payload)).
# Deterministic fake: derive pixel statistics from the payload digest.
def _decode_image_stub(payload: bytes) -> dict:
    if payload is None:
        raise ValueError("empty payload")
    digest = hashlib.md5(payload).digest()
    return {
        "mean_intensity": digest[0] / 255.0,
        "phash": hashlib.md5(b"phash:" + payload).hexdigest()[:16],
    }


# STUB: real implementation would be soundfile/librosa decode.
def _decode_audio_stub(payload: bytes, sample_rate: int) -> dict:
    digest = hashlib.md5(payload).digest()
    emb = [((b / 255.0) * 2 - 1) for b in digest[:8]]
    return {"rms": digest[1] / 255.0, "embedding": emb}


# -------------------------------------------------------------- operators --
def image_features(media: DataFrame) -> DataFrame:
    """Image rows -> feature columns via one mapInPandas pass (Arrow batches
    in, Arrow batches out; no shuffle; non-image rows filtered before the
    Python boundary so bytes never cross it unnecessarily)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [m["width"] for m in pdf["meta"]],
                    "height": [m["height"] for m in pdf["meta"]],
                    "mean_intensity": [f["mean_intensity"] for f in feats],
                    "phash": [f["phash"] for f in feats],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches,
        schema="media_id long, width int, height int, mean_intensity double, phash string",
    )


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving target dims — pure column arithmetic (JVM-side);
    the actual pixel resample belongs inside the decode UDF in production."""
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h))
    return media.filter(F.col("meta.width").isNotNull()).select(
        "media_id",
        "kind",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.ceil(w * scale).cast("int").alias("target_w"),
        F.ceil(h * scale).cast("int").alias("target_h"),
    )


def frame_sample(media: DataFrame, fps: float = 0.5) -> DataFrame:
    """Video rows -> one row per sampled frame timestamp.

    The timestamp grid is built JVM-side (sequence + explode over
    duration*fps); only the per-frame decode (stubbed) crosses into Python.
    """
    n_frames = F.floor(F.col("meta.duration_s") * F.lit(fps)).cast("int")
    frames = (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            "payload",
            F.col("meta.duration_s").alias("duration_s"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                    lambda i: i.cast("double") / F.lit(fps),
                )
            ).alias("ts_s"),
        )
    )

    def decode_frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # STUB: real impl seeks to ts_s and decodes the frame
            hashes = [
                hashlib.md5(p + str(t).encode()).hexdigest()[:16]
                for p, t in zip(pdf["payload"], pdf["ts_s"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ts_s": pdf["ts_s"],
                    "frame_hash": hashes,
                }
            )

    return frames.mapInPandas(
        decode_frames, schema="media_id long, ts_s double, frame_hash string"
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Audio rows -> duration bucket + deterministic pseudo-embedding."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_audio_stub(p, m["sample_rate"])
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_s": [m["duration_s"] for m in pdf["meta"]],
                    "duration_bucket": [
                        int(math.floor(m["duration_s"] / 10.0)) for m in pdf["meta"]
                    ],
                    "rms": [f["rms"] for f in feats],
                    "embedding": [f["embedding"] for f in feats],
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        batches,
        schema=(
            "media_id long, duration_s double, duration_bucket int, "
            "rms double, embedding array<double>"
        ),
    )
