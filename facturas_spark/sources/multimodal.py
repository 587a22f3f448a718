"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Since round 3 the decode step is REAL, not stubbed: payloads are genuine
BMP / PNG / WAV / Y4M files (public byte-layout formats implemented with
``struct`` + ``zlib`` + numpy in :mod:`facturas_spark.sources.codecs` — no
media libraries needed), and every feature below is computed from actually
decoded pixels / PCM samples / video frames. Production swaps the codec set
(PIL/ffmpeg reach JPEG/H.264), not the operator shape.

Operators (training-data-pipeline staples over media at 100 TB):
- :func:`image_features`  — mapInPandas: decode pixels -> (real dims, mean
  luma, 64-bit average-hash). One pass, no shuffle.
- :func:`resize_plan`     — pure column arithmetic: target dims preserving
  aspect ratio (the pixel resample itself belongs next to the decode).
- :func:`frame_sample`    — video -> one row per sampled frame timestamp
  (grid built JVM-side via sequence + explode); the Python side does a
  constant-time seek into the Y4M stream and decodes ONLY the sampled
  frame's luma plane — the 100-TB-relevant property (no full-video decode
  per sampled frame).
- :func:`audio_features`  — mapInPandas: PCM decode -> real duration, RMS,
  and an 8-band FFT energy embedding (array<float>).

Scale notes: all four operators are embarrassingly parallel single-pass
mapInPandas over the media table — zero shuffles (asserted in
tests/test_multimodal.py); rows are filtered to the relevant ``kind``
JVM-side so foreign payload bytes never cross the Arrow boundary.

No reference counterpart (the reference delegates decode to its OCR
vendor — process-invoice/index.ts:2100-2241 consumes vendor output);
this module serves the brief's multimodal pipeline requirement.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from facturas_spark.sources.codecs import (
    decode_bmp,
    decode_png,
    decode_wav,
    decode_y4m_frame,
    decode_y4m_header,
    encode_bmp,
    encode_png,
    encode_wav,
    encode_y4m,
    sniff_media,
)

__all__ = [
    "MEDIA_DDL",
    "synth_media_rows",
    "image_features",
    "resize_plan",
    "frame_sample",
    "audio_features",
    "media_sniff",
]

MEDIA_DDL = (
    "media_id long, kind string, payload binary, "
    "meta struct<width: int, height: int, duration_s: double, "
    "sample_rate: int, mime: string>"
)

_AUDIO_RATE = 2000  # synthetic corpus rate: real WAV, small payloads
_VIDEO_FPS = 2


def _image_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) test-card: per-doc phase-shifted gradients
    (structured, so average-hash has signal, unlike white noise)."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1) + i * 37) % 256
    g = (yy * 255 // max(h - 1, 1) + i * 53) % 256
    b = ((xx + yy) * 255 // max(w + h - 2, 1) + i * 71) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def synth_media_rows(n: int, seed: int = 42) -> list[tuple]:
    """Deterministic media corpus of REAL decodable files: images alternate
    BMP/PNG, audio is 16-bit PCM WAV, video is Y4M (YUV420). Meta mirrors
    what a crawler's sidecar would record."""
    rows = []
    for i in range(n):
        k = (seed * 1_000_003 + i * 7919) & 0x7FFFFFFF
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            w, h = 64 + (k % 4) * 16, 48 + (k % 3) * 12
            px = _image_pixels(k, w, h)
            # rotate BMP / PNG / JPEG / GIF so every image codec path
            # (incl. the lossy baseline-JPEG decoder and the LZW indexed
            # path) is exercised by the demo corpus
            fmt = ("image/bmp", "image/png", "image/jpeg", "image/gif")[(i // 3) % 4]
            if fmt == "image/png":
                payload = encode_png(px)
            elif fmt == "image/bmp":
                payload = encode_bmp(px)
            elif fmt == "image/gif":
                from facturas_spark.sources.gif import encode_gif

                # GIF is indexed: use the luma plane (exact 256-gray palette)
                payload = encode_gif(
                    (px @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)
                )
            else:
                from facturas_spark.sources.jpeg import encode_jpeg

                payload = encode_jpeg(px, quality=90)
            meta = (w, h, None, None, fmt)
        elif kind == "audio":
            dur = 1.0 + (k % 30)
            t = np.arange(int(dur * _AUDIO_RATE))
            freq = 55.0 * (1 + k % 8)
            samples = (
                np.sin(2 * np.pi * freq * t / _AUDIO_RATE) * (8000 + (k % 5) * 4000)
            ).astype(np.int16)
            payload = encode_wav(samples, _AUDIO_RATE)
            meta = (None, None, dur, _AUDIO_RATE, "audio/wav")
        else:
            w, h = 32, 24
            dur = 5.0 + (k % 20)
            nf = int(dur * _VIDEO_FPS)
            base = _image_pixels(k, w, h).mean(axis=-1).astype(np.uint8)
            frames = np.stack(
                [(base.astype(int) + 11 * j) % 256 for j in range(nf)]
            ).astype(np.uint8)
            # rotate the three real video containers: raw planar Y4M,
            # compressed MJPEG AVI (per-frame baseline JPEG), and an
            # H.264 Annex B single-IDR I_PCM stream (dims snapped to the
            # macroblock grid)
            variant = (i // 3) % 3
            if variant == 1:
                from facturas_spark.sources.avi import encode_avi_mjpeg

                payload = encode_avi_mjpeg(frames, _VIDEO_FPS, quality=92)
                meta = (w, h, dur, None, "video/avi")
            elif variant == 2:
                hw, hh = 32, 16
                yp = frames[0][:hh, :hw]
                cbp = np.full((hh // 2, hw // 2), 120, np.uint8)
                crp = np.full((hh // 2, hw // 2), 136, np.uint8)
                if (i // 9) % 2 == 0:
                    # TRANSFORM-CODED multi-IDR stream (CAVLC + intra
                    # pred + VUI fps, round 5): alternating I_16x16 /
                    # I_4x4 / I_PCM macroblocks, 4 frames at 2 fps
                    from facturas_spark.sources.h264_intra import (
                        encode_h264_stream,
                    )

                    n_mb = (hw // 16) * (hh // 16)
                    kinds = (["i16", "i4", "pcm"] * n_mb)[:n_mb]
                    fys = [
                        ((yp.astype(int) + 23 * j) % 256).astype(np.uint8)
                        for j in range(4)
                    ]
                    payload = encode_h264_stream(
                        fys, [cbp] * 4, [crp] * 4,
                        qp=24 + (k % 10), fps=2.0, mb_kinds=kinds,
                    )[0]
                else:
                    from facturas_spark.sources.h264 import encode_h264_ipcm

                    payload = encode_h264_ipcm(yp, cbp, crp)
                meta = (hw, hh, 2.0, None, "video/h264")
            else:
                payload = encode_y4m(frames, _VIDEO_FPS)
                meta = (w, h, dur, None, "video/y4m")
        rows.append((i, kind, bytearray(payload), meta))
    return rows


# -------------------------------------------------------------- decoders --
def _decode_image(payload: bytes) -> np.ndarray:
    mime = sniff_media(payload)
    if mime == "image/png":
        return decode_png(bytes(payload))
    if mime == "image/bmp":
        return decode_bmp(bytes(payload))
    if mime == "image/jpeg":
        from facturas_spark.sources.jpeg import decode_jpeg

        return decode_jpeg(bytes(payload))
    if mime == "image/gif":
        from facturas_spark.sources.gif import decode_gif

        return decode_gif(bytes(payload))
    raise ValueError(f"no codec for {mime}")


def _ahash(luma: np.ndarray, side: int = 8) -> str:
    """64-bit average-hash: block-average to side x side, threshold at the
    mean, row-major bits -> hex. The standard perceptual-dedup baseline."""
    h, w = luma.shape
    ys = (np.arange(side + 1) * h) // side
    xs = (np.arange(side + 1) * w) // side
    cum = np.zeros((h + 1, w + 1))
    cum[1:, 1:] = luma.cumsum(0).cumsum(1)
    blk = (
        cum[ys[1:, None], xs[None, 1:]]
        - cum[ys[:-1, None], xs[None, 1:]]
        - cum[ys[1:, None], xs[None, :-1]]
        + cum[ys[:-1, None], xs[None, :-1]]
    )
    areas = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    blk = blk / areas
    bits = (blk > blk.mean()).ravel()
    return f"{int(''.join('1' if b else '0' for b in bits), 2):016x}"


# -------------------------------------------------------------- operators --
def image_features(media: DataFrame) -> DataFrame:
    """Image rows -> decoded feature columns via one mapInPandas pass.

    REAL decode: PNG/BMP bytes -> pixel array; width/height/mean intensity
    come from the pixels (NOT trusted from meta), and ``phash`` is a true
    64-bit average-hash over the luma plane. Arrow batches in/out, no
    shuffle; non-image rows filtered before the Python boundary so their
    bytes never cross it."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            widths, heights, means, hashes = [], [], [], []
            for p in pdf["payload"]:
                # a crawl-scale corpus WILL contain truncated/corrupt
                # payloads; they must surface as null feature rows, not
                # dead tasks (same contract as the extraction UDF on
                # hostile html)
                try:
                    px = _decode_image(p)
                except Exception:
                    widths.append(None)
                    heights.append(None)
                    means.append(None)
                    hashes.append(None)
                    continue
                luma = px @ np.array([0.299, 0.587, 0.114])
                widths.append(px.shape[1])
                heights.append(px.shape[0])
                means.append(float(luma.mean()) / 255.0)
                hashes.append(_ahash(luma))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": widths,
                    "height": heights,
                    "mean_intensity": means,
                    "phash": hashes,
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
    """Video rows -> one row per sampled frame timestamp, with the frame's
    REAL decoded luma statistics.

    The timestamp grid is built JVM-side (sequence + explode over
    duration*fps); the Python side parses the Y4M header once per video
    row-group and seeks DIRECTLY to each sampled frame (constant-time
    offset arithmetic) — it never decodes the frames between samples,
    which is the property that matters when sampling 1 frame per minute
    out of 100 TB of video."""
    n_frames = F.floor(F.col("meta.duration_s") * F.lit(fps)).cast("int")
    frames = media.filter(F.col("kind") == "video").select(
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

    def decode_frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from facturas_spark.sources.avi import decode_avi_frame, decode_avi_header
        from facturas_spark.sources.codecs import sniff_media

        meta_cache: dict[int, dict] = {}
        for pdf in it:
            means, stds, idxs = [], [], []
            for mid, p, t in zip(pdf["media_id"], pdf["payload"], pdf["ts_s"]):
                m = meta_cache.get(mid)
                if m is None:
                    # container dispatch: Y4M (uncompressed planar) or
                    # MJPEG AVI (per-frame JPEG); both expose the same
                    # random-access (header, frame k) contract. Corrupt
                    # containers become null frame rows, not dead tasks.
                    try:
                        mime = sniff_media(p)
                        if mime == "video/avi":
                            m = dict(decode_avi_header(bytes(p)), _kind="avi")
                        elif mime == "video/h264":
                            from facturas_spark.sources.h264 import h264_meta
                            from facturas_spark.sources.h264_intra import (
                                decode_h264_frames,
                            )

                            hm = h264_meta(bytes(p))
                            # IDR-only streams decode frame-independent;
                            # fps comes from VUI timing when present
                            # (round-5: multi-IDR + VUI close the
                            # single-frame debt). Decode ONCE here,
                            # inside the failure boundary: CABAC/FMO or
                            # non-I streams raise NotImplementedError
                            # and must become null frame rows, not a
                            # dead task — and the grid would otherwise
                            # re-decode the whole stream per timestamp.
                            # Cache only derived stats, never planes:
                            # meta_cache lives for the whole partition
                            # (round-4 advice).
                            frames_rec = decode_h264_frames(bytes(p))
                            m = {
                                "n_frames": len(frames_rec),
                                "fps": float(hm.get("vui_fps") or 1.0),
                                "_kind": "h264",
                                "_means": [
                                    float(fy.mean()) / 255.0
                                    for fy, _, _ in frames_rec
                                ],
                                "_stds": [
                                    float(fy.std()) / 255.0
                                    for fy, _, _ in frames_rec
                                ],
                            }
                        else:
                            m = dict(decode_y4m_header(bytes(p)), _kind="y4m")
                    except Exception:
                        m = {"n_frames": 0}
                    meta_cache[mid] = m
                if m["n_frames"] <= 0:
                    # header-only (truncated) stream: the JVM grid still
                    # emits ts 0.0 — null the stats instead of a negative
                    # seek that would kill the task
                    idxs.append(None)
                    means.append(None)
                    stds.append(None)
                    continue
                k = min(int(t * m["fps"]), m["n_frames"] - 1)
                if m["_kind"] == "h264":
                    # stats precomputed at header time, per frame
                    idxs.append(k)
                    means.append(m["_means"][k])
                    stds.append(m["_stds"][k])
                    continue
                if m["_kind"] == "avi":
                    luma = decode_avi_frame(p, m, k)
                else:
                    luma = decode_y4m_frame(p, m, k)
                idxs.append(k)
                means.append(float(luma.mean()) / 255.0)
                stds.append(float(luma.std()) / 255.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ts_s": pdf["ts_s"],
                    "frame_idx": idxs,
                    "luma_mean": means,
                    "luma_std": stds,
                }
            )

    return frames.mapInPandas(
        decode_frames,
        schema=(
            "media_id long, ts_s double, frame_idx int, "
            "luma_mean double, luma_std double"
        ),
    )


_N_FFT_BANDS = 8


def audio_features(media: DataFrame) -> DataFrame:
    """Audio rows -> REAL decoded duration, RMS, and an 8-band FFT energy
    embedding (log-spaced band power over the PCM spectrum, L2-normalized)
    — the classic cheap audio fingerprint."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            durs, buckets, rmss, embs = [], [], [], []
            for p in pdf["payload"]:
                samples, rate = decode_wav(bytes(p))
                x = samples.astype(np.float64) / 32768.0
                dur = len(samples) / rate
                durs.append(dur)
                buckets.append(int(math.floor(dur / 10.0)))
                # truncated/empty PCM is routine in crawled audio: the
                # operator must stay total (empty -> silent-zero features),
                # not fail the whole Arrow batch on np.mean([]) / rfft([])
                if len(x) == 0:
                    rmss.append(0.0)
                    embs.append([0.0] * _N_FFT_BANDS)
                    continue
                rmss.append(float(np.sqrt(np.mean(x * x))))
                spec = np.abs(np.fft.rfft(x[: 4096])) ** 2
                if len(spec) < 2:
                    embs.append([0.0] * _N_FFT_BANDS)
                    continue
                edges = np.unique(
                    np.geomspace(1, len(spec) - 1, _N_FFT_BANDS + 1).astype(int)
                )
                bands = np.array(
                    [
                        spec[edges[j] : edges[j + 1]].sum()
                        for j in range(len(edges) - 1)
                    ]
                )
                bands = np.pad(bands, (0, _N_FFT_BANDS - len(bands)))
                norm = np.linalg.norm(bands)
                embs.append((bands / norm if norm > 0 else bands).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_s": durs,
                    "duration_bucket": buckets,
                    "rms": rmss,
                    "embedding": embs,
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        batches,
        schema=(
            "media_id long, duration_s double, duration_bucket int, "
            "rms double, embedding array<double>"
        ),
    )


def media_sniff(media: DataFrame) -> DataFrame:
    """Magic-byte MIME detection over the binary payload (S2 for media):
    declared meta.mime vs sniffed reality — the standard crawl-hygiene
    check before routing payloads to codecs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "declared_mime": [m["mime"] for m in pdf["meta"]],
                    "sniffed_mime": [sniff_media(p) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(
        batches, schema="media_id long, declared_mime string, sniffed_mime string"
    ).withColumn("mime_ok", F.col("declared_mime") == F.col("sniffed_mime"))
