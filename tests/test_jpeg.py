"""Baseline JPEG codec tests (sources/jpeg.py)."""

from __future__ import annotations

import numpy as np
import pytest

from facturas_spark.sources.codecs import sniff_media
from facturas_spark.sources.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
         (xx + yy) * 255 // max(h + w - 2, 1)], axis=-1
    ).astype(np.uint8)


def test_roundtrip_color_smooth():
    img = _gradient(40, 56)
    data = encode_jpeg(img, quality=90)
    assert data[:3] == b"\xff\xd8\xff" and data[-2:] == b"\xff\xd9"
    assert sniff_media(data) == "image/jpeg"
    out = decode_jpeg(data)
    assert out.shape == img.shape
    assert _psnr(out, img) > 38  # smooth content at q90 decodes cleanly


def test_roundtrip_non_multiple_of_8_dims():
    img = _gradient(33, 47)  # forces edge-padded partial blocks
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert out.shape == (33, 47, 3)
    assert _psnr(out, img) > 35


def test_roundtrip_grayscale():
    yy, xx = np.mgrid[0:24, 0:40]
    g = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (24, 40, 3)
    assert np.all(out[..., 0] == out[..., 1])  # gray replicates channels
    assert _psnr(out[..., 0], g) > 28


def test_quality_monotone():
    img = _gradient(32, 32)
    hi = len(encode_jpeg(img, quality=95))
    lo = len(encode_jpeg(img, quality=20))
    assert lo < hi  # lower quality compresses harder
    assert _psnr(decode_jpeg(encode_jpeg(img, 95)), img) >= _psnr(
        decode_jpeg(encode_jpeg(img, 20)), img
    )


def test_textured_content_degrades_not_explodes():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=85))
    assert out.shape == img.shape
    assert _psnr(out, img) > 18  # noise is the JPEG worst case


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnotajpeg")
    # synthesize a progressive SOF2 header: SOI + SOF2 segment
    bogus = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(ValueError):
        decode_jpeg(bogus + b"\xff\xd9")


def test_avi_mjpeg_roundtrip_and_random_access():
    from facturas_spark.sources.avi import (
        decode_avi_frame,
        decode_avi_header,
        encode_avi_mjpeg,
    )
    from facturas_spark.sources.codecs import sniff_media

    yy, xx = np.mgrid[0:24, 0:32]
    frames = np.stack(
        [((xx * 3 + yy * 5 + 17 * i) % 256).astype(np.uint8) for i in range(6)]
    )
    data = encode_avi_mjpeg(frames, fps=2, quality=92)
    assert sniff_media(data) == "video/avi"
    m = decode_avi_header(data)
    assert (m["width"], m["height"], m["fps"], m["n_frames"]) == (32, 24, 2.0, 6)
    # random access: frame 4 decodes without touching frames 0-3
    f4 = decode_avi_frame(data, m, 4)
    assert f4.shape == (24, 32)
    assert float(np.abs(f4.astype(int) - frames[4].astype(int)).mean()) < 3.0
    with pytest.raises(ValueError):
        decode_avi_header(b"RIFF\x00\x00\x00\x00WAVE")
