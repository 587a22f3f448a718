"""Pure-stdlib MJPEG-in-AVI container codec (RIFF 'AVI ').

Round-3/4 multimodal gap was "JPEG/H.264 decode needs PIL/ffmpeg".
Baseline JPEG landed in ``sources/jpeg.py``; this module adds the
standard COMPRESSED video interchange it unlocks: Motion-JPEG inside
the RIFF/AVI container (every frame an independent baseline JPEG —
the format DV cameras, old webcams, and OpenCV's 'MJPG' writer emit).
H.264 remains out of reach without ffmpeg, honestly documented.

The RIFF layout handled (the layout our encoder writes and the common
producer layout):

    RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
               LIST('movi' 00dc 00dc ...) [idx1])

Decode offers the 100-TB-relevant access pattern the Y4M codec
established: header parse → per-frame (offset, size) index → decode
ONLY the sampled frame (no full-video decode to sample one frame).
"""

from __future__ import annotations

import struct

import numpy as np

from facturas_spark.sources.jpeg import decode_jpeg, encode_jpeg

__all__ = ["encode_avi_mjpeg", "decode_avi_header", "decode_avi_frame"]


def encode_avi_mjpeg(frames: np.ndarray, fps: int, quality: int = 85) -> bytes:
    """(n, h, w) uint8 luma or (n, h, w, 3) uint8 RGB frames -> MJPEG AVI."""
    n = frames.shape[0]
    h, w = frames.shape[1:3]
    jpegs = [encode_jpeg(frames[i], quality=quality) for i in range(n)]

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    usec = 1_000_000 // fps
    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I", usec, max_bytes * fps, 0, 0x10, n, 0, 1, max_bytes, w, h, 0, 0, 0, 0
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, max_bytes, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_header(payload: bytes) -> dict:
    """Parse container -> {width, height, fps, n_frames, frames:
    [(offset, size)]} where offsets index the raw JPEG bytes of each
    '..dc' chunk. One linear chunk walk; no frame decoded."""
    data = bytes(payload)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    w = h = None
    fps = None
    frames: list[tuple[int, int]] = []

    def walk(start: int, end: int) -> None:
        nonlocal w, h, fps
        pos = start
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
            body_start = pos + 8
            if tag == b"LIST":
                walk(body_start + 4, body_start + size)
            elif tag == b"avih":
                usec, = struct.unpack("<I", data[body_start : body_start + 4])
                if usec:
                    fps = round(1_000_000 / usec, 3)
                w, h = struct.unpack(
                    "<II", data[body_start + 32 : body_start + 40]
                )
            elif tag[2:4] in (b"dc", b"db") and data[body_start : body_start + 3] == b"\xff\xd8\xff":
                frames.append((body_start, size))
            pos = body_start + size + (size % 2)

    walk(12, len(data))
    if w is None or not frames:
        raise ValueError("no video stream found")
    return {
        "width": int(w),
        "height": int(h),
        "fps": fps,
        "n_frames": len(frames),
        "frames": frames,
    }


def decode_avi_frame(payload: bytes, meta: dict, k: int) -> np.ndarray:
    """Random-access decode of frame k -> (h, w) uint8 luma (BT.601 from
    the decoded RGB). Only frame k's JPEG bytes are touched."""
    off, size = meta["frames"][k]
    rgb = decode_jpeg(bytes(payload[off : off + size]))
    return (rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)
