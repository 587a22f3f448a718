"""Pure-stdlib GIF87a/89a codec (LZW), first frame.

Completes the common-image-format set next to BMP/PNG/JPEG: GIF is an
LZW-compressed indexed-color format — header + logical screen
descriptor + color table + image blocks, all plain byte layout, with
the LZW variant fully specified in the GIF89a spec (variable code
width, LSB-first packing, clear/EOI codes, 4096-entry dictionary).

- :func:`encode_gif`  — (h, w) uint8 grayscale or (h, w, 3) uint8 RGB
  with <= 256 distinct colors (exact palette; no quantizer — the
  deterministic fixture generator, not a general-purpose encoder).
- :func:`decode_gif`  — first image frame -> (h, w, 3) uint8 RGB.
  Extensions (GCE/comment/application) skipped; interlaced row order
  undone; local color tables honored.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_gif", "decode_gif"]


# ----------------------------------------------------------------- encode --
def _lzw_encode(indices: list[int], mcs: int) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    dict_size = eoi + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    width = mcs + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    seq: tuple = ()
    for idx in indices:
        cand = seq + (idx,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = dict_size
        dict_size += 1
        if dict_size == (1 << width) + 1:
            width += 1
        if dict_size >= 4095:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            dict_size = eoi + 1
            width = mcs + 1
        seq = (idx,)
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(pixels: np.ndarray) -> bytes:
    if pixels.ndim == 2:
        palette = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        indices = pixels.astype(np.uint8)
    else:
        colors, inv = np.unique(
            pixels.reshape(-1, 3), axis=0, return_inverse=True
        )
        if len(colors) > 256:
            raise ValueError("encode_gif: > 256 distinct colors (no quantizer)")
        palette = np.zeros((256, 3), dtype=np.uint8)
        palette[: len(colors)] = colors
        indices = inv.reshape(pixels.shape[:2]).astype(np.uint16)
    h, w = indices.shape

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    out += palette.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    mcs = 8
    out.append(mcs)
    data = _lzw_encode([int(i) for i in indices.ravel()], mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


# ----------------------------------------------------------------- decode --
def _lzw_decode(data: bytes, mcs: int, n_pixels: int) -> list[int]:
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    acc = 0
    nbits = 0
    pos = 0
    prev: list[int] | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                return out  # truncated: return what we have
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]
        else:
            raise ValueError("bad LZW code")
        out.extend(entry)
        if prev is not None:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    data = bytes(payload)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("no color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data) and data[pos]:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(lzw), mcs, iw * ih)
        idx += [0] * (iw * ih - len(idx))
        grid = np.array(idx[: iw * ih], dtype=np.int32).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows in 4-pass order
            order = (
                list(range(0, ih, 8))
                + list(range(4, ih, 8))
                + list(range(2, ih, 4))
                + list(range(1, ih, 2))
            )
            de = np.empty_like(grid)
            de[order] = grid
            grid = de
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[iy : iy + ih, ix : ix + iw] = ct[np.clip(grid, 0, len(ct) - 1)]
        return img  # first frame only
    raise ValueError("no image block in GIF")
