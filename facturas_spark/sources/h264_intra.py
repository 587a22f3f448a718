"""H.264 baseline I-frame transform decode: CAVLC residuals, intra
prediction (4x4 all 9 modes, 16x16 all 4, chroma DC/H/V/plane), dequant
and inverse integer transform — the round-4 directive that converts the
I_PCM-only subset (`sources/h264.py`) into a real video pixel source.

Spec: ITU-T H.264 (05/2003 onward), public standard. Sections used:
 7.3.5/7.4.5  macroblock layer syntax (I slices)
 8.3          intra prediction
 8.5          transform & quantisation (incl. 8.5.10/8.5.11 DC paths)
 9.1          ue(v)/se(v)/me(v) (CBP mapping Table 9-4)
 9.2          CAVLC (Tables 9-5, 9-7, 9-8, 9-10)

Honesty note on conformance: the sandbox has no ffmpeg/x264 and no real
H.264 fixture, so the VLC tables below cannot be cross-checked against
an independent decoder here. They are reproduced from the public spec;
structural properties (prefix-freeness, completeness) are pytest-pinned,
and the encoder/decoder pair closes the loop bit-exactly on every mode —
internal consistency is proven, external conformance is asserted to the
spec text. The matching encoder (``encode_h264_i16``/``encode_h264_i4``)
emits conformant-syntax streams used by `multimodal.frame_sample`
fixtures.

Documented subset boundary (all refuse with NotImplementedError, never
silently-wrong pixels): CABAC entropy coding, P/B slices, FMO, redundant
coded slices, multi-slice pictures, non-4:2:0 chroma, cropped dims, and
the in-loop deblocking filter (streams whose PPS enables slice-level
deblocking control are decoded only when the slice turns the filter OFF
— disable_deblocking_filter_idc == 1; otherwise we refuse rather than
emit unfiltered, non-conformant pixels).

No external deps: numpy only (same policy as h264.py).
"""

from __future__ import annotations

import numpy as np

from facturas_spark.sources.h264 import (
    _BitReader,
    _BitWriter,
    add_emulation,
    parse_pps,
    parse_sps,
    split_annexb,
    strip_emulation,
)

__all__ = [
    "decode_h264_iframe",
    "decode_h264_frames",
    "encode_h264_iframe",
    "encode_h264_stream",
    "encode_h264_i16",
    "encode_h264_i4",
]

# ------------------------------------------------------------------ VLC --
# Table 9-5: coeff_token. Entries (trailing_ones, total_coeff) -> code
# string, per nC class. Class keys: "0" (0<=nC<2), "2" (2<=nC<4),
# "4" (4<=nC<8), "8" (nC>=8, 6-bit FLC), "-1" (chroma DC, nC==-1).
_COEFF_TOKEN_0 = {
    (0, 0): "1",
    (0, 1): "000101", (1, 1): "01",
    (0, 2): "00000111", (1, 2): "000100", (2, 2): "001",
    (0, 3): "000000111", (1, 3): "00000110", (2, 3): "0000101", (3, 3): "00011",
    (0, 4): "0000000111", (1, 4): "000000110", (2, 4): "00000101", (3, 4): "000011",
    (0, 5): "00000000111", (1, 5): "0000000110", (2, 5): "000000101", (3, 5): "0000100",
    (0, 6): "0000000001111", (1, 6): "00000000110", (2, 6): "0000000101", (3, 6): "00000100",
    (0, 7): "0000000001011", (1, 7): "0000000001110", (2, 7): "00000000101", (3, 7): "000000100",
    (0, 8): "0000000001000", (1, 8): "0000000001010", (2, 8): "0000000001101", (3, 8): "0000000100",
    (0, 9): "00000000001111", (1, 9): "00000000001110", (2, 9): "0000000001001", (3, 9): "00000000100",
    (0, 10): "00000000001011", (1, 10): "00000000001010", (2, 10): "00000000001101", (3, 10): "0000000001100",
    (0, 11): "000000000001111", (1, 11): "000000000001110", (2, 11): "00000000001001", (3, 11): "00000000001100",
    (0, 12): "000000000001011", (1, 12): "000000000001010", (2, 12): "000000000001101", (3, 12): "00000000001000",
    (0, 13): "0000000000001111", (1, 13): "000000000000001", (2, 13): "000000000001001", (3, 13): "000000000001100",
    (0, 14): "0000000000001011", (1, 14): "0000000000001110", (2, 14): "0000000000001101", (3, 14): "000000000001000",
    (0, 15): "0000000000000111", (1, 15): "0000000000001010", (2, 15): "0000000000001001", (3, 15): "0000000000001100",
    (0, 16): "0000000000000100", (1, 16): "0000000000000110", (2, 16): "0000000000000101", (3, 16): "0000000000001000",
}
_COEFF_TOKEN_2 = {
    (0, 0): "11",
    (0, 1): "001011", (1, 1): "10",
    (0, 2): "000111", (1, 2): "00111", (2, 2): "011",
    (0, 3): "0000111", (1, 3): "001010", (2, 3): "001001", (3, 3): "0101",
    (0, 4): "00000111", (1, 4): "000110", (2, 4): "000101", (3, 4): "0100",
    (0, 5): "00000100", (1, 5): "0000110", (2, 5): "0000101", (3, 5): "00110",
    (0, 6): "000000111", (1, 6): "00000110", (2, 6): "00000101", (3, 6): "001000",
    (0, 7): "00000001111", (1, 7): "000000110", (2, 7): "000000101", (3, 7): "000100",
    (0, 8): "00000001011", (1, 8): "00000001110", (2, 8): "00000001101", (3, 8): "0000100",
    (0, 9): "000000001111", (1, 9): "00000001010", (2, 9): "00000001001", (3, 9): "000000100",
    (0, 10): "000000001011", (1, 10): "000000001110", (2, 10): "000000001101", (3, 10): "00000001100",
    (0, 11): "000000001000", (1, 11): "000000001010", (2, 11): "000000001001", (3, 11): "00000001000",
    (0, 12): "0000000001111", (1, 12): "0000000001110", (2, 12): "0000000001101", (3, 12): "000000001100",
    (0, 13): "0000000001011", (1, 13): "0000000001010", (2, 13): "0000000001001", (3, 13): "0000000001100",
    (0, 14): "0000000000111", (1, 14): "00000000001011", (2, 14): "0000000000110", (3, 14): "0000000001000",
    (0, 15): "00000000001001", (1, 15): "00000000001000", (2, 15): "00000000001010", (3, 15): "0000000000001",
    (0, 16): "00000000000111", (1, 16): "00000000000110", (2, 16): "00000000000101", (3, 16): "00000000000100",
}
_COEFF_TOKEN_4 = {
    (0, 0): "1111",
    (0, 1): "001111", (1, 1): "1110",
    (0, 2): "001011", (1, 2): "01111", (2, 2): "1101",
    (0, 3): "001000", (1, 3): "01100", (2, 3): "01110", (3, 3): "1100",
    (0, 4): "0001111", (1, 4): "01010", (2, 4): "01011", (3, 4): "1011",
    (0, 5): "0001011", (1, 5): "01000", (2, 5): "01001", (3, 5): "1010",
    (0, 6): "0001001", (1, 6): "001110", (2, 6): "001101", (3, 6): "1001",
    (0, 7): "0001000", (1, 7): "001010", (2, 7): "001001", (3, 7): "1000",
    (0, 8): "00001111", (1, 8): "0001110", (2, 8): "0001101", (3, 8): "01101",
    (0, 9): "00001011", (1, 9): "00001110", (2, 9): "0001010", (3, 9): "001100",
    (0, 10): "000001111", (1, 10): "00001010", (2, 10): "00001101", (3, 10): "0001100",
    (0, 11): "000001011", (1, 11): "000001110", (2, 11): "00001001", (3, 11): "00001100",
    (0, 12): "000001000", (1, 12): "000001010", (2, 12): "000001101", (3, 12): "00001000",
    (0, 13): "0000001101", (1, 13): "000000111", (2, 13): "000001001", (3, 13): "000001100",
    (0, 14): "0000001001", (1, 14): "0000001100", (2, 14): "0000001011", (3, 14): "0000001010",
    (0, 15): "0000000101", (1, 15): "0000001000", (2, 15): "0000000111", (3, 15): "0000000110",
    (0, 16): "0000000001", (1, 16): "0000000100", (2, 16): "0000000011", (3, 16): "0000000010",
}
_COEFF_TOKEN_M1 = {  # chroma DC (4:2:0), nC == -1
    (0, 0): "01",
    (0, 1): "000111", (1, 1): "1",
    (0, 2): "000100", (1, 2): "000110", (2, 2): "001",
    (0, 3): "000011", (1, 3): "0000011", (2, 3): "0000010", (3, 3): "000101",
    (0, 4): "000010", (1, 4): "00000011", (2, 4): "00000010", (3, 4): "0000000",
}


def _fixed_token_8() -> dict:
    # nC >= 8: 6-bit FLC, code = (total_coeff-1)<<2 | trailing_ones,
    # except (0,0) -> 000011
    out = {(0, 0): "000011"}
    for tc in range(1, 17):
        for t1 in range(0, min(3, tc) + 1):
            out[(t1, tc)] = format(((tc - 1) << 2) | t1, "06b")
    return out


_COEFF_TOKEN_8 = _fixed_token_8()

# Table 9-7 / 9-8: total_zeros. Luma 4x4: rows by TotalCoeff 1..15,
# entry index = total_zeros value.
_TOTAL_ZEROS_4x4 = {
    1: ["1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010",
        "000000011", "000000010", "000000001"],
    2: ["111", "110", "101", "100", "011", "0101", "0100", "0011", "0010",
        "00011", "00010", "000011", "000010", "000001", "000000"],
    3: ["0101", "111", "110", "101", "0100", "0011", "100", "011",
        "0010", "00011", "00010", "000001", "00001", "000000"],
    4: ["00011", "111", "0101", "0100", "110", "101", "100", "0011",
        "011", "0010", "00010", "00001", "00000"],
    5: ["0101", "0100", "0011", "111", "110", "101", "100", "011",
        "0010", "00001", "0001", "00000"],
    6: ["000001", "00001", "111", "110", "101", "100", "011", "010",
        "0001", "001", "000000"],
    7: ["000001", "00001", "101", "100", "011", "11", "010", "0001",
        "001", "000000"],
    8: ["000001", "0001", "00001", "011", "11", "10", "010", "001",
        "000000"],
    9: ["000001", "000000", "0001", "11", "10", "001", "01", "00001"],
    10: ["00001", "00000", "001", "11", "10", "01", "0001"],
    11: ["0000", "0001", "001", "010", "1", "011"],
    12: ["0000", "0001", "01", "1", "001"],
    13: ["000", "001", "1", "01"],
    14: ["00", "01", "1"],
    15: ["0", "1"],
}
# Table 9-9(a): chroma DC total_zeros (4:2:0; TotalCoeff 1..3)
_TOTAL_ZEROS_CHROMA_DC = {
    1: ["1", "01", "001", "000"],
    2: ["1", "01", "00"],
    3: ["1", "0"],
}
# Table 9-10: run_before, rows by zerosLeft (1..6, then >6)
_RUN_BEFORE = {
    1: ["1", "0"],
    2: ["1", "01", "00"],
    3: ["11", "10", "01", "00"],
    4: ["11", "10", "01", "001", "000"],
    5: ["11", "10", "011", "010", "001", "000"],
    6: ["11", "000", "001", "011", "010", "101", "100"],
    7: ["111", "110", "101", "100", "011", "010", "001", "0001", "00001",
        "000001", "0000001", "00000001", "000000001", "0000000001",
        "00000000001"],
}

# Table 9-4: codeNum -> coded_block_pattern for Intra_4x4 / Intra_8x8
_ME_CBP_INTRA = [
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41,
]


def _invert(code_map: dict) -> dict:
    inv = {}
    for k, code in code_map.items():
        assert code not in inv, (k, code)
        inv[code] = k
    return inv


_COEFF_TOKEN_TABLES = {
    0: _COEFF_TOKEN_0,
    2: _COEFF_TOKEN_2,
    4: _COEFF_TOKEN_4,
    8: _COEFF_TOKEN_8,
    -1: _COEFF_TOKEN_M1,
}
_COEFF_TOKEN_DEC = {k: _invert(v) for k, v in _COEFF_TOKEN_TABLES.items()}
_TZ_DEC = {k: _invert(dict(enumerate(v))) for k, v in _TOTAL_ZEROS_4x4.items()}
_TZC_DEC = {k: _invert(dict(enumerate(v)))
            for k, v in _TOTAL_ZEROS_CHROMA_DC.items()}
_RB_DEC = {k: _invert(dict(enumerate(v))) for k, v in _RUN_BEFORE.items()}


def _nc_class(nc: int) -> int:
    if nc == -1:
        return -1
    if nc < 2:
        return 0
    if nc < 4:
        return 2
    if nc < 8:
        return 4
    return 8


def _read_prefix(r: _BitReader, table: dict, what: str):
    code = ""
    for _ in range(20):
        code += str(r.u(1))
        if code in table:
            return table[code]
    raise ValueError(f"invalid {what} code {code!r}")


def _write_code(w: _BitWriter, code: str) -> None:
    for c in code:
        w.u(int(c), 1)


# --------------------------------------------------- CAVLC block codec --
def decode_cavlc_block(r: _BitReader, nc: int, max_coeffs: int) -> list:
    """Decode one residual block (9.2): returns the coefficient list in
    DECODING order index 0..max_coeffs-1 (zigzag order, caller maps to
    the raster block). ``nc`` selects the coeff_token table; -1 = chroma
    DC (max_coeffs 4)."""
    t1, tc = _read_prefix(r, _COEFF_TOKEN_DEC[_nc_class(nc)], "coeff_token")
    coeffs = [0] * max_coeffs
    if tc == 0:
        return coeffs
    # levels: trailing ones first (sign bits), then remaining levels
    levels = []
    for _ in range(t1):
        levels.append(-1 if r.u(1) else 1)
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i in range(tc - t1):
        # level_prefix
        lp = 0
        while r.u(1) == 0:
            lp += 1
            if lp > 32:
                raise ValueError("invalid level_prefix")
        if lp == 14 and suffix_len == 0:
            level_suffix_size = 4
        elif lp >= 15:
            level_suffix_size = lp - 3
        else:
            level_suffix_size = suffix_len
        suffix = r.u(level_suffix_size) if level_suffix_size else 0
        code = (min(15, lp) << suffix_len) + suffix
        if lp >= 15 and suffix_len == 0:
            code += 15
        if lp >= 16:
            code += (1 << (lp - 3)) - 4096
        if i == 0 and t1 < 3:
            code += 2
        level = (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros
    if tc < max_coeffs:
        if nc == -1:
            tz = _read_prefix(r, _TZC_DEC[tc], "total_zeros_chroma")
        else:
            tz = _read_prefix(r, _TZ_DEC[tc], "total_zeros")
    else:
        tz = 0
    # runs
    zeros_left = tz
    pos = tc - 1 + tz  # index of the first (highest-frequency) coeff
    for i, level in enumerate(levels):
        coeffs[pos] = level
        if i == len(levels) - 1:
            break
        if zeros_left > 0:
            rb = _read_prefix(r, _RB_DEC[min(zeros_left, 7)], "run_before")
        else:
            rb = 0
        zeros_left -= rb
        pos -= 1 + rb
    return coeffs


def encode_cavlc_block(w: _BitWriter, coeffs: list, nc: int) -> int:
    """Encode one residual block; ``coeffs`` in zigzag order. Returns
    total_coeff (the caller records it for neighbour nC)."""
    max_coeffs = len(coeffs)
    nz = [(i, c) for i, c in enumerate(coeffs) if c != 0]
    tc = len(nz)
    # trailing ones: up to 3 |1| coefficients at the high-frequency end
    t1 = 0
    for _, c in reversed(nz):
        if abs(c) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    _write_code(w, _COEFF_TOKEN_TABLES[_nc_class(nc)][(t1, tc)])
    if tc == 0:
        return 0
    hi = [c for _, c in reversed(nz)]  # highest frequency first
    for c in hi[:t1]:
        w.u(1 if c < 0 else 0, 1)
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i, level in enumerate(hi[t1:]):
        code = (level << 1) - 2 if level > 0 else (-level << 1) - 1
        if i == 0 and t1 < 3:
            code -= 2
        # mechanical inverse of the decoder's levelCode formula (9.2.2.1):
        # find the smallest level_prefix whose (prefix, suffix) range
        # covers `code` at the current suffix length
        if suffix_len == 0:
            if code < 14:
                lp, suffix, ls = code, 0, 0
            elif code < 30:
                lp, suffix, ls = 14, code - 14, 4
            else:
                lp = 15
                while True:
                    rem = code - 30
                    if lp >= 16:
                        rem -= (1 << (lp - 3)) - 4096
                    if 0 <= rem < (1 << (lp - 3)):
                        break
                    lp += 1
                suffix, ls = rem, lp - 3
        else:
            if (code >> suffix_len) < 15:
                lp = code >> suffix_len
                suffix, ls = code & ((1 << suffix_len) - 1), suffix_len
            else:
                lp = 15
                while True:
                    rem = code - (15 << suffix_len)
                    if lp >= 16:
                        rem -= (1 << (lp - 3)) - 4096
                    if 0 <= rem < (1 << (lp - 3)):
                        break
                    lp += 1
                suffix, ls = rem, lp - 3
        for _ in range(lp):
            w.u(0, 1)
        w.u(1, 1)
        if ls:
            w.u(suffix, ls)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    tz = nz[-1][0] + 1 - tc  # zeros below the highest nonzero coeff
    if tc < max_coeffs:
        if nc == -1:
            _write_code(w, _TOTAL_ZEROS_CHROMA_DC[tc][tz])
        else:
            _write_code(w, _TOTAL_ZEROS_4x4[tc][tz])
    zeros_left = tz
    idxs = [i for i, _ in reversed(nz)]
    for j in range(len(idxs) - 1):
        run = idxs[j] - idxs[j + 1] - 1
        if zeros_left > 0:
            _write_code(w, _RUN_BEFORE[min(zeros_left, 7)][run])
        zeros_left -= run
    return tc


# ------------------------------------------------ transform & quant --
# raster index of zigzag position k (4x4)
ZIGZAG4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
# dequant LevelScale rows by qp%6: [v(0,0)-class, v(1,1)-class, other]
_V = [
    [10, 16, 13], [11, 18, 14], [13, 20, 16],
    [14, 23, 18], [16, 25, 20], [18, 29, 23],
]
# forward MF rows by qp%6 (encoder side; same class layout)
_MF = [
    [13107, 5243, 8066], [11916, 4660, 7490], [10082, 4194, 6554],
    [9362, 3647, 5825], [8192, 3355, 5243], [7282, 2893, 4559],
]
# position class within a 4x4 block: 0 for (0,0),(0,2),(2,0),(2,2);
# 1 for (1,1),(1,3),(3,1),(3,3); 2 otherwise
_CLS = np.array(
    [[0, 2, 0, 2], [2, 1, 2, 1], [0, 2, 0, 2], [2, 1, 2, 1]], np.int64
)
_QPC_TABLE = list(range(30)) + [29, 30, 31, 32, 32, 33, 34, 34, 35, 35,
                                36, 36, 37, 37, 37, 38, 38, 38, 39, 39,
                                39, 39]

_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]],
               np.int64)
_HAD = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
                np.int64)


def chroma_qp(qp: int) -> int:
    return _QPC_TABLE[max(0, min(51, qp))]


def fwd4x4(block: np.ndarray) -> np.ndarray:
    return _CF @ block.astype(np.int64) @ _CF.T


def inv4x4(w: np.ndarray) -> np.ndarray:
    """Spec 8.5.10 inverse core transform butterflies + >>6 rounding."""
    w = w.astype(np.int64)
    # horizontal
    e0 = w[:, 0] + w[:, 2]
    e1 = w[:, 0] - w[:, 2]
    e2 = (w[:, 1] >> 1) - w[:, 3]
    e3 = w[:, 1] + (w[:, 3] >> 1)
    f = np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=1)
    # vertical
    g0 = f[0] + f[2]
    g1 = f[0] - f[2]
    g2 = (f[1] >> 1) - f[3]
    g3 = f[1] + (f[3] >> 1)
    h = np.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=0)
    return (h + 32) >> 6


def quant4x4(w: np.ndarray, qp: int, skip_dc: bool = False) -> np.ndarray:
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3  # intra rounding
    mf = np.array(_MF[qp % 6], np.int64)[_CLS]
    z = (np.abs(w) * mf + f) >> qbits
    z = (np.sign(w) * z).astype(np.int64)
    if skip_dc:
        z[0, 0] = 0
    return z


def dequant4x4(z: np.ndarray, qp: int) -> np.ndarray:
    v = np.array(_V[qp % 6], np.int64)[_CLS]
    return (z.astype(np.int64) * v) << (qp // 6)


def dequant_dc_luma(zd: np.ndarray, qp: int) -> np.ndarray:
    """8.5.10: inverse Hadamard then scale (DC path of I_16x16 luma)."""
    f = _HAD @ zd.astype(np.int64) @ _HAD
    v0 = _V[qp % 6][0]
    if qp >= 36:
        return (f * v0) << (qp // 6 - 6)
    return (f * v0 + (1 << (5 - qp // 6))) >> (6 - qp // 6)


def dequant_dc_chroma(zd: np.ndarray, qpc: int) -> np.ndarray:
    """8.5.11: 2x2 Hadamard + scale."""
    h2 = np.array([[1, 1], [1, -1]], np.int64)
    f = h2 @ zd.astype(np.int64) @ h2
    return ((f * _V[qpc % 6][0]) << (qpc // 6)) >> 5


def zig(block4: np.ndarray) -> list:
    flat = block4.reshape(16)
    return [int(flat[i]) for i in ZIGZAG4]


def unzig(coeffs: list) -> np.ndarray:
    out = np.zeros(16, np.int64)
    for k, i in enumerate(ZIGZAG4):
        out[i] = coeffs[k]
    return out.reshape(4, 4)


# ------------------------------------------------------ intra prediction --
def _avail(dec4, bx, by) -> bool:
    return 0 <= by < len(dec4) and 0 <= bx < len(dec4[0]) and dec4[by][bx]


def pred4x4(plane, dec4, x, y, mode):
    """8.3.1: 4x4 luma intra prediction at pixel (x, y), modes 0-8.
    ``dec4`` is the frame-wide decoded-4x4-block map that encodes the
    spec's neighbour availability (raster MB order + the 8x8/4x4 block
    scan make 'already decoded' == 'available'). Raises ValueError when
    the mode requires unavailable samples (encoder never picks those)."""
    up = _avail(dec4, x // 4, y // 4 - 1)
    left = _avail(dec4, x // 4 - 1, y // 4)
    upleft = _avail(dec4, x // 4 - 1, y // 4 - 1)
    upright = _avail(dec4, x // 4 + 1, y // 4 - 1)
    p = plane
    t = [int(p[y - 1, x + i]) for i in range(4)] if up else None
    if up:
        t += [int(p[y - 1, x + 4 + i]) for i in range(4)] if upright else [t[3]] * 4
    l_ = [int(p[y + j, x - 1]) for j in range(4)] if left else None
    tl = int(p[y - 1, x - 1]) if upleft else None

    def T(i):  # p[i, -1] with i == -1 -> corner
        return tl if i == -1 else t[i]

    def L(j):  # p[-1, j] with j == -1 -> corner
        return tl if j == -1 else l_[j]

    out = np.zeros((4, 4), np.int64)
    if mode == 0:  # Vertical
        if not up:
            raise ValueError("V needs top")
        for i in range(4):
            out[:, i] = t[i]
    elif mode == 1:  # Horizontal
        if not left:
            raise ValueError("H needs left")
        for j in range(4):
            out[j, :] = l_[j]
    elif mode == 2:  # DC
        if up and left:
            dc = (sum(t[:4]) + sum(l_) + 4) >> 3
        elif up:
            dc = (sum(t[:4]) + 2) >> 2
        elif left:
            dc = (sum(l_) + 2) >> 2
        else:
            dc = 128
        out[:] = dc
    elif mode == 3:  # Diagonal-Down-Left
        if not up:
            raise ValueError("DDL needs top")
        for j in range(4):
            for i in range(4):
                if i == 3 and j == 3:
                    out[j, i] = (t[6] + 3 * t[7] + 2) >> 2
                else:
                    k = i + j
                    out[j, i] = (t[k] + 2 * t[k + 1] + t[k + 2] + 2) >> 2
    elif mode == 4:  # Diagonal-Down-Right
        if not (up and left and upleft):
            raise ValueError("DDR needs top+left+corner")
        for j in range(4):
            for i in range(4):
                if i > j:
                    d = i - j
                    out[j, i] = (T(d - 2) + 2 * T(d - 1) + T(d) + 2) >> 2
                elif i < j:
                    d = j - i
                    out[j, i] = (L(d - 2) + 2 * L(d - 1) + L(d) + 2) >> 2
                else:
                    out[j, i] = (t[0] + 2 * tl + l_[0] + 2) >> 2
    elif mode == 5:  # Vertical-Right
        if not (up and left and upleft):
            raise ValueError("VR needs top+left+corner")
        for j in range(4):
            for i in range(4):
                z = 2 * i - j
                k = i - (j >> 1)
                if z >= 0 and z % 2 == 0:
                    out[j, i] = (T(k - 1) + T(k) + 1) >> 1
                elif z >= 0:
                    out[j, i] = (T(k - 2) + 2 * T(k - 1) + T(k) + 2) >> 2
                elif z == -1:
                    out[j, i] = (l_[0] + 2 * tl + t[0] + 2) >> 2
                else:
                    out[j, i] = (L(j - 1) + 2 * L(j - 2) + L(j - 3) + 2) >> 2
    elif mode == 6:  # Horizontal-Down
        if not (up and left and upleft):
            raise ValueError("HD needs top+left+corner")
        for j in range(4):
            for i in range(4):
                z = 2 * j - i
                k = j - (i >> 1)
                if z >= 0 and z % 2 == 0:
                    out[j, i] = (L(k - 1) + L(k) + 1) >> 1
                elif z >= 0:
                    out[j, i] = (L(k - 2) + 2 * L(k - 1) + L(k) + 2) >> 2
                elif z == -1:
                    out[j, i] = (l_[0] + 2 * tl + t[0] + 2) >> 2
                else:
                    out[j, i] = (T(i - 1) + 2 * T(i - 2) + T(i - 3) + 2) >> 2
    elif mode == 7:  # Vertical-Left
        if not up:
            raise ValueError("VL needs top")
        for j in range(4):
            for i in range(4):
                k = i + (j >> 1)
                if j % 2 == 0:
                    out[j, i] = (t[k] + t[k + 1] + 1) >> 1
                else:
                    out[j, i] = (t[k] + 2 * t[k + 1] + t[k + 2] + 2) >> 2
    elif mode == 8:  # Horizontal-Up
        if not left:
            raise ValueError("HU needs left")
        for j in range(4):
            for i in range(4):
                z = i + 2 * j
                k = j + (i >> 1)
                if z > 5:
                    out[j, i] = l_[3]
                elif z == 5:
                    out[j, i] = (l_[2] + 3 * l_[3] + 2) >> 2
                elif z % 2 == 0:
                    out[j, i] = (l_[k] + l_[k + 1] + 1) >> 1
                else:
                    out[j, i] = (l_[k] + 2 * l_[k + 1] + l_[k + 2] + 2) >> 2
    else:
        raise ValueError(f"bad 4x4 mode {mode}")
    return out


def pred4x4_available_modes(dec4, x, y):
    """Modes legal at this block position given neighbour availability."""
    up = _avail(dec4, x // 4, y // 4 - 1)
    left = _avail(dec4, x // 4 - 1, y // 4)
    upleft = _avail(dec4, x // 4 - 1, y // 4 - 1)
    modes = [2]
    if up:
        modes += [0, 3, 7]
    if left:
        modes += [1, 8]
    if up and left and upleft:
        modes += [4, 5, 6]
    return sorted(modes)


def _clip(a):
    return np.clip(a, 0, 255)


def pred_full(plane, dec_units, x, y, size, mode):
    """8.3.2 (luma 16x16, size=16) / 8.3.4 modes 1-3 (chroma 8x8,
    size=8): whole-block V / H / DC / Plane prediction. ``dec_units``
    availability map is in `size`-pixel units for up/left MB checks."""
    u = size
    ux, uy = x // u, y // u
    up = _avail(dec_units, ux, uy - 1)
    left = _avail(dec_units, ux - 1, uy)
    upleft = _avail(dec_units, ux - 1, uy - 1)
    p = plane
    out = np.zeros((u, u), np.int64)
    if mode == 0 and u == 16 or mode == 2 and u == 8:  # Vertical
        if not up:
            raise ValueError("V needs top")
        out[:] = p[y - 1, x : x + u].astype(np.int64)
    elif mode == 1:  # Horizontal
        if not left:
            raise ValueError("H needs left")
        out[:] = p[y : y + u, x - 1].astype(np.int64)[:, None]
    elif (mode == 2 and u == 16) or (mode == 0 and u == 8):  # DC (luma16/chromaDC handled elsewhere)
        if up and left:
            dc = (int(p[y - 1, x : x + u].sum()) + int(p[y : y + u, x - 1].sum()) + u) >> (
                u.bit_length()  # 16 -> 5, 8 -> 4
            )
        elif up:
            dc = (int(p[y - 1, x : x + u].sum()) + u // 2) >> (u.bit_length() - 1)
        elif left:
            dc = (int(p[y : y + u, x - 1].sum()) + u // 2) >> (u.bit_length() - 1)
        else:
            dc = 128
        out[:] = dc
    elif mode == 3:  # Plane
        if not (up and left and upleft):
            raise ValueError("plane needs top+left+corner")
        h = u // 2
        H = sum(
            (i + 1) * (int(p[y - 1, x + h + i]) - int(p[y - 1, x + h - 2 - i]))
            for i in range(h)
        )
        V = sum(
            (j + 1) * (int(p[y + h + j, x - 1]) - int(p[y + h - 2 - j, x - 1]))
            for j in range(h)
        )
        a = 16 * (int(p[y + u - 1, x - 1]) + int(p[y - 1, x + u - 1]))
        if u == 16:
            b = (5 * H + 32) >> 6
            c = (5 * V + 32) >> 6
        else:
            b = (17 * H + 16) >> 5
            c = (17 * V + 16) >> 5
        for j in range(u):
            for i in range(u):
                out[j, i] = (a + b * (i - h + 1) + c * (j - h + 1) + 16) >> 5
        out = _clip(out)
    else:
        raise ValueError(f"bad full-block mode {mode}")
    return out


def chroma_dc_pred(plane, dec8, x, y):
    """8.3.4 mode 0: chroma DC, computed per 4x4 sub-block of the 8x8
    with the spec's corner rules."""
    up = _avail(dec8, x // 8, y // 8 - 1)
    left = _avail(dec8, x // 8 - 1, y // 8)
    p = plane
    out = np.zeros((8, 8), np.int64)
    for sy in (0, 4):
        for sx in (0, 4):
            tsum = int(p[y - 1, x + sx : x + sx + 4].sum()) if up else None
            lsum = int(p[y + sy : y + sy + 4, x - 1].sum()) if left else None
            if sx == sy:  # (0,0) and (4,4): both neighbours when present
                if up and left:
                    dc = (tsum + lsum + 4) >> 3
                elif up:
                    dc = (tsum + 2) >> 2
                elif left:
                    dc = (lsum + 2) >> 2
                else:
                    dc = 128
            elif sx == 4:  # top-right sub-block prefers top
                if up:
                    dc = (tsum + 2) >> 2
                elif left:
                    dc = (lsum + 2) >> 2
                else:
                    dc = 128
            else:  # (0,4): prefers left
                if left:
                    dc = (lsum + 2) >> 2
                elif up:
                    dc = (tsum + 2) >> 2
                else:
                    dc = 128
            out[sy : sy + 4, sx : sx + 4] = dc
    return out


# block scan order: 4x4 luma blkIdx -> (x4, y4) within the MB
_BLK_ORDER = [
    (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
    (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3),
]


# --------------------------------------------------------- frame decode --
class _FrameState:
    def __init__(self, w, h):
        self.y = np.zeros((h, w), np.uint8)
        self.cb = np.zeros((h // 2, w // 2), np.uint8)
        self.cr = np.zeros((h // 2, w // 2), np.uint8)
        w4, h4 = w // 4, h // 4
        self.dec4 = [[False] * w4 for _ in range(h4)]          # luma 4x4
        self.dec16 = [[False] * (w // 16) for _ in range(h // 16)]  # MBs
        self.nc_y = [[-1] * w4 for _ in range(h4)]
        wc4, hc4 = w // 8, h // 8
        self.nc_cb = [[-1] * wc4 for _ in range(hc4)]
        self.nc_cr = [[-1] * wc4 for _ in range(hc4)]
        self.mode4 = [[2] * w4 for _ in range(h4)]  # pred-mode ctx (DC default)
        self.is_i4 = [[False] * (w // 16) for _ in range(h // 16)]


def _nc_of(nc_map, bx, by):
    nA = nc_map[by][bx - 1] if bx > 0 else -1
    nB = nc_map[by - 1][bx] if by > 0 else -1
    if nA >= 0 and nB >= 0:
        return (nA + nB + 1) >> 1
    if nA >= 0:
        return nA
    if nB >= 0:
        return nB
    return 0


def _pred_mode_ctx_one(st, nbx, nby):
    """Mode contribution of one neighbour block (8.3.1.1): -1 when
    unavailable (forces DC), 2 when the neighbour MB is not I_4x4."""
    if nbx < 0 or nby < 0:
        return -1
    if not (0 <= nby < len(st.dec4) and 0 <= nbx < len(st.dec4[0])):
        return -1
    if not st.dec4[nby][nbx]:
        return -1
    if not st.is_i4[nby // 4][nbx // 4]:
        return 2
    return st.mode4[nby][nbx]


def _pred_mode_ctx(st, bx, by):
    a = _pred_mode_ctx_one(st, bx - 1, by)
    b = _pred_mode_ctx_one(st, bx, by - 1)
    if a < 0 or b < 0:
        return 2
    return min(a, b)


def _mb_i16_fields(mb_type):
    """mb_type 1..24 -> (pred_mode, cbp_chroma, cbp_luma)."""
    t = mb_type - 1
    return t % 4, (t // 4) % 3, 15 if t >= 12 else 0


def decode_h264_frames(payload: bytes):
    """Decode EVERY IDR frame of a CAVLC baseline Annex B stream
    (I_4x4, I_16x16, I_PCM macroblocks). Returns a list of (y, cb, cr)
    tuples in stream order — IDR frames are self-contained, so each
    decodes from a fresh frame state. Raises NotImplementedError for
    CABAC / FMO / non-I streams and ValueError for malformed bitstreams
    (callers treat both as null-frame rows)."""
    sps = pps = None
    slice_nals = []
    for nal in split_annexb(payload):
        if not nal:
            continue
        t = nal[0] & 0x1F
        if t == 7 and sps is None:
            sps = parse_sps(strip_emulation(nal[1:]))
        elif t == 8 and pps is None:
            pps = parse_pps(strip_emulation(nal[1:]))
        elif t == 5:
            slice_nals.append(strip_emulation(nal[1:]))
        elif t == 1:
            # inter-coded slice present: refusing loudly here keeps the
            # documented failure boundary — silently returning only the
            # IDR frames would hand frame_sample a sparse frame list
            # against the full-stream VUI timeline (round-5 review #2)
            raise NotImplementedError("P/B slices not supported")
    if sps is None or pps is None or not slice_nals:
        raise ValueError("stream lacks SPS, PPS or IDR slice")
    if pps.get("entropy_coding_mode"):
        raise NotImplementedError("CABAC entropy coding not supported")
    if pps.get("num_slice_groups", 1) != 1:
        raise NotImplementedError("FMO (slice groups) not supported")
    if sps["chroma_format_idc"] != 1:
        raise NotImplementedError("only 4:2:0 supported")
    w, h = sps["width"], sps["height"]
    if w % 16 or h % 16:
        raise NotImplementedError("cropped dims not supported in pixel decode")
    return [_decode_idr_slice(sps, pps, nal, w, h) for nal in slice_nals]


def decode_h264_iframe(payload: bytes):
    """First IDR frame only — the single-frame convenience wrapper."""
    return decode_h264_frames(payload)[0]


def _decode_idr_slice(sps, pps, slice_nal, w, h):
    st = _FrameState(w, h)

    r = _BitReader(slice_nal)
    first_mb = r.ue()
    if first_mb != 0:
        # a slice that does not start at MB 0 is part of a multi-slice
        # picture (or a mid-picture capture); honoring it as a frame
        # origin would emit a half-zero plane (round-5 review #2)
        raise NotImplementedError("multi-slice pictures not supported")
    slice_type = r.ue()
    if slice_type % 5 != 2:
        raise NotImplementedError("only I slices supported")
    r.ue()  # pps id
    r.u(sps["log2_max_frame_num"])  # frame_num
    r.ue()  # idr_pic_id
    if sps["pic_order_cnt_type"] == 0:
        r.u(sps["log2_max_poc_lsb"])  # pic_order_cnt_lsb
    if pps.get("redundant_pic_cnt_present_flag"):
        # spec 7.3.3: redundant_pic_cnt sits BEFORE dec_ref_pic_marking;
        # skipping it would shift every later field by its ue() width.
        # 0 marks the primary coded picture — decodable; nonzero is a
        # redundant copy whose primary we have no machinery to prefer.
        if r.ue() != 0:
            raise NotImplementedError("redundant coded slices not supported")
    r.u(1)  # no_output_of_prior_pics_flag
    r.u(1)  # long_term_reference_flag
    qp = pps.get("pic_init_qp", 26) + r.se()
    cqo = pps.get("chroma_qp_index_offset", 0)
    if pps.get("deblocking_filter_control_present_flag"):
        # disable_deblocking_filter_idc: 1 = filter off (no offsets
        # follow, nothing to apply — decodable); 0/2 = in-loop filter on,
        # which this decoder does not implement, so decoding would yield
        # non-conformant pixels silently — refuse instead.
        if r.ue() != 1:
            raise NotImplementedError("in-loop deblocking filter not supported")

    n_mbs = (w // 16) * (h // 16)
    for mb in range(first_mb, n_mbs):
        mbx, mby = mb % (w // 16), mb // (w // 16)
        mb_type = r.ue()
        if mb_type == 25:  # I_PCM
            r.align()
            x, y0 = mbx * 16, mby * 16
            st.y[y0 : y0 + 16, x : x + 16] = np.frombuffer(
                r.bytes_(256), np.uint8
            ).reshape(16, 16)
            st.cb[y0 // 2 : y0 // 2 + 8, x // 2 : x // 2 + 8] = np.frombuffer(
                r.bytes_(64), np.uint8
            ).reshape(8, 8)
            st.cr[y0 // 2 : y0 // 2 + 8, x // 2 : x // 2 + 8] = np.frombuffer(
                r.bytes_(64), np.uint8
            ).reshape(8, 8)
            for j in range(4):
                for i in range(4):
                    st.dec4[mby * 4 + j][mbx * 4 + i] = True
                    st.nc_y[mby * 4 + j][mbx * 4 + i] = 16
            for j in range(2):
                for i in range(2):
                    st.nc_cb[mby * 2 + j][mbx * 2 + i] = 16
                    st.nc_cr[mby * 2 + j][mbx * 2 + i] = 16
            st.dec16[mby][mbx] = True
            continue
        if mb_type == 0:
            qp = _decode_mb_i4(r, st, mbx, mby, qp, cqo)
        elif 1 <= mb_type <= 24:
            qp = _decode_mb_i16(r, st, mbx, mby, mb_type, qp, cqo)
        else:
            raise ValueError(f"invalid I-slice mb_type {mb_type}")
    return st.y, st.cb, st.cr


def _residual_luma_block(r, st, bx, by, ac_only):
    nc = _nc_of(st.nc_y, bx, by)
    coeffs = decode_cavlc_block(r, nc, 15 if ac_only else 16)
    st.nc_y[by][bx] = sum(1 for c in coeffs if c)
    return coeffs


def _recon_luma4(st, bx, by, pred, zz16, qp):
    wq = dequant4x4(unzig(zz16), qp)
    res = inv4x4(wq)
    x, y0 = bx * 4, by * 4
    st.y[y0 : y0 + 4, x : x + 4] = _clip(pred + res).astype(np.uint8)
    st.dec4[by][bx] = True


def _decode_chroma(r, st, mbx, mby, cbp_chroma, qp, cqo):
    qpc = chroma_qp(qp + cqo)
    dc_levels = {}
    for plane_name in ("cb", "cr"):
        if cbp_chroma & 3:
            dc_levels[plane_name] = decode_cavlc_block(r, -1, 4)
        else:
            dc_levels[plane_name] = [0, 0, 0, 0]
    for plane_name in ("cb", "cr"):
        plane = getattr(st, plane_name)
        nc_map = getattr(st, "nc_" + plane_name)
        # prediction was done by the caller (stored in st._chroma_pred)
        pred8 = st._chroma_pred[plane_name]
        d = dc_levels[plane_name]
        dcs = dequant_dc_chroma(np.array([[d[0], d[1]], [d[2], d[3]]]), qpc)
        x0, y0 = mbx * 8, mby * 8
        for blk in range(4):
            sx, sy = (blk % 2) * 4, (blk // 2) * 4
            if cbp_chroma == 2:
                nc = _nc_of(nc_map, mbx * 2 + blk % 2, mby * 2 + blk // 2)
                ac = decode_cavlc_block(r, nc, 15)
                nc_map[mby * 2 + blk // 2][mbx * 2 + blk % 2] = sum(
                    1 for c in ac if c
                )
            else:
                ac = [0] * 15
                nc_map[mby * 2 + blk // 2][mbx * 2 + blk % 2] = 0
            wq = dequant4x4(unzig([0] + ac), qpc)
            wq[0, 0] = dcs[blk // 2, blk % 2]
            res = inv4x4(wq)
            plane[y0 + sy : y0 + sy + 4, x0 + sx : x0 + sx + 4] = _clip(
                pred8[sy : sy + 4, sx : sx + 4] + res
            ).astype(np.uint8)


def _chroma_predict(st, mbx, mby, mode):
    preds = {}
    for plane_name in ("cb", "cr"):
        plane = getattr(st, plane_name)
        if mode == 0:
            preds[plane_name] = chroma_dc_pred(plane, st.dec16, mbx * 8, mby * 8)
        else:
            preds[plane_name] = pred_full(plane, st.dec16, mbx * 8, mby * 8, 8, mode)
    st._chroma_pred = preds


def _decode_mb_i4(r, st, mbx, mby, qp, cqo):
    # mode contexts must see EARLIER blocks of this same MB (the spec
    # availability is decoding order) — track them locally since the
    # frame maps are only updated in the reconstruction loop below
    local_modes = {}
    modes = []
    for blk in range(16):
        bx = mbx * 4 + _BLK_ORDER[blk][0]
        by = mby * 4 + _BLK_ORDER[blk][1]

        def ctx(nbx, nby):
            if (nbx, nby) in local_modes:
                return local_modes[(nbx, nby)]
            return _pred_mode_ctx_one(st, nbx, nby)

        a = ctx(bx - 1, by)
        bb = ctx(bx, by - 1)
        pred_mode = 2 if (a < 0 or bb < 0) else min(a, bb)
        if r.u(1):  # prev_intra4x4_pred_mode_flag
            mode = pred_mode
        else:
            rem = r.u(3)
            mode = rem if rem < pred_mode else rem + 1
        modes.append(mode)
        local_modes[(bx, by)] = mode
    chroma_mode = r.ue()
    cbp_code = r.ue()
    if cbp_code >= len(_ME_CBP_INTRA):
        raise ValueError("invalid coded_block_pattern code")
    cbp = _ME_CBP_INTRA[cbp_code]
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    if cbp > 0:
        qp += r.se()
    st.is_i4[mby][mbx] = True
    # luma: block-at-a-time decode + reconstruct (later blocks predict
    # from earlier reconstructions, so interleaving is REQUIRED)
    for blk in range(16):
        ox, oy = _BLK_ORDER[blk]
        bx, by = mbx * 4 + ox, mby * 4 + oy
        i8 = (oy // 2) * 2 + (ox // 2)
        if cbp_luma & (1 << i8):
            zz = _residual_luma_block(r, st, bx, by, ac_only=False)
        else:
            zz = [0] * 16
            st.nc_y[by][bx] = 0
        pred = pred4x4(st.y, st.dec4, bx * 4, by * 4, modes[blk])
        st.mode4[by][bx] = modes[blk]
        _recon_luma4(st, bx, by, pred, zz, qp)
    _chroma_predict(st, mbx, mby, chroma_mode)
    _decode_chroma(r, st, mbx, mby, cbp_chroma, qp, cqo)
    st.dec16[mby][mbx] = True
    return qp


def _decode_mb_i16(r, st, mbx, mby, mb_type, qp, cqo):
    pred_mode, cbp_chroma, cbp_luma = _mb_i16_fields(mb_type)
    chroma_mode = r.ue()
    qp += r.se()  # mb_qp_delta always present for I_16x16
    # luma prediction for the whole MB (neighbour MBs only)
    pred16 = pred_full(st.y, st.dec16, mbx * 16, mby * 16, 16, pred_mode)
    # DC block: nC as for luma blk 0
    nc0 = _nc_of(st.nc_y, mbx * 4, mby * 4)
    dc_zz = decode_cavlc_block(r, nc0, 16)
    dcs = dequant_dc_luma(unzig(dc_zz), qp)
    for blk in range(16):
        ox, oy = _BLK_ORDER[blk]
        bx, by = mbx * 4 + ox, mby * 4 + oy
        if cbp_luma:
            ac = _residual_luma_block(r, st, bx, by, ac_only=True)
        else:
            ac = [0] * 15
            st.nc_y[by][bx] = 0
        wq = dequant4x4(unzig([0] + ac), qp)
        wq[0, 0] = dcs[oy, ox]
        res = inv4x4(wq)
        pb = pred16[oy * 4 : oy * 4 + 4, ox * 4 : ox * 4 + 4]
        x, y0 = bx * 4, by * 4
        st.y[y0 : y0 + 4, x : x + 4] = _clip(pb + res).astype(np.uint8)
        st.dec4[by][bx] = True
        st.mode4[by][bx] = 2
    _chroma_predict(st, mbx, mby, chroma_mode)
    _decode_chroma(r, st, mbx, mby, cbp_chroma, qp, cqo)
    st.dec16[mby][mbx] = True
    return qp


# --------------------------------------------------------- frame encode --
def _write_sps_pps(w_pix, h_pix, fps=None):
    sw = _BitWriter()
    sw.u(66, 8)        # baseline
    sw.u(0xC0, 8)
    sw.u(20, 8)        # level 2.0
    sw.ue(0)           # sps_id
    sw.ue(0)           # log2_max_frame_num_minus4 -> 4 bits
    sw.ue(2)           # pic_order_cnt_type 2
    sw.ue(1)           # max_num_ref_frames
    sw.u(0, 1)
    sw.ue(w_pix // 16 - 1)
    sw.ue(h_pix // 16 - 1)
    sw.u(1, 1)         # frame_mbs_only
    sw.u(0, 1)         # direct_8x8_inference
    sw.u(0, 1)         # frame_cropping
    if fps is None:
        sw.u(0, 1)     # vui_parameters_present_flag
    else:
        # VUI with timing_info only — the in-stream fps carrier
        sw.u(1, 1)     # vui present
        sw.u(0, 1)     # aspect_ratio_info
        sw.u(0, 1)     # overscan_info
        sw.u(0, 1)     # video_signal_type
        sw.u(0, 1)     # chroma_loc_info
        sw.u(1, 1)     # timing_info_present
        sw.u(1000, 32)                     # num_units_in_tick
        sw.u(int(round(fps * 2000)), 32)   # time_scale
        sw.u(1, 1)     # fixed_frame_rate_flag
        sw.u(0, 1)     # nal_hrd_parameters_present
        sw.u(0, 1)     # vcl_hrd_parameters_present
        sw.u(0, 1)     # pic_struct_present
        sw.u(0, 1)     # bitstream_restriction
    sw.trailing()
    pw = _BitWriter()
    pw.ue(0)           # pps_id
    pw.ue(0)           # sps_id
    pw.u(0, 1)         # CAVLC
    pw.u(0, 1)
    pw.ue(0)           # one slice group
    pw.ue(0)
    pw.ue(0)
    pw.u(0, 1)
    pw.u(0, 2)
    pw.se(0)           # pic_init_qp_minus26 -> 26
    pw.se(0)
    pw.se(0)           # chroma_qp_index_offset 0
    pw.u(0, 1)
    pw.u(0, 1)
    pw.u(0, 1)
    pw.trailing()
    return sw.tobytes(), pw.tobytes()


def _nal(nal_type, ref_idc, rbsp):
    return b"\x00\x00\x00\x01" + bytes([(ref_idc << 5) | nal_type]) + add_emulation(rbsp)


def _enc_chroma_compute(st, mbx, mby, src_cb, src_cr, chroma_mode, qp, cqo):
    """Transform+quant chroma for one MB WITHOUT touching state (chroma
    prediction only reads neighbour MBs, so this is safe before or after
    this MB's luma recon). Returns (per_plane coeffs+preds, cbp_chroma).
    Split from the write phase so the encoder does not need a full
    frame-state snapshot per macroblock (round-5 review: the snapshot
    probe made encoding quadratic in frame size)."""
    qpc = chroma_qp(qp + cqo)
    _chroma_predict(st, mbx, mby, chroma_mode)
    x0, y0 = mbx * 8, mby * 8
    per_plane = {}
    any_ac = any_dc = False
    for name, src in (("cb", src_cb), ("cr", src_cr)):
        pred8 = st._chroma_pred[name]
        res = src[y0 : y0 + 8, x0 : x0 + 8].astype(np.int64) - pred8
        zs, dcs = [], np.zeros((2, 2), np.int64)
        for blk in range(4):
            sx, sy = (blk % 2) * 4, (blk // 2) * 4
            wblk = fwd4x4(res[sy : sy + 4, sx : sx + 4])
            dcs[blk // 2, blk % 2] = wblk[0, 0]
            z = quant4x4(wblk, qpc, skip_dc=True)
            zz = zig(z)[1:]
            zs.append(zz)
            if any(zz):
                any_ac = True
        h2 = np.array([[1, 1], [1, -1]], np.int64)
        wd = h2 @ dcs @ h2
        qbits = 15 + qpc // 6
        f2 = (1 << qbits) // 3
        zd = (np.sign(wd) * ((np.abs(wd) * _MF[qpc % 6][0] + 2 * f2) >> (qbits + 1))).astype(np.int64)
        if zd.any():
            any_dc = True
        per_plane[name] = (zs, zd, pred8)
    cbp_chroma = 2 if any_ac else (1 if any_dc else 0)
    return per_plane, cbp_chroma


def _enc_chroma_write(b, st, mbx, mby, per_plane, cbp_chroma, qp, cqo):
    """Write the residual bits computed by `_enc_chroma_compute` and
    reconstruct via the decoder's dequant path (mirrors _decode_chroma
    exactly)."""
    qpc = chroma_qp(qp + cqo)
    x0, y0 = mbx * 8, mby * 8
    for name in ("cb", "cr"):
        zs, zd, _pred8 = per_plane[name]
        if cbp_chroma & 3:
            encode_cavlc_block(b, [int(zd[0, 0]), int(zd[0, 1]), int(zd[1, 0]), int(zd[1, 1])], -1)
    for name in ("cb", "cr"):
        zs, zd, pred8 = per_plane[name]
        plane = getattr(st, name)
        nc_map = getattr(st, "nc_" + name)
        if cbp_chroma == 0:
            zd = np.zeros((2, 2), np.int64)
        dcs_rec = dequant_dc_chroma(zd, qpc)
        for blk in range(4):
            sx, sy = (blk % 2) * 4, (blk // 2) * 4
            zz = zs[blk] if cbp_chroma == 2 else [0] * 15
            if cbp_chroma == 2:
                nc = _nc_of(nc_map, mbx * 2 + blk % 2, mby * 2 + blk // 2)
                encode_cavlc_block(b, zz, nc)
            nc_map[mby * 2 + blk // 2][mbx * 2 + blk % 2] = sum(1 for c in zz if c)
            wq = dequant4x4(unzig([0] + zz), qpc)
            wq[0, 0] = dcs_rec[blk // 2, blk % 2]
            resr = inv4x4(wq)
            plane[y0 + sy : y0 + sy + 4, x0 + sx : x0 + sx + 4] = _clip(
                pred8[sy : sy + 4, sx : sx + 4] + resr
            ).astype(np.uint8)
    return cbp_chroma


def _encode_idr(y, cb, cr, qp, mb_kinds, idr_pic_id=0):
    """One IDR slice RBSP + its reconstruction. ``mb_kinds``: optional
    per-MB list of 'i4' | 'i16' | 'pcm' (default alternates i16/i4);
    modes are chosen deterministically from the available set so every
    intra mode is exercised on a big enough frame. The encoder
    reconstructs through the decoder's dequant path, so the closed loop
    is bit-exact by construction."""
    y = np.asarray(y, np.uint8)
    cb = np.asarray(cb, np.uint8)
    cr = np.asarray(cr, np.uint8)
    h, w = y.shape
    assert h % 16 == 0 and w % 16 == 0
    n_mb_x, n_mb_y = w // 16, h // 16
    n_mbs = n_mb_x * n_mb_y
    if mb_kinds is None:
        mb_kinds = ["i16" if i % 2 == 0 else "i4" for i in range(n_mbs)]
    st = _FrameState(w, h)

    b = _BitWriter()
    b.ue(0)            # first_mb_in_slice
    b.ue(7)            # slice_type I
    b.ue(0)            # pps id
    b.u(0, 4)          # frame_num
    b.ue(idr_pic_id)
    b.u(0, 1)
    b.u(0, 1)
    b.se(qp - 26)      # slice_qp_delta
    cqo = 0

    for mb in range(n_mbs):
        mbx, mby = mb % n_mb_x, mb // n_mb_x
        kind = mb_kinds[mb]
        x0, y0 = mbx * 16, mby * 16
        if kind == "pcm":
            b.ue(25)
            b.align_zero()
            b.raw_bytes(y[y0 : y0 + 16, x0 : x0 + 16].tobytes())
            b.raw_bytes(cb[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8].tobytes())
            b.raw_bytes(cr[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8].tobytes())
            st.y[y0 : y0 + 16, x0 : x0 + 16] = y[y0 : y0 + 16, x0 : x0 + 16]
            st.cb[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = cb[
                y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8
            ]
            st.cr[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = cr[
                y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8
            ]
            for j in range(4):
                for i in range(4):
                    st.dec4[mby * 4 + j][mbx * 4 + i] = True
                    st.nc_y[mby * 4 + j][mbx * 4 + i] = 16
            for j in range(2):
                for i in range(2):
                    st.nc_cb[mby * 2 + j][mbx * 2 + i] = 16
                    st.nc_cr[mby * 2 + j][mbx * 2 + i] = 16
            st.dec16[mby][mbx] = True
            continue
        up = _avail(st.dec16, mbx, mby - 1)
        left = _avail(st.dec16, mbx - 1, mby)
        upleft = _avail(st.dec16, mbx - 1, mby - 1)
        chroma_modes = [0] + ([2] if up else []) + ([1] if left else []) + (
            [3] if up and left and upleft else []
        )
        chroma_mode = chroma_modes[mb % len(chroma_modes)]
        if kind == "i16":
            l_modes = [2] + ([0] if up else []) + ([1] if left else []) + (
                [3] if up and left and upleft else []
            )
            pred_mode = l_modes[mb % len(l_modes)]
            pred16 = pred_full(st.y, st.dec16, x0, y0, 16, pred_mode)
            res = y[y0 : y0 + 16, x0 : x0 + 16].astype(np.int64) - pred16
            acs, dc = [], np.zeros((4, 4), np.int64)
            for blk in range(16):
                ox, oy = _BLK_ORDER[blk]
                wblk = fwd4x4(res[oy * 4 : oy * 4 + 4, ox * 4 : ox * 4 + 4])
                dc[oy, ox] = wblk[0, 0]
                zz = zig(quant4x4(wblk, qp, skip_dc=True))[1:]
                acs.append(zz)
            cbp_luma = 15 if any(any(a) for a in acs) else 0
            # DC forward Hadamard + quant
            wd = _HAD @ dc @ _HAD
            qbits = 15 + qp // 6
            f2 = (1 << qbits) // 3
            zd = (np.sign(wd) * ((np.abs(wd) * _MF[qp % 6][0] + 2 * f2) >> (qbits + 1))).astype(np.int64)
            # mb_type needs cbp_chroma up front; the compute phase
            # mutates nothing (chroma pred reads neighbour MBs only),
            # the write phase below reuses its coefficients
            cpp, probe = _enc_chroma_compute(
                st, mbx, mby, cb, cr, chroma_mode, qp, cqo
            )
            mb_type = 1 + pred_mode + 4 * probe + (12 if cbp_luma else 0)
            b.ue(mb_type)
            b.ue(chroma_mode)
            b.se(0)  # mb_qp_delta
            nc0 = _nc_of(st.nc_y, mbx * 4, mby * 4)
            encode_cavlc_block(b, zig(zd), nc0)
            dcs_rec = dequant_dc_luma(zd, qp)
            for blk in range(16):
                ox, oy = _BLK_ORDER[blk]
                bx, by = mbx * 4 + ox, mby * 4 + oy
                zz = acs[blk] if cbp_luma else [0] * 15
                if cbp_luma:
                    nc = _nc_of(st.nc_y, bx, by)
                    encode_cavlc_block(b, zz, nc)
                st.nc_y[by][bx] = sum(1 for c in zz if c)
                wq = dequant4x4(unzig([0] + zz), qp)
                wq[0, 0] = dcs_rec[oy, ox]
                resr = inv4x4(wq)
                pb = pred16[oy * 4 : oy * 4 + 4, ox * 4 : ox * 4 + 4]
                st.y[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = _clip(
                    pb + resr
                ).astype(np.uint8)
                st.dec4[by][bx] = True
                st.mode4[by][bx] = 2
            _enc_chroma_write(b, st, mbx, mby, cpp, probe, qp, cqo)
            st.dec16[mby][mbx] = True
            continue
        # ---- I_4x4 ----
        st.is_i4[mby][mbx] = True
        # pass 1: per-block mode choice + transform with interleaved recon
        blocks = []
        for blk in range(16):
            ox, oy = _BLK_ORDER[blk]
            bx, by = mbx * 4 + ox, mby * 4 + oy
            avail = pred4x4_available_modes(st.dec4, bx * 4, by * 4)
            mode = avail[(mb + blk) % len(avail)]
            pred = pred4x4(st.y, st.dec4, bx * 4, by * 4, mode)
            res = (
                y[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4].astype(np.int64) - pred
            )
            zz = zig(quant4x4(fwd4x4(res), qp))
            blocks.append((mode, zz))
            # recon NOW (next block predicts from it)
            _recon_luma4(st, bx, by, pred, zz, qp)
            st.mode4[by][bx] = mode
        cbp_luma = 0
        for blk in range(16):
            ox, oy = _BLK_ORDER[blk]
            if any(blocks[blk][1]):
                cbp_luma |= 1 << ((oy // 2) * 2 + (ox // 2))
        cpp, probe = _enc_chroma_compute(
            st, mbx, mby, cb, cr, chroma_mode, qp, cqo
        )
        cbp = cbp_luma | (probe << 4)
        b.ue(0)  # mb_type I_4x4
        for blk in range(16):
            ox, oy = _BLK_ORDER[blk]
            bx, by = mbx * 4 + ox, mby * 4 + oy
            mode = blocks[blk][0]
            pm = _pred_mode_ctx(st, bx, by)
            if mode == pm:
                b.u(1, 1)
            else:
                b.u(0, 1)
                b.u(mode - 1 if mode > pm else mode, 3)
        b.ue(chroma_mode)
        b.ue(_ME_CBP_INTRA.index(cbp))
        if cbp > 0:
            b.se(0)  # mb_qp_delta
        for blk in range(16):
            ox, oy = _BLK_ORDER[blk]
            bx, by = mbx * 4 + ox, mby * 4 + oy
            i8 = (oy // 2) * 2 + (ox // 2)
            zz = blocks[blk][1]
            if cbp_luma & (1 << i8):
                nc = _nc_of(st.nc_y, bx, by)
                encode_cavlc_block(b, zz, nc)
            st.nc_y[by][bx] = sum(1 for c in zz if c)
        _enc_chroma_write(b, st, mbx, mby, cpp, probe, qp, cqo)
        st.dec16[mby][mbx] = True
    b.trailing()
    return b.tobytes(), st.y.copy(), st.cb.copy(), st.cr.copy()


def encode_h264_iframe(y, cb, cr, qp: int = 28, mb_kinds=None):
    """Conformant-syntax baseline IDR frame with TRANSFORM-CODED
    macroblocks (see _encode_idr). Returns
    (annexb_bytes, recon_y, recon_cb, recon_cr) — the recon planes are
    EXACTLY what decode_h264_iframe returns."""
    rbsp, ry, rcb, rcr = _encode_idr(y, cb, cr, qp, mb_kinds)
    h, w = np.asarray(y).shape
    sps_rbsp, pps_rbsp = _write_sps_pps(w, h)
    stream = _nal(7, 3, sps_rbsp) + _nal(8, 3, pps_rbsp) + _nal(5, 3, rbsp)
    return stream, ry, rcb, rcr


def encode_h264_stream(frames_y, frames_cb, frames_cr, qp: int = 28,
                       fps: float | None = None, mb_kinds=None):
    """Multi-IDR Annex B stream (one IDR per frame, alternating
    idr_pic_id) with VUI timing carrying ``fps`` — the full video source
    shape (round-4 known debt: single-IDR streams had no fps carrier).
    Returns (annexb_bytes, [(y, cb, cr) recon per frame])."""
    frames_y = [np.asarray(f, np.uint8) for f in frames_y]
    h, w = frames_y[0].shape
    sps_rbsp, pps_rbsp = _write_sps_pps(w, h, fps=fps)
    stream = _nal(7, 3, sps_rbsp) + _nal(8, 3, pps_rbsp)
    recons = []
    for k, (fy, fcb, fcr) in enumerate(zip(frames_y, frames_cb, frames_cr)):
        rbsp, ry, rcb, rcr = _encode_idr(fy, fcb, fcr, qp, mb_kinds, k % 2)
        stream += _nal(5, 3, rbsp)
        recons.append((ry, rcb, rcr))
    return stream, recons



def encode_h264_i16(y, cb, cr, qp: int = 28):
    """All-I_16x16 transform-coded IDR frame."""
    n = (y.shape[0] // 16) * (y.shape[1] // 16)
    return encode_h264_iframe(y, cb, cr, qp, ["i16"] * n)


def encode_h264_i4(y, cb, cr, qp: int = 28):
    """All-I_4x4 transform-coded IDR frame (all 9 4x4 modes cycled)."""
    n = (y.shape[0] // 16) * (y.shape[1] // 16)
    return encode_h264_iframe(y, cb, cr, qp, ["i4"] * n)
