"""Pure-stdlib H.264/AVC (ITU-T H.264 / ISO 14496-10) subset codec.

What is REAL here — and what is not — for the multimodal column story:

- REAL: Annex B byte-stream parsing (start codes, emulation-prevention
  stripping), exp-Golomb bit I/O, full SPS parsing (profile/level,
  chroma_format_idc for High profiles, frame cropping) and PPS parsing.
  This is the part a 100 TB video corpus actually needs at scan time:
  ``h264_meta`` extracts width/height/profile/level from the first bytes
  of ANY conformant Annex B stream — ffmpeg-free metadata extraction.
- SUBSET here: pixel decode in THIS module covers I_PCM macroblocks
  only (mb_type 25 — uncompressed samples carried inside the
  bitstream); the matching encoder emits conformant baseline IDR
  frames of I_PCM macroblocks so encode->decode roundtrips bit-exactly.
- TRANSFORM DECODE (round 5): ``sources/h264_intra.py`` extends this to
  real CAVLC transform-coded I frames — I_16x16 and I_4x4 macroblocks,
  all intra prediction modes, dequant + inverse integer transform —
  with a matching encoder that closes the loop bit-exactly. Remaining
  boundary: CABAC entropy coding and P/B slices raise
  NotImplementedError (the multimodal failure boundary nulls them).

No external deps: bytes + struct only.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "split_annexb",
    "strip_emulation",
    "add_emulation",
    "parse_sps",
    "parse_pps",
    "h264_meta",
    "encode_h264_ipcm",
    "decode_h264_ipcm",
]


# ----------------------------------------------------------------- bits --
class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            bit = (byte >> (7 - (self.pos & 7))) & 1
            v = (v << 1) | bit
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("invalid exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def align(self) -> None:
        while self.pos & 7:
            if self.u(1) != 0:
                raise ValueError("nonzero pcm_alignment bit")

    def bytes_(self, n: int) -> bytes:
        assert (self.pos & 7) == 0
        start = self.pos >> 3
        self.pos += n * 8
        return self.data[start : start + n]


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        code = v + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self) -> None:
        while len(self.bits) & 7:
            self.bits.append(0)

    def raw_bytes(self, b: bytes) -> None:
        assert (len(self.bits) & 7) == 0
        for byte in b:
            self.u(byte, 8)

    def trailing(self) -> None:
        """rbsp_stop_one_bit + pad."""
        self.bits.append(1)
        while len(self.bits) & 7:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        assert (len(self.bits) & 7) == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for b in self.bits[i : i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


# ------------------------------------------------------------ Annex B I/O --
def strip_emulation(ebsp: bytes) -> bytes:
    """EBSP -> RBSP: remove emulation_prevention_three_byte (00 00 03)."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(ebsp):
        b = ebsp[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def add_emulation(rbsp: bytes) -> bytes:
    """RBSP -> EBSP: insert 00 00 03 before any 00 00 0x (x <= 3)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def split_annexb(payload: bytes) -> list[bytes]:
    """Split an Annex B byte stream into raw NAL units (EBSP, header
    byte included; start codes removed)."""
    data = bytes(payload)
    nals = []
    i = 0
    n = len(data)
    starts = []
    while i < n - 2:
        if data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 1:
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    for k, s in enumerate(starts):
        end = len(data) if k + 1 == len(starts) else starts[k + 1] - 3
        # a 4-byte start code leaves one trailing zero on the previous NAL
        while end > s and data[end - 1] == 0:
            end -= 1
        nals.append(data[s:end])
    return nals


# ------------------------------------------------------------- SPS / PPS --
def parse_sps(rbsp: bytes) -> dict:
    """Parse a seq_parameter_set RBSP (header byte stripped) to dims +
    profile. Handles High-profile chroma_format_idc and frame cropping."""
    r = _BitReader(rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    sps_id = r.ue()
    chroma_format_idc = 1
    if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135):
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            raise NotImplementedError("scaling matrices not supported")
    log2_max_frame_num_minus4 = r.ue()
    pic_order_cnt_type = r.ue()
    log2_max_poc_lsb = 0
    if pic_order_cnt_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif pic_order_cnt_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only_flag = r.u(1)
    if not frame_mbs_only_flag:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # VUI: walk the optional blocks up to timing_info — that carries the
    # ONLY in-stream fps for IDR-only streams (round-4 known debt)
    vui_fps = None
    try:
        if r.u(1):  # vui_parameters_present_flag
            if r.u(1):  # aspect_ratio_info_present_flag
                if r.u(8) == 255:  # Extended_SAR
                    r.u(32)
            if r.u(1):  # overscan_info_present_flag
                r.u(1)
            if r.u(1):  # video_signal_type_present_flag
                r.u(4)  # format(3) + full_range(1)
                if r.u(1):  # colour_description_present_flag
                    r.u(24)
            if r.u(1):  # chroma_loc_info_present_flag
                r.ue()
                r.ue()
            if r.u(1):  # timing_info_present_flag
                num_units = r.u(32)
                time_scale = r.u(32)
                r.u(1)  # fixed_frame_rate_flag
                if num_units > 0:
                    # frame rate = time_scale / (2 * num_units_in_tick)
                    vui_fps = time_scale / (2.0 * num_units)
    except (IndexError, ValueError):
        vui_fps = None  # truncated VUI: fps simply unknown
    # crop units for 4:2:0 progressive: x2 horizontally, x2 vertically
    sub_w = 2 if chroma_format_idc in (1, 2) else 1
    sub_h = 2 if chroma_format_idc == 1 else 1
    height_mult = 1 if frame_mbs_only_flag else 2
    width = pic_width_in_mbs * 16 - sub_w * (crop_l + crop_r)
    height = height_mult * pic_height_in_map_units * 16 - sub_h * (
        crop_t + crop_b
    ) * height_mult
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "sps_id": sps_id,
        "chroma_format_idc": chroma_format_idc,
        "log2_max_frame_num": log2_max_frame_num_minus4 + 4,
        "pic_order_cnt_type": pic_order_cnt_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "width": width,
        "height": height,
        "vui_fps": vui_fps,
        "pic_width_in_mbs": pic_width_in_mbs,
        "pic_height_in_mbs": pic_height_in_map_units * height_mult,
    }


def parse_pps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    out = {
        "pps_id": r.ue(),
        "sps_id": r.ue(),
        "entropy_coding_mode": r.u(1),  # 0 = CAVLC, 1 = CABAC
    }
    # the rest is needed by the transform decoder (h264_intra); parse
    # best-effort so a truncated PPS still yields the id fields
    try:
        r.u(1)  # bottom_field_pic_order_in_frame_present_flag
        out["num_slice_groups"] = r.ue() + 1
        if out["num_slice_groups"] != 1:
            # FMO: slice_group_map syntax follows that we do not parse —
            # stop here with the flag recorded; the transform decoder
            # refuses such streams instead of decoding MBs in the wrong
            # slice-group order (round-5 review: a raise here would be
            # swallowed by this very except)
            return out
        r.ue()  # num_ref_idx_l0_default_active_minus1
        r.ue()  # num_ref_idx_l1_default_active_minus1
        r.u(1)  # weighted_pred_flag
        r.u(2)  # weighted_bipred_idc
        out["pic_init_qp"] = 26 + r.se()
        r.se()  # pic_init_qs_minus26
        out["chroma_qp_index_offset"] = r.se()
        out["deblocking_filter_control_present_flag"] = r.u(1)
        r.u(1)  # constrained_intra_pred_flag
        out["redundant_pic_cnt_present_flag"] = r.u(1)
    except (ValueError, IndexError):
        pass
    return out


def h264_meta(payload: bytes) -> dict:
    """Scan-time metadata from an Annex B stream: profile, level, dims,
    NAL census. Works on ANY conformant stream (only the SPS is decoded;
    no pixel work) — the ffmpeg-free width/height probe for binary video
    columns at corpus scale."""
    nals = split_annexb(payload)
    meta: dict = {"n_nals": len(nals), "n_idr": 0, "n_slices": 0}
    for nal in nals:
        if not nal:
            continue
        nal_type = nal[0] & 0x1F
        # malformed parameter sets (truncated bitstream, garbage after a
        # start code) are recorded, never raised — the probe must survive
        # hostile payloads like every other codec header parser here
        if nal_type == 7 and "width" not in meta:
            try:
                meta.update(parse_sps(strip_emulation(nal[1:])))
            except Exception:
                meta["sps_error"] = True
        elif nal_type == 8 and "pps_id" not in meta:
            try:
                meta.update(parse_pps(strip_emulation(nal[1:])))
            except Exception:
                meta["pps_error"] = True
        elif nal_type == 5:
            meta["n_idr"] += 1
            meta["n_slices"] += 1
        elif nal_type == 1:
            meta["n_slices"] += 1
    return meta


# ----------------------------------------------------------- I_PCM codec --
def encode_h264_ipcm(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> bytes:
    """Conformant baseline (profile 66) Annex B stream: SPS + PPS + one
    IDR frame of I_PCM macroblocks (4:2:0, dims multiple of 16)."""
    h, w = y.shape
    assert h % 16 == 0 and w % 16 == 0, "I_PCM encoder needs multiple-of-16 dims"
    assert cb.shape == (h // 2, w // 2) and cr.shape == (h // 2, w // 2)

    def nal(nal_type: int, ref_idc: int, rbsp: bytes) -> bytes:
        header = bytes([(ref_idc << 5) | nal_type])
        return b"\x00\x00\x00\x01" + header + add_emulation(rbsp)

    # --- SPS ---
    sw = _BitWriter()
    sw.u(66, 8)          # profile_idc: baseline
    sw.u(0xC0, 8)        # constraint_set0/1, reserved zero
    sw.u(10, 8)          # level_idc 1.0
    sw.ue(0)             # sps_id
    sw.ue(0)             # log2_max_frame_num_minus4 -> 4 bits
    sw.ue(2)             # pic_order_cnt_type 2 (no extra fields)
    sw.ue(1)             # max_num_ref_frames
    sw.u(0, 1)           # gaps_in_frame_num_value_allowed_flag
    sw.ue(w // 16 - 1)   # pic_width_in_mbs_minus1
    sw.ue(h // 16 - 1)   # pic_height_in_map_units_minus1
    sw.u(1, 1)           # frame_mbs_only_flag
    sw.u(0, 1)           # direct_8x8_inference_flag
    sw.u(0, 1)           # frame_cropping_flag
    sw.u(0, 1)           # vui_parameters_present_flag
    sw.trailing()

    # --- PPS ---
    pw = _BitWriter()
    pw.ue(0)             # pps_id
    pw.ue(0)             # sps_id
    pw.u(0, 1)           # entropy_coding_mode_flag: CAVLC
    pw.u(0, 1)           # bottom_field_pic_order_in_frame_present_flag
    pw.ue(0)             # num_slice_groups_minus1
    pw.ue(0)             # num_ref_idx_l0_default_active_minus1
    pw.ue(0)             # num_ref_idx_l1_default_active_minus1
    pw.u(0, 1)           # weighted_pred_flag
    pw.u(0, 2)           # weighted_bipred_idc
    pw.se(0)             # pic_init_qp_minus26
    pw.se(0)             # pic_init_qs_minus26
    pw.se(0)             # chroma_qp_index_offset
    pw.u(0, 1)           # deblocking_filter_control_present_flag
    pw.u(0, 1)           # constrained_intra_pred_flag
    pw.u(0, 1)           # redundant_pic_cnt_present_flag
    pw.trailing()

    # --- IDR slice, every MB I_PCM ---
    b = _BitWriter()
    b.ue(0)              # first_mb_in_slice
    b.ue(7)              # slice_type: I (all slices of pic)
    b.ue(0)              # pic_parameter_set_id
    b.u(0, 4)            # frame_num (log2_max_frame_num = 4)
    b.ue(0)              # idr_pic_id
    # pic_order_cnt_type 2: nothing
    # dec_ref_pic_marking (IDR):
    b.u(0, 1)            # no_output_of_prior_pics_flag
    b.u(0, 1)            # long_term_reference_flag
    b.se(0)              # slice_qp_delta
    for mby in range(h // 16):
        for mbx in range(w // 16):
            b.ue(25)     # mb_type: I_PCM
            b.align_zero()
            yblk = y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16]
            b.raw_bytes(yblk.astype(np.uint8).tobytes())
            for plane in (cb, cr):
                cblk = plane[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8]
                b.raw_bytes(cblk.astype(np.uint8).tobytes())
    b.trailing()

    return (
        nal(7, 3, sw.tobytes())
        + nal(8, 3, pw.tobytes())
        + nal(5, 3, b.tobytes())
    )


def decode_h264_ipcm(payload: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode an Annex B stream whose IDR slice is all-I_PCM back to
    (y, cb, cr) planes. Raises NotImplementedError on transform-coded
    macroblocks (any mb_type other than I_PCM) — the documented subset
    boundary."""
    sps = None
    slice_nal = None
    for nal in split_annexb(payload):
        if not nal:
            continue
        t = nal[0] & 0x1F
        if t == 7:
            sps = parse_sps(strip_emulation(nal[1:]))
        elif t == 5 and slice_nal is None:
            slice_nal = strip_emulation(nal[1:])
    if sps is None or slice_nal is None:
        raise ValueError("stream lacks SPS or IDR slice")
    if sps["chroma_format_idc"] != 1:
        raise NotImplementedError("only 4:2:0 supported")
    w, h = sps["width"], sps["height"]
    y = np.zeros((h, w), np.uint8)
    cb = np.zeros((h // 2, w // 2), np.uint8)
    cr = np.zeros((h // 2, w // 2), np.uint8)

    r = _BitReader(slice_nal)
    first_mb = r.ue()
    slice_type = r.ue()
    if slice_type % 5 != 2:
        raise NotImplementedError("only I slices supported")
    r.ue()  # pps id
    r.u(sps["log2_max_frame_num"])  # frame_num
    r.ue()  # idr_pic_id
    if sps["pic_order_cnt_type"] == 0:
        raise NotImplementedError("pic_order_cnt_type 0 not emitted by encoder")
    r.u(1)
    r.u(1)
    r.se()  # slice_qp_delta
    n_mbs = (w // 16) * (h // 16)
    for mb in range(first_mb, n_mbs):
        mb_type = r.ue()
        if mb_type != 25:
            raise NotImplementedError(
                f"transform-coded macroblock (mb_type {mb_type}) — "
                "I_PCM-only decoder"
            )
        r.align()
        mbx, mby = mb % (w // 16), mb // (w // 16)
        yblk = np.frombuffer(r.bytes_(256), np.uint8).reshape(16, 16)
        y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16] = yblk
        cbb = np.frombuffer(r.bytes_(64), np.uint8).reshape(8, 8)
        crb = np.frombuffer(r.bytes_(64), np.uint8).reshape(8, 8)
        cb[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = cbb
        cr[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = crb
    return y, cb, cr
