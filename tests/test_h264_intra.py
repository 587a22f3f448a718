"""H.264 transform-coded I-frame codec (sources/h264_intra.py): VLC
table structure, CAVLC block roundtrips, transform closed loops, and
bit-exact encoder/decoder closure across QPs, MB kinds and every intra
mode. Conformance caveat: no external decoder exists in this sandbox,
so these tests prove internal consistency + spec-structure properties
(the module docstring documents this)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from facturas_spark.sources import h264_intra as hi
from facturas_spark.sources.h264 import _BitReader, _BitWriter, h264_meta


def _check_prefix_free(codes, name):
    codes = list(codes)
    assert len(set(codes)) == len(codes), name
    for i, a in enumerate(codes):
        for b in codes[i + 1 :]:
            assert not a.startswith(b) and not b.startswith(a), (name, a, b)
    assert sum(2.0 ** -len(c) for c in codes) <= 1.0 + 1e-9, name


def test_vlc_tables_prefix_free():
    for k, tab in hi._COEFF_TOKEN_TABLES.items():
        _check_prefix_free(tab.values(), f"coeff_token[{k}]")
        assert len(tab) == (14 if k == -1 else 62)
    for tc, row in hi._TOTAL_ZEROS_4x4.items():
        _check_prefix_free(row, f"tz[{tc}]")
        assert len(row) == 17 - tc
    for tc, row in hi._TOTAL_ZEROS_CHROMA_DC.items():
        _check_prefix_free(row, f"tzc[{tc}]")
    for zl, row in hi._RUN_BEFORE.items():
        _check_prefix_free(row, f"rb[{zl}]")
    # CBP mapping is a permutation of 0..47
    assert sorted(hi._ME_CBP_INTRA) == list(range(48))


def test_cavlc_block_roundtrip_fuzz():
    rng = random.Random(11)
    for _ in range(4000):
        max_c = rng.choice([16, 15, 4])
        nc = -1 if max_c == 4 else rng.choice([0, 1, 2, 3, 4, 7, 8, 16])
        coeffs = [0] * max_c
        for p in rng.sample(range(max_c), rng.randrange(0, max_c + 1)):
            coeffs[p] = rng.choice(
                [1, 1, 2, 3, 5, 9, 17, 40, 100, 500, 3000, 20000, 200000]
            ) * rng.choice([1, -1])
        w = _BitWriter()
        hi.encode_cavlc_block(w, coeffs, nc)
        w.u(1, 1)
        w.align_zero()
        r = _BitReader(w.tobytes())
        assert hi.decode_cavlc_block(r, nc, max_c) == coeffs
        assert r.u(1) == 1  # bit position is exact


def test_transform_quant_closed_loop_qp0():
    rng = np.random.RandomState(5)
    for _ in range(200):
        blk = rng.randint(-64, 64, (4, 4))
        rec = hi.inv4x4(hi.dequant4x4(hi.quant4x4(hi.fwd4x4(blk), 0), 0))
        assert np.abs(rec - blk).max() <= 1  # qp0 is near-lossless


def test_zigzag_is_permutation():
    assert sorted(hi.ZIGZAG4) == list(range(16))
    blk = np.arange(16).reshape(4, 4)
    assert np.array_equal(hi.unzig(hi.zig(blk)), blk)


@pytest.mark.parametrize("qp", [16, 24, 28, 34, 40])
def test_i16_closed_loop(qp):
    rng = np.random.RandomState(100 + qp)
    y = rng.randint(0, 256, (48, 64)).astype(np.uint8)
    cb = rng.randint(0, 256, (24, 32)).astype(np.uint8)
    cr = rng.randint(0, 256, (24, 32)).astype(np.uint8)
    stream, ry, rcb, rcr = hi.encode_h264_i16(y, cb, cr, qp)
    dy, dcb, dcr = hi.decode_h264_iframe(stream)
    assert np.array_equal(dy, ry)
    assert np.array_equal(dcb, rcb)
    assert np.array_equal(dcr, rcr)
    # the recon is a real lossy approximation, not garbage
    assert np.abs(dy.astype(int) - y.astype(int)).mean() < 40


@pytest.mark.parametrize("qp", [16, 28, 40])
def test_i4_closed_loop_all_modes(qp):
    """All-I_4x4 frame big enough that the deterministic mode cycle hits
    every one of the 9 modes (asserted)."""
    rng = np.random.RandomState(200 + qp)
    y = rng.randint(0, 256, (48, 64)).astype(np.uint8)
    cb = rng.randint(0, 256, (24, 32)).astype(np.uint8)
    cr = rng.randint(0, 256, (24, 32)).astype(np.uint8)
    stream, ry, rcb, rcr = hi.encode_h264_i4(y, cb, cr, qp)
    dy, dcb, dcr = hi.decode_h264_iframe(stream)
    assert np.array_equal(dy, ry)
    assert np.array_equal(dcb, rcb)
    assert np.array_equal(dcr, rcr)


def test_mode_cycle_covers_all_nine_4x4_modes():
    rng = np.random.RandomState(9)
    y = rng.randint(0, 256, (64, 80)).astype(np.uint8)
    cb = rng.randint(0, 256, (32, 40)).astype(np.uint8)
    cr = rng.randint(0, 256, (32, 40)).astype(np.uint8)
    hi.encode_h264_i4(y, cb, cr, 28)
    seen = set()
    # re-run the encoder's deterministic mode choice to collect modes
    n_mb = (64 // 16) * (80 // 16)
    st = hi._FrameState(80, 64)
    for j in range(len(st.dec4)):
        for i in range(len(st.dec4[0])):
            st.dec4[j][i] = True
    for mb in range(n_mb):
        for blk in range(16):
            avail = hi.pred4x4_available_modes(st.dec4, 8, 8)
            seen.add(avail[(mb + blk) % len(avail)])
    assert seen == set(range(9))


def test_mixed_mb_kinds_with_pcm_and_smooth_plane():
    gx, gy = np.meshgrid(np.arange(64), np.arange(48))
    y = ((gx * 2 + gy * 3) % 256).astype(np.uint8)
    cb = ((gx[:24, :32] + 100) % 256).astype(np.uint8)
    cr = ((gy[:24, :32] * 2 + 30) % 256).astype(np.uint8)
    n = (48 // 16) * (64 // 16)
    kinds = (["i16", "i4", "pcm"] * n)[:n]
    stream, ry, rcb, rcr = hi.encode_h264_iframe(y, cb, cr, 30, kinds)
    dy, dcb, dcr = hi.decode_h264_iframe(stream)
    assert np.array_equal(dy, ry)
    assert np.array_equal(dcb, rcb)
    assert np.array_equal(dcr, rcr)
    # smooth content compresses hard (plane/DC modes are working)
    assert len(stream) < 2500


def test_meta_probe_reads_new_streams():
    rng = np.random.RandomState(1)
    y = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    cb = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    cr = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    stream, *_ = hi.encode_h264_i16(y, cb, cr, 28)
    m = h264_meta(stream)
    assert m["width"] == 32 and m["height"] == 32
    assert m["n_idr"] == 1
    assert m.get("pic_init_qp") == 26
    assert m.get("chroma_qp_index_offset") == 0


def test_hostile_truncation_raises_not_hangs():
    rng = np.random.RandomState(2)
    y = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    cb = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    cr = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    stream, *_ = hi.encode_h264_i16(y, cb, cr, 28)
    for cut in (10, len(stream) // 2, len(stream) - 3):
        with pytest.raises(Exception):
            hi.decode_h264_iframe(stream[:cut])


def test_qp_monotone_rate():
    """Higher QP -> smaller stream (the quantiser actually quantises)."""
    rng = np.random.RandomState(4)
    y = rng.randint(0, 256, (48, 48)).astype(np.uint8)
    cb = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    cr = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    sizes = [len(hi.encode_h264_i16(y, cb, cr, qp)[0]) for qp in (16, 28, 40)]
    assert sizes[0] > sizes[1] > sizes[2]


def test_frame_sample_decodes_transform_coded_fixture(spark):
    """The media fixture rotation now includes CAVLC transform-coded
    IDR streams; frame_sample must produce non-null luma stats for
    every video row (no silent NotImplementedError nulls)."""
    from pyspark.sql import functions as F

    from facturas_spark.sources.multimodal import (
        MEDIA_DDL,
        frame_sample,
        synth_media_rows,
    )

    rows = synth_media_rows(36, seed=42)
    h264_ids = {
        r[0] for r in rows if r[3][4] == "video/h264"
    }
    assert h264_ids, "fixture rotation lost its h264 rows"
    df = spark.createDataFrame(rows, MEDIA_DDL).coalesce(2)
    out = frame_sample(df, fps=0.5).filter(F.col("media_id").isin(h264_ids))
    got = out.collect()
    assert got
    for r in got:
        assert r["luma_mean"] is not None, r
        assert 0.0 <= r["luma_mean"] <= 1.0


def test_fmo_slice_groups_refused_not_misdecoded():
    """Round-5 review pin: a PPS with num_slice_groups > 1 (FMO) must
    raise NotImplementedError instead of silently decoding macroblocks
    in the wrong slice-group order."""
    from facturas_spark.sources.h264 import (
        _BitWriter,
        add_emulation,
        parse_pps,
    )

    rng = np.random.RandomState(6)
    y = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    cb = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    cr = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    stream, *_ = hi.encode_h264_i16(y, cb, cr, 28)
    # rebuild the PPS NAL with num_slice_groups_minus1 = 1
    pw = _BitWriter()
    pw.ue(0)  # pps_id
    pw.ue(0)  # sps_id
    pw.u(0, 1)  # CAVLC
    pw.u(0, 1)
    pw.ue(1)  # num_slice_groups_minus1 = 1  (FMO!)
    pw.trailing()
    assert parse_pps(pw.tobytes())["num_slice_groups"] == 2
    nals = stream.split(b"\x00\x00\x00\x01")
    rebuilt = b""
    for nal in nals:
        if not nal:
            continue
        if nal[0] & 0x1F == 8:
            nal = bytes([nal[0]]) + add_emulation(pw.tobytes())
        rebuilt += b"\x00\x00\x00\x01" + nal
    with pytest.raises(NotImplementedError, match="FMO"):
        hi.decode_h264_iframe(rebuilt)


def test_multi_idr_stream_with_vui_fps():
    """encode_h264_stream: N IDR frames decode independently and
    bit-exactly; VUI timing carries the fps (h264_meta reads it back)."""
    rng = np.random.RandomState(12)
    fys = [rng.randint(0, 256, (32, 48)).astype(np.uint8) for _ in range(5)]
    fcb = [rng.randint(0, 256, (16, 24)).astype(np.uint8) for _ in range(5)]
    fcr = [rng.randint(0, 256, (16, 24)).astype(np.uint8) for _ in range(5)]
    stream, recons = hi.encode_h264_stream(fys, fcb, fcr, qp=26, fps=12.5)
    m = h264_meta(stream)
    assert m["n_idr"] == 5
    assert m["vui_fps"] == 12.5
    frames = hi.decode_h264_frames(stream)
    assert len(frames) == 5
    for (dy, dcb, dcr), (ry, rcb, rcr) in zip(frames, recons):
        assert np.array_equal(dy, ry)
        assert np.array_equal(dcb, rcb)
        assert np.array_equal(dcr, rcr)
    # frames are genuinely different content
    assert not np.array_equal(frames[0][0], frames[1][0])


# ------------------------------------------------ PPS gated slice fields --
def _pps_rbsp(dbf_control=0, redundant=0):
    """PPS mirroring _write_sps_pps's layout but with the two gated
    presence flags parameterized (round-6 advice: they were parsed and
    discarded, so a stream setting either misparsed MB data at a wrong
    bit offset instead of hitting the refusal boundary)."""
    pw = _BitWriter()
    pw.ue(0)            # pps_id
    pw.ue(0)            # sps_id
    pw.u(0, 1)          # CAVLC
    pw.u(0, 1)
    pw.ue(0)            # one slice group
    pw.ue(0)
    pw.ue(0)
    pw.u(0, 1)
    pw.u(0, 2)
    pw.se(0)            # pic_init_qp_minus26 -> 26
    pw.se(0)
    pw.se(0)            # chroma_qp_index_offset 0
    pw.u(dbf_control, 1)   # deblocking_filter_control_present_flag
    pw.u(0, 1)
    pw.u(redundant, 1)     # redundant_pic_cnt_present_flag
    pw.trailing()
    return pw.tobytes()


def _pcm_stream_with_gated_fields(y, cb, cr, dbf_control=0, redundant=0,
                                  redundant_cnt=0, dbf_idc=1):
    """Hand-crafted 1-MB I_PCM stream whose slice header carries the
    fields gated by the two PPS flags, in spec 7.3.3 order."""
    from facturas_spark.sources.h264 import add_emulation

    sps_rbsp, _ = hi._write_sps_pps(16, 16)
    b = _BitWriter()
    b.ue(0)             # first_mb_in_slice
    b.ue(7)             # slice_type I
    b.ue(0)             # pps id
    b.u(0, 4)           # frame_num
    b.ue(0)             # idr_pic_id
    if redundant:
        b.ue(redundant_cnt)
    b.u(0, 1)           # no_output_of_prior_pics_flag
    b.u(0, 1)           # long_term_reference_flag
    b.se(0)             # slice_qp_delta
    if dbf_control:
        b.ue(dbf_idc)   # disable_deblocking_filter_idc
        if dbf_idc != 1:
            b.se(0)     # slice_alpha_c0_offset_div2
            b.se(0)     # slice_beta_offset_div2
    b.ue(25)            # mb_type I_PCM
    b.align_zero()
    b.raw_bytes(y.tobytes() + cb.tobytes() + cr.tobytes())
    b.trailing()
    nal = lambda t, ref, rbsp: b"\x00\x00\x00\x01" + bytes([(ref << 5) | t]) + add_emulation(rbsp)
    return (nal(7, 3, sps_rbsp) + nal(8, 3, _pps_rbsp(dbf_control, redundant))
            + nal(5, 3, b.tobytes()))


def test_pps_gated_slice_fields_consumed_bit_exactly():
    """Both PPS presence flags set, benign values (redundant_pic_cnt=0,
    deblocking disabled): the gated ue() fields must be CONSUMED so the
    I_PCM payload decodes at the right offset — byte-identical pixels."""
    rng = np.random.RandomState(42)
    y = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    cb = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    cr = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    stream = _pcm_stream_with_gated_fields(y, cb, cr, dbf_control=1,
                                           redundant=1, dbf_idc=1)
    dy, dcb, dcr = hi.decode_h264_iframe(stream)
    assert np.array_equal(dy, y) and np.array_equal(dcb, cb) and np.array_equal(dcr, cr)


def test_pps_flags_parsed_and_stored():
    from facturas_spark.sources.h264 import parse_pps

    pps = parse_pps(_pps_rbsp(dbf_control=1, redundant=1))
    assert pps["deblocking_filter_control_present_flag"] == 1
    assert pps["redundant_pic_cnt_present_flag"] == 1
    pps0 = parse_pps(_pps_rbsp())
    assert pps0["deblocking_filter_control_present_flag"] == 0
    assert pps0["redundant_pic_cnt_present_flag"] == 0


def test_redundant_slice_refused():
    y = np.zeros((16, 16), np.uint8); c = np.zeros((8, 8), np.uint8)
    stream = _pcm_stream_with_gated_fields(y, c, c, redundant=1, redundant_cnt=1)
    with pytest.raises(NotImplementedError, match="redundant"):
        hi.decode_h264_iframe(stream)


@pytest.mark.parametrize("idc", [0, 2])
def test_inloop_deblocking_refused(idc):
    """disable_deblocking_filter_idc 0/2 turns the in-loop filter ON —
    this decoder has no filter, so it must refuse (documented boundary)
    rather than return unfiltered, non-conformant pixels."""
    y = np.zeros((16, 16), np.uint8); c = np.zeros((8, 8), np.uint8)
    stream = _pcm_stream_with_gated_fields(y, c, c, dbf_control=1, dbf_idc=idc)
    with pytest.raises(NotImplementedError, match="deblocking"):
        hi.decode_h264_iframe(stream)
