"""Parity of the device quantizer + native entropy scan vs hzcc.c."""
import ctypes as C

import numpy as np
import pytest

import oracle
from dsv2_tpu.core import constants as K
from dsv2_tpu.core import intmath as im
from dsv2_tpu.ops import sbt, hzcc
from dsv2_tpu.bitstream import BitWriter, BitReader
from dsv2_tpu.codec import plane as planecode


@pytest.fixture(scope="module")
def lib(ref_build):
    return oracle.load()


def run_case(lib, cw, ch, is_luma, isP, lossless, psy, q, seed, subsamp=K.SUBSAMP_420):
    rng = np.random.default_rng(seed)
    blk = 16
    vid_w = cw if is_luma else cw << K.fmt_h_shift(subsamp)
    vid_h = ch if is_luma else ch << K.fmt_v_shift(subsamp)
    nbh = im.udiv_round_up(vid_w, blk)
    nbv = im.udiv_round_up(vid_h, blk)

    meta = oracle.RefMeta()
    meta.width, meta.height = vid_w, vid_h
    meta.subsamp = subsamp
    meta.fps_num, meta.fps_den = 30, 1
    params = oracle.mk_params(lib, meta, blk, blk, isP=isP, lossless=lossless,
                              do_psy=psy)
    blockdata = np.ascontiguousarray(
        rng.integers(0, 128, (nbv, nbh), dtype=np.uint8))
    mvs = (oracle.RefMV * (nbh * nbv))()
    mvx = rng.integers(-60, 60, nbh * nbv).astype(np.int16)
    mvy = rng.integers(-60, 60, nbh * nbv).astype(np.int16)
    mvflags = rng.integers(0, 256, nbh * nbv).astype(np.uint32)
    for i in range(nbh * nbv):
        mvs[i].all = (int(mvy[i]) << 16) | (int(mvx[i]) & 0xFFFF)
        mvs[i].flags = int(mvflags[i])

    fm = oracle.RefFMeta()
    fm.params = C.pointer(params)
    fm.mvs = C.cast(mvs, C.POINTER(oracle.RefMV))
    fm.blockdata = blockdata.ctypes.data_as(C.POINTER(C.c_uint8))
    fm.cur_plane = 0 if is_luma else 1
    fm.isP = 1 if isP else 0
    fm.fnum = 0

    # realistic coefficients: forward transform of random pixels
    px = rng.integers(0, 256, (ch, cw)).astype(np.int32) - 128
    scfg = sbt.SbtCfg(cw, ch, is_luma, isP, lossless, nbh, nbv)
    coefs = np.asarray(sbt.make_fwd_sbt(scfg)(px, blockdata))

    # --- oracle encode ---
    ref_coefs = np.ascontiguousarray(coefs.copy())
    cref = C.cast((C.c_void_p * 3)(), C.POINTER(oracle.RefCoefs))
    rc = oracle.RefCoefs()
    rc.data = ref_coefs.ctypes.data_as(C.POINTER(C.c_int32))
    rc.width, rc.height = cw, ch
    buf = np.zeros(cw * ch * 16 + 4096, dtype=np.uint8)
    bs = oracle.RefBS(buf.ctypes.data_as(C.POINTER(C.c_uint8)), 0)
    lib.dsv_encode_plane(C.byref(bs), C.byref(rc), q, C.byref(fm))
    ref_bytes = buf[:bs.pos // 8].tobytes()

    # --- ours ---
    hcfg = hzcc.HzccCfg(cw, ch, is_luma, isP, lossless, nbh, nbv, blk, blk,
                        vid_w, vid_h, subsamp, psy)
    eprm_m = ((mvflags & (1 << K.MV_BIT_EPRM)) != 0).reshape(nbv, nbh)
    mlt_m = (((mvflags & (1 << K.MV_BIT_MAINTAIN)) != 0)
             & (np.abs(mvx) < 32) & (np.abs(mvy) < 32)).reshape(nbv, nbh)
    deq, v_scan = hzcc.make_quantize(hcfg)(coefs, blockdata, eprm_m, mlt_m,
                                           np.int32(q))
    deq = np.asarray(deq)
    v_scan = np.asarray(v_scan)
    np.testing.assert_array_equal(deq, ref_coefs, err_msg="dequant writeback")

    w = BitWriter()
    planecode.encode_plane(w, deq, v_scan, int(coefs[0, 0]), cw, ch)
    assert w.data() == ref_bytes, "plane bitstream mismatch"

    # --- oracle decode ---
    dec_coefs = np.zeros((ch, cw), dtype=np.int32)
    rc2 = oracle.RefCoefs()
    rc2.data = dec_coefs.ctypes.data_as(C.POINTER(C.c_int32))
    rc2.width, rc2.height = cw, ch
    bs2 = oracle.RefBS(buf.ctypes.data_as(C.POINTER(C.c_uint8)), 0)
    okref = lib.dsv_decode_plane(C.byref(bs2), C.byref(rc2), q, C.byref(fm))
    assert okref == 1

    r = BitReader(ref_bytes)
    ok, ll, v_dec = planecode.decode_plane(r, cw, ch)
    assert ok
    out = hzcc.make_dequantize(hcfg)(v_dec, blockdata, np.int32(q),
                                     np.int32(ll))
    np.testing.assert_array_equal(np.asarray(out), dec_coefs,
                                  err_msg="decode dequant")
    assert r.byte_pos == bs2.pos // 8


CASES = [
    (64, 48, True, False, False, 0xFF),
    (64, 48, True, True, False, 0xFF),
    (32, 24, False, False, False, 0xFF),
    (32, 24, False, True, False, 0xFF),
    (64, 48, True, False, False, 0x00),
    (64, 48, True, True, False, 0x00),
    (64, 48, True, False, True, 0xFF),
    (50, 32, False, True, False, 0xFF),
    (100, 62, True, False, False, 0xFF),
    (100, 62, True, True, False, 0xFF),
    (90, 70, True, True, False, 0xFF),
    (176, 144, True, False, False, 0xFF),
]


@pytest.mark.parametrize("cw,ch,is_luma,isP,lossless,psy", CASES)
def test_hzcc_parity(lib, cw, ch, is_luma, isP, lossless, psy):
    for q in ((1,) if lossless else (137, 804, 2599)):
        run_case(lib, cw, ch, is_luma, isP, lossless, psy, q,
                 seed=hash((cw, ch, is_luma, isP, psy, q)) & 0xFFFF)
