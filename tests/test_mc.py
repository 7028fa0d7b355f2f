"""Parity of motion compensation + in-loop filters vs bmc.c."""
import ctypes as C

import numpy as np
import pytest

import oracle
from dsv2_tpu.core import constants as K
from dsv2_tpu.core import intmath as im
from dsv2_tpu.ops import mc, hzcc
from dsv2_tpu import native

B = K.FRAME_BORDER


@pytest.fixture(scope="module")
def lib(ref_build):
    L = oracle.load()
    L.dsv_mk_frame.restype = C.POINTER(oracle.RefFrame)
    L.dsv_extend_frame.restype = C.POINTER(oracle.RefFrame)
    return L


def frame_np(fr, c):
    """Bordered numpy copy ((h+2B, w+2B)) of an oracle frame plane."""
    p = fr.contents.planes[c]
    base = C.cast(p.data, C.c_void_p).value - B * p.stride - B
    buf = (C.c_uint8 * (p.stride * (p.h + 2 * B))).from_address(base)
    a = np.frombuffer(buf, dtype=np.uint8).reshape(p.h + 2 * B, p.stride)
    return np.ascontiguousarray(a[:, :p.w + 2 * B])


def fill_frame(lib, fr, rng):
    for c in range(3):
        p = fr.contents.planes[c]
        data = np.ctypeslib.as_array(p.data, shape=(p.h * p.stride,))
        vals = rng.integers(0, 256, (p.h, p.w), dtype=np.uint8)
        for y in range(p.h):
            data[y * p.stride:y * p.stride + p.w] = vals[y]
    lib.dsv_extend_frame(fr)


def mk_mvs(rng, nbh, nbv, w, h, bw, bh):
    n = nbh * nbv
    mvx = np.zeros(n, np.int16)
    mvy = np.zeros(n, np.int16)
    flags = np.zeros(n, np.uint32)
    submask = np.zeros(n, np.uint8)
    dc = np.zeros(n, np.uint16)
    for j in range(nbv):
        for i in range(nbh):
            k = i + j * nbh
            kind = rng.integers(0, 10)
            # keep full-pel position within the encoder-legal search range
            # (HME rejects candidates without a 4px apron margin,
            #  ref: hme.c:427-434)
            lox = (-B + 4 - i * bw) * 4
            hix = (w - bw + B - 5 - i * bw) * 4
            loy = (-B + 4 - j * bh) * 4
            hiy = (h - bh + B - 5 - j * bh) * 4
            mvx[k] = rng.integers(max(lox, -480), min(hix, 480) + 1)
            mvy[k] = rng.integers(max(loy, -480), min(hiy, 480) + 1)
            if kind < 2:  # intra
                flags[k] |= 1 << K.MV_BIT_INTRA
                mvx[k] = (mvx[k] // 4) * 4
                mvy[k] = (mvy[k] // 4) * 4
                submask[k] = (K.MASK_ALL_INTRA if kind == 0
                              else rng.integers(1, 15))
                if rng.integers(0, 2):
                    dc[k] = rng.integers(0, 256) | K.SRC_DC_PRED
            elif kind == 2:
                flags[k] |= 1 << K.MV_BIT_SKIP
                mvx[k] = mvy[k] = 0
            if kind == 3:
                flags[k] |= 1 << K.MV_BIT_EPRM
            if kind == 4:
                flags[k] |= 1 << K.MV_BIT_NOXMITY
            if kind == 5:
                flags[k] |= 1 << K.MV_BIT_NOXMITC
    return mvx, mvy, flags, submask, dc


def setup(lib, w, h, subsamp, seed):
    rng = np.random.default_rng(seed)
    blk = 16
    nbh, nbv = im.udiv_round_up(w, blk), im.udiv_round_up(h, blk)
    meta = oracle.RefMeta()
    meta.width, meta.height = w, h
    meta.subsamp = subsamp
    meta.fps_num, meta.fps_den = 30, 1
    meta.inter_sharpen = 1
    params = oracle.mk_params(lib, meta, blk, blk, isP=True, temporal_mc=1)
    ref = lib.dsv_mk_frame(subsamp, w, h, 1)
    fill_frame(lib, ref, rng)
    src = lib.dsv_mk_frame(subsamp, w, h, 1)
    fill_frame(lib, src, rng)
    mvx, mvy, flags, submask, dc = mk_mvs(
        rng, nbh, nbv, w, h, blk, blk)
    mvs = (oracle.RefMV * (nbh * nbv))()
    for k in range(nbh * nbv):
        mvs[k].all = (int(mvy[k]) << 16) | (int(mvx[k]) & 0xFFFF)
        mvs[k].flags = int(flags[k])
        mvs[k].submask = int(submask[k])
        mvs[k].dc = int(dc[k])
    return (rng, meta, params, ref, src, mvs, mvx, mvy, flags, submask, dc,
            nbh, nbv, blk)


def plane_cfg(meta, c, nbh, nbv, blk, lossless=False):
    sh = K.fmt_h_shift(meta.subsamp) if c else 0
    sv = K.fmt_v_shift(meta.subsamp) if c else 0
    pw = im.round_shift(meta.width, sh)
    ph = im.round_shift(meta.height, sv)
    return mc.McCfg(pw, ph, blk >> sh, blk >> sv, nbh, nbv, sh, sv,
                    c == 0, lossless)


@pytest.mark.parametrize("w,h,subsamp", [
    (64, 48, K.SUBSAMP_420), (100, 62, K.SUBSAMP_420),
    (64, 48, K.SUBSAMP_444), (64, 48, K.SUBSAMP_422),
    (64, 48, K.SUBSAMP_411), (64, 48, K.SUBSAMP_410),
])
def test_sub_pred_parity(lib, w, h, subsamp):
    (rng, meta, params, ref, src, mvs, mvx, mvy, flags, submask, dc,
     nbh, nbv, blk) = setup(lib, w, h, subsamp, seed=w * h + subsamp)
    pred = lib.dsv_mk_frame(subsamp, w, h, 1)
    lib.dsv_sub_pred(C.cast(mvs, C.POINTER(oracle.RefMV)), C.byref(params),
                     pred, src, ref)
    mvx2 = mvx.astype(np.int32).reshape(nbv, nbh)
    mvy2 = mvy.astype(np.int32).reshape(nbv, nbh)
    fl2 = flags.astype(np.int32).reshape(nbv, nbh)
    sm2 = submask.astype(np.int32).reshape(nbv, nbh)
    dc2 = dc.astype(np.int32).reshape(nbv, nbh)
    for c in range(3):
        cfg = plane_cfg(meta, c, nbh, nbv, blk)
        refp = frame_np(ref, c)
        ours_pred = np.asarray(mc.make_predict(cfg)(
            refp, mvx2, mvy2, fl2, sm2, dc2, np.int32(params.temporal_mc)))
        ref_pred = frame_np(pred, c)[B:B + cfg.gh, B:B + cfg.gw]
        np.testing.assert_array_equal(ours_pred, ref_pred,
                                      err_msg=f"pred plane {c}")
        # subtract parity: oracle's src frame was mutated in place
        src_orig = frame_np(src, c)  # post-subtract
        # rebuild initial residual canvas: we need pre-subtract values; rerun
        # by reconstructing from oracle pred: res_after = f(res_before, pred)
        # instead simply verify our subtract reproduces oracle's in-place
        # result starting from a fresh copy
    # full-frame subtract check with fresh frames
    src2 = lib.dsv_mk_frame(subsamp, w, h, 1)
    fill_frame(lib, src2, rng)
    before = [frame_np(src2, c).copy() for c in range(3)]
    pred2 = lib.dsv_mk_frame(subsamp, w, h, 1)
    lib.dsv_sub_pred(C.cast(mvs, C.POINTER(oracle.RefMV)), C.byref(params),
                     pred2, src2, ref)
    for c in range(3):
        cfg = plane_cfg(meta, c, nbh, nbv, blk)
        refp = frame_np(ref, c)
        p_ours = np.asarray(mc.make_predict(cfg)(
            refp, mvx2, mvy2, fl2, sm2, dc2, np.int32(params.temporal_mc)))
        res_init = before[c][B:B + cfg.gh, B:B + cfg.gw]
        r_ours = np.asarray(mc.make_subtract(cfg)(res_init, p_ours, fl2))
        r_ref = frame_np(src2, c)[B:B + cfg.gh, B:B + cfg.gw]
        np.testing.assert_array_equal(r_ours, r_ref,
                                      err_msg=f"residual plane {c}")


@pytest.mark.parametrize("w,h,subsamp,do_filter,tmc", [
    (64, 48, K.SUBSAMP_420, 1, 1), (64, 48, K.SUBSAMP_420, 0, 0),
    (100, 62, K.SUBSAMP_420, 1, 0), (64, 48, K.SUBSAMP_444, 1, 1),
    (64, 48, K.SUBSAMP_411, 1, 1),
])
def test_add_res_parity(lib, w, h, subsamp, do_filter, tmc):
    (rng, meta, params, ref, src, mvs, mvx, mvy, flags, submask, dc,
     nbh, nbv, blk) = setup(lib, w, h, subsamp, seed=w + h * 7 + subsamp)
    params.temporal_mc = tmc
    q = 700
    mvx2 = mvx.astype(np.int32).reshape(nbv, nbh)
    mvy2 = mvy.astype(np.int32).reshape(nbv, nbh)
    fl2 = flags.astype(np.int32).reshape(nbv, nbh)
    sm2 = submask.astype(np.int32).reshape(nbv, nbh)
    dc2 = dc.astype(np.int32).reshape(nbv, nbh)
    # prediction via oracle (already proven equal), residual random
    pred = lib.dsv_mk_frame(subsamp, w, h, 1)
    resd = lib.dsv_mk_frame(subsamp, w, h, 1)
    fill_frame(lib, resd, rng)
    lib.dsv_sub_pred(C.cast(mvs, C.POINTER(oracle.RefMV)), C.byref(params),
                     pred, resd, ref)
    fill_frame(lib, resd, rng)  # fresh random residual
    res_before = [frame_np(resd, c).copy() for c in range(3)]
    pred_np = [frame_np(pred, c).copy() for c in range(3)]

    fm = oracle.RefFMeta()
    fm.params = C.pointer(params)
    fm.mvs = C.cast(mvs, C.POINTER(oracle.RefMV))
    fm.isP = 1
    lib.dsv_add_res(C.cast(mvs, C.POINTER(oracle.RefMV)), C.byref(fm), q,
                    resd, pred, do_filter)

    hcfg = hzcc.HzccCfg(w, h, True, True, False, nbh, nbv, blk, blk,
                        w, h, subsamp, 0xFF)
    psyf = hzcc.spatial_psy_factor(hcfg, -1)
    fq = min(q, 1536)
    fq += fq * psyf >> 10
    if fq < 1024:
        fq = 512 + fq // 2
    fthresh = 32 * (14 - im.lb2(fq))

    for c in range(3):
        cfg = plane_cfg(meta, c, nbh, nbv, blk)
        res_canvas = res_before[c][B:B + cfg.gh, B:B + cfg.gw]
        p_canvas = pred_np[c][B:B + cfg.gh, B:B + cfg.gw]
        recon = np.asarray(mc.make_reconstruct(cfg)(res_canvas, p_canvas, fl2))
        # place into a bordered array and run the sequential filters
        full = res_before[c].copy()
        full[B:B + cfg.gh, B:B + cfg.gw] = recon
        stride = full.shape[1]
        vis_off = B * stride + B
        flat = np.ascontiguousarray(full)
        if c == 0:
            native.luma_filter(flat[B:, B:], cfg.w, cfg.h, stride,
                               mvx, mvy, flags, submask, nbh, nbv, blk, blk,
                               fq, fthresh, False, do_filter, tmc,
                               meta.inter_sharpen)
        else:
            native.chroma_filter(flat[B:, B:], cfg.w, cfg.h, stride,
                                 mvx, mvy, flags, nbh, nbv,
                                 blk >> cfg.sh, blk >> cfg.sv, q, False)
        ref_out = frame_np(resd, c)
        np.testing.assert_array_equal(
            flat[B:B + cfg.h, B:B + cfg.w], ref_out[B:B + cfg.h, B:B + cfg.w],
            err_msg=f"add_res plane {c}")
