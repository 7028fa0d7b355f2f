"""Bit-exactness of the JAX subband transform vs the reference sbt.c."""
import ctypes as C

import numpy as np
import pytest

import oracle
from dsv2_tpu.core import constants as K
from dsv2_tpu.core import intmath as im
from dsv2_tpu.ops import sbt


@pytest.fixture(scope="module")
def lib(ref_build):
    return oracle.load()


def np_ptr(a, ty):
    return a.ctypes.data_as(C.POINTER(ty))


def mk_plane(arr, w, h):
    """DSV_PLANE over a C-contiguous uint8 array (stride = arr width)."""
    p = oracle.RefPlane()
    p.data = np_ptr(arr, C.c_uint8)
    p.stride = arr.shape[1]
    p.w = w
    p.h = h
    p.len = arr.size
    p.format = 0
    return p


def mk_coefs(arr):
    c = oracle.RefCoefs()
    c.data = np_ptr(arr, C.c_int32)
    c.width = arr.shape[1]
    c.height = arr.shape[0]
    return c


def mk_fm(lib, meta, blockdata, blk=16, isP=False, lossless=False,
          cur_plane=0):
    params = oracle.mk_params(lib, meta, blk, blk, isP=isP, lossless=lossless)
    fm = oracle.RefFMeta()
    fm._params_keepalive = params
    fm.params = C.pointer(params)
    fm.blockdata = np_ptr(blockdata, C.c_uint8)
    fm.cur_plane = cur_plane
    fm.isP = 1 if isP else 0
    fm.fnum = 0
    return fm


def run_case(lib, pw, ph, cw, ch, is_luma, isP, lossless, q, seed):
    rng = np.random.default_rng(seed)
    nbh = im.udiv_round_up(max(pw, 16), 16)
    nbv = im.udiv_round_up(max(ph, 16), 16)
    meta = oracle.RefMeta()
    meta.width, meta.height = max(pw, 16), max(ph, 16)
    meta.subsamp = K.SUBSAMP_420
    meta.fps_num, meta.fps_den = 30, 1
    blockdata = rng.integers(0, 256, (nbv, nbh), dtype=np.uint8)
    blockdata = np.ascontiguousarray(blockdata)

    # plane with 2 extra columns/rows standing in for the frame border
    ext = np.ascontiguousarray(
        rng.integers(0, 256, (ph + 2, cw + 2), dtype=np.uint8))
    fm = mk_fm(lib, meta, blockdata, isP=isP, lossless=lossless,
               cur_plane=0 if is_luma else 1)
    fm.params.contents.nblocks_h = nbh
    fm.params.contents.nblocks_v = nbv

    # --- forward ---
    coefs_ref = np.zeros((ch, cw), dtype=np.int32)
    plane = mk_plane(ext, pw, ph)
    cref = mk_coefs(coefs_ref)
    lib.dsv_fwd_sbt(C.byref(plane), C.byref(cref), C.byref(fm))

    x = np.zeros((ch, cw), dtype=np.int32)
    x[:ph, :] = ext[:ph, :cw].astype(np.int32) - 128
    cfg = sbt.SbtCfg(cw, ch, is_luma, isP, lossless, nbh, nbv)
    ours, carry = sbt.make_fwd_sbt_carry(cfg)(x, blockdata)
    ours = np.asarray(ours)
    np.testing.assert_array_equal(ours, coefs_ref, err_msg="fwd sbt mismatch")

    # --- inverse (on perturbed coefs, simulating quantization) ---
    coefs_in = coefs_ref.copy()
    mask = rng.random(coefs_in.shape) < 0.5
    coefs_in[mask] = (coefs_in[mask] // 7) * 7
    ref_in = np.ascontiguousarray(coefs_in.copy())
    out_plane = np.zeros((ph + 2, cw + 2), dtype=np.uint8)
    plane2 = mk_plane(out_plane, pw, ph)
    cref2 = mk_coefs(ref_in)
    lib.dsv_inv_sbt(C.byref(plane2), C.byref(cref2), q, C.byref(fm))

    # the reference just ran its forward pass in this process, so its
    # scratch row 1 holds the fwd leftovers — same in-loop order as the
    # encoder; thread the carry for degenerate (extreme-aspect) planes
    inv = sbt.make_inv_sbt_stale(cfg)
    ours_coef = np.asarray(inv(coefs_in, blockdata, np.int32(q), carry))
    ours_px = np.asarray(sbt.sbc2p(ours_coef))
    np.testing.assert_array_equal(ours_coef, ref_in,
                                  err_msg="inv sbt coef mismatch")
    np.testing.assert_array_equal(ours_px[:ph, :pw], out_plane[:ph, :pw],
                                  err_msg="inv sbt pixel mismatch")


SIZES = [(64, 48, 64, 48), (32, 16, 32, 16), (100, 62, 100, 62),
         (50, 31, 50, 32), (25, 16, 26, 16), (176, 144, 176, 144)]


@pytest.mark.parametrize("pw,ph,cw,ch", SIZES)
@pytest.mark.parametrize("is_luma,isP,lossless", [
    (True, False, False), (True, True, False),
    (False, False, False), (False, True, False),
    (True, False, True), (False, True, True),
])
def test_sbt_parity(lib, pw, ph, cw, ch, is_luma, isP, lossless):
    for q in (1 if lossless else 400, 1 if lossless else 2000):
        run_case(lib, pw, ph, cw, ch, is_luma, isP, lossless, q,
                 seed=hash((pw, ph, is_luma, isP, lossless, q)) & 0xFFFF)
