"""Border extension + pyramid downsample parity vs frame.c."""
import ctypes as C

import numpy as np
import pytest

import oracle
from dsv2_tpu.core import constants as K
from dsv2_tpu.core.frame import Frame, ds2x_luma, B
from dsv2_tpu.core import intmath as im


@pytest.fixture(scope="module")
def lib(ref_build):
    L = oracle.load()
    L.dsv_mk_frame.restype = C.POINTER(oracle.RefFrame)
    L.dsv_extend_frame.restype = C.POINTER(oracle.RefFrame)
    return L


def oracle_frame_np(fr, c):
    p = fr.contents.planes[c]
    base = C.cast(p.data, C.c_void_p).value - B * p.stride - B
    buf = (C.c_uint8 * (p.stride * (p.h + 2 * B))).from_address(base)
    a = np.frombuffer(buf, dtype=np.uint8).reshape(p.h + 2 * B, p.stride)
    return a[:, :p.w + 2 * B].copy()


@pytest.mark.parametrize("w,h,subsamp", [
    (64, 48, K.SUBSAMP_420), (100, 62, K.SUBSAMP_420),
    (64, 48, K.SUBSAMP_411), (64, 48, K.SUBSAMP_410),
    (176, 144, K.SUBSAMP_444),
])
def test_extend_parity(lib, w, h, subsamp):
    rng = np.random.default_rng(w + h)
    ref = lib.dsv_mk_frame(subsamp, w, h, 1)
    ours = Frame(subsamp, w, h, border=True)
    for c in range(3):
        p = ref.contents.planes[c]
        data = np.ctypeslib.as_array(p.data, shape=(p.h * p.stride,))
        vals = rng.integers(0, 256, (p.h, p.w), dtype=np.uint8)
        for y in range(p.h):
            data[y * p.stride:y * p.stride + p.w] = vals[y]
        ours.view(c)[:, :] = vals
    lib.dsv_extend_frame(ref)
    ours.extend()
    for c in range(3):
        np.testing.assert_array_equal(ours.planes[c], oracle_frame_np(ref, c),
                                      err_msg=f"plane {c}")


def test_ds2x_parity(lib):
    rng = np.random.default_rng(9)
    w, h = 101, 63
    src_ref = lib.dsv_mk_frame(K.SUBSAMP_420, w, h, 1)
    src = Frame(K.SUBSAMP_420, w, h, border=True)
    p = src_ref.contents.planes[0]
    data = np.ctypeslib.as_array(p.data, shape=(p.h * p.stride,))
    vals = rng.integers(0, 256, (h, w), dtype=np.uint8)
    for y in range(h):
        data[y * p.stride:y * p.stride + w] = vals[y]
    src.view(0)[:, :] = vals
    lib.dsv_extend_frame(src_ref)
    src.extend()
    dw, dh = im.round_shift(w, 1), im.round_shift(h, 1)
    dst_ref = lib.dsv_mk_frame(K.SUBSAMP_420, dw, dh, 1)
    lib.dsv_ds2x_frame_luma(dst_ref, src_ref)
    dst = Frame(K.SUBSAMP_420, dw, dh, border=True)
    ds2x_luma(dst, src)
    ref_np = oracle_frame_np(dst_ref, 0)[B:B + dh, B:B + dw]
    np.testing.assert_array_equal(dst.view(0), ref_np)
