"""Loader for the native host runtime (builds on first use with cc)."""
import ctypes as C
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dsv2n.c")
_SO = os.path.join(_DIR, "libdsv2n.so")
_lock = threading.Lock()
_lib = None


class Seg(C.Structure):
    _fields_ = [("count", C.c_int32), ("damp", C.c_int32)]


def _build():
    subprocess.run(
        ["cc", "-O3", "-shared", "-fPIC", "-fvisibility=hidden",
         "-o", _SO, _SRC],
        check=True, capture_output=True)


def lib():
    global _lib
    with _lock:
        if _lib is None:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            L = C.CDLL(_SO)
            L.dsvn_scan_enc.restype = C.c_uint32
            L.dsvn_scan_enc.argtypes = [
                C.POINTER(C.c_int32), C.c_int64, C.POINTER(Seg), C.c_int,
                C.POINTER(C.c_uint8)]
            L.dsvn_scan_dec.restype = C.c_uint32
            L.dsvn_scan_dec.argtypes = [
                C.POINTER(C.c_uint8), C.c_uint32, C.POINTER(C.c_int32),
                C.POINTER(Seg), C.c_int]
            _lib = L
    return _lib


def _i32p(a):
    return a.ctypes.data_as(C.POINTER(C.c_int32))


def _u8p(a):
    return a.ctypes.data_as(C.POINTER(C.c_uint8))


def _i16p(a):
    return a.ctypes.data_as(C.POINTER(C.c_int16))


def _u32p(a):
    return a.ctypes.data_as(C.POINTER(C.c_uint32))


def _segarr(segments):
    arr = (Seg * len(segments))()
    for i, (count, damp) in enumerate(segments):
        arr[i].count = count
        arr[i].damp = damp
    return arr


def scan_encode(values, segments):
    """Serialize quantized coefficients (scan order) into the HZCC
    bit layout. segments: list of (count, damp) with damp < 0 = NEG-coded."""
    v = np.ascontiguousarray(values, dtype=np.int32)
    cap = 16 * v.size + 4096
    out = np.zeros(cap, dtype=np.uint8)
    n = lib().dsvn_scan_enc(_i32p(v), v.size, _segarr(segments),
                            len(segments), _u8p(out))
    return out[:n].tobytes()


def scan_decode(buf, lim, total, segments):
    """Inverse of scan_encode; returns (values int32, final bit position)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(
        buf, np.ndarray) else buf
    b = np.ascontiguousarray(b)
    v = np.zeros(total, dtype=np.int32)
    endbit = lib().dsvn_scan_dec(_u8p(b), lim, _i32p(v), _segarr(segments),
                                 len(segments))
    return v, endbit


def post_process(plane):
    """In-place de-gradient sharpen (ref: bmc.c:340-361)."""
    assert plane.dtype == np.uint8 and plane.flags.c_contiguous
    h, w = plane.shape
    lib().dsvn_post_process(_u8p(plane), w, h, plane.strides[0])


def intra_filter(plane_arr, w, h, stride, blockdata, nbh, nbv, fq, fthresh,
                 lossless, do_filter):
    lib().dsvn_intra_filter(_u8p(plane_arr), w, h, stride, _u8p(blockdata),
                            nbh, nbv, fq, fthresh, int(lossless),
                            int(do_filter))


def luma_filter(plane_arr, w, h, stride, mvx, mvy, mvflags, submask,
                nbh, nbv, blk_w, blk_h, fq, fthresh, lossless, do_filter,
                temporal_mc, inter_sharpen):
    lib().dsvn_luma_filter(_u8p(plane_arr), w, h, stride,
                           _i16p(mvx), _i16p(mvy), _u32p(mvflags),
                           _u8p(submask), nbh, nbv, blk_w, blk_h, fq, fthresh,
                           int(lossless), int(do_filter), int(temporal_mc),
                           int(inter_sharpen))


def chroma_filter(plane_arr, w, h, stride, mvx, mvy, mvflags,
                  nbh, nbv, bw, bh, q, lossless):
    lib().dsvn_chroma_filter(_u8p(plane_arr), w, h, stride,
                             _i16p(mvx), _i16p(mvy), _u32p(mvflags),
                             nbh, nbv, bw, bh, q, int(lossless))
