"""ctypes access to the reference implementation compiled as a shared lib.

Used ONLY as a test oracle for per-stage parity checks. Nothing here is part
of the framework.
"""
import ctypes as C
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class RefBS(C.Structure):
    _fields_ = [("start", C.POINTER(C.c_uint8)), ("pos", C.c_uint)]


class RefZBRLE(C.Structure):
    _fields_ = [("bs", RefBS), ("nz", C.c_int)]


class RefMeta(C.Structure):
    _fields_ = [("width", C.c_int), ("height", C.c_int), ("subsamp", C.c_int),
                ("fps_num", C.c_int), ("fps_den", C.c_int),
                ("aspect_num", C.c_int), ("aspect_den", C.c_int),
                ("inter_sharpen", C.c_int), ("reserved", C.c_int)]


class RefPlane(C.Structure):
    _fields_ = [("data", C.POINTER(C.c_uint8)), ("len", C.c_int),
                ("format", C.c_int), ("stride", C.c_int),
                ("w", C.c_int), ("h", C.c_int)]


class RefCoefs(C.Structure):
    _fields_ = [("data", C.POINTER(C.c_int32)),
                ("width", C.c_int), ("height", C.c_int)]


class RefFrame(C.Structure):
    _fields_ = [("alloc", C.POINTER(C.c_uint8)), ("planes", RefPlane * 3),
                ("refcount", C.c_int), ("format", C.c_int),
                ("width", C.c_int), ("height", C.c_int), ("border", C.c_int)]


class RefMV(C.Structure):
    _fields_ = [("all", C.c_int32), ("flags", C.c_uint32),
                ("err", C.c_uint16), ("dc", C.c_uint16),
                ("submask", C.c_uint8)]


class RefParams(C.Structure):
    _fields_ = [("vidmeta", C.POINTER(RefMeta)), ("effort", C.c_int),
                ("do_psy", C.c_int), ("is_ref", C.c_int), ("has_ref", C.c_int),
                ("blk_w", C.c_int), ("blk_h", C.c_int),
                ("nblocks_h", C.c_int), ("nblocks_v", C.c_int),
                ("temporal_mc", C.c_int), ("lossless", C.c_int),
                ("reserved", C.c_int)]


class RefFMeta(C.Structure):
    _fields_ = [("params", C.POINTER(RefParams)), ("mvs", C.POINTER(RefMV)),
                ("blockdata", C.POINTER(C.c_uint8)),
                ("cur_plane", C.c_uint8), ("isP", C.c_uint8),
                ("fnum", C.c_uint32)]


def load():
    so = os.path.join(REPO, "build", "ref", "libref.so")
    if not os.path.exists(so):
        subprocess.run([os.path.join(REPO, "tools", "build_ref.sh")],
                       check=True, capture_output=True)
    lib = C.CDLL(so)
    return lib


def mk_params(lib, meta, blk_w, blk_h, isP=False, lossless=False,
              effort=10, do_psy=0xFF, temporal_mc=0):
    import dsv2_tpu.core.intmath as im
    p = RefParams()
    p.vidmeta = C.pointer(meta)
    p.effort = effort
    p.do_psy = do_psy
    p.is_ref = 1
    p.has_ref = 1 if isP else 0
    p.blk_w = blk_w
    p.blk_h = blk_h
    p.nblocks_h = im.udiv_round_up(meta.width, blk_w)
    p.nblocks_v = im.udiv_round_up(meta.height, blk_h)
    p.temporal_mc = temporal_mc
    p.lossless = 1 if lossless else 0
    p.reserved = 0
    return p
