"""Parity of host bitstream primitives vs the reference bs.c oracle."""
import ctypes as C
import random

import pytest

from dsv2_tpu.bitstream import BitWriter, BitReader, ZBRLEWriter, ZBRLEReader
import oracle


@pytest.fixture(scope="module")
def lib(ref_build):
    return oracle.load()


def ref_writer(lib, fn, values, extra=None):
    buf = (C.c_uint8 * 65536)()
    bs = oracle.RefBS(C.cast(buf, C.POINTER(C.c_uint8)), 0)
    for v in values:
        fn(C.byref(bs), v)
    lib.dsv_bs_align(C.byref(bs))
    n = bs.pos // 8
    return bytes(buf[:n])


def test_put_bits_parity(lib):
    rng = random.Random(1)
    cases = [(rng.randrange(1, 25), rng.randrange(0, 1 << 24)) for _ in range(500)]
    buf = (C.c_uint8 * 65536)()
    bs = oracle.RefBS(C.cast(buf, C.POINTER(C.c_uint8)), 0)
    w = BitWriter()
    for n, v in cases:
        lib.dsv_bs_put_bits(C.byref(bs), n, v & ((1 << n) - 1))
        w.put_bits(n, v & ((1 << n) - 1))
    lib.dsv_bs_align(C.byref(bs))
    assert w.data() == bytes(buf[:bs.pos // 8])
    r = BitReader(w.data())
    for n, v in cases:
        assert r.get_bits(n) == v & ((1 << n) - 1)


@pytest.mark.parametrize("kind", ["ueg", "seg", "neg"])
def test_golomb_parity(lib, kind):
    rng = random.Random(2)
    if kind == "ueg":
        vals = [rng.randrange(0, 1 << 16) for _ in range(2000)] + [0, 1, 2, 3]
    elif kind == "seg":
        vals = [rng.randrange(-(1 << 15), 1 << 15) for _ in range(2000)] + [0, -1, 1]
    else:
        vals = [v for v in (rng.randrange(-(1 << 15), 1 << 15)
                            for _ in range(3000)) if v != 0][:2000] + [1, -1, 2]
    fn = getattr(lib, "dsv_bs_put_%s" % kind)
    ref = ref_writer(lib, fn, vals)
    w = BitWriter()
    put = getattr(w, "put_%s" % kind)
    for v in vals:
        put(v)
    assert w.data() == ref
    r = BitReader(ref)
    get = getattr(r, "get_%s" % kind)
    for v in vals:
        assert get() == v


def test_rice_parity(lib):
    rng = random.Random(3)
    for damp in (1, 2, 3, 4, 5):
        vals = [rng.randrange(0, 1 << 12) for _ in range(1000)]
        buf = (C.c_uint8 * (1 << 20))()
        bs = oracle.RefBS(C.cast(buf, C.POINTER(C.c_uint8)), 0)
        rk = C.c_int(0)
        for v in vals:
            lib.dsv_bs_put_rice(C.byref(bs), v, C.byref(rk), damp)
        lib.dsv_bs_align(C.byref(bs))
        ref = bytes(buf[:bs.pos // 8])
        w = BitWriter()
        k = 0
        for v in vals:
            k = w.put_rice(v, k, damp)
        assert w.data() == ref
        r = BitReader(ref)
        k = 0
        for v in vals:
            got, k = r.get_rice(k, damp)
            assert got == v


def test_nrice_parity(lib):
    rng = random.Random(4)
    vals = [v for v in (rng.randrange(-4096, 4096) for _ in range(3000))
            if v != 0][:1500]
    buf = (C.c_uint8 * (1 << 20))()
    bs = oracle.RefBS(C.cast(buf, C.POINTER(C.c_uint8)), 0)
    rk = C.c_int(0)
    for v in vals:
        lib.dsv_bs_put_nrice(C.byref(bs), v, C.byref(rk), 3)
    lib.dsv_bs_align(C.byref(bs))
    ref = bytes(buf[:bs.pos // 8])
    w = BitWriter()
    k = 0
    for v in vals:
        k = w.put_nrice(v, k, 3)
    assert w.data() == ref
    r = BitReader(ref)
    k = 0
    for v in vals:
        got, k = r.get_nrice(k, 3)
        assert got == v


def test_zbrle_parity(lib):
    rng = random.Random(5)
    bits = [rng.random() < 0.15 for _ in range(4000)]
    buf = (C.c_uint8 * (1 << 20))()
    rle = oracle.RefZBRLE()
    lib.dsv_bs_init_rle(C.byref(rle), C.cast(buf, C.POINTER(C.c_uint8)))
    for b in bits:
        lib.dsv_bs_put_rle(C.byref(rle), int(b))
    n = lib.dsv_bs_end_rle(C.byref(rle), 0)
    ref = bytes(buf[:n])
    w = ZBRLEWriter()
    for b in bits:
        w.put(int(b))
    assert w.end() == ref
    r = ZBRLEReader(ref)
    for b in bits:
        assert r.get() == int(b)
    assert not r.end()
