"""BC2 color library parity vs the reference bc2.c."""
import ctypes as C
import os
import subprocess

import numpy as np
import pytest

from dsv2_tpu.utils import bc2

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bc2lib(ref_build):
    so = "/tmp/libbc2ref.so"
    if not os.path.exists(so):
        subprocess.run(["cc", "-O2", "-shared", "-fPIC", "-o", so,
                        "/root/reference/bc2.c"], check=True)
    # harness that applies the conversion macros over arrays
    harness = r"""
#include "bc2.h"
void conv_fwd(const unsigned char *rgb, unsigned char *out, int n, int fullr)
{
    int i, br, cs, ci;
    for (i = 0; i < n; i++) {
        SRGB_TO_BC2(rgb[3*i], rgb[3*i+1], rgb[3*i+2], br, cs, ci, fullr);
        out[3*i] = br; out[3*i+1] = cs; out[3*i+2] = ci;
    }
}
void conv_inv(const unsigned char *bcc, unsigned char *out, int n, int fullr)
{
    int i, r, g, b;
    for (i = 0; i < n; i++) {
        BC2_TO_SRGB(bcc[3*i], bcc[3*i+1], bcc[3*i+2], r, g, b, fullr);
        out[3*i] = r; out[3*i+1] = g; out[3*i+2] = b;
    }
}
"""
    hpath = "/tmp/bc2_harness.c"
    open(hpath, "w").write(harness)
    so2 = "/tmp/libbc2harness.so"
    subprocess.run(["cc", "-O2", "-shared", "-fPIC", "-I/root/reference",
                    "-o", so2, hpath, "/root/reference/bc2.c"], check=True)
    lib = C.CDLL(so2)
    lib.bc2_init()
    return lib


@pytest.mark.parametrize("full_range", [1, 0])
def test_bc2_roundtrip_parity(bc2lib, full_range):
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (4096, 3), dtype=np.uint8)
    flat = np.ascontiguousarray(rgb.reshape(-1))
    out = np.zeros_like(flat)
    bc2lib.conv_fwd(flat.ctypes.data_as(C.POINTER(C.c_uint8)),
                    out.ctypes.data_as(C.POINTER(C.c_uint8)),
                    len(rgb), full_range)
    br, cs, ci = bc2.srgb_to_bc2(rgb[:, 0], rgb[:, 1], rgb[:, 2],
                                 full_range=bool(full_range))
    ours = np.stack([br, cs, ci], axis=1).reshape(-1)
    np.testing.assert_array_equal(ours, out, err_msg="forward")

    inv_ref = np.zeros_like(out)
    bc2lib.conv_inv(out.ctypes.data_as(C.POINTER(C.c_uint8)),
                    inv_ref.ctypes.data_as(C.POINTER(C.c_uint8)),
                    len(rgb), full_range)
    bcc = out.reshape(-1, 3)
    r, g, b = bc2.bc2_to_srgb(bcc[:, 0], bcc[:, 1], bcc[:, 2],
                              full_range=bool(full_range))
    ours_inv = np.stack([r, g, b], axis=1).reshape(-1)
    np.testing.assert_array_equal(ours_inv, inv_ref, err_msg="inverse")
