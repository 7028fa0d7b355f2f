"""Device frame ops parity vs the host containers: border extension and
ME pyramid must match core/frame.py (itself parity-tested vs the
reference ctypes oracle in test_frame.py)."""
import numpy as np
import pytest

from dsv2_tpu.core import constants as K
from dsv2_tpu.core.frame import Frame, B
from dsv2_tpu.ops import framedev


@pytest.mark.parametrize("w,h", [(352, 288), (100, 62), (64, 48), (35, 21)])
def test_extend_plane_parity(w, h):
    rng = np.random.default_rng(5 + w)
    vis = rng.integers(0, 256, (h, w), dtype=np.uint8)
    f = Frame(K.SUBSAMP_420, w, h, border=True)
    f.view(0)[:, :] = vis
    f.extend(luma_only=True)
    got = np.asarray(framedev.extend_plane_graph(vis, w, h))
    assert np.array_equal(got, f.planes[0])


@pytest.mark.parametrize("w,h,levels", [(352, 288, 3), (100, 62, 3),
                                        (64, 48, 2)])
def test_pyramid_parity(w, h, levels):
    rng = np.random.default_rng(9 + w)
    vis = rng.integers(0, 256, (h, w), dtype=np.uint8)
    f = Frame(K.SUBSAMP_420, w, h, border=True)
    f.view(0)[:, :] = vis
    f.extend()

    # host twin (encoder._mk_pyramid)
    from dsv2_tpu.core.frame import ds2x_luma
    from dsv2_tpu.core import intmath as im
    host = []
    prev = f
    for i in range(levels):
        g = Frame(K.SUBSAMP_420, im.round_shift(w, i + 1),
                  im.round_shift(h, i + 1), border=True)
        ds2x_luma(g, prev)
        g.extend(luma_only=True)
        host.append(g)
        prev = g

    dev = framedev.pyramid_graph(f.planes[0], w, h, levels)
    for i in range(levels):
        assert np.array_equal(np.asarray(dev[i]), host[i].planes[0]), i
