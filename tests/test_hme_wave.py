"""Wavefront HME vs the host oracle: identical fields and statistics."""
import os

import numpy as np
import pytest

from dsv2_tpu.utils import y4m
from dsv2_tpu.utils.packet import VideoMeta
from dsv2_tpu.codec.encoder import Encoder


def encode_with_backend(fixtures_dir, name, backend, nframes, gop=48,
                        effort=None):
    import os
    with open(os.path.join(fixtures_dir, name), "rb") as f:
        rdr = y4m.Y4MReader(f)
        frames = []
        while True:
            p = rdr.read_frame()
            if p is None or len(frames) >= nframes:
                break
            frames.append(p)
    enc = Encoder()
    enc.set_metadata(VideoMeta(width=rdr.w, height=rdr.h,
                               subsamp=rdr.subsamp))
    enc.gop = gop
    enc.quality = 240
    if effort is not None:
        enc.effort = effort
    enc.hme_backend = backend
    enc.start()
    out = []
    for fr in frames:
        out.extend(enc.encode_frame(fr))
    out.extend(enc.end_of_stream())
    return b"".join(out)


def test_wave_equals_host(fixtures_dir):
    a = encode_with_backend(fixtures_dir, "qcif176x144_420_10f.y4m",
                            "host", 9)
    b = encode_with_backend(fixtures_dir, "qcif176x144_420_10f.y4m",
                            "wave", 9)
    assert a == b


def test_pallas_equals_host_tiny(fixtures_dir):
    """Pallas kernels (interpret mode on CPU) vs the host oracle.

    Three frames = I + P (no temporal MVs) + P (temporal MVs): the
    minimum covering both candidate regimes. The nano fixture is the
    smallest frame with multi-lane diagonals (3x2 blocks) — interpret
    cost scales with diagonal count on the one-core box."""
    a = encode_with_backend(fixtures_dir, "nano48x32_420_4f.y4m",
                            "host", 3, gop=4)
    b = encode_with_backend(fixtures_dir, "nano48x32_420_4f.y4m",
                            "pallas", 3, gop=4)
    assert a == b


def test_wave_equals_host_low_effort(fixtures_dir):
    """effort=5: the half-pel-only subpel probe mask and the skipped
    chroma intra test — branches the effort-10 device-backend tests never
    reach (the CLI sweep's effort ladder runs the host backend on CPU).
    Two frames: the effort branches don't interact with temporal
    candidates, and I+P is one traced program variant instead of two."""
    a = encode_with_backend(fixtures_dir, "nano48x32_420_4f.y4m",
                            "host", 2, gop=4, effort=5)
    b = encode_with_backend(fixtures_dir, "nano48x32_420_4f.y4m",
                            "wave", 2, gop=4, effort=5)
    assert a == b


def test_wave_equals_host_odd_dims(fixtures_dir):
    a = encode_with_backend(fixtures_dir, "odd100x62_420_4f.y4m", "host", 4)
    b = encode_with_backend(fixtures_dir, "odd100x62_420_4f.y4m", "wave", 4)
    assert a == b


def test_gang_equals_host_tiny(fixtures_dir):
    """Gang kernels (interpret mode on CPU) vs the host oracle.

    Three frames = I + P (no temporal MVs) + P (temporal MVs): the
    minimum covering both candidate regimes — interpret-mode gang
    kernels are minutes per extra P frame on one CPU core. The nano
    fixture keeps multi-lane diagonals (gang width capping included)
    at ~2x fewer grid steps than tiny64x48."""
    a = encode_with_backend(fixtures_dir, "nano48x32_420_4f.y4m",
                            "host", 3, gop=4)
    b = encode_with_backend(fixtures_dir, "nano48x32_420_4f.y4m",
                            "gang", 3, gop=4)
    assert a == b


@pytest.mark.skipif(not os.environ.get("DSV2_SLOW_TESTS"),
                    reason="~2 min of interpret-mode kernels on one core; "
                           "run with DSV2_SLOW_TESTS=1")
def test_pallas_lockstep_equals_host_tiny(fixtures_dir):
    """vmapped Pallas HME under the lockstep batcher (the TPU default for
    bench.py's p_lockstep metric) == sequential host encoding."""
    from dsv2_tpu.utils.packet import VideoMeta
    from dsv2_tpu.cli import make_encoder, default_enc_opts
    from dsv2_tpu.parallel.dynbatch import encode_streams_lockstep

    with open(os.path.join(fixtures_dir, "tiny64x48_420_6f.y4m"),
              "rb") as f:
        rdr = y4m.Y4MReader(f)
        frames = []
        while len(frames) < 4:
            p = rdr.read_frame()
            if p is None:
                break
            frames.append(p)
    meta = VideoMeta(width=rdr.w, height=rdr.h, subsamp=rdr.subsamp,
                     fps_num=rdr.fps[0], fps_den=rdr.fps[1],
                     aspect_num=rdr.aspect[0], aspect_den=rdr.aspect[1])
    gop = 2
    streams = [frames[i:i + gop] for i in range(0, 4, gop)]

    def factory():
        enc = make_encoder(meta, default_enc_opts(qp=60, gop=gop))
        enc.hme_backend = "pallas"
        return enc

    host = []
    for st in streams:
        enc = factory()
        enc.hme_backend = "host"
        chunks = []
        for fr in st:
            chunks.extend(enc.encode_frame(fr))
        host.append(b"".join(chunks))
    lock = encode_streams_lockstep(streams, factory, width=2)
    assert lock == host


def test_qpsad_phase_planes_equal_canvas():
    """qpsad_ph (16 phase planes, static shifts) vs qpsad (the 68x68
    canvas oracle) over every probe offset and both psy weight sets."""
    import jax
    import jax.numpy as jnp
    from dsv2_tpu.ops import hme_wave as hw

    rng = np.random.RandomState(11)
    for trial in range(2):
        refwin = jnp.asarray(rng.randint(0, 256, (21, 21)), jnp.int32)
        srcsp = jnp.asarray(rng.randint(0, 256, (16, 16)), jnp.int32)
        pre = hw.qpsad_pre(srcsp, hw.qpel_grid(refwin))
        planes = hw.qpel_phases(refwin)
        spre = hw.qpsad_src_pre(srcsp)
        w = (2, 1, 0) if trial == 0 else (1, 2, 1)
        ew, tw, aw = (jnp.int32(v) for v in w)

        @jax.jit
        def both(t0, t1, ew=ew, tw=tw, aw=aw, pre=pre, planes=planes,
                 spre=spre):
            return (hw.qpsad(pre, t0, t1, ew, tw, aw),
                    hw.qpsad_ph(spre, planes, t0, t1, ew, tw, aw))

        for t1 in range(-3, 4):
            for t0 in range(-3, 4):
                a, b = both(jnp.int32(t0), jnp.int32(t1))
                assert int(a) == int(b), (trial, t0, t1, int(a), int(b))
