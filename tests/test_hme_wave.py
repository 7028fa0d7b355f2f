"""Wavefront HME vs the host oracle: identical fields and statistics."""
import numpy as np
import pytest

from dsv2_tpu.utils import y4m
from dsv2_tpu.utils.packet import VideoMeta
from dsv2_tpu.codec.encoder import Encoder


def encode_with_backend(fixtures_dir, name, backend, nframes, gop=48):
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
    """Pallas kernels (interpret mode on CPU) vs the host oracle."""
    a = encode_with_backend(fixtures_dir, "tiny64x48_420_6f.y4m",
                            "host", 5, gop=5)
    b = encode_with_backend(fixtures_dir, "tiny64x48_420_6f.y4m",
                            "pallas", 5, gop=5)
    assert a == b


def test_wave_equals_host_odd_dims(fixtures_dir):
    a = encode_with_backend(fixtures_dir, "odd100x62_420_4f.y4m", "host", 4)
    b = encode_with_backend(fixtures_dir, "odd100x62_420_4f.y4m", "wave", 4)
    assert a == b
