"""Batched intra encode path: byte-identical to the sequential encoder."""
import os

import pytest

from dsv2_tpu.utils import y4m
from dsv2_tpu.utils.packet import VideoMeta
from dsv2_tpu.codec.encoder import Encoder
from dsv2_tpu.parallel.batch import encode_intra_batch
from dsv2_tpu.parallel.gop import split_gops


def load(fixtures_dir, name):
    with open(os.path.join(fixtures_dir, name), "rb") as f:
        rdr = y4m.Y4MReader(f)
        frames = []
        while True:
            p = rdr.read_frame()
            if p is None:
                break
            frames.append(p)
    return rdr, frames


def mk_enc(rdr):
    enc = Encoder()
    enc.set_metadata(VideoMeta(width=rdr.w, height=rdr.h,
                               subsamp=rdr.subsamp))
    enc.gop = 0
    enc.quality = 240
    enc.start()
    return enc


def test_batch_matches_sequential(fixtures_dir):
    rdr, frames = load(fixtures_dir, "tiny64x48_420_6f.y4m")
    e1 = mk_enc(rdr)
    seq = []
    for fr in frames:
        seq.extend(e1.encode_frame(fr))
    seq.extend(e1.end_of_stream())
    e2 = mk_enc(rdr)
    bat = encode_intra_batch(e2, frames)
    bat += e2.end_of_stream()
    assert b"".join(bat) == b"".join(seq)


def test_split_gops():
    assert split_gops(10, 4) == [(0, 4), (4, 8), (8, 10)]
    assert split_gops(5, 0) == [(0, 5)]


def test_packed_transfer_mode(fixtures_dir):
    """The packed sparse-segment transfer format stays byte-identical to
    the default dense format."""
    from dsv2_tpu.parallel import xfer

    rdr, frames = load(fixtures_dir, "tiny64x48_420_6f.y4m")
    e1 = mk_enc(rdr)
    dense = encode_intra_batch(e1, frames) + e1.end_of_stream()
    xfer.set_mode("packed")
    try:
        e2 = mk_enc(rdr)
        packed = encode_intra_batch(e2, frames) + e2.end_of_stream()
    finally:
        xfer.set_mode("dense")
    assert b"".join(packed) == b"".join(dense)


def test_packed_fallback_path(fixtures_dir, monkeypatch):
    """Force the >EXC exception-record overflow so the 32-bit fallback
    fetch path is exercised (normally only extreme lossless content)."""
    from dsv2_tpu.parallel import xfer, batch as bmod

    xfer.set_mode("packed")
    monkeypatch.setattr(xfer, "EXC", 4)
    bmod._device_batch_fn.cache_clear()
    try:
        rdr, frames = load(fixtures_dir, "tiny64x48_422_4f.y4m")
        e1 = mk_enc(rdr)
        e1.quality = 400  # lossless (RC_QUAL_MAX) -> plenty of wide values
        seq = []
        for fr in frames:
            seq.extend(e1.encode_frame(fr))
        seq.extend(e1.end_of_stream())

        e2 = mk_enc(rdr)
        e2.quality = 400
        out = encode_intra_batch(e2, frames)
        out.extend(e2.end_of_stream())
        assert b"".join(out) == b"".join(seq)
    finally:
        xfer.set_mode("dense")
        bmod._device_batch_fn.cache_clear()


def test_blob_transfer_mode(fixtures_dir):
    """The device-built entropy-blob transfer stays byte-identical to the
    dense format (both batched intra and the sequential session path)."""
    from dsv2_tpu.parallel import xfer

    rdr, frames = load(fixtures_dir, "tiny64x48_420_6f.y4m")
    e1 = mk_enc(rdr)
    dense = encode_intra_batch(e1, frames) + e1.end_of_stream()
    xfer.set_mode("blob")
    try:
        e2 = mk_enc(rdr)
        blob = encode_intra_batch(e2, frames) + e2.end_of_stream()
        e3 = mk_enc(rdr)
        seq = []
        for fr in frames:
            seq.extend(e3.encode_frame(fr))
        seq.extend(e3.end_of_stream())
    finally:
        xfer.set_mode("dense")
    assert b"".join(blob) == b"".join(dense)
    assert b"".join(seq) == b"".join(dense)


def test_blob_fallback_path(fixtures_dir, monkeypatch):
    """A tiny blob capacity forces the over-cap fallback for every plane;
    the host re-scan keeps the stream byte-identical."""
    from dsv2_tpu.parallel import xfer, batch as bmod
    from dsv2_tpu.codec import devsteps
    from dsv2_tpu.ops import scan_pl

    rdr, frames = load(fixtures_dir, "tiny64x48_420_6f.y4m")
    e1 = mk_enc(rdr)
    dense = encode_intra_batch(e1, frames) + e1.end_of_stream()
    xfer.set_mode("blob")
    monkeypatch.setattr(devsteps, "blob_cap", lambda total: 8)
    bmod._device_batch_fn.cache_clear()
    devsteps.make_i_encode_step.cache_clear()
    scan_pl.make_scan_blob.cache_clear()
    try:
        e2 = mk_enc(rdr)
        out = encode_intra_batch(e2, frames) + e2.end_of_stream()
    finally:
        xfer.set_mode("dense")
        bmod._device_batch_fn.cache_clear()
        devsteps.make_i_encode_step.cache_clear()
        scan_pl.make_scan_blob.cache_clear()
    assert b"".join(out) == b"".join(dense)


def test_blob_lockstep(fixtures_dir):
    """Lockstep multi-stream encode under the blob transfer (the batcher's
    bucketed prefix fetch parses blob lengths from the lane metadata)."""
    import numpy as np
    from dsv2_tpu.parallel import xfer
    from dsv2_tpu.cli import make_encoder, default_enc_opts
    from dsv2_tpu.parallel.dynbatch import encode_streams_lockstep

    rng = np.random.default_rng(5)
    meta = VideoMeta(width=64, height=48)
    streams = []
    for i in range(3):
        frames = []
        for _ in range(2):
            y = rng.integers(0, 256, (48, 64), dtype=np.uint8)
            u = rng.integers(0, 256, (24, 32), dtype=np.uint8)
            v_ = rng.integers(0, 256, (24, 32), dtype=np.uint8)
            frames.append((y, u, v_))
        streams.append(frames)

    def factory():
        return make_encoder(meta, default_enc_opts(qp=60, gop=2))

    want = encode_streams_lockstep(streams, factory, width=3)
    xfer.set_mode("blob")
    try:
        got = encode_streams_lockstep(streams, factory, width=3)
    finally:
        xfer.set_mode("dense")
    assert got == want


def test_dense_overflow_fallback(fixtures_dir, monkeypatch):
    """Force the int16-overflow flag so the int32 fallback fetch path is
    exercised (real coefficients never exceed int16 for 8-bit content)."""
    import jax.numpy as jnp
    from dsv2_tpu.parallel import xfer, batch as bmod
    from dsv2_tpu.codec import devsteps

    real = xfer.dense_out

    def forced(v, ll_n):
        ll, r8, nnz, _ = real(v, ll_n)
        return ll, r8, nnz, jnp.bool_(True)

    monkeypatch.setattr(xfer, "dense_out", forced)
    bmod._device_batch_fn.cache_clear()
    devsteps.make_i_encode_step.cache_clear()
    try:
        rdr, frames = load(fixtures_dir, "tiny64x48_420_6f.y4m")
        e1 = mk_enc(rdr)
        out = encode_intra_batch(e1, frames) + e1.end_of_stream()
    finally:
        bmod._device_batch_fn.cache_clear()
        devsteps.make_i_encode_step.cache_clear()
    monkeypatch.undo()
    e2 = mk_enc(rdr)
    seq = []
    for fr in frames:
        seq.extend(e2.encode_frame(fr))
    seq.extend(e2.end_of_stream())
    assert b"".join(out) == b"".join(seq)
