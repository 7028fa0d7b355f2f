"""Decoder robustness: corrupt and truncated streams must never crash the
session (the reference signals DSV_PKT_ERR_PSZ/EOP and keeps going;
ref: hzcc.c:585-649, dsv_decoder.c:455-492)."""
import io

import numpy as np
import pytest

from dsv2_tpu.utils import y4m
from dsv2_tpu.utils.packet import VideoMeta, read_packet
from dsv2_tpu.codec.decoder import Decoder

from test_batch import load


@pytest.fixture(scope="module")
def stream_bytes(fixtures_dir):
    from dsv2_tpu.cli import make_encoder, default_enc_opts
    rdr, frames = load(fixtures_dir, "tiny64x48_420_6f.y4m")
    meta = VideoMeta(width=rdr.w, height=rdr.h, subsamp=rdr.subsamp,
                     fps_num=rdr.fps[0], fps_den=rdr.fps[1])
    enc = make_encoder(meta, default_enc_opts(qp=60, gop=3))
    chunks = []
    for fr in frames:
        chunks.extend(enc.encode_frame(fr))
    chunks.extend(enc.end_of_stream())
    return b"".join(chunks)


def _drain(buf):
    """Feed every parseable packet to a fresh decoder; count decoded."""
    dec = Decoder()
    stream = io.BytesIO(buf)
    n = 0
    while True:
        pt, payload = read_packet(stream)
        if pt is None:
            break
        code, frame, fno = dec.decode_packet(payload)
        if frame is not None:
            n += 1
    return n


def test_clean_stream_decodes(stream_bytes):
    assert _drain(stream_bytes) == 6


def test_corrupt_payload_bytes_no_crash(stream_bytes):
    rng = np.random.default_rng(7)
    for trial in range(8):
        buf = bytearray(stream_bytes)
        # corrupt a handful of bytes past the headers (keep packet framing)
        for _ in range(6):
            pos = int(rng.integers(64, len(buf)))
            buf[pos] ^= int(rng.integers(1, 256))
        try:
            _drain(bytes(buf))
        except (ValueError, IndexError, EOFError):
            pass  # structured decode error is acceptable; crash is not


def test_truncated_stream_no_crash(stream_bytes):
    for cut in (len(stream_bytes) // 3, len(stream_bytes) // 2,
                len(stream_bytes) - 5):
        try:
            _drain(stream_bytes[:cut])
        except (ValueError, IndexError, EOFError):
            pass


def test_garbage_prefix_rejected():
    assert _drain(b"\x00" * 512) == 0
    assert _drain(b"DSV2" + b"\xff" * 64) == 0
