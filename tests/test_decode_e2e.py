"""End-to-end decode parity: our decoder vs the reference decoder on
reference-encoded streams (the conformance criterion: every output frame
byte-exact)."""
import io
import os
import subprocess

import numpy as np
import pytest

from dsv2_tpu.codec import decoder as dec


def ref_encode(ref_build, fixture, out, args):
    cmd = [os.path.join(ref_build, "dsv2"), "e", "-y",
           "-inp=" + fixture, "-out=" + out, "-y4m=1"] + args
    p = subprocess.run(cmd, capture_output=True, text=True)
    assert os.path.exists(out) and os.path.getsize(out) > 0, p.stderr


def ref_decode(ref_build, dsv, out):
    p = subprocess.run([os.path.join(ref_build, "dsv2"), "d", "-y",
                        "-inp=" + dsv, "-out=" + out],
                       capture_output=True, text=True)
    assert os.path.exists(out), p.stderr
    return open(out, "rb").read()


def our_decode(dsv):
    chunks = []
    with open(dsv, "rb") as f:
        for fno, frame in dec.decode_stream(f):
            chunks.append(frame.tobytes())
    return b"".join(chunks)


CASES = [
    ("tiny64x48_420_6f.y4m", ["-qp=60", "-gop=48"]),
    ("tiny64x48_420_6f.y4m", ["-qp=85", "-gop=0"]),
    ("tiny64x48_420_6f.y4m", ["-qp=100", "-gop=48"]),          # lossless
    ("qcif176x144_420_10f.y4m", ["-qp=60", "-gop=48"]),
    ("qcif176x144_420_10f.y4m", ["-qp=30", "-gop=48", "-rc_mode=2"]),
    ("odd100x62_420_4f.y4m", ["-qp=60", "-gop=48"]),
    ("tiny64x48_444_4f.y4m", ["-qp=60", "-gop=48"]),
    ("tiny64x48_422_4f.y4m", ["-qp=60", "-gop=48"]),
    ("tiny64x48_411_4f.y4m", ["-qp=60", "-gop=48"]),
    ("tiny64x48_410_4f.y4m", ["-qp=60", "-gop=48"]),
    ("qcif176x144_420_10f.y4m", ["-qp=70", "-gop=4"]),         # several GOPs
    ("tiny64x48_420_6f.y4m", ["-qp=60", "-gop=48", "-pfilter=0"]),
    ("tiny64x48_420_6f.y4m", ["-qp=60", "-gop=48", "-ifilter=0"]),
    ("tiny64x48_420_6f.y4m", ["-qp=60", "-gop=48", "-effort=3"]),
    ("tiny64x48_420_6f.y4m", ["-qp=60", "-gop=48", "-psy=0"]),
]


@pytest.mark.parametrize("fixture,args", CASES)
def test_decode_matches_reference(ref_build, fixtures_dir, tmp_path,
                                  fixture, args):
    src = os.path.join(fixtures_dir, fixture)
    dsv = str(tmp_path / "t.dsv")
    ref_encode(ref_build, src, dsv, args)
    want = ref_decode(ref_build, dsv, str(tmp_path / "ref.yuv"))
    got = our_decode(dsv)
    assert len(got) == len(want), (len(got), len(want))
    if got != want:
        a = np.frombuffer(got, np.uint8)
        b = np.frombuffer(want, np.uint8)
        bad = np.flatnonzero(a != b)
        raise AssertionError(
            f"{bad.size} byte mismatches, first at {bad[0]} "
            f"(ours {a[bad[0]]} ref {b[bad[0]]})")


CHUNK_CASES = [
    ("qcif176x144_420_10f.y4m", ["-qp=70", "-gop=4"]),   # I at 0,4,8: runs
    ("qcif176x144_420_10f.y4m", ["-qp=60", "-gop=48"]),  # one long P run
    ("tiny64x48_420_6f.y4m", ["-qp=85", "-gop=0"]),      # intra vmap run
    ("odd100x62_420_4f.y4m", ["-qp=60", "-gop=48"]),     # odd dims
    ("tiny64x48_444_4f.y4m", ["-qp=100", "-gop=48"]),    # lossless
]


@pytest.mark.parametrize("fixture,args", CHUNK_CASES)
def test_chunked_decode_matches_reference(ref_build, fixtures_dir,
                                          tmp_path, fixture, args):
    """decode_stream_chunked (multi-frame fused dispatches: P runs as one
    lax.scan, intra runs as one vmap) must be byte-identical to the
    serial driver; chunk=3 forces mid-run chunk boundaries AND tail
    chunks shorter than the chunk size."""
    src = os.path.join(fixtures_dir, fixture)
    dsv = str(tmp_path / "t.dsv")
    ref_encode(ref_build, src, dsv, args)
    want = ref_decode(ref_build, dsv, str(tmp_path / "ref.yuv"))
    chunks = []
    with open(dsv, "rb") as f:
        for fno, meta, frame in dec.decode_stream_chunked(f, chunk=3):
            chunks.append(frame.tobytes())
    assert b"".join(chunks) == want


def test_decode_matches_d28dec(ref_build, fixtures_dir, tmp_path):
    """Cross-check vs the independent single-header conformance decoder."""
    src = os.path.join(fixtures_dir, "qcif176x144_420_10f.y4m")
    dsv = str(tmp_path / "t.dsv")
    ref_encode(ref_build, src, dsv, ["-qp=55", "-gop=48"])
    p = subprocess.run([os.path.join(ref_build, "d28dec"), "-y",
                        "-inp=" + dsv, "-out=" + str(tmp_path / "d28.yuv")],
                       capture_output=True, text=True)
    want = open(tmp_path / "d28.yuv", "rb").read()
    got = our_decode(dsv)
    assert got == want
