"""Independent conformance decoder vs the reference's d28dec binary.

dsv2_tpu.conformance is a self-contained second decode implementation
(numpy only, no imports from the main codec); here it must byte-match the
reference's own standalone decoder on reference-encoded streams across
frame types, chroma formats, odd dims and lossless.
"""
import os
import subprocess

import numpy as np
import pytest

from dsv2_tpu.conformance import decode_file

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.mark.parametrize("fixture,args", [
    ("tiny64x48_420_6f", ["-qp=60", "-gop=6"]),
    ("odd100x62_420_4f", ["-qp=50", "-gop=4"]),
    ("tiny64x48_444_4f", ["-qp=60", "-gop=4"]),
    ("tiny64x48_422_4f", ["-qp=60", "-gop=4"]),
    ("tiny64x48_411_4f", ["-qp=60", "-gop=4"]),
    ("tiny64x48_410_4f", ["-qp=60", "-gop=4"]),
    ("tiny64x48_420_6f", ["-qp=1", "-gop=3"]),          # lossless I+P
    ("tiny64x48_420_6f", ["-qp=200", "-gop=6", "-effort=4"]),
    # CIF-scale stream through the wavefront-vectorized filter path
    ("cif352x288_420_12f", ["-qp=60", "-gop=6"]),
])
def test_conformance_vs_d28dec(tmp_path, ref_build, fixture, args):
    dsv2 = os.path.join(ref_build, "dsv2")
    d28dec = os.path.join(ref_build, "d28dec")
    src = os.path.join(FIX, fixture + ".y4m")
    enc = str(tmp_path / "s.dsv")
    refy = str(tmp_path / "ref.y4m")
    oury = str(tmp_path / "our.y4m")
    # the reference binary's exit code is nonzero even on success
    subprocess.run([dsv2, "e", "-y", "-inp=" + src, "-out=" + enc,
                    "-y4m=1"] + args, capture_output=True)
    assert os.path.getsize(enc) > 0
    subprocess.run([d28dec, "-y", "-inp=" + enc, "-out=" + refy,
                    "-y4m=1"], check=True, capture_output=True)
    decode_file(enc, oury)
    with open(refy, "rb") as a, open(oury, "rb") as b:
        assert a.read() == b.read()


def test_conformance_uyvy(tmp_path, ref_build):
    """Raw packed-UYVY input (subsamp 0x14 on the wire): the stream's
    UYVY subsamp code must decode like 4:2:2 and carry the C422 y4m tag
    (ref: dsv.h:92, dsv_main.c:90-91)."""
    from dsv2_tpu.utils import y4m
    dsv2 = os.path.join(ref_build, "dsv2")
    d28dec = os.path.join(ref_build, "d28dec")
    fsrc = os.path.join(FIX, "tiny64x48_422_4f.y4m")
    with open(fsrc, "rb") as f:
        rdr = y4m.Y4MReader(f)
        frames = []
        while True:
            p = rdr.read_frame()
            if p is None:
                break
            frames.append(p)
    src = str(tmp_path / "in.uyvy")
    with open(src, "wb") as f:
        for (yp, up, vp) in frames:
            h, w = yp.shape
            packed = np.empty((h, w * 2), dtype=np.uint8)
            packed[:, 0::4] = up
            packed[:, 1::2] = yp
            packed[:, 2::4] = vp
            f.write(packed.tobytes())
    enc = str(tmp_path / "s.dsv")
    subprocess.run([dsv2, "e", "-y", "-inp=" + src, "-out=" + enc,
                    "-fmt=5", "-w=64", "-h=48",
                    "-qp=60", "-gop=4"], capture_output=True)
    assert os.path.getsize(enc) > 0
    # d28dec's y4m writer asserts on the UYVY subsamp code
    # (d28_dec_main.c:382); compare raw planar output instead
    refraw = str(tmp_path / "ref.raw")
    subprocess.run([d28dec, "-y", "-inp=" + enc, "-out=" + refraw],
                   check=True, capture_output=True)
    got = decode_file(enc)
    assert len(got) == len(frames)
    ours = b"".join(p.tobytes() for _, vis in got for p in vis)
    with open(refraw, "rb") as a:
        assert a.read() == ours


def test_conformance_edge_dims(tmp_path, ref_build):
    """Extreme-aspect geometry (352x16: subband levels with 1-px
    sub-dimensions) through the independent decoder — cross-checks the
    shared-scratch arena emulation (ref: dsv28dec.h plane paths at
    degenerate dims)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import mkfixtures
    dsv2 = os.path.join(ref_build, "dsv2")
    d28dec = os.path.join(ref_build, "d28dec")
    src = str(tmp_path / "in.y4m")
    mkfixtures.write_y4m(src, 352, 16, 4)
    enc = str(tmp_path / "s.dsv")
    subprocess.run([dsv2, "e", "-y", "-inp=" + src, "-out=" + enc,
                    "-y4m=1", "-qp=60", "-gop=4"], capture_output=True)
    assert os.path.getsize(enc) > 0
    refy = str(tmp_path / "ref.y4m")
    oury = str(tmp_path / "our.y4m")
    subprocess.run([d28dec, "-y", "-inp=" + enc, "-out=" + refy,
                    "-y4m=1"], check=True, capture_output=True)
    decode_file(enc, oury)
    with open(refy, "rb") as a, open(oury, "rb") as b:
        assert a.read() == b.read()


def test_conformance_vs_own_encoder(tmp_path, ref_build):
    """The conformance decoder must also decode OUR encoder's streams
    (which are byte-identical to the reference's, but this closes the
    loop without assuming that)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dsv2_tpu.utils import y4m
    from dsv2_tpu.utils.packet import VideoMeta
    from dsv2_tpu.cli import make_encoder, default_enc_opts

    src = os.path.join(FIX, "tiny64x48_420_6f.y4m")
    frames = []
    with open(src, "rb") as f:
        rdr = y4m.Y4MReader(f)
        while True:
            p = rdr.read_frame()
            if p is None:
                break
            frames.append(p)
    meta = VideoMeta(width=rdr.w, height=rdr.h, subsamp=rdr.subsamp,
                     fps_num=rdr.fps[0], fps_den=rdr.fps[1])
    enc = make_encoder(meta, default_enc_opts(qp=60, gop=6))
    out = b""
    for fr in frames:
        out += b"".join(bytes(c) for c in enc.encode_frame(fr))
    out += b"".join(bytes(c) for c in enc.end_of_stream())
    p = str(tmp_path / "own.dsv")
    with open(p, "wb") as f:
        f.write(out)
    got = decode_file(p)
    assert len(got) == len(frames)
    # cross-check against the reference's standalone decoder
    d28dec = os.path.join(ref_build, "d28dec")
    refy = str(tmp_path / "ref.y4m")
    oury = str(tmp_path / "our.y4m")
    subprocess.run([d28dec, "-y", "-inp=" + p, "-out=" + refy, "-y4m=1"],
                   check=True, capture_output=True)
    decode_file(p, oury)
    with open(refy, "rb") as a, open(oury, "rb") as b:
        assert a.read() == b.read()


def test_conformance_corrupt_streams(tmp_path, ref_build, fixtures_dir):
    """Corrupt-stream resilience (ref: dsv28dec.h:3118-3152 plane guards,
    dsv_decoder.c:516-523 report-and-continue): byte flips and truncations
    must never raise, and a corrupted later GOP must not stop earlier
    frames from decoding."""
    dsv2 = os.path.join(ref_build, "dsv2")
    src = os.path.join(fixtures_dir, "tiny64x48_420_6f.y4m")
    enc = str(tmp_path / "c.dsv")
    subprocess.run([dsv2, "e", "-y", "-inp=" + src, "-out=" + enc,
                    "-y4m=1", "-qp=60", "-gop=2"], capture_output=True)
    data = bytearray(open(enc, "rb").read())
    rng = np.random.default_rng(7)
    for pos in sorted(rng.choice(len(data), size=8, replace=False)):
        bad = bytearray(data)
        bad[pos] ^= 0xA5
        p = str(tmp_path / "bad.dsv")
        open(p, "wb").write(bad)
        decode_file(p, str(tmp_path / "bad.y4m"))  # must not raise
    for cut in (10, len(data) // 2, len(data) - 3):
        p = str(tmp_path / "tr.dsv")
        open(p, "wb").write(data[:cut])
        decode_file(p, str(tmp_path / "tr.y4m"))   # must not raise
    # corruption localized to the last GOP: earlier frames still decode
    bad = bytearray(data)
    bad[-40] ^= 0xFF
    p = str(tmp_path / "tail.dsv")
    open(p, "wb").write(bad)
    got = decode_file(p)
    assert len(got) >= 2
