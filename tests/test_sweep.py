"""Checked-in CLI sweep: byte-identical .dsv streams vs the reference
binary across the encoder flag surface (ref: dsv_main.c:102-247).

Each case drives OUR full CLI (dsv2_tpu.cli.main, in-process) and the
reference's dsv2 binary with the same flags, then compares the outputs
byte for byte. Covers ABR (-kbps), per-GOP rate control, every chroma
format encode (incl. raw UYVY input), scene-cut content (SCD firing),
-tempaq=0, -stabref, -bszx/-bszy and the effort ladder.
"""
import os
import subprocess

import numpy as np
import pytest

from dsv2_tpu import cli


def run_case(ref_build, tmp_path, src, args, raw=False):
    ref_out = str(tmp_path / "ref.dsv")
    our_out = str(tmp_path / "our.dsv")
    io_args = ["-inp=" + src, "-y"] + ([] if raw else ["-y4m=1"])
    # NOTE: the reference binary's exit code is not 0 on success; the
    # byte-compare below is the only meaningful check
    subprocess.run([os.path.join(ref_build, "dsv2"), "e",
                    "-out=" + ref_out] + io_args + args,
                   capture_output=True)
    rc = cli.main(["e", "-out=" + our_out] + io_args + args)
    assert rc in (None, 0)
    want = open(ref_out, "rb").read()
    got = open(our_out, "rb").read()
    assert len(want) > 0
    assert got == want, (len(got), len(want), args)


# (fixture, extra CLI args) — flags exercise branches the e2e suite
# doesn't: rate-control modes, AQ switches, block sizes, effort ladder
SWEEP = [
    # ABR with explicit bitrate, and per-GOP rate control (dsv_main.c -kbps)
    ("tiny64x48_420_6f.y4m", ["-gop=48", "-rc_mode=1", "-kbps=300"]),
    ("tiny64x48_420_6f.y4m", ["-gop=3", "-rc_mode=1", "-kbps=180",
                              "-rc_pergop=1"]),
    ("qcif176x144_420_10f.y4m", ["-gop=48", "-rc_mode=1", "-kbps=600"]),
    # chroma format encodes (444/411/410; 422/420 are in test_encode_e2e)
    ("tiny64x48_444_4f.y4m", ["-qp=60", "-gop=48"]),
    ("tiny64x48_411_4f.y4m", ["-qp=60", "-gop=48"]),
    ("tiny64x48_410_4f.y4m", ["-qp=60", "-gop=48"]),
    # scene-cut content: SCD fires mid-GOP (fixture cuts at frame 7)
    ("qcif176x144_420_10f.y4m", ["-qp=60", "-gop=48"]),
    ("qcif176x144_420_10f.y4m", ["-qp=60", "-gop=48", "-scd=0"]),
    # temporal AQ off / stable-block refresh period
    ("tiny64x48_420_6f.y4m", ["-qp=60", "-gop=48", "-tempaq=0"]),
    ("tiny64x48_420_6f.y4m", ["-qp=60", "-gop=48", "-stabref=2"]),
    # forced block sizes (bszx/bszy change the MC grid)
    ("tiny64x48_420_6f.y4m", ["-qp=60", "-gop=48", "-bszx=0", "-bszy=0"]),
    ("tiny64x48_420_6f.y4m", ["-qp=60", "-gop=48", "-bszx=1", "-bszy=0"]),
    # effort ladder (7 is the e2e default; 5 covered there too)
    ("tiny64x48_420_6f.y4m", ["-qp=60", "-gop=48", "-effort=0"]),
    ("tiny64x48_420_6f.y4m", ["-qp=60", "-gop=48", "-effort=3"]),
    ("tiny64x48_420_6f.y4m", ["-qp=60", "-gop=48", "-effort=10"]),
    # lossless intra+inter
    ("tiny64x48_420_6f.y4m", ["-qp=100", "-gop=48", "-effort=10"]),
    # variable intra interval off + intra percentage
    ("qcif176x144_420_10f.y4m", ["-qp=60", "-gop=48", "-varint=0",
                                 "-ipct=50"]),
]


@pytest.mark.parametrize("fixture,args", SWEEP,
                         ids=[" ".join(a) for _, a in SWEEP])
def test_cli_sweep(ref_build, fixtures_dir, tmp_path, fixture, args):
    run_case(ref_build, tmp_path, os.path.join(fixtures_dir, fixture), args)


def test_cli_sweep_uyvy(ref_build, fixtures_dir, tmp_path):
    """Raw packed-UYVY input (dsv_main.c -inp_fmt uyvy path)."""
    from dsv2_tpu.utils import y4m

    src = os.path.join(fixtures_dir, "tiny64x48_422_4f.y4m")
    with open(src, "rb") as f:
        rdr = y4m.Y4MReader(f)
        frames = []
        while True:
            p = rdr.read_frame()
            if p is None:
                break
            frames.append(p)
    raw = tmp_path / "in.uyvy"
    with open(raw, "wb") as f:
        for (yp, up, vp) in frames:
            h, w = yp.shape
            packed = np.empty((h, w * 2), dtype=np.uint8)
            packed[:, 0::4] = up
            packed[:, 1::2] = yp
            packed[:, 2::4] = vp
            f.write(packed.tobytes())
    run_case(ref_build, tmp_path, str(raw),
             ["-qp=60", "-gop=48", "-fmt=5", "-w=64", "-h=48"],
             raw=True)
