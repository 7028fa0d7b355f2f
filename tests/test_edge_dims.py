"""Extreme-aspect-ratio parity: geometries whose subband levels shrink to
1-px sub-dimensions, where the reference's shared transform scratch
(sbt.c:199-225, 449-473 over the temp_buf_pad arena) becomes observable
in the bitstream and in decoded pixels. These dims exercise:

- the forward carry -> in-loop inverse threading in the encoder
  (ops/sbt.make_fwd_sbt_carry / make_inv_sbt_stale),
- the decoder's persistent cross-plane/cross-frame arena
  (codec/decoder._needs_arena + devsteps.make_*_decode_step_arena),
- the conformance decoder's serial overlap dequant + arena twin.

gop=2 over 4 frames alternates I P I P so intra frames re-read scratch
left behind by preceding P/intra planes (the cross-frame chain).
"""
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
import mkfixtures  # noqa: E402

from dsv2_tpu import cli  # noqa: E402
from dsv2_tpu.conformance import d28dec  # noqa: E402

# (w, h, subs): wide (1-px sub-height levels), tall (1-px sub-width),
# and a 411 case (chroma hits the degenerate levels before luma does)
DIMS = [
    (352, 16, "420"),
    (16, 240, "420"),
    (64, 500, "411"),
]


@pytest.mark.parametrize("w,h,subs", DIMS, ids=[f"{w}x{h}_{s}" for w, h, s in DIMS])
def test_edge_dims_parity(ref_build, tmp_path, w, h, subs):
    src = str(tmp_path / "src.y4m")
    mkfixtures.write_y4m(src, w, h, 4, subs=subs)
    args = ["-y4m=1", "-qp=60", "-gop=2", "-y"]

    # encode: byte-identical stream
    ref_dsv = str(tmp_path / "ref.dsv")
    our_dsv = str(tmp_path / "our.dsv")
    subprocess.run([os.path.join(ref_build, "dsv2"), "e", "-inp=" + src,
                    "-out=" + ref_dsv] + args, capture_output=True)
    rc = cli.main(["e", "-inp=" + src, "-out=" + our_dsv] + args)
    assert rc in (None, 0)
    want = open(ref_dsv, "rb").read()
    got = open(our_dsv, "rb").read()
    assert len(want) > 0
    assert got == want, (len(got), len(want))

    # decode the reference's stream: byte-identical pixels
    ref_y4m = str(tmp_path / "ref_dec.y4m")
    our_y4m = str(tmp_path / "our_dec.y4m")
    subprocess.run([os.path.join(ref_build, "dsv2"), "d", "-inp=" + ref_dsv,
                    "-out=" + ref_y4m, "-y4m=1", "-y"], capture_output=True)
    rc = cli.main(["d", "-inp=" + ref_dsv, "-out=" + our_y4m, "-y4m=1", "-y"])
    assert rc in (None, 0)
    dwant = open(ref_y4m, "rb").read()
    assert len(dwant) > 0
    assert open(our_y4m, "rb").read() == dwant

    # independent conformance decoder vs the reference's d28dec binary
    d28_y4m = str(tmp_path / "d28_dec.y4m")
    conf_y4m = str(tmp_path / "conf_dec.y4m")
    subprocess.run([os.path.join(ref_build, "d28dec"), "-y",
                    "-inp=" + ref_dsv, "-out=" + d28_y4m, "-y4m=1"],
                   capture_output=True)
    d28dec.decode_file(ref_dsv, conf_y4m)
    cwant = open(d28_y4m, "rb").read()
    assert len(cwant) > 0
    assert open(conf_y4m, "rb").read() == cwant
