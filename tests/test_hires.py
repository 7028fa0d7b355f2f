"""High-resolution parity: 720p I+P and 1080p lossless 4:4:4 vs the
reference binary (BASELINE configs 4-5 shapes). Fixtures are synthesized
on the fly (not checked in: ~100 MB of y4m); first run pays the XLA
compile for the large shapes, cached afterwards (.jax_cache)."""
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def hires_dir(tmp_path_factory):
    import mkfixtures
    d = tmp_path_factory.mktemp("hires")
    mkfixtures.write_y4m(str(d / "hd1280x720_420_2f.y4m"), 1280, 720, 2)
    mkfixtures.write_y4m(str(d / "fhd1920x1080_444_2f.y4m"), 1920, 1080, 2,
                         subs="444")
    return d


@pytest.mark.parametrize("fixture,args", [
    ("hd1280x720_420_2f.y4m", ["-qp=60", "-gop=48", "-effort=7"]),
    ("fhd1920x1080_444_2f.y4m", ["-qp=100", "-gop=48"]),  # lossless 4:4:4
], ids=["720p-ip", "1080p-lossless-444"])
def test_hires_parity(ref_build, hires_dir, tmp_path, fixture, args):
    from dsv2_tpu import cli

    src = str(hires_dir / fixture)
    ref_out = str(tmp_path / "ref.dsv")
    our_out = str(tmp_path / "our.dsv")
    subprocess.run([os.path.join(ref_build, "dsv2"), "e", "-y",
                    "-inp=" + src, "-out=" + ref_out, "-y4m=1"] + args,
                   capture_output=True)
    rc = cli.main(["e", "-y", "-inp=" + src, "-out=" + our_out,
                   "-y4m=1"] + args)
    assert rc in (None, 0)
    want = open(ref_out, "rb").read()
    got = open(our_out, "rb").read()
    assert len(want) > 0
    assert got == want, (len(got), len(want))
