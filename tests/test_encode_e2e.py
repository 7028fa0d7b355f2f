"""End-to-end encode parity: our encoder vs the reference encoder,
byte-identical .dsv streams."""
import os
import subprocess

import pytest

from dsv2_tpu.utils import y4m
from dsv2_tpu.utils.packet import VideoMeta
from dsv2_tpu.codec.encoder import Encoder
from dsv2_tpu.core import constants as K


def read_frames(path):
    with open(path, "rb") as f:
        rdr = y4m.Y4MReader(f)
        frames = []
        while True:
            p = rdr.read_frame()
            if p is None:
                break
            frames.append(p)
        return rdr, frames


def our_encode(src, qp, gop, **kw):
    with open(src, "rb") as f:
        rdr = y4m.Y4MReader(f)
        frames = []
        while True:
            p = rdr.read_frame()
            if p is None:
                break
            frames.append(p)
    meta = VideoMeta(width=rdr.w, height=rdr.h, subsamp=rdr.subsamp,
                     fps_num=rdr.fps[0], fps_den=rdr.fps[1],
                     aspect_num=rdr.aspect[0], aspect_den=rdr.aspect[1])
    enc = Encoder()
    enc.set_metadata(meta)
    enc.quality = K.user_qual_to_rc_qual(qp)
    enc.gop = gop if gop >= 0 else (meta.fps_num + meta.fps_den // 2) // meta.fps_den
    enc.min_quality = max(0, enc.quality - K.user_qual_to_rc_qual(5))
    enc.min_I_frame_quality = max(0, enc.quality - K.user_qual_to_rc_qual(2))
    from dsv2_tpu.codec import rc
    enc.bitrate = rc.estimate_bitrate(enc.quality * 100 // K.RC_QUAL_MAX,
                                      enc.gop, meta)
    fps = (meta.fps_num + meta.fps_den // 2) // meta.fps_den
    enc.stable_refresh = max(1, min(fps, 60))
    for k, v in kw.items():
        setattr(enc, k, v)
    enc.start()
    out = []
    for fr in frames:
        out.extend(enc.encode_frame(fr))
    out.extend(enc.end_of_stream())
    return b"".join(out)


def ref_encode(ref_build, src, out, args):
    subprocess.run([os.path.join(ref_build, "dsv2"), "e", "-y",
                    "-inp=" + src, "-out=" + out, "-y4m=1"] + args,
                   capture_output=True)
    return open(out, "rb").read()


CASES = [
    ("tiny64x48_420_6f.y4m", 60, 0, {}, ["-qp=60", "-gop=0"]),
    ("tiny64x48_420_6f.y4m", 60, 48, {}, ["-qp=60", "-gop=48"]),
    ("tiny64x48_420_6f.y4m", 100, 48, {}, ["-qp=100", "-gop=48"]),
    ("odd100x62_420_4f.y4m", 60, 48, {}, ["-qp=60", "-gop=48"]),
    ("tiny64x48_422_4f.y4m", 60, 48, {}, ["-qp=60", "-gop=48"]),
    ("tiny64x48_420_6f.y4m", 60, 48, {"do_psy": 0}, ["-qp=60", "-gop=48",
                                                     "-psy=0"]),
    ("tiny64x48_420_6f.y4m", 60, 48, {"effort": 5}, ["-qp=60", "-gop=48",
                                                     "-effort=5"]),
    ("tiny64x48_420_6f.y4m", 30, 48, {"rc_mode": K.RC_CQP},
     ["-qp=30", "-gop=48", "-rc_mode=2"]),
]


@pytest.mark.parametrize("fixture,qp,gop,kw,args", CASES)
def test_encode_matches_reference(ref_build, fixtures_dir, tmp_path,
                                  fixture, qp, gop, kw, args):
    src = os.path.join(fixtures_dir, fixture)
    want = ref_encode(ref_build, src, str(tmp_path / "r.dsv"), args)
    got = our_encode(src, qp, gop, **kw)
    assert got == want, (len(got), len(want))
