#!/usr/bin/env python
"""1080p intra encode: ours (batched TPU pipeline) vs single-thread C."""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

W, H, N = 1920, 1080, 32
ARGS = ["-qp=60", "-gop=0"]


def main():
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    import mkfixtures
    path = f"/tmp/dsv2_bench_fhd{N}.y4m"
    if not os.path.exists(path):
        mkfixtures.write_y4m(path, W, H, N)
    ref_dir = subprocess.run([os.path.join(REPO, "tools", "build_ref.sh")],
                             capture_output=True, text=True,
                             check=True).stdout.strip()
    t0 = time.perf_counter()
    subprocess.run([os.path.join(ref_dir, "dsv2"), "e", "-y",
                    "-inp=" + path, "-out=/tmp/fhd_ref.dsv", "-y4m=1"]
                   + ARGS, capture_output=True)
    c_fps = N / (time.perf_counter() - t0)
    print(f"C: {c_fps:.2f} fps", flush=True)

    from dsv2_tpu.utils import y4m
    from dsv2_tpu.utils.packet import VideoMeta
    from dsv2_tpu.cli import make_encoder, default_enc_opts
    from dsv2_tpu.parallel.batch import encode_intra_batch
    frames = []
    with open(path, "rb") as f:
        rdr = y4m.Y4MReader(f)
        while True:
            p = rdr.read_frame()
            if p is None:
                break
            frames.append(p)
    meta = VideoMeta(width=W, height=H, subsamp=rdr.subsamp,
                     fps_num=rdr.fps[0], fps_den=rdr.fps[1],
                     aspect_num=rdr.aspect[0], aspect_den=rdr.aspect[1])

    def mk():
        return make_encoder(meta, default_enc_opts(qp=60, gop=0))

    t0 = time.perf_counter()
    encode_intra_batch(mk(), frames, chunk=8)
    print(f"warmup {time.perf_counter()-t0:.1f}s", flush=True)
    enc = mk()
    t0 = time.perf_counter()
    out = encode_intra_batch(enc, frames, chunk=8)
    out += enc.end_of_stream()
    dt = time.perf_counter() - t0
    fps = N / dt
    ours = b"".join(out)
    want = open("/tmp/fhd_ref.dsv", "rb").read()
    print(f"ours: {fps:.2f} fps  vs_baseline {fps/c_fps:.3f}  "
          f"bytes_equal={ours == want}", flush=True)


if __name__ == "__main__":
    main()
