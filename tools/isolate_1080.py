#!/usr/bin/env python
"""Isolate the 1080p intra device-step cost per transfer mode on the
current backend (run on TPU to profile regressions).

usage: tools/isolate_1080.py [blob|dense|packed] [chunk]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

mode = sys.argv[1] if len(sys.argv) > 1 else "blob"
chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 8
os.environ["DSV2_XFER"] = mode

import numpy as np  # noqa: E402


def main():
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    import jax
    import mkfixtures
    from dsv2_tpu.utils import y4m
    from dsv2_tpu.utils.packet import VideoMeta
    from dsv2_tpu.cli import make_encoder, default_enc_opts
    from dsv2_tpu.parallel import batch as pb
    from dsv2_tpu.core.frame import B
    from dsv2_tpu.core import constants as K

    w, h, n = 1920, 1080, chunk
    path = f"/tmp/dsv2_bench_{w}x{h}_32.y4m"
    if not os.path.exists(path):
        mkfixtures.write_y4m(path, w, h, 32)
    frames = []
    with open(path, "rb") as f:
        rdr = y4m.Y4MReader(f)
        for _ in range(n):
            frames.append(rdr.read_frame())
    meta = VideoMeta(width=w, height=h, subsamp=rdr.subsamp,
                     fps_num=rdr.fps[0], fps_den=rdr.fps[1])
    enc = make_encoder(meta, default_enc_opts(qp=60, gop=0))
    ctx = pb._prep_chunk(enc, frames)
    datas, pcfg, p = ctx["datas"], ctx["pcfg"], ctx["p"]
    xs = [[], [], []]
    for d in datas:
        for c in range(3):
            cw, ch = pcfg.cdims[c]
            pw, ph = pcfg.pdims[c]
            arr = d.padded.planes[c]
            x = np.full((ch, cw), 128, dtype=np.uint8)
            x[:ph, :] = arr[B:B + ph, B:B + cw]
            xs[c].append(x)
    xs = [jax.device_put(np.stack(a)) for a in xs]
    bds = jax.device_put(np.stack(ctx["blockdatas"]))
    qs = jax.device_put(np.asarray(ctx["quants"], dtype=np.int32))
    fn = pb._device_batch_fn(meta.width, meta.height, meta.subsamp,
                             p.blk_w, p.blk_h, p.lossless, p.do_psy,
                             enc.gop != K.GOP_INTRA, ctx["analyze"])
    t0 = time.perf_counter()
    out = fn(xs[0], xs[1], xs[2], bds, qs)
    np.asarray(out[1])
    print(f"[{mode}] compile+first: {time.perf_counter() - t0:.2f}s")
    for _ in range(3):
        t0 = time.perf_counter()
        o = fn(xs[0], xs[1], xs[2], bds, qs)
        np.asarray(o[1])
        dt = time.perf_counter() - t0
        print(f"[{mode}] device step: {dt * 1000 / n:.1f} ms/frame "
              f"({n} frames)")


if __name__ == "__main__":
    main()
