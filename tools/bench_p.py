#!/usr/bin/env python
"""Lockstep P-frame throughput benchmark.

Encodes N independent CIF GOP streams with lockstep device batching
(vmapped wavefront HME + frame steps) and reports aggregate fps, plus the
single-stream sequential baseline for comparison.

usage: bench_p.py [width] [gop] [frames_per_stream]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    gop = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    groups = int(os.environ.get("DSV2_BENCHP_GROUPS", "1"))
    plat = os.environ.get("DSV2_JAX_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    import mkfixtures
    from dsv2_tpu.utils import y4m
    from dsv2_tpu.utils.packet import VideoMeta
    from dsv2_tpu.cli import make_encoder, default_enc_opts
    from dsv2_tpu.parallel.dynbatch import encode_streams_lockstep

    res = os.environ.get("DSV2_BENCHP_RES", "352x288")
    W, H = (int(v) for v in res.split("x"))
    n = width * groups * gop
    path = f"/tmp/dsv2_benchp_{W}x{H}_{n}.y4m"
    if not os.path.exists(path):
        mkfixtures.write_y4m(path, W, H, n)
    frames = []
    with open(path, "rb") as f:
        rdr = y4m.Y4MReader(f)
        while True:
            p = rdr.read_frame()
            if p is None:
                break
            frames.append(p)
    meta = VideoMeta(width=W, height=H, subsamp=rdr.subsamp,
                     fps_num=rdr.fps[0], fps_den=rdr.fps[1])
    streams = [frames[i:i + gop] for i in range(0, n, gop)]

    backend = (os.environ.get("DSV2_BENCHP_HME")
               or os.environ.get("DSV2_HME") or "auto")

    def factory():
        enc = make_encoder(meta, default_enc_opts(qp=60, gop=gop))
        enc.hme_backend = backend
        return enc

    # sequential single-stream baseline (host HME); warm the jit caches
    # over a full GOP (frame 3+ hits the temporal-candidate program
    # variant — warming only two frames left its compile in the timing)
    enc = make_encoder(meta, default_enc_opts(qp=60, gop=gop))
    for fr in streams[0]:
        enc.encode_frame(fr)
    enc = make_encoder(meta, default_enc_opts(qp=60, gop=gop))
    t0 = time.perf_counter()
    for fr in streams[0]:
        enc.encode_frame(fr)
    seq = gop / (time.perf_counter() - t0)
    print(f"sequential single-stream (host HME): {seq:.2f} fps")

    # lockstep warmup (compile) then timed; stage stats cover ONLY the
    # timed run (DSV2_TRACE=1)
    nst = width * groups
    encode_streams_lockstep(streams[:nst], factory, width=width,
                            groups=groups)
    from dsv2_tpu.utils import trace
    trace._acc.clear()
    trace._cnt.clear()
    t0 = time.perf_counter()
    out = encode_streams_lockstep(streams[:nst], factory, width=width,
                                  groups=groups)
    dt = time.perf_counter() - t0
    total = nst * gop
    print(f"lockstep x{width}g{groups} ({backend} HME, {W}x{H}): "
          f"{total / dt:.2f} fps aggregate "
          f"({total} frames in {dt:.1f}s, {sum(len(o) for o in out)} bytes)")


if __name__ == "__main__":
    main()
