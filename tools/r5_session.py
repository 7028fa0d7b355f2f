#!/usr/bin/env python
"""One-process round-5 TPU session: every remaining measurement/warm in
a single interpreter so the ~10-min first-remote-compile tunnel stall is
paid at most once (separate tool runs were each eating it).

  1. lockstep P profile (width 8, gop 48, CIF): stage table + fps
  2. parkrun compile warm: 4-lane 1280x720 gop=250 lockstep, few frames
     (fills .jax_cache so the bench's parkrun metric fits its cap)
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    import jax
    import mkfixtures
    from dsv2_tpu.utils import y4m, trace
    from dsv2_tpu.utils.packet import VideoMeta
    from dsv2_tpu.cli import make_encoder, default_enc_opts
    from dsv2_tpu.parallel import dynbatch

    print(f"# backend={jax.default_backend()}", flush=True)

    def read_frames(path):
        frames = []
        with open(path, "rb") as f:
            rdr = y4m.Y4MReader(f)
            while True:
                p = rdr.read_frame()
                if p is None:
                    break
                frames.append(p)
        return frames, rdr

    def lockstep_run(W, H, gop, width, nframes_per, label, timed):
        n = width * nframes_per
        path = f"/tmp/dsv2_r5s_{W}x{H}_{n}.y4m"
        if not os.path.exists(path):
            mkfixtures.write_y4m(path, W, H, n)
        frames, rdr = read_frames(path)
        meta = VideoMeta(width=W, height=H, subsamp=rdr.subsamp,
                         fps_num=rdr.fps[0], fps_den=rdr.fps[1])
        streams = [frames[i:i + nframes_per] for i in range(0, n,
                                                            nframes_per)]

        def factory():
            return make_encoder(meta, default_enc_opts(qp=60, gop=gop))

        t0 = time.perf_counter()
        dynbatch.encode_streams_lockstep(streams, factory, width=width)
        dt = time.perf_counter() - t0
        print(f"{label} warm: {dt:.1f}s", flush=True)
        if not timed:
            return
        trace.enable()
        trace._acc.clear()
        trace._cnt.clear()
        t0 = time.perf_counter()
        outs = dynbatch.encode_streams_lockstep(streams, factory,
                                                width=width)
        dt = time.perf_counter() - t0
        nb = sum(len(o) for o in outs)
        print(f"{label}: {n / dt:.2f} fps aggregate ({n} frames in "
              f"{dt:.1f}s, {nb} bytes)", flush=True)
        trace.report(sys.stdout)
        trace.enable(False)

    # 1. CIF lockstep profile (bench config 1 geometry)
    lockstep_run(352, 288, 48, 8, 48, "cif_gop48_x8", timed=True)
    # 2. parkrun compile warm (bench config 4 geometry, tiny frame count)
    lockstep_run(1280, 720, 250, 4, 6, "parkrun_warm", timed=False)
    print("SESSION_DONE", flush=True)


if __name__ == "__main__":
    main()
