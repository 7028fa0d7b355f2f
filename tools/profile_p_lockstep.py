#!/usr/bin/env python
"""Lockstep P-path profile: stage attribution without the sequential
host-HME baseline (bench_p.py's baseline phase compiles host-path
programs over the tunnel's remote_compile — minutes of dead time when
profiling the lockstep path only).

usage: profile_p_lockstep.py [width] [gop] [res WxH] [backend]

Prints the lockstep stage table (stack/dispatch/run/post per key) for
ONE timed pass, plus aggregate fps. DSV2_FLUSHLOG=1 adds per-flush
lines. Optionally DSV2_PROF_HOST=1 merges per-thread cProfile stats of
the encoder threads (host-side attribution).
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    gop = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    res = sys.argv[3] if len(sys.argv) > 3 else "352x288"
    backend = sys.argv[4] if len(sys.argv) > 4 else "auto"
    plat = os.environ.get("DSV2_JAX_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    import mkfixtures
    from dsv2_tpu.utils import y4m, trace
    from dsv2_tpu.utils.packet import VideoMeta
    from dsv2_tpu.cli import make_encoder, default_enc_opts
    from dsv2_tpu.parallel import dynbatch

    W, H = (int(v) for v in res.split("x"))
    n = width * gop
    path = f"/tmp/dsv2_bench_{W}x{H}_{n}.y4m"
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

    def factory():
        enc = make_encoder(meta, default_enc_opts(qp=60, gop=gop))
        enc.hme_backend = backend
        return enc

    prof_host = bool(int(os.environ.get("DSV2_PROF_HOST", "0") or 0))
    if prof_host:
        import cProfile
        import pstats
        import threading
        profs = []
        plock = threading.Lock()
        orig_run = dynbatch.encode_streams_lockstep

        def profiled_lockstep(streams, factory, width=None, mesh=None):
            # clone of encode_streams_lockstep with per-thread profiles
            import threading as th
            nn = len(streams)
            w = width or nn
            batcher = dynbatch.LockstepBatcher(w, mesh=mesh)
            results = [None] * nn
            errors = []

            def run(i):
                pr = cProfile.Profile()
                batcher.thread_begin()
                try:
                    enc = factory()
                    enc.dev_submit = batcher.submit
                    chunks = []
                    pr.enable()
                    for fr in streams[i]:
                        chunks.extend(enc.encode_frame(fr))
                    pr.disable()
                    results[i] = b"".join(chunks)
                except BaseException as exc:
                    errors.append(exc)
                finally:
                    batcher.thread_done()
                with plock:
                    profs.append(pr)

            ts = [th.Thread(target=run, args=(i,)) for i in range(nn)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            if errors:
                raise errors[0]
            return results
        lockstep = profiled_lockstep
    else:
        lockstep = dynbatch.encode_streams_lockstep

    print(f"warm pass ({backend}, {W}x{H}, gop={gop} x{width})...",
          flush=True)
    t0 = time.perf_counter()
    dynbatch.encode_streams_lockstep(streams[:width],
                                     factory, width=width)
    print(f"warm: {time.perf_counter() - t0:.1f}s", flush=True)

    trace.enable()
    trace._acc.clear()
    trace._cnt.clear()
    t0 = time.perf_counter()
    out = lockstep(streams[:width], factory, width=width)
    dt = time.perf_counter() - t0
    total = width * gop
    print(f"lockstep x{width} ({backend}, {W}x{H}): "
          f"{total / dt:.2f} fps aggregate "
          f"({total} frames in {dt:.1f}s, "
          f"{sum(len(o) for o in out)} bytes)", flush=True)
    trace.report(sys.stdout)
    trace.enable(False)
    trace._acc.clear()
    trace._cnt.clear()

    if prof_host:
        import pstats
        st = pstats.Stats(profs[0])
        for p in profs[1:]:
            st.add(p)
        st.sort_stats("cumulative")
        print("--- merged per-thread host profile (top 40 cumulative) ---")
        st.print_stats(40)
        st.sort_stats("tottime")
        print("--- top 40 tottime ---")
        st.print_stats(40)


if __name__ == "__main__":
    main()
