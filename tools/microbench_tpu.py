#!/usr/bin/env python
"""Micro-benchmark the TPU tunnel + intra device program in isolation:
h2d/d2h bandwidth, dispatch RTT, and the batched intra step's device-only
time (block_until_ready, no fetch). Separates 'fetch' (compute+transfer)
into its parts so optimization targets the right cost.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    import jax
    import jax.numpy as jnp
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # RTT: tiny array round trip
    t = jnp.zeros((8,), jnp.int32)
    t.block_until_ready()
    for sz, name in ((8, "rtt_tiny"), (1 << 20, "d2h_1MB"),
                     (8 << 20, "d2h_8MB")):
        a = jnp.zeros((sz,), jnp.uint8)
        a.block_until_ready()
        n = 20 if sz == 8 else 5
        t0 = time.perf_counter()
        for _ in range(n):
            np.asarray(a)
        dt = (time.perf_counter() - t0) / n
        mbs = sz / dt / 1e6
        print(f"{name}: {dt*1e3:.2f} ms  ({mbs:.1f} MB/s)", flush=True)

    for sz, name in ((1 << 20, "h2d_1MB"), (8 << 20, "h2d_8MB")):
        h = np.zeros((sz,), np.uint8)
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            jax.device_put(h).block_until_ready()
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:.2f} ms  ({sz/dt/1e6:.1f} MB/s)", flush=True)

    # dispatch RTT: trivial jitted op, blocking
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.int32)
    f(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        f(x).block_until_ready()
    print(f"dispatch_rtt: {(time.perf_counter()-t0)/20*1e3:.2f} ms",
          flush=True)

    # the intra batched device program, device-only time
    from dsv2_tpu.parallel.batch import _device_batch_fn
    from dsv2_tpu.core import constants as K
    W, H, CH = 352, 288, 16
    fn = _device_batch_fn(W, H, K.SUBSAMP_420, 16, 16, 0, 1, False, True)
    rng = np.random.default_rng(7)
    xs0 = jax.device_put(rng.integers(0, 256, (CH, H, W), dtype=np.uint8))
    xs1 = jax.device_put(rng.integers(0, 256, (CH, H//2, W//2), dtype=np.uint8))
    xs2 = jax.device_put(rng.integers(0, 256, (CH, H//2, W//2), dtype=np.uint8))
    bds = jax.device_put(np.zeros((CH, 18, 22), dtype=np.uint8))
    qs = jax.device_put(np.full((CH,), 1024, np.int32))
    t0 = time.perf_counter()
    outs = fn(xs0, xs1, xs2, bds, qs)
    jax.block_until_ready(outs)
    print(f"intra_batch compile+run: {time.perf_counter()-t0:.1f} s",
          flush=True)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(xs0, xs1, xs2, bds, qs))
    dt = (time.perf_counter() - t0) / n
    print(f"intra_batch device-only: {dt*1e3:.1f} ms/chunk "
          f"({dt/CH*1e3:.2f} ms/frame, {CH/dt:.1f} fps)", flush=True)

    # end-to-end per-chunk transfer volume estimate
    buf, smalls, pxs, fbs, flbd = outs
    print(f"packed buf cap: {buf.shape} smalls: {smalls.shape}", flush=True)


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def profile_intra(outdir="/tmp/xprof_intra"):
    """Capture a device profile of the batched intra program."""
    import shutil
    import jax
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    from dsv2_tpu.parallel.batch import _device_batch_fn
    from dsv2_tpu.core import constants as K
    W, H, CH = 352, 288, 16
    fn = _device_batch_fn(W, H, K.SUBSAMP_420, 16, 16, 0, 1, False, True)
    rng = np.random.default_rng(7)
    xs0 = jax.device_put(rng.integers(0, 256, (CH, H, W), dtype=np.uint8))
    xs1 = jax.device_put(rng.integers(0, 256, (CH, H//2, W//2), dtype=np.uint8))
    xs2 = jax.device_put(rng.integers(0, 256, (CH, H//2, W//2), dtype=np.uint8))
    bds = jax.device_put(np.zeros((CH, 18, 22), dtype=np.uint8))
    qs = jax.device_put(np.full((CH,), 1024, np.int32))
    jax.block_until_ready(fn(xs0, xs1, xs2, bds, qs))
    shutil.rmtree(outdir, ignore_errors=True)
    with jax.profiler.trace(outdir):
        for _ in range(3):
            jax.block_until_ready(fn(xs0, xs1, xs2, bds, qs))
    print("profile written to", outdir, flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "profile":
    profile_intra()


def bench_filters():
    """Time the wavefront filter + frame graphs standalone on the chip:
    they are sequential over ~ntx+2*nty diagonals, so per-iteration loop
    overhead decides whether the device-resident recon chain pays off."""
    import time
    import jax
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    from dsv2_tpu.ops import filters, framedev

    rng = np.random.default_rng(3)
    W, H, NBH, NBV = 352, 288, 22, 18
    vis = rng.integers(0, 256, (H, W), dtype=np.uint8)
    bd = rng.integers(0, 256, (NBV, NBH), dtype=np.uint8)
    g = lambda lo, hi: rng.integers(lo, hi, (NBV, NBH)).astype(np.int32)

    def timeit(name, fn, *args):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:.2f} ms (compile {compile_s:.1f}s)",
              flush=True)

    timeit("intra_filter 352x288", filters.make_intra_filter(W, H, NBH, NBV),
           vis, bd, np.int32(1100), np.int32(128))
    timeit("luma_filter 352x288",
           filters.make_luma_filter(W, H, NBH, NBV, 16, 16, 1),
           vis, g(-40, 41), g(-40, 41), g(0, 2), g(0, 16),
           np.int32(1100), np.int32(128), np.int32(1), np.int32(1))
    cvis = rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8)
    timeit("chroma_filter 176x144",
           filters.make_chroma_filter(W // 2, H // 2, NBH, NBV, 8, 8),
           cvis, g(-40, 41), g(-40, 41), g(0, 2), np.int32(1100))
    ext = jax.jit(lambda v: framedev.extend_plane_graph(v, W, H))
    timeit("extend 352x288", ext, vis)
    bordered = np.asarray(ext(vis))
    pyr = jax.jit(lambda b: framedev.pyramid_graph(b, W, H, 3))
    timeit("pyramid3 352x288", pyr, bordered)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "filters":
    bench_filters()


def bench_pstep(width=8, profile=False):
    """Time the vmapped P encode step standalone, and optionally capture a
    device profile: separates MC-gather cost from SBT/quant."""
    import time
    import shutil
    import jax
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    from dsv2_tpu.codec import devsteps
    from dsv2_tpu.core import constants as K
    from dsv2_tpu.core.frame import B

    W, H = 352, 288
    NBH, NBV = 22, 18
    rng = np.random.default_rng(11)
    fn = jax.vmap(devsteps.make_p_encode_step(W, H, K.SUBSAMP_420,
                                              16, 16, 0, 1))
    g = lambda lo, hi: rng.integers(lo, hi, (width, NBV, NBH)).astype(np.int32)
    srcs = tuple(rng.integers(0, 256, (width, NBV * bh, NBH * bw),
                              dtype=np.uint8)
                 for bw, bh in ((16, 16), (8, 8), (8, 8)))
    refs = tuple(rng.integers(0, 256, (width, ph + 2 * B, pw + 2 * B),
                              dtype=np.uint8)
                 for pw, ph in ((W, H), (W // 2, H // 2), (W // 2, H // 2)))
    args = (srcs, refs, g(-40, 41), g(-40, 41), g(0, 2), g(0, 16),
            g(0, 1024), rng.integers(0, 256, (width, NBV, NBH),
                                     dtype=np.uint8),
            np.zeros((width, NBV, NBH), bool),
            np.zeros((width, NBV, NBH), bool),
            np.full((width,), 1024, np.int32), np.ones((width,), np.int32))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    print(f"p_step x{width} compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"p_step x{width}: {dt*1e3:.1f} ms/flush "
          f"({dt/width*1e3:.2f} ms/frame)", flush=True)
    if profile:
        outdir = "/tmp/xprof_pstep"
        shutil.rmtree(outdir, ignore_errors=True)
        with jax.profiler.trace(outdir):
            for _ in range(2):
                jax.block_until_ready(fn(*args))
        print("profile:", outdir, flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "pstep":
    bench_pstep(int(sys.argv[2]) if len(sys.argv) > 2 else 8,
                profile=len(sys.argv) > 3)


def bench_wave(width=8):
    """Ground-truth timing of the wave-HME program: standalone, fresh
    inputs per call, separating dispatch (host) from execution (device)."""
    import time
    import jax
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    from dsv2_tpu.ops import hme_wave
    from dsv2_tpu.core import constants as K
    from dsv2_tpu.core.frame import B
    from dsv2_tpu.core import intmath as im

    W, H, NBH, NBV, LV = 352, 288, 22, 18, 3
    dims = [(W, H)]
    w_, h_ = W, H
    for _ in range(LV):
        w_, h_ = im.round_shift(w_, 1), im.round_shift(h_, 1)
        dims.append((w_, h_))
    cfg = hme_wave.WaveCfg(NBH, NBV, 16, 16, W, H, K.SUBSAMP_420,
                           10, False, LV, True, False, tuple(dims))
    fn = hme_wave.make_motion_est(cfg)
    if width > 1:
        fn = jax.jit(jax.vmap(fn))
    rng = np.random.default_rng(4)

    def mk():
        def planes(dms, border=True):
            return tuple(rng.integers(
                0, 256, (width, dh + 2 * B, dw + 2 * B), dtype=np.uint8)
                for (dw, dh) in dms)
        cdims = [(w2 // 2, h2 // 2) for (w2, h2) in dims[:1]]
        cpl = lambda: rng.integers(
            0, 256, (width, dims[0][1] // 2 + 2 * B,
                     dims[0][0] // 2 + 2 * B), dtype=np.uint8)
        g = lambda: rng.integers(-40, 41, (width, NBV, NBH)).astype(np.int32)
        a = (planes(dims), planes(dims), planes(dims),
             cpl(), cpl(), cpl(), cpl(), g(), g(),
             np.full((width,), 1024, np.int32),
             np.zeros((width,), np.int32))
        if width == 1:
            a = jax.tree_util.tree_map(lambda x: x[0], a)
        return a

    t0 = time.perf_counter()
    jax.block_until_ready(fn(*mk()))
    print(f"wave x{width} compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    for trial in range(3):
        a = mk()
        t0 = time.perf_counter()
        r = fn(*a)
        disp = time.perf_counter() - t0
        jax.block_until_ready(r)
        tot = time.perf_counter() - t0
        print(f"wave x{width} trial {trial}: total {tot*1e3:.0f} ms "
              f"({tot/width*1e3:.1f} ms/frame), dispatch {disp*1e3:.0f} ms",
              flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "wave":
    bench_wave(int(sys.argv[2]) if len(sys.argv) > 2 else 8)


def bench_wave_real(width=8):
    """bench_wave with REAL video content: the per-block refinement
    while_loops are data-dependent, so noise inputs (instant convergence)
    wildly understate the runtime on structured motion."""
    import time
    import jax
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import mkfixtures
    from dsv2_tpu.ops import hme_wave
    from dsv2_tpu.core import constants as K
    from dsv2_tpu.core.frame import Frame
    from dsv2_tpu.core import intmath as im

    W, H, NBH, NBV, LV = 352, 288, 22, 18, 3
    dims = [(W, H)]
    w_, h_ = W, H
    for _ in range(LV):
        w_, h_ = im.round_shift(w_, 1), im.round_shift(h_, 1)
        dims.append((w_, h_))
    cfg = hme_wave.WaveCfg(NBH, NBV, 16, 16, W, H, K.SUBSAMP_420,
                           10, False, LV, True, False, tuple(dims))
    fn = jax.jit(jax.vmap(hme_wave.make_motion_est(cfg)))

    rng = np.random.default_rng(0xD5F2)

    def pyr_frames(t):
        y, u, v = mkfixtures.synth_frame(W, H, t, rng)
        u = mkfixtures.subsample(u, 1, 1)
        v = mkfixtures.subsample(v, 1, 1)
        f = Frame(K.SUBSAMP_420, W, H, border=True)
        f.load((y, u, v))
        f.extend()
        pyr = [f]
        prev = f
        for i in range(LV):
            g = Frame(K.SUBSAMP_420, im.round_shift(W, i + 1),
                      im.round_shift(H, i + 1), border=True)
            from dsv2_tpu.core.frame import ds2x_luma
            ds2x_luma(g, prev)
            g.extend(luma_only=True)
            pyr.append(g)
            prev = g
        return pyr

    def mk(t0):
        lanes = []
        for k in range(width):
            sp = pyr_frames(t0 + 2 * k + 1)
            rp = pyr_frames(t0 + 2 * k)
            lanes.append((
                tuple(f.planes[0] for f in sp),
                tuple(f.planes[0] for f in rp),
                tuple(f.planes[0] for f in rp),
                sp[0].planes[1], sp[0].planes[2],
                rp[0].planes[1], rp[0].planes[2],
                np.zeros((NBV, NBH), np.int32),
                np.zeros((NBV, NBH), np.int32),
                np.int32(1024), np.int32(0)))
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *lanes)

    t0 = time.perf_counter()
    jax.block_until_ready(fn(*mk(0)))
    print(f"wave-real x{width} warmup: {time.perf_counter()-t0:.1f}s",
          flush=True)
    for trial in range(3):
        a = mk(16 * (trial + 1))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        tot = time.perf_counter() - t0
        print(f"wave-real x{width} trial {trial}: {tot*1e3:.0f} ms "
              f"({tot/width*1e3:.1f} ms/frame)", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "wavereal":
    bench_wave_real(int(sys.argv[2]) if len(sys.argv) > 2 else 8)
