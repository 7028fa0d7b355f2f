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
