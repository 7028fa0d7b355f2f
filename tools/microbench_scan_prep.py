#!/usr/bin/env python
"""Microbenchmark the data-parallel pieces of the scan-blob prep at
1080p-luma scale, to attribute the ~78 ms of non-vk, non-emission cost.

usage: tools/microbench_scan_prep.py [total] [density]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from dsv2_tpu.ops import scan_pl

    total = int(sys.argv[1]) if len(sys.argv) > 1 else 1920 * 1080
    density = float(sys.argv[2]) if len(sys.argv) > 2 else 0.15

    rng = np.random.default_rng(7)
    v = np.where(rng.random(total) < density,
                 rng.integers(-100, 100, total), 0).astype(np.int32)
    vj = jax.device_put(v)
    TP = scan_pl._chunk_sizes(total, 0)[2]

    def cumsum_only(v):
        nz = v != 0
        return jnp.cumsum(nz, dtype=jnp.int32)[-1]

    def scatter_rows4(v):
        nz = v != 0
        rank = jnp.cumsum(nz, dtype=jnp.int32) - 1
        tgt = jnp.where(nz, rank, TP)
        idxs = jnp.arange(total, dtype=jnp.int32)
        rows = jnp.stack([v, idxs, idxs, jnp.zeros(total, jnp.int32)],
                         axis=1)
        comp = jnp.zeros((TP, 4), jnp.int32).at[tgt].set(rows, mode="drop")
        return comp.sum()

    def scatter_col1(v):
        nz = v != 0
        rank = jnp.cumsum(nz, dtype=jnp.int32) - 1
        tgt = jnp.where(nz, rank, TP)
        comp = jnp.zeros(TP, jnp.int32).at[tgt].set(v, mode="drop")
        return comp.sum()

    def gather_back(v):
        nz = v != 0
        rank = jnp.cumsum(nz, dtype=jnp.int32) - 1
        src = jnp.clip(rank, 0, TP - 1)
        small = jnp.arange(TP, dtype=jnp.int32)
        return small[src].sum()

    def elementwise(v):
        u = jnp.where(v >= 0, 2 * v, -2 * v - 1)
        um1 = jnp.maximum(u - 1, 0)
        e = scan_pl._ilog2(um1)
        lo, hi, ln = scan_pl._ueg_pattern(jnp.abs(v))
        return (e + ln).sum() + (lo ^ hi).sum()

    def force(out):
        np.asarray(jnp.ravel(out)[0])

    def bench(name, fn, *args):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        force(f(*args))
        c = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            force(f(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:14s} steady {best * 1000:8.2f} ms   "
              f"(compile+first {c:5.1f}s)", flush=True)

    bench("cumsum", cumsum_only, vj)
    bench("scatter_rows4", scatter_rows4, vj)
    bench("scatter_col1", scatter_col1, vj)
    bench("gather_back", gather_back, vj)
    bench("elementwise", elementwise, vj)


if __name__ == "__main__":
    main()
