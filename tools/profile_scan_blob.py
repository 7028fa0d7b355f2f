#!/usr/bin/env python
"""Micro-profile the on-device entropy-blob builder at 1080p-luma scale.

Times three jitted variants on the current backend to attribute the
device cost of ops/scan_pl.make_scan_blob:
  - vk_only:   the sequential rice-adaptation Pallas kernel alone
  - pre_emit:  everything up to (not including) the per-byte emission
  - full:      the complete blob builder

usage: tools/profile_scan_blob.py [total] [cap_bytes] [density]
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
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    density = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15

    # segment layout shaped like a real 1080p luma plane scan: one LL NEG
    # segment then HF rice segments with assorted damps
    nll = total // 64
    rest = total - nll
    segments = ((nll, -1), (rest // 4, 0), (rest // 4, 1),
                (rest - 2 * (rest // 4), 2))

    rng = np.random.default_rng(7)
    v = np.where(rng.random(total) < density,
                 rng.integers(-100, 100, total), 0).astype(np.int32)
    vj = jax.device_put(v)

    TP = scan_pl._pad_to(max(total, scan_pl._CHF), scan_pl._CHF)
    npad = TP

    def pre(v):
        """Everything up to (and including) the vk kernel, new layout."""
        v = v.astype(jnp.int32)
        idxs = jnp.arange(total, dtype=jnp.int32)
        nz = v != 0
        nruns = nz.sum(dtype=jnp.int32)
        nll = nz[:nll_seg].sum(dtype=jnp.int32)
        rank = jnp.cumsum(nz, dtype=jnp.int32) - 1
        tgt = jnp.where(nz, rank, TP)
        vals = jnp.zeros(TP, jnp.int32).at[tgt].set(v, mode="drop")
        pos = jnp.zeros(TP, jnp.int32).at[tgt].set(idxs, mode="drop")
        dmp = scan_pl._damp_of_pos(segments, pos)
        u = jnp.where(vals >= 0, 2 * vals, -2 * vals - 1)
        um1 = jnp.maximum(u - 1, 0)
        e = scan_pl._ilog2(um1)
        isr = (jnp.arange(TP) < nruns) & (dmp >= 0)
        dsafe = jnp.maximum(dmp, 0)
        thr = jnp.where(isr, (e + 1) << dsafe, 0)
        vk = scan_pl._vk_call(npad)(thr, nll, nruns)
        return nruns + vk.sum() + vals.sum() + pos.sum()

    nll_seg = segments[0][0]

    def vk_only(v):
        v = v.astype(jnp.int32)
        nz = v != 0
        u = jnp.where(v >= 0, 2 * v, -2 * v - 1)
        e = scan_pl._ilog2(jnp.maximum(u - 1, 0))
        thr = jnp.zeros(npad, jnp.int32).at[:total].set(
            jnp.where(nz, (e + 1), 0))
        k = scan_pl._vk_call(npad)(thr, jnp.int32(0),
                                   nz.sum(dtype=jnp.int32))
        return k.sum()

    full = scan_pl.make_scan_blob(segments, cap)

    def force(out):
        # block_until_ready is not a reliable fence through the axon
        # tunnel; a scalar d2h fetch is (adds one ~6 ms RTT to every
        # sample, same for all variants)
        leaves = [a for a in jax.tree_util.tree_leaves(out)
                  if hasattr(a, "block_until_ready")]
        np.asarray(jnp.ravel(leaves[-1])[0])

    def bench(name, fn, *args):
        t0 = time.perf_counter()
        force(fn(*args))
        print(f"{name:10s} compile+first: {time.perf_counter() - t0:6.2f}s")
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            force(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:10s} steady: {best * 1000:8.2f} ms")

    bench("vk_only", jax.jit(vk_only), vj)
    bench("pre_emit", jax.jit(pre), vj)
    bench("full", full, vj)


if __name__ == "__main__":
    main()
