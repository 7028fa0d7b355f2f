#!/usr/bin/env python
"""Microbenchmark the sparse primitives the blob emission redesign would
lean on, on the current backend (run on TPU).

Each case reports steady-state ms (best of 3, forced by a scalar d2h
fetch, ~6 ms tunnel RTT included in every sample — compare cases, not
absolutes).
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

    N = 1 << 19          # ~512k output bytes / queries
    M = 1 << 20          # record-table rows
    rng = np.random.default_rng(3)
    idx = jax.device_put(rng.integers(0, M, N).astype(np.int32))
    tab1 = jax.device_put(rng.integers(0, 1 << 30, M).astype(np.int32))
    tab8 = jax.device_put(
        rng.integers(0, 1 << 30, (M, 8)).astype(np.int32))
    vals = jax.device_put(rng.integers(0, 255, N).astype(np.int32))
    sorted_tab = jax.device_put(
        np.sort(rng.integers(0, 8 * N, M)).astype(np.int32))
    q = jax.device_put((np.arange(N) * 8).astype(np.int32))

    def force(x):
        np.asarray(jnp.ravel(x)[0])

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
        print(f"{name:28s} {best * 1000:9.2f} ms   (compile {c:5.1f}s)")

    bench("gather_1w", lambda t, i: jnp.take(t, i, axis=0).sum(), tab1, idx)
    bench("gather_8w", lambda t, i: jnp.take(t, i, axis=0).sum(), tab8, idx)
    bench("gather_8w_x6",
          lambda t, i: sum(jnp.take(t, i + k, axis=0,
                                    mode="clip").sum() for k in range(6)),
          tab8, idx)
    bench("scatter_add_1w",
          lambda i, v: jnp.zeros(M, jnp.int32).at[i].add(v), idx, vals)
    bench("scatter_max_1w",
          lambda i, v: jnp.full(M, -1, jnp.int32).at[i].max(v), idx, vals)
    bench("scatter_set_8w",
          lambda i, t: jnp.zeros((M, 8), jnp.int32).at[idx].set(
              t[:N]), idx, tab8)
    bench("cumsum_2m",
          lambda v: jnp.cumsum(
              jnp.tile(v, 4), dtype=jnp.int32)[-1], vals)
    bench("cummax_1m",
          lambda v: jax.lax.cummax(jnp.tile(v, 2))[-1], vals)
    bench("searchsorted",
          lambda s, qq: jnp.searchsorted(s, qq, side="right").sum(),
          sorted_tab, q)
    bench("alu_50pass",
          lambda v: sum((v * (k + 1) >> 3).sum() for k in range(50)), vals)


def extra():
    """Round 2: compaction-shaped patterns — sorted/unique scatter flags,
    tile sort, packed sort."""
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    T = 1 << 21          # dense plane size (1080p luma scale)
    rng = np.random.default_rng(5)
    v_np = np.where(rng.random(T) < 0.15,
                    rng.integers(-100, 100, T), 0).astype(np.int32)
    v = jax.device_put(v_np)

    def force(x):
        np.asarray(jnp.ravel(x)[0])

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
        print(f"{name:28s} {best * 1000:9.2f} ms   (compile {c:5.1f}s)")

    bench("floor_noop", lambda x: x[:8] + 1, v)

    def compact_plain(v):
        nz = v != 0
        rank = jnp.cumsum(nz, dtype=jnp.int32) - 1
        tgt = jnp.where(nz, rank, T)
        return jnp.zeros(T, jnp.int32).at[tgt].set(v, mode="drop")

    bench("compact_set_plain", compact_plain, v)

    def compact_add(v):
        nz = v != 0
        rank = jnp.cumsum(nz, dtype=jnp.int32) - 1
        tgt = jnp.where(nz, rank, T)
        return jnp.zeros(T, jnp.int32).at[tgt].add(v, mode="drop")

    bench("compact_add", compact_add, v)

    def compact_add2(v):
        nz = v != 0
        rank = jnp.cumsum(nz, dtype=jnp.int32) - 1
        tgt = jnp.where(nz, rank, T)
        a = jnp.zeros(T, jnp.int32).at[tgt].add(v, mode="drop")
        b = jnp.zeros(T, jnp.int32).at[tgt].add(
            jnp.arange(T, dtype=jnp.int32), mode="drop")
        return a[:8] + b[:8]

    bench("compact_add_x2", compact_add2, v)

    def tile_sort_packed(v):
        # pack (dead flag, local idx, u8 val) and sort within 1024-tiles
        nt = T // 1024
        loc = jnp.tile(jnp.arange(1024, dtype=jnp.int32), nt)
        key = (((v == 0).astype(jnp.int32) << 20)
               | (loc << 8) | (v & 0xFF))
        s = jnp.sort(key.reshape(nt, 1024), axis=1)
        return s.reshape(-1)

    bench("tile_sort_packed", tile_sort_packed, v)

    def tile_sort_variadic(v):
        nt = T // 1024
        k = (v == 0).astype(jnp.int32).reshape(nt, 1024)
        idx = jnp.arange(T, dtype=jnp.int32).reshape(nt, 1024)
        ks, vs, xs = jax.lax.sort(
            (k, v.reshape(nt, 1024), idx), dimension=1, num_keys=1,
            is_stable=True)
        return vs.reshape(-1)[:8] + xs.reshape(-1)[:8] + ks.reshape(-1)[:8]

    bench("tile_sort_variadic", tile_sort_variadic, v)

    bench("cummax_3m",
          lambda x: jax.lax.cummax(jnp.tile(x, 2))[-1:], v[:T // 2 * 3])

    def exp_scatter_cummax(v):
        # scatter 2k tile offsets + cummax expand (the per-slot tile-id
        # trick)
        nt = T // 1024
        cnt = (v.reshape(nt, 1024) != 0).sum(axis=1, dtype=jnp.int32)
        off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(cnt)[:-1]])
        tid = jnp.zeros(T, jnp.int32).at[off].max(
            jnp.arange(nt, dtype=jnp.int32))
        return jax.lax.cummax(tid)[:8]

    bench("exp_scatter_cummax", exp_scatter_cummax, v)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "extra":
        extra()
        sys.exit()
    main()
