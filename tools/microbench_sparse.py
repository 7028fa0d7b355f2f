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


if __name__ == "__main__":
    main()
