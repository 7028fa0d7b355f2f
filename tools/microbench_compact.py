#!/usr/bin/env python
"""Compare device primitives for the scan compaction (the dominant term
of the on-device entropy scan at FHD: ~215 ms per 8-frame luma chunk as
two 1-column scatters).

Candidates, all producing (vals, pos) compacted-left over TP slots:
  scat2  : current — rank cumsum + two 1-column .at[tgt].set scatters
  sort3  : ONE stable lax.sort keyed on iszero with (v, idx) payloads
           (stable sort of a 0/1 key IS a left-compaction)
  cumsum : the rank cumsum alone (shared floor)

usage: tools/microbench_compact.py [total] [batch] [density%]
"""
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _sync(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, reps=5):
    _sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append((time.perf_counter() - t0) * 1000.0)
    return statistics.median(ts)


def main():
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from dsv2_tpu.ops import scan_pl

    total = int(sys.argv[1]) if len(sys.argv) > 1 else 2073600
    NB = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dens = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
    TP = scan_pl._chunk_sizes(total, 0)[2]
    print(f"# total={total} TP={TP} batch={NB} density={dens}% "
          f"backend={jax.default_backend()}", flush=True)

    rng = np.random.default_rng(0)
    v = np.where(rng.random((NB, total)) < dens / 100.0,
                 rng.integers(-100, 100, (NB, total)),
                 0).astype(np.int32)
    v = jax.device_put(v)

    t = timeit(jax.jit(lambda a: a + 1), jnp.zeros(8, jnp.int32))
    print(f"rtt floor   {t:8.2f} ms", flush=True)

    def cumsum(v):
        return jnp.cumsum(v != 0, axis=-1, dtype=jnp.int32)

    print(f"cumsum      {timeit(jax.jit(cumsum), v):8.2f} ms", flush=True)

    def scat2(v):
        idxs = jnp.arange(total, dtype=jnp.int32)
        nz = v != 0
        rank = jnp.cumsum(nz, dtype=jnp.int32) - 1
        tgt = jnp.where(nz, rank, TP)
        vals = jnp.zeros(TP, jnp.int32).at[tgt].set(v, mode="drop")
        pos = jnp.zeros(TP, jnp.int32).at[tgt].set(idxs, mode="drop")
        return vals, pos

    print(f"scat2       {timeit(jax.jit(jax.vmap(scat2)), v):8.2f} ms",
          flush=True)

    def sort3(v):
        idxs = jnp.arange(total, dtype=jnp.int32)
        key = (v == 0).astype(jnp.int32)
        _, sv, si = jax.lax.sort((key, v, idxs), num_keys=1,
                                 is_stable=True)
        vals = jnp.zeros(TP, jnp.int32).at[:total].set(sv)
        pos = jnp.zeros(TP, jnp.int32).at[:total].set(si)
        # zero out the dead tail so it matches scat2's zeros
        nruns = total - key.sum(dtype=jnp.int32)
        live = jnp.arange(TP, dtype=jnp.int32) < nruns
        return jnp.where(live, vals, 0), jnp.where(live, pos, 0)

    print(f"sort3       {timeit(jax.jit(jax.vmap(sort3)), v):8.2f} ms",
          flush=True)

    a = jax.jit(jax.vmap(scat2))(v)
    b = jax.jit(jax.vmap(sort3))(v)
    same = all(bool(jnp.array_equal(x, y)) for x, y in zip(a, b))
    print(f"sort3 == scat2: {same}", flush=True)


if __name__ == "__main__":
    main()
