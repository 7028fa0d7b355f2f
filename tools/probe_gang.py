#!/usr/bin/env python
"""Mosaic cost probes for the gang-packed HME kernel design.

The pallas wave-HME kernel (ops/hme_pallas) processes one 16x16 block per
scalar loop iteration; metrics on (16, 16) windows use 2 vregs at 12.5%
lane occupancy. Before rebuilding the kernel around lane-ganged groups
(G blocks packed along the 128-lane axis), measure on the real chip:

  1. per-block loop: read (overfetch+roll) + metric chain + scalar write,
     one block per iteration  -- the current design's cost model
  2. ganged: G reads -> concat (16, 16G) -> ONE metric chain -> per-lane
     masked-reduction scalar extraction -- the proposed design
  3. reads-only and compute-only variants of both, splitting the cost
  4. VMEM scalar load at a computed index (vector->scalar boundary)

usage: DSV2_JAX_PLATFORM=... python tools/probe_gang.py [reps]
"""
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

G = 8           # blocks per gang (16 px * 8 = 128 lanes)
BW = 16
NB = 704        # total blocks ~ CIF level-0 (22*18 = 396; run 704 = 64*11)
EVALS = 16      # metric evaluations per block (cands + refine, roughly)
HP, WP = 320, 512   # plane dims (bordered, padded)


def main():
    plat = os.environ.get("DSV2_JAX_PLATFORM")
    if plat:
        import jax as _j
        _j.config.update("jax_platforms", plat)
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    interp = jax.default_backend() == "cpu"
    rng = np.random.RandomState(7)
    plane = jnp.asarray(rng.randint(0, 256, (HP, WP), np.uint8))
    # per-block window coords + per-eval offsets, SMEM int32
    cx = rng.randint(8, WP - 64, NB).astype(np.int32)
    cy = rng.randint(8, HP - 64, NB).astype(np.int32)
    offs = rng.randint(-4, 5, (NB, EVALS, 2)).astype(np.int32)

    def reader(x, y):
        """aligned overfetch + narrow rolls (the kernel's window read)."""
        oh, ow = 64, 256
        yy = jnp.clip(y, 0, HP - BW)
        xx = jnp.clip(x, 0, WP - BW)
        ya = pl.multiple_of(jnp.minimum((yy // 32) * 32, HP - oh), 32)
        xa = pl.multiple_of(jnp.minimum((xx // 128) * 128, WP - ow), 128)

        def rd(ref):
            big = ref[pl.ds(ya, oh), pl.ds(xa, ow)]
            big = pltpu.roll(big, (-(yy - ya)) % oh, 0)
            big = pltpu.roll(big, (-(xx - xa)) % ow, 1)
            return big[:BW, :BW].astype(jnp.int32)
        return rd

    def metr(a, b, n_groups):
        """masked_metr-ish chain on (16, 16*n) windows."""
        d = jnp.abs(a - b)
        xr = d + pltpu.roll(d, ((-1) % d.shape[1]), 1)
        se = ((xr + pltpu.roll(xr, ((-1) % d.shape[0]), 0)) + 2) >> 2
        t = se * se + ((a - b) ** 2 << 1) + (((a >> 1) - (b >> 1)) ** 2)
        return t

    def rowsum(t):
        return t.astype(jnp.int32).sum(axis=0, keepdims=True)

    nit = NB // G

    # ---- kernel 1: per-block loop ----
    def k_block(mode):
        def kernel(cx_ref, cy_ref, off_ref, pl_ref, out_ref):
            def body(i, _):
                x = cx_ref[0, i]
                y = cy_ref[0, i]
                rd = reader(x, y)
                acc = jnp.int32(0)
                for e in range(EVALS):
                    w2 = rd(pl_ref) if mode != "compute" else (
                        pl_ref[pl.ds(0, BW), pl.ds(0, BW)].astype(jnp.int32)
                        + x)
                    if mode == "read":
                        acc = acc + w2[0, 0]
                    else:
                        a = w2
                        b = pltpu.roll(w2, 1, 0)
                        t = metr(a, b, 1)
                        acc = acc + t.sum()
                out_ref[0, i] = acc
                return 0
            jax.lax.fori_loop(0, NB, body, 0)

        npad = max(NB, 128)
        f = pl.pallas_call(
            kernel, grid=(1,),
            out_shape=jax.ShapeDtypeStruct((1, npad), jnp.int32),
            in_specs=[pl.BlockSpec((1, npad), lambda d: (0, 0),
                                   memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec((NB, EVALS * 2), lambda d: (0, 0),
                            memory_space=pltpu.SMEM),
               pl.BlockSpec(plane.shape, lambda d: (0, 0),
                            memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, npad), lambda d: (0, 0),
                                   memory_space=pltpu.SMEM),
            interpret=interp,
            compiler_params=None if interp else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )
        cxp = np.zeros((1, npad), np.int32)
        cxp[0, :NB] = cx
        cyp = np.zeros((1, npad), np.int32)
        cyp[0, :NB] = cy
        return lambda: f(cxp, cyp, offs.reshape(NB, EVALS * 2), plane)

    # ---- kernel 2: ganged ----
    def k_gang(mode):
        col = jax.lax.broadcasted_iota(jnp.int32, (1, BW * G), 1) // BW

        def kernel(cx_ref, cy_ref, off_ref, pl_ref, out_ref):
            def body(it, _):
                rds = []
                for g in range(G):
                    x = cx_ref[0, it * G + g]
                    y = cy_ref[0, it * G + g]
                    rds.append(reader(x, y))
                for e in range(EVALS):
                    if mode == "compute":
                        w2 = jnp.broadcast_to(
                            pl_ref[pl.ds(0, BW), pl.ds(0, BW)]
                            .astype(jnp.int32), (BW, BW * G))
                    else:
                        w2 = jnp.concatenate(
                            [rd(pl_ref) for rd in rds], axis=1)
                    if mode == "read":
                        for g in range(G):
                            out_ref[0, it * G + g] = w2[0, 0]
                    else:
                        a = w2
                        b = pltpu.roll(w2, 1, 0)
                        t = metr(a, b, G)
                        row = rowsum(t)
                        for g in range(G):
                            s = jnp.where(col == g, row, 0).sum()
                            out_ref[0, it * G + g] = s
                return 0
            jax.lax.fori_loop(0, nit, body, 0)

        npad = max(NB, 128)
        f = pl.pallas_call(
            kernel, grid=(1,),
            out_shape=jax.ShapeDtypeStruct((1, npad), jnp.int32),
            in_specs=[pl.BlockSpec((1, npad), lambda d: (0, 0),
                                   memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec((NB, EVALS * 2), lambda d: (0, 0),
                            memory_space=pltpu.SMEM),
               pl.BlockSpec(plane.shape, lambda d: (0, 0),
                            memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, npad), lambda d: (0, 0),
                                   memory_space=pltpu.SMEM),
            interpret=interp,
            compiler_params=None if interp else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )
        cxp = np.zeros((1, npad), np.int32)
        cxp[0, :NB] = cx
        cyp = np.zeros((1, npad), np.int32)
        cyp[0, :NB] = cy
        return lambda: f(cxp, cyp, offs.reshape(NB, EVALS * 2), plane)

    # ---- kernel 3: VMEM scalar load at computed index ----
    def k_vmem_scalar():
        def kernel(pl_ref, out_ref):
            def body(i, _):
                v = pl_ref[pl.ds(0, 8), pl.ds(0, 128)].astype(jnp.int32)
                idx = (v[0, :].sum() + i) % 8
                out_ref[0, i] = v[idx, 0]   # scalar load, computed index
                return 0
            jax.lax.fori_loop(0, 128, body, 0)

        f = pl.pallas_call(
            kernel, grid=(1,),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            in_specs=[pl.BlockSpec(plane.shape, lambda d: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda d: (0, 0),
                                   memory_space=pltpu.SMEM),
            interpret=interp,
            compiler_params=None if interp else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )
        return lambda: f(plane)

    def timed(fn):
        o = fn()
        np.asarray(o)
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn()
        np.asarray(o)
        return (time.perf_counter() - t0) / reps * 1000.0

    print(f"platform={jax.default_backend()} NB={NB} EVALS={EVALS} G={G}")
    outs = {}
    for name, mk in (("block", k_block), ("gang", k_gang)):
        for mode in ("full", "read", "compute"):
            ms = timed(mk(mode))
            print(f"  {name:6s} {mode:8s} {ms:8.3f} ms "
                  f"({ms * 1e6 / (NB * EVALS):7.1f} ns/eval)")
            if mode == "full":
                outs[name] = np.asarray(mk(mode)())
    if np.array_equal(outs["block"][:, :NB], outs["gang"][:, :NB]):
        print("  parity: gang == block  OK")
    else:
        nbad = int((outs["block"][:, :NB] != outs["gang"][:, :NB]).sum())
        print(f"  parity: MISMATCH ({nbad} blocks)")
    try:
        ms = timed(k_vmem_scalar())
        print(f"  vmem scalar load @ computed idx: {ms:8.3f} ms / 128 loads"
              f"  -> lowers OK")
    except Exception as e:
        print(f"  vmem scalar load: FAILS to lower: {type(e).__name__}: "
              f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
