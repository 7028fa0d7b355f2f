#!/usr/bin/env python
"""Decompose the FHD intra device step's per-frame cost by stage.

bench.py's device_ms_per_frame times the WHOLE fused batch program; this
times jitted sub-programs (same configs, same shapes, batch-of-8 luma
chunks) so the optimization target is attributed, not guessed:

  analysis : HVS block analysis (ring/maintain/keep)
  fwd      : forward SBT with scratch carry
  quant    : HZCC quantize (+ scan-order vector)
  scan     : on-device entropy blob (ops/scan_pl)
  full     : the real _device_batch_fn program (sum check / fusion win)

usage: tools/profile_intra_stages.py [W H] [batch]
"""
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _sync(out):
    """Force completion with a tiny d2h fetch: on the axon tunnel
    block_until_ready returns before the dispatch has executed, so a
    wall-clock around it times nothing (bench.py learned the same —
    its device metric fetches a small leaf to sync)."""
    import jax
    import numpy as np
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
    from dsv2_tpu.codec.decoder import _PCfg
    from dsv2_tpu.codec.devsteps import blob_cap
    from dsv2_tpu.ops import sbt, hzcc, scan_pl, blockanalysis
    from dsv2_tpu.parallel import batch as pb
    from dsv2_tpu.utils.packet import VideoMeta

    W = int(sys.argv[1]) if len(sys.argv) > 2 else 1920
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    NB = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    meta = VideoMeta(width=W, height=H)
    blk = 16  # size4dim: both dims collapse to MIN at FHD/CIF aspect
    pcfg = _PCfg(meta, blk, blk, False, False, True)
    print(f"# {W}x{H} batch={NB} blk={blk} backend={jax.default_backend()}")

    # dispatch+fetch RTT floor: every stage number below includes one of
    # these (tiny-fetch sync), subtract it mentally
    nul = jax.jit(lambda a: a + 1)
    t = timeit(nul, jnp.zeros(8, jnp.int32))
    print(f"rtt floor   {t:8.2f} ms")

    rng = np.random.default_rng(0)
    xs = []
    for c in range(3):
        cw, ch = pcfg.cdims[c]
        xs.append(jax.device_put(
            rng.integers(0, 256, (NB, ch, cw), dtype=np.uint8)))
    q = jax.device_put(np.full(NB, 1151, np.int32))
    bd0 = jax.device_put(np.zeros((NB, pcfg.nbv, pcfg.nbh), np.uint8))

    flags_fn = blockanalysis.device_intra_flags(pcfg)
    t = timeit(jax.jit(jax.vmap(flags_fn)), xs[0], xs[1], xs[2])
    print(f"analysis    {t:8.2f} ms/chunk  {t / NB:7.2f} ms/frame")

    per_plane = {}
    for c in range(3):
        scfg = pcfg.sbt_cfg(c)
        hcfg = pcfg.hzcc_cfg(c)
        fwd = sbt.make_fwd_sbt_carry(scfg)
        qf = hzcc.make_quantize(hcfg)
        segs = tuple(hzcc.scan_segments(*pcfg.cdims[c]))
        total = sum(n for n, _ in segs)
        blobf = scan_pl.make_scan_blob(segs, blob_cap(total))

        def fwd_only(x8, bd):
            return fwd(x8.astype(jnp.int32) - 128, bd)

        cf, cr = jax.jit(jax.vmap(fwd_only))(xs[c], bd0)
        t_f = timeit(jax.jit(jax.vmap(fwd_only)), xs[c], bd0)

        def quant_only(coefs, bd, qq):
            dummy = jnp.zeros((pcfg.nbv, pcfg.nbh), bool)
            return qf(coefs, bd, dummy, dummy, qq)

        deq, v = jax.jit(jax.vmap(quant_only))(cf, bd0, q)
        t_q = timeit(jax.jit(jax.vmap(quant_only)), cf, bd0, q)
        t_s = timeit(jax.jit(jax.vmap(blobf)), v)
        per_plane[c] = (t_f, t_q, t_s)
        print(f"plane{c}: fwd {t_f:8.2f}  quant {t_q:8.2f}  "
              f"scan {t_s:8.2f} ms/chunk")

    tf = sum(p[0] for p in per_plane.values())
    tq = sum(p[1] for p in per_plane.values())
    ts = sum(p[2] for p in per_plane.values())
    full = pb._device_batch_fn(W, H, meta.subsamp, blk, blk, False, True,
                               False, True)
    t_full = timeit(full, xs[0], xs[1], xs[2], bd0, q)
    print(f"fwd(all)    {tf:8.2f} ms/chunk  {tf / NB:7.2f} ms/frame")
    print(f"quant(all)  {tq:8.2f} ms/chunk  {tq / NB:7.2f} ms/frame")
    print(f"scan(all)   {ts:8.2f} ms/chunk  {ts / NB:7.2f} ms/frame")
    print(f"full step   {t_full:8.2f} ms/chunk  {t_full / NB:7.2f} ms/frame")


if __name__ == "__main__":
    main()
