#!/usr/bin/env python
"""Attribute the on-device entropy-scan cost (ops/scan_pl.make_scan_blob)
to its internal phases, at the FHD luma shape on real bench content.

profile_intra_stages shows the scan blob IS the intra device step
(~295 of ~286 ms/frame at FHD); this splits one plane's scan into
separately-jitted stages (same shapes, batch-of-8 vmap like the real
pipeline) so the dominant phase is measured, not guessed:

  compact : nz mask, rank cumsum, row scatter into compacted slots
  vkchain : the sequential rice-adaptation Pallas kernel alone
  pattern : UEG/NEG/rice pattern build + the sa offset cumsum
  emitL1  : LL prefix scatter loop
  emitL2  : HF merged scatter loop (+ spill row collection)
  whole   : the real make_scan_blob program (fusion check)

usage: tools/profile_scan.py [W H]
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
    from dsv2_tpu.codec.decoder import _PCfg
    from dsv2_tpu.codec.devsteps import blob_cap
    from dsv2_tpu.ops import sbt, hzcc, scan_pl
    from dsv2_tpu.utils.packet import VideoMeta

    W = int(sys.argv[1]) if len(sys.argv) > 2 else 1920
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    NB = 8
    meta = VideoMeta(width=W, height=H)
    pcfg = _PCfg(meta, 16, 16, False, False, True)
    print(f"# {W}x{H} batch={NB} backend={jax.default_backend()}",
          flush=True)

    nul = jax.jit(lambda a: a + 1)
    t = timeit(nul, jnp.zeros(8, jnp.int32))
    print(f"rtt floor   {t:8.2f} ms", flush=True)

    # real content -> real v density: run fwd+quant on the bench fixture
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import mkfixtures
    from dsv2_tpu.utils import y4m
    path = f"/tmp/dsv2_bench_{W}x{H}_32.y4m"
    if not os.path.exists(path):
        mkfixtures.write_y4m(path, W, H, NB)
    frames = []
    with open(path, "rb") as f:
        rdr = y4m.Y4MReader(f)
        for _ in range(NB):
            frames.append(rdr.read_frame())

    c = 0
    cw, ch = pcfg.cdims[c]
    scfg = pcfg.sbt_cfg(c)
    hcfg = pcfg.hzcc_cfg(c)
    fwd = sbt.make_fwd_sbt_carry(scfg)
    qf = hzcc.make_quantize(hcfg)
    segments = tuple(hzcc.scan_segments(cw, ch))
    total = sum(n for n, _ in segments)
    cap = blob_cap(total)

    xs = np.full((NB, ch, cw), 128, np.uint8)
    pw, ph = pcfg.pdims[c]
    from dsv2_tpu.core.frame import B as BORD  # noqa
    for i, fr in enumerate(frames):
        xs[i, :ph, :pw] = fr[0][:ph, :pw]
    bd0 = np.zeros((NB, pcfg.nbv, pcfg.nbh), np.uint8)
    q = np.full(NB, 1151, np.int32)

    def tovec(x8, bd, qq):
        cf, _ = fwd(x8.astype(jnp.int32) - 128, bd)
        dummy = jnp.zeros((pcfg.nbv, pcfg.nbh), bool)
        _, v = qf(cf, bd, dummy, dummy, qq)
        return v

    v = jax.jit(jax.vmap(tovec))(xs, bd0, q)
    v = jax.device_put(np.asarray(v))  # detach
    nz = (np.asarray(v) != 0).sum(axis=1)
    print(f"luma total={total} nonzeros/frame: min={nz.min()} "
          f"max={nz.max()}", flush=True)

    # --- mirrored stages (shapes/ops copied from scan_pl.make_scan_blob)
    damp_pos = scan_pl._pos_tables(segments)
    ll_n = segments[0][0] if segments and segments[0][1] < 0 else 0
    _CLL, _CHF, TP = scan_pl._chunk_sizes(total, ll_n)
    Mb = cap
    Mw = scan_pl._pad_to(Mb, 4) // 4

    def compact(v):
        v = v.astype(jnp.int32)
        idxs = jnp.arange(total, dtype=jnp.int32)
        nz = v != 0
        nruns = nz.sum(dtype=jnp.int32)
        nll = nz[:ll_n].sum(dtype=jnp.int32)
        _, sv, si = jax.lax.sort(((~nz).astype(jnp.int32), v, idxs),
                                 num_keys=1, is_stable=True)
        live = jnp.arange(TP, dtype=jnp.int32) < nruns
        vals = jnp.where(live,
                         jnp.zeros(TP, jnp.int32).at[:total].set(sv), 0)
        pos = jnp.where(live,
                        jnp.zeros(TP, jnp.int32).at[:total].set(si), 0)
        return vals, pos, nruns, nll

    outs = jax.jit(jax.vmap(compact))(v)
    valsC, posC, nruns, nll = [jax.device_put(np.asarray(o)) for o in outs]
    t_c = timeit(jax.jit(jax.vmap(compact)), v)
    print(f"compact     {t_c:8.2f} ms/chunk", flush=True)

    def prep(vals, pos, nruns):
        dmp = scan_pl._damp_of_pos(segments, pos)
        idxs = jnp.arange(TP, dtype=jnp.int32)
        act = idxs < nruns
        isneg = act & (dmp < 0)
        isr = act & (dmp >= 0)
        u = jnp.where(vals >= 0, 2 * vals, -2 * vals - 1)
        um1 = jnp.maximum(u - 1, 0)
        e = scan_pl._ilog2(um1)
        dsafe = jnp.maximum(dmp, 0)
        thr = jnp.where(isr, (e + 1) << dsafe, 0)
        return thr, um1, isneg, isr, dsafe

    thr = jax.device_put(np.asarray(
        jax.jit(jax.vmap(prep))(valsC, posC, nruns)[0]))

    def vkchain(thr, nll, nruns):
        return scan_pl._vk_call(TP)(thr, nll, nruns)

    t_vk = timeit(jax.jit(jax.vmap(vkchain)), thr, nll, nruns)
    print(f"vkchain     {t_vk:8.2f} ms/chunk", flush=True)

    def pattern(vals, pos, nruns, vkpre):
        dmp = scan_pl._damp_of_pos(segments, pos)
        idxs = jnp.arange(TP, dtype=jnp.int32)
        act = idxs < nruns
        isneg = act & (dmp < 0)
        isr = act & (dmp >= 0)
        u = jnp.where(vals >= 0, 2 * vals, -2 * vals - 1)
        um1 = jnp.maximum(u - 1, 0)
        dsafe = jnp.maximum(dmp, 0)
        k = jnp.clip(jnp.maximum(vkpre, 0) >> dsafe, 0, 30)
        run = pos - jnp.concatenate([jnp.full(1, -1, jnp.int32),
                                     pos[:-1]]) - 1
        run = jnp.where(act, run, 0)
        alo, ahi, alen = scan_pl._ueg_pattern(run)
        nlo, nhi, nlen = scan_pl._neg_pattern(jnp.where(isneg, vals, 1))
        qq = um1 >> k
        kmask = (jnp.uint32(1) << k.astype(jnp.uint32)) - 1
        rlo = (jnp.uint32(1) << k.astype(jnp.uint32)) | (
            um1.astype(jnp.uint32) & kmask)
        blo = jnp.where(isneg, nlo, rlo)
        bhi = jnp.where(isneg, nhi, jnp.zeros_like(rlo))
        blen = jnp.where(isneg, nlen, 1 + k)
        bgap = jnp.where(isneg, 0, qq.astype(jnp.int32))
        tot_i = jnp.where(act, alen + bgap + blen, 0)
        sa = scan_pl.RUN_BITS + jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(tot_i, dtype=jnp.int32)[:-1]])
        sb = sa + alen + bgap
        return sa, sb, alo, ahi, alen, blo, bhi, blen, isneg, isr

    vkpre = jax.device_put(np.asarray(
        jax.jit(jax.vmap(vkchain))(thr, nll, nruns)))
    t_p = timeit(jax.jit(jax.vmap(pattern)), valsC, posC, nruns, vkpre)
    print(f"pattern     {t_p:8.2f} ms/chunk", flush=True)

    outs = jax.jit(jax.vmap(pattern))(valsC, posC, nruns, vkpre)
    (sa, sb, alo, ahi, alen, blo, bhi, blen, isneg2, isr2) = \
        [jax.device_put(np.asarray(o)) for o in outs]

    def emit_l1(nll, sa, sb, alo, ahi, alen, blo, bhi, blen, isneg):
        buf = jnp.zeros(Mw, jnp.int32)

        def l1(c, buf):
            o = c * _CLL
            sl = lambda a: jax.lax.dynamic_slice(a, (o,), (_CLL,))
            live = sl(isneg)
            buf = scan_pl._scatter_part(buf, live, sl(sa), sl(alen),
                                        sl(alo), sl(ahi), Mw)
            return scan_pl._scatter_part(buf, live, sl(sb), sl(blen),
                                         sl(blo), sl(bhi), Mw)

        nl1 = jnp.clip(-(-nll // _CLL), 0, -(-total // _CLL))
        return jax.lax.fori_loop(0, nl1, l1, buf)

    t_1 = timeit(jax.jit(jax.vmap(emit_l1)), nll, sa, sb, alo, ahi, alen,
                 blo, bhi, blen, isneg2)
    print(f"emitL1      {t_1:8.2f} ms/chunk", flush=True)

    def emit_l2(nruns, sa, sb, alo, ahi, alen, blo, bhi, blen, isr):
        buf = jnp.zeros(Mw, jnp.int32)

        def l2(c, buf):
            o = c * _CHF
            sl = lambda a: jax.lax.dynamic_slice(a, (o,), (_CHF,))
            live = sl(isr)
            buf = scan_pl._scatter_part(buf, live, sl(sa), sl(alen),
                                        sl(alo), sl(ahi), Mw)
            return scan_pl._scatter_part(buf, live, sl(sb), sl(blen),
                                         sl(blo), sl(bhi), Mw, nwords=2)

        nl2 = jnp.clip(-(-nruns // _CHF), 0, -(-total // _CHF))
        return jax.lax.fori_loop(0, nl2, l2, buf)

    t_2 = timeit(jax.jit(jax.vmap(emit_l2)), nruns, sa, sb, alo, ahi,
                 alen, blo, bhi, blen, isr2)
    print(f"emitL2      {t_2:8.2f} ms/chunk", flush=True)

    blobf = scan_pl.make_scan_blob(segments, cap)
    t_w = timeit(jax.jit(jax.vmap(blobf)), v)
    print(f"whole       {t_w:8.2f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
