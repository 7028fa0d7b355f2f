#!/usr/bin/env python
"""On-chip component attribution for the lockstep p_chain flush.

Captures the REAL stacked (width-batched) p_chain inputs from a short
lockstep run, then times jitted variants on device-resident copies:

  full      the shipped make_p_chain_step (MC+SBT+quant+scan prep,
            in-loop filters, border extension + pyramid)
  nofilt    same minus the in-loop luma/chroma filters
  base      make_p_encode_step alone (no filters, no chain tail)

filter cost = full - nofilt; chain-tail cost = nofilt - base. Each
timing syncs on a 1-byte fetch so only device compute (+1 RTT) counts.

usage: microbench_p_chain.py [width] [res WxH]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    res = sys.argv[2] if len(sys.argv) > 2 else "352x288"
    plat = os.environ.get("DSV2_JAX_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    import jax
    import jax.numpy as jnp
    import numpy as np
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    import mkfixtures
    from dsv2_tpu.utils import y4m
    from dsv2_tpu.utils.packet import VideoMeta
    from dsv2_tpu.cli import make_encoder, default_enc_opts
    from dsv2_tpu.parallel import dynbatch
    from dsv2_tpu.parallel.dynbatch import encode_streams_lockstep
    from dsv2_tpu.codec import devsteps

    W, H = (int(v) for v in res.split("x"))
    gop = 3  # I + 2 P frames: enough to flush p_chain with real state
    n = width * gop
    path = f"/tmp/dsv2_mbpc_{W}x{H}_{n}.y4m"
    if not os.path.exists(path):
        mkfixtures.write_y4m(path, W, H, n)
    frames = []
    with open(path, "rb") as f:
        rdr = y4m.Y4MReader(f)
        while True:
            p = rdr.read_frame()
            if p is None:
                break
            frames.append(p)
    meta = VideoMeta(width=W, height=H, subsamp=rdr.subsamp,
                     fps_num=rdr.fps[0], fps_den=rdr.fps[1])
    streams = [frames[i:i + gop] for i in range(0, n, gop)]

    # capture the stacked p_chain args by wrapping the flush fn factory
    captured = {}
    orig_mpf = dynbatch._make_packed_fn

    def mpf(vfn, fetch, _key=[None]):
        fn, m = orig_mpf(vfn, fetch)

        def fn2(*args):
            captured.setdefault(len(captured), args)
            return fn(*args)

        return fn2, m

    dynbatch._make_packed_fn = mpf
    keyseq = []
    orig_flush = dynbatch.LockstepBatcher._pick_queues

    def pick(self):
        qs = orig_flush(self)
        keyseq.extend(k[0] for k in qs)
        return qs

    dynbatch.LockstepBatcher._pick_queues = pick

    pcfg_cell = {}
    orig_pchain = devsteps.make_p_chain_step
    import functools

    @functools.lru_cache(maxsize=None)
    def wrap_pchain(*cfg):
        pcfg_cell["cfg"] = cfg
        return orig_pchain(*cfg)

    devsteps.make_p_chain_step = wrap_pchain

    def factory():
        return make_encoder(meta, default_enc_opts(qp=60, gop=gop))

    encode_streams_lockstep(streams, factory, width=width)
    dynbatch._make_packed_fn = orig_mpf
    dynbatch.LockstepBatcher._pick_queues = orig_flush
    devsteps.make_p_chain_step = orig_pchain

    # identify the p_chain capture by its flush order
    idx = [i for i, k in enumerate(keyseq) if k == "p_chain"]
    assert idx and "cfg" in pcfg_cell, (keyseq, pcfg_cell)
    args = captured[idx[0]]
    cfg = pcfg_cell["cfg"]
    (w, h, subsamp, blk_w, blk_h, lossless, do_psy,
     levels, inter_sharpen) = cfg
    print(f"captured p_chain cfg={cfg}, {len(args)} args")
    # args are pytrees (per-plane tuples of differently-shaped arrays)
    args = jax.tree_util.tree_map(
        lambda a: jax.device_put(np.asarray(a)), args)
    for a in jax.tree_util.tree_leaves(args):
        a.block_until_ready()

    from dsv2_tpu.core.frame import B
    from dsv2_tpu.ops import filters
    pcfg = devsteps._pcfg(w, h, subsamp, blk_w, blk_h, True, lossless,
                          do_psy)
    base = devsteps.make_p_encode_step(w, h, subsamp, blk_w, blk_h,
                                       lossless, do_psy)

    def step_var(with_filters, with_chain):
        def step(srcs_full, refs, mvx, mvy, flags, submask, dc, bd,
                 eprm_m, mlt_m, q, tmc, fq, fthresh, do_filter):
            srcs = []
            for c in range(3):
                mcc = pcfg.mc_cfg(c)
                srcs.append(jax.lax.slice(
                    srcs_full[c], (B, B), (B + mcc.gh, B + mcc.gw)))
            recons, buf, smalls, fbarrs = base(
                tuple(srcs), refs, mvx, mvy, flags, submask, dc, bd,
                eprm_m, mlt_m, q, tmc)
            if not with_chain:
                return buf, smalls
            vis = []
            for c in range(3):
                pw, ph = pcfg.pdims[c]
                vis.append(recons[c][:ph, :pw])
            if with_filters and not lossless:
                vis[0] = filters.impl().luma_filter_graph(
                    pcfg.pdims[0][0], pcfg.pdims[0][1], pcfg.nbh,
                    pcfg.nbv, blk_w, blk_h, inter_sharpen, vis[0], mvx,
                    mvy, flags, submask, fq, fthresh, do_filter, tmc)
                for c in (1, 2):
                    mcc = pcfg.mc_cfg(c)
                    vis[c] = filters.impl().chroma_filter_graph(
                        pcfg.pdims[c][0], pcfg.pdims[c][1], pcfg.nbh,
                        pcfg.nbv, mcc.bw, mcc.bh, vis[c],
                        mvx, mvy, flags, q)
            chain = devsteps._chain_outputs(pcfg, levels, vis)
            return buf, smalls, chain

        return jax.jit(jax.vmap(step))

    # cumulative prefixes of the base step: consecutive diffs attribute
    # MC / fwd SBT / quantize / inverse+recon / blob emission
    from dsv2_tpu.ops import sbt as sbt_ops, hzcc as hzcc_ops, mc as mc_ops

    def prefix_var(upto):
        def step(srcs_full, refs, mvx, mvy, flags, submask, dc, bd,
                 eprm_m, mlt_m, q, tmc, fq, fthresh, do_filter):
            outs = []
            for c in range(3):
                mcc = pcfg.mc_cfg(c)
                scfg = pcfg.sbt_cfg(c)
                hcfg = pcfg.hzcc_cfg(c)
                cw, ch = pcfg.cdims[c]
                pw, ph = pcfg.pdims[c]
                src = jax.lax.slice(srcs_full[c], (B, B),
                                    (B + mcc.gh, B + mcc.gw))
                pred = mc_ops.make_predict(mcc)(refs[c], mvx, mvy, flags,
                                                submask, dc, tmc)
                res = mc_ops.make_subtract(mcc)(src, pred, flags)
                if upto == "mc":
                    outs.append(res)
                    continue
                x = jnp.zeros((ch, cw), jnp.int32)
                x = x.at[:ph, :].set(res[:ph, :cw].astype(jnp.int32)
                                     - 128)
                coefs, cr = sbt_ops.make_fwd_sbt_carry(scfg)(x, bd)
                if upto == "sbt":
                    outs.append(coefs)
                    continue
                deq, v = hzcc_ops.make_quantize(hcfg)(coefs, bd, eprm_m,
                                                      mlt_m, q)
                if upto == "quant":
                    outs.append(v)
                    continue
                rpx = sbt_ops.make_inv_sbt_stale(scfg)(deq, bd, q, cr)
                rpx = jnp.clip(rpx + 128, 0, 255).astype(jnp.uint8)
                res2 = res.at[:ph, :pw].set(rpx[:ph, :pw])
                outs.append(mc_ops.make_reconstruct(mcc)(res2, pred,
                                                         flags))
            return outs

        return jax.jit(jax.vmap(step))

    variants = {
        "full": step_var(True, True),
        "nofilt": step_var(False, True),
        "base": step_var(False, False),
        "mc": prefix_var("mc"),
        "+fwdsbt": prefix_var("sbt"),
        "+quant": prefix_var("quant"),
        "+invrec": prefix_var("inv"),
    }
    import statistics

    def tiny_sync(out):
        # 1-element fetch forces completion without paying a bulk d2h
        leaf = jax.tree_util.tree_leaves(out)[1]
        np.asarray(leaf[tuple(0 for _ in leaf.shape)])

    for name, fn in variants.items():
        out = fn(*args)
        tiny_sync(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(*args)
            tiny_sync(out)
            ts.append((time.perf_counter() - t0) * 1000)
        print(f"{name:8s} {statistics.median(ts):8.1f} ms/flush "
              f"({statistics.median(ts)/width:6.2f} ms/frame)  "
              f"runs={['%.0f' % t for t in ts]}")


if __name__ == "__main__":
    main()
