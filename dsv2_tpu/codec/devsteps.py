"""Whole-frame device steps: one XLA dispatch per frame.

Fuses the per-plane prediction / residual / transform / quantization /
reconstruction chain of a frame into a single jitted program, so a frame
costs one host->device upload, one dispatch and one sparse download instead
of ~15 round-trips (the axon tunnel charges ~6 ms per dispatch).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core import constants as K
from ..core.frame import B
from ..ops import sbt, hzcc, mc
from .decoder import _PCfg
from ..utils.packet import VideoMeta


def _sparse_pack(v):
    nz = v != 0
    order = jnp.argsort(~nz, stable=True).astype(jnp.int32)
    vals_c = v[order]
    nnz = nz.sum().astype(jnp.int32)
    dpos = jnp.diff(order, prepend=0)
    v_ovf = (jnp.abs(vals_c) > 32767).any()
    p_ovf = ((dpos > 65535) | (dpos < 0)).any()
    return (vals_c, order, nnz, vals_c.astype(jnp.int16),
            dpos.astype(jnp.uint16), v_ovf, p_ovf)


def _pcfg(w, h, subsamp, blk_w, blk_h, isP, lossless, do_psy):
    return _PCfg(VideoMeta(width=w, height=h, subsamp=subsamp),
                 blk_w, blk_h, isP, lossless, do_psy)


@functools.lru_cache(maxsize=None)
def make_p_encode_step(w, h, subsamp, blk_w, blk_h, lossless, do_psy):
    """(src_canvases, ref_planes, mv grids, blockdata, masks, q, tmc) ->
    per plane (recon_canvas, sparse pack..., ll). Mirrors the sequential
    sub_pred -> fwd SBT -> quantize -> inv SBT -> reconstruct chain
    (ref: dsv_encoder.c:1123-1172)."""
    pcfg = _pcfg(w, h, subsamp, blk_w, blk_h, True, lossless, do_psy)

    def step(srcs, refs, mvx, mvy, flags, submask, dc, bd, eprm_m, mlt_m,
             q, tmc):
        outs = []
        for c in range(3):
            mcc = pcfg.mc_cfg(c)
            scfg = pcfg.sbt_cfg(c)
            hcfg = pcfg.hzcc_cfg(c)
            cw, ch = pcfg.cdims[c]
            pw, ph = pcfg.pdims[c]
            pred = mc.make_predict(mcc)(refs[c], mvx, mvy, flags, submask,
                                        dc, tmc)
            res = mc.make_subtract(mcc)(srcs[c], pred, flags)
            x = jnp.zeros((ch, cw), jnp.int32)
            x = x.at[:ph, :].set(res[:ph, :cw].astype(jnp.int32) - 128)
            coefs = sbt.make_fwd_sbt(scfg)(x, bd)
            deq, v = hzcc.make_quantize(hcfg)(coefs, bd, eprm_m, mlt_m, q)
            rpx = sbt.make_inv_sbt(scfg)(deq, bd, q)
            rpx = jnp.clip(rpx + 128, 0, 255).astype(jnp.uint8)
            res2 = res.at[:ph, :pw].set(rpx[:ph, :pw])
            recon = mc.make_reconstruct(mcc)(res2, pred, flags)
            outs.append((recon, coefs[0, 0]) + _sparse_pack(v))
        return outs

    return jax.jit(step)


@functools.lru_cache(maxsize=None)
def make_i_encode_step(w, h, subsamp, blk_w, blk_h, lossless, do_psy,
                       need_recon):
    """Single-frame intra step (sequential session path)."""
    pcfg = _pcfg(w, h, subsamp, blk_w, blk_h, False, lossless, do_psy)

    def step(xs, bd, q):
        dummy = jnp.zeros((pcfg.nbv, pcfg.nbh), dtype=bool)
        outs = []
        for c in range(3):
            scfg = pcfg.sbt_cfg(c)
            hcfg = pcfg.hzcc_cfg(c)
            x = xs[c].astype(jnp.int32) - 128
            coefs = sbt.make_fwd_sbt(scfg)(x, bd)
            deq, v = hzcc.make_quantize(hcfg)(coefs, bd, dummy, dummy, q)
            if need_recon:
                rpx = sbt.make_inv_sbt(scfg)(deq, bd, q)
                rpx = jnp.clip(rpx + 128, 0, 255).astype(jnp.uint8)
            else:
                rpx = jnp.zeros((1, 1), jnp.uint8)
            outs.append((rpx, coefs[0, 0]) + _sparse_pack(v))
        return outs

    return jax.jit(step)


@functools.lru_cache(maxsize=None)
def make_i_decode_step(w, h, subsamp, blk_w, blk_h, lossless):
    pcfg = _pcfg(w, h, subsamp, blk_w, blk_h, False, lossless, 0)

    def step(vs, bd, q, lls):
        outs = []
        for c in range(3):
            coefs = hzcc.make_dequantize(pcfg.hzcc_cfg(c))(
                vs[c], bd, q, lls[c])
            px = sbt.make_inv_sbt(pcfg.sbt_cfg(c))(coefs, bd, q)
            outs.append(jnp.clip(px + 128, 0, 255).astype(jnp.uint8))
        return outs

    return jax.jit(step)


@functools.lru_cache(maxsize=None)
def make_p_decode_step(w, h, subsamp, blk_w, blk_h, lossless):
    """Dequant + inverse SBT + MC prediction + reconstruction, one dispatch
    (ref: dsv_decoder.c:512-549)."""
    pcfg = _pcfg(w, h, subsamp, blk_w, blk_h, True, lossless, 0)

    def step(vs, bd, q, lls, refs, mvx, mvy, flags, submask, dc, tmc):
        outs = []
        for c in range(3):
            mcc = pcfg.mc_cfg(c)
            pw, ph = pcfg.pdims[c]
            coefs = hzcc.make_dequantize(pcfg.hzcc_cfg(c))(
                vs[c], bd, q, lls[c])
            px = sbt.make_inv_sbt(pcfg.sbt_cfg(c))(coefs, bd, q)
            px = jnp.clip(px + 128, 0, 255).astype(jnp.uint8)
            res = jnp.zeros((mcc.gh, mcc.gw), jnp.uint8)
            res = res.at[:ph, :pw].set(px[:ph, :pw])
            pred = mc.make_predict(mcc)(refs[c], mvx, mvy, flags, submask,
                                        dc, tmc)
            outs.append(mc.make_reconstruct(mcc)(res, pred, flags))
        return outs

    return jax.jit(step)


def fetch_sparse_outs(outs, nfr_axis=False):
    """Host-side sparse fetch for the per-plane packs produced by the steps
    above (single frame). Returns (vscans, lls)."""
    from ..parallel.batch import _round_up
    smalls = np.asarray(jnp.concatenate(
        [jnp.stack([outs[c][4], outs[c][1].astype(jnp.int32),
                    outs[c][7].astype(jnp.int32),
                    outs[c][8].astype(jnp.int32)])
         for c in range(3)]))
    vscans = []
    lls = []
    for c in range(3):
        nnz, ll, v_ovf, p_ovf = (int(x) for x in smalls[c * 4:(c + 1) * 4])
        vals_c, order = outs[c][2], outs[c][3]
        total = vals_c.shape[0]
        k = min(_round_up(max(nnz, 1), 4096), total)
        if v_ovf:
            vals = np.asarray(vals_c[:k])
        else:
            vals = np.asarray(outs[c][5][:k]).astype(np.int32)
        if p_ovf:
            pos = np.asarray(order[:k])
        else:
            pos = np.cumsum(np.asarray(outs[c][6][:k]).astype(np.int64))
        v = np.zeros(total, dtype=np.int32)
        v[pos[:nnz]] = vals[:nnz]
        vscans.append(v)
        lls.append(ll)
    return vscans, lls
