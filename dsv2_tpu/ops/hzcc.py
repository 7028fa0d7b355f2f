"""HZCC adaptive quantization / dequantization as device code.

The reference interleaves quantization decisions with the serial entropy
scan (ref: src/hzcc.c:234-583). Observation that unlocks the TPU: within one
subband every decision is elementwise given (a) the block-flag map, (b) the
already-dequantized parent/grandparent subbands, and (c) the quantizer — and
subbands are processed in a fixed order. So quantization becomes ten
vectorized passes over the coefficient plane; the entropy scan then only
serializes the final values (native runtime), with zero feedback into the
math.

Scan geometry is the fixed 3-level view of the plane regardless of the
transform depth (ref: hzcc.c:24-57); overlapping cells at non-pow2 dims are
traversed exactly like the reference's flat loops, including double visits.
"""
import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import jint
from ..core import intmath as im
from ..core import constants as K

MAXLVL = 3
MINQUANT = 8  # 1 << MINQP (ref: hzcc.c:33-34)
RUN_BITS = 24
EOP_SYMBOL = 0x55
LVL1, LVL2, LVL3 = 2, 1, 0
LH, HL, HH = 1, 2, 3


class HzccCfg(NamedTuple):
    w: int
    h: int
    is_luma: bool
    isP: bool
    lossless: bool
    nbh: int
    nbv: int
    blk_w: int
    blk_h: int
    vid_w: int        # video dims (for psy factor / mv cost scaling)
    vid_h: int
    subsamp: int
    do_psy: int


def spatial_psy_factor(cfg, subband):
    """Resolution-dependent psy factor (ref: hzcc.c:65-86). Static."""
    if subband == LH:
        lo = im.udiv_round_up(352, cfg.blk_w)
        hi = im.udiv_round_up(1920, cfg.blk_w)
        scale = cfg.nbh
    elif subband == HL:
        lo = im.udiv_round_up(288, cfg.blk_h)
        hi = im.udiv_round_up(1080, cfg.blk_h)
        scale = cfg.nbv
    else:
        lo = im.udiv_round_up(352, cfg.blk_w) * im.udiv_round_up(288, cfg.blk_h)
        hi = im.udiv_round_up(1920, cfg.blk_w) * im.udiv_round_up(1080, cfg.blk_h)
        scale = cfg.nbh * cfg.nbv
    scale = max(0, scale - lo)
    return (scale << 7) // (hi - lo)


def fix_quant(q):
    return (q * 3) // 2


def lfquant(q, cfg):
    """LL quantizer (ref: hzcc.c:88-105); q traced."""
    psyfac = spatial_psy_factor(cfg, HH)
    q = q - ((q * psyfac) >> (7 + 3))
    q = jnp.maximum(q, MINQUANT)
    if not cfg.is_luma:
        q = jnp.where(q > 256, 256 + q // 4, q)
        return jnp.minimum(q, 768)
    return jnp.minimum(q, 3072)


def hfquant(cfg, q, s, l):
    """High-frequency subband quantizer (ref: hzcc.c:107-162); q traced,
    s/l static."""
    chroma = not cfg.is_luma
    psy = spatial_psy_factor(cfg, s)
    q = q // 2
    psyfac = (q * psy) >> (7 + (0 if cfg.isP else 1))
    if chroma:
        tl = l - 2
        if s == LH:
            tl += K.fmt_h_shift(cfg.subsamp)
        elif s == HL:
            tl += K.fmt_v_shift(cfg.subsamp)
        q = jint.divt(q * 6, 4 - tl)
    else:
        if l == LVL2:
            q = q + jint.divt(psyfac, 2)
        elif l == LVL1:
            q = q + psyfac
    if cfg.isP:
        if l != LVL1:
            if l == LVL3:
                q = q * 2 - psyfac
            else:
                q = q - jint.divt(psyfac, 2)
        return jnp.maximum(jint.divt(q, 4), MINQUANT)
    q = jint.divt(q * (15 + 3 * l), 16)
    if not chroma:
        if l == LVL3:
            q = jint.divt(q * 3, 8)
        elif s == HH:
            q = q * 2
    else:
        q = jint.divt(q, 4)
        if s == HH:
            q = q * 2
    return jnp.maximum(q, MINQUANT)


# --- per-coefficient quantizers (ref: hzcc.c:209-228) ---

def quant_sub(v, q, sub):
    return jint.divt(jnp.where(v >= 0, v - sub, v + sub), q)


def quant_s(v, q):
    return jint.divt(v, q)


def dequant_s(v, q):
    return v * q + jnp.where(v < 0, -jint.divt(q * 2, 3), jint.divt(q * 2, 3))


def dequant_d(v, q):
    return v * q + jnp.where(v < 0, -(q // 2), q // 2)


def tmq4pos_p(tmq, flags, parc):
    """Adaptive quant from block flags, P frames (ref: hzcc.c:164-169)."""
    cond1 = (parc != 0) | ((flags & (K.IS_STABLE | K.IS_EPRM)) != 0)
    cond2 = (parc == 0) & ((flags & K.IS_INTRA) != 0)
    return jnp.where(cond1, (tmq * 7) >> 3,
                     jnp.where(cond2, (tmq * 6) >> 3, tmq))


def tmq4pos_i(tmq, flags, parc, l):
    """Adaptive quant from block flags, I frames (ref: hzcc.c:171-206)."""
    if l == MAXLVL - 3:
        return tmq
    smf = flags & (K.IS_STABLE | K.IS_MAINTAIN)
    ring = (flags & K.IS_RINGING) != 0
    notparc = (parc == 0).astype(jnp.int32)
    maintain_shift = jnp.where(ring, 2, notparc)
    if l == MAXLVL - 2:
        t_stable = jint.divt(tmq, 3)
        t_both = tmq >> 2
    else:  # MAXLVL - 1
        t_stable = tmq >> 2
        t_both = tmq >> (2 + notparc)
    t_maint = tmq >> maintain_shift
    out = jnp.where(smf == K.IS_STABLE, t_stable,
                    jnp.where(smf == K.IS_MAINTAIN, t_maint,
                              jnp.where(smf == (K.IS_MAINTAIN | K.IS_STABLE),
                                        t_both, tmq)))
    return out


# --- static scan geometry ---

def _dimat(l, v):
    return im.round_shift(v, MAXLVL - l)


def _suboff(l, s, w, h):
    off_c = _dimat(l, w) if (s & 1) else 0
    off_r = _dimat(l, h) if (s & 2) else 0
    return off_r, off_c


@functools.lru_cache(maxsize=None)
def subband_plan(w, h):
    """[(l, s, row0, col0, sw, sh)] for the 9 HF subbands, scan order."""
    plan = []
    for l in range(MAXLVL):
        sw, sh = _dimat(l, w), _dimat(l, h)
        for s in (1, 2, 3):
            r0, c0 = _suboff(l, s, w, h)
            assert r0 + sh <= h and c0 + sw <= w, (w, h, l, s)
            plan.append((l, s, r0, c0, sw, sh))
    return plan


@functools.lru_cache(maxsize=None)
def scan_segments(w, h):
    """Segments for the native entropy scan: [(count, damp)] with the LL
    segment damp = -1 (NEG coded); damp = 3 + l for HF (ref: hzcc.c:230)."""
    sw0, sh0 = _dimat(0, w), _dimat(0, h)
    segs = [(sw0 * sh0, -1)]
    for (l, s, r0, c0, sw, sh) in subband_plan(w, h):
        segs.append((sw * sh, 3 + l))
    return segs


def total_scan_coefs(w, h):
    return sum(c for c, _ in scan_segments(w, h))


@functools.lru_cache(maxsize=None)
def _block_gather(sw, sh, nbh, nbv):
    """Block index per coefficient of an (sh, sw) subband
    (ref: hzcc.c:336-337,354-361)."""
    dbx = (nbh << K.BLOCK_INTERP_P) // sw
    dby = (nbv << K.BLOCK_INTERP_P) // sh
    by = (np.arange(sh) * dby) >> K.BLOCK_INTERP_P
    bx = (np.arange(sw) * dbx) >> K.BLOCK_INTERP_P
    return by, bx


def _flags_map(blockdata, sw, sh, nbh, nbv):
    by, bx = _block_gather(sw, sh, nbh, nbv)
    return blockdata[by[:, None], bx[None, :]].astype(jnp.int32)


def _parent_vals(x, l, s, w, h, sw, sh, generations):
    r0, c0 = _suboff(l - generations, s, w, h)
    ys = r0 + (np.arange(sh) >> generations)
    xs = c0 + (np.arange(sw) >> generations)
    return x[ys[:, None], xs[None, :]]


@functools.lru_cache(maxsize=None)
def _self_parent_mask(w, h, l, s):
    """Cells of subband (l,s) whose parent gather lands INSIDE the subband
    itself. At non-multiple-of-16 dims the fixed 3-level scan regions overlap
    by one row/column, and the reference's serial scan reads parent values it
    has just rewritten (ref: hzcc.c:352-437 flat-memory traversal). These
    cells need a second vectorized pass with post-writeback parents. Returns
    None when the mask is empty (all standard resolutions)."""
    r0, c0 = _suboff(l, s, w, h)
    sw, sh = _dimat(l, w), _dimat(l, h)
    pr0, pc0 = _suboff(l - 1, s, w, h)
    pr = pr0 + (np.arange(sh) >> 1)
    pc = pc0 + (np.arange(sw) >> 1)
    row_in = (pr >= r0) & (pr < r0 + sh)
    col_in = (pc >= c0) & (pc < c0 + sw)
    m = row_in[:, None] & col_in[None, :]
    if not m.any():
        return None
    # a cell whose "parent" is ITSELF (saturated ceil-halving at degenerate
    # dims) must keep its first-pass value: the reference's serial scan
    # reads the pre-write slot there (0 on decode, the original coef on
    # encode), so the rewrite passes below exclude it
    row_eq = pr == (r0 + np.arange(sh))
    col_eq = pc == (c0 + np.arange(sw))
    m &= ~(row_eq[:, None] & col_eq[None, :])
    return m if m.any() else None


# --- encoder quantize + in-loop dequant writeback ---

@functools.lru_cache(maxsize=None)
def make_quantize(cfg: HzccCfg):
    """Returns jitted (coefs, blockdata, eprm_m, maintlt_m, q) ->
    (dequantized_coefs, v_scan). eprm_m / maintlt_m are (nbv, nbh) bool maps
    from the MV field (P-frame psy masking; ref: hzcc.c:369-380)."""
    w, h = cfg.w, cfg.h
    sw0, sh0 = _dimat(0, w), _dimat(0, h)
    psy_i = bool(cfg.do_psy & K.PSY_I_VISUAL_MASKING) and cfg.is_luma
    psy_p = bool(cfg.do_psy & K.PSY_P_VISUAL_MASKING) and cfg.is_luma

    def f(x, blockdata, eprm_m, maintlt_m, q):
        x = x.astype(jnp.int32)
        ll_save = x[0, 0]
        x = x.at[0, 0].set(0)
        q = fix_quant(q)
        vs = []
        # LL subband (ref: hzcc.c:307-328 / lossless 268-281)
        qp = lfquant(q, cfg)
        ll = x[:sh0, :sw0]
        if cfg.lossless:
            v = ll
        elif not cfg.isP:
            v = quant_sub(ll, qp, -(qp // 6))
        else:
            v = quant_s(ll, qp)
        vs.append(v.reshape(-1))
        if not cfg.lossless:
            deq = dequant_d(v, qp) if cfg.isP else dequant_s(v, qp)
            x = x.at[:sh0, :sw0].set(jnp.where(v != 0, deq, 0))
        def quant_one(xcur, sub, l, s, sw, sh):
            """v and tmq for one subband given the current plane state."""
            qp = hfquant(cfg, q, s, l)
            flags = _flags_map(blockdata, sw, sh, cfg.nbh, cfg.nbv)
            parc = _parent_vals(xcur, l, s, w, h, sw, sh, 1)
            if cfg.isP:
                tmq = tmq4pos_p(qp, flags, parc)
                if psy_p:
                    gparc = _parent_vals(xcur, l, s, w, h, sw, sh, 2)
                    by, bx = _block_gather(sw, sh, cfg.nbh, cfg.nbv)
                    eprm = eprm_m[by[:, None], bx[None, :]]
                    mlt = maintlt_m[by[:, None], bx[None, :]]
                    simc = (flags & K.IS_SIMCMPLX) != 0
                    texture = parc == 0
                    gtexture = gparc == 0
                    c1 = (gtexture & texture) | eprm | mlt
                    c2 = texture | ~simc
                    v = jnp.where(
                        c1, quant_sub(sub, tmq, tmq >> 3),
                        jnp.where(c2, quant_sub(sub, tmq, jint.divt(tmq, 6)),
                                  quant_sub(sub, tmq, tmq >> 2)))
                else:
                    v = quant_s(sub, tmq)
            else:
                tmq = tmq4pos_i(qp, flags, parc, l)
                if psy_i:
                    ring = (flags & K.IS_RINGING) != 0
                    if l == LVL3:
                        v_nr = quant_sub(sub, tmq, -(tmq >> 3))
                    else:
                        edge = jnp.sign(parc) == jnp.sign(sub)
                        smf = flags & (K.IS_MAINTAIN | K.IS_STABLE)
                        stp = jnp.where(
                            smf == 0, -jint.divt(tmq, 3),
                            jnp.where(edge & (smf == K.IS_STABLE), tmq >> 3,
                                      -jint.divt(tmq, 6)))
                        v_nr = quant_sub(sub, tmq, stp)
                    v = jnp.where(ring, quant_sub(sub, tmq, -jint.divt(tmq, 6)),
                                  v_nr)
                else:
                    if not cfg.is_luma:
                        v = quant_sub(sub, tmq, -(tmq >> 3))
                    else:
                        v = quant_s(sub, tmq)
            return v, tmq

        for (l, s, r0, c0, sw, sh) in subband_plan(w, h):
            sub = x[r0:r0 + sh, c0:c0 + sw]
            if cfg.lossless:
                vs.append(sub.reshape(-1))
                continue
            v, tmq = quant_one(x, sub, l, s, sw, sh)
            x = x.at[r0:r0 + sh, c0:c0 + sw].set(
                jnp.where(v != 0, dequant_d(v, tmq), 0))
            m = _self_parent_mask(w, h, l, s)
            if m is not None:
                # serial-scan fixup: cells whose parent lives in this very
                # subband requantize against the freshly written values.
                # Parents form >>1 chains up to log2(dim) deep; each pass
                # finalizes one more generation (the quantized value feeds
                # the child's parc-zeroness test, so encoder chains can
                # propagate further than one rewrite)
                for _ in range(max(sw, sh).bit_length()):
                    v2, tmq2 = quant_one(x, sub, l, s, sw, sh)
                    v = jnp.where(m, v2, v)
                    fixed = jnp.where(v != 0, dequant_d(v, tmq2), 0)
                    cur = x[r0:r0 + sh, c0:c0 + sw]
                    x = x.at[r0:r0 + sh, c0:c0 + sw].set(
                        jnp.where(m, fixed, cur))
            vs.append(v.reshape(-1))
        x = x.at[0, 0].set(ll_save)
        return x, jnp.concatenate(vs)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def make_dequantize(cfg: HzccCfg):
    """Returns jitted (v_scan, blockdata, q, ll_value) -> coef plane.
    Decoder-side counterpart (ref: hzcc.c:450-583): positions without a coded
    value stay zero; overlapping subband cells resolve in scan order."""
    w, h = cfg.w, cfg.h
    sw0, sh0 = _dimat(0, w), _dimat(0, h)

    def f(v_scan, blockdata, q, ll_value):
        q = fix_quant(q)
        x = jnp.zeros((h, w), dtype=jnp.int32)
        pos = sw0 * sh0
        v = v_scan[:pos].reshape(sh0, sw0)
        if cfg.lossless:
            x = x.at[:sh0, :sw0].set(v)
        else:
            qp = lfquant(q, cfg)
            deq = dequant_d(v, qp) if cfg.isP else dequant_s(v, qp)
            x = x.at[:sh0, :sw0].set(jnp.where(v != 0, deq, 0))
        for (l, s, r0, c0, sw, sh) in subband_plan(w, h):
            v = v_scan[pos:pos + sw * sh].reshape(sh, sw)
            pos += sw * sh
            cur = x[r0:r0 + sh, c0:c0 + sw]
            if cfg.lossless:
                x = x.at[r0:r0 + sh, c0:c0 + sw].set(jnp.where(v != 0, v, cur))
                continue

            def deq_one(xcur):
                qp = hfquant(cfg, q, s, l)
                flags = _flags_map(blockdata, sw, sh, cfg.nbh, cfg.nbv)
                parc = _parent_vals(xcur, l, s, w, h, sw, sh, 1)
                if cfg.isP:
                    tmq = tmq4pos_p(qp, flags, parc)
                else:
                    tmq = tmq4pos_i(qp, flags, parc, l)
                return dequant_d(v, tmq)

            out = jnp.where(v != 0, deq_one(x), cur)
            x = x.at[r0:r0 + sh, c0:c0 + sw].set(out)
            m = _self_parent_mask(w, h, l, s)
            if m is not None:
                # decode-side parc only matters through zeroness, which one
                # rewrite finalizes (zeroness = v != 0, fixed after pass 1)
                out2 = jnp.where(v != 0, deq_one(x),
                                 x[r0:r0 + sh, c0:c0 + sw])
                cur2 = x[r0:r0 + sh, c0:c0 + sw]
                x = x.at[r0:r0 + sh, c0:c0 + sw].set(jnp.where(m, out2, cur2))
        x = x.at[0, 0].set(ll_value)
        return x

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def scan_gather_idx(w, h):
    """Flat plane indices per scan position (for host-side extraction of the
    LL segment values etc.)."""
    sw0, sh0 = _dimat(0, w), _dimat(0, h)
    idx = [((np.arange(sh0)[:, None] * w) + np.arange(sw0)[None, :]).ravel()]
    for (l, s, r0, c0, sw, sh) in subband_plan(w, h):
        rows = (r0 + np.arange(sh))[:, None] * w
        cols = (c0 + np.arange(sw))[None, :]
        idx.append((rows + cols).ravel())
    return np.concatenate(idx).astype(np.int64)
