"""Wavefront TPU motion estimation: the whole pyramid search as one XLA
program.

The reference's raster-order dependencies (spatial candidates + the MV-cost
median predictor read left/top/topleft neighbors; ref: hme.c:1202-1228,
dsv.c:373-400) only couple a block to earlier anti-diagonals, so each level
runs as a lax scan over diagonals with every block of a diagonal searched in
parallel (vmap). Candidate lists are fixed-width with validity masks —
duplicate candidates are harmless because the argmin keeps the first
strict minimum exactly like the serial code. Partial edge blocks use masked
metrics over static windows.

Bit-exact with ops/hme_search (the host oracle); integer-only.
"""
import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import constants as K
from ..core import intmath as im
from ..core.frame import B
from . import jint

U32 = 0xFFFFFFFF
I32MAX = 0x7FFFFFFF
NC = 26            # candidate slots: zero, parent-avg, pred, 3 spatial,
                   # 9 temporal, global, 9 inliers
RECT = np.array([[0, 0], [1, 0], [-1, 0], [0, 1], [0, -1],
                 [-1, -1], [1, -1], [-1, 1], [1, 1]], dtype=np.int32)


def isqrt_u32(n):
    """Integer sqrt (floor) of uint32-ranged values (ref: hme.c:100-124)."""
    n = jnp.asarray(n).astype(jnp.uint32)
    res = jnp.zeros_like(n)
    rem = n

    def body(k, st):
        res, rem = st
        pos = jnp.uint32(1) << (30 - 2 * k).astype(jnp.uint32)
        dif = res + pos
        take = rem >= dif
        rem = jnp.where(take, rem - dif, rem)
        res = (res >> 1) + jnp.where(take, pos, jnp.uint32(0))
        return res, rem

    res, rem = jax.lax.fori_loop(0, 16, lambda k, st: body(jnp.uint32(k), st),
                                 (res, rem))
    return res.astype(jnp.int32)


def seg_bits(v):
    """(ref: dsv.c:334-354)."""
    v = jnp.abs(v) + 1
    nb = 31 - jax.lax.clz(v.astype(jnp.int32))
    return nb * 2 + 2


def mv_cost(px, py, blk_w, blk_h, vid_w, vid_h, mx, my, q, sqr):
    """(ref: dsv.c:356-371 + hme.c:354-366). px/py = median pred.
    int32 arithmetic wraps exactly like the reference's C ints."""
    bits = (seg_bits(mx - px) + seg_bits(my - py)).astype(jnp.int32)
    q = q.astype(jnp.int32)
    b2sr = ((256 * ((q * q) >> K.MAX_QP_BITS) * (blk_w * blk_h))
            // (vid_w * vid_h)).astype(jnp.int32)
    bits = bits + (bits * b2sr >> 7)
    if sqr:
        bits = bits * bits
    cost = jnp.minimum(bits, 1 << 19)
    if sqr:
        return cost * ((q * q) >> K.MAX_QP_BITS) >> (K.MAX_QP_BITS - 2)
    return 3 * cost * q >> K.MAX_QP_BITS


def pred3(left, top, topleft):
    dif = left + top - topleft
    return jnp.where(jnp.abs(dif - left) < jnp.abs(dif - top), left, top)


def movec_pred(fx, fy, i, j):
    """Median predictor gathers with zero defaults (ref: dsv.c:373-400)."""
    def g(f, x, y, ok):
        return jnp.where(ok, f[jnp.clip(y, 0, f.shape[0] - 1),
                              jnp.clip(x, 0, f.shape[1] - 1)], 0)
    lx = g(fx, i - 1, j, i > 0)
    ly = g(fy, i - 1, j, i > 0)
    tx = g(fx, i, j - 1, j > 0)
    ty = g(fy, i, j - 1, j > 0)
    cx = g(fx, i - 1, j - 1, (i > 0) & (j > 0))
    cy = g(fy, i - 1, j - 1, (i > 0) & (j > 0))
    return pred3(lx, tx, cx), pred3(ly, ty, cy)


def neighbordif2(fx, fy, fskip, i, j):
    """(ref: dsv.c:402-438)."""
    k = (jnp.clip(j, 0, fx.shape[0] - 1), jnp.clip(i, 0, fx.shape[1] - 1))
    cmx, cmy = fx[k], fy[k]

    def nb(x, y, ok):
        yy = jnp.clip(y, 0, fx.shape[0] - 1)
        xx = jnp.clip(x, 0, fx.shape[1] - 1)
        vx, vy = fx[yy, xx], fy[yy, xx]
        use = ok & ((vx != 0) | (vy != 0)) & (fskip[yy, xx] == 0)
        return jnp.where(use, vx, cmx), jnp.where(use, vy, cmy)

    vx0, vy0 = nb(i - 1, j, i > 0)
    vx1, vy1 = nb(i, j - 1, j > 0)
    d0 = jnp.abs(vx0 - cmx) + jnp.abs(vy0 - cmy)
    d1 = jnp.abs(vx1 - cmx) + jnp.abs(vy1 - cmy)
    small = (jnp.abs(cmx) < 2) & (jnp.abs(cmy) < 2)
    return jnp.where(small, 0, d0), jnp.where(small, 0, d1)


def sar(v, s):
    return v >> s


def sar_r(v, s):
    return (v + (1 << (s - 1))) >> s


# ---------------------------------------------------------------------------
# masked metrics over static (bh_max, bw_max) windows
# ---------------------------------------------------------------------------

def window(plane, x, y, h, w):
    """dynamic_slice of a bordered plane at visible coords; int32."""
    return jax.lax.dynamic_slice(
        plane, (B + y, B + x), (h, w)).astype(jnp.int32)


def masked_sse(a, b, bw, bh):
    """(ref: hme.c:198-242); a/b static windows, bw/bh dynamic."""
    h, w = a.shape
    ii = jnp.arange(w)[None, :]
    jj = jnp.arange(h)[:, None]
    m = (ii < bw) & (jj < bh)
    d = jnp.where(m, a - b, 0)
    acc = (d * d).astype(jnp.uint32).sum().astype(jnp.int32)
    return jnp.where((bw == 0) | (bh == 0), I32MAX, acc)


def _quads(a):
    return a[0::2, 0::2], a[0::2, 1::2], a[1::2, 0::2], a[1::2, 1::2]


def _uavg4(a, b, c, d):
    return (a + b + c + d + 2) >> 2


def masked_metr_acc(a, b, bw, bh, ew, tw, aw):
    """(ref: hme.c:126-196). ew/tw/aw dynamic scalars."""
    a1, a2, a3, a4 = _quads(a)
    b1, b2, b3, b4 = _quads(b)
    qh, qw = a1.shape
    qm = ((jnp.arange(qw)[None, :] < (bw // 2))
          & (jnp.arange(qh)[:, None] < (bh // 2)))
    se = _uavg4(jnp.abs(a1 - b1), jnp.abs(a2 - b2), jnp.abs(a3 - b3),
                jnp.abs(a4 - b4))
    ta = _uavg4(jnp.abs(a1 - a2), jnp.abs(a2 - a3), jnp.abs(a3 - a4),
                jnp.abs(a4 - a1))
    tb = _uavg4(jnp.abs(b1 - b2), jnp.abs(b2 - b3), jnp.abs(b3 - b4),
                jnp.abs(b4 - b1))
    s0 = _uavg4(a1, a2, a3, a4)
    s1 = _uavg4(b1, b2, b3, b4)
    t = (((se * se) << ew) + (((ta - tb) ** 2) << tw)
         + (((s0 - s1) ** 2) << aw))
    return jnp.where(qm, t, 0).astype(jnp.uint32).sum()


def metric_return(acc, bw, bh):
    return (isqrt_u32(acc) * (bw * bh)) // ((bw + bh + 1) >> 1)


def masked_metr(a, b, bw, bh, ew, tw, aw):
    acc = masked_metr_acc(a, b, bw, bh, ew, tw, aw)
    r = metric_return(acc, bw, bh)
    return jnp.where((bw == 0) | (bh == 0), I32MAX, r)


def hier_metr(level, a, b, bw, bh, ew, tw, aw):
    if level > 1:
        return masked_sse(a, b, bw, bh)
    return masked_metr(a, b, bw, bh, ew, tw, aw)


# ---------------------------------------------------------------------------
# block features (ref: hme.c:492-749) on masked static windows
# ---------------------------------------------------------------------------

def block_feat_detail(a, bw, bh):
    """(detail, avg, var, tex) over the masked window."""
    h, w = a.shape
    ii = jnp.arange(w)[None, :]
    jj = jnp.arange(h)[:, None]
    m = (ii < bw) & (jj < bh)
    area = bw * bh
    s = jnp.where(m, a, 0).astype(jnp.int32).sum()
    dh = jnp.abs(a[:, 1:] - a[:, :-1])
    mh = (ii[:, 1:] < bw) & (jj < bh)
    sh = jnp.where(mh, dh, 0).astype(jnp.int32).sum()
    dv = jnp.abs(a[1:, :] - a[:-1, :])
    mv_ = (ii < bw) & (jj[1:, :] < bh)
    sv = jnp.where(mv_, dv, 0).astype(jnp.int32).sum()
    avg = s // jnp.maximum(area, 1)
    var = jnp.where(m, jnp.abs(a - avg), 0).astype(jnp.int32).sum()
    tex = jnp.maximum(sh, sv) - (var >> 1)
    detail = (var >> 1) + jnp.maximum(tex, 0)
    return detail, avg, var, jnp.maximum(sh, sv)


def block_feat_qtex(a, bw, bh):
    """quant_tex (ref: hme.c:586-617)."""
    h, w = a.shape
    q = a >> 4
    ii = jnp.arange(w)[None, :]
    jj = jnp.arange(h)[:, None]
    dh = q[:, :-1] - q[:, 1:]
    mh = (ii[:, 1:] < bw) & (jj < bh)
    sh = jnp.where(mh, dh * dh, 0).astype(jnp.uint32).sum()
    dv = q[1:, :] - q[:-1, :]
    mv_ = (ii < bw) & (jj[1:, :] < bh)
    sv = jnp.where(mv_, dv * dv, 0).astype(jnp.uint32).sum()
    return isqrt_u32(jnp.maximum(sh, sv)) // ((bw + bh + 1) >> 1)


def _hist16(idx, m):
    oh = (idx[..., None] == jnp.arange(16)[None, None, :])
    return jnp.where(m[..., None], oh, False).sum(axis=(0, 1))


def block_feat_hvar(a, bw, bh, avg):
    """(ref: hme.c:711-749)."""
    h, w = a.shape
    ii = jnp.arange(w)[None, :]
    jj = jnp.arange(h)[:, None]
    m = (ii < bw) & (jj < bh)
    area = jnp.maximum(bw * bh, 1)
    havg = jnp.maximum(avg, 1)
    q16 = ((8 << 16) // havg).astype(jnp.int32)
    hi = jnp.clip((a.astype(jnp.int32) * q16) >> 16, 0, 15)
    hist = _hist16(hi, m).astype(jnp.int32)
    hm = hist.sum() // 16
    hv = ((hist - hm) ** 2).astype(jnp.uint32).sum()
    return ((hv * 256) // (16 * area * area).astype(jnp.uint32)
            ).astype(jnp.int32)


def block_feat_peaks(a, bw, bh, avg):
    """(ref: hme.c:624-692)."""
    h, w = a.shape
    havg = jnp.maximum(avg, 1)
    q16 = ((8 << 16) // havg).astype(jnp.int32)
    a1, a2, a3, a4 = _quads(a)
    ds = _uavg4(a1, a2, a3, a4).astype(jnp.int32)
    qh, qw = ds.shape
    qm = ((jnp.arange(qw)[None, :] < (bw // 2))
          & (jnp.arange(qh)[:, None] < (bh // 2)))
    hi = jnp.minimum((ds * q16) >> 16, 15)
    hist = _hist16(hi, qm).astype(jnp.int32)
    pavg = hist.sum() // 16
    maxv = hist.max() >> 2
    left = jnp.concatenate([jnp.array([-1]), hist[:-1]])
    right = jnp.concatenate([hist[1:], jnp.array([-1])])
    pk = (hist > left) & (hist > right) & ((hist > maxv) | (hist > pavg))
    return pk.sum()


def masked_avg(a, bw, bh):
    h, w = a.shape
    m = ((jnp.arange(w)[None, :] < bw) & (jnp.arange(h)[:, None] < bh))
    s = jnp.where(m, a, 0).astype(jnp.int32).sum()
    return s // jnp.maximum(bw * bh, 1)


# ---------------------------------------------------------------------------
# subpel probe grid (ref: hme.c:787-837) on a static 21x21 window
# ---------------------------------------------------------------------------

SPD = 17
HPD = 34
QPD = 68


def qpel_grid(refwin):
    """refwin: (21, 21) int32; (1, 1) is the probe origin."""
    r = refwin
    cols = jnp.arange(SPD)
    hbuf = 5 * (r[:, 1:SPD + 1] + r[:, 2:SPD + 2]) - (r[:, 0:SPD]
                                                      + r[:, 3:SPD + 3])
    hg = jnp.zeros((HPD + 1, HPD + 1), jnp.int32)
    fr = r[1:1 + SPD, 1:1 + SPD]
    hh = jnp.clip((5 * (r[1:1 + SPD, 1:1 + SPD] + r[1:1 + SPD, 2:2 + SPD])
                   - (r[1:1 + SPD, 0:SPD] + r[1:1 + SPD, 3:3 + SPD]) + 4) >> 3,
                  0, 255)
    vv = jnp.clip((5 * (r[1:1 + SPD, 1:1 + SPD] + r[2:2 + SPD, 1:1 + SPD])
                   - (r[0:SPD, 1:1 + SPD] + r[3:3 + SPD, 1:1 + SPD]) + 4) >> 3,
                  0, 255)
    dg = 5 * (hbuf[1:1 + SPD] + hbuf[2:2 + SPD]) - (hbuf[0:SPD]
                                                    + hbuf[3:3 + SPD])
    dg = jnp.clip((dg + 32) >> 6, 0, 255)
    hg = hg.at[0:2 * SPD:2, 0:2 * SPD:2].set(fr)
    hg = hg.at[0:2 * SPD:2, 1:2 * SPD:2].set(hh)
    hg = hg.at[1:2 * SPD:2, 0:2 * SPD:2].set(vv)
    hg = hg.at[1:2 * SPD:2, 1:2 * SPD:2].set(dg)
    h0 = hg[:HPD, :HPD]
    hx = hg[:HPD, 1:HPD + 1]
    hy = hg[1:HPD + 1, :HPD]
    hxy = hg[1:HPD + 1, 1:HPD + 1]
    q = jnp.zeros((QPD, QPD), jnp.int32)
    q = q.at[0::2, 0::2].set(h0)
    q = q.at[0::2, 1::2].set((h0 + hx + 1) >> 1)
    q = q.at[1::2, 0::2].set((h0 + hy + 1) >> 1)
    q = q.at[1::2, 1::2].set(_uavg4(h0, hx, hy, hxy))
    return q


def qpsad(srcsp, q, t0, t1, ew, tw, aw):
    """(ref: hme.c:244-269). srcsp: (16,16) int32; t0/t1 dynamic in [-3,3]."""
    sub = jax.lax.dynamic_slice(q, (4 + t1, 4 + t0), (61, 61))[::4, ::4]
    a1, a2, a3, a4 = _quads(srcsp)
    b1, b2, b3, b4 = _quads(sub)
    se = _uavg4(jnp.abs(a1 - b1), jnp.abs(a2 - b2), jnp.abs(a3 - b3),
                jnp.abs(a4 - b4))
    ta = _uavg4(jnp.abs(a1 - a2), jnp.abs(a2 - a3), jnp.abs(a3 - a4),
                jnp.abs(a4 - a1))
    tb = _uavg4(jnp.abs(b1 - b2), jnp.abs(b2 - b3), jnp.abs(b3 - b4),
                jnp.abs(b4 - b1))
    s0 = _uavg4(a1, a2, a3, a4)
    s1 = _uavg4(b1, b2, b3, b4)
    acc = (((se * se) << ew) + (((ta - tb) ** 2) << tw)
           + (((s0 - s1) ** 2) << aw)).astype(jnp.uint32).sum()
    return metric_return(acc, 16, 16)


# ---------------------------------------------------------------------------
# err_intra (ref: hme.c:839-889) with exact unsigned wraparound
# ---------------------------------------------------------------------------

def err_intra(a, b, bw, bh, avg_sb, avg_src, ratio):
    """psy = (0, 1, 2) as at the call site (ref: hme.c:917-919).
    Returns (intra_sb, intra_src, inter) as uint32."""
    a1, a2, a3, a4 = _quads(a)
    b1, b2, b3, b4 = _quads(b)
    qh, qw = a1.shape
    qm = ((jnp.arange(qw)[None, :] < (bw // 2))
          & (jnp.arange(qh)[:, None] < (bh // 2)))
    ratio_u = ratio.astype(jnp.uint32)
    s0 = _uavg4(a1, a2, a3, a4)
    s1 = _uavg4(b1, b2, b3, b4)
    ta = _uavg4(jnp.abs(a1 - a2), jnp.abs(a2 - a3), jnp.abs(a3 - a4),
                jnp.abs(a4 - a1))
    tb = _uavg4(jnp.abs(b1 - b2), jnp.abs(b2 - b3), jnp.abs(b3 - b4),
                jnp.abs(b4 - b1))
    ae = _uavg4(jnp.abs(a1 - b1), jnp.abs(a2 - b2), jnp.abs(a3 - b3),
                jnp.abs(a4 - b4))
    inter = (((ae * ae).astype(jnp.uint32) * ratio_u) >> 5)
    inter = inter + (((ta - tb) ** 2) << 1).astype(jnp.uint32)
    inter = inter + (((s0 - s1) ** 2) << 2).astype(jnp.uint32)
    inter = jnp.where(qm, inter, 0).sum()

    def intra_term(avgv):
        aev = _uavg4(jnp.abs(a1 - avgv), jnp.abs(a2 - avgv),
                     jnp.abs(a3 - avgv), jnp.abs(a4 - avgv))
        t = ((aev * aev).astype(jnp.uint32)
             + ((ta * ta) << 1).astype(jnp.uint32)
             + (((s0 - avgv) ** 2) << 3).astype(jnp.uint32))
        return jnp.where(qm, t, 0).sum()

    return (intra_term(avg_sb), intra_term(avg_src),
            (inter * ratio_u) >> 5)


# ---------------------------------------------------------------------------
# per-level wavefront search
# ---------------------------------------------------------------------------

class WaveCfg(NamedTuple):
    nbh: int
    nbv: int
    blk_w: int
    blk_h: int
    vid_w: int
    vid_h: int
    subsamp: int
    effort: int
    lossless: bool
    pyramid_levels: int
    has_tmv: bool
    skip_thresh_neg: bool   # skip_block_thresh < 0 (disables skip test)
    dims: tuple             # per-level (w, h) of the luma planes

    @property
    def psyf_all(self):
        import dsv2_tpu.ops.hzcc as hzcc
        return hzcc.spatial_psy_factor(self, -1)


_PTS = np.array([[0, 0], [-2, 0], [2, 0], [0, -2], [0, 2],
                 [-2, -2], [2, 2], [2, -2], [-2, 2]], dtype=np.int32)


def invalid_block(bx, by, bw, bh, pad, fw, fh):
    """(ref: hme.c:426-434). fw/fh = frame dims at the level (static)."""
    return ((bx - pad < -B) | (by - pad < -B)
            | (bx + bw + pad >= fw + B) | (by + bh + pad >= fh + B))


def _refine_loop(cfg, level, src_w, ref_pl, bx, by, bw, bh, psy,
                 bestx, besty, best, qthresh, px, py, quant, fw, fh):
    """Greedy walk with retry (ref: hme.c:1300-1370). psy = (ew, tw, aw)
    traced scalars only via static closure... ew/tw/aw are traced int32."""
    step = 1 << level
    ew, tw, aw = psy

    def metric(tvx, tvy):
        rw = window(ref_pl, bx + tvx, by + tvy, cfg.blk_h, cfg.blk_w)
        if level > 1:
            return masked_sse(src_w, rw, bw, bh)
        return masked_metr(src_w, rw, bw, bh, ew, tw, aw)

    def cost(tvx, tvy):
        return mv_cost(px, py, cfg.blk_w, cfg.blk_h, cfg.vid_w, cfg.vid_h,
                       tvx * step * 4, tvy * step * 4, quant,
                       1 if level > 1 else 0)

    rectx = jnp.array([RECT[k][0] for k in range(5)], jnp.int32)
    recty = jnp.array([RECT[k][1] for k in range(5)], jnp.int32)

    def body(st):
        bestx, besty, best, metr, good, done = st
        # the 5 probe metrics share (bestx, besty) -> one vmapped metric;
        # only the strictly-sequential improvement gating stays unrolled
        # (tiny scalar ops)
        tvxs = bestx + rectx
        tvys = besty + recty
        sc_raws = jax.vmap(metric)(tvxs, tvys)
        scs = sc_raws + jax.vmap(cost)(tvxs, tvys)
        improved = jnp.bool_(False)
        for k in range(5):
            tvx, tvy = tvxs[k], tvys[k]
            sc_raw, sc = sc_raws[k], scs[k]
            inval = invalid_block(bx + tvx, by + tvy, bw, bh, 0, fw, fh)
            do = (~improved) & (~inval)
            if 1 <= k <= 4:
                metr = metr.at[k - 1].set(jnp.where(do, sc_raw, metr[k - 1]))
            if level == 0:
                ge = do & (tvx == 0) & (tvy == 0) & (sc_raw <= qthresh)
            else:
                ge = jnp.bool_(False)
            better = do & (~ge) & (best > sc)
            bestx = jnp.where(ge | better, tvx, bestx)
            besty = jnp.where(ge | better, tvy, besty)
            best = jnp.where(ge, sc_raw, jnp.where(better, sc, best))
            good = good | ge
            done = done | ge
            improved = improved | better | ge
        # diagonal probe only when the 5-point pass had no improvement
        tvx = bestx + jnp.where(metr[0] <= metr[1], 1, -1)
        tvy = besty + jnp.where(metr[2] <= metr[3], 1, -1)
        inval = invalid_block(bx + tvx, by + tvy, bw, bh, 0, fw, fh)
        do = (~improved) & (~done)
        sc = metric(tvx, tvy) + cost(tvx, tvy)
        better = do & (~inval) & (best > sc)
        bestx = jnp.where(better, tvx, bestx)
        besty = jnp.where(better, tvy, besty)
        best = jnp.where(better, sc, best)
        done = done | (do & ~better)
        return bestx, besty, best, metr, good, done

    def cond(st):
        return ~st[5]

    def masked_body(_, st):
        new = body(st)
        done = st[5]
        return tuple(jnp.where(done, a, b) for a, b in zip(st, new))

    metr0 = jnp.full((4,), I32MAX, jnp.int32)
    st = (bestx, besty, best, metr0, jnp.bool_(False), jnp.bool_(False))
    # On TPU every while_loop iteration pays a ~1 ms scalar-unit
    # condition sync (this dominated the whole-search profile). The walk
    # almost always converges within a few steps, so run a fixed masked
    # prefix first and leave the while only for the rare stragglers.
    st = jax.lax.fori_loop(0, 8, masked_body, st)
    st = jax.lax.while_loop(cond, lambda s: body(s), st)
    return st[0], st[1], st[2], st[4]


def _block_search(cfg, level, carry, parent_x, parent_y, srcl, refl, ogrl,
                  tmv_x, tmv_y, gx, gy, quant, i, j, lane_valid):
    """Candidate search + refine for one block (vmapped over a diagonal).
    Returns a dict of per-block results (level-0 decisions happen in
    _level0_graph). (ref: hme.c:1413-1630)."""
    fx, fy, fskip = carry["fx"], carry["fy"], carry["fskip"]
    step = 1 << level
    fw, fh = cfg.dims[level]
    y_w, y_h = cfg.blk_w, cfg.blk_h
    bx = (i * y_w) >> level
    by = (j * y_h) >> level
    inb = (bx < fw) & (by < fh)
    valid = lane_valid & inb
    bw = jnp.clip(fw - bx, 0, y_w)
    bh = jnp.clip(fh - by, 0, y_h)
    src_w = window(srcl, bx, by, y_h, y_w)

    # psy weights + motion bias (ref: hme.c:1424-1481)
    motion_bias = jnp.int32(y_w * y_h)
    var_src = jnp.int32(0)
    avg_src = jnp.int32(0)
    ew = jnp.int32(2)
    tw = jnp.int32(1)
    aw = jnp.int32(0)
    if level <= 1:
        detail, avg_src, _, _ = block_feat_detail(src_w, bw, bh)
        var_src = detail.astype(jnp.int32)
        tvar = var_src + ((var_src >> 10) ** 2)
        tvar = jint.divt(8 * tvar * quant >> 9, bw * bh)
        hvar = block_feat_hvar(src_w, bw, bh, avg_src).astype(jnp.int32)
        qtex = block_feat_qtex(src_w, bw, bh).astype(jnp.int32)
        npeaks = block_feat_peaks(src_w, bw, bh, avg_src).astype(jnp.int32)
        motion_bias = jnp.where(
            tvar != 0, motion_bias + tvar * (hvar - qtex) * npeaks,
            motion_bias)
        motion_bias = jnp.maximum(motion_bias, 0) // (
            2 + jnp.abs(gx) + jnp.abs(gy))
        smooth = var_src <= (8 * bw * bh * quant >> 9)
        motion_bias = jnp.where(smooth, 0, motion_bias)
        ew = jnp.where(smooth, 2, 1)
        tw = jnp.where(smooth, 1, 2)
        aw = jnp.where(smooth, 2, 1)
        aw = jnp.where(var_src > 24 * bw * bh, 0, aw)

    # ---- candidates (ref: hme.c:1443-1528) ----
    cand_x = jnp.zeros((NC,), jnp.int32)
    cand_y = jnp.zeros((NC,), jnp.int32)
    cand_ok = jnp.zeros((NC,), bool).at[0].set(True)
    lax_ = jnp.int32(0)
    lay_ = jnp.int32(0)
    if level < cfg.pyramid_levels:
        pmask = ~((step << 1) - 1)
        pi = i & pmask
        pj = j & pmask
        ptx = pi + _PTS[:, 0] * step
        pty = pj + _PTS[:, 1] * step
        pok = (ptx >= 0) & (ptx < cfg.nbh) & (pty >= 0) & (pty < cfg.nbv)
        pxv = jnp.where(pok, parent_x[jnp.clip(pty, 0, cfg.nbv - 1),
                                      jnp.clip(ptx, 0, cfg.nbh - 1)], 0)
        pyv = jnp.where(pok, parent_y[jnp.clip(pty, 0, cfg.nbv - 1),
                                      jnp.clip(ptx, 0, cfg.nbh - 1)], 0)
        npar = pok.sum().astype(jnp.int32)
        lax0 = jint.divt(jnp.where(pok, pxv, 0).sum(), jnp.maximum(npar, 1))
        lay0 = jint.divt(jnp.where(pok, pyv, 0).sum(), jnp.maximum(npar, 1))
        dist = jnp.where(pok, (pxv - lax0) ** 2 + (pyv - lay0) ** 2, 0)
        avgd = dist.sum() // jnp.maximum(npar, 1)
        ssd = jnp.where(pok, (dist - avgd) ** 2, 0).astype(jnp.int32).sum()
        thresh = avgd + isqrt_u32(jint.divt(ssd, jnp.maximum(npar, 1)))
        inl = pok & (dist <= thresh)
        nl = inl.sum().astype(jnp.int32)
        lax_ = jint.divt(jnp.where(inl, pxv, 0).sum(), jnp.maximum(nl, 1))
        lay_ = jint.divt(jnp.where(inl, pyv, 0).sum(), jnp.maximum(nl, 1))
        cand_x = cand_x.at[1].set(lax_)
        cand_y = cand_y.at[1].set(lay_)
        cand_ok = cand_ok.at[1].set(True)
        if level == 0:
            ppx, ppy = movec_pred(fx, fy, i, j)
            cand_x = cand_x.at[2].set(sar_r(ppx, 2))
            cand_y = cand_y.at[2].set(sar_r(ppy, 2))
            cand_ok = cand_ok.at[2].set(True)
        # spatial left/top/topleft at the level's stride
        for si, (dx_, dy_) in enumerate(((-1, 0), (0, -1), (-1, -1))):
            xi = i + dx_ * step
            yj = j + dy_ * step
            ok = (xi >= 0) & (yj >= 0)
            vx = jnp.where(ok, fx[jnp.clip(yj, 0, cfg.nbv - 1),
                                  jnp.clip(xi, 0, cfg.nbh - 1)], 0)
            vy = jnp.where(ok, fy[jnp.clip(yj, 0, cfg.nbv - 1),
                                  jnp.clip(xi, 0, cfg.nbh - 1)], 0)
            cand_x = cand_x.at[3 + si].set(sar_r(vx, 2))
            cand_y = cand_y.at[3 + si].set(sar_r(vy, 2))
            cand_ok = cand_ok.at[3 + si].set(ok)
        if cfg.has_tmv:
            tx = i + RECT[:, 0] * step
            ty = j + RECT[:, 1] * step
            tok = (tx >= 0) & (tx < cfg.nbh) & (ty >= 0) & (ty < cfg.nbv)
            tvx = jnp.where(tok, tmv_x[jnp.clip(ty, 0, cfg.nbv - 1),
                                       jnp.clip(tx, 0, cfg.nbh - 1)], 0)
            tvy = jnp.where(tok, tmv_y[jnp.clip(ty, 0, cfg.nbv - 1),
                                       jnp.clip(tx, 0, cfg.nbh - 1)], 0)
            cand_x = jax.lax.dynamic_update_slice(cand_x, sar_r(tvx, 2), (6,))
            cand_y = jax.lax.dynamic_update_slice(cand_y, sar_r(tvy, 2), (6,))
            cand_ok = jax.lax.dynamic_update_slice(cand_ok, tok, (6,))
        cand_x = cand_x.at[15].set(gx)
        cand_y = cand_y.at[15].set(gy)
        cand_ok = cand_ok.at[15].set(True)
        cand_x = jax.lax.dynamic_update_slice(cand_x, pxv, (16,))
        cand_y = jax.lax.dynamic_update_slice(cand_y, pyv, (16,))
        cand_ok = jax.lax.dynamic_update_slice(cand_ok, inl, (16,))
    # scale to level resolution (ref: hme.c:1522-1526)
    cand_x = sar(cand_x, level)
    cand_y = sar(cand_y, level)

    # ---- evaluate candidates ----
    def eval_cand(dx, dy, ok):
        inval = invalid_block(bx + dx, by + dy, bw, bh, 0, fw, fh)
        rw = window(refl, bx + dx, by + dy, y_h, y_w)
        if level > 1:
            raw = masked_sse(src_w, rw, bw, bh)
        else:
            raw = masked_metr(src_w, rw, bw, bh, ew, tw, aw)
        sc = raw + mv_cost(*movec_pred(fx, fy, i, j), y_w, y_h,
                           cfg.vid_w, cfg.vid_h, dx * step * 4, dy * step * 4,
                           quant, 1 if level > 1 else 0)
        sc = jnp.where((dx == lax_) & (dy == lay_),
                       jnp.maximum(sc - (motion_bias >> level), 0), sc)
        use = ok & (~inval)
        return jnp.where(use, sc, I32MAX), jnp.where(use, raw, I32MAX), use

    scores, raws, uses = jax.vmap(eval_cand)(cand_x, cand_y, cand_ok)
    best_k = jnp.argmin(scores)  # first minimum, like the serial strict <
    best_score = scores[best_k]
    best_score = jnp.where(uses.any(), best_score, I32MAX)
    score_zero = jnp.where(uses[0], raws[0], I32MAX)
    dx = cand_x[best_k]
    dy = cand_y[best_k]

    # ---- good-enough vs source reference (ref: hme.c:1569-1584) ----
    qthresh = ((quant * bw * bh) >> 11)
    qthresh = jnp.where((jnp.abs(dx) <= 1) & (jnp.abs(dy) <= 1),
                        qthresh * 2, qthresh)
    ogr_w = window(ogrl, bx, by, y_h, y_w)
    zoscore = masked_metr(src_w, ogr_w, bw, bh, ew, tw, aw)
    ge0 = zoscore < qthresh
    best0 = jnp.where(ge0, jnp.where(level == 0, score_zero, 0), best_score)
    dx = jnp.where(ge0, 0, dx)
    dy = jnp.where(ge0, 0, dy)

    # ---- greedy refine ----
    px_, py_ = movec_pred(fx, fy, i, j)
    rdx, rdy, rbest, rgood = _refine_loop(
        cfg, level, src_w, refl, bx, by, bw, bh, (ew, tw, aw),
        dx, dy, best0, qthresh, px_, py_, quant, fw, fh)
    dx = jnp.where(ge0, 0, rdx)
    dy = jnp.where(ge0, 0, rdy)
    best = jnp.where(ge0, best0, rbest)
    good = ge0 | (rgood & ~ge0)
    return dict(valid=valid, i=i, j=j, bx=bx, by=by, bw=bw, bh=bh,
                dx=dx, dy=dy, best=best, good=good, lax=lax_, lay=lay_,
                motion_bias=motion_bias, var_src=var_src, avg_src=avg_src,
                psy=(ew, tw, aw), src_w=src_w, score_zero=score_zero)


def _lane_grid(cfg, level):
    step = 1 << level
    ca = (cfg.nbh + step - 1) // step
    cb = (cfg.nbv + step - 1) // step
    return step, ca, cb, min(ca, cb), ca + cb - 1


def refine_level_graph(cfg, level, srcl, refl, ogrl, parent_x, parent_y,
                       tmv_x, tmv_y, gx, gy, quant):
    """Upper pyramid levels (no mode decisions): returns (fx, fy) int32
    fields in full-resolution full-pel units (ref: hme.c:1594-1596)."""
    step, ca, cb, lmax, nd = _lane_grid(cfg, level)
    fx = jnp.zeros((cfg.nbv, cfg.nbh), jnp.int32)
    fy = jnp.zeros((cfg.nbv, cfg.nbh), jnp.int32)
    fskip = jnp.zeros((cfg.nbv, cfg.nbh), jnp.uint8)

    def diag(d, st):
        fx, fy = st
        a0 = jnp.maximum(0, d - (cb - 1))
        a = a0 + jnp.arange(lmax)
        b = d - a
        lane_ok = (a < ca) & (b >= 0) & (b < cb)
        i = a * step
        j = b * step
        carry = dict(fx=fx, fy=fy, fskip=fskip)

        def one(i_, j_, ok_):
            r = _block_search(cfg, level, carry, parent_x, parent_y,
                              srcl, refl, ogrl, tmv_x, tmv_y, gx, gy,
                              quant, i_, j_, ok_)
            return r["dx"] * step, r["dy"] * step, r["valid"]

        ox, oy, ov = jax.vmap(one)(i, j, lane_ok)
        jv = jnp.where(ov, j, cfg.nbv)
        fx = fx.at[jv, i].set(ox, mode="drop")
        fy = fy.at[jv, i].set(oy, mode="drop")
        return fx, fy

    fx, fy = jax.lax.fori_loop(0, nd, diag, (fx, fy))
    return fx, fy


def global_motion_graph(cfg, level, fx, fy):
    """(ref: hme.c:1973-1999)."""
    step, ca, cb, _, _ = _lane_grid(cfg, level)
    sx = fx[0::step, 0::step].astype(jnp.int32).sum()
    sy = fy[0::step, 0::step].astype(jnp.int32).sum()
    n = ca * cb
    return jint.divt(sx * 2, n), jint.divt(sy * 2, n)


# ---------------------------------------------------------------------------
# level-0: subpel + mode decisions (ref: hme.c:1051-1164, 1598-1821)
# ---------------------------------------------------------------------------

def _subpel(cfg, srcl, refl, bx, by, bw, bh, fpx, fpy, best_fp, psy,
            px_, py_, quant, fw, fh):
    """(ref: hme.c:1051-1164). Returns (best, sub_x, sub_y)."""
    ew, tw, aw = psy
    y_w, y_h = cfg.blk_w, cfg.blk_h
    src_w = window(srcl, bx, by, y_h, y_w)
    yarea = bw * bh
    dx4 = (1, -1, 0, 0)
    dy4 = (0, 0, 1, -1)
    quad = []
    for n in range(4):
        rw = window(refl, bx + fpx + dx4[n], by + fpy + dy4[n], y_h, y_w)
        quad.append(masked_sse(src_w, rw, bw, bh))
    area_ratio = (8 * (16 * 16)) // jnp.maximum(yarea, 1)
    iarea_ratio = (8 * yarea) // (16 * 16)
    best = ((best_fp.astype(jnp.uint32) * area_ratio.astype(jnp.uint32))
            >> 3).astype(jnp.int32)
    xx = bx + ((bw >> 1) - 8)
    yy = by + ((bh >> 1) - 8)
    refwin = window(refl, xx + fpx - 2, yy + fpy - 2, 21, 21)
    q = qpel_grid(refwin)
    srcsp = window(srcl, xx, yy, 16, 16)
    # primary/secondary direction pick (ref: hme.c:1108-1133)
    prix = jnp.where(quad[3] >= quad[2], 0, 0)
    priy = jnp.where(quad[3] >= quad[2], 1, -1)
    secx = jnp.where(quad[1] >= quad[0], 1, -1)
    secy = jnp.int32(0)
    ms1 = jnp.where(quad[1] >= quad[0], quad[0], quad[1])
    ms2 = jnp.where(quad[3] >= quad[2], quad[2], quad[3])
    swap = ms2 > ms1
    prix, secx = jnp.where(swap, secx, prix), jnp.where(swap, prix, secx)
    priy, secy = jnp.where(swap, secy, priy), jnp.where(swap, priy, secy)
    diagx = prix + secx
    diagy = priy + secy
    # all 7 probes as one vmapped metric; the reference's sequential
    # strict-improvement update is equivalent to picking the FIRST probe
    # attaining the masked minimum (jnp.argmin returns the first)
    t0s = jnp.stack([prix << 1, prix, secx << 1, secx, diagx << 1, diagx,
                     prix + diagx])
    t1s = jnp.stack([priy << 1, priy, secy << 1, secy, diagy << 1, diagy,
                     priy + diagy])
    if cfg.effort < 8:
        do_probe = ((t0s | t1s) & 1) == 0  # half-pel only at low effort
    else:
        do_probe = jnp.ones(7, bool)

    def probe(t0, t1):
        sc = qpsad(srcsp, q, t0, t1, ew, tw, aw)
        return sc + mv_cost(px_, py_, y_w, y_h, cfg.vid_w, cfg.vid_h,
                            fpx * 4 + t0, fpy * 4 + t1, quant, 0)

    scores = jnp.where(do_probe, jax.vmap(probe)(t0s, t1s), I32MAX)
    k = jnp.argmin(scores)
    better = scores[k] < best
    bestvx = jnp.where(better, t0s[k], 0)
    bestvy = jnp.where(better, t1s[k], 0)
    best = jnp.minimum(best, scores[k])
    ret = ((best.astype(jnp.uint32) * iarea_ratio.astype(jnp.uint32))
           >> 3).astype(jnp.int32)
    zerofp = best_fp == 0
    return (jnp.where(zerofp, best_fp, ret),
            jnp.where(zerofp, 0, bestvx), jnp.where(zerofp, 0, bestvy))


def _max_subblock_err(pl_a, pl_b, x0, y0, rx, ry, qw, qh, bw2, bh2, psy):
    """One plane of yuv_max_subblock_err (ref: hme.c:369-409).
    qw/qh: static quadrant window dims; bw2/bh2 dynamic. The four quadrants
    are one vmapped metric (4x fewer, 4x wider ops than unrolling)."""
    ew, tw, aw = psy
    fo = jnp.array([0, 1, 0, 1], jnp.int32)
    go = jnp.array([0, 0, 1, 1], jnp.int32)

    def quad(f, g):
        a = window(pl_a, x0 + f * bw2, y0 + g * bh2, qh, qw)
        b = window(pl_b, rx + f * bw2, ry + g * bh2, qh, qw)
        return masked_metr_acc(a, b, bw2, bh2, ew, tw, aw)

    return jax.vmap(quad)(fo, go).max()


def _max_subblock_err_multi(pl_a, pl_b, x0, y0, rxs, rys, qw, qh, bw2, bh2,
                            psy):
    """_max_subblock_err at several reference origins as ONE vmapped op
    (the skip test probes (x0,y0) and the noxmit test the motion-compensated
    origin; both share source and planes)."""
    return jax.vmap(lambda rx, ry: _max_subblock_err(
        pl_a, pl_b, x0, y0, rx, ry, qw, qh, bw2, bh2, psy))(rxs, rys)


def _calc_eprm(src_w, ref_w, bw, bh, avg_src, avg_ref):
    """(ref: hme.c:451-490)."""
    h, w = src_w.shape
    m = ((jnp.arange(w)[None, :] < bw) & (jnp.arange(h)[:, None] < bh))
    s = src_w
    clipr = (m & ((((s - ref_w) + 128) & ~0xFF) != 0)).any()
    clipi = (m & (((s - (avg_ref - 128)) & ~0xFF) != 0)).any()
    clipd = (m & (((s - (avg_src - 128)) & ~0xFF) != 0)).any()
    return clipi, clipd, clipr


def _level0_decide(cfg, r, carry, srcl, refl, ogrl, src_u, src_v,
                   ref_u, ref_v, tmv_x, tmv_y, quant, skip_thresh):
    """Mode decisions at the base level (ref: hme.c:1598-1821). r = result
    dict from _block_search. Returns per-block outputs + stat deltas."""
    i, j = r["i"], r["j"]
    bx, by, bw, bh = r["bx"], r["by"], r["bw"], r["bh"]
    fw, fh = cfg.dims[0]
    y_w, y_h = cfg.blk_w, cfg.blk_h
    yarea = bw * bh
    psy = r["psy"]
    ew, tw, aw = psy
    src_w = r["src_w"]
    fx, fy, fskip = carry["fx"], carry["fy"], carry["fskip"]
    quant_rd = (quant * quant).astype(jnp.uint32)
    skipt = (quant_rd >> 19).astype(jnp.int32)
    good = r["good"]
    fpelx0, fpely0 = r["dx"], r["dy"]
    best = jnp.where((fpelx0 == r["lax"]) & (fpely0 == r["lay"]),
                     r["best"] + r["motion_bias"], r["best"])
    best_fp = best
    px_, py_ = movec_pred(fx, fy, i, j)

    sub_x = jnp.int32(0)
    sub_y = jnp.int32(0)
    fpelx, fpely = fpelx0, fpely0
    if cfg.effort >= 4:
        cond1 = ~invalid_block(bx + r["lax"], by + r["lay"], bw, bh, 4,
                               fw, fh)
        ret1, sx1, sy1 = _subpel(cfg, srcl, refl, bx, by, bw, bh,
                                 r["lax"], r["lay"], best_fp, psy,
                                 px_, py_, quant, fw, fh)
        found1 = cond1 & ((sx1 != 0) | (sy1 != 0))
        best = jnp.where(cond1, ret1, best)
        cond2 = ((~found1) & (~good)
                 & ~invalid_block(bx + fpelx0, by + fpely0, bw, bh, 4,
                                  fw, fh))
        ret2, sx2, sy2 = _subpel(cfg, srcl, refl, bx, by, bw, bh,
                                 fpelx0, fpely0, best_fp, psy,
                                 px_, py_, quant, fw, fh)
        best = jnp.where(cond2, ret2, best)
        sub_x = jnp.where(cond2, sx2, jnp.where(found1, sx1, 0))
        sub_y = jnp.where(cond2, sy2, jnp.where(found1, sy1, 0))
        fpelx = jnp.where(found1, r["lax"], fpelx0)
        fpely = jnp.where(found1, r["lay"], fpely0)
    mvx = fpelx * 4 + sub_x
    mvy = fpely * 4 + sub_y

    # block metrics vs refs (ref: hme.c:1636-1692)
    is_subpel = ((mvx | mvy) & 3) != 0
    ratio = jnp.where(
        is_subpel,
        ((best.astype(jnp.uint32) << 5)
         // jnp.maximum(best_fp, 1).astype(jnp.uint32)).astype(jnp.int32),
        32)
    ogr_w = window(ogrl, bx + fpelx, by + fpely, y_h, y_w)
    ref_w = window(refl, bx + fpelx, by + fpely, y_h, y_w)
    ogrerr = masked_metr(src_w, ogr_w, bw, bh, ew, tw, aw)
    ogrmad = (ogrerr + jnp.maximum(yarea, 1) // 2) // jnp.maximum(yarea, 1)
    ogrmad = ((ogrmad.astype(jnp.uint32) * ratio.astype(jnp.uint32)) >> 5
              ).astype(jnp.int32)
    mad = (best + jnp.maximum(yarea, 1) // 2) // jnp.maximum(yarea, 1)
    var_ref, avg_ref, _, _ = block_feat_detail(ref_w, bw, bh)
    var_src, avg_src = r["var_src"], r["avg_src"]
    dv = jnp.minimum(ratio, 32)
    ipolvar = (var_src * dv + var_ref.astype(jnp.int32) * (32 - dv)) >> 5
    dv = jnp.abs(var_src - ipolvar)
    maintain = (var_src > 16 * yarea) & (var_src < 32 * yarea)

    hs_ = K.fmt_h_shift(cfg.subsamp)
    vs_ = K.fmt_v_shift(cfg.subsamp)
    cbx = i * (y_w >> hs_)
    cby = j * (y_h >> vs_)
    cbmx = cbx + sar(fpelx, hs_)
    cbmy = cby + sar(fpely, vs_)
    cbw = bw >> hs_
    cbh = bh >> vs_
    cw_max, ch_max = y_w >> hs_, y_h >> vs_
    chroma_ratio = ((cbw * cbh) << 4) // jnp.maximum(yarea, 1)

    uavg_src = masked_avg(window(src_u, cbx, cby, ch_max, cw_max), cbw, cbh)
    vavg_src = masked_avg(window(src_v, cbx, cby, ch_max, cw_max), cbw, cbh)
    uavg_ref = masked_avg(window(ref_u, cbmx, cbmy, ch_max, cw_max), cbw, cbh)
    vavg_ref = masked_avg(window(ref_v, cbmx, cbmy, ch_max, cw_max), cbw, cbh)
    greyish = (jnp.abs(uavg_src - 128) < 8) & (jnp.abs(vavg_src - 128) < 8)
    avg_y_dif = jnp.abs(avg_src - avg_ref.astype(jnp.int32))
    avg_c_dif = (jnp.abs(uavg_src - uavg_ref)
                 + jnp.abs(vavg_src - vavg_ref) + 1) >> 1
    eprmi, eprmd, eprmr = _calc_eprm(src_w, ref_w, bw, bh, avg_src,
                                     avg_ref.astype(jnp.int32))
    limx = ((cfg.nbh - 1) * y_w) - 1
    limy = ((cfg.nbv - 1) * y_h) - 1
    oobx = i * y_w + sar(mvx, 2)
    ooby = j * y_h + sar(mvy, 2)
    oob = (oobx < 0) | (ooby < 0) | (oobx >= limx) | (ooby >= limy)
    nd0, nd1 = _neighbordif_self(fx, fy, fskip, i, j, mvx, mvy)
    neidif = (nd0 + nd1) // 3

    # ---- skip test (ref: hme.c:1694-1729) ----
    do_skip = not (cfg.skip_thresh_neg or cfg.lossless)
    do_nox = not cfg.lossless
    if do_skip and do_nox:
        # both tests need max-subblock errors on all 3 planes; batch the
        # two reference origins per plane into one op
        zy = _max_subblock_err_multi(
            srcl, refl, bx, by, jnp.stack([bx, bx + fpelx]),
            jnp.stack([by, by + fpely]), y_w // 2, y_h // 2,
            bw // 2, bh // 2, psy)
        zu = _max_subblock_err_multi(
            src_u, ref_u, cbx, cby, jnp.stack([cbx, cbmx]),
            jnp.stack([cby, cbmy]), cw_max // 2, ch_max // 2,
            cbw // 2, cbh // 2, psy)
        zv = _max_subblock_err_multi(
            src_v, ref_v, cbx, cby, jnp.stack([cbx, cbmx]),
            jnp.stack([cby, cbmy]), cw_max // 2, ch_max // 2,
            cbw // 2, cbh // 2, psy)
    if not do_skip:
        skip = jnp.bool_(False)
    else:
        sth = (skipt * yarea + 4 * var_src
               + yarea * skip_thresh).astype(jnp.uint32)
        sth = jnp.where(quant < (1 << (K.MAX_QP_BITS - 2)),
                        (sth * quant.astype(jnp.uint32))
                        >> (K.MAX_QP_BITS - 2), sth)
        sth = jnp.where(avg_y_dif <= 2,
                        jnp.maximum(sth, (3 * (yarea + var_src))
                                    .astype(jnp.uint32)), sth)
        sth = jnp.maximum(sth, yarea.astype(jnp.uint32))
        sth = jnp.where(good, sth * 2, sth)
        if do_nox:
            z0, z1, z2 = zy[0], zu[0], zv[0]
        else:
            z0 = _max_subblock_err(srcl, refl, bx, by, bx, by,
                                   y_w // 2, y_h // 2, bw // 2, bh // 2, psy)
            z1 = _max_subblock_err(src_u, ref_u, cbx, cby, cbx, cby,
                                   cw_max // 2, ch_max // 2,
                                   cbw // 2, cbh // 2, psy)
            z2 = _max_subblock_err(src_v, ref_v, cbx, cby, cbx, cby,
                                   cw_max // 2, ch_max // 2,
                                   cbw // 2, cbh // 2, psy)
        ratio_u = ratio.astype(jnp.uint32)
        cth = (chroma_ratio.astype(jnp.uint32) * sth
               * jnp.maximum(skipt, 1).astype(jnp.uint32)) >> 5
        z0s = ((z0 * ratio_u) >> 5) + (((avg_src - avg_ref.astype(jnp.int32))
                                        ** 2) * yarea).astype(jnp.uint32)
        z1s = (z1 * ratio_u) >> 5
        z2s = (z2 * ratio_u) >> 5
        cond_try = good | ((mvx == 0) & (mvy == 0))
        skip = cond_try & (z0s <= sth) & (z1s <= cth) & (z2s <= cth)

    # ---- no-residual decisions (ref: hme.c:1731-1777) ----
    noxmity = jnp.bool_(False)
    noxmitc = jnp.bool_(False)
    simcmplx = jnp.bool_(False)
    if not cfg.lossless:
        y_prereq = avg_y_dif <= 2
        c_prereq = (~greyish) & (avg_c_dif <= 2)
        xth = (skipt * yarea).astype(jnp.int32)
        carea = 4 * cbw * cbh
        if do_skip:
            b0, b1, b2 = zy[1], zu[1], zv[1]
        else:
            b0 = _max_subblock_err(srcl, refl, bx, by, bx + fpelx,
                                   by + fpely, y_w // 2, y_h // 2,
                                   bw // 2, bh // 2, psy)
            b1 = _max_subblock_err(src_u, ref_u, cbx, cby, cbmx, cbmy,
                                   cw_max // 2, ch_max // 2,
                                   cbw // 2, cbh // 2, psy)
            b2 = _max_subblock_err(src_v, ref_v, cbx, cby, cbmx, cbmy,
                                   cw_max // 2, ch_max // 2,
                                   cbw // 2, cbh // 2, psy)
        xth = (xth.astype(jnp.uint32) + ipolvar.astype(jnp.uint32)
               ).astype(jnp.int32)
        xth = jnp.maximum(xth - yarea * neidif * 2, 0)
        xth = ((xth.astype(jnp.uint32) * quant.astype(jnp.uint32))
               >> K.MAX_QP_BITS).astype(jnp.int32)
        xth = jnp.clip(xth, 32, yarea * 4)
        ratio_u = ratio.astype(jnp.uint32)
        b0s = (b0 * ratio_u) >> 5
        b1s = (b1 * ratio_u) >> 5
        b2s = (b2 * ratio_u) >> 5
        _, _, _, utex = block_feat_detail(
            window(src_u, cbx, cby, ch_max, cw_max), cbw, cbh)
        _, _, _, vtex = block_feat_detail(
            window(src_v, cbx, cby, ch_max, cw_max), cbw, cbh)
        c_prereq = c_prereq & ((utex > carea) | (vtex > carea))
        xthc = (chroma_ratio * xth) >> 4
        pre = (~oob) & (y_prereq | c_prereq)
        noxmity = pre & y_prereq & (b0s < (4 * xth).astype(jnp.uint32))
        noxmitc = (pre & c_prereq & (b1s < xthc.astype(jnp.uint32))
                   & (b2s < xthc.astype(jnp.uint32)))
        simcmplx = (~oob) & (dv < var_src // 4)
    return dict(mvx=mvx, mvy=mvy, fpelx=fpelx, fpely=fpely, best=best,
                best_fp=best_fp, ratio=ratio,
                skip=skip, noxmity=noxmity, noxmitc=noxmitc,
                simcmplx=simcmplx, maintain=maintain, mad=mad, ogrmad=ogrmad,
                ipolvar=ipolvar, avg_src=avg_src, avg_ref=avg_ref,
                avg_c_dif=avg_c_dif, eprmi=eprmi, eprmd=eprmd, eprmr=eprmr,
                neidif=neidif, cb=(cbx, cby, cbmx, cbmy, cbw, cbh))


def _neighbordif_self(fx, fy, fskip, i, j, cmx, cmy):
    """neighbordif2 with the current block's (not yet scattered) vector."""
    def nb(x, y, ok):
        yy = jnp.clip(y, 0, fx.shape[0] - 1)
        xx = jnp.clip(x, 0, fx.shape[1] - 1)
        vx, vy = fx[yy, xx], fy[yy, xx]
        use = ok & ((vx != 0) | (vy != 0)) & (fskip[yy, xx] == 0)
        return jnp.where(use, vx, cmx), jnp.where(use, vy, cmy)

    vx0, vy0 = nb(i - 1, j, i > 0)
    vx1, vy1 = nb(i, j - 1, j > 0)
    d0 = jnp.abs(vx0 - cmx) + jnp.abs(vy0 - cmy)
    d1 = jnp.abs(vx1 - cmx) + jnp.abs(vy1 - cmy)
    small = (jnp.abs(cmx) < 2) & (jnp.abs(cmy) < 2)
    return jnp.where(small, 0, d0), jnp.where(small, 0, d1)


def _test_intra_y(cfg, d0, srcl, refl, bx, by, fpelx, fpely, bw, bh,
                  refmv_x, refmv_y, psyscale):
    """(ref: hme.c:891-985). Returns (submask, dc, intra)."""
    mvx, mvy = d0["mvx"], d0["mvy"]
    neidif = d0["neidif"]
    ratio = d0["ratio"]
    detail0 = d0["ipolvar"]
    avg_src = d0["avg_src"]
    y_w, y_h = cfg.blk_w, cfg.blk_h
    sbw = bw // 2
    sbh = bh // 2
    skip_all = (((mvx != 0) | (mvy != 0)) & (neidif < 3)
                & (jnp.abs(refmv_x - mvx) < 3) & (jnp.abs(refmv_y - mvy) < 3))
    skip_all = skip_all | (sbw == 0) | (sbh == 0)
    detail_src = detail0 + detail0 // jnp.maximum(neidif, 1)
    submask = jnp.int32(0)
    avg_tot = jnp.int32(0)
    err_sub = jnp.uint32(0)
    err_src = jnp.uint32(0)
    nsub = jnp.int32(0)
    qw, qh = y_w // 2, y_h // 2
    ratio_u = ratio.astype(jnp.uint32)
    bits = jnp.array([K.MASK_INTRA00, K.MASK_INTRA01,
                      K.MASK_INTRA10, K.MASK_INTRA11], jnp.int32)
    fo = jnp.array([0, 1, 0, 1], jnp.int32)
    go = jnp.array([0, 0, 1, 1], jnp.int32)

    # detail_src decays when a sub-block is taken, so the 4 sub-blocks are
    # a 4-step scan (one graph instance), not an unroll
    def sub(carry, xs):
        submask, avg_tot, err_sub, err_src, nsub, detail_src = carry
        f, g, bit = xs
        src_d = window(srcl, bx + f * sbw, by + g * sbh, qh, qw)
        mvr_d = window(refl, bx + fpelx + f * sbw, by + fpely + g * sbh,
                       qh, qw)
        rdet, avg_sub, _, _ = block_feat_detail(mvr_d, sbw, sbh)
        local_detail, avg_local, _, _ = block_feat_detail(src_d, sbw, sbh)
        local_detail = local_detail.astype(jnp.int32)
        dcd = jnp.abs(avg_local - avg_sub).astype(jnp.int32) + 2
        too_detailed = local_detail.astype(jnp.uint32) > (
            (dcd * dcd * bw * bh).astype(jnp.uint32) * ratio_u) >> 5
        dc = (avg_local + avg_src * 3 + 2) >> 2
        sub_err, src_err, inter_err = err_intra(
            src_d, mvr_d, sbw, sbh, avg_sub.astype(jnp.int32),
            dc.astype(jnp.int32), ratio)
        lo = (detail_src + local_detail + 1) >> 1
        hi = detail_src
        lerp = (lo * (32 - psyscale) + hi * psyscale) >> 5
        ld2 = jnp.maximum(lerp, lo).astype(jnp.uint32)
        sub_better = (sub_err + ld2) < inter_err
        src_better = (src_err + ld2) < inter_err
        take = ((~skip_all) & (~too_detailed)
                & (sub_better | src_better))
        submask = submask | jnp.where(take, bit, 0)
        err_src = err_src + jnp.where(take, src_err, 0)
        err_sub = err_sub + jnp.where(take, sub_err, 0)
        avg_tot = avg_tot + jnp.where(
            take, jnp.where(sub_err < src_err, avg_sub.astype(jnp.int32),
                            dc.astype(jnp.int32)), 0)
        nsub = nsub + jnp.where(take, 1, 0)
        detail_src = jnp.where(take, detail_src * 4 // 5, detail_src)
        return (submask, avg_tot, err_sub, err_src, nsub, detail_src), None

    (submask, avg_tot, err_sub, err_src, nsub, detail_src), _ = \
        jax.lax.scan(sub, (submask, avg_tot, err_sub, err_src, nsub,
                           detail_src + jnp.int32(0)), (fo, go, bits))
    intra = submask != 0
    dc_out = jnp.where(
        intra & (err_src < err_sub),
        (avg_tot // jnp.maximum(nsub, 1)) | K.SRC_DC_PRED, 0)
    return submask, dc_out, intra


def _test_intra_c(cfg, d0, src_u, src_v, ref_u, ref_v, submask, intra):
    """(ref: hme.c:987-1048)."""
    if cfg.effort < 6:
        return submask, intra
    mvx, mvy = d0["mvx"], d0["mvy"]
    cbx, cby, cbmx, cbmy, cbw, cbh = d0["cb"]
    mad = d0["mad"]
    detail_src = d0["ipolvar"] // jnp.maximum(d0["bwbh"], 1)
    avg_src = d0["avg_src"]
    sbw = cbw // 2
    sbh = cbh // 2
    hs_ = K.fmt_h_shift(cfg.subsamp)
    vs_ = K.fmt_v_shift(cfg.subsamp)
    qw = (cfg.blk_w >> hs_) // 2
    qh = (cfg.blk_h >> vs_) // 2
    thr = jnp.where(intra, detail_src, detail_src * detail_src)
    small_mv = (jnp.abs(mvx) < 4) & (jnp.abs(mvy) < 4)
    blocked = ((sbw == 0) | (sbh == 0)
               | (mad.astype(jnp.uint32) <= thr.astype(jnp.uint32))
               | (thr.astype(jnp.uint32) > 64) | small_mv)
    avg_ramp = (avg_src * avg_src) >> 8
    bits = jnp.array([K.MASK_INTRA00, K.MASK_INTRA01,
                      K.MASK_INTRA10, K.MASK_INTRA11], jnp.int32)
    fo = jnp.array([0, 1, 0, 1], jnp.int32)
    go = jnp.array([0, 0, 1, 1], jnp.int32)

    # each sub-block only reads the INITIAL submask bit -> independent,
    # one vmapped instance
    def sub(f, g, bit):
        already = (submask & bit) != 0
        us = masked_avg(window(src_u, cbx + f * sbw, cby + g * sbh,
                               qh, qw), sbw, sbh)
        vs_a = masked_avg(window(src_v, cbx + f * sbw, cby + g * sbh,
                                 qh, qw), sbw, sbh)
        ur = masked_avg(window(ref_u, cbmx + f * sbw, cbmy + g * sbh,
                               qh, qw), sbw, sbh)
        vr = masked_avg(window(ref_v, cbmx + f * sbw, cbmy + g * sbh,
                               qh, qw), sbw, sbh)
        dif = (((us - ur) ** 2 + (vs_a - vr) ** 2) * avg_ramp) >> 8
        take = ((~blocked) & (~already)
                & (dif.astype(jnp.uint32) > thr.astype(jnp.uint32)))
        return jnp.where(take, bit, 0)

    submask = submask | jax.vmap(sub)(fo, go, bits).sum()
    return submask, submask != 0


def refine_level0_graph(cfg, srcs, refs, ogrl, parent_x, parent_y,
                        tmv_x, tmv_y, gx, gy, quant, skip_thresh):
    """Base level: search + subpel + mode decisions (ref: hme.c:1372-1833).
    srcs/refs = (luma, u, v) bordered planes. Returns the final field
    arrays + frame statistics."""
    level = 0
    srcl, src_u, src_v = srcs
    refl, ref_u, ref_v = refs
    step, ca, cb, lmax, nd = _lane_grid(cfg, level)
    z32 = jnp.zeros((cfg.nbv, cfg.nbh), jnp.int32)
    state = dict(fx=z32, fy=z32, fskip=z32.astype(jnp.uint8),
                 flags=z32, err=z32, dc=z32, submask=z32,
                 terr=jnp.int32(0), ndiff=jnp.int32(0),
                 nelig=jnp.int32(0), nintra=jnp.int32(0))

    def diag(d, st):
        carry = dict(fx=st["fx"], fy=st["fy"], fskip=st["fskip"])
        a0 = jnp.maximum(0, d - (cb - 1))
        a = a0 + jnp.arange(lmax)
        b = d - a
        lane_ok = (a < ca) & (b >= 0) & (b < cb)
        i = a * step
        j = b * step

        def one(i_, j_, ok_):
            r = _block_search(cfg, level, carry, parent_x, parent_y,
                              srcl, refl, ogrl, tmv_x, tmv_y, gx, gy,
                              quant, i_, j_, ok_)
            d0 = _level0_decide(cfg, r, carry, srcl, refl, ogrl,
                                src_u, src_v, ref_u, ref_v, tmv_x, tmv_y,
                                quant, skip_thresh)
            d0["bwbh"] = r["bw"] * r["bh"]
            # intra tests (ref: hme.c:1779-1788)
            if cfg.has_tmv:
                rmx = tmv_x[jnp.clip(j_, 0, cfg.nbv - 1),
                            jnp.clip(i_, 0, cfg.nbh - 1)]
                rmy = tmv_y[jnp.clip(j_, 0, cfg.nbv - 1),
                            jnp.clip(i_, 0, cfg.nbh - 1)]
            else:
                rmx, rmy = d0["mvx"], d0["mvy"]
            fpelx = d0["fpelx"]
            fpely = d0["fpely"]
            submask, dc, intra = _test_intra_y(
                cfg, d0, srcl, refl, r["bx"], r["by"],
                fpelx, fpely, r["bw"], r["bh"], rmx, rmy, cfg.psyf_all)
            submask, intra = _test_intra_c(
                cfg, d0, src_u, src_v, ref_u, ref_v, submask, intra)
            # EPRM merge (ref: hme.c:1801-1820)
            eprmi, eprmd, eprmr = d0["eprmi"], d0["eprmd"], d0["eprmr"]
            m_intra = jnp.where((dc & K.SRC_DC_PRED) != 0, eprmd, eprmi)
            m_intra = m_intra | ((submask != K.MASK_ALL_INTRA) & eprmr)
            m_inter = eprmr | ((submask != 0) & eprmi)
            eprm = jnp.where(intra, m_intra, m_inter)
            mvx = jnp.where(intra, fpelx * 4, d0["mvx"])
            mvy = jnp.where(intra, fpely * 4, d0["mvy"])
            simc = d0["simcmplx"] & ~(intra | eprm)
            skip = d0["skip"]
            # skip overrides everything (ref: hme.c:1722-1728)
            mvx = jnp.where(skip, 0, mvx)
            mvy = jnp.where(skip, 0, mvy)
            intra = intra & ~skip
            eprm = eprm & ~skip
            simc = simc & ~skip
            noxy = d0["noxmity"] & ~skip
            noxc = d0["noxmitc"] & ~skip
            maint = d0["maintain"]  # set before the skip test, kept
            err = jnp.where(skip | noxy, 0, d0["mad"]) & 0xFFFF
            flags = (intra.astype(jnp.int32) << K.MV_BIT_INTRA
                     | eprm.astype(jnp.int32) << K.MV_BIT_EPRM
                     | maint.astype(jnp.int32) << K.MV_BIT_MAINTAIN
                     | skip.astype(jnp.int32) << K.MV_BIT_SKIP
                     | noxy.astype(jnp.int32) << K.MV_BIT_NOXMITY
                     | noxc.astype(jnp.int32) << K.MV_BIT_NOXMITC
                     | simc.astype(jnp.int32) << K.MV_BIT_SIMCMPLX)
            # stats (ref: hme.c:1789-1799, 1825-1831)
            v = r["valid"]
            terr = jnp.where(v & ~skip & ~noxy, d0["mad"], 0)
            ndiff = jnp.where(
                v & ~skip, (d0["ogrmad"] > 11).astype(jnp.int32)
                + (d0["avg_c_dif"] >= 32).astype(jnp.int32), 0)
            nelig = jnp.where(v & (d0["best"] > 0), 1, 0)
            nintra = jnp.where(v & intra, 1, 0)
            return (mvx, mvy, flags, err, dc, submask,
                    skip.astype(jnp.uint8), v, terr, ndiff, nelig, nintra)

        (ox, oy, ofl, oerr, odc, osm, oskip, ov, terr, ndiff, nelig,
         nintra) = jax.vmap(one)(i, j, lane_ok)
        jv = jnp.where(ov, j, cfg.nbv)
        st = dict(st)
        st["fx"] = st["fx"].at[jv, i].set(ox, mode="drop")
        st["fy"] = st["fy"].at[jv, i].set(oy, mode="drop")
        st["flags"] = st["flags"].at[jv, i].set(ofl, mode="drop")
        st["err"] = st["err"].at[jv, i].set(oerr, mode="drop")
        st["dc"] = st["dc"].at[jv, i].set(odc, mode="drop")
        st["submask"] = st["submask"].at[jv, i].set(osm, mode="drop")
        st["fskip"] = st["fskip"].at[jv, i].set(oskip, mode="drop")
        st["terr"] = st["terr"] + terr.sum()
        st["ndiff"] = st["ndiff"] + ndiff.sum()
        st["nelig"] = st["nelig"] + nelig.sum()
        st["nintra"] = st["nintra"] + nintra.sum()
        return st

    st = jax.lax.fori_loop(0, nd, diag, state)
    return st


@functools.lru_cache(maxsize=None)
def make_motion_est(cfg: "WaveCfg"):
    """The full pyramid search as one jitted program (ref: hme.c:2001-2016).
    Inputs: per-level (src, ref, ogr) luma planes, level-0 chroma planes,
    previous-frame field, quant, skip threshold."""
    pl = cfg.pyramid_levels

    def f(src_planes, ref_planes, ogr_planes, src_u, src_v, ref_u, ref_v,
          tmv_x, tmv_y, quant, skip_thresh):
        gx = jnp.int32(0)
        gy = jnp.int32(0)
        parent_x = jnp.zeros((cfg.nbv, cfg.nbh), jnp.int32)
        parent_y = jnp.zeros((cfg.nbv, cfg.nbh), jnp.int32)
        for level in range(pl, 0, -1):
            fx, fy = refine_level_graph(
                cfg, level, src_planes[level], ref_planes[level],
                ogr_planes[level], parent_x, parent_y, tmv_x, tmv_y,
                gx, gy, quant)
            gx, gy = global_motion_graph(cfg, level, fx, fy)
            parent_x, parent_y = fx, fy
        st = refine_level0_graph(
            cfg, (src_planes[0], src_u, src_v),
            (ref_planes[0], ref_u, ref_v), ogr_planes[0],
            parent_x, parent_y, tmv_x, tmv_y, gx, gy, quant, skip_thresh)
        return st

    return jax.jit(f)


def prepare_motion_est(enc, d):
    """Build (cfg, inputs) for the whole-pyramid search program. Split out
    so a lockstep batcher can stack inputs from many streams and run one
    vmapped dispatch (same cfg across streams). With the device-resident
    reference chain active (d.dev / refdata.dev populated), every plane
    input is a device handle — the dispatch uploads nothing but MV grids."""
    from ..core import intmath as im
    ref = d.refdata
    p = d.params
    has_tmv = ref.final_mvs is not None
    dev = d.dev if (d.dev and ref.dev and "recon" in ref.dev) else None
    if dev is not None:
        w0, h0 = p.meta.width, p.meta.height
        dims = [(w0, h0)] + [
            (im.round_shift(w0, i + 1), im.round_shift(h0, i + 1))
            for i in range(enc.pyramid_levels)]
        srcp = [dev["padded"][0]] + list(dev["pyr"])
        refp = [ref.dev["recon"][0]] + list(ref.dev["rpyr"])
        ogrp = [ref.dev["padded"][0]] + list(ref.dev["pyr"])
        src_u, src_v = dev["padded"][1], dev["padded"][2]
        ref_u, ref_v = ref.dev["recon"][1], ref.dev["recon"][2]
        cfg = WaveCfg(p.nbh, p.nbv, p.blk_w, p.blk_h,
                      p.meta.width, p.meta.height, p.meta.subsamp,
                      p.effort, p.lossless, enc.pyramid_levels, has_tmv,
                      enc.skip_block_thresh < 0, tuple(dims))
    else:
        recon_pyr = enc._mk_pyramid(ref.residual)
        src = [d.padded] + list(d.pyramid)
        refs = [ref.residual] + recon_pyr
        ogrs = [ref.padded] + list(ref.pyramid)
        srcp = [f.planes[0] for f in src]
        refp = [f.planes[0] for f in refs]
        ogrp = [f.planes[0] for f in ogrs]
        src_u, src_v = src[0].planes[1], src[0].planes[2]
        ref_u, ref_v = refs[0].planes[1], refs[0].planes[2]
        cfg = WaveCfg(p.nbh, p.nbv, p.blk_w, p.blk_h,
                      p.meta.width, p.meta.height, p.meta.subsamp,
                      p.effort, p.lossless, enc.pyramid_levels, has_tmv,
                      enc.skip_block_thresh < 0,
                      tuple((f.width, f.height) for f in src))
    if has_tmv:
        tmvx = ref.final_mvs.grid(ref.final_mvs.x).astype(np.int32)
        tmvy = ref.final_mvs.grid(ref.final_mvs.y).astype(np.int32)
    else:
        tmvx = np.zeros((p.nbv, p.nbh), np.int32)
        tmvy = tmvx
    inputs = (tuple(srcp), tuple(refp), tuple(ogrp),
              src_u, src_v, ref_u, ref_v,
              tmvx, tmvy, np.int32(enc.prev_quant),
              np.int32(enc.skip_block_thresh))
    return cfg, inputs


def apply_motion_est(enc, d, st):
    """Unpack the search program's output dict into the encoder state."""
    from ..codec.motion import MotionField

    p = d.params
    st = {k: np.asarray(v) for k, v in st.items()}
    mf = MotionField(p.nbh, p.nbv)
    mf.x = st["fx"].reshape(-1).astype(np.int16)
    mf.y = st["fy"].reshape(-1).astype(np.int16)
    mf.flags = st["flags"].reshape(-1).astype(np.uint32)
    mf.err = st["err"].reshape(-1).astype(np.uint16)
    mf.dc = st["dc"].reshape(-1).astype(np.uint16)
    mf.submask = st["submask"].reshape(-1).astype(np.uint8)
    d.final_mvs = mf
    nblk = p.nbh * p.nbv
    nelig = max(int(st["nelig"]), 1)
    enc.curr_scblocks = int(st["ndiff"]) * 100 // nelig
    enc.avg_err = int(st["terr"]) // nblk
    enc.curr_intra_pct = int(st["nintra"]) * 100 // nblk


def motion_est(enc, d):
    """Drop-in replacement for ops.hme_search.motion_est running the whole
    pyramid search as a single device dispatch."""
    cfg, inputs = prepare_motion_est(enc, d)
    submit = getattr(enc, "dev_submit", None)
    if submit is not None:
        st = submit(("hme", cfg), make_motion_est, inputs)
    else:
        st = make_motion_est(cfg)(*inputs)
    apply_motion_est(enc, d, st)
