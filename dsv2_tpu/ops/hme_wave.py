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
