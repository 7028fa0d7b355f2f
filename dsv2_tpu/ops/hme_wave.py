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
import contextlib
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

# ---------------------------------------------------------------------------
# backend hooks: the per-block compute below is shared between the XLA
# wavefront program (this module) and the Pallas kernels (ops/hme_pallas).
# During Pallas kernel tracing the hooks swap plane-window extraction to
# VMEM roll-reads and enable lax.cond short-circuits (on XLA the same
# guards are plain masked selects, value-identical).
# ---------------------------------------------------------------------------
_READER = None     # (plane, x, y, h, w) -> int32 (h, w) window
_ROLL = None       # (arr, shift, axis) -> arr (jnp.roll semantics)
_LAZY = False      # True -> guard() uses lax.cond (skip work per block)


@contextlib.contextmanager
def backend_hooks(reader, roll_fn, lazy):
    global _READER, _ROLL, _LAZY
    prev = (_READER, _ROLL, _LAZY)
    _READER, _ROLL, _LAZY = reader, roll_fn, lazy
    try:
        yield
    finally:
        _READER, _ROLL, _LAZY = prev


def roll(a, shift, axis):
    if _ROLL is not None:
        return _ROLL(a, shift, axis)
    return jnp.roll(a, shift, axis)


def guard(pred, fn, default):
    """where(pred, fn(), default) — with lax.cond under Pallas so the
    untaken branch costs nothing. fn() and default are value-identical
    trees when pred is False-masked, so both forms are byte-equal."""
    if _LAZY:
        return jax.lax.cond(pred, fn, lambda: default)
    got = fn()
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(pred, a, b), got, default)


def usum(x):
    """Sum of a uint32 array as uint32 (Mosaic has no unsigned reductions;
    same-width int casts are modular reinterprets, so the int32 view of the
    wrapping sum is bit-exact)."""
    return x.astype(jnp.uint32).astype(jnp.int32).sum().astype(jnp.uint32)


def umax(x):
    """Max of a uint32 array as uint32 (sign-flip order embedding)."""
    fl = x.astype(jnp.uint32).astype(jnp.int32) ^ jnp.int32(-2147483648)
    return (fl.max() ^ jnp.int32(-2147483648)).astype(jnp.uint32)


def udiv(a, b):
    """uint32 a // b for 1 <= b < 2**31, via signed div (Mosaic-safe):
    q1 = 2*((a>>1)//b) is floor(a/b) or one less; fix up by remainder."""
    au = a.astype(jnp.uint32)
    bu = b.astype(jnp.uint32)
    half = (au >> jnp.uint32(1)).astype(jnp.int32)
    q1 = ((half // b.astype(jnp.int32)) << 1).astype(jnp.uint32)
    r = au - q1 * bu
    return q1 + (r >= bu).astype(jnp.uint32)


def iota2(n, m, dim):
    return jax.lax.broadcasted_iota(jnp.int32, (n, m), dim)


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
    if _READER is not None:
        return _READER(plane, x, y, h, w)
    return jax.lax.dynamic_slice(
        plane, (B + y, B + x), (h, w)).astype(jnp.int32)


def masked_sse(a, b, bw, bh):
    """(ref: hme.c:198-242); a/b static windows, bw/bh dynamic."""
    h, w = a.shape
    ii = iota2(h, w, 1)
    jj = iota2(h, w, 0)
    m = (ii < bw) & (jj < bh)
    d = jnp.where(m, a - b, 0)
    acc = usum(d * d).astype(jnp.int32)
    return jnp.where((bw == 0) | (bh == 0), I32MAX, acc)


def _uavg4(a, b, c, d):
    return (a + b + c + d + 2) >> 2


# The reference's 2x2-quadrant metric decompositions (a1=X[0::2,0::2],
# a2=X[0::2,1::2], a3=X[1::2,0::2], a4=X[1::2,1::2]) are computed here in
# PIXEL space: each per-quad value lands on its cell's even-even "rep"
# pixel via unit rolls, and the quad-grid reduction masks to those reps.
# Bit-identical to the strided-slice form (rep (2r,2c) never reads a
# wrapped element for even-sized windows) and Mosaic-friendly (the MLIR
# verifier rejects non-unit strided slices).

def _uavg4_lat(x, s):
    """uavg4(a1,a2,a3,a4) at reps (2sr, 2sc); cell neighbors at stride s."""
    xr = x + roll(x, -s, 1)
    return ((xr + roll(xr, -s, 0)) + 2) >> 2


def _tex_lat(x, s):
    """uavg4(|a1-a2|, |a2-a3|, |a3-a4|, |a4-a1|) at reps (2sr, 2sc)."""
    r1 = roll(x, -s, 1)
    r0 = roll(x, -s, 0)
    r01 = roll(r0, -s, 1)
    return (jnp.abs(x - r1) + jnp.abs(r1 - r0) + jnp.abs(r0 - r01)
            + jnp.abs(r01 - x) + 2) >> 2


def _lat_mask(h, w, bw, bh, s=1):
    """Rep positions (2sr, 2sc) of quads (r, c) with r < bh//2, c < bw//2."""
    yy = iota2(h, w, 0)
    xx = iota2(h, w, 1)
    return ((yy % (2 * s) == 0) & (xx % (2 * s) == 0)
            & (yy < s * ((bh // 2) * 2)) & (xx < s * ((bw // 2) * 2)))


def masked_metr_acc(a, b, bw, bh, ew, tw, aw):
    """(ref: hme.c:126-196). ew/tw/aw dynamic scalars."""
    h, w = a.shape
    qm = _lat_mask(h, w, bw, bh)
    se = _uavg4_lat(jnp.abs(a - b), 1)
    ta = _tex_lat(a, 1)
    tb = _tex_lat(b, 1)
    s0 = _uavg4_lat(a, 1)
    s1 = _uavg4_lat(b, 1)
    t = (((se * se) << ew) + (((ta - tb) ** 2) << tw)
         + (((s0 - s1) ** 2) << aw))
    return usum(jnp.where(qm, t, 0))


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
    ii = iota2(h, w, 1)
    jj = iota2(h, w, 0)
    m = (ii < bw) & (jj < bh)
    area = bw * bh
    s = jnp.where(m, a, 0).astype(jnp.int32).sum()
    # masks built as fresh shifted iotas, not iota slices: Mosaic's layout
    # pass aborts on extract_strided_slice of a replicated (broadcast-iota)
    # vector, so ii[:, 1:] etc. cannot appear inside the Pallas kernel
    dh = jnp.abs(a[:, 1:] - a[:, :-1])
    mh = ((iota2(h, w - 1, 1) + 1 < bw) & (iota2(h, w - 1, 0) < bh))
    sh = jnp.where(mh, dh, 0).astype(jnp.int32).sum()
    dv = jnp.abs(a[1:, :] - a[:-1, :])
    mv_ = ((iota2(h - 1, w, 1) < bw) & (iota2(h - 1, w, 0) + 1 < bh))
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
    # shifted-iota masks (see block_feat_detail: no iota slices in-kernel)
    dh = q[:, :-1] - q[:, 1:]
    mh = ((iota2(h, w - 1, 1) + 1 < bw) & (iota2(h, w - 1, 0) < bh))
    sh = usum(jnp.where(mh, dh * dh, 0))
    dv = q[1:, :] - q[:-1, :]
    mv_ = ((iota2(h - 1, w, 1) < bw) & (iota2(h - 1, w, 0) + 1 < bh))
    sv = usum(jnp.where(mv_, dv * dv, 0))
    return isqrt_u32(jnp.maximum(sh, sv)) // ((bw + bh + 1) >> 1)


def _hist16(idx, m):
    """(1, 16) int32 histogram of idx values in 0..15 over mask m."""
    return jnp.concatenate(
        [((idx == b) & m).sum().astype(jnp.int32).reshape(1, 1)
         for b in range(16)], axis=1)


def block_feat_hvar(a, bw, bh, avg):
    """(ref: hme.c:711-749)."""
    h, w = a.shape
    m = (iota2(h, w, 1) < bw) & (iota2(h, w, 0) < bh)
    area = jnp.maximum(bw * bh, 1)
    havg = jnp.maximum(avg, 1)
    q16 = ((8 << 16) // havg).astype(jnp.int32)
    hi = jnp.clip((a.astype(jnp.int32) * q16) >> 16, 0, 15)
    hist = _hist16(hi, m)
    hm = hist.sum() // 16
    hv = usum((hist - hm) ** 2)
    return udiv(hv * jnp.uint32(256),
                (16 * area * area).astype(jnp.uint32)).astype(jnp.int32)


def block_feat_peaks(a, bw, bh, avg):
    """(ref: hme.c:624-692)."""
    havg = jnp.maximum(avg, 1)
    q16 = ((8 << 16) // havg).astype(jnp.int32)
    h, w = a.shape
    ds = _uavg4_lat(a, 1).astype(jnp.int32)
    qm = _lat_mask(h, w, bw, bh)
    hi = jnp.minimum((ds * q16) >> 16, 15)
    hist = _hist16(hi, qm)
    pavg = hist.sum() // 16
    maxv = hist.max() >> 2
    neg1 = jnp.full((1, 1), -1, jnp.int32)
    left = jnp.concatenate([neg1, hist[:, :-1]], axis=1)
    right = jnp.concatenate([hist[:, 1:], neg1], axis=1)
    pk = (hist > left) & (hist > right) & ((hist > maxv) | (hist > pavg))
    return pk.sum()


def masked_avg(a, bw, bh):
    h, w = a.shape
    m = (iota2(h, w, 1) < bw) & (iota2(h, w, 0) < bh)
    s = jnp.where(m, a, 0).astype(jnp.int32).sum()
    return s // jnp.maximum(bw * bh, 1)


# ---------------------------------------------------------------------------
# subpel probe grid (ref: hme.c:787-837) on a static 21x21 window
# ---------------------------------------------------------------------------

SPD = 17
HPD = 34
QPD = 68


def _ilv_rows(a, b):
    """Row interleave [a0; b0; a1; b1; ...]: a sublane-merging reshape,
    which Mosaic lowers (lane-dim reshapes and jnp.repeat along lanes it
    does not)."""
    h, w = a.shape
    return jnp.stack([a, b], axis=1).reshape(2 * h, w)


def _rep_rows(a, k):
    """jnp.repeat(a, k, axis=0) via broadcast + sublane-merging reshape."""
    h, w = a.shape
    return jnp.broadcast_to(a[:, None, :], (h, k, w)).reshape(k * h, w)


def _interleave(a, b, axis):
    """[a0, b0, a1, b1, ...] along axis; a/b same shape. Lane interleave
    rides the transpose trick (Mosaic supports transpose + sublane
    reshapes; it rejects lane-dim reshapes/strided scatter)."""
    if axis == 0:
        return _ilv_rows(a, b)
    return _ilv_rows(a.T, b.T).T


def qpel_grid(refwin):
    """refwin: (21, 21) int32; (1, 1) is the probe origin."""
    r = refwin
    hbuf = 5 * (r[:, 1:SPD + 1] + r[:, 2:SPD + 2]) - (r[:, 0:SPD]
                                                      + r[:, 3:SPD + 3])
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
    # interleaved half-pel grid core (34, 34), zero-padded to (35, 35)
    core = _interleave(_interleave(fr, hh, 1), _interleave(vv, dg, 1), 0)
    z_row = jnp.zeros((1, HPD), jnp.int32)
    z_col = jnp.zeros((HPD + 1, 1), jnp.int32)
    hg = jnp.concatenate(
        [jnp.concatenate([core, z_row], axis=0), z_col], axis=1)
    h0 = hg[:HPD, :HPD]
    hx = hg[:HPD, 1:HPD + 1]
    hy = hg[1:HPD + 1, :HPD]
    hxy = hg[1:HPD + 1, 1:HPD + 1]
    q = _interleave(
        _interleave(h0, (h0 + hx + 1) >> 1, 1),
        _interleave((h0 + hy + 1) >> 1, _uavg4(h0, hx, hy, hxy), 1), 0)
    return q


def qpsad_pre(srcsp, q):
    """Probe-invariant halves of qpsad, hoisted out of the 7-probe loop:
    the padded quarter-pel canvas and every src-side lattice term."""
    qp_ = jnp.pad(q, ((0, 72 - QPD), (0, 128 - QPD)))
    src_l = _rep_rows(_rep_rows(srcsp, 4).T, 4).T
    return qp_, src_l, _tex_lat(src_l, 4), _uavg4_lat(src_l, 4)


def qpsad(pre, t0, t1, ew, tw, aw):
    """(ref: hme.c:244-269). pre = qpsad_pre(srcsp, q); t0/t1 dynamic in
    [-3,3]. The probe compares srcsp with q[4+t1::4, 4+t0::4]; both live
    here on a stride-4 lattice of a (64,64) canvas so the quad math stays
    unit-roll. The canvas is pre-padded to tile-aligned dims before the
    dynamic rolls (Mosaic lowers dynamic rotates only on x8/x128
    extents); every wrapped position is outside the lattice mask in both
    backends, so values are unchanged. Kept as the oracle for
    qpel_phases/qpsad_ph (tests/test_hme_wave parity); the live subpel
    path uses the phase-plane form below."""
    qp_, src_l, ta, s0 = pre
    qs = roll(roll(qp_, 72 - (4 + t1), 0), 128 - (4 + t0), 1)
    sub_l = qs[:64, :64]
    se = _uavg4_lat(jnp.abs(src_l - sub_l), 4)
    tb = _tex_lat(sub_l, 4)
    s1 = _uavg4_lat(sub_l, 4)
    t = (((se * se) << ew) + (((ta - tb) ** 2) << tw)
         + (((s0 - s1) ** 2) << aw))
    acc = usum(jnp.where(_lat_mask(64, 64, 16, 16, 4), t, 0))
    return metric_return(acc, 16, 16)


def qpel_phases(refwin):
    """The 16 quarter-pel PHASE PLANES of qpel_grid's (68, 68) canvas:
    plane[p1][p0][u, v] == q[4u + p1, 4v + p0] (u, v in 0..16), built
    directly from the four half-pel fields with static shifts — no
    interleaves, no 64-wide lattice canvas, no dynamic rolls. A probe
    samples the canvas at stride 4, so it only ever touches one phase
    plane; qpsad_ph below evaluates the identical metric on (16, 16)
    arrays (ref: hme.c:787-837 + 244-269)."""
    r = refwin
    hbuf = 5 * (r[:, 1:SPD + 1] + r[:, 2:SPD + 2]) - (r[:, 0:SPD]
                                                      + r[:, 3:SPD + 3])
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
    # F[e1][e0][i, j] == core[2i + e1, 2j + e0]; the canvas' zero
    # row/col 34 (hme_wave.qpel_grid hg) appears as a zero-filled shift
    # below instead of a (18, 18) pad — Mosaic's concatenate lowering
    # rejects the pad's (17,17)+(1,17) form ("result/input offset
    # mismatch on non-concat dimension"), while static rolls + masks
    # lower everywhere.
    F = ((fr, hh), (vv, dg))
    _rio = jax.lax.broadcasted_iota(jnp.int32, (SPD, SPD), 0)
    _cio = jax.lax.broadcasted_iota(jnp.int32, (SPD, SPD), 1)

    def C(s1, s0):
        """core[2u + s1, 2v + s0] as a (17, 17) plane; s in 0..2."""
        f = F[s1 & 1][s0 & 1]
        if s1 >> 1:
            f = jnp.where(_rio < SPD - 1, roll(f, -1, 0), 0)
        if s0 >> 1:
            f = jnp.where(_cio < SPD - 1, roll(f, -1, 1), 0)
        return f

    planes = []
    for p1 in range(4):
        b1, c1 = p1 >> 1, p1 & 1
        for p0 in range(4):
            b0, c0 = p0 >> 1, p0 & 1
            if not c1 and not c0:
                q = C(b1, b0)
            elif not c1:
                q = (C(b1, b0) + C(b1, b0 + 1) + 1) >> 1
            elif not c0:
                q = (C(b1, b0) + C(b1 + 1, b0) + 1) >> 1
            else:
                q = _uavg4(C(b1, b0), C(b1, b0 + 1),
                           C(b1 + 1, b0), C(b1 + 1, b0 + 1))
            planes.append(q)
    return planes


def qpsad_src_pre(srcsp):
    """Probe-invariant src-side lattice terms for qpsad_ph."""
    return srcsp, _tex_lat(srcsp, 1), _uavg4_lat(srcsp, 1)


def qpsad_ph(spre, planes, t0, t1, ew, tw, aw):
    """qpsad on the phase planes: byte-identical scores, (16, 16) math.
    The probe window W[rr, cc] = q[4 + t1 + 4rr, 4 + t0 + 4cc] is phase
    plane p = ((t1+4)&3, (t0+4)&3) sliced at (a1, a0) = ((t1+4)>>2,
    (t0+4)>>2); the stride-4 lattice metric on the canvas is the stride-1
    quad metric on W (reps (8r, 8c) there == reps (2r, 2c) here)."""
    srcsp, ta, s0 = spre
    p1 = (t1 + 4) & 3
    p0 = (t0 + 4) & 3
    a1 = (t1 + 4) >> 2
    a0 = (t0 + 4) >> 2
    p = p1 * 4 + p0
    sel = planes[0]
    for k in range(1, 16):
        sel = jnp.where(p == k, planes[k], sel)
    quads = [sel[i:i + 16, j:j + 16] for i in range(2) for j in range(2)]
    sub = jnp.where(a1 == 0,
                    jnp.where(a0 == 0, quads[0], quads[1]),
                    jnp.where(a0 == 0, quads[2], quads[3]))
    se = _uavg4_lat(jnp.abs(srcsp - sub), 1)
    tb = _tex_lat(sub, 1)
    s1 = _uavg4_lat(sub, 1)
    t = (((se * se) << ew) + (((ta - tb) ** 2) << tw)
         + (((s0 - s1) ** 2) << aw))
    acc = usum(jnp.where(_lat_mask(16, 16, 16, 16, 1), t, 0))
    return metric_return(acc, 16, 16)


# ---------------------------------------------------------------------------
# err_intra (ref: hme.c:839-889) with exact unsigned wraparound
# ---------------------------------------------------------------------------

def err_intra(a, b, bw, bh, avg_sb, avg_src, ratio):
    """psy = (0, 1, 2) as at the call site (ref: hme.c:917-919).
    Returns (intra_sb, intra_src, inter) as uint32."""
    h, w = a.shape
    qm = _lat_mask(h, w, bw, bh)
    ratio_u = ratio.astype(jnp.uint32)
    s0 = _uavg4_lat(a, 1)
    s1 = _uavg4_lat(b, 1)
    ta = _tex_lat(a, 1)
    tb = _tex_lat(b, 1)
    ae = _uavg4_lat(jnp.abs(a - b), 1)
    inter = (((ae * ae).astype(jnp.uint32) * ratio_u) >> jnp.uint32(5))
    inter = inter + (((ta - tb) ** 2) << 1).astype(jnp.uint32)
    inter = inter + (((s0 - s1) ** 2) << 2).astype(jnp.uint32)
    inter = usum(jnp.where(qm, inter, 0))

    def intra_term(avgv):
        aev = _uavg4_lat(jnp.abs(a - avgv), 1)
        t = ((aev * aev).astype(jnp.uint32)
             + ((ta * ta) << 1).astype(jnp.uint32)
             + (((s0 - avgv) ** 2) << 3).astype(jnp.uint32))
        return usum(jnp.where(qm, t, 0))

    return (intra_term(avg_sb), intra_term(avg_src),
            (inter * ratio_u) >> jnp.uint32(5))


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

    def probe(tvx, tvy, pred):
        """(sc_raw, sc) of a probe, computed only under pred (value-equal
        to the masked form: consumers read it only where pred holds)."""
        def f():
            r = metric(tvx, tvy)
            return r, r + cost(tvx, tvy)
        return guard(pred, f, (jnp.int32(I32MAX), jnp.int32(I32MAX)))

    def body(st):
        bestx, besty, best, m1, m2, m3, m4, good, done = st
        # probes share the pre-loop (bestx, besty); the strictly-sequential
        # improvement gating stays unrolled (ref: hme.c:1300-1345)
        bx0, by0 = bestx, besty
        if not _LAZY:
            # one vmapped metric body for the 5 probes (XLA only; values
            # identical to the per-probe evals the gating below consumes)
            pr_v = jax.vmap(lambda x, y: probe(x, y, jnp.bool_(True)))(
                bx0 + jnp.asarray(RECT[:5, 0]), by0 + jnp.asarray(RECT[:5, 1]))
        improved = jnp.bool_(False)
        metr = [m1, m2, m3, m4]
        for k in range(5):
            tvx = bx0 + int(RECT[k][0])
            tvy = by0 + int(RECT[k][1])
            inval = invalid_block(bx + tvx, by + tvy, bw, bh, 0, fw, fh)
            do = (~improved) & (~inval)
            if _LAZY:
                sc_raw, sc = probe(tvx, tvy, do)
            else:
                sc_raw = jnp.where(do, pr_v[0][k], jnp.int32(I32MAX))
                sc = jnp.where(do, pr_v[1][k], jnp.int32(I32MAX))
            if 1 <= k <= 4:
                metr[k - 1] = jnp.where(do, sc_raw, metr[k - 1])
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
        m1, m2, m3, m4 = metr
        # diagonal probe only when the 5-point pass had no improvement
        tvx = bestx + jnp.where(m1 <= m2, 1, -1)
        tvy = besty + jnp.where(m3 <= m4, 1, -1)
        inval = invalid_block(bx + tvx, by + tvy, bw, bh, 0, fw, fh)
        do = (~improved) & (~done)
        _, sc = probe(tvx, tvy, do & ~inval)
        better = do & (~inval) & (best > sc)
        bestx = jnp.where(better, tvx, bestx)
        besty = jnp.where(better, tvy, besty)
        best = jnp.where(better, sc, best)
        done = done | (do & ~better)
        return bestx, besty, best, m1, m2, m3, m4, good, done

    mI = jnp.int32(I32MAX)
    st = (bestx, besty, best, mI, mI, mI, mI,
          jnp.bool_(False), jnp.bool_(False))
    st = jax.lax.while_loop(lambda s: ~s[8], body, st)
    return st[0], st[1], st[2], st[7]


def gather_ctx(cfg, level, carry, parent_x, parent_y, tmv_x, tmv_y, i, j):
    """Every grid-array read one block needs, gathered up front: median
    predictor, spatial/temporal/parent candidate values, left/top neighbor
    vectors for neighbordif. The XLA wavefront reads the carry fields;
    the Pallas backend builds the identical dict from per-diagonal
    pre-gathered inputs + its SMEM carry ring (ref: hme.c:1202-1298)."""
    fx, fy, fskip = carry["fx"], carry["fy"], carry["fskip"]
    step = 1 << level
    g = {"pred": movec_pred(fx, fy, i, j)}

    def rd(f, x, y):
        return f[jnp.clip(y, 0, cfg.nbv - 1), jnp.clip(x, 0, cfg.nbh - 1)]

    spat = []
    for dx_, dy_ in ((-1, 0), (0, -1), (-1, -1)):
        xi = i + dx_ * step
        yj = j + dy_ * step
        ok = (xi >= 0) & (yj >= 0)
        spat.append((jnp.where(ok, rd(fx, xi, yj), 0),
                     jnp.where(ok, rd(fy, xi, yj), 0), ok))
    g["spat"] = tuple(spat)
    if level < cfg.pyramid_levels:
        pmask = ~((step << 1) - 1)
        pi = i & pmask
        pj = j & pmask
        par = []
        for n in range(9):
            ptx = pi + int(_PTS[n, 0]) * step
            pty = pj + int(_PTS[n, 1]) * step
            ok = ((ptx >= 0) & (ptx < cfg.nbh)
                  & (pty >= 0) & (pty < cfg.nbv))
            par.append((jnp.where(ok, rd(parent_x, ptx, pty), 0),
                        jnp.where(ok, rd(parent_y, ptx, pty), 0), ok))
        g["par"] = tuple(par)
    if cfg.has_tmv:
        tl = []
        for n in range(9):
            tx = i + int(RECT[n][0]) * step
            ty = j + int(RECT[n][1]) * step
            ok = (tx >= 0) & (tx < cfg.nbh) & (ty >= 0) & (ty < cfg.nbv)
            tl.append((jnp.where(ok, rd(tmv_x, tx, ty), 0),
                       jnp.where(ok, rd(tmv_y, tx, ty), 0), ok))
        g["tmv"] = tuple(tl)
        g["tmv_c"] = (rd(tmv_x, i, j), rd(tmv_y, i, j))
    nbr = []
    for xi, yj, ok in ((i - 1, j, i > 0), (i, j - 1, j > 0)):
        nbr.append((rd(fx, xi, yj), rd(fy, xi, yj),
                    rd(fskip, xi, yj), ok))
    g["nbr"] = tuple(nbr)
    return g


def _block_search(cfg, level, g, srcl, refl, ogrl, gx, gy, quant, i, j,
                  lane_valid):
    """Candidate search + refine for one block. g = gather_ctx output.
    Returns a dict of per-block results (level-0 decisions happen in
    _level0_decide). (ref: hme.c:1413-1630)."""
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

    # ---- candidates (ref: hme.c:1443-1528), streamed in slot order ----
    # Scores depend only on the candidate VALUE (cost, bias and metric are
    # all value-determined), so evaluating each (dx, dy) once and keeping
    # the first strict minimum is exactly the serial argmin; value-equal
    # duplicates are skipped (the reference dedupes too, hme.c:1166-1182).
    lax_ = jnp.int32(0)
    lay_ = jnp.int32(0)
    cands = [(jnp.int32(0), jnp.int32(0), jnp.bool_(True))]
    if level < cfg.pyramid_levels:
        par = g["par"]
        pok_n = [p[2].astype(jnp.int32) for p in par]
        npar = sum(pok_n)
        nd1 = jnp.maximum(npar, 1)
        lax0 = jint.divt(sum(p[0] for p in par), nd1)
        lay0 = jint.divt(sum(p[1] for p in par), nd1)
        dists = [jnp.where(p[2], (p[0] - lax0) ** 2 + (p[1] - lay0) ** 2, 0)
                 for p in par]
        avgd = sum(dists) // nd1
        ssd = sum(jnp.where(p[2], (d - avgd) ** 2, 0)
                  for p, d in zip(par, dists)).astype(jnp.int32)
        thresh = avgd + isqrt_u32(jint.divt(ssd, nd1))
        inls = [p[2] & (d <= thresh) for p, d in zip(par, dists)]
        nl = jnp.maximum(sum(il.astype(jnp.int32) for il in inls), 1)
        lax_ = jint.divt(sum(jnp.where(il, p[0], 0)
                             for p, il in zip(par, inls)), nl)
        lay_ = jint.divt(sum(jnp.where(il, p[1], 0)
                             for p, il in zip(par, inls)), nl)
        cands.append((lax_, lay_, jnp.bool_(True)))             # slot 1
        if level == 0:
            ppx, ppy = g["pred"]
            cands.append((sar_r(ppx, 2), sar_r(ppy, 2),
                          jnp.bool_(True)))                      # slot 2
        for vx, vy, ok in g["spat"]:                             # slots 3-5
            cands.append((sar_r(vx, 2), sar_r(vy, 2), ok))
        if cfg.has_tmv:
            for tvx, tvy, tok in g["tmv"]:                       # slots 6-14
                cands.append((sar_r(tvx, 2), sar_r(tvy, 2), tok))
        cands.append((gx, gy, jnp.bool_(True)))                  # slot 15
        for (pxv, pyv, _), il in zip(par, inls):                 # slots 16-24
            cands.append((pxv, pyv, il))

    def eval_cand(dx, dy):
        rw = window(refl, bx + dx, by + dy, y_h, y_w)
        if level > 1:
            raw = masked_sse(src_w, rw, bw, bh)
        else:
            raw = masked_metr(src_w, rw, bw, bh, ew, tw, aw)
        sc = raw + mv_cost(g["pred"][0], g["pred"][1], y_w, y_h,
                           cfg.vid_w, cfg.vid_h, dx * step * 4,
                           dy * step * 4, quant, 1 if level > 1 else 0)
        sc = jnp.where((dx == lax_) & (dy == lay_),
                       jnp.maximum(sc - (motion_bias >> level), 0), sc)
        return raw, sc

    # scale to level resolution (ref: hme.c:1522-1526)
    slots = []
    for cx, cy, ok in cands:
        dx = sar(cx, level)
        dy = sar(cy, level)
        inval = invalid_block(bx + dx, by + dy, bw, bh, 0, fw, fh)
        slots.append((dx, dy, ok & (~inval)))

    mI = jnp.int32(I32MAX)
    if _LAZY:
        # Pallas: one guarded eval per slot (lax.cond skips unused work;
        # Mosaic cannot lower the batched window gathers below) and the
        # unrolled pairwise dedup chains
        def probe_slot(k, dx, dy, pred):
            return guard(pred, lambda dx=dx, dy=dy: eval_cand(dx, dy),
                         (mI, mI))

        def dup_slot(k, dx, dy, seen):
            dup = jnp.bool_(False)
            for sdx, sdy, sev in seen:
                dup = dup | (sev & (sdx == dx) & (sdy == dy))
            return dup
    else:
        # XLA: ONE vmapped eval body instead of NC unrolled copies — the
        # candidate metric dominates the traced graph; vmap is an exact
        # transform so the per-slot values are unchanged. The pairwise
        # dedup (dup[k] = any earlier USED slot with the same vector)
        # collapses to one triangular-masked equality matrix.
        dxs_v = jnp.stack([s[0] for s in slots])
        dys_v = jnp.stack([s[1] for s in slots])
        use_v = jnp.stack([s[2] for s in slots])
        raws_v, scs_v = jax.vmap(eval_cand)(dxs_v, dys_v)
        eq_v = ((dxs_v[:, None] == dxs_v[None, :])
                & (dys_v[:, None] == dys_v[None, :]))
        tri = jnp.asarray(np.tril(np.ones((len(slots),) * 2, bool), -1))
        dup_v = (eq_v & use_v[None, :] & tri).any(axis=1)

        def probe_slot(k, dx, dy, pred):
            return (jnp.where(pred, raws_v[k], mI),
                    jnp.where(pred, scs_v[k], mI))

        def dup_slot(k, dx, dy, seen):
            return dup_v[k]

    best_score = mI
    score_zero = mI
    bdx = jnp.int32(0)
    bdy = jnp.int32(0)
    seen = []
    for slot, (dx, dy, use) in enumerate(slots):
        dup = dup_slot(slot, dx, dy, seen)
        raw, sc = probe_slot(slot, dx, dy, use & ~dup)
        if slot == 0:
            score_zero = jnp.where(use, raw, mI)
        better = sc < best_score
        best_score = jnp.where(better, sc, best_score)
        bdx = jnp.where(better, dx, bdx)
        bdy = jnp.where(better, dy, bdy)
        seen.append((dx, dy, use))
    dx, dy = bdx, bdy

    # ---- good-enough vs source reference (ref: hme.c:1569-1584) ----
    qthresh = ((quant * bw * bh) >> 11)
    qthresh = jnp.where((jnp.abs(dx) <= 1) & (jnp.abs(dy) <= 1),
                        qthresh * 2, qthresh)
    ogr_w = window(ogrl, bx, by, y_h, y_w)
    zoscore = masked_metr(src_w, ogr_w, bw, bh, ew, tw, aw)
    ge0 = zoscore < qthresh
    best0_ge = jnp.where(level == 0, score_zero, 0)
    best0 = jnp.where(ge0, best0_ge, best_score)
    dx = jnp.where(ge0, 0, dx)
    dy = jnp.where(ge0, 0, dy)

    # ---- greedy refine (skipped entirely on good-enough-zero) ----
    px_, py_ = g["pred"]
    rdx, rdy, rbest, rgood = guard(
        ~ge0, lambda: _refine_loop(
            cfg, level, src_w, refl, bx, by, bw, bh, (ew, tw, aw),
            dx, dy, best0, qthresh, px_, py_, quant, fw, fh),
        (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.bool_(False)))
    dx = jnp.where(ge0, 0, rdx)
    dy = jnp.where(ge0, 0, rdy)
    best = jnp.where(ge0, best0_ge, rbest)
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
            g = gather_ctx(cfg, level, carry, parent_x, parent_y,
                           tmv_x, tmv_y, i_, j_)
            r = _block_search(cfg, level, g, srcl, refl, ogrl, gx, gy,
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
    zerofp = best_fp == 0

    def body():
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
                >> jnp.uint32(3)).astype(jnp.int32)
        xx = bx + ((bw >> 1) - 8)
        yy = by + ((bh >> 1) - 8)
        refwin = window(refl, xx + fpx - 2, yy + fpy - 2, 21, 21)
        planes = qpel_phases(refwin)
        srcsp = window(srcl, xx, yy, 16, 16)
        spre = qpsad_src_pre(srcsp)
        # primary/secondary direction pick (ref: hme.c:1108-1133)
        prix = jnp.int32(0)
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
        # the 7 probes streamed in order; first strict minimum == the
        # reference's sequential strict-improvement update
        probes = [(prix << 1, priy << 1), (prix, priy),
                  (secx << 1, secy << 1), (secx, secy),
                  (diagx << 1, diagy << 1), (diagx, diagy),
                  (prix + diagx, priy + diagy)]
        mI = jnp.int32(I32MAX)

        def probe_sc(t0, t1):
            return qpsad_ph(spre, planes, t0, t1, ew, tw, aw) + mv_cost(
                px_, py_, y_w, y_h, cfg.vid_w, cfg.vid_h,
                fpx * 4 + t0, fpy * 4 + t1, quant, 0)

        if not _LAZY:
            # one vmapped qpsad body for the 7 probes (XLA only)
            scs_v = jax.vmap(probe_sc)(
                jnp.stack([p[0] for p in probes]),
                jnp.stack([p[1] for p in probes]))
        msc = mI
        mt0 = jnp.int32(0)
        mt1 = jnp.int32(0)
        for k, (t0, t1) in enumerate(probes):
            if cfg.effort < 8:
                do = ((t0 | t1) & 1) == 0  # half-pel only at low effort
            else:
                do = jnp.bool_(True)
            if _LAZY:
                sc = guard(do, lambda t0=t0, t1=t1: probe_sc(t0, t1), mI)
            else:
                sc = jnp.where(do, scs_v[k], mI)
            take = sc < msc
            msc = jnp.where(take, sc, msc)
            mt0 = jnp.where(take, t0, mt0)
            mt1 = jnp.where(take, t1, mt1)
        better = msc < best
        bestvx = jnp.where(better, mt0, 0)
        bestvy = jnp.where(better, mt1, 0)
        best = jnp.minimum(best, msc)
        ret = ((best.astype(jnp.uint32) * iarea_ratio.astype(jnp.uint32))
               >> jnp.uint32(3)).astype(jnp.int32)
        return ret, bestvx, bestvy

    ret, bestvx, bestvy = guard(
        ~zerofp, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    return (jnp.where(zerofp, best_fp, ret),
            jnp.where(zerofp, 0, bestvx), jnp.where(zerofp, 0, bestvy))


def _max_subblock_err(pl_a, pl_b, x0, y0, rx, ry, qw, qh, bw2, bh2, psy):
    """One plane of yuv_max_subblock_err (ref: hme.c:369-409).
    qw/qh: static quadrant window dims; bw2/bh2 dynamic."""
    ew, tw, aw = psy

    def quad(f, g_):
        a = window(pl_a, x0 + f * bw2, y0 + g_ * bh2, qh, qw)
        b = window(pl_b, rx + f * bw2, ry + g_ * bh2, qh, qw)
        return masked_metr_acc(a, b, bw2, bh2, ew, tw, aw)

    if _LAZY:
        accs = [quad(f, g_) for f, g_ in ((0, 0), (1, 0), (0, 1), (1, 1))]
        return jnp.maximum(jnp.maximum(accs[0], accs[1]),
                           jnp.maximum(accs[2], accs[3]))
    # XLA: one vmapped quadrant body (max is order-free)
    accs = jax.vmap(quad)(jnp.asarray([0, 1, 0, 1], jnp.int32),
                          jnp.asarray([0, 0, 1, 1], jnp.int32))
    return jnp.max(accs)


def _calc_eprm(src_w, ref_w, bw, bh, avg_src, avg_ref):
    """(ref: hme.c:451-490)."""
    h, w = src_w.shape
    m = ((jnp.arange(w)[None, :] < bw) & (jnp.arange(h)[:, None] < bh))
    s = src_w
    clipr = (m & ((((s - ref_w) + 128) & ~0xFF) != 0)).any()
    clipi = (m & (((s - (avg_ref - 128)) & ~0xFF) != 0)).any()
    clipd = (m & (((s - (avg_src - 128)) & ~0xFF) != 0)).any()
    return clipi, clipd, clipr


def _level0_decide(cfg, r, g, srcl, refl, ogrl, src_u, src_v,
                   ref_u, ref_v, quant, skip_thresh):
    """Mode decisions at the base level (ref: hme.c:1598-1821). r = result
    dict from _block_search, g = gather_ctx. Returns per-block outputs +
    stat deltas."""
    i, j = r["i"], r["j"]
    bx, by, bw, bh = r["bx"], r["by"], r["bw"], r["bh"]
    fw, fh = cfg.dims[0]
    y_w, y_h = cfg.blk_w, cfg.blk_h
    yarea = bw * bh
    psy = r["psy"]
    ew, tw, aw = psy
    src_w = r["src_w"]
    quant_rd = (quant * quant).astype(jnp.uint32)
    skipt = (quant_rd >> jnp.uint32(19)).astype(jnp.int32)
    good = r["good"]
    fpelx0, fpely0 = r["dx"], r["dy"]
    best = jnp.where((fpelx0 == r["lax"]) & (fpely0 == r["lay"]),
                     r["best"] + r["motion_bias"], r["best"])
    best_fp = best
    px_, py_ = g["pred"]

    sub_x = jnp.int32(0)
    sub_y = jnp.int32(0)
    fpelx, fpely = fpelx0, fpely0
    if cfg.effort >= 4:
        z3 = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
        cond1 = ~invalid_block(bx + r["lax"], by + r["lay"], bw, bh, 4,
                               fw, fh)
        ret1, sx1, sy1 = guard(
            cond1, lambda: _subpel(cfg, srcl, refl, bx, by, bw, bh,
                                   r["lax"], r["lay"], best_fp, psy,
                                   px_, py_, quant, fw, fh), z3)
        found1 = cond1 & ((sx1 != 0) | (sy1 != 0))
        best = jnp.where(cond1, ret1, best)
        cond2 = ((~found1) & (~good)
                 & ~invalid_block(bx + fpelx0, by + fpely0, bw, bh, 4,
                                  fw, fh))
        ret2, sx2, sy2 = guard(
            cond2, lambda: _subpel(cfg, srcl, refl, bx, by, bw, bh,
                                   fpelx0, fpely0, best_fp, psy,
                                   px_, py_, quant, fw, fh), z3)
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
    nd0, nd1 = _neighbordif_self(g, mvx, mvy)
    neidif = (nd0 + nd1) // 3

    # ---- skip test (ref: hme.c:1694-1729) ----
    do_skip = not (cfg.skip_thresh_neg or cfg.lossless)
    do_nox = not cfg.lossless
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
               * jnp.maximum(skipt, 1).astype(jnp.uint32)) >> jnp.uint32(5)
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


def _neighbordif_self(g, cmx, cmy):
    """neighbordif2 with the current block's (not yet scattered) vector;
    left/top neighbor (vx, vy, skip, ok) come pre-gathered in g["nbr"]
    (ref: dsv.c:402-438)."""
    ds = []
    for vx, vy, sk, ok in g["nbr"]:
        use = ok & ((vx != 0) | (vy != 0)) & (sk == 0)
        nvx = jnp.where(use, vx, cmx)
        nvy = jnp.where(use, vy, cmy)
        ds.append(jnp.abs(nvx - cmx) + jnp.abs(nvy - cmy))
    small = (jnp.abs(cmx) < 2) & (jnp.abs(cmy) < 2)
    return jnp.where(small, 0, ds[0]), jnp.where(small, 0, ds[1])


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

    # the per-quad window metrics don't depend on the sequential state;
    # only the decay/take decisions below do (ref: hme.c:891-985)
    def quad_metrics(f, g_):
        src_d = window(srcl, bx + f * sbw, by + g_ * sbh, qh, qw)
        mvr_d = window(refl, bx + fpelx + f * sbw, by + fpely + g_ * sbh,
                       qh, qw)
        _, avg_sub, _, _ = block_feat_detail(mvr_d, sbw, sbh)
        local_detail, avg_local, _, _ = block_feat_detail(src_d, sbw, sbh)
        local_detail = local_detail.astype(jnp.int32)
        dcd = jnp.abs(avg_local - avg_sub).astype(jnp.int32) + 2
        too_detailed = local_detail.astype(jnp.uint32) > (
            (dcd * dcd * bw * bh).astype(jnp.uint32) * ratio_u) >> 5
        dc = (avg_local + avg_src * 3 + 2) >> 2
        sub_err, src_err, inter_err = err_intra(
            src_d, mvr_d, sbw, sbh, avg_sub.astype(jnp.int32),
            dc.astype(jnp.int32), ratio)
        return (avg_sub, local_detail, too_detailed, dc,
                sub_err, src_err, inter_err)

    if not _LAZY:
        # XLA: one vmapped quad body (exact per-quad values)
        qm_v = jax.vmap(quad_metrics)(jnp.asarray([0, 1, 0, 1], jnp.int32),
                                      jnp.asarray([0, 0, 1, 1], jnp.int32))

    # detail_src decays when a sub-block is taken -> sequential over the
    # 4 sub-blocks, unrolled (Mosaic has no xs-scan)
    for k, (f, g_, bit) in enumerate(
            ((0, 0, K.MASK_INTRA00), (1, 0, K.MASK_INTRA01),
             (0, 1, K.MASK_INTRA10), (1, 1, K.MASK_INTRA11))):
        if _LAZY:
            (avg_sub, local_detail, too_detailed, dc,
             sub_err, src_err, inter_err) = quad_metrics(f, g_)
        else:
            (avg_sub, local_detail, too_detailed, dc,
             sub_err, src_err, inter_err) = jax.tree_util.tree_map(
                lambda a, k=k: a[k], qm_v)
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

    # each sub-block only reads the INITIAL submask bit -> independent
    def quad_difs(f, g_):
        us = masked_avg(window(src_u, cbx + f * sbw, cby + g_ * sbh,
                               qh, qw), sbw, sbh)
        vs_a = masked_avg(window(src_v, cbx + f * sbw, cby + g_ * sbh,
                                 qh, qw), sbw, sbh)
        ur = masked_avg(window(ref_u, cbmx + f * sbw, cbmy + g_ * sbh,
                               qh, qw), sbw, sbh)
        vr = masked_avg(window(ref_v, cbmx + f * sbw, cbmy + g_ * sbh,
                               qh, qw), sbw, sbh)
        return (((us - ur) ** 2 + (vs_a - vr) ** 2) * avg_ramp) >> 8

    if not _LAZY:
        difs_v = jax.vmap(quad_difs)(jnp.asarray([0, 1, 0, 1], jnp.int32),
                                     jnp.asarray([0, 0, 1, 1], jnp.int32))
    add = jnp.int32(0)
    for k, (f, g_, bit) in enumerate(
            ((0, 0, K.MASK_INTRA00), (1, 0, K.MASK_INTRA01),
             (0, 1, K.MASK_INTRA10), (1, 1, K.MASK_INTRA11))):
        already = (submask & bit) != 0
        dif = quad_difs(f, g_) if _LAZY else difs_v[k]
        take = ((~blocked) & (~already)
                & (dif.astype(jnp.uint32) > thr.astype(jnp.uint32)))
        add = add + jnp.where(take, bit, 0)
    submask = submask | add
    return submask, submask != 0


def level0_block(cfg, g, srcl, refl, ogrl, src_u, src_v, ref_u, ref_v,
                 gx, gy, quant, skip_thresh, i_, j_, ok_):
    """Complete base-level pipeline for one block: search + subpel + mode
    decisions + intra tests + flag assembly (ref: hme.c:1598-1833).
    Shared verbatim by the XLA wavefront and the Pallas kernel."""
    r = _block_search(cfg, 0, g, srcl, refl, ogrl, gx, gy,
                      quant, i_, j_, ok_)
    d0 = _level0_decide(cfg, r, g, srcl, refl, ogrl,
                        src_u, src_v, ref_u, ref_v, quant, skip_thresh)
    d0["bwbh"] = r["bw"] * r["bh"]
    # intra tests (ref: hme.c:1779-1788)
    if cfg.has_tmv:
        rmx, rmy = g["tmv_c"]
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
            g = gather_ctx(cfg, level, carry, parent_x, parent_y,
                           tmv_x, tmv_y, i_, j_)
            return level0_block(cfg, g, srcl, refl, ogrl, src_u, src_v,
                                ref_u, ref_v, gx, gy, quant, skip_thresh,
                                i_, j_, ok_)

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
        st = submit(("hme", cfg), make_motion_est, inputs, fetch=True)
    else:
        st = make_motion_est(cfg)(*inputs)
    apply_motion_est(enc, d, st)
