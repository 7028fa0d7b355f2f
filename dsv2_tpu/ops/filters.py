"""Device in-loop filters: the sequential 4x4 deblock/dering filters as
XLA wavefront programs (ref: src/bmc.c:51-659).

The reference scans FDIM tiles (luma/intra: 4x4 tiles; inter chroma: whole
blocks) in raster order, and each tile's 6-tap test window overlaps writes
of its left / up / up-right neighbors.  Raster semantics are reproduced
exactly on device with an anti-diagonal wavefront over ``d = i + 2*j``:

- a tile on diagonal d only reads pixels written by tiles on diagonals
  < d, and same-diagonal tiles write disjoint pixels, so every diagonal
  can be processed in one data-parallel step;
- the plane is kept in a *skewed* layout S[r, c + shift*band(r)] so that
  every window of a diagonal lives in one contiguous column strip - the
  whole scan is dynamic-slice / static-slice / dynamic-update-slice, with
  no gather or scatter ops;
- each tile computes masked updates of its private window; the deltas are
  accumulated back into the strip (same-diagonal writes are disjoint, so
  addition reproduces the raster result bit-exactly).

Parity oracle: the native C runtime (native/dsv2n.c dsvn_intra_filter /
dsvn_luma_filter / dsvn_chroma_filter), itself byte-checked against the
reference binary by the e2e suites.
"""
import functools
import os
import sys
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import constants as K
from . import jint


def impl():
    """The in-loop filter implementation for the current backend: the
    Pallas wavefront kernels (ops/filters_pl) on an accelerator — they
    replace this module's fori-loop scan, whose per-iteration scalar-sync
    floor costs ~370 ms per CIF luma pass on TPU — and this XLA module on
    CPU. DSV2_FILTERS=xla|pallas overrides."""
    mode = os.environ.get("DSV2_FILTERS", "auto")
    if mode == "pallas" or (mode == "auto"
                            and jax.default_backend() != "cpu"):
        from . import filters_pl
        return filters_pl
    return sys.modules[__name__]

F_STABLE = 1 << K.STABLE_BIT
F_MAINTAIN = 1 << K.MAINTAIN_BIT
F_RINGING = 1 << K.RINGING_BIT


class _Lay(NamedTuple):
    """Static wavefront layout for a (tile-size, plane, grid) combination."""
    pw: int          # visible plane width
    ph: int          # visible plane height
    tw: int          # tile width (4 for luma; block width for chroma)
    th: int          # tile height
    ntx: int         # tiles per row in the wavefront grid
    nty: int         # tile rows
    L: int           # max lanes on a diagonal
    nd: int          # number of diagonals
    mb: int          # top margin in bands
    mr: int          # top margin rows (mb*th)
    mc: int          # left margin cols
    NB: int          # total bands
    HS: int          # skewed/padded rows (NB*th)
    W0: int          # unskewed padded width
    WS: int          # skewed width
    shift: int       # column shift per band (2*tw)
    strip_w: int     # diagonal strip width
    strip_h: int     # diagonal strip height
    wh: int          # window rows (th+8)
    ww: int          # window cols (tw+8)


def _layout(pw, ph, tw, th, ntx, nty):
    wh, ww = th + 8, tw + 8
    L = max(1, min(nty, (ntx + 1) // 2))
    nd = (ntx - 1) + 2 * (nty - 1) + 1
    mb = -(-8 // th)
    mr = mb * th
    mc = 8
    NB = mb + (nty - 1) + L + 2
    NB = max(NB, mb + -(-(ph + th + 8) // th))
    HS = NB * th
    W0 = mc + pw + tw + 16
    shift = 2 * tw
    strip_w = 5 * tw + 8
    strip_h = mr + th * L + 4
    dmax = nd - 1
    base_max = mc - 4 + shift * (mb - 1) + tw * dmax
    WS = max(shift * (NB - 1) + W0, base_max + strip_w) + 8
    return _Lay(pw, ph, tw, th, ntx, nty, L, nd, mb, mr, mc,
                NB, HS, W0, WS, shift, strip_w, strip_h, wh, ww)


def _skew(lay, P):
    """P (HS, W0) -> S (HS, WS) with band b shifted right by shift*b."""
    bands = []
    for b in range(lay.NB):
        left = lay.shift * b
        bands.append(jnp.pad(P[b * lay.th:(b + 1) * lay.th],
                             ((0, 0), (left, lay.WS - lay.W0 - left))))
    return jnp.concatenate(bands, axis=0)


def _unskew(lay, S):
    rows = []
    for b in range(lay.NB):
        left = lay.shift * b
        rows.append(S[b * lay.th:(b + 1) * lay.th, left:left + lay.W0])
    return jnp.concatenate(rows, axis=0)


def _band_delta(lay, k):
    """Extra column shift of window row k (crosses into band j-1 / j+1)."""
    if k < 4:
        return 0            # band j-1: offset 2*tw*(delta+1) with delta=-1
    if k < lay.th + 4:
        return lay.shift    # band j
    return 2 * lay.shift    # band j+1


# ---------------------------------------------------------------------------
# window primitives (all operate on A: (L, wh, ww) int32, lane-private)
# ---------------------------------------------------------------------------

def _lpf6(e0, i0, e1, i1):
    return (5 * (e0 + i0) + 3 * (e1 + i1) + 8) >> 4


def _flat6(e2, e1, e0, i0, i1, i2, avg, t):
    return ((jnp.abs(e0 - avg) < t) & (jnp.abs(i0 - avg) < t) &
            (jnp.abs(e1 - avg) < t) & (jnp.abs(i1 - avg) < t) &
            (jnp.abs(e2 - avg) < t) & (jnp.abs(i2 - avg) < t))


def _hfilt(A, ro, co, edge, thE, thM, guard, in_edge):
    """Filter the vertical boundary at window col `co`, rows ro..ro+3
    (ref: bmc.c:51-119 via native hfilt). edge/thE/thM/guard/in_edge are
    per-lane; a threshold <= 0 naturally writes nothing."""
    g = guard & (thM > 0) & ~(edge & (thE <= 0))
    thE_ = jnp.where(edge, thE, thM)[:, None]
    band = A[:, ro:ro + 4, :]
    c = [band[:, :, co + o] for o in range(-3, 8)]
    e2, e1, e0, i0, i1, i2 = c[0], c[1], c[2], c[3], c[4], c[5]
    avg = _lpf6(e0, i0, e1, i1)
    f = _flat6(e2, e1, e0, i0, i1, i2, avg, thE_) & g[:, None]
    a5 = avg * 5
    band = band.at[:, :, co - 2].set(
        jnp.where(f, (3 * (avg + e1) + 2 * e2 + 4) >> 3, e1))
    band = band.at[:, :, co - 1].set(
        jnp.where(f, (a5 + 2 * e1 + e2 + 4) >> 3, e0))
    band = band.at[:, :, co + 0].set(jnp.where(f, avg, i0))
    band = band.at[:, :, co + 1].set(
        jnp.where(f, (a5 + 2 * i1 + i2 + 4) >> 3, i1))
    # interior boundary at co+4 (reads cols co+2..co+7: disjoint from the
    # writes above, like the C reads through the untouched pixels)
    i2b, i1b, i0b, e0b, e1b, e2b = c[5], c[6], c[7], c[8], c[9], c[10]
    avgb = _lpf6(e0b, i0b, e1b, i1b)
    fb = (_flat6(e2b, e1b, e0b, i0b, i1b, i2b, avgb, thM[:, None])
          & (g & in_edge)[:, None])
    a5b = avgb * 5
    band = band.at[:, :, co + 3].set(
        jnp.where(fb, (a5b + 2 * i1b + i2b + 4) >> 3, i1b))
    band = band.at[:, :, co + 4].set(jnp.where(fb, avgb, i0b))
    band = band.at[:, :, co + 5].set(
        jnp.where(fb, (a5b + 2 * e1b + e2b + 4) >> 3, e0b))
    band = band.at[:, :, co + 6].set(
        jnp.where(fb, (3 * (avgb + e1b) + 2 * e2b + 4) >> 3, e1b))
    return A.at[:, ro:ro + 4, :].set(band)


def _vfilt(A, ro, co, edge, thE, thM, guard, in_edge):
    """Filter the horizontal boundary at window row `ro`, cols co..co+3
    (ref: bmc.c:121-191 via native vfilt)."""
    g = guard & (thM > 0) & ~(edge & (thE <= 0))
    thE_ = jnp.where(edge, thE, thM)[:, None]
    band = A[:, :, co:co + 4]
    r = [band[:, ro + o, :] for o in range(-3, 8)]
    e2, e1, e0, i0, i1, i2 = r[0], r[1], r[2], r[3], r[4], r[5]
    avg = _lpf6(e0, i0, e1, i1)
    f = _flat6(e2, e1, e0, i0, i1, i2, avg, thE_) & g[:, None]
    a5 = avg * 5
    band = band.at[:, ro - 2, :].set(
        jnp.where(f, (3 * (avg + e1) + 2 * e2 + 4) >> 3, e1))
    band = band.at[:, ro - 1, :].set(
        jnp.where(f, (a5 + 2 * e1 + e2 + 4) >> 3, e0))
    band = band.at[:, ro + 0, :].set(jnp.where(f, avg, i0))
    band = band.at[:, ro + 1, :].set(
        jnp.where(f, (a5 + 2 * i1 + i2 + 4) >> 3, i1))
    i2b, i1b, i0b, e0b, e1b, e2b = r[5], r[6], r[7], r[8], r[9], r[10]
    avgb = _lpf6(e0b, i0b, e1b, i1b)
    fb = (_flat6(e2b, e1b, e0b, i0b, i1b, i2b, avgb, thM[:, None])
          & (g & in_edge)[:, None])
    a5b = avgb * 5
    band = band.at[:, ro + 3, :].set(
        jnp.where(fb, (a5b + 2 * i1b + i2b + 4) >> 3, i1b))
    band = band.at[:, ro + 4, :].set(jnp.where(fb, avgb, i0b))
    band = band.at[:, ro + 5, :].set(
        jnp.where(fb, (a5b + 2 * e1b + e2b + 4) >> 3, e0b))
    band = band.at[:, ro + 6, :].set(
        jnp.where(fb, (3 * (avgb + e1b) + 2 * e2b + 4) >> 3, e1b))
    return A.at[:, :, co:co + 4].set(band)


def _quads(A, ro, co):
    t = A[:, ro:ro + 4, co:co + 4]
    d0 = (t[:, 0, 0] + t[:, 0, 1] + t[:, 1, 0] + t[:, 1, 1] + 2) >> 2
    d1 = (t[:, 0, 2] + t[:, 0, 3] + t[:, 1, 2] + t[:, 1, 3] + 2) >> 2
    d2 = (t[:, 2, 0] + t[:, 2, 1] + t[:, 3, 0] + t[:, 3, 1] + 2) >> 2
    d3 = (t[:, 2, 2] + t[:, 2, 3] + t[:, 3, 2] + t[:, 3, 3] + 2) >> 2
    return t, d0, d1, d2, d3


def _tile_energy(A, ro, co):
    """4x4 haar + downsampled energy (ref: bmc.c:224-270)."""
    t, d0, d1, d2, d3 = _quads(A, ro, co)
    x0 = t[:, 0::2, 0::2]
    x1 = t[:, 0::2, 1::2]
    x2 = t[:, 1::2, 0::2]
    x3 = t[:, 1::2, 1::2]
    hh = jnp.abs(x0 - x1 - x2 + x3) >> 1
    sh = (jnp.abs(x0 - x1 + x2 - x3) + hh).sum((1, 2))
    sv = (jnp.abs(x0 + x1 - x2 - x3) + hh).sum((1, 2))
    hhl = jnp.abs(d0 - d1 - d2 + d3) >> 1
    slh = jnp.abs(d0 - d1 + d2 - d3) + hhl
    slv = jnp.abs(d0 + d1 - d2 - d3) + hhl
    return sh, sv, slh, slv


def _dsfactor(A, ro, co):
    """Downsampled smoothing factor (ref: bmc.c:193-222)."""
    _, d0, d1, d2, d3 = _quads(A, ro, co)
    sh = jnp.abs((d0 + d1) - (d3 + d2))
    sv = jnp.abs((d2 + d1) - (d3 + d0))
    small = jnp.maximum(sh, sv) < 8
    d2b = 255 - d2
    d3b = 255 - d3
    sh2 = jnp.abs(d0 - d1 + d2b - d3b)
    sv2 = jnp.abs(d0 + d1 - d2b - d3b) >> 2
    r = jnp.where(sh2 > sv2, (3 * sh2 + sv2 + 2) >> 2,
                  (3 * sv2 + sh2 + 2) >> 2)
    return jnp.where(small, 0, r)


def _degrad(A, ro, co, mask):
    """Histogram de-gradient sharpener on the 4x4 tile (ref: bmc.c:272-337)."""
    t4 = A[:, ro:ro + 4, co:co + 4]
    Ln = t4.shape[0]
    v = t4.reshape(Ln, 16)
    oh = ((v >> 4)[:, :, None] == jnp.arange(16)[None, None, :])
    hist = oh.sum(1)
    sums = (oh * v[:, :, None]).sum(1)
    has = hist > 0
    lo = jnp.argmax(has, axis=1)
    hi = 15 - jnp.argmax(has[:, ::-1], axis=1)
    ok = mask & (lo < hi)
    hl = jnp.take_along_axis(hist, lo[:, None], 1)[:, 0]
    hh = jnp.take_along_axis(hist, hi[:, None], 1)[:, 0]
    alo = (jnp.take_along_axis(sums, lo[:, None], 1)[:, 0]
           // jnp.maximum(hl, 1))
    ahi = (jnp.take_along_axis(sums, hi[:, None], 1)[:, 0]
           // jnp.maximum(hh, 1))
    alo = jnp.maximum(alo, 1)[:, None]
    ahi = jnp.maximum(ahi, 1)[:, None]
    mid = (alo + ahi + 1) >> 1
    low = v + jint.divt(hl[:, None] * (alo - v), 16)
    hig = v + jint.divt(hh[:, None] * (ahi - v), 16)
    nv = jnp.where(v < mid, low, jnp.where(v > mid, hig, v))
    nv = jnp.where(ok[:, None], nv, v)
    return A.at[:, ro:ro + 4, co:co + 4].set(nv.reshape(Ln, 4, 4))


def _curve_tex(tt):
    """(ref: bmc.c:364-374 via native curve_tex)."""
    return jnp.where(tt < 8, (8 - tt) * 8, jnp.where(tt > 192, 0, tt - 7))


# ---------------------------------------------------------------------------
# wavefront runner
# ---------------------------------------------------------------------------

def _run_wavefront(lay, vis, props_t, step_fn):
    """Scan diagonals d = i + 2*j over the tile grid, applying step_fn to
    each diagonal's windows. vis: (ph, pw) int32. props_t: (NP, nty, ntx)
    int32 per-tile properties. step_fn(A, pr, valid, i_arr, j_arr) -> A."""
    P = jnp.zeros((lay.HS, lay.W0), jnp.int32)
    P = P.at[lay.mr:lay.mr + lay.ph, lay.mc:lay.mc + lay.pw].set(vis)
    S = _skew(lay, P)
    lanes = jnp.arange(lay.L)
    base0 = lay.mc - 4 + lay.shift * (lay.mb - 1)

    def body(d, S):
        j0 = jnp.maximum(0, (d - (lay.ntx - 1) + 1) >> 1)
        j_arr = j0 + lanes
        i_arr = d - 2 * j_arr
        valid = (j_arr < lay.nty) & (i_arr >= 0)
        strip = jax.lax.dynamic_slice(
            S, (j0 * lay.th, base0 + lay.tw * d),
            (lay.strip_h, lay.strip_w))
        rows = []
        for k in range(lay.wh):
            r0 = lay.mr - 4 + k
            c0 = _band_delta(lay, k)
            rows.append(jax.lax.slice(
                strip, (r0, c0),
                (r0 + lay.th * (lay.L - 1) + 1, c0 + lay.ww),
                (lay.th, 1)))
        A = jnp.stack(rows, axis=1)  # (L, wh, ww)
        ic = jnp.clip(i_arr, 0, lay.ntx - 1)
        jc = jnp.clip(j_arr, 0, lay.nty - 1)
        pr = props_t[:, jc, ic]
        A2 = step_fn(A, pr, valid, i_arr, j_arr)
        delta = jnp.where(valid[:, None, None], A2 - A, 0)
        sd = jnp.zeros_like(strip)
        for k in range(lay.wh):
            r0 = lay.mr - 4 + k
            c0 = _band_delta(lay, k)
            sd = sd.at[r0:r0 + lay.th * lay.L:lay.th,
                       c0:c0 + lay.ww].add(delta[:, k, :])
        return jax.lax.dynamic_update_slice(
            S, strip + sd, (j0 * lay.th, base0 + lay.tw * d))

    S = jax.lax.fori_loop(0, lay.nd, body, S)
    P = _unskew(lay, S)
    return P[lay.mr:lay.mr + lay.ph, lay.mc:lay.mc + lay.pw]


# ---------------------------------------------------------------------------
# intra dering filter (luma only; ref: bmc.c:390-457)
# ---------------------------------------------------------------------------

def _tile_maps(pw, ph, nbh, nbv):
    """Static tile->block maps (fx = i*nbh/nsbx with C semantics)."""
    nsbx, nsby = pw // 4, ph // 4
    ntx = max(0, (pw - 1) // 4)   # tiles with x+4 < pw
    nty = max(0, (ph - 1) // 4)
    fx = (np.arange(ntx) * nbh) // max(nsbx, 1)
    fy = (np.arange(nty) * nbv) // max(nsby, 1)
    return ntx, nty, fx, fy


def intra_filter_graph(pw, ph, nbh, nbv, vis_u8, bd_grid, fq, fthresh):
    """Traced intra dering filter on a visible plane (uint8 in/out)."""
    ntx, nty, fx, fy = _tile_maps(pw, ph, nbh, nbv)
    if ntx <= 0 or nty <= 0:
        return vis_u8
    lay = _layout(pw, ph, 4, 4, ntx, nty)
    flags_t = bd_grid.astype(jnp.int32)[fy[:, None], fx[None, :]]
    props_t = flags_t[None]

    def step(A, pr, valid, i_arr, j_arr):
        flags = pr[0]
        m0 = valid & ((flags & F_RINGING) == 0)
        sh, sv, slh, slv = _tile_energy(A, 4, 4)
        mx = jnp.maximum(sh, sv)
        me = m0 & (mx < 256) & (mx > 8)
        ms = (flags & (F_MAINTAIN | F_STABLE)) != 0
        ttd = _dsfactor(A, 4, 4)
        ttd = jnp.where((flags & F_STABLE) != 0, (ttd * 5) >> 2, ttd)
        tt = jnp.where(ms, ttd, 8)
        tt = jint.divt(tt * 2, 3)
        tt = jnp.clip((tt * fq) >> 12, 0, fthresh)
        tt1 = jnp.where(me, tt, 0)
        mh = i_arr >= 1
        mv_ = j_arr >= 1
        ieh = (i_arr * 4) < (pw - 8)
        iev = (j_arr * 4) < (ph - 8)
        no_e = jnp.zeros_like(me)
        A = _hfilt(A, 4, 4, no_e, tt1, tt1, me & mh, ieh)
        A = _vfilt(A, 4, 4, no_e, tt1, tt1, me & mv_, iev)
        tt2 = jnp.where(sh > sv, 3 * sh + sv, 3 * sv + sh)
        tt2 = _curve_tex(tt2)
        tt2 = 16 + ((tt2 + 2) >> 2)
        tt2 = jnp.clip((tt2 * fq) >> 12, 0, fthresh)
        tt2 = jnp.where(me, tt2, 0)
        A = _hfilt(A, 4, 4, no_e, tt2, tt2, me & mh, ieh)
        A = _vfilt(A, 4, 4, no_e, tt2, tt2, me & mv_, iev)
        return A

    out = _run_wavefront(lay, vis_u8.astype(jnp.int32), props_t, step)
    return out.astype(jnp.uint8)


@functools.lru_cache(maxsize=None)
def make_intra_filter(pw, ph, nbh, nbv):
    def f(vis, bd_grid, fq, fthresh):
        return intra_filter_graph(pw, ph, nbh, nbv, vis, bd_grid,
                                  fq, fthresh)
    return jax.jit(f)


# ---------------------------------------------------------------------------
# inter luma cleanup filter (ref: bmc.c:459-602)
# ---------------------------------------------------------------------------

def _neighbordif2_grids(mvx, mvy, flags):
    """Vectorized neighbordif2 over the whole block grid (ref: dsv.c:402-425
    via native neighbordif2). Returns (ndx, ndy) int32 grids."""
    cx, cy = mvx, mvy
    small = (jnp.abs(cx) < 2) & (jnp.abs(cy) < 2)
    skip = (flags >> K.MV_BIT_SKIP) & 1

    def pick(sh_x, sh_y):
        nx = jnp.roll(cx, (sh_y, sh_x), (0, 1))
        ny = jnp.roll(cy, (sh_y, sh_x), (0, 1))
        nsk = jnp.roll(skip, (sh_y, sh_x), (0, 1))
        ok = ((nx != 0) | (ny != 0)) & (nsk == 0)
        if sh_x:
            ok = ok & (jnp.arange(cx.shape[1])[None, :] > 0)
        if sh_y:
            ok = ok & (jnp.arange(cx.shape[0])[:, None] > 0)
        return jnp.where(ok, nx, cx), jnp.where(ok, ny, cy)

    vx0, vy0 = pick(1, 0)   # left
    vx1, vy1 = pick(0, 1)   # top
    ndx = jnp.abs(vx0 - cx) + jnp.abs(vy0 - cy)
    ndy = jnp.abs(vx1 - cx) + jnp.abs(vy1 - cy)
    ndx = jnp.where(small, 0, ndx)
    ndy = jnp.where(small, 0, ndy)
    return ndx, ndy


def luma_filter_graph(pw, ph, nbh, nbv, blk_w, blk_h, inter_sharpen,
                      vis_u8, mvx, mvy, flags, submask,
                      fq, fthresh, do_filter, tmc):
    """Traced inter luma filter (ref: bmc.c:459-602). mvx/mvy/flags/submask:
    (nbv, nbh) int32 grids; do_filter/tmc: traced 0/1 scalars."""
    ntx, nty, fx, fy = _tile_maps(pw, ph, nbh, nbv)
    if ntx <= 0 or nty <= 0:
        return vis_u8
    lay = _layout(pw, ph, 4, 4, ntx, nty)
    ndx_g, ndy_g = _neighbordif2_grids(mvx, mvy, flags)
    # per-tile property stack, expanded via the static tile->block maps
    bprops = jnp.stack([mvx, mvy, flags, submask, ndx_g, ndy_g])
    props_bt = bprops[:, fy[:, None], fx[None, :]]
    edgeh = ((np.arange(ntx) * 4) % blk_w) == 0
    edgev = ((np.arange(nty) * 4) % blk_h) == 0
    edgehs = ((np.arange(ntx) * 4) % (blk_w // 2)) == 0
    edgevs = ((np.arange(nty) * 4) % (blk_h // 2)) == 0
    st = [np.broadcast_to(a[None, :] if ax else a[:, None], (nty, ntx))
          for a, ax in ((edgeh, 1), (edgev, 0), (edgehs, 1), (edgevs, 0))]
    props_t = jnp.concatenate(
        [props_bt, jnp.asarray(np.stack(st).astype(np.int32))], axis=0)
    thH = jnp.clip((64 * fq) >> 12, 2, 32)
    thL = jnp.clip((32 * fq) >> 12, 2, 32)
    sharpen = (jnp.int32(inter_sharpen) * tmc) != 0
    dof = do_filter != 0

    def step(A, pr, valid, i_arr, j_arr):
        bmvx, bmvy, fl, sub, ndx, ndy, eh, ev, ehs, evs = (
            pr[0], pr[1], pr[2], pr[3], pr[4], pr[5],
            pr[6] != 0, pr[7] != 0, pr[8] != 0, pr[9] != 0)
        skip = ((fl >> K.MV_BIT_SKIP) & 1) != 0
        intra = ((fl >> K.MV_BIT_INTRA) & 1) != 0
        eprm = ((fl >> K.MV_BIT_EPRM) & 1) != 0
        amx = jnp.abs(bmvx)
        amy = jnp.abs(bmvy)
        mbase = valid & ~skip
        mh = i_arr >= 1
        mv_ = j_arr >= 1
        ieh = (i_arr * 4) < (pw - 8)
        iev = (j_arr * 4) < (ph - 8)
        # intra blocks (filtered regardless of do_filter; ref: bmc.c:529-545)
        subne = sub != K.MASK_ALL_INTRA
        teh = eh | (subne & ehs)
        tev = ev | (subne & evs)
        mi = mbase & intra
        thHv = jnp.where(mi, thH, 0)
        thLv = jnp.where(mi, thL, 0)
        A = _hfilt(A, 4, 4, teh, thHv, thLv, mi & mh, ieh)
        A = _vfilt(A, 4, 4, tev, thHv, thLv, mi & mv_, iev)
        # inter blocks with neighbor-MV divergence (ref: bmc.c:547-594)
        mdf = mbase & ~intra & dof & ((ndx != 0) | (ndy != 0))
        sh, sv, slh, slv = _tile_energy(A, 4, 4)
        tndc = (ndx + ndy + 1) >> 1
        cdir = (sh < 2 * sv) & (sv < 2 * sh)
        ndx_e = jnp.where(cdir & (ndx < amx), ndx >> 1, ndx)
        ndy_e = jnp.where(cdir & (ndy < amy), ndy >> 1, ndy)
        shl = jnp.where(slh > 128, 0, 128 - slh)
        svl = jnp.where(slv > 128, 0, 128 - slv)
        ix = jnp.minimum(amx, 32)
        iy = jnp.minimum(amy, 32)
        ttA = ((sh * (32 - iy) + shl * iy) + 16) >> 5
        ttA = ttA + (((sv * (32 - ix) + svl * ix) + 16) >> 5)
        ttA = (ttA + 1) >> 1
        ttA = jnp.where((ndx_e < amy) & (ndy_e < amx), 0, ttA)
        tt = jnp.where(cdir, ttA, (sh + sv + 1) >> 1)
        tt = (tt * tndc + 4) >> 3
        tt = (jnp.minimum(tt, fthresh) * fq) >> 12
        addx = (jnp.minimum(ndy_e, fthresh) * fq) >> 12
        addy = (jnp.minimum(ndx_e, fthresh) * fq) >> 12
        bv = (sh > 2 * sv) | (amy > 2 * amx)
        bh_ = ((sv > 2 * sh) | (amx > 2 * amy)) & ~bv
        mboth = ~bv & ~bh_
        teh2 = eh | eprm
        tev2 = ev | eprm
        A = _hfilt(A, 4, 4, teh2, tt + addx, tt,
                   mdf & (bh_ | mboth) & mh, ieh)
        A = _vfilt(A, 4, 4, tev2, tt + addy, tt,
                   mdf & (bv | mboth) & mv_, iev)
        # qpel diagonal sharpen (ref: bmc.c:595-601)
        qdiag = (((bmvx & 3) != 0) & ((bmvy & 3) != 0)
                 & (((bmvx | bmvy) & 1) != 0))
        msh = (mbase & ~intra & sharpen & qdiag
               & (amx < 8) & (amy < 8))
        A = _degrad(A, 4, 4, msh)
        return A

    out = _run_wavefront(lay, vis_u8.astype(jnp.int32), props_t, step)
    return out.astype(jnp.uint8)


@functools.lru_cache(maxsize=None)
def make_luma_filter(pw, ph, nbh, nbv, blk_w, blk_h, inter_sharpen):
    def f(vis, mvx, mvy, flags, submask, fq, fthresh, do_filter, tmc):
        return luma_filter_graph(pw, ph, nbh, nbv, blk_w, blk_h,
                                 inter_sharpen, vis, mvx, mvy, flags,
                                 submask, fq, fthresh, do_filter, tmc)
    return jax.jit(f)


# ---------------------------------------------------------------------------
# inter chroma filter (block-granular; ref: bmc.c:604-659)
# ---------------------------------------------------------------------------

def chroma_filter_graph(pw, ph, nbh, nbv, bw, bh, vis_u8,
                        mvx, mvy, flags, q):
    """Traced inter chroma filter. bw/bh: chroma block pixel dims."""
    if nbh <= 0 or nbv <= 0 or pw < 8 or ph < 8:
        return vis_u8
    lay = _layout(pw, ph, bw, bh, nbh, nbv)
    ndx_g, ndy_g = _neighbordif2_grids(mvx, mvy, flags)
    props_t = jnp.stack([mvx, mvy, flags, ndx_g, ndy_g])
    ith = jnp.clip((64 * q) >> 12, 2, 32)

    def step(A, pr, valid, i_arr, j_arr):
        bmvx, bmvy, fl, ndx, ndy = pr[0], pr[1], pr[2], pr[3], pr[4]
        skip = ((fl >> K.MV_BIT_SKIP) & 1) != 0
        intra = ((fl >> K.MV_BIT_INTRA) & 1) != 0
        mbase = valid & ~skip
        amx = jnp.abs(bmvx)
        amy = jnp.abs(bmvy)
        cz = (ndx < amy) & (ndy < amx)
        tx = jnp.where(cz, 0, (jnp.minimum(ndy, 64) * q) >> 12)
        ty = jnp.where(cz, 0, (jnp.minimum(ndx, 64) * q) >> 12)
        tx = jnp.where(intra, ith, tx)
        ty = jnp.where(intra, ith, ty)
        x0 = i_arr * bw
        y0 = j_arr * bh
        no_e = jnp.zeros_like(mbase)
        ieh = x0 < (pw - 8)
        iev = y0 < (ph - 8)
        ghx = mbase & (x0 >= 4) & (x0 <= pw - 4)
        gvy = mbase & (y0 >= 4) & (y0 <= ph - 4)
        for z in range(0, bh, 4):
            mz = ghx & (y0 + z + 4 < ph)
            A = _hfilt(A, 4 + z, 4, no_e, tx, tx, mz, ieh)
        for z in range(0, bw, 4):
            mz = gvy & (x0 + z + 4 < pw)
            A = _vfilt(A, 4, 4 + z, no_e, ty, ty, mz, iev)
        return A

    out = _run_wavefront(lay, vis_u8.astype(jnp.int32), props_t, step)
    return out.astype(jnp.uint8)


@functools.lru_cache(maxsize=None)
def make_chroma_filter(pw, ph, nbh, nbv, bw, bh):
    def f(vis, mvx, mvy, flags, q):
        return chroma_filter_graph(pw, ph, nbh, nbv, bw, bh, vis,
                                   mvx, mvy, flags, q)
    return jax.jit(f)
