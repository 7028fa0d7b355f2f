"""Multiresolution subband transform (analysis + synthesis) as integer JAX.

TPU-first recast of the reference transform (ref: src/sbt.c): each level's
separable lifting filter is vectorized across the perpendicular axis (every
row / column processed in parallel on the VPU), the Haar levels are pure
strided reshape arithmetic, and the per-level loop unrolls into a single XLA
program with static shapes. All arithmetic is int32 with C-exact truncating
division / arithmetic shifts, so results are bit-identical to the reference
on every backend.

Filter selection per level/plane/frame-type (ref: sbt.c:19-29, 862-885):
  L1   luma I  : ASF93 asymmetric 9/3 with ringing-adaptive low-pass
  L2A  luma I  : adaptive 5-tap standard/ringing pair + SHREX on highs
  LLI  luma I, level 4 / LLP luma P, level 4 : simple 3-tap, 5/2 & 4-or-2 scaling
  CC   chroma I, mid levels : 5-tap
  LOSSLESS : reversible 3-tap, no scaling, mid levels
  else : Haar (with overflow-safety divide at deep levels,
         and the gradient-nudging "filtered inverse" on synthesis)
"""
import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import jint
from ..core import intmath as im
from ..core import constants as K

# --- filter constants (wire format, ref: sbt.c:127-257) ---
CC0, CCS = 3, 4
CCA = 1 << (CCS - 1)
R20, R2S = 3, 3
R2A = 1 << (R2S - 1)
S20, S2S = 9, 5
S2A = 1 << (S2S - 1)
SHREX2 = 3
ASF_LPF = (46, 19, -8, -3, 1)      # center, +-1, +-2, +-3, +-4
ASF_LPF_R = (46, 20, -9, -4, 2)
ASF_HPA, ASF_HPB = 32, 16
ASFNORM = 6


class SbtCfg(NamedTuple):
    cw: int            # coefficient-plane width  (>= visible plane width)
    ch: int            # coefficient-plane height
    is_luma: bool
    isP: bool
    lossless: bool
    nbh: int           # block grid dims (for adaptive filters)
    nbv: int

    @property
    def lvls(self):
        return im.nlevels(self.cw, self.ch)


def _reflect(i, n):
    """ref: sbt.c:105-115 (called with n-1)."""
    i = np.abs(np.asarray(i))
    return np.where(i >= n, n + n - i, i)


# ---------------------------------------------------------------------------
# 1-D lifting steps, vectorized along the last axis of an (m, n) array.
# e = even samples (lows-to-be), o = odd samples (highs-to-be).
# ---------------------------------------------------------------------------

def _hi3_upd(e, n):
    """Update term for all floor(n/2) odd samples (ref: sbt.c:191-197)."""
    if n % 2:
        return (e[..., :-1] + e[..., 1:] + 1) >> 1
    if n == 2:
        return e[..., -1:]
    std = (e[..., :-1] + e[..., 1:] + 1) >> 1
    return jnp.concatenate([std, e[..., -1:]], axis=-1)


def _lo3_upd(o, n):
    """Update term for even samples; zero beyond last pair (ref: sbt.c:199-203)."""
    ne, no = n - n // 2, n // 2
    first = o[..., :1] >> 1
    parts = [first]
    if no > 1:
        parts.append((o[..., :-1] + o[..., 1:] + 2) >> 2)
    if ne > no:
        parts.append(jnp.zeros(o.shape[:-1] + (1,), o.dtype))
    return jnp.concatenate(parts, axis=-1)


@functools.lru_cache(maxsize=None)
def _lo5_idx(n):
    no = n // 2
    k = np.arange(1, no)
    il = _reflect(2 * k - 3, n - 1)
    ir = _reflect(2 * k + 3, n - 1)
    return (il - 1) // 2, (ir - 1) // 2


def _lo5_mid(o, n, c0, ca, cs):
    li, ri = _lo5_idx(n)
    no = n // 2
    ol = o[..., li]
    orr = o[..., ri]
    return (-ol + c0 * (o[..., 0:no - 1] + o[..., 1:no]) - orr + ca) >> cs


def _lo5_upd(o, n, c0, ca, cs):
    """5-tap low-pass update with edge reflection (ref: sbt.c:216-225)."""
    ne, no = n - n // 2, n // 2
    parts = [o[..., :1] >> 1]
    if no > 1:
        parts.append(_lo5_mid(o, n, c0, ca, cs))
    if ne > no:
        parts.append(jnp.zeros(o.shape[:-1] + (1,), o.dtype))
    return jnp.concatenate(parts, axis=-1)


def _lo5a_upd(o, n, ring):
    """Adaptive 5-tap: ringing coefs where the block is marked RINGING
    (ref: sbt.c:227-238). ring has shape (m, floor(n/2)-1)."""
    ne, no = n - n // 2, n // 2
    parts = [o[..., :1] >> 1]
    if no > 1:
        std = _lo5_mid(o, n, S20, S2A, S2S)
        rng = _lo5_mid(o, n, R20, R2A, R2S)
        parts.append(jnp.where(ring, rng, std))
    if ne > no:
        parts.append(jnp.zeros(o.shape[:-1] + (1,), o.dtype))
    return jnp.concatenate(parts, axis=-1)


def _interleave(e, o, n):
    out = jnp.zeros(e.shape[:-1] + (n,), e.dtype)
    out = out.at[..., 0::2].set(e)
    out = out.at[..., 1::2].set(o)
    return out


# --- forward/inverse scale pairs (C truncating division; ref: sbt.c:33-43) ---
_FS = {
    "52": lambda x: jint.divt(x * 5, 2), "i52": lambda x: jint.divt(x * 2, 5),
    "20": lambda x: x * 2, "i20": lambda x: jint.divt(x, 2),
    "30": lambda x: x * 3, "i30": lambda x: jint.divt(x, 3),
    "40": lambda x: x * 4, "i40": lambda x: jint.divt(x, 4),
    "no": lambda x: x, "ino": lambda x: x,
}


def _shrex_fwd(o):
    th = o * 3
    return th - (th >> SHREX2)


def _shrex_inv(x):
    th = jint.divt(x, 3)
    return th + (th >> SHREX2)


def _fwd_lift(x, n, lo_fn, scale_l, scale_h):
    out, _ = _fwd_lift2(x, n, lo_fn, scale_l, scale_h)
    return out


def _fwd_lift2(x, n, lo_fn, scale_l, scale_h):
    """Like _fwd_lift but also returns the post-lift UNSCALED odd samples
    (the reference mutates its temp buffer in place before SCALE_PACK, so
    temp row 1 after a column pass equals o[..., 0] — the value the
    degenerate sh==1 levels later read; see _filter_2d_fwd)."""
    e, o = x[..., 0::2], x[..., 1::2]
    o = o - _hi3_upd(e, n)
    e = e + lo_fn(o)
    return jnp.concatenate([scale_l(e), scale_h(o)], axis=-1), o


def _inv_lift(x, n, lo_fn, iscale_l, iscale_h):
    ne = n - n // 2
    e = iscale_l(x[..., :ne])
    o = iscale_h(x[..., ne:])
    e = e - lo_fn(o)
    o = o + _hi3_upd(e, n)
    return _interleave(e, o, n)


# --- ASF93 forward (L1, even n only; ref: sbt.c:384-421) ---

@functools.lru_cache(maxsize=None)
def _asf_idx(n):
    t = np.arange(0, n // 2 - 1)  # i = 2t+1, center c = i-1 = 2t
    d = np.arange(-4, 5)[:, None]
    return _reflect(2 * t[None, :] + d, n - 1)


def _fwd_l1(x, n, ring):
    """ring: (m, n//2 - 1) bool for loop positions t."""
    no = n // 2
    idx = _asf_idx(n)
    g = x[..., idx]  # (m, 9, no-1)

    def lpf(coefs):
        a, b, c, dd, e = coefs
        return (a * g[..., 4, :]
                + b * (g[..., 3, :] + g[..., 5, :])
                + c * (g[..., 2, :] + g[..., 6, :])
                + dd * (g[..., 1, :] + g[..., 7, :])
                + e * (g[..., 0, :] + g[..., 8, :]))

    L = jnp.where(ring, lpf(ASF_LPF_R), lpf(ASF_LPF))
    xi = x[..., 1:n - 2:2]
    H = ASF_HPA * xi - ASF_HPB * (x[..., 0:n - 3:2] + x[..., 2:n - 1:2])
    lows_mid = (L + (1 << (ASFNORM - 2))) >> (ASFNORM - 1)
    highs_mid = (H + (1 << (ASFNORM - 4))) >> (ASFNORM - 3)

    # edge lifting on the original samples (ref: sbt.c:406-420)
    x1 = x[..., 1:2] - ((x[..., 0:1] + x[..., 2:3] + 1) >> 1)
    xn3 = x[..., n - 3:n - 2] - ((x[..., n - 4:n - 3] + x[..., n - 2:n - 1] + 1) >> 1)
    xn1 = x[..., n - 1:n] - x[..., n - 2:n - 1]
    x0 = x[..., 0:1] + (x1 >> 1)
    xn2 = x[..., n - 2:n - 1] + ((xn3 + xn1 + 2) >> 2)

    lows = jnp.concatenate([x0 * 2, lows_mid[..., 1:], xn2 * 2], axis=-1)
    highs = jnp.concatenate([x1 * 4, highs_mid[..., 1:], xn1 * 4], axis=-1)
    assert lows.shape[-1] == no and highs.shape[-1] == no
    return jnp.concatenate([lows, highs], axis=-1)


# ---------------------------------------------------------------------------
# Haar quadrant levels (ref: sbt.c:546-612, 614-682, 684-795)
# ---------------------------------------------------------------------------

def _haar_fwd(sub, hs, ws, ovf):
    he, we = hs // 2, ws // 2
    hc, wc = hs - he, ws - we
    x0 = sub[0::2, 0::2]
    x1 = sub[0::2, 1::2]
    x2 = sub[1::2, 0::2]
    x3 = sub[1::2, 1::2]
    x0m = x0[:he, :we]
    x1m = x1[:he, :]
    x2m = x2[:, :we]

    ll = x0m + x1m + x2m + x3
    lh = x0m - x1m + x2m - x3
    hl = x0m + x1m - x2m - x3
    hh = x0m - x1m - x2m + x3
    if wc > we:  # odd width column
        ll = jnp.concatenate([ll, 2 * (x0[:he, we:] + x2[:, we:])], axis=1)
        hl = jnp.concatenate([hl, 2 * (x0[:he, we:] - x2[:, we:])], axis=1)
    if hc > he:  # odd height row
        llr = 2 * (x0[he:, :we] + x1[he:, :])
        lhr = 2 * (x0[he:, :we] - x1[he:, :])
        if wc > we:
            llr = jnp.concatenate([llr, 4 * x0[he:, we:]], axis=1)
        ll = jnp.concatenate([ll, llr], axis=0)
        lh = jnp.concatenate([lh, lhr], axis=0)
    if ovf:
        ll = jint.divt(ll, 2)
    top = jnp.concatenate([ll, lh], axis=1)
    bot = jnp.concatenate([hl, hh], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _haar_quads(sub, hs, ws, ovf):
    he, we = hs // 2, ws // 2
    hc, wc = hs - he, ws - we
    ll = sub[:hc, :wc] * (1 << ovf)
    lh = sub[:hc, wc:]
    hl = sub[hc:, :wc]
    hh = sub[hc:, wc:]
    return ll, lh, hl, hh, he, we, hc, wc


def _haar_recombine(ll, lh, hl, hh, hs, ws, he, we, hc, wc):
    # zero-pad quadrants to (hc, wc); odd row/col formulas then fall out
    if wc > we:
        zc = jnp.zeros((lh.shape[0], 1), lh.dtype)
        lh = jnp.concatenate([lh, zc], axis=1)
        hh = jnp.concatenate([hh, jnp.zeros((hh.shape[0], 1), hh.dtype)], axis=1)
    if hc > he:
        hl = jnp.concatenate([hl, jnp.zeros((1, wc), hl.dtype)], axis=0)
        hh = jnp.concatenate([hh, jnp.zeros((1, wc), hh.dtype)], axis=0)
    a = jint.divt(ll + lh + hl + hh, 4)
    b = jint.divt(ll - lh + hl - hh, 4)[:, :we]
    c = jint.divt(ll + lh - hl - hh, 4)[:he, :]
    d = jint.divt(ll - lh - hl + hh, 4)[:he, :we]
    out = jnp.zeros((hs, ws), ll.dtype)
    out = out.at[0::2, 0::2].set(a)
    out = out.at[0::2, 1::2].set(b)
    out = out.at[1::2, 0::2].set(c)
    out = out.at[1::2, 1::2].set(d)
    return out


def _haar_inv_simple(sub, hs, ws, ovf):
    ll, lh, hl, hh, he, we, hc, wc = _haar_quads(sub, hs, ws, ovf)
    return _haar_recombine(ll, lh, hl, hh, hs, ws, he, we, hc, wc)


def _nudge(center, lp, ln, hf, hqp):
    """Gradient-consistency nudge of an HF coef (ref: sbt.c:723-741)."""
    mx = center - ln
    mn = lp - center
    # after the reference's ordering swap: lower = min(max(mn,mx), 0),
    # upper = max(min(mn,mx), 0)
    lo = jnp.minimum(jnp.maximum(mn, mx), 0)
    hi = jnp.maximum(jnp.minimum(mn, mx), 0)
    t = jint.round4(lp - ln)
    nud = jint.round2(jnp.clip(t, lo, hi) - hf * 2)
    upd = hf + jnp.clip(nud, -hqp, hqp)
    return jnp.where(lo != hi, upd, hf)


def _haar_inv_filtered(x, hs, ws, ovf, hqp):
    """Haar filtered inverse: nudges LH along x-gradients of LL and HL along
    y-gradients before recombination (ref: sbt.c:686-795). Neighbor reads
    intentionally cross the subband boundary exactly like the reference's
    flat-memory indexing does."""
    sub = x[:hs, :ws]
    ll, lh, hl, hh, he, we, hc, wc = _haar_quads(sub, hs, ws, ovf)
    if we > 0 and he > 0:
        # horizontal pass on LH (main region rows :he, cols 1..we-1)
        llm = ll[:he, :we]
        # neighbors from raw memory layout (may read first LH/HL element)
        lp = sub[:he, 0:we - 1] * (1 << ovf)          # spLL[idx-1], idx=1..we-1
        ln = sub[:he, 2:we + 1] * (1 << ovf)          # spLL[idx+1]
        lh_main = lh[:he, :we]
        upd = _nudge(llm[:, 1:], lp, ln, lh_main[:, 1:], hqp)
        lh = lh.at[:he, 1:we].set(upd)
        # vertical pass on HL (rows 1..he-1, all cols :we)
        if he > 1:
            hlm = hl[:he, :we]
            lpv = sub[0:he - 1, :we] * (1 << ovf)
            lnv = sub[2:he + 1, :we] * (1 << ovf)
            updv = _nudge(llm[1:, :], lpv, lnv, hlm[1:, :], hqp)
            hl = hl.at[1:he, :we].set(updv)
    return _haar_recombine(ll, lh, hl, hh, hs, ws, he, we, hc, wc)


# ---------------------------------------------------------------------------
# Per-level plans
# ---------------------------------------------------------------------------

def _kind(cfg, l):
    lvls = cfg.lvls
    if cfg.lossless:
        return "lossless" if 1 <= l <= lvls - 2 else "haar"
    if cfg.is_luma and not cfg.isP and l == 4:
        return "lli"
    if cfg.is_luma and cfg.isP and l == 4:
        return "llp"
    if not cfg.is_luma and not cfg.isP and 1 <= l <= lvls - 2:
        return "cc"
    if cfg.is_luma and not cfg.isP and l == 2:
        return "l2a"
    if cfg.is_luma and not cfg.isP and l == 1:
        return "l1"
    return "haar"


def _ovf(cfg, l):
    return int(l >= 6 and l >= cfg.lvls - 3 and not cfg.lossless)


_LIFT = {
    # kind -> (lo_fn_builder, scaleL, scaleH, iscaleL, iscaleH)
    "lli": (lambda n: lambda o: _lo3_upd(o, n), "52", "40"),
    "llp": (lambda n: lambda o: _lo3_upd(o, n), "52", "20"),
    "cc": (lambda n: lambda o: _lo5_upd(o, n, CC0, CCA, CCS), "20", "no"),
    "lossless": (lambda n: lambda o: _lo3_upd(o, n), "no", "no"),
}


@functools.lru_cache(maxsize=None)
def _ring_idx(nb_perp, nb_along, s_perp, s_along):
    """Static gather indices stretching the block grid over a sub-image:
    perpendicular (per processed row) and along (per filter position)
    (ref: sbt.c:474-521, fixed point DSV_BLOCK_INTERP_P)."""
    d_perp = (nb_perp << K.BLOCK_INTERP_P) // s_perp
    d_along = (nb_along << K.BLOCK_INTERP_P) // s_along
    rows = (np.arange(s_perp) * d_perp) >> K.BLOCK_INTERP_P
    npos = max(s_along // 2 - 1, 0)
    cols = (np.arange(npos) * 2 * d_along) >> K.BLOCK_INTERP_P
    return rows, cols


def _ring_mask(blockdata, cfg, sw, sh, axis):
    """Ringing-block mask (m, npos) for a row (axis=1) or column (axis=0)
    filter pass."""
    if axis == 1:   # filtering along x; one line per row j
        rows, cols = _ring_idx(cfg.nbv, cfg.nbh, sh, sw)
        m = blockdata[rows[:, None], cols[None, :]]
    else:           # filtering along y; one line per column i
        rows, cols = _ring_idx(cfg.nbh, cfg.nbv, sw, sh)
        m = blockdata[cols[None, :], rows[:, None]]
    return (m & K.IS_RINGING) != 0


def _filter_2d_fwd(x, cfg, l, kind, blockdata, carry=None):
    """One fwd_2d level. `carry` models the reference's temp-buffer row 1
    (ref: sbt.c:449-459 fwd_2d over a shared scratch): at degenerate
    levels (sub height 1, reachable for CC/lossless when the aspect ratio
    is extreme) the n==1 low-pass update `v[0] += v[s] >> 1` reads the
    scratch row the LAST level with sub height >= 2 left behind — that
    deterministic staleness is part of the bitstream (sbt.c:199-225).
    Likewise a sub width of 1 reads the coefficient buffer's column 1.
    Returns (x, carry)."""
    w, h = cfg.cw, cfg.ch
    sw, sh = im.round_shift(w, l - 1), im.round_shift(h, l - 1)
    sub = x[:sh, :sw]

    def run(arr, n, axis, want_o=False):
        if kind == "l1":
            ring = _ring_mask(blockdata, cfg, sw, sh, axis)
            return _fwd_l1(arr, n, ring)
        if kind == "l2a":
            ring = _ring_mask(blockdata, cfg, sw, sh, axis)
            lo = lambda o: _lo5a_upd(o, n, ring)
            return _fwd_lift(arr, n, lo, _FS["20"], _shrex_fwd)
        lo_b, sl, shh = _LIFT[kind]
        if want_o:
            return _fwd_lift2(arr, n, lo_b(n), _FS[sl], _FS[shh])
        return _fwd_lift(arr, n, lo_b(n), _FS[sl], _FS[shh])

    scale_l = _FS[_LIFT[kind][1]] if kind in _LIFT else None
    if sw == 1:
        # row pass n==1: v[0] += coef[j][1] >> 1 then scaleL (the read is
        # from the coefficient buffer, one past the sub-image)
        nb = (x[:sh, 1] >> 1) if w > 1 else jnp.int32(0)
        r = scale_l(sub[:, 0] + nb)[:, None]
    else:
        r = run(sub, sw, axis=1)

    if sh == 1:
        # column pass n==1: lift against the stale scratch row 1, scaleL;
        # the carry itself is NOT rewritten (row passes at sub height 1
        # only touch scratch row 0)
        st = carry[:sw] if carry is not None else jnp.int32(0)
        out = scale_l(r[0] + (st >> 1))[None, :]
    else:
        out, o_col = run(r.T, sh, axis=0, want_o=True) if kind in _LIFT \
            else (run(r.T, sh, axis=0), None)
        out = out.T
        if carry is not None and o_col is not None:
            # scratch row 1 after this level's column lifts (pre-scale)
            carry = carry.at[:sw].set(o_col[..., 0])
    return x.at[:sh, :sw].set(out), carry


def _filter_2d_inv(x, cfg, l, kind, blockdata, stale=None, want_tmp=False):
    """One inv_2d level. `stale` models the reference's scratch row 1 at
    this point of the inverse (ref: sbt.c:461-473): the inverse runs
    levels high-to-low, so its degenerate (sub height 1) levels run FIRST
    and read whatever the preceding transform left in scratch row 1 — the
    forward pass of the same plane for the encoder's in-loop inverse, the
    previous plane/frame for a standalone decode (see decoder arena)."""
    w, h = cfg.cw, cfg.ch
    sw, sh = im.round_shift(w, l - 1), im.round_shift(h, l - 1)
    sub = x[:sh, :sw]

    def run(arr, n, axis):
        if kind == "l1":
            return _inv_lift(arr, n, lambda o: _lo3_upd(o, n),
                             _FS["i20"], _FS["i40"])
        if kind == "l2a":
            ring = _ring_mask(blockdata, cfg, sw, sh, axis)
            lo = lambda o: _lo5a_upd(o, n, ring)
            return _inv_lift(arr, n, lo, _FS["i20"], _shrex_inv)
        lo_b, sl, shh = _LIFT[kind]
        return _inv_lift(arr, n, lo_b(n), _FS["i" + sl], _FS["i" + shh])

    iscale_l = _FS["i" + _LIFT[kind][1]] if kind in _LIFT else None
    if sh == 1:
        # column pass n==1: out[0] = iscaleL(in[0]) - stale >> 1
        st = stale[:sw] if stale is not None else jnp.int32(0)
        c = (iscale_l(sub[0]) - (st >> 1))[None, :]
    else:
        c = run(sub.T, sh, axis=0).T
    if sw == 1:
        # row pass n==1: the low-pass update reads the coefficient
        # buffer's column 1 (still the untouched higher-frequency coef)
        nb = (x[:sh, 1] >> 1) if w > 1 else jnp.int32(0)
        out = (iscale_l(c[:, 0]) - nb)[:, None]
    else:
        out = run(c, sw, axis=1)
    x = x.at[:sh, :sw].set(out)
    if want_tmp:
        return x, c
    return x, None


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------

def degenerate(cfg: SbtCfg):
    """True when some non-Haar level has a 1-px sub dimension, so the
    reference's scratch-row-1 / coef-column-1 reads become reachable
    (extreme aspect ratios; see _filter_2d_fwd). Such planes need the
    fwd carry threaded into the in-loop inverse (make_*_sbt_carry)."""
    for l in range(1, cfg.lvls + 1):
        if _kind(cfg, l) == "haar":
            continue
        if (im.round_shift(cfg.cw, l - 1) == 1
                or im.round_shift(cfg.ch, l - 1) == 1):
            return True
    return False


def _fwd_graph(cfg, x, blockdata):
    x = x.astype(jnp.int32)
    carry = jnp.zeros((cfg.cw,), jnp.int32)
    for l in range(1, cfg.lvls + 1):
        kind = _kind(cfg, l)
        if kind == "haar":
            sw = im.round_shift(cfg.cw, l - 1)
            sh = im.round_shift(cfg.ch, l - 1)
            x = x.at[:sh, :sw].set(
                _haar_fwd(x[:sh, :sw], sh, sw, _ovf(cfg, l)))
        else:
            x, carry = _filter_2d_fwd(x, cfg, l, kind, blockdata, carry)
    return x, carry


def _inv_graph(cfg, x, blockdata, q, stale, want_tmp=False):
    x = x.astype(jnp.int32)
    tmp_l1 = None
    for l in range(cfg.lvls, 0, -1):
        kind = _kind(cfg, l)
        ovf = _ovf(cfg, l)
        if kind == "haar":
            sw = im.round_shift(cfg.cw, l - 1)
            sh = im.round_shift(cfg.ch, l - 1)
            if cfg.lossless or (not cfg.is_luma and cfg.isP):
                out = _haar_inv_simple(x[:sh, :sw], sh, sw, ovf)
            else:
                if cfg.is_luma:
                    hqp = q // (14 if cfg.isP else (2 if l > 4 else 8))
                else:
                    hqp = q // 2
                out = _haar_inv_filtered(x, sh, sw, ovf, hqp)
            x = x.at[:sh, :sw].set(out)
            if l == 1:
                tmp_l1 = out  # the reference's Haar inverse writes its
                # scratch with the recombined sub-image before cpysub
        else:
            x, c = _filter_2d_inv(x, cfg, l, kind, blockdata, stale,
                                  want_tmp=(l == 1))
            if l == 1:
                tmp_l1 = c   # post-column-pass scratch rows
    if want_tmp:
        return x, tmp_l1
    return x


@functools.lru_cache(maxsize=None)
def make_fwd_sbt(cfg: SbtCfg):
    """Returns jitted (x_int32[ch,cw], blockdata_uint8[nbv,nbh]) -> coefs."""
    return jax.jit(lambda x, blockdata: _fwd_graph(cfg, x, blockdata)[0])


@functools.lru_cache(maxsize=None)
def make_fwd_sbt_carry(cfg: SbtCfg):
    """Like make_fwd_sbt but also returns the scratch-row-1 carry the
    in-loop inverse of a degenerate plane must consume."""
    return jax.jit(lambda x, blockdata: _fwd_graph(cfg, x, blockdata))


@functools.lru_cache(maxsize=None)
def make_inv_sbt(cfg: SbtCfg):
    """Returns jitted (coefs_int32, blockdata, q_int32) -> pixel-domain
    (still centered; add 128 + clamp separately). For degenerate planes
    this assumes a zero scratch row — encoder in-loop callers must use
    make_inv_sbt_stale with the fwd carry instead."""
    return jax.jit(lambda x, blockdata, q: _inv_graph(cfg, x, blockdata,
                                                      q, None))


@functools.lru_cache(maxsize=None)
def make_inv_sbt_stale(cfg: SbtCfg):
    """Inverse taking the scratch-row-1 state (cw,) int32 — the fwd carry
    for the encoder's in-loop inverse, or the decoder arena's row."""
    return jax.jit(lambda x, blockdata, q, stale: _inv_graph(
        cfg, x, blockdata, q, stale))


@functools.lru_cache(maxsize=None)
def make_inv_sbt_arena(cfg: SbtCfg):
    """Inverse for the standalone decoder: takes the scratch row-1 state
    and ALSO returns the level-1 scratch content (ch, cw) the reference
    leaves behind — the decoder arena overlays it at this plane's flat
    offset so later planes/frames read the right staleness."""
    return jax.jit(lambda x, blockdata, q, stale: _inv_graph(
        cfg, x, blockdata, q, stale, want_tmp=True))


def p2sbc(plane_u8):
    """Pixels to centered coefs (ref: sbt.c:797-813)."""
    return plane_u8.astype(jnp.int32) - 128


def sbc2p(coefs):
    """Coefs to clamped pixels (ref: sbt.c:815-831)."""
    return jnp.clip(coefs + 128, 0, 255).astype(jnp.uint8)
