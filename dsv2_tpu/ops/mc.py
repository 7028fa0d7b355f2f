"""Block motion compensation as per-pixel gather programs (device).

The reference compensates block-by-block with scalar loops
(ref: src/bmc.c:661-923). Here every output pixel computes its own source
coordinates from the broadcast MV field and gathers what it needs — the
quarter-pel two-pass 4-tap filter becomes 16 gathers + VPU arithmetic over
the whole plane at once, intra DC fills become block-window reductions, and
mode selection is a per-pixel select over the variants. Reconstruct /
subtract are elementwise with per-block flag maps.
"""
import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import constants as K

B = K.FRAME_BORDER


class McCfg(NamedTuple):
    w: int            # visible plane dims
    h: int
    bw: int           # block dims in this plane
    bh: int
    nbh: int
    nbv: int
    sh: int           # chroma shifts (0 for luma)
    sv: int
    is_luma: bool
    lossless: bool

    @property
    def gw(self):
        return self.nbh * self.bw

    @property
    def gh(self):
        return self.nbv * self.bh


@functools.lru_cache(maxsize=None)
def _grids(cfg):
    jj = np.repeat(np.arange(cfg.nbv), cfg.bh)
    ii = np.repeat(np.arange(cfg.nbh), cfg.bw)
    ly = (np.arange(cfg.gh) % cfg.bh)
    lx = (np.arange(cfg.gw) % cfg.bw)
    return jj, ii, ly, lx


def _bcast(m, cfg):
    """(nbv, nbh) per-block map -> (gh, gw) per-pixel map."""
    jj, ii, _, _ = _grids(cfg)
    return m[jj][:, ii]


def _gather(ref, by, bx):
    """Clamped gather from the bordered plane; int32 out."""
    by = jnp.clip(by, 0, ref.shape[0] - 1)
    bx = jnp.clip(bx, 0, ref.shape[1] - 1)
    return ref[by, bx].astype(jnp.int32)


def _hpf_a(a, b, c, d):
    return 19 * (b + c) - 3 * (a + d)


def _hpf_b(a, b, c, d):
    return 20 * (b + c) - 4 * (a + d)


_BF_SHIFT = K.HP_SHF + 1      # 6
_BF_MULADD = 1 << K.HP_SHF    # 32


def _qp_blend(f, b, c, phase):
    """Quarter-pel linear blend (ref: bmc.c:700-723)."""
    phase = jnp.broadcast_to(phase, f.shape)
    cases = [
        (_BF_MULADD * 2 * b + _BF_MULADD) >> _BF_SHIFT,
        (f + _BF_MULADD * b + _BF_MULADD) >> _BF_SHIFT,
        (f * 2 + _BF_MULADD) >> _BF_SHIFT,
        (f + _BF_MULADD * c + _BF_MULADD) >> _BF_SHIFT,
    ]
    return jax.lax.select_n(phase, *cases)


def _win_gather(ref, offy, offx, wh, ww):
    """One gather of per-block (wh, ww) windows: out[j, i, r, c] =
    ref[clip(offy[j,i] + r), clip(offx[j,i] + c)] — the per-tap clamped
    gathers collapse into a single canvas because MV offsets are constant
    per block, so every tap is a STATIC slice of the canvas. Gather
    volume drops from one plane per tap to wh*ww/(bh*bw) planes total."""
    ry = jnp.clip(offy[:, :, None] + jnp.arange(wh, dtype=jnp.int32),
                  0, ref.shape[0] - 1)
    rx = jnp.clip(offx[:, :, None] + jnp.arange(ww, dtype=jnp.int32),
                  0, ref.shape[1] - 1)
    return ref[ry[:, :, :, None], rx[:, :, None, :]].astype(jnp.int32)


def _blocks_to_plane(bk, cfg):
    """(nbv, nbh, bh, bw) block tensor -> (gh, gw) plane."""
    return bk.transpose(0, 2, 1, 3).reshape(cfg.gh, cfg.gw)


@functools.lru_cache(maxsize=None)
def make_predict(cfg: McCfg):
    """Returns jitted (ref_bordered_u8, mvx, mvy, flags, submask, dc, tmc)
    -> prediction canvas (gh, gw) uint8. MV maps are (nbv, nbh) int32."""
    jj, ii, ly, lx = _grids(cfg)
    ibase = np.arange(cfg.nbh) * cfg.bw
    jbase = np.arange(cfg.nbv) * cfg.bh
    limx = cfg.w - cfg.bw + B - 1
    limy = cfg.h - cfg.bh + B - 1
    sbw, sbh = cfg.bw // 2, cfg.bh // 2
    # chroma fractional setup (ref: bmc.c:771-812)
    hbits, vbits = 2 + cfg.sh, 2 + cfg.sv
    hf, vf = 1 << hbits, 1 << vbits
    sf = hbits + vbits
    af = 1 << (sf - 1)
    qidx = ((ly >= sbh).astype(np.int32)[:, None] * 2
            + (lx >= sbw).astype(np.int32)[None, :])

    def f(ref, mvx, mvy, flags, submask, dc, tmc):
        pxb = ibase[None, :] + (mvx >> (2 + cfg.sh))
        pyb = jbase[:, None] + (mvy >> (2 + cfg.sv))
        # whole-pel / intra-copy source offsets (ref: bmc.c:850-851, 905-906)
        offx_w = jnp.clip(pxb, -B, limx) + B
        offy_w = jnp.clip(pyb, -B, limy) + B
        bb = lambda m: m[:, :, None, None]  # per-block -> block-tensor bcast

        if cfg.is_luma:
            wins = _win_gather(ref, offy_w, offx_w, cfg.bh, cfg.bw)
            wholepel = _blocks_to_plane(wins, cfg)
            # subpel two-pass 4-tap + quarter-pel blend (ref: bmc.c:661-769)
            offx_s = jnp.clip(pxb - 1, -B, limx) + B
            offy_s = jnp.clip(pyb - 1, -B, limy) + B
            C = _win_gather(ref, offy_s, offx_s, cfg.bh + 3, cfg.bw + 3)
            large = (jnp.abs(mvx) >= 8) | (jnp.abs(mvy) >= 8)
            dxp = mvx & 3
            dyp = mvy & 3
            tmc_odd = (tmc & 1) != 0
            dqtx = bb(large | ((dxp & 1) == 0) | tmc_odd)
            dqty = bb(large | ((dyp & 1) == 0) | tmc_odd)
            rows = []
            for t in range(4):
                a, b, c, d = (C[:, :, t:t + cfg.bh, k:k + cfg.bw]
                              for k in range(4))
                fv = jnp.where(dqtx, _hpf_a(a, b, c, d), _hpf_b(a, b, c, d))
                rows.append(_qp_blend(fv, b, c, bb(dxp)))
            fv = jnp.where(dqty,
                           _hpf_a(rows[0], rows[1], rows[2], rows[3]),
                           _hpf_b(rows[0], rows[1], rows[2], rows[3]))
            subpel = jnp.clip(_qp_blend(fv, rows[1], rows[2], bb(dyp)),
                              0, 255)
            is_subpel = bb(((mvx | mvy) & 3) != 0)
            inter = _blocks_to_plane(jnp.where(is_subpel, subpel, wins), cfg)
        else:
            C = _win_gather(ref, offy_w, offx_w, cfg.bh + 1, cfg.bw + 1)
            wins = C[:, :, :cfg.bh, :cfg.bw]
            wholepel = _blocks_to_plane(wins, cfg)
            dxc = mvx & (hf - 1)
            dyc = mvy & (vf - 1)
            f0 = (hf - dxc) * (vf - dyc)
            f1 = dxc * (vf - dyc)
            f2 = (hf - dxc) * dyc
            f3 = dxc * dyc
            p00 = wins
            p01 = C[:, :, :cfg.bh, 1:cfg.bw + 1]
            p10 = C[:, :, 1:cfg.bh + 1, :cfg.bw]
            p11 = C[:, :, 1:cfg.bh + 1, 1:cfg.bw + 1]
            inter = _blocks_to_plane(
                (bb(f0) * p00 + bb(f1) * p01 + bb(f2) * p10
                 + bb(f3) * p11 + af) >> sf, cfg)

        intra_b = (flags & (1 << K.MV_BIT_INTRA)) != 0

        # intra fills (ref: bmc.c:845-900) — windows ARE the whole-pel
        # canvas blocks (same clamped offsets), so no extra gather
        full_avg = wins.sum(axis=(-1, -2)) // (cfg.bw * cfg.bh)
        q_avgs = []
        for g in (0, sbh):
            for fx in (0, sbw):
                q = wins[:, :, g:g + sbh, fx:fx + sbw]
                q_avgs.append(q.sum(axis=(-1, -2)) // (sbw * sbh))
        q_avg = jnp.stack(q_avgs, axis=0)  # (4, nbv, nbh)

        has_dc = (dc != 0) if cfg.is_luma else jnp.zeros_like(dc, bool)
        dc_val = dc & 0xFF
        fill_all = jnp.where(has_dc, dc_val, full_avg)
        fill_q = jnp.where(has_dc[None], dc_val[None], q_avg)

        fill_q_pix = _bcast_q(fill_q, cfg, qidx)
        qbit = jnp.left_shift(1, qidx)  # static per-pixel quadrant bit
        qmask_pix = (_bcast(submask, cfg) & qbit) != 0
        all_intra = _bcast(submask == K.MASK_ALL_INTRA, cfg)
        intra_pix = jnp.where(
            all_intra, _bcast(fill_all, cfg),
            jnp.where(qmask_pix, fill_q_pix, wholepel))

        out = jnp.where(_bcast(intra_b, cfg), intra_pix, inter)
        return out.astype(jnp.uint8)

    return jax.jit(f)


def _bcast_q(q_avg, cfg, qidx):
    """(4, nbv, nbh) per-quadrant map -> per-pixel via quadrant index."""
    jj, ii, _, _ = _grids(cfg)
    per_pix = q_avg[:, jj][:, :, ii]  # (4, gh, gw)
    return jnp.take_along_axis(per_pix, qidx[None], axis=0)[0]


@functools.lru_cache(maxsize=None)
def make_subtract(cfg: McCfg):
    """res' = f(res, pred) with per-block modes (ref: bmc.c:989-1055)."""

    def f(res, pred, flags):
        r = res.astype(jnp.int32)
        p = pred.astype(jnp.int32)
        if cfg.lossless:
            return ((r - p + 128) & 0xFF).astype(jnp.uint8)
        intra = (flags & (1 << K.MV_BIT_INTRA)) != 0
        skip = (flags & (1 << K.MV_BIT_SKIP)) != 0
        noxmit = (flags & (1 << (K.MV_BIT_NOXMITY if cfg.is_luma
                                 else K.MV_BIT_NOXMITC))) != 0
        eprm = (flags & (1 << K.MV_BIT_EPRM)) != 0
        zero_b = _bcast(~intra & (skip | noxmit), cfg)
        eprm_p = _bcast(eprm, cfg)
        normal = jnp.clip(r - p + 128, 0, 255)
        halved = jnp.clip((r - p + 256) >> 1, 0, 255)
        out = jnp.where(zero_b, 128, jnp.where(eprm_p, halved, normal))
        return out.astype(jnp.uint8)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def make_reconstruct(cfg: McCfg):
    """out = g(pred, res) with per-block modes (ref: bmc.c:925-987)."""

    def f(res, pred, flags):
        r = res.astype(jnp.int32)
        p = pred.astype(jnp.int32)
        if cfg.lossless:
            return ((p + r - 128) & 0xFF).astype(jnp.uint8)
        intra = (flags & (1 << K.MV_BIT_INTRA)) != 0
        skip = (flags & (1 << K.MV_BIT_SKIP)) != 0
        eprm = (flags & (1 << K.MV_BIT_EPRM)) != 0
        use_eprm = _bcast(eprm & ~(~intra & skip), cfg)
        normal = jnp.clip(p + r - 128, 0, 255)
        doubled = jnp.clip(p + (r - 128) * 2, 0, 255)
        return jnp.where(use_eprm, doubled, normal).astype(jnp.uint8)

    return jax.jit(f)
