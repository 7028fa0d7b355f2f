"""Gang-packed Pallas wave-HME: G diagonal blocks per 128-lane vector row.

The per-block Pallas kernel (ops/hme_pallas) runs one block per scalar
loop iteration; its (16, 16) int32 window metrics occupy 2 vregs at 12.5%
lane utilization. Here G = 128 // blk_w blocks of the same anti-diagonal
are packed side by side along the lane axis, so every elementwise metric
step processes the whole gang in the same 2 vregs:

- per-lane control flow stays SCALAR (the same decision code as the
  per-block kernel, Python-unrolled per lane) -> byte-equal trivially;
- window reads ride the per-block reader's aligned-overfetch + rotate,
  with the gang column offset folded into the lane rotate (no extra
  shuffles) and an 8-way select merge;
- scalar -> vector crossings are free (splat via select chain); vector ->
  scalar crossings are masked modular reductions (int32 wraparound sums
  are order-independent, so ganged sums equal the per-block sums bit for
  bit);
- guards (good-enough / skip / invalid) become gang-level lax.cond on the
  OR of the lanes, masked per lane inside - value-identical to the
  per-block lax.cond by the same argument as hme_wave.guard.

Byte-identical to ops/hme_wave, ops/hme_pallas and ops/hme_search.
(ref: src/hme.c:1373-1630 refine_level, :2001-2016 dsv_hme)
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as K
from ..core.frame import B
from . import jint
from . import hme_wave as hw
from . import hme_pallas as hp

I32MAX = hw.I32MAX
LW = 128           # gang vector width (one vreg row of int32 lanes)


# ---------------------------------------------------------------------------
# gang primitives
# ---------------------------------------------------------------------------

def _iotas(h):
    lane = jax.lax.broadcasted_iota(jnp.int32, (h, LW), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, LW), 0)
    return lane, row


def splat(vals, w):
    """Per-lane scalars -> (1, LW) vector, value v[g] on group g's lanes."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LW), 1) // w
    acc = jnp.zeros((1, LW), jnp.int32)
    for g, v in enumerate(vals):
        acc = jnp.where(lane == g, v, acc)
    return acc


def gsum(t, w, g):
    """Group g's masked modular int32 sum of (h, LW) t -> rank-0 int32."""
    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) // w
    return jnp.where(lane == g, t.astype(jnp.int32), 0).sum()


def gsum_rows(t, w):
    """Row-reduced (1, LW) partial for per-group extraction by gsum."""
    return t.astype(jnp.int32).sum(axis=0, keepdims=True)


def gwindow(plane, xs, ys, h, w):
    """Gang window read: lane g's (h, w) window at (xs[g], ys[g]) lands on
    columns [g*w, (g+1)*w) of an (h, LW) int32 array. Same aligned
    overfetch + rotate as hme_pallas._reader with the gang column offset
    folded into the lane rotate."""
    hp_, wp = plane.shape
    sub = 32 if plane.dtype == jnp.uint8 else 8
    oh = -(-(h + sub - 1) // sub) * sub
    ow = -(-(w + 127) // 128) * 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (h, LW), 1) // w
    acc = jnp.zeros((h, LW), jnp.int32)
    narrow = plane.dtype == jnp.uint8 and hp._ROLL_NARROW
    for g, (x, y) in enumerate(zip(xs, ys)):
        yy = jnp.clip(y + B, 0, hp_ - h)
        xx = jnp.clip(x + B, 0, wp - w)
        ya = pl.multiple_of(jnp.minimum((yy // sub) * sub, hp_ - oh), sub)
        xa = pl.multiple_of(jnp.minimum((xx // 128) * 128, wp - ow), 128)
        big = plane[pl.ds(ya, oh), pl.ds(xa, ow)]
        if narrow:
            # Mosaic only lowers 32-bit dynamic rotates: rows realign
            # narrow via the i32-bitcast funnel, lanes after widening
            # the h live rows (see hme_pallas.roll_rows_u8).
            big = hp.roll_rows_u8(big, yy - ya)
            big = big[:h].astype(jnp.int32)
            big = pltpu.roll(big, (g * w - (xx - xa)) % ow, 1)
        else:
            big = big.astype(jnp.int32)
            big = pltpu.roll(big, (-(yy - ya)) % oh, 0)
            big = pltpu.roll(big, (g * w - (xx - xa)) % ow, 1)
            big = big[:h]
        acc = jnp.where(lane == g, big[:, :LW], acc)
    return acc


# ---------------------------------------------------------------------------
# gang metrics (ganged twins of hme_wave's masked metrics; the reduction
# to per-lane scalars happens via gsum, bit-equal to the per-block sums)
# ---------------------------------------------------------------------------

def _gang_mask(h, w, bwv, bhv):
    lane, row = _iotas(h)
    return ((lane % w) < bwv) & (row < bhv)


def _gang_lat_mask(h, w, bwv, bhv):
    """hme_wave._lat_mask with s=1 on gang columns."""
    lane, row = _iotas(h)
    col = lane % w
    return ((row % 2 == 0) & (col % 2 == 0)
            & (row < ((bhv // 2) * 2)) & (col < ((bwv // 2) * 2)))


def _roll(a, shift, axis):
    return pltpu.roll(a, shift % a.shape[axis], axis)


def _uavg4_lat(x):
    xr = x + _roll(x, -1, 1)
    return ((xr + _roll(xr, -1, 0)) + 2) >> 2


def _tex_lat(x):
    r1 = _roll(x, -1, 1)
    r0 = _roll(x, -1, 0)
    r01 = _roll(r0, -1, 1)
    return (jnp.abs(x - r1) + jnp.abs(r1 - r0) + jnp.abs(r0 - r01)
            + jnp.abs(r01 - x) + 2) >> 2


def gang_sse(a, b, w, bws, bhs):
    """Per-lane masked_sse scalars for a gang (ref: hme.c:198-242)."""
    h = a.shape[0]
    m = _gang_mask(h, w, splat(bws, w), splat(bhs, w))
    d = jnp.where(m, a - b, 0)
    rows = gsum_rows(d * d, w)
    out = []
    for g, (bw, bh) in enumerate(zip(bws, bhs)):
        acc = gsum(rows, w, g)
        out.append(jnp.where((bw == 0) | (bh == 0), I32MAX, acc))
    return out


def gang_metr_acc_rows(a, b, w, bws, bhs, ews, tws, aws):
    """Row-reduced (1, LW) metric accumulator (ref: hme.c:126-196).
    ew/tw/aw are per-lane dynamic shifts -> splat vectors."""
    h = a.shape[0]
    qm = _gang_lat_mask(h, w, splat(bws, w), splat(bhs, w))
    ew = splat(ews, w)
    tw = splat(tws, w)
    aw = splat(aws, w)
    se = _uavg4_lat(jnp.abs(a - b))
    ta = _tex_lat(a)
    tb = _tex_lat(b)
    s0 = _uavg4_lat(a)
    s1 = _uavg4_lat(b)
    t = (((se * se) << ew) + (((ta - tb) ** 2) << tw)
         + (((s0 - s1) ** 2) << aw))
    return gsum_rows(jnp.where(qm, t, 0), w)


def gang_metr(a, b, w, bws, bhs, ews, tws, aws):
    rows = gang_metr_acc_rows(a, b, w, bws, bhs, ews, tws, aws)
    out = []
    for g, (bw, bh) in enumerate(zip(bws, bhs)):
        acc = gsum(rows, w, g).astype(jnp.uint32)
        r = hw.metric_return(acc, bw, bh)
        out.append(jnp.where((bw == 0) | (bh == 0), I32MAX, r))
    return out


def gang_hier_metr(level, a, b, w, bws, bhs, psys):
    if level > 1:
        return gang_sse(a, b, w, bws, bhs)
    ews, tws, aws = zip(*psys)
    return gang_metr(a, b, w, bws, bhs, ews, tws, aws)


def gang_guard(preds, fn, defaults):
    """Gang-level lax.cond: fn runs when ANY lane needs it; per-lane
    masking inside fn keeps idle lanes at their defaults (value-identical
    to hme_wave.guard per lane)."""
    pred = preds[0]
    for p in preds[1:]:
        pred = pred | p
    return jax.lax.cond(pred, fn, lambda: defaults)


# ---------------------------------------------------------------------------
# upper-level gang block search (ref: hme.c:1413-1596, no subpel/decide)
# ---------------------------------------------------------------------------

def _gang_refine(cfg, level, src_w, ref_pl, bxs, bys, bws, bhs, psys,
                 bestxs, bestys, bests, qthreshs, pxs, pys, quant, fw, fh,
                 alives0):
    """hme_wave._refine_loop for a gang: per-lane scalar walk state, ganged
    probe metrics, loop while any lane is alive. A finished (or
    good-enough-zero) lane's state is frozen, identical to its scalar
    loop having exited (or never run)."""
    G = len(bxs)
    w = cfg.blk_w
    step = 1 << level
    mI = jnp.int32(I32MAX)

    def gang_probe(tvxs, tvys, dos):
        rws = gwindow(ref_pl, [bx + tx for bx, tx in zip(bxs, tvxs)],
                      [by + ty for by, ty in zip(bys, tvys)],
                      cfg.blk_h, w)
        raws = gang_hier_metr(level, src_w, rws, w, bws, bhs, psys)
        out = []
        for g in range(G):
            cost = hw.mv_cost(pxs[g], pys[g], cfg.blk_w, cfg.blk_h,
                              cfg.vid_w, cfg.vid_h, tvxs[g] * step * 4,
                              tvys[g] * step * 4, quant,
                              1 if level > 1 else 0)
            raw = jnp.where(dos[g], raws[g], mI)
            out.append((raw, jnp.where(dos[g], raws[g] + cost, mI)))
        return out

    def body(st):
        bestxs, bestys, bests, metr, goods, dones = st
        bx0 = list(bestxs)
        by0 = list(bestys)
        improveds = [jnp.bool_(False)] * G
        alives = [~d for d in dones]
        metr = [list(m) for m in metr]
        for k in range(5):
            tvxs = [b + int(hw.RECT[k][0]) for b in bx0]
            tvys = [b + int(hw.RECT[k][1]) for b in by0]
            dos = []
            for g in range(G):
                inval = hw.invalid_block(bxs[g] + tvxs[g], bys[g] + tvys[g],
                                         bws[g], bhs[g], 0, fw, fh)
                dos.append(alives[g] & (~improveds[g]) & (~inval))
            scs = gang_guard(dos, lambda tvxs=tvxs, tvys=tvys, dos=dos:
                             gang_probe(tvxs, tvys, dos), [(mI, mI)] * G)
            for g in range(G):
                sc_raw, sc = scs[g]
                if 1 <= k <= 4:
                    metr[g][k - 1] = jnp.where(dos[g], sc_raw,
                                               metr[g][k - 1])
                if level == 0:
                    ge = (dos[g] & (tvxs[g] == 0) & (tvys[g] == 0)
                          & (sc_raw <= qthreshs[g]))
                else:
                    ge = jnp.bool_(False)
                better = dos[g] & (~ge) & (bests[g] > sc)
                bestxs[g] = jnp.where(ge | better, tvxs[g], bestxs[g])
                bestys[g] = jnp.where(ge | better, tvys[g], bestys[g])
                bests[g] = jnp.where(ge, sc_raw,
                                     jnp.where(better, sc, bests[g]))
                goods[g] = goods[g] | ge
                dones[g] = dones[g] | ge
                improveds[g] = improveds[g] | better | ge
        # diagonal probe only when the 5-point pass had no improvement
        tvxs = [bestxs[g] + jnp.where(metr[g][0] <= metr[g][1], 1, -1)
                for g in range(G)]
        tvys = [bestys[g] + jnp.where(metr[g][2] <= metr[g][3], 1, -1)
                for g in range(G)]
        dos = []
        invals = []
        for g in range(G):
            inval = hw.invalid_block(bxs[g] + tvxs[g], bys[g] + tvys[g],
                                     bws[g], bhs[g], 0, fw, fh)
            invals.append(inval)
            dos.append(alives[g] & (~improveds[g]) & (~dones[g])
                        & (~inval))
        scs = gang_guard(dos, lambda tvxs=tvxs, tvys=tvys, dos=dos:
                         gang_probe(tvxs, tvys, dos), [(mI, mI)] * G)
        for g in range(G):
            _, sc = scs[g]
            do = alives[g] & (~improveds[g]) & (~dones[g])
            better = do & (~invals[g]) & (bests[g] > sc)
            bestxs[g] = jnp.where(better, tvxs[g], bestxs[g])
            bestys[g] = jnp.where(better, tvys[g], bestys[g])
            bests[g] = jnp.where(better, sc, bests[g])
            dones[g] = dones[g] | (do & ~better)
        return (bestxs, bestys, bests,
                [tuple(m) for m in metr], goods, dones)

    st = (list(bestxs), list(bestys), list(bests),
          [(mI, mI, mI, mI)] * G, [jnp.bool_(False)] * G,
          [~a for a in alives0])

    def cont(st):
        alive = ~st[5][0]
        for d in st[5][1:]:
            alive = alive | ~d
        return alive

    st = jax.lax.while_loop(cont, body, st)
    return st[0], st[1], st[2], st[4]


def gang_block_search(cfg, level, gs, srcl, refl, ogrl, gx, gy, quant,
                      i_s, j_s, lane_oks):
    """hme_wave._block_search for a gang of G blocks at (i_s, j_s).
    gs: per-lane gather_ctx dicts. Upper levels only (level >= 1).
    Returns per-lane dicts of (dx, dy, valid). (ref: hme.c:1413-1596)."""
    G = len(i_s)
    step = 1 << level
    fw, fh = cfg.dims[level]
    y_w, y_h = cfg.blk_w, cfg.blk_h
    mI = jnp.int32(I32MAX)
    bxs, bys, bws, bhs, valids = [], [], [], [], []
    for g in range(G):
        bx = (i_s[g] * y_w) >> level
        by = (j_s[g] * y_h) >> level
        inb = (bx < fw) & (by < fh)
        bxs.append(bx)
        bys.append(by)
        valids.append(lane_oks[g] & inb)
        bws.append(jnp.clip(fw - bx, 0, y_w))
        bhs.append(jnp.clip(fh - by, 0, y_h))
    src_w = gwindow(srcl, bxs, bys, y_h, y_w)

    # psy weights: level >= 2 fixed; level <= 1 derives from block features
    psys = []
    motion_biases = []
    var_srcs = [jnp.int32(0)] * G
    avg_srcs = [jnp.int32(0)] * G
    for g in range(G):
        ew = jnp.int32(2)
        tw = jnp.int32(1)
        aw = jnp.int32(0)
        motion_bias = jnp.int32(y_w * y_h)
        if level <= 1:
            # per-lane feature block: static column slice of the gang
            a_g = src_w[:, g * y_w:(g + 1) * y_w]
            detail, avg_src, _, _ = hw.block_feat_detail(a_g, bws[g], bhs[g])
            var_src = detail.astype(jnp.int32)
            var_srcs[g] = var_src
            avg_srcs[g] = avg_src
            tvar = var_src + ((var_src >> 10) ** 2)
            tvar = jint.divt(8 * tvar * quant >> 9, bws[g] * bhs[g])
            hvar = hw.block_feat_hvar(a_g, bws[g], bhs[g],
                                      avg_src).astype(jnp.int32)
            qtex = hw.block_feat_qtex(a_g, bws[g], bhs[g]).astype(jnp.int32)
            npeaks = hw.block_feat_peaks(a_g, bws[g], bhs[g],
                                         avg_src).astype(jnp.int32)
            motion_bias = jnp.where(
                tvar != 0, motion_bias + tvar * (hvar - qtex) * npeaks,
                motion_bias)
            motion_bias = jnp.maximum(motion_bias, 0) // (
                2 + jnp.abs(gx) + jnp.abs(gy))
            smooth = var_src <= (8 * bws[g] * bhs[g] * quant >> 9)
            motion_bias = jnp.where(smooth, 0, motion_bias)
            ew = jnp.where(smooth, 2, 1)
            tw = jnp.where(smooth, 1, 2)
            aw = jnp.where(smooth, 2, 1)
            aw = jnp.where(var_src > 24 * bws[g] * bhs[g], 0, aw)
        psys.append((ew, tw, aw))
        motion_biases.append(motion_bias)

    # candidates per lane (ref: hme.c:1443-1528), gang-evaluated per slot
    laxs = [jnp.int32(0)] * G
    lays = [jnp.int32(0)] * G
    cand_lists = []
    for g in range(G):
        cands = [(jnp.int32(0), jnp.int32(0), jnp.bool_(True))]
        if level < cfg.pyramid_levels:
            par = gs[g]["par"]
            pok_n = [p[2].astype(jnp.int32) for p in par]
            npar = sum(pok_n)
            nd1 = jnp.maximum(npar, 1)
            lax0 = jint.divt(sum(p[0] for p in par), nd1)
            lay0 = jint.divt(sum(p[1] for p in par), nd1)
            dists = [jnp.where(p[2], (p[0] - lax0) ** 2 + (p[1] - lay0) ** 2,
                               0) for p in par]
            avgd = sum(dists) // nd1
            ssd = sum(jnp.where(p[2], (d - avgd) ** 2, 0)
                      for p, d in zip(par, dists)).astype(jnp.int32)
            thresh = avgd + hw.isqrt_u32(jint.divt(ssd, nd1))
            inls = [p[2] & (d <= thresh) for p, d in zip(par, dists)]
            nl = jnp.maximum(sum(il.astype(jnp.int32) for il in inls), 1)
            laxs[g] = jint.divt(sum(jnp.where(il, p[0], 0)
                                    for p, il in zip(par, inls)), nl)
            lays[g] = jint.divt(sum(jnp.where(il, p[1], 0)
                                    for p, il in zip(par, inls)), nl)
            cands.append((laxs[g], lays[g], jnp.bool_(True)))
            if level == 0:
                ppx, ppy = gs[g]["pred"]
                cands.append((hw.sar_r(ppx, 2), hw.sar_r(ppy, 2),
                              jnp.bool_(True)))
            for vx, vy, ok in gs[g]["spat"]:
                cands.append((hw.sar_r(vx, 2), hw.sar_r(vy, 2), ok))
            if cfg.has_tmv:
                for tvx, tvy, tok in gs[g]["tmv"]:
                    cands.append((hw.sar_r(tvx, 2), hw.sar_r(tvy, 2), tok))
            cands.append((gx, gy, jnp.bool_(True)))
            for (pxv, pyv, _), il in zip(par, inls):
                cands.append((pxv, pyv, il))
        cand_lists.append(cands)
    nslots = len(cand_lists[0])

    def gang_eval(dxs, dys, uses):
        rws = gwindow(refl, [bx + dx for bx, dx in zip(bxs, dxs)],
                      [by + dy for by, dy in zip(bys, dys)], y_h, y_w)
        raws = gang_hier_metr(level, src_w, rws, y_w, bws, bhs, psys)
        out = []
        for g in range(G):
            raw = jnp.where(uses[g], raws[g], mI)
            sc = raw + hw.mv_cost(
                gs[g]["pred"][0], gs[g]["pred"][1], y_w, y_h,
                cfg.vid_w, cfg.vid_h, dxs[g] * step * 4, dys[g] * step * 4,
                quant, 1 if level > 1 else 0)
            sc = jnp.where((dxs[g] == laxs[g]) & (dys[g] == lays[g]),
                           jnp.maximum(sc - (motion_biases[g] >> level), 0),
                           sc)
            out.append((raw, jnp.where(uses[g], sc, mI)))
        return out

    best_scores = [mI] * G
    score_zeros = [mI] * G
    bdxs = [jnp.int32(0)] * G
    bdys = [jnp.int32(0)] * G
    seens = [[] for _ in range(G)]
    for slot in range(nslots):
        dxs, dys, uses = [], [], []
        for g in range(G):
            cx, cy, ok = cand_lists[g][slot]
            dx = hw.sar(cx, level)
            dy = hw.sar(cy, level)
            inval = hw.invalid_block(bxs[g] + dx, bys[g] + dy,
                                     bws[g], bhs[g], 0, fw, fh)
            use = ok & (~inval)
            dup = jnp.bool_(False)
            for sdx, sdy, sev in seens[g]:
                dup = dup | (sev & (sdx == dx) & (sdy == dy))
            dxs.append(dx)
            dys.append(dy)
            uses.append(use & ~dup)
            seens[g].append((dx, dy, use))
        scs = gang_guard(uses, lambda dxs=dxs, dys=dys, uses=uses:
                         gang_eval(dxs, dys, uses), [(mI, mI)] * G)
        for g in range(G):
            raw, sc = scs[g]
            if slot == 0:
                # uses[0] for slot 0 is exactly `use` (no dups possible)
                score_zeros[g] = jnp.where(uses[g], raw, mI)
            better = sc < best_scores[g]
            best_scores[g] = jnp.where(better, sc, best_scores[g])
            bdxs[g] = jnp.where(better, dxs[g], bdxs[g])
            bdys[g] = jnp.where(better, dys[g], bdys[g])

    # good-enough vs source reference (ref: hme.c:1569-1584)
    ogr_w = gwindow(ogrl, bxs, bys, y_h, y_w)
    ews, tws, aws = zip(*psys)
    zoscores = gang_metr(src_w, ogr_w, y_w, bws, bhs, ews, tws, aws)
    ge0s, best0s, best0_ges, qthreshs = [], [], [], []
    for g in range(G):
        qthresh = ((quant * bws[g] * bhs[g]) >> 11)
        qthresh = jnp.where((jnp.abs(bdxs[g]) <= 1) & (jnp.abs(bdys[g]) <= 1),
                            qthresh * 2, qthresh)
        qthreshs.append(qthresh)
        ge0 = zoscores[g] < qthresh
        ge0s.append(ge0)
        best0_ge = score_zeros[g] if level == 0 else jnp.int32(0)
        best0_ges.append(best0_ge)
        best0s.append(jnp.where(ge0, best0_ge, best_scores[g]))
        bdxs[g] = jnp.where(ge0, 0, bdxs[g])
        bdys[g] = jnp.where(ge0, 0, bdys[g])

    # greedy refine, gang-level guard on any lane not good-enough
    z = jnp.int32(0)
    pxs = [g_["pred"][0] for g_ in gs]
    pys = [g_["pred"][1] for g_ in gs]
    alive0 = [~ge for ge in ge0s]
    rres = gang_guard(
        alive0, lambda: _gang_refine(
            cfg, level, src_w, refl, bxs, bys, bws, bhs, psys,
            bdxs, bdys, best0s, qthreshs, pxs, pys, quant, fw, fh, alive0),
        ([z] * G, [z] * G, [z] * G, [jnp.bool_(False)] * G))
    rdxs, rdys, rbests, rgoods = rres
    out = []
    for g in range(G):
        ge0 = ge0s[g]
        out.append(dict(
            valid=valids[g], i=i_s[g], j=j_s[g],
            bx=bxs[g], by=bys[g], bw=bws[g], bh=bhs[g],
            dx=jnp.where(ge0, 0, rdxs[g]),
            dy=jnp.where(ge0, 0, rdys[g]),
            best=jnp.where(ge0, best0_ges[g], rbests[g]),
            good=ge0 | (rgoods[g] & ~ge0),
            lax=laxs[g], lay=lays[g],
            motion_bias=motion_biases[g],
            var_src=var_srcs[g], avg_src=avg_srcs[g],
            psy=psys[g], score_zero=score_zeros[g]))
    return out, src_w


# ---------------------------------------------------------------------------
# gang twins of the level-0 decide metrics (hme_wave lines cited per fn)
# ---------------------------------------------------------------------------

def gang_masked_avg(a, w, bws, bhs):
    """Per-lane masked_avg scalars of a ganged (h, LW) window."""
    h = a.shape[0]
    m = _gang_mask(h, w, splat(bws, w), splat(bhs, w))
    rows = gsum_rows(jnp.where(m, a, 0), w)
    return [gsum(rows, w, g) // jnp.maximum(bws[g] * bhs[g], 1)
            for g in range(len(bws))]


def gang_feat_detail(a, w, bws, bhs):
    """Per-lane block_feat_detail (detail, avg, var, tex) scalar lists.
    The slice-based edge diffs become same-shape rolls; the roll wraps
    only the last in-group column, which the (col+1 < bw) mask excludes
    for every bw <= w — masked sums are bit-equal (ref: hme.c:492-563)."""
    G = len(bws)
    h = a.shape[0]
    lane, row = _iotas(h)
    col = lane % w
    bwv = splat(bws, w)
    bhv = splat(bhs, w)
    m = (col < bwv) & (row < bhv)
    rows_s = gsum_rows(jnp.where(m, a, 0), w)
    dh = jnp.abs(_roll(a, -1, 1) - a)
    mh = (col + 1 < bwv) & (row < bhv)
    rows_h = gsum_rows(jnp.where(mh, dh, 0), w)
    dv = jnp.abs(_roll(a, -1, 0) - a)
    mv_ = (col < bwv) & (row + 1 < bhv)
    rows_v = gsum_rows(jnp.where(mv_, dv, 0), w)
    avgs = []
    for g in range(G):
        s = gsum(rows_s, w, g)
        avgs.append(s // jnp.maximum(bws[g] * bhs[g], 1))
    av = splat(avgs, w)
    rows_var = gsum_rows(jnp.where(m, jnp.abs(a - av), 0), w)
    details, vars_, texs = [], [], []
    for g in range(G):
        sh = gsum(rows_h, w, g)
        sv = gsum(rows_v, w, g)
        var = gsum(rows_var, w, g)
        tex = jnp.maximum(sh, sv) - (var >> 1)
        details.append((var >> 1) + jnp.maximum(tex, 0))
        vars_.append(var)
        texs.append(jnp.maximum(sh, sv))
    return details, avgs, vars_, texs


def gang_metr_accs(a, b, w, bws, bhs, psys):
    """Per-lane masked_metr_acc uint32 scalars (ref: hme.c:126-196)."""
    ews, tws, aws = zip(*psys)
    rows = gang_metr_acc_rows(a, b, w, bws, bhs, ews, tws, aws)
    return [gsum(rows, w, g).astype(jnp.uint32) for g in range(len(bws))]


def gang_max_subblock_err(pl_a, pl_b, x0s, y0s, rxs, rys, qw, qh,
                          bw2s, bh2s, psys):
    """Per-lane yuv_max_subblock_err plane maxima (ref: hme.c:369-409)."""
    G = len(x0s)
    ms = None
    for f, g2 in ((0, 0), (1, 0), (0, 1), (1, 1)):
        a = gwindow(pl_a, [x0s[g] + f * bw2s[g] for g in range(G)],
                    [y0s[g] + g2 * bh2s[g] for g in range(G)], qh, qw)
        b = gwindow(pl_b, [rxs[g] + f * bw2s[g] for g in range(G)],
                    [rys[g] + g2 * bh2s[g] for g in range(G)], qh, qw)
        accs = gang_metr_accs(a, b, qw, bw2s, bh2s, psys)
        ms = accs if ms is None else [jnp.maximum(m, acc)
                                      for m, acc in zip(ms, accs)]
    return ms


def gang_err_intra(a, b, w, bws, bhs, avg_sbs, avg_srcs, ratios):
    """Per-lane err_intra scalar triples (ref: hme.c:839-889)."""
    G = len(bws)
    h = a.shape[0]
    qm = _gang_lat_mask(h, w, splat(bws, w), splat(bhs, w))
    rat = splat(ratios, w).astype(jnp.uint32)
    s0 = _uavg4_lat(a)
    s1 = _uavg4_lat(b)
    ta = _tex_lat(a)
    tb = _tex_lat(b)
    ae = _uavg4_lat(jnp.abs(a - b))
    inter = (((ae * ae).astype(jnp.uint32) * rat) >> jnp.uint32(5))
    inter = inter + (((ta - tb) ** 2) << 1).astype(jnp.uint32)
    inter = inter + (((s0 - s1) ** 2) << 2).astype(jnp.uint32)
    rows_i = gsum_rows(jnp.where(qm, inter.astype(jnp.int32), 0), w)

    def intra_rows(avgv):
        aev = _uavg4_lat(jnp.abs(a - avgv))
        t = ((aev * aev).astype(jnp.uint32)
             + ((ta * ta) << 1).astype(jnp.uint32)
             + (((s0 - avgv) ** 2) << 3).astype(jnp.uint32))
        return gsum_rows(jnp.where(qm, t.astype(jnp.int32), 0), w)

    rows_sb = intra_rows(splat(avg_sbs, w))
    rows_sr = intra_rows(splat(avg_srcs, w))
    out = []
    for g in range(G):
        isb = gsum(rows_sb, w, g).astype(jnp.uint32)
        isr = gsum(rows_sr, w, g).astype(jnp.uint32)
        inter_g = gsum(rows_i, w, g).astype(jnp.uint32)
        ru = ratios[g].astype(jnp.uint32)
        out.append((isb, isr, (inter_g * ru) >> jnp.uint32(5)))
    return out


def gang_calc_eprm(src_w, ref_w, w, bws, bhs, avg_srcs, avg_refs):
    """Per-lane (clipi, clipd, clipr) bools (ref: hme.c:451-490)."""
    G = len(bws)
    h = src_w.shape[0]
    m = _gang_mask(h, w, splat(bws, w), splat(bhs, w))
    s = src_w
    avr = splat(avg_refs, w)
    avs = splat(avg_srcs, w)
    tr = (m & ((((s - ref_w) + 128) & ~0xFF) != 0)).astype(jnp.int32)
    ti = (m & (((s - (avr - 128)) & ~0xFF) != 0)).astype(jnp.int32)
    td = (m & (((s - (avs - 128)) & ~0xFF) != 0)).astype(jnp.int32)
    rr = gsum_rows(tr, w)
    ri = gsum_rows(ti, w)
    rd = gsum_rows(td, w)
    return [(gsum(ri, w, g) != 0, gsum(rd, w, g) != 0, gsum(rr, w, g) != 0)
            for g in range(G)]


# ---------------------------------------------------------------------------
# gang level-0 pipeline: search + subpel + mode decisions + intra tests
# (ref: hme.c:1598-1833; the scalar decision chains run per lane, every
# window metric runs ganged)
# ---------------------------------------------------------------------------

def gang_level0_block(cfg, gs, srcl, refl, ogrl, src_u, src_v, ref_u,
                      ref_v, gx, gy, quant, skip_thresh, i_s, j_s,
                      lane_oks):
    G = len(i_s)
    fw, fh = cfg.dims[0]
    y_w, y_h = cfg.blk_w, cfg.blk_h
    rs, src_w = gang_block_search(cfg, 0, gs, srcl, refl, ogrl, gx, gy,
                                  quant, i_s, j_s, lane_oks)
    bxs = [r["bx"] for r in rs]
    bys = [r["by"] for r in rs]
    bws = [r["bw"] for r in rs]
    bhs = [r["bh"] for r in rs]
    psys = [r["psy"] for r in rs]
    quant_rd = (quant * quant).astype(jnp.uint32)
    skipt = (quant_rd >> jnp.uint32(19)).astype(jnp.int32)

    # ---- subpel (per lane, phase-plane form; ref: hme.c:1598-1634) ----
    bests, best_fps, sub_xs, sub_ys, fpelxs, fpelys = [], [], [], [], [], []
    for g in range(G):
        r = rs[g]
        fpelx0, fpely0 = r["dx"], r["dy"]
        best = jnp.where((fpelx0 == r["lax"]) & (fpely0 == r["lay"]),
                         r["best"] + r["motion_bias"], r["best"])
        best_fp = best
        px_, py_ = gs[g]["pred"]
        sub_x = jnp.int32(0)
        sub_y = jnp.int32(0)
        fpelx, fpely = fpelx0, fpely0
        if cfg.effort >= 4:
            z3 = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
            cond1 = ~hw.invalid_block(bxs[g] + r["lax"], bys[g] + r["lay"],
                                      bws[g], bhs[g], 4, fw, fh)
            ret1, sx1, sy1 = hw.guard(
                cond1, lambda g=g, r=r, px_=px_, py_=py_, best_fp=best_fp:
                hw._subpel(cfg, srcl, refl, bxs[g], bys[g], bws[g], bhs[g],
                           r["lax"], r["lay"], best_fp, psys[g],
                           px_, py_, quant, fw, fh), z3)
            found1 = cond1 & ((sx1 != 0) | (sy1 != 0))
            best = jnp.where(cond1, ret1, best)
            cond2 = ((~found1) & (~r["good"])
                     & ~hw.invalid_block(bxs[g] + fpelx0, bys[g] + fpely0,
                                         bws[g], bhs[g], 4, fw, fh))
            ret2, sx2, sy2 = hw.guard(
                cond2, lambda g=g, px_=px_, py_=py_, best_fp=best_fp,
                fpelx0=fpelx0, fpely0=fpely0:
                hw._subpel(cfg, srcl, refl, bxs[g], bys[g], bws[g], bhs[g],
                           fpelx0, fpely0, best_fp, psys[g],
                           px_, py_, quant, fw, fh), z3)
            best = jnp.where(cond2, ret2, best)
            sub_x = jnp.where(cond2, sx2, jnp.where(found1, sx1, 0))
            sub_y = jnp.where(cond2, sy2, jnp.where(found1, sy1, 0))
            fpelx = jnp.where(found1, r["lax"], fpelx0)
            fpely = jnp.where(found1, r["lay"], fpely0)
        bests.append(best)
        best_fps.append(best_fp)
        sub_xs.append(sub_x)
        sub_ys.append(sub_y)
        fpelxs.append(fpelx)
        fpelys.append(fpely)
    mvxs = [fpelxs[g] * 4 + sub_xs[g] for g in range(G)]
    mvys = [fpelys[g] * 4 + sub_ys[g] for g in range(G)]

    # ---- block metrics vs refs (ref: hme.c:1636-1692) ----
    ratios = []
    for g in range(G):
        is_subpel = ((mvxs[g] | mvys[g]) & 3) != 0
        ratios.append(jnp.where(
            is_subpel,
            ((bests[g].astype(jnp.uint32) << 5)
             // jnp.maximum(best_fps[g], 1).astype(jnp.uint32)
             ).astype(jnp.int32), 32))
    ogr_w = gwindow(ogrl, [bxs[g] + fpelxs[g] for g in range(G)],
                    [bys[g] + fpelys[g] for g in range(G)], y_h, y_w)
    ref_w = gwindow(refl, [bxs[g] + fpelxs[g] for g in range(G)],
                    [bys[g] + fpelys[g] for g in range(G)], y_h, y_w)
    ews, tws, aws = zip(*psys)
    ogrerrs = gang_metr(src_w, ogr_w, y_w, bws, bhs, ews, tws, aws)
    rdet, ravg, _, _ = gang_feat_detail(ref_w, y_w, bws, bhs)
    mads, ogrmads, ipolvars, dvs, maintains = [], [], [], [], []
    for g in range(G):
        yarea = bws[g] * bhs[g]
        ogrmad = ((ogrerrs[g] + jnp.maximum(yarea, 1) // 2)
                  // jnp.maximum(yarea, 1))
        ogrmads.append(((ogrmad.astype(jnp.uint32)
                         * ratios[g].astype(jnp.uint32)) >> 5
                        ).astype(jnp.int32))
        mads.append((bests[g] + jnp.maximum(yarea, 1) // 2)
                    // jnp.maximum(yarea, 1))
        dv = jnp.minimum(ratios[g], 32)
        ipolvar = (rs[g]["var_src"] * dv
                   + rdet[g].astype(jnp.int32) * (32 - dv)) >> 5
        ipolvars.append(ipolvar)
        dvs.append(jnp.abs(rs[g]["var_src"] - ipolvar))
        maintains.append((rs[g]["var_src"] > 16 * yarea)
                         & (rs[g]["var_src"] < 32 * yarea))

    hs_ = K.fmt_h_shift(cfg.subsamp)
    vs_ = K.fmt_v_shift(cfg.subsamp)
    cw_max, ch_max = y_w >> hs_, y_h >> vs_
    cbxs = [i_s[g] * cw_max for g in range(G)]
    cbys = [j_s[g] * ch_max for g in range(G)]
    cbmxs = [cbxs[g] + hw.sar(fpelxs[g], hs_) for g in range(G)]
    cbmys = [cbys[g] + hw.sar(fpelys[g], vs_) for g in range(G)]
    cbws = [bws[g] >> hs_ for g in range(G)]
    cbhs = [bhs[g] >> vs_ for g in range(G)]
    chroma_ratios = [((cbws[g] * cbhs[g]) << 4)
                     // jnp.maximum(bws[g] * bhs[g], 1) for g in range(G)]

    su_w = gwindow(src_u, cbxs, cbys, ch_max, cw_max)
    sv_w = gwindow(src_v, cbxs, cbys, ch_max, cw_max)
    uavg_srcs = gang_masked_avg(su_w, cw_max, cbws, cbhs)
    vavg_srcs = gang_masked_avg(sv_w, cw_max, cbws, cbhs)
    uavg_refs = gang_masked_avg(
        gwindow(ref_u, cbmxs, cbmys, ch_max, cw_max), cw_max, cbws, cbhs)
    vavg_refs = gang_masked_avg(
        gwindow(ref_v, cbmxs, cbmys, ch_max, cw_max), cw_max, cbws, cbhs)
    eprms = gang_calc_eprm(src_w, ref_w, y_w, bws, bhs,
                           [r["avg_src"] for r in rs],
                           [a.astype(jnp.int32) for a in ravg])

    avg_y_difs, avg_c_difs, greyishs, oobs, neidifs = [], [], [], [], []
    for g in range(G):
        greyishs.append((jnp.abs(uavg_srcs[g] - 128) < 8)
                        & (jnp.abs(vavg_srcs[g] - 128) < 8))
        avg_y_difs.append(jnp.abs(rs[g]["avg_src"]
                                  - ravg[g].astype(jnp.int32)))
        avg_c_difs.append((jnp.abs(uavg_srcs[g] - uavg_refs[g])
                           + jnp.abs(vavg_srcs[g] - vavg_refs[g]) + 1) >> 1)
        limx = ((cfg.nbh - 1) * y_w) - 1
        limy = ((cfg.nbv - 1) * y_h) - 1
        oobx = i_s[g] * y_w + hw.sar(mvxs[g], 2)
        ooby = j_s[g] * y_h + hw.sar(mvys[g], 2)
        oobs.append((oobx < 0) | (ooby < 0) | (oobx >= limx)
                    | (ooby >= limy))
        nd0, nd1 = hw._neighbordif_self(gs[g], mvxs[g], mvys[g])
        neidifs.append((nd0 + nd1) // 3)

    # ---- skip test (ref: hme.c:1694-1729) ----
    do_skip = not (cfg.skip_thresh_neg or cfg.lossless)
    skips = [jnp.bool_(False)] * G
    if do_skip:
        z0 = gang_max_subblock_err(srcl, refl, bxs, bys, bxs, bys,
                                   y_w // 2, y_h // 2,
                                   [b // 2 for b in bws],
                                   [b // 2 for b in bhs], psys)
        z1 = gang_max_subblock_err(src_u, ref_u, cbxs, cbys, cbxs, cbys,
                                   cw_max // 2, ch_max // 2,
                                   [b // 2 for b in cbws],
                                   [b // 2 for b in cbhs], psys)
        z2 = gang_max_subblock_err(src_v, ref_v, cbxs, cbys, cbxs, cbys,
                                   cw_max // 2, ch_max // 2,
                                   [b // 2 for b in cbws],
                                   [b // 2 for b in cbhs], psys)
        for g in range(G):
            yarea = bws[g] * bhs[g]
            var_src = rs[g]["var_src"]
            sth = (skipt * yarea + 4 * var_src
                   + yarea * skip_thresh).astype(jnp.uint32)
            sth = jnp.where(quant < (1 << (K.MAX_QP_BITS - 2)),
                            (sth * quant.astype(jnp.uint32))
                            >> (K.MAX_QP_BITS - 2), sth)
            sth = jnp.where(avg_y_difs[g] <= 2,
                            jnp.maximum(sth, (3 * (yarea + var_src))
                                        .astype(jnp.uint32)), sth)
            sth = jnp.maximum(sth, yarea.astype(jnp.uint32))
            sth = jnp.where(rs[g]["good"], sth * 2, sth)
            ratio_u = ratios[g].astype(jnp.uint32)
            cth = (chroma_ratios[g].astype(jnp.uint32) * sth
                   * jnp.maximum(skipt, 1).astype(jnp.uint32)
                   ) >> jnp.uint32(5)
            z0s = (((z0[g] * ratio_u) >> 5)
                   + (((rs[g]["avg_src"] - ravg[g].astype(jnp.int32)) ** 2)
                      * yarea).astype(jnp.uint32))
            z1s = (z1[g] * ratio_u) >> 5
            z2s = (z2[g] * ratio_u) >> 5
            cond_try = rs[g]["good"] | ((mvxs[g] == 0) & (mvys[g] == 0))
            skips[g] = (cond_try & (z0s <= sth) & (z1s <= cth)
                        & (z2s <= cth))

    # ---- no-residual decisions (ref: hme.c:1731-1777) ----
    noxmitys = [jnp.bool_(False)] * G
    noxmitcs = [jnp.bool_(False)] * G
    simcmplxs = [jnp.bool_(False)] * G
    if not cfg.lossless:
        b0 = gang_max_subblock_err(srcl, refl, bxs, bys,
                                   [bxs[g] + fpelxs[g] for g in range(G)],
                                   [bys[g] + fpelys[g] for g in range(G)],
                                   y_w // 2, y_h // 2,
                                   [b // 2 for b in bws],
                                   [b // 2 for b in bhs], psys)
        b1 = gang_max_subblock_err(src_u, ref_u, cbxs, cbys, cbmxs, cbmys,
                                   cw_max // 2, ch_max // 2,
                                   [b // 2 for b in cbws],
                                   [b // 2 for b in cbhs], psys)
        b2 = gang_max_subblock_err(src_v, ref_v, cbxs, cbys, cbmxs, cbmys,
                                   cw_max // 2, ch_max // 2,
                                   [b // 2 for b in cbws],
                                   [b // 2 for b in cbhs], psys)
        _, _, _, utexs = gang_feat_detail(su_w, cw_max, cbws, cbhs)
        _, _, _, vtexs = gang_feat_detail(sv_w, cw_max, cbws, cbhs)
        for g in range(G):
            yarea = bws[g] * bhs[g]
            y_prereq = avg_y_difs[g] <= 2
            c_prereq = (~greyishs[g]) & (avg_c_difs[g] <= 2)
            xth = (skipt * yarea).astype(jnp.int32)
            carea = 4 * cbws[g] * cbhs[g]
            xth = (xth.astype(jnp.uint32)
                   + ipolvars[g].astype(jnp.uint32)).astype(jnp.int32)
            xth = jnp.maximum(xth - yarea * neidifs[g] * 2, 0)
            xth = ((xth.astype(jnp.uint32) * quant.astype(jnp.uint32))
                   >> K.MAX_QP_BITS).astype(jnp.int32)
            xth = jnp.clip(xth, 32, yarea * 4)
            ratio_u = ratios[g].astype(jnp.uint32)
            b0s = (b0[g] * ratio_u) >> 5
            b1s = (b1[g] * ratio_u) >> 5
            b2s = (b2[g] * ratio_u) >> 5
            c_prereq = c_prereq & ((utexs[g] > carea) | (vtexs[g] > carea))
            xthc = (chroma_ratios[g] * xth) >> 4
            pre = (~oobs[g]) & (y_prereq | c_prereq)
            noxmitys[g] = pre & y_prereq & (b0s < (4 * xth)
                                            .astype(jnp.uint32))
            noxmitcs[g] = (pre & c_prereq & (b1s < xthc.astype(jnp.uint32))
                           & (b2s < xthc.astype(jnp.uint32)))
            simcmplxs[g] = (~oobs[g]) & (dvs[g] < rs[g]["var_src"] // 4)

    # ---- intra tests (ref: hme.c:891-1048) ----
    submasks, dcs, intras = gang_test_intra_y(
        cfg, rs, gs, srcl, refl, bxs, bys, bws, bhs, fpelxs, fpelys,
        mvxs, mvys, neidifs, ratios, ipolvars, src_w)
    submasks, intras = gang_test_intra_c(
        cfg, src_u, src_v, ref_u, ref_v, cbxs, cbys, cbmxs, cbmys,
        cbws, cbhs, mvxs, mvys, mads, ipolvars, bws, bhs,
        [r["avg_src"] for r in rs], submasks, intras)

    # ---- EPRM merge + flags (ref: hme.c:1801-1831) ----
    outs = []
    for g in range(G):
        eprmi, eprmd, eprmr = eprms[g]
        submask, dc, intra = submasks[g], dcs[g], intras[g]
        m_intra = jnp.where((dc & K.SRC_DC_PRED) != 0, eprmd, eprmi)
        m_intra = m_intra | ((submask != K.MASK_ALL_INTRA) & eprmr)
        m_inter = eprmr | ((submask != 0) & eprmi)
        eprm = jnp.where(intra, m_intra, m_inter)
        mvx = jnp.where(intra, fpelxs[g] * 4, mvxs[g])
        mvy = jnp.where(intra, fpelys[g] * 4, mvys[g])
        simc = simcmplxs[g] & ~(intra | eprm)
        skip = skips[g]
        mvx = jnp.where(skip, 0, mvx)
        mvy = jnp.where(skip, 0, mvy)
        intra = intra & ~skip
        eprm = eprm & ~skip
        simc = simc & ~skip
        noxy = noxmitys[g] & ~skip
        noxc = noxmitcs[g] & ~skip
        err = jnp.where(skip | noxy, 0, mads[g]) & 0xFFFF
        flags = (intra.astype(jnp.int32) << K.MV_BIT_INTRA
                 | eprm.astype(jnp.int32) << K.MV_BIT_EPRM
                 | maintains[g].astype(jnp.int32) << K.MV_BIT_MAINTAIN
                 | skip.astype(jnp.int32) << K.MV_BIT_SKIP
                 | noxy.astype(jnp.int32) << K.MV_BIT_NOXMITY
                 | noxc.astype(jnp.int32) << K.MV_BIT_NOXMITC
                 | simc.astype(jnp.int32) << K.MV_BIT_SIMCMPLX)
        v = rs[g]["valid"]
        terr = jnp.where(v & ~skip & ~noxy, mads[g], 0)
        ndiff = jnp.where(
            v & ~skip, (ogrmads[g] > 11).astype(jnp.int32)
            + (avg_c_difs[g] >= 32).astype(jnp.int32), 0)
        nelig = jnp.where(v & (bests[g] > 0), 1, 0)
        nintra = jnp.where(v & intra, 1, 0)
        outs.append((mvx, mvy, flags, err, dc, submask,
                     skip.astype(jnp.uint8), v, terr, ndiff, nelig,
                     nintra))
    return outs


def gang_test_intra_y(cfg, rs, gs, srcl, refl, bxs, bys, bws, bhs,
                      fpelxs, fpelys, mvxs, mvys, neidifs, ratios,
                      ipolvars, src_w):
    """Per-lane test_intra_y with ganged sub-block metrics
    (ref: hme.c:891-985)."""
    G = len(bxs)
    y_w, y_h = cfg.blk_w, cfg.blk_h
    qw, qh = y_w // 2, y_h // 2
    psyscale = cfg.psyf_all
    if cfg.has_tmv:
        refmvs = [gs[g]["tmv_c"] for g in range(G)]
    else:
        refmvs = [(mvxs[g], mvys[g]) for g in range(G)]
    sbws = [b // 2 for b in bws]
    sbhs = [b // 2 for b in bhs]
    skip_alls, detail_srcs = [], []
    for g in range(G):
        skip_all = (((mvxs[g] != 0) | (mvys[g] != 0)) & (neidifs[g] < 3)
                    & (jnp.abs(refmvs[g][0] - mvxs[g]) < 3)
                    & (jnp.abs(refmvs[g][1] - mvys[g]) < 3))
        skip_alls.append(skip_all | (sbws[g] == 0) | (sbhs[g] == 0))
        detail0 = ipolvars[g]
        detail_srcs.append(detail0 + detail0
                           // jnp.maximum(neidifs[g], 1))
    submasks = [jnp.int32(0)] * G
    avg_tots = [jnp.int32(0)] * G
    err_subs = [jnp.uint32(0)] * G
    err_srcs = [jnp.uint32(0)] * G
    nsubs = [jnp.int32(0)] * G
    for f, g2, bit in ((0, 0, K.MASK_INTRA00), (1, 0, K.MASK_INTRA01),
                       (0, 1, K.MASK_INTRA10), (1, 1, K.MASK_INTRA11)):
        src_d = gwindow(srcl, [bxs[g] + f * sbws[g] for g in range(G)],
                        [bys[g] + g2 * sbhs[g] for g in range(G)], qh, qw)
        mvr_d = gwindow(refl,
                        [bxs[g] + fpelxs[g] + f * sbws[g]
                         for g in range(G)],
                        [bys[g] + fpelys[g] + g2 * sbhs[g]
                         for g in range(G)], qh, qw)
        _, avg_subs, _, _ = gang_feat_detail(mvr_d, qw, sbws, sbhs)
        local_details, avg_locals, _, _ = gang_feat_detail(
            src_d, qw, sbws, sbhs)
        dcs_ = []
        for g in range(G):
            dcs_.append((avg_locals[g] + rs[g]["avg_src"] * 3 + 2) >> 2)
        eis = gang_err_intra(src_d, mvr_d, qw, sbws, sbhs,
                             [a.astype(jnp.int32) for a in avg_subs],
                             [d.astype(jnp.int32) for d in dcs_], ratios)
        for g in range(G):
            local_detail = local_details[g].astype(jnp.int32)
            dcd = jnp.abs(avg_locals[g] - avg_subs[g]).astype(jnp.int32) + 2
            too_detailed = local_detail.astype(jnp.uint32) > (
                (dcd * dcd * bws[g] * bhs[g]).astype(jnp.uint32)
                * ratios[g].astype(jnp.uint32)) >> 5
            sub_err, src_err, inter_err = eis[g]
            lo = (detail_srcs[g] + local_detail + 1) >> 1
            hi = detail_srcs[g]
            lerp = (lo * (32 - psyscale) + hi * psyscale) >> 5
            ld2 = jnp.maximum(lerp, lo).astype(jnp.uint32)
            sub_better = (sub_err + ld2) < inter_err
            src_better = (src_err + ld2) < inter_err
            take = ((~skip_alls[g]) & (~too_detailed)
                    & (sub_better | src_better))
            submasks[g] = submasks[g] | jnp.where(take, bit, 0)
            err_srcs[g] = err_srcs[g] + jnp.where(take, src_err, 0)
            err_subs[g] = err_subs[g] + jnp.where(take, sub_err, 0)
            avg_tots[g] = avg_tots[g] + jnp.where(
                take, jnp.where(sub_err < src_err,
                                avg_subs[g].astype(jnp.int32),
                                dcs_[g].astype(jnp.int32)), 0)
            nsubs[g] = nsubs[g] + jnp.where(take, 1, 0)
            detail_srcs[g] = jnp.where(take, detail_srcs[g] * 4 // 5,
                                       detail_srcs[g])
    intras, dc_outs = [], []
    for g in range(G):
        intra = submasks[g] != 0
        intras.append(intra)
        dc_outs.append(jnp.where(
            intra & (err_srcs[g] < err_subs[g]),
            (avg_tots[g] // jnp.maximum(nsubs[g], 1)) | K.SRC_DC_PRED, 0))
    return submasks, dc_outs, intras


def gang_test_intra_c(cfg, src_u, src_v, ref_u, ref_v, cbxs, cbys,
                      cbmxs, cbmys, cbws, cbhs, mvxs, mvys, mads,
                      ipolvars, bws, bhs, avg_srcs, submasks, intras):
    """Per-lane test_intra_c with ganged chroma averages
    (ref: hme.c:987-1048)."""
    if cfg.effort < 6:
        return submasks, intras
    G = len(cbxs)
    hs_ = K.fmt_h_shift(cfg.subsamp)
    vs_ = K.fmt_v_shift(cfg.subsamp)
    qw = (cfg.blk_w >> hs_) // 2
    qh = (cfg.blk_h >> vs_) // 2
    sbws = [b // 2 for b in cbws]
    sbhs = [b // 2 for b in cbhs]
    blockeds, thrs, avg_ramps = [], [], []
    for g in range(G):
        detail_src = ipolvars[g] // jnp.maximum(bws[g] * bhs[g], 1)
        thr = jnp.where(intras[g], detail_src, detail_src * detail_src)
        thrs.append(thr)
        small_mv = (jnp.abs(mvxs[g]) < 4) & (jnp.abs(mvys[g]) < 4)
        blockeds.append((sbws[g] == 0) | (sbhs[g] == 0)
                        | (mads[g].astype(jnp.uint32)
                           <= thr.astype(jnp.uint32))
                        | (thr.astype(jnp.uint32) > 64) | small_mv)
        avg_ramps.append((avg_srcs[g] * avg_srcs[g]) >> 8)
    adds = [jnp.int32(0)] * G
    for f, g2, bit in ((0, 0, K.MASK_INTRA00), (1, 0, K.MASK_INTRA01),
                       (0, 1, K.MASK_INTRA10), (1, 1, K.MASK_INTRA11)):
        us = gang_masked_avg(gwindow(
            src_u, [cbxs[g] + f * sbws[g] for g in range(G)],
            [cbys[g] + g2 * sbhs[g] for g in range(G)], qh, qw),
            qw, sbws, sbhs)
        vs_a = gang_masked_avg(gwindow(
            src_v, [cbxs[g] + f * sbws[g] for g in range(G)],
            [cbys[g] + g2 * sbhs[g] for g in range(G)], qh, qw),
            qw, sbws, sbhs)
        ur = gang_masked_avg(gwindow(
            ref_u, [cbmxs[g] + f * sbws[g] for g in range(G)],
            [cbmys[g] + g2 * sbhs[g] for g in range(G)], qh, qw),
            qw, sbws, sbhs)
        vr = gang_masked_avg(gwindow(
            ref_v, [cbmxs[g] + f * sbws[g] for g in range(G)],
            [cbmys[g] + g2 * sbhs[g] for g in range(G)], qh, qw),
            qw, sbws, sbhs)
        for g in range(G):
            already = (submasks[g] & bit) != 0
            dif = (((us[g] - ur[g]) ** 2 + (vs_a[g] - vr[g]) ** 2)
                   * avg_ramps[g]) >> 8
            take = ((~blockeds[g]) & (~already)
                    & (dif.astype(jnp.uint32) > thrs[g].astype(jnp.uint32)))
            adds[g] = adds[g] + jnp.where(take, bit, 0)
    submasks = [submasks[g] | adds[g] for g in range(G)]
    return submasks, [s != 0 for s in submasks]


# ---------------------------------------------------------------------------
# gang kernel context: per-lane scalar gather from the pre-gathered SMEM
# candidate pack and the SMEM carry ring (same layout as hme_pallas)
# ---------------------------------------------------------------------------

def _lane_ctx(cfg, level, cand_ref, ring_ref, d, k, a, b):
    return hp._kernel_ctx(cfg, level, cand_ref, ring_ref, d, k, a, b)


@functools.lru_cache(maxsize=None)
def _level_call(cfg, level, shapes):
    """Gang pallas_call for one upper pyramid level: same I/O contract as
    hme_pallas._level_call, G blocks per inner iteration."""
    step, ca, cb, nd, lmax, lpad = hp._geom(cfg, level)
    # cap the gang at the longest diagonal: lanes past lmax can never be
    # live, and every extra lane is Python-unrolled trace/compile cost
    G = max(1, min(LW // cfg.blk_w, 8, lmax))
    ngr = -(-lmax // G)

    def kernel(cand_ref, scal_ref, src_ref, ref_ref, ogr_ref,
               out_ref, ring_ref):
        d = pl.program_id(0)
        gx = scal_ref[0, 0]
        gy = scal_ref[0, 1]
        quant = scal_ref[0, 2]
        with hw.backend_hooks(hp._reader, hp._roll, True):
            def body(c, _):
                k0 = c * G
                ks = [k0 + g for g in range(G)]
                a_s, b_s, lane_oks, gs = [], [], [], []
                for k in ks:
                    a = jnp.maximum(0, d - (cb - 1)) + k
                    b = d - a
                    a_s.append(a)
                    b_s.append(b)
                    lane_oks.append((k < lmax) & (a < ca) & (b >= 0)
                                    & (b < cb))
                    gs.append(_lane_ctx(cfg, level, cand_ref, ring_ref,
                                        d, k, a, b))
                i_s = [a * step for a in a_s]
                j_s = [b * step for b in b_s]

                def blk():
                    rs, _ = gang_block_search(cfg, level, gs, src_ref,
                                              ref_ref, ogr_ref, gx, gy,
                                              quant, i_s, j_s, lane_oks)
                    outs = []
                    for r in rs:
                        v = r["valid"]
                        outs.append((jnp.where(v, r["dx"] * step, 0),
                                     jnp.where(v, r["dy"] * step, 0)))
                    return outs

                z = jnp.int32(0)
                outs = gang_guard(lane_oks, blk, [(z, z)] * G)
                for g, k in enumerate(ks):
                    ox, oy = outs[g]

                    @pl.when(k < lmax)  # slots past the diagonal run are
                    def _(ox=ox, oy=oy, k=k):  # never written (as per-block)
                        ring_ref[0, d % 3, k] = ox
                        ring_ref[1, d % 3, k] = oy
                        out_ref[0, 0, k] = ox
                        out_ref[0, 1, k] = oy
                return 0

            jax.lax.fori_loop(0, ngr, body, 0)

    def call(cand, scal, src, ref, ogr):
        return pl.pallas_call(
            kernel, grid=(nd,),
            out_shape=jax.ShapeDtypeStruct((nd, hp.NFU, lpad), jnp.int32),
            in_specs=[
                pl.BlockSpec((1, lpad, hp.NCOL), lambda d: (d, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8), lambda d: (0, 0),
                             memory_space=pltpu.SMEM),
            ] + [pl.BlockSpec(s[0], lambda d: (0, 0),
                              memory_space=pltpu.VMEM)
                 for s in shapes],
            out_specs=pl.BlockSpec((1, hp.NFU, lpad), lambda d: (d, 0, 0),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((3, 3, lpad), jnp.int32)],
            interpret=hp._interpret(),
            compiler_params=None if hp._interpret() else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(cand, scal, src, ref, ogr)

    return call


@functools.lru_cache(maxsize=None)
def _level0_call(cfg, shapes):
    """Gang pallas_call for the base level: full level-0 pipeline with
    ganged metrics; the per-lane subpel rides the per-block reader hooks
    (phase-plane qpsad). Same I/O contract as hme_pallas._level0_call."""
    step, ca, cb, nd, lmax, lpad = hp._geom(cfg, 0)
    G = max(1, min(LW // cfg.blk_w, 8, lmax))  # see _level_call
    ngr = -(-lmax // G)

    def kernel(cand_ref, scal_ref, src_ref, ref_ref, ogr_ref,
               srcu_ref, srcv_ref, refu_ref, refv_ref, out_ref, ring_ref):
        d = pl.program_id(0)
        gx = scal_ref[0, 0]
        gy = scal_ref[0, 1]
        quant = scal_ref[0, 2]
        skip_thresh = scal_ref[0, 3]
        with hw.backend_hooks(hp._reader, hp._roll, True):
            def body(c, _):
                k0 = c * G
                ks = [k0 + g for g in range(G)]
                a_s, b_s, lane_oks, gs = [], [], [], []
                for k in ks:
                    a = jnp.maximum(0, d - (cb - 1)) + k
                    b = d - a
                    a_s.append(a)
                    b_s.append(b)
                    lane_oks.append((k < lmax) & (a < ca) & (b >= 0)
                                    & (b < cb))
                    gs.append(_lane_ctx(cfg, 0, cand_ref, ring_ref,
                                        d, k, a, b))

                def blk():
                    outs = gang_level0_block(
                        cfg, gs, src_ref, ref_ref, ogr_ref, srcu_ref,
                        srcv_ref, refu_ref, refv_ref, gx, gy, quant,
                        skip_thresh, a_s, b_s, lane_oks)
                    masked = []
                    for g, o in enumerate(outs):
                        (mvx, mvy, flags, err, dc, submask, skipf, v,
                         terr, ndiff, nelig, nintra) = o
                        vi = v.astype(jnp.int32)
                        masked.append((mvx * vi, mvy * vi, flags * vi,
                                       err * vi, dc * vi, submask * vi,
                                       skipf.astype(jnp.int32) * vi, vi,
                                       terr, ndiff, nelig, nintra))
                    return masked

                z = jnp.int32(0)
                outs = gang_guard(lane_oks, blk, [(z,) * 12] * G)
                for g, k in enumerate(ks):
                    o = outs[g]

                    @pl.when(k < lmax)
                    def _(o=o, k=k):
                        ring_ref[0, d % 3, k] = o[0]
                        ring_ref[1, d % 3, k] = o[1]
                        ring_ref[2, d % 3, k] = o[6]
                        for f in range(12):
                            out_ref[0, f, k] = o[f]
                return 0

            jax.lax.fori_loop(0, ngr, body, 0)

    def call(cand, scal, src, ref, ogr, src_u, src_v, ref_u, ref_v):
        return pl.pallas_call(
            kernel, grid=(nd,),
            out_shape=jax.ShapeDtypeStruct((nd, hp.NF0, lpad), jnp.int32),
            in_specs=[
                pl.BlockSpec((1, lpad, hp.NCOL), lambda d: (d, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8), lambda d: (0, 0),
                             memory_space=pltpu.SMEM),
            ] + [pl.BlockSpec(s[0], lambda d: (0, 0),
                              memory_space=pltpu.VMEM)
                 for s in shapes],
            out_specs=pl.BlockSpec((1, hp.NF0, lpad), lambda d: (d, 0, 0),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((3, 3, lpad), jnp.int32)],
            interpret=hp._interpret(),
            compiler_params=None if hp._interpret() else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(cand, scal, src, ref, ogr, src_u, src_v, ref_u, ref_v)

    return call


@functools.lru_cache(maxsize=None)
def make_motion_est(cfg):
    """Pallas gang twin of hme_pallas.make_motion_est: gang kernels at
    every pyramid level. Byte-identical outputs (ref: hme.c:2001-2016)."""
    npl = cfg.pyramid_levels

    def f(src_planes, ref_planes, ogr_planes, src_u, src_v, ref_u, ref_v,
          tmv_x, tmv_y, quant, skip_thresh):
        tmv_x = jnp.asarray(tmv_x, jnp.int32)
        tmv_y = jnp.asarray(tmv_y, jnp.int32)
        quant = jnp.asarray(quant, jnp.int32)
        skip_thresh = jnp.asarray(skip_thresh, jnp.int32)
        srcs = [hp._pad_plane(jnp.asarray(p)) for p in src_planes]
        refs = [hp._pad_plane(jnp.asarray(p)) for p in ref_planes]
        ogrs = [hp._pad_plane(jnp.asarray(p)) for p in ogr_planes]
        chroma = [hp._pad_plane(jnp.asarray(p))
                  for p in (src_u, src_v, ref_u, ref_v)]
        gx = jnp.int32(0)
        gy = jnp.int32(0)
        parent_x = jnp.zeros((cfg.nbv, cfg.nbh), jnp.int32)
        parent_y = jnp.zeros((cfg.nbv, cfg.nbh), jnp.int32)
        for level in range(npl, 0, -1):
            cand = hp._pregather(cfg, level, parent_x, parent_y,
                                 tmv_x, tmv_y)
            scal = jnp.stack([gx, gy, quant, skip_thresh,
                              gx, gx, gx, gx]).astype(jnp.int32)[None]
            planes = (srcs[level], refs[level], ogrs[level])
            shapes = tuple((p.shape, str(p.dtype)) for p in planes)
            rows = hp._masked_rows(cfg, level, _level_call(
                cfg, level, shapes)(cand, scal, *planes))
            fx = hp._unskew(cfg, level, rows, 0)
            fy = hp._unskew(cfg, level, rows, 1)
            gx, gy = hw.global_motion_graph(cfg, level, fx, fy)
            parent_x, parent_y = fx, fy
        cand = hp._pregather(cfg, 0, parent_x, parent_y, tmv_x, tmv_y)
        scal = jnp.stack([gx, gy, quant, skip_thresh,
                          gx, gx, gx, gx]).astype(jnp.int32)[None]
        planes = (srcs[0], refs[0], ogrs[0]) + tuple(chroma)
        shapes = tuple((p.shape, str(p.dtype)) for p in planes)
        rows = hp._masked_rows(cfg, 0, _level0_call(cfg, shapes)(
            cand, scal, *planes))
        st = dict(
            fx=hp._unskew(cfg, 0, rows, 0),
            fy=hp._unskew(cfg, 0, rows, 1),
            flags=hp._unskew(cfg, 0, rows, 2),
            err=hp._unskew(cfg, 0, rows, 3),
            dc=hp._unskew(cfg, 0, rows, 4),
            submask=hp._unskew(cfg, 0, rows, 5),
            fskip=hp._unskew(cfg, 0, rows, 6).astype(jnp.uint8),
            terr=rows[:, 8, :].sum(),
            ndiff=rows[:, 9, :].sum(),
            nelig=rows[:, 10, :].sum(),
            nintra=rows[:, 11, :].sum(),
        )
        return st

    return jax.jit(f)


def motion_est(enc, d):
    """Drop-in motion_est using the gang kernels (lockstep-batchable)."""
    cfg, inputs = hw.prepare_motion_est(enc, d)
    submit = getattr(enc, "dev_submit", None)
    if submit is not None:
        st = submit(("hme_gang", cfg), make_motion_est, inputs, fetch=True)
    else:
        st = make_motion_est(cfg)(*inputs)
    hw.apply_motion_est(enc, d, st)
