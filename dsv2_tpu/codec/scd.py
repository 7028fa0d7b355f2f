"""Scene-change detection + motion statistics (host scalar port).

(ref: src/dsv_encoder.c:129-250, 545-651)
"""
import numpy as np

from ..core import constants as K
from ..core import intmath as im
from ..core import mvmath


def avg_motion(enc, mf, p):
    """(ref: dsv_encoder.c:129-176)."""
    nbh, nbv = p.nbh, p.nbv
    avgx = avgy = 0
    chaos = stat = 0
    skip = mf.bit(K.MV_BIT_SKIP)
    for j in range(nbv):
        for i in range(nbh):
            k = i + j * nbh
            if not skip[k]:
                avgx += int(mf.x[k])
                avgy += int(mf.y[k])
            if skip[k]:
                stat += 1
            else:
                ndx, ndy = mvmath.neighbordif2(mf.x, mf.y, skip, nbh, i, j)
                if ndx > 4 or ndy > 4:
                    chaos += 1
                else:
                    stat += 1
    nblk = nbh * nbv
    avgx = (abs(avgx) + abs(avgy)) // (nblk * 2)
    avgx = max(avgx, 1)
    enc.curr_avgmot = avgx
    enc.motion_static = stat * 100 // nblk
    chaos = chaos * 100 // nblk
    if enc.prev_chaos < 0:
        enc.motion_chaos = chaos
        enc.prev_chaos = enc.motion_chaos
    else:
        enc.prev_chaos = (enc.prev_chaos + enc.motion_chaos) // 2
        enc.motion_chaos = chaos
    return avgx


def _mv_cost(mf, p, i, j, mx, my, q):
    return mvmath.mv_cost(mf.x, mf.y, p.nbh, p.blk_w, p.blk_h,
                          p.meta.width, p.meta.height, i, j, mx, my, q, 0)


def scene_complexity(enc, mf, p):
    """(ref: dsv_encoder.c:179-250)."""
    nbh, nbv = p.nbh, p.nbv
    complexity = 0
    skip = mf.bit(K.MV_BIT_SKIP)
    intra = mf.bit(K.MV_BIT_INTRA)
    if enc.rc_mode == K.RC_ABR:
        maxpot = _mv_cost(mf, p, 0, 0, 64, 64, enc.prev_quant)
        maxpot += 12
        maxpot += 64
        maxpot = (maxpot * (nbh * nbv) + 1) >> 1
        for j in range(nbv):
            for i in range(nbh):
                k = i + j * nbh
                if not skip[k]:
                    complexity += _mv_cost(mf, p, i, j, int(mf.x[k]),
                                           int(mf.y[k]), enc.prev_quant)
                    complexity += int(mf.err[k]) - int(enc.avg_err)
                if intra[k]:
                    complexity += 16 if mf.submask[k] == K.MASK_ALL_INTRA else 4
    elif enc.rc_mode == K.RC_CRF:
        maxpot = 70 * nbh * nbv
        for j in range(nbv):
            for i in range(nbh):
                k = i + j * nbh
                if skip[k]:
                    complexity -= 100
                else:
                    complexity += _mv_cost(mf, p, i, j, int(mf.x[k]),
                                           int(mf.y[k]), enc.prev_quant)
                if intra[k]:
                    complexity += (100 if mf.submask[k] == K.MASK_ALL_INTRA
                                   else 40)
    else:
        return 0
    if complexity <= 0:
        return 0
    return complexity * 100 // maxpot


def scene_change_detection(enc, d):
    """(ref: dsv_encoder.c:545-651). Returns 1 when an I frame is forced."""
    p = d.params
    mf = d.final_mvs
    SQR = lambda x: x * x
    intra_pct = enc.curr_intra_pct
    scblocks = enc.curr_scblocks
    avgmot = avg_motion(enc, mf, p)
    chaos = enc.motion_chaos
    dchaos = abs(chaos - enc.prev_chaos)
    gopdiv = abs(enc.gop) * 3 // 4
    closeness = int(d.fnum) - int(enc.prev_gop)
    complexity = scene_complexity(enc, mf, p)
    closefac = im.divt(closeness, max(gopdiv, 1))
    if complexity > 256 and chaos < 5:
        shift = 9
    elif complexity > chaos * 2:
        shift = 8
    elif complexity > chaos:
        shift = 7
    else:
        shift = 6
    tipct = SQR(intra_pct) >> 5
    likely_sc = 1 if (intra_pct * 3 // 2 > scblocks) else 0
    likely_sc += 1 if (tipct > scblocks) else 0
    if scblocks > enc.scene_change_pct and chaos < 34:
        scblocks = SQR(scblocks * 2) // max(enc.scene_change_pct, 1)
        likely_sc += 1
    else:
        scblocks = SQR(scblocks) // max(enc.scene_change_pct, 1)
    shift = max(shift - likely_sc, 5)
    blks = (max(dchaos // 16 + enc.avg_err // 8, 1) * scblocks
            * max(complexity, 1) * max(closefac, 1)) >> (shift + 1)
    sc = (enc.do_scd and ((blks > 120)
          or (blks > enc.scene_change_pct and avgmot < 20
              and enc.motion_chaos <= max(enc.prev_chaos - 10, 30))))
    high_intra = intra_pct > enc.intra_pct_thresh
    if sc or high_intra:
        p.has_ref = 0
        return 1
    enc.curr_complexity = complexity

    nintra = 0
    skipn = 0
    skip = mf.bit(K.MV_BIT_SKIP)
    for j in range(p.nbv):
        for i in range(p.nbh):
            idx = i + j * p.nbh
            fl = int(mf.flags[idx])
            enc.intra_map[idx] |= 1 if (fl & (1 << K.MV_BIT_INTRA)) else 0
            if enc.intra_map[idx]:
                if skip[idx] or (mf.x[idx] == 0 and mf.y[idx] == 0):
                    if fl & (1 << K.MV_BIT_MAINTAIN):
                        nintra += 3
                        skipn += 2
                    else:
                        nintra += 1
                        skipn += 1
                elif ((fl & (1 << K.MV_BIT_NOXMITY))
                      and (fl & (1 << K.MV_BIT_MAINTAIN))):
                    nintra += 1
            nintra += int(enc.intra_map[idx])
    nblk = p.nbh * p.nbv
    nintra = nintra * 100 // nblk
    skipn = skipn * 100 // nblk
    if (nintra > enc.intra_pct_thresh and enc.curr_avgmot < 10
            and enc.motion_chaos <= im.clamp(enc.prev_chaos // 2 + skipn,
                                             20, 40)):
        p.has_ref = 0
        return 1
    return 0
