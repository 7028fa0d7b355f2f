"""Hierarchical motion estimation (encoder host reference implementation).

Exact-semantics port of the reference's HME (ref: src/hme.c): serial
top-down pyramid refinement with raster-order wavefront dependencies
(spatial candidates and the MV cost median predictor read already-decided
neighbors). The per-block metrics are numpy-vectorized; the decision loop is
host Python. A TPU wavefront implementation (diagonal batching) replaces the
hot paths incrementally — this module remains the bit-exactness oracle.

Unit conventions preserved verbatim from the reference: level-0 fields store
quarter-pel vectors, higher-level fields store full-res full-pel vectors;
QP2FP conversions apply regardless (ref: hme.c:38-43, 1594-1630).
"""
import numpy as np

from ..core import constants as K
from ..core import intmath as im
from ..core import mvmath
from ..core.frame import Frame, ds2x_luma, B
from ..codec.motion import MotionField
from . import blockanalysis as ba
from .. import native as nat

N_SEARCH = 9
RECTX = [0, 1, -1, 0, 0, -1, 1, -1, 1]
RECTY = [0, 0, 0, 1, -1, -1, -1, 1, 1]
SP_SAD_SZ = K.MIN_BLOCK_SIZE        # 16
SP_DIM = SP_SAD_SZ + 1              # 17
HP_STRIDE = SP_DIM * 2              # 34
QP_STRIDE = SP_DIM * 4              # 68
U32 = 0xFFFFFFFF


def u32(x):
    """C unsigned-int wraparound."""
    return x & U32


def w32(x):
    """C signed-int (two's complement) wraparound."""
    return ((x + 0x80000000) & U32) - 0x80000000


def avg2(a, b):
    return (a + b + 1) >> 1


def uavg4(a, b, c, d):
    return (a + b + c + d + 2) >> 2


def mk_mv(fp, hp, qp):
    return fp * 4 + hp * 2 + qp


def qp2fp(x, y):
    return im.sar_r(x, 2), im.sar_r(y, 2)


# ---------------------------------------------------------------------------
# metrics (ref: hme.c:126-341)
# ---------------------------------------------------------------------------

def _quads(a):
    h2, w2 = a.shape[0] // 2, a.shape[1] // 2
    a = a[:2 * h2, :2 * w2].astype(np.int64)
    return (a[0::2, 0::2], a[0::2, 1::2], a[1::2, 0::2], a[1::2, 1::2])


def _metr_acc(a, b, psy):
    a1, a2, a3, a4 = _quads(a)
    b1, b2, b3, b4 = _quads(b)
    ew, tw, aw = psy
    se = uavg4(np.abs(a1 - b1), np.abs(a2 - b2), np.abs(a3 - b3),
               np.abs(a4 - b4))
    ta = uavg4(np.abs(a1 - a2), np.abs(a2 - a3), np.abs(a3 - a4),
               np.abs(a4 - a1))
    tb = uavg4(np.abs(b1 - b2), np.abs(b2 - b3), np.abs(b3 - b4),
               np.abs(b4 - b1))
    s0 = uavg4(a1, a2, a3, a4)
    s1 = uavg4(b1, b2, b3, b4)
    acc = ((se * se) << ew) + (((ta - tb) ** 2) << tw) + (((s0 - s1) ** 2) << aw)
    return int(acc.sum()) & U32


def _metric_return(acc, w, h):
    return (im.iisqrt(acc) * w * h) // avg2(w, h)


def fastmetr(a, b, psy):
    h, w = a.shape[0], a.shape[1]
    if w == 0 or h == 0:
        return 0x7FFFFFFF
    return _metric_return(_metr_acc(a, b, psy), w, h)


def umetr(a, b, psy):
    return _metr_acc(a, b, psy)


def fastsse(a, b):
    h, w = a.shape[0], a.shape[1]
    if w == 0 or h == 0:
        return 0x7FFFFFFF
    d = a.astype(np.int64) - b.astype(np.int64)
    return int((d * d).sum()) & U32


def hier_metr(level, a, b, psy):
    if level > 1:
        return fastsse(a, b)
    return fastmetr(a, b, psy)


# ---------------------------------------------------------------------------
# half/quarter-pel interpolation of the probe window (ref: hme.c:775-837)
# ---------------------------------------------------------------------------

def _hpf_me(a, b, c, d):
    return 5 * (b + c) - (a + d)


def hpel_grid(refwin):
    """refwin: (21, 21) int window whose (1, 1) element is the probe origin
    (matches the ref pointer offset at hme.c:1102-1106 reading rows -1..18 and
    cols -1..18). Returns the 34x34 half-pel grid zero-padded to 35x35."""
    r = refwin.astype(np.int64)
    # horizontal ME filter of rows -1..18 at cols 0..16
    cols = np.arange(SP_DIM)
    hbuf = _hpf_me(r[:, cols], r[:, cols + 1], r[:, cols + 2], r[:, cols + 3])
    # hbuf[j] corresponds to ref row j-1 (20 rows of 17)
    g = np.zeros((HP_STRIDE + 1, HP_STRIDE + 1), dtype=np.int64)
    fr = r[1:1 + SP_DIM, 1:1 + SP_DIM]          # full-pel samples
    g[0::2, 0::2][:SP_DIM, :SP_DIM] = fr
    # horizontal halves: clamp((hpfh + 4) >> 3)
    hh = np.clip((_hpf_me(r[1:1 + SP_DIM, 0:SP_DIM],
                          r[1:1 + SP_DIM, 1:1 + SP_DIM],
                          r[1:1 + SP_DIM, 2:2 + SP_DIM],
                          r[1:1 + SP_DIM, 3:3 + SP_DIM]) + 4) >> 3, 0, 255)
    g[0::2, 1::2][:SP_DIM, :SP_DIM] = hh
    # vertical halves
    vv = np.clip((_hpf_me(r[0:SP_DIM, 1:1 + SP_DIM],
                          r[1:1 + SP_DIM, 1:1 + SP_DIM],
                          r[2:2 + SP_DIM, 1:1 + SP_DIM],
                          r[3:3 + SP_DIM, 1:1 + SP_DIM]) + 4) >> 3, 0, 255)
    g[1::2, 0::2][:SP_DIM, :SP_DIM] = vv
    # diagonal: vertical ME filter over the horizontal filter buffer
    dg = _hpf_me(hbuf[0:SP_DIM], hbuf[1:1 + SP_DIM], hbuf[2:2 + SP_DIM],
                 hbuf[3:3 + SP_DIM])
    dg = np.clip((dg + (1 << 5)) >> 6, 0, 255)
    g[1::2, 1::2][:SP_DIM, :SP_DIM] = dg
    return g


def qpel_grid(h):
    """h: (35, 35) half-pel grid (+ zero pad row/col). Returns (68, 68)
    quarter-pel grid (ref: hme.c:815-837)."""
    n = HP_STRIDE
    q = np.zeros((QP_STRIDE, QP_STRIDE), dtype=np.int64)
    h0 = h[:n, :n]
    hx = h[:n, 1:n + 1]
    hy = h[1:n + 1, :n]
    hxy = h[1:n + 1, 1:n + 1]
    q[0::2, 0::2] = h0
    q[0::2, 1::2] = avg2(h0, hx)
    q[1::2, 0::2] = avg2(h0, hy)
    q[1::2, 1::2] = uavg4(h0, hx, hy, hxy)
    return q


def qpsad(a, qgrid, t0, t1, psy):
    """(ref: hme.c:244-269). a: (16, 16) source window; probe offset (t0, t1)
    in quarter-pel around the grid origin at (4, 4)."""
    sub = qgrid[4 + t1:4 + t1 + 61:4, 4 + t0:4 + t0 + 61:4]  # 16x16 fpel taps
    a1, a2, a3, a4 = _quads(a)
    b1 = sub[0::2, 0::2].astype(np.int64)
    b2 = sub[0::2, 1::2].astype(np.int64)
    b3 = sub[1::2, 0::2].astype(np.int64)
    b4 = sub[1::2, 1::2].astype(np.int64)
    ew, tw, aw = psy
    se = uavg4(np.abs(a1 - b1), np.abs(a2 - b2), np.abs(a3 - b3),
               np.abs(a4 - b4))
    ta = uavg4(np.abs(a1 - a2), np.abs(a2 - a3), np.abs(a3 - a4),
               np.abs(a4 - a1))
    tb = uavg4(np.abs(b1 - b2), np.abs(b2 - b3), np.abs(b3 - b4),
               np.abs(b4 - b1))
    s0 = uavg4(a1, a2, a3, a4)
    s1 = uavg4(b1, b2, b3, b4)
    acc = ((se * se) << ew) + (((ta - tb) ** 2) << tw) + (((s0 - s1) ** 2) << aw)
    return _metric_return(int(acc.sum()) & U32, SP_SAD_SZ, SP_SAD_SZ)


# ---------------------------------------------------------------------------
# helpers over bordered planes
# ---------------------------------------------------------------------------

def win(plane, x, y, w, h):
    """(h, w) int64 window at visible coords (x, y) of a bordered plane."""
    return plane[B + y:B + y + h, B + x:B + x + w].astype(np.int64)


def invalid_block(frame, bx, by, bw, bh, pad):
    b = B  # all HME frames are bordered
    return ((bx - pad) < -b or (by - pad) < -b
            or (bx + bw + pad) >= (frame.width + b)
            or (by + bh + pad) >= (frame.height + b))


def block_avg(w_):
    return int(w_.sum()) // w_.size


# ---------------------------------------------------------------------------
# EPRM / intra / error analysis (ref: hme.c:451-490, 839-1049)
# ---------------------------------------------------------------------------

def calc_eprm(srcw, mvrw, avg_src, avg_ref):
    """(ref: hme.c:451-490)."""
    s = srcw.astype(np.int64)
    m = mvrw.astype(np.int64)
    a_src = avg_src - 128
    a_ref = avg_ref - 128
    clipr = bool((((s - m) + 128) & ~0xFF).any())
    clipi = bool(((s - a_ref) & ~0xFF).any())
    clipd = bool(((s - a_src) & ~0xFF).any())
    return clipi, clipd, clipr


def err_intra(a, b, avg_sb, avg_src, psy, ratio):
    """(ref: hme.c:839-889). Returns (intra_sb, intra_src, inter)."""
    a1, a2, a3, a4 = _quads(a)
    b1, b2, b3, b4 = _quads(b)
    ew, tw, aw = psy
    s0 = uavg4(a1, a2, a3, a4)
    s1 = uavg4(b1, b2, b3, b4)
    ta = uavg4(np.abs(a1 - a2), np.abs(a2 - a3), np.abs(a3 - a4),
               np.abs(a4 - a1))
    tb = uavg4(np.abs(b1 - b2), np.abs(b2 - b3), np.abs(b3 - b4),
               np.abs(b4 - b1))
    ae = uavg4(np.abs(a1 - b1), np.abs(a2 - b2), np.abs(a3 - b3),
               np.abs(a4 - b4))
    inter = ((((ae * ae * ratio) & U32) >> (5 - ew)) + (((ta - tb) ** 2) << tw)
             + (((s0 - s1) ** 2) << aw)).sum()
    aesb = uavg4(np.abs(a1 - avg_sb), np.abs(a2 - avg_sb),
                 np.abs(a3 - avg_sb), np.abs(a4 - avg_sb))
    intra_sb = (((aesb * aesb) << ew) + ((ta * ta) << tw)
                + (((s0 - avg_sb) ** 2) << (aw + 1))).sum()
    aesr = uavg4(np.abs(a1 - avg_src), np.abs(a2 - avg_src),
                 np.abs(a3 - avg_src), np.abs(a4 - avg_src))
    intra_src = (((aesr * aesr) << ew) + ((ta * ta) << tw)
                 + (((s0 - avg_src) ** 2) << (aw + 1))).sum()
    return (int(intra_sb) & U32, int(intra_src) & U32,
            ((int(inter) & U32) * ratio & U32) >> 5)


def test_subblock_intra_y(p, refmv_xy, mv, splane, sx, sy, rplane, rx, ry,
                          detail_src, avg_src, neidif, ratio, bw, bh,
                          psyscale):
    """(ref: hme.c:891-985). mv: dict with x, y, submask, dc, flags."""
    if refmv_xy is None:
        refmv_xy = (mv["x"], mv["y"])
    if ((mv["x"] or mv["y"]) and neidif < 3
            and abs(refmv_xy[0] - mv["x"]) < 3
            and abs(refmv_xy[1] - mv["y"]) < 3):
        return
    sbw, sbh = bw // 2, bh // 2
    if sbw == 0 or sbh == 0:
        return
    psy = (0, 1, 2)
    detail_src = detail_src + detail_src // max(neidif, 1)
    bits = [K.MASK_INTRA00, K.MASK_INTRA01, K.MASK_INTRA10, K.MASK_INTRA11]
    bit_index = 0
    avg_tot = err_sub = err_src = 0
    nsub = 0
    for g in (0, sbh):
        for f in (0, sbw):
            if mv["submask"] & bits[bit_index]:
                bit_index += 1
                continue
            rfeat = nat.block_features(rplane, rx + f, ry + g, sbw, sbh)
            avg_sub = int(rfeat[1])
            sfeat = nat.block_features(splane, sx + f, sy + g, sbw, sbh)
            local_detail, avg_local = int(sfeat[0]), int(sfeat[1])
            dcd = abs(int(avg_local) - int(avg_sub)) + 2
            if local_detail > (dcd * dcd * bw * bh * ratio) >> 5:
                bit_index += 1
                continue
            dc = (avg_local + avg_src * 3 + 2) >> 2
            sub_pred_err, src_pred_err, intererr = nat.err_intra(
                splane, sx + f, sy + g, rplane, rx + f, ry + g,
                avg_sub, dc, sbw, sbh, psy, ratio)
            lo = avg2(detail_src, local_detail)
            hi = detail_src
            lerp = (lo * (32 - psyscale) + hi * psyscale) >> 5
            local_detail = max(lerp, lo)
            sub_better = (sub_pred_err + local_detail) < intererr
            src_better = (src_pred_err + local_detail) < intererr
            if sub_better or src_better:
                mv["submask"] |= bits[bit_index]
                err_src += src_pred_err
                err_sub += sub_pred_err
                if sub_pred_err < src_pred_err:
                    avg_tot += avg_sub
                else:
                    avg_tot += dc
                nsub += 1
                detail_src = detail_src * 4 // 5
            bit_index += 1
    if mv["submask"]:
        mv["intra"] = True
        if err_src < err_sub:
            mv["dc"] = (avg_tot // nsub) | K.SRC_DC_PRED
        else:
            mv["dc"] = 0


def test_subblock_intra_c(p, mv, sp, rp, mad, detail_src, avg_src,
                          cbx, cby, cbmx, cbmy, cbw, cbh):
    """(ref: hme.c:987-1048). sp/rp: (u_plane, v_plane) bordered arrays."""
    if p.effort < 6:
        return
    sbw, sbh = cbw // 2, cbh // 2
    already_intra = mv["intra"]
    thr = detail_src if already_intra else detail_src * detail_src
    if (sbw == 0 or sbh == 0 or mad <= thr or thr > 64
            or (abs(mv["x"]) < 4 and abs(mv["y"]) < 4)):
        return
    avg_ramp = avg_src * avg_src >> 8
    bits = [K.MASK_INTRA00, K.MASK_INTRA01, K.MASK_INTRA10, K.MASK_INTRA11]
    bit_index = 0
    for g in (0, sbh):
        for f in (0, sbw):
            if mv["submask"] & bits[bit_index]:
                bit_index += 1
                continue
            us = win(sp[0], cbx + f, cby + g, sbw, sbh)
            vs = win(sp[1], cbx + f, cby + g, sbw, sbh)
            ur = win(rp[0], cbmx + f, cbmy + g, sbw, sbh)
            vr = win(rp[1], cbmx + f, cbmy + g, sbw, sbh)
            uavg_s, vavg_s = ba.c_average(us, vs)
            uavg_r, vavg_r = ba.c_average(ur, vr)
            erru = (uavg_s - uavg_r) ** 2
            errv = (vavg_s - vavg_r) ** 2
            dif = (erru + errv) * avg_ramp >> 8
            if dif > thr:
                mv["submask"] |= bits[bit_index]
            bit_index += 1
    if mv["submask"]:
        mv["intra"] = True


def yuv_max_subblock_err(src, ref, bx, by, brx, bry, bw, bh,
                         cbx, cby, cbrx, cbry, cbw, cbh, psy):
    """(ref: hme.c:369-409). Returns max quadrant error per plane."""
    out = []
    bw2, bh2 = bw // 2, bh // 2
    cw2, ch2 = cbw // 2, cbh // 2
    for z in range(3):
        if z == 0:
            x0, y0, rx, ry, w2, h2 = bx, by, brx, bry, bw2, bh2
        else:
            x0, y0, rx, ry, w2, h2 = cbx, cby, cbrx, cbry, cw2, ch2
        sub = []
        for g in (0, h2):
            for f in (0, w2):
                if w2 and h2:
                    sub.append(nat.umetr(src.planes[z], x0 + f, y0 + g,
                                         ref.planes[z], rx + f, ry + g,
                                         w2, h2, psy))
                else:
                    sub.append(0)
        out.append(max(sub))
    return out


def outofbounds(i, j, nxb, nyb, y_w, y_h, mvx, mvy):
    limx = ((nxb - 1) * y_w) - 1
    limy = ((nyb - 1) * y_h) - 1
    px = i * y_w + im.sar(mvx, 2)
    py = j * y_h + im.sar(mvy, 2)
    return px < 0 or py < 0 or px >= limx or py >= limy


# ---------------------------------------------------------------------------
# subpixel refinement (ref: hme.c:1051-1164)
# ---------------------------------------------------------------------------

def subpixel_me(p, mvf_x, mvf_y, mv, fpelx, fpely, src, ref, i, j, best,
                quant, bx, by, bw, bh, psy):
    mv["x"] = 0
    mv["y"] = 0
    if best == 0:
        return best
    yarea = bw * bh
    quad = []
    dx4 = [1, -1, 0, 0]
    dy4 = [0, 0, 1, -1]
    for n in range(4):
        quad.append(nat.sse(src.planes[0], bx, by, ref.planes[0],
                            bx + fpelx + dx4[n], by + fpely + dy4[n], bw, bh))
    area_ratio = 8 * (SP_SAD_SZ * SP_SAD_SZ) // yarea
    iarea_ratio = 8 * yarea // (SP_SAD_SZ * SP_SAD_SZ)
    best = u32(best * area_ratio) >> 3
    xx = bx + ((bw >> 1) - ((SP_SAD_SZ + 1) // 2))
    yy = by + ((bh >> 1) - ((SP_SAD_SZ + 1) // 2))
    # probe window origin offset -1 for negative hpel; the grid builder
    # reads one row/col above-left and two beyond (21x21 total)
    rx = xx + fpelx - 1
    ry = yy + fpely - 1
    q = nat.make_qpel_grid(ref.planes[0], rx - 1, ry - 1)

    pri = [0, -1]
    sec = [-1, 0]
    ms1 = quad[1]
    ms2 = quad[3]
    if quad[3] >= quad[2]:
        pri = [0, 1]
        ms2 = quad[2]
    if quad[1] >= quad[0]:
        sec = [1, 0]
        ms1 = quad[0]
    if ms2 > ms1:
        pri, sec = sec, pri
    diag = [pri[0] + sec[0], pri[1] + sec[1]]
    testv = [pri, sec, diag]
    bestv = [0, 0]
    for n in range(7):
        if n == 6:
            t = [pri[0] + diag[0], pri[1] + diag[1]]
        else:
            hp = 0 if (n & 1) else 1
            t = [testv[n >> 1][0] << hp, testv[n >> 1][1] << hp]
        if ((t[0] | t[1]) & 1) and p.effort < 8:
            continue
        score = nat.qpsad(src.planes[0], xx, yy, q, t[0], t[1], psy)
        evx = mk_mv(fpelx, 0, t[0])
        evy = mk_mv(fpely, 0, t[1])
        score += mv_cost_lvl(mvf_x, mvf_y, p, i, j, evx, evy, quant, 0)
        if best > score:
            best = score
            bestv = list(t)
    mv["x"] = bestv[0]
    mv["y"] = bestv[1]
    return u32(best * iarea_ratio) >> 3


def mv_cost_lvl(mvf_x, mvf_y, p, i, j, mx, my, q, level):
    """(ref: hme.c:354-366)."""
    sqr = 1 if level > 1 else 0
    cost = nat.mv_cost(mvf_x, mvf_y, p.nbh, p.blk_w, p.blk_h,
                       p.meta.width, p.meta.height, i, j, mx, my, q, sqr)
    cost = min(cost, 1 << 19)
    if sqr:
        return cost * ((q * q) >> K.MAX_QP_BITS) >> (K.MAX_QP_BITS - 2)
    return 3 * cost * q >> K.MAX_QP_BITS


# ---------------------------------------------------------------------------
# level refinement (ref: hme.c:1166-1833)
# ---------------------------------------------------------------------------

def _find_inliers(cands, ax, ay):
    """(ref: hme.c:1259-1298). cands: list of (x, y)."""
    n = len(cands)
    if n == 0:
        return [], ax, ay, 0
    dist = [(c[0] - ax) ** 2 + (c[1] - ay) ** 2 for c in cands]
    avgd = sum(dist) // n
    ssd = 0
    for d in dist:
        ssd = w32(ssd + w32((d - avgd) ** 2))
    thresh = avgd + im.iisqrt(im.divt(ssd, n) & U32)
    newl = [c for c, d in zip(cands, dist) if d <= thresh]
    if not newl:
        return [], ax, ay, 0
    ax = im.divt(sum(c[0] for c in newl), len(newl))
    ay = im.divt(sum(c[1] for c in newl), len(newl))
    return newl, ax, ay, len(newl)


def refine_level(hme, level, gx, gy):
    """(ref: hme.c:1372-1833). Returns nintra; fills hme.mvf[level]."""
    p = hme.params
    y_w, y_h = p.blk_w, p.blk_h
    nxb, nyb = p.nbh, p.nbv
    src = hme.src[level]
    ref = hme.ref[level]
    ogr = hme.ogr[level]
    mvf = MotionField(nxb, nyb)
    hme.mvf[level] = mvf
    mvf_x = mvf.x
    mvf_y = mvf.y
    skipfield = np.zeros(nxb * nyb, dtype=bool)
    hs = K.fmt_h_shift(p.meta.subsamp)
    vs = K.fmt_v_shift(p.meta.subsamp)
    parent = hme.mvf[level + 1] if level < hme.pyramid_levels else None
    step = 1 << level
    parent_mask = ~((step << 1) - 1)
    quant_rd = hme.quant * hme.quant
    nintra = 0
    total_err = 0
    ndiff = 0
    num_eligible = 0
    squared = level > 1
    sw, sh = src.width, src.height

    for j in range(0, nyb, step):
        for i in range(0, nxb, step):
            idx = i + j * nxb
            bx = (i * y_w) >> level
            by = (j * y_h) >> level
            if bx >= sw or by >= sh:
                continue  # zeroed mv
            bw = min(sw - bx, y_w)
            bh = min(sh - by, y_h)
            psy = [2, 1, 0]
            cands = [(0, 0)]
            motion_bias = y_w * y_h
            var_src = avg_src = 0
            lax = lay = 0
            srcw = win(src.planes[0], bx, by, bw, bh)
            if not squared:
                feat = nat.block_features(src.planes[0], bx, by, bw, bh)
                var_src, avg_src = int(feat[0]), int(feat[1])
                tvar = w32(var_src + ((var_src >> 10) ** 2))
                tvar = im.divt(w32(8 * tvar * hme.quant) >> 9, bw * bh)
                if tvar:
                    hvar, qtex, npeaks = int(feat[5]), int(feat[4]), int(feat[6])
                    motion_bias = w32(motion_bias
                                      + w32(w32(tvar * (hvar - qtex)) * npeaks))
                motion_bias = max(motion_bias, 0) // (2 + abs(gx) + abs(gy))
                if var_src <= (8 * bw * bh * hme.quant >> 9):
                    psy = [2, 1, 2]
                    motion_bias = 0
                else:
                    psy = [1, 2, 1]
                if var_src > 24 * bw * bh:
                    psy[2] = 0
            if parent is not None:
                pts = [(0, 0), (-2, 0), (2, 0), (0, -2), (0, 2),
                       (-2, -2), (2, 2), (2, -2), (-2, 2)]
                pi = i & parent_mask
                pj = j & parent_mask
                lcand = []
                sumx = sumy = 0
                for (dx_, dy_) in pts:
                    x = pi + dx_ * step
                    y = pj + dy_ * step
                    if 0 <= x < nxb and 0 <= y < nyb:
                        k = x + y * nxb
                        sumx += int(parent.x[k])
                        sumy += int(parent.y[k])
                        lcand.append((int(parent.x[k]), int(parent.y[k])))
                if lcand:
                    lax = im.divt(sumx, len(lcand))
                    lay = im.divt(sumy, len(lcand))
                    newl, lax, lay, nl = _find_inliers(lcand, lax, lay)
                    cands.append(qp2fp(lax * 4, lay * 4))
                    # spatial predictions (ref: hme.c:1202-1228)
                    if level == 0:
                        px, py = nat.movec_pred(mvf_x, mvf_y, nxb, i, j)
                        cands.append(qp2fp(px, py))
                    if i > 0:
                        k = (i - step) + j * nxb
                        cands.append(qp2fp(int(mvf_x[k]), int(mvf_y[k])))
                    if j > 0:
                        k = i + (j - step) * nxb
                        cands.append(qp2fp(int(mvf_x[k]), int(mvf_y[k])))
                    if i > 0 and j > 0:
                        k = (i - step) + (j - step) * nxb
                        cands.append(qp2fp(int(mvf_x[k]), int(mvf_y[k])))
                    # temporal predictions (ref: hme.c:1231-1257)
                    if hme.ref_mvf is not None:
                        for n_ in range(N_SEARCH):
                            rx = i + RECTX[n_] * step
                            ry = j + RECTY[n_] * step
                            if 0 <= rx < nxb and 0 <= ry < nyb:
                                k = rx + ry * nxb
                                cands.append(qp2fp(int(hme.ref_mvf.x[k]),
                                                   int(hme.ref_mvf.y[k])))
                    cands.append(qp2fp(gx * 4, gy * 4))
                    for c in newl:
                        cands.append(qp2fp(c[0] * 4, c[1] * 4))
            # scale to level, dedupe (ref: hme.c:1522-1528)
            cands = [(im.sar(c[0], level), im.sar(c[1], level))
                     for c in cands]
            dedup = []
            for c in cands:
                if c not in dedup:
                    dedup.append(c)
            cands = dedup

            best_score = score_zero = U32
            best_k = 0
            valid = [(k, c) for k, c in enumerate(cands)
                     if not invalid_block(ref, bx + c[0], by + c[1],
                                          bw, bh, 0)]
            if valid:
                raw = nat.cand_scores(src.planes[0], bx, by,
                                      ref.planes[0], bx, by, bw, bh, level,
                                      psy, [c[0] for _, c in valid],
                                      [c[1] for _, c in valid])
            for vi, (k, (dx, dy)) in enumerate(valid):
                score = int(raw[vi])
                if dx == 0 and dy == 0:
                    score_zero = score
                score += mv_cost_lvl(mvf_x, mvf_y, p, i, j,
                                     mk_mv(dx * step, 0, 0),
                                     mk_mv(dy * step, 0, 0), hme.quant, level)
                if dx == lax and dy == lay:
                    score = max(score - (motion_bias >> level), 0)
                if best_score > score:
                    best_score = score
                    best_k = k
            dx, dy = cands[best_k]
            best = best_score
            good_enough = 0
            qthresh = (hme.quant * bw * bh >> 11) & U32
            # good-enough vs source reference (ref: hme.c:1569-1584)
            zoscore = (0x7FFFFFFF if bw == 0 or bh == 0 else
                       nat.metr(src.planes[0], bx, by, ogr.planes[0],
                                bx, by, bw, bh, psy))
            if abs(dx) <= 1 and abs(dy) <= 1:
                qthresh *= 2
            if zoscore < qthresh:
                best = score_zero if level == 0 else 0
                dx = dy = 0
                good_enough = 1
            if not good_enough:
                dx, dy, best, good_enough = _refine_fpel(
                    hme, level, i, j, dx, dy, best, qthresh, srcw, src, ref,
                    bx, by, bw, bh, psy, mvf_x, mvf_y)
            mvd = {"x": dx * step, "y": dy * step, "flags": 0, "err": 0,
                   "dc": 0, "submask": 0, "intra": False, "eprm": False,
                   "skip": False, "maintain": False, "noxmity": False,
                   "noxmitc": False, "simcmplx": False}
            if level == 0:
                nintra += _level0_decisions(
                    hme, p, mvd, mvf, skipfield, i, j, idx, dx, dy, best,
                    good_enough, src, ref, ogr, srcw, bx, by, bw, bh,
                    psy, var_src, avg_src, lax, lay, motion_bias,
                    quant_rd, hs, vs)
                if mvd["_stats"] is not None:
                    te, nd, ne = mvd["_stats"]
                    total_err += te
                    ndiff += nd
                    num_eligible += ne
            else:
                mvf.x[idx] = mvd["x"]
                mvf.y[idx] = mvd["y"]
    if level == 0:
        if num_eligible == 0:
            num_eligible = 1
        hme.scene_change_blocks = ndiff * 100 // num_eligible
        hme.avg_err = total_err // (nxb * nyb)
    return nintra


def _nat_hier(level, src, ref, bx, by, dx, dy, bw, bh, psy):
    if bw == 0 or bh == 0:
        return 0x7FFFFFFF
    if level > 1:
        return nat.sse(src.planes[0], bx, by, ref.planes[0],
                       bx + dx, by + dy, bw, bh)
    return nat.metr(src.planes[0], bx, by, ref.planes[0],
                    bx + dx, by + dy, bw, bh, psy)


def _refine_fpel(hme, level, i, j, bestx, besty, best, good_thresh, srcw,
                 src, ref, bx, by, bw, bh, psy, mvf_x, mvf_y):
    """Greedy walk with retry (ref: hme.c:1300-1370)."""
    p = hme.params
    step = 1 << level
    metr = [U32, U32, U32, U32]
    while True:
        improved = False
        for k in range(N_SEARCH // 2 + 1):
            tvx = bestx + RECTX[k]
            tvy = besty + RECTY[k]
            if invalid_block(ref, bx + tvx, by + tvy, bw, bh, 0):
                continue
            score = _nat_hier(level, src, ref, bx, by, tvx, tvy, bw, bh, psy)
            if 1 <= k <= 4:
                metr[k - 1] = score
            if level == 0 and tvx == 0 and tvy == 0 and score <= good_thresh:
                return tvx, tvy, score, 1
            score += mv_cost_lvl(mvf_x, mvf_y, p, i, j,
                                 mk_mv(tvx * step, 0, 0),
                                 mk_mv(tvy * step, 0, 0), hme.quant, level)
            if best > score:
                best = score
                bestx, besty = tvx, tvy
                improved = True
                break
        if improved:
            continue
        # diagonal check
        tvx = bestx + RECTX[1 if metr[0] <= metr[1] else 2]
        tvy = besty + RECTY[3 if metr[2] <= metr[3] else 4]
        if invalid_block(ref, bx + tvx, by + tvy, bw, bh, 0):
            return bestx, besty, best, 0
        score = _nat_hier(level, src, ref, bx, by, tvx, tvy, bw, bh, psy)
        score += mv_cost_lvl(mvf_x, mvf_y, p, i, j,
                             mk_mv(tvx * step, 0, 0),
                             mk_mv(tvy * step, 0, 0), hme.quant, level)
        if best > score:
            best = score
            bestx, besty = tvx, tvy
            continue
        return bestx, besty, best, 0


def _level0_decisions(hme, p, mvd, mvf, skipfield, i, j, idx, dx, dy, best,
                      good_enough, src, ref, ogr, srcw, bx, by, bw, bh,
                      psy, var_src, avg_src, lax, lay, motion_bias,
                      quant_rd, hs, vs):
    """Subpel + mode decisions at the base level (ref: hme.c:1598-1821).
    Returns 1 if the block went intra."""
    nxb = p.nbh
    yarea = bw * bh
    fpelx, fpely = mvd["x"], mvd["y"]
    if fpelx == lax and fpely == lay:
        best += motion_bias
    best_fp = best
    mvd["x"] = mvd["y"] = 0
    sub_found = False
    if p.effort >= 4:
        if not invalid_block(ref, bx + lax, by + lay, bw, bh, 4):
            best = subpixel_me(p, mvf.x, mvf.y, mvd, lax, lay, src, ref,
                               i, j, best_fp, hme.quant, bx, by, bw, bh, psy)
            if mvd["x"] or mvd["y"]:
                fpelx, fpely = lax, lay
                sub_found = True
        if (not sub_found and not good_enough
                and not invalid_block(ref, bx + fpelx, by + fpely, bw, bh, 4)):
            best = subpixel_me(p, mvf.x, mvf.y, mvd, fpelx, fpely, src, ref,
                               i, j, best_fp, hme.quant, bx, by, bw, bh, psy)
    mvd["x"] = mk_mv(fpelx, 0, mvd["x"])
    mvd["y"] = mk_mv(fpely, 0, mvd["y"])
    mvf.x[idx] = mvd["x"]
    mvf.y[idx] = mvd["y"]

    refmv_xy = None
    if hme.ref_mvf is not None:
        refmv_xy = (int(hme.ref_mvf.x[idx]), int(hme.ref_mvf.y[idx]))
    is_subpel = (mvd["x"] | mvd["y"]) & 3
    ratio = 1 << 5
    if is_subpel:
        ratio = u32(best << 5) // (best_fp + (0 if best_fp else 1))
    ogrerr = (0x7FFFFFFF if bw == 0 or bh == 0 else
              nat.metr(src.planes[0], bx, by, ogr.planes[0],
                       bx + fpelx, by + fpely, bw, bh, psy))
    ogrmad = im.udiv_round(ogrerr, yarea)
    ogrmad = u32(ogrmad * ratio) >> 5
    mad = im.udiv_round(best, yarea)
    rfeat = nat.block_features(ref.planes[0], bx + fpelx, by + fpely, bw, bh)
    var_ref, avg_ref = int(rfeat[0]), int(rfeat[1])
    dv = min(ratio, 32)
    ipolvar = (var_src * dv + var_ref * (32 - dv)) >> 5
    dv = abs(var_src - ipolvar)
    mvd["maintain"] = (var_src > 16 * yarea) and (var_src < 32 * yarea)

    cbx = i * (p.blk_w >> hs)
    cby = j * (p.blk_h >> vs)
    cbmx = cbx + im.sar(fpelx, hs)
    cbmy = cby + im.sar(fpely, vs)
    cbw = bw >> hs
    cbh = bh >> vs
    chroma_ratio = ((cbw * cbh) << 4) // yarea

    sp_u, sp_v = src.planes[1], src.planes[2]
    rp_u, rp_v = ref.planes[1], ref.planes[2]
    uavg_src, vavg_src = ba.c_average(win(sp_u, cbx, cby, cbw, cbh),
                                      win(sp_v, cbx, cby, cbw, cbh))
    uavg_ref, vavg_ref = ba.c_average(win(rp_u, cbmx, cbmy, cbw, cbh),
                                      win(rp_v, cbmx, cbmy, cbw, cbh))
    nature, greyish, skinnish, hifreq = ba.chroma_analysis(
        avg_src, uavg_src, vavg_src)
    avg_y_dif = abs(avg_src - avg_ref)
    avg_c_dif = avg2(abs(uavg_src - uavg_ref), abs(vavg_src - vavg_ref))
    refw = win(ref.planes[0], bx + fpelx, by + fpely, bw, bh)
    eprmi, eprmd, eprmr = calc_eprm(srcw, refw, avg_src, avg_ref)
    oob = outofbounds(i, j, nxb, p.nbv, p.blk_w, p.blk_h, mvd["x"], mvd["y"])
    nd0, nd1 = nat.neighbordif2(mvf.x, mvf.y, skipfield.view(np.uint8),
                                nxb, i, j)
    neidif = (nd0 + nd1) // 3
    skipt = quant_rd >> 19
    stats = (0, 0, 0)

    # skip test (ref: hme.c:1694-1729)
    if ((good_enough or (mvd["x"] == 0 and mvd["y"] == 0))
            and hme.skip_block_thresh >= 0 and not p.lossless):
        sth = u32(skipt * yarea)
        sth = u32(sth + 4 * var_src)
        sth = u32(sth + yarea * hme.skip_block_thresh)
        if hme.quant < (1 << (K.MAX_QP_BITS - 2)):
            sth = u32(sth * hme.quant) >> (K.MAX_QP_BITS - 2)
        if avg_y_dif <= 2:
            sth = max(sth, u32(3 * (yarea + var_src)))
        sth = max(sth, yarea)
        if good_enough:
            sth = u32(sth * 2)
        zsub = yuv_max_subblock_err(src, ref, bx, by, bx, by, bw, bh,
                                    cbx, cby, cbx, cby, cbw, cbh, psy)
        cth = u32(chroma_ratio * sth * max(skipt, 1)) >> 5
        z0 = u32((u32(zsub[0] * ratio) >> 5)
                 + ((avg_src - avg_ref) ** 2) * yarea)
        z1 = u32(zsub[1] * ratio) >> 5
        z2 = u32(zsub[2] * ratio) >> 5
        if z0 <= sth and z1 <= cth and z2 <= cth:
            mvd["skip"] = True
            mvd["x"] = mvd["y"] = 0
            mvd["err"] = 0
            mvf.x[idx] = mvf.y[idx] = 0
            skipfield[idx] = True
            _commit(mvf, idx, mvd)
            if best > 0:
                mvd["_stats"] = (0, 0, 1)
            else:
                mvd["_stats"] = (0, 0, 0)
            return 0

    # no-residual decisions (ref: hme.c:1731-1777)
    if not oob and not p.lossless:
        y_prereq = avg_y_dif <= 2
        c_prereq = (not greyish) and (avg_c_dif <= 2)
        if y_prereq or c_prereq:
            xth = u32(skipt * yarea)
            carea = 4 * cbw * cbh
            bsub = yuv_max_subblock_err(src, ref, bx, by, bx + fpelx,
                                        by + fpely, bw, bh, cbx, cby,
                                        cbmx, cbmy, cbw, cbh, psy)
            xth = u32(xth + ipolvar)
            xth = max(w32(xth - w32(yarea * neidif * 2)), 0)
            xth = u32(xth * hme.quant) >> K.MAX_QP_BITS
            xth = im.clamp(xth, 32, yarea * 4)
            b0 = u32(bsub[0] * ratio) >> 5
            b1 = u32(bsub[1] * ratio) >> 5
            b2 = u32(bsub[2] * ratio) >> 5
            if y_prereq and b0 < 4 * xth:
                mvd["noxmity"] = True
            utex = int(nat.block_features(sp_u, cbx, cby, cbw, cbh)[3])
            vtex = int(nat.block_features(sp_v, cbx, cby, cbw, cbh)[3])
            c_prereq = c_prereq and (utex > carea or vtex > carea)
            xth = chroma_ratio * xth >> 4
            if c_prereq and b1 < xth and b2 < xth:
                mvd["noxmitc"] = True
        if dv < var_src // 4:
            mvd["simcmplx"] = True

    # intra tests (ref: hme.c:1779-1788)
    psyscale = p.psyf_all
    test_subblock_intra_y(p, refmv_xy, mvd, src.planes[0], bx, by,
                          ref.planes[0], bx + fpelx, by + fpely,
                          ipolvar, avg_src, neidif, ratio, bw, bh, psyscale)
    test_subblock_intra_c(p, mvd, (sp_u, sp_v), (rp_u, rp_v), mad,
                          ipolvar // (bw * bh), avg_src,
                          cbx, cby, cbmx, cbmy, cbw, cbh)

    te = 0
    if not mvd["noxmity"]:
        mvd["err"] = mad
        te = mad
    nd = (1 if ogrmad > 11 else 0) + (1 if avg_c_dif >= 32 else 0)
    ne = 1 if best > 0 else 0
    mvd["_stats"] = (te, nd, ne)

    went_intra = 0
    if mvd["intra"]:
        merged = eprmd if (mvd["dc"] & K.SRC_DC_PRED) else eprmi
        if mvd["submask"] != K.MASK_ALL_INTRA:
            merged = merged or eprmr
        mvd["eprm"] = bool(merged)
        went_intra = 1
        mvd["x"] = mk_mv(fpelx, 0, 0)
        mvd["y"] = mk_mv(fpely, 0, 0)
        mvf.x[idx] = mvd["x"]
        mvf.y[idx] = mvd["y"]
    else:
        merged = eprmr
        if mvd["submask"]:
            merged = merged or eprmi
        mvd["eprm"] = bool(merged)
    if mvd["intra"] or mvd["eprm"]:
        mvd["simcmplx"] = False
    _commit(mvf, idx, mvd)
    return went_intra


def _commit(mvf, idx, mvd):
    fl = 0
    for name, bit in (("intra", K.MV_BIT_INTRA), ("eprm", K.MV_BIT_EPRM),
                      ("maintain", K.MV_BIT_MAINTAIN), ("skip", K.MV_BIT_SKIP),
                      ("noxmity", K.MV_BIT_NOXMITY),
                      ("noxmitc", K.MV_BIT_NOXMITC),
                      ("simcmplx", K.MV_BIT_SIMCMPLX)):
        if mvd[name]:
            fl |= 1 << bit
    mvf.flags[idx] = fl
    mvf.err[idx] = int(mvd["err"]) & 0xFFFF
    mvf.dc[idx] = mvd["dc"]
    mvf.submask[idx] = mvd["submask"]
    mvf.x[idx] = mvd["x"]
    mvf.y[idx] = mvd["y"]


def global_motion(mvf, p, level):
    """(ref: hme.c:1973-1999)."""
    step = 1 << level
    avgx = avgy = nblk = 0
    for j in range(0, p.nbv, step):
        for i in range(0, p.nbh, step):
            k = i + j * p.nbh
            avgx += int(mvf.x[k])
            avgy += int(mvf.y[k])
            nblk += 1
    if nblk:
        return im.divt(avgx * 2, nblk), im.divt(avgy * 2, nblk)
    return 0, 0


class HmeCtx:
    pass


def motion_est(enc, d):
    """(ref: motion_est, dsv_encoder.c:653-689 + dsv_hme, hme.c:2001-2016)."""
    ref = d.refdata
    hme = HmeCtx()
    hme.params = d.params
    hme.quant = enc.prev_quant
    hme.skip_block_thresh = enc.skip_block_thresh
    hme.pyramid_levels = enc.pyramid_levels
    hme.src = [d.padded] + list(d.pyramid)
    hme.ref_mvf = ref.final_mvs
    recon_pyr = enc._mk_pyramid(ref.residual)
    hme.ref = [ref.residual] + recon_pyr
    hme.ogr = [ref.padded] + list(ref.pyramid)
    hme.mvf = [None] * (enc.pyramid_levels + 2)
    hme.scene_change_blocks = 0
    hme.avg_err = 0

    gx = gy = 0
    nintra = 0
    for level in range(enc.pyramid_levels, -1, -1):
        nintra = refine_level(hme, level, gx, gy)
        if level != 0:
            gx, gy = global_motion(hme.mvf[level], d.params, level)
    d.final_mvs = hme.mvf[0]
    enc.curr_scblocks = hme.scene_change_blocks
    enc.avg_err = hme.avg_err
    enc.curr_intra_pct = nintra * 100 // (d.params.nbh * d.params.nbv)
