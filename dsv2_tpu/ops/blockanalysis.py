"""Per-block HVS feature extraction + intra-frame analysis (encoder).

Numpy host implementation of the block feature extractors and the I-frame
psychovisual classification that drives RINGING/MAINTAIN/keep-HF decisions
(ref: src/hme.c:492-749, 1835-1971). Every function reproduces the C integer
semantics exactly (truncating division, per-row accumulation order).
"""
import numpy as np

from ..core import constants as K
from ..core import intmath as im
from ..codec.motion import MotionField

NHIST = 16
HISTBITS = 4


def avg2(a, b):
    return (a + b + 1) >> 1


def block_detail(a):
    """(detail, avg) (ref: hme.c:546-584)."""
    p = a.astype(np.int64)
    s = int(p.sum())
    h, w = p.shape
    sh = int(np.abs(p[:, 1:] - p[:, :-1]).sum())
    sv = int(np.abs(p[1:, :] - p[:-1, :]).sum())
    avg = s // (w * h)
    var = int(np.abs(p - avg).sum())
    var >>= 1
    tex = max(sh, sv) - var
    return var + max(tex, 0), avg


def block_var(a):
    """(var, avg) (ref: hme.c:518-543)."""
    p = a.astype(np.int64)
    h, w = p.shape
    avg = int(p.sum()) // (w * h)
    return int(np.abs(p - avg).sum()), avg


def block_tex(a):
    """max(sum|dx|, sum|dy|) (ref: hme.c:492-516)."""
    p = a.astype(np.int64)
    sh = int(np.abs(p[:, 1:] - p[:, :-1]).sum())
    sv = int(np.abs(p[1:, :] - p[:-1, :]).sum())
    return max(sh, sv)


def quant_tex(a):
    """Squared texture of 4-bit-quantized samples (ref: hme.c:586-617)."""
    p = (a.astype(np.int64) >> 4)
    h, w = p.shape
    dh = p[:, :-1] - p[:, 1:]
    sh = int((dh * dh).sum())
    dv = p[1:, :] - p[:-1, :]
    sv = int((dv * dv).sum())
    return im.iisqrt(max(sh, sv)) // avg2(w, h)


def block_hist_var(a):
    """Histogram variance of luma-normalized samples (ref: hme.c:711-749)."""
    p = a.astype(np.int64)
    h, w = p.shape
    avg = int(p.sum()) // (w * h)
    if avg == 0:
        avg = 1
    quant16 = ((1 << (HISTBITS - 1)) << 16) // avg
    hi = np.clip((p * quant16) >> 16, 0, NHIST - 1)
    hist = np.bincount(hi.ravel(), minlength=NHIST)[:NHIST]
    havg = int(hist.sum()) // NHIST
    var = int(((hist - havg) ** 2).sum())
    return (var * 16 * 16) // (NHIST * w * h * w * h)


def block_peaks(a, bavg):
    """Number of histogram peaks over 2x-downsampled samples
    (ref: hme.c:624-692). Returns (npeaks, hist)."""
    p = a.astype(np.int64)
    h, w = p.shape
    avg = bavg
    if bavg < 0:
        avg = int(p.sum()) // (w * h)
    if avg == 0:
        avg = 1
    quant16 = ((1 << (HISTBITS - 1)) << 16) // avg
    w2, h2 = w // 2, h // 2
    ds = (p[0:2 * h2:2, 0:2 * w2:2] + p[0:2 * h2:2, 1:2 * w2:2]
          + p[1:2 * h2:2, 0:2 * w2:2] + p[1:2 * h2:2, 1:2 * w2:2] + 2) >> 2
    hi = np.minimum((ds * quant16) >> 16, NHIST - 1)
    hist = np.bincount(hi.ravel(), minlength=NHIST)[:NHIST]
    havg = int(hist.sum()) // NHIST
    maxv = int(hist.max(initial=0)) >> 2
    npeaks = 0
    for x in range(NHIST):
        c = int(hist[x])
        is_peak = True
        if x > 0:
            is_peak &= c > hist[x - 1]
        if x < NHIST - 1:
            is_peak &= c > hist[x + 1]
        is_peak &= (c > maxv) or (c > havg)
        if is_peak:
            npeaks += 1
    return npeaks, hist


def c_average(u, v):
    """(uavg, vavg) over a chroma block (ref: hme.c:751-773)."""
    n = u.size
    return int(u.astype(np.int64).sum()) // n, int(v.astype(np.int64).sum()) // n


def chroma_analysis(y, u, v):
    """(nature, greyish, skinnish, hifreq) (ref: hme.c:69-78)."""
    nature = u < 128 and v < 160
    greyish = abs(u - 128) < 8 and abs(v - 128) < 8
    skinnish = (y > 80) and (y < 230) and abs(u - 108) < 24 and abs(v - 148) < 24
    hifreq = (u > 160) and not greyish and not skinnish
    return nature, greyish, skinnish, hifreq


def intra_analysis(frame, params):
    """I-frame psychovisual block classification (ref: hme.c:1835-1971).
    frame: core.frame.Frame (bordered, extended). Returns a MotionField with
    RINGING/MAINTAIN/SKIP(keep-HF) flags."""
    p = params
    nbh, nbv = p.nbh, p.nbv
    y_w, y_h = p.blk_w, p.blk_h
    mf = MotionField(nbh, nbv)
    lum = frame.view(0)
    h, w = lum.shape
    subsamp = p.meta.subsamp
    hs, vs = K.fmt_h_shift(subsamp), K.fmt_v_shift(subsamp)
    uvw = frame.view(1)
    vvw = frame.view(2)
    scale = 2 * p.psyf_all
    do_psy = p.do_psy

    for j in range(nbv):
        for i in range(nbh):
            idx = i + j * nbh
            bx, by = i * y_w, j * y_h
            if bx >= w or by >= h:
                continue
            bw = min(w - bx, y_w)
            bh = min(h - by, y_h)
            blk = lum[by:by + bh, bx:bx + bw]
            cbx, cby = i * (y_w >> hs), j * (y_h >> vs)
            cbw, cbh = bw >> hs, bh >> vs
            luma_detail, luma_avg = block_detail(blk)
            maintain, keep_hf = 1, 1
            npeaks, foliage, is_text = 0, False, False
            ringing = False
            if do_psy & (K.PSY_ADAPTIVE_RINGING | K.PSY_CONTENT_ANALYSIS):
                hvar = block_hist_var(blk)
                qtex = quant_tex(blk)
                luma_var, luma_avg = block_var(blk)
                luma_var //= bw * bh
                luma_tex = block_tex(blk) // (bw * bh)
                npeaks, _ = block_peaks(blk, luma_avg)
                is_text = abs(npeaks - 2) <= 1
                tf = tf2 = False
                if qtex in (1, 2):
                    tf2 = hvar <= 3 and (luma_tex >= 10 and luma_var >= luma_tex)
                if qtex in (2, 3):
                    tf = luma_tex >= 8 and luma_var >= 2 * luma_tex
                    tf = tf and abs(hvar - 5) <= 3
                is_text = is_text and (tf or tf2)
                ub = uvw[cby:cby + cbh, cbx:cbx + cbw]
                vb = vvw[cby:cby + cbh, cbx:cbx + cbw]
                uavg, vavg = c_average(ub, vb)
                nature, greyish, skinnish, hifreq = chroma_analysis(
                    luma_avg, uavg, vavg)
                foliage = nature and luma_avg < 160
                foliage = foliage and (
                    luma_detail > (36 * bw * bh) // max(scale, 1))
                if foliage:
                    is_text = False
                skip_tones = hifreq
                if ((do_psy & K.PSY_ADAPTIVE_RINGING) and not skip_tones
                        and (foliage or (hvar <= min(qtex - 3, 2) * 16
                                         and qtex > 1))):
                    ringing = True
                var_t = 8
                if nature or greyish or skinnish:
                    var_t += 12
                elif not hifreq:
                    var_t += 8
            else:
                var_t = 16
            if do_psy & (K.PSY_CONTENT_ANALYSIS | K.PSY_ADAPTIVE_QUANT):
                luma_detail //= bw * bh
                keep_hf &= luma_detail < 48
                maintain = int(luma_detail < var_t * 4)
            if do_psy & K.PSY_CONTENT_ANALYSIS:
                if foliage:
                    keep_hf, maintain = 0, 1
                elif is_text:
                    keep_hf, maintain = 1, 0
            if do_psy & K.PSY_ADAPTIVE_RINGING:
                if luma_avg < 24:
                    ringing = True
            mf.set_bit(idx, K.MV_BIT_RINGING, int(ringing))
            mf.set_bit(idx, K.MV_BIT_MAINTAIN, int(bool(maintain)))
            mf.set_bit(idx, K.MV_BIT_SKIP, int(bool(keep_hf)))
    return mf
