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


def _batched_features(blocks):
    """Vectorized block features over an (N, bh, bw) uint8 stack. Returns a
    dict of (N,) int64 arrays with C-exact semantics."""
    p = blocks.astype(np.int64)
    n, bh, bw = p.shape
    area = bw * bh
    s = p.sum(axis=(1, 2))
    sh = np.abs(p[:, :, 1:] - p[:, :, :-1]).sum(axis=(1, 2))
    sv = np.abs(p[:, 1:, :] - p[:, :-1, :]).sum(axis=(1, 2))
    avg = s // area
    var = np.abs(p - avg[:, None, None]).sum(axis=(1, 2))
    dvar = var >> 1
    tex = np.maximum(sh, sv) - dvar
    detail = dvar + np.maximum(tex, 0)
    # quant_tex (ref: hme.c:586-617)
    q4 = p >> 4
    dh = q4[:, :, :-1] - q4[:, :, 1:]
    sh2 = (dh * dh).sum(axis=(1, 2))
    dv = q4[:, 1:, :] - q4[:, :-1, :]
    sv2 = (dv * dv).sum(axis=(1, 2))
    qtex = im.iisqrt(np.maximum(sh2, sv2)) // avg2(bw, bh)
    # histogram variance (ref: hme.c:711-749)
    havg = np.maximum(avg, 1)
    quant16 = ((1 << (HISTBITS - 1)) << 16) // havg
    hi = np.clip((p * quant16[:, None, None]) >> 16, 0, NHIST - 1)
    off = (np.arange(n)[:, None, None] * NHIST + hi).ravel()
    hist = np.bincount(off, minlength=n * NHIST).reshape(n, NHIST)
    hm = hist.sum(axis=1) // NHIST
    hvar_raw = ((hist - hm[:, None]) ** 2).sum(axis=1)
    hvar = (hvar_raw * 256) // (NHIST * area * area)
    # peaks over 2x downsample (ref: hme.c:624-692)
    w2, h2 = bw // 2, bh // 2
    ds = (p[:, 0:2 * h2:2, 0:2 * w2:2] + p[:, 0:2 * h2:2, 1:2 * w2:2]
          + p[:, 1:2 * h2:2, 0:2 * w2:2] + p[:, 1:2 * h2:2, 1:2 * w2:2]
          + 2) >> 2
    hi2 = np.minimum((ds * quant16[:, None, None]) >> 16, NHIST - 1)
    off2 = (np.arange(n)[:, None, None] * NHIST + hi2).ravel()
    ph = np.bincount(off2, minlength=n * NHIST).reshape(n, NHIST)
    pavg = ph.sum(axis=1) // NHIST
    maxv = (ph.max(axis=1)) >> 2
    left = np.concatenate(
        [np.full((n, 1), -1, ph.dtype), ph[:, :-1]], axis=1)
    right = np.concatenate(
        [ph[:, 1:], np.full((n, 1), -1, ph.dtype)], axis=1)
    is_peak = ((ph > left) & (ph > right)
               & ((ph > maxv[:, None]) | (ph > pavg[:, None])))
    npeaks = is_peak.sum(axis=1)
    return dict(detail=detail, avg=avg, var=var, tex=np.maximum(sh, sv),
                qtex=qtex, hvar=hvar, npeaks=npeaks)


def intra_analysis(frame, params):
    """I-frame psychovisual block classification (ref: hme.c:1835-1971).
    frame: core.frame.Frame (bordered, extended). Returns a MotionField with
    RINGING/MAINTAIN/SKIP(keep-HF) flags. Full-size blocks are processed as
    one batched reduction; partial edge blocks fall back to the scalar path."""
    lum0 = frame.view(0)
    p = params
    if (lum0.shape[1] % p.blk_w == 0 and lum0.shape[0] % p.blk_h == 0
            and (p.blk_w >> K.fmt_h_shift(p.meta.subsamp)) >= 2
            and (p.blk_h >> K.fmt_v_shift(p.meta.subsamp)) >= 2):
        return _intra_analysis_fast(frame, params)
    return _intra_analysis_scalar(frame, params)


def _intra_analysis_fast(frame, params):
    p = params
    nbh, nbv = p.nbh, p.nbv
    bw, bh = p.blk_w, p.blk_h
    mf = MotionField(nbh, nbv)
    lum = frame.view(0)
    subsamp = p.meta.subsamp
    hs, vs = K.fmt_h_shift(subsamp), K.fmt_v_shift(subsamp)
    cbw, cbh = bw >> hs, bh >> vs
    scale = 2 * p.psyf_all
    do_psy = p.do_psy
    n = nbh * nbv

    blocks = (lum.reshape(nbv, bh, nbh, bw).transpose(0, 2, 1, 3)
              .reshape(n, bh, bw))
    f = _batched_features(blocks)
    area = bw * bh
    detail = f["detail"]
    avg = f["avg"]
    ringing = np.zeros(n, dtype=bool)
    foliage = np.zeros(n, dtype=bool)
    is_text = np.zeros(n, dtype=bool)
    var_t = np.full(n, 16, dtype=np.int64)
    if do_psy & (K.PSY_ADAPTIVE_RINGING | K.PSY_CONTENT_ANALYSIS):
        hvar, qtex, npeaks = f["hvar"], f["qtex"], f["npeaks"]
        luma_var = f["var"] // area
        luma_tex = f["tex"] // area
        is_text = np.abs(npeaks - 2) <= 1
        tf2 = (((qtex == 1) | (qtex == 2)) & (hvar <= 3)
               & (luma_tex >= 10) & (luma_var >= luma_tex))
        tf = (((qtex == 2) | (qtex == 3)) & (luma_tex >= 8)
              & (luma_var >= 2 * luma_tex) & (np.abs(hvar - 5) <= 3))
        is_text &= (tf | tf2)
        ub = frame.view(1).astype(np.int64)
        vb = frame.view(2).astype(np.int64)
        carea = cbw * cbh
        uavg = (ub.reshape(nbv, cbh, nbh, cbw).sum(axis=(1, 3))
                // carea).reshape(-1)
        vavg = (vb.reshape(nbv, cbh, nbh, cbw).sum(axis=(1, 3))
                // carea).reshape(-1)
        nature = (uavg < 128) & (vavg < 160)
        greyish = (np.abs(uavg - 128) < 8) & (np.abs(vavg - 128) < 8)
        skinnish = ((avg > 80) & (avg < 230) & (np.abs(uavg - 108) < 24)
                    & (np.abs(vavg - 148) < 24))
        hifreq = (uavg > 160) & ~greyish & ~skinnish
        foliage = nature & (avg < 160) & (detail > (36 * area) // max(scale, 1))
        is_text &= ~foliage
        ring_cond = foliage | ((hvar <= np.minimum(qtex - 3, 2) * 16)
                               & (qtex > 1))
        if do_psy & K.PSY_ADAPTIVE_RINGING:
            ringing = ~hifreq & ring_cond
        var_t = np.where(nature | greyish | skinnish, 20,
                         np.where(~hifreq, 16, 8))
    maintain = np.ones(n, dtype=bool)
    keep_hf = np.ones(n, dtype=bool)
    if do_psy & (K.PSY_CONTENT_ANALYSIS | K.PSY_ADAPTIVE_QUANT):
        d = detail // area
        keep_hf &= d < 48
        maintain = d < var_t * 4
    if do_psy & K.PSY_CONTENT_ANALYSIS:
        keep_hf = np.where(foliage, False, np.where(is_text, True, keep_hf))
        maintain = np.where(foliage, True, np.where(is_text, False, maintain))
    if do_psy & K.PSY_ADAPTIVE_RINGING:
        ringing |= avg < 24
    mf.flags = ((ringing.astype(np.uint32) << K.MV_BIT_RINGING)
                | (maintain.astype(np.uint32) << K.MV_BIT_MAINTAIN)
                | (keep_hf.astype(np.uint32) << K.MV_BIT_SKIP))
    return mf


def _intra_analysis_scalar(frame, params):
    """Per-block reference path (handles partial edge blocks)."""
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


# ---------------------------------------------------------------------------
# device (jnp) intra analysis — same math as _intra_analysis_fast, runs
# inside the batched intra program so the host never touches pixels
# (ref: hme.c:1835-1971). Requires the fast-path preconditions (dims
# divisible by the block size, chroma blocks >= 2).
# ---------------------------------------------------------------------------

def device_intra_flags(pcfg):
    """Returns f(y, u, v) -> (ringing, maintain, keep_hf) bool grids
    (nbv, nbh); y/u/v are the interior planes handed to the batched intra
    step (uint8, chroma dims from pcfg)."""
    import jax
    import jax.numpy as jnp
    from .hme_wave import isqrt_u32

    p = pcfg
    meta = p.meta
    bw, bh = p.blk_w, p.blk_h
    nbh, nbv = p.nbh, p.nbv
    hs, vs = K.fmt_h_shift(meta.subsamp), K.fmt_v_shift(meta.subsamp)
    cbw, cbh = bw >> hs, bh >> vs
    scale = 2 * p.psyf_all
    do_psy = p.do_psy
    n = nbh * nbv
    area = bw * bh

    def features(blocks):
        pix = blocks.astype(jnp.int32)
        s = pix.sum(axis=(1, 2))
        sh = jnp.abs(pix[:, :, 1:] - pix[:, :, :-1]).sum(axis=(1, 2))
        sv = jnp.abs(pix[:, 1:, :] - pix[:, :-1, :]).sum(axis=(1, 2))
        avg = s // area
        var = jnp.abs(pix - avg[:, None, None]).sum(axis=(1, 2))
        dvar = var >> 1
        tex = jnp.maximum(sh, sv) - dvar
        detail = dvar + jnp.maximum(tex, 0)
        q4 = pix >> 4
        dh = q4[:, :, :-1] - q4[:, :, 1:]
        sh2 = (dh * dh).sum(axis=(1, 2))
        dv = q4[:, 1:, :] - q4[:, :-1, :]
        sv2 = (dv * dv).sum(axis=(1, 2))
        qtex = isqrt_u32(jnp.maximum(sh2, sv2)) // avg2(bw, bh)
        havg = jnp.maximum(avg, 1)
        quant16 = ((1 << (HISTBITS - 1)) << 16) // havg
        hi = jnp.clip((pix * quant16[:, None, None]) >> 16, 0, NHIST - 1)
        hist = (hi[..., None] == jnp.arange(NHIST)).sum(
            axis=(1, 2)).astype(jnp.int32)
        hm = hist.sum(axis=1) // NHIST
        hvar_raw = ((hist - hm[:, None]) ** 2).sum(axis=1)
        hvar = (hvar_raw * 256) // (NHIST * area * area)
        w2, h2 = bw // 2, bh // 2
        ds = (pix[:, 0:2 * h2:2, 0:2 * w2:2] + pix[:, 0:2 * h2:2, 1:2 * w2:2]
              + pix[:, 1:2 * h2:2, 0:2 * w2:2]
              + pix[:, 1:2 * h2:2, 1:2 * w2:2] + 2) >> 2
        hi2 = jnp.minimum((ds * quant16[:, None, None]) >> 16, NHIST - 1)
        ph = (hi2[..., None] == jnp.arange(NHIST)).sum(
            axis=(1, 2)).astype(jnp.int32)
        pavg = ph.sum(axis=1) // NHIST
        maxv = ph.max(axis=1) >> 2
        left = jnp.concatenate(
            [jnp.full((n, 1), -1, ph.dtype), ph[:, :-1]], axis=1)
        right = jnp.concatenate(
            [ph[:, 1:], jnp.full((n, 1), -1, ph.dtype)], axis=1)
        is_peak = ((ph > left) & (ph > right)
                   & ((ph > maxv[:, None]) | (ph > pavg[:, None])))
        return dict(detail=detail, avg=avg, var=var,
                    tex=jnp.maximum(sh, sv), qtex=qtex, hvar=hvar,
                    npeaks=is_peak.sum(axis=1))

    def f(y, u, v):
        blocks = (y[:nbv * bh, :nbh * bw]
                  .reshape(nbv, bh, nbh, bw).transpose(0, 2, 1, 3)
                  .reshape(n, bh, bw))
        ft = features(blocks)
        detail, avg = ft["detail"], ft["avg"]
        ringing = jnp.zeros(n, bool)
        foliage = jnp.zeros(n, bool)
        is_text = jnp.zeros(n, bool)
        var_t = jnp.full(n, 16, jnp.int32)
        if do_psy & (K.PSY_ADAPTIVE_RINGING | K.PSY_CONTENT_ANALYSIS):
            hvar, qtex, npeaks = ft["hvar"], ft["qtex"], ft["npeaks"]
            luma_var = ft["var"] // area
            luma_tex = ft["tex"] // area
            is_text = jnp.abs(npeaks - 2) <= 1
            tf2 = (((qtex == 1) | (qtex == 2)) & (hvar <= 3)
                   & (luma_tex >= 10) & (luma_var >= luma_tex))
            tf = (((qtex == 2) | (qtex == 3)) & (luma_tex >= 8)
                  & (luma_var >= 2 * luma_tex) & (jnp.abs(hvar - 5) <= 3))
            is_text &= (tf | tf2)
            carea = cbw * cbh
            ub = u[:nbv * cbh, :nbh * cbw].astype(jnp.int32)
            vb = v[:nbv * cbh, :nbh * cbw].astype(jnp.int32)
            uavg = (ub.reshape(nbv, cbh, nbh, cbw).sum(axis=(1, 3))
                    // carea).reshape(-1)
            vavg = (vb.reshape(nbv, cbh, nbh, cbw).sum(axis=(1, 3))
                    // carea).reshape(-1)
            nature = (uavg < 128) & (vavg < 160)
            greyish = (jnp.abs(uavg - 128) < 8) & (jnp.abs(vavg - 128) < 8)
            skinnish = ((avg > 80) & (avg < 230) & (jnp.abs(uavg - 108) < 24)
                        & (jnp.abs(vavg - 148) < 24))
            hifreq = (uavg > 160) & ~greyish & ~skinnish
            foliage = nature & (avg < 160) & (detail
                                              > (36 * area) // max(scale, 1))
            is_text &= ~foliage
            ring_cond = foliage | ((hvar <= jnp.minimum(qtex - 3, 2) * 16)
                                   & (qtex > 1))
            if do_psy & K.PSY_ADAPTIVE_RINGING:
                ringing = ~hifreq & ring_cond
            var_t = jnp.where(nature | greyish | skinnish, 20,
                              jnp.where(~hifreq, 16, 8))
        maintain = jnp.ones(n, bool)
        keep_hf = jnp.ones(n, bool)
        if do_psy & (K.PSY_CONTENT_ANALYSIS | K.PSY_ADAPTIVE_QUANT):
            d = detail // area
            keep_hf &= d < 48
            maintain = d < var_t * 4
        if do_psy & K.PSY_CONTENT_ANALYSIS:
            keep_hf = jnp.where(foliage, False,
                                jnp.where(is_text, True, keep_hf))
            maintain = jnp.where(foliage, True,
                                 jnp.where(is_text, False, maintain))
        if do_psy & K.PSY_ADAPTIVE_RINGING:
            ringing |= avg < 24
        grid = lambda a: a.reshape(nbv, nbh)
        return grid(ringing), grid(maintain), grid(keep_hf)

    return f


def device_analysis_ok(pcfg):
    """True when the device fast path applies (same preconditions as
    _intra_analysis_fast)."""
    p = pcfg
    return (p.meta.width % p.blk_w == 0 and p.meta.height % p.blk_h == 0
            and (p.blk_w >> K.fmt_h_shift(p.meta.subsamp)) >= 2
            and (p.blk_h >> K.fmt_v_shift(p.meta.subsamp)) >= 2)
