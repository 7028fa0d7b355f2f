"""Per-frame block metadata (de)serialization.

Stability/skip block masks, ringing/maintain intra masks and the motion
field's five subsections (MODE / MV_X / MV_Y / SBIM / EPRM); the MV residual
coding depends on already-(de)serialized neighbors, so this is a host raster
loop over the (small) block grid.
(ref: src/dsv_decoder.c:81-238, src/dsv_encoder.c:691-932)
"""
import numpy as np

from ..bitstream import BitWriter, BitReader, ZBRLEWriter, ZBRLEReader
from ..core import constants as K
from ..core import intmath as im
from ..core import mvmath


class MotionField:
    """Struct-of-arrays MV field over the block grid."""

    def __init__(self, nbh, nbv):
        self.nbh, self.nbv = nbh, nbv
        n = nbh * nbv
        self.x = np.zeros(n, dtype=np.int16)
        self.y = np.zeros(n, dtype=np.int16)
        self.flags = np.zeros(n, dtype=np.uint32)
        self.err = np.zeros(n, dtype=np.uint16)
        self.dc = np.zeros(n, dtype=np.uint16)
        self.submask = np.zeros(n, dtype=np.uint8)

    def bit(self, bitpos):
        return (self.flags & (1 << bitpos)) != 0

    def set_bit(self, idx, bitpos, on):
        if on:
            self.flags[idx] |= (1 << bitpos)
        else:
            self.flags[idx] &= ~np.uint32(1 << bitpos)

    def grid(self, a):
        return a.reshape(self.nbv, self.nbh)


def decode_stability_blocks(r: BitReader, buf, nblk, isP, stats):
    """(ref: dsv_decoder.c:176-198). Returns blockdata uint8[nblk]."""
    r.align()
    ln = r.get_ueg()
    r.align()
    rle = ZBRLEReader(buf, r.byte_pos * 8)
    r.skip_bytes(ln)
    shift = K.SKIP_BIT if isP else K.STABLE_BIT
    blockdata = np.zeros(nblk, dtype=np.uint8)
    inv = stats[K.STABLE_STAT] == K.ZERO_MARKER
    for i in range(nblk):
        bit = rle.get()
        if inv:
            bit = 1 - bit
        blockdata[i] = bit << shift
    return blockdata


def decode_intra_meta(r: BitReader, buf, nblk, stats, blockdata):
    """(ref: dsv_decoder.c:201-238)."""
    r.align()
    ln = r.get_ueg()
    r.align()
    rle_r = ZBRLEReader(buf, r.byte_pos * 8)
    r.skip_bytes(ln)
    r.align()
    ln = r.get_ueg()
    r.align()
    rle_m = ZBRLEReader(buf, r.byte_pos * 8)
    r.skip_bytes(ln)
    inv_r = stats[K.RINGING_STAT] == K.ZERO_MARKER
    inv_m = stats[K.MAINTAIN_STAT] == K.ZERO_MARKER
    for i in range(nblk):
        bitr = rle_r.get()
        bitm = rle_m.get()
        if inv_r:
            bitr = 1 - bitr
        if inv_m:
            bitm = 1 - bitm
        blockdata[i] |= (bitm << K.MAINTAIN_BIT) | (bitr << K.RINGING_BIT)


def decode_motion(r: BitReader, buf, nbh, nbv, stats, blockdata):
    """(ref: dsv_decoder.c:81-173). Returns a MotionField."""
    r.align()
    readers = []
    for i in range(K.SUB_NSUB):
        ln = r.get_ueg()
        r.align()
        if i in (K.SUB_MODE, K.SUB_EPRM):
            readers.append(ZBRLEReader(buf, r.byte_pos * 8))
        else:
            readers.append(BitReader(buf, r.byte_pos * 8))
        r.skip_bytes(ln)
    rle, prrle = readers[K.SUB_MODE], readers[K.SUB_EPRM]
    bx, by = readers[K.SUB_MV_X], readers[K.SUB_MV_Y]
    bim = readers[K.SUB_SBIM]

    mf = MotionField(nbh, nbv)
    skip = np.zeros(nbh * nbv, dtype=bool)
    inv_mode = stats[K.MODE_STAT] == K.ZERO_MARKER
    inv_eprm = stats[K.EPRM_STAT] == K.ZERO_MARKER
    for j in range(nbv):
        for i in range(nbh):
            idx = i + j * nbh
            if blockdata[idx] & K.IS_SKIP:
                mf.set_bit(idx, K.MV_BIT_SKIP, 1)
                mf.x[idx] = mf.y[idx] = 0
                skip[idx] = True
                blockdata[idx] |= 1 << K.STABLE_BIT
                continue
            mode = rle.get()
            eprm = prrle.get()
            if inv_mode:
                mode = 1 - mode
            if inv_eprm:
                eprm = 1 - eprm
            mf.set_bit(idx, K.MV_BIT_INTRA, mode)
            mf.set_bit(idx, K.MV_BIT_EPRM, eprm)
            blockdata[idx] &= ~np.uint8(1 << K.STABLE_BIT)
            blockdata[idx] |= eprm << K.EPRM_BIT
            px, py = mvmath.movec_pred(mf.x, mf.y, nbh, i, j)
            if mode:
                px = im.sar_r(px, 2)
                py = im.sar_r(py, 2)
            mf.x[idx] = bx.get_seg() + px
            mf.y[idx] = by.get_seg() + py
            if mode:
                mf.x[idx] *= 4
                mf.y[idx] *= 4
                if bim.get_bit():
                    mf.submask[idx] = K.MASK_ALL_INTRA
                else:
                    mf.submask[idx] = bim.get_bits(4)
                if bim.get_bit():
                    mf.dc[idx] = bim.get_bits(8) | K.SRC_DC_PRED
                else:
                    mf.dc[idx] = 0
                blockdata[idx] |= K.IS_INTRA
            if mvmath.neighbordif(mf.x, mf.y, skip, nbh, i, j) > K.NDIF_THRESH:
                blockdata[idx] |= 1 << K.STABLE_BIT
    return mf


# --- encoder side ---

def encode_stable_blocks(w: BitWriter, stable_bits, stats):
    """stable_bits: iterable of 0/1 per block (already decided)
    (ref: dsv_encoder.c:797-883 serialization part)."""
    from .. import native
    inv = stats[K.STABLE_STAT] != K.ONE_MARKER
    blob = native.zbrle_encode(np.asarray(stable_bits, dtype=np.uint8) & 1,
                               inv)
    w.align()
    w.put_ueg(len(blob))
    w.align()
    w.concat_bytes(blob)


def encode_intra_meta(w: BitWriter, ring_bits, maintain_bits, stats):
    """(ref: dsv_encoder.c:886-932)."""
    from .. import native
    for bits, stat in ((ring_bits, K.RINGING_STAT),
                       (maintain_bits, K.MAINTAIN_STAT)):
        inv = stats[stat] != K.ONE_MARKER
        blob = native.zbrle_encode(np.asarray(bits, dtype=np.uint8) & 1, inv)
        w.align()
        w.put_ueg(len(blob))
        w.align()
        w.concat_bytes(blob)


def encode_motion(w: BitWriter, mf: MotionField, stats, blockdata):
    """Serialize the five motion subsections (ref: dsv_encoder.c:692-794).
    NOTE: mutates intra MVs to their transmitted full-pel precision and
    updates blockdata's EPRM/STABLE bits exactly like the reference (the
    STABLE decision reads already-rescaled raster neighbors)."""
    nbh, nbv = mf.nbh, mf.nbv
    mode_rle, eprm_rle = ZBRLEWriter(), ZBRLEWriter()
    wx, wy, wsb = BitWriter(256), BitWriter(256), BitWriter(256)
    inv_mode = stats[K.MODE_STAT] != K.ONE_MARKER
    inv_eprm = stats[K.EPRM_STAT] != K.ONE_MARKER
    skipf = mf.bit(K.MV_BIT_SKIP)
    for j in range(nbv):
        for i in range(nbh):
            idx = i + j * nbh
            blockdata[idx] |= (1 if (mf.flags[idx] & (1 << K.MV_BIT_EPRM))
                               else 0) << K.EPRM_BIT
            if skipf[idx]:
                blockdata[idx] |= 1 << K.STABLE_BIT
                continue
            intra = bool(mf.flags[idx] & (1 << K.MV_BIT_INTRA))
            eprm = 1 if (mf.flags[idx] & (1 << K.MV_BIT_EPRM)) else 0
            px, py = mvmath.movec_pred(mf.x, mf.y, nbh, i, j)
            if intra:
                px = im.sar_r(px, 2)
                py = im.sar_r(py, 2)
                cvx = im.sar(int(mf.x[idx]), 2)
                cvy = im.sar(int(mf.y[idx]), 2)
                mf.x[idx] = cvx * 4
                mf.y[idx] = cvy * 4
                if mf.submask[idx] == K.MASK_ALL_INTRA:
                    wsb.put_bit(1)
                else:
                    wsb.put_bit(0)
                    wsb.put_bits(4, int(mf.submask[idx]))
                if mf.dc[idx] & K.SRC_DC_PRED:
                    wsb.put_bit(1)
                    wsb.put_bits(8, int(mf.dc[idx]) & 0xFF)
                else:
                    wsb.put_bit(0)
            else:
                cvx, cvy = int(mf.x[idx]), int(mf.y[idx])
            wx.put_seg(cvx - px)
            wy.put_seg(cvy - py)
            if mvmath.neighbordif(mf.x, mf.y, skipf, nbh, i, j) > K.NDIF_THRESH:
                blockdata[idx] |= 1 << K.STABLE_BIT
            mode_rle.put(int(intra) if not inv_mode else 1 - int(intra))
            eprm_rle.put(eprm if not inv_eprm else 1 - eprm)
    blobs = [None] * K.SUB_NSUB
    blobs[K.SUB_MODE] = mode_rle.end()
    blobs[K.SUB_EPRM] = eprm_rle.end()
    blobs[K.SUB_MV_X] = wx.data()
    blobs[K.SUB_MV_Y] = wy.data()
    blobs[K.SUB_SBIM] = wsb.data()
    for blob in blobs:
        w.align()
        w.put_ueg(len(blob))
        w.align()
        w.concat_bytes(blob)
