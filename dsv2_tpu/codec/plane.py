"""Plane-level coefficient coding: host framing around the device quantizer
and the native entropy scan (ref: src/hzcc.c:585-649)."""
import numpy as np

from .. import native
from ..utils import log
from ..bitstream import BitWriter, BitReader
from ..ops import hzcc

EOP_SYMBOL = 0x55


def encode_plane(w: BitWriter, coefs_deq, v_scan, ll_value, cw, ch):
    """Append one coded plane. coefs_deq/v_scan come from
    ops.hzcc.make_quantize; ll_value is the (unquantized) DC coefficient."""
    w.align()
    startp = w.byte_pos
    w.put_bits(32, 0)
    w.put_seg(int(ll_value))
    w.align()
    blob = native.scan_encode(v_scan, hzcc.scan_segments(cw, ch))
    w.concat_bytes(blob)
    w.put_bits(8, EOP_SYMBOL)
    w.align()
    endp = w.byte_pos
    w.patch_bits(startp * 8, 32, (endp - startp) - 4)
    if log.get_level() >= log.LEVEL_INFO:
        log.info("encoded plane of size %d bytes", endp - startp)


def encode_plane_packed(w: BitWriter, seg, total, ll_value, cw, ch):
    """encode_plane, but entropy-coding straight from a device-packed
    sparse segment (no dense expansion). The scan is LONGER than cw*ch at
    non-multiple-of-16 dims (overlapping subband regions), so the length
    comes from the segment table, not the plane area."""
    w.align()
    startp = w.byte_pos
    w.put_bits(32, 0)
    w.put_seg(int(ll_value))
    w.align()
    segments = hzcc.scan_segments(cw, ch)
    scan_len = sum(c for c, _ in segments)
    blob = native.scan_encode_packed(seg, scan_len, segments)
    w.concat_bytes(blob)
    w.put_bits(8, EOP_SYMBOL)
    w.align()
    endp = w.byte_pos
    w.patch_bits(startp * 8, 32, (endp - startp) - 4)
    if log.get_level() >= log.LEVEL_INFO:
        log.info("encoded plane of size %d bytes", endp - startp)


def encode_plane_d8(w: BitWriter, llband, rest8, ll_value, cw, ch):
    """encode_plane from the device's dense split-band transfer format
    (LL int32 + HF int8); the native coder walks the arrays directly."""
    w.align()
    startp = w.byte_pos
    w.put_bits(32, 0)
    w.put_seg(int(ll_value))
    w.align()
    blob = native.scan_encode_d8(llband, rest8, hzcc.scan_segments(cw, ch))
    w.concat_bytes(blob)
    w.put_bits(8, EOP_SYMBOL)
    w.align()
    endp = w.byte_pos
    w.patch_bits(startp * 8, 32, (endp - startp) - 4)
    if log.get_level() >= log.LEVEL_INFO:
        log.info("encoded plane of size %d bytes", endp - startp)


def encode_plane_blob(w: BitWriter, blob, ll_value):
    """encode_plane from a device-built scan blob (ops/scan_pl): the
    entropy coding already happened on device — the host just frames it
    (length slot, SEG(ll), blob bytes, EOP, length patch)."""
    w.align()
    startp = w.byte_pos
    w.put_bits(32, 0)
    w.put_seg(int(ll_value))
    w.align()
    w.concat_bytes(blob.tobytes() if hasattr(blob, "tobytes") else blob)
    w.put_bits(8, EOP_SYMBOL)
    w.align()
    endp = w.byte_pos
    w.patch_bits(startp * 8, 32, (endp - startp) - 4)
    if log.get_level() >= log.LEVEL_INFO:
        log.info("encoded plane of size %d bytes", endp - startp)


def decode_plane(r: BitReader, cw, ch):
    """Returns (ok, ll_value, v_scan). Mirrors dsv_decode_plane's framing,
    error detection and skip-by-length behavior."""
    r.align()
    plen = r.get_bits(32)
    r.align()
    total = hzcc.total_scan_coefs(cw, ch)
    if not (0 < plen < cw * ch * 4 * 2):
        return False, 0, np.zeros(total, dtype=np.int32)
    start = r.byte_pos
    ll = r.get_seg()
    r.align()
    a0 = r.byte_pos
    lim = start + plen - a0
    buf = bytes(r.buf[a0:])
    v, endbit = native.scan_decode(np.frombuffer(buf, dtype=np.uint8), lim,
                                   total, hzcc.scan_segments(cw, ch))
    # verify the end-of-plane marker (ref: hzcc.c:604, 636-639)
    r.pos = a0 * 8 + endbit
    ok = r.get_bits(8) == EOP_SYMBOL
    r.align()
    r.seek_byte(start)
    r.skip_bytes(plen)
    return ok, ll, v
