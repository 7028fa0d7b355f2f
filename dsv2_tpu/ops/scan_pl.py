"""On-device entropy scan: the plane coefficient blob built on the TPU.

The host entropy scan (native dsvn_scan_enc* walking a dense coefficient
transfer) caps 1080p intra around ~7 fps: the dense split-band transfer
ships ~1 byte per coefficient over a ~36 MB/s link (~3 MB/frame at
1080p) before the host even starts coding. The entropy-coded blob itself
is ~6x smaller, so this module produces the FINAL scan blob on device and
ships only that: the d2h payload drops to entropy-coded size and the host
serializer becomes a memcpy (ref: hzcc.c:234-448 — the scan this
reproduces bit-for-bit; RUN_BITS framing in native/dsv2n.c
scan_dense8_bw).

Blob layout (byte-aligned at both ends, drop-in for BitWriter
concat_bytes / native bw_bytes):

  [24-bit nruns][codes...][align to byte]

Per nonzero coefficient, in scan order:
  - UEG(run): for run+1 with leading bit dropped, bits interleaved with
    zeros, terminating 1 — length 2*nb+1;
  - value: LL segment (damp < 0) NEG = UEG(|v|-1) + sign bit; HF segments
    adaptive rice: q zero bits, a 1, then k = vk>>damp low bits of u-1
    (u the zigzag-folded value), with vk adapting by +-1 on q != 0.

Everything here is data-parallel XLA except the vk adaptation chain — a
strictly sequential recurrence over the nonzero values — which runs as a
Pallas kernel: a scalar SMEM loop over value chunks with vk carried in
SMEM scratch across sequential grid steps (the XLA alternative pays the
~1-2.5 ms/iteration loop floor PER VALUE; the kernel pays ~a few cycles).

Emission exploits two facts: rice's q zeros never need writing (the
buffer starts zeroed), and every remaining code piece fits 64 bits. Each
nonzero becomes two <=64-bit "records" (run UEG; value tail) at strictly
increasing bit offsets; each output byte gathers the <=8 records that can
intersect it (records are >=1 bit, so <=8 start in any byte, plus one
straddler).

The device blob targets the dense8 contract (|HF| <= 127); anything
outside it, or a blob over the static byte capacity, raises the fallback
flag and the host redoes that plane natively — byte-exactness is never
at risk.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RUN_BITS = 24
_CHUNK = 1024      # vk-kernel SMEM chunk (elements per sequential grid step)


def _interpret():
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# static per-position tables
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _pos_tables(segments):
    """(damp_of_pos int32[total] with -1 for the NEG segment,) —
    segments: tuple of (count, damp)."""
    total = sum(c for c, _ in segments)
    damp = np.empty(total, np.int32)
    off = 0
    for c, d in segments:
        damp[off:off + c] = d
        off += c
    return damp  # numpy: safe to close over from any trace context


# ---------------------------------------------------------------------------
# the vk adaptation chain (sequential) — Pallas scalar kernel
# ---------------------------------------------------------------------------

_ROWS = 8          # chunk rows per grid step (Mosaic wants blocks of 8 rows)


@functools.lru_cache(maxsize=None)
def _vk_call(npad):
    """fn(e, damp, isr, nnz) -> k, arrays (npad,) int32 padded with isr=0.
    Per element: k = vk >> damp (the rice parameter used for it), then
    vk += 1 if e >= k else max(vk-1, 0), applied only when isr != 0.
    e = floor(log2(u-1)) (-1 when u == 1) makes 'q != 0' == 'e >= k'.
    Only the first nnz slots hold live elements: grid steps past them
    skip entirely (grid-step cost only) and each live row's loop stops
    at the bound — the scalar loop runs ~nnz iterations, not npad.
    Blocks are (_ROWS, _CHUNK): Mosaic requires the second-to-last block
    dim to be a multiple of 8 even in SMEM, so each grid step walks 8
    chunk rows sequentially."""
    step = _ROWS * _CHUNK
    nch = npad // _CHUNK
    assert nch % _ROWS == 0
    ngrid = nch // _ROWS

    def kernel(n_ref, e_ref, d_ref, r_ref, k_ref, vk_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            vk_ref[0] = 0

        @pl.when(c * step < n_ref[0, 0])
        def _():
            def row(r, vk):
                def body(i, vk):
                    d = d_ref[r, i]
                    k = vk >> d
                    k_ref[r, i] = k
                    inc = e_ref[r, i] >= k
                    nvk = jnp.where(inc, vk + 1, jnp.maximum(vk - 1, 0))
                    return jnp.where(r_ref[r, i] != 0, nvk, vk)

                lim = jnp.clip(n_ref[0, 0] - c * step - r * _CHUNK,
                               0, _CHUNK)
                return jax.lax.fori_loop(0, lim, body, vk)

            vk = vk_ref[0]
            for r in range(_ROWS):
                vk = row(r, vk)
            vk_ref[0] = vk

    def call(e, damp, isr, nnz):
        spec = pl.BlockSpec((_ROWS, _CHUNK), lambda c: (c, 0),
                            memory_space=pltpu.SMEM)
        nspec = pl.BlockSpec((1, 1), lambda c: (0, 0),
                             memory_space=pltpu.SMEM)
        return pl.pallas_call(
            kernel, grid=(ngrid,),
            out_shape=jax.ShapeDtypeStruct((nch, _CHUNK), jnp.int32),
            in_specs=[nspec, spec, spec, spec],
            out_specs=spec,
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            interpret=_interpret(),
            compiler_params=None if _interpret() else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(nnz.astype(jnp.int32).reshape(1, 1), e.reshape(nch, _CHUNK),
          damp.reshape(nch, _CHUNK),
          isr.reshape(nch, _CHUNK)).reshape(npad)

    return call


# ---------------------------------------------------------------------------
# code-pattern construction (vectorized)
# ---------------------------------------------------------------------------

def _ilog2(x):
    """floor(log2(x)) for x >= 1; -1 for x == 0 (int32)."""
    return jnp.where(x > 0, 31 - jax.lax.clz(x.astype(jnp.int32)), -1)


def _spread(x):
    """Interleave zeros below each bit: bit i of x -> bit 2i of result.
    x < 2^16; returns uint32 with bits at even positions."""
    x = x.astype(jnp.uint32)
    x = (x | (x << 8)) & jnp.uint32(0x00FF00FF)
    x = (x | (x << 4)) & jnp.uint32(0x0F0F0F0F)
    x = (x | (x << 2)) & jnp.uint32(0x33333333)
    x = (x | (x << 1)) & jnp.uint32(0x55555555)
    return x


def _ueg_pattern(v):
    """UEG code for v (codes x = v+1): pattern value + bit length.
    Bitstring: [0 b_{nb-1} 0 b_{nb-2} ... 0 b_0 1], nb = ilog2(v+1).
    As an integer (LSB = last bit): 1 | spread(x without leading bit) << 1.
    Returns (lo, hi) uint32 halves and len = 2*nb+1 (<= 63 for v < 2^31)."""
    x = (v + 1).astype(jnp.uint32)
    nb = _ilog2(x.astype(jnp.int32))
    body = x ^ (jnp.uint32(1) << nb.astype(jnp.uint32))   # drop leading 1
    lo16 = body & jnp.uint32(0xFFFF)
    hi16 = body >> jnp.uint32(16)
    slo = _spread(lo16)
    shi = _spread(hi16)
    # pattern = (spread(body) << 1) | 1 ; spread(body) spans 2*nb bits
    plo = (slo << jnp.uint32(1)) | jnp.uint32(1)
    phi_from_lo = slo >> jnp.uint32(31)
    phi = (shi << jnp.uint32(1)) | phi_from_lo
    # shi contributes at bit 32 onward: spread(hi16) << 32 <<1 -> phi<<1|..
    # (spread(lo16) fits 32 bits; its bit 31 crosses into hi when shifted)
    return plo, phi, 2 * nb + 1


def _shl64(lo, hi, s):
    """(lo, hi) << s for 0 <= s <= 31 (uint32 halves)."""
    s = s.astype(jnp.uint32)
    nlo = jnp.where(s == 0, lo, lo << s)
    carry = jnp.where(s == 0, jnp.uint32(0), lo >> (jnp.uint32(32) - s))
    nhi = jnp.where(s == 0, hi, (hi << s) | carry)
    return nlo, nhi


def _neg_pattern(v):
    """NEG code for v != 0: UEG(|v|-1) then sign bit. len = 2*nb+2."""
    s = (v < 0).astype(jnp.uint32)
    av = jnp.abs(v)
    plo, phi, ln = _ueg_pattern(av - 1)
    plo, phi = _shl64(plo, phi, jnp.full_like(plo, 1, jnp.uint32))
    plo = plo | s
    return plo, phi, ln + 1


# ---------------------------------------------------------------------------
# blob builder
# ---------------------------------------------------------------------------

def _pad_to(n, m):
    return -(-n // m) * m


@functools.lru_cache(maxsize=None)
def make_scan_blob(segments, cap_bytes):
    """Jitted fn(v int32[total]) -> (blob uint8[cap_bytes], nbytes int32,
    fallback bool). segments: tuple of (count, damp) as in
    hzcc.scan_segments. Blob bytes [0, nbytes) byte-match the native
    scan encoder's; on fallback the caller must host-encode instead."""
    total = sum(c for c, _ in segments)
    npad = _pad_to(max(total, _CHUNK), _ROWS * _CHUNK)
    damp_pos = _pos_tables(segments)
    Mb = cap_bytes

    def f(v):
        v = v.astype(jnp.int32)
        idxs = jnp.arange(total, dtype=jnp.int32)
        nz = v != 0
        nruns = nz.sum(dtype=jnp.int32)
        rank = jnp.cumsum(nz, dtype=jnp.int32) - 1
        tgt = jnp.where(nz, rank, total)
        vals = jnp.zeros(total, jnp.int32).at[tgt].set(v, mode="drop")
        pos = jnp.zeros(total, jnp.int32).at[tgt].set(idxs, mode="drop")
        act = idxs < nruns                       # live compacted slots

        dmp = jnp.where(act, jnp.asarray(damp_pos)[
            jnp.clip(pos, 0, total - 1)], 0)
        isr = act & (dmp >= 0)
        isneg = act & (dmp < 0)

        # zigzag fold u and e = ilog2(u-1) for the rice elements
        u = jnp.where(vals >= 0, 2 * vals, -2 * vals - 1)
        um1 = jnp.maximum(u - 1, 0)
        e = _ilog2(um1)

        # contract guards -> host fallback
        bad_hf = isr & (jnp.abs(vals) > 127)
        bad_ll = isneg & (jnp.abs(vals) >= (1 << 30))
        fallback = bad_hf.any() | bad_ll.any()

        # vk chain (sequential) -> per-element rice k
        epad = jnp.zeros(npad, jnp.int32).at[:total].set(jnp.where(isr, e, 0))
        dpad = jnp.zeros(npad, jnp.int32).at[:total].set(
            jnp.where(isr, dmp, 0))
        rpad = jnp.zeros(npad, jnp.int32).at[:total].set(
            isr.astype(jnp.int32))
        k = _vk_call(npad)(epad, dpad, rpad, nruns)[:total]
        # slots past nruns never get written by the kernel: clamp the
        # garbage so the (masked-out) shift math below stays defined
        k = jnp.clip(k, 0, 30)

        # record A: UEG(run); run = pos diff - 1 (pos[-1] == -1)
        run = pos - jnp.concatenate([jnp.full(1, -1, jnp.int32),
                                     pos[:-1]]) - 1
        run = jnp.where(act, run, 0)
        alo, ahi, alen = _ueg_pattern(run)

        # record B: NEG or rice tail [1][k bits of u-1] after q zeros
        nlo, nhi, nlen = _neg_pattern(jnp.where(isneg, vals, 1))
        q = um1 >> jnp.minimum(k, 30).astype(jnp.uint32)
        kmask = jnp.where(k >= 31, jnp.uint32(0xFFFFFFFF),
                          (jnp.uint32(1) << jnp.clip(k, 0, 31).astype(
                              jnp.uint32)) - 1)
        rlo = (jnp.uint32(1) << jnp.clip(k, 0, 31).astype(jnp.uint32)) | (
            um1.astype(jnp.uint32) & kmask)
        rhi = jnp.zeros_like(rlo)
        rlen = 1 + k
        blo = jnp.where(isneg, nlo, rlo)
        bhi = jnp.where(isneg, nhi, rhi)
        blen = jnp.where(isneg, nlen, rlen)
        bgap = jnp.where(isneg, 0, q.astype(jnp.int32))   # zeros before B

        # offsets: record A at o, record B at o + alen + bgap
        tot_i = jnp.where(act, alen + bgap + blen, 0)
        starts_a = RUN_BITS + jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(tot_i, dtype=jnp.int32)[:-1]])
        starts_b = starts_a + alen + bgap
        end_bits = jnp.where(nruns > 0, starts_b[jnp.maximum(nruns - 1, 0)]
                             + blen[jnp.maximum(nruns - 1, 0)], RUN_BITS)
        nbytes = (end_bits + 7) // 8
        fallback = fallback | (nbytes > Mb) | (nruns >= (1 << RUN_BITS))

        # interleaved record table (2 per element), padded sentinel INF
        INF = jnp.int32(2147483647)
        rs = jnp.stack([jnp.where(act, starts_a, INF),
                        jnp.where(act, starts_b, INF)], 1).reshape(-1)
        rl = jnp.stack([alen, blen], 1).reshape(-1)
        rlo_t = jnp.stack([alo, blo], 1).reshape(-1)
        rhi_t = jnp.stack([ahi, bhi], 1).reshape(-1)

        # emission: byte b gathers candidate records j0-? .. j0+7
        bidx = jnp.arange(Mb, dtype=jnp.int32)
        qbit = bidx * 8
        j0 = jnp.searchsorted(rs, qbit, side="right").astype(jnp.int32) - 1
        out = jnp.zeros(Mb, jnp.uint32)
        nrec = rs.shape[0]
        for t in range(8):
            j = jnp.clip(j0 + t, 0, nrec - 1)
            s = rs[j]
            ln = rl[j]
            lo = rlo_t[j]
            hi = rhi_t[j]
            valid = (j0 + t >= 0) & (j0 + t < nrec) & (s < qbit + 8) & (
                s + ln > qbit) & (s != INF)
            # want bits [off, off+8) of the record's bitstring, where
            # bitstring bit t' = pattern bit (ln-1-t'); off = qbit - s
            sh = ln - (qbit - s) - 8            # >>sh if >=0 else <<-sh
            shr = jnp.clip(sh, 0, 63).astype(jnp.uint32)
            # 64-bit >> shr -> low byte
            lo1 = jnp.where(shr >= 32,
                            jnp.where(shr >= 64, jnp.uint32(0),
                                      hi >> (shr - jnp.uint32(32))),
                            jnp.where(shr == 0, lo,
                                      (lo >> shr) | (hi << (jnp.uint32(32)
                                                            - shr))))
            shl = jnp.clip(-sh, 0, 31).astype(jnp.uint32)
            b1 = jnp.where(sh >= 0, lo1, lo << shl) & jnp.uint32(0xFF)
            out = out | jnp.where(valid, b1, jnp.uint32(0))

        blob = out.astype(jnp.uint8)
        hdr = jnp.stack([nruns >> 16, nruns >> 8, nruns]).astype(jnp.uint8)
        blob = blob.at[0:3].set(hdr & jnp.uint8(0xFF))
        return blob, nbytes, fallback

    return jax.jit(f)
