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

Emission is scatter-add of disjoint bit patterns into a u32 word buffer
(bits never overlap across codes, and rice's q zero-gap bits never need
writing, so integer add == bitwise or). Every code splits into at most
two <=64-bit parts (run UEG <=43 bits; value tail <=62 bits), and a
<=64-bit part intersects at most 3 consecutive u32 words — a static
3-word scatter footprint. Three dynamically-bounded chunk loops keep the
scatter-update count proportional to the LIVE code count, not the plane
size (under jax.vmap the traced loop bounds batch to the lane maximum):

  L1 — LL prefix (compacted slots [0, nll)): generic two-part emission,
       6 word-updates per slot (LL NEG codes are routinely long); its
       chunk is sized to the STATIC LL band (ll_n is known per plane),
       so one trip covers it with no dead slots;
  L2 — HF slots [0, nruns): two-part emission, 5 word-updates per slot
       (run UEG <=45 bits -> 3 words; rice tail <=31 bits -> 2). An
       earlier design merged short codes into one 2-update part and
       row-scattered long ones into a spill table, but the per-trip
       8-column spill-row scatter cost more than the 3 updates it
       saved (measured 62 -> ~30 ms per 8-frame FHD luma chunk).

  Chunk sizes adapt to the plane: the HF chunk targets ~1/16 density
  (clamped [2048, 65536]) so small planes (CIF P frames) don't pay a
  65536-slot floor per trip.

The first emission profile of this path's predecessor (per-BYTE gather
of 8 candidate records + a searchsorted over the byte grid) measured
~730 ms for ONE 1080p luma plane on a v5e — per-element gathers are
~20 ns each on TPU while scatter updates stream ~ns-scale — hence the
scatter formulation.

The device blob targets the dense8 contract (|HF| <= 127); anything
outside it, or a blob over the static byte capacity, or a spill-table
overflow, raises the fallback flag and the host redoes that plane
natively — byte-exactness is never at risk.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RUN_BITS = 24
_RCH_MIN = 1 << 11   # vk kernel row-chunk; HF chunks stay multiples of it


def _chunk_sizes(total, ll_n):
    """(cll, chf, TP) for a plane with `total` scan positions and an
    `ll_n`-wide LL NEG prefix. cll: one L1 trip covers the whole LL band
    (it is tiny and static); chf: ~total/16 (the emit trip count tracks
    the live density instead of paying a 65536-slot floor on small
    planes); TP: compacted-slot padding, a multiple of chf (so the
    emission dynamic_slice chunks fit) and of the vk kernel's row chunk.
    cll and chf are powers of two with cll | chf."""
    chf = max(_RCH_MIN,
              min(1 << 16, 1 << (max(total // 16, 1) - 1).bit_length()))
    cll = max(8, min(chf, 1 << (max(ll_n, 1) - 1).bit_length()))
    tp = _pad_to(max(total, chf), chf)
    return cll, chf, tp


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


def _damp_of_pos(segments, pos):
    """damp as an elementwise piecewise-constant of the scan position —
    a handful of compares instead of a gathered/scattered table column
    (segments is a short static tuple)."""
    out = jnp.full(pos.shape, segments[-1][1], jnp.int32)
    ends = np.cumsum([c for c, _ in segments])
    for j in range(len(segments) - 2, -1, -1):
        out = jnp.where(pos < int(ends[j]), jnp.int32(segments[j][1]), out)
    return out


# ---------------------------------------------------------------------------
# the vk adaptation chain (sequential) — Pallas scalar kernel
# ---------------------------------------------------------------------------

_RCH = 2048        # vk rows per grid step (must divide npad; 8 | _RCH)


@functools.lru_cache(maxsize=None)
def _vk_vec_batched(npad, B):
    """All B chains at once, as VECTOR LANES: thr (npad, B) time-major ->
    vkpre (npad, B). The rice recurrence is elementwise in the chain
    state, so B independent chains advance in one vreg per step — the
    chain is sequential over ELEMENTS, parallel over CHAINS. A batch of
    8 frames x 3 planes as 3 lane-parallel kernels costs ~one chain's
    latency instead of 24 chains end to end.

    Rows are loaded/stored 8 at a time at aligned sublane offsets
    (Mosaic rejects unaligned dynamic sublane slices) and walked
    unrolled in registers; per-lane [s0, nnz) live masks gate the state
    update so shorter chains just coast."""
    assert npad % _RCH == 0 and _RCH % 8 == 0
    ngrid = npad // _RCH

    def kernel(lim_ref, b_ref, t_ref, k_ref, vk_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            vk_ref[...] = jnp.zeros((1, B), jnp.int32)

        base = c * _RCH

        @pl.when(base < lim_ref[0, 0])
        def _():
            s0 = b_ref[0:1, :]
            nnz = b_ref[1:2, :]

            def group(m, vk):
                t8 = t_ref[pl.ds(pl.multiple_of(m * 8, 8), 8), :]
                outs = []
                for j in range(8):
                    i = base + m * 8 + j
                    outs.append(vk)
                    live = (i >= s0) & (i < nnz)
                    nvk = jnp.where(vk < t8[j:j + 1, :], vk + 1,
                                    jnp.maximum(vk - 1, 0))
                    vk = jnp.where(live, nvk, vk)
                k_ref[pl.ds(pl.multiple_of(m * 8, 8), 8), :] = (
                    jnp.concatenate(outs, axis=0))
                return vk

            vk = jax.lax.fori_loop(0, _RCH // 8, group, vk_ref[...])
            vk_ref[...] = vk

    def call(thr_t, s0, nnz):
        lim = jnp.max(nnz).astype(jnp.int32).reshape(1, 1)
        b = jnp.stack([s0.astype(jnp.int32),
                       nnz.astype(jnp.int32)], axis=0)  # (2, B)
        spec = pl.BlockSpec((_RCH, B), lambda c: (c, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(ngrid,),
            out_shape=jax.ShapeDtypeStruct((npad, B), jnp.int32),
            in_specs=[pl.BlockSpec((1, 1), lambda c: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((2, B), lambda c: (0, 0),
                                   memory_space=pltpu.VMEM),
                      spec],
            out_specs=spec,
            scratch_shapes=[pltpu.VMEM((1, B), jnp.int32)],
            interpret=_interpret(),
            compiler_params=None if _interpret() else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(lim, b, thr_t)

    return call


@functools.lru_cache(maxsize=None)
def _vk_call(npad):
    """fn(thr, s0, nnz) -> vkpre, arrays (npad,) int32.

    Walks the rice slots [s0, nnz) of the compacted value stream (the
    LL NEG prefix carries no rice state) and stores each slot's
    PRE-update vk; the caller derives k = vkpre >> damp vectorized.
    thr pre-bakes the adaptation compare: e >= (vk >> d)  <=>
    vk < (e+1) << d =: thr, so the sequential body is one load, one
    store and a three-op dependent chain.

    custom_vmap: under jax.vmap (the batched encode pipelines) ALL the
    lanes' chains run as vector lanes of ONE kernel pass
    (_vk_vec_batched) instead of batch-many sequential grid walks."""

    @jax.custom_batching.custom_vmap
    def chain(thr, s0, nnz):
        out = _vk_vec_batched(npad, 1)(
            thr[:, None], s0.reshape(1), nnz.reshape(1))
        return out[:, 0]

    @chain.def_vmap
    def _rule(axis_size, in_batched, thr, s0, nnz):
        tb, sb, nb = in_batched
        B = axis_size
        thr = thr if tb else jnp.broadcast_to(thr[None], (B, npad))
        s0 = s0 if sb else jnp.broadcast_to(s0[None], (B,))
        nnz = nnz if nb else jnp.broadcast_to(nnz[None], (B,))
        lead = thr.shape[:-1]
        thr2 = thr.reshape(-1, npad)
        out = _vk_vec_batched(npad, thr2.shape[0])(
            thr2.T, s0.reshape(-1), nnz.reshape(-1))
        return out.T.reshape(*lead, npad), True

    return chain


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


def _shl64_wide(lo, hi, s):
    """(lo, hi) << s for 0 <= s <= 63 (uint32 halves)."""
    s = s.astype(jnp.uint32)
    big = s >= 32
    sl = jnp.where(big, s - jnp.uint32(32), s)
    l1, h1 = _shl64(lo, hi, sl)
    return (jnp.where(big, jnp.uint32(0), l1),
            jnp.where(big, jnp.where(sl == 0, lo, lo << sl), h1))


def _neg_pattern(v):
    """NEG code for v != 0: UEG(|v|-1) then sign bit. len = 2*nb+2."""
    s = (v < 0).astype(jnp.uint32)
    av = jnp.abs(v)
    plo, phi, ln = _ueg_pattern(av - 1)
    plo, phi = _shl64(plo, phi, jnp.full_like(plo, 1, jnp.uint32))
    plo = plo | s
    return plo, phi, ln + 1


# ---------------------------------------------------------------------------
# scatter-add word emission
# ---------------------------------------------------------------------------

def _part_word(s, ln, lo, hi, w):
    """u32 contribution of a <=64-bit code part (global bit offset s,
    length ln, pattern halves lo/hi with bitstring bit t' = pattern bit
    ln-1-t') to absolute output word w. Wire order: stream byte b lives
    in word b>>2 lane b&3 (little-endian u32 view), MSB-first within the
    byte."""
    acc = jnp.zeros(s.shape, jnp.uint32)
    for lane in range(4):
        qbit = (4 * w + lane) * 8
        off = qbit - s
        sh = ln - off - 8                   # >>sh if >=0 else <<-sh
        shr = jnp.clip(sh, 0, 63).astype(jnp.uint32)
        lo1 = jnp.where(shr >= 32,
                        jnp.where(shr >= 64, jnp.uint32(0),
                                  hi >> (shr - jnp.uint32(32))),
                        jnp.where(shr == 0, lo,
                                  (lo >> shr) | (hi << (jnp.uint32(32)
                                                        - shr))))
        shl = jnp.clip(-sh, 0, 31).astype(jnp.uint32)
        b1 = jnp.where(sh >= 0, lo1, lo << shl) & jnp.uint32(0xFF)
        valid = (off > -8) & (off < ln)
        acc = acc | jnp.where(valid, b1 << jnp.uint32(8 * lane),
                              jnp.uint32(0))
    return acc


def _scatter_part(buf, live, s, ln, lo, hi, mw, nwords=3):
    """Scatter-add one code part's word footprint into buf (mw int32
    words); bits are disjoint across all parts so add == or. A <=64-bit
    part at an arbitrary bit offset touches <=3 consecutive words
    (nwords=3, the generic case); L2's merged parts are <=33 bits and
    can only intersect 2 (bit 31 + 33 bits ends at bit 63 of the next
    word), so nwords=2 drops a third of their scatter traffic."""
    ws = s >> 5                 # s >= 0 always (bit offsets)
    for m in range(nwords):
        w = ws + m
        c = _part_word(s, ln, lo, hi, w).astype(jnp.int32)
        idx = jnp.where(live & (c != 0), w, mw)
        buf = buf.at[idx].add(c, mode="drop")
    return buf


def _pad_to(n, m):
    return -(-n // m) * m


@functools.lru_cache(maxsize=None)
def make_scan_blob(segments, cap_bytes):
    """Jitted fn(v int32[total]) -> (blob uint8[cap_bytes], nbytes int32,
    fallback bool). segments: tuple of (count, damp) as in
    hzcc.scan_segments. Blob bytes [0, nbytes) byte-match the native
    scan encoder's; on fallback the caller must host-encode instead."""
    total = sum(c for c, _ in segments)
    ll_n = segments[0][0] if segments and segments[0][1] < 0 else 0
    _CLL, _CHF, TP = _chunk_sizes(total, ll_n)
    assert TP % _RCH == 0 and _CHF % _CLL == 0
    npad = TP
    Mb = cap_bytes
    Mw = _pad_to(Mb, 4) // 4

    def f(v):
        v = v.astype(jnp.int32)
        idxs = jnp.arange(total, dtype=jnp.int32)
        nz = v != 0
        nruns = nz.sum(dtype=jnp.int32)
        nll = nz[:ll_n].sum(dtype=jnp.int32)       # live LL prefix length
        # left-compaction as ONE stable sort on the 0/1 iszero key (a
        # stable partition): 6x faster than the scatter formulation on
        # TPU (measured 223 ms -> 37 ms per 8-frame FHD luma chunk for
        # rank-cumsum + two 1-column .at[tgt].set scatters vs this;
        # multi-column row scatters were another 8x worse still)
        _, sv, si = jax.lax.sort(((~nz).astype(jnp.int32), v, idxs),
                                 num_keys=1, is_stable=True)
        live = jnp.arange(TP, dtype=jnp.int32) < nruns
        vals = jnp.where(live, jnp.zeros(TP, jnp.int32).at[:total].set(sv),
                         0)
        pos = jnp.where(live, jnp.zeros(TP, jnp.int32).at[:total].set(si),
                        0)
        dmp = _damp_of_pos(segments, pos)
        idxs = jnp.arange(TP, dtype=jnp.int32)   # slot ids, padded width
        act = idxs < nruns                       # live compacted slots
        isneg = act & (dmp < 0)
        isr = act & (dmp >= 0)

        # zigzag fold u and e = ilog2(u-1) for the rice elements
        u = jnp.where(vals >= 0, 2 * vals, -2 * vals - 1)
        um1 = jnp.maximum(u - 1, 0)
        e = _ilog2(um1)

        # contract guards -> host fallback
        bad_hf = isr & (jnp.abs(vals) > 127)
        bad_ll = isneg & (jnp.abs(vals) >= (1 << 30))
        fallback = bad_hf.any() | bad_ll.any()

        # vk chain (sequential) -> per-element rice k (pre-update vk)
        dsafe = jnp.maximum(dmp, 0)
        thr = jnp.where(isr, (e + 1) << dsafe, 0)
        vkpre = _vk_call(npad)(thr, nll, nruns)
        # the vector kernel writes every row below its lim chunk bound
        # from VMEM state (NEG-prefix rows get the coasting vk, rows
        # below s0 hold vk=0); only rows in chunks past max(nnz) are
        # never written. Clamp so the masked-out shift math below stays
        # defined for those
        k = jnp.clip(jnp.maximum(vkpre, 0) >> dsafe, 0, 30)

        # part A: UEG(run); run = pos diff - 1 (pos[-1] == -1)
        run = pos - jnp.concatenate([jnp.full(1, -1, jnp.int32),
                                     pos[:-1]]) - 1
        run = jnp.where(act, run, 0)
        alo, ahi, alen = _ueg_pattern(run)

        # part B: NEG or rice tail [1][k bits of u-1] after q zeros
        nlo, nhi, nlen = _neg_pattern(jnp.where(isneg, vals, 1))
        q = um1 >> k
        kmask = (jnp.uint32(1) << k.astype(jnp.uint32)) - 1
        rlo = (jnp.uint32(1) << k.astype(jnp.uint32)) | (
            um1.astype(jnp.uint32) & kmask)
        rhi = jnp.zeros_like(rlo)
        rlen = 1 + k
        blo = jnp.where(isneg, nlo, rlo)
        bhi = jnp.where(isneg, nhi, rhi)
        blen = jnp.where(isneg, nlen, rlen)
        bgap = jnp.where(isneg, 0, q.astype(jnp.int32))   # zeros before B

        # bit offsets: part A at sa, part B at sa + alen + bgap
        tot_i = jnp.where(act, alen + bgap + blen, 0)
        sa = RUN_BITS + jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(tot_i, dtype=jnp.int32)[:-1]])
        sb = sa + alen + bgap
        end_bits = jnp.where(nruns > 0, sb[jnp.maximum(nruns - 1, 0)]
                             + blen[jnp.maximum(nruns - 1, 0)], RUN_BITS)
        nbytes = (end_bits + 7) // 8
        fallback = fallback | (nbytes > Mb) | (nruns >= (1 << RUN_BITS))

        buf = jnp.zeros(Mw, jnp.int32)

        # L1 — LL prefix, generic two-part emission
        def l1(c, buf):
            o = c * _CLL
            sl = lambda a: jax.lax.dynamic_slice(a, (o,), (_CLL,))
            live = sl(isneg)
            buf = _scatter_part(buf, live, sl(sa), sl(alen),
                                sl(alo), sl(ahi), Mw)
            return _scatter_part(buf, live, sl(sb), sl(blen),
                                 sl(blo), sl(bhi), Mw)

        nl1 = jnp.clip(-(-nll // _CLL), 0, -(-total // _CLL))
        buf = jax.lax.fori_loop(0, nl1, l1, buf)

        # L2 — HF two-part emission: run UEG (<=45 bits, 3 words) then
        # the rice tail (1+k <= 31 bits, 2 words) after its zero gap
        def l2(c, buf):
            o = c * _CHF
            sl = lambda a: jax.lax.dynamic_slice(a, (o,), (_CHF,))
            live = sl(isr)
            buf = _scatter_part(buf, live, sl(sa), sl(alen),
                                sl(alo), sl(ahi), Mw)
            return _scatter_part(buf, live, sl(sb), sl(blen),
                                 sl(blo), sl(bhi), Mw, nwords=2)

        nl2 = jnp.clip(-(-nruns // _CHF), 0, -(-total // _CHF))
        buf = jax.lax.fori_loop(0, nl2, l2, buf)

        blob = jax.lax.bitcast_convert_type(buf, jnp.uint8).reshape(-1)[:Mb]
        hdr = jnp.stack([nruns >> 16, nruns >> 8, nruns]).astype(jnp.uint8)
        blob = blob.at[0:3].set(hdr & jnp.uint8(0xFF))
        return blob, nbytes, fallback

    return jax.jit(f)
