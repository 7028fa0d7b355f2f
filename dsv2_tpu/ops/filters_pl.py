"""Pallas TPU in-loop filters: each wavefront anti-diagonal is one grid
step of a kernel that owns the skewed plane in VMEM.

The XLA wavefront (ops/filters) pays the TPU's ~1-2.5 ms scalar-sync floor
per fori iteration — a CIF luma pass alone has 227 diagonals. Here the
whole scan is one pallas_call (sequential "arbitrary" grid) over the same
skewed layout:

- the skewed plane S, reshaped to bands (NB, th, WS), is the kernel's
  aliased input/output; every diagonal reads its (L+2)-band strip with an
  aligned overfetch + dynamic lane rotate and writes deltas back in place;
- windows live lane-major: A[k] is a (ww, L) slab (window column x lane),
  so per-lane properties are (1, L) broadcasts and the 4x4 tile math runs
  on full vregs. The step math is re-expressed in this layout from the
  same normative formulas (ref: src/bmc.c:51-659); strided-slice lattice
  reads and the histogram argmax/gather of the XLA step functions become
  explicit element arithmetic (Mosaic rejects those forms);
- per-tile properties are pre-gathered per diagonal in XLA (static index
  tables) and shipped as (1, NP, 128) VMEM blocks.

Byte-identical to ops/filters and the native host filters (which are the
e2e-verified oracle). (ref: src/bmc.c:390-457 intra dering, :459-602 luma
cleanup, :604-659 chroma)
"""
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as K
from . import jint
from .filters import (_Lay, _layout, _skew, _unskew, _band_delta,
                      _tile_maps, _neighbordif2_grids, _lpf6, _flat6,
                      _curve_tex, F_STABLE, F_MAINTAIN, F_RINGING)

def _lpad(lay):
    """Per-diagonal property-lane padding: lay.L rounded up to the lane
    width. Large planes exceed 128 lanes (FHD luma 4x4 tiles: L=240)."""
    return max(128, -(-lay.L // 128) * 128)


def _interpret():
    return jax.default_backend() == "cpu"


def _vmem_cap():
    """Whole-plane VMEM residency budget for the wavefront kernel; planes
    whose skewed buffer exceeds it use the HBM-resident kernel (720p+
    luma: ~23-51 MB vs ~16 MB VMEM/core). DSV2_PL_VMEM_CAP overrides
    (lets the on-chip parity session and the CPU suite force the HBM
    path at CIF)."""
    return int(os.environ.get("DSV2_PL_VMEM_CAP", str(6 << 20)))


def _vmem_cap_forced():
    return "DSV2_PL_VMEM_CAP" in os.environ


# ---------------------------------------------------------------------------
# lane-major window math: A is (wh, ww, L); per-lane values are (1, L)
# ---------------------------------------------------------------------------


def _put(x, axis, start, rep):
    """x with x[.., start:start+rep.shape[axis], ..] replaced by rep along
    `axis` — expressed as a concat splice: Mosaic lowers neither scatter
    nor dynamic_update_slice on values."""
    n = rep.shape[axis]
    pre = (slice(None),) * axis
    parts = []
    if start > 0:
        parts.append(x[pre + (slice(None, start),)])
    parts.append(rep)
    if start + n < x.shape[axis]:
        parts.append(x[pre + (slice(start + n, None),)])
    return jnp.concatenate(parts, axis=axis)

def _hfilt_t(A, ro, co, edge, thE, thM, guard, in_edge):
    """Vertical-boundary filter at window col `co`, rows ro..ro+3
    (ref: bmc.c:51-119). All scalar args are (1, L)."""
    g = guard & (thM > 0) & ~(edge & (thE <= 0))
    thE_ = jnp.where(edge, thE, thM)
    band = A[ro:ro + 4]                      # (4, ww, L)
    c = [band[:, co + o, :] for o in range(-3, 8)]
    e2, e1, e0, i0, i1, i2 = c[0], c[1], c[2], c[3], c[4], c[5]
    avg = _lpf6(e0, i0, e1, i1)
    f = _flat6(e2, e1, e0, i0, i1, i2, avg, thE_) & g
    a5 = avg * 5
    new = {}
    new[co - 2] = jnp.where(f, (3 * (avg + e1) + 2 * e2 + 4) >> 3, e1)
    new[co - 1] = jnp.where(f, (a5 + 2 * e1 + e2 + 4) >> 3, e0)
    new[co + 0] = jnp.where(f, avg, i0)
    new[co + 1] = jnp.where(f, (a5 + 2 * i1 + i2 + 4) >> 3, i1)
    i2b, i1b, i0b, e0b, e1b, e2b = c[5], c[6], c[7], c[8], c[9], c[10]
    avgb = _lpf6(e0b, i0b, e1b, i1b)
    fb = _flat6(e2b, e1b, e0b, i0b, i1b, i2b, avgb, thM) & (g & in_edge)
    a5b = avgb * 5
    new[co + 3] = jnp.where(fb, (a5b + 2 * i1b + i2b + 4) >> 3, i1b)
    new[co + 4] = jnp.where(fb, avgb, i0b)
    new[co + 5] = jnp.where(fb, (a5b + 2 * e1b + e2b + 4) >> 3, e0b)
    new[co + 6] = jnp.where(fb, (3 * (avgb + e1b) + 2 * e2b + 4) >> 3, e1b)
    cols = [new[j][:, None, :] if j in new else band[:, j:j + 1, :]
            for j in range(band.shape[1])]
    band = jnp.concatenate(cols, axis=1)
    return _put(A, 0, ro, band)


def _vfilt_t(A, ro, co, edge, thE, thM, guard, in_edge):
    """Horizontal-boundary filter at window row `ro`, cols co..co+3
    (ref: bmc.c:121-191)."""
    g = guard & (thM > 0) & ~(edge & (thE <= 0))
    thE_ = jnp.where(edge, thE, thM)
    band = A[:, co:co + 4, :]                # (wh, 4, L)
    r = [band[ro + o] for o in range(-3, 8)]
    e2, e1, e0, i0, i1, i2 = r[0], r[1], r[2], r[3], r[4], r[5]
    avg = _lpf6(e0, i0, e1, i1)
    f = _flat6(e2, e1, e0, i0, i1, i2, avg, thE_) & g
    a5 = avg * 5
    new = {}
    new[ro - 2] = jnp.where(f, (3 * (avg + e1) + 2 * e2 + 4) >> 3, e1)
    new[ro - 1] = jnp.where(f, (a5 + 2 * e1 + e2 + 4) >> 3, e0)
    new[ro + 0] = jnp.where(f, avg, i0)
    new[ro + 1] = jnp.where(f, (a5 + 2 * i1 + i2 + 4) >> 3, i1)
    i2b, i1b, i0b, e0b, e1b, e2b = r[5], r[6], r[7], r[8], r[9], r[10]
    avgb = _lpf6(e0b, i0b, e1b, i1b)
    fb = _flat6(e2b, e1b, e0b, i0b, i1b, i2b, avgb, thM) & (g & in_edge)
    a5b = avgb * 5
    new[ro + 3] = jnp.where(fb, (a5b + 2 * i1b + i2b + 4) >> 3, i1b)
    new[ro + 4] = jnp.where(fb, avgb, i0b)
    new[ro + 5] = jnp.where(fb, (a5b + 2 * e1b + e2b + 4) >> 3, e0b)
    new[ro + 6] = jnp.where(fb, (3 * (avgb + e1b) + 2 * e2b + 4) >> 3, e1b)
    rows = [new[i][None] if i in new else band[i:i + 1]
            for i in range(band.shape[0])]
    band = jnp.concatenate(rows, axis=0)
    return _put(A, 1, co, band)


def _tile16(A, ro, co):
    """The 4x4 tile as 16 (1, L) vectors, row-major."""
    return [[A[ro + r, co + c][None, :] for c in range(4)] for r in range(4)]


def _quads_t(t):
    d0 = (t[0][0] + t[0][1] + t[1][0] + t[1][1] + 2) >> 2
    d1 = (t[0][2] + t[0][3] + t[1][2] + t[1][3] + 2) >> 2
    d2 = (t[2][0] + t[2][1] + t[3][0] + t[3][1] + 2) >> 2
    d3 = (t[2][2] + t[2][3] + t[3][2] + t[3][3] + 2) >> 2
    return d0, d1, d2, d3


def _tile_energy_t(A, ro, co):
    """4x4 haar + downsampled energy (ref: bmc.c:224-270); the strided
    lattice reads are explicit 2x2 element sums here."""
    t = _tile16(A, ro, co)
    d0, d1, d2, d3 = _quads_t(t)
    sh = sv = None
    for r in (0, 1):
        for c in (0, 1):
            x0 = t[2 * r][2 * c]
            x1 = t[2 * r][2 * c + 1]
            x2 = t[2 * r + 1][2 * c]
            x3 = t[2 * r + 1][2 * c + 1]
            hh = jnp.abs(x0 - x1 - x2 + x3) >> 1
            th_ = jnp.abs(x0 - x1 + x2 - x3) + hh
            tv_ = jnp.abs(x0 + x1 - x2 - x3) + hh
            sh = th_ if sh is None else sh + th_
            sv = tv_ if sv is None else sv + tv_
    hhl = jnp.abs(d0 - d1 - d2 + d3) >> 1
    slh = jnp.abs(d0 - d1 + d2 - d3) + hhl
    slv = jnp.abs(d0 + d1 - d2 - d3) + hhl
    return sh, sv, slh, slv


def _dsfactor_t(A, ro, co):
    """(ref: bmc.c:193-222)."""
    d0, d1, d2, d3 = _quads_t(_tile16(A, ro, co))
    sh = jnp.abs((d0 + d1) - (d3 + d2))
    sv = jnp.abs((d2 + d1) - (d3 + d0))
    small = jnp.maximum(sh, sv) < 8
    d2b = 255 - d2
    d3b = 255 - d3
    sh2 = jnp.abs(d0 - d1 + d2b - d3b)
    sv2 = jnp.abs(d0 + d1 - d2b - d3b) >> 2
    r = jnp.where(sh2 > sv2, (3 * sh2 + sv2 + 2) >> 2,
                  (3 * sv2 + sh2 + 2) >> 2)
    return jnp.where(small, 0, r)


def _degrad_t(A, ro, co, mask):
    """Histogram de-gradient sharpener (ref: bmc.c:272-337). The argmax /
    take_along_axis of the XLA form become explicit min/max/select folds
    over the 16 bins."""
    t = _tile16(A, ro, co)
    v = [t[r][c] for r in range(4) for c in range(4)]
    z = jnp.zeros_like(v[0])
    hist = []
    sums = []
    for b in range(16):
        eq = [(p >> 4) == b for p in v]
        hist.append(sum(e.astype(jnp.int32) for e in eq))
        sums.append(sum(jnp.where(e, p, 0) for e, p in zip(eq, v)))
    lo = jnp.full_like(z, 16)
    hi = jnp.full_like(z, -1)
    for b in range(16):
        has = hist[b] > 0
        lo = jnp.minimum(lo, jnp.where(has, b, 16))
        hi = jnp.maximum(hi, jnp.where(has, b, -1))
    ok = mask & (lo < hi)
    hl = z
    hh_ = z
    alo_s = z
    ahi_s = z
    for b in range(16):
        hl = hl + jnp.where(lo == b, hist[b], 0)
        hh_ = hh_ + jnp.where(hi == b, hist[b], 0)
        alo_s = alo_s + jnp.where(lo == b, sums[b], 0)
        ahi_s = ahi_s + jnp.where(hi == b, sums[b], 0)
    alo = jnp.maximum(alo_s // jnp.maximum(hl, 1), 1)
    ahi = jnp.maximum(ahi_s // jnp.maximum(hh_, 1), 1)
    mid = (alo + ahi + 1) >> 1
    rows = []
    for r in range(4):
        cols = []
        for c in range(4):
            p = t[r][c]
            low = p + jint.divt(hl * (alo - p), 16)
            hig = p + jint.divt(hh_ * (ahi - p), 16)
            nv = jnp.where(p < mid, low, jnp.where(p > mid, hig, p))
            cols.append(jnp.where(ok, nv, p))
        rows.append(jnp.stack(cols, axis=1))     # (1, 4, L)
    region = jnp.concatenate(rows, axis=0)       # (4, 4, L)
    mid4 = _put(A[ro:ro + 4], 1, co, region)
    return _put(A, 0, ro, mid4)


# ---------------------------------------------------------------------------
# the wavefront kernel
# ---------------------------------------------------------------------------

def _boff_rk(lay, k):
    """Window row k -> (relative band in the (L+2)-band strip, row in
    band). Strip bands start one band above the diagonal's top tile."""
    r0 = lay.mr - 4 + k
    babs = r0 // lay.th
    return babs - (lay.mb - 1), r0 % lay.th


@functools.lru_cache(maxsize=None)
def _prop_tables(lay_key):
    """(nd, L) clipped tile indices + static i/j grids for the pregather."""
    nd, L, ntx, nty = lay_key
    d = np.arange(nd)[:, None]
    j0 = np.maximum(0, (d - (ntx - 1) + 1) >> 1)
    j = j0 + np.arange(L)[None, :]
    i = d - 2 * j
    ic = np.clip(i, 0, ntx - 1)
    jc = np.clip(j, 0, nty - 1)
    return ic, jc


def _pregather_props(lay, props_t):
    """props_t (NP, nty, ntx) -> (nd, NP, _lpad(lay)) int32."""
    ic, jc = _prop_tables((lay.nd, lay.L, lay.ntx, lay.nty))
    g = props_t[:, jc, ic]                       # (NP, nd, L)
    g = jnp.moveaxis(g, 0, 1).astype(jnp.int32)  # (nd, NP, L)
    return jnp.pad(g, ((0, 0), (0, 0), (0, _lpad(lay) - lay.L)))


def _run_wavefront_pl(lay, vis, props_t, step_tr, nscal=(), name="filt"):
    """Pallas twin of filters._run_wavefront. step_tr(A, pr, valid, i_arr,
    j_arr, scal) -> A with A (wh, ww, L) lane-major and pr a list of
    (1, L) int32 vectors. nscal: traced int32 scalars shipped via SMEM."""
    P = jnp.zeros((lay.HS, lay.W0), jnp.int32)
    P = P.at[lay.mr:lay.mr + lay.ph, lay.mc:lay.mc + lay.pw].set(vis)
    S = _skew(lay, P)
    WSp = -(-lay.WS // 128) * 128
    L, L2, th, wh, ww = lay.L, lay.L + 2, lay.th, lay.wh, lay.ww
    # the dynamic lane rotate needs x8 sublane extents: fetch whole strips
    # of L2p bands and give S3 enough trailing pad bands for the deepest
    # diagonal's overfetch
    L2p = -(-L2 // 8) * 8
    NBp = max(lay.NB, (lay.nty - 1) + (lay.mb - 1) + L2p)
    S3 = jnp.pad(S, ((0, (NBp * lay.th) - lay.HS),
                     (0, WSp - lay.WS))).reshape(NBp, lay.th, WSp)
    props = _pregather_props(lay, props_t)
    scal = jnp.zeros((8,), jnp.int32)
    for i, v in enumerate(nscal):
        scal = scal.at[i].set(v)
    scal = scal[None]
    cw = -(-(lay.strip_w + 127) // 128) * 128
    base0 = lay.mc - 4 + lay.shift * (lay.mb - 1)
    rks = [_boff_rk(lay, k) for k in range(wh)]

    def _addr(d):
        j0 = jnp.maximum(0, (d - (lay.ntx - 1) + 1) >> 1)
        jb = j0 + (lay.mb - 1)
        cstart = base0 + lay.tw * d
        ca = pl.multiple_of(
            jnp.minimum((cstart // 128) * 128, WSp - cw), 128)
        return j0, jb, ca, cstart - ca

    def _diag(d, j0, sh_, pv, sc, read, write):
        """Per-diagonal body shared by both kernel variants. pv is the
        (NP, _lpad) property block, sc the 8 SMEM scalars. read(r) ->
        the (L2p, cw) strip of window row r; write(r, back) accumulates
        the back-scattered deltas into that strip."""
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        j_arr = j0 + lanes
        i_arr = d - 2 * j_arr
        valid = (j_arr < lay.nty) & (i_arr >= 0)
        strips = [pltpu.roll(read(r), (-sh_) % cw, 1) for r in range(th)]
        rows = []
        for k in range(wh):
            boff, rk = rks[k]
            c0 = _band_delta(lay, k)
            rows.append(strips[rk][boff:boff + L, c0:c0 + ww].T)
        A = jnp.stack(rows, axis=0)              # (wh, ww, L)
        pr = [pv[i:i + 1, :L] for i in range(pv.shape[0])]
        A2 = step_tr(A, pr, valid, i_arr, j_arr, sc)
        delta = jnp.where(valid[None], A2 - A, 0)
        for r in range(th):
            dstrip = jnp.zeros((L2p, cw), jnp.int32)
            any_k = False
            for k in range(wh):
                boff, rk = rks[k]
                if rk != r:
                    continue
                any_k = True
                c0 = _band_delta(lay, k)
                prev = dstrip[boff:boff + L, c0:c0 + ww]
                mid_ = _put(dstrip[boff:boff + L], 1, c0,
                            prev + delta[k].T)
                dstrip = _put(dstrip, 0, boff, mid_)
            if not any_k:
                continue
            write(r, pltpu.roll(dstrip, sh_ % cw, 1))

    def kernel(scal_ref, props_ref, s3_in, out_ref):
        d = pl.program_id(0)

        @pl.when(d == 0)
        def _init():
            out_ref[...] = s3_in[...]

        j0, jb, ca, sh_ = _addr(d)

        def read(r):
            return out_ref[pl.ds(jb, L2p), r, pl.ds(ca, cw)]

        def write(r, back):
            cur = out_ref[pl.ds(jb, L2p), r, pl.ds(ca, cw)]
            out_ref[pl.ds(jb, L2p), r, pl.ds(ca, cw)] = cur + back

        _diag(d, j0, sh_, props_ref[0],
              [scal_ref[0, i] for i in range(8)], read, write)

    NP = props.shape[1]
    plane_bytes = NBp * th * WSp * 4
    # interpret mode (the CPU suite) takes the VMEM kernel unless the cap
    # is explicitly forced low — that is how tests cover the HBM branch
    hbm = plane_bytes > _vmem_cap() and (_vmem_cap_forced()
                                         or not _interpret())

    def _hbm_call(B):
        """The HBM-resident variant for batch width B (0 = unbatched).
        memory_space=ANY operands must stay whole-array with a trivial
        index_map (Mosaic constraint), so the built-in pallas vmap rule
        cannot block them — the lane axis is folded into the grid
        instead (wf_hbm's custom_vmap below)."""
        batched = B > 0

        def kernel_hbm(scal_ref, props_ref, s3_in, out_ref, scratch, sem):
            # Large planes: the skewed plane stays in HBM (it exceeds
            # VMEM at 720p+); each sequential grid step DMAs only the
            # diagonal's (L2p, th, cw) window into VMEM scratch and back.
            # out_ref IS the S3 buffer (input_output_aliases), so no init
            # step is needed.
            if batched:
                b, d = pl.program_id(0), pl.program_id(1)
            else:
                d = pl.program_id(0)
            j0, jb, ca, sh_ = _addr(d)
            if batched:
                win = out_ref.at[b, pl.ds(jb, L2p), :, pl.ds(ca, cw)]
                pv = props_ref[0, 0]
                sc = [scal_ref[0, 0, i] for i in range(8)]
            else:
                win = out_ref.at[pl.ds(jb, L2p), :, pl.ds(ca, cw)]
                pv = props_ref[0]
                sc = [scal_ref[0, i] for i in range(8)]
            cp = pltpu.make_async_copy(win, scratch, sem)
            cp.start()
            cp.wait()

            def read(r):
                return scratch[:, r, :]

            def write(r, back):
                scratch[:, r, :] = scratch[:, r, :] + back

            _diag(d, j0, sh_, pv, sc, read, write)
            cp = pltpu.make_async_copy(scratch, win, sem)
            cp.start()
            cp.wait()

        if batched:
            grid = (B, lay.nd)
            sspec = pl.BlockSpec((1, 1, 8), lambda b, d: (b, 0, 0),
                                 memory_space=pltpu.SMEM)
            pspec = pl.BlockSpec((1, 1, NP, _lpad(lay)),
                                 lambda b, d: (b, d, 0, 0),
                                 memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((B, NBp, th, WSp), jnp.int32)
        else:
            grid = (lay.nd,)
            sspec = pl.BlockSpec((1, 8), lambda d: (0, 0),
                                 memory_space=pltpu.SMEM)
            pspec = pl.BlockSpec((1, NP, _lpad(lay)), lambda d: (d, 0, 0),
                                 memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((NBp, th, WSp), jnp.int32)
        return pl.pallas_call(
            kernel_hbm,
            grid=grid,
            out_shape=oshape,
            in_specs=[sspec, pspec, pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.VMEM((L2p, th, cw), jnp.int32),
                            pltpu.SemaphoreType.DMA],
            input_output_aliases={2: 0},
            interpret=_interpret(),
            compiler_params=None if _interpret() else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * len(grid)))

    @jax.custom_batching.custom_vmap
    def wf_hbm(scal_a, props_a, S3_a):
        return _hbm_call(0)(scal_a, props_a, S3_a)

    @wf_hbm.def_vmap
    def _wf_hbm_rule(axis_size, in_batched, scal_b, props_b, S3_b):
        # the lockstep batcher vmaps the whole encode step; fold the lane
        # axis into the pallas grid (lanes run as sequential "arbitrary"
        # steps over disjoint out_ref slices, so aliasing stays safe)
        B = axis_size
        sb, pb, s3b = in_batched
        if not sb:
            scal_b = jnp.broadcast_to(scal_b[None], (B,) + scal_b.shape)
        if not pb:
            props_b = jnp.broadcast_to(props_b[None], (B,) + props_b.shape)
        if not s3b:
            S3_b = jnp.broadcast_to(S3_b[None], (B,) + S3_b.shape)
        return _hbm_call(B)(scal_b, props_b, S3_b), True

    if hbm:
        out = wf_hbm(scal, props, S3)
    else:
        full = pl.BlockSpec((NBp, th, WSp), lambda d: (0, 0, 0),
                            memory_space=pltpu.VMEM)
        scal_spec = pl.BlockSpec((1, 8), lambda d: (0, 0),
                                 memory_space=pltpu.SMEM)
        props_spec = pl.BlockSpec((1, NP, _lpad(lay)), lambda d: (d, 0, 0),
                                  memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel, in_specs=[scal_spec, props_spec, full],
            out_specs=full,
            grid=(lay.nd,),
            out_shape=jax.ShapeDtypeStruct((NBp, th, WSp), jnp.int32),
            interpret=_interpret(),
            compiler_params=None if _interpret() else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)))(scal, props, S3)
    S = out.reshape(NBp * th, WSp)[:lay.HS, :lay.WS]
    P = _unskew(lay, S)
    return P[lay.mr:lay.mr + lay.ph, lay.mc:lay.mc + lay.pw]


# ---------------------------------------------------------------------------
# the three filters (ref: bmc.c:390-457, :459-602, :604-659)
# ---------------------------------------------------------------------------

def intra_filter_graph(pw, ph, nbh, nbv, vis_u8, bd_grid, fq, fthresh):
    """Pallas intra dering filter; twin of filters.intra_filter_graph."""
    ntx, nty, fx, fy = _tile_maps(pw, ph, nbh, nbv)
    if ntx <= 0 or nty <= 0:
        return vis_u8
    lay = _layout(pw, ph, 4, 4, ntx, nty)
    flags_t = bd_grid.astype(jnp.int32)[fy[:, None], fx[None, :]]
    props_t = flags_t[None]

    def step(A, pr, valid, i_arr, j_arr, sc):
        fq_, fth = sc[0], sc[1]
        flags = pr[0]
        m0 = valid & ((flags & F_RINGING) == 0)
        sh, sv, slh, slv = _tile_energy_t(A, 4, 4)
        mx = jnp.maximum(sh, sv)
        me = m0 & (mx < 256) & (mx > 8)
        ms = (flags & (F_MAINTAIN | F_STABLE)) != 0
        ttd = _dsfactor_t(A, 4, 4)
        ttd = jnp.where((flags & F_STABLE) != 0, (ttd * 5) >> 2, ttd)
        tt = jnp.where(ms, ttd, 8)
        tt = jint.divt(tt * 2, 3)
        tt = jnp.clip((tt * fq_) >> 12, 0, fth)
        tt1 = jnp.where(me, tt, 0)
        mh = i_arr >= 1
        mv_ = j_arr >= 1
        ieh = (i_arr * 4) < (pw - 8)
        iev = (j_arr * 4) < (ph - 8)
        no_e = jnp.zeros_like(me)
        A = _hfilt_t(A, 4, 4, no_e, tt1, tt1, me & mh, ieh)
        A = _vfilt_t(A, 4, 4, no_e, tt1, tt1, me & mv_, iev)
        tt2 = jnp.where(sh > sv, 3 * sh + sv, 3 * sv + sh)
        tt2 = _curve_tex(tt2)
        tt2 = 16 + ((tt2 + 2) >> 2)
        tt2 = jnp.clip((tt2 * fq_) >> 12, 0, fth)
        tt2 = jnp.where(me, tt2, 0)
        A = _hfilt_t(A, 4, 4, no_e, tt2, tt2, me & mh, ieh)
        A = _vfilt_t(A, 4, 4, no_e, tt2, tt2, me & mv_, iev)
        return A

    out = _run_wavefront_pl(lay, vis_u8.astype(jnp.int32), props_t, step,
                            nscal=(fq, fthresh), name="intra")
    return out.astype(jnp.uint8)


def luma_filter_graph(pw, ph, nbh, nbv, blk_w, blk_h, inter_sharpen,
                      vis_u8, mvx, mvy, flags, submask,
                      fq, fthresh, do_filter, tmc):
    """Pallas inter luma filter; twin of filters.luma_filter_graph."""
    ntx, nty, fx, fy = _tile_maps(pw, ph, nbh, nbv)
    if ntx <= 0 or nty <= 0:
        return vis_u8
    lay = _layout(pw, ph, 4, 4, ntx, nty)
    ndx_g, ndy_g = _neighbordif2_grids(mvx, mvy, flags)
    bprops = jnp.stack([mvx, mvy, flags, submask, ndx_g, ndy_g])
    props_bt = bprops[:, fy[:, None], fx[None, :]]
    edgeh = ((np.arange(ntx) * 4) % blk_w) == 0
    edgev = ((np.arange(nty) * 4) % blk_h) == 0
    edgehs = ((np.arange(ntx) * 4) % (blk_w // 2)) == 0
    edgevs = ((np.arange(nty) * 4) % (blk_h // 2)) == 0
    st = [np.broadcast_to(a[None, :] if ax else a[:, None], (nty, ntx))
          for a, ax in ((edgeh, 1), (edgev, 0), (edgehs, 1), (edgevs, 0))]
    props_t = jnp.concatenate(
        [props_bt, jnp.asarray(np.stack(st).astype(np.int32))], axis=0)

    def step(A, pr, valid, i_arr, j_arr, sc):
        fq_, fth, dof_s, tmc_s = sc[0], sc[1], sc[2], sc[3]
        thH = jnp.clip((64 * fq_) >> 12, 2, 32)
        thL = jnp.clip((32 * fq_) >> 12, 2, 32)
        sharpen = (jnp.int32(inter_sharpen) * tmc_s) != 0
        dof = dof_s != 0
        bmvx, bmvy, fl, sub, ndx, ndy = (pr[0], pr[1], pr[2], pr[3],
                                         pr[4], pr[5])
        eh, ev, ehs, evs = (pr[6] != 0, pr[7] != 0, pr[8] != 0, pr[9] != 0)
        skip = ((fl >> K.MV_BIT_SKIP) & 1) != 0
        intra = ((fl >> K.MV_BIT_INTRA) & 1) != 0
        eprm = ((fl >> K.MV_BIT_EPRM) & 1) != 0
        amx = jnp.abs(bmvx)
        amy = jnp.abs(bmvy)
        mbase = valid & ~skip
        mh = i_arr >= 1
        mv_ = j_arr >= 1
        ieh = (i_arr * 4) < (pw - 8)
        iev = (j_arr * 4) < (ph - 8)
        subne = sub != K.MASK_ALL_INTRA
        teh = eh | (subne & ehs)
        tev = ev | (subne & evs)
        mi = mbase & intra
        thHv = jnp.where(mi, thH, 0)
        thLv = jnp.where(mi, thL, 0)
        A = _hfilt_t(A, 4, 4, teh, thHv, thLv, mi & mh, ieh)
        A = _vfilt_t(A, 4, 4, tev, thHv, thLv, mi & mv_, iev)
        mdf = mbase & ~intra & dof & ((ndx != 0) | (ndy != 0))
        sh, sv, slh, slv = _tile_energy_t(A, 4, 4)
        tndc = (ndx + ndy + 1) >> 1
        cdir = (sh < 2 * sv) & (sv < 2 * sh)
        ndx_e = jnp.where(cdir & (ndx < amx), ndx >> 1, ndx)
        ndy_e = jnp.where(cdir & (ndy < amy), ndy >> 1, ndy)
        shl = jnp.where(slh > 128, 0, 128 - slh)
        svl = jnp.where(slv > 128, 0, 128 - slv)
        ix = jnp.minimum(amx, 32)
        iy = jnp.minimum(amy, 32)
        ttA = ((sh * (32 - iy) + shl * iy) + 16) >> 5
        ttA = ttA + (((sv * (32 - ix) + svl * ix) + 16) >> 5)
        ttA = (ttA + 1) >> 1
        ttA = jnp.where((ndx_e < amy) & (ndy_e < amx), 0, ttA)
        tt = jnp.where(cdir, ttA, (sh + sv + 1) >> 1)
        tt = (tt * tndc + 4) >> 3
        tt = (jnp.minimum(tt, fth) * fq_) >> 12
        addx = (jnp.minimum(ndy_e, fth) * fq_) >> 12
        addy = (jnp.minimum(ndx_e, fth) * fq_) >> 12
        bv = (sh > 2 * sv) | (amy > 2 * amx)
        bh_ = ((sv > 2 * sh) | (amx > 2 * amy)) & ~bv
        mboth = ~bv & ~bh_
        teh2 = eh | eprm
        tev2 = ev | eprm
        A = _hfilt_t(A, 4, 4, teh2, tt + addx, tt,
                     mdf & (bh_ | mboth) & mh, ieh)
        A = _vfilt_t(A, 4, 4, tev2, tt + addy, tt,
                     mdf & (bv | mboth) & mv_, iev)
        qdiag = (((bmvx & 3) != 0) & ((bmvy & 3) != 0)
                 & (((bmvx | bmvy) & 1) != 0))
        msh = (mbase & ~intra & sharpen & qdiag
               & (amx < 8) & (amy < 8))
        A = _degrad_t(A, 4, 4, msh)
        return A

    out = _run_wavefront_pl(lay, vis_u8.astype(jnp.int32), props_t, step,
                            nscal=(fq, fthresh, do_filter, tmc),
                            name="luma")
    return out.astype(jnp.uint8)


def chroma_filter_graph(pw, ph, nbh, nbv, bw, bh, vis_u8,
                        mvx, mvy, flags, q):
    """Pallas inter chroma filter; twin of filters.chroma_filter_graph."""
    if nbh <= 0 or nbv <= 0 or pw < 8 or ph < 8:
        return vis_u8
    lay = _layout(pw, ph, bw, bh, nbh, nbv)
    ndx_g, ndy_g = _neighbordif2_grids(mvx, mvy, flags)
    props_t = jnp.stack([mvx, mvy, flags, ndx_g, ndy_g])

    def step(A, pr, valid, i_arr, j_arr, sc):
        q_ = sc[0]
        ith = jnp.clip((64 * q_) >> 12, 2, 32)
        bmvx, bmvy, fl, ndx, ndy = pr[0], pr[1], pr[2], pr[3], pr[4]
        skip = ((fl >> K.MV_BIT_SKIP) & 1) != 0
        intra = ((fl >> K.MV_BIT_INTRA) & 1) != 0
        mbase = valid & ~skip
        amx = jnp.abs(bmvx)
        amy = jnp.abs(bmvy)
        cz = (ndx < amy) & (ndy < amx)
        tx = jnp.where(cz, 0, (jnp.minimum(ndy, 64) * q_) >> 12)
        ty = jnp.where(cz, 0, (jnp.minimum(ndx, 64) * q_) >> 12)
        tx = jnp.where(intra, ith, tx)
        ty = jnp.where(intra, ith, ty)
        x0 = i_arr * bw
        y0 = j_arr * bh
        no_e = jnp.zeros_like(mbase)
        ieh = x0 < (pw - 8)
        iev = y0 < (ph - 8)
        ghx = mbase & (x0 >= 4) & (x0 <= pw - 4)
        gvy = mbase & (y0 >= 4) & (y0 <= ph - 4)
        for z in range(0, bh, 4):
            mz = ghx & (y0 + z + 4 < ph)
            A = _hfilt_t(A, 4 + z, 4, no_e, tx, tx, mz, ieh)
        for z in range(0, bw, 4):
            mz = gvy & (x0 + z + 4 < pw)
            A = _vfilt_t(A, 4, 4 + z, no_e, ty, ty, mz, iev)
        return A

    out = _run_wavefront_pl(lay, vis_u8.astype(jnp.int32), props_t, step,
                            nscal=(q,), name="chroma")
    return out.astype(jnp.uint8)
