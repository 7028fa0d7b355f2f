"""Pallas TPU wave-HME: the pyramid motion search with the per-diagonal
wavefront as Pallas grid steps.

The XLA wavefront (ops/hme_wave) pays this TPU's ~0.8-2.5 ms scalar-sync
floor per fori/while iteration — ~150 ms/frame for a CIF search. Here each
anti-diagonal is one grid step of a Pallas kernel (sequential "arbitrary"
grid), so the whole pyramid costs per-step microseconds instead:

- per-block compute is SHARED with ops/hme_wave via its backend hooks
  (same jnp code traced into the kernel), with lazy=True so good-enough /
  skip / subpel guards become real branches (lax.cond) per block;
- plane windows: aligned overfetch from VMEM + dynamic rotate (Mosaic
  requires tile-aligned dynamic loads; rolls realign);
- the wavefront carry (fx/fy/fskip of the previous two diagonals — the
  only same-level state any block reads: left/top/topleft) lives in an
  SMEM ring indexed by diagonal mod 3;
- parent / temporal candidate grids are pre-gathered per diagonal in XLA
  with static index maps and shipped as per-step SMEM blocks;
- per-diagonal results are written to SMEM row blocks and unskewed back
  to (nbv, nbh) grids in XLA.

Byte-identical to ops/hme_wave and ops/hme_search (the host oracle).
(ref: src/hme.c:1373-1630 refine_level, :2001-2016 dsv_hme)
"""
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.frame import B
from . import hme_wave as hw

NCOL = 64          # candidate-pack columns (see _pregather layout)
NF0 = 12           # level-0 output fields
NFU = 2            # upper-level output fields


def _geom(cfg, level):
    step = 1 << level
    ca = (cfg.nbh + step - 1) // step
    cb = (cfg.nbv + step - 1) // step
    nd = ca + cb - 1
    lmax = min(ca, cb)
    lpad = max(((lmax + 7) // 8) * 8, 8)
    return step, ca, cb, nd, lmax, lpad


def _pad_plane(p):
    """Pad a bordered plane so Pallas overfetch windows stay in-bounds and
    tile-aligned (rows to x32/>=64, cols to x128/>=256). Padding is never
    part of a valid window (invalid probes are masked exactly like the
    XLA path's clamped dynamic_slice reads)."""
    h, w = p.shape
    hp = max(-(-h // 32) * 32, 64)
    wp = max(-(-w // 128) * 128, 256)
    if (hp, wp) != (h, w):
        p = jnp.pad(p, ((0, hp - h), (0, wp - w)))
    return p


_ROLL_NARROW = os.environ.get("DSV2_PL_ROLL8", "1") != "0"


def roll_rows_u8(big, dy):
    """out[i] = big[(i + dy) % oh] for a uint8 (oh, ow) array, oh % 4 == 0.

    Mosaic's tpu.dynamic_rotate only lowers for 32-bit element types
    ("Rotate with non-32-bit data" otherwise), so the row rotate runs on
    the i32-packed view: pltpu.bitcast packs 4 consecutive SUBLANES into
    one u32 (row 4m+b at bits 8b), a u32 rotate moves whole 4-row groups,
    and a funnel shift between rotation q and q+1 realigns the residual
    r = dy % 4 bytes. 8 vregs of rotate for a (64, 256) window vs 32
    widened."""
    n32 = big.shape[0] // 4
    y = pltpu.bitcast(big, jnp.uint32)
    q = dy // 4
    r = dy % 4
    a = pltpu.roll(y, (-q) % n32, 0)
    b = pltpu.roll(y, (-(q + 1)) % n32, 0)
    sh1 = (8 * r).astype(jnp.uint32)
    sh2 = ((32 - 8 * r) % 32).astype(jnp.uint32)
    comb = (a >> sh1) | (b << sh2)
    return pltpu.bitcast(jnp.where(r == 0, a, comb), jnp.uint8)


def _reader(plane, x, y, h, w):
    """window() hook: unaligned (h, w) window of a bordered VMEM plane via
    aligned overfetch + dynamic rotate. Clamps like dynamic_slice (only
    invalid, masked probes ever hit the clamp).

    The ROW rotate runs at the plane's narrow dtype through the
    i32-bitcast funnel (roll_rows_u8) — Mosaic has no narrow dynamic
    rotate — then the h live rows are sliced and widened and the LANE
    rotate runs on the small (h, ow) i32 slice (4 vregs for a 16-row
    window vs 32 for the full (64, 256) overfetch). The window read is
    the kernel's single hottest op (every candidate metric, refine probe
    and subpel grid starts with one). DSV2_PL_ROLL8=0 restores
    widen-first for both dims."""
    hp, wp = plane.shape
    narrow = plane.dtype == jnp.uint8 and _ROLL_NARROW
    sub = 32 if plane.dtype == jnp.uint8 else 8
    oh = -(-(h + sub - 1) // sub) * sub
    ow = -(-(w + 127) // 128) * 128
    yy = jnp.clip(y + B, 0, hp - h)
    xx = jnp.clip(x + B, 0, wp - w)
    ya = pl.multiple_of(jnp.minimum((yy // sub) * sub, hp - oh), sub)
    xa = pl.multiple_of(jnp.minimum((xx // 128) * 128, wp - ow), 128)
    big = plane[pl.ds(ya, oh), pl.ds(xa, ow)]
    if narrow:
        big = roll_rows_u8(big, yy - ya)
        big = big[:h].astype(jnp.int32)
        big = pltpu.roll(big, (-(xx - xa)) % ow, 1)
        return big[:, :w]
    big = big.astype(jnp.int32)
    big = pltpu.roll(big, (-(yy - ya)) % oh, 0)
    big = pltpu.roll(big, (-(xx - xa)) % ow, 1)
    return big[:h, :w]


def _roll(a, shift, axis):
    return pltpu.roll(a, shift % a.shape[axis], axis)


@functools.lru_cache(maxsize=None)
def _diag_tables(cfg, level):
    """Static per-(d, k) block coordinates + candidate gather indices."""
    step, ca, cb, nd, lmax, lpad = _geom(cfg, level)
    d = np.arange(nd)[:, None]
    k = np.arange(lpad)[None, :]
    a = np.maximum(0, d - (cb - 1)) + k
    b = d - a
    ok = (a < ca) & (b >= 0) & (b < cb)
    i = a * step
    j = b * step
    return a, b, ok, i, j


@functools.lru_cache(maxsize=None)
def _pregather_tables(cfg, level):
    """Static gather indices/masks for the parent & temporal candidates of
    every (d, k) block (ref: hme.c:1443-1528 candidate sites)."""
    step = 1 << level
    _, _, _, i, j = _diag_tables(cfg, level)
    pmask = ~((step << 1) - 1)
    pi = i & pmask
    pj = j & pmask
    pidx, pok, tidx, tok = [], [], [], []
    for n in range(9):
        ptx = pi + int(hw._PTS[n, 0]) * step
        pty = pj + int(hw._PTS[n, 1]) * step
        ok = ((ptx >= 0) & (ptx < cfg.nbh) & (pty >= 0) & (pty < cfg.nbv))
        pidx.append(np.clip(pty, 0, cfg.nbv - 1) * cfg.nbh
                    + np.clip(ptx, 0, cfg.nbh - 1))
        pok.append(ok)
        tx = i + int(hw.RECT[n][0]) * step
        ty = j + int(hw.RECT[n][1]) * step
        okt = (tx >= 0) & (tx < cfg.nbh) & (ty >= 0) & (ty < cfg.nbv)
        tidx.append(np.clip(ty, 0, cfg.nbv - 1) * cfg.nbh
                    + np.clip(tx, 0, cfg.nbh - 1))
        tok.append(okt)
    cidx = np.clip(j, 0, cfg.nbv - 1) * cfg.nbh + np.clip(i, 0, cfg.nbh - 1)
    return (np.stack(pidx, -1), np.stack(pok, -1),
            np.stack(tidx, -1), np.stack(tok, -1), cidx)


def _pregather(cfg, level, parent_x, parent_y, tmv_x, tmv_y):
    """(nd, lpad, NCOL) int32 candidate pack per diagonal slot.
    Columns: 0-8 pxv, 9-17 pyv, 18-26 pok, 27-35 tvx, 36-44 tvy,
    45-53 tok, 54-55 tmv at the block (i, j). Values match gather_ctx:
    masked reads are zeroed, clipped indices elsewhere."""
    step, ca, cb, nd, lmax, lpad = _geom(cfg, level)
    pidx, pok, tidx, tok, cidx = _pregather_tables(cfg, level)
    pxf = parent_x.reshape(-1)
    pyf = parent_y.reshape(-1)
    txf = tmv_x.reshape(-1)
    tyf = tmv_y.reshape(-1)
    pokj = jnp.asarray(pok)
    tokj = jnp.asarray(tok)
    cols = [jnp.where(pokj, jnp.take(pxf, pidx), 0),
            jnp.where(pokj, jnp.take(pyf, pidx), 0),
            pokj.astype(jnp.int32),
            jnp.where(tokj, jnp.take(txf, tidx), 0),
            jnp.where(tokj, jnp.take(tyf, tidx), 0),
            tokj.astype(jnp.int32),
            jnp.take(txf, cidx)[..., None],
            jnp.take(tyf, cidx)[..., None]]
    pack = jnp.concatenate(cols, axis=-1).astype(jnp.int32)
    pad = NCOL - pack.shape[-1]
    return jnp.pad(pack, ((0, 0), (0, 0), (0, pad)))


def _kernel_ctx(cfg, level, cand_ref, ring_ref, d, k, a, b):
    """gather_ctx equivalent inside the kernel: parent/temporal slots from
    the pre-gathered SMEM pack, left/top/topleft same-level values from
    the SMEM carry ring (rows d-1 / d-2 mod 3)."""
    step, ca, cb, nd, lmax, lpad = _geom(cfg, level)
    r1 = (d - 1) % 3
    r2 = (d - 2) % 3
    a0m1 = jnp.maximum(0, (d - 1) - (cb - 1))
    a0m2 = jnp.maximum(0, (d - 2) - (cb - 1))
    kl = a - 1 - a0m1
    kt = a - a0m1
    kc = a - 1 - a0m2
    okl = a - 1 >= 0
    okt = b - 1 >= 0
    okc = (a - 1 >= 0) & (b - 1 >= 0)

    def rr(f, row, slot, ok):
        s = jnp.clip(slot, 0, lpad - 1)
        return jnp.where(ok, ring_ref[f, row, s], 0)

    lx = rr(0, r1, kl, okl)
    ly = rr(1, r1, kl, okl)
    tx = rr(0, r1, kt, okt)
    ty = rr(1, r1, kt, okt)
    cx = rr(0, r2, kc, okc)
    cy = rr(1, r2, kc, okc)
    g = {"spat": ((lx, ly, okl), (tx, ty, okt), (cx, cy, okc))}
    if level == 0:
        # movec_pred over the same left/top/topleft (step == 1)
        g["pred"] = (hw.pred3(lx, tx, cx), hw.pred3(ly, ty, cy))
        lsk = rr(2, r1, kl, okl)
        tsk = rr(2, r1, kt, okt)
        g["nbr"] = ((lx, ly, lsk, okl), (tx, ty, tsk, okt))
    else:
        # the full-grid (i-1, j) reads of movec_pred hit positions this
        # level never writes -> fields are 0 there -> pred3(0,0,0) == 0
        g["pred"] = (jnp.int32(0), jnp.int32(0))
    if level < cfg.pyramid_levels:
        g["par"] = tuple((cand_ref[0, k, n], cand_ref[0, k, 9 + n],
                          cand_ref[0, k, 18 + n] != 0) for n in range(9))
    if cfg.has_tmv:
        g["tmv"] = tuple((cand_ref[0, k, 27 + n], cand_ref[0, k, 36 + n],
                          cand_ref[0, k, 45 + n] != 0) for n in range(9))
        g["tmv_c"] = (cand_ref[0, k, 54], cand_ref[0, k, 55])
    return g


def _interpret():
    return jax.default_backend() == "cpu"


@functools.lru_cache(maxsize=None)
def _level_call(cfg, level, shapes):
    """pallas_call for one upper pyramid level. shapes: padded plane dims
    + dtypes, keyed for the cache. Returns fn(cand, scal, src, ref, ogr)
    -> (nd, NFU, lpad) rows."""
    step, ca, cb, nd, lmax, lpad = _geom(cfg, level)

    def kernel(cand_ref, scal_ref, src_ref, ref_ref, ogr_ref,
               out_ref, ring_ref):
        d = pl.program_id(0)
        gx = scal_ref[0, 0]
        gy = scal_ref[0, 1]
        quant = scal_ref[0, 2]
        with hw.backend_hooks(_reader, _roll, True):
            def body(k, _):
                a = jnp.maximum(0, d - (cb - 1)) + k
                b = d - a
                lane_ok = (a < ca) & (b >= 0) & (b < cb)
                i = a * step
                j = b * step

                def blk():
                    g = _kernel_ctx(cfg, level, cand_ref, ring_ref,
                                    d, k, a, b)
                    r = hw._block_search(cfg, level, g, src_ref, ref_ref,
                                         ogr_ref, gx, gy, quant, i, j,
                                         lane_ok)
                    v = r["valid"]
                    return (jnp.where(v, r["dx"] * step, 0),
                            jnp.where(v, r["dy"] * step, 0))

                ox, oy = hw.guard(lane_ok, blk, (jnp.int32(0), jnp.int32(0)))
                ring_ref[0, d % 3, k] = ox
                ring_ref[1, d % 3, k] = oy
                out_ref[0, 0, k] = ox
                out_ref[0, 1, k] = oy
                return 0

            jax.lax.fori_loop(0, lmax, body, 0)

    def call(cand, scal, src, ref, ogr):
        return pl.pallas_call(
            kernel, grid=(nd,),
            out_shape=jax.ShapeDtypeStruct((nd, NFU, lpad), jnp.int32),
            in_specs=[
                pl.BlockSpec((1, lpad, NCOL), lambda d: (d, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8), lambda d: (0, 0),
                             memory_space=pltpu.SMEM),
            ] + [pl.BlockSpec(s[0], lambda d: (0, 0),
                              memory_space=pltpu.VMEM)
                 for s in shapes],
            out_specs=pl.BlockSpec((1, NFU, lpad), lambda d: (d, 0, 0),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((3, 3, lpad), jnp.int32)],
            interpret=_interpret(),
            compiler_params=None if _interpret() else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(cand, scal, src, ref, ogr)

    return call


@functools.lru_cache(maxsize=None)
def _level0_call(cfg, shapes):
    """pallas_call for the base level: search + subpel + mode decisions +
    intra tests (the full level0_block), one diagonal per grid step."""
    step, ca, cb, nd, lmax, lpad = _geom(cfg, 0)

    def kernel(cand_ref, scal_ref, src_ref, ref_ref, ogr_ref,
               srcu_ref, srcv_ref, refu_ref, refv_ref, out_ref, ring_ref):
        d = pl.program_id(0)
        gx = scal_ref[0, 0]
        gy = scal_ref[0, 1]
        quant = scal_ref[0, 2]
        skip_thresh = scal_ref[0, 3]
        with hw.backend_hooks(_reader, _roll, True):
            def body(k, _):
                a = jnp.maximum(0, d - (cb - 1)) + k
                b = d - a
                lane_ok = (a < ca) & (b >= 0) & (b < cb)

                def blk():
                    g = _kernel_ctx(cfg, 0, cand_ref, ring_ref, d, k, a, b)
                    outs = hw.level0_block(
                        cfg, g, src_ref, ref_ref, ogr_ref, srcu_ref,
                        srcv_ref, refu_ref, refv_ref, gx, gy, quant,
                        skip_thresh, a, b, lane_ok)
                    (mvx, mvy, flags, err, dc, submask, skipf, v,
                     terr, ndiff, nelig, nintra) = outs
                    vi = v.astype(jnp.int32)
                    return (mvx * vi, mvy * vi, flags * vi, err * vi,
                            dc * vi, submask * vi,
                            skipf.astype(jnp.int32) * vi, vi,
                            terr, ndiff, nelig, nintra)

                z = jnp.int32(0)
                outs = hw.guard(lane_ok, blk, (z,) * 12)
                ring_ref[0, d % 3, k] = outs[0]
                ring_ref[1, d % 3, k] = outs[1]
                ring_ref[2, d % 3, k] = outs[6]
                for f in range(12):
                    out_ref[0, f, k] = outs[f]
                return 0

            jax.lax.fori_loop(0, lmax, body, 0)

    def call(cand, scal, src, ref, ogr, src_u, src_v, ref_u, ref_v):
        return pl.pallas_call(
            kernel, grid=(nd,),
            out_shape=jax.ShapeDtypeStruct((nd, NF0, lpad), jnp.int32),
            in_specs=[
                pl.BlockSpec((1, lpad, NCOL), lambda d: (d, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8), lambda d: (0, 0),
                             memory_space=pltpu.SMEM),
            ] + [pl.BlockSpec(s[0], lambda d: (0, 0),
                              memory_space=pltpu.VMEM)
                 for s in shapes],
            out_specs=pl.BlockSpec((1, NF0, lpad), lambda d: (d, 0, 0),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((3, 3, lpad), jnp.int32)],
            interpret=_interpret(),
            compiler_params=None if _interpret() else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(cand, scal, src, ref, ogr, src_u, src_v, ref_u, ref_v)

    return call


@functools.lru_cache(maxsize=None)
def _valid_mask(cfg, level):
    """(nd, lpad) bool: slots the kernel's k-loop actually writes. The
    kernel only loops k < lmax and guards by lane_ok, so slots beyond the
    diagonal's run hold garbage SMEM — mask them before any sum/unskew
    (the unskew zero slot (0, lpad-1) is one of them). NUMPY on purpose:
    a cached jnp constant created while tracing one jit program is that
    trace's tracer, and reusing it from a second program (pallas then
    gang in one process) is a tracer leak."""
    _, _, ok, _, _ = _diag_tables(cfg, level)
    return np.ascontiguousarray(ok)


def _masked_rows(cfg, level, rows):
    return jnp.where(_valid_mask(cfg, level)[:, None, :], rows, 0)


@functools.lru_cache(maxsize=None)
def _unskew_idx(cfg, level):
    """(nbv, nbh) flat indices into (nd*lpad) skewed rows; positions the
    level never writes map to a guaranteed-zero slot (d=0, k=lpad-1)."""
    step, ca, cb, nd, lmax, lpad = _geom(cfg, level)
    idx = np.full((cfg.nbv, cfg.nbh), lpad - 1, np.int32)
    for bb in range(cb):
        for aa in range(ca):
            d = aa + bb
            k = aa - max(0, d - (cb - 1))
            idx[bb * step, aa * step] = d * lpad + k
    return idx  # numpy: see _valid_mask on cached-constant tracer leaks


def _unskew(cfg, level, rows, f):
    return jnp.take(rows[:, f, :].reshape(-1), _unskew_idx(cfg, level))


@functools.lru_cache(maxsize=None)
def make_motion_est(cfg):
    """Pallas twin of hme_wave.make_motion_est: same inputs, same output
    dict, byte-identical fields (ref: hme.c:2001-2016)."""
    npl = cfg.pyramid_levels

    def f(src_planes, ref_planes, ogr_planes, src_u, src_v, ref_u, ref_v,
          tmv_x, tmv_y, quant, skip_thresh):
        tmv_x = jnp.asarray(tmv_x, jnp.int32)
        tmv_y = jnp.asarray(tmv_y, jnp.int32)
        quant = jnp.asarray(quant, jnp.int32)
        skip_thresh = jnp.asarray(skip_thresh, jnp.int32)
        srcs = [_pad_plane(jnp.asarray(p)) for p in src_planes]
        refs = [_pad_plane(jnp.asarray(p)) for p in ref_planes]
        ogrs = [_pad_plane(jnp.asarray(p)) for p in ogr_planes]
        chroma = [_pad_plane(jnp.asarray(p))
                  for p in (src_u, src_v, ref_u, ref_v)]
        gx = jnp.int32(0)
        gy = jnp.int32(0)
        parent_x = jnp.zeros((cfg.nbv, cfg.nbh), jnp.int32)
        parent_y = jnp.zeros((cfg.nbv, cfg.nbh), jnp.int32)
        for level in range(npl, 0, -1):
            cand = _pregather(cfg, level, parent_x, parent_y, tmv_x, tmv_y)
            scal = jnp.stack([gx, gy, quant, skip_thresh,
                              gx, gx, gx, gx]).astype(jnp.int32)[None]
            planes = (srcs[level], refs[level], ogrs[level])
            shapes = tuple((p.shape, str(p.dtype)) for p in planes)
            rows = _masked_rows(cfg, level, _level_call(cfg, level, shapes)(
                cand, scal, *planes))
            fx = _unskew(cfg, level, rows, 0)
            fy = _unskew(cfg, level, rows, 1)
            gx, gy = hw.global_motion_graph(cfg, level, fx, fy)
            parent_x, parent_y = fx, fy
        cand = _pregather(cfg, 0, parent_x, parent_y, tmv_x, tmv_y)
        scal = jnp.stack([gx, gy, quant, skip_thresh,
                          gx, gx, gx, gx]).astype(jnp.int32)[None]
        planes = (srcs[0], refs[0], ogrs[0]) + tuple(chroma)
        shapes = tuple((p.shape, str(p.dtype)) for p in planes)
        rows = _masked_rows(cfg, 0, _level0_call(cfg, shapes)(
            cand, scal, *planes))
        st = dict(
            fx=_unskew(cfg, 0, rows, 0),
            fy=_unskew(cfg, 0, rows, 1),
            flags=_unskew(cfg, 0, rows, 2),
            err=_unskew(cfg, 0, rows, 3),
            dc=_unskew(cfg, 0, rows, 4),
            submask=_unskew(cfg, 0, rows, 5),
            fskip=_unskew(cfg, 0, rows, 6).astype(jnp.uint8),
            terr=rows[:, 8, :].sum(),
            ndiff=rows[:, 9, :].sum(),
            nelig=rows[:, 10, :].sum(),
            nintra=rows[:, 11, :].sum(),
        )
        return st

    return jax.jit(f)


def motion_est(enc, d):
    """Drop-in motion_est using the Pallas kernels (lockstep-batchable)."""
    cfg, inputs = hw.prepare_motion_est(enc, d)
    submit = getattr(enc, "dev_submit", None)
    if submit is not None:
        st = submit(("hme_pl", cfg), make_motion_est, inputs, fetch=True)
    else:
        st = make_motion_est(cfg)(*inputs)
    hw.apply_motion_est(enc, d, st)
