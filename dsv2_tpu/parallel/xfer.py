"""Device->host coefficient transfer.

Two formats, selected by DSV2_XFER (default "dense"):

- "dense": quantized coefficients ship dense, split by band: the LL band
  (scan segment 0, NEG-coded, holds the wide values) as int32, every HF
  band as int8 — ~1 byte per coefficient on the wire, zero packing work
  on device (astype + concat; no scatter/sort). Measured on the axon
  tunnel (tools/microbench_tpu.py) d2h runs ~40-175 MB/s, and the
  on-device sparse packing below dominated the device profile (~12
  ms/frame of scatter/sort programs). The native entropy coder walks the
  split-band arrays directly (dsvn_scan_enc_d8). A per-plane overflow
  flag guards HF values outside int8 (low-qp / lossless content) with an
  int32 fallback fetch.

- "packed": coefficients are packed ON DEVICE into compact byte segments
  (8-bit truncated values + position deltas + exception records),
  scattered into one flat buffer, fetched with a bucketed-length
  transfer, and expanded by the native runtime. Kept for slow-link
  deployments where bytes-on-the-wire dominate.

- "blob": the device builds the FINAL entropy-coded scan blob
  (ops/scan_pl) and ships only that — entropy-coded size on the wire
  (~6x under dense on typical content) and the host serializer becomes
  a memcpy. Default on accelerators; per-plane fallback to the dense
  int32 fetch + native scan when the blob flags out of contract.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

MODE = os.environ.get("DSV2_XFER", "")


def mode():
    """The effective transfer format: explicit DSV2_XFER/set_mode wins;
    otherwise blob on accelerators, dense on CPU (the blob scan kernel
    pays off where the link is the bottleneck)."""
    if MODE:
        return MODE
    return "blob" if jax.default_backend() != "cpu" else "dense"

EXC = 4096  # per-segment exception-record capacity (beyond -> fallback)
_FETCH_BUCKET = 1 << 17  # 128 KiB length buckets keep the slice jit-cached


def set_mode(mode):
    """Switch the transfer format; drops the jitted step caches that
    baked the previous mode in."""
    global MODE
    if mode not in ("dense", "packed", "blob"):
        raise ValueError(mode)
    if mode != MODE:
        MODE = mode
        from ..codec import devsteps
        devsteps.make_p_encode_step.cache_clear()
        devsteps.make_i_encode_step.cache_clear()
        from . import batch, dynbatch
        batch._device_batch_fn.cache_clear()
        dynbatch._fn_cache.clear()


def dense_out(v, ll_n):
    """Dense split-band transfer outputs for one plane's scan array
    (total,) int32 whose first ll_n entries are the LL band:
    (ll int32, rest8 int8, nnz, ovf) — nnz sizes the native output
    buffer; ovf (an HF value outside int8) selects the int32 fallback."""
    ll = v[:ll_n]
    rest = v[ll_n:]
    r8 = rest.astype(jnp.int8)
    nnz = (v != 0).sum(dtype=jnp.int32)
    ovf = jnp.any(rest != r8.astype(jnp.int32))
    return ll, r8, nnz, ovf


def seg_cap(total):
    """Static byte capacity of one packed segment."""
    return 8 + 2 * total + 16 * EXC + 8


def pack_segment(v):
    """Pack a dense scan array (total,) int32 into the byte-segment layout
    dsvn_unpack_scan expects. Returns (row uint8[cap], used_aligned int32,
    fallback bool, vals_c, pos_c, nnz) — the 32-bit compacted arrays back
    the rare fallback path (> EXC exception records)."""
    total = v.shape[0]
    cap = seg_cap(total)
    i32 = jnp.int32
    idxs = jnp.arange(total, dtype=i32)
    nz = v != 0
    n = nz.sum(dtype=i32)
    rank = jnp.cumsum(nz, dtype=i32) - 1
    tgt = jnp.where(nz, rank, total)
    vals_c = jnp.zeros(total, i32).at[tgt].set(v, mode="drop")
    pos_c = jnp.zeros(total, i32).at[tgt].set(idxs, mode="drop")
    dpos = jnp.diff(pos_c, prepend=0)
    valid = idxs < n

    evm = valid & ((vals_c < -128) | (vals_c > 127))
    epm = valid & (dpos > 255)
    ev = evm.sum(dtype=i32)
    ep = epm.sum(dtype=i32)
    evr = jnp.cumsum(evm, dtype=i32) - 1
    epr = jnp.cumsum(epm, dtype=i32) - 1
    exc_vi = jnp.zeros(EXC, i32).at[jnp.where(evm, evr, EXC)].set(
        idxs, mode="drop")
    exc_vv = jnp.zeros(EXC, i32).at[jnp.where(evm, evr, EXC)].set(
        vals_c, mode="drop")
    exc_pi = jnp.zeros(EXC, i32).at[jnp.where(epm, epr, EXC)].set(
        idxs, mode="drop")
    exc_pv = jnp.zeros(EXC, i32).at[jnp.where(epm, epr, EXC)].set(
        dpos, mode="drop")

    row = jnp.zeros(cap, jnp.uint8)
    hdr = jnp.stack([n, n >> 8, n >> 16, n >> 24,
                     ev, ev >> 8, ep, ep >> 8]).astype(jnp.uint8)
    row = row.at[0:8].set(hdr)
    row = row.at[jnp.where(valid, 8 + idxs, cap)].set(
        vals_c.astype(jnp.uint8), mode="drop")
    row = row.at[jnp.where(valid, 8 + n + idxs, cap)].set(
        dpos.astype(jnp.uint8), mode="drop")
    excoff = (8 + 2 * n + 3) & ~jnp.int32(3)

    def exc_bytes(ei, ev_):
        # (EXC, 8) little-endian {u32 idx, u32 val}
        return jnp.stack([ei, ei >> 8, ei >> 16, ei >> 24,
                          ev_, ev_ >> 8, ev_ >> 16, ev_ >> 24],
                         axis=1).astype(jnp.uint8)

    lane = jnp.arange(EXC, dtype=i32)
    boff = jnp.arange(8, dtype=i32)
    vidx = excoff + 8 * lane[:, None] + boff[None, :]
    row = row.at[jnp.where((lane < ev)[:, None], vidx, cap)].set(
        exc_bytes(exc_vi, exc_vv), mode="drop")
    pidx = excoff + 8 * ev + 8 * lane[:, None] + boff[None, :]
    row = row.at[jnp.where((lane < ep)[:, None], pidx, cap)].set(
        exc_bytes(exc_pi, exc_pv), mode="drop")

    used = (excoff + 8 * (ev + ep) + 3) & ~jnp.int32(3)
    fallback = (ev > EXC) | (ep > EXC)
    return row, used, fallback, vals_c, pos_c, n


def merge_rows(rows_list, useds_list):
    """Scatter per-plane segment rows into one flat byte buffer at aligned
    offsets (exclusive cumsum of used lengths, plane-major order).
    rows_list[c]: (nfr, cap_c) uint8; useds_list[c]: (nfr,) int32.
    Returns (buf, useds_flat)."""
    useds = jnp.concatenate(useds_list)
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(useds, dtype=jnp.int32)[:-1]])
    flatcap = sum(r.shape[0] * r.shape[1] for r in rows_list)
    buf = jnp.zeros(flatcap, jnp.uint8)
    pos = 0
    for rows, used_c in zip(rows_list, useds_list):
        nfr, cap_c = rows.shape
        off_c = jax.lax.dynamic_slice(offs, (pos,), (nfr,))
        col = jnp.arange(cap_c, dtype=jnp.int32)[None, :]
        idx = off_c[:, None] + col
        ok = col < used_c[:, None]
        buf = buf.at[jnp.where(ok, idx, flatcap)].set(rows, mode="drop")
        pos += nfr
    return buf, useds


def slice_packed(buf, total_bytes):
    """Device-side slice of the occupied prefix (bucketed length so the
    slice program stays jit-cached); pair with .copy_to_host_async()."""
    k = min(-(-max(int(total_bytes), 1) // _FETCH_BUCKET) * _FETCH_BUCKET,
            buf.shape[0])
    return buf[:k]


def fetch_packed(buf, total_bytes):
    """One blocking d2h transfer of the occupied prefix."""
    return np.asarray(slice_packed(buf, total_bytes))
