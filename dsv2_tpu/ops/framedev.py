"""Device-side frame container ops: border extension and pyramid
downsample, so reconstructed reference frames never leave the device
(ref: src/frame.c:210-434; host twins in core/frame.py).
"""
import jax.numpy as jnp

from ..core import constants as K
from ..core import intmath as im

B = K.FRAME_BORDER
SUBDIV = 4


def _strip(vals, n):
    """4:1 box downsample of a 1-D edge with remainder averaging
    (ref: src/frame.c:250-355; host twin core/frame.py:_strip)."""
    v = vals.astype(jnp.int32)
    ln = n & ~(SUBDIV - 1)
    rem = n & (SUBDIV - 1)
    main = (v[:ln].reshape(-1, SUBDIV).sum(axis=1) + 2) >> 2
    if rem:
        tail = (v[ln:].sum() // rem)[None]
        main = jnp.concatenate([main, tail])
    return main


def extend_plane_graph(vis, w, h):
    """Visible plane (h, w) -> bordered plane (h+2B, w+2B) with the 32-px
    apron filled exactly like dsv_extend_frame (ref: src/frame.c:357-410)."""
    ls = _strip(vis[:, 0], h)
    rs = _strip(vis[:, w - 1], h)
    ts = _strip(vis[0, :], w)
    bs = _strip(vis[h - 1, :], w)
    def cval(strip, dim):
        # dim < SUBDIV: the reference reads the zero byte before the strip
        # allocation (host twin core/frame.py:_extend_plane cval)
        i = (dim // SUBDIV) - 1
        return strip[i] if i >= 0 else jnp.int32(0)

    tl = (ts[0] + ls[0] + 1) >> 1
    tr = (cval(ts, w) + rs[0] + 1) >> 1
    bl = (cval(ls, h) + bs[0] + 1) >> 1
    br = (cval(bs, w) + cval(rs, h) + 1) >> 1

    ridx = jnp.arange(h) // SUBDIV
    cidx = jnp.arange(w) // SUBDIV
    lcol = jnp.broadcast_to(ls[ridx][:, None], (h, B))
    rcol = jnp.broadcast_to(rs[ridx][:, None], (h, B))
    mid = jnp.concatenate([lcol, vis.astype(jnp.int32), rcol], axis=1)
    trow = jnp.concatenate([jnp.broadcast_to(tl, (B,)), ts[cidx],
                            jnp.broadcast_to(tr, (B,))])
    brow = jnp.concatenate([jnp.broadcast_to(bl, (B,)), bs[cidx],
                            jnp.broadcast_to(br, (B,))])
    top = jnp.broadcast_to(trow[None, :], (B, w + 2 * B))
    bot = jnp.broadcast_to(brow[None, :], (B, w + 2 * B))
    return jnp.concatenate([top, mid, bot], axis=0).astype(jnp.uint8)


def ds2x_luma_graph(bordered, dw, dh):
    """2x luma downsample of a bordered plane to EXPLICIT dest dims
    (level dims round from the original frame size, not the parent level;
    ref: src/frame.c:210-234, dsv_encoder.c:505-510; host twin
    core/frame.py:ds2x_luma)."""
    win = bordered[B:B + 2 * dh + 1, B:B + 2 * dw + 1].astype(jnp.int32)
    p1 = win[0:2 * dh:2, 0:2 * dw:2]
    p2 = win[0:2 * dh:2, 1:2 * dw + 1:2]
    p3 = win[1:2 * dh + 1:2, 0:2 * dw:2]
    p4 = win[1:2 * dh + 1:2, 1:2 * dw + 1:2]
    return ((p1 + p2 + p3 + p4 + 2) >> 2).astype(jnp.uint8)


def pyramid_graph(luma_bordered, w, h, levels):
    """ME pyramid: list of `levels` bordered+extended 2x-downsampled luma
    planes (ref: dsv_encoder.c:493-516)."""
    out = []
    prev = luma_bordered
    for i in range(levels):
        dw, dh = im.round_shift(w, i + 1), im.round_shift(h, i + 1)
        dv = ds2x_luma_graph(prev, dw, dh)
        prev = extend_plane_graph(dv, dw, dh)
        out.append(prev)
    return out
