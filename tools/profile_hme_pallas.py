#!/usr/bin/env python
"""Per-stage timing of the Pallas HME pyramid + P chain on the real chip.

Times each level's pallas_call in isolation (repeated dispatch on
device-resident inputs, tiny fetch to force completion) so the 15 ms
frame cost decomposes into per-level kernel time vs XLA glue — the data
that decides whether lane-batching or per-block op cuts come next.

usage: profile_hme_pallas.py [width height] [reps]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def timed(fn, fetch, reps):
    fetch(fn())  # warm + prime
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn()
    fetch(o)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 2 else 352
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 288
    reps = int(sys.argv[-1]) if len(sys.argv) in (2, 4) else 5
    plat = os.environ.get("DSV2_JAX_PLATFORM")
    if plat:
        import jax as _j
        _j.config.update("jax_platforms", plat)
    import numpy as np
    import dsv2_tpu
    dsv2_tpu.enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import mkfixtures
    from dsv2_tpu.utils import y4m
    from dsv2_tpu.utils.packet import VideoMeta
    from dsv2_tpu.cli import make_encoder, default_enc_opts
    from dsv2_tpu.ops import hme_wave as hw, hme_pallas as hp

    path = f"/tmp/dsv2_prof_{w}x{h}.y4m"
    if not os.path.exists(path):
        mkfixtures.write_y4m(path, w, h, 3)
    frames = []
    with open(path, "rb") as f:
        rdr = y4m.Y4MReader(f)
        while True:
            p = rdr.read_frame()
            if p is None:
                break
            frames.append(p)
    meta = VideoMeta(width=w, height=h, subsamp=rdr.subsamp,
                     fps_num=rdr.fps[0], fps_den=rdr.fps[1])
    enc = make_encoder(meta, default_enc_opts(qp=60, gop=8))
    enc.hme_backend = "pallas"
    for fr in frames[:2]:
        enc.encode_frame(fr)  # frame 2 is a P frame: d carries real state

    # rebuild the search inputs exactly as motion_est would
    class D:  # the minimal attrs prepare_motion_est reads
        pass
    d = enc._last_d if hasattr(enc, "_last_d") else None
    if d is None:
        # drive one more frame and steal the data object via a hook
        seen = {}
        orig = hp.motion_est

        def spy(e, dd):
            seen["cfg_inputs"] = hw.prepare_motion_est(e, dd)
            return orig(e, dd)
        hp.motion_est = spy
        enc.encode_frame(frames[2])
        hp.motion_est = orig
        cfg, inputs = seen["cfg_inputs"]
    else:
        cfg, inputs = hw.prepare_motion_est(enc, d)

    inputs = jax.tree_util.tree_map(
        lambda a: jax.device_put(np.asarray(a)) if hasattr(a, "shape")
        else a, inputs)

    # whole-pyramid program
    full = hp.make_motion_est(cfg)
    ms = timed(lambda: full(*inputs), lambda o: np.asarray(o["fx"]), reps)
    print(f"pallas full pyramid: {ms:8.2f} ms/frame ({w}x{h})")

    # per-level: call the level programs with live parent fields
    (src_planes, ref_planes, ogr_planes, src_u, src_v, ref_u, ref_v,
     tmv_x, tmv_y, quant, skip_thresh) = inputs
    npl = cfg.pyramid_levels
    parent_x = jnp.zeros((cfg.nbv, cfg.nbh), jnp.int32)
    parent_y = jnp.zeros((cfg.nbv, cfg.nbh), jnp.int32)
    gx = jnp.int32(0)
    gy = jnp.int32(0)
    q = jnp.asarray(quant, jnp.int32)
    st = jnp.asarray(skip_thresh, jnp.int32)
    for level in range(npl, 0, -1):
        def lvl(level=level, px=parent_x, py=parent_y, gx=gx, gy=gy):
            cand = hp._pregather(cfg, level, px, py,
                                 jnp.asarray(tmv_x, jnp.int32),
                                 jnp.asarray(tmv_y, jnp.int32))
            scal = jnp.stack([gx, gy, q, st, gx, gx, gx, gx]
                             ).astype(jnp.int32)[None]
            planes = tuple(hp._pad_plane(jnp.asarray(p)) for p in
                           (src_planes[level], ref_planes[level],
                            ogr_planes[level]))
            shapes = tuple((p.shape, str(p.dtype)) for p in planes)
            return hp._level_call(cfg, level, shapes)(cand, scal, *planes)
        f = jax.jit(lvl)
        ms = timed(f, lambda o: np.asarray(o), reps)
        print(f"  level {level}: {ms:8.2f} ms")
        rows = hp._masked_rows(cfg, level, f())
        fx = hp._unskew(cfg, level, rows, 0)
        fy = hp._unskew(cfg, level, rows, 1)
        gx, gy = hw.global_motion_graph(cfg, level, fx, fy)
        parent_x, parent_y = fx, fy

    def l0(px=parent_x, py=parent_y, gx=gx, gy=gy):
        cand = hp._pregather(cfg, 0, px, py,
                             jnp.asarray(tmv_x, jnp.int32),
                             jnp.asarray(tmv_y, jnp.int32))
        scal = jnp.stack([gx, gy, q, st, gx, gx, gx, gx]
                         ).astype(jnp.int32)[None]
        planes = tuple(hp._pad_plane(jnp.asarray(p)) for p in
                       (src_planes[0], ref_planes[0], ogr_planes[0],
                        src_u, src_v, ref_u, ref_v))
        shapes = tuple((p.shape, str(p.dtype)) for p in planes)
        return hp._level0_call(cfg, shapes)(cand, scal, *planes)
    f0 = jax.jit(l0)
    ms = timed(f0, lambda o: np.asarray(o), reps)
    print(f"  level 0: {ms:8.2f} ms")


if __name__ == "__main__":
    main()
