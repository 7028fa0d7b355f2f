#!/usr/bin/env python
"""Generate small deterministic synthetic test videos (Y4M) for parity tests.

Content mixes what the codec cares about: smooth gradients, hard edges,
texture, global + local motion, a scene cut — so intra analysis, HME, skip
blocks, EPRM and the adaptive filters all get exercised.
"""
import os
import sys

import numpy as np

SUBS_MAP = {"420": (1, 1), "444": (0, 0), "422": (1, 0), "411": (2, 0), "410": (2, 2)}


def synth_frame(w, h, t, rng, scene=0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.int64)
    if scene == 0:
        # moving diagonal gradient + moving textured square + static edge grid
        y = (xx * 2 + yy + t * 3) % 256
        y = (y // 2 + 64).astype(np.int64)
        # static high-contrast grid (edges)
        y[(xx // 16 + yy // 16) % 2 == 0] //= 2
        # moving square with noise texture
        sqh, sqw = min(20, h), min(24, w)
        sx, sy = (t * 5) % max(w - sqw, 1), (t * 3) % max(h - sqh, 1)
        tex = rng.integers(0, 90, (20, 24))
        y[sy:sy + sqh, sx:sx + sqw] = 120 + tex[:sqh, :sqw]
    else:
        # second scene: radial pattern, slow pan
        cx, cy = w // 2 + t, h // 3
        r = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2).astype(np.int64)
        y = (r * 4) % 200 + 28
    u = ((xx + t * 2) % 256) // 2 + 64
    v = ((yy * 2 - t) % 256) // 2 + 64
    return (np.clip(y, 0, 255).astype(np.uint8),
            np.clip(u, 0, 255).astype(np.uint8),
            np.clip(v, 0, 255).astype(np.uint8))


def subsample(p, sh, sv):
    # simple box average matching chroma generation (content is synthetic,
    # any downsample is fine — it just defines the input planes)
    if sh == 0 and sv == 0:
        return p
    h, w = p.shape
    fw, fh = 1 << sh, 1 << sv
    w2, h2 = -(-w // fw), -(-h // fh)
    pad = np.pad(p, ((0, h2 * fh - h), (0, w2 * fw - w)), mode="edge")
    return pad.reshape(h2, fh, w2, fw).mean(axis=(1, 3)).astype(np.uint8)


def write_y4m(path, w, h, nframes, subs="420", fps=(30, 1), scene_cut=None):
    sh, sv = SUBS_MAP[subs]
    rng = np.random.default_rng(0xD5F2)
    with open(path, "wb") as f:
        f.write(b"YUV4MPEG2 W%d H%d F%d:%d A1:1 Ip C%s\n"
                % (w, h, fps[0], fps[1], subs.encode()))
        for t in range(nframes):
            scene = 1 if (scene_cut is not None and t >= scene_cut) else 0
            y, u, v = synth_frame(w, h, t, rng, scene)
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(subsample(u, sh, sv).tobytes())
            f.write(subsample(v, sh, sv).tobytes())


def main(outdir):
    os.makedirs(outdir, exist_ok=True)
    write_y4m(os.path.join(outdir, "tiny64x48_420_6f.y4m"), 64, 48, 6)
    # smallest frame exercising multi-lane diagonals (3x2 block grid):
    # the interpret-mode Pallas/gang parity tests scale with diagonal
    # count, so they run on this one
    write_y4m(os.path.join(outdir, "nano48x32_420_4f.y4m"), 48, 32, 4)
    write_y4m(os.path.join(outdir, "qcif176x144_420_10f.y4m"), 176, 144, 10,
              scene_cut=7)
    write_y4m(os.path.join(outdir, "odd100x62_420_4f.y4m"), 100, 62, 4)
    write_y4m(os.path.join(outdir, "tiny64x48_444_4f.y4m"), 64, 48, 4, subs="444")
    write_y4m(os.path.join(outdir, "tiny64x48_422_4f.y4m"), 64, 48, 4, subs="422")
    write_y4m(os.path.join(outdir, "tiny64x48_411_4f.y4m"), 64, 48, 4, subs="411")
    write_y4m(os.path.join(outdir, "tiny64x48_410_4f.y4m"), 64, 48, 4, subs="410")
    write_y4m(os.path.join(outdir, "cif352x288_420_12f.y4m"), 352, 288, 12)
    print(outdir)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures"))
