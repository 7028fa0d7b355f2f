"""On-device entropy scan (ops/scan_pl) byte-parity vs the native coder.

The native scan (dsvn_scan_enc, itself byte-checked against the reference
binary by the e2e suites) is the oracle; the device blob must match it
bit-for-bit wherever the dense8 contract holds, and must raise the
fallback flag (never emit a wrong blob) everywhere else."""
import numpy as np
import pytest

from dsv2_tpu import native
from dsv2_tpu.ops import hzcc, scan_pl


def _segs(w, h):
    return tuple(hzcc.scan_segments(w, h))


def _check(segs, v, cap=None):
    import jax.numpy as jnp
    total = sum(c for c, _ in segs)
    fn = scan_pl.make_scan_blob(segs, cap or 2 * total)
    blob, n, fb = fn(jnp.asarray(v.astype(np.int32)))
    assert not bool(fb)
    want = native.scan_encode(v.astype(np.int32), list(segs))
    got = np.asarray(blob)[:int(n)].tobytes()
    assert got == want, (
        f"blob mismatch: {len(got)} vs {len(want)} bytes")


@pytest.mark.parametrize("w,h", [(176, 144), (100, 62), (64, 48)])
def test_random_sparse(w, h):
    rng = np.random.default_rng(42)
    segs = _segs(w, h)
    total = sum(c for c, _ in segs)
    ll_n = segs[0][0]
    for density in (0.01, 0.1, 0.5, 1.0):
        v = np.zeros(total, np.int32)
        nz = rng.random(total) < density
        v[nz] = rng.integers(-127, 128, nz.sum())
        v[:ll_n] = (rng.integers(-60000, 60000, ll_n)
                    * (rng.random(ll_n) < 0.7))
        _check(segs, v)


def test_edges():
    segs = _segs(176, 144)
    total = sum(c for c, _ in segs)
    ll_n = segs[0][0]
    _check(segs, np.zeros(total))                      # empty blob
    v = np.zeros(total); v[-1] = 100; _check(segs, v)  # max-length run
    v = np.zeros(total); v[0] = -(2 ** 29); _check(segs, v)
    v = np.full(total, 127); v[:ll_n] = 2 ** 29 - 1; _check(segs, v)
    v = np.full(total, -127); v[:ll_n] = -(2 ** 29); _check(segs, v)
    # vk climb on a dense stretch, then decay over sparse tail
    v = np.zeros(total)
    v[ll_n:ll_n + 5000] = 127
    v[ll_n + 20000::501] = -1
    _check(segs, v)
    # tiny values keep k at 0 (rice '1'-bit tails)
    v = np.zeros(total); v[ll_n::7] = 1; _check(segs, v)


def test_fallbacks():
    import jax.numpy as jnp
    segs = _segs(176, 144)
    total = sum(c for c, _ in segs)
    ll_n = segs[0][0]
    fn = scan_pl.make_scan_blob(segs, 2 * total)
    v = np.zeros(total, np.int32); v[ll_n + 10] = 128      # HF over int8
    assert bool(fn(jnp.asarray(v))[2])
    v = np.zeros(total, np.int32); v[0] = 2 ** 30          # LL over 2^30
    assert bool(fn(jnp.asarray(v))[2])
    small = scan_pl.make_scan_blob(segs, 64)               # cap exceeded
    rng = np.random.default_rng(0)
    v = rng.integers(-127, 128, total).astype(np.int32)
    assert bool(small(jnp.asarray(v))[2])


def test_vmapped_batch():
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    segs = _segs(100, 62)
    total = sum(c for c, _ in segs)
    vs = []
    for i in range(4):
        v = np.zeros(total, np.int32)
        nz = rng.random(total) < (0.02 + 0.1 * i)
        v[nz] = rng.integers(-127, 128, nz.sum())
        vs.append(v)
    vs = np.stack(vs)
    fn = scan_pl.make_scan_blob(segs, total)
    blobs, ns, fbs = jax.vmap(fn)(jnp.asarray(vs))
    for i in range(4):
        assert not bool(fbs[i])
        want = native.scan_encode(vs[i], list(segs))
        assert np.asarray(blobs[i])[:int(ns[i])].tobytes() == want


def test_codec_statistics():
    """Blob parity under codec-like statistics: laplacian values whose
    density and magnitude decay by subband level (what the quantizer
    actually emits), across many seeds to sweep vk trajectories."""
    segs = _segs(176, 144)
    ll_n = segs[0][0]
    for seed in range(8):
        rng = np.random.default_rng(100 + seed)
        parts = [np.round(rng.laplace(0, 900, ll_n)).astype(np.int32)]
        for count, damp in segs[1:]:
            scale = 0.5 * (damp - 2)        # sparser/higher by level
            vals = np.round(rng.laplace(0, scale, count))
            parts.append(np.clip(vals, -127, 127).astype(np.int32))
        _check(segs, np.concatenate(parts))
