"""Hierarchical motion estimation dispatch.

Backends:
- "host": python orchestration over native metric primitives
  (ops/hme_search) — the bit-exactness oracle.
- "wave": the whole pyramid search as one XLA program (ops/hme_wave).
- "pallas": the same search with the per-diagonal wavefront as Pallas
  grid steps (ops/hme_pallas) — removes the TPU's ~1 ms/iteration XLA
  loop floor; THE fast path on real TPU hardware.
- "auto" (default): pallas on a real accelerator (single-stream AND
  lockstep — the kernels don't pay the XLA loop floor, so they win even
  unbatched), host on CPU (where the native metric primitives beat
  XLA:CPU retracing and keep the test suite compile time sane).
All backends produce byte-identical streams (ref: src/hme.c).
"""
import os


def _auto_backend(enc):
    import jax
    if jax.default_backend() not in ("cpu",):
        return "pallas"
    return "host"


def resolve_backend(enc):
    """The effective backend for this encoder (shared policy: the encoder's
    device-chain gate must agree with the dispatch below)."""
    backend = getattr(enc, "hme_backend", None) or os.environ.get(
        "DSV2_HME", "auto")
    if backend == "auto":
        backend = _auto_backend(enc)
    return backend


def is_device_backend(enc):
    """True when the search runs on device (wave XLA or pallas kernels) —
    the encoder keeps the whole reference chain device-resident then."""
    return resolve_backend(enc) in ("wave", "pallas", "gang")


def motion_est(enc, d):
    backend = resolve_backend(enc)
    if backend == "pallas":
        from ..ops import hme_pallas
        hme_pallas.motion_est(enc, d)
    elif backend == "gang":
        from ..ops import hme_gang
        hme_gang.motion_est(enc, d)
    elif backend == "wave":
        from ..ops import hme_wave
        hme_wave.motion_est(enc, d)
    else:
        from ..ops import hme_search
        hme_search.motion_est(enc, d)
