"""Hierarchical motion estimation dispatch.

Backends: "wave" = single-dispatch TPU wavefront program (ops/hme_wave),
"host" = python+native orchestration (ops/hme_search, the bit-exactness
oracle). Both produce identical fields; "auto" picks wave on accelerators
and host on CPU (where the wave program's compile time dominates).
(ref: src/hme.c)
"""
import jax


def motion_est(enc, d):
    backend = getattr(enc, "hme_backend", "auto")
    if backend == "auto":
        backend = ("host" if jax.default_backend() == "cpu" else "wave")
    if backend == "wave":
        from ..ops import hme_wave
        hme_wave.motion_est(enc, d)
    else:
        from ..ops import hme_search
        hme_search.motion_est(enc, d)
