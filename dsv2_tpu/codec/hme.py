"""Hierarchical motion estimation dispatch.

Backends:
- "host": python orchestration over native metric primitives
  (ops/hme_search) — the bit-exactness oracle and the current
  single-stream default.
- "wave": the whole pyramid search as one XLA program (ops/hme_wave),
  byte-identical output. Pays off with frame-lockstep batching (multiple
  GOP streams per dispatch); single-frame dispatch underutilizes the TPU,
  so it is opt-in for now (enc.hme_backend = "wave" or DSV2_HME=wave).
(ref: src/hme.c)
"""
import os


def motion_est(enc, d):
    backend = getattr(enc, "hme_backend", None) or os.environ.get(
        "DSV2_HME", "host")
    if backend == "auto":
        backend = "host"
    if backend == "wave":
        from ..ops import hme_wave
        hme_wave.motion_est(enc, d)
    else:
        from ..ops import hme_search
        hme_search.motion_est(enc, d)
