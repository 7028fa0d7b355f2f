"""Stage tracing / profiling.

The reference has only leveled printf logging (SURVEY §5); the TPU build
adds per-stage wall timing and optional XLA profiler capture:

- `stage("name")` context manager accumulates wall time per stage when
  DSV2_TRACE=1 (or trace.enable()); `report()` prints the table.
- DSV2_XPROF=<dir> additionally wraps the process in jax.profiler.trace
  so the device timeline can be inspected with TensorBoard/XProf.
"""
import os
import time
import atexit
import threading
from collections import defaultdict
from contextlib import contextmanager

_enabled = bool(int(os.environ.get("DSV2_TRACE", "0") or 0))
_lock = threading.Lock()
_acc = defaultdict(float)
_cnt = defaultdict(int)
_xprof = None


def enable(flag=True):
    global _enabled
    _enabled = flag


@contextmanager
def stage(name):
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            _acc[name] += dt
            _cnt[name] += 1


def report(out=None):
    """Per-stage totals; printed at exit automatically when tracing."""
    import sys
    out = out or sys.stderr
    if not _acc:
        return
    total = sum(_acc.values())
    print("--- dsv2 stage timing ---", file=out)
    for name, t in sorted(_acc.items(), key=lambda kv: -kv[1]):
        print("  %-28s %8.3fs  x%-6d (%4.1f%%)"
              % (name, t, _cnt[name], 100 * t / max(total, 1e-9)), file=out)


def _maybe_start_xprof():
    global _xprof
    d = os.environ.get("DSV2_XPROF")
    if d:
        import jax
        jax.profiler.start_trace(d)
        _xprof = d


def _shutdown():
    if _xprof:
        import jax
        jax.profiler.stop_trace()
    if _enabled:
        report()


_maybe_start_xprof()
atexit.register(_shutdown)
