"""dsv2_tpu — TPU-native DSV2 (bitstream v2.8) video codec framework.

Device compute (subband transforms, quantization, motion compensation/
estimation) runs as integer JAX/XLA programs; serial bit-feedback paths
(entropy coding, in-loop filters) run in a small native C runtime; sessions,
rate control and I/O are host Python.

Bitstream-compatible with the reference C implementation
(/root/reference, LMP88959/Digital-Subband-Video-2).
"""

__version__ = "0.1.0"

from .core.constants import (  # noqa: F401
    SUBSAMP_444, SUBSAMP_422, SUBSAMP_UYVY, SUBSAMP_420, SUBSAMP_411,
    SUBSAMP_410,
)


def enable_compile_cache(path=None):
    """Enable JAX's persistent compilation cache (the wavefront HME program
    takes minutes to compile per resolution; the cache amortizes it across
    runs)."""
    import os
    import jax
    path = path or os.environ.get(
        "DSV2_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    # separate subdir per platform config: XLA:CPU AOT entries record host
    # machine features and can SIGILL if loaded under a different CPU
    # detection (do NOT call default_backend() here — it would initialize
    # the backend and hang on a dead device tunnel)
    plat = getattr(jax.config, "jax_platforms", None) or "default"
    path = os.path.join(path, str(plat))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
