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
