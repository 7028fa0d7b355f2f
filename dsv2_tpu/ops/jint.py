"""C89-exact integer arithmetic on jnp int32 arrays.

Counterparts of dsv2_tpu.core.intmath for traced device code. All shifts on
signed ints lower to arithmetic shifts in XLA; divisions that can see
negative operands must use the truncating forms here, never Python-style
floor `//` (ref idioms: src/dsv.h:71-78, src/sbt.c:93-103).
"""
import jax.numpy as jnp


def divt(a, b):
    """Truncating (C) integer division; b may be a positive python int."""
    if isinstance(b, int) and b > 0:
        q = jnp.abs(a) // b
        return jnp.where(a < 0, -q, q)
    q = jnp.abs(a) // jnp.abs(b)
    return jnp.where((a < 0) != (b < 0), -q, q)


def sar(v, s):
    return v >> s


def sar_r(v, s):
    return (v + (1 << (s - 1))) >> s


def round2(v):
    return divt(v + jnp.where(v < 0, -1, 1), 2)


def round4(v):
    return divt(v + jnp.where(v < 0, -2, 2), 4)


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def clamp_u8(x):
    return jnp.clip(x, 0, 255)
