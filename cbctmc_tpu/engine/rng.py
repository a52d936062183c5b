"""Counter-based RNG helpers for the transport engine.

The reference engine uses RANECU with leap-frog sequence splitting so every
CUDA thread owns a disjoint subsequence (MC-GPU_kernel_v1.3.cu:812-894). On
TPU a counter-based PRNG gives the same property for free: every
``jax.random`` key split yields an independent stream, so per-lane, per-step
and per-shard decorrelation falls out of key folding.

``uniform_open`` returns floats in the OPEN interval (0, 1): the transport
math takes ``log(u)`` and divides by ``u``-derived quantities, and RANECU
also never returns exactly 0 or 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INV_2_24 = jnp.float32(1.0 / 16777216.0)
_HALF_2_24 = jnp.float32(0.5 / 16777216.0)


def uniform_open(key: jax.Array, shape) -> jnp.ndarray:
    """Uniform float32 samples in the open interval (0, 1)."""
    bits = jax.random.bits(key, shape, dtype=jnp.uint32)
    return (bits >> 8).astype(jnp.float32) * _INV_2_24 + _HALF_2_24


def uniforms_open(key: jax.Array, n: int, shape) -> list[jnp.ndarray]:
    """n independent uniform(0,1) arrays of the given shape."""
    keys = jax.random.split(key, n)
    return [uniform_open(keys[i], shape) for i in range(n)]
