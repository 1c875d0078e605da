"""Matmul helpers with explicit MXU precision policy.

On TPU, `lax.Precision.DEFAULT` lowers float32 matmuls through bfloat16
passes on the MXU.  This framework makes the tradeoff explicit instead of
implicit: when operands are float32, request full float32 precision
(HIGHEST); when the compute dtype is bfloat16 (cfg.compute_dtype), operands
are already bf16 and the MXU computes bf16 x bf16 -> f32 natively.  All
matmuls accumulate in float32 via preferred_element_type.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _precision(*operands):
    if any(o.dtype == jnp.float32 for o in operands):
        return lax.Precision.HIGHEST
    return lax.Precision.DEFAULT


def matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """a @ b with f32 accumulation and explicit precision."""
    return jnp.dot(
        a, b,
        precision=_precision(a, b),
        preferred_element_type=jnp.float32,
    )


def einsum(eq: str, *operands: jax.Array) -> jax.Array:
    return jnp.einsum(
        eq, *operands,
        precision=_precision(*operands),
        preferred_element_type=jnp.float32,
    )
