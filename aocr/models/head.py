"""Output projector: Linear(decoder_hidden -> vocab) + log-softmax.

Parity with `/root/reference/src/model/output_projector.lua:3-8`
(nn.Linear + nn.LogSoftMax).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from aocr.ops.mm import matmul


def init_params(rng: jax.Array, num_hidden: int, vocab_size: int) -> dict:
    k1, k2 = jax.random.split(rng)
    b = 1.0 / math.sqrt(num_hidden)
    return {
        "w": jax.random.uniform(k1, (num_hidden, vocab_size), jnp.float32, -b, b),
        "b": jax.random.uniform(k2, (vocab_size,), jnp.float32, -b, b),
    }


def apply(params: dict, h: jax.Array, compute_dtype=jnp.float32) -> jax.Array:
    """h (..., H) -> log-probs (..., V), always float32 out."""
    logits = (
        matmul(h.astype(compute_dtype), params["w"].astype(compute_dtype))
        + params["b"]
    )
    return jax.nn.log_softmax(logits, axis=-1)
