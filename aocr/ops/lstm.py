"""LSTM primitives, TPU-first.

Gate layout parity with the reference cell (`/root/reference/src/model/LSTM.lua:90-105`):
the fused 4H pre-activation splits contiguously into
[in_gate | forget_gate | out_gate | in_transform] (sigmoid, sigmoid, sigmoid,
tanh), then c' = f*c + i*g and h' = o*tanh(c').

TPU-native structure: the input projection (i2h) for *all* timesteps is
hoisted out of the recurrence into one large MXU matmul; the `lax.scan` body
only performs the hidden-to-hidden matmul plus fused elementwise gate math
(which XLA fuses into the matmul epilogue).  This replaces the reference's
per-timestep Lua module-clone loop (`src/model/model.lua:294-316`).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from aocr.ops.mm import matmul

# lax.scan unroll factor for the recurrent loops (encoder directions and
# the teacher-forced decoder).  Unrolling trades compiled-code size for
# fewer loop iterations and cross-step fusion opportunities in both the
# forward and the autodiff-generated backward scan.  Module-level so
# experiments (tools/) can sweep it; the shipped default is what measured
# fastest on v5e (see docs/performance.md).
SCAN_UNROLL = 1


def init_lstm_layer(rng: jax.Array, input_size: int, num_hidden: int) -> dict:
    """Torch nn.Linear-style init for i2h and h2h: uniform(+-1/sqrt(fan_in))."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    bi = 1.0 / math.sqrt(input_size)
    bh = 1.0 / math.sqrt(num_hidden)
    return {
        "wi": jax.random.uniform(k1, (input_size, 4 * num_hidden), jnp.float32, -bi, bi),
        "bi": jax.random.uniform(k2, (4 * num_hidden,), jnp.float32, -bi, bi),
        "wh": jax.random.uniform(k3, (num_hidden, 4 * num_hidden), jnp.float32, -bh, bh),
        "bh": jax.random.uniform(k4, (4 * num_hidden,), jnp.float32, -bh, bh),
    }


def gate_math(
    gates: jax.Array, c_prev: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Fused 4H pre-activations -> (c', h').  gates: (..., 4H), c_prev: (..., H)."""
    i, f, o, g = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    o = jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c = f * c_prev + i * g
    h = o * jnp.tanh(c)
    return c, h


def lstm_step(
    layer: dict, x: jax.Array, c_prev: jax.Array, h_prev: jax.Array,
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """One full LSTM step: gates = [x;h] @ [Wi;Wh] + bi + bh, then gate math.

    The input and recurrent projections are fused into a single wider MXU
    matmul (one (B, D+H) x (D+H, 4H) instead of two) — better systolic-array
    utilization for the small-batch single-step case, and the weight concat
    is loop-invariant so XLA hoists it out of decode scans.
    """
    cd = compute_dtype
    w = jnp.concatenate(
        [layer["wi"].astype(cd), layer["wh"].astype(cd)], axis=0
    )
    xh = jnp.concatenate([x.astype(cd), h_prev.astype(cd)], axis=-1)
    gates = matmul(xh, w) + layer["bi"] + layer["bh"]
    return gate_math(gates, c_prev)


def unidirectional_scan(
    layer: dict,
    xs: jax.Array,
    c0: jax.Array,
    h0: jax.Array,
    reverse: bool = False,
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Run an LSTM layer over a sequence.

    xs: (B, L, D) inputs; returns (hs (B, L, H) in *original* time order,
    (c_final, h_final)).  With reverse=True the recurrence runs L..1 (the
    reference's backward encoder, src/model/model.lua:305-316) and h_final is
    the state after consuming timestep 1.

    The input projection for all L steps is one batched matmul; the scan body
    is h2h + gate math only.
    """
    B, L, _D = xs.shape
    x_proj = (
        matmul(xs.astype(compute_dtype), layer["wi"].astype(compute_dtype))
        + layer["bi"] + layer["bh"]
    )  # (B, L, 4H)
    x_proj = jnp.swapaxes(x_proj, 0, 1)  # (L, B, 4H) scan-major
    wh = layer["wh"].astype(compute_dtype)

    def body(carry, xp):
        c, h = carry
        gates = xp + matmul(h.astype(compute_dtype), wh)
        c, h = gate_math(gates, c)
        return (c, h), h

    (c_f, h_f), hs = lax.scan(body, (c0, h0), x_proj, reverse=reverse,
                              unroll=SCAN_UNROLL)
    return jnp.swapaxes(hs, 0, 1), (c_f, h_f)
