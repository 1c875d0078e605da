"""Pallas-fused LSTM cell: h2h matmul + gate nonlinearities + state update
in a single TPU kernel.

Replaces the XLA decomposition (matmul -> write 4H gate pre-activations to
HBM -> elementwise pass) used by aocr.ops.lstm with one kernel that keeps
the gate tile in VMEM: the (B, H) @ (H, 4H) h2h product is computed on the
MXU per 128-column H-tile and immediately combined with the precomputed
input projection and the recurrent state on the VPU, so the (B, 4H) gate
tensor never round-trips through HBM.

Weight layout: the i/f/o/g gate columns are interleaved per H-tile
(`pack_gate_weights`), so one contiguous (H, 4*TILE) weight block holds all
four gates of a 128-wide slice of the hidden state — one MXU matmul per
grid step, no strided gathers.

Gate semantics parity: [i|f|o|g] split, c' = sigmoid(f)*c +
sigmoid(i)*tanh(g), h' = sigmoid(o)*tanh(c') — identical to
aocr.ops.lstm.gate_math (reference src/model/LSTM.lua:90-105).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # H-tile width (lane dimension)


def pack_gate_weights(wh: jax.Array, bias: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(H, 4H) gate-blocked weights -> (H, 4H) gate-interleaved per H-tile.

    Column layout of the result: tile j holds [i_j | f_j | o_j | g_j], each
    TILE wide, where x_j is columns [j*TILE, (j+1)*TILE) of gate x in the
    original layout.  bias (4H,) is packed the same way.
    """
    H = wh.shape[0]
    Hout = wh.shape[1] // 4
    assert Hout % TILE == 0, f"hidden size {Hout} must be a multiple of {TILE}"
    n = Hout // TILE
    # (H, 4, n, TILE) -> (H, n, 4, TILE)
    w = wh.reshape(H, 4, n, TILE).transpose(0, 2, 1, 3).reshape(H, 4 * Hout)
    b = bias.reshape(4, n, TILE).transpose(1, 0, 2).reshape(4 * Hout)
    return w, b


def _cell_kernel(xproj_ref, h_ref, c_ref, wh_ref, b_ref, c_out_ref, h_out_ref):
    """Grid step j handles hidden columns [j*TILE, (j+1)*TILE).

    xproj block: (B, 4*TILE) gate-interleaved input projection for tile j
    wh block:    (H, 4*TILE) gate-interleaved recurrent weights for tile j
    h block:     (B, H) full previous hidden state
    c block:     (B, TILE) previous cell state for tile j
    """
    h = h_ref[:]
    # mm.py precision policy: f32 operands get full-precision MXU passes.
    prec = (jax.lax.Precision.HIGHEST if h.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    gates = (
        jnp.dot(h, wh_ref[:], precision=prec,
                preferred_element_type=jnp.float32)
        + xproj_ref[:]
        + b_ref[:]
    )
    i = jax.nn.sigmoid(gates[:, 0 * TILE:1 * TILE])
    f = jax.nn.sigmoid(gates[:, 1 * TILE:2 * TILE])
    o = jax.nn.sigmoid(gates[:, 2 * TILE:3 * TILE])
    g = jnp.tanh(gates[:, 3 * TILE:4 * TILE])
    c = f * c_ref[:] + i * g
    c_out_ref[:] = c
    h_out_ref[:] = o * jnp.tanh(c)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_cell_step(
    xproj_packed: jax.Array,  # (B, 4H) gate-interleaved input projection (f32)
    h_prev: jax.Array,  # (B, H)
    c_prev: jax.Array,  # (B, H) f32
    wh_packed: jax.Array,  # (H, 4H) gate-interleaved
    b_packed: jax.Array,  # (4H,) gate-interleaved
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One fused LSTM step.  Returns (c_next, h_next), both (B, H) f32."""
    B, H = c_prev.shape
    n = H // TILE
    grid = (n,)
    b2d = b_packed.reshape(1, -1)
    c_next, h_next = pl.pallas_call(
        _cell_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 4 * TILE), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TILE), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * TILE), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * TILE), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, TILE), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TILE), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * 4 * H,
            bytes_accessed=(B * 4 * H * 4 + B * H * 2 * 3
                            + H * 4 * H * wh_packed.dtype.itemsize),
            transcendentals=4 * B * H,
        ),
        interpret=interpret,
    )(xproj_packed, h_prev.astype(wh_packed.dtype), c_prev, wh_packed, b2d)
    return c_next, h_next


def fused_scan(
    layer: dict,
    xs: jax.Array,
    c0: jax.Array,
    h0: jax.Array,
    reverse: bool = False,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Drop-in Pallas-backed replacement for lstm.unidirectional_scan:
    the input projection stays one big XLA matmul (already MXU-optimal);
    the recurrence body is the fused Pallas cell."""
    from aocr.ops.mm import matmul

    B, L, _D = xs.shape
    x_proj = matmul(xs.astype(compute_dtype), layer["wi"].astype(compute_dtype))
    wh_p, b_p = pack_gate_weights(
        layer["wh"].astype(compute_dtype), layer["bi"] + layer["bh"]
    )
    # pack x_proj columns the same way as the weights
    H = layer["wh"].shape[0]
    n = H // TILE
    x_proj = (
        x_proj.reshape(B, L, 4, n, TILE)
        .transpose(1, 0, 3, 2, 4)
        .reshape(L, B, 4 * H)
    )

    def body(carry, xp):
        c, h = carry
        c2, h2 = fused_cell_step(xp, h, c, wh_p, b_p, interpret=interpret)
        return (c2, h2), h2

    (c_f, h_f), hs = jax.lax.scan(body, (c0, h0), x_proj, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1), (c_f, h_f)
