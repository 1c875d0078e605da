"""Pallas-fused Luong-general attention head.

One kernel per batch tile computes the whole attention head of the decoder
(reference src/model/LSTM.lua:124-162) without materializing any
intermediate in HBM:

    q      = h_top @ W_a                  (MXU)
    scores = sum_h context * q            (VPU, per column)
    alpha  = softmax_L(scores)            (VPU)
    ctx    = sum_l alpha * context        (VPU)
    h~     = tanh([ctx ; h_top] @ W_c)    (MXU)

The XLA decomposition writes q (B,H), scores (B,L), alpha (B,L), ctx (B,H)
and the concat (B,2H) through HBM between fusions; here they all live in
VMEM for the lifetime of the batch tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_TILE = 64


def _attn_kernel(h_ref, ctx_ref, wa_ref, wc_ref, out_ref):
    h = h_ref[:]  # (Bt, H)
    context = ctx_ref[:]  # (Bt, L, H)
    # Same precision policy as aocr/ops/mm.py: f32 operands get full-
    # precision MXU passes (dtype is static at trace time).
    prec = (jax.lax.Precision.HIGHEST if h.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    q = jnp.dot(h, wa_ref[:], precision=prec,
                preferred_element_type=jnp.float32)  # (Bt, H)
    scores = jnp.sum(
        context.astype(jnp.float32) * q[:, None, :], axis=-1
    )  # (Bt, L)
    alpha = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.sum(
        alpha[:, :, None] * context.astype(jnp.float32), axis=1
    )  # (Bt, H)
    H = h.shape[-1]
    wc = wc_ref[:]
    pre = (
        jnp.dot(ctx.astype(wc.dtype), wc[:H], precision=prec,
                preferred_element_type=jnp.float32)
        + jnp.dot(h, wc[H:], precision=prec,
                  preferred_element_type=jnp.float32)
    )
    out_ref[:] = jnp.tanh(pre)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(
    h_top: jax.Array,  # (B, H)
    context: jax.Array,  # (B, L, H)
    w_a: jax.Array,  # (H, H)
    w_c: jax.Array,  # (2H, H)
    interpret: bool = False,
) -> jax.Array:
    """Returns h_tilde (B, H) float32.  Row counts that are not a multiple
    of B_TILE are padded up to one (and the output sliced back), so the
    kernel always runs on bounded 64-row tiles — a single whole-batch tile
    at e.g. B = batch*beam = 2000 would need ~100 MB of VMEM and fail at
    runtime."""
    B0 = h_top.shape[0]
    pad_rows = (-B0) % B_TILE if B0 > B_TILE else 0
    if B0 < B_TILE:
        bt = B0  # small batches: one tile
    else:
        bt = B_TILE
        if pad_rows:
            h_top = jnp.pad(h_top, ((0, pad_rows), (0, 0)))
            context = jnp.pad(context, ((0, pad_rows), (0, 0), (0, 0)))
    B, L, H = context.shape
    grid = (B // bt,)
    dt = w_a.dtype
    return pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, L, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * H, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * H + 4 * B * L * H + 4 * B * H * H,
            bytes_accessed=(B * L * H * 2 + B * H * 4 * 2
                            + 3 * H * H * dt.itemsize),
            transcendentals=B * (L + H),
        ),
        interpret=interpret,
    )(h_top.astype(dt), context.astype(dt), w_a, w_c)[:B0]
