"""Pallas kernel for the fused ReLU+max-pool BACKWARD (CNN pools).

The r4 train-step trace at B=400 showed the pool1 backward chain costing
~1.3 ms/step: XLA's `select_and_scatter` emitter (0.71 ms on the
400x32x100x64 stacks), plus a u32 bit-pack of the conv1 ReLU mask
(0.30 ms reading the full 164 MB activation) and its unpack inside the
bias-grad reduce fusions.  All of it re-derives information already
present in ONE residual — the ReLU output y (= the pool input, kept
anyway as the next conv's saved activation):

    dz[b,i,j,c] = dy routed to the FIRST element equal to the window max
                  (row-major window order — XLA's GE-select semantics),
                  zeroed where y == 0 (the ReLU subgradient).

Positions with y == 0 can never win a positive-max window, and an
all-zero window routes dy to its first element where the ReLU mask then
kills it — so masking on the OUTPUT y is bit-identical to composing
select_and_scatter with the input-side `x > 0` ReLU VJP (and matches
Torch's `gradInput = g * (output > 0)`; see cnn._pool_bwd_impl, whose
slice-based XLA expansion is bit-equal by tests/test_pool_vjp.py).

Layout: these activations live as bf16[B,H,W,C]{0,3,2,1} — batch on
lanes.  The kernel therefore consumes TRANSPOSED VIEWS (H, W, C, B)
whose default (row-major) layout is byte-identical to the stored one, so
the boundary `jnp.transpose`s lower to bitcasts, not copies.  The window
split (H,W,C,B) -> (Ho,wh,Wo,ww,C,B) merges/splits only leading axes —
also free.  One grid step handles one (wh x W) row-pair slab per batch
tile; all math is elementwise on (Wo, C, bt) tiles (C sublanes, B lanes).

Reference: the maxpool layers of src/model/cnn.lua:15,20,29,38 (their
backward is Torch's SpatialMaxPooling/ReLU updateGradInput pair).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aocr.ops.pallas.tiling import LANE, VMEM_BUDGET

# A/B switch (tools/ab_poolbwd.py): True replaces the pool backward's XLA
# SelectAndScatter with this kernel.  Measured WORSE on v5e (full train
# step best-of-3 alternating: kernel 19.25 vs sas 18.41 ms at B=400) —
# the kernel itself is fast (~0.7 ms for pool1 vs the scatter's 0.71),
# but it breaks the CNN backward's LAYOUT ecosystem: the pallas_call
# forces row-major operands, and XLA materialized four boundary
# transposes as real fusions (~1.4 ms), un-fused the pool FORWARD from
# the conv chains (+0.37), and downgraded the neighboring conv-wgrad
# emitters that had reused the scatter path's transposes (conv6 wgrad
# 1.01 -> 1.29 ms, XposeReuse -> OutputBatchInSublanes).  Third pool
# attack, third loss (docs/performance.md) — the S&S chain is load-
# bearing for the CNN backward's layouts, not a bottleneck.  Default
# stays off; the kernel remains for other hardware generations.
ENABLE = False


def _make_kernel(wh: int, ww: int):
    def kernel(y_ref, dy_ref, dz_ref):
        # y_ref: (1, wh, Wo, ww, C, bt); dy_ref: (1, Wo, C, bt)
        # Compare/select in f32: v5e Mosaic rejects bf16 comparisons
        # ("Target does not support this comparison"), and bf16 -> f32 is
        # exact, so equality/order — and hence the routing — is unchanged.
        f32 = jnp.float32
        out_dtype = dz_ref.dtype
        g = dy_ref[0].astype(f32)
        zero = jnp.zeros_like(g)
        taken = None
        y = [[y_ref[0, i, :, j].astype(f32) for j in range(ww)]
             for i in range(wh)]
        m = None
        for row in y:
            for yij in row:
                m = yij if m is None else jnp.maximum(m, yij)
        for i in range(wh):
            for j in range(ww):
                eq = y[i][j] == m
                first = eq if taken is None else (eq & ~taken)
                taken = eq if taken is None else (taken | eq)
                dz_ref[0, i, :, j] = jnp.where(
                    first & (y[i][j] > 0), g, zero).astype(out_dtype)

    return kernel


def _pick_bt(B: int, slab_bytes_per_row) -> int:
    # One slab per grid step; lanes carry the batch.  Prefer the whole
    # batch when the (doubled-buffered) slabs fit comfortably in VMEM.
    bt = B
    while bt > LANE and 3 * slab_bytes_per_row(bt) > VMEM_BUDGET // 4:
        bt = -(-bt // 2)
        bt = -(-bt // LANE) * LANE
    return bt


@partial(jax.jit, static_argnums=(2, 3), inline=True)
def _relu_pool_bwd_t(yt: jax.Array, dyt: jax.Array,
                     window: Tuple[int, int], interpret: bool):
    """Transposed-view core: yt (H, W, C, B), dyt (Ho, Wo, C, B) ->
    dzt (H, W, C, B)."""
    wh, ww = window
    H, W, C, B = yt.shape
    Ho, Wo = H // wh, W // ww
    y6 = yt.reshape(Ho, wh, Wo, ww, C, B)   # leading-axis split: free
    itemsize = jnp.dtype(yt.dtype).itemsize

    def slab_bytes(bt):
        return (wh * Wo * ww + Wo) * C * bt * itemsize * 2

    bt = _pick_bt(B, slab_bytes)
    grid = (Ho, -(-B // bt))

    dz6 = pl.pallas_call(
        _make_kernel(wh, ww),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, wh, Wo, ww, C, bt),
                         lambda h, b: (h, 0, 0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Wo, C, bt), lambda h, b: (h, 0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wh, Wo, ww, C, bt),
                               lambda h, b: (h, 0, 0, 0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ho, wh, Wo, ww, C, B), yt.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * H * W * C * B,
            bytes_accessed=(2 * H * W + Ho * Wo) * C * B * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(y6, dyt)
    return dz6.reshape(H, W, C, B)


def supported(shape: Tuple[int, ...], window: Tuple[int, int]) -> bool:
    """Divisible spatial dims only; ragged VALID edges keep the XLA path."""
    _B, H, W, _C = shape
    wh, ww = window
    return H % wh == 0 and W % ww == 0


def relu_pool_bwd(y: jax.Array, dy: jax.Array, window: Tuple[int, int],
                  interpret: bool = False) -> jax.Array:
    """Backward of z -> max_pool(relu(z)) from the ReLU output y.

    y: (B, H, W, C) = relu(z) (the pool's input, saved anyway);
    dy: (B, Ho, Wo, C) cotangent of the pooled output.
    Returns dz (B, H, W, C), bit-identical to XLA's
    select_and_scatter + ReLU-VJP composition.
    """
    yt = jnp.transpose(y, (1, 2, 3, 0))     # bitcast under {0,3,2,1}
    dyt = jnp.transpose(dy, (1, 2, 3, 0))
    dzt = _relu_pool_bwd_t(yt, dyt, window, interpret)
    return jnp.transpose(dzt, (3, 0, 1, 2))
