"""Pallas kernels fusing conv1 + bias + ReLU + max-pool-2x2 (fwd and bwd).

The r5 train-step trace at B=400 showed the conv1 COMPLEX costing ~2.2
ms/step for a layer with ~0.015 ms of MXU FLOPs — the largest off-roofline
block left in training (docs/performance.md "train-step roofline"):

  - forward conv1 fusion writes the 164 MB pre-pool (B,32,W,64) activation
    (0.59 ms) that pool1 immediately re-reads and shrinks 4x
  - pool1 backward runs XLA's select_and_scatter over it (0.75 ms)
  - the conv1 ReLU mask is bit-packed into u32s (0.30 ms) for the VJP
  - the bias grad re-reads the cotangent (0.28 ms), conv1 wgrad again

All of that traffic exists only because the 164 MB intermediate is
materialized.  These kernels never materialize it.  conv1 has ONE input
channel, so a 2x2 output cell (4 pre-pool pixels x 64 channels) depends on
just a 4x4 patch of the padded input — 16 taps.  With the kernel weights
scattered per pool position into W16 (16, 4*64):

  forward:  y_j = W16^T @ X16[:, j, :]     per cell row, f32 accumulation
            out[j, c, b] = relu(max_p y[p*64+c, b] + b[c])
  backward: recompute y, route dy to the FIRST pool position attaining the
            max (row-major window order — XLA's GE-select semantics), zero
            unless the winner's ReLU output is positive; then
            dW16 += dy_routed @ X16^T and db += sum(dy_masked), both
            accumulated across the grid in f32.

LAYOUT is the whole game (the first cut of these kernels was itself fast —
fwd 0.15 ms, bwd 0.38 ms — but lost its win to ~3 ms of XLA boundary glue:
a channel-major output forced a real transpose to conv2's layout, and
(…, 50)-minor patch arrays forced lane-padded retiling copies).  This
version keeps the BATCH on lanes end to end, matching how XLA already lays
these activations out (bf16[B,H,W,C]{0,3,2,1} — see pool_bwd.py):

  - patches are built as (16, Ho*Wo, B): the input transpose to (H, W, B)
    is a bitcast under x's {0,3,2,1} layout, the 16 tap slices are
    leading-axis stride-2 slices, and the final reshape merges adjacent
    leading dims — no lane-dim padding anywhere
  - the forward output block is (m, 64, B), whose full array reshapes to
    (Ho, Wo, 64, B) — exactly the PHYSICAL layout of the logical
    (B, Ho, Wo, 64) activation conv2 consumes — so the boundary transpose
    is a bitcast, and the backward receives dy in the same free layout

dx (the input-image cotangent) is a SEPARATE pallas_call (`_dx_call`) so
XLA dead-code-eliminates it in training, where images are never
differentiated.

Numerics: the dot accumulates in f32 and is rounded to the compute dtype
before the bias add, mirroring the XLA path (conv custom-call emits bf16,
bias adds in bf16); compare/max run on the f32 images of those bf16 values
(exact — v5e Mosaic rejects bf16 comparisons).  Pool routing is
bit-identical to select_and_scatter + ReLU-VJP composition by the argument
in pool_bwd.py (first-match on relu'd values == first-match on pre-bias
scores when the max is positive; everything masked to zero otherwise).

Reference: conv1+pool1 of src/model/cnn.lua:13-16 (cudnn
SpatialConvolution(1,64,3,3,1,1,1,1) + ReLU + SpatialMaxPooling(2,2,2,2));
their backward is cudnn's conv wgrad + MaxPooling/ReLU updateGradInput.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aocr.ops.pallas.tiling import LANE, VMEM_BUDGET

# A/B switch (tools/ab_conv1.py): False restores the XLA conv + bias +
# relu + reduce_window/select_and_scatter path in cnn.apply.
ENABLE = True

# Cell rows per block (the in-kernel unrolled loop length) and the lane
# cap per block.  m = Ho*Wo is always a multiple of MT for even widths
# (Ho = 16 fixed by the 32-px input height).
MT = 40
BT_MAX = 512

# Pool positions in row-major window order — the order select_and_scatter
# resolves ties in, which the backward's first-match routing must copy.
_POSITIONS = ((0, 0), (0, 1), (1, 0), (1, 1))


def supported(shape, window=(2, 2), kh=3, kw=3, padding="SAME") -> bool:
    """This kernel handles exactly the reference conv1 geometry: 3x3 SAME
    conv on a single input channel followed by a 2x2/2 max pool on even
    spatial dims (odd widths keep the XLA path, like pool_bwd), and only
    when a Mosaic-legal cell-row block exists (`_pick_mt` > 0)."""
    _B, H, W, C = shape
    return (C == 1 and kh == 3 and kw == 3 and padding == "SAME"
            and window == (2, 2) and H % 2 == 0 and W % 2 == 0
            and _pick_mt((H // 2) * (W // 2)) > 0)


def _pick_mt(m: int) -> int:
    """Largest divisor of m up to MT (the in-kernel unrolled loop length)
    that Mosaic accepts as the x-block's sublane axis: divisible by 8, or
    the whole axis (mt == m).  m = Ho*Wo = 16*Wo at the reference height,
    so a multiple-of-8 divisor always exists (16); exactly MT=40 at the
    W=100 default.  Returns 0 if no legal block exists (caller gates).

    Regression note: the plain largest-divisor rule picked mt=36 at the
    ladder width W=36 (m=288) — Mosaic rejects a (16, 36, bt) block
    ("last two dimensions ... divisible by 8 and 128") at compile time
    on hardware; interpret-mode tests don't enforce that constraint."""
    for mt in range(min(MT, m), 0, -1):
        if m % mt == 0 and (mt % 8 == 0 or mt == m):
            return mt
    return 0


def _patches(x: jax.Array, bp: int) -> jax.Array:
    """x (B, H, W) -> X16 (16, Ho*Wo, bp): tap (a, b) of output cell
    (h, w) is pad1(x)[2h+a, 2w+b], a,b in 0..3 (the 4x4 input patch
    feeding the cell's four pre-pool pixels).  Batch rides the lane axis
    throughout (zero-padded to bp); every step is a bitcast, a pad, or a
    leading-axis slice under the {0,3,2,1} activation layout."""
    B, H, W = x.shape
    xt = jnp.transpose(x, (1, 2, 0))  # (H, W, B): bitcast under {0,2,1}
    xp = jnp.pad(xt, ((1, 1), (1, 1), (0, bp - B)))
    taps = [xp[a:a + H:2, b:b + W:2] for a in range(4) for b in range(4)]
    return jnp.stack(taps).reshape(16, (H // 2) * (W // 2), bp)


def _w16(w: jax.Array, dtype) -> jax.Array:
    """w (3, 3, 1, 64) -> W16 (16, 256): column p*64+c holds the weights
    the pre-pool pixel at pool position p applies to the 16 patch taps
    (w[a-pi, b-pj, 0, c] at tap (a, b), zero outside the 3x3 support)."""
    w = w.reshape(3, 3, -1)
    cols = [jnp.pad(w, ((pi, 1 - pi), (pj, 1 - pj), (0, 0))).reshape(16, -1)
            for (pi, pj) in _POSITIONS]
    return jnp.concatenate(cols, axis=1).astype(dtype)


def _prec(dtype):
    # same policy as ops/mm.py: f32 contractions must not lower through
    # bf16 passes (DEFAULT precision does on TPU)
    return (lax.Precision.HIGHEST if dtype == jnp.float32
            else lax.Precision.DEFAULT)


def _scores(xj, w16_ref, b2_ref, cd):
    """Shared fwd/bwd math for one cell row: the four pre-pool (64, bt)
    score planes, in f32 images of the compute-dtype values the XLA path
    compares."""
    f32 = jnp.float32
    y = lax.dot_general(
        w16_ref[:], xj, (((0,), (0,)), ((), ())),
        precision=_prec(xj.dtype),
        preferred_element_type=f32,
    )  # (256, bt) f32 accum
    C = b2_ref.shape[0]
    b = b2_ref[:].astype(cd).astype(f32)
    # conv output rounds to the compute dtype before the bias add (exactly
    # the XLA path: conv custom-call emits cd, _bias_add adds in cd)
    return [
        (y[p * C:(p + 1) * C].astype(cd).astype(f32) + b).astype(cd)
        .astype(f32)
        for p in range(4)
    ]


def _fwd_kernel(xb_ref, w16_ref, b2_ref, out_ref):
    cd = out_ref.dtype
    for j in range(xb_ref.shape[1]):
        z = _scores(xb_ref[:, j, :], w16_ref, b2_ref, cd)
        m = jnp.maximum(jnp.maximum(z[0], z[1]), jnp.maximum(z[2], z[3]))
        out_ref[j] = jnp.maximum(m, 0.0).astype(cd)


def _routed(xj, w16_ref, b2_ref, dyj, cd):
    """Recompute one cell row's scores and route the pooled cotangent:
    returns (dcat (256, bt) cd, dmask (64, bt) f32)."""
    f32 = jnp.float32
    z = _scores(xj, w16_ref, b2_ref, cd)
    m = jnp.maximum(jnp.maximum(z[0], z[1]), jnp.maximum(z[2], z[3]))
    g = dyj.astype(f32)
    dmask = jnp.where(m > 0.0, g, 0.0)
    parts = []
    taken = None
    for p in range(4):
        eq = z[p] == m
        first = eq if taken is None else (eq & ~taken)
        taken = eq if taken is None else (taken | eq)
        parts.append(jnp.where(first, dmask, 0.0).astype(cd))
    return jnp.concatenate(parts, axis=0), dmask


def _bwd_kernel(xb_ref, w16_ref, b2_ref, dy_ref, dw_ref, db_ref):
    first_step = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    cd = dy_ref.dtype
    f32 = jnp.float32
    dw = jnp.zeros((256, 16), f32)
    db = jnp.zeros((64, 1), f32)
    for j in range(xb_ref.shape[1]):
        xj = xb_ref[:, j, :]
        dcat, dmask = _routed(xj, w16_ref, b2_ref, dy_ref[j], cd)
        dw = dw + lax.dot_general(
            dcat, xj, (((1,), (1,)), ((), ())),
            precision=_prec(xj.dtype),
            preferred_element_type=f32,
        )
        db = db + jnp.sum(dmask, axis=1, keepdims=True)

    @pl.when(first_step)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dw_ref[:] += dw
    db_ref[:] += db


def _dx_kernel(xb_ref, w16_ref, b2_ref, dy_ref, dxp_ref):
    cd = dy_ref.dtype
    for j in range(xb_ref.shape[1]):
        dcat, _ = _routed(xb_ref[:, j, :], w16_ref, b2_ref, dy_ref[j], cd)
        dxp_ref[:, j, :] = lax.dot_general(
            w16_ref[:], dcat.astype(w16_ref.dtype), (((1,), (0,)), ((), ())),
            precision=_prec(w16_ref.dtype),
            preferred_element_type=jnp.float32,
        ).astype(dxp_ref.dtype)  # (16, bt)


def _grid_specs(m, bp):
    bt = min(bp, BT_MAX)
    mt = _pick_mt(m)
    grid = (m // mt, bp // bt)
    x_spec = pl.BlockSpec((16, mt, bt), lambda i, j: (0, i, j),
                          memory_space=pltpu.VMEM)
    dy_spec = pl.BlockSpec((mt, 64, bt), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    const = lambda s: pl.BlockSpec(s, lambda i, j: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    return grid, bt, x_spec, dy_spec, const


def _fwd_call(x16, w16, b2, cd, interpret):
    _, m, bp = x16.shape
    grid, bt, x_spec, dy_spec, const = _grid_specs(m, bp)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[x_spec, const((16, 256)), const((64, 1))],
        out_specs=dy_spec,
        out_shape=jax.ShapeDtypeStruct((m, 64, bp), cd),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET),
        cost_estimate=pl.CostEstimate(
            flops=2 * 256 * 16 * m * bp,
            bytes_accessed=(16 + 64) * m * bp * 2 + 16 * 256 * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x16, w16, b2)


def _bwd_call(x16, w16, b2, dy3, interpret):
    _, m, bp = x16.shape
    grid, bt, x_spec, dy_spec, const = _grid_specs(m, bp)
    acc = lambda s: pl.BlockSpec(s, lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[x_spec, const((16, 256)), const((64, 1)), dy_spec],
        out_specs=[acc((256, 16)), acc((64, 1))],
        out_shape=[jax.ShapeDtypeStruct((256, 16), jnp.float32),
                   jax.ShapeDtypeStruct((64, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 256 * 16 * m * bp,
            bytes_accessed=(16 + 64) * m * bp * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x16, w16, b2, dy3)


def _dx_call(x16, w16, b2, dy3, interpret):
    _, m, bp = x16.shape
    grid, bt, x_spec, dy_spec, const = _grid_specs(m, bp)
    return pl.pallas_call(
        _dx_kernel,
        grid=grid,
        in_specs=[x_spec, const((16, 256)), const((64, 1)), dy_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((16, m, bp), x16.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 256 * 16 * m * bp,
            bytes_accessed=2 * (16 + 64) * m * bp * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x16, w16, b2, dy3)


def _unpatch(dx16: jax.Array, B: int, H: int, W: int) -> jax.Array:
    """Adjoint of _patches: scatter-add the 16 tap planes back onto the
    padded (H+2, W+2, B) image and crop (test-only path; DCE'd in
    training)."""
    taps = dx16.reshape(4, 4, H // 2, W // 2, dx16.shape[-1])
    dxp = jnp.zeros((H + 2, W + 2, dx16.shape[-1]), dx16.dtype)
    for a in range(4):
        for b in range(4):
            dxp = dxp.at[a:a + H:2, b:b + W:2].add(taps[a, b])
    return jnp.transpose(dxp[1:H + 1, 1:W + 1, :B], (2, 0, 1))


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv1_relu_pool(x, w, b, interpret=False):
    """max_pool_2x2(relu(conv3x3_same(x, w) + b)) for 1-channel x.

    x (B, H, W, 1) compute dtype; w (3, 3, 1, 64) f32; b (64,) f32.
    Returns (B, H/2, W/2, 64) in x's dtype.
    """
    out, _ = _fwd_res(x, w, b, interpret)
    return out


def _fwd_res(x, w, b, interpret):
    B, H, W, _ = x.shape
    cd = x.dtype
    bp = -(-B // LANE) * LANE
    x16 = _patches(x[..., 0], bp)
    w16 = _w16(w, cd)
    b2 = b.reshape(-1, 1).astype(jnp.float32)
    out = _fwd_call(x16, w16, b2, cd, interpret)
    # (m, 64, bp) -> logical (B, Ho, Wo, 64): the physical order already
    # matches the {0,3,2,1} layout conv2 consumes, so this is a bitcast
    out = out.reshape(H // 2, W // 2, 64, bp)
    return jnp.transpose(out, (3, 0, 1, 2))[:B], (x16, w16, b2)


def _vjp_fwd(x, w, b, interpret):
    out, res = _fwd_res(x, w, b, interpret)
    return out, (res, x.shape)


def _fold_dw16(dw16: jax.Array) -> jax.Array:
    """(256, 16) -> (3, 3, 1, 64): w[i,j,0,c] accumulates position p's
    column at tap (i+pi, j+pj) — the adjoint of _w16's padding."""
    d = dw16.reshape(4, 64, 4, 4)  # (p, c, a, b)
    parts = []
    for p, (pi, pj) in enumerate(_POSITIONS):
        parts.append(d[p, :, pi:pi + 3, pj:pj + 3])
    return jnp.sum(jnp.stack(parts), axis=0).transpose(1, 2, 0)[:, :, None, :]


def _vjp_bwd(interpret, carry, dy):
    (x16, w16, b2), x_shape = carry
    B, H, W, _ = x_shape
    cd = dy.dtype
    bp = x16.shape[-1]
    # (B, Ho, Wo, 64) -> (m, 64, bp): bitcast transpose + zero lane pad
    dy3 = jnp.pad(jnp.transpose(dy, (1, 2, 3, 0)),
                  ((0, 0), (0, 0), (0, 0), (0, bp - B))
                  ).reshape((H // 2) * (W // 2), 64, bp)
    dw16, db2 = _bwd_call(x16, w16, b2, dy3, interpret)
    dw = _fold_dw16(dw16)
    # dx is a separate pallas_call: dead-code-eliminated when the caller
    # does not differentiate the images (training differentiates params
    # only), computed for real under jax.grad-wrt-x (tests).
    dx16 = _dx_call(x16, w16, b2, dy3, interpret)
    dx = _unpatch(dx16, B, H, W).astype(cd)[..., None]
    return dx, dw, db2[:, 0]


conv1_relu_pool.defvjp(_vjp_fwd, _vjp_bwd)
