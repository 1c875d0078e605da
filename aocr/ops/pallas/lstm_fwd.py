"""Pallas kernel for the encoder LSTM FORWARD scans.

The r4 train-step trace (after the decoder forward moved into
ops/pallas/tf_fwd.py) showed the two encoder-direction forward while
loops at ~0.6 ms/step of loop self-time plus ~0.36 ms of per-step gate
fusions at B=400 — each of the 24 sequential steps re-reads the (H, 4H)
recurrent weights and materializes a (B, 4H) f32 gate intermediate.
This kernel runs one whole direction as ONE `pallas_call` over a
(batch-tile, time) grid, the encoder sibling of tf_fwd.py:

  - the recurrent weight matrix stays VMEM-resident across all L steps
  - (c, h) carry in f32 VMEM scratch; the hoisted input projection
    (lstm._proj_input / _bidir_proj) streams in per step
  - the residual stacks the custom-VJP backward consumes (gate
    activations + cell states, compute dtype — lstm._bwd_recurrence)
    are written in-kernel, plus the f32 h stack and final (c, h)

Numerics mirror lstm._collect_from_proj op-for-op (bf16 x bf16 matmul
with f32 accumulation, gate math in f32); `reverse` is an index-map
remap, so the reversed direction runs the same kernel on flipped rows.
Only the bfloat16 compute path routes here (float32 keeps the XLA scan).

Reference encoder recurrences: src/model/model.lua:292-316 over the
fused-gate cell of src/model/LSTM.lua:79-105.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aocr.ops import lstm as lstm_mod
from aocr.ops.lstm import gate_math_parts
from aocr.ops.pallas import tiling
from aocr.ops.pallas.tiling import B_TILE, VMEM_BUDGET

# A/B switch (tools/ab_lstmfwd.py): False routes the encoder forward back
# to the XLA scan while leaving the backward kernel untouched.
ENABLE = True


def _make_kernel(T: int, bt: int, collect: bool):
    def kernel(*refs):
        wh_ref, c0_ref, h0_ref, xp_ref = refs[:4]
        k = 4
        hs_ref, cf_ref, hf_ref = refs[k:k + 3]
        k += 3
        if collect:
            ifog_ref, cs_ref = refs[k:k + 2]
            k += 2
        c_scr, h_scr = refs[k:k + 2]

        t = pl.program_id(1)
        cd = wh_ref.dtype
        prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
                else jax.lax.Precision.DEFAULT)
        f32 = jnp.float32

        @pl.when(t == 0)
        def _():
            c_scr[:] = c0_ref[:].astype(f32)
            h_scr[:] = h0_ref[:].astype(f32)

        # hoisted input projection (bt, 4H), f32 or compute dtype
        # (lstm.XPROJ_COMPUTE_DTYPE); upcast is exact, mirroring the XLA
        # scan body's add-promotion
        xp = xp_ref[0].astype(f32)
        gates = xp + jnp.dot(h_scr[:].astype(cd), wh_ref[:], precision=prec,
                             preferred_element_type=f32)
        c, h, ifog4 = gate_math_parts(gates, c_scr[:])
        c_scr[:] = c
        h_scr[:] = h
        hs_ref[0] = h.astype(hs_ref.dtype)  # f32, or cd (HSTACK_COMPUTE_DTYPE)
        if collect:
            ifog_ref[0] = jnp.concatenate(ifog4, axis=-1).astype(cd)
            cs_ref[0] = c.astype(cd)
        # revisited every t; the last grid step's write is the final state
        cf_ref[:] = c
        hf_ref[:] = h

    return kernel


def vmem_bytes(H: int, itemsize: int, bt: int = B_TILE,
               collect: bool = True) -> int:
    weights = H * 4 * H * itemsize
    stream_in = 2 * bt * 4 * H * 4  # xp f32, double-buffered
    out = 2 * bt * H * 4  # hs f32
    if collect:
        out += 2 * bt * 5 * H * itemsize  # ifog + cs
    init = 2 * 2 * bt * H * 4
    finals = 2 * 2 * bt * H * 4
    scratch = 2 * bt * H * 4
    return weights + stream_in + out + init + finals + scratch


def fits(H: int, itemsize: int) -> bool:
    return (H % 128 == 0
            and vmem_bytes(H, itemsize) <= VMEM_BUDGET - 16 * 1024 * 1024)


def lstm_fwd_scan(
    wh: jax.Array,        # (H, 4H) cd — recurrent weights, stored layout
    x_proj: jax.Array,    # (L, B, 4H) hoisted input projections (f32 or cd)
    c0: jax.Array,        # (B, H)
    h0: jax.Array,        # (B, H)
    reverse: bool,
    collect: bool,
    interpret: bool = False,
):
    """Run one encoder direction's whole forward recurrence on-chip.

    Returns (hs (L, B, H) f32 scan-major, (c_f, h_f) f32) —
    plus (ifog (L, B, 4H) cd, cs (L, B, H) cd) when collect=True —
    matching lstm._collect_from_proj's stacks before its swapaxes.
    """
    L, B0, G = x_proj.shape
    H = G // 4
    cd = wh.dtype
    itemsize = jnp.dtype(cd).itemsize

    bt, _pad = tiling.pick_bt(
        B0, lambda b: vmem_bytes(H, itemsize, b, collect), B_TILE)
    # Ragged final batch block: Mosaic bounds-limits the edge DMAs and all
    # in-kernel math is row-independent (same argument as tf_bwd/tf_fwd).
    B = B0
    grid = (-(-B // bt), L)

    if reverse:
        step = lambda w: pl.BlockSpec(
            (1, bt, w), lambda i, t: (L - 1 - t, i, 0),
            memory_space=pltpu.VMEM)
    else:
        step = lambda w: pl.BlockSpec(
            (1, bt, w), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM)
    row = lambda w: pl.BlockSpec((bt, w), lambda i, t: (i, 0),
                                 memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(wh.shape, lambda i, t: (0, 0),
                     memory_space=pltpu.VMEM),
        row(H), row(H), step(4 * H),
    ]
    hs_dtype = (cd if (lstm_mod.HSTACK_COMPUTE_DTYPE
                       and cd != jnp.float32) else jnp.float32)
    out_specs = [step(H), row(H), row(H)]
    out_shape = [jax.ShapeDtypeStruct((L, B, H), hs_dtype),
                 jax.ShapeDtypeStruct((B, H), jnp.float32),
                 jax.ShapeDtypeStruct((B, H), jnp.float32)]
    if collect:
        out_specs += [step(4 * H), step(H)]
        out_shape += [jax.ShapeDtypeStruct((L, B, 4 * H), cd),
                      jax.ShapeDtypeStruct((L, B, H), cd)]

    kernel = _make_kernel(L, bt, collect)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bt, H), jnp.float32),  # c carry
            pltpu.VMEM((bt, H), jnp.float32),  # h carry
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * B * H * 4 * H,
            bytes_accessed=(L * B * 4 * H * 4 + L * B * H * 4
                            + L * B * 5 * H * itemsize * (1 if collect
                                                          else 0)),
            transcendentals=5 * L * B * H,
        ),
        interpret=interpret,
    )(wh, c0.astype(jnp.float32), h0.astype(jnp.float32), x_proj)
    hs, cf, hf = outs[:3]
    if not collect:
        return hs, (cf, hf)
    return hs, (cf, hf), (outs[3], outs[4])
