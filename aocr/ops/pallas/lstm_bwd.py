"""Pallas kernel for the encoder LSTM backward scan.

Sibling of ops/pallas/tf_bwd.py for the (single-layer, no-attention)
encoder scans: the backward recurrence carries only (dh, dc), reads the
gate-activation / cell-state residuals the forward scan now stacks, and
emits per-step pre-activation gate cotangents; the weight/bias/input
gradients stay outside as batched matmuls (aocr/ops/lstm._scan_custom).

Grid: (batch-tile, time) with the time axis traversed in the transpose
order of the forward scan (a forward encoder scans its backward pass
L-1..0; the reversed encoder 0..L-1) via the BlockSpec index maps.  The
transposed recurrent weight stays VMEM-resident; the (dh, dc) carry
lives in f32 scratch across grid steps; gate-math backward fuses in
registers and the single per-step matmul (dgates @ Wh^T) rides the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aocr.ops.pallas import tiling

from aocr.ops.pallas.tiling import B_TILE, VMEM_BUDGET


def _make_kernel(bt: int):
    def kernel(wht_ref, dhs_ref, ifog_ref, c_ref, cprev_ref,
               dcf_ref, dhf_ref,
               dg_ref, dh0_ref, dc0_ref, dh_scr, dc_scr):
        t = pl.program_id(1)
        H = dhs_ref.shape[-1]
        cd = wht_ref.dtype
        prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
                else jax.lax.Precision.DEFAULT)

        @pl.when(t == 0)
        def _():
            # final-state cotangents seed the carry
            dh_scr[:] = dhf_ref[:].astype(jnp.float32)
            dc_scr[:] = dcf_ref[:].astype(jnp.float32)

        ifog = ifog_ref[0].astype(jnp.float32)  # (bt, 4H)
        i_ = ifog[:, :H]
        f_ = ifog[:, H:2 * H]
        o_ = ifog[:, 2 * H:3 * H]
        g_ = ifog[:, 3 * H:]
        c_t = c_ref[0].astype(jnp.float32)
        cp_t = cprev_ref[0].astype(jnp.float32)
        dh = dh_scr[:] + dhs_ref[0].astype(jnp.float32)
        tc = jnp.tanh(c_t)
        do = dh * tc
        dc = dc_scr[:] + dh * o_ * (1.0 - tc * tc)
        di = dc * g_
        dg = dc * i_
        df = dc * cp_t
        dc_scr[:] = dc * f_
        dgates = jnp.concatenate([
            di * i_ * (1.0 - i_),
            df * f_ * (1.0 - f_),
            do * o_ * (1.0 - o_),
            dg * (1.0 - g_ * g_),
        ], axis=-1)  # (bt, 4H) f32
        dh_scr[:] = jnp.dot(dgates.astype(cd), wht_ref[:], precision=prec,
                            preferred_element_type=jnp.float32)
        dg_ref[0] = dgates.astype(dg_ref.dtype)
        # revisited every t; last write (the earliest timestep) wins
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]

    return kernel


def vmem_bytes(H: int, itemsize: int, bt: int = B_TILE) -> int:
    weights = H * 4 * H * itemsize
    stream = 2 * bt * (4 * H + 4 * H + 3 * H) * itemsize
    finals = 4 * bt * H * 4
    scratch = 2 * bt * H * 4
    return weights + stream + finals + scratch


def fits(H: int, itemsize: int) -> bool:
    return (H % 128 == 0
            and vmem_bytes(H, itemsize) <= VMEM_BUDGET - 16 * 1024 * 1024)


def lstm_bwd_scan(
    wh_t: jax.Array,     # (4H, H) cd — transposed recurrent weights
    dhs: jax.Array,      # (L, B, H) per-step output cotangents (scan-major)
    ifog: jax.Array,     # (L, B, 4H) cd gate activations (scan-major)
    cs: jax.Array,       # (L, B, H) cd cell states
    cprev: jax.Array,    # (L, B, H) cd previous cell states
    dc_f: jax.Array,     # (B, H) final-state cotangents
    dh_f: jax.Array,
    reverse: bool,       # True: the FORWARD scan ran reversed (bw encoder),
                         # so its backward pass walks 0..L-1
    stack_dtype=None,    # dtype of the dgates stack (default: cd)
    interpret: bool = False,
):
    """Returns (dgates (L, B, 4H), dh0 (B, H) f32, dc0 (B, H) f32).

    The dgates stack is emitted in the COMPUTE dtype by default: in bf16
    that halves the kernel's dominant HBM write (L*B*4H) at the cost of
    rounding each per-step gate cotangent to bf16 before the outside
    weight/bias-grad sums — the XLA fallback sums exact f32 (lstm.py),
    so bf16 bias grads drift slightly between the two paths.  This is a
    deliberate perf/precision trade: dgates also feed dx through a bf16
    matmul either way, and bf16 end-to-end training with this kernel
    converges to 100% val accuracy (docs/performance.md).  Pass
    stack_dtype=jnp.float32 to restore exact-f32 accumulation parity."""
    L, B0, H = dhs.shape
    cd = wh_t.dtype
    bt, _pad = tiling.pick_bt(
        B0, lambda b: vmem_bytes(H, jnp.dtype(cd).itemsize, b), B_TILE)
    # No explicit operand padding for a ragged final batch block: the cell
    # math is per-row and the single matmul contracts the feature dim, so
    # Mosaic's own edge handling (bounds-limited DMAs, out-of-range rows
    # undefined on read / dropped on write) is sufficient — see tf_bwd.py.
    B = B0
    grid = (-(-B // bt), L)
    # the backward pass consumes timesteps in the transpose order
    tmap = ((lambda i, t: (t, i, 0)) if reverse
            else (lambda i, t: (L - 1 - t, i, 0)))

    step = lambda w: pl.BlockSpec((1, bt, w), tmap, memory_space=pltpu.VMEM)
    fin = pl.BlockSpec((bt, H), lambda i, t: (i, 0),
                       memory_space=pltpu.VMEM)
    sdt = stack_dtype or cd
    dg, dh0, dc0 = pl.pallas_call(
        _make_kernel(bt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(wh_t.shape, lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            step(H), step(4 * H), step(H), step(H), fin, fin,
        ],
        out_specs=[step(4 * H), fin, fin],
        out_shape=[
            jax.ShapeDtypeStruct((L, B, 4 * H), sdt),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, H), jnp.float32),
            pltpu.VMEM((bt, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET,
        ),
        cost_estimate=pl.CostEstimate(
            flops=L * 2 * B * 4 * H * H,
            bytes_accessed=L * B * 11 * H * jnp.dtype(cd).itemsize,
            transcendentals=L * B * H,
        ),
        interpret=interpret,
    )(wh_t, dhs, ifog, cs, cprev,
      dc_f.astype(jnp.float32), dh_f.astype(jnp.float32))
    return dg, dh0, dc0
