"""Pallas kernel for the teacher-forced decoder BACKWARD scan.

The train step's largest off-roofline slice is the decoder backward loop
(~5.9 ms vs ~2 ms roofline at B=400, T=11 — xplane trace): XLA runs it as
a while loop of many medium ops — gate-math elementwise chains over
(B, 4H) f32 intermediates, per-step attention-context reads from HBM, and
(until the custom VJP hoisted them) weight-grad accumulator
read-modify-writes.  This kernel runs the whole backward recurrence as ONE
`pallas_call` over a (batch-tile, reversed-time) grid:

  - the attention context tile and every (pre-transposed) weight matrix
    load into VMEM once per batch tile and stay resident across all T
    steps (constant index maps)
  - per-step activation stacks (gate activations, cell states, alphas,
    q/h sequences — batched-recomputed OUTSIDE by decoder._tf_core.bwd)
    stream through VMEM blocks with automatic double buffering
  - the cotangent carry (dattn + per-layer dc/dh) lives in f32 VMEM
    scratch across grid steps (the TPU grid is sequential; time is the
    minor grid axis, reversed by the index maps)
  - every gate-math backward chain fuses in registers; the four per-step
    matmuls run on the MXU against the resident transposed weights
  - per-step cotangent stacks (dgates / dh-tilde / dq / dcvec / dscores)
    are written to HBM blocks; the WEIGHT gradients are then four large
    batched matmuls outside the kernel (decoder._tf_core)

Only the bfloat16 compute path uses this kernel (float32 keeps the XLA
scan, which is gradient-exact vs autodiff); activation stacks stream in
bf16, the recurrent carry stays f32.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aocr.ops.pallas import tiling

from aocr.ops.pallas.tiling import B_TILE, VMEM_BUDGET

# When False (default), the kernel consumes the decoder weights in their
# STORED orientation ((D, 4H) etc.) and contracts on axis 1 — Mosaic lowers
# that to tpu.matmul with transpose_rhs, which the MXU streams natively.
# When True, the weights are transposed at the XLA level before the call
# (the r3 behavior): that materialized two (2048, 4096) layout transposes
# per train step, ~0.86 ms/step at B=400 in the trace (tools/ab_tfbwd.py).
PRETRANSPOSE = False


def _make_kernel(num_layers: int, input_feed: bool, T: int, bt: int,
                 pret: bool):
    def kernel(*refs):
        (ctx_ref, wfh0t_ref) = refs[:2]
        rest_t_refs = refs[2:2 + (num_layers - 1)]
        wct_ref, wat_ref = refs[2 + (num_layers - 1):4 + (num_layers - 1)]
        k = 4 + (num_layers - 1)
        dys_ref, htl_ref, alpha_ref = refs[k:k + 3]
        k += 3
        ifog_refs = refs[k:k + num_layers]
        k += num_layers
        c_refs = refs[k:k + num_layers]
        k += num_layers
        cprev_refs = refs[k:k + num_layers]
        k += num_layers
        # outputs
        dg0_ref = refs[k]
        dgl_refs = refs[k + 1:k + num_layers]
        k += num_layers
        dht_ref, dq_ref, dcvec_ref, dscore_ref = refs[k:k + 4]
        dc0f_ref, dh0f_ref = refs[k + 4:k + 6]
        dattn_scr, dc_scr, dh_scr = refs[k + 6:k + 9]

        t = pl.program_id(1)
        H = htl_ref.shape[-1]
        cd = ctx_ref.dtype
        prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
                else jax.lax.Precision.DEFAULT)

        def dotw(x, w_ref):
            """x @ W^T against a weight ref.  pret=True: the ref already
            holds W^T, plain dot.  pret=False: the ref holds the stored
            orientation; contract both operands' axis 1 (tpu.matmul
            transpose_rhs — no materialized transpose anywhere)."""
            if pret:
                return jnp.dot(x, w_ref[:], precision=prec,
                               preferred_element_type=jnp.float32)
            return jax.lax.dot_general(
                x, w_ref[:], (((1,), (1,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32)

        @pl.when(t == 0)
        def _():
            dattn_scr[:] = jnp.zeros((bt, H), jnp.float32)
            for l in range(num_layers):
                dc_scr[l] = jnp.zeros((bt, H), jnp.float32)
                dh_scr[l] = jnp.zeros((bt, H), jnp.float32)

        htl = htl_ref[0].astype(jnp.float32)  # (bt, H)
        dy = dys_ref[0].astype(jnp.float32)
        dht = (dattn_scr[:] + dy) * (1.0 - htl * htl)  # d(pre-tanh)
        dcat = dotw(dht.astype(cd), wct_ref)  # (bt, 2H)
        dcvec = dcat[:, :H]
        dtop = dcat[:, H:]

        ctx = ctx_ref[:]  # (L, bt, H) resident
        alpha = alpha_ref[0].astype(jnp.float32)  # (bt, L)
        # dalpha[b,l] = sum_h ctx[l,b,h] * dcvec[b,h]
        da_lb = jnp.sum(ctx.astype(jnp.float32)
                        * dcvec[None, :, :], axis=-1)  # (L, bt)
        da = da_lb.T  # (bt, L) — lane-axis ops below
        tmp = alpha * da
        dscore = tmp - alpha * jnp.sum(tmp, axis=-1, keepdims=True)
        # dq[b,h] = sum_l dscore[b,l] * ctx[l,b,h]
        dq = jnp.sum(ctx.astype(jnp.float32)
                     * dscore.T[:, :, None], axis=0)  # (bt, H)
        dtop = dtop + dotw(dq.astype(cd), wat_ref)

        dx_above = None
        dgates_by_layer = [None] * num_layers
        for l in range(num_layers - 1, -1, -1):
            ifog = ifog_refs[l][0].astype(jnp.float32)  # (bt, 4H)
            i_ = ifog[:, :H]
            f_ = ifog[:, H:2 * H]
            o_ = ifog[:, 2 * H:3 * H]
            g_ = ifog[:, 3 * H:]
            c_t = c_refs[l][0].astype(jnp.float32)
            cp_t = cprev_refs[l][0].astype(jnp.float32)
            dh_l = dh_scr[l] + (dtop if l == num_layers - 1 else dx_above)
            tc = jnp.tanh(c_t)
            do = dh_l * tc
            dc_l = dc_scr[l] + dh_l * o_ * (1.0 - tc * tc)
            di = dc_l * g_
            dg = dc_l * i_
            df = dc_l * cp_t
            dc_scr[l] = dc_l * f_
            dgates = jnp.concatenate([
                di * i_ * (1.0 - i_),
                df * f_ * (1.0 - f_),
                do * o_ * (1.0 - o_),
                dg * (1.0 - g_ * g_),
            ], axis=-1)  # (bt, 4H) f32
            dgates_by_layer[l] = dgates
            if l > 0:
                dxh = dotw(dgates.astype(cd), rest_t_refs[l - 1])
                dx_above = dxh[:, :H]
                dh_scr[l] = dxh[:, H:]
            else:
                dah = dotw(dgates.astype(cd), wfh0t_ref)
                if input_feed:
                    dattn_scr[:] = dah[:, :H]
                    dh_scr[0] = dah[:, H:]
                else:
                    dattn_scr[:] = jnp.zeros((bt, H), jnp.float32)
                    dh_scr[0] = dah

        dg0_ref[0] = dgates_by_layer[0].astype(dg0_ref.dtype)
        for l in range(1, num_layers):
            dgl_refs[l - 1][0] = dgates_by_layer[l].astype(cd)
        dht_ref[0] = dht.astype(cd)
        dq_ref[0] = dq.astype(cd)
        dcvec_ref[0] = dcvec.astype(cd)
        dscore_ref[0] = dscore
        # final (t = T-1 processes timestep 0) initial-state cotangents;
        # the block is revisited every t, the last write wins
        dc0f_ref[:] = dc_scr[0]
        dh0f_ref[:] = dh_scr[0]

    return kernel


def vmem_bytes(L: int, H: int, T: int, num_layers: int, input_feed: bool,
               itemsize: int, bt: int = B_TILE) -> int:
    d0 = 2 * H if input_feed else H
    ctx = L * bt * H * itemsize
    weights = (4 * H * d0 + (num_layers - 1) * 4 * H * 2 * H
               + H * 2 * H + H * H) * itemsize
    # htl/dys stream f32, ifog/cs/cprev stream in the compute dtype
    stream_in = 2 * bt * ((2 * H + L) * 4
                          + num_layers * 6 * H * itemsize)
    stream_out = 2 * bt * (num_layers * 4 * H * itemsize  # dgates (all cd)
                           + 3 * H * itemsize + L * 4)
    finals = 2 * 2 * bt * H * 4
    scratch = (1 + 2 * num_layers) * bt * H * 4
    return ctx + weights + stream_in + stream_out + finals + scratch


def fits(L: int, H: int, num_layers: int, input_feed: bool,
         itemsize: int, T: int) -> bool:
    return (H % 128 == 0
            and vmem_bytes(L, H, T, num_layers, input_feed, itemsize)
            <= VMEM_BUDGET - 16 * 1024 * 1024)


def decoder_bwd_scan(
    ctx_lbh: jax.Array,      # (L, B, H) compute dtype, scan-major
    wfh0: jax.Array,         # (D0, 4H) cd — layer-0 weights, stored layout
    rest: Tuple[jax.Array, ...],    # per extra layer (2H, 4H) cd
    wc: jax.Array,           # (2H, H) cd
    wa: jax.Array,           # (H, H) cd
    dys: jax.Array,          # (T, B, H) f32 output cotangents
    htl: jax.Array,          # (T, B, H) f32 h_tilde sequence
    alpha: jax.Array,        # (T, B, L) f32
    ifog: Tuple[jax.Array, ...],    # per layer (T, B, 4H) cd activations
    cs: Tuple[jax.Array, ...],      # per layer (T, B, H)
    cprev: Tuple[jax.Array, ...],   # per layer (T, B, H)
    input_feed: bool,
    interpret: bool = False,
):
    """Run the backward recurrence.  Returns (dgates per layer in the
    compute dtype — layer 0 doubles as dxp after a cast — dht, dq, dcvec,
    dscore stacks, and the layer-0 initial-state cotangents (dc0, dh0))."""
    num_layers = len(ifog)
    T, B0, H = htl.shape
    L = ctx_lbh.shape[0]
    cd = ctx_lbh.dtype

    itemsize = jnp.dtype(cd).itemsize
    bt, _pad = tiling.pick_bt(
        B0,
        lambda b: vmem_bytes(L, H, T, num_layers, input_feed, itemsize, b),
        B_TILE,
    )
    # No explicit jnp.pad of the operands: Mosaic bounds-limits the DMAs of
    # a ragged final batch block itself (rows past B0 are undefined on read
    # and dropped on write), and every in-kernel op is row-independent
    # (feature-dim matmul contractions, per-row softmax/attention reduces,
    # per-row scratch), so garbage rows never contaminate real ones.
    # Explicitly padding the five big (T, B, ·) stacks measured ~0.45
    # ms/step of pad/copy HBM traffic at B=400 in the train trace.
    B = B0
    grid = (-(-B // bt), T)

    pret = PRETRANSPOSE
    if pret:
        wfh0 = wfh0.T
        rest = tuple(w.T for w in rest)
        wc, wa = wc.T, wa.T

    const = lambda shape: pl.BlockSpec(shape, lambda i, t: (0, 0),
                                       memory_space=pltpu.VMEM)
    step_in = lambda w: pl.BlockSpec(
        (1, bt, w), lambda i, t: (T - 1 - t, i, 0), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((L, bt, H), lambda i, t: (0, i, 0),
                     memory_space=pltpu.VMEM),
        const(wfh0.shape),
    ]
    in_specs += [const(w.shape) for w in rest]
    in_specs += [const(wc.shape), const(wa.shape)]
    in_specs += [step_in(H), step_in(H), step_in(L)]
    in_specs += [step_in(4 * H)] * num_layers
    in_specs += [step_in(H)] * (2 * num_layers)

    out_specs = [step_in(4 * H)]                       # dgates0
    out_specs += [step_in(4 * H)] * (num_layers - 1)   # dgates_l
    out_specs += [step_in(H), step_in(H), step_in(H), step_in(L)]
    out_specs += [pl.BlockSpec((bt, H), lambda i, t: (i, 0),
                               memory_space=pltpu.VMEM)] * 2
    # dgates0 streams in the compute dtype too: its f32 (T, B, 4H) form
    # cost a ~1.4 ms/step layout-conversion of the padded 92 MB stack at
    # the kernel boundary; consumers cast (dxp) or use cd directly (dWfh0)
    out_shape = [jax.ShapeDtypeStruct((T, B, 4 * H), cd)]
    out_shape += [jax.ShapeDtypeStruct((T, B, 4 * H), cd)
                  for _ in range(num_layers - 1)]
    out_shape += [jax.ShapeDtypeStruct((T, B, H), cd)] * 3
    out_shape += [jax.ShapeDtypeStruct((T, B, L), jnp.float32)]
    out_shape += [jax.ShapeDtypeStruct((B, H), jnp.float32)] * 2

    kernel = _make_kernel(num_layers, input_feed, T, bt, pret)
    d0 = wfh0.shape[1] if pret else wfh0.shape[0]
    gate_flops = 2 * B * 4 * H * (d0 + (num_layers - 1) * 2 * H)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bt, H), jnp.float32),               # dattn carry
            pltpu.VMEM((num_layers, bt, H), jnp.float32),    # dc carry
            pltpu.VMEM((num_layers, bt, H), jnp.float32),    # dh carry
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET,
        ),
        cost_estimate=pl.CostEstimate(
            flops=T * (gate_flops + 2 * B * H * (3 * H + 2 * L)),
            bytes_accessed=(B * L * H * ctx_lbh.dtype.itemsize
                            + T * B * (12 * H + 2 * L)
                            * ctx_lbh.dtype.itemsize),
            transcendentals=T * B * num_layers * H,
        ),
        interpret=interpret,
    )(
        ctx_lbh, wfh0, *rest, wc, wa,
        dys, htl, alpha, *ifog, *cs, *cprev,
    )
    dg0 = outs[0]
    dgl = tuple(outs[1:num_layers])
    dht, dq, dcvec, dscore = outs[num_layers:num_layers + 4]
    dc0f, dh0f = outs[num_layers + 4:num_layers + 6]
    return dg0, dgl, dht, dq, dcvec, dscore, dc0f, dh0f
