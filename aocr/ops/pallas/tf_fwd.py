"""Pallas kernel for the teacher-forced decoder FORWARD scan.

After the backward recurrence moved into one pallas_call (tf_bwd.py), the
r4 train-step trace showed the forward scan as the largest remaining
off-roofline slice (~2.7 ms/step at B=400, T=11 vs ~1.0 ms roofline):
XLA's while loop re-streams the ~34 MB of gate weights from HBM on every
one of the T sequential steps, materializes the (B, 4H) f32 gate
intermediates per step, and pays loop orchestration for the residual
stacking.  This kernel runs the whole forward recurrence as ONE
`pallas_call` over a (batch-tile, time) grid — the training-forward
mirror of the whole-greedy-loop decode kernel (greedy_loop.py):

  - every weight matrix (layer-0 fused gates, upper layers, W_a, W_c) and
    the attention-context tile load into VMEM once per batch tile and
    stay resident across all T steps (constant index maps)
  - the recurrent state (attn / per-layer c, h) lives in f32 VMEM scratch
    across grid steps (time is the minor, sequential grid axis)
  - the hoisted input projection xp (emb @ Wi[:E] + biases, computed
    batched outside — decoder.teacher_forced) streams in per step
  - the residual stacks the custom-VJP backward consumes (h-tilde, hs,
    gate activations, cell states, alpha, context vectors) are written
    per step, so the backward (tf_bwd.py or the XLA fallback) is
    unchanged

Numerics mirror the XLA scan path op-for-op: matmuls are bf16 x bf16 with
f32 accumulation (the same MXU op the mm.matmul policy emits), the
softmax and gate math run in f32, and residuals are stored in the same
dtypes the XLA collect path produces (h-tilde/alpha f32, the rest in the
compute dtype).  Only the bfloat16 compute path uses this kernel.

Teacher-forced training loop in the reference: per-timestep clones at
src/model/model.lua:553-568 feeding the fused-gate LSTM of
src/model/LSTM.lua:54-105 and the Luong attention of :124-162.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aocr.ops.lstm import gate_math_parts
from aocr.ops.pallas import tiling
from aocr.ops.pallas.tiling import B_TILE, VMEM_BUDGET


# A/B switch (tools/ab_tffwd.py): False routes the forward back to the
# XLA scan while leaving the backward kernel untouched.
ENABLE = True


def _make_kernel(num_layers: int, input_feed: bool, T: int, bt: int,
                 collect: bool):
    def kernel(*refs):
        (ctx_ref, wfh0_ref) = refs[:2]
        rest_refs = refs[2:2 + 3 * (num_layers - 1)]  # (w, bi, bh) triples
        k = 2 + 3 * (num_layers - 1)
        wa_ref, wc_ref, c0_ref, h0_ref, xp_ref = refs[k:k + 5]
        k += 5
        htl_ref = refs[k]
        k += 1
        if collect:
            hs_refs = refs[k:k + num_layers]
            k += num_layers
            ifog_refs = refs[k:k + num_layers]
            k += num_layers
            cs_refs = refs[k:k + num_layers]
            k += num_layers
            alpha_ref, cvec_ref = refs[k:k + 2]
            k += 2
        attn_scr, c_scr, h_scr = refs[k:k + 3]

        t = pl.program_id(1)
        H = h0_ref.shape[-1]
        cd = ctx_ref.dtype
        prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
                else jax.lax.Precision.DEFAULT)
        f32 = jnp.float32

        def dot(x, w_ref):
            return jnp.dot(x, w_ref[:], precision=prec,
                           preferred_element_type=f32)

        @pl.when(t == 0)
        def _():
            attn_scr[:] = jnp.zeros((bt, H), f32)
            c_scr[0] = c0_ref[:].astype(f32)
            h_scr[0] = h0_ref[:].astype(f32)
            for l in range(1, num_layers):
                c_scr[l] = jnp.zeros((bt, H), f32)
                h_scr[l] = jnp.zeros((bt, H), f32)

        # hoisted input projection (bt, 4H), f32 or compute dtype
        # (lstm.XPROJ_COMPUTE_DTYPE); upcast is exact, mirroring the XLA
        # scan body's add-promotion
        xp = xp_ref[0].astype(f32)
        if input_feed:
            ah = jnp.concatenate([attn_scr[:], h_scr[0]], axis=-1).astype(cd)
        else:
            ah = h_scr[0].astype(cd)
        gates = xp + dot(ah, wfh0_ref)
        c, h, ifog4 = gate_math_parts(gates, c_scr[0])
        c_scr[0] = c
        h_scr[0] = h
        cs_l, hs_l, ifog_l = [c], [h], [ifog4]
        x = h
        for l in range(1, num_layers):
            w_ref, bi_ref, bh_ref = rest_refs[3 * (l - 1):3 * l]
            xh = jnp.concatenate([x, h_scr[l]], axis=-1).astype(cd)
            # + bi + bh separately: bit-identical to the XLA scan body
            g = dot(xh, w_ref) + bi_ref[:] + bh_ref[:]
            c, h, ifog4 = gate_math_parts(g, c_scr[l])
            c_scr[l] = c
            h_scr[l] = h
            cs_l.append(c)
            hs_l.append(h)
            ifog_l.append(ifog4)
            x = h

        # ---- Luong attention (same op sequence as decoder.attention) ----
        h_top = x  # (bt, H) f32
        q = dot(h_top.astype(cd), wa_ref).astype(cd)  # query, cast like XLA
        ctx = ctx_ref[:]  # (L, bt, H) resident, compute dtype
        # scores[b,l] = sum_h ctx[l,b,h] * q[b,h]: bf16 products accumulated
        # in f32 — the same contraction the XLA einsum runs on the MXU
        scores = jnp.sum(ctx.astype(f32) * q.astype(f32)[None, :, :],
                         axis=-1).T  # (bt, L), lane-axis softmax below
        alpha = jax.nn.softmax(scores, axis=-1)  # f32
        acd = alpha.astype(cd).astype(f32)  # mirror einsum's bf16 operand
        cvec = jnp.sum(ctx.astype(f32) * acd.T[:, :, None], axis=0)  # (bt,H)
        cat = jnp.concatenate([cvec.astype(cd), h_top.astype(cd)], axis=-1)
        h_tilde = jnp.tanh(dot(cat, wc_ref))  # (bt, H) f32
        attn_scr[:] = h_tilde

        htl_ref[0] = h_tilde
        if collect:
            for l in range(num_layers):
                hs_refs[l][0] = hs_l[l].astype(cd)
                ifog_refs[l][0] = jnp.concatenate(
                    ifog_l[l], axis=-1).astype(cd)
                cs_refs[l][0] = cs_l[l].astype(cd)
            alpha_ref[0] = alpha
            cvec_ref[0] = cvec.astype(cd)

    return kernel


def vmem_bytes(L: int, H: int, T: int, num_layers: int, input_feed: bool,
               itemsize: int, bt: int = B_TILE,
               collect: bool = True) -> int:
    d0 = 2 * H if input_feed else H
    ctx = L * bt * H * itemsize
    weights = (4 * H * d0 + (num_layers - 1) * 4 * H * 2 * H
               + H * 2 * H + H * H) * itemsize + (num_layers - 1) * 8 * H * 4
    stream_in = 2 * bt * 4 * H * 4  # xp f32, double-buffered
    out = 2 * bt * H * 4  # htl f32
    if collect:
        out += 2 * bt * (num_layers * 6 * H * itemsize  # hs+ifog+cs
                         + L * 4 + H * itemsize)        # alpha + cvec
    init = 2 * 2 * bt * H * 4
    scratch = (1 + 2 * num_layers) * bt * H * 4
    return ctx + weights + stream_in + out + init + scratch


def fits(L: int, H: int, num_layers: int, input_feed: bool,
         itemsize: int, T: int) -> bool:
    return (H % 128 == 0
            and vmem_bytes(L, H, T, num_layers, input_feed, itemsize)
            <= VMEM_BUDGET - 16 * 1024 * 1024)


def decoder_fwd_scan(
    ctx_lbh: jax.Array,      # (L, B, H) compute dtype, scan-major
    wfh0: jax.Array,         # (D0, 4H) cd — layer-0 recurrent+feed weights
    rest: Tuple[Tuple[jax.Array, jax.Array, jax.Array], ...],
    #                          per extra layer ((2H, 4H) cd, bi f32, bh f32)
    wa: jax.Array,           # (H, H) cd
    wc: jax.Array,           # (2H, H) cd
    xp: jax.Array,           # (T, B, 4H) hoisted input projections
    #                          (f32, or compute dtype — upcast in-kernel)
    c0: jax.Array,           # (B, H) layer-0 init from encoder finals
    h0: jax.Array,           # (B, H)
    input_feed: bool,
    collect: bool,
    interpret: bool = False,
):
    """Run the whole teacher-forced forward recurrence on-chip.

    collect=False returns h_tildes (T, B, H) f32 only (the primal path);
    collect=True additionally returns the residual stacks the custom-VJP
    backward reads: (h_tildes, hs per layer (cd), ifog per layer (cd),
    cs per layer (cd), alpha (f32), cvec (cd)).
    """
    num_layers = 1 + len(rest)
    L, B0, H = ctx_lbh.shape
    T = xp.shape[0]
    cd = ctx_lbh.dtype
    itemsize = jnp.dtype(cd).itemsize

    bt, _pad = tiling.pick_bt(
        B0,
        lambda b: vmem_bytes(L, H, T, num_layers, input_feed, itemsize, b,
                             collect),
        B_TILE,
    )
    # No explicit padding: Mosaic bounds-limits the ragged final batch
    # block's DMAs and every in-kernel op is row-independent (see the same
    # argument in tf_bwd.decoder_bwd_scan / tests/test_ragged_blocks.py).
    B = B0
    grid = (-(-B // bt), T)

    const = lambda shape: pl.BlockSpec(shape, lambda i, t: (0, 0),
                                       memory_space=pltpu.VMEM)
    step = lambda w, dt=None: pl.BlockSpec(
        (1, bt, w), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM)
    row = lambda w: pl.BlockSpec((bt, w), lambda i, t: (i, 0),
                                 memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((L, bt, H), lambda i, t: (0, i, 0),
                     memory_space=pltpu.VMEM),
        const(wfh0.shape),
    ]
    rest_ops = []
    for (w, bi, bh) in rest:
        bi2 = bi.reshape(1, -1).astype(jnp.float32)
        bh2 = bh.reshape(1, -1).astype(jnp.float32)
        in_specs += [const(w.shape), const(bi2.shape), const(bh2.shape)]
        rest_ops += [w, bi2, bh2]
    in_specs += [const(wa.shape), const(wc.shape), row(H), row(H),
                 step(4 * H)]

    out_specs = [step(H)]
    out_shape = [jax.ShapeDtypeStruct((T, B, H), jnp.float32)]  # h-tilde
    if collect:
        out_specs += [step(H)] * num_layers          # hs
        out_shape += [jax.ShapeDtypeStruct((T, B, H), cd)] * num_layers
        out_specs += [step(4 * H)] * num_layers      # ifog
        out_shape += [jax.ShapeDtypeStruct((T, B, 4 * H), cd)] * num_layers
        out_specs += [step(H)] * num_layers          # cs
        out_shape += [jax.ShapeDtypeStruct((T, B, H), cd)] * num_layers
        out_specs += [step(L), step(H)]              # alpha, cvec
        out_shape += [jax.ShapeDtypeStruct((T, B, L), jnp.float32),
                      jax.ShapeDtypeStruct((T, B, H), cd)]

    kernel = _make_kernel(num_layers, input_feed, T, bt, collect)
    d0 = wfh0.shape[0]
    gate_flops = 2 * B * 4 * H * (d0 + H + (num_layers - 1) * 2 * H)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bt, H), jnp.float32),                # attn carry
            pltpu.VMEM((num_layers, bt, H), jnp.float32),    # c carry
            pltpu.VMEM((num_layers, bt, H), jnp.float32),    # h carry
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET,
        ),
        cost_estimate=pl.CostEstimate(
            flops=T * (gate_flops + 2 * B * H * (3 * H + 2 * L)),
            bytes_accessed=(B * L * H * itemsize
                            + T * B * 4 * H * 4
                            + T * B * (8 * H + L) * itemsize),
            transcendentals=T * B * (5 * num_layers * H + L + H),
        ),
        interpret=interpret,
    )(
        ctx_lbh, wfh0, *rest_ops, wa, wc,
        c0.astype(jnp.float32), h0.astype(jnp.float32), xp,
    )
    htl = outs[0]
    if not collect:
        return htl
    hs = tuple(outs[1:1 + num_layers])
    ifog = tuple(outs[1 + num_layers:1 + 2 * num_layers])
    cs = tuple(outs[1 + 2 * num_layers:1 + 3 * num_layers])
    alpha, cvec = outs[1 + 3 * num_layers:]
    return htl, hs, ifog, cs, alpha, cvec
