"""Pallas-fused greedy decode tail: attention + projector + freeze + argmax.

One kernel per batch tile computes everything after the LSTM stack in a
greedy decode step (reference per-step path: attention
src/model/LSTM.lua:124-162, projector output_projector.lua:3-8, the
finished-row freeze model.lua:448-449, and the argmax pick):

    q       = h_top @ W_a                       (MXU)
    scores  = sum_h context * q                 (VPU, f32)
    alpha   = softmax_L(scores)                 (VPU, f32)
    ctx     = sum_l alpha * context             (VPU, f32)
    h~      = tanh([ctx ; h_top] @ W_c)         (MXU)
    logits  = h~ @ W_p + b_p                    (MXU, f32 accumulate)
    logp    = log_softmax(logits)               (VPU, f32)
    logp[PAD] := 0 where prev in {PAD, EOS}     (freeze)
    token   = argmax(logp); delta = max(logp)

Why fuse exactly this: the per-step xplane trace (docs/performance.md)
shows attention dominating the decode step despite ~1% of the FLOPs — it
is HBM-bound on the loop-invariant context.  The kernel reads context
ONCE per step (XLA's decomposition materializes q/scores/alpha/ctx/
concat/h~/logits through HBM between fusions), keeps every intermediate
in VMEM, and does the softmax/argmax chain in f32 so near-tie picks are
bit-stable (the r1 opt-in attention kernel's bf16 reduction order could
flip them).

The projector weight is padded to 128 lanes outside the kernel with a
-1e30 bias on the padding, so the padded columns vanish from both the
log-softmax and the argmax.

Weights use constant index maps, so Mosaic keeps them VMEM-resident
across the batch-tile grid instead of re-streaming per tile.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aocr import vocab

from aocr.ops.pallas.tiling import B_TILE, LANE


def _make_kernel(use_trie: bool):
    def kernel(h_ref, ctx_ref, prev_ref, wa_ref, wc_ref, pw_ref, pb_ref,
               *refs):
        # optional trie validity plane rides between the fixed inputs and
        # the three outputs (mirrors beam_step._make_kernel's layout);
        # use_trie is a static closure flag, not ref-count sniffing, so
        # adding a ref can never silently rebind the plane
        valid_ref = refs[0] if use_trie else None
        htld_ref, tok_ref, delta_ref = refs[-3:]
        _kernel_body(h_ref, ctx_ref, prev_ref, wa_ref, wc_ref, pw_ref,
                     pb_ref, valid_ref, htld_ref, tok_ref, delta_ref,
                     use_trie)

    return kernel


def attention_logp_tail(h, context, wa, wc, pw, pb, cd):
    """The Mosaic-critical attention + projector + log-softmax chain,
    shared by ALL FOUR decode kernels (this tail, greedy_loop, beam_step,
    beam_loop) so its invariants — lane-axis softmax transpose (Mosaic
    rejects the sublane-axis broadcast), f32 score chain,
    HIGHEST-precision-for-f32 rule, and the -1e30 projector padding
    contract — live in exactly one place.

    h: (Bt, H) cd/f32; context: (L, Bt, H); wa (H, H), wc (2H, H),
    pw (H, Vp), pb (1, Vp) — values, not refs.
    Returns (h_tilde (Bt, H) f32, logp (Bt, Vp) f32)."""
    prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
            else jax.lax.Precision.DEFAULT)
    q = jnp.dot(h.astype(cd), wa, precision=prec,
                preferred_element_type=jnp.float32)  # (Bt, H) f32
    scores = jnp.sum(context.astype(jnp.float32) * q[None, :, :], axis=-1)
    sb = scores.T  # (Bt, L): reduce along lanes
    m = jnp.max(sb, axis=-1, keepdims=True)
    e = jnp.exp(sb - m)
    alpha = (e / jnp.sum(e, axis=-1, keepdims=True)).T  # (L, Bt)
    ctx = jnp.sum(alpha[:, :, None] * context.astype(jnp.float32), axis=0)
    H = h.shape[-1]
    pre = (
        jnp.dot(ctx.astype(cd), wc[:H], precision=prec,
                preferred_element_type=jnp.float32)
        + jnp.dot(h.astype(cd), wc[H:], precision=prec,
                  preferred_element_type=jnp.float32)
    )
    h_tilde = jnp.tanh(pre)  # (Bt, H) f32
    logits = jnp.dot(h_tilde.astype(cd), pw, precision=prec,
                     preferred_element_type=jnp.float32) + pb
    # log-softmax in f32; padded vocab columns carry a -1e30 bias
    # (pad_projector), so they never win the argmax
    m2 = jnp.max(logits, axis=-1, keepdims=True)
    lse = m2 + jnp.log(jnp.sum(jnp.exp(logits - m2), axis=-1,
                               keepdims=True))
    return h_tilde, logits - lse


def _kernel_body(h_ref, ctx_ref, prev_ref, wa_ref, wc_ref, pw_ref, pb_ref,
                 valid_ref, htld_ref, tok_ref, delta_ref, use_trie):
    h = h_ref[:]  # (Bt, H) bf16/f32, already in the compute dtype
    # context arrives scan-major (L, Bt, H): this is the layout the
    # encoder's lax.scan naturally produces, so requesting it keeps the
    # custom-call boundary from forcing a relayout that un-fuses the
    # encoder's hs-stacking (measured: +1.7 ms/call with (B, L, H)).
    h_tilde, logp = attention_logp_tail(
        h, ctx_ref[:], wa_ref[:], wc_ref[:], pw_ref[:], pb_ref[:],
        h.dtype)
    htld_ref[:] = h_tilde
    if use_trie:
        # XLA gathers the (Bt, Vp) 0/1 validity plane from the dense
        # transition table between steps (the table itself can be
        # Synth90k-huge and stay in HBM); the kernel only applies the
        # mask.  The PAD column's always-valid rule is baked into the
        # plane by the caller, so masking before the freeze rule is
        # order-equivalent to the XLA path (decode.py w_body).
        logp = jnp.where(valid_ref[:] > 0, logp, -1e30)
    prev = prev_ref[:, 0]  # (Bt,) int32
    frozen = (prev == vocab.PAD) | (prev == vocab.EOS)
    col = jax.lax.broadcasted_iota(jnp.int32, logp.shape, 1)
    logp = jnp.where((col == vocab.PAD) & frozen[:, None], 0.0, logp)
    tok_ref[:, 0] = jnp.argmax(logp, axis=-1).astype(jnp.int32)
    delta_ref[:, 0] = jnp.max(logp, axis=-1)


# Lane width the projector/vocab axis pads to.  Default LANE=128 (one full
# vector register); 64 is the "vp=64 packing" A/B from the beam roofline
# accounting (docs/performance.md): vocab=39 fits in half a register, so
# the per-step (bt, K*vp) top-K buffer, its K argmax/mask passes, and the
# trie validity planes all halve their lane footprint.  Every consumer is
# vp-parametric, so flipping this constant re-specializes all four decode
# kernels (tools/ab_vp.py measures it; transcripts must be identical —
# the extra pad columns carry -1e30 and can never win).
PACK_VP = LANE


def pad_projector(pw: jax.Array, pb: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Pad (H, V) projector weight + (V,) bias to PACK_VP lanes; padding
    gets a -1e30 bias so it is invisible to log-softmax and argmax.  Call
    once outside the decode loop."""
    H, V = pw.shape
    vp = ((V + PACK_VP - 1) // PACK_VP) * PACK_VP
    pw_p = jnp.pad(pw, ((0, 0), (0, vp - V)))
    pb_p = jnp.pad(pb.astype(jnp.float32), (0, vp - V),
                   constant_values=-1e30).reshape(1, vp)
    return pw_p, pb_p


def fused_decode_tail(
    h_top: jax.Array,  # (B, H)
    context_lbh: jax.Array,  # (L, B, H) — scan-major; pass
    #   jnp.swapaxes(context, 0, 1): it cancels against the encoder's own
    #   output transpose, so no data actually moves
    prev_tokens: jax.Array,  # (B,) int32
    w_a: jax.Array,  # (H, H)
    w_c: jax.Array,  # (2H, H)
    pw_padded: jax.Array,  # (H, Vp) from pad_projector
    pb_padded: jax.Array,  # (1, Vp) from pad_projector
    interpret: bool = False,
    valid: jax.Array = None,  # optional (B, Vp) 0/1 trie validity plane
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (h_tilde (B, H) f32, tokens (B,) int32, score_delta (B,) f32).

    score_delta is the picked token's log-prob with the freeze rule applied
    (0 for frozen rows), i.e. exactly what the greedy loop adds to its
    cumulative scores.

    `valid` enables dictionary decoding for tries too big for the
    whole-loop kernel's VMEM-resident table (reference -use_dictionary,
    src/model/model.lua:406-514): XLA gathers the current nodes' rows
    from the HBM-resident transition table each step and the kernel
    masks invalid continuations to -1e30 before the argmax.  The caller
    bakes the PAD-always-valid rule into the plane (and omits it at t=1,
    matching the XLA path's no-PAD first step).
    """
    L, B0, H = context_lbh.shape
    pad_rows = (-B0) % B_TILE if B0 > B_TILE else 0
    if B0 < B_TILE:
        bt = B0
    else:
        bt = B_TILE
        if pad_rows:
            h_top = jnp.pad(h_top, ((0, pad_rows), (0, 0)))
            context_lbh = jnp.pad(context_lbh,
                                  ((0, 0), (0, pad_rows), (0, 0)))
            prev_tokens = jnp.pad(prev_tokens, (0, pad_rows))
            if valid is not None:
                valid = jnp.pad(valid, ((0, pad_rows), (0, 0)))
    B = h_top.shape[0]
    vp = pw_padded.shape[1]
    dt = w_a.dtype
    use_trie = valid is not None
    grid = (B // bt,)
    h_tilde, tok, delta = pl.pallas_call(
        _make_kernel(use_trie),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bt, H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * H, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, vp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((bt, vp), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)] if use_trie else []),
        out_specs=[
            pl.BlockSpec((bt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * B * H * H + 4 * B * L * H + 4 * B * H * H
                   + 2 * B * H * vp),
            bytes_accessed=(B * L * H * context_lbh.dtype.itemsize
                            + B * H * 6 + 3 * H * H * dt.itemsize
                            + H * vp * pw_padded.dtype.itemsize
                            + (B * vp * 4 if use_trie else 0)),
            transcendentals=B * (L + H + vp),
        ),
        interpret=interpret,
    )(
        h_top.astype(dt), context_lbh.astype(dt),
        prev_tokens.reshape(-1, 1).astype(jnp.int32),
        w_a, w_c, pw_padded.astype(dt), pb_padded,
        *((valid.astype(jnp.float32),) if use_trie else ()),
    )
    return h_tilde[:B0], tok[:B0, 0], delta[:B0, 0]
