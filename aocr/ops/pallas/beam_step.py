"""Pallas-fused beam-search step tail: grouped attention + projector +
freeze + score accumulation + top-K, one kernel per batch tile.

The beam loop's per-step cost splits into the (B*K)-row LSTM matmuls
(MXU-bound, already at roofline in XLA) and everything after them:
grouped attention (reference replicates the context per beam,
model.lua:322-359; here it stays (B, L, H)), the projector + log-softmax
(output_projector.lua:3-8), the finished-beam freeze (model.lua:448-449),
the score broadcast-add, and the top-K over K*V candidates
(model.lua:450-452).  XLA materializes each of those intermediates
through HBM and re-reads the context twice per step; this kernel computes
the whole tail with the context read ONCE per tile and every
intermediate in VMEM, and returns exactly what the XLA decomposition
feeds the beam bookkeeping: (h_tilde, new_scores, parents, tokens).

Layout trick: the (B*K, H) top hidden state is row-major identical to
(B, K*H), so the kernel consumes K*H-wide rows aligned with the batch
tiling — no transpose or replication at the boundary — and slices beam k
as lanes [k*H:(k+1)*H].  h_tilde is returned in the same packed layout.

Top-K runs as K iterative argmax+mask passes over the (Bt, K*Vp) total
buffer in f32 — identical selection (including first-index tie-breaks)
to lax.top_k.  Projector padding columns carry a -1e30 bias so they can
never be selected.

Trie-constrained decoding (r3): the XLA side gathers the per-beam
validity mask (child_ok from the dense transition table — a cheap (B, K)
row gather) and passes it in as a (B, K*Vp) 0/1 plane; the kernel applies
it before the top-K and implements the reference's refill semantics
in-place (fewer than K valid candidates -> duplicate the best one,
model.lua:421-436,489-499), returning the per-row valid-candidate count
for the refill warning bookkeeping.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aocr import vocab
from aocr.ops.pallas.decode_step import attention_logp_tail
from aocr.ops.pallas.tiling import B_TILE, LANE, VMEM_BUDGET


def fits_vmem(L: int, H: int, K: int, V: int, itemsize: int,
              use_trie: bool = False) -> bool:
    """Whether the fused beam tail fits the VMEM budget for this shape.

    The accounting below sums the obvious buffers; Mosaic's real scoped
    allocation measured ~2x it (L=79/K=5 needed 101.8 MB where these terms
    sum to 52 MB — pipelining double-buffers the outputs and f32 staging
    too), so the gate doubles the estimate and keeps a 16 MB margin.
    Shapes that fail here (wide-aspect contexts) use the XLA tail instead
    of failing VMEM allocation at compile time."""
    vp = ((V + LANE - 1) // LANE) * LANE
    est = (
        2 * L * B_TILE * H * itemsize           # context (double-buffered)
        + B_TILE * K * H * (itemsize + 4)        # h_top in, h_tilde out
        + 3 * H * H * itemsize + H * vp * itemsize  # weights
        + B_TILE * K * vp * 4                    # top-K buffer
        # trie validity plane input (f32, i-dependent => double-buffered
        # by the same 2x calibration below) + the small per-row blocks
        + (B_TILE * K * vp * 4 if use_trie else 0)
        + 6 * B_TILE * K * 4
    )
    return 2 * est <= VMEM_BUDGET - 16 * 1024 * 1024


def _make_kernel(K: int, V: int, use_trie: bool = False):
    def kernel(*refs):
        (ctx_ref, h_ref, prev_ref, sc_ref, wa_ref, wc_ref, pw_ref,
         pb_ref) = refs[:8]
        k = 8
        valid_ref = None
        if use_trie:
            valid_ref = refs[k]
            k += 1
        htld_ref, nsc_ref, par_ref, tok_ref = refs[k:k + 4]
        k += 4
        nvalid_ref = None
        if use_trie:
            nvalid_ref = refs[k]
            k += 1
        buf_ref = refs[k]
        H = wa_ref.shape[0]
        vp = pw_ref.shape[-1]
        bt = h_ref.shape[0]
        cd = wa_ref.dtype
        context = ctx_ref[:]  # (L, bt, H) — read once, reused by all K beams
        col_v = jax.lax.broadcasted_iota(jnp.int32, (bt, vp), 1)
        for k in range(K):
            h = h_ref[:, k * H:(k + 1) * H]  # (bt, H)
            h_tilde, logp = attention_logp_tail(
                h, context, wa_ref[:], wc_ref[:], pw_ref[:], pb_ref[:], cd)
            htld_ref[:, k * H:(k + 1) * H] = h_tilde
            prev_k = prev_ref[:, k:k + 1]  # (bt, 1)
            frozen = (prev_k == vocab.PAD) | (prev_k == vocab.EOS)
            logp = jnp.where((col_v == vocab.PAD) & frozen, 0.0, logp)
            total_k = sc_ref[:, k:k + 1] + logp
            if use_trie:
                ok = valid_ref[:, k * vp:(k + 1) * vp]
                total_k = jnp.where(ok > 0.0, total_k, jnp.float32(-1e30))
            buf_ref[:, k * vp:(k + 1) * vp] = total_k

        # iterative top-K over (bt, K*vp): argmax + mask, K passes —
        # same first-index tie-break as lax.top_k
        col_kv = jax.lax.broadcasted_iota(jnp.int32, (bt, K * vp), 1)
        NEG_HALF = jnp.float32(-5e29)  # the XLA tail's `<= NEG * 0.5` test
        best0 = idx0 = None
        nbad = jnp.zeros((bt,), jnp.int32) if use_trie else None
        for j in range(K):
            total = buf_ref[:]
            best = jnp.max(total, axis=-1)  # (bt,)
            raw_idx = jnp.argmax(total, axis=-1).astype(jnp.int32)
            idx = raw_idx
            if use_trie:
                # refill: fewer than K valid candidates -> duplicate the
                # best one (reference model.lua:421-436,489-499; identical
                # to decode._apply_trie_and_topk).  The mask-out below
                # uses the RAW pick so successive passes walk distinct
                # positions exactly like lax.top_k's first-index ordering.
                if j == 0:
                    best0, idx0 = best, idx
                bad = best <= NEG_HALF
                nbad = nbad + bad.astype(jnp.int32)
                best = jnp.where(bad, best0, best)
                idx = jnp.where(bad, idx0, idx)
            nsc_ref[:, j] = best
            par_ref[:, j] = idx // vp
            tok_ref[:, j] = idx % vp
            if j + 1 < K:
                buf_ref[:] = jnp.where(col_kv == raw_idx[:, None],
                                       jnp.float32(-jnp.inf), total)
        if use_trie:
            nvalid_ref[:, 0] = K - nbad

    return kernel


def fused_beam_tail(
    context_lbh: jax.Array,  # (L, B, H) scan-major
    h_top_packed: jax.Array,  # (B, K*H) == row-major view of (B*K, H)
    prev_tokens: jax.Array,  # (B, K) int32
    scores: jax.Array,  # (B, K) f32
    w_a: jax.Array,
    w_c: jax.Array,
    pw_padded: jax.Array,  # (H, Vp) from decode_step.pad_projector
    pb_padded: jax.Array,  # (1, Vp)
    K: int,
    V: int,
    interpret: bool = False,
    valid: jax.Array = None,  # (B, K*Vp) 0/1 f32 trie validity plane
) -> Tuple[jax.Array, ...]:
    """Returns (h_tilde (B, K*H) f32, new_scores (B, K) f32,
    parents (B, K) int32, tokens (B, K) int32) — exactly the quantities the
    XLA beam tail produces (grouped attention -> ... -> lax.top_k).  With
    `valid` (trie constraints) a fifth element is appended: the per-row
    valid-candidate count (B,) int32 for the refill warning bookkeeping."""
    use_trie = valid is not None
    L, B0, H = context_lbh.shape
    if B0 <= B_TILE:
        bt = B0
        pad = 0
    else:
        bt = B_TILE
        pad = (-B0) % B_TILE
        if pad:
            context_lbh = jnp.pad(context_lbh, ((0, 0), (0, pad), (0, 0)))
            h_top_packed = jnp.pad(h_top_packed, ((0, pad), (0, 0)))
            # padding rows: frozen PAD beams with -inf-free scores; they are
            # sliced away below, any selection is fine
            prev_tokens = jnp.pad(prev_tokens, ((0, pad), (0, 0)))
            scores = jnp.pad(scores, ((0, pad), (0, 0)))
            if use_trie:
                valid = jnp.pad(valid, ((0, pad), (0, 0)))
    B = B0 + pad
    vp = pw_padded.shape[1]
    dt = w_a.dtype
    grid = (B // bt,)
    kernel = _make_kernel(K, V, use_trie)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, bt, H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, K * H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * H, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, vp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((bt, K * vp), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)] if use_trie else []),
        out_specs=[
            pl.BlockSpec((bt, K * H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((bt, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)] if use_trie else []),
        out_shape=[
            jax.ShapeDtypeStruct((B, K * H), jnp.float32),
            jax.ShapeDtypeStruct((B, K), jnp.float32),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
        ] + ([jax.ShapeDtypeStruct((B, 1), jnp.int32)] if use_trie else []),
        scratch_shapes=[
            pltpu.VMEM((bt, K * vp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET,
        ),
        cost_estimate=pl.CostEstimate(
            flops=K * (2 * B * H * H + 4 * B * L * H + 4 * B * H * H
                       + 2 * B * H * vp),
            bytes_accessed=(B * L * H * context_lbh.dtype.itemsize
                            + B * K * H * 8),
            transcendentals=K * B * (L + H + vp),
        ),
        interpret=interpret,
    )(
        context_lbh, h_top_packed.astype(dt),
        prev_tokens.astype(jnp.int32), scores.astype(jnp.float32),
        w_a, w_c, pw_padded.astype(dt), pb_padded,
        *((valid.astype(jnp.float32),) if use_trie else ()),
    )
    htld, nsc, par, tok = outs[:4]
    if use_trie:
        return (htld[:B0], nsc[:B0], par[:B0], tok[:B0],
                outs[4][:B0, 0])
    return htld[:B0], nsc[:B0], par[:B0], tok[:B0]
