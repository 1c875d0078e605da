"""Whole-greedy-decode-in-one-Pallas-kernel: the entire T-step loop on-chip.

The fused decode *tail* (ops/pallas/decode_step.py) removed the per-step HBM
round-trips after the LSTM stack, but each step still paid: two gate-matmul
kernels with their c/h state round-trips through HBM, one custom call, and
one `lax.while_loop` iteration of XLA orchestration.  This kernel removes
all of it — ONE `pallas_call` runs the complete greedy decode (reference
per-step path: embedding LookupTable src/model/LSTM.lua:54-56, input-feed
concat :61-65, fused-gate LSTM layers :79-105, Luong attention :124-162,
projector output_projector.lua:3-8, the PAD/EOS freeze model.lua:448-449,
argmax pick, and the 50-step eval loop model.lua:266-274,376-536):

  - every weight matrix (gate layers, W_a, W_c, projector) is loaded into
    VMEM once per batch tile and stays resident across all T steps
    (constant BlockSpec index maps)
  - the context tile is read from HBM once and reused by all T attention
    steps
  - decoder state (attn / per-layer c,h) lives in f32 VMEM scratch for the
    whole loop — zero HBM traffic per step
  - each 128-row batch tile runs its own `fori_loop` and early-exits
    independently (`pl.when` on an all-rows-frozen reduction) the moment
    every row in the tile has emitted EOS — finer-grained than the XLA
    while_loop's global all-batch exit

Layout/numerics choices that keep Mosaic happy and picks bit-stable:
  - the embedding lookup is a one-hot (Bt, Vp) x (Vp, 4H) matmul against a
    precomputed `emb_gates` table (embedding @ Wi[:E] + b, built once
    outside the loop) — no gather, and it folds the whole layer-0 input
    projection of the token into one tiny MXU op
  - the token history is written with a `where(lane_iota == t, tok, prev)`
    select over the (Bt, T) output block — no dynamic-index stores, no
    (Bt,) -> (1, Bt) relayouts
  - softmax / log-softmax / argmax run in f32 with lane-axis reductions
    (sublane-axis reductions are a Mosaic relayout trap, see
    decode_step.py); scores accumulate in f32
  - context arrives scan-major (L, B, H) for the same
    keep-the-encoder-fused reason as the tail kernel

Rows past the true batch size (padding to a 128 multiple) start frozen
(prev=PAD), so they cannot hold a tile live past its real rows' EOS.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aocr import vocab
from aocr.ops.lstm import gate_math
from aocr.ops.mm import matmul
from aocr.ops.pallas.decode_step import (attention_logp_tail,
                                          pad_projector)

from aocr.ops.pallas.tiling import B_TILE, LANE, VMEM_BUDGET


def _make_kernel(num_layers: int, input_feed: bool, T: int,
                 b0: int, bt: int, use_trie: bool = False):
    """Build the kernel body for a static (layers, input_feed, T[, trie])
    shape."""

    def kernel(*refs):
        (ctx_ref, c0_ref, h0_ref, eg_ref, wfh0_ref) = refs[:5]
        layer_refs = refs[5:5 + 2 * (num_layers - 1)]
        wa_ref, wc_ref, pw_ref, pb_ref = refs[5 + 2 * (num_layers - 1):
                                              9 + 2 * (num_layers - 1)]
        k = 9 + 2 * (num_layers - 1)
        trie_ref = None
        if use_trie:
            trie_ref = refs[k]
            k += 1
        tok_ref, score_ref = refs[k:k + 2]
        attn_scr, c_scr, h_scr, prev_scr = refs[k + 2:k + 6]
        node_scr = None
        if use_trie:
            node_scr = refs[k + 6]

        i = pl.program_id(0)
        H = h0_ref.shape[-1]
        vp = pw_ref.shape[-1]
        cd = wa_ref.dtype
        prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
                else jax.lax.Precision.DEFAULT)

        # ---- init: history PAD, scores 0, state from encoder finals ----
        tok_ref[:] = jnp.full((bt, T), vocab.PAD, jnp.int32)
        score_ref[:] = jnp.zeros((bt, 1), jnp.float32)
        attn_scr[:] = jnp.zeros((bt, H), jnp.float32)
        c_scr[0] = c0_ref[:].astype(jnp.float32)
        h_scr[0] = h0_ref[:].astype(jnp.float32)
        for l in range(1, num_layers):
            c_scr[l] = jnp.zeros((bt, H), jnp.float32)
            h_scr[l] = jnp.zeros((bt, H), jnp.float32)
        # Padding rows (global row >= b0) start frozen so they never keep
        # the tile alive; real rows start from GO (neither PAD nor EOS).
        row = jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0) + i * bt
        prev_scr[:] = jnp.where(row < b0, vocab.GO, vocab.PAD)
        if use_trie:
            node_scr[:] = jnp.zeros((bt, 1), jnp.int32)  # root

        lane_t = jax.lax.broadcasted_iota(jnp.int32, (bt, T), 1)
        col_v = jax.lax.broadcasted_iota(jnp.int32, (bt, vp), 1)
        # the emb-gates table pads to vp_in (always 128-lane) independently
        # of the projector's PACK_VP padding — distinct iotas (beam_loop
        # already kept them separate)
        col_vin = jax.lax.broadcasted_iota(
            jnp.int32, (bt, eg_ref.shape[0]), 1)

        def step(t, _):
            prev = prev_scr[:]  # (bt, 1) int32
            frozen = (prev == vocab.PAD) | (prev == vocab.EOS)

            @pl.when(jnp.logical_not(jnp.all(frozen)))
            def _():
                # ---- layer 0: one-hot gate lookup + recurrent matmul ----
                onehot = (col_vin == prev).astype(cd)  # (bt, Vp_in)
                gates = jnp.dot(onehot, eg_ref[:], precision=prec,
                                preferred_element_type=jnp.float32)
                if input_feed:
                    ah = jnp.concatenate(
                        [attn_scr[:], h_scr[0]], axis=-1
                    ).astype(cd)
                else:
                    ah = h_scr[0].astype(cd)
                gates = gates + jnp.dot(ah, wfh0_ref[:], precision=prec,
                                        preferred_element_type=jnp.float32)
                c, h = _gate_math(gates, c_scr[0])
                c_scr[0] = c
                h_scr[0] = h
                x = h
                for l in range(1, num_layers):
                    w_ref, b_ref = layer_refs[2 * (l - 1):2 * l]
                    xh = jnp.concatenate([x, h_scr[l]], axis=-1).astype(cd)
                    g = jnp.dot(xh, w_ref[:], precision=prec,
                                preferred_element_type=jnp.float32)
                    g = g + b_ref[:]
                    c, h = _gate_math(g, c_scr[l])
                    c_scr[l] = c
                    h_scr[l] = h
                    x = h

                # ---- attention tail (same math as decode_step._kernel) ----
                h_top = x  # (bt, H) f32
                h_tilde, logp = attention_logp_tail(
                    h_top, ctx_ref[:], wa_ref[:], wc_ref[:], pw_ref[:],
                    pb_ref[:], cd)
                attn_scr[:] = h_tilde
                logp = jnp.where((col_v == vocab.PAD) & frozen, 0.0, logp)
                if use_trie:
                    # Dictionary constraint in-kernel (reference
                    # model.lua:406-514): the dense (nodes, Vp) transition
                    # table is VMEM-resident; the per-row lookup rides the
                    # MXU as a one-hot (bt, Np) x (Np, Vp) matmul in f32
                    # (exact for node ids < 2^24).  Semantics match the
                    # XLA trie path exactly: t=0 masks to the root's
                    # children with no PAD escape; later steps always
                    # allow PAD; PAD keeps the node, others step it.
                    npn = trie_ref.shape[0]
                    node_oh = (jax.lax.broadcasted_iota(
                        jnp.int32, (bt, npn), 1) == node_scr[:]
                    ).astype(jnp.float32)
                    rowvals = jnp.dot(
                        node_oh, trie_ref[:],
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)  # (bt, Vp)
                    # PAD stays allowed for FROZEN rows even at t == 0:
                    # only tile-padding rows are frozen then (real rows
                    # start from GO), and masking their PAD escape would
                    # unfreeze them into a trie walk that keeps the tile
                    # alive all T steps, defeating the early exit.
                    ok = (rowvals >= 0.0) | (
                        (col_v == vocab.PAD) & ((t > 0) | frozen))
                    logp = jnp.where(ok, logp, -1e30)
                tok = jnp.argmax(logp, axis=-1).astype(jnp.int32)  # (bt,)
                delta = jnp.max(logp, axis=-1)  # (bt,)
                if use_trie:
                    picked = jnp.sum(
                        jnp.where(col_v == tok[:, None], rowvals, 0.0),
                        axis=-1).astype(jnp.int32)  # (bt,)
                    stepped = jnp.maximum(picked, 0)[:, None]
                    node_scr[:] = jnp.where(
                        (tok[:, None] == vocab.PAD) & (t > 0),
                        node_scr[:], stepped)
                score_ref[:] = score_ref[:] + delta[:, None]
                prev_scr[:] = tok[:, None]
                tok_ref[:] = jnp.where(lane_t == t, tok[:, None], tok_ref[:])

            return 0

        jax.lax.fori_loop(0, T, step, 0)

    return kernel


# The kernels run the SAME gate recurrence as training (jnp.split lowers
# fine under Mosaic), so a gate-order or numerics change in ops/lstm can
# never silently diverge the decode kernels from the trained model.
_gate_math = gate_math


def build_tables(dec_params: dict, proj: dict, embedding_size: int,
                 input_feed: bool, cd) -> dict:
    """Precompute the loop-invariant weight tables the kernel consumes.

    emb_gates folds the whole token half of the layer-0 input projection:
    emb_gates[v] = embedding[v] @ Wi0[:E] + bi0 + bh0, padded to 128 rows
    (tokens are always < V, so padding rows are never selected by the
    one-hot).  Call once per decode (outside the loop); everything here is
    jit-hoistable constant work.
    """
    layer0 = dec_params["layers"][0]
    E = embedding_size
    emb = dec_params["embedding"].astype(cd)
    # mm.matmul, not bare jnp.dot: with compute_dtype=float32 the matmul
    # policy (aocr/ops/mm.py) requests HIGHEST so this precomputed table
    # matches the per-step XLA path bit-for-bit instead of going through
    # TPU's default bf16 passes.
    eg = (
        matmul(emb, layer0["wi"][:E].astype(cd))
        + layer0["bi"] + layer0["bh"]
    )  # (V, 4H) f32
    V = eg.shape[0]
    vp_in = ((V + LANE - 1) // LANE) * LANE
    eg = jnp.pad(eg, ((0, vp_in - V), (0, 0))).astype(cd)
    if input_feed:
        wfh0 = jnp.concatenate(
            [layer0["wi"][E:], layer0["wh"]], axis=0
        ).astype(cd)
    else:
        wfh0 = layer0["wh"].astype(cd)
    extra = []
    for layer in dec_params["layers"][1:]:
        w = jnp.concatenate([layer["wi"], layer["wh"]], axis=0).astype(cd)
        b = (layer["bi"] + layer["bh"]).reshape(1, -1).astype(jnp.float32)
        extra.extend([w, b])
    H = layer0["wh"].shape[0]
    pw, pb = pad_projector(proj["w"], proj["b"])  # shared with decode_step
    vp = pw.shape[1]
    return {
        "eg": eg, "wfh0": wfh0, "extra": tuple(extra),
        "wa": dec_params["w_a"].astype(cd),
        "wc": dec_params["w_c"].astype(cd),
        "pw": pw.astype(cd), "pb": pb, "H": H, "vp_in": vp_in, "vp": vp,
    }


def vmem_bytes(L: int, H: int, T: int, num_layers: int, input_feed: bool,
               vp_in: int, vp: int, itemsize: int,
               trie_bytes: int = 0) -> int:
    """Worst-case VMEM footprint per grid step (context double-buffered).
    trie_bytes: footprint of the resident f32 transition table (0 without
    -use_dictionary; see trie_table_bytes)."""
    ctx = 2 * L * B_TILE * H * itemsize + trie_bytes
    weights = (
        vp_in * 4 * H * itemsize
        + ((2 * H) if input_feed else H) * 4 * H * itemsize
        + (num_layers - 1) * (2 * H * 4 * H * itemsize + 4 * H * 4)
        + H * H * itemsize + 2 * H * H * itemsize
        + H * vp * itemsize + vp * 4
    )
    # the in-kernel trie lookup materializes a (B_TILE, num_nodes) f32
    # one-hot every step — comparable to the table itself and previously
    # uncounted (a mid-size lexicon could pass the gate yet fail Mosaic
    # compilation); npn recovered from the table footprint
    onehot = (2 * B_TILE * (trie_bytes // (vp * 4)) * 4
              if trie_bytes else 0)
    # c0/h0 init inputs are i-dependent f32 blocks: double-buffered
    init = 2 * 2 * B_TILE * H * 4
    scratch = (2 * num_layers + 1) * B_TILE * H * 4 + 2 * B_TILE * 4
    out = B_TILE * T * 4 + B_TILE * 4
    return ctx + weights + onehot + init + scratch + out


def trie_table_bytes(num_nodes: int, vp: int) -> int:
    return ((num_nodes + 7) // 8) * 8 * vp * 4


def pad_trie_table(trie_table: jax.Array, vp: int) -> jax.Array:
    """Dense transitions as resident f32 (exact for node ids < 2^24):
    rows sublane-padded, columns lane-padded with -1 ('invalid').  Shared
    by the whole-greedy-loop and whole-beam-loop kernels so the sentinel
    and rounding can never diverge between them."""
    N = trie_table.shape[0]
    npn = ((N + 7) // 8) * 8
    tt = jnp.full((npn, vp), -1.0, jnp.float32)
    return tt.at[:N, :trie_table.shape[1]].set(trie_table.astype(jnp.float32))


def fused_greedy_loop(
    context_lbh: jax.Array,  # (L, B, H) scan-major, compute dtype
    c0: jax.Array,  # (B, H) layer-1 init from encoder finals
    h0: jax.Array,  # (B, H)
    tables: dict,  # from build_tables
    num_layers: int,
    input_feed: bool,
    T: int,
    interpret: bool = False,
    trie_table: jax.Array = None,  # (N, V) int32 transitions, -1 invalid
) -> Tuple[jax.Array, jax.Array]:
    """Run the whole greedy decode on-chip.

    Returns (labels (B, T) int32 — PAD-filled after EOS, and PAD-only rows
    once frozen, exactly like decode.greedy_decode's history buffer — and
    scores (B,) f32 cumulative log-probs with the freeze rule applied).
    """
    L, B0, H = context_lbh.shape
    cd = tables["wa"].dtype
    if B0 <= B_TILE:
        bt = B0
        pad = 0
    else:
        bt = B_TILE
        pad = (-B0) % B_TILE
        if pad:
            context_lbh = jnp.pad(context_lbh, ((0, 0), (0, pad), (0, 0)))
            c0 = jnp.pad(c0, ((0, pad), (0, 0)))
            h0 = jnp.pad(h0, ((0, pad), (0, 0)))
    B = B0 + pad
    grid = (B // bt,)
    use_trie = trie_table is not None
    kernel = _make_kernel(num_layers, input_feed, T, B0, bt,
                          use_trie)

    n_extra = 2 * (num_layers - 1)
    in_specs = [
        pl.BlockSpec((L, bt, H), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(tables["eg"].shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(tables["wfh0"].shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for arr in tables["extra"]:
        in_specs.append(pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs += [
        pl.BlockSpec(tables["wa"].shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(tables["wc"].shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(tables["pw"].shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(tables["pb"].shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    vp = tables["vp"]
    trie_ops = ()
    if use_trie:
        tt = pad_trie_table(trie_table, vp)
        in_specs.append(pl.BlockSpec(tt.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        trie_ops = (tt,)
    gate_flops = 2 * B * (tables["vp_in"] + (2 * H if input_feed else H)
                          + (num_layers - 1) * 2 * H) * 4 * H
    attn_flops = 2 * B * H * H + 4 * B * L * H + 4 * B * H * H
    tok, score = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bt, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, H), jnp.float32),                 # attn
            pltpu.VMEM((num_layers, bt, H), jnp.float32),      # c
            pltpu.VMEM((num_layers, bt, H), jnp.float32),      # h
            pltpu.VMEM((bt, 1), jnp.int32),                    # prev token
        ] + ([pltpu.VMEM((bt, 1), jnp.int32)] if use_trie else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET,
        ),
        cost_estimate=pl.CostEstimate(
            flops=T * (gate_flops + attn_flops + 2 * B * H * vp),
            bytes_accessed=(B * L * H * context_lbh.dtype.itemsize
                            + B * H * 8 + B * T * 4),
            transcendentals=T * B * (L + 5 * num_layers * H + vp),
        ),
        interpret=interpret,
    )(
        context_lbh, c0.astype(jnp.float32), h0.astype(jnp.float32),
        tables["eg"], tables["wfh0"], *tables["extra"],
        tables["wa"], tables["wc"], tables["pw"], tables["pb"],
        *trie_ops,
    )
    return tok[:B0], score[:B0, 0]
