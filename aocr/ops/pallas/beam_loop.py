"""Whole-beam-decode-in-one-Pallas-kernel: the entire K-beam T-step search
on-chip.

The fused beam *tail* (ops/pallas/beam_step.py) removed the per-step HBM
round-trips after the LSTM stack, but each step still paid the (B*K)-row
gate matmuls with their c/h state streamed through HBM, the parent-gather
of the whole decoder state, one custom call, and one `lax.while_loop`
iteration of XLA orchestration — and its fixed per-call costs meant it only
won at B >= 512.  This kernel is the beam analog of
ops/pallas/greedy_loop.py: ONE `pallas_call` runs the complete beam search
after the batch-sized t=1 GO step (reference loop model.lua:376-536 —
beam_replicate :322-359, per-beam LSTM/attention src/model/LSTM.lua,
PAD/EOS freeze :448-449, top-K over K*V :450-452, state reorder by parent
:526-533, trie constraint + refill :406-514):

  - every weight table (emb-gates, gate layers, W_a, W_c, projector, and
    the dense trie transitions) is VMEM-resident across all T steps
  - the context tile is read once and reused by all T x K attention steps
  - the full beam state (per-layer c/h, input-feed vector, scores, prev
    tokens, trie nodes, lengths) lives in VMEM scratch packed (bt, K*H);
    the parent reorder is K^2 lane-slice selects, never touching HBM
  - each batch tile early-exits independently once every beam of every
    row is frozen

Token/parent histories are emitted as (bt, K*T) int32 blocks written with
`where(lane == k*T + t)` selects (no dynamic-index stores); refill
bookkeeping accumulates per ROW (summed/min-reduced outside — identical
totals to the XLA path, which also only counts rows with a live beam).

Reuses greedy_loop.build_tables for the weight tables (identical layer-0
one-hot emb-gates folding) and therefore matches the XLA beam path's
arithmetic exactly in f32; in bf16 the same near-tie caveat as the tail
kernel applies (docs/performance.md).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aocr import vocab
from aocr.ops.pallas.decode_step import attention_logp_tail
from aocr.ops.pallas.greedy_loop import (_gate_math, pad_trie_table,
                                         trie_table_bytes)

from aocr.ops.pallas.tiling import B_TILE, LANE, VMEM_BUDGET
MAX_K = 8  # K^2 in-kernel selects; larger beams use the tail kernel


def _make_kernel(num_layers: int, input_feed: bool, T: int, K: int,
                 b0: int, bt: int, use_trie: bool, count_lengths: bool):
    def kernel(*refs):
        (ctx_ref, c1_ref, h1_ref, attn1_ref) = refs[:4]
        k = 4
        extra_init = refs[k:k + 2 * (num_layers - 1)]  # per layer (c, h)
        k += 2 * (num_layers - 1)
        tok0_ref, sc0_ref = refs[k:k + 2]
        k += 2
        node0_ref = None
        if use_trie:
            node0_ref = refs[k]
            k += 1
        eg_ref, wfh0_ref = refs[k:k + 2]
        k += 2
        layer_refs = refs[k:k + 2 * (num_layers - 1)]
        k += 2 * (num_layers - 1)
        wa_ref, wc_ref, pw_ref, pb_ref = refs[k:k + 4]
        k += 4
        trie_ref = None
        if use_trie:
            trie_ref = refs[k]
            k += 1
        # outputs
        tokh_ref, parh_ref, fsc_ref, flen_ref = refs[k:k + 4]
        k += 4
        refill_ref = minv_ref = None
        if use_trie:
            refill_ref, minv_ref = refs[k:k + 2]
            k += 2
        # scratch
        attn_scr, c_scr, h_scr, tc_scr, th_scr, htld_scr, buf_scr = \
            refs[k:k + 7]
        prev_scr, score_scr, len_scr = refs[k + 7:k + 10]
        node_scr = refs[k + 10] if use_trie else None

        i = pl.program_id(0)
        H = wa_ref.shape[0]
        vp = pw_ref.shape[-1]
        cd = wa_ref.dtype
        prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
                else jax.lax.Precision.DEFAULT)
        f32 = jnp.float32

        # ---- init from the t=1 batch-sized GO step ----
        # All K beams start from the SAME expanded state (beam_replicate);
        # only tokens/scores/nodes differ (the t=1 top-K).
        row = jax.lax.broadcasted_iota(jnp.int32, (bt, K), 0) + i * bt
        pad_row = row >= b0
        for kk in range(K):
            sl = slice(kk * H, (kk + 1) * H)
            attn_scr[:, sl] = attn1_ref[:].astype(f32)
            c_scr[0, :, sl] = c1_ref[:].astype(f32)
            h_scr[0, :, sl] = h1_ref[:].astype(f32)
            for l in range(1, num_layers):
                c_scr[l, :, sl] = extra_init[2 * (l - 1)][:].astype(f32)
                h_scr[l, :, sl] = extra_init[2 * (l - 1) + 1][:].astype(f32)
        # Padding rows start frozen (PAD) so they never keep a tile alive.
        prev_scr[:] = jnp.where(pad_row, vocab.PAD, tok0_ref[:])
        score_scr[:] = jnp.where(pad_row, 0.0, sc0_ref[:])
        len_scr[:] = jnp.where(pad_row, 0, 1)
        if use_trie:
            node_scr[:] = jnp.where(pad_row, 0, node0_ref[:])
            refill_ref[:] = jnp.zeros((bt, 1), jnp.int32)
            minv_ref[:] = jnp.full((bt, 1), K, jnp.int32)

        # histories: t=0 row = the t=1 picks, identity parents
        col_kt = jax.lax.broadcasted_iota(jnp.int32, (bt, K * T), 1)
        tokh = jnp.full((bt, K * T), vocab.PAD, jnp.int32)
        parh = col_kt // T  # identity parents everywhere (prefill)
        for kk in range(K):
            tokh = jnp.where(col_kt == kk * T, prev_scr[:, kk:kk + 1], tokh)
        tokh_ref[:] = tokh
        parh_ref[:] = parh
        fsc_ref[:] = score_scr[:]
        flen_ref[:] = len_scr[:]

        col_v = jax.lax.broadcasted_iota(jnp.int32, (bt, vp), 1)
        col_kv = jax.lax.broadcasted_iota(jnp.int32, (bt, K * vp), 1)
        col_vin = jax.lax.broadcasted_iota(
            jnp.int32, (bt, eg_ref.shape[0]), 1)

        def step(t, _):
            prev = prev_scr[:]  # (bt, K)
            frozen = (prev == vocab.PAD) | (prev == vocab.EOS)

            @pl.when(jnp.logical_not(jnp.all(frozen)))
            def _():
                context = ctx_ref[:]  # (L, bt, H) resident
                # ---- per-beam LSTM stack + attention + scored logits ----
                for kk in range(K):
                    sl = slice(kk * H, (kk + 1) * H)
                    onehot = (col_vin == prev[:, kk:kk + 1]).astype(cd)
                    gates = jnp.dot(onehot, eg_ref[:], precision=prec,
                                    preferred_element_type=f32)
                    if input_feed:
                        ah = jnp.concatenate(
                            [attn_scr[:, sl], h_scr[0, :, sl]], axis=-1
                        ).astype(cd)
                    else:
                        ah = h_scr[0, :, sl].astype(cd)
                    gates = gates + jnp.dot(
                        ah, wfh0_ref[:], precision=prec,
                        preferred_element_type=f32)
                    c, h = _gate_math(gates, c_scr[0, :, sl])
                    tc_scr[0, :, sl] = c
                    th_scr[0, :, sl] = h
                    x = h
                    for l in range(1, num_layers):
                        w_ref, b_ref = layer_refs[2 * (l - 1):2 * l]
                        xh = jnp.concatenate(
                            [x, h_scr[l, :, sl]], axis=-1).astype(cd)
                        g = jnp.dot(xh, w_ref[:], precision=prec,
                                    preferred_element_type=f32)
                        g = g + b_ref[:]
                        c, h = _gate_math(g, c_scr[l, :, sl])
                        tc_scr[l, :, sl] = c
                        th_scr[l, :, sl] = h
                        x = h
                    h_top = x  # (bt, H) f32
                    h_tilde, logp = attention_logp_tail(
                        h_top, context, wa_ref[:], wc_ref[:], pw_ref[:],
                        pb_ref[:], cd)
                    htld_scr[:, sl] = h_tilde
                    froz_k = frozen[:, kk:kk + 1]
                    logp = jnp.where((col_v == vocab.PAD) & froz_k, 0.0,
                                     logp)
                    total_k = score_scr[:, kk:kk + 1] + logp
                    if use_trie:
                        node_oh = (jax.lax.broadcasted_iota(
                            jnp.int32, (bt, trie_ref.shape[0]), 1)
                            == node_scr[:, kk:kk + 1]).astype(f32)
                        rowvals = jnp.dot(
                            node_oh, trie_ref[:],
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=f32)  # (bt, vp)
                        # PAD always allowed at these steps (t >= 1); the
                        # node update re-derives transition rows for the
                        # gathered PARENT nodes after the top-K.
                        ok = (rowvals >= 0.0) | (col_v == vocab.PAD)
                        total_k = jnp.where(ok, total_k, jnp.float32(-1e30))
                    buf_scr[:, kk * vp:(kk + 1) * vp] = total_k

                # ---- iterative top-K over (bt, K*vp) ----
                NEG_HALF = jnp.float32(-5e29)
                best0 = idx0 = None
                nbad = jnp.zeros((bt,), jnp.int32) if use_trie else None
                new_scores = []
                parents_l = []
                toks_l = []
                for j in range(K):
                    total = buf_scr[:]
                    best = jnp.max(total, axis=-1)
                    raw_idx = jnp.argmax(total, axis=-1).astype(jnp.int32)
                    idx = raw_idx
                    if use_trie:
                        if j == 0:
                            best0, idx0 = best, idx
                        bad = best <= NEG_HALF
                        nbad = nbad + bad.astype(jnp.int32)
                        best = jnp.where(bad, best0, best)
                        idx = jnp.where(bad, idx0, idx)
                    new_scores.append(best[:, None])
                    parents_l.append((idx // vp)[:, None])
                    toks_l.append((idx % vp)[:, None])
                    if j + 1 < K:
                        buf_scr[:] = jnp.where(
                            col_kv == raw_idx[:, None],
                            jnp.float32(-jnp.inf), total)
                nsc = jnp.concatenate(new_scores, axis=-1)      # (bt, K)
                parents = jnp.concatenate(parents_l, axis=-1)   # (bt, K)
                toks = jnp.concatenate(toks_l, axis=-1)

                # A fully-frozen ROW is final (same rule as the XLA
                # while_loop body, decode.py): without this, a frozen row
                # inside a still-live tile could "resurrect" a beam — only
                # frozen beams' PAD column is zeroed, so the best frozen
                # beam's non-PAD continuation can displace a low-scoring
                # beam, and under length_normalize that longer beam wins
                # selection — making transcripts depend on tile boundaries
                # and batchmates.  Identity parents + PAD tokens + kept
                # scores make every downstream update (state gather, node
                # step, length count, history write) a no-op for the row.
                row_live = ~jnp.all(frozen, axis=-1, keepdims=True)
                col_k = jax.lax.broadcasted_iota(jnp.int32, (bt, K), 1)
                nsc = jnp.where(row_live, nsc, score_scr[:])
                parents = jnp.where(row_live, parents, col_k)
                toks = jnp.where(row_live, toks, vocab.PAD)

                # ---- parent gather of the whole beam state ----
                def gathered(src_kk):
                    # src_kk: kk -> (bt, H); returns per-new-beam slices
                    outs = []
                    for kk in range(K):
                        p = parents[:, kk:kk + 1]  # (bt, 1)
                        acc = src_kk(0)
                        for jj in range(1, K):
                            acc = jnp.where(p == jj, src_kk(jj), acc)
                        outs.append(acc)
                    return outs

                for l in range(num_layers):
                    for kk, v in enumerate(gathered(
                            lambda j, l=l: tc_scr[l, :, j * H:(j + 1) * H])):
                        c_scr[l, :, kk * H:(kk + 1) * H] = v
                    for kk, v in enumerate(gathered(
                            lambda j, l=l: th_scr[l, :, j * H:(j + 1) * H])):
                        h_scr[l, :, kk * H:(kk + 1) * H] = v
                for kk, v in enumerate(gathered(
                        lambda j: htld_scr[:, j * H:(j + 1) * H])):
                    attn_scr[:, kk * H:(kk + 1) * H] = v

                def gather_cols(arr):  # (bt, K) gathered by parents
                    acc = arr[:, 0:1] + jnp.zeros((bt, K), arr.dtype)
                    for jj in range(1, K):
                        acc = jnp.where(parents == jj, arr[:, jj:jj + 1],
                                        acc)
                    return acc

                if use_trie:
                    parent_nodes = gather_cols(node_scr[:])
                    # stepped = trie[parent_node, tok]: re-derive the
                    # transition rows with one one-hot matmul per beam
                    # (the scored buffer was consumed by the top-K)
                    stepped_cols = []
                    for kk in range(K):
                        node_oh = (jax.lax.broadcasted_iota(
                            jnp.int32, (bt, trie_ref.shape[0]), 1)
                            == parent_nodes[:, kk:kk + 1]).astype(f32)
                        rowvals = jnp.dot(
                            node_oh, trie_ref[:],
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=f32)
                        picked = jnp.sum(
                            jnp.where(col_v == toks[:, kk:kk + 1], rowvals,
                                      0.0), axis=-1).astype(jnp.int32)
                        stepped_cols.append(picked[:, None])
                    stepped = jnp.concatenate(stepped_cols, axis=-1)
                    node_scr[:] = jnp.where(
                        toks == vocab.PAD, parent_nodes,
                        jnp.maximum(stepped, 0))
                    # refill bookkeeping (per row; reduced outside)
                    nvalid = K - nbad[:, None]  # (bt, 1)
                    refill_ref[:] = refill_ref[:] + jnp.where(
                        row_live & (nvalid < K), 1, 0)
                    minv_ref[:] = jnp.minimum(
                        minv_ref[:], jnp.where(row_live, nvalid, K))

                if count_lengths:
                    parent_froz = gather_cols(frozen.astype(jnp.int32))
                    parent_len = gather_cols(len_scr[:])
                    emitted = ((toks != vocab.PAD)
                               | (parent_froz == 0)).astype(jnp.int32)
                    len_scr[:] = parent_len + emitted

                score_scr[:] = nsc
                prev_scr[:] = toks

                # ---- history writes at index t ----
                tokh = tokh_ref[:]
                parh = parh_ref[:]
                for kk in range(K):
                    at = col_kt == kk * T + t
                    tokh = jnp.where(at, toks[:, kk:kk + 1], tokh)
                    parh = jnp.where(at, parents[:, kk:kk + 1], parh)
                tokh_ref[:] = tokh
                parh_ref[:] = parh
                fsc_ref[:] = nsc
                flen_ref[:] = len_scr[:]
            return 0

        jax.lax.fori_loop(1, T, step, 0)

    return kernel


def vmem_bytes(L: int, H: int, T: int, K: int, num_layers: int,
               input_feed: bool, vp_in: int, vp: int, itemsize: int,
               bt: int, trie_bytes: int = 0) -> int:
    # The per-beam trie lookups materialize (bt, num_nodes) f32 one-hots
    # at TWO sites (validity lookup + post-top-K node update), and the K
    # beams are a python-unrolled loop, so Mosaic's scheduler can keep up
    # to 2*K such temps (+ their matmul operands) alive concurrently —
    # charge all of them.  Calibrated on hardware: at the demo shape
    # (L=24 H=1024 T=50 K=5, N=3,835, bt=128) charging only 2 one-hots
    # estimated 87.8 MB but the compiled kernel's scoped-VMEM stack hit
    # the limit (109.12M vs 109.00M); the 21.3 MB estimate-vs-actual gap
    # matches 2*K one-hots (19.6 MB) + ordinary slack within headroom.
    ctx = (2 * L * bt * H * itemsize + trie_bytes
           + (2 * K * bt * (trie_bytes // (vp * 4)) * 4 if trie_bytes
              else 0))
    weights = (
        vp_in * 4 * H * itemsize
        + ((2 * H) if input_feed else H) * 4 * H * itemsize
        + (num_layers - 1) * (2 * H * 4 * H * itemsize + 4 * H * 4)
        + H * H * itemsize + 2 * H * H * itemsize
        + H * vp * itemsize + vp * 4
    )
    # t=1 init-state input blocks (c1/h1/attn1 + per-extra-layer c/h, all
    # f32) and tok0/sc0(/node0): i-dependent index maps, so Mosaic
    # double-buffers them across the grid
    init = 2 * ((3 + 2 * (num_layers - 1)) * bt * H * 4 + 3 * bt * K * 4)
    # c/h + their this-step temps per layer, attn + h_tilde: all f32
    state = (4 * num_layers + 2) * bt * K * H * 4
    buf = bt * K * vp * 4
    small = 8 * bt * K * 4
    # output blocks are i-dependent too: double-buffered
    hist = 2 * (2 * bt * K * T * 4 + 6 * bt * K * 4)
    return ctx + weights + init + state + buf + small + hist


def pick_bt(B0: int, est) -> Optional[int]:
    """Largest tile (<= B_TILE, multiple of 8 or the whole batch) whose
    estimate fits; None if no tile >= 16 rows fits (tiles that small are
    perf-pointless for a 50-step loop kernel — let the caller fall back).

    Headroom: 14 MB under the 100 MB budget, calibrated on hardware.
    Mosaic's scoped-VMEM stack allocator enforces ~109 MiB on v5e (the
    xla_tpu_scoped_vmem_limit_kib default — our vmem_limit_bytes request
    does not lower that stack limit), and the compiled kernel's measured
    stack runs ~19 MiB ABOVE this estimate roughly independent of bt
    (f32+trie demo shape, bt=16: estimate 89.7 MiB, compiled stack
    109.12 MiB -> 120 KB over the cliff).  The proven flagship bf16 shape
    (L=24 H=1024 T=50 K=5, 2 layers, input_feed, bt=128) estimates
    ~84 MiB and runs: 84 + 19 = 103 <= 109.  Gating at
    estimate <= 100 - 14 = 86 MiB keeps that proven tile while rejecting
    the measured-overflow configurations."""
    cands = [b for b in (B_TILE, 96, 64, 48, 32, 16) if b < B0]
    for bt in [min(B0, B_TILE)] + cands:
        if est(bt) <= VMEM_BUDGET - 14 * 1024 * 1024:
            return bt
    return None


def fused_beam_loop(
    context_lbh: jax.Array,   # (L, B, H) scan-major, compute dtype
    init_state,               # decoder.DecoderState from the t=1 GO step
    tokens0: jax.Array,       # (B, K) t=1 top-K picks
    scores0: jax.Array,       # (B, K) f32
    nodes0: Optional[jax.Array],   # (B, K) trie nodes or None
    tables: dict,             # greedy_loop.build_tables output
    num_layers: int,
    input_feed: bool,
    T: int,
    K: int,
    count_lengths: bool,
    trie_table: Optional[jax.Array] = None,  # (N, V) int32, -1 invalid
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Run beam steps t=1..T-1 on-chip (t=0 == the XLA GO step whose picks
    seed tokens0/scores0/nodes0 and state).

    Returns (tok_hist (T, B, K), par_hist (T, B, K), final scores (B, K),
    final lengths (B, K)[, refills scalar, min_valid scalar]) — the same
    quantities the XLA while_loop carries into the backtrack."""
    use_trie = trie_table is not None
    L, B0, H = context_lbh.shape
    cd = tables["wa"].dtype
    vp = tables["vp"]
    tb = (trie_table_bytes(trie_table.shape[0], vp) if use_trie else 0)
    bt = pick_bt(B0, lambda b: vmem_bytes(
        L, H, T, K, num_layers, input_feed, tables["vp_in"], vp,
        jnp.dtype(cd).itemsize, b, tb))
    assert bt is not None, "caller must gate on fits()"
    grid = (-(-B0 // bt),)

    c1, h1 = init_state.cs[0], init_state.hs[0]
    attn1 = init_state.attn
    extra_init = []
    for l in range(1, num_layers):
        extra_init += [init_state.cs[l], init_state.hs[l]]

    # Zero-pad a ragged final tile: on real TPU the out-of-bounds rows of
    # an edge block read unspecified VMEM contents (interpret mode
    # zero-fills, hiding it).  The kernel PAD-freezes rows >= B0 either
    # way, but garbage (possibly NaN) c/h/attn state could otherwise
    # produce NaN logits whose argmax unfreezes a pad row and defeats the
    # tile's early exit.  Same treatment as fused_greedy_loop.
    pad = (-B0) % bt
    if pad:
        rowpad = lambda a: jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        context_lbh = jnp.pad(context_lbh, ((0, 0), (0, pad), (0, 0)))
        c1, h1, attn1 = rowpad(c1), rowpad(h1), rowpad(attn1)
        extra_init = [rowpad(a) for a in extra_init]
        tokens0, scores0 = rowpad(tokens0), rowpad(scores0)
        if use_trie:
            nodes0 = rowpad(nodes0)
    Bp = B0 + pad

    kernel = _make_kernel(num_layers, input_feed, T, K, B0, bt,
                          use_trie, count_lengths)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    rowH = pl.BlockSpec((bt, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rowK = pl.BlockSpec((bt, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rowKT = pl.BlockSpec((bt, K * T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    row1 = pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((L, bt, H), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        rowH, rowH, rowH,
    ]
    in_specs += [rowH] * (2 * (num_layers - 1))
    in_specs += [rowK, rowK]
    ops = [
        context_lbh,
        c1.astype(jnp.float32), h1.astype(jnp.float32),
        attn1.astype(jnp.float32),
        *[a.astype(jnp.float32) for a in extra_init],
        tokens0.astype(jnp.int32), scores0.astype(jnp.float32),
    ]
    if use_trie:
        in_specs.append(rowK)
        ops.append(nodes0.astype(jnp.int32))
    in_specs += [const(tables["eg"].shape), const(tables["wfh0"].shape)]
    ops += [tables["eg"], tables["wfh0"]]
    for arr in tables["extra"]:
        in_specs.append(const(arr.shape))
        ops.append(arr)
    in_specs += [const(tables["wa"].shape), const(tables["wc"].shape),
                 const(tables["pw"].shape), const(tables["pb"].shape)]
    ops += [tables["wa"], tables["wc"], tables["pw"], tables["pb"]]
    if use_trie:
        tt = pad_trie_table(trie_table, vp)
        in_specs.append(const(tt.shape))
        ops.append(tt)

    out_specs = [rowKT, rowKT, rowK, rowK]
    out_shape = [
        jax.ShapeDtypeStruct((Bp, K * T), jnp.int32),
        jax.ShapeDtypeStruct((Bp, K * T), jnp.int32),
        jax.ShapeDtypeStruct((Bp, K), jnp.float32),
        jax.ShapeDtypeStruct((Bp, K), jnp.int32),
    ]
    if use_trie:
        out_specs += [row1, row1]
        out_shape += [jax.ShapeDtypeStruct((Bp, 1), jnp.int32)] * 2

    scratch = [
        pltpu.VMEM((bt, K * H), jnp.float32),               # attn
        pltpu.VMEM((num_layers, bt, K * H), jnp.float32),    # c
        pltpu.VMEM((num_layers, bt, K * H), jnp.float32),    # h
        pltpu.VMEM((num_layers, bt, K * H), jnp.float32),    # c (this step)
        pltpu.VMEM((num_layers, bt, K * H), jnp.float32),    # h (this step)
        pltpu.VMEM((bt, K * H), jnp.float32),               # h_tilde
        pltpu.VMEM((bt, K * vp), jnp.float32),              # top-K buffer
        pltpu.VMEM((bt, K), jnp.int32),                     # prev tokens
        pltpu.VMEM((bt, K), jnp.float32),                   # scores
        pltpu.VMEM((bt, K), jnp.int32),                     # lengths
    ]
    if use_trie:
        scratch.append(pltpu.VMEM((bt, K), jnp.int32))      # nodes

    gate_flops = 2 * B0 * K * (tables["vp_in"]
                               + (2 * H if input_feed else H)
                               + (num_layers - 1) * 2 * H) * 4 * H
    attn_flops = K * (2 * B0 * H * H + 4 * B0 * L * H + 4 * B0 * H * H)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET,
        ),
        cost_estimate=pl.CostEstimate(
            flops=T * (gate_flops + attn_flops + 2 * B0 * K * H * vp),
            bytes_accessed=(B0 * L * H * context_lbh.dtype.itemsize
                            + B0 * K * H * 12 + 2 * B0 * K * T * 4),
            transcendentals=T * B0 * K * (L + 5 * num_layers * H + vp),
        ),
        interpret=interpret,
    )(*ops)

    tok_hist = jnp.moveaxis(outs[0][:B0].reshape(B0, K, T), 2, 0)  # (T,B,K)
    par_hist = jnp.moveaxis(outs[1][:B0].reshape(B0, K, T), 2, 0)
    fsc, flen = outs[2][:B0], outs[3][:B0]
    if use_trie:
        # pad rows contribute 0 refills / K min_valid by the in-kernel
        # pad_row masks, so reducing over Bp rows is exact
        refills = jnp.sum(outs[4][:, 0]).astype(jnp.int32)
        min_valid = jnp.min(outs[5][:, 0]).astype(jnp.int32)
        return tok_hist, par_hist, fsc, flen, refills, min_valid
    return tok_hist, par_hist, fsc, flen


def fits(L: int, H: int, T: int, K: int, num_layers: int, input_feed: bool,
         vp_in: int, vp: int, itemsize: int, num_trie_nodes: int = 0
         ) -> bool:
    if K > MAX_K or H % LANE != 0:
        return False
    tb = trie_table_bytes(num_trie_nodes, vp) if num_trie_nodes else 0
    return pick_bt(10**9, lambda b: vmem_bytes(
        L, H, T, K, num_layers, input_feed, vp_in, vp, itemsize, b, tb)
    ) is not None
