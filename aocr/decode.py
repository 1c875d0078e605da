"""On-device greedy / beam-search decoding with optional trie constraints.

Behavioral parity with the reference beam loop
(`/root/reference/src/model/model.lua:226-536,573-585`):

- beam_size is clamped to the vocab size (model.lua:228-229)
- t=1 decodes the batch (B rows) with GO input and top-k over V expands to
  B*K beams (model.lua:388-404); for t>1 top-k runs over K*V totals
- finished-beam freeze: once a beam's previous token is PAD or EOS, the PAD
  column's log-prob is forced to 0 so the beam continues as PAD with an
  unchanged score (model.lua:448-449)
- beam parents are raw_index // V and the transcript is recovered by parent
  backtracking from the best final beam (model.lua:516,573-585)
- trie-constrained decoding keeps a per-beam trie node; invalid continuations
  are masked out, and when fewer than K valid candidates exist the remaining
  beams are refilled with the best valid candidate (model.lua:406-445,460-514)

TPU-native design: the whole decode is one jitted program — a single decoder
step for t=1, then a `lax.scan` over the remaining T-1 steps whose body
early-exits (via `lax.cond` on an all-beams-frozen scalar) once every beam is
finished, followed by an on-device reverse-scan backtrack.  No host sync
anywhere in the loop.

The trie is a precomputed dense transition table (num_nodes, V) int32 with
-1 for invalid edges (built host-side by `aocr.utils.trie`), replacing the
reference's dynamic Lua hash-trie with an XLA gather.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from aocr import vocab
from aocr.config import Config
from aocr.models import decoder, head, model


class BeamCarry(NamedTuple):
    state: decoder.DecoderState  # (B*K, ...) decoder state
    scores: jax.Array  # (B, K) cumulative log-probs
    prev_tokens: jax.Array  # (B, K)
    nodes: jax.Array  # (B, K) trie nodes (all zeros when no trie)
    lengths: jax.Array  # (B, K) emitted tokens (stops counting at freeze)


def _gather_beams(x: jax.Array, parents: jax.Array, K: int) -> jax.Array:
    """x (B*K, ...) gathered by per-batch parent beam ids (B, K)."""
    B = parents.shape[0]
    rows = (jnp.arange(B)[:, None] * K + parents).reshape(-1)
    return x[rows]


def _expand_beams(x: jax.Array, K: int) -> jax.Array:
    """(B, ...) -> (B*K, ...) by repeating each row K times (beam_replicate,
    reference model.lua:322-359)."""
    return jnp.repeat(x, K, axis=0)


def _count_emitted(toks: jax.Array, parent_frozen: jax.Array) -> jax.Array:
    """1 where the step contributed a real log-prob to the beam's score.

    Every non-PAD token scores its true log-prob.  A PAD from a *frozen*
    parent scores the forced 0 (freeze semantics) and is not counted; a
    first PAD from a live parent scores PAD's real log-prob and is counted —
    so length-normalized selection divides every beam by exactly the number
    of scored tokens.
    """
    return ((toks != vocab.PAD) | ~parent_frozen).astype(jnp.int32)


def _apply_trie_and_topk(
    total: jax.Array,  # (B, C) candidate scores (C = V at t=1, K*V later)
    valid: Optional[jax.Array],  # (B, C) bool or None
    K: int,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Top-K with trie masking and reference 'refill' semantics: if fewer
    than K candidates are valid, duplicate the best valid candidate.

    Third return: per-row count of *valid* beams (None without a trie) — the
    reference logs 'Warning: valid beam size: %d' whenever this falls short
    of K (model.lua:421-436,489-499); the host-side caller surfaces it.
    """
    if valid is not None:
        NEG = jnp.float32(-1e30)
        total = jnp.where(valid, total, NEG)
        scores, idx = lax.top_k(total, K)
        bad = scores <= NEG * 0.5
        nvalid = K - jnp.sum(bad, axis=1).astype(jnp.int32)  # (B,)
        scores = jnp.where(bad, scores[:, :1], scores)
        idx = jnp.where(bad, idx[:, :1], idx)
        return scores, idx, nvalid
    scores, idx = lax.top_k(total, K)
    return scores, idx, None


# Tests set these to exercise the fused Pallas greedy/beam paths on CPU
# (interpret mode); on TPU the paths activate via cfg.use_pallas.
_PALLAS_GREEDY_INTERPRET = False
_PALLAS_BEAM_INTERPRET = False
_PALLAS_BEAM_LOOP_INTERPRET = False


@partial(jax.jit, static_argnames=("cfg", "max_len", "use_trie"))
def greedy_decode(
    params: dict,
    batch_stats: dict,
    images: jax.Array,
    cfg: Config,
    max_len: int,
    trie_table: Optional[jax.Array] = None,
    use_trie: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fast path for beam_size=1: semantically identical to beam_decode with
    K=1 (argmax == top-1, parent backtracking is the identity), but with no
    beam state gathers/replication in the scan body — the hot loop is just
    the decoder cell + argmax.

    With cfg.use_pallas (default; no trie), the whole decode runs as one
    Pallas kernel — or the per-step fused tail as fallback — see
    greedy_from_context.
    """
    context, dec_init, _ = model.encode(params, batch_stats, images, cfg,
                                        train=False)
    return greedy_from_context(params, context, dec_init, cfg, max_len,
                               trie_table, use_trie)


def greedy_from_context(
    params: dict,
    context: jax.Array,  # (B, L, H) from model.encode
    dec_init: Tuple[jax.Array, jax.Array],
    cfg: Config,
    max_len: int,
    trie_table: Optional[jax.Array] = None,
    use_trie: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy decode from a precomputed encoder context.  Split out so
    combined eval programs (train_step.eval_decode_step, the sharded eval)
    run the CNN+encoder once and share it explicitly with the teacher-
    forced gold pass.  (XLA's CSE does merge bit-identical duplicated
    encodes, so this is robustness + tracing cost, not a device-time
    change: explicit sharing cannot silently break if the two encode
    call sites ever diverge by a cast or flag.)"""
    V = cfg.target_vocab_size
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    # Cast the (loop-invariant) context to the compute dtype ONCE here —
    # casting inside the scan would re-materialize the (B, L, H) array
    # every decode step.
    context = context.astype(cd)
    B = context.shape[0]
    dec_params = params["decoder"]
    proj = params["projector"]

    # All Pallas paths require a lane-aligned hidden size on real TPUs
    # (the kernels split wc at H on the sublane axis and tile (bt, H)
    # blocks); only H=1024 is hardware-validated.  Interpret-mode tests
    # run smaller H through the kernels on CPU.
    use_fused = (cfg.use_pallas
                 and not cfg.simple_attention
                 and (context.shape[2] % 128 == 0
                      or _PALLAS_GREEDY_INTERPRET)
                 and (jax.default_backend() == "tpu"
                      or _PALLAS_GREEDY_INTERPRET))
    if (not use_fused and cfg.pallas_greedy in ("loop", "tail")
            and cfg.use_pallas and not cfg.simple_attention
            and jax.default_backend() == "tpu"):
        # forced A/B modes must never measure a different path silently
        import warnings

        warnings.warn(
            f"pallas_greedy='{cfg.pallas_greedy}' requested but the fused "
            f"paths are unavailable (H={context.shape[2]} not "
            "lane-aligned); using the XLA path", stacklevel=2)
    if use_fused:
        # Preferred: the ENTIRE decode loop as one Pallas kernel — weights,
        # context, and decoder state VMEM-resident across all max_len steps,
        # per-tile early exit (ops/pallas/greedy_loop.py).  Dictionary
        # decoding stays in-kernel too: the dense trie transition table
        # rides along VMEM-resident when it fits (typical lexicons).
        # When the footprint would not fit VMEM (huge tries, long
        # contexts) the per-step fused tail below takes over — with the
        # trie table in HBM and the validity plane gathered by XLA.
        from aocr.ops.pallas import greedy_loop as _pgl

        H = context.shape[2]
        L = context.shape[1]
        vp = ((V + _pgl.LANE - 1) // _pgl.LANE) * _pgl.LANE
        trie_bytes = (_pgl.trie_table_bytes(trie_table.shape[0], vp)
                      if use_trie else 0)
        # 16 MB headroom under the 100 MB budget (same margin as
        # beam_step.fits_vmem): the estimate is exact for this kernel's
        # constant-index-map weights, but Mosaic retains freedom in
        # scratch/spill placement — a shape landing within epsilon of the
        # hard limit should take the tail fallback, not fail compilation.
        fits = (
            cfg.pallas_greedy in ("auto", "loop")
            and H % 128 == 0
            and _pgl.vmem_bytes(
                L, H, max_len, cfg.decoder_num_layers, cfg.input_feed,
                vp, vp, jnp.dtype(cd).itemsize, trie_bytes,
            ) <= _pgl.VMEM_BUDGET - 16 * 1024 * 1024
        )
        if cfg.pallas_greedy == "loop" and not fits:
            # a forced 'loop' silently measuring the tail would corrupt
            # A/B numbers (tools/ab_pallas.py) — say so
            import warnings

            warnings.warn(
                "pallas_greedy='loop' requested but the whole-decode "
                f"kernel does not fit (L={L}, H={H}, T={max_len}); "
                "falling back to the per-step fused tail", stacklevel=2)
        if fits:
            tables = _pgl.build_tables(
                dec_params, proj, cfg.target_embedding_size,
                cfg.input_feed, cd,
            )
            c0, h0 = dec_init
            labels, scores = _pgl.fused_greedy_loop(
                jnp.swapaxes(context, 0, 1), c0, h0, tables,
                cfg.decoder_num_layers, cfg.input_feed, max_len,
                interpret=_PALLAS_GREEDY_INTERPRET,
                trie_table=trie_table if use_trie else None,
            )
            return labels, scores

    if use_fused:
        # Per-step fused tail (with or without a trie): when the trie table
        # is too big for the whole-loop kernel's VMEM-resident copy, the
        # table stays in HBM, XLA gathers the current nodes' (B, V)
        # validity plane each step, and the kernel applies the mask — the
        # same split the fused beam tail uses, so Synth90k-scale
        # dictionaries keep a fused path instead of dropping to pure XLA.
        from aocr.ops.pallas import decode_step as _pds

        pw_pad, pb_pad = _pds.pad_projector(proj["w"].astype(cd), proj["b"])
        wa_cd = dec_params["w_a"].astype(cd)
        wc_cd = dec_params["w_c"].astype(cd)
        vp_tail = pw_pad.shape[1]
        # Scan-major context for the kernel: cancels against the encoder's
        # output transpose, so the custom call's layout demand does not
        # propagate into (and un-fuse) the encoder scans — that relayout
        # cost ~1.7 ms/call before this.
        ctx_lbh = jnp.swapaxes(context, 0, 1)

        def _pad_plane(ok):  # (B, V) bool -> (B, Vp) f32 0/1
            return jnp.pad(ok.astype(jnp.float32),
                           ((0, 0), (0, vp_tail - V)))

        def fused_step(state, prev, valid=None):
            cs, hs, h_top = decoder.lstm_stack(
                dec_params, state, prev, input_feed=cfg.input_feed,
                compute_dtype=cd,
            )
            h_tilde, tok, delta = _pds.fused_decode_tail(
                h_top, ctx_lbh, prev, wa_cd, wc_cd, pw_pad, pb_pad,
                interpret=_PALLAS_GREEDY_INTERPRET, valid=valid,
            )
            new_state = decoder.DecoderState(
                attn=h_tilde.astype(cd), cs=cs, hs=hs
            )
            return new_state, tok, delta

    state = decoder.init_state(dec_init, cfg.decoder_num_layers)
    go = jnp.full((B,), vocab.GO, jnp.int32)
    if use_fused:
        # GO is neither PAD nor EOS, so the kernel's freeze rule is a no-op
        # at t=1 — identical to the XLA first step below.  With a trie,
        # the t=1 plane is the root's children with NO PAD-allow (the XLA
        # path's t=1-no-PAD rule).
        valid0 = (_pad_plane(jnp.broadcast_to((trie_table[0] >= 0)[None, :],
                                              (B, V)))
                  if use_trie else None)
        state, tokens0, scores0 = fused_step(state, go, valid0)
        nodes0 = (jnp.maximum(trie_table[0][tokens0], 0) if use_trie
                  else jnp.zeros((B,), jnp.int32))
    else:
        state, h_tilde = decoder.step(
            dec_params, state, go, context, input_feed=cfg.input_feed,
            compute_dtype=cd, simple=cfg.simple_attention,
        )
        logp = head.apply(proj, h_tilde, compute_dtype=cd)  # (B, V)
        if use_trie:
            NEG = jnp.float32(-1e30)
            logp = jnp.where(trie_table[0][None, :] >= 0, logp, NEG)
        tokens0 = jnp.argmax(logp, axis=1).astype(jnp.int32)
        scores0 = jnp.max(logp, axis=1)
        nodes0 = (jnp.maximum(trie_table[0][tokens0], 0) if use_trie
                  else jnp.zeros((B,), jnp.int32))

    # lax.while_loop instead of a fixed-length scan: iteration stops the
    # moment every sequence has emitted EOS (the reference always runs all
    # max_decoder_l steps, model.lua:266-274 — transcript-identical since
    # frozen sequences only ever append PAD).  Token history lives in a
    # preallocated (T, B) buffer written with dynamic_update_slice.
    tok_buf = jnp.full((max_len, B), vocab.PAD, jnp.int32)
    tok_buf = tok_buf.at[0].set(tokens0)

    def w_cond(carry):
        t, _state, _score, prev, _nodes, _buf = carry
        return (t < max_len) & ~jnp.all(
            (prev == vocab.PAD) | (prev == vocab.EOS)
        )

    def w_body(carry):
        t, state, score, prev, nodes, buf = carry
        if use_fused:
            if use_trie:
                ok = trie_table[nodes] >= 0  # (B, V) gather, table in HBM
                ok = ok.at[:, vocab.PAD].set(True)
                st, tok, delta = fused_step(state, prev, _pad_plane(ok))
                stepped = trie_table[nodes, tok]
                nodes = jnp.where(tok == vocab.PAD, nodes,
                                  jnp.maximum(stepped, 0))
            else:
                st, tok, delta = fused_step(state, prev)
            score = score + delta
        else:
            st, h_t = decoder.step(
                dec_params, state, prev, context,
                input_feed=cfg.input_feed, compute_dtype=cd,
                simple=cfg.simple_attention,
            )
            lp = head.apply(proj, h_t, compute_dtype=cd)
            froz = (prev == vocab.PAD) | (prev == vocab.EOS)
            lp = lp.at[:, vocab.PAD].set(
                jnp.where(froz, 0.0, lp[:, vocab.PAD])
            )
            if use_trie:
                NEG = jnp.float32(-1e30)
                ok = trie_table[nodes] >= 0
                ok = ok.at[:, vocab.PAD].set(True)
                lp = jnp.where(ok, lp, NEG)
            tok = jnp.argmax(lp, axis=1).astype(jnp.int32)
            score = score + jnp.max(lp, axis=1)
            if use_trie:
                stepped = trie_table[nodes, tok]
                nodes = jnp.where(tok == vocab.PAD, nodes,
                                  jnp.maximum(stepped, 0))
        buf = lax.dynamic_update_slice(buf, tok[None], (t, 0))
        return (t + 1, st, score, tok, nodes, buf)

    (_, _, scores, _, _, tok_buf) = lax.while_loop(
        w_cond, w_body, (jnp.int32(1), state, scores0, tokens0, nodes0,
                         tok_buf)
    )
    labels = jnp.swapaxes(tok_buf, 0, 1)  # (B, T)
    return labels, scores


@partial(
    jax.jit,
    static_argnames=("cfg", "beam_size", "max_len", "use_trie",
                     "return_refills"),
)
def beam_decode(
    params: dict,
    batch_stats: dict,
    images: jax.Array,
    cfg: Config,
    beam_size: int,
    max_len: int,
    trie_table: Optional[jax.Array] = None,
    use_trie: bool = False,
    return_refills: bool = False,
) -> Tuple[jax.Array, ...]:
    """Decode a batch of images.

    Returns (labels (B, max_len) int32, scores (B,) float32 — the best
    beam's cumulative log-prob).  Greedy decoding is beam_size=1.

    With return_refills=True a third element (refill_rows, min_valid) is
    appended: how many (row, step) events had fewer than K valid trie
    continuations (and the smallest valid-beam count seen) — the on-device
    aggregate of the reference's per-row 'Warning: valid beam size: %d'
    log (model.lua:421-436,489-499).
    """
    context, dec_init, _ = model.encode(params, batch_stats, images, cfg,
                                        train=False)
    return beam_from_context(params, context, dec_init, cfg, beam_size,
                             max_len, trie_table, use_trie, return_refills)


def beam_from_context(
    params: dict,
    context: jax.Array,  # (B, L, H) from model.encode
    dec_init: Tuple[jax.Array, jax.Array],
    cfg: Config,
    beam_size: int,
    max_len: int,
    trie_table: Optional[jax.Array] = None,
    use_trie: bool = False,
    return_refills: bool = False,
) -> Tuple[jax.Array, ...]:
    """beam_decode from a precomputed encoder context (see
    greedy_from_context for why the encode sharing must be explicit)."""
    K = min(beam_size, cfg.target_vocab_size)
    if K == 1:
        out = greedy_from_context(params, context, dec_init, cfg, max_len,
                                  trie_table, use_trie)
        if return_refills:
            # The greedy fast path always has PAD as a valid continuation,
            # so refills cannot occur (reference beam_size=1 behaves the
            # same: PAD is accepted at vocab_id==1, model.lua:487).
            return out + ((jnp.int32(0), jnp.int32(K)),)
        return out
    V = cfg.target_vocab_size
    T = max_len
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    context = context.astype(cd)  # once, outside the scan (see greedy path)
    B = context.shape[0]
    dec_params = params["decoder"]
    proj = params["projector"]

    # ---- t = 1: batch-sized step with GO input ----
    state = decoder.init_state(dec_init, cfg.decoder_num_layers)
    go = jnp.full((B,), vocab.GO, jnp.int32)
    state, h_tilde = decoder.step(
        dec_params, state, go, context, input_feed=cfg.input_feed,
        compute_dtype=cd, simple=cfg.simple_attention,
    )
    logp = head.apply(proj, h_tilde, compute_dtype=cd)  # (B, V)

    if use_trie:
        root_valid = trie_table[0] >= 0  # children of root (GO node)
        valid0 = jnp.broadcast_to(root_valid[None, :], (B, V))
    else:
        valid0 = None
    scores, tokens0, nvalid0 = _apply_trie_and_topk(logp, valid0, K)  # (B, K)
    if nvalid0 is not None:
        refills0 = jnp.sum(nvalid0 < K).astype(jnp.int32)
        min_valid0 = jnp.min(nvalid0)
    else:
        refills0 = jnp.int32(0)
        min_valid0 = jnp.int32(K)

    if use_trie:
        nodes = trie_table[0][tokens0]  # (B, K); valid by construction
        nodes = jnp.maximum(nodes, 0)
    else:
        nodes = jnp.zeros((B, K), jnp.int32)

    # Whole-loop beam kernel (ops/pallas/beam_loop.py): every remaining
    # step (t >= 2) runs in ONE pallas_call — weights, context, trie table
    # and the full beam state VMEM-resident, per-tile early exit.  Unlike
    # the per-step fused tail below it has no per-call fixed costs to
    # amortize, so it is not gated on batch size.
    H = context.shape[2]
    L = context.shape[1]
    use_loop_kernel = (
        cfg.use_pallas and not cfg.simple_attention
        and cfg.pallas_beam != "tail"
        and (jax.default_backend() == "tpu" or _PALLAS_BEAM_LOOP_INTERPRET)
    )
    if use_loop_kernel:
        from aocr.ops.pallas import beam_loop as _pbl

        vp128 = ((V + 127) // 128) * 128
        use_loop_kernel = _pbl.fits(
            L, H, T, K, cfg.decoder_num_layers, cfg.input_feed,
            vp128, vp128, jnp.dtype(cd).itemsize,
            trie_table.shape[0] if use_trie else 0)
        if cfg.pallas_beam == "loop" and not use_loop_kernel:
            # a forced 'loop' silently measuring another path would corrupt
            # A/B numbers (tools/ab_pallas.py) — say so (greedy does the
            # same for pallas_greedy='loop')
            import warnings

            warnings.warn(
                "pallas_beam='loop' requested but the whole-beam-loop "
                f"kernel does not fit (L={L}, H={H}, T={T}, K={K}"
                + (f", trie_nodes={trie_table.shape[0]}" if use_trie
                   else "")
                + "); falling back to the XLA beam path", stacklevel=2)
    if use_loop_kernel:
        from aocr.ops.pallas import beam_loop as _pbl
        from aocr.ops.pallas import greedy_loop as _pgl

        tables = _pgl.build_tables(dec_params, proj,
                                   cfg.target_embedding_size,
                                   cfg.input_feed, cd)
        outs = _pbl.fused_beam_loop(
            jnp.swapaxes(context, 0, 1), state, tokens0, scores,
            nodes if use_trie else None, tables,
            cfg.decoder_num_layers, cfg.input_feed, T, K,
            bool(cfg.length_normalize),
            trie_table=trie_table if use_trie else None,
            interpret=_PALLAS_BEAM_LOOP_INTERPRET,
        )
        tok_hist, par_hist, fin_scores, fin_lengths = outs[:4]
        if use_trie:
            refills = refills0 + outs[4]
            min_valid = jnp.minimum(min_valid0, outs[5])
        else:
            refills, min_valid = refills0, min_valid0
        return _backtrack_best(cfg, fin_scores, fin_lengths, tok_hist,
                               par_hist, refills, min_valid,
                               return_refills)

    # Expand decoder state to B*K rows.  The context is NOT expanded: the
    # in-loop attention runs grouped against the original (B, L, H) array
    # (decoder.attention_grouped), saving K x the context HBM traffic the
    # reference's beam_replicate materializes (model.lua:322-359).
    state = jax.tree.map(lambda x: _expand_beams(x, K), state)

    # Fused beam tail (ops/pallas/beam_step.py): grouped attention +
    # projector + freeze + score-add + top-K in one kernel per batch tile,
    # reading the loop-invariant context once per step.  Reached only when
    # the whole-loop kernel above does not fit (e.g. very large tries).
    use_fused_beam = (
        cfg.use_pallas and not cfg.simple_attention
        and cfg.pallas_beam != "loop"
        and (jax.default_backend() == "tpu" or _PALLAS_BEAM_INTERPRET)
        and H % 128 == 0
        # Measured on v5e (docs/performance.md): the fused tail wins at
        # B>=512 (+8-12%) but is a wash at B=256, where the per-call fixed
        # costs (weight DMA per step) eat the context-traffic saving.  B is
        # static under jit, so gate on it — except in interpret-mode tests
        # and when -pallas_beam tail forces the tail for A/B measurement.
        and (B >= 512 or cfg.pallas_beam == "tail"
             or _PALLAS_BEAM_INTERPRET)
    )
    if use_fused_beam:
        from aocr.ops.pallas import beam_step as _pbs
        from aocr.ops.pallas import decode_step as _pds

        use_fused_beam = _pbs.fits_vmem(L, H, K, V, jnp.dtype(cd).itemsize,
                                        use_trie=use_trie)
    if (cfg.pallas_beam == "tail" and not use_fused_beam
            and (jax.default_backend() == "tpu" or _PALLAS_BEAM_INTERPRET)):
        # a forced 'tail' silently measuring the XLA path would corrupt
        # A/B numbers exactly like a silently-falling-back 'loop' — warn
        # the same way (tools/ab_pallas.py)
        import warnings

        warnings.warn(
            "pallas_beam='tail' requested but the fused beam tail is "
            f"unavailable (L={L}, H={H}, K={K}); falling back to the XLA "
            "beam path", stacklevel=2)
    if use_fused_beam:
        pwb_pad, pbb_pad = _pds.pad_projector(proj["w"].astype(cd), proj["b"])
        wab_cd = dec_params["w_a"].astype(cd)
        wcb_cd = dec_params["w_c"].astype(cd)
        ctx_lbh = jnp.swapaxes(context, 0, 1)  # scan-major, see greedy path

    carry0 = BeamCarry(
        state=state, scores=scores, prev_tokens=tokens0, nodes=nodes,
        lengths=jnp.ones((B, K), jnp.int32),
    )

    # lax.while_loop: iteration stops once every beam is frozen, and a
    # fully-frozen ROW is final even while other rows keep the loop alive
    # (see the row-freeze select in w_body for why) — the history buffers
    # are pre-filled with exactly what final rows would write: PAD tokens
    # and identity parents.
    tok_buf = jnp.full((T, B, K), vocab.PAD, jnp.int32)
    tok_buf = tok_buf.at[0].set(tokens0)
    par_buf = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, None, :], (T, B, K)
    )

    def w_cond(loop):
        t, carry, _tb, _pb, _rf, _mv = loop
        frozen = ((carry.prev_tokens == vocab.PAD)
                  | (carry.prev_tokens == vocab.EOS))
        return (t < T) & ~jnp.all(frozen)

    def w_body(loop):
        t, carry, tok_buf, par_buf, refills, min_valid = loop

        def run(carry: BeamCarry):
            cs, hs, h_top = decoder.lstm_stack(
                dec_params,
                carry.state,
                carry.prev_tokens.reshape(-1),
                input_feed=cfg.input_feed,
                compute_dtype=cd,
            )
            froz = (carry.prev_tokens == vocab.PAD) | (carry.prev_tokens == vocab.EOS)
            if use_fused_beam:
                valid_plane = None
                if use_trie:
                    # validity plane from the dense trie table (cheap
                    # (B, K)-row gather); masking + refill run in-kernel
                    vp_k = pwb_pad.shape[1]
                    child_ok = trie_table[carry.nodes] >= 0  # (B, K, V)
                    ok = child_ok.at[:, :, vocab.PAD].set(True)
                    okp = jnp.zeros((B, K, vp_k), jnp.float32)
                    okp = okp.at[:, :, :V].set(ok.astype(jnp.float32))
                    valid_plane = okp.reshape(B, K * vp_k)
                # (B*K, H) is row-major identical to (B, K*H): no transpose
                # at the kernel boundary.
                out_k = _pbs.fused_beam_tail(
                    ctx_lbh, h_top.reshape(B, K * H), carry.prev_tokens,
                    carry.scores, wab_cd, wcb_cd, pwb_pad, pbb_pad, K, V,
                    interpret=_PALLAS_BEAM_INTERPRET,
                    valid=valid_plane,
                )
                htld, new_scores, parents, toks = out_k[:4]
                st = decoder.DecoderState(
                    attn=htld.reshape(B * K, H), cs=cs, hs=hs
                )
                nvalid = out_k[4] if use_trie else None
            else:
                h_t = decoder.attention_grouped(
                    dec_params, h_top.reshape(B, K, -1), context, cd,
                    simple=cfg.simple_attention,
                ).reshape(B * K, -1)
                st = decoder.DecoderState(attn=h_t, cs=cs, hs=hs)
                lp = head.apply(proj, h_t, compute_dtype=cd)  # (B*K, V)
                lp = lp.reshape(B, K, V)
                # Freeze finished beams: PAD column log-prob := 0.
                lp = lp.at[:, :, vocab.PAD].set(
                    jnp.where(froz, 0.0, lp[:, :, vocab.PAD])
                )
                total = (carry.scores[:, :, None] + lp).reshape(B, K * V)
                if use_trie:
                    child_ok = trie_table[carry.nodes] >= 0  # (B, K, V)
                    ok = child_ok.at[:, :, vocab.PAD].set(True)  # PAD always allowed
                    valid = ok.reshape(B, K * V)
                else:
                    valid = None
                new_scores, raw, nvalid = _apply_trie_and_topk(total, valid, K)
                parents = raw // V  # (B, K)
                toks = raw % V
            new_state = jax.tree.map(
                lambda x: _gather_beams(x, parents, K), st
            )
            if use_trie:
                parent_nodes = jnp.take_along_axis(carry.nodes, parents, axis=1)
                stepped = trie_table[parent_nodes.reshape(-1), toks.reshape(-1)]
                stepped = stepped.reshape(B, K)
                # PAD keeps the parent's node (reference model.lua:505-509).
                new_nodes = jnp.where(toks == vocab.PAD, parent_nodes,
                                      jnp.maximum(stepped, 0))
            else:
                new_nodes = carry.nodes
            if cfg.length_normalize:
                parent_len = jnp.take_along_axis(carry.lengths, parents,
                                                 axis=1)
                parent_froz = jnp.take_along_axis(froz, parents, axis=1)
                new_lengths = parent_len + _count_emitted(
                    toks, parent_froz
                )
            else:
                new_lengths = carry.lengths
            return (
                BeamCarry(new_state, new_scores, toks, new_nodes,
                          new_lengths),
                (toks, parents, nvalid),
            )

        carry2, (toks, parents, nvalid) = run(carry)
        # A fully-frozen ROW is final.  Without this, a frozen row that the
        # while_loop keeps stepping (because OTHER rows are live) could
        # "resurrect" a beam: only frozen beams' PAD column is zeroed
        # (reference model.lua:448-449), so the best frozen beam's non-PAD
        # continuation can displace a much-lower-scoring beam.  That never
        # changes the un-normalized winner (slot 0 self-continues as PAD at
        # +0, the maximum), but under -length_normalize a resurrected
        # longer beam can win selection — making a row's transcript depend
        # on its BATCHMATES' liveness (and, in the whole-loop kernel, on
        # tile boundaries).  Freezing the row pins one deterministic,
        # batch-independent semantics across the XLA and kernel paths; the
        # reference itself would keep resurrecting through all 50 steps,
        # a behavior that is batch-shape-dependent here and irrelevant to
        # its shipped un-normalized selection.
        row_live = ~jnp.all(
            (carry.prev_tokens == vocab.PAD)
            | (carry.prev_tokens == vocab.EOS), axis=1)  # (B,)
        mk = ~row_live[:, None]
        toks = jnp.where(mk, vocab.PAD, toks)
        parents = jnp.where(mk, jnp.arange(K, dtype=jnp.int32)[None, :],
                            parents)
        carry2 = BeamCarry(
            state=carry2.state,  # unobservable once outputs are masked
            scores=jnp.where(mk, carry.scores, carry2.scores),
            prev_tokens=toks,
            nodes=jnp.where(mk, carry.nodes, carry2.nodes),
            lengths=jnp.where(mk, carry.lengths, carry2.lengths),
        )
        if nvalid is not None:
            # Only live (un-frozen) rows count: a fully-frozen row's sole
            # valid continuation is PAD by design, not a dictionary dead end.
            live = row_live
            short = (nvalid < K) & live
            refills = refills + jnp.sum(short).astype(jnp.int32)
            min_valid = jnp.minimum(
                min_valid, jnp.min(jnp.where(live, nvalid, K)))
        tok_buf = lax.dynamic_update_slice(tok_buf, toks[None], (t, 0, 0))
        par_buf = lax.dynamic_update_slice(par_buf, parents[None], (t, 0, 0))
        return (t + 1, carry2, tok_buf, par_buf, refills, min_valid)

    (_, carry, tok_hist, par_hist, refills, min_valid) = lax.while_loop(
        w_cond, w_body,
        (jnp.int32(1), carry0, tok_buf, par_buf, refills0, min_valid0)
    )
    # Histories include t=1 (parents at t=1 are unused by backtracking,
    # matching the reference where the final parent lookup is discarded);
    # post-exit rows keep the PAD/identity prefill.
    return _backtrack_best(cfg, carry.scores, carry.lengths, tok_hist,
                           par_hist, refills, min_valid, return_refills)


def _backtrack_best(cfg, scores, lengths, tok_hist, par_hist, refills,
                    min_valid, return_refills):
    """Best-beam selection + parent backtracking (reference
    model.lua:573-585), shared by the XLA while_loop and the whole-loop
    Pallas kernel paths."""
    B = scores.shape[0]
    if cfg.length_normalize:
        # BASELINE config-3 variant: select by score per emitted token.
        norm = scores / jnp.maximum(lengths, 1).astype(jnp.float32)
        best = jnp.argmax(norm, axis=1)
    else:
        best = jnp.argmax(scores, axis=1)  # (B,)
    best_scores = jnp.take_along_axis(
        scores, best[:, None], axis=1
    ).squeeze(1)
    rows = jnp.arange(B)

    def back(idx, inp):
        tok_t, par_t = inp
        lab = tok_t[rows, idx]
        return par_t[rows, idx], lab

    _, labels_rev = lax.scan(back, best, (tok_hist, par_hist), reverse=True)
    labels = jnp.swapaxes(labels_rev, 0, 1)  # (B, T)
    if return_refills:
        return labels, best_scores, (refills, min_valid)
    return labels, best_scores
