"""Input-feeding attention LSTM decoder.

Parity with the reference decoder cell (`/root/reference/src/model/LSTM.lua:18-162`):
- token embedding (LookupTable) of size E
- optional input feeding: layer-1 input is [emb ; h_tilde_prev]
  (src/model/LSTM.lua:61-65)
- stacked LSTM layers with fused 4H gates, dropout on inputs of layers > 1
- Luong "general" attention on the top hidden state:
  score_l = context_l . (W_a h_top), alpha = softmax(score),
  ctx = sum_l alpha_l context_l, h_tilde = tanh(W_c [ctx ; h_top])
  with bias-free projections (src/model/LSTM.lua:124-162, nn.LinearNoBias)
- dropout on h_tilde after attention (src/model/LSTM.lua:117)

Decoder state init (src/model/model.lua:539-552): layer 1 (c, h) from the
concatenated encoder final states, layers >= 2 zero, input-feed vector zero.

TPU-native: teacher-forced decoding is one `lax.scan` whose embedding input
projection is hoisted into a single MXU matmul over all timesteps; the scan
body contains only hidden-size matmuls and fused elementwise math.  Single-step
`step()` is shared by the on-device greedy/beam decode loops.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from aocr.ops import lstm
from aocr.ops.mm import einsum, matmul


class DecoderState(NamedTuple):
    attn: jax.Array  # (B, H) h_tilde from previous step (input feeding)
    cs: Tuple[jax.Array, ...]  # per-layer cell states (B, H)
    hs: Tuple[jax.Array, ...]  # per-layer hidden states (B, H)


def init_params(
    rng: jax.Array,
    vocab_size: int,
    embedding_size: int,
    num_hidden: int,
    num_layers: int,
    input_feed: bool,
) -> dict:
    ks = jax.random.split(rng, num_layers + 3)
    # Torch LookupTable default init: normal(0, 1).
    embedding = jax.random.normal(ks[0], (vocab_size, embedding_size), jnp.float32)
    layers = []
    for i in range(num_layers):
        in_sz = (embedding_size + (num_hidden if input_feed else 0)) if i == 0 else num_hidden
        layers.append(lstm.init_lstm_layer(ks[i + 1], in_sz, num_hidden))
    ba = 1.0 / math.sqrt(num_hidden)
    bc = 1.0 / math.sqrt(2 * num_hidden)
    return {
        "embedding": embedding,
        "layers": layers,
        # Bias-free attention projections (reference nn.LinearNoBias,
        # src/utils/model_utils.lua:57-117: uniform(+-1/sqrt(fan_in))).
        "w_a": jax.random.uniform(ks[-2], (num_hidden, num_hidden), jnp.float32, -ba, ba),
        "w_c": jax.random.uniform(ks[-1], (2 * num_hidden, num_hidden), jnp.float32, -bc, bc),
    }


def init_state(
    dec_init: Tuple[jax.Array, jax.Array], num_layers: int
) -> DecoderState:
    """Layer-1 state from encoder finals; other layers and input feed zero."""
    c0, h0 = dec_init
    B, H = c0.shape
    zeros = jnp.zeros((B, H), c0.dtype)
    cs = (c0,) + tuple(zeros for _ in range(num_layers - 1))
    hs = (h0,) + tuple(zeros for _ in range(num_layers - 1))
    return DecoderState(attn=zeros, cs=cs, hs=hs)


def attention(
    params: dict,
    h_top: jax.Array,
    context: jax.Array,
    ctx_mask: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    simple: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Luong-general attention.  Returns (h_tilde (B,H), alpha (B,L)).

    simple=True selects the reference's additive combination variant
    (src/model/LSTM.lua:152-160): h_tilde = ctx + h_top, with no W_c
    projection and no tanh.  The reference always builds the concat form
    (`create_decoder_attn` is only ever called with simple=0,
    src/model/LSTM.lua:113); the variant is exposed via
    `-simple_attention` for completeness.
    """
    cd = compute_dtype
    query = matmul(h_top.astype(cd), params["w_a"].astype(cd))  # (B, H)
    scores = einsum("blh,bh->bl", context.astype(cd), query.astype(cd))
    if ctx_mask is not None:
        scores = jnp.where(ctx_mask, scores, -1e30)
    alpha = jax.nn.softmax(scores, axis=-1)
    ctx = einsum("bl,blh->bh", alpha.astype(cd), context.astype(cd))
    if simple:
        return ctx + h_top.astype(ctx.dtype), alpha
    cat = jnp.concatenate([ctx, h_top], axis=-1)
    h_tilde = jnp.tanh(matmul(cat.astype(cd), params["w_c"].astype(cd)))
    return h_tilde, alpha


def attention_grouped(
    params: dict,
    h_top: jax.Array,  # (B, K, H) — K query rows per context row
    context: jax.Array,  # (B, L, H)
    compute_dtype=jnp.float32,
    simple: bool = False,
) -> jax.Array:
    """Luong-general attention for beam search WITHOUT expanding context.

    The reference replicates the context to (B*K, L, ...) rows
    (beam_replicate, model.lua:322-359); materializing that repeat costs
    K x the context HBM traffic per decode step.  Batched einsums against
    the original (B, L, H) context compute exactly the same math.
    Returns h_tilde (B, K, H)."""
    cd = compute_dtype
    query = einsum("bkh,hj->bkj", h_top.astype(cd), params["w_a"].astype(cd))
    scores = einsum("blh,bkh->bkl", context.astype(cd), query.astype(cd))
    alpha = jax.nn.softmax(scores, axis=-1)  # (B, K, L)
    ctx = einsum("bkl,blh->bkh", alpha.astype(cd), context.astype(cd))
    if simple:  # additive variant, see attention()
        return ctx + h_top.astype(ctx.dtype)
    cat = jnp.concatenate([ctx, h_top], axis=-1)  # (B, K, 2H)
    return jnp.tanh(einsum("bkj,jh->bkh", cat.astype(cd),
                           params["w_c"].astype(cd)))


def _dropout(x, rate, rng, train):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def lstm_stack(
    params: dict,
    state: DecoderState,
    tokens: jax.Array,
    *,
    input_feed: bool,
    dropout: float = 0.0,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...], jax.Array]:
    """Embedding + (input-feed concat) + stacked LSTM layers — everything
    in a decode step *before* the attention head.  Returns (cs, hs, h_top).
    Split out so the Pallas fused decode tail (ops/pallas/decode_step.py)
    can take over from h_top."""
    emb = params["embedding"][tokens]  # (B, E)
    x = jnp.concatenate([emb, state.attn], axis=-1) if input_feed else emb
    cs, hs = [], []
    for i, layer in enumerate(params["layers"]):
        if i > 0:
            if dropout > 0.0 and train:
                dropout_rng, k = jax.random.split(dropout_rng)
                x = _dropout(x, dropout, k, train)
        c, h = lstm.lstm_step(layer, x, state.cs[i], state.hs[i],
                              compute_dtype=compute_dtype)
        cs.append(c)
        hs.append(h)
        x = h
    return tuple(cs), tuple(hs), hs[-1]


def step(
    params: dict,
    state: DecoderState,
    tokens: jax.Array,
    context: jax.Array,
    *,
    input_feed: bool,
    ctx_mask: Optional[jax.Array] = None,
    dropout: float = 0.0,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    simple: bool = False,
) -> Tuple[DecoderState, jax.Array]:
    """One decode step from token ids.  Returns (new_state, h_tilde (B,H)).

    The Pallas-fused greedy tail (ops/pallas/decode_step.py) replaces
    attention+projector+argmax wholesale in decode.greedy_decode; this
    XLA step remains the beam-search and fallback path."""
    stack_rng = tail_rng = None
    if dropout > 0.0 and train:
        if dropout_rng is None:
            raise ValueError("dropout > 0 with train=True needs a "
                             "dropout_rng")
        stack_rng, tail_rng = jax.random.split(dropout_rng)
    cs, hs = lstm_stack(
        params, state, tokens, input_feed=input_feed, dropout=dropout,
        train=train, dropout_rng=stack_rng, compute_dtype=compute_dtype,
    )[:2]
    h_tilde, _alpha = attention(params, hs[-1], context, ctx_mask,
                                compute_dtype, simple=simple)
    if dropout > 0.0 and train:
        h_tilde = _dropout(h_tilde, dropout, tail_rng, train)
    new_state = DecoderState(attn=h_tilde, cs=tuple(cs), hs=tuple(hs))
    return new_state, h_tilde


_TF_VJP_CACHE: dict = {}

# Tests set this to run the Pallas decoder-backward kernel on CPU
# (interpret mode); on TPU the kernel activates for bfloat16 compute.
_PALLAS_TF_BWD_INTERPRET = False

# Same for the whole-scan teacher-forced FORWARD kernel (ops/pallas/tf_fwd).
_PALLAS_TF_FWD_INTERPRET = False


def _tf_core(num_layers: int, input_feed: bool, cd, allow_kernel: bool = True):
    """Custom-VJP teacher-forced decoder scan for a static
    (num_layers, input_feed, compute_dtype).

    Why not plain autodiff (second attempt; the r2 one was cut): the
    backward scan of the decoder carries every WEIGHT gradient — ~110 MB
    of f32 accumulators (dWfh0, dWcat_l, dW_a, dW_c) read-modified-written
    on every one of the T backward steps.  The train-step trace shows
    those accumulator fusions (select_add on f32[1024,4096] /
    [2048,1024] / [1024,1024] + the per-step bf16[2048,4096] outer
    products) as the largest slice of the decoder backward.  Here the
    backward scan carries only the recurrent cotangent chain
    (dattn + per-layer dc/dh) and stacks per-step gate/attention
    cotangents in the compute dtype; every weight gradient then comes
    from one large batched matmul over the whole sequence.  Gate
    activations, attention scores and context vectors are not stored —
    they recompute from the stacked h sequences in batched matmuls
    (same selective-remat trade as the encoder scan VJP,
    aocr/ops/lstm._scan_custom).

    The forward scan body is the exact computation teacher_forced's
    autodiff path runs, so primal outputs are bit-identical.
    """
    key = (num_layers, input_feed, jnp.dtype(cd).name, allow_kernel)
    if key in _TF_VJP_CACHE:
        return _TF_VJP_CACHE[key]

    def fwd_scan(weights, xp, context, c0, h0, collect: bool):
        wfh0 = weights["wfh0"]
        B = c0.shape[0]
        H = c0.shape[1]
        zeros = jnp.zeros((B, H), c0.dtype)
        state0 = DecoderState(
            attn=zeros,
            cs=(c0,) + tuple(zeros for _ in range(num_layers - 1)),
            hs=(h0,) + tuple(zeros for _ in range(num_layers - 1)),
        )

        def body(state, xp_t):
            if input_feed:
                ah = jnp.concatenate(
                    [state.attn.astype(cd), state.hs[0].astype(cd)], axis=-1
                )
            else:
                ah = state.hs[0].astype(cd)
            gates = xp_t + matmul(ah, wfh0)
            c0n, h0n, ifog0 = lstm.gate_math_parts(gates, state.cs[0])
            cs, hs, ifogs = [c0n], [h0n], [ifog0]
            x = h0n
            for li in range(1, num_layers):
                w, bi_, bh_ = weights["rest"][li - 1]
                xh = jnp.concatenate([x, state.hs[li]], axis=-1).astype(cd)
                # + bi + bh separately: bit-identical to lstm.lstm_step
                g = matmul(xh, w) + bi_ + bh_
                c, h, ifog = lstm.gate_math_parts(g, state.cs[li])
                cs.append(c)
                hs.append(h)
                ifogs.append(ifog)
                x = h
            # attention, inlined so alpha/cvec can be saved as residuals
            # (same op sequence as attention(); bit-identical outputs)
            query = matmul(hs[-1].astype(cd), weights["wa"])
            scores = einsum("blh,bh->bl", context.astype(cd),
                               query.astype(cd))
            alpha = jax.nn.softmax(scores, axis=-1)
            cvec = einsum("bl,blh->bh", alpha.astype(cd),
                             context.astype(cd))
            cat = jnp.concatenate([cvec, hs[-1]], axis=-1)
            h_tilde = jnp.tanh(matmul(cat.astype(cd), weights["wc"]))
            new_state = DecoderState(attn=h_tilde, cs=tuple(cs),
                                     hs=tuple(hs))
            if collect:
                # residuals stacked by the scan: the backward pass reads
                # them instead of recomputing (autodiff's residual trade)
                out = (h_tilde, tuple(hs),
                       tuple(jnp.concatenate(g4, axis=-1).astype(cd)
                             for g4 in ifogs),
                       tuple(c.astype(cd) for c in cs),
                       alpha, cvec.astype(cd))
            else:
                out = h_tilde
            return new_state, out

        return lax.scan(body, state0, xp, unroll=lstm.SCAN_UNROLL)

    def _fwd_kernel_ok(context, c0, T):
        """Route the forward scan through the whole-scan Pallas kernel
        (ops/pallas/tf_fwd) under the same conditions as the backward:
        never under GSPMD TP (allow_kernel=False), interpret mode on CPU
        for tests, else TPU + bf16 + a VMEM-estimate fit."""
        from aocr.ops.pallas import tf_fwd as _tff

        if not allow_kernel or not _tff.ENABLE:
            return False
        if _PALLAS_TF_FWD_INTERPRET:
            return True
        if cd != jnp.bfloat16 or jax.default_backend() != "tpu":
            return False
        return _tff.fits(context.shape[1], c0.shape[1], num_layers,
                         input_feed, jnp.dtype(cd).itemsize, T)

    def _fwd_kernel_call(weights, xp, context, c0, h0, collect):
        from aocr.ops.pallas import tf_fwd as _tff

        # scan-major context, shared (CSE) with the backward kernel's
        ctx_lbh = jnp.swapaxes(context.astype(cd), 0, 1)
        # xp passes in its stored dtype (f32, or cd under
        # lstm.XPROJ_COMPUTE_DTYPE); the kernel upcasts per-tile.
        return _tff.decoder_fwd_scan(
            ctx_lbh, weights["wfh0"], tuple(weights["rest"]),
            weights["wa"], weights["wc"],
            xp, c0, h0, input_feed, collect,
            interpret=_PALLAS_TF_FWD_INTERPRET)

    @jax.custom_vjp
    def core(weights, xp, context, c0, h0):
        if _fwd_kernel_ok(context, c0, xp.shape[0]):
            return _fwd_kernel_call(weights, xp, context, c0, h0,
                                    collect=False)
        _, h_tildes = fwd_scan(weights, xp, context, c0, h0, collect=False)
        return h_tildes  # (T, B, H) scan-major

    def fwd(weights, xp, context, c0, h0):
        if _fwd_kernel_ok(context, c0, xp.shape[0]):
            (h_tildes, hs_layers, ifog_seq, cs_cd, alpha_seq,
             cvec_cd) = _fwd_kernel_call(weights, xp, context, c0, h0,
                                         collect=True)
        else:
            _, (h_tildes, hs_layers, ifog_seq, cs_cd, alpha_seq,
                cvec_cd) = fwd_scan(weights, xp, context, c0, h0,
                                    collect=True)
        return h_tildes, (weights, xp, context, c0, h0, h_tildes, hs_layers,
                          ifog_seq, cs_cd, alpha_seq, cvec_cd)

    def bwd(res, dys):
        (weights, xp, context, c0, h0, htl, hs_layers,
         ifog_seq, cs_cd, alpha_seq, cvec_cd) = res
        # htl: (T, B, H) h_tilde sequence; hs_layers: tuple over layers of
        # (T, B, H); dys: (T, B, H) cotangent of the output sequence.
        T, B, H = htl.shape
        wfh0 = weights["wfh0"]
        wa, wc = weights["wa"], weights["wc"]
        f32 = jnp.float32
        zeros = jnp.zeros((B, H), f32)

        def shifted(seq, init):  # h_{l, t-1} sequence
            return jnp.concatenate([init[None].astype(seq.dtype), seq[:-1]],
                                   axis=0)

        # ---- batched recompute of every per-step activation ----
        h_prev = [shifted(hs_layers[0], h0)]
        for li in range(1, num_layers):
            h_prev.append(shifted(hs_layers[li], zeros))
        htl_prev = shifted(htl, zeros)
        if input_feed:
            ah_seq = jnp.concatenate(
                [htl_prev.astype(cd), h_prev[0].astype(cd)], axis=-1)
        else:
            ah_seq = h_prev[0].astype(cd)
        xh_seqs = [ah_seq]
        for li in range(1, num_layers):
            xh = jnp.concatenate(
                [hs_layers[li - 1].astype(cd), h_prev[li].astype(cd)],
                axis=-1)
            xh_seqs.append(xh)
        # activations/cell states/alphas/cvecs come from the residual
        # stacks saved by the forward scan (no recompute); only c_prev
        # needs a shift
        cs_seq = list(cs_cd)
        cprev_seq = []
        for li in range(num_layers):
            cinit = (c0 if li == 0 else zeros)
            cprev_seq.append(shifted(cs_cd[li], cinit.astype(cs_cd[li].dtype)))
        h_top_seq = hs_layers[-1]  # (T, B, H)
        ctx_cd = context.astype(cd)
        q_seq = matmul(h_top_seq.astype(cd), wa)  # for dctx only
        alpha = alpha_seq
        cvec_seq = cvec_cd

        # Interpret mode tests the kernel path on CPU — but never where
        # allow_kernel=False (tensor parallelism forbids the opaque pallas
        # call precisely because GSPMD cannot partition it).
        use_kernel = allow_kernel and bool(_PALLAS_TF_BWD_INTERPRET)
        if (not use_kernel and allow_kernel and cd == jnp.bfloat16
                and jax.default_backend() == "tpu"):
            from aocr.ops.pallas import tf_bwd as _tfb

            use_kernel = _tfb.fits(context.shape[1], H, num_layers,
                                   input_feed, jnp.dtype(cd).itemsize, T)
        if use_kernel:
            # Whole backward recurrence as one Pallas kernel: context +
            # transposed weights VMEM-resident, carries in scratch,
            # activation stacks streamed per (tile, reversed-step) —
            # see ops/pallas/tf_bwd.py.
            from aocr.ops.pallas import tf_bwd as _tfb

            # the kernel consumes the residual (T, B, 4H) stacks as-is
            # and the weights in their STORED orientation (it contracts on
            # axis 1 in-kernel — no materialized transposes, tf_bwd.py)
            ifog_stacks = tuple(g.astype(cd) for g in ifog_seq)
            (dxp_cd, dgates_rest, dht_seq, dq_seq, dcvec_seq, dscore_seq,
             dc0_f, dh0_f) = _tfb.decoder_bwd_scan(
                jnp.swapaxes(ctx_cd, 0, 1),
                wfh0,
                tuple(w for (w, _bi, _bh) in weights["rest"]),
                wc, wa,
                dys.astype(f32), htl.astype(f32), alpha.astype(f32),
                ifog_stacks,
                tuple(c.astype(cd) for c in cs_seq),
                tuple(c.astype(cd) for c in cprev_seq),
                input_feed,
                interpret=_PALLAS_TF_BWD_INTERPRET,
            )
            dxp = dxp_cd
        else:
            acts = []
            for li in range(num_layers):
                g4 = ifog_seq[li]
                Hh = g4.shape[-1] // 4
                acts.append((g4[..., :Hh], g4[..., Hh:2 * Hh],
                             g4[..., 2 * Hh:3 * Hh], g4[..., 3 * Hh:]))
            dxp, dgates_rest, dht_seq, dq_seq, dcvec_seq, dscore_seq, \
                dc0_f, dh0_f = _tf_bwd_scan_xla(
                    weights, num_layers, input_feed, cd, ctx_cd, dys, htl,
                    acts, cs_seq, cprev_seq, alpha, c0, zeros)
        # ---- weight / bias / context grads: batched over the sequence ----
        # (The two-dim (t, b) contraction lowers to XLA:TPU's windowed
        # conv emitter; a flattened (T*B, .) single-axis form measured a
        # wash — tools/ab_wgrad.py — so the direct einsum stays.)
        dweights = {"wfh0": None, "rest": [], "wa": None, "wc": None}
        dweights["wfh0"] = einsum("tbd,tbg->dg", ah_seq,
                                     dxp.astype(cd)).astype(
                                         weights["wfh0"].dtype)
        for li in range(1, num_layers):
            w, bi_, bh_ = weights["rest"][li - 1]
            dw = einsum("tbd,tbg->dg", xh_seqs[li], dgates_rest[li - 1])
            db = jnp.sum(dgates_rest[li - 1].astype(f32), axis=(0, 1))
            dweights["rest"].append((dw.astype(w.dtype),
                                     db.astype(bi_.dtype),
                                     db.astype(bh_.dtype)))
        cat_seq = jnp.concatenate(
            [cvec_seq.astype(cd), h_top_seq.astype(cd)], axis=-1)
        dweights["wc"] = einsum("tbd,tbh->dh", cat_seq,
                                   dht_seq).astype(wc.dtype)
        dweights["wa"] = einsum("tbh,tbj->hj", h_top_seq.astype(cd),
                                   dq_seq).astype(wa.dtype)
        dweights["rest"] = tuple(dweights["rest"])
        dctx = (
            einsum("tbl,tbh->blh", alpha.astype(cd), dcvec_seq)
            + einsum("tbl,tbh->blh", dscore_seq.astype(cd),
                        q_seq.astype(cd))
        ).astype(context.dtype)
        return (dweights, dxp.astype(xp.dtype), dctx,
                dc0_f.astype(c0.dtype), dh0_f.astype(h0.dtype))

    core.defvjp(fwd, bwd)
    _TF_VJP_CACHE[key] = core
    return core


def _tf_bwd_scan_xla(weights, num_layers, input_feed, cd, ctx_cd, dys, htl,
                     acts, cs_seq, cprev_seq, alpha, c0, zeros):
    """XLA lax.scan fallback for the decoder backward recurrence (float32
    mode / non-TPU backends); gradient-exact vs autodiff.  Returns the same
    stacks as ops/pallas/tf_bwd.decoder_bwd_scan."""

    f32 = jnp.float32
    T, B, H = htl.shape
    wfh0 = weights["wfh0"]
    wa, wc = weights["wa"], weights["wc"]
    dtanh = (1.0 - htl * htl).astype(f32)
    wc_t = wc.astype(cd).T
    wa_t = wa.astype(cd).T
    wfh0_t = wfh0.T
    rest_t = [w.T for (w, _bi, _bh) in weights["rest"]]

    def body(carry, per_t):
        dattn, dcs, dhs = carry
        (dy_t, dtanh_t, alpha_t, per_layer) = per_t
        dht = (dattn + dy_t) * dtanh_t  # d(pre-tanh) (B, H) f32
        dcat = matmul(dht.astype(cd), wc_t)  # (B, 2H)
        dcvec = dcat[:, :H]
        dtop = dcat[:, H:].astype(f32)
        dalpha = einsum("bh,blh->bl", dcvec.astype(cd), ctx_cd)
        tmp = alpha_t * dalpha
        dscore = tmp - alpha_t * jnp.sum(tmp, axis=-1, keepdims=True)
        dq = einsum("bl,blh->bh", dscore.astype(cd), ctx_cd)
        dtop = dtop + matmul(dq.astype(cd), wa_t).astype(f32)
        new_dcs, new_dhs = list(dcs), list(dhs)
        dgates_out = []
        dx_above = None
        for li in range(num_layers - 1, -1, -1):
            i_t, f_t, o_t, g_t, c_t, cp_t = per_layer[li]
            dh_l = dhs[li] + (dtop if li == num_layers - 1 else dx_above)
            tc = jnp.tanh(c_t)
            do = dh_l * tc
            dc_l = dcs[li] + dh_l * o_t * (1.0 - tc * tc)
            di = dc_l * g_t
            dg = dc_l * i_t
            df = dc_l * cp_t
            new_dcs[li] = dc_l * f_t
            dgates = jnp.concatenate([
                di * i_t * (1.0 - i_t),
                df * f_t * (1.0 - f_t),
                do * o_t * (1.0 - o_t),
                dg * (1.0 - g_t * g_t),
            ], axis=-1)  # (B, 4H) f32
            dgates_out.append(dgates)
            if li > 0:
                dxh = matmul(dgates.astype(cd), rest_t[li - 1])
                dx_above = dxh[:, :H].astype(f32)
                new_dhs[li] = dxh[:, H:].astype(f32)
            else:
                dah = matmul(dgates.astype(cd), wfh0_t)
                if input_feed:
                    new_dattn = dah[:, :H].astype(f32)
                    new_dhs[0] = dah[:, H:].astype(f32)
                else:
                    new_dattn = jnp.zeros_like(dattn)
                    new_dhs[0] = dah.astype(f32)
        dgates_out.reverse()  # layer order 0..N-1
        stacks = ((dgates_out[0],)  # f32: becomes dxp directly
                  + tuple(dg.astype(cd) for dg in dgates_out[1:])
                  + (dht.astype(cd), dq.astype(cd), dcvec.astype(cd),
                     dscore))
        return (new_dattn, tuple(new_dcs), tuple(new_dhs)), stacks

    per_layer_seq = tuple(
        (acts[li][0], acts[li][1], acts[li][2], acts[li][3],
         cs_seq[li], cprev_seq[li])
        for li in range(num_layers)
    )
    carry0 = (zeros, tuple(zeros for _ in range(num_layers)),
              tuple(zeros for _ in range(num_layers)))
    (dattn_f, dcs_f, dhs_f), stacks = lax.scan(
        body, carry0,
        (dys.astype(f32), dtanh, alpha, per_layer_seq),
        reverse=True,
    )
    dxp = stacks[0]  # (T, B, 4H) f32
    dgates_rest = stacks[1:num_layers]
    dht_seq, dq_seq, dcvec_seq, dscore_seq = stacks[num_layers:]
    return (dxp, dgates_rest, dht_seq, dq_seq, dcvec_seq, dscore_seq,
            dcs_f[0], dhs_f[0])


def teacher_forced(
    params: dict,
    dec_init: Tuple[jax.Array, jax.Array],
    targets: jax.Array,
    context: jax.Array,
    *,
    input_feed: bool,
    ctx_mask: Optional[jax.Array] = None,
    dropout: float = 0.0,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
    simple: bool = False,
    custom_grad: bool = True,
    allow_kernel: bool = True,
) -> jax.Array:
    """Teacher-forced decode over targets (B, T) -> h_tildes (B, T, H).

    Replaces the reference's per-timestep clone loop
    (src/model/model.lua:553-568) with one `lax.scan`; the embedding part of
    the layer-1 input projection is precomputed for all T steps in a single
    matmul (the input-feed part stays in the recurrence since h_tilde_{t-1}
    feeds step t).
    """
    B, T = targets.shape
    num_layers = len(params["layers"])
    state0 = init_state(dec_init, num_layers)
    cd = compute_dtype
    emb = params["embedding"][targets.T]  # (T, B, E) scan-major
    E = emb.shape[-1]
    layer0 = params["layers"][0]
    # Hoist emb @ Wi[:E] for all timesteps, in scan-major form: the
    # matmul produces (T, B, 4H) directly, so neither the forward nor its
    # VJP materializes a (B, T, 4H) <-> (T, B, 4H) transpose of the big
    # f32 stack (the backward transpose measured 1.4 ms/step at B=400 in
    # the train trace; transposing the (T, B, E) embedding rows instead
    # is ~100x smaller).
    wi_emb = layer0["wi"][:E]
    emb_proj = (
        matmul(emb.astype(cd), wi_emb.astype(cd))
        + layer0["bi"] + layer0["bh"]
    )  # (T, B, 4H)
    if lstm.XPROJ_COMPUTE_DTYPE and cd != jnp.float32:
        # Store the hoisted projection in the compute dtype (see
        # lstm.XPROJ_COMPUTE_DTYPE).  The astype boundary keeps the bias
        # grads f32-accumulated: its VJP upcasts the (T, B, 4H) cotangent
        # before the bias-add reduce.
        emb_proj = emb_proj.astype(cd)
    wfh = (
        jnp.concatenate(
            [layer0["wi"][E:].astype(cd), layer0["wh"].astype(cd)], axis=0
        )
        if input_feed else None
    )

    if dropout > 0.0 and train and dropout_rng is None:
        raise ValueError("dropout>0 in train mode requires dropout_rng")

    use_custom = (
        custom_grad and not remat and not simple and ctx_mask is None
        and not (dropout > 0.0 and train)
    )
    if use_custom:
        # Custom-VJP scan: identical forward, hand-written backward with
        # weight gradients hoisted out of the backward loop (_tf_core).
        # allow_kernel=False keeps the pure-XLA backward under GSPMD
        # tensor parallelism: an opaque pallas custom call cannot be
        # partitioned over the model axis, while every op of the XLA
        # fallback can.
        core = _tf_core(num_layers, input_feed, cd,
                        allow_kernel=allow_kernel)
        wfh0 = wfh if input_feed else layer0["wh"].astype(cd)
        rest = tuple(
            (jnp.concatenate([l["wi"].astype(cd), l["wh"].astype(cd)],
                             axis=0), l["bi"], l["bh"])
            for l in params["layers"][1:]
        )
        weights = {
            "wfh0": wfh0, "rest": rest,
            "wa": params["w_a"].astype(cd), "wc": params["w_c"].astype(cd),
        }
        c0_init, h0_init = dec_init
        h_tildes = core(weights, emb_proj, context, c0_init, h0_init)
        return jnp.swapaxes(h_tildes, 0, 1)  # (B, T, H)

    def body(carry, inputs):
        state, rng = carry
        xp = inputs
        if rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        if input_feed:
            # Fused [attn ; h] @ [Wi_feed ; Wh] — one MXU matmul per step.
            ah = jnp.concatenate(
                [state.attn.astype(cd), state.hs[0].astype(cd)], axis=-1
            )
            gates = xp + matmul(ah, wfh)
        else:
            gates = xp + matmul(state.hs[0].astype(cd),
                                layer0["wh"].astype(cd))
        c0n, h0n = lstm.gate_math(gates, state.cs[0])
        cs, hs = [c0n], [h0n]
        x = h0n
        for i in range(1, num_layers):
            if dropout > 0.0 and train:
                sub, k = jax.random.split(sub)
                x = _dropout(x, dropout, k, train)
            c, h = lstm.lstm_step(params["layers"][i], x, state.cs[i],
                                  state.hs[i], compute_dtype=cd)
            cs.append(c)
            hs.append(h)
            x = h
        h_tilde, _ = attention(params, hs[-1], context, ctx_mask, cd,
                               simple=simple)
        if dropout > 0.0 and train:
            sub, k = jax.random.split(sub)
            h_tilde = _dropout(h_tilde, dropout, k, train)
        new_state = DecoderState(attn=h_tilde, cs=tuple(cs), hs=tuple(hs))
        return (new_state, rng), h_tilde

    rng0 = dropout_rng if (dropout > 0.0 and train) else None
    scan_body = jax.checkpoint(body) if remat else body
    (_, _), h_tildes = lax.scan(scan_body, (state0, rng0), emb_proj,
                                unroll=lstm.SCAN_UNROLL)
    return jnp.swapaxes(h_tildes, 0, 1)  # (B, T, H)
