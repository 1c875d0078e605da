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
    emb = params["embedding"][targets]  # (B, T, E)
    E = emb.shape[-1]
    layer0 = params["layers"][0]
    # Hoist emb @ Wi[:E] for all timesteps.
    wi_emb = layer0["wi"][:E]
    emb_proj = (
        matmul(emb.astype(cd), wi_emb.astype(cd))
        + layer0["bi"] + layer0["bh"]
    )  # (B, T, 4H)
    emb_proj = jnp.swapaxes(emb_proj, 0, 1)  # (T, B, 4H)
    wfh = (
        jnp.concatenate(
            [layer0["wi"][E:].astype(cd), layer0["wh"].astype(cd)], axis=0
        )
        if input_feed else None
    )

    if dropout > 0.0 and train and dropout_rng is None:
        raise ValueError("dropout>0 in train mode requires dropout_rng")

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
