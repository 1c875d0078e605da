"""Full attention-OCR model: CNN -> bi-LSTM encoder -> attention decoder -> head.

The parameter tree is organized into the same five groups the reference
flattens separately (`/root/reference/src/model/model.lua:150,161-168`):
{cnn, encoder_fw, encoder_bw, decoder, projector} — group structure matters
because gradient clipping is applied *per group* at norm 5
(src/optim/optim_sgd.lua:50-52).

All functions are pure; BatchNorm running statistics travel in a separate
`batch_stats` pytree.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from aocr import loss as loss_lib
from aocr.config import Config
from aocr.models import cnn, decoder, encoder, head


class ModelState(NamedTuple):
    params: dict
    batch_stats: dict


def init(rng: jax.Array, cfg: Config) -> ModelState:
    k_cnn, k_fw, k_bw, k_dec, k_head = jax.random.split(rng, 5)
    params = {
        "cnn": cnn.init_params(k_cnn),
        "encoder_fw": encoder.init_params(
            k_fw, cfg.cnn_feature_size, cfg.encoder_num_hidden, cfg.encoder_num_layers
        ),
        "encoder_bw": encoder.init_params(
            k_bw, cfg.cnn_feature_size, cfg.encoder_num_hidden, cfg.encoder_num_layers
        ),
        "decoder": decoder.init_params(
            k_dec,
            cfg.target_vocab_size,
            cfg.target_embedding_size,
            cfg.decoder_num_hidden,
            cfg.decoder_num_layers,
            cfg.input_feed,
        ),
        "projector": head.init_params(
            k_head, cfg.decoder_num_hidden, cfg.target_vocab_size
        ),
    }
    return ModelState(params=params, batch_stats=cnn.init_batch_stats())


def _compute_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def encode(
    params: dict,
    batch_stats: dict,
    images: jax.Array,
    cfg: Config,
    train: bool = False,
    row_mask=None,
    axis_name=None,
):
    """images (B, 32, W, 1) -> (context (B,L,2H), dec_init (c0,h0), new_stats).

    row_mask (B,) marks real rows when the batch was padded to a shardable
    size; BatchNorm moments exclude masked-out rows.  axis_name (set under
    shard_map) turns BatchNorm into sync-BN: moments reduce across the data
    axis so sharded training sees the global-batch statistics."""
    cd = _compute_dtype(cfg)
    features, new_stats = cnn.apply(
        params["cnn"], batch_stats, images, train=train, compute_dtype=cd,
        row_mask=row_mask, axis_name=axis_name, use_pallas=cfg.use_pallas,
    )
    context, dec_init = encoder.apply(
        params["encoder_fw"], params["encoder_bw"], features,
        compute_dtype=cd, fused_l0=cfg.fused_encoder_proj,
    )
    return context, dec_init, new_stats


def forward_loss(
    params: dict,
    batch_stats: dict,
    images: jax.Array,
    targets: jax.Array,
    targets_eval: jax.Array,
    cfg: Config,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    row_mask=None,
    axis_name=None,
) -> Tuple[jax.Array, dict, jax.Array]:
    """Teacher-forced forward pass.

    Returns (token-sum NLL scalar, new batch_stats, log_probs (B, T, V)).
    Matches the reference feval forward (src/model/model.lua:284-316,553-568,
    643-645) up to the loss normalization noted in aocr/loss.py.  This is
    the ONE forward pipeline — the data-parallel step reuses it with
    axis_name set (sync-BN) rather than keeping a copy that can drift.
    """
    context, dec_init, new_stats = encode(params, batch_stats, images, cfg,
                                          train, row_mask=row_mask,
                                          axis_name=axis_name)
    nll, log_probs = loss_from_context(
        params, context, dec_init, targets, targets_eval, cfg,
        train=train, dropout_rng=dropout_rng,
    )
    return nll, new_stats, log_probs


def loss_from_context(
    params: dict,
    context: jax.Array,
    dec_init,
    targets: jax.Array,
    targets_eval: jax.Array,
    cfg: Config,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Teacher-forced decode + loss from a precomputed encoder context.

    Split out so combined eval programs (train_step.eval_decode_step, the
    sharded eval) run the CNN+encoder once and share its context with the
    beam decode explicitly (see decode.greedy_from_context).
    Returns (token-sum NLL, log_probs)."""
    cd = _compute_dtype(cfg)
    h_tildes = decoder.teacher_forced(
        params["decoder"],
        dec_init,
        targets,
        context,
        input_feed=cfg.input_feed,
        dropout=cfg.dropout,
        train=train,
        dropout_rng=dropout_rng,
        compute_dtype=cd,
        remat=cfg.remat,
        simple=cfg.simple_attention,
        custom_grad=cfg.decoder_custom_vjp,
        allow_kernel=cfg.num_model_shards == 1,
    )
    log_probs = head.apply(params["projector"], h_tildes, compute_dtype=cd)
    nll = loss_lib.nll_sum(log_probs, targets_eval)
    return nll, log_probs


def num_params(params: dict) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
