"""Jitted training / evaluation steps.

Replaces the reference's feval + sgd_list closure dance
(`/root/reference/src/model/model.lua:284-706`) with pure jitted functions:
one fused forward+backward+update program per (config, batch shape).

Loss scaling parity: feval divides the token-sum NLL by batch_size before
backprop (model.lua:645-647) — so gradients (and the clip-at-5 threshold)
are on the mean-over-batch scale — and `model:step` returns loss*batch_size
(model.lua:701), i.e. the raw token sum.  Both behaviors are reproduced.

The reference's `-prealloc` flag (buffer preallocation/sharing,
src/utils/memory.lua) maps to XLA input-buffer donation: with prealloc the
params/optimizer-state buffers are donated to the update step so XLA reuses
them in place.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from aocr import optim
from aocr.config import Config
from aocr.models import model


# rng-stream tag separating augmentation randomness from dropout (both
# derive from the per-step rng)
_AUG_TAG = 0x6175


class TrainOutput(NamedTuple):
    params: dict
    batch_stats: dict
    opt_state: optim.SGDState
    loss_sum: jax.Array  # token-sum NLL (reference step loss)
    grad_norms: dict


def _train_step(
    params: dict,
    batch_stats: dict,
    opt_state: optim.SGDState,
    images: jax.Array,
    targets: jax.Array,
    targets_eval: jax.Array,
    lr: jax.Array,
    dropout_rng: jax.Array,
    cfg: Config,
    real_bs=None,
    row_mask=None,
) -> TrainOutput:
    # real_bs: true (un-padded) sample count when the batch was padded to a
    # shardable size; loss/grad normalization must use it (the reference
    # divides by the real batch size, model.lua:645-647).  row_mask marks
    # the real rows so BatchNorm moments exclude the padding.
    batch_size = images.shape[0] if real_bs is None else real_bs
    if cfg.augment:
        from aocr import augment as augment_lib

        # distinct stream from dropout (same step rng, different fold);
        # row_offset 0 — this step sees the whole batch (the DP wrapper
        # passes its shard offset itself, data_parallel.py)
        images = augment_lib.augment_batch(
            jax.random.fold_in(dropout_rng, _AUG_TAG), images,
            strength=cfg.augment_strength)

    def loss_fn(p):
        nll, new_stats, _ = model.forward_loss(
            p, batch_stats, images, targets, targets_eval, cfg,
            train=True, dropout_rng=dropout_rng, row_mask=row_mask,
        )
        return nll / batch_size, new_stats

    (mean_loss, new_stats), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params)
    if cfg.optimizer == "adadelta":
        new_params, new_opt, norms = optim.adadelta_update(
            params, grads, opt_state, weight_decay=cfg.weight_decay
        )
    else:
        new_params, new_opt, norms = optim.sgd_update(
            params, grads, opt_state, lr, optim.hyper_from_config(cfg)
        )
    return TrainOutput(
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt,
        loss_sum=mean_loss * batch_size,
        grad_norms=norms,
    )


def make_train_step(cfg: Config):
    """Build the jitted train step; donation follows the -prealloc flag."""
    donate = (0, 2) if cfg.prealloc else ()
    return jax.jit(
        partial(_train_step, cfg=cfg),
        donate_argnums=donate,
    )


@partial(jax.jit, static_argnames=("cfg", "beam_size", "max_len",
                                   "use_trie", "return_refills"))
def eval_decode_step(
    params: dict,
    batch_stats: dict,
    images: jax.Array,
    targets: jax.Array,
    targets_eval: jax.Array,
    cfg: Config,
    beam_size: int,
    max_len: int,
    trie_table=None,
    use_trie: bool = False,
    return_refills: bool = False,
):
    """Beam decode + teacher-forced gold pass as ONE jitted program with
    ONE CNN+bi-encoder forward, shared explicitly.

    vs the Trainer's previous two separate jitted calls this saves a whole
    program dispatch per eval batch (a full RPC round-trip on tunneled dev
    setups) and the redundant encode: as one program XLA's CSE would merge
    the bit-identical encodes anyway, but the explicit context handoff
    doesn't depend on that and costs nothing.  Single-device analogue of
    the sharded eval's local_step (parallel/eval_parallel.py).
    Returns (beam_decode output tuple, nll, gold_scores)."""
    from aocr import decode

    context, dec_init, _ = model.encode(params, batch_stats, images, cfg,
                                        train=False)
    out = decode.beam_from_context(
        params, context, dec_init, cfg, beam_size, max_len,
        trie_table, use_trie, return_refills,
    )
    nll, log_probs = model.loss_from_context(
        params, context, dec_init, targets, targets_eval, cfg, train=False,
    )
    gold = gold_scores_from_logprobs(log_probs, targets_eval)
    return out, nll, gold


def gold_scores_from_logprobs(
    log_probs: jax.Array, targets_eval: jax.Array
) -> jax.Array:
    """Per-sample summed gold log-prob (reference score_gold,
    model.lua:589-627).  Delegates to loss.gold_scores — the SAME pick +
    PAD-mask the loss uses — so the eval paths and the training loss can
    never diverge in masking semantics."""
    from aocr import loss as _loss

    return _loss.gold_scores(log_probs, targets_eval)


@partial(jax.jit, static_argnames=("cfg",))
def eval_loss_step(
    params: dict,
    batch_stats: dict,
    images: jax.Array,
    targets: jax.Array,
    targets_eval: jax.Array,
    cfg: Config,
) -> Tuple[jax.Array, jax.Array]:
    """Eval-mode teacher-forced pass: (token-sum NLL, per-sample gold score)."""
    nll, _, log_probs = model.forward_loss(
        params, batch_stats, images, targets, targets_eval, cfg, train=False
    )
    return nll, gold_scores_from_logprobs(log_probs, targets_eval)
