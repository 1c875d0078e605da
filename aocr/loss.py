"""PAD-masked summed negative log-likelihood.

Parity with the reference criterion (`/root/reference/src/model/criterion.lua:3-9`):
ClassNLLCriterion with the PAD class weighted 0 and sizeAverage=false — i.e.
a *sum* over non-PAD target tokens.  The reference divides by batch_size per
step inside feval (src/model/model.lua:645-647) and multiplies back when
reporting (src/model/model.lua:701), so the reported step loss is the plain
token-sum; perplexity is exp(loss_sum / num_nonzeros) (src/train.lua:103).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aocr import vocab


def gold_scores(log_probs: jax.Array, targets_eval: jax.Array) -> jax.Array:
    """Per-sample summed gold log-prob over non-PAD target tokens — the
    reference's score_gold (model.lua:589-627).  nll_sum is its negated
    batch sum, so the PAD-masking semantics of the loss and the reported
    gold scores can never drift apart."""
    picked = jnp.take_along_axis(
        log_probs, targets_eval[..., None], axis=-1
    ).squeeze(-1)
    mask = (targets_eval != vocab.PAD).astype(log_probs.dtype)
    return jnp.sum(picked * mask, axis=1)


def nll_sum(log_probs: jax.Array, targets_eval: jax.Array) -> jax.Array:
    """log_probs (B, T, V), targets_eval (B, T) -> scalar token-sum NLL.

    PAD targets contribute zero (class-weight-0 masking).
    """
    return -jnp.sum(gold_scores(log_probs, targets_eval))
