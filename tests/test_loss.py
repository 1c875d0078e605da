"""Criterion parity: PAD-masked token-sum NLL (reference criterion.lua:3-9)."""

import jax
import jax.numpy as jnp
import numpy as np

from aocr import loss, vocab
from aocr.models import head


def test_pad_targets_contribute_zero(rng):
    B, T, V = 2, 4, 39
    logp = jax.nn.log_softmax(jax.random.normal(rng, (B, T, V)), axis=-1)
    targets = jnp.full((B, T), vocab.PAD, jnp.int32)
    assert float(loss.nll_sum(logp, targets)) == 0.0


def test_sum_not_mean(rng):
    """sizeAverage=false: doubling the tokens doubles the loss."""
    B, T, V = 1, 3, 39
    logp = jax.nn.log_softmax(jax.random.normal(rng, (B, T, V)), axis=-1)
    t1 = jnp.array([[5, vocab.PAD, vocab.PAD]], jnp.int32)
    t2 = jnp.array([[5, 5, vocab.PAD]], jnp.int32)
    l1 = float(loss.nll_sum(logp, t1))
    l2 = float(loss.nll_sum(jnp.concatenate([logp[:, :1], logp[:, :1],
                                             logp[:, 2:]], axis=1), t2))
    np.testing.assert_allclose(l2, 2 * l1, rtol=1e-6)


def test_matches_numpy(rng):
    B, T, V = 3, 5, 39
    logp = jax.nn.log_softmax(jax.random.normal(rng, (B, T, V)), axis=-1)
    targets = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, V)
    got = float(loss.nll_sum(logp, targets))
    lp = np.asarray(logp)
    tg = np.asarray(targets)
    expected = 0.0
    for b in range(B):
        for t in range(T):
            if tg[b, t] != vocab.PAD:
                expected -= lp[b, t, tg[b, t]]
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_head_log_softmax_normalized(rng):
    p = head.init_params(rng, 16, 39)
    h = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    logp = head.apply(p, h)
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0,
                               rtol=1e-5)
