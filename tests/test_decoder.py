"""Decoder parity tests: teacher_forced scan vs explicit step() loop, and
attention vs a NumPy oracle (Luong general + concat,
reference src/model/LSTM.lua:124-162)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aocr.models import decoder


@pytest.fixture
def dims():
    return dict(V=13, E=4, H=8, L=5, B=3, T=6, num_layers=2)


def _params(rng, dims, input_feed):
    return decoder.init_params(
        rng, dims["V"], dims["E"], dims["H"], dims["num_layers"], input_feed
    )


def test_attention_oracle(rng, dims):
    p = _params(rng, dims, False)
    B, L, H = dims["B"], dims["L"], dims["H"]
    h_top = jax.random.normal(jax.random.PRNGKey(1), (B, H))
    context = jax.random.normal(jax.random.PRNGKey(2), (B, L, H))
    h_tilde, alpha = decoder.attention(p, h_top, context)
    # numpy oracle
    q = np.asarray(h_top) @ np.asarray(p["w_a"])
    scores = np.einsum("blh,bh->bl", np.asarray(context), q)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    a = e / e.sum(-1, keepdims=True)
    ctx = np.einsum("bl,blh->bh", a, np.asarray(context))
    ht = np.tanh(np.concatenate([ctx, np.asarray(h_top)], -1) @ np.asarray(p["w_c"]))
    np.testing.assert_allclose(alpha, a, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(h_tilde, ht, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha).sum(-1), 1.0, rtol=1e-5)


def test_attention_simple_variant(rng, dims):
    """The `simple` additive combination (reference src/model/LSTM.lua:152-160):
    h~ = ctx + h_top — same alphas, no W_c, no tanh.  Grouped form agrees."""
    p = _params(rng, dims, False)
    B, L, H = dims["B"], dims["L"], dims["H"]
    h_top = jax.random.normal(jax.random.PRNGKey(1), (B, H))
    context = jax.random.normal(jax.random.PRNGKey(2), (B, L, H))
    h_simple, a_simple = decoder.attention(p, h_top, context, simple=True)
    _, a_concat = decoder.attention(p, h_top, context)
    np.testing.assert_allclose(a_simple, a_concat, rtol=1e-6)
    ctx = np.einsum("bl,blh->bh", np.asarray(a_simple), np.asarray(context))
    np.testing.assert_allclose(
        np.asarray(h_simple), ctx + np.asarray(h_top), rtol=1e-4, atol=1e-5)
    grouped = decoder.attention_grouped(
        p, h_top[:, None, :], context, simple=True)
    np.testing.assert_allclose(
        np.asarray(grouped[:, 0]), np.asarray(h_simple),
        rtol=1e-4, atol=1e-5)


def test_attention_mask(rng, dims):
    p = _params(rng, dims, False)
    B, L, H = dims["B"], dims["L"], dims["H"]
    h_top = jax.random.normal(jax.random.PRNGKey(1), (B, H))
    context = jax.random.normal(jax.random.PRNGKey(2), (B, L, H))
    mask = jnp.ones((B, L), bool).at[:, -2:].set(False)
    _, alpha = decoder.attention(p, h_top, context, ctx_mask=mask)
    assert np.allclose(np.asarray(alpha)[:, -2:], 0.0, atol=1e-12)


@pytest.mark.parametrize("input_feed", [False, True])
def test_teacher_forced_matches_step_loop(rng, dims, input_feed):
    p = _params(rng, dims, input_feed)
    B, T, H, L = dims["B"], dims["T"], dims["H"], dims["L"]
    context = jax.random.normal(jax.random.PRNGKey(3), (B, L, H))
    c0 = jax.random.normal(jax.random.PRNGKey(4), (B, H))
    h0 = jax.random.normal(jax.random.PRNGKey(5), (B, H))
    targets = jax.random.randint(jax.random.PRNGKey(6), (B, T), 0, dims["V"])

    out_scan = decoder.teacher_forced(
        p, (c0, h0), targets, context, input_feed=input_feed
    )

    state = decoder.init_state((c0, h0), dims["num_layers"])
    outs = []
    for t in range(T):
        state, ht = decoder.step(
            p, state, targets[:, t], context, input_feed=input_feed
        )
        outs.append(ht)
    out_loop = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(out_scan, out_loop, rtol=1e-3, atol=1e-4)


def test_init_state_structure(rng, dims):
    c0 = jnp.ones((2, dims["H"]))
    h0 = 2 * jnp.ones((2, dims["H"]))
    st = decoder.init_state((c0, h0), 3)
    assert len(st.cs) == 3 and len(st.hs) == 3
    np.testing.assert_array_equal(st.cs[0], c0)
    np.testing.assert_array_equal(st.hs[0], h0)
    assert np.allclose(st.cs[1], 0) and np.allclose(st.hs[2], 0)
    assert np.allclose(st.attn, 0)


def test_input_feed_changes_output(rng, dims):
    """With input feeding, step t's output must depend on h_tilde_{t-1}."""
    p = _params(rng, dims, True)
    B, H, L = dims["B"], dims["H"], dims["L"]
    context = jax.random.normal(jax.random.PRNGKey(3), (B, L, H))
    st = decoder.init_state((jnp.zeros((B, H)), jnp.zeros((B, H))), 2)
    tok = jnp.zeros((B,), jnp.int32)
    _, out1 = decoder.step(p, st, tok, context, input_feed=True)
    st2 = st._replace(attn=jnp.ones((B, H)))
    _, out2 = decoder.step(p, st2, tok, context, input_feed=True)
    assert not np.allclose(out1, out2)


def test_remat_grads_match(rng, dims):
    """jax.checkpoint on the scan body must not change gradients."""
    import jax

    p = _params(rng, dims, True)
    B, T, H, L = dims["B"], dims["T"], dims["H"], dims["L"]
    context = jax.random.normal(jax.random.PRNGKey(3), (B, L, H))
    c0 = jax.random.normal(jax.random.PRNGKey(4), (B, H))
    h0 = jax.random.normal(jax.random.PRNGKey(5), (B, H))
    targets = jax.random.randint(jax.random.PRNGKey(6), (B, T), 0, dims["V"])

    def loss(params, remat):
        out = decoder.teacher_forced(params, (c0, h0), targets, context,
                                     input_feed=True, remat=remat)
        return jnp.sum(out ** 2)

    g_plain = jax.grad(lambda p_: loss(p_, False))(p)
    g_remat = jax.grad(lambda p_: loss(p_, True))(p)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dropout_active_in_train_mode(rng, dims):
    import jax

    p = _params(rng, dims, True)
    B, T, H, L = dims["B"], dims["T"], dims["H"], dims["L"]
    context = jax.random.normal(jax.random.PRNGKey(3), (B, L, H))
    c0 = jnp.zeros((B, H)); h0 = jnp.zeros((B, H))
    targets = jax.random.randint(jax.random.PRNGKey(6), (B, T), 0, dims["V"])
    kw = dict(input_feed=True, dropout=0.5)
    out_plain = decoder.teacher_forced(p, (c0, h0), targets, context,
                                       input_feed=True)
    out_d1 = decoder.teacher_forced(p, (c0, h0), targets, context,
                                    train=True,
                                    dropout_rng=jax.random.PRNGKey(0), **kw)
    out_d2 = decoder.teacher_forced(p, (c0, h0), targets, context,
                                    train=True,
                                    dropout_rng=jax.random.PRNGKey(0), **kw)
    out_d3 = decoder.teacher_forced(p, (c0, h0), targets, context,
                                    train=True,
                                    dropout_rng=jax.random.PRNGKey(9), **kw)
    # dropout changes the output, deterministically per rng
    assert not np.allclose(out_plain, out_d1)
    np.testing.assert_array_equal(np.asarray(out_d1), np.asarray(out_d2))
    assert not np.allclose(out_d1, out_d3)
    # eval mode ignores dropout entirely
    out_eval = decoder.teacher_forced(p, (c0, h0), targets, context,
                                      input_feed=True, dropout=0.5,
                                      train=False)
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_plain),
                               rtol=1e-6)


def test_dropout_requires_rng(rng, dims):
    import pytest as _pytest

    p = _params(rng, dims, False)
    B, T, H, L = dims["B"], dims["T"], dims["H"], dims["L"]
    context = jnp.zeros((B, L, H))
    targets = jnp.zeros((B, T), jnp.int32)
    with _pytest.raises(ValueError):
        decoder.teacher_forced(p, (jnp.zeros((B, H)), jnp.zeros((B, H))),
                               targets, context, input_feed=False,
                               dropout=0.3, train=True)
