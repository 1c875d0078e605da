"""LSTM cell and scans vs a NumPy oracle (reference gate semantics,
src/model/LSTM.lua:90-105: fused 4H split into [i|f|o|g], c'=f*c+i*g,
h'=o*tanh(c'))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aocr.ops import lstm


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_lstm_step(layer, x, c, h):
    gates = x @ layer["wi"] + layer["bi"] + h @ layer["wh"] + layer["bh"]
    H = c.shape[-1]
    i = np_sigmoid(gates[:, :H])
    f = np_sigmoid(gates[:, H:2 * H])
    o = np_sigmoid(gates[:, 2 * H:3 * H])
    g = np.tanh(gates[:, 3 * H:])
    c2 = f * c + i * g
    h2 = o * np.tanh(c2)
    return c2, h2


def _np_layer(layer):
    return {k: np.asarray(v) for k, v in layer.items()}


def test_step_matches_oracle(rng):
    B, D, H = 3, 5, 7
    layer = lstm.init_lstm_layer(rng, D, H)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (B, D))
    c = jax.random.normal(k2, (B, H))
    h = jax.random.normal(k3, (B, H))
    c2, h2 = lstm.lstm_step(layer, x, c, h)
    c2n, h2n = np_lstm_step(_np_layer(layer), np.asarray(x), np.asarray(c), np.asarray(h))
    np.testing.assert_allclose(c2, c2n, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(h2, h2n, rtol=1e-3, atol=1e-4)


def test_forward_scan_matches_looped_steps(rng):
    B, L, D, H = 2, 6, 4, 8
    layer = lstm.init_lstm_layer(rng, D, H)
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, L, D))
    c = jnp.zeros((B, H))
    h = jnp.zeros((B, H))
    hs, (cf, hf) = lstm.unidirectional_scan(layer, xs, c, h)
    # oracle: explicit loop
    ln = _np_layer(layer)
    cn = np.zeros((B, H)); hn = np.zeros((B, H))
    for t in range(L):
        cn, hn = np_lstm_step(ln, np.asarray(xs[:, t]), cn, hn)
        np.testing.assert_allclose(hs[:, t], hn, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(cf, cn, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(hf, hn, rtol=1e-3, atol=1e-4)


def test_reverse_scan_order(rng):
    """reverse=True runs the recurrence L..1; outputs stay in input order and
    the final state is the one after consuming timestep 1 (reference backward
    encoder, src/model/model.lua:305-316)."""
    B, L, D, H = 2, 5, 4, 6
    layer = lstm.init_lstm_layer(rng, D, H)
    xs = jax.random.normal(jax.random.PRNGKey(2), (B, L, D))
    c = jnp.zeros((B, H)); h = jnp.zeros((B, H))
    hs_rev, (cf, hf) = lstm.unidirectional_scan(layer, xs, c, h, reverse=True)
    # equivalent: flip inputs, forward scan, flip outputs
    hs_flip, (cf2, hf2) = lstm.unidirectional_scan(layer, xs[:, ::-1], c, h)
    np.testing.assert_allclose(hs_rev, hs_flip[:, ::-1], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(cf, cf2, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(hf, hf2, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("reverse", [False, True])
def test_custom_vjp_scan_matches_autodiff(rng, reverse):
    """The hand-written scan VJP (batched weight grads outside the backward
    loop, ops/lstm._scan_custom) must produce the same gradients as plain
    autodiff for every input — including the final-state cotangents."""
    _check_custom_vjp(reverse, interpret=False)


@pytest.mark.parametrize("reverse", [False, True])
def test_custom_vjp_pallas_kernel_matches_autodiff(reverse):
    """Same parity through the Pallas encoder-backward kernel
    (ops/pallas/lstm_bwd.py, interpret mode on CPU)."""
    lstm._PALLAS_LSTM_BWD_INTERPRET = True
    lstm._SCAN_VJP_CACHE.clear()
    try:
        _check_custom_vjp(reverse, interpret=True)
    finally:
        lstm._PALLAS_LSTM_BWD_INTERPRET = False
        lstm._SCAN_VJP_CACHE.clear()


def _check_custom_vjp(reverse, interpret):
    np_rng = np.random.RandomState(3)
    B, L, D, H = 3, 5, 4, 8
    layer = lstm.init_lstm_layer(jax.random.PRNGKey(0), D, H)
    xs = jnp.asarray(np_rng.uniform(-1, 1, (B, L, D)), jnp.float32)
    c0 = jnp.asarray(np_rng.uniform(-1, 1, (B, H)), jnp.float32)
    h0 = jnp.asarray(np_rng.uniform(-1, 1, (B, H)), jnp.float32)
    w_h = jnp.asarray(np_rng.uniform(-1, 1, (B, L, H)), jnp.float32)
    w_f = jnp.asarray(np_rng.uniform(-1, 1, (B, H)), jnp.float32)

    def loss(layer, xs, c0, h0, custom):
        hs, (cf, hf) = lstm.unidirectional_scan(
            layer, xs, c0, h0, reverse=reverse, custom_grad=custom)
        return (jnp.sum(hs * w_h) + jnp.sum(hf * w_f)
                + jnp.sum(jnp.tanh(cf)))

    ga = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2, 3))(
        layer, xs, c0, h0)
    gc = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2, 3))(
        layer, xs, c0, h0)
    jax.tree.map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=2e-5, atol=2e-6),
        ga, gc)
    np.testing.assert_allclose(float(loss(layer, xs, c0, h0, True)),
                               float(loss(layer, xs, c0, h0, False)),
                               rtol=1e-6)
