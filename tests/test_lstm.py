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


def _bidir_inputs():
    np_rng = np.random.RandomState(7)
    B, L, D, H = 3, 5, 4, 8
    layer_fw = lstm.init_lstm_layer(jax.random.PRNGKey(10), D, H)
    layer_bw = lstm.init_lstm_layer(jax.random.PRNGKey(11), D, H)
    xs = jnp.asarray(np_rng.uniform(-1, 1, (B, L, D)), jnp.float32)
    zeros = jnp.zeros((B, H), jnp.float32)
    w_h = jnp.asarray(np_rng.uniform(-1, 1, (B, L, H)), jnp.float32)
    w_f = jnp.asarray(np_rng.uniform(-1, 1, (B, H)), jnp.float32)
    return layer_fw, layer_bw, xs, zeros, w_h, w_f


def test_bidir_fused_forward_matches_unfused():
    """bidirectional_scan (one (L*B,D)@(D,8H) projection) produces the
    same outputs as two unidirectional scans."""
    layer_fw, layer_bw, xs, zeros, _, _ = _bidir_inputs()
    hs_f, (cf_f, hf_f), hs_b, (cf_b, hf_b) = lstm.bidirectional_scan(
        layer_fw, layer_bw, xs, zeros, zeros, zeros, zeros)
    ref_f, (rcf_f, rhf_f) = lstm.unidirectional_scan(
        layer_fw, xs, zeros, zeros, reverse=False)
    ref_b, (rcf_b, rhf_b) = lstm.unidirectional_scan(
        layer_bw, xs, zeros, zeros, reverse=True)
    for got, want in [(hs_f, ref_f), (cf_f, rcf_f), (hf_f, rhf_f),
                      (hs_b, ref_b), (cf_b, rcf_b), (hf_b, rhf_b)]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def _bidir_check_vjp():
    layer_fw, layer_bw, xs, zeros, w_h, w_f = _bidir_inputs()

    def loss(layer_fw, layer_bw, xs, custom):
        hs_f, (cf_f, hf_f), hs_b, (cf_b, hf_b) = lstm.bidirectional_scan(
            layer_fw, layer_bw, xs, zeros, zeros, zeros, zeros,
            custom_grad=custom)
        return (jnp.sum(hs_f * w_h) + jnp.sum(hs_b * w_h[..., ::-1])
                + jnp.sum(hf_f * w_f) + jnp.sum(hf_b * w_f)
                + jnp.sum(jnp.tanh(cf_f)) + jnp.sum(jnp.tanh(cf_b)))

    ga = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2))(
        layer_fw, layer_bw, xs)
    gc = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2))(
        layer_fw, layer_bw, xs)
    jax.tree.map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=2e-5, atol=2e-6),
        ga, gc)
    np.testing.assert_allclose(
        float(loss(layer_fw, layer_bw, xs, True)),
        float(loss(layer_fw, layer_bw, xs, False)), rtol=1e-6)


def test_bidir_custom_vjp_matches_autodiff():
    """The fused bidirectional VJP (x-side grads as one wide matmul per
    pass) must match plain autodiff of the same fused primal."""
    _bidir_check_vjp()


def test_bidir_custom_vjp_pallas_kernel_matches_autodiff():
    """Same parity through the Pallas backward-recurrence kernel
    (interpret mode on CPU), covering both scan directions in one VJP."""
    lstm._PALLAS_LSTM_BWD_INTERPRET = True
    lstm._BIDIR_VJP_CACHE.clear()
    try:
        _bidir_check_vjp()
    finally:
        lstm._PALLAS_LSTM_BWD_INTERPRET = False
        lstm._BIDIR_VJP_CACHE.clear()


def test_encoder_fused_l0_matches_default():
    """encoder.apply(fused_l0=True) == default path, context and decoder
    init states, including with a second stacked layer."""
    from aocr.models import encoder

    rng = jax.random.PRNGKey(3)
    B, L, D, H = 2, 6, 4, 8
    for num_layers in (1, 2):
        pf = encoder.init_params(jax.random.PRNGKey(20), D, H, num_layers)
        pb = encoder.init_params(jax.random.PRNGKey(21), D, H, num_layers)
        feats = jax.random.normal(rng, (B, L, D))
        ctx0, (c0, h0) = encoder.apply(pf, pb, feats)
        ctx1, (c1, h1) = encoder.apply(pf, pb, feats, fused_l0=True)
        np.testing.assert_allclose(np.asarray(ctx1), np.asarray(ctx0),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                                   rtol=1e-5, atol=1e-6)


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
