"""Whole-scan encoder-forward Pallas kernel (ops/pallas/lstm_fwd): primal
and gradient parity vs the XLA scans / plain autodiff, interpret mode on
CPU — both directions, the fused bidirectional layer, ragged final batch
blocks, and the kernel-fwd + kernel-bwd combination."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aocr.ops import lstm
from aocr.ops.pallas import tiling


def _with_flags(fn, fwd=False, bwd=False):
    lstm._PALLAS_LSTM_FWD_INTERPRET = fwd
    lstm._PALLAS_LSTM_BWD_INTERPRET = bwd
    lstm._SCAN_VJP_CACHE.clear()
    lstm._BIDIR_VJP_CACHE.clear()
    try:
        return fn()
    finally:
        lstm._PALLAS_LSTM_FWD_INTERPRET = False
        lstm._PALLAS_LSTM_BWD_INTERPRET = False
        lstm._SCAN_VJP_CACHE.clear()
        lstm._BIDIR_VJP_CACHE.clear()


def _problem(seed, B, L, D, H):
    np_rng = np.random.RandomState(seed)
    layer = lstm.init_lstm_layer(jax.random.PRNGKey(0), D, H)
    xs = jnp.asarray(np_rng.uniform(-1, 1, (B, L, D)), jnp.float32)
    c0 = jnp.asarray(np_rng.uniform(-1, 1, (B, H)), jnp.float32)
    h0 = jnp.asarray(np_rng.uniform(-1, 1, (B, H)), jnp.float32)
    w_h = jnp.asarray(np_rng.uniform(-1, 1, (B, L, H)), jnp.float32)
    return layer, xs, c0, h0, w_h


@pytest.mark.parametrize("reverse", [False, True])
def test_fwd_kernel_matches_autodiff(reverse):
    layer, xs, c0, h0, w_h = _problem(3, 6, 5, 4, 8)

    def loss(layer, xs, c0, h0, custom):
        hs, (cf, hf) = lstm.unidirectional_scan(
            layer, xs, c0, h0, reverse=reverse, custom_grad=custom)
        return jnp.sum(hs * w_h) + jnp.sum(hf) + jnp.sum(jnp.tanh(cf))

    fa = loss(layer, xs, c0, h0, False)
    ga = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2, 3))(
        layer, xs, c0, h0)
    fc = _with_flags(lambda: loss(layer, xs, c0, h0, True), fwd=True)
    gc = _with_flags(
        lambda: jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2, 3))(
            layer, xs, c0, h0), fwd=True)
    np.testing.assert_allclose(float(fc), float(fa), rtol=1e-5)
    jax.tree.map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=5e-5, atol=5e-6),
        ga, gc)
    # primal (no-grad) path through the kernel
    hs_ref, (cf_ref, hf_ref) = lstm.unidirectional_scan(
        layer, xs, c0, h0, reverse=reverse, custom_grad=True)
    hs_k, (cf_k, hf_k) = _with_flags(
        lambda: lstm.unidirectional_scan(layer, xs, c0, h0,
                                         reverse=reverse, custom_grad=True),
        fwd=True)
    np.testing.assert_allclose(np.asarray(hs_k), np.asarray(hs_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cf_k), np.asarray(cf_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hf_k), np.asarray(hf_ref),
                               rtol=1e-5, atol=1e-6)


def test_bidir_fwd_and_bwd_kernels(monkeypatch):
    """Fused bidirectional layer with BOTH whole-scan kernels active and a
    ragged final batch block (tile 8 against B=10)."""
    monkeypatch.setattr(tiling, "pick_bt",
                        lambda B0, estimate, b_tile: (8, 0))
    np_rng = np.random.RandomState(5)
    B, L, D, H = 10, 5, 4, 8
    lf = lstm.init_lstm_layer(jax.random.PRNGKey(0), D, H)
    lb = lstm.init_lstm_layer(jax.random.PRNGKey(1), D, H)
    xs = jnp.asarray(np_rng.uniform(-1, 1, (B, L, D)), jnp.float32)
    z = jnp.zeros((B, H), jnp.float32)
    w1 = jnp.asarray(np_rng.uniform(-1, 1, (B, L, H)), jnp.float32)
    w2 = jnp.asarray(np_rng.uniform(-1, 1, (B, L, H)), jnp.float32)

    def loss(lf, lb, xs, custom):
        hs_f, (cf, hf), hs_b, (cb, hb) = lstm.bidirectional_scan(
            lf, lb, xs, z, z, z, z, custom_grad=custom)
        return (jnp.sum(hs_f * w1) + jnp.sum(hs_b * w2)
                + jnp.sum(hf) + jnp.sum(hb)
                + jnp.sum(jnp.tanh(cf)) + jnp.sum(jnp.tanh(cb)))

    fa = loss(lf, lb, xs, False)
    ga = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2))(lf, lb, xs)
    fc = _with_flags(lambda: loss(lf, lb, xs, True), fwd=True, bwd=True)
    gc = _with_flags(
        lambda: jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2))(
            lf, lb, xs), fwd=True, bwd=True)
    np.testing.assert_allclose(float(fc), float(fa), rtol=1e-5)
    jax.tree.map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=5e-5, atol=5e-6),
        ga, gc)
