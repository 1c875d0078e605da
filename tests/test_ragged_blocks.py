"""Ragged final batch blocks in the Pallas backward kernels.

r3 removed the explicit jnp.pad of kernel operands to a tile multiple
(ops/pallas/tf_bwd.py, lstm_bwd.py): Mosaic bounds-limits the edge-block
DMAs itself, and all in-kernel math is row-independent, so undefined edge
rows must never contaminate real ones.  These tests force a tile that does
NOT divide the batch (grid > 1 with a short final block) and assert
gradient parity with plain autodiff through the interpret-mode kernels.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aocr.models import decoder
from aocr.ops import lstm
from aocr.ops.pallas import tiling


@pytest.fixture
def ragged_tile(monkeypatch):
    """Force an 8-row tile so B0=10 runs as grid ceil(10/8)=2 with a
    2-row final block."""
    monkeypatch.setattr(tiling, "pick_bt",
                        lambda B0, estimate, b_tile: (8, 0))
    yield


def test_lstm_bwd_ragged_matches_autodiff(ragged_tile):
    np_rng = np.random.RandomState(11)
    B, L, D, H = 10, 5, 4, 8
    layer = lstm.init_lstm_layer(jax.random.PRNGKey(0), D, H)
    xs = jnp.asarray(np_rng.uniform(-1, 1, (B, L, D)), jnp.float32)
    c0 = jnp.asarray(np_rng.uniform(-1, 1, (B, H)), jnp.float32)
    h0 = jnp.asarray(np_rng.uniform(-1, 1, (B, H)), jnp.float32)
    w_h = jnp.asarray(np_rng.uniform(-1, 1, (B, L, H)), jnp.float32)

    def loss(layer, xs, c0, h0, custom):
        hs, (cf, hf) = lstm.unidirectional_scan(
            layer, xs, c0, h0, reverse=False, custom_grad=custom)
        return jnp.sum(hs * w_h) + jnp.sum(hf) + jnp.sum(jnp.tanh(cf))

    ga = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2, 3))(
        layer, xs, c0, h0)
    lstm._PALLAS_LSTM_BWD_INTERPRET = True
    lstm._SCAN_VJP_CACHE.clear()
    try:
        gc = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2, 3))(
            layer, xs, c0, h0)
    finally:
        lstm._PALLAS_LSTM_BWD_INTERPRET = False
        lstm._SCAN_VJP_CACHE.clear()
    jax.tree.map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=2e-5, atol=2e-6),
        ga, gc)


@pytest.mark.parametrize("input_feed", [True, False])
def test_decoder_bwd_ragged_matches_autodiff(ragged_tile, input_feed):
    np_rng = np.random.RandomState(13)
    B, T, H, E, L = 10, 4, 16, 4, 6
    params = decoder.init_params(jax.random.PRNGKey(0), 39, E, H,
                                 2, input_feed)
    targets = jnp.asarray(np_rng.randint(1, 39, (B, T)))
    ctx = jnp.asarray(np_rng.uniform(-1, 1, (B, L, H)), jnp.float32)
    c0 = jnp.asarray(np_rng.uniform(-1, 1, (B, H)), jnp.float32)
    h0 = jnp.asarray(np_rng.uniform(-1, 1, (B, H)), jnp.float32)
    w = jnp.asarray(np_rng.uniform(-1, 1, (B, T, H)), jnp.float32)

    def loss(params, ctx, c0, h0, custom):
        hs = decoder.teacher_forced(
            params, (c0, h0), targets, ctx, input_feed=input_feed,
            custom_grad=custom)
        return jnp.sum(hs * w)

    ga = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2, 3))(
        params, ctx, c0, h0)
    decoder._PALLAS_TF_BWD_INTERPRET = True
    decoder._TF_VJP_CACHE.clear()
    try:
        gc = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2, 3))(
            params, ctx, c0, h0)
    finally:
        decoder._PALLAS_TF_BWD_INTERPRET = False
        decoder._TF_VJP_CACHE.clear()
    jax.tree.map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=3e-5, atol=3e-6),
        ga, gc)
