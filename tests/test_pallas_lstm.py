"""Pallas fused LSTM cell vs the pure-XLA cell (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aocr.ops import lstm
from aocr.ops.pallas import lstm_cell


def _pack_xproj(xp, H):
    B = xp.shape[0]
    n = H // lstm_cell.TILE
    return (xp.reshape(B, 4, n, lstm_cell.TILE)
            .transpose(0, 2, 1, 3).reshape(B, 4 * H))


def test_pack_unpack_roundtrip(rng):
    H = 256
    wh = jax.random.normal(rng, (H, 4 * H))
    b = jax.random.normal(jax.random.PRNGKey(1), (4 * H,))
    wp, bp = lstm_cell.pack_gate_weights(wh, b)
    # packing is a column permutation: same multiset of values
    assert wp.shape == wh.shape
    np.testing.assert_allclose(np.sort(np.asarray(wp), axis=None),
                               np.sort(np.asarray(wh), axis=None))
    # tile 0 of packed = [i|f|o|g] columns 0:128 of each gate
    np.testing.assert_array_equal(
        np.asarray(wp[:, :128]), np.asarray(wh[:, 0:128]))
    np.testing.assert_array_equal(
        np.asarray(wp[:, 128:256]), np.asarray(wh[:, H:H + 128]))


def test_fused_cell_matches_xla(rng):
    B, D, H = 8, 64, 256
    layer = lstm.init_lstm_layer(rng, D, H)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (B, D))
    c = jax.random.normal(k2, (B, H))
    h = jax.random.normal(k3, (B, H))

    c_ref, h_ref = lstm.lstm_step(layer, x, c, h)

    from aocr.ops.mm import matmul
    xp = matmul(x, layer["wi"])
    wh_p, b_p = lstm_cell.pack_gate_weights(
        layer["wh"], layer["bi"] + layer["bh"]
    )
    c_f, h_f = lstm_cell.fused_cell_step(
        _pack_xproj(xp, H), h, c, wh_p, b_p, interpret=True
    )
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_scan_matches_xla(rng, reverse):
    B, L, D, H = 4, 6, 32, 128
    layer = lstm.init_lstm_layer(rng, D, H)
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, L, D))
    c0 = jnp.zeros((B, H))
    h0 = jnp.zeros((B, H))
    hs_ref, (cf_ref, hf_ref) = lstm.unidirectional_scan(
        layer, xs, c0, h0, reverse=reverse
    )
    hs_f, (cf_f, hf_f) = lstm_cell.fused_scan(
        layer, xs, c0, h0, reverse=reverse,
        compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(hs_f), np.asarray(hs_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cf_f), np.asarray(cf_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hf_f), np.asarray(hf_ref),
                               rtol=1e-4, atol=1e-4)
