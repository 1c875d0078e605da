"""Bidirectional LSTM encoder over CNN feature columns.

Parity with the reference encoders (`/root/reference/src/model/model.lua:292-316`):
one (or more) LSTM layers per direction with zero initial state; the context
at column t is [h_fw_t ; h_bw_t] (B, L, 2*H_enc); the decoder is initialized
from the forward final state (at t=L) and backward final state (at t=1)
concatenated (`src/model/model.lua:539-552`).

TPU-native: both directions are `lax.scan`s with hoisted input projections
(see aocr/ops/lstm.py); forward and backward scans are independent and XLA
schedules them concurrently.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from aocr.ops import lstm


def init_params(
    rng: jax.Array, input_size: int, num_hidden: int, num_layers: int
) -> dict:
    """Parameters for one direction: a list of stacked LSTM layers."""
    layers = []
    for i in range(num_layers):
        rng, k = jax.random.split(rng)
        in_sz = input_size if i == 0 else num_hidden
        layers.append(lstm.init_lstm_layer(k, in_sz, num_hidden))
    return {"layers": layers}


def apply_direction(
    params: dict,
    features: jax.Array,
    reverse: bool,
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Run one direction over features (B, L, D).

    Returns (top-layer hs (B, L, H), (c_final, h_final) of the top layer).
    """
    B = features.shape[0]
    xs = features
    final = None
    for layer in params["layers"]:
        H = layer["wh"].shape[0]
        c0 = jnp.zeros((B, H), jnp.float32)
        h0 = jnp.zeros((B, H), jnp.float32)
        xs, final = lstm.unidirectional_scan(
            layer, xs, c0, h0, reverse=reverse, compute_dtype=compute_dtype
        )
    return xs, final


def apply(
    params_fw: dict,
    params_bw: dict,
    features: jax.Array,
    compute_dtype=jnp.float32,
):
    """Full bi-encoder.

    Returns:
      context: (B, L, 2*H) — [forward ; backward] per column
      dec_init: (c0, h0) each (B, 2*H) — concat of fw final (t=L) and bw
        final (t=1) states, used to initialize decoder layer 1.
    """
    hs_fw, (c_fw, h_fw) = apply_direction(
        params_fw, features, reverse=False, compute_dtype=compute_dtype
    )
    hs_bw, (c_bw, h_bw) = apply_direction(
        params_bw, features, reverse=True, compute_dtype=compute_dtype
    )
    context = jnp.concatenate([hs_fw, hs_bw], axis=-1)
    c0 = jnp.concatenate([c_fw, c_bw], axis=-1)
    h0 = jnp.concatenate([h_fw, h_bw], axis=-1)
    return context, (c0, h0)
