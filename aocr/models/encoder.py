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


def _run_layers(
    layers, xs: jax.Array, reverse: bool, compute_dtype, final=None
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Stack LSTM layers (zero initial state each) over xs; returns
    (top-layer hs, top-layer finals)."""
    B = xs.shape[0]
    for layer in layers:
        H = layer["wh"].shape[0]
        c0 = jnp.zeros((B, H), jnp.float32)
        h0 = jnp.zeros((B, H), jnp.float32)
        xs, final = lstm.unidirectional_scan(
            layer, xs, c0, h0, reverse=reverse, compute_dtype=compute_dtype
        )
    return xs, final


def apply_direction(
    params: dict,
    features: jax.Array,
    reverse: bool,
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Run one direction over features (B, L, D).

    Returns (top-layer hs (B, L, H), (c_final, h_final) of the top layer).
    """
    return _run_layers(params["layers"], features, reverse, compute_dtype)


def apply(
    params_fw: dict,
    params_bw: dict,
    features: jax.Array,
    compute_dtype=jnp.float32,
    fused_l0: bool = False,
):
    """Full bi-encoder.

    With fused_l0 the two directions' layer-0 input projections run as ONE
    (L*B, D) @ (D, 8H) matmul (lstm.bidirectional_scan) — same math, the
    feature stack crosses HBM once in each pass; layers above 0 (and the
    default path) keep the per-direction scans.

    Returns:
      context: (B, L, 2*H) — [forward ; backward] per column
      dec_init: (c0, h0) each (B, 2*H) — concat of fw final (t=L) and bw
        final (t=1) states, used to initialize decoder layer 1.
    """
    if fused_l0:
        lf = params_fw["layers"][0]
        lb = params_bw["layers"][0]
        B = features.shape[0]
        zf = jnp.zeros((B, lf["wh"].shape[0]), jnp.float32)
        zb = jnp.zeros((B, lb["wh"].shape[0]), jnp.float32)
        hs_fw, fin_fw, hs_bw, fin_bw = lstm.bidirectional_scan(
            lf, lb, features, zf, zf, zb, zb, compute_dtype=compute_dtype
        )
        hs_fw, (c_fw, h_fw) = _run_layers(
            params_fw["layers"][1:], hs_fw, False, compute_dtype, fin_fw)
        hs_bw, (c_bw, h_bw) = _run_layers(
            params_bw["layers"][1:], hs_bw, True, compute_dtype, fin_bw)
    else:
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
