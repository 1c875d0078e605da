"""Jit-compiled image preprocessing: luminance + bilinear resize + layout.

The reference does RGB->Y * 255, aspect-ratio clamp, and bilinear scale to
32xW per image on the host in C (`/root/reference/src/data/data_gen.lua:71-79`
via torch `image`).  Here the same math runs as one jitted XLA program over a
whole batch — decode bytes host-side (PIL), then ship raw pixel batches to
the device and resize/normalize there.

Conventions match aocr.data's host path exactly: ITU-R 601 luma weights and
half-pixel-center bilinear sampling, so host- and device-preprocessed batches
are interchangeable (tested in tests/test_preprocess.py).

Each distinct raw input shape compiles once; use this path for uniform-size
sources (rendered synthetic data, pre-cropped serving traffic).  Mixed-size
archives go through the host path in aocr.data.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

LUMA = (0.299, 0.587, 0.114)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def preprocess_batch(
    raw: jax.Array, out_h: int = 32, out_w: int = 100
) -> jax.Array:
    """(B, H, W, C) uint8/float RGB (or C=1 gray) -> (B, out_h, out_w, 1)
    float32 luminance in [0, 255], resized with bilinear half-pixel centers.
    """
    x = raw.astype(jnp.float32)
    if x.ndim == 3:
        x = x[..., None]
    if x.shape[-1] >= 3:
        y = (LUMA[0] * x[..., 0] + LUMA[1] * x[..., 1] + LUMA[2] * x[..., 2])
    else:
        y = x[..., 0]
    B = y.shape[0]
    # antialias=False: plain bilinear sampling, matching the reference's
    # torch image.scale and aocr.data's host resize (no triangle prefilter).
    resized = jax.image.resize(
        y, (B, out_h, out_w), method="bilinear", antialias=False
    )
    return resized[..., None]


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def preprocess_and_normalize(
    raw: jax.Array, out_h: int = 32, out_w: int = 100
) -> jax.Array:
    """Fused preprocess + the CNN's (x-128)/128 normalization — for serving
    paths that want a single host->device transfer and one fused program."""
    return (preprocess_batch(raw, out_h, out_w) - 128.0) / 128.0
