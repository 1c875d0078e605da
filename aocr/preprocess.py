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
    y = _luminance(x)
    B = y.shape[0]
    # antialias=False: plain bilinear sampling, matching the reference's
    # torch image.scale and aocr.data's host resize (no triangle prefilter).
    resized = jax.image.resize(
        y, (B, out_h, out_w), method="bilinear", antialias=False
    )
    return resized[..., None]


def _luminance(x: jax.Array) -> jax.Array:
    """(..., C>=3) RGB or (..., 1) gray float -> (...) luminance."""
    if x.shape[-1] >= 3:
        return (LUMA[0] * x[..., 0] + LUMA[1] * x[..., 1]
                + LUMA[2] * x[..., 2])
    return x[..., 0]


def _resize_one(lum: jax.Array, h: jax.Array, w: jax.Array,
                out_h: int, out_w: int) -> jax.Array:
    """Bilinear-resize the top-left (h, w) region of a padded (Hp, Wp)
    luminance plane to (out_h, out_w) with half-pixel centers — the exact
    math of aocr.data._bilinear_resize, but with the true source size as a
    *traced* value so one compiled program handles every image in a padded
    batch.  Sample indices clip inside (h, w), so padding is never read."""
    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (hf / out_h) - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (wf / out_w) - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, hf - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, wf - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[None, :]
    r0 = lum[y0]  # (out_h, Wp) row gather
    r1 = lum[y1]
    top = r0[:, x0] * (1 - wx) + r0[:, x1] * wx
    bot = r1[:, x0] * (1 - wx) + r1[:, x1] * wx
    return top * (1 - wy) + bot * wy


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def preprocess_varsize(
    raw: jax.Array, sizes: jax.Array, out_h: int = 32, out_w: int = 100
) -> jax.Array:
    """Mixed-size batch preprocessing on device.

    raw:   (B, Hp, Wp, C) uint8/float — images padded (bottom/right) to a
           common buffer shape; C in {1, 3, 4}
    sizes: (B, 2) int32 true (h, w) per image
    ->     (B, out_h, out_w, 1) float32 luminance in [0, 255]

    This is the torch-`image` replacement running as one XLA program over
    the whole batch (SURVEY.md §2.3): the host's only per-image work is the
    JPEG/PNG *decode*; luminance + aspect resize + normalization all happen
    on-device.  One compile per padded buffer shape (DataGen rounds buffer
    dims up to bound the jit cache).
    """
    x = raw.astype(jnp.float32)
    if x.ndim == 3:
        x = x[..., None]
    lum = _luminance(x)  # (B, Hp, Wp)
    out = jax.vmap(
        lambda im, s: _resize_one(im, s[0], s[1], out_h, out_w)
    )(lum, sizes)
    return out[..., None]


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def preprocess_and_normalize(
    raw: jax.Array, out_h: int = 32, out_w: int = 100
) -> jax.Array:
    """Fused preprocess + the CNN's (x-128)/128 normalization — for serving
    paths that want a single host->device transfer and one fused program."""
    return (preprocess_batch(raw, out_h, out_w) - 128.0) / 128.0
