"""On-device training-time image augmentation.

The reference trains on raw crops with no augmentation (its data layer,
`src/data/data_gen.lua`, only decodes/resizes); generalization to noisy
real-world crops comes entirely from the dataset.  This module adds the
standard production counterpart as a TPU-first feature: random affine
jitter (rotation, shear, scale, shift), brightness/contrast jitter, and
Gaussian noise, applied INSIDE the jitted train step (`-augment`) — the
host pipeline stays untouched, the augmentation fuses into the step
program, and its cost is a few gathers + pointwise ops on (32, W) images
(negligible next to the conv forward/backward).

Determinism contract: every image row is keyed by fold_in(rng,
global_row_index), so the augmented batch is bit-identical whether the
step runs on one device or sharded across a data mesh (the DP wrapper
passes its shard's row offset) — data-parallel == single-device parity
holds with augmentation ON, and a resumed run replays the same
augmentations (the step rng is derived from the global step).

Geometry conventions match the eval-side distortion harness
(tests/synth.distort): [0, 255] grayscale, background = 255.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# strength-1.0 magnitudes (all scale linearly with -augment_strength)
_ROT_MAX = 0.05      # radians, ~3 degrees
_SHEAR_MAX = 0.15    # horizontal shear per vertical pixel
_LOG_SCALE_MAX = 0.08
_SHIFT_X = 2.0       # pixels
_SHIFT_Y = 1.5
_BRIGHT_MAX = 16.0   # additive, on [0, 255]
_CONTRAST_MAX = 0.15
_NOISE_STD = 8.0

_BACKGROUND = 255.0


def _augment_one(key: jax.Array, img: jax.Array,
                 strength: float) -> jax.Array:
    """Augment one (H, W, 1) image in [0, 255]."""
    h, w = img.shape[0], img.shape[1]
    k_geo, k_noise = jax.random.split(key)
    u = jax.random.uniform(k_geo, (7,), minval=-1.0, maxval=1.0)
    rot = u[0] * _ROT_MAX * strength
    shear = u[1] * _SHEAR_MAX * strength
    scale = jnp.exp(u[2] * _LOG_SCALE_MAX * strength)
    dx = u[3] * _SHIFT_X * strength
    dy = u[4] * _SHIFT_Y * strength
    bright = u[5] * _BRIGHT_MAX * strength
    contrast = 1.0 + u[6] * _CONTRAST_MAX * strength

    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yo = jnp.arange(h, dtype=jnp.float32)[:, None] - cy  # (h, 1)
    xo = jnp.arange(w, dtype=jnp.float32)[None, :] - cx  # (1, w)
    cos, sin = jnp.cos(rot), jnp.sin(rot)
    # output pixel -> source coordinate (inverse warp); shear adds a
    # row-dependent horizontal offset, matching tests/synth.distort
    src_x = scale * (cos * xo - sin * yo) + shear * yo + cx + dx
    src_y = scale * (sin * xo + cos * yo) + cy + dy
    warped = jax.scipy.ndimage.map_coordinates(
        img[..., 0],
        [jnp.broadcast_to(src_y, (h, w)), jnp.broadcast_to(src_x, (h, w))],
        order=1, mode="constant", cval=_BACKGROUND)
    out = (warped - 127.5) * contrast + 127.5 + bright
    out = out + jax.random.normal(k_noise, (h, w)) * (_NOISE_STD * strength)
    return jnp.clip(out, 0.0, 255.0)[..., None]


@partial(jax.jit, static_argnames=("strength",))
def augment_batch(rng: jax.Array, images: jax.Array,
                  strength: float = 1.0, row_offset=0) -> jax.Array:
    """Augment a (B, H, W, 1) [0, 255] batch.

    `row_offset` is the batch's first GLOBAL row index (a data-parallel
    shard passes axis_index * local_rows), which keys each row's
    randomness — see the determinism contract in the module docstring.
    """
    b = images.shape[0]
    keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
        row_offset + jnp.arange(b))
    return jax.vmap(partial(_augment_one, strength=strength))(
        keys, images.astype(jnp.float32))
