"""Whole-scan teacher-forced FORWARD Pallas kernel (ops/pallas/tf_fwd):
primal and gradient parity vs the XLA scan / plain autodiff, in interpret
mode on CPU.  Covers every residual-consumer combination the routing can
produce: kernel-forward + XLA-backward, kernel-forward + kernel-backward,
ragged final batch blocks, and the primal-only (no-grad) path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aocr.models import decoder
from aocr.ops.pallas import tiling


def _problem(seed, B, T, H, E, L, num_layers, input_feed):
    np_rng = np.random.RandomState(seed)
    params = decoder.init_params(jax.random.PRNGKey(0), 39, E, H,
                                 num_layers, input_feed)
    targets = jnp.asarray(np_rng.randint(1, 39, (B, T)))
    ctx = jnp.asarray(np_rng.uniform(-1, 1, (B, L, H)), jnp.float32)
    c0 = jnp.asarray(np_rng.uniform(-1, 1, (B, H)), jnp.float32)
    h0 = jnp.asarray(np_rng.uniform(-1, 1, (B, H)), jnp.float32)
    w = jnp.asarray(np_rng.uniform(-1, 1, (B, T, H)), jnp.float32)
    return params, targets, ctx, c0, h0, w


def _loss_fn(targets, w, input_feed):
    def loss(params, ctx, c0, h0, custom):
        hs = decoder.teacher_forced(
            params, (c0, h0), targets, ctx, input_feed=input_feed,
            custom_grad=custom)
        return jnp.sum(hs * w)
    return loss


def _with_flags(fn, fwd=False, bwd=False):
    decoder._PALLAS_TF_FWD_INTERPRET = fwd
    decoder._PALLAS_TF_BWD_INTERPRET = bwd
    decoder._TF_VJP_CACHE.clear()
    try:
        return fn()
    finally:
        decoder._PALLAS_TF_FWD_INTERPRET = False
        decoder._PALLAS_TF_BWD_INTERPRET = False
        decoder._TF_VJP_CACHE.clear()


@pytest.mark.parametrize("input_feed", [True, False])
@pytest.mark.parametrize("num_layers", [1, 2])
def test_fwd_kernel_with_xla_backward(input_feed, num_layers):
    """Kernel forward residuals must drive the XLA backward scan to the
    same gradients as plain autodiff (the routing when tf_fwd fits but
    tf_bwd does not)."""
    params, targets, ctx, c0, h0, w = _problem(
        7, 3, 5, 16, 4, 6, num_layers, input_feed)
    loss = _loss_fn(targets, w, input_feed)
    fa = loss(params, ctx, c0, h0, False)
    ga = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2, 3))(
        params, ctx, c0, h0)
    fc = _with_flags(lambda: loss(params, ctx, c0, h0, True), fwd=True)
    gc = _with_flags(
        lambda: jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2, 3))(
            params, ctx, c0, h0), fwd=True)
    np.testing.assert_allclose(float(fc), float(fa), rtol=1e-5)
    jax.tree.map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=5e-5, atol=5e-6),
        ga, gc)


@pytest.mark.parametrize("input_feed", [True, False])
def test_fwd_and_bwd_kernels_together(input_feed):
    """The shipped TPU train path: forward AND backward recurrences as
    Pallas kernels, weight grads batched outside."""
    params, targets, ctx, c0, h0, w = _problem(
        9, 3, 5, 16, 4, 6, 2, input_feed)
    loss = _loss_fn(targets, w, input_feed)
    ga = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2, 3))(
        params, ctx, c0, h0)
    gc = _with_flags(
        lambda: jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2, 3))(
            params, ctx, c0, h0), fwd=True, bwd=True)
    jax.tree.map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=5e-5, atol=5e-6),
        ga, gc)


def test_fwd_kernel_ragged_blocks(monkeypatch):
    """A tile that does not divide B (grid 2, short final block): Mosaic's
    bounds-limited edge DMAs must not leak garbage rows into real ones."""
    monkeypatch.setattr(tiling, "pick_bt",
                        lambda B0, estimate, b_tile: (8, 0))
    params, targets, ctx, c0, h0, w = _problem(13, 10, 4, 16, 4, 6, 2, True)
    loss = _loss_fn(targets, w, True)
    ga = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2, 3))(
        params, ctx, c0, h0)
    gc = _with_flags(
        lambda: jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2, 3))(
            params, ctx, c0, h0), fwd=True, bwd=True)
    jax.tree.map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=5e-5, atol=5e-6),
        ga, gc)


def test_fwd_kernel_primal_only():
    """The no-grad (eval gold pass) path routes core() through the kernel
    with collect=False — outputs must match the XLA scan."""
    params, targets, ctx, c0, h0, _w = _problem(17, 4, 6, 16, 4, 6, 2, True)
    ref = decoder.teacher_forced(params, (c0, h0), targets, ctx,
                                 input_feed=True, custom_grad=True)
    got = _with_flags(
        lambda: decoder.teacher_forced(params, (c0, h0), targets, ctx,
                                       input_feed=True, custom_grad=True),
        fwd=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
