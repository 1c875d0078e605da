"""Fused ReLU+max-pool backward Pallas kernel (ops/pallas/pool_bwd) vs the
XLA autodiff composition (relu VJP + SelectAndScatter): grads must be
bit-identical, including first-max tie-breaks and the all-non-positive
window (where the scatter routes dy to the first element and the ReLU
mask then kills it).  Runs the kernel in interpret mode on CPU.
Reference pooling: src/model/cnn.lua:15,20,29,38 (Torch
SpatialMaxPooling + ReLU updateGradInput pair)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aocr.models import cnn
from aocr.ops.pallas import pool_bwd


@pytest.fixture
def interp():
    old = cnn._PALLAS_POOL_BWD_INTERPRET
    old_enable = pool_bwd.ENABLE
    cnn._PALLAS_POOL_BWD_INTERPRET = True
    pool_bwd.ENABLE = True  # default-off on chip (layout A/B loss)
    try:
        yield
    finally:
        cnn._PALLAS_POOL_BWD_INTERPRET = old
        pool_bwd.ENABLE = old_enable
        jax.clear_caches()


def _grads(x, window, fused):
    def loss(x):
        if fused:
            y = cnn._relu_pool(x, window)
        else:
            y = cnn._reduce_window_max(jax.nn.relu(x), window)
        w = jnp.arange(y.size, dtype=x.dtype).reshape(y.shape) * 0.01 + 1.0
        return jnp.sum(y * w)

    return jax.grad(loss)(x)


@pytest.mark.parametrize("window", [(2, 2), (2, 1)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_relu_pool_bwd_bit_identical(interp, window, dtype):
    rng = np.random.RandomState(hash((window, str(dtype))) % 2**31)
    # quantized signed values: exact in-window ties, exact zeros (ReLU
    # plateau) and all-negative windows — every tie-break path
    x = jnp.asarray(
        rng.randint(-2, 3, size=(3, 8, 12, 8)).astype(np.float32) * 0.5
    ).astype(dtype)
    ga = _grads(x, window, fused=False)
    gk = _grads(x, window, fused=True)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(ga))
    # forward primal unchanged
    np.testing.assert_array_equal(
        np.asarray(cnn._relu_pool(x, window)),
        np.asarray(cnn._reduce_window_max(jax.nn.relu(x), window)))


def test_relu_pool_bwd_batch_not_lane_multiple(interp):
    """Ragged lane blocks: B=5 with bt padded inside the kernel."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randint(-2, 3, (5, 4, 6, 8)).astype(np.float32))
    ga = _grads(x, (2, 2), fused=False)
    gk = _grads(x, (2, 2), fused=True)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(ga))


def test_supported_gate():
    assert pool_bwd.supported((4, 32, 100, 64), (2, 2))
    assert pool_bwd.supported((4, 8, 25, 256), (2, 1))
    assert not pool_bwd.supported((4, 7, 100, 64), (2, 2))  # ragged H
    assert not pool_bwd.supported((4, 8, 25, 64), (2, 2))   # ragged W


def test_full_cnn_grads_unchanged_by_kernel(interp):
    """End-to-end CNN fwd+bwd, kernel on vs off: same loss, same grads."""
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.uniform(0, 255, (2, 32, 36, 1)), jnp.float32)
    params = cnn.init_params(jax.random.PRNGKey(0))
    stats = cnn.init_batch_stats()

    def loss(params, images):
        feats, _ = cnn.apply(params, stats, images, train=True)
        return jnp.sum(feats * jnp.tanh(feats))

    f1, g1 = jax.value_and_grad(loss)(params, images)
    old = pool_bwd.ENABLE
    try:
        pool_bwd.ENABLE = False
        jax.clear_caches()
        f2, g2 = jax.value_and_grad(loss)(params, images)
    finally:
        pool_bwd.ENABLE = old
        jax.clear_caches()
    np.testing.assert_array_equal(float(f1), float(f2))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), g1, g2)
