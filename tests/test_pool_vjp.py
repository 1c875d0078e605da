"""Max-pool custom VJP (cnn._max_pool_cvjp) vs reduce_window autodiff:
the strided-slice winner-take-all backward must be bit-identical to XLA's
SelectAndScatter gradient, including first-max tie-breaks and ragged
(VALID-dropped) edges.  Reference pooling: src/model/cnn.lua:15,20,29,38
(Torch SpatialMaxPooling routes gradOutput to the argmax element)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aocr.models import cnn


def _grads(x, window, custom):
    def loss(x):
        y = (cnn._max_pool_cvjp(x, window) if custom
             else cnn._reduce_window_max(x, window))
        w = jnp.arange(y.size, dtype=x.dtype).reshape(y.shape) * 0.01 + 1.0
        return jnp.sum(y * w)

    return jax.grad(loss)(x)


@pytest.mark.parametrize("window", [(2, 2), (2, 1), (1, 2)])
@pytest.mark.parametrize("shape", [(3, 8, 10, 4), (2, 7, 9, 4)])
def test_pool_bwd_matches_select_and_scatter(window, shape):
    rng = np.random.RandomState(hash((window, shape)) % 2**31)
    # quantized values force plenty of exact ties inside windows (the ReLU
    # zero-plateau case from the real CNN) — the tie-break must match
    x = jnp.asarray(
        rng.randint(0, 3, size=shape).astype(np.float32) * 0.5)
    ga = _grads(x, window, custom=False)
    gc = _grads(x, window, custom=True)
    np.testing.assert_array_equal(np.asarray(gc), np.asarray(ga))
    # forward unchanged
    np.testing.assert_array_equal(
        np.asarray(cnn._max_pool_cvjp(x, window)),
        np.asarray(cnn._reduce_window_max(x, window)))


def test_pool_bwd_bf16_and_negative():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-2, 2, (4, 8, 12, 8)), jnp.bfloat16)
    ga = _grads(x, (2, 2), custom=False)
    gc = _grads(x, (2, 2), custom=True)
    np.testing.assert_array_equal(np.asarray(gc), np.asarray(ga))


def test_full_cnn_grads_unchanged_by_pool_vjp():
    """End-to-end CNN fwd+bwd with the custom pool VJP on vs off."""
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.uniform(0, 255, (2, 32, 36, 1)), jnp.float32)
    params = cnn.init_params(jax.random.PRNGKey(0))
    stats = cnn.init_batch_stats()

    def loss(params, images):
        feats, _ = cnn.apply(params, stats, images, train=True)
        return jnp.sum(feats * jnp.tanh(feats))

    old = cnn._POOL_CUSTOM_VJP
    try:
        cnn._POOL_CUSTOM_VJP = True
        f1, g1 = jax.value_and_grad(loss)(params, images)
        cnn._POOL_CUSTOM_VJP = False
        jax.clear_caches()
        f2, g2 = jax.value_and_grad(loss)(params, images)
    finally:
        cnn._POOL_CUSTOM_VJP = old
        jax.clear_caches()
    np.testing.assert_array_equal(float(f1), float(f2))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), g1, g2)
