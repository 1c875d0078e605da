"""Fused conv1+ReLU+pool Pallas kernels (ops/pallas/conv1_pool), interpret
mode on CPU.

Parity targets: the XLA path (lax.conv + bias + relu + reduce_window, i.e.
what cnn.apply runs when the kernel gate is off) for values and all three
gradients, plus exact routing semantics against the select_and_scatter
composition.  Reference layer: src/model/cnn.lua:13-16.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from aocr.models import cnn
from aocr.ops.pallas import conv1_pool


def _xla_ref(x, w, b, compute_dtype):
    """The exact op sequence cnn.apply runs for conv1 with the kernel off."""
    xc = x.astype(compute_dtype)
    y = lax.conv_general_dilated(
        xc, w.astype(compute_dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=(lax.Precision.HIGHEST
                   if compute_dtype == jnp.float32 else lax.Precision.DEFAULT),
        preferred_element_type=(jnp.float32
                                if compute_dtype == jnp.float32 else None),
    ).astype(compute_dtype)
    y = y + b.astype(compute_dtype)
    y = jax.nn.relu(y)
    return lax.reduce_window(y, -jnp.inf, lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _data(B=3, H=8, W=12, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 1)).astype(np.float32))
    bound = 1.0 / 3.0
    w = jnp.asarray(rng.uniform(-bound, bound, (3, 3, 1, 64))
                    .astype(np.float32))
    b = jnp.asarray(rng.uniform(-bound, bound, (64,)).astype(np.float32))
    return x, w, b


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_xla(dtype):
    x, w, b = _data()
    out = conv1_pool.conv1_relu_pool(x.astype(dtype), w, b, True)
    ref = _xla_ref(x, w, b, dtype)
    assert out.shape == ref.shape == (3, 4, 6, 64)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grads_match_xla(dtype):
    x, w, b = _data(seed=1)

    def loss_kernel(w, b, x):
        out = conv1_pool.conv1_relu_pool(x.astype(dtype), w, b, True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(w, b, x):
        return jnp.sum(_xla_ref(x, w, b, dtype).astype(jnp.float32) ** 2)

    gw, gb = jax.grad(loss_kernel, argnums=(0, 1))(w, b, x)
    rw, rb = jax.grad(loss_ref, argnums=(0, 1))(w, b, x)
    tol = 1e-4 if dtype == jnp.float32 else 6e-2
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                               rtol=tol, atol=tol)


def test_dx_matches_xla():
    x, w, b = _data(seed=2)

    def loss_kernel(x):
        return jnp.sum(conv1_pool.conv1_relu_pool(x, w, b, True) ** 2)

    def loss_ref(x):
        return jnp.sum(_xla_ref(x, w, b, jnp.float32) ** 2)

    gx = jax.grad(loss_kernel)(x)
    rx = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)


def test_tie_routing_first_match():
    # Constant input => all four pool positions tie; the cotangent must
    # route to the row-major-first window element only (GE-select
    # semantics), matching the XLA reference's wgrad exactly.
    x = jnp.ones((1, 4, 4, 1), jnp.float32)
    w = jnp.zeros((3, 3, 1, 64), jnp.float32).at[1, 1, 0, :].set(1.0)
    b = jnp.zeros((64,), jnp.float32)

    def loss_kernel(w):
        return jnp.sum(conv1_pool.conv1_relu_pool(x, w, b, True))

    def loss_ref(w):
        return jnp.sum(_xla_ref(x, w, b, jnp.float32))

    gw = jax.grad(loss_kernel)(w)
    rw = jax.grad(loss_ref)(w)
    np.testing.assert_array_equal(np.asarray(gw), np.asarray(rw))


def test_negative_max_zero_grad():
    # All scores negative => pooled output 0 everywhere; no gradient flows
    # (the ReLU VJP kills the routed dy).
    x = jnp.ones((1, 4, 4, 1), jnp.float32)
    w = jnp.full((3, 3, 1, 64), -1.0, jnp.float32)
    b = jnp.full((64,), -0.5, jnp.float32)

    out = conv1_pool.conv1_relu_pool(x, w, b, True)
    assert float(jnp.max(out)) == 0.0
    gw, gb = jax.grad(
        lambda w, b: jnp.sum(conv1_pool.conv1_relu_pool(x, w, b, True)),
        argnums=(0, 1))(w, b)
    assert float(jnp.abs(gw).max()) == 0.0
    assert float(jnp.abs(gb).max()) == 0.0


def test_supported_gate():
    assert conv1_pool.supported((4, 32, 100, 1))
    assert not conv1_pool.supported((4, 32, 81, 1))   # odd width
    assert not conv1_pool.supported((4, 32, 100, 3))  # multi-channel


def test_pick_mt_mosaic_legal():
    """Regression: at W=36 (m=288) the old largest-divisor rule picked
    mt=36, which Mosaic rejects at hardware compile time (a (16, 36, bt)
    x-block's sublane axis must be divisible by 8) — it broke the 9-width
    multi-width export (tools/ab_artifact_widths.py).  Every block the
    picker returns must be divisible by 8 or span the whole axis."""
    assert conv1_pool._pick_mt(288) == 32          # W=36: not 36
    assert conv1_pool._pick_mt(800) == 40          # W=100: unchanged
    for W in range(16, 321, 2):                    # every even width
        m = 16 * (W // 2)
        mt = conv1_pool._pick_mt(m)
        assert mt > 0 and m % mt == 0
        assert mt % 8 == 0 or mt == m
        assert conv1_pool.supported((4, 32, W, 1))


def test_forward_matches_xla_ladder_width_36():
    """The width that produced the Mosaic block error, through the
    public entry (interpret mode checks the math; the block-legality
    part is pinned by test_pick_mt_mosaic_legal)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(-1, 1, (3, 32, 36, 1)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 1, 64)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-0.3, 0.3, (64,)).astype(np.float32))
    out = conv1_pool.conv1_relu_pool(x, w, b, True)
    ref = _xla_ref(x, w, b, jnp.float32)
    assert out.shape == ref.shape == (3, 16, 18, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_ragged_n_padding():
    # B*Ho*Wo far from a multiple of NT: zero-padding must not perturb
    # values or grads.
    x, w, b = _data(B=1, H=6, W=10, seed=3)
    out = conv1_pool.conv1_relu_pool(x, w, b, True)
    ref = _xla_ref(x, w, b, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_cnn_apply_routes_through_kernel(monkeypatch):
    # With the interpret knob on, cnn.apply's conv1 goes through the fused
    # kernel and the full stack still matches the XLA path end-to-end.
    params = cnn.init_params(jax.random.PRNGKey(0))
    stats = cnn.init_batch_stats()
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(0, 255, (2, 32, 20, 1))
                         .astype(np.float32))
    ref, _ = cnn.apply(params, stats, images, train=False)
    monkeypatch.setattr(cnn, "_PALLAS_CONV1_INTERPRET", True)
    out, _ = cnn.apply(params, stats, images, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_cnn_apply_train_grads(monkeypatch):
    # Training-path gradients through the full CNN with the kernel active.
    params = cnn.init_params(jax.random.PRNGKey(1))
    stats = cnn.init_batch_stats()
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.uniform(0, 255, (2, 32, 20, 1))
                         .astype(np.float32))

    def loss(params, interp):
        monkeypatch.setattr(cnn, "_PALLAS_CONV1_INTERPRET", interp)
        feats, _ = cnn.apply(params, stats, images, train=True)
        return jnp.sum(feats ** 2)

    g_ref = jax.grad(loss)(params, False)
    g_ker = jax.grad(loss)(params, True)
    for name in ("conv1", "conv2"):
        for k in ("w", "b"):
            np.testing.assert_allclose(
                np.asarray(g_ker[name][k]), np.asarray(g_ref[name][k]),
                rtol=2e-4, atol=2e-4, err_msg=f"{name}/{k}")
