"""Custom-VJP formulations of the CNN's channel reductions (r4):

- `cnn._bias_add` computes the conv bias gradient as an MXU ones-dot (or
  an unfused f32 reduce) instead of XLA's autodiff reduce, which fused
  into the cotangent kLoop chains (~2.1 ms/step at B=400 on v5e).
- `cnn._bn_train_cvjp` runs the closed-form BN backward: channel sums
  via `_channel_sum_f32`, dx as a per-channel FMA chain.

These tests pin all modes to the autodiff reference on f32 (where the
only differences are accumulation order) and the sync-BN backward to the
single-device gradient under a shard_map psum.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aocr.models import cnn


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (4, 32, 36, 1)).astype(np.float32))
    params = cnn.init_params(jax.random.PRNGKey(0))
    stats = cnn.init_batch_stats()
    return imgs, params, stats


def _grads(params, stats, imgs, bias_mode, bn_mode, **apply_kw):
    old_bias, old_bn = cnn._BIAS_GRAD, cnn._BN_MODE
    cnn._BIAS_GRAD, cnn._BN_MODE = bias_mode, bn_mode
    try:
        def loss(p):
            f, ns = cnn.apply(p, stats, imgs, train=True,
                              compute_dtype=jnp.float32, **apply_kw)
            return jnp.sum(f * f), ns

        (val, new_stats), g = jax.value_and_grad(loss, has_aux=True)(params)
        return float(val), new_stats, g
    finally:
        cnn._BIAS_GRAD, cnn._BN_MODE = old_bias, old_bn


def _assert_grads_close(ga, gb, rtol=1e-4):
    for name in ga:
        # BN'd conv biases have mathematically-zero gradients (the
        # batch-mean subtraction kills constant shifts), so both modes
        # produce pure cancellation noise there; the meaningful absolute
        # scale is the LAYER's largest gradient (the weight grad shares
        # the same upstream cotangent magnitude).
        scale = max(
            max(np.abs(np.asarray(ga[name][leaf])).max(),
                np.abs(np.asarray(gb[name][leaf])).max())
            for leaf in ga[name]
        )
        scale = max(scale, 1.0)
        for leaf in ga[name]:
            a, b = np.asarray(ga[name][leaf]), np.asarray(gb[name][leaf])
            np.testing.assert_allclose(
                a, b, rtol=rtol, atol=rtol * scale,
                err_msg=f"{name}/{leaf}")


@pytest.mark.parametrize("bias_mode", ["dot", "f32"])
def test_bias_grad_modes_match_autodiff(setup, bias_mode):
    imgs, params, stats = setup
    _, _, ref = _grads(params, stats, imgs, "xla", "xla")
    _, _, got = _grads(params, stats, imgs, bias_mode, "xla")
    _assert_grads_close(ref, got)


def test_bn_cvjp_forward_and_stats_bitexact(setup):
    imgs, params, stats = setup
    v0, s0, _ = _grads(params, stats, imgs, "xla", "xla")
    v1, s1, _ = _grads(params, stats, imgs, "xla", "cvjp")
    assert v0 == v1
    for k in s0:
        for leaf in s0[k]:
            np.testing.assert_array_equal(
                np.asarray(s0[k][leaf]), np.asarray(s1[k][leaf]))


def test_bn_cvjp_grads_match_autodiff(setup):
    imgs, params, stats = setup
    _, _, ref = _grads(params, stats, imgs, "xla", "xla")
    _, _, got = _grads(params, stats, imgs, "dot", "cvjp")
    _assert_grads_close(ref, got)


def test_bn_cvjp_masked_rows_fall_back(setup):
    """row_mask forces the autodiff path; grads must stay mask-correct:
    a padded row contributes nothing to the moments."""
    imgs, params, stats = setup
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    _, _, ref = _grads(params, stats, imgs, "xla", "xla", row_mask=mask)
    _, _, got = _grads(params, stats, imgs, "dot", "cvjp", row_mask=mask)
    _assert_grads_close(ref, got)


def test_bn_cvjp_syncbn_matches_single_device(setup):
    """shard_map(2 devices) + psum of the local grads == the single-device
    gradient on the same global batch (the sync-BN backward's correctness
    condition, incl. the global correction terms in dx).

    check_vma=False to match aocr.parallel.data_parallel's semantics: under
    the legacy transpose rules, grad-of-local-loss + outer psum assembles
    the global gradient (under the new vma rules the collectives' transposes
    already globalize each shard's grad, and an outer psum double-counts —
    for autodiff and for the cvjp alike)."""
    from jax.sharding import Mesh, PartitionSpec as P

    shard_map = functools.partial(jax.shard_map, check_vma=False)
    imgs, params, stats = setup
    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, ("dp",))

    def ref_loss(p):
        f, _ = cnn.apply(p, stats, imgs, train=True,
                         compute_dtype=jnp.float32)
        return jnp.sum(f * f)

    g_ref = jax.grad(ref_loss)(params)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P("dp")), out_specs=P(),
    )
    def dp_grads(p, x):
        def loss(pp):
            f, _ = cnn.apply(pp, stats, x, train=True,
                             compute_dtype=jnp.float32, axis_name="dp")
            return jnp.sum(f * f)

        return jax.tree.map(
            lambda g: jax.lax.psum(g, "dp"), jax.grad(loss)(p))

    g_dp = dp_grads(params, imgs)
    _assert_grads_close(g_ref, g_dp, rtol=5e-4)
