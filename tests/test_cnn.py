import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aocr.models import cnn


@pytest.mark.parametrize("width", [100, 32, 64, 320])
def test_shape_law(rng, width):
    """L = floor(W/4) - 1 across widths (reference src/model/cnn.lua:44-45)."""
    params = cnn.init_params(rng)
    stats = cnn.init_batch_stats()
    x = jnp.zeros((2, 32, width, 1), jnp.float32)
    feats, _ = cnn.apply(params, stats, x, train=False)
    assert feats.shape == (2, cnn.output_length(width), 512)
    assert cnn.output_length(width) == width // 4 - 1


def test_normalization_zero_input(rng):
    """Input of all-128 maps to 0 pre-conv ((x-128)/128, cnn.lua:9-10):
    output then equals the bias-only response, identical across pixels."""
    params = cnn.init_params(rng)
    stats = cnn.init_batch_stats()
    x = jnp.full((1, 32, 100, 1), 128.0)
    feats, _ = cnn.apply(params, stats, x, train=False)
    # interior columns (away from SAME padding borders) must all be equal
    mid = feats[0, 5:-5]
    assert np.allclose(mid, mid[0], atol=1e-5)


def test_train_updates_stats(rng):
    params = cnn.init_params(rng)
    stats = cnn.init_batch_stats()
    x = jax.random.uniform(rng, (2, 32, 64, 1), jnp.float32, 0, 255)
    _, new_stats = cnn.apply(params, stats, x, train=True)
    assert not np.allclose(new_stats["conv3_bn"]["mean"], stats["conv3_bn"]["mean"])
    # eval mode must not touch stats
    _, eval_stats = cnn.apply(params, stats, x, train=False)
    assert np.allclose(eval_stats["conv3_bn"]["mean"], stats["conv3_bn"]["mean"])


def test_param_count():
    """Conv+BN parameter count matches the hand-computed reference total."""
    expected = 0
    for in_c, out_c, k in [(1, 64, 3), (64, 128, 3), (128, 256, 3),
                           (256, 256, 3), (256, 512, 3), (512, 512, 3)]:
        expected += k * k * in_c * out_c + out_c
    expected += 2 * 2 * 512 * 512 + 512  # final VALID 2x2 conv
    expected += 2 * (256 + 512 + 512)  # three BN scale/bias pairs
    assert cnn.num_params() == expected


def test_jit_compiles(rng):
    params = cnn.init_params(rng)
    stats = cnn.init_batch_stats()
    f = jax.jit(lambda p, s, x: cnn.apply(p, s, x, train=False))
    x = jnp.zeros((1, 32, 100, 1))
    feats, _ = f(params, stats, x)
    assert feats.shape == (1, 24, 512)


def test_batch_norm_running_stats_match_torch():
    """Running stats must match Torch BN exactly: normalization uses the
    biased batch variance, but running_var stores the UNBIASED n/(n-1)
    estimate (nn.SpatialBatchNormalization semantics) — eval-mode parity
    with a reference-trained model depends on it."""
    torch = pytest.importorskip("torch")

    rng = np.random.RandomState(0)
    x = rng.randn(3, 5, 7, 4).astype(np.float32)  # (B, H, W, C)
    p = {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))}
    s = {"mean": jnp.asarray(rng.randn(4).astype(np.float32)),
         "var": jnp.abs(jnp.asarray(rng.randn(4).astype(np.float32))) + 0.5}
    y, new_s = cnn._batch_norm(jnp.asarray(x), p, s, train=True)

    bn = torch.nn.BatchNorm2d(4, momentum=1 - cnn.BN_MOMENTUM)
    bn.train()
    with torch.no_grad():
        bn.running_mean.copy_(torch.tensor(np.asarray(s["mean"])))
        bn.running_var.copy_(torch.tensor(np.asarray(s["var"])))
    yt = bn(torch.tensor(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(new_s["mean"]),
                               bn.running_mean.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_s["var"]),
                               bn.running_var.numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(y), yt.permute(0, 2, 3, 1).detach().numpy(),
        rtol=1e-5, atol=1e-5)
    # the masked path with an all-ones mask must agree with the unmasked
    y2, new_s2 = cnn._batch_norm(jnp.asarray(x), p, s, train=True,
                                 row_mask=jnp.ones((3,)))
    np.testing.assert_allclose(np.asarray(new_s2["var"]),
                               np.asarray(new_s["var"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y),
                               rtol=1e-5, atol=1e-6)
