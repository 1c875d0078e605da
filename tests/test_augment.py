"""On-device training augmentation (aocr/augment.py): deterministic
per-global-row keying, value bounds, and exact data-parallel ==
single-device parity with -augment on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aocr import augment, optim, train_step, vocab
from aocr.config import Config
from aocr.models import model
from aocr.parallel import data_parallel, mesh as mesh_lib
from tests import synth

CFG = Config(
    batch_size=8, input_feed=True, encoder_num_hidden=16,
    target_embedding_size=8, image_width=32, augment=True,
).validate()


def _images(labels):
    return jnp.asarray(
        np.stack([synth.render_word(l, 32, 32) for l in labels])[..., None])


def test_deterministic_and_bounded():
    imgs = _images(["ab", "cd", "ef"])
    rng = jax.random.PRNGKey(7)
    a = np.asarray(augment.augment_batch(rng, imgs))
    b = np.asarray(augment.augment_batch(rng, imgs))
    np.testing.assert_array_equal(a, b)  # same key -> same augmentation
    c = np.asarray(augment.augment_batch(jax.random.PRNGKey(8), imgs))
    assert not np.allclose(a, c)  # different step -> different augmentation
    assert a.shape == imgs.shape
    assert a.min() >= 0.0 and a.max() <= 255.0
    # rows are independently keyed: identical inputs augment differently
    same = _images(["ab", "ab"])
    out = np.asarray(augment.augment_batch(rng, same))
    assert not np.allclose(out[0], out[1])


def test_strength_zero_is_identity():
    imgs = _images(["ab", "cd"])
    out = np.asarray(
        augment.augment_batch(jax.random.PRNGKey(0), imgs, strength=0.0))
    np.testing.assert_allclose(out, np.asarray(imgs), atol=1e-3)


def test_row_offset_keys_global_rows():
    """augmenting a slice with its global offset reproduces the full-batch
    augmentation of those rows — the data-parallel shard invariant."""
    imgs = _images(["ab", "cd", "ef", "gh"])
    rng = jax.random.PRNGKey(3)
    full = np.asarray(augment.augment_batch(rng, imgs))
    part = np.asarray(augment.augment_batch(rng, imgs[2:], row_offset=2))
    np.testing.assert_array_equal(full[2:], part)


@pytest.mark.parametrize("ndev", [2, 4])
def test_dp_matches_single_device_with_augment(ndev):
    """-augment keys every row by its GLOBAL index, so the sharded step
    augments (and therefore updates) bit-identically to single-device."""
    assert len(jax.devices()) >= ndev
    labels = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op"]
    imgs = _images(labels)
    targets, targets_eval, _ = vocab.encode_batch(labels)
    targets, targets_eval = jnp.asarray(targets), jnp.asarray(targets_eval)
    ms = model.init(jax.random.PRNGKey(0), CFG)
    m = mesh_lib.make_mesh(num_data=ndev)
    dp_step = data_parallel.make_dp_train_step(CFG, m)
    single = train_step.make_train_step(CFG)
    opt = optim.sgd_init(ms.params)
    lr = jnp.float32(0.1)
    rng = jax.random.PRNGKey(42)
    im, tg, te = mesh_lib.shard_batch(m, imgs, targets, targets_eval)
    out_dp = dp_step(ms.params, ms.batch_stats, opt, im, tg, te, lr, rng)
    out_1 = single(ms.params, ms.batch_stats, opt, imgs, targets,
                   targets_eval, lr, rng)
    np.testing.assert_allclose(float(out_dp.loss_sum), float(out_1.loss_sum),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(out_dp.params),
                    jax.tree.leaves(out_1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4)


def test_augment_changes_the_loss_but_stays_finite():
    """The augmented step trains on genuinely different pixels."""
    labels = ["ab", "cd"]
    imgs = _images(labels)
    targets, targets_eval, _ = vocab.encode_batch(labels)
    targets, targets_eval = jnp.asarray(targets), jnp.asarray(targets_eval)
    ms = model.init(jax.random.PRNGKey(0), CFG)
    opt = optim.sgd_init(ms.params)
    step_aug = train_step.make_train_step(CFG)
    step_plain = train_step.make_train_step(CFG.replace(augment=False))
    rng = jax.random.PRNGKey(1)
    out_a = step_aug(ms.params, ms.batch_stats, opt, imgs, targets,
                     targets_eval, jnp.float32(0.1), rng)
    out_p = step_plain(ms.params, ms.batch_stats, opt, imgs, targets,
                       targets_eval, jnp.float32(0.1), rng)
    assert np.isfinite(float(out_a.loss_sum))
    assert float(out_a.loss_sum) != float(out_p.loss_sum)
