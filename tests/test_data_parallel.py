"""Distributed-without-a-cluster tests (SURVEY.md section 4): an 8-device
CPU mesh must produce the same gradients/updates as single-device on the
same global batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aocr import optim, train_step, vocab
from aocr.config import Config
from aocr.models import model
from aocr.parallel import data_parallel, mesh as mesh_lib
from tests import synth

CFG = Config(
    batch_size=8, input_feed=True, encoder_num_hidden=16,
    target_embedding_size=8, image_width=32,
).validate()


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    labels = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op"]
    imgs = np.stack([synth.render_word(l, 32, 32) for l in labels])[..., None]
    targets, targets_eval, _ = vocab.encode_batch(labels)
    ms = model.init(jax.random.PRNGKey(0), CFG)
    return dict(
        images=jnp.asarray(imgs),
        targets=jnp.asarray(targets),
        targets_eval=jnp.asarray(targets_eval),
        params=ms.params,
        stats=ms.batch_stats,
    )


@pytest.mark.parametrize("ndev", [2, 8])
def test_dp_matches_single_device(setup, ndev):
    m = mesh_lib.make_mesh(num_data=ndev)
    dp_step = data_parallel.make_dp_train_step(CFG, m)
    single = train_step.make_train_step(CFG)
    opt = optim.sgd_init(setup["params"])
    lr = jnp.float32(0.1)
    rng = jax.random.PRNGKey(42)

    im, tg, te = mesh_lib.shard_batch(
        m, setup["images"], setup["targets"], setup["targets_eval"]
    )
    out_dp = dp_step(setup["params"], setup["stats"], opt, im, tg, te, lr, rng)
    out_1 = single(setup["params"], setup["stats"], opt, setup["images"],
                   setup["targets"], setup["targets_eval"], lr, rng)

    # loss: global token sum must match
    np.testing.assert_allclose(float(out_dp.loss_sum), float(out_1.loss_sum),
                               rtol=1e-5)
    # parameters after one update must match leaf-by-leaf
    for a, b in zip(jax.tree.leaves(out_dp.params),
                    jax.tree.leaves(out_1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4)
    # cross-replica BN stats must match single-device stats on the same batch
    for a, b in zip(jax.tree.leaves(out_dp.batch_stats),
                    jax.tree.leaves(out_1.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4)


def test_dp_params_replicated(setup):
    m = mesh_lib.make_mesh(num_data=4)
    dp_step = data_parallel.make_dp_train_step(CFG, m)
    opt = optim.sgd_init(setup["params"])
    im, tg, te = mesh_lib.shard_batch(
        m, setup["images"], setup["targets"], setup["targets_eval"]
    )
    out = dp_step(setup["params"], setup["stats"], opt, im, tg, te,
                  jnp.float32(0.1), jax.random.PRNGKey(0))
    # updated params are fully replicated (addressable on every device)
    leaf = jax.tree.leaves(out.params)[0]
    assert leaf.sharding.is_fully_replicated
    # batch stays shardable for a second step
    out2 = dp_step(out.params, out.batch_stats, out.opt_state, im, tg, te,
                   jnp.float32(0.1), jax.random.PRNGKey(1))
    assert np.isfinite(float(out2.loss_sum))


def test_dp_padded_partial_batch_matches_unpadded(setup):
    """A partial bucket padded with masked rows must produce the SAME step
    as the unpadded batch: the mask keeps pad rows out of BN moments and
    the all-reduced real_bs normalization (r1 advisor finding: duplicated
    pad rows used to bias batch statistics)."""
    from aocr import vocab as v

    m4 = mesh_lib.make_mesh(num_data=4)
    m2 = mesh_lib.make_mesh(num_data=2)
    opt = optim.sgd_init(setup["params"])
    lr = jnp.float32(0.1)
    rng = jax.random.PRNGKey(3)

    # real data: 4 rows on 2 devices; padded variant: same 4 + 4 masked
    # PAD rows on 4 devices
    im4 = setup["images"][:4]
    tg4, te4 = setup["targets"][:4], setup["targets_eval"][:4]
    pad_im = jnp.concatenate([im4, im4[-1:].repeat(4, 0)], 0)
    zrow = jnp.full((4, tg4.shape[1]), v.PAD, tg4.dtype)
    pad_tg = jnp.concatenate([tg4, zrow], 0)
    pad_te = jnp.concatenate([te4, zrow], 0)
    mask = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0])

    a_im, a_tg, a_te = mesh_lib.shard_batch(m2, im4, tg4, te4)
    b_im, b_tg, b_te, b_mk = mesh_lib.shard_batch(m4, pad_im, pad_tg,
                                                  pad_te, mask)
    out_a = data_parallel.make_dp_train_step(CFG, m2)(
        setup["params"], setup["stats"], opt, a_im, a_tg, a_te, lr, rng)
    out_b = data_parallel.make_dp_train_step(CFG, m4)(
        setup["params"], setup["stats"], opt, b_im, b_tg, b_te, lr, rng,
        row_mask=b_mk)
    np.testing.assert_allclose(float(out_b.loss_sum), float(out_a.loss_sum),
                               rtol=1e-5)
    # BN running stats identical: masked rows contributed nothing
    for a, b in zip(jax.tree.leaves(out_a.batch_stats),
                    jax.tree.leaves(out_b.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # parameter updates identical
    for a, b in zip(jax.tree.leaves(out_a.params),
                    jax.tree.leaves(out_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4)


def test_dp_masked_and_unmasked_variants_agree_on_full_batch(setup):
    """The two compiled DP step variants — row_mask=None (BN custom-VJP
    fast path, full buckets) and an all-ones row_mask (autodiff path,
    padded tails) — must produce the same update on the same full batch.
    Under -multihost, hosts pick between these programs by the GLOBAL row
    count (train.step_train all_full); this pins that either choice is
    numerically interchangeable, so the lockstep rule is purely about
    collective-sequence agreement, not results."""
    m = mesh_lib.make_mesh(num_data=4)
    opt = optim.sgd_init(setup["params"])
    lr, rng = jnp.float32(0.1), jax.random.PRNGKey(7)
    step = data_parallel.make_dp_train_step(CFG, m)

    im, tg, te, mk = mesh_lib.shard_batch(
        m, setup["images"], setup["targets"], setup["targets_eval"],
        jnp.ones((setup["images"].shape[0],), jnp.float32))
    out_masked = step(setup["params"], setup["stats"], opt, im, tg, te,
                      lr, rng, row_mask=mk)
    out_plain = step(setup["params"], setup["stats"], opt, im, tg, te,
                     lr, rng)
    np.testing.assert_allclose(float(out_masked.loss_sum),
                               float(out_plain.loss_sum), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out_masked.batch_stats),
                    jax.tree.leaves(out_plain.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(out_masked.params),
                    jax.tree.leaves(out_plain.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)
