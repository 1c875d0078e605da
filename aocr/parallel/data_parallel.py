"""Data-parallel training step: shard_map over the mesh's data axis.

Each device computes forward+backward on its batch shard; gradients (already
normalized by the *global* batch size, matching the reference's
divide-by-batch-size convention, src/model/model.lua:645-647) are
all-reduced with `psum` over the data axis — an ICI collective on real TPU
meshes — and the SGD update then runs replicated, so parameters stay
bitwise-identical across devices.  BatchNorm batch statistics are averaged
across shards (cross-replica BN) before updating the running stats.

This is BASELINE.json config 5: DP Synth90k training with psum gradient
allreduce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from aocr import optim
from aocr.config import Config
from aocr.models import model
from aocr.train_step import TrainOutput
from aocr.parallel.mesh import DATA_AXIS


def make_dp_train_step(cfg: Config, mesh: Mesh):
    """Build the jitted data-parallel train step.

    Call with params/batch_stats/opt_state replicated and batch arrays
    sharded along axis 0 (see mesh.shard_batch); returns TrainOutput with
    replicated updated state and the global token-sum loss.
    """
    n_data = mesh.shape[DATA_AXIS]

    def local_step(params, batch_stats, opt_state, images, targets,
                   targets_eval, lr, rng, row_mask=None):
        # row_mask (local rows,) marks real samples.  Partial final buckets
        # are padded with zero-loss PAD rows to stay shardable; loss/grad
        # normalization must still use the true sample count (the reference
        # divides by the real batch size, model.lua:645-647) — all-reduced
        # from the mask so multi-host epoch tails with uneven local counts
        # stay correct, and BN moments exclude the padding.  Full buckets
        # compile the row_mask=None variant so the BN train backward takes
        # its hand-derived sync-BN custom VJP (cnn._bn_train_cvjp) in
        # production DP, not just in tests (ADVICE r4).
        my = jax.lax.axis_index(DATA_AXIS)
        if cfg.augment:
            from aocr import augment as augment_lib
            from aocr.train_step import _AUG_TAG

            # global-row keying (offset = my shard's first global row):
            # the augmented batch is bit-identical to the single-device
            # step's, so DP == single-device parity holds with -augment on
            images = augment_lib.augment_batch(
                jax.random.fold_in(rng, _AUG_TAG), images,
                strength=cfg.augment_strength,
                row_offset=my * images.shape[0])
        rng = jax.random.fold_in(rng, my)
        if row_mask is None:
            real_bs = jnp.float32(images.shape[0] * n_data)
        else:
            real_bs = jnp.maximum(
                jax.lax.psum(jnp.sum(row_mask.astype(jnp.float32)),
                             DATA_AXIS),
                1.0,
            )

        def loss_fn(p):
            # the single shared forward pipeline with sync-BN (axis_name):
            # batch moments reduce across the data axis inside cnn.apply,
            # so every shard normalizes with (and records) the exact
            # global-batch statistics a single chip would compute
            nll, new_stats, _ = model.forward_loss(
                p, batch_stats, images, targets, targets_eval, cfg,
                train=True, dropout_rng=rng, row_mask=row_mask,
                axis_name=DATA_AXIS,
            )
            return nll / real_bs, new_stats

        (mean_loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        # ICI all-reduce: gradients and loss summed over the data axis.
        grads = jax.lax.psum(grads, DATA_AXIS)
        mean_loss = jax.lax.psum(mean_loss, DATA_AXIS)
        if cfg.optimizer == "adadelta":
            new_params, new_opt, norms = optim.adadelta_update(
                params, grads, opt_state, weight_decay=cfg.weight_decay
            )
        else:
            new_params, new_opt, norms = optim.sgd_update(
                params, grads, opt_state, lr, optim.hyper_from_config(cfg)
            )
        return TrainOutput(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            loss_sum=mean_loss * real_bs,
            grad_norms=norms,
        )

    rep = P()
    sharded = P(DATA_AXIS)
    out_specs = TrainOutput(
        params=rep, batch_stats=rep, opt_state=rep,
        loss_sum=rep, grad_norms=rep,
    )
    donate = (0, 2) if cfg.prealloc else ()
    # Two compiled variants: full buckets run the unmasked step (the BN
    # backward's fast custom-VJP path); padded tails run the masked one.
    # jit compiles lazily, so an epoch with no partial bucket never
    # compiles the masked variant.
    _jit_full = jax.jit(
        jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(rep, rep, rep, sharded, sharded, sharded, rep, rep),
            out_specs=out_specs, check_vma=False,
        ),
        donate_argnums=donate,
    )
    _jit_masked = jax.jit(
        jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(rep, rep, rep, sharded, sharded, sharded, rep, rep,
                      sharded),
            out_specs=out_specs, check_vma=False,
        ),
        donate_argnums=donate,
    )

    def step(params, batch_stats, opt_state, images, targets, targets_eval,
             lr, rng, row_mask=None):
        if row_mask is None:
            return _jit_full(params, batch_stats, opt_state, images,
                             targets, targets_eval, lr, rng)
        return _jit_masked(params, batch_stats, opt_state, images, targets,
                           targets_eval, lr, rng, row_mask)

    return step
