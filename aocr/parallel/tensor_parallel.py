"""Tensor-parallel (+ data-parallel) training via GSPMD sharding annotations.

SURVEY.md section 2.2: tensor parallelism is not required for parity but the
1024-wide decoder matmuls are the natural candidates for optional sharding.
This module annotates those weights over the mesh's 'model' axis —
the fused 4H gate projections (wi/wh/biases) of every decoder LSTM layer and
the attention query projection w_a are sharded on their output dimension;
w_c and the output projector are sharded on their (hidden) input dimension so
the contraction becomes a reduce-scatter/all-reduce — and lets XLA's SPMD
partitioner propagate shardings and insert the collectives (all of which
ride ICI on a real TPU mesh).  The batch is simultaneously sharded over the
'data' axis, giving DP x TP from one jit.

Unlike the shard_map DP path (aocr.parallel.data_parallel), which writes the
psum explicitly, this path is compiler-driven: the same pure train step as
single-device, jitted with in/out shardings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aocr.config import Config
from aocr.parallel.mesh import DATA_AXIS, MODEL_AXIS
from aocr.train_step import _train_step


def param_pspecs(params: dict) -> dict:
    """PartitionSpec pytree for the model params: decoder gate projections
    sharded over MODEL_AXIS, contractions back via input-dim sharding,
    everything else replicated."""

    def dec_layer_spec(layer):
        return {
            "wi": P(None, MODEL_AXIS),
            "wh": P(None, MODEL_AXIS),
            "bi": P(MODEL_AXIS),
            "bh": P(MODEL_AXIS),
        }

    specs = jax.tree.map(lambda _: P(), params)
    dec = params["decoder"]
    specs["decoder"] = {
        "embedding": P(),
        "layers": [dec_layer_spec(l) for l in dec["layers"]],
        # w_a: output (query) dim sharded; w_c: input dim sharded (its input
        # [ctx ; h_top] is H-sharded), output replicated via all-reduce.
        "w_a": P(None, MODEL_AXIS),
        "w_c": P(MODEL_AXIS, None),
    }
    specs["projector"] = {"w": P(MODEL_AXIS, None), "b": P()}
    return specs


def shard_params(params: dict, mesh: Mesh) -> dict:
    specs = param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def make_tp_train_step(cfg: Config, mesh: Mesh):
    """Jitted DP x TP train step.  Params must be placed with shard_params
    (their shardings are inferred from the inputs and propagated by GSPMD);
    batch arrays sharded over DATA_AXIS (mesh_lib.shard_batch).

    The returned step has the same call signature as the DP step (incl. the
    optional row_mask for padded partial buckets), so the Trainer can use
    either interchangeably."""

    def jit_step(params, batch_stats, opt_state, images, targets,
                 targets_eval, lr, rng, row_mask):
        real_bs = jnp.maximum(jnp.sum(row_mask), 1.0)
        return _train_step(params, batch_stats, opt_state, images, targets,
                           targets_eval, lr, rng, cfg, real_bs=real_bs,
                           row_mask=row_mask)

    def sh(spec):
        return NamedSharding(mesh, spec)

    jitted = jax.jit(
        jit_step,
        # Inputs carry their shardings (device_put above); only pin the
        # batch axis so the compiler cannot replicate it.
        in_shardings=(None, None, None, sh(P(DATA_AXIS)), sh(P(DATA_AXIS)),
                      sh(P(DATA_AXIS)), None, None, sh(P(DATA_AXIS))),
    )

    def step(params, batch_stats, opt_state, images, targets, targets_eval,
             lr, rng, row_mask=None):
        if row_mask is None:
            row_mask = jnp.ones((images.shape[0],), jnp.float32)
        return jitted(params, batch_stats, opt_state, images, targets,
                      targets_eval, lr, rng,
                      jnp.asarray(row_mask, jnp.float32))

    return step
