"""Device mesh construction for data/tensor parallelism.

The reference is strictly single-device (`/root/reference/src/train.lua:246`,
`cutorch.setDevice`); multi-chip scale-out is new capability built the TPU
way: a `jax.sharding.Mesh` whose 'data' axis shards the batch across chips
(gradient all-reduce rides ICI via psum) and an optional 'model' axis for
tensor-parallel sharding of the wide decoder matmuls.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh.  Defaults to all devices on the data axis."""
    devs = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devs) // num_model
    # user-facing validation (CLI -num_shards / AttentionOCR.shard reach
    # here): raise real errors, not asserts that vanish under python -O
    if num_data < 1 or num_model < 1:
        raise ValueError(
            f"mesh axes must be >= 1, got data={num_data} "
            f"model={num_model}")
    if num_data * num_model > len(devs):
        raise ValueError(
            f"need {num_data}x{num_model} devices, have {len(devs)}")
    grid = np.array(devs[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: sharded along axis 0 over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays onto the mesh, sharded over the data axis.

    Replaces the reference's per-batch `localize()` host->device copy
    (src/utils/utils.lua:96-102, src/model/model.lua:252-254).

    Single-process: a plain device_put with a NamedSharding.  Multi-process
    (TPU pod): each process passes its *local* rows and the global array is
    assembled with make_array_from_process_local_data — every host must
    contribute the same number of rows.
    """
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        out = tuple(
            jax.make_array_from_process_local_data(s, np.asarray(a))
            for a in arrays
        )
    else:
        out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]
