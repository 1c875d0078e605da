"""Multi-host (multi-process) training support.

A TPU pod slice runs one process per host; `initialize()` wires them into
one JAX runtime (gradient all-reduce then spans hosts over ICI/DCN
automatically — the DP step in aocr.parallel.data_parallel is unchanged,
its mesh just includes every host's devices).

The hard part of multi-host data loading is **lockstep**: every process
must issue the same sequence of collective programs or the pod deadlocks,
but hosts hold different manifest slices, see different decode failures,
and hit epoch tails at different times.  Three mechanisms make the rebuilt
pipeline lockstep-safe (r1 advisor finding):

1. *Fixed shapes*: under multi-host, DataGen pads targets to max_decoder_l
   and the Trainer pads every batch to the fixed per-host row count, so all
   hosts contribute identically-shaped local rows each step
   (jax.make_array_from_process_local_data requires it).
2. *Row masks*: padded rows carry mask 0 — excluded from BatchNorm moments,
   loss normalization (all-reduced from the mask), and eval metrics.
3. *The lockstep() generator*: each step, hosts all-gather
   (have_batch, num_nonzeros, rows); hosts whose epoch ended emit dummy
   all-masked batches until every host is done, so collective counts always
   match.

Usage on a pod (one process per host):

    python -m aocr.train -phase train -multihost -num_shards <total chips> ...

which runs `initialize()` (env-configured on TPU pods), shards the manifest
per process, and activates the lockstep path.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Tuple

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with TPU-pod auto-configuration when no
    arguments are given."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info() -> tuple:
    return jax.process_index(), jax.process_count()


def local_batch_size(global_batch_size: int, process_count: int) -> int:
    """Per-host rows: the reference's batch_size stays the *global* batch
    (src/train.lua:41); each host feeds its share."""
    assert global_batch_size >= process_count, (
        f"batch_size {global_batch_size} < process_count {process_count}"
    )
    return global_batch_size // process_count


def sync_counts(*counts: int) -> Tuple[int, ...]:
    """All-reduce (sum) small host-side integers across processes.

    Single-process: identity.  Multi-process: one tiny allgather via
    jax.experimental.multihost_utils (rides the same collective fabric as
    the training step, so it cannot deadlock against it).
    """
    if jax.process_count() == 1:
        return tuple(int(c) for c in counts)
    from jax.experimental import multihost_utils

    arr = np.asarray(counts, np.int64)
    gathered = multihost_utils.process_allgather(arr)
    return tuple(int(x) for x in np.asarray(gathered).sum(axis=0))


def lockstep(
    iterator: Iterator,
    make_dummy: Callable[[], object],
    nnz_rows: Callable[[object], Tuple[int, int]],
    sync: Callable[..., Tuple[int, ...]] = sync_counts,
):
    """Iterate batches in lockstep across processes.

    Yields (batch, is_real, global_nnz, global_rows) until *every* process
    has exhausted its iterator.  Processes that run out early yield dummy
    (all-masked) batches so each host issues the same number of collective
    programs.  `sync` is injectable for single-process testing.
    """
    it = iter(iterator)
    while True:
        batch = next(it, None)
        have = batch is not None
        nnz, rows = nnz_rows(batch) if have else (0, 0)
        total_have, total_nnz, total_rows = sync(int(have), nnz, rows)
        if total_have == 0:
            return
        yield (batch if have else make_dummy()), have, total_nnz, total_rows
