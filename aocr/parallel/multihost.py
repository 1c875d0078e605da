"""Multi-host (multi-process) training support.

A TPU pod slice runs one process per host; `initialize()` wires them into
one JAX runtime (gradient all-reduce then spans hosts over ICI/DCN
automatically — the DP step in aocr.parallel.data_parallel is unchanged,
its mesh just includes every host's devices).

Each host feeds only its own slice of the global batch:
`DataGen.shard(process_index, process_count)` drops manifest lines owned by
other hosts, and the per-host batch_size becomes
global_batch // process_count.

This module is exercised single-process in CI (shard() is pure host logic);
a real pod run needs only:

    multihost.initialize()          # env-configured (TPU pods), or pass
                                    # coordinator_address/num_processes/
                                    # process_id explicitly
    train_data.shard(jax.process_index(), jax.process_count())
"""

from __future__ import annotations

from typing import Optional

import jax


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
