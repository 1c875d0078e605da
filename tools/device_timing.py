"""Device-side timing utilities for the axon TPU tunnel.

Two facts make naive timing wrong here (see docs/performance.md):
`block_until_ready()` does not wait for execution, and one dispatch+fetch
RPC costs ~30 ms.  `measure()` therefore repeats the workload N times
inside one jitted program — serialized through the carry so XLA can neither
parallelize nor elide the repetitions — fetches the result, and subtracts
the trivial-program floor.

    from tools.device_timing import measure, dispatch_floor_ms
    ms = measure(lambda x: my_fn(x), x0, rep=10)   # true ms per call
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def dispatch_floor_ms(iters: int = 10, stat: str = "mean") -> float:
    """Round-trip cost of dispatching + fetching a trivial program.
    stat="min" pairs with measure(stat="min")."""

    @jax.jit
    def trivial(x):
        return x + 1.0

    np.asarray(trivial(jnp.float32(0)))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(trivial(jnp.float32(0)))
        times.append((time.perf_counter() - t0) * 1000)
    return min(times) if stat == "min" else sum(times) / len(times)


def measure(
    fn: Callable,
    x0,
    rep: int = 10,
    outer: int = 3,
    floor_ms: float | None = None,
    stat: str = "mean",
) -> float:
    """True device time (ms) of one `fn(x)` call.

    fn must map a pytree x -> pytree of the same structure (its output is
    fed back as the next repetition's input, serializing the chain).

    stat="min" takes the minimum over the outer iterations instead of the
    mean — robust against tunnel-congestion spikes (RTT on this stack
    drifts by several ms), at the cost of reporting best-case time.  For
    sub-ms ops raise `rep` so the signal clears the RTT noise.
    """
    if floor_ms is None:
        floor_ms = dispatch_floor_ms(stat=stat)  # floor stat must pair

    @jax.jit
    def rep_fn(x):
        def body(carry, _):
            return fn(carry), ()

        out, _ = jax.lax.scan(body, x, None, length=rep)
        return jax.tree.map(lambda a: a.sum(), out)

    np.asarray(jax.tree.leaves(rep_fn(x0))[0])  # compile + warm
    times = []
    for _ in range(outer):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(rep_fn(x0))[0])
        times.append((time.perf_counter() - t0) * 1000)
    dt_ms = min(times) if stat == "min" else sum(times) / len(times)
    return (dt_ms - floor_ms) / rep
