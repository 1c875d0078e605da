#!/usr/bin/env python3
"""Large-batch evidence runs (VERDICT r3 missing #4): greedy decode at
B=2048 and full train steps at B>=1024, bench.py protocol (REP inside one
jit, dispatch+fetch floor subtracted, min-stat).

docs/performance.md had deferred batch 2048 ("not stable enough on the
shared dev chip"); this tool exists so the claim is retried each round and
either becomes a number or an explicitly recorded failure mode.  Run it
under tools/tpu_retry.sh — the known failure is a wedged tunnel RPC, not
the chip itself.

Usage: python tools/bench_large.py [greedy ...batches] [train ...batches]
  default: greedy 2048  train 1024 2048
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (measurement protocol + FLOP model)


def measure_greedy(floor_ms, B):
    import jax
    import jax.numpy as jnp

    from aocr import decode
    from aocr.config import Config
    from aocr.models import model

    cfg = Config(input_feed=True, compute_dtype="bfloat16").validate()
    ms = model.init(jax.random.PRNGKey(cfg.seed), cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (B, 32, 100, 1)).astype(np.float32))

    @jax.jit
    def rep_decode(images):
        def body(carry, _):
            im = carry
            labels, scores = decode.greedy_decode(
                ms.params, ms.batch_stats, im, cfg, cfg.max_decoder_l)
            return im + scores.sum() * 1e-9, labels.sum()

        _, sums = jax.lax.scan(body, images, None, length=bench.REP)
        return sums.sum()

    t0 = time.perf_counter()
    per_batch_ms = bench.timed_per_rep_ms(rep_decode, (images,), floor_ms)
    ips = B / per_batch_ms * 1000
    gflop = bench.flops_per_sample(cfg) / 1e9
    mfu = ips * gflop * 1e9 / bench.V5E_PEAK_FLOPS
    print(f"greedy B={B}: {per_batch_ms:.2f} ms/batch -> {ips:.0f} img/s "
          f"(~{mfu * 100:.1f}% MFU; stage took {time.perf_counter() - t0:.0f}s"
          " incl. compile)", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    args = sys.argv[1:] or ["greedy", "2048", "train", "1024", "2048"]
    stages = []  # (kind, B)
    kind = "greedy"
    for a in args:
        if a in ("greedy", "train"):
            kind = a
        else:
            stages.append((kind, int(a)))

    @jax.jit
    def trivial(x):
        return x + 1.0

    np.asarray(trivial(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(trivial(jnp.float32(0)))
    floor_ms = (time.perf_counter() - t0) / 10 * 1000
    print(f"dispatch+fetch floor: {floor_ms:.1f} ms", flush=True)

    for kind, B in stages:
        if kind == "greedy":
            measure_greedy(floor_ms, B)
        else:
            step_ms, ips, mfu = bench.measure_train(floor_ms, B=B)
            # measure_train prints to stderr; mirror to the stall log
            print(f"train B={B}: {step_ms:.2f} ms/step -> {ips:.0f} img/s "
                  f"(~{mfu * 100:.1f}% MFU)", flush=True)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
