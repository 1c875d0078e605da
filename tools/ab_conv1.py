#!/usr/bin/env python3
"""A/B the fused conv1+bias+ReLU+pool Pallas kernels on the real TPU.

kernel — conv1 complex as two pallas_calls (ops/pallas/conv1_pool.py):
         patch-matmul forward straight to the pooled activation, backward
         recomputes scores and accumulates dW/db in-kernel — the 164 MB
         pre-pool tensor and its scatter/mask/reduce chains never exist
xla    — lax.conv + _bias_add + relu + reduce_window (status quo: ~2.2
         ms/step of the B=400 r5 train trace)

Measures the FULL train step, alternating in one process with
jax.clear_caches() between flips (docs/performance.md protocol).

Usage: python tools/ab_conv1.py [batch] [mode...]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = {"kernel": True, "xla": False}


def main():
    import jax
    import jax.numpy as jnp

    from aocr import optim, train_step, vocab
    from aocr.config import Config
    from aocr.models import model
    from aocr.ops.pallas import conv1_pool
    from tools.device_timing import dispatch_floor_ms, measure

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    modes = [m for m in sys.argv[2:] if m in MODES] or list(MODES)
    T = 11
    cfg = Config(input_feed=True, compute_dtype="bfloat16",
                 batch_size=B, prealloc=False).validate()
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (B, 32, 100, 1)).astype(np.float32))
    words = ["".join(rng.choice(list("abcdefghij"), size=T - 1))
             for _ in range(B)]
    targets, targets_eval, _ = vocab.encode_batch(words)
    tg, te = jnp.asarray(targets), jnp.asarray(targets_eval)
    ms = model.init(jax.random.PRNGKey(cfg.seed), cfg)
    opt0 = optim.sgd_init(ms.params)
    floor = dispatch_floor_ms()
    print(f"B={B} T={tg.shape[1]} floor {floor:.1f} ms", flush=True)

    def make():
        step = train_step.make_train_step(cfg)

        def full(carry):
            params, stats, opt = carry
            out = step(params, stats, opt, images, tg, te,
                       jnp.float32(0.1), jax.random.PRNGKey(0))
            return (out.params, out.batch_stats, out.opt_state)

        return full, (ms.params, ms.batch_stats, opt0)

    best = {n: float("inf") for n in modes}
    for round_i in range(3):
        for n in modes:
            jax.clear_caches()
            conv1_pool.ENABLE = MODES[n]
            fn, carry = make()
            t = measure(fn, carry, rep=8, outer=2, floor_ms=floor)
            best[n] = min(best[n], t)
            print(f"round {round_i} {n}: {t:.2f} ms "
                  f"({B / t * 1000:.0f} img/s)", flush=True)
    print("BEST: " + " | ".join(
        f"{n} {best[n]:.2f} ms ({B / best[n] * 1000:.0f} img/s)"
        for n in modes), flush=True)


if __name__ == "__main__":
    main()
