#!/usr/bin/env python3
"""A/B the Pallas batch-tile calibration margin on the real TPU.

cal125 — CALIBRATION=1.25 (shipped): at B=400 the decoder fwd/bwd
         kernels run 3 tiles of 136 rows (pad 8)
cal100 — CALIBRATION=1.0: the same kernels pick 2 tiles of 200 rows
         (pad 0, ~1/3 fewer sequential grid programs), trusting the
         naive VMEM estimate (~80 MB) against the 84 MB budget.
         Mosaic rejects the compile outright if it truly doesn't fit,
         so this is a safe probe of whether the 1.25x margin
         (calibrated at bt=128) is over-conservative at larger tiles.

Measures the FULL train step, alternating in one process with
jax.clear_caches() between flips (docs/performance.md protocol).

Usage: python tools/ab_btcal.py [batch]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = {"cal125": 1.25, "cal100": 1.0}


def main():
    import jax
    import jax.numpy as jnp

    from aocr import optim, train_step, vocab
    from aocr.config import Config
    from aocr.models import model
    from aocr.ops.pallas import tiling
    from tools.device_timing import dispatch_floor_ms, measure

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 400
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

    best = {n: float("inf") for n in MODES}
    for round_i in range(3):
        for n, cal in MODES.items():
            jax.clear_caches()
            tiling.CALIBRATION = cal
            fn, carry = make()
            try:
                t = measure(fn, carry, rep=8, outer=2, floor_ms=floor)
            except Exception as e:  # Mosaic VMEM reject -> record and skip
                print(f"round {round_i} {n}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                continue
            best[n] = min(best[n], t)
            print(f"round {round_i} {n}: {t:.2f} ms "
                  f"({B / t * 1000:.0f} img/s)", flush=True)
    print("BEST: " + " | ".join(
        f"{n} {best[n]:.2f} ms ({B / best[n] * 1000:.0f} img/s)"
        for n in MODES), flush=True)


if __name__ == "__main__":
    main()
