#!/usr/bin/env python3
"""A/B the full training step across config variants on the real TPU.

Variants are measured alternating (A, B, A, B, ...) in one process with
jax.clear_caches() between flips, min-of-N — the only trustworthy protocol
on the shared dev chip (run-to-run drift ~±10%, docs/performance.md).

Usage: python tools/ab_train.py [batch] [variant ...]
  variants: base remat  (default: base remat)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": {},
    "remat": {"remat": True},
    # no "prealloc" variant: make() forces prealloc=False for every
    # variant because measure() re-feeds the same carry, which buffer
    # donation would invalidate — a prealloc entry would silently A/A.
    "autodiff": {"decoder_custom_vjp": False},
    "custom": {"decoder_custom_vjp": True},
    "fusedproj": {"fused_encoder_proj": True},
    "augment": {"augment": True},
}


def main():
    import jax
    import jax.numpy as jnp

    from aocr import optim, train_step, vocab
    from aocr.config import Config
    from tools.device_timing import dispatch_floor_ms, measure

    B = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 400
    names = [a for a in sys.argv[1:] if not a.isdigit()] or ["base", "remat"]
    T = 11
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (B, 32, 100, 1)).astype(np.float32))
    words = ["".join(rng.choice(list("abcdefghij"), size=T - 1))
             for _ in range(B)]
    targets, targets_eval, _ = vocab.encode_batch(words)
    tg, te = jnp.asarray(targets), jnp.asarray(targets_eval)
    floor = dispatch_floor_ms()
    print(f"B={B} T={tg.shape[1]} floor {floor:.1f} ms", flush=True)

    def make(name):
        cfg = Config(input_feed=True, compute_dtype="bfloat16",
                     batch_size=B, **VARIANTS[name]).validate()
        ms = model_init(cfg)
        step = train_step.make_train_step(cfg.replace(prealloc=False))
        opt0 = optim.sgd_init(ms.params)

        def full(carry):
            params, stats, opt = carry
            out = step(params, stats, opt, images, tg, te,
                       jnp.float32(0.1), jax.random.PRNGKey(0))
            return (out.params, out.batch_stats, out.opt_state)

        return full, (ms.params, ms.batch_stats, opt0)

    def model_init(cfg):
        from aocr.models import model
        return model.init(jax.random.PRNGKey(cfg.seed), cfg)

    best = {n: float("inf") for n in names}
    for round_i in range(3):
        for n in names:
            jax.clear_caches()
            fn, carry = make(n)
            t = measure(fn, carry, rep=8, outer=2, floor_ms=floor)
            best[n] = min(best[n], t)
            print(f"round {round_i} {n}: {t:.2f} ms "
                  f"({B / t * 1000:.0f} img/s)", flush=True)
    print("BEST: " + " | ".join(
        f"{n} {best[n]:.2f} ms ({B / best[n] * 1000:.0f} img/s)"
        for n in names), flush=True)


if __name__ == "__main__":
    main()
