#!/usr/bin/env python3
"""A/B/C the conv bias-grad formulation on the real TPU.

The r4 train trace showed each bias-grad reduce_sum fused into the kLoop
fusion that materializes the conv-output cotangent (BN/ReLU backward
chain) — a dual-output loop fusion with an in-loop bf16 cross-sublane
reduce, ~2.1 ms/step across the stack at B=400, ~15-20x its bandwidth
roofline.  Variants (aocr.models.cnn._BIAS_GRAD):
  xla — plain `x + b`, autodiff reduce (status quo ante)
  dot — custom VJP; db = ones-vector dot_general (MXU), f32 accum
  f32 — custom VJP; db = f32 reduce behind an optimization_barrier

Alternating min-of-N with jax.clear_caches() between flips (the only
trustworthy protocol on the shared dev chip).

Usage: python tools/ab_biasgrad.py [batch] [rounds]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from aocr import optim, train_step, vocab
    from aocr.config import Config
    from aocr.models import cnn, model
    from tools.device_timing import dispatch_floor_ms, measure

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    T = 11
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (B, 32, 100, 1)).astype(np.float32))
    words = ["".join(rng.choice(list("abcdefghij"), size=T - 1))
             for _ in range(B)]
    targets, targets_eval, _ = vocab.encode_batch(words)
    tg, te = jnp.asarray(targets), jnp.asarray(targets_eval)

    cfg = Config(input_feed=True, compute_dtype="bfloat16",
                 batch_size=B).validate()
    ms = model.init(jax.random.PRNGKey(cfg.seed), cfg)
    opt0 = optim.sgd_init(ms.params)
    floor = dispatch_floor_ms(stat="min")
    print(f"B={B} floor {floor:.2f} ms", flush=True)

    def run_variant(name):
        cnn._BIAS_GRAD = name
        jax.clear_caches()
        step = train_step.make_train_step(cfg)

        def body(carry):
            p, s, o = carry
            out = step(p, s, o, images, tg, te, jnp.float32(0.1),
                       jax.random.PRNGKey(0))
            return (out.params, out.batch_stats, out.opt_state)

        return measure(body, (ms.params, ms.batch_stats, opt0),
                       floor_ms=floor)

    names = ("xla", "dot", "f32")
    best = {n: float("inf") for n in names}
    try:
        for r in range(rounds):
            for name in names:
                t = run_variant(name)
                best[name] = min(best[name], t)
                print(f"round {r} {name:4s} {t:7.2f} ms/step", flush=True)
    finally:
        cnn._BIAS_GRAD = "dot"
    print("best: " + "  ".join(f"{n} {best[n]:.2f}" for n in names),
          flush=True)


if __name__ == "__main__":
    main()
