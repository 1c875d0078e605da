#!/usr/bin/env python3
"""A/B the CNN ReLU VJP form on the real TPU: jax.nn.relu (custom JVP,
select(x>0, g, 0)) vs jnp.maximum(x, 0) (tie-splitting VJP that makes XLA
bit-pack eq-masks for both branches).

Variant B monkeypatches jax.nn.relu back to jnp.maximum so both variants
trace the same cnn.apply; alternating min-of-N with jax.clear_caches()
between flips (the only trustworthy protocol on the shared dev chip).

Usage: python tools/ab_relu.py [batch] [rounds]
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
    from aocr.models import model
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

    relu_orig = jax.nn.relu

    def run_variant(name):
        if name == "maximum":
            jax.nn.relu = lambda x: jnp.maximum(x, 0)
        else:
            jax.nn.relu = relu_orig
        jax.clear_caches()
        step = train_step.make_train_step(cfg)

        def body(carry):
            p, s, o = carry
            out = step(p, s, o, images, tg, te, jnp.float32(0.1),
                       jax.random.PRNGKey(0))
            return (out.params, out.batch_stats, out.opt_state)

        ms_t = measure(body, (ms.params, ms.batch_stats, opt0),
                       floor_ms=floor)
        jax.nn.relu = relu_orig
        return ms_t

    best = {"relu": float("inf"), "maximum": float("inf")}
    for r in range(rounds):
        for name in ("relu", "maximum"):
            t = run_variant(name)
            best[name] = min(best[name], t)
            print(f"round {r} {name:8s} {t:7.2f} ms/step", flush=True)
    print(f"best: relu {best['relu']:.2f}  maximum {best['maximum']:.2f}  "
          f"({best['maximum'] / best['relu']:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
