#!/usr/bin/env python3
"""A/B two falsified train-step hypotheses against the shipped code on the
real TPU (documented in docs/performance.md "did NOT help"):

- flattening the weight-grad einsums' two-dim (t, b)/(l, b) contraction to
  a single (T*B, .) axis, so XLA emits a plain K=T*B dot instead of its
  windowed-conv lowering;
- a ReLU custom VJP that masks by the OUTPUT (y > 0 <=> x > 0), dropping
  the bit-packed input-mask residual jax.nn.relu's JVP makes XLA keep.

The experimental variant is patched IN at runtime (mm.einsum wrapper +
jax.nn.relu replacement), so the A/B reproduces on the shipped tree.
Measured 2026-08-17: experimental 19.58 vs shipped 19.56 ms best-of-3
alternating at B=400 — a wash; both effects already overlap/fuse well.

Usage: python tools/ab_wgrad.py [batch] [rounds]
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
    from aocr.models import cnn, decoder as dec_mod, model
    from aocr.ops import lstm as lstm_mod, mm
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

    # --- experimental pieces, patched in for the "flat" variant ---
    shipped_einsum = mm.einsum
    shipped_relu = jax.nn.relu
    FLAT = {"tbd,tbg->dg": "nd,ng->dg", "lbh,lbg->hg": "nh,ng->hg",
            "lbd,lbg->dg": "nd,ng->dg", "tbd,tbh->dh": "nd,nh->dh",
            "tbh,tbj->hj": "nh,nj->hj"}

    def flat_einsum(eq, *ops):
        if eq in FLAT and all(o.ndim == 3 for o in ops):
            ops = tuple(o.reshape(-1, o.shape[-1]) for o in ops)
            return shipped_einsum(FLAT[eq], *ops)
        return shipped_einsum(eq, *ops)

    @jax.custom_vjp
    def out_masked_relu(x):
        return jnp.maximum(x, 0)

    out_masked_relu.defvjp(
        lambda x: ((y := jnp.maximum(x, 0)), y),
        lambda y, g: (jnp.where(y > 0, g, jnp.zeros_like(g)),))

    def run_variant(name):
        if name == "flat":
            mm.einsum = flat_einsum
            lstm_mod.einsum = flat_einsum
            jax.nn.relu = out_masked_relu
        else:
            mm.einsum = shipped_einsum
            lstm_mod.einsum = shipped_einsum
            jax.nn.relu = shipped_relu
        # decoder._tf_core imports mm.einsum locally when building a core
        # and caches the core — clear so cores rebuild against the patch
        dec_mod._TF_VJP_CACHE.clear()
        lstm_mod._SCAN_VJP_CACHE.clear()
        jax.clear_caches()
        step = train_step.make_train_step(cfg)

        def body(carry):
            p, s, o = carry
            out = step(p, s, o, images, tg, te, jnp.float32(0.1),
                       jax.random.PRNGKey(0))
            return (out.params, out.batch_stats, out.opt_state)

        t = measure(body, (ms.params, ms.batch_stats, opt0), floor_ms=floor)
        mm.einsum = shipped_einsum
        lstm_mod.einsum = shipped_einsum
        jax.nn.relu = shipped_relu
        return t

    best = {"shipped": float("inf"), "flat": float("inf")}
    for r in range(rounds):
        for name in ("shipped", "flat"):
            t = run_variant(name)
            best[name] = min(best[name], t)
            print(f"round {r} {name:8s} {t:7.2f} ms/step", flush=True)
    print(f"best: shipped {best['shipped']:.2f}  flat {best['flat']:.2f}  "
          f"({best['flat'] / best['shipped']:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
