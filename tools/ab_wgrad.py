#!/usr/bin/env python3
"""A/B the r3 flat-contraction weight grads + output-masked ReLU against
their previous forms (jax.nn.relu input-mask; 'tbd,tbg->dg' two-dim
contractions) on the real TPU, alternating in one process.

The "old" variant monkeypatches cnn._relu back to jax.nn.relu and wraps
mm.einsum to rewrite the flattened equations back to their two-dim
originals (undoing the .reshape is safe: the flatten is bijective).

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
    from aocr.models import cnn, model
    from aocr.ops import mm
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

    new_relu = cnn._relu
    new_einsum = mm.einsum
    # Rewrites of the flattened weight-grad contractions back to the
    # pre-r3 two-dim form.  T is baked per call site via the operand rank.
    OLD_EQS = {"nd,ng->dg": "tbd,tbg->dg", "nh,ng->hg": "lbh,lbg->hg",
               "nd,nh->dh": "tbd,tbh->dh", "nh,nj->hj": "tbh,tbj->hj"}

    def old_einsum(eq, *ops):
        if eq in OLD_EQS and all(o.ndim == 2 for o in ops):
            # both decoder (T, B, .) and encoder (L, B, .) stacks have B
            # as the middle axis, so (-1, B, .) un-flattens either
            ops = tuple(o.reshape(-1, B, o.shape[-1]) for o in ops)
            return new_einsum(OLD_EQS[eq], *ops)
        return new_einsum(eq, *ops)

    # lstm.py binds einsum as a module global (patchable); decoder.py's
    # _tf_core imports mm.einsum locally when building a core, and built
    # cores are cached — so patch mm.einsum itself and clear the VJP
    # caches so the cores rebuild against the patched attr.
    from aocr.models import decoder as dec_mod
    from aocr.ops import lstm as lstm_mod

    def run_variant(name):
        if name == "old":
            cnn._relu = jax.nn.relu
            mm.einsum = old_einsum
            lstm_mod.einsum = old_einsum
        else:
            cnn._relu = new_relu
            mm.einsum = new_einsum
            lstm_mod.einsum = new_einsum
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
        cnn._relu = new_relu
        mm.einsum = new_einsum
        lstm_mod.einsum = new_einsum
        return t

    best = {"new": float("inf"), "old": float("inf")}
    for r in range(rounds):
        for name in ("new", "old"):
            t = run_variant(name)
            best[name] = min(best[name], t)
            print(f"round {r} {name:4s} {t:7.2f} ms/step", flush=True)
    print(f"best: new {best['new']:.2f}  old {best['old']:.2f}  "
          f"({best['old'] / best['new']:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
