#!/usr/bin/env python3
"""Capture an xplane trace of the full training step (or its pieces) and
print the top ops by device self-time (via tools/xplane_top.py).

Usage: python tools/trace_step.py [batch] [probe] [top_n]
  probe: full (default) | fwd | fwd_bwd | dec_bwd | enc_bwd
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from aocr import loss as loss_lib, optim, train_step, vocab
    from aocr.config import Config
    from aocr.models import decoder as dec_lib, head, model

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    probe = sys.argv[2] if len(sys.argv) > 2 else "full"
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    T = 11
    cfg = Config(input_feed=True, compute_dtype="bfloat16",
                 batch_size=B).validate()
    ms = model.init(jax.random.PRNGKey(cfg.seed), cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (B, 32, 100, 1)).astype(np.float32))
    words = ["".join(rng.choice(list("abcdefghij"), size=T - 1))
             for _ in range(B)]
    targets, targets_eval, _ = vocab.encode_batch(words)
    tg, te = jnp.asarray(targets), jnp.asarray(targets_eval)

    def gsum(g):
        return sum(jnp.sum(v.astype(jnp.float32))
                   for v in jax.tree.leaves(g))

    if probe == "full":
        step = train_step.make_train_step(cfg)
        opt0 = optim.sgd_init(ms.params)

        def run(carry):
            p, s, o = carry
            out = step(p, s, o, images, tg, te, jnp.float32(0.1),
                       jax.random.PRNGKey(0))
            return (out.params, out.batch_stats, out.opt_state)

        x0 = (ms.params, ms.batch_stats, opt0)
    elif probe == "dec_bwd":
        def f(im):
            def loss(p):
                ctx, dec_init, _ = model.encode(
                    p, ms.batch_stats, im, cfg, train=True)
                ctx = jax.lax.stop_gradient(ctx)
                dec_init = jax.lax.stop_gradient(dec_init)
                h = dec_lib.teacher_forced(
                    p["decoder"], dec_init, tg, ctx,
                    input_feed=cfg.input_feed, compute_dtype=jnp.bfloat16)
                lp = head.apply(p["projector"], h,
                                compute_dtype=jnp.bfloat16)
                return loss_lib.nll_sum(lp, te) / B
            return im + gsum(jax.grad(loss)(ms.params)) * 1e-20

        run = jax.jit(f)
        x0 = images
    elif probe == "enc_bwd":
        def f(im):
            def loss(p):
                ctx, _, _ = model.encode(
                    p, ms.batch_stats, im, cfg, train=True)
                return jnp.sum(ctx.astype(jnp.float32)) / B
            return im + gsum(jax.grad(loss)(ms.params)) * 1e-20

        run = jax.jit(f)
        x0 = images
    elif probe == "fwd_bwd":
        def f(im):
            def loss(p):
                nll, _, _ = model.forward_loss(
                    p, ms.batch_stats, im, tg, te, cfg, train=True)
                return nll / B
            return im + gsum(jax.grad(loss)(ms.params)) * 1e-20

        run = jax.jit(f)
        x0 = images
    else:  # fwd
        def f(im):
            nll, _, _ = model.forward_loss(
                ms.params, ms.batch_stats, im, tg, te, cfg, train=True)
            return im + nll * 1e-20

        run = jax.jit(f)
        x0 = images

    out = run(x0)
    np.asarray(jax.tree.leaves(out)[0])  # compile + warm

    trace_dir = f"/tmp/trace_{probe}"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = run(x0)
        np.asarray(jax.tree.leaves(out)[0])

    from tools import xplane_top

    sys.argv = ["xplane_top", trace_dir, str(top_n)]
    xplane_top.main()


if __name__ == "__main__":
    main()
