#!/usr/bin/env python3
"""Decompose the training step's device time on the real TPU and sweep the
scan unroll factor.

Training measured ~41% MFU vs ~80% for inference (docs/performance.md);
this tool separates forward / forward+backward / full-update costs and
sweeps aocr.ops.lstm.SCAN_UNROLL to locate where the non-roofline time
goes.  bench.py methodology: REP repetitions serialized inside one jit,
dispatch floor subtracted.

Usage: python tools/profile_train.py [batch] [target_len]
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
    from aocr.ops import lstm
    from tools.device_timing import dispatch_floor_ms, measure

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 11

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
    print(f"B={B} T={tg.shape[1]}", flush=True)

    floor = dispatch_floor_ms()
    print(f"floor {floor:.1f} ms", flush=True)

    from bench import flops_per_sample
    fwd_gf = flops_per_sample(cfg, decode_steps=int(tg.shape[1])) / 1e9

    for unroll in (1, 2, 4):
        lstm.SCAN_UNROLL = unroll

        def fwd_only(x):
            nll, _, _ = model.forward_loss(
                ms.params, ms.batch_stats, images, tg, te, cfg, train=True,
                dropout_rng=None)
            return x + nll * 1e-12

        def fwd_bwd(x):
            def loss(p):
                nll, _, _ = model.forward_loss(
                    p, ms.batch_stats, images, tg, te, cfg, train=True,
                    dropout_rng=None)
                return nll / B
            g = jax.grad(loss)(ms.params)
            return x + g["projector"]["b"][0] * 1e-12

        step = train_step.make_train_step(cfg)
        opt0 = optim.sgd_init(ms.params)

        def full(carry):
            params, stats, opt = carry
            out = step(params, stats, opt, images, tg, te,
                       jnp.float32(0.1), jax.random.PRNGKey(0))
            return (out.params, out.batch_stats, out.opt_state)

        t_f = measure(jax.jit(fwd_only), jnp.float32(0), rep=8,
                      floor_ms=floor)
        t_fb = measure(jax.jit(fwd_bwd), jnp.float32(0), rep=8,
                       floor_ms=floor)
        t_full = measure(full, (ms.params, ms.batch_stats, opt0), rep=8,
                         floor_ms=floor)
        mfu = B / t_full * 1000 * 3 * fwd_gf / 197e3
        print(f"unroll={unroll}: fwd {t_f:.2f} ms | fwd+bwd {t_fb:.2f} ms | "
              f"full step {t_full:.2f} ms ({B / t_full * 1000:.0f} img/s, "
              f"~{mfu * 100:.0f}% MFU)", flush=True)


if __name__ == "__main__":
    main()
