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

    floor = dispatch_floor_ms(stat="min")
    print(f"floor {floor:.1f} ms", flush=True)

    from bench import flops_per_sample
    fwd_gf = flops_per_sample(cfg, decode_steps=int(tg.shape[1])) / 1e9

    from aocr import loss as loss_lib
    from aocr.models import decoder as dec_lib, head

    def gsum(g):
        # consume EVERY grad leaf — using only one leaf lets XLA dead-code-
        # eliminate most of the backward pass (measured: 5.8 vs ~16 ms)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(g))

    def make_probes():
        # Every probe maps images -> images + tiny(result): the next
        # repetition's input depends on this one's output, so XLA's
        # while-loop invariant code motion cannot hoist the work out of
        # the measurement scan (scalar-only carries got hoisted for
        # single-conv probes; see tools/profile_conv.py).
        def fwd_only(im):
            nll, _, _ = model.forward_loss(
                ms.params, ms.batch_stats, im, tg, te, cfg, train=True,
                dropout_rng=None)
            return im + nll * 1e-20

        def fwd_bwd(im):
            def loss(p):
                nll, _, _ = model.forward_loss(
                    p, ms.batch_stats, im, tg, te, cfg, train=True,
                    dropout_rng=None)
                return nll / B
            return im + gsum(jax.grad(loss)(ms.params)) * 1e-20

        def fwd_bwd_decoder_only(im):
            # stop_gradient after encode: decoder/projector bwd only
            def loss(p):
                ctx, dec_init, _ = model.encode(
                    p, ms.batch_stats, im, cfg, train=True)
                ctx = jax.lax.stop_gradient(ctx)
                dec_init = jax.lax.stop_gradient(dec_init)
                cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
                    else jnp.float32
                h = dec_lib.teacher_forced(
                    p["decoder"], dec_init, tg, ctx,
                    input_feed=cfg.input_feed, compute_dtype=cd)
                lp = head.apply(p["projector"], h, compute_dtype=cd)
                return loss_lib.nll_sum(lp, te) / B
            return im + gsum(jax.grad(loss)(ms.params)) * 1e-20

        def fwd_bwd_encoder_only(im):
            # loss on the encoder output: CNN+encoder fwd+bwd only
            def loss(p):
                ctx, dec_init, _ = model.encode(
                    p, ms.batch_stats, im, cfg, train=True)
                return jnp.sum(ctx.astype(jnp.float32)) / B
            return im + gsum(jax.grad(loss)(ms.params)) * 1e-20

        return fwd_only, fwd_bwd, fwd_bwd_decoder_only, fwd_bwd_encoder_only

    opt0 = optim.sgd_init(ms.params)

    def make_full():
        # rebuilt (and caches cleared) per unroll flip: a step object
        # built once would serve its first-unroll jaxpr from the pjit
        # cache for every later flip — a silent A/A
        step = train_step.make_train_step(cfg)

        def full(carry):
            params, stats, opt = carry
            out = step(params, stats, opt, images, tg, te,
                       jnp.float32(0.1), jax.random.PRNGKey(0))
            return (out.params, out.batch_stats, out.opt_state)

        return full

    for unroll in (1,) if os.environ.get("AOCR_PROF_NO_SWEEP") else (1, 2, 4):
        lstm.SCAN_UNROLL = unroll
        jax.clear_caches()
        full = make_full()
        f, fb, fbd, fbe = make_probes()
        t_f = measure(jax.jit(f), images, rep=8, outer=5, floor_ms=floor,
                      stat="min")
        t_fb = measure(jax.jit(fb), images, rep=8, outer=5, floor_ms=floor,
                       stat="min")
        t_fbd = measure(jax.jit(fbd), images, rep=8, outer=5,
                        floor_ms=floor, stat="min")
        t_fbe = measure(jax.jit(fbe), images, rep=8, outer=5,
                        floor_ms=floor, stat="min")
        t_full = measure(full, (ms.params, ms.batch_stats, opt0), rep=8,
                         outer=5, floor_ms=floor, stat="min")
        mfu = B / t_full * 1000 * 3 * fwd_gf / 197e3
        print(f"unroll={unroll}: fwd {t_f:.2f} | fwd+bwd {t_fb:.2f} "
              f"(dec-only {t_fbd:.2f}, cnn+enc-only {t_fbe:.2f}) | "
              f"full {t_full:.2f} ms ({B / t_full * 1000:.0f} img/s, "
              f"~{mfu * 100:.0f}% MFU)", flush=True)


if __name__ == "__main__":
    main()
