#!/usr/bin/env python3
"""A/B explicit operand padding for the Pallas backward-recurrence kernels
vs Mosaic's own ragged-edge handling, on the real TPU.

Variant "pad" monkeypatches decoder_bwd_scan/lstm_bwd_scan with wrappers
that jnp.pad every (T, B, .) operand to a tile multiple and slice the
outputs back (the pre-r3 behavior); variant "ragged" is the shipped code.
Alternating min-of-N with jax.clear_caches() between flips.

Usage: python tools/ab_pad.py [batch] [rounds]
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
    from aocr.ops.pallas import lstm_bwd, tf_bwd, tiling
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

    ragged_dec = tf_bwd.decoder_bwd_scan
    ragged_lstm = lstm_bwd.lstm_bwd_scan

    def padded_dec(ctx_lbh, wfh0_t, rest_t, wc_t, wa_t, dys, htl, alpha,
                   ifog, cs, cprev, input_feed, interpret=False):
        num_layers = len(ifog)
        T_, B0, H = htl.shape
        L = ctx_lbh.shape[0]
        cd = ctx_lbh.dtype
        bt, _ = tiling.pick_bt(
            B0, lambda b: tf_bwd.vmem_bytes(
                L, H, T_, num_layers, input_feed, jnp.dtype(cd).itemsize, b),
            tf_bwd.B_TILE)
        pad = (-B0) % bt
        if pad:
            p3 = lambda a: jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
            ctx_lbh, dys, htl, alpha = map(p3, (ctx_lbh, dys, htl, alpha))
            ifog = tuple(map(p3, ifog))
            cs = tuple(map(p3, cs))
            cprev = tuple(map(p3, cprev))
        outs = ragged_dec(ctx_lbh, wfh0_t, rest_t, wc_t, wa_t, dys, htl,
                          alpha, ifog, cs, cprev, input_feed, interpret)
        if not pad:
            return outs
        dg0, dgl, dht, dq, dcvec, dscore, dc0f, dh0f = outs
        cut = lambda a: a[:, :B0]
        return (cut(dg0), tuple(map(cut, dgl)), cut(dht), cut(dq),
                cut(dcvec), cut(dscore), dc0f[:B0], dh0f[:B0])

    def padded_lstm(wh_t, dhs, ifog, cs, cprev, dc_f, dh_f, reverse,
                    stack_dtype=None, interpret=False):
        L, B0, H = dhs.shape
        cd = wh_t.dtype
        bt, _ = tiling.pick_bt(
            B0, lambda b: lstm_bwd.vmem_bytes(H, jnp.dtype(cd).itemsize, b),
            lstm_bwd.B_TILE)
        pad = (-B0) % bt
        if pad:
            p3 = lambda a: jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
            dhs, ifog, cs, cprev = map(p3, (dhs, ifog, cs, cprev))
            p2 = lambda a: jnp.pad(a, ((0, pad), (0, 0)))
            dc_f, dh_f = map(p2, (dc_f, dh_f))
        dg, dh0, dc0 = ragged_lstm(wh_t, dhs, ifog, cs, cprev, dc_f, dh_f,
                                   reverse, stack_dtype, interpret)
        return dg[:, :B0], dh0[:B0], dc0[:B0]

    def run_variant(name):
        if name == "pad":
            tf_bwd.decoder_bwd_scan = padded_dec
            lstm_bwd.lstm_bwd_scan = padded_lstm
        else:
            tf_bwd.decoder_bwd_scan = ragged_dec
            lstm_bwd.lstm_bwd_scan = ragged_lstm
        jax.clear_caches()
        step = train_step.make_train_step(cfg)

        def body(carry):
            p, s, o = carry
            out = step(p, s, o, images, tg, te, jnp.float32(0.1),
                       jax.random.PRNGKey(0))
            return (out.params, out.batch_stats, out.opt_state)

        t = measure(body, (ms.params, ms.batch_stats, opt0), floor_ms=floor)
        tf_bwd.decoder_bwd_scan = ragged_dec
        lstm_bwd.lstm_bwd_scan = ragged_lstm
        return t

    best = {"ragged": float("inf"), "pad": float("inf")}
    for r in range(rounds):
        for name in ("ragged", "pad"):
            t = run_variant(name)
            best[name] = min(best[name], t)
            print(f"round {r} {name:7s} {t:7.2f} ms/step", flush=True)
    print(f"best: ragged {best['ragged']:.2f}  pad {best['pad']:.2f}  "
          f"({best['pad'] / best['ragged']:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
