#!/usr/bin/env python3
"""Measure the variable-width (-keep_aspect_ratio) path on the real TPU.

The reference buckets variable-width images by exact width and runs one
model instance per width (src/data/data_gen.lua:74-79,92-121); here each
ladder width is one compiled program (data.width_ladder bounds the count).
This tool reports, per ladder step:

  - greedy decode device time (bench.py protocol: REP decodes inside one
    jit, floor subtracted) + img/s at B=512, full 50 steps
  - which decode path the VMEM gate routes to at that context length
    (whole-loop kernel vs per-step fused tail)

then one width-bucketed TRAIN step number (B=400 at a non-default width),
and a mixed-width end-to-end recognize() wall-clock (host bucketing + one
device batch per width — includes ~30 ms tunnel RPC per group, which
production co-located hosts don't pay).

Usage: python tools/bench_widths.py [batch] [--skip-mixed]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REP = 10
ITERS = 4


def main():
    import jax
    import jax.numpy as jnp

    from aocr import data, decode
    from aocr.config import Config
    from aocr.models import model
    from aocr.ops.pallas import greedy_loop as _pgl
    from tools.device_timing import dispatch_floor_ms

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 512
    skip_mixed = "--skip-mixed" in sys.argv

    cfg = Config(input_feed=True, compute_dtype="bfloat16",
                 keep_aspect_ratio=True, batch_size=B).validate()
    ladder = data.width_ladder(cfg)
    ms = model.init(jax.random.PRNGKey(cfg.seed), cfg)
    rng = np.random.RandomState(0)
    floor = dispatch_floor_ms()
    print(f"B={B} ladder {ladder} floor {floor:.1f} ms", flush=True)

    T = 50
    vp = ((cfg.target_vocab_size + _pgl.LANE - 1) // _pgl.LANE) * _pgl.LANE
    H = cfg.decoder_num_hidden
    rows = []
    for w in ladder:
        L = w // 4 - 1
        est = _pgl.vmem_bytes(L, H, T, cfg.decoder_num_layers,
                              cfg.input_feed, vp, vp, 2, 0)
        route = ("loop" if est <= _pgl.VMEM_BUDGET - 16 * 1024 * 1024
                 else "tail")
        images = jnp.asarray(
            rng.uniform(0, 255, (B, 32, w, 1)).astype(np.float32))

        @jax.jit
        def rep(images):
            def body(carry, _):
                im = carry
                labels, scores = decode.greedy_decode(
                    ms.params, ms.batch_stats, im, cfg, T)
                return im + scores.sum() * 1e-9, labels.sum()
            _, sums = jax.lax.scan(body, images, None, length=REP)
            return sums.sum()

        print(f"  compiling w={w} (L={L}, route {route}) ...", flush=True)
        np.asarray(rep(images))
        best = float("inf")
        for _ in range(ITERS):
            t0 = time.perf_counter()
            np.asarray(rep(images))
            best = min(best, (time.perf_counter() - t0) * 1000 - floor)
        t = best / REP
        rows.append((w, L, route, t, B / t * 1000))
        print(f"w={w:4d} L={L:3d} {route:4s}: {t:6.2f} ms/batch "
              f"({B / t * 1000:7.0f} img/s)", flush=True)

    print("LADDER: " + " | ".join(
        f"w{w}:{t:.2f}ms/{ips:.0f}ips[{r}]" for w, _, r, t, ips in rows),
        flush=True)
    print(f"compiled decode programs: {len(ladder)}", flush=True)

    # one width-bucketed TRAIN number (the ladder step nearest the
    # reference train width 100 above it: 121)
    from aocr import optim, train_step, vocab

    Btr, wtr, Ttr = 400, 121, 11
    tcfg = cfg.replace(batch_size=Btr, prealloc=False)
    step = train_step.make_train_step(tcfg)
    opt0 = optim.sgd_init(ms.params)
    timg = jnp.asarray(
        rng.uniform(0, 255, (Btr, 32, wtr, 1)).astype(np.float32))
    words = ["".join(rng.choice(list("abcdefghij"), size=Ttr - 1))
             for _ in range(Btr)]
    tg, te, _ = vocab.encode_batch(words)
    tg, te = jnp.asarray(tg), jnp.asarray(te)

    @jax.jit
    def rep_train(params, stats, opt):
        def body(carry, _):
            p, s, o = carry
            out = step(p, s, o, timg, tg, te, jnp.float32(0.1),
                       jax.random.PRNGKey(0))
            return (out.params, out.batch_stats, out.opt_state), out.loss_sum
        _, losses = jax.lax.scan(body, (params, stats, opt), None,
                                 length=REP)
        return losses.sum()

    print(f"  compiling train w={wtr} ...", flush=True)
    np.asarray(rep_train(ms.params, ms.batch_stats, opt0))
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        np.asarray(rep_train(ms.params, ms.batch_stats, opt0))
        best = min(best, (time.perf_counter() - t0) * 1000 - floor)
    t = best / REP
    print(f"TRAIN w={wtr} B={Btr} T={Ttr}: {t:.2f} ms/step "
          f"({Btr / t * 1000:.0f} img/s)", flush=True)

    if skip_mixed:
        return

    # mixed-width end-to-end: per-image arrays at mixed ladder widths
    # through AttentionOCR.recognize (host bucketing, one device batch per
    # width group, results re-ordered) — wall-clock, includes tunnel RPCs
    from aocr.api import AttentionOCR

    ocr = AttentionOCR.create(cfg)
    ocr.params, ocr.batch_stats = ms.params, ms.batch_stats
    n_mixed = 2048
    widths = rng.choice(ladder, size=n_mixed)
    arrs = [rng.uniform(0, 255, (32, int(w), 1)).astype(np.float32)
            for w in widths]
    wordsm, _ = ocr.recognize(arrs[:64], beam_size=1, max_len=T)  # warm
    for _ in range(2):
        t0 = time.perf_counter()
        wordsm, _ = ocr.recognize(arrs, beam_size=1, max_len=T)
        dt = time.perf_counter() - t0
    groups = len(set(int(w) for w in widths))
    print(f"MIXED: {n_mixed} images across {groups} width groups: "
          f"{dt * 1000:.0f} ms wall ({n_mixed / dt:.0f} img/s incl. "
          f"{groups} tunnel RPCs)", flush=True)


if __name__ == "__main__":
    main()
