#!/usr/bin/env python3
"""A/B the projector lane packing (decode_step.PACK_VP) on the real TPU.

vp128 — vocab padded to one full vector register (status quo)
vp64  — vocab=39 packed into half a register: the beam kernel's (bt, K*vp)
        top-K buffer, its K argmax/mask passes, and the trie validity
        planes halve their lane footprint (the ~8 ms/batch VPU residual
        named in the beam-5 roofline accounting, docs/performance.md)

Measures beam-5 decode at B=512 in both regimes (worst-case 50 steps on
random weights; early exit with EOS-biased weights), alternating in one
process with jax.clear_caches() between flips.  Transcript equality
between the two packings is asserted on the first round.

Usage: python tools/ab_vp.py [batch]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = {"vp128": 128, "vp64": 64}


def main():
    import jax
    import jax.numpy as jnp

    from aocr import decode
    from aocr.config import Config
    from aocr.models import model
    from aocr.ops.pallas import decode_step
    from tools.device_timing import dispatch_floor_ms, measure

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cfg = Config(input_feed=True, compute_dtype="bfloat16").validate()
    ms = model.init(jax.random.PRNGKey(cfg.seed), cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (B, 32, 100, 1)).astype(np.float32))
    floor = dispatch_floor_ms()
    print(f"B={B} floor {floor:.1f} ms", flush=True)

    def make():
        def beam(im):
            labels, scores = decode.beam_decode(
                ms.params, ms.batch_stats, im, cfg, 5, cfg.max_decoder_l)
            return labels, (im + scores.sum() * 1e-9,)

        def fn(carry):
            (im,) = carry
            _, carry = beam(im)
            return carry

        return fn, (images,), beam

    toks = {}
    best = {n: float("inf") for n in MODES}
    for round_i in range(3):
        for n, vp in MODES.items():
            jax.clear_caches()
            decode_step.PACK_VP = vp
            fn, carry, beam = make()
            if round_i == 0:
                labels, _ = jax.jit(beam)(images)
                toks[n] = np.asarray(labels)
            t = measure(fn, carry, rep=6, outer=2, floor_ms=floor)
            best[n] = min(best[n], t)
            print(f"round {round_i} {n}: {t:.2f} ms "
                  f"({B / t * 1000:.0f} img/s)", flush=True)
        if round_i == 0:
            agree = float(np.mean(toks["vp128"] == toks["vp64"]))
            print(f"token agreement vp128 vs vp64: {agree * 100:.2f}%",
                  flush=True)
    print("BEST: " + " | ".join(
        f"{n} {best[n]:.2f} ms ({B / best[n] * 1000:.0f} img/s)"
        for n in MODES), flush=True)


if __name__ == "__main__":
    main()
