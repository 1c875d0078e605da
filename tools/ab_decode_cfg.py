#!/usr/bin/env python3
"""A/B greedy decode across Config variants on the real TPU.

Complements tools/ab_pallas.py (which A/Bs the Pallas-vs-XLA decode
*paths* under one config) by A/B-ing *config flags* that change the
encode stage shared by every decode path — e.g. -fused_encoder_proj,
whose fused (L*B, D) @ (D, 8H) layer-0 projection affects inference as
much as training.  Protocol matches ab_train.py: variants alternate in
one process with jax.clear_caches() between flips, min-of-rounds,
dispatch+fetch floor subtracted (the only trustworthy protocol on the
shared dev chip, docs/performance.md).

Usage: python tools/ab_decode_cfg.py [batch] [variant ...]
  variants: base fusedproj  (default: base fusedproj)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REP = 10
ITERS = 5

VARIANTS = {
    "base": {},
    "fusedproj": {"fused_encoder_proj": True},
    "noinputfeed": {"input_feed": False},
}


def main():
    import jax
    import jax.numpy as jnp

    from aocr import decode
    from aocr.config import Config
    from tools.device_timing import dispatch_floor_ms

    B = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 512
    names = [a for a in sys.argv[1:] if not a.isdigit()] \
        or ["base", "fusedproj"]
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (B, 32, 100, 1)).astype(np.float32))
    floor = dispatch_floor_ms()
    print(f"B={B} floor {floor:.1f} ms", flush=True)

    def make(name):
        # variant overrides must win over the flagship defaults (a plain
        # **VARIANTS[name] after input_feed=True raised TypeError for the
        # 'noinputfeed' variant: duplicate keyword)
        kw = {"input_feed": True, "compute_dtype": "bfloat16",
              "batch_size": B, **VARIANTS[name]}
        cfg = Config(**kw).validate()
        from aocr.models import model
        ms = model.init(jax.random.PRNGKey(cfg.seed), cfg)

        @jax.jit
        def rep(images):
            def body(carry, _):
                im = carry
                labels, scores = decode.greedy_decode(
                    ms.params, ms.batch_stats, im, cfg,
                    cfg.max_decoder_l)
                return im + scores.sum() * 1e-9, labels.sum()

            _, sums = jax.lax.scan(body, images, None, length=REP)
            return sums.sum()

        return rep

    best = {n: float("inf") for n in names}
    for round_i in range(3):
        for n in names:
            jax.clear_caches()
            rep = make(n)
            np.asarray(rep(images))  # compile+warm
            t = float("inf")
            for _ in range(ITERS):
                t0 = time.perf_counter()
                np.asarray(rep(images))
                dt = (time.perf_counter() - t0) * 1000
                # the floor estimate can exceed a fast run; clamp so the
                # img/s prints below never divide by <= 0
                t = min(t, max((dt - floor) / REP, 1e-3))
            best[n] = min(best[n], t)
            print(f"round {round_i} {n}: {t:.2f} ms "
                  f"({B / t * 1000:.0f} img/s)", flush=True)
    print("BEST: " + " | ".join(
        f"{n} {best[n]:.2f} ms ({B / best[n] * 1000:.0f} img/s)"
        for n in names), flush=True)


if __name__ == "__main__":
    main()
