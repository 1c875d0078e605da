"""Benchmark: greedy-decode throughput on the flagship model (north-star
metric from BASELINE.json: word-images/sec/chip greedy decode, target 10k
on TPU v5e).

Measures the full inference path — CNN + bi-LSTM encoder + 50-step
input-feeding attention greedy decode (the reference always decodes
max_decoder_l=50 steps at eval, src/model/model.lua:266-274) — on
32x100 crops, bf16 compute, steady-state over several iterations.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_IPS = 10_000.0  # north-star target (BASELINE.json)


def main():
    import jax
    import jax.numpy as jnp

    from aocr import decode
    from aocr.config import Config
    from aocr.models import model

    cfg = Config(input_feed=True, compute_dtype="bfloat16").validate()
    ms = model.init(jax.random.PRNGKey(cfg.seed), cfg)
    rng = np.random.RandomState(0)

    best_ips = 0.0
    best_meta = {}
    for B in (int(os.environ.get("AOCR_BENCH_BATCH", 0)),) if os.environ.get(
        "AOCR_BENCH_BATCH"
    ) else (512, 1024, 2048):
        images = jnp.asarray(
            rng.uniform(0, 255, (B, 32, 100, 1)).astype(np.float32)
        )

        def run():
            labels, scores = decode.beam_decode(
                ms.params, ms.batch_stats, images, cfg,
                beam_size=1, max_len=cfg.max_decoder_l,
            )
            # Fetch to host: on this stack block_until_ready over the axon
            # tunnel does NOT wait for device execution — only a real data
            # fetch does.  The transfer itself is ~100 KB, negligible.
            return np.asarray(labels)

        run()  # compile + warm
        run()
        iters, t0 = 0, time.perf_counter()
        while iters < 5 or time.perf_counter() - t0 < 5.0:
            out = run()
            iters += 1
        dt = time.perf_counter() - t0
        ips = B * iters / dt
        print(f"# batch {B}: {ips:.0f} img/s ({iters} iters, {dt:.2f}s)",
              file=sys.stderr)
        if ips > best_ips:
            best_ips = ips
            best_meta = {"batch": B, "iters": iters}

    print(json.dumps({
        "metric": "greedy_decode_throughput",
        "value": round(best_ips, 1),
        "unit": "word-images/sec/chip",
        "vs_baseline": round(best_ips / BASELINE_IPS, 3),
    }))


if __name__ == "__main__":
    main()
