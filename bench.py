"""Benchmark: greedy-decode throughput on the flagship model (north-star
metric from BASELINE.json: word-images/sec/chip greedy decode, target 10k
on TPU v5e).

Measures the full inference path — CNN + bi-LSTM encoder + 50-step
input-feeding attention greedy decode (the reference always decodes
max_decoder_l=50 steps at eval, src/model/model.lua:266-274) — on
32x100 crops, bf16 compute.

Methodology: the decode is repeated REP times *inside one jitted program*
(serialized by a data dependency), and the host-side dispatch+fetch floor
(measured with a trivial program) is subtracted.  This isolates true
device-side throughput: on this development tunnel a single RPC round-trip
costs ~30 ms, which would dwarf the ~20 ms of real chip time per batch and
does not exist on a production co-located host.  block_until_ready() does
not wait for execution on this stack, so every measurement fetches real
data.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_IPS = 10_000.0  # north-star target (BASELINE.json)
REP = 10


def main():
    import jax
    import jax.numpy as jnp

    from aocr import decode
    from aocr.config import Config
    from aocr.models import model

    cfg = Config(input_feed=True, compute_dtype="bfloat16").validate()
    ms = model.init(jax.random.PRNGKey(cfg.seed), cfg)
    rng = np.random.RandomState(0)

    @jax.jit
    def trivial(x):
        return x + 1.0

    np.asarray(trivial(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(trivial(jnp.float32(0)))
    floor_ms = (time.perf_counter() - t0) / 10 * 1000
    print(f"# dispatch+fetch floor: {floor_ms:.1f} ms", file=sys.stderr)

    batches = (
        (int(os.environ["AOCR_BENCH_BATCH"]),)
        if os.environ.get("AOCR_BENCH_BATCH")
        else (512, 1024)
    )
    best_ips = 0.0
    for B in batches:
        images = jnp.asarray(
            rng.uniform(0, 255, (B, 32, 100, 1)).astype(np.float32)
        )

        @jax.jit
        def rep_decode(images):
            def body(carry, _):
                im = carry
                labels, scores = decode.greedy_decode(
                    ms.params, ms.batch_stats, im, cfg, cfg.max_decoder_l
                )
                # trivial data dependency serializes the repetitions
                return im + scores.sum() * 1e-9, labels.sum()

            _, sums = jax.lax.scan(body, images, None, length=REP)
            return sums.sum()

        np.asarray(rep_decode(images))  # compile + warm
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            np.asarray(rep_decode(images))
        dt_ms = (time.perf_counter() - t0) / iters * 1000
        per_batch_ms = (dt_ms - floor_ms) / REP
        ips = B / per_batch_ms * 1000
        print(f"# batch {B}: {per_batch_ms:.2f} ms/batch -> {ips:.0f} img/s",
              file=sys.stderr)
        if ips > best_ips:
            best_ips = ips

    print(json.dumps({
        "metric": "greedy_decode_throughput",
        "value": round(best_ips, 1),
        "unit": "word-images/sec/chip",
        "vs_baseline": round(best_ips / BASELINE_IPS, 3),
    }))


if __name__ == "__main__":
    main()
