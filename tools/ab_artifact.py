#!/usr/bin/env python3
"""A/B `.aocrx` artifact replay vs the live model on the real TPU.

Three measurements of the same beam-5 full-50-step decode at a pinned
batch (the deployment shape), bench.py protocol (REP decodes serialized
inside one jit, dispatch+fetch floor subtracted, min over iters):

  live      — AttentionOCR weights + decode.beam_decode, fused Pallas
              kernels (what bench.py's beam5 line measures)
  aocrx     — artifact exported with -use_pallas (Mosaic custom calls
              frozen into the StableHLO; TPU-only artifact)
  portable  — artifact exported on the default portable path (pure
              StableHLO, runs anywhere; the compatibility trade)

Replay uses jax.export's Exported.call inside the same REP jit, so the
comparison isolates the *program*, not host-side dispatch.  Transcript
equality live-vs-artifact is asserted before timing (the export
contract, tests/test_export.py).

Usage: python tools/ab_artifact.py [batch]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REP = 10
ITERS = 5
K = 5
T = 50


def main():
    import jax
    import jax.numpy as jnp

    from aocr import decode, export
    from aocr.api import AttentionOCR
    from aocr.config import Config
    from tools.device_timing import dispatch_floor_ms

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cfg = Config(input_feed=True, compute_dtype="bfloat16",
                 batch_size=B).validate()
    ocr = AttentionOCR.create(cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (B, 32, 100, 1)).astype(np.float32))

    workdir = tempfile.mkdtemp(prefix="ab_artifact_")
    paths = {}
    for name, use_pallas in (("aocrx", True), ("portable", False)):
        p = os.path.join(workdir, f"{name}.aocrx")
        t0 = time.perf_counter()
        export.export_recognizer(
            ocr, p, beam_size=K, max_len=T, batch=B,
            platforms=("tpu",), use_pallas=use_pallas)
        print(f"exported {name}: {os.path.getsize(p) / 1e6:.1f} MB "
              f"in {time.perf_counter() - t0:.1f}s", flush=True)
        paths[name] = p

    recs = {n: export.ExportedRecognizer.load(p) for n, p in paths.items()}

    # transcript equality before timing
    live_lab, _ = decode.beam_decode(ocr.params, ocr.batch_stats,
                                     images, cfg, K, T)
    live_lab = np.asarray(live_lab)
    im_np = np.asarray(images)
    for n, rec in recs.items():
        lab, _ = rec._call(100, im_np)
        agree = float((np.asarray(lab) == live_lab).mean())
        print(f"{n} vs live token agreement: {agree * 100:.2f}%", flush=True)

    floor = dispatch_floor_ms()
    print(f"B={B} K={K} T={T} floor {floor:.1f} ms", flush=True)

    def timed(make_fn, tag):
        @jax.jit
        def rep(images):
            def body(carry, _):
                im = carry
                labels, scores = make_fn(im)
                return im + scores.sum() * 1e-9, labels.sum()
            _, sums = jax.lax.scan(body, images, None, length=REP)
            return sums.sum()

        print(f"  compiling {tag} ...", flush=True)
        np.asarray(rep(images))
        best = float("inf")
        for _ in range(ITERS):
            t0 = time.perf_counter()
            np.asarray(rep(images))
            best = min(best, (time.perf_counter() - t0) * 1000 - floor)
        t = best / REP
        print(f"{tag}: {t:.2f} ms/batch ({B / t * 1000:.0f} img/s)",
              flush=True)
        return t

    results = {"live": timed(
        lambda im: decode.beam_decode(ocr.params, ocr.batch_stats,
                                      im, cfg, K, T), "live")}
    for n, rec in recs.items():
        prog = rec._programs[100]
        args = [rec._params, rec._batch_stats]
        results[n] = timed(lambda im, prog=prog, args=args:
                           prog.call(*args, im), n)

    live = results["live"]
    print("SUMMARY: " + " | ".join(
        f"{n} {t:.2f} ms ({B / t * 1000:.0f} img/s, {live / t * 100:.0f}% "
        "of live)" for n, t in results.items()), flush=True)


if __name__ == "__main__":
    main()
