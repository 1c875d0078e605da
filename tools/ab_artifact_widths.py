#!/usr/bin/env python3
"""Replay a MULTI-WIDTH `.aocrx` artifact across the keep_aspect_ratio
ladder on the real TPU (VERDICT r4 #8 — ab_artifact.py covered one width).

Exports ONE artifact holding one frozen program per ladder width
(`export_recognizer(widths=...)`, the keep_aspect_ratio deployment shape),
then measures greedy decode at B per width, live vs artifact replay,
bench.py protocol (REP decodes serialized inside one jit, dispatch+fetch
floor subtracted, min over iters).  Per-width transcript agreement is
printed before timing.

Usage: python tools/ab_artifact_widths.py [batch] [widths...]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REP = 10
ITERS = 4
T = 50


def main():
    import jax
    import jax.numpy as jnp

    from aocr import data, decode, export
    from aocr.api import AttentionOCR
    from aocr.config import Config
    from tools.device_timing import dispatch_floor_ms

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cfg = Config(input_feed=True, compute_dtype="bfloat16",
                 batch_size=B, keep_aspect_ratio=True).validate()
    widths = ([int(w) for w in sys.argv[2:]]
              or list(data.width_ladder(cfg)))
    ocr = AttentionOCR.create(cfg)
    rng = np.random.RandomState(0)

    workdir = tempfile.mkdtemp(prefix="ab_artifact_w_")
    path = os.path.join(workdir, "ladder.aocrx")
    t0 = time.perf_counter()
    export.export_recognizer(ocr, path, beam_size=1, max_len=T, batch=B,
                             platforms=("tpu",), use_pallas=True,
                             widths=widths)
    print(f"exported {len(widths)}-width artifact: "
          f"{os.path.getsize(path) / 1e6:.1f} MB in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    rec = export.ExportedRecognizer.load(path)

    floor = dispatch_floor_ms()
    print(f"B={B} T={T} floor {floor:.1f} ms", flush=True)

    def timed(make_fn, images, tag):
        @jax.jit
        def rep(images):
            def body(carry, _):
                im = carry
                labels, scores = make_fn(im)
                return im + scores.sum() * 1e-9, labels.sum()
            _, sums = jax.lax.scan(body, images, None, length=REP)
            return sums.sum()

        np.asarray(rep(images))
        best = float("inf")
        for _ in range(ITERS):
            t0 = time.perf_counter()
            np.asarray(rep(images))
            best = min(best, (time.perf_counter() - t0) * 1000 - floor)
        t = best / REP
        print(f"  {tag}: {t:.2f} ms/batch ({B / t * 1000:.0f} img/s)",
              flush=True)
        return t

    rows = []
    for w in widths:
        images = jnp.asarray(
            rng.uniform(0, 255, (B, 32, w, 1)).astype(np.float32))
        live_lab, _ = jax.jit(
            lambda im: decode.greedy_decode(ocr.params, ocr.batch_stats,
                                            im, cfg, T))(images)
        lab, _ = rec._call(w, np.asarray(images))
        agree = float((np.asarray(lab) == np.asarray(live_lab)).mean())
        t_live = timed(
            lambda im: decode.greedy_decode(ocr.params, ocr.batch_stats,
                                            im, cfg, T),
            images, f"w={w} live")
        prog = rec._programs[w]
        t_art = timed(
            lambda im, prog=prog: prog.call(rec._params, rec._batch_stats,
                                            im),
            images, f"w={w} aocrx")
        rows.append((w, t_live, t_art, agree))
        print(f"w={w}: live {t_live:.2f} ms | aocrx {t_art:.2f} ms "
              f"({t_live / t_art * 100:.0f}% of live) | token agreement "
              f"{agree * 100:.2f}%", flush=True)

    print("\n| width px | live ms | .aocrx ms | aocrx vs live | "
          "img/s (aocrx) |", flush=True)
    print("|---|---|---|---|---|", flush=True)
    for w, tl, ta, _ in rows:
        print(f"| {w} | {tl:.2f} | {ta:.2f} | {tl / ta * 100:.0f}% | "
              f"{B / ta * 1000:,.0f} |", flush=True)


if __name__ == "__main__":
    main()
