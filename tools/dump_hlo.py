#!/usr/bin/env python3
"""Dump the optimized HLO of the full training step (TPU backend).

Compiles the same program bench.py/AOCR_BENCH_MODE=train measures and
writes XLA's post-optimization HLO text to the given directory, so trace
fusion names (tools/xplane_top.py output) can be mapped back to producer
ops and layouts.

Usage: XLA_FLAGS=--xla_dump_to=/tmp/hlo python tools/dump_hlo.py [batch]
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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    T = 11
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

    step = train_step.make_train_step(cfg)
    opt0 = optim.sgd_init(ms.params)

    lowered = jax.jit(
        lambda p, s, o: step(p, s, o, images, tg, te, jnp.float32(0.1),
                             jax.random.PRNGKey(0))
    ).lower(ms.params, ms.batch_stats, opt0)
    compiled = lowered.compile()
    # Also write the HLO text directly (xla_dump_to may be skipped on a
    # persistent-cache hit; as_text() always reflects the compiled module).
    out_dir = os.environ.get("AOCR_HLO_OUT", "/tmp/hlo")
    os.makedirs(out_dir, exist_ok=True)
    for i, mod in enumerate(compiled.runtime_executable().hlo_modules()):
        path = os.path.join(out_dir, f"train_step_{i}.opt.txt")
        with open(path, "w") as f:
            f.write(mod.to_string())
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
