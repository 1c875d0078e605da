#!/usr/bin/env python3
"""Per-conv-layer fwd / dgrad / wgrad timing on the real TPU, plus an A/B
of a shifted-matmul wgrad rewrite (the conv-backward attack from the r2
verdict: training sits at ~45% MFU bound by conv backward).

Each conv layer of the stack (aocr/models/cnn.py _CONV_DEFS) is measured
in isolation at its true training shape (B=400, W=100):
  fwd    : conv only
  dgrad  : grad wrt the input (cotangent of a sum)
  wgrad  : grad wrt the weights
  wgrad9 : the same wgrad computed as kh*kw shifted matmuls
           (sum over (kh', kw') of x_shift^T @ dy) — candidate rewrite

bench.py methodology: REP reps serialized in one jit, floor subtracted.
Usage: python tools/profile_conv.py [batch]
"""

import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from aocr.models.cnn import _CONV_DEFS, _POOL_AFTER
    from tools.device_timing import dispatch_floor_ms, measure

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    cd = jnp.bfloat16
    rng = np.random.RandomState(0)
    floor = dispatch_floor_ms()
    print(f"B={B} floor {floor:.1f} ms", flush=True)

    # input spatial dims per layer at W=100 (pools halve as configured)
    h, w = 32, 100
    shapes = []
    for idx, (name, in_c, out_c, kh, kw, pad, _bn) in enumerate(_CONV_DEFS):
        shapes.append((name, in_c, out_c, kh, kw, pad, h, w))
        if pad == "VALID":
            h, w = h - kh + 1, w - kw + 1
        if idx in _POOL_AFTER:
            ph, pw = _POOL_AFTER[idx]
            h, w = h // ph, w // pw

    def conv(x, wgt, pad):
        return lax.conv_general_dilated(
            x, wgt, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def wgrad9(x, dy, kh, kw, pad, in_c, out_c):
        """dW via kh*kw shifted matmuls: dW[a,b] = x_shift(a,b)^T @ dy."""
        H, W = x.shape[1], x.shape[2]
        if pad == "SAME":
            ph, pw = (kh - 1) // 2, (kw - 1) // 2
            xp = jnp.pad(x, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw),
                             (0, 0)))
            oh, ow = H, W
        else:
            xp, oh, ow = x, H - kh + 1, W - kw + 1
        dy2 = dy.reshape(-1, out_c)
        rows = []
        for a in range(kh):
            cols = []
            for b in range(kw):
                xs = lax.dynamic_slice(
                    xp, (0, a, b, 0), (x.shape[0], oh, ow, in_c))
                cols.append(
                    jax.lax.dot_general(
                        xs.reshape(-1, in_c), dy2,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
            rows.append(jnp.stack(cols))
        return jnp.stack(rows)  # (kh, kw, in_c, out_c)

    layer_filter = os.environ.get("AOCR_CONV_LAYERS")
    results = []
    for name, in_c, out_c, kh, kw, pad, ih, iw in shapes:
        if layer_filter and name not in layer_filter.split(","):
            continue
        x = jnp.asarray(rng.uniform(-1, 1, (B, ih, iw, in_c)), cd)
        wgt = jnp.asarray(rng.uniform(-0.05, 0.05, (kh, kw, in_c, out_c)), cd)
        oh = ih if pad == "SAME" else ih - kh + 1
        ow = iw if pad == "SAME" else iw - kw + 1
        dy = jnp.asarray(rng.uniform(-1, 1, (B, oh, ow, out_c)), cd)
        gf = 2.0 * kh * kw * in_c * out_c * oh * ow * B / 1e9

        # Every probe maps x -> x + tiny(g): the NEXT repetition's input
        # depends on this one's result, so XLA's loop-invariant code
        # motion cannot hoist the work out of the repeat scan (a
        # scalar-only carry measured ~0 ms: the gradient computation was
        # hoisted and ran once).
        def f_fwd(x, wgt=wgt, pad=pad):
            s = conv(x, wgt, pad).astype(jnp.float32).sum()
            return x + (s * 1e-20).astype(x.dtype)

        def f_dgrad(x, wgt=wgt, pad=pad, dy=dy):
            g = jax.grad(
                lambda xx: (conv(xx, wgt, pad) * dy).astype(jnp.float32).sum()
            )(x)
            return x + (g.astype(jnp.float32).sum() * 1e-20).astype(x.dtype)

        def f_wgrad(x, wgt=wgt, pad=pad, dy=dy):
            g = jax.grad(
                lambda ww: (conv(x, ww, pad) * dy).astype(jnp.float32).sum()
            )(wgt)
            return x + (g.astype(jnp.float32).sum() * 1e-20).astype(x.dtype)

        def f_wgrad9(x, dy=dy, kh=kh, kw=kw, pad=pad, in_c=in_c,
                     out_c=out_c):
            g = wgrad9(x, dy, kh, kw, pad, in_c, out_c)
            return x + (g.sum() * 1e-20).astype(x.dtype)

        probes = os.environ.get("AOCR_CONV_PROBES",
                                "fwd,dgrad,wgrad,wgrad9").split(",")
        floor = dispatch_floor_ms(stat="min")  # re-measured per layer
        t_f = t_d = t_w = t_w9 = float("nan")
        if "fwd" in probes:
            t_f = measure(jax.jit(f_fwd), x, rep=30, outer=5,
                          floor_ms=floor, stat="min")
        if "dgrad" in probes:
            t_d = measure(jax.jit(f_dgrad), x, rep=30, outer=5,
                          floor_ms=floor, stat="min")
        if "wgrad9" in probes:
            t_w9 = measure(jax.jit(f_wgrad9), x, rep=30, outer=5,
                           floor_ms=floor, stat="min")
        if "wgrad" in probes:
            t_w = measure(jax.jit(f_wgrad), x, rep=30, outer=5,
                          floor_ms=floor, stat="min")
        results.append((name, gf, t_f, t_d, t_w, t_w9))
        print(f"{name}: {gf:6.1f} GF | fwd {t_f:6.2f} ms ({gf/t_f:6.1f} TF/s)"
              f" | dgrad {t_d:6.2f} ({gf/t_d:6.1f}) | wgrad {t_w:6.2f} "
              f"({gf/t_w:6.1f}) | wgrad9 {t_w9:6.2f} ({gf/t_w9:6.1f})",
              flush=True)

    tot = [sum(r[i] for r in results) for i in range(1, 6)]
    print(f"TOTAL: {tot[0]:6.1f} GF | fwd {tot[1]:6.2f} | dgrad {tot[2]:6.2f}"
          f" | wgrad {tot[3]:6.2f} | wgrad9 {tot[4]:6.2f}", flush=True)


if __name__ == "__main__":
    main()
