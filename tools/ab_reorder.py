#!/usr/bin/env python3
"""Isolation microbench of the whole-beam-loop kernel's parent reorder —
the dominant term of the ~8 ms/batch VPU residual in the beam-5 roofline
accounting (docs/performance.md), and the term a sublane-packed beam
state (VERDICT r4 #5's other arm) would have to beat.

Runs a standalone Pallas kernel at the REAL beam-loop geometry (bt=128
tiles, K=5, H=1024, five (bt, K*H) f32 state arrays — c/h x 2 layers +
input-feed attn — 49 in-kernel steps, grid B/bt), with the reorder
formulation swapped per variant:

  none     step body without the gather (baseline; temp->state copy kept)
  selects  the shipped formulation: per new beam, K-1 where-selects over
           (bt, H) slices (gather-on-write)
  fma      one-hot multiply-accumulate (same pass count as selects;
           measures select-vs-fma VPU throughput, not pass count)

reorder cost/batch = t(variant) - t(none).  Formulations that change the
pass count were analyzed out rather than built: lane-rolls need K rolls +
K mask-builds + K applies over the full (bt, K*H) width (~2.6x the
element passes of `selects`); gather-on-read (carrying parent indices and
gathering at the next step's consumption) needs the same K-1 selects per
consumer; an MXU mapping does not exist because the permutation is
row-dependent (a block-diagonal (B*K, B*K) one-hot costs ~67 GF/step,
~0.34 ms at peak, 4x the whole VPU term it would replace).

Usage: python tools/ab_reorder.py [batch] [rounds]
Reference beam bookkeeping this isolates: src/model/model.lua:437-467.
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 5
H = 1024
S = 49          # in-kernel steps (t = 1..49 of the 50-step decode)
BT = 128        # the tile pick_bt() chooses at B=512 (beam_loop.py)
N_STATE = 5     # c/h x 2 layers + attn


def _make_kernel(variant, bt):
    import jax
    import jax.numpy as jnp
    from jax import lax

    KH = K * H

    def kernel(seed_ref, out_ref, *scr):
        state = scr[:N_STATE]       # persistent beam state
        temp = scr[N_STATE:]        # per-step LSTM outputs (tc/th/htld)
        for i, r in enumerate(state):
            r[:] = seed_ref[:] * jnp.float32(1.0 + 0.1 * i)

        def body(t, carry):
            # cheap data-dependent parents: a scalar read off the live
            # state keeps the loop un-collapsible, the (row+col+t) mix
            # exercises the same per-row select paths as real parents
            base = jnp.floor(jnp.abs(state[0][0, 0]) * 7.0).astype(
                jnp.int32)
            col_k = lax.broadcasted_iota(jnp.int32, (bt, K), 1)
            row = lax.broadcasted_iota(jnp.int32, (bt, K), 0)
            parents = (col_k + row + base + t) % K

            # stand-in for the LSTM/attention writes: temp <- f(state)
            for st, tp in zip(state, temp):
                tp[:] = st[:] * jnp.float32(0.999) + jnp.float32(1e-3)

            if variant == "none":
                for st, tp in zip(state, temp):
                    st[:] = tp[:]
            elif variant == "selects":
                for st, tp in zip(state, temp):
                    outs = []
                    for kk in range(K):
                        p = parents[:, kk:kk + 1]
                        acc = tp[:, 0:H]
                        for jj in range(1, K):
                            acc = jnp.where(p == jj,
                                            tp[:, jj * H:(jj + 1) * H], acc)
                        outs.append(acc)
                    for kk, v in enumerate(outs):
                        st[:, kk * H:(kk + 1) * H] = v
            elif variant == "fma":
                for st, tp in zip(state, temp):
                    outs = []
                    for kk in range(K):
                        p = parents[:, kk:kk + 1]
                        acc = jnp.zeros((bt, H), jnp.float32)
                        for jj in range(K):
                            m = (p == jj).astype(jnp.float32)
                            acc = acc + m * tp[:, jj * H:(jj + 1) * H]
                        outs.append(acc)
                    for kk, v in enumerate(outs):
                        st[:, kk * H:(kk + 1) * H] = v
            else:
                raise ValueError(variant)
            return carry

        lax.fori_loop(0, S, body, jnp.int32(0))
        acc = state[0][:]
        for r in state[1:]:
            acc = acc + r[:]
        out_ref[:] = acc

    return kernel


@functools.lru_cache(maxsize=None)
def build(variant, B, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bt = min(BT, B)
    assert B % bt == 0
    KH = K * H
    row = pl.BlockSpec((bt, KH), lambda i: (i, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(seed):
        return pl.pallas_call(
            _make_kernel(variant, bt),
            grid=(B // bt,),
            in_specs=[row],
            out_specs=row,
            out_shape=jax.ShapeDtypeStruct((B, KH), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bt, KH), jnp.float32)
                            for _ in range(2 * N_STATE)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(seed)

    return run


def main():
    import jax.numpy as jnp

    from tools.device_timing import dispatch_floor_ms, measure

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    rng = np.random.RandomState(0)
    seed = jnp.asarray(rng.uniform(0.1, 0.9, (B, K * H)).astype(np.float32))
    floor = dispatch_floor_ms(stat="min")
    print(f"B={B} bt={min(BT, B)} K={K} H={H} S={S} floor {floor:.1f} ms",
          flush=True)

    results = {v: [] for v in ("none", "selects", "fma")}
    for r in range(rounds):
        for v in results:
            ms = measure(build(v, B), seed, rep=20, outer=3,
                         floor_ms=floor, stat="min")
            results[v].append(ms)
            print(f"round {r} {v:8s} {ms:7.3f} ms", flush=True)
    best = {v: min(ts) for v, ts in results.items()}
    print(f"\nbest-of-{rounds}: " + "  ".join(
        f"{v}={best[v]:.3f}" for v in results), flush=True)
    for v in ("selects", "fma"):
        print(f"reorder cost ({v}): {best[v] - best['none']:.3f} ms/batch "
              f"({S} steps, {N_STATE} state arrays)", flush=True)


if __name__ == "__main__":
    main()
