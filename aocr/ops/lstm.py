"""LSTM primitives, TPU-first.

Gate layout parity with the reference cell (`/root/reference/src/model/LSTM.lua:90-105`):
the fused 4H pre-activation splits contiguously into
[in_gate | forget_gate | out_gate | in_transform] (sigmoid, sigmoid, sigmoid,
tanh), then c' = f*c + i*g and h' = o*tanh(c').

TPU-native structure: the input projection (i2h) for *all* timesteps is
hoisted out of the recurrence into one large MXU matmul; the `lax.scan` body
only performs the hidden-to-hidden matmul plus fused elementwise gate math
(which XLA fuses into the matmul epilogue).  This replaces the reference's
per-timestep Lua module-clone loop (`src/model/model.lua:294-316`).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from aocr.ops.mm import einsum, matmul

# lax.scan unroll factor for the recurrent loops (encoder directions and
# the teacher-forced decoder).  Unrolling trades compiled-code size for
# fewer loop iterations and cross-step fusion opportunities in both the
# forward and the autodiff-generated backward scan.  Module-level so
# experiments (tools/) can sweep it; the shipped default is what measured
# fastest on v5e (see docs/performance.md).
SCAN_UNROLL = 1


def init_lstm_layer(rng: jax.Array, input_size: int, num_hidden: int) -> dict:
    """Torch nn.Linear-style init for i2h and h2h: uniform(+-1/sqrt(fan_in))."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    bi = 1.0 / math.sqrt(input_size)
    bh = 1.0 / math.sqrt(num_hidden)
    return {
        "wi": jax.random.uniform(k1, (input_size, 4 * num_hidden), jnp.float32, -bi, bi),
        "bi": jax.random.uniform(k2, (4 * num_hidden,), jnp.float32, -bi, bi),
        "wh": jax.random.uniform(k3, (num_hidden, 4 * num_hidden), jnp.float32, -bh, bh),
        "bh": jax.random.uniform(k4, (4 * num_hidden,), jnp.float32, -bh, bh),
    }


def gate_math(
    gates: jax.Array, c_prev: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Fused 4H pre-activations -> (c', h').  gates: (..., 4H), c_prev: (..., H)."""
    return gate_math_parts(gates, c_prev)[:2]


def gate_math_parts(
    gates: jax.Array, c_prev: jax.Array
) -> Tuple[jax.Array, jax.Array, Tuple[jax.Array, ...]]:
    """gate_math that also returns the gate activations (i, f, o, g) — the
    decoder custom VJP saves them as residuals so its backward pass reads
    instead of recomputes.  Same ops in the same order as before: (c', h')
    are bit-identical to gate_math's."""
    i, f, o, g = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    o = jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c = f * c_prev + i * g
    h = o * jnp.tanh(c)
    return c, h, (i, f, o, g)


def lstm_step(
    layer: dict, x: jax.Array, c_prev: jax.Array, h_prev: jax.Array,
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """One full LSTM step: gates = [x;h] @ [Wi;Wh] + bi + bh, then gate math.

    The input and recurrent projections are fused into a single wider MXU
    matmul (one (B, D+H) x (D+H, 4H) instead of two) — better systolic-array
    utilization for the small-batch single-step case, and the weight concat
    is loop-invariant so XLA hoists it out of decode scans.
    """
    cd = compute_dtype
    w = jnp.concatenate(
        [layer["wi"].astype(cd), layer["wh"].astype(cd)], axis=0
    )
    xh = jnp.concatenate([x.astype(cd), h_prev.astype(cd)], axis=-1)
    gates = matmul(xh, w) + layer["bi"] + layer["bh"]
    return gate_math(gates, c_prev)


def _scan_ad(
    layer: dict,
    xs: jax.Array,
    c0: jax.Array,
    h0: jax.Array,
    reverse: bool = False,
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Plain-autodiff LSTM scan (see unidirectional_scan)."""
    B, L, _D = xs.shape
    # Hoisted input projection, computed scan-major: transposing the small
    # (B, L, D) input first means the matmul emits (L, B, 4H) in its natural
    # layout, so the scan's per-step dynamic-slice is contiguous.  Producing
    # (B, L, 4H) and swapping axes instead left the stack in a transposed
    # layout whose per-step slices ran ~25x off bandwidth (1.7 ms/step at
    # B=400 in the train trace, T(1,128)-tiled slices).
    x_proj = (
        matmul(jnp.swapaxes(xs, 0, 1).astype(compute_dtype),
               layer["wi"].astype(compute_dtype))
        + layer["bi"] + layer["bh"]
    )  # (L, B, 4H) scan-major
    wh = layer["wh"].astype(compute_dtype)

    def body(carry, xp):
        c, h = carry
        gates = xp + matmul(h.astype(compute_dtype), wh)
        c, h = gate_math(gates, c)
        return (c, h), h

    (c_f, h_f), hs = lax.scan(body, (c0, h0), x_proj, reverse=reverse,
                              unroll=SCAN_UNROLL)
    return jnp.swapaxes(hs, 0, 1), (c_f, h_f)


_SCAN_VJP_CACHE: dict = {}

# Tests set this to run the Pallas encoder-backward kernel on CPU
# (interpret mode); on TPU the kernel activates for bfloat16 compute.
_PALLAS_LSTM_BWD_INTERPRET = False


def _scan_collect(layer, xs, c0, h0, reverse, cd):
    """_scan_ad plus residual stacks: returns (hs, (c_f, h_f),
    (ifog (L,B,4H) cd, cs (L,B,H) cd)) with hs/finals bit-identical to
    _scan_ad (same ops in the same order)."""
    x_proj = (
        matmul(jnp.swapaxes(xs, 0, 1).astype(cd), layer["wi"].astype(cd))
        + layer["bi"] + layer["bh"]
    )  # (L, B, 4H) scan-major (see _scan_ad)
    wh = layer["wh"].astype(cd)

    def body(carry, xp):
        c, h = carry
        gates = xp + matmul(h.astype(cd), wh)
        c, h, ifog4 = gate_math_parts(gates, c)
        return (c, h), (h, jnp.concatenate(ifog4, axis=-1).astype(cd),
                        c.astype(cd))

    (c_f, h_f), (hs, ifog, cs) = lax.scan(
        body, (c0, h0), x_proj, reverse=reverse, unroll=SCAN_UNROLL)
    return jnp.swapaxes(hs, 0, 1), (c_f, h_f), (ifog, cs)


def _bwd_recurrence(layer, hs, c0, h0, ifog, cs_t, dhs, dc_f, dh_f,
                    reverse: bool, cd):
    """Shared backward recurrence for the custom-VJP scans.

    From the forward residuals (gate activations `ifog` (L,B,4H) and cell
    states `cs_t` (L,B,H), both scan-major) and the output cotangents,
    carries ONLY the recurrent (dh, dc) chain — on TPU/bf16 as one Pallas
    kernel (ops/pallas/lstm_bwd.py) — and returns the per-step
    pre-activation gate cotangents plus everything the weight-gradient
    matmuls need:

      (dg_cd (L,B,4H) cd, dgates_f32 (same stack, f32-summable),
       dh0, dc0, h_prev (L,B,H) scan-major)
    """
    hs_t = jnp.swapaxes(hs, 0, 1)  # (L, B, H) scan-major
    if reverse:
        # step t consumed state from t+1; the initial state feeds t=L-1
        h_prev = jnp.concatenate([hs_t[1:], h0[None]], axis=0)
        c_prev_t = jnp.concatenate(
            [cs_t[1:], c0[None].astype(cs_t.dtype)], axis=0)
    else:
        h_prev = jnp.concatenate([h0[None], hs_t[:-1]], axis=0)
        c_prev_t = jnp.concatenate(
            [c0[None].astype(cs_t.dtype), cs_t[:-1]], axis=0)
    dhs_t = jnp.swapaxes(dhs, 0, 1).astype(jnp.float32)  # (L, B, H)
    wh_cd = layer["wh"].astype(cd)
    H = hs.shape[-1]

    use_kernel = bool(_PALLAS_LSTM_BWD_INTERPRET)
    if (not use_kernel and cd == jnp.bfloat16
            and jax.default_backend() == "tpu"):
        from aocr.ops.pallas import lstm_bwd as _lb

        use_kernel = _lb.fits(H, jnp.dtype(cd).itemsize)
    if use_kernel:
        from aocr.ops.pallas import lstm_bwd as _lb

        dg_cd, dh0, dc0 = _lb.lstm_bwd_scan(
            wh_cd.T, dhs_t, ifog, cs_t, c_prev_t,
            dc_f, dh_f, reverse,
            interpret=_PALLAS_LSTM_BWD_INTERPRET,
        )
        dgates_f32 = dg_cd  # bias sum casts as needed
    else:
        i_ = ifog[..., :H]
        f_ = ifog[..., H:2 * H]
        o_ = ifog[..., 2 * H:3 * H]
        g_ = ifog[..., 3 * H:]

        def body(carry, per_t):
            dh, dc = carry
            i_t, f_t, o_t, g_t, c_t, cp_t, dy_t = per_t
            dh = dh + dy_t
            tc = jnp.tanh(c_t.astype(jnp.float32))
            do = dh * tc
            dc = dc + dh * o_t * (1.0 - tc * tc)
            di = dc * g_t
            dg = dc * i_t
            df = dc * cp_t
            dc_prev = dc * f_t
            dgates = jnp.concatenate([
                di * i_t * (1.0 - i_t),
                df * f_t * (1.0 - f_t),
                do * o_t * (1.0 - o_t),
                dg * (1.0 - g_t * g_t),
            ], axis=-1)  # (B, 4H) f32
            dh_prev = matmul(dgates.astype(cd), wh_cd.T)
            return (dh_prev, dc_prev), dgates

        carry0 = (dh_f.astype(jnp.float32), dc_f.astype(jnp.float32))
        (dh0, dc0), dgates_t = lax.scan(
            body, carry0, (i_, f_, o_, g_, cs_t, c_prev_t, dhs_t),
            reverse=not reverse,
        )
        dg_cd = dgates_t.astype(cd)
        dgates_f32 = dgates_t
    return dg_cd, dgates_f32, dh0, dc0, h_prev


def _scan_custom(reverse: bool, cd):
    """Build (and cache) the custom-VJP LSTM scan for a static
    (reverse, compute_dtype).

    Why not plain autodiff: lax.scan's transpose carries the WEIGHT
    gradients through every backward step — the profiled train step spent
    its single largest slice (while.26, docs/performance.md) accumulating
    a (H, 4H) f32 dWh inside the loop, one (B,H)x(B,4H) outer-product
    matmul plus a 16 MB read-modify-write per timestep.  Here the backward
    scan carries ONLY the recurrent (dh, dc) chain and stacks per-step
    pre-activation gate grads; all weight/bias/input gradients then come
    from three large batched matmuls over the whole sequence — the same
    math, MXU-shaped.  Since r3 the forward scan stacks the gate
    activations / cell states as residuals (they are computed anyway —
    recompute cost what the hoisting saved, see docs/performance.md), and
    on TPU/bf16 the backward recurrence runs as one Pallas kernel
    (ops/pallas/lstm_bwd.py), the sibling of the decoder's tf_bwd."""
    key = (reverse, jnp.dtype(cd).name)
    if key in _SCAN_VJP_CACHE:
        return _SCAN_VJP_CACHE[key]

    @jax.custom_vjp
    def scan_fn(layer, xs, c0, h0):
        return _scan_ad(layer, xs, c0, h0, reverse, cd)

    def fwd(layer, xs, c0, h0):
        hs, finals, (ifog, cs) = _scan_collect(layer, xs, c0, h0,
                                               reverse, cd)
        return (hs, finals), (layer, xs, c0, h0, hs, ifog, cs)

    def bwd(res, cotangents):
        layer, xs, c0, h0, hs, ifog, cs_t = res
        dhs, (dc_f, dh_f) = cotangents
        dg_cd, dgates_f32, dh0, dc0, h_prev = _bwd_recurrence(
            layer, hs, c0, h0, ifog, cs_t, dhs, dc_f, dh_f, reverse, cd)
        # Weight/bias/input grads: batched over the whole sequence.
        dwh = einsum("lbh,lbg->hg", h_prev.astype(cd), dg_cd)
        dwi = einsum("lbd,lbg->dg",
                     jnp.swapaxes(xs, 0, 1).astype(cd), dg_cd)
        db = jnp.sum(dgates_f32.astype(jnp.float32), axis=(0, 1))
        dxs = jnp.swapaxes(einsum("lbg,dg->lbd", dg_cd,
                                  layer["wi"].astype(cd)), 0, 1)
        dlayer = {"wi": dwi.astype(layer["wi"].dtype),
                  "wh": dwh.astype(layer["wh"].dtype),
                  "bi": db.astype(layer["bi"].dtype),
                  "bh": db.astype(layer["bh"].dtype)}
        return (dlayer, dxs.astype(xs.dtype), dc0.astype(c0.dtype),
                dh0.astype(h0.dtype))

    scan_fn.defvjp(fwd, bwd)
    _SCAN_VJP_CACHE[key] = scan_fn
    return scan_fn


def unidirectional_scan(
    layer: dict,
    xs: jax.Array,
    c0: jax.Array,
    h0: jax.Array,
    reverse: bool = False,
    compute_dtype=jnp.float32,
    custom_grad: bool = True,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Run an LSTM layer over a sequence.

    xs: (B, L, D) inputs; returns (hs (B, L, H) in *original* time order,
    (c_final, h_final)).  With reverse=True the recurrence runs L..1 (the
    reference's backward encoder, src/model/model.lua:305-316) and h_final is
    the state after consuming timestep 1.

    The input projection for all L steps is one batched matmul; the scan body
    is h2h + gate math only.  With custom_grad (default) the backward pass
    uses the hand-written VJP that keeps weight-gradient accumulation out of
    the backward scan (see _scan_custom); custom_grad=False is the plain
    autodiff path kept for gradient-parity tests.
    """
    if custom_grad:
        return _scan_custom(reverse, compute_dtype)(layer, xs, c0, h0)
    return _scan_ad(layer, xs, c0, h0, reverse, compute_dtype)
