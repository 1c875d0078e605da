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


# A/B switch (tools/ab_xproj.py): store the hoisted input-projection
# stacks in the COMPUTE dtype instead of the matmul's f32 accumulation.
# On the bf16 path this halves the HBM traffic of the largest pure-IO
# stacks in the train step — the encoder (L, B, 4H) x2 directions and
# the decoder (T, B, 4H) write once and re-read per kernel — at the cost
# of one bf16 rounding of the pre-activation before the f32 gate add
# (the recurrent h @ Wh term still accumulates in f32; both the Pallas
# kernels and the XLA scan fallbacks consume the SAME stack, so
# kernel/XLA bit-identity is preserved).  float32 mode is unaffected.
XPROJ_COMPUTE_DTYPE = True

# A/B switch (tools/ab_hstack.py): stack the per-step hidden states in the
# COMPUTE dtype instead of f32.  Every consumer of the h stacks casts to
# the compute dtype anyway — the encoder context feeds attention/gate
# matmuls as bf16, and the backward's h_prev weight-grad einsum casts to
# cd — so the stored f32 stack was pure IO; the (dhs) cotangent arriving
# at the stack gets the same bf16 rounding on both the custom-VJP and
# plain-autodiff paths (the astype sits inside both), keeping them
# bit-identical to each other.  Final states (dec_init) stay f32.
HSTACK_COMPUTE_DTYPE = True


def _stack_h(h: jax.Array, cd) -> jax.Array:
    if HSTACK_COMPUTE_DTYPE and cd != jnp.float32:
        return h.astype(cd)
    return h


def _proj_input(layer: dict, xs: jax.Array, cd) -> jax.Array:
    """Hoisted input projection, computed scan-major: transposing the small
    (B, L, D) input first means the matmul emits (L, B, 4H) in its natural
    layout, so the scan's per-step dynamic-slice is contiguous.  Producing
    (B, L, 4H) and swapping axes instead left the stack in a transposed
    layout whose per-step slices ran ~25x off bandwidth (1.7 ms/step at
    B=400 in the train trace, T(1,128)-tiled slices)."""
    xp = (
        matmul(jnp.swapaxes(xs, 0, 1).astype(cd), layer["wi"].astype(cd))
        + layer["bi"] + layer["bh"]
    )  # (L, B, 4H) scan-major
    if XPROJ_COMPUTE_DTYPE and cd != jnp.float32:
        xp = xp.astype(cd)
    return xp


def _scan_from_proj(wh, x_proj, c0, h0, reverse: bool, cd):
    """Recurrence only: h2h matmul + gate math over a precomputed
    scan-major input projection (L, B, 4H)."""

    def body(carry, xp):
        c, h = carry
        gates = xp + matmul(h.astype(cd), wh)
        c, h = gate_math(gates, c)
        return (c, h), _stack_h(h, cd)

    (c_f, h_f), hs = lax.scan(body, (c0, h0), x_proj, reverse=reverse,
                              unroll=SCAN_UNROLL)
    return jnp.swapaxes(hs, 0, 1), (c_f, h_f)


def _scan_ad(
    layer: dict,
    xs: jax.Array,
    c0: jax.Array,
    h0: jax.Array,
    reverse: bool = False,
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Plain-autodiff LSTM scan (see unidirectional_scan)."""
    x_proj = _proj_input(layer, xs, compute_dtype)
    wh = layer["wh"].astype(compute_dtype)
    return _scan_from_proj(wh, x_proj, c0, h0, reverse, compute_dtype)


_SCAN_VJP_CACHE: dict = {}

# Tests set this to run the Pallas encoder-backward kernel on CPU
# (interpret mode); on TPU the kernel activates for bfloat16 compute.
_PALLAS_LSTM_BWD_INTERPRET = False

# Same for the whole-scan encoder FORWARD kernel (ops/pallas/lstm_fwd).
_PALLAS_LSTM_FWD_INTERPRET = False


def _fwd_kernel_ok(H: int, cd) -> bool:
    """Route the forward recurrence through the whole-scan Pallas kernel:
    interpret mode on CPU for tests, else TPU + bf16 + a VMEM fit.  Only
    consulted from the custom-VJP paths (the plain-autodiff path must stay
    differentiable XLA ops)."""
    from aocr.ops.pallas import lstm_fwd as _lf

    if not _lf.ENABLE:
        return False
    if _PALLAS_LSTM_FWD_INTERPRET:
        return True
    if cd != jnp.bfloat16 or jax.default_backend() != "tpu":
        return False
    return _lf.fits(H, jnp.dtype(cd).itemsize)


def _kernel_from_proj(wh_cd, x_proj, c0, h0, reverse: bool, collect: bool):
    """lstm_fwd kernel call returning _scan_from_proj/_collect_from_proj's
    shapes ((B, L, H) hs + f32 finals [+ scan-major residual stacks])."""
    from aocr.ops.pallas import lstm_fwd as _lf

    # x_proj passes in its stored dtype (f32, or cd under
    # XPROJ_COMPUTE_DTYPE); the kernel upcasts per-tile in registers.
    out = _lf.lstm_fwd_scan(
        wh_cd, x_proj, c0, h0, reverse, collect,
        interpret=_PALLAS_LSTM_FWD_INTERPRET)
    if collect:
        hs, finals, (ifog, cs) = out
        return jnp.swapaxes(hs, 0, 1), finals, (ifog, cs)
    hs, finals = out
    return jnp.swapaxes(hs, 0, 1), finals


def _collect_from_proj(wh, x_proj, c0, h0, reverse: bool, cd):
    """_scan_from_proj plus residual stacks: returns (hs, (c_f, h_f),
    (ifog (L,B,4H) cd, cs (L,B,H) cd)) with hs/finals bit-identical to
    _scan_from_proj (same ops in the same order)."""

    def body(carry, xp):
        c, h = carry
        gates = xp + matmul(h.astype(cd), wh)
        c, h, ifog4 = gate_math_parts(gates, c)
        return (c, h), (_stack_h(h, cd),
                        jnp.concatenate(ifog4, axis=-1).astype(cd),
                        c.astype(cd))

    (c_f, h_f), (hs, ifog, cs) = lax.scan(
        body, (c0, h0), x_proj, reverse=reverse, unroll=SCAN_UNROLL)
    return jnp.swapaxes(hs, 0, 1), (c_f, h_f), (ifog, cs)


def _scan_collect(layer, xs, c0, h0, reverse, cd):
    """_scan_ad plus residual stacks (see _collect_from_proj)."""
    x_proj = _proj_input(layer, xs, cd)
    return _collect_from_proj(layer["wh"].astype(cd), x_proj, c0, h0,
                              reverse, cd)


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
        h_prev = jnp.concatenate(
            [hs_t[1:], h0[None].astype(hs_t.dtype)], axis=0)
        c_prev_t = jnp.concatenate(
            [cs_t[1:], c0[None].astype(cs_t.dtype)], axis=0)
    else:
        h_prev = jnp.concatenate(
            [h0[None].astype(hs_t.dtype), hs_t[:-1]], axis=0)
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
        if _fwd_kernel_ok(layer["wh"].shape[0], cd):
            return _kernel_from_proj(
                layer["wh"].astype(cd), _proj_input(layer, xs, cd),
                c0, h0, reverse, collect=False)
        return _scan_ad(layer, xs, c0, h0, reverse, cd)

    def fwd(layer, xs, c0, h0):
        if _fwd_kernel_ok(layer["wh"].shape[0], cd):
            hs, finals, (ifog, cs) = _kernel_from_proj(
                layer["wh"].astype(cd), _proj_input(layer, xs, cd),
                c0, h0, reverse, collect=True)
        else:
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


def _bidir_proj(layer_fw: dict, layer_bw: dict, xs: jax.Array, cd):
    """Fused layer-0 input projection for BOTH encoder directions: one
    (L*B, D) @ (D, 8H) MXU matmul instead of two (D, 4H) ones — the
    feature stack is read from HBM once and the wider matmul amortizes
    better on the systolic array.  Returns (xp_fw, xp_bw), each
    (L, B, 4H) scan-major (see _proj_input for the layout rationale)."""
    x_t = jnp.swapaxes(xs, 0, 1).astype(cd)  # (L, B, D)
    w8 = jnp.concatenate(
        [layer_fw["wi"].astype(cd), layer_bw["wi"].astype(cd)], axis=1)
    proj = matmul(x_t, w8)  # (L, B, 8H)
    G = layer_fw["wi"].shape[1]
    xp_fw = proj[..., :G] + layer_fw["bi"] + layer_fw["bh"]
    xp_bw = proj[..., G:] + layer_bw["bi"] + layer_bw["bh"]
    return xp_fw, xp_bw


def _bidir_ad(layer_fw, layer_bw, xs, c0f, h0f, c0b, h0b, cd):
    """Plain-autodiff fused bidirectional layer-0 scan (see
    bidirectional_scan)."""
    xp_fw, xp_bw = _bidir_proj(layer_fw, layer_bw, xs, cd)
    hs_f, fin_f = _scan_from_proj(layer_fw["wh"].astype(cd), xp_fw,
                                  c0f, h0f, False, cd)
    hs_b, fin_b = _scan_from_proj(layer_bw["wh"].astype(cd), xp_bw,
                                  c0b, h0b, True, cd)
    return hs_f, fin_f, hs_b, fin_b


_BIDIR_VJP_CACHE: dict = {}


def _bidir_custom(cd):
    """Build (and cache) the custom-VJP fused bidirectional scan for a
    static compute_dtype.  Backward fuses the x-side gradients across
    both directions: dWi is one (D, L*B) x (L*B, 8H) matmul and dxs one
    (L*B, 8H) x (8H, D) matmul (which inherently sums the two directions'
    input cotangents) — x and the gate-grad stacks each cross HBM once."""
    key = jnp.dtype(cd).name
    if key in _BIDIR_VJP_CACHE:
        return _BIDIR_VJP_CACHE[key]

    @jax.custom_vjp
    def scan_fn(layer_fw, layer_bw, xs, c0f, h0f, c0b, h0b):
        if _fwd_kernel_ok(layer_fw["wh"].shape[0], cd):
            xp_fw, xp_bw = _bidir_proj(layer_fw, layer_bw, xs, cd)
            hs_f, fin_f = _kernel_from_proj(
                layer_fw["wh"].astype(cd), xp_fw, c0f, h0f, False, False)
            hs_b, fin_b = _kernel_from_proj(
                layer_bw["wh"].astype(cd), xp_bw, c0b, h0b, True, False)
            return hs_f, fin_f, hs_b, fin_b
        return _bidir_ad(layer_fw, layer_bw, xs, c0f, h0f, c0b, h0b, cd)

    def fwd(layer_fw, layer_bw, xs, c0f, h0f, c0b, h0b):
        xp_fw, xp_bw = _bidir_proj(layer_fw, layer_bw, xs, cd)
        if _fwd_kernel_ok(layer_fw["wh"].shape[0], cd):
            hs_f, fin_f, (ifog_f, cs_f) = _kernel_from_proj(
                layer_fw["wh"].astype(cd), xp_fw, c0f, h0f, False, True)
            hs_b, fin_b, (ifog_b, cs_b) = _kernel_from_proj(
                layer_bw["wh"].astype(cd), xp_bw, c0b, h0b, True, True)
            res = (layer_fw, layer_bw, xs, c0f, h0f, c0b, h0b,
                   hs_f, ifog_f, cs_f, hs_b, ifog_b, cs_b)
            return (hs_f, fin_f, hs_b, fin_b), res
        hs_f, fin_f, (ifog_f, cs_f) = _collect_from_proj(
            layer_fw["wh"].astype(cd), xp_fw, c0f, h0f, False, cd)
        hs_b, fin_b, (ifog_b, cs_b) = _collect_from_proj(
            layer_bw["wh"].astype(cd), xp_bw, c0b, h0b, True, cd)
        res = (layer_fw, layer_bw, xs, c0f, h0f, c0b, h0b,
               hs_f, ifog_f, cs_f, hs_b, ifog_b, cs_b)
        return (hs_f, fin_f, hs_b, fin_b), res

    def bwd(res, cotangents):
        (layer_fw, layer_bw, xs, c0f, h0f, c0b, h0b,
         hs_f, ifog_f, cs_f, hs_b, ifog_b, cs_b) = res
        dhs_f, (dcf_f, dhf_f), dhs_b, (dcf_b, dhf_b) = cotangents
        dg_f, dgf32_f, dh0f, dc0f, h_prev_f = _bwd_recurrence(
            layer_fw, hs_f, c0f, h0f, ifog_f, cs_f,
            dhs_f, dcf_f, dhf_f, False, cd)
        dg_b, dgf32_b, dh0b, dc0b, h_prev_b = _bwd_recurrence(
            layer_bw, hs_b, c0b, h0b, ifog_b, cs_b,
            dhs_b, dcf_b, dhf_b, True, cd)
        # x-side grads fused across directions: one wide matmul each.
        dg8 = jnp.concatenate([dg_f, dg_b], axis=-1)  # (L, B, 8H) cd
        x_t = jnp.swapaxes(xs, 0, 1).astype(cd)
        dwi8 = einsum("lbd,lbg->dg", x_t, dg8)  # (D, 8H)
        w8 = jnp.concatenate(
            [layer_fw["wi"].astype(cd), layer_bw["wi"].astype(cd)], axis=1)
        dxs = jnp.swapaxes(einsum("lbg,dg->lbd", dg8, w8), 0, 1)
        # h-side grads stay per direction (distinct h_prev stacks).
        dwh_f = einsum("lbh,lbg->hg", h_prev_f.astype(cd), dg_f)
        dwh_b = einsum("lbh,lbg->hg", h_prev_b.astype(cd), dg_b)
        db_f = jnp.sum(dgf32_f.astype(jnp.float32), axis=(0, 1))
        db_b = jnp.sum(dgf32_b.astype(jnp.float32), axis=(0, 1))
        G = layer_fw["wi"].shape[1]
        dlayer_fw = {"wi": dwi8[:, :G].astype(layer_fw["wi"].dtype),
                     "wh": dwh_f.astype(layer_fw["wh"].dtype),
                     "bi": db_f.astype(layer_fw["bi"].dtype),
                     "bh": db_f.astype(layer_fw["bh"].dtype)}
        dlayer_bw = {"wi": dwi8[:, G:].astype(layer_bw["wi"].dtype),
                     "wh": dwh_b.astype(layer_bw["wh"].dtype),
                     "bi": db_b.astype(layer_bw["bi"].dtype),
                     "bh": db_b.astype(layer_bw["bh"].dtype)}
        return (dlayer_fw, dlayer_bw, dxs.astype(xs.dtype),
                dc0f.astype(c0f.dtype), dh0f.astype(h0f.dtype),
                dc0b.astype(c0b.dtype), dh0b.astype(h0b.dtype))

    scan_fn.defvjp(fwd, bwd)
    _BIDIR_VJP_CACHE[key] = scan_fn
    return scan_fn


def bidirectional_scan(
    layer_fw: dict,
    layer_bw: dict,
    xs: jax.Array,
    c0_fw: jax.Array,
    h0_fw: jax.Array,
    c0_bw: jax.Array,
    h0_bw: jax.Array,
    compute_dtype=jnp.float32,
    custom_grad: bool = True,
):
    """Run forward AND backward LSTM layers over xs with a fused input
    projection (one (L*B, D) @ (D, 8H) matmul feeding both recurrences).

    Same math as two unidirectional_scan calls (reference encoders,
    src/model/model.lua:292-316); the fusion halves the HBM traffic on
    the shared input in both the forward and the backward pass.  Returns
    (hs_fw (B, L, H), (c_f, h_f) fw, hs_bw (B, L, H), (c_f, h_f) bw).
    """
    if custom_grad:
        return _bidir_custom(compute_dtype)(
            layer_fw, layer_bw, xs, c0_fw, h0_fw, c0_bw, h0_bw)
    return _bidir_ad(layer_fw, layer_bw, xs, c0_fw, h0_fw, c0_bw, h0_bw,
                     compute_dtype)
