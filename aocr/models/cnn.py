"""CNN feature extractor over 32-px-tall grayscale word crops.

Architecture parity with the reference stack (`/root/reference/src/model/cnn.lua:9-45`):
normalize (x-128)/128, then 7 convolutions (64,128,256,256,512,512,512) with
ReLU, three BatchNorms (after convs 3,5,7) and four max-pools
(2x2/2, 2x2/2, 1x2 height-only, 1x2 height-only), ending with a 2x2 VALID conv
that collapses the remaining height of 2 to 1.  Output is a width-wise column
sequence (B, L, 512) with the shape law L = floor(W/4) - 1.

TPU-native design: NHWC layout (XLA's preferred conv layout on TPU), all convs
lowered to `lax.conv_general_dilated` on the MXU, pooling via
`lax.reduce_window`, optional bfloat16 compute with float32 params and
float32 batch-norm statistics.
"""

from __future__ import annotations

import math
from functools import partial as _partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# (out_channels, kernel_hw, stride, padding, batch_norm?) per conv layer.
# Heights through the stack: 32 ->16 ->8 ->4 ->2 ->1 (pools + final VALID 2x2).
_CONV_DEFS = (
    # name, in_c, out_c, kh, kw, padding, bn
    ("conv1", 1, 64, 3, 3, "SAME", False),
    ("conv2", 64, 128, 3, 3, "SAME", False),
    ("conv3", 128, 256, 3, 3, "SAME", True),
    ("conv4", 256, 256, 3, 3, "SAME", False),
    ("conv5", 256, 512, 3, 3, "SAME", True),
    ("conv6", 512, 512, 3, 3, "SAME", False),
    ("conv7", 512, 512, 2, 2, "VALID", True),
)

# Max-pool (window_h, window_w) applied *after* the conv at the keyed index.
# Reference order: pool after conv1, conv2, conv4, conv6
# (src/model/cnn.lua:15,20,29,38).
_POOL_AFTER = {0: (2, 2), 1: (2, 2), 3: (2, 1), 5: (2, 1)}  # (h, w) windows

BN_MOMENTUM = 0.9  # running stat update: new = m*old + (1-m)*batch
BN_EPS = 1e-5




def output_length(width: int) -> int:
    """Column-sequence length for an input width (reference shape law)."""
    return width // 4 - 1


def init_params(rng: jax.Array) -> dict:
    """Torch-style init: uniform(+-1/sqrt(fan_in)) for conv weight and bias
    (Torch SpatialConvolution:reset), BN scale=1 shift=0."""
    params = {}
    for name, in_c, out_c, kh, kw, _pad, bn in _CONV_DEFS:
        rng, k1, k2 = jax.random.split(rng, 3)
        bound = 1.0 / math.sqrt(in_c * kh * kw)
        params[name] = {
            "w": jax.random.uniform(
                k1, (kh, kw, in_c, out_c), jnp.float32, -bound, bound
            ),
            "b": jax.random.uniform(k2, (out_c,), jnp.float32, -bound, bound),
        }
        if bn:
            params[name + "_bn"] = {
                "scale": jnp.ones((out_c,), jnp.float32),
                "bias": jnp.zeros((out_c,), jnp.float32),
            }
    return params


def init_batch_stats() -> dict:
    stats = {}
    for name, _in_c, out_c, _kh, _kw, _pad, bn in _CONV_DEFS:
        if bn:
            stats[name + "_bn"] = {
                "mean": jnp.zeros((out_c,), jnp.float32),
                "var": jnp.ones((out_c,), jnp.float32),
            }
    return stats


def _reduce_window_max(x: jax.Array, window: Tuple[int, int]) -> jax.Array:
    wh, ww = window
    return lax.reduce_window(
        x,
        -jnp.inf if x.dtype in (jnp.float32, jnp.bfloat16) else x.dtype.type(0),
        lax.max,
        (1, wh, ww, 1),
        (1, wh, ww, 1),
        "VALID",
    )


# A/B switch (tools/ab_pool.py): True replaces the pool backward's XLA
# SelectAndScatter with the strided-slice custom VJP below.  Measured
# WORSE on v5e (full train step 20.66 vs 17.64 ms at B=400, best-of-3
# alternating) — the slice/boolean-chain expansion reads the pool input
# wh*ww times and defeats the conv1-dgrad fusion, while the scatter
# emitter the r3 trace blamed was already overlapped.  Default stays the
# autodiff path; the kernel remains for re-measurement on other hardware
# generations (grads bit-identical either way, tests/test_pool_vjp.py).
_POOL_CUSTOM_VJP = False


def _pool_bwd_impl(x: jax.Array, dy: jax.Array,
                   window: Tuple[int, int]) -> jax.Array:
    """Winner-take-all max-pool backward without SelectAndScatter.

    Per non-overlapping window, route dy to the FIRST element equal to the
    window max in row-major window order — bit-identical to what XLA's
    select-and-scatter (GE select) computes for reduce_window's VJP, but
    expressed as strided slices + boolean chains + an interleave reshape,
    which fuse on TPU instead of lowering to the scatter emitter (the
    ~1 ms/step pool1 backward chain in the r3 train trace).  The window
    max is recomputed from the slices (an exact element pick, no
    arithmetic), so only x is carried as residual.
    """
    wh, ww = window
    B, H, W, C = x.shape
    Ho, Wo = H // wh, W // ww
    Ht, Wt = Ho * wh, Wo * ww
    xt = x[:, :Ht, :Wt, :] if (Ht, Wt) != (H, W) else x
    xs = [[lax.slice(xt, (0, di, dj, 0), (B, Ht, Wt, C), (1, wh, ww, 1))
           for dj in range(ww)] for di in range(wh)]
    y = None
    for row in xs:
        for xi in row:
            y = xi if y is None else lax.max(y, xi)
    parts, taken = [], None
    for row in xs:
        prow = []
        for xi in row:
            eq = xi == y
            first = eq if taken is None else (eq & ~taken)
            taken = eq if taken is None else (taken | eq)
            prow.append(jnp.where(first, dy, 0).astype(x.dtype))
        parts.append(prow)
    rows = [r[0] if ww == 1 else
            jnp.stack(r, axis=3).reshape(B, Ho, Wt, C) for r in parts]
    dx = rows[0] if wh == 1 else \
        jnp.stack(rows, axis=2).reshape(B, Ht, Wt, C)
    if (Ht, Wt) != (H, W):  # VALID drops ragged edge rows/cols: zero grad
        dx = jnp.pad(dx, ((0, 0), (0, H - Ht), (0, W - Wt), (0, 0)))
    return dx


@_partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool_cvjp(x: jax.Array, window: Tuple[int, int]) -> jax.Array:
    return _reduce_window_max(x, window)


def _max_pool_cvjp_fwd(x, window):
    return _reduce_window_max(x, window), (x,)


def _max_pool_cvjp_bwd(window, res, dy):
    (x,) = res
    return (_pool_bwd_impl(x, dy, window),)


_max_pool_cvjp.defvjp(_max_pool_cvjp_fwd, _max_pool_cvjp_bwd)


def _max_pool(x: jax.Array, window: Tuple[int, int]) -> jax.Array:
    # Forward: reduce_window either way (a reshape+max forward measured
    # slower end-to-end on v5e — cnn+enc fwd+bwd 19.7 vs 15.3 ms at B=400,
    # tools/profile_train.py).  Backward: custom VJP above (A/B gated).
    if _POOL_CUSTOM_VJP:
        return _max_pool_cvjp(x, window)
    return _reduce_window_max(x, window)


# Tests set this to run the fused ReLU+pool backward Pallas kernel on CPU
# (interpret mode); on TPU it activates whenever the spatial dims divide
# the window (see ops/pallas/pool_bwd.py for the backward semantics).
_PALLAS_POOL_BWD_INTERPRET = False

# Tests set this to run the fused conv1+ReLU+pool kernels on CPU
# (interpret mode); on TPU they activate for the reference conv1 geometry
# (1 input channel, 3x3 SAME, 2x2 pool, even dims — ops/pallas/conv1_pool).
_PALLAS_CONV1_INTERPRET = False


def _conv1_kernel_ok(shape) -> bool:
    from aocr.ops.pallas import conv1_pool as _c1

    if not (_c1.ENABLE and _c1.supported(shape)):
        return False
    if _PALLAS_CONV1_INTERPRET:
        return True
    return jax.default_backend() == "tpu"


def _pool_kernel_ok(shape, window) -> bool:
    from aocr.ops.pallas import pool_bwd as _pb

    if not (_pb.ENABLE and _pb.supported(shape, window)):
        return False
    if _PALLAS_POOL_BWD_INTERPRET:
        return True
    return jax.default_backend() == "tpu"


@_partial(jax.custom_vjp, nondiff_argnums=(1,))
def _relu_pool(z: jax.Array, window: Tuple[int, int]) -> jax.Array:
    """max_pool(relu(z)) with a one-kernel backward.

    The composite's VJP reads ONLY the ReLU output (= the pool input,
    saved anyway): dz = dy routed to the first window max, zeroed where
    the output is zero — bit-identical to XLA's select_and_scatter +
    ReLU-VJP composition (argument in ops/pallas/pool_bwd.py), without
    the scatter emitter or the packed ReLU-mask residual it needs.
    """
    return _reduce_window_max(jax.nn.relu(z), window)


def _relu_pool_fwd(z, window):
    y = jax.nn.relu(z)
    return _reduce_window_max(y, window), (y,)


def _relu_pool_bwd(window, res, dy):
    (y,) = res
    from aocr.ops.pallas import pool_bwd as _pb

    return (_pb.relu_pool_bwd(y, dy, window,
                              interpret=_PALLAS_POOL_BWD_INTERPRET),)


_relu_pool.defvjp(_relu_pool_fwd, _relu_pool_bwd)


# How the conv bias gradient (the cnn.py bias-add backward) is computed.
# The r4 train trace showed XLA fusing each bias-grad reduce_sum into the
# kLoop fusion that materializes the conv-output cotangent (the BN/ReLU
# backward pointwise chain): a dual-output loop fusion with an in-loop
# bf16 cross-sublane reduce, measured ~2.1 ms/step across the stack at
# B=400 — ~15-20x its bandwidth roofline (the tensors are re-read anyway
# by the conv wgrad/dgrad custom-calls).  Modes (tools/ab_biasgrad.py):
#   "xla"  — plain `x + b`, autodiff reduce (status quo ante)
#   "dot"  — custom VJP; db = ones-vector dot_general on the MXU, f32 accum
#   "f32"  — custom VJP; db = f32 reduce behind an optimization_barrier
#            (the barrier keeps the reduce OUT of the cotangent fusion)
_BIAS_GRAD = "dot"

# The BN custom-VJP's channel reductions get their OWN mode constant so
# A/B-ing the bias-grad knob cannot silently change the BN backward's
# formulation at the same time (the two experiments stay independent —
# ADVICE r4).  Same values as _BIAS_GRAD ("dot" | anything-else = barrier).
_BN_REDUCE = "dot"


def _channel_sum_f32(dy: jax.Array, mode: str = None) -> jax.Array:
    """Sum a (B, H, W, C) cotangent over (B, H, W) -> (C,) in float32."""
    if (mode or _BIAS_GRAD) == "dot":
        from aocr.ops import mm

        ones = jnp.ones(dy.shape[:3], dy.dtype)
        return lax.dot_general(
            ones, dy, (((0, 1, 2), (0, 1, 2)), ((), ())),
            precision=mm._precision(ones, dy),
            preferred_element_type=jnp.float32,
        )
    dy = lax.optimization_barrier(dy)
    return jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 2))


@jax.custom_vjp
def _bias_add(x: jax.Array, b: jax.Array) -> jax.Array:
    return x + b.astype(x.dtype)


def _bias_add_fwd(x, b):
    return x + b.astype(x.dtype), None


def _bias_add_bwd(_, dy):
    # f32 accumulation (the autodiff path reduced in bf16) — strictly more
    # accurate, and the reduce stays out of the cotangent's loop fusion.
    return dy, _channel_sum_f32(dy)


_bias_add.defvjp(_bias_add_fwd, _bias_add_bwd)


# Train-mode BN backward formulation.  "cvjp" (default) runs the classic
# closed-form BN backward as a custom VJP: the two channel reductions
# (d_beta = sum dy, d_gamma = sum dy*xhat) go through _channel_sum_f32
# (MXU dots / unfused f32 reduces, per _BIAS_GRAD), and dx is a pure
# per-channel FMA chain that fuses into the conv backward — instead of
# XLA differentiating through the f32 moment converts, which emitted the
# dual-output kLoop fusions the r4 trace blamed (tools/ab_bn.py).
# "xla" restores plain autodiff.  The masked path (row_mask) always uses
# autodiff: its weighted-moment backward is not worth hand-deriving.
_BN_MODE = "cvjp"


def _bn_train_math(axis_name, x, scale, bias):
    """Shared train-mode forward: y in compute dtype, f32 (mean, var)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    ex2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        ex2 = jax.lax.pmean(ex2, axis_name)
    var = ex2 - jnp.square(mean)
    inv = lax.rsqrt(var + BN_EPS) * scale
    a = inv.astype(x.dtype)
    b = (bias - mean * inv).astype(x.dtype)
    return x * a + b, mean, var


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bn_train_cvjp(axis_name, x, scale, bias):
    return _bn_train_math(axis_name, x, scale, bias)


def _bn_train_cvjp_fwd(axis_name, x, scale, bias):
    y, mean, var = _bn_train_math(axis_name, x, scale, bias)
    return (y, mean, var), (x, scale, mean, var)


def _bn_train_cvjp_bwd(axis_name, res, cots):
    # The (mean, var) outputs only feed the running statistics, which the
    # training loss never differentiates — their cotangents are zero and
    # are ignored here.
    dy, _dmean, _dvar = cots
    x, scale, mean, var = res
    inv0 = lax.rsqrt(var + BN_EPS)  # f32 (C,), biased variance
    xhat = x * inv0.astype(x.dtype) + (-mean * inv0).astype(x.dtype)
    sum_dy = _channel_sum_f32(dy, _BN_REDUCE)   # local shard sums: the
    sum_dyxh = _channel_sum_f32(dy * xhat, _BN_REDUCE)  # DP psum aggregates
    n = jnp.float32(x.shape[0] * x.shape[1] * x.shape[2])
    g_dy, g_dyxh = sum_dy, sum_dyxh
    if axis_name is not None:
        # Sync-BN: the moments were global, so dx's correction terms use
        # the GLOBAL reductions and the global element count.
        g_dy = jax.lax.psum(g_dy, axis_name)
        g_dyxh = jax.lax.psum(g_dyxh, axis_name)
        n = n * jax.lax.psum(jnp.float32(1.0), axis_name)
    ginv = scale * inv0
    ai = ginv.astype(x.dtype)
    c1 = (ginv * (g_dy / n)).astype(x.dtype)
    c2 = (ginv * (g_dyxh / n)).astype(x.dtype)
    dx = dy * ai - c1 - xhat * c2
    return dx, sum_dyxh, sum_dy


_bn_train_cvjp.defvjp(_bn_train_cvjp_fwd, _bn_train_cvjp_bwd)


def _batch_norm(
    x: jax.Array, p: dict, s: dict, train: bool, axis_name=None,
    row_mask=None,
) -> Tuple[jax.Array, dict]:
    """Torch-parity BatchNorm (see branch comments for the biased/unbiased
    variance split).

    CONSTRAINT (train path): the returned batch moments feed ONLY the
    non-differentiated running statistics.  The fast `_bn_train_cvjp`
    backward discards the (mean, var) cotangents outright — a future loss
    term that differentiates through the batch moments (e.g. a moment
    regularizer) would get silently wrong gradients on the cvjp path; use
    `_BN_MODE = "xla"` (full autodiff) for any such experiment.
    """
    if train and row_mask is None and _BN_MODE == "cvjp":
        y, mean, var = _bn_train_cvjp(axis_name, x, p["scale"], p["bias"])
        count = jnp.float32(x.shape[0] * x.shape[1] * x.shape[2])
        if axis_name is not None:
            count = count * jax.lax.psum(jnp.float32(1.0), axis_name)
        # Running stats: biased var normalizes, unbiased n/(n-1) is stored
        # (Torch7 parity — see the comment in the autodiff branch below).
        unbiased = var * (count / jnp.maximum(count - 1.0, 1.0))
        new_s = {
            "mean": BN_MOMENTUM * s["mean"] + (1.0 - BN_MOMENTUM) * mean,
            "var": BN_MOMENTUM * s["var"] + (1.0 - BN_MOMENTUM) * unbiased,
        }
        return y, new_s
    if train:
        # Statistics over batch and spatial dims, in float32.  Under
        # data-parallel shard_map (axis_name set) the moments are averaged
        # across shards (sync-BN), so multi-chip training sees exactly the
        # global-batch statistics a single chip would.  row_mask (B,) marks
        # real rows: rows padded in to keep batches shardable are excluded
        # from the moments (else duplicated rows bias the statistics).
        xf = x.astype(jnp.float32)
        if row_mask is not None:
            w = row_mask.astype(jnp.float32)[:, None, None, None]
            count = jnp.sum(w) * (x.shape[1] * x.shape[2])
            xsum = jnp.sum(xf * w, axis=(0, 1, 2))
            x2sum = jnp.sum(jnp.square(xf) * w, axis=(0, 1, 2))
            if axis_name is not None:
                count = jax.lax.psum(count, axis_name)
                xsum = jax.lax.psum(xsum, axis_name)
                x2sum = jax.lax.psum(x2sum, axis_name)
            count = jnp.maximum(count, 1.0)
            mean = xsum / count
            ex2 = x2sum / count
        else:
            mean = jnp.mean(xf, axis=(0, 1, 2))
            ex2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            count = jnp.float32(x.shape[0] * x.shape[1] * x.shape[2])
            if axis_name is not None:
                mean = jax.lax.pmean(mean, axis_name)
                ex2 = jax.lax.pmean(ex2, axis_name)
                count = count * jax.lax.psum(1.0, axis_name)
        var = ex2 - jnp.square(mean)
        # Normalization uses the biased variance (as Torch does), but the
        # RUNNING estimate stores the unbiased n/(n-1) form — Torch7's
        # nn.SpatialBatchNormalization:updateOutput saves
        # `unbiased_var = sum_sq/(n-1)` into running_var, and eval-mode
        # parity with a reference-trained model depends on matching it.
        unbiased = var * (count / jnp.maximum(count - 1.0, 1.0))
        new_s = {
            "mean": BN_MOMENTUM * s["mean"] + (1.0 - BN_MOMENTUM) * mean,
            "var": BN_MOMENTUM * s["var"] + (1.0 - BN_MOMENTUM) * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    # Normalize as ONE fused multiply-add in the compute dtype: the
    # per-channel affine (a, b) is computed in f32 (tiny), then
    # y = x*a + b runs without converting the big activation through f32
    # — the f32 pointwise normalize chains were among the largest CNN ops
    # in the train-step trace.  The reassociation (x - mean)*inv + bias ->
    # x*inv + (bias - mean*inv) changes results only at rounding level.
    inv = lax.rsqrt(var + BN_EPS) * p["scale"]
    a = inv.astype(x.dtype)
    b = (p["bias"] - mean * inv).astype(x.dtype)
    return x * a + b, new_s


def apply(
    params: dict,
    batch_stats: dict,
    images: jax.Array,
    train: bool = False,
    compute_dtype=jnp.float32,
    axis_name=None,
    row_mask=None,
    use_pallas: bool = True,
) -> Tuple[jax.Array, dict]:
    """images (B, H=32, W, 1) float32 in [0, 255] -> ((B, L, 512), new_stats).

    use_pallas=False forces the pure-XLA path (portable .aocrx exports
    and `-no_use_pallas` A/Bs must not trace Mosaic custom-calls)."""
    x = ((images - 128.0) / 128.0).astype(compute_dtype)
    new_stats = dict(batch_stats)
    for idx, (name, _in_c, _out_c, _kh, _kw, pad, bn) in enumerate(_CONV_DEFS):
        if idx == 0 and use_pallas and _conv1_kernel_ok(x.shape):
            # conv1 + bias + ReLU + pool1 as one fused Pallas pair (fwd +
            # wgrad/bias-grad backward) — never materializes the 164 MB
            # pre-pool activation or its scatter/mask chains.  The kernel
            # owns the bias add and the pool, so the generic tail below is
            # skipped for this layer.
            from aocr.ops.pallas import conv1_pool as _c1

            x = _c1.conv1_relu_pool(
                x, params[name]["w"], params[name]["b"],
                _PALLAS_CONV1_INTERPRET,
            )
            continue
        w = params[name]["w"].astype(compute_dtype)
        # preferred_element_type=f32 with bf16 operands breaks the conv VJP
        # on this JAX version (f32 cotangent vs bf16 weights); in bf16 the
        # TPU conv accumulates in f32 internally anyway, so request f32
        # output only on the f32 path.
        x = lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=(
                lax.Precision.HIGHEST
                if compute_dtype == jnp.float32
                else lax.Precision.DEFAULT
            ),
            preferred_element_type=(
                jnp.float32 if compute_dtype == jnp.float32 else None
            ),
        ).astype(compute_dtype)
        if _BIAS_GRAD == "xla":
            x = x + params[name]["b"].astype(compute_dtype)
        else:
            x = _bias_add(x, params[name]["b"])
        if bn:
            x, new_stats[name + "_bn"] = _batch_norm(
                x, params[name + "_bn"], batch_stats[name + "_bn"], train,
                axis_name, row_mask,
            )
        # jax.nn.relu, NOT jnp.maximum(x, 0): maximum's VJP splits the
        # gradient at ties (0.5*g where x == 0), so XLA stores bit-packed
        # eq-masks for BOTH branches of every ReLU (u32 reduce fusions
        # over H in the train trace).  relu's custom JVP is
        # select(x > 0, g, 0) — no tie machinery (A/B: 20.54 -> 19.90 ms,
        # tools/ab_relu.py), and it matches the reference's Torch ReLU
        # subgradient (gradInput = g * (output > 0), zero at x == 0)
        # exactly.  (An output-masked custom-VJP variant that drops the
        # remaining packed-mask residual measured neutral — tools/ab_wgrad
        # — and was not kept.)
        if (idx in _POOL_AFTER and not _POOL_CUSTOM_VJP
                and _pool_kernel_ok(x.shape, _POOL_AFTER[idx])):
            x = _relu_pool(x, _POOL_AFTER[idx])
        else:
            x = jax.nn.relu(x)
            if idx in _POOL_AFTER:
                x = _max_pool(x, _POOL_AFTER[idx])
    # x: (B, 1, L, 512) -> (B, L, 512)
    features = jnp.squeeze(x, axis=1)
    return features, new_stats


def num_params() -> int:
    n = 0
    for _name, in_c, out_c, kh, kw, _pad, bn in _CONV_DEFS:
        n += kh * kw * in_c * out_c + out_c
        if bn:
            n += 2 * out_c
    return n
