"""List-of-groups optimizers: SGD (reference-default) and Adadelta.

Parity with the reference optimizers:
- SGD (`/root/reference/src/optim/optim_sgd.lua:23-99`): per *parameter group*
  L2-norm gradient clipping at 5 (the reference flattens each of the five
  layer groups into one vector and clips that vector's norm,
  optim_sgd.lua:50-52), optional weight decay / momentum / dampening /
  nesterov, annealed rate lr/(1 + nevals*lr_decay), update y -= clr * g.
- Adadelta (`/root/reference/src/optim/optim_adadelta.lua:19-62`): rho=0.9,
  eps=1e-6 accumulators.  (The reference's dormant Adadelta has a latent
  weight-decay bug — `add` on a Lua table, optim_adadelta.lua:37 — which is
  *not* reproduced; weight decay here applies per-tensor.)

The group structure is the model's five top-level param groups
{cnn, encoder_fw, encoder_bw, decoder, projector}
(src/model/model.lua:150,161-168).

All updates are pure jit-friendly functions; the learning rate is a traced
scalar so validation-driven LR decay never triggers recompilation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

GROUPS = ("cnn", "encoder_fw", "encoder_bw", "decoder", "projector")

CLIP_NORM = 5.0


def group_norm(tree) -> jax.Array:
    """L2 norm of all leaves of a group, flattened (reference getParameters
    flattens a group into one vector; the clip norm is over that vector)."""
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def clip_grads_by_group(grads: dict, max_norm: float = CLIP_NORM):
    """Per-group gradient clipping.  Returns (clipped_grads, norms dict)."""
    out, norms = {}, {}
    for g in grads:
        n = group_norm(grads[g])
        scale = jnp.where(n > max_norm, max_norm / n, 1.0)
        out[g] = jax.tree.map(lambda x: x * scale, grads[g])
        norms[g] = n
    return out, norms


class SGDState(NamedTuple):
    eval_counter: jax.Array  # scalar int32 step counter (per-group counters
    # in the reference always advance in lockstep, so one scalar suffices)
    momentum_buf: Optional[dict]  # matches params tree when momentum > 0
    # True until the buffer's first momentum update.  The reference keys
    # "first use" on the buffer not existing yet (optim_sgd.lua:60-63:
    # `if not state.dfdx then ... copy(dfdx)`), NOT on the step counter —
    # they differ when momentum is enabled on a resumed checkpoint whose
    # eval_counter is already > 0.
    buf_fresh: jax.Array = True


class SGDHyper(NamedTuple):
    learning_rate_decay: float = 0.0
    weight_decay: float = 0.0
    momentum: float = 0.0
    dampening: float = 0.0
    nesterov: bool = False


def hyper_from_config(cfg) -> SGDHyper:
    """Resolve the CLI SGD hyper surface.  dampening < 0 is the 'unset'
    sentinel and defaults to momentum — the reference's
    `damp = config.dampening or mom` rule (optim_sgd.lua:32)."""
    damp = cfg.momentum if cfg.dampening < 0 else cfg.dampening
    return SGDHyper(
        learning_rate_decay=cfg.sgd_learning_rate_decay,
        weight_decay=cfg.weight_decay,
        momentum=cfg.momentum,
        dampening=damp,
        nesterov=cfg.nesterov,
    )


def sgd_init(params: dict, hyper: SGDHyper = SGDHyper()) -> SGDState:
    buf = None
    if hyper.momentum > 0:
        buf = jax.tree.map(jnp.zeros_like, params)
    return SGDState(eval_counter=jnp.zeros((), jnp.int32), momentum_buf=buf,
                    buf_fresh=jnp.asarray(True))


def sgd_update(
    params: dict,
    grads: dict,
    state: SGDState,
    lr: jax.Array,
    hyper: SGDHyper = SGDHyper(),
) -> Tuple[dict, SGDState, dict]:
    """One SGD step.  Returns (new_params, new_state, grad_norms)."""
    grads, norms = clip_grads_by_group(grads)
    if hyper.weight_decay != 0.0:
        grads = jax.tree.map(
            lambda g, p: g + hyper.weight_decay * p, grads, params
        )
    new_buf = state.momentum_buf
    new_fresh = state.buf_fresh
    if hyper.momentum > 0:
        first = state.buf_fresh
        new_buf = jax.tree.map(
            lambda b, g: jnp.where(first, g, hyper.momentum * b
                                   + (1.0 - hyper.dampening) * g),
            state.momentum_buf,
            grads,
        )
        new_fresh = jnp.asarray(False)
        if hyper.nesterov:
            grads = jax.tree.map(
                lambda g, b: g + hyper.momentum * b, grads, new_buf
            )
        else:
            grads = new_buf
    clr = lr / (1.0 + state.eval_counter.astype(jnp.float32)
                * hyper.learning_rate_decay)
    new_params = jax.tree.map(lambda p, g: p - clr * g, params, grads)
    return new_params, SGDState(state.eval_counter + 1, new_buf,
                                new_fresh), norms


class AdadeltaState(NamedTuple):
    acc_grad: dict  # E[g^2]
    acc_delta: dict  # E[dx^2]


def adadelta_init(params: dict) -> AdadeltaState:
    z = jax.tree.map(jnp.zeros_like, params)
    return AdadeltaState(acc_grad=z, acc_delta=jax.tree.map(jnp.zeros_like, params))


def adadelta_update(
    params: dict,
    grads: dict,
    state: AdadeltaState,
    rho: float = 0.9,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
) -> Tuple[dict, AdadeltaState, dict]:
    grads, norms = clip_grads_by_group(grads)
    if weight_decay != 0.0:
        grads = jax.tree.map(lambda g, p: g + weight_decay * p, grads, params)
    new_acc_g = jax.tree.map(
        lambda a, g: rho * a + (1 - rho) * g * g, state.acc_grad, grads
    )
    delta = jax.tree.map(
        lambda g, ag, ad: g * jnp.sqrt(ad + eps) / jnp.sqrt(ag + eps),
        grads, new_acc_g, state.acc_delta,
    )
    new_acc_d = jax.tree.map(
        lambda a, d: rho * a + (1 - rho) * d * d, state.acc_delta, delta
    )
    new_params = jax.tree.map(lambda p, d: p - d, params, delta)
    return new_params, AdadeltaState(new_acc_g, new_acc_d), norms
