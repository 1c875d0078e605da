"""Data-parallel evaluation: beam decode + gold pass sharded over the mesh.

The reference evaluates inside the train loop on its single device
(`/root/reference/src/train.lua:136-162`); round 1 of this rebuild kept the
whole validation sweep on chip 0 even under `-num_shards N`, so training
scaled but the eval that gates LR decay didn't.  Here the full eval step —
CNN + bi-encoder + beam/greedy decode + teacher-forced gold pass — runs
under one `shard_map` over the data axis: every chip decodes its batch
shard (beam state is per-sample, so the decode shards trivially on batch;
each shard's `lax.while_loop` early-exits independently), and only the
token-sum NLL is all-reduced.  Labels, beam scores, and per-sample gold
scores come back sharded; the host fetches them once per batch for the
(cheap) string metrics, exactly like the single-device path.

Partial buckets are padded to a shardable row count by the caller; padded
rows are sliced off after the fetch (PAD targets make them zero-loss, so
the psum'd NLL needs no correction).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from aocr import decode, eval as eval_lib, train_step, vocab
from aocr.config import Config
from aocr.models import model
from aocr.parallel.mesh import DATA_AXIS

_DUMMY_TRIES: dict = {}


def _trie_or_dummy(trie_table, vocab_size: int):
    """A (1, V) all-invalid stand-in keeps ONE jit signature for both
    trie and trie-free modes (use_trie=False never reads it).  Cached per
    vocab size so trie-free steps don't re-allocate it every call."""
    if trie_table is not None:
        return trie_table
    dummy = _DUMMY_TRIES.get(vocab_size)
    if dummy is None:
        dummy = _DUMMY_TRIES[vocab_size] = jnp.zeros((1, vocab_size),
                                                     jnp.int32)
    return dummy


class EvalOut(NamedTuple):
    labels: jax.Array  # (B, T) int32, batch-sharded
    scores: jax.Array  # (B,) float32 best-beam cumulative log-prob
    nll: jax.Array  # scalar, global token-sum NLL (psum'd)
    gold_scores: jax.Array  # (B,) per-sample teacher-forced log-prob
    accuracy: jax.Array  # scalar int32 exact-match count over real rows
    cer_sum: jax.Array  # scalar f32 summed normalized edit distance
    refills: jax.Array  # scalar int32 trie refill events (0 without trie)
    min_valid: jax.Array  # scalar int32 smallest valid-beam count seen


def make_dp_eval_step(cfg: Config, mesh: Mesh, use_trie: bool):
    """Build the sharded eval step.

    Returns step(params, batch_stats, images, targets, targets_eval,
    trie_table, row_mask) -> EvalOut.  Batch arrays must be sharded over
    DATA_AXIS (mesh.shard_batch) with row counts divisible by the data-axis
    size; params/batch_stats/trie_table replicated.  row_mask marks real
    rows; exact-match and CER are computed on-device (aocr.eval's
    canonicalizing wavefront DP — identical to the host string metrics)
    and reduced over real rows only.
    """
    K = min(cfg.beam_size, cfg.target_vocab_size)
    T = cfg.max_decoder_l

    def local_step(params, batch_stats, images, targets, targets_eval,
                   trie_table, row_mask):
        # ONE CNN+bi-encoder forward, shared explicitly between the beam
        # decode and the teacher-forced gold pass (XLA's CSE merged the
        # previous duplicated encodes; explicit sharing doesn't rely on
        # the call sites staying bit-identical — see
        # decode.greedy_from_context).
        context, dec_init, _ = model.encode(
            params, batch_stats, images, cfg, train=False)
        out = decode.beam_from_context(
            params, context, dec_init, cfg,
            beam_size=K, max_len=T,
            trie_table=trie_table if use_trie else None,
            use_trie=use_trie,
            return_refills=True,
        )
        labels, scores, (refills, min_valid) = out
        nll, log_probs = model.loss_from_context(
            params, context, dec_init, targets, targets_eval, cfg,
            train=False,
        )
        gold_scores = train_step.gold_scores_from_logprobs(
            log_probs, targets_eval)
        nll = jax.lax.psum(nll, DATA_AXIS)
        refills = jax.lax.psum(refills, DATA_AXIS)
        min_valid = jax.lax.pmin(min_valid, DATA_AXIS)
        # On-device metrics (aocr.eval wavefront DP); padded filler rows
        # are masked out of both counts.
        em = eval_lib.exact_match(labels, targets_eval)
        cer = eval_lib.char_error_rate(labels, targets_eval)
        accuracy = jax.lax.psum(
            jnp.sum(em & (row_mask > 0)).astype(jnp.int32), DATA_AXIS
        )
        cer_sum = jax.lax.psum(jnp.sum(cer * row_mask), DATA_AXIS)
        return EvalOut(labels, scores, nll, gold_scores, accuracy, cer_sum,
                       refills, min_valid)

    rep = P()
    sh = P(DATA_AXIS)
    shmapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(rep, rep, sh, sh, sh, rep, sh),
        out_specs=EvalOut(labels=sh, scores=sh, nll=rep, gold_scores=sh,
                          accuracy=rep, cer_sum=rep,
                          refills=rep, min_valid=rep),
        check_vma=False,
    )
    jitted = jax.jit(shmapped)

    def step(params, batch_stats, images, targets, targets_eval,
             trie_table: Optional[jax.Array] = None,
             row_mask: Optional[jax.Array] = None) -> EvalOut:
        trie_table = _trie_or_dummy(trie_table, cfg.target_vocab_size)
        if row_mask is None:
            row_mask = jnp.ones((images.shape[0],), jnp.float32)
        return jitted(params, batch_stats, images, targets, targets_eval,
                      trie_table, row_mask)

    return step


def make_dp_decode_step(cfg: Config, mesh: Mesh, use_trie: bool,
                        beam_size: int, max_len: int):
    """Decode-only sharded step (inference/serving: no gold pass, no
    metrics).  Returns step(params, batch_stats, images, trie_table) ->
    (labels (B, max_len) int32, scores (B,) f32), both batch-sharded.
    Images must be sharded over DATA_AXIS with rows divisible by the
    data-axis size (pad_rows); params/batch_stats/trie replicated.

    Each shard runs the full single-device decode path — including the
    whole-loop Pallas kernels — on its batch slice; there is no cross-shard
    communication at all (beam state is per-sample), so throughput scales
    linearly with chips; the only sync point is the host fetch.
    """
    K = min(beam_size, cfg.target_vocab_size)

    def local_step(params, batch_stats, images, trie_table):
        context, dec_init, _ = model.encode(
            params, batch_stats, images, cfg, train=False)
        labels, scores = decode.beam_from_context(
            params, context, dec_init, cfg, beam_size=K, max_len=max_len,
            trie_table=trie_table if use_trie else None, use_trie=use_trie)
        return labels, scores

    rep, sh = P(), P(DATA_AXIS)
    shmapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(rep, rep, sh, rep), out_specs=(sh, sh), check_vma=False)
    jitted = jax.jit(shmapped)

    def step(params, batch_stats, images,
             trie_table: Optional[jax.Array] = None):
        return jitted(params, batch_stats, images,
                      _trie_or_dummy(trie_table, cfg.target_vocab_size))

    return step


def pad_rows(n_shards: int, *arrays, total_rows: Optional[int] = None):
    """Pad batch arrays (axis 0, repeating the last row for images / PAD
    rows for targets) to a row count divisible by n_shards — or to exactly
    total_rows (multi-host lockstep: every host contributes the same local
    row count).  Returns (real_rows, padded arrays...)."""
    B = arrays[0].shape[0]
    pad = (total_rows - B) if total_rows is not None else (-B) % n_shards
    assert pad >= 0, f"batch of {B} rows exceeds total_rows={total_rows}"
    if pad == 0:
        return (B,) + arrays
    out = []
    for a in arrays:
        xp = jnp if isinstance(a, jax.Array) else np
        if a.dtype.kind == "f":  # images: repeat last row (stays on device
            # for -device_preprocess batches)
            filler = xp.repeat(a[-1:], pad, 0)
        else:  # targets: PAD rows (zero loss)
            filler = xp.full((pad,) + a.shape[1:], vocab.PAD, a.dtype)
        out.append(xp.concatenate([a, filler], 0))
    return (B,) + tuple(out)
