"""CLI driver and train/eval loops.

Mirrors the reference driver (`/root/reference/src/train.lua:68-296`):

- `-phase train`: epoch loop over shuffled width-bucketed batches; per-step
  running perplexity log exp(loss/num_nonzeros) (train.lua:103); every
  `steps_per_checkpoint` steps, save a step checkpoint + atomically publish
  `final-model`, run a validation sweep (beam decode + teacher-forced loss),
  and decay the LR by `lr_decay` (floored at learning_rate_min) when val
  loss increased (train.lua:116-171); epoch-end save + val sweep
  (train.lua:176-214)
- `-phase test`: single pass of beam decoding (beam_size, optional trie
  dictionary), exact-match accuracy, gold-score teacher-forced pass, and
  optional `results.txt` visualization TSV (model.lua:573-633)
- `-load_model`: resume from `<model_dir>/final-model`, restoring
  global_step and the learning rate (clamped to learning_rate_min,
  train.lua:87-89); CLI may override max_encoder_l / max_decoder_l /
  batch_size (model.lua:75-77)

Model-structure hyperparameters travel inside the checkpoint and take
precedence over CLI flags on load, exactly like the reference's saved
`config` table (model.lua:63-77).
"""

from __future__ import annotations

import math
import sys
from dataclasses import asdict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from aocr import checkpoint, data, eval as eval_lib, optim, train_step, vocab
from aocr.config import Config, parse_args
from aocr.models import model
from aocr.utils import trie as trie_lib
from aocr.utils.logging_util import Logger

class ValDrivenLR:
    """Validation-driven learning-rate schedule (reference
    src/train.lua:87-89,164-168): start at max(initial, floor); multiply by
    `decay` whenever validation loss fails to improve, floored at `minimum`.
    Raw val-loss *sums* are compared, exactly as the reference does."""

    def __init__(self, initial: float, minimum: float, decay: float):
        self.lr = max(initial, minimum)
        self.minimum = minimum
        self.decay = decay
        self.prev_val_loss: Optional[float] = None

    def update(self, val_loss: float) -> bool:
        """Record a validation result; returns True if the LR decayed."""
        decayed = False
        if (self.prev_val_loss is not None
                and val_loss > self.prev_val_loss
                and self.lr > self.minimum):
            self.lr = max(self.lr * self.decay, self.minimum)
            decayed = True
        self.prev_val_loss = val_loss
        return decayed


# Structure fields restored from a checkpoint on load (reference
# model.lua:63-77); everything else follows the CLI.
# moved to aocr.config (inference code needs it without importing the
# training stack); aliased here for existing imports
from aocr.config import STRUCT_FIELDS as _STRUCT_FIELDS  # noqa: E402


class Trainer:
    def __init__(self, cfg: Config, log: Logger):
        self.log = log
        ckpt = None
        if cfg.load_model:
            ckpt = checkpoint.try_load_final(
                cfg.model_dir, allow_pickle=cfg.allow_pickle_ckpt
            )
            if ckpt is None:
                log.info("No final-model found; creating fresh parameters")
        if ckpt is not None:
            log.info(f"Loading model from {checkpoint.final_path(cfg.model_dir)}")
            saved = ckpt["config"]
            # Structure always comes from the checkpoint; image geometry /
            # sequence bounds come from the checkpoint UNLESS the CLI
            # passed the flag (even with its default value — parse_args
            # records explicit flags) or changed it from the defaults (the
            # reference lets the CLI override max_*_l, model.lua:75-77) —
            # otherwise `-phase test -load_model` on a model trained with
            # e.g. -keep_aspect_ratio would silently preprocess at the
            # wrong geometry.  Mirrors AttentionOCR.load.
            from aocr.config import GEOMETRY_FIELDS

            overrides = cfg.geometry_overrides()
            fields = list(_STRUCT_FIELDS) + [
                k for k in GEOMETRY_FIELDS if k not in overrides
            ]
            cfg = cfg.replace(**{k: saved[k] for k in fields if k in saved})
            self.params = jax.tree.map(jnp.asarray, ckpt["params"])
            self.batch_stats = jax.tree.map(jnp.asarray, ckpt["batch_stats"])
            self.global_step = ckpt["global_step"]
            self.optim_meta = dict(ckpt["optim_state"])
        else:
            log.info("Creating model with fresh parameters")
            ms = model.init(jax.random.PRNGKey(cfg.seed), cfg)
            self.params, self.batch_stats = ms.params, ms.batch_stats
            self.global_step = 0
            self.optim_meta = {"learning_rate": cfg.learning_rate,
                               "eval_counter": 0}
        self.cfg = cfg.validate()
        if self.cfg.optimizer == "adadelta":
            saved_acc = self.optim_meta.get("adadelta")
            if saved_acc is not None:
                self.opt_state = optim.AdadeltaState(
                    acc_grad=jax.tree.map(jnp.asarray, saved_acc["acc_grad"]),
                    acc_delta=jax.tree.map(jnp.asarray,
                                           saved_acc["acc_delta"]),
                )
            else:
                self.opt_state = optim.adadelta_init(self.params)
        else:
            buf = None
            saved_buf = None
            if self.cfg.momentum > 0:
                saved_buf = self.optim_meta.get("momentum_buf")
                buf = (jax.tree.map(jnp.asarray, saved_buf)
                       if saved_buf is not None
                       else jax.tree.map(jnp.zeros_like, self.params))
            self.opt_state = optim.SGDState(
                eval_counter=jnp.asarray(
                    self.optim_meta.get("eval_counter", 0), jnp.int32
                ),
                momentum_buf=buf,
                # buf_fresh travels in the checkpoint: the zero-initialized
                # buffer is always saved, so "buffer present" alone cannot
                # distinguish a warm buffer from one saved before its first
                # momentum update — with dampening > 0 that would apply
                # (1-dampening)*g instead of g on the first resumed step
                # (reference keys freshness on buffer existence,
                # optim_sgd.lua:60-63).  Old checkpoints without the key
                # fall back to the buffer-presence rule.
                buf_fresh=jnp.asarray(bool(
                    self.optim_meta.get("buf_fresh", saved_buf is None)
                )),
            )
        self.mesh = None
        if self.cfg.num_model_shards > 1:
            from aocr.parallel import mesh as mesh_lib, tensor_parallel as tp

            nd, nm = self.cfg.num_shards, self.cfg.num_model_shards
            assert len(jax.devices()) >= nd * nm, (
                f"num_shards={nd} x num_model_shards={nm} but only "
                f"{len(jax.devices())} devices"
            )
            self.mesh = mesh_lib.make_mesh(num_data=nd, num_model=nm)
            self.params = tp.shard_params(self.params, self.mesh)
            self._train_step = tp.make_tp_train_step(self.cfg, self.mesh)
            log.info(f"DP x TP training over a {nd}x{nm} (data, model) mesh "
                     f"(GSPMD-sharded decoder/projector matmuls)")
        elif self.cfg.num_shards > 1:
            from aocr.parallel import data_parallel, mesh as mesh_lib

            n = self.cfg.num_shards
            assert len(jax.devices()) >= n, (
                f"num_shards={n} but only {len(jax.devices())} devices"
            )
            self.mesh = mesh_lib.make_mesh(num_data=n)
            self._train_step = data_parallel.make_dp_train_step(
                self.cfg, self.mesh
            )
            log.info(f"Data-parallel training over {n} devices "
                     f"(psum gradient all-reduce)")
        else:
            self._train_step = train_step.make_train_step(self.cfg)
        self._rng = jax.random.PRNGKey(self.cfg.seed)
        for k, v in sorted(asdict(self.cfg).items()):
            log.info(f"{k}: {v}")
        log.info(f"Number of parameters: {model.num_params(self.params)}")
        self.trie_table = None
        if self.cfg.use_dictionary:
            log.info(f"Load dictionary from {self.cfg.dictionary_path}")
            self.trie_table = jnp.asarray(trie_lib.load_dictionary(
                self.cfg.dictionary_path, self.cfg.allow_digit_prefix
            ))
        self._eval_step = None
        self._eval_mesh = None
        if self.mesh is not None:
            from aocr.parallel import eval_parallel, mesh as mesh_lib

            if self.cfg.num_model_shards == 1:
                self._eval_mesh = self.mesh
            else:
                # Under DP x TP, evaluation shards over a FLAT data mesh of
                # ALL nd*nm devices: decode is per-sample parallel, so
                # batch-sharding every chip beats running TP's per-step
                # collectives inside the decode loop.  The TP-sharded
                # params are regathered to the eval layout by jit at each
                # call (one ICI all-gather of the ~30M-param tree — small
                # next to a full validation batch decode).
                self._eval_mesh = mesh_lib.make_mesh(
                    num_data=self.cfg.num_shards * self.cfg.num_model_shards
                )
            self._eval_step = eval_parallel.make_dp_eval_step(
                self.cfg, self._eval_mesh,
                use_trie=self.trie_table is not None
            )
            n_eval = self._eval_mesh.shape[mesh_lib.DATA_AXIS]
            log.info(f"Sharded evaluation over {n_eval} "
                     f"devices (beam decode + gold pass per shard)")
        # Multi-host lockstep (aocr/parallel/multihost.py): fixed per-host
        # batch shapes + dummy-batch epoch drain so every process issues
        # identical collective programs.
        self._lockstep = self.cfg.multihost
        if self._lockstep:
            from aocr.parallel import multihost

            pc = jax.process_count()
            assert self.mesh is not None and self.cfg.num_shards > 1, (
                "-multihost requires -num_shards > 1 (the data mesh spans "
                "every host's chips)"
            )
            assert not self.cfg.keep_aspect_ratio, (
                "-multihost requires fixed-width batches "
                "(keep_aspect_ratio=False)"
            )
            assert not self.cfg.device_preprocess, (
                "-multihost and -device_preprocess do not compose yet "
                "(global array assembly needs host-side pixel batches)"
            )
            self.local_bs = multihost.local_batch_size(
                self.cfg.batch_size, pc
            )
            assert (self.local_bs * pc) % self.cfg.num_shards == 0, (
                f"global rows {self.local_bs * pc} not divisible by "
                f"num_shards {self.cfg.num_shards}"
            )
            # eval shards over ALL nd*nm devices (flat mesh): global rows
            # must divide that too when TP is on
            n_eval = self.cfg.num_shards * self.cfg.num_model_shards
            assert (self.local_bs * pc) % n_eval == 0, (
                f"global rows {self.local_bs * pc} not divisible by the "
                f"{n_eval}-device eval mesh (num_shards x num_model_shards)"
            )
            self._global_rows = self.local_bs * pc
            log.info(f"Multi-host lockstep: process {jax.process_index()}/"
                     f"{pc}, {self.local_bs} rows/host/step")
        else:
            self.local_bs = self.cfg.batch_size
            self._global_rows = self.local_bs
        self.visualize_file = None

    # ------------------------------------------------------------ steps

    def _images(self, batch: data.Batch):
        """Materialize the batch's pixels on device: pass-through for
        host-preprocessed batches; raw batches run the jitted
        luminance+resize program (-device_preprocess)."""
        if batch.raw is not None:
            from aocr import preprocess

            return preprocess.preprocess_varsize(
                batch.raw, batch.sizes, self.cfg.image_height, batch.out_w
            )
        return jnp.asarray(batch.images)

    def step_train(self, batch: data.Batch, lr: float, valid_rows=None,
                   all_full=None):
        """One SGD step.  Returns the token-sum NLL as a *device scalar* —
        the caller decides when to sync (the train loop pipelines one step:
        it fetches step t-1's loss while step t runs, so the device never
        idles waiting on the host).  valid_rows marks how many leading rows
        are real (lockstep dummy batches pass 0).  all_full says whether
        EVERY process's batch is full this step (None = single-process,
        decide locally): under -multihost the masked/unmasked program
        choice must be identical on every host — the two variants issue
        different collective sequences, and a host-local choice deadlocks
        or size-mismatches the pod when manifest shards are uneven
        (observed as a Gloo "received data size doesn't match" abort)."""
        self._rng, sub = jax.random.split(self._rng)
        im, tg, te = self._images(batch), batch.targets, batch.targets_eval
        if valid_rows is None:
            valid_rows = batch.rows
        if self.mesh is not None:
            from aocr.parallel import mesh as mesh_lib

            n = self.mesh.shape[mesh_lib.DATA_AXIS]
            # Lockstep: every host contributes exactly local_bs rows each
            # step; otherwise pad to the next data-axis multiple.
            want = (self.local_bs if self._lockstep
                    else im.shape[0] + (-im.shape[0]) % n)
            pad = want - im.shape[0]
            mask = (np.arange(want) < valid_rows).astype(np.float32)
            if pad:
                # partial final buckets: pad to a shardable batch with PAD
                # targets (zero-loss rows) so every device gets equal work;
                # the mask keeps them out of BN moments and the loss/grad
                # normalization count (all-reduced inside the step, so
                # multi-host epoch tails stay correct too)
                xp = jnp if isinstance(im, jax.Array) else np
                im = xp.concatenate([im, xp.repeat(im[-1:], pad, 0)], 0)
                ztg = np.full((pad, tg.shape[1]), vocab.PAD, tg.dtype)
                tg = np.concatenate([tg, ztg], 0)
                te = np.concatenate([te, ztg], 0)
            if valid_rows < want or all_full is False:
                im, tg, te, mk = mesh_lib.shard_batch(self.mesh, im, tg, te,
                                                      mask)
            else:
                # full bucket ON EVERY HOST: no mask, so the DP step runs
                # its unmasked variant (BN backward takes the sync-BN
                # custom VJP — ADVICE r4; an all-ones mask would force the
                # autodiff path every step).  all_full is False whenever
                # ANY host has a padded tail this step (lockstep callers
                # compute it from the all-gathered global row count), so
                # every host picks the same program.
                im, tg, te = mesh_lib.shard_batch(self.mesh, im, tg, te)
                mk = None
            out = self._train_step(
                self.params, self.batch_stats, self.opt_state,
                im, tg, te, jnp.asarray(lr, jnp.float32), sub,
                row_mask=mk,
            )
        elif im.shape[0] < self.cfg.batch_size:
            # Partial final buckets (epoch tails): pad rows to batch_size
            # with PAD targets (zero-loss) + a row mask (keeps BN moments
            # and the loss/grad normalization count exact) so EVERY train
            # step compiles one program per (width, T) instead of one per
            # flush size — the same treatment the mesh path above applies.
            want = self.cfg.batch_size
            pad = want - im.shape[0]
            mask = (np.arange(want) < valid_rows).astype(np.float32)
            xp = jnp if isinstance(im, jax.Array) else np
            im = xp.concatenate([im, xp.repeat(im[-1:], pad, 0)], 0)
            ztg = np.full((pad, tg.shape[1]), vocab.PAD, tg.dtype)
            tg = np.concatenate([tg, ztg], 0)
            te = np.concatenate([te, ztg], 0)
            out = self._train_step(
                self.params, self.batch_stats, self.opt_state,
                jnp.asarray(im), jnp.asarray(tg), jnp.asarray(te),
                jnp.asarray(lr, jnp.float32), sub,
                real_bs=jnp.float32(valid_rows),
                row_mask=jnp.asarray(mask),
            )
        else:
            out = self._train_step(
                self.params, self.batch_stats, self.opt_state,
                jnp.asarray(im), jnp.asarray(tg), jnp.asarray(te),
                jnp.asarray(lr, jnp.float32), sub,
            )
        self.params = out.params
        self.batch_stats = out.batch_stats
        self.opt_state = out.opt_state
        if self.cfg.log_norms:
            # reference optim_sgd.lua:49 prints per-group param/grad norms
            for i, g in enumerate(optim.GROUPS):
                if g in out.grad_norms:
                    pn = float(optim.group_norm(self.params[g]))
                    gn = float(out.grad_norms[g])
                    self.log.info(
                        f"i: {i + 1}, param norm: {pn:f}, grad norm: {gn:f}"
                    )
        return out.loss_sum

    def step_eval(self, batch: data.Batch, valid_rows=None):
        """Beam decode + gold pass.  Returns (loss_sum, accuracy, cer_sum).
        Under -num_shards the accuracy/CER are global (psum'd over the
        mesh); valid_rows marks real leading rows (lockstep dummies pass 0).
        """
        cfg = self.cfg
        B, T = batch.targets.shape[0], cfg.max_decoder_l
        if valid_rows is None:
            valid_rows = B
        # Reference pads eval targets to max_decoder_l and always decodes
        # max_decoder_l steps (model.lua:266-274).
        pad = lambda a: np.pad(a, ((0, 0), (0, T - a.shape[1])),
                               constant_values=vocab.PAD)
        targets = pad(batch.targets)
        targets_eval = pad(batch.targets_eval)
        use_trie = self.trie_table is not None
        if self._eval_step is not None:
            # Sharded eval: decode + gold pass + metrics run on every chip
            # of the data axis.  Accuracy and CER come back as two scalars
            # (the on-device canonicalizing metrics in aocr.eval); labels
            # are only fetched when the visualizer needs transcripts.
            from aocr.parallel import eval_parallel, mesh as mesh_lib

            n = self._eval_mesh.shape[mesh_lib.DATA_AXIS]
            real_b, im, tg, te = eval_parallel.pad_rows(
                n, self._images(batch), targets, targets_eval,
                total_rows=self.local_bs if self._lockstep else None,
            )
            real_b = min(real_b, valid_rows)
            mask = (np.arange(im.shape[0]) < real_b).astype(np.float32)
            im, tg, te, mk = mesh_lib.shard_batch(self._eval_mesh, im, tg,
                                                  te, mask)
            out = self._eval_step(self.params, self.batch_stats, im, tg, te,
                                  self.trie_table, mk)
            nll = float(out.nll)
            accuracy = int(out.accuracy)
            cer_sum = float(out.cer_sum)
            refills, min_valid = int(out.refills), int(out.min_valid)
            if self.visualize_file is not None:
                labels_np = np.asarray(out.labels)[:real_b]
                scores = np.asarray(out.scores)[:real_b]
                gold_scores = np.asarray(out.gold_scores)[:real_b]
                _, preds, golds = eval_lib.eval_word_err_rate(
                    labels_np, targets_eval
                )
                self._write_visualize_rows(batch.img_paths, preds, golds,
                                           scores, gold_scores)
        else:
            images = self._images(batch)
            # one jitted program for decode + gold pass: the CNN+encoder
            # forward CSEs to a single execution (train_step.eval_decode_step)
            out, nll, gold_scores = train_step.eval_decode_step(
                self.params, self.batch_stats, images,
                jnp.asarray(targets), jnp.asarray(targets_eval), cfg,
                beam_size=cfg.beam_size, max_len=T,
                trie_table=self.trie_table,
                use_trie=use_trie,
                return_refills=use_trie,
            )
            labels_np = np.asarray(out[0])
            scores = out[1]
            refills, min_valid = ((int(x) for x in out[2]) if use_trie
                                  else (0, 0))
            nll = float(nll)
            word_err, preds, golds = eval_lib.eval_word_err_rate(
                labels_np, targets_eval
            )
            accuracy = B - word_err
            # normalized edit distance (the reference's open WER TODO,
            # README.md:11).  The native and numpy paths both operate on
            # the *decoded strings* (PAD/GO stripped, truncated at EOS) so
            # the reported CER is identical whether or not the C++ library
            # is built — and identical to the sharded path's on-device
            # metric (tested in tests/test_eval_parallel.py).
            from aocr.utils import native as native_lib

            width = max(max((len(p) for p in preds), default=0),
                        max((len(g) for g in golds), default=0)) + 1
            pred_rows = vocab.encode_batch(preds, pad_to=width)[1]
            gold_rows = vocab.encode_batch(golds, pad_to=width)[1]
            dists = native_lib.edit_distance_batch(pred_rows, gold_rows,
                                                   vocab.EOS)
            if dists is None:
                dists = np.array([
                    eval_lib.levenshtein(p, g) for p, g in zip(preds, golds)
                ])
            glens = np.maximum([len(g) for g in golds], 1)
            cer_sum = float(np.minimum(1.0, dists / glens).sum())
            if self.visualize_file is not None:
                self._write_visualize_rows(batch.img_paths, preds, golds,
                                           np.asarray(scores),
                                           np.asarray(gold_scores))
        if use_trie and refills:
            # Reference logs per-row 'Warning: valid beam size: %d'
            # whenever fewer than beam_size trie continuations exist
            # (model.lua:421,480); aggregated per batch here since the
            # decode loop runs on-device.
            self.log.info(
                f"Warning: valid beam size: {min_valid} "
                f"({refills} refilled row-steps in batch)"
            )
        return nll, accuracy, cer_sum

    def _write_visualize_rows(self, paths, preds, golds, scores,
                              gold_scores) -> None:
        for i, path in enumerate(paths):
            self.visualize_file.write(
                f"{path}\t{golds[i]}\t{preds[i]}\t{scores[i]:f}"
                f"\t{gold_scores[i]:f}\n"
            )
        self.visualize_file.flush()

    # ------------------------------------------------------ batch stream

    def _dummy_batch(self) -> data.Batch:
        """All-masked filler batch: hosts whose epoch ended keep issuing
        the same collective programs until every host is done."""
        cfg = self.cfg
        B, T = self.local_bs, cfg.max_decoder_l
        im = np.zeros((B, cfg.image_height, cfg.image_width, 1), np.float32)
        tg = np.full((B, T), vocab.PAD, np.int32)
        return data.Batch(im, tg, tg.copy(), 0, ["<dummy>"] * B)

    def _batches(self, gen):
        """Yield (batch, valid_rows, global_nnz, global_rows) — prefetched;
        lockstep-synchronized across processes under -multihost."""
        it = data.prefetched(gen, self.cfg.prefetch)
        if self._lockstep:
            from aocr.parallel import multihost

            for b, real, g_nnz, g_rows in multihost.lockstep(
                    it, self._dummy_batch,
                    lambda bb: (bb.num_nonzeros, bb.rows)):
                yield b, (b.rows if real else 0), g_nnz, g_rows
        else:
            for b in it:
                yield b, b.rows, b.num_nonzeros, b.rows

    # ------------------------------------------------------- validation

    def validate(self, val_data: data.DataGen) -> tuple:
        if self._lockstep:
            return self._validate_lockstep(val_data)
        cfg = self.cfg
        self.log.info(
            f"Evaluating model on {cfg.num_batches_val} batches of validation data"
        )
        val_loss = val_nnz = val_acc = val_samples = 0
        b = 1
        empty_sweeps = 0
        while b <= cfg.num_batches_val:
            if b % 100 == 0:
                self.log.info(str(b))
            batch = val_data.next_batch(cfg.batch_size)
            if batch is None:
                val_data.shuffle()
                if math.isinf(cfg.num_batches_val):
                    break
                empty_sweeps += 1
                if empty_sweeps >= 2 and val_samples == 0:
                    self.log.info(
                        "Warning: validation data produced no batches"
                    )
                    break
                continue
            empty_sweeps = 0
            loss, acc, _cer = self.step_eval(batch)
            val_loss += loss
            val_nnz += batch.num_nonzeros
            val_acc += acc
            val_samples += batch.rows
            b += 1
        return val_loss, val_nnz, val_acc, val_samples

    def _validate_lockstep(self, val_data: data.DataGen) -> tuple:
        """Multi-host validation: one pass over the (sharded) val manifest,
        capped at num_batches_val, with lockstep dummy batches so every
        process issues identical collectives.  Counts are global."""
        cfg = self.cfg
        self.log.info(
            f"Evaluating model on {cfg.num_batches_val} batches of validation data"
        )
        val_loss = val_nnz = val_acc = val_samples = 0
        b = 0
        for batch, valid, g_nnz, g_rows in self._batches(
                val_data.epoch(self.local_bs)):
            if b >= cfg.num_batches_val:
                break  # b advances in lockstep: every host breaks together
            loss, acc, _cer = self.step_eval(batch, valid)
            val_loss += loss  # psum'd: identical on every host
            val_nnz += g_nnz
            val_acc += acc
            val_samples += g_rows
            b += 1
        return val_loss, val_nnz, val_acc, val_samples

    def _save(self) -> None:
        if jax.process_index() != 0:
            # Multi-host: params are replicated across processes; only
            # process 0 writes (every host writing would race on shared
            # filesystems and waste IO).
            return
        if isinstance(self.opt_state, optim.SGDState):
            self.optim_meta["eval_counter"] = int(self.opt_state.eval_counter)
            if self.opt_state.momentum_buf is not None:
                self.optim_meta["momentum_buf"] = self.opt_state.momentum_buf
                self.optim_meta["buf_fresh"] = bool(
                    np.asarray(self.opt_state.buf_fresh)
                )
        elif isinstance(self.opt_state, optim.AdadeltaState):
            self.optim_meta["adadelta"] = {
                "acc_grad": self.opt_state.acc_grad,
                "acc_delta": self.opt_state.acc_delta,
            }
        path = checkpoint.save(
            self.cfg.model_dir,
            self.params,
            self.batch_stats,
            asdict(self.cfg),
            self.global_step,
            self.optim_meta,
        )
        self.log.info(f"Model saved to {path}")

    # ------------------------------------------------------------ loops

    def run_train(self, train_data: data.DataGen, val_data: data.DataGen):
        cfg, log = self.cfg, self.log
        sched = ValDrivenLR(
            self.optim_meta.get("learning_rate", cfg.learning_rate),
            cfg.learning_rate_min, cfg.lr_decay,
        )
        self.optim_meta["learning_rate"] = sched.lr
        log.info(f"Lr: {sched.lr:f}")
        loss = num_nonzeros = 0

        def decay_lr(val_loss):
            if sched.update(val_loss):
                self.optim_meta["learning_rate"] = sched.lr
                log.info(f"Decay lr, current Lr: {sched.lr:f}")

        import os
        import time as _time

        profiling = False
        profile_started_at = None
        steps_in_window = 0
        window_t0 = _time.perf_counter()
        window_images = 0
        # One-deep pipeline of in-flight (device-scalar loss, num_nonzeros):
        # the per-step perplexity log uses sums through step t-1, exactly the
        # reference's pre-update logging (train.lua:103), while step t's
        # device work overlaps the host fetch.
        inflight = []

        def drain(limit=0):
            nonlocal loss, num_nonzeros
            while len(inflight) > limit:
                dev_loss, nnz = inflight.pop(0)
                loss += float(dev_loss)
                num_nonzeros += nnz

        for epoch in range(1, cfg.num_epochs + 1):
            train_data.shuffle()
            for batch, valid, g_nnz, g_rows in self._batches(
                    train_data.epoch(self.local_bs)):
                if cfg.profile and not profiling and profile_started_at is None:
                    trace_dir = os.path.join(cfg.output_dir, "profile")
                    os.makedirs(trace_dir, exist_ok=True)
                    jax.profiler.start_trace(trace_dir)
                    profiling = True
                    profile_started_at = self.global_step
                    log.info(f"Profiler trace started -> {trace_dir}")
                step_loss = self.step_train(
                    batch, sched.lr, valid,
                    all_full=(g_rows == self._global_rows
                              if self._lockstep else None))
                inflight.append((step_loss, g_nnz))
                steps_in_window += 1
                window_images += g_rows
                if (profiling
                        and self.global_step - profile_started_at
                        >= cfg.profile_steps):
                    jax.profiler.stop_trace()
                    profiling = False
                    log.info("Profiler trace stopped")
                # Running perplexity from pre-update sums (reference
                # train.lua:103 logs before accumulating): drain first so
                # the sums cover steps 1..t-1, keeping exactly one step in
                # flight.
                drain(limit=1)
                ppl = (math.exp(min(loss / num_nonzeros, 700))
                       if num_nonzeros else float("nan"))
                log.info(f"{ppl:f}")
                self.global_step += 1
                if self.global_step % cfg.steps_per_checkpoint == 0:
                    drain()
                    ppl = (math.exp(min(loss / num_nonzeros, 700))
                           if num_nonzeros else float("nan"))
                    dt = _time.perf_counter() - window_t0
                    log.info(
                        f"Throughput: {steps_in_window / dt:.2f} steps/s, "
                        f"{window_images / dt:.0f} images/s"
                    )
                    steps_in_window = 0
                    window_images = 0
                    log.info(f"Step {self.global_step} - training perplexity = {ppl:f}")
                    log.info("Saving model")
                    self._save()
                    loss = num_nonzeros = 0
                    val_loss, val_nnz, val_acc, val_n = self.validate(val_data)
                    log.info(
                        f"Step {self.global_step} - Val Accuracy = "
                        f"{val_acc / max(val_n, 1):f}, loss = "
                        f"{math.exp(min(val_loss / max(val_nnz, 1), 700)):f}"
                    )
                    decay_lr(val_loss)
                    # Reset the window AFTER save+validate so the next
                    # throughput line measures training steps only, not
                    # the checkpoint write and validation sweep.
                    window_t0 = _time.perf_counter()
            drain()
            self._save()
            val_loss, val_nnz, val_acc, val_n = self.validate(val_data)
            log.info(
                f"Epoch: {epoch}, Step {self.global_step} - Val Accuracy = "
                f"{val_acc / max(val_n, 1):f}, loss = "
                f"{math.exp(min(val_loss / max(val_nnz, 1), 700)):f}"
            )
            decay_lr(val_loss)
        if profiling:
            jax.profiler.stop_trace()
            log.info("Profiler trace stopped (end of training)")

    def run_test(self, test_data: data.DataGen):
        cfg, log = self.cfg, self.log
        if cfg.visualize:
            import os

            os.makedirs(cfg.output_dir, exist_ok=True)
            self.visualize_file = open(
                os.path.join(cfg.output_dir, "results.txt"), "w"
            )
        num_samples = accuracy = 0
        cer = 0.0
        self.global_step = 0
        for batch, valid, _g_nnz, g_rows in self._batches(
                test_data.epoch(self.local_bs)):
            _, acc, cer_sum = self.step_eval(batch, valid)
            accuracy += acc
            cer += cer_sum
            num_samples += g_rows
            self.global_step += 1
            if self.global_step % cfg.steps_per_checkpoint == 0:
                log.info(
                    f"Number of samples {num_samples} - Accuracy = "
                    f"{accuracy / num_samples:f}"
                )
        log.info(
            f"Epoch: 1 Number of samples {num_samples} - Accuracy = "
            f"{accuracy / max(num_samples, 1):f}"
        )
        # Edit-distance metric closing the reference's open TODO (README.md:11)
        log.info(
            f"Character error rate (normalized edit distance) = "
            f"{cer / max(num_samples, 1):f}"
        )
        if self.visualize_file is not None:
            self.visualize_file.close()
            self.visualize_file = None
        return accuracy / max(num_samples, 1)


def main(argv=None) -> None:
    cfg = parse_args(argv)
    if cfg.multihost:
        # Must run before any other JAX backend use.  On a TPU pod the
        # coordinator/process id/count are env-configured.
        from aocr.parallel import multihost

        try:
            multihost.initialize()
        except RuntimeError as e:
            # already initialized (e.g. driver harness did it) — proceed
            print(f"multihost.initialize skipped: {e}", file=sys.stderr)
        assert not cfg.visualize, (
            "-visualize is per-host; run -phase test -visualize "
            "single-process on the published checkpoint instead"
        )
    log = Logger(cfg.log_path)
    log.info("Command Line Arguments:")
    log.info(" ".join(argv if argv is not None else sys.argv[1:]))
    log.info("End Command Line Arguments")
    log.info(f"JAX devices: {jax.devices()}")

    log.info("Building model")
    trainer = Trainer(cfg, log)
    cfg = trainer.cfg

    log.info(f"Data base dir {cfg.data_base_dir}")
    log.info(f"Load training data from {cfg.data_path}")
    train_data = data.DataGen(cfg.data_base_dir, cfg.data_path, cfg,
                              log=log.info)
    log.info(f"Training data loaded from {cfg.data_path}")
    if jax.process_count() > 1:
        train_data.shard(jax.process_index(), jax.process_count())
        log.info(f"Manifest sharded: {train_data.size()} rows on process "
                 f"{jax.process_index()}")
    if cfg.phase == "train":
        log.info(f"Load validation data from {cfg.val_data_path}")
        val_data = data.DataGen(cfg.data_base_dir, cfg.val_data_path, cfg,
                                log=log.info)
        log.info(f"Validation data loaded from {cfg.val_data_path}")
        if jax.process_count() > 1:
            val_data.shard(jax.process_index(), jax.process_count())
        trainer.run_train(train_data, val_data)
    else:
        trainer.run_test(train_data)
    log.shutdown()


if __name__ == "__main__":
    main()
