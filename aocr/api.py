"""High-level inference/training API.

The reference exposes only the train.lua CLI; this module adds the library
equivalent so the framework is usable without the CLI:

    ocr = AttentionOCR.load("train/")          # from a checkpoint dir
    words, scores = ocr.recognize(images)       # (B, 32, W, 1) or paths
    words, scores = ocr.recognize(paths, beam_size=5)

Decoding is the same fully on-device greedy/beam machinery as the CLI
(aocr.decode); image paths go through the same decode/resize pipeline as
training (aocr.data).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from aocr import checkpoint, data, decode, vocab
from aocr.config import Config, config_from_dict
from aocr.models import model as model_lib
from aocr.utils import trie as trie_lib


class AttentionOCR:
    """A loaded (or freshly initialized) attention-OCR model."""

    def __init__(self, cfg: Config, params: dict, batch_stats: dict,
                 global_step: int = 0):
        self.cfg = cfg.validate()
        self.params = params
        self.batch_stats = batch_stats
        self.global_step = global_step
        self._trie = None

    # ------------------------------------------------------- constructors

    @classmethod
    def create(cls, cfg: Optional[Config] = None, seed: Optional[int] = None
               ) -> "AttentionOCR":
        cfg = cfg or Config(input_feed=True)
        ms = model_lib.init(
            jax.random.PRNGKey(cfg.seed if seed is None else seed), cfg
        )
        return cls(cfg, ms.params, ms.batch_stats)

    @classmethod
    def load(cls, model_dir_or_path: str,
             cfg: Optional[Config] = None,
             allow_pickle: bool = False) -> "AttentionOCR":
        """Load from a checkpoint file or a model dir's final-model.
        allow_pickle opts into legacy v1 pickle checkpoints (which execute
        code on load — only for files you wrote yourself)."""
        import os

        path = model_dir_or_path
        if os.path.isdir(path):
            path = checkpoint.final_path(path)
        ckpt = checkpoint.load(path, allow_pickle=allow_pickle)
        saved_cfg = config_from_dict(ckpt["config"])
        if cfg is not None:
            # structure comes from the checkpoint; runtime knobs from cfg
            saved_cfg = saved_cfg.replace(
                beam_size=cfg.beam_size,
                max_decoder_l=cfg.max_decoder_l,
                compute_dtype=cfg.compute_dtype,
                use_pallas=cfg.use_pallas,
            )
        return cls(
            saved_cfg,
            jax.tree.map(jnp.asarray, ckpt["params"]),
            jax.tree.map(jnp.asarray, ckpt["batch_stats"]),
            ckpt["global_step"],
        )

    # --------------------------------------------------------- inference

    def use_dictionary(self, words: Sequence[str],
                       allow_digit_prefix: bool = False) -> None:
        """Constrain decoding to a word list (trie transition table)."""
        self._trie = jnp.asarray(
            trie_lib.build_transition_table(words, allow_digit_prefix)
        )

    def _prepare(self, images) -> jnp.ndarray:
        if isinstance(images, (list, tuple)) and images and isinstance(
                images[0], str):
            arrs = []
            for p in images:
                img = data.load_and_preprocess(p, self.cfg)
                if img is None:
                    raise ValueError(f"cannot decode image {p}")
                arrs.append(img)
            widths = {a.shape[1] for a in arrs}
            assert len(widths) == 1, (
                "mixed widths in one recognize() call; batch by width "
                f"(got {sorted(widths)})"
            )
            images = np.stack(arrs)[..., None]
        images = np.asarray(images, np.float32)
        if images.ndim == 3:
            images = images[..., None]
        return jnp.asarray(images)

    def recognize(
        self,
        images: Union[np.ndarray, Sequence[str]],
        beam_size: Optional[int] = None,
        max_len: Optional[int] = None,
    ) -> Tuple[List[str], np.ndarray]:
        """Decode a batch.  Returns (transcripts, log-prob scores)."""
        x = self._prepare(images)
        labels, scores = decode.beam_decode(
            self.params, self.batch_stats, x, self.cfg,
            beam_size=beam_size or self.cfg.beam_size,
            max_len=max_len or self.cfg.max_decoder_l,
            trie_table=self._trie,
            use_trie=self._trie is not None,
        )
        return ([vocab.decode(r) for r in np.asarray(labels)],
                np.asarray(scores))

    def score(self, images, transcripts: Sequence[str]) -> np.ndarray:
        """Per-sample gold log-prob of given transcripts (teacher-forced)."""
        from aocr import train_step

        x = self._prepare(images)
        targets, targets_eval, _ = vocab.encode_batch(list(transcripts))
        _, gold = train_step.eval_loss_step(
            self.params, self.batch_stats, x,
            jnp.asarray(targets), jnp.asarray(targets_eval), self.cfg,
        )
        return np.asarray(gold)

    def save(self, model_dir: str) -> str:
        from dataclasses import asdict

        return checkpoint.save(
            model_dir, self.params, self.batch_stats, asdict(self.cfg),
            self.global_step, {"learning_rate": self.cfg.learning_rate},
        )
