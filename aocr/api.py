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
from aocr.config import Config
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
        self._mesh = None
        self._dp_steps: dict = {}

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
        # Structure hyperparameters always come from the checkpoint;
        # sequence bounds / image geometry come from the checkpoint unless
        # the caller's cfg overrides them — changed from the defaults, or
        # explicitly marked via cfg.with_explicit_geometry(...) so even a
        # default-valued override wins (reference model.lua:75-77 CLI
        # semantics); runtime perf knobs (dtype, kernels, beam size,
        # batching) come from the caller or current defaults — so e.g. an
        # old checkpoint cannot pin a stale use_pallas=False.
        from aocr.config import GEOMETRY_FIELDS as geometry
        from aocr.config import STRUCT_FIELDS as _STRUCT_FIELDS

        saved = ckpt["config"]
        base = cfg if cfg is not None else Config()
        overrides = base.geometry_overrides()
        fields = list(_STRUCT_FIELDS) + [
            k for k in geometry if k not in overrides
        ]
        saved_cfg = base.replace(
            **{k: saved[k] for k in fields if k in saved}
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
        """Constrain decoding to a word list (trie transition table).
        For a word-list FILE prefer set_dictionary_table(
        trie.load_dictionary(path)), which caches the built DAWG on disk
        (~15 s builds at Synth90k scale become instant warm loads)."""
        self.set_dictionary_table(
            trie_lib.build_transition_table(words, allow_digit_prefix))

    def set_dictionary_table(self, table) -> None:
        """Constrain decoding to a prebuilt (nodes, V) trie transition
        table (utils.trie.build_transition_table / load_dictionary)."""
        self._trie = jnp.asarray(np.asarray(table))
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._trie = jax.device_put(
                self._trie, NamedSharding(self._mesh, PartitionSpec()))

    def clear_dictionary(self) -> None:
        """Drop the dictionary constraint set by use_dictionary()."""
        self._trie = None

    @property
    def dictionary_table(self):
        """The active trie transition table (None when unconstrained)."""
        return self._trie

    def shard(self, num_shards: Optional[int] = None,
              devices: Optional[Sequence] = None) -> "AttentionOCR":
        """Shard recognize() batches across a device mesh (data parallel).

        Params replicate; each device decodes its batch slice through the
        same fused kernels with no cross-device communication (beam state
        is per-sample), so inference throughput scales linearly with
        chips.  Batches whose row count is not divisible by the shard
        count are padded by repeating the last row (sliced off after the
        fetch).  `num_shards=None` uses all local devices; `shard(1)` or
        `unshard()` restores single-device dispatch.

        Only recognize() runs sharded.  Other entry points (score(),
        custom jit over .params) still work but execute fully REPLICATED
        on every mesh device — N x redundant compute; unshard() first if
        you need them at speed.
        """
        from aocr.parallel import mesh as mesh_lib

        if num_shards is not None and num_shards < 1:
            raise ValueError(f"num_shards must be >= 1, got {num_shards}")
        if devices is not None and len(devices) == 0:
            raise ValueError("devices must be non-empty")
        if jax.process_count() > 1:
            # shard_batch would switch to the multi-host lockstep path
            # (make_array_from_process_local_data), which independent
            # per-host inference traffic cannot satisfy — each host of a
            # pod should serve its own local mesh instead.
            raise ValueError(
                "AttentionOCR.shard() is single-process; on a multi-host "
                "pod run one server per host over its local devices")
        if num_shards == 1 and devices is None:
            return self.unshard()
        self._mesh = mesh_lib.make_mesh(num_data=num_shards, num_model=1,
                                        devices=devices)
        self._dp_steps = {}
        # Replicate the weights onto the mesh ONCE: leaving them committed
        # to a single device would make every jitted call re-broadcast the
        # whole param tree before decoding.
        self._replicate_weights()
        return self

    def _replicate_weights(self) -> None:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(self._mesh, PartitionSpec())
        self.params = jax.device_put(self.params, rep)
        self.batch_stats = jax.device_put(self.batch_stats, rep)
        if self._trie is not None:
            self._trie = jax.device_put(self._trie, rep)

    @property
    def num_shards(self) -> int:
        """Data-mesh width recognize() currently shards over (1 = single
        device)."""
        if self._mesh is None:
            return 1
        from aocr.parallel.mesh import DATA_AXIS

        return self._mesh.shape[DATA_AXIS]

    def unshard(self) -> "AttentionOCR":
        if self._mesh is not None:
            # hop the weights back to the default device so the
            # single-device jit path doesn't inherit 8-device arrays
            dev = jax.devices()[0]
            self.params = jax.device_put(self.params, dev)
            self.batch_stats = jax.device_put(self.batch_stats, dev)
            if self._trie is not None:
                self._trie = jax.device_put(self._trie, dev)
        self._mesh = None
        self._dp_steps = {}
        return self

    def _dp_step(self, beam_size: int, max_len: int):
        from aocr.parallel import eval_parallel

        # key on the clamped K: over-vocab beam sizes compile to the same
        # program, so they must share one cache entry
        beam_size = min(beam_size, self.cfg.target_vocab_size)
        key = (beam_size, max_len, self._trie is not None)
        step = self._dp_steps.get(key)
        if step is None:
            step = eval_parallel.make_dp_decode_step(
                self.cfg, self._mesh, use_trie=self._trie is not None,
                beam_size=beam_size, max_len=max_len)
            self._dp_steps[key] = step
        return step

    def _prepare_groups(self, images) -> List[Tuple[List[int], jnp.ndarray]]:
        """Normalize any accepted input into width-homogeneous device
        batches: [(original indices, (b, 32, W, 1) array), ...].

        Accepts a stacked (B, H, W[, 1]) array, a list of image paths, or a
        list of (H, W[, 1]) arrays — paths/arrays may mix widths; they are
        bucketed by width internally (the CLI's DataGen does the same,
        reference data_gen.lua:92-121) and results are returned in input
        order.
        """
        if isinstance(images, np.ndarray) or hasattr(images, "ndim"):
            images = np.asarray(images, np.float32)
            if images.ndim == 3:
                images = images[..., None]
            assert images.ndim == 4, f"bad image batch shape {images.shape}"
            return [(list(range(images.shape[0])), jnp.asarray(images))]
        if isinstance(images, str):
            images = [images]  # a bare path is one image
        if self.cfg.device_preprocess and images and isinstance(
                images[0], str):
            # serving fast path: host decodes bytes only; luminance +
            # resize run jitted on device (aocr.preprocess)
            from aocr import preprocess

            raws, widths = [], []
            for item in images:
                r = data.load_raw(item, self.cfg)
                if r is None:
                    raise ValueError(f"cannot decode image {item}")
                raws.append(r[0])
                widths.append(r[1])
            by_width: dict = {}
            for i, w in enumerate(widths):
                by_width.setdefault(w, []).append(i)
            groups = []
            for w, idx in sorted(by_width.items()):
                buf, sizes = data.pack_raw([raws[i] for i in idx])
                groups.append((idx, preprocess.preprocess_varsize(
                    buf, sizes, self.cfg.image_height, w)))
            return groups
        # shared accepted-inputs contract (mixed paths/arrays/widths) —
        # the same normalization the .aocrx loader uses (data.py)
        arrs = data.images_to_arrays(images, self.cfg)
        by_width: dict = {}
        for i, a in enumerate(arrs):
            by_width.setdefault(a.shape[1], []).append(i)
        groups = []
        for w, idx in sorted(by_width.items()):
            batch = np.stack([arrs[i] for i in idx])
            groups.append((idx, jnp.asarray(batch)))
        return groups

    def recognize(
        self,
        images: Union[np.ndarray, Sequence[str], Sequence[np.ndarray]],
        beam_size: Optional[int] = None,
        max_len: Optional[int] = None,
    ) -> Tuple[List[str], np.ndarray]:
        """Decode a batch (stacked array, paths, or per-image arrays; widths
        may mix).  Returns (transcripts, log-prob scores) in input order."""
        groups = self._prepare_groups(images)
        n = sum(len(idx) for idx, _ in groups)
        words: List[Optional[str]] = [None] * n
        scores = np.empty((n,), np.float32)
        K = beam_size or self.cfg.beam_size
        T = max_len or self.cfg.max_decoder_l
        for idx, x in groups:
            if self._mesh is not None:
                from aocr.parallel import eval_parallel
                from aocr.parallel import mesh as mesh_lib
                from aocr.parallel.mesh import DATA_AXIS

                n_sh = self._mesh.shape[DATA_AXIS]
                real, xp = eval_parallel.pad_rows(n_sh, x)
                xp = mesh_lib.shard_batch(self._mesh, xp)
                labels, sc = self._dp_step(K, T)(
                    self.params, self.batch_stats, xp, self._trie)
                labels = np.asarray(labels)[:real]
                sc = np.asarray(sc)[:real]
            else:
                labels, sc = decode.beam_decode(
                    self.params, self.batch_stats, x, self.cfg,
                    beam_size=K, max_len=T,
                    trie_table=self._trie,
                    use_trie=self._trie is not None,
                )
                labels, sc = np.asarray(labels), np.asarray(sc)
            for j, i in enumerate(idx):
                words[i] = vocab.decode(labels[j])
                scores[i] = sc[j]
        return words, scores

    def score(self, images, transcripts: Sequence[str]) -> np.ndarray:
        """Per-sample gold log-prob of given transcripts (teacher-forced)."""
        from aocr import train_step

        transcripts = list(transcripts)
        groups = self._prepare_groups(images)
        n = sum(len(idx) for idx, _ in groups)
        assert n == len(transcripts), (
            f"{n} images but {len(transcripts)} transcripts"
        )
        out = np.empty((n,), np.float32)
        for idx, x in groups:
            targets, targets_eval, _ = vocab.encode_batch(
                [transcripts[i] for i in idx]
            )
            _, gold = train_step.eval_loss_step(
                self.params, self.batch_stats, x,
                jnp.asarray(targets), jnp.asarray(targets_eval), self.cfg,
            )
            out[idx] = np.asarray(gold, np.float32)
        return out

    def save(self, model_dir: str) -> str:
        from dataclasses import asdict

        return checkpoint.save(
            model_dir, self.params, self.batch_stats, asdict(self.cfg),
            self.global_step, {"learning_rate": self.cfg.learning_rate},
        )
