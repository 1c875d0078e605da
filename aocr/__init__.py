"""tpu-attention-ocr: a TPU-native JAX framework for attention-based OCR.

Built from scratch with the capabilities of the Lua/Torch7 reference
da03/torch-Attention-OCR (see SURVEY.md): a CNN feature extractor over
32-px-tall word crops, a bidirectional LSTM encoder over width-wise feature
columns, and an input-feeding attention LSTM decoder, trained with SGD +
validation-driven LR decay and evaluated with batched (optionally
trie-constrained) beam search.

TPU-first design: XLA convolutions in NHWC, `lax.scan` recurrences with
hoisted input projections (one big MXU matmul instead of per-step small ones),
fully on-device greedy/beam decoding, `jax.sharding` data parallelism over an
ICI mesh (plus GSPMD tensor parallelism, sharded evaluation, and
multi-host lockstep training), and a Pallas-fused greedy decode tail
(attention + projector + argmax in one kernel, default on TPU).
Reference Torch7 checkpoints import via `aocr.torch_import` /
tools/import_torch.py.
"""

__version__ = "0.3.0"

import os as _os

if _os.environ.get("JAX_PLATFORM_NAME", "").lower() == "cpu":
    # Honor CPU forcing *strictly*: JAX_PLATFORM_NAME=cpu selects the default
    # backend but still initializes every registered PJRT plugin, so on this
    # stack a dead TPU tunnel blocks even pure-CPU runs (and the axon plugin
    # ignores the JAX_PLATFORMS env var).  jax_platforms, set before backend
    # discovery, keeps the plugin from being touched at all — the same trick
    # tests/conftest.py uses.  No-op unless the env var is explicitly "cpu".
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from aocr.config import Config  # noqa: F401


def __getattr__(name):
    # Lazy: importing AttentionOCR pulls in jax/model code, which top-level
    # `import aocr` users (e.g. the config-only CLI parse path) shouldn't pay.
    if name == "AttentionOCR":
        from aocr.api import AttentionOCR

        return AttentionOCR
    if name == "ExportedRecognizer":
        from aocr.export import ExportedRecognizer

        return ExportedRecognizer
    raise AttributeError(f"module 'aocr' has no attribute {name!r}")
