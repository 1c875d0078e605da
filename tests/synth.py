"""Synthetic word-image dataset for tests and benchmarks.

Renders a deterministic, learnable image per label: each character paints a
distinctive striped band (intensity keyed to the character id and stripe
phase keyed to position), so a CNN + attention decoder can overfit the
mapping quickly.  Images are written as .npy (decoded by aocr.data) next to
a reference-format `path label` manifest.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np

from aocr import vocab


def render_word(label: str, height: int = 32, width: int = 100) -> np.ndarray:
    """(height, width) float32 image in [0, 255] encoding the label."""
    img = np.full((height, width), 255.0, np.float32)
    n = len(label)
    if n == 0:
        return img
    band_w = max(width // max(n, 1), 1)
    ys = np.arange(height)[:, None]
    for i, ch in enumerate(label):
        cid = vocab.char_to_id(ch)
        x0, x1 = i * band_w, min((i + 1) * band_w, width)
        xs = np.arange(x0, x1)[None, :]
        # stripes whose period and phase depend on the character id
        period = 2 + (cid % 7)
        pattern = ((ys + xs * (1 + cid % 3)) // period) % 2
        img[:, x0:x1] = np.where(pattern, 255.0 - cid * 6.0, cid * 5.0)
    return img


def make_dataset(
    tmpdir: str,
    labels: Sequence[str],
    manifest_name: str = "train.txt",
    height: int = 32,
    width: int = 100,
) -> Tuple[str, List[str]]:
    """Write .npy images + manifest into tmpdir.  Returns (manifest, paths)."""
    os.makedirs(os.path.join(tmpdir, "images"), exist_ok=True)
    paths = []
    lines = []
    for i, label in enumerate(labels):
        rel = f"images/{i:04d}_{label}.npy"
        np.save(os.path.join(tmpdir, rel), render_word(label, height, width))
        paths.append(rel)
        lines.append(f"{rel} {label}")
    manifest = os.path.join(tmpdir, manifest_name)
    with open(manifest, "w") as f:
        f.write("\n".join(lines) + "\n")
    return manifest, paths
