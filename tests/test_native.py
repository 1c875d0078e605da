"""Native (C++) kernels vs the numpy reference paths.

The library builds with `make -C native`; tests auto-build it if the
toolchain is present and skip otherwise.
"""

import os
import subprocess

import numpy as np
import pytest

from aocr import data, vocab
from aocr import eval as eval_lib
from aocr.utils import native

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_native():
    so = os.path.join(ROOT, "native", "libaocr_native.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.join(ROOT, "native")],
                           check=True, capture_output=True)
        except Exception:
            pytest.skip("no C++ toolchain available")
    # reset the lazy loader in case an earlier test ran without the lib
    native._TRIED = False
    native._LIB = None
    if not native.available():
        pytest.skip("native library failed to load")


def test_luminance_resize_matches_numpy(np_rng):
    for (h, w, c) in [(48, 160, 3), (32, 100, 1), (17, 333, 3), (64, 64, 4)]:
        img = np_rng.uniform(0, 255, (h, w, c)).astype(np.float32)
        out = native.luminance_resize(img, 32, 100)
        lum = data._rgb_to_luminance(img) if c >= 3 else img[..., 0]
        ref = data._bilinear_resize(np.ascontiguousarray(lum), 32, 100)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-2)


def test_luminance_resize_gray_2d(np_rng):
    img = np_rng.uniform(0, 255, (48, 200)).astype(np.float32)
    out = native.luminance_resize(img, 32, 100)
    ref = data._bilinear_resize(img, 32, 100)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-2)


def _seq(s, width):
    ids = [vocab.char_to_id(ch) for ch in s] + [vocab.EOS]
    ids += [vocab.PAD] * (width - len(ids))
    return ids[:width]


def test_edit_distance_matches_host(np_rng):
    pairs = [("kitten", "sitting"), ("", ""), ("abc", ""), ("flaw", "lawn"),
             ("same", "same")]
    width = 10
    pred = np.array([_seq(a, width) for a, _ in pairs], np.int32)
    gold = np.array([_seq(b, width) for _, b in pairs], np.int32)
    out = native.edit_distance_batch(pred, gold, vocab.EOS)
    expected = [eval_lib.levenshtein(a, b) for a, b in pairs]
    assert list(out) == expected


def test_data_pipeline_uses_native(tmp_path, np_rng):
    """load_and_preprocess should produce identical output whether or not
    the native path is active."""
    from aocr.config import Config

    img = np_rng.uniform(0, 255, (48, 160, 3)).astype(np.float32) / 255.0
    from PIL import Image

    p = tmp_path / "x.png"
    Image.fromarray((img * 255).astype(np.uint8)).save(p)
    cfg = Config()
    with_native = data.load_and_preprocess(str(p), cfg)
    lib, native._LIB = native._LIB, None
    try:
        without = data.load_and_preprocess(str(p), cfg)
    finally:
        native._LIB = lib
    np.testing.assert_allclose(with_native, without, rtol=1e-4, atol=0.05)
