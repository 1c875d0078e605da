"""Font-glyph synthetic renderer (tests/synth.render_word_font).

The stripe renderer encodes the character id positionally — an easier task
than real text — so quality evidence also runs on PIL-rendered DejaVu
glyphs, the same domain as the reference's Synth90k word crops
(src/data/data_gen.lua:67-79 decodes/squashes real text renders).
"""

import numpy as np
import pytest

from tests import synth


def test_deterministic_without_rng():
    a = synth.render_word_font("hello42")
    b = synth.render_word_font("hello42")
    assert a.shape == (32, 100) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)


def test_distinct_labels_distinct_images():
    a = synth.render_word_font("abc")
    b = synth.render_word_font("abd")
    assert np.abs(a - b).max() > 50  # glyph difference, not noise


def test_rng_varies_font_and_levels():
    rng = np.random.RandomState(0)
    imgs = [synth.render_word_font("word", rng=rng) for _ in range(8)]
    diffs = [np.abs(imgs[0] - im).mean() for im in imgs[1:]]
    assert max(diffs) > 5.0  # at least one render used another font/size


def test_value_range_and_polarity():
    img = synth.render_word_font("gy19")  # descenders + digits
    assert img.min() >= 0.0 and img.max() <= 255.0
    # dark ink on light background: background (corner) lighter than ink
    assert img[0, 0] > 150
    assert img.min() < 80


def test_blur_distortion_keeps_glyphs_distinct():
    # the stripe renderer collapses under 3x3 blur (docs/performance.md);
    # font glyphs must stay separable
    rng = np.random.RandomState(1)
    a = synth.distort(synth.render_word_font("abc"), rng, blur=True)
    b = synth.distort(synth.render_word_font("abd"), rng, blur=True)
    assert np.abs(a - b).max() > 40


def test_natural_width_monotone_and_clamped():
    w1 = synth.natural_font_width("a")
    w2 = synth.natural_font_width("hello")
    w3 = synth.natural_font_width("a" * 40)  # clamp at aspect 10 -> 320
    assert w1 < w2 <= w3 == 320


def test_make_dataset_font_mode(tmp_path):
    rng = np.random.RandomState(0)
    manifest, paths = synth.make_dataset(
        str(tmp_path), ["ab", "cd"], mode="font", render_rng=rng,
        copies=2, distort_rng=np.random.RandomState(1))
    assert len(paths) == 4
    with open(manifest) as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == 4 and lines[0].endswith(" ab")
    import os

    img = np.load(os.path.join(str(tmp_path), paths[0]))
    assert img.shape == (32, 100)


@pytest.mark.parametrize("mode", ["stripes", "font"])
def test_loadable_through_data_pipeline(tmp_path, mode):
    from aocr import data
    from aocr.config import Config

    manifest, _ = synth.make_dataset(
        str(tmp_path), ["ab1", "xyz"], mode=mode,
        render_rng=np.random.RandomState(0) if mode == "font" else None)
    cfg = Config(data_base_dir=str(tmp_path), data_path=manifest).validate()
    gen = data.DataGen(str(tmp_path), manifest, cfg)
    batch = gen.next_batch(2)
    assert batch is not None
    assert batch.images.shape[1:] == (32, 100, 1)
