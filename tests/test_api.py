import numpy as np
import pytest

from aocr.api import AttentionOCR
from aocr.config import Config
from tests import synth

CFG = Config(input_feed=True, encoder_num_hidden=32,
             target_embedding_size=8, max_decoder_l=8, image_width=32)


@pytest.fixture(scope="module")
def ocr():
    return AttentionOCR.create(CFG)


def test_recognize_arrays(ocr):
    imgs = np.stack([synth.render_word(w, 32, 32) for w in ["ab", "cd"]])
    words, scores = ocr.recognize(imgs)
    assert len(words) == 2 and scores.shape == (2,)
    assert all(isinstance(w, str) for w in words)


def test_recognize_paths(ocr, tmp_path):
    _, paths = synth.make_dataset(str(tmp_path), ["ab", "cd"], width=32)
    full = [str(tmp_path / p) for p in paths]
    words, scores = ocr.recognize(full, beam_size=2)
    assert len(words) == 2


def test_score(ocr):
    imgs = np.stack([synth.render_word(w, 32, 32) for w in ["ab", "cd"]])
    gold = ocr.score(imgs, ["ab", "cd"])
    assert gold.shape == (2,) and (gold <= 0).all()


def test_save_load_roundtrip(ocr, tmp_path):
    ocr.save(str(tmp_path))
    loaded = AttentionOCR.load(str(tmp_path))
    assert loaded.cfg.encoder_num_hidden == 32
    imgs = np.stack([synth.render_word("ab", 32, 32)])
    w1, s1 = ocr.recognize(imgs)
    w2, s2 = loaded.recognize(imgs)
    assert w1 == w2
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_load_preserves_geometry_and_variant(tmp_path):
    """load() with a cfg override must keep the checkpoint's image geometry
    (changing e.g. beam_size must not reset image_width to the default),
    and structure-changing flags like simple_attention must be restored —
    both silently produced garbage transcripts before."""
    cfg = CFG.replace(image_width=48, keep_aspect_ratio=True,
                      simple_attention=True)
    ocr = AttentionOCR.create(cfg)
    ocr.save(str(tmp_path))
    loaded = AttentionOCR.load(str(tmp_path), cfg=Config(beam_size=5))
    assert loaded.cfg.image_width == 48
    assert loaded.cfg.keep_aspect_ratio is True
    assert loaded.cfg.simple_attention is True
    assert loaded.cfg.beam_size == 5
    # an explicit geometry override still wins
    loaded2 = AttentionOCR.load(str(tmp_path), cfg=Config(image_width=64))
    assert loaded2.cfg.image_width == 64
    # ... even when the override IS the default value, if explicitly marked
    # (the previously-undetectable case: Config(image_width=100) on a
    # checkpoint trained at another width)
    loaded3 = AttentionOCR.load(
        str(tmp_path),
        cfg=Config(image_width=100).with_explicit_geometry("image_width"),
    )
    assert loaded3.cfg.image_width == 100


def test_dictionary_constraint(ocr):
    imgs = np.stack([synth.render_word("ab", 32, 32)])
    ocr.use_dictionary(["zz"])
    try:
        words, _ = ocr.recognize(imgs, beam_size=2)
        assert words[0] in ("zz", "z", "")
    finally:
        ocr._trie = None


def test_mixed_width_paths_bucketed(ocr, tmp_path):
    """recognize() buckets mixed widths internally (one decode per width)
    and returns results in input order — the CLI DataGen behavior
    (data_gen.lua:92-121) available from the library API."""
    synth.make_dataset(str(tmp_path), ["ab"], "a.txt", width=32)
    wide = synth.render_word("wxyz", 32, 64)
    np.save(tmp_path / "wide.npy", wide)
    cfg2 = CFG.replace(keep_aspect_ratio=True)
    ocr2 = AttentionOCR(cfg2, ocr.params, ocr.batch_stats)
    paths = [str(tmp_path / "wide.npy"),
             str(tmp_path / "images/0000_ab.npy"),
             str(tmp_path / "wide.npy")]
    words, scores = ocr2.recognize(paths)
    assert len(words) == 3 and scores.shape == (3,)
    # same input -> same output, in input order (rows 0 and 2 are the
    # same wide image; row 1 is the narrow one)
    assert words[0] == words[2] and scores[0] == scores[2]
    # order-invariance: per-image results match single-image calls
    w_single, s_single = ocr2.recognize([paths[1]])
    assert words[1] == w_single[0]
    np.testing.assert_allclose(scores[1], s_single[0], rtol=1e-5)


def test_mixed_width_arrays_and_score(ocr):
    cfg2 = CFG.replace(keep_aspect_ratio=True)
    ocr2 = AttentionOCR(cfg2, ocr.params, ocr.batch_stats)
    imgs = [synth.render_word("ab", 32, 32),
            synth.render_word("wxyz", 32, 64),
            synth.render_word("cd", 32, 32)]
    words, scores = ocr2.recognize(imgs)
    assert len(words) == 3
    gold = ocr2.score(imgs, ["ab", "wxyz", "cd"])
    assert gold.shape == (3,) and (gold <= 0).all()
    # scores come back in input order: scoring the same image/transcript
    # alone must agree with its slot in the mixed call
    alone = ocr2.score([imgs[1]], ["wxyz"])
    np.testing.assert_allclose(gold[1], alone[0], rtol=1e-5)


def test_serving_flow_with_device_preprocess(ocr, np_rng):
    """Raw uint8 RGB batch -> jit preprocess -> recognize (serving path)."""
    from aocr import preprocess

    raw = np_rng.randint(0, 256, (2, 48, 160, 3)).astype(np.uint8)
    images = preprocess.preprocess_batch(raw, 32, 32)
    words, scores = ocr.recognize(np.asarray(images))
    assert len(words) == 2 and scores.shape == (2,)


def test_recognize_paths_device_preprocess(ocr, tmp_path, np_rng):
    """Path-based recognize() with cfg.device_preprocess must agree with
    the host-preprocessed path on real PNGs."""
    from PIL import Image

    paths = []
    for i in range(3):
        img = np_rng.randint(0, 256, (40, 130, 3)).astype(np.uint8)
        p = str(tmp_path / f"{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    cfg_dev = CFG.replace(device_preprocess=True, image_width=32)
    ocr_dev = AttentionOCR(cfg_dev, ocr.params, ocr.batch_stats)
    words_dev, scores_dev = ocr_dev.recognize(paths)
    words_host, scores_host = ocr.recognize(paths)
    assert words_dev == words_host
    np.testing.assert_allclose(scores_dev, scores_host, rtol=1e-3,
                               atol=1e-3)
