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


def test_dictionary_constraint(ocr):
    imgs = np.stack([synth.render_word("ab", 32, 32)])
    ocr.use_dictionary(["zz"])
    try:
        words, _ = ocr.recognize(imgs, beam_size=2)
        assert words[0] in ("zz", "z", "")
    finally:
        ocr._trie = None


def test_mixed_width_paths_rejected(ocr, tmp_path):
    synth.make_dataset(str(tmp_path), ["ab"], "a.txt", width=32)
    import numpy as np_

    np_.save(tmp_path / "wide.npy", np_.zeros((32, 64), np_.float32))
    cfg2 = CFG.replace(keep_aspect_ratio=True)
    ocr2 = AttentionOCR(cfg2, ocr.params, ocr.batch_stats)
    with pytest.raises(AssertionError):
        ocr2.recognize([str(tmp_path / "images/0000_ab.npy"),
                        str(tmp_path / "wide.npy")])


def test_serving_flow_with_device_preprocess(ocr, np_rng):
    """Raw uint8 RGB batch -> jit preprocess -> recognize (serving path)."""
    from aocr import preprocess

    raw = np_rng.randint(0, 256, (2, 48, 160, 3)).astype(np.uint8)
    images = preprocess.preprocess_batch(raw, 32, 32)
    words, scores = ocr.recognize(np.asarray(images))
    assert len(words) == 2 and scores.shape == (2,)
