"""Serialized inference artifacts (aocr.export).

The exported StableHLO program must reproduce the live model's transcripts
and scores exactly — it is the same traced computation, replayed — across
symbolic-batch and pinned-batch artifacts, greedy and dictionary-beam
decodes, and the CLI entry point.
"""

import json
import os
import subprocess
import sys
import zipfile

import numpy as np
import pytest

from aocr import export as export_lib
from aocr.api import AttentionOCR
from aocr.config import Config
from tests import synth

CFG = Config(input_feed=True, encoder_num_hidden=32,
             target_embedding_size=8, max_decoder_l=8, image_width=32)


@pytest.fixture(scope="module")
def ocr():
    return AttentionOCR.create(CFG)


@pytest.fixture(scope="module")
def images():
    return np.stack([synth.render_word(w, 32, 32)[..., None]
                     for w in ["ab", "cd", "ef", "gh", "ij"]])


def test_poly_batch_roundtrip(ocr, images, tmp_path):
    """One symbolic-batch artifact serves any batch size, matching the
    live model bit-for-bit on transcripts and to fp tolerance on scores."""
    path = str(tmp_path / "m.aocrx")
    export_lib.export_recognizer(ocr, path)
    r = export_lib.ExportedRecognizer.load(path)
    w_live, s_live = ocr.recognize(images)
    w_exp, s_exp = r.recognize(images)
    assert w_exp == w_live
    np.testing.assert_allclose(s_exp, s_live, rtol=1e-5)
    # a different batch size through the same program
    w2, _ = r.recognize(images[:2])
    assert w2 == w_live[:2]


def test_pinned_batch_beam_dictionary(ocr, images, tmp_path):
    """A pinned-batch artifact chunks + pads internally; the dictionary
    trie rides in the artifact and constrains the exported beam search."""
    ocr.use_dictionary(["cat", "car", "dog"])
    try:
        path = str(tmp_path / "m5.aocrx")
        export_lib.export_recognizer(ocr, path, beam_size=5, batch=2)
        r = export_lib.ExportedRecognizer.load(path)
        w_live, s_live = ocr.recognize(images, beam_size=5)
        w_exp, s_exp = r.recognize(images)  # 5 rows -> 3 chunks of 2
        assert w_exp == w_live
        np.testing.assert_allclose(s_exp, s_live, rtol=1e-5)
        assert r.meta["use_dictionary"] is True
    finally:
        ocr.clear_dictionary()


def test_recognize_paths(ocr, tmp_path):
    """Path inputs go through the same preprocessing as the live API."""
    _, names = synth.make_dataset(str(tmp_path), ["ab", "cd"], width=32)
    paths = [str(tmp_path / p) for p in names]
    art = str(tmp_path / "m.aocrx")
    export_lib.export_recognizer(ocr, art)
    r = export_lib.ExportedRecognizer.load(art)
    w_live, _ = ocr.recognize(paths)
    w_exp, _ = r.recognize(paths)
    assert w_exp == w_live


def test_load_rejects_foreign_and_future(ocr, tmp_path):
    art = str(tmp_path / "m.aocrx")
    export_lib.export_recognizer(ocr, art, max_len=4)
    # not an aocrx zip
    bad = str(tmp_path / "bad.zip")
    with zipfile.ZipFile(bad, "w") as z:
        z.writestr("__meta__.json", json.dumps({"format": "other"}))
    with pytest.raises(ValueError, match="not an aocrx"):
        export_lib.ExportedRecognizer.load(bad)
    # future format version
    fut = str(tmp_path / "future.aocrx")
    with zipfile.ZipFile(art) as zin, zipfile.ZipFile(fut, "w") as zout:
        for info in zin.infolist():
            data = zin.read(info)
            if info.filename == "__meta__.json":
                meta = json.loads(data)
                meta["version"] = export_lib.FORMAT_VERSION + 1
                data = json.dumps(meta).encode()
            zout.writestr(info.filename, data)
    with pytest.raises(ValueError, match="version"):
        export_lib.ExportedRecognizer.load(fut)


def test_cli_export(ocr, images, tmp_path):
    """`python -m aocr.export` exports a saved checkpoint dir."""
    ocr.save(str(tmp_path))
    out = str(tmp_path / "cli.aocrx")
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu")
    res = subprocess.run(
        [sys.executable, "-m", "aocr.export", "-model_dir", str(tmp_path),
         "-out", out, "-max_len", "8"],
        capture_output=True, text=True, env=env, timeout=580)
    assert res.returncode == 0, res.stderr
    assert "wrote" in res.stdout
    r = export_lib.ExportedRecognizer.load(out)
    w_live, _ = ocr.recognize(images)
    w_exp, _ = r.recognize(images)
    assert w_exp == w_live


def test_recognize_bare_string_path(ocr, tmp_path):
    """A single path (not wrapped in a list) is one image, not a sequence
    of one-character paths."""
    _, names = synth.make_dataset(str(tmp_path), ["ab"], width=32)
    path = str(tmp_path / names[0])
    art = str(tmp_path / "m.aocrx")
    export_lib.export_recognizer(ocr, art)
    r = export_lib.ExportedRecognizer.load(art)
    w1, _ = r.recognize(path)
    w2, _ = r.recognize([path])
    assert w1 == w2 and len(w1) == 1


def test_update_weights_reuses_program(ocr, images, tmp_path):
    """Weight-only re-export: a fine-tuned model redeploys by swapping the
    npz members under the SAME lowered program — output matches a live
    model with the new weights, and mismatched trees are rejected."""
    src = str(tmp_path / "src.aocrx")
    export_lib.export_recognizer(ocr, src)
    other = AttentionOCR.create(CFG, seed=123)
    out = str(tmp_path / "updated.aocrx")
    export_lib.update_weights(src, other, out)
    r = export_lib.ExportedRecognizer.load(out)
    w_exp, s_exp = r.recognize(images)
    w_live, s_live = other.recognize(images)
    assert w_exp == w_live
    np.testing.assert_allclose(s_exp, s_live, rtol=1e-5)
    # the program member(s) are byte-identical to the source artifact's
    with zipfile.ZipFile(src) as a, zipfile.ZipFile(out) as b:
        progs = [n for n in a.namelist() if n.startswith("__program__")]
        assert progs
        for name in progs:
            assert a.read(name) == b.read(name)
    # dictionary presence must match the source
    other.use_dictionary(["cat"])
    with pytest.raises(ValueError, match="dictionary presence"):
        export_lib.update_weights(src, other, str(tmp_path / "x.aocrx"))
    other.clear_dictionary()
    # structural mismatch is rejected
    bigger = AttentionOCR.create(CFG.replace(encoder_num_hidden=64))
    with pytest.raises(ValueError, match="does not match"):
        export_lib.update_weights(src, bigger, str(tmp_path / "y.aocrx"))


def test_multi_width_artifact(ocr, tmp_path):
    """-widths exports one program per width; mixed-width inputs bucket
    per program (exact match vs the live model at exported widths) and
    in-between widths pad UP to the next exported step."""
    art = str(tmp_path / "mw.aocrx")
    export_lib.export_recognizer(ocr, art, widths=[24, 32])
    r = export_lib.ExportedRecognizer.load(art)
    assert r.widths == [24, 32]
    im24 = synth.render_word("ab", 32, 24).astype(np.float32)
    im32 = synth.render_word("cd", 32, 32).astype(np.float32)
    w_exp, s_exp = r.recognize([im24, im32, im24])
    w_live, s_live = ocr.recognize([im24, im32, im24])
    assert w_exp == w_live  # same widths -> same programs' math
    np.testing.assert_allclose(s_exp, s_live, rtol=1e-5)
    # a width between steps pads up with background: equals the live
    # model fed the SAME padded image
    im20 = synth.render_word("ef", 32, 20).astype(np.float32)
    padded = np.pad(im20, ((0, 0), (0, 4)), constant_values=255.0)
    w_pad, _ = r.recognize([im20])
    w_ref, _ = ocr.recognize([padded])
    assert w_pad == w_ref
    # wider than the ladder top is an explicit error
    with pytest.raises(ValueError, match="widest exported"):
        r.recognize([synth.render_word("gh", 32, 40).astype(np.float32)])
