"""Torch checkpoint import + cross-framework activation/transcript parity
(VERDICT r1 item 1: convert 'parity by re-implementation' into 'parity by
evidence').

Pipeline under test:
  reference-layout t7 bytes (tests/torch_fixture.py — the object tree
  model.lua:724 serializes)
    -> aocr.t7 reader -> aocr.torch_import weight mapping -> JAX pytree
    -> stage-by-stage comparison against an INDEPENDENT PyTorch float64
       implementation of the Lua spec (tests/torch_oracle.py) driven by
       the same weights: CNN columns, encoder context, decoder init,
       first-step attention alphas, teacher-forced log-probs, greedy
       transcripts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aocr import decode, t7, torch_import, vocab
from aocr.config import Config
from aocr.models import cnn as cnn_lib
from aocr.models import decoder as decoder_lib
from aocr.models import model as model_lib
from tests import synth, torch_fixture, torch_oracle

ENC_H, EMB, VOCAB = 32, 8, 39
CFG = Config(input_feed=True, encoder_num_hidden=ENC_H,
             target_embedding_size=EMB, max_decoder_l=8,
             image_width=32).validate()


# ----------------------------------------------------------- t7 round trip

def test_t7_roundtrip_primitives(tmp_path):
    payload = {
        "num": 3.5, "int_like": 7.0, "s": "hello", "flag": True,
        "none": None,
        "arr": np.arange(12, dtype=np.float32).reshape(3, 4),
        "longs": np.array([1, 2, 3], np.int64),
        "nested": [1.0, "two", {"k": np.float32(9).reshape(())}],
    }
    p = str(tmp_path / "x.t7")
    t7.save(p, payload)
    back = t7.load(p)
    assert back["num"] == 3.5 and back["s"] == "hello" and back["flag"]
    assert back["none"] is None
    np.testing.assert_array_equal(back["arr"], payload["arr"])
    assert back["arr"].dtype == np.float32
    np.testing.assert_array_equal(back["longs"], payload["longs"])
    assert back["nested"][1] == "two"


def test_t7_shared_references(tmp_path):
    """Shared tensors/tables serialize once and deserialize to one object
    (the reference's getParameters makes weights views of shared storage)."""
    shared = np.ones((4,), np.float32)
    obj = [shared, shared, {"again": shared}]
    p = str(tmp_path / "shared.t7")
    t7.save(p, obj)
    back = t7.load(p)
    assert back[0] is back[1] and back[2]["again"] is back[0]


def test_t7_strided_view_tensor(tmp_path):
    """A non-contiguous tensor view (offset + strides into a larger
    storage) must read back as the right values — this is exactly how
    getParameters-flattened module weights are stored."""
    import io
    import struct

    # hand-write: FloatTensor 2x3 view into a 10-element storage at
    # offset 2 with strides (3, 1)
    buf = io.BytesIO()
    w = t7._Writer(buf)
    w.write_int(t7.TYPE_TORCH)
    w.write_int(1)
    w.write_rawstring("V 1")
    w.write_rawstring("torch.FloatTensor")
    w.write_int(2)
    for s in (2, 3):
        w.write_long(s)
    for s in (3, 1):
        w.write_long(s)
    w.write_long(3)  # storageOffset, 1-based -> offset 2
    w.write_int(t7.TYPE_TORCH)
    w.write_int(2)
    w.write_rawstring("V 1")
    w.write_rawstring("torch.FloatStorage")
    w.write_long(10)
    buf.write(struct.pack("<10f", *range(10)))
    buf.seek(0)
    arr = t7._Reader(buf).read_object()
    np.testing.assert_array_equal(arr, [[2, 3, 4], [5, 6, 7]])


# --------------------------------------------------------- import mapping

@pytest.fixture(scope="module", params=[True, False],
                ids=["tagged", "untagged"])
def imported(request, tmp_path_factory):
    """Fixture checkpoint (with and without usePrealloc name tags) plus
    its imported payload and the originating weights."""
    rng = np.random.RandomState(20260816)
    w = torch_fixture.make_weights(rng, ENC_H, EMB, VOCAB)
    p = str(tmp_path_factory.mktemp("t7") / "model.t7")
    torch_fixture.save_reference_checkpoint(
        p, w, enc_h=ENC_H, emb=EMB, vocab=VOCAB,
        tag_names=request.param, global_step=123, learning_rate=0.05,
    )
    payload = torch_import.import_checkpoint(p)
    return dict(weights=w, payload=payload, path=p)


def test_mapping_shapes_and_values(imported):
    w, pl = imported["weights"], imported["payload"]
    params = pl["params"]
    # conv: OIHW -> HWIO
    np.testing.assert_array_equal(
        params["cnn"]["conv1"]["w"],
        w["cnn"]["conv1"]["weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(params["cnn"]["conv3_bn"]["scale"],
                                  w["bn"]["conv3"]["weight"])
    np.testing.assert_array_equal(pl["batch_stats"]["conv5_bn"]["var"],
                                  w["bn"]["conv5"]["running_var"])
    # lstm: (4H, in) -> (in, 4H)
    np.testing.assert_array_equal(
        params["encoder_fw"]["layers"][0]["wi"],
        w["encoder_fw"][0]["i2h"]["weight"].T)
    np.testing.assert_array_equal(
        params["decoder"]["layers"][1]["wh"],
        w["decoder"]["layers"][1]["h2h"]["weight"].T)
    # attention projections by input width
    np.testing.assert_array_equal(params["decoder"]["w_a"],
                                  w["decoder"]["w_a"].T)
    np.testing.assert_array_equal(params["decoder"]["w_c"],
                                  w["decoder"]["w_c"].T)
    np.testing.assert_array_equal(params["decoder"]["embedding"],
                                  w["decoder"]["embedding"])
    np.testing.assert_array_equal(params["projector"]["w"],
                                  w["projector"]["weight"].T)
    assert pl["global_step"] == 123
    assert pl["optim_state"]["learning_rate"] == 0.05
    assert pl["config"]["encoder_num_hidden"] == ENC_H
    assert pl["config"]["input_feed"] is True


def _images(n=3, width=32):
    words = ["ab", "c1d", "xyz"][:n]
    return (np.stack([synth.render_word(s, 32, width) for s in words])
            [..., None].astype(np.float32))


def test_activation_parity_vs_torch_oracle(imported):
    """Stage-by-stage: JAX with imported weights == independent PyTorch
    float64 implementation of the Lua spec, on the same pixels."""
    w, pl = imported["weights"], imported["payload"]
    params = jax.tree.map(jnp.asarray, pl["params"])
    stats = jax.tree.map(jnp.asarray, pl["batch_stats"])
    images = _images()

    # oracle stages
    feats_t, context_t, (c0_t, h0_t) = torch_oracle.encode(w, images, ENC_H)
    # jax stages
    feats_j, _ = cnn_lib.apply(params["cnn"], stats, jnp.asarray(images),
                               train=False)
    context_j, (c0_j, h0_j), _ = model_lib.encode(
        params, stats, jnp.asarray(images), CFG, train=False)

    np.testing.assert_allclose(np.asarray(feats_j), feats_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(context_j), context_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c0_j), c0_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h0_j), h0_t.numpy(),
                               rtol=1e-4, atol=1e-4)

    # first-step attention alphas
    state = decoder_lib.init_state((c0_j, h0_j), CFG.decoder_num_layers)
    go = jnp.full((images.shape[0],), vocab.GO, jnp.int32)
    _st, _ht = decoder_lib.step(params["decoder"], state, go, context_j,
                                input_feed=True)
    # recompute alpha explicitly for the comparison
    import aocr.ops.lstm as lstm_ops

    x = jnp.concatenate([params["decoder"]["embedding"][go], state.attn], -1)
    cs, hs = [], []
    for i, layer in enumerate(params["decoder"]["layers"]):
        c, h = lstm_ops.lstm_step(layer, x, state.cs[i], state.hs[i])
        cs.append(c)
        hs.append(h)
        x = h
    _htld, alpha_j = decoder_lib.attention(params["decoder"], hs[-1],
                                           context_j)
    _rows, _lps, alpha_t = torch_oracle.greedy_decode(
        w, images, ENC_H, max_len=1)
    np.testing.assert_allclose(np.asarray(alpha_j), alpha_t.numpy(),
                               rtol=1e-4, atol=1e-5)

    # teacher-forced log-probs
    targets, targets_eval, _ = vocab.encode_batch(["ab", "c1d", "xyz"],
                                                  pad_to=6)
    _nll, _stats2, logp_j = model_lib.forward_loss(
        params, stats, jnp.asarray(images), jnp.asarray(targets),
        jnp.asarray(targets_eval), CFG, train=False)
    logp_t = torch_oracle.teacher_forced_logprobs(w, images, targets, ENC_H)
    np.testing.assert_allclose(np.asarray(logp_j), logp_t.numpy(),
                               rtol=1e-3, atol=2e-4)


def test_transcript_parity_vs_torch_oracle(imported):
    """Greedy transcripts from the imported JAX model == the oracle's,
    including the PAD/EOS freeze semantics."""
    w, pl = imported["weights"], imported["payload"]
    params = jax.tree.map(jnp.asarray, pl["params"])
    stats = jax.tree.map(jnp.asarray, pl["batch_stats"])
    images = _images()
    T = 8
    rows_t, _, _ = torch_oracle.greedy_decode(w, images, ENC_H, max_len=T)
    labels_j, _scores = decode.beam_decode(
        params, stats, jnp.asarray(images), CFG, beam_size=1, max_len=T)
    got = [vocab.decode(r) for r in np.asarray(labels_j)]
    want = [vocab.decode(r) for r in rows_t]
    assert got == want


def test_import_to_model_dir_cli(imported, tmp_path):
    """tools/import_torch.py end-to-end: t7 -> v2 checkpoint ->
    AttentionOCR.load -> recognize."""
    import subprocess
    import sys
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mdir = str(tmp_path / "model")
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "import_torch.py"),
         imported["path"], mdir, "--summary"],
        capture_output=True, text=True, cwd=root,
        env={**os.environ, "JAX_PLATFORM_NAME": "cpu"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Imported" in r.stdout

    from aocr.api import AttentionOCR

    ocr = AttentionOCR.load(mdir)
    assert ocr.cfg.encoder_num_hidden == ENC_H
    assert ocr.global_step == 123
    words, scores = ocr.recognize(_images(), max_len=8)
    # same transcripts as the oracle
    rows_t, _, _ = torch_oracle.greedy_decode(imported["weights"], _images(),
                                              ENC_H, max_len=8)
    assert words == [vocab.decode(r) for r in rows_t]
