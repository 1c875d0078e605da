"""AttentionOCR.shard(): data-parallel recognize() must match the
single-device path exactly (transcripts) / to fp tolerance (scores), pad
ragged batches transparently, and compose with dictionary constraints.
Runs on the 8-virtual-CPU-device mesh from conftest."""

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


def _imgs(words):
    return np.stack([synth.render_word(w, 32, 32) for w in words])


def test_sharded_matches_unsharded(ocr):
    imgs = _imgs(["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op"])
    base_words, base_scores = ocr.recognize(imgs, beam_size=2)
    try:
        ocr.shard(4)
        words, scores = ocr.recognize(imgs, beam_size=2)
    finally:
        ocr.unshard()
    assert words == base_words
    np.testing.assert_allclose(scores, base_scores, rtol=1e-5, atol=1e-5)


def test_sharded_ragged_batch_pads(ocr):
    # 6 rows over 4 shards: pad_rows repeats the last row, results sliced
    imgs = _imgs(["ab", "cd", "ef", "gh", "ij", "kl"])
    base_words, base_scores = ocr.recognize(imgs)
    try:
        ocr.shard(4)
        words, scores = ocr.recognize(imgs)
    finally:
        ocr.unshard()
    assert len(words) == 6
    assert words == base_words
    np.testing.assert_allclose(scores, base_scores, rtol=1e-5, atol=1e-5)


def test_sharded_with_dictionary(ocr):
    imgs = _imgs(["ab", "cd", "ab", "cd"])
    try:
        ocr.use_dictionary(["ab", "cd", "zz"])
        base_words, base_scores = ocr.recognize(imgs, beam_size=2)
        ocr.shard(2)
        words, scores = ocr.recognize(imgs, beam_size=2)
    finally:
        ocr.unshard()
        ocr.clear_dictionary()
    assert words == base_words
    np.testing.assert_allclose(scores, base_scores, rtol=1e-5, atol=1e-5)
    for w in words:  # every transcript is a trie walk
        assert w in ("ab", "cd", "zz", "a", "c", "z", "")


def test_shard_all_devices_and_unshard(ocr):
    import jax

    imgs = _imgs(["ab", "cd"])
    base_words, _ = ocr.recognize(imgs)
    try:
        ocr.shard()  # all local devices
        assert ocr.num_shards == len(jax.devices())
        words, _ = ocr.recognize(imgs)
    finally:
        ocr.unshard()
    assert words == base_words
    assert ocr._mesh is None
    # shard(1) is an unshard
    ocr.shard(4).shard(1)
    assert ocr._mesh is None


def test_shard_replicates_weights_once(ocr):
    """shard() must commit the params to the mesh (replicated) so jit does
    not re-broadcast the tree on every recognize(); unshard() hops them
    back to a single device."""
    import jax

    leaf = lambda: jax.tree.leaves(ocr.params)[0]
    try:
        ocr.shard(4)
        assert len(leaf().sharding.device_set) == 4
    finally:
        ocr.unshard()
    assert len(leaf().sharding.device_set) == 1


def test_shard_rejects_bad_counts(ocr):
    import jax

    with pytest.raises(ValueError):
        ocr.shard(0)
    with pytest.raises(ValueError):
        ocr.shard(-2)
    with pytest.raises(ValueError):
        ocr.shard(0, devices=jax.devices())  # devices does not bypass it
    with pytest.raises(ValueError):
        ocr.shard(len(jax.devices()) + 1)
    with pytest.raises(ValueError):
        ocr.shard(devices=[])
    assert ocr._mesh is None and ocr.num_shards == 1
