"""PACK_VP (projector lane packing) must not change decode results.

vp=64 packs the 39-symbol vocab into half a vector register (the beam
roofline's named VPU-residual lever); the padded columns carry -1e30 bias
either way, so transcripts and scores must be identical to vp=128.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aocr import decode, vocab
from aocr.config import Config
from aocr.models import model
from aocr.ops.pallas import decode_step
from aocr.utils import trie as trie_lib


@pytest.fixture
def small(monkeypatch):
    # interpret-mode kernels on CPU: PACK_VP only matters on the Pallas
    # decode routes, so the XLA fallback would test nothing
    monkeypatch.setattr(decode, "_PALLAS_GREEDY_INTERPRET", True)
    monkeypatch.setattr(decode, "_PALLAS_BEAM_LOOP_INTERPRET", True)
    cfg = Config(batch_size=4, input_feed=True, encoder_num_hidden=64,
                 target_embedding_size=8, max_decoder_l=8, image_width=32,
                 use_pallas=True).validate()
    ms = model.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(0, 255, (4, 32, 32, 1))
                         .astype(np.float32))
    return cfg, ms, images


def _with_vp(vp, fn):
    old = decode_step.PACK_VP
    decode_step.PACK_VP = vp
    try:
        jax.clear_caches()
        return fn()
    finally:
        decode_step.PACK_VP = old
        jax.clear_caches()


@pytest.mark.parametrize("use_trie", [False, True])
def test_beam_identical_across_packing(small, use_trie):
    cfg, ms, images = small
    kw = {}
    if use_trie:
        table = jnp.asarray(trie_lib.build_transition_table(
            ["ab", "abc", "ba", "c1"]))
        kw = dict(trie_table=table, use_trie=True)

    def run():
        labels, scores = decode.beam_decode(
            ms.params, ms.batch_stats, images, cfg, 3, 8, **kw)
        return np.asarray(labels), np.asarray(scores)

    l128, s128 = _with_vp(128, run)
    l64, s64 = _with_vp(64, run)
    np.testing.assert_array_equal(l128, l64)
    np.testing.assert_allclose(s128, s64, rtol=1e-6, atol=1e-6)


def test_greedy_identical_across_packing(small):
    cfg, ms, images = small

    def run():
        labels, scores = decode.greedy_decode(
            ms.params, ms.batch_stats, images, cfg, 8)
        return np.asarray(labels), np.asarray(scores)

    l128, s128 = _with_vp(128, run)
    l64, s64 = _with_vp(64, run)
    np.testing.assert_array_equal(l128, l64)
    np.testing.assert_allclose(s128, s64, rtol=1e-6, atol=1e-6)
