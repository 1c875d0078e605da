"""Kernel/XLA transcript parity on TRAINED weights, hardened (VERDICT r3
weak #3): several independently trained fixtures x {trie on/off} x
{whole-loop kernel, per-step fused tail}, for both beam-5 and greedy.

On random weights bf16 near-ties flip ~0.7% of tokens between the Pallas
kernels and the XLA paths (documented, docs/performance.md); on trained
models near-ties are absent, so transcripts must be IDENTICAL.  One
trained overfit fixture pinned this since r3
(tests/test_pallas_decode.py::test_fused_beam_transcripts_on_trained_weights);
this file makes the pin rest on multiple independently trained models
(different init seeds, data RNG, and word sets) instead of one anecdote.

Reference decode paths: greedy src/model/model.lua:266-282, lexicon-
constrained beam src/model/model.lua:406-514.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aocr import decode, vocab
from aocr.config import Config
from aocr.models import model
from aocr.utils import trie as trie_lib
from tests import synth

WORD_SETS = {
    0: ["ab", "cd", "e1", "fg"],
    1: ["hij", "kl", "m2", "no"],
    2: ["pq", "rst", "u3", "vw"],
}
DECOYS = ["abc", "cde", "ef", "fgh", "hi", "klm", "mno", "pqr", "stu",
          "vwx", "yz", "a1", "b2", "c3", "qq", "zz", "xray", "yolk"]

_FIXTURES: dict = {}


def _trained(seed: int):
    """Train a tiny model to exact match on its word set (H=128 so the
    real kernel tiling constraints apply in interpret mode)."""
    if seed in _FIXTURES:
        return _FIXTURES[seed]
    from aocr import eval as eval_lib, optim, train_step

    labels = WORD_SETS[seed]
    cfg = Config(
        batch_size=4, input_feed=True, encoder_num_hidden=64,  # H = 128
        target_embedding_size=8, max_decoder_l=8, image_width=32,
        learning_rate=0.1, use_pallas=False, seed=seed,
    ).validate()
    imgs = np.stack([synth.render_word(l, 32, 32) for l in labels])[..., None]
    targets, targets_eval, _ = vocab.encode_batch(labels)
    ms = model.init(jax.random.PRNGKey(seed), cfg)
    params, stats = ms.params, ms.batch_stats
    opt = optim.sgd_init(params)
    step = train_step.make_train_step(cfg)
    im = jnp.asarray(imgs.astype(np.float32))
    tg, te = jnp.asarray(targets), jnp.asarray(targets_eval)
    rng = jax.random.PRNGKey(seed + 100)
    converged = False
    for i in range(300):
        out = step(params, stats, opt, im, tg, te, jnp.float32(0.1), rng)
        params, stats, opt = out.params, out.batch_stats, out.opt_state
        if (i + 1) % 25 == 0:
            pred, _ = decode.beam_decode(params, stats, im, cfg,
                                         beam_size=1, max_len=8)
            if np.asarray(eval_lib.exact_match(
                    np.asarray(pred), np.asarray(te))).all():
                converged = True
                break
    assert converged, f"fixture seed={seed} did not overfit"
    _FIXTURES[seed] = (cfg, params, stats, im, labels)
    return _FIXTURES[seed]


def _beam(params, stats, im, cfg, trie_table, use_trie):
    lab, sc = decode.beam_decode(
        params, stats, im, cfg, 5, cfg.max_decoder_l,
        trie_table=trie_table, use_trie=use_trie)
    return np.asarray(lab), np.asarray(sc)


def _greedy(params, stats, im, cfg, trie_table, use_trie):
    lab, sc = decode.greedy_decode(
        params, stats, im, cfg, cfg.max_decoder_l,
        trie_table=trie_table, use_trie=use_trie)
    return np.asarray(lab), np.asarray(sc)


@pytest.mark.parametrize("use_trie", [False, True],
                         ids=["notrie", "trie"])
@pytest.mark.parametrize("seed", sorted(WORD_SETS))
def test_trained_transcripts_pin_all_paths(seed, use_trie):
    cfg, params, stats, im, labels = _trained(seed)
    cfg_bf = cfg.replace(compute_dtype="bfloat16")
    trie_table = (jnp.asarray(trie_lib.build_transition_table(
        labels + DECOYS)) if use_trie else None)

    want_b, score_b = _beam(params, stats, im, cfg_bf, trie_table, use_trie)
    want_g, score_g = _greedy(params, stats, im, cfg_bf, trie_table,
                              use_trie)
    # the trained fixture must actually read back its words on the XLA
    # reference path, or the parity pins below would compare garbage
    assert [vocab.decode(r) for r in want_b] == labels
    assert [vocab.decode(r) for r in want_g] == labels

    # NOTE: the interpret flags are module globals and NOT part of the jit
    # cache key, so every kernel path uses a DISTINCT static cfg
    # (pallas_beam / pallas_greedy) — a shared cfg would silently replay
    # another path's cached executable.
    decode._PALLAS_BEAM_INTERPRET = True
    decode._PALLAS_BEAM_LOOP_INTERPRET = True
    decode._PALLAS_GREEDY_INTERPRET = True
    try:
        for mode in ("tail", "loop"):
            lab, sc = _beam(params, stats, im,
                            cfg_bf.replace(use_pallas=True,
                                           pallas_beam=mode),
                            trie_table, use_trie)
            np.testing.assert_array_equal(lab, want_b,
                                          err_msg=f"beam {mode}")
            np.testing.assert_allclose(sc, score_b, rtol=2e-2, atol=2e-2,
                                       err_msg=f"beam {mode}")
            lab, sc = _greedy(params, stats, im,
                              cfg_bf.replace(use_pallas=True,
                                             pallas_greedy=mode),
                              trie_table, use_trie)
            np.testing.assert_array_equal(lab, want_g,
                                          err_msg=f"greedy {mode}")
            np.testing.assert_allclose(sc, score_g, rtol=2e-2, atol=2e-2,
                                       err_msg=f"greedy {mode}")
    finally:
        decode._PALLAS_BEAM_INTERPRET = False
        decode._PALLAS_BEAM_LOOP_INTERPRET = False
        decode._PALLAS_GREEDY_INTERPRET = False
