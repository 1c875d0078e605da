"""Whole-beam-loop Pallas kernel (ops/pallas/beam_loop.py) vs the XLA beam
path: identical transcripts, parents, scores, refill bookkeeping — across
plain, trie-constrained, length-normalized, no-input-feed, and
ragged-tile configurations (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aocr import decode, vocab
from aocr.config import Config
from aocr.models import model
from aocr.ops.pallas import beam_loop
from aocr.utils import trie as trie_lib
from tests import synth


def _cfg(**kw):
    base = dict(input_feed=True, encoder_num_hidden=64,
                target_embedding_size=8, max_decoder_l=8,
                image_width=32, use_pallas=True)
    base.update(kw)
    return Config(**base).validate()


def _imgs(words):
    arr = np.stack([synth.render_word(w, 32, 32) for w in words])[..., None]
    return jnp.asarray(arr.astype(np.float32))


def _run_both(cfg, ms, imgs, K, **kw):
    """(XLA result, loop-kernel result) for the same beam decode."""
    ref = decode.beam_decode(ms.params, ms.batch_stats, imgs,
                             cfg.replace(use_pallas=False), K,
                             cfg.max_decoder_l, **kw)
    decode._PALLAS_BEAM_LOOP_INTERPRET = True
    try:
        got = decode.beam_decode(ms.params, ms.batch_stats, imgs, cfg, K,
                                 cfg.max_decoder_l, **kw)
    finally:
        decode._PALLAS_BEAM_LOOP_INTERPRET = False
    return ref, got


@pytest.mark.parametrize("K", [2, 5])
def test_beam_loop_matches_xla(K):
    cfg = _cfg()
    ms = model.init(jax.random.PRNGKey(9), cfg)
    imgs = _imgs(["ab", "cd", "e1", "xyz", "0", "qq", "m"])
    (lab_r, sc_r), (lab_k, sc_k) = _run_both(cfg, ms, imgs, K)
    np.testing.assert_array_equal(np.asarray(lab_k), np.asarray(lab_r))
    np.testing.assert_allclose(np.asarray(sc_k), np.asarray(sc_r),
                               rtol=1e-5, atol=1e-5)


def test_beam_loop_no_input_feed():
    cfg = _cfg(input_feed=False)
    ms = model.init(jax.random.PRNGKey(4), cfg)
    imgs = _imgs(["ab", "cd", "e1"])
    (lab_r, sc_r), (lab_k, sc_k) = _run_both(cfg, ms, imgs, 3)
    np.testing.assert_array_equal(np.asarray(lab_k), np.asarray(lab_r))
    np.testing.assert_allclose(np.asarray(sc_k), np.asarray(sc_r),
                               rtol=1e-5, atol=1e-5)


def test_beam_loop_length_normalize():
    cfg = _cfg(length_normalize=True)
    ms = model.init(jax.random.PRNGKey(5), cfg)
    imgs = _imgs(["ab", "cd", "e1", "wxyz"])
    (lab_r, sc_r), (lab_k, sc_k) = _run_both(cfg, ms, imgs, 3)
    np.testing.assert_array_equal(np.asarray(lab_k), np.asarray(lab_r))
    np.testing.assert_allclose(np.asarray(sc_k), np.asarray(sc_r),
                               rtol=1e-5, atol=1e-5)


def test_beam_loop_trie_matches_xla_with_refills():
    """Trie constraint + refill bookkeeping: transcripts AND the
    (refills, min_valid) warning counters must match the XLA path."""
    cfg = _cfg()
    ms = model.init(jax.random.PRNGKey(7), cfg)
    imgs = _imgs(["ab", "cd", "e1", "fg"])
    # 'z...' words force refills (few root edges vs K=3 beams)
    table = jnp.asarray(trie_lib.build_transition_table(["zz", "zq"]))
    (lab_r, sc_r, rf_r), (lab_k, sc_k, rf_k) = _run_both(
        cfg, ms, imgs, 3, trie_table=table, use_trie=True,
        return_refills=True)
    np.testing.assert_array_equal(np.asarray(lab_k), np.asarray(lab_r))
    np.testing.assert_allclose(np.asarray(sc_k), np.asarray(sc_r),
                               rtol=1e-5, atol=1e-5)
    assert int(rf_k[0]) == int(rf_r[0])   # refill count
    assert int(rf_k[1]) == int(rf_r[1])   # min valid beams


def test_beam_loop_trie_wide_dictionary():
    cfg = _cfg()
    ms = model.init(jax.random.PRNGKey(8), cfg)
    imgs = _imgs(["ab", "cd", "e1", "fg"])
    table = jnp.asarray(trie_lib.build_transition_table(
        ["ab", "cd", "e1", "fg", "abc", "cda", "e10", "fgh"]))
    (lab_r, sc_r, rf_r), (lab_k, sc_k, rf_k) = _run_both(
        cfg, ms, imgs, 3, trie_table=table, use_trie=True,
        return_refills=True)
    np.testing.assert_array_equal(np.asarray(lab_k), np.asarray(lab_r))
    np.testing.assert_allclose(np.asarray(sc_k), np.asarray(sc_r),
                               rtol=1e-5, atol=1e-5)
    assert int(rf_k[0]) == int(rf_r[0])
    assert int(rf_k[1]) == int(rf_r[1])


def test_beam_loop_three_layer_decoder():
    """-decoder_num_layers 3 exercises the kernel's extra-layer refs
    (layer_refs / extra_init), which the default 2-layer tests never
    touch."""
    cfg = _cfg(decoder_num_layers=3)
    ms = model.init(jax.random.PRNGKey(13), cfg)
    imgs = _imgs(["ab", "cd", "e1"])
    (lab_r, sc_r), (lab_k, sc_k) = _run_both(cfg, ms, imgs, 3)
    np.testing.assert_array_equal(np.asarray(lab_k), np.asarray(lab_r))
    np.testing.assert_allclose(np.asarray(sc_k), np.asarray(sc_r),
                               rtol=1e-5, atol=1e-5)


def test_beam_loop_ragged_tiles(monkeypatch):
    """Force a 4-row tile on a 10-row batch (grid 3, short final block):
    Mosaic-edge rows must stay confined and results identical."""
    monkeypatch.setattr(beam_loop, "pick_bt", lambda B0, est: 4)
    cfg = _cfg()
    ms = model.init(jax.random.PRNGKey(11), cfg)
    imgs = _imgs(["ab", "cd", "e1", "fg", "hi", "jk", "lm", "no", "pq",
                  "rs"])
    (lab_r, sc_r), (lab_k, sc_k) = _run_both(cfg, ms, imgs, 3)
    np.testing.assert_array_equal(np.asarray(lab_k), np.asarray(lab_r))
    np.testing.assert_allclose(np.asarray(sc_k), np.asarray(sc_r),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("combo", [
    # cross-product coverage the single-axis tests above do not reach
    dict(input_feed=False, decoder_num_layers=1, K=2, length_normalize=True),
    dict(input_feed=True, decoder_num_layers=1, K=4, trie=True),
    dict(input_feed=False, decoder_num_layers=3, K=3, trie=True,
         length_normalize=True),
    dict(input_feed=True, decoder_num_layers=2, K=5, trie=True,
         length_normalize=True),
])
def test_beam_loop_config_combinations(combo):
    K = combo.pop("K")
    use_trie = combo.pop("trie", False)
    cfg = _cfg(**combo)
    ms = model.init(jax.random.PRNGKey(sum(map(ord, str(combo))) % 97), cfg)
    imgs = _imgs(["ab", "cd", "e1", "zq", "m"])
    kw = {}
    if use_trie:
        kw = dict(trie_table=jnp.asarray(trie_lib.build_transition_table(
            ["ab", "cd", "e1", "zq", "m", "abc", "zz"])), use_trie=True,
            return_refills=True)
    ref, got = _run_both(cfg, ms, imgs, K, **kw)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-5, atol=1e-5)
    if use_trie:
        assert int(got[2][0]) == int(ref[2][0])
        assert int(got[2][1]) == int(ref[2][1])


def test_beam_loop_fits_gate():
    """Oversized beams / huge tries must fall back (fits() False) instead
    of failing VMEM allocation at compile time."""
    assert beam_loop.fits(24, 1024, 50, 5, 2, True, 128, 128, 2)
    assert not beam_loop.fits(24, 1024, 50, 9, 2, True, 128, 128, 2)  # K
    assert not beam_loop.fits(24, 1024, 50, 5, 2, True, 128, 128, 2,
                              num_trie_nodes=500_000)  # table > VMEM


def test_beam_loop_trie_vmem_charges_per_beam_onehots():
    """Regression: at the synthetic-demo shape (flagship geometry + a
    3,835-node trie) the compiled kernel's scoped-VMEM stack measured
    109.12M at bt=128 — over the hardware limit — while the old
    accounting (2 one-hots, not 2*K) estimated 87.8 MB and let the gate
    pick bt=128.  The estimate must charge the 2*K python-unrolled
    per-beam one-hot temps so this shape routes to a smaller tile."""
    from aocr.ops.pallas.greedy_loop import trie_table_bytes

    tb = trie_table_bytes(3835, 128)
    est = lambda b: beam_loop.vmem_bytes(24, 1024, 50, 5, 2, True, 136,
                                         128, 2, b, tb)
    # bt=128 estimated >= the measured 109.12M minus ordinary slack:
    assert est(128) > 100 * 1024 * 1024  # would NOT fit under the budget
    bt = beam_loop.pick_bt(256, est)
    assert bt is not None and bt <= 96  # still runs, smaller tiles
    # and the no-trie flagship shape keeps its full (hardware-proven)
    # tile under the calibrated 14 MB margin:
    est0 = lambda b: beam_loop.vmem_bytes(24, 1024, 50, 5, 2, True, 136,
                                          128, 2, b, 0)
    assert beam_loop.pick_bt(512, est0) == 128
    # f32 compute (the CLI default) + trie: the measured configuration
    # (demo shape, bt=16 compiled to a 109.12M stack vs the 109.00M
    # hardware limit) must now be rejected entirely -> tail fallback.
    assert not beam_loop.fits(24, 1024, 50, 5, 2, True, 136, 128, 4,
                              num_trie_nodes=3835)


def test_beam_loop_row_finality_multitile(monkeypatch):
    """A fully-frozen ROW is final — in the kernel this must hold across
    tile boundaries (a frozen row's tile may exit while other tiles run;
    a frozen row inside a live tile must not 'resurrect' a beam), and it
    must match the XLA while_loop, which keeps stepping frozen rows while
    any batch row is live.  length_normalize is the config where a
    resurrected longer beam could win final selection; the trie's
    mixed-length words make rows freeze at different steps."""
    monkeypatch.setattr(beam_loop, "pick_bt", lambda B0, est: 2)
    table = jnp.asarray(trie_lib.build_transition_table(
        ["a", "z", "abcdef", "zyxwvu", "mn"]))
    for seed in (0, 7, 21):
        cfg = _cfg(length_normalize=True)
        ms = model.init(jax.random.PRNGKey(seed), cfg)
        imgs = _imgs(["a", "zy", "ab", "mn", "zz", "q", "ef", "x0"])
        (lab_r, sc_r), (lab_k, sc_k) = _run_both(
            cfg, ms, imgs, 3, trie_table=table, use_trie=True)
        np.testing.assert_array_equal(np.asarray(lab_k), np.asarray(lab_r))
        np.testing.assert_allclose(np.asarray(sc_k), np.asarray(sc_r),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("use_trie", [False, True])
def test_beam_row_finality_batch_independent(use_trie):
    """A row's beam transcript must not depend on its BATCHMATES: decoding
    a row alone and inside a batch must agree (XLA path).  Before the
    row-finality rule, a frozen row kept being stepped while batchmates
    were live, so its beams could churn batch-dependently (visible under
    length_normalize)."""
    cfg = _cfg(length_normalize=True, use_pallas=False)
    table = (jnp.asarray(trie_lib.build_transition_table(
        ["a", "z", "abcdef", "zyxwvu"])) if use_trie else None)
    kw = dict(trie_table=table, use_trie=use_trie)
    for seed in (1, 13):
        ms = model.init(jax.random.PRNGKey(seed), cfg)
        words = ["a", "zyxw", "ab", "q"]
        imgs = _imgs(words)
        lab_b, sc_b = decode.beam_decode(
            ms.params, ms.batch_stats, imgs, cfg, 3, cfg.max_decoder_l,
            **kw)
        for r in range(len(words)):
            lab_1, sc_1 = decode.beam_decode(
                ms.params, ms.batch_stats, imgs[r:r + 1], cfg, 3,
                cfg.max_decoder_l, **kw)
            np.testing.assert_array_equal(np.asarray(lab_1)[0],
                                          np.asarray(lab_b)[r])
            np.testing.assert_allclose(np.asarray(sc_1)[0],
                                       np.asarray(sc_b)[r],
                                       rtol=1e-5, atol=1e-5)
