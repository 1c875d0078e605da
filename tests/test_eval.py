import numpy as np
import pytest

from aocr import eval as eval_lib
from aocr import vocab


def _seq(s, width):
    ids = [vocab.char_to_id(c) for c in s] + [vocab.EOS]
    ids += [vocab.PAD] * (width - len(ids))
    return ids[:width]


def test_host_levenshtein():
    assert eval_lib.levenshtein("", "") == 0
    assert eval_lib.levenshtein("abc", "abc") == 0
    assert eval_lib.levenshtein("abc", "") == 3
    assert eval_lib.levenshtein("kitten", "sitting") == 3
    assert eval_lib.levenshtein("flaw", "lawn") == 2


def test_eval_word_err_rate():
    width = 8
    labels = np.array([_seq("abc", width), _seq("xyz", width)])
    gold = np.array([_seq("abc", width), _seq("xya", width)])
    err, preds, golds = eval_lib.eval_word_err_rate(labels, gold)
    assert err == 1
    assert preds == ["abc", "xyz"] and golds == ["abc", "xya"]


def test_device_exact_match():
    width = 8
    pred = np.array([_seq("abc", width), _seq("abcd", width), _seq("", width)])
    gold = np.array([_seq("abc", width), _seq("abc", width), _seq("", width)])
    m = np.asarray(eval_lib.exact_match(pred, gold))
    assert list(m) == [True, False, True]


@pytest.mark.parametrize("pairs", [
    [("", ""), ("abc", "abc"), ("kitten", "sitting")],
    [("flaw", "lawn"), ("a", ""), ("", "xyz"), ("2024", "224")],
])
def test_device_edit_distance_vs_oracle(pairs):
    width = 10
    pred = np.array([_seq(a, width) for a, _ in pairs])
    gold = np.array([_seq(b, width) for _, b in pairs])
    d = np.asarray(eval_lib.edit_distance(pred, gold))
    expected = [eval_lib.levenshtein(a, b) for a, b in pairs]
    assert list(d) == expected


def test_device_edit_distance_random(np_rng):
    """Fuzz the wavefront DP against the host oracle."""
    width = 12
    alphabet = "abcde"
    pairs = []
    for _ in range(20):
        a = "".join(np_rng.choice(list(alphabet))
                    for _ in range(np_rng.randint(0, 10)))
        b = "".join(np_rng.choice(list(alphabet))
                    for _ in range(np_rng.randint(0, 10)))
        pairs.append((a, b))
    pred = np.array([_seq(a, width) for a, _ in pairs])
    gold = np.array([_seq(b, width) for _, b in pairs])
    d = np.asarray(eval_lib.edit_distance(pred, gold))
    expected = [eval_lib.levenshtein(a, b) for a, b in pairs]
    assert list(d) == expected


def test_device_metrics_match_string_semantics():
    """Device metrics must equal the host string metrics on the awkward
    cases: PAD-terminated rows without EOS (a beam that froze on PAD) and
    stray GO/PAD tokens mid-sequence — vocab.decode strips both."""
    width = 8
    rows = np.array([
        # pred: 'ab' then PAD-freeze, no EOS        -> decodes to "ab"
        [vocab.char_to_id("a"), vocab.char_to_id("b"), vocab.PAD, vocab.PAD,
         vocab.PAD, vocab.PAD, vocab.PAD, vocab.PAD],
        # pred: 'a GO b EOS'                         -> decodes to "ab"
        [vocab.char_to_id("a"), vocab.GO, vocab.char_to_id("b"), vocab.EOS,
         vocab.PAD, vocab.PAD, vocab.PAD, vocab.PAD],
        # pred: 'x PAD y EOS'                        -> decodes to "xy"
        [vocab.char_to_id("x"), vocab.PAD, vocab.char_to_id("y"), vocab.EOS,
         vocab.PAD, vocab.PAD, vocab.PAD, vocab.PAD],
    ], np.int32)
    gold = np.array([_seq("ab", width), _seq("ab", width),
                     _seq("xz", width)], np.int32)
    # host (string) semantics
    host_err, preds, golds = eval_lib.eval_word_err_rate(rows, gold)
    assert preds == ["ab", "ab", "xy"]
    assert host_err == 1
    # device semantics must agree
    em = np.asarray(eval_lib.exact_match(rows, gold))
    assert list(em) == [True, True, False]
    d = np.asarray(eval_lib.edit_distance(rows, gold))
    expected = [eval_lib.levenshtein(p, g) for p, g in zip(preds, golds)]
    assert list(d) == expected


def test_char_error_rate():
    width = 10
    pred = np.array([_seq("abc", width), _seq("abcd", width)])
    gold = np.array([_seq("abc", width), _seq("ab", width)])
    cer = np.asarray(eval_lib.char_error_rate(pred, gold))
    assert np.isclose(cer[0], 0.0)
    assert np.isclose(cer[1], 1.0)  # dist 2 / len 2, capped at 1
