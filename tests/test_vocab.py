import numpy as np
import pytest

from aocr import vocab


def test_constants():
    assert vocab.PAD == 0 and vocab.GO == 1 and vocab.EOS == 2
    assert vocab.VOCAB_SIZE == 39


def test_char_mapping():
    # digits 0-9 -> 3..12, letters a-z -> 13..38 (reference ids minus 1).
    assert vocab.char_to_id("0") == 3
    assert vocab.char_to_id("9") == 12
    assert vocab.char_to_id("a") == 13
    assert vocab.char_to_id("z") == 38


def test_roundtrip():
    for s in ["hello", "abc123", "0", "z", "the42quick"]:
        ids = vocab.encode(s)
        assert ids[0] == vocab.GO and ids[-1] == vocab.EOS
        assert vocab.decode(ids) == s


def test_case_insensitive():
    assert vocab.encode("HeLLo") == vocab.encode("hello")


def test_invalid_char():
    with pytest.raises(ValueError):
        vocab.char_to_id("!")


def test_decode_stops_at_eos():
    ids = vocab.encode("ab") + [vocab.char_to_id("c")]
    assert vocab.decode(ids) == "ab"
    assert vocab.decode([vocab.PAD, vocab.PAD]) == ""


def test_encode_batch():
    targets, targets_eval, nnz = vocab.encode_batch(["ab", "wxyz"])
    # widths: longest seq is [GO,w,x,y,z,EOS] = 6 -> width 5
    assert targets.shape == (2, 5)
    a, b = vocab.char_to_id("a"), vocab.char_to_id("b")
    assert list(targets[0]) == [vocab.GO, a, b, vocab.PAD, vocab.PAD]
    assert list(targets_eval[0]) == [a, b, vocab.EOS, vocab.PAD, vocab.PAD]
    assert targets[1, 0] == vocab.GO and targets_eval[1, 4] == vocab.EOS
    # num_nonzeros = sum(len+1) = 3 + 5 (reference data_gen.lua:112)
    assert nnz == 8


def test_encode_batch_pad_to():
    targets, _, _ = vocab.encode_batch(["ab"], pad_to=10)
    assert targets.shape == (1, 10)
    assert (targets[0, 3:] == vocab.PAD).all()
