import numpy as np

from aocr import vocab
from aocr.utils import trie


def _walk(table, word):
    node = 0
    for c in word:
        node = table[node, vocab.char_to_id(c)]
        if node < 0:
            return None
    return node


def test_basic_words():
    table = trie.build_transition_table(["cat", "car", "dog"])
    for w in ["cat", "car", "dog"]:
        node = _walk(table, w)
        assert node is not None and node >= 0
        assert table[node, vocab.EOS] >= 0  # word end marked
    # prefix "ca" is reachable but not a word end
    node = _walk(table, "ca")
    assert node is not None
    assert table[node, vocab.EOS] < 0
    # "cx" invalid
    assert _walk(table, "cx") is None


def test_shared_prefix_nodes():
    t1 = trie.build_transition_table(["cat", "car"])
    t2 = trie.build_transition_table(["cat"])
    # "cat"+"car" shares the "ca" chain AND (post-minimization) the
    # terminal nodes + EOS leaf: same node count as "cat" alone
    assert len(t1) == len(t2) == 5  # root, c, ca, terminal, shared leaf


def test_minimization_shares_suffixes_and_leaves():
    """The table is a minimized DAWG: one shared leaf per lexicon, shared
    suffix chains — and membership semantics unchanged."""
    words = ["talking", "walking", "stalking"]
    t = trie.build_transition_table(words)
    # suffix "alking" + terminal + leaf shared: nodes = root + {t,w,s,st}
    # prefixes + 6 suffix chars + terminal + leaf
    assert len(t) < 1 + 4 + 3 * 7  # far fewer than the unshared trie
    for w in words:
        node = _walk(t, w)
        assert node is not None and t[node, vocab.EOS] >= 0
    assert _walk(t, "talkin") is not None  # prefix valid, no EOS
    assert t[_walk(t, "talkin"), vocab.EOS] < 0
    assert _walk(t, "talkingx") is None
    # one shared all-invalid leaf row
    leaf_rows = int(((t == -1).all(axis=1)).sum())
    assert leaf_rows == 1


def test_terminal_leaf_has_no_children():
    table = trie.build_transition_table(["ab"])
    node = _walk(table, "ab")
    leaf = table[node, vocab.EOS]
    assert leaf >= 0
    assert (table[leaf] == -1).all()


def test_allow_digit_prefix():
    table = trie.build_transition_table(["cat"], allow_digit_prefix=True)
    root = 0
    # digits loop back to root (reference utils.lua:193-199)
    for d in "0123456789":
        assert table[root, vocab.char_to_id(d)] == root
    # EOS from root allowed ("output nothing")
    assert table[root, vocab.EOS] == root
    # digits then a word still valid
    node = root
    for c in "42cat":
        node = table[node, vocab.char_to_id(c)]
        assert node >= 0
    assert table[node, vocab.EOS] >= 0


def test_skips_out_of_vocab_words():
    table = trie.build_transition_table(["ok", "bad-word", ""])
    assert _walk(table, "ok") is not None
    assert _walk(table, "bad") is None  # partial chain not committed...


def test_case_folding():
    table = trie.build_transition_table(["CaT"])
    assert _walk(table, "cat") is not None


def test_single_sweep_minimize_matches_fixpoint_oracle():
    """_minimize's bottom-up single sweep must produce the same DAWG as
    the iterated whole-table fixpoint (_minimize_fixpoint): identical node
    count and identical membership language — with and without the root
    self-loops of allow_digit_prefix."""
    import random

    rng = random.Random(4)
    chars = "abcdefghij"
    words = ["".join(rng.choice(chars) for _ in range(rng.randint(1, 9)))
             for _ in range(400)]
    for digit_prefix in (False, True):
        # raw (unminimized) table: bypass the builder's _minimize call
        orig = trie._minimize
        trie._minimize = lambda t: t
        try:
            raw = trie.build_transition_table(words, digit_prefix)
        finally:
            trie._minimize = orig
        fast = trie._minimize(raw)
        slow = trie._minimize_fixpoint(raw)
        assert fast.shape == slow.shape
        assert fast[0, vocab.EOS] == (0 if digit_prefix else -1)
        probes = words + ["", "a", "zz"] + [
            "".join(rng.choice(chars) for _ in range(rng.randint(1, 9)))
            for _ in range(300)]
        for w in probes:
            na, nb = _walk(fast, w), _walk(slow, w)
            assert (na is None) == (nb is None), w
            if na is not None:
                assert (fast[na, vocab.EOS] >= 0) == (slow[nb, vocab.EOS] >= 0), w
        if digit_prefix:
            assert fast[0, vocab.char_to_id("7")] == 0


def test_load_dictionary_dawg_cache(tmp_path):
    """load_dictionary caches the built DAWG next to the word list, keyed
    on source mtime+size and build options; edits invalidate it."""
    import os

    p = tmp_path / "words.txt"
    p.write_text("cat\ncar\ndog\n")
    t1 = trie.load_dictionary(str(p))
    cache = str(p) + ".dp0.dawg.npz"
    assert os.path.exists(cache)
    t2 = trie.load_dictionary(str(p))  # warm: served from cache
    np.testing.assert_array_equal(t1, t2)
    # different options get their OWN cache entry (no thrash)
    t3 = trie.load_dictionary(str(p), allow_digit_prefix=True)
    assert t3[0, vocab.EOS] == 0
    assert os.path.exists(str(p) + ".dp1.dawg.npz")
    np.testing.assert_array_equal(t1, trie.load_dictionary(str(p)))
    # edit the source (force a different mtime) -> rebuild
    p.write_text("cat\n")
    os.utime(p, ns=(1, 1))
    t4 = trie.load_dictionary(str(p))
    assert _walk(t4, "dog") is None
    # cache=False never writes
    os.remove(cache)
    trie.load_dictionary(str(p), cache=False)
    assert not os.path.exists(cache)


def test_synth90k_scale_dictionary():
    """The Synth90k lexicon is ~88k words (SURVEY.md section 6); the dense
    transition table must stay device-friendly at that scale."""
    import random

    rng = random.Random(0)
    chars = "abcdefghijklmnopqrstuvwxyz"
    words = {"".join(rng.choice(chars) for _ in range(rng.randint(3, 12)))
             for _ in range(88_000)}
    table = trie.build_transition_table(words)
    # every word resolvable and terminated
    for w in list(words)[:200]:
        node = _walk(table, w)
        assert node is not None and table[node, vocab.EOS] >= 0
    # dense table memory stays modest (< 200 MB int32)
    assert table.nbytes < 200 * 1024 * 1024
    assert table.dtype == np.int32


def test_minimize_nonroot_cycle_falls_back():
    """A cycle among non-root nodes (never produced by the builder, but
    the documented fallback contract) must route to the fixpoint oracle
    instead of diverging in the height relaxation."""
    t = np.full((3, vocab.VOCAB_SIZE), -1, np.int32)
    t[1, 5] = 2
    t[2, 5] = 1  # 1 <-> 2 cycle, no edge into the root
    out = trie._minimize(t.copy())
    np.testing.assert_array_equal(out, trie._minimize_fixpoint(t.copy()))
