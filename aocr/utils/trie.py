"""Dictionary trie as a dense transition table for on-device decoding.

The reference builds a dynamic nested-hash trie over a word list rooted at
the GO symbol (`/root/reference/src/utils/utils.lua:177-218`); beam search
walks it host-side per beam.  For TPU the trie becomes a static
(num_nodes, vocab) int32 transition table: entry [n, v] is the child node id
for emitting token v at node n, or -1 if the continuation is invalid.  The
decode loop then walks it with a single XLA gather per step.

Node 0 is the root (the reference's trie[2], the GO node).  A word's
terminal EOS edge points to a dedicated leaf node (no outgoing edges), so
after EOS only PAD continues — same freeze behavior as the reference.

`allow_digit_prefix` (utils.lua:193-199) adds root self-loops for all digit
tokens and an EOS edge from root back to root, allowing arbitrary digit
prefixes (and empty output) before a dictionary word.
"""

from __future__ import annotations

from typing import Iterable, List

import numpy as np

from aocr import vocab


def build_transition_table(
    words: Iterable[str], allow_digit_prefix: bool = False
) -> np.ndarray:
    """Build the (num_nodes, VOCAB_SIZE) int32 transition table."""
    rows: List[np.ndarray] = [np.full((vocab.VOCAB_SIZE,), -1, np.int64)]

    def new_node() -> int:
        rows.append(np.full((vocab.VOCAB_SIZE,), -1, np.int64))
        return len(rows) - 1

    root = 0
    if allow_digit_prefix:
        rows[root][vocab.EOS] = root  # "output nothing", restart at root
        for d in "0123456789":
            rows[root][vocab.char_to_id(d)] = root
    for word in words:
        word = word.strip().lower()
        if not word:
            continue
        try:
            toks = [vocab.char_to_id(ch) for ch in word]
        except ValueError:
            continue  # out-of-vocab word: skip without committing a prefix
        node = root
        for tok in toks:
            nxt = rows[node][tok]
            if nxt < 0:
                nxt = new_node()
                rows[node][tok] = nxt
            node = nxt
        if rows[node][vocab.EOS] < 0:
            rows[node][vocab.EOS] = new_node()  # terminal leaf
    return _minimize(np.stack(rows).astype(np.int32))


def _minimize(table: np.ndarray) -> np.ndarray:
    """Merge states with identical transition rows until fixpoint (Moore
    automaton minimization).  Decoding only ever consumes the transition
    function from the root — node ids appear nowhere else — so merging
    indistinguishable states is semantics-preserving and collapses the
    trie into a DAWG: every word's terminal leaf becomes ONE shared node,
    and shared word suffixes ('talking'/'walking' -> 'alking') share one
    chain.  On large flat lexicons this shrinks num_nodes several-fold,
    which is what keeps Synth90k-scale dictionaries under the VMEM gate
    of the whole-loop Pallas decode kernels (decode.py)."""
    while True:
        _, first_idx, inverse = np.unique(
            table, axis=0, return_index=True, return_inverse=True)
        if len(first_idx) == len(table):
            return table
        # renumber merge classes by first occurrence so the root stays 0
        order = np.argsort(first_idx)
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        node_to_new = rank[inverse].astype(table.dtype)
        table = table[np.sort(first_idx)].copy()
        valid = table >= 0
        table[valid] = node_to_new[table[valid]]


def load_dictionary(path: str, allow_digit_prefix: bool = False) -> np.ndarray:
    """Reference `loadDictionary`: one word per line."""
    with open(path) as f:
        return build_transition_table(f, allow_digit_prefix)
