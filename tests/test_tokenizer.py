"""viterbi_tokenize (functions/text.py): the unigram-LM min-cost
segmentation DP is pinned against brute-force enumeration over random
words and vocabularies, plus deterministic hand cases — the property
backing t_unigram_viterbi's closed-form fixture argument."""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

from map2db_spark.functions.text import viterbi_tokenize

VOCAB = {"a": 100, "b": 100, "c": 100, "x": 100, "ab": 140, "abc": 150}


def brute_force(word, vocab, unk_cost=500):
    """Enumerate EVERY segmentation (cut set powerset), score it, take
    the min by (cost, tokens) — exponential, ground truth for small
    words."""
    n = len(word)
    if n == 0:
        return (0, 0)
    best = None
    for cuts in itertools.product([0, 1], repeat=n - 1):
        pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        cost = toks = 0
        ok = True
        for a, b in zip(pos, pos[1:]):
            piece = word[a:b]
            c = vocab.get(piece)
            if c is None:
                if b - a != 1:
                    ok = False
                    break
                c = unk_cost
            cost += c
            toks += 1
        if ok:
            cand = (cost, toks)
            best = cand if best is None or cand < best else best
    return (best[1], best[0])


def test_hand_cases():
    assert viterbi_tokenize("abcabc", VOCAB) == (2, 300)
    assert viterbi_tokenize("abab", VOCAB) == (2, 280)
    assert viterbi_tokenize("abcab", VOCAB) == (2, 290)
    assert viterbi_tokenize("q", VOCAB) == (1, 500)
    assert viterbi_tokenize("", VOCAB) == (0, 0)
    # UNK never merges into multi-char pieces
    assert viterbi_tokenize("qq", VOCAB) == (2, 1000)


def test_fixture_group_decomposition():
    """The t_unigram_viterbi fixture's closed form: no vocab piece
    spans a group boundary, so cost decomposes per group."""
    for d in range(60):
        word = (
            "abc" * (1 + d % 4) + "ab" * (d % 3) + "x" * (d % 2)
            + ("q" if d % 5 == 0 else "")
        )
        toks, cost = viterbi_tokenize(word, VOCAB)
        exp_toks = (1 + d % 4) + (d % 3) + (d % 2) + (1 if d % 5 == 0 else 0)
        exp_cost = (
            150 * (1 + d % 4) + 140 * (d % 3) + 100 * (d % 2)
            + (500 if d % 5 == 0 else 0)
        )
        assert (toks, cost) == (exp_toks, exp_cost), (d, word)


@settings(max_examples=200, deadline=None)
@given(
    word=st.text(alphabet="abcx", min_size=0, max_size=10),
    extra=st.dictionaries(
        st.text(alphabet="abcx", min_size=2, max_size=3),
        st.integers(min_value=1, max_value=400),
        max_size=4,
    ),
)
def test_matches_brute_force(word, extra):
    vocab = {**{ch: 100 for ch in "abcx"}, **extra}
    assert viterbi_tokenize(word, vocab) == brute_force(word, vocab)


@settings(max_examples=100, deadline=None)
@given(word=st.text(alphabet="abq", min_size=0, max_size=9))
def test_matches_brute_force_with_unks(word):
    # 'q' is out-of-vocab: brute force and DP must agree on UNK
    # placement and cost
    vocab = {"a": 90, "b": 110, "ab": 150, "ba": 130}
    assert viterbi_tokenize(word, vocab) == brute_force(word, vocab)
