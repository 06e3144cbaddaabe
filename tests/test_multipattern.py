"""Aho-Corasick multi-pattern matcher (functions/curation.py): the
automaton's all-occurrence counts are pinned against a brute-force
position scan over random corpora with deliberately nested and
overlapping patterns — the failure/output-link cases naive trie
matching gets wrong."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from map2db_spark.functions.curation import (
    aho_corasick_build,
    aho_corasick_counts,
)


def naive_counts(text: str, patterns: list[str]) -> list[int]:
    return [
        sum(
            1
            for i in range(len(text))
            if text[i:i + len(p)] == p
        )
        for p in patterns
    ]


def test_nested_and_overlapping_patterns():
    pats = ["ta", "tab", "table", "a t", "art", "ba", "ab"]
    txt = "a table at a tabby bar; art starts at tab"
    a = aho_corasick_build(pats)
    assert aho_corasick_counts(txt, a, len(pats)) == naive_counts(txt, pats)


def test_empty_text_and_single_state():
    a = aho_corasick_build(["xyz"])
    assert aho_corasick_counts("", a, 1) == [0]
    assert aho_corasick_counts("xxyzyxyzz", a, 1) == [2]


@settings(max_examples=300, deadline=None)
@given(
    pats=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=4),
        min_size=1,
        max_size=6,
        unique=True,
    ),
    txt=st.text(alphabet="ab", min_size=0, max_size=60),
)
def test_matches_brute_force_tight_alphabet(pats, txt):
    # a 2-letter alphabet maximizes fail-link traffic and nesting
    a = aho_corasick_build(pats)
    assert aho_corasick_counts(txt, a, len(pats)) == naive_counts(txt, pats)


@settings(max_examples=150, deadline=None)
@given(
    pats=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=5),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    txt=st.text(alphabet="abcd", min_size=0, max_size=80),
)
def test_matches_brute_force_wider_alphabet(pats, txt):
    a = aho_corasick_build(pats)
    assert aho_corasick_counts(txt, a, len(pats)) == naive_counts(txt, pats)
