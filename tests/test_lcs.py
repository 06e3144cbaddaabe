"""Suffix-automaton longest-common-substring (functions/text.py):
pinned against the quadratic brute force over random strings — the
property behind d_longest_common_span's planted-span oracle."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from map2db_spark.functions.text import longest_common_substring_len


def brute(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while (
                i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]
            ):
                k += 1
            best = max(best, k)
    return best


def test_hand_cases():
    assert longest_common_substring_len("", "abc") == 0
    assert longest_common_substring_len("abc", "") == 0
    assert longest_common_substring_len("abc", "abc") == 3
    assert longest_common_substring_len("abcdef", "zcdezz") == 3
    assert longest_common_substring_len("aaaa", "aa") == 2
    # clone-heavy construction: repeated periodic content
    assert longest_common_substring_len("abab" * 5, "babab") == 5


@settings(max_examples=300, deadline=None)
@given(
    a=st.text(alphabet="ab", min_size=0, max_size=30),
    b=st.text(alphabet="ab", min_size=0, max_size=30),
)
def test_matches_brute_force_tight_alphabet(a, b):
    # 2-letter alphabet maximizes suffix-link clones
    assert longest_common_substring_len(a, b) == brute(a, b)


@settings(max_examples=200, deadline=None)
@given(
    a=st.text(alphabet="abcd", min_size=0, max_size=40),
    b=st.text(alphabet="abcd", min_size=0, max_size=40),
)
def test_matches_brute_force_wider_alphabet(a, b):
    assert longest_common_substring_len(a, b) == brute(a, b)
