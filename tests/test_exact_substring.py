"""Pins for the corpus-wide exact-substring dedup operator
(operators/exact_substring.py, VERDICT r9 #1): brute force over random
small-alphabet corpora, the planted-span LCS cross-check against the
pairwise suffix-automaton half, and edge semantics (within-doc
repeats, dup-free corpora, short docs)."""

from __future__ import annotations

import random
import string
from collections import defaultdict

from map2db_spark.functions.text import longest_common_substring_len
from map2db_spark.operators.exact_substring import duplicate_spans


def brute_spans(texts: dict[int, str], window: int) -> set[tuple]:
    """Reference semantics, computed positionally: a position is
    covered iff some length-``window`` substring containing it occurs
    at >= 2 (doc, offset) positions corpus-wide; spans are maximal
    runs of covered positions."""
    occ: dict[str, list] = defaultdict(list)
    for d, t in texts.items():
        for o in range(len(t) - window + 1):
            occ[t[o : o + window]].append((d, o))
    cov: dict[int, set] = defaultdict(set)
    for ps in occ.values():
        if len(ps) >= 2:
            for d, o in ps:
                cov[d].update(range(o, o + window))
    spans = set()
    for d, positions in cov.items():
        run_start = prev = None
        for p in sorted(positions):
            if prev is None or p > prev + 1:
                if run_start is not None:
                    spans.add((d, run_start, prev + 1))
                run_start = p
            prev = p
        if run_start is not None:
            spans.add((d, run_start, prev + 1))
    return spans


def spark_spans(spark, texts: dict[int, str], window: int) -> set[tuple]:
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id LONG, text STRING"
    )
    out = duplicate_spans(df, window).collect()
    return {(r.doc_id, r.span_start, r.span_end) for r in out}


def test_operator_matches_brute_force_on_random_corpora(spark):
    # small alphabet forces natural duplicates; 8 seeded corpora
    # exercise overlap merging, adjacency, and within-doc repeats
    for seed in range(8):
        rng = random.Random(1000 + seed)
        texts = {
            d: "".join(rng.choice("ab") for _ in range(rng.randint(3, 60)))
            for d in range(12)
        }
        window = rng.choice([3, 5, 8])
        assert spark_spans(spark, texts, window) == brute_spans(
            texts, window
        ), (seed, window)


def test_planted_span_agrees_with_pairwise_lcs(spark):
    # the corpus operator and r9's pairwise suffix-automaton LCS must
    # agree on the same fixture: two docs share ONE planted span
    # (sentinel-bounded so it cannot extend), unique filler elsewhere
    rng = random.Random(77)
    alphabet = string.ascii_letters + string.digits

    def filler(n):
        return "".join(rng.choice(alphabet) for _ in range(n))

    for k in (25, 40, 61):
        span = filler(k)
        a = filler(120) + "#" + span + "#" + filler(120)
        b = filler(140) + "$" + span + "$" + filler(100)
        got = spark_spans(spark, {1: a, 2: b}, 25)
        # exactly one span per doc, of exactly the planted length
        assert {(d, e - s) for d, s, e in got} == {(1, k), (2, k)}, got
        # and the pairwise half sees the same longest verbatim block
        assert longest_common_substring_len(a, b) == k
        # span boundaries sit exactly on the plant
        assert (1, a.index(span), a.index(span) + k) in got
        assert (2, b.index(span), b.index(span) + k) in got


def test_within_doc_repeat_is_a_duplicate(spark):
    # Lee et al. count ANY >= 2 occurrences, including both inside one
    # doc: "xyxy..." self-repeats; an unrelated unique doc stays clean
    t = "0123456789ABCDEF" * 2  # every 16-window occurs twice
    texts = {1: t, 2: "qwertzuiopasdfghjklyxcvbnm-unique"}
    got = spark_spans(spark, texts, 16)
    assert got == {(1, 0, len(t))}, got


def test_dup_free_corpus_and_short_docs_emit_nothing(spark):
    texts = {1: "abcdefgh", 2: "ijklmnop", 3: "tiny"}
    assert spark_spans(spark, texts, 5) == set()
    # doc shorter than the window never crashes the sequence generator
    assert spark_spans(spark, {1: "abc"}, 5) == set()
