"""Corpus-curation operators a training-data pipeline runs between raw
scrape and tokenizer: PII redaction, Gopher-style repetition filters,
benchmark decontamination, deterministic train/val/test splitting,
domain mixture sampling, and sequence packing.

Design rules shared with the rest of the engine:

- Row-local wherever the semantics allow (redaction, repetition
  metrics, split/mix assignment): one projection, no shuffle, whole-
  stage codegen — a 100 TB pass is a map stage.
- Deterministic and engine-portable: every random-looking choice is an
  md5-prefix threshold (see queries_functions.r_sample_hash), so the
  DuckDB oracle reproduces membership bit-for-bit and reruns are
  idempotent — resharding or re-running a 1000-executor job cannot
  change which documents survive.
- Where a shuffle is inherent (decontamination's join against the
  benchmark shingle set, packing's running sum) it is keyed to stay
  small or partition-parallel, never corpus-wide state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from map2db_spark.functions.dedup import word_shingles

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to the RE2 <-> Java-regex common subset so the
# oracle applies literally identical expressions.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9][0-9 -]{7,}[0-9]"

_PII = [("<EMAIL>", EMAIL_RE), ("<IP>", IPV4_RE), ("<PHONE>", PHONE_RE)]


def redact_pii(col) -> Column:
    """Replace emails, IPv4 addresses, and international-format phone
    numbers with typed placeholder tokens.  Order matters: emails are
    scrubbed before phones so digit runs inside addresses can't be
    re-matched.  Pure regexp projection — no Python, no shuffle."""
    out = col
    for token, pattern in _PII:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_hits(col) -> Column:
    """Total count of PII matches (pre-redaction) for audit metrics."""
    total = None
    for _, pattern in _PII:
        c = F.regexp_count(col, F.lit(pattern))
        total = c if total is None else total + c
    return total


# ---------------------------------------------------------------------------
# Repetition / quality filters (Gopher-style)
# ---------------------------------------------------------------------------


def word_ngrams_all(col, n: int) -> Column:
    """All (non-distinct) n-word shingles — repetition metrics need
    multiplicity, unlike dedup's distinct shingles."""
    tok = F.split(F.trim(col), r"\s+")
    idx = F.sequence(F.lit(0), F.size(tok) - n)
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n)))


def dup_ngram_fraction(col, n: int = 3) -> Column:
    """Fraction of n-grams that are repeats of an earlier n-gram in the
    same document: 1 - distinct/total.  The Rae et al. (Gopher, 2021)
    repeated-content signal; boilerplate and spam score high.  Row-
    local (one array pass), so the corpus sweep is a pure map."""
    grams = word_ngrams_all(col, n)
    # r13 static divide audit: a doc shorter than n tokens has zero
    # n-grams -> repetition fraction 0.0 (nothing repeats) on BOTH
    # engines instead of a Spark ANSI DIVIDE_BY_ZERO
    return F.round(
        F.when(F.size(grams) == 0, F.lit(0.0)).otherwise(
            F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams)
        ),
        6,
    )


def symbol_word_ratio(col) -> Column:
    """Non-alphanumeric symbol count over word count (Gopher uses #/…;
    we count all symbol glyphs) — high values flag markup and ASCII
    art."""
    symbols = F.regexp_count(col, F.lit(r"[^A-Za-z0-9\s]"))
    words = F.regexp_count(col, F.lit(r"[A-Za-z0-9]+"))
    return F.round(symbols / F.greatest(words, F.lit(1)), 6)


# ---------------------------------------------------------------------------
# Deterministic split / mixture sampling
# ---------------------------------------------------------------------------


def _hash_prefix(key: Column, salt: str) -> Column:
    """First two hex digits of md5(salt || key) — a uniform draw over
    256 buckets, identical in any engine with md5.  The salt decouples
    independent decisions (split vs mixing) made from the same key."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string")).cast("binary")), 1, 2)


# 256-bucket thresholds: [0,'f0') train 240/256, ['f0','f8') val 8/256,
# ['f8',..] test 8/256 — exact in hex, so membership is bit-stable.
SPLIT_SALT = "split:"
TRAIN_LT = "f0"
VAL_LT = "f8"


def split_assign(key: Column) -> Column:
    """Deterministic train/val/test assignment (93.75 / 3.125 / 3.125)
    from an md5-prefix draw on the document key.  Stable under
    resharding, appends, and re-runs — a doc's split never changes when
    the corpus around it does (contrast rand(seed), which is partition-
    layout-dependent)."""
    h = _hash_prefix(key, SPLIT_SALT)
    return (
        F.when(h < TRAIN_LT, "train").when(h < VAL_LT, "val").otherwise("test")
    )


MIX_SALT = "mix:"


def mix_keep(key: Column, domain: Column, rates: dict[str, str],
             default_lt: str) -> Column:
    """Domain-mixture downsampling: keep a document iff its md5-prefix
    draw falls under its domain's threshold (two hex digits = rate in
    256ths).  How a pipeline hits a target mixture (e.g. downweight
    crawl, keep all books) without a shuffle: membership is a row-local
    predicate, exact on any engine, and composable with split_assign
    via a different salt."""
    h = _hash_prefix(key, MIX_SALT)
    expr = F.lit(default_lt)
    for dom, lt in rates.items():
        expr = F.when(domain == dom, lt).otherwise(expr)
    return h < expr


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def contaminated_ids(
    docs: DataFrame, benchmark: DataFrame, n: int = 8,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Training docs sharing any n-gram with a benchmark/eval set (the
    GPT-3-style n-gram-collision decontamination check; production runs
    use n=13, the default here is 8 so the synthetic corpus has
    positives).  Returns (doc_id, n_hit_ngrams).

    Scale shape: the benchmark side is tiny (eval sets are KBs-MBs), so
    its exploded shingle set broadcasts; the corpus side streams
    through a broadcast-hash semi-join-like aggregation — no corpus
    shuffle, no all-pairs."""
    bench_grams = (
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("gram")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("gram"),
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit_ngrams"))
    )


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------


def pack_sequences(
    docs: DataFrame, ctx_len: int, n_shards: int = 8,
    token_col: str = "n_tokens", id_col: str = "doc_id",
) -> DataFrame:
    """Streaming sequence packing: concatenate documents in id order
    and chunk into ctx_len-token bins (bin = floor(running-prefix-sum /
    ctx_len)) — the standard concat-then-chunk packing used to fill
    training context windows.  Returns one row per doc with (shard,
    bin, doc_id).

    A single global running sum would serialize on one partition, so
    packing is sharded: shard = doc_id % n_shards, and the prefix sum
    runs per shard.  Each shard packs independently — exactly how a
    1000-executor job packs 100 TB (one shard per output file), at the
    cost of at most one under-filled final bin per shard."""
    shard = (F.col(id_col) % n_shards).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return docs.withColumn("shard", shard).select(
        "shard",
        F.floor(prev / ctx_len).cast("long").alias("bin"),
        F.col(id_col),
        F.col(token_col),
    )


TEMP_SALT = "temp:"


def temperature_rates(counts: dict[str, int], alpha: float) -> dict[str, float]:
    """Temperature-scaled downsampling rates per domain: the kept
    distribution follows p^alpha (alpha<1 flattens, 1 keeps, >1
    sharpens).  rate_d = (n_min / n_d)^(1-alpha), so the rarest domain
    keeps everything and overrepresented domains shed mass.  Both
    engines compute the same IEEE doubles from the same integer
    counts, so the keep decision below is bit-stable."""
    n_min = min(counts.values())
    return {d: (n_min / n) ** (1.0 - alpha) for d, n in counts.items()}


def temperature_keep(key: Column, rate: Column) -> Column:
    """Keep iff the md5-fraction draw (first 8 hex digits / 16^8,
    exact dyadic rational) falls under the domain's rate.  Row-local:
    no shuffle beyond the tiny broadcast of per-domain rates."""
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(TEMP_SALT), key.cast("string")).cast("binary")),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        / float(16 ** 8)
    )
    return frac < rate


def canonicalize_url(url: Column) -> Column:
    """URL canonicalization for dedup: drop query/fragment, collapse
    trailing slashes, lowercase.  The standard first pass of web-corpus
    dedup — pure column expressions, no UDF."""
    stripped = F.regexp_replace(url, r"[?#].*$", "")
    no_slash = F.regexp_replace(stripped, r"/+$", "")
    return F.lower(no_slash)


def aho_corasick_build(patterns: list[str]):
    """Build an Aho-Corasick automaton (goto trie + BFS failure links
    + output links) for one-pass multi-pattern matching — the
    contamination-screening primitive: scanning a 100 TB corpus for
    thousands of benchmark strings must cost O(text), not
    O(text x patterns).  Returns (goto, fail, out) where goto is a
    list of dict[char, state], fail a list of int, and out a list of
    tuples of pattern indices ending at that state (output links
    pre-flattened so the scan never chases fail chains for output).
    Plain-Python kernel helper, built driver-side and broadcast.

    Patterns must be non-empty and unique: an empty pattern's index
    would land in out_sets[0] but only merge into states whose fail
    link is the root — inconsistent counts rather than a clean error
    (ADVICE r9) — and duplicate patterns would silently double-count.
    """
    if not all(patterns):
        raise ValueError("aho_corasick_build: empty pattern")
    if len(set(patterns)) != len(patterns):
        raise ValueError("aho_corasick_build: duplicate patterns")
    goto: list[dict[str, int]] = [{}]
    out_sets: list[set[int]] = [set()]
    for idx, pat in enumerate(patterns):
        s = 0
        for ch in pat:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out_sets.append(set())
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out_sets[s].add(idx)
    fail = [0] * len(goto)
    from collections import deque

    q = deque(goto[0].values())  # depth-1 nodes fail to the root
    while q:
        r = q.popleft()
        for ch, s in goto[r].items():
            q.append(s)
            # deepest proper suffix of s's string that is a trie node:
            # walk r's failure chain until a state continues with ch
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            nxt = goto[f].get(ch, 0)
            fail[s] = nxt if nxt != s else 0
            out_sets[s] |= out_sets[fail[s]]
    return goto, fail, [tuple(sorted(o)) for o in out_sets]


def aho_corasick_counts(
    text: str, automaton, n_patterns: int
) -> list[int]:
    """Count ALL (overlapping included) occurrences of every pattern
    in one pass over ``text`` using a prebuilt automaton.  Returns a
    per-pattern count list."""
    goto, fail, out = automaton
    counts = [0] * n_patterns
    s = 0
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        for idx in out[s]:
            counts[idx] += 1
    return counts
