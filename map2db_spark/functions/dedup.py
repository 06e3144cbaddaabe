"""Deduplication operators for corpus pipelines.

Five strategies, each with a different cost/recall point:

- exact:          hash-groupBy on a content fingerprint (one shuffle)
- minhash LSH:    shingle -> k minhashes -> banded bucket join; only
                  bucket-colliding pairs are verified (near-dup at
                  scale: candidate generation is linear, verification
                  touches only collisions)
- simhash:        per-token hash bit-vote -> compact bit signature;
                  near-dups share signatures / low Hamming distance
- n-gram Jaccard: exact pairwise similarity via a shingle inverted
                  index (self-join on shingle, one shuffle; the
                  scale-accurate form of "compare all pairs")
- embedding cosine: near-dup by vector similarity (see similarity.py
                  for the int-exact cosine)

Portability rule for every hash here: md5 (identical in Spark and
DuckDB), so the DuckDB oracle can reproduce signatures bit-for-bit.
Spark's xxhash64 would be ~4x faster; swap via the HASH kwarg once
oracle parity stops mattering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_shingles(col, n: int = 3) -> Column:
    """Distinct n-word shingles of whitespace-tokenized text."""
    tok = F.split(F.trim(col), r"\s+")
    idx = F.sequence(F.lit(0), F.size(tok) - n)
    return F.array_distinct(
        F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n))
        )
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: keep the lowest id per identical content.  One
    shuffle on the fingerprint; survivors + duplicate count."""
    fp = F.md5(F.col(text_col))
    return (
        docs.select(F.col(id_col), fp.alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingle_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3, distinct: bool = True) -> DataFrame:
    """(id, shingle) exploded table — the inverted-index base for both
    MinHash signatures and exact Jaccard.

    The input is repartitioned before the explode: shingling amplifies
    work ~200x per row, so input-file partitioning (often one small
    file -> one task) is the wrong granularity for what follows.

    ``distinct=True`` (the inverted-index contract: one row per
    (doc, shingle)) builds the shingle array with higher-order
    functions + array_distinct — correct, but Spark's HOFs are
    CodegenFallback, interpreted per element.  ``distinct=False``
    keeps EVERYTHING inside whole-stage codegen (explode a sequence of
    positions, concat_ws over direct array indexing) and may emit the
    same shingle twice for a doc — exactly right for the MinHash
    signature pass, whose min-aggregate is duplicate-insensitive
    (measured ~2x faster per core at sf0.1).  Jaccard verification
    and df counts need the distinct form."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    if distinct:
        return docs.repartition(par, F.col(id_col)).select(
            F.col(id_col).alias("sid"),
            F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
        )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (
        docs.repartition(par, F.col(id_col))
        .select(F.col(id_col).alias("sid"), toks.alias("__t"))
        .where(F.size("__t") >= n)
    )
    pos = base.select(
        "sid",
        "__t",
        F.explode(F.sequence(F.lit(1), F.size("__t") - (n - 1))).alias("__i"),
    )
    return pos.select(
        "sid",
        F.concat_ws(
            " ", *[F.expr(f"__t[__i + {k} - 1]") for k in range(n)]
        ).alias("shingle"),
    )


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 8, numeric: bool = False
) -> DataFrame:
    """k minhash values per doc via one-permutation hashing: ONE md5
    per shingle, sliced into k disjoint 4-hex-digit chunks; the
    lexicographic min of chunk i across shingles is signature i.  One
    hash instead of k salted hashes per shingle (the md5 calls were
    the pipeline's hot spot), still reproducible in any engine with
    md5 + substr.  k <= 8 with 32 hex digits.

    ``numeric=True`` aggregates each chunk as its integer value
    (conv(chunk, 16, 10)) instead of the hex string.  Fixed-width
    lowercase-hex order IS numeric order, so hex -> int is an
    order-preserving bijection: min-of-int corresponds to min-of-hex
    chunk for chunk, and any equality downstream (LSH band keys) is
    preserved exactly — candidate sets and final outputs are
    IDENTICAL, value for value (pinned in tests/test_operators.py).
    Why it exists (guide §2.3 narrower types + §7.2): a min(string)
    aggregate has an immutable buffer, so Spark plans Sort +
    SortAggregate — a full sort of the exploded shingle table; the
    int form plans a partial-aggregating HashAggregate with no sort,
    and the shuffled signature row narrows from 8 hex strings to 8
    ints."""
    assert num_hashes * 4 <= 32
    h = F.md5(F.col("shingle"))

    def chunk(i: int):
        c = F.substring(h, i * 4 + 1, 4)
        if numeric:
            return F.conv(c, 16, 10).cast("int")
        return c

    aggs = [F.min(chunk(i)).alias(f"mh{i}") for i in range(num_hashes)]
    return shingles.groupBy("sid").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, num_hashes: int = 8, band_size: int = 2,
    bucket_cap: int | None = None, dedup: bool = True,
) -> DataFrame:
    """Banded LSH: docs sharing any band of minhashes become a
    candidate pair.  Bands go to long format (sid, band_idx, key) and
    ONE self-join on (band_idx, key) finds all collisions — a single
    shuffle instead of one join per band, and never all-pairs.

    ``bucket_cap`` is the skew rail: a bucket of d docs yields d^2
    candidate rows, and degenerate content (empty docs, boilerplate)
    tends to collapse into a handful of huge buckets at 100 TB.
    Buckets larger than the cap are skipped entirely — their members'
    true near-dup pairs are still found by the OTHER bands with high
    probability (a pair at Jaccard j collides per band w.p. j^r), and
    a bucket that big signals degenerate signatures, not real near
    duplicates.  Recall impact at cap c: only pairs whose every
    colliding band is oversized are lost.  The cap count rides the
    same (band_idx, bk) partitioning as the self-join — no extra
    shuffle pattern."""
    n_bands = num_hashes // band_size
    band_arr = F.array(
        *[
            F.concat_ws(
                "#", *[F.col(f"mh{b * band_size + r}") for r in range(band_size)]
            )
            for b in range(n_bands)
        ]
    )
    long = signatures.select(
        "sid", F.posexplode(band_arr).alias("band_idx", "bk")
    )
    if bucket_cap is not None:
        small = (
            long.groupBy("band_idx", "bk")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .where(F.col("bsz") <= bucket_cap)
            .select("band_idx", "bk")
        )
        long = long.join(small, ["band_idx", "bk"], "left_semi")
    left = long.select(F.col("sid").alias("id_a"), "band_idx", "bk")
    right = long.select(F.col("sid").alias("id_b"), "band_idx", "bk")
    pairs = (
        left.join(right, ["band_idx", "bk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    # ``dedup=False`` skips the distinct: a pair colliding in k bands
    # appears k times.  Correct whenever every consumer is
    # duplicate-insensitive (semi-joins, membership filters) — then
    # the distinct is a pure extra shuffle+aggregate of the pair
    # table, which at 100 TB is the largest intermediate this
    # operator produces (r15, guide §2.4).
    return pairs.distinct() if dedup else pairs


def capped_band_buckets(
    signatures: DataFrame, num_hashes: int = 8, band_size: int = 2,
    bucket_cap: int = 50, min_size: int = 2,
) -> DataFrame:
    """LSH band buckets as member ARRAYS — the one-exchange form of
    banded candidate generation (r15, guide §2.4): bands go long, ONE
    Exchange clusters (band_idx, bk), a window count filters buckets
    to ``min_size <= size <= bucket_cap`` BEFORE any member list is
    built, and the surviving members collect into an array riding the
    same partitioning (no second exchange).  Compared to the
    count + semi-join + self-join shape in lsh_candidate_pairs this
    removes the bucket-count aggregate's separate shuffle, both
    broadcast builds, and the join itself — and it is the safer shape
    at 100 TB: the semi-join path degrades to a two-sided shuffle when
    the small-bucket key set outgrows the broadcast ceiling, while
    this is a single fixed-width shuffle regardless of skew.  The
    window-before-collect ordering is load-bearing: collecting first
    and filtering on size would buffer a degenerate bucket's full
    membership (boilerplate buckets at corpus scale) in one
    aggregation buffer, where this form never materializes more than
    ``bucket_cap`` members per group.

    ``min_size=2`` drops singleton buckets (no pairs to emit), so the
    output doubles as the candidate-doc set: explode(ms) is every doc
    that participates in at least one candidate pair."""
    n_bands = num_hashes // band_size
    band_arr = F.array(
        *[
            F.concat_ws(
                "#", *[F.col(f"mh{b * band_size + r}") for r in range(band_size)]
            )
            for b in range(n_bands)
        ]
    )
    long = signatures.select(
        "sid", F.posexplode(band_arr).alias("band_idx", "bk")
    )
    from pyspark.sql import Window

    wb = Window.partitionBy("band_idx", "bk")
    return (
        long.withColumn("bsz", F.count(F.lit(1)).over(wb))
        .where((F.col("bsz") >= min_size) & (F.col("bsz") <= bucket_cap))
        .groupBy("band_idx", "bk")
        .agg(F.collect_list("sid").alias("ms"))
        .select("ms")
    )


def bucket_pairs(buckets: DataFrame) -> DataFrame:
    """All unordered member pairs (id_a < id_b) of each bucket array,
    generated INLINE (nested array transform + explode) instead of a
    self-join: with bucket_cap-bounded arrays the per-row expansion is
    <= cap^2 rows and needs no join machinery at all.  A pair
    colliding in k bands appears k times (the lsh_candidate_pairs
    dedup=False contract) — correct wherever every consumer is
    duplicate-insensitive."""
    return buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ms, (x, i) -> "
                "transform(slice(ms, i + 2, size(ms)), "
                "y -> named_struct('id_a', least(x, y), "
                "'id_b', greatest(x, y)))))"
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")


def jaccard_pairs(
    shingles: DataFrame, threshold: float = 0.5, candidates: DataFrame | None = None,
    docs_prefiltered: bool = False, df_cap: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over an inverted index: self-join on
    shingle counts the intersection; doc sizes give the union.  With
    ``candidates`` (e.g. from LSH) the join is semi-filtered first —
    the MinHash+LSH pipeline at scale; without, it is the exact
    all-overlapping-pairs computation.  ``docs_prefiltered=True``
    asserts the caller already restricted ``shingles`` to candidate
    docs (filter-before-explode), skipping the redundant semi-join +
    checkpoint here.

    ``df_cap`` is the skew rail for the no-candidates path: a shingle
    shared by d documents yields d^2 join rows, so one stopword 3-gram
    in 1M docs is a 10^12-row bucket.  Shingles with document frequency
    above the cap are dropped BEFORE the self-join (they carry ~zero
    Jaccard signal); doc sizes are computed over the same capped set so
    the result is exactly Jaccard-over-informative-shingles.  The df
    join keys on shingle — the same key as the self-join that follows,
    so the extra join is co-partitioned, not an extra shuffle pattern."""
    if df_cap is not None:
        rare = (
            shingles.groupBy("shingle")
            .agg(F.countDistinct("sid").alias("df"))
            .where(F.col("df") <= df_cap)
            .select("shingle")
        )
        shingles = shingles.join(rare, "shingle", "left_semi")
    verify_shingles = shingles
    if candidates is not None and not docs_prefiltered:
        # verification only touches docs that appear in a candidate
        # pair — at scale this collapses the shingle self-join from
        # all-docs to the (tiny) near-dup neighborhood
        cand_docs = (
            candidates.select(F.col("id_a").alias("sid"))
            .unionByName(candidates.select(F.col("id_b").alias("sid")))
            .distinct()
        )
        # persist: this small filtered table feeds three plan branches
        # (sizes + both join sides) — don't re-run the semi-join per
        # branch; persist (vs localCheckpoint) keeps lineage so a lost
        # executor recomputes instead of failing the query
        verify_shingles = shingles.join(
            F.broadcast(cand_docs), "sid", "left_semi"
        ).persist()
    # doc sizes are only needed for docs that reach verification
    sizes = verify_shingles.groupBy("sid").agg(F.countDistinct("shingle").alias("n"))
    a = verify_shingles.select(F.col("sid").alias("id_a"), "shingle")
    b = verify_shingles.select(F.col("sid").alias("id_b"), "shingle")
    joined = a.join(b, "shingle").where(F.col("id_a") < F.col("id_b"))
    if candidates is not None:
        # drop non-candidate pairs BEFORE the aggregation, not after
        joined = joined.join(F.broadcast(candidates), ["id_a", "id_b"], "left_semi")
    inter = joined.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("shared"))
    na = sizes.select(F.col("sid").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("sid").alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def overlap_pairs(
    shingles: DataFrame, threshold: float = 0.8, df_cap: int | None = None,
) -> DataFrame:
    """Overlap (Szymkiewicz-Simpson) coefficient over the shingle
    inverted index: shared / min(|A|, |B|) — the near-SUPERSET
    detector.  A short document quoted wholesale inside a long one
    scores 1.0 here but near 0 on Jaccard, which is why containment
    pruning (quotes, boilerplate inclusions, excerpt pages) needs this
    metric and not jaccard_pairs.

    Same machinery and skew rail as jaccard_pairs: one self-join on
    shingle; ``df_cap`` drops stopword shingles before the join (a
    d-doc shingle is a d^2-row bucket), and sizes are computed over
    the same capped set so the coefficient is exact over informative
    shingles."""
    if df_cap is not None:
        rare = (
            shingles.groupBy("shingle")
            .agg(F.countDistinct("sid").alias("df"))
            .where(F.col("df") <= df_cap)
            .select("shingle")
        )
        shingles = shingles.join(rare, "shingle", "left_semi")
    sizes = shingles.groupBy("sid").agg(F.countDistinct("shingle").alias("n"))
    a = shingles.select(F.col("sid").alias("id_a"), "shingle")
    b = shingles.select(F.col("sid").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na = sizes.select(F.col("sid").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("sid").alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("shared") / F.least(F.col("n_a"), F.col("n_b")), 6
            ).alias("overlap_coef"),
        )
        .where(F.col("overlap_coef") >= threshold)
    )


_HI_HEX = ("8", "9", "a", "b", "c", "d", "e", "f")


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 16) -> DataFrame:
    """SimHash bit-vote signature: bit b of a token is the high bit of
    hex digit b of md5(token) (pure string ops — reproducible in any
    engine with md5, no hex->int conversion); each bit position votes
    +1/-1 across tokens; the sign vector is the signature.
    Near-duplicate texts differ in few bits.  One explode + one
    aggregate pass computes all bit votes."""
    assert bits <= 32
    par = docs.sparkSession.sparkContext.defaultParallelism
    tok = docs.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("sid"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
    )
    tok = tok.withColumn("h", F.md5("token"))
    voted = tok.groupBy("sid").agg(
        *[
            F.sum(
                F.when(F.substring("h", b + 1, 1).isin(*_HI_HEX), 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    sig = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, 1).otherwise(0) * F.lit(2**b)
        sig = bit if sig is None else sig + bit
    return voted.select("sid", sig.cast("long").alias("simhash"))


def simhash_banded_pairs(
    sigs: DataFrame, bits: int = 16, n_bands: int = 4, max_dist: int = 3,
) -> DataFrame:
    """Scale path for SimHash near-dup: band each signature into
    ``n_bands`` equal bit segments and equi-join on exact segment
    match, then verify Hamming distance on candidates only.

    With ``n_bands > max_dist`` this is EXACT, not approximate: a pair
    within Hamming ``max_dist`` differs in at most ``max_dist`` bits,
    which can dirty at most ``max_dist`` bands, so at least one band
    matches exactly (pigeonhole) and the pair is guaranteed to be a
    candidate.  Candidate generation is a single (band_idx, band_val)
    equi-join — the same shuffle shape as banded MinHash LSH — instead
    of the all-pairs cross join of the baseline form.

    Input: (sid, simhash) from ``simhash()``.  Output: (id_a, id_b,
    hamming) — identical to the all-pairs result."""
    assert n_bands > max_dist, "exactness needs n_bands > max_dist"
    assert bits % n_bands == 0
    r = bits // n_bands
    band_arr = F.array(
        *[
            (F.shiftright(F.col("simhash"), j * r) % F.lit(2**r)).cast("int")
            for j in range(n_bands)
        ]
    )
    long = sigs.select("sid", "simhash", F.posexplode(band_arr).alias("band_idx", "bv"))
    a = long.select(
        F.col("sid").alias("id_a"), F.col("simhash").alias("sh_a"),
        "band_idx", "bv",
    )
    b = long.select(
        F.col("sid").alias("id_b"), F.col("simhash").alias("sh_b"),
        "band_idx", "bv",
    )
    return (
        a.join(b, ["band_idx", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
            .cast("int")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_dist)
        .distinct()
    )


def minhash_signatures_rowlocal(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 8, n: int = 3,
) -> DataFrame:
    """One-permutation minhash signatures computed ROW-LOCALLY: the
    min of each 4-hex-digit md5 chunk over the row's own shingle array
    (higher-order functions, no explode, no shuffle).  Value-identical
    to minhash_signatures(shingle_table(docs)) — a groupBy-min over
    exploded shingles equals an array_min over the same array.

    Trade-off (measured at sf0.1): Spark's higher-order functions are
    CodegenFallback — interpreted per element — so this runs ~2-3x
    slower per core than the exploded form, whose explode + md5 +
    partial min-agg stay inside whole-stage codegen AND whose shuffle
    is already ~1 row/doc (shingles are co-located per doc, so
    map-side combine collapses the groupBy).  Use this variant where a
    strictly map-only stage matters more than CPU — e.g. signatures
    appended during ingest of a source that must not be repartitioned;
    otherwise prefer the exploded form (what d_minhash_lsh uses).

    Docs with no shingles (< n tokens) are excluded, matching the
    exploded form where they simply produce no rows."""
    assert num_hashes * 4 <= 32
    sh = word_shingles(F.col(text_col), n)
    hashed = F.transform(sh, lambda s: F.md5(s))
    base = docs.where(F.size(sh) > 0).select(
        F.col(id_col).alias("sid"), hashed.alias("_h")
    )
    sigs = [
        F.array_min(
            F.transform("_h", lambda h: F.substring(h, i * 4 + 1, 4))
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return base.select("sid", *sigs)
