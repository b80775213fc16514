"""Deduplication operators for the LLM-data-pipeline surface.

Four families (task north star; nothing like this exists in the
reference — its word-count IS the seed text operator, SURVEY.md §2.2):

- exact:      hash-groupBy on (normalized) content, keep canonical row
- MinHash-LSH: shingle -> k-permutation signature -> banded bucket join
- SimHash:    64-bit sign-of-weighted-bits fingerprint, banded hamming join
- embedding:  cosine-threshold pairs (see operators/similarity.py for top-k)

Scale design: every operator is expressed as shuffles/joins on bounded
keys — never a driver-side loop, never an O(n^2) cross product. The LSH
band join is the 100 TB path: candidate generation cost is
O(n * bands) rows shuffled on (band, band_hash), and only hash-bucket
collisions are verified exactly. Signature/shingle construction is pure
column expressions (xxhash64 / transform / array_min) — JVM-side,
whole-stage-codegen'd, no Python in the hot path. SimHash uses an
Arrow-batched pandas UDF deliberately, as the engine's showcase of the
vectorized-UDF surface (the reference's dlopen plugin analogue, O11).
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from mapreduce_4_spark.functions.text import ngrams_join, words

# MinHash geometry: k = bands * rows. 16x4 targets the ~0.72 Jaccard
# S-curve midpoint ((1/16)^(1/4)); collisions above ~0.9 are near-certain.
MINHASH_K = 64
LSH_BANDS = 16
LSH_ROWS = 4


def shingle_sets(docs: DataFrame, n: int = 3, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(id, shingles): distinct n-word shingles per document.

    Documents with fewer than ``n`` words are dropped (no shingle is
    defined for them) — callers handle them via exact dedup instead.
    """
    ws = words(text_col)
    df = docs.select(id_col, ws.alias("_w")).filter(F.size("_w") >= n)
    # one-pass zip_with n-gram construction — see functions.text.ngrams_join
    sh = ngrams_join(F.col("_w"), n)
    return df.select(id_col, F.array_distinct(sh).alias("shingles"))


def minhash_signature(shingles: Column, k: int = MINHASH_K) -> Column:
    """k-slot signature: slot s = min over shingles of perm_s(h(shingle)).

    Each shingle is string-hashed ONCE (xxhash64); the k "permutations"
    re-hash the resulting (long, seed) pair — fixed-width input, so each
    is a handful of integer ops instead of another variable-length string
    hash, and overflow-free under ANSI mode (no raw multiply). This turns
    k*N string hashes into N string hashes + k*N integer hashes and cut
    the sf0.1 LSH benchmark ~10x. Everything stays inside codegen
    (transform/array_min), no UDF.
    """
    base = F.transform(shingles, lambda x: F.xxhash64(x))
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda s: F.array_min(F.transform(base, lambda h: F.xxhash64(h, s))),
    )


# Portable (cross-engine) MinHash family: base hash = 31-bit integer from
# the md5 hex prefix, permutations = affine maps mod the Mersenne prime
# 2^31-1 with seeded literal coefficients. Every op (md5, hex->int, *, %,
# min) is bit-identical in Spark and DuckDB, so the LSH candidate set —
# and therefore the exact-verified output — is fully oracle-checkable.
# Costs one md5 per shingle instead of one xxhash64 (same one-string-hash
# structure as the fast family; the k permutations stay integer-only and
# overflow-free: 31-bit * 31-bit < 2^62 under ANSI mode).
MERSENNE_31 = (1 << 31) - 1


def _perm_coefficients(k: int = MINHASH_K, seed: int = 7) -> list[tuple[int, int]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_31, size=k)
    b = rng.integers(0, MERSENNE_31, size=k)
    return [(int(x), int(y)) for x, y in zip(a, b)]


def _base31(x: Column) -> Column:
    """First 8 md5 hex chars -> 32-bit int -> masked to 31 bits."""
    return (
        F.conv(F.substring(F.md5(x.cast("binary")), 1, 8), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(MERSENNE_31))
    )


def minhash_signature_from_base(base: Column, k: int = MINHASH_K,
                                seed: int = 7) -> Column:
    """Signature from a PRE-COMPUTED base-hash array column.

    The k permutation expressions each reference ``base``; if that were
    an inline ``transform(shingles, md5...)`` expression, Catalyst would
    not common-subexpression-eliminate it across the k lambda bodies and
    every shingle would be md5-hashed k times (observed 3.5x wall-clock
    on the sf0.1 bench). Callers materialize the base array once — in a
    separate projection or a persisted intermediate — and pass the
    column here, restoring the one-string-hash-per-shingle structure of
    the fast family.
    """
    coef = _perm_coefficients(k, seed)
    return F.array(*[
        F.array_min(
            F.transform(base, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_31))
        )
        for a, b in coef
    ])


def minhash_signature_portable(shingles: Column, k: int = MINHASH_K,
                               seed: int = 7) -> Column:
    return minhash_signature_from_base(F.transform(shingles, _base31), k, seed)


def sql_minhash_signature(base_expr: str, k: int = MINHASH_K,
                          seed: int = 7) -> str:
    """DuckDB twin of :func:`minhash_signature_portable` over a BIGINT
    list expression (the base31 hashes)."""
    coef = _perm_coefficients(k, seed)
    slots = ", ".join(
        f"list_min([({a} * h + {b}) % {MERSENNE_31} for h in {base_expr}])"
        for a, b in coef
    )
    return f"[{slots}]"


def lsh_band_table(sigs: DataFrame, id_col: str = "doc_id",
                   sig_col: str = "signature",
                   bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> DataFrame:
    """Explode each signature into (id, band, band_hash) bucket keys."""
    band_structs = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.struct(
            j.alias("band"),
            F.xxhash64(j, F.slice(sig_col, j * rows + 1, rows)).alias("band_hash"),
        ),
    )
    return (
        sigs.select(id_col, F.explode(band_structs).alias("b"))
        .select(id_col, "b.band", "b.band_hash")
    )


def candidate_pairs(bands_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing any LSH bucket.

    Self-join shuffles on (band, band_hash); bucket sizes are tiny for
    non-duplicate data, so the join output is near-linear in true
    duplicates — this is what replaces the O(n^2) cross product at scale.
    """
    left = bands_df.select(
        F.col(id_col).alias("id_a"), "band", "band_hash"
    )
    right = bands_df.select(
        F.col(id_col).alias("id_b"), "band", "band_hash"
    )
    return (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two distinct-element arrays, in double."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b))
    return inter / union


def jaccard_prefix_candidates(sh: DataFrame, threshold: float,
                              block_col: str | None = None,
                              id_col: str = "doc_id") -> DataFrame:
    """Candidate (id_a, id_b) pairs for a Jaccard-threshold self-join,
    via prefix filtering. Guaranteed to contain EVERY pair with
    jaccard >= threshold (see prefix_filtered_jaccard_pairs for the
    lemma); hot grams never enter a prefix, so candidate volume is
    bounded by rare-gram df². Exposed separately so tests can pin the
    pruning behaviour directly.
    """
    from fractions import Fraction

    from pyspark.sql import Window

    frac = Fraction(str(threshold))
    num, den = frac.numerator, frac.denominator
    blocks = [block_col] if block_col else []

    pos = sh.select(id_col, *blocks, F.explode("shingles").alias("gram"))

    # Global order: ascending df within the block universe, gram value
    # as deterministic tie-break. Any total order is lossless; rarest-
    # first minimizes candidates. The groupBy and the join below both
    # hash-partition pos on (block, gram), so Catalyst reuses one
    # exchange of the exploded relation for both sides.
    df_tbl = pos.groupBy(*blocks, "gram").agg(F.count(F.lit(1)).alias("df"))

    # One doc_id window pass yields both the df-rank and the set size m
    # (no separate sizes join / extra shingle recompute).
    w = Window.partitionBy(id_col)
    ranked = pos.join(df_tbl, [*blocks, "gram"]).select(
        id_col,
        *blocks,
        "gram",
        F.row_number().over(w.orderBy("df", "gram")).alias("rk"),
        F.count(F.lit(1)).over(w).alias("m"),
    )
    # prefix_len = m - ceil(t*m) + 1, integer-exact:
    # ceil(num*m/den) = (num*m + den - 1) div den
    prefix_len = (
        F.col("m")
        - F.expr(f"({num} * m + {den - 1}) div {den}")
        + F.lit(1)
    )
    prefix = ranked.filter(F.col("rk") <= prefix_len).select(
        id_col, *blocks, "gram"
    )

    pa = prefix.select(F.col(id_col).alias("id_a"), *blocks, "gram")
    pb = prefix.select(F.col(id_col).alias("id_b"), *blocks, "gram")
    return (
        pa.join(pb, [*blocks, "gram"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def prefix_filtered_jaccard_pairs(sh: DataFrame, threshold: float,
                                  block_col: str | None = None,
                                  id_col: str = "doc_id") -> DataFrame:
    """EXACT Jaccard-threshold self-join via prefix filtering (the
    All-Pairs / PPJoin candidate bound), returning every pair with
    ``jaccard_sim >= threshold`` — bit-identical to the naive all-pairs
    intersect/union form, but with candidate generation bounded by
    *rare*-gram document frequency instead of Σ_gram df(gram)².

    Input ``sh`` is (id_col, [block_col], shingles: array<string>) with
    distinct shingles per row (shingle_sets output). Pairs are only
    formed within a block when ``block_col`` is given.

    Why it is lossless: order each doc's grams by a global total order
    (ascending document frequency, gram value as tie-break). For a pair
    with J(A,B) >= t the overlap obeys |A∩B| >= ceil(t·max(|A|,|B|)), so
    by the prefix-filtering lemma the first |X| - ceil(t·|X|) + 1 grams
    of each side must share at least one gram. Joining only those
    prefixes therefore finds every qualifying pair; each candidate is
    then verified with the exact pair-count form (same integers, same
    single IEEE division as the oracle's intersect/union SQL).

    Scale shape: a hot gram (stopword trigram, boilerplate header) has
    high df, ranks LAST in every doc's ordering, and never enters a
    prefix — the df² blowup the plain gram self-join suffers on
    templated corpora cannot happen. Candidate rows scale with
    Σ_{rare grams} df², prefix length is (1-t)·|doc| + 1 grams.
    Everything is hash joins + one row_number window; no UDF, no
    cartesian. ceil(t·m) is computed in exact integer arithmetic
    (t as a Fraction), so no float rounding can shorten a prefix.
    """
    # The shingle table feeds four consumers (df table, ranking, and
    # both verify sides); persist it once instead of re-running the
    # regex+explode pipeline per consumer (same discipline as
    # minhash_incremental_neardup below — MEMORY_AND_DISK, spills at
    # scale rather than OOMs). Spark's cache manager keys entries by
    # analyzed plan, so the compositions that rebuild this exact
    # lineage (neardup_survivors, dedup_clusters, curated_corpus_stats,
    # dedup_rate_by_source) share ONE entry per input, not one each;
    # the storageLevel guard skips the redundant persist call for them.
    # Entries live until session end — app-scoped, like the partsupp
    # cache in plans/tpch_partsupp.py; bounded by distinct inputs.
    from pyspark.storagelevel import StorageLevel

    if sh.storageLevel == StorageLevel.NONE:
        sh = sh.persist()
    cand = jaccard_prefix_candidates(sh, threshold, block_col, id_col)

    # Exact verify: one array intersection per surviving candidate on
    # the per-doc shingle arrays — the same integers (|A∩B|, |A∪B|) and
    # the same single IEEE division as the oracle's intersect/union SQL.
    sha = sh.select(
        F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")
    )
    shb = sh.select(
        F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")
    )
    return (
        cand.join(sha, "id_a")
        .join(shb, "id_b")
        .select("id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard_sim"))
        .filter(F.col("jaccard_sim") >= threshold)
    )


def prefix_filtered_containment_pairs(sh: DataFrame, threshold: float,
                                      block_col: str | None = None,
                                      id_col: str = "doc_id") -> DataFrame:
    """EXACT containment-threshold self-join via one-sided prefix
    filtering, returning every ORDERED pair (id_a, id_b), a != b, with
    ``containment = |A∩B| / |A| >= threshold`` — the asymmetric near-dup
    relation that catches "A is a quote/subset of B" where Jaccard is
    diluted by B's extra content (the near-dup shape of boilerplate
    inclusion, doc-in-doc quoting, and train/eval contamination).

    Losslessness (one-sided prefix lemma): order grams by a global total
    order (ascending df, gram tie-break). C(A,B) >= t implies
    |A∩B| >= ceil(t·|A|), so among the first |A| - ceil(t·|A|) + 1 grams
    of A at least one is in B. Joining A-prefixes against the FULL
    exploded gram table on the B side therefore finds every qualifying
    ordered pair; each candidate is verified with the exact integer
    intersection and one IEEE division (same ops as the oracle SQL).
    Unlike the symmetric Jaccard filter, only the probe (A) side is
    pruned — B must keep all grams, since a tiny A can be contained in
    a huge B sharing only A's rare grams.

    Scale shape: candidate volume = Σ_{A-prefix grams} df(gram); hot
    grams rank last and rarely enter prefixes, and the B side is the
    already-materialized exploded table (no second explosion). All hash
    joins + one window; no cartesian, no UDF. ceil(t·m) is exact
    integer arithmetic (Fraction), so rounding can't shorten a prefix.
    """
    from fractions import Fraction

    from pyspark.sql import Window

    frac = Fraction(str(threshold))
    num, den = frac.numerator, frac.denominator
    blocks = [block_col] if block_col else []

    from pyspark.storagelevel import StorageLevel

    if sh.storageLevel == StorageLevel.NONE:
        sh = sh.persist()

    pos = sh.select(id_col, *blocks, F.explode("shingles").alias("gram"))
    df_tbl = pos.groupBy(*blocks, "gram").agg(F.count(F.lit(1)).alias("df"))

    w = Window.partitionBy(id_col)
    ranked = pos.join(df_tbl, [*blocks, "gram"]).select(
        id_col,
        *blocks,
        "gram",
        F.row_number().over(w.orderBy("df", "gram")).alias("rk"),
        F.count(F.lit(1)).over(w).alias("m"),
    )
    prefix_len = (
        F.col("m")
        - F.expr(f"({num} * m + {den - 1}) div {den}")
        + F.lit(1)
    )
    prefix = ranked.filter(F.col("rk") <= prefix_len).select(
        F.col(id_col).alias("id_a"), *blocks, "gram"
    )
    full_b = pos.select(F.col(id_col).alias("id_b"), *blocks, "gram")
    cand = (
        prefix.join(full_b, [*blocks, "gram"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    sha = sh.select(
        F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")
    )
    shb = sh.select(
        F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")
    )
    containment = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size("sh_a")
    )
    return (
        cand.join(sha, "id_a")
        .join(shb, "id_b")
        .select("id_a", "id_b", containment.alias("containment"))
        .filter(F.col("containment") >= threshold)
    )


def minhash_near_duplicates(docs: DataFrame, threshold: float = 0.8,
                            n: int = 3,
                            hash_family: str = "portable") -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs, exact-verified.

    candidates (LSH bucket join) -> verify (join shingle sets back,
    exact Jaccard >= threshold). Returns (id_a, id_b, jaccard_sim).

    ``hash_family``: "portable" (default — md5-seeded, reproducible in
    DuckDB, so the registered query is fully oracle-checked) or "fast"
    (xxhash64-based; same structure, marginally cheaper string hash,
    not expressible outside Spark).

    The shingle table feeds three plan branches (signatures + both sides
    of the verify join); persisting it trades one corpus-sized pass of
    memory for recomputing clean+tokenize+shingle three times — the
    right trade at any scale where the shingle table fits the cluster
    (it is ~the corpus size; spill handles the rest).

    The input is repartitioned to the session's parallelism first: the
    signature stage is compute-heavy per row, and a corpus that arrives
    as a few small files would otherwise run it on as few cores
    (observed 1-task stages at sf0.1 — a single parquet file). At real
    scale the scan has thousands of splits and this shuffle is noise.
    """
    if hash_family not in ("portable", "fast"):
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    spark = docs.sparkSession
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    sh = shingle_sets(docs, n=n)
    if hash_family == "portable":
        # base md5 hashes land INSIDE the persisted intermediate: each
        # shingle is string-hashed exactly once, and the 64 affine
        # permutations below run over cached longs (inlining the md5
        # into the permutation lambdas defeats CSE — see
        # minhash_signature_from_base)
        sh = sh.withColumn("_base", F.transform("shingles", _base31))
    sh = sh.persist()
    if hash_family == "portable":
        sigs = sh.select(
            "doc_id", minhash_signature_from_base(F.col("_base")).alias("signature")
        )
    else:
        sigs = sh.select(
            "doc_id", minhash_signature(F.col("shingles")).alias("signature")
        )
    cands = candidate_pairs(lsh_band_table(sigs))
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        cands.join(sa, "id_a").join(sb, "id_b")
        .select(
            "id_a", "id_b",
            jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


def _portable_shingle_table(docs: DataFrame, n: int) -> DataFrame:
    """Persisted (doc_id, shingles, _base) under the portable family —
    each shingle md5-hashed exactly once (see minhash_signature_from_base)."""
    spark = docs.sparkSession
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    return (
        shingle_sets(docs, n=n)
        .withColumn("_base", F.transform("shingles", _base31))
        .persist()
    )


def minhash_incremental_neardup(base_docs: DataFrame, delta_docs: DataFrame,
                                threshold: float = 0.8,
                                n: int = 3) -> DataFrame:
    """Near-dups of a DELTA batch against an existing BASE corpus.

    The production dedup shape: a new crawl lands and must be checked
    against the accumulated corpus WITHOUT re-pairing the corpus against
    itself. Candidates come from joining the delta's LSH band table to
    the base's band table only — cost O(|delta| x bands) shuffled rows
    plus true bucket collisions, never O(|base|^2) and never base x base;
    at 100 TB the base band table is materialized once (e.g. a snapshot
    bucketed on (band, band_hash) via sources/versioned.py) and every
    incoming delta probes it. Uses the portable md5-seeded family, so
    the whole pipeline — candidate set and exact-Jaccard verify — is
    reproducible in any engine. Returns (delta_id, base_id, jaccard_sim).
    """
    sh_b = _portable_shingle_table(base_docs, n)
    sh_d = _portable_shingle_table(delta_docs, n)

    def _bands(sh: DataFrame) -> DataFrame:
        sigs = sh.select(
            "doc_id", minhash_signature_from_base(F.col("_base")).alias("signature")
        )
        return lsh_band_table(sigs)

    cands = (
        _bands(sh_d).select(F.col("doc_id").alias("delta_id"), "band", "band_hash")
        .join(
            _bands(sh_b).select(F.col("doc_id").alias("base_id"), "band", "band_hash"),
            ["band", "band_hash"],
        )
        .select("delta_id", "base_id")
        .distinct()
    )
    sd = sh_d.select(F.col("doc_id").alias("delta_id"), F.col("shingles").alias("sh_d"))
    sb = sh_b.select(F.col("doc_id").alias("base_id"), F.col("shingles").alias("sh_b"))
    return (
        cands.join(sd, "delta_id").join(sb, "base_id")
        .select(
            "delta_id", "base_id",
            jaccard(F.col("sh_d"), F.col("sh_b")).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


@pandas_udf(LongType())
def simhash64(words_series: pd.Series) -> pd.Series:
    """64-bit SimHash of a token array (Arrow-batched pandas UDF).

    Deterministic across processes (blake2b, not Python hash()).
    Vectorized per batch with numpy bit-unpacking; the per-document loop
    is over tokens only.
    """
    import numpy as np

    out = np.zeros(len(words_series), dtype=np.int64)
    for i, ws in enumerate(words_series):
        if ws is None or len(ws) == 0:
            continue
        digests = np.frombuffer(
            b"".join(hashlib.blake2b(w.encode(), digest_size=8).digest() for w in ws),
            dtype=np.uint8,
        ).reshape(len(ws), 8)
        bits = np.unpackbits(digests, axis=1)          # (n_words, 64) in {0,1}
        acc = (2 * bits.astype(np.int32) - 1).sum(axis=0)
        sig_bits = (acc > 0).astype(np.uint8)
        out[i] = int.from_bytes(np.packbits(sig_bits).tobytes(), "big", signed=True)
    return pd.Series(out)


def simhash_table(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    # repartition for the same small-file reason as minhash: the pandas
    # UDF parallelizes per partition, and one input file = one partition.
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    return docs.select(id_col, simhash64(words(text_col)).alias("simhash"))


def simhash_chunks_portable(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Portable SimHash-64 as four 16-bit chunk columns — pure codegen.

    Per token, one md5; its first 16 hex chars are read as four 16-bit
    ints (hex->int via conv, bit-identical in DuckDB via '0x' casts).
    Bit j's votes are accumulated as 32 packed two-lane long sums in
    ONE hash aggregate (map-side partial, single shuffle on doc_id —
    see the packed-lane block comment below); the chunk values are
    then assembled from the vote signs. No Python anywhere — unlike the
    blake2b pandas-UDF family (:func:`simhash64`, kept as the engine's
    vectorized-UDF showcase), this variant is whole-stage-codegen'd AND
    reproducible in ANSI SQL, which is what makes the registered query
    oracle-checkable.

    Documents with zero tokens have no SimHash here (they vanish at the
    explode); near-dup semantics for empty docs belong to exact dedup.
    """
    tok = docs.select(id_col, F.explode(words(text_col)).alias("_w"))
    m = F.md5(F.col("_w").cast("binary"))
    vs = [
        F.conv(F.substring(m, 1 + 4 * c, 4), 16, 10).cast("long")
        for c in range(4)
    ]
    # Packed-lane vote accumulation (round-15, guide §1.2 per-task
    # work): bits r and r+8 of each 16-bit chunk share ONE long sum in
    # two 32-bit lanes, so the aggregate runs 32 packed sums + 1 count
    # instead of 64 bit sums + 1 count (buffer 65 -> 33 longs, half the
    # update slots; measured 1.21x on the sig build, 1.16-1.2x on the
    # banded near-pair queries). Per row the two bits spread into their
    # lanes with one multiply: w = (v >> r) & 0x101 has the bits at
    # positions 0 and 8; w * (1 + 2^24) lands copies at 0/24/8/32 (no
    # two terms collide, so no carries) and masking 1 | 2^32 keeps
    # exactly bit r in lane 0 and bit r+8 in lane 1.
    #
    # Lane-overflow safety at ANY document size: a lane sum is at most
    # the doc's token count n, and n < 2^30 (tokens are >= 2 chars of a
    # < 2^31-byte string), so lane 0 can never bleed into lane 1
    # (needs n >= 2^32) and the long SUM is bounded by
    # n * (1 + 2^32) < 2^30 * 2^33 = 2^63 — no overflow, and under ANSI
    # a violated bound would fail loud, never wrap silently.
    #
    # Vote recovery: sign = 2*sum(bit) - n > 0 (round-14 identity —
    # sum(2b-1) == 2*sum(b) - n, exact integer math). The md5-derived
    # bit expressions are never null (md5 of a non-null token), so the
    # shared count(1) denominator counts exactly the rows every lane
    # sum saw — the invariant this restructure relies on.
    _SEL = (1 << 8) | 1            # bit r and bit r+8 of the chunk
    _MUL = (1 << 24) | 1           # spread 8-apart -> 32-apart
    _KEEP = (1 << 32) | 1          # lane positions 0 and 32
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in range(4):
        for r in range(8):
            packed = (
                F.shiftright(vs[c], r).bitwiseAND(F.lit(_SEL)) * F.lit(_MUL)
            ).bitwiseAND(F.lit(_KEEP))
            aggs.append(F.sum(packed).alias(f"_p{c}_{r}"))
    acc = tok.groupBy(id_col).agg(*aggs)
    chunk_cols = []
    for c in range(4):
        val = F.lit(0).cast("long")
        for r in range(16):
            lane = r // 8
            s = F.shiftrightunsigned(
                F.col(f"_p{c}_{r % 8}"), 32 * lane
            ).bitwiseAND(F.lit(0xFFFFFFFF))
            val = val + F.when(s * 2 > F.col("_n"), F.lit(1 << r)).otherwise(0)
        chunk_cols.append(val.alias(f"c{c}"))
    return acc.select(id_col, *chunk_cols)


#: Manku-style block layout for the tighter banding tier: 64 bits split
#: into 6 blocks (11+11+11+11+10+10). Hamming <= 3 touches <= 3 blocks,
#: so >= 3 of 6 blocks are IDENTICAL — some C(6,3) combination matches
#: exactly, and banding on 3-block (~32-bit) keys is lossless at d<=3.
_BLOCKS6 = [(0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10)]


def _simhash_sig4(docs: DataFrame, hash_family: str) -> DataFrame:
    """(doc_id, c0..c3) 16-bit chunk table for either hash family."""
    if hash_family == "portable":
        return simhash_chunks_portable(docs)
    if hash_family == "udf":
        sh = simhash_table(docs)
        return sh.select(
            "doc_id",
            *[
                F.shiftrightunsigned("simhash", c * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias(f"c{c}")
                for c in range(4)
            ],
        )
    raise ValueError(f"unknown hash_family: {hash_family!r}")


def _simhash_verify(banded_pairs: DataFrame, max_hamming: int) -> DataFrame:
    """Shared verify tail: exact hamming from the carried 64-bit
    signatures, dedup the multi-band candidates, apply the distance
    bound. One xor + one bit_count per candidate (round-15): the chunks
    concatenate exactly into sig64, so bit_count(sig_a ^ sig_b) equals
    the old per-chunk bit_count sum."""
    hamming = F.bit_count(
        F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long")
    return (
        banded_pairs.filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def _sig64(sig: DataFrame) -> DataFrame:
    """(doc_id, sig): the four 16-bit chunk columns reassembled into one
    long — exact bit concatenation (c3's high bit stays unsigned via the
    shift, never sign-pollutes)."""
    s = sum(F.shiftleft(F.col(f"c{c}").cast("long"), 16 * c) for c in range(4))
    return sig.select("doc_id", s.alias("sig"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3,
                       hash_family: str = "portable",
                       banding: str = "chunk4") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, banded for scale.

    ``banding`` picks the candidate-generation tier; both are lossless
    at ``max_hamming <= 3`` and produce the identical pair set
    (pinned by test):

    - ``"chunk4"``: pigeonhole over 4 disjoint 16-bit chunks — distance
      <= 3 forces at least one identical chunk; join on the packed
      ``chunk_idx * 2^16 + chunk_value`` long key. 4 band rows/doc,
      16-bit bucket keys. Candidate volume is sum(df^2) over
      2^16-value buckets — fine to ~10^8 docs, the documented caveat
      beyond (SCALE.md).
    - ``"blocks6"``: Manku et al. (WWW'07) tighter tier — 6 blocks,
      any 3 must match; join on each C(6,3)=20 packed 3-block (~33-bit
      + combo tag) long key. 5x the band rows, but bucket keys carry
      twice the bits, so bucket df collapses and sum(df^2) survives
      10^9+ docs. The ``ab_simhash_*`` bench arms measure the
      crossover at 10x docs; ``simhash_bucket_skew_report`` is the
      pre-flight diagnostic.

    Verify is identical either way: exact bit_count(xor) on the carried
    64-bit signatures, DISTINCT across bands, filter to the bound.

    ``hash_family``: "portable" (md5-derived bits, DuckDB-reproducible,
    all-JVM) or "udf" (blake2b pandas-UDF fingerprint).
    """
    # Round-15 (§2.3 shuffle fewer bytes): each banded row carries ONE
    # packed long band key (a BIJECTION of the old multi-column key —
    # not a hash, so join semantics are untouched) and ONE 64-bit
    # signature long instead of the four chunk columns; the verify tail
    # is one xor + bit_count. Banded-row width 9 cols -> 3 on both
    # self-join sides.
    sig = _sig64(_simhash_sig4(docs, hash_family))
    if banding == "chunk4":
        # key = chunk_index * 2^16 + chunk_value (chunk_value < 2^16)
        keys = F.explode(F.array(*[
            (F.lit(j << 16)
             + F.shiftrightunsigned("sig", 16 * j).bitwiseAND(F.lit(0xFFFF)))
            for j in range(4)
        ]))
        banded = sig.select("doc_id", "sig", keys.alias("key"))
        left = banded.select(
            F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"), "key"
        )
        right = banded.select(
            F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"), "key"
        )
        return _simhash_verify(left.join(right, "key"), max_hamming)
    if banding == "blocks6":
        import itertools

        # blocks extracted by unsigned shifts so c3's high bit never
        # sign-pollutes; key = combo*2^33 + k0*2^22 + k1*2^11 + k2
        # (block values < 2^11, combo < 20 — 38 bits, exact bijection)
        blocks = [
            F.shiftrightunsigned("sig", start).bitwiseAND(F.lit((1 << ln) - 1))
            for start, ln in _BLOCKS6
        ]
        combos = list(itertools.combinations(range(6), 3))
        keys = F.explode(F.array(*[
            (F.lit(ci << 33) + F.shiftleft(blocks[i], 22)
             + F.shiftleft(blocks[j], 11) + blocks[k])
            for ci, (i, j, k) in enumerate(combos)
        ]))
        banded = sig.select("doc_id", "sig", keys.alias("key"))
        left = banded.select(
            F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"), "key"
        )
        right = banded.select(
            F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"), "key"
        )
        return _simhash_verify(left.join(right, "key"), max_hamming)
    raise ValueError(f"unknown banding: {banding!r}")


def simhash_bucket_stats(docs: DataFrame, banding: str = "chunk4",
                         hash_family: str = "portable") -> DataFrame:
    """Pre-flight candidate-volume diagnostic for the SimHash tiers —
    the near-dup analogue of ``join_key_skew_report``.

    One row per band (chunk index or block combo): bucket count, hottest
    bucket df, and the exact candidate-pair volume sum(df*(df-1)/2) the
    banded self-join would generate BEFORE verify/distinct. This is the
    number to read before turning the banding dial at 10^9 docs: if
    ``chunk4``'s candidate_pairs explodes, ``blocks6`` shows what the
    tighter keys buy on the same corpus.
    """
    sig = _simhash_sig4(docs, hash_family)
    if banding == "chunk4":
        bands = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("band"),
                        F.col(f"c{j}").cast("string").alias("key"),
                    )
                    for j in range(4)
                ]
            )
        )
    elif banding == "blocks6":
        import itertools

        sig64 = sum(
            F.shiftleft(F.col(f"c{c}").cast("long"), 16 * c) for c in range(4)
        )
        blocks = [
            F.shiftrightunsigned(sig64, start).bitwiseAND(F.lit((1 << ln) - 1))
            for start, ln in _BLOCKS6
        ]
        bands = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).cast("long").alias("band"),
                        F.concat_ws(
                            ":", blocks[i].cast("string"),
                            blocks[j].cast("string"), blocks[k].cast("string")
                        ).alias("key"),
                    )
                    for ci, (i, j, k) in enumerate(
                        itertools.combinations(range(6), 3)
                    )
                ]
            )
        )
    else:
        raise ValueError(f"unknown banding: {banding!r}")
    buckets = (
        sig.select(bands.alias("b"))
        .select("b.band", "b.key")
        .groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return (
        buckets.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("df").alias("max_bucket_df"),
            (F.sum(F.col("df") * (F.col("df") - 1)) / 2)
            .cast("long").alias("candidate_pairs"),
        )
        .select("band", "n_buckets", "max_bucket_df", "candidate_pairs")
    )


def exact_dedup(df: DataFrame, content_cols: list[str],
                order_col: str) -> DataFrame:
    """Keep the min-``order_col`` row per distinct content — one hash
    aggregate, the canonical 100 TB exact-dedup shape."""
    return df.groupBy(*content_cols).agg(F.min(order_col).alias(order_col))


#: Routing threshold for choose_simhash_banding, in PRE-VERIFY candidate
#: pairs per document under chunk4 banding. Measured brackets (fixture
#: corpora; tests/test_dedup.py pins the routing): sf0.01 3.8/doc,
#: sf0.1 38/doc — chunk4 is the right plan (blocks6 pays 5x the band
#: rows for selectivity nobody needs) — while the 10x near-dup corpus
#: of the ab_simhash_* arms sits at 380/doc, the regime where chunk4's
#: 16-bit buckets go quadratic and blocks6's measured 8.9x candidate
#: cut is mandatory. 64 splits the measured decade gap; sum(df^2)
#: grows ~quadratically in corpus size so the crossing is sharp, not
#: threshold-sensitive.
SIMHASH_ROUTE_MAX_CANDS_PER_DOC = 64.0


#: (applicationId, corpus-plan semanticHash, hash_family, threshold) ->
#: chosen banding tier. The pre-flight is a full corpus-wide
#: shingle+simhash pass; without this cache every plan REbuild over the
#: same corpus pays it again at plan-construction time (the r9-advice
#: finding). Keyed by the ANALYZED plan's semantic hash, so two
#: DataFrames reading the same table route once. Staleness (same plan,
#: parquet rewritten underneath) can only mis-tune the PLAN, never the
#: answer — both tiers are lossless and oracle-pinned — so a bounded
#: plan-keyed cache is safe where one keyed on data content would need
#: invalidation machinery.
_SIMHASH_ROUTE_CACHE: dict[tuple[str, int, str, float], str] = {}


def choose_simhash_banding(docs: DataFrame, hash_family: str = "portable",
                           max_cands_per_doc: float =
                           SIMHASH_ROUTE_MAX_CANDS_PER_DOC,
                           use_cache: bool = True) -> str:
    """Pick the SimHash banding tier from the measured diagnostic, not a
    human reading it — the ``salted_join(auto=True)`` move applied to
    the near-dup dial.

    Runs the chunk4 ``simhash_bucket_stats`` pre-flight (4 aggregate
    rows + one count — bounded driver traffic at any corpus size, same
    contract as the hot-key sample in operators/partitioning.py) and
    routes to ``blocks6`` when the pre-verify candidate volume exceeds
    ``max_cands_per_doc`` candidates per document.

    The decision is cached per (app, corpus plan) — see
    ``_SIMHASH_ROUTE_CACHE`` — so only the FIRST routed build over a
    corpus pays the pre-flight pass; ``use_cache=False`` forces a
    re-measure (e.g. after rewriting the corpus in place).

    Timing caveat for benchmark readers: the pre-flight is an ACTION at
    plan-construction time, so bench.py/bench_sweep.py's ``_timed`` —
    which times materializations of an already-built plan — excludes it
    (first build per app; cached afterwards). A routed query's reported
    wall-clock is the executed tier's cost, not tier-choice + execution.
    """
    app_id = docs.sparkSession.sparkContext.applicationId
    # OPTIMIZED-plan hash (still no action — optimization is driver-side
    # and cached on the QueryExecution): collapses no-op projections so
    # re-built-but-equivalent corpus plans share one entry.
    key = (app_id, docs._jdf.queryExecution().optimizedPlan().semanticHash(),
           hash_family, max_cands_per_doc)
    if use_cache and key in _SIMHASH_ROUTE_CACHE:
        return _SIMHASH_ROUTE_CACHE[key]
    # drop dead-app entries so a long-lived process stays bounded
    for k in [k for k in _SIMHASH_ROUTE_CACHE if k[0] != app_id]:
        del _SIMHASH_ROUTE_CACHE[k]
    n_docs = docs.count()
    if n_docs == 0:
        banding = "chunk4"
    else:
        total = (
            simhash_bucket_stats(docs, banding="chunk4",
                                 hash_family=hash_family)
            .agg(F.sum("candidate_pairs").alias("c"))
            .first()["c"]
        ) or 0
        banding = "blocks6" if total / n_docs > max_cands_per_doc \
            else "chunk4"
    _SIMHASH_ROUTE_CACHE[key] = banding
    return banding


def simhash_near_pairs_routed(docs: DataFrame, max_hamming: int = 3,
                              hash_family: str = "portable") -> DataFrame:
    """``simhash_near_pairs`` with the banding tier chosen by
    :func:`choose_simhash_banding`. Both tiers emit the identical
    lossless pair set at ``max_hamming <= 3`` (oracle-pinned), so
    routing changes the PLAN only — output is tier-invariant, which is
    what makes the auto-dial safe to leave unattended at 10^9 docs."""
    banding = choose_simhash_banding(docs, hash_family=hash_family)
    return simhash_near_pairs(docs, max_hamming=max_hamming,
                              hash_family=hash_family, banding=banding)
