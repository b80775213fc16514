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

from mapreduce_4_spark.functions.text import words

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
    idx = F.sequence(F.lit(1), F.size("_w") - F.lit(n - 1))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice("_w", i, n)))
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


def minhash_near_duplicates(docs: DataFrame, threshold: float = 0.8,
                            n: int = 3) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs, exact-verified.

    candidates (LSH bucket join) -> verify (join shingle sets back,
    exact Jaccard >= threshold). Returns (id_a, id_b, jaccard_sim).

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
    spark = docs.sparkSession
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    sh = shingle_sets(docs, n=n).persist()
    sigs = sh.select("doc_id", minhash_signature(F.col("shingles")).alias("signature"))
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


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, banded for scale.

    Pigeonhole: distance <= 3 over 4 disjoint 16-bit chunks forces at
    least one identical chunk — join on (chunk_idx, chunk_value), then
    verify with bit_count(xor). Same shuffle-on-bucket shape as LSH.
    """
    sh = simhash_table(docs)
    chunks = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("chunk"),
                    F.shiftrightunsigned("simhash", j * 16)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("chunk_val"),
                )
                for j in range(4)
            ]
        )
    )
    banded = sh.select("doc_id", "simhash", chunks.alias("c")).select(
        "doc_id", "simhash", "c.chunk", "c.chunk_val"
    )
    left = banded.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sim_a"),
        "chunk", "chunk_val",
    )
    right = banded.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sim_b"),
        "chunk", "chunk_val",
    )
    return (
        left.join(right, ["chunk", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def exact_dedup(df: DataFrame, content_cols: list[str],
                order_col: str) -> DataFrame:
    """Keep the min-``order_col`` row per distinct content — one hash
    aggregate, the canonical 100 TB exact-dedup shape."""
    return df.groupBy(*content_cols).agg(F.min(order_col).alias(order_col))
