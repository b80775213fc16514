"""Dedup queries over the documents/embeddings tables.

Every family is fully oracled, including the LSH tiers: the MinHash and
SimHash hash families are md5-seeded ("portable" — operators/dedup.py),
so DuckDB reproduces the exact candidate sets (band/chunk collisions)
and the exact verify stage bit-for-bit. The oracle joins candidates with
an OR over band-slice equalities — semantically identical to the banded
bucket join + distinct that Spark runs for scale. Recall/invariant
property tests live in tests/test_dedup.py (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import sql_words
from mapreduce_4_spark.operators.dedup import (
    LSH_BANDS,
    LSH_ROWS,
    MERSENNE_31,
    exact_dedup,
    minhash_near_duplicates,
    shingle_sets,
    simhash_near_pairs,
    sql_minhash_signature,
)
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

_WORDS_SQL = sql_words("text")

# DuckDB twin of operators.dedup._base31 over each shingle.
_SQL_BASE31 = (
    "[(CAST('0x' || substring(md5(x), 1, 8) AS BIGINT) & "
    f"{MERSENNE_31}) for x in sh]"
)

# Candidate condition: the pair shares at least one LSH band — an OR of
# band-slice equalities, which is exactly the pair set the banded bucket
# join + DISTINCT produces (DuckDB list slices are end-inclusive).
_SQL_BAND_MATCH = " OR ".join(
    f"a.sig[{j * LSH_ROWS + 1}:{(j + 1) * LSH_ROWS}] = "
    f"c.sig[{j * LSH_ROWS + 1}:{(j + 1) * LSH_ROWS}]"
    for j in range(LSH_BANDS)
)


def _sql_simhash_votes() -> str:
    """The 64 per-bit vote sums of the portable SimHash, as SQL aggs."""
    terms = []
    for j in range(64):
        c, r = divmod(j, 16)
        terms.append(f"SUM(2 * ((v{c} >> {r}) & 1) - 1) AS a{j}")
    return ", ".join(terms)


def _sql_simhash_chunks() -> str:
    """Assemble the four 16-bit chunk values from the vote signs."""
    chunks = []
    for c in range(4):
        bits = " + ".join(
            f"(CASE WHEN a{16 * c + r} > 0 THEN {1 << r} ELSE 0 END)"
            for r in range(16)
        )
        chunks.append(f"({bits}) AS c{c}")
    return ", ".join(chunks)


@register(
    "dedup_exact_docs",
    oracle="""
        SELECT md5(text) AS text_md5,
               MIN(doc_id) AS keep_doc_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
    tags=("dedup",),
    description="exact dedup: one hash aggregate, keep min doc_id per distinct text",
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("text_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, {_WORDS_SQL} AS w FROM documents
        ),
        s AS (
            SELECT doc_id, lang,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) AS sh
            FROM t WHERE len(w) >= 3
        ),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard_sim
            FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, jaccard_sim FROM pairs WHERE jaccard_sim >= 0.8
    """,
    tags=("dedup",),
    description="exact 3-gram Jaccard near-dup pairs, blocked by lang "
                "(the exact baseline the LSH path approximates)",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard without the all-pairs join the oracle SQL states:
    prefix filtering (operators/dedup.py::prefix_filtered_jaccard_pairs).
    Candidates come from joining only each doc's rarest
    (1-τ)·|doc| + 1 grams (global ascending-df order) — provably
    lossless at τ=0.8 — then each candidate verifies with ONE
    array_intersect/array_union on the per-doc shingle arrays. Same
    integers, same single IEEE division — bit-identical to the oracle's
    intersect/union form — but hot grams (df² blowup on templated
    corpora) never enter a prefix, so candidate rows scale with
    rare-gram df only: the exact-similarity-join shape that survives
    100 TB."""
    from mapreduce_4_spark.operators.dedup import prefix_filtered_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    sh = shingle_sets(docs).join(docs.select("doc_id", "lang"), "doc_id")
    return prefix_filtered_jaccard_pairs(sh, threshold=0.8, block_col="lang")


@register(
    "minhash_lsh_neardup",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_WORDS_SQL} AS w FROM documents
        ),
        s AS (
            SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) AS sh
            FROM t WHERE len(w) >= 3
        ),
        b AS (SELECT doc_id, sh, {_SQL_BASE31} AS base FROM s),
        g AS (SELECT doc_id, sh, {sql_minhash_signature('base')} AS sig FROM b),
        cand AS (
            SELECT a.doc_id AS id_a, c.doc_id AS id_b, a.sh AS sh_a, c.sh AS sh_b
            FROM g a JOIN g c
              ON a.doc_id < c.doc_id AND ({_SQL_BAND_MATCH})
        )
        SELECT id_a, id_b, jaccard_sim FROM (
            SELECT id_a, id_b,
                   CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
                     / len(list_distinct(list_concat(sh_a, sh_b))) AS jaccard_sim
            FROM cand
        ) WHERE jaccard_sim >= 0.8
    """,
    tags=("dedup", "lsh"),
    description="MinHash-LSH near-dup pairs (64-slot portable md5-seeded "
                "signature, 16x4 bands), exact-verified at Jaccard >= 0.8 — "
                "the 100 TB dedup path, oracle-checked end to end",
)
def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return minhash_near_duplicates(docs, threshold=0.8)


@register(
    "incremental_neardup_docs",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_WORDS_SQL} AS w FROM documents
        ),
        s AS (
            SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) AS sh
            FROM t WHERE len(w) >= 3
        ),
        b AS (SELECT doc_id, sh, {_SQL_BASE31} AS base FROM s),
        g AS (SELECT doc_id, sh, {sql_minhash_signature('base')} AS sig FROM b),
        cand AS (
            SELECT a.doc_id AS delta_id, c.doc_id AS base_id,
                   a.sh AS sh_d, c.sh AS sh_b
            FROM g a JOIN g c
              ON a.doc_id % 10 = 0 AND c.doc_id % 10 != 0
             AND ({_SQL_BAND_MATCH})
        )
        SELECT delta_id, base_id, jaccard_sim FROM (
            SELECT delta_id, base_id,
                   CAST(len(list_intersect(sh_d, sh_b)) AS DOUBLE)
                     / len(list_distinct(list_concat(sh_d, sh_b))) AS jaccard_sim
            FROM cand
        ) WHERE jaccard_sim >= 0.8
    """,
    tags=("dedup", "lsh", "incremental"),
    description="incremental MinHash-LSH dedup: the delta slice (doc_id % "
                "10 = 0, standing in for a new crawl batch) checked against "
                "the base corpus only — delta bands probe base bands, never "
                "base x base. The production shape where the base band table "
                "is materialized once and each arriving batch probes it.",
)
def incremental_neardup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.dedup import minhash_incremental_neardup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    return minhash_incremental_neardup(base, delta, threshold=0.8)


def _sql_simhash_sig_cte() -> str:
    """The shared WITH-chain computing the portable SimHash chunk table
    (doc_id, c0..c3) — prefix of every SimHash oracle."""
    return f"""
        WITH t AS (
            SELECT doc_id, {_WORDS_SQL} AS w FROM documents
        ),
        e AS (SELECT doc_id, md5(unnest(w)) AS m FROM t),
        v AS (
            SELECT doc_id,
                   CAST('0x' || substring(m, 1, 4) AS BIGINT) AS v0,
                   CAST('0x' || substring(m, 5, 4) AS BIGINT) AS v1,
                   CAST('0x' || substring(m, 9, 4) AS BIGINT) AS v2,
                   CAST('0x' || substring(m, 13, 4) AS BIGINT) AS v3
            FROM e
        ),
        acc AS (SELECT doc_id, {_sql_simhash_votes()} FROM v GROUP BY doc_id),
        sig AS (SELECT doc_id, {_sql_simhash_chunks()} FROM acc)"""


#: The hamming<=3 pair set. Both banding tiers are LOSSLESS at d<=3
#: (chunk4 by 4-way pigeonhole, blocks6 by Manku 3-of-6 block match),
#: so this single oracle serves both registered variants — equality of
#: the two engines' plans against one SQL statement IS the losslessness
#: check, run at every parity replay.
_SQL_SIMHASH_PAIRS = f"""
        {_sql_simhash_sig_cte()},
        p AS (
            SELECT x.doc_id AS id_a, y.doc_id AS id_b,
                   CAST(bit_count(xor(x.c0, y.c0)) + bit_count(xor(x.c1, y.c1))
                      + bit_count(xor(x.c2, y.c2)) + bit_count(xor(x.c3, y.c3))
                        AS BIGINT) AS hamming
            FROM sig x JOIN sig y
              ON x.doc_id < y.doc_id
             AND (x.c0 = y.c0 OR x.c1 = y.c1 OR x.c2 = y.c2 OR x.c3 = y.c3)
        )
        SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3
"""


@register(
    "simhash_near_pairs",
    oracle=_SQL_SIMHASH_PAIRS,
    tags=("dedup", "lsh"),
    description="SimHash-64 near-dup pairs at hamming <= 3 via 16-bit chunk "
                "banding (portable md5-derived bits, all-codegen, oracled)",
)
def simhash_near_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_near_pairs(docs, max_hamming=3)


@register(
    "simhash_near_pairs_blocks6",
    oracle=_SQL_SIMHASH_PAIRS,
    tags=("dedup", "lsh"),
    description="the SAME hamming<=3 pair set via the tighter Manku 3-of-6 "
                "block banding (20 bands of ~32-bit keys vs chunk4's 4 bands "
                "of 16-bit keys) — the dial for 10^9+ docs, oracled against "
                "the identical SQL statement as simhash_near_pairs to pin "
                "losslessness of both tiers",
)
def simhash_near_pairs_blocks6_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_near_pairs(docs, max_hamming=3, banding="blocks6")


@register(
    "simhash_bucket_skew_report",
    # Bucket statistics of the chunk4 banding: per chunk index, how many
    # distinct 16-bit bucket values occur, the hottest bucket's df, and
    # the exact candidate volume sum(df*(df-1)/2) the banded self-join
    # generates before verify. DuckDB unrolls the 4 bands as UNION ALL.
    oracle=f"""
        {_sql_simhash_sig_cte()},
        b AS (
            SELECT 0 AS band, c0 AS keyv FROM sig
            UNION ALL SELECT 1, c1 FROM sig
            UNION ALL SELECT 2, c2 FROM sig
            UNION ALL SELECT 3, c3 FROM sig
        ),
        buckets AS (
            SELECT band, keyv, COUNT(*) AS df FROM b GROUP BY band, keyv
        )
        SELECT CAST(band AS BIGINT) AS band,
               COUNT(*) AS n_buckets,
               MAX(df) AS max_bucket_df,
               CAST(SUM(df * (df - 1)) / 2 AS BIGINT) AS candidate_pairs
        FROM buckets GROUP BY band
    """,
    tags=("dedup", "lsh", "diagnostic"),
    description="pre-flight candidate-volume diagnostic for SimHash chunk4 "
                "banding: per band, bucket count / hottest-bucket df / exact "
                "pre-verify candidate pairs sum(df*(df-1)/2) — the measured "
                "number behind the SCALE.md banding dial (the near-dup "
                "analogue of join_key_skew_report)",
)
def simhash_bucket_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.dedup import simhash_bucket_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_bucket_stats(docs, banding="chunk4")


@register(
    "embedding_near_dup_pairs",
    oracle="""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])) AS cosine_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.4
    """,
    tags=("dedup", "similarity"),
    description="embedding-cosine near-dup pairs: exact result of the "
                "all-pairs oracle via angular block-bound pruning + GEMM "
                "verify — no quadratic join in the plan (the approximate "
                "LSH variant is similarity_lsh_topk)",
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tier of the embedding near-dup capability. The oracle states
    the naive all-pairs semantics; the Spark plan computes the identical
    pair set via k-means blocks + a provable block-level cosine upper
    bound + vectorized verify (operators/similarity.py::
    exact_cosine_pairs) — hash joins only, no BroadcastNestedLoopJoin,
    pinned by tests/test_plan_properties.py."""
    from mapreduce_4_spark.operators.similarity import exact_cosine_pairs

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return exact_cosine_pairs(emb, threshold=0.4, dim=64, n_blocks=16)


from mapreduce_4_spark.registry import REGISTRY as _REG

_PAIRS_SQL = _REG["ngram_jaccard_pairs"].oracle


@register(
    "neardup_survivors",
    oracle=f"""
        WITH all_pairs AS ({_PAIRS_SQL})
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT id_b FROM all_pairs)
    """,
    tags=("dedup",),
    description="the dedup keep-list: documents surviving near-dup removal "
                "(every id_b of a >=0.8 pair is dominated by its id_a)",
)
def neardup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    dominated = ngram_jaccard_pairs(spark, sf_dir).select(
        F.col("id_b").alias("doc_id")
    )
    return docs.select("doc_id").join(dominated, "doc_id", "left_anti")


@register(
    "dedup_clusters",
    oracle=f"""
        WITH RECURSIVE pairs AS ({_PAIRS_SQL}),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        reach AS (
            SELECT doc_id AS node, doc_id AS reached FROM documents
            UNION
            SELECT r.node, e.dst AS reached
            FROM reach r JOIN edges e ON r.reached = e.src
        )
        SELECT node AS doc_id, MIN(reached) AS cluster_id
        FROM reach GROUP BY node
    """,
    tags=("dedup", "iterative"),
    description="near-dup cluster assignment: connected components over the "
                "exact 3-gram-Jaccard pair set via distributed label "
                "propagation, oracled with a recursive transitive closure. "
                "The LSH-candidate variant of the same operator is covered "
                "by tests/test_dedup.py.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.clustering import dedup_cluster_assignments

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = ngram_jaccard_pairs(spark, sf_dir)
    return dedup_cluster_assignments(docs, pairs)


@register(
    "dedup_exact_events",
    oracle="""
        SELECT user_id, event_type, value, MIN(event_id) AS event_id
        FROM events
        GROUP BY user_id, event_type, value
    """,
    tags=("dedup",),
    description="generic exact dedup on a multi-column content key",
)
def dedup_exact_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    return exact_dedup(ev, ["user_id", "event_type", "value"], "event_id")


_EMB_PAIRS = _REG["embedding_near_dup_pairs"].oracle
_CASCADE_TAU = 0.5


@register(
    "cascade_embedding_text_verify",
    oracle=f"""
        WITH pairs AS ({_EMB_PAIRS}),
        t AS (
            SELECT doc_id, {_WORDS_SQL} AS w FROM documents
        ),
        s AS (
            SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) AS sh
            FROM t WHERE len(w) >= 3
        )
        SELECT p.id_a, p.id_b, p.cosine_sim,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.sh, b.sh)))
                   AS text_jaccard,
               (CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.sh, b.sh)))
                   >= {_CASCADE_TAU}) AS confirmed
        FROM pairs p
        LEFT JOIN s a ON p.id_a = a.doc_id
        LEFT JOIN s b ON p.id_b = b.doc_id
    """,
    tags=("dedup", "similarity", "pipeline"),
    description="two-tier near-dup CASCADE: the cheap semantic filter "
                "(exact embedding-cosine pairs >= 0.4, blocked GEMM "
                "tier) hands its candidates to an exact 3-gram Jaccard "
                "TEXT verify (docs joined on the shared id domain, "
                f"confirmed at >= {_CASCADE_TAU}; NULL when a side is "
                "too short to shingle — 'no text evidence' stays "
                "distinct from 'refuted'). The production "
                "filter-then-verify shape: the expensive text "
                "comparison runs only on the vector tier's survivors, "
                "never corpus x corpus",
)
def cascade_embedding_text_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.similarity import exact_cosine_pairs

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pairs = exact_cosine_pairs(emb, threshold=0.4, dim=64, n_blocks=16)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = shingle_sets(docs, n=3)
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_distinct(F.concat("sh_a", "sh_b")))
    )
    return (
        pairs.join(sa, "id_a", "left")
        .join(sb, "id_b", "left")
        .select(
            "id_a", "id_b", "cosine_sim",
            jac.alias("text_jaccard"),
            (jac >= _CASCADE_TAU).alias("confirmed"),
        )
    )
