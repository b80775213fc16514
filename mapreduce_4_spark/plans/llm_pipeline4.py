"""Round-6 LLM-pipeline queries: corpus-level duplicated-n-gram fraction
(the cross-document boilerplate signal), deterministic shard assignment
(the global-shuffle step of training-shard construction), and the
cross-source contamination matrix. All fully oracle-checked.

These complete the quality-signal family: ``repetition_ratio_docs``
measures WITHIN-document repetition; ``dup_ngram_fraction_docs`` below
measures repetition ACROSS the corpus — the signal C4-style pipelines
use to find boilerplate (navigation chrome, license headers, templated
spans) that exact and near dedup both miss because the containing
documents differ.

Reference anchor: both are one-key aggregations in the reference's
Map -> Shuffle -> Reduce contract (asio_deep/main.cpp:345-431),
generalized to gram- and shard-keyed spaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import ngrams_join, sql_words, words
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

_W = sql_words("text")

#: gram order for the cross-corpus duplication signal. 3 balances the
#: fixture's tiny vocabulary (higher n ~ no collisions, lower n ~ all
#: collisions); production pipelines use 8-13 on natural text — the
#: plan shape is n-independent.
_DUP_N = 3

#: number of training shards for the deterministic global shuffle. A
#: real run sizes this to the trainer's data-parallel world size (and
#: the window's per-shard sort parallelism scales with it).
_N_SHARDS = 16


@register(
    "dup_ngram_fraction_docs",
    oracle=f"""
        WITH g AS (
            SELECT doc_id,
                   CASE WHEN len({_W}) >= {_DUP_N} THEN
                       [{_W}[i] || ' ' || {_W}[i+1] || ' ' || {_W}[i+2]
                        for i in range(1, len({_W}) - 1)]
                   ELSE [] END AS grams
            FROM documents
        ),
        pos AS (SELECT doc_id, unnest(grams) AS gram FROM g),
        df AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM pos GROUP BY gram),
        per AS (
            SELECT pos.doc_id,
                   COUNT(*) AS n_grams,
                   CAST(SUM(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_grams
            FROM pos JOIN df USING (gram)
            GROUP BY pos.doc_id
        )
        SELECT doc_id, n_grams, n_dup_grams,
               CAST(n_dup_grams AS DOUBLE) / n_grams AS dup_fraction
        FROM per
    """,
    tags=("pipeline", "text", "dedup"),
    description="cross-corpus duplicated-n-gram fraction per document: "
                "the share of a doc's n-gram positions whose gram occurs "
                "in >= 2 distinct documents — the boilerplate/template "
                "signal that catches repeated spans exact and near dedup "
                "miss (the containing docs differ). Docs shorter than n "
                "words are excluded on both engines.",
)
def dup_ngram_fraction_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No corpus-sized join-back (round-15, guide §2.3 "shuffle keys and
    metadata instead of payloads" / §2.4): the old shape joined EVERY
    gram position back to the per-gram doc-frequency table — the full
    position stream shuffled a second time carrying gram strings. But
    the per-doc answer only needs (a) the doc's total positions, which
    is ``size(w) - n + 1`` straight off the token array (no explode at
    all), and (b) how many of its positions carry a gram UNIQUE to it
    corpus-wide — and a gram with nd == 1 has exactly ONE owning doc, so
    the gram aggregate itself can route that count to its owner
    (min(doc_id) == the only doc_id) without any join against the
    position stream. n_dup = n_grams - unique_positions. Identical
    output, all-integer arithmetic (measured equal row-for-row and
    1.4x at sf0.1; oracle SQL unchanged).

    Shuffles at any scale: positions pre-aggregate to distinct
    (doc, gram, count) pairs (map-side combine), the pair table
    re-keys by gram for the nd/owner/count aggregate, and the per-doc
    unique totals (doc-keyed, tiny after combine) join the per-doc
    gram totals doc-to-doc. Nothing corpus-positional ever shuffles
    twice, and no shuffle carries gram strings as payload-plus-key
    twice the way the join-back did.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # materialize the token array as a projected column BEFORE the gram
    # transform: referencing the tokenizer expression inside the
    # per-position lambda re-evaluates it per gram (no CSE through
    # lambda scopes) — measured 8x slower
    toks = docs.select("doc_id", words("text").alias("w")).filter(
        F.size("w") >= _DUP_N
    )
    grams = ngrams_join(F.col("w"), _DUP_N)
    pos = toks.select("doc_id", F.explode(grams).alias("gram"))
    # distinct (doc, gram) pairs with their position counts — the only
    # corpus-positional shuffle, map-side combined
    cnt = pos.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    gram_agg = cnt.groupBy("gram").agg(
        F.count(F.lit(1)).alias("nd"),       # distinct docs (pairs are distinct)
        F.min("doc_id").alias("owner"),
        F.sum("c").alias("tc"),              # == c of the owner when nd == 1
    )
    uniq = (
        gram_agg.filter(F.col("nd") == 1)
        .groupBy(F.col("owner").alias("doc_id"))
        .agg(F.sum("tc").alias("uc"))
    )
    total = toks.select(
        "doc_id",
        (F.size("w") - F.lit(_DUP_N - 1)).cast("long").alias("n_grams"),
    )
    return (
        total.join(uniq, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            (F.col("n_grams") - F.coalesce(F.col("uc"), F.lit(0)))
            .alias("n_dup_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_dup_grams",
            (F.col("n_dup_grams").cast("double") / F.col("n_grams")).alias(
                "dup_fraction"
            ),
        )
    )


@register(
    "shard_assignment_docs",
    oracle=f"""
        WITH h AS (
            SELECT doc_id, lang,
                   md5(CAST(doc_id AS VARCHAR) || ':shard') AS hkey
            FROM documents
        )
        SELECT doc_id, lang,
               CAST(CAST('0x' || substring(hkey, 1, 8) AS BIGINT)
                    % {_N_SHARDS} AS BIGINT) AS shard,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY CAST('0x' || substring(hkey, 1, 8) AS BIGINT)
                                % {_N_SHARDS}
                   ORDER BY hkey, doc_id) AS BIGINT) AS pos
        FROM h
    """,
    tags=("pipeline", "sampling"),
    description="deterministic global shuffle into training shards: "
                "md5-keyed shard id + within-shard position, so every "
                "engine (and every rerun) materializes byte-identical "
                "shard files — the reproducible data-order contract "
                "training jobs need for resume and ablation",
)
def shard_assignment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle: hash-partition by shard, sort within shard by the
    md5 key (window row_number). Parallelism equals _N_SHARDS — sized
    to the trainer's world size in production, where each shard then
    writes one ordered file via write.partitionBy(shard)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    hkey = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shard")))
    shard = (
        F.conv(F.substring(F.col("hkey"), 1, 8), 16, 10).cast("long")
        % _N_SHARDS
    )
    w = Window.partitionBy("shard").orderBy(F.asc("hkey"), F.asc("doc_id"))
    return (
        docs.withColumn("hkey", hkey)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "lang", "shard", "pos")
    )


@register(
    "source_overlap_matrix",
    oracle=f"""
        WITH g AS (
            SELECT source,
                   CASE WHEN len({_W}) >= {_DUP_N} THEN
                       [{_W}[i] || ' ' || {_W}[i+1] || ' ' || {_W}[i+2]
                        for i in range(1, len({_W}) - 1)]
                   ELSE [] END AS grams
            FROM documents
        ),
        sg AS (SELECT DISTINCT source, unnest(grams) AS gram FROM g),
        m AS (SELECT source, COUNT(*) AS n FROM sg GROUP BY source),
        inter AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   COUNT(*) AS shared_grams
            FROM sg a JOIN sg b
              ON a.gram = b.gram AND a.source < b.source
            GROUP BY a.source, b.source
        )
        SELECT source_a, source_b, shared_grams,
               CAST(shared_grams AS DOUBLE)
                   / (ma.n + mb.n - shared_grams) AS gram_jaccard
        FROM inter
        JOIN m ma ON ma.source = inter.source_a
        JOIN m mb ON mb.source = inter.source_b
    """,
    tags=("pipeline", "text", "dedup"),
    description="cross-source contamination matrix: distinct shared "
                "n-grams and gram-set Jaccard for every source pair — "
                "the corpus-curation view of duplication (which feeds "
                "mirror which), at source granularity where doc-level "
                "dedup reports pairs",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact-similarity-join shape as ngram_jaccard_pairs one level
    up: distinct (source, gram) explode -> gram self-join -> pair count,
    sizes joined back; |A∪B| = m_a + m_b − inter keeps the division
    bit-identical to the oracle. The (source, gram) relation is
    vocabulary-sized, so every stage is small at any corpus scale."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    toks = docs.select("source", words("text").alias("w")).filter(
        F.size("w") >= _DUP_N
    )
    grams = ngrams_join(F.col("w"), _DUP_N)
    sg = toks.select("source", F.explode(grams).alias("gram")).distinct()
    m = sg.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sg.select(F.col("source").alias("source_a"), "gram")
    b = sg.select(F.col("source").alias("source_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    ma = m.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    mb = m.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        inter.join(ma, "source_a")
        .join(mb, "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_grams",
            (
                F.col("shared_grams").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("shared_grams"))
            ).alias("gram_jaccard"),
        )
    )
