"""Round-8 pipeline-selection additions: Gopher-style rule filtering,
intra-document repetition scrubbing, quality-aware dedup survivors,
token-budget mixture planning, and packing-efficiency reporting.

Each stage is a named production step of a pretraining-data pipeline
(Rae et al. Gopher rules; self-repetition trimming; "keep the best, not
the first" cluster representatives; the mixture/budget planning that
precedes shard construction) expressed as pure Catalyst plans — column
expressions, hash aggregates, and one window — with exact DuckDB twins.
Cross-engine float discipline: every emitted double is either a single
IEEE division of exact integers or a decimal-accumulated sum cast once,
so value hashes are bit-identical (see tests/oracle.py).

Reference anchor: generalizes the reference's reduce stage
(asio_deep/main.cpp:434-516) to corpus-curation aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import sql_words, words
from mapreduce_4_spark.registry import REGISTRY
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

_W = sql_words("text")

#: Gopher-ish rule constants (Rae et al. 2021 table A1, adapted to the
#: fixture's vocabulary): word-count band, mean-word-length band,
#: symbol-to-word ceiling, alphabetic-word floor, stopword floor.
_G_MIN_WORDS, _G_MAX_WORDS = 50, 100_000
_G_MIN_MWL, _G_MAX_MWL = 3.0, 10.0
_G_MAX_SYMBOL_RATIO = 0.1
_G_MIN_ALPHA_FRAC = 0.8
_G_MIN_STOPWORDS = 2
_G_STOPWORDS = ("the", "a", "of", "to", "and", "in", "be", "have",
                "that", "with")


@register(
    "gopher_quality_docs",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, text, {_W} AS w FROM documents
        ),
        f AS (
            SELECT doc_id,
                   len(w) AS n_words,
                   CAST(list_sum(list_transform(w, x -> length(x)))
                        AS DOUBLE) / len(w) AS mean_word_len,
                   CAST(length(text)
                        - length(replace(replace(text, '#', ''), '…', ''))
                        AS DOUBLE) / len(w) AS symbol_ratio,
                   CAST(len(list_filter(w,
                            x -> regexp_matches(x, '[a-zA-Z]')))
                        AS DOUBLE) / len(w) AS alpha_frac,
                   len(list_filter(w, x -> list_contains(
                       {list(_G_STOPWORDS)}, x))) AS n_stopwords
            FROM t WHERE len(w) > 0
        )
        SELECT doc_id, n_words, mean_word_len,
               (n_words BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS})
                   AS word_count_ok,
               (mean_word_len BETWEEN {_G_MIN_MWL} AND {_G_MAX_MWL})
                   AS mean_len_ok,
               (symbol_ratio <= {_G_MAX_SYMBOL_RATIO}) AS symbol_ok,
               (alpha_frac >= {_G_MIN_ALPHA_FRAC}) AS alpha_ok,
               (n_stopwords >= {_G_MIN_STOPWORDS}) AS stopword_ok,
               ((n_words BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS})
                AND (mean_word_len BETWEEN {_G_MIN_MWL} AND {_G_MAX_MWL})
                AND symbol_ratio <= {_G_MAX_SYMBOL_RATIO}
                AND alpha_frac >= {_G_MIN_ALPHA_FRAC}
                AND n_stopwords >= {_G_MIN_STOPWORDS}) AS keep
        FROM f
    """,
    tags=("text", "pipeline", "quality"),
    description="Gopher-style rule filter: word-count band, mean word "
                "length, symbol-to-word ratio, alphabetic-word fraction, "
                "stopword floor — per-doc flags + keep verdict, pure "
                "column expressions (one scan, no shuffle)",
)
def gopher_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = words("text")
    t = docs.select("doc_id", "text", w.alias("w")).filter(F.size("w") > 0)
    n = F.size("w")
    mean_wl = (
        F.aggregate("w", F.lit(0).cast("long"),
                    lambda acc, x: acc + F.length(x)).cast("double") / n
    )
    sym = F.length("text") - F.length(
        F.replace(F.replace(F.col("text"), F.lit("#"), F.lit("")),
                  F.lit("…"), F.lit(""))
    )
    alpha = F.size(F.filter("w", lambda x: x.rlike("[a-zA-Z]")))
    stops = F.size(
        F.filter("w", lambda x: x.isin(*_G_STOPWORDS))
    )
    f = t.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        (sym.cast("double") / n).alias("symbol_ratio"),
        (alpha.cast("double") / n).alias("alpha_frac"),
        stops.cast("long").alias("n_stopwords"),
    )
    word_ok = F.col("n_words").between(_G_MIN_WORDS, _G_MAX_WORDS)
    mwl_ok = F.col("mean_word_len").between(_G_MIN_MWL, _G_MAX_MWL)
    sym_ok = F.col("symbol_ratio") <= _G_MAX_SYMBOL_RATIO
    alpha_ok = F.col("alpha_frac") >= _G_MIN_ALPHA_FRAC
    stop_ok = F.col("n_stopwords") >= _G_MIN_STOPWORDS
    return f.select(
        "doc_id", "n_words", "mean_word_len",
        word_ok.alias("word_count_ok"),
        mwl_ok.alias("mean_len_ok"),
        sym_ok.alias("symbol_ok"),
        alpha_ok.alias("alpha_ok"),
        stop_ok.alias("stopword_ok"),
        (word_ok & mwl_ok & sym_ok & alpha_ok & stop_ok).alias("keep"),
    )


_TRIM_BLOCK = 8


@register(
    "intra_doc_repeat_trim",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_W} AS w FROM documents
            WHERE len({_W}) > 0
        ),
        b AS (
            SELECT doc_id, len(w) AS n_tokens,
                   list_transform(
                       range(0, CAST(ceil(len(w) / {_TRIM_BLOCK}.0) AS BIGINT)),
                       i -> array_to_string(
                           w[i * {_TRIM_BLOCK} + 1 : i * {_TRIM_BLOCK} + {_TRIM_BLOCK}],
                           ' ')) AS blocks
            FROM t
        ),
        k AS (
            SELECT doc_id, n_tokens,
                   array_to_string(
                       [blocks[i] FOR i IN range(1, len(blocks) + 1)
                        IF list_position(blocks, blocks[i]) = i],
                       ' ') AS cleaned
            FROM b
        )
        SELECT doc_id, n_tokens,
               CAST(len(string_split(cleaned, ' ')) AS BIGINT) AS n_kept,
               n_tokens - CAST(len(string_split(cleaned, ' ')) AS BIGINT)
                   AS n_trimmed,
               md5(cleaned) AS cleaned_md5
        FROM k
    """,
    tags=("text", "pipeline", "dedup"),
    description="intra-document repetition scrub: tokens fold into "
                f"non-overlapping {_TRIM_BLOCK}-token blocks and every "
                "repeat of an earlier block IN THE SAME doc is removed "
                "(the self-repetition trim for looped/boilerplate text — "
                "the within-doc complement of block_dedup_docs); emits "
                "kept/trimmed counts + md5 of the cleaned text. Pure "
                "higher-order column expressions, zero shuffles",
)
def intra_doc_repeat_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = docs.select(
        "doc_id", words("text").alias("w")
    ).filter(F.size("w") > 0)
    nb = F.ceil(F.size("w") / F.lit(float(_TRIM_BLOCK))).cast("int")
    blocks = F.transform(
        F.sequence(F.lit(0), nb - 1),
        lambda i: F.concat_ws(
            " ", F.slice("w", i * _TRIM_BLOCK + 1, _TRIM_BLOCK)
        ),
    )
    b = t.select("doc_id", F.size("w").cast("long").alias("n_tokens"),
                 blocks.alias("blocks"))
    kept = F.filter(
        "blocks",
        lambda x, i: F.array_position("blocks", x) == i.cast("long") + 1,
    )
    k = b.select(
        "doc_id", "n_tokens",
        F.concat_ws(" ", kept).alias("cleaned"),
    )
    n_kept = F.size(F.split("cleaned", " ")).cast("long")
    return k.select(
        "doc_id", "n_tokens",
        n_kept.alias("n_kept"),
        (F.col("n_tokens") - n_kept).alias("n_trimmed"),
        F.md5(F.col("cleaned").cast("binary")).alias("cleaned_md5"),
    )


_PAIRS_SQL = REGISTRY["ngram_jaccard_pairs"].oracle


@register(
    "neardup_best_survivors",
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
        ),
        clusters AS (
            SELECT node AS doc_id, MIN(reached) AS cluster_id
            FROM reach GROUP BY node
        ),
        q AS (
            SELECT doc_id,
                   CAST(len(list_distinct({_W})) AS DOUBLE) / len({_W})
                       AS uniq_ratio
            FROM documents WHERE len({_W}) > 0
        ),
        ranked AS (
            SELECT c.cluster_id, c.doc_id, q.uniq_ratio,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.cluster_id
                       ORDER BY q.uniq_ratio DESC, c.doc_id
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY c.cluster_id)
                       AS cluster_size
            FROM clusters c JOIN q USING (doc_id)
        )
        SELECT cluster_id, doc_id AS rep_doc_id,
               CAST(cluster_size AS BIGINT) AS cluster_size,
               uniq_ratio AS rep_uniq_ratio
        FROM ranked WHERE rn = 1
    """,
    tags=("dedup", "pipeline", "quality"),
    description="quality-aware dedup survivors: per near-dup cluster keep "
                "the HIGHEST-quality document (token uniqueness ratio, "
                "doc_id tiebreak) instead of the smallest id — the 'keep "
                "the best copy' refinement production dedup applies; one "
                "min-struct aggregate over the cluster assignment, no "
                "window over the corpus",
)
def neardup_best_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.clustering import dedup_cluster_assignments
    from mapreduce_4_spark.plans.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = ngram_jaccard_pairs(spark, sf_dir)
    clusters = dedup_cluster_assignments(docs, pairs)
    w = words("text")
    q = docs.select(
        "doc_id",
        (F.size(F.array_distinct(w)).cast("double") / F.size(w))
        .alias("uniq_ratio"),
    ).filter(F.size(w) > 0)
    joined = clusters.join(q, "doc_id")
    # argmax(uniq_ratio) with min-doc_id tiebreak as ONE hash aggregate:
    # min over (-ratio, doc_id) structs — skew-safe (no per-cluster
    # window), the same shape the block-dedup first-pick uses
    best = joined.groupBy("cluster_id").agg(
        F.min(
            F.struct(
                (-F.col("uniq_ratio")).alias("neg_ratio"),
                F.col("doc_id").alias("doc_id"),
            )
        ).alias("b"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    return best.select(
        "cluster_id",
        F.col("b.doc_id").alias("rep_doc_id"),
        "cluster_size",
        (-F.col("b.neg_ratio")).alias("rep_uniq_ratio"),
    )


_MIX_BUDGET = 500_000  # token budget the mixture plan allocates


@register(
    "mixture_plan_sources",
    oracle=f"""
        WITH tok AS (
            SELECT source, CAST(SUM(len({_W})) AS BIGINT) AS tokens_available
            FROM documents GROUP BY source HAVING SUM(len({_W})) > 0
        ),
        wts AS (
            SELECT source, tokens_available,
                   CAST(sqrt(tokens_available) AS DECIMAL(28,12)) AS wt
            FROM tok
        ),
        tot AS (SELECT SUM(wt) AS total_wt FROM wts)
        SELECT w.source, w.tokens_available,
               CAST(w.wt AS DOUBLE) / CAST(t.total_wt AS DOUBLE)
                   AS target_share,
               CAST(floor(CAST(w.wt AS DOUBLE) / CAST(t.total_wt AS DOUBLE)
                          * {_MIX_BUDGET}) AS BIGINT) AS tokens_requested,
               CAST(floor(CAST(w.wt AS DOUBLE) / CAST(t.total_wt AS DOUBLE)
                          * {_MIX_BUDGET}) AS BIGINT)
                   / CAST(w.tokens_available AS DOUBLE) AS epochs_needed,
               least(1.0, CAST(floor(CAST(w.wt AS DOUBLE)
                                     / CAST(t.total_wt AS DOUBLE)
                                     * {_MIX_BUDGET}) AS BIGINT)
                          / CAST(w.tokens_available AS DOUBLE)) AS sample_rate,
               (CAST(floor(CAST(w.wt AS DOUBLE) / CAST(t.total_wt AS DOUBLE)
                           * {_MIX_BUDGET}) AS BIGINT)
                > w.tokens_available) AS oversubscribed
        FROM wts w, tot t
    """,
    tags=("pipeline", "mixture", "sampling"),
    description=f"token-budget mixture plan: alpha=1/2 source weights "
                f"(sqrt of token counts, decimal-accumulated for "
                f"order-independent exactness) allocate a "
                f"{_MIX_BUDGET}-token budget — per source: share, "
                f"requested tokens, epochs needed, clamped sample rate, "
                f"oversubscription flag. The planning step that precedes "
                f"temperature_sample_sources' execution; two tiny "
                f"aggregates + a one-row broadcast",
)
def mixture_plan_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.size(words("text")).cast("long").alias("n_tok")
    )
    tok = (
        docs.groupBy("source")
        .agg(F.sum("n_tok").alias("tokens_available"))
        .filter(F.col("tokens_available") > 0)
    )
    wts = tok.select(
        "source", "tokens_available",
        F.sqrt("tokens_available").cast("decimal(28,12)").alias("wt"),
    )
    total = wts.agg(F.sum("wt").alias("total_wt"))
    share = F.col("wt").cast("double") / F.col("total_wt").cast("double")
    requested = F.floor(share * _MIX_BUDGET).cast("long")
    epochs = requested / F.col("tokens_available").cast("double")
    return (
        wts.crossJoin(F.broadcast(total))
        .select(
            "source", "tokens_available",
            share.alias("target_share"),
            requested.alias("tokens_requested"),
            epochs.alias("epochs_needed"),
            F.least(F.lit(1.0), epochs).alias("sample_rate"),
            (requested > F.col("tokens_available")).alias("oversubscribed"),
        )
    )


_PACK_CAP = 512  # shared with llm_pipeline3.pack_documents_bins


@register(
    "packing_efficiency_report",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, CAST(len({_W}) AS BIGINT) AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT lang, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) - n_tokens AS start
            FROM t
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(ceil(SUM(n_tokens) / {_PACK_CAP}.0) AS BIGINT) AS n_bins,
               SUM(n_tokens)
                   / (CAST(ceil(SUM(n_tokens) / {_PACK_CAP}.0) AS BIGINT)
                      * {_PACK_CAP}.0) AS utilization,
               CAST(SUM(CASE WHEN n_tokens > 0
                             AND (start // {_PACK_CAP})
                                 != ((start + n_tokens - 1) // {_PACK_CAP})
                        THEN 1 ELSE 0 END) AS BIGINT) AS spanning_docs,
               COUNT(*) / CAST(ceil(SUM(n_tokens) / {_PACK_CAP}.0) AS BIGINT)
                   AS avg_docs_per_bin
        FROM c GROUP BY lang
    """,
    tags=("pipeline", "packing", "diagnostic"),
    description="packing-efficiency report over the greedy bin packing "
                "(pack_documents_bins): per language — bins used, "
                "utilization of bin capacity, boundary-spanning docs, "
                "docs per bin. The shard-construction QA numbers; one "
                "window + one aggregate",
)
def packing_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(words("text")).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start")
    c = docs.select("lang", "n_tokens", start)
    spanning = F.when(
        (F.col("n_tokens") > 0)
        & (F.floor(F.col("start") / _PACK_CAP)
           != F.floor((F.col("start") + F.col("n_tokens") - 1) / _PACK_CAP)),
        1,
    ).otherwise(0)
    agg = c.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(spanning).cast("long").alias("spanning_docs"),
    )
    n_bins = F.ceil(F.col("total_tokens") / F.lit(float(_PACK_CAP))).cast("long")
    return agg.select(
        "lang", "n_docs", "total_tokens",
        n_bins.alias("n_bins"),
        (F.col("total_tokens")
         / (n_bins * F.lit(float(_PACK_CAP)))).alias("utilization"),
        "spanning_docs",
        (F.col("n_docs") / n_bins.cast("double")).alias("avg_docs_per_bin"),
    )
