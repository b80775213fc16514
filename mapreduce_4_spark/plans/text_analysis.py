"""Text-analysis queries over the documents table (north-star extension;
the reference's word count is the seed — SURVEY.md §2.2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import (
    ASCII_PUNCT_CLASS, ngrams_join, sql_words, words,
)
from mapreduce_4_spark.operators.text_analysis import (
    LANG_STOPWORDS,
    fingerprint_chain_md5,
    fingerprint_md5,
    fingerprint_rolling,
    lang_scores,
    quality_features,
)
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

_W = sql_words("text")
_EN = "', '".join(LANG_STOPWORDS["en"])


@register(
    "text_stats_docs",
    oracle=f"""
        WITH t AS (SELECT doc_id, text, {_W} AS w FROM documents)
        SELECT doc_id,
               len(w) AS n_words,
               length(text) AS n_chars,
               CAST(list_sum([length(x) for x in w]) AS DOUBLE) / len(w) AS avg_word_len,
               CAST(length(text) - length(regexp_replace(text, '{ASCII_PUNCT_CLASS}', '', 'g')) AS DOUBLE)
                 / length(text) AS punct_ratio,
               CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS uniq_ratio,
               CAST(len(list_filter(w, x -> list_contains(['{_EN}'], x))) AS DOUBLE)
                 / len(w) AS stopword_ratio
        FROM t WHERE len(w) > 0
    """,
    tags=("text",),
    description="per-document quality features: counts, lengths, punct / "
                "uniqueness / stopword ratios",
)
def text_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    feats = quality_features("text")
    out = docs.select("doc_id", *(c.alias(n) for n, c in feats.items()))
    return out.filter(F.col("n_words") > 0)


@register(
    "lang_id_docs",
    oracle=f"""
        WITH t AS (SELECT doc_id, lang, {_W} AS w FROM documents),
        s AS (
            SELECT doc_id, lang,
                   len(list_filter(w, x -> list_contains(['{"', '".join(LANG_STOPWORDS["de"])}'], x))) AS hits_de,
                   len(list_filter(w, x -> list_contains(['{"', '".join(LANG_STOPWORDS["en"])}'], x))) AS hits_en,
                   len(list_filter(w, x -> list_contains(['{"', '".join(LANG_STOPWORDS["es"])}'], x))) AS hits_es,
                   len(list_filter(w, x -> list_contains(['{"', '".join(LANG_STOPWORDS["fr"])}'], x))) AS hits_fr
            FROM t
        )
        SELECT doc_id, lang, hits_de, hits_en, hits_es, hits_fr,
               CASE WHEN hits_de >= hits_en AND hits_de >= hits_es AND hits_de >= hits_fr AND hits_de > 0 THEN 'de'
                    WHEN hits_en >= hits_es AND hits_en >= hits_fr AND hits_en > 0 THEN 'en'
                    WHEN hits_es >= hits_fr AND hits_es > 0 THEN 'es'
                    WHEN hits_fr > 0 THEN 'fr'
                    ELSE 'unknown' END AS lang_pred
        FROM s
    """,
    tags=("text",),
    description="heuristic language ID by per-language stopword hits "
                "(deterministic tie-break, 'unknown' when no evidence)",
)
def lang_id_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    ws = words("text")
    scores = lang_scores(ws)
    df = docs.select(
        "doc_id", "lang",
        *(scores[lang].cast("long").alias(f"hits_{lang}") for lang in ("de", "en", "es", "fr")),
    )
    de, en, es, fr = (F.col(f"hits_{x}") for x in ("de", "en", "es", "fr"))
    pred = (
        F.when((de >= en) & (de >= es) & (de >= fr) & (de > 0), "de")
        .when((en >= es) & (en >= fr) & (en > 0), "en")
        .when((es >= fr) & (es > 0), "es")
        .when(fr > 0, "fr")
        .otherwise("unknown")
    )
    return df.withColumn("lang_pred", pred)


@register(
    "token_counts_docs",
    oracle=f"""
        SELECT doc_id,
               len({_W}) AS ws_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS bpe_ish_tokens,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens_len4
        FROM documents
    """,
    tags=("text",),
    description="token counting three ways: whitespace, BPE-ish regex, chars/4",
)
def token_counts_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.size(words("text")).cast("long").alias("ws_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0)
        ).cast("long").alias("bpe_ish_tokens"),
        F.ceil(F.length("text") / 4.0).alias("est_tokens_len4"),
    )


@register(
    "doc_fingerprint_md5",
    oracle=f"""
        SELECT doc_id,
               md5(array_to_string({_W}, ' ')) AS fp_md5
        FROM documents
    """,
    tags=("text", "fingerprint"),
    description="normalization-robust md5 fingerprint over the cleaned token stream",
)
def doc_fingerprint_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select("doc_id", fingerprint_md5("text").alias("fp_md5"))


@register(
    "doc_fingerprint_rolling",
    oracle=f"""
        WITH t AS (SELECT doc_id, {_W} AS w FROM documents)
        SELECT doc_id,
               list_reduce(list_prepend('', w),
                           (acc, x) -> md5(acc || ' ' || x)) AS fp_chain
        FROM t
    """,
    tags=("text", "fingerprint"),
    description="order-sensitive rolling fingerprint via hash chaining "
                "(md5 fold over the token stream; the faster xxhash64 fold "
                "is fingerprint_rolling in operators/text_analysis.py)",
)
def doc_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select("doc_id", fingerprint_chain_md5("text").alias("fp_chain"))


@register(
    "top_bigrams",
    oracle=f"""
        WITH t AS (SELECT {_W} AS w FROM documents),
        b AS (
            SELECT unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bigram
            FROM t WHERE len(w) >= 2
        )
        SELECT bigram, COUNT(*) AS cnt
        FROM b GROUP BY bigram
        ORDER BY cnt DESC, bigram LIMIT 20
    """,
    tags=("text", "aggregate", "topk"),
    description="corpus-wide top-20 bigrams (n-gram counting at scale: "
                "explode + two-phase hash aggregate + TakeOrdered)",
)
def top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    ws = words("text")
    df = docs.select(ws.alias("w")).filter(F.size("w") >= 2)
    # one-pass zip_with bigram construction (functions.text.ngrams_join,
    # round-14 optimization: ~1.15x on the sf0.1 bigram explode)
    bigrams = ngrams_join(F.col("w"), 2)
    return (
        df.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(20)
    )


@register(
    "chunk_documents",
    oracle="""
        WITH n AS (
            SELECT doc_id, text,
                   greatest(1, CAST(ceil((length(text) - 24) / 96.0) AS BIGINT))
                       AS n_chunks
            FROM documents
        ), idx AS (
            SELECT doc_id, text, unnest(range(0, n_chunks)) AS chunk_idx FROM n
        )
        SELECT doc_id, chunk_idx,
               substr(text, CAST(chunk_idx * 96 + 1 AS BIGINT), 120) AS chunk,
               length(substr(text, CAST(chunk_idx * 96 + 1 AS BIGINT), 120))
                   AS chunk_len
        FROM idx
    """,
    tags=("text", "llm-pipeline"),
    description="context-window chunking: 120-char windows, 24-char overlap, "
                "sequence+explode+substring (no shuffle, no Python)",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.text_analysis import chunk_text

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_text(docs, chunk_chars=120, overlap=24)


#: deterministic synthetic PII (the corpus has none): every doc gains an
#: email, even docs a phone, every 3rd an id run — same expression on
#: both engines, so the scrub itself is what the oracle checks.
_PII_TEXT_SQL = """
    text || ' contact-' || doc_id || '@example.com'
         || CASE WHEN doc_id % 2 = 0 THEN ' call 555-123-4567' ELSE '' END
         || CASE WHEN doc_id % 3 = 0 THEN ' ref 900100200300' ELSE '' END
"""


@register(
    "pii_redact_docs",
    oracle=f"""
        WITH seeded AS (SELECT doc_id, {_PII_TEXT_SQL} AS text FROM documents)
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                   '\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}', '<PHONE>', 'g'),
                   '\\d{{9,}}', '<ID>', 'g') AS redacted,
               len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_emails,
               len(regexp_extract_all(text, '\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}')) AS n_phones,
               len(regexp_extract_all(text, '\\d{{9,}}')) AS n_ids
        FROM seeded
    """,
    tags=("text", "llm-pipeline", "pushdown"),
    description="PII scrub: email/phone/long-id redaction with per-pattern "
                "hit counts, engine-portable regexes, all inside codegen",
)
def pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.text_analysis import redact_pii

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PII_TEXT_SQL).alias("text")
    )
    return redact_pii(docs)


@register(
    "repetition_ratio_docs",
    oracle=f"""
        WITH tokens AS (
            SELECT doc_id, unnest({sql_words('text')}) AS word FROM documents
        ),
        counts AS (
            SELECT doc_id, word, COUNT(*) AS c FROM tokens GROUP BY doc_id, word
        ),
        ranked AS (
            SELECT doc_id, word, c,
                   SUM(c) OVER (PARTITION BY doc_id) AS n,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY c DESC, word) AS rn
            FROM counts
        )
        SELECT doc_id, word AS top_word, c AS top_count,
               CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS repetition_ratio
        FROM ranked WHERE rn = 1
    """,
    tags=("text", "llm-pipeline", "window"),
    description="repetition quality signal: most-frequent token share per "
                "document (high ratio = boilerplate/spam), one shuffle on "
                "doc_id reused by both window functions",
)
def repetition_ratio_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mapreduce_4_spark.plans.wordcount import exploded_words

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    counts = (
        exploded_words(docs)
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = Window.partitionBy("doc_id")
    ranked = counts.select(
        "doc_id", "word", "c",
        F.sum("c").over(per_doc).alias("n"),
        F.row_number().over(
            per_doc.orderBy(F.desc("c"), F.asc("word"))
        ).alias("rn"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "doc_id",
        F.col("word").alias("top_word"),
        F.col("c").alias("top_count"),
        (F.col("c").cast("double") / F.col("n").cast("double")).alias("repetition_ratio"),
    )
