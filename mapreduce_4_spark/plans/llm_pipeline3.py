"""Round-3 LLM-pipeline queries: corpus heavy hitters, greedy sequence
packing into fixed-token training bins, and deterministic weighted
sampling — the shard-construction stages downstream of selection, all
oracle-checked.

Generalizes the reference's combine-then-merge aggregation contract
(asio_deep/main.cpp:345-431) to corpus-level statistics: every query is
a partial-aggregate-then-merge or window plan, no driver-side loops.

Cross-engine float parity note (same standard as plans/retrieval.py):
``weighted_sample_docs`` ranks by the Efraimidis-Spirakis key
``ln(u)/w``. +, *, / are correctly rounded in IEEE double and bit-exact
across engines, but ``ln`` is only faithfully rounded — JVM StrictMath
and libm may differ in the last ulp. No rational monotone surrogate
exists here: comparing ``ln(u1)/w1`` vs ``ln(u2)/w2`` across different
weights is ``u1^w2 vs u2^w1``, which needs exact big-integer powers
with exponents up to max(n_chars). ACCEPTED RISK, bounded: an oracle
mismatch requires two docs whose keys differ by < 1 ulp (~1e-16
relative) to straddle the rank-k boundary; with md5-derived u the keys
are effectively uniform, so the flip probability is O(n * 1e-16) per
run — negligible at any tested SF, and the deterministic doc_id
tie-break removes the exact-tie case entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import sql_words, words
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

_W = sql_words("text")

#: heavy-hitter support threshold: words carrying >= this fraction of
#: ALL token occurrences. 0.002 of a 100 TB corpus is still a handful
#: of thousands of survivors — the boilerplate/stop-word detection knob.
_HH_SUPPORT = 0.002

#: greedy packing capacity in tokens (toy stand-in for a real context
#: window; the plan shape is capacity-independent).
_PACK_CAPACITY = 512


@register(
    "heavy_hitter_words",
    oracle=f"""
        WITH tok AS (
            SELECT unnest({_W}) AS word FROM documents
        ),
        c AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY word),
        tot AS (SELECT SUM(cnt) AS total FROM c)
        SELECT c.word, c.cnt,
               CAST(c.cnt AS DOUBLE) / tot.total AS share
        FROM c, tot
        WHERE c.cnt >= {_HH_SUPPORT} * tot.total
    """,
    tags=("pipeline", "text", "heavy-hitters"),
    description="exact heavy hitters: words holding >= 0.2% of all token "
                "occurrences (boilerplate/stop-word detection). Two-phase "
                "count + one-row broadcast total; at 100 TB the same plan "
                "is a map-side-combined agg over ~vocabulary-sized state, "
                "and the threshold keeps the output tiny by construction.",
)
def heavy_hitter_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    tok = docs.select(F.explode(words("text")).alias("word"))
    counts = tok.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.lit(_HH_SUPPORT) * F.col("total"))
        .select(
            "word",
            "cnt",
            (F.col("cnt").cast("double") / F.col("total")).alias("share"),
        )
    )


@register(
    "pack_documents_bins",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang,
                   CAST(len({_W}) AS BIGINT) AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT doc_id, lang, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum
            FROM t
        )
        SELECT doc_id, lang, n_tokens,
               CAST(floor((cum - n_tokens) / {_PACK_CAPACITY}) AS BIGINT)
                   AS bin_id,
               cum - n_tokens AS bin_offset
        FROM c
    """,
    tags=("pipeline", "packing"),
    description="greedy sequence packing: stream each language's docs in "
                "doc_id order into fixed-capacity token bins; a doc's bin "
                "is where its tokens START in the concatenated stream "
                "(docs may span a boundary — the packed-sequence "
                "construction used for LLM training shards). Pure window "
                "cumsum: one shuffle per language partition, integer-only "
                "output, embarrassingly scalable.",
)
def pack_documents_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.size(words("text")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")
    return docs.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor(start / F.lit(_PACK_CAPACITY)).cast("long").alias("bin_id"),
        start.alias("bin_offset"),
    )


@register(
    "bigram_lm_score_docs",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_W} AS w FROM documents
        ),
        e AS (
            SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
            FROM t, unnest(range(1, len(w))) AS r(i)
            WHERE len(w) >= 2
        ),
        cu AS (SELECT w1, COUNT(*) AS n1 FROM e GROUP BY w1),
        cb AS (SELECT w1, w2, COUNT(*) AS n2 FROM e GROUP BY w1, w2),
        p AS (
            SELECT cb.w1, cb.w2, cb.n2 / cu.n1 AS prob
            FROM cb JOIN cu USING (w1)
        )
        SELECT e.doc_id,
               COUNT(*) AS n_bigrams,
               CAST(SUM(CAST(p.prob AS DECIMAL(18,15))) AS DOUBLE)
                   / COUNT(*) AS mean_bigram_p
        FROM e JOIN p ON e.w1 = p.w1 AND e.w2 = p.w2
        GROUP BY e.doc_id
    """,
    tags=("pipeline", "text", "quality"),
    description="statistical quality score: train a word-bigram LM on the "
                "corpus itself (P(w2|w1) = bigram count / prefix count) "
                "and score each doc by its mean bigram probability — "
                "fluent/common text scores high, gibberish and boilerplate "
                "outliers surface at the tails. Per-row probabilities are "
                "single IEEE divisions (deterministic); the per-doc sum "
                "goes through DECIMAL(18,15) so accumulation order can't "
                "change the hash. Train and score are the same two "
                "aggregate passes at any scale.",
)
def bigram_lm_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", words("text").alias("w")
    ).filter(F.size("w") >= 2)
    # one-pass zip_with bigram structs (round-14, same construction as
    # functions.text.ngrams_join): element i is struct(w[i], w[i+1])
    # either way, without the per-position index array
    _n1 = F.size("w") - 1
    bi = F.zip_with(
        F.slice("w", 1, _n1), F.slice("w", 2, _n1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    e = docs.select("doc_id", F.explode(bi).alias("b")).select(
        "doc_id", "b.w1", "b.w2"
    )
    # both training aggregates read e independently: map-side combine
    # makes each exchange vocab-sized (not corpus-sized), and the two
    # partials run in parallel — measured faster than deriving the
    # prefix counts from the bigram table, which serializes the chain
    # behind the broadcast build
    cu = e.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    cb = e.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    p = cb.join(cu, "w1").select(
        "w1", "w2", (F.col("n2") / F.col("n1")).alias("prob")
    )
    return (
        e.join(p, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.sum(F.col("prob").cast("decimal(18,15)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_bigram_p"),
        )
    )


@register(
    "weighted_sample_docs",
    oracle="""
        WITH k AS (
            SELECT doc_id, lang, n_chars,
                   ln((CAST(CAST('0x' || substring(
                           md5(CAST(doc_id AS VARCHAR) || ':ws'), 1, 8)
                       AS BIGINT) AS DOUBLE) + 1) / 4294967297.0)
                   / n_chars AS key
            FROM documents WHERE n_chars > 0
        )
        SELECT doc_id, lang, n_chars
        FROM k ORDER BY key DESC, doc_id LIMIT 100
    """,
    tags=("pipeline", "sampling"),
    description="weighted sampling without replacement "
                "(Efraimidis-Spirakis): per-doc key ln(u)/w with w = "
                "n_chars and u md5-derived from doc_id — deterministic, "
                "partition-independent, reproducible in any engine. "
                "Top-k by key IS the weighted sample; ln(u)/w is the "
                "monotone log-domain form of u^(1/w). TakeOrderedAndProject "
                "(per-partition heads + one merge) — no global sort.",
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    ).filter(F.col("n_chars") > 0)
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                       F.lit(":ws"))), 1, 8),
            16, 10,
        ).cast("double")
        + 1
    ) / F.lit(4294967297.0)
    key = F.log(u) / F.col("n_chars")
    return (
        docs.withColumn("_key", key)
        .orderBy(F.desc("_key"), F.asc("doc_id"))
        .limit(100)
        .select("doc_id", "lang", "n_chars")
    )
