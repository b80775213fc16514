"""Round-7 LLM-pipeline queries: the semantic-dedup tail (clusters and
keep-list over the exact embedding-cosine pair set, completing the
pairs -> clusters -> survivors story the Jaccard tier already has),
temperature-based source mixture resampling, and the deterministic
train/val/test split assignment. All fully oracle-checked.

Reference anchor: each is the reference's Reduce contract
(asio_deep/main.cpp:434-516) generalized — key-grouped consolidation
over derived keys (component labels, stratum rates, hash buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import sql_words, words
from mapreduce_4_spark.registry import REGISTRY, register
from mapreduce_4_spark.sources import load_table

#: the all-pairs cosine oracle the exact tier proves itself against
_EMB_PAIRS_SQL = REGISTRY["embedding_near_dup_pairs"].oracle

_CLUSTERS_SQL = f"""
    WITH RECURSIVE pairs AS ({_EMB_PAIRS_SQL}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach AS (
        SELECT vec_id AS node, vec_id AS reached FROM embeddings
        UNION
        SELECT r.node, e.dst AS reached
        FROM reach r JOIN edges e ON r.reached = e.src
    )
    SELECT node AS vec_id, MIN(reached) AS cluster_id
    FROM reach GROUP BY node
"""


@register(
    "embedding_dedup_clusters",
    oracle=_CLUSTERS_SQL,
    tags=("dedup", "similarity", "iterative"),
    description="semantic near-dup cluster assignment: connected "
                "components over the exact cosine>=0.4 pair set "
                "(pruned block GEMM candidates, pointer-jumping label "
                "propagation), oracled with a recursive transitive "
                "closure — the embedding twin of dedup_clusters",
)
def embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same distributed pointer-jumping operator as the Jaccard tier's
    dedup_clusters (operators/clustering.py, O(log D) rounds) — the
    pair set swaps from gram-Jaccard to exact embedding cosine."""
    from mapreduce_4_spark.operators.clustering import dedup_cluster_assignments
    from mapreduce_4_spark.plans.dedup import embedding_near_dup_pairs

    nodes = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.col("vec_id").alias("doc_id"))
    )
    pairs = embedding_near_dup_pairs(spark, sf_dir).select("id_a", "id_b")
    return dedup_cluster_assignments(nodes, pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


@register(
    "embedding_dedup_survivors",
    oracle=f"""
        SELECT vec_id FROM ({_CLUSTERS_SQL}) WHERE vec_id = cluster_id
    """,
    tags=("dedup", "similarity"),
    description="semantic dedup keep-list: one representative (min "
                "vec_id) per cosine-similarity component — the "
                "embedding twin of neardup_survivors",
)
def embedding_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        embedding_dedup_clusters(spark, sf_dir)
        .filter(F.col("vec_id") == F.col("cluster_id"))
        .select("vec_id")
    )


_W = sql_words("text")


@register(
    "temperature_sample_sources",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, source, len({_W}) AS w FROM documents
        ),
        tot AS (
            SELECT source, SUM(w) AS tot FROM tok GROUP BY source
            HAVING SUM(w) > 0
        ),
        mn AS (SELECT MIN(tot) AS mn FROM tot),
        r AS (SELECT source, sqrt(mn / tot) AS rate FROM tot, mn)
        SELECT t.doc_id, t.source
        FROM tok t JOIN r USING (source)
        WHERE substring(md5(CAST(t.doc_id AS VARCHAR) || ':42'), 1, 8) <
              CASE WHEN r.rate >= 1 THEN 'zzzzzzzz'
                   ELSE printf('%08x',
                               CAST(floor(r.rate * 4294967296) AS BIGINT))
              END
    """,
    tags=("pipeline", "sampling", "mixture"),
    description="temperature (alpha=1/2) mixture resampling over "
                "sources, weighted by TOKEN totals: keep rate "
                "sqrt(min_tokens/source_tokens), so dominant feeds are "
                "tempered and the smallest keeps everything — "
                "content-keyed selection, bit-exact across engines",
)
def temperature_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.sampling import temperature_resample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(words("text")).alias("w")
    )
    return temperature_resample(
        docs, "source", weight_col="w", key_col="doc_id"
    ).select("doc_id", "source")


from mapreduce_4_spark.operators.sampling import sql_split_assignment

@register(
    "train_split_assignment_docs",
    oracle=f"""
        SELECT doc_id, source,
               {sql_split_assignment("doc_id")} AS split
        FROM documents
    """,
    tags=("pipeline", "sampling"),
    description="deterministic 90/5/5 train/val/test assignment via the "
                "same content-keyed md5 buckets as the samplers: "
                "partition-independent, engine-portable, a document "
                "never migrates between splits as the corpus grows",
)
def train_split_assignment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucket split assignment (operators/sampling.py::
    split_assignment — thresholds shared with the SQL twin so Spark and
    oracle can never drift); the per-row predicate costs no shuffle at
    any scale."""
    from mapreduce_4_spark.operators.sampling import split_assignment

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return docs.select(
        "doc_id", "source", split_assignment(F.col("doc_id")).alias("split")
    )


_PAIRS_SQL = REGISTRY["ngram_jaccard_pairs"].oracle

from mapreduce_4_spark.operators.sampling import sql_split_assignment as _ssa

_SPLIT_CASE = _ssa("doc_id")


@register(
    "curated_corpus_stats",
    oracle=f"""
        WITH exact_keep AS (
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        ),
        pairs AS ({_PAIRS_SQL}),
        q AS (
            SELECT doc_id FROM (
                SELECT doc_id,
                       len({_W}) AS n_words,
                       CAST(len(list_distinct({_W})) AS DOUBLE)
                         / len({_W}) AS uniq_ratio,
                       CAST(length(text) - length(regexp_replace(text,
                            '[!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
                         / length(text) AS punct_ratio
                FROM documents WHERE len({_W}) > 0
            )
            WHERE n_words >= 20 AND uniq_ratio >= 0.3 AND punct_ratio <= 0.1
        ),
        kept AS (
            SELECT d.doc_id, d.lang, len({_W}) AS tokens
            FROM documents d
            JOIN exact_keep USING (doc_id)
            JOIN q USING (doc_id)
            WHERE d.doc_id NOT IN (SELECT id_b FROM pairs)
        )
        SELECT {_SPLIT_CASE} AS split, lang,
               COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS n_tokens
        FROM kept GROUP BY 1, 2
    """,
    tags=("pipeline", "dedup", "composition"),
    description="the end-to-end curation pipeline as ONE declarative "
                "plan: quality gate -> exact dedup -> near-dup keep-"
                "list -> split assignment -> per-(split, lang) doc and "
                "token totals. Every stage is itself a registered, "
                "individually-oracled query; composing them stays one "
                "Catalyst plan (semi/anti joins + one aggregate), no "
                "materialization between stages",
)
def curated_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition is the point: a Spark-first pipeline chains stages
    as DataFrame lineage and lets Catalyst plan the whole thing (the
    reference, by contrast, materializes every stage to text files —
    asio_deep/main.cpp:293-331 — which is exactly the pattern this
    engine replaces with in-plan composition)."""
    from mapreduce_4_spark.plans.dedup import (
        dedup_exact_docs,
        ngram_jaccard_pairs,
    )
    from mapreduce_4_spark.plans.pipeline_ops import quality_filter_docs

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    exact_keep = dedup_exact_docs(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    dominated = ngram_jaccard_pairs(spark, sf_dir).select(
        F.col("id_b").alias("doc_id")
    )
    quality_keep = (
        quality_filter_docs(spark, sf_dir)
        .filter(F.col("keep"))
        .select("doc_id")
    )
    from mapreduce_4_spark.operators.sampling import split_assignment

    split = split_assignment(F.col("doc_id"))
    kept = (
        docs.join(exact_keep, "doc_id", "left_semi")
        .join(quality_keep, "doc_id", "left_semi")
        .join(dominated, "doc_id", "left_anti")
    )
    return (
        kept.select(
            split.alias("split"), "lang", F.size(words("text")).alias("tokens")
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").alias("n_tokens"),
        )
    )


@register(
    "dedup_rate_by_source",
    oracle=f"""
        WITH pairs AS ({_PAIRS_SQL}),
        dominated AS (SELECT DISTINCT id_b AS doc_id FROM pairs)
        SELECT d.source,
               COUNT(*) AS n_docs,
               COUNT(dom.doc_id) AS n_neardup,
               CAST(COUNT(dom.doc_id) AS DOUBLE) / COUNT(*) AS dup_rate
        FROM documents d LEFT JOIN dominated dom ON d.doc_id = dom.doc_id
        GROUP BY d.source
    """,
    tags=("dedup", "pipeline", "diagnostics"),
    description="feed-redundancy diagnostic: per source, the fraction "
                "of documents dominated by a near-dup pair — the "
                "signal that tells a crawl operator which feed is "
                "mirroring content already held",
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    from mapreduce_4_spark.plans.dedup import ngram_jaccard_pairs

    dominated = (
        ngram_jaccard_pairs(spark, sf_dir)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("_dom", F.lit(1))
    )
    return (
        docs.join(dominated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("_dom").alias("n_neardup"),
            (F.count("_dom").cast("double") / F.count(F.lit(1)))
            .alias("dup_rate"),
        )
    )


@register(
    "events_debounce",
    oracle="""
        SELECT event_id, user_id, event_type, ts
        FROM (
            SELECT event_id, user_id, event_type, ts,
                   lag(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS prev_ts
            FROM events
        )
        WHERE prev_ts IS NULL OR ts > prev_ts + INTERVAL 10 MINUTE
    """,
    tags=("window", "dedup", "events"),
    description="batch debounce: drop an event when the SAME (user, "
                "type) fired within the previous 10 minutes (lag-based "
                "raw-predecessor debounce; the chained-throttle variant "
                "that suppresses relative to the last KEPT event is the "
                "streaming stateful-dedup operator, streaming/)",
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One window shuffle on (user_id, event_type); ties on ts break by
    event_id so the kept set is deterministic in any engine."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(
            F.col("prev_ts").isNull()
            | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 10 MINUTES"))
        )
        .select("event_id", "user_id", "event_type", "ts")
    )


#: vocabulary size for the id-mapping tokenizer below. Production BPE
#: vocabs are 32k-256k; the plan shape (broadcast vocab join) is
#: size-independent.
_VOCAB_K = 1000


@register(
    "tokenize_to_ids_docs",
    oracle=f"""
        WITH tok AS (
            SELECT w AS word, COUNT(*) AS n
            FROM (SELECT unnest({_W}) AS w FROM documents) GROUP BY w
        ),
        vocab AS (
            SELECT word, id FROM (
                SELECT word,
                       row_number() OVER (ORDER BY n DESC, word) AS id
                FROM tok
            ) WHERE id <= {_VOCAB_K}
        ),
        e AS (
            SELECT doc_id,
                   unnest({_W}) AS word,
                   unnest(range(1, len({_W}) + 1)) AS pos
            FROM documents
        )
        SELECT doc_id,
               string_agg(CAST(COALESCE(v.id, 0) AS VARCHAR), ' '
                          ORDER BY pos) AS ids,
               CAST(SUM(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unk
        FROM e LEFT JOIN vocab v USING (word)
        GROUP BY doc_id
    """,
    tags=("text", "pipeline", "tokenize"),
    description="corpus-vocab id tokenization: build the top-1000 word "
                "vocabulary (count desc, word asc - deterministic), map "
                "every token to its id (0 = UNK), emit the id sequence "
                "in document order plus the OOV count - the id-mapping "
                "step of training-shard construction",
)
def tokenize_to_ids_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocab is corpus-derived, so the token->id map arrives by
    BROADCAST join onto the exploded token stream (the vocab aggregate
    is vocabulary-sized, not corpus-sized); documents reassemble with
    one groupBy(doc_id) whose order key is the token position -
    deterministic in any engine. Two shuffles total at any scale (vocab
    count + reassembly)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", words("text").alias("w")
    )
    tok = docs.select(F.explode("w").alias("word"))
    # top-K first (TakeOrderedAndProject — per-partition top-K, no
    # global single-partition sort of the whole vocabulary), THEN the
    # row_number window over only the K surviving rows (round-14,
    # guide §2.4). Identical rows: filtering rank <= K after ranking
    # everything equals ranking the top-K by the same total order
    # (ties broken by word).
    vocab = (
        tok.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(_VOCAB_K)
        .withColumn(
            "id",
            F.row_number().over(
                Window.orderBy(F.col("n").desc(), F.col("word"))
            ),
        )
        .select("word", "id")
    )
    pos = docs.select("doc_id", F.posexplode("w").alias("pos", "word"))
    mapped = pos.join(F.broadcast(vocab), "word", "left").select(
        "doc_id", "pos", F.coalesce("id", F.lit(0)).alias("id")
    )
    return mapped.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "id"))
                ),
                lambda s: s["id"].cast("string"),
            ),
        ).alias("ids"),
        F.sum((F.col("id") == 0).cast("long")).alias("n_unk"),
    )


@register(
    "length_band_filter_docs",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, len({_W}) AS n_tok FROM documents
        ),
        ranked AS (
            SELECT *,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY n_tok, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM t
        ),
        bands AS (
            SELECT lang,
                   MAX(CASE WHEN rn = CAST(floor((n-1) * 0.05) AS BIGINT) + 1
                            THEN n_tok END) AS p5_tokens,
                   MAX(CASE WHEN rn = CAST(floor((n-1) * 0.95) AS BIGINT) + 1
                            THEN n_tok END) AS p95_tokens
            FROM ranked GROUP BY lang
        )
        SELECT t.doc_id, t.lang, t.n_tok,
               b.p5_tokens, b.p95_tokens,
               (t.n_tok >= b.p5_tokens AND t.n_tok <= b.p95_tokens) AS keep
        FROM t JOIN bands b USING (lang)
    """,
    tags=("pipeline", "statistics", "quality"),
    description="adaptive length-band filter: keep docs inside the "
                "per-language p5-p95 token-length band, with the band "
                "computed from the corpus itself by exact rank "
                "selection (bit-identical across engines, unlike "
                "interpolating quantiles) - thresholds that move with "
                "the corpus instead of hand-tuned constants",
)
def length_band_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass adaptive thresholding: one window pass ranks lengths
    per language, the per-lang band (a languages-sized table) joins
    back by broadcast - the corpus shuffles once for the rank, never
    for the filter."""
    from pyspark.sql import Window

    t = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(words("text")).cast("long").alias("n_tok")
    )
    w = Window.partitionBy("lang").orderBy("n_tok", "doc_id")
    wn = Window.partitionBy("lang")
    ranked = t.select(
        "lang",
        "n_tok",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def pick(p: float, name: str):
        idx = F.floor((F.col("n") - 1) * F.lit(p)).cast("long") + 1
        return F.max(F.when(F.col("rn") == idx, F.col("n_tok"))).alias(name)

    bands = ranked.groupBy("lang").agg(
        pick(0.05, "p5_tokens"), pick(0.95, "p95_tokens")
    )
    return t.join(F.broadcast(bands), "lang").select(
        "doc_id",
        "lang",
        "n_tok",
        "p5_tokens",
        "p95_tokens",
        (
            (F.col("n_tok") >= F.col("p5_tokens"))
            & (F.col("n_tok") <= F.col("p95_tokens"))
        ).alias("keep"),
    )


@register(
    "char_diversity_docs",
    oracle="""
        WITH c AS (
            SELECT doc_id,
                   list_filter(string_split(text, ''), x -> x != '') AS cs
            FROM documents WHERE length(text) > 0
        ),
        k AS (
            SELECT doc_id, cs, len(cs) AS n,
                   [len(list_filter(cs, x -> x = d))
                    for d in list_distinct(cs)] AS counts
            FROM c
        )
        SELECT doc_id,
               n AS n_chars,
               len(counts) AS n_distinct_chars,
               1.0 - CAST(list_sum(counts.list_transform(x -> x * x))
                          AS DOUBLE) / (n * n) AS simpson_diversity
        FROM k
    """,
    tags=("text", "quality"),
    description="character-level Simpson diversity index 1 - sum(p_c^2) "
                "per document: the gibberish/repetition signal at the "
                "character level. Simpson is chosen over Shannon "
                "entropy DELIBERATELY - it needs only integer counts "
                "and one IEEE division, so it is bit-identical across "
                "engines, where log2's last-ulp behaviour is "
                "library-dependent",
)
def char_diversity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure column expressions, per-row compute, no shuffle, no UDF.
    The squared counts come from ONE run-length fold over the SORTED
    char array (O(n log n) per doc), not a count-per-distinct-char scan
    (O(k·n) — measured 2× slower and quadratic on high-alphabet texts).
    The sum of squared counts is order-independent integer math, so no
    fold-order coordination with the oracle is needed at all."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cs = F.filter(F.split("text", ""), lambda x: x != F.lit(""))
    d = docs.filter(F.length("text") > 0).select(
        "doc_id", F.array_sort(cs).alias("cs")
    )
    zero = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    # fold state: (prev char, current run length, Σ finished-run², runs)
    init = F.struct(
        F.lit("").alias("prev"), zero.alias("run"),
        zero.alias("acc"), zero.alias("k"),
    )
    step = lambda s, x: F.when(
        x == s["prev"],
        F.struct(
            s["prev"].alias("prev"), (s["run"] + one).alias("run"),
            s["acc"].alias("acc"), s["k"].alias("k"),
        ),
    ).otherwise(
        F.struct(
            x.alias("prev"), one.alias("run"),
            (s["acc"] + s["run"] * s["run"]).alias("acc"),
            (s["k"] + one).alias("k"),
        )
    )
    fin = lambda s: F.struct(
        (s["acc"] + s["run"] * s["run"]).alias("sumsq"), s["k"].alias("k")
    )
    k = d.select(
        "doc_id",
        F.size("cs").cast("long").alias("n"),
        F.aggregate("cs", init, step, fin).alias("st"),
    )
    return k.select(
        "doc_id",
        F.col("n").alias("n_chars"),
        F.col("st")["k"].alias("n_distinct_chars"),
        (
            F.lit(1.0)
            - F.col("st")["sumsq"].cast("double") / (F.col("n") * F.col("n"))
        ).alias("simpson_diversity"),
    )
