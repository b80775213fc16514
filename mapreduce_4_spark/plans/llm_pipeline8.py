"""Round-8b additions: model-style quality scoring, embedding-space
decontamination, seeded topic assignment, asymmetric containment
near-dup, the Spark VARIANT surface, and a k-NN label-vote eval.

Each query is a production stage of a pretraining-data pipeline that the
earlier families don't cover: linear-classifier INFERENCE (vs the rule
flags of gopher_quality_docs / quality_filter_docs), SEMANTIC
decontamination in embedding space (vs the n-gram overlap of
decontaminate_vs_holdout), nearest-centroid topic bucketing, the
one-sided containment relation (doc-in-doc quoting that Jaccard
dilutes), the Spark 4 VARIANT type for semi-structured props, and the
neighbor-vote label eval that scores an embedding space.

Cross-engine float discipline (same contract as llm_pipeline7): every
double is an exact-integer IEEE division, a literal-weight multiply-add
chain evaluated in one fixed left-associated order, or a
``list_cosine_similarity``-parity fold (functions/vectors.py) — so the
DuckDB value hashes are bit-identical.

Reference anchor: generalizes the reference's map+reduce word statistics
(asio_deep/main.cpp:259-291, 434-516) to corpus-curation model stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import sql_words, words
from mapreduce_4_spark.functions.vectors import as_double, dot, norm
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

_W = sql_words("text")

#: Fixed weights of the toy fastText-style quality model: intercept +
#: (uniq_ratio, stopword_frac, mean_word_len, long_word_frac). Literal
#: doubles, applied in ONE fixed left-associated multiply-add order on
#: both engines so the margin is bit-identical.
_Q_INTERCEPT = -2.0
_Q_W_UNIQ = 3.0
_Q_W_STOP = 6.0
_Q_W_MWL = 0.25
_Q_W_LONG = 1.5
_Q_KEEP_AT = 1.0
_Q_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")
_Q_LONG_LEN = 6


@register(
    "quality_linear_score_docs",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_W} AS w FROM documents
        ),
        f AS (
            SELECT doc_id,
                   CAST(len(w) AS BIGINT) AS n_words,
                   CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
                       AS uniq_ratio,
                   CAST(len(list_filter(w, x -> list_contains(
                        {list(_Q_STOPWORDS)}, x))) AS DOUBLE) / len(w)
                       AS stop_frac,
                   CAST(list_sum(list_transform(w, x -> length(x)))
                        AS DOUBLE) / len(w) AS mean_word_len,
                   CAST(len(list_filter(w, x -> length(x) >= {_Q_LONG_LEN}))
                        AS DOUBLE) / len(w) AS long_frac
            FROM t WHERE len(w) > 0
        )
        SELECT doc_id, n_words, uniq_ratio, stop_frac, mean_word_len,
               long_frac,
               (((({_Q_INTERCEPT} + {_Q_W_UNIQ} * uniq_ratio)
                  + {_Q_W_STOP} * stop_frac)
                 + {_Q_W_MWL} * mean_word_len)
                + {_Q_W_LONG} * long_frac) AS score,
               ((((({_Q_INTERCEPT} + {_Q_W_UNIQ} * uniq_ratio)
                   + {_Q_W_STOP} * stop_frac)
                  + {_Q_W_MWL} * mean_word_len)
                 + {_Q_W_LONG} * long_frac) >= {_Q_KEEP_AT}) AS keep
        FROM f
    """,
    tags=("text", "pipeline", "quality"),
    description="fixed-weight linear quality model INFERENCE (the "
                "fastText-classifier stage of a curation pipeline, vs "
                "the rule flags of gopher_quality_docs): four exact-"
                "division features -> one literal multiply-add margin "
                "-> keep verdict. Pure column expressions, one scan, "
                "zero shuffles; at 100 TB this is embarrassingly "
                "parallel map work inside WholeStageCodegen",
)
def quality_linear_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = docs.select(
        "doc_id", words("text").alias("w")
    ).filter(F.size("w") > 0)
    n = F.size("w")
    uniq = F.size(F.array_distinct("w")).cast("double") / n
    stop = (
        F.size(F.filter("w", lambda x: x.isin(*_Q_STOPWORDS))).cast("double")
        / n
    )
    mwl = (
        F.aggregate("w", F.lit(0).cast("long"),
                    lambda acc, x: acc + F.length(x)).cast("double") / n
    )
    long_frac = (
        F.size(F.filter("w", lambda x: F.length(x) >= _Q_LONG_LEN))
        .cast("double") / n
    )
    f = t.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        uniq.alias("uniq_ratio"),
        stop.alias("stop_frac"),
        mwl.alias("mean_word_len"),
        long_frac.alias("long_frac"),
    )
    # The identical left-associated chain the oracle writes out:
    score = (
        (
            (
                (F.lit(_Q_INTERCEPT) + F.lit(_Q_W_UNIQ) * F.col("uniq_ratio"))
                + F.lit(_Q_W_STOP) * F.col("stop_frac")
            )
            + F.lit(_Q_W_MWL) * F.col("mean_word_len")
        )
        + F.lit(_Q_W_LONG) * F.col("long_frac")
    )
    return f.select(
        "doc_id", "n_words", "uniq_ratio", "stop_frac", "mean_word_len",
        "long_frac",
        score.alias("score"),
        (score >= _Q_KEEP_AT).alias("keep"),
    )


_DECON_MOD = 101     # vec_id % 101 == 0 -> held-out benchmark vector
_DECON_TAU = 0.25    # cosine above this = semantically contaminated
#: Bench-slice bound: only the first _DECON_MAXB multiples of _DECON_MOD
#: are benchmark vectors, so the BROADCAST side stays <= 50 rows no
#: matter how big the corpus grows (the fixture stand-in for "the
#: benchmark suite is a fixed small set"). Above every shipped SF's max
#: vec_id (sf0.1 tops out at 4999), so test results are unchanged; the
#: 10x probe in SCALE.md is what this bound exists for.
_DECON_MAXB = 50


@register(
    "semantic_decontam_embeddings",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        bench AS (SELECT * FROM e WHERE vec_id % {_DECON_MOD} = 0
                  AND vec_id < {_DECON_MOD * _DECON_MAXB}),
        corpus AS (SELECT * FROM e
                   WHERE vec_id % {_DECON_MOD} <> 0
                      OR vec_id >= {_DECON_MOD * _DECON_MAXB}),
        sims AS (
            -- LEFT JOIN, not an inner cross join: the kernel's contract
            -- (tests/test_similarity.py) gives EVERY corpus vector a
            -- contaminated=false row when the bench slice is empty, so
            -- the oracle must encode the same — an inner join would
            -- yield zero rows on an empty-bench fixture and diverge.
            SELECT c.vec_id,
                   b.vec_id AS bench_id,
                   list_cosine_similarity(c.v, b.v) AS cos,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.vec_id
                       ORDER BY list_cosine_similarity(c.v, b.v) DESC,
                                b.vec_id
                   ) AS rn
            FROM corpus c LEFT JOIN bench b ON TRUE
        )
        SELECT vec_id, bench_id AS nearest_bench_id, cos AS max_cos,
               COALESCE(cos >= {_DECON_TAU}, FALSE) AS contaminated
        FROM sims WHERE rn = 1
    """,
    tags=("similarity", "pipeline", "dedup"),
    description="SEMANTIC benchmark decontamination: max cosine of every "
                "corpus vector against the held-out benchmark slice "
                f"(vec_id % {_DECON_MOD} = 0), flag >= {_DECON_TAU} — "
                "the embedding-space complement of the n-gram "
                "decontaminate_vs_holdout. Bench side is tiny and "
                "BROADCAST; corpus streams through one map-side argmax "
                "aggregate, so 100 TB of corpus never shuffles",
)
def semantic_decontam_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The exact mode of the shared decontam kernel (norms hoisted out
    # of the pair space, broadcast bench, one map-side argmax
    # aggregate) — same kernel the LSH twin and the ab_decontam_*
    # bench arms use, so a fix lands in every mode at once.
    from mapreduce_4_spark.operators.similarity import decontam_max_cosine

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    bench = emb.filter(
        (F.col("vec_id") % _DECON_MOD == 0)
        & (F.col("vec_id") < _DECON_MOD * _DECON_MAXB)
    ).select(F.col("vec_id").alias("bench_id"), F.col("v").alias("bv"))
    # Corpus = everything NOT in the bounded bench slice: a vector past
    # the id cap is an ordinary corpus member even when its id is a
    # multiple of the mod (else that slice would be checked by nobody).
    corpus = emb.filter(
        (F.col("vec_id") % _DECON_MOD != 0)
        | (F.col("vec_id") >= _DECON_MOD * _DECON_MAXB)
    )
    return decontam_max_cosine(corpus, bench, tau=_DECON_TAU)


#: Seeded topic centroids: the embedding rows with these vec_ids. Any
#: fixed set works; spread across the id range so each topic is
#: non-degenerate at every SF (ids exist from sf0.001 up).
_TOPIC_CENTROIDS = (3, 11, 47, 123, 289)


@register(
    "topic_assign_centroids",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        cent AS (
            SELECT vec_id AS topic_id, v AS cv FROM e
            WHERE list_contains({list(_TOPIC_CENTROIDS)}, vec_id)
        ),
        sims AS (
            SELECT e.vec_id, cent.topic_id,
                   list_cosine_similarity(e.v, cent.cv) AS cos,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, cent.cv) DESC,
                                cent.topic_id
                   ) AS rn
            FROM e, cent
            WHERE NOT list_contains({list(_TOPIC_CENTROIDS)}, e.vec_id)
        )
        SELECT vec_id, topic_id, cos AS topic_cos FROM sims WHERE rn = 1
    """,
    tags=("similarity", "pipeline", "mixture"),
    description="seeded nearest-centroid topic assignment: every "
                "non-centroid vector "
                "joins the 5 fixed centroid rows (BROADCAST) and takes "
                "the argmax-cosine topic (centroid-id tiebreak) — the "
                "deterministic topic-bucketing stage that feeds mixture "
                "planning. One broadcast + one map-side argmax "
                "aggregate; corpus never shuffles",
)
def topic_assign_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    ).withColumn("vn", norm(F.col("v")))
    cent = emb.filter(
        F.col("vec_id").isin(*_TOPIC_CENTROIDS)
    ).select(F.col("vec_id").alias("topic_id"), F.col("v").alias("cv"),
             F.col("vn").alias("cn"))
    # Centroid rows are excluded from assignment: their self-cosine is
    # the one value the two engines round differently (Spark's fold
    # yields 1+2e-16, DuckDB clamps to 1.0) and carries no information.
    # Norms hoisted out of the pair space (_pair_sim discipline).
    rest = emb.filter(~F.col("vec_id").isin(*_TOPIC_CENTROIDS))
    sims = rest.crossJoin(F.broadcast(cent)).select(
        "vec_id", "topic_id",
        (dot(F.col("v"), F.col("cv"))
         / (F.col("vn") * F.col("cn"))).alias("cos"),
    )
    best = sims.groupBy("vec_id").agg(
        F.min(F.struct((-F.col("cos")).alias("neg"), F.col("topic_id"))).alias("b")
    )
    return best.select(
        "vec_id",
        F.col("b.topic_id").alias("topic_id"),
        (-F.col("b.neg")).alias("topic_cos"),
    )


_CONT_TAU = 0.8


@register(
    "ngram_containment_pairs",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, {_W} AS w FROM documents
        ),
        s AS (
            SELECT doc_id, lang,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) AS sh
            FROM t WHERE len(w) >= 3
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / len(a.sh) AS containment
        FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id <> b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                  / len(a.sh) >= {_CONT_TAU}
    """,
    tags=("dedup", "pipeline"),
    description="asymmetric 3-gram CONTAINMENT pairs (|A∩B|/|A| >= "
                f"{_CONT_TAU}, lang-blocked): catches A-quoted-inside-B "
                "near-dups that Jaccard dilutes. One-sided prefix "
                "filter (rarest (1-t)|A|+1 grams probe the full gram "
                "table) is provably lossless; hash joins only, hot "
                "grams never generate candidates",
)
def ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.dedup import (
        prefix_filtered_containment_pairs,
        shingle_sets,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    sh = shingle_sets(docs, n=3).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    return prefix_filtered_containment_pairs(
        sh, _CONT_TAU, block_col="lang"
    )


@register(
    "variant_extract_events",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k,
               CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
               CAST(json_extract(props, '$.missing') AS BIGINT) AS missing_k,
               (CAST(json_extract(props, '$.k') AS BIGINT) % 10) AS k_bucket
        FROM events
    """,
    tags=("semistructured", "scalar"),
    description="Spark 4 VARIANT surface over events.props: parse_json "
                "-> typed variant_get extractions (int + string), "
                "try_variant_get miss -> NULL, modulo bucket. The "
                "shred-once-read-many path for semi-structured columns "
                "(vs the per-path string parsing of json_extract_events)",
)
def variant_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "props")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return ev.select(
        "event_id",
        k.alias("k"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_k"),
        (k % 10).alias("k_bucket"),
    )


_KNN_MOD = 97   # vec_id % 97 == 0 -> eval query vector
_KNN_K = 10
#: Query-slice bound (same rationale as _DECON_MAXB): at most 52 seeded
#: eval queries regardless of corpus size, so the harness cost is
#: O(|Q|*N) with |Q| FIXED — linear in the corpus — instead of the
#: quadratic blowup a corpus-proportional slice would give. 97*52=5044
#: exceeds every shipped SF's max vec_id; test results unchanged.
_KNN_MAXQ = 52


@register(
    "knn_label_vote_eval",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        q AS (SELECT * FROM e WHERE vec_id % {_KNN_MOD} = 0
              AND vec_id < {_KNN_MOD * _KNN_MAXQ}),
        nn AS (
            SELECT q.vec_id AS query_id, q.label AS true_label,
                   e.label AS nn_label,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.v, e.v) DESC,
                                e.vec_id
                   ) AS rank
            FROM q JOIN e ON e.vec_id <> q.vec_id
        ),
        votes AS (
            SELECT query_id, true_label, nn_label,
                   COUNT(*) AS n_votes
            FROM nn WHERE rank <= {_KNN_K}
            GROUP BY query_id, true_label, nn_label
        ),
        best AS (
            SELECT query_id, true_label, nn_label AS predicted_label,
                   n_votes,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY n_votes DESC, nn_label
                   ) AS rn
            FROM votes
        )
        SELECT query_id, true_label, predicted_label,
               CAST(n_votes AS BIGINT) AS n_votes,
               (predicted_label = true_label) AS correct
        FROM best WHERE rn = 1
    """,
    tags=("similarity", "pipeline", "quality"),
    description=f"k-NN label-vote eval of the embedding space: each "
                f"seeded query vector (vec_id % {_KNN_MOD} = 0) takes "
                f"its top-{_KNN_K} cosine neighbors' majority label "
                "(count desc, label tiebreak) vs its own — the "
                "label-recovery harness that scores an embedding table "
                "before it gates dedup/retrieval. Query side BROADCAST; "
                "the per-query top-k window ranks the |Q|·N pair rows — "
                "linear in the corpus because |Q| is id-capped "
                "(_KNN_MAXQ), and the window shuffles by query_id so no "
                "single task sees more than N rows",
)
def knn_label_vote_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Norms hoisted out of the |Q| x |corpus| pair space (_pair_sim
    # discipline) — bit-identical, 1 traversal per pair instead of 5.
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    ).withColumn("vn", norm(F.col("v")))
    q = emb.filter(
        (F.col("vec_id") % _KNN_MOD == 0)
        & (F.col("vec_id") < _KNN_MOD * _KNN_MAXQ)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
        F.col("vn").alias("qn"),
    )
    sims = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "true_label",
            F.col("label").alias("nn_label"),
            (dot(F.col("qv"), F.col("v"))
             / (F.col("qn") * F.col("vn"))).alias("cos"),
            "vec_id",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    nn = sims.select(
        "query_id", "true_label", "nn_label",
        F.row_number().over(w).alias("rank"),
    ).filter(F.col("rank") <= _KNN_K)
    votes = nn.groupBy("query_id", "true_label", "nn_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    best = votes.groupBy("query_id", "true_label").agg(
        F.min(
            F.struct(
                (-F.col("n_votes")).alias("neg"),
                F.col("nn_label").alias("lbl"),
            )
        ).alias("b")
    )
    return best.select(
        "query_id", "true_label",
        F.col("b.lbl").alias("predicted_label"),
        (-F.col("b.neg")).cast("long").alias("n_votes"),
        (F.col("b.lbl") == F.col("true_label")).alias("correct"),
    )
