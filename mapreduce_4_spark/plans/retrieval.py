"""Search / entity-resolution queries: blocked fuzzy join, inverted
index construction, and BM25-style lexical retrieval — the lexical-side
counterpart of the embedding similarity family (plans/similarity.py).

All three are fully oracled. Cross-engine float parity notes:

- The fuzzy join compares Levenshtein distances — integers, identical by
  definition in both engines.
- The BM25 scorer uses a RATIONAL idf ``1 + (N - df + 0.5) / (df + 0.5)``
  instead of the Lucene-BM25 ``ln`` of that quantity: +, *, / are
  correctly rounded in IEEE double (bit-exact across engines), while
  ``ln`` is only faithfully rounded and may differ in the last ulp
  between libm and the JVM. The rational idf is exp of the Lucene idf —
  positive and monotone in df, so per-term ranking behavior is
  preserved; top-set agreement with the classic-log variant is
  property-tested in tests/test_retrieval.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import sql_words, words
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

_WORDS_SQL = sql_words("text")

#: fixed lexical query for the retrieval demos (high-df terms in the
#: synthetic corpus, chosen once — literals in both engines)
_QUERY_TERMS = ("data", "spark", "merge")
_TOP_N = 20
_POSTINGS_HEAD = 16


@register(
    "fuzzy_join_part_names",
    oracle="""
        WITH clean AS (
            SELECT p_partkey AS clean_key, p_name AS clean_name,
                   substring(p_name, 1, 3) AS blk
            FROM part
        ),
        dirty AS (
            SELECT p_partkey AS dirty_key,
                   substring(p_name, 1, pos - 1) || substring(p_name, pos + 1)
                       AS dirty_name,
                   substring(p_name, 1, 3) AS blk
            FROM (
                SELECT p_partkey, p_name,
                       4 + CAST(p_partkey % (length(p_name) - 3) AS INTEGER)
                           AS pos
                FROM part
            )
        ),
        cand AS (
            SELECT d.dirty_key, d.dirty_name, c.clean_key, c.clean_name,
                   levenshtein(d.dirty_name, c.clean_name) AS dist
            FROM dirty d JOIN clean c ON d.blk = c.blk
            WHERE levenshtein(d.dirty_name, c.clean_name) <= 2
        )
        SELECT dirty_key, dirty_name, clean_key AS matched_key,
               clean_name AS matched_name, dist,
               (clean_name = (SELECT p_name FROM part p
                              WHERE p.p_partkey = cand.dirty_key))
                   AS name_recovered
        FROM cand
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY dirty_key ORDER BY dist, clean_key
        ) = 1
    """,
    tags=("join", "fuzzy", "entity-resolution"),
    description="blocked fuzzy entity resolution: a 'dirty' catalog is "
                "synthesized by deterministically dropping one character "
                "from every part name (position keyed off p_partkey, "
                "always past the 3-char blocking prefix), then resolved "
                "back against the clean catalog via a prefix-block hash "
                "join + Levenshtein<=2 + best-match-per-row "
                "(min distance, key tiebreak). The block join is the "
                "scale story: candidates are only same-prefix pairs — "
                "never a cartesian — exactly how large-scale ER blocks "
                "billions of records. name_recovered audits whether the "
                "winner carries the original name string.",
)
def fuzzy_join_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    clean = part.select(
        F.col("p_partkey").alias("clean_key"),
        F.col("p_name").alias("clean_name"),
        F.substring("p_name", 1, 3).alias("blk"),
    )
    pos = (F.lit(4) + (F.col("p_partkey") % (F.length("p_name") - 3))).cast(
        "int"
    )
    dirty = part.withColumn("pos", pos).select(
        F.col("p_partkey").alias("dirty_key"),
        F.concat(
            F.expr("substring(p_name, 1, pos - 1)"),
            F.expr("substring(p_name, pos + 1)"),
        ).alias("dirty_name"),
        F.substring("p_name", 1, 3).alias("blk"),
        F.col("p_name").alias("orig_name"),
    )
    # Verify on DISTINCT (blk, name) pairs, not keyed rows: catalogs
    # repeat names heavily, so the expensive Levenshtein runs once per
    # distinct string pair and the winners broadcast back to the keyed
    # rows. The oracle's per-row winner (ORDER BY dist, clean_key) is
    # reconstructed exactly: rows sharing a clean_name share its dist,
    # so the global minimum is (dist, min clean_key within that name) —
    # same row, ~|distinct names|^2/|blocks| verifications instead of
    # |rows|^2/|blocks|. With all-unique names this degenerates to the
    # plain blocked join plus two cheap distinct aggregates.
    dd = dirty.select("blk", "dirty_name").distinct()
    cc = clean.groupBy("blk", "clean_name").agg(
        F.min("clean_key").alias("min_clean_key")
    )
    pairdist = (
        dd.join(cc, "blk")
        .withColumn("dist", F.levenshtein("dirty_name", "clean_name"))
        .filter(F.col("dist") <= 2)
    )
    w = Window.partitionBy("blk", "dirty_name").orderBy(
        "dist", "min_clean_key"
    )
    best = (
        pairdist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "blk",
            "dirty_name",
            F.col("min_clean_key").alias("matched_key"),
            F.col("clean_name").alias("matched_name"),
            F.col("dist").cast("long").alias("dist"),
        )
    )
    # no broadcast hint: |best| = |distinct dirty names|, which AQE can
    # judge at runtime (tiny here; row-sized when names are unique)
    return dirty.join(best, ["blk", "dirty_name"]).select(
        "dirty_key",
        "dirty_name",
        "matched_key",
        "matched_name",
        "dist",
        (F.col("matched_name") == F.col("orig_name")).alias("name_recovered"),
    )


@register(
    "inverted_index_terms",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest({_WORDS_SQL}) AS term FROM documents
        ),
        tf AS (
            SELECT term, doc_id, COUNT(*) AS tf
            FROM tok GROUP BY term, doc_id
        ),
        r AS (
            SELECT term, doc_id, tf,
                   ROW_NUMBER() OVER (
                       PARTITION BY term ORDER BY doc_id
                   ) AS rn
            FROM tf
        )
        SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
               string_agg(
                   CASE WHEN rn <= {_POSTINGS_HEAD}
                        THEN CAST(doc_id AS VARCHAR) END,
                   '|' ORDER BY doc_id
               ) AS postings_head
        FROM r GROUP BY term
    """,
    tags=("text", "retrieval", "aggregate"),
    description="inverted index construction over the documents corpus: "
                "per-term document frequency, total term frequency, and "
                "the first 16 postings (doc ids, serialized ascending). "
                "The scalable form is the (term, doc_id, tf) posting "
                "TABLE this derives from — one explode + one aggregation; "
                "the head-capped serialization is window-ranked BEFORE "
                "grouping so no unbounded collect_list ever materializes "
                "a hot term's full posting list on one task.",
)
def inverted_index_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(words("text")).alias("term"))
    tf = tok.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    w = Window.partitionBy("term").orderBy("doc_id")
    r = tf.withColumn("rn", F.row_number().over(w))
    return r.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
        F.concat_ws(
            "|",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("rn") <= _POSTINGS_HEAD, F.col("doc_id"))
                    )
                ),
                lambda d: d.cast("string"),
            ),
        ).alias("postings_head"),
    )


def _bm25_contrib_sql(term: str) -> str:
    """Per-term BM25 contribution as SQL — the EXACT expression tree the
    Spark side builds, so every +, *, / rounds identically."""
    return (
        f"COALESCE(MAX(CASE WHEN term = '{term}' THEN "
        f"(1.0 + ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)) + 0.5) / "
        f"(CAST(df AS DOUBLE) + 0.5)) * "
        f"((CAST(tf AS DOUBLE) * 2.2) / "
        f"(CAST(tf AS DOUBLE) + 1.2 * "
        f"(0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))) END), 0.0)"
    )


def _bm25_contrib(term: str):
    """Spark twin of :func:`_bm25_contrib_sql` — identical tree."""
    idf = F.lit(1.0) + (
        (F.col("n_docs").cast("double") - F.col("df").cast("double"))
        + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    tfpart = (F.col("tf").cast("double") * F.lit(2.2)) / (
        F.col("tf").cast("double")
        + F.lit(1.2)
        * (
            F.lit(0.25)
            + F.lit(0.75) * (F.col("dl").cast("double") / F.col("avgdl"))
        )
    )
    return F.coalesce(
        F.max(F.when(F.col("term") == term, idf * tfpart)), F.lit(0.0)
    )


@register(
    "bm25_retrieval_docs",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest({_WORDS_SQL}) AS term FROM documents
        ),
        dl AS (
            SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
        ),
        stats AS (
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       AS avgdl
            FROM dl
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM tok WHERE term IN {_QUERY_TERMS!r}
            GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ),
        scored AS (
            SELECT tf.doc_id,
                   {_bm25_contrib_sql(_QUERY_TERMS[0])} +
                   {_bm25_contrib_sql(_QUERY_TERMS[1])} +
                   {_bm25_contrib_sql(_QUERY_TERMS[2])} AS score
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN stats
            GROUP BY tf.doc_id
        )
        SELECT doc_id, score,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
        FROM scored
        QUALIFY rank <= {_TOP_N}
    """,
    tags=("text", "retrieval", "join"),
    description=f"BM25-style lexical retrieval: top-{_TOP_N} documents "
                f"for the fixed query {_QUERY_TERMS} (k1=1.2, b=0.75), "
                "scored from the inverted-index statistics — tf per "
                "(doc, term), df per term (broadcast), corpus stats as a "
                "one-row broadcast (no driver action). Uses the RATIONAL "
                "idf 1+(N-df+.5)/(df+.5) — exp of the Lucene log idf — so "
                "every arithmetic op is correctly-rounded IEEE and the "
                "scores are bit-identical across engines; per-term sums "
                "are folded as fixed-order conditional aggregates, never "
                "an order-sensitive SUM over doubles. Rank agreement "
                "with the classic ln-idf variant is property-tested.",
)
def bm25_retrieval_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(words("text")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("term").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            (
                _bm25_contrib(_QUERY_TERMS[0])
                + _bm25_contrib(_QUERY_TERMS[1])
                + _bm25_contrib(_QUERY_TERMS[2])
            ).alias("score")
        )
    )
    top = scored.orderBy(F.desc("score"), "doc_id").limit(_TOP_N)
    return top.select(
        "doc_id",
        "score",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "doc_id"))
        .cast("long")
        .alias("rank"),
    )


_RRF_K = 60       # the standard RRF damping constant (Cormack et al.)
_RRF_TOP = 15


def _rrf_oracle_sql() -> str:
    """The fusion oracle, assembled from the SAME BM25 contribution SQL
    the lexical query uses plus a cosine arm — one construction site so
    the two registered queries can never drift apart."""
    c0 = _bm25_contrib_sql(_QUERY_TERMS[0])
    c1 = _bm25_contrib_sql(_QUERY_TERMS[1])
    c2 = _bm25_contrib_sql(_QUERY_TERMS[2])
    return f"""
        WITH tok AS (
            SELECT doc_id, unnest({_WORDS_SQL}) AS term FROM documents
        ),
        dl AS (
            SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
        ),
        stats AS (
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       AS avgdl
            FROM dl
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM tok WHERE term IN {_QUERY_TERMS!r}
            GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ),
        scored AS (
            SELECT tf.doc_id, {c0} + {c1} + {c2} AS score
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN stats
            GROUP BY tf.doc_id
        ),
        lex AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                       AS lex_rank
            FROM scored QUALIFY lex_rank <= {_TOP_N}
        ),
        sem AS (
            SELECT c.vec_id AS doc_id,
                   ROW_NUMBER() OVER (
                       ORDER BY list_cosine_similarity(
                           CAST(q.embedding AS DOUBLE[]),
                           CAST(c.embedding AS DOUBLE[])) DESC,
                       c.vec_id) AS sem_rank
            FROM embeddings q JOIN embeddings c
              ON q.vec_id = 0 AND c.vec_id <> 0
            QUALIFY sem_rank <= {_TOP_N}
        ),
        fused AS (
            SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
                   l.lex_rank, s.sem_rank,
                   COALESCE(1.0 / ({_RRF_K} + l.lex_rank), 0.0)
                   + COALESCE(1.0 / ({_RRF_K} + s.sem_rank), 0.0) AS rrf
            FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
        )
        SELECT doc_id, lex_rank, sem_rank, rrf,
               ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id)
                   AS fused_rank
        FROM fused QUALIFY fused_rank <= {_RRF_TOP}
    """


@register(
    "rrf_fusion_retrieval",
    oracle=_rrf_oracle_sql(),
    tags=("text", "retrieval", "similarity", "join"),
    description=f"reciprocal-rank fusion of the two retrieval arms this "
                "engine ships: the BM25 lexical top-"
                f"{_TOP_N} (bm25_retrieval_docs' exact scorer) and the "
                f"embedding-cosine top-{_TOP_N} for query vector 0 "
                "(similarity family, vec_id = doc_id), fused as "
                f"rrf = 1/({_RRF_K}+lex_rank) + 1/({_RRF_K}+sem_rank) "
                "with a missing arm contributing 0 (full-outer join, "
                "fixed-order two-term sum — correctly-rounded IEEE, "
                f"bit-exact across engines). Top-{_RRF_TOP} fused docs "
                "with both arms' ranks exposed — the standard hybrid-"
                "search combiner (Cormack et al. RRF, k=60)",
)
def rrf_fusion_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale rationale: each arm is already scale-shaped (BM25 =
    inverted-index aggregates with broadcast df/corpus stats; cosine =
    broadcast-query brute force here, the LSH/IVF variants at corpus
    scale), and the fusion itself is a full-outer join of two TOP-N
    results — K rows a side, driver-free, trivially broadcast. RRF is
    rank-only, so the fusion is immune to the arms' score-scale
    differences (the reason production hybrid search uses it over
    score mixing).

    Reference anchor: generalizes the reference's single word-count
    ranking (asio_deep/main.cpp:434-516) to multi-signal retrieval.
    """
    from mapreduce_4_spark.operators.similarity import brute_force_topk

    lex = bm25_retrieval_docs(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("lex_rank"))
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    sem = brute_force_topk(emb, q, k=_TOP_N).select(
        F.col("vec_id").alias("doc_id"),
        F.col("rank").alias("sem_rank"))
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id", "lex_rank", "sem_rank",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(float(_RRF_K))
                              + F.col("lex_rank").cast("double")),
                F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(float(_RRF_K))
                              + F.col("sem_rank").cast("double")),
                F.lit(0.0))
        ).alias("rrf"),
    )
    w = Window.orderBy(F.desc("rrf"), "doc_id")
    return (
        fused.withColumn("fused_rank",
                         F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rank") <= _RRF_TOP)
    )
