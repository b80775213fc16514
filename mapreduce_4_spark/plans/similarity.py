"""Similarity-search queries over the embeddings table.

Brute-force cosine top-k is the exact baseline with a full DuckDB oracle
(bit-identical doubles, see functions/vectors.py). The LSH-bucketed
variant is ALSO fully oracled: the hyperplanes come from a fixed seed, so
the oracle SQL bakes the identical plane values in as literals and DuckDB
reproduces the exact bucket assignment (list_dot_product is bit-identical
to the Spark fold — see functions/vectors.py) and the exact within-bucket
rerank. Recall-vs-brute-force is additionally property-tested in
tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.operators.similarity import (
    brute_force_topk,
    hyperplanes,
    lsh_topk,
)
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

_N_QUERIES = 5  # vec_id < 5 serve as the query set
_K = 10
_N_PLANES = 8
_DIM = 64


def _sql_bucket(vec_expr: str) -> str:
    """Bucket id as a SQL expression: sum of sign bits against the SAME
    plane values the Spark operator generates (seeded, baked as literals —
    repr round-trips doubles exactly, so both engines see identical
    planes and the dot-product parity makes the signs identical)."""
    planes = hyperplanes(_DIM, _N_PLANES)
    terms = []
    for j, plane in enumerate(planes):
        lits = ", ".join(repr(float(x)) for x in plane)
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, [{lits}]) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(terms)


@register(
    "similarity_bruteforce_topk",
    oracle=f"""
        SELECT query_id, vec_id, cosine_sim, rank FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                   list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])) AS cosine_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                       CAST(c.embedding AS DOUBLE[])) DESC,
                                c.vec_id
                   ) AS rank
            FROM embeddings q JOIN embeddings c
              ON q.vec_id < {_N_QUERIES} AND q.vec_id <> c.vec_id
        )
        WHERE rank <= {_K}
    """,
    tags=("similarity",),
    description="exact cosine top-10 for 5 query vectors (broadcast query side)",
)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(emb, queries, k=_K)


@register(
    "similarity_lsh_topk",
    oracle=f"""
        WITH emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        b AS (
            SELECT vec_id, e, {_sql_bucket('e')} AS bucket FROM emb
        ),
        q AS (
            SELECT vec_id AS query_id, e AS qe, bucket
            FROM b WHERE vec_id < {_N_QUERIES}
        ),
        p AS (
            SELECT q.query_id, c.vec_id,
                   list_cosine_similarity(q.qe, c.e) AS cosine_sim
            FROM q JOIN b c
              ON q.bucket = c.bucket AND q.query_id <> c.vec_id
        )
        SELECT query_id, vec_id, cosine_sim, rank FROM (
            SELECT p.*,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine_sim DESC, vec_id
                   ) AS rank
            FROM p
        ) WHERE rank <= {_K}
    """,
    tags=("similarity", "lsh"),
    description="LSH-bucketed approximate top-10 (8 hyperplanes): the 100 TB "
                "ANN path, exact ranking within bucket collisions only; "
                "oracled by baking the seeded plane literals into the SQL",
)
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(emb, queries, dim=_DIM, k=_K, n_planes=_N_PLANES)


@register(
    "embedding_norms",
    oracle="""
        SELECT vec_id,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS l2_norm,
               list_dot_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS sq_norm
        FROM embeddings
    """,
    tags=("similarity", "array"),
    description="per-vector L2 norms via zip_with/aggregate (no UDF)",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.functions.vectors import as_double, dot, norm

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    v = as_double(F.col("embedding"))
    return emb.select(
        "vec_id",
        norm(v).alias("l2_norm"),
        dot(v, v).alias("sq_norm"),
    )


_IVF_K = 8        # coarse clusters
_IVF_NPROBE = 2   # inverted lists probed per query


@register(
    "similarity_ivf_topk_seeded",
    oracle=f"""
        WITH emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        cent AS (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cid, e AS c
            FROM (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT {_IVF_K})
        ),
        assigned AS (
            SELECT vec_id, e, cid AS cluster FROM (
                SELECT v.vec_id, v.e, c.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY list_cosine_similarity(v.e, c.c) DESC,
                                    c.cid
                       ) AS rn
                FROM emb v CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT query_id, qe, cid AS cluster FROM (
                SELECT q.vec_id AS query_id, q.e AS qe, c.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.e, c.c) DESC,
                                    c.cid
                       ) AS rn
                FROM emb q CROSS JOIN cent c
                WHERE q.vec_id < {_N_QUERIES}
            ) WHERE rn <= {_IVF_NPROBE}
        ),
        cand AS (
            SELECT p.query_id, a.vec_id,
                   list_cosine_similarity(p.qe, a.e) AS cosine_sim
            FROM probes p JOIN assigned a ON p.cluster = a.cluster
            WHERE p.query_id <> a.vec_id
        )
        SELECT query_id, vec_id, cosine_sim, rank FROM (
            SELECT cand.*,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine_sim DESC, vec_id
                   ) AS rank
            FROM cand
        ) WHERE rank <= {_K}
    """,
    tags=("similarity", "ivf"),
    description="IVF ANN with a FIXED coarse quantizer (centroids = the "
                f"{_IVF_K} lowest-id vectors, zero Lloyd rounds): the "
                "index-build/index-search split with a deterministic "
                "index, so the whole probed search — assignment, "
                "nprobe=2 probe selection, within-list exact rerank — is "
                "reproduced bit-for-bit by the DuckDB oracle "
                "(list_cosine_similarity parity, functions/vectors.py). "
                "The Lloyd-trained variant is similarity_ivf_topk "
                "(rows-only; recall property-tested). Scale: centroids "
                "broadcast, corpus contact = nprobe/k of brute force.",
)
def similarity_ivf_topk_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.ann_ivf import ivf_topk, train_centroids

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cent = train_centroids(emb, k=_IVF_K, iters=0)
    return ivf_topk(
        emb, queries, k=_K, nprobe=_IVF_NPROBE, centroids=cent
    )


from mapreduce_4_spark.registry import REGISTRY as _REG

_BF_SQL = _REG["similarity_bruteforce_topk"].oracle
_LSH_SQL = _REG["similarity_lsh_topk"].oracle

#: second arm of the recall diagnostic: 4 planes + hamming-1 multiprobe
#: (the recall-vs-cost knob turned the other way from the registered
#: 8-plane single-probe config)
_MP_PLANES = 4


def _sql_bucket_n(vec_expr: str, n_planes: int, seed: int = 42) -> str:
    """Like _sql_bucket but for an arbitrary plane count (and seed —
    the OR-amplified decontam tables use seed 42+t per table)."""
    planes = hyperplanes(_DIM, n_planes, seed=seed)
    terms = []
    for j, plane in enumerate(planes):
        lits = ", ".join(repr(float(x)) for x in plane)
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, [{lits}]) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(terms)


# multiprobe candidate condition: exact bucket OR any hamming-1 probe
_MP_MATCH = " OR ".join(
    ["q.bucket = c.bucket"]
    + [f"xor(q.bucket, {1 << j}) = c.bucket" for j in range(_MP_PLANES)]
)

_LSH_MP_SQL = f"""
    WITH emb4 AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    b4 AS (
        SELECT vec_id, e, {{bucket}} AS bucket FROM emb4
    ),
    q4 AS (
        SELECT vec_id AS query_id, e AS qe, bucket
        FROM b4 WHERE vec_id < {_N_QUERIES}
    ),
    p4 AS (
        SELECT q.query_id, c.vec_id,
               list_cosine_similarity(q.qe, c.e) AS cosine_sim
        FROM q4 q JOIN b4 c
          ON ({_MP_MATCH}) AND q.query_id <> c.vec_id
    )
    SELECT query_id, vec_id FROM (
        SELECT p4.*,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine_sim DESC, vec_id
               ) AS rank
        FROM p4
    ) WHERE rank <= {_K}
""".format(bucket=_sql_bucket_n("e", _MP_PLANES))


def _recall_arm_sql(config: str, lsh_sql: str) -> str:
    return f"""
        SELECT '{config}' AS config, bf.query_id,
               COUNT(*) AS n_true,
               COUNT(l.vec_id) AS n_hit,
               CAST(COUNT(l.vec_id) AS DOUBLE) / COUNT(*) AS recall_at_10
        FROM ({_BF_SQL}) bf
        LEFT JOIN ({lsh_sql}) l
          ON bf.query_id = l.query_id AND bf.vec_id = l.vec_id
        GROUP BY bf.query_id
    """


@register(
    "lsh_recall_at_k",
    oracle=(
        _recall_arm_sql("planes8_single", _LSH_SQL)
        + " UNION ALL "
        + _recall_arm_sql("planes4_multiprobe", _LSH_MP_SQL)
    ),
    tags=("similarity", "lsh", "diagnostics"),
    description="per-query recall@10 of two LSH configs against the "
                "exact brute-force top-10: the registered 8-plane "
                "single-probe (fast, low recall on unstructured "
                "fixtures) vs 4 planes + hamming-1 multiprobe (the "
                "knob turned toward recall) — the ANN tier ships with "
                "its own measured quality, as a fully-oracled query",
)
def lsh_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval harness for the ANN tier, as a composition: join each
    LSH config's result against the exact result, count hits per query.
    The fixture's embeddings are near-uniform random — the hardest case
    for sign-LSH (top-10 cosines sit at ~0.3-0.4, so bucket-collision
    probability is low by construction); the two arms quantify exactly
    what the n_planes / multiprobe dial buys there (measured 0.0 vs
    ~0.4-0.5 recall). At scale the exact side runs on a sampled query
    set — recall is a statistic, the sample bounds the brute-force
    cost."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = similarity_bruteforce_topk(spark, sf_dir).select(
        "query_id", "vec_id"
    )
    arms = [
        ("planes8_single", similarity_lsh_topk(spark, sf_dir)),
        (
            "planes4_multiprobe",
            lsh_topk(emb, queries, dim=_DIM, k=_K, n_planes=_MP_PLANES,
                     multiprobe=True),
        ),
    ]
    out = None
    for config, lsh in arms:
        scored = (
            brute.join(
                lsh.select("query_id", "vec_id", F.lit(1).alias("_hit")),
                ["query_id", "vec_id"],
                "left",
            )
            .groupBy("query_id")
            .agg(
                F.count(F.lit(1)).alias("n_true"),
                F.count("_hit").alias("n_hit"),
                (F.count("_hit").cast("double") / F.count(F.lit(1)))
                .alias("recall_at_10"),
            )
            .select(
                F.lit(config).alias("config"),
                "query_id",
                "n_true",
                "n_hit",
                "recall_at_10",
            )
        )
        out = scored if out is None else out.unionByName(scored)
    return out


_MMR_LAMBDA = 0.7  # relevance weight; 1-λ penalizes redundancy
_MMR_N = 20        # candidate pool (exact cosine top-N for the query)
_MMR_K = 5         # diversified selections


def _mmr_oracle_sql() -> str:
    """Unrolled greedy MMR as pure SQL — the kmeans_fixedpoint move:
    the loop has a data-independent trip count, so its twin is the
    K-step unrolled plan with each step's argmax as a LIMIT 1 over the
    previous selections. Float parity holds because both engines see
    identical cosine doubles (functions/vectors.py) and the objective
    is a fixed-order two-term expression."""
    from mapreduce_4_spark.functions.vectors import sql_cosine

    parts = [f"""
        cand AS (
            SELECT c.vec_id AS doc_id,
                   {sql_cosine('q.embedding', 'c.embedding')} AS qsim
            FROM embeddings q JOIN embeddings c
              ON q.vec_id = 0 AND c.vec_id <> 0
            ORDER BY qsim DESC, doc_id LIMIT {_MMR_N}
        ),
        pairs AS (
            SELECT x.doc_id AS a, y.doc_id AS b,
                   {sql_cosine('ex.embedding', 'ey.embedding')} AS psim
            FROM cand x JOIN cand y ON x.doc_id <> y.doc_id
            JOIN embeddings ex ON ex.vec_id = x.doc_id
            JOIN embeddings ey ON ey.vec_id = y.doc_id
        ),
        s1 AS (
            SELECT doc_id, qsim, qsim AS mmr, CAST(1 AS BIGINT) AS step
            FROM cand ORDER BY qsim DESC, doc_id LIMIT 1
        ),
        sel1 AS (SELECT doc_id FROM s1)"""]
    for k in range(2, _MMR_K + 1):
        parts.append(f""",
        s{k} AS (
            SELECT doc_id, qsim, mmr, CAST({k} AS BIGINT) AS step FROM (
                SELECT c.doc_id, c.qsim,
                       {_MMR_LAMBDA} * c.qsim - {round(1 - _MMR_LAMBDA, 10)} * (
                           SELECT MAX(p.psim) FROM pairs p
                           WHERE p.a = c.doc_id
                             AND p.b IN (SELECT doc_id FROM sel{k - 1})
                       ) AS mmr
                FROM cand c
                WHERE c.doc_id NOT IN (SELECT doc_id FROM sel{k - 1})
            ) ORDER BY mmr DESC, doc_id LIMIT 1
        ),
        sel{k} AS (
            SELECT doc_id FROM sel{k - 1}
            UNION ALL SELECT doc_id FROM s{k}
        )""")
    union = " UNION ALL ".join(
        f"SELECT * FROM s{k}" for k in range(1, _MMR_K + 1))
    return ("WITH " + "".join(parts)
            + f" SELECT step, doc_id, qsim, mmr FROM ({union})")


@register(
    "mmr_diversified_topk",
    oracle=_mmr_oracle_sql(),
    tags=("similarity", "retrieval", "iterative"),
    description=f"maximal-marginal-relevance diversified top-{_MMR_K} "
                f"(Carbonell & Goldstein): greedy over the exact cosine "
                f"top-{_MMR_N} candidate pool for query vector 0 — step 1 "
                "takes the most relevant doc, each later step maximizes "
                f"{_MMR_LAMBDA}*sim(q,d) - {round(1 - _MMR_LAMBDA, 10)}*"
                "max_sim(d, selected), ties by doc_id. The trip count is "
                "data-independent, so the whole greedy loop unrolls into "
                "one declarative plan (the kmeans_fixedpoint move) and "
                "the DuckDB twin replays it step-for-step bit-exactly — "
                "the de-duplicating reranker every RAG stack runs after "
                "retrieval",
)
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale rationale: MMR cost lives in the candidate pool, not the
    corpus — the pool is top-N from the (LSH/IVF-accelerated at scale)
    retrieval arm, then the greedy phase is K argmax passes over ≤ N
    rows with an N x N pair-sim table (380 rows here). Greedy argmax
    is inherently SEQUENTIAL (step k's objective depends on step k-1's
    choice), so the steps are K one-row driver round-trips over the
    two persisted relations — the same build-time orchestration as
    metadata_agg_orders, and the honest alternative to unrolling the
    recursion into one plan, which grows the logical tree 2^K-fold
    (each step references the previous selections twice) and drowns
    in Catalyst planning cost long before execution matters. All
    arithmetic stays JVM-side; the driver only ferries one (id,
    score) row per step, so the pattern holds at any corpus size once
    the pool is fixed.

    Timing caveat: sweep/bench timings of the returned DataFrame
    measure K+2 small jobs over broadcast-sized data (the candidate
    scan is the only corpus-facing term).

    Reference anchor: the reference emits its ranking in one pass
    (asio_deep/main.cpp:434-516); MMR is the iterative reranking layer
    retrieval systems put on top.
    """
    from mapreduce_4_spark.functions.vectors import as_double, cosine
    from mapreduce_4_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    # the two relations every greedy step probes: N and N(N-1) rows,
    # persisted once, unpersisted before returning
    cand = brute_force_topk(emb, q, k=_MMR_N).select(
        F.col("vec_id").alias("doc_id"),
        F.col("cosine_sim").alias("qsim")).persist()
    ce = cand.join(emb, cand.doc_id == emb.vec_id).select(
        "doc_id", as_double("embedding").alias("e"))
    a = ce.select(F.col("doc_id").alias("a"), F.col("e").alias("ea"))
    b = ce.select(F.col("doc_id").alias("b"), F.col("e").alias("eb"))
    pairs = (
        a.join(F.broadcast(b), F.col("a") != F.col("b"))
        .select("a", "b", cosine(F.col("ea"), F.col("eb")).alias("psim"))
        .persist()
    )
    try:
        first = cand.orderBy(F.desc("qsim"), "doc_id").limit(1).first()
        rows = [(1, first["doc_id"], first["qsim"], first["qsim"])]
        for step in range(2, _MMR_K + 1):
            ids = [r[1] for r in rows]
            maxp = (
                pairs.filter(F.col("b").isin(ids))
                .groupBy("a").agg(F.max("psim").alias("maxp"))
                .withColumnRenamed("a", "doc_id")
            )
            pick = (
                cand.filter(~F.col("doc_id").isin(ids))
                .join(maxp, "doc_id")
                .select(
                    "doc_id", "qsim",
                    (F.lit(_MMR_LAMBDA) * F.col("qsim")
                     - F.lit(round(1 - _MMR_LAMBDA, 10)) * F.col("maxp")
                     ).alias("mmr"),
                )
                .orderBy(F.desc("mmr"), "doc_id").limit(1).first()
            )
            rows.append((step, pick["doc_id"], pick["qsim"], pick["mmr"]))
    finally:
        cand.unpersist()
        pairs.unpersist()
    # collected doubles are IEEE bit-exact through the Python float
    # round-trip, so the literal-row result still hash-matches the
    # oracle's unrolled replay
    return spark.createDataFrame(
        rows, "step long, doc_id long, qsim double, mmr double")
