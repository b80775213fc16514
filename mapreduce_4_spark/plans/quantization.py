"""Product quantization (PQ) for the similarity tier, with its measured
recall — the second compression knob beside the int8 scalar quantizer
(``embedding_quantize_recall``).

The 64-dim embedding splits into M=4 16-dim subspaces; each subspace
has a K=16-codeword codebook SEEDED from the lowest-id vectors (the
``similarity_ivf_topk_seeded`` convention: a deterministic index build,
zero Lloyd rounds, so the whole encode -> reconstruct -> search path is
reproduced bit-for-bit by the DuckDB oracle). Vectors encode to 4
codes (4 bytes vs 256 float bytes — 64x); search is asymmetric (ADC):
the RAW query scores against candidates' codeword reconstructions.

Nearest-codeword assignment ranks by ``-2*<sub,cw> + |cw|^2`` (equal
ordering to L2 distance, |sub|^2 constant per row) — dot products only,
which is the operation with established fold parity across engines
(functions/vectors.py).

100 TB posture: the codebook (64 tiny rows) and the coarse centroids
(8 rows) each collapse into ONE broadcast row holding a sorted struct
array; encoding, reconstruction, AND coarse routing are then per-row
JVM expressions (``array_sort(transform(...))[0]`` argmins) — zero row
blowup, zero corpus-keyed Exchange anywhere upstream of the candidate
join (plan-asserted in tests/test_plan_properties.py; the shape
``operators/clustering.py``'s fixed-point k-means established).
Candidate scoring touches reconstructions, never raw vectors — this is
how billion-scale ANN serves from RAM.

Reference anchor: the O9 merge contract generalized to vector-keyed
spaces (asio_deep/main.cpp:434-516).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.vectors import as_double, cosine, dot
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

_DIM = 64
_PQ_M = 4          # subspaces
_PQ_SUB = _DIM // _PQ_M
_PQ_K = 16         # codewords per subspace (codebook = 16 lowest ids)
_N_QUERIES = 5
_K = 10


def _codebook_array(emb: DataFrame) -> DataFrame:
    """The seeded PQ codebook collapsed to ONE row: a cid-sorted array
    of (cid, cw) structs PER SUBSPACE (columns ``_cb0.._cb3``) — the
    broadcast payload the map-only encoder consumes.

    Round-15 (guide §2.4 duplicated subtrees / §1.2 per-task work): the
    old build unioned 4 per-subspace projections of the seed, so the
    corpus-wide TakeOrdered seed scan ran ONCE PER SUBSPACE (4 parquet
    scans of the corpus in the plan, 8 in ivf_pq); now one seed pass
    explodes its 4 subspace slices row-side. And splitting the codebook
    into per-subspace array columns removes the per-row
    ``filter(_cb, m == k)`` scan of all 64 structs from the encoder —
    each subspace reads its own 16-entry array directly."""
    seed = (
        emb.orderBy("vec_id").limit(_PQ_K)
        .select(F.row_number().over(Window.orderBy("vec_id")).alias("cid"), "e")
    )
    cb = seed.select(
        "cid",
        F.explode(F.array(*[
            F.struct(
                F.lit(m).alias("m"),
                F.slice("e", m * _PQ_SUB + 1, _PQ_SUB).alias("cw"),
            )
            for m in range(_PQ_M)
        ])).alias("s"),
    ).select("cid", "s.m", "s.cw")
    return cb.agg(*[
        F.array_sort(
            F.collect_list(
                F.when(F.col("m") == m, F.struct("cid", "cw"))
            )
        ).alias(f"_cb{m}")
        for m in range(_PQ_M)
    ])


def _pq_recon_col(e: Column) -> Column:
    """Per-row PQ encode + reconstruct as ONE expression over the
    broadcast per-subspace ``_cb{m}`` arrays: for each subspace the
    nearest codeword by ``-2<sub,cw> + |cw|^2`` (ascending, ties to the
    lowest cid — equal ordering to L2; dot products only, the fold with
    cross-engine parity), reconstruction = chosen codewords
    concatenated in subspace order. No subspace explode, no (vec_id, m)
    window, no groupBy — the encode stage moves zero rows."""
    parts = []
    for m in range(_PQ_M):
        sub = F.slice(e, m * _PQ_SUB + 1, _PQ_SUB)
        # array_min == array_sort(...)[0] under the (score, cid, cw)
        # struct order — (score, cid) is already unique (round-14)
        best = F.array_min(
            F.transform(
                F.col(f"_cb{m}"),
                lambda b: F.struct(
                    (F.lit(-2.0) * dot(sub, b["cw"]) + dot(b["cw"], b["cw"]))
                    .alias("_score"),
                    b["cid"].alias("_cid"),
                    b["cw"].alias("_cw"),
                ),
            )
        )
        parts.append(best["_cw"])
    return F.flatten(F.array(*parts))


def pq_reconstructions(emb: DataFrame) -> DataFrame:
    """(vec_id, r): every vector's PQ reconstruction — a pure map over
    the corpus against the one-row broadcast codebook."""
    return (
        emb.crossJoin(F.broadcast(_codebook_array(emb)))
        .select("vec_id", _pq_recon_col(F.col("e")).alias("r"))
    )


def _sql_sub(expr: str, m: int) -> str:
    return f"{expr}[{m * _PQ_SUB + 1}:{(m + 1) * _PQ_SUB}]"


def _pq_oracle() -> str:
    sub_union = " UNION ALL ".join(
        f"SELECT cid, {m} AS m, {_sql_sub('c', m)} AS cw FROM seed"
        for m in range(_PQ_M)
    )
    enc_union = " UNION ALL ".join(
        f"SELECT vec_id, {m} AS m, {_sql_sub('e', m)} AS sub FROM emb"
        for m in range(_PQ_M)
    )
    return f"""
        WITH emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        seed AS (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cid, e AS c
            FROM (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT {_PQ_K})
        ),
        cb AS ({sub_union}),
        subs AS ({enc_union}),
        codes AS (
            SELECT vec_id, m, cid FROM (
                SELECT s.vec_id, s.m, b.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.vec_id, s.m
                           ORDER BY -2.0 * list_dot_product(s.sub, b.cw)
                                    + list_dot_product(b.cw, b.cw) ASC,
                                    b.cid
                       ) AS rn
                FROM subs s JOIN cb b ON s.m = b.m
            ) WHERE rn = 1
        ),
        recon AS (
            SELECT vec_id, flatten(list(cw ORDER BY m)) AS r
            FROM (SELECT c.vec_id, c.m, b.cw
                  FROM codes c JOIN cb b ON c.m = b.m AND c.cid = b.cid)
            GROUP BY vec_id
        ),
        qt AS (
            SELECT query_id, vec_id FROM (
                SELECT q.vec_id AS query_id, r.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.e, r.r) DESC,
                                    r.vec_id
                       ) AS rnk
                FROM emb q JOIN recon r
                  ON q.vec_id < {_N_QUERIES} AND q.vec_id <> r.vec_id
            ) WHERE rnk <= {_K}
        ),
        ex AS (
            SELECT query_id, vec_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.e, c.e) DESC,
                                    c.vec_id
                       ) AS rnk
                FROM emb q JOIN emb c
                  ON q.vec_id < {_N_QUERIES} AND q.vec_id <> c.vec_id
            ) WHERE rnk <= {_K}
        )
        SELECT ex.query_id,
               COUNT(*) AS n_true,
               COUNT(qt.vec_id) AS n_hit,
               CAST(COUNT(qt.vec_id) AS DOUBLE) / COUNT(*) AS recall_at_10
        FROM ex LEFT JOIN qt
          ON ex.query_id = qt.query_id AND ex.vec_id = qt.vec_id
        GROUP BY ex.query_id
    """


@register(
    "pq_recall_topk",
    oracle=_pq_oracle(),
    tags=("similarity", "quantization", "diagnostics"),
    description="product-quantization recall eval: 4x16-dim subspaces, "
                "16 seeded codewords each (64x compression), asymmetric "
                "search — raw query cosine against candidates' codeword "
                "reconstructions — recall@10 per query vs the exact tier; "
                "fully oracled via the seeded-index convention",
)
def pq_recall_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode + reconstruct: ONE per-row expression over the one-row
    broadcast codebook (nearest codeword per subspace by
    -2<sub,cw>+|cw|^2 — dot products only, the fold with cross-engine
    parity; see pq_reconstructions) — no subspace explode, no window,
    no groupBy. Search: the bounded query-side broadcast contract
    shared with the other recall evals."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("e")
    )
    recon = pq_reconstructions(emb)

    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qv")
    )

    from mapreduce_4_spark.operators.similarity import (
        cosine_topk_ids,
        recall_vs_exact,
    )

    exact = cosine_topk_ids(q, emb.select("vec_id", "e"), "e", _K)
    quant = cosine_topk_ids(q, recon, "r", _K)
    return recall_vs_exact(exact, quant)


_IVF_C = 8       # coarse centroids (seeded: the 8 lowest-id vectors)
_NPROBE = 2      # probed lists per query
_RERANK = 20     # ADC shortlist size handed to the exact re-rank


def _coarse_array(emb: DataFrame) -> DataFrame:
    """The seeded coarse quantizer collapsed to ONE row: a ccid-sorted
    array of (ccid, c) structs, broadcast into the map-only router."""
    cent = (
        emb.orderBy("vec_id").limit(_IVF_C)
        .select(F.row_number().over(Window.orderBy("vec_id")).alias("ccid"),
                F.col("e").alias("c"))
    )
    return cent.agg(
        F.array_sort(F.collect_list(F.struct("ccid", "c"))).alias("_cents")
    )


def _coarse_structs(e: Column) -> Column:
    """(-cosine, ccid) struct per coarse centroid for one row — shared
    by the argmin (array_min) and ranked (array_sort) views. Same
    cosine arithmetic as the oracle's list_cosine_similarity."""
    return F.transform(
        F.col("_cents"),
        lambda s: F.struct(
            (-cosine(e, s["c"])).alias("_negsim"),
            s["ccid"].alias("_ccid"),
        ),
    )


def _ranked_coarse(e: Column) -> Column:
    """Centroids sorted nearest-first for one row (ascending by
    -cosine, ties to lowest ccid): element 0 routes the row, the first
    nprobe elements are a query's probe set."""
    return F.array_sort(_coarse_structs(e))


def coarse_assigned(emb: DataFrame) -> DataFrame:
    """(vec_id, cluster): every vector routed to its nearest seeded
    coarse centroid — a pure map against the one-row broadcast centroid
    array; zero corpus-keyed Exchange (plan-asserted)."""
    return (
        emb.crossJoin(F.broadcast(_coarse_array(emb)))
        # array_min == ranked[0] without the per-row sort (round-14)
        .select("vec_id",
                F.array_min(_coarse_structs(F.col("e")))["_ccid"]
                .alias("cluster"))
    )


def _ivf_pq_oracle() -> str:
    sub_union = " UNION ALL ".join(
        f"SELECT cid, {m} AS m, {_sql_sub('c', m)} AS cw FROM seed"
        for m in range(_PQ_M)
    )
    enc_union = " UNION ALL ".join(
        f"SELECT vec_id, {m} AS m, {_sql_sub('e', m)} AS sub FROM emb"
        for m in range(_PQ_M)
    )
    return f"""
        WITH emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        cent AS (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS ccid, e AS c
            FROM (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT {_IVF_C})
        ),
        assigned AS (
            SELECT vec_id, ccid AS cluster FROM (
                SELECT v.vec_id, c.ccid,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY list_cosine_similarity(v.e, c.c) DESC,
                                    c.ccid
                       ) AS rn
                FROM emb v CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT query_id, ccid AS cluster FROM (
                SELECT q.vec_id AS query_id, c.ccid,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.e, c.c) DESC,
                                    c.ccid
                       ) AS rn
                FROM emb q CROSS JOIN cent c
                WHERE q.vec_id < {_N_QUERIES}
            ) WHERE rn <= {_NPROBE}
        ),
        seed AS (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cid, e AS c
            FROM (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT {_PQ_K})
        ),
        cb AS ({sub_union}),
        subs AS ({enc_union}),
        codes AS (
            SELECT vec_id, m, cid FROM (
                SELECT s.vec_id, s.m, b.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.vec_id, s.m
                           ORDER BY -2.0 * list_dot_product(s.sub, b.cw)
                                    + list_dot_product(b.cw, b.cw) ASC,
                                    b.cid
                       ) AS rn
                FROM subs s JOIN cb b ON s.m = b.m
            ) WHERE rn = 1
        ),
        recon AS (
            SELECT vec_id, flatten(list(cw ORDER BY m)) AS r
            FROM (SELECT c.vec_id, c.m, b.cw
                  FROM codes c JOIN cb b ON c.m = b.m AND c.cid = b.cid)
            GROUP BY vec_id
        ),
        cand AS (
            SELECT p.query_id, a.vec_id
            FROM probes p JOIN assigned a ON p.cluster = a.cluster
            WHERE p.query_id <> a.vec_id
        ),
        adc AS (
            SELECT query_id, vec_id FROM (
                SELECT cd.query_id, cd.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY cd.query_id
                           ORDER BY list_cosine_similarity(q.e, r.r) DESC,
                                    cd.vec_id
                       ) AS rn
                FROM cand cd
                JOIN emb q ON q.vec_id = cd.query_id
                JOIN recon r ON r.vec_id = cd.vec_id
            ) WHERE rn <= {_RERANK}
        ),
        reranked AS (
            SELECT query_id, vec_id FROM (
                SELECT a.query_id, a.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY a.query_id
                           ORDER BY list_cosine_similarity(q.e, c.e) DESC,
                                    a.vec_id
                       ) AS rnk
                FROM adc a
                JOIN emb q ON q.vec_id = a.query_id
                JOIN emb c ON c.vec_id = a.vec_id
            ) WHERE rnk <= {_K}
        ),
        ex AS (
            SELECT query_id, vec_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.e, c.e) DESC,
                                    c.vec_id
                       ) AS rnk
                FROM emb q JOIN emb c
                  ON q.vec_id < {_N_QUERIES} AND q.vec_id <> c.vec_id
            ) WHERE rnk <= {_K}
        ),
        nc AS (
            SELECT query_id, COUNT(*) AS n_cand FROM cand GROUP BY query_id
        )
        SELECT ex.query_id,
               CAST(MAX(nc.n_cand) AS BIGINT) AS n_cand,
               COUNT(*) AS n_true,
               COUNT(rr.vec_id) AS n_hit,
               CAST(COUNT(rr.vec_id) AS DOUBLE) / COUNT(*) AS recall_at_10
        FROM ex
        LEFT JOIN reranked rr
          ON ex.query_id = rr.query_id AND ex.vec_id = rr.vec_id
        JOIN nc ON nc.query_id = ex.query_id
        GROUP BY ex.query_id
    """


@register(
    "ivf_pq_search_recall",
    oracle=_ivf_pq_oracle(),
    tags=("similarity", "ivf", "quantization", "diagnostics"),
    description="the full production ANN stack composed and measured: "
                f"IVF routing ({_IVF_C} seeded coarse centroids, "
                f"nprobe={_NPROBE}) bounds the candidate set, PQ "
                "asymmetric-distance scoring over codeword "
                f"reconstructions shortlists the top {_RERANK}, and an "
                f"exact cosine re-rank of the shortlist yields the top "
                f"{_K} — per-query candidate volume and recall@10 vs "
                "brute force reported. Seeded coarse quantizer AND "
                "seeded codebooks (the deterministic-index convention), "
                "so all three stages replay bit-for-bit in DuckDB",
)
def ivf_pq_search_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale rationale: this is how billion-scale ANN actually serves —
    the coarse quantizer bounds corpus contact to ~nprobe/k of the
    data, ADC scores candidates from 4-byte codes reconstructed out of
    a 64-row broadcast codebook (raw vectors never touched), and only
    the 20-row shortlist pays exact arithmetic. Every stage is a
    broadcast or list-bucketed hash join; nothing is all-pairs. The
    recall column prices the compression: IVF loses candidates outside
    probed lists, PQ mis-ranks within them, the re-rank recovers
    whatever survives both.

    Reference anchor: the reference's single-stage ranking
    (asio_deep/main.cpp:434-516) generalized to the tiered
    route-shortlist-rerank shape retrieval systems deploy.
    """
    from mapreduce_4_spark.functions.vectors import cosine
    from mapreduce_4_spark.operators.similarity import recall_vs_exact

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("e"))
    # coarse routing: map-only argmin over the one-row broadcast
    # centroid array (no corpus x 8 blowup, no vec_id window/Exchange)
    assigned = coarse_assigned(emb)
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qv"))
    probes = (
        q.crossJoin(F.broadcast(_coarse_array(emb)))
        .select("query_id",
                F.explode(F.slice(_ranked_coarse(F.col("qv")), 1, _NPROBE))
                .alias("_p"))
        .select("query_id", F.col("_p._ccid").alias("cluster"))
    )
    # PQ encode -> reconstruct: one per-row expression (pq_recall_topk's
    # pipeline) — the encode stage moves zero rows
    recon = pq_reconstructions(emb)
    # stage 1: IVF candidates; stage 2: ADC shortlist; stage 3: rerank
    cand = (
        probes.join(assigned, "cluster")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
    )
    adc = (
        cand.join(F.broadcast(q), "query_id")
        .join(recon, "vec_id")
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("query_id")
            .orderBy(cosine(F.col("qv"), F.col("r")).desc(),
                     F.col("vec_id"))))
        .filter(F.col("rn") <= _RERANK)
        .select("query_id", "vec_id")
    )
    reranked = (
        adc.join(F.broadcast(q), "query_id")
        .join(emb, "vec_id")
        .withColumn("rnk", F.row_number().over(
            Window.partitionBy("query_id")
            .orderBy(cosine(F.col("qv"), F.col("e")).desc(),
                     F.col("vec_id"))))
        .filter(F.col("rnk") <= _K)
        .select("query_id", "vec_id")
    )
    from mapreduce_4_spark.operators.similarity import cosine_topk_ids

    exact = cosine_topk_ids(q.select("query_id", F.col("qv")),
                            emb.select("vec_id", "e"), "e", _K)
    n_cand = cand.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_cand"))
    rec = recall_vs_exact(exact, reranked)
    return (
        rec.join(n_cand, "query_id")
        .select("query_id", F.col("n_cand").cast("long").alias("n_cand"),
                "n_true", "n_hit", "recall_at_10")
    )
