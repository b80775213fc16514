"""Round-10 additions: the OR-amplified semantic-decontamination recall
dial (r9 verdict ask #2).

``semantic_decontam_lsh`` runs ONE 4-plane table — flag recall ~0.38 on
the adversarial near-uniform fixture (tests/test_similarity.py), honest
but a single operating point. This module registers the amplified twin:
``n_tables`` independent seeded plane sets, union-routed, so a corpus
vector is scored against every bench member it collides with in ANY
table — recall rises ~1-(1-r)^t (measured on the fixture: 0.38 -> 0.79
-> 0.87 at t=1/2/4) at ~t x probe cost, and ONLY the tiny bench side
fans out. The combined bucket key ``t * 2^n_planes + bucket_t`` keeps
the plan at exactly one BroadcastHashJoin on one long key
(plan-pinned), so the 100 TB shape is unchanged: corpus streams through
t cheap sign computations + one broadcast hash probe + one map-side
argmax — never a shuffle, never a |bench| multiplier.

Cross-engine float discipline as llm_pipeline8/9: seeded plane literals
for EVERY table bake into the oracle SQL via repr().

Reference anchor: generalizes the reference's plugin-selected pipeline
stages (asio_deep/main.cpp:98-149 dlopen dispatch) — the dial chooses
how much compute to spend per stage without changing stage semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import ngrams_join, sql_words, words
from mapreduce_4_spark.functions.vectors import as_double
from mapreduce_4_spark.operators.clustering import kmeans_fixedpoint
from mapreduce_4_spark.operators.similarity import decontam_max_cosine
from mapreduce_4_spark.plans.llm_pipeline8 import (
    _DECON_MAXB,
    _DECON_MOD,
    _DECON_TAU,
)
from mapreduce_4_spark.plans.llm_pipeline9 import _DLSH_PLANES
from mapreduce_4_spark.plans.similarity import _DIM, _sql_bucket_n
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

#: amplification factor of the registered query — the measured knee of
#: the fixture's recall curve (0.87 at t=4 vs 0.79 at t=2 vs 0.38 at
#: t=1); BASELINE.md carries the full curve with costs.
_DLSH_TABLES = 4


def _amp_key_sql(vec_expr: str, t: int) -> str:
    """The combined bucket key for table ``t``: t*2^p + bucket_t, with
    table t's seeded (seed 42+t) plane literals baked in."""
    return (f"({t << _DLSH_PLANES} + "
            f"{_sql_bucket_n(vec_expr, _DLSH_PLANES, seed=42 + t)})")


#: corpus side: one row per (vector, table) with that table's key
_AMP_CORPUS_SQL = " UNION ALL ".join(
    f"SELECT vec_id, v, {_amp_key_sql('v', t)} AS bucket FROM corpus"
    for t in range(_DLSH_TABLES)
)

#: bench side before probes: one row per (bench vector, table)
_AMP_BENCH_SQL = " UNION ALL ".join(
    f"SELECT vec_id AS bench_id, v AS bv, {_amp_key_sql('v', t)} AS bucket "
    f"FROM bench"
    for t in range(_DLSH_TABLES)
)

#: hamming-1 multiprobe on the bench side only; probes flip low bits so
#: they never cross a table's key subspace
_AMP_PROBE_SQL = " UNION ALL ".join(
    ["SELECT bench_id, bv, bucket FROM bb0"]
    + [
        f"SELECT bench_id, bv, xor(bucket, {1 << j}) FROM bb0"
        for j in range(_DLSH_PLANES)
    ]
)


_SPAN_W = sql_words("text")

#: TextRank fixed-point scale and iteration count. Integer arithmetic
#: makes every iteration bit-exact across engines (float PageRank would
#: drift in the last ulp through order-dependent double sums); 6
#: iterations is past the fixture graph's convergence knee, and the
#: unrolled-plan cost is linear in it.
_TR_SCALE = 10 ** 12
_TR_ITERS = 6


def _textrank_oracle() -> str:
    """Unrolled-iteration DuckDB twin: the same fixed-point PageRank,
    one CTE per iteration, generated so engine and oracle can never
    disagree on the iteration count or the damping arithmetic
    (d=0.85 as the exact rationals 17/20 and 3/20)."""
    head = f"""
        t AS (SELECT doc_id, {_SPAN_W} AS w FROM documents),
        adj AS (
            SELECT least(w[i], w[i+1]) AS a, greatest(w[i], w[i+1]) AS b
            FROM t, unnest(range(1, len(w))) AS u(i)
            WHERE len(w) >= 2 AND w[i] <> w[i+1]
        ),
        und AS (SELECT a, b, COUNT(*) AS w FROM adj GROUP BY a, b),
        edges0 AS (
            SELECT a AS src, b AS dst, w FROM und
            UNION ALL
            SELECT b AS src, a AS dst, w FROM und
        ),
        deg AS (SELECT src, SUM(w) AS wdeg FROM edges0 GROUP BY src),
        edges AS (SELECT e.src, e.dst, e.w, d.wdeg
                  FROM edges0 e JOIN deg d USING (src)),
        nodes AS (SELECT DISTINCT src AS node FROM edges0),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        r0 AS (SELECT node, CAST({_TR_SCALE} // (SELECT n FROM nn)
                            AS BIGINT) AS rank FROM nodes)
    """
    iters = "".join(f""",
        r{i} AS (
            SELECT e.dst AS node,
                   CAST((3 * {_TR_SCALE}) // (20 * (SELECT n FROM nn))
                        + (17 * SUM((r.rank * e.w) // e.wdeg)) // 20
                        AS BIGINT) AS rank
            FROM edges e JOIN r{i - 1} r ON r.node = e.src
            GROUP BY e.dst
        )""" for i in range(1, _TR_ITERS + 1))
    return (f"WITH {head}{iters} "
            f"SELECT node AS token, rank AS rank_fp FROM r{_TR_ITERS} "
            f"ORDER BY rank_fp DESC, token LIMIT 15")


@register(
    "textrank_keywords_docs",
    oracle=_textrank_oracle(),
    tags=("pipeline", "text", "graph"),
    description="TextRank keyword extraction (Mihalcea & Tarau 2004): "
                f"PageRank (d=0.85, {_TR_ITERS} iterations) over the "
                "corpus token co-occurrence graph (undirected adjacent-"
                "pair edges, co-occurrence-count weights), run in FIXED-"
                "POINT integer arithmetic (scale 10^12, damping as the "
                "exact rationals 17/20 + 3/20, per-edge integer floor "
                "division) so every iteration is bit-exact across "
                "engines where float PageRank would drift through order-"
                "dependent double sums. Top 15 tokens by final rank — "
                "the iterative-graph-algorithm surface beyond the "
                "recursive-CTE family, fully oracled via generated "
                "unrolled-iteration SQL",
)
def textrank_keywords_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the corpus pass (adjacent-pair explode + count
    aggregate) is the only data-sized stage and it is one gram-keyed
    shuffle; everything after runs on the VOCABULARY graph, which is
    bounded by token diversity, not corpus size — at 100 TB the
    iterations cost the same as at 100 MB. Each unrolled iteration is
    the canonical distributed PageRank step (ranks join edges on src,
    integer contributions aggregate by dst); the whole run is ONE
    declarative Catalyst plan, no driver loop state, no actions at
    plan-construction time. Spark arrays index from 0 (DuckDB lists
    from 1) — both sides pair positions (i, i+1) over the same range.

    Reference anchor: iterates the reference's Map -> Shuffle -> Reduce
    contract (asio_deep/main.cpp:216-516) to a fixpoint, the step its
    single-pass pipeline cannot express.

    Fixture-scale wall-clock (~3.5s at sf0.1, the registry's slowest)
    is stage-SCHEDULING-bound — ~30 tiny shuffles across 6 unrolled
    iterations over a 31-node graph — not data-bound: the corpus-sized
    work is one adjacent-pair aggregate (~0.3s alone). At production
    scale the same plan amortizes: iteration cost stays
    vocabulary-sized while the corpus pass grows, so the overhead
    ratio inverts.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        words("text").alias("w")
    ).filter(F.size("w") >= 2)
    pairs = docs.select(F.explode(F.expr(
        "transform(sequence(0, size(w) - 2), "
        "i -> struct(least(w[i], w[i+1]) AS a, "
        "greatest(w[i], w[i+1]) AS b))"
    )).alias("p")).select("p.a", "p.b").filter(F.col("a") != F.col("b"))
    und = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("w"))
    # undirect by exploding each aggregated pair into its two directed
    # rows instead of unioning two projections of `und` (round-15,
    # guide §2.4 duplicated subtrees): the union form plans the whole
    # corpus-pass aggregate subtree TWICE (AQE stage reuse recovers the
    # exchange at runtime, but every iteration's plan still carries
    # both branches through 6 unrolled joins — 1.84 -> 1.53 s at sf0.1
    # measured, identical rows; the oracle keeps the UNION ALL spelling)
    edges0 = und.select(F.explode(F.array(
        F.struct(F.col("a").alias("src"), F.col("b").alias("dst"),
                 F.col("w")),
        F.struct(F.col("b").alias("src"), F.col("a").alias("dst"),
                 F.col("w")),
    )).alias("e")).select("e.src", "e.dst", "e.w")
    deg = edges0.groupBy("src").agg(F.sum("w").alias("wdeg"))
    edges = edges0.join(deg, "src")
    nodes = edges0.select(F.col("src").alias("node")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr(f"CAST({_TR_SCALE} div n AS BIGINT)").alias("rank")
    )
    for _ in range(_TR_ITERS):
        contrib = edges.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select("dst", F.expr("(rank * w) div wdeg").alias("c"))
        ranks = (
            contrib.groupBy("dst").agg(F.sum("c").alias("s"))
            .crossJoin(F.broadcast(nn))
            .select(
                F.col("dst").alias("node"),
                F.expr(f"CAST((3 * {_TR_SCALE}) div (20 * n) "
                       f"+ (17 * s) div 20 AS BIGINT)").alias("rank"),
            )
        )
    return (
        ranks.orderBy(F.desc("rank"), "node").limit(15)
        .select(F.col("node").alias("token"), F.col("rank").alias("rank_fp"))
    )

#: gram order for span anchoring. 4 measured non-degenerate at every
#: fixture SF (sf0.01: 1,542 duplicated positions across 233 docs;
#: 3 floods — 9,907 positions — and 5 collapses onto the ~30 exact-dup
#: docs). Production pipelines anchor on 40-60-token grams; the plan
#: shape is n-independent.
_SPAN_N = 4


@register(
    "exact_span_dedup_docs",
    oracle=f"""
        WITH t AS (SELECT doc_id, {_SPAN_W} AS w FROM documents),
        pos AS (
            SELECT doc_id, CAST(i AS BIGINT) AS pos,
                   array_to_string(list_slice(w, i, i + {_SPAN_N - 1}), ' ')
                       AS gram
            FROM t, unnest(range(1, len(w) - {_SPAN_N} + 2)) AS u(i)
            WHERE len(w) >= {_SPAN_N}
        ),
        own AS (
            SELECT gram, MIN(doc_id) AS owner FROM pos GROUP BY gram
        ),
        dup AS (
            SELECT pos.doc_id, pos.pos, pos.pos + {_SPAN_N - 1} AS e
            FROM pos JOIN own USING (gram)
            WHERE pos.doc_id <> own.owner
        ),
        flg AS (
            SELECT doc_id, pos, e,
                   CASE WHEN pos > COALESCE(MAX(e) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), -2) + 1 THEN 1 ELSE 0 END AS new_span
            FROM dup
        ),
        sp AS (
            SELECT doc_id, pos, e,
                   SUM(new_span) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS span_id
            FROM flg
        )
        SELECT doc_id, MIN(pos) AS span_start, MAX(e) AS span_end,
               MAX(e) - MIN(pos) + 1 AS span_tokens
        FROM sp GROUP BY doc_id, span_id
    """,
    tags=("pipeline", "text", "dedup"),
    description="cross-document exact-substring dedup (Lee et al. 2022 "
                "'Deduplicating Training Data Makes Language Models "
                "Better', arXiv:2107.06499, at gram granularity): every "
                f"{_SPAN_N}-token gram occurring in >= 2 distinct docs "
                "keeps its occurrences only in the min-doc_id owner; all "
                "other occurrences are REMOVAL intervals, merged per doc "
                "into maximal token spans (gaps-and-islands over a "
                "running max-end window). Output is one row per maximal "
                "duplicated span (doc_id, span_start, span_end, "
                "span_tokens) — the positional complement of "
                "dup_ngram_fraction_docs' per-doc fraction, and the "
                "input a span-trimming rewrite pass consumes",
)
def exact_span_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: ONE gram-keyed shuffle (round-15): ownership is
    ``min(doc_id) OVER (PARTITION BY gram)`` computed in place on the
    position stream, replacing the old owner-aggregate + join-back —
    which exchanged the positions by gram anyway PLUS a second
    exchange for the owner table and a sort-merge join between them
    (measured 1.7 -> 0.9 s at sf0.1, identical rows; the oracle keeps
    the aggregate+join spelling). Trade recorded: a window partition
    key cannot be skew-split by AQE the way the SMJ's probe side could,
    so one task sorts df(gram)·positions rows for the hottest gram —
    bounded by max document frequency, the same df-shaped bound the
    SimHash banding tier documents, and a spilling sort rather than an
    OOM if a boilerplate gram goes hot. Then the interval merge is one
    doc_id-partitioned window over ONLY the duplicated positions
    (sf0.01: 1.5k rows from 31k gram positions) — islands via running
    MAX(end) over preceding rows, so overlapping AND adjacent removal
    intervals fuse into maximal spans. Nothing is all-pairs; the
    suffix-array machinery of the paper collapses to hash-partitioned
    window arithmetic because gram anchoring fixes the match length.

    Reference anchor: Map (gram positions) -> Shuffle (gram key) ->
    Reduce (ownership + merge), asio_deep/main.cpp:216-516 generalized.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", words("text").alias("w")
    ).filter(F.size("w") >= _SPAN_N)
    # one-pass zip_with gram construction (functions.text.ngrams_join);
    # posexplode supplies the 0-based position, +1 restores the 1-based
    # pos the struct/sequence form carried — same (doc_id, pos, gram)
    # rows, without building a struct per gram position
    pos = docs.select(
        "doc_id", F.posexplode(ngrams_join(F.col("w"), _SPAN_N)).alias("p", "gram")
    ).select("doc_id", (F.col("p") + 1).cast("long").alias("pos"), "gram")
    # "this doc is not the gram's min-doc_id owner" already implies the
    # gram spans >= 2 distinct docs — no COUNT(DISTINCT) expansion needed
    owner = F.min("doc_id").over(Window.partitionBy("gram"))
    dup = (
        pos.withColumn("owner", owner)
        .filter(F.col("doc_id") != F.col("owner"))
        .select("doc_id", "pos", (F.col("pos") + _SPAN_N - 1).alias("e"))
    )
    prev_end = F.max("e").over(
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.withColumn(
        "new_span",
        F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-2)) + 1, 1)
        .otherwise(0),
    )
    span_id = F.sum("new_span").over(
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.withColumn("span_id", span_id)
        .groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("e").alias("span_end"),
            (F.max("e") - F.min("pos") + 1).alias("span_tokens"),
        )
        .drop("span_id")
    )


#: fixed-point k-means knobs. Quantizing each coordinate to
#: floor((x + 1) * 10^6) makes every distance, sum, and floor-division
#: centroid update exact integer arithmetic — bit-identical across
#: engines regardless of summation order, where float Lloyd would drift
#: through order-dependent double accumulation. The +1 offset keeps all
#: quantized coordinates positive (fixture range is (-0.53, 0.46)), so
#: Spark's `div` and DuckDB's `//` (both truncate toward zero) can never
#: disagree on a negative centroid sum.
_KM_K = 8
_KM_ITERS = 3
_KM_SCALE = 10 ** 6


def _kmeans_oracle() -> str:
    """Unrolled-iteration DuckDB twin of the seeded fixed-point Lloyd
    run: one assignment CTE + one update CTE per iteration, generated
    from the same constants as the Spark plan so the two can never
    disagree on K, the iteration count, or the quantization."""
    head = f"""
        e AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(FLOOR((x + 1.0) * {_KM_SCALE}) AS BIGINT))
                       AS q
            FROM embeddings
        ),
        c0 AS (
            SELECT k, q AS c FROM (
                SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1
                            AS BIGINT) AS k, q
                FROM e
            ) WHERE k < {_KM_K}
        )
    """
    dist2 = ("CAST(list_sum(list_transform(range(1, {dim} + 1), "
             "i -> (e.q[i] - c.c[i]) * (e.q[i] - c.c[i]))) AS BIGINT)"
             ).format(dim=_DIM)
    step = """,
        a{i} AS (
            SELECT vec_id, q, k, dist2 FROM (
                SELECT vec_id, q, k, dist2,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY dist2, k) AS rn
                FROM (SELECT e.vec_id, e.q, c.k, {dist2} AS dist2
                      FROM e CROSS JOIN c{prev} c)
            ) WHERE rn = 1
        ),
        u{i} AS (
            SELECT k, u.d AS d,
                   CAST(SUM(q[u.d]) // COUNT(*) AS BIGINT) AS cd
            FROM a{i}, unnest(range(1, {dim} + 1)) AS u(d)
            GROUP BY k, u.d
        ),
        c{i} AS (
            SELECT c{prev}.k, COALESCE(n.c, c{prev}.c) AS c
            FROM c{prev} LEFT JOIN (
                SELECT k, list(cd ORDER BY d) AS c FROM u{i} GROUP BY k
            ) n USING (k)
        )"""
    iters = "".join(
        step.format(i=i, prev=i - 1, dist2=dist2, dim=_DIM)
        for i in range(1, _KM_ITERS + 1)
    )
    return f"""
        WITH {head}{iters}
        SELECT vec_id, k AS cluster, dist2 FROM (
            SELECT e.vec_id, c.k, {dist2} AS dist2,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {dist2}, c.k) AS rn
            FROM e CROSS JOIN c{_KM_ITERS} c
        ) WHERE rn = 1
    """


@register(
    "kmeans_fixedpoint_embeddings",
    oracle=_kmeans_oracle(),
    tags=("similarity", "pipeline", "clustering"),
    description=f"seeded fixed-point Lloyd k-means (K={_KM_K}, "
                f"{_KM_ITERS} iterations) over the embeddings table: "
                f"coordinates quantized to floor((x+1)*10^{6}) BIGINTs, "
                "centroids seeded from the K smallest vec_ids, integer "
                "squared-L2 assignment (ties to the lowest cluster id), "
                "truncating-integer-division centroid updates (toward "
                "zero; equals floor on the non-negative quantized "
                "domain), empty clusters "
                "keep their previous centroid. Output is the final "
                "(vec_id, cluster, dist2) assignment. The ORACLED twin "
                "of the iterative-training surface that "
                "similarity_ivf_topk's unseeded Lloyd leaves rows-only: "
                "fixed-point arithmetic makes every iteration bit-exact "
                "across engines, so the full training loop hash-matches "
                "a generated unrolled-iteration DuckDB oracle",
)
def kmeans_fixedpoint_embeddings(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Scale shape per iteration: assignment is a map-only pass — the K
    centroids collapse to ONE broadcast row (array of K structs) and
    the argmin is a per-row JVM expression (array_sort over K computed
    struct(dist2, k), no shuffle, no |corpus| x K row blowup); the
    update is one (k, dim)-keyed hash aggregate (map-side combine,
    K x 64 result rows) plus a K-row rebuild. So T iterations cost T
    corpus scans + T tiny shuffles — the canonical distributed Lloyd —
    and the whole run is ONE declarative Catalyst plan with no actions
    or driver loop state at plan-construction time. The only
    BroadcastNestedLoopJoin is the 1-row centroid-array side (the same
    bounded-broadcast contract as the decontam exact tier, PLANS.md).

    Reference anchor: like textrank_keywords_docs, iterates the
    reference's single-pass Map -> Shuffle -> Reduce contract
    (asio_deep/main.cpp:216-516) to a fixpoint — here the fixpoint of
    cluster centroids rather than graph rank.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            as_double("embedding"),
            lambda x: F.floor((x + F.lit(1.0)) * _KM_SCALE).cast("bigint"),
        ).alias("q"),
    )
    return kmeans_fixedpoint(
        emb, k=_KM_K, iters=_KM_ITERS, id_col="vec_id", vec_col="q"
    )


@register(
    "semantic_decontam_lsh_amplified",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        bench AS (SELECT * FROM e WHERE vec_id % {_DECON_MOD} = 0
                  AND vec_id < {_DECON_MOD * _DECON_MAXB}),
        corpus AS (SELECT * FROM e
                   WHERE vec_id % {_DECON_MOD} <> 0
                      OR vec_id >= {_DECON_MOD * _DECON_MAXB}),
        cb AS ({_AMP_CORPUS_SQL}),
        bb0 AS ({_AMP_BENCH_SQL}),
        bb AS ({_AMP_PROBE_SQL}),
        sims AS (
            SELECT cb.vec_id, bb.bench_id,
                   list_cosine_similarity(cb.v, bb.bv) AS cos
            FROM cb LEFT JOIN bb ON cb.bucket = bb.bucket
        ),
        r AS (
            SELECT vec_id, bench_id, cos,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id ORDER BY cos DESC, bench_id
                   ) AS rn
            FROM sims
        )
        SELECT vec_id, bench_id AS nearest_bench_id, cos AS max_cos,
               COALESCE(cos >= {_DECON_TAU}, FALSE) AS contaminated
        FROM r WHERE rn = 1
    """,
    tags=("similarity", "pipeline", "dedup", "lsh"),
    description="semantic decontamination, OR-amplified LSH "
                f"({_DLSH_TABLES} independent seeded plane tables, "
                "union-routed on a combined t*2^p+bucket key): the "
                "recall dial for the unbounded-benchmark path — flag "
                "recall rises ~1-(1-r)^t (measured 0.38 -> 0.87 at t=4 "
                "on the adversarial near-uniform fixture, "
                "tests/test_similarity.py) at ~t x probe cost, with "
                "ONLY the tiny bench side fanning out (t x (1+p) band "
                "rows) and the plan still exactly one BroadcastHashJoin "
                "+ one map-side argmax (plan-pinned). Fully oracled: "
                "every table's seeded plane literals bake into the SQL",
)
def semantic_decontam_lsh_amplified(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    bench = emb.filter(
        (F.col("vec_id") % _DECON_MOD == 0)
        & (F.col("vec_id") < _DECON_MOD * _DECON_MAXB)
    ).select(F.col("vec_id").alias("bench_id"), F.col("v").alias("bv"))
    corpus = emb.filter(
        (F.col("vec_id") % _DECON_MOD != 0)
        | (F.col("vec_id") >= _DECON_MOD * _DECON_MAXB)
    )
    return decontam_max_cosine(
        corpus, bench, tau=_DECON_TAU,
        n_planes=_DLSH_PLANES, dim=_DIM, multiprobe=True,
        n_tables=_DLSH_TABLES,
    )
