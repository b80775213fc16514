"""Sampling properties: determinism, subset-ness, size bounds, split
disjointness/exhaustiveness, stratified rate targeting."""

from __future__ import annotations

import math

from mapreduce_4_spark.operators.sampling import (
    hash_threshold,
    sample_by_hash,
    sample_stratified,
    sample_stratified_by_hash,
    sample_uniform,
    train_test_split,
)
from mapreduce_4_spark.sources import load_table


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_sample_deterministic_and_subset(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id")
    s1, s2 = sample_uniform(docs, 0.2), sample_uniform(docs, 0.2)
    assert _ids(s1) == _ids(s2), "same seed must give the same sample"
    assert _ids(s1) <= _ids(docs)
    assert _ids(sample_uniform(docs, 0.2, seed=7)) != _ids(s1), \
        "different seed should give a different sample"


def test_sample_size_within_binomial_bounds(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id")
    n = docs.count()
    k = sample_uniform(docs, 0.2).count()
    mean, sd = 0.2 * n, math.sqrt(n * 0.2 * 0.8)
    assert abs(k - mean) <= 5 * sd, (k, mean, sd)


def test_train_test_split_partitions(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id")
    train, test = train_test_split(docs, test_fraction=0.1)
    tr, te = _ids(train), _ids(test)
    assert tr.isdisjoint(te)
    assert tr | te == _ids(docs)
    assert 0 < len(te) < len(tr)


def test_hash_sample_partition_independent(spark, sf_smoke):
    """The content-keyed sampler keeps the SAME rows regardless of
    partition layout — the property the seeded Bernoulli sampler lacks."""
    docs = load_table(spark, sf_smoke, "documents").select("doc_id")
    base = _ids(sample_by_hash(docs, 0.2, key_col="doc_id"))
    reparted = _ids(sample_by_hash(docs.repartition(7), 0.2, key_col="doc_id"))
    assert base == reparted
    assert base <= _ids(docs)
    # different salt -> different (but similarly sized) sample
    other = _ids(sample_by_hash(docs, 0.2, key_col="doc_id", salt="7"))
    assert other != base


def test_hash_sample_size_within_binomial_bounds(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id")
    n = docs.count()
    k = sample_by_hash(docs, 0.2, key_col="doc_id").count()
    mean, sd = 0.2 * n, math.sqrt(n * 0.2 * 0.8)
    assert abs(k - mean) <= 5 * sd, (k, mean, sd)


def test_hash_threshold_edges():
    assert hash_threshold(0.0) == "00000000"
    assert hash_threshold(1.0) == "zzzzzzzz"
    assert hash_threshold(0.2) == "33333333"
    assert hash_threshold(0.5) == "80000000"


def test_hash_stratified_rates_and_missing_stratum_dropped(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "lang")
    fractions = {"en": 0.25, "fr": 1.0}
    out = sample_stratified_by_hash(docs, "lang", fractions, key_col="doc_id")
    totals = dict(docs.groupBy("lang").count().collect())
    kept = dict(out.groupBy("lang").count().collect())
    assert kept.get("fr", 0) == totals.get("fr", 0)
    for lang in totals:
        if lang not in fractions:
            assert lang not in kept, f"stratum {lang} should be dropped"
    n, k = totals.get("en", 0), kept.get("en", 0)
    if n:
        sd = math.sqrt(n * 0.25 * 0.75)
        assert abs(k - 0.25 * n) <= 5 * sd


def test_stratified_rates(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "lang")
    fractions = {"en": 0.25, "de": 0.5, "es": 0.5, "fr": 1.0, "zh": 1.0}
    out = sample_stratified(docs, "lang", fractions)
    totals = dict(docs.groupBy("lang").count().collect())
    kept = dict(out.groupBy("lang").count().collect())
    for lang, frac in fractions.items():
        n, k = totals.get(lang, 0), kept.get(lang, 0)
        if n == 0:
            continue
        if frac == 1.0:
            assert k == n, (lang, k, n)
        else:
            sd = math.sqrt(n * frac * (1 - frac))
            assert abs(k - frac * n) <= 5 * sd, (lang, k, frac * n, sd)


def test_rebalance_mixture_hits_target_weights(spark, sf_smoke):
    """Kept counts must track the target mixture: the binding stratum
    keeps everything, every other stratum lands within binomial noise of
    weight * feasible_total."""
    from mapreduce_4_spark.operators.sampling import rebalance_mixture

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "lang")
    weights = {"en": 0.3, "de": 0.2, "es": 0.2, "fr": 0.15, "zh": 0.15}
    out = rebalance_mixture(docs, "lang", weights, key_col="doc_id")
    totals = dict(docs.groupBy("lang").count().collect())
    kept = dict(out.groupBy("lang").count().collect())
    k_feasible = min(totals[s] / w for s, w in weights.items())
    binding = min(weights, key=lambda s: totals[s] / weights[s])
    assert kept[binding] == totals[binding], "binding stratum keeps all"
    for s, w in weights.items():
        target = w * k_feasible
        rate = target / totals[s]
        sd = math.sqrt(totals[s] * rate * (1 - rate)) if rate < 1 else 0.0
        assert abs(kept.get(s, 0) - target) <= 5 * sd + 1, (s, kept.get(s), target)
    # partition independence (content-keyed selection)
    kept_ids = {r["doc_id"] for r in out.collect()}
    re_ids = {
        r["doc_id"]
        for r in rebalance_mixture(
            docs.repartition(13), "lang", weights, key_col="doc_id"
        ).collect()
    }
    assert kept_ids == re_ids


def test_decontaminate_flags_exact_duplicate(spark):
    from mapreduce_4_spark.operators.text_analysis import decontaminate

    evalset = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # verbatim dup
            (2, "totally unrelated words in this row"),   # clean
            (3, "prefix alpha beta gamma suffix words"),  # one shared 3-gram
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_shared_grams"], r["contaminated"])
        for r in decontaminate(train, evalset, n=3, min_shared=3).collect()
    }
    assert got[1] == (4, True)
    assert got[2] == (0, False)
    assert got[3][0] == 1 and not got[3][1]


def test_shard_assignment_is_partition_invariant_permutation(spark, sf_oracle):
    """Every doc lands in exactly one shard with a contiguous 1..n_s
    position sequence, and the assignment is identical under a different
    input partitioning (content-keyed, not partition-keyed)."""
    from mapreduce_4_spark.plans.llm_pipeline4 import (
        _N_SHARDS,
        shard_assignment_docs,
    )
    from mapreduce_4_spark.sources import load_table

    out = shard_assignment_docs(spark, sf_oracle)
    rows = out.collect()
    n_docs = load_table(spark, sf_oracle, "documents").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r["shard"] < _N_SHARDS
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard

    # partition-independence: same assignment from a reshuffled input
    again = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shard_assignment_docs(spark, sf_oracle)
        .repartition(7).collect()
    }
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}


def test_dup_ngram_fraction_bounds_and_planted_boilerplate(spark):
    """Fractions live in [0, 1]; a planted template span shared by two
    docs is flagged in both, while their unique spans are not."""
    from mapreduce_4_spark.plans.llm_pipeline4 import dup_ngram_fraction_docs
    import tempfile

    docs = spark.createDataFrame(
        [
            (1, "copyright header template aa bb cc"),
            (2, "copyright header template dd ee ff"),
            (3, "entirely original words here now one"),
        ],
        ["doc_id", "text"],
    )
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(f"{td}/documents.parquet")
        got = {
            r["doc_id"]: r for r in dup_ngram_fraction_docs(spark, td).collect()
        }
    # 4 gram positions per 6-word doc; docs 1 and 2 share only
    # 'copyright header template' (1 of 4 positions)
    assert got[1]["n_grams"] == 4 and got[1]["n_dup_grams"] == 1
    assert got[2]["n_dup_grams"] == 1
    assert got[3]["n_dup_grams"] == 0
    for r in got.values():
        assert 0.0 <= r["dup_fraction"] <= 1.0
        assert r["n_dup_grams"] <= r["n_grams"]


def test_temperature_resample_smallest_stratum_keeps_all(spark):
    """alpha=1/2 tempering: the smallest stratum's rate is exactly 1.0
    (every row kept); larger strata keep ~sqrt(min/tot) of their rows;
    and the kept set is independent of partitioning."""
    from pyspark.sql import functions as F

    from mapreduce_4_spark.operators.sampling import temperature_resample

    rows = [("small", i, 1) for i in range(50)] + [
        ("big", 1000 + i, 1) for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "src string, k long, w long")
    kept = temperature_resample(df, "src", "w", key_col="k")
    by = {r["src"]: r["n"] for r in
          kept.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by["small"] == 50  # rate 1.0, all kept
    # big stratum: rate = sqrt(50/5000) = 0.1 -> ~500 of 5000 (md5 noise)
    assert 350 <= by["big"] <= 650
    # partition-independence: same kept keys after a repartition
    k1 = sorted(r["k"] for r in kept.collect())
    k2 = sorted(
        r["k"] for r in temperature_resample(
            df.repartition(13, "k"), "src", "w", key_col="k"
        ).collect()
    )
    assert k1 == k2


def test_temperature_resample_zero_weight_stratum_does_not_empty_output(spark):
    """A stratum with zero total weight (all docs tokenize empty) keeps
    nothing, but must NOT drag min_tot to 0 and silently zero every
    other stratum's rate."""
    from mapreduce_4_spark.operators.sampling import temperature_resample

    rows = (
        [("empty", i, 0) for i in range(10)]
        + [("small", 100 + i, 1) for i in range(50)]
        + [("big", 1000 + i, 1) for i in range(5000)]
    )
    df = spark.createDataFrame(rows, "src string, k long, w long")
    kept = temperature_resample(df, "src", "w", key_col="k")
    from pyspark.sql import functions as F

    by = {r["src"]: r["n"] for r in
          kept.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "empty" not in by          # contributes no tokens -> dropped
    assert by["small"] == 50          # still the binding stratum, rate 1.0
    assert 350 <= by.get("big", 0) <= 650
