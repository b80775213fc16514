"""Sampling operators — the selection stage of a training-data pipeline
(uniform corpus sampling, per-class stratification, train/test splits).

Two tiers:

- ``sample_uniform`` / ``sample_stratified`` / ``train_test_split``:
  Spark's seeded Bernoulli samplers. Deterministic for a fixed partition
  layout, but the sample CHANGES if the data is repartitioned — fine for
  rate control, wrong for lineage.
- ``sample_by_hash`` / ``sample_stratified_by_hash``: content-keyed
  (md5-threshold on a key column). The same row is in or out regardless
  of partitioning, engine, or cluster size — the reproducible-lineage
  sampler a 100 TB training pipeline needs, and expressible in ANSI SQL
  so it oracle-checks bit-for-bit.

All variants are embarrassingly parallel — a per-row predicate, no
shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_threshold(fraction: float) -> str:
    """8-hex-digit threshold such that P[md5_prefix < threshold] ~= fraction.

    Lowercase-hex string comparison on a fixed width is numeric
    comparison, identically in Spark and any ANSI engine ('z' sorts
    after every hex digit, so it means 'keep all')."""
    if fraction >= 1.0:
        return "zzzzzzzz"
    if fraction <= 0.0:
        return "00000000"
    return format(int(fraction * 16**8), "08x")


def _hash_bucket(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, 8)


def sample_by_hash(df: DataFrame, fraction: float, key_col: str,
                   salt: str = "42") -> DataFrame:
    """Content-keyed Bernoulli: keep rows whose md5(key:salt) prefix falls
    below the fraction threshold. Same key + salt => same decision,
    everywhere, forever."""
    return df.filter(
        _hash_bucket(F.col(key_col), salt) < F.lit(hash_threshold(fraction))
    )


def sample_stratified_by_hash(df: DataFrame, strata_col: str, fractions: dict,
                              key_col: str, salt: str = "42") -> DataFrame:
    """Per-stratum content-keyed rates; strata absent from ``fractions``
    are dropped (sampleBy semantics)."""
    threshold = F.coalesce(
        *[
            F.when(F.col(strata_col) == k, F.lit(hash_threshold(v)))
            for k, v in fractions.items()
        ]
    )
    return df.filter(_hash_bucket(F.col(key_col), salt) < threshold)


def rebalance_mixture(df: DataFrame, strata_col: str, weights: dict,
                      key_col: str, salt: str = "42") -> DataFrame:
    """Downsample strata to hit TARGET MIXTURE WEIGHTS — the data-mixing
    stage of a training pipeline ("30% en, 20% de, ..."), keeping as much
    data as the most-underrepresented stratum allows.

    Feasible kept total K = min_s(count_s / w_s); stratum rate
    r_s = w_s * K / count_s (the binding stratum keeps everything,
    rate 1.0). Selection is content-keyed (md5 threshold), so the kept
    set is partition-independent and engine-portable; rates derive from
    exact counts, so the whole computation is deterministic. Strata
    absent from ``weights`` are dropped. Two tiny aggregates (per-stratum
    counts + a one-row min) broadcast back onto the scan — no extra
    shuffle of the data itself at any scale."""
    weight = F.coalesce(
        *[
            F.when(F.col(strata_col) == k, F.lit(float(v)))
            for k, v in weights.items()
        ]
    )
    counts = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_w", weight)
        .filter(F.col("_w").isNotNull())
    )
    k_total = counts.agg(F.min(F.col("_n") / F.col("_w")).alias("_k"))
    rates = (
        counts.join(F.broadcast(k_total))
        .select(
            F.col(strata_col).alias("_stratum"),
            (F.col("_w") * F.col("_k") / F.col("_n")).alias("_rate"),
        )
    )
    threshold = F.when(F.col("_rate") >= 1.0, F.lit("zzzzzzzz")).otherwise(
        F.format_string(
            "%08x", F.floor(F.col("_rate") * F.lit(float(16**8))).cast("long")
        )
    )
    return (
        df.join(F.broadcast(rates), df[strata_col] == F.col("_stratum"))
        .filter(_hash_bucket(F.col(key_col), salt) < threshold)
        .drop("_stratum", "_rate")
    )


#: 90/5/5 split boundaries as hex images of 0.90 and 0.95 of the 32-bit
#: md5-prefix space — shared by the Spark expression and the oracle SQL
#: builders below so the two can never drift.
SPLIT_BOUNDS = (("train", "e6666666"), ("val", "f3333333"), ("test", None))


def split_assignment(key: Column, salt: str = "42") -> Column:
    """Deterministic train/val/test label from content-keyed md5
    buckets — the lineage-stable alternative to randomSplit (whose
    assignment changes with partitioning). A row never migrates between
    splits as the corpus grows."""
    h = _hash_bucket(key, salt)
    expr = None
    for name, bound in SPLIT_BOUNDS:
        if bound is None:
            expr = expr.otherwise(F.lit(name))
        elif expr is None:
            expr = F.when(h < bound, F.lit(name))
        else:
            expr = expr.when(h < bound, F.lit(name))
    return expr


def sql_split_assignment(key_expr: str, salt: str = "42") -> str:
    """DuckDB twin of :func:`split_assignment` (identical buckets)."""
    h = f"substring(md5(CAST({key_expr} AS VARCHAR) || ':{salt}'), 1, 8)"
    parts = []
    for name, bound in SPLIT_BOUNDS:
        if bound is None:
            parts.append(f"ELSE '{name}'")
        else:
            parts.append(f"WHEN {h} < '{bound}' THEN '{name}'")
    return "CASE " + " ".join(parts) + " END"


def temperature_resample(df: DataFrame, strata_col: str, weight_col: str,
                         key_col: str, salt: str = "42") -> DataFrame:
    """Temperature-based mixture resampling (the multilingual-corpus
    move popularized by mBERT/mC4: sample stratum s with probability
    ∝ size_s^α, α<1, so huge strata are tempered and small ones
    surface). Fixed at α=1/2, which makes the per-stratum keep rate

        rate_s = sqrt(min_tot / tot_s)       (smallest stratum keeps all)

    where tot_s = Σ weight_col over the stratum (tokens, not docs, so a
    stratum of few huge documents is tempered like one of many small
    ones). α=1/2 is deliberate: integer totals, one correctly-rounded
    IEEE division and one correctly-rounded sqrt are bit-identical in
    every engine, so the kept set oracle-checks exactly — a free-form
    pow(x, α) would be library-dependent in the last ulp. Selection is
    the same content-keyed md5 threshold as every sampler here:
    partition-independent, engine-portable, replayable.

    Scale: two tiny aggregates (per-stratum totals + a one-row min)
    broadcast back onto the scan; the data itself never shuffles.

    A stratum with ZERO total weight (e.g. a source whose documents all
    tokenize empty) is excluded from both the min and the rate table:
    it keeps nothing (it contributes no tokens to the mixture), and —
    critically — it must not drag min_tot to 0, which would silently
    zero every other stratum's rate and empty the whole output."""
    totals = (
        df.groupBy(strata_col)
        .agg(F.sum(weight_col).alias("_tot"))
        .filter(F.col("_tot") > 0)
    )
    mn = totals.agg(F.min("_tot").alias("_mn"))
    rates = totals.join(F.broadcast(mn)).select(
        F.col(strata_col).alias("_stratum"),
        F.sqrt(F.col("_mn") / F.col("_tot")).alias("_rate"),
    )
    threshold = F.when(F.col("_rate") >= 1.0, F.lit("zzzzzzzz")).otherwise(
        F.format_string(
            "%08x", F.floor(F.col("_rate") * F.lit(float(16**8))).cast("long")
        )
    )
    return (
        df.join(F.broadcast(rates), df[strata_col] == F.col("_stratum"))
        .filter(_hash_bucket(F.col(key_col), salt) < threshold)
        .drop("_stratum", "_rate")
    )


def sample_uniform(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def sample_stratified(df: DataFrame, strata_col: str,
                      fractions: dict, seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli rates, e.g. downsample a dominant language
    while keeping the tail: {"en": 0.1, "de": 1.0}."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def train_test_split(df: DataFrame, test_fraction: float = 0.1,
                     seed: int = 42) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive split (randomSplit normalizes weights)."""
    train, test = df.randomSplit([1.0 - test_fraction, test_fraction], seed=seed)
    return train, test
