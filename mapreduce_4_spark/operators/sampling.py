"""Sampling operators — the selection stage of a training-data pipeline
(uniform corpus sampling, per-class stratification, train/test splits).

All seeded and partition-deterministic: same data + same seed => same
sample, which is what makes experiment lineage reproducible. Sampling is
embarrassingly parallel — a per-row Bernoulli/partition split, no
shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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
