"""The correctness gate, replayed locally: every registered query with an
oracle must hash-match DuckDB at the driver's scale factor (sf0.01)."""

from __future__ import annotations

import pytest

from mapreduce_4_spark.plans import REGISTRY

from .oracle import compare

_WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
_ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, sf_oracle, name):
    spec = REGISTRY[name]
    compare(spec.builder(spark, sf_oracle), spec.oracle, sf_oracle)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_oracle, name):
    spec = REGISTRY[name]
    df = spec.builder(spark, sf_oracle)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_collection_columns_in_final_projection(spark, sf_oracle, name):
    """Registry convention: the external driver canonicalizes results with
    pandas sort_values, which cannot hash list/dict cells — so every
    registered query must serialize array/map/struct outputs at the
    boundary (concat_ws / to_json). Array-returning APIs stay in
    operators/ for library use."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = REGISTRY[name].builder(spark, sf_oracle)
    offenders = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not offenders, (
        f"{name} emits collection-typed final columns {offenders}; "
        "serialize at the registry boundary"
    )


#: sf0.1 spot check: bit-exactness must not be an artifact of the tiny
#: oracle fixture. Ten heavy/representative queries whose DuckDB oracle
#: also scales to sf0.1 replay there (the all-pairs-oracle dedup tiers
#: are excluded — their oracles are deliberately quadratic).
_SF01_SPOT = [
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "agg_orders_stats",
    "dup_ngram_fraction_docs",
    "winnow_fingerprints_docs",
    "block_dedup_docs",
    "source_token_drift",
    "events_resample_hourly",
    "heavy_hitter_words",
    "exact_percentiles_orders",
]


@pytest.mark.parametrize("name", _SF01_SPOT)
def test_oracle_parity_sf01_spot(spark, name):
    import os

    sf01 = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(sf01):
        pytest.skip("sf0.1 fixture not present")
    spec = REGISTRY[name]
    compare(spec.builder(spark, sf01), spec.oracle, sf01)
