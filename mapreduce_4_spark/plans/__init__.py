"""Registered query plans. Importing this package populates the registry."""

from mapreduce_4_spark.registry import REGISTRY, oracle_sql, queries, rows_only

from . import (  # noqa: F401
    advanced_rel,
    aggregates,
    dedup,
    events_time,
    similarity,
    grouping,
    joins,
    llm_pipeline2,
    llm_pipeline3,
    llm_pipeline4,
    llm_pipeline5,
    llm_pipeline6,
    llm_pipeline7,
    llm_pipeline8,
    maintenance,
    multimodal,
    pipeline_ops,
    quantization,
    relational,
    retrieval,
    scalars,
    scalars2,
    semistructured,
    setops,
    sort_topk,
    spark4_surface,
    statistics,
    temporal_joins,
    tpch_like,
    tpch_like2,
    tpch_partsupp,
    text_analysis,
    text_scoring,
    udf_surface,
    windows,
    wordcount,
)

__all__ = ["REGISTRY", "queries", "oracle_sql", "rows_only"]
