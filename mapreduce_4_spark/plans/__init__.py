"""Registered query plans. Importing this package populates the registry."""

from mapreduce_4_spark.registry import REGISTRY, oracle_sql, queries

from . import wordcount  # noqa: F401

__all__ = ["REGISTRY", "queries", "oracle_sql"]
