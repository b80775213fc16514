"""Observation-API metrics: numbers ride the action that does the work
(no second scan) and must equal independently recomputed aggregates."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_4_spark.operators.observability import (
    observe_metrics,
    observe_volume,
)
from mapreduce_4_spark.sources import load_table


def test_observed_metrics_match_recomputation(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    kept_df = docs.filter(F.col("n_chars") >= 100)
    observed, obs = observe_metrics(
        kept_df,
        "curation",
        n_kept=F.count(F.lit(1)),
        total_chars=F.sum("n_chars").cast("long"),
        max_doc=F.max("n_chars").cast("long"),
    )
    n_from_action = observed.count()  # the action that materializes metrics
    got = obs.get
    assert got["n_kept"] == n_from_action
    row = kept_df.agg(
        F.sum("n_chars").cast("long").alias("s"),
        F.max("n_chars").cast("long").alias("m"),
    ).first()
    assert got["total_chars"] == row["s"]
    assert got["max_doc"] == row["m"]


def test_observe_volume_gauge(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    observed, obs = observe_volume(docs)
    observed.count()
    got = obs.get
    assert got["n_rows"] == docs.count()
    expected_bytes = docs.agg(
        F.sum(F.octet_length("text")).cast("long").alias("b")
    ).first()["b"]
    assert got["text_bytes"] == expected_bytes
