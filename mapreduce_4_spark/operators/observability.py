"""Pipeline observability via Spark's Observation API: metrics ride the
job itself (collected by the executors as the action runs), so a
curation pass reports its kept/dropped/volume numbers WITHOUT a second
scan — the monitoring hook a 100 TB pipeline needs, where "count it
again" costs another full pass over the corpus.

The reference engine prints per-stage progress to stdout
(asio_deep/main.cpp logging); this is the generalized, structured
version of that signal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_metrics(df: DataFrame, name: str,
                    **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to a DataFrame; they materialize
    as a side effect of the NEXT action on the returned frame.

    Returns ``(observed_df, observation)`` — read
    ``observation.get`` AFTER an action. Metrics must be aggregates
    (count/sum/min/max...), evaluated over exactly the rows the action
    consumed: no re-scan, no race with concurrent writers, and on a
    cluster they come back through the same plan that did the work.
    """
    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in metrics.items()]), obs


def observe_volume(df: DataFrame, name: str = "volume",
                   ) -> tuple[DataFrame, Observation]:
    """The standard corpus-volume gauge: row count plus total text
    bytes if a ``text`` column is present."""
    metrics: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    if "text" in df.columns:
        metrics["text_bytes"] = F.sum(F.octet_length("text")).cast("long")
    return observe_metrics(df, name, **metrics)
